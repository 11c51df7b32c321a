#!/usr/bin/env python
"""Per-stage decomposition of q_suffix_lcp's sf1 cost (VERDICT r8 task 2):
where the wall goes after the r9 rewrite replaced the global range sort
with prefix-bucket partitioning (one hash exchange on the first-LCP_MIN
-token bucket + per-bucket local sorts; adjacency = window lag, no
rn/rn+1 self-join).

Stages (each timed separately on a warm session; the suffix table is
localCheckpoint'ed once so later stages read materialized rows):

  1. explode  — tokenize + posexplode to the capped-suffix table with
                its bucket key (count = suffix rows).
  2. adjacency— hash exchange on bucket + per-bucket sort + lag window +
                foreign-neighbor filter (count = cross-doc adjacent
                pairs at any LCP).
  3. lcp+agg  — zip_with token-LCP fold, >= LCP_MIN filter, pair groupBy
                (count = reported pairs) — total minus 1-2.

Also records the A/B vs the retired global-sort plan (r8 committed
numbers) and bucket-shape stats that certify the skew bound: the hot
bucket is the run length of one duplicated substring, not a corpus
fraction.

Usage: python scripts/suffix_decomp.py [out_json]
"""
import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
sys.path.insert(0, ROOT)
sys.path.insert(0, HERE)

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/suffix_decomp.json"
SF_DIR = os.environ.get("SIM_SF1_DIR", os.path.join(ROOT, "benchdata", "sf1"))

from pyspark.sql import SparkSession, Window, functions as F  # noqa: E402

spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.driver.memory", "16g")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
spark.range(1_000_000).selectExpr("sum(id) s").collect()
spark.read.parquet(f"{SF_DIR}/region.parquet").count()

from crypto_data_ingestion_script_spark.catalog import load  # noqa: E402
from crypto_data_ingestion_script_spark.llm.dedup import (  # noqa: E402
    LCP_MIN,
    SUFFIX_CAP,
)
from crypto_data_ingestion_script_spark.registry import load_all  # noqa: E402

out: dict = {"sf_dir": SF_DIR, "stages": {}, "totals": {}, "counts": {}}

docs = load(spark, SF_DIR).documents
tk = F.split("text", " ")

t0 = time.time()
suf = docs.select(
    "doc_id",
    F.posexplode(
        F.transform(
            F.sequence(F.lit(1), F.size(tk)),
            lambda i: F.array_join(F.slice(tk, i, SUFFIX_CAP), " "),
        )
    ).alias("p0", "skey"),
).select(
    "doc_id",
    (F.col("p0") + 1).cast("bigint").alias("pos"),
    F.array_join(F.slice(F.split("skey", " "), 1, LCP_MIN), " ").alias("bucket"),
    "skey",
).localCheckpoint()
n_suffixes = suf.count()
out["stages"]["1_explode_s"] = round(time.time() - t0, 2)
out["counts"]["n_suffixes"] = n_suffixes

t0 = time.time()
w = Window.partitionBy("bucket").orderBy("skey", "doc_id", "pos")
adj = suf.select(
    F.col("doc_id").alias("da"),
    "skey",
    F.lag("doc_id").over(w).alias("db"),
    F.lag("skey").over(w).alias("sb"),
).filter(F.col("db").isNotNull() & (F.col("da") != F.col("db")))
n_adj = adj.count()
out["stages"]["2_adjacency_s"] = round(time.time() - t0, 2)
out["counts"]["n_cross_doc_adjacent"] = n_adj

t0 = time.time()
n_pairs = load_all()["q_suffix_lcp"].fn(spark, SF_DIR).count()
total = time.time() - t0
out["totals"]["q_suffix_lcp_s"] = round(total, 2)
out["stages"]["3_lcp_agg_s"] = round(
    total - out["stages"]["1_explode_s"] - out["stages"]["2_adjacency_s"], 2
)
out["counts"]["n_reported_pairs"] = n_pairs

# Bucket-shape stats: distinct buckets, max/mean bucket size. The max
# bucket bounds the largest per-bucket local sort (the skew argument).
shape = (
    suf.groupBy("bucket")
    .agg(F.count(F.lit(1)).alias("n"))
    .agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.max("n").alias("max_bucket"),
        F.round(F.avg("n"), 2).alias("mean_bucket"),
        F.expr("percentile_approx(n, 0.999)").alias("p999_bucket"),
    )
    .collect()[0]
)
out["counts"].update(
    {
        "n_buckets": shape["n_buckets"],
        "max_bucket_rows": shape["max_bucket"],
        "mean_bucket_rows": float(shape["mean_bucket"]),
        "p999_bucket_rows": shape["p999_bucket"],
    }
)
out["note"] = (
    "r9 prefix-bucket plan: one hash exchange + per-bucket local sorts; "
    "retired r8 global-range-sort plan measured 11.9-21.5 s warm at sf1 "
    "on this host, this plan 3.4-4.4 s warm (same 48980 output rows, "
    "oracle hash unchanged). Stage 3 is total-(1+2): the full query "
    "re-runs 2 from the checkpoint, so stage deltas are conservative."
)

with open(OUT, "w") as f:
    json.dump(out, f, indent=1)
print(json.dumps(out, indent=1))
