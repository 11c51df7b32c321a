#!/usr/bin/env python
"""Stage decomposition of q_pipeline_pretrain → pipeline_decomp_r{N}.json
(the in-tree-decomposition practice of rounds 5-7): wall time of each
curation stage measured cumulatively in one warm session, at sf0.01 and
benchdata/sf1, so the composed query's sweep row is adjudicable against
its parts. Stages mirror llm/curation.py::q_pipeline_pretrain exactly.

Usage: python scripts/pipeline_decomp.py [out_json]
"""
import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
sys.path.insert(0, ROOT)

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/pipeline_decomp.json"

from pyspark.sql import SparkSession, Window, functions as F  # noqa: E402

spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.driver.memory", "16g")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
spark.range(1_000_000).selectExpr("sum(id)").collect()

from crypto_data_ingestion_script_spark.catalog import load  # noqa: E402
from crypto_data_ingestion_script_spark.llm.curation import (  # noqa: E402
    DOMAIN_CAP,
    DSIR_SAMPLE_K,
    PRETRAIN_MAX_CHARS,
    PRETRAIN_MAX_DUP_BIGRAM_FRAC,
    PRETRAIN_MIN_CHARS,
    dsir_gumbel_key,
    dsir_logweights,
)
from crypto_data_ingestion_script_spark.llm.dedup import (  # noqa: E402
    near_dup_pairs,
    shingles,
)
from crypto_data_ingestion_script_spark.ranking import (  # noqa: E402
    global_running_sum,
)

out = {"session": "plain local[32], 16g driver", "scales": {}}
_scales = os.environ.get("PIPE_SCALES")
SCALES = (
    tuple(_scales.split(","))
    if _scales
    else ("/root/testdata/sf0.01", os.path.join(ROOT, "benchdata", "sf1"))
)
for sf_dir in SCALES:
    if not os.path.isdir(sf_dir):
        continue
    spark.read.parquet(f"{sf_dir}/region.parquet").count()
    rec = {}
    t = load(spark, sf_dir)
    docs = t.documents.select("doc_id", "source", "lang", "text")

    def tick(label, fn):
        t0 = time.perf_counter()
        r = fn()
        rec[label] = round(time.perf_counter() - t0, 2)
        print(f"[{os.path.basename(sf_dir)}] {label}: {rec[label]}s", flush=True)
        return r

    g2 = shingles(F.split(F.col("text"), " "), n=2)
    rep = 1.0 - F.size(F.array_distinct(g2)).cast("double") / F.size(g2)
    gated = docs.filter(
        (F.length("text") >= PRETRAIN_MIN_CHARS)
        & (F.length("text") <= PRETRAIN_MAX_CHARS)
        & (rep <= PRETRAIN_MAX_DUP_BIGRAM_FRAC)
    )
    w_hash = Window.partitionBy(F.md5("text"))
    exact = tick(
        "s1_2_gate_exact_ckpt",
        lambda: gated.withColumn("_k", F.min("doc_id").over(w_hash))
        .filter(F.col("doc_id") == F.col("_k"))
        .drop("_k")
        .localCheckpoint(),
    )
    dropped = tick(
        "s3_near_pairs_ckpt",
        lambda: near_dup_pairs(exact)
        .select(F.col("b_id").alias("doc_id"))
        .distinct()
        .localCheckpoint(),
    )
    near = exact.join(dropped, "doc_id", "left_anti")
    w_cap = Window.partitionBy("source").orderBy(
        F.md5(F.encode(F.col("doc_id").cast("string"), "UTF-8")), "doc_id"
    )
    capped = tick(
        "s4_anti_cap_ckpt",
        lambda: near.withColumn("_r", F.row_number().over(w_cap))
        .filter(F.col("_r") <= DOMAIN_CAP)
        .drop("_r")
        .localCheckpoint(),
    )
    sel = tick(
        "s5_dsir_topk",
        lambda: (
            lambda d: (d.count(), d)
        )(
            dsir_logweights(capped)
            .withColumn("gumbel_key", dsir_gumbel_key())
            .orderBy(F.desc("gumbel_key"), "doc_id")
            .limit(DSIR_SAMPLE_K)
        ),
    )[1]
    tick(
        "s6_pack",
        lambda: global_running_sum(sel, "n_tokens", "doc_id", out_col="c").count(),
    )
    import __spark_entry__ as e

    qs = e.queries()
    tick("full_query_warm", lambda: qs["q_pipeline_pretrain"](spark, sf_dir).count())
    out["scales"][os.path.basename(sf_dir)] = rec

with open(OUT, "w") as f:
    json.dump(out, f, indent=1)
print(f"DONE -> {OUT}")
