#!/usr/bin/env python
"""Stage decomposition of q_pipeline_quality → pipeline_quality_decomp_r{N}.json
(the pipeline_decomp.py practice applied to the round-8 quality chain):
wall time of each stage measured cumulatively in one warm session, at
sf0.01 and benchdata/sf1, so the composed query's sweep row is
adjudicable against its parts. Stages mirror
llm/curation.py::q_pipeline_quality exactly.

Usage: python scripts/pipeline_quality_decomp.py [out_json]
"""
import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
sys.path.insert(0, ROOT)

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/pipeline_quality_decomp.json"

from pyspark.sql import SparkSession, Window, functions as F  # noqa: E402

spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.driver.memory", "16g")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
spark.range(1_000_000).selectExpr("sum(id)").collect()

from crypto_data_ingestion_script_spark.catalog import load  # noqa: E402
from crypto_data_ingestion_script_spark.llm.curation import NOV_MIN  # noqa: E402
from crypto_data_ingestion_script_spark.llm.dedup import (  # noqa: E402
    boilerplate_filter,
)
from crypto_data_ingestion_script_spark.llm.text import (  # noqa: E402
    QC_BUCKETS,
    QC_MOD,
    QC_SHIFT,
)
from crypto_data_ingestion_script_spark.ranking import (  # noqa: E402
    global_running_sum,
)

out = {"session": "plain local[32], 16g driver", "scales": {}}
for sf_dir in ("/root/testdata/sf0.01", os.path.join(ROOT, "benchdata", "sf1")):
    if not os.path.isdir(sf_dir):
        continue
    spark.read.parquet(f"{sf_dir}/region.parquet").count()
    rec = {}
    t = load(spark, sf_dir)

    def tick(label, fn):
        t0 = time.perf_counter()
        r = fn()
        rec[label] = round(time.perf_counter() - t0, 2)
        print(f"[{os.path.basename(sf_dir)}] {label}: {rec[label]}s", flush=True)
        return r

    bucket = (
        F.conv(F.substring(F.md5("tok"), 1, 8), 16, 10).cast("bigint")
        % QC_BUCKETS
    )
    wnum = (bucket * F.lit(2654435761)) % QC_MOD - QC_SHIFT
    gate = tick(
        "s1_gate_ckpt",
        lambda: t.documents.select(
            "doc_id", F.explode(F.split(F.lower("text"), " ")).alias("tok")
        )
        .select("doc_id", wnum.alias("wnum"))
        .groupBy("doc_id")
        .agg(F.sum("wnum").alias("s"))
        .filter(F.col("s") > 0)
        .select("doc_id")
        .localCheckpoint(),
    )
    gated = t.documents.join(gate, "doc_id")
    w_d = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    ded_raw = tick(
        "s2_exact_dedup_ckpt",
        lambda: gated.withColumn("rn", F.row_number().over(w_d))
        .filter(F.col("rn") == 1)
        .drop("rn")
        .localCheckpoint(),
    )
    kept = tick(
        "s3_boilerplate_ckpt",
        lambda: boilerplate_filter(ded_raw)
        .filter(F.col("kept_frac") >= 0.5)
        .select("doc_id", F.col("cleaned_text").alias("ctext"))
        .localCheckpoint(),
    )
    tk = F.split(F.lower("ctext"), " ")
    grams = kept.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(1), F.greatest(F.size(tk) - 3, F.lit(1))),
                    lambda i: F.concat_ws(" ", F.slice(tk, i, 4)),
                )
            )
        ).alias("gram"),
    )
    grams_c = tick("s4a_grams_ckpt", lambda: grams.localCheckpoint())
    fs = grams_c.groupBy("gram").agg(F.min("doc_id").alias("fd"))
    novel = F.col("fd") == F.col("doc_id")
    nov = tick(
        "s4b_novelty_filter",
        lambda: (
            lambda d: (d.count(), d)
        )(
            grams_c.join(fs, "gram")
            .groupBy("doc_id")
            .agg(
                F.round(
                    F.sum(novel.cast("double")) / F.count(F.lit(1)), 6
                ).alias("novelty")
            )
            .filter(F.col("novelty") >= NOV_MIN)
            .localCheckpoint()
        ),
    )[1]
    sel = kept.join(nov, "doc_id").select(
        "doc_id",
        F.size(F.split("ctext", " ")).cast("bigint").alias("n_tokens"),
        "novelty",
    )
    tick(
        "s5_pack",
        lambda: global_running_sum(sel, "n_tokens", "doc_id", out_col="c").count(),
    )
    import __spark_entry__ as e

    qs = e.queries()
    tick("full_query_warm", lambda: qs["q_pipeline_quality"](spark, sf_dir).count())
    out["scales"][os.path.basename(sf_dir)] = rec

with open(OUT, "w") as f:
    json.dump(out, f, indent=1)
print(f"DONE -> {OUT}")
