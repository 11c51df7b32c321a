#!/usr/bin/env python
"""Per-stage decomposition of the containment family's sf1 cost (VERDICT
r5 task 2 / r6 task 4): where q_containment_topk's ~8 s at benchdata/sf1
goes, and what the group-granularity cap saves vs the full pair list.

Stages (each timed separately; sets is localCheckpoint'ed inside
``_containment_sets_verified``, so later stages read the materialized
checkpoint rather than re-running the tokenize chain):

  1. build     — tokenize, vocabulary rank (token_rank), distinct-set
                 collapse, checkpoint: the machinery SHARED by join+topk.
  2. candidates— one-sided prefix ⋈ full-index equi-join + dedup, at
                 GROUP granularity.
  3. verify    — array_intersect scoring of candidate group pairs.
  4a. topk tail— group-level top-k + ≤(k+1)-per-doc expansion + per-doc
                 window (q_containment_topk total minus 1-3).
  4b. join tail— full member-expansion to the directional pair list
                 (q_containment_join total minus 1-3): output-bound.

Caveat: stage timings re-run 2+3 inside 4a/4b (verified is lazy and
intentionally NOT cached — the checkpoint already bounds the rerun to
candidate+verify over summary-scale data), so tails are reported as
total − (2+3) deltas.

Usage: python scripts/containment_decomp.py [out_json]
"""
import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
sys.path.insert(0, ROOT)
sys.path.insert(0, HERE)

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/containment_decomp.json"
SF_DIR = os.environ.get("SIM_SF1_DIR", os.path.join(ROOT, "benchdata", "sf1"))

from pyspark.sql import SparkSession, functions as F  # noqa: E402

spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.driver.memory", "16g")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
spark.range(1_000_000).selectExpr("sum(id) s").collect()
spark.range(64).repartition(8).mapInPandas(
    lambda it: it, schema="id bigint"
).count()
spark.read.parquet(f"{SF_DIR}/region.parquet").count()

import __spark_entry__ as e  # noqa: E402
from crypto_data_ingestion_script_spark.llm.dedup import (  # noqa: E402
    _containment_sets_verified,
)

qs = e.queries()
out: dict = {"sf_dir": SF_DIR, "stages": {}, "totals": {}, "counts": {}}

# Warm both full queries once so every stage below measures warm engine
# time (same discipline as bench.py / sim_sf1.py).
qs["q_containment_topk"](spark, SF_DIR).count()

stats: dict = {}
t0 = time.perf_counter()
sets, verified = _containment_sets_verified(spark, SF_DIR, tau=0.9, stats=stats)
build_s = time.perf_counter() - t0  # checkpoints fire inside

t0 = time.perf_counter()
n_cand = stats["cand"].count()
cand_s = time.perf_counter() - t0

t0 = time.perf_counter()
n_verified = verified.count()
verify_s = time.perf_counter() - t0 - cand_s  # verified re-runs cand

n_groups = sets.count()
depth = sets.select(
    F.count(F.when(F.size("members") >= 2, 1)).alias("dup_groups"),
    F.max(F.size("members")).alias("max_depth"),
    F.sum(F.size("members")).alias("n_docs"),
).collect()[0]

t0 = time.perf_counter()
n_topk = qs["q_containment_topk"](spark, SF_DIR).count()
topk_total_s = time.perf_counter() - t0

t0 = time.perf_counter()
n_join = qs["q_containment_join"](spark, SF_DIR).count()
join_total_s = time.perf_counter() - t0

out["stages"] = {
    "1_build_s": round(build_s, 2),
    "2_candidates_s": round(cand_s, 2),
    "3_verify_s": round(verify_s, 2),
    "4a_topk_tail_s": round(topk_total_s - build_s - cand_s - verify_s, 2),
    "4b_join_tail_s": round(join_total_s - build_s - cand_s - verify_s, 2),
}
out["totals"] = {
    "q_containment_topk_s": round(topk_total_s, 2),
    "q_containment_join_s": round(join_total_s, 2),
}
out["counts"] = {
    "n_docs": int(depth["n_docs"]),
    "n_distinct_groups": n_groups,
    "n_dup_groups": int(depth["dup_groups"]),
    "max_group_depth": int(depth["max_depth"]),
    "n_candidate_group_pairs": n_cand,
    "n_verified_group_pairs": n_verified,
    "rows_topk": n_topk,
    "rows_join": n_join,
}
print(json.dumps(out, indent=1))
with open(OUT, "w") as f:
    json.dump(out, f, indent=1)
