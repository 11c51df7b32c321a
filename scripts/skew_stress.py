#!/usr/bin/env python
"""Zipf-skew stress proof for the cap/salt/AQE machinery (VERDICT r8
task 3): generates an sf1-scale skewed variant — one mega-domain holding
~30% of documents with the remaining 70% zipf-distributed over 100
domains, and one hot join key owning ~30% of orders — then measures the
MAX and MEDIAN per-task shuffle-read records of the reduce stage for:

  1. q_domain_cap's plan (WindowGroupLimit partial top-k) vs the same
     window with InferWindowGroupLimit excluded (the naive plan that
     funnels the mega-domain's full row count into one task).
  2. The salted fact-dim join (operators/skew.py::salted_join) vs the
     naive sort-merge join vs the naive join under AQE skew splitting
     (tests/test_aqe_skew.py's thresholds) — three ways to bound the
     same hot key.
  3. q_salted_agg's two-stage salted aggregate vs the plain one-stage
     groupBy on events made 80%-one-type — plus the collect_list variant
     where map-side partial aggregation does NOT shrink payloads, which
     is the case salting exists for.

Per-task numbers come from the Spark UI REST API (taskSummary quantiles
on the stage with the largest shuffle read), so "max reduce task" is the
scheduler's own accounting, not an estimate. Output partitions of each
join are also counted directly (plans/metrics.rows_per_output_partition).

Usage: python scripts/skew_stress.py [out_json]   (~2 min)
"""
import json
import os
import sys
import time
import urllib.request

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
sys.path.insert(0, ROOT)

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/skew_stress.json"
SRC = os.environ.get("SKEW_SRC", os.path.join(ROOT, "benchdata", "sf1"))
DATA = os.path.join(ROOT, "benchdata", "skew")

import numpy as np  # noqa: E402
import pyarrow as pa  # noqa: E402
import pyarrow.parquet as pq  # noqa: E402

# ---------------------------------------------------------------- data gen
os.makedirs(DATA, exist_ok=True)
if not os.path.exists(os.path.join(DATA, "documents.parquet")):
    docs = pq.read_table(os.path.join(SRC, "documents.parquet"))
    n = docs.num_rows
    # Deterministic zipf tail: md5-free here (numpy with fixed seed is fine
    # for DATA GENERATION — queries themselves stay RNG-free).
    rng = np.random.default_rng(9)
    ranks = np.arange(1, 101)
    p = 1.0 / ranks
    p /= p.sum()
    tail = rng.choice(100, size=n, p=p)
    mega = rng.random(n) < 0.30
    source = np.where(mega, "megadomain", np.char.add("d", tail.astype(str)))
    docs = docs.set_column(
        docs.schema.get_field_index("source"), "source", pa.array(source)
    )
    pq.write_table(docs, os.path.join(DATA, "documents.parquet"))

    orders = pq.read_table(os.path.join(SRC, "orders.parquet"))
    n = orders.num_rows
    hot = rng.random(n) < 0.30
    ck = orders.column("o_custkey").to_numpy()
    hot_key = int(pq.read_table(os.path.join(SRC, "customer.parquet"),
                                columns=["c_custkey"]).column(0)[0].as_py())
    ck = np.where(hot, hot_key, ck)
    orders = orders.set_column(
        orders.schema.get_field_index("o_custkey"), "o_custkey",
        pa.array(ck, pa.int64()),
    )
    pq.write_table(orders, os.path.join(DATA, "orders.parquet"))

    ev = pq.read_table(os.path.join(SRC, "events.parquet"))
    n = ev.num_rows
    hot = rng.random(n) < 0.80
    et = np.where(hot, "hot_type", ev.column("event_type").to_numpy())
    ev = ev.set_column(
        ev.schema.get_field_index("event_type"), "event_type", pa.array(et)
    )
    pq.write_table(ev, os.path.join(DATA, "events.parquet"))
    for tname in ("customer", "region", "nation"):
        src = os.path.join(SRC, f"{tname}.parquet")
        dst = os.path.join(DATA, f"{tname}.parquet")
        if not os.path.exists(dst):
            pq.write_table(pq.read_table(src), dst)

# ---------------------------------------------------------------- session
from pyspark.sql import SparkSession, Window, functions as F  # noqa: E402

spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.driver.memory", "16g")
    .config("spark.ui.enabled", "true")
    .config("spark.ui.port", "0")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
sys.path.insert(0, ROOT)
from crypto_data_ingestion_script_spark.operators.skew import (  # noqa: E402
    salted_aggregate,
    salted_join,
)
from crypto_data_ingestion_script_spark.plans.metrics import (  # noqa: E402
    rows_per_output_partition,
)

UI = spark.sparkContext.uiWebUrl
APP = spark.sparkContext.applicationId


def _get(path):
    with urllib.request.urlopen(f"{UI}/api/v1/applications/{APP}{path}") as r:
        return json.loads(r.read())


def reduce_task_stats(run, min_records: int = 1) -> dict:
    """Run ``run()`` and return per-task shuffle-read stats of the NEW
    completed stage with the largest shuffle read (by bytes — records
    undercount object-agg payloads like collect_list partials)."""
    before = {s["stageId"] for s in _get("/stages")}
    run()
    time.sleep(0.5)
    stages = [
        s
        for s in _get("/stages?status=COMPLETE")
        if s["stageId"] not in before and s.get("shuffleReadRecords", 0) >= min_records
    ]
    if not stages:
        return {"note": "no shuffle-read stage"}
    stages.sort(key=lambda s: s.get("shuffleReadBytes", 0), reverse=True)
    result = {}
    for i, st in enumerate(stages[:2]):
        q = _get(
            f"{'/stages'}/{st['stageId']}/{st['attemptId']}/taskSummary"
            "?quantiles=0.0,0.5,1.0"
        )
        rec = q["shuffleReadMetrics"]["readRecords"]
        by = q["shuffleReadMetrics"].get("readBytes")
        one = {
            "stage_total_read_records": st["shuffleReadRecords"],
            "n_tasks": st["numCompleteTasks"],
            "task_records_min": int(rec[0]),
            "task_records_median": int(rec[1]),
            "task_records_max": int(rec[2]),
        }
        if by is not None:
            one["task_bytes_median"] = int(by[1])
            one["task_bytes_max"] = int(by[2])
        if i == 0:
            result.update(one)
        else:
            result["stage2_by_bytes"] = one
    return result


out: dict = {"data": DATA, "confs": {}, "results": {}}
docs = spark.read.parquet(os.path.join(DATA, "documents.parquet"))
n_docs = docs.count()
n_mega = docs.filter(F.col("source") == "megadomain").count()
out["counts"] = {"n_docs": n_docs, "n_megadomain_docs": n_mega}

# ---- 1. domain cap: WindowGroupLimit vs naive window ---------------------
CAP = 15
w = Window.partitionBy("source").orderBy(
    F.md5(F.encode(F.col("doc_id").cast("string"), "UTF-8")), "doc_id"
)


def run_cap():
    return (
        docs.select("doc_id", "source")
        .withColumn("keep_rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("keep_rank") <= CAP)
        .count()
    )


out["results"]["domain_cap_window_group_limit"] = reduce_task_stats(run_cap)
spark.conf.set(
    "spark.sql.optimizer.excludedRules",
    "org.apache.spark.sql.catalyst.optimizer.InferWindowGroupLimit",
)
out["results"]["domain_cap_naive_window"] = reduce_task_stats(run_cap)
spark.conf.unset("spark.sql.optimizer.excludedRules")

# ---- 2. hot-key join: naive vs AQE skew split vs salted -------------------
orders = spark.read.parquet(os.path.join(DATA, "orders.parquet"))
cust = spark.read.parquet(os.path.join(DATA, "customer.parquet"))
big = orders.withColumnRenamed("o_custkey", "c_custkey")

BASE = {
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
}
SKEW_ON = {
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "1mb",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "1mb",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2.0",
}


def with_confs(confs, fn):
    saved = {}
    for k, v in confs.items():
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
        spark.conf.set(k, v)
    try:
        return fn()
    finally:
        for k, v in saved.items():
            spark.conf.unset(k) if v is None else spark.conf.set(k, v)


_last_join_plan = {"s": ""}


def join_naive():
    # collect() the join DF itself: a count() executes a DIFFERENT query
    # whose stage attribution (and, observed, AQE behavior) diverges —
    # the skew=true marker only appears on the executed join plan.
    j = big.join(cust, "c_custkey").select("c_custkey", "o_orderkey")
    n = len(j.collect())
    _last_join_plan["s"] = j._jdf.queryExecution().executedPlan().toString()
    return n


def join_salted():
    j = salted_join(
        big, cust, key="c_custkey", salt_on=F.col("o_orderkey"), n_salts=8
    ).select("c_custkey", "o_orderkey")
    return len(j.collect())


spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
out["results"]["join_naive_smj"] = with_confs(
    BASE, lambda: reduce_task_stats(join_naive)
)
spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
out["results"]["join_aqe_skew_split"] = with_confs(
    {**BASE, **SKEW_ON}, lambda: reduce_task_stats(join_naive)
)
out["results"]["join_aqe_skew_split"]["plan_skew_marker"] = (
    "SortMergeJoin(skew=true)" in _last_join_plan["s"]
)
out["results"]["join_salted"] = with_confs(
    BASE, lambda: reduce_task_stats(join_salted)
)
# Direct output-partition row counts (top 5) for naive vs salted.
spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
out["results"]["join_output_partition_rows_top5"] = with_confs(
    BASE,
    lambda: {
        "naive": rows_per_output_partition(big.join(cust, "c_custkey"))[:5],
        "salted": rows_per_output_partition(
            salted_join(big, cust, key="c_custkey",
                        salt_on=F.col("o_orderkey"), n_salts=8)
        )[:5],
    },
)
spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")

# ---- 3. hot-type aggregate: plain vs salted, algebraic vs collect --------
ev = spark.read.parquet(os.path.join(DATA, "events.parquet"))
out["counts"]["n_events"] = ev.count()
# NB: collect(), never count() — a count prunes the aggregate payloads
# (the round-2 gotcha) and the exchanges would carry keys only.
out["results"]["agg_plain_algebraic"] = reduce_task_stats(
    lambda: ev.groupBy("event_type").agg(F.sum("value"), F.count("*")).collect()
)
out["results"]["agg_salted_algebraic"] = reduce_task_stats(
    lambda: salted_aggregate(
        ev, keys=["event_type"], salt_on=F.col("event_id"), n_salts=16
    ).collect()
)
out["results"]["agg_plain_collect_list"] = reduce_task_stats(
    lambda: ev.groupBy("event_type")
    .agg(F.size(F.collect_list("event_id")).alias("n"))
    .collect()
)
# Salted collect: stage 1 builds per-(key, salt) partial lists — the hot
# type's BUILD work spreads over 16 tasks. Stage 2's merge of 16 partials
# per key is the irreducible single-row payload; the artifact reports
# both stages (stage2_by_bytes) so the bound reads correctly.
out["results"]["agg_salted_collect_list"] = reduce_task_stats(
    lambda: ev.withColumn("_salt", F.pmod(F.xxhash64("event_id"), F.lit(16)))
    .groupBy("event_type", "_salt")
    .agg(F.collect_list("event_id").alias("part"))
    .groupBy("event_type")
    .agg(F.size(F.flatten(F.collect_list("part"))).alias("n"))
    .collect()
)

out["note"] = (
    "domain_cap: WindowGroupLimit bounds the mega-domain's reduce task to "
    "<= n_map_partitions x cap rows per domain; the naive window reads the "
    "domain's full 30% share in one task. join: AQE splits the hot key's "
    "reduce partition at runtime; salting spreads it over n_salts tasks "
    "statically. agg: map-side partial aggregation already bounds "
    "algebraic aggs (both variants tiny); collect_list is the case where "
    "salting is load-bearing for the BUILD stage, while the final "
    "single-row merge payload is irreducible by contract (see "
    "stage2_by_bytes)."
)

with open(OUT, "w") as f:
    json.dump(out, f, indent=1)
print(json.dumps(out, indent=1))
