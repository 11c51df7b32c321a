#!/usr/bin/env python
"""SCALE_r13: sf10 legs for the rank-statistic family (VERDICT r12
task 7, tied to task 1): wall times + rows_out at sf0.01 / sf0.1
(testdata), sf1 and sf10 (benchdata 10x / 100x key-offset replication)
for the seven queries whose distinct-value-grain running sums moved
from a bare single-task Window.orderBy to ranking.global_running's
two-pass range plan this round (q_auc, q_mann_whitney,
q_kruskal_wallis, q_wasserstein, q_avg_precision, q_ks_drift,
q_spearman), plus q_rfm (user-grain NTILEs -> global_ntile).

Structural payload, per scale:
- distinct_event_values: the grain the OLD plan pushed through ONE
  window task (SCALE_r12 measured it growing ~2.7x per decade);
- range_split: the post-fix evidence — the distinct-value table
  repartitionByRange(32)'d exactly as global_running does, reporting
  non-empty ranges and the max rows any single task holds. The claim
  "no single fat window task" is true iff max_range_rows ~
  distinct_values / n_ranges, not ~ distinct_values.
- users / distinct (flag, extendedprice) rows for the q_rfm /
  q_spearman grains.

Usage: python scripts/scale_r13.py [out_json]
Run alone (timings are part of the artifact); sf10 exists only when
benchdata was built with --extra sf10=100.
"""
import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
sys.path.insert(0, ROOT)

OUT = sys.argv[1] if len(sys.argv) > 1 else os.path.join(ROOT, "SCALE_r13.json")

from pyspark.sql import functions as F  # noqa: E402

from crypto_data_ingestion_script_spark.catalog import load  # noqa: E402
from crypto_data_ingestion_script_spark.session import build_session  # noqa: E402
import __spark_entry__ as e  # noqa: E402

SCALES = {
    "sf0.01": "/root/testdata/sf0.01",
    "sf0.1": "/root/testdata/sf0.1",
    "sf1": os.path.join(ROOT, "benchdata", "sf1"),
    "sf10": os.path.join(ROOT, "benchdata", "sf10"),
}
OPS = [
    "q_auc",
    "q_mann_whitney",
    "q_kruskal_wallis",
    "q_wasserstein",
    "q_avg_precision",
    "q_ks_drift",
    "q_spearman",
    "q_rfm",
]

spark = build_session("scale-r13")
spark.sparkContext.setLogLevel("ERROR")
qs = e.queries()


def range_split_profile(df, order_col, n_ranges=32):
    """Row distribution across the EXACT range layout global_running
    builds: (non-empty ranges, max rows in any one range, total rows)."""
    parts = (
        df.repartitionByRange(n_ranges, F.col(order_col))
        .withColumn("_pid", F.spark_partition_id())
        .groupBy("_pid")
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(
            F.count(F.lit(1)).alias("n_ranges_nonempty"),
            F.max("n").alias("max_range_rows"),
            F.sum("n").alias("total_rows"),
        )
        .collect()[0]
    )
    return {
        "n_ranges_nonempty": int(parts["n_ranges_nonempty"]),
        "max_range_rows": int(parts["max_range_rows"]),
        "total_rows": int(parts["total_rows"]),
    }


out = {"scales": {}}
for sf, d in SCALES.items():
    if not os.path.isdir(d):
        print(f"skip {sf}: {d} missing")
        continue
    rec = {}
    t = load(spark, d)
    s = t.events.filter(
        F.col("event_type").isin("click", "purchase")
    ).select("value")
    vg = s.groupBy("value").count()
    rec["counts"] = {
        "n_events": t.events.count(),
        "distinct_event_values": vg.count(),
        "n_users": t.events.select("user_id").distinct().count(),
        "distinct_flag_extprice": t.lineitem.select(
            "l_returnflag", "l_extendedprice"
        ).distinct().count(),
    }
    rec["range_split"] = range_split_profile(vg, "value")
    for name in OPS:
        walls, rows = [], None
        for _ in range(3):
            t0 = time.perf_counter()
            rows = qs[name](spark, d).count()
            walls.append(round(time.perf_counter() - t0, 2))
        rec[name] = {
            "walls": walls,
            "warm_min": min(walls[1:]) if len(walls) > 1 else walls[0],
            "rows_out": rows,
        }
        print(f"{sf} {name}: {walls} rows={rows}", flush=True)
    out["scales"][sf] = rec

with open(OUT, "w") as f:
    json.dump(out, f, indent=1)
print(f"SCALE_r13 -> {OUT}")
