#!/usr/bin/env python
"""Scale curves for the round-11 operators: wall times + rows_out at
sf0.01 / sf0.1 (testdata) and sf1 (benchdata, 10x content replication),
plus the structural counts that carry each op's 100 TB argument:

- summary-grain statistics (kendall/cramers/jsd/theilsen/kruskal/gmm):
  the distinct-value / contingency / bar grids are CONTENT-bound — the
  leg records their cardinalities so replication provably leaves them
  flat while the fact count grows 10x;
- bar-grain finance (macd/stochastic/donchian/rolling_beta/sharpe) and
  the DTW series: the fixed 30-day corpus window caps bars per type at
  any SF — the leg records bars/type;
- q_mrr: three map-side passes over a growing corpus — wall should
  track n_docs linearly while the six best-relevant keys stay O(1);
- q_kcore: edges grow with data; the leg records edge/survivor counts
  and that the fixed peeling horizon still converges (round R-1 == R);
- q_fk_integrity: key-grain anti-joins — records distinct key counts;
- q_minhash_accuracy: pair-grain audit — records the verified pair
  count (grows with duplicate depth, quadratic in replicas by the
  data's own math, like q_dedup_near's output).

Usage: python scripts/new_ops_scale_r11.py [out_json]
Run alone (timings are part of the artifact).
"""
import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
sys.path.insert(0, ROOT)

OUT = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
    ROOT, "NEW_OPS_SCALE_r11.json"
)

from pyspark.sql import functions as F  # noqa: E402

from crypto_data_ingestion_script_spark.catalog import load  # noqa: E402
from crypto_data_ingestion_script_spark.operators.graph import (  # noqa: E402
    KCORE_K,
    KCORE_ROUNDS,
    kcore_survivors,
)
from crypto_data_ingestion_script_spark.session import build_session  # noqa: E402
import __spark_entry__ as e  # noqa: E402

SCALES = {
    "sf0.01": "/root/testdata/sf0.01",
    "sf0.1": "/root/testdata/sf0.1",
    "sf1": os.path.join(ROOT, "benchdata", "sf1"),
}
OPS = [
    # statistics batch
    "q_kendall_tau", "q_cramers_v", "q_jsd_drift", "q_theilsen",
    "q_kruskal_wallis",
    # ML evaluation batch
    "q_avg_precision", "q_brier_decomp", "q_cohens_kappa", "q_mrr",
    "q_lift_curve",
    # finance indicators
    "q_macd", "q_stochastic", "q_donchian", "q_rolling_beta", "q_sharpe",
    # graph / DQ
    "q_kcore", "q_fk_integrity", "q_freshness", "q_minhash_accuracy",
    # DTW / linear algebra / survival / mixture
    "q_dtw", "q_ridge_normal", "q_kaplan_meier", "q_gmm_em",
]

spark = build_session("new-ops-scale-r11")
spark.sparkContext.setLogLevel("ERROR")
qs = e.queries()

out = {"scales": {}}
for sf, d in SCALES.items():
    if not os.path.isdir(d):
        print(f"skip {sf}: {d} missing")
        continue
    rec = {}
    t = load(spark, d)
    # content-bound summary grains the statistics family runs at
    rec["counts"] = {
        "n_events": t.events.count(),
        "n_lineitem": t.lineitem.count(),
        "n_docs": t.documents.count(),
        "kendall_grid_cells": t.lineitem.select(
            "l_returnflag", "l_quantity", "l_discount"
        ).distinct().count(),
        "distinct_event_values": t.events.select("value").distinct().count(),
        "bars_per_type_max": t.events.groupBy(
            "event_type", F.date_trunc("hour", "ts")
        ).count().groupBy("event_type").count().agg(
            F.max("count")
        ).collect()[0][0],
        "orders_fk_keys": t.orders.select("o_custkey").distinct().count(),
        "users": t.events.select("user_id").distinct().count(),
    }
    # k-core structure: edges + survivor counts + fixed-horizon convergence
    edges = (
        t.lineitem.select(
            F.col("l_partkey").alias("p"), F.col("l_suppkey").alias("s")
        ).distinct().localCheckpoint(eager=True)
    )
    ap1, as1 = kcore_survivors(edges, KCORE_K, KCORE_ROUNDS)
    ap2, as2 = kcore_survivors(edges, KCORE_K, KCORE_ROUNDS + 1)
    rec["kcore_structure"] = {
        "n_edges": edges.count(),
        "survivors_p": ap1.count(),
        "survivors_s": as1.count(),
        "converged_at_horizon": (
            ap1.count() == ap2.count() and as1.count() == as2.count()
        ),
    }
    for name in OPS:
        walls, rows = [], None
        for _ in range(3):
            t0 = time.perf_counter()
            rows = qs[name](spark, d).count()
            walls.append(round(time.perf_counter() - t0, 2))
        rec[name] = {
            "walls": walls, "warm_min": min(walls[1:]), "rows_out": rows,
        }
        print(sf, name, rec[name], flush=True)
    out["scales"][sf] = rec

out["notes"] = (
    "counts.* are the content-bound grains (grids, bars, users, keys) "
    "that must stay ~flat under 10x replication for the summary-grain "
    "scale arguments to hold; kcore_structure.n_edges is the one grain "
    "that legitimately grows (parts x suppliers)."
)
with open(OUT, "w") as f:
    json.dump(out, f, indent=1)
print("wrote", OUT)
