#!/usr/bin/env python
"""SCALE_r12: sf10 legs for the round-10 statistics family (VERDICT r11
task 7, builder's choice — stated in BASELINE.md r12 block): wall times
+ rows_out at sf0.01 / sf0.1 (testdata), sf1 and sf10 (benchdata 10x /
100x content replication) for q_poisson_bootstrap, q_woe_iv,
q_calibration_curve, q_source_overlap and q_jaccard_sweep, plus the
structural counts that carry each op's 100 TB argument:

- q_poisson_bootstrap: the replicate axis is a FIXED B (map-side
  explode, one combinable groupBy(b) back to B rows) — rows_out must
  stay at B while n_events grows 1000x across the four decades;
- q_woe_iv / q_calibration_curve: decile/bin grids are fixed-width —
  rows_out flat, one fact-scale pass each;
- q_source_overlap: the source-pair grid is |sources|^2 — content-bound;
  the leg records distinct sources;
- q_jaccard_sweep: ONE PPJoin pass streams the whole threshold grid;
  candidate work tracks true near-pair count, which grows
  quadratically in duplicate DEPTH by the data's own math under
  key-offset replication — the leg records rows_out so the growth is
  attributed to data, not plan.

Usage: python scripts/scale_r12.py [out_json]
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

OUT = sys.argv[1] if len(sys.argv) > 1 else os.path.join(ROOT, "SCALE_r12.json")

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
    "q_poisson_bootstrap",
    "q_woe_iv",
    "q_calibration_curve",
    "q_source_overlap",
    "q_jaccard_sweep",
]

spark = build_session("scale-r12")
spark.sparkContext.setLogLevel("ERROR")
qs = e.queries()

out = {"scales": {}}
for sf, d in SCALES.items():
    if not os.path.isdir(d):
        print(f"skip {sf}: {d} missing")
        continue
    rec = {}
    t = load(spark, d)
    rec["counts"] = {
        "n_events": t.events.count(),
        "n_docs": t.documents.count(),
        "distinct_sources": t.documents.select("source").distinct().count(),
        "distinct_event_values": t.events.select("value").distinct().count(),
        "distinct_shingle_sets": t.documents.select("text").distinct().count(),
    }
    for name in OPS:
        walls, rows = [], None
        for _ in range(3):
            t0 = time.perf_counter()
            rows = qs[name](spark, d).count()
            walls.append(round(time.perf_counter() - t0, 2))
        rec[name] = {
            "walls": walls,
            "warm_min": min(walls[1:]),
            "rows_out": rows,
        }
        print(sf, name, rec[name], flush=True)
    out["scales"][sf] = rec

out["notes"] = (
    "counts.* are the content-bound grains (B replicates, bins, source "
    "pairs, distinct values) that must stay ~flat while n_events / "
    "n_docs grow 1000x from sf0.01 to sf10; q_jaccard_sweep's rows_out "
    "legitimately grows with duplicate depth (near-pair count is a "
    "property of the replicated data)."
)
with open(OUT, "w") as f:
    json.dump(out, f, indent=1)
print("wrote", OUT)
