#!/usr/bin/env python
"""sf10 (100× sf0.1) scale leg for the round-10 session-2 operators —
the second decade on top of NEW_OPS_SCALE_r10's sf0.01→sf1 curves.

Per op: min-of-2 warm walls at sf1 and sf10 plus the structural count
that carries its 100 TB argument, so the artifact shows WHICH term grew:

- q_chunk_cdc: distinct chunk fingerprints stay CONTENT-bound at 100×
  docs (text replicates verbatim) while instances scale 100× — the wall
  must track instances (scan) and the digest-grain state must not;
- q_poisson_bootstrap: output stays 1 row; wall tracks rows × B map-side
  work with a B-invariant shuffle;
- q_auc / q_mann_whitney: distinct-value grain is content-bound (2dp
  quantization) — the rank state must stay flat at 100× events;
- q_dedup_url: canonical-group table stays at its collision-class
  cardinality; wall tracks the scan;
- q_attribution / q_markov_transitions: user-keyed windows — wall
  tracks events, output stays channel/type² grain;
- q_label_prop / q_bellman_ford: nation-grain edge lists are invariant;
  wall tracks the distill joins;
- q_hilbert: map-side key arithmetic + 64-bucket reduce;
- q_spearman: the declared exact-rank anchor — its range exchange is
  the one intentionally fact-scale term in the batch (the sf10 wall
  documents the cost the binned-rank approximation removes at 100 TB).

Usage: python scripts/scale_leg_r10.py [out_json]
Run alone (timings are part of the artifact).
"""
import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
sys.path.insert(0, ROOT)

OUT = sys.argv[1] if len(sys.argv) > 1 else os.path.join(ROOT, "SCALE_r10.json")

from pyspark.sql import functions as F  # noqa: E402

from crypto_data_ingestion_script_spark.catalog import load  # noqa: E402
from crypto_data_ingestion_script_spark.llm.dedup import cdc_chunks  # noqa: E402
from crypto_data_ingestion_script_spark.session import build_session  # noqa: E402
import __spark_entry__ as e  # noqa: E402

SCALES = {
    "sf1": os.path.join(ROOT, "benchdata", "sf1"),
    "sf10": os.path.join(ROOT, "benchdata", "sf10"),
}
OPS = [
    "q_hilbert", "q_dedup_url", "q_chunk_cdc", "q_poisson_bootstrap",
    "q_auc", "q_mann_whitney", "q_attribution", "q_markov_transitions",
    "q_label_prop", "q_bellman_ford", "q_kanon", "q_stickiness",
    "q_watermark_lateness", "q_source_overlap", "q_calibration_curve",
    "q_spearman",
]

spark = build_session("scale-leg-r10")
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
        "n_lineitem": t.lineitem.count(),
    }
    for name in OPS:
        walls, rows = [], None
        for _ in range(2):
            t0 = time.perf_counter()
            rows = qs[name](spark, d).count()
            walls.append(round(time.perf_counter() - t0, 2))
        rec[name] = {"walls": walls, "warm": walls[-1], "rows_out": rows}
        print(sf, name, rec[name], flush=True)
    # structural grains
    fp = cdc_chunks(t.documents).select(
        F.md5(F.encode(F.col("chunk_text"), "UTF-8")).alias("fp")
    )
    rec["cdc_distinct_chunks"] = fp.distinct().count()
    rec["cdc_chunk_instances"] = fp.count()
    rec["mw_distinct_values"] = (
        t.events.filter(F.col("event_type").isin("click", "purchase"))
        .select("value").distinct().count()
    )
    rec["url_dup_groups"] = qs["q_dedup_url"](spark, d).count()
    out["scales"][sf] = rec

with open(OUT, "w") as f:
    json.dump(out, f, indent=1)
print("WROTE", OUT)
