#!/usr/bin/env python
"""Scale curves for the round-10 session-2 operators: wall times at
sf0.01 / sf0.1 (testdata) and sf1 (benchdata, 10x key-offset replication)
plus the structural counts that carry each op's 100 TB argument —

- q_anova / q_mann_whitney / q_dp_noise: output is ARM grain; walls must
  track the one fact scan. q_mann_whitney's window runs at DISTINCT-VALUE
  grain — that count is the op's real state, and value quantization (2dp)
  bounds it by content, not corpus size;
- q_poisson_bootstrap: shuffle width is B-invariant; the replicate axis
  multiplies the map side only, so wall should scale ~linearly with rows
  and the output stay exactly 1 row;
- q_spearman: the ONE genuinely rank-exchanging op of the batch — its sf
  curve shows the range-exchange cost the binned-rank approximation would
  remove at 100 TB;
- q_dedup_url: canonical-group count is content-bound under key-offset
  replication? NO — doc_id offsets create new (doc_id%40, doc_id%5)
  classes, so groups scale WITH docs here; the structural claim is the
  canonical key is strictly shorter than the raw URL (measured bytes);
- q_chunk_cdc: distinct chunk fingerprints are CONTENT-bound (text
  replicates verbatim), so the digest-grain state must stay flat at 10x
  docs while instances scale 10x — the storage-dedup promise;
- q_label_prop / q_bellman_ford: edge lists are content-bound (nation
  grain); walls track the distill scan, the Arrow batch is O(1);
- q_hilbert: pure map-side key arithmetic + 64-bucket reduce;
- q_kanon: QI-class count grows with users x days (real grain), k
  histogram stays bounded by max class size;
- q_readability: map-side scan + source-grain rollup.

Usage: python scripts/new_ops_scale_r10.py [out_json]
Run alone (timings are part of the artifact).
"""
import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
sys.path.insert(0, ROOT)

OUT = (
    sys.argv[1]
    if len(sys.argv) > 1
    else os.path.join(ROOT, "NEW_OPS_SCALE_r10.json")
)

from pyspark.sql import functions as F  # noqa: E402

from crypto_data_ingestion_script_spark.catalog import load  # noqa: E402
from crypto_data_ingestion_script_spark.llm.dedup import cdc_chunks  # noqa: E402
from crypto_data_ingestion_script_spark.session import build_session  # noqa: E402
import __spark_entry__ as e  # noqa: E402

SCALES = {
    "sf0.01": "/root/testdata/sf0.01",
    "sf0.1": "/root/testdata/sf0.1",
    "sf1": os.path.join(ROOT, "benchdata", "sf1"),
}
OPS = [
    "q_anova", "q_mann_whitney", "q_spearman", "q_poisson_bootstrap",
    "q_dedup_url", "q_readability", "q_hilbert", "q_label_prop",
    "q_bellman_ford", "q_chunk_cdc", "q_kanon", "q_dp_noise",
]

spark = build_session("new-ops-scale-r10")
spark.sparkContext.setLogLevel("ERROR")
qs = e.queries()

out = {"scales": {}}
for sf, d in SCALES.items():
    if not os.path.isdir(d) and not os.path.exists(d):
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

    # structural counts: the state grains each op's scale story rests on
    ev = t.events
    docs = t.documents
    rec["mw_distinct_values"] = (
        ev.filter(F.col("event_type").isin("click", "purchase"))
        .select("value")
        .distinct()
        .count()
    )
    chunks = cdc_chunks(docs)
    fp = chunks.select(
        F.md5(F.encode(F.col("chunk_text"), "UTF-8")).alias("fp")
    )
    rec["cdc_structure"] = {
        "n_chunk_instances": fp.count(),
        "n_distinct_chunks": fp.distinct().count(),
    }
    url_groups = qs["q_dedup_url"](spark, d)
    sample_len = docs.select(
        F.avg(
            F.length(
                F.concat(
                    F.lit("HTTPS://WWW."),
                    F.col("source"),
                    F.lit(".Example.COM:443/Docs/xx?utm_source=feed&id=1"),
                )
            )
        ).alias("raw_len")
    ).collect()[0]["raw_len"]
    rec["url_structure"] = {
        "n_dup_groups": url_groups.count(),
        "avg_raw_url_len": round(float(sample_len), 1),
    }
    rec["kanon_classes"] = (
        ev.groupBy(
            (F.col("user_id") % 100),
            F.col("ts").cast("date"),
            "event_type",
        )
        .count()
        .count()
    )
    # graph edge lists are nation-grain: content-bound
    rec["nation_edges"] = (
        t.lineitem.select("l_orderkey", "l_suppkey")
        .join(
            t.orders.select("o_orderkey", "o_custkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            F.broadcast(t.customer.select("c_custkey", "c_nationkey")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            F.broadcast(t.supplier.select("s_suppkey", "s_nationkey")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .select("c_nationkey", "s_nationkey")
        .distinct()
        .count()
    )
    out["scales"][sf] = rec

with open(OUT, "w") as f:
    json.dump(out, f, indent=1)
print("WROTE", OUT)
