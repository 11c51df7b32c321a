#!/usr/bin/env python
"""Shared streaming-floor decomposition (VERDICT r8 task 4).

7-8 of the >=2 s sf0.01 sweep floor rows are Structured Streaming
queries, each paying the same micro-batch machinery. This artifact
separates that cost into three layers so every current AND future
streaming row reads as shared-floor + marginal instead of growing the
floor-row count:

  1. ``shared_first_stream_s`` — wall of a MINIMAL streaming query
     (single-file parquet source, availableNow, groupBy count, memory
     sink) run FIRST in the session: one-time class loading / state
     store / offset-log / sink machinery. Paid once per session, by
     whichever streaming query runs first — in an alphabetical sweep
     that is q_source_datasource_stream.
  2. ``per_query_floor_s`` — the SAME minimal query re-run warm: the
     irreducible per-query cost every streaming query pays (new
     checkpoint dir, offset log init, plan analysis, >=2 micro-batches
     of trigger machinery — availableNow always runs a data batch plus
     a watermark-flush batch).
  3. per-query ``marginal_s`` — each floor row's WARM wall minus the
     per-query floor: the query's own data + state work. This is the
     only component that scales with anything.

Session shape matches driver_sim (plain local[8], default confs) so the
numbers decompose the sweep rows, and each query runs twice with the
first-use and warm walls both recorded.

Usage: python scripts/stream_floor.py [out_json]
"""
import json
import os
import sys
import tempfile
import time
import uuid

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
sys.path.insert(0, ROOT)

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/stream_floor.json"
SF = "/root/testdata/sf0.01"
QUERIES = [
    "q_source_datasource_stream",
    "q_stream_chained_stateful",
    "q_stream_incremental_dedup",
    "q_stream_left_join",
    "q_stream_rocksdb",
    "q_stream_silver",
    "q_stream_stateful",
    "q_stream_stream_join",
    "q_stream_tws",
]

from pyspark.sql import SparkSession  # noqa: E402

spark = SparkSession.builder.master("local[8]").getOrCreate()
spark.sparkContext.setLogLevel("ERROR")
# Batch-side warmup only (JVM, python workers, parquet reader) — the
# point is to measure the STREAMING machinery cold, so no stream warm.
spark.range(1_000_000).selectExpr("sum(id) s").collect()
spark.range(64).repartition(8).mapInPandas(lambda it: it, schema="id bigint").count()
spark.read.parquet(f"{SF}/region.parquet").count()

from crypto_data_ingestion_script_spark.registry import load_all  # noqa: E402
from crypto_data_ingestion_script_spark.session import configure  # noqa: E402

# Same conf surface the registry wrappers apply before every query —
# without it the minimal stream pays a 200-partition state store
# (25x the state instances of the queries it is supposed to floor).
configure(spark)
SPECS = load_all()


def minimal_stream() -> float:
    """Wall of the minimal availableNow parquet->agg->memory query."""
    name = f"floor_{uuid.uuid4().hex[:8]}"
    ckpt = tempfile.mkdtemp(prefix="floor_ckpt_")
    t0 = time.perf_counter()
    src = (
        spark.readStream.schema(spark.read.parquet(f"{SF}/region.parquet").schema)
        .option("pathGlobFilter", "region.parquet")
        .parquet(SF)
    )
    q = (
        src.groupBy("r_regionkey")
        .count()
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    spark.sql(f"SELECT count(*) FROM {name}").collect()
    spark.catalog.dropTempView(name)
    return round(time.perf_counter() - t0, 2)


out: dict = {"session": "plain local[8], default confs (driver_sim shape)", "sf": SF}
out["shared_first_stream_s"] = minimal_stream()
floors = [minimal_stream() for _ in range(3)]
out["per_query_floor_s"] = round(sum(floors) / len(floors), 2)
out["per_query_floor_runs"] = floors

rows = {}
for name in QUERIES:
    fn = SPECS[name].fn
    t0 = time.perf_counter()
    n1 = fn(spark, SF).count()
    first = round(time.perf_counter() - t0, 2)
    t0 = time.perf_counter()
    fn(spark, SF).count()
    warm = round(time.perf_counter() - t0, 2)
    rows[name] = {
        "first_s": first,
        "warm_s": warm,
        "marginal_s": round(warm - out["per_query_floor_s"], 2),
        "rows": n1,
    }
    print(name, rows[name], flush=True)
out["queries"] = rows
out["note"] = (
    "Every streaming sweep row = shared_first_stream_s (once per "
    "session, first streaming query only) + per_query_floor_s "
    "(irreducible per-query micro-batch machinery: checkpoint dir, "
    "offset log, plan analysis, availableNow's data+flush batches) + "
    "marginal_s (the query's own data/state work). Marginals under "
    "~1 s mean the row is all floor; the floor amortizes to zero on "
    "any long-running production stream, where one query start serves "
    "unbounded micro-batches. Component-level timings of the same "
    "machinery: stream_decomp_r07.json (StreamingQueryProgress "
    "durationMs breakdown; state commit scales with partition count, "
    "not rows)."
)

with open(OUT, "w") as f:
    json.dump(out, f, indent=1)
print(json.dumps(out, indent=1))
