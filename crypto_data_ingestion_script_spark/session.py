"""SparkSession construction and runtime configuration.

The driver harness owns its own SparkSession, so every conf we rely on for
correctness or performance must be a *runtime-settable* SQL conf applied via
``configure(spark)`` — called at the top of every query entry point.

Scale posture (100 TB design point, SURVEY.md §7.4.6):
- AQE on: runtime shuffle-partition coalescing + skew-join splitting mean one
  static ``spark.sql.shuffle.partitions`` value survives a 1000× scale-up.
- Arrow on: any pandas-UDF path moves columnar batches, not pickled rows.
- Session TZ pinned to UTC: parquet timestamps compare bit-identically with
  the UTC-naive DuckDB oracle and partition pruning on date derivations stays
  deterministic across clusters.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: Runtime-settable confs applied to any session handed to us.
RUNTIME_CONFS: dict[str, str] = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Spark's 10 MB auto-broadcast default is tuned for small executors;
    # at the 128 GiB-executor design point a filtered dim side of tens of
    # MB is still far cheaper to ship once than to shuffle the fact table
    # against (q_tpch_q3's orders⋈customer crosses 10 MB at sf1 and
    # silently degraded the lineitem join to a shuffle). 64 MB keeps the
    # decision size-aware — both the static planner and AQE's runtime
    # re-check fall back to shuffle joins past it.
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    "spark.sql.adaptive.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    # Eliminate correctness drift between engines: ANSI interval/date ops.
    "spark.sql.legacy.timeParserPolicy": "CORRECTED",
    # Driver testdata stores events.ts as parquet TIMESTAMP(NANOS), which
    # Spark has no native type for — read as long, catalog converts to
    # microsecond timestamp_ntz (truncation, matching DuckDB's ns→us read).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
}


def configure(spark: SparkSession) -> SparkSession:
    """Apply runtime confs (idempotent). Safe on a driver-owned session."""
    for k, v in RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            # Non-settable in this build — fine, it's an optimization conf.
            pass
    try:
        # One shuffle partition per available core beats the 200 default —
        # and OVER-partitioning is not free either: every stateful
        # streaming operator materializes one state-store instance per
        # shuffle partition per micro-batch, so a 32-partition conf on an
        # 8-core driver session made every stream pay 4× the state-store
        # commit overhead (measured 9.9 s → 1.3 s on the RocksDB stream
        # at sf0.01, local[8]). Size to the session's ACTUAL parallelism
        # (env-overridable); AQE coalescing keeps the number soft for
        # batch plans on a real cluster.
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        n = int(cpus) if cpus else spark.sparkContext.defaultParallelism
        spark.conf.set("spark.sql.shuffle.partitions", str(max(n, 8)))
    except Exception:
        pass
    return spark


def build_session(app_name: str = "crypto-spark-engine") -> SparkSession:
    """Local session for tests/bench: ``local[$SPARK_GRAFT_CPUS]``."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    master = f"local[{cpus}]"
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    spark = builder.getOrCreate()
    return configure(spark)
