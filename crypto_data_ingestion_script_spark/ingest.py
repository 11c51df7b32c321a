"""Bronze/silver lakehouse ingestion (SURVEY §1.3, §2.A) — the reference's
dual-store architecture (SQLite transient raw + PostgreSQL persistent
aggregates, /root/reference/README.md:16-31) as a medallion layout:

- bronze ``raw_ticks/``: parquet, partitioned by ``ingest_date``,
  append-only (replaces row-at-a-time SQLite INSERTs,
  dataCollector.py:120-128).
- silver ``hourly_bars/``: parquet, partitioned by ``date``, one row per
  (date, hour, symbol) (replaces PG ``downsampled_prices``,
  dataCollector.py:140-163).
- retention: drop bronze partitions older than a cutoff — one metadata-level
  partition delete per day, replacing ``DELETE FROM raw_prices`` which the
  reference re-runs ~720×/night (dataCollector.py:130-136,193-194 quirk,
  SURVEY §7.4.2).
- idempotent silver writes: dynamic partition overwrite + dropDuplicates on
  the PK replaces the reference's restart-crash PK violation
  (dataCollector.py:146-150 vs :73, SURVEY §7.4.3) — re-running a day is
  safe, exactly-once at rest.

At 100 TB: partition pruning on ingest_date/date bounds every downstream
scan; the silver rollup shuffles once on (hour, symbol); file counts are
controlled by AQE coalescing rather than per-row writes.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import load
from .operators.rollup import hourly_bars_table
from .registry import query


def write_bronze(ticks: DataFrame, bronze_path: str) -> None:
    """Append raw ticks partitioned by ingest date."""
    (
        ticks.withColumn("ingest_date", F.to_date("ts"))
        .write.mode("append")
        .partitionBy("ingest_date")
        .parquet(bronze_path)
    )


def rollup_to_silver(spark: SparkSession, bronze_path: str, silver_path: str) -> None:
    """Bronze → hourly OHLC bars → silver, idempotently.

    Dynamic partition overwrite: only the ``date`` partitions present in
    this batch are replaced; PK uniqueness enforced by dropDuplicates
    before write. Re-running the same day cannot duplicate rows — the
    exactly-once property the reference lacks."""
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    ticks = spark.read.parquet(bronze_path)
    bars = hourly_bars_table(ticks).dropDuplicates(["date", "hour", "symbol"])
    bars.write.mode("overwrite").partitionBy("date").parquet(silver_path)


def apply_retention(spark: SparkSession, bronze_path: str, keep_days: int, now_date) -> int:
    """Drop bronze partitions older than the cutoff (metadata-level: the
    partition directories are removed, no data rewrite). Returns partitions
    dropped."""
    import datetime as dt
    import shutil

    cutoff = now_date - dt.timedelta(days=keep_days)
    dropped = 0
    for entry in os.listdir(bronze_path):
        if not entry.startswith("ingest_date="):
            continue
        part_date = dt.date.fromisoformat(entry.split("=", 1)[1])
        if part_date < cutoff:
            shutil.rmtree(os.path.join(bronze_path, entry))
            dropped += 1
    return dropped


def _tick_stream_from_events(t) -> DataFrame:
    """Events reshaped into the reference's tick schema (role mapping per
    FIXTURES.md: ts→timestamp, event_type→symbol, value→price)."""
    return t.events.select(
        F.col("ts"), F.col("event_type").alias("symbol"), F.col("value").alias("price")
    )


@query("q_sink_bronze", tags=("sink", "ingest"))
def q_sink_bronze(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tick stream → partitioned bronze append → read back. Rows-only: the
    checked property is lossless partitioned persistence (count/schema)."""
    t = load(spark, sf_dir)
    bronze = os.path.join(tempfile.mkdtemp(prefix="bronze_"), "raw_ticks")
    write_bronze(_tick_stream_from_events(t), bronze)
    return spark.read.parquet(bronze).select("ts", "symbol", "price", "ingest_date")


@query(
    "q_sink_silver",
    oracle="""
    SELECT CAST(date_trunc('hour', ts) AS DATE) AS date,
           CAST(hour(ts) AS INTEGER)            AS hour,
           event_type                           AS symbol,
           arg_min(value, ts)                   AS open_price,
           max(value)                           AS high_price,
           min(value)                           AS low_price,
           arg_max(value, ts)                   AS close_price,
           avg(value)                           AS avg_price,
           count(*)                             AS sample_count
    FROM events GROUP BY 1, 2, 3
    """,
    tags=("sink", "ingest"),
)
def q_sink_silver(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full reference pipeline end-to-end: ticks → bronze → hourly rollup →
    idempotent silver (written TWICE to prove the overwrite is exactly-once)
    → read back. SQL-checked: the persisted silver table must equal the
    oracle's direct aggregation — persistence adds nothing, loses nothing."""
    t = load(spark, sf_dir)
    base = tempfile.mkdtemp(prefix="lake_")
    bronze, silver = os.path.join(base, "raw_ticks"), os.path.join(base, "hourly_bars")
    write_bronze(_tick_stream_from_events(t), bronze)
    rollup_to_silver(spark, bronze, silver)
    rollup_to_silver(spark, bronze, silver)  # idempotency: must not duplicate
    return spark.read.parquet(silver).select(
        "date",
        "hour",
        "symbol",
        "open_price",
        "high_price",
        "low_price",
        "close_price",
        "avg_price",
        "sample_count",
    )


@query("q_retention", tags=("ingest", "retention"))
def q_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention: write multi-day bronze, drop partitions older than the
    cutoff (keep 7 days from the corpus max date), return the survivors.
    Rows-only; the survivors' min(ingest_date) proves the drop happened."""
    import datetime as dt

    t = load(spark, sf_dir)
    bronze = os.path.join(tempfile.mkdtemp(prefix="bronze_ret_"), "raw_ticks")
    ticks = _tick_stream_from_events(t)
    write_bronze(ticks, bronze)
    max_date = ticks.agg(F.max(F.to_date("ts"))).collect()[0][0]
    apply_retention(spark, bronze, keep_days=7, now_date=max_date)
    return (
        spark.read.parquet(bronze)
        .groupBy("ingest_date")
        .agg(F.count(F.lit(1)).alias("n_ticks"))
    )
