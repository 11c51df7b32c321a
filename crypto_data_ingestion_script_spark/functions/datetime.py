"""Date / time scalar functions (SURVEY §2.E) — the reference's temporal
vocabulary generalized.

Reference usage cited for parity: ISO-8601 render (dataCollector.py:126),
date extraction (:153), hour extraction (:154,181,186,193), truncate-to-hour
(:187-188), interval arithmetic (:187). All are JVM-side built-ins here —
whole-stage codegen, no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from .exact import davg
from ..registry import query


@query(
    "q_date_format",
    oracle="""
    SELECT event_id, strftime(ts, '%Y-%m-%dT%H:%M:%S') AS ts_iso
    FROM events
    """,
    tags=("datetime",),
)
def q_date_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ISO-8601 rendering at the edge — the reference stores ISO strings
    (dataCollector.py:126); we keep native timestamps and format only on
    output."""
    t = load(spark, sf_dir)
    return t.events.select(
        "event_id",
        F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss").alias("ts_iso"),
    )


@query(
    "q_to_date",
    oracle="""
    SELECT CAST(CAST(ts AS DATE) AS TIMESTAMP) AS d, count(*) AS n
    FROM events GROUP BY 1
    """,
    tags=("datetime",),
)
def q_to_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load(spark, sf_dir)
    return t.events.groupBy(
        F.to_date("ts").cast("timestamp_ntz").alias("d")
    ).agg(
        F.count(F.lit(1)).alias("n")
    )


@query(
    "q_extract_hour",
    oracle="""
    SELECT CAST(hour(ts) AS INTEGER) AS h, count(*) AS n,
           (CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / count(value)) AS avg_value
    FROM events GROUP BY 1
    """,
    tags=("datetime",),
)
def q_extract_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load(spark, sf_dir)
    return t.events.groupBy(F.hour("ts").alias("h")).agg(
        F.count(F.lit(1)).alias("n"), davg("value").alias("avg_value")
    )


@query(
    "q_date_trunc",
    oracle="""
    SELECT date_trunc('day', ts)    AS day_ts,
           date_trunc('minute', ts) AS minute_ts,
           event_id
    FROM events
    """,
    tags=("datetime",),
)
def q_date_trunc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Truncation at two granularities — the reference's replace(minute=0,
    second=0, microsecond=0) (dataCollector.py:187-188) as a built-in."""
    t = load(spark, sf_dir)
    return t.events.select(
        F.date_trunc("day", "ts").alias("day_ts"),
        F.date_trunc("minute", "ts").alias("minute_ts"),
        "event_id",
    )


@query(
    "q_interval",
    oracle="""
    SELECT event_id, ts, event_type
    FROM events
    WHERE ts > (SELECT max(ts) FROM events) - INTERVAL 1 DAY
    """,
    tags=("datetime",),
)
def q_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval arithmetic relative to max(ts) (never wall clock —
    deterministic). The 1-row aggregate is broadcast, so the main scan
    stays a single pass with the filter applied at read."""
    t = load(spark, sf_dir)
    max_ts = t.events.agg(F.max("ts").alias("max_ts"))
    return (
        t.events.crossJoin(F.broadcast(max_ts))
        .filter(F.col("ts") > F.col("max_ts") - F.expr("INTERVAL 1 DAY"))
        .select("event_id", "ts", "event_type")
    )


@query(
    "q_date_funcs",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate)  AS INTEGER)                       AS y,
           CAST(month(o_orderdate) AS INTEGER)                       AS m,
           CAST(dayofweek(o_orderdate) AS INTEGER)                   AS dow,
           CAST(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS TIMESTAMP) AS due_date,
           CAST(date_diff('day', CAST(o_orderdate AS DATE),
                          DATE '2000-01-01') AS BIGINT)              AS days_to_y2k,
           CAST(epoch(o_orderdate) AS BIGINT)                        AS unix_ts
    FROM orders
    """,
    tags=("datetime",),
)
def q_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """year/month/dayofweek/date_add/datediff/unix_timestamp family.
    Spark dayofweek is 1(Sun)..7; DuckDB is 0(Sun)..6 — normalized here."""
    t = load(spark, sf_dir)
    return t.orders.select(
        "o_orderkey",
        F.year("o_orderdate").alias("y"),
        F.month("o_orderdate").alias("m"),
        (F.dayofweek("o_orderdate") - F.lit(1)).alias("dow"),
        F.date_add(F.to_date("o_orderdate"), 30).cast("timestamp_ntz").alias("due_date"),
        F.datediff(F.lit("2000-01-01").cast("date"), F.to_date("o_orderdate"))
        .cast("bigint")
        .alias("days_to_y2k"),
        F.expr("unix_timestamp(o_orderdate)").alias("unix_ts"),
    )


@query(
    "q_date_arith",
    oracle="""
    SELECT o_orderkey,
           CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS TIMESTAMP) AS plus_3m,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP)     AS month_end,
           CAST(date_diff('month', DATE '1995-01-01',
                          CAST(o_orderdate AS DATE)) AS INTEGER)       AS months_since,
           CAST(weekofyear(o_orderdate) AS INTEGER)                   AS woy,
           CAST(CAST(quarter(o_orderdate) AS INTEGER) AS INTEGER)     AS qtr,
           CAST(date_trunc('week', CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS week_start
    FROM orders
    """,
    tags=("datetime",),
)
def q_date_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar arithmetic: add_months / last_day / month-diff /
    weekofyear / quarter / week truncation. Spark months_between counts
    fractional months, so the integer month-diff is computed from
    (year, month) fields to match DuckDB's date_diff('month') calendar
    semantics exactly."""
    t = load(spark, sf_dir)
    d = F.to_date("o_orderdate")
    months_since = (
        (F.year(d) - F.lit(1995)) * 12 + (F.month(d) - F.lit(1))
    ).cast("int")
    return t.orders.select(
        "o_orderkey",
        F.add_months(d, 3).cast("timestamp_ntz").alias("plus_3m"),
        F.last_day(d).cast("timestamp_ntz").alias("month_end"),
        months_since.alias("months_since"),
        F.weekofyear(d).alias("woy"),
        F.quarter(d).alias("qtr"),
        F.date_trunc("week", d).cast("timestamp_ntz").alias("week_start"),
    )
