"""Analytic window functions (SURVEY §2.G) — the natural query surface over
the reference's hourly bars (README.md:41-42 "queries which perform time
analysis"); the reference itself delegates all of this to PostgreSQL.

All ranking/offset frames here order by a unique tiebreaker so results are
deterministic (oracle hash requirement). Scale: one shuffle per distinct
partitionBy key set; frames evaluate streamingly within sorted partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import query
from .rollup import ohlc_bars


def _bars(t) -> DataFrame:
    """Hourly OHLC bars over events — window queries run on the rollup
    output, mirroring 'analysis over downsampled_prices'."""
    return ohlc_bars(t.events, ts_col="ts", key_col="event_type", value_col="value")


#: DuckDB CTE equivalent of _bars, shared by the oracles below.
_BARS_SQL = """
    bars AS (
      SELECT date_trunc('hour', ts) AS hour_ts,
             event_type,
             arg_min(value, ts)     AS open_price,
             max(value)             AS high_price,
             min(value)             AS low_price,
             arg_max(value, ts)     AS close_price,
             (CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / count(value)) AS avg_price,
             count(*)               AS sample_count
      FROM events GROUP BY 1, 2
    )
"""


@query(
    "q_rank",
    oracle=f"""
    WITH {_BARS_SQL}
    SELECT event_type, hour_ts, avg_price,
           CAST(row_number()   OVER w AS BIGINT) AS rn,
           CAST(rank()         OVER w AS BIGINT) AS rnk,
           CAST(dense_rank()   OVER w AS BIGINT) AS drnk,
           CAST(ntile(4)       OVER w AS BIGINT) AS quartile,
           percent_rank()      OVER w            AS prnk,
           cume_dist()         OVER w            AS cdist
    FROM bars
    WINDOW w AS (PARTITION BY event_type ORDER BY avg_price DESC, hour_ts)
    """,
    tags=("window",),
)
def q_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full ranking family over bars, per event_type by avg price."""
    t = load(spark, sf_dir)
    w = Window.partitionBy("event_type").orderBy(
        F.col("avg_price").desc(), F.col("hour_ts")
    )
    return _bars(t).select(
        "event_type",
        "hour_ts",
        "avg_price",
        F.row_number().over(w).cast("bigint").alias("rn"),
        F.rank().over(w).cast("bigint").alias("rnk"),
        F.dense_rank().over(w).cast("bigint").alias("drnk"),
        F.ntile(4).over(w).cast("bigint").alias("quartile"),
        F.percent_rank().over(w).alias("prnk"),
        F.cume_dist().over(w).alias("cdist"),
    )


@query(
    "q_lag",
    oracle=f"""
    WITH {_BARS_SQL}
    SELECT event_type, hour_ts, close_price,
           lag(close_price)  OVER w                AS prev_close,
           lead(close_price) OVER w                AS next_close,
           close_price - lag(close_price) OVER w   AS bar_change
    FROM bars
    WINDOW w AS (PARTITION BY event_type ORDER BY hour_ts)
    """,
    tags=("window",),
)
def q_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bar-over-bar offsets — also the batch analog of the reference's
    hour-change detection (dataCollector.py:186): a row where
    hour(prev) != hour(current) is a flush boundary."""
    t = load(spark, sf_dir)
    w = Window.partitionBy("event_type").orderBy("hour_ts")
    return _bars(t).select(
        "event_type",
        "hour_ts",
        "close_price",
        F.lag("close_price").over(w).alias("prev_close"),
        F.lead("close_price").over(w).alias("next_close"),
        (F.col("close_price") - F.lag("close_price").over(w)).alias("bar_change"),
    )


@query(
    "q_moving_avg",
    oracle=f"""
    WITH {_BARS_SQL}
    SELECT event_type, hour_ts, avg_price,
           round(avg(avg_price) OVER (PARTITION BY event_type
                                      ORDER BY hour_ts
                                      ROWS BETWEEN 3 PRECEDING
                                               AND CURRENT ROW), 8)
             AS ma4
    FROM bars
    """,
    tags=("window",),
)
def q_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4-bar moving average — the reference's avg_price generalized to a
    sliding frame."""
    t = load(spark, sf_dir)
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour_ts")
        .rowsBetween(-3, Window.currentRow)
    )
    return _bars(t).select(
        "event_type",
        "hour_ts",
        "avg_price",
        F.round(F.avg("avg_price").over(w), 8).alias("ma4"),
    )


@query(
    "q_running_sum",
    oracle=f"""
    WITH {_BARS_SQL}
    SELECT event_type, hour_ts, sample_count,
           CAST(sum(sample_count) OVER (PARTITION BY event_type ORDER BY hour_ts
                                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS cum_samples
    FROM bars
    """,
    tags=("window",),
)
def q_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load(spark, sf_dir)
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour_ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return _bars(t).select(
        "event_type",
        "hour_ts",
        "sample_count",
        F.sum("sample_count").over(w).alias("cum_samples"),
    )


@query(
    "q_first_last",
    oracle=f"""
    WITH {_BARS_SQL}
    SELECT event_type, hour_ts, close_price,
           first_value(close_price) OVER w AS day_first_close,
           last_value(close_price)  OVER w AS day_last_close,
           nth_value(close_price, 2) OVER w AS day_second_close
    FROM bars
    WINDOW w AS (PARTITION BY event_type, CAST(hour_ts AS DATE) ORDER BY hour_ts
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
    tags=("window",),
)
def q_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first/last/nth over a full-partition frame (the default frame would
    make last_value degenerate — classic pitfall, frame pinned explicitly)."""
    t = load(spark, sf_dir)
    w = (
        Window.partitionBy("event_type", F.to_date("hour_ts"))
        .orderBy("hour_ts")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return _bars(t).select(
        "event_type",
        "hour_ts",
        "close_price",
        F.first("close_price").over(w).alias("day_first_close"),
        F.last("close_price").over(w).alias("day_last_close"),
        F.nth_value("close_price", 2).over(w).alias("day_second_close"),
    )


@query(
    "q_topk_group",
    oracle=f"""
    WITH {_BARS_SQL},
    ranked AS (
      SELECT event_type, hour_ts, high_price,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY high_price DESC, hour_ts) AS rn
      FROM bars
    )
    SELECT event_type, hour_ts, high_price, CAST(rn AS BIGINT) AS rn
    FROM ranked WHERE rn <= 3
    """,
    tags=("window",),
)
def q_topk_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 hours per event_type by high price — row_number ≤ k. At scale
    this is the partial/final pattern: the window shuffle is the only
    exchange, no global sort."""
    t = load(spark, sf_dir)
    w = Window.partitionBy("event_type").orderBy(
        F.col("high_price").desc(), F.col("hour_ts")
    )
    return (
        _bars(t)
        .select(
            "event_type",
            "hour_ts",
            "high_price",
            F.row_number().over(w).cast("bigint").alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


@query(
    "q_moving_avg_time",
    oracle="""
    SELECT event_id, event_type, ts,
           round(avg(value) OVER (PARTITION BY event_type ORDER BY ts
                                  RANGE BETWEEN INTERVAL 1 HOUR PRECEDING
                                            AND CURRENT ROW), 8) AS avg_1h,
           count(*)  OVER (PARTITION BY event_type ORDER BY ts
                            RANGE BETWEEN INTERVAL 1 HOUR PRECEDING
                                      AND CURRENT ROW) AS n_1h
    FROM events
    """,
    tags=("window",),
)
def q_moving_avg_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time range frame: trailing 1-hour average per key —
    ``rangeBetween`` on epoch seconds, so the frame is defined by TIME not
    row count (irregular tick spacing gives different answers than the
    rows-based q_moving_avg). One shuffle on the partition key; the frame
    scan is a per-partition sliding cursor, never quadratic."""
    t = load(spark, sf_dir)
    # Epoch MICROseconds, not seconds: the oracle's INTERVAL arithmetic is
    # microsecond-exact, and second-truncation shifts frame boundaries for
    # ticks inside the same second.
    w = (
        Window.partitionBy("event_type")
        .orderBy(F.unix_micros(F.col("ts").cast("timestamp")))
        .rangeBetween(-3_600_000_000, Window.currentRow)
    )
    return t.events.select(
        "event_id",
        "event_type",
        "ts",
        F.round(F.avg("value").over(w), 8).alias("avg_1h"),
        F.count(F.lit(1)).over(w).cast("bigint").alias("n_1h"),
    )


@query(
    "q_rank_dist",
    oracle="""
    SELECT event_id, event_type, value,
           percent_rank() OVER (PARTITION BY event_type ORDER BY value) AS pr,
           cume_dist()    OVER (PARTITION BY event_type ORDER BY value) AS cd,
           ntile(4)       OVER (PARTITION BY event_type
                                ORDER BY value, event_id)               AS quartile
    FROM events
    """,
    tags=("window",),
)
def q_rank_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions: percent_rank / cume_dist (tie-stable
    on value alone) and ntile quartiles (event_id tiebreak makes bucket
    assignment deterministic). Same single-shuffle profile as q_rank."""
    t = load(spark, sf_dir)
    by_value = Window.partitionBy("event_type").orderBy("value")
    total = Window.partitionBy("event_type").orderBy("value", "event_id")
    return t.events.select(
        "event_id",
        "event_type",
        "value",
        F.percent_rank().over(by_value).alias("pr"),
        F.cume_dist().over(by_value).alias("cd"),
        F.ntile(4).over(total).alias("quartile"),
    )


@query(
    "q_nth_value",
    oracle="""
    SELECT event_id, event_type, value,
           nth_value(value, 3) OVER (PARTITION BY event_type ORDER BY event_id
                                     ROWS BETWEEN UNBOUNDED PRECEDING
                                              AND CURRENT ROW) AS third_seen
    FROM events
    """,
    tags=("window",),
)
def q_nth_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nth_value over a running frame: NULL until the 3rd row of each key's
    history, then pinned to that 3rd value — frame made explicit so Spark
    and the oracle agree on the default-frame subtlety."""
    t = load(spark, sf_dir)
    w = (
        Window.partitionBy("event_type")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return t.events.select(
        "event_id",
        "event_type",
        "value",
        F.nth_value("value", 3).over(w).alias("third_seen"),
    )


@query(
    "q_median_window",
    oracle="""
    SELECT event_id, event_type,
           round(median(value) OVER (PARTITION BY event_type
                                     ORDER BY ts, event_id
                                     ROWS BETWEEN 9 PRECEDING AND CURRENT ROW),
                 8) AS rolling_median
    FROM events
    """,
    tags=("window", "robust-stats"),
)
def q_median_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling (interpolated) median of the last 10 observations per key —
    the robust-statistics twin of q_moving_avg, outlier-proof where the
    mean is not. Spark has no median window function, so the frame is
    materialized as a bounded collect_list (10 elements — constant memory
    per row), sorted, and interpolated with pure array expressions; the
    whole thing stays in codegen, no UDF. A full-history frame would NOT
    scale this way — the bounded frame is the point: state per row is
    O(frame), not O(partition).

    Reference parity: robust analysis over downsampled_prices is delegated
    query surface (reference README.md:41-42); the reference keeps only the
    running mean (dataCollector.py:91-93).
    """
    t = load(spark, sf_dir)
    w = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(-9, Window.currentRow)
    )
    arr = F.array_sort(F.collect_list("value").over(w))
    n = F.size(arr)
    mid_hi = F.element_at(arr, (n / 2 + 1).cast("int"))
    mid_lo = F.element_at(arr, (n / 2).cast("int"))
    median = F.when(n % 2 == 1, F.element_at(arr, ((n + 1) / 2).cast("int"))).otherwise(
        (mid_lo + mid_hi) / 2.0
    )
    return t.events.select(
        "event_id",
        "event_type",
        F.round(median, 8).alias("rolling_median"),
    )


@query(
    "q_interval_overlap",
    oracle="""
    WITH pts AS (
      SELECT event_type, ts AS t, 1 AS delta FROM events
      UNION ALL
      SELECT event_type, ts + INTERVAL 30 MINUTE AS t, -1 AS delta FROM events
    ),
    swept AS (
      SELECT event_type,
             sum(delta) OVER (PARTITION BY event_type ORDER BY t, delta
                              ROWS BETWEEN UNBOUNDED PRECEDING
                                       AND CURRENT ROW) AS live
      FROM pts
    )
    SELECT event_type, CAST(max(live) AS BIGINT) AS peak_concurrent
    FROM swept GROUP BY event_type ORDER BY event_type
    """,
    tags=("window", "interval"),
)
def q_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak interval concurrency via sweep line: each event opens a
    half-open [ts, ts+30min) validity interval; the answer is the max
    number simultaneously live per key. The classic O(n^2) formulation is
    a self-join on range overlap; the sweep line is O(n log n) — unpivot
    every interval into a (+1 at start, -1 at end) point, running-sum in
    event order, take the max. Ends sort before starts at the same instant
    (delta ascending), so touching intervals do not overlap.

    One union (no shuffle — same source scanned twice, map-side), one
    shuffle on the partition key, streaming window. At 100 TB the per-key
    sweep is sequential by nature; the scale move is sweeping per (key,
    day) with carry-in counts when keys are few and partitions huge.
    """
    t = load(spark, sf_dir)
    starts = t.events.select("event_type", F.col("ts").alias("t"), F.lit(1).alias("delta"))
    ends = t.events.select(
        "event_type",
        (F.col("ts") + F.expr("INTERVAL 30 MINUTE")).alias("t"),
        F.lit(-1).alias("delta"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("t", "delta")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        starts.unionAll(ends)
        .select("event_type", F.sum("delta").over(w).alias("live"))
        .groupBy("event_type")
        .agg(F.max("live").alias("peak_concurrent"))
        .orderBy("event_type")
    )


@query(
    "q_topk_ties",
    oracle="""
    SELECT event_type, event_id, value, CAST(rnk AS BIGINT) AS rnk
    FROM (
      SELECT event_type, event_id, value,
             rank() OVER (PARTITION BY event_type ORDER BY value DESC) AS rnk
      FROM events
    )
    WHERE rnk <= 3
    ORDER BY event_type, rnk, event_id
    """,
    tags=("window", "topk"),
)
def q_topk_ties(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 per group WITH TIES (SQL:2008 FETCH ... WITH TIES semantics):
    rank() instead of q_topk_group's row_number(), so equal values at the
    boundary all survive — the difference between 'give me 3 rows' and
    'give me the top-3 values', which matters whenever downstream logic
    keys on the VALUE (price levels, score cutoffs). Same single-shuffle
    rank-and-filter shape; output cardinality is data-dependent.
    """
    t = load(spark, sf_dir)
    w = Window.partitionBy("event_type").orderBy(F.col("value").desc())
    return (
        t.events.select(
            "event_type", "event_id", "value", F.rank().over(w).alias("rnk")
        )
        .filter(F.col("rnk") <= 3)
        .select("event_type", "event_id", "value", F.col("rnk").cast("bigint").alias("rnk"))
        .orderBy("event_type", "rnk", "event_id")
    )


@query(
    "q_ratio_to_report",
    oracle="""
    SELECT event_type, event_id, value,
           round(value / sum(value) OVER (PARTITION BY event_type), 8)
             AS share_of_type,
           round(value / sum(value) OVER (), 8) AS share_of_total
    FROM events
    """,
    tags=("window", "agg"),
)
def q_ratio_to_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contribution analysis (Oracle/Teradata RATIO_TO_REPORT): each row's
    share of its group total and of the grand total, via unbounded window
    sums — no join back, no second scan. The grand-total window is a
    single-partition reduction of already-partial sums, not a
    single-partition sort of the data (no ORDER BY in the frame), so it
    stays safe at scale.
    """
    t = load(spark, sf_dir)
    by_type = Window.partitionBy("event_type")
    total = Window.partitionBy()
    return t.events.select(
        "event_type",
        "event_id",
        "value",
        F.round(F.col("value") / F.sum("value").over(by_type), 8).alias(
            "share_of_type"
        ),
        F.round(F.col("value") / F.sum("value").over(total), 8).alias(
            "share_of_total"
        ),
    )


@query(
    "q_window_distinct",
    oracle="""
    SELECT event_type, ts, event_id,
           count(DISTINCT user_id) OVER (PARTITION BY event_type
                                         ORDER BY ts, event_id
                                         ROWS BETWEEN UNBOUNDED PRECEDING
                                                  AND CURRENT ROW)
             AS distinct_users_so_far
    FROM events
    """,
    tags=("window", "distinct"),
)
def q_window_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running distinct-user count per key — Spark does not support
    DISTINCT aggregates over windows, so the engine expresses it as a
    FIRST-OCCURRENCE flag (row_number over (key, user) == 1) running-
    summed over the key's event order: a user adds 1 exactly at their
    first event, so the running sum of flags IS the running distinct
    count. Two window passes, both linear scans after their sort.

    The tempting one-pass form — size(collect_set(user_id)) over the
    running frame — re-materializes the growing set PER ROW: O(rows²)
    work and allocation per key partition, measured 169.7 s at sf1
    (1M rows/key) vs 3.7 s for this plan, and fatal at any real scale
    (the r12 full-registry sf1 sweep caught it). At true 100 TB
    cardinalities even the exact flag sum gives way to the HLL sketch
    variant (q_hll_sketch); this op is the exact twin for key-bounded
    cardinalities.
    """
    t = load(spark, sf_dir)
    w_user = Window.partitionBy("event_type", "user_id").orderBy(
        "ts", "event_id"
    )
    w_run = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # NULL user_ids must not count as a distinct user: the oracle's
    # count(DISTINCT user_id) OVER skips NULLs, but row_number over the
    # NULL partition would still emit a first-occurrence flag (ADVICE
    # r12) — gate the flag on non-null so a degraded corpus agrees.
    first = (
        F.when(
            F.col("user_id").isNotNull()
            & (F.row_number().over(w_user) == 1),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .cast("bigint")
    )
    return t.events.select(
        "event_type",
        "ts",
        "event_id",
        F.sum(first).over(w_run).cast("bigint").alias(
            "distinct_users_so_far"
        ),
    )
