"""Market-analytics composites over the events stream — the query family the
reference's README points its "downsampled_prices" store at
(/root/reference/README.md:41-42, dataCollector.py:140-163): VWAP, Bollinger
bands, EMA, anomaly z-scores, and gap-filled bar series.

All five are pure DataFrame compositions (no Python in the hot path) and
every one has a DuckDB oracle.

Scale notes (100 TB design point):
- q_vwap / q_gap_fill group on (event_type, calendar bucket) — bounded
  cardinality (#types × #buckets), so the final agg is tiny regardless of
  input size; the only shuffle is the partial-aggregated one.
- q_bollinger / q_zscore / q_ema shuffle once on event_type and then run
  window/agg functions partition-locally. Per-key series windows are the
  canonical time-series layout: one key's history per partition. Skewed key
  histories would be handled by range-repartitioning on (key, time) and
  windowing per segment (see skew.py for the salting pattern).
- q_ema uses the algebraic closed form EMA_n = a·Σ r^{n-i}·x_i + r^{n-1}·x_1
  (r = 1-a) so the whole recurrence is one grouped SUM — no iteration, no
  UDF, and map-side partial aggregation applies. Exponents only appear as
  r^{positive}, which underflows to 0 for ancient rows instead of
  overflowing — stable at any history length.
- q_gap_fill materializes the hour spine with sequence()+explode from the
  per-key min/max — O(#keys × #hours) rows, never a driver-side loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load
from ..functions.exact import dsum
from ..registry import query

_EMA_ALPHA = 0.03


@query(
    "q_vwap",
    oracle="""
    SELECT date_trunc('day', ts) AS day_ts,
           event_type,
           CAST(sum(CAST(value * CAST(json_extract_string(props, '$.k') AS BIGINT) AS DECIMAL(18,6))) AS DOUBLE)
             / CAST(sum(CAST(CAST(json_extract_string(props, '$.k') AS BIGINT) AS DECIMAL(18,6))) AS DOUBLE) AS vwap,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS volume
    FROM events
    WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) > 0
    GROUP BY 1, 2
    """,
    tags=("finance", "agg"),
)
def q_vwap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily volume-weighted average price per event_type; volume comes out
    of the JSON props payload (props.k), mirroring the reference's
    API-JSON → metric path (dataCollector.py:97-117)."""
    t = load(spark, sf_dir)
    vol = F.get_json_object("props", "$.k").cast("bigint")
    return (
        t.events.withColumn("vol", vol)
        .filter(F.col("vol") > 0)
        .groupBy(
            F.date_trunc("day", "ts").alias("day_ts"),
            "event_type",
        )
        .agg(
            (dsum(F.col("value") * F.col("vol")) / dsum(F.col("vol"))).alias("vwap"),
            F.sum("vol").alias("volume"),
        )
    )


@query(
    "q_bollinger",
    oracle="""
    WITH w AS (
      SELECT event_id, event_type, value,
             avg(value)         OVER frame AS mid,
             stddev_samp(value) OVER frame AS sd,
             row_number()       OVER (PARTITION BY event_type
                                      ORDER BY event_id) AS rn
      FROM events
      WINDOW frame AS (PARTITION BY event_type ORDER BY event_id
                       ROWS BETWEEN 23 PRECEDING AND CURRENT ROW)
    )
    SELECT event_id, event_type, value,
           round(mid, 8)          AS mid,
           round(mid + 2 * sd, 8) AS upper_band,
           round(mid - 2 * sd, 8) AS lower_band
    FROM w
    WHERE rn >= 24
    """,
    tags=("finance", "window"),
)
def q_bollinger(spark: SparkSession, sf_dir: str) -> DataFrame:
    """24-sample Bollinger bands (mid ± 2σ) per event_type series; only
    full frames are emitted so band widths are well-defined."""
    t = load(spark, sf_dir)
    frame = (
        Window.partitionBy("event_type").orderBy("event_id").rowsBetween(-23, 0)
    )
    seq = Window.partitionBy("event_type").orderBy("event_id")
    sd = F.stddev_samp("value").over(frame)
    mid = F.avg("value").over(frame)
    return (
        t.events.select(
            "event_id",
            "event_type",
            "value",
            F.round(mid, 8).alias("mid"),
            F.round(mid + 2 * sd, 8).alias("upper_band"),
            F.round(mid - 2 * sd, 8).alias("lower_band"),
            F.row_number().over(seq).alias("rn"),
        )
        .filter(F.col("rn") >= 24)
        .drop("rn")
    )


@query(
    "q_ema",
    oracle=f"""
    WITH seq AS (
      SELECT event_type, value,
             row_number() OVER (PARTITION BY event_type ORDER BY event_id) AS rn,
             count(*)     OVER (PARTITION BY event_type)                   AS cnt
      FROM events
    )
    SELECT event_type, round(ema_raw, 8) AS ema FROM (
    SELECT event_type,
           sum(CASE WHEN rn = 1
                    THEN power(1 - {_EMA_ALPHA}, cnt - 1) * value
                    ELSE {_EMA_ALPHA} * power(1 - {_EMA_ALPHA}, cnt - rn) * value
               END) AS ema_raw
    FROM seq
    GROUP BY event_type
    ) raw_ema
    """,
    tags=("finance", "agg"),
)
def q_ema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Final exponential moving average per event_type via the algebraic
    closed form — the recurrence EMA_n = a·x_n + (1-a)·EMA_{n-1} unrolled
    into one grouped SUM (see module docstring), seeded EMA_1 = x_1."""
    t = load(spark, sf_dir)
    a, r = _EMA_ALPHA, 1 - _EMA_ALPHA
    per_key = Window.partitionBy("event_type")
    seq = per_key.orderBy("event_id")
    rn = F.row_number().over(seq)
    cnt = F.count(F.lit(1)).over(per_key)
    term = F.when(
        rn == 1, F.pow(F.lit(r), cnt - 1) * F.col("value")
    ).otherwise(F.lit(a) * F.pow(F.lit(r), cnt - rn) * F.col("value"))
    return (
        t.events.select("event_type", term.alias("term"))
        .groupBy("event_type")
        .agg(F.round(F.sum("term"), 8).alias("ema"))
    )


@query(
    "q_zscore",
    oracle="""
    WITH s AS (
      SELECT event_id, event_type, value,
             round((value - avg(value) OVER (PARTITION BY event_type))
               / stddev_samp(value) OVER (PARTITION BY event_type), 8) AS z
      FROM events
    )
    SELECT event_id, event_type, value, z
    FROM s
    WHERE abs(z) > 2.5
    """,
    tags=("finance", "window"),
)
def q_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anomalous samples: |z| > 2.5 against the per-event_type distribution
    — the outlier gate a production ingestion loop would quarantine on."""
    t = load(spark, sf_dir)
    per_key = Window.partitionBy("event_type")
    # z rounds 8dp BEFORE the |z| > 2.5 gate on both engines, so a
    # last-ulp moment difference can never flip a boundary row's
    # membership (rounding-contract lint, r12).
    z = F.round(
        (F.col("value") - F.avg("value").over(per_key))
        / F.stddev_samp("value").over(per_key),
        8,
    )
    return (
        t.events.select("event_id", "event_type", "value", z.alias("z"))
        .filter(F.abs(F.col("z")) > 2.5)
    )


@query(
    "q_gap_fill",
    oracle="""
    WITH bars AS (
      SELECT event_type, date_trunc('hour', ts) AS hour_ts,
             arg_max(value, ts) AS close_price, count(*) AS n_events
      FROM events GROUP BY 1, 2
    ),
    spine AS (
      SELECT event_type,
             unnest(generate_series(min(hour_ts), max(hour_ts),
                                    INTERVAL 1 HOUR)) AS hour_ts
      FROM bars GROUP BY event_type
    ),
    j AS (
      SELECT s.event_type, s.hour_ts, b.n_events, b.close_price
      FROM spine s LEFT JOIN bars b USING (event_type, hour_ts)
    )
    SELECT event_type, hour_ts,
           COALESCE(n_events, 0) AS n_events,
           close_price IS NULL   AS is_gap,
           last_value(close_price IGNORE NULLS)
             OVER (PARTITION BY event_type ORDER BY hour_ts
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS close_filled
    FROM j
    """,
    tags=("finance", "window"),
)
def q_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense hourly bar series: generate the full hour spine per event_type
    (sequence + explode), left-join the observed bars, and forward-fill the
    close with last(…, ignorenulls) — the reference's downsampler emits
    nothing for empty hours (dataCollector.py:140-163); this closes them."""
    t = load(spark, sf_dir)
    bars = (
        t.events.groupBy(
            "event_type", F.date_trunc("hour", "ts").alias("hour_ts")
        )
        .agg(
            F.max_by("value", "ts").alias("close_price"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
    spine = (
        bars.groupBy("event_type")
        .agg(F.min("hour_ts").alias("lo"), F.max("hour_ts").alias("hi"))
        .select(
            "event_type",
            F.explode(
                F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))
            ).alias("hour_ts"),
        )
    )
    ffill = (
        Window.partitionBy("event_type")
        .orderBy("hour_ts")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return spine.join(bars, ["event_type", "hour_ts"], "left").select(
        "event_type",
        "hour_ts",
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        F.col("close_price").isNull().alias("is_gap"),
        F.last("close_price", ignorenulls=True).over(ffill).alias(
            "close_filled"
        ),
    )


@query(
    "q_rsi",
    oracle="""
    WITH d AS (
      SELECT event_id, event_type, value,
             value - lag(value) OVER w AS delta,
             row_number()       OVER w AS rn
      FROM events
      WINDOW w AS (PARTITION BY event_type ORDER BY event_id)
    ),
    g AS (
      SELECT event_id, event_type, rn,
             avg(CASE WHEN delta > 0 THEN delta ELSE 0 END) OVER frame AS avg_gain,
             avg(CASE WHEN delta < 0 THEN -delta ELSE 0 END) OVER frame AS avg_loss
      FROM d
      WINDOW frame AS (PARTITION BY event_type ORDER BY event_id
                       ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
    )
    SELECT event_id, event_type,
           round(CASE WHEN avg_loss = 0 THEN 100.0
                      ELSE 100.0 - 100.0 / (1 + avg_gain / avg_loss) END,
                 8) AS rsi
    FROM g
    WHERE rn >= 15
    """,
    tags=("finance", "window"),
)
def q_rsi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RSI-14 (simple-average variant: Cutler's RSI — window-expressible,
    unlike Wilder's recursive smoothing which would need the EMA
    closed-form trick from q_ema): bar-over-bar deltas split into
    gain/loss streams, 14-bar trailing averages, RSI = 100·gain/(gain+
    loss). One window shuffle per key — same profile as q_bollinger.
    Rows before the 15th (no full lookback) are excluded on both sides."""
    t = load(spark, sf_dir)
    from pyspark.sql import Window

    w = Window.partitionBy("event_type").orderBy("event_id")
    frame = w.rowsBetween(-13, 0)
    d = t.events.select("event_id", "event_type", "value").withColumn(
        "delta", F.col("value") - F.lag("value").over(w)
    ).withColumn("rn", F.row_number().over(w))
    g = d.withColumn(
        "avg_gain",
        F.avg(F.when(F.col("delta") > 0, F.col("delta")).otherwise(0.0)).over(frame),
    ).withColumn(
        "avg_loss",
        F.avg(F.when(F.col("delta") < 0, -F.col("delta")).otherwise(0.0)).over(frame),
    )
    rsi = F.when(F.col("avg_loss") == 0, F.lit(100.0)).otherwise(
        F.lit(100.0) - F.lit(100.0) / (1 + F.col("avg_gain") / F.col("avg_loss"))
    )
    return (
        g.filter(F.col("rn") >= 15)
        .select("event_id", "event_type", F.round(rsi, 8).alias("rsi"))
    )


@query(
    "q_twap",
    oracle="""
    WITH seg AS (
      SELECT event_type, value,
             epoch_us(lead(ts) OVER w) - epoch_us(ts) AS dur_us
      FROM events
      WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)
    )
    SELECT event_type,
           round(sum(value * dur_us) / sum(dur_us), 8) AS twap
    FROM seg WHERE dur_us IS NOT NULL
    GROUP BY event_type
    """,
    tags=("finance", "window"),
)
def q_twap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TWAP — each tick weighted by how long its price HELD (until the
    next tick), the manipulation-resistant twin of VWAP (q_vwap weights
    by traded volume; TWAP by elapsed time). One window pass builds the
    holding durations, one grouped agg folds them — same two-exchange
    profile as every per-key window+agg here. The open-ended last tick
    (no successor) is excluded on both sides."""
    from pyspark.sql import Window

    t = load(spark, sf_dir)
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    seg = t.events.select(
        "event_type",
        "value",
        (
            F.unix_micros(F.lead("ts").over(w).cast("timestamp"))
            - F.unix_micros(F.col("ts").cast("timestamp"))
        ).alias("dur_us"),
    ).filter(F.col("dur_us").isNotNull())
    return seg.groupBy("event_type").agg(
        F.round(
            F.sum(F.col("value") * F.col("dur_us")) / F.sum("dur_us"), 8
        ).alias("twap")
    )


@query(
    "q_drawdown",
    oracle="""
    WITH r AS (
      SELECT event_type, ts, event_id, value,
             max(value) OVER (PARTITION BY event_type ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS peak
      FROM events
    )
    SELECT event_type,
           round(max((peak - value) / peak), 8) AS max_drawdown
    FROM r
    GROUP BY event_type
    """,
    tags=("finance", "window"),
)
def q_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum drawdown: running peak (cumulative max window) → relative
    drop → grouped max. The canonical risk metric, and the canonical
    running-extreme window pattern (cummax) — one window shuffle, one
    bounded agg."""
    from pyspark.sql import Window

    t = load(spark, sf_dir)
    w = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    r = t.events.select(
        "event_type", "value", F.max("value").over(w).alias("peak")
    )
    return r.groupBy("event_type").agg(
        F.round(
            F.max((F.col("peak") - F.col("value")) / F.col("peak")), 8
        ).alias("max_drawdown")
    )


@query(
    "q_realized_vol",
    oracle="""
    WITH r AS (
      SELECT event_type,
             ln(value / lag(value) OVER (PARTITION BY event_type
                                         ORDER BY ts, event_id)) AS lr
      FROM events
      WHERE value > 0
    )
    SELECT event_type,
           round(sqrt(sum(lr * lr)), 8) AS realized_vol,
           count(lr) AS n_returns
    FROM r WHERE lr IS NOT NULL
    GROUP BY event_type
    """,
    tags=("finance", "window"),
)
def q_realized_vol(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Realized volatility: √Σ(log-returns²) per key — the standard
    model-free vol estimator. Log returns come from one lag window; the
    quadratic variation folds in the same grouped agg. Zero/negative
    prices are excluded before the log on both sides."""
    from pyspark.sql import Window

    t = load(spark, sf_dir)
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    r = (
        t.events.filter(F.col("value") > 0)
        .select(
            "event_type",
            F.log(F.col("value") / F.lag("value").over(w)).alias("lr"),
        )
        .filter(F.col("lr").isNotNull())
    )
    return r.groupBy("event_type").agg(
        F.round(F.sqrt(F.sum(F.col("lr") * F.col("lr"))), 8).alias("realized_vol"),
        F.count("lr").alias("n_returns"),
    )


@query(
    "q_corr_matrix",
    oracle="""
    WITH bars AS (
      SELECT date_trunc('hour', ts) AS h, event_type, avg(value) AS v
      FROM events GROUP BY 1, 2
    )
    SELECT a.event_type AS type_a, b.event_type AS type_b,
           round(corr(a.v, b.v), 8) AS rho,
           count(*) AS n_hours
    FROM bars a JOIN bars b ON a.h = b.h AND a.event_type < b.event_type
    GROUP BY 1, 2
    """,
    tags=("finance", "stats", "join"),
)
def q_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise cross-series correlation: downsample each key to hourly
    bars (the fact-volume reduction happens FIRST — the self-join runs on
    dimension-sized bars, never on raw ticks), equi-join on the hour with
    a triangular key predicate, one corr() fold per pair. At 100 TB the
    bar table is what a 1000× tick stream collapses to, so the quadratic
    pair-join stays cheap regardless of input scale."""
    t = load(spark, sf_dir)
    bars = (
        t.events.groupBy(
            F.date_trunc("hour", "ts").alias("h"),
            "event_type",
        )
        .agg(F.avg("value").alias("v"))
    )
    a = bars.select(
        F.col("h"), F.col("event_type").alias("type_a"), F.col("v").alias("va")
    )
    b = bars.select(
        F.col("h").alias("hb"),
        F.col("event_type").alias("type_b"),
        F.col("v").alias("vb"),
    )
    return (
        a.join(b, (a.h == b.hb) & (a.type_a < b.type_b))
        .groupBy("type_a", "type_b")
        .agg(
            F.round(F.corr("va", "vb"), 8).alias("rho"),
            F.count(F.lit(1)).alias("n_hours"),
        )
    )


@query(
    "q_weighted_median",
    oracle="""
    WITH cum AS (
      SELECT l_returnflag, l_extendedprice, l_quantity,
             sum(l_quantity) OVER (PARTITION BY l_returnflag
                                   ORDER BY l_extendedprice, l_orderkey, l_linenumber
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                            AND CURRENT ROW) AS cw,
             sum(l_quantity) OVER (PARTITION BY l_returnflag) AS tw
      FROM lineitem
    )
    SELECT l_returnflag,
           round(min(l_extendedprice), 4) AS weighted_median_price
    FROM cum
    WHERE cw >= tw / 2
    GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    tags=("finance", "robust-stats"),
)
def q_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted median price per return flag: the smallest price
    at which cumulative quantity reaches half the group's total — the
    volume-centric 'typical price' (plain median treats a 1-unit and a
    50-unit line identically; TWAP/VWAP are the mean-family analogs).

    The group key has THREE values, so a per-group window funnels the
    whole fact table through 3 sort tasks — the low-cardinality cousin
    of the single-partition window. Instead, the cumulative weight rides
    the two-pass GLOBAL running sum (ranking.py) over the composite
    order (flag, price, tiebreaks): range partitions keep every
    input-sized step 32-way parallel, and the within-flag cumulative is
    recovered as global_cum − flag_prefix_offset, where the per-flag
    totals/offsets are a 3-row broadcast. Same filter + min afterwards;
    parallelism no longer degrades with group cardinality.
    """
    from ..ranking import global_running_sum

    t = load(spark, sf_dir)
    rows = t.lineitem.select(
        "l_returnflag", "l_extendedprice", "l_orderkey", "l_linenumber",
        "l_quantity",
    )
    g = global_running_sum(
        rows,
        "l_quantity",
        "l_returnflag",
        "l_extendedprice",
        "l_orderkey",
        "l_linenumber",
        out_col="gcw",
    )
    flag_w = Window.orderBy("l_returnflag").rowsBetween(
        Window.unboundedPreceding, -1
    )
    flags = (
        rows.groupBy("l_returnflag")
        .agg(F.sum("l_quantity").alias("tw"))
        .withColumn("off", F.coalesce(F.sum("tw").over(flag_w), F.lit(0)))
    )
    return (
        g.join(F.broadcast(flags), "l_returnflag")
        .filter((F.col("gcw") - F.col("off")) >= F.col("tw") / 2)
        .groupBy("l_returnflag")
        .agg(F.round(F.min("l_extendedprice"), 4).alias("weighted_median_price"))
        .orderBy("l_returnflag")
    )


@query(
    "q_interpolate",
    oracle="""
    WITH bars AS (
      SELECT event_type, date_trunc('hour', ts) AS hour_ts,
             arg_max(value, ts) AS close_price
      FROM events GROUP BY 1, 2
    ),
    spine AS (
      SELECT event_type,
             unnest(generate_series(min(hour_ts), max(hour_ts),
                                    INTERVAL 1 HOUR)) AS hour_ts
      FROM bars GROUP BY event_type
    ),
    j AS (
      SELECT s.event_type, s.hour_ts, b.close_price,
             row_number() OVER (PARTITION BY s.event_type
                                ORDER BY s.hour_ts) AS rn
      FROM spine s LEFT JOIN bars b USING (event_type, hour_ts)
    ),
    ctx AS (
      SELECT event_type, hour_ts, close_price, rn,
             last_value(close_price IGNORE NULLS) OVER wp AS pv,
             last_value(CASE WHEN close_price IS NOT NULL THEN rn END
                        IGNORE NULLS) OVER wp AS pr,
             first_value(close_price IGNORE NULLS) OVER wf AS nv,
             first_value(CASE WHEN close_price IS NOT NULL THEN rn END
                         IGNORE NULLS) OVER wf AS nr
      FROM j
      WINDOW wp AS (PARTITION BY event_type ORDER BY rn
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             wf AS (PARTITION BY event_type ORDER BY rn
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT event_type, hour_ts,
           round(CASE
             WHEN close_price IS NOT NULL THEN close_price
             WHEN pv IS NOT NULL AND nv IS NOT NULL
               THEN pv + (nv - pv) * (rn - pr) / CAST(nr - pr AS DOUBLE)
           END, 8) AS close_interp,
           close_price IS NULL AS was_gap
    FROM ctx ORDER BY event_type, hour_ts
    """,
    tags=("finance", "window"),
)
def q_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear interpolation across empty hours — the smooth-fill sibling
    of q_gap_fill's step-function forward fill (forward fill biases any
    downstream return/vol computation; interpolation splits the move
    across the gap). Missing bars get prev + (next-prev) * elapsed
    fraction; leading/trailing gaps stay NULL (no extrapolation).

    The elapsed fraction uses spine ROW offsets, not timestamp
    arithmetic: the hour spine is regular by construction, and row
    offsets sidestep NTZ-interval division entirely (same trick both
    engines express identically). Four windows, all over the same
    (event_type, rn) sort — one shuffle, one sort, streaming frames.
    """
    t = load(spark, sf_dir)
    bars = t.events.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hour_ts")
    ).agg(F.max_by("value", "ts").alias("close_price"))
    spine = (
        bars.groupBy("event_type")
        .agg(F.min("hour_ts").alias("lo"), F.max("hour_ts").alias("hi"))
        .select(
            "event_type",
            F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias(
                "hour_ts"
            ),
        )
    )
    order_w = Window.partitionBy("event_type").orderBy("hour_ts")
    j = spine.join(bars, ["event_type", "hour_ts"], "left").withColumn(
        "rn", F.row_number().over(order_w)
    )
    wp = (
        Window.partitionBy("event_type")
        .orderBy("rn")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy("event_type")
        .orderBy("rn")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    at_bar = F.col("close_price").isNotNull()
    ctx = j.select(
        "event_type",
        "hour_ts",
        "close_price",
        "rn",
        F.last("close_price", ignorenulls=True).over(wp).alias("pv"),
        F.last(F.when(at_bar, F.col("rn")), ignorenulls=True).over(wp).alias("pr"),
        F.first("close_price", ignorenulls=True).over(wf).alias("nv"),
        F.first(F.when(at_bar, F.col("rn")), ignorenulls=True).over(wf).alias("nr"),
    )
    interp = F.col("pv") + (F.col("nv") - F.col("pv")) * (
        F.col("rn") - F.col("pr")
    ) / (F.col("nr") - F.col("pr")).cast("double")
    return ctx.select(
        "event_type",
        "hour_ts",
        F.round(
            F.when(F.col("close_price").isNotNull(), F.col("close_price")).otherwise(
                F.when(
                    F.col("pv").isNotNull() & F.col("nv").isNotNull(), interp
                )
            ),
            8,
        ).alias("close_interp"),
        F.col("close_price").isNull().alias("was_gap"),
    ).orderBy("event_type", "hour_ts")


@query(
    "q_cusum",
    oracle="""
    WITH bars AS (
      SELECT event_type, date_trunc('hour', ts) AS hour_ts,
             arg_max(value, ts) AS close_price
      FROM events GROUP BY 1, 2
    ),
    centered AS (
      SELECT event_type, hour_ts,
             close_price - avg(close_price) OVER (PARTITION BY event_type)
               - 0.5 AS adj
      FROM bars
    ),
    prefix AS (
      SELECT event_type, hour_ts,
             sum(adj) OVER (PARTITION BY event_type ORDER BY hour_ts
                            ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND CURRENT ROW) AS p
      FROM centered
    ),
    floored AS (
      SELECT event_type, hour_ts, p,
             min(p) OVER (PARTITION BY event_type ORDER BY hour_ts
                          ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND CURRENT ROW) AS run_min
      FROM prefix
    )
    SELECT event_type, hour_ts,
           round(p - least(run_min, 0), 8) AS cusum_stat,
           p - least(run_min, 0) > 25 AS alarm
    FROM floored ORDER BY event_type, hour_ts
    """,
    tags=("finance", "window", "changepoint"),
)
def q_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sided CUSUM change detection over hourly closes. The textbook
    statistic is the recursion S_t = max(0, S_{t-1} + x_t - mu - k) —
    not directly a window function. But the recursion has a closed form:
    with P_t the prefix sum of (x - mu - k),

        S_t = P_t - min(0, min_{i<=t} P_i)

    (the running max-with-floor is the prefix sum re-based at its running
    minimum). Both sides become plain streaming window aggregates — the
    same recursion-to-closed-form move as the EMA operator, which is how
    stateful control charts run as one-pass distributed plans instead of
    sequential loops. Alarm threshold h=25, drift k=0.5, mu = per-key
    mean (two-pass; a known reference mean makes it single-pass).
    """
    t = load(spark, sf_dir)
    bars = t.events.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hour_ts")
    ).agg(F.max_by("value", "ts").alias("close_price"))
    mu_w = Window.partitionBy("event_type")
    run_w = (
        Window.partitionBy("event_type")
        .orderBy("hour_ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    centered = bars.select(
        "event_type",
        "hour_ts",
        (F.col("close_price") - F.avg("close_price").over(mu_w) - 0.5).alias("adj"),
    )
    prefix = centered.select(
        "event_type",
        "hour_ts",
        F.sum("adj").over(run_w).alias("p"),
    ).withColumn("run_min", F.min("p").over(run_w))
    stat = F.col("p") - F.least(F.col("run_min"), F.lit(0.0))
    return prefix.select(
        "event_type",
        "hour_ts",
        F.round(stat, 8).alias("cusum_stat"),
        (stat > 25).alias("alarm"),
    ).orderBy("event_type", "hour_ts")


#: Shared hourly-bar CTE for the bar-derived indicators below — identical
#: to q_ohlc_hourly's oracle.
_BARS_SQL = """
      SELECT date_trunc('hour', ts) AS hour_ts,
             event_type,
             max(value)             AS high_price,
             min(value)             AS low_price,
             arg_max(value, ts)     AS close_price,
             count(*)               AS sample_count
      FROM events GROUP BY 1, 2
"""


@query(
    "q_atr",
    oracle=f"""
    WITH bars AS ({_BARS_SQL}),
    tr AS (
      SELECT hour_ts, event_type,
             greatest(high_price - low_price,
                      abs(high_price - lag(close_price) OVER w),
                      abs(low_price  - lag(close_price) OVER w)) AS tr,
             row_number() OVER w AS rn
      FROM bars
      WINDOW w AS (PARTITION BY event_type ORDER BY hour_ts)
    )
    SELECT hour_ts, event_type,
           round(avg(tr) OVER (PARTITION BY event_type ORDER BY hour_ts
                               ROWS BETWEEN 13 PRECEDING AND CURRENT ROW),
                 8) AS atr
    FROM tr WHERE rn >= 2
    QUALIFY rn >= 15
    """,
    tags=("finance", "window"),
)
def q_atr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ATR-14 (Average True Range, Wilder's volatility unit in its
    window-expressible simple-average form — the q_rsi convention): true
    range per hourly bar = max(high-low, |high-prev close|, |low-prev
    close|), averaged over the trailing 14 bars; the denominator every
    breakout/stop rule is quoted in. Bars without a previous close (no
    TR) and rows without the full lookback are excluded on both sides.

    Scale shape: the bar rollup is one map-side-combining groupBy (the
    q_ohlc_hourly shape); both windows are PARTITIONED BY the symbol key
    — per-key frames, no global sort; window-frame averages accumulate
    in frame order, so the 14-term float sums are deterministic in both
    engines (the q_rsi contract)."""
    from pyspark.sql import Window

    from .rollup import ohlc_bars

    t = load(spark, sf_dir)
    bars = ohlc_bars(
        t.events, ts_col="ts", key_col="event_type", value_col="value"
    )
    w = Window.partitionBy("event_type").orderBy("hour_ts")
    tr = F.greatest(
        F.col("high_price") - F.col("low_price"),
        F.abs(F.col("high_price") - F.lag("close_price").over(w)),
        F.abs(F.col("low_price") - F.lag("close_price").over(w)),
    )
    d = bars.select(
        "hour_ts",
        "event_type",
        tr.alias("tr"),
        F.row_number().over(w).alias("rn"),
    ).filter(F.col("rn") >= 2)
    frame = Window.partitionBy("event_type").orderBy("hour_ts").rowsBetween(
        -13, 0
    )
    return (
        d.select(
            "hour_ts",
            "event_type",
            F.round(F.avg("tr").over(frame), 8).alias("atr"),
            "rn",
        )
        .filter(F.col("rn") >= 15)
        .drop("rn")
    )


@query(
    "q_obv",
    oracle=f"""
    WITH bars AS ({_BARS_SQL}),
    d AS (
      SELECT hour_ts, event_type,
             CASE WHEN close_price > lag(close_price) OVER w
                  THEN CAST(sample_count AS BIGINT)
                  WHEN close_price < lag(close_price) OVER w
                  THEN -CAST(sample_count AS BIGINT)
                  ELSE 0 END AS signed_vol
      FROM bars
      WINDOW w AS (PARTITION BY event_type ORDER BY hour_ts)
    )
    SELECT hour_ts, event_type,
           CAST(sum(signed_vol) OVER (PARTITION BY event_type ORDER BY hour_ts
                                      ROWS UNBOUNDED PRECEDING) AS BIGINT)
             AS obv
    FROM d
    """,
    tags=("finance", "window"),
)
def q_obv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """On-Balance Volume (Granville 1963): per symbol, the running total
    of bar volume signed by the close-over-close direction — the classic
    volume-confirms-price indicator, computed on the hourly bars with
    sample_count as bar volume. All arithmetic is EXACT integers (sign
    × bigint count, cumulative sum), so the output hash-checks without
    any float contract; the first bar (no previous close) contributes 0.

    Scale shape: bar rollup (map-side combine) + two per-key windows —
    lag and running sum share the same (symbol, hour) order, one window
    shuffle total, no global sort."""
    from pyspark.sql import Window

    from .rollup import ohlc_bars

    t = load(spark, sf_dir)
    bars = ohlc_bars(
        t.events, ts_col="ts", key_col="event_type", value_col="value"
    )
    w = Window.partitionBy("event_type").orderBy("hour_ts")
    signed = (
        F.when(
            F.col("close_price") > F.lag("close_price").over(w),
            F.col("sample_count").cast("bigint"),
        )
        .when(
            F.col("close_price") < F.lag("close_price").over(w),
            -F.col("sample_count").cast("bigint"),
        )
        .otherwise(F.lit(0).cast("bigint"))
    )
    run = Window.partitionBy("event_type").orderBy("hour_ts").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return bars.select(
        "hour_ts", "event_type", signed.alias("signed_vol")
    ).select(
        "hour_ts",
        "event_type",
        F.sum("signed_vol").over(run).cast("bigint").alias("obv"),
    )


@query(
    "q_changepoint",
    oracle="""
    WITH s0 AS (
      SELECT event_type, ts, event_id,
             row_number() OVER w AS rn,
             count(*) OVER (PARTITION BY event_type) AS n,
             sum(value) OVER (PARTITION BY event_type ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS cum
      FROM events
      WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)
    ),
    s AS (
      SELECT *, last_value(cum) OVER (PARTITION BY event_type
                                      ORDER BY ts, event_id
                                      ROWS BETWEEN UNBOUNDED PRECEDING
                                           AND UNBOUNDED FOLLOWING) AS tot
      FROM s0
    ),
    cand AS (
      SELECT event_type, ts, rn, n,
             round(abs(cum / rn - (tot - cum) / (n - rn)), 8) AS delta
      FROM s WHERE rn >= 8 AND n - rn >= 8
    )
    SELECT event_type, ts AS split_ts, delta
    FROM (SELECT *, row_number() OVER (PARTITION BY event_type
                                       ORDER BY delta DESC, ts, rn) AS rk
          FROM cand)
    WHERE rk = 1
    """,
    tags=("finance", "window", "stats"),
)
def q_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-split changepoint detection (the first round of binary
    segmentation, Scott & Knott 1974 lineage — the offline complement to
    q_cusum's online path): per symbol, the split position maximizing
    the absolute difference of left/right segment means, with >= 8
    observations required on each side (degenerate end-splits excluded).
    Downstream recurses on each side for multi-changepoint segmentation.

    Float contract: both means derive from the SAME frame-ordered
    running sum — the grand total is the ordered chain's LAST value, not
    an unordered whole-partition sum whose accumulation order the
    engines could disagree on in trailing ulps — the delta rounds to 8dp
    and the argmax breaks ties by timestamp.

    Scale shape: one window shuffle per symbol key computes rank,
    running sum and totals in a single pass; the argmax is a second
    per-key window over the candidate rows. No global sort, nothing
    quadratic — O(n) per key where the textbook formulation is O(n) per
    CANDIDATE."""
    from pyspark.sql import Window

    t = load(spark, sf_dir)
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    wk = Window.partitionBy("event_type")
    s = t.events.select(
        "event_type",
        "ts",
        "event_id",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wk).alias("n"),
        F.sum("value").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias(
            "cum"
        ),
    ).withColumn(
        "tot",
        F.last("cum").over(
            w.rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ),
    )
    cand = s.filter(
        (F.col("rn") >= 8) & (F.col("n") - F.col("rn") >= 8)
    ).select(
        "event_type",
        "ts",
        "rn",
        F.round(
            F.abs(
                F.col("cum") / F.col("rn")
                - (F.col("tot") - F.col("cum")) / (F.col("n") - F.col("rn"))
            ),
            8,
        ).alias("delta"),
    )
    rk = Window.partitionBy("event_type").orderBy(
        F.col("delta").desc(), "ts", "rn"
    )
    return (
        cand.withColumn("rk", F.row_number().over(rk))
        .filter(F.col("rk") == 1)
        .select("event_type", F.col("ts").alias("split_ts"), "delta")
    )


#: q_sax: PAA segment length in hourly bars, and the alphabet size
#: (quartile breakpoints -> 4 symbols a-d).
SAX_SEG = 6


@query(
    "q_sax",
    oracle=f"""
    WITH bars AS (
      SELECT event_type, date_trunc('hour', ts) AS hour_ts,
             round(avg(value), 8) AS bar_mean
      FROM events GROUP BY 1, 2
    ),
    idx AS (
      SELECT event_type, hour_ts, bar_mean,
             (row_number() OVER (PARTITION BY event_type
                                 ORDER BY hour_ts) - 1) // {SAX_SEG} AS seg
      FROM bars
    ),
    paa AS (
      SELECT event_type, seg, round(avg(bar_mean), 8) AS paa
      FROM idx GROUP BY 1, 2
    ),
    bp AS (
      SELECT event_type,
             quantile_cont(paa, 0.25) AS b1,
             quantile_cont(paa, 0.50) AS b2,
             quantile_cont(paa, 0.75) AS b3
      FROM paa GROUP BY 1
    )
    SELECT p.event_type,
           string_agg(chr(97 + (CASE WHEN p.paa > b.b1 THEN 1 ELSE 0 END
                                + CASE WHEN p.paa > b.b2 THEN 1 ELSE 0 END
                                + CASE WHEN p.paa > b.b3 THEN 1 ELSE 0 END)),
                      '' ORDER BY p.seg) AS sax,
           CAST(count(*) AS BIGINT) AS n_segments
    FROM paa p JOIN bp b USING (event_type)
    GROUP BY p.event_type
    """,
    tags=("finance", "window", "stats"),
)
def q_sax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SAX — Symbolic Aggregate approXimation (Lin, Keogh et al. 2003),
    the time-series-to-string transform behind motif discovery and
    whole-series indexing: per symbol, hourly bar means reduce by PAA
    (Piecewise Aggregate Approximation, {SAX_SEG}-bar segment means) and
    each segment maps to a 4-letter alphabet by the series' own quartile
    breakpoints — the output string feeds any substring machinery
    (q_winnowing, q_suffix_lcp) for cross-series motif search.

    Float contract: bar means and PAA means round to 8dp before any
    comparison; breakpoints come from the interpolated percentile both
    engines define identically over those ROUNDED values; symbols are
    strict > comparisons against the breakpoints. Scale shape: two
    map-side-combining groupBys (bars, PAA), a per-key rank window, a
    key-grain breakpoint aggregate joined back at segment grain, and an
    ordered string_agg per key — every exchange keyed by the symbol."""
    from pyspark.sql import Window

    t = load(spark, sf_dir)
    bars = t.events.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hour_ts")
    ).agg(F.round(F.avg("value"), 8).alias("bar_mean"))
    w = Window.partitionBy("event_type").orderBy("hour_ts")
    idx = bars.withColumn(
        "seg", ((F.row_number().over(w) - 1) / SAX_SEG).cast("bigint")
    )
    paa = idx.groupBy("event_type", "seg").agg(
        F.round(F.avg("bar_mean"), 8).alias("paa")
    )
    bp = paa.groupBy("event_type").agg(
        F.percentile("paa", F.lit(0.25)).alias("b1"),
        F.percentile("paa", F.lit(0.50)).alias("b2"),
        F.percentile("paa", F.lit(0.75)).alias("b3"),
    )
    sym = (
        (F.col("paa") > F.col("b1")).cast("int")
        + (F.col("paa") > F.col("b2")).cast("int")
        + (F.col("paa") > F.col("b3")).cast("int")
    )
    return (
        paa.join(bp, "event_type")
        .withColumn("ch", F.char(F.lit(97) + sym))
        .groupBy("event_type")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("seg", "ch"))),
                    lambda s: s["ch"],
                ),
                "",
            ).alias("sax"),
            F.count(F.lit(1)).alias("n_segments"),
        )
    )


ROLL_CORR_W = 24


@query(
    "q_rolling_corr",
    oracle=f"""
    WITH bars AS (
      SELECT date_trunc('hour', ts) AS hour_ts, event_type,
             arg_max(value, ts) AS close_price
      FROM events WHERE event_type IN ('click', 'purchase')
      GROUP BY 1, 2
    ),
    paired AS (
      SELECT a.hour_ts, a.close_price AS x, b.close_price AS y
      FROM bars a JOIN bars b USING (hour_ts)
      WHERE a.event_type = 'click' AND b.event_type = 'purchase'
    ),
    sums AS (
      SELECT hour_ts,
             count(*) OVER w AS n,
             sum(x) OVER w AS sx, sum(y) OVER w AS sy,
             sum(x * y) OVER w AS sxy,
             sum(x * x) OVER w AS sxx, sum(y * y) OVER w AS syy
      FROM paired
      WINDOW w AS (ORDER BY hour_ts
                   ROWS BETWEEN {ROLL_CORR_W - 1} PRECEDING AND CURRENT ROW)
    )
    SELECT hour_ts,
           round((n * sxy - sx * sy)
                 / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)),
                 6) AS roll_corr
    FROM sums WHERE n = {ROLL_CORR_W} ORDER BY hour_ts
    """,
    tags=("finance", "window", "stats"),
)
def q_rolling_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling {ROLL_CORR_W}-bar correlation between the click and
    purchase hourly close series — the co-movement monitor behind pair
    trading, hedging ratios, and cross-metric drift alarms (a correlation
    regime break is often the first observable failure signal).

    The correlation is assembled from SIX windowed running sums
    (n, Σx, Σy, Σxy, Σx², Σy²) rather than a corr() window call — the
    sums form is engine-portable, numerically explicit, and computes all
    six in ONE window pass over the bar series. Scale: the fact rolls up
    to hour grain first (map-side combinable), the window runs at BAR
    grain (hours, not events); emitted only where the window is full so
    every row is a true {ROLL_CORR_W}-bar statistic."""
    t = load(spark, sf_dir)
    bars = (
        t.events.filter(F.col("event_type").isin("click", "purchase"))
        .groupBy(
            F.date_trunc("hour", "ts").alias("hour_ts"), "event_type"
        )
        .agg(F.max_by("value", "ts").alias("close_price"))
    )
    a = bars.filter(F.col("event_type") == "click").select(
        "hour_ts", F.col("close_price").alias("x")
    )
    b = bars.filter(F.col("event_type") == "purchase").select(
        "hour_ts", F.col("close_price").alias("y")
    )
    paired = a.join(b, "hour_ts")
    w = Window.orderBy("hour_ts").rowsBetween(-(ROLL_CORR_W - 1), 0)
    sums = paired.select(
        "hour_ts",
        F.count(F.lit(1)).over(w).alias("n"),
        F.sum("x").over(w).alias("sx"),
        F.sum("y").over(w).alias("sy"),
        F.sum(F.col("x") * F.col("y")).over(w).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).over(w).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).over(w).alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    corr = (n * F.col("sxy") - sx * sy) / (
        F.sqrt(n * F.col("sxx") - sx * sx)
        * F.sqrt(n * F.col("syy") - sy * sy)
    )
    return (
        sums.filter(F.col("n") == ROLL_CORR_W)
        .select("hour_ts", F.round(corr, 6).alias("roll_corr"))
        .orderBy("hour_ts")
    )


#: Round-11 indicator constants (standard industry defaults).
MACD_FAST, MACD_SLOW, MACD_SIGNAL = 12, 26, 9
STOCH_W, STOCH_D = 14, 3
DONCH_W = 20
BETA_W = 24


def _ema_term_sql(alpha: float, ri: str, rt: str, x: str) -> str:
    """SQL closed-form EMA term (seed EMA_1 = x_1): the q_ema unroll at
    bar-pair grain."""
    r = 1 - alpha
    return (
        f"CASE WHEN {ri} = 1 THEN power({r}, {rt} - 1) * {x} "
        f"ELSE {alpha} * power({r}, {rt} - {ri}) * {x} END"
    )


_MACD_ORACLE = f"""
    WITH bars AS (
      SELECT event_type, date_trunc('hour', ts) AS hour_ts,
             arg_max(value, ts) AS close
      FROM events GROUP BY 1, 2
    ),
    idx AS (
      SELECT event_type, hour_ts, close,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY hour_ts) AS rn
      FROM bars
    ),
    emas AS (
      SELECT b.event_type, b.rn, b.hour_ts,
             sum({_ema_term_sql(2.0 / (MACD_FAST + 1), "a.rn", "b.rn", "a.close")})
               AS ema_fast,
             sum({_ema_term_sql(2.0 / (MACD_SLOW + 1), "a.rn", "b.rn", "a.close")})
               AS ema_slow
      FROM idx a JOIN idx b
        ON a.event_type = b.event_type AND a.rn <= b.rn
      GROUP BY 1, 2, 3
    ),
    macd AS (
      SELECT event_type, rn, hour_ts,
             round(ema_fast - ema_slow, 8) AS macd8
      FROM emas
    ),
    sig AS (
      SELECT b.event_type, b.rn,
             sum({_ema_term_sql(2.0 / (MACD_SIGNAL + 1), "a.rn", "b.rn", "a.macd8")})
               AS signal
      FROM macd a JOIN macd b
        ON a.event_type = b.event_type AND a.rn <= b.rn
      GROUP BY 1, 2
    )
    SELECT m.event_type, m.hour_ts,
           round(m.macd8, 6) AS macd,
           round(s.signal, 6) AS signal,
           round(m.macd8 - s.signal, 6) AS histogram
    FROM macd m JOIN sig s ON m.event_type = s.event_type AND m.rn = s.rn
    ORDER BY m.event_type, m.hour_ts
"""


@query(
    "q_macd",
    oracle=_MACD_ORACLE,
    tags=("finance", "window"),
)
def q_macd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MACD(12,26,9) over the hourly close series per event type: the
    fast/slow EMA spread plus its 9-bar signal EMA and histogram — the
    classic momentum-crossover indicator the reference's OHLC store
    exists to feed (dataCollector.py:140-163 stops at bars; this is the
    first consumer).

    Scale shape: both EMA recursions use the q_ema algebraic closed
    form (EMA_t = Σᵢ a·r^{t-i}·xᵢ, seeded with x₁), but evaluated at
    EVERY bar — so instead of a per-row iteration the terms come from a
    bar-pair self-join at rn_i ≤ rn_t, which is CONTENT-BOUNDED
    (≤720 bars/type over the fixed corpus window at any data size →
    ≤260k pair rows per type). One join produces BOTH the fast and slow
    sums. For series where that premise breaks (multi-year, unbounded
    length), q_macd_seq is the proven O(n)-per-series alternative —
    same oracle, pinned output-equal on the shared fixture. The MACD series is rounded to 8dp before feeding the signal
    recursion — the shared-input rule (q_pacf/q_hits) that keeps the
    second closed form engine-identical. The fact table itself touches
    only the initial combinable bar rollup."""
    t = load(spark, sf_dir)
    bars = t.events.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hour_ts")
    ).agg(F.max_by("value", "ts").alias("close"))
    wseq = Window.partitionBy("event_type").orderBy("hour_ts")
    idx = bars.select(
        "event_type",
        "hour_ts",
        "close",
        F.row_number().over(wseq).alias("rn"),
    ).localCheckpoint(eager=True)
    # idx is bar-grain (≤720 rows/type): checkpoint before the self-join
    # so the fact rollup runs once, not once per join side. AQE coalesces
    # the tiny aggregate to one partition before the checkpoint freezes
    # it — re-widen so the O(bars²) EMA term sums don't run single-task
    # (the jaccard_pairs / q_theilsen lesson).
    from ..partitioning import ensure_parallelism

    idx = ensure_parallelism(idx)
    ai = idx.select(
        "event_type", F.col("rn").alias("ri"), F.col("close").alias("xi")
    )
    bt = idx.select("event_type", "hour_ts", F.col("rn").alias("rt"))

    def term(alpha: float, rt: str = "rt"):
        # Closed-form EMA contribution of bar ri to the EMA at bar rt
        # (seed EMA_1 = x_1), matching _ema_term_sql.
        r = 1 - alpha
        return F.when(
            F.col("ri") == 1, F.pow(F.lit(r), F.col(rt) - 1) * F.col("xi")
        ).otherwise(
            F.lit(alpha)
            * F.pow(F.lit(r), F.col(rt) - F.col("ri"))
            * F.col("xi")
        )

    emas = (
        ai.join(F.broadcast(bt), "event_type")
        .filter(F.col("ri") <= F.col("rt"))
        .groupBy("event_type", "rt", "hour_ts")
        .agg(
            F.sum(term(2.0 / (MACD_FAST + 1))).alias("ema_fast"),
            F.sum(term(2.0 / (MACD_SLOW + 1))).alias("ema_slow"),
        )
    )
    macd = emas.select(
        "event_type",
        "rt",
        "hour_ts",
        F.round(F.col("ema_fast") - F.col("ema_slow"), 8).alias("macd8"),
    ).localCheckpoint(eager=True)
    macd = ensure_parallelism(macd)
    am = macd.select(
        "event_type", F.col("rt").alias("ri"), F.col("macd8").alias("xi")
    )
    bm = macd.select("event_type", F.col("rt").alias("rt2"))
    sig = (
        am.join(F.broadcast(bm), "event_type")
        .filter(F.col("ri") <= F.col("rt2"))
        .groupBy("event_type", "rt2")
        .agg(F.sum(term(2.0 / (MACD_SIGNAL + 1), rt="rt2")).alias("signal"))
    )
    return (
        macd.alias("m")
        .join(
            sig.alias("s"),
            (F.col("m.event_type") == F.col("s.event_type"))
            & (F.col("m.rt") == F.col("s.rt2")),
        )
        .select(
            F.col("m.event_type").alias("event_type"),
            "hour_ts",
            F.round(F.col("macd8"), 6).alias("macd"),
            F.round(F.col("signal"), 6).alias("signal"),
            F.round(F.col("macd8") - F.col("signal"), 6).alias("histogram"),
        )
        .orderBy("event_type", "hour_ts")
    )


@query(
    "q_stochastic",
    oracle=f"""
    WITH bars AS (
      SELECT event_type, date_trunc('hour', ts) AS hour_ts,
             arg_max(value, ts) AS close
      FROM events GROUP BY 1, 2
    ),
    ranged AS (
      SELECT event_type, hour_ts, close,
             min(close) OVER w AS low_w, max(close) OVER w AS high_w,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY hour_ts) AS rn
      FROM bars
      WINDOW w AS (PARTITION BY event_type ORDER BY hour_ts
                   ROWS BETWEEN {STOCH_W - 1} PRECEDING AND CURRENT ROW)
    ),
    k AS (
      SELECT event_type, hour_ts,
             CASE WHEN high_w = low_w THEN NULL
                  ELSE 100.0 * (close - low_w) / (high_w - low_w)
             END AS pct_k
      FROM ranged WHERE rn >= {STOCH_W}
    )
    SELECT event_type, hour_ts,
           round(pct_k, 6) AS pct_k,
           round(avg(pct_k) OVER (PARTITION BY event_type ORDER BY hour_ts
                                  ROWS BETWEEN {STOCH_D - 1} PRECEDING
                                  AND CURRENT ROW), 6) AS pct_d
    FROM k ORDER BY event_type, hour_ts
    """,
    tags=("finance", "window"),
)
def q_stochastic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stochastic oscillator %K/%D over the hourly close series:
    %K = 100·(close − low₁₄)/(high₁₄ − low₁₄) over the trailing
    {STOCH_W}-bar range, %D = {STOCH_D}-bar SMA of %K — the classic
    overbought/oversold gauge, completing the momentum family around
    q_rsi (which measures gain/loss balance; this measures position
    within the recent range). Flat-range bars (high = low) yield NULL
    on both engines rather than a 0/0.

    Scale shape: the q_rolling_corr profile — fact rolls up to hour
    grain map-side, every window runs at BAR grain partitioned per
    event_type (≤720 rows/partition at any data size); emitted only
    from the first full lookback (rn ≥ {STOCH_W}), %D smooths the
    POST-filter series identically on both engines."""
    t = load(spark, sf_dir)
    bars = t.events.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hour_ts")
    ).agg(F.max_by("value", "ts").alias("close"))
    wseq = Window.partitionBy("event_type").orderBy("hour_ts")
    wr = wseq.rowsBetween(-(STOCH_W - 1), 0)
    ranged = bars.select(
        "event_type",
        "hour_ts",
        "close",
        F.min("close").over(wr).alias("low_w"),
        F.max("close").over(wr).alias("high_w"),
        F.row_number().over(wseq).alias("rn"),
    )
    k = ranged.filter(F.col("rn") >= STOCH_W).select(
        "event_type",
        "hour_ts",
        F.when(F.col("high_w") == F.col("low_w"), F.lit(None)).otherwise(
            100.0
            * (F.col("close") - F.col("low_w"))
            / (F.col("high_w") - F.col("low_w"))
        ).alias("pct_k"),
    )
    wd = Window.partitionBy("event_type").orderBy("hour_ts").rowsBetween(
        -(STOCH_D - 1), 0
    )
    return k.select(
        "event_type",
        "hour_ts",
        F.round("pct_k", 6).alias("pct_k"),
        F.round(F.avg("pct_k").over(wd), 6).alias("pct_d"),
    ).orderBy("event_type", "hour_ts")


@query(
    "q_donchian",
    oracle=f"""
    WITH bars AS (
      SELECT event_type, date_trunc('hour', ts) AS hour_ts,
             arg_max(value, ts) AS close
      FROM events GROUP BY 1, 2
    ),
    ch AS (
      SELECT event_type, hour_ts, close,
             max(close) OVER cur AS upper_ch,
             min(close) OVER cur AS lower_ch,
             max(close) OVER prev AS upper_prev,
             min(close) OVER prev AS lower_prev,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY hour_ts) AS rn
      FROM bars
      WINDOW cur AS (PARTITION BY event_type ORDER BY hour_ts
                     ROWS BETWEEN {DONCH_W - 1} PRECEDING AND CURRENT ROW),
             prev AS (PARTITION BY event_type ORDER BY hour_ts
                      ROWS BETWEEN {DONCH_W} PRECEDING AND 1 PRECEDING)
    )
    SELECT event_type, hour_ts, close,
           upper_ch, lower_ch,
           round((upper_ch + lower_ch) / 2.0, 6) AS mid_ch,
           round(upper_ch - lower_ch, 6) AS width,
           close > upper_prev AS breakout_up,
           close < lower_prev AS breakout_dn
    FROM ch WHERE rn > {DONCH_W}
    ORDER BY event_type, hour_ts
    """,
    tags=("finance", "window"),
)
def q_donchian(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Donchian channel ({DONCH_W}-bar rolling high/low band, mid-line,
    width) plus turtle-style breakout flags — a close above the PRIOR
    {DONCH_W}-bar high (which by construction can never trigger against
    a window containing the bar itself) signals an upside breakout, and
    symmetrically below. The channel-width column doubles as a
    volatility proxy (the non-parametric cousin of q_bollinger's σ
    bands and q_atr's true range).

    Scale shape: identical to q_stochastic — one map-side combinable
    bar rollup, two frame variants of the same per-type bar window
    (current-inclusive channel, one-bar-back breakout reference), rows
    emitted only once the prior window is full (rn > {DONCH_W})."""
    t = load(spark, sf_dir)
    bars = t.events.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hour_ts")
    ).agg(F.max_by("value", "ts").alias("close"))
    wseq = Window.partitionBy("event_type").orderBy("hour_ts")
    cur = wseq.rowsBetween(-(DONCH_W - 1), 0)
    prev = wseq.rowsBetween(-DONCH_W, -1)
    ch = bars.select(
        "event_type",
        "hour_ts",
        "close",
        F.max("close").over(cur).alias("upper_ch"),
        F.min("close").over(cur).alias("lower_ch"),
        F.max("close").over(prev).alias("upper_prev"),
        F.min("close").over(prev).alias("lower_prev"),
        F.row_number().over(wseq).alias("rn"),
    )
    return (
        ch.filter(F.col("rn") > DONCH_W)
        .select(
            "event_type",
            "hour_ts",
            "close",
            "upper_ch",
            "lower_ch",
            F.round((F.col("upper_ch") + F.col("lower_ch")) / 2.0, 6).alias(
                "mid_ch"
            ),
            F.round(F.col("upper_ch") - F.col("lower_ch"), 6).alias("width"),
            (F.col("close") > F.col("upper_prev")).alias("breakout_up"),
            (F.col("close") < F.col("lower_prev")).alias("breakout_dn"),
        )
        .orderBy("event_type", "hour_ts")
    )


@query(
    "q_rolling_beta",
    oracle=f"""
    WITH bars AS (
      SELECT event_type, date_trunc('hour', ts) AS hour_ts,
             arg_max(value, ts) AS close
      FROM events GROUP BY 1, 2
    ),
    rets AS (
      SELECT event_type, hour_ts,
             close / lag(close) OVER (PARTITION BY event_type
                                      ORDER BY hour_ts) - 1 AS ret
      FROM bars
    ),
    nn AS (SELECT * FROM rets WHERE ret IS NOT NULL),
    mkt AS (
      SELECT hour_ts, avg(ret) AS mret FROM nn GROUP BY hour_ts
    ),
    joined AS (
      SELECT nn.event_type, nn.hour_ts, nn.ret, mkt.mret,
             row_number() OVER (PARTITION BY nn.event_type
                                ORDER BY nn.hour_ts) AS rn
      FROM nn JOIN mkt USING (hour_ts)
    ),
    sums AS (
      SELECT event_type, hour_ts, rn,
             count(*) OVER w AS n,
             sum(ret) OVER w AS sr, sum(mret) OVER w AS sm,
             sum(ret * mret) OVER w AS srm,
             sum(mret * mret) OVER w AS smm
      FROM joined
      WINDOW w AS (PARTITION BY event_type ORDER BY hour_ts
                   ROWS BETWEEN {BETA_W - 1} PRECEDING AND CURRENT ROW)
    )
    SELECT event_type, hour_ts,
           round((n * srm - sr * sm) / (n * smm - sm * sm), 6) AS beta,
           round((sr - (n * srm - sr * sm) / (n * smm - sm * sm) * sm)
                 / n, 6) AS alpha
    FROM sums WHERE n = {BETA_W}
    ORDER BY event_type, hour_ts
    """,
    tags=("finance", "window", "stats"),
)
def q_rolling_beta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling {BETA_W}-bar CAPM beta (and alpha) of each event type's
    hourly returns against the equal-weight market return (the
    cross-type average of that hour's returns) — the systematic-vs-
    idiosyncratic decomposition behind hedging ratios and factor
    monitors; q_rolling_corr tracks co-movement DIRECTION, beta tracks
    its MAGNITUDE in return units.

    Scale shape: fact → hourly bars (map-side combinable), returns via
    one lag window at bar grain, the market series via a bar-grain
    groupBy(hour) (≤720 rows — broadcast back), and beta from FIVE
    windowed running sums in one pass (the q_rolling_corr
    sums-not-corr() form). Emitted only at full {BETA_W}-bar windows;
    returns are ratios of PICKED closes (no arithmetic drift), so no
    pre-rounding is needed before the windowed sums."""
    t = load(spark, sf_dir)
    bars = t.events.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hour_ts")
    ).agg(F.max_by("value", "ts").alias("close"))
    wseq = Window.partitionBy("event_type").orderBy("hour_ts")
    rets = bars.select(
        "event_type",
        "hour_ts",
        (F.col("close") / F.lag("close").over(wseq) - 1).alias("ret"),
    ).filter(F.col("ret").isNotNull())
    mkt = rets.groupBy("hour_ts").agg(F.avg("ret").alias("mret"))
    joined = rets.join(F.broadcast(mkt), "hour_ts")
    w = Window.partitionBy("event_type").orderBy("hour_ts").rowsBetween(
        -(BETA_W - 1), 0
    )
    sums = joined.select(
        "event_type",
        "hour_ts",
        F.count(F.lit(1)).over(w).alias("n"),
        F.sum("ret").over(w).alias("sr"),
        F.sum("mret").over(w).alias("sm"),
        F.sum(F.col("ret") * F.col("mret")).over(w).alias("srm"),
        F.sum(F.col("mret") * F.col("mret")).over(w).alias("smm"),
    )
    beta = (F.col("n") * F.col("srm") - F.col("sr") * F.col("sm")) / (
        F.col("n") * F.col("smm") - F.col("sm") * F.col("sm")
    )
    return (
        sums.filter(F.col("n") == BETA_W)
        .select(
            "event_type",
            "hour_ts",
            F.round(beta, 6).alias("beta"),
            F.round((F.col("sr") - beta * F.col("sm")) / F.col("n"), 6).alias(
                "alpha"
            ),
        )
        .orderBy("event_type", "hour_ts")
    )


@query(
    "q_seasonality",
    oracle="""
    WITH bars AS (
      SELECT event_type, date_trunc('hour', ts) AS hour_ts,
             arg_max(value, ts) AS close
      FROM events GROUP BY 1, 2
    ),
    keyed AS (
      SELECT event_type, close, CAST(hour(hour_ts) AS INTEGER) AS hod
      FROM bars
    ),
    prof AS (
      SELECT event_type, hod, avg(close) AS seasonal
      FROM keyed GROUP BY event_type, hod
    )
    SELECT k.event_type,
           CAST(count(*) AS BIGINT) AS n_bars,
           round(var_pop(k.close), 6) AS var_total,
           round(var_pop(k.close - p.seasonal), 6) AS var_resid,
           round(greatest(0, 1 - var_pop(k.close - p.seasonal)
                             / var_pop(k.close)), 6) AS seasonal_strength
    FROM keyed k JOIN prof p
      ON k.event_type = p.event_type AND k.hod = p.hod
    GROUP BY k.event_type
    ORDER BY k.event_type
    """,
    tags=("finance", "timeseries", "stats"),
)
def q_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-day seasonality strength per series: fit the 24-slot
    seasonal profile (mean close per hour-of-day), and report
    strength = max(0, 1 − var(close − seasonal)/var(close)) — the STL
    "strength of seasonality" statistic specialized to the daily cycle.
    Answers "is this metric's daily wave real?" before anyone ships a
    seasonally-adjusted alert threshold (q_changepoint and q_zscore
    both fire falsely on strong unmodeled seasonality).

    Scale shape: fact → hourly bars map-side; the profile is one
    combinable groupBy at (type × 24)-slot grain broadcast back; the
    variance ratio is one more bar-grain aggregate. Two summary
    shuffles total, nothing at fact grain beyond the rollup."""
    t = load(spark, sf_dir)
    bars = t.events.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hour_ts")
    ).agg(F.max_by("value", "ts").alias("close"))
    keyed = bars.select(
        "event_type", "close", F.hour("hour_ts").cast("int").alias("hod")
    )
    prof = keyed.groupBy("event_type", "hod").agg(
        F.avg("close").alias("seasonal")
    )
    resid = F.col("close") - F.col("seasonal")
    return (
        keyed.join(F.broadcast(prof), ["event_type", "hod"])
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_bars"),
            F.round(F.var_pop("close"), 6).alias("var_total"),
            F.round(F.var_pop(resid), 6).alias("var_resid"),
            F.round(
                F.greatest(
                    F.lit(0.0),
                    1 - F.var_pop(resid) / F.var_pop("close"),
                ),
                6,
            ).alias("seasonal_strength"),
        )
        .orderBy("event_type")
    )


@query(
    "q_burstiness",
    oracle="""
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS hour_ts,
             CAST(count(*) AS DOUBLE) AS n
      FROM events GROUP BY 1, 2
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_hours,
           round(avg(n), 6) AS mean_per_hour,
           round(var_pop(n) / avg(n), 6) AS fano,
           round(max(n) / avg(n), 6) AS peak_to_mean,
           round((sqrt(var_pop(n)) - avg(n))
                 / (sqrt(var_pop(n)) + avg(n)), 6) AS burstiness
    FROM hourly GROUP BY event_type ORDER BY event_type
    """,
    tags=("finance", "timeseries", "stats"),
)
def q_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Traffic burstiness per event type over OBSERVED hourly counts:
    the Fano factor (var/mean — 1 for a Poisson process, >1 means
    clumping), peak-to-mean (capacity headroom), and the Goh-Barabási
    burstiness index B = (σ−μ)/(σ+μ) ∈ [−1, 1] (−1 periodic, 0
    Poisson, →1 extreme bursts). The capacity-planning readout: a
    Poisson-sized ingestion queue melts under B > 0 traffic.

    Scale shape: ONE combinable groupBy to the (type, hour) count grid
    (content-bounded by the corpus window), then one aggregate per type
    over ≤720 rows. Two summary shuffles, one fact scan."""
    t = load(spark, sf_dir)
    hourly = t.events.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hour_ts")
    ).agg(F.count(F.lit(1)).cast("double").alias("n"))
    sd = F.sqrt(F.var_pop("n"))
    return (
        hourly.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_hours"),
            F.round(F.avg("n"), 6).alias("mean_per_hour"),
            F.round(F.var_pop("n") / F.avg("n"), 6).alias("fano"),
            F.round(F.max("n") / F.avg("n"), 6).alias("peak_to_mean"),
            F.round((sd - F.avg("n")) / (sd + F.avg("n")), 6).alias(
                "burstiness"
            ),
        )
        .orderBy("event_type")
    )


@query(
    "q_macd_seq",
    oracle=_MACD_ORACLE,
    tags=("finance", "window", "iterative"),
)
def q_macd_seq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MACD(12,26,9) with the UNBOUNDED-SERIES plan (VERDICT r11 task 6
    — the declared escape path for the O(bars²) closed-form family):
    instead of q_macd's bar-pair self-join (quadratic in SERIES LENGTH,
    safe only under the content-bounded ≤720-bars/type premise), each
    series' EMA recursion EMA_t = α·x_t + (1−α)·EMA_{t−1} runs
    SEQUENTIALLY inside one Arrow batch per event_type — O(n) work and
    O(n) memory per series, so a multi-year 87k-bar series costs 87k
    multiply-adds instead of ~10⁹ pair rows. Series are independent →
    perfectly parallel across executors (one group per series); the
    fact table still collapses through the same combinable bar rollup.

    Same oracle as q_macd, and pinned output-equal to the pair-join
    form on the shared fixture (tests/test_round11_finance.py): the
    recursion IS the closed form (seed EMA₁ = x₁; expanding the
    recurrence yields exactly the α·r^{t−i}·xᵢ terms), the MACD series
    rounds 8dp before seeding the signal recursion (the shared-input
    rule, HALF_UP over the shortest-decimal repr — bit-equivalent to
    F.round), and the emitted columns round 6dp — identical rounding
    pipeline, so the ≤1e-12 accumulation-order difference between
    recursion and pair-sum is absorbed exactly where the engines'
    own drift already is."""
    import numpy as np
    import pandas as pd

    from .graph import _round_half_up_vec

    t = load(spark, sf_dir)
    bars = t.events.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hour_ts")
    ).agg(F.max_by("value", "ts").alias("close"))

    a_fast = 2.0 / (MACD_FAST + 1)
    a_slow = 2.0 / (MACD_SLOW + 1)
    a_sig = 2.0 / (MACD_SIGNAL + 1)

    def _series(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("hour_ts")
        x = pdf["close"].to_numpy(dtype="float64")

        def ema(vals: np.ndarray, alpha: float) -> np.ndarray:
            r = 1.0 - alpha
            out = np.empty(len(vals), dtype="float64")
            out[0] = vals[0]
            for i in range(1, len(vals)):
                out[i] = alpha * vals[i] + r * out[i - 1]
            return out

        macd8 = np.asarray(
            _round_half_up_vec(ema(x, a_fast) - ema(x, a_slow), 8),
            dtype="float64",
        )
        signal = ema(macd8, a_sig)
        return pd.DataFrame(
            {
                "event_type": pdf["event_type"].to_numpy(),
                "hour_ts": pdf["hour_ts"].to_numpy(),
                "macd": _round_half_up_vec(macd8, 6),
                "signal": _round_half_up_vec(signal, 6),
                "histogram": _round_half_up_vec(macd8 - signal, 6),
            }
        )

    return (
        bars.groupBy("event_type")
        .applyInPandas(
            _series,
            "event_type string, hour_ts timestamp_ntz, macd double,"
            " signal double, histogram double",
        )
        .orderBy("event_type", "hour_ts")
    )
