"""Streaming joins (SURVEY §2.D extension): stream⋈static dimension
enrichment and watermarked stream⋈stream correlation.

The reference enriches nothing — each poll row is stored as-is
(/root/reference/dataCollector.py:118-138). These are the two joins a
production version of that loop needs the moment it has context tables:

- stream⋈static: every micro-batch hash-joins against the (broadcast)
  dimension snapshot — no state, re-planned per batch, dimension updates
  picked up on next batch. At scale the dim broadcast is per-executor
  memory; a dim too big to broadcast becomes a shuffle join per batch.
- stream⋈stream: both sides buffered in the state store, matched on key +
  event-time range; the watermark bounds state (rows older than the range
  plus watermark are evicted). State size ≈ input rate × (range + lateness)
  per key — the knob that keeps a 100 TB/day correlation bounded.

Tests drive both with availableNow over the file source (deterministic,
single batch) and hash-check against the equivalent batch SQL — stream ≡
batch is the correctness contract, as for every streaming query here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..functions.exact import dsum
from ..registry import query
from .jobs import _events_stream, run_to_memory


@query(
    "q_stream_static_join",
    oracle="""
    SELECT c_mktsegment,
           CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value,
           count(*)   AS n_events
    FROM events JOIN customer ON user_id = c_custkey
    GROUP BY c_mktsegment
    """,
    tags=("streaming", "join"),
)
def q_stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream⋈static enrichment: the events stream joined per-batch to the
    broadcast customer dimension, then aggregated by market segment —
    equal to the batch join+agg on the same data (one availableNow batch)."""
    t = load(spark, sf_dir)
    dim = F.broadcast(t.customer.select("c_custkey", "c_mktsegment"))
    stream = _events_stream(spark, sf_dir)
    agg = (
        stream.join(dim, stream.user_id == dim.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            dsum("value").alias("total_value"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
    return run_to_memory(agg, output_mode="complete")


@query(
    "q_stream_stream_join",
    oracle="""
    SELECT a.event_id AS click_id,
           b.event_id AS purchase_id,
           b.user_id  AS user_id
    FROM events a JOIN events b
      ON a.user_id = b.user_id
     AND a.event_type = 'click'
     AND b.event_type = 'purchase'
     AND a.ts BETWEEN b.ts - INTERVAL 10 MINUTE AND b.ts
    """,
    tags=("streaming", "join"),
)
def q_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked stream⋈stream inner join: clicks attributed to a
    same-user purchase within the following 10 minutes. Both sides carry
    watermarks and the join carries the event-time range, so the engine
    can evict buffered rows; with the whole input in one batch the result
    must equal the batch self-join."""
    load(spark, sf_dir)
    # Both sides derive from ONE file source (a supported streaming
    # self-join): one offset log, one scan per micro-batch instead of two.
    ev = _events_stream(spark, sf_dir)
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("click_user"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", "1 hour")
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("user_id"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", "1 hour")
    )
    joined = clicks.join(
        purchases,
        (F.col("click_user") == F.col("user_id"))
        & (F.col("click_ts") >= F.col("purchase_ts") - F.expr("INTERVAL 10 MINUTES"))
        & (F.col("click_ts") <= F.col("purchase_ts")),
    ).select("click_id", "purchase_id", "user_id")
    return run_to_memory(joined, output_mode="append")


@query(
    "q_stream_chained_stateful",
    oracle="""
    WITH j AS (
      SELECT b.ts AS purchase_ts, b.value AS value
      FROM events a JOIN events b
        ON a.user_id = b.user_id
       AND a.event_type = 'click'
       AND b.event_type = 'purchase'
       AND a.ts BETWEEN b.ts - INTERVAL 10 MINUTE AND b.ts
    ),
    wm AS (
      SELECT least(
               (SELECT max(ts) FROM events WHERE event_type = 'click'),
               (SELECT max(ts) FROM events WHERE event_type = 'purchase')
             ) - INTERVAL 30 MINUTE AS wm
    )
    SELECT date_trunc('hour', purchase_ts) AS hour_ts,
           count(*) AS n_attributed,
           sum(value) AS attributed_value
    FROM j
    GROUP BY 1
    HAVING date_trunc('hour', purchase_ts) + INTERVAL 1 HOUR
           <= (SELECT wm FROM wm)
    """,
    tags=("streaming", "join", "chained"),
)
def q_stream_chained_stateful(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CHAINED stateful operators in one streaming query (Spark 4
    watermark propagation): watermarked stream⋈stream attribution join
    feeding a tumbling-window aggregation, append mode end-to-end. The
    engine tracks a per-operator watermark chain — the join's output
    watermark gates the window's emission — so only windows whose end
    precedes the global watermark (min over both sources of max event time
    minus the 30-minute bound) are final; the oracle reproduces exactly
    that emission rule in SQL. Before Spark 4 this pipeline required two
    queries with an intermediate sink."""
    load(spark, sf_dir)
    # One file source for both join sides (streaming self-join): one
    # offset log, one scan per micro-batch (measured −0.4 s at sf0.01).
    ev = _events_stream(spark, sf_dir)
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("click_user"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", "30 minutes")
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .select("user_id", F.col("ts").alias("purchase_ts"), "value")
        .withWatermark("purchase_ts", "30 minutes")
    )
    joined = clicks.join(
        purchases,
        (F.col("click_user") == F.col("user_id"))
        & (F.col("click_ts") >= F.col("purchase_ts") - F.expr("INTERVAL 10 MINUTES"))
        & (F.col("click_ts") <= F.col("purchase_ts")),
    )
    agg = (
        joined.groupBy(F.window("purchase_ts", "1 hour").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_attributed"),
            F.sum("value").alias("attributed_value"),
        )
    )
    out = run_to_memory(agg, output_mode="append")
    return out.select(
        F.col("w.start").cast("timestamp_ntz").alias("hour_ts"),
        "n_attributed",
        "attributed_value",
    )


@query(
    "q_stream_left_join",
    oracle="""
    WITH cutoff AS (
      SELECT least(
               (SELECT max(ts) FROM events WHERE event_type = 'click'),
               (SELECT max(ts) FROM events WHERE event_type = 'purchase')
             ) - INTERVAL 2 HOUR AS c
    )
    SELECT a.event_id AS click_id,
           a.user_id  AS click_user,
           b.event_id AS purchase_id
    FROM (SELECT * FROM events WHERE event_type = 'click') a
    LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') b
      ON a.user_id = b.user_id
     AND a.ts BETWEEN b.ts - INTERVAL 10 MINUTE AND b.ts
    CROSS JOIN cutoff
    WHERE a.ts <= cutoff.c
    """,
    tags=("streaming", "join"),
)
def q_stream_left_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked stream⋈stream LEFT OUTER join: every click, attributed
    to a same-user purchase in the following 10 minutes or emitted with a
    NULL match — the attribution query that must also report the
    UNconverted clicks. Outer rows can only emit once the watermark passes
    the click's join window (the engine must prove no match can still
    arrive), so rows at the very tail of a bounded run stay buffered
    forever. The GLOBAL watermark is the min over both inputs' watermarks
    — it trails the EARLIER-ending side — so both engines restrict output
    to clicks at least 2 h (watermark + join window, with margin) before
    min(max click ts, max purchase ts): the honest statement of
    outer-join emission semantics rather than a flakily-timed tail.
    """
    t = load(spark, sf_dir)
    cutoff = (
        t.events.groupBy()
        .agg(
            (
                F.least(
                    F.max(F.when(F.col("event_type") == "click", F.col("ts"))),
                    F.max(F.when(F.col("event_type") == "purchase", F.col("ts"))),
                )
                - F.expr("INTERVAL 2 HOURS")
            ).alias("c")
        )
        .first()["c"]
    )
    # One file source for both join sides (streaming self-join).
    ev = _events_stream(spark, sf_dir)
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("click_user"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", "1 hour")
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("user_id"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", "1 hour")
    )
    joined = clicks.join(
        purchases,
        (F.col("click_user") == F.col("user_id"))
        & (F.col("click_ts") >= F.col("purchase_ts") - F.expr("INTERVAL 10 MINUTES"))
        & (F.col("click_ts") <= F.col("purchase_ts")),
        "left_outer",
    ).select("click_id", "click_user", "purchase_id", "click_ts")
    out = run_to_memory(joined, output_mode="append")
    return out.filter(F.col("click_ts") <= F.lit(cutoff)).drop("click_ts")
