"""User-behavior composites over the events stream: cohort retention and
conversion funnel — the product-analytics queries a stored event log exists
to answer (the reference's README pitches its PostgreSQL store for exactly
this "complex query" role, /root/reference/README.md:31).

Scale notes (100 TB design point):
- q_cohort: two aggregations keyed on user_id (first-day, distinct active
  days) then a join on user_id — all three hash-partition on the same key,
  so AQE/exchange-reuse keeps it to effectively one fact shuffle; the final
  (cohort_day, offset) rollup is bounded by #days², independent of users.
- q_funnel: three chained per-user conditional MINs. Each stage joins the
  previous stage's per-user timestamps (1 row/user, shrinking) back to
  events on user_id — same-key shuffles again, and every stage's output is
  dimension-sized, never fact-sized. The whole funnel collapses to one row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load
from ..ranking import global_ntile
from ..registry import query


@query(
    "q_cohort",
    oracle="""
    WITH firstday AS (
      SELECT user_id, min(date_trunc('day', ts)) AS cohort_day
      FROM events GROUP BY user_id
    ),
    activity AS (
      SELECT DISTINCT user_id, date_trunc('day', ts) AS active_day
      FROM events
    )
    SELECT cohort_day,
           datediff('day', cohort_day, active_day) AS day_offset,
           count(*) AS n_users
    FROM firstday JOIN activity USING (user_id)
    GROUP BY 1, 2
    """,
    tags=("behavior", "agg"),
)
def q_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users bucketed by first-seen day, counted
    on each later active day as an offset from their cohort day."""
    t = load(spark, sf_dir)
    day = F.date_trunc("day", "ts")
    firstday = t.events.groupBy("user_id").agg(F.min(day).alias("cohort_day"))
    activity = t.events.select(
        "user_id", day.alias("active_day")
    ).distinct()
    return (
        firstday.join(activity, "user_id")
        .groupBy(
            "cohort_day",
            F.datediff("active_day", "cohort_day").alias("day_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


@query(
    "q_funnel",
    oracle="""
    WITH s1 AS (
      SELECT user_id, min(ts) AS t_signup
      FROM events WHERE event_type = 'signup' GROUP BY user_id
    ),
    s2 AS (
      SELECT e.user_id, min(e.ts) AS t_click
      FROM events e JOIN s1 USING (user_id)
      WHERE e.event_type = 'click' AND e.ts >= s1.t_signup
      GROUP BY e.user_id
    ),
    s3 AS (
      SELECT e.user_id, min(e.ts) AS t_purchase
      FROM events e JOIN s2 USING (user_id)
      WHERE e.event_type = 'purchase' AND e.ts >= s2.t_click
      GROUP BY e.user_id
    )
    SELECT (SELECT count(*) FROM s1) AS n_signup,
           (SELECT count(*) FROM s2) AS n_click_after_signup,
           (SELECT count(*) FROM s3) AS n_purchase_after_click
    """,
    tags=("behavior", "agg"),
)
def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict-order conversion funnel: first signup, first click at-or-after
    it, first purchase at-or-after that click; per-stage distinct-user
    counts in one row."""
    t = load(spark, sf_dir)
    ev = t.events
    s1 = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_signup"))
    )
    s2 = (
        ev.filter(F.col("event_type") == "click")
        .join(s1, "user_id")
        .filter(F.col("ts") >= F.col("t_signup"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    s3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .filter(F.col("ts") >= F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    return (
        s1.agg(F.count(F.lit(1)).alias("n_signup"))
        .crossJoin(s2.agg(F.count(F.lit(1)).alias("n_click_after_signup")))
        .crossJoin(s3.agg(F.count(F.lit(1)).alias("n_purchase_after_click")))
    )


@query(
    "q_market_basket",
    oracle="""
    WITH ut AS (
      SELECT DISTINCT user_id, event_type FROM events
    ),
    pair AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             count(*) AS n_both
      FROM ut a JOIN ut b ON a.user_id = b.user_id
                         AND a.event_type < b.event_type
      GROUP BY 1, 2
    ),
    base AS (
      SELECT event_type, count(*) AS n_any FROM ut GROUP BY 1
    )
    SELECT p.type_a, p.type_b, p.n_both,
           p.n_both / a.n_any AS confidence_a_to_b,
           p.n_both / b.n_any AS confidence_b_to_a
    FROM pair p
    JOIN base a ON p.type_a = a.event_type
    JOIN base b ON p.type_b = b.event_type
    """,
    tags=("behavior", "join"),
)
def q_market_basket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-engagement association rules: distinct (user, type) pairs
    self-joined on user (ordered pair to emit each combination once),
    confidence = P(B|A) from the per-type bases. The self-join input is
    already deduplicated to dimension size (users × types), so the
    quadratic blowup is per-user over #types (bounded), never over raw
    events; the base-rate joins are broadcasts."""
    t = load(spark, sf_dir)
    ut = t.events.select("user_id", "event_type").distinct()
    a = ut.select("user_id", F.col("event_type").alias("type_a"))
    b = ut.select(
        F.col("user_id").alias("user_b"), F.col("event_type").alias("type_b")
    )
    pair = (
        a.join(b, (a.user_id == b.user_b) & (a.type_a < b.type_b))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    base = ut.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_any"))
    base_a = F.broadcast(
        base.select(F.col("event_type").alias("_ta"), F.col("n_any").alias("n_a"))
    )
    base_b = F.broadcast(
        base.select(F.col("event_type").alias("_tb"), F.col("n_any").alias("n_b"))
    )
    return (
        pair.join(base_a, pair.type_a == F.col("_ta"))
        .join(base_b, pair.type_b == F.col("_tb"))
        .select(
            "type_a",
            "type_b",
            "n_both",
            (F.col("n_both") / F.col("n_a")).alias("confidence_a_to_b"),
            (F.col("n_both") / F.col("n_b")).alias("confidence_b_to_a"),
        )
    )


@query(
    "q_streaks",
    oracle="""
    WITH ordered AS (
      SELECT event_type, value, ts, event_id,
             lag(value) OVER (PARTITION BY event_type ORDER BY ts, event_id) AS prev
      FROM events
    ),
    flagged AS (
      SELECT event_type, ts, event_id,
             CASE WHEN prev IS NULL OR value <= prev THEN 1 ELSE 0 END AS brk
      FROM ordered
    ),
    grouped AS (
      SELECT event_type,
             sum(brk) OVER (PARTITION BY event_type ORDER BY ts, event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_id
      FROM flagged
    ),
    runs AS (
      SELECT event_type, run_id, count(*) AS run_len
      FROM grouped GROUP BY event_type, run_id
    )
    SELECT event_type,
           CAST(max(run_len) AS BIGINT) AS longest_up_streak,
           count(*) AS n_runs
    FROM runs GROUP BY event_type ORDER BY event_type
    """,
    tags=("behavior", "window"),
)
def q_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest strictly-increasing streak per key — the gaps-and-islands
    pattern applied to monotone runs (momentum/anomaly signal over the
    reference's price series; sessionization's q_session twin uses time
    gaps where this uses value direction). A break flag (first row or
    value <= previous) cumulative-summed in event order assigns each row a
    run id without any self-join; run lengths are then a plain groupBy.

    CAVEAT the oracle must mirror: the run-id cumsum needs a stable row
    order shared by both engines — (ts, event_id) is the deterministic
    event order used everywhere else in this engine.

    Scale: one shuffle on event_type, two streaming window passes over
    sorted partitions, then an agg whose cardinality is runs (<< rows).
    """
    t = load(spark, sf_dir)
    order_w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    run_w = order_w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    flagged = t.events.select(
        "event_type",
        "ts",
        "event_id",
        F.when(
            F.lag("value").over(order_w).isNull()
            | (F.col("value") <= F.lag("value").over(order_w)),
            1,
        )
        .otherwise(0)
        .alias("brk"),
    ).select("event_type", F.sum("brk").over(run_w).alias("run_id"))
    runs = flagged.groupBy("event_type", "run_id").agg(
        F.count(F.lit(1)).alias("run_len")
    )
    return (
        runs.groupBy("event_type")
        .agg(
            F.max("run_len").alias("longest_up_streak"),
            F.count(F.lit(1)).alias("n_runs"),
        )
        .orderBy("event_type")
    )


@query(
    "q_cdc_apply",
    oracle="""
    WITH changelog AS (
      SELECT user_id AS pk,
             event_id AS seq,
             CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
             value
      FROM events
    )
    SELECT pk,
           last_value AS current_value
    FROM (
      SELECT pk,
             arg_max(op, seq)    AS last_op,
             arg_max(value, seq) AS last_value
      FROM changelog GROUP BY pk
    )
    WHERE last_op <> 'D'
    """,
    tags=("cdc", "agg"),
)
def q_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC changelog apply: reconstruct current table state from an
    ordered upsert/delete log — the consumer side of every Debezium/CDC
    feed. The events table stands in as the log (pk=user_id, seq=event_id,
    'error' rows are tombstones); the winner per key is the highest-seq
    operation, and a winning tombstone removes the key.

    Plan shape matters at 100 TB/day of changes: the winner is computed
    with max_by (one hash aggregation with MAP-SIDE PARTIAL combine), not
    row_number() over (partition by pk order by seq desc) — a window would
    sort every key group; the aggregate folds each partition down to one
    candidate per key before the exchange. Same contract as q_merge_upsert
    but from a log, not a snapshot diff.
    """
    t = load(spark, sf_dir)
    log = t.events.select(
        F.col("user_id").alias("pk"),
        F.col("event_id").alias("seq"),
        F.when(F.col("event_type") == "error", F.lit("D"))
        .otherwise(F.lit("U"))
        .alias("op"),
        "value",
    )
    return cdc_apply(log)


def cdc_apply(log: DataFrame) -> DataFrame:
    """Changelog-apply core: columns (pk, seq, op in {'U','D'}, value) →
    current state (pk, current_value). Factored out of q_cdc_apply so toy
    logs with known outcomes exercise it directly (tests).

    The op is re-encoded as an int flag BEFORE aggregating: max_by over a
    string value forces SortAggregate (string agg buffers aren't mutable
    fixed-width), which sorts every partition of the fact table; with
    primitive buffers both max_bys run as one partial/final HashAggregate
    — no sort anywhere in the plan."""
    winners = log.groupBy("pk").agg(
        F.max_by(
            F.when(F.col("op") == "D", F.lit(1)).otherwise(F.lit(0)), F.col("seq")
        ).alias("last_is_delete"),
        F.max_by("value", "seq").alias("last_value"),
    )
    return winners.filter(F.col("last_is_delete") == 0).select(
        "pk", F.col("last_value").alias("current_value")
    )


@query(
    "q_active_users",
    oracle="""
    WITH pairs AS (
      SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events
    ),
    days AS (SELECT DISTINCT d FROM pairs)
    SELECT CAST(days.d AS TIMESTAMP) AS day,
           count(DISTINCT p.user_id) AS wau
    FROM days JOIN pairs p
      ON p.d BETWEEN days.d - INTERVAL 6 DAY AND days.d
    GROUP BY 1
    """,
    tags=("behavior", "window", "distinct"),
)
def q_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day active users (WAU) per day — the windowed DISTINCT
    aggregate SQL cannot express directly (COUNT(DISTINCT) OVER is
    unsupported in both engines; the oracle spells it as a range self-join).

    The Spark plan inverts the window into a CONTRIBUTION EXPANSION: each
    distinct (day, user) pair announces itself to the ≤7 target days it can
    count toward (sequence + explode), then one exact countDistinct per
    target day. Expansion is bounded ×7 — data-independent — and both
    shuffles hash on small keys; no range join, no per-day re-scan. The
    unbounded-cardinality variant swaps countDistinct for HLL partials
    (q_hll_sketch) when exactness can yield to memory at 100 TB.
    """
    t = load(spark, sf_dir)
    pairs = t.events.select(
        F.to_date("ts").alias("d"), "user_id"
    ).distinct()
    days = pairs.select("d").distinct()
    expanded = pairs.select(
        F.explode(
            F.sequence(F.col("d"), F.date_add(F.col("d"), 6))
        ).alias("day"),
        "user_id",
    )
    # Only days that exist in the data are reportable (trailing ghosts cut
    # by a broadcast semi-join against the day dimension).
    observed = expanded.join(
        F.broadcast(days.withColumnRenamed("d", "day")), "day", "left_semi"
    )
    return observed.groupBy("day").agg(
        F.count_distinct("user_id").alias("wau")
    ).select(F.col("day").cast("timestamp_ntz").alias("day"), "wau")


@query(
    "q_funnel_windowed",
    oracle="""
    WITH scanned AS (
      SELECT user_id, ts, event_id, event_type,
             max(CASE WHEN event_type = 'view' THEN ts END)
               OVER w AS last_view_ts
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING)
    ),
    clicks AS (
      SELECT user_id, ts, event_id, event_type,
             max(CASE WHEN event_type = 'click'
                       AND last_view_ts >= ts - INTERVAL 1 HOUR
                      THEN ts END)
               OVER w AS last_qc_ts
      FROM scanned
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING)
    )
    SELECT user_id,
           count(*)  AS n_completions,
           min(ts)   AS first_completion
    FROM clicks
    WHERE event_type = 'purchase'
      AND last_qc_ts >= ts - INTERVAL 1 HOUR
    GROUP BY user_id
    """,
    tags=("behavior", "window"),
)
def q_funnel_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-constrained ordered funnel: purchases completing a
    view → click → purchase chain where each consecutive gap is ≤ 1 hour —
    the sequential-pattern query behind attribution and conversion-window
    analytics (q_funnel is its unconstrained global-order cousin).

    ONE stateful scan per user expresses the whole pattern: a running
    max-of-view-ts marks the latest view at every row; clicks within an
    hour of that view become qualified, and a second running max carries
    the latest qualified click into each purchase row. Two window
    functions over the SAME (user_id, ts) sort — Catalyst evaluates both
    in a single Window operator after one exchange+sort, so the fact
    table shuffles exactly once, with no self-joins and no explosion of
    (view, click, purchase) triples, which is what a join formulation
    costs at 100 TB.

    The sf0.01 correctness tier happens to contain no within-the-hour
    completions (0 rows on both sides — a vacuous match), so the pattern
    semantics are additionally pinned by a hand-built fixture test
    (tests/test_composite_ops.py::test_windowed_funnel_fixture).
    """
    t = load(spark, sf_dir)
    return windowed_funnel(t.events)


def windowed_funnel(events: DataFrame) -> DataFrame:
    """Core of q_funnel_windowed over any (user_id, ts, event_id,
    event_type) log — split out so fixture tests can drive it with
    hand-built sequences."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    hour = F.expr("INTERVAL 1 HOUR")
    scanned = events.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.max(F.when(F.col("event_type") == "view", F.col("ts"))).over(w).alias(
            "last_view_ts"
        ),
    )
    clicks = scanned.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.max(
            F.when(
                (F.col("event_type") == "click")
                & (F.col("last_view_ts") >= F.col("ts") - hour),
                F.col("ts"),
            )
        )
        .over(w)
        .alias("last_qc_ts"),
    )
    return (
        clicks.filter(
            (F.col("event_type") == "purchase")
            & (F.col("last_qc_ts") >= F.col("ts") - hour)
        )
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_completions"),
            F.min("ts").alias("first_completion"),
        )
    )


@query(
    "q_rfm",
    oracle="""
    WITH agg AS (
      SELECT user_id,
             max(ts) AS last_ts,
             CAST(count(*) AS BIGINT) AS frequency,
             round(sum(value), 6) AS monetary
      FROM events GROUP BY user_id
    )
    SELECT user_id, frequency, monetary,
           CAST(ntile(5) OVER (ORDER BY last_ts DESC, user_id) AS BIGINT)
             AS r_score,
           CAST(ntile(5) OVER (ORDER BY frequency DESC, user_id) AS BIGINT)
             AS f_score,
           CAST(ntile(5) OVER (ORDER BY monetary DESC, user_id) AS BIGINT)
             AS m_score
    FROM agg
    """,
    tags=("behavior", "window"),
)
def q_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation — the classic behavioral scoring (Hughes 1994,
    still the default CRM / user-cohort cut): per user, recency (last
    event), frequency (event count), monetary (summed value), each
    scored into quintiles (1 = best). Ranking runs on the ROUNDED
    monetary total with user_id tie-breaks, so float summation order
    cannot flip a quintile boundary between engines (the q_cosine_topk
    contract); ntile's uneven-bucket rule (earlier buckets take the
    remainder) is defined identically in Spark and DuckDB over a total
    order.

    Scale shape: ONE fact-scale groupBy(user_id) with map-side partials;
    each quintile comes from ranking.global_ntile — the two-pass range
    plan plus NTILE's closed form over (rank, N) — so the USER-grain
    aggregate (which grows with the catalog, unlike a summary grain)
    never funnels through a single window task (r13; formerly three
    bare ntile windows). The first rank pass checkpoints its ranged
    input (global_row_number's branch-consistency rule), so the second
    and third passes chain off frozen data — the fact is scanned
    once."""
    t = load(spark, sf_dir)
    agg = t.events.groupBy("user_id").agg(
        F.max("ts").alias("last_ts"),
        F.count(F.lit(1)).cast("bigint").alias("frequency"),
        F.round(F.sum("value"), 6).alias("monetary"),
    )
    neg_ts = (-F.unix_micros(F.col("last_ts").cast("timestamp"))).alias(
        "_neg_ts"
    )
    scored = agg.select("*", neg_ts)
    scored = global_ntile(scored, 5, "_neg_ts", "user_id", out_col="_r")
    scored = scored.withColumn("_neg_f", -F.col("frequency"))
    scored = global_ntile(scored, 5, "_neg_f", "user_id", out_col="_f")
    scored = scored.withColumn("_neg_m", -F.col("monetary"))
    scored = global_ntile(scored, 5, "_neg_m", "user_id", out_col="_m")
    return scored.select(
        "user_id",
        "frequency",
        "monetary",
        F.col("_r").cast("bigint").alias("r_score"),
        F.col("_f").cast("bigint").alias("f_score"),
        F.col("_m").cast("bigint").alias("m_score"),
    )


@query(
    "q_attribution",
    oracle="""
    WITH tagged AS (
      SELECT user_id, ts, event_id, event_type, value,
             last_value(CASE WHEN event_type IN ('click', 'view')
                             THEN event_type END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING) AS touch_type,
             last_value(CASE WHEN event_type IN ('click', 'view')
                             THEN ts END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING) AS touch_ts
      FROM events
    )
    SELECT CASE WHEN touch_ts >= ts - INTERVAL 60 MINUTE
                THEN touch_type ELSE 'direct' END AS channel,
           CAST(count(*) AS BIGINT) AS n_conversions,
           round(sum(value), 4) AS attributed_value
    FROM tagged WHERE event_type = 'purchase'
    GROUP BY 1 ORDER BY 1
    """,
    tags=("behavior", "window"),
)
def q_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch marketing attribution: every purchase credits the
    user's most recent click/view within a 60-minute lookback (outside
    it: 'direct') — the revenue-accounting readout behind every
    channel-spend decision, and the canonical use of running
    last-non-null state over an event stream.

    One user-keyed ordered window carries (touch type, touch ts) as two
    IGNORE-NULLS last_value folds — both pick the same touch row, so the
    pair stays consistent without a struct; the purchase row then
    classifies map-side and rolls up to channel grain. Scale: a single
    user-keyed range exchange (users are hash-spread; no global sort),
    then an arm-grain aggregate — the same shape q_funnel_windowed
    proved skew-safe. Ties break on event_id so replays are exact."""
    t = load(spark, sf_dir)
    touch = F.col("event_type").isin("click", "view")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    tagged = t.events.select(
        "ts",
        "event_type",
        "value",
        F.last(F.when(touch, F.col("event_type")), ignorenulls=True)
        .over(w)
        .alias("touch_type"),
        F.last(F.when(touch, F.col("ts")), ignorenulls=True)
        .over(w)
        .alias("touch_ts"),
    )
    conv = tagged.filter(F.col("event_type") == "purchase").select(
        F.when(
            F.col("touch_ts")
            >= F.col("ts") - F.expr("INTERVAL 60 MINUTES"),
            F.col("touch_type"),
        )
        .otherwise("direct")
        .alias("channel"),
        "value",
    )
    return (
        conv.groupBy("channel")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_conversions"),
            F.round(F.sum("value"), 4).alias("attributed_value"),
        )
        .orderBy("channel")
    )


@query(
    "q_markov_transitions",
    oracle="""
    WITH seq AS (
      SELECT event_type AS cur,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS nxt
      FROM events
    ),
    pairs AS (
      SELECT cur, nxt, count(*) AS n FROM seq
      WHERE nxt IS NOT NULL GROUP BY cur, nxt
    )
    SELECT cur, nxt, CAST(n AS BIGINT) AS n,
           round(n / CAST(sum(n) OVER (PARTITION BY cur) AS DOUBLE), 8)
             AS p
    FROM pairs ORDER BY cur, nxt
    """,
    tags=("behavior", "window"),
)
def q_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: P(next = b | current = a) — the behavioral-model core
    behind next-action prediction, Sankey/path visualizations, and
    anomaly scoring of navigation flows (an improbable transition run
    flags bot traffic).

    One user-keyed ordered window produces (current, next) via lead();
    pair counts and row-normalization both live at TYPE² grain — bounded
    by the event vocabulary, not the corpus. Scale: the same single
    user-keyed exchange as q_attribution (per-user partitions are
    bounded session histories), then two tiny aggregates; ties break on
    event_id so replays hash-match."""
    t = load(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = t.events.select(
        F.col("event_type").alias("cur"),
        F.lead("event_type").over(w).alias("nxt"),
    ).filter(F.col("nxt").isNotNull())
    pairs = seq.groupBy("cur", "nxt").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    wc = Window.partitionBy("cur")
    return pairs.select(
        "cur",
        "nxt",
        "n",
        F.round(
            F.col("n") / F.sum("n").over(wc).cast("double"), 8
        ).alias("p"),
    ).orderBy("cur", "nxt")


@query(
    "q_stickiness",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS d,
             date_trunc('week', CAST(ts AS DATE)) AS wk,
             count(DISTINCT user_id) AS dau
      FROM events GROUP BY 1, 2
    ),
    weekly AS (
      SELECT date_trunc('week', CAST(ts AS DATE)) AS wk,
             count(DISTINCT user_id) AS wau
      FROM events GROUP BY 1
    )
    SELECT CAST(d.wk AS DATE) AS week_start,
           CAST(w.wau AS BIGINT) AS wau,
           round(avg(d.dau), 4) AS avg_dau,
           CAST(count(*) AS BIGINT) AS n_days,
           round(avg(d.dau) / w.wau, 6) AS stickiness
    FROM daily d JOIN weekly w USING (wk)
    GROUP BY d.wk, w.wau ORDER BY week_start
    """,
    tags=("behavior", "agg"),
)
def q_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/WAU stickiness per week — the engagement-intensity ratio
    (what fraction of the week's actives show up on an average day),
    the growth metric next to q_active_users' raw counts and q_cohort's
    retention triangles.

    Two COUNT(DISTINCT user) aggregations at different time grains
    (day and week) joined at week grain: each plans as Spark's two-phase
    distinct expand — partial dedup map-side, so the shuffle carries
    (grain, user) pairs once, not events. At 100 TB the day/week grains
    would share one (date, user)-deduped intermediate; at this
    cardinality the two independent scans are cheaper than materializing
    it."""
    t = load(spark, sf_dir)
    d = F.col("ts").cast("date")
    daily = t.events.groupBy(
        d.alias("d"), F.date_trunc("week", d).alias("wk")
    ).agg(F.countDistinct("user_id").alias("dau"))
    weekly = t.events.groupBy(
        F.date_trunc("week", d).alias("wk")
    ).agg(F.countDistinct("user_id").alias("wau"))
    return (
        daily.join(weekly, "wk")
        .groupBy("wk", "wau")
        .agg(
            F.round(F.avg("dau"), 4).alias("avg_dau"),
            F.count(F.lit(1)).cast("bigint").alias("n_days"),
            F.round(F.avg("dau") / F.col("wau"), 6).alias("stickiness"),
        )
        .select(
            F.col("wk").cast("date").alias("week_start"),
            F.col("wau").cast("bigint").alias("wau"),
            "avg_dau",
            "n_days",
            "stickiness",
        )
        .orderBy("week_start")
    )


@query(
    "q_concentration",
    oracle="""
    WITH u AS (
      SELECT user_id, sum(value) AS total
      FROM events WHERE event_type = 'purchase' GROUP BY user_id
    ),
    cuts AS (
      SELECT quantile_cont(total, 0.9) AS p90,
             quantile_cont(total, 0.99) AS p99,
             sum(total) AS grand, count(*) AS n_users
      FROM u
    )
    SELECT CAST(n_users AS BIGINT) AS n_users,
           round(p90, 6) AS p90_cut,
           round(p99, 6) AS p99_cut,
           CAST(sum(CASE WHEN total > p90 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_top10,
           round(sum(CASE WHEN total > p90 THEN total ELSE 0 END)
                 / grand, 6) AS top10_share,
           round(sum(CASE WHEN total > p99 THEN total ELSE 0 END)
                 / grand, 6) AS top1_share
    FROM u CROSS JOIN cuts
    GROUP BY n_users, p90, p99, grand
    """,
    tags=("behavior", "agg"),
)
def q_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue-concentration (Pareto) audit: what share of purchase value
    comes from the top 10% / top 1% of users (by exact p90/p99 spend
    cuts) — the whale-dependence readout next to q_gini's single
    inequality number; a corpus-curation twin decides domain caps the
    same way (q_domain_cap acts on what this measures).

    Shape: one fact-scale groupBy(user) (combinable), exact percentile
    cuts as a 1-row broadcast, one conditional re-aggregate over the
    user-grain table — the fact is touched once, everything after runs
    at user grain; at 100 TB the percentile aggregate swaps for a KLL
    sketch with the rest unchanged (the q_woe_iv pattern — swap
    executed and verdict-checked as q_woe_iv_kll, r13)."""
    t = load(spark, sf_dir)
    u = (
        t.events.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.sum("value").alias("total"))
    )
    cuts = u.agg(
        F.percentile("total", F.lit(0.9)).alias("p90"),
        F.percentile("total", F.lit(0.99)).alias("p99"),
        F.sum("total").alias("grand"),
        F.count(F.lit(1)).alias("n_users"),
    )
    return (
        u.crossJoin(F.broadcast(cuts))
        .groupBy("n_users", "p90", "p99", "grand")
        .agg(
            F.sum(F.when(F.col("total") > F.col("p90"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_top10"),
            F.round(
                F.sum(
                    F.when(F.col("total") > F.col("p90"), F.col("total"))
                    .otherwise(0.0)
                )
                / F.col("grand"),
                6,
            ).alias("top10_share"),
            F.round(
                F.sum(
                    F.when(F.col("total") > F.col("p99"), F.col("total"))
                    .otherwise(0.0)
                )
                / F.col("grand"),
                6,
            ).alias("top1_share"),
        )
        .select(
            F.col("n_users").cast("bigint").alias("n_users"),
            F.round(F.col("p90"), 6).alias("p90_cut"),
            F.round(F.col("p99"), 6).alias("p99_cut"),
            "n_top10",
            "top10_share",
            "top1_share",
        )
    )


@query(
    "q_kaplan_meier",
    oracle="""
    WITH per_user AS (
      SELECT user_id, min(ts) AS t0, max(ts) AS tend,
             min(CASE WHEN event_type = 'purchase' THEN ts END) AS tp
      FROM events GROUP BY user_id
    ),
    durs AS (
      SELECT user_id,
             CAST((epoch_us(coalesce(tp, tend)) - epoch_us(t0))
                  // 3600000000 AS BIGINT) AS dur_h,
             CASE WHEN tp IS NOT NULL THEN 1 ELSE 0 END AS ev
      FROM per_user
    ),
    grid AS (
      SELECT dur_h, CAST(sum(ev) AS BIGINT) AS d,
             CAST(sum(1 - ev) AS BIGINT) AS cens
      FROM durs GROUP BY dur_h
    ),
    risk AS (
      SELECT dur_h, d, cens,
             sum(d + cens) OVER (ORDER BY dur_h DESC
                                 ROWS UNBOUNDED PRECEDING) AS n_risk
      FROM grid
    ),
    folded AS (
      SELECT dur_h, d, cens, n_risk,
             max(CASE WHEN d >= n_risk THEN 1 ELSE 0 END)
               OVER (ORDER BY dur_h ROWS UNBOUNDED PRECEDING) AS hit_zero,
             sum(CASE WHEN d < n_risk
                      THEN ln(1 - d / CAST(n_risk AS DOUBLE)) ELSE 0 END)
               OVER (ORDER BY dur_h ROWS UNBOUNDED PRECEDING) AS log_s
      FROM risk
    )
    SELECT dur_h, CAST(n_risk AS BIGINT) AS n_risk, d AS n_events,
           cens AS n_censored,
           CASE WHEN hit_zero = 1 THEN 0.0
                ELSE round(exp(log_s), 6) END AS survival
    FROM folded ORDER BY dur_h
    """,
    tags=("behavior", "stats", "agg"),
)
def q_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival curve for time-to-first-purchase: per user,
    duration = hours from first activity to first purchase (users who
    never purchase are right-CENSORED at their last activity — the
    whole point of KM: dropping them would bias conversion fast,
    counting them as converted would bias it slow; KM removes them from
    the risk set at exactly the moment they stop being observable).
    S(t) = Π_{t'<=t} (1 − d_t'/n_t') — the standard product-limit
    estimator behind conversion/retention/churn curves.

    Scale shape: the fact collapses to USER grain (one combinable
    min/conditional-min/max aggregate), then to the content-bounded
    hour-DURATION grain (≤ corpus window in hours at any N). Risk sets
    are one descending running sum, the product-limit is exp(Σ ln) via
    an ASCENDING running sum at that grain — ordered prefix sums, so
    both engines add in the identical sequence. The d = n_risk
    boundary (survival exactly 0, where ln diverges and Spark's log
    returns NULL while DuckDB returns -inf) is handled by an explicit
    zero-flag running max on BOTH engines."""
    t = load(spark, sf_dir)
    per_user = t.events.groupBy("user_id").agg(
        F.min("ts").alias("t0"),
        F.max("ts").alias("tend"),
        F.min(
            F.when(F.col("event_type") == "purchase", F.col("ts"))
        ).alias("tp"),
    )
    durs = per_user.select(
        F.expr(
            "(unix_micros(cast(coalesce(tp, tend) as timestamp))"
            " - unix_micros(cast(t0 as timestamp))) div 3600000000"
        )
        .cast("bigint")
        .alias("dur_h"),
        F.when(F.col("tp").isNotNull(), 1).otherwise(0).alias("ev"),
    )
    grid = durs.groupBy("dur_h").agg(
        F.sum("ev").cast("bigint").alias("d"),
        F.sum(1 - F.col("ev")).cast("bigint").alias("cens"),
    )
    w_desc = Window.orderBy(F.col("dur_h").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    risk = grid.select(
        "dur_h",
        "d",
        "cens",
        F.sum(F.col("d") + F.col("cens")).over(w_desc).alias("n_risk"),
    )
    w_asc = Window.orderBy("dur_h").rowsBetween(
        Window.unboundedPreceding, 0
    )
    folded = risk.select(
        "dur_h",
        "d",
        "cens",
        "n_risk",
        F.max(
            F.when(F.col("d") >= F.col("n_risk"), 1).otherwise(0)
        )
        .over(w_asc)
        .alias("hit_zero"),
        F.sum(
            F.when(
                F.col("d") < F.col("n_risk"),
                F.log(1 - F.col("d") / F.col("n_risk").cast("double")),
            ).otherwise(0.0)
        )
        .over(w_asc)
        .alias("log_s"),
    )
    return folded.select(
        "dur_h",
        F.col("n_risk").cast("bigint").alias("n_risk"),
        F.col("d").alias("n_events"),
        F.col("cens").alias("n_censored"),
        F.when(F.col("hit_zero") == 1, F.lit(0.0))
        .otherwise(F.round(F.exp("log_s"), 6))
        .alias("survival"),
    ).orderBy("dur_h")
