"""Data-quality audit and snapshot change-detection — the validation layer
the reference's ingestion loop is missing (it stores whatever the API
returns, no checks: /root/reference/dataCollector.py:115-128, a gap its own
README acknowledges, README.md:33-36,45).

Scale notes (100 TB design point):
- q_dq_audit: every check is a scan-side aggregation (count over a
  predicate) except referential integrity, which is a left-anti join on the
  fact key — one shuffle, or zero when the checked dim broadcasts. All
  checks share one pass per table; the answer is a single row regardless
  of input size.
- q_snapshot_diff: full-outer join of two snapshots on the PK, emitting
  added/removed/changed. Both sides hash-partition on the same key (one
  co-located shuffle each); with bucketed snapshots the diff is
  exchange-free. This is the batch CDC primitive: diff-then-merge is how a
  lake without a table format detects upstream changes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import query


@query(
    "q_dq_audit",
    oracle="""
    SELECT
      (SELECT count(*) FROM events WHERE value IS NULL)    AS null_values,
      (SELECT count(*) FROM events WHERE value < 0)        AS negative_values,
      (SELECT count(*) FROM lineitem l
         LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
       WHERE o.o_orderkey IS NULL)                         AS orphan_lineitems,
      (SELECT count(*) FROM (SELECT event_id FROM events
                             GROUP BY event_id HAVING count(*) > 1))
                                                           AS dup_event_ids,
      (SELECT count(*) FROM events
       WHERE ts < TIMESTAMP '2020-01-01'
          OR ts >= TIMESTAMP '2030-01-01')                 AS out_of_range_ts
    """,
    tags=("quality", "agg"),
)
def q_dq_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row data-quality audit: null rate, domain violations,
    referential orphans (anti-join), PK uniqueness, timestamp sanity —
    the gate an ingestion job should fail on before publishing a batch."""
    t = load(spark, sf_dir)
    ev = t.events
    nulls = ev.filter(F.col("value").isNull()).agg(
        F.count(F.lit(1)).alias("null_values")
    )
    negatives = ev.filter(F.col("value") < 0).agg(
        F.count(F.lit(1)).alias("negative_values")
    )
    orphans = (
        t.lineitem.select("l_orderkey")
        .join(t.orders.select("o_orderkey"),
              F.col("l_orderkey") == F.col("o_orderkey"), "left_anti")
        .agg(F.count(F.lit(1)).alias("orphan_lineitems"))
    )
    dups = (
        ev.groupBy("event_id")
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") > 1)
        .agg(F.count(F.lit(1)).alias("dup_event_ids"))
    )
    lo = F.lit("2020-01-01").cast("timestamp_ntz")
    hi = F.lit("2030-01-01").cast("timestamp_ntz")
    ts_range = ev.filter((F.col("ts") < lo) | (F.col("ts") >= hi)).agg(
        F.count(F.lit(1)).alias("out_of_range_ts")
    )
    return (
        nulls.crossJoin(negatives)
        .crossJoin(orphans)
        .crossJoin(dups)
        .crossJoin(ts_range)
    )


@query(
    "q_snapshot_diff",
    oracle="""
    WITH a AS (
      SELECT c_custkey, c_acctbal FROM customer
    ),
    b AS (
      SELECT c_custkey,
             CASE WHEN c_custkey % 10 = 0 THEN c_acctbal * 2
                  ELSE c_acctbal END AS c_acctbal
      FROM customer WHERE c_custkey % 97 <> 0
      UNION ALL
      SELECT c_custkey + 1000000, c_acctbal
      FROM customer WHERE c_custkey % 101 = 0
    )
    SELECT COALESCE(a.c_custkey, b.c_custkey) AS c_custkey,
           CASE WHEN a.c_custkey IS NULL THEN 'added'
                WHEN b.c_custkey IS NULL THEN 'removed'
                ELSE 'changed' END AS change_type,
           a.c_acctbal AS old_val,
           b.c_acctbal AS new_val
    FROM a FULL OUTER JOIN b ON a.c_custkey = b.c_custkey
    WHERE a.c_custkey IS NULL
       OR b.c_custkey IS NULL
       OR a.c_acctbal <> b.c_acctbal
    """,
    tags=("quality", "join"),
)
def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot change detection: full-outer join of snapshot A (the
    customer dim) against snapshot B (a deterministically perturbed
    version: every 10th balance doubled, every 97th row deleted, every
    101st re-keyed as an insert), classifying rows added / removed /
    changed — the diff a CDC-less lake computes to feed MERGE."""
    t = load(spark, sf_dir)
    a = t.customer.select("c_custkey", "c_acctbal")
    b = (
        t.customer.filter(F.col("c_custkey") % 97 != 0)
        .select(
            "c_custkey",
            F.when(
                F.col("c_custkey") % 10 == 0, F.col("c_acctbal") * 2
            ).otherwise(F.col("c_acctbal")).alias("c_acctbal"),
        )
        .unionByName(
            t.customer.filter(F.col("c_custkey") % 101 == 0).select(
                (F.col("c_custkey") + 1000000).alias("c_custkey"),
                "c_acctbal",
            )
        )
    )
    a2 = a.select(
        F.col("c_custkey").alias("a_key"), F.col("c_acctbal").alias("old_val")
    )
    b2 = b.select(
        F.col("c_custkey").alias("b_key"), F.col("c_acctbal").alias("new_val")
    )
    joined = a2.join(b2, a2.a_key == b2.b_key, "full_outer")
    return joined.filter(
        F.col("a_key").isNull()
        | F.col("b_key").isNull()
        | (F.col("old_val") != F.col("new_val"))
    ).select(
        F.coalesce("a_key", "b_key").alias("c_custkey"),
        F.when(F.col("a_key").isNull(), "added")
        .when(F.col("b_key").isNull(), "removed")
        .otherwise("changed")
        .alias("change_type"),
        "old_val",
        "new_val",
    )


@query(
    "q_masking",
    oracle="""
    SELECT event_id,
           sha256('pepper-2026' || CAST(user_id AS VARCHAR)) AS user_pseudo,
           CAST(floor(value / 25) AS INTEGER) AS value_band,
           CASE WHEN event_type IN ('purchase', 'refund')
                THEN event_type ELSE 'other' END AS type_coarse
    FROM events
    """,
    tags=("governance", "masking"),
)
def q_masking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic data masking (governance projection): salted-hash
    pseudonymization of the user key (joinable within a release, not
    reversible), value banding, and category coarsening — the export
    shape for analytics consumers who must not see raw identifiers.
    Pure projection: masking adds zero shuffles at any scale, and the
    pseudonym stays a valid join/group key across masked tables."""
    t = load(spark, sf_dir)
    return t.events.select(
        "event_id",
        F.sha2(
            F.concat(F.lit("pepper-2026"), F.col("user_id").cast("string")), 256
        ).alias("user_pseudo"),
        F.floor(F.col("value") / 25).cast("int").alias("value_band"),
        F.when(
            F.col("event_type").isin("purchase", "refund"), F.col("event_type")
        )
        .otherwise("other")
        .alias("type_coarse"),
    )


@query(
    "q_mad_outliers",
    oracle="""
    WITH med AS (
      SELECT event_type, median(value) AS m
      FROM events GROUP BY event_type
    ),
    mad AS (
      SELECT e.event_type, m, median(abs(e.value - m)) AS d
      FROM events e JOIN med USING (event_type)
      GROUP BY e.event_type, m
    )
    SELECT e.event_id, e.event_type, e.value,
           round((e.value - m) / (1.4826 * d), 6) AS robust_z
    FROM events e JOIN mad USING (event_type)
    WHERE d > 0 AND abs(e.value - m) > 3 * 1.4826 * d
    ORDER BY e.event_id
    """,
    tags=("quality", "robust-stats"),
)
def q_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection by median absolute deviation: flag rows
    more than 3 robust standard deviations (1.4826 * MAD) from their
    group median. Unlike the mean/stddev z-score (q_zscore), both center
    and spread are breakdown-resistant — a single wild value cannot mask
    itself by inflating the spread estimate, which is exactly the failure
    mode of naive z-scoring on heavy-tailed training data.

    Two aggregation passes (median, then median of deviations), each a
    key-sized result broadcast back onto the facts — no window over the
    full partition, no sort of the fact table. At 100 TB: two fact scans
    + two tiny broadcasts; Spark's exact median agg is
    single-pass-with-buffer per group (same contract the oracle uses).
    """
    t = load(spark, sf_dir)
    med = t.events.groupBy("event_type").agg(F.median("value").alias("m"))
    mad = (
        t.events.join(F.broadcast(med), "event_type")
        .groupBy("event_type", "m")
        .agg(F.median(F.abs(F.col("value") - F.col("m"))).alias("d"))
    )
    return (
        t.events.join(F.broadcast(mad), "event_type")
        .filter(
            (F.col("d") > 0)
            & (F.abs(F.col("value") - F.col("m")) > 3 * 1.4826 * F.col("d"))
        )
        .select(
            "event_id",
            "event_type",
            "value",
            F.round((F.col("value") - F.col("m")) / (1.4826 * F.col("d")), 6).alias(
                "robust_z"
            ),
        )
        .orderBy("event_id")
    )


@query(
    "q_id_gaps",
    oracle="""
    WITH feed AS (
      SELECT event_id FROM events
      WHERE NOT (event_id BETWEEN 100 AND 199)
        AND NOT (event_id BETWEEN 700 AND 729)
    ),
    ordered AS (
      SELECT event_id,
             lag(event_id) OVER (ORDER BY event_id) AS prev_id
      FROM feed
    )
    SELECT prev_id + 1 AS gap_start, event_id - 1 AS gap_end,
           event_id - prev_id - 1 AS n_missing
    FROM ordered
    WHERE prev_id IS NOT NULL AND event_id - prev_id > 1
    ORDER BY gap_start
    """,
    tags=("quality", "audit"),
)
def q_id_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-completeness audit: find every hole in the event_id
    sequence as a (gap_start, gap_end, n_missing) range — the ingestion
    monitor that catches dropped batches (the reference logs-and-skips
    failed fetches, dataCollector.py:115-116, leaving exactly such holes;
    this op makes them queryable instead of buried in logs). The audited
    feed drops two known id ranges to simulate lost batches — the driver
    data itself is hole-free, and a 0-row audit proves nothing.

    lag over the id order turns hole-finding into a sorted window pass
    emitting one row per RANGE, never one per missing id — a 10^9-id hole
    is one output row. The pass is partition-parallel (the 100 TB shape):
    repartitionByRange on the id, within-range lag (each range sorts
    independently), then boundary stitching — a per-range (min, max)
    aggregate (N tiny rows) lag-joined across adjacent ranges catches the
    holes that span a range boundary. No fact-sized single-partition
    window anywhere; the only global window runs over the N range
    summaries."""
    t = load(spark, sf_dir)
    feed = t.events.filter(
        ~F.col("event_id").between(100, 199) & ~F.col("event_id").between(700, 729)
    ).select("event_id")
    # localCheckpoint freezes the range layout: spark_partition_id() is
    # nondeterministic, and the lag branch and bounds branch would
    # otherwise re-evaluate the exchange with no layout guarantee
    # (see ranking.global_row_number).
    ranged = (
        feed.repartitionByRange(32, "event_id")
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint()
    )
    w_local = Window.partitionBy("_pid").orderBy("event_id")
    local = ranged.select(
        "event_id", F.lag("event_id").over(w_local).alias("prev_id")
    )
    local_gaps = local.filter(
        F.col("prev_id").isNotNull()
        & ((F.col("event_id") - F.col("prev_id")) > 1)
    ).select(
        (F.col("prev_id") + 1).alias("gap_start"),
        (F.col("event_id") - 1).alias("gap_end"),
        (F.col("event_id") - F.col("prev_id") - 1).alias("n_missing"),
    )
    # Boundary stitch: adjacent ranges' (max, min) — driver-scale rows.
    bounds = ranged.groupBy("_pid").agg(
        F.min("event_id").alias("_mn"), F.max("event_id").alias("_mx")
    )
    w_b = Window.orderBy("_pid")
    boundary_gaps = (
        bounds.select(
            F.lag("_mx").over(w_b).alias("prev_mx"), F.col("_mn")
        )
        .filter(
            F.col("prev_mx").isNotNull()
            & ((F.col("_mn") - F.col("prev_mx")) > 1)
        )
        .select(
            (F.col("prev_mx") + 1).alias("gap_start"),
            (F.col("_mn") - 1).alias("gap_end"),
            (F.col("_mn") - F.col("prev_mx") - 1).alias("n_missing"),
        )
    )
    return local_gaps.unionByName(boundary_gaps).orderBy("gap_start")


@query(
    "q_ttest",
    oracle="""
    WITH g AS (
      SELECT
        count(*)        FILTER (WHERE event_type = 'click')    AS n1,
        avg(value)      FILTER (WHERE event_type = 'click')    AS m1,
        var_samp(value) FILTER (WHERE event_type = 'click')    AS v1,
        count(*)        FILTER (WHERE event_type = 'purchase') AS n2,
        avg(value)      FILTER (WHERE event_type = 'purchase') AS m2,
        var_samp(value) FILTER (WHERE event_type = 'purchase') AS v2
      FROM events
    )
    SELECT n1, n2,
           round(m1 - m2, 6) AS mean_diff,
           round((m1 - m2) / sqrt(v1 / n1 + v2 / n2), 6) AS t_stat,
           round(pow(v1 / n1 + v2 / n2, 2)
                 / (pow(v1 / n1, 2) / (n1 - 1) + pow(v2 / n2, 2) / (n2 - 1)),
                 6) AS dof
    FROM g
    """,
    tags=("stats", "agg"),
)
def q_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's two-sample t-test between the click and purchase value
    distributions — the A/B-experiment readout every event log ends up
    serving. Unequal variances, Welch–Satterthwaite degrees of freedom.

    ONE conditional-aggregation pass over the fact table computes both
    samples' (n, mean, s²) simultaneously — no split into two scans, no
    join; the test statistic is then scalar arithmetic on a 1-row frame.
    At 100 TB this is a single map-side-combinable scan regardless of how
    many experiment arms the CASE fans out to. Rounded to 6 decimals: the
    two engines' one-pass variance accumulations differ in summation
    order, not semantics.
    """
    t = load(spark, sf_dir)
    click = F.col("event_type") == "click"
    buy = F.col("event_type") == "purchase"
    g = t.events.agg(
        F.count(F.when(click, 1)).alias("n1"),
        F.avg(F.when(click, F.col("value"))).alias("m1"),
        F.var_samp(F.when(click, F.col("value"))).alias("v1"),
        F.count(F.when(buy, 1)).alias("n2"),
        F.avg(F.when(buy, F.col("value"))).alias("m2"),
        F.var_samp(F.when(buy, F.col("value"))).alias("v2"),
    )
    se2 = F.col("v1") / F.col("n1") + F.col("v2") / F.col("n2")
    dof = F.pow(se2, 2) / (
        F.pow(F.col("v1") / F.col("n1"), 2) / (F.col("n1") - 1)
        + F.pow(F.col("v2") / F.col("n2"), 2) / (F.col("n2") - 1)
    )
    return g.select(
        "n1",
        "n2",
        F.round(F.col("m1") - F.col("m2"), 6).alias("mean_diff"),
        F.round((F.col("m1") - F.col("m2")) / F.sqrt(se2), 6).alias("t_stat"),
        F.round(dof, 6).alias("dof"),
    )


@query(
    "q_seasonal_baseline",
    oracle="""
    WITH cohort AS (
      SELECT event_type,
             date_part('dow', ts)  AS dow,
             date_part('hour', ts) AS hod,
             avg(value)            AS mu,
             stddev_samp(value)    AS sigma
      FROM events
      GROUP BY 1, 2, 3
    ),
    scored AS (
      SELECT e.event_id, e.event_type, e.value,
             round(c.mu, 6) AS seasonal_avg,
             round(abs(e.value - c.mu) / c.sigma, 6) AS abs_z
      FROM events e
      JOIN cohort c
        ON c.event_type = e.event_type
       AND c.dow = date_part('dow', e.ts)
       AND c.hod = date_part('hour', e.ts)
      WHERE c.sigma > 0
    )
    SELECT event_id, event_type, value, seasonal_avg, abs_z
    FROM scored
    ORDER BY abs_z DESC, event_id
    LIMIT 20
    """,
    tags=("stats", "anomaly"),
)
def q_seasonal_baseline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonality-aware anomaly screen: each event is z-scored against its
    (event_type, day-of-week, hour-of-day) cohort — the baseline that
    separates 'weekend night is always quiet' from 'this weekend night is
    wrong', which a global z-score (q_zscore) conflates.

    The cohort table is bounded by type×7×24 regardless of fact size, so
    the join back is a BROADCAST — the fact table is scanned twice (once
    to build baselines, once to score) but never shuffled. Ranking uses
    the 6-decimal-rounded |z| with event_id tie-break, keeping the top-k
    boundary identical across engines. Day-of-week encodings differ
    between engines (Spark Sun=1, DuckDB Sun=0) but only partition
    identity matters, so each side uses its native extraction.
    """
    t = load(spark, sf_dir)
    keys = [
        "event_type",
        F.dayofweek("ts").alias("dow"),
        F.hour("ts").alias("hod"),
    ]
    cohort = t.events.groupBy(*keys).agg(
        F.avg("value").alias("mu"),
        F.stddev_samp("value").alias("sigma"),
    )
    scored = (
        t.events.select(
            "event_id", "event_type", "value",
            F.dayofweek("ts").alias("dow"), F.hour("ts").alias("hod"),
        )
        .join(F.broadcast(cohort), ["event_type", "dow", "hod"])
        .filter(F.col("sigma") > 0)
        .select(
            "event_id",
            "event_type",
            "value",
            F.round("mu", 6).alias("seasonal_avg"),
            F.round(F.abs(F.col("value") - F.col("mu")) / F.col("sigma"), 6).alias(
                "abs_z"
            ),
        )
    )
    return scored.orderBy(F.col("abs_z").desc(), "event_id").limit(20)


@query(
    "q_ks_drift",
    oracle="""
    WITH s AS (
      SELECT n_chars, (lang = 'en') AS is_a FROM documents
    ),
    counts AS (
      SELECT n_chars AS v,
             count(*) FILTER (WHERE is_a) AS ca,
             count(*) FILTER (WHERE NOT is_a) AS cb
      FROM s GROUP BY 1
    ),
    tot AS (
      SELECT sum(ca) AS na, sum(cb) AS nb FROM counts
    ),
    cdf AS (
      SELECT v,
             sum(ca) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cum_a,
             sum(cb) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cum_b
      FROM counts
    )
    SELECT CAST(na AS BIGINT) AS n_a,
           CAST(nb AS BIGINT) AS n_b,
           round(max(abs(cum_a * 1.0 / na - cum_b * 1.0 / nb)), 6) AS ks_d,
           (max(abs(cum_a * 1.0 / na - cum_b * 1.0 / nb))
            > 1.358 * sqrt((na + nb) * 1.0 / (na * nb))) AS drifted
    FROM cdf CROSS JOIN tot
    GROUP BY na, nb
    """,
    tags=("quality", "stats"),
)
def q_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov drift test — the standard
    distribution-shift monitor between corpus slices (here: document
    length of lang='en' vs the rest; in production: this week's crawl vs
    last week's): D = max over observed values of |CDF_a - CDF_b|, with
    the alpha=0.05 rejection rule D > 1.358 * sqrt((n_a+n_b)/(n_a*n_b)).
    CDFs are exact integer-count ratios, so D is a ratio of exact
    integers evaluated identically in both engines; the verdict
    thresholds the UNROUNDED D against an engine-identical closed form.

    Scale shape: ONE fact-scale groupBy(value) with conditional partial
    counts collapses the corpus to DISTINCT-VALUE grain; the CDF window
    and the max run on that summary table (hundreds of rows — at
    continuous-valued 100 TB scale the values pre-bucket to quantile
    bins via q_percentile's sketch and the same shape holds). The corpus
    is scanned once."""
    t = load(spark, sf_dir)
    counts = (
        t.documents.select(
            F.col("n_chars").alias("v"), (F.col("lang") == "en").alias("is_a")
        )
        .groupBy("v")
        .agg(
            F.sum(F.col("is_a").cast("bigint")).alias("ca"),
            F.sum((~F.col("is_a")).cast("bigint")).alias("cb"),
        )
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    cdf = counts.select(
        F.sum("ca").over(w).alias("cum_a"), F.sum("cb").over(w).alias("cum_b")
    )
    tot = counts.agg(
        F.sum("ca").alias("na"), F.sum("cb").alias("nb")
    )
    d = F.max(
        F.abs(
            F.col("cum_a") * 1.0 / F.col("na")
            - F.col("cum_b") * 1.0 / F.col("nb")
        )
    )
    return (
        cdf.crossJoin(F.broadcast(tot))
        .groupBy("na", "nb")
        .agg(
            F.round(d, 6).alias("ks_d"),
            (
                d
                > 1.358
                * F.sqrt(
                    (F.col("na") + F.col("nb"))
                    * 1.0
                    / (F.col("na") * F.col("nb"))
                )
            ).alias("drifted"),
        )
        .select(
            F.col("na").cast("bigint").alias("n_a"),
            F.col("nb").cast("bigint").alias("n_b"),
            "ks_d",
            "drifted",
        )
    )


@query(
    "q_psi",
    oracle="""
    WITH ref AS (SELECT n_chars FROM documents WHERE lang = 'en'),
    bounds AS (
      SELECT quantile_cont(n_chars, 0.1) AS b1,
             quantile_cont(n_chars, 0.2) AS b2,
             quantile_cont(n_chars, 0.3) AS b3,
             quantile_cont(n_chars, 0.4) AS b4,
             quantile_cont(n_chars, 0.5) AS b5,
             quantile_cont(n_chars, 0.6) AS b6,
             quantile_cont(n_chars, 0.7) AS b7,
             quantile_cont(n_chars, 0.8) AS b8,
             quantile_cont(n_chars, 0.9) AS b9
      FROM ref
    ),
    assigned AS (
      SELECT (CASE WHEN n_chars > b1 THEN 1 ELSE 0 END
            + CASE WHEN n_chars > b2 THEN 1 ELSE 0 END
            + CASE WHEN n_chars > b3 THEN 1 ELSE 0 END
            + CASE WHEN n_chars > b4 THEN 1 ELSE 0 END
            + CASE WHEN n_chars > b5 THEN 1 ELSE 0 END
            + CASE WHEN n_chars > b6 THEN 1 ELSE 0 END
            + CASE WHEN n_chars > b7 THEN 1 ELSE 0 END
            + CASE WHEN n_chars > b8 THEN 1 ELSE 0 END
            + CASE WHEN n_chars > b9 THEN 1 ELSE 0 END) AS bin,
             (lang = 'en') AS is_ref
      FROM documents CROSS JOIN bounds
    ),
    bc AS (
      SELECT bin,
             count(*) FILTER (WHERE is_ref) AS cr,
             count(*) FILTER (WHERE NOT is_ref) AS cc
      FROM assigned GROUP BY 1
    ),
    tot AS (SELECT sum(cr) AS nr, sum(cc) AS nc FROM bc)
    SELECT CAST(nr AS BIGINT) AS n_ref,
           CAST(nc AS BIGINT) AS n_cmp,
           round(sum(((cr + 1.0) / (nr + 10) - (cc + 1.0) / (nc + 10))
                     * ln(((cr + 1.0) / (nr + 10))
                          / ((cc + 1.0) / (nc + 10)))), 6) AS psi,
           (sum(((cr + 1.0) / (nr + 10) - (cc + 1.0) / (nc + 10))
                * ln(((cr + 1.0) / (nr + 10))
                     / ((cc + 1.0) / (nc + 10)))) > 0.2) AS drifted
    FROM bc CROSS JOIN tot
    GROUP BY nr, nc
    """,
    tags=("quality", "stats"),
)
def q_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index — the ML-monitoring drift metric scored
    between a REFERENCE slice (lang='en' document lengths — in
    production: the training-time feature distribution) and the
    comparison population: both assign to the reference's decile bins
    and PSI = sum (p_i - q_i) ln(p_i / q_i) with add-1 bin smoothing;
    the conventional 0.2 threshold flags a shift that warrants
    retraining. Complements q_ks_drift (KS is the sharpest single-point
    gap; PSI weighs the whole histogram).

    Determinism: decile boundaries use the linear-interpolated
    percentile both engines define identically (q_perplexity_buckets
    contract); bin assignment is 9 engine-identical comparisons; bin
    proportions are exact-integer ratios and the 10-term PSI sum rounds
    to 6dp. Scale shape: one pass computes the reference deciles
    (summary-grain percentile), a second assigns bins map-side via the
    broadcast 9-value boundary row and collapses to 10 bin counts —
    nothing beyond two scans and a 10-row fold."""
    t = load(spark, sf_dir)
    ref = t.documents.filter(F.col("lang") == "en")
    bounds = ref.agg(
        *[
            F.percentile("n_chars", F.lit(k / 10.0)).alias(f"b{k}")
            for k in range(1, 10)
        ]
    )
    bin_expr = sum(
        [
            F.when(F.col("n_chars") > F.col(f"b{k}"), 1).otherwise(0)
            for k in range(1, 10)
        ],
        F.lit(0),
    )
    assigned = t.documents.crossJoin(F.broadcast(bounds)).select(
        bin_expr.alias("bin"), (F.col("lang") == "en").alias("is_ref")
    )
    bc = assigned.groupBy("bin").agg(
        F.sum(F.col("is_ref").cast("bigint")).alias("cr"),
        F.sum((~F.col("is_ref")).cast("bigint")).alias("cc"),
    )
    tot = bc.agg(F.sum("cr").alias("nr"), F.sum("cc").alias("nc"))
    p = (F.col("cr") + 1.0) / (F.col("nr") + 10)
    q = (F.col("cc") + 1.0) / (F.col("nc") + 10)
    psi = F.sum((p - q) * F.log(p / q))
    return (
        bc.crossJoin(F.broadcast(tot))
        .groupBy("nr", "nc")
        .agg(
            F.round(psi, 6).alias("psi"),
            (psi > 0.2).alias("drifted"),
        )
        .select(
            F.col("nr").cast("bigint").alias("n_ref"),
            F.col("nc").cast("bigint").alias("n_cmp"),
            "psi",
            "drifted",
        )
    )
