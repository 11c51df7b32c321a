"""Join surface (SURVEY §2.F) — absent from the reference (single stream, no
relations; /root/reference/dataCollector.py has no join code), required by
its claimed query surface (README.md:31) and the driver star schema.

Physical strategy notes (the part that matters at 100 TB):
- Dimension joins (region/nation/supplier) are explicitly ``broadcast()`` —
  no shuffle of the fact side, ever.
- Fact-fact joins (orders⋈lineitem) shuffle on the join key once; AQE
  handles skew splitting at runtime.
- The as-of join is the union+window composition: sort-based, one shuffle on
  (key), no crossJoin, no per-row Python — scales linearly with input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load
from ..functions.exact import dsum
from ..registry import query

# --- equi joins -------------------------------------------------------------


@query(
    "q_join_inner",
    oracle="""
    SELECT o.o_orderkey, o.o_totalprice, c.c_name, c.c_mktsegment
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE o.o_totalprice > 100000
    """,
    tags=("join",),
)
def q_join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load(spark, sf_dir)
    return (
        t.orders.filter(F.col("o_totalprice") > 100000)
        .join(t.customer, F.col("o_custkey") == F.col("c_custkey"), "inner")
        .select("o_orderkey", "o_totalprice", "c_name", "c_mktsegment")
    )


@query(
    "q_join_outer",
    oracle="""
    SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice
    FROM customer c LEFT JOIN orders o
      ON c.c_custkey = o.o_custkey AND o.o_orderstatus = 'F'
    """,
    tags=("join",),
)
def q_join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer with a join-side predicate (kept in the ON clause — moving
    it to WHERE would change semantics)."""
    t = load(spark, sf_dir)
    o = t.orders
    return t.customer.join(
        o,
        (F.col("c_custkey") == F.col("o_custkey"))
        & (F.col("o_orderstatus") == "F"),
        "left",
    ).select("c_custkey", "c_name", "o_orderkey", "o_totalprice")


@query(
    "q_join_broadcast",
    oracle="""
    SELECT n.n_name, r.r_name, count(*) AS n_customers,
           CAST(sum(CAST(c.c_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS total_bal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY n.n_name, r.r_name
    """,
    tags=("join",),
)
def q_join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star-schema dim joins with explicit broadcast: the fact table never
    shuffles for the join — the only shuffle is the final groupBy."""
    t = load(spark, sf_dir)
    return (
        t.customer.join(
            F.broadcast(t.nation), F.col("c_nationkey") == F.col("n_nationkey")
        )
        .join(F.broadcast(t.region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name", "r_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            dsum("c_acctbal").alias("total_bal"),
        )
    )


@query(
    "q_join_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 200000)
    """,
    tags=("join",),
)
def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI ≡ EXISTS subquery — emits each left row at most once."""
    t = load(spark, sf_dir)
    big = t.orders.filter(F.col("o_totalprice") > 200000)
    return t.customer.join(
        big, F.col("c_custkey") == F.col("o_custkey"), "left_semi"
    ).select("c_custkey", "c_name")


@query(
    "q_join_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    tags=("join",),
)
def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI ≡ NOT EXISTS — customers with no orders."""
    t = load(spark, sf_dir)
    return t.customer.join(
        t.orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti"
    ).select("c_custkey", "c_name")


@query(
    "q_join_cross",
    oracle="""
    SELECT n.n_name, r.r_name FROM nation n CROSS JOIN region r
    """,
    tags=("join",),
)
def q_join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cartesian product — declared only for small inputs (25×5); at scale
    cross joins are gated behind LSH/bucketing (see llm/similarity.py)."""
    t = load(spark, sf_dir)
    return t.nation.crossJoin(t.region).select("n_name", "r_name")


# --- non-equi joins ---------------------------------------------------------


@query(
    "q_join_range",
    oracle="""
    SELECT o.o_orderkey, l.l_linenumber, l.l_shipdate, o.o_orderdate
    FROM orders o JOIN lineitem l
      ON o.o_orderkey = l.l_orderkey
     AND l.l_shipdate BETWEEN o.o_orderdate AND o.o_orderdate + INTERVAL 60 DAY
    """,
    tags=("join",),
)
def q_join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta join: equi key + range predicate. The equi component keeps it a
    hash/sort-merge join (range rides the join condition) — never a
    nested-loop. The orders side carries a SHUFFLE_HASH hint (the Q3
    pattern, operators/tpch.py): the hint buys a shuffled hash join
    instead of sort-merge — same exchanges, no fact-side sorts,
    hash-build per partition (no driver collect, no OOM path).

    r13 optimization-round adjudication: a user join hint FORCES the
    strategy — the executed AQE final plan keeps ShuffledHashJoin even
    for a 2.6 MB build side the broadcast threshold would otherwise
    take (verified against the runtime plan; an earlier revision of this
    docstring wrongly claimed AQE still upgrades small inputs). The
    hint-free broadcast plan was A/B-measured at sf0.1/local[32]
    (same-window min-of-3: 0.58 s vs 0.52 s hinted) — the broadcast
    build costs what the small shuffle costs, so the hint stays for its
    past-threshold guarantee."""
    t = load(spark, sf_dir)
    o, l = t.orders.hint("shuffle_hash"), t.lineitem
    return l.join(
        o,
        (F.col("o_orderkey") == F.col("l_orderkey"))
        & (F.col("l_shipdate") >= F.col("o_orderdate"))
        & (F.col("l_shipdate") <= F.col("o_orderdate") + F.expr("INTERVAL 60 DAY")),
    ).select("o_orderkey", "l_linenumber", "l_shipdate", "o_orderdate")


@query(
    "q_join_interval",
    oracle="""
    WITH sessions AS (
      SELECT user_id,
             date_trunc('day', ts)                 AS day_start,
             date_trunc('day', ts) + INTERVAL 1 DAY AS day_end
      FROM events GROUP BY 1, 2
    )
    SELECT s.user_id, s.day_start, count(*) AS n_overlapping
    FROM sessions s JOIN events e
      ON s.user_id = e.user_id
     AND e.ts >= s.day_start AND e.ts < s.day_end
    GROUP BY s.user_id, s.day_start
    """,
    tags=("join",),
)
def q_join_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap join (point-in-interval): equi key + interval
    predicates, counted per interval."""
    t = load(spark, sf_dir)
    e = t.events
    sessions = e.groupBy(
        F.col("user_id"), F.date_trunc("day", "ts").alias("day_start")
    ).agg(F.lit(1).alias("_one")).select(
        "user_id",
        "day_start",
        (F.col("day_start") + F.expr("INTERVAL 1 DAY")).alias("day_end"),
    )
    e2 = e.select(
        F.col("user_id").alias("e_user_id"), F.col("ts").alias("e_ts")
    )
    return (
        sessions.join(
            e2,
            (F.col("user_id") == F.col("e_user_id"))
            & (F.col("e_ts") >= F.col("day_start"))
            & (F.col("e_ts") < F.col("day_end")),
        )
        .groupBy("user_id", "day_start")
        .agg(F.count(F.lit(1)).alias("n_overlapping"))
    )


# --- as-of join -------------------------------------------------------------


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_vals: list[str],
) -> DataFrame:
    """Nearest-prior as-of join — the canonical time-series join over the
    reference's tick data model (SURVEY §2.F).

    Spark has no native ASOF JOIN; this is the union-tag + last(ignorenulls)
    window composition: tag both sides, union, sort within key by time, and
    carry the most recent right-side values forward onto left rows. One
    shuffle on ``key``, sort-based, linear — no range explosion, no
    per-group pandas. Scales to arbitrarily many rows per key (state is one
    row of carried values), unlike merge_asof-per-group approaches that
    materialize whole groups in memory.
    """
    lt = left.withColumn("_side", F.lit(1)).withColumn("_ats", F.col(left_ts))
    rt = right.withColumn("_side", F.lit(0)).withColumn("_ats", F.col(right_ts))
    all_cols = set(left.columns) | set(right.columns) | {"_side", "_ats"}
    lt = lt.select(
        *[
            F.col(c) if c in lt.columns else F.lit(None).alias(c)
            for c in sorted(all_cols)
        ]
    )
    rt = rt.select(
        *[
            F.col(c) if c in rt.columns else F.lit(None).alias(c)
            for c in sorted(all_cols)
        ]
    )
    unioned = lt.unionByName(rt)
    # Right rows sort before left rows at identical timestamps (_side asc),
    # so an exact-timestamp match is visible to the left row (<= semantics).
    w = (
        Window.partitionBy(key)
        .orderBy(F.col("_ats"), F.col("_side"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.select(
        "*",
        *[
            F.last(F.when(F.col("_side") == 0, F.col(v)), ignorenulls=True)
            .over(w)
            .alias(f"_asof_{v}")
            for v in right_vals
        ],
    )
    out = carried.filter(F.col("_side") == 1).select(
        *left.columns, *[F.col(f"_asof_{v}").alias(f"asof_{v}") for v in right_vals]
    )
    return out


@query(
    "q_join_asof",
    oracle="""
    SELECT o.o_orderkey, o.o_custkey, o.o_orderdate,
           e.value AS asof_value, e.ts AS asof_ts
    FROM (SELECT o_orderkey, o_custkey, o_orderdate,
                 o_custkey % 20 AS uid FROM orders) o
    ASOF LEFT JOIN (SELECT user_id % 20 AS uid, ts, value FROM events) e
      ON o.uid = e.uid AND o.o_orderdate + INTERVAL 29 YEAR >= e.ts
    """,
    tags=("join", "asof"),
)
def q_join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of: each order (time-shifted into the events epoch) picks the
    latest event at-or-before its timestamp per bucketed user key. DuckDB
    checks it with its native ASOF JOIN."""
    t = load(spark, sf_dir)
    left = t.orders.select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        (F.col("o_custkey") % 20).alias("uid"),
        (F.col("o_orderdate") + F.expr("INTERVAL 29 YEAR")).alias("query_ts"),
    )
    right = t.events.select(
        (F.col("user_id") % 20).alias("uid"),
        F.col("ts"),
        F.col("value"),
    )
    out = asof_join(
        left, right, key="uid", left_ts="query_ts", right_ts="ts",
        right_vals=["value", "ts"],
    )
    return out.select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        F.col("asof_value"),
        F.col("asof_ts"),
    )


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_vals: list[str],
) -> DataFrame:
    """Forward as-of: each left row picks the EARLIEST right row at-or-after
    its timestamp per key (the "next quote after the order" direction).
    Mirror of asof_join: same union-tag composition scanned in descending
    time order, so the carried value is the nearest following right row.
    Identical scale shape — one shuffle on key, sort-based, linear."""
    lt = left.withColumn("_side", F.lit(1)).withColumn("_ats", F.col(left_ts))
    rt = right.withColumn("_side", F.lit(0)).withColumn("_ats", F.col(right_ts))
    all_cols = set(left.columns) | set(right.columns) | {"_side", "_ats"}
    lt = lt.select(
        *[F.col(c) if c in lt.columns else F.lit(None).alias(c) for c in sorted(all_cols)]
    )
    rt = rt.select(
        *[F.col(c) if c in rt.columns else F.lit(None).alias(c) for c in sorted(all_cols)]
    )
    unioned = lt.unionByName(rt)
    # Descending time scan; right rows (side 0) sort before left rows at the
    # same timestamp so an exact match is visible (>= semantics).
    w = (
        Window.partitionBy(key)
        .orderBy(F.col("_ats").desc(), F.col("_side"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.select(
        "*",
        *[
            F.last(F.when(F.col("_side") == 0, F.col(v)), ignorenulls=True)
            .over(w)
            .alias(f"_asof_{v}")
            for v in right_vals
        ],
    )
    return carried.filter(F.col("_side") == 1).select(
        *left.columns, *[F.col(f"_asof_{v}").alias(f"asof_{v}") for v in right_vals]
    )


@query(
    "q_join_asof_forward",
    oracle="""
    WITH o AS (SELECT o_orderkey, o_custkey % 20 AS uid,
                      o_orderdate + INTERVAL 29 YEAR AS query_ts FROM orders),
    e AS (SELECT user_id % 20 AS uid, ts, value FROM events),
    u AS (
      SELECT uid, query_ts AS ats, 1 AS side, o_orderkey,
             CAST(NULL AS DOUBLE) AS val, CAST(NULL AS TIMESTAMP) AS ets FROM o
      UNION ALL
      SELECT uid, ts, 0, NULL, value, ts FROM e
    ),
    carried AS (
      SELECT uid, ats, side, o_orderkey,
             last_value(val IGNORE NULLS) OVER w AS asof_value,
             last_value(ets IGNORE NULLS) OVER w AS asof_ts
      FROM u
      WINDOW w AS (PARTITION BY uid ORDER BY ats DESC, side
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT o_orderkey, uid, asof_value, asof_ts
    FROM carried WHERE side = 1
    """,
    tags=("join", "asof"),
)
def q_join_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of: first event at-or-after each (time-shifted) order per
    bucketed user key. Oracle uses the identical union-tag window program in
    SQL (DuckDB has no native forward ASOF) — engine-agnostic semantics."""
    t = load(spark, sf_dir)
    left = t.orders.select(
        "o_orderkey",
        (F.col("o_custkey") % 20).alias("uid"),
        (F.col("o_orderdate") + F.expr("INTERVAL 29 YEAR")).alias("query_ts"),
    )
    right = t.events.select(
        (F.col("user_id") % 20).alias("uid"), F.col("ts"), F.col("value")
    )
    out = asof_join_forward(
        left, right, key="uid", left_ts="query_ts", right_ts="ts",
        right_vals=["value", "ts"],
    )
    return out.select(
        "o_orderkey", "uid", F.col("asof_value"), F.col("asof_ts").cast("timestamp_ntz").alias("asof_ts")
    )


@query(
    "q_join_null_safe",
    oracle="""
    WITH keyed AS (
      SELECT event_id,
             CASE WHEN value >= 50 THEN event_type END AS k
      FROM events
    ),
    dim(k, label) AS (
      VALUES ('click', 'CLICK'), ('purchase', 'BUY'), (NULL, 'UNKEYED')
    )
    SELECT label, count(*) AS n
    FROM keyed JOIN dim ON keyed.k IS NOT DISTINCT FROM dim.k
    GROUP BY label
    """,
    tags=("join", "null"),
)
def q_join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi-join (`<=>` ≡ IS NOT DISTINCT FROM): NULL keys match
    the dimension's NULL row instead of silently dropping — the semantics
    that separate 'unkeyed bucket' from 'lost rows'. Still a hash join
    (null-safe equality is a valid hash key), so the plan is identical to
    the plain equi-join, never a nested loop."""
    t = load(spark, sf_dir)
    keyed = t.events.select(
        "event_id",
        F.when(F.col("value") >= 50, F.col("event_type")).alias("k"),
    )
    dim = spark.createDataFrame(
        [("click", "CLICK"), ("purchase", "BUY"), (None, "UNKEYED")],
        "k string, label string",
    )
    return (
        keyed.join(F.broadcast(dim), keyed.k.eqNullSafe(dim.k))
        .groupBy("label")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "q_join_asof_nearest",
    oracle="""
    WITH o AS (SELECT o_orderkey, o_custkey % 20 AS uid,
                      o_orderdate + INTERVAL 29 YEAR AS qts FROM orders),
         e AS (SELECT user_id % 20 AS uid, ts, value FROM events),
    b AS (SELECT o.o_orderkey, o.qts, e.ts AS bts, e.value AS bval
          FROM o ASOF LEFT JOIN e ON o.uid = e.uid AND o.qts >= e.ts),
    f AS (SELECT o.o_orderkey, e.ts AS fts, e.value AS fval
          FROM o ASOF LEFT JOIN e ON o.uid = e.uid AND o.qts <= e.ts)
    SELECT b.o_orderkey,
           CASE WHEN fts IS NULL THEN bval
                WHEN bts IS NULL THEN fval
                WHEN (qts - bts) <= (fts - qts) THEN bval ELSE fval
           END AS nearest_value,
           CASE WHEN fts IS NULL THEN bts
                WHEN bts IS NULL THEN fts
                WHEN (qts - bts) <= (fts - qts) THEN bts ELSE fts
           END AS nearest_ts
    FROM b JOIN f USING (o_orderkey)
    """,
    tags=("join", "asof"),
)
def q_join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest as-of (either direction, ties to the prior tick): the two
    directional passes — each one union-tag + single window shuffle —
    composed by an equi-join on the left key, then a pure-projection
    arbiter on |Δt|. Completes the as-of family (backward q_join_asof,
    forward q_join_asof_forward); DuckDB oracles it with two native ASOF
    JOINs in opposite directions."""
    t = load(spark, sf_dir)
    left = t.orders.select(
        "o_orderkey",
        (F.col("o_custkey") % 20).alias("uid"),
        (F.col("o_orderdate") + F.expr("INTERVAL 29 YEAR")).alias("query_ts"),
    )
    right = t.events.select(
        (F.col("user_id") % 20).alias("uid"), F.col("ts"), F.col("value")
    )
    back = asof_join(
        left, right, key="uid", left_ts="query_ts", right_ts="ts",
        right_vals=["value", "ts"],
    ).select(
        "o_orderkey",
        F.col("query_ts").alias("qts"),
        F.col("asof_value").alias("bval"),
        F.col("asof_ts").alias("bts"),
    )
    fwd = asof_join_forward(
        left, right, key="uid", left_ts="query_ts", right_ts="ts",
        right_vals=["value", "ts"],
    ).select(
        "o_orderkey",
        F.col("asof_value").alias("fval"),
        F.col("asof_ts").alias("fts"),
    )
    j = back.join(fwd, "o_orderkey")
    # NTZ − NTZ is a DayTimeInterval and intervals compare directly —
    # the same arithmetic the DuckDB oracle spells.
    back_wins = (
        F.col("fts").isNull()
        | (
            F.col("bts").isNotNull()
            & (
                (F.col("qts") - F.col("bts"))
                <= (F.col("fts") - F.col("qts"))
            )
        )
    )
    return j.select(
        "o_orderkey",
        F.when(back_wins, F.col("bval")).otherwise(F.col("fval")).alias(
            "nearest_value"
        ),
        F.when(back_wins, F.col("bts")).otherwise(F.col("fts")).alias(
            "nearest_ts"
        ),
    )
