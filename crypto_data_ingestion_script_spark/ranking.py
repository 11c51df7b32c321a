"""Scale-safe global ranking: dense row numbers over a total order WITHOUT
a single-partition window.

``Window.orderBy(...)`` with no partitionBy funnels the entire input
through one task — correct, but the canonical 100 TB plan-killer. The
two-pass shape here keeps every input-sized step parallel:

1. ``repartitionByRange`` on the order columns (parallel range shuffle);
2. per-range ``row_number`` (each range sorts independently);
3. per-range counts → prefix offsets (one window over N range summaries —
   driver-scale, not input-scale) broadcast-joined back.

The result is boundary-invariant: offset + local rank equals the global
rank wherever the sampled range bounds fall, so outputs stay deterministic
and oracle-checkable while no task ever sees more than one range.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def global_row_number(
    df: DataFrame, *order_cols: str, out_col: str = "rn", n_ranges: int = 32
) -> DataFrame:
    """Append ``out_col`` = 1-based global row_number of ``df`` in
    ``order_cols`` order (must be a total order for a deterministic
    result), computed with the two-pass range plan above.

    The range layout is frozen with ``localCheckpoint`` before branching:
    ``spark_partition_id()`` is nondeterministic, and the local-rank and
    range-count branches of the plan would otherwise re-evaluate the range
    exchange independently — two evaluations are not guaranteed the same
    partition layout, which silently mismatches offsets against local
    ranks. One bounded materialization (the projected input, once) buys
    branch consistency; the OUTPUT is still boundary-invariant, so ranks
    are reproducible across sessions and cluster topologies regardless of
    where the sampled range bounds fall."""
    ranged = (
        df.repartitionByRange(n_ranges, *order_cols)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint()
    )
    w_local = Window.partitionBy("_pid").orderBy(*order_cols)
    local = ranged.withColumn("_lrn", F.row_number().over(w_local))
    counts = ranged.groupBy("_pid").agg(F.count(F.lit(1)).alias("_n"))
    w_off = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "_pid", F.coalesce(F.sum("_n").over(w_off), F.lit(0)).alias("_off")
    )
    return (
        local.join(F.broadcast(offsets), "_pid")
        .withColumn(out_col, F.col("_off") + F.col("_lrn"))
        .drop("_pid", "_lrn", "_off")
    )


def global_running_sum(
    df: DataFrame,
    value_col: str,
    *order_cols: str,
    out_col: str = "running_sum",
    n_ranges: int = 32,
) -> DataFrame:
    """Append ``out_col`` = inclusive running sum of ``value_col`` over the
    global ``order_cols`` order — same two-pass shape as
    ``global_row_number``: per-range running sums in parallel, plus a
    broadcast prefix of per-range totals. Boundary-invariant like the rank:
    prefix-total + local running sum equals the global running sum wherever
    the range bounds fall."""
    ranged = (
        df.repartitionByRange(n_ranges, *order_cols)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint()
    )
    w_local = (
        Window.partitionBy("_pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = ranged.withColumn("_lsum", F.sum(value_col).over(w_local))
    totals = ranged.groupBy("_pid").agg(F.sum(value_col).alias("_t"))
    w_off = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "_pid", F.coalesce(F.sum("_t").over(w_off), F.lit(0)).alias("_off")
    )
    return (
        local.join(F.broadcast(offsets), "_pid")
        .withColumn(out_col, F.col("_off") + F.col("_lsum"))
        .drop("_pid", "_lsum", "_off")
    )


def global_running(
    df: DataFrame,
    order_col: str,
    *,
    part_cols: tuple = (),
    sums: tuple = (),
    leads: tuple = (),
    descending: bool = False,
    n_ranges: int = 32,
) -> DataFrame:
    """General two-pass range plan for the distinct-value-grain window
    family (q_mann_whitney/q_ks_drift/q_auc/q_wasserstein/
    q_kruskal_wallis/q_avg_precision/q_spearman — VERDICT r12 task 1):
    appends, for each ``c`` in ``sums``, an inclusive running sum
    ``run_<c>`` over the global ``order_col`` order, and for each ``c``
    in ``leads``, the next row's value ``lead_<c>`` — all from ONE range
    shuffle, one summary-grain pass, and one broadcast join, with no
    task ever holding more than one range. ``part_cols`` scopes
    everything to groups (ranges partition on (part, order) so a group's
    rows land in contiguous ranges; offsets accumulate per group across
    its ranges).

    The bare ``Window.orderBy(order_col)`` this replaces funnels every
    row through ONE task; fine while the distinct-value grain stays
    content-bounded, but SCALE_r12 measured that grain growing ~2.7× per
    data decade on continuous columns — at 100 TB the single window task
    holds 10⁶–10⁸ rows. Here the only bare window runs over N_ranges ×
    |groups| range summaries (fixed grain), the q_suffix_lcp /
    q_skyline_sweep precedent.

    Boundary-invariant like :func:`global_row_number`: group prefix
    total + local running sum (and within-range lead, patched at range
    boundaries with the next range's first value) equal the global
    answers wherever the sampled range bounds fall, so outputs are
    deterministic and oracle-checkable."""
    oc = F.col(order_col).desc() if descending else F.col(order_col)
    ranged = (
        df.repartitionByRange(
            n_ranges, *[F.col(c) for c in part_cols], oc
        )
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint()
    )
    w_sum = (
        Window.partitionBy("_pid", *part_cols)
        .orderBy(oc)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_row = Window.partitionBy("_pid", *part_cols).orderBy(oc)
    local = ranged
    for c in sums:
        local = local.withColumn(f"_l_{c}", F.sum(c).over(w_sum))
    for c in leads:
        local = local.withColumn(f"_ll_{c}", F.lead(c).over(w_row))
    first_of = F.max_by if descending else F.min_by
    summ = ranged.groupBy("_pid", *part_cols).agg(
        *[F.sum(c).alias(f"_t_{c}") for c in sums],
        *[first_of(c, order_col).alias(f"_f_{c}") for c in leads],
    )
    # Summary-grain windows: n_ranges × |groups| rows, fixed grain.
    w_off = (
        Window.partitionBy(*part_cols)
        .orderBy("_pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_nxt = Window.partitionBy(*part_cols).orderBy("_pid")
    offsets = summ.select(
        "_pid",
        *part_cols,
        *[
            F.coalesce(F.sum(f"_t_{c}").over(w_off), F.lit(0)).alias(
                f"_o_{c}"
            )
            for c in sums
        ],
        *[F.lead(f"_f_{c}").over(w_nxt).alias(f"_n_{c}") for c in leads],
    )
    out = local.join(F.broadcast(offsets), ["_pid", *part_cols])
    for c in sums:
        out = out.withColumn(f"run_{c}", F.col(f"_o_{c}") + F.col(f"_l_{c}"))
    for c in leads:
        out = out.withColumn(
            f"lead_{c}", F.coalesce(F.col(f"_ll_{c}"), F.col(f"_n_{c}"))
        )
    drop = (
        ["_pid"]
        + [f"_l_{c}" for c in sums]
        + [f"_o_{c}" for c in sums]
        + [f"_ll_{c}" for c in leads]
        + [f"_n_{c}" for c in leads]
    )
    return out.drop(*drop)


def global_ntile(
    df: DataFrame,
    n_buckets: int,
    *order_cols,
    out_col: str = "ntile",
    n_ranges: int = 32,
) -> DataFrame:
    """Append ``out_col`` = NTILE(n_buckets) over the global
    ``order_cols`` order (must be total) without a single-partition
    window: global rank from the two-pass range plan
    (:func:`global_row_number`), then the ntile bucket in closed form.

    Both Spark and DuckDB define NTILE identically over a total order:
    with N rows, q = N div k and r = N mod k, the first r buckets take
    q+1 rows and the rest take q — so bucket(rn) = ⌈rn/(q+1)⌉ while
    rn ≤ r(q+1), else r + ⌈(rn − r(q+1))/q⌉. Closed-form arithmetic on
    (rn, N) reproduces it exactly (q_rfm's quintiles hash-match the
    oracle's ntile), with N broadcast as a one-row scalar."""
    ranked = global_row_number(
        df, *[c for c in order_cols], out_col="_rn", n_ranges=n_ranges
    )
    total = ranked.agg(F.count(F.lit(1)).alias("_N"))
    q = (F.col("_N") - (F.col("_N") % n_buckets)) / n_buckets
    r = F.col("_N") % n_buckets
    big = r * (q + 1)
    rn = F.col("_rn")
    # greatest(q, 1): when N < k the q=0 small-bucket branch is never
    # selected, but keep its divisor finite so ceil never sees Infinity.
    bucket = F.when(
        rn <= big, F.ceil(rn / (q + 1))
    ).otherwise(r + F.ceil((rn - big) / F.greatest(q, F.lit(1.0))))
    return (
        ranked.join(F.broadcast(total))
        .withColumn(out_col, bucket.cast("int"))
        .drop("_rn", "_N")
    )


def global_running_max(
    df: DataFrame,
    value_col: str,
    *order_cols: str,
    out_col: str = "running_max",
    n_ranges: int = 32,
) -> DataFrame:
    """Append ``out_col`` = inclusive running MAX of ``value_col`` over the
    global ``order_cols`` order — the two-pass shape of
    ``global_running_sum`` with the (max, max) semiring: per-range local
    running maxes in parallel, plus a broadcast EXCLUSIVE prefix max of
    per-range maxes. Boundary-invariant: max(prefix_max, local_running)
    equals the global running max wherever the range bounds fall. This is
    the scale-safe form of ``Window.orderBy(...)`` running extrema, which
    otherwise funnels every row through ONE task (measured 5.9 s vs 1.6 s
    at 10M rows in SCALE_r10, and fatal at 100 TB)."""
    ranged = (
        df.repartitionByRange(n_ranges, *order_cols)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint()
    )
    w_local = (
        Window.partitionBy("_pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = ranged.withColumn("_lmax", F.max(value_col).over(w_local))
    totals = ranged.groupBy("_pid").agg(F.max(value_col).alias("_t"))
    w_off = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select("_pid", F.max("_t").over(w_off).alias("_off"))
    return (
        local.join(F.broadcast(offsets), "_pid")
        .withColumn(
            out_col, F.greatest(F.coalesce("_off", F.col("_lmax")), "_lmax")
        )
        .drop("_pid", "_lmax", "_off")
    )
