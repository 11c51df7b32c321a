"""Scan-parallelism guard for compute-heavy map stages.

A projection whose per-row cost dominates (MinHash signatures, hyperplane
folds, per-pair levenshtein riding a join) executes with its INPUT's
parallelism. On production data that is the scan's split count — hundreds
of tasks per 100 GB — and repartitioning first would add a pointless
full-input shuffle. On a small single-row-group file (this repo's
testdata: every table is ONE row group, so every scan is ONE task) the
same plan serializes entirely.

``ensure_parallelism`` resolves the tension adaptively instead of picking
one scale's answer: repartition round-robin ONLY when the input's planned
partition count is below the session's parallelism. The check is
plan-time (no job runs); when the input is already well-split — the
100 TB case — the DataFrame passes through untouched, so the shuffle
exists precisely when it is cheap (input small enough to plan as few
tasks) and needed (cores would otherwise idle).

Round-robin rather than key-based: the goal is balanced COMPUTE, and the
downstream op (broadcast join probe, map-side signature) does not require
any co-location.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, min_factor: float = 1.0) -> DataFrame:
    """Round-robin repartition ``df`` to the session default parallelism
    iff its planned partition count is below ``min_factor`` times that
    parallelism; otherwise return ``df`` unchanged."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target * min_factor:
        return df.repartition(target)
    return df
