"""Executed-plan SQL-metric readers (py4j walk of the physical plan after
an action has run). Unlike plans/explain.py — which inspects the STATIC
plan string — these read the runtime metric values (rows shipped through
each Exchange, operator output rows), which is what skew/bound proofs
need: the claim "WindowGroupLimit ships <= maps x cap rows per domain"
is about measured records, not plan shape.

Used by tests/test_skew_stress.py and scripts/skew_stress.py.
"""
from __future__ import annotations

from pyspark.sql import DataFrame


def executed_plan_metrics(df: DataFrame) -> list[tuple[int, str, dict]]:
    """Walk the EXECUTED physical plan (run an action on ``df`` first) and
    return ``(depth, nodeName, {metric: value})`` per node, top-down.
    Descends through AQE wrappers (ResultQueryStage / ShuffleQueryStage /
    InputAdapter expose their subtree via ``children``; QueryStageExec
    leaves expose it via ``plan``/``shuffle``)."""
    acc: list[tuple[int, str, dict]] = []

    def walk(node, depth: int) -> None:
        metrics = {}
        it = node.metrics().iterator()
        while it.hasNext():
            kv = it.next()
            metrics[kv._1()] = kv._2().value()
        acc.append((depth, node.nodeName(), metrics))
        ch = node.children()
        for i in range(ch.size()):
            walk(ch.apply(i), depth + 1)
        if ch.size() == 0:
            for attr in ("executedPlan", "finalPhysicalPlan", "plan", "shuffle"):
                try:
                    sub = getattr(node, attr)()
                except Exception:
                    continue
                if sub is not None and hasattr(sub, "nodeName"):
                    walk(sub, depth + 1)
                    break

    walk(df._jdf.queryExecution().executedPlan(), 0)
    return acc


def exchange_records_written(df: DataFrame) -> list[int]:
    """``shuffleRecordsWritten`` of every Exchange in the executed plan,
    in top-down (output-to-scan) order — element 0 is the LAST shuffle
    before the result, the tail is the scan-side shuffle."""
    return [
        int(m["shuffleRecordsWritten"])
        for _, name, m in executed_plan_metrics(df)
        if name == "Exchange" and "shuffleRecordsWritten" in m
    ]


def rows_per_output_partition(df: DataFrame) -> list[int]:
    """Row count of each output partition of ``df``'s current physical
    layout (join outputs: one element per reduce task) — the direct
    skew observation a salted plan is supposed to flatten. Uses
    ``spark_partition_id()`` evaluated BEFORE the counting exchange."""
    from pyspark.sql import functions as F

    rows = (
        df.withColumn("_pid", F.spark_partition_id())
        .groupBy("_pid")
        .count()
        .collect()
    )
    return sorted((int(r["count"]) for r in rows), reverse=True)
