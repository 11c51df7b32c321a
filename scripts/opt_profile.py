"""Optimization-round profiler: for each headline bench query at a given
scale dir, capture

- ``explain("formatted")`` text  -> plans/r13/{name}_{tag}.txt
- min-of-3 wall time to the bench's count() action (bench parity)
- one noop-sink wall time (guide §1.4: computes every column, no pruning)
- the number of Spark jobs the query triggers (localCheckpoints / probes /
  fixpoint loops each submit extra jobs — a per-query fixed cost the bench
  pays at every scale)
- plan-shape counters: Exchange / Sort / BatchEvalPython / ArrowEvalPython /
  SortMergeJoin / BroadcastHashJoin / ... occurrences in the formatted plan

Usage: python scripts/opt_profile.py [sf_dir] [tag] [only_csv] [plan_subdir]
Writes plans + one JSON line to stdout; stderr carries progress.
``only_csv`` may name any registered query (not just headline ones);
unknown names abort up front with the full list (ADVICE r13).
"""
from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
TAG = sys.argv[2] if len(sys.argv) > 2 else "before"
ONLY = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
PLAN_SUBDIR = sys.argv[4] if len(sys.argv) > 4 else "r14"

from bench import HEADLINE  # noqa: E402
from crypto_data_ingestion_script_spark.registry import load_all  # noqa: E402
from crypto_data_ingestion_script_spark.session import build_session  # noqa: E402

PLAN_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "plans", PLAN_SUBDIR)
os.makedirs(PLAN_DIR, exist_ok=True)

#: Exact operator-name tokens counted with word boundaries, so "Exchange"
#: does not also count every "BroadcastExchange" and "HashAggregate" does
#: not count "ObjectHashAggregate" (ADVICE r13 — the shape metrics feed
#: plan-diff claims and must not be inflated by substring hits).
OPS = ("Exchange", "BroadcastExchange", "Sort", "SortMergeJoin",
       "BroadcastHashJoin", "ShuffledHashJoin", "BroadcastNestedLoopJoin",
       "CartesianProduct", "BatchEvalPython", "ArrowEvalPython",
       "MapInPandas", "MapInArrow", "HashAggregate", "ObjectHashAggregate",
       "SortAggregate", "Window", "AQEShuffleRead", "TableCacheQueryStage")


def main() -> None:
    spark = build_session("opt-profile")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    specs = load_all()

    # Warmups identical in spirit to bench.py.
    spark.range(1_000_000).selectExpr("sum(id) s", "count(*) c").collect()
    spark.read.parquet(os.path.join(SF_DIR, "region.parquet")).count()
    spark.range(64).repartition(32).mapInPandas(
        lambda it: it, schema="id long").count()
    warm_dir = "/root/testdata/sf0.001"
    if ONLY is not None:
        unknown = sorted(ONLY - set(specs))
        if unknown:
            sys.exit(f"opt_profile: unknown query names {unknown}")
    names = (
        [n for n in HEADLINE if n in ONLY] + sorted(ONLY - set(HEADLINE))
        if ONLY is not None
        else list(HEADLINE)
    )
    if os.path.realpath(warm_dir) != os.path.realpath(SF_DIR):
        for name in names:
            specs[name].fn(spark, warm_dir).count()

    out: dict[str, dict] = {}
    for name in names:
        fn = specs[name].fn
        # Plan capture (uses its own invocation; cheap relative to run).
        df = fn(spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        with open(os.path.join(PLAN_DIR, f"{name}_{TAG}.txt"), "w") as f:
            f.write(plan)
        shape = {
            op: len(re.findall(r"\b" + re.escape(op) + r"\b", plan))
            for op in OPS
        }
        shape = {k: v for k, v in shape.items() if v}
        # Job count via job group.
        sc.setJobGroup(f"prof_{name}", name)
        t0 = time.perf_counter()
        n = fn(spark, SF_DIR).count()
        first = time.perf_counter() - t0
        jobs = len(sc.statusTracker().getJobIdsForGroup(f"prof_{name}"))
        sc.setJobGroup("", "")
        # min-of-3 count() parity with bench.py
        best = first
        for _ in range(2):
            t0 = time.perf_counter()
            fn(spark, SF_DIR).count()
            best = min(best, time.perf_counter() - t0)
        # one noop-sink run (all columns computed)
        t0 = time.perf_counter()
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        noop = time.perf_counter() - t0
        out[name] = {
            "count_min3_s": round(best, 4),
            "noop_s": round(noop, 4),
            "jobs": jobs,
            "rows": n,
            "shape": shape,
        }
        print(f"# {name}: count={best:.3f}s noop={noop:.3f}s jobs={jobs} "
              f"shape={shape}", file=sys.stderr)
    print(json.dumps({"sf_dir": SF_DIR, "tag": TAG, "profiles": out}))
    spark.stop()


if __name__ == "__main__":
    main()
