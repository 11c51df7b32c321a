#!/usr/bin/env python
"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "total_wall_sec", "value": N, "unit": "sec",
   "queries": {"q_...": sec, ...}, "sf": "..."}

Per-query timing = full plan execution to a count-style action (results are
consumed, not collected to the driver — we measure engine throughput, not
driver serialization).

When run at the default sf0.1 dir, the same JSON line also carries the
amortized-scale leg (VERDICT r3 item 5: sf1 is part of the official round
artifact, not a side file): `sf1_queries` / `sf1_total_sec` (Spark,
min-of-3, warm) and `sf1_oracle_queries` / `sf1_oracle_total_sec` (DuckDB
on the SAME files, warm + min-of-2; `q_jaccard_join` excluded — its
all-pairs oracle is quadratic and infeasible at sf1, see BENCH_scale.json).
The sf1 dataset is `benchdata/sf1` (10x key-offset replication of sf0.1,
scripts/make_benchdata.py), regenerated on demand if absent. Set
SPARK_GRAFT_SF1=0 to skip the leg.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

#: Headline queries: the flagship, the heavy relational core, the scan-bound
#: scalar pipelines, and the LLM-pipeline ops — the set that moves at scale.
HEADLINE = [
    "q_ohlc_hourly",
    "q_join_inner",
    "q_join_broadcast",
    "q_join_range",
    "q_join_asof",
    "q_rollup",
    "q_count_distinct",
    "q_rank",
    "q_moving_avg",
    "q_topk",
    "q_udf_pandas",
    "q_wordcount",
    "q_dedup_exact",
    "q_cosine_topk",
    "q_tpch_q1",
    "q_tpch_q3",
    "q_tpch_q5",
    # Round-3 additions (VERDICT r2 item 8): the LLM-pipeline ops that
    # dominate at 100 TB, perf-tracked round-over-round from here on.
    # Cross-round comparability: the original 17-query set is the list
    # above this comment — subtotal per-query timings to compare with
    # BENCH_r01/r02.
    "q_dedup_near",
    "q_ann_lsh",
    "q_pipeline_training_data",
    "q_jaccard_join",
]

#: The round-1/2 comparison set: subtotal these 17 to compare with
#: BENCH_r01/r02 (the extension above changed the grand total's meaning).
ORIGINAL17 = HEADLINE[:17]

#: Spark trials per query (min-of-N): one constant drives both the
#: _measure_spark calls and the self-documenting "trials"/"sf1_trials"
#: fields in the emitted JSON, so the recorded noise posture can't drift
#: from the measurement code.
TRIALS = 3

#: Host-drift calibration references (VERDICT r7 item 1). The two kernels
#: below run CONSTANT work (no benchmark data), so their wall time moves
#: only with host state — CPU contention, thermal/frequency state, memory
#: pressure. Reference values were pinned in round 8 on this host,
#: uncontended, min-of-3 warm; a future run's `calib_*_sec / CALIB_*_REF`
#: ratio is the host-drift factor, and `*_norm` fields divide the headline
#: totals by it so cross-round comparisons are machine-adjudicable (the
#: r6→r7 "17% regression" was exactly this drift).
CALIB_SPARK_REF = 0.43
CALIB_DUCK_REF = 0.40
#: Floor-aware normalization (VERDICT r9 item 5): the round-2
#: decomposition (BASELINE.md) measured each headline query as a fixed
#: scheduling floor (Catalyst planning + codegen + stage quanta,
#: ~0.3–0.5 s at sf0.1, NOT proportional to host kernel drift) plus a
#: data term that does scale with host speed. A single divide by the
#: drift factor over-corrects floor-bound queries, so *_norm_floor
#: totals subtract the per-query floor, scale only the data term, and
#: add the floor back: norm = Σ_q [min(t_q, FLOOR) + max(t_q−FLOOR, 0)/drift].
FLOOR_SEC_PER_QUERY = 0.35


def _floor_norm(timings: dict[str, float], drift: float) -> float:
    """Floor-aware drift normalization over per-query walls (see
    FLOOR_SEC_PER_QUERY)."""
    if not drift:
        return None
    return round(
        sum(
            min(t, FLOOR_SEC_PER_QUERY)
            + max(t - FLOOR_SEC_PER_QUERY, 0.0) / drift
            for t in timings.values()
        ),
        4,
    )
#: Rows and modulus of the calibration kernels — identical constants on
#: both engines so the two kernels do comparable work (one shuffle
#: aggregation over 30M generated longs into 4096 groups).
CALIB_ROWS = 30_000_000
CALIB_GROUPS = 4096


def _calibrate_spark(spark, trials: int = TRIALS) -> float:
    """Fixed Spark shuffle-aggregation kernel on generated data: range →
    mod-key → groupBy/sum/count. Warm once, min-of-`trials`."""
    from pyspark.sql import functions as F

    def kernel() -> int:
        return (
            spark.range(CALIB_ROWS)
            .withColumn("k", F.col("id") % CALIB_GROUPS)
            .groupBy("k")
            .agg(F.sum("id").alias("s"), F.count(F.lit(1)).alias("n"))
            .count()
        )

    kernel()
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        kernel()
        best = min(best, time.perf_counter() - t0)
    return round(best, 4)


def _calibrate_duckdb(trials: int = TRIALS) -> float:
    """The DuckDB twin of _calibrate_spark: same generated rows, same
    group count, same warm + min-of-`trials` posture."""
    import duckdb

    con = duckdb.connect()
    con.execute(f"SET threads={os.cpu_count() or 32}")
    sql = (
        f"SELECT k, sum(id) FROM (SELECT range AS id, range % {CALIB_GROUPS} "
        f"AS k FROM range({CALIB_ROWS})) GROUP BY k"
    )
    con.execute(sql).fetchall()
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        con.execute(sql).fetchall()
        best = min(best, time.perf_counter() - t0)
    con.close()
    return round(best, 4)


def _measure_spark(spark, specs, sf_dir: str, trials: int) -> dict[str, float]:
    """Min-of-`trials` wall time per headline query at `sf_dir` (warm JVM;
    callers handle plan warmup). Full plan execution to a count action."""
    timings: dict[str, float] = {}
    for name in HEADLINE:
        spec = specs.get(name)
        if spec is None:
            continue
        best, n = float("inf"), 0
        for _ in range(trials):
            t0 = time.perf_counter()
            df = spec.fn(spark, sf_dir)
            n = df.count()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 4)
        print(f"# [{os.path.basename(sf_dir)}] {name}: {best:.3f}s rows={n}", file=sys.stderr)
    return timings


def _measure_duckdb(osql: dict[str, str], sf_dir: str, trials: int,
                    skip: tuple[str, ...] = ()) -> dict[str, float]:
    """DuckDB on the same files: warm once, then min-of-`trials` — the
    methodology BASELINE.md records for the oracle side. Handles the
    multi-file directory layout of benchdata/sf1."""
    import duckdb

    con = duckdb.connect()
    con.execute(f"SET threads={os.cpu_count() or 32}")
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        path = os.path.join(sf_dir, f"{t}.parquet")
        src = f"read_parquet('{path}/*.parquet')" if os.path.isdir(path) else f"'{path}'"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM {src}")
    timings: dict[str, float] = {}
    for name in HEADLINE:
        sql = osql.get(name)
        if sql is None or name in skip:
            continue
        con.execute(sql).fetchall()  # warm
        best = float("inf")
        for _ in range(trials):
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 4)
    con.close()
    return timings


def _sf1_leg(spark, specs) -> dict[str, object]:
    """The amortized-scale leg folded into the round artifact (VERDICT r3
    item 5). Returns extra JSON keys; on any failure returns an error note
    instead of failing the whole bench."""
    repo = os.path.dirname(os.path.abspath(__file__))
    sf1_dir = os.path.join(repo, "benchdata", "sf1")
    if not os.path.isdir(sf1_dir):
        import subprocess

        subprocess.run(
            [sys.executable, os.path.join(repo, "scripts", "make_benchdata.py")],
            check=True, capture_output=True, timeout=300,
        )
    import __spark_entry__ as e

    osql = e.oracle_sql()
    spark_t = _measure_spark(spark, specs, sf1_dir, trials=TRIALS)
    # DuckDB side: warm + one timed run. Its run-to-run variance is small
    # (BENCH_scale.json's back-to-back pairs agree within ~3%), and the
    # oracle leg's q_dedup_near alone costs 25 s/run at sf1 — min-of-2
    # would add a minute of wall time for no information.
    duck_t = _measure_duckdb(osql, sf1_dir, trials=1, skip=("q_jaccard_join",))
    comparable = [q for q in spark_t if q in duck_t]
    s_tot = round(sum(spark_t.values()), 4)
    d_tot = round(sum(duck_t.values()), 4)
    s_cmp = round(sum(spark_t[q] for q in comparable), 4)
    return {
        "sf1_trials": TRIALS,
        "sf1_queries": spark_t,
        "sf1_total_sec": s_tot,
        "sf1_original17_subtotal_sec": round(
            sum(v for q, v in spark_t.items() if q in ORIGINAL17), 4
        ),
        "sf1_oracle_queries": duck_t,
        "sf1_oracle_total_sec": d_tot,
        "sf1_oracle_original17_subtotal_sec": round(
            sum(v for q, v in duck_t.items() if q in ORIGINAL17), 4
        ),
        "sf1_ratio_spark_over_oracle_comparable": round(s_cmp / d_tot, 3) if d_tot else None,
        "sf1_note": "oracle skips q_jaccard_join (quadratic all-pairs SQL, "
                    "infeasible at sf1 — see BENCH_scale.json); ratio is over "
                    "the comparable set",
    }


def main() -> None:
    from crypto_data_ingestion_script_spark.registry import load_all
    from crypto_data_ingestion_script_spark.session import build_session

    spark = build_session("crypto-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")
    specs = load_all()
    # JVM warmup on data-independent work: codegen compiler, shuffle machinery,
    # task scheduler. Touches none of the benchmark tables, so per-query
    # timings below still include their own planning + IO (cold data, warm JVM).
    spark.range(1_000_000).selectExpr("sum(id) s", "count(*) c").collect()
    # Host-drift calibration FIRST (constant work, both engines) so every
    # number below can be read against the host's state at measurement time.
    calib_spark = _calibrate_spark(spark)
    calib_duck = _calibrate_duckdb()
    drift_spark = round(calib_spark / CALIB_SPARK_REF, 3)
    drift_duck = round(calib_duck / CALIB_DUCK_REF, 3)
    print(
        f"# calib: spark={calib_spark}s (drift {drift_spark}x) "
        f"duck={calib_duck}s (drift {drift_duck}x)",
        file=sys.stderr,
    )
    # Warm the parquet reader code path on the 5-row region dim (not a
    # benchmarked table): first parquet scan in a JVM pays ~2s of class
    # loading that would otherwise be billed to whichever query runs first.
    spark.read.parquet(os.path.join(SF_DIR, "region.parquet")).count()
    # Warm the Python worker pool (fork + numpy/pandas import per worker):
    # one trivial Arrow-batched pass over data-independent rows.
    import pandas as _pd

    def _noop(batches):
        import numpy  # noqa: F401 - import cost is the thing being warmed

        for b in batches:
            yield b

    spark.range(64).repartition(32).mapInPandas(_noop, schema="id long").count()
    # Per-plan warmup: run every headline query once at the SMALLEST scale
    # factor (different dataset, same plan shape) so whole-stage codegen
    # classes, AQE machinery, and expression-specific code paths are compiled
    # before measurement. This mirrors the BASELINE.md DuckDB methodology —
    # "warm in-process run of the same oracle_sql() text" — so both engines
    # are timed warm and the measured delta is data-scale work at SF_DIR,
    # not first-call compilation. Skipped for any query when SF_DIR *is*
    # the warm dir (then the old cold-plan numbers apply).
    warm_dir = "/root/testdata/sf0.001"
    if os.path.realpath(warm_dir) != os.path.realpath(SF_DIR):
        for name in HEADLINE:
            spec = specs.get(name)
            if spec is not None:
                spec.fn(spark, warm_dir).count()
    # min-of-TRIALS per query at measurement scale: the shared host has
    # ±20% run-to-run noise (BASELINE.md); the minimum is the standard
    # microbenchmark estimator of the noise-free cost. Every trial executes
    # the full plan (build + run to a count action).
    timings = _measure_spark(spark, specs, SF_DIR, trials=TRIALS)
    total = sum(timings.values())
    sf = os.path.basename(SF_DIR.rstrip("/")).replace("sf", "")
    out = {
        "metric": "total_wall_sec",
        "value": round(total, 4),
        "unit": "sec",
        # Self-documenting noise posture (VERDICT r4 item 4): every
        # per-query number above is the minimum of this many full plan
        # executions — a single contended run can no longer masquerade
        # as the round's headline.
        "trials": TRIALS,
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "original17_subtotal_sec": round(
            sum(v for q, v in timings.items() if q in ORIGINAL17), 4
        ),
        # Host-drift calibration (VERDICT r7 item 1): constant-work kernel
        # times + the pinned references they're read against. drift > 1
        # means the host was slower than the r8 pin when THIS artifact was
        # produced; *_norm totals below divide by it.
        "calib_spark_sec": calib_spark,
        "calib_duck_sec": calib_duck,
        "calib_spark_ref_sec": CALIB_SPARK_REF,
        "calib_duck_ref_sec": CALIB_DUCK_REF,
        "calib_spark_drift": drift_spark,
        "calib_duck_drift": drift_duck,
        "value_norm_sec": round(total / drift_spark, 4) if drift_spark else None,
        # Floor-aware normalization (r10): the honest cross-round form —
        # the scheduling floor does not speed up or slow down 1:1 with the
        # calibration kernel, so only the data term is drift-scaled.
        "floor_sec_per_query": FLOOR_SEC_PER_QUERY,
        "value_norm_floor_sec": _floor_norm(timings, drift_spark),
        "original17_norm_floor_sec": _floor_norm(
            {q: v for q, v in timings.items() if q in ORIGINAL17}, drift_spark
        ),
        # CPU contract, driver-verifiable (VERDICT r13 item 2): the session
        # master honors $SPARK_GRAFT_CPUS (session.py builds
        # local[$SPARK_GRAFT_CPUS]); emitting the resolved parallelism and
        # master string lets the driver's suspect_cpus_ignored heuristic
        # distinguish "honored but floor-bound at this SF" from "ignored".
        "cpus": spark.sparkContext.defaultParallelism,
        "master": spark.sparkContext.master,
    }
    # Amortized-scale leg (sf1) rides in the same artifact when benching the
    # driver-default sf0.1 dir. Guarded: the round headline number must never
    # fail because the optional leg did.
    if (
        os.environ.get("SPARK_GRAFT_SF1", "1") != "0"
        and os.path.realpath(SF_DIR) == os.path.realpath("/root/testdata/sf0.1")
    ):
        try:
            out.update(_sf1_leg(spark, specs))
        except Exception as ex:  # noqa: BLE001 - leg is best-effort by design
            out["sf1_error"] = f"{type(ex).__name__}: {str(ex)[:200]}"
        if "sf1_total_sec" in out:
            # Drift-normalized sf1 headline: each engine's total divided by
            # its own drift factor; the normalized ratio divides those, so
            # a host window that slows both engines equally cancels out.
            out["sf1_total_norm_sec"] = round(out["sf1_total_sec"] / drift_spark, 4)
            out["sf1_oracle_total_norm_sec"] = round(
                out["sf1_oracle_total_sec"] / drift_duck, 4
            )
            r = out.get("sf1_ratio_spark_over_oracle_comparable")
            out["sf1_ratio_norm"] = (
                round(r * drift_duck / drift_spark, 3) if r is not None else None
            )
            out["sf1_total_norm_floor_sec"] = _floor_norm(
                out["sf1_queries"], drift_spark
            )
    # Full-line committed artifact (VERDICT r7 item 1): the driver's
    # 2000-char tail capture truncates the head of this JSON line, so the
    # complete object is also written to a file the round commits — PLUS a
    # round-stamped copy (VERDICT r9 item 5: the driver's own bench run
    # overwrites BENCH_full.json, so each round's builder artifact survives
    # as BENCH_full_r{N}.json; N = 1 + the highest driver-written round).
    repo = os.path.dirname(os.path.abspath(__file__))
    import glob
    import re

    rounds = [
        int(m.group(1))
        for p in glob.glob(os.path.join(repo, "BENCH_r*.json"))
        if (m := re.match(r"BENCH_r(\d+)\.json$", os.path.basename(p)))
    ]
    stamp = (max(rounds) + 1) if rounds else 0
    for path in ("BENCH_full.json", f"BENCH_full_r{stamp:02d}.json"):
        with open(os.path.join(repo, path), "w") as f:
            json.dump(out, f, indent=1)
    # Truncation-proof stdout line (VERDICT r13 item 2): the driver's tail
    # capture keeps only the last 2000 chars of output, and the sf1 leg's
    # ~25 extra keys pushed the r12 line past that, truncating the head of
    # the JSON and making the whole round unparseable (BENCH_r12.json
    # parsed: null -> an entire PERF table of new_in_bench). The one-liner
    # therefore carries everything EXCEPT the sf1_* keys; the complete
    # object (sf1 leg included) lives in the two committed files above.
    # Measurement methodology is unchanged — this is an output-shape fix.
    print(json.dumps({k: v for k, v in out.items() if not k.startswith("sf1_")}))
    spark.stop()


if __name__ == "__main__":
    main()
