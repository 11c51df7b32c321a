"""HLL sketch quality gate: the estimates are engine-specific (rows-only in
the driver's check), so bound them against exact distinct counts here."""

from __future__ import annotations

from crypto_data_ingestion_script_spark.registry import load_all


def test_hll_estimates_within_5pct(spark, sf_dir):
    specs = load_all()
    est = {
        r["event_type"]: r["approx_users"]
        for r in specs["q_hll_sketch"].fn(spark, sf_dir).collect()
    }
    from crypto_data_ingestion_script_spark.catalog import load
    from pyspark.sql import functions as F

    t = load(spark, sf_dir)
    exact = {
        r["event_type"]: r["n"]
        for r in t.events.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    exact["ALL"] = t.events.select("user_id").distinct().count()
    assert set(est) == set(exact)
    for k, e in est.items():
        assert abs(e - exact[k]) <= max(1.0, 0.05 * exact[k]), (
            f"{k}: est={e} exact={exact[k]}"
        )


def test_kll_quantiles_within_tolerance(spark, sf_dir):
    """KLL p50/p90/p99 (incl. the merged global row) must land within the
    sketch's rank-error bound of the exact percentiles (default k=200 ->
    ~1.65% rank error; check the estimate sits between the exact values at
    rank +-3%, which is the guarantee KLL actually makes)."""
    from crypto_data_ingestion_script_spark.registry import load_all
    from crypto_data_ingestion_script_spark.catalog import load
    from pyspark.sql import functions as F

    specs = load_all()
    got = {
        r["event_type"]: (r["p50"], r["p90"], r["p99"])
        for r in specs["q_kll_quantiles"].fn(spark, sf_dir).collect()
    }
    bands = [(0.47, 0.53), (0.87, 0.93), (0.96, 1.0)]
    exprs = []
    for i, (lo, hi) in enumerate(bands):
        exprs.append(F.expr(f"percentile(value, {lo})").alias(f"lo{i}"))
        exprs.append(F.expr(f"percentile(value, {hi})").alias(f"hi{i}"))
    events = load(spark, sf_dir).events
    groups = {
        r["event_type"]: r
        for r in events.groupBy("event_type").agg(*exprs).collect()
    }
    groups["ALL"] = events.agg(*exprs).first()
    for key, ests in got.items():
        r = groups[key]
        for i, est in enumerate(ests):
            assert r[f"lo{i}"] <= est <= r[f"hi{i}"], (key, i, est)


def test_theta_estimates_within_5pct(spark, sf_dir):
    from crypto_data_ingestion_script_spark.registry import load_all
    from crypto_data_ingestion_script_spark.catalog import load
    from pyspark.sql import functions as F

    specs = load_all()
    got = {
        r["event_type"]: r["approx_users"]
        for r in specs["q_theta_sketch"].fn(spark, sf_dir).collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in load(spark, sf_dir)
        .events.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    for k, est in got.items():
        assert abs(est - exact[k]) <= max(2.0, 0.05 * exact[k]), (k, est, exact[k])
