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
