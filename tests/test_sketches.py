"""Sketch quality gates. The sketch queries emit (exact value, tolerance
verdict) so the driver can hash-check them; these tests assert the verdicts
are actually TRUE (a broken sketch flips them) and that the exact columns
agree with an independently computed ground truth — guarding against the
query "verifying" itself with a wrong exact side."""

from __future__ import annotations

from pyspark.sql import functions as F

from crypto_data_ingestion_script_spark.catalog import load
from crypto_data_ingestion_script_spark.registry import load_all


def test_hll_estimates_within_5pct(spark, sf_dir):
    specs = load_all()
    rows = specs["q_hll_sketch"].fn(spark, sf_dir).collect()
    got = {r["event_type"]: r for r in rows}
    t = load(spark, sf_dir)
    exact = {
        r["event_type"]: r["n"]
        for r in t.events.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    exact["ALL"] = t.events.select("user_id").distinct().count()
    assert set(got) == set(exact)
    for k, r in got.items():
        assert r["n_users_exact"] == exact[k], (k, r)
        assert r["est_within_5pct"], f"{k}: HLL estimate outside 5% of {exact[k]}"


def test_kll_quantiles_within_rank_band(spark, sf_dir):
    specs = load_all()
    rows = specs["q_kll_quantiles"].fn(spark, sf_dir).collect()
    assert {r["event_type"] for r in rows} >= {"ALL"}
    events = load(spark, sf_dir).events
    exact_all = events.agg(
        F.percentile("value", F.lit(0.5)).alias("p50"),
        F.percentile("value", F.lit(0.9)).alias("p90"),
        F.percentile("value", F.lit(0.99)).alias("p99"),
    ).first()
    for r in rows:
        assert r["est_in_rank_band"], f"{r['event_type']}: KLL outside rank band"
        if r["event_type"] == "ALL":
            assert abs(r["p50_exact"] - exact_all["p50"]) < 1e-9
            assert abs(r["p90_exact"] - exact_all["p90"]) < 1e-9
            assert abs(r["p99_exact"] - exact_all["p99"]) < 1e-9


def test_theta_estimates_within_5pct(spark, sf_dir):
    specs = load_all()
    rows = specs["q_theta_sketch"].fn(spark, sf_dir).collect()
    exact = {
        r["event_type"]: r["n"]
        for r in load(spark, sf_dir)
        .events.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    for r in rows:
        assert r["n_users_exact"] == exact[r["event_type"]]
        assert r["est_within_5pct"], f"{r['event_type']}: theta estimate off"


def test_approx_count_and_percentile_verdicts(spark, sf_dir):
    specs = load_all()
    acd = specs["q_approx_count_distinct"].fn(spark, sf_dir).collect()
    assert acd and all(r["est_within_5pct"] for r in acd)
    ap = specs["q_approx_percentile"].fn(spark, sf_dir).collect()
    assert ap and all(r["est_within_5pct"] for r in ap)
