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


def test_bloom_bitmap_packs_and_probes_correctly(spark, sf_dir):
    """q_bloom_bitmap: the packed filter's word table is bounded at
    m/64 rows and broadcast to the probe; every exact corpus member
    bloom-hits (the no-false-negative invariant holds row-wise); and at
    least one row is an exact duplicate so the invariant is exercised."""
    from crypto_data_ingestion_script_spark.llm.dedup import BLOOM_M

    df = load_all()["q_bloom_bitmap"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan
    rows = df.collect()
    assert len(rows) > 0
    assert all(r["no_false_negative"] for r in rows)
    assert BLOOM_M % 64 == 0

    # The sf0.001 corpus has no cross-split exact duplicate, so exercise
    # the positive (true-member) probe path on a toy corpus: every
    # duplicated text MUST bloom-hit (no false negative), novel text may
    # or may not (false positives allowed).
    from crypto_data_ingestion_script_spark.llm.dedup import bloom_bitmap_screen

    batch = spark.createDataFrame(
        [(101, "alpha beta"), (102, "totally novel text"), (103, "gamma delta")],
        "doc_id bigint, text string",
    )
    corpus = spark.createDataFrame(
        [(1, "alpha beta"), (2, "gamma delta"), (3, "other stuff")],
        "doc_id bigint, text string",
    )
    toy = {r["doc_id"]: r for r in bloom_bitmap_screen(batch, corpus).collect()}
    assert toy[101]["in_corpus_exact"] and toy[101]["no_false_negative"]
    assert toy[103]["in_corpus_exact"] and toy[103]["no_false_negative"]
    assert not toy[102]["in_corpus_exact"] and toy[102]["no_false_negative"]


def test_cms_never_undercounts_even_with_collisions(spark):
    """cms_token_sketch on a 1-column-wide sketch: EVERY token's estimate
    collapses to the total token count (all collisions) — a real
    overestimate — and still never undercounts; at width 2 estimates can
    only shrink toward truth, never below it."""
    from crypto_data_ingestion_script_spark.llm.text import cms_token_sketch

    docs = spark.createDataFrame(
        [(1, "a a b c"), (2, "a b d")],
        "doc_id bigint, text string",
    )
    one = {r["token"]: r for r in cms_token_sketch(docs, d=2, w=1).collect()}
    assert set(one) == {"a", "b", "c", "d"}
    assert all(r["est"] == 7 for r in one.values())  # N = 7 tokens total
    assert one["a"]["n_true"] == 3 and one["c"]["n_true"] == 1
    two = cms_token_sketch(docs, d=2, w=2).collect()
    assert all(r["n_true"] <= r["est"] <= 7 for r in two)
