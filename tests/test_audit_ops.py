"""Semantics tests for the round-9 batch-3 additions: q_dup_profile,
q_length_filter_sweep, q_lang_id_chargram."""

from __future__ import annotations

from pyspark.sql import functions as F

from crypto_data_ingestion_script_spark.registry import load_all

SPECS = load_all()


def test_dup_profile_partitions_the_corpus(spark, sf_dir):
    from crypto_data_ingestion_script_spark.catalog import load

    rows = SPECS["q_dup_profile"].fn(spark, sf_dir).collect()
    n_docs = load(spark, sf_dir).documents.count()
    # multiplicity classes partition the corpus exactly
    assert sum(r["n_docs"] for r in rows) == n_docs
    for r in rows:
        assert r["n_docs"] == r["dup_count"] * r["n_clusters"]
        assert abs(r["survival_rate"] - round(1.0 / r["dup_count"], 8)) < 1e-9


def test_dup_profile_on_known_dups(spark):
    rows = [(i, "same text") for i in range(4)] + [(9, "other")]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    dup = docs.groupBy(F.md5("text").alias("h")).agg(
        F.count(F.lit(1)).alias("dup_count")
    )
    prof = {
        r["dup_count"]: r["n_clusters"]
        for r in dup.groupBy("dup_count")
        .agg(F.count(F.lit(1)).alias("n_clusters"))
        .collect()
    }
    assert prof == {4: 1, 1: 1}


def test_length_sweep_monotone(spark, sf_dir):
    rows = sorted(
        SPECS["q_length_filter_sweep"].fn(spark, sf_dir).collect(),
        key=lambda r: r["min_tokens"],
    )
    assert [r["min_tokens"] for r in rows] == [10, 20, 30, 40, 50, 60]
    for a, b in zip(rows, rows[1:]):
        assert a["docs_kept"] >= b["docs_kept"]
        assert a["tokens_kept"] >= b["tokens_kept"]
    for r in rows:
        assert 0.0 <= r["doc_share"] <= 1.0
        assert 0.0 <= r["token_share"] <= 1.0
        # token share dominates doc share at any cut (long docs survive)
        assert r["token_share"] >= r["doc_share"] - 1e-9


def test_chargram_lid_contract(spark, sf_dir):
    from crypto_data_ingestion_script_spark.catalog import load

    out = SPECS["q_lang_id_chargram"].fn(spark, sf_dir).collect()
    docs = load(spark, sf_dir).documents
    n_held = docs.filter(F.col("doc_id") % 5 == 0).count()
    langs = {r["lang"] for r in docs.select("lang").distinct().collect()}
    assert len(out) == n_held  # exactly one prediction per held-out doc
    for r in out:
        assert r["predicted_lang"] in langs
        assert r["best_score"] < 0  # log-probabilities
        assert r["is_correct"] == (r["labeled_lang"] == r["predicted_lang"])
