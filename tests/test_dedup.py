"""Incremental cross-corpus dedup (q_dedup_incremental) contracts:
batch-size invariance and the bucketed-not-all-pairs plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from crypto_data_ingestion_script_spark.catalog import load
from crypto_data_ingestion_script_spark.llm.dedup import (
    BATCH_MOD,
    BATCH_REM,
    incremental_near_dedup,
)
from crypto_data_ingestion_script_spark.registry import load_all

SPECS = load_all()


def _rows(df):
    return sorted(
        (
            r["doc_id"],
            r["n_matches"],
            r["best_jaccard"],
            r["first_match_id"],
            r["is_novel"],
        )
        for r in df.collect()
    )


def test_incremental_dedup_is_batch_size_invariant(spark, sf_dir):
    """Each batch document's verdict depends only on itself and the
    corpus: screening HALF the batch must reproduce exactly the full
    run's rows for those documents (the recurring-crawl contract — one
    big batch or many small ones, same decisions)."""
    docs = load(spark, sf_dir).documents
    batch = docs.filter(F.col("doc_id") % BATCH_MOD == BATCH_REM)
    corpus = docs.filter(F.col("doc_id") % BATCH_MOD != BATCH_REM)
    full = _rows(incremental_near_dedup(batch, corpus))
    assert len(full) > 0
    cut = sorted(r[0] for r in full)[len(full) // 2]
    half = _rows(incremental_near_dedup(batch.filter(F.col("doc_id") < cut), corpus))
    assert half == [r for r in full if r[0] < cut]


def test_incremental_dedup_matches_are_sound(spark, sf_dir):
    """Spot-verify the match semantics: every non-novel row's
    first_match_id is a corpus doc (never in the batch), n_matches > 0
    iff not novel, and best_jaccard is in (0, 1]."""
    out = SPECS["q_dedup_incremental"].fn(spark, sf_dir).collect()
    assert len(out) > 0
    for r in out:
        if r["is_novel"]:
            assert r["n_matches"] == 0 and r["best_jaccard"] is None
            assert r["first_match_id"] is None
        else:
            assert r["n_matches"] > 0 and 0.0 < r["best_jaccard"] <= 1.0
            assert r["first_match_id"] % BATCH_MOD != BATCH_REM
            assert r["doc_id"] % BATCH_MOD == BATCH_REM


def test_incremental_dedup_is_bucketed_not_all_pairs(spark, sf_dir):
    """Candidates must come from the band-hash equi-join — never a
    batch×corpus cartesian/nested-loop enumeration."""
    df = SPECS["q_dedup_incremental"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
