"""Semantics tests for the round-9 batch-2 additions: q_hits,
q_epoch_plan, q_tokenizer_fertility, q_quality_calibration. The oracle
hash-check (test_queries_vs_oracle) pins exact values; these pin the
operator CONTRACTS that the hash alone wouldn't explain."""

from __future__ import annotations

import math

from crypto_data_ingestion_script_spark.registry import load_all

SPECS = load_all()


def test_hits_l1_normalized_and_positive(spark, sf_dir):
    rows = SPECS["q_hits"].fn(spark, sf_dir).collect()
    assert len(rows) == 25
    hub_sum = sum(r["hub"] for r in rows)
    auth_sum = sum(r["auth"] for r in rows)
    # L1-normalized per round, rounded 8dp -> sums within rounding slack.
    assert abs(hub_sum - 1.0) < 25 * 5e-9
    assert abs(auth_sum - 1.0) < 25 * 5e-9
    assert all(r["hub"] >= 0 and r["auth"] >= 0 for r in rows)


def test_epoch_plan_cap_and_accounting(spark, sf_dir):
    rows = SPECS["q_epoch_plan"].fn(spark, sf_dir).collect()
    assert rows
    wsum = sum(r["mix_weight"] for r in rows)
    assert abs(wsum - 1.0) < len(rows) * 5e-9
    for r in rows:
        assert 0 < r["epochs"] <= 4.0
        # served = ROUNDED epochs x available (the declared rounding chain)
        assert abs(r["tokens_served"]
                   - round(r["epochs"] * r["tokens_available"], 4)) < 1e-9
        assert abs(r["token_deficit"]
                   - round(r["tokens_requested"] - r["tokens_served"], 4)) \
            < 1e-6
        # under the cap the request is fully served
        if r["epochs"] < 4.0:
            assert abs(r["token_deficit"]) < 1e-3


def test_fertility_consistent_with_token_count(spark, sf_dir):
    fert = {r["lang"]: r for r in
            SPECS["q_tokenizer_fertility"].fn(spark, sf_dir).collect()}
    # cross-op consistency: per-corpus token totals must agree with
    # q_token_count's per-doc counters.
    tc = SPECS["q_token_count"].fn(spark, sf_dir).collect()
    assert sum(r["ws_tokens"] for r in fert.values()) == \
        sum(r["ws_tokens"] for r in tc)
    assert sum(r["regex_tokens"] for r in fert.values()) == \
        sum(r["regex_tokens"] for r in tc)
    for r in fert.values():
        assert r["fertility"] > 0 and r["chars_per_token"] > 0
        assert r["bytes_per_char"] >= 1.0  # UTF-8: at least 1 byte/char


def test_quality_calibration_local_keep_exact(spark, sf_dir):
    rows = SPECS["q_quality_calibration"].fn(spark, sf_dir).collect()
    assert rows
    n_total = sum(r["n_docs"] for r in rows)
    kept_global = sum(r["n_kept_global"] for r in rows)
    for r in rows:
        # the local contract is exact: ceil(0.3 * n) per source
        assert r["n_kept_local"] == math.ceil(0.3 * r["n_docs"])
        assert r["local_cutoff"] is not None
    # the global threshold keeps ~30% overall (ties can nudge it)
    assert 0.2 * n_total <= kept_global <= 0.4 * n_total
    # and the two policies must actually differ somewhere (the point of
    # the operator) on any corpus with per-source score variation
    assert any(r["n_kept_local"] != r["n_kept_global"] for r in rows)
