"""Retry/backoff semantics for the REST source: transient failures are
absorbed by retry, permanent failures still fall to row-level tolerance."""

from __future__ import annotations

import pytest

from crypto_data_ingestion_script_spark.sources.rest import (
    flaky_fetch,
    with_retry,
)


def test_retry_absorbs_transient_failures():
    calls = []
    fetch = with_retry(
        flaky_fetch(lambda s: 42.0, fail_first=2),
        attempts=3,
        sleep=calls.append,
    )
    assert fetch("BTCUSDT") == 42.0
    # two failures -> two backoff sleeps, exponentially growing
    assert calls == [0.5, 1.0]


def test_retry_exhaustion_reraises():
    fetch = with_retry(
        flaky_fetch(lambda s: 42.0, fail_first=5),
        attempts=3,
        sleep=lambda _s: None,
    )
    with pytest.raises(ConnectionError):
        fetch("BTCUSDT")


def test_ingest_with_retry_keeps_all_symbols(spark, sf_dir):
    from crypto_data_ingestion_script_spark.registry import load_all

    specs = load_all()
    bare = specs["q_source_ingest"].fn(spark, sf_dir)
    resilient = specs["q_source_ingest_retry"].fn(spark, sf_dir)
    # bare path includes a permanently-failing symbol that drops; the
    # resilient path polls 3 symbols through transient failures: all survive.
    assert bare.count() == 3  # XXXFAIL dropped
    assert resilient.count() == 3  # every symbol retried to success
