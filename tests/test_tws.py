"""transformWithStateInPandas OHLC — runs only where the protobuf package
(required by the TWS state-server protocol) is installed; the build
container ships without it, so this documents the capability and guards
the gated registration."""

from __future__ import annotations

import pytest

from crypto_data_ingestion_script_spark.registry import load_all
from crypto_data_ingestion_script_spark.streaming.tws import tws_available

from .oracle_diff import compare, duck_connection


def test_registration_matches_environment():
    specs = load_all()
    assert ("q_stream_tws" in specs) == tws_available()


@pytest.mark.skipif(not tws_available(), reason="protobuf not installed")
def test_tws_matches_batch_oracle(spark, sf_dir):
    specs = load_all()
    spec = specs["q_stream_tws"]
    con = duck_connection(sf_dir)
    try:
        sdf = spec.fn(spark, sf_dir)
        odf = con.execute(spec.oracle).fetchdf()
        errs = compare(sdf, odf, "q_stream_tws")
        assert not errs, "\n".join(errs)
    finally:
        con.close()
