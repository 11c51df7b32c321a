"""transformWithStateInPandas OHLC. The query is registered unconditionally:
where the protobuf package (required by the TWS state-server protocol) is
missing — as in the build container — it falls back to the same operator on
applyInPandasWithState, so the oracle check always runs; the TWS-specific
path additionally exercises here only when protobuf is importable."""

from __future__ import annotations

import pytest

from crypto_data_ingestion_script_spark.registry import load_all
from crypto_data_ingestion_script_spark.streaming.tws import tws_available


def test_registered_unconditionally():
    assert "q_stream_tws" in load_all()


# The oracle check for q_stream_tws (through whichever stateful API the
# environment supports) runs with every other query in
# test_queries_vs_oracle.py; this guards the TWS-native path specifically.
@pytest.mark.skipif(not tws_available(), reason="protobuf not installed")
def test_tws_native_path_used(spark, sf_dir):
    from crypto_data_ingestion_script_spark.streaming.tws import tws_ohlc
    from crypto_data_ingestion_script_spark.streaming.jobs import (
        _events_stream,
        run_to_memory,
    )
    from crypto_data_ingestion_script_spark.catalog import load

    load(spark, sf_dir)
    bars = run_to_memory(
        tws_ohlc(_events_stream(spark, sf_dir)), output_mode="update"
    )
    assert bars.count() > 0
