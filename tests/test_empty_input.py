"""Degenerate-input behavior: core operators over zero rows must return
empty results with stable schemas — the guarantee that lets a scheduled
job survive an empty partition day (the reference crashes into NULL state
instead, dataCollector.py:140-163 assumes non-empty metrics)."""

from __future__ import annotations

from pyspark.sql import functions as F

from crypto_data_ingestion_script_spark.catalog import load
from crypto_data_ingestion_script_spark.operators.rollup import ohlc_bars
from crypto_data_ingestion_script_spark.streaming.stateful import (
    EMPTY_STATE,
    fold_pdf,
)


def test_ohlc_on_empty_input(spark, sf_dir):
    t = load(spark, sf_dir)
    empty = t.events.filter(F.lit(False))
    out = ohlc_bars(empty, ts_col="ts", key_col="event_type", value_col="value")
    assert out.count() == 0
    assert set(out.columns) == {
        "hour_ts",
        "event_type",
        "open_price",
        "high_price",
        "low_price",
        "close_price",
        "avg_price",
        "sample_count",
    }


def test_fold_empty_batch_is_identity():
    import pandas as pd

    pdf = pd.DataFrame({"ts": pd.to_datetime([]), "value": []})
    assert fold_pdf(EMPTY_STATE, pdf) == EMPTY_STATE
