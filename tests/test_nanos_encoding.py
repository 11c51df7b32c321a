"""events.ts parquet encoding has flipped between driver testdata
generations — TIMESTAMP(NANOS) (no native Spark type; read as long under
nanosAsLong and normalized by the catalog) vs TIMESTAMP(MICROS) (read
natively). The catalog must produce identical microsecond timestamp_ntz
values from BOTH encodings; a unit mistake here is silent (streams run,
timestamps land in 1970, only watermark-gated queries expose it)."""

from __future__ import annotations

import datetime as dt
import os

import pyarrow as pa
import pyarrow.parquet as pq

from crypto_data_ingestion_script_spark.catalog import Catalog

ROWS = [
    (dt.datetime(2024, 1, 1, 0, 0, 7, 179575), "click", 1, 10, "{}", 1.0),
    (dt.datetime(2024, 3, 5, 23, 59, 59, 999999), "view", 2, 11, "{}", 2.0),
    (dt.datetime(2025, 12, 31, 12, 30, 0, 1), "purchase", 3, 12, "{}", 3.0),
]


def _write_events(dir_path: str, unit: str) -> None:
    os.makedirs(dir_path, exist_ok=True)
    table = pa.table(
        {
            "event_id": pa.array([r[2] for r in ROWS], pa.int64()),
            "ts": pa.array([r[0] for r in ROWS], pa.timestamp(unit)),
            "event_type": pa.array([r[1] for r in ROWS]),
            "user_id": pa.array([r[3] for r in ROWS], pa.int64()),
            "props": pa.array([r[4] for r in ROWS]),
            "value": pa.array([r[5] for r in ROWS], pa.float64()),
        }
    )
    pq.write_table(table, os.path.join(dir_path, "events.parquet"))


def test_catalog_reads_nanos_and_micros_identically(spark, tmp_path):
    micros_dir, nanos_dir = str(tmp_path / "us"), str(tmp_path / "ns")
    _write_events(micros_dir, "us")
    _write_events(nanos_dir, "ns")
    got_us = {
        r["event_id"]: r["ts"]
        for r in Catalog(spark, micros_dir).events.select("event_id", "ts").collect()
    }
    got_ns = {
        r["event_id"]: r["ts"]
        for r in Catalog(spark, nanos_dir).events.select("event_id", "ts").collect()
    }
    want = {r[2]: r[0] for r in ROWS}
    assert got_us == want, got_us
    assert got_ns == want, got_ns
