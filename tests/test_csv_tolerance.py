"""Row-level error tolerance on file sources (SURVEY §2.B — the
reference's skip-bad-symbol behavior, dataCollector.py:115-116, applied to
files): PERMISSIVE parse nulls out malformed fields instead of failing the
job, and the corrupt-record column captures the raw line for quarantine."""

from __future__ import annotations

import os
import tempfile


def _write_csv(lines):
    d = tempfile.mkdtemp(prefix="csv_tol_")
    p = os.path.join(d, "ticks.csv")
    with open(p, "w") as f:
        f.write("\n".join(lines) + "\n")
    return p


def test_permissive_csv_nulls_malformed_rows(spark):
    from crypto_data_ingestion_script_spark.sources.files import read_csv

    path = _write_csv(
        [
            "ts,symbol,price",
            "2026-01-01T00:00:00,BTCUSDT,50000.5",
            "2026-01-01T00:00:05,ETHUSDT,not_a_number",  # malformed price
            "2026-01-01T00:00:10,LTCBTC,0.0042",
        ]
    )
    df = read_csv(spark, path, "ts timestamp_ntz, symbol string, price double")
    rows = {r["symbol"]: r["price"] for r in df.collect()}
    # All three rows survive; only the malformed field is nulled.
    assert len(rows) == 3
    assert rows["BTCUSDT"] == 50000.5 and rows["LTCBTC"] == 0.0042
    assert rows["ETHUSDT"] is None


def test_corrupt_record_column_quarantines_raw_line(spark):
    path = _write_csv(
        [
            "ts,symbol,price",
            "2026-01-01T00:00:00,BTCUSDT,50000.5",
            "garbage line without commas",
        ]
    )
    df = (
        spark.read.schema(
            "ts timestamp_ntz, symbol string, price double, _corrupt_record string"
        )
        .option("header", True)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(path)
    )
    bad = df.filter(df._corrupt_record.isNotNull()).collect()
    good = df.filter(df._corrupt_record.isNull()).collect()
    assert len(bad) == 1 and "garbage" in bad[0]["_corrupt_record"]
    assert len(good) == 1 and good[0]["symbol"] == "BTCUSDT"
