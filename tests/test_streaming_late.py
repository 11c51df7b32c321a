"""Watermark semantics: late data beyond the watermark is DROPPED, late
data within it is folded in — the engine-managed answer to the reference's
stall-misattribution bug (dataCollector.py:186-189 folds any stall's
samples into the wrong hour; event-time windows + watermark bound lateness
explicitly instead).

Determinism: two explicit availableNow runs over a file-source directory
sharing one checkpoint — batch 1 sees file A, batch 2 sees file B. No
wall-clock triggers (SURVEY §7.4.5)."""

from __future__ import annotations

import datetime as dt
import os
import shutil
import tempfile
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _write_parquet(path: str, rows: list[tuple[dt.datetime, str, float]]) -> None:
    pdf = pd.DataFrame(
        {
            "ts": pd.to_datetime([r[0] for r in rows]),
            "event_type": [r[1] for r in rows],
            "value": [r[2] for r in rows],
        }
    )
    # Microsecond timestamps: the engine session reads TIMESTAMP(NANOS) as
    # longs (nanosAsLong conf for the driver testdata), so test files must
    # use MICROS to present as real timestamps.
    pq.write_table(
        pa.Table.from_pandas(pdf, preserve_index=False),
        path,
        coerce_timestamps="us",
        allow_truncated_timestamps=True,
    )


def _run_once(spark, src_dir: str, ckpt: str, out_dir: str) -> None:
    """availableNow pass into a parquet sink (memory sinks cannot resume
    from a checkpoint; file sinks can — that IS the two-batch mechanism)."""
    stream = (
        spark.readStream.schema("ts timestamp, event_type string, value double")
        .parquet(src_dir)
    )
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
    )
    q = (
        agg.select(
            F.col("w.start").alias("w_start"), "event_type", "n", "s"
        )
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_late_beyond_watermark_dropped(spark):
    base = tempfile.mkdtemp(prefix="late_")
    src, ckpt = os.path.join(base, "src"), os.path.join(base, "ckpt")
    out = os.path.join(base, "out")
    os.makedirs(src)

    # Batch 1: hour-0 data, then hour-3 data that pushes the watermark to
    # hour 2 — hour 0's window closes and is emitted.
    _write_parquet(
        os.path.join(src, "a.parquet"),
        [
            (T0 + dt.timedelta(minutes=10), "x", 1.0),
            (T0 + dt.timedelta(minutes=20), "x", 2.0),
            (T0 + dt.timedelta(hours=3), "x", 10.0),
        ],
    )
    _run_once(spark, src, ckpt, out)
    after1 = {
        (r["w_start"], r["event_type"]): r
        for r in spark.read.parquet(out).collect()
    }
    assert (T0, "x") in after1, "hour-0 window should have closed and emitted"
    assert after1[(T0, "x")]["n"] == 2

    # Batch 2: one row for hour 0 again — 3 hours late, far beyond the
    # 1-hour watermark → must be dropped, not re-emitted, not mis-bucketed.
    _write_parquet(
        os.path.join(src, "b.parquet"),
        [
            (T0 + dt.timedelta(minutes=30), "x", 99.0),  # too late: dropped
            (T0 + dt.timedelta(hours=5), "x", 20.0),  # advances watermark
        ],
    )
    _run_once(spark, src, ckpt, out)
    rows = spark.read.parquet(out).collect()
    emitted_hour0 = [
        r for r in rows if r["w_start"] == T0 and r["event_type"] == "x"
    ]
    # exactly the original emission; the 99.0 row left no trace anywhere
    assert len(emitted_hour0) == 1
    assert emitted_hour0[0]["n"] == 2 and emitted_hour0[0]["s"] == 3.0
    assert not any(abs((r["s"] or 0) - 99.0) < 1e-9 for r in rows)
    # hour-3 window closed in batch 2 (watermark moved to hour 4)
    assert any(
        r["w_start"] == T0 + dt.timedelta(hours=3) and r["n"] == 1 for r in rows
    )
    shutil.rmtree(base, ignore_errors=True)


def test_stream_reads_directory_table_layout(spark, tmp_path):
    """Multi-file table layout regression guard: when <table>.parquet is a
    DIRECTORY of part files (the production layout), the events stream
    must read every part — the round-3 bug was a pathGlobFilter matching
    the directory name so streams ran clean and EMPTY (the silent-failure
    class). Build a directory-layout copy of sf0.001 and assert the
    streamed aggregate equals the batch aggregate on the same data."""
    import glob

    import pyarrow.parquet as _pq

    from crypto_data_ingestion_script_spark.catalog import load
    from crypto_data_ingestion_script_spark.registry import load_all

    src_dir = "/root/testdata/sf0.001"
    sf_dir = str(tmp_path / "sfdir")
    tdir = os.path.join(sf_dir, "events.parquet")
    os.makedirs(tdir)
    # Split the single events file into two part files.
    table = _pq.read_table(os.path.join(src_dir, "events.parquet"))
    half = table.num_rows // 2
    _pq.write_table(table.slice(0, half), os.path.join(tdir, "part-0.parquet"))
    _pq.write_table(table.slice(half), os.path.join(tdir, "part-1.parquet"))

    streamed = load_all()["q_stream_tumbling"].fn(spark, sf_dir).toPandas()
    assert len(streamed) > 0, "stream read zero rows from directory layout"
    assert int(streamed["sample_count"].sum()) == table.num_rows

    batch = (
        spark.read.parquet(tdir)
        .groupBy(F.date_trunc("hour", "ts").alias("h"), "event_type")
        .count()
        .count()
    )
    assert len(streamed) == batch


def test_stream_quality_gate_matches_batch_classifier(spark):
    """q_stream_quality_gate (native streaming agg) and
    q_quality_classifier (batch) must agree doc-for-doc on n_tokens and
    the keep verdict — stream delivery cannot change an exact integer
    gate."""
    from crypto_data_ingestion_script_spark.registry import load_all

    qs = load_all()
    sf_dir = "/root/testdata/sf0.001"
    stream = {
        r["doc_id"]: (r["n_tokens"], r["keep"])
        for r in qs["q_stream_quality_gate"].fn(spark, sf_dir).collect()
    }
    batch = {
        r["doc_id"]: (r["n_tokens"], r["keep"])
        for r in qs["q_quality_classifier"].fn(spark, sf_dir).collect()
    }
    assert stream == batch and len(stream) > 0
