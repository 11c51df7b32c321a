"""Checkpoint-restart recovery: the structural fix for the reference's
restart duplicate-key hazard (dataCollector.py:146-150 — plain INSERT, no
ON CONFLICT, so a mid-hour restart re-inserts the open hour). A Spark
streaming query restarted from its checkpoint must (a) not reprocess
already-committed input and (b) resume stateful aggregation from the
persisted state, on both state store providers."""

from __future__ import annotations

import os
import tempfile

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pyspark.sql import functions as F

from crypto_data_ingestion_script_spark.catalog import load
from crypto_data_ingestion_script_spark.streaming.jobs import ROCKSDB_PROVIDER

SCHEMA_DDL = "event_id bigint, event_type string, value double"


@pytest.fixture()
def split_inputs(spark, sf_dir):
    """Events split by id parity into two parquet files, delivered as two
    successive micro-batch generations of a file-source directory."""
    pdf = (
        load(spark, sf_dir)
        .events.select("event_id", "event_type", "value")
        .toPandas()
    )
    indir = tempfile.mkdtemp(prefix="stream_in_")
    first = pdf[pdf.event_id % 2 == 0]
    second = pdf[pdf.event_id % 2 == 1]
    pq.write_table(pa.Table.from_pandas(first, preserve_index=False),
                   os.path.join(indir, "gen0.parquet"))
    return indir, first, second, pdf


def _passthrough_once(spark, indir, outdir, ckpt):
    q = (
        spark.readStream.schema(SCHEMA_DDL)
        .parquet(indir)
        .writeStream.format("parquet")
        .option("path", outdir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_file_sink_restart_is_exactly_once(spark, split_inputs):
    indir, first, second, pdf = split_inputs
    outdir = tempfile.mkdtemp(prefix="stream_out_")
    ckpt = tempfile.mkdtemp(prefix="ckpt_")
    _passthrough_once(spark, indir, outdir, ckpt)
    # Second generation arrives, stream restarts from the checkpoint.
    pq.write_table(pa.Table.from_pandas(second, preserve_index=False),
                   os.path.join(indir, "gen1.parquet"))
    _passthrough_once(spark, indir, outdir, ckpt)
    got = spark.read.schema(SCHEMA_DDL).parquet(outdir)
    assert got.count() == len(pdf), "restart duplicated or dropped rows"
    assert got.select("event_id").distinct().count() == len(pdf)


@pytest.mark.parametrize("provider", ["default", "rocksdb"])
def test_stateful_agg_resumes_from_checkpoint(spark, split_inputs, provider):
    """Update-mode grouped aggregation across a restart: the second run
    must merge new rows into state recovered from the checkpoint, so the
    final update per key equals the batch aggregate over ALL input."""
    indir, first, second, pdf = split_inputs
    ckpt = tempfile.mkdtemp(prefix="ckpt_state_")
    conf_key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(conf_key, None)
    if provider == "rocksdb":
        spark.conf.set(conf_key, ROCKSDB_PROVIDER)
    last_update: dict = {}
    try:
        def run_once():
            agg = (
                spark.readStream.schema(SCHEMA_DDL)
                .parquet(indir)
                .groupBy("event_type")
                .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
            )

            def sink(batch_df, batch_id):
                for r in batch_df.collect():
                    last_update[r["event_type"]] = (r["n"], r["s"])

            q = (
                agg.writeStream.outputMode("update")
                .foreachBatch(sink)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()

        run_once()
        pq.write_table(pa.Table.from_pandas(second, preserve_index=False),
                       os.path.join(indir, "gen1.parquet"))
        run_once()
    finally:
        if prev is None:
            spark.conf.unset(conf_key)
        else:
            spark.conf.set(conf_key, prev)
    expect = pdf.groupby("event_type").agg(n=("event_id", "size"),
                                           s=("value", "sum"))
    assert set(last_update) == set(expect.index)
    for k, row in expect.iterrows():
        n, s = last_update[k]
        assert n == row["n"]
        assert abs(s - row["s"]) < 1e-6 * max(1.0, abs(row["s"]))


def test_observed_metrics_ride_the_action(spark, sf_dir):
    """observe() metrics must report the written row count and time bounds
    without a second scan of the input."""
    from crypto_data_ingestion_script_spark.catalog import load
    from crypto_data_ingestion_script_spark.ingest import observed

    events = load(spark, sf_dir).events
    df, obs = observed(events.select("ts", "event_type", "value"))
    n_written = df.count()
    got = obs.get
    assert got["rows"] == n_written
    assert got["null_values"] == 0
    lo, hi = events.agg(F.min("ts"), F.max("ts")).first()
    assert got["min_ts"] == lo and got["max_ts"] == hi
