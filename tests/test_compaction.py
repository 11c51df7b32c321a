"""Compaction must actually reduce the file count (content equality is the
oracle's job in q_compact)."""

from __future__ import annotations

import glob
import os
import tempfile

from crypto_data_ingestion_script_spark.catalog import load
from crypto_data_ingestion_script_spark.ingest import compact_parquet


def _parquet_files(path: str) -> list[str]:
    return glob.glob(os.path.join(path, "*.parquet"))


def test_compaction_reduces_file_count(spark, sf_dir):
    t = load(spark, sf_dir)
    path = os.path.join(tempfile.mkdtemp(prefix="compact_t_"), "shards")
    src = t.events.select("event_id", "value")
    src.repartition(32).write.mode("overwrite").parquet(path)
    n_before = len(_parquet_files(path))
    rows_before = spark.read.parquet(path).count()
    compact_parquet(spark, path, target_files=4)
    assert len(_parquet_files(path)) <= 4 < n_before
    assert spark.read.parquet(path).count() == rows_before
