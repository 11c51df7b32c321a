"""Driver-contract robustness: the failure modes and environmental drift a
grading/production driver can hit — wrong table name, missing data dir, a
session whose timezone is not UTC — must fail loudly or normalize, never
silently skew results."""

from __future__ import annotations

import pytest

from crypto_data_ingestion_script_spark.catalog import load
from crypto_data_ingestion_script_spark.registry import load_all


def test_unknown_table_raises_keyerror(spark, sf_dir):
    t = load(spark, sf_dir)
    with pytest.raises((KeyError, AttributeError)):
        _ = t.no_such_table


def test_missing_sf_dir_fails_loudly(spark):
    from pyspark.errors import AnalysisException

    specs = load_all()
    with pytest.raises(AnalysisException):
        specs["q_tpch_q6"].fn(spark, "/root/testdata/sf_nonexistent").collect()


def test_foreign_session_timezone_does_not_skew_results(spark, sf_dir):
    """The driver owns its session and may sit in any timezone; every
    registered query re-pins UTC at call time, so results must be
    identical under a hostile TZ."""
    specs = load_all()
    baseline = sorted(map(str, specs["q_ohlc_hourly"].fn(spark, sf_dir).collect()))
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        shifted = sorted(map(str, specs["q_ohlc_hourly"].fn(spark, sf_dir).collect()))
    finally:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    assert shifted == baseline


def test_corrupt_file_quarantine_via_ignore_corrupt(spark, sf_dir):
    """Operational reality at 100 TB: some file in the lake WILL be
    truncated or garbage. Default behavior must fail loudly (silent data
    loss is worse than an error); flipping
    spark.sql.files.ignoreCorruptFiles must read through, losing exactly
    the bad file's rows — the per-file quarantine contract that pairs
    with the q_file_metadata lineage projection."""
    import os
    import shutil
    import tempfile

    import pytest

    from crypto_data_ingestion_script_spark.catalog import load

    lake = tempfile.mkdtemp(prefix="corrupt_lake_")
    good = load(spark, sf_dir).events.select("event_id", "event_type", "value")
    n_good = good.count()
    good.coalesce(2).write.mode("overwrite").parquet(lake)
    with open(os.path.join(lake, "part-junk.parquet"), "wb") as f:
        f.write(b"PAR1 this is not a real parquet footer")

    strict = spark.read.schema("event_id bigint, event_type string, value double")
    with pytest.raises(Exception):
        strict.parquet(lake).count()

    prev = spark.conf.get("spark.sql.files.ignoreCorruptFiles", "false")
    spark.conf.set("spark.sql.files.ignoreCorruptFiles", "true")
    try:
        survived = (
            spark.read.schema("event_id bigint, event_type string, value double")
            .parquet(lake)
            .count()
        )
    finally:
        spark.conf.set("spark.sql.files.ignoreCorruptFiles", prev)
        shutil.rmtree(lake, ignore_errors=True)
    assert survived == n_good, (survived, n_good)
