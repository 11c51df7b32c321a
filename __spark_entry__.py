"""Driver contract for the spark-graft builder (PySpark target).

Thin façade over ``crypto_data_ingestion_script_spark.registry`` — every
declared query from SURVEY.md §2 registers itself there with its Spark
callable and (where SQL-expressible) its DuckDB oracle SQL.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from crypto_data_ingestion_script_spark.registry import load_all

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (q_ohlc_hourly) on sf0.001: hourly OHLC bars over the
    events stream — the reference's core computation
    (/root/reference/dataCollector.py:80-94,140-163,186-191) as one
    declarative Spark aggregation."""
    specs = load_all()
    return specs["q_ohlc_hourly"].fn(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.fn for name, spec in load_all().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every registered query — all of them:
    approximate/engine-specific ops emit exact-twin values plus in-engine
    tolerance verdicts, so their oracles are exact too."""
    return {
        name: spec.oracle
        for name, spec in load_all().items()
        if spec.oracle is not None
    }
