"""JDBC source/sink (SURVEY §2.A) — the reference's PostgreSQL role
(/root/reference/dataCollector.py:32-38 connect; :140-163 hourly INSERTs).

The engine's durable store is the parquet silver table (ingest.py); JDBC is
the interchange edge for systems that still want the reference's
PostgreSQL-shaped output. Spark's JDBC DataFrame reader/writer gives
predicate pushdown into the remote database (``pushDownPredicate``, on by
default) and partitioned parallel reads via (partitionColumn, lowerBound,
upperBound, numPartitions) — the knobs that matter when the remote table is
large.

No external database runs in this container, but Derby (on Spark's
classpath as the Hive-metastore dependency) provides an embedded JDBC
target: tests/test_jdbc.py executes a full writer → reader round-trip
against ``jdbc:derby:`` alongside the construction-level option tests for
the PostgreSQL-shaped deployment path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

#: Reference PG DDL parity (dataCollector.py:62-75): the silver bar schema.
SILVER_JDBC_TABLE = "downsampled_prices"


def jdbc_reader(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int = 8,
    **options: str,
):
    """Configured parallel JDBC reader. With a partition column, Spark
    issues ``numPartitions`` range-bounded queries concurrently instead of
    one full-table scan through a single connection."""
    opts: dict[str, str] = {"url": url, "dbtable": table}
    if partition_column is not None:
        opts.update(
            partitionColumn=partition_column,
            lowerBound=str(lower_bound),
            upperBound=str(upper_bound),
            numPartitions=str(num_partitions),
        )
    opts.update(options)
    reader = spark.read.format("jdbc").options(**opts)
    reader.applied_options = dict(opts)  # introspection hook (options live JVM-side)
    return reader


def jdbc_writer(
    df: DataFrame,
    url: str,
    table: str = SILVER_JDBC_TABLE,
    mode: str = "append",
    batchsize: int = 10_000,
    **options: str,
):
    """Configured JDBC writer: batched inserts (the reference's hourly bulk
    INSERT pattern, dataCollector.py:140-163, generalized), executor-parallel
    — one connection per partition, ``batchsize`` rows per round trip."""
    opts: dict[str, str] = {"url": url, "dbtable": table, "batchsize": str(batchsize)}
    opts.update(options)
    writer = df.write.format("jdbc").options(**opts).mode(mode)
    writer.applied_options = dict(opts)  # introspection hook (options live JVM-side)
    return writer
