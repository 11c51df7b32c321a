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


def upsert_sql(
    table: str,
    key_cols: list[str],
    set_cols: list[str],
    staging: str,
    dialect: str = "postgresql",
) -> str:
    """Dialect upsert DML for the reference's PK contract: the PG table
    declares PRIMARY KEY (date, hour, symbol) (dataCollector.py:73) and the
    reference plain-INSERTs into it (dataCollector.py:140-163) — so a crash
    between flush and state-clear re-inserts the same hour on restart and
    the whole batch dies on the PK violation (SURVEY §7.4.3). The durable
    fix is upsert-by-key: stage the batch (jdbc_writer → ``staging``), then
    run ONE set-based statement inside the database.

    ``postgresql``: ``INSERT ... ON CONFLICT (keys) DO UPDATE`` — the PG
    idiom (no PG server/jar in this container, so this text is golden-
    tested; tests/test_jdbc.py executes the ``ansi`` twin against embedded
    Derby, which enforces a real PK and proves re-run idempotency).
    ``ansi``: standard ``MERGE INTO`` (Derby, Oracle, MSSQL, DB2…).
    """
    # Quote every column: Spark's JDBC writer creates staging tables with
    # quoted (case-preserved) identifiers, so unquoted references would be
    # case-folded by the database (Derby upcases, PG downcases) and miss.
    q = lambda c: f'"{c}"'
    keys = ", ".join(q(c) for c in key_cols)
    cols = key_cols + set_cols
    col_list = ", ".join(q(c) for c in cols)
    if dialect == "postgresql":
        updates = ", ".join(f"{q(c)} = EXCLUDED.{q(c)}" for c in set_cols)
        return (
            f"INSERT INTO {table} ({col_list}) "
            f"SELECT {col_list} FROM {staging} "
            f"ON CONFLICT ({keys}) DO UPDATE SET {updates}"
        )
    if dialect == "ansi":
        on = " AND ".join(f"t.{q(c)} = s.{q(c)}" for c in key_cols)
        updates = ", ".join(f"t.{q(c)} = s.{q(c)}" for c in set_cols)
        inserts = ", ".join(f"s.{q(c)}" for c in cols)
        return (
            f"MERGE INTO {table} t USING {staging} s ON {on} "
            f"WHEN MATCHED THEN UPDATE SET {updates} "
            f"WHEN NOT MATCHED THEN INSERT ({col_list}) VALUES ({inserts})"
        )
    raise ValueError(f"unknown dialect {dialect!r}")


def jdbc_upsert(
    df: DataFrame,
    url: str,
    table: str,
    key_cols: list[str],
    staging: str | None = None,
    dialect: str = "postgresql",
    driver: str | None = None,
    batchsize: int = 10_000,
    **writer_options: str,
) -> str:
    """Executed upsert: batched parallel write of ``df`` into a staging
    table, then one set-based dialect MERGE/ON-CONFLICT statement moving
    staging → target inside the database. Data flows executor-parallel
    through the normal JDBC writer; only the single DML *statement* runs
    from the driver (metadata-scale — the rows never pass through it), so
    the pattern holds at any batch size. Returns the DML it executed."""
    staging = staging or f"{table}_staging"
    opts = dict(writer_options)
    if driver:
        opts["driver"] = driver
    jdbc_writer(
        df, url=url, table=staging, mode="overwrite", batchsize=batchsize, **opts
    ).save()
    set_cols = [c for c in df.columns if c not in key_cols]
    dml = upsert_sql(table, key_cols, set_cols, staging, dialect)
    spark = df.sparkSession
    jvm = spark._jvm
    if driver:
        jvm.java.lang.Class.forName(driver)
    conn = jvm.java.sql.DriverManager.getConnection(url)
    try:
        stmt = conn.createStatement()
        stmt.executeUpdate(dml)
        stmt.close()
    finally:
        conn.close()
    return dml
