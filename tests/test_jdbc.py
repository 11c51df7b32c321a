"""JDBC edge construction tests — no driver jar/database in this container,
so validate configuration up to (not including) the connection."""

from __future__ import annotations

from crypto_data_ingestion_script_spark.catalog import load
from crypto_data_ingestion_script_spark.sources.jdbc import (
    jdbc_reader,
    jdbc_upsert,
    jdbc_writer,
    upsert_sql,
)


def test_jdbc_reader_partitioned_options(spark):
    r = jdbc_reader(
        spark,
        url="jdbc:postgresql://db:5432/prices",
        table="downsampled_prices",
        partition_column="hour",
        lower_bound=0,
        upper_bound=23,
        num_partitions=8,
        fetchsize="5000",
    )
    opts = r.applied_options
    assert opts["partitionColumn"] == "hour"
    assert opts["numPartitions"] == "8"
    assert opts["fetchsize"] == "5000"


def test_jdbc_writer_batched(spark, sf_dir):
    t = load(spark, sf_dir)
    w = jdbc_writer(
        t.events.limit(1), url="jdbc:postgresql://db:5432/prices", batchsize=2500
    )
    opts = w.applied_options
    assert opts["batchsize"] == "2500"
    assert opts["dbtable"] == "downsampled_prices"


def test_jdbc_roundtrip_embedded_derby(spark, sf_dir, tmp_path):
    """Executed end-to-end JDBC round-trip: Derby ships on Spark's
    classpath (the Hive-metastore dependency), so an embedded
    ``jdbc:derby`` database exercises the real writer → reader path —
    batched parallel INSERTs out, full scan back, values compared —
    with no external server or extra jar."""
    from pyspark.sql import functions as F

    url = f"jdbc:derby:{tmp_path}/jdbc_rt;create=true"
    driver = "org.apache.derby.jdbc.EmbeddedDriver"
    t = load(spark, sf_dir)
    out = t.events.select(
        "event_id", "event_type", F.col("value").cast("double").alias("value")
    ).limit(500)
    jdbc_writer(
        out, url=url, table="events_rt", mode="overwrite", driver=driver
    ).save()
    back = jdbc_reader(spark, url=url, table="events_rt", driver=driver).load()
    a = sorted((r["event_id"], r["event_type"], round(r["value"], 6))
               for r in out.collect())
    b = sorted((r["event_id"], r["event_type"], round(r["value"], 6))
               for r in back.collect())
    assert a == b and len(a) == 500


def test_pg_upsert_sql_text():
    """PG-dialect golden test (no PG server/jar in this container — the
    documented waiver; the executable twin runs below on Derby): the
    ON CONFLICT text implements the reference's PK contract
    (dataCollector.py:73) as an idempotent set-based upsert."""
    dml = upsert_sql(
        "downsampled_prices",
        key_cols=["bar_date", "bar_hour", "symbol"],
        set_cols=["open_price", "close_price"],
        staging="downsampled_prices_staging",
        dialect="postgresql",
    )
    assert dml == (
        'INSERT INTO downsampled_prices '
        '("bar_date", "bar_hour", "symbol", "open_price", "close_price") '
        'SELECT "bar_date", "bar_hour", "symbol", "open_price", "close_price" '
        'FROM downsampled_prices_staging '
        'ON CONFLICT ("bar_date", "bar_hour", "symbol") '
        'DO UPDATE SET "open_price" = EXCLUDED."open_price", '
        '"close_price" = EXCLUDED."close_price"'
    )


def test_jdbc_upsert_idempotent_on_real_pk(spark, sf_dir, tmp_path):
    """Executed dialect-level proof of the restart-duplicate fix (SURVEY
    §7.4.3): a REAL primary key in an embedded Derby database, the batch
    staged through the executor-parallel JDBC writer, and the ANSI MERGE
    twin of the PG ON CONFLICT statement run twice. The reference's plain
    INSERT would abort the whole second batch on the PK violation; the
    upsert leaves the row count unchanged and applies the new values."""
    from pyspark.sql import functions as F

    url = f"jdbc:derby:{tmp_path}/upsert_db;create=true"
    driver = "org.apache.derby.jdbc.EmbeddedDriver"
    jvm = spark._jvm
    conn = jvm.java.sql.DriverManager.getConnection(url)
    stmt = conn.createStatement()
    stmt.executeUpdate(
        'CREATE TABLE bars ("sym" VARCHAR(16) NOT NULL, '
        '"hr" INT NOT NULL, "px" DOUBLE, PRIMARY KEY ("sym", "hr"))'
    )
    stmt.close()
    conn.close()

    t = load(spark, sf_dir)
    batch = (
        t.events.groupBy(F.col("event_type").alias("sym"))
        .agg(
            F.lit(12).alias("hr"),
            F.round(F.avg("value"), 6).alias("px"),
        )
        .select("sym", "hr", "px")
    )
    # string cols must stage as VARCHAR (Spark's Derby default is CLOB,
    # which Derby can't compare against the target's VARCHAR key)
    col_types = {"createTableColumnTypes": "sym VARCHAR(16)"}
    dml = jdbc_upsert(
        batch, url=url, table="bars", key_cols=["sym", "hr"],
        dialect="ansi", driver=driver, **col_types,
    )
    assert "MERGE INTO bars" in dml
    # restart-replay: same bars again with shifted values -> must NOT
    # duplicate (PK would reject plain INSERT) and must take new values
    jdbc_upsert(
        batch.withColumn("px", F.col("px") + 1.0),
        url=url, table="bars", key_cols=["sym", "hr"],
        dialect="ansi", driver=driver, **col_types,
    )
    back = jdbc_reader(spark, url=url, table="bars", driver=driver).load()
    n_types = batch.count()
    rows = {(r["sym"], r["hr"]): r["px"] for r in back.collect()}
    expect = {(r["sym"], r["hr"]): round(r["px"] + 1.0, 6)
              for r in batch.collect()}
    assert len(rows) == n_types
    assert {k: round(v, 6) for k, v in rows.items()} == expect
