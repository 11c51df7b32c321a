"""JDBC edge construction tests — no driver jar/database in this container,
so validate configuration up to (not including) the connection."""

from __future__ import annotations

from crypto_data_ingestion_script_spark.catalog import load
from crypto_data_ingestion_script_spark.sources.jdbc import jdbc_reader, jdbc_writer


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
