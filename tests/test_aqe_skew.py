"""AQE skew-join splitting: the runtime half of the skew story (operators/
skew.py is the explicit salting half). With a hot key owning ~80% of the
fact side, AQE must detect the oversized reduce partition at stage
boundary and split it across multiple tasks — no query rewrite, no salt.
Thresholds are scaled down to fire at test size; at production scale the
defaults (256 MB) play the same role."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from crypto_data_ingestion_script_spark.plans.explain import simple_plan

SKEW_CONFS = {
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8kb",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "8kb",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2.0",
}


@pytest.fixture()
def skew_confs(spark):
    saved = {}
    for k, v in SKEW_CONFS.items():
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
        spark.conf.set(k, v)
    yield
    for k, v in saved.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def test_aqe_splits_skewed_join_partition(spark, sf_dir, skew_confs):
    # 80% of lineitem lands on key 0; repartition(16) upstream gives the
    # shuffle multiple map blocks, the granularity AQE splits at (a
    # single-mapper shuffle is one indivisible block — nothing to split).
    li = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select("l_orderkey", "l_quantity")
        .repartition(16)
    )
    left = li.withColumn(
        "k",
        F.when(F.pmod("l_orderkey", 10) < 8, F.lit(0)).otherwise(
            F.pmod("l_orderkey", 100)
        ),
    )
    right = (
        spark.range(0, 100)
        .withColumnRenamed("id", "k")
        .withColumn("lbl", F.concat(F.lit("g"), F.col("k")))
    )
    j = left.join(right, "k")
    # collect() on j itself: the skew handling only exists in THIS
    # DataFrame's executed QueryExecution (count() would plan a new one).
    rows = len(j.collect())
    assert rows == left.count(), "inner join must keep every fact row"
    plan = simple_plan(j)
    assert "skew=true" in plan, "AQE did not mark the join as skew-handled"
    assert "skewed" in plan, "no AQEShuffleRead skew split in the final plan"
