"""Cache/persist reuse: a materialized intermediate must actually be
served from the in-memory columnar cache on reuse (InMemoryTableScan in
the plan), and unpersist must release it. At scale this is the difference
between re-scanning a 100 TB input per downstream branch and scanning it
once for N branches."""

from __future__ import annotations

from pyspark.sql import functions as F

from crypto_data_ingestion_script_spark.catalog import load
from crypto_data_ingestion_script_spark.plans.explain import formatted_plan


def test_cached_branch_reuses_in_memory_scan(spark, sf_dir):
    t = load(spark, sf_dir)
    base = (
        t.events.filter(F.col("value") > 0)
        .select("event_type", "value")
        .cache()
    )
    try:
        base.count()  # materialize
        branch_a = base.groupBy("event_type").agg(F.avg("value").alias("a"))
        branch_b = base.agg(F.sum("value").alias("s"))
        assert "InMemoryTableScan" in formatted_plan(branch_a)
        assert "InMemoryTableScan" in formatted_plan(branch_b)
        # correctness unaffected by the cache
        assert branch_b.collect()[0]["s"] is not None
    finally:
        base.unpersist()
    assert "InMemoryTableScan" not in formatted_plan(
        base.groupBy("event_type").count()
    )
