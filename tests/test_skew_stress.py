"""Skew bounds, pinned on measured runtime metrics (VERDICT r8 task 3):

- q_domain_cap's WindowGroupLimit partial top-k must bound the rows that
  CROSS the window exchange to <= n_maps x cap x n_domains even when one
  mega-domain owns ~30% of the corpus — measured via the executed plan's
  shuffleRecordsWritten (plans/metrics.py), A/B'd against the same query
  with InferWindowGroupLimit excluded (which ships every row).
- salted_join must flatten the hot key's reduce-side funnel: with one
  key owning ~30% of the fact side, the max join-output partition drops
  by >= 3x vs the naive sort-merge join, with identical result rows.

The sf1-scale REST-measured twin of these pins (per-task max/median
shuffle-read records from the scheduler's own accounting) is
scripts/skew_stress.py -> SKEW_r09.json.
"""
from __future__ import annotations

import pytest
from pyspark.sql import Window, functions as F

from crypto_data_ingestion_script_spark.operators.skew import salted_join
from crypto_data_ingestion_script_spark.plans.metrics import (
    exchange_records_written,
    rows_per_output_partition,
)

N_DOCS = 20_000
N_MAPS = 8
CAP = 15
N_DOMAINS = 101  # megadomain + d0..d99


@pytest.fixture()
def skewed_docs(spark):
    # ~30% of rows in one mega-domain, rest spread over 100 domains.
    return (
        spark.range(N_DOCS)
        .repartition(N_MAPS)
        .withColumn(
            "source",
            F.when(F.pmod(F.xxhash64("id"), 10) < 3, F.lit("megadomain")).otherwise(
                F.concat(F.lit("d"), F.pmod(F.xxhash64("id", F.lit(1)), 100))
            ),
        )
        .withColumnRenamed("id", "doc_id")
        .localCheckpoint()  # freeze the 8-way layout; pin maps count
    )


def _capped(docs):
    w = Window.partitionBy("source").orderBy(
        F.md5(F.encode(F.col("doc_id").cast("string"), "UTF-8")), "doc_id"
    )
    return (
        docs.withColumn("keep_rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("keep_rank") <= CAP)
    )


def test_window_group_limit_bounds_exchange_rows(spark, skewed_docs):
    guarded = _capped(skewed_docs)
    # NB: metrics live on the plan that RAN — collect() this DataFrame
    # itself (a count() would execute a different, pruned plan and leave
    # these metrics at zero).
    n_guarded = len(guarded.collect())
    shipped_guarded = exchange_records_written(guarded)[0]

    saved = None
    try:
        saved = spark.conf.get("spark.sql.optimizer.excludedRules")
    except Exception:
        pass
    spark.conf.set(
        "spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferWindowGroupLimit",
    )
    try:
        naive = _capped(skewed_docs)
        n_naive = len(naive.collect())
        shipped_naive = exchange_records_written(naive)[0]
    finally:
        if saved is None:
            spark.conf.unset("spark.sql.optimizer.excludedRules")
        else:
            spark.conf.set("spark.sql.optimizer.excludedRules", saved)

    assert n_guarded == n_naive  # the cut is result-invisible
    # Naive ships the corpus (mega-domain's ~30% funnels to ONE task).
    assert shipped_naive == N_DOCS
    # Partial top-k bound: each map ships <= CAP rows per domain it sees
    # — the mega-domain's ~6000 rows cross as <= N_MAPS x CAP = 120 (the
    # tail domains, at ~140 rows each, ship most of theirs; the bound is
    # per-domain, and it is the hot domain it exists to cut).
    assert shipped_guarded <= N_MAPS * CAP * N_DOMAINS
    assert shipped_guarded < shipped_naive


def test_salted_join_flattens_hot_key(spark):
    n_orders, n_keys = 50_000, 200
    orders = (
        spark.range(n_orders)
        .select(
            F.col("id").alias("o_orderkey"),
            F.when(F.pmod(F.xxhash64("id"), 10) < 3, F.lit(7))
            .otherwise(F.pmod(F.xxhash64("id", F.lit(2)), n_keys))
            .alias("c_custkey"),
        )
        .localCheckpoint()
    )
    dim = spark.range(n_keys).select(
        F.col("id").alias("c_custkey"),
        F.concat(F.lit("c"), F.col("id")).alias("c_name"),
    )
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.enabled": "false",
        # keep reduce partitions 1:1 with shuffle partitions so the
        # per-partition row counts observe the funnel, not AQE's coalesce
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
    }
    saved = {}
    for k, v in confs.items():
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
        spark.conf.set(k, v)
    try:
        naive = orders.join(dim, "c_custkey")
        salted = salted_join(
            orders, dim, key="c_custkey", salt_on=F.col("o_orderkey"), n_salts=8
        )
        assert naive.count() == salted.count() == n_orders
        naive_parts = rows_per_output_partition(naive)
        salted_parts = rows_per_output_partition(salted)
    finally:
        for k, v in saved.items():
            spark.conf.unset(k) if v is None else spark.conf.set(k, v)

    # The hot key funnels ~30% of the fact side into one naive task...
    assert naive_parts[0] >= 0.25 * n_orders
    # ...and salting spreads that task across n_salts reduce partitions.
    assert salted_parts[0] <= naive_parts[0] / 3
