"""Concurrent query execution on one SparkSession: a real engine serves
many clients — N registered queries running on worker threads must return
exactly what they return sequentially (no conf cross-talk, no temp-view
collisions, no catalog races). The FAIR scheduler pool is how a shared
cluster keeps small queries from starving behind big ones."""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor

from crypto_data_ingestion_script_spark.registry import load_all

NAMES = ["q_tpch_q1", "q_rank", "q_wordcount", "q_join_inner", "q_moving_avg"]


def test_concurrent_queries_match_sequential(spark, sf_dir):
    specs = load_all()

    def run(name):
        df = specs[name].fn(spark, sf_dir)
        return sorted(map(str, df.collect()))

    sequential = {n: run(n) for n in NAMES}
    with ThreadPoolExecutor(max_workers=len(NAMES)) as pool:
        futures = {n: pool.submit(run, n) for n in NAMES}
        concurrent = {n: f.result() for n, f in futures.items()}
    for n in NAMES:
        assert concurrent[n] == sequential[n], f"{n} differs under concurrency"
