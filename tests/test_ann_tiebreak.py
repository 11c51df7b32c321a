"""ANN k-boundary tie-break regression (round-6, VERDICT r5 task 1).

The one-scan ANN queries build the exact top-5 from per-Arrow-batch
partials. A partial selected with plain ``np.argsort(-sims)`` breaks ties
by in-batch row position, so with duplicate embeddings at the k-boundary
(guaranteed in replicated benchdata) the surviving cand_id could depend on
Arrow batch boundaries and diverge from the deterministic oracle's
(cos_sim desc, cand_id asc) order. `_topk_partial` carries the global
tie-break into every batch, making each partial a superset of the global
top-k's members from that batch.
"""

from __future__ import annotations

import os

import numpy as np
import pytest

from crypto_data_ingestion_script_spark.llm.similarity import _topk_partial


def test_topk_partial_breaks_ties_by_min_id():
    """All-equal sims: the partial must keep the SMALLEST cand_ids (the
    global window's tie-break), not the first rows argsort happens to
    emit. ids descend so row order and id order conflict."""
    sims = np.zeros((10, 3))
    ids = np.arange(10)[::-1].copy()  # ids 9..0 in row order
    top = _topk_partial(sims, ids, 5)
    for j in range(3):
        assert sorted(ids[top[:, j]].tolist()) == [0, 1, 2, 3, 4]


def test_topk_partial_boundary_tie_prefers_min_id():
    """Ties only AT the k-boundary: ranks 4..7 share one sim; the two kept
    boundary rows must be the two smallest ids among the tied group."""
    sims = np.array([[1.0], [0.9], [0.8], [0.5], [0.5], [0.5], [0.5], [0.1]])
    ids = np.array([10, 11, 12, 907, 903, 905, 901, 14], dtype="int64")
    top = _topk_partial(sims, ids, 5)
    kept = set(ids[top[:, 0]].tolist())
    assert kept == {10, 11, 12, 901, 903}


def test_topk_partial_superset_of_global_topk():
    """Property: for a random split of rows into batches, the union of
    per-batch partials always contains the global top-k under
    (sim desc, id asc) — the invariant the one-scan queries rely on."""
    rng = np.random.default_rng(11)
    n, p, k = 200, 4, 5
    # coarse grid of sims → many exact ties, including at boundaries
    sims = rng.integers(0, 8, size=(n, p)).astype("float64") / 8.0
    ids = rng.permutation(n).astype("int64")
    global_top = {
        j: set(
            ids[np.lexsort((ids, -sims[:, j]))[:k]].tolist()
        )
        for j in range(p)
    }
    for trial in range(5):
        order = rng.permutation(n)
        cuts = np.sort(rng.choice(np.arange(1, n), size=9, replace=False))
        union: dict[int, set] = {j: set() for j in range(p)}
        for chunk in np.split(order, cuts):
            if len(chunk) == 0:
                continue
            t = _topk_partial(sims[chunk], ids[chunk], min(k, len(chunk)))
            for j in range(p):
                union[j].update(ids[chunk][t[:, j]].tolist())
        for j in range(p):
            assert global_top[j] <= union[j], (trial, j)


@pytest.fixture(scope="module")
def dup_sf_dir(tmp_path_factory):
    """A minimal sf_dir whose embeddings table plants 8 EXACT duplicates of
    every probe vector at scattered ids, so the exact-NN cosine ties at
    1.0 eight ways and the k-boundary tie is live in every batch layout."""
    from crypto_data_ingestion_script_spark.session import build_session

    spark = build_session("crypto-spark-tests")  # shared app, cheap
    rng = np.random.default_rng(3)
    rows = []
    probes = rng.normal(size=(5, 64))
    for i in range(5):
        rows.append((i, [float(x) for x in probes[i]], i % 3))
    # 8 exact copies of each probe: expected NN = min id = 100 + i
    for rep in range(1, 9):
        for i in range(5):
            rows.append(
                (rep * 100 + i, [float(x) for x in probes[i]], i % 3)
            )
    for j, v in enumerate(rng.normal(size=(60, 64))):
        rows.append((5000 + j, [float(x) for x in v], j % 3))
    df = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>, label int"
    )
    d = tmp_path_factory.mktemp("dup_sf")
    df.repartition(6).write.parquet(os.path.join(str(d), "embeddings.parquet"))
    return str(d)


@pytest.mark.parametrize("qname", ["q_ann_lsh", "q_ann_ivf"])
@pytest.mark.parametrize("batch_size", ["7", "64"])
def test_ann_exact_nn_deterministic_under_duplicates(
    spark, dup_sf_dir, qname, batch_size
):
    """End-to-end: with 8-way duplicate embeddings and adversarially small
    Arrow batches (ties split across batches AND ≥6 ties inside one), both
    ANN queries must report the deterministic exact NN — the minimum
    cand_id among the cos=1.0 duplicates — exactly as the DuckDB oracle
    orders it."""
    from crypto_data_ingestion_script_spark.registry import load_all

    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    old = spark.conf.get(key, None)
    spark.conf.set(key, batch_size)
    try:
        rows = {
            r["q_id"]: r
            for r in load_all()[qname].fn(spark, dup_sf_dir).collect()
        }
    finally:
        if old is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, old)
    assert set(rows) == {0, 1, 2, 3, 4}
    for i in range(5):
        assert rows[i]["exact_nn_id"] == 100 + i, (qname, rows[i])
        assert rows[i]["exact_nn_sim"] == pytest.approx(1.0, abs=1e-8)
