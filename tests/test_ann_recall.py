"""ANN quality gate: the LSH path is only a valid 'scale twin' of the exact
brute-force cosine search if buckets actually group similar vectors. Recall
is measured against ground truth from the exact pairwise computation —
a structurally-broken bucketing (e.g. degenerate hyperplanes putting all
vectors in one bucket, or scattering true neighbors) fails this even though
q_ann_lsh's rows-only check would stay green."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from crypto_data_ingestion_script_spark.catalog import load
from crypto_data_ingestion_script_spark.llm.similarity import hyperplane_buckets


def test_bucket_distribution_not_degenerate(spark, sf_dir):
    t = load(spark, sf_dir)
    dist = (
        t.embeddings.select(hyperplane_buckets(F.col("embedding")))
        .groupBy("bucket")
        .count()
        .collect()
    )
    n_total = sum(r["count"] for r in dist)
    largest = max(r["count"] for r in dist)
    assert len(dist) >= 32, f"only {len(dist)} of 256 buckets used"
    assert largest < 0.2 * n_total, "one bucket swallowed >=20% of vectors"


def test_ivf_recall_vs_exact(spark, sf_dir):
    """IVF with 3-cell probing must recover most of the exact top-5: on a
    near-random corpus the nearest neighbors are spread (the hard case for
    IVF), so demand recall@5 >= 0.5 — well above the 3/16 cell-mass a
    random probe covers — and exact score agreement on every common pair."""
    from crypto_data_ingestion_script_spark.registry import load_all

    specs = load_all()
    exact = {
        (r["q_id"], r["cand_id"]): r["cos_sim"]
        for r in specs["q_cosine_topk"].fn(spark, sf_dir).collect()
    }
    approx = {
        (r["q_id"], r["cand_id"]): r["cos_sim"]
        for r in specs["q_ann_ivf"].fn(spark, sf_dir).collect()
    }
    hits = set(exact) & set(approx)
    recall = len(hits) / len(exact)
    assert recall >= 0.5, f"IVF recall@5 {recall:.2f}"
    for k in hits:  # scores must agree exactly where both found the pair
        assert abs(exact[k] - approx[k]) < 1e-7, k


def test_lsh_recall_on_planted_neighbors(spark):
    """The driver corpus is near-random (max pairwise cos ~0.51 at sf0.01),
    so recall is measured on planted pairs: 100 base vectors, each with a
    near-duplicate at cos ~0.99 plus 100 decoys. Sign-LSH co-bucket
    probability per plane at cos 0.99 is 1 - angle/pi ≈ 0.955, so ~0.955^8
    ≈ 0.69 for 8 planes — require a conservative 0.4, far above the 1/256
    random-collision rate. Deterministic: fixed numpy seed."""
    rng = np.random.default_rng(7)
    base = rng.normal(size=(100, 64))
    noisy = base + 0.08 * rng.normal(size=base.shape)  # cos ≈ 0.99
    decoys = rng.normal(size=(100, 64))
    rows = []
    for i, v in enumerate(base):
        rows.append((i, [float(x) for x in v]))
    for i, v in enumerate(noisy):
        rows.append((1000 + i, [float(x) for x in v]))
    for i, v in enumerate(decoys):
        rows.append((2000 + i, [float(x) for x in v]))
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    bucketed = {
        r["vec_id"]: r["bucket"]
        for r in df.select("vec_id", hyperplane_buckets(F.col("embedding"))).collect()
    }
    hits = sum(bucketed[i] == bucketed[1000 + i] for i in range(100))
    recall = hits / 100
    assert recall > 0.4, f"planted-pair recall {recall:.2f}"
    # decoys must NOT systematically co-bucket with bases
    false_hits = sum(bucketed[i] == bucketed[2000 + i] for i in range(100))
    assert false_hits < hits / 2, (hits, false_hits)
