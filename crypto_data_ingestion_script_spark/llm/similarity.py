"""Similarity search over embeddings (SURVEY §2.L): brute-force cosine
top-k as the exact baseline, and a hyperplane-LSH bucketed variant as the
scale path.

Embedding arithmetic stays JVM-side via higher-order array lambdas
(zip_with-free indexless fold): float32 inputs are widened to double first,
so products and the sequential sum are bit-identical to the DuckDB oracle's
left-fold — the cosine values hash-match exactly, not approximately.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import query

#: Widening cap for the ANN corpus scans (r13 optimization round): their
#: per-batch work is one numpy matmul (~µs per thousand rows), so below a
#: few MB per task the python-worker dispatch dominates — widening a
#: 0.8 MB scan to 32 tasks measured ~2.4x slower than leaving it narrow
#: (q_ann_lsh, sf0.1, local[32]). 32 MB/task keeps batches large enough
#: to amortize Arrow round-trips; any production-scale input exceeds the
#: cap and gets the full session parallelism as before (and an already
#: well-split scan passes through untouched either way).
ANN_SCAN_BYTES_PER_TASK = 32 << 20


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def _dot(a, b):
    """Sequential left-fold dot product — same association order as the
    oracle's list_reduce, so results are exact, not tolerance-close."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def cosine(a, b):
    return _dot(a, b) / (F.sqrt(_dot(a, a)) * F.sqrt(_dot(b, b)))


#: DuckDB: identical sequential-fold dot product over double-widened lists.
_DOT_SQL = """list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      list_transform(range(1, 65),
                     i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE))),
      (acc, x) -> acc + x)"""


@query(
    "q_cosine_topk",
    oracle=f"""
    WITH q AS (SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings
               WHERE vec_id < 5),
    scored AS (
      SELECT q.q_id, e.vec_id AS cand_id, e.label AS cand_label,
             round({_DOT_SQL.format(a='q.q_emb', b='e.embedding')}
             / (sqrt({_DOT_SQL.format(a='q.q_emb', b='q.q_emb')})
                * sqrt({_DOT_SQL.format(a='e.embedding', b='e.embedding')})), 8)
               AS cos_sim
      FROM q CROSS JOIN embeddings e
      WHERE e.vec_id <> q.q_id
    )
    SELECT q_id, cand_id, cand_label, cos_sim,
           CAST(rn AS BIGINT) AS rn
    FROM (SELECT *, row_number() OVER (PARTITION BY q_id
                                       ORDER BY cos_sim DESC, cand_id) AS rn
          FROM scored)
    WHERE rn <= 5
    """,
    tags=("llm", "similarity"),
)
def q_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-5 for 5 query vectors, Arrow-vectorized: the
    tiny query matrix ships to every executor inside a ``mapInPandas``
    closure (the broadcast-dim pattern); each
    Arrow batch of the corpus scores against ALL queries in one numpy
    matmul. One scan of the big side, no shuffle of it; only the
    (n_queries x n_candidates) scored rows hit the ranking shuffle.

    Per-batch numpy replaces a per-pair interpreted higher-order fold —
    the same semantics at ~100x the throughput on dense vectors; the
    round-to-8 output absorbs summation-order float drift vs the oracle's
    sequential fold. This is the exact baseline; q_ann_lsh is the
    sublinear path.

    The 5-row probe matrix is fetched with a driver-side pyarrow read
    (metadata-scale work — spinning up a Spark job to move 5 rows costs
    more than the read); float32→float64 widening is exact, so the values
    are bit-identical to a collect(). The corpus scan stays distributed."""
    import numpy as np
    import pandas as pd
    from collections.abc import Iterator

    t = load(spark, sf_dir)
    q_ids, Q = _probe_matrix(sf_dir, probe_limit=5, embeddings=t.embeddings)
    q_norms = np.sqrt((Q * Q).sum(axis=1))

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            E = np.stack(pdf["embedding"].to_numpy()).astype("float64")  # (n, d)
            sims = (E @ Q.T) / (
                np.sqrt((E * E).sum(axis=1))[:, None] * q_norms[None, :]
            )  # (n, k)
            n, k = sims.shape
            cand_ids = pdf["vec_id"].to_numpy()
            out = pd.DataFrame(
                {
                    "q_id": np.tile(q_ids, n),
                    "cand_id": np.repeat(cand_ids, k),
                    "cand_label": np.repeat(pdf["label"].to_numpy(), k),
                    "cos_sim": sims.ravel(),
                }
            )
            yield out[out["q_id"] != out["cand_id"]]

    scored = t.embeddings.mapInPandas(
        score, schema="q_id bigint, cand_id bigint, cand_label int, cos_sim double"
    ).withColumn("cos_sim", F.round("cos_sim", 8))
    # Rank on the ROUNDED similarity (the declared output precision), ties
    # by cand_id — the same order the oracle uses, so duplicate embeddings
    # whose BLAS-batched sims differ only in trailing ulps cannot flip the
    # top-5 boundary between engines (knn_classify's established contract).
    w = Window.partitionBy("q_id").orderBy(F.col("cos_sim").desc(), F.col("cand_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rn") <= 5)
    )


def hyperplane_sign_bits(emb_col, n_planes: int = 8, dim: int = 64):
    """Deterministic sign-LSH bits: hyperplane j's component d is a
    hash-derived pseudo-random value in [-1, 1) (xxhash64 of (j, d) — no
    RNG, reproducible across runs/clusters). Returns an array<int> of 0/1
    sign bits, one per plane."""
    def plane_component(j, d):
        return (F.xxhash64(j * 64 + d) % 1000).cast("double") / 1000.0

    def plane_dot(j):
        # fold over dimensions: sum_d emb[d] * r_j[d]
        return F.aggregate(
            F.transform(
                F.sequence(F.lit(0), F.lit(dim - 1)),
                lambda d: F.element_at(emb_col, d + 1).cast("double")
                * plane_component(j, d),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    return F.transform(
        F.sequence(F.lit(0), F.lit(n_planes - 1)),
        lambda j: F.when(plane_dot(j) >= 0, F.lit(1)).otherwise(F.lit(0)),
    )


#: (n_planes, dim) -> numpy plane matrix, evaluated once per process.
_PLANE_CACHE: dict = {}


def _plane_matrix(spark: SparkSession, n_planes: int, dim: int):
    """The SAME xxhash64-derived hyperplane components as
    `hyperplane_sign_bits`, evaluated ONCE on the JVM (a single literal
    row — constant-folded, no table scan) and cached as an
    (n_planes, dim) float64 numpy matrix. Lets the hot path compute all
    sign bits with one numpy matmul per Arrow batch instead of
    n_planes × dim interpreted lambda ops per row, while staying
    bit-identical to the expression form (same hash, same literal
    types). Sign flips from float summation-order differences would need
    |dot| ~ 1e-16 — measure-zero, and the LSH contract is probabilistic
    recall, not exact bits."""
    import numpy as np

    key = (n_planes, dim)
    if key not in _PLANE_CACHE:
        # One transform expression, not n_planes*dim literal columns — a
        # 2048-wide literal array costs seconds of analysis time alone.
        # j*64+d over j<n_planes, d<dim with dim<=64 is exactly the int32
        # sequence the expression form hashes.
        flat = (
            spark.range(1)
            .select(
                F.transform(
                    F.sequence(F.lit(0), F.lit(n_planes - 1)),
                    lambda j: F.transform(
                        F.sequence(F.lit(0), F.lit(dim - 1)),
                        lambda d: (F.xxhash64(j * 64 + d) % 1000).cast(
                            "double"
                        )
                        / 1000.0,
                    ),
                ).alias("p")
            )
            .collect()[0]["p"]
        )
        _PLANE_CACHE[key] = np.array(flat, dtype="float64")
    return _PLANE_CACHE[key]


def hyperplane_buckets(emb_col, n_planes: int = 8, dim: int = 64):
    """Single-table sign-LSH bucket id: the n_planes sign bits packed into
    one bigint (2^n_planes buckets)."""
    return F.aggregate(
        hyperplane_sign_bits(emb_col, n_planes, dim),
        F.lit(0).cast("bigint"),
        lambda acc, b: acc * 2 + b,
    ).alias("bucket")


def _probe_matrix(sf_dir: str, probe_limit: int, embeddings: DataFrame | None = None):
    """Driver-side fetch of the probe vectors (vec_id < probe_limit) as
    (ids, float64 matrix) — metadata-scale work that does not warrant a
    Spark job when the table is a plain local file. Fast path: direct
    pyarrow read (float32→float64 widening is exact, so values match a
    collect() bit-for-bit). When ``sf_dir`` is a non-local URI (s3://,
    hdfs://) or a multi-file layout pyarrow can't resolve the same way,
    falls back to collecting the probe rows through Spark's own filesystem
    layer — identical values either way."""
    import os

    import numpy as np

    pdf = None
    if os.path.isdir(sf_dir):
        try:
            import pyarrow.parquet as pq

            # Predicate pushed into the parquet read (row-group pruning +
            # row-level filter) so the driver never materializes the full
            # corpus — the probe fetch is O(probe_limit) in memory, not
            # O(corpus), matching the Spark fallback's pushed filter.
            tbl = pq.read_table(
                os.path.join(sf_dir, "embeddings.parquet"),
                columns=["vec_id", "embedding"],
                filters=[("vec_id", "<", probe_limit)],
            )
            pdf = tbl.to_pandas()
        except Exception:
            pdf = None  # fall through to the Spark path
    if pdf is None:
        if embeddings is None:
            raise ValueError(
                f"probe fetch: {sf_dir!r} is not a local directory and no "
                "embeddings DataFrame was provided for the Spark fallback"
            )
        pdf = (
            embeddings.select("vec_id", "embedding")
            .filter(F.col("vec_id") < probe_limit)
            .toPandas()
        )
    pdf = pdf[pdf["vec_id"] < probe_limit].sort_values("vec_id")
    q_ids = pdf["vec_id"].to_numpy(dtype="int64")
    Q = np.stack(pdf["embedding"].to_numpy()).astype("float64")
    return q_ids, Q


def _topk_partial(sims, ids, k: int):
    """Within-batch exact top-k row indices per probe column, with the
    GLOBAL tie-break (cos_sim desc, cand_id asc) — the same order the
    downstream window and the DuckDB oracle use. This makes each batch's
    partial a guaranteed superset of the global top-k's members from that
    batch: any row among the global top-k has < k rows ahead of it in
    (sim desc, id asc) order globally, hence < k ahead of it within its
    batch under the SAME order. A plain ``argsort(-sims)`` breaks ties by
    in-batch row position instead, so with duplicate embeddings at the
    k-boundary the surviving cand_id could depend on Arrow batch
    boundaries and diverge from the deterministic oracle.

    ``sims`` is (n, p); ``ids`` is (n,); returns (k, p) row indices."""
    import numpy as np

    p = sims.shape[1]
    top = np.empty((k, p), dtype="int64")
    for j in range(p):
        # lexsort: last key is primary → sort by -sim, ties by id asc.
        top[:, j] = np.lexsort((ids, -sims[:, j]))[:k]
    return top


def _ann_verdict(exact_scored: DataFrame, cand: DataFrame, verdict_col: str
                 ) -> DataFrame:
    """Fold exact top-5 + ANN candidate set into the driver-checkable shape
    (q_id, exact_nn_id, exact_nn_sim, <verdict>): the exact NN row is fully
    oracle-checkable; the verdict asserts recall@5 ≥ 0.2 (≥1 of the exact
    top-5 appears in the candidate set — measured ≥0.4 at both test
    scales, so the bound has 2× margin while still failing a structurally
    broken bucketing)."""
    w = Window.partitionBy("q_id").orderBy(
        F.col("cos_sim").desc(), F.col("cand_id")
    )
    top5 = exact_scored.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= 5
    )
    hits = top5.join(
        cand.withColumn("_hit", F.lit(1)), ["q_id", "cand_id"], "left"
    )
    return hits.groupBy("q_id").agg(
        F.max(F.when(F.col("rn") == 1, F.col("cand_id"))).alias("exact_nn_id"),
        F.max(F.when(F.col("rn") == 1, F.round("cos_sim", 8))).alias(
            "exact_nn_sim"
        ),
        (F.sum(F.coalesce(F.col("_hit"), F.lit(0))) >= 1).alias(verdict_col),
    )


_ANN_ORACLE = f"""
    WITH q AS (SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings
               WHERE vec_id < 5),
    scored AS (
      SELECT q.q_id, e.vec_id AS cand_id,
             round({_DOT_SQL.format(a='q.q_emb', b='e.embedding')}
             / (sqrt({_DOT_SQL.format(a='q.q_emb', b='q.q_emb')})
                * sqrt({_DOT_SQL.format(a='e.embedding', b='e.embedding')})), 8)
               AS cos_sim
      FROM q CROSS JOIN embeddings e
      WHERE e.vec_id <> q.q_id
    )
    SELECT q_id, cand_id AS exact_nn_id, cos_sim AS exact_nn_sim,
           TRUE AS {{verdict}}
    FROM (SELECT *, row_number() OVER (PARTITION BY q_id
                                       ORDER BY cos_sim DESC, cand_id) AS rn
          FROM scored)
    WHERE rn = 1
"""


@query(
    "q_ann_lsh",
    oracle=_ANN_ORACLE.format(verdict="lsh_recall_ok"),
    tags=("llm", "similarity", "approx"),
)
def q_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN at scale: multi-table hyperplane sign-LSH (8 tables × 4 planes —
    the banding trick from MinHash applied to sign bits: a pair is a
    candidate if ANY table's 4-bit signature matches, turning per-table
    recall ~0.2 into ~0.83 overall at NN-level similarity). More tables
    buy recall for linear cost, the knob a 100 TB deployment tunes.

    ONE corpus scan does all the work (round-4 consolidation; the staged
    shape — bits checkpoint, table explode, bucket join, separate exact
    scan — paid ~4 small-stage fixed costs and ran 2.4 s at sf1 against
    a 0.5 s oracle):

    - Probe signatures are computed DRIVER-SIDE in numpy from the cached
      JVM-evaluated plane matrix (`_plane_matrix`); the 4-bit band is
      PACKED into an int (a bijection on band content, zero hash
      collisions). The 5×8 probe signature matrix ships in the scan
      closure — probe-scale state, the same contract as the probe
      matrix itself.
    - Each Arrow batch computes corpus signatures with one matmul and
      matches them against the probe signatures IN NUMPY (any-table
      match), emitting only the actual candidate pairs — no corpus-wide
      signature table, no bucket join, no distinct (a vector lives in
      exactly one batch, so a pair is emitted once). The same batch's
      normalized matmul (q_cosine_topk's kernel) emits each probe's
      within-batch exact top-5 partials; the global top-5 is a subset of
      the union of batch top-5s, so the exact side stays exact — the
      partials carry the global (sim desc, cand_id) tie-break
      (`_topk_partial`) so duplicate embeddings at the k-boundary cannot
      make the survivor depend on Arrow batch boundaries.
    - Downstream is probe-scale only: a window over the exact partials
      and a broadcast-sized join with the candidate pairs.

    At a bucketed-ANN deployment scale the per-batch probe match is the
    map side of the bucket equi-join this query previously spelled out;
    with 5 probes the join's build side is closure-shippable, and past
    closure scale the explicit (tab, sig) equi-join form comes back —
    tests/test_ann_recall.py pins the bucketing semantics either way.

    Driver-checkable output: per probe, the exact NN (id + rounded cosine,
    oracle recomputes both) and a recall verdict — ≥1 of the exact top-5
    must surface in the LSH candidate set (measured ≥0.4 at both test
    scales; bound 0.2)."""
    import numpy as np
    import pandas as pd
    from collections.abc import Iterator

    from ..partitioning import ensure_parallelism

    t = load(spark, sf_dir)
    n_tables, bits = 8, 4
    P = _plane_matrix(spark, n_tables * bits, 64)
    pack = 2 ** np.arange(bits - 1, -1, -1)
    q_ids, Q = _probe_matrix(sf_dir, 5, embeddings=t.embeddings)
    q_norms = np.sqrt((Q * Q).sum(axis=1))
    QS = (Q @ P.T >= 0).reshape(len(q_ids), n_tables, bits) @ pack  # (p, 8)

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            E = np.stack(pdf["embedding"].to_numpy()).astype("float64")
            ids = pdf["vec_id"].to_numpy()
            n = len(ids)
            sigs = (E @ P.T >= 0).reshape(n, n_tables, bits) @ pack
            # any-table signature match against every probe: (n, p)
            hit = (sigs[:, None, :] == QS[None, :, :]).any(axis=2)
            hit &= ids[:, None] != q_ids[None, :]
            ci, cj = np.nonzero(hit)
            sims = (E @ Q.T) / (
                np.sqrt((E * E).sum(axis=1))[:, None] * q_norms[None, :]
            )
            # Round to the declared 8-digit output precision BEFORE the
            # top-k selection: BLAS-batched matmuls give ulp-different
            # values for bit-identical vectors depending on batch shape,
            # so only the rounded value is batch-invariant — the ranking
            # contract is (round(cos,8) desc, cand_id), oracle-matched.
            # Rounding mode: np.round is half-to-even while the DuckDB
            # oracle and F.round are half-away-from-zero; a cosine
            # landing EXACTLY on a decimal half at the 8th digit would
            # rank differently, but float-computed cosines hit exact
            # decimal halves with probability ~0 (measure-zero set), so
            # the modes are interchangeable here in practice.
            sims = np.round(sims, 8)
            sims[ids[:, None] == q_ids[None, :]] = -2.0  # mask self-match
            k = min(5, n)
            top = _topk_partial(sims, ids, k)  # (k, p) row indices
            yield pd.DataFrame(
                {
                    "kind": np.concatenate(
                        [
                            np.zeros(len(ci), dtype="int32"),
                            np.ones(k * len(q_ids), dtype="int32"),
                        ]
                    ),
                    "q_id": np.concatenate(
                        [q_ids[cj], np.repeat(q_ids, k)]
                    ),
                    "cand_id": np.concatenate(
                        [ids[ci], ids[top].ravel(order="F")]
                    ),
                    "sim": np.concatenate(
                        [
                            np.zeros(len(ci)),
                            sims[top, np.arange(len(q_ids))[None, :]].ravel(
                                order="F"
                            ),
                        ]
                    ),
                }
            )

    rows = (
        ensure_parallelism(t.embeddings, bytes_per_task=ANN_SCAN_BYTES_PER_TASK)
        .select("vec_id", "embedding")
        .mapInPandas(
            scan, schema="kind int, q_id bigint, cand_id bigint, sim double"
        )
        .localCheckpoint()  # probe-scale rows; consumed twice below
    )
    cand = rows.filter(F.col("kind") == 0).select("q_id", "cand_id")
    exact = rows.filter(F.col("kind") == 1).select(
        "q_id", "cand_id", F.col("sim").alias("cos_sim")
    )
    return _ann_verdict(exact, cand, "lsh_recall_ok")


def kmeans_centroids(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 16,
    n_iter: int = 5,
    sample_cap: int = 4096,
):
    """Deterministic driver-side Lloyd's k-means on a hash-chosen
    FIXED-SIZE sample — the ``sample_cap`` rows with the smallest
    ``xxhash64(id)`` (a deterministic uniform reservoir; data-dependent
    only, never partitioning-dependent) — with init = first k sample rows
    in id order and a fixed iteration count. Returns the k×d centroid
    matrix (float64); shared by the IVF quantizer (`ivf_assignments`) and
    the cone-blocked exact similarity join (`q_dedup_semantic`).

    The hash-rank LIMIT executes as distributed top-k
    (TakeOrderedAndProject: each partition keeps ≤ sample_cap rows, the
    driver merges), so the collect is O(sample_cap) — constant in corpus
    size, unlike a modulus filter whose sample grows linearly.
    Determinism matters because the cell layout must not depend on
    session parallelism — MLlib's KMeans samples its init from RDD
    partitions, so the same data on a different cluster topology yields
    different cells."""
    import numpy as np

    srows = sorted(
        df.select(id_col, vec_col)
        .orderBy(F.xxhash64(F.col(id_col)), F.col(id_col))
        .limit(sample_cap)
        .collect(),
        key=lambda r: r[id_col],
    )
    S = np.array([r[vec_col] for r in srows], dtype="float64")
    k = min(k, len(S))
    C = S[:k].copy()
    for _ in range(n_iter):
        assign = np.argmin(
            ((S[:, None, :] - C[None, :, :]) ** 2).sum(-1), axis=1
        )
        for c in range(k):
            mask = assign == c
            if mask.any():
                C[c] = S[mask].mean(0)
    return C


def ivf_assignments(
    embeddings: DataFrame, k: int = 16, n_iter: int = 5, sample_cap: int = 4096
):
    """IVF coarse quantizer, fully deterministic: centroids from
    `kmeans_centroids` (driver trains on an O(sample_cap) hash-ranked
    sample). Assignment is a map-side numpy argmin with the k×d centroid
    matrix shipped in the closure — one corpus scan, no shuffle.
    Training the quantizer offline/driver-side on a bounded sample and
    broadcasting centroids is the standard IVF architecture."""
    import numpy as np
    import pandas as pd
    from collections.abc import Iterator

    C = kmeans_centroids(
        embeddings, id_col="vec_id", vec_col="embedding",
        k=k, n_iter=n_iter, sample_cap=sample_cap,
    )

    def assign_cells(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            E = np.stack(pdf["embedding"].to_numpy()).astype("float64")
            pdf = pdf.copy()
            pdf["cell"] = np.argmin(
                ((E[:, None, :] - C[None, :, :]) ** 2).sum(-1), axis=1
            ).astype("int32")
            yield pdf

    assigned = embeddings.mapInPandas(
        assign_cells,
        schema="vec_id bigint, embedding array<float>, label int, cell int",
    )
    return assigned, C


@query(
    "q_ann_ivf",
    oracle=_ANN_ORACLE.format(verdict="ivf_recall_ok"),
    tags=("llm", "similarity", "approx"),
)
def q_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN: deterministic k-means cells (k=16) + 4-cell probing. Query
    vectors probe their 4 nearest centroids and only vectors in those
    cells become candidates — corpus scanned once for assignment, search
    cost |probed cells| not |corpus|. The scale twin of q_cosine_topk
    alongside the LSH path (IVF gives tunable recall via n_probe; LSH
    gives constant-time bucketing).

    ONE corpus scan does all the work (round-4 consolidation, the
    q_ann_lsh design): the k×d centroid matrix and the probes' 4 nearest
    cell ids are computed driver-side (both probe/centroid-scale state,
    shipped in the scan closure); each Arrow batch assigns its vectors to
    cells with one argmin, emits the (probe, vector) pairs whose cell is
    probed, and the same batch's normalized matmul emits each probe's
    within-batch exact top-5 partials (the global top-5 is a subset of
    the union of batch top-5s, so the exact side stays exact; the
    partials carry the global (sim desc, cand_id) tie-break —
    `_topk_partial` — so k-boundary ties are batch-boundary-proof). No
    corpus-wide assignment table, no bucket join, no distinct — a vector
    lives in exactly one batch, so a pair is emitted once. Downstream is
    probe-scale only. At deployment scale the per-batch cell match is the
    map side of the cell equi-join; past closure scale (many probes) the
    explicit broadcast join over `ivf_assignments` comes back —
    tests/test_ann_recall.py pins the bucketing semantics either way.

    Driver-checkable output mirrors q_ann_lsh: per probe the exact NN
    (oracle recomputes it) plus ivf_recall_ok — ≥1 of the exact top-5 in
    the probed cells (measured ≥0.4 at both test scales; bound 0.2)."""
    import numpy as np
    import pandas as pd
    from collections.abc import Iterator

    from ..partitioning import ensure_parallelism

    t = load(spark, sf_dir)
    C = kmeans_centroids(t.embeddings, k=16)
    q_ids, Q = _probe_matrix(sf_dir, 5, embeddings=t.embeddings)
    q_norms = np.sqrt((Q * Q).sum(axis=1))
    # 4 nearest cells per probe (driver-side: k×d matrix, trivially small)
    d2 = ((Q[:, None, :] - C[None, :, :]) ** 2).sum(-1)
    probe_cells = np.argsort(d2, axis=1)[:, :4]  # (p, 4)

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            E = np.stack(pdf["embedding"].to_numpy()).astype("float64")
            ids = pdf["vec_id"].to_numpy()
            cells = np.argmin(
                ((E[:, None, :] - C[None, :, :]) ** 2).sum(-1), axis=1
            )
            # candidate = vector whose cell is among the probe's 4: (n, p)
            hit = (cells[:, None, None] == probe_cells[None, :, :]).any(axis=2)
            hit &= ids[:, None] != q_ids[None, :]
            ci, cj = np.nonzero(hit)
            sims = (E @ Q.T) / (
                np.sqrt((E * E).sum(axis=1))[:, None] * q_norms[None, :]
            )
            # round-before-select: see q_ann_lsh's scan — the rounded
            # value is the only batch-shape-invariant ranking key.
            sims = np.round(sims, 8)
            sims[ids[:, None] == q_ids[None, :]] = -2.0  # mask self-match
            k = min(5, len(ids))
            top = _topk_partial(sims, ids, k)  # (k, p) row indices
            yield pd.DataFrame(
                {
                    "kind": np.concatenate(
                        [
                            np.zeros(len(ci), dtype="int32"),
                            np.ones(k * len(q_ids), dtype="int32"),
                        ]
                    ),
                    "q_id": np.concatenate([q_ids[cj], np.repeat(q_ids, k)]),
                    "cand_id": np.concatenate(
                        [ids[ci], ids[top].ravel(order="F")]
                    ),
                    "sim": np.concatenate(
                        [
                            np.zeros(len(ci)),
                            sims[top, np.arange(len(q_ids))[None, :]].ravel(
                                order="F"
                            ),
                        ]
                    ),
                }
            )

    rows = (
        ensure_parallelism(t.embeddings, bytes_per_task=ANN_SCAN_BYTES_PER_TASK)
        .select("vec_id", "embedding")
        .mapInPandas(
            scan, schema="kind int, q_id bigint, cand_id bigint, sim double"
        )
        .localCheckpoint()  # probe-scale rows; consumed twice below
    )
    cand = rows.filter(F.col("kind") == 0).select("q_id", "cand_id")
    exact = rows.filter(F.col("kind") == 1).select(
        "q_id", "cand_id", F.col("sim").alias("cos_sim")
    )
    return _ann_verdict(exact, cand, "ivf_recall_ok")


@query(
    "q_embed_centroid",
    oracle="""
    WITH idx AS (
      SELECT label, embedding,
             unnest(range(1, len(embedding) + 1)) AS i
      FROM embeddings
    )
    SELECT label, i AS pos, round(avg(embedding[i]), 8) AS centroid_val
    FROM idx
    GROUP BY label, i
    """,
    tags=("llm", "similarity", "agg"),
)
def q_embed_centroid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid of the embedding space in long form
    (label, dimension, mean): posexplode unrolls the vectors and one
    grouped avg reduces them — cardinality #labels × 64, so partial
    aggregation absorbs the fact-side volume map-side. (Re-packing to
    array<double> is a trivial sorted collect_list; the long form is what
    hash-checks, since array columns compare exactly while float scalars
    compare with tolerance.) DuckDB is 1-based on list indexing, so pos
    is emitted 1-based to match."""
    t = load(spark, sf_dir)
    return (
        t.embeddings.select(
            "label", F.posexplode("embedding").alias("pos0", "v")
        )
        .groupBy("label", (F.col("pos0") + 1).alias("pos"))
        .agg(F.round(F.avg("v"), 8).alias("centroid_val"))
    )


@query(
    "q_knn_classify",
    oracle=f"""
    WITH q AS (SELECT vec_id AS q_id, embedding AS q_emb, label AS true_label
               FROM embeddings WHERE vec_id < 25),
    scored AS (
      SELECT q.q_id, q.true_label, e.vec_id AS cand_id, e.label AS cand_label,
             round({_DOT_SQL.format(a='q.q_emb', b='e.embedding')}
             / (sqrt({_DOT_SQL.format(a='q.q_emb', b='q.q_emb')})
                * sqrt({_DOT_SQL.format(a='e.embedding', b='e.embedding')})), 8)
               AS cos_sim
      FROM q CROSS JOIN embeddings e
      WHERE e.vec_id >= 25
    ),
    top5 AS (
      SELECT * FROM (
        SELECT *, row_number() OVER (PARTITION BY q_id
                                     ORDER BY cos_sim DESC, cand_id) AS rn
        FROM scored)
      WHERE rn <= 5
    ),
    votes AS (
      SELECT q_id, true_label, cand_label, count(*) AS n_votes
      FROM top5 GROUP BY q_id, true_label, cand_label
    )
    SELECT q_id, cand_label AS predicted_label, n_votes, true_label,
           cand_label = true_label AS correct
    FROM (SELECT *, row_number() OVER (PARTITION BY q_id
                                       ORDER BY n_votes DESC, cand_label) AS vr
          FROM votes)
    WHERE vr = 1 ORDER BY q_id
    """,
    tags=("llm", "similarity", "classify"),
)
def q_knn_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN label assignment (k=5, cosine): classify the first 25 vectors
    by majority label of their nearest neighbors in the rest of the corpus
    — the weak-labeling / label-propagation primitive of a curation
    pipeline (assign topics to unlabeled docs from their embedded
    neighbors). Same Arrow-batch matmul scan as q_cosine_topk — one pass
    over the corpus, no shuffle of it; ranking happens on the
    (queries x k) scored slice. Neighbor ranking and vote tie-breaks both
    order on ROUNDED similarity then ids, so the top-5 boundary is
    engine-independent; majority ties resolve to the smallest label.
    """
    import numpy as np
    import pandas as pd
    from collections.abc import Iterator

    t = load(spark, sf_dir)
    qrows = (
        t.embeddings.filter(F.col("vec_id") < 25)
        .select("vec_id", "embedding", "label")
        .collect()
    )
    q_ids = np.array([r["vec_id"] for r in qrows], dtype="int64")
    q_labels = {int(r["vec_id"]): int(r["label"]) for r in qrows}
    Q = np.array([r["embedding"] for r in qrows], dtype="float64")
    q_norms = np.sqrt((Q * Q).sum(axis=1))

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf[pdf["vec_id"] >= 25]
            if pdf.empty:
                continue
            E = np.stack(pdf["embedding"].to_numpy()).astype("float64")
            sims = (E @ Q.T) / (
                np.sqrt((E * E).sum(axis=1))[:, None] * q_norms[None, :]
            )
            n, k = sims.shape
            yield pd.DataFrame(
                {
                    "q_id": np.tile(q_ids, n),
                    "cand_id": np.repeat(pdf["vec_id"].to_numpy(), k),
                    "cand_label": np.repeat(pdf["label"].to_numpy(), k),
                    "cos_sim": sims.ravel(),
                }
            )

    scored = t.embeddings.mapInPandas(
        score, schema="q_id bigint, cand_id bigint, cand_label int, cos_sim double"
    ).withColumn("cos_sim", F.round("cos_sim", 8))
    nn_w = Window.partitionBy("q_id").orderBy(
        F.col("cos_sim").desc(), F.col("cand_id")
    )
    top5 = scored.withColumn("rn", F.row_number().over(nn_w)).filter(
        F.col("rn") <= 5
    )
    votes = top5.groupBy("q_id", "cand_label").agg(
        F.count(F.lit(1)).alias("n_votes")
    )
    vote_w = Window.partitionBy("q_id").orderBy(
        F.col("n_votes").desc(), F.col("cand_label")
    )
    truth = spark.createDataFrame(
        [(int(q), int(l)) for q, l in sorted(q_labels.items())],
        "q_id bigint, true_label int",
    )
    return (
        votes.withColumn("vr", F.row_number().over(vote_w))
        .filter(F.col("vr") == 1)
        .join(F.broadcast(truth), "q_id")
        .select(
            "q_id",
            F.col("cand_label").alias("predicted_label"),
            "n_votes",
            "true_label",
            (F.col("cand_label") == F.col("true_label")).alias("correct"),
        )
        .orderBy("q_id")
    )


#: Deterministic k-means: seeds are the K lowest-vec_id embeddings.
KMEANS_K = 8

_SQDIST_SQL = """list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      list_transform(range(1, 65),
        i -> (CAST({a}[i] AS DOUBLE) - CAST({b}[i] AS DOUBLE))
             * (CAST({a}[i] AS DOUBLE) - CAST({b}[i] AS DOUBLE)))),
      (acc, x) -> acc + x)"""


@query(
    "q_kmeans_iter",
    oracle=f"""
    WITH seeds AS (
      SELECT vec_id AS seed_id, embedding AS s
      FROM embeddings ORDER BY vec_id LIMIT {KMEANS_K}
    ),
    scored AS (
      SELECT e.vec_id, e.embedding, seeds.seed_id,
             round({_SQDIST_SQL.format(a='e.embedding', b='seeds.s')}, 8)
               AS dist
      FROM embeddings e CROSS JOIN seeds
    ),
    assigned AS (
      SELECT vec_id, embedding, seed_id FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id
                                     ORDER BY dist, seed_id) AS rn
        FROM scored) WHERE rn = 1
    ),
    long AS (
      SELECT seed_id AS cluster_id, pos,
             CAST(embedding[CAST(pos AS INTEGER)] AS DOUBLE) AS v
      FROM (SELECT seed_id, embedding,
                   unnest(generate_series(1, 64)) AS pos
            FROM assigned)
    )
    SELECT cluster_id, CAST(pos AS INTEGER) AS pos,
           round(avg(v), 6) AS centroid_val,
           CAST(count(*) AS BIGINT) AS n_members
    FROM long GROUP BY 1, 2
    """,
    tags=("llm", "similarity", "iterative"),
)
def q_kmeans_iter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One Lloyd iteration of k-means over the embedding corpus — the
    centroid-training step an IVF index (q_ann_ivf) is built from, made
    deterministic and oracle-checkable: seeds are the {KMEANS_K}
    lowest-vec_id embeddings (no RNG), every vector assigns to the
    nearest seed by squared L2 (distance rounded to 8 decimals with
    seed_id tie-break — the ANN batch-invariance contract, so both
    engines make identical assignments), and the new centroids emit in
    long form (cluster, dimension, mean, member count) like
    q_embed_centroid, because scalar doubles hash-check where float
    arrays would need tolerance. Iterating = re-running with the output
    as seeds; one iteration exercises the whole assign + reduce
    machinery, like q_bpe_merge's single merge round.

    Scale shape: the seed table is K rows — BROADCAST; assignment is a
    map-side cross join + one groupBy(vec_id) keeping the argmin via a
    struct-min aggregate (no fact-scale window sort); the centroid
    reduce is the q_embed_centroid posexplode + grouped avg with
    map-side partials (K × 64 output rows). Per iteration: two
    fact-scale exchanges, nothing driver-side, nothing quadratic."""
    t = load(spark, sf_dir)
    seeds = (
        t.embeddings.orderBy("vec_id")
        .limit(KMEANS_K)
        .select(
            F.col("vec_id").alias("seed_id"),
            _as_double(F.col("embedding")).alias("s"),
        )
    )

    def sqdist(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    emb = t.embeddings.select(
        "vec_id", _as_double(F.col("embedding")).alias("e")
    )
    assigned = (
        emb.crossJoin(F.broadcast(seeds))
        .withColumn("dist", F.round(sqdist(F.col("e"), F.col("s")), 8))
        .groupBy("vec_id")
        .agg(
            F.min(F.struct("dist", "seed_id")).alias("m"),
            F.first("e").alias("e"),
        )
        .select("vec_id", F.col("m.seed_id").alias("cluster_id"), "e")
    )
    return (
        assigned.select(
            "cluster_id", F.posexplode("e").alias("pos0", "v")
        )
        .groupBy("cluster_id", (F.col("pos0") + 1).alias("pos"))
        .agg(
            F.round(F.avg("v"), 6).alias("centroid_val"),
            F.count(F.lit(1)).alias("n_members"),
        )
    )


@query(
    "q_pca_power_iter",
    oracle="""
    WITH c AS (
      SELECT embedding,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list_transform(range(1, 65),
                              i -> CAST(embedding[i] AS DOUBLE))),
               (a, x) -> a + x) / 8.0 AS c
      FROM embeddings
    ),
    longf AS (
      SELECT pos, CAST(embedding[CAST(pos AS INTEGER)] AS DOUBLE) * c AS wc
      FROM (SELECT embedding, c, unnest(generate_series(1, 64)) AS pos
            FROM c)
    ),
    w AS (SELECT pos, sum(wc) AS w FROM longf GROUP BY pos),
    nrm AS (SELECT sqrt(sum(w * w)) AS nrm FROM w)
    SELECT CAST(w.pos AS INTEGER) AS pos,
           round(w.w / nrm.nrm, 6) AS loading,
           round(nrm.nrm, 4) AS rayleigh
    FROM w CROSS JOIN nrm
    """,
    tags=("llm", "similarity", "iterative"),
)
def q_pca_power_iter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One power-iteration step toward the embedding corpus's top
    principal direction — matrix-free: starting from the fixed unit
    vector v0 = 1/8·(1,…,1), compute w = Σ_e e·⟨e, v0⟩ (the Gram-matrix
    product without ever forming the 64×64 covariance, the shape that
    scales to billions of vectors) and emit the normalized loading per
    dimension plus the Rayleigh-quotient estimate ‖w‖. Deterministic:
    the fixed start vector removes the usual random-init sign/direction
    ambiguity, so both engines produce the same loadings (float
    summation-order drift absorbed by rounding + the comparator's double
    tolerance, the q_embed_centroid precedent). Iterating = re-running
    with the output as v0; one step exercises the whole machinery
    (q_kmeans_iter / q_bpe_merge convention).

    Scale shape: ⟨e, v0⟩ is a map-only per-row fold; the reduction is
    ONE posexplode + groupBy(dimension) with map-side partials into 64
    output rows; the norm is a window over that 64-row summary and the
    scalar rides back as a 1-row broadcast crossJoin. One fact-scale
    exchange total, nothing driver-side, no MLlib."""
    t = load(spark, sf_dir)
    e = _as_double(F.col("embedding"))
    c = (
        F.aggregate(e, F.lit(0.0), lambda a, x: a + x) / 8.0
    )  # dot(e, v0), v0 = (1,…,1)/sqrt(64)
    longf = t.embeddings.select(
        c.alias("c"), F.posexplode(e).alias("pos0", "v")
    ).select((F.col("pos0") + 1).alias("pos"), (F.col("v") * F.col("c")).alias("wc"))
    w = longf.groupBy("pos").agg(F.sum("wc").alias("w"))
    nrm = w.agg(F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("nrm"))
    return w.crossJoin(F.broadcast(nrm)).select(
        F.col("pos").cast("int").alias("pos"),
        F.round(F.col("w") / F.col("nrm"), 6).alias("loading"),
        F.round("nrm", 4).alias("rayleigh"),
    )


#: Multi-round Lloyd: enough iterations to move centroids off the seeds
#: and demonstrate the per-iteration checkpoint cadence, small enough to
#: keep the oracle's unrolled CTE chain readable.
KMEANS_ITERS = 3


def _kmeans_multi_oracle() -> str:
    """Unrolled {KMEANS_ITERS}-iteration Lloyd chain in long (vec, dim)
    form: dist_i joins the fact to the previous rounded centroids by
    dimension, asg_i argmins with the (dist, cluster_id) tie-break,
    cent_i re-averages rounded to 6 decimals. Rounding at every
    engine-visible boundary (dist 8dp, centroid 6dp) absorbs float
    summation-order drift so both engines iterate in lockstep."""
    parts = [
        f"""
    WITH longe AS (
      SELECT vec_id, pos, CAST(embedding[CAST(pos AS INTEGER)] AS DOUBLE) AS v
      FROM (SELECT vec_id, embedding, unnest(generate_series(1, 64)) AS pos
            FROM embeddings)
    ),
    cent0 AS (
      SELECT seed_id AS cluster_id, pos,
             CAST(s[CAST(pos AS INTEGER)] AS DOUBLE) AS cv
      FROM (SELECT vec_id AS seed_id, embedding AS s,
                   unnest(generate_series(1, 64)) AS pos
            FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT {KMEANS_K}))
    )"""
    ]
    for i in range(1, KMEANS_ITERS + 1):
        parts.append(f""",
    dist{i} AS (
      SELECT l.vec_id, c.cluster_id,
             round(sum((l.v - c.cv) * (l.v - c.cv)), 8) AS dist
      FROM longe l JOIN cent{i - 1} c USING (pos)
      GROUP BY l.vec_id, c.cluster_id
    ),
    asg{i} AS (
      SELECT vec_id, cluster_id FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id
                                     ORDER BY dist, cluster_id) AS rn
        FROM dist{i}) WHERE rn = 1
    ),
    cent{i} AS (
      SELECT a.cluster_id, l.pos, round(avg(l.v), 6) AS cv,
             CAST(count(*) AS BIGINT) AS n_members
      FROM asg{i} a JOIN longe l USING (vec_id)
      GROUP BY a.cluster_id, l.pos
    )""")
    parts.append(f"""
    SELECT cluster_id, CAST(pos AS INTEGER) AS pos, cv AS centroid_val,
           n_members
    FROM cent{KMEANS_ITERS}
    """)
    return "".join(parts)


@query(
    "q_kmeans_multi",
    oracle=_kmeans_multi_oracle(),
    tags=("llm", "similarity", "iterative"),
)
def q_kmeans_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """{KMEANS_ITERS} full Lloyd iterations of k-means — q_kmeans_iter
    driven to convergence-shape: each round re-assigns every vector to
    the nearest CURRENT centroid (rounded-L2 8dp + cluster_id tie-break,
    the engine-lockstep contract) and re-averages centroids rounded to
    6dp, so both engines follow the identical trajectory and the oracle
    unrolls the same chain as CTEs. Emits the final long-form centroids
    with member counts.

    Scale shape — the iterative-operator checkpoint cadence
    (connected_components lesson, SKILL.md r3): each round's centroid
    table (K rows after the array re-assembly) is localCheckpoint'ed, so
    round i's plan starts from a materialized K-row table instead of
    re-deriving rounds 1..i-1's fact-scale assignment lineage inside
    every stage; the checkpoint is summary-scale (K×64 doubles), never
    the fact. Per round (single-exchange form, r10): the K centroids
    ride as ONE broadcast row holding array<struct<cluster_id, c>>, the
    nearest-centroid argmin is a map-side array_min over that array —
    no K-way row explosion, no groupBy(vec_id) exchange dragging the
    64-double vectors through a shuffle — and the only fact-scale
    exchange left is the posexplode reduce into (cluster_id, pos) grain.
    1 fact exchange × {KMEANS_ITERS} rounds, nothing driver-side."""
    t = load(spark, sf_dir)
    emb = t.embeddings.select(
        "vec_id", _as_double(F.col("embedding")).alias("e")
    )
    cent = (
        t.embeddings.orderBy("vec_id")
        .limit(KMEANS_K)
        .select(
            F.col("vec_id").alias("cluster_id"),
            _as_double(F.col("embedding")).alias("c"),
        )
    )
    return kmeans_lloyd(emb, cent, KMEANS_ITERS)


def kmeans_lloyd(emb: DataFrame, cent: DataFrame, iters: int) -> DataFrame:
    """Composable Lloyd loop over ``emb(vec_id, e: array<double>)`` with
    initial centroids ``cent(cluster_id, c: array<double>)`` — the body
    of :func:`q_kmeans_multi` (semantics + scale notes there); exposed so
    tests can pin convergence on a toy corpus with chosen seeds."""

    def sqdist(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    last_long = None
    for _ in range(iters):
        # K centroids as ONE broadcast row: the per-vector argmin is a
        # map-side array_min over array<struct<dist, cluster_id>> (struct
        # ordering = (dist, cluster_id), the same tie-break as
        # min(struct(...))) — no N×K row explosion, no vec_id exchange.
        cent_arr = cent.agg(
            F.collect_list(F.struct("cluster_id", "c")).alias("ca")
        )
        assigned = emb.crossJoin(F.broadcast(cent_arr)).select(
            F.array_min(
                F.transform(
                    "ca",
                    lambda s: F.struct(
                        F.round(sqdist(F.col("e"), s["c"]), 8).alias("dist"),
                        s["cluster_id"].alias("cluster_id"),
                    ),
                )
            )["cluster_id"].alias("cluster_id"),
            "e",
        )
        last_long = (
            assigned.select("cluster_id", F.posexplode("e").alias("pos0", "v"))
            .groupBy("cluster_id", (F.col("pos0") + 1).alias("pos"))
            .agg(
                F.round(F.avg("v"), 6).alias("cv"),
                F.count(F.lit(1)).alias("n_members"),
            )
        )
        # Summary-scale checkpoint: K×64 rows cut the next round's
        # lineage back to a materialized table.
        last_long = last_long.localCheckpoint()
        cent = last_long.groupBy("cluster_id").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "cv"))),
                lambda s: s["cv"],
            ).alias("c")
        )
    return last_long.select(
        "cluster_id",
        F.col("pos").cast("int").alias("pos"),
        F.col("cv").alias("centroid_val"),
        "n_members",
    )


#: Product quantization layout: 64 dims → PQ_M subspaces × 64/PQ_M dims,
#: PQ_K codewords per subspace (seeded from the PQ_K lowest-vec_id
#: vectors' subvectors — deterministic, no RNG, the q_kmeans_iter seed
#: convention).
PQ_M = 8
PQ_K = 4


def _pq_sqdist(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _pq_subvectors(vecs: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """Explode ``(id, array<double>[64])`` into PQ_M rows of contiguous
    64/PQ_M-dim subvectors: (id, sub_id, sv)."""
    d_sub = 64 // PQ_M
    return vecs.select(
        id_col,
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(PQ_M - 1)),
                lambda m: F.slice(vec_col, m * d_sub + 1, d_sub),
            )
        ).alias("sub_id", "sv"),
    )


def pq_codebook(embeddings: DataFrame) -> DataFrame:
    """The deterministic codebook: (code_id, sub_id, cv) from the PQ_K
    lowest-vec_id vectors' subvectors."""
    from pyspark.sql import Window

    seeds = (
        embeddings.orderBy("vec_id")
        .limit(PQ_K)
        .select(
            (F.row_number().over(Window.orderBy("vec_id")) - 1).alias(
                "code_id"
            ),
            _as_double(F.col("embedding")).alias("c"),
        )
    )
    return _pq_subvectors(seeds, "code_id", "c").withColumnRenamed("sv", "cv")


def pq_code_table(embeddings: DataFrame, codebook: DataFrame) -> DataFrame:
    """Assign every vector's every subspace to its nearest codeword:
    (vec_id, sub_id, code, sq_err) — rounded-L2 8dp + code_id tie-break
    (the ANN-family lockstep contract)."""
    subs = _pq_subvectors(
        embeddings.select("vec_id", _as_double(F.col("embedding")).alias("e")),
        "vec_id",
        "e",
    )
    return (
        subs.join(F.broadcast(codebook), "sub_id")
        .withColumn("d", F.round(_pq_sqdist(F.col("sv"), F.col("cv")), 8))
        .groupBy("vec_id", "sub_id")
        .agg(F.min(F.struct("d", "code_id")).alias("m"))
        .select(
            "vec_id",
            "sub_id",
            F.col("m.code_id").cast("int").alias("code"),
            F.col("m.d").alias("sq_err"),
        )
    )


@query(
    "q_pq_quantize",
    oracle=f"""
    WITH longe AS (
      SELECT vec_id, pos,
             CAST((pos - 1) // {64 // PQ_M} AS INTEGER) AS sub_id,
             CAST(embedding[CAST(pos AS INTEGER)] AS DOUBLE) AS v
      FROM (SELECT vec_id, embedding, unnest(generate_series(1, 64)) AS pos
            FROM embeddings)
    ),
    seeds AS (
      SELECT row_number() OVER (ORDER BY vec_id) - 1 AS code_id, embedding
      FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT {PQ_K})
    ),
    longs AS (
      SELECT code_id, pos,
             CAST((pos - 1) // {64 // PQ_M} AS INTEGER) AS sub_id,
             CAST(embedding[CAST(pos AS INTEGER)] AS DOUBLE) AS cv
      FROM (SELECT code_id, embedding, unnest(generate_series(1, 64)) AS pos
            FROM seeds)
    ),
    dist AS (
      SELECT e.vec_id, e.sub_id, s.code_id,
             round(sum((e.v - s.cv) * (e.v - s.cv)), 8) AS d
      FROM longe e JOIN longs s ON e.pos = s.pos
      GROUP BY e.vec_id, e.sub_id, s.code_id
    )
    SELECT vec_id, sub_id, CAST(code_id AS INTEGER) AS code, d AS sq_err
    FROM (SELECT *, row_number() OVER (PARTITION BY vec_id, sub_id
                                       ORDER BY d, code_id) AS rn
          FROM dist) WHERE rn = 1
    """,
    tags=("llm", "similarity", "compression"),
)
def q_pq_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product quantization of the embedding corpus — the compression
    stage of an IVF-PQ ANN index (Jégou et al. 2011): each 64-dim vector
    splits into {PQ_M} contiguous 8-dim subvectors and each subvector is
    coded as its nearest of {PQ_K} codewords (here the codebook is the
    {PQ_K} lowest-vec_id vectors' subvectors — deterministic stand-in
    for the k-means codebook q_kmeans_multi would train). Emits the long
    (vec_id, sub_id, code) code table plus the per-subspace squared
    quantization error — 8 small ints per vector replacing 64 floats,
    the 32× memory cut that lets a 100 TB embedding corpus fit an
    in-RAM ANN index. Rounded-distance 8dp + code_id tie-break keeps
    both engines' argmin identical (the ANN-family contract).

    Scale shape: the codebook is {PQ_M}×{PQ_K} tiny rows — BROADCAST;
    coding is one map-side nested-loop against it plus one
    groupBy(vec_id, sub_id) struct-min argmin; no fact×fact join, one
    fact-scale exchange. The posexplode emits {PQ_M} rows per vector
    (not 64): subvectors slice ONCE per subspace."""
    t = load(spark, sf_dir)
    return pq_code_table(t.embeddings, pq_codebook(t.embeddings))


#: Power-method rounds for q_pca_power_multi — like KMEANS_ITERS, enough
#: to demonstrate the re-normalized iteration, small enough to unroll.
POWER_ITERS = 3


def _pca_power_multi_oracle() -> str:
    """Unrolled {POWER_ITERS}-round power method in long (vec, dim)
    form: c_i = <e, v_{{i-1}}>, w_i = Σ c_i·e, v_i = round(w_i/‖w_i‖, 6).
    Rounding v at every iteration boundary keeps both engines' trajectories
    identical (the q_kmeans_multi lockstep convention)."""
    parts = [
        """
    WITH longe AS (
      SELECT vec_id, pos, CAST(embedding[CAST(pos AS INTEGER)] AS DOUBLE) AS v
      FROM (SELECT vec_id, embedding, unnest(generate_series(1, 64)) AS pos
            FROM embeddings)
    ),
    v0 AS (
      SELECT unnest(generate_series(1, 64)) AS pos, 0.125 AS val
    )"""
    ]
    for i in range(1, POWER_ITERS + 1):
        parts.append(f""",
    c{i} AS (
      SELECT l.vec_id, sum(l.v * p.val) AS c
      FROM longe l JOIN v{i - 1} p USING (pos) GROUP BY l.vec_id
    ),
    w{i} AS (
      SELECT l.pos, sum(l.v * c.c) AS w
      FROM longe l JOIN c{i} c USING (vec_id) GROUP BY l.pos
    ),
    n{i} AS (SELECT sqrt(sum(w * w)) AS nrm FROM w{i}),
    v{i} AS (
      SELECT pos, round(w / nrm, 6) AS val FROM w{i} CROSS JOIN n{i}
    )""")
    parts.append(f"""
    SELECT CAST(v.pos AS INTEGER) AS pos, v.val AS loading,
           round(n.nrm, 4) AS rayleigh
    FROM v{POWER_ITERS} v CROSS JOIN n{POWER_ITERS} n
    """)
    return "".join(parts)


@query(
    "q_pca_power_multi",
    oracle=_pca_power_multi_oracle(),
    tags=("llm", "similarity", "iterative"),
)
def q_pca_power_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """{POWER_ITERS} re-normalized power-method rounds toward the top
    principal direction — q_pca_power_iter driven to convergence-shape
    (the matrix-free A·(Aᵀv) iteration over the embedding corpus), with
    the direction vector ROUNDED to 6 decimals at every normalize so
    both engines follow the identical trajectory (q_kmeans_multi's
    lockstep contract); the final Rayleigh estimate ‖w‖ converges to the
    top eigenvalue of the (uncentered) second-moment matrix.

    Scale shape: per round the direction rides as a 1-row BROADCAST
    array (⟨e, v⟩ is a map-side fold — no 64× row explosion for the
    dot), the reduction is one posexplode + groupBy(dim) into 64 rows
    with map-side partials. The eager materialization per round is the
    64-row ``w`` (the reduce output) — NOT the normalized direction:
    nrm / v_long / varr all derive from checkpointed ``w`` with 64-row
    lazy math, so each round costs exactly ONE fact scan (checkpointing
    v_long re-derived w's fact scan inside nrm's subtree — two scans per
    round, r10 fix). At 100 TB a production run would cache/checkpoint
    the projected (vec_id, e) columns once and reuse across rounds."""
    t = load(spark, sf_dir)
    emb = t.embeddings.select(
        "vec_id", _as_double(F.col("embedding")).alias("e")
    ).localCheckpoint()
    varr = spark.range(1).select(
        F.array_repeat(F.lit(0.125), 64).alias("va")
    )
    v_long, nrm = None, None
    for _ in range(POWER_ITERS):
        c = emb.crossJoin(F.broadcast(varr)).select(
            "e",
            F.aggregate(
                F.zip_with("e", "va", lambda x, y: x * y),
                F.lit(0.0),
                lambda a, x: a + x,
            ).alias("c"),
        )
        w = (
            c.select(F.posexplode("e").alias("pos0", "v"), "c")
            .groupBy((F.col("pos0") + 1).alias("pos"))
            .agg(F.sum(F.col("v") * F.col("c")).alias("w"))
            .localCheckpoint()
        )
        nrm = w.agg(F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("nrm"))
        v_long = w.crossJoin(F.broadcast(nrm)).select(
            "pos", F.round(F.col("w") / F.col("nrm"), 6).alias("val")
        )
        varr = v_long.groupBy().agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "val"))),
                lambda s: s["val"],
            ).alias("va")
        )
    return v_long.crossJoin(F.broadcast(nrm)).select(
        F.col("pos").cast("int").alias("pos"),
        F.col("val").alias("loading"),
        F.round("nrm", 4).alias("rayleigh"),
    )


#: ADC search: this many query vectors (the highest vec_ids — disjoint
#: from the lowest-id codebook seeds), top-k results each.
PQ_NQ = 4
PQ_TOPK = 3


@query(
    "q_pq_search",
    oracle=f"""
    WITH longe AS (
      SELECT vec_id, pos,
             CAST((pos - 1) // {64 // PQ_M} AS INTEGER) AS sub_id,
             CAST(embedding[CAST(pos AS INTEGER)] AS DOUBLE) AS v
      FROM (SELECT vec_id, embedding, unnest(generate_series(1, 64)) AS pos
            FROM embeddings)
    ),
    seeds AS (
      SELECT row_number() OVER (ORDER BY vec_id) - 1 AS code_id, embedding
      FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT {PQ_K})
    ),
    longs AS (
      SELECT code_id, pos,
             CAST((pos - 1) // {64 // PQ_M} AS INTEGER) AS sub_id,
             CAST(embedding[CAST(pos AS INTEGER)] AS DOUBLE) AS cv
      FROM (SELECT code_id, embedding, unnest(generate_series(1, 64)) AS pos
            FROM seeds)
    ),
    dist AS (
      SELECT e.vec_id, e.sub_id, s.code_id,
             round(sum((e.v - s.cv) * (e.v - s.cv)), 8) AS d
      FROM longe e JOIN longs s ON e.pos = s.pos
      GROUP BY e.vec_id, e.sub_id, s.code_id
    ),
    codes AS (
      SELECT vec_id, sub_id, code_id AS code
      FROM (SELECT *, row_number() OVER (PARTITION BY vec_id, sub_id
                                         ORDER BY d, code_id) AS rn
            FROM dist) WHERE rn = 1
    ),
    q AS (
      SELECT vec_id AS q_id FROM embeddings
      ORDER BY vec_id DESC LIMIT {PQ_NQ}
    ),
    lut AS (
      SELECT l.vec_id AS q_id, l.sub_id, s.code_id,
             round(sum((l.v - s.cv) * (l.v - s.cv)), 8) AS d
      FROM longe l JOIN q ON l.vec_id = q.q_id
                  JOIN longs s ON l.pos = s.pos
      GROUP BY l.vec_id, l.sub_id, s.code_id
    ),
    adc AS (
      SELECT l.q_id, c.vec_id, round(sum(l.d), 6) AS adc
      FROM codes c JOIN lut l ON l.sub_id = c.sub_id AND l.code_id = c.code
      GROUP BY l.q_id, c.vec_id
    )
    SELECT q_id, CAST(rn AS INTEGER) AS rank, vec_id, adc
    FROM (SELECT *, row_number() OVER (PARTITION BY q_id
                                       ORDER BY adc, vec_id) AS rn
          FROM adc) WHERE rn <= {PQ_TOPK}
    """,
    tags=("llm", "similarity", "ann"),
)
def q_pq_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric-distance (ADC) top-{PQ_TOPK} search over the PQ-coded
    corpus — the query half of IVF-PQ (Jégou et al. 2011): per query, a
    {PQ_M}×{PQ_K} lookup table of exact query-subvector ↔ codeword
    distances is built once (rounded 8dp), and every database vector's
    approximate distance is just {PQ_M} LUT adds keyed by its stored
    codes — no float vector math against the corpus at query time. ADC
    rounded 6dp + vec_id tie-break keeps the ranking engine-identical.
    Queries are the {PQ_NQ} highest-vec_id vectors (disjoint from the
    lowest-id codebook seeds).

    Scale shape: codebook and LUT ({PQ_NQ}×{PQ_M}×{PQ_K} rows) are
    BROADCAST; the scoring join touches the codes table ({PQ_M} small
    ints per vector — the 32× compressed representation) map-side, one
    groupBy(q_id, vec_id) with map-side partials, and the final top-k is
    a rank-filter window that compiles to WindowGroupLimit (partial
    per-partition top-k BEFORE the exchange — the q_domain_cap shape),
    so no fact-scale sort funnel."""
    from pyspark.sql import Window

    t = load(spark, sf_dir)
    codebook = pq_codebook(t.embeddings)
    codes = pq_code_table(t.embeddings, codebook).select(
        "vec_id", "sub_id", "code"
    )
    queries = t.embeddings.orderBy(F.desc("vec_id")).limit(PQ_NQ).select(
        F.col("vec_id").alias("q_id"),
        _as_double(F.col("embedding")).alias("qe"),
    )
    lut = (
        _pq_subvectors(queries, "q_id", "qe")
        .join(F.broadcast(codebook), "sub_id")
        .select(
            "q_id",
            "sub_id",
            F.col("code_id").alias("code"),
            F.round(_pq_sqdist(F.col("sv"), F.col("cv")), 8).alias("d"),
        )
    )
    adc = (
        codes.join(F.broadcast(lut), ["sub_id", "code"])
        .groupBy("q_id", "vec_id")
        .agg(F.round(F.sum("d"), 6).alias("adc"))
    )
    w = Window.partitionBy("q_id").orderBy("adc", "vec_id")
    return (
        adc.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= PQ_TOPK)
        .select("q_id", F.col("rank").cast("int").alias("rank"), "vec_id", "adc")
    )


#: q_crosslingual_mine: margin kNN depth (the k=4 of Artetxe & Schwenk's
#: ratio margin) and the deterministic probe cohort (vec_id bound).
MARGIN_K = 4
MINE_PROBE_LIM = 128


@query(
    "q_crosslingual_mine",
    oracle=f"""
    WITH a AS (SELECT vec_id AS a_id, embedding AS a_emb FROM embeddings
               WHERE label < 5 AND vec_id < {MINE_PROBE_LIM}),
    b AS (SELECT vec_id AS b_id, embedding AS b_emb FROM embeddings
          WHERE label >= 5),
    pairs AS (
      SELECT a_id, b_id,
             round({_DOT_SQL.format(a='a_emb', b='b_emb')}
             / (sqrt({_DOT_SQL.format(a='a_emb', b='a_emb')})
                * sqrt({_DOT_SQL.format(a='b_emb', b='b_emb')})), 8) AS cos
      FROM a CROSS JOIN b
    ),
    ma AS (
      SELECT a_id,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list_slice(list(cos ORDER BY cos DESC), 1, {MARGIN_K})),
               (acc, x) -> acc + x) / {MARGIN_K} AS ma
      FROM pairs GROUP BY 1
    ),
    mb AS (
      SELECT b_id,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list_slice(list(cos ORDER BY cos DESC), 1, {MARGIN_K})),
               (acc, x) -> acc + x) / {MARGIN_K} AS mb
      FROM pairs GROUP BY 1
    ),
    m AS (
      SELECT a_id, b_id, round(cos * 2 / (ma + mb), 6) AS margin
      FROM pairs JOIN ma USING (a_id) JOIN mb USING (b_id)
    ),
    ba AS (
      SELECT a_id, b_id, margin,
             row_number() OVER (PARTITION BY a_id
                                ORDER BY margin DESC, b_id) AS ra
      FROM m
    ),
    bb AS (
      SELECT a_id, b_id,
             row_number() OVER (PARTITION BY b_id
                                ORDER BY margin DESC, a_id) AS rb
      FROM m
    )
    SELECT ba.a_id, ba.b_id, ba.margin, (bb.rb = 1) AS mutual
    FROM ba JOIN bb ON ba.a_id = bb.a_id AND ba.b_id = bb.b_id
    WHERE ba.ra = 1
    """,
    tags=("llm", "similarity"),
)
def q_crosslingual_mine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Margin-based bitext mining (Artetxe & Schwenk 2019, the
    LASER/CCMatrix alignment rule): a probe cohort of "source-language"
    embeddings (label < 5, vec_id < {MINE_PROBE_LIM} — the new shipment
    to align) scores against the full "target-language" side (label >=
    5); each pair's RATIO MARGIN divides its cosine by the mean of the
    {MARGIN_K} strongest cosines of both endpoints — the normalization
    that kills hub vectors plain cosine thresholds mis-mine; a pair is
    emitted per probe with its best-margin target and whether the match
    is MUTUAL (the target's own best margin points back). Downstream
    keeps mutual rows as sentence pairs.

    Scale shape: the target corpus is scanned ONCE by an Arrow-batched
    mapInPandas whose closure carries the (<= {MINE_PROBE_LIM})-row probe
    matrix (the q_cosine_topk broadcast-dim pattern) — one numpy matmul
    per batch, no shuffle of the corpus; only the |probes| x |targets|
    scored pairs (linear in the corpus) reach the ranking exchanges. The
    pair table checkpoints once (three consumers: both top-k folds and
    the margin join); per-side top-{MARGIN_K} means fold SEQUENTIALLY
    over the value-sorted list so both engines sum in one order
    (bit-identical margins, the established float contract); ranking
    runs on ROUNDED margins with id tie-breaks. At full mining scale
    (both sides fact-sized) the probe side shards into
    broadcastable chunks and q_ann_ivf prefilters candidates — this
    operator is the exact per-chunk kernel."""
    import os

    import numpy as np
    import pandas as pd
    from collections.abc import Iterator

    t = load(spark, sf_dir)
    pdf = None
    if os.path.isdir(sf_dir):
        try:
            import pyarrow.parquet as pq

            pdf = pq.read_table(
                os.path.join(sf_dir, "embeddings.parquet"),
                columns=["vec_id", "embedding"],
                filters=[("vec_id", "<", MINE_PROBE_LIM), ("label", "<", 5)],
            ).to_pandas()
        except Exception:
            pdf = None
    if pdf is None:
        pdf = (
            t.embeddings.filter(
                (F.col("vec_id") < MINE_PROBE_LIM) & (F.col("label") < 5)
            )
            .select("vec_id", "embedding")
            .toPandas()
        )
    pdf = pdf.sort_values("vec_id")
    a_ids = pdf["vec_id"].to_numpy(dtype="int64")
    A = np.stack(pdf["embedding"].to_numpy()).astype("float64")
    a_norms = np.sqrt((A * A).sum(axis=1))

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for bdf in batches:
            E = np.stack(bdf["embedding"].to_numpy()).astype("float64")
            sims = (A @ E.T) / (
                a_norms[:, None] * np.sqrt((E * E).sum(axis=1))[None, :]
            )  # (|A|, n)
            n = E.shape[0]
            yield pd.DataFrame(
                {
                    "a_id": np.repeat(a_ids, n),
                    "b_id": np.tile(bdf["vec_id"].to_numpy(), len(a_ids)),
                    "cos": sims.ravel(),
                }
            )

    pairs = (
        t.embeddings.filter(F.col("label") >= 5)
        .mapInPandas(score, schema="a_id bigint, b_id bigint, cos double")
        .withColumn("cos", F.round("cos", 8))
        .localCheckpoint()
    )

    def _topk_mean(key):
        return (
            pairs.groupBy(key)
            .agg(
                (
                    F.aggregate(
                        F.slice(
                            F.sort_array(F.collect_list("cos"), asc=False),
                            1,
                            MARGIN_K,
                        ),
                        F.lit(0.0),
                        lambda acc, x: acc + x,
                    )
                    / MARGIN_K
                ).alias("m" + key[0])
            )
        )

    m = (
        pairs.join(F.broadcast(_topk_mean("a_id")), "a_id")
        .join(F.broadcast(_topk_mean("b_id")), "b_id")
        .select(
            "a_id",
            "b_id",
            F.round(F.col("cos") * 2 / (F.col("ma") + F.col("mb")), 6).alias(
                "margin"
            ),
        )
        .localCheckpoint()
    )
    wa = Window.partitionBy("a_id").orderBy(F.col("margin").desc(), F.col("b_id"))
    wb = Window.partitionBy("b_id").orderBy(F.col("margin").desc(), F.col("a_id"))
    ba = m.withColumn("ra", F.row_number().over(wa))
    bb = m.select(
        "a_id", "b_id", F.row_number().over(wb).alias("rb")
    )
    return (
        ba.filter(F.col("ra") == 1)
        .join(bb, ["a_id", "b_id"])
        .select("a_id", "b_id", "margin", (F.col("rb") == 1).alias("mutual"))
    )


#: q_proto_select: survivors kept per cluster — the hardest (farthest
#: from their assigned seed) examples, the keep-hard budget regime of
#: prototype-based pruning.
PROTO_KEEP = 16


@query(
    "q_proto_select",
    oracle=f"""
    WITH seeds AS (
      SELECT vec_id AS seed_id, embedding AS s
      FROM embeddings ORDER BY vec_id LIMIT 8
    ),
    scored AS (
      SELECT e.vec_id, seeds.seed_id,
             round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      list_transform(range(1, 65),
        i -> (CAST(e.embedding[i] AS DOUBLE) - CAST(seeds.s[i] AS DOUBLE))
             * (CAST(e.embedding[i] AS DOUBLE) - CAST(seeds.s[i] AS DOUBLE)))),
      (acc, x) -> acc + x), 8)
               AS dist
      FROM embeddings e CROSS JOIN seeds
    ),
    assigned AS (
      SELECT vec_id, seed_id AS cluster_id, dist FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id
                                     ORDER BY dist, seed_id) AS rn
        FROM scored) WHERE rn = 1
    )
    SELECT vec_id, cluster_id, dist,
           CAST(rk AS BIGINT) AS hardness_rank
    FROM (SELECT *, row_number() OVER (PARTITION BY cluster_id
                                       ORDER BY dist DESC, vec_id) AS rk
          FROM assigned)
    WHERE rk <= {PROTO_KEEP}
    """,
    tags=("llm", "similarity", "sampling"),
)
def q_proto_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prototype-based data pruning (Sorscher et al. 2022, "Beyond neural
    scaling laws": rank examples by distance to their cluster prototype
    and keep the HARD tail when the data budget is large) — the
    embedding-space selection step after q_kmeans_iter's clustering:
    every vector assigns to its nearest seed (the q_kmeans_iter
    contract: squared-L2 rounded to 8dp, seed_id tie-break), then each
    cluster keeps its {PROTO_KEEP} FARTHEST members (rounded distance,
    vec_id tie-break) — the examples prototypes explain worst, which are
    the ones worth training on when easy mass dominates.

    Scale shape: K-row seed table broadcasts; assignment is the
    struct-min argmin groupBy (no fact-scale window); the per-cluster
    keep compiles to a rank window PARTITIONED BY cluster — Spark plans
    WindowGroupLimit, so each map task keeps only its local top-
    {PROTO_KEEP} before the exchange (the q_domain_cap shape). Two
    fact-scale exchanges total."""
    t = load(spark, sf_dir)
    seeds = (
        t.embeddings.orderBy("vec_id")
        .limit(KMEANS_K)
        .select(
            F.col("vec_id").alias("seed_id"),
            _as_double(F.col("embedding")).alias("s"),
        )
    )

    def sqdist(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    emb = t.embeddings.select(
        "vec_id", _as_double(F.col("embedding")).alias("e")
    )
    assigned = (
        emb.crossJoin(F.broadcast(seeds))
        .withColumn("dist", F.round(sqdist(F.col("e"), F.col("s")), 8))
        .groupBy("vec_id")
        .agg(F.min(F.struct("dist", "seed_id")).alias("m"))
        .select(
            "vec_id",
            F.col("m.seed_id").alias("cluster_id"),
            F.col("m.dist").alias("dist"),
        )
    )
    w = Window.partitionBy("cluster_id").orderBy(
        F.col("dist").desc(), "vec_id"
    )
    return (
        assigned.withColumn("hardness_rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("hardness_rank") <= PROTO_KEEP)
    )


#: q_jl_project: target dimensionality of the sign random projection
#: (64 -> 16, the 4x compression regime where JL distortion stays
#: moderate at corpus scale).
JL_DIM = 16


@query(
    "q_jl_project",
    oracle=f"""
    WITH signs AS (
      SELECT j.j AS j, d.d AS d,
             CASE WHEN (CAST(CAST(concat('0x',
                    substr(md5(concat(CAST(j.j AS VARCHAR), '_',
                                      CAST(d.d AS VARCHAR))), 1, 8))
                    AS UBIGINT) AS BIGINT) & 1) = 1
                  THEN 1.0 ELSE -1.0 END AS sgn
      FROM (SELECT unnest(range({JL_DIM})) AS j) j
      CROSS JOIN (SELECT unnest(range(64)) AS d) d
    ),
    proj AS (
      SELECT e.vec_id, s.j,
             sum(CAST(e.embedding[CAST(s.d AS INTEGER) + 1] AS DOUBLE)
                 * s.sgn) AS p
      FROM embeddings e CROSS JOIN signs s
      GROUP BY 1, 2
    ),
    norms AS (
      SELECT vec_id,
             sum(p * p) / {JL_DIM} AS proj_ms
      FROM proj GROUP BY 1
    ),
    orig AS (
      SELECT vec_id,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list_transform(range(1, 65),
                 i -> CAST(embedding[i] AS DOUBLE)
                      * CAST(embedding[i] AS DOUBLE))),
               (acc, x) -> acc + x) / 64 AS orig_ms
      FROM embeddings
    )
    SELECT o.vec_id,
           round(o.orig_ms, 6) AS orig_ms,
           round(n.proj_ms, 6) AS proj_ms,
           round(n.proj_ms / o.orig_ms, 6) AS distortion
    FROM orig o JOIN norms n USING (vec_id)
    """,
    tags=("llm", "similarity"),
)
def q_jl_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss sign random projection (Achlioptas 2003's
    database-friendly ±1 matrix): embeddings project 64 → {JL_DIM} dims
    through an engine-neutral md5-derived sign matrix (no RNG — the
    q_sample_hash technique applied to matrix entries), and the output
    reports per-vector mean-square norm before/after plus the distortion
    ratio — the quantity the JL lemma bounds, and the first thing to
    audit before swapping an index to projected vectors. The projected
    vectors themselves are the obvious extension; emitting the scalar
    audit keeps the output hash-checkable (doubles, not float arrays).

    Float contract: both engines accumulate each coordinate's 64 exact
    products via GROUP BY sum — reassociation drift on O(1) terms is
    <= 1e-13, absorbed by the 6dp rounding (the q_bigram_logprob
    avg-of-doubles precedent).

    Scale shape: the sign matrix is a {JL_DIM}×64-row BROADCAST constant
    table; one corpus scan explodes to dimension grain (checkpointed —
    two consumers), the coordinate sums are one key-partitioned
    groupBy(vec, j) with map-side partials, and the norm reduces run at
    vector grain. A flat inline expression would be exchange-free but
    costs ~10 s of optimizer/codegen compile per plan — see body."""
    t = load(spark, sf_dir)
    import hashlib

    def sgn(j: int, d: int) -> float:
        h = int(hashlib.md5(f"{j}_{d}".encode()).hexdigest()[:8], 16)
        return 1.0 if (h & 1) == 1 else -1.0

    # DATAFLOW, not a flat expression: an inline 16x64-term arithmetic
    # tree (~2000 Catalyst nodes) costs ~10 s of optimizer + Janino
    # compile time before touching a row. Exploding dims and joining the
    # broadcast sign TABLE keeps the plan small and the work columnar
    # (measured 9.8 s -> ~1.3 s at sf0.01).
    signs = spark.createDataFrame(
        [(j, d, sgn(j, d)) for j in range(JL_DIM) for d in range(64)],
        "j int, d int, sgn double",
    )
    exploded = t.embeddings.select(
        "vec_id", F.posexplode("embedding").alias("d0", "val")
    ).select(
        "vec_id", F.col("d0").alias("d"), F.col("val").cast("double").alias("v")
    ).localCheckpoint()
    proj = (
        exploded.join(F.broadcast(signs), "d")
        .groupBy("vec_id", "j")
        .agg(F.sum(F.col("v") * F.col("sgn")).alias("p"))
    )
    norms = proj.groupBy("vec_id").agg(
        (F.sum(F.col("p") * F.col("p")) / JL_DIM).alias("proj_ms")
    )
    orig = exploded.groupBy("vec_id").agg(
        (F.sum(F.col("v") * F.col("v")) / 64).alias("orig_ms")
    )
    return orig.join(norms, "vec_id").select(
        "vec_id",
        F.round("orig_ms", 6).alias("orig_ms"),
        F.round("proj_ms", 6).alias("proj_ms"),
        F.round(F.col("proj_ms") / F.col("orig_ms"), 6).alias("distortion"),
    )


#: q_kcenter: number of centers picked by farthest-first traversal.
KCENTER_K = 8


def _kcenter_oracle() -> str:
    """Unrolled k-center SQL (the q_kmeans_multi chained-CTE technique):
    md_i(v) = min distance to the first i centers; center i+1 = argmax
    md_i (rounded 8dp, vec_id tie-break)."""
    dist = (
        "round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),"
        " list_transform(range(1, 65),"
        " i -> (CAST(e.embedding[i] AS DOUBLE) - CAST({c}.emb[i] AS DOUBLE))"
        " * (CAST(e.embedding[i] AS DOUBLE) - CAST({c}.emb[i] AS DOUBLE)))),"
        " (acc, x) -> acc + x), 8)"
    )
    parts = [
        """
    WITH c1 AS (
      SELECT vec_id AS center_id, embedding AS emb,
             CAST(0.0 AS DOUBLE) AS sel_dist
      FROM embeddings ORDER BY vec_id LIMIT 1
    ),
    md1 AS (
      SELECT e.vec_id, {d1} AS md
      FROM embeddings e CROSS JOIN c1
    )""".format(d1=dist.format(c="c1"))
    ]
    for i in range(2, KCENTER_K + 1):
        parts.append(
            """,
    c{i} AS (
      SELECT e.vec_id AS center_id, e.embedding AS emb, m.md AS sel_dist
      FROM embeddings e JOIN md{p} m USING (vec_id)
      ORDER BY m.md DESC, e.vec_id LIMIT 1
    ),
    md{i} AS (
      SELECT m.vec_id, least(m.md, {di}) AS md
      FROM md{p} m JOIN embeddings e USING (vec_id) CROSS JOIN c{i}
    )""".format(i=i, p=i - 1, di=dist.format(c="c{}".format(i)))
        )
    selects = "\n    UNION ALL\n".join(
        "SELECT {r} AS rank, center_id, sel_dist FROM c{r}".format(r=r)
        for r in range(1, KCENTER_K + 1)
    )
    parts.append(
        """
    SELECT CAST(rank AS BIGINT) AS rank, center_id,
           round(sel_dist, 8) AS sel_dist
    FROM ({selects})
    """.format(selects=selects)
    )
    return "".join(parts)


@query(
    "q_kcenter",
    oracle=_kcenter_oracle(),
    tags=("llm", "similarity", "sampling"),
)
def q_kcenter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-center seeding by farthest-first traversal (Gonzalez 1985 — the
    2-approximation that seeds coresets, k-means++-style inits and
    diversity-maximizing data selection): start from the lowest vec_id,
    then {KCENTER_K}-1 times pick the vector FARTHEST from the chosen
    set (squared-L2 rounded to 8dp, vec_id tie-break — the q_kmeans_iter
    determinism contract). Output: each center with its selection rank
    and distance-at-selection (the monotone non-increasing coverage
    radii — the k-center objective's certificate).

    Scale shape (r10 form): per greedy step the chosen centers ride as
    ONE broadcast row holding array<array<double>> ({KCENTER_K}×64
    doubles max — bounded by contract), and min-distance-to-chosen is a
    map-side array_min fold over that attribute; the argmax is
    TakeOrdered (per-partition top-1) which also CARRIES the winner's
    embedding. Each step is exactly ONE job with an IDENTICAL expression
    shape (codegen compiles once, caches across steps — the previous
    form emitted the centers as 64-double literal chains, a fresh janino
    compile per step that dominated small-scale walls, and checkpointed
    the corpus-sized md column per step, a fact-scale write per round at
    100 TB). Recomputing ≤K rounded distances per row per pass trades
    K² cheap fused map flops for K fact-scale materializations — the
    right side of the trade at any scale for constant K. K jobs total,
    the Gonzalez sequential floor; the oracle is the same recursion
    unrolled into chained CTEs."""
    t = load(spark, sf_dir)
    emb = t.embeddings.select(
        "vec_id", _as_double(F.col("embedding")).alias("e")
    ).localCheckpoint()

    def sqdist(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    first = emb.orderBy("vec_id").limit(1).collect()[0]
    centers = [(1, first["vec_id"], 0.0)]
    chosen = [list(first["e"])]
    for rank in range(2, KCENTER_K + 1):
        cdf = spark.createDataFrame([(chosen,)], "cs array<array<double>>")
        nxt = (
            emb.crossJoin(F.broadcast(cdf))
            .select(
                "vec_id",
                "e",
                F.array_min(
                    F.transform(
                        "cs", lambda c: F.round(sqdist(F.col("e"), c), 8)
                    )
                ).alias("md"),
            )
            .orderBy(F.col("md").desc(), "vec_id")
            .limit(1)
            .collect()[0]
        )
        centers.append((rank, nxt["vec_id"], float(nxt["md"])))
        chosen.append(list(nxt["e"]))
    return t.embeddings.sparkSession.createDataFrame(
        centers, "rank bigint, center_id bigint, sel_dist double"
    ).select("rank", "center_id", F.round("sel_dist", 8).alias("sel_dist"))


#: RRF constant (Cormack/Clarke/Buettcher 2009's k=60) and leg depth.
RRF_K = 60
RRF_DEPTH = 100
RRF_TOPN = 20


def _rrf_oracle() -> str:
    from .text import bm25_scored_ctes

    dot_pe = _DOT_SQL.format(a="e.embedding", b="p.p_emb")
    dot_ee = _DOT_SQL.format(a="e.embedding", b="e.embedding")
    dot_pp = _DOT_SQL.format(a="p.p_emb", b="p.p_emb")
    return f"""
    WITH {bm25_scored_ctes()},
    lex_top AS (
      SELECT doc_id, CAST(row_number() OVER (ORDER BY score DESC, doc_id)
                          AS BIGINT) AS lex_rank
      FROM scored WHERE score > 0
      ORDER BY score DESC, doc_id LIMIT {RRF_DEPTH}
    ),
    probe AS (SELECT embedding AS p_emb FROM embeddings WHERE vec_id = 0),
    dense_scored AS (
      SELECT e.vec_id AS doc_id,
             round({dot_pe} / (sqrt({dot_ee}) * sqrt({dot_pp})), 8) AS cos_sim
      FROM embeddings e, probe p
      WHERE e.vec_id <> 0
    ),
    dense_top AS (
      SELECT doc_id, CAST(row_number() OVER (ORDER BY cos_sim DESC, doc_id)
                          AS BIGINT) AS dense_rank
      FROM dense_scored
      ORDER BY cos_sim DESC, doc_id LIMIT {RRF_DEPTH}
    ),
    fused AS (
      SELECT coalesce(l.doc_id, d.doc_id) AS doc_id,
             l.lex_rank, d.dense_rank,
             round(coalesce(1.0 / ({RRF_K} + l.lex_rank), 0.0)
                   + coalesce(1.0 / ({RRF_K} + d.dense_rank), 0.0), 8)
               AS rrf_score
      FROM lex_top l FULL OUTER JOIN dense_top d ON l.doc_id = d.doc_id
    )
    SELECT doc_id, lex_rank, dense_rank, rrf_score
    FROM fused
    ORDER BY rrf_score DESC, doc_id
    LIMIT {RRF_TOPN}
    """


@query("q_rrf", oracle=_rrf_oracle(), tags=("llm", "similarity", "search"))
def q_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank-fusion hybrid retrieval: the BM25 lexical top-100
    (shared scorer ``bm25_scored``, llm/text.py) fused with a dense
    cosine top-100 (probe = vec_id 0's embedding, same sequential-fold
    dot product as q_cosine_topk) via score = sum 1/(60 + rank) — the
    standard hybrid-search combiner (Cormack et al. 2009, k=60).

    Scale shape: each leg is an ``orderBy().limit(100)`` which compiles
    to TakeOrderedAndProject (per-partition top-k, single merge — no
    global sort, no range exchange on the corpus); ranks are then
    assigned by a window over the 100-row list, and the fusion join +
    final top-20 touch only these two 100-row lists. At 100 TB both legs
    would sit behind their candidate pruners (q_inverted_index postings,
    q_ann_lsh buckets) with identical fusion semantics.

    Ranks are assigned on ROUNDED scores (6 dp lexical, 8 dp dense) with
    doc_id tie-breaks, so the rank lists — and hence the fused scores —
    are integer-deterministic across engines; the final rrf_score is a
    two-term sum of exact reciprocals, rounded to 8.
    """
    from .text import bm25_scored

    t = load(spark, sf_dir)
    lex_top = (
        bm25_scored(t.documents)
        .orderBy(F.col("score").desc(), "doc_id")
        .limit(RRF_DEPTH)
    )
    w_lex = Window.orderBy(F.col("score").desc(), "doc_id")
    lex_ranked = lex_top.select(
        "doc_id", F.row_number().over(w_lex).cast("bigint").alias("lex_rank")
    )

    probe = t.embeddings.filter(F.col("vec_id") == 0).select(
        _as_double(F.col("embedding")).alias("p_emb")
    )
    dense_scored = (
        t.embeddings.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(probe))
        .select(
            F.col("vec_id").alias("doc_id"),
            F.round(
                cosine(_as_double(F.col("embedding")), F.col("p_emb")), 8
            ).alias("cos_sim"),
        )
    )
    dense_top = dense_scored.orderBy(
        F.col("cos_sim").desc(), "doc_id"
    ).limit(RRF_DEPTH)
    w_dense = Window.orderBy(F.col("cos_sim").desc(), "doc_id")
    dense_ranked = dense_top.select(
        "doc_id", F.row_number().over(w_dense).cast("bigint").alias("dense_rank")
    )

    fused = (
        lex_ranked.join(dense_ranked, "doc_id", "full_outer")
        .select(
            "doc_id",
            "lex_rank",
            "dense_rank",
            F.round(
                F.coalesce(
                    F.lit(1.0) / (F.lit(RRF_K) + F.col("lex_rank")), F.lit(0.0)
                )
                + F.coalesce(
                    F.lit(1.0) / (F.lit(RRF_K) + F.col("dense_rank")), F.lit(0.0)
                ),
                8,
            ).alias("rrf_score"),
        )
    )
    return fused.orderBy(F.col("rrf_score").desc(), "doc_id").limit(RRF_TOPN)


#: MMR diversified retrieval: candidate-pool depth, picks, relevance weight.
MMR_POOL = 20
MMR_K = 5
MMR_LAMBDA = 0.7


def _mmr_oracle() -> str:
    """Unrolled greedy MMR as chained CTEs (the q_kmeans_multi /
    q_kcenter oracle pattern): pool = cosine top-{MMR_POOL} for probe
    vec_id 0; step k picks argmax of round(L*rel - (1-L)*max_sim_to_
    selected, 8) with vec_id tie-breaks over 8dp-rounded sims, so both
    engines follow the identical trajectory."""
    dot_ep = _DOT_SQL.format(a="e.embedding", b="p.p_emb")
    dot_ee = _DOT_SQL.format(a="e.embedding", b="e.embedding")
    dot_pp = _DOT_SQL.format(a="p.p_emb", b="p.p_emb")
    dot_ab = _DOT_SQL.format(a="a.embedding", b="b.embedding")
    dot_aa = _DOT_SQL.format(a="a.embedding", b="a.embedding")
    dot_bb = _DOT_SQL.format(a="b.embedding", b="b.embedding")
    lam, mu = MMR_LAMBDA, round(1.0 - MMR_LAMBDA, 10)
    parts = [f"""
    WITH probe AS (SELECT embedding AS p_emb FROM embeddings WHERE vec_id = 0),
    scored AS (
      SELECT e.vec_id, e.embedding,
             round({dot_ep} / (sqrt({dot_ee}) * sqrt({dot_pp})), 8) AS rel
      FROM embeddings e, probe p WHERE e.vec_id <> 0
    ),
    pool AS (
      SELECT vec_id, embedding, rel
      FROM (SELECT *, row_number() OVER (ORDER BY rel DESC, vec_id) AS rn
            FROM scored)
      WHERE rn <= {MMR_POOL}
    ),
    sims AS (
      SELECT a.vec_id AS va, b.vec_id AS vb,
             round({dot_ab} / (sqrt({dot_aa}) * sqrt({dot_bb})), 8) AS sim
      FROM pool a JOIN pool b ON a.vec_id <> b.vec_id
    ),
    sel1 AS (
      SELECT CAST(1 AS BIGINT) AS step, vec_id, rel,
             CAST(0.0 AS DOUBLE) AS penalty,
             round({lam} * rel, 8) AS mmr_score
      FROM pool ORDER BY rel DESC, vec_id LIMIT 1
    ),
    picked1 AS (SELECT vec_id FROM sel1)"""]
    for k in range(2, MMR_K + 1):
        parts.append(f""",
    cand{k} AS (
      SELECT p.vec_id, p.rel, max(s.sim) AS pen
      FROM pool p JOIN sims s
        ON s.va = p.vec_id AND s.vb IN (SELECT vec_id FROM picked{k - 1})
      WHERE p.vec_id NOT IN (SELECT vec_id FROM picked{k - 1})
      GROUP BY p.vec_id, p.rel
    ),
    sel{k} AS (
      SELECT CAST({k} AS BIGINT) AS step, vec_id, rel, pen AS penalty,
             round({lam} * rel - {mu} * pen, 8) AS mmr_score
      FROM cand{k}
      ORDER BY round({lam} * rel - {mu} * pen, 8) DESC, vec_id LIMIT 1
    ),
    picked{k} AS (SELECT vec_id FROM picked{k - 1}
                  UNION ALL SELECT vec_id FROM sel{k})""")
    union = "\n      UNION ALL ".join(
        f"SELECT * FROM sel{k}" for k in range(1, MMR_K + 1)
    )
    parts.append(f"""
    SELECT step, vec_id, rel, penalty, mmr_score FROM ({union})
    """)
    return "".join(parts)


@query("q_mmr", oracle=_mmr_oracle(), tags=("llm", "similarity", "search"))
def q_mmr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal Marginal Relevance re-ranking (Carbonell & Goldstein 1998)
    — the diversity-aware retrieval head: from the cosine top-{MMR_POOL}
    pool for probe vec_id 0, greedily pick {MMR_K} results maximizing
    L*rel(d) - (1-L)*max_sim(d, selected), L = {MMR_LAMBDA} — relevance
    traded against redundancy, the standard re-ranker between ANN
    retrieval and a RAG context window. All sims rounded 8dp with vec_id
    tie-breaks (the ANN-family lockstep contract); the oracle unrolls the
    same greedy trajectory as chained CTEs.

    Scale shape (single-batch form, r10 — the q_hits treatment): ONE
    distributed corpus pass builds the pool (broadcast probe crossJoin,
    map-side cosine, TakeOrdered {MMR_POOL} — the corpus never
    shuffles), checkpointed at {MMR_POOL} rows. Pairwise sims come from
    one in-engine pool self-join ({MMR_POOL}² rows, rounded 8dp — the
    ANN-family lockstep contract), and the {MMR_K}-step greedy runs
    inside ONE single-group applyInPandas batch over those rows: the
    greedy's grain is the CONSTANT-sized pool, which is below task
    grain, so per-step DataFrame machinery (a job + codegen compile per
    pick in the previous form, 3 s at sf0.01 for arithmetic on 20 rows)
    is replaced by microseconds of numpy. Batch-side rounding is
    Decimal(repr(x)) HALF_UP — bit-equivalent to F.round (see
    operators/graph.py:_round_half_up_vec); rel/sim inputs arrive
    already engine-rounded, so the trajectory is unchanged."""
    t = load(spark, sf_dir)
    probe = t.embeddings.filter(F.col("vec_id") == 0).select(
        _as_double(F.col("embedding")).alias("p_emb")
    )
    pool = (
        t.embeddings.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(probe))
        .select(
            "vec_id",
            _as_double(F.col("embedding")).alias("e"),
            F.round(
                cosine(_as_double(F.col("embedding")), F.col("p_emb")), 8
            ).alias("rel"),
        )
        .orderBy(F.col("rel").desc(), "vec_id")
        .limit(MMR_POOL)
        .localCheckpoint()  # MMR_POOL rows; every greedy step reads this
    )
    sims = (
        pool.select(F.col("vec_id").alias("va"), F.col("rel").alias("rel_a"),
                    F.col("e").alias("ea"))
        .join(
            pool.select(F.col("vec_id").alias("vb"), F.col("e").alias("eb")),
            F.col("va") != F.col("vb"),
        )
        .select(
            "va",
            "rel_a",
            "vb",
            F.round(cosine(F.col("ea"), F.col("eb")), 8).alias("sim"),
        )
    )
    return (
        sims.withColumn("g", F.lit(0))
        .groupBy("g")
        .applyInPandas(
            _mmr_batch,
            "step bigint, vec_id bigint, rel double, penalty double, "
            "mmr_score double",
        )
    )


def _mmr_batch(pdf):
    """The {MMR_K}-step greedy over one (va, rel_a, vb, sim) pool batch —
    rel and sim arrive engine-rounded 8dp; scores are rounded HALF_UP over
    the shortest-decimal repr (≡ F.round)."""
    import pandas as pd

    from ..operators.graph import _round_half_up_vec

    def r8(x: float) -> float:
        return float(_round_half_up_vec([x], 8)[0])

    rel = dict(
        pdf[["va", "rel_a"]].drop_duplicates().itertuples(index=False)
    )
    sim = {(int(a), int(b)): float(s)
           for a, b, s in pdf[["va", "vb", "sim"]].itertuples(index=False)}
    mu = round(1.0 - MMR_LAMBDA, 10)
    # Step 1: argmax rel, vec_id tie-break; penalty 0 by definition.
    first = min(rel, key=lambda v: (-rel[v], v))
    picks = [(1, int(first), float(rel[first]), 0.0,
              r8(MMR_LAMBDA * rel[first]))]
    chosen = [first]
    for step in range(2, MMR_K + 1):
        best = None
        for v, rv in rel.items():
            if v in chosen:
                continue
            pen = max(sim[(int(v), int(c))] for c in chosen)
            score = r8(MMR_LAMBDA * rv - mu * pen)
            key = (-score, v)
            if best is None or key < best[0]:
                best = (key, v, rv, pen, score)
        _, v, rv, pen, score = best
        picks.append((step, int(v), float(rv), float(pen), score))
        chosen.append(v)
    return pd.DataFrame(
        picks, columns=["step", "vec_id", "rel", "penalty", "mmr_score"]
    )


#: IVF-PQ: coarse-cell count (seeded from the IVF_CELLS lowest-vec_id
#: vectors) and cells probed per query.
IVF_CELLS = 8
IVF_NPROBE = 2


def _ivfpq_oracle() -> str:
    """The q_pq_search oracle with an IVF candidate gate composed in:
    coarse cells from the {IVF_CELLS} lowest-vec_id seed vectors, each
    query probes its {IVF_NPROBE} nearest cells, ADC runs on cell members
    only."""
    return f"""
    WITH longe AS (
      SELECT vec_id, pos,
             CAST((pos - 1) // {64 // PQ_M} AS INTEGER) AS sub_id,
             CAST(embedding[CAST(pos AS INTEGER)] AS DOUBLE) AS v
      FROM (SELECT vec_id, embedding, unnest(generate_series(1, 64)) AS pos
            FROM embeddings)
    ),
    cseeds AS (
      SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell_id, embedding
      FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT {IVF_CELLS})
    ),
    longc AS (
      SELECT cell_id, pos, CAST(embedding[CAST(pos AS INTEGER)] AS DOUBLE) AS cv
      FROM (SELECT cell_id, embedding, unnest(generate_series(1, 64)) AS pos
            FROM cseeds)
    ),
    cdist AS (
      SELECT e.vec_id, c.cell_id,
             round(sum((e.v - c.cv) * (e.v - c.cv)), 8) AS d
      FROM longe e JOIN longc c ON e.pos = c.pos
      GROUP BY e.vec_id, c.cell_id
    ),
    assign AS (
      SELECT vec_id, CAST(cell_id AS INTEGER) AS cell
      FROM (SELECT *, row_number() OVER (PARTITION BY vec_id
                                         ORDER BY d, cell_id) AS rn
            FROM cdist) WHERE rn = 1
    ),
    q AS (
      SELECT vec_id AS q_id FROM embeddings
      ORDER BY vec_id DESC LIMIT {PQ_NQ}
    ),
    probec AS (
      SELECT q_id, cell
      FROM (SELECT c.vec_id AS q_id, CAST(c.cell_id AS INTEGER) AS cell,
                   row_number() OVER (PARTITION BY c.vec_id
                                      ORDER BY c.d, c.cell_id) AS rn
            FROM cdist c JOIN q ON c.vec_id = q.q_id)
      WHERE rn <= {IVF_NPROBE}
    ),
    cand AS (
      SELECT p.q_id, a.vec_id, a.cell
      FROM probec p JOIN assign a ON a.cell = p.cell
    ),
    seeds AS (
      SELECT row_number() OVER (ORDER BY vec_id) - 1 AS code_id, embedding
      FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT {PQ_K})
    ),
    longs AS (
      SELECT code_id, pos,
             CAST((pos - 1) // {64 // PQ_M} AS INTEGER) AS sub_id,
             CAST(embedding[CAST(pos AS INTEGER)] AS DOUBLE) AS cv
      FROM (SELECT code_id, embedding, unnest(generate_series(1, 64)) AS pos
            FROM seeds)
    ),
    dist AS (
      SELECT e.vec_id, e.sub_id, s.code_id,
             round(sum((e.v - s.cv) * (e.v - s.cv)), 8) AS d
      FROM longe e JOIN longs s ON e.pos = s.pos
      GROUP BY e.vec_id, e.sub_id, s.code_id
    ),
    codes AS (
      SELECT vec_id, sub_id, code_id AS code
      FROM (SELECT *, row_number() OVER (PARTITION BY vec_id, sub_id
                                         ORDER BY d, code_id) AS rn
            FROM dist) WHERE rn = 1
    ),
    lut AS (
      SELECT l.vec_id AS q_id, l.sub_id, s.code_id,
             round(sum((l.v - s.cv) * (l.v - s.cv)), 8) AS d
      FROM longe l JOIN q ON l.vec_id = q.q_id
                  JOIN longs s ON l.pos = s.pos
      GROUP BY l.vec_id, l.sub_id, s.code_id
    ),
    adc AS (
      SELECT cd.q_id, cd.vec_id, cd.cell, round(sum(l.d), 6) AS adc
      FROM cand cd
      JOIN codes c ON c.vec_id = cd.vec_id
      JOIN lut l ON l.q_id = cd.q_id AND l.sub_id = c.sub_id
                AND l.code_id = c.code
      GROUP BY cd.q_id, cd.vec_id, cd.cell
    )
    SELECT q_id, CAST(rn AS INTEGER) AS rank, vec_id, cell, adc
    FROM (SELECT *, row_number() OVER (PARTITION BY q_id
                                       ORDER BY adc, vec_id) AS rn
          FROM adc) WHERE rn <= {PQ_TOPK}
    """


@query("q_ivfpq_search", oracle=_ivfpq_oracle(),
       tags=("llm", "similarity", "ann"))
def q_ivfpq_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ search — the production ANN index shape (Jégou et al. 2011,
    the FAISS IVFPQ architecture) composed from the two halves already
    proven separately: an IVF coarse quantizer gates candidates to the
    {IVF_NPROBE} probed cells per query, and PQ asymmetric distance
    (8 LUT adds per candidate against the 32x-compressed code table)
    ranks within them. Cells seed from the {IVF_CELLS} lowest-vec_id
    vectors (the PQ-codebook seed convention — deterministic, so the
    oracle replays the identical index; q_ann_ivf carries the TRAINED
    quantizer variant with its recall contract). Rounded-L2 8dp +
    cell_id/code_id tie-breaks everywhere; ADC rounded 6dp + vec_id.

    Scale shape: coarse assignment is one broadcast crossJoin argmin over
    the fact (map-side; one groupBy(vec_id) exchange); the cell gate is a
    broadcast equi-join on cell (probe table is {PQ_NQ}x{IVF_NPROBE}
    rows); ADC touches candidates' code rows only (map-side broadcast LUT
    join + one groupBy with partials); final top-{PQ_TOPK} compiles to
    WindowGroupLimit. The fact-scale vector column is read ONCE for
    assignment + coding; query-time work is candidate-scale — exactly
    the IVF-PQ promise."""
    from pyspark.sql import Window

    t = load(spark, sf_dir)
    emb = t.embeddings.select(
        "vec_id", _as_double(F.col("embedding")).alias("e")
    )
    cseeds = (
        t.embeddings.orderBy("vec_id")
        .limit(IVF_CELLS)
        .select(
            (F.row_number().over(Window.orderBy("vec_id")) - 1)
            .cast("int")
            .alias("cell_id"),
            _as_double(F.col("embedding")).alias("c"),
        )
    )
    cdist = emb.crossJoin(F.broadcast(cseeds)).select(
        "vec_id",
        "cell_id",
        F.round(_pq_sqdist(F.col("e"), F.col("c")), 8).alias("d"),
    )
    assign = (
        cdist.groupBy("vec_id")
        .agg(F.min(F.struct("d", "cell_id")).alias("m"))
        .select("vec_id", F.col("m.cell_id").cast("int").alias("cell"))
    )
    queries = t.embeddings.orderBy(F.desc("vec_id")).limit(PQ_NQ).select(
        F.col("vec_id").alias("q_id")
    )
    wq = Window.partitionBy("q_id").orderBy("d", "cell_id")
    probec = (
        cdist.join(F.broadcast(queries), cdist.vec_id == queries.q_id)
        .withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= IVF_NPROBE)
        .select("q_id", F.col("cell_id").cast("int").alias("cell"))
    )
    cand = assign.join(F.broadcast(probec), "cell").select(
        "q_id", "vec_id", "cell"
    )
    codebook = pq_codebook(t.embeddings)
    codes = pq_code_table(t.embeddings, codebook).select(
        "vec_id", "sub_id", "code"
    )
    qvecs = t.embeddings.orderBy(F.desc("vec_id")).limit(PQ_NQ).select(
        F.col("vec_id").alias("q_id"),
        _as_double(F.col("embedding")).alias("qe"),
    )
    lut = (
        _pq_subvectors(qvecs, "q_id", "qe")
        .join(F.broadcast(codebook), "sub_id")
        .select(
            "q_id",
            "sub_id",
            F.col("code_id").alias("code"),
            F.round(_pq_sqdist(F.col("sv"), F.col("cv")), 8).alias("d"),
        )
    )
    adc = (
        cand.join(codes, "vec_id")
        .join(F.broadcast(lut), ["q_id", "sub_id", "code"])
        .groupBy("q_id", "vec_id", "cell")
        .agg(F.round(F.sum("d"), 6).alias("adc"))
    )
    w = Window.partitionBy("q_id").orderBy("adc", "vec_id")
    return (
        adc.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= PQ_TOPK)
        .select("q_id", F.col("rank").cast("int").alias("rank"),
                "vec_id", "cell", "adc")
    )


@query(
    "q_embedding_isotropy",
    oracle="""
    WITH v AS (
      SELECT vec_id, embedding,
             sqrt(list_sum(list_transform(embedding,
                x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
      FROM embeddings
    ),
    comp AS (
      SELECT i AS dim, CAST(embedding[i] AS DOUBLE) / nrm AS c
      FROM v, unnest(generate_series(1, len(embedding))) AS t(i)
    ),
    dims AS (
      SELECT dim, sum(c) AS s FROM comp GROUP BY dim
    ),
    sq AS (SELECT sum(s * s) AS s2 FROM dims),
    norms AS (
      SELECT count(*) AS n, avg(nrm) AS mean_norm,
             stddev_samp(nrm) AS std_norm
      FROM v
    )
    SELECT CAST(n AS BIGINT) AS n,
           round(mean_norm, 6) AS mean_norm,
           round(std_norm, 6) AS std_norm,
           round((s2 - n) / (n * CAST(n - 1 AS DOUBLE)), 6)
             AS avg_pairwise_cos,
           round(sqrt(s2) / n, 6) AS mean_cos_to_centroid
    FROM norms CROSS JOIN sq
    """,
    tags=("llm", "similarity", "quality"),
)
def q_embedding_isotropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space quality audit: norm distribution plus the EXACT
    mean pairwise cosine of the whole corpus — computed WITHOUT pairs,
    via the identity Σᵢ≠ⱼ cos(i,j) = ‖Σ v̂ᵢ‖² − n (v̂ = unit-normalized).
    High mean pairwise cosine = anisotropic, common-direction-dominated
    embeddings (the 'representation degeneration' failure that tanks
    retrieval and clustering; Mu & Viswanath 2018's audit target), and
    mean cosine to the centroid = ‖Σv̂‖/n falls out of the same sum.

    Scale shape: normalize map-side, ONE dim-grain exchange (explode to
    64·n component rows, groupBy(dim) — partial-aggregated, so the
    shuffle carries 64 partials per map task), square-sum the 64-row
    result. An O(n²) statistic at O(n) cost — the reason to ship the
    identity instead of sampling pairs."""
    t = load(spark, sf_dir)
    emb_d = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    nrm = F.sqrt(
        F.aggregate(
            emb_d, F.lit(0.0), lambda a, x: a + x * x
        )
    )
    v = t.embeddings.select(
        "vec_id", emb_d.alias("e"), nrm.alias("nrm")
    )
    comp = v.select(
        F.posexplode(F.col("e")).alias("dim0", "x"),
        F.col("nrm"),
    ).select(
        (F.col("dim0") + 1).alias("dim"),
        (F.col("x") / F.col("nrm")).alias("c"),
    )
    dims = comp.groupBy("dim").agg(F.sum("c").alias("s"))
    sq = dims.agg(F.sum(F.col("s") * F.col("s")).alias("s2"))
    norms = v.agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("nrm").alias("mean_norm"),
        F.stddev_samp("nrm").alias("std_norm"),
    )
    return norms.crossJoin(F.broadcast(sq)).select(
        F.col("n").cast("bigint").alias("n"),
        F.round(F.col("mean_norm"), 6).alias("mean_norm"),
        F.round(F.col("std_norm"), 6).alias("std_norm"),
        F.round(
            (F.col("s2") - F.col("n"))
            / (F.col("n") * (F.col("n") - 1).cast("double")),
            6,
        ).alias("avg_pairwise_cos"),
        F.round(F.sqrt(F.col("s2")) / F.col("n"), 6).alias(
            "mean_cos_to_centroid"
        ),
    )
