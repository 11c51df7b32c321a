"""Corpus-curation operators (SURVEY §2.L extension): the pretraining-prep
steps between "cleaned documents" and "training batches" —

- sequence packing: concatenate the corpus in a canonical order and chunk
  it into fixed token-budget bins (the standard packing strategy that
  avoids padding waste);
- benchmark contamination detection: which training docs share long
  n-grams with an evaluation set (decontamination's detection pass);
- deterministic hash sampling: an exactly-reproducible k-document sample
  via content-independent hash ranking (the cross-engine-stable form of
  "random sample" that makes pipeline reruns and audits possible).

All three are exactly SQL-expressible, so each is hash-checked against the
DuckDB oracle — no tolerance verdicts needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import query

#: Token budget per packed bin (a context-window-sized constant).
PACK_BUDGET = 2048


@query(
    "q_pack_sequences",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      FROM documents
    ),
    cum AS (
      SELECT doc_id, n_tokens,
             sum(n_tokens) OVER (ORDER BY doc_id
                                 ROWS UNBOUNDED PRECEDING) AS cum_tokens
      FROM toks
    )
    SELECT doc_id, n_tokens,
           CAST((cum_tokens - n_tokens) // {PACK_BUDGET} AS BIGINT) AS bin
    FROM cum
    """,
    tags=("llm", "curation", "packing"),
)
def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing, concat-then-chunk: documents concatenate in
    canonical doc_id order and split into PACK_BUDGET(=2048)-token bins; each
    document's bin is the one its FIRST token lands in (floor of the
    exclusive running total / budget). This is the packing layout used to
    eliminate padding in pretraining batches; emitting (doc_id → bin)
    makes the layout joinable/auditable rather than materialized.

    Scale shape: the global running total uses the two-pass range plan
    (ranking.global_running_sum) — per-range running sums in parallel plus
    a broadcast prefix of range totals — so no fact-scale single-partition
    window exists anywhere (the naive formulation is exactly the
    q_surrogate_key scale-killer)."""
    from ..ranking import global_running_sum

    t = load(spark, sf_dir)
    toks = t.documents.select(
        "doc_id",
        F.size(F.split("text", " ")).cast("bigint").alias("n_tokens"),
    )
    cum = global_running_sum(
        toks, "n_tokens", "doc_id", out_col="cum_tokens"
    )
    return cum.select(
        "doc_id",
        "n_tokens",
        F.floor((F.col("cum_tokens") - F.col("n_tokens")) / PACK_BUDGET)
        .cast("bigint")
        .alias("bin"),
    )


@query(
    "q_contamination",
    oracle="""
    WITH grams AS (
      SELECT doc_id,
             unnest(list_distinct(list_transform(
               range(1, greatest(len(string_split(text, ' ')) - 7, 1) + 1),
               i -> concat_ws(' ',
                    string_split(text, ' ')[i],   string_split(text, ' ')[i+1],
                    string_split(text, ' ')[i+2], string_split(text, ' ')[i+3],
                    string_split(text, ' ')[i+4], string_split(text, ' ')[i+5],
                    string_split(text, ' ')[i+6], string_split(text, ' ')[i+7])
             ))) AS gram
      FROM documents
    )
    SELECT t.doc_id AS train_doc_id,
           CAST(count(DISTINCT t.gram) AS BIGINT) AS n_shared_8grams
    FROM (SELECT * FROM grams WHERE doc_id >= 20) t
    JOIN (SELECT DISTINCT gram FROM grams WHERE doc_id < 20) e
      ON t.gram = e.gram
    GROUP BY t.doc_id
    """,
    tags=("llm", "curation", "decontamination"),
)
def q_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination detection: training documents (doc_id ≥ 20)
    that share at least one 8-token n-gram with the evaluation set
    (doc_id < 20), with the count of distinct shared 8-grams — the
    detection pass of decontamination (the removal step is then an
    anti-join on train_doc_id). 8-grams are the community-standard overlap
    unit: long enough that coincidental collisions are rare, short enough
    to catch paraphrase-free leakage.

    Scale shape: the eval side's distinct 8-gram set is benchmark-sized
    (tiny vs the corpus), so it BROADCASTS; the corpus explodes its grams
    once and semi-matches map-side — no corpus self-join, no shuffle of
    the training side beyond the final per-doc count."""
    t = load(spark, sf_dir)
    from .dedup import shingles

    grams = t.documents.select(
        "doc_id",
        F.explode(
            F.array_distinct(shingles(F.split(F.col("text"), " "), n=8))
        ).alias("gram"),
    )
    eval_grams = grams.filter(F.col("doc_id") < 20).select("gram").distinct()
    train = grams.filter(F.col("doc_id") >= 20)
    return (
        train.join(F.broadcast(eval_grams), "gram")
        .groupBy(F.col("doc_id").alias("train_doc_id"))
        .agg(F.countDistinct("gram").alias("n_shared_8grams"))
    )


@query(
    "q_sample_hash",
    oracle="""
    SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS hkey
    FROM documents
    ORDER BY hkey, doc_id
    LIMIT 100
    """,
    tags=("llm", "curation", "sampling"),
)
def q_sample_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic k-document sample by hash ranking: order by
    md5(doc_id) and take the first k. Statistically uniform (the hash
    scrambles any id ordering) yet exactly reproducible across engines,
    reruns, and cluster layouts — unlike seeded Bernoulli sampling
    (q_sample), whose row set is partitioning-dependent. This is how a
    100 TB pipeline takes the SAME audit sample every run, and it
    hash-checks exactly (md5 of the decimal string is engine-neutral).

    Scale shape: orderBy+limit plans as TakeOrdered — per-partition top-k
    then a k-row merge on one reducer; the corpus itself never globally
    sorts."""
    t = load(spark, sf_dir)
    return (
        t.documents.select(
            "doc_id",
            F.md5(F.encode(F.col("doc_id").cast("string"), "UTF-8")).alias(
                "hkey"
            ),
        )
        .orderBy("hkey", "doc_id")
        .limit(100)
    )
