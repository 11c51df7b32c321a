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
        # integer `div`, not floor(double /): bigint/int promotes to double,
        # which silently loses exactness once cum_tokens exceeds 2^53 —
        # `div` matches the oracle's integer // at any corpus size.
        F.expr(f"(cum_tokens - n_tokens) div {PACK_BUDGET}")
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


@query(
    "q_repetition_filter",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS tk FROM documents
    ),
    grams AS (
      SELECT doc_id,
             list_transform(range(1, greatest(len(tk) - 1, 1) + 1),
                            i -> concat_ws(' ', tk[i], tk[i+1])) AS g2
      FROM toks
    )
    SELECT doc_id,
           CAST(len(g2) AS BIGINT)                AS n_bigrams,
           round(1.0 - CAST(len(list_distinct(g2)) AS DOUBLE)
                       / len(g2), 6)              AS dup_bigram_frac,
           (1.0 - CAST(len(list_distinct(g2)) AS DOUBLE) / len(g2))
             <= 0.2                               AS passes_gate
    FROM grams
    """,
    tags=("llm", "curation", "quality"),
)
def q_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition-ratio quality gate (the Gopher/FineWeb-style rule):
    fraction of duplicated word bigrams per document — generated/looping
    text repeats n-grams far above natural prose, so a duplicate-bigram
    fraction over ~0.2 flags boilerplate, keyword stuffing, and decoding
    loops. Pure column expressions (split → transform → array_distinct
    size arithmetic): one scan, no shuffle, no UDF — a 100 TB gate is a
    map-only pass."""
    t = load(spark, sf_dir)
    from .dedup import shingles

    g2 = shingles(F.split(F.col("text"), " "), n=2)
    n = F.size(g2)
    n_dist = F.size(F.array_distinct(g2))
    frac = 1.0 - n_dist.cast("double") / n
    return t.documents.select(
        "doc_id",
        n.cast("bigint").alias("n_bigrams"),
        F.round(frac, 6).alias("dup_bigram_frac"),
        (frac <= 0.2).alias("passes_gate"),
    )


@query(
    "q_unigram_logprob",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w
      FROM documents
    ),
    freq AS (
      SELECT w, count(*) AS n FROM tok GROUP BY w
    ),
    total AS (SELECT sum(n) AS t FROM freq)
    SELECT tok.doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           round(avg(ln(freq.n / total.t)), 6) AS mean_logprob
    FROM tok JOIN freq ON tok.w = freq.w CROSS JOIN total
    GROUP BY tok.doc_id
    """,
    tags=("llm", "curation", "quality"),
)
def q_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram log-probability quality proxy: each document's mean
    ln p(token) under the corpus's own unigram distribution — the cheap
    stand-in for model perplexity that curation pipelines use to rank
    text quality and to weight importance sampling (very low scores =
    gibberish/rare-token soup; very high = trivially repetitive).

    Scale shape: the unigram table is vocabulary-sized → broadcast back
    onto the exploded tokens (map-side join); the corpus shuffles only
    for the per-doc mean. The corpus-total scalar rides along as a
    broadcast literal join."""
    t = load(spark, sf_dir)
    tok = t.documents.select(
        "doc_id", F.explode(F.split(F.lower(F.col("text")), " ")).alias("w")
    )
    freq = tok.groupBy("w").agg(F.count(F.lit(1)).alias("n"))
    total = freq.agg(F.sum("n").alias("t"))
    return (
        tok.join(F.broadcast(freq), "w")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(F.avg(F.log(F.col("n") / F.col("t"))), 6).alias(
                "mean_logprob"
            ),
        )
    )


@query(
    "q_mix_temperature",
    oracle="""
    WITH counts AS (
      SELECT source, count(*) AS n_docs,
             CAST(sum(n_chars) AS BIGINT) AS n_chars_total
      FROM documents GROUP BY source
    ),
    scaled AS (
      SELECT *, pow(n_docs, 0.7) AS w FROM counts
    )
    SELECT source, n_docs, n_chars_total,
           round(w / sum(w) OVER (), 8)                   AS mix_weight,
           round((w / sum(w) OVER ())
                 / (n_docs / CAST(sum(n_docs) OVER () AS DOUBLE)), 8)
             AS upsample_factor
    FROM scaled
    """,
    tags=("llm", "curation", "mixing"),
)
def q_mix_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled dataset mixing weights (T = 0.7): per source,
    sampling weight ∝ count^T normalized — the mixture schedule that
    up-samples small high-quality sources relative to their natural
    proportion (T = 1 is natural sampling, T = 0 is uniform). Emits the
    weight and the implied up/down-sampling factor per source — the
    numbers a training-data loader consumes.

    Scale shape: one count aggregation over the corpus; the temperature
    math runs over the #sources-row summary (the window here is
    summary-scale by construction — sources are a dimension)."""
    t = load(spark, sf_dir)
    from pyspark.sql import Window

    counts = t.documents.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("n_chars_total"),
    )
    w_all = Window.partitionBy()
    w = F.pow(F.col("n_docs"), 0.7)
    mix = w / F.sum(w).over(w_all)
    natural = F.col("n_docs") / F.sum("n_docs").over(w_all).cast("double")
    return counts.select(
        "source",
        "n_docs",
        "n_chars_total",
        F.round(mix, 8).alias("mix_weight"),
        F.round(mix / natural, 8).alias("upsample_factor"),
    )


#: DSIR hashed-feature space size. 1024 buckets is summary-scale (the
#: per-bucket tables broadcast) while keeping hash collisions rare enough
#: on this corpus's vocabulary for the ratio estimates to be informative.
DSIR_BUCKETS = 1024


@query(
    "q_dsir_weights",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, lang,
             unnest(string_split(lower(text), ' ')) AS tok
      FROM documents
    ),
    b AS (
      SELECT doc_id, lang,
             CAST(CAST(concat('0x', substr(md5(tok), 1, 8)) AS UBIGINT)
                  % {DSIR_BUCKETS} AS BIGINT) AS bkt
      FROM tok
    ),
    src AS (SELECT bkt, count(*) AS cs FROM b GROUP BY bkt),
    tgt AS (SELECT bkt, count(*) AS ct FROM b WHERE lang = 'en' GROUP BY bkt),
    tot AS (SELECT (SELECT count(*) FROM b WHERE lang = 'en') AS nt,
                   (SELECT count(*) FROM b) AS ns),
    lr AS (
      SELECT src.bkt,
             ln((coalesce(tgt.ct, 0) + 1.0) / (tot.nt + {DSIR_BUCKETS}))
               - ln((src.cs + 1.0) / (tot.ns + {DSIR_BUCKETS})) AS logr
      FROM src LEFT JOIN tgt USING (bkt) CROSS JOIN tot
    )
    SELECT b.doc_id,
           count(*)                 AS n_tokens,
           round(sum(lr.logr), 6)   AS dsir_logweight
    FROM b JOIN lr USING (bkt)
    GROUP BY b.doc_id
    """,
    tags=("llm", "curation", "sampling"),
)
def q_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights (Data Selection via Importance Resampling,
    Xie et al. 2023): per-document log importance weight of a TARGET
    distribution (here lang='en') against the raw SOURCE corpus, in a
    hashed unigram feature space — the standard cheap proxy for "select
    raw web data that looks like the high-quality target". Downstream, a
    Gumbel top-k over ``dsir_logweight`` resamples the corpus toward the
    target; emitting (doc_id, n_tokens, weight) keeps that choice to the
    consumer, like q_mix_temperature.

    Bucket hash is md5-prefix based (``conv(substr(md5(tok),1,8),16,10) %
    {DSIR_BUCKETS}``) — engine-neutral, so the oracle reproduces the
    EXACT bucket assignment (the q_sample_hash technique); add-1
    smoothing on both distributions bounds unseen-bucket ratios.

    Scale shape: ONE fact-scale groupBy(bucket) aggregate (source and
    target counts as conditional aggregates in the same pass, totals
    summed from the {DSIR_BUCKETS}-row result) collapses map-side; the
    per-bucket log-ratio table BROADCASTS onto the token stream (no
    fact-scale shuffle for the scoring join); the only remaining
    fact-scale exchange is the final groupBy(doc_id) fold — the corpus
    tokenizes exactly twice (stats pass + scoring pass), never cached.
    Nothing driver-side, nothing quadratic;
    at 100 TB the feature tables stay {DSIR_BUCKETS} rows regardless of
    corpus size."""
    t = load(spark, sf_dir)
    return dsir_logweights(t.documents)


def dsir_logweights(documents: DataFrame) -> DataFrame:
    """DSIR weights core: (doc_id, n_tokens, dsir_logweight) per document,
    weight rounded to the declared 6-digit output precision. Factored out
    of q_dsir_weights so q_dsir_resample selects over the IDENTICAL
    values the weights query emits."""
    tok = documents.select(
        "doc_id",
        "lang",
        F.explode(F.split(F.lower("text"), " ")).alias("tok"),
    ).withColumn(
        "bkt",
        (
            F.conv(F.substring(F.md5("tok"), 1, 8), 16, 10).cast("bigint")
            % DSIR_BUCKETS
        ),
    )
    # ONE stats pass over the token stream: per-bucket source count plus
    # conditional target count; corpus totals come from summing the
    # 1024-row result (a window over the summary, not a second scan).
    from pyspark.sql import Window

    stats = tok.groupBy("bkt").agg(
        F.count(F.lit(1)).alias("cs"),
        F.count(F.when(F.col("lang") == "en", 1)).alias("ct"),
    )
    w_all = Window.partitionBy()
    lr = stats.select(
        "bkt",
        (
            F.log(
                (F.col("ct") + 1.0)
                / (F.sum("ct").over(w_all) + DSIR_BUCKETS)
            )
            - F.log(
                (F.col("cs") + 1.0)
                / (F.sum("cs").over(w_all) + DSIR_BUCKETS)
            )
        ).alias("logr"),
    )
    return (
        tok.join(F.broadcast(lr), "bkt")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(F.sum("logr"), 6).alias("dsir_logweight"),
        )
    )


#: Documents drawn by the Gumbel-top-k resampler.
DSIR_SAMPLE_K = 200


@query(
    "q_dsir_resample",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, lang,
             unnest(string_split(lower(text), ' ')) AS tok
      FROM documents
    ),
    b AS (
      SELECT doc_id, lang,
             CAST(CAST(concat('0x', substr(md5(tok), 1, 8)) AS UBIGINT)
                  % {DSIR_BUCKETS} AS BIGINT) AS bkt
      FROM tok
    ),
    src AS (SELECT bkt, count(*) AS cs FROM b GROUP BY bkt),
    tgt AS (SELECT bkt, count(*) AS ct FROM b WHERE lang = 'en' GROUP BY bkt),
    tot AS (SELECT (SELECT count(*) FROM b WHERE lang = 'en') AS nt,
                   (SELECT count(*) FROM b) AS ns),
    lr AS (
      SELECT src.bkt,
             ln((coalesce(tgt.ct, 0) + 1.0) / (tot.nt + {DSIR_BUCKETS}))
               - ln((src.cs + 1.0) / (tot.ns + {DSIR_BUCKETS})) AS logr
      FROM src LEFT JOIN tgt USING (bkt) CROSS JOIN tot
    ),
    w AS (
      SELECT b.doc_id, round(sum(lr.logr), 6) AS dsir_logweight
      FROM b JOIN lr USING (bkt)
      GROUP BY b.doc_id
    ),
    keyed AS (
      SELECT doc_id, dsir_logweight,
             round(dsir_logweight - ln(-ln(
               (CAST(concat('0x', substr(md5(concat('dsir-resample-',
                  CAST(doc_id AS VARCHAR))), 1, 8)) AS UBIGINT) + 0.5)
               / 4294967296.0)), 6) AS gumbel_key
      FROM w
    )
    SELECT doc_id, dsir_logweight, gumbel_key
    FROM keyed
    ORDER BY gumbel_key DESC, doc_id
    LIMIT {DSIR_SAMPLE_K}
    """,
    tags=("llm", "curation", "sampling"),
)
def q_dsir_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The selection step DSIR weights exist for: Gumbel-top-k sampling
    WITHOUT replacement of {DSIR_SAMPLE_K} documents ∝ exp(dsir_logweight)
    — add an independent standard Gumbel to each log weight and take the
    top k (the Gumbel-max trick; equivalent to sequential weighted
    draws). The Gumbel is DERANDOMIZED the q_sample_hash way: u comes
    from an md5 of a salted doc_id ((v+0.5)/2^32 with v the 32-bit hash
    prefix), so the sample is exactly reproducible across engines, reruns
    and layouts — a seeded audit sample, not partitioning-dependent
    Bernoulli noise.

    Batch-invariance contract (the ANN rounded-rank lesson): the ranking
    key is round(logweight + gumbel, 6) with doc_id tie-break — a total
    order identical in both engines up to exact decimal-half landings
    (measure-zero for float-computed keys).

    Scale shape: the weights plan (see dsir_logweights) plus ONE
    TakeOrdered(k) — per-partition top-k, k-row driver merge; the corpus
    never globally sorts."""
    t = load(spark, sf_dir)
    w = dsir_logweights(t.documents)
    v = F.conv(
        F.substring(
            F.md5(
                F.encode(
                    F.concat(
                        F.lit("dsir-resample-"),
                        F.col("doc_id").cast("string"),
                    ),
                    "UTF-8",
                )
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("bigint")
    u = (v + F.lit(0.5)) / F.lit(float(2**32))
    return (
        w.select(
            "doc_id",
            "dsir_logweight",
            F.round(
                F.col("dsir_logweight") - F.log(-F.log(u)), 6
            ).alias("gumbel_key"),
        )
        .orderBy(F.desc("gumbel_key"), "doc_id")
        .limit(DSIR_SAMPLE_K)
    )


#: Max documents kept per source domain by the cap.
DOMAIN_CAP = 15


@query(
    "q_domain_cap",
    oracle=f"""
    WITH ranked AS (
      SELECT doc_id, source,
             row_number() OVER (
               PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
             ) AS keep_rank
      FROM documents
    )
    SELECT doc_id, source, CAST(keep_rank AS BIGINT) AS keep_rank
    FROM ranked WHERE keep_rank <= {DOMAIN_CAP}
    """,
    tags=("llm", "curation", "sampling"),
)
def q_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain document cap: keep at most {DOMAIN_CAP} docs per source,
    chosen by deterministic hash rank — the Common-Crawl-style guard
    against a handful of template-heavy domains dominating a pretraining
    mix. Hash ranking (md5 of the doc_id string, the q_sample_hash
    technique) makes the survivor set uniform-within-domain AND exactly
    reproducible across engines, reruns and layouts; emitting
    (doc_id, source, keep_rank) keeps the cut auditable and joinable.

    Scale shape: rank-filter windows compile to WindowGroupLimit in
    Spark 4 — a PARTIAL per-map-partition top-{DOMAIN_CAP} runs BEFORE
    the exchange, so a mega-domain ships at most {DOMAIN_CAP} rows per
    upstream partition instead of its full row count; the skew a naive
    per-domain window would funnel into one task is bounded at the map
    side (plan-pinned in tests/test_plans.py)."""
    t = load(spark, sf_dir)
    from pyspark.sql import Window

    w = Window.partitionBy("source").orderBy(
        F.md5(F.encode(F.col("doc_id").cast("string"), "UTF-8")), "doc_id"
    )
    return (
        t.documents.select("doc_id", "source")
        .withColumn("keep_rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("keep_rank") <= DOMAIN_CAP)
    )
