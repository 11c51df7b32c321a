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
from .text import QC_BUCKETS, QC_MOD, QC_SHIFT

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
    return unigram_doc_scores(t.documents)


def unigram_doc_scores(documents: DataFrame) -> DataFrame:
    """Per-document unigram-LM quality scores (doc_id, n_tokens,
    mean_logprob) — factored out of q_unigram_logprob so
    q_perplexity_buckets buckets the IDENTICAL values."""
    tok = documents.select(
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
    return (
        w.select(
            "doc_id",
            "dsir_logweight",
            dsir_gumbel_key().alias("gumbel_key"),
        )
        .orderBy(F.desc("gumbel_key"), "doc_id")
        .limit(DSIR_SAMPLE_K)
    )


def dsir_gumbel_key():
    """Derandomized Gumbel ranking key over a `dsir_logweight` column:
    round(logweight + Gumbel(u), 6) with u = (md5-32bit(salted doc_id)
    + 0.5) / 2^32 — the q_dsir_resample expression, factored so composed
    pipelines (q_pipeline_pretrain) rank by the IDENTICAL key."""
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
    return F.round(F.col("dsir_logweight") - F.log(-F.log(u)), 6)


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


#: q_pipeline_pretrain gate bounds: the q_quality_score length gate plus
#: the q_repetition_filter duplicate-bigram ceiling.
PRETRAIN_MIN_CHARS = 80
PRETRAIN_MAX_CHARS = 2000
PRETRAIN_MAX_DUP_BIGRAM_FRAC = 0.2


@query(
    "q_pipeline_pretrain",
    oracle=f"""
    WITH gated AS (
      SELECT doc_id, source, lang, text
      FROM (SELECT *, string_split(text, ' ') AS tk FROM documents)
      WHERE length(text) BETWEEN {PRETRAIN_MIN_CHARS} AND {PRETRAIN_MAX_CHARS}
        AND (1.0 - CAST(len(list_distinct(list_transform(
               range(1, greatest(len(tk) - 1, 1) + 1),
               i -> concat_ws(' ', tk[i], tk[i+1])))) AS DOUBLE)
             / len(list_transform(range(1, greatest(len(tk) - 1, 1) + 1),
               i -> concat_ws(' ', tk[i], tk[i+1]))))
            <= {PRETRAIN_MAX_DUP_BIGRAM_FRAC}
    ),
    exact AS (
      SELECT doc_id, source, lang, text FROM (
        SELECT *, min(doc_id) OVER (PARTITION BY md5(text)) AS keep
        FROM gated
      ) WHERE doc_id = keep
    ),
    sh AS (
      SELECT doc_id, list_distinct(list_transform(
        range(1, greatest(len(string_split(text, ' ')) - 2, 1) + 1),
        i -> concat_ws(' ', string_split(text, ' ')[i],
                       string_split(text, ' ')[i+1],
                       string_split(text, ' ')[i+2])
      )) AS s
      FROM exact
    ),
    grams AS (SELECT doc_id, unnest(s) AS gram FROM sh),
    sizes AS (SELECT doc_id, len(s) AS n FROM sh),
    inter AS (
      SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS n_common
      FROM grams a JOIN grams b ON a.gram = b.gram AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    dropped AS (
      SELECT DISTINCT i.b_id AS doc_id
      FROM inter i JOIN sizes sa ON sa.doc_id = i.a_id
                   JOIN sizes sb ON sb.doc_id = i.b_id
      WHERE i.n_common * 10 >= (sa.n + sb.n - i.n_common) * 8
    ),
    near AS (
      SELECT * FROM exact WHERE doc_id NOT IN (SELECT doc_id FROM dropped)
    ),
    capped AS (
      SELECT doc_id, source, lang, text FROM (
        SELECT *, row_number() OVER (
          PARTITION BY source
          ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
        FROM near
      ) WHERE rk <= {DOMAIN_CAP}
    ),
    tok AS (
      SELECT doc_id, lang, unnest(string_split(lower(text), ' ')) AS tok
      FROM capped
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
      SELECT b.doc_id, count(*) AS n_tokens,
             round(sum(lr.logr), 6) AS dsir_logweight
      FROM b JOIN lr USING (bkt)
      GROUP BY b.doc_id
    ),
    keyed AS (
      SELECT doc_id, n_tokens, dsir_logweight,
             round(dsir_logweight - ln(-ln(
               (CAST(concat('0x', substr(md5(concat('dsir-resample-',
                  CAST(doc_id AS VARCHAR))), 1, 8)) AS UBIGINT) + 0.5)
               / 4294967296.0)), 6) AS gumbel_key
      FROM w
    ),
    sel AS (
      SELECT * FROM keyed ORDER BY gumbel_key DESC, doc_id
      LIMIT {DSIR_SAMPLE_K}
    ),
    cum AS (
      SELECT doc_id, n_tokens, dsir_logweight, gumbel_key,
             sum(n_tokens) OVER (ORDER BY doc_id
                                 ROWS UNBOUNDED PRECEDING) AS cum_tokens
      FROM sel
    )
    SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
           dsir_logweight, gumbel_key,
           CAST((cum_tokens - n_tokens) // {PACK_BUDGET} AS BIGINT) AS bin
    FROM cum
    """,
    tags=("llm", "curation", "pipeline"),
)
def q_pipeline_pretrain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FULL pretraining-curation chain as ONE composed DataFrame
    program (the FineWeb/DSIR production shape — VERDICT r7 item 2), every
    stage the exact semantics of its standalone query:

    1. quality + repetition gate (q_quality_score length bounds +
       q_repetition_filter bigram ceiling) — map-only, fused with scan;
    2. exact dedup (q_dedup_exact policy: keep min doc_id per md5(text))
       — one hash shuffle, window-min filter, no join;
    3. near dedup — near_dup_pairs (the q_dedup_near MinHash+LSH +
       exact-verify core) over the survivors; a document is dropped iff
       it has ANY near-duplicate (jaccard ≥ 0.8) with a smaller doc_id —
       the deterministic greedy rule (anti-join on pair b-side), which
       needs no cluster fixpoint;
    4. per-domain cap (q_domain_cap: hash-rank row_number ≤ {DOMAIN_CAP},
       WindowGroupLimit map-side top-k);
    5. DSIR weights + derandomized Gumbel-top-{DSIR_SAMPLE_K} resample
       toward lang='en' (q_dsir_weights / q_dsir_resample, with the
       source/target statistics measured over the CURATED corpus — the
       production order: dedup before selection, so duplicate mass
       cannot skew the importance estimates);
    6. sequence packing of the selected docs (q_pack_sequences: two-pass
       global running sum → {PACK_BUDGET}-token bins).

    Output: one row per selected document — (doc_id, n_tokens,
    dsir_logweight, gumbel_key, bin) — deterministic and fully
    hash-checkable against the oracle, which mirrors the chain stage for
    stage.

    Scale shape: stages 1-2 are a single scan + ONE content-hash
    exchange; stage 3 inherits near_dup_pairs' bucketed-not-all-pairs
    guarantee (banded candidates only) and the anti-join shuffles only
    the pair list's b-side ids; stage 4 ships ≤{DOMAIN_CAP} rows per map
    partition per domain; stage 5 broadcasts the {DSIR_BUCKETS}-row
    feature table (no fact-scale scoring shuffle) and TakeOrdereds k
    rows; stage 6 runs over the k-row selection. The survivor set
    localCheckpoints ONCE (it feeds pair generation, the anti-join, and
    the cap) — everything else streams stage into stage; no collect, no
    cartesian, no global sort of anything corpus-sized."""
    from pyspark.sql import Window

    from ..ranking import global_running_sum
    from .dedup import near_dup_pairs, shingles

    t = load(spark, sf_dir)
    docs = t.documents.select("doc_id", "source", "lang", "text")

    # Stage 1: quality + repetition gate (pure column exprs, map-only).
    g2 = shingles(F.split(F.col("text"), " "), n=2)
    rep_frac = 1.0 - F.size(F.array_distinct(g2)).cast("double") / F.size(g2)
    gated = docs.filter(
        (F.length("text") >= PRETRAIN_MIN_CHARS)
        & (F.length("text") <= PRETRAIN_MAX_CHARS)
        & (rep_frac <= PRETRAIN_MAX_DUP_BIGRAM_FRAC)
    )

    # Stage 2: exact dedup — window-min over the content hash keeps the
    # smallest doc_id per identical text without a self-join.
    w_hash = Window.partitionBy(F.md5("text"))
    exact = (
        gated.withColumn("_keep", F.min("doc_id").over(w_hash))
        .filter(F.col("doc_id") == F.col("_keep"))
        .drop("_keep")
        .localCheckpoint()
    )

    # Stage 3: near dedup — greedy drop of every pair's larger id.
    dropped = near_dup_pairs(exact).select(
        F.col("b_id").alias("doc_id")
    ).distinct()
    near = exact.join(dropped, "doc_id", "left_anti")

    # Stage 4: per-domain cap (hash-rank row_number → WindowGroupLimit).
    w_cap = Window.partitionBy("source").orderBy(
        F.md5(F.encode(F.col("doc_id").cast("string"), "UTF-8")), "doc_id"
    )
    # Materialize the curated corpus ONCE before selection: DSIR's stats
    # and scoring passes each tokenize their input, so an unmaterialized
    # `capped` would re-run the pair join + anti-join + cap window per
    # pass (measured 9 -> ~4 s at sf0.01). At 100 TB this checkpoint IS
    # the silver write a production pipeline does between curation and
    # selection.
    capped = (
        near.withColumn("_rk", F.row_number().over(w_cap))
        .filter(F.col("_rk") <= DOMAIN_CAP)
        .drop("_rk")
        .localCheckpoint()
    )

    # Stage 5: DSIR weights over the curated corpus + Gumbel-top-k.
    sel = (
        dsir_logweights(capped)
        .withColumn("gumbel_key", dsir_gumbel_key())
        .orderBy(F.desc("gumbel_key"), "doc_id")
        .limit(DSIR_SAMPLE_K)
    )

    # Stage 6: pack the selection into fixed token-budget bins.
    cum = global_running_sum(sel, "n_tokens", "doc_id", out_col="cum_tokens")
    return cum.select(
        "doc_id",
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        "dsir_logweight",
        "gumbel_key",
        F.expr(f"(cum_tokens - n_tokens) div {PACK_BUDGET}")
        .cast("bigint")
        .alias("bin"),
    )


@query(
    "q_bigram_logprob",
    oracle="""
    WITH tok AS (
      SELECT doc_id, string_split(lower(text), ' ') AS tk FROM documents
    ),
    big AS (
      SELECT doc_id, tk[CAST(i AS INTEGER)] AS prev,
             tk[CAST(i AS INTEGER) + 1] AS cur
      FROM (SELECT doc_id, tk,
                   unnest(generate_series(1, len(tk) - 1)) AS i
            FROM tok WHERE len(tk) >= 2)
    ),
    c2 AS (SELECT prev, cur, count(*) AS n2 FROM big GROUP BY 1, 2),
    c1 AS (SELECT prev, count(*) AS n1 FROM big GROUP BY 1),
    v AS (SELECT count(DISTINCT w) AS v
          FROM (SELECT unnest(tk) AS w FROM tok))
    SELECT big.doc_id,
           CAST(count(*) AS BIGINT) AS n_bigrams,
           round(avg(ln((n2 + 1.0) / (n1 + v))), 6) AS mean_logprob
    FROM big JOIN c2 USING (prev, cur) JOIN c1 USING (prev) CROSS JOIN v
    GROUP BY big.doc_id
    """,
    tags=("llm", "curation", "quality"),
)
def q_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram language-model quality proxy (the CCNet shape, Wenzek et
    al. 2020: score web text under a small LM trained on the corpus
    itself and filter/bucket by perplexity): per document, the mean
    ln P(w_i | w_{i-1}) under an add-1-smoothed bigram LM whose counts
    come from the corpus — the next step up from q_unigram_logprob
    (context-aware: word salad with plausible unigrams scores low here).
    Documents with fewer than two tokens have no bigram events and are
    excluded, as in the oracle.

    Scale shape (the q_unigram_logprob pattern, one model-order up): the
    bigram pair stream comes from a MAP-ONLY native arrays_zip of two
    token-array slices — no posexplode+lead window (which would shuffle
    the corpus by doc just to pair neighbors) and no higher-order-function
    lambda (interpreted, measured ~5x slower per corpus pass — see body
    comment); the corpus is paired exactly twice (model pass + scoring
    pass, the DSIR contract); the bigram-count model c2 is ONE fact-scale
    groupBy materialized at vocabulary grain and the context model c1
    folds from it; both BROADCAST back onto the pair stream (at
    web-crawl bigram-vocabulary sizes past the broadcast cap this join
    degrades to a shuffle join keyed on the pair — the token_rank
    guard's regime note applies); the vocabulary-size scalar rides as a
    1-row broadcast crossJoin; the only other fact-scale exchange is the
    final per-doc mean."""
    t = load(spark, sf_dir)
    tk = F.split(F.lower("text"), " ")
    n = F.size(tk)
    # Bigram events from arrays_zip(slice, slice) — ALL native codegen
    # expressions, no higher-order-function lambda: the element_at and
    # shingle formulations run interpreted and measured 1.8 s per corpus
    # pass at sf0.1 vs 0.4 s for this shape. slice length n-1 is 0 for
    # single-token docs (empty zip, zero events), matching the oracle's
    # len >= 2 gate, which the filter keeps explicit.
    zipped = F.arrays_zip(F.slice(tk, 1, n - 1), F.slice(tk, 2, n - 1))
    big = (
        t.documents.filter(n >= 2)
        .select("doc_id", F.explode(zipped).alias("p"))
        .select(
            "doc_id",
            F.col("p.0").alias("prev"),
            F.col("p.1").alias("cur"),
        )
    )
    # Materialize the vocabulary-scale count model once: the pair stream
    # would otherwise re-execute per consumer (c2 build, c1 fold).
    c2 = (
        big.groupBy("prev", "cur")
        .agg(F.count(F.lit(1)).alias("n2"))
        .localCheckpoint()
    )
    c1 = c2.groupBy("prev").agg(F.sum("n2").alias("n1"))
    v = t.documents.select(F.explode(tk).alias("w")).agg(
        F.countDistinct("w").alias("v")
    )
    return (
        big.join(F.broadcast(c2), ["prev", "cur"])
        .join(F.broadcast(c1), "prev")
        .crossJoin(F.broadcast(v))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(
                F.avg(F.log((F.col("n2") + 1.0) / (F.col("n1") + F.col("v")))), 6
            ).alias("mean_logprob"),
        )
    )


#: Span-corruption constants: a position starts a mask span when its
#: 32-bit hash falls below floor(0.05 * 2^32); spans run SPAN_LEN tokens
#: and overlapping spans union.
SPAN_START_P32 = 214_748_364
SPAN_LEN = 3


@query(
    "q_span_mask",
    oracle=f"""
    WITH d AS (
      SELECT doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      FROM documents
    ),
    pos AS (
      SELECT doc_id, n_tokens,
             unnest(generate_series(1, CAST(n_tokens AS INTEGER))) AS pos
      FROM d
    ),
    starts AS (
      SELECT doc_id, pos
      FROM pos
      WHERE CAST(concat('0x', substr(md5(concat(CAST(doc_id AS VARCHAR),
                 ':', CAST(pos AS VARCHAR))), 1, 8)) AS UBIGINT)
            < {SPAN_START_P32}
    ),
    cov AS (
      SELECT doc_id, pos,
             least({SPAN_LEN},
                   coalesce(lead(pos) OVER (PARTITION BY doc_id
                                            ORDER BY pos) - pos,
                            {SPAN_LEN})) AS covered
      FROM starts
    ),
    perdoc AS (
      SELECT doc_id, count(*) AS n_spans,
             CAST(sum(covered) AS BIGINT) AS raw_masked,
             CAST(sum(pos) AS BIGINT) AS span_pos_sum
      FROM cov GROUP BY doc_id
    )
    SELECT d.doc_id, d.n_tokens,
           coalesce(p.n_spans, 0) AS n_spans,
           CAST(least(coalesce(p.raw_masked, 0),
                      d.n_tokens) AS BIGINT) AS n_masked,
           round(least(coalesce(p.raw_masked, 0), d.n_tokens)
                 / CAST(d.n_tokens AS DOUBLE), 6) AS masked_frac,
           coalesce(p.span_pos_sum, 0) AS span_pos_sum
    FROM d LEFT JOIN perdoc p USING (doc_id)
    """,
    tags=("llm", "curation", "masking"),
)
def q_span_mask(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic span-corruption mask layout (the T5 denoising /
    BERT-MLM preprocessing step): each token position starts a mask span
    with probability 5% — decided by an engine-neutral md5 hash of
    (doc_id, position), the q_sample_hash derandomization — and spans
    cover {SPAN_LEN} tokens with overlapping spans unioned (the
    q_substring_dup interval sweep). Emits per document the span count,
    masked-token count (clipped at doc length for end-of-doc spans),
    masked fraction, and the span-start position sum that pins the EXACT
    mask layout cross-engine — so a training-data build can be audited
    and reproduced run-over-run, which partitioning-dependent RNG masks
    cannot.

    Scale shape: one position explode (native expressions only — the
    md5 gate runs in codegen), the per-doc lead() sweep over only the
    ~5% start positions, one groupBy(doc_id), and a map-side left join
    back to the doc spine. Nothing quadratic, nothing driver-side, no
    RNG state."""
    from pyspark.sql import Window

    t = load(spark, sf_dir)
    d = t.documents.select(
        "doc_id",
        F.size(F.split("text", " ")).cast("bigint").alias("n_tokens"),
    ).localCheckpoint()
    pos = d.select(
        "doc_id",
        F.explode(F.sequence(F.lit(1), F.col("n_tokens").cast("int"))).alias(
            "pos"
        ),
    )
    starts = pos.filter(
        F.conv(
            F.substring(
                F.md5(
                    F.encode(
                        F.concat(
                            F.col("doc_id").cast("string"),
                            F.lit(":"),
                            F.col("pos").cast("string"),
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
        < SPAN_START_P32
    )
    w_doc = Window.partitionBy("doc_id").orderBy("pos")
    cov = starts.withColumn(
        "covered",
        F.least(
            F.lit(SPAN_LEN),
            F.coalesce(F.lead("pos").over(w_doc) - F.col("pos"), F.lit(SPAN_LEN)),
        ),
    )
    perdoc = cov.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_spans"),
        F.sum("covered").cast("bigint").alias("raw_masked"),
        F.sum("pos").cast("bigint").alias("span_pos_sum"),
    )
    masked = F.least(
        F.coalesce("raw_masked", F.lit(0).cast("bigint")), F.col("n_tokens")
    )
    return d.join(perdoc, "doc_id", "left").select(
        "doc_id",
        "n_tokens",
        F.coalesce("n_spans", F.lit(0).cast("bigint")).alias("n_spans"),
        masked.cast("bigint").alias("n_masked"),
        F.round(masked / F.col("n_tokens").cast("double"), 6).alias(
            "masked_frac"
        ),
        F.coalesce("span_pos_sum", F.lit(0).cast("bigint")).alias(
            "span_pos_sum"
        ),
    )


@query(
    "q_perplexity_buckets",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w
      FROM documents
    ),
    freq AS (SELECT w, count(*) AS n FROM tok GROUP BY w),
    total AS (SELECT sum(n) AS t FROM freq),
    sc AS (
      SELECT tok.doc_id,
             CAST(count(*) AS BIGINT) AS n_tokens,
             round(avg(ln(freq.n / total.t)), 6) AS mean_logprob
      FROM tok JOIN freq ON tok.w = freq.w CROSS JOIN total
      GROUP BY tok.doc_id
    ),
    thr AS (
      SELECT quantile_cont(mean_logprob, 1.0/3) AS t1,
             quantile_cont(mean_logprob, 2.0/3) AS t2
      FROM sc
    )
    SELECT sc.doc_id, sc.n_tokens, sc.mean_logprob,
           CASE WHEN sc.mean_logprob < thr.t1 THEN 'tail'
                WHEN sc.mean_logprob < thr.t2 THEN 'middle'
                ELSE 'head' END AS ppl_bucket
    FROM sc CROSS JOIN thr
    """,
    tags=("llm", "curation", "quality"),
)
def q_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet's final curation step (Wenzek et al. 2020): split the corpus
    into head / middle / tail terciles by LM score — downstream recipes
    keep head+middle for pretraining and route tail to filtering or
    re-processing. Scores are q_unigram_logprob's values (shared
    unigram_doc_scores core); thresholds are EXACT continuous terciles
    over the per-document score distribution, so the bucket assignment
    is fully deterministic and hash-checkable (Spark `percentile` and
    DuckDB `quantile_cont` interpolate identically — the q_percentile
    parity precedent).

    Scale shape: the scoring plan is q_unigram_logprob's (vocabulary
    broadcast, one per-doc fold); the threshold aggregate runs over
    DOC-grain rows (corpus cardinality / ~1000 smaller than tokens) and
    broadcasts back as one row; bucketing is a map-only CASE. At 100 TB
    swap the exact percentile for approx_percentile's mergeable sketch
    (q_approx_percentile) — thresholds move by <0.1% and the plan loses
    its only doc-scale sort."""
    t = load(spark, sf_dir)
    # Doc-grain scores materialize once: both the threshold aggregate and
    # the bucketing projection consume them, and an unmaterialized `sc`
    # re-runs the whole token-scale scoring plan per consumer.
    sc = unigram_doc_scores(t.documents).localCheckpoint()
    thr = sc.agg(
        F.percentile("mean_logprob", F.lit(1.0 / 3)).alias("t1"),
        F.percentile("mean_logprob", F.lit(2.0 / 3)).alias("t2"),
    )
    return sc.crossJoin(F.broadcast(thr)).select(
        "doc_id",
        "n_tokens",
        "mean_logprob",
        F.when(F.col("mean_logprob") < F.col("t1"), F.lit("tail"))
        .when(F.col("mean_logprob") < F.col("t2"), F.lit("middle"))
        .otherwise(F.lit("head"))
        .alias("ppl_bucket"),
    )


#: Kneser-Ney absolute-discount parameter (the standard 0.75 of Chen &
#: Goodman 1999's fixed-discount interpolated KN).
KN_DISCOUNT = 0.75


@query(
    "q_kn_logprob",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, string_split(lower(text), ' ') AS tk FROM documents
    ),
    big AS (
      SELECT doc_id, tk[CAST(i AS INTEGER)] AS prev,
             tk[CAST(i AS INTEGER) + 1] AS cur
      FROM (SELECT doc_id, tk,
                   unnest(generate_series(1, len(tk) - 1)) AS i
            FROM tok WHERE len(tk) >= 2)
    ),
    c2 AS (SELECT prev, cur, count(*) AS n2 FROM big GROUP BY 1, 2),
    c1 AS (SELECT prev, sum(n2) AS n1 FROM c2 GROUP BY 1),
    nf AS (SELECT prev, count(*) AS nf FROM c2 GROUP BY 1),
    nb AS (SELECT cur, count(*) AS nb FROM c2 GROUP BY 1),
    np AS (SELECT count(*) AS np FROM c2),
    m AS (
      SELECT prev, cur,
             ln((n2 - {KN_DISCOUNT}) / n1
                + ({KN_DISCOUNT} * nf / n1) * (nb / CAST(np AS DOUBLE)))
               AS logp
      FROM c2 JOIN c1 USING (prev) JOIN nf USING (prev)
              JOIN nb USING (cur) CROSS JOIN np
    )
    SELECT big.doc_id,
           CAST(count(*) AS BIGINT) AS n_bigrams,
           round(avg(logp), 6) AS mean_kn_logprob
    FROM big JOIN m USING (prev, cur)
    GROUP BY big.doc_id
    """,
    tags=("llm", "curation", "quality"),
)
def q_kn_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser-Ney bigram scoring (Chen & Goodman 1999, fixed
    discount d={KN_DISCOUNT}) — the LM quality proxy one smoothing class
    above q_bigram_logprob's add-1: probability mass discounted from
    observed bigrams is redistributed by CONTINUATION counts (how many
    distinct contexts a word follows), the property that makes KN the
    default for count-based LM filtering ("francisco" is frequent but
    follows only "san", so its unseen-context probability is low).

      P(cur|prev) = (c(prev,cur) - d)/c(prev)
                    + (d * N1+(prev,*)/c(prev)) * (N1+(*,cur)/N_pairs)

    Scoring the corpus under itself means every scored bigram was
    observed (c2 >= 1 > d), so the max(c-d, 0) clamp is vacuous and the
    log argument is strictly positive. Docs under two tokens have no
    bigram events and are excluded, as in the oracle.

    Scale shape (q_bigram_logprob's contract, one extra fold): the pair
    stream is the same map-only arrays_zip(slice, slice) shape; c2
    materializes ONCE at bigram-vocabulary grain and every KN statistic
    — context totals c1, forward continuation counts N1+(prev,*),
    backward continuation counts N1+(*,cur), and the distinct-pair
    scalar — folds from that checkpoint without touching the corpus
    again; all model algebra happens at vocab grain BEFORE the single
    broadcast join back onto the pair stream (one joined column, logp,
    instead of four model tables joined at fact scale); the corpus is
    paired exactly twice (model pass + scoring pass) and the only other
    fact-scale exchange is the final per-doc mean. Per-pair logp is one
    fixed arithmetic expression evaluated identically in both engines,
    so values hash-match exactly."""
    t = load(spark, sf_dir)
    big = bigram_events(t.documents)
    m = kn_bigram_model(big)
    return (
        big.join(F.broadcast(m), ["prev", "cur"])
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(F.avg("logp"), 6).alias("mean_kn_logprob"),
        )
    )


def bigram_events(documents: DataFrame) -> DataFrame:
    """Bigram event stream ``(doc_id, prev, cur)`` — the map-only
    arrays_zip(slice, slice) shape q_bigram_logprob documents; factored
    so q_kn_logprob's model and scorer share one construction and tests
    can run the KN algebra on toy corpora."""
    tk = F.split(F.lower("text"), " ")
    n = F.size(tk)
    zipped = F.arrays_zip(F.slice(tk, 1, n - 1), F.slice(tk, 2, n - 1))
    return (
        documents.filter(n >= 2)
        .select("doc_id", F.explode(zipped).alias("p"))
        .select("doc_id", F.col("p.0").alias("prev"), F.col("p.1").alias("cur"))
    )


def kn_bigram_model(big: DataFrame) -> DataFrame:
    """Interpolated-KN bigram model ``(prev, cur, logp)`` from a bigram
    event stream — all statistics fold from one checkpointed
    vocabulary-grain count table (semantics in :func:`q_kn_logprob`)."""
    c2 = (
        big.groupBy("prev", "cur")
        .agg(F.count(F.lit(1)).alias("n2"))
        .localCheckpoint()
    )
    c1 = c2.groupBy("prev").agg(F.sum("n2").alias("n1"))
    nf = c2.groupBy("prev").agg(F.count(F.lit(1)).alias("nf"))
    nb = c2.groupBy("cur").agg(F.count(F.lit(1)).alias("nb"))
    np_ = c2.agg(F.count(F.lit(1)).alias("np"))
    # Model algebra at vocabulary grain: one logp column per (prev, cur),
    # mirroring the oracle's parenthesization exactly (IEEE-identical).
    return (
        c2.join(c1, "prev")
        .join(nf, "prev")
        .join(nb, "cur")
        .crossJoin(F.broadcast(np_))
        .select(
            "prev",
            "cur",
            F.log(
                (F.col("n2") - KN_DISCOUNT) / F.col("n1")
                + (KN_DISCOUNT * F.col("nf") / F.col("n1"))
                * (F.col("nb") / F.col("np").cast("double"))
            ).alias("logp"),
        )
    )


@query(
    "q_dataset_card",
    oracle="""
    WITH base AS (
      SELECT doc_id, md5(text) AS h, lang, source,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
             n_chars
      FROM documents
    ),
    tot AS (
      SELECT CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
             round(1.0 - count(DISTINCT h) * 1.0 / count(*), 6)
               AS exact_dup_rate,
             round(CAST(quantile_cont(n_chars, 0.5) AS DOUBLE), 6)
               AS median_chars
      FROM base
    ),
    lm AS (
      SELECT round(-list_reduce(
               list_prepend(CAST(0.0 AS DOUBLE),
                 list(p * ln(p) ORDER BY lang)),
               (acc, x) -> acc + x), 6) AS lang_entropy
      FROM (SELECT lang, count(*) * 1.0 / (SELECT count(*) FROM base) AS p
            FROM base GROUP BY lang)
    ),
    sm AS (
      SELECT round(max(c) * 1.0 / sum(c), 6) AS top_source_share
      FROM (SELECT count(*) AS c FROM base GROUP BY source)
    )
    SELECT n_docs, total_tokens, exact_dup_rate, median_chars,
           lang_entropy, top_source_share
    FROM tot CROSS JOIN lm CROSS JOIN sm
    """,
    tags=("llm", "curation"),
)
def q_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset card (the one-row corpus datasheet every released training
    set ships — Gebru et al.'s Datasheets, the HF dataset-card stats
    block): document count, total whitespace tokens, exact-duplicate
    rate (1 - distinct md5 / docs), median document length in chars,
    language-mix Shannon entropy, and the largest single source's share
    — the first numbers a consumer checks before committing GPUs.

    Determinism: counts and sums are exact integers; the entropy folds
    SEQUENTIALLY over the language-sorted distribution (both engines add
    <=5 terms in the same order); median uses the linear-interpolated
    percentile both engines define identically (the
    q_perplexity_buckets contract).

    Scale shape: ONE corpus scan feeds a single groupBy() aggregate
    (count / sum / count-distinct-digest / percentile as parallel
    partials); the language and source distributions are two more
    summary-grain aggregates over the same scan lineage; three 1-row
    broadcast crossJoins assemble the card. No fact-scale join, no
    window, nothing quadratic — a 100 TB card costs three scans' worth
    of map-side partials (or one, with the distributions folded into
    grouping sets)."""
    t = load(spark, sf_dir)
    base = t.documents.select(
        "doc_id",
        F.md5("text").alias("h"),
        "lang",
        "source",
        F.size(F.split("text", " ")).cast("bigint").alias("n_tokens"),
        "n_chars",
    ).localCheckpoint()
    tot = base.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        F.round(
            1.0 - F.countDistinct("h") / F.count(F.lit(1)), 6
        ).alias("exact_dup_rate"),
        F.round(F.percentile("n_chars", F.lit(0.5)).cast("double"), 6).alias(
            "median_chars"
        ),
    )
    n_total = base.count()
    lang_p = base.groupBy("lang").agg(
        (F.count(F.lit(1)) * 1.0 / F.lit(n_total)).alias("p")
    )
    lm = lang_p.agg(
        F.round(
            -F.aggregate(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("lang", "p"))),
                    lambda s: s["p"] * F.log(s["p"]),
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
            6,
        ).alias("lang_entropy")
    )
    sm = base.groupBy("source").agg(F.count(F.lit(1)).alias("c")).agg(
        F.round(F.max("c") * 1.0 / F.sum("c"), 6).alias("top_source_share")
    )
    return tot.crossJoin(F.broadcast(lm)).crossJoin(F.broadcast(sm))


#: q_pipeline_quality: minimum n-gram novelty a document must keep after
#: dedup (docs recycling >10% of their 4-grams from earlier survivors are
#: cut) — the intra-corpus decontamination floor.
NOV_MIN = 0.9


@query(
    "q_pipeline_quality",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
      FROM documents
    ),
    gate AS (
      SELECT doc_id FROM (
        SELECT doc_id,
               sum((CAST(CAST(concat('0x', substr(md5(tok), 1, 8)) AS UBIGINT)
                    AS BIGINT) % {QC_BUCKETS} * 2654435761)
                   % {QC_MOD} - {QC_SHIFT}) AS s
        FROM tok GROUP BY 1) WHERE s > 0
    ),
    dedup AS (
      SELECT doc_id FROM (
        SELECT d.doc_id,
               row_number() OVER (PARTITION BY md5(d.text)
                                  ORDER BY d.doc_id) AS rn
        FROM documents d JOIN gate USING (doc_id)) WHERE rn = 1
    ),
    tl AS (
      SELECT d.doc_id, string_split(d.text, ' ') AS toks
      FROM documents d JOIN dedup USING (doc_id)
    ),
    seg AS (
      SELECT doc_id, CAST(i AS INTEGER) AS seg_idx,
             array_to_string(list_slice(toks, i * 8 + 1, i * 8 + 8), ' ')
               AS seg_text
      FROM (SELECT doc_id, toks,
                   unnest(generate_series(0, (len(toks) + 7) // 8 - 1)) AS i
            FROM tl)
    ),
    dfreq AS (
      SELECT md5(seg_text) AS h, count(DISTINCT doc_id) AS df
      FROM seg GROUP BY 1
    ),
    clean AS (
      SELECT doc_id,
             string_agg(seg_text, ' ' ORDER BY seg_idx)
               FILTER (WHERE df < 3) AS ctext,
             round(count(*) FILTER (WHERE df < 3) * 1.0 / count(*), 6)
               AS kept_frac
      FROM seg JOIN dfreq ON dfreq.h = md5(seg.seg_text)
      GROUP BY doc_id
    ),
    kept AS (
      SELECT doc_id, ctext FROM clean WHERE kept_frac >= 0.5
    ),
    dt AS (SELECT doc_id, string_split(lower(ctext), ' ') AS tk FROM kept),
    grams AS (
      SELECT DISTINCT doc_id,
             concat_ws(' ', tk[CAST(i AS INTEGER)],
                       tk[CAST(i AS INTEGER) + 1],
                       tk[CAST(i AS INTEGER) + 2],
                       tk[CAST(i AS INTEGER) + 3]) AS gram
      FROM (SELECT doc_id, tk,
                   unnest(generate_series(1, greatest(len(tk) - 3, 1))) AS i
            FROM dt)
    ),
    fs AS (SELECT gram, min(doc_id) AS fd FROM grams GROUP BY 1),
    nov AS (
      SELECT g.doc_id,
             round(count(*) FILTER (WHERE f.fd = g.doc_id) * 1.0
                   / count(*), 6) AS novelty
      FROM grams g JOIN fs f USING (gram) GROUP BY 1
    ),
    sel AS (
      SELECT k.doc_id,
             CAST(len(string_split(k.ctext, ' ')) AS BIGINT) AS n_tokens,
             n.novelty
      FROM kept k JOIN nov n USING (doc_id) WHERE n.novelty >= 0.9
    ),
    cum AS (
      SELECT doc_id, n_tokens, novelty,
             sum(n_tokens) OVER (ORDER BY doc_id
                                 ROWS UNBOUNDED PRECEDING) AS cum_tokens
      FROM sel
    )
    SELECT doc_id, n_tokens, novelty,
           CAST((cum_tokens - n_tokens) // 2048 AS BIGINT) AS bin
    FROM cum
    """,
    tags=("llm", "curation", "pipeline"),
)
def q_pipeline_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The round-8 curation chain as ONE DAG — the quality-first
    counterpart of q_pipeline_pretrain, composed entirely of this
    round's operators: (1) learned quality GATE (q_quality_classifier's
    exact integer keep rule); (2) EXACT DEDUP of the gated raw text
    (keep-first by digest — BEFORE boilerplate stats, so replicated
    documents cannot inflate segment document-frequency into cutting the
    whole corpus); (3) BOILERPLATE cut on the survivors
    (q_boilerplate_lines, df >= 3 segments dropped from every copy),
    keeping docs that retain >= 50% of their segments; (4) NOVELTY floor
    (q_ngram_novelty recomputed on the surviving cleaned corpus —
    intra-corpus decontamination, docs under {NOV_MIN} cut); (5) PACK
    survivors into 2048-token bins (q_pack_sequences' two-pass running
    sum). Output: the packed training manifest (doc, cleaned token
    count, novelty, bin).

    Stage semantics are pinned stage-for-stage by the oracle's CTE chain
    (same names, same thresholds). Scale shape: each stage's exchanges
    are the component operators' documented ones; the CLEANED
    corpus localCheckpoints once before the novelty stage (its gram
    pass has two consumers — first-seen build and join-back — plus the
    packing scan; the q_pipeline_pretrain curated-corpus lesson);
    everything else flows one way. Token re-counts run on cleaned text,
    never the raw corpus."""
    from .dedup import boilerplate_filter
    from ..ranking import global_running_sum
    from pyspark.sql import Window

    t = load(spark, sf_dir)
    bucket = (
        F.conv(F.substring(F.md5("tok"), 1, 8), 16, 10).cast("bigint")
        % QC_BUCKETS
    )
    wnum = (bucket * F.lit(2654435761)) % QC_MOD - QC_SHIFT
    gate = (
        t.documents.select(
            "doc_id", F.explode(F.split(F.lower("text"), " ")).alias("tok")
        )
        .select("doc_id", wnum.alias("wnum"))
        .groupBy("doc_id")
        .agg(F.sum("wnum").alias("s"))
        .filter(F.col("s") > 0)
        .select("doc_id")
    )
    gated = t.documents.join(gate, "doc_id")
    w_d = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    ded_raw = (
        gated.withColumn("rn", F.row_number().over(w_d))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    bf = boilerplate_filter(ded_raw)
    kept = (
        bf.filter(F.col("kept_frac") >= 0.5)
        .select("doc_id", F.col("cleaned_text").alias("ctext"))
        .localCheckpoint()
    )
    tk = F.split(F.lower("ctext"), " ")
    grams = kept.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(1), F.greatest(F.size(tk) - 3, F.lit(1))),
                    lambda i: F.concat_ws(" ", F.slice(tk, i, 4)),
                )
            )
        ).alias("gram"),
    ).localCheckpoint()
    fs = grams.groupBy("gram").agg(F.min("doc_id").alias("fd"))
    novel = F.col("fd") == F.col("doc_id")
    nov = (
        grams.join(fs, "gram")
        .groupBy("doc_id")
        .agg(
            F.round(
                F.sum(novel.cast("double")) / F.count(F.lit(1)), 6
            ).alias("novelty")
        )
        .filter(F.col("novelty") >= NOV_MIN)
    )
    sel = kept.join(nov, "doc_id").select(
        "doc_id",
        F.size(F.split("ctext", " ")).cast("bigint").alias("n_tokens"),
        "novelty",
    )
    cum = global_running_sum(sel, "n_tokens", "doc_id", out_col="cum_tokens")
    return cum.select(
        "doc_id",
        "n_tokens",
        "novelty",
        F.expr("(cum_tokens - n_tokens) div 2048").cast("bigint").alias("bin"),
    )


@query(
    "q_pack_stats",
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
    ),
    packed AS (
      SELECT doc_id, n_tokens,
             CAST((cum_tokens - n_tokens) // {PACK_BUDGET} AS BIGINT) AS bin
      FROM cum
    )
    SELECT bin,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS bin_tokens,
           round(sum(n_tokens) * 1.0 / {PACK_BUDGET}, 6) AS fill_ratio,
           CAST(max(n_tokens) AS BIGINT) AS max_doc_tokens
    FROM packed GROUP BY bin
    """,
    tags=("llm", "curation", "packing"),
)
def q_pack_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Packing-efficiency audit over q_pack_sequences' layout: per
    {PACK_BUDGET}-token bin, the document count, packed token total,
    fill ratio, and largest member — the numbers that decide whether the
    packing strategy wastes context (fill << 1 means padding; fill > 1
    is the doc-spans-boundary overflow a concat-then-chunk layout
    EXPECTS, since a document belongs to the bin its first token lands
    in). A fill-ratio histogram of this output is the standard padding
    -waste datasheet figure.

    Scale shape: the running total reuses the two-pass range plan
    (global_running_sum — no single-partition window); the per-bin
    rollup is ONE additional groupBy(bin) whose partials collapse
    map-side (bins are dense integers, no skew). Nothing else touches
    the corpus."""
    from ..ranking import global_running_sum

    t = load(spark, sf_dir)
    toks = t.documents.select(
        "doc_id",
        F.size(F.split("text", " ")).cast("bigint").alias("n_tokens"),
    )
    cum = global_running_sum(toks, "n_tokens", "doc_id", out_col="cum_tokens")
    packed = cum.select(
        "n_tokens",
        F.expr(f"(cum_tokens - n_tokens) div {PACK_BUDGET}")
        .cast("bigint")
        .alias("bin"),
    )
    return packed.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("bin_tokens"),
        F.round(F.sum("n_tokens") * 1.0 / PACK_BUDGET, 6).alias("fill_ratio"),
        F.max("n_tokens").cast("bigint").alias("max_doc_tokens"),
    )


@query(
    "q_ppl_diff_select",
    oracle="""
    WITH tok AS (
      SELECT doc_id, lang, string_split(lower(text), ' ') AS tk
      FROM documents
    ),
    big AS (
      SELECT doc_id, lang, tk[CAST(i AS INTEGER)] AS prev,
             tk[CAST(i AS INTEGER) + 1] AS cur
      FROM (SELECT doc_id, lang, tk,
                   unnest(generate_series(1, len(tk) - 1)) AS i
            FROM tok WHERE len(tk) >= 2)
    ),
    c2 AS (
      SELECT prev, cur,
             count(*) AS n_g,
             count(*) FILTER (WHERE lang = 'en') AS n_t
      FROM big GROUP BY 1, 2
    ),
    c1 AS (
      SELECT prev, sum(n_g) AS d_g, sum(n_t) AS d_t FROM c2 GROUP BY 1
    ),
    v AS (SELECT count(DISTINCT w) AS v
          FROM (SELECT unnest(tk) AS w FROM tok)),
    m AS (
      SELECT prev, cur,
             ln((n_t + 1.0) / (d_t + v)) - ln((n_g + 1.0) / (d_g + v))
               AS logdiff
      FROM c2 JOIN c1 USING (prev) CROSS JOIN v
    )
    SELECT big.doc_id,
           CAST(count(*) AS BIGINT) AS n_bigrams,
           round(avg(logdiff), 6) AS mean_logdiff,
           (round(avg(logdiff), 6) > 0) AS selected
    FROM big JOIN m USING (prev, cur)
    GROUP BY big.doc_id
    """,
    tags=("llm", "curation", "sampling"),
)
def q_ppl_diff_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moore-Lewis intelligent selection (Moore & Lewis 2010, the
    cross-entropy-difference data selection that predates and motivates
    DSIR): per document, the mean of ln P_target - ln P_general under two
    add-1 bigram LMs — TARGET trained on the in-domain slice (lang='en')
    and GENERAL on the whole corpus; positive difference means the doc
    looks more like the target than like average data, the standard
    "select raw text that resembles the good corpus" rule at one model
    order above DSIR's hashed unigrams. ``selected`` thresholds the
    ROUNDED mean at zero, so float summation order cannot flip a verdict
    between engines.

    Scale shape: BOTH models come from ONE fact-scale groupBy(prev, cur)
    — the target model is a conditional count in the same pass, not a
    second corpus scan; context totals fold from the pair table at
    vocabulary grain; the per-pair log-difference broadcasts back onto
    the pair stream as one column (the q_kn_logprob shape); the corpus
    pairs exactly twice (model + scoring), and the only other fact-scale
    exchange is the per-doc mean."""
    t = load(spark, sf_dir)
    tk = F.split(F.lower("text"), " ")
    n = F.size(tk)
    zipped = F.arrays_zip(F.slice(tk, 1, n - 1), F.slice(tk, 2, n - 1))
    big = (
        t.documents.filter(n >= 2)
        .select("doc_id", "lang", F.explode(zipped).alias("p"))
        .select(
            "doc_id",
            "lang",
            F.col("p.0").alias("prev"),
            F.col("p.1").alias("cur"),
        )
    )
    c2 = (
        big.groupBy("prev", "cur")
        .agg(
            F.count(F.lit(1)).alias("n_g"),
            F.sum((F.col("lang") == "en").cast("bigint")).alias("n_t"),
        )
        .localCheckpoint()
    )
    c1 = c2.groupBy("prev").agg(
        F.sum("n_g").alias("d_g"), F.sum("n_t").alias("d_t")
    )
    v = t.documents.select(F.explode(tk).alias("w")).agg(
        F.countDistinct("w").alias("v")
    )
    m = (
        c2.join(c1, "prev")
        .crossJoin(F.broadcast(v))
        .select(
            "prev",
            "cur",
            (
                F.log((F.col("n_t") + 1.0) / (F.col("d_t") + F.col("v")))
                - F.log((F.col("n_g") + 1.0) / (F.col("d_g") + F.col("v")))
            ).alias("logdiff"),
        )
    )
    return (
        big.join(F.broadcast(m), ["prev", "cur"])
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(F.avg("logdiff"), 6).alias("mean_logdiff"),
            (F.round(F.avg("logdiff"), 6) > 0).alias("selected"),
        )
    )


@query(
    "q_interleave",
    oracle="""
    WITH s AS (
      SELECT doc_id, source,
             row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
      FROM documents
    ),
    si AS (
      SELECT source, row_number() OVER (ORDER BY source) AS src_idx
      FROM (SELECT DISTINCT source FROM documents)
    )
    SELECT doc_id, source,
           CAST(row_number() OVER (ORDER BY rn, src_idx, doc_id) AS BIGINT)
             AS position
    FROM s JOIN si USING (source)
    """,
    tags=("llm", "curation", "packing"),
)
def q_interleave(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-interleaved training order — the deterministic round-robin
    every multi-source pretraining run wants (consecutive batches drawing
    from the same crawl shard correlate gradients; interleaving by
    source de-clusters them without RNG): documents rank within their
    source by doc_id, sources get a stable index, and the global
    position orders by (within-source rank, source index) — a perfect
    round-robin while all sources last, degrading gracefully as small
    sources exhaust. Rerunning yields byte-identical order (the
    q_sample_hash reproducibility contract).

    Scale shape: the within-source rank is a key-partitioned window;
    the source index table is distinct-source-grain (broadcast); the
    GLOBAL position uses global_row_number's two-pass range plan — no
    single-partition window anywhere (the q_pack_sequences lesson)."""
    from ..ranking import global_row_number
    from pyspark.sql import Window

    t = load(spark, sf_dir)
    s = t.documents.select(
        "doc_id",
        "source",
        F.row_number()
        .over(Window.partitionBy("source").orderBy("doc_id"))
        .alias("rn"),
    )
    si = (
        t.documents.select("source")
        .distinct()
        .select(
            "source",
            F.row_number()
            .over(Window.orderBy("source"))
            .alias("src_idx"),
        )
    )
    ranked = global_row_number(
        s.join(F.broadcast(si), "source"),
        "rn",
        "src_idx",
        "doc_id",
        out_col="position",
    )
    return ranked.select(
        "doc_id", "source", F.col("position").cast("bigint").alias("position")
    )


#: q_weighted_sample: sample size (the audit-sample convention of
#: q_sample_hash, weighted).
WSAMPLE_K = 100


@query(
    "q_weighted_sample",
    oracle=f"""
    WITH w AS (
      SELECT doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
             (CAST(CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)),
                                            1, 8)) AS UBIGINT) AS BIGINT)
              + 1.0) / 4294967297.0 AS u
      FROM documents
    )
    SELECT doc_id, n_tokens,
           round(ln(u) / n_tokens, 8) AS es_key
    FROM w
    ORDER BY es_key DESC, doc_id
    LIMIT {WSAMPLE_K}
    """,
    tags=("llm", "curation", "sampling"),
)
def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement (Efraimidis & Spirakis 2006:
    each item draws u ~ U(0,1) and the top-k by u^(1/w) is an exact
    weighted sample) — derandomized with the q_sample_hash technique:
    u derives from md5(doc_id), so the sample is statistically weighted
    by token count (long documents proportionally likelier) yet
    byte-identical across engines, reruns and cluster layouts — the
    reproducible audit sample, weight-aware. Ranking uses ln(u)/w
    (monotone in u^(1/w), numerically safer than the power) rounded to
    8dp with doc_id tie-breaks.

    Scale shape: map-only key derivation, then orderBy+limit plans as
    TakeOrdered — per-partition top-{WSAMPLE_K} and a k-row merge; the
    corpus never globally sorts (the q_sample_hash / q_dsir_resample
    plan)."""
    t = load(spark, sf_dir)
    u = (
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
        ).cast("double")
        + 1.0
    ) / 4294967297.0
    n_tokens = F.size(F.split("text", " ")).cast("bigint")
    return (
        t.documents.select(
            "doc_id",
            n_tokens.alias("n_tokens"),
            F.round(F.log(u) / n_tokens, 8).alias("es_key"),
        )
        .orderBy(F.col("es_key").desc(), "doc_id")
        .limit(WSAMPLE_K)
    )


@query(
    "q_softdedup",
    oracle="""
    WITH dup AS (
      SELECT md5(text) AS h, count(*) AS dup_count
      FROM documents GROUP BY md5(text)
    ),
    w AS (
      SELECT d.source, dup.h,
             CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tokens,
             dup.dup_count
      FROM documents d JOIN dup ON md5(d.text) = dup.h
    )
    SELECT source,
           count(*)                                        AS n_docs,
           count(DISTINCT h)                               AS n_unique,
           round(sum(1.0 / dup_count), 6)                  AS eff_docs,
           round(sum(CAST(n_tokens AS DOUBLE) / dup_count), 4) AS eff_tokens
    FROM w
    GROUP BY source
    """,
    tags=("llm", "curation", "dedup"),
)
def q_softdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Soft deduplication (duplicate-aware down-weighting): instead of
    dropping duplicate documents, each doc gets sampling weight
    1/dup_count, where dup_count is its exact content-digest multiplicity
    over the WHOLE corpus — the reweighting family of dedup (cf. SoftDeDup
    /ExMix-style data reweighting) that preserves every document while
    making each distinct text contribute one unit of probability mass.
    Emits the per-source audit: raw vs effective (weight-summed) document
    and token counts — the numbers a mixture designer actually feeds into
    sampling-ratio decisions.

    Scale shape: dup counts come from one hash-groupBy at digest grain
    (the q_dedup_exact shuffle) joined back onto the fact by digest —
    both exchanges hash-partition on the digest, so AQE plans them as one
    co-partitioned pair; the per-source rollup is algebraic (map-side
    partials). No windows over the fact, nothing driver-side."""
    t = load(spark, sf_dir)
    docs = t.documents.select(
        "source",
        F.md5("text").alias("h"),
        F.size(F.split("text", " ")).cast("bigint").alias("n_tokens"),
    )
    dup = docs.groupBy("h").agg(F.count(F.lit(1)).alias("dup_count"))
    return (
        docs.join(dup, "h")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("h").alias("n_unique"),
            F.round(F.sum(1.0 / F.col("dup_count")), 6).alias("eff_docs"),
            F.round(
                F.sum(F.col("n_tokens").cast("double") / F.col("dup_count")), 4
            ).alias("eff_tokens"),
        )
    )


#: Data-constrained epoch planning: token budget as a multiple of the
#: corpus, the repetition cap (epochs of value, Muennighoff et al. 2023),
#: and the mixture temperature (shared convention with q_mix_temperature).
EPOCH_TARGET_MULT = 5.0
EPOCH_CAP = 4.0
EPOCH_TEMP = 0.7


@query(
    "q_epoch_plan",
    oracle=f"""
    WITH counts AS (
      SELECT source,
             CAST(sum(len(string_split(text, ' '))) AS BIGINT)
               AS tokens_available
      FROM documents GROUP BY source
    ),
    scaled AS (
      SELECT *,
             pow(tokens_available, {EPOCH_TEMP}) AS w,
             sum(pow(tokens_available, {EPOCH_TEMP})) OVER () AS w_tot,
             sum(tokens_available) OVER () AS tok_tot
      FROM counts
    ),
    plan AS (
      SELECT source, tokens_available,
             round(w / w_tot, 8) AS mix_weight,
             round((w / w_tot) * {EPOCH_TARGET_MULT} * tok_tot, 4)
               AS tokens_requested
      FROM scaled
    )
    SELECT source, tokens_available, mix_weight, tokens_requested,
           round(least({EPOCH_CAP}, tokens_requested / tokens_available), 6)
             AS epochs,
           round(round(least({EPOCH_CAP},
                             tokens_requested / tokens_available), 6)
                 * tokens_available, 4) AS tokens_served,
           round(tokens_requested
                 - round(least({EPOCH_CAP},
                               tokens_requested / tokens_available), 6)
                   * tokens_available, 4) AS token_deficit
    FROM plan
    """,
    tags=("llm", "curation", "mixing"),
)
def q_epoch_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-constrained mixture planning (Muennighoff et al. 2023: repeated
    data holds value for ~4 epochs, then decays): given per-source token
    inventories, a temperature-{EPOCH_TEMP} mixture (the q_mix_temperature
    convention, on tokens) and a training budget of {EPOCH_TARGET_MULT}x
    the corpus, emit each source's requested tokens, the epoch count
    CAPPED at {EPOCH_CAP}, the tokens actually servable under the cap and
    the unmet deficit — the table a data-constrained training run plans
    its mixture from.

    Scale shape: one token-count aggregation over the corpus to source
    grain; every window runs over the #sources-row summary (sources are a
    dimension). The deliberate rounding chain (requested 4dp -> epochs 6dp
    -> served/deficit from the ROUNDED epochs) keeps both engines'
    downstream arithmetic in lockstep."""
    from pyspark.sql import Window

    t = load(spark, sf_dir)
    counts = t.documents.groupBy("source").agg(
        F.sum(F.size(F.split("text", " ")))
        .cast("bigint")
        .alias("tokens_available")
    )
    w_all = Window.partitionBy()
    w = F.pow(F.col("tokens_available"), EPOCH_TEMP)
    mix = w / F.sum(w).over(w_all)
    requested = F.round(
        mix * EPOCH_TARGET_MULT * F.sum("tokens_available").over(w_all), 4
    )
    plan = counts.select(
        "source",
        "tokens_available",
        F.round(mix, 8).alias("mix_weight"),
        requested.alias("tokens_requested"),
    )
    epochs = F.round(
        F.least(
            F.lit(EPOCH_CAP),
            F.col("tokens_requested") / F.col("tokens_available"),
        ),
        6,
    )
    return plan.select(
        "source",
        "tokens_available",
        "mix_weight",
        "tokens_requested",
        epochs.alias("epochs"),
        F.round(epochs * F.col("tokens_available"), 4).alias("tokens_served"),
        F.round(
            F.col("tokens_requested") - epochs * F.col("tokens_available"), 4
        ).alias("token_deficit"),
    )


#: Candidate min-token thresholds for the length-filter tuning sweep.
LEN_SWEEP = (10, 20, 30, 40, 50, 60)


@query(
    "q_length_filter_sweep",
    oracle=f"""
    WITH feats AS (
      SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      FROM documents
    ),
    tot AS (
      SELECT count(*) AS n_docs, sum(n_tokens) AS n_tokens_tot FROM feats
    ),
    thresholds AS (
      SELECT unnest([{", ".join(str(x) for x in LEN_SWEEP)}]) AS min_tokens
    )
    SELECT t.min_tokens,
           CAST(count(*) FILTER (f.n_tokens >= t.min_tokens) AS BIGINT)
             AS docs_kept,
           CAST(coalesce(sum(f.n_tokens) FILTER (f.n_tokens >= t.min_tokens),
                         0) AS BIGINT) AS tokens_kept,
           round(count(*) FILTER (f.n_tokens >= t.min_tokens)
                 / CAST((SELECT n_docs FROM tot) AS DOUBLE), 8)
             AS doc_share,
           round(coalesce(sum(f.n_tokens) FILTER (f.n_tokens >= t.min_tokens),
                          0)
                 / CAST((SELECT n_tokens_tot FROM tot) AS DOUBLE), 8)
             AS token_share
    FROM thresholds t CROSS JOIN feats f
    GROUP BY t.min_tokens
    """,
    tags=("llm", "curation", "audit"),
)
def q_length_filter_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-filter tuning curve: for each candidate min-token threshold,
    the documents and tokens that survive, as counts and corpus shares —
    the table a pipeline owner reads before committing a gate (every
    threshold is a trade of noise removed vs tokens lost; Gopher/CCNet
    pick theirs off exactly this curve).

    Scale shape: ONE fact-scale pass computes per-doc token counts; the
    sweep itself is |thresholds| conditional aggregates in a single
    groupBy-less aggregation (map-side partials, one 1-row reduce) —
    the fact is NOT replicated per threshold (the oracle's readable
    cross-join form aggregates the same algebra; Spark evaluates the
    thresholds as parallel conditional sums in one scan). Output is
    threshold-grain."""
    t = load(spark, sf_dir)
    feats = t.documents.select(
        F.size(F.split("text", " ")).cast("bigint").alias("n_tokens")
    )
    aggs = [F.count(F.lit(1)).alias("n_docs"), F.sum("n_tokens").alias("n_tok")]
    for m in LEN_SWEEP:
        keep = F.col("n_tokens") >= m
        aggs.append(F.sum(F.when(keep, 1).otherwise(0)).alias(f"d{m}"))
        aggs.append(
            F.sum(F.when(keep, F.col("n_tokens")).otherwise(0)).alias(f"t{m}")
        )
    one = feats.agg(*aggs)
    rows = []
    for m in LEN_SWEEP:
        rows.append(
            F.struct(
                F.lit(m).cast("bigint").alias("min_tokens"),
                F.col(f"d{m}").cast("bigint").alias("docs_kept"),
                F.col(f"t{m}").cast("bigint").alias("tokens_kept"),
                F.round(F.col(f"d{m}") / F.col("n_docs").cast("double"), 8)
                .alias("doc_share"),
                F.round(F.col(f"t{m}") / F.col("n_tok").cast("double"), 8)
                .alias("token_share"),
            )
        )
    return one.select(
        F.explode(F.array(*rows)).alias("r")
    ).select("r.min_tokens", "r.docs_kept", "r.tokens_kept", "r.doc_share",
             "r.token_share")


#: Blocklist screening (the harmful-content / spam-term filter stage of a
#: pretraining pipeline — C4's badwords pass, at toy vocabulary): flagged
#: terms, and the per-mille token threshold above which a doc is dropped.
BLOCKLIST = ("slow", "dup", "big")
BLOCK_PER_MILLE = 50


@query(
    "q_wordlist_filter",
    oracle=f"""
    WITH feats AS (
      SELECT source,
             len(string_split(text, ' ')) AS n_tokens,
             len(list_filter(string_split(text, ' '),
                             t -> t IN ('slow', 'dup', 'big'))) AS hits
      FROM documents
    ),
    v AS (SELECT source, n_tokens, hits,
                 hits * 1000 > n_tokens * {BLOCK_PER_MILLE} AS dropped
          FROM feats)
    SELECT source,
           count(*) AS n_docs,
           CAST(sum(CASE WHEN dropped THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dropped,
           CAST(sum(hits) AS BIGINT) AS total_hits,
           round(sum(hits) / CAST(sum(n_tokens) AS DOUBLE), 8)
             AS corpus_hit_rate
    FROM v GROUP BY source
    """,
    tags=("llm", "curation", "quality"),
)
def q_wordlist_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocklist screening (the C4 badwords stage): per doc, count exact
    token hits against the {len(BLOCKLIST)}-term blocklist, drop docs
    whose hit density exceeds {BLOCK_PER_MILLE}‰ of tokens (integer-exact
    comparison — hits·1000 > tokens·threshold, no float boundary), and
    roll up per source: doc counts, drop counts, total hits, corpus hit
    rate. Everything is ONE map-side projection (split + higher-order
    filter over the token array — no explode, no per-term scan) feeding
    one source-grain aggregate; at 100 TB the blocklist (real ones are
    ~10³ terms) broadcasts as a literal array and the fact never
    shuffles wider than the source-grain partial aggregates."""
    t = load(spark, sf_dir)
    toks = F.split(F.col("text"), " ")
    hits = F.size(
        F.filter(toks, lambda w: w.isin(*BLOCKLIST))
    )
    feats = t.documents.select(
        "source",
        F.size(toks).alias("n_tokens"),
        hits.alias("hits"),
    ).withColumn(
        "dropped",
        F.col("hits") * 1000 > F.col("n_tokens") * BLOCK_PER_MILLE,
    )
    return feats.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.when(F.col("dropped"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_dropped"),
        F.sum("hits").cast("bigint").alias("total_hits"),
        F.round(
            F.sum("hits") / F.sum("n_tokens").cast("double"), 8
        ).alias("corpus_hit_rate"),
    )
