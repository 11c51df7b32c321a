"""Text-analysis operators for LLM training-data pipelines (SURVEY §2.L):
word count, corpus stats, TF-IDF, language-ID heuristic, quality scoring,
token counting, document fingerprinting.

All pure built-in expressions (split/explode/higher-order lambdas) — a
100 TB corpus streams through whole-stage codegen with one shuffle per
aggregation, no Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import query

def _tokens():
    return F.split(F.col("text"), " ")


@query(
    "q_wordcount",
    oracle="""
    SELECT token, count(*) AS n, count(DISTINCT doc_id) AS n_docs
    FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents)
    GROUP BY token
    """,
    tags=("llm", "text"),
)
def q_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus term frequencies: tokenize → explode → aggregate.

    Two-level aggregate — (token, doc_id) partial counts, then the token
    rollup where count(*) of the pairs IS the distinct-doc count —
    instead of count + countDistinct in one agg, which plans an Expand
    duplicating every exploded token row per branch before the shuffle
    (r7: output-identical, no Expand, first-run 2.3 → 0.3 s)."""
    t = load(spark, sf_dir)
    return (
        t.documents.select("doc_id", F.explode(_tokens()).alias("token"))
        .groupBy("token", "doc_id")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("token")
        .agg(
            F.sum("c").alias("n"),
            F.count(F.lit(1)).alias("n_docs"),
        )
    )


@query(
    "q_text_stats",
    oracle="""
    SELECT lang, source,
           count(*)                                        AS n_docs,
           avg(n_chars)                                    AS avg_chars,
           CAST(min(n_chars) AS BIGINT)                    AS min_chars,
           CAST(max(n_chars) AS BIGINT)                    AS max_chars,
           avg(len(string_split(text, ' ')))               AS avg_tokens
    FROM documents
    GROUP BY lang, source
    """,
    tags=("llm", "text"),
)
def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus composition stats per (lang, source) — the filter surface for
    corpus curation."""
    t = load(spark, sf_dir)
    return t.documents.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg("n_chars").alias("avg_chars"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
        F.avg(F.size(_tokens()).cast("double")).alias("avg_tokens"),
    )


@query(
    "q_token_count",
    oracle="""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT)                  AS ws_tokens,
           CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT)
                                                                         AS regex_tokens,
           CAST(ceil(length(text) / 4.0) AS BIGINT)                      AS approx_bpe_tokens
    FROM documents
    """,
    tags=("llm", "text"),
)
def q_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting three ways: whitespace, BPE-ish regex word/number/
    punct classes, and the chars/4 heuristic used for budget estimates."""
    t = load(spark, sf_dir)
    return t.documents.select(
        "doc_id",
        F.size(_tokens()).cast("bigint").alias("ws_tokens"),
        F.regexp_count(F.col("text"), F.lit("[a-z]+|[0-9]+|[^a-z0-9 ]"))
        .cast("bigint")
        .alias("regex_tokens"),
        F.ceil(F.length("text") / 4.0).cast("bigint").alias("approx_bpe_tokens"),
    )


#: Stopword lists for the n-gram language heuristic. The corpus is synthetic
#: (spark-ish vocabulary), so the lists are drawn from its actual vocab —
#: the *operator* (per-language hit scoring + argmax) is the deliverable.
_STOP = {
    "en": ("the", "a", "data", "row"),
    "es": ("table", "column", "key"),
    "de": ("group", "join", "sort"),
}


@query(
    "q_lang_id",
    oracle="""
    WITH scored AS (
      SELECT doc_id, lang AS labeled_lang,
        len(list_filter(string_split(text,' '), x -> x IN ('the','a','data','row')))
          AS en_hits,
        len(list_filter(string_split(text,' '), x -> x IN ('table','column','key')))
          AS es_hits,
        len(list_filter(string_split(text,' '), x -> x IN ('group','join','sort')))
          AS de_hits
      FROM documents
    )
    SELECT doc_id, labeled_lang,
           CAST(en_hits AS BIGINT) AS en_hits,
           CAST(es_hits AS BIGINT) AS es_hits,
           CAST(de_hits AS BIGINT) AS de_hits,
           CASE WHEN en_hits >= es_hits AND en_hits >= de_hits THEN 'en'
                WHEN es_hits >= de_hits THEN 'es'
                ELSE 'de' END AS predicted_lang
    FROM scored
    """,
    tags=("llm", "text"),
)
def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic: per-language stopword hit counts + argmax with
    a fixed tie-break order (en > es > de) for determinism."""
    t = load(spark, sf_dir)

    def hits(words: tuple[str, ...]):
        return F.size(F.filter(_tokens(), lambda x: x.isin(*words))).cast("bigint")

    en, es, de = (hits(_STOP[l]) for l in ("en", "es", "de"))
    return t.documents.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        en.alias("en_hits"),
        es.alias("es_hits"),
        de.alias("de_hits"),
        F.when((en >= es) & (en >= de), "en")
        .when(es >= de, "es")
        .otherwise("de")
        .alias("predicted_lang"),
    )


@query(
    "q_quality_score",
    oracle="""
    WITH feats AS (
      SELECT doc_id,
             len(string_split(text, ' '))                       AS n_tokens,
             length(text)                                       AS n_ch,
             len(list_filter(string_split(text,' '),
                             x -> x IN ('the','a','data','row'))) AS stop_hits,
             len(list_distinct(string_split(text,' ')))         AS n_unique
      FROM documents
    )
    SELECT doc_id,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           round(0.4 * least(n_tokens / 50.0, 1.0)
               + 0.3 * (stop_hits / CAST(n_tokens AS DOUBLE))
               + 0.3 * (n_unique / CAST(n_tokens AS DOUBLE)), 8) AS quality,
           (n_ch >= 80 AND n_ch <= 2000)                         AS len_ok
    FROM feats
    """,
    tags=("llm", "text"),
)
def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document quality score: length saturation + stopword ratio + lexical
    diversity (unique/total), plus a hard length gate — the standard
    pre-training filter recipe, all JVM-side."""
    t = load(spark, sf_dir)
    n_tokens = F.size(_tokens())
    stop_hits = F.size(F.filter(_tokens(), lambda x: x.isin(*_STOP["en"])))
    n_unique = F.size(F.array_distinct(_tokens()))
    quality = F.round(
        0.4 * F.least(n_tokens / F.lit(50.0), F.lit(1.0))
        + 0.3 * (stop_hits / n_tokens.cast("double"))
        + 0.3 * (n_unique / n_tokens.cast("double")),
        8,
    )
    return t.documents.select(
        "doc_id",
        n_tokens.cast("bigint").alias("n_tokens"),
        quality.alias("quality"),
        ((F.length("text") >= 80) & (F.length("text") <= 2000)).alias("len_ok"),
    )


@query(
    "q_fingerprint",
    oracle="""
    SELECT doc_id,
           list_reduce(
             list_prepend(CAST(0 AS BIGINT),
               list_transform(string_split(text, ' '),
                              t -> CAST(length(t) * 31 + ascii(t) AS BIGINT))),
             (acc, c) -> (acc * 131 + c) % 1000000007) AS fingerprint
    FROM documents
    """,
    tags=("llm", "text"),
)
def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-sensitive rolling document fingerprint: polynomial hash over
    per-token codes, mod 1e9+7 — engine-portable (no engine-native hash),
    identical left-fold in both engines."""
    t = load(spark, sf_dir)
    codes = F.transform(
        _tokens(), lambda tok: (F.length(tok) * 31 + F.ascii(tok)).cast("bigint")
    )
    fp = F.aggregate(
        codes,
        F.lit(0).cast("bigint"),
        lambda acc, c: (acc * 131 + c) % 1000000007,
    )
    return t.documents.select("doc_id", fp.alias("fingerprint"))


@query(
    "q_tfidf",
    oracle="""
    WITH tf AS (
      SELECT doc_id, token, count(*) AS tf
      FROM (SELECT doc_id, unnest(string_split(text,' ')) AS token FROM documents)
      GROUP BY doc_id, token
    ),
    df AS (SELECT token, count(*) AS df FROM tf GROUP BY token),
    n AS (SELECT count(*) AS n_docs FROM documents)
    SELECT tf.doc_id, tf.token,
           CAST(tf.tf AS BIGINT) AS tf,
           CAST(df.df AS BIGINT) AS df,
           round(tf.tf * ln((n.n_docs + 1.0) / (df.df + 1.0)), 8) AS tfidf
    FROM tf JOIN df USING (token) CROSS JOIN n
    WHERE tf.doc_id < 100
    """,
    tags=("llm", "text"),
)
def q_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF via explode+join (the SQL-expressible variant; MLlib
    HashingTF/IDF is the hashed alternative). DF and N computed over the
    full corpus; output restricted to doc_id < 100 to bound rows. The df
    side is a token-level aggregate — orders of magnitude smaller than the
    corpus — and broadcast."""
    t = load(spark, sf_dir)
    tokens = t.documents.select("doc_id", F.explode(_tokens()).alias("token"))
    tf = tokens.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    df = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    n_docs = t.documents.agg(F.count(F.lit(1)).alias("n_docs"))
    return (
        tf.filter(F.col("doc_id") < 100)
        .join(F.broadcast(df), "token")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "token",
            F.col("tf").cast("bigint").alias("tf"),
            F.col("df").cast("bigint").alias("df"),
            F.round(
                F.col("tf")
                * F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0)),
                8,
            ).alias("tfidf"),
        )
    )


@query(
    "q_entropy",
    oracle="""
    SELECT source, round(entropy(lang), 8) AS lang_entropy,
           count(*) AS n_docs
    FROM documents
    GROUP BY source
    """,
    tags=("text", "agg"),
)
def q_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy (bits) of the language mix per source — the
    diversity score a corpus-curation pipeline ranks sources by. Spark has
    no entropy aggregate; it decomposes into two cheap aggs: count per
    (source, lang) — the only full shuffle — then -Σ p·log2(p) over the
    tiny per-source distribution (matches DuckDB's entropy())."""
    t = load(spark, sf_dir)
    counts = t.documents.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("n")
    )
    per_source = Window.partitionBy("source")
    p = F.col("n") / F.sum("n").over(per_source)
    return (
        counts.select("source", F.col("n"), (-p * F.log2(p)).alias("term"))
        .groupBy("source")
        .agg(
            F.round(F.sum("term"), 8).alias("lang_entropy"),
            F.sum("n").alias("n_docs"),
        )
    )


@query(
    "q_dataset_split",
    oracle="""
    SELECT doc_id,
           CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) BETWEEN '0' AND 'b'
                THEN 'train'
                WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('c', 'd')
                THEN 'val'
                ELSE 'test'
           END AS split
    FROM documents
    """,
    tags=("text", "dataset"),
)
def q_dataset_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment by content-free key hash
    (first md5 hex digit: 0-b → train 75%, c-d → val 12.5%, e-f → test
    12.5%) — reproducible across engines and runs, no RNG state, and
    stable under re-partitioning, which per-row rand() splits are not.
    A pure projection: no shuffle at any scale."""
    t = load(spark, sf_dir)
    digit = F.substring(F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 1)
    return t.documents.select(
        "doc_id",
        F.when(digit.between("0", "b"), "train")
        .when(digit.isin("c", "d"), "val")
        .otherwise("test")
        .alias("split"),
    )


@query(
    "q_chunk_text",
    oracle="""
    WITH starts AS (
      SELECT doc_id, text,
             unnest(range(1, greatest(length(text), 1) + 1, 400)) AS s
      FROM documents
    )
    SELECT doc_id, s AS chunk_start, substr(text, s, 500) AS chunk
    FROM starts
    """,
    tags=("text", "dataset"),
)
def q_chunk_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping training chunks: 500-char windows every 400 chars
    (100-char overlap), generated with sequence+explode — the 1→N row
    expansion stays inside the engine (no UDF, no driver loop), and chunk
    extraction is a substring projection. At scale the expansion factor is
    len/stride, applied partition-locally."""
    t = load(spark, sf_dir)
    starts = F.sequence(
        F.lit(1), F.greatest(F.length("text"), F.lit(1)), F.lit(400)
    )
    return t.documents.select(
        "doc_id",
        F.explode(starts).alias("chunk_start"),
        "text",
    ).select(
        "doc_id",
        "chunk_start",
        F.substring(F.col("text"), F.col("chunk_start"), F.lit(500)).alias("chunk"),
    )


@query(
    "q_bigrams",
    oracle="""
    WITH words AS (
      SELECT string_split(lower(text), ' ') AS w FROM documents
    ),
    bg AS (
      SELECT unnest(list_transform(range(1, len(w)),
                                   i -> w[i] || ' ' || w[i+1])) AS bigram
      FROM words WHERE len(w) >= 2
    )
    SELECT bigram, count(*) AS n
    FROM bg GROUP BY bigram
    ORDER BY n DESC, bigram
    LIMIT 20
    """,
    tags=("text", "agg"),
)
def q_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 word bigrams: the n-gram generation is a pure array
    expression (sequence over positions → element_at pairs — no UDF, no
    shuffle until the count), so the corpus-size work stays in the scan
    stage and only (distinct-bigram, count) partials reach the exchange;
    top-20 is TakeOrderedAndProject. The unigram twin is q_wordcount."""
    t = load(spark, sf_dir)
    w = F.split(F.lower(F.col("text")), " ")
    bigrams = F.expr(
        "transform(sequence(1, size(w) - 1), "
        "i -> concat(element_at(w, i), ' ', element_at(w, i + 1)))"
    )
    return (
        t.documents.select(w.alias("w"))
        .filter(F.size("w") >= 2)
        .select(F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "bigram")
        .limit(20)
    )


@query(
    "q_pipeline_training_data",
    oracle="""
    WITH dedup AS (
      SELECT doc_id, text, lang, n_chars,
             row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
      FROM documents
    ),
    kept AS (
      SELECT doc_id, text FROM dedup
      WHERE rn = 1 AND lang IN ('en', 'de', 'fr', 'es') AND n_chars >= 100
    ),
    chunks AS (
      SELECT doc_id, text,
             unnest(range(1, greatest(length(text), 1) + 1, 400)) AS s
      FROM kept
    )
    SELECT doc_id, s AS chunk_start,
           substr(text, s, 500) AS chunk,
           CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) BETWEEN '0' AND 'b'
                THEN 'train'
                WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('c', 'd')
                THEN 'val'
                ELSE 'test'
           END AS split
    FROM chunks
    """,
    tags=("text", "dataset", "pipeline"),
)
def q_pipeline_training_data(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed training-data pipeline — the proof that the individual
    LLM-data operators chain into ONE declarative DAG: exact dedup (keep
    lowest doc_id per content hash) → language + length quality gate →
    overlapping 500/400 chunking → deterministic hash split. Catalyst sees
    the whole pipeline at once: the lang/n_chars filters push below the
    dedup window where legal, the chunk explosion runs partition-local,
    and the split is a pure projection — one shuffle total (the dedup
    window), regardless of scale."""
    t = load(spark, sf_dir)
    from pyspark.sql import Window

    w = Window.partitionBy(F.md5(F.col("text").cast("binary"))).orderBy("doc_id")
    kept = (
        t.documents.withColumn("rn", F.row_number().over(w))
        .filter(
            (F.col("rn") == 1)
            & F.col("lang").isin("en", "de", "fr", "es")
            & (F.col("n_chars") >= 100)
        )
        .select("doc_id", "text")
    )
    starts = F.sequence(
        F.lit(1), F.greatest(F.length("text"), F.lit(1)), F.lit(400)
    )
    digit = F.substring(F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 1)
    return (
        kept.select("doc_id", F.explode(starts).alias("chunk_start"), "text")
        .select(
            "doc_id",
            "chunk_start",
            F.substring(F.col("text"), F.col("chunk_start"), F.lit(500)).alias(
                "chunk"
            ),
            F.when(digit.between("0", "b"), "train")
            .when(digit.isin("c", "d"), "val")
            .otherwise("test")
            .alias("split"),
        )
    )


@query(
    "q_winsorize",
    oracle="""
    WITH b AS (
      SELECT event_type,
             round(quantile_cont(value, 0.01), 8) AS lo,
             round(quantile_cont(value, 0.99), 8) AS hi
      FROM events GROUP BY event_type
    )
    SELECT e.event_id, e.event_type,
           least(greatest(e.value, b.lo), b.hi) AS value_w
    FROM events e JOIN b USING (event_type)
    """,
    tags=("dataset", "prep"),
)
def q_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorization — clamp each value into its group's [p1, p99]: the
    standard outlier treatment before feature scaling. Per-group bounds
    are a dimension-sized aggregate broadcast back onto the fact stream;
    the clamp itself is a pure projection. (percentile_approx swaps in
    for the exact percentile at 100 TB — same shape, mergeable sketch.)"""
    t = load(spark, sf_dir)
    # Bounds pre-round 8dp on both engines (the q_lift_curve shared-input
    # rule): a last-ulp interpolation difference must not leak into the
    # clamped output of a boundary row.
    bounds = t.events.groupBy("event_type").agg(
        F.round(F.percentile("value", F.lit(0.01)), 8).alias("lo"),
        F.round(F.percentile("value", F.lit(0.99)), 8).alias("hi"),
    )
    return (
        t.events.join(F.broadcast(bounds), "event_type")
        .select(
            "event_id",
            "event_type",
            F.least(F.greatest(F.col("value"), F.col("lo")), F.col("hi")).alias(
                "value_w"
            ),
        )
    )


@query(
    "q_pmi",
    oracle="""
    WITH words AS (
      SELECT string_split(lower(text), ' ') AS w FROM documents
    ),
    uni AS (
      SELECT unnest(w) AS tok FROM words
    ),
    uni_counts AS (
      SELECT tok, count(*) AS c FROM uni GROUP BY tok
    ),
    n_uni AS (SELECT count(*) AS n FROM uni),
    bg AS (
      SELECT unnest(list_transform(range(1, len(w)), i -> w[i])) AS w1,
             unnest(list_transform(range(1, len(w)), i -> w[i+1])) AS w2
      FROM words WHERE len(w) >= 2
    ),
    bg_counts AS (
      SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY w1, w2
    ),
    n_bg AS (SELECT count(*) AS n FROM bg)
    SELECT w1, w2, c12,
           round(ln((CAST(c12 AS DOUBLE) * u.n * u.n)
                    / (CAST(b.n AS DOUBLE) * c1.c * c2.c)), 6) AS pmi
    FROM bg_counts
    JOIN uni_counts c1 ON c1.tok = w1
    JOIN uni_counts c2 ON c2.tok = w2
    CROSS JOIN n_uni u CROSS JOIN n_bg b
    WHERE c12 >= 5
    ORDER BY pmi DESC, w1, w2
    LIMIT 20
    """,
    tags=("text", "collocation"),
)
def q_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 collocations by pointwise mutual information — the classic
    'which word pairs co-occur far more than chance' signal (phrase
    detection for tokenizer/vocab curation in a training-data pipeline).
    PMI = ln(p(xy) / (p(x)p(y))) with counts from one corpus pass.

    Scale shape: bigram generation is the same in-scan array expression as
    q_bigrams (no shuffle until counts); unigram counts and the two scalar
    totals are tiny aggregates broadcast back onto the bigram counts — the
    only fact-sized shuffle is the bigram groupBy. The min-count >= 5 gate
    both stabilizes the statistic and caps the join input. Rounded to 6
    decimals and ordered on the rounded value so the top-20 boundary is
    engine-independent.
    """
    t = load(spark, sf_dir)
    w = F.split(F.lower(F.col("text")), " ")
    words = t.documents.select(w.alias("w"))
    uni = words.select(F.explode("w").alias("tok"))
    uni_counts = uni.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    n_uni = uni.agg(F.count(F.lit(1)).alias("n_u"))
    pairs = F.expr(
        "transform(sequence(1, size(w) - 1), "
        "i -> struct(element_at(w, i) AS w1, element_at(w, i + 1) AS w2))"
    )
    bg = (
        words.filter(F.size("w") >= 2)
        .select(F.explode(pairs).alias("p"))
        .select("p.w1", "p.w2")
    )
    bg_counts = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    n_bg = bg.agg(F.count(F.lit(1)).alias("n_b"))
    c1 = F.broadcast(uni_counts.select(F.col("tok").alias("w1"), F.col("c").alias("c1")))
    c2 = F.broadcast(uni_counts.select(F.col("tok").alias("w2"), F.col("c").alias("c2")))
    pmi = F.round(
        F.log(
            (F.col("c12").cast("double") * F.col("n_u") * F.col("n_u"))
            / (F.col("n_b").cast("double") * F.col("c1") * F.col("c2"))
        ),
        6,
    )
    return (
        bg_counts.filter(F.col("c12") >= 5)
        .join(c1, "w1")
        .join(c2, "w2")
        .crossJoin(F.broadcast(n_uni))
        .crossJoin(F.broadcast(n_bg))
        .select("w1", "w2", "c12", pmi.alias("pmi"))
        .orderBy(F.col("pmi").desc(), "w1", "w2")
        .limit(20)
    )


@query(
    "q_text_clean",
    oracle="""
    SELECT doc_id,
           trim(regexp_replace(
             regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
             ' +', ' ', 'g')) AS clean_text,
           length(trim(regexp_replace(
             regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
             ' +', ' ', 'g'))) AS clean_len,
           n_chars - length(trim(regexp_replace(
             regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
             ' +', ' ', 'g'))) AS removed
    FROM documents
    """,
    tags=("text", "cleaning"),
)
def q_text_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical text normalization — the first stage of every training-
    data pipeline: lowercase, strip everything outside [a-z0-9 ], collapse
    whitespace runs, trim. Emits the cleaned text plus a removed-char
    count (the quality signal: a document whose length collapses under
    cleaning was mostly markup/noise — downstream filters threshold on
    exactly this ratio).

    All regexp_replace: JVM-side, codegen, zero shuffles — a pure map
    stage that pipelines into whatever consumes it. At 100 TB this is the
    op that must NEVER be a Python UDF: per-row Python costs more than
    the rest of the pipeline combined at this width.
    """
    t = load(spark, sf_dir)
    cleaned = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", " "),
            " +",
            " ",
        )
    )
    return t.documents.select(
        "doc_id",
        cleaned.alias("clean_text"),
        F.length(cleaned).alias("clean_len"),
        (F.col("n_chars") - F.length(cleaned)).alias("removed"),
    )


#: PII patterns shared by both engines — plain character classes only
#: (no backreferences / lookaround), the syntax intersection of Java
#: regex (Spark, JVM-side codegen) and RE2 (DuckDB).
_PII_EMAIL = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}"
_PII_IPV4 = "[0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}"


@query(
    "q_pii_redact",
    oracle=f"""
    WITH aug AS (
      SELECT doc_id,
             CASE WHEN doc_id % 7 = 0 THEN
               text || ' contact user' || doc_id ||
               '@mail.example.com from ' || (doc_id % 256) || '.0.' ||
               (doc_id % 100) || '.1 ok'
             ELSE text END AS text
      FROM documents
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{_PII_EMAIL}')) AS INT)
             AS n_emails,
           CAST(len(regexp_extract_all(text, '{_PII_IPV4}')) AS INT)
             AS n_ips,
           regexp_replace(
             regexp_replace(text, '{_PII_EMAIL}', '<EMAIL>', 'g'),
             '{_PII_IPV4}', '<IP>', 'g') AS redacted
    FROM aug
    """,
    tags=("llm", "text", "pii"),
)
def q_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing — the compliance stage of a training-data pipeline:
    detect and mask email addresses and IPv4 literals, reporting per-doc
    match counts (the audit trail) next to the redacted text.

    The synthetic corpus contains no digits, so both engines first apply
    the SAME deterministic augmentation (every 7th doc gains a
    doc_id-derived email + IP) — the redaction machinery is exercised on
    real matches and stays hash-checkable, while the pattern itself is
    fixture-independent. Patterns use only character classes — the
    dialect intersection of Java regex and RE2 — so one pattern text
    drives both engines.

    Scale shape: identical to q_text_clean — regexp_count/regexp_replace
    are JVM-side codegen'd map expressions, zero shuffles, streaming
    through the scan. Swapping in heavier patterns (phone formats, IBANs,
    national-id checksums) changes only the pattern list, not the plan.
    """
    t = load(spark, sf_dir)
    aug = F.when(
        F.col("doc_id") % 7 == 0,
        F.concat(
            F.col("text"),
            F.lit(" contact user"), F.col("doc_id"),
            F.lit("@mail.example.com from "),
            (F.col("doc_id") % 256).cast("string"),
            F.lit(".0."), (F.col("doc_id") % 100).cast("string"),
            F.lit(".1 ok"),
        ),
    ).otherwise(F.col("text"))
    docs = t.documents.select("doc_id", aug.alias("text"))
    return docs.select(
        "doc_id",
        F.regexp_count("text", F.lit(_PII_EMAIL)).cast("int").alias("n_emails"),
        F.regexp_count("text", F.lit(_PII_IPV4)).cast("int").alias("n_ips"),
        F.regexp_replace(
            F.regexp_replace("text", _PII_EMAIL, "<EMAIL>"),
            _PII_IPV4,
            "<IP>",
        ).alias("redacted"),
    )


@query(
    "q_inverted_index",
    oracle="""
    SELECT token,
           count(DISTINCT doc_id)                  AS df,
           (list_sort(list(DISTINCT doc_id)))[1:1000] AS postings
    FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token
          FROM documents)
    GROUP BY token
    """,
    tags=("text", "search"),
)
def q_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted index build — token → (document frequency, sorted posting
    list) — the core retrieval structure a corpus-scale search layer needs.
    One explode + one groupBy(token) shuffle; map-side partial aggregation
    collapses repeated (token, doc) pairs before the exchange.

    Postings are sorted (delta-encodable at rest) and capped at 1000 per
    token: at 100 TB a stopword's full posting list is itself a big-data
    object, so production shards hot tokens across segment files — the
    cap documents that boundary instead of pretending one array holds it.
    """
    t = load(spark, sf_dir)
    tok = t.documents.select(
        "doc_id", F.explode(_tokens()).alias("token")
    ).distinct()
    return tok.groupBy("token").agg(
        F.count(F.lit(1)).alias("df"),
        F.slice(F.sort_array(F.collect_set("doc_id")), 1, 1000).alias("postings"),
    )


#: BM25 constants (Robertson/Sparck Jones defaults).
_BM25_K1, _BM25_B = 1.2, 0.75
_BM25_TERMS = ("hash", "merge")


def bm25_scored_ctes() -> str:
    """DuckDB CTE block producing ``scored(doc_id, score)`` — the BM25
    scorer for the fixed ``_BM25_TERMS`` query, shared between the
    q_bm25 oracle and the q_rrf fusion oracle (llm/similarity.py) so the
    lexical leg is literally the same SQL in both."""
    k1, b = _BM25_K1, _BM25_B
    per_term = " + ".join(
        f"""
        (ln(1 + (stats.n_docs - df_{t}.df + 0.5) / (df_{t}.df + 0.5))
         * (tf.tf_{t} * ({k1} + 1.0))
         / (tf.tf_{t} + {k1} * (1 - {b} + {b} * tf.doclen / stats.avglen)))
        """
        for t in _BM25_TERMS
    )
    tf_cols = ", ".join(
        f"len(list_filter(string_split(text, ' '), x -> x = '{t}')) AS tf_{t}"
        for t in _BM25_TERMS
    )
    df_ctes = ", ".join(
        f"""df_{t} AS (
          SELECT count(*) AS df FROM documents
          WHERE list_contains(string_split(text, ' '), '{t}')
        )"""
        for t in _BM25_TERMS
    )
    return f"""tf AS (
      SELECT doc_id, len(string_split(text, ' ')) AS doclen, {tf_cols}
      FROM documents
    ),
    stats AS (
      SELECT count(*) AS n_docs, avg(len(string_split(text, ' '))) AS avglen
      FROM documents
    ),
    {df_ctes},
    scored AS (
      SELECT tf.doc_id, round({per_term}, 6) AS score
      FROM tf, stats, {", ".join(f"df_{t}" for t in _BM25_TERMS)}
    )"""


def _bm25_oracle() -> str:
    return f"""
    WITH {bm25_scored_ctes()}
    SELECT doc_id, score
    FROM scored
    WHERE score > 0
    ORDER BY score DESC, doc_id
    LIMIT 20
    """


def bm25_scored(documents: DataFrame) -> DataFrame:
    """BM25 scores for the fixed ``_BM25_TERMS`` query, rounded to 6
    decimals and filtered to score > 0 — the shared lexical scorer behind
    q_bm25 (top-20 list) and q_rrf's lexical leg (llm/similarity.py).
    Pure column expressions, one corpus pass, stats crossJoined back as a
    broadcast scalar row (see q_bm25's docstring for the plan argument).
    """
    k1, b = _BM25_K1, _BM25_B
    toks = _tokens()

    def term_count(term: str):
        # NB: keep the lambda unary — F.filter treats a 2-arg lambda as
        # (element, index) and would compare tokens against positions.
        return F.size(F.filter(toks, lambda x: x == F.lit(term)))

    tf = documents.select(
        "doc_id",
        F.size(toks).alias("doclen"),
        *[term_count(term).alias(f"tf_{term}") for term in _BM25_TERMS],
    )
    stats = documents.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg(F.size(toks)).alias("avglen"),
        *[
            F.sum(
                F.array_contains(toks, term).cast("long")
            ).alias(f"df_{term}")
            for term in _BM25_TERMS
        ],
    )
    scored = tf.crossJoin(F.broadcast(stats))
    score = None
    for term in _BM25_TERMS:
        idf = F.log(
            F.lit(1.0)
            + (F.col("n_docs") - F.col(f"df_{term}") + F.lit(0.5))
            / (F.col(f"df_{term}") + F.lit(0.5))
        )
        part = idf * (
            F.col(f"tf_{term}") * F.lit(k1 + 1.0)
        ) / (
            F.col(f"tf_{term}")
            + F.lit(k1) * (F.lit(1 - b) + F.lit(b) * F.col("doclen") / F.col("avglen"))
        )
        score = part if score is None else score + part
    return (
        scored.select("doc_id", F.round(score, 6).alias("score"))
        .filter(F.col("score") > 0)
    )


@query("q_bm25", oracle=_bm25_oracle(), tags=("text", "search"))
def q_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 relevance ranking for a fixed two-term query — the classic
    retrieval scorer over the inverted-index statistics (tf, df, doc
    length, corpus average length). For a bounded term set everything is
    pure column expressions: per-term tf via size(filter(tokens)), corpus
    stats via one aggregate crossJoined back as broadcast scalars — no
    explode, no per-token shuffle, one pass over the corpus.

    Scores are rounded to 6 decimals BEFORE the top-k cut with doc_id as
    the tie-break, so the k-boundary is stable across engines whose ln()
    differs in the last ulp. At 100 TB the same plan serves as the
    scoring stage after candidate pruning via q_inverted_index postings.
    """
    t = load(spark, sf_dir)
    return (
        bm25_scored(t.documents)
        .orderBy(F.col("score").desc(), "doc_id")
        .limit(20)
    )


@query(
    "q_bpe_merge",
    oracle="""
    WITH words AS (
      SELECT w AS word, count(*) AS word_freq
      FROM (SELECT unnest(string_split(lower(text), ' ')) AS w
            FROM documents)
      GROUP BY w
    ),
    chars AS (
      SELECT word, word_freq,
             unnest(generate_series(1, length(word))) AS pos
      FROM words
    ),
    prs AS (
      SELECT word, word_freq, pos,
             substr(word, CAST(pos AS INTEGER), 1) AS sym,
             lead(substr(word, CAST(pos AS INTEGER), 1))
               OVER (PARTITION BY word ORDER BY pos) AS nxt
      FROM chars
    ),
    pair_counts AS (
      SELECT sym AS l, nxt AS r, sum(word_freq) AS cnt
      FROM prs WHERE nxt IS NOT NULL GROUP BY 1, 2
    ),
    chosen AS (
      SELECT l, r FROM pair_counts ORDER BY cnt DESC, l, r LIMIT 1
    ),
    m AS (
      SELECT p.word, p.pos,
             row_number() OVER (PARTITION BY p.word ORDER BY p.pos) AS rn
      FROM prs p, chosen c
      WHERE p.sym = c.l AND p.nxt = c.r
    ),
    isl AS (
      SELECT word, pos - rn AS island, count(*) AS k
      FROM m GROUP BY word, island
    ),
    mg AS (
      SELECT word, CAST(sum((k + 1) // 2) AS BIGINT) AS n_merges
      FROM isl GROUP BY word
    )
    SELECT w.word, w.word_freq,
           CAST(length(w.word) AS BIGINT)             AS n_sym_before,
           c.l                                        AS merge_left,
           c.r                                        AS merge_right,
           coalesce(mg.n_merges, 0)                   AS n_merges,
           CAST(length(w.word) AS BIGINT)
             - coalesce(mg.n_merges, 0)               AS n_sym_after
    FROM words w CROSS JOIN chosen c LEFT JOIN mg USING (word)
    """,
    tags=("llm", "text", "tokenizer"),
)
def q_bpe_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One merge round of byte-pair-encoding tokenizer training (VERDICT
    r7 item 6; Sennrich et al. 2016): count adjacent character-pair
    frequencies over the corpus vocabulary (weighted by word frequency),
    pick the argmax pair (ties broken lexicographically), and APPLY the
    merge greedily left-to-right to every word — emitting, per vocabulary
    word, its frequency, symbol counts before/after, the chosen pair, and
    how many merges landed in it. Iterating this round yields the full
    BPE merge table; one round keeps the output oracle-checkable while
    exercising the whole count + argmax + apply machinery.

    Greedy-apply semantics, the subtle part: pair occurrences may overlap
    when left==right ("aaaa" has 3 occurrences of "aa" but greedy merges
    only 2). Handled without any sequential code via gaps-and-islands:
    matched pair positions within a word form runs of consecutive
    integers (pos - row_number is constant per run); a run of k matches
    yields ceil(k/2) greedy merges — for left != right runs are always
    length 1 (s[i+1]=right != left forbids a match at i+1), so every
    occurrence merges, exactly the greedy result.

    Scale shape: ONE fact-scale shuffle (the word-frequency groupBy, with
    map-side partial agg); everything after runs at VOCABULARY grain —
    char explode, lead window, pair count, islands are all per distinct
    word. The argmax is a TakeOrdered(1) broadcast back as a 1-row
    crossJoin; no UDF anywhere in the count or apply path."""
    t = load(spark, sf_dir)
    words = (
        t.documents.select(
            F.explode(F.split(F.lower("text"), " ")).alias("word")
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("word_freq"))
        .localCheckpoint()
    )
    chars = words.select(
        "word",
        "word_freq",
        F.explode(
            F.when(
                F.length("word") >= 1, F.sequence(F.lit(1), F.length("word"))
            ).otherwise(F.array().cast("array<int>"))
        ).alias("pos"),
    )
    w_word = Window.partitionBy("word").orderBy("pos")
    prs = chars.withColumn(
        "sym", F.expr("substr(word, pos, 1)")
    ).withColumn("nxt", F.lead("sym").over(w_word))
    chosen = (
        prs.filter(F.col("nxt").isNotNull())
        .groupBy(F.col("sym").alias("l"), F.col("nxt").alias("r"))
        .agg(F.sum("word_freq").alias("cnt"))
        .orderBy(F.desc("cnt"), "l", "r")
        .limit(1)
        .select("l", "r")
    )
    m = (
        prs.crossJoin(F.broadcast(chosen))
        .filter((F.col("sym") == F.col("l")) & (F.col("nxt") == F.col("r")))
        .withColumn("rn", F.row_number().over(w_word))
    )
    mg = (
        m.groupBy("word", (F.col("pos") - F.col("rn")).alias("island"))
        .agg(F.count(F.lit(1)).alias("k"))
        .groupBy("word")
        .agg(F.sum(F.expr("(k + 1) div 2")).cast("bigint").alias("n_merges"))
    )
    return (
        words.crossJoin(F.broadcast(chosen))
        .join(mg, "word", "left")
        .select(
            "word",
            "word_freq",
            F.length("word").cast("bigint").alias("n_sym_before"),
            F.col("l").alias("merge_left"),
            F.col("r").alias("merge_right"),
            F.coalesce("n_merges", F.lit(0).cast("bigint")).alias("n_merges"),
            (
                F.length("word").cast("bigint")
                - F.coalesce("n_merges", F.lit(0).cast("bigint"))
            ).alias("n_sym_after"),
        )
    )


#: Full-BPE training rounds: enough to chain merges through rewritten
#: multi-char symbols (round 2+ operates on round 1's output symbols),
#: few enough to keep the unrolled oracle readable.
BPE_ROUNDS = 3


def _bpe_chain_ctes() -> list:
    """Unrolled {BPE_ROUNDS}-round BPE chain (shared by q_bpe_train and
    q_bpe_encode, which differ only in their final SELECT). Each round:
    adjacent-pair counts over the CURRENT symbol sequences →
    lexicographic-tie argmax → greedy rewrite (odd-rank members of each
    matched-position island merge; the position after a merge is
    consumed) → re-number. The greedy selection generalizes
    q_bpe_merge's ceil(k/2) counting to an actual rewrite."""
    parts = [
        """
    WITH words AS (
      SELECT w AS word, count(*) AS word_freq
      FROM (SELECT unnest(string_split(lower(text), ' ')) AS w
            FROM documents)
      GROUP BY w
    ),
    syms0 AS (
      SELECT word, word_freq, pos,
             substr(word, CAST(pos AS INTEGER), 1) AS sym
      FROM (SELECT word, word_freq,
                   unnest(generate_series(1, length(word))) AS pos
            FROM words)
    )"""
    ]
    for i in range(1, BPE_ROUNDS + 1):
        parts.append(f""",
    prs{i} AS (
      SELECT word, word_freq, pos, sym,
             lead(sym) OVER (PARTITION BY word ORDER BY pos) AS nxt
      FROM syms{i - 1}
    ),
    ch{i} AS (
      SELECT l, r FROM (
        SELECT sym AS l, nxt AS r, sum(word_freq) AS cnt
        FROM prs{i} WHERE nxt IS NOT NULL GROUP BY sym, nxt)
      ORDER BY cnt DESC, l, r LIMIT 1
    ),
    m{i} AS (
      SELECT p.word, p.pos,
             row_number() OVER (PARTITION BY p.word ORDER BY p.pos) AS rn
      FROM prs{i} p, ch{i} c WHERE p.sym = c.l AND p.nxt = c.r
    ),
    g{i} AS (
      SELECT word, pos FROM (
        SELECT word, pos,
               row_number() OVER (PARTITION BY word, pos - rn
                                  ORDER BY pos) AS rn2
        FROM m{i}) WHERE rn2 % 2 = 1
    ),
    syms{i} AS (
      SELECT p.word, p.word_freq,
             row_number() OVER (PARTITION BY p.word ORDER BY p.pos) AS pos,
             CASE WHEN g.pos IS NOT NULL THEN p.sym || p.nxt
                  ELSE p.sym END AS sym
      FROM prs{i} p
      LEFT JOIN g{i} g ON g.word = p.word AND g.pos = p.pos
      LEFT JOIN g{i} h ON h.word = p.word AND h.pos = p.pos - 1
      WHERE h.pos IS NULL
    )""")
    parts.append(f""",
    seg AS (
      SELECT word, word_freq,
             string_agg(sym, ' ' ORDER BY pos) AS seg,
             CAST(count(*) AS BIGINT) AS n_syms
      FROM syms{BPE_ROUNDS} GROUP BY word, word_freq
    )""")
    return parts


def _bpe_train_oracle() -> str:
    merge_str = " || ',' || ".join(
        f"c{i}.l || '+' || c{i}.r" for i in range(1, BPE_ROUNDS + 1)
    )
    crosses = " ".join(
        f"CROSS JOIN ch{i} c{i}" for i in range(1, BPE_ROUNDS + 1)
    )
    return "".join(
        _bpe_chain_ctes()
        + [f"""
    SELECT s.word, s.word_freq, s.seg, s.n_syms,
           {merge_str} AS merges
    FROM seg s {crosses}
    """]
    )


def _bpe_encode_oracle() -> str:
    return "".join(
        _bpe_chain_ctes()
        + ["""
    , doc_tok AS (
      SELECT doc_id, unnest(string_split(lower(text), ' ')) AS word
      FROM documents
    )
    SELECT d.doc_id,
           CAST(count(*) AS BIGINT) AS n_words,
           CAST(sum(s.n_syms) AS BIGINT) AS n_bpe_tokens,
           round(sum(s.n_syms) * 1.0 / count(*), 6) AS avg_syms_per_word
    FROM doc_tok d JOIN seg s USING (word)
    GROUP BY d.doc_id
    """]
    )


@query(
    "q_bpe_train",
    oracle=_bpe_train_oracle(),
    tags=("llm", "text", "tokenizer", "iterative"),
)
def q_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """{BPE_ROUNDS} chained merge rounds of BPE tokenizer training —
    q_bpe_merge driven through REAL sequence rewriting: after round 1
    the vocabulary's words are sequences of multi-character symbols, so
    round 2's pair statistics and merges operate on merged symbols (the
    part a single counting round can't exercise). Per round: adjacent
    pair counts weighted by word frequency → argmax (count DESC,
    lexicographic tie-break — engine-identical) → GREEDY left-to-right
    apply via gaps-and-islands, generalized from counting to rewriting:
    within each island (run) of matched positions the odd-ranked members
    merge and the position following each merge is consumed; for l≠r
    islands are provably length-1 (see q_bpe_merge), for l==r this is
    exactly the overlap rule ("aaaa" → "aa aa", "aaa" → "aa a"). Emits
    each word's final segmentation, symbol count, and the ordered merge
    table — the actual artifacts a tokenizer trainer persists.

    Scale shape (r12, the q_hits single-batch template): ONE fact-scale
    shuffle total (the word-frequency groupBy with map-side partials);
    all {BPE_ROUNDS} rounds then run inside ONE Arrow batch over the
    VOCABULARY-grain table — see :func:`bpe_train` for the grain
    argument and the oracle-parity semantics of the greedy apply."""
    return bpe_train(load(spark, sf_dir).documents, BPE_ROUNDS)


def bpe_train(docs: DataFrame, rounds: int) -> DataFrame:
    """Composable BPE trainer over a ``(doc_id, text)`` corpus — the body
    of :func:`q_bpe_train` (semantics there); exposed so tests can pin
    the chained-rewrite corners (multi-char round-2 merges, l==r overlap)
    on a toy corpus.

    r12 single-batch form (the q_hits treatment, VERDICT r11 task 1):
    the ONLY fact-scale stage is the word-frequency groupBy (map-side
    partials, one shuffle); ALL merge rounds then run inside ONE Arrow
    batch — a single-group applyInPandas over the VOCABULARY-grain
    (word, word_freq) table. The previous form chained ~4 vocab-grain
    jobs per round (lead-window checkpoint, argmax, greedy-position
    rewrite, re-number), paying a stage quantum each for work that is
    microseconds of dict arithmetic; the iteration grain is BELOW task
    grain, so the idiomatic Spark treatment is one vectorized task.
    Vocabulary is summary-scale by Heaps' law (|V| ~ N^0.5 even for web
    corpora; a 10M-word vocab is a few hundred MB in one batch) and at
    100 TB the trained segment table is computed once per tokenizer
    release and persisted. Greedy-apply semantics (the l==r overlap
    rule: a run of k matches yields ceil(k/2) merges, the position
    after a merge is consumed) is the plain left-to-right scan the SQL
    oracle's gaps-and-islands odd-rank rule encodes; argmax tie-break
    is (count DESC, l, r) with codepoint string order, identical to the
    oracle's ORDER BY."""
    words = (
        docs.select(
            F.explode(F.split(F.lower("text"), " ")).alias("word")
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("word_freq"))
    )

    def _bpe_batch(pdf):
        import pandas as pd

        wlist = pdf["word"].tolist()
        freqs = [int(f) for f in pdf["word_freq"].tolist()]
        seqs = [list(w) for w in wlist]
        merges = []
        for _ in range(rounds):
            cnt: dict = {}
            for syms, f in zip(seqs, freqs):
                for a, b in zip(syms, syms[1:]):
                    k = (a, b)
                    cnt[k] = cnt.get(k, 0) + f
            if not cnt:
                # Oracle parity: an empty pair table makes ch_i empty and
                # the CROSS JOIN chain annihilates the output.
                return pd.DataFrame(
                    {
                        "word": pd.Series([], dtype="object"),
                        "word_freq": pd.Series([], dtype="int64"),
                        "seg": pd.Series([], dtype="object"),
                        "n_syms": pd.Series([], dtype="int64"),
                        "merges": pd.Series([], dtype="object"),
                    }
                )
            (l, r), _c = min(
                cnt.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
            )
            merges.append(l + "+" + r)
            lr = l + r
            for wi, syms in enumerate(seqs):
                n = len(syms)
                if n < 2:
                    continue
                out = []
                i = 0
                while i < n:
                    if i + 1 < n and syms[i] == l and syms[i + 1] == r:
                        out.append(lr)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                seqs[wi] = out
        mstr = ",".join(merges)
        return pd.DataFrame(
            {
                "word": wlist,
                "word_freq": pd.Series(freqs, dtype="int64"),
                "seg": [" ".join(s) for s in seqs],
                "n_syms": pd.Series([len(s) for s in seqs], dtype="int64"),
                "merges": mstr,
            }
        )

    return (
        words.withColumn("g", F.lit(0))
        .groupBy("g")
        .applyInPandas(
            _bpe_batch,
            "word string, word_freq bigint, seg string, n_syms bigint,"
            " merges string",
        )
    )


@query(
    "q_bpe_encode",
    oracle=_bpe_encode_oracle(),
    tags=("llm", "text", "tokenizer"),
)
def q_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ENCODE the corpus with the tokenizer q_bpe_train just trained —
    the apply half of tokenizer training, and the exact-token-count
    surface q_token_count only approximates (chars/4): per document, its
    whitespace word count, its post-BPE token count under the
    {BPE_ROUNDS}-merge vocabulary, and the mean symbols-per-word
    compression. Because BPE segmentation is a pure per-WORD function,
    encoding = the trained per-word segment table joined back to the
    corpus's exploded words — no per-document re-derivation.

    Scale shape: the segment table is VOCABULARY-grain (distinct words ×
    n_syms — summary-scale even for web corpora) and joins the exploded
    fact by BROADCAST below the cap; the only fact-scale exchanges are
    the word explode's groupBy(doc_id) re-aggregation and the train
    chain's one vocabulary groupBy. The train chain itself is the r12
    single-batch form (ONE applyInPandas task over the vocab — see
    :func:`bpe_train`). At 100 TB the segment table is computed once
    per tokenizer release and persisted; here it rides the same DAG."""
    t = load(spark, sf_dir)
    seg = bpe_train(t.documents, BPE_ROUNDS).select("word", "n_syms")
    words = t.documents.select(
        "doc_id", F.explode(F.split(F.lower("text"), " ")).alias("word")
    )
    return (
        words.join(F.broadcast(seg), "word")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("n_syms").cast("bigint").alias("n_bpe_tokens"),
            F.round(
                F.sum("n_syms") / F.count(F.lit(1)).cast("double"), 6
            ).alias("avg_syms_per_word"),
        )
    )


#: Unigram-LM (SentencePiece-style) tokenizer parameters: candidate
#: pieces up to UNI_TOKLEN chars, UNI_TOPK multi-char pieces kept by
#: weighted substring count, words longer than UNI_MAXLEN excluded by
#: contract (the oracle's DP unrolls UNI_MAXLEN positions; corpus max
#: is 8). Costs are -ln(p) quantized to integer micro-nats so the
#: Viterbi DP is exact integer arithmetic on both engines.
UNI_TOKLEN = 3
UNI_TOPK = 24
UNI_MAXLEN = 16


def _unigram_oracle() -> str:
    # Unrolled Viterbi: dp{i} = min cost to tokenize the first i chars
    # (UNI_MAXLEN position CTEs), then an unrolled backtrack over the
    # unified dp table picking the engine's (cost, longest, lexicographic)
    # argmin at each step. Every multiply-referenced CTE is MATERIALIZED
    # (the r11 DuckDB CTE-inlining lesson).
    parts = [f"""
    WITH doc_tok AS MATERIALIZED (
      SELECT word, CAST(count(*) AS BIGINT) AS word_freq
      FROM (SELECT unnest(string_split(lower(text), ' ')) AS word
            FROM documents)
      WHERE length(word) BETWEEN 1 AND {UNI_MAXLEN}
      GROUP BY word
    ),
    nums AS (SELECT unnest(range(1, {UNI_MAXLEN} + 1)) AS i),
    lens AS (SELECT unnest([1, 2, 3]) AS L),
    subs AS MATERIALIZED (
      SELECT substr(d.word, CAST(n.i AS INT), CAST(l.L AS INT)) AS tok,
             CAST(sum(d.word_freq) AS BIGINT) AS occ
      FROM doc_tok d CROSS JOIN nums n CROSS JOIN lens l
      WHERE n.i + l.L - 1 <= length(d.word)
      GROUP BY 1
    ),
    vocab0 AS MATERIALIZED (
      SELECT tok, occ FROM subs WHERE length(tok) = 1
      UNION ALL
      SELECT tok, occ FROM (
        SELECT tok, occ FROM subs WHERE length(tok) > 1
        ORDER BY occ DESC, tok ASC LIMIT {UNI_TOPK})
    ),
    tot AS (SELECT sum(occ) AS tot FROM vocab0),
    vocab AS MATERIALIZED (
      SELECT tok, occ,
             CAST(floor(-ln(occ * 1.0 / tot) * 1000000 + 0.5) AS BIGINT)
               AS icost
      FROM vocab0 CROSS JOIN tot
    ),
    dp0 AS MATERIALIZED (
      SELECT word, word_freq, CAST(0 AS BIGINT) AS cost FROM doc_tok
    )"""]
    for i in range(1, UNI_MAXLEN + 1):
        branches = []
        for L in (1, 2, 3):
            if L > i:
                continue
            branches.append(f"""
        SELECT p.word, p.word_freq, p.cost + v.icost AS cost
        FROM dp{i - L} p JOIN vocab v
          ON length(v.tok) = {L}
         AND v.tok = substr(p.word, {i - L + 1}, {L})""")
        parts.append(f""",
    dp{i} AS MATERIALIZED (
      SELECT word, word_freq, min(cost) AS cost
      FROM ({" UNION ALL ".join(branches)}) GROUP BY word, word_freq
    )""")
    dp_union = " UNION ALL ".join(
        f"SELECT word, word_freq, {i} AS pos, cost FROM dp{i}"
        for i in range(0, UNI_MAXLEN + 1)
    )
    parts.append(f""",
    dp_all AS MATERIALIZED ({dp_union}),
    bt0 AS MATERIALIZED (
      SELECT word, word_freq, length(word) AS pos FROM doc_tok
    )""")
    for k in range(1, UNI_MAXLEN + 1):
        parts.append(f""",
    bt{k} AS MATERIALIZED (
      SELECT word, word_freq, pos, tok FROM (
        SELECT b.word, b.word_freq, d.pos, v.tok,
               row_number() OVER (
                 PARTITION BY b.word
                 ORDER BY d.cost + v.icost ASC, length(v.tok) DESC,
                          v.tok ASC) AS rn
        FROM bt{k - 1} b
        JOIN vocab v
          ON length(v.tok) <= 3
        JOIN dp_all d
          ON d.word = b.word AND d.pos = b.pos - length(v.tok)
         AND v.tok = substr(b.word, d.pos + 1, length(v.tok))
        WHERE b.pos > 0
      ) WHERE rn = 1
    )""")
    tok_union = " UNION ALL ".join(
        f"SELECT word_freq, tok FROM bt{k}"
        for k in range(1, UNI_MAXLEN + 1)
    )
    parts.append(f""",
    toks AS MATERIALIZED ({tok_union}),
    em AS MATERIALIZED (
      SELECT tok, CAST(sum(word_freq) AS BIGINT) AS em_count
      FROM toks GROUP BY tok
    )
    SELECT v.tok AS token, v.occ AS occ_seed, v.icost AS icost,
           CAST(coalesce(e.em_count, 0) AS BIGINT) AS em_count,
           round(coalesce(e.em_count, 0) * 1.0
                 / (SELECT sum(em_count) FROM em), 8) AS p_em
    FROM vocab v LEFT JOIN em e ON e.tok = v.tok
    ORDER BY token
    """)
    return "".join(parts)


@query(
    "q_unigram_lm",
    oracle=_unigram_oracle(),
    tags=("llm", "text", "tokenizer", "iterative"),
)
def q_unigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM (SentencePiece-style) tokenizer — ONE full E/M round,
    the deferred half of the tokenizer family next to q_bpe_train
    (VERDICT r12 task 4): seed vocabulary = every single character plus
    the top-{UNI_TOPK} multi-character substrings (length ≤ {UNI_TOKLEN})
    by word-frequency-weighted occurrence count; seed piece probability
    p₀(tok) = occ/Σocc; E-step = per-word Viterbi segmentation
    maximizing Σ ln p₀ (single-char coverage guarantees reachability);
    M-step = re-estimated piece probabilities p₁(tok) =
    Σ_words count(tok)·freq / Σ total at VOCAB grain. Emits the vocab-
    grain EM table (seed count, quantized cost, EM count, p₁).

    Determinism: the only float is ONE -ln(occ/Σocc) per vocab piece
    (summary grain), quantized half-up to integer micro-nats on both
    engines (the q_pacf/q_hits 8dp-lockstep class) — the Viterbi DP and
    its (cost ASC, piece-length DESC, piece ASC) argmin tie-break are
    then exact integer/string comparisons, identical on both engines.
    Words longer than {UNI_MAXLEN} chars are excluded by declared
    contract (oracle DP unrolls {UNI_MAXLEN} positions; corpus max 8).

    Scale shape (the q_bpe_train single-batch template): ONE fact-scale
    shuffle (word-frequency groupBy, map-side partials); seeding,
    Viterbi and the M-step all run inside ONE Arrow batch over the
    vocabulary-grain table — iteration grain is below task grain, so
    the idiomatic treatment is one vectorized task (vocabulary is
    summary-scale by Heaps' law). Oracle: the SAME DP unrolled as
    {UNI_MAXLEN} materialized position CTEs + an unrolled backtrack
    (cites reference tests.py's behavioral-parity strategy; Kudo 2018
    for the unigram LM)."""
    return unigram_lm(load(spark, sf_dir).documents)


def unigram_lm(docs: DataFrame) -> DataFrame:
    """Composable unigram-LM E/M round over a ``(doc_id, text)`` corpus —
    body of :func:`q_unigram_lm` (semantics there); exposed so tests can
    pin Σ-token conservation and the Viterbi tie-break on toy corpora."""
    words = (
        docs.select(
            F.explode(F.split(F.lower("text"), " ")).alias("word")
        )
        .filter(
            (F.length("word") >= 1) & (F.length("word") <= UNI_MAXLEN)
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("word_freq"))
    )

    def _uni_batch(pdf):
        import math

        import pandas as pd

        wl = pdf["word"].tolist()
        fr = [int(x) for x in pdf["word_freq"].tolist()]
        occ: dict = {}
        for w, f in zip(wl, fr):
            n = len(w)
            for L in range(1, UNI_TOKLEN + 1):
                for i in range(0, n - L + 1):
                    t = w[i : i + L]
                    occ[t] = occ.get(t, 0) + f
        vocab = {t: c for t, c in occ.items() if len(t) == 1}
        multis = sorted(
            ((t, c) for t, c in occ.items() if len(t) > 1),
            key=lambda kv: (-kv[1], kv[0]),
        )[:UNI_TOPK]
        vocab.update(dict(multis))
        tot = sum(vocab.values())
        # Half-up quantization to micro-nats (-ln(p) > 0 since every
        # piece count < tot), matching DuckDB floor(x*1e6 + 0.5).
        icost = {
            t: int(math.floor(-math.log(c / tot) * 1e6 + 0.5))
            for t, c in vocab.items()
        }
        em = {t: 0 for t in vocab}
        for w, f in zip(wl, fr):
            n = len(w)
            dp: list = [None] * (n + 1)
            back: list = [None] * (n + 1)
            dp[0] = 0
            for i in range(1, n + 1):
                best = None
                for L in range(1, min(UNI_TOKLEN, i) + 1):
                    t = w[i - L : i]
                    c = icost.get(t)
                    if c is None or dp[i - L] is None:
                        continue
                    key = (dp[i - L] + c, -L, t)
                    if best is None or key < best:
                        best = key
                if best is not None:
                    dp[i] = best[0]
                    back[i] = best[2]
            i = n
            while i > 0:
                t = back[i]
                em[t] += f
                i -= len(t)
        em_tot = sum(em.values())
        toks = sorted(vocab)
        return pd.DataFrame(
            {
                "token": toks,
                "occ_seed": pd.Series(
                    [vocab[t] for t in toks], dtype="int64"
                ),
                "icost": pd.Series([icost[t] for t in toks], dtype="int64"),
                "em_count": pd.Series([em[t] for t in toks], dtype="int64"),
                # Half-up at 8dp (DuckDB round(); Python round is
                # banker's — a k/2·1e-8 rational would diverge).
                "p_em": [
                    math.floor(em[t] / em_tot * 1e8 + 0.5) / 1e8
                    for t in toks
                ],
            }
        )

    return (
        words.withColumn("g", F.lit(0))
        .groupBy("g")
        .applyInPandas(
            _uni_batch,
            "token string, occ_seed bigint, icost bigint,"
            " em_count bigint, p_em double",
        )
    )


#: Count-Min sketch sizing: d hash rows × w counters. At the test vocab
#: (~31 tokens) collisions are absent; production sizes w ≈ e/ε for the
#: tolerated overcount ε·N.
CMS_D = 4
CMS_W = 1024


@query(
    "q_cms_heavy",
    oracle="""
    SELECT token,
           CAST(count(*) AS BIGINT) AS n_true,
           TRUE AS no_underestimate
    FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
    GROUP BY token
    """,
    tags=("llm", "text", "sketch"),
)
def q_cms_heavy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch over corpus token frequencies — the fixed-memory
    frequency summary a streaming ingest keeps when the vocabulary is
    too large to count exactly ({CMS_D} xxhash64 rows × {CMS_W}
    counters; point estimate = min over rows). Driver-checkable form
    (the q_bloom_screen sketch convention): raw estimates are
    implementation-defined (hash layout), so the output carries the
    EXACT count beside the structural invariant a Count-Min sketch can
    never violate — estimates NEVER undercount (every occurrence of a
    token increments all {CMS_D} of its counters; collisions only add).
    A broken sketch (wrong probe row, dropped counter cell, min over
    the wrong axis) flips the literal-TRUE verdict and fails the hash.

    Scale shape: ONE fact-scale exchange (the token count groupBy, with
    map-side partials); the sketch build and the probe both run at
    VOCAB × {CMS_D} grain against the ≤{CMS_D}×{CMS_W}-row BROADCAST
    counter table — the sketch is by construction bounded memory
    regardless of corpus size."""
    return cms_token_sketch(load(spark, sf_dir).documents).select(
        "token",
        "n_true",
        (F.col("est") >= F.col("n_true")).alias("no_underestimate"),
    )


def cms_token_sketch(
    docs: DataFrame, d: int = CMS_D, w: int = CMS_W
) -> DataFrame:
    """Count-Min token-frequency sketch over a ``(doc_id, text)`` corpus:
    (token, n_true, est) — the body of :func:`q_cms_heavy` (semantics
    there); exposed with tunable (d, w) so tests can force collisions on
    a tiny sketch and pin the never-undercount invariant under real
    overestimation."""
    vocab = (
        docs.select(F.explode(_tokens()).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n_true"))
        .localCheckpoint()
    )
    pairs = vocab.select(
        "token",
        "n_true",
        F.explode(F.sequence(F.lit(0), F.lit(d - 1))).alias("row"),
    ).withColumn("col", F.pmod(F.xxhash64("token", F.col("row")), F.lit(w)))
    counters = pairs.groupBy("row", "col").agg(F.sum("n_true").alias("c"))
    return (
        pairs.join(F.broadcast(counters), ["row", "col"])
        .groupBy("token")
        .agg(F.min("c").alias("est"), F.first("n_true").alias("n_true"))
        .select("token", "n_true", "est")
    )


#: q_quality_classifier: hashed-feature space size (fastText's default
#: bucket trick) and the fixed-point weight modulus. Weights are a
#: deterministic hash of the bucket id — an engine-neutral stand-in for a
#: shipped .bin of trained weights; the Spark plumbing (hashing, integer
#: weight fold, sigmoid) is the production part.
QC_BUCKETS = 1024
QC_MOD = 1_000_003
QC_SHIFT = (QC_MOD - 1) // 2  # centers weights on ~0


@query(
    "q_quality_classifier",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
      FROM documents
    ),
    w AS (
      SELECT doc_id,
             CAST(CAST(concat('0x', substr(md5(tok), 1, 8)) AS UBIGINT)
                  AS BIGINT) % {QC_BUCKETS} AS bucket
      FROM tok
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           round(1.0 / (1.0 + exp(-(
             sum((bucket * 2654435761) % {QC_MOD} - {QC_SHIFT})
             / CAST({QC_MOD} AS DOUBLE) / count(*)))), 6) AS quality_prob,
           (sum((bucket * 2654435761) % {QC_MOD} - {QC_SHIFT}) > 0) AS keep
    FROM w GROUP BY doc_id
    """,
    tags=("llm", "curation", "quality"),
)
def q_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learned-classifier quality filtering (the fastText linear model of
    CCNet/RefinedWeb/FineWeb-Edu, as opposed to q_quality_score's
    hand-tuned heuristics): each token hashes into {QC_BUCKETS} feature
    buckets (fastText's hashing trick), the model is one weight per
    bucket, and a document's keep-probability is sigmoid(mean token
    weight). ``keep`` is the 0.5-threshold decision (sigmoid(x) > 0.5 iff
    the raw weight sum > 0, so the flag is computed in EXACT integer
    space).

    Parity design: weights live in integer fixed-point (hash-derived
    numerators, one float division per DOCUMENT at the end) so the
    fact-scale sum is order-independent and exact — float token weights
    would make the fold's value depend on partial-aggregation order,
    which no rounding reliably absorbs. Scale shape: pure map-side
    expressions then ONE groupBy(doc_id) whose integer sum collapses
    map-side; no model table at all (the weight IS an expression), so
    unlike q_dsir_weights there is not even a broadcast — this is the
    cheapest possible classifier-scoring plan, one exchange total."""
    t = load(spark, sf_dir)
    bucket = (
        F.conv(F.substring(F.md5("tok"), 1, 8), 16, 10).cast("bigint")
        % QC_BUCKETS
    )
    wnum = (bucket * F.lit(2654435761)) % QC_MOD - QC_SHIFT
    return (
        t.documents.select(
            "doc_id", F.explode(F.split(F.lower("text"), " ")).alias("tok")
        )
        .select("doc_id", wnum.alias("wnum"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(
                1.0
                / (
                    1.0
                    + F.exp(
                        -(
                            F.sum("wnum")
                            / F.lit(float(QC_MOD))
                            / F.count(F.lit(1))
                        )
                    )
                ),
                6,
            ).alias("quality_prob"),
            (F.sum("wnum") > 0).alias("keep"),
        )
    )


#: q_ngram_novelty: shingle width for the novelty curve (4-grams — long
#: enough that repeats mean real reuse, short enough that every doc has
#: grams).
NOVELTY_N = 4


@query(
    "q_ngram_novelty",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, string_split(lower(text), ' ') AS tk FROM documents
    ),
    grams AS (
      SELECT DISTINCT doc_id,
             concat_ws(' ', tk[CAST(i AS INTEGER)],
                       tk[CAST(i AS INTEGER) + 1],
                       tk[CAST(i AS INTEGER) + 2],
                       tk[CAST(i AS INTEGER) + 3]) AS gram
      FROM (SELECT doc_id, tk,
                   unnest(generate_series(
                     1, greatest(len(tk) - {NOVELTY_N - 1}, 1))) AS i
            FROM tok)
    ),
    first_seen AS (
      SELECT gram, min(doc_id) AS first_doc FROM grams GROUP BY 1
    )
    SELECT g.doc_id,
           CAST(count(*) AS BIGINT) AS n_grams,
           CAST(count(*) FILTER (WHERE f.first_doc = g.doc_id) AS BIGINT)
             AS n_novel,
           round(count(*) FILTER (WHERE f.first_doc = g.doc_id) * 1.0
                 / count(*), 6) AS novelty
    FROM grams g JOIN first_seen f USING (gram)
    GROUP BY g.doc_id
    """,
    tags=("llm", "curation", "quality"),
)
def q_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram novelty curve (the dataset-analysis diagnostic of Muennighoff
    et al.'s data-constrained scaling work and the Pile's dedup reports):
    per document, the fraction of its distinct {NOVELTY_N}-grams whose
    FIRST corpus occurrence (minimum doc_id — ingestion order) is this
    document. Early documents score ~1; heavily templated or duplicated
    late documents trend toward 0 — the curve's decay measures how fast a
    crawl exhausts fresh content, which is what decides whether the next
    crawl shard is worth tokenizing.

    Scale shape: gram extraction is the map-only slice/concat shingle
    shape (no lambda-inlined re-evaluation); per-doc distinct grams fold
    BEFORE any join (array_distinct on the per-row gram array, no
    exchange); first-seen is ONE fact-scale groupBy(gram) min — map-side
    partials collapse duplicate grams per partition; the join back is
    keyed on the SAME gram column (co-partitioned exchanges, no broadcast
    assumption — gram vocabulary scales with the corpus); the final
    per-doc fraction is one groupBy(doc_id). Hot grams (stop-phrase skew)
    split via AQE skew-join."""
    t = load(spark, sf_dir)
    tk = F.split(F.lower("text"), " ")
    grams_arr = F.array_distinct(
        F.transform(
            F.sequence(
                F.lit(1), F.greatest(F.size(tk) - (NOVELTY_N - 1), F.lit(1))
            ),
            lambda i: F.concat_ws(" ", F.slice(tk, i, NOVELTY_N)),
        )
    )
    # Two consumers (first-seen build + join back) — checkpoint the gram
    # stream once or the tokenize/shingle plan re-executes per consumer.
    grams = t.documents.select(
        "doc_id", F.explode(grams_arr).alias("gram")
    ).localCheckpoint()
    first_seen = grams.groupBy("gram").agg(F.min("doc_id").alias("first_doc"))
    novel = F.col("first_doc") == F.col("doc_id")
    return (
        grams.join(first_seen, "gram")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(novel.cast("bigint")).alias("n_novel"),
            F.round(
                F.sum(novel.cast("double")) / F.count(F.lit(1)), 6
            ).alias("novelty"),
        )
    )


@query(
    "q_zipf_fit",
    oracle="""
    WITH freq AS (
      SELECT tok, count(*) AS f
      FROM (SELECT unnest(string_split(lower(text), ' ')) AS tok
            FROM documents)
      GROUP BY 1
    ),
    ranked AS (
      SELECT ln(CAST(row_number() OVER (ORDER BY f DESC, tok) AS DOUBLE))
               AS x,
             ln(CAST(f AS DOUBLE)) AS y
      FROM freq
    ),
    s AS (
      SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
             sum(x * x) AS sxx, sum(y * y) AS syy, sum(x * y) AS sxy
      FROM ranked
    )
    SELECT CAST(n AS BIGINT) AS n_vocab,
           round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
           round((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n, 6)
             AS intercept,
           round(((n * sxy - sx * sy) * (n * sxy - sx * sy))
                 / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS r2
    FROM s
    """,
    tags=("llm", "curation", "quality"),
)
def q_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit — the corpus-health diagnostic (natural text shows
    log-frequency ~ -1 x log-rank; bot spam, boilerplate floods and
    tokenizer bugs all bend the tail): OLS slope/intercept/R^2 of
    ln(frequency) against ln(rank) over the full vocabulary, rank ties
    broken by token for a deterministic order in both engines.

    Scale shape: ONE fact-scale groupBy(token) builds the frequency
    table; everything after — ranking window, the five OLS moment sums,
    the closed-form fit — runs at VOCABULARY grain (the single-partition
    rank window orders vocab rows, never the corpus; at web vocab sizes
    the global_row_number two-pass range plan swaps in). Moment sums are
    plain double aggregates: vocabulary-grain addition-order drift is
    ~1e-15 relative and the fit is rounded to 6dp with O(n)-conditioned
    denominators, the same float contract as the corpus's avg(ln)
    scores."""
    t = load(spark, sf_dir)
    freq = (
        t.documents.select(
            F.explode(F.split(F.lower("text"), " ")).alias("tok")
        )
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("f"))
    )
    w = Window.orderBy(F.col("f").desc(), "tok")
    ranked = freq.select(
        F.log(F.row_number().over(w).cast("double")).alias("x"),
        F.log(F.col("f").cast("double")).alias("y"),
    )
    s = ranked.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return s.select(
        n.cast("bigint").alias("n_vocab"),
        F.round(slope, 6).alias("slope"),
        F.round((sy - slope * sx) / n, 6).alias("intercept"),
        F.round(
            ((n * sxy - sx * sy) * (n * sxy - sx * sy))
            / ((n * sxx - sx * sx) * (n * syy - sy * sy)),
            6,
        ).alias("r2"),
    )


#: q_rake_keywords: phrase delimiters — the union of the per-language
#: stop lists (RAKE segments candidate phrases at stopwords; this
#: corpus's function-word stand-ins).
RAKE_STOP = tuple(sorted({w for ws in _STOP.values() for w in ws}))


@query(
    "q_rake_keywords",
    oracle=f"""
    WITH pt AS (
      SELECT doc_id, CAST(i AS BIGINT) AS pos, tk[CAST(i AS INTEGER)] AS tok
      FROM (SELECT doc_id, string_split(lower(text), ' ') AS tk,
                   unnest(generate_series(1, len(string_split(text, ' '))))
                     AS i
            FROM documents)
    ),
    ns AS (
      SELECT doc_id, pos, tok,
             pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos)
               AS grp
      FROM pt WHERE tok NOT IN {RAKE_STOP!r}
    ),
    pw AS (
      SELECT doc_id, grp, pos, tok,
             count(*) OVER (PARTITION BY doc_id, grp) AS plen
      FROM ns
    ),
    ws AS (
      SELECT doc_id, tok,
             sum(plen) / count(*) AS wscore
      FROM pw GROUP BY 1, 2
    ),
    ph AS (
      SELECT pw.doc_id, pw.grp,
             string_agg(pw.tok, ' ' ORDER BY pw.pos) AS phrase,
             round(list_reduce(
               list_prepend(CAST(0.0 AS DOUBLE),
                            list(ws.wscore ORDER BY pw.pos)),
               (acc, x) -> acc + x), 6) AS score
      FROM pw JOIN ws ON ws.doc_id = pw.doc_id AND ws.tok = pw.tok
      GROUP BY 1, 2
    )
    SELECT doc_id, phrase AS top_phrase, score,
           CAST(n_phrases AS BIGINT) AS n_phrases
    FROM (SELECT doc_id, phrase, score,
                 count(*) OVER (PARTITION BY doc_id) AS n_phrases,
                 row_number() OVER (PARTITION BY doc_id
                                    ORDER BY score DESC, phrase) AS rn
          FROM ph)
    WHERE rn = 1
    """,
    tags=("llm", "curation", "quality"),
)
def q_rake_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE keyword extraction (Rose et al. 2010 — the classic
    stopword-delimited keyphrase scorer, still the cheap first pass for
    corpus topic profiling and dataset cards): candidate phrases are
    maximal stopword-free token runs (gaps-and-islands on position);
    each word scores degree/frequency within its document (degree = sum
    of lengths of phrases containing it — favors words that co-occur in
    long phrases); a phrase scores the sum of its words' scores; the
    top-scoring phrase per document is emitted with the doc's phrase
    count.

    Determinism contract: word scores are ratios of exact integers;
    the phrase-score sum folds SEQUENTIALLY over position-sorted word
    scores in both engines (collect-sort-fold, the q_crosslingual_mine
    pattern); ranking uses the rounded score with a phrase tie-break.

    Scale shape: tokenize/flag/island-id are map-only plus per-DOCUMENT
    windows (key-partitioned by doc_id — each partition holds one doc's
    tokens, no global funnel); word stats are one groupBy(doc_id, tok)
    and rejoin keyed the same way; phrase assembly and the top-1 are
    per-doc groupBy/window. Every exchange is keyed on doc_id(+tok) —
    uniform-cardinality keys, no skew risk, no broadcast needed."""
    t = load(spark, sf_dir)
    pt = t.documents.select(
        "doc_id",
        F.posexplode(F.split(F.lower("text"), " ")).alias("p0", "tok"),
    ).select("doc_id", (F.col("p0") + 1).cast("bigint").alias("pos"), "tok")
    ns = pt.filter(~F.col("tok").isin(*RAKE_STOP)).withColumn(
        "grp",
        F.col("pos")
        - F.row_number().over(Window.partitionBy("doc_id").orderBy("pos")),
    )
    pw = ns.withColumn(
        "plen", F.count(F.lit(1)).over(Window.partitionBy("doc_id", "grp"))
    ).localCheckpoint()
    ws = pw.groupBy("doc_id", "tok").agg(
        (F.sum("plen") / F.count(F.lit(1))).alias("wscore")
    )
    ph = (
        pw.join(ws, ["doc_id", "tok"])
        .groupBy("doc_id", "grp")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                    lambda s: s["tok"],
                ),
                " ",
            ).alias("phrase"),
            F.round(
                F.aggregate(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("pos", "wscore"))),
                        lambda s: s["wscore"],
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ),
                6,
            ).alias("score"),
        )
    )
    w_top = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), "phrase"
    )
    return (
        ph.withColumn(
            "n_phrases",
            F.count(F.lit(1)).over(Window.partitionBy("doc_id")),
        )
        .withColumn("rn", F.row_number().over(w_top))
        .filter(F.col("rn") == 1)
        .select(
            "doc_id",
            F.col("phrase").alias("top_phrase"),
            "score",
            F.col("n_phrases").cast("bigint").alias("n_phrases"),
        )
    )


#: q_mi_features: how many top tokens to emit from the MI ranking.
MI_TOP = 20


@query(
    "q_mi_features",
    oracle=f"""
    WITH pres AS (
      SELECT DISTINCT doc_id, lang, tok
      FROM (SELECT doc_id, lang,
                   unnest(string_split(lower(text), ' ')) AS tok
            FROM documents)
    ),
    nd AS (SELECT count(DISTINCT doc_id) AS n FROM documents),
    nl AS (SELECT lang, count(*) AS n_l FROM documents GROUP BY 1),
    nt AS (SELECT tok, count(*) AS n_t FROM pres GROUP BY 1),
    cell AS (
      SELECT tok, lang, count(*) AS n_tl FROM pres GROUP BY 1, 2
    ),
    full_grid AS (
      SELECT nt.tok, nl.lang, nt.n_t, nl.n_l, coalesce(cell.n_tl, 0) AS n_tl
      FROM nt CROSS JOIN nl
      LEFT JOIN cell ON cell.tok = nt.tok AND cell.lang = nl.lang
    ),
    mi AS (
      SELECT tok,
             round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list(CASE WHEN n_tl > 0
                         THEN (n_tl * 1.0 / n)
                              * ln((n_tl * 1.0 / n)
                                   / ((n_t * 1.0 / n) * (n_l * 1.0 / n)))
                         ELSE 0.0 END
                    + CASE WHEN n_l - n_tl > 0
                           THEN ((n_l - n_tl) * 1.0 / n)
                                * ln(((n_l - n_tl) * 1.0 / n)
                                     / (((n - n_t) * 1.0 / n)
                                        * (n_l * 1.0 / n)))
                           ELSE 0.0 END
                    ORDER BY lang)),
               (acc, x) -> acc + x), 8) AS mi
      FROM full_grid CROSS JOIN nd
      GROUP BY tok, n
    )
    SELECT tok, mi, CAST(rk AS BIGINT) AS rk
    FROM (SELECT *, row_number() OVER (ORDER BY mi DESC, tok) AS rk FROM mi)
    WHERE rk <= {MI_TOP}
    """,
    tags=("llm", "curation", "quality"),
)
def q_mi_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual-information feature ranking (the filter-method
    feature-selection classic; what picks the language-ID stopword lists
    q_lang_id then hard-codes): per token, I(presence; lang) over the
    document-level presence/absence x language contingency table — the
    top-{MI_TOP} tokens are the most language-discriminative features in
    the corpus. Complements q_chisq (significance of one association)
    with a RANKING over all features.

    Determinism: every cell is an exact integer count; each token's MI
    folds SEQUENTIALLY over its language-sorted cells (present + absent
    terms per language, zero-count cells contribute 0 by the 0·log 0
    convention) and rounds to 8dp; ranking ties break by token.

    Scale shape: per-doc presence collapses map-side (array_distinct
    before the exchange — the q_ngram_novelty shape); the contingency
    grid lives at (vocabulary x languages) grain built from ONE
    fact-scale groupBy plus two summary aggregates (language counts
    broadcast, doc-count scalar crossJoin); the MI fold and top-k run at
    vocabulary grain (TakeOrdered — per-partition top-{MI_TOP}, never a
    global sort)."""
    t = load(spark, sf_dir)
    pres = t.documents.select(
        "doc_id",
        "lang",
        F.explode(
            F.array_distinct(F.split(F.lower("text"), " "))
        ).alias("tok"),
    )
    n_docs = t.documents.count()
    nl = t.documents.groupBy("lang").agg(F.count(F.lit(1)).alias("n_l"))
    nt = pres.groupBy("tok").agg(F.countDistinct("doc_id").alias("n_t"))
    cell = pres.groupBy("tok", "lang").agg(
        F.countDistinct("doc_id").alias("n_tl")
    )
    grid = (
        nt.crossJoin(F.broadcast(nl))
        .join(cell, ["tok", "lang"], "left")
        .withColumn("n_tl", F.coalesce("n_tl", F.lit(0)))
    )
    n = F.lit(float(n_docs))
    present = F.when(
        F.col("n_tl") > 0,
        (F.col("n_tl") / n)
        * F.log(
            (F.col("n_tl") / n)
            / ((F.col("n_t") / n) * (F.col("n_l") / n))
        ),
    ).otherwise(0.0)
    absent = F.when(
        (F.col("n_l") - F.col("n_tl")) > 0,
        ((F.col("n_l") - F.col("n_tl")) / n)
        * F.log(
            ((F.col("n_l") - F.col("n_tl")) / n)
            / (((F.lit(float(n_docs)) - F.col("n_t")) / n) * (F.col("n_l") / n))
        ),
    ).otherwise(0.0)
    mi = (
        grid.select("tok", "lang", (present + absent).alias("term"))
        .groupBy("tok")
        .agg(
            F.round(
                F.aggregate(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("lang", "term"))),
                        lambda s: s["term"],
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ),
                8,
            ).alias("mi")
        )
    )
    return (
        mi.orderBy(F.col("mi").desc(), "tok")
        .limit(MI_TOP)
        .select(
            "tok",
            "mi",
            F.row_number()
            .over(Window.orderBy(F.col("mi").desc(), "tok"))
            .cast("bigint")
            .alias("rk"),
        )
    )


@query(
    "q_tokenizer_fertility",
    oracle="""
    WITH feats AS (
      SELECT lang,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS ws_tokens,
             CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]'))
                  AS BIGINT) AS regex_tokens,
             CAST(length(text) AS BIGINT) AS n_chars,
             CAST(strlen(text) AS BIGINT) AS n_bytes
      FROM documents
    )
    SELECT lang,
           count(*) AS n_docs,
           CAST(sum(ws_tokens) AS BIGINT)    AS ws_tokens,
           CAST(sum(regex_tokens) AS BIGINT) AS regex_tokens,
           round(sum(regex_tokens) / CAST(sum(ws_tokens) AS DOUBLE), 6)
             AS fertility,
           round(sum(n_chars) / CAST(sum(ws_tokens) AS DOUBLE), 6)
             AS chars_per_token,
           round(sum(n_bytes) / CAST(sum(n_chars) AS DOUBLE), 6)
             AS bytes_per_char
    FROM feats GROUP BY lang
    """,
    tags=("llm", "text"),
)
def q_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility audit by language: regex-tokens per whitespace
    word (the "fertility" a tokenizer choice is judged on — how many
    subwords a word explodes into), chars per word and UTF-8 bytes per
    char — the per-language table that decides vocab allocation and flags
    languages a byte-level fallback would penalize. Corpus-grain inputs,
    language-grain output; ratios computed on the SUMS (corpus fertility,
    not mean-of-doc-fertilities) and rounded 6dp.

    Scale shape: one map-side projection of four counters + one algebraic
    groupBy(lang) with map-side partials — the cheapest possible shape; no
    windows, no joins."""
    t = load(spark, sf_dir)
    feats = t.documents.select(
        "lang",
        F.size(_tokens()).cast("bigint").alias("ws_tokens"),
        F.regexp_count(F.col("text"), F.lit("[a-z]+|[0-9]+|[^a-z0-9 ]"))
        .cast("bigint")
        .alias("regex_tokens"),
        F.length("text").cast("bigint").alias("n_chars"),
        F.octet_length("text").cast("bigint").alias("n_bytes"),
    )
    return feats.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("ws_tokens").cast("bigint").alias("ws_tokens"),
        F.sum("regex_tokens").cast("bigint").alias("regex_tokens"),
        F.round(
            F.sum("regex_tokens") / F.sum("ws_tokens").cast("double"), 6
        ).alias("fertility"),
        F.round(
            F.sum("n_chars") / F.sum("ws_tokens").cast("double"), 6
        ).alias("chars_per_token"),
        F.round(
            F.sum("n_bytes") / F.sum("n_chars").cast("double"), 6
        ).alias("bytes_per_char"),
    )


#: Per-domain calibrated filtering: keep the top this fraction per source.
CALIB_KEEP = 0.3


@query(
    "q_quality_calibration",
    oracle=f"""
    WITH feats AS (
      SELECT doc_id, source,
             len(string_split(text, ' '))                         AS n_tokens,
             len(list_filter(string_split(text,' '),
                             x -> x IN ('the','a','data','row'))) AS stop_hits,
             len(list_distinct(string_split(text,' ')))           AS n_unique
      FROM documents
    ),
    scored AS (
      SELECT doc_id, source,
             round(0.4 * least(n_tokens / 50.0, 1.0)
                 + 0.3 * (stop_hits / CAST(n_tokens AS DOUBLE))
                 + 0.3 * (n_unique / CAST(n_tokens AS DOUBLE)), 8) AS quality
      FROM feats
    ),
    ranked AS (
      SELECT *,
             row_number() OVER (PARTITION BY source
                                ORDER BY quality DESC, doc_id) AS rnk,
             count(*) OVER (PARTITION BY source) AS n_src
      FROM scored
    ),
    cutoff AS (
      SELECT round(quantile_cont(CAST(quality AS DOUBLE),
                                 {1 - CALIB_KEEP}), 8) AS gcut
      FROM scored
    )
    SELECT source,
           CAST(max(n_src) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN rnk <= ceil({CALIB_KEEP} * n_src)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_kept_local,
           round(min(CASE WHEN rnk <= ceil({CALIB_KEEP} * n_src)
                          THEN quality END), 8) AS local_cutoff,
           CAST(sum(CASE WHEN quality >= (SELECT gcut FROM cutoff)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_kept_global,
           (SELECT gcut FROM cutoff) AS global_cutoff
    FROM ranked
    GROUP BY source
    """,
    tags=("llm", "text", "quality"),
)
def q_quality_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain calibrated quality filtering (the CCNet practice):
    keeping the global top-{CALIB_KEEP:.0%} by one score silently empties
    domains whose score distribution sits low — calibrate by keeping each
    SOURCE's top {CALIB_KEEP:.0%} instead. Emits, per source, the local
    keep count and score cutoff next to the count the GLOBAL
    {1 - CALIB_KEEP:.0%}-percentile threshold would keep — the table that
    shows exactly which domains global filtering starves. Score = the
    q_quality_score recipe (rounded 8dp; doc_id tie-breaks make the local
    ranks engine-lockstep).

    Scale shape: the local rank is a source-KEYED window (hash exchange on
    source, never single-partition); the global cutoff is one exact-
    percentile aggregate riding a 1-row broadcast crossJoin (the
    documented scalar class); per-source rollup is algebraic."""
    from pyspark.sql import Window

    t = load(spark, sf_dir)
    n_tokens = F.size(_tokens())
    stop_hits = F.size(F.filter(_tokens(), lambda x: x.isin(*_STOP["en"])))
    n_unique = F.size(F.array_distinct(_tokens()))
    scored = t.documents.select(
        "doc_id",
        "source",
        F.round(
            0.4 * F.least(n_tokens / F.lit(50.0), F.lit(1.0))
            + 0.3 * (stop_hits / n_tokens.cast("double"))
            + 0.3 * (n_unique / n_tokens.cast("double")),
            8,
        ).alias("quality"),
    )
    w_src = Window.partitionBy("source").orderBy(
        F.col("quality").desc(), "doc_id"
    )
    ranked = scored.select(
        "source",
        "quality",
        F.row_number().over(w_src).alias("rnk"),
        F.count(F.lit(1)).over(Window.partitionBy("source")).alias("n_src"),
    )
    cutoff = scored.agg(
        F.round(F.percentile("quality", F.lit(1 - CALIB_KEEP)), 8).alias("gcut")
    )
    kept_local = F.col("rnk") <= F.ceil(CALIB_KEEP * F.col("n_src"))
    return (
        ranked.crossJoin(F.broadcast(cutoff))
        .groupBy("source")
        .agg(
            F.max("n_src").cast("bigint").alias("n_docs"),
            F.sum(F.when(kept_local, 1).otherwise(0))
            .cast("bigint")
            .alias("n_kept_local"),
            F.round(F.min(F.when(kept_local, F.col("quality"))), 8).alias(
                "local_cutoff"
            ),
            F.sum(F.when(F.col("quality") >= F.col("gcut"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_kept_global"),
            F.first("gcut").alias("global_cutoff"),
        )
    )


@query(
    "q_lang_id_chargram",
    oracle="""
    WITH tri AS (
      SELECT doc_id, lang, doc_id % 5 = 0 AS held_out, t.tri, count(*) AS cnt
      FROM documents,
           LATERAL (SELECT unnest(list_transform(
                      range(1, length(text) - 1),
                      i -> substr(text, CAST(i AS INTEGER), 3))) AS tri) t
      WHERE length(text) >= 3
      GROUP BY doc_id, lang, held_out, t.tri
    ),
    model AS (
      SELECT lang, tri, sum(cnt) AS c FROM tri WHERE NOT held_out
      GROUP BY lang, tri
    ),
    tot AS (SELECT lang, sum(c) AS tot FROM model GROUP BY lang),
    v AS (SELECT count(DISTINCT tri) AS v FROM model),
    doc AS (
      SELECT doc_id, lang AS labeled_lang, sum(cnt) AS n_tri
      FROM tri WHERE held_out GROUP BY doc_id, lang
    ),
    matched AS (
      SELECT t.doc_id, m.lang, sum(t.cnt * ln(m.c + 1)) AS mterm
      FROM tri t JOIN model m ON t.tri = m.tri
      WHERE t.held_out
      GROUP BY t.doc_id, m.lang
    ),
    scores AS (
      SELECT d.doc_id, d.labeled_lang, tot.lang,
             round(coalesce(ma.mterm, 0.0)
                   - d.n_tri * ln(tot.tot + (SELECT v FROM v)), 6) AS score
      FROM doc d
      CROSS JOIN tot
      LEFT JOIN matched ma ON ma.doc_id = d.doc_id AND ma.lang = tot.lang
    )
    SELECT doc_id, labeled_lang, lang AS predicted_lang, score AS best_score,
           labeled_lang = lang AS is_correct
    FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
                                       ORDER BY score DESC, lang) AS rn
          FROM scores)
    WHERE rn = 1
    """,
    tags=("llm", "text", "quality"),
)
def q_lang_id_chargram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-trigram Naive Bayes language ID (the fastText/CLD
    architecture, exact): train add-one-smoothed per-language trigram
    models on the 80% of docs with doc_id % 5 != 0, score the held-out
    20% with score(d, l) = sum cnt_t * ln(c_lt + 1) - n_d * ln(tot_l + V)
    (the algebraic collapse of add-one NB — unseen trigrams contribute
    only through the subtraction term), predict by rounded-6dp argmax
    with language tie-break. The upgrade of q_lang_id's stopword
    heuristic to a real trained classifier, engine-lockstep.

    Scale shape: ONE fact-scale trigram explode feeds both the model
    (language x trigram grain — bounded by content, not corpus; the
    Heaps'-law vocabulary argument) and the held-out scoring join; the
    per-language totals and V ride broadcast; scoring is one equi-join
    on trigram + one groupBy(doc, lang); the language dim (5 rows)
    crossJoins broadcast. No windows over the fact — the argmax window
    partitions by doc_id."""
    from pyspark.sql import Window

    t = load(spark, sf_dir)
    # length >= 3 gate on BOTH engines: Spark's sequence(1, len-2) would
    # emit a DESCENDING [1, 0, ...] for sub-3-char texts (spurious
    # trigrams), while DuckDB's range(1, len-1) is simply empty — gating
    # the explode keeps the engines in lockstep and drops no real rows.
    tri = (
        t.documents.filter(F.length("text") >= 3)
        .select(
            "doc_id",
            "lang",
            (F.col("doc_id") % 5 == 0).alias("held_out"),
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.length("text") - 2),
                    lambda i: F.substring(F.col("text"), i, 3),
                )
            ).alias("tri"),
        )
        .groupBy("doc_id", "lang", "held_out", "tri")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    # NOT checkpointed: tri is doc x trigram grain (fact-scale). The two
    # consumers (model build, held-out scoring) re-run the map-side
    # explode with their held_out filters pushed into the scan — at
    # 100 TB a second columnar scan is cheaper than materializing a
    # fact-scale intermediate (the summary-grain-only checkpoint rule).
    model = (
        tri.filter(~F.col("held_out"))
        .groupBy("lang", "tri")
        .agg(F.sum("cnt").alias("c"))
    )
    # Summary-scale model tables get FRESH column names before they meet
    # the doc side again — tot/v/matched and doc all descend from `tri`,
    # and Spark cannot disambiguate same-lineage attribute ids in the
    # re-join (the q_lang_id_chargram self-join; caught by driver_sim).
    tot = model.groupBy("lang").agg(F.sum("c").alias("tot")).select(
        F.col("lang").alias("cand_lang"), "tot"
    )
    v = model.agg(F.countDistinct("tri").alias("v"))
    doc = (
        tri.filter("held_out")
        .groupBy("doc_id", F.col("lang").alias("labeled_lang"))
        .agg(F.sum("cnt").alias("n_tri"))
    )
    matched = (
        tri.filter("held_out")
        .select("doc_id", "tri", "cnt")
        .join(model.select("tri", F.col("lang").alias("mlang"), "c"), "tri")
        .groupBy(F.col("doc_id").alias("m_doc_id"), "mlang")
        .agg(F.sum(F.col("cnt") * F.log(F.col("c") + 1)).alias("mterm"))
    )
    scores = (
        doc.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(v))
        .join(
            matched,
            (F.col("m_doc_id") == F.col("doc_id"))
            & (F.col("mlang") == F.col("cand_lang")),
            "left",
        )
        .select(
            "doc_id",
            "labeled_lang",
            F.col("cand_lang").alias("lang"),
            F.round(
                F.coalesce(F.col("mterm"), F.lit(0.0))
                - F.col("n_tri") * F.log(F.col("tot") + F.col("v")),
                6,
            ).alias("score"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), "lang")
    return (
        scores.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "doc_id",
            "labeled_lang",
            F.col("lang").alias("predicted_lang"),
            F.col("score").alias("best_score"),
            (F.col("labeled_lang") == F.col("lang")).alias("is_correct"),
        )
    )


@query(
    "q_readability",
    oracle="""
    WITH feats AS (
      SELECT source,
             len(string_split(text, ' ')) AS words,
             greatest(len(regexp_extract_all(text, '[.!?]+')), 1)
               AS sentences,
             greatest(len(regexp_extract_all(lower(text), '[aeiouy]+')), 1)
               AS syllables
      FROM documents
    ),
    scored AS (
      SELECT source,
             206.835 - 1.015 * (words / CAST(sentences AS DOUBLE))
                     - 84.6 * (syllables / CAST(words AS DOUBLE))
               AS flesch,
             0.39 * (words / CAST(sentences AS DOUBLE))
               + 11.8 * (syllables / CAST(words AS DOUBLE)) - 15.59
               AS fk_grade
      FROM feats
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           round(avg(flesch), 6) AS avg_flesch,
           round(avg(fk_grade), 6) AS avg_fk_grade,
           round(sum(CASE WHEN flesch < 30 THEN 1 ELSE 0 END)
                 / CAST(count(*) AS DOUBLE), 6) AS share_hard
    FROM scored GROUP BY source ORDER BY source
    """,
    tags=("llm", "text", "quality"),
)
def q_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Readability scoring per source: Flesch reading ease and
    Flesch–Kincaid grade from whitespace words, sentence-punctuation
    runs, and vowel-group syllable counts — the classic curation filter
    (too-hard and too-easy text both correlate with boilerplate/OCR
    noise; FineWeb-style pipelines bucket on exactly these scores).

    Syllables are approximated as [aeiouy]+ runs over the whole lowered
    text (word-boundary-free, engine-neutral); sentence count floors at 1
    so punctuation-free docs stay defined. All three counters are
    map-side regexp/split counts in one projection — no explode, no UDF,
    no shuffle wider than the source-grain rollup. At 100 TB this is a
    pure scan stage that fuses with whatever filter pipeline runs next.
    """
    t = load(spark, sf_dir)
    words = F.size(F.split(F.col("text"), " "))
    sentences = F.greatest(
        F.regexp_count("text", F.lit(r"[.!?]+")), F.lit(1)
    )
    syllables = F.greatest(
        F.regexp_count(F.lower(F.col("text")), F.lit(r"[aeiouy]+")),
        F.lit(1),
    )
    feats = t.documents.select(
        "source",
        words.alias("words"),
        sentences.alias("sentences"),
        syllables.alias("syllables"),
    )
    flesch = (
        206.835
        - 1.015 * (F.col("words") / F.col("sentences").cast("double"))
        - 84.6 * (F.col("syllables") / F.col("words").cast("double"))
    )
    fk = (
        0.39 * (F.col("words") / F.col("sentences").cast("double"))
        + 11.8 * (F.col("syllables") / F.col("words").cast("double"))
        - 15.59
    )
    return (
        feats.select(
            "source", flesch.alias("flesch"), fk.alias("fk_grade")
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.round(F.avg("flesch"), 6).alias("avg_flesch"),
            F.round(F.avg("fk_grade"), 6).alias("avg_fk_grade"),
            F.round(
                F.sum(F.when(F.col("flesch") < 30, 1).otherwise(0))
                / F.count(F.lit(1)).cast("double"),
                6,
            ).alias("share_hard"),
        )
        .orderBy("source")
    )


def _lang_confusion_oracle() -> str:
    """Nest q_lang_id_chargram's full oracle as the prediction CTE —
    composition at the SQL layer mirrors the Spark-side composition."""
    from ..registry import REGISTRY

    preds = REGISTRY["q_lang_id_chargram"].oracle
    return f"""
    WITH preds AS ({preds}),
    by_true AS (
      SELECT labeled_lang AS lang,
             CAST(count(*) AS BIGINT) AS support,
             CAST(sum(CASE WHEN is_correct THEN 1 ELSE 0 END) AS BIGINT)
               AS tp
      FROM preds GROUP BY labeled_lang
    ),
    by_pred AS (
      SELECT predicted_lang AS lang, count(*) AS pcnt
      FROM preds GROUP BY predicted_lang
    ),
    cls AS (
      SELECT t.lang, t.support, t.tp,
             coalesce(p.pcnt, 0) - t.tp AS fp,
             t.support - t.tp AS fn,
             CASE WHEN coalesce(p.pcnt, 0) > 0
                  THEN t.tp / CAST(p.pcnt AS DOUBLE) ELSE 0.0 END AS prec,
             t.tp / CAST(t.support AS DOUBLE) AS rec
      FROM by_true t LEFT JOIN by_pred p ON p.lang = t.lang
    ),
    scored AS (
      SELECT lang, support, tp, CAST(fp AS BIGINT) AS fp,
             CAST(fn AS BIGINT) AS fn,
             round(prec, 6) AS precision_,
             round(rec, 6) AS recall_,
             round(CASE WHEN prec + rec > 0
                        THEN 2 * prec * rec / (prec + rec)
                        ELSE 0.0 END, 6) AS f1
      FROM cls
    )
    SELECT lang, support, tp, fp, fn,
           precision_ AS precision, recall_ AS recall, f1,
           round(avg(f1) OVER (), 6) AS macro_f1,
           round(sum(tp) OVER () / CAST(sum(support) OVER () AS DOUBLE), 6)
             AS accuracy
    FROM scored ORDER BY lang
    """


@query(
    "q_lang_confusion",
    oracle=_lang_confusion_oracle(),
    tags=("llm", "text", "ml", "quality"),
)
def q_lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier evaluation of the in-repo trained model: per-class
    precision / recall / F1, macro-F1 and accuracy of
    q_lang_id_chargram's held-out predictions against the labeled
    truth — the eval harness every model-based curation filter needs
    BEFORE its verdicts gate data (q_auc ranks scores; this scores hard
    predictions). Composition, not duplication: the Spark side consumes
    the registered operator's output frame; the oracle nests the
    operator's full oracle as its prediction CTE, so the two stay in
    lockstep BY CONSTRUCTION as the model op evolves.

    Eval-side cost is class-grain: two tiny aggregates over the
    prediction frame plus window folds over |languages| rows — the
    expensive part is the model op itself, already adjudicated
    scale-safe (one fact-scale explode, content-bound model grain)."""
    from pyspark.sql import Window

    preds = q_lang_id_chargram(spark, sf_dir)
    # ONE pass over the prediction frame: everything below derives from
    # the |langs|^2-grain confusion matrix (two independent aggregates
    # would re-execute the whole chargram DAG — measured 6.4 s vs 3.4 s).
    conf = preds.groupBy("labeled_lang", "predicted_lang").agg(
        F.count(F.lit(1)).alias("n")
    ).localCheckpoint(eager=True)  # |langs|^2 rows: summary-grain pin
    # so the two marginal aggregates below don't each re-run the model
    by_true = conf.groupBy(
        F.col("labeled_lang").alias("lang")
    ).agg(
        F.sum("n").cast("bigint").alias("support"),
        F.sum(
            F.when(
                F.col("labeled_lang") == F.col("predicted_lang"),
                F.col("n"),
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("tp"),
    )
    by_pred = conf.groupBy(
        F.col("predicted_lang").alias("lang")
    ).agg(F.sum("n").alias("pcnt"))
    cls = by_true.join(F.broadcast(by_pred), "lang", "left").select(
        "lang",
        "support",
        "tp",
        (F.coalesce(F.col("pcnt"), F.lit(0)) - F.col("tp"))
        .cast("bigint")
        .alias("fp"),
        (F.col("support") - F.col("tp")).cast("bigint").alias("fn"),
        F.when(
            F.coalesce(F.col("pcnt"), F.lit(0)) > 0,
            F.col("tp") / F.col("pcnt").cast("double"),
        )
        .otherwise(0.0)
        .alias("prec"),
        (F.col("tp") / F.col("support").cast("double")).alias("rec"),
    )
    f1 = F.when(
        F.col("prec") + F.col("rec") > 0,
        2 * F.col("prec") * F.col("rec") / (F.col("prec") + F.col("rec")),
    ).otherwise(0.0)
    scored = cls.select(
        "lang",
        "support",
        "tp",
        "fp",
        "fn",
        F.round(F.col("prec"), 6).alias("precision"),
        F.round(F.col("rec"), 6).alias("recall"),
        F.round(f1, 6).alias("f1"),
    )
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return scored.select(
        "lang",
        "support",
        "tp",
        "fp",
        "fn",
        "precision",
        "recall",
        "f1",
        F.round(F.avg("f1").over(wall), 6).alias("macro_f1"),
        F.round(
            F.sum("tp").over(wall)
            / F.sum("support").over(wall).cast("double"),
            6,
        ).alias("accuracy"),
    ).orderBy("lang")


def _ndcg_oracle() -> str:
    return f"""
    WITH {bm25_scored_ctes()},
    preds AS (
      SELECT doc_id, score,
             row_number() OVER (ORDER BY score DESC, doc_id) AS pos
      FROM scored WHERE score > 0
      ORDER BY score DESC, doc_id LIMIT 10
    ),
    graded AS (
      SELECT p.pos, p.doc_id, p.score,
             CASE WHEN d.lang = 'en' AND d.source = 'src0' THEN 2
                  WHEN d.lang = 'en' THEN 1 ELSE 0 END AS rel
      FROM preds p JOIN documents d USING (doc_id)
    ),
    dcg AS (
      SELECT pos, doc_id, rel,
             (pow(2, rel) - 1) / log2(pos + 1) AS gain,
             row_number() OVER (ORDER BY rel DESC, pos) AS ideal_pos
      FROM graded
    ),
    folded AS (
      SELECT pos, doc_id, CAST(rel AS INTEGER) AS rel,
             sum(gain) OVER (ORDER BY pos ROWS UNBOUNDED PRECEDING)
               AS dcg_cum,
             sum(gain) OVER () AS dcg_total,
             sum((pow(2, rel) - 1) / log2(ideal_pos + 1)) OVER ()
               AS idcg_total
      FROM dcg
    )
    SELECT pos, doc_id, rel, round(dcg_cum, 6) AS dcg_cum,
           round(CASE WHEN idcg_total > 0 THEN dcg_total / idcg_total
                      ELSE 0.0 END, 6) AS ndcg_10
    FROM folded ORDER BY pos
    """


@query("q_ndcg", oracle=_ndcg_oracle(), tags=("text", "search", "ml"))
def q_ndcg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NDCG@10 of the BM25 retrieval against a graded relevance intent
    (the query 'wants' English docs, ideally from src0: rel 2/1/0) — the
    RANKING-quality member of the eval family (q_auc scores
    classification, q_calibration_curve scores probabilities, this
    scores result ORDER: a list with the same hits in worse positions
    loses exactly the log-discounted gain). Ideal ranking is the
    retrieved list's own best permutation (NDCG@k local form; ties break
    by original position — deterministic).

    Composition: the shared bm25_scored core (q_bm25 / q_rrf's lexical
    leg) produces the list; grading joins the 10-row list against the
    doc dims (broadcast); the DCG/IDCG folds are windows over 10 rows.
    Eval cost beyond the scorer is O(k)."""
    from pyspark.sql import Window

    t = load(spark, sf_dir)
    preds = (
        bm25_scored(t.documents)
        .orderBy(F.col("score").desc(), "doc_id")
        .limit(10)
        .withColumn(
            "pos",
            F.row_number().over(
                Window.orderBy(F.col("score").desc(), "doc_id")
            ),
        )
    )
    graded = preds.join(
        t.documents.select("doc_id", "lang", "source"), "doc_id"
    ).select(
        "pos",
        "doc_id",
        F.when((F.col("lang") == "en") & (F.col("source") == "src0"), 2)
        .when(F.col("lang") == "en", 1)
        .otherwise(0)
        .alias("rel"),
    )
    gain = (F.pow(F.lit(2.0), F.col("rel")) - 1) / F.log2(F.col("pos") + 1)
    dcg = graded.select(
        "pos",
        "doc_id",
        "rel",
        gain.alias("gain"),
        F.row_number()
        .over(Window.orderBy(F.col("rel").desc(), "pos"))
        .alias("ideal_pos"),
    )
    w_run = Window.orderBy("pos").rowsBetween(
        Window.unboundedPreceding, 0
    )
    w_all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ideal_gain = (F.pow(F.lit(2.0), F.col("rel")) - 1) / F.log2(
        F.col("ideal_pos") + 1
    )
    folded = dcg.select(
        "pos",
        "doc_id",
        F.col("rel").cast("int").alias("rel"),
        F.sum("gain").over(w_run).alias("dcg_cum"),
        F.sum("gain").over(w_all).alias("dcg_total"),
        F.sum(ideal_gain).over(w_all).alias("idcg_total"),
    )
    return folded.select(
        "pos",
        "doc_id",
        "rel",
        F.round(F.col("dcg_cum"), 6).alias("dcg_cum"),
        F.round(
            F.when(
                F.col("idcg_total") > 0,
                F.col("dcg_total") / F.col("idcg_total"),
            ).otherwise(0.0),
            6,
        ).alias("ndcg_10"),
    ).orderBy("pos")
