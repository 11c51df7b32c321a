"""ML-evaluation operators, round 11 (SURVEY §2.M): average precision
(PR-AUC), Brier-score Murphy decomposition, Cohen's kappa, mean
reciprocal rank of BM25 retrieval, and the cumulative-gains/lift curve
— completing the eval family started by q_auc / q_calibration_curve /
q_ndcg / q_lang_confusion.

Shared scale doctrine: classification metrics run at DISTINCT-SCORE or
BIN grain (the q_auc / q_mann_whitney plan — the fact table shuffles
once into a content-bounded summary and never range-exchanges), and
retrieval ranks are found by COUNTING, not sorting: the rank of a known
item is 1 + |docs ordered before it|, one conditional aggregate against
a broadcast best-key row, so no global sort of the corpus ever happens.

The reference computes none of these (its analytics stop at OHLC bars,
dataCollector.py:140-163); they are north-star additions: a training
pipeline gates classifier-driven filters on PR-AUC/calibration, audits
label pipelines with kappa, and tracks retrieval quality with MRR.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load
from ..ranking import global_running
from ..registry import query

#: Known-item probe queries for q_mrr (high-df tokens of the synthetic
#: corpus vocabulary — every one present at all test scale factors).
MRR_TERMS = ("filter", "join", "merge", "scan", "stream", "window")

#: BM25 constants — same Robertson/Sparck Jones defaults as llm/text.py.
_K1, _B = 1.2, 0.75


@query(
    "q_avg_precision",
    oracle="""
    WITH s AS (
      SELECT value AS score, event_type = 'purchase' AS is_pos
      FROM events WHERE event_type IN ('click', 'purchase')
    ),
    vg AS (
      SELECT score, count(*) AS cnt,
             CAST(sum(CASE WHEN is_pos THEN 1 ELSE 0 END) AS BIGINT)
               AS cnt_pos
      FROM s GROUP BY score
    ),
    cum AS (
      SELECT cnt_pos,
             sum(cnt_pos) OVER (ORDER BY score DESC
                                ROWS UNBOUNDED PRECEDING) AS cum_pos,
             sum(cnt) OVER (ORDER BY score DESC
                            ROWS UNBOUNDED PRECEDING) AS cum_tot
      FROM vg
    ),
    agg AS (
      SELECT CAST(sum(cnt_pos) AS BIGINT) AS n_pos,
             CAST(count(*) AS BIGINT) AS n_thresholds,
             sum(cnt_pos * cum_pos / CAST(cum_tot AS DOUBLE)) AS ap_num,
             max(cum_tot) AS n
      FROM cum
    )
    SELECT n_pos, CAST(n - n_pos AS BIGINT) AS n_neg, n_thresholds,
           round(ap_num / n_pos, 8) AS average_precision,
           round(n_pos / CAST(n AS DOUBLE), 8) AS prevalence
    FROM agg
    """,
    tags=("stats", "ml", "agg"),
)
def q_avg_precision(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average precision (area under the precision-recall curve, the
    step-interpolated threshold form AP = Σₙ (Rₙ−Rₙ₋₁)·Pₙ) of the event
    value predicting purchase-vs-click. The PR curve is the eval of
    record under class imbalance, where ROC-AUC (q_auc) flatters:
    AP's baseline is the prevalence, not 0.5, so a rare-positive
    filter model can't look good by ranking easy negatives.

    Scale shape: identical to q_auc — one fact-scale groupBy(score) to
    distinct-value grain, then descending cumulative sums at that
    content-bounded grain give precision/recall at EVERY threshold
    (the bare window is the q_auc distinct-value precedent), and
    AP reduces to Σ cnt_pos·(cum_pos/cum_tot)/n_pos in one fold.
    Exact, full-corpus, no sampling."""
    t = load(spark, sf_dir)
    s = t.events.filter(
        F.col("event_type").isin("click", "purchase")
    ).select(
        F.col("value").alias("score"),
        (F.col("event_type") == "purchase").alias("is_pos"),
    )
    vg = s.groupBy("score").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(F.when(F.col("is_pos"), 1).otherwise(0))
        .cast("bigint")
        .alias("cnt_pos"),
    )
    # Both descending cumulative sums from ONE two-pass range plan
    # (ranking.global_running, descending ranges) — the former bare
    # Window.orderBy(desc) ran the whole distinct-score table through a
    # single task (VERDICT r12 task 1).
    cum = global_running(
        vg, "score", sums=("cnt_pos", "cnt"), descending=True
    ).select(
        "cnt_pos",
        F.col("run_cnt_pos").alias("cum_pos"),
        F.col("run_cnt").alias("cum_tot"),
    )
    agg = cum.agg(
        F.sum("cnt_pos").cast("bigint").alias("n_pos"),
        F.count(F.lit(1)).cast("bigint").alias("n_thresholds"),
        F.sum(
            F.col("cnt_pos")
            * F.col("cum_pos")
            / F.col("cum_tot").cast("double")
        ).alias("ap_num"),
        F.max("cum_tot").alias("n"),
    )
    return agg.select(
        "n_pos",
        (F.col("n") - F.col("n_pos")).cast("bigint").alias("n_neg"),
        "n_thresholds",
        F.round(F.col("ap_num") / F.col("n_pos"), 8).alias(
            "average_precision"
        ),
        F.round(
            F.col("n_pos") / F.col("n").cast("double"), 8
        ).alias("prevalence"),
    )


@query(
    "q_brier_decomp",
    oracle="""
    WITH s AS (
      SELECT 1.0 / (1.0 + exp(-(value - 5.0))) AS p,
             CAST(event_type = 'purchase' AS INTEGER) AS y
      FROM events WHERE event_type IN ('click', 'purchase')
    ),
    bc AS (
      SELECT least(CAST(floor(p * 10) AS INTEGER), 9) AS bin,
             count(*) AS n, avg(p) AS mean_p, avg(y) AS mean_y,
             sum((p - y) * (p - y)) AS se
      FROM s GROUP BY 1
    ),
    tot AS (
      SELECT sum(n) AS n, sum(n * mean_y) / sum(n) AS obar,
             sum(se) / sum(n) AS brier
      FROM bc
    ),
    parts AS (
      SELECT sum(bc.n * (bc.mean_p - bc.mean_y)
                 * (bc.mean_p - bc.mean_y)) / tot.n AS reliability,
             sum(bc.n * (bc.mean_y - tot.obar)
                 * (bc.mean_y - tot.obar)) / tot.n AS resolution
      FROM bc CROSS JOIN tot GROUP BY tot.n
    )
    SELECT CAST(tot.n AS BIGINT) AS n,
           round(tot.obar, 8) AS base_rate,
           round(tot.brier, 8) AS brier,
           round(tot.obar * (1 - tot.obar), 8) AS uncertainty,
           round(parts.reliability, 8) AS reliability,
           round(parts.resolution, 8) AS resolution,
           round(tot.brier - (parts.reliability - parts.resolution
                 + tot.obar * (1 - tot.obar)), 8) AS residual
    FROM tot CROSS JOIN parts
    """,
    tags=("stats", "ml", "agg"),
)
def q_brier_decomp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Murphy decomposition of the Brier score — brier = reliability −
    resolution + uncertainty (+ a within-bin residual, since forecasts
    are binned to deciles rather than constant per bin) for the logistic
    score predicting purchase-vs-click. q_calibration_curve reports the
    raw Brier and ECE; the decomposition says WHY a score is bad:
    reliability (miscalibration — fixable by recalibrating) vs
    resolution (discrimination — not fixable without a better model) vs
    uncertainty (the irreducible base-rate term).

    Scale shape: one fact-scale groupBy(bin) carries n / mean_p /
    mean_y / Σ(p−y)² per decile bin; every decomposition term is
    algebra over the 10-row bin table (one broadcast crossJoin for the
    grand base rate). Single shuffle at bin grain regardless of N."""
    t = load(spark, sf_dir)
    s = t.events.filter(
        F.col("event_type").isin("click", "purchase")
    ).select(
        (1.0 / (1.0 + F.exp(-(F.col("value") - 5.0)))).alias("p"),
        (F.col("event_type") == "purchase").cast("int").alias("y"),
    )
    bc = s.groupBy(
        F.least(F.floor(F.col("p") * 10).cast("int"), F.lit(9)).alias("bin")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("p").alias("mean_p"),
        F.avg("y").alias("mean_y"),
        F.sum((F.col("p") - F.col("y")) * (F.col("p") - F.col("y"))).alias(
            "se"
        ),
    )
    tot = bc.agg(
        F.sum("n").alias("n_tot"),
        (F.sum(F.col("n") * F.col("mean_y")) / F.sum("n")).alias("obar"),
        (F.sum("se") / F.sum("n")).alias("brier"),
    )
    parts = (
        bc.crossJoin(F.broadcast(tot))
        .groupBy("n_tot", "obar", "brier")
        .agg(
            F.sum(
                F.col("n")
                * (F.col("mean_p") - F.col("mean_y"))
                * (F.col("mean_p") - F.col("mean_y"))
            ).alias("rel_num"),
            F.sum(
                F.col("n")
                * (F.col("mean_y") - F.col("obar"))
                * (F.col("mean_y") - F.col("obar"))
            ).alias("res_num"),
        )
        .select(
            "n_tot",
            "obar",
            "brier",
            (F.col("rel_num") / F.col("n_tot")).alias("reliability"),
            (F.col("res_num") / F.col("n_tot")).alias("resolution"),
        )
    )
    unc = F.col("obar") * (1 - F.col("obar"))
    return parts.select(
        F.col("n_tot").cast("bigint").alias("n"),
        F.round(F.col("obar"), 8).alias("base_rate"),
        F.round(F.col("brier"), 8).alias("brier"),
        F.round(unc, 8).alias("uncertainty"),
        F.round(F.col("reliability"), 8).alias("reliability"),
        F.round(F.col("resolution"), 8).alias("resolution"),
        F.round(
            F.col("brier")
            - (F.col("reliability") - F.col("resolution") + unc),
            8,
        ).alias("residual"),
    )


@query(
    "q_cohens_kappa",
    oracle="""
    WITH rated AS (
      SELECT CASE WHEN n_chars >= 400 THEN 'long'
                  WHEN n_chars >= 200 THEN 'mid' ELSE 'short' END AS a,
             CASE WHEN len(string_split(text, ' ')) >= 70 THEN 'long'
                  WHEN len(string_split(text, ' ')) >= 40 THEN 'mid'
                  ELSE 'short' END AS b
      FROM documents
    ),
    ct AS (SELECT a, b, count(*) AS c FROM rated GROUP BY a, b),
    rm AS (SELECT a, sum(c) AS ra FROM ct GROUP BY a),
    cm AS (SELECT b, sum(c) AS cb FROM ct GROUP BY b),
    n AS (SELECT sum(c) AS n FROM ct),
    agree AS (
      SELECT sum(CASE WHEN a = b THEN c ELSE 0 END)
               / CAST(n.n AS DOUBLE) AS po
      FROM ct CROSS JOIN n GROUP BY n.n
    ),
    expected AS (
      SELECT sum(rm.ra * cm.cb) / (CAST(n.n AS DOUBLE) * n.n) AS pe
      FROM rm JOIN cm ON rm.a = cm.b CROSS JOIN n GROUP BY n.n
    )
    SELECT CAST(n.n AS BIGINT) AS n,
           round(agree.po, 8) AS observed_agreement,
           round(expected.pe, 8) AS expected_agreement,
           round((agree.po - expected.pe) / (1 - expected.pe), 8) AS kappa
    FROM n CROSS JOIN agree CROSS JOIN expected
    """,
    tags=("stats", "ml", "agg"),
)
def q_cohens_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa — chance-corrected agreement between two raters,
    here two independent document-length labelers (rater A buckets on
    characters, rater B on whitespace tokens, both into
    short/mid/long). Raw agreement overstates consensus when the
    marginal label mixes are skewed; kappa subtracts the agreement two
    INDEPENDENT raters with these marginals would reach by luck —
    the standard audit before trusting redundant annotation pipelines
    (LLM-judge double-labels, heuristic-vs-model quality gates).

    Scale shape: one combinable groupBy to the k×k contingency table
    (≤9 cells at any N), marginals / diagonal / χ-style expected
    agreement all at table grain. The expected term joins the row and
    column marginals on label equality — a ≤3-row join."""
    t = load(spark, sf_dir)
    ntok = F.size(F.split(F.col("text"), " "))
    rated = t.documents.select(
        F.when(F.col("n_chars") >= 400, "long")
        .when(F.col("n_chars") >= 200, "mid")
        .otherwise("short")
        .alias("a"),
        F.when(ntok >= 70, "long")
        .when(ntok >= 40, "mid")
        .otherwise("short")
        .alias("b"),
    )
    ct = (
        rated.groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=True)
    )
    # ct is the ≤9-cell contingency table feeding four branches — the
    # summary-grain-only checkpoint rule.
    rm = ct.groupBy("a").agg(F.sum("c").alias("ra"))
    cm = ct.groupBy("b").agg(F.sum("c").alias("cb"))
    n = ct.agg(F.sum("c").alias("n"))
    agree = (
        ct.crossJoin(F.broadcast(n))
        .groupBy("n")
        .agg(
            (
                F.sum(F.when(F.col("a") == F.col("b"), F.col("c")).otherwise(0))
                / F.first("n").cast("double")
            ).alias("po")
        )
        .select("po")
    )
    expected = (
        rm.join(cm, rm.a == cm.b)
        .crossJoin(F.broadcast(n))
        .groupBy("n")
        .agg(
            (
                F.sum(F.col("ra") * F.col("cb"))
                / (F.first("n").cast("double") * F.first("n"))
            ).alias("pe")
        )
        .select("pe")
    )
    return (
        n.crossJoin(F.broadcast(agree))
        .crossJoin(F.broadcast(expected))
        .select(
            F.col("n").cast("bigint").alias("n"),
            F.round(F.col("po"), 8).alias("observed_agreement"),
            F.round(F.col("pe"), 8).alias("expected_agreement"),
            F.round(
                (F.col("po") - F.col("pe")) / (1 - F.col("pe")), 8
            ).alias("kappa"),
        )
    )


def _mrr_oracle() -> str:
    """DuckDB twin of q_mrr — generated over MRR_TERMS so the term list
    stays single-sourced."""
    k1, b = _K1, _B
    tf_cols = ", ".join(
        f"len(list_filter(string_split(text, ' '), x -> x = '{t}'))"
        f" AS tf_{t}"
        for t in MRR_TERMS
    )
    df_cols = ", ".join(
        f"sum(CASE WHEN tf_{t} > 0 THEN 1 ELSE 0 END) AS df_{t}"
        for t in MRR_TERMS
    )
    s_cols = ", ".join(
        f"""round(ln(1 + (n_docs - df_{t} + 0.5) / (df_{t} + 0.5))
             * (tf_{t} * ({k1} + 1.0))
             / (tf_{t} + {k1} * (1 - {b} + {b} * doclen / avglen)),
             6) AS s_{t}"""
        for t in MRR_TERMS
    )
    bs_cols = ", ".join(f"max(s_{t}) AS bs_{t}" for t in MRR_TERMS)
    bid_cols = ", ".join(
        f"min(CASE WHEN s_{t} = bs_{t} THEN doc_id END) AS bid_{t}"
        for t in MRR_TERMS
    )
    c_cols = ", ".join(
        f"""sum(CASE WHEN s_{t} > bs_{t}
                     OR (s_{t} = bs_{t} AND doc_id < bid_{t})
                THEN 1 ELSE 0 END) AS c_{t}"""
        for t in MRR_TERMS
    )
    rows = ", ".join(
        f"('{t}', bid_{t}, c_{t} + 1)" for t in MRR_TERMS
    )
    return f"""
    WITH base AS (
      SELECT doc_id, len(string_split(text, ' ')) AS doclen,
             (lang = 'en' AND source = 'src0') AS is_rel, {tf_cols}
      FROM documents
    ),
    stats AS (
      SELECT count(*) AS n_docs, avg(doclen) AS avglen, {df_cols}
      FROM base
    ),
    scored AS (
      SELECT doc_id, is_rel, {s_cols} FROM base CROSS JOIN stats
    ),
    bests AS (SELECT {bs_cols} FROM scored WHERE is_rel),
    bestid AS (
      SELECT {bid_cols} FROM scored CROSS JOIN bests WHERE is_rel
    ),
    cnt AS (
      SELECT {c_cols} FROM scored CROSS JOIN bests CROSS JOIN bestid
    ),
    ranks AS (
      SELECT u.query, u.rel_doc_id, CAST(u.rnk AS BIGINT) AS rank,
             round(1.0 / u.rnk, 8) AS rr
      FROM cnt CROSS JOIN bests CROSS JOIN bestid,
           LATERAL (VALUES {rows}) AS u(query, rel_doc_id, rnk)
    )
    SELECT query, rel_doc_id, rank, rr,
           round(avg(rr) OVER (), 8) AS mrr
    FROM ranks ORDER BY query
    """


@query("q_mrr", oracle=_mrr_oracle(), tags=("text", "search", "ml"))
def q_mrr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean reciprocal rank of BM25 known-intent retrieval: for each of
    the six single-term probe queries in ``MRR_TERMS``, find the rank of
    the first relevant document (the q_ndcg intent — lang='en' from
    src0) in the BM25 ordering (score desc, doc_id tie-break), and
    average the reciprocal ranks. MRR is THE metric for
    first-answer-counts retrieval (RAG context pick, known-item
    search); q_ndcg grades the whole list, MRR grades the top hit.

    Scale shape — ranks by COUNTING, not sorting: the corpus is never
    globally sorted. Pass 1 computes all six per-term tfs map-side in
    one projection + one stats aggregate (broadcast back); pass 2 finds
    each query's best relevant (score, doc_id) key via max/min
    aggregates over the relevant slice; pass 3 counts, per query, how
    many docs order strictly before that key — rank = count + 1. Three
    map-side aggregate passes, zero shuffles beyond the final 1-row
    reduces, O(|terms|) columns wide. Scores are rounded to 6dp before
    comparison (the q_bm25 cross-engine boundary rule)."""
    t = load(spark, sf_dir)
    toks = F.split(F.col("text"), " ")

    def tf(term: str):
        # Unary lambda (2-arg F.filter lambdas receive (element, index)).
        return F.size(F.filter(toks, lambda x: x == F.lit(term)))

    base = t.documents.select(
        "doc_id",
        F.size(toks).alias("doclen"),
        ((F.col("lang") == "en") & (F.col("source") == "src0")).alias(
            "is_rel"
        ),
        *[tf(term).alias(f"tf_{term}") for term in MRR_TERMS],
    )
    stats = base.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg("doclen").alias("avglen"),
        *[
            F.sum((F.col(f"tf_{term}") > 0).cast("long")).alias(
                f"df_{term}"
            )
            for term in MRR_TERMS
        ],
    )

    def score(term: str):
        idf = F.log(
            F.lit(1.0)
            + (F.col("n_docs") - F.col(f"df_{term}") + F.lit(0.5))
            / (F.col(f"df_{term}") + F.lit(0.5))
        )
        return F.round(
            idf
            * (F.col(f"tf_{term}") * F.lit(_K1 + 1.0))
            / (
                F.col(f"tf_{term}")
                + F.lit(_K1)
                * (F.lit(1 - _B) + F.lit(_B) * F.col("doclen") / F.col("avglen"))
            ),
            6,
        )

    scored = base.crossJoin(F.broadcast(stats)).select(
        "doc_id",
        "is_rel",
        *[score(term).alias(f"s_{term}") for term in MRR_TERMS],
    )
    rel = scored.filter("is_rel")
    # r13 optimization round: best score and best-doc-at-that-score in ONE
    # aggregate pass over the relevant slice instead of two chained passes
    # (max score, then broadcast it back to find the min doc_id among the
    # maxima). max(struct(s, -doc_id)) orders by score first, then by
    # NEGATED doc_id, so the struct max is exactly (max s, -(min doc_id
    # among max-s rows)) — one fewer corpus-scale pass and one fewer
    # broadcast round-trip, values unchanged. ASSUMES doc_id is a signed
    # numeric id whose negation is representable (any value except
    # Long.MIN_VALUE; the catalog's doc_id is a small int) — switching
    # doc_id to an unsigned or string id type would silently break the
    # negation trick and must revert to the two-pass min-among-maxima form
    # (ADVICE r13).
    best = rel.agg(
        *[
            F.max(
                F.struct(
                    F.col(f"s_{term}").alias("s"),
                    (-F.col("doc_id")).alias("nid"),
                )
            ).alias(f"bk_{term}")
            for term in MRR_TERMS
        ]
    ).select(
        *[F.col(f"bk_{term}.s").alias(f"bs_{term}") for term in MRR_TERMS],
        *[(-F.col(f"bk_{term}.nid")).alias(f"bid_{term}") for term in MRR_TERMS],
    )
    cnt = (
        scored.crossJoin(F.broadcast(best))
        .agg(
            *[
                F.sum(
                    F.when(
                        (F.col(f"s_{term}") > F.col(f"bs_{term}"))
                        | (
                            (F.col(f"s_{term}") == F.col(f"bs_{term}"))
                            & (F.col("doc_id") < F.col(f"bid_{term}"))
                        ),
                        1,
                    ).otherwise(0)
                ).alias(f"c_{term}")
                for term in MRR_TERMS
            ]
        )
    )
    stacked = ", ".join(
        f"'{term}', bid_{term}, c_{term} + 1" for term in MRR_TERMS
    )
    ranks = (
        # Same broadcast subtree as cnt's — ReuseExchange ships it once.
        cnt.crossJoin(F.broadcast(best))
        .selectExpr(
            f"stack({len(MRR_TERMS)}, {stacked})"
            " AS (query, rel_doc_id, rank)"
        )
        .select(
            "query",
            "rel_doc_id",
            F.col("rank").cast("bigint").alias("rank"),
            F.round(1.0 / F.col("rank"), 8).alias("rr"),
        )
    )
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return ranks.select(
        "query",
        "rel_doc_id",
        "rank",
        "rr",
        F.round(F.avg("rr").over(wall), 8).alias("mrr"),
    ).orderBy("query")


@query(
    "q_lift_curve",
    oracle="""
    WITH s AS (
      SELECT value AS score,
             CAST(event_type = 'purchase' AS INTEGER) AS y
      FROM events WHERE event_type IN ('click', 'purchase')
    ),
    bounds AS (
      SELECT round(quantile_cont(score, 0.1), 8) AS b1,
             round(quantile_cont(score, 0.2), 8) AS b2,
             round(quantile_cont(score, 0.3), 8) AS b3,
             round(quantile_cont(score, 0.4), 8) AS b4,
             round(quantile_cont(score, 0.5), 8) AS b5,
             round(quantile_cont(score, 0.6), 8) AS b6,
             round(quantile_cont(score, 0.7), 8) AS b7,
             round(quantile_cont(score, 0.8), 8) AS b8,
             round(quantile_cont(score, 0.9), 8) AS b9
      FROM s
    ),
    binned AS (
      SELECT 10 - (CASE WHEN score > b1 THEN 1 ELSE 0 END
                 + CASE WHEN score > b2 THEN 1 ELSE 0 END
                 + CASE WHEN score > b3 THEN 1 ELSE 0 END
                 + CASE WHEN score > b4 THEN 1 ELSE 0 END
                 + CASE WHEN score > b5 THEN 1 ELSE 0 END
                 + CASE WHEN score > b6 THEN 1 ELSE 0 END
                 + CASE WHEN score > b7 THEN 1 ELSE 0 END
                 + CASE WHEN score > b8 THEN 1 ELSE 0 END
                 + CASE WHEN score > b9 THEN 1 ELSE 0 END) AS decile,
             y
      FROM s CROSS JOIN bounds
    ),
    dc AS (
      SELECT decile, count(*) AS n,
             CAST(sum(y) AS BIGINT) AS n_pos
      FROM binned GROUP BY decile
    ),
    folded AS (
      SELECT decile, CAST(n AS BIGINT) AS n, n_pos,
             n_pos / CAST(n AS DOUBLE) AS pos_rate,
             sum(n_pos) OVER () / CAST(sum(n) OVER () AS DOUBLE)
               AS overall_rate,
             sum(n_pos) OVER (ORDER BY decile ROWS UNBOUNDED PRECEDING)
               / CAST(sum(n_pos) OVER () AS DOUBLE) AS cum_gain,
             (sum(n_pos) OVER (ORDER BY decile ROWS UNBOUNDED PRECEDING)
              / CAST(sum(n) OVER (ORDER BY decile
                                  ROWS UNBOUNDED PRECEDING) AS DOUBLE))
               AS cum_rate
      FROM dc
    )
    SELECT decile, n, n_pos,
           round(pos_rate, 8) AS pos_rate,
           round(pos_rate / overall_rate, 8) AS lift,
           round(cum_gain, 8) AS cum_gain,
           round(cum_rate / overall_rate, 8) AS cum_lift
    FROM folded ORDER BY decile
    """,
    tags=("stats", "ml", "agg"),
)
def q_lift_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative-gains / lift table by score decile (decile 1 = top
    scores): per decile the positive rate, lift over the base rate, the
    cumulative share of all positives captured (the gains curve), and
    cumulative lift — the campaign-targeting / data-triage readout
    ("labeling the top 20% of docs by this score nets X% of the
    positives"). AUC summarizes ranking to one number; the lift table
    says what acting on a top-fraction actually buys.

    Scale shape: the q_woe_iv plan — exact decile bounds via one
    quantile aggregate broadcast back (at 100 TB the KLL sketch swaps
    in, same shape — swap executed and verdict-checked as
    q_woe_iv_kll, r13), one fact-scale groupBy(decile), and all
    curve algebra as windows over the 10-row decile table."""
    t = load(spark, sf_dir)
    s = t.events.filter(
        F.col("event_type").isin("click", "purchase")
    ).select(
        F.col("value").alias("score"),
        (F.col("event_type") == "purchase").cast("int").alias("y"),
    )
    # The nine bounds are rounded 8dp on BOTH engines before the >
    # comparisons (ADVICE r11; the q_gmm_em shared-input pre-rounding
    # rule): a last-ulp difference between F.percentile and DuckDB's
    # quantile_cont interpolation must not reclassify a score sitting
    # exactly on a decile edge.
    qs = [i / 10.0 for i in range(1, 10)]
    bounds = s.agg(
        *[
            F.round(F.percentile("score", F.lit(q)), 8).alias(f"b{i}")
            for i, q in enumerate(qs, start=1)
        ]
    )
    rank_expr = sum(
        F.when(F.col("score") > F.col(f"b{i}"), 1).otherwise(0)
        for i in range(1, 10)
    )
    dc = (
        s.crossJoin(F.broadcast(bounds))
        .groupBy((10 - rank_expr).alias("decile"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("y").cast("bigint").alias("n_pos"),
        )
    )
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    run = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, 0
    )
    folded = dc.select(
        "decile",
        F.col("n").cast("bigint").alias("n"),
        "n_pos",
        (F.col("n_pos") / F.col("n").cast("double")).alias("pos_rate"),
        (
            F.sum("n_pos").over(wall)
            / F.sum("n").over(wall).cast("double")
        ).alias("overall_rate"),
        (
            F.sum("n_pos").over(run)
            / F.sum("n_pos").over(wall).cast("double")
        ).alias("cum_gain"),
        (
            F.sum("n_pos").over(run)
            / F.sum("n").over(run).cast("double")
        ).alias("cum_rate"),
    )
    return folded.select(
        "decile",
        "n",
        "n_pos",
        F.round("pos_rate", 8).alias("pos_rate"),
        F.round(F.col("pos_rate") / F.col("overall_rate"), 8).alias("lift"),
        F.round("cum_gain", 8).alias("cum_gain"),
        F.round(F.col("cum_rate") / F.col("overall_rate"), 8).alias(
            "cum_lift"
        ),
    ).orderBy("decile")
