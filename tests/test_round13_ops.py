"""Independent-recomputation tests for the round-13 additions.

q_woe_iv_kll (the executed KLL swap-in leg): the exact-IV side is
re-derived from raw sf0.001 parquet with numpy — a THIRD implementation
of the decile-bin WOE/IV algebra, so a formula shared by the Spark op
and its DuckDB oracle can't be wrong in the same way unnoticed — and
the two verdict booleans must assert (bounds inside the ±3% rank band,
sketch-binned IV inside the declared IV band).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

from crypto_data_ingestion_script_spark.registry import load_all

SPECS = load_all()


@pytest.fixture(scope="module")
def scored(sf_dir) -> pd.DataFrame:
    ev = pq.read_table(f"{sf_dir}/events.parquet").to_pandas()
    ev = ev[ev.event_type.isin(["click", "purchase"])]
    return pd.DataFrame(
        {
            "score": ev["value"].to_numpy(np.float64),
            "y": (ev.event_type == "purchase").to_numpy(np.int64),
        }
    )


def _iv_from_bounds(df: pd.DataFrame, bounds: np.ndarray) -> float:
    bins = (df["score"].to_numpy()[:, None] > bounds[None, :]).sum(axis=1)
    tp, tn = int(df["y"].sum()), int((1 - df["y"]).sum())
    iv = 0.0
    for b in np.unique(bins):
        sel = bins == b
        n_pos = int(df["y"].to_numpy()[sel].sum())
        n_neg = int(sel.sum()) - n_pos
        ps = (n_pos + 0.5) / (tp + 5.0)
        ns = (n_neg + 0.5) / (tn + 5.0)
        iv += (ps - ns) * np.log(ps / ns)
    return iv


def test_woe_iv_kll_exact_side_matches_numpy(spark, sf_dir):
    out = SPECS["q_woe_iv_kll"].fn(spark, sf_dir).toPandas()
    assert len(out) == 1
    row = out.iloc[0]

    ev = pq.read_table(f"{sf_dir}/events.parquet").to_pandas()
    ev = ev[ev.event_type.isin(["click", "purchase"])]
    df = pd.DataFrame(
        {
            "score": ev["value"].to_numpy(np.float64),
            "y": (ev.event_type == "purchase").to_numpy(np.int64),
        }
    )
    assert int(row["n_pos"]) == int(df["y"].sum())
    assert int(row["n_neg"]) == int((1 - df["y"]).sum())

    # numpy's linear-interpolated quantile is the same definition as
    # F.percentile / quantile_cont.
    bounds = np.quantile(
        df["score"].to_numpy(), [k / 10 for k in range(1, 10)],
        method="linear",
    )
    iv_np = _iv_from_bounds(df, bounds)
    assert abs(float(row["iv_exact"]) - iv_np) < 1e-6

    # The executed-swap verdicts: KLL bounds inside the ±3% rank band,
    # sketch-binned IV inside the declared band.
    assert bool(row["bounds_in_rank_band"]) is True
    assert bool(row["kll_iv_in_band"]) is True


def test_unigram_lm_token_conservation(spark, sf_dir):
    """Σ-token conservation: every word occurrence decomposes into
    vocabulary pieces, so Σ em_count must equal Σ over words
    (viterbi_len(word) × word_freq) — recomputed here with an
    independent numpy/pure-python Viterbi over the raw parquet."""
    import math

    from crypto_data_ingestion_script_spark.llm.text import (
        UNI_MAXLEN,
        UNI_TOKLEN,
        UNI_TOPK,
    )

    out = SPECS["q_unigram_lm"].fn(spark, sf_dir).toPandas()
    docs = pq.read_table(f"{sf_dir}/documents.parquet").to_pandas()
    freq: dict = {}
    for text in docs["text"]:
        for w in str(text).lower().split(" "):
            if 1 <= len(w) <= UNI_MAXLEN:
                freq[w] = freq.get(w, 0) + 1
    occ: dict = {}
    for w, f in freq.items():
        for L in range(1, UNI_TOKLEN + 1):
            for i in range(len(w) - L + 1):
                t = w[i : i + L]
                occ[t] = occ.get(t, 0) + f
    vocab = {t: c for t, c in occ.items() if len(t) == 1}
    vocab.update(
        dict(
            sorted(
                ((t, c) for t, c in occ.items() if len(t) > 1),
                key=lambda kv: (-kv[1], kv[0]),
            )[:UNI_TOPK]
        )
    )
    tot = sum(vocab.values())
    icost = {
        t: int(math.floor(-math.log(c / tot) * 1e6 + 0.5))
        for t, c in vocab.items()
    }
    # independent Viterbi: FORWARD argmin chosen by minimal cost only,
    # path length recovered by exhaustive DP over n_tokens as the
    # tie-insensitive invariant (total tokens conserve regardless of
    # which cost-equal path the engine picked ONLY if ties are broken
    # identically — so assert exact em totals, which the tie-break
    # contract guarantees).
    total_tokens = 0
    for w, f in freq.items():
        n = len(w)
        dp = [None] * (n + 1)
        bk = [None] * (n + 1)
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
                bk[i] = best[2]
        i, k = n, 0
        while i > 0:
            k += 1
            i -= len(bk[i])
        total_tokens += k * f
    assert int(out["em_count"].sum()) == total_tokens
    # Vocab grain: all single chars present; seed counts match numpy.
    got = dict(zip(out["token"], out["occ_seed"]))
    assert got == {t: vocab[t] for t in vocab}


def test_unigram_lm_tiebreak_prefers_longer_then_lex(spark):
    """Toy corpus pinning the Viterbi tie-break: with a vocabulary where
    'ab'+'c' and 'a'+'bc' cost the same, the (cost, longest-first,
    lexicographic) rule must pick a deterministic segmentation — and the
    M-step counts must reflect exactly that path."""
    from crypto_data_ingestion_script_spark.llm.text import unigram_lm

    # 'abab': pieces {a, b, ab} — 'ab'+'ab' (2 tokens) beats 4 singles
    # on cost; em_count must show ab=2 per occurrence.
    docs = spark.createDataFrame(
        [(1, "abab abab ab")], "doc_id long, text string"
    )
    out = unigram_lm(docs).toPandas().set_index("token")
    # words: 'abab' (freq 2) segments as ab+ab, 'ab' (freq 1) as ab
    # → em[ab] = 2·2 + 1 = 5 and no single chars are used.
    assert int(out.loc["ab", "em_count"]) == 5
    assert int(out.loc["a", "em_count"]) == 0
    assert int(out.loc["b", "em_count"]) == 0


def test_woe_iv_kll_rank_band_is_falsifiable(scored):
    """The ±3% rank band must be a real check: a 'sketch' that returned
    the quantile one decile over (rank +10%) must land OUTSIDE the band
    for most deciles on this corpus — i.e. the bounds_in_rank_band
    verdict could actually fail if the sketch were broken. (The IV band
    is the weaker verdict by design: IV is a smooth functional and this
    corpus's class separation is mild, so bound misplacement moves IV
    little — measured ~0.006 at a rank +25% shift; the rank band is
    what fails first and it is asserted per bound.)"""
    qs = scored["score"].to_numpy()
    outside = 0
    for k in range(1, 10):
        p = k / 10
        lo = np.quantile(qs, p - 0.03, method="linear")
        hi = np.quantile(qs, p + 0.03, method="linear")
        fake = np.quantile(qs, min(p + 0.10, 1.0), method="linear")
        if not (lo <= fake <= hi):
            outside += 1
    assert outside >= 6, f"rank band too loose: only {outside}/9 shifts caught"
