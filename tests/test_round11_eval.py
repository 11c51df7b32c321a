"""Independent-recomputation tests for the round-11 evaluation batch
(q_avg_precision, q_brier_decomp, q_cohens_kappa, q_mrr, q_lift_curve):
each operator's output is re-derived from raw sf0.001 parquet with
numpy/pandas — a third implementation, so a formula shared by the Spark
op and its DuckDB oracle can't be wrong in the same way unnoticed.
q_mrr in particular is recomputed by literally SORTING the corpus per
query (the engine finds ranks by counting — different algorithm, same
answer required).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

from crypto_data_ingestion_script_spark.operators.evaluation import (
    MRR_TERMS,
    _B,
    _K1,
)
from crypto_data_ingestion_script_spark.registry import load_all

SPECS = load_all()


@pytest.fixture(scope="module")
def scored_events(sf_dir) -> pd.DataFrame:
    ev = pq.read_table(f"{sf_dir}/events.parquet").to_pandas()
    ev = ev[ev.event_type.isin(["click", "purchase"])]
    return pd.DataFrame(
        {
            "score": ev["value"].to_numpy(np.float64),
            "y": (ev.event_type == "purchase").to_numpy(np.int64),
        }
    )


@pytest.fixture(scope="module")
def documents(sf_dir) -> pd.DataFrame:
    return pq.read_table(f"{sf_dir}/documents.parquet").to_pandas()


def test_avg_precision_matches_numpy(spark, sf_dir, scored_events):
    row = SPECS["q_avg_precision"].fn(spark, sf_dir).collect()[0]
    s, y = scored_events["score"], scored_events["y"]
    df = (
        pd.DataFrame({"s": s, "y": y})
        .groupby("s")
        .agg(cnt=("y", "size"), pos=("y", "sum"))
        .sort_index(ascending=False)
    )
    cum_pos = df["pos"].cumsum()
    cum_tot = df["cnt"].cumsum()
    n_pos = int(df["pos"].sum())
    ap = float((df["pos"] * cum_pos / cum_tot).sum() / n_pos)
    assert row["n_pos"] == n_pos
    assert row["n_neg"] == int(df["cnt"].sum()) - n_pos
    assert row["n_thresholds"] == len(df)
    assert row["average_precision"] == pytest.approx(ap, abs=2e-8)
    assert row["prevalence"] == pytest.approx(
        n_pos / df["cnt"].sum(), abs=2e-8
    )


def test_brier_decomp_matches_numpy(spark, sf_dir, scored_events):
    row = SPECS["q_brier_decomp"].fn(spark, sf_dir).collect()[0]
    p = 1.0 / (1.0 + np.exp(-(scored_events["score"].to_numpy() - 5.0)))
    y = scored_events["y"].to_numpy(np.float64)
    bins = np.minimum(np.floor(p * 10).astype(int), 9)
    n = len(p)
    brier = float(((p - y) ** 2).mean())
    obar = float(y.mean())
    rel = res = 0.0
    for b in np.unique(bins):
        m = bins == b
        nk = int(m.sum())
        rel += nk * (p[m].mean() - y[m].mean()) ** 2
        res += nk * (y[m].mean() - obar) ** 2
    rel, res = rel / n, res / n
    unc = obar * (1 - obar)
    assert row["n"] == n
    assert row["base_rate"] == pytest.approx(obar, abs=2e-8)
    assert row["brier"] == pytest.approx(brier, abs=2e-8)
    assert row["uncertainty"] == pytest.approx(unc, abs=2e-8)
    assert row["reliability"] == pytest.approx(rel, abs=2e-8)
    assert row["resolution"] == pytest.approx(res, abs=2e-8)
    assert row["residual"] == pytest.approx(
        brier - (rel - res + unc), abs=2e-8
    )
    # Murphy identity: the residual is the within-bin forecast variance,
    # always >= 0 (up to float noise).
    assert row["residual"] >= -1e-9


def test_cohens_kappa_matches_numpy(spark, sf_dir, documents):
    row = SPECS["q_cohens_kappa"].fn(spark, sf_dir).collect()[0]
    chars = documents["n_chars"].to_numpy()
    ntok = documents["text"].str.split(" ").str.len().to_numpy()
    a = np.where(chars >= 400, "long", np.where(chars >= 200, "mid", "short"))
    b = np.where(ntok >= 70, "long", np.where(ntok >= 40, "mid", "short"))
    n = len(a)
    po = float((a == b).mean())
    labels = sorted(set(a) | set(b))
    pe = sum(
        (a == lab).sum() * (b == lab).sum() for lab in labels
    ) / (n * n)
    kappa = (po - pe) / (1 - pe)
    assert row["n"] == n
    assert row["observed_agreement"] == pytest.approx(po, abs=2e-8)
    assert row["expected_agreement"] == pytest.approx(pe, abs=2e-8)
    assert row["kappa"] == pytest.approx(kappa, abs=2e-8)


def test_mrr_matches_sorted_bm25(spark, sf_dir, documents):
    out = {r["query"]: r for r in SPECS["q_mrr"].fn(spark, sf_dir).collect()}
    toks = documents["text"].str.split(" ")
    doclen = toks.str.len().to_numpy(np.float64)
    avglen = doclen.mean()
    n_docs = len(documents)
    is_rel = (
        (documents["lang"] == "en") & (documents["source"] == "src0")
    ).to_numpy()
    doc_ids = documents["doc_id"].to_numpy()
    rrs = []
    for term in MRR_TERMS:
        tf = toks.apply(lambda ts: ts.count(term)).to_numpy(np.float64)
        df = int((tf > 0).sum())
        idf = math.log(1 + (n_docs - df + 0.5) / (df + 0.5))
        score = np.round(
            idf
            * (tf * (_K1 + 1.0))
            / (tf + _K1 * (1 - _B + _B * doclen / avglen)),
            6,
        )
        # Literal ranking: sort all docs by (score desc, doc_id asc).
        order = np.lexsort((doc_ids, -score))
        ranked_rel = is_rel[order]
        first = int(np.argmax(ranked_rel)) + 1  # 1-based rank
        assert ranked_rel.any()
        r = out[term]
        assert r["rank"] == first
        assert r["rel_doc_id"] == doc_ids[order][first - 1]
        assert r["rr"] == pytest.approx(1.0 / first, abs=2e-8)
        rrs.append(1.0 / first)
    for r in out.values():
        assert r["mrr"] == pytest.approx(np.mean(rrs), abs=2e-8)


def test_lift_curve_matches_numpy(spark, sf_dir, scored_events):
    out = SPECS["q_lift_curve"].fn(spark, sf_dir).collect()
    s = scored_events["score"].to_numpy(np.float64)
    y = scored_events["y"].to_numpy(np.float64)
    bounds = [
        np.percentile(s, q, method="linear") for q in range(10, 100, 10)
    ]
    decile = 10 - sum((s > b).astype(int) for b in bounds)
    overall = y.mean()
    total_pos = y.sum()
    cum_n = cum_pos = 0
    rows = {r["decile"]: r for r in out}
    assert sorted(rows) == sorted(set(decile.tolist()))
    for d in sorted(set(decile.tolist())):
        m = decile == d
        nd, posd = int(m.sum()), float(y[m].sum())
        cum_n += nd
        cum_pos += posd
        r = rows[d]
        assert r["n"] == nd and r["n_pos"] == posd
        assert r["pos_rate"] == pytest.approx(posd / nd, abs=2e-8)
        assert r["lift"] == pytest.approx(posd / nd / overall, abs=2e-8)
        assert r["cum_gain"] == pytest.approx(cum_pos / total_pos, abs=2e-8)
        assert r["cum_lift"] == pytest.approx(
            cum_pos / cum_n / overall, abs=2e-8
        )
