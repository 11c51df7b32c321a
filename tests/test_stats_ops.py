"""Independent-recomputation tests for the round-10 statistics batch
(q_anova, q_mann_whitney, q_spearman, q_poisson_bootstrap): each operator's
output is re-derived from the raw sf0.001 parquet with numpy — no Spark, no
DuckDB — so a shared mis-derivation in the operator and its oracle cannot
pass silently (both engines implementing the same wrong formula would fool
test_oracle_match; a third implementation won't).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

from crypto_data_ingestion_script_spark.operators.quality import (
    BOOT_B,
    _POIS1_CDF,
)
from crypto_data_ingestion_script_spark.registry import load_all

SPECS = load_all()


@pytest.fixture(scope="module")
def events(sf_dir) -> pd.DataFrame:
    return pq.read_table(f"{sf_dir}/events.parquet").to_pandas()


@pytest.fixture(scope="module")
def lineitem(sf_dir) -> pd.DataFrame:
    return pq.read_table(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_quantity", "l_extendedprice"],
    ).to_pandas()


def _avg_ranks(x: np.ndarray) -> np.ndarray:
    """Average-rank (ties share the mean of their positions), scipy-free."""
    order = np.argsort(x, kind="mergesort")
    ranks = np.empty(len(x), dtype=np.float64)
    sx = x[order]
    i = 0
    while i < len(sx):
        j = i
        while j + 1 < len(sx) and sx[j + 1] == sx[i]:
            j += 1
        ranks[order[i : j + 1]] = (i + j) / 2.0 + 1.0
        i = j + 1
    return ranks


def test_anova_matches_numpy(spark, sf_dir, events):
    row = SPECS["q_anova"].fn(spark, sf_dir).collect()[0]
    groups = [g["value"].to_numpy() for _, g in events.groupby("event_type")]
    k, n = len(groups), sum(len(g) for g in groups)
    grand = np.concatenate(groups).mean()
    ssb = sum(len(g) * (g.mean() - grand) ** 2 for g in groups)
    ssw = sum(((g - g.mean()) ** 2).sum() for g in groups)
    f = (ssb / (k - 1)) / (ssw / (n - k))
    assert row["n_groups"] == k and row["n_total"] == n
    assert row["ss_between"] == pytest.approx(ssb, rel=1e-6)
    assert row["ss_within"] == pytest.approx(ssw, rel=1e-6)
    assert row["f_stat"] == pytest.approx(f, rel=1e-6)


def test_mann_whitney_matches_numpy(spark, sf_dir, events):
    row = SPECS["q_mann_whitney"].fn(spark, sf_dir).collect()[0]
    a = events.loc[events.event_type == "click", "value"].to_numpy()
    b = events.loc[events.event_type == "purchase", "value"].to_numpy()
    pooled = np.concatenate([a, b])
    ranks = _avg_ranks(pooled)
    n1, n2 = len(a), len(b)
    r1 = ranks[:n1].sum()
    u = r1 - n1 * (n1 + 1) / 2.0
    _, counts = np.unique(pooled, return_counts=True)
    ties = float((counts.astype(np.float64) ** 3 - counts).sum())
    n = n1 + n2
    var = n1 * n2 / 12.0 * ((n + 1) - ties / (n * (n - 1)))
    z = (u - n1 * n2 / 2.0) / np.sqrt(var)
    assert (row["n1"], row["n2"]) == (n1, n2)
    assert row["u_stat"] == pytest.approx(u, abs=1e-6)
    assert row["z_stat"] == pytest.approx(z, abs=1e-5)


def test_spearman_matches_numpy(spark, sf_dir, lineitem):
    got = {
        r["flag"]: r for r in SPECS["q_spearman"].fn(spark, sf_dir).collect()
    }
    for flag, g in lineitem.groupby("l_returnflag"):
        x = g["l_quantity"].to_numpy(dtype=np.float64)
        y = g["l_extendedprice"].to_numpy(dtype=np.float64)
        rho = np.corrcoef(_avg_ranks(x), _avg_ranks(y))[0, 1]
        r = np.corrcoef(x, y)[0, 1]
        assert got[flag]["n"] == len(g)
        assert got[flag]["spearman_rho"] == pytest.approx(rho, abs=1e-5)
        assert got[flag]["pearson_r"] == pytest.approx(r, abs=1e-5)


def _pois_k(event_id: int, b: int) -> int:
    # replicate b reads 32-bit slice b%4 of md5 block b//4
    h = hashlib.md5(f"pb{b // 4}-{event_id}".encode()).hexdigest()
    s = 8 * (b % 4)
    u = int(h[s : s + 8], 16) / 4294967296.0
    for k, c in enumerate(_POIS1_CDF):
        if u < float(c):
            return k
    return 5


def test_poisson_bootstrap_matches_hand_replicates(spark, sf_dir, events):
    row = SPECS["q_poisson_bootstrap"].fn(spark, sf_dir).collect()[0]
    ids = events["event_id"].to_numpy()
    vals = events["value"].to_numpy(dtype=np.float64)
    means = []
    for b in range(BOOT_B):
        k = np.array([_pois_k(int(i), b) for i in ids], dtype=np.float64)
        means.append(float((k * vals).sum() / k.sum()))
    m = np.asarray(means)
    assert row["n_rows"] == len(events)
    assert row["point_mean"] == pytest.approx(vals.mean(), abs=1e-6)
    assert row["n_replicates"] == BOOT_B
    assert row["boot_mean"] == pytest.approx(m.mean(), abs=1e-6)
    assert row["boot_se"] == pytest.approx(m.std(ddof=1), abs=1e-6)
    # percentile CI via linear interpolation (matches F.percentile /
    # quantile_cont)
    assert row["ci_lo"] == pytest.approx(
        np.quantile(m, 0.025, method="linear"), abs=1e-6
    )
    assert row["ci_hi"] == pytest.approx(
        np.quantile(m, 0.975, method="linear"), abs=1e-6
    )
    # the weights really are Poisson(1)-shaped: mean weight ~ 1
    k0 = np.array([_pois_k(int(i), 0) for i in ids], dtype=np.float64)
    assert abs(k0.mean() - 1.0) < 0.2


@pytest.fixture(scope="module")
def embeddings(sf_dir) -> pd.DataFrame:
    return pq.read_table(f"{sf_dir}/embeddings.parquet").to_pandas()


def test_auc_matches_rank_and_trapezoid(spark, sf_dir, events):
    row = SPECS["q_auc"].fn(spark, sf_dir).collect()[0]
    sub = events[events.event_type.isin(["click", "purchase"])]
    score = sub["value"].to_numpy(dtype=np.float64)
    pos = (sub.event_type == "purchase").to_numpy()
    ranks = _avg_ranks(score)
    n_pos, n_neg = int(pos.sum()), int((~pos).sum())
    u = ranks[pos].sum() - n_pos * (n_pos + 1) / 2.0
    auc_rank = u / (n_pos * n_neg)
    assert (row["n_pos"], row["n_neg"]) == (n_pos, n_neg)
    assert row["auc"] == pytest.approx(auc_rank, abs=1e-8)
    assert row["gini"] == pytest.approx(2 * auc_rank - 1, abs=1e-8)
    # the rank formulation IS the ROC integral: trapezoidal sweep over
    # every distinct threshold gives the same number
    order = np.argsort(-score, kind="mergesort")
    sp, spos = score[order], pos[order]
    tps = np.cumsum(spos)
    fps = np.cumsum(~spos)
    last = np.r_[np.diff(sp) != 0, True]
    tpr = np.r_[0, tps[last] / n_pos]
    fpr = np.r_[0, fps[last] / n_neg]
    auc_trap = np.trapz(tpr, fpr)
    assert row["auc"] == pytest.approx(auc_trap, abs=1e-8)


def test_woe_iv_matches_pandas(spark, sf_dir, events):
    rows = SPECS["q_woe_iv"].fn(spark, sf_dir).collect()
    sub = events[events.event_type.isin(["click", "purchase"])]
    score = sub["value"].to_numpy(dtype=np.float64)
    pos = (sub.event_type == "purchase").to_numpy()
    bounds = np.quantile(score, np.arange(0.1, 1.0, 0.1), method="linear")
    bins = (score[:, None] > bounds[None, :]).sum(axis=1)
    tp, tn = pos.sum(), (~pos).sum()
    got = {r["bin"]: r for r in rows}
    iv = 0.0
    for b in np.unique(bins):
        m = bins == b
        npos, nneg = int(pos[m].sum()), int((~pos[m]).sum())
        ps, ns = (npos + 0.5) / (tp + 5.0), (nneg + 0.5) / (tn + 5.0)
        woe = np.log(ps / ns)
        iv += (ps - ns) * woe
        assert got[b]["n_pos"] == npos and got[b]["n_neg"] == nneg
        assert got[b]["woe"] == pytest.approx(woe, abs=1e-7)
    for r in rows:
        assert r["iv_total"] == pytest.approx(iv, abs=1e-7)


def test_isotropy_identity_vs_brute_force(spark, sf_dir, embeddings):
    row = SPECS["q_embedding_isotropy"].fn(spark, sf_dir).collect()[0]
    e = np.stack(embeddings["embedding"].to_numpy()).astype(np.float64)
    nrm = np.linalg.norm(e, axis=1)
    unit = e / nrm[:, None]
    n = len(unit)
    # brute force: mean over all ordered pairs i != j
    gram = unit @ unit.T
    brute = (gram.sum() - np.trace(gram)) / (n * (n - 1))
    assert row["n"] == n
    assert row["mean_norm"] == pytest.approx(nrm.mean(), abs=1e-5)
    assert row["std_norm"] == pytest.approx(nrm.std(ddof=1), abs=1e-5)
    assert row["avg_pairwise_cos"] == pytest.approx(brute, abs=1e-5)
    s = unit.sum(axis=0)
    assert row["mean_cos_to_centroid"] == pytest.approx(
        np.linalg.norm(s) / n, abs=1e-5
    )


def test_markov_transitions_matches_pandas(spark, sf_dir, events):
    got = {
        (r["cur"], r["nxt"]): r
        for r in SPECS["q_markov_transitions"].fn(spark, sf_dir).collect()
    }
    ev = events.sort_values(["user_id", "ts", "event_id"])
    pairs = {}
    for _, g in ev.groupby("user_id"):
        ts = g["event_type"].tolist()
        for a, b in zip(ts, ts[1:]):
            pairs[(a, b)] = pairs.get((a, b), 0) + 1
    assert set(got) == set(pairs)
    row_tot = {}
    for (a, _), n in pairs.items():
        row_tot[a] = row_tot.get(a, 0) + n
    for (a, b), n in pairs.items():
        assert got[(a, b)]["n"] == n
        assert got[(a, b)]["p"] == pytest.approx(n / row_tot[a], abs=1e-8)
    # rows of the transition matrix sum to 1
    for a in row_tot:
        s = sum(r["p"] for (c, _), r in got.items() if c == a)
        assert s == pytest.approx(1.0, abs=1e-6)


def test_pacf_matches_yule_walker_solve(spark, sf_dir, events):
    rows = SPECS["q_pacf"].fn(spark, sf_dir).collect()
    bars = (
        events.assign(hour=events.ts.dt.floor("h"))
        .sort_values("ts")
        .groupby(["event_type", "hour"])["value"]
        .last()
        .reset_index()
    )
    for et, g in bars.groupby("event_type"):
        x = g.sort_values("hour")["value"].to_numpy(dtype=np.float64)
        # corr-based acf at lags 1..4, rounded 8dp (the operator's
        # lockstep inputs)
        r = [
            round(float(np.corrcoef(x[k:], x[:-k])[0, 1]), 8)
            for k in range(1, 5)
        ]
        mine = {q["lag"]: q for q in rows if q["event_type"] == et}
        for k in range(1, 5):
            assert mine[k]["acf"] == pytest.approx(r[k - 1], abs=1e-8)
            # pacf_k = last coeff of the Yule-Walker solve at order k —
            # an independent derivation of the Durbin-Levinson value
            rr = np.array([1.0] + r)
            R = np.array([[rr[abs(i - j)] for j in range(k)] for i in range(k)])
            phi = np.linalg.solve(R, rr[1 : k + 1])
            assert mine[k]["pacf"] == pytest.approx(phi[-1], abs=1e-6)


def test_source_overlap_matches_pandas(spark, sf_dir):
    got = {
        (r["source_a"], r["source_b"]): r
        for r in SPECS["q_source_overlap"].fn(spark, sf_dir).collect()
    }
    docs = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["text", "source"]
    ).to_pandas()
    sets = {
        src: set(hashlib.md5(t.encode()).hexdigest() for t in g["text"])
        for src, g in docs.groupby("source")
    }
    srcs = sorted(sets)
    want = {}
    for i, a in enumerate(srcs):
        for b in srcs[i + 1 :]:
            sh = len(sets[a] & sets[b])
            if sh:
                want[(a, b)] = sh
    assert set(got) == set(want)
    for (a, b), sh in want.items():
        r = got[(a, b)]
        assert r["shared_texts"] == sh
        assert r["n_a"] == len(sets[a]) and r["n_b"] == len(sets[b])
        assert r["jaccard"] == pytest.approx(
            sh / len(sets[a] | sets[b]), abs=1e-8
        )


def test_calibration_curve_matches_pandas(spark, sf_dir, events):
    rows = SPECS["q_calibration_curve"].fn(spark, sf_dir).collect()
    sub = events[events.event_type.isin(["click", "purchase"])]
    p = 1.0 / (1.0 + np.exp(-(sub["value"].to_numpy() - 5.0)))
    y = (sub.event_type == "purchase").to_numpy().astype(float)
    bins = np.minimum((p * 10).astype(int), 9)
    brier = float(((p - y) ** 2).mean())
    ece = 0.0
    ref = {}
    for b in np.unique(bins):
        m = bins == b
        ref[b] = (int(m.sum()), p[m].mean(), y[m].mean())
        ece += m.sum() * abs(p[m].mean() - y[m].mean())
    ece /= len(p)
    assert {r["bin"] for r in rows} == set(ref)
    for r in rows:
        n, mp, orate = ref[r["bin"]]
        assert r["n"] == n
        assert r["mean_pred"] == pytest.approx(mp, abs=1e-7)
        assert r["obs_rate"] == pytest.approx(orate, abs=1e-7)
        assert r["brier"] == pytest.approx(brier, abs=1e-7)
        assert r["ece"] == pytest.approx(ece, abs=1e-7)


def test_wasserstein_matches_numpy(spark, sf_dir, events):
    row = SPECS["q_wasserstein"].fn(spark, sf_dir).collect()[0]
    a = np.sort(
        events.loc[events.event_type == "click", "value"].to_numpy()
    )
    b = np.sort(
        events.loc[events.event_type == "purchase", "value"].to_numpy()
    )
    # scipy-free W1: integrate |ECDF_a - ECDF_b| over the pooled grid
    grid = np.unique(np.concatenate([a, b]))
    fa = np.searchsorted(a, grid, side="right") / len(a)
    fb = np.searchsorted(b, grid, side="right") / len(b)
    w1 = float(np.sum(np.abs(fa[:-1] - fb[:-1]) * np.diff(grid)))
    ks = float(np.max(np.abs(fa - fb)))
    assert (row["n_a"], row["n_b"]) == (len(a), len(b))
    assert row["wasserstein_1"] == pytest.approx(w1, abs=1e-7)
    assert row["ks_stat"] == pytest.approx(ks, abs=1e-7)


def test_lang_confusion_consistent_with_predictions(spark, sf_dir):
    preds = (
        SPECS["q_lang_id_chargram"].fn(spark, sf_dir).toPandas()
    )
    rows = SPECS["q_lang_confusion"].fn(spark, sf_dir).collect()
    f1s = []
    tp_tot = 0
    for r in rows:
        sub = preds[preds.labeled_lang == r["lang"]]
        tp = int((sub.predicted_lang == r["lang"]).sum())
        pcnt = int((preds.predicted_lang == r["lang"]).sum())
        assert r["support"] == len(sub)
        assert r["tp"] == tp
        assert r["fp"] == pcnt - tp
        assert r["fn"] == len(sub) - tp
        prec = tp / pcnt if pcnt else 0.0
        rec = tp / len(sub)
        f1 = 2 * prec * rec / (prec + rec) if prec + rec else 0.0
        assert r["precision"] == pytest.approx(prec, abs=1e-6)
        assert r["recall"] == pytest.approx(rec, abs=1e-6)
        assert r["f1"] == pytest.approx(f1, abs=1e-6)
        f1s.append(f1)
        tp_tot += tp
    # every labeled class appears exactly once
    assert sorted(r["lang"] for r in rows) == sorted(
        preds.labeled_lang.unique()
    )
    for r in rows:
        assert r["macro_f1"] == pytest.approx(np.mean(f1s), abs=1e-6)
        assert r["accuracy"] == pytest.approx(
            tp_tot / len(preds), abs=1e-6
        )


def test_jaccard_sweep_matches_quadratic_pandas(spark, sf_dir):
    from crypto_data_ingestion_script_spark.llm.dedup import SWEEP_TAUS

    rows = {
        r["tau"]: r
        for r in SPECS["q_jaccard_sweep"].fn(spark, sf_dir).collect()
    }
    docs = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).to_pandas()
    sets = {
        int(r.doc_id): frozenset(r.text.lower().split(" "))
        for r in docs.itertuples()
    }
    ids = sorted(sets)
    pair_j = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(sets[a] & sets[b])
            if not inter:
                continue
            j = inter / len(sets[a] | sets[b])
            if j >= SWEEP_TAUS[0]:
                pair_j[(a, b)] = round(j, 6)
    for tau in SWEEP_TAUS:
        kept = {p: j for p, j in pair_j.items() if j >= tau}
        affected = {d for p in kept for d in p}
        r = rows[tau]
        assert r["n_pairs"] == len(kept), tau
        assert r["n_docs_affected"] == len(affected), tau
        assert r["doc_share"] == pytest.approx(
            len(affected) / len(ids), abs=1e-8
        )
    # monotone: tighter threshold never keeps more
    ps = [rows[t]["n_pairs"] for t in SWEEP_TAUS]
    assert ps == sorted(ps, reverse=True)


def test_ndcg_matches_hand_computation(spark, sf_dir):
    import math

    rows = SPECS["q_ndcg"].fn(spark, sf_dir).collect()
    bm25 = SPECS["q_bm25"].fn(spark, sf_dir).collect()[:10]
    docs = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "source"]
    ).to_pandas().set_index("doc_id")
    rels = []
    for r in bm25:
        d = docs.loc[r["doc_id"]]
        rels.append(
            2 if (d.lang == "en" and d.source == "src0")
            else (1 if d.lang == "en" else 0)
        )
    dcg = sum(
        (2**rel - 1) / math.log2(pos + 2) for pos, rel in enumerate(rels)
    )
    idcg = sum(
        (2**rel - 1) / math.log2(pos + 2)
        for pos, rel in enumerate(sorted(rels, reverse=True))
    )
    want = dcg / idcg if idcg > 0 else 0.0
    assert len(rows) == len(bm25)
    assert [r["rel"] for r in sorted(rows, key=lambda r: r["pos"])] == rels
    for r in rows:
        assert r["ndcg_10"] == pytest.approx(want, abs=1e-6)
    assert rows[-1]["dcg_cum"] == pytest.approx(dcg, abs=1e-6)
    assert 0.0 <= rows[0]["ndcg_10"] <= 1.0


def test_concentration_matches_pandas(spark, sf_dir, events):
    row = SPECS["q_concentration"].fn(spark, sf_dir).collect()[0]
    u = (
        events[events.event_type == "purchase"]
        .groupby("user_id")["value"]
        .sum()
    )
    p90 = np.quantile(u, 0.9, method="linear")
    p99 = np.quantile(u, 0.99, method="linear")
    grand = u.sum()
    assert row["n_users"] == len(u)
    assert row["p90_cut"] == pytest.approx(p90, abs=1e-5)
    assert row["p99_cut"] == pytest.approx(p99, abs=1e-5)
    assert row["n_top10"] == int((u > p90).sum())
    assert row["top10_share"] == pytest.approx(
        u[u > p90].sum() / grand, abs=1e-6
    )
    assert row["top1_share"] == pytest.approx(
        u[u > p99].sum() / grand, abs=1e-6
    )
    assert row["top1_share"] <= row["top10_share"] <= 1.0
