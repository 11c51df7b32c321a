"""Independent-recomputation tests for the round-11 statistics batch
(q_kendall_tau, q_cramers_v, q_jsd_drift, q_theilsen, q_kruskal_wallis):
each operator's output is re-derived from the raw sf0.001 parquet with
numpy/pandas — no Spark, no DuckDB — so a shared mis-derivation in the
operator and its oracle cannot pass silently (both engines implementing
the same wrong formula would fool the hash gate; a third implementation
won't).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

from crypto_data_ingestion_script_spark.registry import load_all

SPECS = load_all()


@pytest.fixture(scope="module")
def events(sf_dir) -> pd.DataFrame:
    return pq.read_table(f"{sf_dir}/events.parquet").to_pandas()


@pytest.fixture(scope="module")
def lineitem(sf_dir) -> pd.DataFrame:
    return pq.read_table(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_quantity", "l_discount"],
    ).to_pandas()


@pytest.fixture(scope="module")
def orders(sf_dir) -> pd.DataFrame:
    return pq.read_table(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderstatus", "o_orderpriority"],
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


def test_kendall_tau_matches_numpy(spark, sf_dir, lineitem):
    rows = {
        r["flag"]: r
        for r in SPECS["q_kendall_tau"].fn(spark, sf_dir).collect()
    }
    for flag, g in lineitem.groupby("l_returnflag"):
        x = g["l_quantity"].to_numpy(np.float64)
        y = g["l_discount"].to_numpy(np.float64)
        n = len(x)
        # O(n^2) literal pair count — fine at sf0.001 (n ~ a few thousand).
        conc = disc = 0
        for i in range(n):
            dx = x[i + 1 :] - x[i]
            dy = y[i + 1 :] - y[i]
            s = np.sign(dx) * np.sign(dy)
            conc += int((s > 0).sum())
            disc += int((s < 0).sum())
        _, cx = np.unique(x, return_counts=True)
        _, cy = np.unique(y, return_counts=True)
        n0 = n * (n - 1) / 2.0
        n1 = float((cx * (cx - 1) / 2.0).sum())
        n2 = float((cy * (cy - 1) / 2.0).sum())
        tau = (conc - disc) / np.sqrt((n0 - n1) * (n0 - n2))
        r = rows[flag]
        assert r["n"] == n
        assert r["concordant"] == conc
        assert r["discordant"] == disc
        assert r["tau_b"] == pytest.approx(tau, abs=2e-8)


def test_kendall_tau_degenerate_group_survives(spark, tmp_path):
    """ADVICE r11: a group whose x column has a single distinct value
    (every pair x-tied — tau_b undefined) must still APPEAR in the
    output with its n and NULL tau_b, not silently vanish from the
    inner join of the concordance CTE."""
    sf = str(tmp_path)
    pd.DataFrame(
        {
            "l_returnflag": ["D", "D", "D", "N", "N", "N"],
            "l_quantity": [5.0, 5.0, 5.0, 1.0, 2.0, 3.0],
            "l_discount": [0.1, 0.2, 0.3, 0.1, 0.2, 0.3],
        }
    ).to_parquet(f"{sf}/lineitem.parquet")
    rows = {
        r["flag"]: r for r in SPECS["q_kendall_tau"].fn(spark, sf).collect()
    }
    assert set(rows) == {"D", "N"}
    d = rows["D"]
    assert (d["n"], d["concordant"], d["discordant"]) == (3, 0, 0)
    assert d["tau_b"] is None
    n = rows["N"]
    assert (n["concordant"], n["discordant"]) == (3, 0)
    assert n["tau_b"] == pytest.approx(1.0)


def test_cramers_v_matches_numpy(spark, sf_dir, orders):
    row = SPECS["q_cramers_v"].fn(spark, sf_dir).collect()[0]
    ct = pd.crosstab(orders["o_orderstatus"], orders["o_orderpriority"])
    obs = ct.to_numpy(np.float64)
    n = obs.sum()
    exp = np.outer(obs.sum(axis=1), obs.sum(axis=0)) / n
    chi2 = ((obs - exp) ** 2 / exp).sum()
    r, k = obs.shape
    v = np.sqrt(chi2 / (n * (min(r, k) - 1)))
    assert row["n"] == int(n)
    assert (row["n_rows"], row["n_cols"]) == (r, k)
    assert row["dof"] == (r - 1) * (k - 1)
    assert row["chi2"] == pytest.approx(chi2, rel=1e-9)
    assert row["cramers_v"] == pytest.approx(v, abs=2e-8)


def test_jsd_drift_matches_numpy(spark, sf_dir, events):
    out = SPECS["q_jsd_drift"].fn(spark, sf_dir).collect()
    arm = events["event_id"].to_numpy() % 2
    types = sorted(events["event_type"].unique())
    na = events.loc[arm == 0].groupby("event_type").size()
    nb = events.loc[arm == 1].groupby("event_type").size()
    p = na.reindex(types, fill_value=0).to_numpy(np.float64)
    q = nb.reindex(types, fill_value=0).to_numpy(np.float64)
    p, q = p / p.sum(), q / q.sum()
    m = (p + q) / 2
    contrib = 0.5 * np.where(p > 0, p * np.log2(np.where(p > 0, p, 1) / m), 0.0) + 0.5 * np.where(
        q > 0, q * np.log2(np.where(q > 0, q, 1) / m), 0.0
    )
    jsd = contrib.sum()
    assert [r["event_type"] for r in out] == types
    for i, r in enumerate(out):
        assert r["p"] == pytest.approx(p[i], abs=2e-8)
        assert r["q"] == pytest.approx(q[i], abs=2e-8)
        assert r["contrib_bits"] == pytest.approx(contrib[i], abs=2e-8)
        assert r["jsd_bits"] == pytest.approx(jsd, abs=2e-8)
    assert 0.0 <= out[0]["jsd_bits"] <= 1.0  # JSD in bits is bounded by 1


def test_theilsen_matches_numpy(spark, sf_dir, events):
    rows = {
        r["event_type"]: r
        for r in SPECS["q_theilsen"].fn(spark, sf_dir).collect()
    }
    ev = events.copy()
    ev["hour_ts"] = ev["ts"].dt.floor("h")
    for etype, g in ev.groupby("event_type"):
        # close per hour = value at max ts within the hour
        bars = g.sort_values("ts").groupby("hour_ts").last()["value"]
        x0 = bars.index.min()
        x = (bars.index - x0).total_seconds().to_numpy(np.float64) / 3600.0
        y = bars.to_numpy(np.float64)
        slopes = []
        for i in range(len(x)):
            for j in range(i + 1, len(x)):
                slopes.append(round((y[j] - y[i]) / (x[j] - x[i]), 8))
        slopes = np.array(slopes)
        slope = float(np.percentile(slopes, 50, method="linear"))
        icept = float(
            np.percentile(y - slope * x, 50, method="linear")
        )
        r = rows[etype]
        assert r["n_pairs"] == len(slopes)
        assert r["slope"] == pytest.approx(slope, abs=2e-8)
        assert r["intercept"] == pytest.approx(icept, abs=2e-8)


def test_kruskal_wallis_matches_numpy(spark, sf_dir, events):
    out = SPECS["q_kruskal_wallis"].fn(spark, sf_dir).collect()
    vals = events["value"].to_numpy(np.float64)
    ranks = _avg_ranks(vals)
    n = float(len(vals))
    groups = events["event_type"].to_numpy()
    per = {}
    for gname in np.unique(groups):
        mask = groups == gname
        per[gname] = (int(mask.sum()), float(ranks[mask].sum()))
    s = sum(rs * rs / ni for ni, rs in per.values())
    h = 12.0 / (n * (n + 1)) * s - 3 * (n + 1)
    _, counts = np.unique(vals, return_counts=True)
    t3t = float((counts.astype(np.float64) ** 3 - counts).sum())
    h_corr = h / (1 - t3t / (n ** 3 - n))
    for r in out:
        ni, rs = per[r["event_type"]]
        assert r["n_i"] == ni
        assert r["rank_sum"] == pytest.approx(rs, rel=1e-9)
        assert r["h"] == pytest.approx(h, abs=2e-8)
        assert r["h_tie_corrected"] == pytest.approx(h_corr, abs=2e-8)
