"""Independent-recomputation tests for q_kaplan_meier and q_gmm_em
(round 11). KM is re-derived with a literal per-user product-limit in
pandas (no window tricks); GMM's lockstep trajectory is replayed in
numpy with the same per-round roundings — a third implementation of
the E/M algebra.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

from crypto_data_ingestion_script_spark.operators.stats import (
    GMM_ITERS,
    GMM_SIGMA_FLOOR,
)
from crypto_data_ingestion_script_spark.registry import load_all

SPECS = load_all()


@pytest.fixture(scope="module")
def events(sf_dir) -> pd.DataFrame:
    return pq.read_table(f"{sf_dir}/events.parquet").to_pandas()


def test_kaplan_meier_matches_pandas(spark, sf_dir, events):
    out = SPECS["q_kaplan_meier"].fn(spark, sf_dir).collect()
    per = events.groupby("user_id").agg(
        t0=("ts", "min"), tend=("ts", "max")
    )
    tp = (
        events[events.event_type == "purchase"]
        .groupby("user_id")["ts"]
        .min()
        .rename("tp")
    )
    per = per.join(tp)
    obs = per["tp"].fillna(per["tend"])
    dur_h = (
        (obs.astype("datetime64[us]").astype("int64")
         - per["t0"].astype("datetime64[us]").astype("int64"))
        // 3_600_000_000
    )
    ev = per["tp"].notna().astype(int)
    tbl = pd.DataFrame({"dur_h": dur_h, "ev": ev})
    grid = tbl.groupby("dur_h").agg(
        d=("ev", "sum"), tot=("ev", "size")
    ).sort_index()
    n_total = int(grid["tot"].sum())
    at_risk = n_total - grid["tot"].cumsum().shift(1, fill_value=0)
    s = 1.0
    rows = {r["dur_h"]: r for r in out}
    assert sorted(rows) == list(grid.index)
    for t_h, g in grid.iterrows():
        n_risk = int(at_risk.loc[t_h])
        s *= 1 - g["d"] / n_risk
        r = rows[t_h]
        assert r["n_risk"] == n_risk
        assert r["n_events"] == g["d"]
        assert r["n_censored"] == g["tot"] - g["d"]
        assert r["survival"] == pytest.approx(s, abs=2e-6)
    # survival is a nonincreasing step function starting <= 1
    survs = [rows[k]["survival"] for k in sorted(rows)]
    assert all(a >= b - 1e-12 for a, b in zip(survs, survs[1:]))
    assert survs[0] <= 1.0 + 1e-12


def test_gmm_em_matches_numpy_lockstep(spark, sf_dir, events):
    row = SPECS["q_gmm_em"].fn(spark, sf_dir).collect()[0]
    v_all = events["value"].to_numpy(np.float64)
    vals, cnts = np.unique(v_all, return_counts=True)
    c = cnts.astype(np.float64)
    pi1 = 0.5
    mu1 = round(float(np.percentile(v_all, 25, method="linear")), 8)
    mu2 = round(float(np.percentile(v_all, 75, method="linear")), 8)
    s1 = s2 = round(float(v_all.std()), 8)
    for _ in range(GMM_ITERS):
        w1 = pi1 * np.exp(-((vals - mu1) ** 2) / (2 * s1 * s1)) / s1
        w2 = (1 - pi1) * np.exp(-((vals - mu2) ** 2) / (2 * s2 * s2)) / s2
        tot = w1 + w2
        r = np.where(tot > 0, np.round(np.divide(w1, np.where(tot > 0, tot, 1)), 8), 0.5)

        def m_step(resp):
            mu = (c * resp * vals).sum() / (c * resp).sum()
            var = (c * resp * vals * vals).sum() / (c * resp).sum() - mu**2
            sig = max(np.sqrt(max(var, 0.0)), GMM_SIGMA_FLOOR)
            return round(mu, 8), round(sig, 8)

        pi1 = round((c * r).sum() / c.sum(), 8)
        mu1, s1 = m_step(r)
        mu2, s2 = m_step(1 - r)
    assert row["n"] == len(v_all)
    assert row["iters"] == GMM_ITERS
    assert row["pi1"] == pytest.approx(pi1, abs=2e-6)
    assert row["mu1"] == pytest.approx(mu1, abs=2e-6)
    assert row["sigma1"] == pytest.approx(s1, abs=2e-6)
    assert row["mu2"] == pytest.approx(mu2, abs=2e-6)
    assert row["sigma2"] == pytest.approx(s2, abs=2e-6)
    # mixture sanity
    assert 0.0 < row["pi1"] < 1.0
    assert row["sigma1"] >= GMM_SIGMA_FLOOR and row["sigma2"] >= GMM_SIGMA_FLOOR
