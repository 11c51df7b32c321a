"""Independent-recomputation tests for the second round-11 stats batch
(q_dtw, q_ridge_normal, q_sharpe). Ridge is re-solved with
numpy.linalg.solve (LU factorization) against the engine's Cramer-rule
determinants — a different solver on the same normal equations. DTW is
re-run column-major (the engine and oracle go row-/diagonal-major) —
the DP optimum is iteration-order invariant, so agreement checks the
recurrence, not the loop."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

from crypto_data_ingestion_script_spark.operators.stats import (
    ANNUAL_HOURS,
    DTW_BAND_MARGIN,
    DTW_BUCKET_US,
    RIDGE_LAMBDA,
)
from crypto_data_ingestion_script_spark.registry import load_all

SPECS = load_all()


@pytest.fixture(scope="module")
def events(sf_dir) -> pd.DataFrame:
    return pq.read_table(f"{sf_dir}/events.parquet").to_pandas()


def test_dtw_matches_column_major_numpy(spark, sf_dir, events):
    out = SPECS["q_dtw"].fn(spark, sf_dir).collect()
    ev = events.copy()
    ev["bucket"] = (
        ev["ts"].astype("datetime64[us]").astype("int64") // DTW_BUCKET_US
    )  # microsecond epoch -> 3h bucket
    bars = (
        ev.sort_values("ts")
        .groupby(["event_type", "bucket"], as_index=False)
        .last()[["event_type", "bucket", "value"]]
    )
    series = {}
    for etype, g in bars.groupby("event_type"):
        v = g.sort_values("bucket")["value"].to_numpy(np.float64)
        series[etype] = np.round((v - v.mean()) / v.std(), 8)
    rows = {(r["type_a"], r["type_b"]): r for r in out}
    types = sorted(series)
    assert len(rows) == len(types) * (len(types) - 1) // 2
    for ia, ta in enumerate(types):
        for tb in types[ia + 1 :]:
            x, y = series[ta], series[tb]
            n, m = len(x), len(y)
            band = abs(n - m) + DTW_BAND_MARGIN
            inf = float("inf")
            dp = np.full((n + 1, m + 1), inf)
            dp[0, 0] = 0.0
            for j in range(1, m + 1):  # column-major on purpose
                for i in range(max(1, j - band), min(n, j + band) + 1):
                    dp[i, j] = abs(x[i - 1] - y[j - 1]) + min(
                        dp[i - 1, j], dp[i, j - 1], dp[i - 1, j - 1]
                    )
            r = rows[(ta, tb)]
            assert (r["n_a"], r["n_b"], r["band"]) == (n, m, band)
            assert np.isfinite(dp[n, m])
            assert r["dtw"] == pytest.approx(dp[n, m], abs=2e-6)
            assert r["dtw_per_step"] == pytest.approx(
                dp[n, m] / (n + m), abs=2e-6
            )


def test_ridge_matches_numpy_solve(spark, sf_dir):
    row = SPECS["q_ridge_normal"].fn(spark, sf_dir).collect()[0]
    li = pq.read_table(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_quantity", "l_discount", "l_tax", "l_extendedprice"],
    ).to_pandas()
    X = li[["l_quantity", "l_discount", "l_tax"]].to_numpy(np.float64)
    y = li["l_extendedprice"].to_numpy(np.float64)
    Xc = X - X.mean(axis=0)
    yc = y - y.mean()
    G = Xc.T @ Xc + RIDGE_LAMBDA * np.eye(3)
    beta = np.linalg.solve(G, Xc.T @ yc)
    icept = y.mean() - X.mean(axis=0) @ beta
    assert row["n"] == len(y)
    assert row["beta_quantity"] == pytest.approx(beta[0], abs=2e-6)
    assert row["beta_discount"] == pytest.approx(beta[1], abs=2e-6)
    assert row["beta_tax"] == pytest.approx(beta[2], abs=2e-6)
    assert row["intercept"] == pytest.approx(icept, abs=2e-6)
    assert row["lambda"] == RIDGE_LAMBDA
    # Ridge shrinks: L2 norm below the OLS solution's.
    ols = np.linalg.solve(Xc.T @ Xc, Xc.T @ yc)
    assert np.linalg.norm(beta) <= np.linalg.norm(ols) + 1e-9


def test_sharpe_matches_pandas(spark, sf_dir, events):
    out = {
        r["event_type"]: r
        for r in SPECS["q_sharpe"].fn(spark, sf_dir).collect()
    }
    ev = events.copy()
    ev["hour_ts"] = ev["ts"].dt.floor("h")
    bars = (
        ev.sort_values("ts")
        .groupby(["event_type", "hour_ts"], as_index=False)
        .last()[["event_type", "hour_ts", "value"]]
    )
    for etype, g in bars.groupby("event_type"):
        close = g.sort_values("hour_ts")["value"].to_numpy(np.float64)
        ret = close[1:] / close[:-1] - 1
        mean, vol = ret.mean(), ret.std(ddof=1)
        downside = np.sqrt((np.minimum(ret, 0) ** 2).mean())
        r = out[etype]
        assert r["n_rets"] == len(ret)
        assert r["mean_ret"] == pytest.approx(mean, abs=2e-8)
        assert r["vol"] == pytest.approx(vol, abs=2e-8)
        assert r["sharpe_annual"] == pytest.approx(
            mean / vol * np.sqrt(ANNUAL_HOURS), abs=2e-6
        )
        if downside > 0:
            assert r["sortino_annual"] == pytest.approx(
                mean / downside * np.sqrt(ANNUAL_HOURS), abs=2e-6
            )
        else:
            assert r["sortino_annual"] is None
