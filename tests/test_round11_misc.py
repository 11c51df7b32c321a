"""Independent-recomputation tests for the final round-11 batch
(q_skyline_sweep, q_seasonality, q_burstiness). The skyline is
re-derived by the literal O(n²) dominance definition — the engine runs
a distributed running-max sweep; agreement checks the reduction."""

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


def test_skyline_sweep_matches_quadratic_dominance(spark, sf_dir):
    out = SPECS["q_skyline_sweep"].fn(spark, sf_dir).collect()
    orders = pq.read_table(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_totalprice", "o_orderdate"],
    ).to_pandas()
    cust = orders.groupby("o_custkey").agg(
        spend=("o_totalprice", "sum"), last=("o_orderdate", "max")
    )
    cust["spend"] = cust["spend"].round(2)
    s = cust["spend"].to_numpy()
    d = cust["last"].to_numpy()
    frontier = set()
    for i in range(len(cust)):
        dominated = (
            (s >= s[i])
            & (d >= d[i])
            & ((s > s[i]) | (d > d[i]))
        ).any()
        if not dominated:
            frontier.add(cust.index[i])
    got = {r["o_custkey"] for r in out}
    assert got == frontier
    rows = {r["o_custkey"]: r for r in out}
    for ck in frontier:
        assert rows[ck]["spend"] == pytest.approx(
            cust.loc[ck, "spend"], abs=1e-9
        )
        assert rows[ck]["last_order"] == cust.loc[ck, "last"]
    # output sorted by spend desc
    spends = [r["spend"] for r in out]
    assert spends == sorted(spends, reverse=True)


def test_seasonality_matches_pandas(spark, sf_dir, events):
    out = {
        r["event_type"]: r
        for r in SPECS["q_seasonality"].fn(spark, sf_dir).collect()
    }
    ev = events.copy()
    ev["hour_ts"] = ev["ts"].dt.floor("h")
    bars = (
        ev.sort_values("ts")
        .groupby(["event_type", "hour_ts"], as_index=False)
        .last()[["event_type", "hour_ts", "value"]]
    )
    bars["hod"] = bars["hour_ts"].dt.hour
    for etype, g in bars.groupby("event_type"):
        x = g["value"].to_numpy(np.float64)
        seasonal = g.groupby("hod")["value"].transform("mean").to_numpy()
        resid = x - seasonal
        strength = max(0.0, 1 - resid.var() / x.var())
        r = out[etype]
        assert r["n_bars"] == len(g)
        assert r["var_total"] == pytest.approx(x.var(), rel=1e-6)
        assert r["var_resid"] == pytest.approx(resid.var(), rel=1e-6, abs=1e-6)
        assert r["seasonal_strength"] == pytest.approx(strength, abs=2e-6)
        assert 0.0 <= r["seasonal_strength"] <= 1.0


def test_burstiness_matches_pandas(spark, sf_dir, events):
    out = {
        r["event_type"]: r
        for r in SPECS["q_burstiness"].fn(spark, sf_dir).collect()
    }
    ev = events.copy()
    ev["hour_ts"] = ev["ts"].dt.floor("h")
    hourly = ev.groupby(["event_type", "hour_ts"]).size()
    for etype, g in hourly.groupby(level=0):
        n = g.to_numpy(np.float64)
        mu, sd = n.mean(), n.std()
        r = out[etype]
        assert r["n_hours"] == len(n)
        assert r["mean_per_hour"] == pytest.approx(mu, rel=1e-6)
        assert r["fano"] == pytest.approx(n.var() / mu, rel=1e-5)
        assert r["peak_to_mean"] == pytest.approx(n.max() / mu, rel=1e-6)
        assert r["burstiness"] == pytest.approx(
            (sd - mu) / (sd + mu), abs=2e-6
        )
        assert -1.0 <= r["burstiness"] <= 1.0
