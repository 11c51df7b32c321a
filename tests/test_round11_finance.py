"""Independent-recomputation tests for the round-11 finance batch
(q_macd, q_stochastic, q_donchian, q_rolling_beta), re-derived from raw
sf0.001 parquet with pandas. q_macd is the strongest check: the engine
evaluates the EMA CLOSED FORM via a bar-pair join, while pandas
``ewm(adjust=False)`` runs the literal recursion EMA_t = a·x_t +
(1−a)·EMA_{t−1} — different algorithm, same numbers required.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

from crypto_data_ingestion_script_spark.operators.finance import (
    BETA_W,
    DONCH_W,
    MACD_FAST,
    MACD_SIGNAL,
    MACD_SLOW,
    STOCH_D,
    STOCH_W,
)
from crypto_data_ingestion_script_spark.registry import load_all

SPECS = load_all()


@pytest.fixture(scope="module")
def bars(sf_dir) -> pd.DataFrame:
    ev = pq.read_table(f"{sf_dir}/events.parquet").to_pandas()
    ev["hour_ts"] = ev["ts"].dt.floor("h")
    b = (
        ev.sort_values("ts")
        .groupby(["event_type", "hour_ts"], as_index=False)
        .last()[["event_type", "hour_ts", "value"]]
        .rename(columns={"value": "close"})
        .sort_values(["event_type", "hour_ts"])
    )
    return b


def test_macd_matches_pandas_ewm(spark, sf_dir, bars):
    out = SPECS["q_macd"].fn(spark, sf_dir).toPandas()
    for etype, g in bars.groupby("event_type"):
        close = g.set_index("hour_ts")["close"]
        fast = close.ewm(span=MACD_FAST, adjust=False).mean()
        slow = close.ewm(span=MACD_SLOW, adjust=False).mean()
        macd8 = (fast - slow).round(8)
        signal = macd8.ewm(span=MACD_SIGNAL, adjust=False).mean()
        got = out[out.event_type == etype].set_index("hour_ts")
        assert len(got) == len(close)
        np.testing.assert_allclose(
            got["macd"].to_numpy(), macd8.round(6).to_numpy(), atol=2e-6
        )
        np.testing.assert_allclose(
            got["signal"].to_numpy(), signal.to_numpy(), atol=2e-6
        )
        np.testing.assert_allclose(
            got["histogram"].to_numpy(),
            (macd8 - signal).to_numpy(),
            atol=4e-6,
        )


def test_stochastic_matches_pandas(spark, sf_dir, bars):
    out = SPECS["q_stochastic"].fn(spark, sf_dir).toPandas()
    for etype, g in bars.groupby("event_type"):
        close = g.set_index("hour_ts")["close"]
        low = close.rolling(STOCH_W).min()
        high = close.rolling(STOCH_W).max()
        k = 100.0 * (close - low) / (high - low)
        k = k.iloc[STOCH_W - 1 :]
        d = k.rolling(STOCH_D, min_periods=1).mean()
        got = out[out.event_type == etype].set_index("hour_ts")
        assert len(got) == len(k)
        np.testing.assert_allclose(
            got["pct_k"].to_numpy(), k.to_numpy(), atol=2e-6
        )
        np.testing.assert_allclose(
            got["pct_d"].to_numpy(), d.to_numpy(), atol=2e-6
        )


def test_donchian_matches_pandas(spark, sf_dir, bars):
    out = SPECS["q_donchian"].fn(spark, sf_dir).toPandas()
    for etype, g in bars.groupby("event_type"):
        close = g.set_index("hour_ts")["close"]
        upper = close.rolling(DONCH_W).max()
        lower = close.rolling(DONCH_W).min()
        upper_prev = close.rolling(DONCH_W).max().shift(1)
        lower_prev = close.rolling(DONCH_W).min().shift(1)
        keep = np.arange(len(close)) >= DONCH_W  # rn > DONCH_W (1-based)
        got = out[out.event_type == etype].set_index("hour_ts")
        assert len(got) == int(keep.sum())
        np.testing.assert_allclose(
            got["upper_ch"].to_numpy(), upper[keep].to_numpy()
        )
        np.testing.assert_allclose(
            got["lower_ch"].to_numpy(), lower[keep].to_numpy()
        )
        np.testing.assert_allclose(
            got["width"].to_numpy(),
            (upper - lower)[keep].round(6).to_numpy(),
            atol=2e-6,
        )
        assert (
            got["breakout_up"].to_numpy()
            == (close > upper_prev)[keep].to_numpy()
        ).all()
        assert (
            got["breakout_dn"].to_numpy()
            == (close < lower_prev)[keep].to_numpy()
        ).all()


def test_rolling_beta_matches_pandas(spark, sf_dir, bars):
    out = SPECS["q_rolling_beta"].fn(spark, sf_dir).toPandas()
    rets = bars.copy()
    rets["ret"] = rets.groupby("event_type")["close"].transform(
        lambda c: c / c.shift(1) - 1
    )
    rets = rets.dropna(subset=["ret"])
    mkt = rets.groupby("hour_ts")["ret"].mean().rename("mret")
    rets = rets.join(mkt, on="hour_ts")
    for etype, g in rets.groupby("event_type"):
        g = g.sort_values("hour_ts").set_index("hour_ts")
        # beta via population cov/var over each full trailing window
        betas, alphas, idxs = [], [], []
        r = g["ret"].to_numpy()
        m = g["mret"].to_numpy()
        for i in range(BETA_W - 1, len(g)):
            rr = r[i - BETA_W + 1 : i + 1]
            mm = m[i - BETA_W + 1 : i + 1]
            b = np.cov(rr, mm, bias=True)[0, 1] / np.var(mm)
            betas.append(b)
            alphas.append(rr.mean() - b * mm.mean())
            idxs.append(g.index[i])
        got = out[out.event_type == etype].set_index("hour_ts")
        assert list(got.index) == idxs
        np.testing.assert_allclose(
            got["beta"].to_numpy(), np.array(betas), atol=2e-6
        )
        np.testing.assert_allclose(
            got["alpha"].to_numpy(), np.array(alphas), atol=2e-6
        )


def test_macd_seq_equals_pair_join_form(spark, sf_dir):
    """q_macd_seq (O(n)-per-series Arrow-batch recursion, the unbounded-
    series escape path) must emit EXACTLY the pair-join closed form's
    rows on the shared fixture — same rounding pipeline, same seeded
    recursion algebra."""
    seq = sorted(
        tuple(r) for r in SPECS["q_macd_seq"].fn(spark, sf_dir).collect()
    )
    pair = sorted(
        tuple(r) for r in SPECS["q_macd"].fn(spark, sf_dir).collect()
    )
    assert len(seq) > 0
    assert seq == pair
