"""Custom stateful streaming operator: running OHLC state per (hour, key)
via ``applyInPandasWithState`` (SURVEY §2.D; task north-star "custom
stateful operators").

This is the reference's hand-rolled accumulator
(/root/reference/dataCollector.py:20-30 state shape, :80-94 update function,
:166-175 reset) made explicit as a Spark stateful operator — where the
built-in ``groupBy(window(...)).agg(...)`` (streaming/jobs.py) hides the
state entirely, this operator *owns* it: user-defined state tuple, update
function over Arrow record batches, engine-managed fault-tolerant state
store, event-time timeout in place of the reference's wall-clock reset.

Use the built-in windowed agg in production — it gets partial aggregation
and state-store compaction for free. This operator is the template for
semantics the built-ins can't express (e.g. open = first *non-zero* price,
the reference's falsy-test quirk at dataCollector.py:83, which no built-in
aggregate reproduces; ``running_nonzero_open=True`` implements exactly that
for parity demonstrations).

Scale: state is one fixed-width tuple per (hour, key) group — the same
cardinality as the silver table, not the tick stream; batches arrive as
Arrow, never per-row Python. Groups are hash-partitioned across executors
by the engine; a 1000-executor cluster holds 1/1000th of the keys each.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

#: Output row: one OHLC bar per (hour_ts, key) group — reference silver shape.
OUTPUT_DDL = (
    "hour_ts timestamp, event_type string, open_price double, "
    "high_price double, low_price double, close_price double, "
    "avg_price double, sample_count bigint"
)

#: State tuple: (open_ts_us, open, high, low, close_ts_us, close, sum, n) —
#: the reference's running_metrics dict (dataCollector.py:20-30) as a
#: fixed-width tuple the state store serializes compactly.
STATE_DDL = (
    "open_ts long, open double, high double, low double, "
    "close_ts long, close double, sum double, n long"
)


#: Empty carry: (open_ts, open, high, low, close_ts, close, sum, n).
EMPTY_STATE: tuple = (None, None, None, None, None, None, None, 0)


def fold_pdf(carry: tuple, pdf: pd.DataFrame, nonzero_open: bool = False) -> tuple:
    """Merge one Arrow batch into the running OHLC carry tuple — shared by
    both stateful APIs (applyInPandasWithState here, transformWithState in
    tws.py). Batch-wise numpy reductions, no per-row Python."""
    open_ts, op, hi, lo, close_ts, cl, sm, n = carry
    if len(pdf) == 0:
        return carry
    # datetime64[ns] int view is nanoseconds; keep microseconds like Spark
    ts_us = (pdf["ts"].astype("int64") // 1000).to_numpy()
    vals = pdf["value"].astype("float64").to_numpy()
    # open = earliest-by-event-time; in nonzero_open parity mode a price
    # of 0.0 can never become the open (dataCollector.py:83).
    open_mask = vals != 0.0 if nonzero_open else slice(None)
    o_ts, o_vals = ts_us[open_mask], vals[open_mask]
    if len(o_vals):
        i = int(o_ts.argmin())
        if op is None or o_ts[i] < open_ts:
            open_ts, op = int(o_ts[i]), float(o_vals[i])
    j = int(ts_us.argmax())
    if close_ts is None or ts_us[j] > close_ts:
        close_ts, cl = int(ts_us[j]), float(vals[j])
    bmax, bmin, bsum = float(vals.max()), float(vals.min()), float(vals.sum())
    hi = bmax if hi is None else max(hi, bmax)
    lo = bmin if lo is None else min(lo, bmin)
    sm = bsum if sm is None else sm + bsum
    n += len(vals)
    return (open_ts, op, hi, lo, close_ts, cl, sm, n)


def _update_ohlc_state(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
    nonzero_open: bool = False,
) -> Iterator[pd.DataFrame]:
    """Fold this micro-batch's rows for one (hour_ts, key) group into the
    running state and emit the updated bar (update semantics)."""
    carry = tuple(state.get) if state.exists else EMPTY_STATE
    for pdf in pdfs:
        carry = fold_pdf(carry, pdf, nonzero_open=nonzero_open)
    open_ts, op, hi, lo, close_ts, cl, sm, n = carry

    state.update((open_ts, op, hi, lo, close_ts, cl, sm, n))
    hour_ts, event_type = key
    yield pd.DataFrame(
        {
            "hour_ts": [pd.Timestamp(hour_ts)],
            "event_type": [event_type],
            "open_price": [op],
            "high_price": [hi],
            "low_price": [lo],
            "close_price": [cl],
            "avg_price": [sm / n if n else None],
            "sample_count": [n],
        }
    )


def stateful_ohlc(events: DataFrame, nonzero_open: bool = False) -> DataFrame:
    """Running OHLC bars with user-owned state: group by (hour bucket, key),
    fold each micro-batch through `_update_ohlc_state`.

    ``nonzero_open=True`` reproduces the reference's open = first *non-zero*
    price quirk (dataCollector.py:83) — the case a custom stateful operator
    exists for, since no built-in aggregate expresses it.
    """
    from pyspark.sql import functions as F

    def fn(key, pdfs, state):
        return _update_ohlc_state(key, pdfs, state, nonzero_open=nonzero_open)

    keyed = events.select(
        F.date_trunc("hour", "ts").alias("hour_ts"), "event_type", "ts", "value"
    ).groupBy("hour_ts", "event_type")
    return keyed.applyInPandasWithState(
        fn,
        outputStructType=OUTPUT_DDL,
        stateStructType=STATE_DDL,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


from pyspark.sql import SparkSession  # noqa: E402

from ..catalog import load  # noqa: E402
from ..registry import query  # noqa: E402
from .jobs import _events_stream, run_to_memory  # noqa: E402


@query(
    "q_stream_stateful",
    oracle="""
    SELECT date_trunc('hour', ts)   AS hour_ts,
           event_type,
           arg_min(value, ts)       AS open_price,
           max(value)               AS high_price,
           min(value)               AS low_price,
           arg_max(value, ts)       AS close_price,
           round(avg(value), 8)     AS avg_price,
           count(*)                 AS sample_count
    FROM events
    GROUP BY 1, 2
    """,
    tags=("streaming", "stateful"),
)
def q_stream_stateful(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful operator, hash-checked: the events parquet driven
    through applyInPandasWithState running-OHLC state; with the whole input
    in one availableNow batch, the updated state per group IS the final bar,
    so the output must equal the batch flagship's oracle exactly."""
    from pyspark.sql import functions as F

    load(spark, sf_dir)
    bars = stateful_ohlc(_events_stream(spark, sf_dir))
    out = run_to_memory(bars, output_mode="update")
    # avg_price rounds 8dp IN-ENGINE, oracle in lockstep: raw averages of
    # cents-grain prices land on exact 7-decimal values, and ~1e-15
    # summation-order drift across engines flips a 6dp canonical hash
    # while tolerance compares pass (--strict-driver finding, r10 sf0.1).
    return out.withColumn(
        "hour_ts", F.col("hour_ts").cast("timestamp_ntz")
    ).withColumn("avg_price", F.round("avg_price", 8))
