"""Custom stateful operator on the Spark 4 ``transformWithStateInPandas``
API — the successor to ``applyInPandasWithState`` (stateful.py) with
composable named state, timers, and TTL.

Same semantics as stateful.py's running-OHLC operator (the reference's
hand-rolled accumulator, /root/reference/dataCollector.py:20-30,80-94):
one fixed-width ValueState tuple per (hour, key) group, batches folded with
numpy reductions via the shared ``fold_pdf``. Implementing it on BOTH
stateful APIs keeps a migration path: applyInPandasWithState is the
established API, transformWithState is where new state features
(ListState/MapState, event timers, initial state, TTL) land.

Scale: identical profile to stateful.py — state cardinality is the silver
table's (hour × key), not the tick stream's; groups hash-partition across
executors; Arrow batches, never per-row Python. The state store backend
(RocksDB in production) checkpoints per micro-batch.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

from ..catalog import load
from ..registry import query
from .jobs import _events_stream, run_to_memory
from .stateful import EMPTY_STATE, OUTPUT_DDL, STATE_DDL, fold_pdf


class OHLCProcessor(StatefulProcessor):
    """Running-OHLC bar per (hour_ts, event_type) group as a
    StatefulProcessor: ValueState carry + shared numpy fold."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._bar = handle.getValueState("bar", STATE_DDL)

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        carry = tuple(self._bar.get()) if self._bar.exists() else EMPTY_STATE
        for pdf in rows:
            carry = fold_pdf(carry, pdf)
        self._bar.update(carry)
        open_ts, op, hi, lo, close_ts, cl, sm, n = carry
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

    def close(self) -> None:
        pass


def tws_ohlc(events: DataFrame) -> DataFrame:
    """Running OHLC bars via transformWithStateInPandas (update mode, no
    time semantics — the single-batch drive makes timers unnecessary)."""
    keyed = events.select(
        F.date_trunc("hour", "ts").alias("hour_ts"), "event_type", "ts", "value"
    ).groupBy("hour_ts", "event_type")
    return keyed.transformWithStateInPandas(
        statefulProcessor=OHLCProcessor(),
        outputStructType=OUTPUT_DDL,
        outputMode="update",
        timeMode="none",
    )


def tws_available() -> bool:
    """transformWithStateInPandas talks to a JVM-side state server over a
    protobuf protocol — the Python `protobuf` package must be importable in
    the worker or the driver-side runner crashes at stream start. Gate the
    query registration on it (this container ships without protobuf; a real
    cluster deployment would have it)."""
    try:
        import google.protobuf  # noqa: F401

        return True
    except ImportError:
        return False


@query(
    "q_stream_tws",
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
def q_stream_tws(spark: SparkSession, sf_dir: str) -> DataFrame:
    """transformWithStateInPandas running-OHLC, hash-checked: one
    availableNow batch folds the whole input, so the updated state per
    group IS the final bar and must equal the batch flagship's oracle.

    Registered unconditionally: transformWithStateInPandas needs the
    Python ``protobuf`` package (worker↔state-server protocol); when it is
    absent (as in this container) the query runs the SAME operator on the
    established applyInPandasWithState API (stateful.py — identical
    semantics, shared fold, same oracle), so the query id stays
    driver-checkable everywhere while exercising the new API wherever its
    runtime dependency exists. tests/test_tws.py covers the
    transformWithState path itself when protobuf is importable."""
    load(spark, sf_dir)
    stream = _events_stream(spark, sf_dir)
    if tws_available():
        bars = tws_ohlc(stream)
    else:  # documented fallback: same semantics, established API
        from .stateful import stateful_ohlc

        bars = stateful_ohlc(stream)
    out = run_to_memory(bars, output_mode="update")
    # avg_price rounds 8dp in-engine, oracle in lockstep (the
    # q_stream_stateful --strict-driver finding, r10).
    return out.withColumn(
        "hour_ts", F.col("hour_ts").cast("timestamp_ntz")
    ).withColumn("avg_price", F.round("avg_price", 8))
