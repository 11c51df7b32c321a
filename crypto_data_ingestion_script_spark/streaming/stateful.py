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


#: q_stream_session_timeout: idle gap that closes a session (event-time).
SESSION_GAP_MIN = 30
_SESSION_GAP_US = SESSION_GAP_MIN * 60 * 1_000_000

SESSION_OUT_DDL = (
    "user_id bigint, session_start timestamp, session_end timestamp, "
    "n_events bigint, emitted_by string"
)
SESSION_STATE_DDL = "start_us long, last_us long, n long"


def _session_update(key, pdfs, state: GroupState):
    """Per-user sessionizer with idle-timeout emission. Two exits per
    session: a GAP exit when a later event of the same user arrives more
    than SESSION_GAP_MIN past the running session's last event (emitted
    inline while folding the batch), and a TIMEOUT exit when the
    event-time watermark passes last_event + gap with no successor —
    the engine wakes this function with hasTimedOut for the idle key.
    State per user is ONE (start, last, n) tuple — bounded by ACTIVE
    keys, not event volume; timed-out state is removed, so the store
    shrinks as users go quiet (the property q_stream_session's built-in
    session_window also has, but owned explicitly here)."""
    if state.hasTimedOut:
        start_us, last_us, n = state.get
        state.remove()
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "session_start": [pd.Timestamp(start_us * 1000)],
                "session_end": [pd.Timestamp(last_us * 1000)],
                "n_events": [n],
                "emitted_by": ["timeout"],
            }
        )
        return
    frames = [pdf for pdf in pdfs if len(pdf)]
    if not frames:
        return
    batch = pd.concat(frames).sort_values(["ts", "event_id"])
    ts_us = (batch["ts"].astype("int64") // 1000).to_numpy()
    carry = tuple(state.get) if state.exists else None
    closed = []
    for t in ts_us:
        t = int(t)
        if carry is None:
            carry = (t, t, 1)
        elif t - carry[1] <= _SESSION_GAP_US:
            carry = (carry[0], max(carry[1], t), carry[2] + 1)
        else:
            closed.append(carry)
            carry = (t, t, 1)
    state.update(carry)
    # Event-time timeout: fire when the watermark passes idle horizon.
    state.setTimeoutTimestamp(carry[1] // 1000 + SESSION_GAP_MIN * 60 * 1000)
    if closed:
        yield pd.DataFrame(
            {
                "user_id": [key[0]] * len(closed),
                "session_start": [pd.Timestamp(c[0] * 1000) for c in closed],
                "session_end": [pd.Timestamp(c[1] * 1000) for c in closed],
                "n_events": [c[2] for c in closed],
                "emitted_by": ["gap"] * len(closed),
            }
        )


def sessionize_with_timeout(events: DataFrame) -> DataFrame:
    """Group an events-shaped stream by user and run the idle-timeout
    sessionizer under GroupStateTimeout.EventTimeTimeout."""
    return (
        events.withWatermark("ts", "1 second")
        .groupBy("user_id")
        .applyInPandasWithState(
            _session_update,
            outputStructType=SESSION_OUT_DDL,
            stateStructType=SESSION_STATE_DDL,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


@query(
    "q_stream_session_timeout",
    oracle=f"""
    WITH seq AS (
      SELECT user_id, ts, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                       > {_SESSION_GAP_US}
                  THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
      SELECT user_id, ts, event_id,
             sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS sid
      FROM seq
    ),
    agg AS (
      SELECT user_id, sid,
             min(ts) AS session_start, max(ts) AS session_end,
             CAST(count(*) AS BIGINT) AS n_events
      FROM sess GROUP BY user_id, sid
    )
    SELECT user_id, session_start, session_end, n_events,
           CASE WHEN sid = max(sid) OVER (PARTITION BY user_id)
                THEN 'timeout' ELSE 'gap' END AS emitted_by
    FROM agg
    """,
    tags=("streaming", "stateful", "session"),
)
def q_stream_session_timeout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming state TTL/timeout (VERDICT r10 task 5): per-user
    sessionization where the ENGINE's GroupStateTimeout machinery — not
    a data row — closes idle sessions. applyInPandasWithState under
    EventTimeTimeout (protobuf-free, unlike the waiver-blocked native
    transformWithState leg): sessions that a successor event closes are
    emitted inline tagged 'gap'; sessions with no successor are emitted
    by the hasTimedOut wake-up tagged 'timeout' once the watermark
    passes last_event + {SESSION_GAP_MIN} min. Delivery (r13 floor cut):
    ONE data micro-batch — the real events PLUS one far-future sentinel
    row (user −1, filtered from output) staged into the same directory —
    then the engine's own trailing watermark-advance batch fires every
    timeout. The sentinel advances the post-batch watermark past every
    open session's idle horizon (sentinel ts − 1 s watermark delay >
    max_ts + gap, since sentinel ts = max_ts + 2·gap); without it the
    final watermark stalls at max(ts) and the engine would never fire.
    The former two-generation mtime-ordered delivery (one batch per
    generation) spent a whole extra micro-batch — ~1 s of state-store
    commits and Arrow round-trips — for ordering the semantics never
    needed: timeouts fire on WATERMARK advancement, not on which batch
    carried the sentinel (profiled in /tmp: 3 batches → 2, walls
    3.5–3.8 s → ~2.5 s; gen0 files are now symlinked, not copied).
    Oracle: batch gaps-and-islands; a user's last session is by
    construction the 'timeout' one.

    Scale shape: state is one fixed tuple per ACTIVE user (removed on
    timeout — the store shrinks as users go idle); groups hash across
    executors; batches arrive as Arrow. The islands fold is per-user
    within a micro-batch, never global."""
    import shutil
    import tempfile

    t = load(spark, sf_dir)

    indir = tempfile.mkdtemp(prefix="sess_to_")
    try:
        return _run_session_timeout(spark, sf_dir, t, indir)
    finally:
        # The memory sink holds every row once run_to_memory's
        # awaitTermination returns, so the staged input copies are dead
        # weight — sweeps invoke registered queries repeatedly and the
        # leaked copies accumulate whole events datasets in /tmp
        # (ADVICE r12).
        shutil.rmtree(indir, ignore_errors=True)


def _run_session_timeout(spark, sf_dir, t, indir):
    import os
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from .jobs import _stream_events_from

    src = os.path.join(sf_dir, "events.parquet")

    def _stage(path: str, dst: str) -> None:
        # Single-batch delivery: mtime ordering no longer matters, so
        # symlink instead of copying (the copy was sf-proportional I/O).
        try:
            os.symlink(os.path.abspath(path), dst)
        except OSError:
            shutil.copy(path, dst)

    # The real events (any number of part files) ...
    if os.path.isdir(src):
        import glob as _glob

        parts = sorted(_glob.glob(os.path.join(src, "*.parquet")))
        for i, f in enumerate(parts):
            _stage(f, os.path.join(indir, f"gen0_{i:04d}.parquet"))
    else:
        _stage(src, os.path.join(indir, "gen0.parquet"))
    # ... plus one sentinel far past every session's idle horizon,
    # delivered in the SAME micro-batch (see docstring).
    max_ts = t.events.agg(F.max("ts")).collect()[0][0]
    sentinel = t.events.limit(1).select(
        F.lit(-1).cast("bigint").alias("event_id"),
        (
            F.lit(max_ts).cast("timestamp_ntz")
            + F.expr(f"INTERVAL {SESSION_GAP_MIN * 2} MINUTES")
        ).alias("ts"),
        F.lit(-1).cast("bigint").alias("user_id"),
        F.lit("sentinel").alias("event_type"),
        F.lit(0.0).alias("value"),
        F.lit("{}").alias("props"),
    )
    sent_dir = tempfile.mkdtemp(prefix="sess_sent_")
    try:
        sentinel.coalesce(1).write.mode("overwrite").parquet(sent_dir)
        spart = [
            f for f in os.listdir(sent_dir) if f.endswith(".parquet")
        ][0]
        shutil.copy(
            os.path.join(sent_dir, spart),
            os.path.join(indir, "sentinel.parquet"),
        )
    finally:
        shutil.rmtree(sent_dir, ignore_errors=True)

    stream = _stream_events_from(spark, indir, src)
    out = run_to_memory(sessionize_with_timeout(stream), output_mode="append")
    return out.filter(F.col("user_id") >= 0).select(
        "user_id",
        F.col("session_start").cast("timestamp_ntz").alias("session_start"),
        F.col("session_end").cast("timestamp_ntz").alias("session_end"),
        "n_events",
        "emitted_by",
    )
