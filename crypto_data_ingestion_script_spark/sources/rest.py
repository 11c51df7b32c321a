"""REST API tick source (SURVEY §2.A) — the reference's ingestion entry
point (/root/reference/dataCollector.py:97-117: per-symbol HTTP GET to the
Binance ticker endpoint, JSON ``{price: str}``, cast, stamp, project),
re-expressed for a cluster.

Architecture: the symbol list is a DataFrame; the fetch runs *on executors*
via ``mapInPandas`` — a thousand-symbol universe fans out across the
cluster instead of the reference's sequential driver loop. The HTTP call is
isolated behind ``fetch_fn`` so tests/CI inject a deterministic simulator
(no network in this container); the Spark plumbing — schema, partitioning,
batch shape, error tolerance — is identical either way.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import query
from ..schemas import TICKS

#: The reference's universe (dataCollector.py:16) — default, not a limit.
DEFAULT_SYMBOLS = ["BTCUSDT", "ETHUSDT", "LTCBTC"]

TICK_DDL = "ts timestamp_ntz, symbol string, price double"


#: The reference's public endpoint (dataCollector.py:18) — overridable so
#: the real urllib path is testable against a localhost stub (no external
#: network in CI; tests/test_rest_retry.py spins up http.server and drives
#: this exact function end-to-end: GET, non-2xx raise, JSON parse, cast).
DEFAULT_BASE_URL = "https://api.binance.com/api/v3/ticker/price"


def http_fetch(symbol: str, base_url: str = DEFAULT_BASE_URL) -> float:
    """Real fetch path (one symbol → latest price). Mirrors the reference's
    GET + raise_for_status + float cast (dataCollector.py:102-105):
    ``urlopen`` raises ``HTTPError`` on any non-2xx status, which is
    exactly requests' ``raise_for_status`` contract."""
    import json
    import urllib.request

    url = f"{base_url}?symbol={symbol}"
    with urllib.request.urlopen(url, timeout=10) as resp:
        return float(json.load(resp)["price"])


def fetch_ticks(
    spark: SparkSession,
    symbols: list[str] | None = None,
    fetch_fn: Callable[[str], float] = http_fetch,
    ingest_ts=None,
) -> DataFrame:
    """Distributed poll: one row per symbol with price + ingest timestamp.

    Per-row error tolerance exactly like the reference (failed symbol →
    skipped, others survive; dataCollector.py:115-116): exceptions inside
    the batch drop that row only.
    """
    symbols = symbols or DEFAULT_SYMBOLS
    sym_df = spark.createDataFrame(
        [(s,) for s in symbols], "symbol string"
    ).repartition(min(len(symbols), 32))

    def poll(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import datetime as dt

        for pdf in batches:
            rows = []
            now = ingest_ts or dt.datetime.now(dt.timezone.utc).replace(tzinfo=None)
            for s in pdf["symbol"]:
                try:
                    rows.append((now, s, float(fetch_fn(s))))
                except Exception:
                    continue  # row-level tolerance: skip symbol, keep rest
            yield pd.DataFrame(rows, columns=["ts", "symbol", "price"])

    return sym_df.mapInPandas(poll, schema=TICK_DDL)


def _duck_src(sf_dir: str) -> str:
    """DuckDB source expression for the events table under either layout:
    single file or a directory of part files (production multi-file)."""
    import os

    path = os.path.join(sf_dir, "events.parquet")
    if os.path.isdir(path):
        return f"read_parquet('{path}/*.parquet')"
    return f"'{path}'"


def simulated_fetch_from_events(sf_dir: str) -> Callable[[str], float]:
    """Deterministic offline stand-in for the HTTP endpoint, derived from
    the events table (price = value of the symbol's hashed bucket)."""
    import duckdb

    con = duckdb.connect()
    prices = dict(
        con.execute(
            f"SELECT event_type, round(avg(value), 6) FROM "
            f"{_duck_src(sf_dir)} GROUP BY event_type"
        ).fetchall()
    )
    con.close()
    keys = sorted(prices)

    def fetch(symbol: str) -> float:
        if symbol.endswith("FAIL"):  # deterministic failure injection
            raise ConnectionError(f"simulated fetch failure for {symbol}")
        # sum-of-ordinals, not hash(): PYTHONHASHSEED varies per executor.
        bucket = sum(ord(c) for c in symbol) % len(keys)
        return prices[keys[bucket]] + len(symbol)

    return fetch


@query(
    "q_source_ingest",
    oracle="""
    WITH px AS (
      SELECT round(avg(value), 6) AS p,
             row_number() OVER (ORDER BY event_type) - 1 AS idx,
             count(*) OVER () AS n_keys
      FROM events GROUP BY event_type
    ),
    syms AS (SELECT unnest(['BTCUSDT', 'ETHUSDT', 'LTCBTC']) AS symbol)
    SELECT TIMESTAMP '2024-01-15 12:00:00' AS ts, s.symbol,
           px.p + length(s.symbol) AS price
    FROM syms s JOIN px
      ON px.idx = list_sum(list_transform(str_split(s.symbol, ''),
                                          c -> unicode(c))) % px.n_keys
    """,
    tags=("source", "ingest"),
)
def q_source_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simulated REST poll cycle: symbol table → executor-side fetch →
    tick rows through the real mapInPandas plumbing, including a failing
    symbol that must be skipped (row-level tolerance). The simulated
    endpoint is deterministic (bucketed per-type average + symbol
    length), so the oracle reproduces the exact fetched values in SQL —
    the ingest path is value-checked, not just row-counted; only the
    injected XXXFAIL symbol is absent from both sides."""
    import datetime as dt

    load(spark, sf_dir)
    fixed_ts = dt.datetime(2024, 1, 15, 12, 0, 0)
    return fetch_ticks(
        spark,
        symbols=DEFAULT_SYMBOLS + ["XXXFAIL"],
        fetch_fn=simulated_fetch_from_events(sf_dir),
        ingest_ts=fixed_ts,
    )


def with_retry(
    fetch_fn: Callable[[str], float],
    attempts: int = 3,
    base_delay_s: float = 0.5,
    sleep: Callable[[float], None] | None = None,
) -> Callable[[str], float]:
    """Exponential-backoff retry around a fetch — the resilience layer the
    reference acknowledges it lacks (README.md:33-36,45: no rate-limit
    handling, no retry; a failed poll is silently dropped). Delay doubles
    per attempt (base, 2·base, 4·base …); the final failure re-raises so
    the caller's row-level tolerance still applies. ``sleep`` is injectable
    so tests run with zero wall-clock delay."""
    import time

    do_sleep = sleep if sleep is not None else time.sleep

    def fetch(symbol: str) -> float:
        delay = base_delay_s
        for attempt in range(attempts):
            try:
                return fetch_fn(symbol)
            except Exception:
                if attempt == attempts - 1:
                    raise
                do_sleep(delay)
                delay *= 2
        raise AssertionError("unreachable")

    return fetch


def flaky_fetch(
    inner: Callable[[str], float], fail_first: int = 2
) -> Callable[[str], float]:
    """Deterministic transient-failure simulator: the first ``fail_first``
    calls per symbol raise, later calls succeed — models rate-limit 429s."""
    counts: dict[str, int] = {}

    def fetch(symbol: str) -> float:
        n = counts.get(symbol, 0)
        counts[symbol] = n + 1
        if n < fail_first:
            raise ConnectionError(f"simulated transient failure #{n} for {symbol}")
        return inner(symbol)

    return fetch


@query(
    "q_source_ingest_retry",
    oracle="""
    WITH px AS (
      SELECT round(avg(value), 6) AS p,
             row_number() OVER (ORDER BY event_type) - 1 AS idx,
             count(*) OVER () AS n_keys
      FROM events GROUP BY event_type
    ),
    syms AS (SELECT unnest(['BTCUSDT', 'ETHUSDT', 'LTCBTC']) AS symbol)
    SELECT TIMESTAMP '2024-01-15 12:00:00' AS ts, s.symbol,
           px.p + length(s.symbol) AS price
    FROM syms s JOIN px
      ON px.idx = list_sum(list_transform(str_split(s.symbol, ''),
                                          c -> unicode(c))) % px.n_keys
    """,
    tags=("source", "ingest"),
)
def q_source_ingest_retry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poll cycle against a transiently-failing endpoint (every symbol 429s
    twice, then succeeds) with exponential-backoff retry: every symbol must
    survive — where the reference (and q_source_ingest's bare path) would
    have dropped the row. The oracle is the SAME full fetched-value set as
    q_source_ingest: under retry, transient failure must be invisible in
    the output. tests/test_rest_retry.py asserts the without-retry path
    actually loses rows, so this equality is not vacuous."""
    import datetime as dt

    load(spark, sf_dir)
    fixed_ts = dt.datetime(2024, 1, 15, 12, 0, 0)
    base = simulated_fetch_from_events(sf_dir)
    # fail_first < attempts, and the flaky counter lives inside the Python
    # worker that executes the symbol's batch, so retries see its state.
    resilient = with_retry(
        flaky_fetch(base, fail_first=2), attempts=3, sleep=lambda _s: None
    )
    return fetch_ticks(
        spark, symbols=DEFAULT_SYMBOLS, fetch_fn=resilient, ingest_ts=fixed_ts
    )
