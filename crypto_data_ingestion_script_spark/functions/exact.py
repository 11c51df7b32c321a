"""Order-independent exact accumulation for money-grain doubles — the
structural fix for the r10/r12 rounding-contract class.

The problem (measured, round 12): a float SUM's last ulps depend on
reduction order, and reduction order depends on partitioning —
``sum(l_extendedprice)`` over sf0.01 lineitem returns three different
doubles under three different repartitions. Cross-engine hash equality
for unrounded double aggregates therefore rests on Spark and DuckDB
happening to reduce the same stable scan order — exactly the silent
class that produced r10's six hash divergences, and one AQE re-plan
away from recurring. Post-hoc rounding cannot fix it at money
magnitude: a 5e8 sum has ulp 6e-8, so even 6dp rounding sits BELOW the
drift.

The fix: accumulate in DECIMAL. Source money columns are fixed-point
by contract (TPC-H prices/discounts/balances are 2dp; derived per-row
products like extendedprice·(1−disc)·(1+tax) have ≤6dp), so casting
each per-row double to DECIMAL(18,6) — a deterministic half-up round
of a deterministic per-row value, identical on both engines — and
summing in exact integer decimal arithmetic yields the SAME decimal
regardless of partitioning, shuffle order, or engine. Cast back to
double for the declared output schema: nearest-double of identical
decimals is identical. Spark widens sum(DECIMAL(18,6)) to DECIMAL(28,6)
(1e22 headroom) and keeps the per-row value in its compact-long fast
path (precision <= 18 stores the unscaled value in a primitive long,
no BigDecimal allocation per row); DuckDB accumulates in int128. The DuckDB twin of :func:`dsum` / :func:`davg`
is ``CAST(sum(CAST(x AS DECIMAL(18,6))) AS DOUBLE)`` /
``... / count(x)``.
"""
from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: One decimal type for every money-grain per-row cast: 6 fractional
#: digits covers raw 2dp values and 2-/3-factor per-row products; 12
#: integer digits cover any per-row money value, and precision 18
#: keeps Spark in the compact-long decimal fast path (the SUM result
#: widens to decimal(28,6) — 1e22 headroom for corpus totals).
MONEY = "decimal(18,6)"


def dsum(col) -> Column:
    """Exact order-independent sum of a money-grain double column,
    returned as double. See module docstring for the determinism
    argument; DuckDB twin: CAST(sum(CAST(x AS DECIMAL(18,6))) AS
    DOUBLE)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(MONEY)).cast("double")


def davg(col) -> Column:
    """Exact-numerator average of a money-grain double column: exact
    decimal sum cast to double, divided by the non-null count — one
    deterministic IEEE division of identical operands on both engines.
    DuckDB twin: CAST(sum(CAST(x AS DECIMAL(18,6))) AS DOUBLE) /
    count(x)."""
    c = F.col(col) if isinstance(col, str) else col
    return dsum(c) / F.count(c)


def sql_dsum(expr: str) -> str:
    """DuckDB-side twin of :func:`dsum` for oracle strings."""
    return f"CAST(sum(CAST({expr} AS DECIMAL(18,6))) AS DOUBLE)"


def sql_davg(expr: str) -> str:
    """DuckDB-side twin of :func:`davg` for oracle strings."""
    return f"({sql_dsum(expr)} / count({expr}))"
