"""Declared-query registry — the single source of truth that
``__spark_entry__.py`` exposes to the driver harness.

Every operator from SURVEY.md §2 registers here with:
  - a Spark callable ``(spark, sf_dir) -> DataFrame``
  - the equivalent DuckDB ANSI SQL (the correctness oracle). Every
    registered query carries one: approximate/engine-specific ops emit
    exact-twin values plus in-engine tolerance verdicts so the oracle can
    state the exact side (the driver has no rows-only fallback).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None = None
    tags: tuple[str, ...] = field(default_factory=tuple)


#: name -> spec; populated by @query decorators at import time.
REGISTRY: dict[str, QuerySpec] = {}

#: name -> "module.qualname" of the registering function — duplicate-name
#: detection (a second definition under an existing name raises).
_REGISTERED_BY: dict[str, str] = {}


def query(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Register a declared query. ``oracle`` is DuckDB SQL or None."""

    def deco(fn: QueryFn) -> QueryFn:
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            from .session import configure

            configure(spark)
            return fn(spark, sf_dir)

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        ident = f"{fn.__module__}.{fn.__qualname__}"
        prev = _REGISTERED_BY.get(name)
        if prev is not None and prev != ident:
            # Same-name registration from a DIFFERENT definition silently
            # replaces — a duplicate op in another module shadows the
            # original and nothing downstream notices (hit twice in
            # round 4). Re-decorating the same function (module
            # re-import) stays legal.
            raise ValueError(
                f"duplicate query name {name!r}: already registered by "
                f"{prev}, now by {ident}"
            )
        _REGISTERED_BY[name] = ident
        REGISTRY[name] = QuerySpec(name=name, fn=wrapped, oracle=oracle, tags=tags)
        return fn

    return deco


def load_all() -> dict[str, QuerySpec]:
    """Import every query-bearing module so REGISTRY is fully populated."""
    from .operators import aggregates, behavior, evaluation, finance, graph, joins, layout, quality, relational, rollup, skew, sqlsurface, stats, tpch, windows  # noqa: F401
    from .functions import datetime as datetime_fns  # noqa: F401
    from .functions import scalar, udfs  # noqa: F401
    from .llm import curation, dedup, similarity, text  # noqa: F401
    from .llm import multimodal  # noqa: F401
    from .sources import custom, files, rest  # noqa: F401
    from . import ingest  # noqa: F401
    from .streaming import jobs, stateful, tws  # noqa: F401
    from .streaming import joins as streaming_joins  # noqa: F401

    return REGISTRY
