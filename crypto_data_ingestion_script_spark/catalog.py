"""Table catalog: lazy parquet loaders over a scale-factor directory.

All declared queries take ``(spark, sf_dir)``; this module turns that into
cached DataFrame handles. Reads are plain ``spark.read.parquet`` — column
pruning and predicate pushdown then reach the scan for free (Catalyst
``PruneFileSourcePartitions`` / parquet filters), which is the load-bearing
property at the 100 TB design point.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

#: Columns stored as parquet TIMESTAMP(NANOS): read as nano-longs (see
#: session.RUNTIME_CONFS) and normalized here to microsecond timestamp_ntz —
#: wall-clock semantics identical to the DuckDB oracle's ns→us truncation.
_NANO_TS_COLS: dict[str, tuple[str, ...]] = {"events": ("ts",)}


class Catalog:
    """Lazy per-table parquet reader bound to one (spark, sf_dir) pair."""

    def __init__(self, spark: SparkSession, sf_dir: str):
        self.spark = spark
        self.sf_dir = sf_dir
        self._cache: dict[str, DataFrame] = {}

    def table(self, name: str) -> DataFrame:
        if name not in self._cache:
            if name not in TABLE_NAMES:
                raise KeyError(f"unknown table {name!r}")
            path = os.path.join(self.sf_dir, f"{name}.parquet")
            df = self.spark.read.parquet(path)
            for c in _NANO_TS_COLS.get(name, ()):
                if c in df.columns and dict(df.dtypes)[c] == "bigint":
                    df = df.withColumn(
                        c,
                        F.expr(f"cast(timestamp_micros({c} div 1000) as timestamp_ntz)"),
                    )
            self._cache[name] = df
        return self._cache[name]

    def __getattr__(self, name: str) -> DataFrame:
        if name in TABLE_NAMES:
            return self.table(name)
        raise AttributeError(name)

    def register_views(self) -> None:
        """Register every table as a temp view for spark.sql queries."""
        for name in TABLE_NAMES:
            self.table(name).createOrReplaceTempView(name)


#: Catalog per (session, sf_dir): DataFrame handles are immutable logical
#: plans, so reuse is safe and skips re-listing files + re-reading parquet
#: footers for schema on every query call. Keyed by the live session object;
#: a new session gets a fresh catalog.
_CATALOGS: dict[tuple[int, str], Catalog] = {}


def load(spark: SparkSession, sf_dir: str) -> Catalog:
    from .session import configure

    configure(spark)
    key = (id(spark), sf_dir)
    cat = _CATALOGS.get(key)
    if cat is None or cat.spark is not spark:
        cat = _CATALOGS[key] = Catalog(spark, sf_dir)
    return cat
