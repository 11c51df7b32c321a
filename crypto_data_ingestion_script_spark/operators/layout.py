"""Multi-dimensional data layout: z-order (Morton) clustering for the lake
(SURVEY §2.A sinks; OPTIMIZE ZORDER analog from stock Spark ops).

A date-partitioned table clusters one dimension; any predicate on a second
dimension reads every file. Interleaving the bits of two (or more) quantized
columns into a single sort key gives every dimension ~sqrt locality: a box
predicate on d dims touches ~N^(1-1/d) of N files instead of all of them —
at 100 TB that is the difference between a 10-file and a 10,000-file scan
for point-ish lookups on the non-partition dimension. File-level min/max
stats (parquet footers) then prune untouched files for free.

Everything is JVM-side expression work: the interleave is a fold of
shift/and/or column expressions (whole-stage-codegen-able), the placement is
``repartitionByRange`` + ``sortWithinPartitions`` on the z key — no UDF, no
driver loop. tests/test_layout.py measures the actual pruning win against a
single-dimension sort with pyarrow footer stats.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import query

#: Bits per dimension: 2 dims × 16 bits = 32-bit z key, plenty for file-level
#: clustering (file count ≪ 2^16 per partition in any sane layout).
BITS = 16


def interleave_bits(x: Column, y: Column, bits: int = BITS) -> Column:
    """Morton-interleave two non-negative int columns: bit i of ``x`` lands
    at position 2i, bit i of ``y`` at 2i+1. Pure column expressions — the
    whole key compiles into one codegen stage."""
    # Work in BIGINT: bit position 2*bits-1 = 31 would land on the Int32
    # sign bit and flip the top quadrant's ordering negative.
    pairs = [
        F.shiftleft(
            F.shiftrightunsigned(c.cast("long"), i).bitwiseAND(F.lit(1)),
            2 * i + off,
        )
        for i in range(bits)
        for off, c in ((0, x), (1, y))
    ]
    return reduce(lambda a, b: a.bitwiseOR(b), pairs).alias("_z")


def quantize(col: Column, lo: Column, hi: Column, bits: int = BITS) -> Column:
    """Scale a numeric column onto the [0, 2^bits) integer grid given its
    (broadcast) min/max — rank-free quantization, one pass."""
    span = F.when(hi > lo, hi - lo).otherwise(F.lit(1.0))
    frac = (col.cast("double") - lo) / span
    return F.least(
        F.lit((1 << bits) - 1),
        F.greatest(F.lit(0), F.floor(frac * ((1 << bits) - 1)).cast("int")),
    )


def zorder_write(
    df: DataFrame, dims: tuple[str, str], path: str, n_files: int
) -> None:
    """Write ``df`` clustered on the z-curve over two dimension columns:
    quantize each dim against its global min/max (one tiny aggregate,
    broadcast back), range-partition on the z key so each output file owns
    a contiguous z range, sort within files so parquet row-group stats are
    tight, then drop the helper key before writing."""
    dx, dy = dims
    bounds = df.agg(
        F.min(dx).alias("_lox"), F.max(dx).alias("_hix"),
        F.min(dy).alias("_loy"), F.max(dy).alias("_hiy"),
    )
    keyed = (
        df.join(F.broadcast(bounds))
        .withColumn(
            "_z",
            interleave_bits(
                quantize(F.col(dx), F.col("_lox"), F.col("_hix")),
                quantize(F.col(dy), F.col("_loy"), F.col("_hiy")),
            ),
        )
        .drop("_lox", "_hix", "_loy", "_hiy")
    )
    (
        keyed.repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )


@query(
    "q_zorder",
    oracle="""
    SELECT event_id, user_id, value FROM events
    """,
    tags=("layout", "sink"),
)
def q_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order rewrite of events on (user_id, value): the layout op must be
    content-lossless — the oracle checks the rewritten table IS the source
    projection; the pruning win is asserted separately in
    tests/test_layout.py with parquet footer stats."""
    import tempfile

    t = load(spark, sf_dir)
    out = tempfile.mkdtemp(prefix="zorder_") + "/events_z"
    src = t.events.select("event_id", "user_id", "value")
    zorder_write(src, ("user_id", "value"), out, n_files=16)
    return spark.read.parquet(out)


@query(
    "q_join_bucketed",
    oracle="""
    SELECT o.o_orderkey, o.o_orderdate, o.o_totalprice,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue,
           count(*) AS n_lines
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_totalprice > 150000
    GROUP BY o.o_orderkey, o.o_orderdate, o.o_totalprice
    """,
    tags=("layout", "join"),
)
def q_join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-fact join over BUCKETED tables: both sides are written
    ``bucketBy(8, join_key).sortBy(join_key)`` so the join runs with no
    Exchange and no Sort on either side — the shuffle is paid once at
    write time and amortized over every subsequent join on that key. At
    100 TB this is the difference between re-shuffling 100 TB per query
    and a local merge per bucket pair. tests/test_bucketing.py asserts the
    no-Exchange plan property; this query asserts the RESULT is identical
    to the plain join (the oracle joins the raw parquet).

    The write repartitions each side by the join key first so every bucket
    is a single file (otherwise each of the N writing tasks emits its own
    fragment per bucket -> N*8 small files, and the reader must merge-sort
    fragments to keep the per-bucket sort guarantee).
    """
    import os
    import re
    import tempfile

    t = load(spark, sf_dir)
    tag = re.sub(r"\W", "_", sf_dir).strip("_")
    db = "bucketed_q_" + tag
    # External-path tables: a stale warehouse dir from a previous session
    # would make managed-table creation fail with LOCATION_ALREADY_EXISTS;
    # an explicit location + overwrite mode is restart-safe.
    base = os.path.join(tempfile.gettempdir(), "bucketed_q", tag)
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {db}")
    for name, df, key in (
        ("orders_b", t.orders, "o_orderkey"),
        ("lineitem_b", t.lineitem, "l_orderkey"),
    ):
        if not spark.catalog.tableExists(f"{db}.{name}"):
            (
                df.repartition(8, key)
                .write.bucketBy(8, key)
                .sortBy(key)
                .option("path", os.path.join(base, name))
                .mode("overwrite")
                .saveAsTable(f"{db}.{name}")
            )
    o = spark.table(f"{db}.orders_b").filter(F.col("o_totalprice") > 150000)
    l = spark.table(f"{db}.lineitem_b")
    return (
        o.join(l, o.o_orderkey == l.l_orderkey)
        .groupBy("o_orderkey", "o_orderdate", "o_totalprice")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )
