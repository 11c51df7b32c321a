"""Spark 4 SQL-surface operators: recursive CTEs, the VARIANT semi-
structured type, and correlated LATERAL subqueries — capabilities the
reference delegates wholesale to PostgreSQL ("ability to handle complex
queries", /root/reference/README.md:31) that a Spark-native engine must
speak itself.

Scale notes (100 TB design point):
- q_recursive_cte: each recursion level is one self-join against the
  previous frontier — Spark executes it as iterated joins with the
  frontier shrinking per level; depth is bounded by the key structure
  (log10 here), never data volume.
- q_variant: parse_json → VariantType keeps the binary-encoded document
  columnar (no string re-parse per extraction); variant_get is a
  projection, so shredded access pushes down and the scan never inflates
  to one row per JSON key.
- q_lateral: the correlated ORDER BY/LIMIT subquery decorrelates to a
  per-key window-rank — one shuffle on the correlation key, not a
  nested-loop over customers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import query


@query(
    "q_recursive_cte",
    oracle="""
    WITH RECURSIVE anc AS (
      SELECT c_custkey, c_custkey AS root, 0 AS depth
      FROM customer WHERE c_custkey < 10
      UNION ALL
      SELECT c.c_custkey, a.root, a.depth + 1
      FROM customer c JOIN anc a ON c.c_custkey // 10 = a.c_custkey
      WHERE c.c_custkey >= 10
    )
    SELECT root, depth, count(*) AS n_members
    FROM anc GROUP BY root, depth
    """,
    tags=("sql", "recursive"),
)
def q_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4): decimal-digit hierarchy over custkeys
    (parent = key div 10) walked from the single-digit roots; per
    (root, depth) membership counts. Depth is log10(maxkey) levels of
    shrinking-frontier self-joins."""
    t = load(spark, sf_dir)
    t.customer.createOrReplaceTempView("customer_rc")
    return spark.sql(
        """
        WITH RECURSIVE anc AS (
          SELECT c_custkey, c_custkey AS root, 0 AS depth
          FROM customer_rc WHERE c_custkey < 10
          UNION ALL
          SELECT c.c_custkey, a.root, a.depth + 1
          FROM customer_rc c JOIN anc a ON c.c_custkey div 10 = a.c_custkey
          WHERE c.c_custkey >= 10
        )
        SELECT root, depth, count(*) AS n_members
        FROM anc GROUP BY root, depth
        """
    )


@query(
    "q_variant",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
           CAST(json_extract_string(props, '$.missing') AS BIGINT) AS missing
    FROM events
    """,
    tags=("sql", "variant"),
)
def q_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VARIANT ingestion (Spark 4): props parsed once into the binary
    variant encoding, fields extracted with typed variant_get — absent
    paths yield NULL, matching the JSON-string oracle. At rest a variant
    column shreds to parquet subcolumns, so typed extraction stays a
    pruned scan."""
    t = load(spark, sf_dir)
    v = F.parse_json("props")
    return t.events.select(
        "event_id",
        F.variant_get(v, "$.k", "bigint").alias("k"),
        F.variant_get(v, "$.missing", "bigint").alias("missing"),
    )


@query(
    "q_lateral",
    oracle="""
    SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
    FROM customer c, LATERAL (
      SELECT o_orderkey, o_totalprice
      FROM orders o
      WHERE o.o_custkey = c.c_custkey
      ORDER BY o_totalprice DESC, o_orderkey
      LIMIT 2
    ) t
    """,
    tags=("sql", "subquery"),
)
def q_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery with per-key ORDER BY/LIMIT (top-2
    orders per customer) — Catalyst decorrelates the limit to a window
    rank over o_custkey instead of a per-customer nested loop."""
    t = load(spark, sf_dir)
    t.customer.createOrReplaceTempView("customer_lat")
    t.orders.createOrReplaceTempView("orders_lat")
    return spark.sql(
        """
        SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
        FROM customer_lat c, LATERAL (
          SELECT o_orderkey, o_totalprice
          FROM orders_lat o
          WHERE o.o_custkey = c.c_custkey
          ORDER BY o_totalprice DESC, o_orderkey
          LIMIT 2
        ) t
        """
    )
