"""Scalar function library (SURVEY §2.J): string, math, conditional, array,
map, JSON, hashing. The reference touches only f-string formatting
(/root/reference/dataCollector.py:204); everything else is the delegated
query surface, kept JVM-side (built-in functions, whole-stage codegen — no
Python UDFs anywhere in this module).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import query


@query(
    "q_string_funcs",
    oracle="""
    SELECT c_custkey,
           upper(c_name)                                   AS name_up,
           lower(c_mktsegment)                             AS seg_lo,
           CAST(length(c_name) AS INTEGER)                 AS name_len,
           substring(c_name, 1, 8)                         AS name_prefix,
           concat(c_mktsegment, '#', CAST(c_custkey AS VARCHAR)) AS seg_key,
           trim('  ' || c_mktsegment || ' ')               AS seg_trim,
           replace(c_name, '#', '-')                       AS name_dash,
           CAST(instr(c_name, '1') AS BIGINT)              AS pos_one,
           lpad(CAST(c_custkey AS VARCHAR), 8, '0')        AS key_padded,
           regexp_extract(c_name, '([0-9]+)', 1)           AS name_digits,
           regexp_replace(c_mktsegment, '[AEIOU]', '_', 'g') AS seg_devowel,
           split_part(c_name, '#', 1)                      AS name_head
    FROM customer
    """,
    tags=("scalar",),
)
def q_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load(spark, sf_dir)
    return t.customer.select(
        "c_custkey",
        F.upper("c_name").alias("name_up"),
        F.lower("c_mktsegment").alias("seg_lo"),
        F.length("c_name").alias("name_len"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.concat(
            F.col("c_mktsegment"), F.lit("#"), F.col("c_custkey").cast("string")
        ).alias("seg_key"),
        F.trim(F.concat(F.lit("  "), F.col("c_mktsegment"), F.lit(" "))).alias(
            "seg_trim"
        ),
        F.regexp_replace(F.col("c_name"), "#", "-").alias("name_dash"),
        F.instr(F.col("c_name"), "1").cast("bigint").alias("pos_one"),
        F.lpad(F.col("c_custkey").cast("string"), 8, "0").alias("key_padded"),
        F.regexp_extract("c_name", "([0-9]+)", 1).alias("name_digits"),
        F.regexp_replace("c_mktsegment", "[AEIOU]", "_").alias("seg_devowel"),
        F.split_part(F.col("c_name"), F.lit("#"), F.lit(1)).alias("name_head"),
    )


@query(
    "q_math_funcs",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(l_extendedprice, 1)                  AS price_r1,
           abs(l_discount - 0.05)                     AS disc_dev,
           CAST(ceil(l_quantity) AS BIGINT)           AS qty_ceil,
           CAST(floor(l_quantity / 7) AS BIGINT)      AS qty_div7,
           sqrt(l_extendedprice)                      AS price_sqrt,
           round(pow(1.0 + l_discount, 2), 8)         AS disc_sq,
           round(ln(l_extendedprice), 8)              AS price_ln,
           round(exp(l_discount), 8)                  AS disc_exp,
           CAST(mod(l_orderkey, 7) AS BIGINT)         AS key_mod,
           greatest(l_discount, l_tax)                AS max_rate,
           least(l_discount, l_tax)                   AS min_rate
    FROM lineitem
    """,
    tags=("scalar",),
)
def q_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load(spark, sf_dir)
    return t.lineitem.select(
        "l_orderkey",
        "l_linenumber",
        F.round("l_extendedprice", 1).alias("price_r1"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.ceil("l_quantity").alias("qty_ceil"),
        F.floor(F.col("l_quantity") / 7).alias("qty_div7"),
        F.sqrt("l_extendedprice").alias("price_sqrt"),
        # ln/exp/pow are not IEEE correctly-rounded; JVM vs libm can differ
        # in the last ulp — round to 8 decimals on both sides of the oracle.
        F.round(F.pow(F.lit(1.0) + F.col("l_discount"), 2), 8).alias("disc_sq"),
        F.round(F.log("l_extendedprice"), 8).alias("price_ln"),
        F.round(F.exp("l_discount"), 8).alias("disc_exp"),
        (F.col("l_orderkey") % 7).alias("key_mod"),
        F.greatest("l_discount", "l_tax").alias("max_rate"),
        F.least("l_discount", "l_tax").alias("min_rate"),
    )


@query(
    "q_case_when",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice >= 200000 THEN 'large'
                WHEN o_totalprice >= 100000 THEN 'medium'
                ELSE 'small' END                          AS size_band,
           coalesce(NULLIF(o_orderstatus, 'O'), 'open')   AS status_or_open,
           CASE WHEN o_orderpriority LIKE '1%' THEN 1 ELSE 0 END AS is_urgent
    FROM orders
    """,
    tags=("scalar",),
)
def q_case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load(spark, sf_dir)
    return t.orders.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") >= 200000, "large")
        .when(F.col("o_totalprice") >= 100000, "medium")
        .otherwise("small")
        .alias("size_band"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("open")).alias(
            "status_or_open"
        ),
        F.when(F.col("o_orderpriority").like("1%"), 1).otherwise(0).alias("is_urgent"),
    )


@query(
    "q_array_funcs",
    oracle="""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS INTEGER)           AS n_tokens,
           string_split(text, ' ')[1]                              AS first_token,
           CAST(list_contains(string_split(text, ' '), 'spark') AS BOOLEAN) AS has_spark,
           CAST(len(list_distinct(string_split(text, ' '))) AS INTEGER)     AS n_unique,
           to_json(list_sort(list_distinct(string_split(substring(text, 1, 40), ' ')))) AS head_vocab,
           to_json(list_transform(string_split(substring(text, 1, 20), ' '), x -> upper(x))) AS head_up,
           to_json(list_filter(string_split(substring(text, 1, 40), ' '), x -> length(x) > 4)) AS long_tokens,
           CAST(list_sum(list_transform(string_split(text, ' '), x -> length(x))) AS BIGINT) AS total_chars
    FROM documents
    """,
    tags=("scalar", "array"),
)
def q_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions over tokenized text — all JVM-side
    (transform/filter/aggregate are Catalyst lambda expressions, not UDFs)."""
    t = load(spark, sf_dir)
    toks = F.split(F.col("text"), " ")
    head40 = F.split(F.substring(F.col("text"), 1, 40), " ")
    head20 = F.split(F.substring(F.col("text"), 1, 20), " ")
    return t.documents.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        toks.getItem(0).alias("first_token"),
        F.array_contains(toks, "spark").alias("has_spark"),
        F.size(F.array_distinct(toks)).alias("n_unique"),
        F.to_json(F.sort_array(F.array_distinct(head40))).alias("head_vocab"),
        F.to_json(F.transform(head20, lambda x: F.upper(x))).alias("head_up"),
        F.to_json(F.filter(head40, lambda x: F.length(x) > 4)).alias("long_tokens"),
        F.aggregate(
            toks, F.lit(0).cast("bigint"), lambda acc, x: acc + F.length(x)
        ).alias("total_chars"),
    )


@query(
    "q_map_funcs",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_from_map,
           'k' AS first_key
    FROM events
    """,
    tags=("scalar", "map"),
)
def q_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON string → MapType → element_at/map_keys — nested-type plumbing
    the reference's flat rows never needed."""
    t = load(spark, sf_dir)
    m = F.from_json(F.col("props"), "map<string,bigint>")
    return t.events.select(
        "event_id",
        F.element_at(m, "k").alias("k_from_map"),
        F.map_keys(m).getItem(0).alias("first_key"),
    )


@query(
    "q_json_extract",
    oracle="""
    SELECT event_id,
           json_extract_string(props, '$.k')                 AS k_str,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_int,
           CAST(json_extract_string(props, '$.missing') AS VARCHAR) AS missing
    FROM events
    """,
    tags=("scalar", "json"),
)
def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load(spark, sf_dir)
    return t.events.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        F.get_json_object("props", "$.k").cast("bigint").alias("k_int"),
        F.get_json_object("props", "$.missing").alias("missing"),
    )


@query(
    "q_hash",
    oracle="""
    SELECT doc_id,
           md5(text)          AS text_md5,
           sha256(text)       AS text_sha256
    FROM documents
    """,
    tags=("scalar", "hash"),
)
def q_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cryptographic hashes are engine-portable (md5/sha2); Spark's
    xxhash64/hash are engine-specific seeds → exercised in q_hash_spark
    (rows-only)."""
    t = load(spark, sf_dir)
    return t.documents.select(
        "doc_id",
        F.md5("text").alias("text_md5"),
        F.sha2(F.col("text"), 256).alias("text_sha256"),
    )


@query(
    "q_hash_spark",
    oracle="""
    SELECT count(*)             AS n_docs,
           count(DISTINCT text) AS n_distinct_texts,
           TRUE AS xxh64_injective_here,
           TRUE AS murmur3_collisions_bounded
    FROM documents
    """,
    tags=("scalar", "hash"),
)
def q_hash_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark-native hashes (xxhash64 / Murmur3) — the fast partitioning and
    fingerprint primitives behind the dedup/LSH operators. Hash values are
    engine-specific, so the driver-checkable output is the property that
    matters. xxhash64 (64-bit) is asserted injective on the corpus: the
    birthday expectation n²/2⁶⁵ stays ≪1 up to billions of distinct texts.
    Murmur3 is 32-bit, where birthday collisions on a *correct* hash become
    likely past ~10⁴ distinct inputs, so the verdict is a bounded collision
    count instead: distinct-inputs − distinct-hashes ≤ 4 + 8·n²/2³³ (eight
    times the birthday expectation — a constant-false-positive-rate bound at
    any corpus size). A broken hash (constant, truncated, or instable)
    collapses distinct counts and flips the verdict; a correct one passes at
    any scale factor."""
    t = load(spark, sf_dir)
    n_distinct = F.countDistinct("text")
    murmur_collisions = n_distinct - F.countDistinct(F.hash("text"))
    collision_budget = F.lit(4.0) + (
        n_distinct.cast("double") * n_distinct.cast("double") / F.lit(float(2**33)) * F.lit(8.0)
    )
    return t.documents.agg(
        F.count(F.lit(1)).alias("n_docs"),
        n_distinct.alias("n_distinct_texts"),
        (
            F.countDistinct(F.xxhash64("text"))
            == F.countDistinct("text")
        ).alias("xxh64_injective_here"),
        (murmur_collisions.cast("double") <= collision_budget).alias(
            "murmur3_collisions_bounded"
        ),
    )


@query(
    "q_explode",
    oracle="""
    SELECT doc_id, unnest(string_split(text, ' ')) AS token
    FROM documents WHERE doc_id < 50
    """,
    tags=("scalar", "udtf"),
)
def q_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1→N table function: explode of an array expression (the built-in
    UDTF path — generator expressions, not Python)."""
    t = load(spark, sf_dir)
    return (
        t.documents.filter(F.col("doc_id") < 50)
        .select("doc_id", F.explode(F.split("text", " ")).alias("token"))
    )


@query(
    "q_higher_order_pred",
    oracle="""
    SELECT doc_id,
           CAST(len(list_filter(string_split(text, ' '),
                                x -> length(x) > 12)) > 0 AS BOOLEAN) AS any_long,
           CAST(len(list_filter(string_split(text, ' '),
                                x -> NOT length(x) > 0)) = 0 AS BOOLEAN) AS all_nonempty
    FROM documents
    """,
    tags=("scalar", "array"),
)
def q_higher_order_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantified lambda predicates over arrays: exists / forall — Catalyst
    lambda expressions (JVM-side short-circuit scan of each array), the
    idiom for per-document token tests without explode+groupBy."""
    t = load(spark, sf_dir)
    toks = F.split(F.col("text"), " ")
    return t.documents.select(
        "doc_id",
        F.exists(toks, lambda x: F.length(x) > 12).alias("any_long"),
        F.forall(toks, lambda x: F.length(x) > 0).alias("all_nonempty"),
    )


@query(
    "q_posexplode",
    oracle="""
    SELECT doc_id,
           CAST(generate_subscripts(string_split(substring(text, 1, 40), ' '), 1) - 1
                AS INTEGER) AS pos,
           unnest(string_split(substring(text, 1, 40), ' ')) AS tok
    FROM documents
    """,
    tags=("scalar", "array", "udtf"),
)
def q_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordinal explode (1→N with position): posexplode keeps each element's
    index — required whenever order inside the array carries meaning
    (token position, frame number). Generate node, no shuffle."""
    t = load(spark, sf_dir)
    toks = F.split(F.substring(F.col("text"), 1, 40), " ")
    return t.documents.select(
        "doc_id", F.posexplode(toks).alias("pos", "tok")
    )


@query(
    "q_regexp_all",
    oracle="""
    SELECT doc_id,
           to_json(regexp_extract_all(substring(text, 1, 80), '[a-z]+')) AS words,
           CAST(len(regexp_extract_all(substring(text, 1, 80), '[0-9]+'))
                AS INTEGER) AS n_numbers
    FROM documents
    """,
    tags=("scalar", "string"),
)
def q_regexp_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """regexp_extract_all: all matches as an array (JVM-side regex over the
    codegen'd row batch) — the tokenizer primitive behind BPE-ish splitting
    in llm/text.py."""
    t = load(spark, sf_dir)
    head = F.substring(F.col("text"), 1, 80)
    return t.documents.select(
        "doc_id",
        F.to_json(F.regexp_extract_all(head, F.lit("[a-z]+"), F.lit(0))).alias("words"),
        F.size(F.regexp_extract_all(head, F.lit("[0-9]+"), F.lit(0))).alias("n_numbers"),
    )


@query(
    "q_map_hof",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) * 2 AS k_doubled,
           CASE WHEN CAST(json_extract_string(props, '$.k') AS BIGINT) > 50
                THEN 1 ELSE 0 END AS n_large
    FROM events
    WHERE json_extract_string(props, '$.k') IS NOT NULL
    """,
    tags=("scalar", "map"),
)
def q_map_hof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map higher-order functions: parse props JSON into a real MapType,
    then transform_values (double every value) and map_filter (keep values
    > 50) — Catalyst lambda expressions over map entries, verified through
    scalar projections the oracle reconstructs from the JSON directly."""
    t = load(spark, sf_dir)
    m = F.from_json(F.col("props"), "map<string,bigint>")
    doubled = F.transform_values(m, lambda _, v: v * 2)
    large = F.map_filter(m, lambda _, v: v > 50)
    return (
        t.events.select(
            "event_id",
            F.element_at(doubled, "k").alias("k_doubled"),
            F.size(large).alias("n_large"),
        )
        .filter(F.col("k_doubled").isNotNull())
    )


@query(
    "q_try_arith",
    oracle="""
    SELECT event_id,
           TRY_CAST(CASE WHEN CAST(json_extract_string(props, '$.k') AS BIGINT) > 50
                         THEN CAST(value AS VARCHAR) || 'x'
                         ELSE CAST(value AS VARCHAR) END AS DOUBLE) AS maybe_value,
           CASE WHEN CAST(json_extract_string(props, '$.k') AS BIGINT) = 0
                THEN NULL
                ELSE value / CAST(json_extract_string(props, '$.k') AS BIGINT)
           END AS safe_ratio
    FROM events
    """,
    tags=("scalar",),
)
def q_try_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe expression semantics: try_cast turns malformed numerics
    (a deterministic corrupt subset: trailing 'x' when k>50) into NULL
    instead of failing the job, try_divide turns ÷0 into NULL — the ANSI
    escape hatches that keep a 100 TB batch from dying on one bad row.
    The oracle spells the same semantics with TRY_CAST and a CASE guard."""
    t = load(spark, sf_dir)
    k = F.get_json_object("props", "$.k").cast("bigint")
    corrupt = F.when(
        k > 50, F.concat(F.col("value").cast("string"), F.lit("x"))
    ).otherwise(F.col("value").cast("string"))
    return t.events.select(
        "event_id",
        corrupt.try_cast("double").alias("maybe_value"),
        F.try_divide(F.col("value"), k).alias("safe_ratio"),
    )


@query(
    "q_explode_map",
    oracle="""
    SELECT event_id, 'type' AS key, event_type AS val
    FROM events WHERE event_id < 500
    UNION ALL
    SELECT event_id, 'bucket' AS key,
           CAST(CAST(floor(value / 10) AS INTEGER) AS VARCHAR) AS val
    FROM events WHERE event_id < 500
    """,
    tags=("map", "generator"),
)
def q_explode_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map generator: explode(map) → one (key, value) row per entry — the
    attribute-unpivot pattern for semi-structured columns (each map entry
    becomes a fact row, partition-local expansion, no shuffle). Oracle
    spells the same expansion as a UNION ALL of per-key projections."""
    t = load(spark, sf_dir)
    m = F.create_map(
        F.lit("type"),
        F.col("event_type"),
        F.lit("bucket"),
        F.floor(F.col("value") / 10).cast("int").cast("string"),
    )
    return (
        t.events.filter(F.col("event_id") < 500)
        .select("event_id", F.explode(m).alias("key", "val"))
    )
