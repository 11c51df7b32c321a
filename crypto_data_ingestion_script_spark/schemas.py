"""Explicit StructType schemas (schema-on-write, SURVEY.md §1.2).

The reference declares fixed DDL for its two tables
(``dataCollector.py:49-55`` raw_prices, ``dataCollector.py:62-75``
downsampled_prices); we mirror that discipline with StructType constants —
no schema inference anywhere in the engine.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DateType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

#: Raw tick stream — reference SQLite ``raw_prices`` (dataCollector.py:49-55),
#: with the ISO-8601 TEXT timestamp upgraded to a native TimestampType.
TICKS = StructType(
    [
        StructField("ts", TimestampType(), False),
        StructField("symbol", StringType(), False),
        StructField("price", DoubleType(), False),
    ]
)

#: Hourly OHLC bars — reference PostgreSQL ``downsampled_prices``
#: (dataCollector.py:62-75; composite PK (date, hour, symbol) at :73).
HOURLY_BARS = StructType(
    [
        StructField("date", DateType(), False),
        StructField("hour", IntegerType(), False),
        StructField("symbol", StringType(), False),
        StructField("open_price", DoubleType(), True),
        StructField("high_price", DoubleType(), True),
        StructField("low_price", DoubleType(), True),
        StructField("close_price", DoubleType(), True),
        StructField("avg_price", DoubleType(), True),
        StructField("sample_count", LongType(), False),
    ]
)

#: Driver star-schema + aux tables (FIXTURES.md §2) — declared so CSV/JSON
#: ingestion never infers.
EVENTS = StructType(
    [
        StructField("event_id", LongType(), False),
        StructField("ts", TimestampType(), False),
        StructField("user_id", LongType(), False),
        StructField("event_type", StringType(), False),
        StructField("value", DoubleType(), False),
        StructField("props", StringType(), True),
    ]
)

DOCUMENTS = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("text", StringType(), False),
        StructField("lang", StringType(), True),
        StructField("source", StringType(), True),
        StructField("n_chars", LongType(), True),
    ]
)

EMBEDDINGS = StructType(
    [
        StructField("vec_id", LongType(), False),
        StructField("embedding", ArrayType(FloatType(), False), False),
        StructField("label", IntegerType(), True),
    ]
)

#: Multimodal asset table (SURVEY.md §2.L): opaque binary payload + typed
#: metadata. Decoders are stubbed (image/audio libs absent); plumbing is real.
MULTIMODAL_ASSETS = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("modality", StringType(), False),  # image | audio | video
        StructField("content", BinaryType(), False),
        StructField(
            "meta",
            StructType(
                [
                    StructField("mime", StringType(), True),
                    StructField("width", IntegerType(), True),
                    StructField("height", IntegerType(), True),
                    StructField("duration_ms", IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)
