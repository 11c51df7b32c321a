"""PySpark-native analytics engine with the capabilities of the reference
``RishiG2506/Crypto_Data_Ingestion_Script`` (an ETL/streaming-aggregation
pipeline: poll → raw tick store → hourly OHLC rollup), re-expressed as an
idiomatic Spark lakehouse engine plus the full declared query surface of
SURVEY.md §2 (joins, windows, set ops, scalar/UDF functions, streaming,
LLM-data-pipeline operators).

Everything here is built on the public PySpark DataFrame/SQL API; no code is
copied from the reference (which is single-node imperative Python,
``/root/reference/dataCollector.py``).
"""

__version__ = "0.1.0"
