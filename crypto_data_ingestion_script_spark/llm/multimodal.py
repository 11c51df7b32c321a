"""Multimodal columns (SURVEY §2.L): image/audio/video as opaque BinaryType
payloads with typed StructType metadata; decode / feature-extract / resize /
frame-sample as Arrow-batched pandas transforms over ``mapInPandas``.

The image/audio codecs are NOT in this container, so the decode step is
stubbed (``decode_image`` raises NotImplementedError; the pipeline runs a
clearly-marked deterministic fake instead). Everything Spark-side is real
and tested: schema, binary round-trip, partitioning, UDF signature, batch
shape — swapping the fake for Pillow/librosa is a one-function change on
the executors, nothing in the plan moves.

Scale: payloads stay in executor-side Arrow batches end to end; feature
rows (small, fixed-width) are what shuffles — never the binary blobs.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import query

ASSET_DDL = (
    "asset_id bigint, modality string, content binary, "
    "meta struct<mime:string, width:int, height:int, duration_ms:int>"
)

FEATURE_DDL = (
    "asset_id bigint, modality string, byte_len bigint, "
    "feature_mean double, feature_dim int, thumb_w int, thumb_h int"
)


def decode_image(content: bytes):  # pragma: no cover - stub by design
    """Real decoder entry point. Image libs are not in this container."""
    raise NotImplementedError(
        "image decode requires Pillow/opencv on executors; "
        "CI uses fake_decode (deterministic) instead"
    )


def fake_decode(content: bytes) -> list[float]:
    """Deterministic stand-in for decode+feature-extract: bytes → fixed-dim
    'embedding' (mean-pooled byte windows). Same signature/shape contract
    as a real decoder."""
    if not content:
        return [0.0] * 8
    step = max(len(content) // 8, 1)
    return [
        sum(content[i : i + step]) / (255.0 * step) for i in range(0, 8 * step, step)
    ][:8]


def assets_from_documents(docs: DataFrame) -> DataFrame:
    """Synthesize a multimodal asset table from documents: text bytes stand
    in for media payloads; modality/dimensions derive deterministically from
    doc_id. (The real pipeline would read these columns from upstream
    parquet — BinaryType is a first-class parquet/Arrow type.)"""
    modality = (
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
    )
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        modality.alias("modality"),
        F.encode("text", "UTF-8").alias("content"),
        F.struct(
            F.concat(F.lit("application/x-fake-"), modality).alias("mime"),
            ((F.col("doc_id") % 8 + 1) * 64).cast("int").alias("width"),
            ((F.col("doc_id") % 4 + 1) * 64).cast("int").alias("height"),
            ((F.col("n_chars") % 100) * 1000).cast("int").alias("duration_ms"),
        ).alias("meta"),
    )


def extract_features(assets: DataFrame) -> DataFrame:
    """mapInPandas feature extraction: per-batch decode (stub) + resize
    metadata. 1 input row → 1 feature row; blobs never leave the executor."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [fake_decode(c) for c in pdf["content"]]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "modality": pdf["modality"],
                    "byte_len": [len(c) for c in pdf["content"]],
                    "feature_mean": [sum(f) / len(f) for f in feats],
                    "feature_dim": [len(f) for f in feats],
                    # 'resize': halve declared dims (pure-metadata op here;
                    # a real resize would transform the blob the same way).
                    "thumb_w": [m["width"] // 2 for m in pdf["meta"]],
                    "thumb_h": [m["height"] // 2 for m in pdf["meta"]],
                }
            )

    return assets.mapInPandas(run, schema=FEATURE_DDL)


def sample_frames(assets: DataFrame, n_frames: int = 4) -> DataFrame:
    """Frame sampling: 1 video asset → N frame rows via ``mapInPandas``
    (the 1→N expansion shape of a real frame extractor). Frames here are
    deterministic byte-slices of the payload (codec stub, see module
    docstring); the Spark-side contract — expansion inside the executor,
    fixed output schema, no blob shuffle before sampling — is the real
    pipeline's."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {
                "asset_id": [],
                "frame_idx": [],
                "frame_bytes": [],
                "frame_len": [],
            }
            for aid, content in zip(pdf["asset_id"], pdf["content"]):
                step = max(len(content) // n_frames, 1)
                for i in range(n_frames):
                    chunk = bytes(content[i * step : (i + 1) * step])
                    rows["asset_id"].append(aid)
                    rows["frame_idx"].append(i)
                    rows["frame_bytes"].append(chunk)
                    rows["frame_len"].append(len(chunk))
            yield pd.DataFrame(rows)

    return assets.mapInPandas(
        run,
        schema="asset_id bigint, frame_idx int, frame_bytes binary, frame_len bigint",
    )


@query(
    "q_frame_sample",
    oracle="""
    WITH f AS (SELECT doc_id AS asset_id, length(text) AS blen,
                      unnest([0, 1, 2, 3]) AS frame_idx
               FROM documents WHERE doc_id % 3 = 2)
    SELECT asset_id, frame_idx,
           CAST(CASE
             WHEN greatest(blen // 4, 1) * frame_idx >= blen THEN 0
             WHEN greatest(blen // 4, 1) * (frame_idx + 1) > blen
               THEN blen - greatest(blen // 4, 1) * frame_idx
             ELSE greatest(blen // 4, 1)
           END AS BIGINT) AS frame_len
    FROM f
    """,
    tags=("llm", "multimodal"),
)
def q_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sample the 'video' assets (4 frames per asset): 1→N expansion
    executor-side; the SQL-checkable projection is (asset_id, frame_idx,
    frame_len) — byte-slice lengths the oracle reconstructs arithmetically."""
    t = load(spark, sf_dir)
    videos = assets_from_documents(t.documents).filter(F.col("modality") == "video")
    return sample_frames(videos, n_frames=4).select(
        "asset_id", "frame_idx", "frame_len"
    )


@query(
    "q_multimodal",
    oracle="""
    SELECT doc_id AS asset_id,
           CASE WHEN doc_id % 3 = 0 THEN 'image'
                WHEN doc_id % 3 = 1 THEN 'audio'
                ELSE 'video' END AS modality,
           CAST(length(text) AS BIGINT)            AS byte_len,
           CAST((doc_id % 8 + 1) * 64 / 2 AS INTEGER) AS thumb_w,
           CAST((doc_id % 4 + 1) * 64 / 2 AS INTEGER) AS thumb_h,
           CAST(8 AS INTEGER)                      AS feature_dim
    FROM documents
    """,
    tags=("llm", "multimodal"),
)
def q_multimodal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary round-trip + feature extraction: documents → binary assets →
    mapInPandas decode(stub)/features. The SQL-checkable projection
    (byte_len/thumb dims/feature_dim) is oracle-verified; feature_mean is
    covered by the unit test (fake_decode is deterministic)."""
    t = load(spark, sf_dir)
    feats = extract_features(assets_from_documents(t.documents))
    return feats.select(
        "asset_id", "modality", "byte_len", "thumb_w", "thumb_h", "feature_dim"
    )
