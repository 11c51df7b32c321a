"""Perceptual image near-dup (q_phash_dedup / q_ahash): the Manku
banding completeness guarantee on planted signatures, the real
PPM encode→decode hash path, and the dHash/aHash bit conventions."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from crypto_data_ingestion_script_spark.llm.multimodal import (
    HAM_BANDS,
    HAM_RADIUS,
    _phash_pixels,
    decode_image,
    dhash_signatures,
    encode_ppm,
    hamming_band_pairs,
)


def _bands_of(h: int) -> tuple[int, int, int, int]:
    return tuple((h >> (16 * k)) & 0xFFFF for k in range(HAM_BANDS))


def _flip(h: int, positions) -> int:
    for p in positions:
        h ^= 1 << p
    return h


def test_banding_complete_at_radius(spark):
    """EVERY pair within Hamming ≤ HAM_RADIUS is found (pigeonhole over
    HAM_BANDS bands), with the exact distance; pairs past the radius are
    excluded. Planted: 40 random base hashes, each with one partner at
    each distance 0..HAM_RADIUS+2 (distance > radius must not appear)."""
    rng = random.Random(7)
    rows = []
    expected = set()
    doc = 0
    for _ in range(40):
        base = rng.getrandbits(64)
        rows.append((doc, *_bands_of(base)))
        base_id = doc
        doc += 1
        for d in range(0, HAM_RADIUS + 3):
            positions = rng.sample(range(64), d)
            rows.append((doc, *_bands_of(_flip(base, positions))))
            if d <= HAM_RADIUS:
                expected.add((base_id, doc, d))
            doc += 1
    sig = spark.createDataFrame(
        rows, "doc_id bigint, b0 int, b1 int, b2 int, b3 int"
    )
    got = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in hamming_band_pairs(sig, HAM_RADIUS).collect()
    }
    # Every planted pair found with the exact distance...
    assert expected <= got
    # ...and nothing past the radius.
    assert all(h <= HAM_RADIUS for _, _, h in got)
    # Cross-check the full output against brute force over all pairs.
    hashes = {
        r[0]: (r[1] | (r[2] << 16) | (r[3] << 32) | (r[4] << 48))
        for r in rows
    }
    brute = {
        (a, b, bin(hashes[a] ^ hashes[b]).count("1"))
        for a in hashes
        for b in hashes
        if a < b and bin(hashes[a] ^ hashes[b]).count("1") <= HAM_RADIUS
    }
    assert got == brute


def test_dhash_signature_matches_pixels(spark):
    """The executor-side hash path (real PPM encode→decode→grayscale→
    gradient) agrees with a direct numpy recomputation from the pixel
    synthesizer, for a spread of doc ids."""
    import numpy as np

    doc_ids = [0, 1, 2, 3, 17, 255, 1024, 4095]
    sig = {
        r["doc_id"]: (r["b0"], r["b1"], r["b2"], r["b3"])
        for r in dhash_signatures(
            spark.createDataFrame([(d,) for d in doc_ids], "doc_id bigint")
        ).collect()
    }
    for d in doc_ids:
        px = _phash_pixels(d)
        # decode really round-trips the bytes
        w, h, decoded = decode_image(encode_ppm(px))
        assert (w, h) == (9, 8) and (decoded == px).all()
        gray = decoded.astype(np.int64).sum(axis=2) // 3
        bits = (gray[:, 1:] > gray[:, :-1]).astype(np.int64).reshape(-1)
        hash64 = int(sum(int(b) << i for i, b in enumerate(bits)))
        assert sig[d] == _bands_of(hash64), d


def test_within_group_pairs_are_near(spark):
    """Docs sharing a 4-doc group differ by two one-pixel perturbations →
    Hamming ≤ 4; docs from different groups land far apart (the planted
    corpus geometry the dedup output relies on)."""
    import numpy as np

    def hash_of(d):
        _, _, decoded = decode_image(encode_ppm(_phash_pixels(d)))
        gray = decoded.astype(np.int64).sum(axis=2) // 3
        bits = (gray[:, 1:] > gray[:, :-1]).astype(np.int64).reshape(-1)
        return int(sum(int(b) << i for i, b in enumerate(bits)))

    same = bin(hash_of(8) ^ hash_of(9)).count("1")
    assert same <= 4
    far = [bin(hash_of(0) ^ hash_of(4 * g)).count("1") for g in (5, 50, 500)]
    assert min(far) > HAM_RADIUS


def _audio_hash(d: int) -> int:
    """Numpy twin of audio_signatures' fingerprint, straight from the
    synthesis formula (no WAV round-trip) — the independent third
    implementation."""
    import numpy as np

    from crypto_data_ingestion_script_spark.llm.multimodal import (
        AD_BOOST,
        AD_FRAMES,
        AF_FRAME,
    )

    g = d // 4
    f = np.arange(AD_FRAMES, dtype=np.int64)
    a = 100 + (
        ((g % 251) * (f + 1) * (f + 7) * 104729
         + (g % 241) * (f + 3) * (f + 11) * 7919) % 997
    ) % 200
    a = a + np.where(f == d % AD_FRAMES, AD_BOOST, 0)
    eng = AF_FRAME * a * a
    bits = (eng[1:] > eng[:-1]).astype(np.int64)
    return int(sum(int(b) << i for i, b in enumerate(bits)))


def test_audio_signatures_match_formula(spark):
    """audio_signatures' executor path (amplitude synth → WAV encode →
    REAL decode → int64 frame energies → gradient bits) agrees with the
    direct arithmetic recomputation, for a spread of doc ids — a decoder
    defect (offset, endianness, width) diverges here."""
    from crypto_data_ingestion_script_spark.llm.multimodal import (
        audio_signatures,
    )

    doc_ids = [0, 1, 2, 3, 17, 64, 65, 255, 1024, 4095]
    sig = {
        r["doc_id"]: (r["b0"], r["b1"], r["b2"], r["b3"])
        for r in audio_signatures(
            spark.createDataFrame([(d,) for d in doc_ids], "doc_id bigint")
        ).collect()
    }
    for d in doc_ids:
        assert sig[d] == _bands_of(_audio_hash(d)), d


def test_audio_dedup_clusters_match_brute_force(spark, tmp_path):
    """q_audio_dedup's verdict equals an independent union-find over
    brute-force all-pairs Hamming ≤ HAM_RADIUS on the formula-derived
    fingerprints — planted-duplicate completeness for the audio
    modality (the test_banding_complete_at_radius guarantee, driven
    end-to-end through fingerprint → banding → components)."""
    import pandas as pd

    from crypto_data_ingestion_script_spark.registry import load_all

    sf = str(tmp_path)
    n = 64  # 16 four-doc groups
    pd.DataFrame({"doc_id": range(n), "text": ["x"] * n}).to_parquet(
        f"{sf}/documents.parquet"
    )
    got = {
        r["doc_id"]: (r["cluster_id"], r["is_canonical"])
        for r in load_all()["q_audio_dedup"].fn(spark, sf).collect()
    }
    hashes = {d: _audio_hash(d) for d in range(n)}
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    n_edges = 0
    for a in range(n):
        for b in range(a + 1, n):
            if bin(hashes[a] ^ hashes[b]).count("1") <= HAM_RADIUS:
                n_edges += 1
                ra, rb = find(a), find(b)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
    # min-label canonicalization: cluster id = min doc id in component
    label = {d: min(x for x in range(n) if find(x) == find(d)) for d in range(n)}
    assert n_edges > 0, "corpus must plant at least one near-dup pair"
    assert got == {d: (label[d], d == label[d]) for d in range(n)}
