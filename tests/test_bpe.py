"""q_bpe_merge greedy-apply semantics: the overlapping-pair corner
(merge_left == merge_right) that the synthetic corpus never exercises —
its argmax pair is ('e','r') — pinned on a toy corpus where the chosen
pair is a double letter."""

from __future__ import annotations

from crypto_data_ingestion_script_spark.catalog import load
from crypto_data_ingestion_script_spark.registry import load_all

SPECS = load_all()


def test_bpe_merge_greedy_overlap(spark, tmp_path):
    sf_dir = str(tmp_path)
    spark.createDataFrame(
        [(1, "oooo oooo ooo zz")], "doc_id bigint, text string"
    ).write.parquet(f"{sf_dir}/documents.parquet")

    rows = {
        r["word"]: r
        for r in SPECS["q_bpe_merge"].fn(spark, sf_dir).collect()
    }
    # (o,o) dominates: 3 pairs x 2 "oooo" + 2 in "ooo" = 8 vs (z,z) = 1.
    assert all(
        (r["merge_left"], r["merge_right"]) == ("o", "o")
        for r in rows.values()
    )
    # Greedy left-to-right: "oooo" merges twice (not its 3 overlapping
    # pair occurrences), "ooo" once, "zz" never (wrong pair).
    assert (rows["oooo"]["word_freq"], rows["oooo"]["n_merges"],
            rows["oooo"]["n_sym_after"]) == (2, 2, 2)
    assert (rows["ooo"]["n_merges"], rows["ooo"]["n_sym_after"]) == (1, 2)
    assert (rows["zz"]["n_merges"], rows["zz"]["n_sym_after"]) == (0, 2)


def test_bpe_train_chains_multichar_merges(spark):
    """bpe_train: round 2+ must merge MULTI-CHARACTER symbols produced by
    earlier rounds, and the l==r overlap rule must hold through a rewrite.
    Corpus: 'abab' x3 and 'aaaa' x1.
      round 1: pairs ab:6(in abab)+?, ba:3, aa:3 -> 'a'+'b' wins (cnt 6).
        rewrite: abab -> 'ab ab', aaaa -> 'aaaa' (untouched).
      round 2: pairs: ab+ab (3), a+a (3 matches in aaaa but greedy 2).
        counts: (ab,ab): 3, (a,a): 3 -> tie, lexicographic: 'a'+'a' wins.
        rewrite: aaaa -> 'aa aa'.
      round 3: (ab,ab): 3, (aa,aa): 1 -> 'ab'+'ab' wins; abab -> 'abab'.
    """
    from crypto_data_ingestion_script_spark.llm.text import bpe_train

    docs = spark.createDataFrame(
        [(1, "abab abab abab aaaa")],
        "doc_id bigint, text string",
    )
    out = {r["word"]: r for r in bpe_train(docs, rounds=3).collect()}
    assert set(out) == {"abab", "aaaa"}
    assert out["abab"]["merges"] == "a+b,a+a,ab+ab"
    assert out["abab"]["seg"] == "abab" and out["abab"]["n_syms"] == 1
    assert out["aaaa"]["seg"] == "aa aa" and out["aaaa"]["n_syms"] == 2
    assert out["abab"]["word_freq"] == 3 and out["aaaa"]["word_freq"] == 1


def test_bpe_encode_consistent_with_train(spark, sf_dir):
    """q_bpe_encode: corpus-total post-BPE tokens must equal
    Σ_vocab word_freq × n_syms from the SAME trained segmentation
    (encode is the train table applied, nothing re-derived), with
    n_words ≤ n_bpe_tokens ≤ n_chars per doc."""
    enc = SPECS["q_bpe_encode"].fn(spark, sf_dir).collect()
    trn = SPECS["q_bpe_train"].fn(spark, sf_dir).collect()
    assert sum(r["n_bpe_tokens"] for r in enc) == sum(
        r["word_freq"] * r["n_syms"] for r in trn
    )
    docs = {
        r["doc_id"]: len(r["text"].replace(" ", ""))
        for r in load(spark, sf_dir).documents.collect()
    }
    for r in enc:
        assert r["n_words"] <= r["n_bpe_tokens"] <= docs[r["doc_id"]]
