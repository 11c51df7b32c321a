#!/usr/bin/env python
"""Scale curves for the round-9 session-2 operators: wall times at
sf0.01 / sf0.1 (testdata) and sf1 (benchdata, 10x content replication)
plus the structural counts that carry each op's 100 TB argument —

- q_fastss_join: vocabulary and candidate-pair counts are set by CONTENT
  (Heaps' law), not corpus size — replication must leave them unchanged
  while the token-count scan scales linearly;
- q_softdedup: digest-grain group count is content-bound too; replication
  only raises dup_count (10x at sf1), never the summary cardinality;
- q_ivfpq_search: candidates per query grow linearly with the corpus
  (cell membership), while the probe/codebook state stays constant;
- q_hits / q_mmr / q_epoch_plan / q_tokenizer_fertility /
  q_quality_calibration: summary-grain outputs — walls should track the
  one fact-scale scan, not the iteration/greedy/planning math.

Usage: python scripts/new_ops_scale.py [out_json]
Run alone (timings are part of the artifact).
"""
import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
sys.path.insert(0, ROOT)

OUT = sys.argv[1] if len(sys.argv) > 1 else os.path.join(ROOT, "NEW_OPS_SCALE_r09.json")

from pyspark.sql import functions as F  # noqa: E402

from crypto_data_ingestion_script_spark.catalog import load  # noqa: E402
from crypto_data_ingestion_script_spark.session import build_session  # noqa: E402
import __spark_entry__ as e  # noqa: E402

SCALES = {
    "sf0.01": "/root/testdata/sf0.01",
    "sf0.1": "/root/testdata/sf0.1",
    "sf1": os.path.join(ROOT, "benchdata", "sf1"),
}
OPS = [
    "q_softdedup", "q_fastss_join", "q_mmr", "q_ivfpq_search",
    "q_hits", "q_epoch_plan", "q_tokenizer_fertility",
    "q_quality_calibration",
    # batch 3: the chargram LID's (lang x trigram) model grain is the
    # content-bound structure to watch (Heaps-law sublinear)
    "q_dup_profile", "q_length_filter_sweep", "q_lang_id_chargram",
]

spark = build_session("new-ops-scale")
spark.sparkContext.setLogLevel("ERROR")
qs = e.queries()

out = {"scales": {}}
for sf, d in SCALES.items():
    if not os.path.isdir(d) and not os.path.exists(d):
        print(f"skip {sf}: {d} missing")
        continue
    rec = {}
    t = load(spark, d)
    # structural counts (content-bound vs corpus-bound)
    n_docs = t.documents.count()
    vocab = (
        t.documents.select(F.explode(F.split("text", " ")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .count()
    )
    n_vocab = vocab.count()
    n_digests = t.documents.select(F.md5("text")).distinct().count()
    n_emb = t.embeddings.count()
    rec["counts"] = {
        "n_docs": n_docs,
        "n_vocab": n_vocab,
        "n_text_digests": n_digests,
        "n_embeddings": n_emb,
    }
    for name in OPS:
        walls, rows = [], None
        for _ in range(3):
            t0 = time.perf_counter()
            rows = qs[name](spark, d).count()
            walls.append(round(time.perf_counter() - t0, 2))
        rec[name] = {"walls": walls, "warm_min": min(walls[1:]), "rows_out": rows}
        print(sf, name, rec[name], flush=True)
    # op-specific structural counts
    from crypto_data_ingestion_script_spark.llm.dedup import _del1

    del1 = _del1(F.col("w"))
    variants = vocab.select(
        "w",
        F.explode(
            F.array_distinct(
                F.concat(
                    F.array(F.col("w")),
                    del1,
                    F.flatten(F.transform(del1, lambda v: _del1(v))),
                )
            )
        ).alias("variant"),
    )
    n_variants = variants.count()
    cand = (
        variants.alias("a")
        .join(variants.select(F.col("w").alias("wb"), "variant").alias("b"), "variant")
        .filter(F.col("a.w") < F.col("wb"))
        .select("a.w", "wb")
        .distinct()
        .count()
    )
    rec["fastss_structure"] = {"n_variant_rows": n_variants, "n_candidate_pairs": cand}
    # chargram LID model grain: (lang x trigram) rows — content-bound
    tri_model = (
        t.documents.filter(F.col("doc_id") % 5 != 0)
        .filter(F.length("text") >= 3)
        .select(
            "lang",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.length("text") - 2),
                    lambda i: F.substring(F.col("text"), i, 3),
                )
            ).alias("tri"),
        )
        .groupBy("lang", "tri")
        .count()
    )
    rec["chargram_structure"] = {
        "n_model_rows": tri_model.count(),
        "n_distinct_trigrams": tri_model.select("tri").distinct().count(),
    }
    out["scales"][sf] = rec

with open(OUT, "w") as f:
    json.dump(out, f, indent=1)
print("WROTE", OUT)
