"""Independent-recomputation tests for the round-11 graph/DQ batch
(q_kcore, q_fk_integrity, q_freshness, q_minhash_accuracy). k-core gets
three angles: a planted cascade graph with a known multi-round peel, a
full python peeling simulation of the real sf0.001 graph, and the
fixed-horizon convergence pin (one extra round changes nothing).
q_minhash_accuracy's signatures are recomputed with hashlib.md5 — a
third md5 implementation against Spark's and DuckDB's.
"""

from __future__ import annotations

import collections
import hashlib

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

from crypto_data_ingestion_script_spark.llm.dedup import MINACC_H
from crypto_data_ingestion_script_spark.operators.graph import (
    KCORE_K,
    KCORE_ROUNDS,
    kcore_survivors,
)
from crypto_data_ingestion_script_spark.operators.quality import (
    FK_EDGES,
    FRESH_SLA_H,
    STALE_SLA_H,
)
from crypto_data_ingestion_script_spark.registry import load_all

SPECS = load_all()


def _peel(edges: list[tuple], k: int) -> tuple[set, int]:
    """Reference synchronous k-core peel; returns (survivors, rounds)."""
    adj = collections.defaultdict(set)
    for u, v in edges:
        adj[("p", u)].add(("s", v))
        adj[("s", v)].add(("p", u))
    alive = set(adj)
    rounds = 0
    while True:
        dead = {
            n for n in alive if sum(1 for m in adj[n] if m in alive) < k
        }
        if not dead:
            return alive, rounds
        alive -= dead
        rounds += 1


def test_kcore_planted_cascade(spark):
    # Bipartite cascade: parts 1..3 each connect to supps 1..2 (deg 2);
    # part 4 connects to supps 1..2 and 3; supp 3 connects ONLY to part 4.
    # k=2: supp 3 (deg 1) peels in round 1, dropping part 4 to deg 2
    # (survives), so the 2-core is everything except supp 3. With k=3:
    # everything eventually peels (multi-round cascade).
    edges = [(1, 1), (1, 2), (2, 1), (2, 2), (3, 1), (3, 2),
             (4, 1), (4, 2), (4, 3)]
    edf = spark.createDataFrame(edges, "p int, s int").localCheckpoint()
    for k in (2, 3):
        expect, ref_rounds = _peel(edges, k)
        assert ref_rounds >= 1  # the cascade actually cascades
        ap, asv = kcore_survivors(edf, k, rounds=max(ref_rounds, 2))
        got = {("p", r["p"]) for r in ap.collect()} | {
            ("s", r["s"]) for r in asv.collect()
        }
        assert got == expect


def test_kcore_matches_python_peel_and_converges(spark, sf_dir):
    li = pq.read_table(
        f"{sf_dir}/lineitem.parquet", columns=["l_partkey", "l_suppkey"]
    ).to_pandas()
    edges = list(
        {(int(a), int(b)) for a, b in li.itertuples(index=False)}
    )
    expect, ref_rounds = _peel(edges, KCORE_K)
    assert ref_rounds <= KCORE_ROUNDS  # fixed horizon covers convergence
    out = SPECS["q_kcore"].fn(spark, sf_dir).collect()
    got = {
        ("p" if r["node_kind"] == "part" else "s", r["node_id"]): r[
            "core_deg"
        ]
        for r in out
    }
    assert set(got) == expect
    # within-core degrees match the reference peel's final degrees
    adj = collections.defaultdict(set)
    for u, v in edges:
        adj[("p", u)].add(("s", v))
        adj[("s", v)].add(("p", u))
    for node, deg in got.items():
        assert deg == sum(1 for m in adj[node] if m in expect)
        assert deg >= KCORE_K  # converged: every survivor meets the floor


def test_fk_integrity_matches_pandas(spark, sf_dir):
    out = {r["fk"]: r for r in SPECS["q_fk_integrity"].fn(spark, sf_dir).collect()}
    assert len(out) == len(FK_EDGES)
    for label, child, fk, parent, pk in FK_EDGES:
        c = pq.read_table(f"{sf_dir}/{child}.parquet", columns=[fk]).to_pandas()[fk]
        p = set(
            pq.read_table(f"{sf_dir}/{parent}.parquet", columns=[pk]).to_pandas()[pk]
        )
        nn = c.dropna()
        orphans = nn[~nn.isin(p)]
        r = out[label]
        assert r["n_rows"] == len(c)
        assert r["n_keys"] == nn.nunique()
        assert r["n_null_rows"] == int(c.isna().sum())
        assert r["n_orphan_rows"] == len(orphans)
        assert r["n_orphan_keys"] == orphans.nunique()


def test_freshness_matches_pandas(spark, sf_dir):
    out = {
        r["event_type"]: r
        for r in SPECS["q_freshness"].fn(spark, sf_dir).collect()
    }
    ev = pq.read_table(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts"]
    ).to_pandas()
    wm = ev["ts"].max()
    for etype, g in ev.groupby("event_type"):
        r = out[etype]
        last = g["ts"].max()
        lag_h = (wm - last).total_seconds() / 3600.0
        assert r["n_events"] == len(g)
        assert r["last_ts"] == last
        assert r["staleness_hours"] == pytest.approx(lag_h, abs=2e-6)
        expect = (
            "fresh"
            if lag_h <= FRESH_SLA_H
            else ("lagging" if lag_h <= STALE_SLA_H else "stale")
        )
        assert r["status"] == expect


def _md5_sig(shingle_set: set) -> list[int]:
    sig = [1 << 32] * MINACC_H
    for sh in shingle_set:
        for i in range(MINACC_H):
            dig = hashlib.md5(f"{sh}|{i // 4}".encode()).hexdigest()
            v = int(dig[(i % 4) * 8 : (i % 4) * 8 + 8], 16)
            sig[i] = min(sig[i], v)
    return sig


def test_minhash_accuracy_matches_hashlib(spark, sf_dir):
    rows = SPECS["q_minhash_accuracy"].fn(spark, sf_dir).collect()
    assert rows, "corpus should contain near-dup pairs"
    docs = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).to_pandas()
    shs = {}
    for _, r in docs.iterrows():
        toks = r["text"].split(" ")
        n = max(len(toks) - 2, 1)
        shs[r["doc_id"]] = {" ".join(toks[i : i + 3]) for i in range(n)}
    errs = []
    for r in rows:
        a, b = shs[r["a_id"]], shs[r["b_id"]]
        exact = len(a & b) / len(a | b)
        assert exact >= 0.8 - 1e-9
        assert r["exact_j"] == pytest.approx(exact, abs=1e-6)
        sa, sb = _md5_sig(a), _md5_sig(b)
        est = sum(x == y for x, y in zip(sa, sb)) / MINACC_H
        assert r["est_j"] == pytest.approx(est, abs=1e-6)
        assert r["abs_err"] == pytest.approx(abs(est - exact), abs=2e-6)
        errs.append(est - exact)
    mae = float(np.mean(np.abs(errs)))
    assert rows[0]["mae"] == pytest.approx(mae, abs=2e-6)
    assert rows[0]["bias"] == pytest.approx(float(np.mean(errs)), abs=2e-6)
    assert rows[0]["max_abs_err"] == pytest.approx(
        float(np.max(np.abs(errs))), abs=2e-6
    )
    # Sketch sanity: MAE inside a few binomial standard errors at H slots.
    assert mae <= 4 * np.sqrt(0.8 * 0.2 / MINACC_H)
