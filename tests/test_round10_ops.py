"""Targeted semantics tests for the round-10 session-2 additions:

- q_hilbert: the unrolled bit-arithmetic reproduces the reference xy2d
  algorithm exactly, AND the curve is a true Hilbert curve (consecutive
  indices are always grid neighbors — the locality property Morton lacks,
  checked over the full first-quadrant subgrid);
- q_label_prop: the single-batch kernel finds planted communities on a
  two-cluster toy graph and is invariant to edge-row order;
- q_dedup_url: canonical groups collapse exactly the variant axes the
  rules promise (case, www, :443, utm params, param order, fragment,
  trailing slash) — recomputed from the generator in pandas;
- q_readability: Flesch / FK-grade re-derived for sample docs in Python.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
import pyarrow.parquet as pq
import pytest

from crypto_data_ingestion_script_spark.operators.graph import _lpa_batch
from crypto_data_ingestion_script_spark.operators.layout import HILBERT_BITS
from crypto_data_ingestion_script_spark.registry import load_all

SPECS = load_all()


def xy2d(order_bits: int, x: int, y: int) -> int:
    """Reference Hilbert index (Wikipedia convert routine), scalar."""
    d = 0
    s = 1 << (order_bits - 1)
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
        s //= 2
    return d


def d2xy(order_bits: int, d: int) -> tuple[int, int]:
    x = y = 0
    s = 1
    while s < (1 << order_bits):
        rx = 1 & (d // 2)
        ry = 1 & (d ^ rx)
        if ry == 0:
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
        x += s * rx
        y += s * ry
        d //= 4
        s *= 2
    return x, y


def test_hilbert_consecutive_cells_are_neighbors():
    # Full curve at order 6 (4096 cells): every step moves exactly one
    # grid unit. A Morton curve fails this at every quadrant seam.
    pts = [d2xy(6, d) for d in range(4096)]
    for (x0, y0), (x1, y1) in zip(pts, pts[1:]):
        assert abs(x1 - x0) + abs(y1 - y0) == 1
    # and the two conversions invert each other at the operator's order
    for d in range(0, 1 << (2 * HILBERT_BITS), 997):
        x, y = d2xy(HILBERT_BITS, d)
        assert xy2d(HILBERT_BITS, x, y) == d


def test_hilbert_matches_reference_xy2d(spark, sf_dir):
    got = {
        r["bucket"]: (r["n"], r["min_h"], r["max_h"])
        for r in SPECS["q_hilbert"].fn(spark, sf_dir).collect()
    }
    ev = pq.read_table(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "value"]
    ).to_pandas()
    mx = (1 << HILBERT_BITS) - 1

    def quant(col):
        lo, hi = col.min(), col.max()
        span = (hi - lo) if hi > lo else 1.0
        q = np.floor((col - lo) / span * mx).astype("int64")
        return np.clip(q, 0, mx)

    xs, ys = quant(ev["user_id"].astype(float)), quant(ev["value"])
    ds = np.array(
        [xy2d(HILBERT_BITS, int(x), int(y)) for x, y in zip(xs, ys)]
    )
    ref = (
        pd.DataFrame({"bucket": ds // 1024, "d": ds})
        .groupby("bucket")["d"]
        .agg(["count", "min", "max"])
    )
    assert got == {
        int(b): (int(r["count"]), int(r["min"]), int(r["max"]))
        for b, r in ref.iterrows()
    }


def _toy_edges(shuffle_seed=None) -> pd.DataFrame:
    # two triangles {0,1,2} and {10,11,12} bridged by a weak 2-10 edge
    und = [
        (0, 1, 5), (1, 2, 5), (0, 2, 5),
        (10, 11, 5), (11, 12, 5), (10, 12, 5),
        (2, 10, 1),
    ]
    rows = [(s, d, w) for s, d, w in und] + [(d, s, w) for s, d, w in und]
    df = pd.DataFrame(rows, columns=["src", "dst", "w"])
    if shuffle_seed is not None:
        df = df.sample(frac=1.0, random_state=shuffle_seed).reset_index(
            drop=True
        )
    return df


def test_lpa_finds_planted_communities():
    out = _lpa_batch(_toy_edges()).set_index("node")["label"]
    assert set(out[[0, 1, 2]]) == {0}
    assert set(out[[10, 11, 12]]) == {10}


def test_lpa_invariant_to_edge_order():
    base = _lpa_batch(_toy_edges()).sort_values("node").to_numpy()
    for seed in (1, 2, 3):
        got = (
            _lpa_batch(_toy_edges(shuffle_seed=seed))
            .sort_values("node")
            .to_numpy()
        )
        assert (got == base).all()


def test_dedup_url_collapses_exactly_the_variant_axes(spark, sf_dir):
    got = SPECS["q_dedup_url"].fn(spark, sf_dir).collect()
    docs = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source"]
    ).to_pandas()
    # the generator varies only case/port/www/utm/order/fragment across
    # docs sharing (source, doc_id%40, doc_id%5) — the canonical groups
    # must be exactly those collision classes
    docs["key"] = list(
        zip(docs["source"], docs["doc_id"] % 40, docs["doc_id"] % 5)
    )
    ref = docs.groupby("key")["doc_id"].agg(["count", "min"])
    ref = ref[ref["count"] >= 2]
    assert len(got) == len(ref)
    got_pairs = sorted((r["n_dups"], r["keep_id"]) for r in got)
    ref_pairs = sorted(zip(ref["count"].astype(int), ref["min"].astype(int)))
    assert got_pairs == ref_pairs
    # spot-check one canonical string: lowercase, no www, no :443, no utm,
    # no fragment, params sorted
    url = got[0]["canonical_url"]
    assert url.startswith("https://src")
    assert "www." not in url and ":443" not in url
    assert "utm_" not in url and "#" not in url


def test_readability_matches_python(spark, sf_dir):
    import re

    rows = SPECS["q_readability"].fn(spark, sf_dir).collect()
    docs = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["text", "source"]
    ).to_pandas()
    for r in rows:
        sub = docs[docs.source == r["source"]]
        fl, fk, hard = [], [], 0
        for text in sub["text"]:
            w = len(text.split(" "))
            s = max(len(re.findall(r"[.!?]+", text)), 1)
            syl = max(len(re.findall(r"[aeiouy]+", text.lower())), 1)
            f = 206.835 - 1.015 * (w / s) - 84.6 * (syl / w)
            fl.append(f)
            fk.append(0.39 * (w / s) + 11.8 * (syl / w) - 15.59)
            hard += f < 30
        assert r["n_docs"] == len(sub)
        assert r["avg_flesch"] == pytest.approx(np.mean(fl), abs=1e-5)
        assert r["avg_fk_grade"] == pytest.approx(np.mean(fk), abs=1e-5)
        assert r["share_hard"] == pytest.approx(hard / len(sub), abs=1e-9)


# ---- batch 3: bellman-ford / CDC chunking / privacy ----

from crypto_data_ingestion_script_spark.operators.graph import _bf_batch


def test_bellman_ford_prefers_cheap_long_path():
    # 0->1->2->3 each cost 1 (total 3) vs direct 0->3 cost 10: the
    # weighted answer (3 hops, cost 3) differs from BFS's 1-hop choice.
    edges = pd.DataFrame(
        [(0, 1, 1), (1, 2, 1), (2, 3, 1), (0, 3, 10)],
        columns=["src", "dst", "w"],
    )
    out = _bf_batch(edges).set_index("node")["dist"]
    assert out[3] == 3 and out[1] == 1 and out[2] == 2 and out[0] == 0


def test_bellman_ford_respects_round_horizon():
    # cost-1 chain of length 4 with a direct cost-10 edge: within
    # BF_ROUNDS=3 relaxations the 4-hop path is NOT yet available, so
    # the direct edge wins — the fixed-horizon contract the oracle
    # unrolls.
    edges = pd.DataFrame(
        [(0, 1, 1), (1, 2, 1), (2, 3, 1), (3, 4, 1), (0, 4, 10)],
        columns=["src", "dst", "w"],
    )
    out = _bf_batch(edges).set_index("node")["dist"]
    assert out[4] == 10


def test_cdc_chunks_realign_after_prefix_edit(spark, sf_dir):
    from crypto_data_ingestion_script_spark.llm.dedup import cdc_chunks

    base = (
        "key agg row scan slow fast table value part hash value table "
        "part a row fast merge batch part value fast spark"
    )
    docs = spark.createDataFrame(
        [(1, base), (2, "zzznew " + base)], "doc_id bigint, text string"
    )
    got = cdc_chunks(docs).collect()
    c1 = {r["chunk_text"] for r in got if r["doc_id"] == 1}
    c2 = {r["chunk_text"] for r in got if r["doc_id"] == 2}
    # every chunk of doc 1 except (at most) its first survives verbatim
    # in doc 2 — fixed segmentation (q_segment_dedup) shares none
    shared = c1 & c2
    assert len(shared) >= len(c1) - 1


def test_kanon_matches_pandas(spark, sf_dir):
    got = {r["k"]: r for r in SPECS["q_kanon"].fn(spark, sf_dir).collect()}
    ev = pq.read_table(f"{sf_dir}/events.parquet").to_pandas()
    ev["qi_bucket"] = ev.user_id % 100
    ev["qi_date"] = ev.ts.dt.date
    ev["sens"] = np.floor(ev.value).astype("int64") % 10
    cls = ev.groupby(["qi_bucket", "qi_date", "event_type"]).agg(
        k=("event_id", "size"), l_div=("sens", "nunique")
    )
    hist = cls.groupby("k").agg(
        n_classes=("k", "size"), avg_l=("l_div", "mean")
    )
    assert set(got) == set(hist.index)
    for kk, row in hist.iterrows():
        assert got[kk]["n_classes"] == row["n_classes"]
        assert got[kk]["n_rows"] == kk * row["n_classes"]
        assert got[kk]["avg_l_diversity"] == pytest.approx(
            row["avg_l"], abs=1e-6
        )
        assert got[kk]["meets_k5"] == (kk >= 5)


def test_dp_noise_matches_hand_laplace(spark, sf_dir):
    import hashlib
    import math

    from crypto_data_ingestion_script_spark.operators.quality import (
        DP_CLAMP,
        DP_EPS,
    )

    rows = SPECS["q_dp_noise"].fn(spark, sf_dir).collect()
    assert rows, "no arms released"

    def lap(event_type, tag, scale):
        h = hashlib.md5(f"dp-{event_type}-{tag}".encode()).hexdigest()
        u = int(h[:8], 16) / 4294967296.0
        return -scale * math.copysign(1.0, u - 0.5) * math.log(
            1 - 2 * abs(u - 0.5)
        )

    for r in rows:
        want_c = r["true_count"] + lap(r["event_type"], "c", 1.0 / DP_EPS)
        want_s = r["true_clamped_sum"] + lap(
            r["event_type"], "s", DP_CLAMP / DP_EPS
        )
        assert r["noisy_count"] == pytest.approx(want_c, abs=1e-5)
        assert r["noisy_sum"] == pytest.approx(want_s, abs=1e-5)
        # clamped sum really is bounded by n * clamp
        assert 0 <= r["true_clamped_sum"] <= r["true_count"] * DP_CLAMP


# ---- batch 4: attribution / streaming top-k ----


def test_attribution_matches_pandas(spark, sf_dir):
    got = {
        r["channel"]: r
        for r in SPECS["q_attribution"].fn(spark, sf_dir).collect()
    }
    ev = (
        pq.read_table(f"{sf_dir}/events.parquet")
        .to_pandas()
        .sort_values(["user_id", "ts", "event_id"])
    )
    agg = {}
    for _, g in ev.groupby("user_id"):
        touch_ts, touch_ty = None, None
        for _, r in g.iterrows():
            if r.event_type in ("click", "view"):
                touch_ts, touch_ty = r.ts, r.event_type
            if r.event_type == "purchase":
                if touch_ts is not None and touch_ts >= r.ts - pd.Timedelta(
                    minutes=60
                ):
                    ch = touch_ty
                else:
                    ch = "direct"
                n, v = agg.get(ch, (0, 0.0))
                agg[ch] = (n + 1, v + r.value)
    assert set(got) == set(agg)
    for ch, (n, v) in agg.items():
        assert got[ch]["n_conversions"] == n
        assert got[ch]["attributed_value"] == pytest.approx(v, abs=1e-3)


def test_stream_topk_rank_structure(spark, sf_dir):
    rows = SPECS["q_stream_topk"].fn(spark, sf_dir).collect()
    by_hour = {}
    for r in rows:
        by_hour.setdefault(r["hour_ts"], []).append(r)
    for hour, rs in by_hour.items():
        rs.sort(key=lambda r: r["rnk"])
        assert [r["rnk"] for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= 3
        ns = [r["n"] for r in rs]
        assert ns == sorted(ns, reverse=True)


# ---- batch 7: watermark lateness / rolling correlation ----


def test_watermark_lateness_matches_pandas(spark, sf_dir):
    got = {
        r["late_bucket_min"]: r
        for r in SPECS["q_watermark_lateness"].fn(spark, sf_dir).collect()
    }
    ev = (
        pq.read_table(f"{sf_dir}/events.parquet", columns=["event_id", "ts"])
        .to_pandas()
        .sort_values("event_id")
    )
    frontier = ev["ts"].cummax()
    late_min = (
        ((frontier - ev["ts"]).dt.total_seconds() // 60)
        .astype("int64")
        .clip(upper=10)
    )
    ref = late_min.value_counts().sort_index()
    assert set(got) == set(ref.index)
    n = len(ev)
    for b, cnt in ref.items():
        assert got[b]["n_events"] == cnt
        assert got[b]["share"] == pytest.approx(cnt / n, abs=1e-8)
        assert got[b]["within_5m_watermark"] == (b <= 5)


def test_rolling_corr_matches_pandas(spark, sf_dir):
    from crypto_data_ingestion_script_spark.operators.finance import (
        ROLL_CORR_W,
    )

    rows = SPECS["q_rolling_corr"].fn(spark, sf_dir).collect()
    ev = pq.read_table(
        f"{sf_dir}/events.parquet", columns=["ts", "event_type", "value"]
    ).to_pandas()
    ev = ev[ev.event_type.isin(["click", "purchase"])]
    ev["hour"] = ev.ts.dt.floor("h")
    bars = (
        ev.sort_values("ts")
        .groupby(["event_type", "hour"])["value"]
        .last()
        .unstack(0)
        .dropna()
    )
    roll = (
        bars["click"]
        .rolling(ROLL_CORR_W)
        .corr(bars["purchase"])
        .dropna()
    )
    got = {r["hour_ts"]: r["roll_corr"] for r in rows}
    assert len(got) == len(roll)
    for hour, want in roll.items():
        assert got[hour.to_pydatetime()] == pytest.approx(want, abs=1e-5)


# ---- batch 8: skew diagnostic / compaction planning ----


def test_skew_stats_matches_pandas(spark, sf_dir):
    row = SPECS["q_skew_stats"].fn(spark, sf_dir).collect()[0]
    ev = pq.read_table(
        f"{sf_dir}/events.parquet", columns=["user_id"]
    ).to_pandas()
    kc = ev.groupby("user_id").size()
    assert row["n_keys"] == len(kc)
    assert row["n_rows"] == int(kc.sum())
    assert row["max_key_rows"] == int(kc.max())
    assert row["p99_key_rows"] == pytest.approx(
        np.quantile(kc.to_numpy(), 0.99, method="linear"), abs=1e-3
    )
    assert row["skew_ratio"] == pytest.approx(
        kc.max() / kc.mean(), abs=1e-3
    )
    want = (
        "broadcast"
        if len(kc) <= 10000
        else ("salt_or_aqe_skew_join" if kc.max() / kc.mean() > 20
              else "plain_shuffle_join")
    )
    assert row["recommended_strategy"] == want


def test_compaction_plan_invariants(spark, sf_dir):
    from crypto_data_ingestion_script_spark.operators.layout import (
        COMPACT_TARGET,
    )

    rows = SPECS["q_compaction_plan"].fn(spark, sf_dir).collect()
    docs = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source", "n_chars"]
    ).to_pandas()
    files = (
        docs.assign(file_id=docs.doc_id % 7)
        .groupby(["source", "file_id"])["n_chars"]
        .sum()
        .reset_index()
    )
    # plan conserves bytes and files per source
    for src, g in files.groupby("source"):
        mine = [r for r in rows if r["source"] == src]
        assert sum(r["n_files"] for r in mine) == len(g)
        assert sum(r["bin_bytes"] for r in mine) == int(g["n_chars"].sum())
        # offset-binning: bin index of each file equals
        # floor(exclusive_prefix / target) over file_id order
        gg = g.sort_values("file_id")
        prefix = gg["n_chars"].cumsum().shift(fill_value=0)
        want_bins = (prefix // COMPACT_TARGET).astype(int)
        got_bins = sorted(
            b for r in mine for b in [r["bin"]] * r["n_files"]
        )
        assert got_bins == sorted(want_bins.tolist())
    # compaction actually compacts: fewer bins than files overall
    assert sum(r["n_files"] for r in rows) > len(rows)


# ---- batch 10: sources/sinks / engagement ----


def test_scan_text_roundtrip_bytes_exact(spark, sf_dir):
    rows = SPECS["q_scan_text_roundtrip"].fn(spark, sf_dir).collect()
    docs = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).to_pandas()
    want = docs[docs.doc_id < 100].set_index("doc_id")["text"]
    assert len(rows) == len(want)
    for r in rows:
        assert r["text"] == want[r["doc_id"]]


def test_sink_partitioned_prunes(spark, sf_dir):
    import os
    import tempfile

    from crypto_data_ingestion_script_spark.catalog import load as _load

    t = _load(spark, sf_dir)
    out = os.path.join(tempfile.mkdtemp(prefix="prune_t_"), "ev")
    (
        t.events.withColumn("event_date", F.col("ts").cast("date"))
        .write.mode("overwrite")
        .partitionBy("event_date")
        .parquet(out)
    )
    back = spark.read.parquet(out).filter(
        F.col("event_date").between("2024-01-08", "2024-01-14")
    )
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    # the scan's selected partition count equals the week, not the month
    n_dirs = len(
        [p for p in os.listdir(out) if p.startswith("event_date=")]
    )
    sel = back.select("event_date").distinct().count()
    assert sel <= 7 < n_dirs


def test_stickiness_matches_pandas(spark, sf_dir):
    got = {
        r["week_start"]: r
        for r in SPECS["q_stickiness"].fn(spark, sf_dir).collect()
    }
    ev = pq.read_table(
        f"{sf_dir}/events.parquet", columns=["ts", "user_id"]
    ).to_pandas()
    ev["d"] = ev.ts.dt.date
    ev["wk"] = ev.ts.dt.to_period("W-SUN").apply(
        lambda p: p.start_time.date()
    )
    for wk, g in ev.groupby("wk"):
        wau = g.user_id.nunique()
        dau = g.groupby("d")["user_id"].nunique()
        r = got[wk]
        assert r["wau"] == wau
        assert r["n_days"] == len(dau)
        assert r["avg_dau"] == pytest.approx(dau.mean(), abs=1e-3)
        assert r["stickiness"] == pytest.approx(
            dau.mean() / wau, abs=1e-5
        )
