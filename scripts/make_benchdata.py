#!/usr/bin/env python
"""Derive bench-scale datasets from the driver's read-only sf0.1 testdata.

Two outputs under benchdata/ (gitignored — regenerate on demand, ~20 s):

- ``benchdata/sf0.1mrg`` — the SAME rows as /root/testdata/sf0.1, re-written
  as 32 files per big table. The driver's testdata has exactly ONE row group
  per table (BASELINE.md round-2 floor decomposition), so a scan can never
  exceed 1 task regardless of split size; this layout is the control that
  isolates "parallelizable layout" from "more data".
- ``benchdata/sf1`` — 10× scale via key-offset replication: replica r adds
  r·10⁹ to every join/identity key (custkey, orderkey, partkey, suppkey,
  event_id, user_id, doc_id, vec_id), so referential integrity, join
  fan-outs, and per-key group sizes are preserved while row counts scale
  10×. Dimension distributions (dates, flags, nations) are unchanged —
  group-by cardinalities on those stay constant, matching how a real
  warehouse grows. Probe predicates (vec_id < 5, doc_id < 50) keep constant
  selectivity-in-rows: only replica 0 matches, which is exactly the ANN /
  top-k scaling contract (fixed query set, growing corpus).

Each big table is written as a directory ``<table>.parquet/part-NN.parquet``
(spark.read.parquet and DuckDB's glob both handle it) with ~2 row groups per
file — 32 files × 2 row groups ≥ 64 splittable units, so both engines
parallelize the scan. Small dims stay single-file (broadcast sides).

A third, on-demand output extends the ladder one more decade for the scale
leg (VERDICT r8 task 1):

- ``benchdata/sf10`` — 100× replication by the same key-offset scheme
  (``--extra sf10=100``; ~60M-row lineitem, 500k docs). Written alone, not
  with the default pair, because it is only needed for BENCH_scale runs.

Usage: python scripts/make_benchdata.py [--src /root/testdata/sf0.1]
       python scripts/make_benchdata.py --extra sf10=100
"""
from __future__ import annotations

import argparse
import os
import shutil

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

STRIDE = 10**9  # key offset per replica; far above any sf0.1 key

#: int64 identity/join keys to offset per replica, per table.
OFFSET_COLS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "region": [],
    "nation": [],
}

#: Tables replicated at sf1 (dims like region/nation keep their 5/25 rows).
REPLICATED = {k for k, v in OFFSET_COLS.items() if v}

N_FILES = 32  # files per big table -> scan parallelism on local[32]
SMALL_TABLE_ROWS = 30_000  # below this, keep a single file (broadcast dims)


def _offset_replica(tbl: pa.Table, cols: list[str], r: int) -> pa.Table:
    if r == 0 or not cols:
        return tbl
    for c in cols:
        idx = tbl.schema.get_field_index(c)
        tbl = tbl.set_column(
            idx, tbl.schema.field(idx), pc.add(tbl.column(c), r * STRIDE)
        )
    return tbl


def _write_split(tbl: pa.Table, dest: str) -> None:
    """Write tbl as dest (file) or dest/part-NN.parquet (32-file dir)."""
    if os.path.exists(dest):
        shutil.rmtree(dest) if os.path.isdir(dest) else os.remove(dest)
    n = tbl.num_rows
    if n < SMALL_TABLE_ROWS:
        pq.write_table(tbl, dest)
        return
    os.makedirs(dest)
    per_file = -(-n // N_FILES)
    for i in range(N_FILES):
        chunk = tbl.slice(i * per_file, per_file)
        if chunk.num_rows == 0:
            break
        pq.write_table(
            chunk,
            os.path.join(dest, f"part-{i:02d}.parquet"),
            row_group_size=max(1, -(-chunk.num_rows // 2)),
        )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default=os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "benchdata"))
    ap.add_argument("--replicas", type=int, default=10)
    ap.add_argument(
        "--extra",
        default=None,
        help="write ONLY benchdata/<name> at <replicas>x, e.g. sf10=100",
    )
    args = ap.parse_args()

    if args.extra:
        name, _, reps = args.extra.partition("=")
        out_dir = os.path.join(args.out, name)
        os.makedirs(out_dir, exist_ok=True)
        replicas = int(reps or 100)
        for tname, cols in OFFSET_COLS.items():
            tbl = pq.read_table(os.path.join(args.src, f"{tname}.parquet"))
            if tname in REPLICATED:
                big = pa.concat_tables(
                    _offset_replica(tbl, cols, r) for r in range(replicas)
                )
            else:
                big = tbl
            _write_split(big, os.path.join(out_dir, f"{tname}.parquet"))
            print(f"{tname}: sf0.1 {tbl.num_rows} rows -> {name} {big.num_rows} rows")
        return

    mrg_dir = os.path.join(args.out, "sf0.1mrg")
    sf1_dir = os.path.join(args.out, "sf1")
    os.makedirs(mrg_dir, exist_ok=True)
    os.makedirs(sf1_dir, exist_ok=True)

    for name, cols in OFFSET_COLS.items():
        src = os.path.join(args.src, f"{name}.parquet")
        tbl = pq.read_table(src)
        # layout-only rewrite (same rows, 32 files)
        _write_split(tbl, os.path.join(mrg_dir, f"{name}.parquet"))
        # 10x replication with key offsets
        if name in REPLICATED:
            big = pa.concat_tables(
                _offset_replica(tbl, cols, r) for r in range(args.replicas)
            )
        else:
            big = tbl
        _write_split(big, os.path.join(sf1_dir, f"{name}.parquet"))
        print(f"{name}: sf0.1 {tbl.num_rows} rows -> sf1 {big.num_rows} rows")


if __name__ == "__main__":
    main()
