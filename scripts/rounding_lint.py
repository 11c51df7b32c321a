"""Rounding-contract lint (VERDICT r11 task 2): flag every registered
query that EMITS an unrounded double column.

The r10 postmortem class: six hash divergences, all one shape — a
DoubleType aggregate emitted raw, agreeing with the oracle at the
canonical hash's 6dp canonicalization only until a value lands near a
6dp boundary where Spark and DuckDB differ at ulp level. The repo's
contract is therefore: every emitted float column is either (a) rounded
in LOCKSTEP on both engines (F.round(x, k) / round(x, k), k <= 8), or
(b) EXACT — bit-identical on both engines by construction (integer
counts cast to double, dyadic rationals k/2^m with short decimal forms,
raw parquet passthrough) — and the exactness must be adjudicated here,
not assumed.

Detection is dynamic, not static: a value produced by F.round(x, k<=8)
is invariant under round(., 8) (an 8dp-representable decimal), so any
float column containing values NOT invariant under round(., 8) was
emitted unrounded. Exact-by-construction emitters also satisfy the
invariant when their values are short decimals (counts, 2dp prices,
k/32 match fractions); the residue that does not is exactly the risk
class. Flagged queries must be fixed (round 8dp in lockstep) or added
to WHITELIST with a written exactness rationale; the lint exits nonzero
while any flagged query is unadjudicated, and the artifact
(ROUNDING_LINT_r{N}.json) lists every emitter either way.

Usage: python scripts/rounding_lint.py [sf_dir] [out.json]
  sf_dir: default /root/testdata/sf0.01 (the sweep's correctness scale)
"""
from __future__ import annotations

import json
import math
import sys

import numpy as np
import pandas.api.types as pt
from pyspark.sql import SparkSession

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/rounding_lint.json"

#: Adjudicated-exact emitters: {query: {column: rationale}}. A column
#: lands here ONLY with a written argument that both engines emit the
#: bit-identical double (no floating-point operation whose result
#: depends on summation order or libm).
WHITELIST: dict = {}


def _unrounded(vals: np.ndarray) -> tuple[int, float | None]:
    """Count finite values not invariant under round(., 8)."""
    finite = vals[np.isfinite(vals)]
    if len(finite) == 0:
        return 0, None
    bad = finite[np.round(finite, 8) != finite]
    if len(bad) == 0:
        return 0, None
    return int(len(bad)), float(bad[0])


def main() -> int:
    spark = SparkSession.builder.master("local[8]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import os

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from crypto_data_ingestion_script_spark.sources.custom import register

    register(spark)
    import __spark_entry__ as e

    qs = e.queries()
    flagged: dict = {}
    whitelisted: dict = {}
    clean = 0
    errors: dict = {}
    for name in sorted(qs):
        try:
            pdf = qs[name](spark, SF_DIR).toPandas()
        except Exception as ex:  # noqa: BLE001 - lint must survive one bad op
            errors[name] = f"{type(ex).__name__}: {str(ex)[:200]}"
            continue
        cols: dict = {}
        for c in pdf.columns:
            if not pt.is_float_dtype(pdf[c]):
                continue
            n_bad, example = _unrounded(
                pdf[c].to_numpy(dtype="float64", na_value=math.nan)
            )
            if n_bad:
                cols[c] = {"n_unrounded": n_bad, "example": example}
        if not cols:
            clean += 1
            continue
        wl = WHITELIST.get(name, {})
        adjudicated = {c: wl[c] for c in cols if c in wl}
        remaining = {c: cols[c] for c in cols if c not in wl}
        if adjudicated:
            whitelisted[name] = adjudicated
        if remaining:
            flagged[name] = remaining
    artifact = {
        "sf_dir": SF_DIR,
        "n_queries": len(qs),
        "n_clean": clean,
        "n_errors": len(errors),
        "errors": errors,
        "whitelisted": whitelisted,
        "flagged": flagged,
    }
    with open(OUT, "w") as f:
        json.dump(artifact, f, indent=1, sort_keys=True)
    print(
        f"ROUNDING LINT: {len(qs)} queries, {clean} clean, "
        f"{len(whitelisted)} whitelisted, {len(flagged)} FLAGGED, "
        f"{len(errors)} errors -> {OUT}"
    )
    for name, cols in sorted(flagged.items()):
        print(f"  FLAGGED {name}: {cols}")
    return 1 if flagged or errors else 0


if __name__ == "__main__":
    raise SystemExit(main())
