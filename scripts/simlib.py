"""Shared driver-sim comparison semantics: the strict column/row/dtype/
value check both `driver_sim.py` (full 243-query sweep at sf0.01) and
`sim_sf1.py` (structural subset at benchdata/sf1) apply, kept in ONE place
so the two artifacts can never drift in what "green" means.

Mirrors the grading driver: sort columns by name, compare row counts,
flag int-vs-float dtype drift, then order-insensitive value comparison
(non-float sort keys first, floats rounded as tiebreak — a float primary
sort key lets sub-tolerance engine noise flip the order of tied rows,
misaligning every other column; observed q_entropy at sf0.001).
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pandas.api.types as pt


def compare_frames(s: pd.DataFrame, o: pd.DataFrame):
    """Compare a Spark result `s` against an oracle result `o`.

    Returns (status, err): status is "ok" or one of
    "cols" / "rows" / "dtype" / "values"; err carries the detail.
    Mutates working copies only.
    """
    s = s.reindex(sorted(s.columns), axis=1)
    o = o.reindex(sorted(o.columns), axis=1)
    if list(s.columns) != list(o.columns):
        return "cols", f"{list(s.columns)} vs {list(o.columns)}"
    if len(s) != len(o):
        return "rows", f"{len(s)} vs {len(o)}"
    s = s.copy()
    o = o.copy()
    for c in s.columns:
        if pt.is_datetime64_any_dtype(s[c]):
            s[c] = s[c].astype("datetime64[us]")
        if pt.is_datetime64_any_dtype(o[c]):
            o[c] = o[c].astype("datetime64[us]")
        si, oi = pt.is_integer_dtype(s[c]), pt.is_integer_dtype(o[c])
        sf_, of = pt.is_float_dtype(s[c]), pt.is_float_dtype(o[c])
        if (si and of) or (sf_ and oi):
            return "dtype", f"{c}: {s[c].dtype} vs {o[c].dtype}"
    for c in s.columns:
        if s[c].dtype == object:
            s[c] = s[c].map(
                lambda v: tuple(v) if isinstance(v, (list, np.ndarray)) else v,
                na_action="ignore",
            )
        if o[c].dtype == object:
            o[c] = o[c].map(
                lambda v: tuple(v) if isinstance(v, (list, np.ndarray)) else v,
                na_action="ignore",
            )

    def _sorted(df):
        tmp = df.copy()
        key = [c for c in df.columns if not pt.is_float_dtype(df[c])]
        for c in df.columns:
            if pt.is_float_dtype(df[c]):
                tmp["__r_" + c] = df[c].round(6)
                key.append("__r_" + c)
        try:
            return tmp.sort_values(by=key, kind="mergesort").reset_index(
                drop=True
            )[list(df.columns)]
        except Exception:
            key = [c for c in key if not c.startswith("__r_")]
            return tmp.sort_values(by=key, kind="mergesort").reset_index(
                drop=True
            )[list(df.columns)]

    s2 = _sorted(s)
    o2 = _sorted(o)
    for c in s2.columns:
        if pt.is_float_dtype(s2[c]) or pt.is_float_dtype(o2[c]):
            a = pd.to_numeric(s2[c], errors="coerce").astype(float).fillna(
                1.2345e300
            )
            b = pd.to_numeric(o2[c], errors="coerce").astype(float).fillna(
                1.2345e300
            )
            if not np.allclose(a, b, rtol=1e-7, atol=1e-9):
                return "values", c
        else:
            if not (
                s2[c].fillna("\0N").astype(str)
                == o2[c].fillna("\0N").astype(str)
            ).all():
                return "values", c
    return "ok", None


def canonical_hash(df: pd.DataFrame) -> str:
    """Canonical value hash reproducing the grading driver's comparison
    posture (CORRECTNESS_r{N}.json `hash_match`): columns sorted by name,
    rows sorted by every column (floats via their 6dp rounding, the same
    key rule _sorted uses), then sha256 over a deterministic per-cell
    serialization — ints canonicalized through int(), floats through
    repr(round(x, 6)), NULLs as a sentinel, arrays as tuples. The driver's
    exact serialization is not public; this form is validated by running
    it next to compare_frames over the full registry (`--strict-driver`)
    and recording any query where the two verdicts DIVERGE — a divergence
    means column-order/dtype assumptions differ, not necessarily a wrong
    result, and is the thing the artifact exists to surface."""
    import hashlib

    df = df.reindex(sorted(df.columns), axis=1).copy()
    for c in df.columns:
        if pt.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        if df[c].dtype == object:
            df[c] = df[c].map(
                lambda v: tuple(v) if isinstance(v, (list, np.ndarray)) else v,
                na_action="ignore",
            )

    def cell(v):
        import datetime as _dt

        if v is None or (isinstance(v, float) and np.isnan(v)):
            return "\0N"
        if isinstance(v, (bool, np.bool_)):
            return str(bool(v))
        if isinstance(v, (int, np.integer)):
            return str(int(v))
        if isinstance(v, (float, np.floating)):
            return repr(round(float(v), 6))
        # Dates and timestamps canonicalize to one ISO form: Spark's
        # DateType arrives as datetime.date objects while DuckDB's DATE
        # cast arrives as midnight datetime64 — str() of those differ
        # ('2026-01-01' vs '2026-01-01 00:00:00') even though the values
        # are equal (found by --strict-driver on q_retention/q_sink_bronze).
        if isinstance(v, (_dt.date, _dt.datetime, pd.Timestamp)):
            return pd.Timestamp(v).isoformat()
        return str(v)

    rows = [tuple(cell(v) for v in row) for row in df.itertuples(index=False)]
    rows.sort()
    h = hashlib.sha256()
    h.update(("|".join(df.columns) + "\n").encode())
    for r in rows:
        h.update(("\x1f".join(r) + "\n").encode())
    return h.hexdigest()
