"""Differential harness: run each declared Spark query against its DuckDB
oracle SQL on the same parquet tables and compare row count, column names,
and order-insensitive values — a local mirror of the driver's correctness
gate, so mismatches surface before a round ends.
"""

from __future__ import annotations

import math
import os

import duckdb
import pandas as pd

from crypto_data_ingestion_script_spark.catalog import TABLE_NAMES

REL_TOL = 1e-9
ABS_TOL = 1e-9


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLE_NAMES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None)
        elif df[c].dtype == object:
            import numpy as np

            df[c] = df[c].map(
                lambda v: tuple(v)
                if isinstance(v, (list, tuple, np.ndarray))
                else v,
                na_action="ignore",
            )
    # Row order: NON-float columns lead the sort key, floats participate
    # only ROUNDED (tiebreak) — a float primary key lets sub-tolerance
    # engine noise (~1e-16) flip the order of two rows whose float values
    # tie, misaligning every other column (observed on q_entropy at
    # sf0.001: two sources with equal lang_entropy).
    cols = list(df.columns)
    key = [c for c in cols if not pd.api.types.is_float_dtype(df[c])]
    tmp = df.copy()
    for c in cols:
        if pd.api.types.is_float_dtype(df[c]):
            tmp["__r_" + c] = df[c].round(6)
            key.append("__r_" + c)
    try:
        df = tmp.sort_values(by=key, kind="mergesort")[cols]
    except Exception:
        fkey = [c for c in key if not c.startswith("__r_")]
        df = tmp.sort_values(by=fkey, kind="mergesort")[cols] if fkey else df
    return df.reset_index(drop=True)


def compare(spark_df, oracle_df: pd.DataFrame, name: str) -> list[str]:
    """Return list of mismatch descriptions (empty == pass)."""
    errs: list[str] = []
    sp = spark_df.toPandas()
    if sorted(sp.columns) != sorted(oracle_df.columns):
        errs.append(
            f"{name}: columns differ spark={sorted(sp.columns)} oracle={sorted(oracle_df.columns)}"
        )
        return errs
    if len(sp) != len(oracle_df):
        errs.append(f"{name}: rowcount spark={len(sp)} oracle={len(oracle_df)}")
        return errs
    a, b = _normalize(sp), _normalize(oracle_df)
    for c in a.columns:
        av, bv = a[c], b[c]
        # Type-drift guard: the driver hashes raw values, so an integer column
        # on one side meeting a float column on the other (e.g. DuckDB HUGEINT
        # -> float64 vs Spark BIGINT -> int64) hash-fails even when every value
        # matches.  Coercing here would mask that, so fail loudly instead.
        # (Symmetric null-driven int->float drift leaves BOTH sides float and
        # is not flagged.)
        int_a = pd.api.types.is_integer_dtype(av)
        int_b = pd.api.types.is_integer_dtype(bv)
        float_a = pd.api.types.is_float_dtype(av)
        float_b = pd.api.types.is_float_dtype(bv)
        if (int_a and float_b) or (float_a and int_b):
            errs.append(
                f"{name}: dtype drift on col {c}: spark={av.dtype} oracle={bv.dtype} "
                "(int-vs-float will hash-fail at the driver; align the oracle CAST)"
            )
            continue
        if pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(bv):
            af = pd.to_numeric(av, errors="coerce").astype(float)
            bf = pd.to_numeric(bv, errors="coerce").astype(float)
            both_nan = af.isna() & bf.isna()
            close = [
                bool(n)
                or (
                    not math.isnan(x)
                    and not math.isnan(y)
                    and math.isclose(x, y, rel_tol=REL_TOL, abs_tol=ABS_TOL)
                )
                for x, y, n in zip(af.fillna(float("nan")), bf.fillna(float("nan")), both_nan)
            ]
            if not all(close):
                bad = [i for i, ok in enumerate(close) if not ok][:3]
                errs.append(
                    f"{name}: float col {c} differs at rows {bad}; "
                    f"spark={af.iloc[bad].tolist()} oracle={bf.iloc[bad].tolist()}"
                )
        else:
            eq = (av.fillna("\0NULL") == bv.fillna("\0NULL")) | (av.isna() & bv.isna())
            if not bool(eq.all()):
                bad = [i for i, ok in enumerate(eq) if not ok][:3]
                errs.append(
                    f"{name}: col {c} differs at rows {bad}; "
                    f"spark={av.iloc[bad].tolist()} oracle={bv.iloc[bad].tolist()}"
                )
    return errs
