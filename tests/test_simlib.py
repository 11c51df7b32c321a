"""The shared driver-sim comparator (scripts/simlib.py) IS the local
definition of "green" for both the sf0.01 full sweep and the sf1
structural sweep — so its own semantics need pinning: the checks it must
flag (column drift, row drift, int-vs-float dtype drift, value drift) and
the hazards it must NOT flag (row order, float noise below tolerance,
float-tied rows whose order differs between engines — the q_entropy
sf0.001 incident)."""

import os
import sys

import numpy as np
import pandas as pd

sys.path.insert(
    0,
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "scripts",
    ),
)

from simlib import compare_frames  # noqa: E402


def test_equal_frames_any_order_pass():
    s = pd.DataFrame({"k": [1, 2, 3], "v": [1.0, 2.0, 3.0]})
    o = pd.DataFrame({"v": [3.0, 1.0, 2.0], "k": [3, 1, 2]})
    assert compare_frames(s, o) == ("ok", None)


def test_column_row_and_value_drift_flagged():
    s = pd.DataFrame({"k": [1], "v": [1.0]})
    assert compare_frames(s, pd.DataFrame({"k": [1], "w": [1.0]}))[0] == "cols"
    assert (
        compare_frames(s, pd.DataFrame({"k": [1, 2], "v": [1.0, 2.0]}))[0]
        == "rows"
    )
    assert (
        compare_frames(s, pd.DataFrame({"k": [1], "v": [1.5]}))
        == ("values", "v")
    )


def test_int_vs_float_dtype_drift_flagged():
    s = pd.DataFrame({"k": [1], "v": np.array([1], dtype="int64")})
    o = pd.DataFrame({"k": [1], "v": np.array([1.0], dtype="float64")})
    assert compare_frames(s, o)[0] == "dtype"


def test_sub_tolerance_float_noise_passes():
    s = pd.DataFrame({"k": [1, 2], "v": [1.0, 2.0]})
    o = pd.DataFrame({"k": [1, 2], "v": [1.0 + 1e-12, 2.0 - 1e-12]})
    assert compare_frames(s, o) == ("ok", None)


def test_float_tied_rows_do_not_misalign():
    """Two rows with EQUAL float values but distinct labels: a float
    primary sort key lets 1e-16 engine noise flip their order and
    misalign the label column (observed: q_entropy at sf0.001). The
    comparator must sort by the non-float column first."""
    s = pd.DataFrame({"label": ["a", "b"], "v": [0.5, 0.5]})
    o = pd.DataFrame({"label": ["b", "a"], "v": [0.5 + 1e-16, 0.5]})
    assert compare_frames(s, o) == ("ok", None)


def test_array_valued_object_columns_compare():
    s = pd.DataFrame({"k": [1], "arr": [np.array([1, 2])]})
    o = pd.DataFrame({"k": [1], "arr": [[1, 2]]})
    assert compare_frames(s, o) == ("ok", None)
    o2 = pd.DataFrame({"k": [1], "arr": [[1, 3]]})
    assert compare_frames(s, o2) == ("values", "arr")
