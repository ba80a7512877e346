"""Regression tests for the local oracle mirror's type sensitivity.

Round 1 shipped a mirror whose ``_canon_cell`` collapsed ``8753`` (int)
and ``8753.0`` (float) to the same string, so it certified queries the
type-sensitive driver hash failed (``f3_math_funcs``,
``s4_text_roundtrip``).  These tests pin the fixed behavior.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from tests.oracle_utils import _canon_cell, _canon_frame, assert_dtype_aligned, dtype_families


def test_int_and_float_canonicalize_differently():
    assert _canon_cell(8753) != _canon_cell(8753.0)
    assert _canon_cell(np.int64(8753)) != _canon_cell(np.float64(8753.0))
    assert _canon_cell(np.int64(8753)) == _canon_cell(8753)
    assert _canon_cell(np.float64(8753.0)) == _canon_cell(8753.0)


def test_bool_is_not_int():
    assert _canon_cell(True) != _canon_cell(1)
    assert _canon_cell(False) != _canon_cell(0)


def test_canon_frame_is_columnwise_not_iterrows():
    # iterrows() upcasts the int column of a mixed int/float row to float,
    # which would erase the driver-visible distinction.  The column-wise
    # walk must keep the int column canonical as i:.
    df = pd.DataFrame({"a": pd.Series([1, 2], dtype="int64"), "b": [1.5, 2.5]})
    rows = _canon_frame(df)
    assert rows == [("i:1", "f:1.5"), ("i:2", "f:2.5")]


def test_large_int64_not_corrupted():
    # > 2^53: float64 round-trip would corrupt it; column-wise tolist()
    # must preserve exact integers.
    big = 9007199254740993
    df = pd.DataFrame({"a": pd.Series([big], dtype="int64"), "b": [0.5]})
    assert _canon_frame(df) == [(f"i:{big}", "f:0.5")]


def test_dtype_family_skew_detected():
    sp = pd.DataFrame({"x": pd.Series([1, 2], dtype="int64")})
    du = pd.DataFrame({"x": pd.Series([1.0, 2.0], dtype="float64")})
    with pytest.raises(AssertionError, match="dtype-family skew"):
        assert_dtype_aligned(sp, du)


def test_dtype_family_match_passes():
    sp = pd.DataFrame({"x": pd.Series([1, 2], dtype="int64"), "y": ["a", "b"]})
    du = pd.DataFrame({"x": pd.Series([5, 6], dtype="int64"), "y": ["c", "d"]})
    assert_dtype_aligned(sp, du)  # values differ, families match — no raise
    assert dtype_families(sp) == {"x": "int", "y": "object"}


def test_null_and_nan_tags():
    assert _canon_cell(None) == "NULL"
    assert _canon_cell(pd.NaT) == "NULL"
    assert _canon_cell(float("nan")) == "f:NaN"
    assert _canon_cell(-0.0) == _canon_cell(0.0)
