"""Local mirror of the driver's Spark-vs-DuckDB differential oracle.

The driver compares row-count + schema + an order-insensitive value-hash
that is TYPE-SENSITIVE: an int64 ``8753`` and a float64 ``8753.0`` hash
differently (round-1 driver failures ``f3_math_funcs`` and
``s4_text_roundtrip`` were numerically identical and differed only in
dtype).  This mirror must therefore be at least as strict on types as on
values:

* cells are canonicalized with a TYPE TAG (``i:``/``f:``/``b:``/...) so
  int vs float can never collapse to the same string;
* canonicalization walks COLUMNS, not ``iterrows()`` rows — ``iterrows``
  upcasts ints to floats whenever a row mixes dtypes, which silently
  erased the very distinction the driver checks;
* ``compare`` additionally asserts the pandas dtype FAMILY
  (integer/float/bool/datetime/other) of every column matches between the
  Spark ``toPandas()`` frame and the DuckDB ``fetchdf()`` frame.

A query passing here should pass the driver; ``tests/test_oracle_utils.py``
pins the 8753-vs-8753.0 regression.
"""

from __future__ import annotations

import math
from datetime import date, datetime
from decimal import Decimal

import duckdb
import numpy as np
import pandas as pd
from pyspark.sql import DataFrame


def _canon_cell(v) -> str:
    if v is None or v is pd.NaT or v is pd.NA:
        return "NULL"
    # bool before int: bool is an int subclass.
    if isinstance(v, (bool, np.bool_)):
        return "b:true" if v else "b:false"
    if isinstance(v, (int, np.integer)):
        return f"i:{int(v)}"
    if isinstance(v, (float, np.floating)):
        v = float(v)
        if math.isnan(v):
            return "f:NaN"
        if v == 0.0:
            v = 0.0  # normalize -0.0
        # 12 significant digits: strict enough to catch real bugs, loose
        # enough to absorb float64 print-formatting differences.
        return f"f:{v:.12g}"
    if isinstance(v, (pd.Timestamp, datetime)):
        if getattr(v, "tzinfo", None) is not None:
            v = v.tz_convert("UTC").tz_localize(None) if isinstance(v, pd.Timestamp) else v
        return f"t:{v.isoformat()}"
    if isinstance(v, date):
        return f"t:{v.isoformat()}"
    if isinstance(v, Decimal):
        # Both engines surface DecimalType as decimal.Decimal at matching
        # scale; tag distinctly from int/float so a decimal-vs-double skew
        # is visible.
        return f"d:{v}"
    if isinstance(v, bytes):
        return "x:" + v.hex()
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(_canon_cell(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{_canon_cell(x)}" for k, x in sorted(v.items())) + "}"
    return "s:" + str(v)


def _canon_frame(df: pd.DataFrame) -> list[tuple[str, ...]]:
    cols = sorted(df.columns)
    # Column-wise: Series.tolist() preserves each column's dtype (int64 ->
    # Python int, float64 -> Python float); iterrows() would upcast mixed
    # rows and destroy the int/float distinction the driver hashes.
    canon_cols = [[_canon_cell(v) for v in df[c].tolist()] for c in cols]
    if not canon_cols:
        return []
    rows = [tuple(col[i] for col in canon_cols) for i in range(len(df))]
    rows.sort()
    return rows


def _dtype_family(s: pd.Series) -> str:
    dt = s.dtype
    if pd.api.types.is_bool_dtype(dt):
        return "bool"
    if pd.api.types.is_integer_dtype(dt):
        return "int"
    if pd.api.types.is_float_dtype(dt):
        return "float"
    if pd.api.types.is_datetime64_any_dtype(dt):
        return "datetime"
    return "object"


def dtype_families(df: pd.DataFrame) -> dict[str, str]:
    return {c: _dtype_family(df[c]) for c in df.columns}


def assert_dtype_aligned(sp: pd.DataFrame, du: pd.DataFrame, label: str = "") -> None:
    """Assert every shared column has the same pandas dtype family.

    This is the driver-visible signal: int64 vs float64 on numerically
    identical values fails the driver hash.
    """
    skew = {
        c: (fam_sp, fam_du)
        for c, fam_sp, fam_du in (
            (c, _dtype_family(sp[c]), _dtype_family(du[c])) for c in sp.columns if c in du.columns
        )
        if fam_sp != fam_du
    }
    assert not skew, (
        f"dtype-family skew {label}: {{col: (spark, duckdb)}} = {skew} — "
        "the driver hash is type-sensitive; cast the oracle (::BIGINT / ::DOUBLE) "
        "or the Spark column until families match"
    )


def compare(
    spark_df: DataFrame,
    sql: str,
    con: duckdb.DuckDBPyConnection,
    max_report: int = 5,
) -> None:
    """Assert the Spark result and the DuckDB oracle result match."""
    sp = spark_df.toPandas()
    du = con.execute(sql).fetchdf()

    assert sorted(sp.columns) == sorted(du.columns), (
        f"schema mismatch: spark={sorted(sp.columns)} duckdb={sorted(du.columns)}"
    )
    assert len(sp) == len(du), f"row count mismatch: spark={len(sp)} duckdb={len(du)}"
    assert_dtype_aligned(sp, du)

    a, b = _canon_frame(sp), _canon_frame(du)
    if a != b:
        diffs = [(x, y) for x, y in zip(a, b) if x != y][:max_report]
        only_a = [r for r in a if r not in set(b)][:max_report]
        only_b = [r for r in b if r not in set(a)][:max_report]
        raise AssertionError(
            f"value mismatch ({len(only_a)}+ spark-only rows shown)\n"
            f"first differing aligned pairs: {diffs}\n"
            f"spark-only: {only_a}\nduckdb-only: {only_b}\n"
            f"columns (sorted): {sorted(sp.columns)}"
        )
