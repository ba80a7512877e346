"""Local mirror of the driver's Spark-vs-DuckDB differential oracle.

The driver compares row-count + schema + order-insensitive value-hash
(SURVEY.md §5 layer 1).  This mirror is intentionally at least as
strict: it canonicalizes every cell to a string (floats via repr of a
12-significant-digit round, timestamps via isoformat), sorts columns by
name and rows lexicographically, and requires exact equality.  A query
passing here should pass the driver.
"""

from __future__ import annotations

import math
from datetime import date, datetime

import duckdb
import pandas as pd
from pyspark.sql import DataFrame


def _canon_cell(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0.0:
            v = 0.0  # normalize -0.0
        # 12 significant digits: strict enough to catch real bugs, loose
        # enough to absorb float64 print-formatting differences.
        return f"{v:.12g}"
    if isinstance(v, (pd.Timestamp, datetime)):
        if getattr(v, "tzinfo", None) is not None:
            v = v.tz_convert("UTC").tz_localize(None) if isinstance(v, pd.Timestamp) else v
        return v.isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon_cell(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{_canon_cell(x)}" for k, x in sorted(v.items())) + "}"
    if isinstance(v, bool):
        return "true" if v else "false"
    return str(v)


def _canon_frame(df: pd.DataFrame) -> list[tuple[str, ...]]:
    cols = sorted(df.columns)
    rows = []
    for _, row in df.iterrows():
        rows.append(tuple(_canon_cell(row[c]) for c in cols))
    rows.sort()
    return rows


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
