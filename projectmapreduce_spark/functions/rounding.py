"""Cross-engine-stable rounding (SURVEY.md §5 float discipline).

Spark's ``F.round`` on doubles rounds the SHORTEST decimal
representation (JVM ``BigDecimal.valueOf`` → HALF_UP), while DuckDB
rounds the exact binary value via ``std::round(x * 10^n) / 10^n``.
The two disagree whenever the shortest repr lands exactly on a half
boundary (e.g. ``9107.05 * 1.1`` → Spark 10017.76, DuckDB 10017.75).

``dround`` reproduces DuckDB's formula with IEEE double ops on the JVM
side, so both engines round bit-identically.  Validated with zero
mismatches against DuckDB ``round(x, 2)`` over 1.2M+ expression values
from the sf0.1 fixtures (c_acctbal*1.1, revenue and charge
expressions).  Use ``dround`` for EVERY float column in a declared
query; keep plain ``round(x, n)`` on the oracle side.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dround(col: Column | str, scale: int = 2) -> Column:
    """DuckDB-compatible round-half-away-from-zero on doubles."""
    c = F.col(col) if isinstance(col, str) else col
    c = c.cast("double")
    p = F.lit(float(10**scale))
    scaled = c * p
    rounded = F.when(c >= 0, F.floor(scaled + F.lit(0.5))).otherwise(
        -F.floor(-scaled + F.lit(0.5))
    )
    return (rounded / p).cast("double")
