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


def money_sum(col: Column | str, scale: int = 2) -> Column:
    """Order-independent money aggregate (round-3 scale fix).

    ``round(sum(double), 2)`` is NOT reproducible at volume: double
    summation error grows ~sqrt(n)·ulp(total), and at sf1 a 6M-row
    revenue group's error (~1e-3) straddles cent boundaries, so Spark
    and DuckDB — summing in different partition orders — disagree in
    the 2nd decimal (caught by the sf1 sweep: c2, j10).  The fix is the
    contract TPC-H itself uses: money is DECIMAL.  Each term is cast to
    DECIMAL(20,4) (exact per-term: a binary double can never tie at the
    4th decimal, so the cast rounds identically on every engine), the
    sum is exact integer arithmetic — order-independent — and the final
    cent rounding is decimal HALF-AWAY, which Spark and DuckDB agree on
    (verified in tests/test_dtype_declared.py).

    The term quantization must itself be engine-stable: a RAW
    double→decimal cast is not (Spark rounds the exact binary
    expansion via BigDecimal.setScale; DuckDB rounds ``x·10⁴`` computed
    in double — they disagree on ~1 in 4 fixture charge values at the
    4th decimal).  So each term goes through ``dround(x, 4)`` first —
    bit-identical to DuckDB ``round(x, 4)`` by construction — and THEN
    the decimal cast, which both engines round identically because the
    quantized double sits ~1e-11 from its decimal value, never near a
    cast boundary.

    Oracle-side idiom (must pair with this):
    ``round(sum(CAST(round(expr, 4) AS DECIMAL(20,4))), 2)::DOUBLE``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.round(F.sum(dround(c, 4).cast("decimal(20,4)")), scale).cast("double")


def money_avg(col: Column | str, scale: int = 2) -> Column:
    """Order-independent money average: exact decimal sum ÷ exact
    count in ONE double division (identical IEEE op on both engines),
    then dround.  Oracle idiom:
    ``round(sum(CAST(round(x, 4) AS DECIMAL(20,4)))::DOUBLE / count(x), 2)``."""
    c = F.col(col) if isinstance(col, str) else col
    return dround(
        F.sum(dround(c, 4).cast("decimal(20,4)")).cast("double") / F.count(c), scale
    )
