"""Differential pinning of the money_sum/money_avg contract (round 3).

The sf1 sweep proved ``round(sum(double), 2)`` is not reproducible at
volume (c2/j10 failed by one cent).  These tests pin the repaired
contract at its two failure points:

1. **Order independence** — the same rows summed in opposite orders and
   different partitionings must produce the identical cent value (the
   double path differs in the last ulp; the decimal path cannot).
2. **Engine agreement on the term quantization** — the per-term
   double→decimal(20,4) step must match DuckDB's
   ``CAST(round(x, 4) AS DECIMAL(20,4))`` bit-for-bit across a dense
   sweep of boundary-straddling products (a RAW cast disagrees on ~1 in
   4 fixture charge values; the dround(x,4) pre-quantization is what
   makes it engine-stable).
"""

from __future__ import annotations

import duckdb
import pandas as pd
from pyspark.sql import functions as F

from projectmapreduce_spark.functions import dround, money_avg, money_sum

# Products shaped like fixture charges, dense around 4th-decimal
# boundaries: p * (1 - d) * (1 + t) for 2-decimal prices and taxes.
_PRICES = [round(900.0 + i * 7.77, 2) for i in range(400)]
_RATES = [0.00, 0.01, 0.03, 0.05, 0.07, 0.08, 0.10]


def _terms() -> list[float]:
    out = []
    for i, p in enumerate(_PRICES):
        d = _RATES[i % len(_RATES)]
        t = _RATES[(i * 3 + 1) % len(_RATES)]
        out.append(p * (1 - d) * (1 + t))
    return out


def test_money_sum_is_partition_order_independent(spark):
    terms = _terms()
    fwd = spark.createDataFrame([(x,) for x in terms], "x double").repartition(7)
    rev = spark.createDataFrame([(x,) for x in reversed(terms)], "x double").repartition(3)
    a = fwd.agg(money_sum("x").alias("s"), money_avg("x").alias("m")).collect()[0]
    b = rev.agg(money_sum("x").alias("s"), money_avg("x").alias("m")).collect()[0]
    assert a.s == b.s and a.m == b.m
    # and the double path genuinely differs on SOME permutation at scale
    # (sanity that this test exercises a real hazard, not a tautology):
    # sum of these 400 terms in float differs from decimal only by <1
    # cent, so just assert the decimal result is within a cent of float.
    naive = sum(terms)
    assert abs(a.s - round(naive, 2)) <= 0.01


def test_term_quantization_matches_duckdb(spark):
    terms = _terms()
    sp = (
        spark.createDataFrame([(x,) for x in terms], "x double")
        .select(dround("x", 4).cast("decimal(20,4)").cast("string").alias("q"))
        .toPandas()["q"]
        .tolist()
    )
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"x": terms}))
    du = [
        r[0]
        for r in con.execute(
            "SELECT CAST(round(x, 4) AS DECIMAL(20,4))::VARCHAR FROM t"
        ).fetchall()
    ]
    assert sp == du


def test_money_sum_matches_duckdb_on_boundary_group(spark):
    terms = _terms()
    sdf = spark.createDataFrame([(x,) for x in terms], "x double")
    got = sdf.agg(money_sum("x").alias("s")).collect()[0].s
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"x": terms}))
    want = con.execute(
        "SELECT round(sum(CAST(round(x, 4) AS DECIMAL(20,4))), 2)::DOUBLE FROM t"
    ).fetchone()[0]
    assert got == want
