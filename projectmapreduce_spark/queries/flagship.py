"""Flagship pricing-summary query (SURVEY.md §7 step 1; TPC-H Q1 shape).

One query exercising the full EP1 lifecycle: parquet scan (S1) →
pushed-down timestamp filter (P2/F2) → hash aggregate with
map-side partial aggregation (A1/A7) → global sort (O1).

Scale notes: the filter reaches the parquet scan (PushedFilters), only
7 of 11 lineitem columns are read (ReadSchema), and the groupBy keys
have cardinality 6 (3 returnflags × 2 linestatuses) so the shuffle
moves only num_partitions × 6 partially-aggregated rows — this plan is
shape-invariant from 6 k rows to 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from projectmapreduce_spark.functions import dround, money_avg, money_sum
from projectmapreduce_spark.io import scan
from projectmapreduce_spark.queries.registry import query

_ORACLE = """
SELECT
  l_returnflag,
  l_linestatus,
  round(sum(l_quantity), 2)                                    AS sum_qty,
  round(sum(CAST(round(l_extendedprice, 4) AS DECIMAL(20,4))), 2)::DOUBLE AS sum_base_price,
  round(sum(CAST(round(l_extendedprice * (1 - l_discount), 4) AS DECIMAL(20,4))), 2)::DOUBLE AS sum_disc_price,
  round(sum(CAST(round(l_extendedprice * (1 - l_discount) * (1 + l_tax), 4) AS DECIMAL(20,4))), 2)::DOUBLE AS sum_charge,
  round(avg(l_quantity), 2)                                    AS avg_qty,
  round(sum(CAST(round(l_extendedprice, 4) AS DECIMAL(20,4)))::DOUBLE / count(l_extendedprice), 2) AS avg_price,
  round(avg(l_discount), 4)                                    AS avg_disc,
  count(*)                                                     AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = scan(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dround(F.sum("l_quantity"), 2).alias("sum_qty"),
            # Money sums/avgs go through exact DECIMAL(20,4) terms
            # (functions/rounding.py:money_sum): double summation order
            # differs between engines and at sf1 the ~1e-3 accumulated
            # error straddles cent boundaries.  l_quantity stays a plain
            # double sum — integer-valued doubles sum exactly.
            money_sum("l_extendedprice").alias("sum_base_price"),
            money_sum(disc_price).alias("sum_disc_price"),
            money_sum(charge).alias("sum_charge"),
            dround(F.avg("l_quantity"), 2).alias("avg_qty"),
            money_avg("l_extendedprice").alias("avg_price"),
            dround(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


query("flagship_pricing_summary", oracle=_ORACLE, survey="S1,A1,A7,P2,O1", category="flagship")(
    pricing_summary
)
