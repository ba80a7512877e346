"""Projection / filter / predicate queries (SURVEY.md §2.2, P1–P8).

All predicates here are Catalyst-pushable: at 100 TB each of these
filters reaches the parquet scan as ``PushedFilters`` and the select
list prunes ``ReadSchema`` — verified in tests/test_plans.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from projectmapreduce_spark.functions import dround
from projectmapreduce_spark.io import scan
from projectmapreduce_spark.queries.registry import query


@query(
    "p1_project_compute",
    oracle="""
SELECT c_custkey,
       upper(c_name)                 AS name_upper,
       round(c_acctbal * 1.1, 2)     AS boosted_bal,
       c_mktsegment                  AS segment
FROM customer
""",
    survey="P1",
    category="projection",
)
def p1_project_compute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column subset + rename + computed columns (map-side, no shuffle)."""
    return scan(spark, sf_dir, "customer").select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        dround(F.col("c_acctbal") * 1.1, 2).alias("boosted_bal"),
        F.col("c_mktsegment").alias("segment"),
    )


@query(
    "p2_filter_compare",
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
WHERE o_totalprice > 100000.0
""",
    survey="P2",
    category="filter",
)
def p2_filter_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Comparison predicate — pushed to the parquet row-group level."""
    return (
        scan(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 100000.0)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


@query(
    "p3_filter_boolean",
    oracle="""
SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_returnflag
FROM lineitem
WHERE (l_quantity >= 45.0 AND l_discount <= 0.02) OR (NOT l_returnflag = 'N' AND l_tax = 0.0)
""",
    survey="P3",
    category="filter",
)
def p3_filter_boolean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AND/OR/NOT composition."""
    li = scan(spark, sf_dir, "lineitem")
    pred = ((F.col("l_quantity") >= 45.0) & (F.col("l_discount") <= 0.02)) | (
        (~(F.col("l_returnflag") == "N")) & (F.col("l_tax") == 0.0)
    )
    return li.filter(pred).select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_returnflag"
    )


@query(
    "p4_filter_in_between",
    oracle="""
SELECT c_custkey, c_mktsegment, c_acctbal
FROM customer
WHERE c_mktsegment IN ('AUTOMOBILE', 'MACHINERY')
  AND c_acctbal BETWEEN 0.0 AND 5000.0
""",
    survey="P4",
    category="filter",
)
def p4_filter_in_between(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-list membership + BETWEEN range."""
    return (
        scan(spark, sf_dir, "customer")
        .filter(
            F.col("c_mktsegment").isin("AUTOMOBILE", "MACHINERY")
            & F.col("c_acctbal").between(0.0, 5000.0)
        )
        .select("c_custkey", "c_mktsegment", "c_acctbal")
    )


@query(
    "p5_filter_like_regex",
    oracle="""
SELECT p_partkey, p_name, p_type
FROM part
WHERE p_type LIKE '%BRASS%' OR regexp_matches(p_name, '^.*(red|blue).*$')
""",
    survey="P5",
    category="filter",
)
def p5_filter_like_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIKE and regex predicates — the distributed-grep primitive."""
    p = scan(spark, sf_dir, "part")
    return p.filter(
        F.col("p_type").like("%BRASS%") | F.col("p_name").rlike("^.*(red|blue).*$")
    ).select("p_partkey", "p_name", "p_type")


@query(
    "p6_null_handling",
    oracle="""
SELECT o.o_orderkey,
       c.c_custkey IS NULL                       AS cust_missing,
       coalesce(c.c_mktsegment, 'UNKNOWN')       AS segment,
       round(coalesce(c.c_acctbal, 0.0), 2)      AS bal_filled
FROM orders o
LEFT JOIN (SELECT * FROM customer WHERE c_acctbal > 0.0) c
  ON o.o_custkey = c.c_custkey
""",
    survey="P6,J3",
    category="filter",
)
def p6_null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IS NULL / coalesce / fill — nulls manufactured via an outer join
    (the fixtures contain none, FIXTURES.md notes)."""
    o = scan(spark, sf_dir, "orders")
    c = scan(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 0.0)
    j = o.join(c, o.o_custkey == c.c_custkey, "left")
    return j.select(
        "o_orderkey",
        F.col("c_custkey").isNull().alias("cust_missing"),
        F.coalesce("c_mktsegment", F.lit("UNKNOWN")).alias("segment"),
        dround(F.coalesce("c_acctbal", F.lit(0.0)), 2).alias("bal_filled"),
    )


@query(
    "p7_distinct",
    oracle="""
SELECT DISTINCT c_mktsegment, c_nationkey
FROM customer
""",
    survey="P7",
    category="filter",
)
def p7_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate elimination (hash-aggregate with partial dedup map-side)."""
    return scan(spark, sf_dir, "customer").select("c_mktsegment", "c_nationkey").distinct()


@query("p8_sample", oracle=None, survey="P8", category="filter")
def p8_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded Bernoulli sample (rows-only: engine RNGs differ, so no SQL
    oracle; at 100 TB this is the cheap pre-pass for profiling)."""
    return (
        scan(spark, sf_dir, "lineitem")
        .sample(fraction=0.1, seed=42)
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n_sampled"))
    )
