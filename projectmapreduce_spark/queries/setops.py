"""Set-operation queries (SURVEY.md §2.7, U1–U4)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from projectmapreduce_spark.io import scan
from projectmapreduce_spark.queries.registry import query


def _urgent(spark, sf_dir):
    return (
        scan(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey", "o_orderstatus")
    )


def _high(spark, sf_dir):
    return (
        scan(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "2-HIGH")
        .select("o_custkey", "o_orderstatus")
    )


@query(
    "u1_union_all",
    oracle="""
SELECT o_custkey, o_orderstatus FROM orders WHERE o_orderpriority = '1-URGENT'
UNION ALL
SELECT o_custkey, o_orderstatus FROM orders WHERE o_orderpriority = '2-HIGH'
""",
    survey="U1",
    category="setop",
)
def u1_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag union by column NAME (unionByName — positional union is a
    silent-corruption foot-gun at scale)."""
    return _urgent(spark, sf_dir).unionByName(_high(spark, sf_dir))


@query(
    "u2_union_distinct",
    oracle="""
SELECT o_custkey, o_orderstatus FROM orders WHERE o_orderpriority = '1-URGENT'
UNION
SELECT o_custkey, o_orderstatus FROM orders WHERE o_orderpriority = '2-HIGH'
""",
    survey="U2",
    category="setop",
)
def u2_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set union (union + dedup hash aggregate)."""
    return _urgent(spark, sf_dir).unionByName(_high(spark, sf_dir)).distinct()


@query(
    "u3_intersect",
    oracle="""
SELECT o_custkey, o_orderstatus FROM orders WHERE o_orderpriority = '1-URGENT'
INTERSECT
SELECT o_custkey, o_orderstatus FROM orders WHERE o_orderpriority = '2-HIGH'
""",
    survey="U3",
    category="setop",
)
def u3_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set intersection (distinct semantics both engines)."""
    return _urgent(spark, sf_dir).intersect(_high(spark, sf_dir))


@query(
    "u4_except_all",
    oracle="""
SELECT o_custkey, o_orderstatus FROM orders WHERE o_orderpriority = '1-URGENT'
EXCEPT ALL
SELECT o_custkey, o_orderstatus FROM orders WHERE o_orderpriority = '2-HIGH'
""",
    survey="U4",
    category="setop",
)
def u4_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset difference (EXCEPT ALL — keeps multiplicity)."""
    return _urgent(spark, sf_dir).exceptAll(_high(spark, sf_dir))
