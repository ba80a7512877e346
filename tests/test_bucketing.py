"""Bucketed co-located join (SURVEY.md §4 pre-partitioning): bucketed
tables on the same key must join with NO shuffle exchange — the plan
property that makes repeated fact joins affordable at 100 TB."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from projectmapreduce_spark.io import scan, sink_bucketed
from projectmapreduce_spark.plans.inspect import explain_str
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    li = scan(spark, SF_SMOKE, "lineitem").select("l_orderkey", "l_extendedprice")
    o = scan(spark, SF_SMOKE, "orders").select("o_orderkey", "o_orderpriority")
    sink_bucketed(li, "pmr_li_b", ["l_orderkey"], n_buckets=8, sort_cols=["l_orderkey"])
    sink_bucketed(o, "pmr_o_b", ["o_orderkey"], n_buckets=8, sort_cols=["o_orderkey"])
    yield "pmr_li_b", "pmr_o_b"
    spark.sql("DROP TABLE IF EXISTS pmr_li_b")
    spark.sql("DROP TABLE IF EXISTS pmr_o_b")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    li_t, o_t = bucketed_tables
    # Disable broadcast so the join must pick sort-merge — the strategy
    # bucketing accelerates; with AQE the small fixture would otherwise
    # broadcast and hide the property under test.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table(li_t).join(
            spark.table(o_t), F.col("l_orderkey") == F.col("o_orderkey")
        )
        plan = explain_str(j, "simple")
        assert "SortMergeJoin" in plan, plan
        assert "Exchange" not in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))


def test_s7_declared_query_join_has_no_exchange(spark):
    """The declared s7_bucketed_join query's join must read the bucketed
    scans directly: the only Exchange in the plan is the final groupBy's
    — neither join input is shuffled."""
    from projectmapreduce_spark.queries import QUERIES

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = QUERIES["s7_bucketed_join"](spark, SF_SMOKE)
        plan = explain_str(df, "simple")
        assert "SortMergeJoin" in plan, plan
        assert plan.count("Exchange") <= 1, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))


def test_bucketed_join_result_matches_plain(spark, bucketed_tables):
    li_t, o_t = bucketed_tables
    got = (
        spark.table(li_t)
        .join(spark.table(o_t), F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    li = scan(spark, SF_SMOKE, "lineitem")
    o = scan(spark, SF_SMOKE, "orders")
    want = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert sorted(got.collect()) == sorted(want.collect())
