"""MR functional-surface tests (SURVEY.md §2.10): each verb must
reproduce its relational twin — the MR API is sugar, never different
semantics."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from projectmapreduce_spark.io import scan
from projectmapreduce_spark.operators import mr
from tests.conftest import SF_SMOKE


def test_map_columns_equals_select(spark):
    c = scan(spark, SF_SMOKE, "customer")
    got = mr.map_columns(c, key=F.col("c_custkey"), bal2=F.col("c_acctbal") * 2)
    want = c.select(F.col("c_custkey").alias("key"), (F.col("c_acctbal") * 2).alias("bal2"))
    assert got.collect() == want.collect()


def test_reduce_by_key_is_partial_aggregated(spark):
    o = scan(spark, SF_SMOKE, "orders")
    got = mr.reduce_by_key(
        o, ["o_orderpriority"], n=F.count(F.lit(1)), total=F.round(F.sum("o_totalprice"), 2)
    )
    want = o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("o_totalprice"), 2).alias("total")
    )
    assert sorted(got.collect()) == sorted(want.collect())
    # the combiner: physical plan must contain a partial aggregate
    got.collect()
    from projectmapreduce_spark.plans.inspect import explain_str

    assert "partial_" in explain_str(got, "simple")


def test_map_records_row_multiplier(spark):
    c = scan(spark, SF_SMOKE, "customer").select("c_custkey")

    def dup(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.concat([pdf, pdf])

    got = mr.map_records(c, dup, "c_custkey long")
    assert got.count() == 2 * c.count()


def test_secondary_sort_orders_within_key(spark):
    ev = scan(spark, SF_SMOKE, "events")
    out = mr.secondary_sort(ev, ["user_id"], ["ts"])

    def check(it):
        for pdf in it:
            for _, g in pdf.groupby("user_id"):
                assert g["ts"].is_monotonic_increasing
            yield pdf[["user_id"]].head(0)

    out.mapInPandas(check, "user_id long").count()


def test_word_count_matches_query_form(spark):
    d = scan(spark, SF_SMOKE, "documents")
    got = {(r.term, r.n) for r in mr.word_count(d, "text").collect()}
    want = {
        (r.term, r.n)
        for r in d.select(
            F.explode(F.split(F.lower("text"), r"\s+")).alias("term")
        )
        .filter(F.col("term") != "")
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want


def test_inverted_index_sorted_posting_lists(spark):
    d = scan(spark, SF_SMOKE, "documents")
    rows = mr.inverted_index(d, "doc_id", "text").limit(50).collect()
    assert rows
    for r in rows:
        assert r.doc_ids == sorted(r.doc_ids)


def test_pipe_fuses_stages(spark):
    d = scan(spark, SF_SMOKE, "documents")
    got = mr.pipe(
        d,
        lambda x: x.filter(F.col("lang") == "en"),
        lambda x: mr.word_count(x, "text"),
        lambda x: x.orderBy(F.col("n").desc()).limit(5),
    )
    assert got.count() == 5


def test_job_shape(spark):
    li = scan(spark, SF_SMOKE, "lineitem")
    got = mr.job(
        li,
        mapper=lambda x: x.select("l_returnflag", "l_quantity"),
        combiner_keys=["l_returnflag"],
        reducer={"qty": F.round(F.sum("l_quantity"), 2)},
    )
    want = li.groupBy("l_returnflag").agg(F.round(F.sum("l_quantity"), 2).alias("qty"))
    assert sorted(got.collect()) == sorted(want.collect())
