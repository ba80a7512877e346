"""Plan-shape assertions (SURVEY.md §5 layer 5): the strategies the
100 TB design depends on must actually appear in the physical plan."""

from __future__ import annotations

from pyspark.sql import functions as F

from projectmapreduce_spark.io import scan
from projectmapreduce_spark.plans import (
    explain_str,
    has_broadcast_hash_join,
    has_cartesian,
    has_partition_filters,
    has_pushed_filters,
    has_wholestage_codegen,
)
from projectmapreduce_spark.queries import QUERIES
from tests.conftest import SF_CORRECT


def test_filter_pushdown_reaches_scan(spark):
    df = QUERIES["p2_filter_compare"](spark, SF_CORRECT)
    assert has_pushed_filters(df), explain_str(df)


def test_column_pruning(spark):
    df = QUERIES["p2_filter_compare"](spark, SF_CORRECT)
    s = explain_str(df)
    # only the three selected columns reach the scan schema
    assert "ReadSchema" in s
    read_schema = [ln for ln in s.splitlines() if "ReadSchema" in ln][0]
    assert "l_quantity" not in read_schema and "o_orderpriority" not in read_schema


def test_broadcast_join_for_dims(spark):
    for name in ("j2_broadcast_dims", "j10_star_join", "t6_stream_static_join"):
        df = QUERIES[name](spark, SF_CORRECT)
        assert has_broadcast_hash_join(df), f"{name} lost its broadcast join"


def test_band_join_is_not_cartesian(spark):
    df = QUERIES["j7_band_join"](spark, SF_CORRECT)
    assert not has_cartesian(df), "band join degenerated into a cartesian plan"


def test_interval_join_is_not_cartesian(spark):
    df = QUERIES["j9_interval_overlap"](spark, SF_CORRECT)
    assert not has_cartesian(df)


def test_partition_pruning_on_hive_layout(spark, tmp_path):
    ev = scan(spark, SF_CORRECT, "events").select("event_id", "event_type", "value")
    path = str(tmp_path / "ev_part")
    ev.write.mode("overwrite").partitionBy("event_type").parquet(path)
    back = spark.read.parquet(path).filter(F.col("event_type") == "click")
    assert has_partition_filters(back), explain_str(back)


def test_wholestage_codegen_on_flagship(spark):
    df = QUERIES["flagship_pricing_summary"](spark, SF_CORRECT)
    assert has_wholestage_codegen(df)


def test_topk_plans_take_ordered(spark):
    df = QUERIES["o3_topk_global"](spark, SF_CORRECT)
    assert "TakeOrderedAndProject" in explain_str(df, "simple")


def test_composite_plans_broadcast_and_takeordered(spark):
    c1 = QUERIES["c1_shipping_priority"](spark, SF_CORRECT)
    s1 = explain_str(c1)
    assert has_broadcast_hash_join(c1), s1
    assert has_pushed_filters(c1), s1
    assert "TakeOrderedAndProject" in s1, s1  # top-10 never globally sorts facts
    c2 = QUERIES["c2_regional_revenue"](spark, SF_CORRECT)
    s2 = explain_str(c2)
    assert has_broadcast_hash_join(c2), s2
    assert not has_cartesian(c2), s2
    # the fact side shuffles at most twice: the l⋈o sort-merge join and
    # the final revenue aggregate; dims must not add shuffle exchanges
    # (count detail-section headers "(n) Exchange" — BroadcastExchange
    # nodes have a different header and don't count as shuffles)
    import re

    n_shuffles = len(re.findall(r"^\(\d+\) Exchange$", s2, flags=re.M))
    assert n_shuffles <= 3, s2


def test_runtime_bloom_filter_is_injected(spark):
    from projectmapreduce_spark.operators.joins import runtime_bloom_pruning

    li = scan(spark, SF_CORRECT, "lineitem").select("l_orderkey", "l_quantity")
    o = (
        scan(spark, SF_CORRECT, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_orderkey")
    )
    with runtime_bloom_pruning(spark):
        j = li.join(o, li.l_orderkey == o.o_orderkey).groupBy().count()
        opt = j._jdf.queryExecution().optimizedPlan().toString()
    assert "might_contain" in opt or "bloom" in opt.lower(), opt
    # and the conf scope restored itself
    assert (
        spark.conf.get("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold")
        != "0"
    )


def test_new_composites_broadcast_and_push(spark):
    """C5/C6/C7: dims broadcast, selective filters reach the fact scans,
    nothing cartesian, top-k (C7) plans TakeOrdered."""
    c5 = QUERIES["c5_volume_shipping"](spark, SF_CORRECT)
    s5 = explain_str(c5)
    assert has_broadcast_hash_join(c5), s5
    assert has_pushed_filters(c5), s5
    assert not has_cartesian(c5), s5
    c6 = QUERIES["c6_small_qty_revenue"](spark, SF_CORRECT)
    s6 = explain_str(c6)
    assert has_broadcast_hash_join(c6), s6
    assert has_pushed_filters(c6), s6
    c7 = QUERIES["c7_returned_items"](spark, SF_CORRECT)
    s7 = explain_str(c7)
    assert has_broadcast_hash_join(c7), s7
    assert has_pushed_filters(c7), s7
    assert "TakeOrderedAndProject" in s7, s7


def test_quantized_dot_is_projection_only(spark):
    """L27: quantization adds NO shuffle — the only exchanges in the
    pair demo are broadcasts for the tiny (16-row) self-join."""
    import re

    df = QUERIES["l27_quantized_dot"](spark, SF_CORRECT)
    s = explain_str(df)
    n_shuffles = len(re.findall(r"^\(\d+\) Exchange$", s, flags=re.M))
    assert n_shuffles == 0, s


def test_w8_single_key_shuffle(spark):
    """W8 ordered fold: exactly one hash exchange (the user_id
    aggregate) — the fold itself is in-row, adds no exchange."""
    import re

    df = QUERIES["w8_ordered_fold_ema"](spark, SF_CORRECT)
    s = explain_str(df)
    n_shuffles = len(re.findall(r"^\(\d+\) Exchange$", s, flags=re.M))
    assert n_shuffles == 1, s


def test_bm25_reuses_tokenize_exchange(spark):
    """L26: the scored branch's doc-length aggregate must REUSE the
    (id, token) exchange instead of re-exploding the corpus.  Exchange
    reuse is an AQE-final-plan property: execute THIS df (collect, not
    count — count builds a different plan) before reading the plan."""
    df = QUERIES["l26_bm25_scoring"](spark, SF_CORRECT)
    df.collect()
    s = explain_str(df, "simple")
    assert "ReusedExchange" in s, s


def test_c11_reuses_revenue_exchange(spark):
    """C11 (Q15 shape): the max-scalar consumer must REUSE the revenue
    aggregate's exchange — without the explicit l_suppkey null guard
    the join branch's inferred isnotnull splits the subtrees and the
    fact is scanned twice (AQE-final-plan property, so collect first)."""
    df = QUERIES["c11_top_revenue_supplier"](spark, SF_CORRECT)
    df.collect()
    s = explain_str(df, "simple")
    assert "ReusedExchange" in s, s


def test_c8_single_fact_shuffle_window_min(spark):
    """C8 (Q2 shape): the decorrelated min must be a window over ONE
    partkey shuffle of the part-pruned fact — not an agg + self-join
    (two fact shuffles).  Assertions are directional (window present,
    lineitem scanned once, AT MOST 2 hash exchanges) so an explain-
    format change across Spark versions can't fail spuriously while a
    real extra fact shuffle still trips the bound."""
    df = QUERIES["c8_min_cost_supplier"](spark, SF_CORRECT)
    df.collect()
    s = explain_str(df, "simple").split("== Initial Plan ==")[0]
    assert "Window" in s, s
    assert s.count("Exchange hashpartitioning") <= 2, s
    assert s.count("lineitem.parquet") == 1, s
    assert has_broadcast_hash_join(df), "part/supplier/nation dims must broadcast"


def test_c9_no_correlated_rescan(spark):
    """C9 (Q21 shape): the EXISTS/NOT-EXISTS pair must decorrelate to
    window counts over one (order ⋈ lineitem) pass — the fact appears
    once, no BNLJ/cartesian from a naive correlated rewrite."""
    df = QUERIES["c9_waiting_orders"](spark, SF_CORRECT)
    s = explain_str(df)
    assert s.count("lineitem.parquet") == 1, s
    assert not has_cartesian(df)


def test_f11_is_zero_shuffle_projection(spark):
    """F11: URL parsing is a pure codegen projection — no exchange of
    any kind in the plan."""
    df = QUERIES["f11_url_funcs"](spark, SF_CORRECT)
    s = explain_str(df)
    assert "Exchange" not in s, s
    assert has_wholestage_codegen(df)


def test_o6b_keyset_prunes_scan_and_takeorders(spark):
    """O6b: the cursor predicate must reach the parquet scan (that's
    the whole point of keyset over OFFSET) and the page itself must
    plan as TakeOrderedAndProject, never a global sort; pages 3 of the
    keyset and OFFSET formulations must be row-identical."""
    df = QUERIES["o6b_keyset_pagination"](spark, SF_CORRECT)
    s = explain_str(df)
    assert has_pushed_filters(df), s
    assert "TakeOrderedAndProject" in explain_str(df, "simple")
    keyset = {tuple(r) for r in df.collect()}
    offset = {tuple(r) for r in QUERIES["o6_pagination"](spark, SF_CORRECT).collect()}
    assert keyset == offset


def test_t9_rolls_up_from_partials(spark):
    """T9: the daily aggregate must consume the hourly aggregate (two
    chained HashAggregate pairs), not re-scan raw events twice."""
    import re

    df = QUERIES["t9_hierarchical_rollup"](spark, SF_CORRECT)
    s = explain_str(df)
    assert s.count("events.parquet") == 1, s
    assert len(re.findall(r"^\(\d+\) Exchange$", s, flags=re.M)) == 2, s


def test_partitionless_window_detected_inside_subquery(spark):
    """The catalog gate's detector must see windows hiding in
    scalar-subquery plans (children() doesn't reach them)."""
    from projectmapreduce_spark.plans import has_partitionless_window

    scan(spark, SF_CORRECT, "orders").createOrReplaceTempView("o_subq_test")
    df = spark.sql(
        "SELECT o_orderkey FROM o_subq_test WHERE o_totalprice > "
        "(SELECT max(rn) * 0.0 FROM (SELECT row_number() OVER "
        "(ORDER BY o_totalprice) AS rn FROM o_subq_test))"
    )
    assert has_partitionless_window(df)


def test_upsert_join_strategy_follows_size(spark):
    """S11 (round-5 fix): ``upsert_by_rewrite`` no longer force-
    broadcasts the update batch.  A small batch still broadcasts via
    Catalyst's size estimate; with the broadcast threshold disabled —
    the proxy for a base-sized batch whose estimate exceeds it — the
    anti-join plans as a shuffle join instead of an OOM-bound forced
    broadcast."""
    from projectmapreduce_spark.io import upsert_by_rewrite

    base = scan(spark, SF_CORRECT, "orders")
    updates = base.limit(10)
    merged = upsert_by_rewrite(base, updates, "o_orderkey")
    assert has_broadcast_hash_join(merged), explain_str(merged)

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        big = upsert_by_rewrite(base, base, "o_orderkey")
        s = explain_str(big, "simple")
        assert "SortMergeJoin" in s or "ShuffledHashJoin" in s, s
        assert "BroadcastHashJoin" not in s.split("== Initial Plan ==")[0], s
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_c20_single_fact_pass(spark):
    """C20 (Q4 shape): the EXISTS decorrelates to one orderkey
    aggregate over ONE scan of the fact — no correlated re-scan, no
    cartesian, at most 2 hash exchanges (fact agg + tiny priority
    agg)."""
    df = QUERIES["c20_priority_check"](spark, SF_CORRECT)
    s = explain_str(df, "simple").split("== Initial Plan ==")[0]
    assert s.count("lineitem.parquet") == 1, s
    assert s.count("Exchange hashpartitioning") <= 2, s
    assert not has_cartesian(df)


def test_c21_single_fact_pass(spark):
    """C21 (Q20 shape): the correlated half-sum pair collapses into
    one conditional aggregate — lineitem scanned once, part + the
    supplier semi-chain broadcast, at most 2 hash exchanges (pair agg
    + suppkey distinct)."""
    df = QUERIES["c21_concentrated_suppliers"](spark, SF_CORRECT)
    s = explain_str(df, "simple").split("== Initial Plan ==")[0]
    assert s.count("lineitem.parquet") == 1, s
    assert s.count("Exchange hashpartitioning") <= 2, s
    assert has_broadcast_hash_join(df), "part/supplier sides must broadcast"
    assert not has_cartesian(df)


def test_s17_dynamic_partition_pruning(spark):
    """S17's whole point, both halves (VERDICT r5 next-round #3):
    (1) the fact scan's PartitionFilters carry a LIVE dynamic-pruning
    subquery (the degraded `dynamicpruningexpression(true)` form —
    what a non-reusable dim subplan silently produces — is rejected);
    (2) after execution, the scan's runtime numPartitions metric shows
    STRICTLY FEWER partitions read than the directory holds."""
    import os

    from projectmapreduce_spark.io import scratch_path
    from projectmapreduce_spark.plans import (
        executed_scan_metrics,
        has_dynamic_partition_pruning,
    )

    df = QUERIES["s17_dpp_join"](spark, SF_CORRECT)
    assert has_dynamic_partition_pruning(df), explain_str(df)

    n_years = df.count()  # executes the query (and the DPP subquery)
    path = scratch_path("s17_lineitem_by_year")
    n_dirs = sum(1 for d in os.listdir(path) if d.startswith("ship_year="))
    m = executed_scan_metrics(df, "s17_lineitem_by_year")
    assert 0 < m["numPartitions"] < n_dirs, (m, n_dirs)
    assert m["numPartitions"] == n_years, (m, n_years)


def test_s22_cbo_join_reorder(spark):
    """S22's whole point, both halves (VERDICT r6 next-round #5):
    (1) the declared query's returned plan is CBO-REORDERED — the
    selective filtered supplier dim joins the fact BEFORE the wide
    unfiltered part dim, even though the query is written part-first;
    (2) the reorder is driven by the ANALYZE statistics, not by the
    conf alone — the identical join over identical but UN-analyzed
    tables keeps the written left-deep order under the same CBO
    confs."""
    import re

    from projectmapreduce_spark.io import scan, sink_managed

    def join_order(df):
        plan = df._jdf.queryExecution().optimizedPlan().toString()
        seen = []
        for r in re.findall(r"pmr_s22x?_(\w+)", plan):
            if r not in seen:
                seen.append(r)
        return seen

    df = QUERIES["s22_cbo_join_reorder"](spark, SF_CORRECT)
    assert join_order(df) == ["lineitem", "supplier", "part"], (
        "declared query's frozen plan must be CBO-reordered"
    )

    # counterfactual: same tables, same join, same confs, NO statistics
    for t, cols in (
        ("lineitem", ["l_partkey", "l_suppkey", "l_extendedprice"]),
        ("part", ["p_partkey", "p_brand"]),
        ("supplier", ["s_suppkey", "s_nationkey", "s_acctbal"]),
    ):
        sink_managed(scan(spark, SF_CORRECT, t).select(*cols), f"pmr_s22x_{t}")

    def build(prefix):
        li = spark.table(f"{prefix}_lineitem")
        pt = spark.table(f"{prefix}_part")
        sup = spark.table(f"{prefix}_supplier").filter(
            (F.col("s_nationkey") < 5) & (F.col("s_acctbal") > 1000)
        )
        return (
            li.join(pt, F.col("l_partkey") == F.col("p_partkey"))
            .join(sup, F.col("l_suppkey") == F.col("s_suppkey"))
            .groupBy("p_brand")
            .count()
        )

    prev_cbo = spark.conf.get("spark.sql.cbo.enabled")
    prev_reorder = spark.conf.get("spark.sql.cbo.joinReorder.enabled")
    spark.conf.set("spark.sql.cbo.enabled", "true")
    spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
    try:
        assert join_order(build("pmr_s22x")) == ["lineitem", "part", "supplier"], (
            "without statistics the written order must survive"
        )
        # same confs, the ANALYZEd tables: stats flip the order
        assert join_order(build("pmr_s22")) == ["lineitem", "supplier", "part"], (
            "with statistics CBO must join the selective dim first"
        )
    finally:
        spark.conf.set("spark.sql.cbo.enabled", prev_cbo)
        spark.conf.set("spark.sql.cbo.joinReorder.enabled", prev_reorder)
        for t in ("lineitem", "part", "supplier"):
            spark.sql(f"DROP TABLE IF EXISTS pmr_s22x_{t}")
