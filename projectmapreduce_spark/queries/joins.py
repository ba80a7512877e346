"""Join queries (SURVEY.md §2.3, J1–J10).

Strategy notes (verified in tests/test_plans.py):

- J2/J10 broadcast the dimension side explicitly — ``region``/
  ``nation`` are O(10) rows at ANY scale factor, so at 100 TB the fact
  scan joins them with zero shuffle (BroadcastHashJoin).
- J7 uses the bucketed band-join recipe, never a cartesian plan.
- J8 uses the union+window as-of recipe — one shuffle, no blow-up.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from projectmapreduce_spark.functions import dround, money_sum
from projectmapreduce_spark.io import scan
from projectmapreduce_spark.operators.joins import (
    asof_join,
    band_join,
    interval_overlap_join,
)
from projectmapreduce_spark.queries.registry import query


@query(
    "j1_inner_equi",
    oracle="""
SELECT c.c_mktsegment,
       count(*)                          AS n_orders,
       round(sum(o.o_totalprice), 2)     AS total_price
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY c.c_mktsegment
""",
    survey="J1",
    category="join",
)
def j1_inner_equi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inner equi-join (the MR reduce-side join) + aggregate."""
    o = scan(spark, sf_dir, "orders")
    c = scan(spark, sf_dir, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey, "inner")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dround(F.sum("o_totalprice"), 2).alias("total_price"),
        )
    )


@query(
    "j2_broadcast_dims",
    oracle="""
SELECT r.r_name AS region_name, n.n_name AS nation_name,
       count(*) AS n_customers, round(sum(c.c_acctbal), 2) AS total_bal
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name, n.n_name
""",
    survey="J2",
    category="join",
)
def j2_broadcast_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast (map-side) join of tiny dims — zero shuffle for the join."""
    c = scan(spark, sf_dir, "customer")
    n = scan(spark, sf_dir, "nation")
    r = scan(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region_name"), F.col("n_name").alias("nation_name"))
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            dround(F.sum("c_acctbal"), 2).alias("total_bal"),
        )
    )


@query(
    "j3_outer_join",
    oracle="""
SELECT c.c_custkey,
       count(o.o_orderkey)                       AS n_big_orders,
       round(coalesce(sum(o.o_totalprice), 0.0), 2) AS big_total
FROM customer c
LEFT JOIN (SELECT * FROM orders WHERE o_totalprice > 250000.0) o
  ON c.c_custkey = o.o_custkey
GROUP BY c.c_custkey
""",
    survey="J3",
    category="join",
)
def j3_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join with null-padding (dangling keys manufactured by
    filtering the right side, per FIXTURES.md RI note)."""
    c = scan(spark, sf_dir, "customer")
    o = scan(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 250000.0)
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_big_orders"),
            dround(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 2).alias("big_total"),
        )
    )


@query(
    "j3b_full_outer",
    oracle="""
SELECT coalesce(a.k, b.k) AS status_key,
       a.n_f::DOUBLE      AS n_f,
       b.n_o::DOUBLE      AS n_o
FROM (SELECT o_orderstatus AS k, count(*) AS n_f FROM orders WHERE o_orderstatus <> 'O' GROUP BY 1) a
FULL OUTER JOIN (SELECT o_orderstatus AS k, count(*) AS n_o FROM orders WHERE o_orderstatus <> 'F' GROUP BY 1) b
  ON a.k = b.k
""",
    survey="J3",
    category="join",
)
def j3b_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join — both sides contribute unmatched rows."""
    o = scan(spark, sf_dir, "orders")
    a = (
        o.filter(F.col("o_orderstatus") != "O")
        .groupBy(F.col("o_orderstatus").alias("k"))
        .agg(F.count(F.lit(1)).alias("n_f"))
    )
    b = (
        o.filter(F.col("o_orderstatus") != "F")
        .groupBy(F.col("o_orderstatus").alias("k"))
        .agg(F.count(F.lit(1)).alias("n_o"))
    )
    # Nullable counts are pinned to double on BOTH sides: pandas coerces a
    # null-bearing int64 to float64 anyway, but that coercion depends on the
    # fixture actually producing a dangling key — cast so the dtype is
    # deterministic, not data-dependent.
    return a.join(b, a.k == b.k, "full").select(
        F.coalesce(a.k, b.k).alias("status_key"),
        F.col("n_f").cast("double").alias("n_f"),
        F.col("n_o").cast("double").alias("n_o"),
    )


@query(
    "j4_left_semi",
    oracle="""
SELECT c_custkey, c_mktsegment
FROM customer c
WHERE EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
)
""",
    survey="J4",
    category="join",
)
def j4_left_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Existence filter — semi join ships only the key column of the
    probe side, never widens rows."""
    c = scan(spark, sf_dir, "customer")
    o = scan(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_mktsegment"
    )


@query(
    "j5_left_anti",
    oracle="""
SELECT c_custkey, c_nationkey
FROM customer c
WHERE NOT EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 200000.0
)
""",
    survey="J5",
    category="join",
)
def j5_left_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-existence filter (anti join)."""
    c = scan(spark, sf_dir, "customer")
    o = scan(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 200000.0)
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_nationkey"
    )


@query(
    "j6_cross",
    oracle="""
SELECT r.r_name AS region_name, s.o_orderstatus AS status
FROM region r
CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders) s
""",
    survey="J6",
    category="join",
)
def j6_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cartesian product — only ever over provably tiny inputs (5 × 3);
    large-side theta joins go through the J7 bucketed recipe instead."""
    r = scan(spark, sf_dir, "region").select(F.col("r_name").alias("region_name"))
    s = scan(spark, sf_dir, "orders").select(F.col("o_orderstatus").alias("status")).distinct()
    return r.crossJoin(s)


@query(
    "j7_band_join",
    oracle="""
SELECT a.event_id AS left_id, b.event_id AS right_id,
       a.user_id  AS left_user, b.user_id AS right_user
FROM events a
JOIN events b
  ON b.ts >= a.ts - INTERVAL 60 SECOND
 AND b.ts <= a.ts + INTERVAL 60 SECOND
 AND a.event_id < b.event_id
 AND a.event_type = 'error'
 AND b.event_type = 'error'
""",
    survey="J7",
    category="join",
)
def j7_band_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta (band) join: pairs of error events within 60 s of each
    other — executed with the bucketed 1-Bucket-Theta recipe (equi-join
    on time bucket + residual filter), NOT a cartesian plan."""
    ev = scan(spark, sf_dir, "events").filter(F.col("event_type") == "error")
    a = ev.select(
        F.col("event_id").alias("left_id"),
        F.col("user_id").alias("left_user"),
        F.unix_micros("ts").alias("l_us"),
    )
    b = ev.select(
        F.col("event_id").alias("right_id"),
        F.col("user_id").alias("right_user"),
        F.unix_micros("ts").alias("r_us"),
    )
    joined = band_join(
        a, b, "l_us", "r_us", band=60_000_000, extra_pred=F.col("left_id") < F.col("right_id")
    )
    return joined.select("left_id", "right_id", "left_user", "right_user")


@query(
    "j8_asof_join",
    oracle="""
WITH clicks AS (
  SELECT user_id, ts, max_by(event_id, event_id) AS click_id,
         round(max_by(value, event_id), 2)       AS click_value
  FROM events WHERE event_type = 'click'
  GROUP BY user_id, ts
),
purchases AS (
  SELECT event_id AS purchase_id, user_id, ts, value FROM events
  WHERE event_type = 'purchase'
)
SELECT p.purchase_id,
       p.user_id,
       round(p.value, 2) AS purchase_value,
       c.click_id::DOUBLE AS last_click_id,
       c.click_value      AS last_click_value
FROM purchases p
ASOF LEFT JOIN clicks c
  ON p.user_id = c.user_id AND p.ts >= c.ts
""",
    survey="J8",
    category="join",
)
def j8_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase matched to the user's latest click at
    or before it (union + last(ignorenulls) window — exact, one
    shuffle).  Oracle is DuckDB's native ASOF JOIN."""
    ev = scan(spark, sf_dir, "events")
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(
            F.max_by("event_id", "event_id").alias("click_id"),
            dround(F.max_by("value", "event_id"), 2).alias("click_value"),
        )
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        "ts",
        dround("value", 2).alias("purchase_value"),
    )
    return asof_join(
        purchases,
        clicks,
        on="user_id",
        ts="ts",
        right_cols={"click_id": "last_click_id", "click_value": "last_click_value"},
    ).select(
        "purchase_id",
        "user_id",
        "purchase_value",
        # Left-join-nullable id pinned to double on both sides (see j3b note).
        F.col("last_click_id").cast("double").alias("last_click_id"),
        "last_click_value",
    )


@query(
    "j9_interval_overlap",
    oracle="""
WITH iv AS (
  SELECT o_custkey, o_orderkey, o_orderdate AS start_ts,
         o_orderdate + INTERVAL 7 DAY AS end_ts
  FROM orders
)
SELECT a.o_custkey AS custkey, a.o_orderkey AS order_a, b.o_orderkey AS order_b
FROM iv a
JOIN iv b
  ON a.o_custkey = b.o_custkey
 AND a.o_orderkey < b.o_orderkey
 AND a.start_ts < b.end_ts AND b.start_ts < a.end_ts
""",
    survey="J9",
    category="join",
)
def j9_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval overlap join: pairs of 7-day order windows of the same
    customer that intersect (equi-key prefilter + overlap residual)."""
    o = scan(spark, sf_dir, "orders")
    iv = o.select(
        "o_custkey",
        "o_orderkey",
        F.col("o_orderdate").alias("start_ts"),
        (F.col("o_orderdate") + F.expr("INTERVAL 7 DAYS")).alias("end_ts"),
    )
    a = iv.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderkey").alias("order_a"),
        F.col("start_ts").alias("a_start"),
        F.col("end_ts").alias("a_end"),
    )
    b = iv.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderkey").alias("order_b"),
        F.col("start_ts").alias("b_start"),
        F.col("end_ts").alias("b_end"),
    )
    out = interval_overlap_join(
        a, b, key="custkey", l_start="a_start", l_end="a_end", r_start="b_start", r_end="b_end"
    ).filter(F.col("order_a") < F.col("order_b"))
    return out.select("custkey", "order_a", "order_b")


@query(
    "j10_star_join",
    oracle="""
SELECT r.r_name                                           AS region_name,
       year(o.o_orderdate)                                AS order_year,
       round(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount), 4) AS DECIMAL(20,4))), 2)::DOUBLE AS revenue,
       count(*)                                           AS n_lines
FROM lineitem l
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n   ON c.c_nationkey = n.n_nationkey
JOIN region r   ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name, year(o.o_orderdate)
""",
    survey="J10",
    category="join",
)
def j10_star_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-way star join: fact ⋈ fact ⋈ dim chain.  Dims broadcast;
    the single real shuffle is lineitem⋈orders on orderkey — the plan a
    1000-executor cluster wants."""
    l = scan(spark, sf_dir, "lineitem")
    o = scan(spark, sf_dir, "orders")
    c = scan(spark, sf_dir, "customer")
    n = scan(spark, sf_dir, "nation")
    r = scan(spark, sf_dir, "region")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(
            F.col("r_name").alias("region_name"),
            F.year("o_orderdate").alias("order_year"),
        )
        .agg(
            money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@query(
    "j11_salted_skew_join",
    oracle="""
SELECT o.o_orderpriority, count(*) AS n,
       round(sum(CAST(round(l.l_extendedprice, 4) AS DECIMAL(20,4))), 2)::DOUBLE AS total_price
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY o.o_orderpriority
""",
    survey="J11,J1,M5",
    category="join",
)
def j11_salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-salted fact⋈fact join (SURVEY.md §4 salting recipe): the
    join key becomes (orderkey, salt) with the orders side replicated
    per salt — result-identical to the plain join (this oracle IS the
    plain join), partition-load-balanced under pathological key skew
    that AQE's splitter can't fix."""
    from projectmapreduce_spark.operators.joins import salted_join

    l = scan(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice")
    o = scan(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    joined = salted_join(
        l.withColumnRenamed("l_orderkey", "k"),
        o.withColumnRenamed("o_orderkey", "k"),
        on="k",
        n_salts=4,
    )
    return joined.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        money_sum("l_extendedprice").alias("total_price"),
    )


@query(
    "j12_bloom_pruned_join",
    oracle="""
SELECT l_returnflag, count(*) AS n_items, round(sum(l_quantity), 2) AS sum_qty
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
WHERE o_orderpriority = '1-URGENT'
GROUP BY l_returnflag
""",
    survey="J12,J1",
    category="join",
)
def j12_bloom_pruned_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J12: runtime bloom-filter join pruning — the selective orders
    side ('1-URGENT', ~20%) is too big to broadcast at 100 TB, so the
    optimizer builds a bloom filter of its join keys and pushes
    might_contain into the lineitem scan: non-matching fact rows die
    before the shuffle.  The scoped conf models the no-broadcast regime
    at fixture scale; result is materialized inside the conf scope
    (localCheckpoint) because injection happens at optimization time.
    Semantics are untouched (bloom false positives only pass extra rows
    to the exact join) — the oracle is the plain join."""
    from projectmapreduce_spark.operators.joins import runtime_bloom_pruning

    li = scan(spark, sf_dir, "lineitem").select("l_orderkey", "l_returnflag", "l_quantity")
    o = (
        scan(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_orderkey")
    )
    with runtime_bloom_pruning(spark):
        out = (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .groupBy("l_returnflag")
            .agg(
                F.count(F.lit(1)).alias("n_items"),
                dround(F.sum("l_quantity"), 2).alias("sum_qty"),
            )
            .localCheckpoint(eager=True)
        )
    return out


@query(
    "j13_null_safe_join",
    oracle="""
WITH o AS (
  SELECT o_orderkey,
         CASE WHEN o_orderstatus = 'P' THEN NULL ELSE o_orderstatus END AS status_key
  FROM orders
),
d AS (
  SELECT NULL AS status_key, 'pending-batch' AS route
  UNION ALL SELECT 'O', 'open-batch'
  UNION ALL SELECT 'F', 'final-batch'
)
SELECT route, count(*)::BIGINT AS n_orders, min(o_orderkey) AS min_key
FROM o JOIN d ON o.status_key IS NOT DISTINCT FROM d.status_key
GROUP BY route
""",
    survey="J13,J1,P6",
    category="join",
)
def j13_null_safe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J13: null-safe equality join (``<=>`` / IS NOT DISTINCT FROM) —
    ordinary equi-joins silently DROP null keys (null = null is
    unknown), which loses exactly the rows a routing/repair pipeline
    most needs to see.  Null-safe equality keeps them matchable: here
    'P' orders are nulled (modeling an unparsed status) and still
    route to their batch via the null dim row.  Spark plans ``<=>``
    as a regular hash join on a null-tolerant key, so the 100 TB
    cost profile is identical to J1 — no fallback to BNLJ."""
    o = scan(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.when(F.col("o_orderstatus") == "P", F.lit(None)).otherwise(
            F.col("o_orderstatus")
        ).alias("status_key"),
    )
    d = scan(spark, sf_dir, "orders").sparkSession.createDataFrame(
        [(None, "pending-batch"), ("O", "open-batch"), ("F", "final-batch")],
        "status_key string, route string",
    )
    j = o.join(F.broadcast(d), o.status_key.eqNullSafe(d.status_key))
    return j.groupBy("route").agg(
        F.count(F.lit(1)).alias("n_orders"), F.min("o_orderkey").alias("min_key")
    )
