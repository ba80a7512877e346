"""Composite analytics queries (SURVEY.md §2.12, C1–C2): multi-join +
aggregate + top-k pipelines in the classic TPC-H Q3/Q5 shapes, run over
the driver's TPC-H-ish star schema.

These exist to prove the operators COMPOSE into the plans a warehouse
actually runs: selective dimension filters pushed to the scans, small
sides broadcast, one shuffle for the aggregate, and a top-k that never
globally sorts the facts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from projectmapreduce_spark.functions import dround, money_sum
from projectmapreduce_spark.io import scan
from projectmapreduce_spark.queries.registry import query


@query(
    "c1_shipping_priority",
    oracle="""
SELECT l_orderkey,
       round(sum(CAST(round(l_extendedprice * (1 - l_discount), 4) AS DECIMAL(20,4))), 2)::DOUBLE AS revenue,
       o_orderdate,
       o_orderpriority
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < DATE '1998-01-01'
  AND l_shipdate  > DATE '1998-01-01'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
""",
    survey="C1,J2,A1,O3",
    category="composite",
)
def c1_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C1 (TPC-H Q3 shape): top-10 unshipped orders by revenue for one
    market segment.  The segment filter reaches the customer scan and
    the date filters reach the orders/lineitem scans (PushedFilters);
    customer⋈orders broadcasts the filtered customer side; the only
    fact shuffle is the revenue hash-aggregate; the top-10 is a
    TakeOrdered over the (small) aggregated output, never a global
    sort of lineitem.  Tiebreak on l_orderkey AFTER rounding makes the
    limit boundary engine-deterministic."""
    c = scan(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = scan(spark, sf_dir, "orders").filter(F.col("o_orderdate") < "1998-01-01")
    li = scan(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > "1998-01-01")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            )
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


@query(
    "c2_regional_revenue",
    oracle="""
SELECT n_name,
       round(sum(CAST(round(l_extendedprice * (1 - l_discount), 4) AS DECIMAL(20,4))), 2)::DOUBLE AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
GROUP BY n_name
""",
    survey="C2,J10,J2,A1",
    category="composite",
)
def c2_regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C2 (TPC-H Q5 shape): revenue by nation where customer and
    supplier share the nation, region-filtered.  All four dimension
    sides (customer, supplier, nation, region) broadcast; the region
    filter prunes nation/supplier BEFORE they reach the fact join, so
    the lineitem⋈orders join is the only shuffle-bearing edge — the
    plan you need when lineitem is 100 TB and everything else is
    gigabytes."""
    r = scan(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = scan(spark, sf_dir, "nation").join(
        F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey")
    )
    s = scan(spark, sf_dir, "supplier").join(
        F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey")
    )
    c = scan(spark, sf_dir, "customer")
    o = scan(spark, sf_dir, "orders")
    li = scan(spark, sf_dir, "lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .groupBy("n_name")
        .agg(
            money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            )
        )
    )


@query(
    "c3_large_order_customers",
    oracle="""
WITH big AS (
  SELECT l_orderkey AS big_orderkey, sum(l_quantity) AS total_qty
  FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 250
)
SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice, total_qty
FROM big
JOIN orders   ON o_orderkey = big_orderkey
JOIN customer ON c_custkey = o_custkey
""",
    survey="C3,A6,J2,J4",
    category="composite",
)
def c3_large_order_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C3 (TPC-H Q18 shape): customers holding very large orders —
    aggregate-then-semi-join.  The qty rollup is the only fact shuffle;
    its HAVING output is a tiny set of orderkeys, so it joins INTO
    orders and customer as the broadcast build side — the fact table
    and the customer table are never shuffled.  At 100 TB the pattern
    generalizes: reduce first, broadcast the reduced set, never join
    fact⋈dim before the selective aggregate.  ``l_quantity`` is an
    integer-valued double, so ``sum`` is exact and the >250 gate and
    output hash are engine-deterministic with no rounding."""
    li = scan(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 250)
        .withColumnRenamed("l_orderkey", "big_orderkey")
    )
    o = scan(spark, sf_dir, "orders")
    c = scan(spark, sf_dir, "customer")
    return (
        o.join(F.broadcast(big), o.o_orderkey == big.big_orderkey)
        .join(c, F.col("o_custkey") == c.c_custkey)
        .select("c_custkey", "c_name", "o_orderkey", "o_orderdate", "o_totalprice", "total_qty")
    )


@query(
    "c4_sql_subqueries",
    oracle="""
SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice
FROM orders o
WHERE o_totalprice > (SELECT 2 * avg(o_totalprice) FROM orders)
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_discount >= 0.09)
""",
    survey="C4,A2,J4",
    category="composite",
)
def c4_sql_subqueries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4: the SQL-text entry point with scalar and correlated
    subqueries — orders priced above twice the global average that
    also contain a deep-discount line.  The query is submitted as SQL
    over registered temp views (``spark.sql``), proving the engine's
    second API surface end-to-end: Catalyst decorrelates the EXISTS
    into a left-semi join and turns the scalar subquery into a
    broadcast of its 1-row result, so the physical plan is the same
    join/agg machinery the DataFrame queries use — no per-row
    re-execution of the subquery (the naive-interpreter trap).  Same
    SQL text runs on DuckDB as the oracle."""
    scan(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    scan(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice
        FROM orders o
        WHERE o_totalprice > (SELECT 2 * avg(o_totalprice) FROM orders)
          AND EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_orderkey = o.o_orderkey AND l.l_discount >= 0.09)
        """
    )


@query(
    "c5_volume_shipping",
    oracle="""
SELECT sn.n_name AS supp_nation,
       cn.n_name AS cust_nation,
       year(l_shipdate)::BIGINT AS l_year,
       round(sum(CAST(round(l_extendedprice * (1 - l_discount), 4) AS DECIMAL(20,4))), 2)::DOUBLE AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
WHERE l_shipdate BETWEEN DATE '1996-01-01' AND DATE '1997-12-31'
  AND ((sn.n_name = 'NATION_10' AND cn.n_name = 'NATION_12')
    OR (sn.n_name = 'NATION_12' AND cn.n_name = 'NATION_10'))
GROUP BY supp_nation, cust_nation, l_year
""",
    survey="C5,J2,J10,A1,F2",
    category="composite",
)
def c5_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C5 (TPC-H Q7 shape): bilateral trade volume between two nations
    by ship year.  The plan to want at 100 TB: the date filter is
    pushed to the lineitem scan; supplier, customer, and both nation
    aliases broadcast (each enriched dim is nation-filtered BEFORE the
    fact join, so non-qualifying lineitems die at the first broadcast
    probe); the only shuffle of fact data is the final 3-key
    hash-aggregate, whose key space (2 nations × 2 years) is tiny."""
    n = scan(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    pair = ("NATION_10", "NATION_12")
    sup = (
        scan(spark, sf_dir, "supplier")
        .join(F.broadcast(n.filter(F.col("n_name").isin(*pair))), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cust = (
        scan(spark, sf_dir, "customer")
        .join(F.broadcast(n.filter(F.col("n_name").isin(*pair))), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    o = scan(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = scan(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").between("1996-01-01", "1997-12-31")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(sup), F.col("l_suppkey") == sup.s_suppkey)
        .join(F.broadcast(cust), F.col("o_custkey") == cust.c_custkey)
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").cast("long").alias("l_year"))
        .agg(
            money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            )
        )
    )


@query(
    "c6_small_qty_revenue",
    oracle="""
WITH pq AS (
  SELECT l_partkey, 0.5 * avg(l_quantity) AS half_avg_qty
  FROM lineitem GROUP BY l_partkey
)
SELECT round(sum(CAST(round(l_extendedprice, 4) AS DECIMAL(20,4)))::DOUBLE / 7.0, 2) AS avg_yearly,
       count(*)::BIGINT AS n_lines
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN pq   ON lineitem.l_partkey = pq.l_partkey
WHERE p_brand = 'Brand#23'
  AND l_quantity < pq.half_avg_qty
""",
    survey="C6,A1,J2",
    category="composite",
)
def c6_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C6 (TPC-H Q17 shape): revenue lost to small-quantity orders of
    one brand's parts — the correlated-scalar-subquery pattern
    (per-part average quantity) decorrelated by hand into
    aggregate-then-join, the shape Catalyst itself rewrites Q17 into.
    The per-part average is computed in ONE pass over lineitem (a
    part-key hash aggregate), then joined back; the brand filter
    reaches the part scan and the filtered part table broadcasts.
    ``l_quantity`` is integer-valued, so ``avg`` is an exact binary
    fraction and the ``<`` gate is engine-deterministic; 0.5·avg
    mirrors Q17's ``0.2·avg`` with a threshold the fixture's quantity
    range (1–50) actually exercises."""
    li = scan(spark, sf_dir, "lineitem")
    pq = li.groupBy(F.col("l_partkey").alias("pq_partkey")).agg(
        (F.lit(0.5) * F.avg("l_quantity")).alias("half_avg_qty")
    )
    p = scan(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#23")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(pq, F.col("l_partkey") == F.col("pq_partkey"))
        .filter(F.col("l_quantity") < F.col("half_avg_qty"))
        .agg(
            dround(F.sum(dround("l_extendedprice", 4).cast("decimal(20,4)")).cast("double") / 7.0, 2).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@query(
    "c7_returned_items",
    oracle="""
SELECT c_custkey, c_name,
       round(sum(CAST(round(l_extendedprice * (1 - l_discount), 4) AS DECIMAL(20,4))), 2)::DOUBLE AS revenue,
       n_name,
       count(*)::BIGINT AS n_lines
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate BETWEEN DATE '1996-01-01' AND DATE '1996-12-31'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
""",
    survey="C7,J2,A1,O3",
    category="composite",
)
def c7_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C7 (TPC-H Q10 shape): top-20 customers by revenue lost to
    returned items in one year.  Both selective filters (returnflag,
    order date) are pushed to the two fact scans; nation broadcasts;
    customer⋈nation enriches AFTER the (much smaller) aggregate —
    never the raw fact stream; the top-20 is a TakeOrdered over
    aggregated customers with a post-rounding PK tiebreak so the limit
    boundary is engine-deterministic."""
    li = scan(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    o = scan(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").between("1996-01-01", "1996-12-31")
    )
    per_cust = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_custkey")
        .agg(
            money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )
    c = scan(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_nationkey")
    n = scan(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        per_cust.join(c, per_cust.o_custkey == c.c_custkey)
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", "c_name", "revenue", "n_name", "n_lines")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )
