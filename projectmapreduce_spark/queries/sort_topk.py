"""Sort / limit / top-k queries (SURVEY.md §2.6, O1–O4).

Scale notes: Spark's global ``orderBy`` is a range-partitioned sort
(sampled split points — the TeraSort pattern), so O1 scales without a
single-reducer bottleneck.  ``orderBy().limit(k)`` compiles to
TakeOrdered — each partition keeps its local top-k heap and only k rows
per partition reach the driver-side merge, never the full sort (O3).
The driver's hash is row-order-insensitive, so sort queries encode the
order into a ``row_number`` column computed from a unique total order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from projectmapreduce_spark.functions import dround
from projectmapreduce_spark.io import scan
from projectmapreduce_spark.queries.registry import query


@query(
    "o1_global_sort",
    oracle="""
SELECT o_orderkey, o_totalprice,
       row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey) AS sort_pos
FROM orders
WHERE o_orderstatus = 'F'
""",
    survey="O1",
    category="sort",
)
def o1_global_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global total order (multi-key, desc + asc tiebreak) made
    hash-checkable by materializing the position via
    ``global_sort_rank`` — the TeraSort range shuffle + per-range
    local rank + broadcast cumulative offsets.  No single-partition
    WindowExec anywhere: the plan that runs here is the plan that
    runs at 100× (pinned catalog-wide in tests/test_plans.py)."""
    from projectmapreduce_spark.operators.rank import global_sort_rank

    o = scan(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    order = [F.col("o_totalprice").desc(), F.col("o_orderkey")]
    return global_sort_rank(o, order, rank_col="sort_pos", dtype="int").select(
        "o_orderkey", "o_totalprice", "sort_pos"
    )


@query(
    "o2_sort_limit",
    oracle="""
SELECT o_orderkey, o_orderdate, o_totalprice
FROM orders
ORDER BY o_orderdate ASC, o_orderkey ASC
LIMIT 100
""",
    survey="O2",
    category="sort",
)
def o2_sort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First N of a total order (unique tiebreak → deterministic set)."""
    return (
        scan(spark, sf_dir, "orders")
        .orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
        .limit(100)
        .select("o_orderkey", "o_orderdate", "o_totalprice")
    )


@query(
    "o3_topk_global",
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 25
""",
    survey="O3",
    category="sort",
)
def o3_topk_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k without a total sort — plans as TakeOrderedAndProject
    (per-partition heaps, k rows shuffled per partition)."""
    return (
        scan(spark, sf_dir, "orders")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(25)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


@query(
    "o4_topk_per_group",
    oracle="""
SELECT * FROM (
  SELECT c_mktsegment, c_custkey, c_acctbal,
         row_number() OVER (PARTITION BY c_mktsegment
                            ORDER BY c_acctbal DESC, c_custkey) AS rn
  FROM customer
) WHERE rn <= 5
""",
    survey="O4",
    category="sort",
)
def o4_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per key via ranking window — one shuffle on the group key;
    the 100 TB formulation of 'k best rows per entity'."""
    w = Window.partitionBy("c_mktsegment").orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
    return (
        scan(spark, sf_dir, "customer")
        .select("c_mktsegment", "c_custkey", "c_acctbal", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 5)
    )


@query(
    "o5_subsample_per_group",
    oracle="""
SELECT * FROM (
  SELECT source, doc_id, n_chars,
         row_number() OVER (
           PARTITION BY source
           ORDER BY ((doc_id * 2654435761) % 4294967296), doc_id
         ) AS samp_rn
  FROM documents
) WHERE samp_rn <= 10
""",
    survey="O5,L15",
    category="sort",
)
def o5_subsample_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O5: deterministic k-per-group subsample — cap each source at k
    documents, chosen by hashed-id order (reservoir-sampling semantics
    made reproducible: the SAME k docs survive on every run, engine,
    and cluster size — `rand()`-based reservoirs can't promise that).
    The training-pipeline verb for per-source document caps.  One
    shuffle on the group key; at 100 TB the window never materializes a
    group — each partition streams its sorted run and rows rank > k are
    dropped before any further stage."""
    from projectmapreduce_spark.operators.pipeline import hash_bucket

    d = scan(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(hash_bucket("doc_id", 4294967296), F.col("doc_id"))
    return (
        d.select("source", "doc_id", "n_chars", F.row_number().over(w).alias("samp_rn"))
        .filter(F.col("samp_rn") <= 10)
    )


@query(
    "o6_pagination",
    oracle="""
SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 25 OFFSET 50
""",
    survey="O6,O2",
    category="sort",
)
def o6_pagination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O6: keyless pagination — page 3 of a ranked listing via
    ``offset(50).limit(25)`` (Spark ≥3.4 native OFFSET).  The plan
    still TakeOrders only offset+limit rows (no global materialized
    sort), but cost GROWS with page depth — at 100 TB serve deep
    pages by keyset pagination instead (filter on the last seen sort
    key, an indexed/pruned scan); this row is the API-parity surface,
    with the total order made unambiguous by the PK tiebreak."""
    o = scan(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", dround("o_totalprice", 2).alias("o_totalprice"))
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .offset(50)
        .limit(25)
    )


@query(
    "o6b_keyset_pagination",
    oracle="""
WITH o AS (
  SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice FROM orders
),
b AS (
  SELECT o_totalprice AS bp, o_orderkey AS bk
  FROM o ORDER BY o_totalprice DESC, o_orderkey ASC
  LIMIT 1 OFFSET 49
)
SELECT o_orderkey, o_totalprice
FROM o, b
WHERE o_totalprice < b.bp OR (o_totalprice = b.bp AND o_orderkey > b.bk)
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 25
""",
    survey="O6,O2",
    category="sort",
)
def o6b_keyset_pagination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O6 keyset (cursor) pagination — the scale path O6's own docs
    prescribe for deep pages.  The cursor is the LAST ROW OF THE
    PREVIOUS PAGE (here: row 50 of the total order, fetched as a
    driver-side 1-row TakeOrdered — in a live API the client supplies
    it); the page is then ``(price, key) after cursor ORDER BY ...
    LIMIT k``.  The strict-inequality predicate carries LITERALS, so
    it lands in the parquet scan's PushedFilters: unlike OFFSET (cost
    grows linearly with page depth), every page is the same
    TakeOrderedAndProject over a cursor-pruned scan — page 10⁶ costs
    what page 1 costs.  Returns page 3 (rows 51–75), row-identical to
    ``o6_pagination``."""
    raw = scan(spark, sf_dir, "orders")
    o = raw.select("o_orderkey", dround("o_totalprice", 2).alias("o_totalprice"))
    order = [F.col("o_totalprice").desc(), F.col("o_orderkey").asc()]
    # Guarded 1-row take: a <50-row orders table has no page-2 cursor —
    # return the empty page instead of an IndexError.  (This fetch is a
    # deliberate eager Spark job at query-construction time: it stands
    # in for the cursor value a live API's CLIENT supplies.)
    cursor_rows = o.orderBy(*order).offset(49).limit(1).take(1)
    if not cursor_rows:
        return o.limit(0)
    cursor = cursor_rows[0]
    # Scan-level prune on the RAW column (the rounded page column is a
    # computed expression parquet can't evaluate): any raw price that
    # rounds to ≤ cursor satisfies raw ≤ cursor + 0.005, so this is an
    # exactness-preserving superset that lands in PushedFilters; the
    # exact keyset predicate below runs as the residual.
    pruned = raw.filter(F.col("o_totalprice") <= F.lit(cursor.o_totalprice + 0.005)).select(
        "o_orderkey", dround("o_totalprice", 2).alias("o_totalprice")
    )
    after_cursor = (F.col("o_totalprice") < F.lit(cursor.o_totalprice)) | (
        (F.col("o_totalprice") == F.lit(cursor.o_totalprice))
        & (F.col("o_orderkey") > F.lit(cursor.o_orderkey))
    )
    return pruned.filter(after_cursor).orderBy(*order).limit(25)
