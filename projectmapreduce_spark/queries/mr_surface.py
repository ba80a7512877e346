"""MapReduce-heritage functional surface (SURVEY.md §2.10, M1–M8).

The reference's core verbs (public MR model, Dean & Ghemawat OSDI'04)
re-expressed over DataFrames: map→select, flatMap→explode,
combiner+reduce→groupBy.agg (partial agg automatic), partitioner→
repartition, secondary sort→window/sortWithinPartitions.  The point:
every canonical MR job (word count, inverted index, grep) is a 3-line
declarative plan that Catalyst optimizes — no job chaining, no
intermediate materialization.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from projectmapreduce_spark.io import scan
from projectmapreduce_spark.queries.registry import query


@query(
    "m1_flatmap_tokens",
    oracle="""
SELECT doc_id, unnest(string_split(text, ' ')) AS token
FROM documents
WHERE lang = 'en'
""",
    survey="M1",
    category="mr",
)
def m1_flatmap_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """flatMap (1→N): tokenize each doc into (doc_id, token) pairs."""
    d = scan(spark, sf_dir, "documents").filter(F.col("lang") == "en")
    return d.select("doc_id", F.explode(F.split("text", " ")).alias("token"))


@query(
    "m2_mappartitions",
    oracle="""
SELECT doc_id,
       len(string_split(text, ' ')) AS n_tokens,
       n_chars % 7                  AS chars_mod7
FROM documents
""",
    survey="M2,X2",
    category="mr",
)
def m2_mappartitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapPartitions as ``mapInPandas``: the Arrow-batched per-partition
    escape hatch.  The fn is deterministic and SQL-equivalent, so this
    rows+values-checks the Python boundary itself.  At 100 TB each
    batch is one Arrow record batch — no per-row Python overhead."""
    d = scan(spark, sf_dir, "documents").select("doc_id", "text", "n_chars")

    def per_batch(batches):
        for pdf in batches:
            # nullable Int dtypes: a NULL doc must surface as NULL
            # counts (the oracle's len(string_split(NULL)) is NULL) —
            # plain int32 astype throws on the NaN (hostile sweep)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_tokens": pdf["text"].str.split(" ").str.len().astype("Int32"),
                    "chars_mod7": (pdf["n_chars"] % 7).astype("Int64"),
                }
            )

    return d.mapInPandas(per_batch, "doc_id long, n_tokens int, chars_mod7 long")


@query(
    "m3_reduce_by_key",
    oracle="""
SELECT lang, source, count(*) AS n_docs, sum(n_chars)::BIGINT AS total_chars
FROM documents
GROUP BY lang, source
""",
    survey="M3",
    category="mr",
)
def m3_reduce_by_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """reduceByKey/combineByKey ≡ groupBy.agg — Spark inserts the
    map-side combine (partial aggregate) automatically."""
    return (
        scan(spark, sf_dir, "documents")
        .groupBy("lang", "source")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("n_chars").alias("total_chars"))
    )


@query(
    "m4_secondary_sort",
    oracle="""
SELECT user_id, event_id, ts,
       row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS seq
FROM events
WHERE user_id < 20
""",
    survey="M4",
    category="mr",
)
def m4_secondary_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Secondary sort (order within key groups).  The MR pattern
    (composite key + grouping comparator) is one window — or, for
    pure ordering without numbering, ``repartition(k).
    sortWithinPartitions(k, s)`` with zero extra pass."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        scan(spark, sf_dir, "events")
        .filter(F.col("user_id") < 20)
        .select("user_id", "event_id", "ts", F.row_number().over(w).alias("seq"))
    )


@query("m5_partition_by", oracle=None, survey="M5", category="mr")
def m5_partition_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom key partitioning (MR partitioner): hash-repartition events
    by user_id and report the partition histogram (rows-only — the
    assignment is config-dependent by design).  The invariant that all
    rows of one key land in one partition is asserted in
    tests/test_operators.py."""
    ev = scan(spark, sf_dir, "events").repartition(8, "user_id")
    return (
        ev.withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .agg(F.count(F.lit(1)).alias("n_rows"), F.countDistinct("user_id").alias("n_users"))
    )


@query(
    "m6_word_count",
    oracle="""
SELECT token, count(*) AS n
FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
GROUP BY token
""",
    survey="M6",
    category="mr",
)
def m6_word_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The canonical MR job: tokenize → explode → count.  Explode then
    partial-agg means the shuffle carries (token, partial_count), i.e.
    vocabulary-sized, not corpus-sized."""
    d = scan(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split("text", " ")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "m7_inverted_index",
    oracle="""
SELECT token,
       array_to_string(list_sort(list(DISTINCT doc_id)), ',') AS doc_ids,
       count(DISTINCT doc_id)                                 AS doc_freq
FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents)
GROUP BY token
""",
    survey="M7,A8",
    category="mr",
)
def m7_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted index: token → sorted posting list (serialized to a
    string for hash stability).  At 100 TB posting lists for stop-words
    explode — production form shards hot tokens (salt on token,
    hierarchical merge); noted here, exercised on the natural vocab."""
    d = scan(spark, sf_dir, "documents")
    tokens = d.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
    return tokens.groupBy("token").agg(
        F.concat_ws(
            ",", F.transform(F.sort_array(F.collect_set("doc_id")), lambda x: x.cast("string"))
        ).alias("doc_ids"),
        F.countDistinct("doc_id").alias("doc_freq"),
    )


@query(
    "m8_distributed_grep",
    oracle="""
SELECT doc_id, lang, source
FROM documents
WHERE regexp_matches(text, 'join (filter|scan)')
""",
    survey="M8,P5",
    category="mr",
)
def m8_distributed_grep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed grep: regex scan over the corpus, fully parallel,
    no shuffle at all (map-only job)."""
    return (
        scan(spark, sf_dir, "documents")
        .filter(F.col("text").rlike("join (filter|scan)"))
        .select("doc_id", "lang", "source")
    )


@query(
    "m9_job_counters",
    oracle="""
SELECT count(*)::BIGINT                                          AS records_in,
       count(*) FILTER (value IS NULL OR value < 0)::BIGINT      AS malformed,
       count(*) FILTER (event_type = 'click')::BIGINT            AS clicks,
       count(*) FILTER (value > 90)::BIGINT                      AS high_value
FROM events
""",
    survey="M9",
    category="mr",
)
def m9_job_counters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MR job counters, Spark-first: named record counts collected in
    the SAME single pass as the job (one map-side partial per
    partition).  Implemented as conditional aggregates rather than
    Spark accumulators — accumulators are at-least-once under task
    retry/speculation, which is wrong for exact counters
    (operators/mr.py:job_counters documents the trade)."""
    from projectmapreduce_spark.operators.mr import job_counters

    ev = scan(spark, sf_dir, "events")
    return job_counters(
        ev,
        malformed=F.col("value").isNull() | (F.col("value") < 0),
        clicks=F.col("event_type") == "click",
        high_value=F.col("value") > 90,
    )


@query("m10_pagerank", oracle=None, survey="M10", category="mr")
def m10_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M10: PageRank — the canonical iterative MapReduce workload
    (chained jobs in MR; one cached DAG per iteration here), run over
    the supplier→customer supply graph (an edge per distinct supplier
    that shipped to a customer; customer ids offset to keep the node
    sets disjoint).  Per iteration: one shuffle join + one aggregate,
    both sides pre-partitioned on the join key, lineage truncated per
    round (`operators/graph.py`).  Rows-only: iterative float
    fixpoints are not SQL-expressible; convergence to the exact
    numpy power iteration is pinned in tests/test_operators.py."""
    from projectmapreduce_spark.operators.graph import pagerank

    li = scan(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = scan(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    edges = li.join(o, li.l_orderkey == o.o_orderkey).select(
        F.col("l_suppkey").alias("src"),
        (F.col("o_custkey") + F.lit(1_000_000)).alias("dst"),
    )
    out = pagerank(edges, n_iters=8)
    return out.select("id", F.round("rank", 8).alias("rank"))


def _m10b_oracle(n_iters: int = 4, scale: int = 10**12) -> str:
    """Unrolled-CTE DuckDB mirror of the integer-quantized PageRank —
    the c27 recipe (each iteration's statements become one more CTE
    layer) applied to an iterative graph fixpoint.  Kept as a
    generator so the Spark operator and the oracle can never disagree
    on iteration count or quantization scale.

    Every CTE is ``AS MATERIALIZED``: each r_k layer references the
    previous layer (plus e/od/nodes) more than once, and an INLINED
    chain re-evaluates its whole ancestry per reference — at the sf1
    tier that exponential re-expansion spilled >40 GB and exhausted
    the disk before materialization was forced (observed round 9).
    Materialized, the oracle is n_iters linear passes, like the
    engine."""
    sql = [
        f"""
WITH e AS MATERIALIZED (
  SELECT DISTINCT l_suppkey AS src, o_custkey + 1000000 AS dst
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
),
nodes AS MATERIALIZED (SELECT src AS id FROM e UNION SELECT dst FROM e),
nn AS MATERIALIZED (SELECT count(*)::BIGINT AS n FROM nodes),
od AS MATERIALIZED (SELECT src, count(*)::BIGINT AS od FROM e GROUP BY src),
r0 AS MATERIALIZED (
  SELECT id, (SELECT {scale} // n FROM nn)::BIGINT AS r FROM nodes)"""
    ]
    for k in range(1, n_iters + 1):
        p = k - 1
        sql.append(
            f""",
d{k} AS MATERIALIZED (
  SELECT coalesce(sum(r), 0)::BIGINT AS dm
  FROM r{p} LEFT JOIN od ON r{p}.id = od.src WHERE od.src IS NULL),
c{k} AS MATERIALIZED (
  SELECT e.dst, sum(r{p}.r // od.od)::BIGINT AS inbound
  FROM e JOIN od ON e.src = od.src JOIN r{p} ON r{p}.id = e.src
  GROUP BY e.dst),
r{k} AS MATERIALIZED (
  SELECT nodes.id,
         ((SELECT (15 * {scale}) // (100 * n) FROM nn)
          + (85 * (coalesce(c{k}.inbound, 0)
                   + (SELECT dm FROM d{k}) // (SELECT n FROM nn))) // 100
         )::BIGINT AS r
  FROM nodes LEFT JOIN c{k} ON nodes.id = c{k}.dst)"""
        )
    sql.append(f"\nSELECT id, r AS rank_e12 FROM r{n_iters}")
    return "".join(sql)


@query(
    "m10b_pagerank_exact",
    oracle=_m10b_oracle(),
    survey="M10",
    category="mr",
)
def m10b_pagerank_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M10 hash-checkable twin (round 9; the a4b/a11b/a13b recipe
    extended to an ITERATIVE op): integer-quantized PageRank over the
    same supplier→customer graph as m10.  Every data-dependent step is
    BIGINT arithmetic in units of 1e-12 rank (damping as the exact
    rational 85/100, floor divisions, exact integer sums), so the
    result is bit-reproducible on any engine at any partitioning —
    which the unrolled-CTE oracle (4 iterations, the c27 loop-unroll
    recipe) checks hash-exactly.  m10 keeps the float power iteration
    (rows-only, convergence pinned against numpy); this twin proves
    the ITERATION STRUCTURE — per-round dangling-mass scalar, one
    shuffle join + one aggregate — against an independent engine.  At
    100 TB the cost model is n_iters × (join + agg) over inputs
    partitioned once, identical to m10's."""
    from projectmapreduce_spark.operators.graph import pagerank_exact

    li = scan(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = scan(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    edges = li.join(o, li.l_orderkey == o.o_orderkey).select(
        F.col("l_suppkey").alias("src"),
        (F.col("o_custkey") + F.lit(1_000_000)).alias("dst"),
    )
    return pagerank_exact(edges, n_iters=4)


@query(
    "m11_triangle_count",
    # The oracle counts with the FORWARD algorithm (Schank & Wagner
    # 2005) over the same degree orientation as the engine: each
    # triangle is counted exactly once at its base edge (a→b), as a
    # wedge (a, q∈N⁺(b)) whose closing edge (a→q) exists.  Four
    # formulations were measured on the organic synth-sf1 graph
    # (7.5M capped edges over 10k suppliers, mean out-degree 754,
    # 7.7·10⁸ triangles — the co-supply graph DENSIFIES with sf):
    # (1) relational wedge joins — schoolbook a<b<c or oriented pair
    # join — instantiate Σ C(deg,2) ≈ 10^10 wedge rows and spilled
    # DuckDB 40–76 GB to disk exhaustion; (2) per-edge
    # len(list_intersect(N⁺(a), N⁺(b))) never spills but DuckDB's
    # list_intersect is O(|a|·|b|) per row → ~53 min; (3) the same
    # EXISTS query as below but phrased in CTEs — DuckDB's
    # build-side optimizer mis-estimates the unnest stream as small
    # and flips to RIGHT_SEMI, hashing the 5.7·10⁹-row wedge stream
    # (spill death again); (4) the form below — STAGED TEMP TABLES
    # (DuckDB's Python execute() runs multi-statement strings and
    # fetches the last result), which carry exact row counts, so the
    # semi join builds on the 7.5M-row edge table — 51 s, ZERO
    # spill.  Temp-table names are m11_-prefixed and CREATE OR
    # REPLACE so sweep-session reuse and reruns can't collide.
    oracle="""
CREATE OR REPLACE TEMP TABLE m11_e AS
WITH s AS MATERIALIZED (
  SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem
  WHERE l_suppkey IS NOT NULL
),
ok AS (SELECT l_orderkey FROM s GROUP BY l_orderkey HAVING count(*) <= 64)
SELECT DISTINCT x.l_suppkey AS u, y.l_suppkey AS v
FROM s x JOIN s y ON x.l_orderkey = y.l_orderkey
JOIN ok ON x.l_orderkey = ok.l_orderkey
WHERE x.l_suppkey < y.l_suppkey;

CREATE OR REPLACE TEMP TABLE m11_deg AS
SELECT id, count(*) AS deg
FROM (SELECT u AS id FROM m11_e UNION ALL SELECT v AS id FROM m11_e)
GROUP BY id;

CREATE OR REPLACE TEMP TABLE m11_o AS
SELECT CASE WHEN a.deg < b.deg OR (a.deg = b.deg AND e.u < e.v)
            THEN e.u ELSE e.v END AS src,
       CASE WHEN a.deg < b.deg OR (a.deg = b.deg AND e.u < e.v)
            THEN e.v ELSE e.u END AS dst
FROM m11_e e JOIN m11_deg a ON a.id = e.u JOIN m11_deg b ON b.id = e.v;

CREATE OR REPLACE TEMP TABLE m11_lists AS
SELECT src, list(dst) AS outs FROM m11_o GROUP BY src;

WITH tri AS (
  SELECT count(*)::BIGINT AS n_triangles
  FROM (
    SELECT oo.src AS p, unnest(lt.outs) AS q
    FROM m11_o oo JOIN m11_lists lt ON lt.src = oo.dst
  ) w
  WHERE EXISTS (SELECT 1 FROM m11_o o WHERE o.src = w.p AND o.dst = w.q)
),
agg AS (
  SELECT count(*)::BIGINT AS n_nodes,
         sum((deg * (deg - 1)) // 2)::BIGINT AS n_wedges
  FROM m11_deg
)
SELECT agg.n_nodes,
       (SELECT count(*)::BIGINT FROM m11_e) AS n_edges,
       agg.n_wedges,
       tri.n_triangles,
       round(3.0 * tri.n_triangles / agg.n_wedges, 6) AS clustering
FROM agg CROSS JOIN tri
""",
    survey="M11,J1,A2",
    category="mr",
)
def m11_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M11: exact triangle count + global clustering coefficient over
    the supplier co-supply graph (edge per supplier pair appearing in
    the same order) — the second canonical MR graph workload
    (Cohen 2009).  Counting uses DEGREE ORIENTATION
    (`operators/graph.py:triangle_stats`) so the wedge join is
    O(m^1.5) worst-case instead of hub-quadratic.  The oracle
    re-derives the count independently with the FORWARD algorithm
    (per-edge out-neighbor list intersection over the same
    orientation): the schoolbook a<b<c triple join was correct but
    its Σ C(deg,2) intermediate (~1.6·10^10 on the organic sf1
    graph) exhausted DuckDB's spill disk — an oracle must be
    RUNNABLE to verify anything, and the counting identity (each
    triangle once at its base edge) is not a semantics change.

    Declared semantics since round 10: the graph is the DEGENERACY-
    CAPPED co-supply graph (orders with > 64 distinct suppliers are
    excluded before pair fan-out — `operators/graph.py:cosupply_edges`,
    cap mirrored exactly by the oracle's HAVING).  On organic data the
    cap never activates (99.9th-percentile order breadth is 10), so
    clean-tier results are bit-identical to the uncapped round-9
    numbers; on adversarial degeneracy (the skew tier's 3634-supplier
    order → C(3634,2) ≈ 6.6M edges from ONE key) the cap is what lets
    the EXACT count run at all — round 9 excluded m11 from the skew
    sf1 sweep via a recorded --skip, removed in round 10.  The count
    stays exact on the capped graph (unlike m11b, which additionally
    DOULION-samples for the dense regime)."""
    from projectmapreduce_spark.operators.graph import cosupply_edges, triangle_stats

    li = scan(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    return triangle_stats(cosupply_edges(li, cap=64), a="u", b="v")


@query(
    "m11b_triangle_estimate",
    oracle="""
WITH s AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem
           WHERE l_suppkey IS NOT NULL),
ok AS (SELECT l_orderkey FROM s GROUP BY l_orderkey HAVING count(*) <= 64),
e AS (
  SELECT DISTINCT x.l_suppkey AS u, y.l_suppkey AS v
  FROM s x JOIN s y ON x.l_orderkey = y.l_orderkey
  JOIN ok ON x.l_orderkey = ok.l_orderkey
  WHERE x.l_suppkey < y.l_suppkey
),
samp AS (SELECT u, v FROM e
         WHERE substr(md5(u::VARCHAR || '_' || v::VARCHAR), 1, 2) < '33'),
tri AS (SELECT count(*)::BIGINT AS n_tri_sampled
        FROM samp e1 JOIN samp e2 ON e1.v = e2.u
        JOIN samp e3 ON e3.u = e1.u AND e3.v = e2.v)
SELECT (SELECT count(*)::BIGINT FROM e) AS n_edges,
       (SELECT count(*)::BIGINT FROM samp) AS n_sampled,
       n_tri_sampled,
       (n_tri_sampled * 16777216 // 132651)::BIGINT AS est_triangles
FROM tri
""",
    survey="M11,J1,A2",
    category="mr",
)
def m11b_triangle_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M11b: the SAMPLED estimator for graphs dense even after the
    degeneracy cap — the UNCAPPED skew-tier co-supply graph was
    ~4·10⁸ edges (spill-disk exhaustion for any exact count), and
    since round 10 the cap itself is shared with m11, so what this
    query adds over the exact count is the sampling.  Two bounds
    compose:

    1. **Co-occurrence cap** (the L2 ``max_bucket`` pattern, shared
       helper ``operators/graph.py:cosupply_edges`` since round 10):
       orders with > 64 distinct suppliers are dropped BEFORE pair
       fan-out — a single pathological order otherwise contributes
       C(n,2) edges (the skew tier's hottest order alone:
       C(3634,2) ≈ 6.6M).  64 is far above the organic 99.9th
       percentile (10), so on clean data the capped graph IS the
       full graph.
    2. **DOULION edge sampling** (Tsourakakis KDD'09): each surviving
       edge is kept with p = 51/256 by a deterministic md5 coin
       (``operators/graph.py:doulion_sample``), triangles are counted
       exactly on the sparsified graph (degree-oriented wedge join,
       O((pm)^1.5)), and the count rescales by 1/p³ in exact int64
       arithmetic.  Unbiased over the coin ensemble with relative
       std ≈ sqrt(1/(p³T)) + shared-edge terms, so it is the tool for
       the LARGE-T dense regime that breaks the exact count (measured
       ~14% off exact on the adversarially-dense sf0.01 fixture,
       pinned in tests/test_operators.py); sparse small-T graphs are
       exactly where m11's exact count runs fine and should be used.

    The md5 coin makes the whole query engine-deterministic, so unlike
    classic sampled estimators it carries a full SQL hash oracle, not
    a rows-only check.  (Since round 10 m11 shares the same capped
    edge helper and runs exactly on every tier; this estimator remains
    the scale path for graphs dense even AFTER the cap, where the
    O((pm)^1.5) sampled wedge join is the difference between seconds
    and the exact count's full m^1.5.)"""
    from projectmapreduce_spark.operators.graph import (
        cosupply_edges,
        doulion_sample,
        triangle_count_oriented,
    )

    # Edge generation is the shared capped helper (round 10: m11 now
    # runs on the SAME degeneracy cap, so the bucket-pair pattern, the
    # two-level prefilter, and the cap rationale live in exactly one
    # place — operators/graph.py:cosupply_edges).  Measured at sf0.1:
    # ~5.8 s → ~4.1 s warm vs the always-on HLL prefilter, unchanged
    # hash.  The checkpoint inside the helper pins one materialization
    # for the three consumers here (n_edges, the sampler, the wedge
    # join).
    li = scan(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    edges = cosupply_edges(li, cap=64)
    samp = doulion_sample(edges).localCheckpoint(eager=True)
    tri = triangle_count_oriented(samp)
    counts = edges.agg(F.count(F.lit(1)).alias("n_edges")).crossJoin(
        samp.agg(F.count(F.lit(1)).alias("n_sampled"))
    )
    return counts.crossJoin(tri).select(
        "n_edges",
        "n_sampled",
        F.col("n_triangles").alias("n_tri_sampled"),
        F.expr("n_triangles * 16777216 div 132651").alias("est_triangles"),
    )


@query(
    "m9b_observed_metrics",
    oracle="""
SELECT count(*)::BIGINT AS n_rows,
       sum(l_quantity)::DOUBLE AS qty_sum,
       min(l_extendedprice) AS min_price,
       max(l_extendedprice) AS max_price,
       count(CASE WHEN l_returnflag = 'R' THEN 1 END)::BIGINT AS n_returned
FROM lineitem
""",
    survey="M9",
    category="mr",
)
def m9b_observed_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M9 via the Observation API (``df.observe``): named metrics
    collected DURING a pass as accumulator-backed observations —
    Spark's structured replacement for MR Counters when the job's
    primary output is something else and the counters must not cost a
    second scan.  Unlike raw accumulators, observed metrics are
    computed per-query-execution (exactly-once per successful action),
    so retries can't double-count — the M9 correctness argument.

    Determinism contract: only order-independent metrics (count,
    min/max, sums of integral-valued doubles — l_quantity is whole
    units, so double summation is exact regardless of partition
    order); a float-valued sum would be last-ulp partition-order
    noise.  The observed dict is re-surfaced as a 1-row DataFrame
    (metadata-scale driver state, same class as the T8/S14 scalars)."""
    from pyspark.sql import Observation

    li = scan(spark, sf_dir, "lineitem")
    obs = Observation()
    observed = li.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("l_quantity").cast("double").alias("qty_sum"),
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
        F.count(F.when(F.col("l_returnflag") == "R", 1)).alias("n_returned"),
    )
    observed.count()  # one action populates the metrics
    m = obs.get
    return spark.createDataFrame(
        [
            (
                m["n_rows"],
                float(m["qty_sum"]),
                float(m["min_price"]),
                float(m["max_price"]),
                m["n_returned"],
            )
        ],
        "n_rows bigint, qty_sum double, min_price double, max_price double, n_returned bigint",
    )


@query(
    "m12_secondary_sort",
    oracle="""
WITH o AS (
  SELECT user_id, value,
         lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM events
)
SELECT user_id,
       count(*)                             AS n_events,
       count(*) FILTER (WHERE prev IS NOT NULL AND value IS NOT NULL
                          AND value > prev) AS n_up
FROM o GROUP BY user_id
""",
    survey="M12",
    category="mr",
)
def m12_secondary_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M12: the MR SECONDARY SORT — `repartition(key)` +
    `sortWithinPartitions(key, ts, id)` + a partition-STREAMING scan
    (mapInPandas), the Hadoop composite-key/grouping-comparator
    pattern re-expressed.  Why it exists next to X3/X12: the grouped
    APIs materialize EACH WHOLE GROUP in one worker call, which dies
    when a key is huge (the 100 TB skew case); here the group never
    materializes — rows of a key arrive ordered and the scan streams
    Arrow batch by Arrow batch carrying only the previous row plus
    per-key running counters (partial-aggregate-sized state, never
    row-sized), the carry-over preserved ACROSS batch boundaries
    inside one partition.  The result (per-user ordered
    up-transition counts) is partition-count-independent because
    repartition(key) puts each key's full run in exactly one
    partition and the in-partition sort fixes the order — which the
    window-function oracle re-derives declaratively.

    Tie discipline: the sort key is (user_id, ts, event_id) — the PK
    tiebreak keeps consecutive-pair comparisons deterministic;
    NULL-value comparisons count as not-up on both sides.

    The scan body is VECTORIZED per Arrow batch (VERDICT r8 task 1):
    because rows arrive SORTED by key, each batch is a sequence of
    contiguous key RUNS — one shifted equality compare finds the run
    boundaries, ``np.add.reduceat`` folds per-run counts/up-sums, and a
    single scalar comparison stitches the batch boundary (the carried
    last row of the previous batch vs row 0).  Python-level work per
    batch is O(runs), never O(rows) — the only state crossing batches
    stays the (prev_user, prev_val) carry plus the
    partial-aggregate-sized counters dict.  Measured single-core over
    the sf1 events table (1M rows, 100 Arrow batches): 0.77 s per-row
    → 0.03 s vectorized (~25×), byte-identical counters."""
    ev = scan(spark, sf_dir, "events").select("user_id", "ts", "event_id", "value")

    def ordered_scan(batches):
        prev_user, prev_val = None, None  # carry across Arrow batches
        started = False
        counts: dict[int, list[int]] = {}
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            # Arrow->pandas gives float64-with-NaN for nullable longs,
            # so equality needs the explicit both-null patch (NULL==NULL
            # groups together, matching the oracle's PARTITION BY).
            u = pdf["user_id"]
            u_na = u.isna().to_numpy()
            ue = u.to_numpy()
            vv = pd.to_numeric(pdf["value"], errors="coerce").to_numpy(
                dtype="float64", na_value=np.nan
            )
            same = np.empty(n, dtype=bool)
            same[0] = False  # row 0 always opens a run WITHIN the batch
            if n > 1:
                same[1:] = (ue[1:] == ue[:-1]) | (u_na[1:] & u_na[:-1])
            starts = np.flatnonzero(~same)
            sizes = np.diff(np.append(starts, n))
            up = np.zeros(n, dtype=bool)
            if n > 1:
                with np.errstate(invalid="ignore"):
                    up[1:] = same[1:] & (vv[1:] > vv[:-1])
            # Stitch row 0 against the carried previous row.
            u0 = None if u_na[0] else int(ue[0])
            v0 = None if np.isnan(vv[0]) else float(vv[0])
            up[0] = (
                started
                and u0 == prev_user
                and prev_val is not None
                and v0 is not None
                and v0 > prev_val
            )
            ups = np.add.reduceat(up, starts)
            for s, sz, usum in zip(starts, sizes, ups):
                c = counts.setdefault(None if u_na[s] else int(ue[s]), [0, 0])
                c[0] += int(sz)
                c[1] += int(usum)
            last = n - 1
            prev_user = None if u_na[last] else int(ue[last])
            prev_val = None if np.isnan(vv[last]) else float(vv[last])
            started = True
        yield pd.DataFrame(
            {
                "user_id": list(counts),
                "n_events": [c[0] for c in counts.values()],
                "n_up": [c[1] for c in counts.values()],
            }
        )

    out = (
        ev.repartition("user_id")
        .sortWithinPartitions("user_id", "ts", "event_id")
        .mapInPandas(ordered_scan, "user_id long, n_events long, n_up long")
    )
    return out
