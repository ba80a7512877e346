"""Iterative graph analytics (SURVEY.md §2.10 M10): PageRank — the
canonical iterative MapReduce workload (it is THE worked example of
chained MR jobs in the public literature; Dean & Ghemawat 2004 cite
link-graph processing as MapReduce's motivating application).

The Spark-first formulation replaces one-job-per-iteration-with-HDFS-
materialization by a single DAG per iteration over cached DataFrames:

- per iteration: ONE shuffle join (ranks ⋈ edges on src) + ONE
  hash-aggregate (contributions by dst).  Nothing else moves.
- both sides are pre-partitioned on the join key once
  (``repartition(id)``) so every iteration reuses the same
  partitioning instead of re-shuffling both inputs.
- lineage is truncated every iteration via ``localCheckpoint`` —
  without it the logical plan doubles per round and planning time,
  not compute, becomes the bottleneck (same recipe as
  ``operators/dedup.py:connected_components``).
- the only driver-side state per iteration is the 1-row dangling-mass
  scalar — corpus-size-independent, like the k-means centroids in
  ``operators/similarity.py``.

Semantics (standard damped PageRank): rank = (1-d)/N + d * (inbound
contributions + dangling mass / N), where dangling nodes (no
out-edges) spread their rank uniformly.  Ranks sum to 1 at every
iteration up to float error.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    n_iters: int = 10,
) -> DataFrame:
    """PageRank over a directed edge list → (id, rank).

    ``edges`` may contain duplicate (src, dst) pairs; they are
    deduplicated (simple-graph semantics).  Every node appearing as
    src OR dst participates; dangling nodes contribute uniformly.
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct()
    nodes = (
        e.select(F.col("src").alias("id"))
        .union(e.select(F.col("dst").alias("id")))
        .distinct()
        .repartition("id")
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    out_deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg"))
    # Edges carry their src out-degree so each iteration's join is the
    # ONLY place ranks meet the graph; partitioned once on src.
    g = e.join(out_deg, "src").repartition("src").localCheckpoint(eager=True)

    ranks = nodes.select("id", (F.lit(1.0) / n).alias("rank"))
    for _ in range(n_iters):
        # dangling mass: rank parked on nodes with no out-edges
        dangling = (
            ranks.join(out_deg, ranks.id == out_deg.src, "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)))
            .collect()[0][0]
        )
        contribs = (
            g.join(ranks, g.src == ranks.id)
            .select("dst", (F.col("rank") / F.col("out_deg")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("inbound"))
        )
        ranks = (
            nodes.join(contribs, nodes.id == contribs.dst, "left")
            .select(
                "id",
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping)
                    * (F.coalesce(F.col("inbound"), F.lit(0.0)) + F.lit(dangling / n))
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks
