"""Count–min sketch (SURVEY.md §2.4 A12): mergeable frequency sketch
for heavy-hitter estimation over unbounded key cardinality.

The 100 TB problem this solves: exact per-token counts over a web-scale
corpus shuffle the full vocabulary (billions of keys).  A count–min
sketch is a fixed d×w grid of counters — each partition builds its
grid map-side, grids merge by cell-wise addition (Spark's partial
aggregation does this automatically for `groupBy(j, bucket).count()`),
and the shuffle carries at most tasks × d × w cells no matter how many
distinct tokens exist.  Estimates are upper bounds: for token t,
``est(t) = min_j cells[j][bucket_j(t)] ≥ true(t)``, with overshoot
≤ 2N/w at confidence 1 − (1/2)^d (Cormode & Muthukrishnan 2005 —
public algorithm).

Determinism contract: the hash family must be reproducible across
engines so the declared query carries a full SQL oracle.  Tokens are
hashed with a polynomial-rolling hash over code points (exact bigint
arithmetic, verified identical in Spark and DuckDB including unicode),
then spread over rows j by the same multiplicative family as
operators/pipeline.py — no murmur/xxhash, whose constants differ
between engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from projectmapreduce_spark.operators.pipeline import _M32

# Per-row salt spacing for the d hash functions (any odd-ish constant
# works; must match the oracle SQL literally).
_ROW_SALT = 1000003
# Spreading multiplier (MurmurHash2's M).  Must stay BELOW 2^31 so
# h * mult fits int64 for h < 2^32 (max product ≈ 6.6e18 < 2^63-1) —
# pipeline's 2654435761 would overflow Spark's ANSI bigint here, and
# DuckDB would silently widen to the never-matching HUGEINT.
_CMS_MULT = 1540483477


def poly_hash(col: Column | str) -> Column:
    """Polynomial rolling hash of a string → bigint in [0, 2^32).

    ``h = fold(chars, 0, (acc, c) -> (acc*31 + codepoint(c)) % 2^32)``
    — pure JVM-side higher-order functions (no Python), and exactly
    reproducible in DuckDB as
    ``list_reduce(list_prepend(0, list_transform(string_split(t,''),
    c -> ascii(c))), (acc,x) -> (acc*31+x) % 4294967296)``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.aggregate(
        F.transform(F.split(c, ""), lambda ch: F.ascii(ch).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: (acc * F.lit(31) + x) % F.lit(_M32),
    )


def cms_bucket(h: Column, j: Column | int, width: int) -> Column:
    """Row-j bucket for a pre-hashed key: ((h*K + j*S) % 2^32) % w."""
    jc = F.lit(j) if isinstance(j, int) else j
    return ((h * F.lit(_CMS_MULT) + jc * F.lit(_ROW_SALT)) % F.lit(_M32)) % F.lit(width)


def cms_build(keys: DataFrame, key_col: str, depth: int = 4, width: int = 1024) -> DataFrame:
    """Build the sketch from a (multiset) column of keys.

    Returns the d×w grid as rows ``(j, bucket, cell_count)``.  Each
    input key contributes one increment per row j; the
    ``groupBy(j, bucket)`` hash-aggregate does map-side partial sums,
    so the shuffle is bounded by tasks × d × w cells — never by key
    cardinality.  Grids from different corpora/partitions merge by
    cell-wise addition (union + re-aggregate), making the sketch
    incrementally maintainable.
    """
    h = poly_hash(key_col)
    return (
        keys.select(h.alias("h"))
        .select("h", F.explode(F.array(*[F.lit(j) for j in range(depth)])).alias("j"))
        .select("j", cms_bucket(F.col("h"), F.col("j"), width).alias("bucket"))
        .groupBy("j", "bucket")
        .agg(F.count(F.lit(1)).alias("cell_count"))
    )


def cms_estimate(
    probes: DataFrame, cells: DataFrame, key_col: str, depth: int = 4, width: int = 1024
) -> DataFrame:
    """Point-query the sketch: est(key) = min over rows j of the cell
    the key hashes to.  ``cells`` is at most d×w rows regardless of
    corpus size, so it is ALWAYS the broadcast side — probing never
    shuffles the probe set."""
    h = poly_hash(key_col)
    p = probes.withColumn("__h", h)
    cond = F.col("c.bucket") == cms_bucket(F.col("p.__h"), F.col("c.j"), width)
    return (
        p.alias("p")
        .join(F.broadcast(cells.alias("c")), cond)
        .groupBy(*[F.col(f"p.{x}") for x in probes.columns])
        .agg(F.min("c.cell_count").alias("est_count"))
    )
