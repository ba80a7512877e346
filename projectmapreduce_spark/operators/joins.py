"""Composite join operators Spark lacks natively (SURVEY.md §2.3 J7–J9).

These are the three recipes §4 calls out as NOT Catalyst built-ins:

- ``band_join``      — theta join on a bounded numeric/time band,
                       bucketed so it never degenerates into a
                       cartesian product (1-Bucket-Theta family,
                       "Processing theta-joins using MapReduce",
                       SIGMOD 2011 — public pattern).
- ``asof_join``      — each left row matched to the latest right row
                       with ``right.ts <= left.ts`` per key, via the
                       union + last(ignorenulls) window trick (exact,
                       no cross join).
- ``interval_overlap_join`` — [start,end) overlap predicate with an
                       equi-key prefilter.

Scale notes are in each docstring; every recipe is pure DataFrame code
so AQE still handles skew/coalescing on top.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def band_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    band: float,
    extra_pred: Column | None = None,
) -> DataFrame:
    """Join rows where ``abs(left[left_on] - right[right_on]) <= band``.

    Naive formulation is a cartesian product (Spark would plan
    BroadcastNestedLoopJoin — O(n·m) comparisons).  Instead both sides
    are bucketed into width-``band`` buckets; each left row is exploded
    into its own bucket ±1, the join becomes an **equi-join on
    bucket id** (hash-partitioned, AQE-managed), and the exact band
    predicate runs as a residual filter.  Each pair is produced exactly
    once because a right row within ``band`` of a left row is always in
    one of the three exploded buckets — and only one.

    At 100 TB: cost is O(n + m + output) shuffle instead of O(n·m)
    compare; bucket width = band keeps the per-bucket blow-up ≤ 3×.
    Columns of both inputs are preserved; name collisions must be
    resolved by the caller (alias/prefix) beforehand.
    """
    lb = left.withColumn(
        "__bucket",
        F.explode(
            F.array(
                (F.floor(F.col(left_on) / F.lit(band)) - 1).cast("long"),
                F.floor(F.col(left_on) / F.lit(band)).cast("long"),
                (F.floor(F.col(left_on) / F.lit(band)) + 1).cast("long"),
            )
        ),
    )
    rb = right.withColumn("__bucket", F.floor(F.col(right_on) / F.lit(band)).cast("long"))
    pred = F.abs(F.col(left_on) - F.col(right_on)) <= F.lit(band)
    if extra_pred is not None:
        pred = pred & extra_pred
    return lb.join(rb, on="__bucket", how="inner").filter(pred).drop("__bucket")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts: str,
    right_cols: dict[str, str],
    left_ts_alias: str | None = None,
) -> DataFrame:
    """As-of join: for each left row, the single right row with the
    greatest ``right[ts] <= left[ts]`` within the same ``on`` key.

    Spark has no native ASOF JOIN; the exact, shuffle-minimal
    formulation is: tag both sides, union them, and run one window
    ``last(col, ignorenulls=True)`` per carried right column ordered by
    ``(ts, side)`` within the key — right rows sort before left rows at
    equal timestamps, so a right row at exactly ``left.ts`` matches.
    One shuffle (the window partitioning), no join blow-up, no range
    bucketing parameter to tune.

    Ties inside ``right`` at the same (key, ts) must be pre-deduped by
    the caller (e.g. ``max_by``) for deterministic output.

    ``right_cols`` maps right column name → output alias.  Left columns
    pass through unchanged (plus optionally ``left_ts_alias``).

    At 100 TB this is a single hash-partition on the key + in-partition
    sort — the same cost profile as any window; AQE splits skewed keys.
    """
    from pyspark.sql.window import Window

    lt = left.select(
        F.lit(1).alias("__side"),
        F.col(on).alias("__k"),
        F.col(ts).alias("__ts"),
        F.struct(*left.columns).alias("__lrow"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in right_cols],
    )
    rt = right.select(
        F.lit(0).alias("__side"),
        F.col(on).alias("__k"),
        F.col(ts).alias("__ts"),
        F.lit(None).cast(lt.schema["__lrow"].dataType).alias("__lrow"),
        *[F.col(c).alias(f"__r_{c}") for c in right_cols],
    )
    w = (
        Window.partitionBy("__k")
        .orderBy(F.col("__ts").asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = lt.unionByName(rt).select(
        "__side",
        "__lrow",
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"__m_{c}")
            for c in right_cols
        ],
    )
    out_cols = [F.col(f"__lrow.{c}").alias(c) for c in left.columns]
    out_cols += [F.col(f"__m_{c}").alias(alias) for c, alias in right_cols.items()]
    return matched.filter(F.col("__side") == 1).select(*out_cols)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-buster equi-join (SURVEY.md §4 salting recipe).

    A hot key sends all its rows to one reducer; AQE's skew-join split
    handles moderate cases, but pathological keys (one key = 10% of
    100 TB) still bottleneck.  Salting shards each hot key
    deterministically-in-result: the big/skewed ``left`` adds a salt in
    [0, n_salts) per row; the smaller ``right`` is replicated once per
    salt value; the join key becomes (key, salt), spreading each key
    over ``n_salts`` reducers.  The result set is identical to the
    plain join for any salt assignment — salt only changes
    partitioning, so the per-row salt source (row id) being
    nondeterministic across runs is harmless.

    Cost: right side shuffles n_salts× its size — use for
    big-skewed ⋈ moderate, never for two huge sides (pre-aggregate or
    split hot keys explicitly instead).
    """
    keys = [on] if isinstance(on, str) else list(on)
    l = left.withColumn(
        "__salt", F.pmod(F.monotonically_increasing_id(), F.lit(n_salts)).cast("int")
    )
    r = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i).cast("int") for i in range(n_salts)]))
    )
    return l.join(r, on=keys + ["__salt"], how=how).drop("__salt")


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
) -> DataFrame:
    """Overlap join: pairs within the same ``key`` whose half-open
    intervals intersect (``l_start < r_end AND r_start < l_end``).

    The equi-key join bounds the comparison set to per-key groups (the
    common case for per-entity intervals); the overlap predicate runs
    as a residual filter.  For keyless interval joins at scale, compose
    with ``band_join`` on interval start instead.
    """
    pred = (F.col(l_start) < F.col(r_end)) & (F.col(r_start) < F.col(l_end))
    return left.join(right, on=key, how="inner").filter(pred)


class runtime_bloom_pruning:
    """J12: scoped enablement of Spark's runtime bloom-filter join
    pruning (the Catalyst ``InjectRuntimeFilter`` rule): when a
    selective-but-too-big-to-broadcast dimension joins a huge fact, the
    optimizer builds a bloom filter over the dim's join keys and pushes
    a ``might_contain`` predicate into the fact scan — rows that cannot
    match are dropped BEFORE the shuffle, cutting exchange volume by
    the dim's selectivity.  This is exactly the 100 TB regime: the
    broadcast path (J2) is unavailable, but shipping every fact row to
    the join is still wasteful.

    Used as a context manager; the caller must MATERIALIZE the result
    inside the scope (e.g. ``localCheckpoint(eager=True)``) because the
    confs matter at optimization time, not plan-construction time.  The
    fixture-scale threshold overrides exist because the rule's defaults
    target real cluster sizes (10 GB application-side scans).
    """

    _CONFS = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "1GB",
        # InjectRuntimeFilter skips creation sides it could broadcast
        # instead — at fixture scale EVERYTHING is broadcast-able, so
        # model the 100 TB no-broadcast regime explicitly in-scope.
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }

    def __init__(self, spark):
        self.spark = spark
        self._prev: dict[str, str | None] = {}

    def __enter__(self):
        for k, v in self._CONFS.items():
            try:
                self._prev[k] = self.spark.conf.get(k)
            except Exception:
                self._prev[k] = None
            self.spark.conf.set(k, v)
        return self

    def __exit__(self, *exc):
        for k, v in self._prev.items():
            if v is None:
                self.spark.conf.unset(k)
            else:
                self.spark.conf.set(k, v)
        return False
