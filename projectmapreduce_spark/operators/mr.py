"""MapReduce-heritage functional surface (SURVEY.md §2.10, M1–M8).

The reference's programming model is `map → combine → partition →
shuffle → reduce` [Dean & Ghemawat 2004]; this module exposes those
verbs literally so a MapReduce user can port jobs one verb at a time.
Every verb lowers to DataFrame operations, NOT legacy RDD code, so
Catalyst/AQE still optimize the resulting plan (partial aggregation IS
the combiner; the shuffle is the exchange; the "reducer" is a hash
aggregate):

- relational forms (`map_columns`, `flat_map_explode`, `reduce_by_key`)
  stay entirely JVM-side — use these whenever the transform is
  expressible as columns;
- arbitrary-Python forms (`map_records`, `map_partitions`) cross to a
  Python worker over Arrow batches (`mapInPandas`) — the documented
  slow path, for logic Spark expressions genuinely can't say.
"""

from __future__ import annotations

from collections.abc import Callable, Iterable

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def map_columns(df: DataFrame, **exprs: Column) -> DataFrame:
    """M1 (relational map): one output row per input row, columns are
    named expressions — the JVM-side fast path for `map`."""
    return df.select(*[e.alias(n) for n, e in exprs.items()])


def flat_map_explode(df: DataFrame, array_expr: Column, out_name: str, *keep: str) -> DataFrame:
    """M1 (relational flatMap): 1 → N via explode of an array expression."""
    return df.select(*keep, F.explode(array_expr).alias(out_name))


def map_records(
    df: DataFrame, fn: Callable[[pd.DataFrame], pd.DataFrame], schema: str
) -> DataFrame:
    """M1 (arbitrary-Python map/flatMap): ``fn`` maps a pandas batch to
    a pandas batch (possibly more/fewer rows).  Arrow-vectorized; still
    ~10-100× slower than expressions — keep off hot paths."""

    def gen(batches: Iterable[pd.DataFrame]) -> Iterable[pd.DataFrame]:
        for pdf in batches:
            out = fn(pdf)
            if len(out):
                yield out

    return df.mapInPandas(gen, schema)


def map_partitions(
    df: DataFrame,
    fn: Callable[[Iterable[pd.DataFrame]], Iterable[pd.DataFrame]],
    schema: str,
) -> DataFrame:
    """M2: per-partition batch function — the literal `mapPartitions`,
    over Arrow batches instead of row iterators."""
    return df.mapInPandas(fn, schema)


def reduce_by_key(df: DataFrame, keys: list[str], **aggs: Column) -> DataFrame:
    """M3: keyed associative reduce.  Spark's hash aggregate computes
    map-side partials automatically — the MR combiner without user code.
    ``aggs`` are named aggregate expressions."""
    return df.groupBy(*keys).agg(*[e.alias(n) for n, e in aggs.items()])


def combine_by_key(
    df: DataFrame,
    keys: list[str],
    value: Column,
    merge: Callable[[Column], Column],
) -> DataFrame:
    """M3 variant mirroring `combineByKey`: collect the per-key bag and
    fold it with an array expression.  ``merge`` receives the collected
    array column.  For algebraic aggregates prefer `reduce_by_key`
    (partial agg beats bag materialization at scale — the bag shuffle
    carries every value)."""
    return df.groupBy(*keys).agg(
        merge(F.collect_list(value)).alias("combined")
    )


def sort_by_key(df: DataFrame, *keys: str, ascending: bool = True) -> DataFrame:
    """M4 (global): total order via range partitioning — the TeraSort
    shape.  For per-key ordered groups use `secondary_sort`."""
    cols = [F.col(k).asc() if ascending else F.col(k).desc() for k in keys]
    return df.orderBy(*cols)


def secondary_sort(df: DataFrame, partition_keys: list[str], sort_keys: list[str]) -> DataFrame:
    """M4: MR secondary sort — co-locate each key's rows, order within
    the partition, never globally.  One shuffle, no total sort."""
    return df.repartition(*partition_keys).sortWithinPartitions(
        *partition_keys, *sort_keys
    )


def partition_by(df: DataFrame, n: int, *keys: str) -> DataFrame:
    """M5: explicit hash partitioning on keys (the custom partitioner).
    Every row of a key lands in exactly one partition (asserted in
    tests/test_operators.py)."""
    return df.repartition(n, *[F.col(k) for k in keys])


def word_count(df: DataFrame, text_col: str) -> DataFrame:
    """M6: the canonical job — tokenize, explode, count per term."""
    return (
        df.select(F.explode(F.split(F.lower(F.col(text_col)), r"[ \t\n\f\r]+")).alias("term"))
        .filter(F.col("term") != "")
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def inverted_index(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """M7: term → sorted list of containing doc ids."""
    return (
        df.select(
            F.col(id_col).alias("doc_id"),
            F.explode(F.split(F.lower(F.col(text_col)), r"[ \t\n\f\r]+")).alias("term"),
        )
        .filter(F.col("term") != "")
        .groupBy("term")
        .agg(F.sort_array(F.collect_set("doc_id")).alias("doc_ids"))
    )


def distributed_grep(df: DataFrame, text_col: str, pattern: str) -> DataFrame:
    """M8: regex match over the corpus — a pushed-down filter, the
    whole 'distributed' part is free."""
    return df.filter(F.col(text_col).rlike(pattern))


def job_counters(df: DataFrame, **predicates: Column) -> DataFrame:
    """M9: MR job counters — named record counts collected in the same
    pass as the job.  One row, one column per counter.

    Deliberately NOT Spark accumulators: accumulators have
    at-least-once update semantics (task retries and speculative
    execution double-count), which is acceptable for profiling but
    wrong for the exact record counters MR jobs report.  A conditional
    aggregate is exactly-once by construction, costs one map-side
    partial per partition (the same profile as an MR counter), and
    stays in the optimized plan.
    """
    aggs = [
        F.sum(F.when(p, 1).otherwise(0)).cast("long").alias(name)
        for name, p in predicates.items()
    ]
    return df.agg(F.count(F.lit(1)).cast("long").alias("records_in"), *aggs)


def pipe(df: DataFrame, *stages: Callable[[DataFrame], DataFrame]) -> DataFrame:
    """Chained-jobs ergonomics: MR pipelines materialize between jobs;
    here the stages fuse into ONE Catalyst plan with no intermediate
    I/O — apply each stage in order."""
    for stage in stages:
        df = stage(df)
    return df


def job(
    df: DataFrame,
    mapper: Callable[[DataFrame], DataFrame] | None = None,
    combiner_keys: list[str] | None = None,
    reducer: dict[str, Column] | None = None,
) -> DataFrame:
    """The full MR job shape in one call: map → (combine+shuffle+reduce).

    `mapper` is any DataFrame→DataFrame stage; `reducer` is the named
    aggregate dict applied per `combiner_keys` group.  Provided for
    parity with job-config-style MR code; new code should just chain
    DataFrame calls.
    """
    out = mapper(df) if mapper else df
    if reducer:
        out = reduce_by_key(out, combiner_keys or [], **reducer)
    return out


__all__ = [
    "combine_by_key",
    "distributed_grep",
    "flat_map_explode",
    "inverted_index",
    "job",
    "job_counters",
    "map_columns",
    "map_partitions",
    "map_records",
    "partition_by",
    "pipe",
    "reduce_by_key",
    "secondary_sort",
    "sort_by_key",
    "word_count",
]
