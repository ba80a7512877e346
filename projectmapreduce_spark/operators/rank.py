"""Scale-safe global ranking (SURVEY.md §2.6 O1, §2.11 L20).

``row_number() OVER (ORDER BY ...)`` with no PARTITION BY compiles to
a single-partition WindowExec — every row of the input moves to ONE
task, the textbook 100×-scale-killer.  ``global_sort_rank`` computes
the identical dense 1-based position with the zipWithIndex
construction, expressed DataFrame-first:

1. ``repartitionByRange(n, keys)`` — the TeraSort range shuffle.  The
   partition count is EXPLICIT (``REPARTITION_BY_NUM``), so AQE never
   coalesces it away under either consumer below.
2. One branch counts rows per range (``groupBy(pid)`` — n rows total)
   and folds the counts into cumulative offsets with a window whose
   input is ONE ROW PER RANGE PARTITION — bounded by cluster
   configuration, never by data.
3. The other branch ranks each range locally (``row_number``
   partitioned by pid — parallel, no single-partition exchange of
   DATA) and adds the broadcast offset of all preceding ranges.

Why the range shuffle is pinned with a lazy ``localCheckpoint``:
Spark SQL samples range-partition bounds NONDETERMINISTICALLY per
materialization (observed: two materializations over the same
32-file parquet input placed ±150 rows differently per partition),
so any design that materializes the range exchange twice assigns
offsets computed under one set of bounds to ranks computed under
another — silently wrong at exactly the multi-file scale the
operator exists for (caught by the hostile-domain sf1 sweep; the
single-file sf0.01 tier samples every row and hid it).  Plain
exchange reuse is NOT a reliable single-materialization guarantee
here: the two consumers prune different column sets (the counting
branch needs only the sort keys), the canonical subtrees then
differ, and reuse silently doesn't happen.  The checkpoint
materializes the shuffled rows exactly once (MEMORY_AND_DISK — the
same volume the shuffle itself already wrote, and the same lineage
discipline operators/graph.py uses), and both branches read that one
RDD, making the output invariant to whatever bounds the sampler
picked.

The offsets window partitions by ``pid % 1`` — constant (one group)
but non-foldable, so the bounded cumulative sum keeps an explicit
partition spec instead of degenerating into the partition-less
WindowExec shape the catalog plan gate prohibits for DATA-sized
inputs.  ``tests/test_operators.py`` pins equality against the window
formulation on multi-file input.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_PID = "_gsr_pid"
_CNT = "_gsr_cnt"
_OFF = "_gsr_off"
_LRN = "_gsr_lrn"


def global_sort_rank(
    df: DataFrame,
    order: list[Column],
    rank_col: str = "sort_pos",
    num_partitions: int | None = None,
    dtype: str = "int",
) -> DataFrame:
    """Dense 1-based global rank of ``df`` under the total order
    ``order`` (must include a unique tiebreak key), with no
    single-partition exchange of data anywhere in the plan.

    Output keeps all input columns plus ``rank_col`` cast to
    ``dtype``.
    """
    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))
    part = (
        df.repartitionByRange(num_partitions, *order)
        .withColumn(_PID, F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    counts = part.groupBy(_PID).agg(F.count(F.lit(1)).alias(_CNT))
    w_off = (
        Window.partitionBy(F.pmod(F.col(_PID), F.lit(1)))
        .orderBy(_PID)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.select(
        F.col(_PID),
        F.coalesce(F.sum(_CNT).over(w_off), F.lit(0)).alias(_OFF),
    )
    w_local = Window.partitionBy(_PID).orderBy(*order)
    return (
        part.withColumn(_LRN, F.row_number().over(w_local))
        .join(F.broadcast(offsets), _PID)
        .withColumn(rank_col, (F.col(_OFF) + F.col(_LRN)).cast(dtype))
        .drop(_PID, _OFF, _LRN)
    )
