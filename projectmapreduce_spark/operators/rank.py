"""Scale-safe global ranking (SURVEY.md §2.6 O1, §2.11 L20).

``row_number() OVER (ORDER BY ...)`` with no PARTITION BY compiles to
a single-partition WindowExec — every row of the input moves to ONE
task, the textbook 100×-scale-killer.  ``global_sort_rank`` computes
the identical dense 1-based position with the zipWithIndex
construction, expressed DataFrame-first:

1. ``repartitionByRange(n, keys)`` — the TeraSort range shuffle.  The
   partition count is EXPLICIT (``REPARTITION_BY_NUM``), so AQE never
   coalesces it and partition ids are stable across the two jobs below.
2. One lightweight job counts rows per range (``groupBy(pid)`` — n
   rows total).  The driver folds the counts into cumulative offsets:
   bounded by the partition count, never by the data (the same
   bounded-driver-state pattern as ``RDD.zipWithIndex``).
3. The main job ranks each range locally (``row_number`` partitioned
   by pid — parallel, no single-partition exchange) and adds the
   broadcast offset of all preceding ranges.

Determinism: the range sampler's seed is fixed per partition in Spark
(``RangePartitioner`` uses ``byteswap32(partitionId)``), so both jobs
compute identical range bounds over the same input, and tie rows can't
straddle a bound because callers must pass a total order (unique
tiebreak key last).  ``tests/test_operators.py`` pins equality against
the window formulation; ``tests/test_plans.py`` pins the absence of a
partition-less WindowExec across the whole declared catalog.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_PID = "_gsr_pid"
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
    single-partition exchange anywhere in the plan.

    Runs one extra counting job at construction time (driver state =
    one long per range partition).  Output keeps all input columns
    plus ``rank_col`` cast to ``dtype``.
    """
    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))
    part = df.repartitionByRange(num_partitions, *order).withColumn(
        _PID, F.spark_partition_id()
    )
    counts = {
        r[_PID]: r["cnt"]
        for r in part.groupBy(_PID).agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    rows, acc = [], 0
    for pid in range(num_partitions):
        rows.append((pid, acc))
        acc += counts.get(pid, 0)
    offsets = spark.createDataFrame(rows, schema=f"{_PID} int, {_OFF} bigint")
    w = Window.partitionBy(_PID).orderBy(*order)
    return (
        part.withColumn(_LRN, F.row_number().over(w))
        .join(F.broadcast(offsets), _PID)
        .withColumn(rank_col, (F.col(_OFF) + F.col(_LRN)).cast(dtype))
        .drop(_PID, _OFF, _LRN)
    )
