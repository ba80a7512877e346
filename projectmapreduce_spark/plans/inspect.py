"""Physical-plan predicates over ``df.explain`` output.

These string-level checks are deliberately coarse — they pin the
*strategy class* (broadcast vs shuffle, pushed vs residual filter,
codegen vs interpreted), which is what survives a 100× scale-up, not
exact operator trees, which don't.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def has_broadcast_hash_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in explain_str(df)


def has_cartesian(df: DataFrame) -> bool:
    s = explain_str(df)
    return "CartesianProduct" in s or "BroadcastNestedLoopJoin" in s


def has_pushed_filters(df: DataFrame) -> bool:
    s = explain_str(df)
    return "PushedFilters: [" in s and "PushedFilters: []" not in s


def has_partition_filters(df: DataFrame) -> bool:
    s = explain_str(df)
    return "PartitionFilters: [" in s and "PartitionFilters: []" not in s


def has_wholestage_codegen(df: DataFrame) -> bool:
    # Under AQE the codegen spans only exist in the FINAL plan, which
    # materializes when THIS DataFrame executes (a derived .count()
    # builds its own plan and leaves this one non-final).  In simple
    # mode codegen spans render as "*(n) Operator".
    df.collect()
    s = explain_str(df, "simple")
    return "WholeStageCodegen" in s or re.search(r"\*\(\d+\)", s) is not None
