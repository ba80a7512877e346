"""Custom stateful streaming operator (SURVEY.md §2.9/§2.12 P2):
a per-key running aggregate implemented with ``applyInPandasWithState``
— the PySpark escape hatch for operators Spark's built-in stateful
primitives can't express (per-key counters with custom emit logic,
CEP-ish patterns, decaying scores, ...).

State is a single (count, total) pair per user_id — O(keys) state, and
each micro-batch ships only that key's Arrow batch through the Python
worker.  Output mode is ``update``: one row per key per micro-batch in
which the key appeared.
"""

from __future__ import annotations

from collections.abc import Iterable
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_DDL = "user_id long, n_events long, total_value double"
STATE_DDL = "n long, total double"


def _update_user_totals(
    key: tuple[Any, ...],
    batches: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterable[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        n, total = state.get
    else:
        n, total = 0, 0.0
    for pdf in batches:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [user_id], "n_events": [n], "total_value": [round(total, 2)]}
    )


def running_user_totals(stream: DataFrame) -> DataFrame:
    """Running (count, sum(value)) per user as an update stream.

    Batch-equivalent oracle: ``SELECT user_id, count(*), round(sum(value),2)
    GROUP BY user_id`` — after draining a finite source, the LAST update
    emitted per key must equal the batch aggregate (asserted in
    tests/test_streaming.py).
    """
    return stream.groupBy("user_id").applyInPandasWithState(
        _update_user_totals,
        outputStructType=OUTPUT_DDL,
        stateStructType=STATE_DDL,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
