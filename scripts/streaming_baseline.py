#!/usr/bin/env python
"""Generate tests/streaming_baseline.json — the STATE-SHAPE facts of
every declared streaming-drain query at the correctness tier (sf0.01).

Batch plans are regression-gated by tests/test_plan_catalog.py, but
the 12 streaming drains never appear there (their returned DataFrame
is just the memory-sink snapshot).  Their scale-relevant contract
lives in the StreamingQueryProgress stream instead: WHICH stateful
operators run, HOW MANY state rows they hold at end-of-drain, and how
many micro-batches the drain takes.  A silent extra stateful operator
(say, an accidental second deduplicate) would pass every output hash
while multiplying state size at 100 TB — exactly the regression class
this baseline pins.

Facts are collected with a StreamingQueryListener (the public
monitoring API), so nothing about the queries changes; the drains all
use availableNow over fixed fixture files, which makes operator sets
and final state-row counts deterministic.  Micro-batch counts are
deterministic up to engine-internal no-data batches, so the gate
allows a ±2 band there.

Regenerate (then review the diff like source) after an intentional
state-shape change:

    python scripts/streaming_baseline.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def _collector():
    from pyspark.sql.streaming import StreamingQueryListener

    class _Collector(StreamingQueryListener):
        def __init__(self):
            self.progresses = []

        def onQueryStarted(self, event):
            pass

        def onQueryProgress(self, event):
            self.progresses.append(event.progress)

        def onQueryIdle(self, event):
            pass

        def onQueryTerminated(self, event):
            pass

    return _Collector()


def streaming_facts(spark, name: str, sf_dir: str = SF_DIR) -> dict:
    """Run declared streaming query ``name`` under a progress listener
    and reduce the progress stream to its state-shape facts:

    ``streams``: one entry per streaming query the drain started
    (sorted for stable comparison), each with the stateful operator
    names, their end-of-drain state row counts, and the micro-batch
    count.  Listener delivery is asynchronous, so collection waits for
    the event stream to go quiet after the drain returns."""
    from projectmapreduce_spark.queries import QUERIES

    col = _collector()
    spark.streams.addListener(col)
    try:
        QUERIES[name](spark, sf_dir).collect()
        # drain the async listener queue: stable count for 2s (1s
        # proved flaky once under full-machine CPU starvation — a
        # late progress event landed after collection, under-counting
        # batches/state rows; the failure is the harness race, not
        # the query)
        last, stable_since = -1, time.time()
        deadline = time.time() + 60
        while time.time() < deadline:
            n = len(col.progresses)
            if n != last:
                last, stable_since = n, time.time()
            elif time.time() - stable_since > 2.0:
                break
            time.sleep(0.1)
    finally:
        spark.streams.removeListener(col)

    by_stream: dict[str, list] = {}
    for p in col.progresses:
        by_stream.setdefault(p.id, []).append(p)
    streams = []
    for progresses in by_stream.values():
        progresses.sort(key=lambda p: p.batchId)
        final = progresses[-1]
        ops = [s.operatorName for s in final.stateOperators]
        rows = [s.numRowsTotal for s in final.stateOperators]
        streams.append(
            {
                "operators": ops,
                "state_rows": rows,
                "batches": len({p.batchId for p in progresses}),
            }
        )
    streams.sort(key=lambda s: (s["operators"], s["state_rows"], s["batches"]))
    return {"streams": streams}


def main() -> None:
    from projectmapreduce_spark.queries import QUERIES, streaming_query_names
    from projectmapreduce_spark.session import get_spark

    spark = get_spark(app_name="streaming-baseline")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict[str, dict] = {}
    for name in sorted(streaming_query_names()):
        assert name in QUERIES, name
        out[name] = streaming_facts(spark, name)
        print(f"{name}: {out[name]}", flush=True)

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests",
        "streaming_baseline.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"wrote {path} ({len(out)} queries)")


if __name__ == "__main__":
    main()
