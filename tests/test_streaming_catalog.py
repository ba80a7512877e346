"""State-shape regression gate for the streaming-drain queries —
the streaming counterpart of test_plan_catalog.py (VERDICT r6 task #4).

Batch plans are pinned via plan_baseline.json; the drains' returned
DataFrame is just a memory-sink snapshot, so their scale contract is
pinned HERE from the StreamingQueryProgress stream instead: the exact
stateful-operator set, the end-of-drain state row counts, and the
micro-batch count.  A silent extra stateful operator (or a state-size
blow-up) would pass every output hash while multiplying state at
100 TB — this gate is what catches it.

Regenerate the baseline after an INTENTIONAL state-shape change with
``python scripts/streaming_baseline.py`` and review the diff like
source code.
"""

from __future__ import annotations

import json
import os

import pytest

BASELINE_PATH = os.path.join(os.path.dirname(__file__), "streaming_baseline.json")
with open(BASELINE_PATH) as _f:
    BASELINE = json.load(_f)


def test_baseline_covers_every_streaming_query():
    from projectmapreduce_spark.queries import streaming_query_names

    assert set(BASELINE) == streaming_query_names()


@pytest.mark.parametrize("name", sorted(BASELINE))
def test_streaming_state_shape(spark, name):
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    from streaming_baseline import streaming_facts

    got = streaming_facts(spark, name)
    want = BASELINE[name]
    assert len(got["streams"]) == len(want["streams"]), (
        f"{name}: number of streaming queries changed "
        f"({len(want['streams'])} -> {len(got['streams'])})"
    )
    for g, w in zip(got["streams"], want["streams"]):
        # the stateful operator SET is exact — a new operator is a
        # state-size regression even if every hash still passes
        assert g["operators"] == w["operators"], f"{name}: stateful operators changed"
        assert g["state_rows"] == w["state_rows"], f"{name}: end-of-drain state rows changed"
        # availableNow batch counts are deterministic up to
        # engine-internal no-data batches — allow a small band
        assert abs(g["batches"] - w["batches"]) <= 2, (
            f"{name}: micro-batch count moved {w['batches']} -> {g['batches']}"
        )
