#!/usr/bin/env python
"""Generate tests/plan_baseline.json — the structural plan facts of
every declared batch query at the correctness tier (sf0.01).

The baseline is the checked-in contract that `tests/test_plan_catalog.py`
enforces on every run: shuffle-exchange count must not grow, no new
cartesian/BNLJ may appear, and NO query may ever carry a
partition-less WindowExec.  Facts are read from the JVM plan tree
(`plans.inspect._walk_physical`), not the rendered explain string, so
a Spark upgrade that reformats explain output cannot fake a pass or a
failure — only a real plan change moves the numbers.

Regenerate (then review the diff like source) after an intentional
plan change:

    python scripts/plan_baseline.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def plan_facts(df) -> dict:
    from projectmapreduce_spark.plans import (
        count_shuffle_exchanges,
        has_partitionless_window,
        physical_node_names,
    )

    names = physical_node_names(df)
    return {
        "shuffles": count_shuffle_exchanges(df),
        "broadcasts": sum(1 for n in names if n == "BroadcastExchangeExec"),
        "cartesian": any(
            n in ("CartesianProductExec", "BroadcastNestedLoopJoinExec") for n in names
        ),
        "partitionless_window": has_partitionless_window(df),
    }


def main() -> None:
    from projectmapreduce_spark.queries import QUERIES
    from projectmapreduce_spark.queries.registry import META
    from projectmapreduce_spark.session import get_spark

    spark = get_spark(app_name="plan-baseline")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict[str, dict] = {}
    for name in sorted(QUERIES):
        if META.get(name, {}).get("category") == "streaming":
            # streaming drains return a memory-sink snapshot — their
            # returned plan is a table scan; stateful plan hygiene is
            # pinned in tests/test_streaming.py instead.
            continue
        df = QUERIES[name](spark, SF_DIR)
        out[name] = plan_facts(df)
        print(f"{name}: {out[name]}", flush=True)

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests",
        "plan_baseline.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"wrote {path} ({len(out)} queries)")


if __name__ == "__main__":
    main()
