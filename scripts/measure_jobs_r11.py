#!/usr/bin/env python
"""Measure wall time + Spark job count for named queries — the
round-11 evidence harness for ITERATIVE queries (m10/m10b/m11/m11b)
whose per-iteration work is invisible to the final frame's explain()
(everything behind localCheckpoint shows as Scan ExistingRDD).

For each query: run it once cold under a dedicated job group, count
the jobs the build+action scheduled, repeat for a warm number.

Usage: python scripts/measure_jobs_r11.py m10b_pagerank_exact ...
Prints one JSON line per query:
  {"q": name, "cold": s, "warm": s, "jobs_cold": n, "jobs_warm": n}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from projectmapreduce_spark.queries import QUERIES  # noqa: E402
from projectmapreduce_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def run_once(spark, name: str, tag: str) -> tuple[float, int]:
    sc = spark.sparkContext
    group = f"measure-{name}-{tag}"
    sc.setJobGroup(group, f"measure {name} {tag}")
    t0 = time.perf_counter()
    QUERIES[name](spark, SF_DIR).count()
    dt = time.perf_counter() - t0
    jobs = len(sc.statusTracker().getJobIdsForGroup(group))
    sc.setJobGroup("", "")
    return dt, jobs


def main() -> int:
    spark = get_spark(app_name="measure-jobs-r11")
    spark.sparkContext.setLogLevel("ERROR")
    QUERIES["flagship_pricing_summary"](spark, SF_DIR).count()  # JVM warm-up
    for name in sys.argv[1:]:
        if name not in QUERIES:
            print(f"[skip] unknown query {name}")
            continue
        cold, jc = run_once(spark, name, "cold")
        warm, jw = run_once(spark, name, "warm")
        print(
            json.dumps(
                {"q": name, "cold": round(cold, 3), "warm": round(warm, 3),
                 "jobs_cold": jc, "jobs_warm": jw}
            )
        )
        sys.stdout.flush()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
