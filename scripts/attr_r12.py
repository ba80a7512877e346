#!/usr/bin/env python
"""Round-12 attribution: split each slow headline query's wall time
into (plan build, first count, second count) and optionally time
isolated sub-stages with the noop sink (guide §1.4).  Usage:
    python scripts/attr_r12.py q1 q2 ...
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from projectmapreduce_spark.queries import QUERIES  # noqa: E402
from projectmapreduce_spark.session import get_spark  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    spark = get_spark(app_name="attr-r12", cpus=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    QUERIES["flagship_pricing_summary"](spark, SF).count()
    for name in sys.argv[1:]:
        for run in ("cold", "warm", "warm2"):
            t0 = time.perf_counter()
            df = QUERIES[name](spark, SF)
            t1 = time.perf_counter()
            n = df.count()
            t2 = time.perf_counter()
            print(
                f"{name} {run}: build={t1-t0:.3f}s count={t2-t1:.3f}s rows={n}",
                flush=True,
            )


if __name__ == "__main__":
    main()
