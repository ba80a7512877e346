"""Golden regression tests (SURVEY.md §5.4): frozen flagship output at
sf0.001 — row count, first sorted row, and a sha256 of the full sorted
result.  Catches silent value drift (rounding, timezone, aggregation
changes) without paying the DuckDB oracle on every edit."""

from __future__ import annotations

import hashlib

from projectmapreduce_spark.queries import QUERIES
from tests.conftest import SF_SMOKE

GOLDEN_SHA = "74b4f618cc4e90530e27311032ca1e4e7fba95a23d06ecfdd699603d10f59cc8"
GOLDEN_FIRST = ("A", "F", 13096.0, 26731890.14, 25368762.52, 26387936.89, 25.68, 52415.47, 0.0502, 510)


def test_flagship_golden(spark):
    df = QUERIES["flagship_pricing_summary"](spark, SF_SMOKE)
    rows = sorted(tuple(r) for r in df.collect())
    assert len(rows) == 6
    assert rows[0] == GOLDEN_FIRST
    assert hashlib.sha256(repr(rows).encode()).hexdigest() == GOLDEN_SHA
