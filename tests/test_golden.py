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


FUNNEL_GOLDEN = [
    (1, "raw", 500),
    (2, "lang_en", 193),
    (3, "quality", 193),
    (4, "exact_dedup", 193),
    (5, "near_dedup", 75),
    (6, "train_split", 57),
]


def test_corpus_funnel_golden(spark):
    """Frozen L30 funnel counts at sf0.001: any semantic drift in the
    five composed operators (lang filter, quality gate, exact dedup,
    Jaccard near-dedup, split hash) moves one of these six integers."""
    df = QUERIES["l30_corpus_funnel"](spark, SF_SMOKE)
    rows = sorted(tuple(r) for r in df.collect())
    assert rows == FUNNEL_GOLDEN
