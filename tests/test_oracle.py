"""Layer-2 oracle mirror (SURVEY.md §5): every declared query with an
oracle SQL must hash-match DuckDB at sf0.01; rows-only queries must at
least execute and return a stable schema."""

from __future__ import annotations

import pytest

from projectmapreduce_spark.queries import ORACLES, QUERIES
from tests.conftest import SF_CORRECT
from tests.oracle_utils import compare

SQL_CHECKED = sorted(n for n in QUERIES if n in ORACLES)
ROWS_ONLY = sorted(n for n in QUERIES if n not in ORACLES)


@pytest.mark.parametrize("name", SQL_CHECKED)
def test_sql_oracle(name, spark, duck_correct):
    df = QUERIES[name](spark, SF_CORRECT)
    compare(df, ORACLES[name], duck_correct)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only(name, spark):
    df = QUERIES[name](spark, SF_CORRECT)
    n = df.count()
    assert n >= 0
    assert len(df.schema.fields) > 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    out = e.entry(spark)
    rows = out.collect()
    assert len(rows) > 0
