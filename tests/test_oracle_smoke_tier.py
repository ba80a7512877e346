"""Second-distribution oracle sweep: every SQL-checked query must also
hash-match DuckDB at sf0.001.  A query that passes at sf0.01 by
float-boundary luck (a value sitting exactly on a round() or threshold
edge) gets caught by the different data here."""

from __future__ import annotations

import duckdb
import pytest

from projectmapreduce_spark.queries import ORACLES, QUERIES
from tests.conftest import SF_SMOKE, register_views
from tests.oracle_utils import compare

SQL_CHECKED = sorted(n for n in QUERIES if n in ORACLES)


@pytest.fixture(scope="module")
def duck_smoke():
    con = duckdb.connect()
    register_views(con, SF_SMOKE)
    yield con
    con.close()


@pytest.mark.parametrize("name", SQL_CHECKED)
def test_sql_oracle_smoke_tier(name, spark, duck_smoke):
    df = QUERIES[name](spark, SF_SMOKE)
    compare(df, ORACLES[name], duck_smoke)
