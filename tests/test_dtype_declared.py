"""Data-independent declared-type sweep (VERDICT r1 items 3+4).

The actual-value oracle (`test_oracle.py`, `test_oracle_smoke_tier.py`)
compares EXECUTED frames, so it can be masked by the fixture: an outer
join whose local data always produces a NULL coerces both pandas sides
to float64 and hides an int-vs-double declaration skew that a NULL-free
partition at driver scale would expose (round-1 `j3b_full_outer` /
`j8_asof_join` passed only by that accident).

This sweep compares what the engines DECLARE, not what the fixture
happened to produce: Spark's analyzed schema vs DuckDB's ``DESCRIBE``
of the oracle SQL, both mapped to the type family the driver's
type-sensitive value-hash distinguishes.  DuckDB ``HUGEINT`` (the
``sum(int)`` result type) is deliberately its own never-matching family:
it surfaces as float64 under pandas while Spark's ``sum(int)`` is
bigint — exactly the round-1 driver-failure class — so any oracle
producing one fails here until it carries ``::BIGINT``.
"""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from projectmapreduce_spark.queries import ORACLES, QUERIES
from tests.conftest import SF_SMOKE

SQL_CHECKED = sorted(n for n in QUERIES if n in ORACLES)

_SPARK_INT = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
_SPARK_FLOAT = (T.FloatType, T.DoubleType)
_DUCK_INT = {
    "TINYINT",
    "SMALLINT",
    "INTEGER",
    "BIGINT",
    "UTINYINT",
    "USMALLINT",
    "UINTEGER",
    "UBIGINT",
}


def spark_family(dt: T.DataType) -> str:
    if isinstance(dt, T.BooleanType):
        return "bool"
    if isinstance(dt, _SPARK_INT):
        return "int"
    if isinstance(dt, _SPARK_FLOAT):
        return "float"
    if isinstance(dt, T.DecimalType):
        return "decimal"
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return "datetime"
    if isinstance(dt, T.DateType):
        return "date"
    if isinstance(dt, T.StringType):
        return "str"
    if isinstance(dt, T.BinaryType):
        return "binary"
    if isinstance(dt, (T.ArrayType, T.MapType, T.StructType)):
        return "nested"
    return f"other:{dt.simpleString()}"


def duck_family(type_str: str) -> str:
    t = type_str.strip().upper()
    if t.startswith("DECIMAL"):
        return "decimal"
    if t.endswith("[]") or t.startswith(("STRUCT", "MAP(", "MAP<", "LIST", "UNION")):
        return "nested"
    if t in _DUCK_INT:
        return "int"
    if t in ("HUGEINT", "UHUGEINT"):
        # pandas renders HUGEINT as float64 while Spark's integer sums are
        # bigint — the round-1 driver-failure class.  Never matches any
        # Spark family; the oracle must cast ::BIGINT.
        return "hugeint"
    if t in ("DOUBLE", "FLOAT", "REAL"):
        return "float"
    if t == "BOOLEAN":
        return "bool"
    if t.startswith("TIMESTAMP"):
        return "datetime"
    if t == "DATE":
        return "date"
    if t in ("VARCHAR", "TEXT"):
        return "str"
    if t == "BLOB":
        return "binary"
    return f"other:{t}"


@pytest.mark.parametrize("name", SQL_CHECKED)
def test_declared_type_families_match(name, spark, duck_correct):
    sp = {
        f.name: spark_family(f.dataType)
        for f in QUERIES[name](spark, SF_SMOKE).schema.fields
    }
    # A STAGED oracle (m11: multi-statement string, temp-table setup
    # + final SELECT — the only form whose semi join survives the sf1
    # graph) can't be wrapped in one DESCRIBE: run the setup
    # statements first, describe only the final SELECT.  Split with
    # DuckDB's own parser (ADVICE r10) — a raw ';' split would break
    # on a future oracle carrying ';' inside a string literal.
    import duckdb as _duckdb

    stmts = [
        s.query for s in _duckdb.extract_statements(ORACLES[name]) if s.query.strip()
    ]
    for setup in stmts[:-1]:
        duck_correct.execute(setup)
    du = {
        row[0]: duck_family(row[1])
        for row in duck_correct.execute(f"DESCRIBE {stmts[-1]}").fetchall()
    }
    assert sorted(sp) == sorted(du), f"column-name mismatch: spark={sorted(sp)} duckdb={sorted(du)}"
    skew = {c: (sp[c], du[c]) for c in sp if sp[c] != du[c]}
    assert not skew, (
        f"declared-type skew {name}: {{col: (spark, duckdb)}} = {skew} — "
        "the driver hash is type-sensitive and fixture data can mask this "
        "(NULL coercion); cast the oracle (::BIGINT/::DOUBLE) or the Spark "
        "column until declared families match"
    )
