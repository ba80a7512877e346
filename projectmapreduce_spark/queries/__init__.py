"""Declared query catalog — the driver contract (SURVEY.md §2).

Every operator row in SURVEY.md §2 marked P0/P1 is declared here as a
named query; ``registry.QUERIES`` maps name → callable(spark, sf_dir)
→ DataFrame and ``registry.ORACLES`` maps name → DuckDB SQL (omitted
for non-SQL-expressible ops, which the driver checks rows-only).

Importing this package imports every query module, which registers all
queries as a side effect.
"""

from projectmapreduce_spark.queries import (  # noqa: F401
    aggregates,
    composite,
    events,
    flagship,
    functions_families,
    io_roundtrip,
    joins,
    llm_pipeline,
    mr_surface,
    projections,
    setops,
    sort_topk,
    streaming_forms,
    udf_surface,
    windows,
)
from projectmapreduce_spark.queries.registry import ORACLES, QUERIES

__all__ = ["QUERIES", "ORACLES"]
