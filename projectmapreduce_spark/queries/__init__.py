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
from projectmapreduce_spark.queries.registry import META, ORACLES, QUERIES

__all__ = ["QUERIES", "ORACLES", "META"]


def streaming_query_names() -> set[str]:
    """Names of the streaming-drain queries (category == 'streaming').

    The split exists because the two lanes have opposite cost shapes:
    batch queries are ~1 s each at any tier, while each streaming drain
    pays checkpoint + micro-batch scheduling overhead that grows with
    data volume (minutes each at sf1).  Sweeping them as separate lanes
    lets the full catalog fit a recorded at-volume pass per tier
    (VERDICT r6 next-round #1)."""
    return {n for n, m in META.items() if m["category"] == "streaming"}
