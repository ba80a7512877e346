"""Re-run idempotence for STATEFUL queries (SURVEY.md §5 layer-2
extension): every query that writes scratch state (sinks, bucketed
tables, upserts, compaction, snapshots, incremental agg) must produce
the IDENTICAL result when run twice in one session — the driver and
the bench both re-run queries, and leftover state (appended files,
stale tables, non-reset manifests) is exactly the class of bug a
single-pass oracle sweep cannot see.
"""

from __future__ import annotations

import pytest

from projectmapreduce_spark.queries import QUERIES
from tests.conftest import SF_CORRECT
from tests.oracle_utils import _canon_frame

STATEFUL = [
    "s2_csv_roundtrip",
    "s3_jsonl_roundtrip",
    "s4_text_roundtrip",
    "s5_parquet_roundtrip",
    "s6_partitioned_sink",
    "s7_bucketed_join",
    "s8_dynamic_overwrite",
    "s9_orc_roundtrip",
    "s10_schema_evolution",
    "s11_upsert_merge",
    "s12_zorder_layout",
    "s13_compression_roundtrip",
    "s14_compaction",
    "s15_snapshot_read",
    "s16_malformed_tolerance",
    "a14_incremental_agg",
    # round-8: parquet-backed variant store, the _metadata audit's
    # partitioned scratch write, the scripting block's session-scoped
    # locals, and the OR REPLACE'd SQL table function
    "f9b_variant_shred",
    "s26_metadata_columns",
    "c27_sql_scripting",
    "x11_sql_table_function",
    "s27_parquet_bloom",
    "s28_binary_file_scan",
    # round-9: s25's fixture became reuse-on-rerun (marker file) — the
    # second run takes the reuse path, exactly what this gate checks
    "s25_datasource_pushdown",
]


@pytest.mark.parametrize("name", STATEFUL)
def test_stateful_query_rerun_is_idempotent(spark, name):
    first = _canon_frame(QUERIES[name](spark, SF_CORRECT).toPandas())
    second = _canon_frame(QUERIES[name](spark, SF_CORRECT).toPandas())
    assert first == second, f"{name} drifted on re-run (leftover state)"
