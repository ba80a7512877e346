"""Source/sink round-trip queries (SURVEY.md §2.1, S2–S6).

The oracle trick: write a driver table to format X under
``.scratch/``, read it back with an explicit schema, aggregate — the
result must hash-match aggregating the original table in DuckDB.  That
checks BOTH directions of each connector with a full value oracle.

Writes stay inside the repo (``/root/repo/.scratch``), overwrite mode,
so repeated driver runs are idempotent.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from projectmapreduce_spark.functions import dround, money_sum
from projectmapreduce_spark.io import (
    scan,
    scan_csv,
    scan_jsonl,
    scan_orc,
    scan_text,
    sink_csv,
    sink_jsonl,
    sink_orc,
    sink_parquet,
    sink_partitioned,
)
from projectmapreduce_spark.queries.registry import query

from projectmapreduce_spark.io import scratch_path as _p


@query(
    "s2_csv_roundtrip",
    oracle="""
SELECT n_regionkey, count(*) AS n_nations, min(n_name) AS first_name
FROM nation GROUP BY n_regionkey
""",
    survey="S2",
    category="io",
)
def s2_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV sink → schema-explicit CSV scan → aggregate == source table."""
    n = scan(spark, sf_dir, "nation")
    path = _p("nation_csv")
    sink_csv(n, path)
    back = scan_csv(spark, path, "n_nationkey int, n_name string, n_regionkey int")
    return back.groupBy("n_regionkey").agg(
        F.count(F.lit(1)).alias("n_nations"), F.min("n_name").alias("first_name")
    )


@query(
    "s3_jsonl_roundtrip",
    oracle="""
SELECT s_nationkey, count(*) AS n_suppliers, round(sum(s_acctbal), 2) AS total_bal
FROM supplier GROUP BY s_nationkey
""",
    survey="S3",
    category="io",
)
def s3_jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines sink → schema-explicit scan → aggregate == source."""
    s = scan(spark, sf_dir, "supplier")
    path = _p("supplier_jsonl")
    sink_jsonl(s, path)
    back = scan_jsonl(
        spark, path, "s_suppkey long, s_name string, s_nationkey int, s_acctbal double"
    )
    return back.groupBy("s_nationkey").agg(
        F.count(F.lit(1)).alias("n_suppliers"),
        dround(F.sum("s_acctbal"), 2).alias("total_bal"),
    )


@query(
    "s4_text_roundtrip",
    oracle="""
SELECT count(*) AS n_lines,
       sum(length(replace(replace(replace(coalesce(text, ''),
             chr(92), chr(92) || chr(92)),
             chr(10), chr(92) || 'n'),
             chr(13), chr(92) || 'r')))::BIGINT AS total_chars
FROM documents
""",
    survey="S4",
    category="io",
)
def s4_text_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text sink (one line per doc) → line scan (the MR TextInputFormat
    shape) → line count + char mass == source.

    Records are NEWLINE-ESCAPED before the write (backslash-escape of
    \\, \\n, \\r — literal `F.replace`, no regex), because a line sink
    is only a roundtrip for newline-free records: a document
    containing \\n becomes several lines and silently changes both
    counts (caught by the hostile-domain sweep).  NULL docs write as
    empty lines.  The oracle applies the identical escape, so the
    char mass is checked on the exact bytes that hit the sink."""
    esc = F.replace(
        F.replace(
            F.replace(
                F.coalesce(F.col("text"), F.lit("")), F.lit("\\"), F.lit("\\\\")
            ),
            F.lit("\n"),
            F.lit("\\n"),
        ),
        F.lit("\r"),
        F.lit("\\r"),
    )
    d = scan(spark, sf_dir, "documents").select(esc.alias("text"))
    path = _p("documents_text")
    d.write.mode("overwrite").text(path)
    back = scan_text(spark, path)
    return back.agg(
        F.count(F.lit(1)).alias("n_lines"), F.sum(F.length("value")).alias("total_chars")
    )


@query(
    "s5_parquet_roundtrip",
    oracle="""
SELECT l_returnflag, count(*) AS n_rows, round(sum(l_quantity), 2) AS sum_qty
FROM lineitem WHERE l_quantity >= 25.0 GROUP BY l_returnflag
""",
    survey="S5",
    category="io",
)
def s5_parquet_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parquet sink of a filtered projection → re-scan → aggregate."""
    li = scan(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= 25.0)
    path = _p("lineitem_parquet")
    sink_parquet(li.select("l_returnflag", "l_quantity"), path)
    back = spark.read.parquet(path)
    return back.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_rows"), dround(F.sum("l_quantity"), 2).alias("sum_qty")
    )


@query(
    "s6_partitioned_sink",
    oracle="""
SELECT event_type, count(*) AS n_events, round(sum(value), 2) AS total_value
FROM events
WHERE event_type IN ('click', 'purchase')
GROUP BY event_type
""",
    survey="S6",
    category="io",
)
def s6_partitioned_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-partitioned sink (partitionBy event_type) → partition-pruned
    scan of two partitions → aggregate.  The read plan prunes to the
    two named partition directories (PartitionFilters) — the layout a
    100 TB events table needs for type-selective queries."""
    ev = scan(spark, sf_dir, "events").select("event_id", "event_type", "value")
    path = _p("events_partitioned")
    sink_partitioned(ev, path, ["event_type"])
    back = spark.read.parquet(path).filter(F.col("event_type").isin("click", "purchase"))
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"), dround(F.sum("value"), 2).alias("total_value")
    )


@query(
    "s7_bucketed_join",
    oracle="""
SELECT o_orderpriority, count(*) AS n_items,
       round(sum(CAST(round(l_extendedprice, 4) AS DECIMAL(20,4))), 2)::DOUBLE AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
""",
    survey="S7,S5,J1",
    category="io",
)
def s7_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed-sink co-located join: both sides written as managed
    tables bucketed (and bucket-sorted) on the join key, then joined as
    ``spark.table()``s — the bucketed scan satisfies the join's
    distribution requirement so the plan has NO shuffle exchange on
    either side (asserted in tests/test_bucketing.py and
    tests/test_plans.py).  The 100 TB story: one up-front bucketed
    write amortizes the fact-table shuffle across every downstream
    join on that key."""
    from projectmapreduce_spark.io import sink_bucketed

    li = scan(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice")
    o = scan(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    sink_bucketed(li, "pmr_s7_lineitem", ["l_orderkey"], n_buckets=8, sort_cols=["l_orderkey"])
    sink_bucketed(o, "pmr_s7_orders", ["o_orderkey"], n_buckets=8, sort_cols=["o_orderkey"])
    j = spark.table("pmr_s7_lineitem").join(
        spark.table("pmr_s7_orders"), F.col("l_orderkey") == F.col("o_orderkey")
    )
    return j.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_items"),
        money_sum("l_extendedprice").alias("revenue"),
    )


@query(
    "s9_orc_roundtrip",
    oracle="""
SELECT c_mktsegment, count(*) AS n_customers, round(sum(c_acctbal), 2) AS total_bal
FROM customer GROUP BY c_mktsegment
""",
    survey="S9",
    category="io",
)
def s9_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC sink → schema-explicit ORC scan → aggregate == source table.
    Exercises Spark's second native columnar format end-to-end (write
    then vectorized read with column pruning)."""
    c = scan(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment", "c_acctbal")
    path = _p("customer_orc")
    sink_orc(c, path)
    back = scan_orc(spark, path, "c_custkey long, c_mktsegment string, c_acctbal double")
    return back.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_customers"),
        dround(F.sum("c_acctbal"), 2).alias("total_bal"),
    )


@query(
    "s8_dynamic_overwrite",
    oracle="""
SELECT event_type, count(*) AS n_events, round(sum(value), 2) AS total_value
FROM events GROUP BY event_type
""",
    survey="S8,S6",
    category="io",
)
def s8_dynamic_overwrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition overwrite (the backfill primitive): write the
    full partitioned dataset, then RE-write only the 'click' partition
    with partitionOverwriteMode=dynamic.  The aggregate over the final
    state must equal the plain per-type aggregate — which it can only
    do if the rewrite replaced exactly the click partition and left
    every other partition intact (static mode would wipe them and fail
    the value hash)."""
    from projectmapreduce_spark.io import overwrite_partitions

    ev = scan(spark, sf_dir, "events").select("event_id", "event_type", "value")
    path = _p("events_dynamic")
    sink_partitioned(ev, path, ["event_type"])
    overwrite_partitions(
        ev.filter(F.col("event_type") == "click"), path, ["event_type"]
    )
    back = spark.read.parquet(path)
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"), dround(F.sum("value"), 2).alias("total_value")
    )


@query(
    "s10_schema_evolution",
    oracle="""
SELECT doc_id, n_chars,
       CASE WHEN doc_id % 2 = 1 THEN lang ELSE NULL END AS lang
FROM documents
""",
    survey="S10,P6",
    category="io",
)
def s10_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution scan: a lake directory whose early files were
    written BEFORE a column existed (here: `lang` added between batch
    v1 and v2).  ``mergeSchema=true`` unions the footers into one
    scan schema and null-fills the missing column for old files — the
    semantics a 100 TB append-only lake needs to keep old partitions
    readable after every schema addition.  (Spark reconciles by NAME;
    at scale, turn mergeSchema off once a table schema is registered
    in a metastore and pay footer-merging only on evolution
    boundaries.)  The read-back rows hash-match computing the same
    null-pattern from the source table."""
    d = scan(spark, sf_dir, "documents")
    path = _p("docs_evolving")
    v1 = d.filter(F.col("doc_id") % 2 == 0).select("doc_id", "n_chars")
    v2 = d.filter(F.col("doc_id") % 2 == 1).select("doc_id", "n_chars", "lang")
    sink_parquet(v1, os.path.join(path, "batch=v1"))
    sink_parquet(v2, os.path.join(path, "batch=v2"))
    back = spark.read.option("mergeSchema", "true").parquet(path)
    return back.select("doc_id", "n_chars", "lang")


@query(
    "s11_upsert_merge",
    oracle="""
SELECT o_orderkey,
       CASE WHEN o_orderkey % 10 = 0 THEN round(o_totalprice * 1.1, 2)
            ELSE o_totalprice END AS o_totalprice,
       CASE WHEN o_orderkey % 10 = 0 THEN 'P' ELSE o_orderstatus END AS o_orderstatus
FROM orders
UNION ALL
SELECT o_orderkey + 10000000 AS o_orderkey,
       100.0 AS o_totalprice,
       'O' AS o_orderstatus
FROM orders WHERE o_orderkey % 1000 = 0
""",
    survey="S11,J5",
    category="io",
)
def s11_upsert_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S11: upsert/MERGE emulation on plain parquet — apply a change
    batch (repriced rows + brand-new rows) to a base table:
    updates-win anti-join union, written out and read back, so the
    LAKE's final state is what hash-matches the oracle's CASE/UNION
    re-expression.  The anti-join broadcasts the small change batch
    (the base table never shuffles); at 100 TB the rewrite is scoped
    to touched partitions via S8's dynamic overwrite — see
    ``io.upsert_by_rewrite``.  This is the engine primitive
    Delta/Iceberg MERGE compiles to, minus their transaction log."""
    from projectmapreduce_spark.io import upsert_by_rewrite

    base = scan(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice", "o_orderstatus")
    repriced = (
        base.filter(F.col("o_orderkey") % 10 == 0)
        .select(
            "o_orderkey",
            dround(F.col("o_totalprice") * 1.1, 2).alias("o_totalprice"),
            F.lit("P").alias("o_orderstatus"),
        )
    )
    inserts = (
        base.filter(F.col("o_orderkey") % 1000 == 0)
        .select(
            (F.col("o_orderkey") + 10_000_000).alias("o_orderkey"),
            F.lit(100.0).alias("o_totalprice"),
            F.lit("O").alias("o_orderstatus"),
        )
    )
    merged = upsert_by_rewrite(base, repriced.unionByName(inserts), "o_orderkey")
    path = _p("orders_merged")
    sink_parquet(merged, path)
    return spark.read.parquet(path)


def _zorder_bits_spark(x, y, bits: int = 8):
    """Morton/Z-order interleave of two ``bits``-wide non-negative ints:
    bit i of x lands at position 2i, bit i of y at 2i+1.  Built as a
    sum of disjoint-bit terms (+ ≡ | here), all JVM-side integer ops —
    whole-stage codegen fuses the 2×bits terms into straight-line code.
    """
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z + F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i)
        z = z + F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1)
    return z


def _zorder_bits_sql(x: str, y: str, bits: int = 8) -> str:
    """The same interleave as DuckDB SQL (engine-exact arithmetic)."""
    terms = []
    for i in range(bits):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


@query(
    "s12_zorder_layout",
    oracle=f"""
WITH z AS (
  SELECT (user_id % 256)::BIGINT AS ux,
         day(ts)::BIGINT AS dy,
         ({_zorder_bits_sql('(user_id % 256)', 'day(ts)')})::BIGINT AS zval
  FROM events
)
SELECT (zval >> 10)::BIGINT AS zbucket,
       count(*)::BIGINT AS n_events,
       min(ux)::BIGINT AS min_ux, max(ux)::BIGINT AS max_ux,
       min(dy)::BIGINT AS min_dy, max(dy)::BIGINT AS max_dy
FROM z GROUP BY 1
""",
    survey="S12,S6",
    category="io",
)
def s12_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S12: Z-order clustered data layout — the multi-dimensional
    locality write (what Delta/Iceberg ``OPTIMIZE ZORDER BY`` compiles
    to, expressed as engine primitives on plain parquet).  Interleave
    the bits of two query dimensions (user bucket × day-of-month) into
    a Morton key, partition the lake by key range, and every file's
    parquet footer min/max becomes TIGHT IN BOTH DIMENSIONS — a filter
    on either column alone prunes most files, which single-column sort
    layouts only give for their leading column.  At 100 TB this is the
    difference between scanning one machine's worth and one rack's
    worth for point-in-rectangle queries.

    The declared check writes the z-partitioned lake, reads it BACK,
    and aggregates per z-range: the per-bucket min/max of BOTH source
    dimensions (the footer-stats proxy) must hash-match recomputing
    the same arithmetic in DuckDB — so the layout key, the partitioned
    write, and the read-back all verify end-to-end."""
    e = scan(spark, sf_dir, "events")
    x = (F.col("user_id") % 256).cast("long")
    y = F.dayofmonth("ts").cast("long")
    z = _zorder_bits_spark(x, y)
    keyed = e.select(
        x.alias("ux"), y.alias("dy"), F.shiftright(z, 10).cast("long").alias("zbucket")
    )
    path = _p("events_zorder")
    keyed.write.mode("overwrite").partitionBy("zbucket").parquet(path)
    back = spark.read.parquet(path)
    return back.groupBy(F.col("zbucket").cast("long").alias("zbucket")).agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.min("ux").cast("long").alias("min_ux"),
        F.max("ux").cast("long").alias("max_ux"),
        F.min("dy").cast("long").alias("min_dy"),
        F.max("dy").cast("long").alias("max_dy"),
    )


@query(
    "s13_compression_roundtrip",
    oracle="""
SELECT o_orderstatus,
       count(*)::BIGINT AS n_orders,
       round(sum(CAST(round(o_totalprice, 4) AS DECIMAL(20,4))), 2)::DOUBLE AS total_price
FROM orders GROUP BY o_orderstatus
""",
    survey="S13,S5,S2",
    category="io",
)
def s13_compression_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S13: compression-codec round-trip — the same table written as
    zstd parquet AND gzip CSV, both read back, and their union
    aggregated; the result must equal aggregating the source twice.
    Codec choice is a first-class storage knob at 100 TB (zstd ≈
    gzip-class ratio at several-times-faster decode; snappy trades
    ratio for CPU) and a silent corruption source if any codec path
    mis-round-trips — this check pins both directions of both codecs.
    Parquet splits by row group so zstd files stay parallel-readable;
    gzip CSV is NOT splittable (one task per file at scale — the
    documented reason CSV-gzip is an ingest format, not a lake
    format)."""
    o = scan(spark, sf_dir, "orders").select("o_orderstatus", "o_totalprice")
    pq_path = _p("orders_zstd_parquet")
    csv_path = _p("orders_gzip_csv")
    o.write.mode("overwrite").option("compression", "zstd").parquet(pq_path)
    o.write.mode("overwrite").option("compression", "gzip").option("header", "true").csv(
        csv_path
    )
    back_pq = spark.read.parquet(pq_path)
    back_csv = scan_csv(spark, csv_path, "o_orderstatus string, o_totalprice double")
    both = back_pq.unionByName(back_csv)
    # Each source row appears exactly twice (once per codec); halve the
    # count and sum so the oracle is the plain single-table aggregate.
    return both.groupBy("o_orderstatus").agg(
        (F.count(F.lit(1)) / 2).cast("long").alias("n_orders"),
        # exact decimal sum over both codec copies, halved in decimal
        # (2S/2 = S exactly), so the cent rounding sees the exact value
        F.round(F.sum(dround("o_totalprice", 4).cast("decimal(20,4)")) / 2, 2)
        .cast("double")
        .alias("total_price"),
    )


@query(
    "s14_compaction",
    oracle="""
SELECT 64::BIGINT AS files_before,
       4::BIGINT AS files_after,
       count(*)::BIGINT AS n_events,
       round(sum(value), 2) AS total_value
FROM events
""",
    survey="S14,S5",
    category="io",
)
def s14_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S14: small-file compaction (the OPTIMIZE primitive) — rewrite a
    fragmented table into few large files with zero data change.  The
    streaming-ingest failure mode at 100 TB is millions of KB-sized
    files (one per micro-batch per partition): every scan then pays
    one task + one footer read per file.  Compaction = read +
    ``coalesce(target)`` + rewrite: coalesce merges partitions WITHOUT
    a shuffle (each output task concatenates whole input splits), so
    the rewrite cost is pure IO.  At real scale the target count comes
    from ``bytes/maxPartitionBytes``; repartition (with shuffle) only
    when column-clustering (S12) is wanted in the same pass.

    The query writes events 64-ways, compacts to 4 files, and proves
    both the file counts (driver-side listing of the two directories —
    metadata, not data) and the data (read-back aggregate must equal
    the source table's).

    Partition-count independence (round-5 sweep catch): the
    compaction READ must see file-grained splits, or the split
    packing — whose ``bytesPerCore`` term scales with
    ``defaultParallelism`` — can collapse 64 tiny files into fewer
    than 4 partitions (observed: 2 at local[2], making files_after=2)
    and ``coalesce(4)`` cannot split partitions back up.  A real
    OPTIMIZE groups by FILE for the same reason; here the scan
    granularity confs are pinned for the read and restored after the
    rewrite action completes."""
    ev = scan(spark, sf_dir, "events").select("event_id", "value")
    frag_path = _p("s14_fragmented")
    compact_path = _p("s14_compacted")
    ev.repartition(64).write.mode("overwrite").parquet(frag_path)
    old_mpb = spark.conf.get("spark.sql.files.maxPartitionBytes")
    old_open = spark.conf.get("spark.sql.files.openCostInBytes")
    try:
        spark.conf.set("spark.sql.files.maxPartitionBytes", str(16 * 1024))
        spark.conf.set("spark.sql.files.openCostInBytes", str(16 * 1024))
        frag = spark.read.parquet(frag_path)
        frag.coalesce(4).write.mode("overwrite").parquet(compact_path)
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old_mpb)
        spark.conf.set("spark.sql.files.openCostInBytes", old_open)

    def _n_files(path: str) -> int:
        return sum(
            1 for f in os.listdir(path) if f.startswith("part-") and f.endswith(".parquet")
        )

    back = spark.read.parquet(compact_path)
    return back.agg(
        F.count(F.lit(1)).alias("n_events"),
        dround(F.sum("value"), 2).alias("total_value"),
    ).select(
        F.lit(_n_files(frag_path)).cast("long").alias("files_before"),
        F.lit(_n_files(compact_path)).cast("long").alias("files_after"),
        "n_events",
        "total_value",
    )


@query(
    "s15_snapshot_read",
    oracle="""
SELECT count(*)::BIGINT AS n_rows,
       round(sum(CAST(round(o_totalprice, 4) AS DECIMAL(20,4))), 2)::DOUBLE AS total_price
FROM orders WHERE o_orderkey % 3 = 0
""",
    survey="S15,S5",
    category="io",
)
def s15_snapshot_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S15: manifest-pinned snapshot reads (time travel on plain
    parquet) — the core mechanism of Delta/Iceberg/Hudi reduced to its
    primitive: a snapshot is a MANIFEST (an explicit file list), and a
    reader that scans exactly the manifested files sees a consistent
    table version regardless of files appended afterwards.

    The query writes version-1 data (orderkey%3=0), records its files
    as manifest v1, appends version-2 data (orderkey%3=1) with a v2
    manifest, then reads AS OF v1 by passing the v1 manifest's file
    list to the reader.  The aggregate must equal the v1 subset only —
    proving the append is invisible to the pinned snapshot.  At 100 TB
    manifests live beside the data and are listed, never scanned;
    planning cost is manifest-size, not directory-listing-size."""
    import json

    o = scan(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    table = _p("s15_lake")
    v1 = o.filter(F.col("o_orderkey") % 3 == 0)
    v2 = o.filter(F.col("o_orderkey") % 3 == 1)
    # overwrite → v1 files; record manifest; append v2; record manifest.
    v1.write.mode("overwrite").parquet(table)

    def _files() -> list[str]:
        return sorted(
            os.path.join(table, f)
            for f in os.listdir(table)
            if f.startswith("part-") and f.endswith(".parquet")
        )

    manifest_v1 = _files()
    with open(os.path.join(table, "_manifest_v1.json"), "w") as fh:
        json.dump(manifest_v1, fh)
    v2.write.mode("append").parquet(table)
    with open(os.path.join(table, "_manifest_v2.json"), "w") as fh:
        json.dump(_files(), fh)

    with open(os.path.join(table, "_manifest_v1.json")) as fh:
        pinned = json.load(fh)
    back = spark.read.parquet(*pinned)
    return back.agg(
        F.count(F.lit(1)).alias("n_rows"), money_sum("o_totalprice").alias("total_price")
    )


@query(
    "s16_malformed_tolerance",
    oracle="""
SELECT count(*)::BIGINT AS n_good,
       min(s_suppkey) AS min_key,
       max(length(s_name))::BIGINT AS max_name_len,
       sum(s_nationkey)::BIGINT AS nation_sum,
       round(sum(s_acctbal), 2) AS total_bal
FROM supplier
""",
    survey="S16,S2",
    category="io",
)
def s16_malformed_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S16: malformed-record tolerance — the dirty-data reality of
    100 TB ingest: a CSV lake ALWAYS contains rows that don't parse
    (wrong arity, garbage in typed columns, encoding damage), and the
    pipeline must quarantine them deterministically, not die and not
    silently corrupt.

    The query writes supplier as clean CSV, injects 3 malformed lines
    into the directory (bad arity / non-numeric key / empty), then
    reads with an explicit schema under ``mode=DROPMALFORMED``.  The
    aggregate over surviving rows must equal the clean source table —
    proving exactly the injected rows (and nothing else) were dropped.
    The PERMISSIVE + ``_corrupt_record`` variant (quarantine-to-column
    instead of drop) is asserted in tests/test_operators.py.  Parsing
    is per-partition map work; tolerance adds zero shuffle."""
    s = scan(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey", "s_acctbal"
    )
    path = _p("s16_dirty_csv")
    s.write.mode("overwrite").option("header", "false").csv(path)
    with open(os.path.join(path, "injected-bad.csv"), "w") as fh:
        fh.write("only,three,fields\n")
        fh.write("not_a_number,Supplier#X,7,123.45\n")
        fh.write("\n")
    schema = "s_suppkey long, s_name string, s_nationkey int, s_acctbal double"
    # multiLine: names may legitimately contain QUOTED newlines (the
    # writer quotes them correctly); without it the reader splits the
    # quoted field at the newline and DROPMALFORMED silently discards
    # REAL rows (caught by the hostile-domain sweep).  Cost note:
    # multiLine CSV files are not split within a file — at 100 TB keep
    # dirty CSV ingest many-files-small, or pre-normalize newlines.
    back = (
        spark.read.schema(schema)
        .option("header", "false")
        .option("mode", "DROPMALFORMED")
        .option("multiLine", "true")
        .csv(path)
    )
    return back.agg(
        F.count(F.lit(1)).alias("n_good"),
        F.min("s_suppkey").alias("min_key"),
        F.max(F.length("s_name")).cast("long").alias("max_name_len"),
        F.sum("s_nationkey").cast("long").alias("nation_sum"),
        dround(F.sum("s_acctbal"), 2).alias("total_bal"),
    )


@query(
    "s17_dpp_join",
    oracle="""
WITH dim AS (
  SELECT year(o_orderdate) AS o_year
  FROM orders
  GROUP BY 1
  HAVING (max(struct_pack(p := o_totalprice, k := o_orderkey,
                          mo := month(o_orderdate)))).mo <= 6
)
SELECT year(l_shipdate)::INT AS ship_year,
       count(*)::BIGINT AS n_items,
       round(sum(CAST(round(l_extendedprice, 4) AS DECIMAL(20,4))), 2)::DOUBLE AS revenue
FROM lineitem JOIN dim ON year(l_shipdate) = dim.o_year
GROUP BY 1
""",
    survey="S17,S6,J2",
    category="io",
)
def s17_dpp_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S17: dynamic partition pruning — the headline scan-reduction
    mechanism of a partitioned 100 TB lake (VERDICT r5 next-round #3).

    Lineitem is written hive-partitioned by ship year (S6's layout),
    then joined to a year dimension whose predicate lives on an
    AGGREGATED attribute — "years whose single most valuable order was
    placed in the first half" (argmax via lexicographic struct max,
    orderkey tie-break, so it is deterministic and cross-engine).
    Because the predicate is underivable from the join key, Catalyst
    CANNOT statically prune the fact scan; the only way to skip
    partitions is Spark's runtime DPP: the dim side's broadcast result
    is replayed into the fact scan's PartitionFilters as a
    ``dynamicpruningexpression``, and partition directories that match
    no dim row are never opened.  At 100 TB this is the difference
    between scanning 7 years and scanning 3.

    Both halves of the proof are pinned in tests/test_plans.py::
    test_s17_dynamic_partition_pruning: the pre-execution plan carries
    a live (non-degraded) dynamicpruningexpression, and the executed
    scan's runtime ``numPartitions`` metric is STRICTLY LESS than the
    directory's partition count at every tested tier.  Design note: a
    window/TakeOrdered dim subplan silently degrades the filter to
    ``dynamicpruningexpression(true)`` (broadcast reuse fails to
    canonicalize) — the pure aggregate+filter dim here is the shape
    that keeps pruning live, which is exactly the kind of fact this
    query exists to pin."""
    li = scan(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", F.year("l_shipdate").alias("ship_year")
    )
    path = _p("s17_lineitem_by_year")
    sink_partitioned(li, path, ["ship_year"])

    o = scan(spark, sf_dir, "orders")
    dim = (
        o.groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.max(
                F.struct(
                    F.col("o_totalprice").alias("p"),
                    F.col("o_orderkey").alias("k"),
                    F.month("o_orderdate").alias("mo"),
                )
            ).alias("m")
        )
        .filter(F.col("m.mo") <= 6)
        .select("o_year")
    )
    fact = spark.read.parquet(path)
    j = fact.join(F.broadcast(dim), fact.ship_year == dim.o_year)
    return j.groupBy("ship_year").agg(
        F.count(F.lit(1)).alias("n_items"),
        money_sum("l_extendedprice").alias("revenue"),
    )


@query(
    "s18_stats_file_skipping",
    oracle="""
WITH bounds AS (SELECT max(o_orderkey) + 1 AS span FROM orders)
SELECT count(*)::BIGINT AS n_rows,
       round(sum(CAST(round(o_totalprice, 4) AS DECIMAL(20,4))), 2)::DOUBLE AS total_price
FROM orders, bounds
WHERE o_orderkey >= (3 * span) // 8
  AND o_orderkey <= (4 * span) // 8 - 1
""",
    survey="S18,S5,P4",
    category="io",
)
def s18_stats_file_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S18: min/max-stats file skipping — the metadata-layer scan
    pruning of Delta/Iceberg/Hudi ("data skipping") reduced to its
    primitive on plain parquet.  Orders are written KEY-CLUSTERED
    (16 range buckets, one file each, via ``repartition(16, bucket)``
    + ``partitionBy``), a STATS MANIFEST is built from parquet FOOTERS
    only (``io.build_stats_manifest`` — no data pages read), and a
    key-range query consults the manifest FIRST: files whose [min,max]
    cannot intersect the predicate are never OPENED.  The surviving
    files still get the residual filter (skipping changes cost, never
    results), and Spark's own row-group pruning applies inside them.

    This is a different layer from S6/S17 (directory-name pruning) and
    S12 (clustered layout): the skip decision comes from per-file
    VALUE STATISTICS, so it works for any clustered column without
    encoding it in the path — at 100 TB the manifest is a few KB per
    thousand files, maintained incrementally at commit time, and
    planning cost is manifest-size instead of footer-listing-size.
    The 1-row max() scalar fixing the bucket width is metadata-scale
    driver state (same class as the T8/S14 scalars); pruning
    effectiveness is pinned in tests/test_new_surfaces.py (survivors
    strictly fewer than half the manifest; pruned-read ≡ full-read)."""
    from projectmapreduce_spark.io import build_stats_manifest, prune_manifest

    o = scan(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    span = o.agg(F.max("o_orderkey")).collect()[0][0] + 1
    lake = _p("s18_lake")
    (
        o.withColumn("b", F.expr(f"CAST(o_orderkey * 16 DIV {span} AS INT)"))
        .repartition(16, "b")
        .write.mode("overwrite")
        .partitionBy("b")
        .parquet(lake)
    )
    manifest = build_stats_manifest(lake, "o_orderkey")
    lo, hi = (3 * span) // 8, (4 * span) // 8 - 1
    survivors = prune_manifest(manifest, lo, hi)
    if survivors:
        back = spark.read.parquet(*survivors)
    else:
        # every file skipped (predicate outside the table's range) —
        # skipping must produce the same EMPTY result, not a
        # no-paths AnalysisException
        back = o.filter(F.lit(False))
    return (
        back.filter(F.col("o_orderkey").between(lo, hi))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            money_sum("o_totalprice").alias("total_price"),
        )
    )


@query(
    "s19_scd2_pit_join",
    oracle="""
WITH hist AS (
  -- v0: everyone, closed at the earliest update that touches the key
  SELECT c_custkey, c_acctbal,
         DATE '1995-01-01' AS valid_from,
         CASE WHEN c_custkey % 7 = 0 THEN DATE '1997-01-01'
              WHEN c_custkey % 3 = 0 THEN DATE '1999-01-01'
              ELSE DATE '9999-12-31' END AS valid_to
  FROM customer
  UNION ALL
  -- v1 (batch 1, eff 1997): +500, closed at batch 2 if also %3
  SELECT c_custkey, c_acctbal + 500,
         DATE '1997-01-01',
         CASE WHEN c_custkey % 3 = 0 THEN DATE '1999-01-01'
              ELSE DATE '9999-12-31' END
  FROM customer WHERE c_custkey % 7 = 0
  UNION ALL
  -- v2 (batch 2, eff 1999): current-at-1999 minus 200
  SELECT c_custkey,
         (CASE WHEN c_custkey % 7 = 0 THEN c_acctbal + 500 ELSE c_acctbal END) - 200,
         DATE '1999-01-01', DATE '9999-12-31'
  FROM customer WHERE c_custkey % 3 = 0
)
SELECT year(valid_from)::BIGINT AS era,
       count(*)::BIGINT AS n_orders,
       round(sum(CAST(round(o_totalprice, 4) AS DECIMAL(20,4))), 2)::DOUBLE AS total_price,
       round(sum(CAST(round(c_acctbal, 4) AS DECIMAL(20,4))), 2)::DOUBLE AS bal_sum
FROM orders o JOIN hist h
  ON o.o_custkey = h.c_custkey
 AND o.o_orderdate >= h.valid_from
 AND o.o_orderdate <  h.valid_to
GROUP BY 1 ORDER BY 1
""",
    survey="S19,S11,J9,F2",
    category="io",
)
def s19_scd2_pit_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S19: SCD Type-2 dimension history + point-in-time join — the
    warehouse pattern for "what did the dimension say WHEN the fact
    happened": every attribute change becomes a new version row with a
    [valid_from, valid_to) interval (``io.scd2_apply`` folds update
    batches: close the open row, append the new version, never rewrite
    history), and facts join the version VALID AT their own date, not
    today's.

    Two deterministic update batches (keys %7 at 1997, %3 at 1999 —
    overlapping on %21 keys, so v1 rows must close correctly too) fold
    into a history that is PERSISTED and read back (the dim survives
    as a table, like s11's lake); orders then temporal-join on
    (key, o_orderdate ∈ [valid_from, valid_to)) and aggregate per
    version era.  Scale: each scd2_apply batch costs one key semi/anti
    join against the (small) batch — AQE broadcasts it, the history
    never shuffles; the point-in-time join is an equi-join on the key
    with the interval predicate as a residual filter (versions per key
    are few), the standard SCD2 plan — never an interval cross join.
    The oracle reconstructs the same history arithmetically (CASE over
    the two batch predicates) and keeps the textbook BETWEEN form."""
    from projectmapreduce_spark.io import scd2_apply

    cust = scan(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    high = F.lit("9999-12-31").cast("date")
    hist0 = cust.withColumn("valid_from", F.lit("1995-01-01").cast("date")).withColumn(
        "valid_to", high
    )
    b1 = cust.filter(F.col("c_custkey") % 7 == 0).withColumn(
        "c_acctbal", F.col("c_acctbal") + 500
    )
    hist1 = scd2_apply(hist0, b1, "c_custkey", "1997-01-01")
    b2 = (
        hist1.filter(F.col("valid_to") == high)
        .filter(F.col("c_custkey") % 3 == 0)
        .select("c_custkey", (F.col("c_acctbal") - 200).alias("c_acctbal"))
    )
    hist2 = scd2_apply(hist1, b2, "c_custkey", "1999-01-01")

    dim_path = _p("s19_scd2_dim")
    hist2.write.mode("overwrite").parquet(dim_path)
    hist = spark.read.parquet(dim_path)

    o = scan(spark, sf_dir, "orders").select("o_custkey", "o_orderdate", "o_totalprice")
    joined = o.join(
        hist,
        (F.col("o_custkey") == F.col("c_custkey"))
        & (F.col("o_orderdate") >= F.col("valid_from"))
        & (F.col("o_orderdate") < F.col("valid_to")),
    )
    return (
        joined.groupBy(F.year("valid_from").cast("long").alias("era"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            money_sum("o_totalprice").alias("total_price"),
            money_sum("c_acctbal").alias("bal_sum"),
        )
        .orderBy("era")
    )


@query(
    "s20_python_datasource",
    oracle="""
SELECT count(*)::BIGINT AS n_rows,
       sum(s_suppkey)::BIGINT AS key_sum,
       min(s_name) AS min_name,
       max(s_name) AS max_name,
       sum(s_nationkey::BIGINT)::BIGINT AS nation_sum,
       round(sum(CAST(round(s_acctbal, 4) AS DECIMAL(20,4))), 2)::DOUBLE AS total_bal
FROM supplier
""",
    survey="S20,S4,X6",
    category="io",
)
def s20_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S20: connector extension surface — a custom FIXED-WIDTH text
    source written entirely in Python against Spark 4's DataSource API
    (``sources/fixed_width.py``), the mechanism for plugging formats
    Spark lacks natively into ``spark.read.format(...)`` without JVM
    code.  The source declares its schema, plans ONE InputPartition
    per file (a directory of N files scans N-wide, like the built-in
    file sources), and each partition streams its file line-by-line on
    a worker.

    Round-trip proof: supplier is encoded to fixed-width lines by an
    Arrow kernel (hex fields — int64 as two's-complement hex, float64
    as IEEE-754 bit hex so NaN/-0.0 survive, strings as padded UTF-8
    hex so embedded newlines can never break line framing, NULL as a
    'Z'-fill sentinel), written as a data-sized number of text files
    (supplier_fixture_files: ~8 MiB source parquet per file, floor 2
    so multi-file planning stays exercised), read back through the
    registered source, and aggregated — the result must hash-match
    DuckDB over the ORIGINAL table, which checks schema declaration,
    partition planning, and every field decoder.  The string width is
    sized from the data (one metadata-scale max(length) scalar)."""
    from projectmapreduce_spark.sources.fixed_width import (
        SUPPLIER_DDL,
        register,
        write_supplier_fixed_width,
    )

    path = _p("s20_fixedwidth")
    w = write_supplier_fixed_width(spark, sf_dir, path)
    register(spark)
    back = (
        spark.read.format("pmr_fixedwidth")
        .option("path", path)
        .option("spec", f"long,string:{w},long,double")
        .option("ddl", SUPPLIER_DDL)
        .load()
    )
    return back.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("s_suppkey").alias("key_sum"),
        F.min("s_name").alias("min_name"),
        F.max("s_name").alias("max_name"),
        F.sum("s_nationkey").alias("nation_sum"),
        money_sum("s_acctbal").alias("total_bal"),
    )


@query(
    "s23_datasource_writer",
    oracle="""
SELECT count(*)::BIGINT AS n_rows,
       sum(s_suppkey)::BIGINT AS key_sum,
       min(s_name) AS min_name,
       max(s_name) AS max_name,
       sum(s_nationkey::BIGINT)::BIGINT AS nation_sum,
       round(sum(CAST(round(s_acctbal, 4) AS DECIMAL(20,4))), 2)::DOUBLE AS total_bal
FROM supplier
""",
    survey="S23,S20",
    category="io",
)
def s23_datasource_writer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S23: the connector's WRITE quadrant — ``df.write.format(
    "pmr_fixedwidth")`` through Spark 4's Python ``DataSource.writer()``
    API (VERDICT r7 task 2), not the mapInArrow helper s20 uses.

    The writer (`sources/fixed_width.py:FixedWidthWriter`) is an
    ``DataSourceArrowWriter``: each task encodes its RecordBatches with
    the numpy matrix kernel (zero per-row Python) into a ``_staged-*``
    file the reader's listing filter cannot see; the driver-side
    ``commit`` renames staged files to visible part names only after
    EVERY task succeeded (overwrite mode deletes the previous
    generation inside that same commit), and ``abort`` deletes the
    staged files — a failed job never publishes partial data (pinned
    by tests/test_new_surfaces.py::test_writer_abort_leaves_nothing).

    Round-trip proof: supplier written through the writer API as a
    data-sized number of files (supplier_fixture_files, floor 2 so the
    multi-task staged-commit path stays exercised), read back through
    the registered source, aggregated — must
    hash-match DuckDB over the ORIGINAL table, which checks the write
    path end-to-end (spec parsing, Arrow encode, staging, commit
    rename) against the already-proven read path."""
    from projectmapreduce_spark.sources.fixed_width import (
        SUPPLIER_DDL,
        register,
        supplier_fixture_files,
        supplier_write_frame,
    )

    path = _p("s23_fixedwidth_writer")
    sup, w = supplier_write_frame(spark, sf_dir)
    spec = f"long,string:{w},long,double"
    register(spark)
    (
        sup.repartition(supplier_fixture_files(sf_dir))
        .write.format("pmr_fixedwidth")
        .option("path", path)
        .option("spec", spec)
        .mode("overwrite")
        .save()
    )
    back = (
        spark.read.format("pmr_fixedwidth")
        .option("path", path)
        .option("spec", spec)
        .option("ddl", SUPPLIER_DDL)
        .load()
    )
    return back.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("s_suppkey").alias("key_sum"),
        F.min("s_name").alias("min_name"),
        F.max("s_name").alias("max_name"),
        F.sum("s_nationkey").alias("nation_sum"),
        money_sum("s_acctbal").alias("total_bal"),
    )


@query(
    "s25_datasource_pushdown",
    oracle="""
SELECT s_nationkey::BIGINT AS s_nationkey,
       count(*)::BIGINT AS n_suppliers,
       round(sum(CAST(round(s_acctbal, 4) AS DECIMAL(20,4))), 2)::DOUBLE AS total_bal
FROM supplier
WHERE s_nationkey BETWEEN 5 AND 14
  AND s_acctbal > 1000
  AND s_name LIKE 'Supplier%'
GROUP BY 1
""",
    survey="S25,S20,P4",
    category="io",
)
def s25_datasource_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S25: FILTER PUSHDOWN through the Python DataSource API
    (Spark 4.1 ``DataSourceReader.pushFilters``) — the last connector
    hook the fixed-width source left unexercised.  The reader accepts
    conjunctive comparisons / IN / null tests / string prefix-suffix-
    contains on top-level fields and applies them as ONE vectorized
    Arrow mask inside ``read()``, so only matching rows cross the
    Python→JVM boundary; unsupported filters are yielded back and stay
    in Spark's plan.

    The correctness stakes are higher than a normal filter: when a
    source ACCEPTS a filter, Catalyst REMOVES it from the plan (pinned
    in tests/test_new_surfaces.py — no Filter node above the scan), so
    a source that keeps or drops one wrong row produces silently wrong
    results no engine check would catch.  That is exactly what this
    query's hash oracle decides: the pushed-scan aggregate must equal
    DuckDB's over the original table with the same WHERE.  Conf note:
    ``spark.sql.python.filterPushdown.enabled`` is a session default
    (session.py) — Spark 4.1 refuses to plan a pushFilters-implementing
    reader with it off, so per-query scoping would break every other
    read of the source."""
    from projectmapreduce_spark.sources.fixed_width import (
        SUPPLIER_DDL,
        ensure_supplier_fixed_width,
        register,
    )

    # Idempotent fixture (VERDICT r8 task 3): rerunning s25 reuses the
    # on-disk files, so bench iterations price the PUSHED SCAN — the
    # declared surface — not a repeated identical fixture write.
    path = _p("s25_pushdown_src")
    w = ensure_supplier_fixed_width(spark, sf_dir, path)
    register(spark)
    back = (
        spark.read.format("pmr_fixedwidth")
        .option("path", path)
        .option("spec", f"long,string:{w},long,double")
        .option("ddl", SUPPLIER_DDL)
        .load()
    )
    out = (
        back.filter(
            F.col("s_nationkey").between(5, 14)
            & (F.col("s_acctbal") > 1000)
            & F.col("s_name").startswith("Supplier")
        )
        .groupBy("s_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            money_sum("s_acctbal").alias("total_bal"),
        )
    )
    return out


@query(
    "s22_cbo_join_reorder",
    oracle="""
SELECT p_brand AS p_brand,
       count(*)::BIGINT AS n_items,
       round(sum(CAST(round(l_extendedprice, 4) AS DECIMAL(20,4))), 2)::DOUBLE AS revenue
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
WHERE s_nationkey < 5 AND s_acctbal > 1000
GROUP BY 1
""",
    survey="S22,J10",
    category="io",
)
def s22_cbo_join_reorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S22: cost-based-optimizer statistics driving JOIN REORDERING —
    the last §4 optimizer lane (VERDICT r6 next-round #5).

    Three catalog tables are persisted and ANALYZEd (table stats +
    column stats on the join/filter keys); the query is then written in
    a deliberately SUBOPTIMAL order — fact ⋈ big-dim (part, no
    filter, ~1:1) first, selective small-dim (supplier filtered to one
    nation + balance floor) last.  With CBO + stats, Catalyst's
    CostBasedJoinReorder flips the order to fact ⋈ supplier ⋈ part,
    shrinking the intermediate by the supplier filter's selectivity
    BEFORE the wide part join; without stats (or with CBO off) the
    written left-deep order survives.  At 100 TB that reorder is the
    difference between shuffling the full fact-part join and shuffling
    ~2 % of it.  Both sides of the proof are pinned in
    tests/test_plans.py::test_s22_cbo_join_reorder.

    Conf scoping: CBO is enabled only while this query's optimized
    plan is materialized (QueryExecution caches its optimizedPlan
    lazily-once, so forcing it here freezes the REORDERED logical plan
    into the returned DataFrame), then restored — the rest of the
    declared catalog keeps its plans independent of execution order,
    which tests/test_plan_catalog.py enforces."""
    for t, cols in (
        ("lineitem", ["l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice"]),
        ("part", ["p_partkey", "p_brand"]),
        ("supplier", ["s_suppkey", "s_nationkey", "s_acctbal"]),
    ):
        from projectmapreduce_spark.io import sink_managed

        sink_managed(scan(spark, sf_dir, t).select(*cols), f"pmr_s22_{t}")
    # Round-11 (guide §1.2 step 2): ANALYZE ... FOR COLUMNS computes
    # table-level stats (sizeInBytes, rowCount) in the SAME scan as
    # the column stats, so the separate plain COMPUTE STATISTICS per
    # table was a redundant third full pass over each table (write +
    # plain analyze + column analyze → write + column analyze).  The
    # CBO reorder needs rowCount + column stats — both still present;
    # the executed-plan assertion in tests/test_plans.py proves the
    # reorder still fires.
    spark.sql(
        "ANALYZE TABLE pmr_s22_lineitem COMPUTE STATISTICS FOR COLUMNS l_partkey, l_suppkey"
    )
    spark.sql("ANALYZE TABLE pmr_s22_part COMPUTE STATISTICS FOR COLUMNS p_partkey")
    spark.sql(
        "ANALYZE TABLE pmr_s22_supplier COMPUTE STATISTICS "
        "FOR COLUMNS s_suppkey, s_nationkey, s_acctbal"
    )

    li = spark.table("pmr_s22_lineitem")
    pt = spark.table("pmr_s22_part")
    sup = spark.table("pmr_s22_supplier").filter(
        (F.col("s_nationkey") < 5) & (F.col("s_acctbal") > 1000)
    )
    out = (
        li.join(pt, F.col("l_partkey") == F.col("p_partkey"))
        .join(sup, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            money_sum("l_extendedprice").alias("revenue"),
        )
    )
    prev_cbo = spark.conf.get("spark.sql.cbo.enabled")
    prev_reorder = spark.conf.get("spark.sql.cbo.joinReorder.enabled")
    spark.conf.set("spark.sql.cbo.enabled", "true")
    spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
    try:
        out._jdf.queryExecution().optimizedPlan()  # freeze the CBO plan
    finally:
        spark.conf.set("spark.sql.cbo.enabled", prev_cbo)
        spark.conf.set("spark.sql.cbo.joinReorder.enabled", prev_reorder)
    return out


@query(
    "s26_metadata_columns",
    oracle="""
SELECT lang,
       count(*)            AS n_rows,
       CAST(1 AS BIGINT)   AS n_files,
       count(*)            AS rows_by_index,
       count(*)            AS n_path_match,
       TRUE                AS files_sized
FROM documents
GROUP BY lang
""",
    survey="S26",
    category="io",
)
def s26_metadata_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S26: hidden file-metadata columns — every file-source scan
    exposes `_metadata` (file_path, file_name, file_size, row_index,
    file_modification_time) as a struct column populated BY THE SCAN
    at zero extra I/O (constant per file, attached during planning).
    This is the lineage/audit surface a 100 TB lake job leans on:
    which physical file produced a bad row, incremental processing by
    file identity, and per-file row accounting without a manifest.

    The query writes documents partitioned by lang (repartition(lang)
    first, so each hive directory holds exactly ONE file — a lang maps
    to one shuffle partition), reads it back, and audits the layout
    from `_metadata` alone: per lang the file count, the row count by
    max(row_index)+1 (contiguity within a single file), and agreement
    between the partition value EXTRACTED FROM THE PATH and the
    decoded partition column (NULL decodes from the hive default
    partition, hence the coalesce).  Every audit column must reproduce
    plain batch counts, which is what the oracle checks."""
    docs = scan(spark, sf_dir, "documents").select("doc_id", "lang")
    path = _p("s26_docs_bylang")
    (
        docs.repartition("lang")
        .write.mode("overwrite")
        .partitionBy("lang")
        .parquet(path)
    )
    back = spark.read.parquet(path).select(
        "lang",
        F.regexp_extract(F.col("_metadata.file_path"), r"lang=([^/]+)/", 1).alias(
            "path_lang"
        ),
        F.col("_metadata.file_name").alias("fn"),
        F.col("_metadata.file_size").alias("fs"),
        F.col("_metadata.row_index").alias("ri"),
    )
    return back.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("fn").alias("n_files"),
        (F.max("ri") + F.lit(1)).alias("rows_by_index"),
        F.count_if(
            F.col("path_lang")
            == F.coalesce(F.col("lang"), F.lit("__HIVE_DEFAULT_PARTITION__"))
        ).alias("n_path_match"),
        (F.min("fs") > F.lit(0)).alias("files_sized"),
    )


@query(
    "s27_parquet_bloom",
    oracle="""
SELECT l_orderkey,
       count(*) AS n_lines,
       CAST(round(sum(CAST(round(l_extendedprice, 4) AS DECIMAL(20,4))), 2) AS DOUBLE)
         AS revenue
FROM lineitem
WHERE l_orderkey IN (42, 1234, 4242)
GROUP BY l_orderkey
""",
    survey="S27",
    category="io",
)
def s27_parquet_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S27: parquet BLOOM FILTERS on write (`parquet.bloom.filter.
    enabled#col` + `expected.ndv#col`) — the row-group skipping index
    for HIGH-CARDINALITY point lookups, exactly where min/max zone
    maps fail: a key column whose values spread uniformly across the
    file makes every row group's [min,max] contain every probe, so
    stats-based pruning (s18's lever) skips nothing, while the
    per-row-group bloom answers "definitely not here" in O(1) probe
    bytes.  At 100 TB this is the difference between touching every
    row group of a fact table for an orderkey lookup and touching
    only the groups that can contain it — at the cost of ~1 byte/row
    of footer payload the writer sizes from expected NDV.

    The query writes lineitem with a bloom on l_orderkey, reads it
    back through a 3-key point predicate (pushed to the scan), and
    must reproduce the base-table aggregate.  Measured boundary
    (tests/test_new_surfaces.py::test_s27_bloom_footer_payload): the
    bloom-enabled file is strictly larger than the bloom-less twin of
    identical data — the payload is IN the footer; engagement at read
    time happens inside parquet-mr's row-group filter, which exposes
    no per-group counter to assert locally, so what this query pins
    is write-side validity + read-path correctness THROUGH the
    filter, not a skip count."""
    li = scan(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_extendedprice"
    )
    path = _p("s27_bloom")
    (
        li.write.option("parquet.bloom.filter.enabled#l_orderkey", "true")
        .option("parquet.bloom.filter.expected.ndv#l_orderkey", "20000")
        # parquet-mr suppresses the bloom while a chunk is fully
        # dictionary-encoded (the dictionary already filters exactly);
        # turning the dictionary off for the key column models the
        # dict-overflow regime a 100 TB high-cardinality key lives in
        # (measured in the unit test: with the dictionary on, the
        # "bloom" file is byte-identical to the plain one)
        .option("parquet.enable.dictionary#l_orderkey", "false")
        .mode("overwrite")
        .parquet(path)
    )
    back = spark.read.parquet(path).filter(
        F.col("l_orderkey").isin(42, 1234, 4242)
    )
    return back.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_lines"),
        dround(money_sum(F.col("l_extendedprice")), 2).alias("revenue"),
    )


@query(
    "s28_binary_file_scan",
    oracle="""
SELECT doc_id                AS media_id,
       8::INT                AS width,
       greatest(1, least(64, (octet_length(encode(coalesce(text, ''))) + 23) // 24))::INT
                             AS height,
       TRUE                  AS len_consistent
FROM documents
WHERE doc_id < 200
""",
    survey="S28,L11",
    category="io",
)
def s28_binary_file_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S28: the `binaryFile` source — Spark's whole-file ingest format
    (one row per file: path, modificationTime, length, content) and
    the front door of every image/audio/video corpus at 100 TB: media
    arrives as FILES, not rows, and this source turns a directory
    tree into the (id, payload) relation the multimodal tier (L11)
    consumes, with `pathGlobFilter`/`recursiveFileLookup` scoping the
    listing.  Known scale property carried on the row: content is one
    in-memory cell per file (fine for media objects, wrong for
    archives), and many small files make listing the bottleneck —
    which is why the compaction story (s14) exists.

    End-to-end here: real RFC-2083 PNGs (the l11f synthesis) are
    written as ONE FILE PER DOCUMENT by an executor-side partition
    task (no driver loop), read back through binaryFile, the id
    recovered from the file NAME, the geometry parsed from the
    DECODED IHDR by the real codec walker, and the source's `length`
    column cross-checked against octet_length(content).  The oracle
    re-derives geometry from the synthesis constants (l11f's
    contract); mtime is deliberately not surfaced (not portable)."""
    import os
    import shutil

    from projectmapreduce_spark.operators.multimodal import (
        extract_features,
        synthesize_media,
    )

    d = scan(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    media = synthesize_media(d, "doc_id", "text", kind="image", image_format="png")
    outdir = _p("s28_binfiles")
    shutil.rmtree(outdir, ignore_errors=True)
    os.makedirs(outdir, exist_ok=True)

    def _write(batches):
        for pdf in batches:
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                # executor-side write (shared FS on local[N]; an object
                # store or DFS path plays this role on a cluster)
                with open(os.path.join(outdir, f"m_{int(mid):06d}.png"), "wb") as f:
                    f.write(bytes(payload))
            yield pdf[["media_id"]]

    media.select("media_id", "payload").mapInPandas(_write, "media_id long").count()

    back = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.png")
        .load(outdir)
        .select(
            F.regexp_extract(F.col("path"), r"m_(\d+)\.png$", 1)
            .cast("long")
            .alias("media_id"),
            F.lit("image").alias("kind"),
            F.col("content").alias("payload"),
            (F.length("content") == F.col("length")).alias("len_consistent"),
        )
    )
    feats = extract_features(back.select("media_id", "kind", "payload"), fake=False)
    return feats.select("media_id", "width", "height").join(
        back.select("media_id", "len_consistent"), "media_id"
    )
