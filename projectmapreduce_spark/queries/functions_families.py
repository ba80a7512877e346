"""Scalar-function family queries (SURVEY.md §2.8, F1–F8).

One declared query per family proves the oracle contract; the engine
exposes the whole of ``pyspark.sql.functions`` — all JVM-side,
whole-stage-codegen'd expressions (no Python in any of these paths).

Cross-engine gotchas handled here (documented because they bite at any
scale): DuckDB ``CAST(double AS INT)`` rounds while Spark truncates
(use explicit trunc); libm functions (sqrt/log/exp/pow) can differ in
the last ulp (round to 6 decimals); Spark ``pmod`` has no DuckDB
twin (emulate with ``((a % b) + b) % b``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType, StructField, StructType

from projectmapreduce_spark.functions import dround
from projectmapreduce_spark.io import scan
from projectmapreduce_spark.queries.registry import query


@query(
    "f1_string_funcs",
    oracle="""
SELECT p_partkey,
       lower(p_name)                                   AS name_lower,
       upper(p_brand)                                  AS brand_upper,
       length(p_name)                                  AS name_len,
       substring(p_name, 1, 5)                         AS name_head,
       concat(p_brand, ':', p_type)                    AS brand_type,
       trim(concat(' ', p_type, ' '))                  AS type_trim,
       regexp_extract(p_type, '([A-Z]+)$', 1)          AS type_last_word,
       regexp_replace(p_name, '[aeiou]', '_', 'g')          AS name_devoweled,
       lpad(CAST(p_size AS VARCHAR), 4, '0')           AS size_padded,
       instr(p_type, 'BRASS')                          AS brass_pos,
       len(string_split(p_name, ' '))                  AS n_words
FROM part
""",
    survey="F1",
    category="functions",
)
def f1_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String family: case, length, substring, concat, trim, regex
    extract/replace, pad, find, split."""
    p = scan(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.lower("p_name").alias("name_lower"),
        F.upper("p_brand").alias("brand_upper"),
        F.length("p_name").alias("name_len"),
        F.substring("p_name", 1, 5).alias("name_head"),
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
        F.trim(F.concat(F.lit(" "), F.col("p_type"), F.lit(" "))).alias("type_trim"),
        F.regexp_extract("p_type", r"([A-Z]+)$", 1).alias("type_last_word"),
        F.regexp_replace("p_name", "[aeiou]", "_").alias("name_devoweled"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        F.instr("p_type", "BRASS").alias("brass_pos"),
        F.size(F.split("p_name", " ")).alias("n_words"),
    )


@query(
    "f2_datetime_funcs",
    oracle="""
SELECT o_orderkey,
       year(o_orderdate)                                  AS order_year,
       month(o_orderdate)                                 AS order_month,
       dayofmonth(o_orderdate)                            AS order_day,
       date_trunc('month', o_orderdate)::TIMESTAMP        AS month_start,
       datediff('day', TIMESTAMP '1995-01-01', o_orderdate) AS days_since_epoch_start,
       (CAST(o_orderdate AS DATE) + 30)::TIMESTAMP       AS due_date,
       CAST(epoch(o_orderdate) AS BIGINT)                 AS unix_secs,
       date_trunc('day', o_orderdate)::TIMESTAMP          AS order_date_only
FROM orders
""",
    survey="F2",
    category="functions",
)
def f2_datetime_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time family: extraction, truncation, arithmetic, epoch."""
    o = scan(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.dayofmonth("o_orderdate").alias("order_day"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("timestamp")).alias(
            "days_since_epoch_start"
        ),
        F.date_add(F.col("o_orderdate").cast("date"), 30).cast("timestamp").alias("due_date"),
        F.unix_timestamp("o_orderdate").alias("unix_secs"),
        F.date_trunc("day", "o_orderdate").alias("order_date_only"),
    )


@query(
    "f3_math_funcs",
    oracle="""
SELECT s_suppkey,
       abs(s_acctbal)                        AS abs_bal,
       ceil(s_acctbal)::BIGINT               AS ceil_bal,
       floor(s_acctbal)::BIGINT              AS floor_bal,
       round(sqrt(abs(s_acctbal)), 6)        AS sqrt_bal,
       round(pow(s_acctbal / 1000.0, 2), 6)  AS pow_bal,
       round(ln(abs(s_acctbal) + 1.0), 6)    AS log_bal,
       round(exp(s_acctbal / 10000.0), 6)    AS exp_bal,
       ((s_suppkey % 7) + 7) % 7             AS pmod7,
       sign(s_acctbal)::DOUBLE               AS bal_sign
FROM supplier
""",
    survey="F3",
    category="functions",
)
def f3_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math family (libm outputs rounded to 6 dp for ulp stability)."""
    s = scan(spark, sf_dir, "supplier")
    return s.select(
        "s_suppkey",
        F.abs("s_acctbal").alias("abs_bal"),
        F.ceil("s_acctbal").alias("ceil_bal"),
        F.floor("s_acctbal").alias("floor_bal"),
        dround(F.sqrt(F.abs(F.col("s_acctbal"))), 6).alias("sqrt_bal"),
        dround(F.pow(F.col("s_acctbal") / 1000.0, 2), 6).alias("pow_bal"),
        dround(F.log(F.abs(F.col("s_acctbal")) + 1.0), 6).alias("log_bal"),
        dround(F.exp(F.col("s_acctbal") / 10000.0), 6).alias("exp_bal"),
        F.pmod("s_suppkey", F.lit(7)).alias("pmod7"),
        F.signum("s_acctbal").cast("double").alias("bal_sign"),
    )


@query(
    "f4_conditional_funcs",
    oracle="""
SELECT c_custkey,
       CASE WHEN c_acctbal < 0 THEN 'debt'
            WHEN c_acctbal < 5000 THEN 'mid'
            ELSE 'rich' END                     AS bal_tier,
       coalesce(nullif(c_mktsegment, 'BUILDING'), 'OTHER') AS seg_masked,
       greatest(c_acctbal, 0.0)                 AS bal_floor0,
       least(c_nationkey, 10)                   AS nat_capped
FROM customer
""",
    survey="F4",
    category="functions",
)
def f4_conditional_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional family: CASE WHEN, coalesce, nullif, greatest, least."""
    c = scan(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.when(F.col("c_acctbal") < 0, "debt")
        .when(F.col("c_acctbal") < 5000, "mid")
        .otherwise("rich")
        .alias("bal_tier"),
        F.coalesce(F.nullif("c_mktsegment", F.lit("BUILDING")), F.lit("OTHER")).alias(
            "seg_masked"
        ),
        F.greatest("c_acctbal", F.lit(0.0)).alias("bal_floor0"),
        F.least("c_nationkey", F.lit(10)).alias("nat_capped"),
    )


@query(
    "f5_array_funcs",
    oracle="""
SELECT vec_id,
       len(embedding)                                                  AS dim,
       round(embedding[1]::DOUBLE, 6)                                  AS first_val,
       round(list_sum(list_transform(embedding, x -> x::DOUBLE)), 6)   AS vec_sum,
       len(list_filter(embedding, x -> x > 0))                         AS n_positive,
       round(list_sort(list_transform(embedding, x -> x::DOUBLE))[64], 6) AS max_val,
       len(list_filter(embedding, x -> x > 0.3)) > 0                   AS has_big
FROM embeddings
""",
    survey="F5",
    category="functions",
)
def f5_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array family incl. higher-order transform/filter/aggregate over
    the 64-dim embedding column — the JVM-side vector toolkit that
    keeps L3/L4 similarity math out of Python."""
    e = scan(spark, sf_dir, "embeddings")
    as_double = F.transform("embedding", lambda x: x.cast("double"))
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        dround(F.element_at("embedding", 1).cast("double"), 6).alias("first_val"),
        dround(
            F.aggregate(as_double, F.lit(0.0), lambda acc, x: acc + x), 6
        ).alias("vec_sum"),
        F.size(F.filter("embedding", lambda x: x > 0)).alias("n_positive"),
        dround(F.element_at(F.sort_array(as_double), 64), 6).alias("max_val"),
        (F.size(F.filter("embedding", lambda x: x > 0.3)) > 0).alias("has_big"),
    )


@query(
    "f5b_higher_order",
    oracle="""
SELECT vec_id,
       round(list_sum(list_transform(list_zip(embedding, list_reverse(embedding)),
                                     t -> t[1]::DOUBLE * t[2]::DOUBLE)), 6)  AS dot_rev,
       len(list_filter(embedding, x -> abs(x) > 0.25))                       AS n_large,
       list_bool_or(list_transform(embedding, x -> x > 0.45))                AS has_hot,
       list_bool_and(list_transform(embedding, x -> abs(x) < 10))            AS all_bounded,
       round(list_reduce(list_transform(embedding, x -> abs(x)::DOUBLE),
                         (a, b) -> greatest(a, b)), 6)                       AS max_abs
FROM embeddings
""",
    survey="F5",
    category="functions",
)
def f5b_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions as a named family row: zip_with
    (pairwise combine), aggregate (fold), filter, exists, forall — the
    JVM-side toolkit that keeps vector/array logic out of Python UDFs
    (operators/similarity.py builds its dot products from exactly
    these).  All in double before arithmetic: zip_with on the raw
    float32 column would multiply in float32 and diverge from the
    all-double oracle in the last ulp."""
    e = scan(spark, sf_dir, "embeddings")
    emb_d = F.transform("embedding", lambda x: x.cast("double"))
    return e.select(
        "vec_id",
        dround(
            F.aggregate(
                F.zip_with(emb_d, F.reverse(emb_d), lambda x, y: x * y),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
            6,
        ).alias("dot_rev"),
        F.size(F.filter("embedding", lambda x: F.abs(x) > 0.25)).alias("n_large"),
        F.exists("embedding", lambda x: x > 0.45).alias("has_hot"),
        F.forall("embedding", lambda x: F.abs(x) < 10).alias("all_bounded"),
        dround(F.array_max(F.transform(emb_d, lambda x: F.abs(x))), 6).alias("max_abs"),
    )


@query(
    "f6_map_funcs",
    oracle="""
SELECT event_id,
       CASE event_type WHEN 'click' THEN 1 WHEN 'view' THEN 1
                       WHEN 'signup' THEN 5 WHEN 'purchase' THEN 10
                       WHEN 'error' THEN 0 END AS type_weight,
       5 AS n_weights
FROM events
""",
    survey="F6",
    category="functions",
)
def f6_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map family: literal map construction, lookup, keys — the lookup
    is a broadcast-free dimension join for tiny static mappings."""
    weights = F.create_map(
        F.lit("click"), F.lit(1),
        F.lit("view"), F.lit(1),
        F.lit("signup"), F.lit(5),
        F.lit("purchase"), F.lit(10),
        F.lit("error"), F.lit(0),
    )
    return scan(spark, sf_dir, "events").select(
        "event_id",
        F.element_at(weights, F.col("event_type")).alias("type_weight"),
        F.size(F.map_keys(weights)).alias("n_weights"),
    )


@query(
    "f7_json_funcs",
    oracle="""
SELECT event_id,
       json_extract(props, '$.k')::INT        AS k_value,
       concat('{"k":', json_extract(props, '$.k'), '}') AS rebuilt_json
FROM events
WHERE json_extract(props, '$.k')::INT >= 50
""",
    survey="F7",
    category="functions",
)
def f7_json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON family: path extraction, schema-full parse, re-serialize
    (`events.props` is the JSON-string column, FIXTURES.md)."""
    ev = scan(spark, sf_dir, "events")
    parsed = F.from_json("props", StructType([StructField("k", IntegerType())]))
    return (
        ev.select(
            "event_id",
            F.get_json_object("props", "$.k").cast("int").alias("k_value"),
            F.to_json(parsed).alias("rebuilt_json"),
        )
        .filter(F.col("k_value") >= 50)
    )


@query(
    "f8_cast_funcs",
    oracle="""
SELECT o_orderkey,
       trunc(o_totalprice)::BIGINT             AS price_int,
       CAST(o_orderkey AS VARCHAR)             AS key_str,
       CAST(CAST(o_orderkey AS VARCHAR) AS BIGINT) AS key_roundtrip,
       o_custkey::DOUBLE                       AS cust_dbl,
       printf('%012d', o_orderkey)             AS key_padded
FROM orders
""",
    survey="F8",
    category="functions",
)
def f8_cast_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cast/conversion family.  Note: Spark double→int truncates while
    DuckDB rounds — the oracle uses explicit trunc to pin semantics."""
    o = scan(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.col("o_totalprice").cast("bigint").alias("price_int"),
        F.col("o_orderkey").cast("string").alias("key_str"),
        F.col("o_orderkey").cast("string").cast("bigint").alias("key_roundtrip"),
        F.col("o_custkey").cast("double").alias("cust_dbl"),
        F.format_string("%012d", F.col("o_orderkey")).alias("key_padded"),
    )


@query(
    "f9_variant_funcs",
    oracle="""
WITH j AS (
  SELECT o_orderkey,
         -- render a NULL cust as JSON null: engines disagree on
         -- concat-with-NULL (Spark nulls the whole string, DuckDB
         -- skips the arg and emits MALFORMED json) — caught by the
         -- hostile-domain sweep
         concat('{"order":{"key":', o_orderkey, ',"cust":',
                coalesce(o_custkey::VARCHAR, 'null'),
                '},"tags":["', o_orderpriority, '","', o_orderstatus, '"]}') AS js
  FROM orders WHERE o_orderkey < 3000
)
SELECT o_orderkey,
       json_extract(js, '$.order.key')::BIGINT  AS v_key,
       TRY_CAST(json_extract(js, '$.order.cust') AS BIGINT) AS v_cust,
       json_extract_string(js, '$.tags[0]')     AS v_tag0,
       json_extract(js, '$.order.missing')::BIGINT AS v_missing
FROM j
""",
    survey="F9,F7",
    category="functions",
)
def f9_variant_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F9: the VariantType semi-structured path (Spark 4) — the
    open-schema JSON answer that replaces schema-full ``from_json``
    when documents are ragged: ``parse_json`` once into a binary
    variant, then typed ``try_variant_get`` path extraction, including
    safe null on missing paths.  Variant keeps the parse tree in a
    compact binary form, so repeated path reads don't re-parse the
    JSON text (the F7 ``get_json_object`` pattern re-parses per
    call) — at 100 TB of telemetry this is the difference between one
    parse and one parse per extracted field.  The JSON is built from
    typed columns in-query so the oracle can rebuild byte-identical
    text (ints and strings only — float rendering differs across
    engines)."""
    o = scan(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 3000)
    js = F.concat(
        F.lit('{"order":{"key":'), F.col("o_orderkey").cast("string"),
        # NULL cust renders as JSON null (see the oracle note: bare
        # concat-with-NULL diverges between engines)
        F.lit(',"cust":'), F.coalesce(F.col("o_custkey").cast("string"), F.lit("null")),
        F.lit('},"tags":["'), F.col("o_orderpriority"),
        F.lit('","'), F.col("o_orderstatus"), F.lit('"]}'),
    )
    v = F.parse_json(js)
    return o.select(
        "o_orderkey",
        F.try_variant_get(v, "$.order.key", "long").alias("v_key"),
        F.try_variant_get(v, "$.order.cust", "long").alias("v_cust"),
        F.try_variant_get(v, "$.tags[0]", "string").alias("v_tag0"),
        F.try_variant_get(v, "$.order.missing", "long").alias("v_missing"),
    )


@query(
    "f10_bitwise_funcs",
    oracle="""
SELECT o_orderkey,
       (o_orderkey & 255)::BIGINT                   AS low_byte,
       (o_orderkey | 4096)::BIGINT                  AS with_flag,
       xor(o_orderkey, o_custkey)::BIGINT           AS key_xor,
       (~o_orderkey)::BIGINT                        AS complement,
       (o_orderkey << 3)::BIGINT                    AS shifted,
       bit_count(o_orderkey)::INTEGER               AS popcount
FROM orders WHERE o_orderkey < 2000
""",
    survey="F10,F3",
    category="functions",
)
def f10_bitwise_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F10: bitwise family — mask extraction, flag set, xor mixing,
    complement, shift, popcount: the bit-level toolkit hash
    partitioners, bloom/bitmap indexes (J12, A12) and feature hashing
    (L21) are built from, exposed as first-class scalar functions.
    All integer-exact, so the oracle matches without rounding."""
    o = scan(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 2000)
    return o.select(
        "o_orderkey",
        F.col("o_orderkey").bitwiseAND(F.lit(255)).alias("low_byte"),
        F.col("o_orderkey").bitwiseOR(F.lit(4096)).alias("with_flag"),
        F.col("o_orderkey").bitwiseXOR(F.col("o_custkey")).alias("key_xor"),
        F.bitwise_not(F.col("o_orderkey")).alias("complement"),
        F.shiftleft(F.col("o_orderkey"), 3).alias("shifted"),
        F.bit_count(F.col("o_orderkey")).alias("popcount"),
    )


@query(
    "f11_url_funcs",
    oracle="""
SELECT doc_id,
       source || '.example.com'          AS host,
       '/docs/' || doc_id                AS path,
       lang                              AS q_lang,
       CAST(doc_id % 7 AS VARCHAR)       AS q_v,
       source                            AS subdomain
FROM documents
""",
    survey="F11",
    category="functions",
)
def f11_url_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F11: URL parsing family — ``parse_url`` HOST / PATH / QUERY-key
    extraction plus subdomain split, the canonicalization primitives a
    web-corpus pipeline (URL dedup, domain mixing, blocklists) builds
    on.

    Each document synthesizes its canonical URL from its own columns
    (deterministic — both engines build the identical string), Spark
    then PARSES it back with the JVM-side ``parse_url`` kernels while
    the oracle recomputes the components directly — so the check
    proves parse_url inverts the construction exactly.  Zero shuffle:
    pure per-row projection inside whole-stage codegen, the shape URL
    ops must have when they run over 100 TB of crawl text."""
    d = scan(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.com/docs/"),
        F.col("doc_id").cast("string"),
        F.lit("?lang="),
        F.col("lang"),
        F.lit("&v="),
        (F.col("doc_id") % 7).cast("string"),
    )
    return d.select(
        "doc_id",
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY"), F.lit("lang")).alias("q_lang"),
        F.parse_url(url, F.lit("QUERY"), F.lit("v")).alias("q_v"),
        F.split(F.parse_url(url, F.lit("HOST")), r"\.").getItem(0).alias("subdomain"),
    )


@query(
    "f12_digest_funcs",
    oracle="""
SELECT o_orderkey,
       md5(o_orderpriority)                     AS prio_md5,
       sha256(o_orderstatus)                    AS status_sha256,
       to_base64(o_orderpriority::BLOB)         AS prio_b64,
       hex(o_orderstatus)                       AS status_hex,
       md5(o_orderkey::VARCHAR)                 AS key_md5
FROM orders WHERE o_orderkey < 2000
""",
    survey="F12,F1",
    category="functions",
)
def f12_digest_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F12: digest/encoding function family — md5, sha2-256, base64,
    hex over UTF-8 bytes.  These are the fingerprint primitives the
    dedup tier builds on (l1 keys on sha256; l22 on xxhash-style
    rolling hashes): proving the scalar surface hash-matches DuckDB
    guarantees the dedup keys themselves are cross-engine portable.
    All JVM codegen expressions — zero-shuffle projection; the only
    subtlety is byte-level agreement (UTF-8 encode before digest,
    lowercase hex for digests, uppercase for hex(), no padding
    differences in base64), which the oracle pins exactly."""
    o = scan(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 2000)
    return o.select(
        "o_orderkey",
        F.md5("o_orderpriority").alias("prio_md5"),
        F.sha2("o_orderstatus", 256).alias("status_sha256"),
        F.base64(F.col("o_orderpriority").cast("binary")).alias("prio_b64"),
        F.hex("o_orderstatus").alias("status_hex"),
        F.md5(F.col("o_orderkey").cast("string")).alias("key_md5"),
    )


@query(
    "f13_collation_funcs",
    oracle="""
SELECT count(CASE WHEN lower(event_type) = lower('CLICK') THEN 1 END)::BIGINT AS n_click_ci,
       count(CASE WHEN event_type = 'CLICK' THEN 1 END)::BIGINT AS n_click_cs,
       count(CASE WHEN lower(event_type) >= 'signup' THEN 1 END)::BIGINT AS n_ge_ci,
       min(lower(event_type)) AS first_type_ci
FROM events
""",
    survey="F13,P2",
    category="functions",
)
def f13_collation_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F13: string collations (Spark 4) — case-insensitive comparison
    semantics declared on the EXPRESSION (``collate(col,
    'UTF8_LCASE')``) instead of smeared through ``lower()`` calls:
    equality, range predicates and (not shown: joins, GROUP BY) all
    follow the collation.  The fixture types are lowercase, so the
    case-insensitive literal 'CLICK' matches them all while the binary
    comparison matches none — the two counts differing IS the
    semantics under test.

    Determinism contract: collated comparisons only ever feed
    PREDICATES here; no collated VALUE reaches the output (a GROUP BY
    under UTF8_LCASE surfaces an arbitrary-case representative — the
    nondeterminism trap this query deliberately avoids; outputs
    normalize via lower()).  Oracle re-expresses the collation as
    lower()-compares, pinning that UTF8_LCASE equality == lowercase
    equality for this data.  Collations evaluate inside codegen —
    zero plan-shape cost vs the binary collation."""
    ev = scan(spark, sf_dir, "events")
    ci = F.collate(F.col("event_type"), "UTF8_LCASE")
    return ev.agg(
        F.count(F.when(ci == F.lit("CLICK"), 1)).alias("n_click_ci"),
        F.count(F.when(F.col("event_type") == "CLICK", 1)).alias("n_click_cs"),
        F.count(F.when(ci >= F.lit("signup"), 1)).alias("n_ge_ci"),
        F.min(F.lower("event_type")).alias("first_type_ci"),
    )


@query(
    "f14_timestamp_ntz",
    oracle="""
SELECT event_id,
       ts::TIMESTAMP AS ntz,
       date_trunc('day', ts::TIMESTAMP)::TIMESTAMP AS ntz_day,
       hour(ts::TIMESTAMP)::BIGINT AS ntz_hour,
       (ts::TIMESTAMP + INTERVAL 90 MINUTE) AS ntz_plus,
       make_timestamp(2024, 3, 7, 12, 30, 0) AS made_ntz
FROM events WHERE event_id < 1000
""",
    survey="F14,F2",
    category="functions",
)
def f14_timestamp_ntz(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F14: TIMESTAMP_NTZ family — the zone-LESS timestamp type (wall
    time as stored, never shifted by the session timezone), Spark's
    answer to "my pipeline broke when someone ran it from a different
    TZ".  The driver deliberately opens the session in a hostile
    non-UTC zone; ensure_session_conf repairs it to UTC.  Note the
    CAST(timestamp AS timestamp_ntz) itself IS session-timezone
    dependent — the wall values here round-trip because scan()
    produced ``ts`` via the inverse NTZ→timestamp cast under the SAME
    session zone (and the fixture range has no DST gaps); once a value
    is NTZ, downstream arithmetic is zone-immune.  DuckDB's
    plain TIMESTAMP is itself zone-less, so the oracle is the natural
    direct re-expression (the tz-aware family F2 needs epoch_us
    gymnastics instead).  Cast, truncation, field extraction, interval
    arithmetic, and literal construction (make_timestamp_ntz) all stay
    in codegen; zero shuffle."""
    ev = scan(spark, sf_dir, "events").filter(F.col("event_id") < 1000)
    ntz = F.col("ts").cast("timestamp_ntz")
    return ev.select(
        "event_id",
        ntz.alias("ntz"),
        F.date_trunc("day", ntz).alias("ntz_day"),
        F.hour(ntz).cast("long").alias("ntz_hour"),
        (ntz + F.expr("INTERVAL 90 MINUTES")).alias("ntz_plus"),
        F.expr("make_timestamp_ntz(2024, 3, 7, 12, 30, 0)").alias("made_ntz"),
    )


@query(
    "f15_fuzzy_match",
    oracle="""
WITH s AS (
  SELECT s_suppkey, s_nationkey, s_name FROM supplier
  WHERE s_name IS NOT NULL AND regexp_matches(s_name, '^[ -~]*$')
)
SELECT a.s_suppkey AS key_a,
       b.s_suppkey AS key_b,
       levenshtein(a.s_name, b.s_name)::INT AS dist
FROM s a JOIN s b
  ON a.s_nationkey = b.s_nationkey AND a.s_suppkey < b.s_suppkey
WHERE levenshtein(a.s_name, b.s_name) <= 2
ORDER BY key_a, key_b
""",
    survey="F15",
    category="functions",
)
def f15_fuzzy_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F15: fuzzy string matching — BLOCKED edit-distance pair finding
    (the entity-resolution primitive): supplier names within
    levenshtein distance 2, candidate pairs bounded by a nationkey
    BLOCK plus the a<b half-join, never all-pairs.  Spark's THREE-ARG
    levenshtein(l, r, threshold) is used deliberately: it abandons a
    pair as soon as the running distance exceeds the bound (banded DP,
    O(threshold x len) not O(len^2)) and returns -1 — at 100 TB the
    blocked join's cost is the candidate count times this bounded
    kernel, not full DP matrices.

    Cross-engine note (measured, the reason for the ASCII guard):
    Spark's levenshtein counts CHARACTERS while DuckDB's counts BYTES,
    so non-ASCII names diverge (3 vs 7 on the same pair) — the oracle
    domain is restricted to printable-ASCII names on both sides, which
    the fixtures' synthetic names satisfy; the operator itself is
    character-correct on unicode in Spark."""
    s = (
        scan(spark, sf_dir, "supplier")
        .filter(F.col("s_name").isNotNull() & F.col("s_name").rlike("^[ -~]*$"))
        .select("s_suppkey", "s_nationkey", "s_name")
    )
    a = s.alias("a")
    b = s.alias("b")
    dist = F.expr("levenshtein(a.s_name, b.s_name, 2)")
    return (
        a.join(
            b,
            (F.col("a.s_nationkey") == F.col("b.s_nationkey"))
            & (F.col("a.s_suppkey") < F.col("b.s_suppkey")),
        )
        .filter(dist >= 0)
        .select(
            F.col("a.s_suppkey").alias("key_a"),
            F.col("b.s_suppkey").alias("key_b"),
            dist.cast("int").alias("dist"),
        )
        .orderBy("key_a", "key_b")
    )


# Shared payload construction — the SAME expression text runs in Spark
# (then parse_json → variant) and in the DuckDB oracle (then JSON path
# extraction), so what the hash compares is the EXTRACTION semantics.
# coalesce() everywhere NULLs could reach concat: Spark concat is
# NULL-propagating while DuckDB concat skips NULL args (the f9 lesson),
# so a bare NULL column would silently produce MALFORMED json in one
# engine only.  Amounts render via DECIMAL(18,2) → string, which both
# engines print with exactly two fraction digits.
_F9B_PAYLOAD = """
CASE WHEN event_type IN ('click', 'view') THEN
  concat('{"kind":"interaction","k":', CAST(coalesce(event_id, -1) % 100 AS STRING),
         ',"meta":{"ut":', CAST(coalesce(user_id, -1) % 5 AS STRING),
         ',"tags":["', coalesce(event_type, 'none'),
         '","t', CAST(coalesce(event_id, -1) % 3 AS STRING), '"]}}')
ELSE
  concat('{"kind":"txn","k":', CAST(coalesce(user_id, -1) % 100 AS STRING),
         ',"amount":', CASE WHEN value IS NULL THEN 'null'
                            ELSE CAST(CAST(round(value, 2) AS DECIMAL(18,2)) AS STRING) END,
         CASE WHEN coalesce(user_id, -1) % 11 = 0 THEN ',"note":null' ELSE '' END,
         '}')
END
"""


@query(
    "f9b_variant_shred",
    oracle=f"""
WITH j AS (SELECT {_F9B_PAYLOAD} AS payload FROM events)
SELECT json_extract_string(payload, '$.kind')            AS kind,
       CAST(payload->>'$.k' AS BIGINT) % 5               AS k_bucket,
       count(*)                                          AS n,
       CAST(sum(CAST(payload->>'$.meta.ut' AS BIGINT)) AS BIGINT) AS ut_sum,
       CAST(round(sum(CAST(payload->>'$.amount' AS DECIMAL(18,2))), 2) AS DOUBLE)
                                                         AS amount_sum,
       count(*) FILTER (WHERE json_type(payload, '$.note') = 'NULL')
                                                         AS n_note_null,
       count(DISTINCT json_extract_string(payload, '$.meta.tags[1]'))
                                                         AS n_tags
FROM j
GROUP BY 1, 2
""",
    survey="F9",
    category="functions",
)
def f9b_variant_shred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F9 extension: HETEROGENEOUS variant shredding THROUGH PARQUET —
    the three variant behaviors f9 doesn't touch, on payloads whose
    shape differs per row (interaction events carry nested meta/tags,
    transactions carry a decimal amount; that schema drift is the
    reason the VARIANT type exists):

    - persistence: the variant column is WRITTEN TO PARQUET and read
      back before extraction (Spark 4 stores variant as the Parquet
      variant logical type — binary value + metadata, NOT re-serialized
      JSON text), so the hash certifies the storage round-trip;
    - JSON-null vs MISSING discrimination: ``is_variant_null(
      try_variant_get(...))`` is true only where the key exists AS
      json null (`"note":null`), false where it is absent — mirrored
      by DuckDB's ``json_type(...) = 'NULL'`` (whose missing-path
      result is SQL NULL);
    - typed DECIMAL extraction: amounts come out as DECIMAL(18,2) and
      sum exactly, so even the money column hash-matches.

    At 100 TB this is one binary parse per row at INGEST, then typed
    path reads (no re-parse per field, unlike get_json_object) and
    ordinary columnar aggregation; the parquet variant encoding keeps
    payloads compressed and splittable like any other column."""
    from projectmapreduce_spark.io import scratch_path

    ev = scan(spark, sf_dir, "events")
    parsed = ev.select(F.parse_json(F.expr(_F9B_PAYLOAD)).alias("v"))
    path = scratch_path("f9b_variant_store")
    parsed.write.mode("overwrite").parquet(path)
    back = spark.read.parquet(path)
    return (
        back.select(
            F.expr("variant_get(v, '$.kind', 'string')").alias("kind"),
            (F.expr("variant_get(v, '$.k', 'bigint')") % 5).alias("k_bucket"),
            F.expr("try_variant_get(v, '$.meta.ut', 'bigint')").alias("ut"),
            F.expr("try_variant_get(v, '$.amount', 'decimal(18,2)')").alias("amount"),
            F.expr("is_variant_null(try_variant_get(v, '$.note'))").alias("jnull"),
            F.expr("try_variant_get(v, '$.meta.tags[1]', 'string')").alias("tag1"),
        )
        .groupBy("kind", "k_bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("ut").alias("ut_sum"),
            dround(F.sum("amount"), 2).cast("double").alias("amount_sum"),
            F.count_if(F.col("jnull")).alias("n_note_null"),
            F.countDistinct("tag1").alias("n_tags"),
        )
    )


@query(
    "f16_try_funcs",
    oracle="""
SELECT o_orderkey,
       CASE WHEN o_orderkey % 10 = 0 THEN NULL
            ELSE round(o_totalprice / (o_orderkey % 10), 6) END AS safe_div,
       CASE WHEN o_orderkey <= 7
            THEN 9223372036854775800 + o_orderkey END           AS safe_add,
       CASE WHEN o_orderkey % 5 = 0 THEN NULL
            ELSE o_orderkey % (o_orderkey % 5) END              AS safe_mod,
       TRY_CAST(o_orderpriority AS INTEGER)                     AS parse_fail,
       TRY_CAST(substring(o_orderpriority, 1, 1) AS INTEGER)    AS parse_ok,
       string_split(o_orderpriority, '-')[(o_orderkey % 3 + 1)::INT]
                                                                AS safe_elem
FROM orders
""",
    survey="F16",
    category="functions",
)
def f16_try_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F16: the ANSI error-safe function family (``try_divide`` /
    ``try_add`` / ``try_mod`` / ``try_cast`` / ``try_element_at``) —
    Spark 4 runs with ``spark.sql.ansi.enabled=true`` by DEFAULT, so
    division by zero, integer overflow, malformed casts and
    out-of-range element access RAISE instead of silently wrapping;
    the ``try_`` variants are the sanctioned per-expression escape
    hatch that turns each of those into NULL.  At 100 TB this is the
    difference between one dirty row killing a six-hour job at stage
    40 and a NULL that flows into the quality gates — every
    production pipeline on ANSI Spark uses these around untrusted
    arithmetic, which is why they are a first-class §2.8 row.

    Each column exercises one failure class against data-dependent
    operands (so both branches occur): /0 when key%10==0, int64
    overflow past key 7 (9223372036854775800 + key), %0 when
    key%5==0, an unparseable full string vs its parseable prefix, and
    a 1-based array index that walks past the end every third row.
    The oracle re-derives every NULL with explicit CASE guards (and
    DuckDB's own TRY_CAST / out-of-range list indexing), so the
    hash pins the exact NULL set, not just "no error".  Pure per-row
    projection inside whole-stage codegen — zero shuffle, the
    f10/f11 plan class.

    Boundary pinned by the round-10 fuzzer
    (tests/test_differential_fuzz.py): try_element_at only catches
    OUT-OF-BOUNDS — index 0 (INVALID_INDEX_OF_ZERO) still raises
    under try_, so the index expression here (`key % 3 + 1`, range
    1–3) and any future caller must keep 0 structurally impossible."""
    o = scan(spark, sf_dir, "orders")
    pri_parts = F.split(F.col("o_orderpriority"), "-")
    return o.select(
        "o_orderkey",
        # dround, not F.round (ADVICE r9): repo discipline is dround
        # for every float column in a declared query — the current
        # divisors (1–9 over 2-decimal prices) make half-boundary ties
        # practically impossible, but the pattern must not invite a
        # fragile edit.  The oracle keeps plain round(…, 6): both
        # agree everywhere off the tie boundary, and dround matches
        # DuckDB's scaled-std::round AT it.
        dround(
            F.try_divide(F.col("o_totalprice"), F.col("o_orderkey") % 10), 6
        ).alias("safe_div"),
        F.try_add(F.lit(9223372036854775800), F.col("o_orderkey")).alias("safe_add"),
        F.expr("try_mod(o_orderkey, o_orderkey % 5)").alias("safe_mod"),
        F.expr("try_cast(o_orderpriority AS int)").alias("parse_fail"),
        F.expr("try_cast(substring(o_orderpriority, 1, 1) AS int)").alias("parse_ok"),
        F.try_element_at(
            pri_parts, (F.col("o_orderkey") % 3 + 1).cast("int")
        ).alias("safe_elem"),
    )


@query(
    "f17_xml_funcs",
    oracle="""
SELECT o_orderkey,
       o_orderkey                              AS oid_attr,
       o_orderpriority                         AS prio,
       coalesce(o_custkey, -1)                 AS cust,
       2::BIGINT                               AS n_lines,
       CAST(o_orderkey % 5 AS VARCHAR)         AS second_n,
       coalesce(o_custkey, -1)                 AS fx_cust
FROM orders WHERE o_orderkey < 3000
""",
    survey="F17",
    category="functions",
)
def f17_xml_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F17: XML function family (Spark 4 `from_xml` + the `xpath_*`
    extractors) — the OTHER semi-structured ingest format: B2B feeds,
    SOAP-era exports, and config dumps still arrive as XML at lake
    scale, and Spark parses them JVM-side inside codegen (no Python,
    no shuffle — a pure projection like F7/F9).  Exercised: attribute
    extraction (`/order/@id`), scalar tag paths (`xpath_string`,
    `xpath_int`), REPEATED-element paths (`xpath(...)` returning the
    array of matches — the shape JSON paths express with [i]), and
    schema-full `from_xml` into a typed struct.

    DuckDB has no XML functions, so the oracle uses the f11 contract:
    the XML is BUILT from typed columns in-query, and the oracle
    re-derives every extracted value from the same base columns —
    proving the parse exactly inverts the construction (NULL FK
    rendered as a sentinel value; the fixtures' priority strings are
    markup-safe ASCII)."""
    o = scan(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 3000)
    xml = F.concat(
        F.lit('<order id="'), F.col("o_orderkey").cast("string"),
        F.lit('"><prio>'), F.col("o_orderpriority"),
        F.lit("</prio><cust>"),
        F.coalesce(F.col("o_custkey").cast("string"), F.lit("-1")),
        F.lit("</cust><lines><n>"), (F.col("o_orderkey") % 3).cast("string"),
        F.lit("</n><n>"), (F.col("o_orderkey") % 5).cast("string"),
        F.lit("</n></lines></order>"),
    )
    d = o.select("o_orderkey", xml.alias("x"))
    fx = F.expr("from_xml(x, 'prio STRING, cust BIGINT')")
    return d.select(
        "o_orderkey",
        F.expr("xpath_long(x, '/order/@id')").alias("oid_attr"),
        F.expr("xpath_string(x, '/order/prio')").alias("prio"),
        F.expr("xpath_long(x, '/order/cust')").alias("cust"),
        F.expr("cast(size(xpath(x, '/order/lines/n/text()')) as bigint)").alias(
            "n_lines"
        ),
        F.expr("xpath(x, '/order/lines/n/text()')[1]").alias("second_n"),
        fx.getField("cust").alias("fx_cust"),
    )
