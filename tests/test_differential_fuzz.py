"""Cross-engine differential fuzzing (SURVEY.md §5.3 extension): the
fixed-fixture oracle sweep can only disagree where the fixtures have
data; these tests run the SAME relational computation on Spark and
DuckDB over hypothesis-generated inputs — null keys, empty frames,
duplicate keys, negative values — and require canon-identical results.

Comparison reuses the driver-strict canonicalizer from oracle_utils
(type-sensitive: int64 != float64), so a dtype drift on generated edge
cases fails exactly like the driver hash would.
"""

from __future__ import annotations

import duckdb
import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from tests.oracle_utils import _canon_frame

_SETTINGS = dict(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

kv_rows = st.lists(
    st.tuples(st.one_of(st.none(), st.integers(0, 4)), st.integers(-1000, 1000)),
    min_size=0,
    max_size=25,
)


def _duck(rows: list[tuple], cols: str, sql: str):
    con = duckdb.connect()
    con.execute(f"CREATE TABLE t ({cols})")
    if rows:
        ph = ", ".join(["?"] * len(rows[0]))
        con.executemany(f"INSERT INTO t VALUES ({ph})", rows)
    return con.execute(sql).fetchdf()


def _spark_df(spark, rows, schema):
    if rows:
        return spark.createDataFrame(rows, schema)
    return spark.createDataFrame([], schema)


@given(rows=kv_rows)
@settings(**_SETTINGS)
def test_fuzz_groupby_agg_matches_duckdb(spark, rows):
    """Keyed aggregate with NULL keys as their own group, sum widened
    to bigint on both engines."""
    sdf = (
        _spark_df(spark, rows, "k int, v int")
        .groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("v").alias("sv"),
            F.min("v").alias("mn"),
            F.max("v").alias("mx"),
        )
    )
    got = _canon_frame(sdf.toPandas())
    want = _canon_frame(
        _duck(
            rows,
            "k INTEGER, v INTEGER",
            "SELECT k, count(*) AS n, sum(v)::BIGINT AS sv, min(v) AS mn, max(v) AS mx "
            "FROM t GROUP BY k",
        )
    )
    assert got == want


@given(left=kv_rows, right=kv_rows)
@settings(**_SETTINGS)
def test_fuzz_join_agg_matches_duckdb(spark, left, right):
    """Inner equi-join drops NULL keys identically on both engines;
    post-join aggregate must match cell-for-cell."""
    l = _spark_df(spark, left, "k int, v int")
    r = _spark_df(spark, right, "k int, w int")
    sdf = (
        l.join(r, "k")
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"), F.sum(F.col("v") + F.col("w")).alias("s"))
    )
    got = _canon_frame(sdf.toPandas())
    con = duckdb.connect()
    con.execute("CREATE TABLE l (k INTEGER, v INTEGER)")
    con.execute("CREATE TABLE r (k INTEGER, w INTEGER)")
    if left:
        con.executemany("INSERT INTO l VALUES (?, ?)", left)
    if right:
        con.executemany("INSERT INTO r VALUES (?, ?)", right)
    want = _canon_frame(
        con.execute(
            "SELECT l.k, count(*) AS n, sum(v + w)::BIGINT AS s "
            "FROM l JOIN r ON l.k = r.k GROUP BY l.k"
        ).fetchdf()
    )
    assert got == want


@given(rows=kv_rows)
@settings(**_SETTINGS)
def test_fuzz_window_rank_matches_duckdb(spark, rows):
    """row_number with a total tiebreak (v, rid) must agree — including
    inside the NULL-key partition."""
    indexed = [(k, v, i) for i, (k, v) in enumerate(rows)]
    sdf = _spark_df(spark, indexed, "k int, v int, rid long")
    from pyspark.sql.window import Window

    w = Window.partitionBy("k").orderBy(F.col("v").asc(), F.col("rid").asc())
    out = sdf.select("k", "v", "rid", F.row_number().over(w).cast("long").alias("rn"))
    got = _canon_frame(out.toPandas())
    want = _canon_frame(
        _duck(
            indexed,
            "k INTEGER, v INTEGER, rid BIGINT",
            "SELECT k, v, rid, row_number() OVER "
            "(PARTITION BY k ORDER BY v ASC, rid ASC)::BIGINT AS rn FROM t",
        )
    )
    assert got == want


@given(rows=kv_rows)
@settings(**_SETTINGS)
def test_fuzz_distinct_and_setops_match_duckdb(spark, rows):
    """DISTINCT with NULLs (one null row survives) and EXCEPT ALL bag
    semantics."""
    sdf = _spark_df(spark, rows, "k int, v int")
    half = sdf.filter(F.col("v") >= 0)
    out = sdf.exceptAll(half).unionByName(sdf.distinct())
    got = _canon_frame(out.toPandas())
    con = duckdb.connect()
    con.execute("CREATE TABLE t (k INTEGER, v INTEGER)")
    if rows:
        con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    want = _canon_frame(
        con.execute(
            "SELECT * FROM (SELECT * FROM t EXCEPT ALL SELECT * FROM t WHERE v >= 0) "
            "UNION ALL SELECT DISTINCT * FROM t"
        ).fetchdf()
    )
    assert got == want


ts_rows = st.lists(
    st.tuples(
        st.integers(0, 3),
        # micros spanning 1969-2038, deliberately crossing DST and
        # epoch boundaries, at odd sub-second offsets
        st.integers(-30_000_000_000_000, 2_150_000_000_000_000),
    ),
    min_size=0,
    max_size=20,
)


@given(rows=ts_rows)
@settings(**_SETTINGS)
def test_fuzz_timestamp_funcs_match_duckdb(spark, rows):
    """Datetime kernels over generated instants (pre-epoch, DST edges,
    2038) must agree with DuckDB under the UTC session contract:
    date_trunc day/hour, year/month/day/hour fields, micros
    round-trip.  Guards the tz-repair logic against boundary drift."""
    sdf = _spark_df(spark, rows, "k int, us long").select(
        "k", "us", F.timestamp_micros(F.col("us")).alias("ts")
    )
    out = sdf.select(
        "k",
        "us",
        F.year("ts").alias("y"),
        F.month("ts").alias("mo"),
        F.dayofmonth("ts").alias("d"),
        F.hour("ts").alias("h"),
        F.date_trunc("day", F.col("ts")).alias("day_ts"),
        F.date_trunc("hour", F.col("ts")).alias("hour_ts"),
        F.unix_micros(F.col("ts")).alias("us_rt"),
    )
    got = _canon_frame(out.toPandas())
    want = _canon_frame(
        _duck(
            rows,
            "k INTEGER, us BIGINT",
            "SELECT k, us, "
            "year(make_timestamp(us))::INTEGER AS y, "
            "month(make_timestamp(us))::INTEGER AS mo, "
            "day(make_timestamp(us))::INTEGER AS d, "
            "hour(make_timestamp(us))::INTEGER AS h, "
            "date_trunc('day', make_timestamp(us)) AS day_ts, "
            "date_trunc('hour', make_timestamp(us)) AS hour_ts, "
            "epoch_us(make_timestamp(us)) AS us_rt "
            "FROM t",
        )
    )
    assert got == want


# --- round 4: the hostile-domain divergence classes, fuzzed ---

text_rows = st.lists(
    st.tuples(
        st.integers(0, 50),
        st.one_of(
            st.none(),
            st.text(
                alphabet=st.sampled_from(
                    list("ab c\t\n ") + ["\U00010348", "\U0001f984", "é"]
                ),
                max_size=12,
            ),
        ),
    ),
    min_size=0,
    max_size=20,
    unique_by=lambda r: r[0],
)


@given(rows=text_rows)
@settings(**_SETTINGS)
def test_fuzz_tokenize_matches_duckdb_on_hostile_text(spark, rows):
    """The engine's trim+split tokenizer vs the oracle convention
    (`trim(text, ' ')` + regex split): NULL docs, unicode whitespace
    (NBSP must NOT be trimmed), astral-plane chars, embedded
    tabs/newlines — the exact classes the round-4 hostile sweep caught
    in fixed queries, here fuzzed so regressions can't hide between
    fixtures."""
    sdf = _spark_df(spark, rows, "id int, text string").select(
        "id",
        F.size(F.split(F.trim("text"), r"\s+")).alias("n_tokens"),
        F.length("text").alias("n_chars"),
        F.length(F.encode(F.coalesce(F.col("text"), F.lit("")), "utf-8")).alias("n_bytes"),
    )
    ddf = _duck(
        rows,
        "id int, text varchar",
        """
        SELECT id,
               len(string_split_regex(trim(text, ' '), '\\s+'))::INT AS n_tokens,
               length(text)::INT AS n_chars,
               octet_length(encode(coalesce(text, '')))::INT AS n_bytes
        FROM t
        """,
    )
    assert _canon_frame(sdf.toPandas()) == _canon_frame(ddf)


@given(rows=text_rows)
@settings(**_SETTINGS)
def test_fuzz_null_safe_concat_json_matches_duckdb(spark, rows):
    """Null-propagation asymmetry: bare concat diverges (Spark nulls
    the result, DuckDB skips the arg), so the convention is explicit
    coalesce — fuzz that the CONVENTION holds on arbitrary nullable
    text."""
    sdf = _spark_df(spark, rows, "id int, text string").select(
        "id",
        F.concat(
            F.lit("v="), F.coalesce(F.col("text"), F.lit("null")), F.lit(";")
        ).alias("s"),
    )
    ddf = _duck(
        rows,
        "id int, text varchar",
        "SELECT id, concat('v=', coalesce(text, 'null'), ';') AS s FROM t",
    )
    assert _canon_frame(sdf.toPandas()) == _canon_frame(ddf)


vec_rows = st.lists(
    st.tuples(
        st.integers(0, 30),
        st.lists(
            st.sampled_from([0.0, 1.0, -1.0, 0.5, 2.0]), min_size=4, max_size=4
        ),
    ),
    min_size=0,
    max_size=15,
    unique_by=lambda r: r[0],
)


@given(rows=vec_rows)
@settings(**_SETTINGS)
def test_fuzz_zero_norm_exclusion_matches_duckdb(spark, rows):
    """The similarity tier's zero-norm exclusion policy (ANSI division
    edge): norms and the norm>0 survivor set must agree on vectors
    including all-zero ones."""
    sdf = _spark_df(spark, rows, "id int, v array<double>").select(
        "id",
        F.sqrt(
            F.aggregate(F.zip_with("v", "v", lambda a, b: a * b), F.lit(0.0), lambda acc, x: acc + x)
        ).alias("nrm"),
    ).filter(F.col("nrm") > 0)
    ddf = _duck(
        rows,
        "id int, v double[]",
        "SELECT id, sqrt(list_dot_product(v, v)) AS nrm FROM t WHERE list_dot_product(v, v) > 0",
    )
    assert _canon_frame(sdf.toPandas()) == _canon_frame(ddf)


# ---------------------------------------------------------------------------
# Round-10 (VERDICT r9 task 7): fuzz the two round-9 semantic rows whose
# edge domains the fixed fixtures can't explore — the try_* NULL-set
# (F16) and lateral column alias chains (C31).  Each hypothesis example
# is a BATCH of generated rows, so one property run covers hundreds of
# generated cases (examples × rows/example ≥ 200) while paying Spark's
# per-job latency once per example, not once per row.
# ---------------------------------------------------------------------------

_TRY_SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

_I64_MAX = 9223372036854775807
_I64_MIN = -9223372036854775808

try_rows = st.lists(
    st.tuples(
        # a, b: int64 addition operands clustered AT the overflow
        # boundary (the fixed fixture only crosses it from one side)
        st.one_of(
            st.integers(_I64_MAX - 3, _I64_MAX),
            st.integers(_I64_MIN, _I64_MIN + 3),
            st.integers(-100, 100),
        ),
        st.integers(-5, 5),
        # m: modulus including 0 and negatives (sign-of-dividend check)
        st.integers(-3, 3),
        # s: cast candidates — signs, decimal points, exponents, junk,
        # overflow digits, empty; NO non-space whitespace (Spark trims
        # all ASCII control chars, DuckDB trim() only spaces — a real
        # dialect boundary the oracle guard below doesn't model)
        st.text(alphabet="0123456789+-.e x", max_size=8),
        # idx: 1-based element_at probe, past both ends + negative.
        # 0 is EXCLUDED by contract, not oversight: Spark's
        # try_element_at only catches out-of-bounds — the zero-index
        # error (INVALID_INDEX_OF_ZERO) still RAISES under try_
        # (found by this fuzzer's first run); callers must guard 0
        # themselves.
        st.integers(-6, 6).filter(lambda x: x != 0),
        # al: array length for the element_at target
        st.integers(0, 4),
    ),
    min_size=1,
    max_size=30,
)


@given(rows=try_rows)
@settings(**_TRY_SETTINGS)
def test_fuzz_try_funcs_null_set_matches_duckdb(spark, rows):
    """F16's contract, fuzzed: the EXACT NULL-set of try_add (int64
    overflow both directions), try_mod (%0, negative operands),
    try_cast (string → int), and try_element_at (0 / negative /
    past-end 1-based index) must match an oracle that re-derives every
    NULL with explicit guards — HUGEINT range-check for overflow,
    Spark-semantics integer regex for the cast (DuckDB's own TRY_CAST
    ROUNDS '12.5' to 13 where ANSI Spark nulls it), native list
    indexing for element_at."""
    sdf = _spark_df(spark, rows, "a long, b long, m int, s string, idx int, al int").select(
        "a", "b", "m", "s", "idx", "al",
        F.try_add("a", "b").alias("t_add"),
        F.expr("try_mod(b, m)").alias("t_mod"),
        F.expr("try_cast(s AS int)").alias("t_cast"),
        F.try_element_at(
            F.slice(F.array(F.lit(10), F.lit(20), F.lit(30), F.lit(40)), 1, F.col("al")),
            F.col("idx"),
        ).alias("t_elem"),
    )
    ddf = _duck(
        rows,
        "a BIGINT, b BIGINT, m INTEGER, s VARCHAR, idx INTEGER, al INTEGER",
        """
        SELECT a, b, m, s, idx, al,
               CASE WHEN a::HUGEINT + b::HUGEINT
                         BETWEEN -9223372036854775808::HUGEINT
                             AND 9223372036854775807::HUGEINT
                    THEN (a::HUGEINT + b::HUGEINT)::BIGINT END AS t_add,
               CASE WHEN m <> 0 THEN b % m END AS t_mod,
               CASE WHEN regexp_matches(trim(s, ' '), '^[+-]?[0-9]+$')
                    THEN TRY_CAST(trim(s, ' ') AS INTEGER) END AS t_cast,
               CASE WHEN idx <> 0
                    THEN ([10, 20, 30, 40][1:al])[idx] END AS t_elem
        FROM t
        """,
    )
    assert _canon_frame(sdf.toPandas()) == _canon_frame(ddf)


lateral_rows = st.lists(
    st.tuples(st.one_of(st.none(), st.integers(0, 3)), st.one_of(st.none(), st.integers(-50, 50))),
    min_size=0,
    max_size=30,
)

# IDENTICAL text on both engines (the c31 discipline): a 4-deep lateral
# alias chain over aggregate expressions.  CAST pins sum's dtype
# (DuckDB sum(int) is HUGEINT); `/` is float division on both.
_LATERAL_SQL = """
SELECT k,
       count(*) AS n,
       CAST(sum(v) AS BIGINT) AS s,
       s * 2 AS s2,
       s2 + n AS s2n,
       s / n AS avg_v,
       avg_v / 2 AS half_avg
FROM t GROUP BY k
"""


@given(rows=lateral_rows)
@settings(**_TRY_SETTINGS)
def test_fuzz_lateral_alias_chain_matches_duckdb(spark, rows):
    """C31's contract, fuzzed: a lateral-alias chain over generated
    frames (NULL keys, NULL values, empty input) resolves to the same
    values as DuckDB running the IDENTICAL query text — proving the
    analyzer rewrites the references onto aggregate output instead of
    re-evaluating or mis-scoping them."""
    _spark_df(spark, rows, "k int, v int").createOrReplaceTempView("t")
    got = _canon_frame(spark.sql(_LATERAL_SQL).toPandas())
    spark.catalog.dropTempView("t")
    want = _canon_frame(_duck(rows, "k INTEGER, v INTEGER", _LATERAL_SQL))
    assert got == want


# ---------------------------------------------------------------------------
# Round-11 additions (VERDICT r10 task 5): fuzz the round-10 semantics —
# mode/median tie + interpolation rules, bitmap bucket boundaries with
# negative and zero keys, and simhash vote ties (sum exactly 0).
# Example count is env-tunable: the release record runs each property
# at >= 200 examples (SPARK_GRAFT_FUZZ_EXAMPLES=200, SURVEY §5.18);
# the in-suite default stays cheap.

import os as _os

_R11_SETTINGS = dict(
    max_examples=int(_os.environ.get("SPARK_GRAFT_FUZZ_EXAMPLES", "10")),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

# Tight value range (0..3) against up-to-30 rows: ties among
# most-frequent values and even/odd group sizes are the common case,
# not the rare one — exactly the boundaries a18's determinism
# contract (lowest-tie mode, interpolated median) must hold on.
mode_rows = st.lists(
    st.tuples(st.integers(0, 2), st.one_of(st.none(), st.integers(0, 3))),
    min_size=1,
    max_size=30,
)


@given(rows=mode_rows)
@settings(**_R11_SETTINGS)
def test_fuzz_mode_median_ties_match_duckdb(spark, rows):
    """A18's contract, fuzzed: Spark's deterministic `mode(v, true)`
    (lowest among the most frequent) against the oracle's count +
    row_number(n DESC, v ASC) re-derivation, and `median()` (even
    counts interpolate the middle pair) against quantile_cont over
    DOUBLE — the DECIMAL lower-middle trap the round-10 probe found
    stays pinned by the explicit cast.  NULL values are ignored by
    both aggregates; a group that is ALL-NULL yields NULL mode and
    NULL median on both engines."""
    sdf = (
        _spark_df(spark, rows, "k int, v int")
        .groupBy("k")
        .agg(
            F.expr("mode(v, true)").alias("mode_v"),
            F.median("v").alias("median_v"),
        )
    )
    got = _canon_frame(sdf.toPandas())
    want = _canon_frame(
        _duck(
            rows,
            "k INTEGER, v INTEGER",
            """
            WITH g AS (SELECT DISTINCT k FROM t),
            nn AS (SELECT k, v FROM t WHERE v IS NOT NULL),
            cq AS (SELECT k, v, count(*) AS n FROM nn GROUP BY k, v),
            mq AS (
              SELECT k, v AS mode_v FROM cq
              QUALIFY row_number() OVER (PARTITION BY k
                                         ORDER BY n DESC, v ASC) = 1
            ),
            med AS (
              SELECT k, quantile_cont(v::DOUBLE, 0.5) AS median_v
              FROM nn GROUP BY k
            )
            SELECT g.k, mq.mode_v, med.median_v
            FROM g LEFT JOIN mq USING (k) LEFT JOIN med USING (k)
            """,
        )
    )
    assert got == want


# Keys spanning zero and both signs, concentrated on the ±32768
# segment boundaries (the a19 4 KB-bitmap bucket size), where the
# floor-vs-truncate division dialect actually bites.
bitmap_keys = st.lists(
    st.one_of(
        st.integers(-3, 3),
        st.integers(32766, 32770),
        st.integers(-32770, -32766),
        st.integers(65534, 65538),
        st.integers(-100000, 100000),
    ),
    min_size=1,
    max_size=30,
)


@given(keys=bitmap_keys)
@settings(**_R11_SETTINGS)
def test_fuzz_bitmap_bucket_negative_keys_match_duckdb(spark, keys):
    """A19's bucket algebra, fuzzed over NEGATIVE and zero keys: the
    Spark formula is floorDiv(k-1, 32768) + 1 (probed round 11: holds
    for all signs — k=0 → 0, k=-32768 → -1, k=-65537 → -2) with bit
    position (k-1) % 32768 for k > 0 else (-k) % 32768, a bijection
    from int64 to (bucket, position).  The oracle must spell the
    division as floor() over DOUBLE — DuckDB's `//` TRUNCATES toward
    zero on negatives (the round-10 custkey-0 boundary, generalized) —
    and the full pipeline distinct-count via bitmap_count must equal
    exact COUNT(DISTINCT) regardless of sign."""
    rows = [(k,) for k in keys]
    sdf = spark.createDataFrame(rows, "k long")
    proj = sdf.select(
        "k",
        F.expr("bitmap_bucket_number(k)").alias("bkt"),
        F.expr("bitmap_bit_position(k)").alias("pos"),
    ).distinct()
    got_proj = _canon_frame(proj.toPandas())
    want_proj = _canon_frame(
        _duck(
            rows,
            "k BIGINT",
            """
            SELECT DISTINCT k,
                   1 + CAST(floor((k - 1) / 32768.0) AS BIGINT) AS bkt,
                   CASE WHEN k > 0 THEN (k - 1) % 32768
                        ELSE (-k) % 32768 END AS pos
            FROM t
            """,
        )
    )
    assert got_proj == want_proj
    # Full pipeline: sum of per-bucket bitmap popcounts == exact
    # distinct count (the bijection makes this an identity).
    n_distinct = (
        sdf.select(
            F.expr("bitmap_bucket_number(k)").alias("bkt"),
            F.expr("bitmap_bit_position(k)").alias("pos"),
        )
        .groupBy("bkt")
        .agg(F.expr("bitmap_count(bitmap_construct_agg(pos))").alias("c"))
        .agg(F.sum("c").cast("long").alias("n"))
        .collect()[0]["n"]
    )
    assert n_distinct == len(set(keys))


# Documents over a 6-token alphabet: with 52 independent sign votes
# per doc and tiny even-sized token sets, per-bit vote sums hit
# EXACTLY zero constantly — the tie the strict `> 0` rule must
# resolve identically (bit cleared) on both engines.
simhash_docs = st.lists(
    st.tuples(
        st.integers(0, 9),
        st.lists(
            st.sampled_from(["alpha", "beta", "gamma", "delta", "eps", "zeta"]),
            min_size=1,
            max_size=6,
        ),
    ),
    min_size=1,
    max_size=8,
    unique_by=lambda kv: kv[0],
)


@given(docs=simhash_docs)
@settings(**_R11_SETTINGS)
def test_fuzz_simhash_vote_ties_match_duckdb(spark, docs):
    """L2c's signature algebra, fuzzed at the vote-tie boundary: a
    per-bit vote sum of EXACTLY 0 (even number of distinct tokens,
    half voting each way) must clear the bit — the strict `> 0` rule
    — on both engines, for every one of the 52 bits.  The oracle
    re-derives the md5-52 PRF, the ±1 vote sums, and the sign fold
    from scratch (the l2c recipe) over generated token multisets
    instead of the fixed corpus."""
    from projectmapreduce_spark.operators.dedup import simhash
    from projectmapreduce_spark.queries.llm_pipeline import _SIMHASH_TOKEN_HASH_SQL

    rows = [(i, " ".join(toks)) for i, toks in docs]
    sdf = simhash(
        spark.createDataFrame(rows, "doc_id int, text string"), "doc_id", "text"
    )
    got = _canon_frame(sdf.toPandas())
    want = _canon_frame(
        _duck(
            rows,
            "doc_id INTEGER, text VARCHAR",
            f"""
            WITH tok AS (
              SELECT DISTINCT doc_id AS id,
                     unnest(string_split_regex(text, '\\s+')) AS token
              FROM t
            ),
            h AS (SELECT id, {_SIMHASH_TOKEN_HASH_SQL} AS h FROM tok),
            votes AS (
              SELECT id, bit, sum(2 * ((h >> bit) & 1) - 1)::BIGINT AS v
              FROM h, (SELECT unnest(generate_series(0, 51)) AS bit) bits
              GROUP BY id, bit
            )
            SELECT id,
                   sum(CASE WHEN v > 0 THEN (1::BIGINT << bit)
                            ELSE 0::BIGINT END)::BIGINT AS simhash
            FROM votes GROUP BY id
            """,
        )
    )
    assert got == want
