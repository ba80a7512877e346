"""Property-based tests (SURVEY.md §5.3): algebraic laws the operators
must satisfy on arbitrary small inputs, via hypothesis.

Each example pays a Spark job, so examples are few (8–10) and frames
tiny — the value is in the generated edge cases (empty frames, empty
strings, duplicate keys, negative values), not volume."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from projectmapreduce_spark.operators.dedup import exact_dedup, simhash
from projectmapreduce_spark.operators.joins import salted_join
from projectmapreduce_spark.operators.mr import reduce_by_key

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

rows_kv = st.lists(
    st.tuples(st.integers(0, 5), st.integers(-1000, 1000)), min_size=0, max_size=30
)
texts = st.lists(
    st.text(alphabet="ab c", min_size=0, max_size=20), min_size=1, max_size=12
)


@given(rows=rows_kv, threshold=st.integers(-500, 500))
@settings(**_SETTINGS)
def test_filter_composition(spark, rows, threshold):
    """filter(p) ∘ filter(q) == filter(p AND q)."""
    df = spark.createDataFrame(rows, "k int, v int") if rows else spark.range(0).selectExpr(
        "cast(id as int) k", "cast(id as int) v"
    )
    p = F.col("v") > threshold
    q = F.col("k") % 2 == 0
    a = df.filter(p).filter(q).collect()
    b = df.filter(p & q).collect()
    assert sorted(a) == sorted(b)


@given(rows=rows_kv)
@settings(**_SETTINGS)
def test_reduce_by_key_matches_python_fold(spark, rows):
    """The distributed keyed reduce equals a driver-side dict fold."""
    df = spark.createDataFrame(rows, "k int, v int") if rows else spark.range(0).selectExpr(
        "cast(id as int) k", "cast(id as int) v"
    )
    got = {
        r.k: (r.n, r.s)
        for r in reduce_by_key(df, ["k"], n=F.count(F.lit(1)), s=F.sum("v")).collect()
    }
    want: dict[int, tuple[int, int]] = {}
    for k, v in rows:
        n, s = want.get(k, (0, 0))
        want[k] = (n + 1, s + v)
    assert got == want


@given(texts=texts)
@settings(**_SETTINGS)
def test_exact_dedup_idempotent_and_minimal(spark, texts):
    """dedup(dedup(x)) == dedup(x); survivors = one per distinct text,
    each the lowest id of its group."""
    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    once = exact_dedup(df, "text", "doc_id")
    twice = exact_dedup(once.select("doc_id", "text"), "text", "doc_id")
    got_once = sorted(r.doc_id for r in once.collect())
    got_twice = sorted(r.doc_id for r in twice.collect())
    assert got_once == got_twice
    first_ids = {}
    for i, t in rows:
        first_ids.setdefault(t, i)
    assert got_once == sorted(first_ids.values())


@given(texts=st.lists(st.text(alphabet="abc ", min_size=1, max_size=30), min_size=1, max_size=6))
@settings(**_SETTINGS)
def test_simhash_bag_invariance(spark, texts):
    """SimHash depends only on the token bag: shuffling token order
    never changes the signature."""
    rows = []
    for i, t in enumerate(texts):
        toks = t.split()
        rows.append((2 * i, " ".join(toks)))
        rows.append((2 * i + 1, " ".join(reversed(toks))))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sigs = {r.id: r.simhash for r in simhash(df, "doc_id", "text").collect()}
    for i in range(len(texts)):
        assert sigs[2 * i] == sigs[2 * i + 1]


@given(
    left=st.lists(st.tuples(st.integers(0, 3), st.integers(0, 100)), max_size=25),
    right=st.lists(st.tuples(st.integers(0, 3), st.text(alphabet="xy", max_size=3)), max_size=8),
)
@settings(**_SETTINGS)
def test_salted_join_equals_plain_join(spark, left, right):
    """Salting changes partitioning, never the result set."""
    l = spark.createDataFrame(left, "k int, v int") if left else spark.range(0).selectExpr(
        "cast(id as int) k", "cast(id as int) v"
    )
    r = spark.createDataFrame(right, "k int, tag string") if right else spark.range(
        0
    ).selectExpr("cast(id as int) k", "cast(id as string) tag")
    got = sorted((x.k, x.v, x.tag) for x in salted_join(l, r, "k", n_salts=4).collect())
    want = sorted((x.k, x.v, x.tag) for x in l.join(r, "k").collect())
    assert got == want


@given(rows=rows_kv)
@settings(**_SETTINGS)
def test_union_distinct_is_set_union(spark, rows):
    """unionByName + distinct == set union of the two row sets."""
    half = len(rows) // 2
    a = spark.createDataFrame(rows[:half], "k int, v int") if rows[:half] else spark.range(
        0
    ).selectExpr("cast(id as int) k", "cast(id as int) v")
    b = spark.createDataFrame(rows[half:], "k int, v int") if rows[half:] else spark.range(
        0
    ).selectExpr("cast(id as int) k", "cast(id as int) v")
    got = {(r.k, r.v) for r in a.unionByName(b).distinct().collect()}
    assert got == set(rows)


# ---------- L13–L15 pipeline verbs (round 2) ----------


@given(ids=st.lists(st.integers(0, 100_000), min_size=1, max_size=25, unique=True))
@settings(**_SETTINGS)
def test_deterministic_split_matches_python_mirror(spark, ids):
    """Split is a pure function of the id: equal to the Python-side
    hash fold, covers only the three labels, and is rerun-stable."""
    from projectmapreduce_spark.operators.pipeline import deterministic_split

    df = spark.createDataFrame([(i,) for i in ids], "id long")
    got = {r.id: r.split for r in deterministic_split(df, "id").collect()}
    for i in ids:
        b = ((i * 2654435761) % 4294967296) % 100
        want = "train" if b < 80 else ("val" if b < 90 else "test")
        assert got[i] == want


@given(
    sizes=st.lists(st.integers(1, 500), min_size=1, max_size=25),
    budget=st.integers(50, 800),
)
@settings(**_SETTINGS)
def test_pack_sequences_matches_sequential_fold(spark, sizes, budget):
    """Each doc's chunk equals the sequential greedy fold (chunk =
    preceding running total // budget) and chunk ids are monotone in
    stream order."""
    from projectmapreduce_spark.operators.pipeline import pack_sequences

    rows = [(1, pos, s) for pos, s in enumerate(sizes)]
    df = spark.createDataFrame(rows, "stream int, pos int, size long")
    out = sorted(
        pack_sequences(df, "stream", "pos", "size", budget).collect(),
        key=lambda r: r.pos,
    )
    cum = 0
    for r in out:
        assert r.chunk_id == cum // budget
        cum += r.size
    ids = [r.chunk_id for r in out]
    assert ids == sorted(ids)


@given(
    ids=st.lists(st.integers(0, 100_000), min_size=1, max_size=25, unique=True),
    w_lo=st.integers(0, 50),
    w_hi=st.integers(50, 100),
)
@settings(**_SETTINGS)
def test_mixture_sample_is_monotone_in_weight(spark, ids, w_lo, w_hi):
    """Raising a keep-rate only ADDS rows (nested samples — the
    property that lets mixture ratios be retuned without reshuffling
    which docs are in)."""
    from pyspark.sql import functions as F

    from projectmapreduce_spark.operators.pipeline import mixture_sample

    df = spark.createDataFrame([(i,) for i in ids], "id long")
    lo = {r.id for r in mixture_sample(df, "id", F.lit(w_lo)).collect()}
    hi = {r.id for r in mixture_sample(df, "id", F.lit(w_hi)).collect()}
    assert lo <= hi
