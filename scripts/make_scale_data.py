#!/usr/bin/env python
"""Generate a deterministic synthetic dataset ~10× sf0.1 ("sf1-shaped")
under .scratch/sf1_synth/ for the SCALING.md study.

Purpose: the driver fixtures stop at sf0.1, where fixed costs (JVM,
codegen, Python worker spin-up) dominate several queries; measuring
sf0.1 → sf1 on data 10× larger separates per-byte cost from fixed
cost and lets SCALING.md report an observed scaling exponent per
query.

Same schemas and value domains as FIXTURES.md (verified pyarrow
footers), same FK structure (lineitem→orders→customer→nation→region,
lineitem→supplier/part).  All values derive from crc32/pmod of the row
id — no rand(), so the dataset is bit-reproducible on any partition
layout.  Distributions are uniform (no TPC-H skew): SCALING.md
measures how plans SCALE, not absolute fixture-equivalent times, and
says so.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from projectmapreduce_spark.session import get_spark

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scratch", "sf1_synth"
)

# 10× the sf0.1 row counts (FIXTURES.md); dims that the driver keeps
# fixed (nation/region) stay fixed — they are broadcast constants at
# every scale.
N = {
    "supplier": 10_000,
    "customer": 150_000,
    "part": 200_000,
    "orders": 1_500_000,
    "lineitem": 6_000_000,
    "events": 1_000_000,
    "documents": 50_000,
    "embeddings": 20_000,
}

# Vocabulary must scale with the corpus (Heaps' law): a fixed few-hundred
#-word vocab at 50k docs makes EVERY 1-gram posting list huge, which
# degenerates any token-join (Jaccard dedup, and its DuckDB oracle) into
# ~1e9 candidate pairs — an artifact of unrealistic data, not a property
# of the operators.  Round 3: content tokens are drawn ZIPFIAN over 200k
# ids (df(k) ∝ 1/k over 200k ids — Heaps-law-sized for a 5.7M-token corpus, so the df tail genuinely reaches 1).  This is what similarity-join
# prefix filtering assumes: each doc's globally-rarest tokens have
# df ≈ 1-10, so candidate generation stays near the true pair count
# (uniform draws — every token df ≈ 300 — were the pathological case).
_VOCAB_SIZE = 200_000
_FUNCTION_WORDS = [
    "the", "a", "of", "and", "is", "fast", "big", "small", "slow", "dup", "spark",
]

# ~2% of documents are planted near-duplicates of an earlier doc (same
# token stream, last token perturbed) so the dedup family (l2, l17,
# l30) has TRUE positives to find at every tier instead of an empty
# edge set.
_DUP_EVERY = 50
_DUP_OFFSET = 7


def _u(col, salt: str, m: int):
    """Deterministic uniform int in [0, m) from a bigint column."""
    return F.pmod(F.crc32(F.concat(F.lit(salt), col.cast("string"))), F.lit(m)).cast("long")


def _ids(spark: SparkSession, n: int, name: str) -> DataFrame:
    return spark.range(0, n, 1, 32).withColumnRenamed("id", name)


def _doc_text_expr():
    """The shared synthetic corpus text: Zipfian content tokens +
    function words + planted near-duplicates (used by both the sf1
    and the hostile tiers so the dedup family sees the same realistic
    token statistics in both)."""
    fw = F.array(*[F.lit(w) for w in _FUNCTION_WORDS])
    # Near-dups re-generate their parent's token stream (same base id),
    # then the perturbation below swaps the final token.
    is_dup = (F.col("doc_id") % _DUP_EVERY == _DUP_OFFSET) & (F.col("doc_id") >= _DUP_EVERY)
    # Parent is doc_id − _DUP_OFFSET ≡ 0 (mod _DUP_EVERY): never itself a
    # dup, so every planted dup shares its parent's ACTUAL token stream.
    base_id = F.when(is_dup, F.col("doc_id") - _DUP_OFFSET).otherwise(F.col("doc_id"))
    n_tok = (_u(base_id, "dn", 150) + 50).cast("int")  # 50–199 tokens

    def tok_at(i):
        h = F.crc32(F.concat(base_id.cast("string"), F.lit(":"), i.cast("string")))
        # Every 8th position a function word; the rest drawn ZIPFIAN
        # (log-uniform inverse CDF: id = floor(V^u) gives df(k) ∝ 1/k).
        # Round-3 change from uniform: a uniform 20k vocab is the WORST
        # case for prefix-filtered similarity joins (every doc's
        # "rarest" token still has df ≈ 300 at sf1, so the l2b oracle's
        # candidate set exploded to ~21M pairs); real corpora are
        # Zipfian, where per-doc rare tokens have df ≈ 1-10 and prefix
        # filtering collapses candidates to ~the true near-dup pairs.
        u = F.pmod(h, F.lit(1_000_003)) / F.lit(1_000_003.0)
        zipf_id = F.floor(F.pow(F.lit(float(_VOCAB_SIZE)), u)).cast("long")
        return F.when(
            F.pmod(h, F.lit(8)) == 0,
            F.element_at(fw, (F.pmod(h, F.lit(len(_FUNCTION_WORDS))) + 1).cast("int")),
        ).otherwise(F.concat(F.lit("tok"), zipf_id))

    tokens = F.transform(F.sequence(F.lit(1), n_tok), tok_at)
    tokens = F.when(
        is_dup,
        F.concat(F.slice(tokens, 1, F.size(tokens) - 1), F.array(F.lit("dupmark"))),
    ).otherwise(tokens)
    return F.concat_ws(" ", tokens)


def gen(spark: SparkSession) -> None:
    os.makedirs(OUT, exist_ok=True)
    # nation/region: copy the fixed dims verbatim from the fixtures.
    for t in ("nation", "region"):
        spark.read.parquet(f"/root/testdata/sf0.1/{t}.parquet").coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{OUT}/{t}.parquet")

    s = _ids(spark, N["supplier"], "s_suppkey").select(
        F.col("s_suppkey"),
        F.concat(F.lit("Supplier#"), F.col("s_suppkey")).alias("s_name"),
        _u(F.col("s_suppkey"), "sn", 25).cast("int").alias("s_nationkey"),
        ((_u(F.col("s_suppkey"), "sb", 2_000_000) - 1_000_000) / 100.0).alias("s_acctbal"),
    )
    s.write.mode("overwrite").parquet(f"{OUT}/supplier.parquet")

    c = _ids(spark, N["customer"], "c_custkey").select(
        F.col("c_custkey"),
        F.concat(F.lit("Customer#"), F.col("c_custkey")).alias("c_name"),
        _u(F.col("c_custkey"), "cn", 25).cast("int").alias("c_nationkey"),
        ((_u(F.col("c_custkey"), "cb", 2_000_000) - 1_000_000) / 100.0).alias("c_acctbal"),
        F.element_at(
            F.array(*[F.lit(x) for x in ("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")]),
            (_u(F.col("c_custkey"), "cm", 5) + 1).cast("int"),
        ).alias("c_mktsegment"),
    )
    c.write.mode("overwrite").parquet(f"{OUT}/customer.parquet")

    # p_name/p_type use the FIXTURE value style ("adj noun" names, the
    # six real type values) so type/name-filtered queries (c13, c14,
    # c17) select real rows at sf1 instead of vacuously-empty sets.
    adjs = F.array(*[F.lit(x) for x in ("small", "red", "blue", "hot", "big", "green", "cold", "dim")])
    nouns = F.array(*[F.lit(x) for x in ("ring", "widget", "bolt", "gear", "gizmo", "cog", "plate", "washer")])
    p = _ids(spark, N["part"], "p_partkey").select(
        F.col("p_partkey"),
        F.concat_ws(
            " ",
            F.element_at(adjs, (_u(F.col("p_partkey"), "pa", 8) + 1).cast("int")),
            F.element_at(nouns, (_u(F.col("p_partkey"), "pn", 8) + 1).cast("int")),
        ).alias("p_name"),
        F.concat(F.lit("Brand#"), _u(F.col("p_partkey"), "pb", 25) + 1).alias("p_brand"),
        F.element_at(
            F.array(*[F.lit(x) for x in ("ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD")]),
            (_u(F.col("p_partkey"), "pt", 6) + 1).cast("int"),
        ).alias("p_type"),
        (_u(F.col("p_partkey"), "ps", 50) + 1).cast("int").alias("p_size"),
        (900.0 + _u(F.col("p_partkey"), "pr", 100_000) / 100.0).alias("p_retailprice"),
    )
    p.write.mode("overwrite").parquet(f"{OUT}/part.parquet")

    base_ts = F.to_timestamp(F.lit("1995-01-01 00:00:00"))
    o = _ids(spark, N["orders"], "o_orderkey").select(
        F.col("o_orderkey"),
        _u(F.col("o_orderkey"), "oc", N["customer"]).alias("o_custkey"),
        F.element_at(
            F.array(F.lit("O"), F.lit("F"), F.lit("P")),
            (_u(F.col("o_orderkey"), "os", 3) + 1).cast("int"),
        ).alias("o_orderstatus"),
        (1000.0 + _u(F.col("o_orderkey"), "op", 40_000_000) / 100.0).alias("o_totalprice"),
        F.timestamp_add(
            "DAY", _u(F.col("o_orderkey"), "od", 2400).cast("int"), base_ts
        ).alias("o_orderdate"),
        F.element_at(
            F.array(*[F.lit(x) for x in ("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")]),
            (_u(F.col("o_orderkey"), "opr", 5) + 1).cast("int"),
        ).alias("o_orderpriority"),
    )
    o.write.mode("overwrite").parquet(f"{OUT}/orders.parquet")

    li = _ids(spark, N["lineitem"], "rid").select(
        (F.col("rid") % N["orders"]).alias("l_orderkey"),
        _u(F.col("rid"), "lp", N["part"]).alias("l_partkey"),
        _u(F.col("rid"), "ls", N["supplier"]).alias("l_suppkey"),
        (F.col("rid") / N["orders"]).cast("int").alias("l_linenumber"),
        (1.0 + _u(F.col("rid"), "lq", 50)).alias("l_quantity"),
        (900.0 + _u(F.col("rid"), "le", 10_000_000) / 100.0).alias("l_extendedprice"),
        (_u(F.col("rid"), "ld", 11) / 100.0).alias("l_discount"),
        (_u(F.col("rid"), "lt", 9) / 100.0).alias("l_tax"),
        F.element_at(
            F.array(F.lit("A"), F.lit("N"), F.lit("R")),
            (_u(F.col("rid"), "lr", 3) + 1).cast("int"),
        ).alias("l_returnflag"),
        F.element_at(
            F.array(F.lit("F"), F.lit("O")),
            (_u(F.col("rid"), "ll", 2) + 1).cast("int"),
        ).alias("l_linestatus"),
        F.timestamp_add(
            "DAY", (_u(F.col("rid"), "lsd", 2500)).cast("int"), base_ts
        ).alias("l_shipdate"),
    )
    li.write.mode("overwrite").parquet(f"{OUT}/lineitem.parquet")

    # Event TIME ORDER must match the fixture contract: the driver's
    # events table is an append-ordered log (corr(event_id, ts) ≈ 1.0,
    # ZERO out-of-order rows at sf0.1).  A uniform-random ts breaks
    # every watermark-bearing streaming query at volume — arrival order
    # becomes random in event time, the watermark races to the max seen
    # and drops ~94% of rows as late (caught by the sf1 sweep:
    # t3s_stream_session 62k vs 963k).  ts is therefore monotone in
    # event_id: a fixed 31-second stride plus a bounded jitter smaller
    # than the stride (order preserved, spacing still irregular).
    ev = _ids(spark, N["events"], "event_id").select(
        F.col("event_id"),
        F.timestamp_add(
            "SECOND",
            (F.col("event_id") * 31 + _u(F.col("event_id"), "et", 31)).cast("int"),
            base_ts,
        ).alias("ts"),
        _u(F.col("event_id"), "eu", 1500).alias("user_id"),
        F.element_at(
            # exact fixture domain (FIXTURES.md:100)
            F.array(*[F.lit(x) for x in ("click", "purchase", "error", "signup", "view")]),
            (_u(F.col("event_id"), "ee", 5) + 1).cast("int"),
        ).alias("event_type"),
        (_u(F.col("event_id"), "ev", 10_000) / 100.0).alias("value"),
        F.concat(
            F.lit('{"k":'), _u(F.col("event_id"), "ep", 100), F.lit("}")
        ).alias("props"),
    )
    ev.write.mode("overwrite").parquet(f"{OUT}/events.parquet")
    # Spark's file-stream source replays files OLDEST-MTIME-FIRST, and
    # all 32 part files land with near-identical mtimes — replay order
    # becomes arbitrary, so later-time files can be consumed first and
    # the watermark then drops earlier files WHOLE (t3s at sf1: 90k of
    # 963k sessions survived).  A production log directory accumulates
    # files in time order; recreate that contract deterministically:
    # part-0000i holds id range i = time range i (spark.range
    # partitioning is contiguous), so bump mtimes in filename order.
    import glob as _glob
    import time as _time

    files = sorted(_glob.glob(f"{OUT}/events.parquet/part-*"))
    t0 = _time.time() - 2 * len(files)
    for i, f in enumerate(files):
        os.utime(f, (t0 + 2 * i, t0 + 2 * i))

    text = _doc_text_expr()
    d = _ids(spark, N["documents"], "doc_id").select(
        F.col("doc_id"),
        text.alias("text"),
        F.element_at(
            F.array(*[F.lit(x) for x in ("en", "fr", "es", "de", "zh")]),
            (_u(F.col("doc_id"), "dl", 5) + 1).cast("int"),
        ).alias("lang"),
        # exact fixture domain src0…src19 (FIXTURES.md:110) — queries
        # parse the numeric suffix at offset 4 (l14/l15)
        F.concat(F.lit("src"), _u(F.col("doc_id"), "ds", 20)).alias("source"),
    )
    d = d.withColumn("n_chars", F.length("text").cast("long"))
    d.write.mode("overwrite").parquet(f"{OUT}/documents.parquet")

    emb = _ids(spark, N["embeddings"], "vec_id").select(
        F.col("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(63)),
            lambda j: (
                (
                    F.pmod(
                        F.crc32(F.concat(F.col("vec_id").cast("string"), F.lit("|"), j.cast("string"))),
                        F.lit(20_001),
                    )
                    - 10_000
                )
                / 10_000.0
            ).cast("float"),
        ).alias("embedding"),
        _u(F.col("vec_id"), "el", 200).cast("int").alias("label"),
    )
    emb.write.mode("overwrite").parquet(f"{OUT}/embeddings.parquet")


OUT_SKEW = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scratch", "sf1_skew"
)

# Zipf-ish two-tier FK skew: HOT_FRAC of all lineitems land on HOT_KEYS
# orders (~190k rows/key at sf1 vs ~4 uniform) — the pathological
# hot-key regime AQE's splitter and salting exist for.
HOT_KEYS = 8
HOT_FRAC = 0.25


def gen_skew(spark: SparkSession) -> None:
    """Skewed sf1 variant (VERDICT r2 item 5; upgraded round 4 for
    VERDICT r3 item 6): lineitem carries the FULL fixture schema but
    its l_orderkey FK is zipf-skewed (~190k rows on each of 8 hot keys
    vs ~4 uniform).  Every other table symlinks to the sf1 tier, so
    the whole declared catalog can run against this directory — the
    skew tier is hash-VERIFIED by driver_sim (skew changes partial-agg
    sizes and AQE skew-split paths, not just timings; a one-cent money
    divergence under skew must fail loudly), not just timed by
    scripts/skew_stress.py."""
    os.makedirs(OUT_SKEW, exist_ok=True)
    rid = F.col("rid")
    is_hot = _u(rid, "hot?", 10_000) < int(HOT_FRAC * 10_000)
    okey = F.when(is_hot, _u(rid, "hotk", HOT_KEYS)).otherwise(
        _u(rid, "coldk", N["orders"])
    )
    base_ts = F.to_timestamp(F.lit("1995-01-01 00:00:00"))
    li = _ids(spark, N["lineitem"], "rid").select(
        okey.alias("l_orderkey"),
        _u(rid, "lp", N["part"]).alias("l_partkey"),
        _u(rid, "ls", N["supplier"]).alias("l_suppkey"),
        (F.col("rid") / N["orders"]).cast("int").alias("l_linenumber"),
        (1.0 + _u(rid, "lq", 50)).alias("l_quantity"),
        (900.0 + _u(rid, "le", 10_000_000) / 100.0).alias("l_extendedprice"),
        (_u(rid, "ld", 11) / 100.0).alias("l_discount"),
        (_u(rid, "lt", 9) / 100.0).alias("l_tax"),
        F.element_at(
            F.array(F.lit("A"), F.lit("N"), F.lit("R")),
            (_u(rid, "lr", 3) + 1).cast("int"),
        ).alias("l_returnflag"),
        F.element_at(
            F.array(F.lit("F"), F.lit("O")),
            (_u(rid, "ll", 2) + 1).cast("int"),
        ).alias("l_linestatus"),
        F.timestamp_add("DAY", (_u(rid, "lsd", 2500)).cast("int"), base_ts).alias("l_shipdate"),
    )
    li.write.mode("overwrite").parquet(f"{OUT_SKEW}/lineitem.parquet")
    # Everything else is identical to the sf1 tier — symlink so the
    # full catalog (and driver_sim's 10-view registration) runs here.
    for t in sorted(list(N) + ["nation", "region"]):
        if t == "lineitem":
            continue
        src = f"{OUT}/{t}.parquet"
        if not os.path.exists(src):
            raise FileNotFoundError(
                f"{src} missing — generate the sf1 tier first "
                "(python scripts/make_scale_data.py), then --skew"
            )
        dst = f"{OUT_SKEW}/{t}.parquet"
        if not os.path.exists(dst):
            os.symlink(src, dst)


OUT_HOSTILE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scratch", "sf1_hostile"
)

# Astral-plane / BMP-edge tokens: 4-byte UTF-8, combining marks, CJK —
# anything whose code-point vs byte vs UTF-16-unit length differ.
_ASTRAL = ("\U00010348\U0001d54f\U0001f984", "\U0001f600\U0001f30d", "é́x", "你好\U0001d11e")


def gen_hostile(spark: SparkSession) -> None:
    """Adversarial-domain sf1 variant (round-4 VERDICT task 3): same
    schemas and row counts as the sf1 tier, but every data-shape
    assumption the fixtures satisfy is deliberately violated —
    null-heavy join keys and FK orphans, NULL / empty /
    whitespace-only / astral-plane-unicode documents, heavy sort-key
    ties, boundary dates at filter edges, same-timestamp event bursts,
    zero-norm and duplicate embeddings.  Hostility is WELL-POSED: every
    declared query stays deterministic on this data (per-user event
    times stay unique, PK tiebreaks stay unique), so the full
    driver_sim hash sweep must still exit 0 — all five at-volume
    defect classes round 3 caught were data-shape assumptions, and
    this tier is the standing trap for the rest of that class."""
    os.makedirs(OUT_HOSTILE, exist_ok=True)
    for t in ("nation", "region"):
        spark.read.parquet(f"/root/testdata/sf0.1/{t}.parquet").coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{OUT_HOSTILE}/{t}.parquet")

    astral = F.array(*[F.lit(a) for a in _ASTRAL])

    def pick_astral(col, salt):
        return F.element_at(astral, (_u(col, salt, len(_ASTRAL)) + 1).cast("int"))

    s_key = F.col("s_suppkey")
    s = _ids(spark, N["supplier"], "s_suppkey").select(
        s_key,
        # ~3% unicode names (astral + quotes + newline) — string funcs,
        # CSV round-trips and join-side display columns must not care
        F.when(
            _u(s_key, "su?", 100) < 3,
            F.concat(F.lit('Sup "q"\n'), pick_astral(s_key, "sua"), s_key.cast("string")),
        )
        .otherwise(F.concat(F.lit("Supplier#"), s_key))
        .alias("s_name"),
        _u(s_key, "sn", 25).cast("int").alias("s_nationkey"),
        # ~2% NULL balances; the rest full-range incl. negative extremes
        F.when(_u(s_key, "sb?", 100) < 2, F.lit(None).cast("double"))
        .otherwise((_u(s_key, "sb", 2_000_000) - 1_000_000) / 100.0)
        .alias("s_acctbal"),
    )
    s.write.mode("overwrite").parquet(f"{OUT_HOSTILE}/supplier.parquet")

    c_key = F.col("c_custkey")
    c = _ids(spark, N["customer"], "c_custkey").select(
        c_key,
        F.when(
            _u(c_key, "cu?", 100) < 3,
            F.concat(F.lit('Cust,"x"\t'), pick_astral(c_key, "cua"), c_key.cast("string")),
        )
        .otherwise(F.concat(F.lit("Customer#"), c_key))
        .alias("c_name"),
        _u(c_key, "cn", 25).cast("int").alias("c_nationkey"),
        # ~2% NULL acctbal — nullable RANKING keys (o4/c3/c10 order by
        # acctbal): engines must agree on null placement explicitly
        F.when(_u(c_key, "cb?", 100) < 2, F.lit(None).cast("double"))
        .otherwise((_u(c_key, "cb", 2_000_000) - 1_000_000) / 100.0)
        .alias("c_acctbal"),
        F.element_at(
            F.array(*[F.lit(x) for x in ("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")]),
            (_u(c_key, "cm", 5) + 1).cast("int"),
        ).alias("c_mktsegment"),
    )
    c.write.mode("overwrite").parquet(f"{OUT_HOSTILE}/customer.parquet")

    adjs = F.array(*[F.lit(x) for x in ("small", "red", "blue", "hot", "big", "green", "cold", "dim")])
    nouns = F.array(*[F.lit(x) for x in ("ring", "widget", "bolt", "gear", "gizmo", "cog", "plate", "washer")])
    p_key = F.col("p_partkey")
    p = _ids(spark, N["part"], "p_partkey").select(
        p_key,
        F.concat_ws(
            " ",
            F.element_at(adjs, (_u(p_key, "pa", 8) + 1).cast("int")),
            F.element_at(nouns, (_u(p_key, "pn", 8) + 1).cast("int")),
        ).alias("p_name"),
        F.concat(F.lit("Brand#"), _u(p_key, "pb", 25) + 1).alias("p_brand"),
        F.element_at(
            F.array(*[F.lit(x) for x in ("ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD")]),
            (_u(p_key, "pt", 6) + 1).cast("int"),
        ).alias("p_type"),
        (_u(p_key, "ps", 50) + 1).cast("int").alias("p_size"),
        (900.0 + _u(p_key, "pr", 100_000) / 100.0).alias("p_retailprice"),
    )
    p.write.mode("overwrite").parquet(f"{OUT_HOSTILE}/part.parquet")

    base_ts = F.to_timestamp(F.lit("1995-01-01 00:00:00"))
    o_key = F.col("o_orderkey")
    # ~20% of orders share one of 50 prices → giant rank-tie groups
    # (range-partition bounds land INSIDE tie runs; the PK tiebreak
    # must carry the total order)
    tied_price = 1000.0 + _u(o_key, "opt", 50).cast("double")
    # ~5% boundary dates: first/last day of the domain, and the day
    # BEFORE c13/c17-style date-fence edges at 23:59:59
    day = F.when(_u(o_key, "od?", 100) < 3, F.lit(0)).when(
        _u(o_key, "od?", 100) < 5, F.lit(2399)
    ).otherwise(_u(o_key, "od", 2400))
    ts = F.timestamp_add("DAY", day.cast("int"), base_ts)
    ts = F.when(
        _u(o_key, "oh?", 100) < 5, F.timestamp_add("SECOND", F.lit(86_399), ts)
    ).otherwise(ts)
    o = _ids(spark, N["orders"], "o_orderkey").select(
        o_key,
        # ~1% NULL FK, ~2% dangling FK (no such customer) — equi-joins
        # must drop them, outer joins must surface them, on both engines
        F.when(_u(o_key, "oc?", 100) < 1, F.lit(None).cast("long"))
        .when(_u(o_key, "oc?", 100) < 3, N["customer"] + _u(o_key, "ocd", 1000))
        .otherwise(_u(o_key, "oc", N["customer"]))
        .alias("o_custkey"),
        F.element_at(
            F.array(F.lit("O"), F.lit("F"), F.lit("P")),
            (_u(o_key, "os", 3) + 1).cast("int"),
        ).alias("o_orderstatus"),
        F.when(_u(o_key, "op?", 100) < 20, tied_price)
        .otherwise(1000.0 + _u(o_key, "op", 40_000_000) / 100.0)
        .alias("o_totalprice"),
        ts.alias("o_orderdate"),
        F.element_at(
            F.array(*[F.lit(x) for x in ("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")]),
            (_u(o_key, "opr", 5) + 1).cast("int"),
        ).alias("o_orderpriority"),
    )
    o.write.mode("overwrite").parquet(f"{OUT_HOSTILE}/orders.parquet")

    rid = F.col("rid")
    li = _ids(spark, N["lineitem"], "rid").select(
        # ~2% orphan order FKs (aggregate-then-join shapes must not
        # resurrect them), spread over a WIDE key range: a narrow range
        # (first cut: 1000 keys) packed ~120 lines per phantom order,
        # whose per-order supplier cliques made the m11 co-supply graph
        # pathologically dense (C(120,2) edges × 1000 keys) — the
        # hostility target is dangling-FK semantics, not graph density.
        F.when(_u(rid, "lo?", 100) < 2, N["orders"] + _u(rid, "lod", 1_000_000))
        .otherwise(F.col("rid") % N["orders"])
        .alias("l_orderkey"),
        # ~1% NULL part / supplier FKs — null group keys and null join
        # keys in the SAME fact the composites aggregate
        F.when(_u(rid, "lp?", 100) < 1, F.lit(None).cast("long"))
        .otherwise(_u(rid, "lp", N["part"]))
        .alias("l_partkey"),
        F.when(_u(rid, "ls?", 100) < 1, F.lit(None).cast("long"))
        .otherwise(_u(rid, "ls", N["supplier"]))
        .alias("l_suppkey"),
        (F.col("rid") / N["orders"]).cast("int").alias("l_linenumber"),
        # quantity mass at the 1/50 envelope edges (c19 brackets, c6
        # small-qty filters sit exactly on these)
        F.when(_u(rid, "lq?", 100) < 10, F.lit(1.0))
        .when(_u(rid, "lq?", 100) < 20, F.lit(50.0))
        .otherwise(1.0 + _u(rid, "lq", 50))
        .alias("l_quantity"),
        (900.0 + _u(rid, "le", 10_000_000) / 100.0).alias("l_extendedprice"),
        # discount mass at 0 and the 0.10 fence
        F.when(_u(rid, "ld?", 100) < 10, F.lit(0.0))
        .when(_u(rid, "ld?", 100) < 20, F.lit(0.1))
        .otherwise(_u(rid, "ld", 11) / 100.0)
        .alias("l_discount"),
        (_u(rid, "lt", 9) / 100.0).alias("l_tax"),
        F.element_at(
            F.array(F.lit("A"), F.lit("N"), F.lit("R")),
            (_u(rid, "lr", 3) + 1).cast("int"),
        ).alias("l_returnflag"),
        F.element_at(
            F.array(F.lit("F"), F.lit("O")),
            (_u(rid, "ll", 2) + 1).cast("int"),
        ).alias("l_linestatus"),
        F.timestamp_add("DAY", (_u(rid, "lsd", 2500)).cast("int"), base_ts).alias("l_shipdate"),
    )
    li.write.mode("overwrite").parquet(f"{OUT_HOSTILE}/lineitem.parquet")

    # Events keep the append-ordered-log CONTRACT (monotone in
    # event_id) but with bursts and famines: every 20th run of 50
    # events collapses onto ONE timestamp (watermark/window/session
    # edges see mass ties — users within a run stay distinct, so
    # per-user orderings remain total), and runs are separated by
    # multi-hour gaps every ~1000 events (session splits, empty
    # windows).  Some burst timestamps land EXACTLY on hour boundaries.
    e_key = F.col("event_id")
    run = (e_key / 50).cast("long")
    is_burst = F.pmod(run, F.lit(20)) == 0
    gap_bonus = (e_key / 1000).cast("long") * 14_400  # 4h famine per 1000 events
    base_sec = run * 1800 + gap_bonus  # runs 30 min apart → on-the-hour edges
    sec = F.when(is_burst, base_sec).otherwise(base_sec + F.pmod(e_key, F.lit(50)) * 13 + 1)
    ev = _ids(spark, N["events"], "event_id").select(
        e_key,
        F.timestamp_add("SECOND", sec.cast("int"), base_ts).alias("ts"),
        # burst rows cycle users deterministically (distinct within a
        # run); others hash-uniform
        F.when(is_burst, F.pmod(e_key, F.lit(1500)))
        .otherwise(_u(e_key, "eu", 1500))
        .alias("user_id"),
        F.element_at(
            F.array(*[F.lit(x) for x in ("click", "purchase", "error", "signup", "view")]),
            (_u(e_key, "ee", 5) + 1).cast("int"),
        ).alias("event_type"),
        # value mass at 0.00 (sum/avg over all-zero windows) plus range
        F.when(_u(e_key, "ev?", 100) < 10, F.lit(0.0))
        .otherwise(_u(e_key, "ev", 10_000) / 100.0)
        .alias("value"),
        # valid-but-hostile JSON: escaped quote + astral char in a value
        F.concat(
            F.lit('{"k":'), _u(e_key, "ep", 100), F.lit(',"s":"a\\"'),
            pick_astral(e_key, "epa"), F.lit('"}'),
        ).alias("props"),
    )
    ev.write.mode("overwrite").parquet(f"{OUT_HOSTILE}/events.parquet")
    import glob as _glob
    import time as _time

    files = sorted(_glob.glob(f"{OUT_HOSTILE}/events.parquet/part-*"))
    t0 = _time.time() - 2 * len(files)
    for i, f in enumerate(files):
        os.utime(f, (t0 + 2 * i, t0 + 2 * i))

    # Documents: the sf1 corpus text, then hostile rewrites —
    # NULL text (~1%), empty (~2%), whitespace-only incl. NBSP (~2%),
    # astral-unicode token injection (~3%), newline/quote/regex-meta
    # injection (~2%).  n_chars is recomputed AFTER mutation (the
    # n_chars = length(text) fixture contract must keep holding).
    text = _doc_text_expr()
    d_key = F.col("doc_id")
    sel = _u(d_key, "dh?", 100)
    text = (
        F.when(sel < 1, F.lit(None).cast("string"))
        .when(sel < 3, F.lit(""))
        .when(sel < 5, F.element_at(
            F.array(F.lit(" "), F.lit("\t\t"), F.lit(" \n \n "), F.lit("  ")),
            (_u(d_key, "dws", 4) + 1).cast("int"),
        ))
        .when(sel < 8, F.concat(text, F.lit(" "), pick_astral(d_key, "dua")))
        .when(sel < 10, F.concat(F.lit('q"uo\\te (a+b)*[c] '), text, F.lit("\nline2")))
        .otherwise(text)
    )
    d = _ids(spark, N["documents"], "doc_id").select(
        d_key,
        text.alias("text"),
        F.element_at(
            F.array(*[F.lit(x) for x in ("en", "fr", "es", "de", "zh")]),
            (_u(d_key, "dl", 5) + 1).cast("int"),
        ).alias("lang"),
        F.concat(F.lit("src"), _u(d_key, "ds", 20)).alias("source"),
    )
    d = d.withColumn("n_chars", F.length("text").cast("long"))
    d.write.mode("overwrite").parquet(f"{OUT_HOSTILE}/documents.parquet")

    # Embeddings: ~1% all-zero vectors (cosine must not divide by
    # zero), ~1% exact duplicates of vector 0 (ties in similarity),
    # the rest full-range.
    v_key = F.col("vec_id")
    base_vec_id = F.when(_u(v_key, "ed?", 100) < 1, F.lit(0)).otherwise(v_key)
    comp = lambda j: (  # noqa: E731
        (
            F.pmod(
                F.crc32(F.concat(base_vec_id.cast("string"), F.lit("|"), j.cast("string"))),
                F.lit(20_001),
            )
            - 10_000
        )
        / 10_000.0
    ).cast("float")
    vec = F.transform(F.sequence(F.lit(0), F.lit(63)), comp)
    zero_vec = F.transform(F.sequence(F.lit(0), F.lit(63)), lambda j: F.lit(0.0).cast("float"))
    emb = _ids(spark, N["embeddings"], "vec_id").select(
        v_key,
        F.when(_u(v_key, "ez?", 100) < 1, zero_vec).otherwise(vec).alias("embedding"),
        _u(v_key, "el", 200).cast("int").alias("label"),
    )
    emb.write.mode("overwrite").parquet(f"{OUT_HOSTILE}/embeddings.parquet")


if __name__ == "__main__":
    spark = get_spark(app_name="pmr-make-scale-data")
    spark.sparkContext.setLogLevel("ERROR")
    if "--skew" in sys.argv:
        gen_skew(spark)
        print(f"wrote {OUT_SKEW}")
        raise SystemExit(0)
    if "--hostile" in sys.argv:
        gen_hostile(spark)
        print(f"wrote {OUT_HOSTILE}")
        raise SystemExit(0)
    gen(spark)
    import glob

    import pyarrow.parquet as pq

    for t in sorted(list(N) + ["nation", "region"]):
        files = glob.glob(f"{OUT}/{t}.parquet/*.parquet")
        rows = sum(pq.read_metadata(f).num_rows for f in files)
        print(f"{t}: {rows} rows, {len(files)} files")
