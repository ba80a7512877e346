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
    text = F.concat_ws(" ", tokens)
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
    """Skewed sf1 variant (VERDICT r2 item 5): same orders table, but
    lineitem's l_orderkey FK is zipf-skewed.  Only the two join tables
    are written — this tier exists for scripts/skew_stress.py, not for
    the oracle sweep (values are join-semantics-identical; only the
    key DISTRIBUTION changes)."""
    os.makedirs(OUT_SKEW, exist_ok=True)
    spark.read.parquet(f"{OUT}/orders.parquet").write.mode("overwrite").parquet(
        f"{OUT_SKEW}/orders.parquet"
    )
    rid = F.col("rid")
    is_hot = _u(rid, "hot?", 10_000) < int(HOT_FRAC * 10_000)
    okey = F.when(is_hot, _u(rid, "hotk", HOT_KEYS)).otherwise(
        _u(rid, "coldk", N["orders"])
    )
    li = _ids(spark, N["lineitem"], "rid").select(
        okey.alias("l_orderkey"),
        (900.0 + _u(rid, "le", 10_000_000) / 100.0).alias("l_extendedprice"),
        (1.0 + _u(rid, "lq", 50)).alias("l_quantity"),
    )
    li.write.mode("overwrite").parquet(f"{OUT_SKEW}/lineitem.parquet")


if __name__ == "__main__":
    spark = get_spark(app_name="pmr-make-scale-data")
    spark.sparkContext.setLogLevel("ERROR")
    if "--skew" in sys.argv:
        gen_skew(spark)
        print(f"wrote {OUT_SKEW}")
        raise SystemExit(0)
    gen(spark)
    import glob

    import pyarrow.parquet as pq

    for t in sorted(list(N) + ["nation", "region"]):
        files = glob.glob(f"{OUT}/{t}.parquet/*.parquet")
        rows = sum(pq.read_metadata(f).num_rows for f in files)
        print(f"{t}: {rows} rows, {len(files)} files")
