"""Count–min sketch (SURVEY.md §2.4 A12): mergeable frequency sketch
for heavy-hitter estimation over unbounded key cardinality.

The 100 TB problem this solves: exact per-token counts over a web-scale
corpus shuffle the full vocabulary (billions of keys).  A count–min
sketch is a fixed d×w grid of counters — each partition builds its
grid map-side, grids merge by cell-wise addition (Spark's partial
aggregation does this automatically for `groupBy(j, bucket).count()`),
and the shuffle carries at most tasks × d × w cells no matter how many
distinct tokens exist.  Estimates are upper bounds: for token t,
``est(t) = min_j cells[j][bucket_j(t)] ≥ true(t)``, with overshoot
≤ 2N/w at confidence 1 − (1/2)^d (Cormode & Muthukrishnan 2005 —
public algorithm).

Determinism contract: the hash family must be reproducible across
engines so the declared query carries a full SQL oracle.  Tokens are
hashed with a polynomial-rolling hash over code points (exact bigint
arithmetic, verified identical in Spark and DuckDB including unicode),
then spread over rows j by the same multiplicative family as
operators/pipeline.py — no murmur/xxhash, whose constants differ
between engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from projectmapreduce_spark.operators.pipeline import _M32

# Per-row salt spacing for the d hash functions (any odd-ish constant
# works; must match the oracle SQL literally).
_ROW_SALT = 1000003
# Spreading multiplier (MurmurHash2's M).  Must stay BELOW 2^31 so
# h * mult fits int64 for h < 2^32 (max product ≈ 6.6e18 < 2^63-1) —
# pipeline's 2654435761 would overflow Spark's ANSI bigint here, and
# DuckDB would silently widen to the never-matching HUGEINT.
_CMS_MULT = 1540483477


def poly_hash(col: Column | str) -> Column:
    """Polynomial rolling hash of a string → bigint in [0, 2^32).

    ``h = fold(chars, 0, (acc, c) -> (acc*31 + codepoint(c)) % 2^32)``
    — pure JVM-side higher-order functions (no Python), and exactly
    reproducible in DuckDB as
    ``list_reduce(list_prepend(0, list_transform(string_split(t,''),
    c -> ascii(c))), (acc,x) -> (acc*31+x) % 4294967296)``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.aggregate(
        F.transform(F.split(c, ""), lambda ch: F.ascii(ch).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: (acc * F.lit(31) + x) % F.lit(_M32),
    )


def cms_bucket(h: Column, j: Column | int, width: int) -> Column:
    """Row-j bucket for a pre-hashed key: ((h*K + j*S) % 2^32) % w."""
    jc = F.lit(j) if isinstance(j, int) else j
    return ((h * F.lit(_CMS_MULT) + jc * F.lit(_ROW_SALT)) % F.lit(_M32)) % F.lit(width)


def cms_build(keys: DataFrame, key_col: str, depth: int = 4, width: int = 1024) -> DataFrame:
    """Build the sketch from a (multiset) column of keys.

    Returns the d×w grid as rows ``(j, bucket, cell_count)``.  Each
    input key contributes one increment per row j; the
    ``groupBy(j, bucket)`` hash-aggregate does map-side partial sums,
    so the shuffle is bounded by tasks × d × w cells — never by key
    cardinality.  Grids from different corpora/partitions merge by
    cell-wise addition (union + re-aggregate), making the sketch
    incrementally maintainable.
    """
    h = poly_hash(key_col)
    return (
        keys.select(h.alias("h"))
        .select("h", F.explode(F.array(*[F.lit(j) for j in range(depth)])).alias("j"))
        .select("j", cms_bucket(F.col("h"), F.col("j"), width).alias("bucket"))
        .groupBy("j", "bucket")
        .agg(F.count(F.lit(1)).alias("cell_count"))
    )


# HLL finisher multipliers — both < 2^31 so h*mult fits int64 for
# h < 2^32 (same bound argument as _CMS_MULT above); values are the
# MurmurHash2 M and an odd 31-bit constant, chosen empirically for
# register uniformity on decimal-digit keys (see a4b docstring).
_HLL_MULT1 = 1540483477
_HLL_MULT2 = 1372812589


def hll_mix(h: Column) -> Column:
    """Murmur-style avalanche finisher over a 32-bit poly hash.

    ``poly_hash`` alone mixes decimal-digit keys poorly (low bits are
    nearly linear in the last digits), which biases HLL registers.
    Two multiply-mod-2^32 rounds with an xor-shift-16 between them
    restore uniformity (measured: 0.8–4.0% HLL error at m=512 across
    sf0.001–sf0.1, inside the 1.04/sqrt(m)=4.6% bound).  Every step is
    exact int64 arithmetic + bitwise ops, reproducible in DuckDB as
    ``(h * K) % 4294967296`` and ``xor(h, h >> 16)`` — no engine hash.
    """
    h = (h * F.lit(_HLL_MULT1)) % F.lit(_M32)
    h = h.bitwiseXOR(F.shiftright(h, 16))
    h = (h * F.lit(_HLL_MULT2)) % F.lit(_M32)
    return h.bitwiseXOR(F.shiftright(h, 16))


def hll_registers(
    keys: DataFrame, key_col: str, group_cols: list[str], p: int = 9
) -> DataFrame:
    """Engine-exact HyperLogLog registers per group (Flajolet et al.
    2007, public algorithm): bucket = low ``p`` hash bits, register =
    max leading-zero-count(+1) of the remaining ``32-p`` bits.

    Scale shape is identical to ``approx_count_distinct``'s: the
    ``groupBy(group, bucket).max`` does map-side partial max, so the
    shuffle carries at most tasks × groups × 2^p register rows no
    matter how many distinct keys exist, and register frames from
    different corpora merge by cell-wise MAX — the persistable,
    incrementally-maintainable distinct sketch (A13's story) with a
    cross-engine-exact hash family (A12's story).

    Leading-zero count avoids floating log2: smear the suffix's top
    bit downward (x |= x>>1 … x>>16), then ``bit_count`` of the smear
    is the bit length; rho = (32-p) - bit_length + 1.  A zero suffix
    smears to 0 → rho = 32-p+1, the standard convention.  Both engines
    have int64 ``bit_count``/``>>``/``|``, so registers hash-match
    cell for cell.
    """
    m = 1 << p
    h = hll_mix(poly_hash(F.col(key_col).cast("string")))
    # NULL keys are not distinct values (mirrors count(DISTINCT) and
    # approx_count_distinct): hash chains null-propagate DIFFERENTLY
    # across engines (a NULL key would land in a NULL register bucket
    # in Spark but vanish inside DuckDB's list_reduce), so they are
    # excluded explicitly on both sides — caught by the hostile-tier
    # sweep (NULL FK mass in orders).
    keys = keys.filter(F.col(key_col).isNotNull())
    split = keys.select(*group_cols, h.alias("__h")).select(
        *group_cols,
        (F.col("__h") % F.lit(m)).alias("bucket"),
        F.shiftright(F.col("__h"), p).alias("__suffix"),
    )
    s = F.col("__suffix")
    for k in (1, 2, 4, 8, 16):
        s = s.bitwiseOR(F.shiftright(s, k))
    rho = (F.lit(32 - p + 1) - F.bit_count(s)).cast("long")
    return (
        split.select(*group_cols, "bucket", rho.alias("rho"))
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rho").alias("reg"))
    )


def hll_estimate(regs: DataFrame, group_cols: list[str], p: int = 9) -> DataFrame:
    """Fold a register frame into per-group cardinality estimates.

    The indicator sum Z = Σ 2^-reg (+1 per never-hit bucket) is a sum
    of dyadic rationals spanning < 53 bit positions, so IEEE doubles
    represent every partial sum EXACTLY — summation order cannot
    change it, and ``z_sum`` hash-matches across engines unrounded.
    The raw estimate αm·m²/Z is two more IEEE ops on identical
    literals.  Only the small-range correction m·ln(m/V) touches libm
    (last-ulp engine skew), so callers round ``est_distinct`` — 4
    decimals kills a 1-ulp skew at any magnitude < 2^38.
    """
    m = 1 << p
    alpha_m2 = 0.7213 / (1.0 + 1.079 / float(m)) * float(m) * float(m)
    summ = regs.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.sum((F.col("bucket") + 1) * F.col("reg")).alias("reg_checksum"),
        F.sum(F.pow(F.lit(2.0), -F.col("reg"))).alias("__z_hit"),
    )
    summ = summ.withColumn("v_zero", F.lit(m).cast("long") - F.col("n_buckets"))
    summ = summ.withColumn("z_sum", F.col("__z_hit") + F.col("v_zero").cast("double"))
    e_raw = F.lit(alpha_m2) / F.col("z_sum")
    est = F.when(
        (e_raw <= F.lit(2.5 * m)) & (F.col("v_zero") > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / F.col("v_zero").cast("double")),
    ).otherwise(e_raw)
    return summ.select(
        *group_cols,
        "n_buckets",
        "v_zero",
        "reg_checksum",
        "z_sum",
        F.round(est, 4).alias("est_distinct"),
    )


def cms_estimate(
    probes: DataFrame, cells: DataFrame, key_col: str, depth: int = 4, width: int = 1024
) -> DataFrame:
    """Point-query the sketch: est(key) = min over rows j of the cell
    the key hashes to.  ``cells`` is at most d×w rows regardless of
    corpus size, so it is ALWAYS the broadcast side — probing never
    shuffles the probe set."""
    h = poly_hash(key_col)
    p = probes.withColumn("__h", h)
    cond = F.col("c.bucket") == cms_bucket(F.col("p.__h"), F.col("c.j"), width)
    return (
        p.alias("p")
        .join(F.broadcast(cells.alias("c")), cond)
        .groupBy(*[F.col(f"p.{x}") for x in probes.columns])
        .agg(F.min("c.cell_count").alias("est_count"))
    )


def histogram_quantiles(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    qs: tuple[float, ...] = (0.5, 0.99),
    buckets: int = 256,
) -> DataFrame:
    """Engine-exact mergeable quantile sketch: the two-pass fixed-width
    histogram (the classic distributed-quantile recipe when a
    deterministic, engine-portable answer matters — unlike KLL/GK
    summaries, whose compaction choices are engine-specific).

    Pass 1 computes per-group (min, max, n) — three mergeable scalars.
    Pass 2 buckets every value into ``buckets`` equal-width bins;
    bin counts are the sketch: fixed size, mergeable by cell-wise ADD
    across partitions/days (the same algebra as cms_build), shuffle
    bounded by groups × buckets at any input size.  The q-quantile is
    read off the cumulative histogram with linear interpolation inside
    the target bin — error ≤ bin width, i.e. (max−min)/buckets.

    Determinism contract: bucket index and the interpolation are pure
    IEEE arithmetic on identical literals (no libm), so results are
    bit-identical across engines; NULL values are excluded like every
    rank-based aggregate; a constant group (max == min) short-circuits
    to that constant.  Output: one row per (group, q) with the target
    bucket and the interpolated estimate.
    """
    v = F.col(value_col)
    vals = df.filter(v.isNotNull())
    mm = vals.groupBy(*group_cols).agg(
        F.min(v).alias("__mn"), F.max(v).alias("__mx"), F.count(F.lit(1)).alias("n_rows")
    )
    b = vals.join(F.broadcast(mm), group_cols)
    bkt = F.when(F.col("__mx") == F.col("__mn"), F.lit(0)).otherwise(
        F.least(
            F.floor((v - F.col("__mn")) / (F.col("__mx") - F.col("__mn")) * F.lit(buckets)).cast("int"),
            F.lit(buckets - 1),
        )
    )
    # Round-11 (guide §2.4): carry the pass-1 scalars through the bin
    # aggregation as (constant-per-group) grouping keys instead of
    # re-joining broadcast(mm) after it — the re-join made the plan
    # re-run pass 1's full scan a THIRD time (mm's lineage is lazy and
    # appeared once under the bucketing join and once under the
    # cumulative join).  Two scans — the algorithm's minimum — and one
    # exchange fewer; identical values.
    counts = (
        b.select(*group_cols, "__mn", "__mx", "n_rows", bkt.alias("bkt"))
        .groupBy(*group_cols, "__mn", "__mx", "n_rows", "bkt")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy(*group_cols).orderBy("bkt")
    cum = counts.withColumn("cume", F.sum("c").over(w))
    qd = cum.withColumn("q", F.explode(F.array(*[F.lit(float(q)) for q in qs])))
    target = F.ceil(F.col("q") * F.col("n_rows")).cast("double")
    picked = qd.filter(
        ((F.col("cume") - F.col("c")).cast("double") < target)
        & (target <= F.col("cume").cast("double"))
    )
    width = (F.col("__mx") - F.col("__mn")) / F.lit(float(buckets))
    frac = (target - (F.col("cume") - F.col("c")).cast("double")) / F.col("c").cast("double")
    est = F.when(F.col("__mx") == F.col("__mn"), F.col("__mn")).otherwise(
        F.col("__mn") + (F.col("bkt").cast("double") + frac) * width
    )
    return picked.select(
        *group_cols,
        "q",
        "n_rows",
        F.col("bkt").cast("long").alias("bkt"),
        F.round(est, 4).alias("est_value"),
    )


# ---------------------------------------------------------------------------
# KMV (k-minimum-values) distinct sketch — the theta-sketch family's
# primitive.  Unlike HLL registers (a4b/a13b), KMV sketches support SET
# ALGEBRA: the k smallest hashes of A ∪ B are computable from the two
# sketches alone, and the fraction of them present in BOTH sketches
# estimates Jaccard similarity — so intersection cardinalities (which
# HLL fundamentally cannot give) fall out.  Engine-exact by
# construction: the hash is the first 13 hex chars of md5() folded to a
# 52-bit integer, identically expressible in Spark (conv base-16) and
# DuckDB (list_reduce nibble fold), so every sketch value — and
# therefore every estimate — hash-matches the oracle bit-for-bit.
# ---------------------------------------------------------------------------

KMV_DOMAIN = float(1 << 52)  # hash domain size; 2^52 is double-exact


def md5_hash52(col: Column | str) -> Column:
    """First 13 hex chars (52 bits) of ``md5(cast(col as string))`` as
    a bigint.  13 nibbles keep the value ≤ 2^52, inside the range both
    engines' integer AND double arithmetic represent exactly — the
    property that makes KMV estimates cross-engine reproducible.
    DuckDB twin::

        list_reduce(list_transform(generate_series(1, 13),
          i -> CASE WHEN ascii(substr(md5(x::VARCHAR), i, 1)) BETWEEN 48 AND 57
               THEN ascii(substr(md5(x::VARCHAR), i, 1)) - 48
               ELSE ascii(substr(md5(x::VARCHAR), i, 1)) - 87 END::BIGINT),
          (acc, n) -> acc * 16 + n)
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c.cast("string")), 1, 13), 16, 10).cast("bigint")


def kmv_sketch(df: DataFrame, key_col: str, group_cols: list[str], k: int = 64) -> DataFrame:
    """Per-group KMV sketch: the ``k`` smallest DISTINCT 52-bit hashes
    of ``key_col`` (NULL keys excluded, mirroring count(DISTINCT)).

    Scale shape: one distinct on (group, h) — the same shuffle an
    exact count-distinct pays per group — then a per-group top-k via
    window row_number, which AQE executes as a partial sort; the
    sketch output is k rows per group regardless of input size, so
    everything downstream (union/intersect/estimate) is
    metadata-scale.  At 100 TB sketches are persisted per partition
    and merged by exactly the union-top-k this module exposes."""
    from pyspark.sql.window import Window

    h = (
        df.filter(F.col(key_col).isNotNull())
        .select(*group_cols, md5_hash52(key_col).alias("h"))
        .distinct()
    )
    w = Window.partitionBy(*group_cols).orderBy("h")
    return h.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k).drop("rn")


def kmv_estimate(sketch: DataFrame, group_cols: list[str], k: int = 64) -> DataFrame:
    """Distinct-count estimate per group from a KMV sketch: exact when
    the group holds fewer than k distinct hashes, else the classic
    (k-1) / U_(k) estimator with U_(k) = kth_min / 2^52."""
    agg = sketch.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_hashes"), F.max("h").alias("kth_min")
    )
    exact = F.col("n_hashes").cast("double")
    est = F.lit(float(k - 1)) * F.lit(KMV_DOMAIN) / F.col("kth_min").cast("double")
    return agg.withColumn(
        "est", F.round(F.when(F.col("n_hashes") < k, exact).otherwise(est), 2)
    )
