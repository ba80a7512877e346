"""Similarity search over embedding columns (SURVEY.md §2.11 L3/L4).

All vector math is JVM-side higher-order array functions (zip_with +
aggregate) in double precision — no Python, no UDF, whole-stage
codegen.  Two tiers:

- ``cosine_pairs`` / ``brute_force_topk`` — exact, O(Q·N); correct at
  any recall but only affordable when one side is small (it is
  broadcast).  This is the baseline and the oracle-checkable form.
- ``lsh_ann_topk`` — random-hyperplane LSH bucketing: sign-bit
  signature per vector, candidates = same bucket (plus optional
  1-bit-flip probes), exact re-rank inside the bucket.  O(N) signing +
  equi-join — the 100 TB path.  Planes are derived deterministically
  from a seed via crc32, so signatures are reproducible across runs
  and engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from projectmapreduce_spark.io import fan_out


def as_double(col) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def dot(a, b, dim: int | None = None) -> Column:
    """Sequential-order double dot product (bit-stable across engines).

    With ``dim`` statically known the sum is unrolled into a flat
    left-fold expression ``((0 + a0·b0) + a1·b1) + …`` — identical
    float semantics to the ``aggregate`` fold, but whole-stage
    codegen-able (Spark interprets higher-order functions per element).
    Caveat measured at sf0.1: the ~200-term generated function costs
    ~2 s of janino compilation per fresh plan, so unrolling only pays
    on long-running jobs (100 TB) where compile time amortizes; the
    default interpreted fold is faster for short interactive queries.
    """
    if dim is None:
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
        )
    acc: Column = F.lit(0.0)
    for i in range(dim):
        acc = acc + a[i].cast("double") * b[i].cast("double")
    return acc


def norm(a, dim: int | None = None) -> Column:
    return F.sqrt(dot(a, a, dim))


def cosine(a, b, dim: int | None = None) -> Column:
    return dot(a, b, dim) / (norm(a, dim) * norm(b, dim))


def quantize_int8(emb: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """L27: symmetric per-vector int8 quantization — the 4× storage /
    bandwidth cut a 100 TB embedding store takes before ANN serving.

    Per vector: ``scale = max(|v|)/127``; ``q_i = clamp(floor(v_i/scale
    + 0.5), -127, 127)``.  ``floor(x + 0.5)`` (not ``round``) because
    the two engines disagree on round-half semantics while ``floor`` is
    IEEE-exact in both — quantized codes are therefore integer-exact
    and any downstream int dot product is bit-reproducible everywhere.
    All-zero vectors map to all-zero codes (scale 0 guard).

    Returns ``emb``'s columns plus ``scale`` (double) and ``qvec``
    (array<int> in [-127, 127]).  Zero shuffle — pure projection.
    """
    v = as_double(F.col(vec_col))
    scale = (F.array_max(F.transform(v, F.abs)) / F.lit(127.0)).alias("scale")
    q = F.when(F.col("scale") == 0.0, F.transform(v, lambda x: F.lit(0))).otherwise(
        F.transform(
            v,
            lambda x: F.greatest(
                F.lit(-127),
                F.least(F.lit(127), F.floor(x / F.col("scale") + F.lit(0.5)).cast("int")),
            ),
        )
    )
    return emb.withColumn("scale", scale).withColumn("qvec", q)


def int_dot(a, b) -> Column:
    """Exact integer dot product of two int code vectors (bigint)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("bigint") * y.cast("bigint")),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )


def normalized(emb: DataFrame, id_col: str, vec_col: str, dim: int | None = None) -> DataFrame:
    """All columns of ``emb`` plus ``vn`` = unit-normalized double vector
    (computed once per vector — prerequisite for dot-only cosine).

    ZERO-NORM vectors are EXCLUDED: they have no direction, so cosine
    against them is undefined (and ANSI mode rightly refuses the 0/0
    — caught by the hostile-domain sweep's zero embeddings).  Every
    similarity operator in this module shares that exclusion policy,
    and the SQL oracles mirror it with a ``dot(v, v) > 0`` guard."""
    v = as_double(F.col(vec_col))
    norm_in = v if dim is None else F.col(vec_col)
    return (
        emb.withColumn("__n", norm(norm_in, dim))
        .filter(F.col("__n") > 0)
        .withColumn("vn", F.transform(v, lambda x: x / F.col("__n")))
        .drop("__n")
    )


def cosine_pairs(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float,
    block_col: str | None = None,
    dim: int | None = None,
) -> DataFrame:
    """All (blocked) pairs with cosine ≥ threshold.

    ``block_col`` (e.g. a label, an LSH bucket, a shard key) turns the
    cross join into an equi-join — mandatory at scale; None is the
    small-N exact mode.
    """
    # Compute each vector's norm ONCE before the join and carry it as a
    # scalar; per PAIR the cosine is then Σ (aᵢ/‖a‖)·(bᵢ/‖b‖) — the
    # exact same float ops as normalize-then-dot (and as the DuckDB
    # oracle's list_transform + list_dot_product), but with no
    # intermediate normalized array to rebuild on the pair side.
    # dim=None: norm over the DOUBLE-cast array — zip_with on the raw
    # float32 column would multiply in float32 and diverge from the
    # all-double oracle in the last ulp (caught by the sf0.001 sweep).
    # The unrolled path casts per element inside dot() already.
    norm_in = as_double(F.col(vec_col)) if dim is None else F.col(vec_col)
    # zero-norm vectors excluded (no direction — see `normalized`)
    unit = fan_out(emb).withColumn("__n", norm(norm_in, dim)).filter(F.col("__n") > 0)
    a = unit.select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("va"),
        F.col("__n").alias("na"),
        *( [F.col(block_col).alias("blk")] if block_col else [] ),
    )
    b = unit.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("vb"),
        F.col("__n").alias("nb"),
        *( [F.col(block_col).alias("blk")] if block_col else [] ),
    )
    if dim is None:
        sim = dot(
            F.transform(F.col("va"), lambda x: x.cast("double") / F.col("na")),
            F.transform(F.col("vb"), lambda x: x.cast("double") / F.col("nb")),
        )
    else:
        acc: Column = F.lit(0.0)
        for i in range(dim):
            acc = acc + (F.col("va")[i].cast("double") / F.col("na")) * (
                F.col("vb")[i].cast("double") / F.col("nb")
            )
        sim = acc
    j = a.join(b, on="blk") if block_col else a.crossJoin(b)
    return (
        j.filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", sim.alias("cos_sim"))
        .filter(F.col("cos_sim") >= threshold)
    )


def brute_force_topk(
    emb: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    q_id_col: str,
    q_vec_col: str,
    k: int,
    dim: int | None = None,
) -> DataFrame:
    """Exact top-k neighbors per query vector.

    The query side is broadcast (queries are few by construction), so
    the big side streams once with no shuffle; the per-query rank is a
    window on q_id — shuffle bounded by Q·N candidate rows.  Output:
    (q_id, neighbor_id, cos_sim, nn_rank).
    """
    # Raw (un-cast) vectors through the join: the unrolled dot casts
    # per element, so no array-valued `transform` ever sits under a
    # getItem (projection collapse would re-evaluate it per element —
    # O(dim²) interpreted work per pair).
    cast_side = (lambda c: F.col(c)) if dim is not None else (lambda c: as_double(F.col(c)))
    # zero-norm vectors excluded on BOTH sides (see `normalized`)
    q = queries.select(F.col(q_id_col).alias("q_id"), cast_side(q_vec_col).alias("qv")).filter(
        norm(F.col("qv"), dim) > 0
    )
    n = fan_out(emb).select(
        F.col(id_col).alias("neighbor_id"), cast_side(vec_col).alias("nv")
    ).filter(norm(F.col("nv"), dim) > 0)
    scored = (
        n.crossJoin(F.broadcast(q))
        .filter(F.col("q_id") != F.col("neighbor_id"))
        .select("q_id", "neighbor_id", cosine(F.col("qv"), F.col("nv"), dim).alias("cos_sim"))
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id"))
    return scored.select(
        "q_id", "neighbor_id", "cos_sim", F.row_number().over(w).alias("nn_rank")
    ).filter(F.col("nn_rank") <= k)


def lsh_bucket(vec_col, dim: int, n_planes: int = 12, seed: int = 7) -> Column:
    """Random-hyperplane signature: bit p = sign(v · plane_p).

    Plane coefficients are literal arrays (coefficient (p,d) =
    crc32(f"{seed}:{p}:{d}") mapped to [−1,1) — engine-stable, no RNG
    state); signing is O(vectors), never the hot path, so the
    interpreted higher-order eval is fine.
    """
    import zlib

    def coeff(p: int, d: int) -> float:
        return (zlib.crc32(f"{seed}:{p}:{d}".encode()) % 100_000) / 50_000.0 - 1.0

    v = as_double(vec_col)
    planes = F.array(*[
        F.array(*[F.lit(coeff(p, d)) for d in range(dim)]) for p in range(n_planes)
    ])
    bits = F.transform(planes, lambda pl: F.when(dot(v, pl) > 0, F.lit(1)).otherwise(F.lit(0)))
    return F.aggregate(
        bits, F.lit(0).cast("long"), lambda acc, bit: acc * 2 + bit
    ).alias("bucket")


def lsh_ann_topk(
    emb: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    q_id_col: str,
    q_vec_col: str,
    k: int,
    dim: int = 64,
    n_planes: int = 8,
    seed: int = 7,
    multiprobe: bool = True,
    n_tables: int = 1,
) -> DataFrame:
    """Approximate top-k: bucket both sides by hyperplane signature,
    equi-join on bucket, exact cosine re-rank inside the bucket.

    ``multiprobe`` additionally probes, per query, every bucket at
    Hamming distance 1 from its own (flip each of the n_planes sign
    bits) — (1+n_planes)× the candidate volume for a large recall gain
    on borderline vectors that straddle a hyperplane.

    ``n_tables`` is standard OR-amplification [Indyk & Motwani 1998]:
    T independent signatures (seeds ``seed..seed+T-1``), candidates =
    union over tables, so a true neighbor with per-table collision
    probability p^b is missed only with probability (1-p^b)^T.  This is
    the knob that rescues recall on weakly-correlated neighbors (the
    bench fixture's true top-5 sit at cos ≈ 0.35, i.e. per-plane
    agreement p ≈ 0.62, where one table of 6 planes collides on only
    ~6% of true neighbors).  Cost: the corpus-side index is written T×
    (exactly a T-hash-table LSH index); candidates are deduped on
    (q_id, neighbor_id) before the exact re-rank so each pair is scored
    once.

    Recall < 1 by design (measured in tests/test_operators.py and at
    bench scale by scripts/ann_recall.py against ``brute_force_topk``).
    At 100 TB the bucket join replaces the O(Q·N) scan with
    O(Q·N·T·(1+planes)/2^planes) expected comparisons; only the (small)
    query side is expanded, then broadcast.
    """
    # zero-norm vectors excluded on both sides (see `normalized`)
    emb = emb.filter(norm(as_double(F.col(vec_col))) > 0)
    queries = queries.filter(norm(as_double(F.col(q_vec_col))) > 0)

    def tables(vec, make_row):
        per_table = [
            make_row(t, lsh_bucket(vec, dim, n_planes, seed + t)) for t in range(n_tables)
        ]
        return F.explode(F.array(*per_table))

    n = fan_out(emb).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("nv"),
        tables(
            F.col(vec_col),
            lambda t, b: F.struct(F.lit(t).alias("table"), b.alias("bucket")),
        ).alias("tb"),
    ).select("neighbor_id", "nv", "tb.table", "tb.bucket")
    probe_rows = (
        (lambda t, b: F.array(
            F.struct(F.lit(t).alias("table"), b.alias("bucket")),
            *[
                F.struct(
                    F.lit(t).alias("table"),
                    b.bitwiseXOR(F.lit(1 << p)).alias("bucket"),
                )
                for p in range(n_planes)
            ],
        ))
        if multiprobe
        else (lambda t, b: F.array(F.struct(F.lit(t).alias("table"), b.alias("bucket"))))
    )
    q = queries.select(
        F.col(q_id_col).alias("q_id"),
        F.col(q_vec_col).alias("qv"),
        F.explode(
            F.flatten(
                F.array(*[
                    probe_rows(t, lsh_bucket(F.col(q_vec_col), dim, n_planes, seed + t))
                    for t in range(n_tables)
                ])
            )
        ).alias("tb"),
    ).select("q_id", "qv", "tb.table", "tb.bucket")
    candidates = (
        n.join(F.broadcast(q), on=["table", "bucket"])
        .filter(F.col("q_id") != F.col("neighbor_id"))
        .select("q_id", "neighbor_id", "qv", "nv")
    )
    if n_tables > 1 or multiprobe:
        # Same pair can collide in several tables/probes — score once.
        candidates = candidates.dropDuplicates(["q_id", "neighbor_id"])
    scored = candidates.select(
        "q_id",
        "neighbor_id",
        cosine(as_double(F.col("qv")), as_double(F.col("nv"))).alias("cos_sim"),
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id"))
    return scored.select(
        "q_id", "neighbor_id", "cos_sim", F.row_number().over(w).alias("nn_rank")
    ).filter(F.col("nn_rank") <= k)


def _centroid_scores_sql(vec_sql: str, cents: list[list[float]]) -> str:
    """SQL for array<struct<s,c>> of per-centroid scores v·c − ‖c‖²/2
    (argmax of which ⇔ argmin euclidean distance).  Built as ONE SQL
    string — k×dim literals via column-by-column Py4J construction was
    the plan-build bottleneck (~1000 round trips per assignment).

    Round 12 (guide §1.2 step 2): the k inlined
    ``named_struct(aggregate(zip_with(v, array(...)...)))`` copies are
    now ONE ``transform`` over a k×dim array literal with the offsets
    in a parallel k-array literal — the expression tree shrinks ~k×
    (32 zip_with/aggregate subtree copies → 1), which is what Catalyst
    analyzes, codegen compiles, and the interpreted HOF evaluator
    walks per row.  The arithmetic is element-for-element identical:
    the same zip_with/aggregate left fold per centroid, minus the same
    literal offset (``element_at`` of a literal array IS the literal),
    with the same (s, c) struct ordering under ``array_max`` — so
    every assignment and probe ranking is bit-identical."""
    cents_arr = (
        "array("
        + ",".join("array(" + ",".join(f"{x!r}D" for x in c) + ")" for c in cents)
        + ")"
    )
    offs_arr = (
        "array("
        + ",".join(f"{sum(x * x for x in c) / 2.0!r}D" for c in cents)
        + ")"
    )
    return (
        f"transform({cents_arr}, (c, i) -> named_struct("
        f"'s', aggregate(zip_with({vec_sql}, c, (x,y)->x*y), 0.0D, (a,x)->a+x)"
        f" - element_at({offs_arr}, i + 1), 'c', i))"
    )


def _nearest_centroid(vec_sql: str, cents: list[list[float]]) -> Column:
    """argmin_c ‖v − c‖² ; ``vec_sql`` is a SQL expression for an
    array<double> vector (e.g. "cast(embedding as array<double>)")."""
    return F.expr(f"array_max({_centroid_scores_sql(vec_sql, cents)}).c")


def _fit_sample(emb: DataFrame, id_col: str, vec_col: str, cap: int):
    """Deterministic bounded quantizer-training sample, as an
    id-sorted float64 numpy matrix.

    ONE map-only corpus pass: each partition keeps its top-``cap``
    rows by a hash PRF of the id (TakeOrderedAndProject — per-partition
    heap, driver merge), so training cost is one scan REGARDLESS of
    the iteration count — the faiss training contract, vs the previous
    design's full assignment pass per Lloyd iteration.  The PRF key is
    value-based (xxhash64 of the id, id tie-break), so the sample —
    and every centroid derived from it — is partition-layout-
    independent; the driver-side id sort fixes float summation order,
    making the fit bit-deterministic across masters.  Determinism
    assumes UNIQUE ids (the id tie-break is only total then); null
    vectors are filtered here (mirroring callers' norm>0 guard) and
    non-finite components refuse loudly — a NaN/Inf that reached the
    codebook would otherwise render as 'nanD' in serving SQL and die
    with an opaque parse error far from the cause.
    """
    import numpy as np

    rows = (
        emb.select(
            F.col(id_col).alias("__id"), as_double(F.col(vec_col)).alias("__v")
        )
        .filter(F.col("__v").isNotNull())
        .orderBy(F.pmod(F.xxhash64(F.col("__id")), F.lit(2**31)), F.col("__id"))
        .limit(cap)
        .collect()
    )
    rows.sort(key=lambda r: r["__id"])
    mat = np.array([[float(x) for x in r["__v"]] for r in rows], dtype=np.float64)
    if mat.size and not np.isfinite(mat).all():
        bad = int(np.where(~np.isfinite(mat).all(axis=1))[0][0])
        raise ValueError(
            f"non-finite embedding component in quantizer training sample "
            f"(id={rows[bad]['__id']!r}) — clean or filter the vector column "
            f"before fitting"
        )
    return mat


def _lloyd(vecs, k: int, iters: int):
    """Driver-side Lloyd's k-means over the (bounded) training sample.

    Deterministic init = first k sample vectors by id; assignment is
    argmin ‖v−c‖² via argmax v·c − ‖c‖²/2 with ties going to the
    HIGHER centroid index — the exact rule ``_nearest_centroid``'s
    ``array_max`` over (score, index) structs applies at assignment
    time, so fit and serve agree.  Empty clusters keep their previous
    centroid (same as the old SQL fit's missing-group fallback).
    """
    import numpy as np

    k = min(k, len(vecs))
    cents = vecs[:k].copy()
    for _ in range(iters):
        scores = vecs @ cents.T - 0.5 * (cents * cents).sum(axis=1)
        assign = (k - 1) - np.argmax(scores[:, ::-1], axis=1)
        for c in range(k):
            members = vecs[assign == c]
            if len(members):
                cents[c] = members.mean(axis=0)
    return [[float(x) for x in c] for c in cents]


def ivf_fit(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    k_clusters: int = 16,
    iters: int = 2,
    fit_cap: int = 4096,
) -> list[list[float]]:
    """Lloyd's k-means for the IVF coarse quantizer, trained on a
    deterministic ≤``fit_cap``-vector sample (``_fit_sample``).

    Scale design: quantizer training reads the corpus ONCE (the
    sampling pass) and then iterates driver-side over ≤ fit_cap×dim
    doubles (~2 MB at the defaults) — corpus-size-independent state
    and iteration cost, the same contract faiss uses (train on a
    bounded sample, assign with one distributed pass).  The previous
    formulation paid a full corpus scan + k×dim shuffle PER iteration;
    at 100 TB that is ``iters`` extra full scans for 16 centroids.
    Recall at the catalog knobs is re-measured in BASELINE.md's
    ann_recall table (floors pinned in tests/test_operators.py).
    """
    vecs = _fit_sample(emb, id_col, vec_col, fit_cap)
    if not len(vecs):
        raise ValueError("ivf_fit needs a non-empty corpus")
    return _lloyd(vecs, k_clusters, iters)


def ivf_ann_topk(
    emb: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    q_id_col: str,
    q_vec_col: str,
    k: int,
    k_clusters: int = 16,
    n_probe: int = 4,
    iters: int = 2,
) -> DataFrame:
    """IVF-style approximate top-k: coarse k-means quantizer, inverted
    lists per cluster, queries probe their ``n_probe`` nearest
    centroids, exact cosine re-rank inside the probed lists.

    Expected comparisons: Q·N·(n_probe/k_clusters) — the standard IVF
    recall/cost dial.  Versus LSH buckets: data-adaptive partitions
    (tighter lists when the corpus is clustered), at the price of the
    k-means fit passes.
    """
    # zero-norm vectors excluded on both sides (see `normalized`)
    emb = emb.filter(norm(as_double(F.col(vec_col))) > 0)
    queries = queries.filter(norm(as_double(F.col(q_vec_col))) > 0)
    cents = ivf_fit(emb, id_col, vec_col, k_clusters, iters)
    vec_sql = f"cast(`{vec_col}` as array<double>)"
    q_vec_sql = f"cast(`{q_vec_col}` as array<double>)"
    n = emb.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("nv"),
        _nearest_centroid(vec_sql, cents).alias("cluster"),
    )
    # Query side: rank ALL centroids per query, keep n_probe best.
    probes = F.expr(
        f"transform(slice(reverse(array_sort({_centroid_scores_sql(q_vec_sql, cents)}"
        f")), 1, {n_probe}), t -> t.c)"
    )
    q = queries.select(
        F.col(q_id_col).alias("q_id"),
        F.col(q_vec_col).alias("qv"),
        probes.alias("__probes"),
    ).select("q_id", "qv", F.explode("__probes").alias("cluster"))
    scored = (
        n.join(F.broadcast(q), on="cluster")
        .filter(F.col("q_id") != F.col("neighbor_id"))
        .select(
            "q_id",
            "neighbor_id",
            cosine(as_double(F.col("qv")), as_double(F.col("nv"))).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id"))
    return scored.select(
        "q_id", "neighbor_id", "cos_sim", F.row_number().over(w).alias("nn_rank")
    ).filter(F.col("nn_rank") <= k)


def ivf_int8_ann_topk(
    emb: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    q_id_col: str,
    q_vec_col: str,
    k: int,
    k_clusters: int = 32,
    n_probe: int = 16,
    iters: int = 2,
    rerank_mult: int = 4,
) -> DataFrame:
    """End-to-end 100 TB ANN serving plan: IVF coarse quantizer over
    int8-quantized codes, integer-dot shortlist, float re-rank of the
    survivors only (VERDICT r2 item 4).

    Three tiers, each touching less data than the last:

    1. **Candidate generation** — same inverted lists as
       ``ivf_ann_topk`` (k-means state is k×dim driver literals at any
       corpus size); queries probe their ``n_probe`` nearest lists.
       Expected comparisons Q·N·(n_probe/k_clusters).
    2. **Integer shortlist** — candidates are scored with the EXACT
       bigint dot of the int8 codes scaled back
       (``int_dot·sa·sb / (‖a‖·‖b‖)`` ≈ cosine).  Only the 4×-smaller
       serving payload (code, scale, norm) travels through this join —
       the float vectors never do.  Top ``rerank_mult·k`` per query
       survive.
    3. **Float re-rank** — only Q·rerank_mult·k rows are fetched back
       from the float store (broadcast semi-join on the shortlist) and
       re-scored in double precision for the final exact ordering.

    At 100 TB tier 2 is the bandwidth win (the int8 index is ~1/4 the
    bytes of the float corpus and is all that streams through the
    probe join) and tier 3 bounds the float reads to k·rerank_mult rows
    per query regardless of corpus size.  Recall vs the exact baseline
    is measured by scripts/ann_recall.py and floor-asserted in
    tests/test_operators.py (the int8 shortlist loses < 1% recall over
    float IVF at rerank_mult=4: quantization error ~1/254 per element
    only reorders near-ties, and ties deeper than rerank_mult·k are
    outside the final top-k with high probability).
    """
    # zero-norm vectors excluded on both sides (see `normalized`)
    emb = emb.filter(norm(as_double(F.col(vec_col))) > 0)
    queries = queries.filter(norm(as_double(F.col(q_vec_col))) > 0)
    cents = ivf_fit(emb, id_col, vec_col, k_clusters, iters)
    vec_sql = f"cast(`{vec_col}` as array<double>)"
    q_vec_sql = f"cast(`{q_vec_col}` as array<double>)"
    # Corpus index: int8 codes + per-vector scale + exact float norm +
    # cluster id.  This projection IS the serving index a 100 TB
    # deployment would persist (bucketed by cluster); the float column
    # is dropped before the join.
    nq = quantize_int8(emb, id_col, vec_col)
    n = nq.select(
        F.col(id_col).alias("neighbor_id"),
        F.col("qvec").alias("ncode"),
        F.col("scale").alias("ns"),
        norm(as_double(F.col(vec_col))).alias("nnorm"),
        _nearest_centroid(vec_sql, cents).alias("cluster"),
    )
    probes = F.expr(
        f"transform(slice(reverse(array_sort({_centroid_scores_sql(q_vec_sql, cents)}"
        f")), 1, {n_probe}), t -> t.c)"
    )
    q = (
        quantize_int8(queries, q_id_col, q_vec_col)
        .select(
            F.col(q_id_col).alias("q_id"),
            F.col("qvec").alias("qcode"),
            F.col("scale").alias("qs"),
            norm(as_double(F.col(q_vec_col))).alias("qnorm"),
            probes.alias("__probes"),
        )
        .select("q_id", "qcode", "qs", "qnorm", F.explode("__probes").alias("cluster"))
    )
    approx = (
        n.join(F.broadcast(q), on="cluster")
        .filter(F.col("q_id") != F.col("neighbor_id"))
        .select(
            "q_id",
            "neighbor_id",
            (
                int_dot(F.col("qcode"), F.col("ncode"))
                * F.col("qs")
                * F.col("ns")
                / (F.col("qnorm") * F.col("nnorm"))
            ).alias("approx_cos"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.col("approx_cos").desc(), F.col("neighbor_id"))
    shortlist = (
        approx.select("q_id", "neighbor_id", F.row_number().over(w).alias("__r"))
        .filter(F.col("__r") <= rerank_mult * k)
        .select("q_id", "neighbor_id")
    )
    # Float fetch: the shortlist (Q·rerank_mult·k ids — tiny) is
    # broadcast into the float corpus scan; only matching rows are read
    # into the re-rank.
    nv = emb.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("nv"))
    qv = queries.select(F.col(q_id_col).alias("q_id"), F.col(q_vec_col).alias("qv"))
    reranked = (
        nv.join(F.broadcast(shortlist), "neighbor_id")
        .join(F.broadcast(qv), "q_id")
        .select(
            "q_id",
            "neighbor_id",
            cosine(as_double(F.col("qv")), as_double(F.col("nv"))).alias("cos_sim"),
        )
    )
    w2 = Window.partitionBy("q_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id"))
    return reranked.select(
        "q_id", "neighbor_id", "cos_sim", F.row_number().over(w2).alias("nn_rank")
    ).filter(F.col("nn_rank") <= k)


def semantic_dedup(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.95,
    k_clusters: int = 8,
    iters: int = 2,
) -> DataFrame:
    """L28: SemDeDup-style semantic deduplication (Abbas et al. 2023):
    cluster embeddings with a coarse k-means, then WITHIN each cluster
    drop every vector whose cosine to a lower-id cluster-mate is ≥
    ``threshold`` (keep-first survivor rule, same as exact dedup L1).

    The point of the clustering is the same as LSH banding in L2: the
    quadratic pair comparison runs per-CLUSTER, never corpus-wide —
    cost sum_c n_c², with the cluster granularity (k) the knob that
    bounds it.  The k-means state is k×dim driver-side literals
    (corpus-size-independent, same contract as ivf_fit); the pair join
    is an equi-join on cluster id; the survivor step is one left-anti
    join.  Returns (id, cluster) for surviving vectors.
    """
    cents = ivf_fit(emb, id_col, vec_col, k_clusters=k_clusters, iters=iters)
    vec_sql = f"cast(`{vec_col}` as array<double>)"
    assigned = emb.select(
        F.col(id_col).alias("id"),
        _nearest_centroid(vec_sql, cents).alias("cluster"),
        F.col(vec_col).alias("__v"),
    )
    n = (
        assigned.withColumn("__n", norm(as_double(F.col("__v"))))
        # zero-norm vectors can't be near-dups of anything (see
        # `normalized`); they stay in `assigned` and survive
        .filter(F.col("__n") > 0)
        .withColumn("vn", F.transform(as_double(F.col("__v")), lambda x: x / F.col("__n")))
        .drop("__n")
    )
    a = n.select(F.col("id").alias("id_a"), F.col("cluster"), F.col("vn").alias("va"))
    b = n.select(F.col("id").alias("id_b"), F.col("cluster"), F.col("vn").alias("vb"))
    dups = (
        a.join(b, ["cluster"])
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(dot(F.col("va"), F.col("vb")) >= threshold)
        .select(F.col("id_b").alias("id"))
        .distinct()
    )
    return assigned.select("id", "cluster").join(dups, "id", "left_anti")


def centroids(emb: DataFrame, label_col: str, vec_col: str) -> DataFrame:
    """Per-label mean vector via posexplode → (label, pos) partial-agg —
    shuffle is labels × dim rows, never the vectors themselves.
    Output: (label, pos, centroid_val)."""
    exploded = emb.select(
        F.col(label_col).alias("label"),
        F.posexplode(as_double(F.col(vec_col))).alias("pos", "val"),
    )
    return exploded.groupBy("label", "pos").agg(F.avg("val").alias("centroid_val"))


def build_ivf_index(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    path: str,
    k_clusters: int = 32,
    iters: int = 2,
) -> list[list[float]]:
    """Persist the int8 IVF serving index with a PARTITION-PRUNABLE
    layout — the piece that turns l4d's per-query index build into a
    real 100 TB serving architecture.

    The index is ``(id, qvec int8, scale, norm)`` written
    ``partitionBy("cluster")``: each inverted list is its own partition
    directory, so a probe of ``n_probe`` of ``k_clusters`` lists is a
    partition-PRUNED scan — the other ``k_clusters − n_probe`` lists
    are never opened (asserted via ``inputFiles()`` in
    tests/test_operators.py).  At 100 TB this is the difference between
    reading n_probe/k of the index per query batch and reading all of
    it.  Centroids (k×dim doubles — driver-sized at any corpus scale)
    are written alongside as JSON so serving needs no refit.

    Returns the fitted centroids.
    """
    import json
    import os

    # zero-norm vectors excluded from the index (see `normalized`)
    emb = emb.filter(norm(as_double(F.col(vec_col))) > 0)
    cents = ivf_fit(emb, id_col, vec_col, k_clusters, iters)
    vec_sql = f"cast(`{vec_col}` as array<double>)"
    idx = quantize_int8(emb, id_col, vec_col).select(
        F.col(id_col).alias("id"),
        F.col("qvec"),
        F.col("scale"),
        norm(as_double(F.col(vec_col))).alias("vnorm"),
        _nearest_centroid(vec_sql, cents).alias("cluster"),
    )
    idx.write.mode("overwrite").partitionBy("cluster").parquet(path)
    with open(os.path.join(path, "_centroids.json"), "w") as f:
        json.dump(cents, f)
    return cents


def query_ivf_index(
    spark,
    path: str,
    emb: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    q_id_col: str,
    q_vec_col: str,
    k: int,
    n_probe: int = 16,
    rerank_mult: int = 4,
) -> DataFrame:
    """Serve ANN top-k from a persisted ``build_ivf_index`` layout.

    The probe filter ``cluster IN (probed…)`` lands on the partition
    column, so the parquet scan is pruned to the probed inverted lists
    only.  Scoring is the same int8 bigint-dot shortlist + bounded
    float re-rank as ``ivf_int8_ann_topk`` (the float fetch against
    ``emb`` touches Q·rerank_mult·k rows).  Output-identical to
    ``ivf_int8_ann_topk`` at the same knobs (unit-pinned) — the only
    difference is WHERE the index comes from.
    """
    import json
    import os

    with open(os.path.join(path, "_centroids.json")) as f:
        cents = json.load(f)
    # zero-norm queries excluded; the index side was filtered at build
    queries = queries.filter(norm(as_double(F.col(q_vec_col))) > 0)
    q_vec_sql = f"cast(`{q_vec_col}` as array<double>)"
    probes = F.expr(
        f"transform(slice(reverse(array_sort({_centroid_scores_sql(q_vec_sql, cents)}"
        f")), 1, {n_probe}), t -> t.c)"
    )
    q = (
        quantize_int8(queries, q_id_col, q_vec_col)
        .select(
            F.col(q_id_col).alias("q_id"),
            F.col("qvec").alias("qcode"),
            F.col("scale").alias("qs"),
            norm(as_double(F.col(q_vec_col))).alias("qnorm"),
            probes.alias("__probes"),
        )
        .select("q_id", "qcode", "qs", "qnorm", F.explode("__probes").alias("cluster"))
    )
    # Static partition pruning: the union of probed lists is at most
    # k_clusters values (driver-bounded regardless of corpus size), so
    # collecting it and filtering on the partition column prunes the
    # scan at PLANNING time — no dependence on DPP kicking in.
    probed = sorted(r["cluster"] for r in q.select("cluster").distinct().collect())
    n = spark.read.parquet(path).filter(F.col("cluster").isin(probed))
    approx = (
        n.join(F.broadcast(q), on="cluster")
        .filter(F.col("q_id") != F.col("id"))
        .select(
            "q_id",
            F.col("id").alias("neighbor_id"),
            (
                int_dot(F.col("qcode"), F.col("qvec"))
                * F.col("qs")
                * F.col("scale")
                / (F.col("qnorm") * F.col("vnorm"))
            ).alias("approx_cos"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.col("approx_cos").desc(), F.col("neighbor_id"))
    shortlist = (
        approx.select("q_id", "neighbor_id", F.row_number().over(w).alias("__r"))
        .filter(F.col("__r") <= rerank_mult * k)
        .select("q_id", "neighbor_id")
    )
    nv = emb.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("nv"))
    qv = queries.select(F.col(q_id_col).alias("q_id"), F.col(q_vec_col).alias("qv"))
    reranked = (
        nv.join(F.broadcast(shortlist), "neighbor_id")
        .join(F.broadcast(qv), "q_id")
        .select(
            "q_id",
            "neighbor_id",
            cosine(as_double(F.col("qv")), as_double(F.col("nv"))).alias("cos_sim"),
        )
    )
    w2 = Window.partitionBy("q_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id"))
    return reranked.select(
        "q_id", "neighbor_id", "cos_sim", F.row_number().over(w2).alias("nn_rank")
    ).filter(F.col("nn_rank") <= k)


def pq_fit(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    m_sub: int = 8,
    k_codes: int = 16,
    iters: int = 2,
    fit_cap: int = 4096,
) -> list[list[list[float]]]:
    """Product-quantization codebooks (Jégou et al., "Product
    Quantization for Nearest Neighbor Search", TPAMI 2011): the vector
    is split into ``m_sub`` contiguous subspaces and each subspace gets
    its own ``k_codes``-centroid k-means — the code for a vector is
    m_sub small integers (here 8×4 bits = 4 bytes vs 256 bytes of
    float64), and distances are reconstructed per-subspace from lookup
    tables.

    Scale design: ALL subspaces train from ONE deterministic
    ≤``fit_cap``-vector sample (``_fit_sample`` — a single map-only
    corpus pass), then iterate driver-side per subspace over
    sample×subdim doubles — corpus-size-independent state and
    iteration cost, the same contract as ``ivf_fit``.  Deterministic
    init: subvectors of the first k_codes sample vectors by id."""
    vecs = _fit_sample(emb, id_col, vec_col, fit_cap)
    if not len(vecs):
        raise ValueError("pq_fit needs a non-empty corpus")
    dim = vecs.shape[1]
    if dim % m_sub:
        raise ValueError(f"dim {dim} not divisible by m_sub {m_sub}")
    subdim = dim // m_sub
    if len(vecs) < k_codes:
        raise ValueError(
            f"pq_fit needs >= k_codes ({k_codes}) vectors for deterministic "
            f"init, corpus has {len(vecs)}"
        )
    return [
        _lloyd(vecs[:, m * subdim : (m + 1) * subdim], k_codes, iters)
        for m in range(m_sub)
    ]


def pq_ann_topk(
    emb: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    q_id_col: str,
    q_vec_col: str,
    k: int,
    m_sub: int = 8,
    k_codes: int = 16,
    iters: int = 2,
    rerank_mult: int = 4,
) -> DataFrame:
    """PQ asymmetric-distance ANN: 4-byte codes + per-query lookup
    tables + float re-rank of the shortlist — the memory-bound serving
    tier of the family (l4b LSH buckets, l4c IVF lists, l4d int8 dot,
    l4f THIS: the corpus streamed through scoring is m_sub small ints
    per vector, 64× smaller than float64 at the defaults).

    Asymmetric distance (query stays float, corpus is quantized):
    dot(q, recon(x)) = Σ_m LUT_m[code_m] with LUT_m[j] = dot(q_m,
    centroid_{m,j}), and ‖recon(x)‖² = Σ_m ‖centroid_{m,code_m}‖²
    (subspace cross-terms vanish — the subspaces are disjoint
    coordinate blocks).  cos(q, recon(x)) then needs only the codes.

    The per-query LUTs (Q × m_sub × k_codes doubles) are computed
    DRIVER-SIDE from the collected query batch and inlined as
    expression literals — in a production PQ server the LUT build is
    exactly the query-node work per batch, corpus-independent; the
    plan-literal form bounds the supported batch to Q ≲ 100 per pass
    (the same k×dim-literal contract as ``_centroid_scores_sql``).
    Scoring is MAP-ONLY over the codes; the only shuffles are the
    per-query top-(rerank_mult·k) shortlist window and the bounded
    float re-rank fetch (the ``ivf_int8_ann_topk`` tier-3 pattern)."""
    emb = emb.filter(norm(as_double(F.col(vec_col))) > 0)
    queries = queries.filter(norm(as_double(F.col(q_vec_col))) > 0)
    cbs = pq_fit(emb, id_col, vec_col, m_sub, k_codes, iters)
    dim = len(cbs[0][0]) * m_sub
    subdim = dim // m_sub
    vec_sql = f"cast(`{vec_col}` as array<double>)"

    def sub_sql(m: int) -> str:
        return f"slice({vec_sql}, {m * subdim + 1}, {subdim})"

    codes = emb.select(
        F.col(id_col).alias("neighbor_id"),
        *[
            F.expr(f"array_max({_centroid_scores_sql(sub_sql(m), cbs[m])}).c").alias(
                f"__code{m}"
            )
            for m in range(m_sub)
        ],
    )
    # query-node LUT build (Q bounded — documented above)
    qrows = queries.select(
        F.col(q_id_col).alias("q_id"), as_double(F.col(q_vec_col)).alias("qv")
    ).collect()
    if not qrows:
        # empty (or all-zero-norm) query batch → empty result frame with
        # the contract schema, not an unresolvable explode(array()).
        # neighbor_id's type follows emb's id column (as it does in the
        # non-empty path) so the two paths keep one schema even for
        # int/string corpus ids.
        nid_type = dict(emb.dtypes)[id_col]
        return emb.sparkSession.createDataFrame(
            [], f"q_id long, neighbor_id {nid_type}, cos_sim double, nn_rank int"
        )
    if any(not isinstance(r["q_id"], int) for r in qrows):
        # ids are inlined as bigint literals in the per-query score
        # expressions — the integer-id contract of this engine's tables
        raise TypeError("pq_ann_topk requires integer query ids")
    n2_luts = [
        [sum(x * x for x in cbs[m][j]) for j in range(k_codes)] for m in range(m_sub)
    ]

    def lit_arr(vals: list[float]) -> str:
        return "array(" + ",".join(f"{v!r}D" for v in vals) + ")"

    per_query = []
    for r in qrows:
        qv = [float(x) for x in r["qv"]]
        qnorm = sum(x * x for x in qv) ** 0.5
        dot_terms = []
        n2_terms = []
        for m in range(m_sub):
            qsub = qv[m * subdim : (m + 1) * subdim]
            lut = [
                sum(a * b for a, b in zip(qsub, cbs[m][j])) for j in range(k_codes)
            ]
            dot_terms.append(f"element_at({lit_arr(lut)}, __code{m} + 1)")
            n2_terms.append(f"element_at({lit_arr(n2_luts[m])}, __code{m} + 1)")
        dot_sql = " + ".join(dot_terms)
        n2_sql = " + ".join(n2_terms)
        per_query.append(
            f"named_struct('q', {int(r['q_id'])}L, 's', "
            f"({dot_sql}) / ({qnorm!r}D * sqrt(greatest({n2_sql}, 1e-300D))))"
        )
    scored = (
        codes.select(
            "neighbor_id", F.expr(f"explode(array({','.join(per_query)}))").alias("t")
        )
        .select("neighbor_id", F.col("t.q").alias("q_id"), F.col("t.s").alias("approx_cos"))
        .filter(F.col("q_id") != F.col("neighbor_id"))
    )
    w = Window.partitionBy("q_id").orderBy(F.col("approx_cos").desc(), F.col("neighbor_id"))
    shortlist = (
        scored.select("q_id", "neighbor_id", F.row_number().over(w).alias("__r"))
        .filter(F.col("__r") <= rerank_mult * k)
        .select("q_id", "neighbor_id")
    )
    nv = emb.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("nv"))
    qv_df = queries.select(F.col(q_id_col).alias("q_id"), F.col(q_vec_col).alias("qv"))
    reranked = (
        nv.join(F.broadcast(shortlist), "neighbor_id")
        .join(F.broadcast(qv_df), "q_id")
        .select(
            "q_id",
            "neighbor_id",
            cosine(as_double(F.col("qv")), as_double(F.col("nv"))).alias("cos_sim"),
        )
    )
    w2 = Window.partitionBy("q_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id"))
    return reranked.select(
        "q_id", "neighbor_id", "cos_sim", F.row_number().over(w2).alias("nn_rank")
    ).filter(F.col("nn_rank") <= k)
