"""LLM-data-pipeline queries (SURVEY.md §2.11, L1–L12 + dedup/ANN/
multimodal extras) over ``documents`` and ``embeddings``.

SQL-oracle'd where exactly reproducible in DuckDB (exact dedup, exact
Jaccard, double-precision cosine, TF-IDF, text stats, lexicon score,
centroids); rows-only where the operator is hash-based by nature
(MinHash-LSH, SimHash, hyperplane ANN) — those are instead verified
against their exact counterparts in tests/test_operators.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from projectmapreduce_spark.functions import dround
from projectmapreduce_spark.io import scan
from projectmapreduce_spark.operators.dedup import (
    exact_dedup,
    near_dup_minhash,
    ngram_jaccard_join,
    simhash,
    simhash_candidates,
)
from projectmapreduce_spark.operators.multimodal import attach_payload, extract_features
from projectmapreduce_spark.operators.similarity import (
    as_double,
    brute_force_topk,
    centroids,
    cosine_pairs,
    dot,
    int_dot,
    ivf_ann_topk,
    ivf_int8_ann_topk,
    lsh_ann_topk,
    pq_ann_topk,
    quantize_int8,
)
from projectmapreduce_spark.operators.text import (
    bm25,
    bpe_ish_token_count,
    doc_fingerprint,
    language_id,
    lexicon_score,
    normalize_text,
    text_stats,
    tf_idf,
    tokenize,
)
from projectmapreduce_spark.queries.registry import query

_SENTIMENT_LEXICON = {"fast": 2, "big": 1, "small": 1, "slow": -2, "dup": -1, "spark": 2}


@query(
    "l1_exact_dedup",
    oracle="""
SELECT doc_id, content_hash
FROM (
  SELECT doc_id, sha256(text) AS content_hash,
         row_number() OVER (PARTITION BY sha256(text) ORDER BY doc_id) AS rn
  FROM documents
) WHERE rn = 1
""",
    survey="L1",
    category="llm",
)
def l1_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by sha256, deterministic keep-lowest-id.  (The
    fixture corpus has no natural dups — injected-dup behavior is
    pinned in tests/test_operators.py.)"""
    d = scan(spark, sf_dir, "documents")
    return exact_dedup(d, "text", "doc_id").select("doc_id", "content_hash")


@query("l2_minhash_lsh", oracle=None, survey="L2", category="llm")
def l2_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup pairs (64 hashes, 16 bands, unigram
    shingles) verified to exact Jaccard ≥ 0.5.  Rows-only: minhash
    values are engine-specific; candidate-recall vs the exact join is
    asserted in tests/test_operators.py."""
    d = scan(spark, sf_dir, "documents")
    out = near_dup_minhash(d, "doc_id", "text", threshold=0.5, shingle_n=3)
    return out.select("id_a", "id_b", dround("jaccard", 4).alias("jaccard"))


@query(
    "l2b_ngram_jaccard",
    oracle="""
WITH tok AS (
  SELECT DISTINCT doc_id, unnest(string_split_regex(text, '\\s+')) AS token FROM documents
),
sizes AS (SELECT doc_id, count(*) AS n_tok FROM tok GROUP BY doc_id),
df AS (SELECT token, count(*) AS df FROM tok GROUP BY token),
ranked AS (
  SELECT t.doc_id, t.token,
         row_number() OVER (PARTITION BY t.doc_id ORDER BY d.df, t.token) AS rk,
         s.n_tok
  FROM tok t JOIN df d USING (token) JOIN sizes s USING (doc_id)
),
-- Prefix filter (Chaudhuri/Bayardo/Xiao, exact): J(A,B) >= 4/5 implies
-- |A inter B| >= max(ceil(0.8|A|), ceil(0.8|B|)), so the per-doc
-- (n - ceil(0.8 n) + 1)-prefixes under ONE global rarity order must
-- share a token.  ceil(0.8 n) = (4n + 4) // 5 in pure integers (a
-- float 0.8*n would misround at multiples of 5 and silently DROP
-- candidates).  Without this the naive token self-join is
-- posting-list-quadratic and never finishes at sf1.
prefix AS (
  SELECT doc_id, token, n_tok FROM ranked
  WHERE rk <= n_tok - (4 * n_tok + 4) // 5 + 1
),
-- Size band (also exact): J >= 4/5 forces 4|A| <= 5|B| and 4|B| <= 5|A|.
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM prefix a JOIN prefix b
    ON a.token = b.token AND a.doc_id < b.doc_id
   AND 4 * a.n_tok <= 5 * b.n_tok AND 4 * b.n_tok <= 5 * a.n_tok
),
-- Verify candidates by list intersection (no (pair x token) row
-- explosion — the candidate set times list length stays in registers).
lists AS (SELECT doc_id, list(token) AS toks FROM tok GROUP BY doc_id),
verified AS (
  SELECT id_a, id_b,
         len(list_intersect(la.toks, lb.toks)) AS n_inter,
         len(la.toks) AS na, len(lb.toks) AS nb
  FROM cand
  JOIN lists la ON la.doc_id = id_a
  JOIN lists lb ON lb.doc_id = id_b
)
SELECT id_a, id_b,
       round(n_inter::DOUBLE / (na + nb - n_inter), 4) AS jaccard
FROM verified
WHERE n_inter::DOUBLE / (na + nb - n_inter) >= 0.8
""",
    survey="L2",
    category="llm",
)
def l2b_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT n-gram Jaccard similarity join (the verifier LSH feeds):
    inverted-index self-join, fully SQL-checkable."""
    d = scan(spark, sf_dir, "documents")
    out = ngram_jaccard_join(d, "doc_id", "text", threshold=0.8, n=1)
    return out.select("id_a", "id_b", dround("jaccard", 4).alias("jaccard"))


_SIMHASH_TOKEN_HASH_SQL = """list_reduce(list_transform(generate_series(1, 13),
    i -> CASE WHEN ascii(substr(md5(token), i, 1)) BETWEEN 48 AND 57
              THEN ascii(substr(md5(token), i, 1)) - 48
              ELSE ascii(substr(md5(token), i, 1)) - 87 END::BIGINT),
    (acc, n) -> acc * 16 + n)"""


@query(
    "l2c_simhash",
    oracle=f"""
WITH tok AS (
  SELECT DISTINCT doc_id AS id, unnest(string_split_regex(text, '\\s+')) AS token
  FROM documents
),
h AS (SELECT id, {_SIMHASH_TOKEN_HASH_SQL} AS h FROM tok),
votes AS (
  SELECT id, bit, sum(2 * ((h >> bit) & 1) - 1)::BIGINT AS v
  FROM h, (SELECT unnest(generate_series(0, 51)) AS bit) bits
  GROUP BY id, bit
),
sig AS (
  SELECT id,
         sum(CASE WHEN v > 0 THEN (1::BIGINT << bit) ELSE 0::BIGINT END)::BIGINT
           AS simhash
  FROM votes GROUP BY id
),
chunks AS (
  SELECT id, simhash, ci, (simhash >> (13 * ci)) & 8191 AS chunk
  FROM sig, (SELECT unnest(generate_series(0, 3)) AS ci) cis
),
cand AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b,
         bit_count(xor(a.simhash, b.simhash))::INTEGER AS hamming
  FROM chunks a JOIN chunks b ON a.ci = b.ci AND a.chunk = b.chunk AND a.id < b.id
)
SELECT id_a, id_b, hamming FROM cand WHERE hamming <= 3
""",
    survey="L2",
    category="llm",
)
def l2c_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup candidates (52-bit signature, 4×13-bit bands,
    Hamming ≤ 3).

    Hash-checked since round 10 (was rows-only): the token hash is the
    md5-52 fold PRF (operators/sketch.py::md5_hash52) both engines
    express bit-identically, and everything downstream is integer
    arithmetic — ±1 vote sums per bit (order-independent), a strict
    `votes > 0` sign rule, power-of-two folds, band extraction by
    shift/mask, and an exact Hamming via bit_count(xor).  The oracle
    re-derives the bit-majority from scratch (per-(doc, bit) vote sums
    over generate_series(0, 51)), so the check covers the signature
    algebra itself, not just the candidate join.  Tokenization is the
    l2b-proven pair: Spark split on the explicit ASCII class
    `[ \\t\\n\\f\\r]+` == RE2 `\\s+` (see operators/dedup.py::tokens_of
    — Java `\\s` additionally matches \\x0B, so the explicit class is
    used engine-side to keep the two regex dialects identical on every
    input, not just the current corpus)."""
    d = scan(spark, sf_dir, "documents")
    sig = simhash(d, "doc_id", "text")
    return simhash_candidates(sig, max_hamming=3)


@query(
    "l2d_embedding_neardup",
    oracle="""
WITH e AS (
  SELECT vec_id, label, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings
),
n AS (
  -- zero-norm vectors excluded from pair generation (they can't be
  -- near-dups of anything) but SURVIVE in the final select below,
  -- mirroring the engine (operators/similarity.py)
  SELECT vec_id, label,
         list_transform(v, x -> x / sqrt(list_dot_product(v, v))) AS vn
  FROM e WHERE list_dot_product(v, v) > 0
),
dup_ids AS (
  SELECT DISTINCT b.vec_id
  FROM n a JOIN n b ON a.label = b.label AND a.vec_id < b.vec_id
  WHERE list_dot_product(a.vn, b.vn) >= 0.2
)
SELECT e.vec_id, e.label FROM e
WHERE e.vec_id NOT IN (SELECT vec_id FROM dup_ids)
""",
    survey="L2,L3",
    category="llm",
)
def l2d_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dedup: drop every vector whose cosine to a
    LOWER-id vector in its label block is ≥ 0.2 (keep-first semantics,
    same survivor rule as exact dedup).  The pair join is the blocked
    cosine join (l3); the survivor step is a left-anti join — both
    shuffle-bounded, no cross join."""
    e = scan(spark, sf_dir, "embeddings")
    dups = (
        cosine_pairs(e, "vec_id", "embedding", threshold=0.2, block_col="label")
        .select(F.col("id_b").alias("vec_id"))
        .distinct()
    )
    return e.select("vec_id", "label").join(dups, on="vec_id", how="left_anti")


@query(
    "l3_cosine_pairs",
    oracle="""
WITH e AS (
  SELECT vec_id, label, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings
),
n AS (
  -- zero-norm vectors have no direction: excluded, mirroring the
  -- engine's shared exclusion policy (operators/similarity.py)
  SELECT vec_id, label,
         list_transform(v, x -> x / sqrt(list_dot_product(v, v))) AS vn
  FROM e WHERE list_dot_product(v, v) > 0
)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round(list_dot_product(a.vn, b.vn), 6) AS cos_sim
FROM n a
JOIN n b ON a.label = b.label AND a.vec_id < b.vec_id
WHERE list_dot_product(a.vn, b.vn) >= 0.2
""",
    survey="L3",
    category="llm",
)
def l3_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cosine similarity join (≥ 0.2) blocked on label — exact double
    math, JVM-side zip_with/aggregate.  At scale the block key becomes
    an LSH bucket (l4b) instead of a label."""
    e = scan(spark, sf_dir, "embeddings")
    out = cosine_pairs(e, "vec_id", "embedding", threshold=0.2, block_col="label")
    return out.select("id_a", "id_b", dround("cos_sim", 6).alias("cos_sim"))


@query(
    "l4_topk_nn",
    oracle="""
WITH e AS (
  -- zero-norm vectors excluded on both sides (engine policy:
  -- operators/similarity.py `normalized`)
  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings
  WHERE list_dot_product(embedding, embedding) > 0
),
q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE q_id < 8),
scored AS (
  SELECT q.q_id, e.vec_id AS neighbor_id,
         list_dot_product(q.qv, e.v)
           / (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(e.v, e.v))) AS c
  FROM q JOIN e ON e.vec_id <> q.q_id
),
ranked AS (
  SELECT q_id, neighbor_id, round(c, 6) AS cos_sim,
         row_number() OVER (PARTITION BY q_id ORDER BY c DESC, neighbor_id) AS nn_rank
  FROM scored
)
SELECT q_id, neighbor_id, cos_sim, nn_rank FROM ranked WHERE nn_rank <= 5
""",
    survey="L4",
    category="llm",
)
def l4_topk_nn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-5 nearest neighbors for 8 query vectors — brute-force
    cosine baseline (broadcast queries, one pass over vectors)."""
    e = scan(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 8)
    out = brute_force_topk(e, q, "vec_id", "embedding", "vec_id", "embedding", k=5)
    return out.select("q_id", "neighbor_id", dround("cos_sim", 6).alias("cos_sim"), "nn_rank")


@query("l4b_ann_lsh", oracle=None, survey="L4", category="llm")
def l4b_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate NN via multi-table random-hyperplane LSH (the 100 TB
    path: equi-join on (table, bucket) instead of cross join).

    6 planes × 8 OR-amplified tables: recall@5 = 0.925 at 0.61
    candidate fraction vs l4 exact at sf0.1 (scripts/ann_recall.py) —
    the fixture vectors are near-uniform (true NNs at cos ≈ 0.35), the
    adversarial geometry where single-table LSH bottoms out at ~0.28.
    Floors asserted in tests/test_operators.py."""
    e = scan(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 8)
    out = lsh_ann_topk(
        e, q, "vec_id", "embedding", "vec_id", "embedding", k=5, n_planes=6, n_tables=8
    )
    return out.select("q_id", "neighbor_id", dround("cos_sim", 6).alias("cos_sim"), "nn_rank")


@query("l4c_ann_ivf", oracle=None, survey="L4", category="llm")
def l4c_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate NN via an IVF coarse quantizer (tiny Lloyd k-means,
    inverted lists per cluster, n_probe nearest lists re-ranked
    exactly).  Data-adaptive counterpart to l4b's LSH buckets.
    32 clusters probed 16-wide: recall@5 = 0.919 at 0.50 candidate
    fraction vs l4 exact at sf0.1 (scripts/ann_recall.py) — the best
    recall-per-candidate of the swept configs on the near-uniform
    fixture geometry.  Floors asserted in tests/test_operators.py."""
    e = scan(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 8)
    out = ivf_ann_topk(
        e, q, "vec_id", "embedding", "vec_id", "embedding", k=5, k_clusters=32, n_probe=16,
        iters=2,
    )
    return out.select("q_id", "neighbor_id", dround("cos_sim", 6).alias("cos_sim"), "nn_rank")


@query("l4d_ann_ivf_int8", oracle=None, survey="L4", category="llm")
def l4d_ann_ivf_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed 100 TB ANN serving plan (VERDICT r2 item 4): IVF
    inverted lists over int8-quantized codes (l4c ∘ l27), bigint-dot
    shortlist, float re-rank of only the top rerank_mult·k survivors.
    Same knobs as l4c (32 clusters / 16 probes) so the candidate set is
    identical — the delta under test is the int8 shortlist + bounded
    float fetch.  recall@5 vs l4 exact measured by
    scripts/ann_recall.py at sf0.1; floor asserted in
    tests/test_operators.py."""
    e = scan(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 8)
    out = ivf_int8_ann_topk(
        e, q, "vec_id", "embedding", "vec_id", "embedding",
        k=5, k_clusters=32, n_probe=16, iters=2, rerank_mult=4,
    )
    return out.select("q_id", "neighbor_id", dround("cos_sim", 6).alias("cos_sim"), "nn_rank")


@query("l4e_ann_index_serve", oracle=None, survey="L4,S6", category="llm")
def l4e_ann_index_serve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PERSISTED serving tier of the 100 TB ANN story: the int8 IVF
    index is written once with a partitionBy(cluster) layout
    (operators/similarity.py:build_ivf_index — each inverted list its
    own partition directory, centroids as driver-sized JSON), then
    queries are served by a partition-PRUNED scan of only the probed
    lists (static isin on the partition column).  Output-identical to
    l4d at the same knobs (unit-pinned, plus an inputFiles() pruning
    assertion, tests/test_operators.py) — the delta under test is the
    index living on disk and the scan reading n_probe/k_clusters of
    it."""
    from projectmapreduce_spark.io import scratch_path
    from projectmapreduce_spark.operators.similarity import build_ivf_index, query_ivf_index

    e = scan(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 8)
    path = scratch_path("l4e_ivf_index")
    build_ivf_index(e, "vec_id", "embedding", path, k_clusters=32, iters=2)
    out = query_ivf_index(
        spark, path, e, q, "vec_id", "embedding", "vec_id", "embedding",
        k=5, n_probe=16, rerank_mult=4,
    )
    return out.select("q_id", "neighbor_id", dround("cos_sim", 6).alias("cos_sim"), "nn_rank")


@query("l4f_ann_pq", oracle=None, survey="L4", category="llm")
def l4f_ann_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate NN via PRODUCT QUANTIZATION (Jégou et al. 2011) —
    the memory-bound member of the ANN family: corpus vectors are
    16×4-bit codes (8 bytes vs 512 of float64, 64× compression), ADC
    scoring is a map-only pass over the codes via per-query lookup
    tables, and only the top rerank_mult·k shortlist is fetched back
    in float (`operators/similarity.py:pq_ann_topk`).  At 16
    subspaces / 16 codes / rerank 24: recall@5 = 0.9187 over the
    64-query ann_recall.py measurement (0.950 over this query's 8
    declared queries), touching 6% of the corpus in float at sf0.1 —
    it TIES l4c IVF's recall (0.919 @ 50% candidates) while scoring
    everything through 64×-compressed codes, because PQ prices recall
    in shortlist depth, not candidate-generation width.  Floors
    asserted in tests/test_operators.py."""
    e = scan(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 8)
    out = pq_ann_topk(
        e, q, "vec_id", "embedding", "vec_id", "embedding",
        k=5, m_sub=16, k_codes=16, iters=2, rerank_mult=24,
    )
    return out.select("q_id", "neighbor_id", dround("cos_sim", 6).alias("cos_sim"), "nn_rank")


@query(
    "l5_normalize",
    oracle="""
SELECT doc_id,
       trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9_ \\t\\n]', ' ', 'g'),
                           '\\s+', ' ', 'g')) AS norm_text
FROM documents WHERE doc_id < 100
""",
    survey="L5",
    category="llm",
)
def l5_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text normalization chain (lower, strip punct, collapse ws)."""
    d = scan(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return d.select("doc_id", normalize_text(F.col("text")).alias("norm_text"))


@query(
    "l6_tokenize",
    oracle="""
SELECT doc_id,
       len(string_split_regex(trim(text, ' '), '\\s+'))  AS n_tokens,
       string_split_regex(trim(text, ' '), '\\s+')[1]    AS first_token,
       string_split_regex(trim(text, ' '), '\\s+')[-1]   AS last_token
FROM documents
""",
    survey="L6",
    category="llm",
)
def l6_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenization surface: count + boundary tokens."""
    d = scan(spark, sf_dir, "documents")
    toks = tokenize(F.col("text"))
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.element_at(toks, 1).alias("first_token"),
        F.element_at(toks, -1).alias("last_token"),
    )


@query(
    "l7_language_routing",
    oracle="""
SELECT lang, count(*) AS n_docs, sum(n_chars)::BIGINT AS total_chars
FROM documents
WHERE lang IN ('en', 'fr', 'de')
GROUP BY lang
""",
    survey="L7",
    category="llm",
)
def l7_language_routing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language filter/routing on the lang column (the partition key a
    100 TB corpus would be hive-partitioned by — see S6)."""
    return (
        scan(spark, sf_dir, "documents")
        .filter(F.col("lang").isin("en", "fr", "de"))
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("n_chars").alias("total_chars"))
    )


@query(
    "l7b_language_id",
    oracle=r"""
WITH lex(cand_lang, marker) AS (
  VALUES ('en','the'),('en','a'),('en','of'),('en','and'),('en','is'),
         ('fr','le'),('fr','la'),('fr','de'),('fr','et'),('fr','est'),
         ('es','el'),('es','la'),('es','de'),('es','y'),('es','es'),
         ('de','der'),('de','die'),('de','das'),('de','und'),('de','ist'),
         ('zh','的'),('zh','是'),('zh','了'),('zh','在'),('zh','和')
),
toks AS (
  SELECT doc_id AS id, unnest(string_split_regex(trim(text), '\s+')) AS token
  FROM documents
),
scores AS (
  SELECT id, cand_lang, count(*)::BIGINT AS hits
  FROM toks JOIN lex ON token = marker
  GROUP BY id, cand_lang
),
best AS (
  SELECT id, cand_lang, hits,
         row_number() OVER (PARTITION BY id
                            ORDER BY hits DESC, cand_lang ASC) AS rn
  FROM scores
)
SELECT id, cand_lang AS lang_pred, hits AS lang_score FROM best WHERE rn = 1
""",
    survey="L7,L8",
    category="llm",
)
def l7b_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic language ID via marker-lexicon scoring: explode ⋈
    broadcast lexicon → per-(doc, lang) hit counts → argmax with a
    lexicographic tiebreak.  (The synthetic corpus shares one
    vocabulary across langs, so this checks the machinery, not
    linguistic accuracy.)

    Hash-checked since round 9 (was rows-only): every step is
    deterministic — whitespace tokenization (the engine splits on the
    explicit ASCII class `[ \\t\\n\\f\\r]+`, which equals RE2's `\\s`;
    Java's `\\s` would ALSO match \\x0B, so the explicit class is used
    rather than relying on a no-\\x0B corpus — see
    operators/text.py::tokenize), an inner join against the
    VALUES-inlined lexicon, exact integer hit counts, and a
    row_number()=1 tiebreak both engines order identically.  Docs
    with zero lexicon hits drop out of the inner join on both
    sides."""
    d = scan(spark, sf_dir, "documents")
    return language_id(d, "doc_id", "text")


@query(
    "l8_text_quality",
    oracle="""
WITH t AS (
  SELECT doc_id,
         length(text) AS n_chars,
         len(string_split_regex(trim(text, ' '), '\\s+')) AS n_tokens,
         length(regexp_replace(text, '\\s+', '', 'g')) AS solid_chars,
         len(list_filter(string_split_regex(trim(text, ' '), '\\s+'),
                         t -> list_contains(['a','the','of','and','is'], t))) AS n_stop,
         length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS n_alpha
  FROM documents
)
SELECT doc_id, n_chars, n_tokens,
       round(solid_chars::DOUBLE / n_tokens, 6) AS mean_token_len,
       round(n_stop::DOUBLE / n_tokens, 6)      AS stopword_ratio,
       -- empty doc: NULL ratio (engine try_divide)
       round(n_alpha::DOUBLE / nullif(n_chars, 0), 6) AS alpha_ratio
FROM t
""",
    survey="L8",
    category="llm",
)
def l8_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc quality heuristics (length/stopword/alpha ratios)."""
    d = scan(spark, sf_dir, "documents")
    s = text_stats(d, "doc_id", "text")
    return s.select(
        "doc_id",
        "n_chars",
        "n_tokens",
        dround("mean_token_len", 6).alias("mean_token_len"),
        dround("stopword_ratio", 6).alias("stopword_ratio"),
        dround("alpha_ratio", 6).alias("alpha_ratio"),
    )


@query(
    "l9_tfidf",
    oracle="""
WITH tok AS (
  SELECT doc_id, unnest(string_split_regex(trim(text, ' '), '\\s+')) AS token FROM documents
),
tf AS (SELECT doc_id AS id, token, count(*) AS tf FROM tok GROUP BY 1, 2),
dfreq AS (SELECT token, count(DISTINCT doc_id) AS df_docs FROM tok GROUP BY token),
n AS (SELECT count(*) AS n_docs FROM documents)
SELECT tf.id, tf.token, tf.tf, dfreq.df_docs,
       round(tf.tf * ln(n.n_docs::DOUBLE / dfreq.df_docs), 6) AS tfidf
FROM tf JOIN dfreq USING (token) CROSS JOIN n
WHERE tf.id < 50
""",
    survey="L9",
    category="llm",
)
def l9_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relational TF-IDF (df table broadcast — vocabulary-sized)."""
    d = scan(spark, sf_dir, "documents")
    out = tf_idf(d, "doc_id", "text").filter(F.col("id") < 50)
    return out.select("id", "token", "tf", "df_docs", dround("tfidf", 6).alias("tfidf"))


@query(
    "l10_lexicon_score",
    oracle="""
WITH lex(word, weight) AS (
  VALUES ('fast', 2), ('big', 1), ('small', 1), ('slow', -2), ('dup', -1), ('spark', 2)
),
tok AS (
  SELECT doc_id, unnest(string_split_regex(trim(text, ' '), '\\s+')) AS token FROM documents
),
hits AS (
  SELECT doc_id AS id, sum(weight) AS score, count(*) AS n_hits
  FROM tok JOIN lex ON tok.token = lex.word
  GROUP BY doc_id
)
SELECT d.doc_id AS id,
       coalesce(h.score, 0)::BIGINT  AS score,
       coalesce(h.n_hits, 0)::BIGINT AS n_hits
FROM documents d LEFT JOIN hits h ON h.id = d.doc_id
""",
    survey="L10",
    category="llm",
)
def l10_lexicon_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyword lexicon scoring (sentiment-analysis pattern: broadcast
    lexicon join + per-doc sum)."""
    d = scan(spark, sf_dir, "documents")
    return lexicon_score(d, "doc_id", "text", _SENTIMENT_LEXICON)


@query(
    "l11_multimodal_join",
    oracle="""
SELECT d.doc_id,
       d.lang,
       e.label,
       len(e.embedding)                         AS dim,
       octet_length(encode(d.text))             AS payload_bytes,
       substring(sha256(trim(regexp_replace(regexp_replace(lower(d.text),
                 '[^a-z0-9_ \\t\\n]', ' ', 'g'), '\\s+', ' ', 'g'))), 1, 16) AS fingerprint
FROM documents d
JOIN embeddings e ON d.doc_id = e.vec_id
""",
    survey="L11",
    category="llm",
)
def l11_multimodal_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal row assembly: text ⋈ embedding by id with an opaque
    binary payload carried through relational ops (its byte length and
    content fingerprint prove the payload survives)."""
    d = scan(spark, sf_dir, "documents")
    e = scan(spark, sf_dir, "embeddings")
    return (
        d.join(e, d.doc_id == e.vec_id)
        .select(
            "doc_id",
            "lang",
            "label",
            F.size("embedding").alias("dim"),
            F.octet_length(F.encode("text", "utf-8")).alias("payload_bytes"),
            doc_fingerprint(F.col("text")).alias("fingerprint"),
        )
    )


@query(
    "l11b_media_features",
    oracle="""
SELECT doc_id AS media_id,
       'image' AS kind,
       (54 + 24 * greatest(1, least(64, (octet_length(encode(coalesce(text, ''))) + 23) // 24)))::BIGINT
                                                                 AS n_bytes,
       8::INT                                                    AS width,
       greatest(1, least(64, (octet_length(encode(coalesce(text, ''))) + 23) // 24))::INT
                                                                 AS height,
       16::INT                                                   AS dim,
       1.0::DOUBLE                                               AS feat_sum
FROM documents
""",
    survey="L11,X2",
    category="llm",
)
def l11b_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Media feature extraction with a REAL decode: every document is
    rendered to an actual 24-bit BMP payload (``synthesize_media``),
    and ``extract_features(fake=False)`` decodes the container —
    width/height come from parsing the BITMAPINFOHEADER, features from
    the decoded pixel array.  The SQL oracle re-derives the expected
    BMP geometry from ``length(text)`` and the synthesis constants
    (8-px-wide rows of 24 bytes, 54-byte header, 1..64 rows), so a
    single header-layout or padding bug on either codec side fails the
    hash.  feat_sum pins the L1 normalization of the pixel histogram.
    Scale: encode and decode are per-row Arrow-batched kernels — no
    shuffle at all; the plan is scan → mapInPandas → project."""
    from projectmapreduce_spark.operators.multimodal import synthesize_media

    d = scan(spark, sf_dir, "documents")
    media = synthesize_media(d, "doc_id", "text", kind="image")
    feats = extract_features(media, dim=16, fake=False)
    return feats.select(
        "media_id",
        "kind",
        "n_bytes",
        "width",
        "height",
        F.size("features").alias("dim"),
        dround(F.aggregate("features", F.lit(0.0), lambda a, x: a + x), 6).alias("feat_sum"),
    )


@query(
    "l11f_png_decode",
    oracle="""
SELECT doc_id AS media_id,
       'image' AS kind,
       8::INT                                                    AS width,
       greatest(1, least(64, (octet_length(encode(coalesce(text, ''))) + 23) // 24))::INT
                                                                 AS height,
       16::INT                                                   AS dim,
       1.0::DOUBLE                                               AS feat_sum
FROM documents
""",
    survey="L11,X2",
    category="llm",
)
def l11f_png_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PNG feature extraction with a REAL decode (round 4): every
    document renders to an actual RFC-2083 PNG (zlib-deflated IDAT,
    CRC-stamped chunks), and ``extract_features(fake=False)`` walks
    the chunk stream, verifies CRCs, inflates, reverses the scanline
    filters — width/height come from parsing IHDR.  The oracle
    re-derives the geometry from ``length(text)`` and the synthesis
    constants exactly as l11b does for BMP; n_bytes is deliberately
    NOT pinned (deflate output size is zlib-version-dependent — the
    geometry and normalized features are the portable contract).
    Cross-codec pixel equality (PNG decode == BMP decode of the same
    seed, all 5 filter types) is pinned in tests/test_codecs.py.
    Scale: same scan → mapInPandas shape as l11b, shuffle-free."""
    from projectmapreduce_spark.operators.multimodal import synthesize_media

    d = scan(spark, sf_dir, "documents")
    media = synthesize_media(d, "doc_id", "text", kind="image", image_format="png")
    feats = extract_features(media, dim=16, fake=False)
    return feats.select(
        "media_id",
        "kind",
        "width",
        "height",
        F.size("features").alias("dim"),
        dround(F.aggregate("features", F.lit(0.0), lambda a, x: a + x), 6).alias("feat_sum"),
    )


@query(
    "l11g_jpeg_decode",
    oracle="""
SELECT doc_id AS media_id,
       'image' AS kind,
       8::INT                                                    AS width,
       greatest(1, least(64, (octet_length(encode(coalesce(text, ''))) + 23) // 24))::INT
                                                                 AS height,
       16::INT                                                   AS dim,
       1.0::DOUBLE                                               AS feat_sum
FROM documents
WHERE doc_id < 500
""",
    survey="L11,X2",
    category="llm",
)
def l11g_jpeg_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Baseline-JPEG feature extraction with a REAL decode (round 4):
    documents render to actual T.81 sequential JPEGs (FDCT + Annex-K
    quantization + canonical Huffman), and ``extract_features``
    entropy-decodes, dequantizes, and IDCTs them back.  JPEG is LOSSY,
    so unlike l11b/l11f the oracle pins only the LOSSLESS properties:
    geometry (SOF0 dims survive exactly), feature dimensionality, and
    the L1 normalization of the histogram (sums to 1 whatever the
    pixel error).  Pixel-error bounds and the DC-only golden live in
    tests/test_codecs.py.  The doc_id < 500 slice keeps the Python
    DCT work bounded at every tier (the kernel cost is per-block —
    this is the one codec whose encode is genuinely compute-heavy).
    Scale: same scan → mapInPandas shape as l11b, shuffle-free."""
    from projectmapreduce_spark.operators.multimodal import synthesize_media

    d = scan(spark, sf_dir, "documents").filter(F.col("doc_id") < 500)
    media = synthesize_media(d, "doc_id", "text", kind="image", image_format="jpeg")
    feats = extract_features(media, dim=16, fake=False)
    return feats.select(
        "media_id",
        "kind",
        "width",
        "height",
        F.size("features").alias("dim"),
        dround(F.aggregate("features", F.lit(0.0), lambda a, x: a + x), 6).alias("feat_sum"),
    )


@query(
    "l11d_audio_decode",
    oracle="""
SELECT doc_id AS media_id,
       'audio' AS kind,
       (44 + 2 * octet_length(encode(coalesce(text, ''))))::BIGINT        AS n_bytes,
       octet_length(encode(coalesce(text, '')))::BIGINT                   AS n_samples,
       (octet_length(encode(coalesce(text, ''))) * 1000 // 16000)::INT    AS duration_ms,
       CASE WHEN octet_length(encode(coalesce(text, ''))) = 0 THEN 0.0 ELSE 1.0 END::DOUBLE
                                                            AS feat_sum
FROM documents
""",
    survey="L11,X2",
    category="llm",
)
def l11d_audio_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio decode through the REAL pure-Python WAV codec: each
    document becomes a PCM16 RIFF/WAVE payload (one sample per utf-8
    byte at 16 kHz), and ``extract_features(fake=False)`` walks the
    RIFF chunk list to recover the sample count.  The oracle re-derives
    n_bytes (44-byte canonical header + 2 bytes/sample), n_samples and
    duration from ``length(text)`` — so the hash fails if either the
    encoder's chunk sizes or the decoder's chunk walk is off by a
    byte.  Same scan → mapInPandas shape as l11b: shuffle-free."""
    from projectmapreduce_spark.operators.multimodal import synthesize_media

    d = scan(spark, sf_dir, "documents")
    media = synthesize_media(d, "doc_id", "text", kind="audio")
    feats = extract_features(media, dim=16, fake=False)
    return feats.select(
        "media_id",
        "kind",
        "n_bytes",
        "n_samples",
        F.expr("cast(n_samples * 1000 div 16000 as int)").alias("duration_ms"),
        dround(F.aggregate("features", F.lit(0.0), lambda a, x: a + x), 6).alias("feat_sum"),
    )


@query(
    "l12_embedding_centroids",
    oracle="""
SELECT label, pos, round(avg(v), 6) AS centroid_val
FROM (
  SELECT label,
         generate_subscripts(embedding, 1) - 1 AS pos,
         unnest(embedding)::DOUBLE             AS v
  FROM embeddings
)
GROUP BY label, pos
""",
    survey="L12",
    category="llm",
)
def l12_embedding_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid vectors, one row per (label, dim): posexplode
    → partial-agg; shuffle is labels × 64 rows regardless of corpus
    size."""
    e = scan(spark, sf_dir, "embeddings")
    out = centroids(e, "label", "embedding")
    return out.select("label", "pos", dround("centroid_val", 6).alias("centroid_val"))


@query(
    "l11c_frame_sampling",
    oracle="""
-- frame counts follow the UTF-8 BYTE length of the payload, not the
-- character length: they differ on multi-byte (astral-plane) text —
-- caught by the hostile-domain sweep
WITH d AS (
  SELECT doc_id, octet_length(encode(text)) AS nb
  FROM documents WHERE doc_id < 50
)
SELECT doc_id AS media_id,
       generate_subscripts(range((nb + 63) // 64), 1) - 1 AS frame_idx,
       least(64, nb - (generate_subscripts(range((nb + 63) // 64), 1) - 1) * 64) AS frame_bytes
FROM d
WHERE nb > 0
""",
    survey="L11,M2",
    category="llm",
)
def l11c_frame_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sampling plumbing (1 payload → N frames) through the
    stubbed mapInPandas kernel — asserts the real Spark-side contract
    (schema, Arrow batching, 1→N expansion) with a deterministic fake;
    frame sizes are SQL-checkable from payload length."""
    from projectmapreduce_spark.operators.multimodal import sample_frames

    d = scan(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    media = attach_payload(d, "doc_id", "text", kind="video")
    frames = sample_frames(media, every_n_bytes=64, fake=True)
    return frames.select(
        "media_id", "frame_idx", F.length("frame_payload").alias("frame_bytes")
    )

@query(
    "l11e_video_decode",
    oracle="""
WITH g AS (
  SELECT doc_id,
         octet_length(encode(coalesce(text, ''))) AS n,
         greatest(1, least(64, (octet_length(encode(coalesce(text, ''))) + 23) // 24)) AS h
  FROM documents WHERE doc_id < 200
)
SELECT doc_id AS media_id,
       'video' AS kind,
       (224 + (2 + n % 7) * (8 + 24 * h))::BIGINT AS n_bytes,
       8::INT                                     AS width,
       h::INT                                     AS height,
       (2 + n % 7)::BIGINT                        AS n_frames,
       ((2 + n % 7) + 1) // 2                     AS n_sampled,
       1.0::DOUBLE                                AS feat_sum
FROM g
""",
    survey="L11,X2,M2",
    category="llm",
)
def l11e_video_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video decode through the REAL pure-Python AVI codec (round 3 —
    the last media family de-stubbed): each document becomes an
    uncompressed 24-bit DIB AVI (2–8 frames of the BMP synth image,
    rolled per frame), ``extract_features(fake=False)`` walks the RIFF
    tree (hdrl/strf geometry, movi 00db frames) and the REAL
    ``sample_frames`` takes every 2nd frame, re-encoding each as a
    standalone BMP.  The oracle re-derives the full container size
    (224 header bytes + n_frames·(8 + 24·h)), geometry, frame count
    and sampled count from ``length(text)`` and the synthesis
    constants — a one-byte chunk-layout bug on either side fails the
    hash.  Plan: scan → mapInPandas ×2 → broadcast-joined counts; the
    only shuffle is the tiny per-media frame count."""
    from projectmapreduce_spark.operators.multimodal import sample_frames, synthesize_media

    d = scan(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    media = synthesize_media(d, "doc_id", "text", kind="video")
    feats = extract_features(media, dim=16, fake=False)
    sampled = (
        sample_frames(media, fake=False, every_n_frames=2)
        .groupBy("media_id")
        .agg(F.count(F.lit(1)).alias("n_sampled"))
    )
    return (
        feats.join(sampled, "media_id")
        .select(
            "media_id",
            "kind",
            "n_bytes",
            "width",
            "height",
            F.col("n_samples").alias("n_frames"),
            "n_sampled",
            dround(
                F.aggregate("features", F.lit(0.0), lambda a, x: a + x), 6
            ).alias("feat_sum"),
        )
    )


@query(
    "l11h_mpeg_frame_probe",
    oracle="""
WITH d AS (
  SELECT doc_id,
         1 + least(octet_length(encode(coalesce(text, ''))) // 200, 11) AS nf
  FROM documents
)
SELECT doc_id AS media_id,
       nf::BIGINT AS n_frames,
       list_sum(list_transform(range(nf),
         i -> 144000 * (CASE i % 3 WHEN 0 THEN 128 WHEN 1 THEN 160 ELSE 192 END)
              // 44100 + i % 2))::BIGINT                        AS n_bytes,
       (nf * 1152 * 1000 // 44100)::BIGINT                      AS duration_ms,
       list_sum(list_transform(range(nf),
         i -> CASE i % 3 WHEN 0 THEN 128 WHEN 1 THEN 160 ELSE 192 END))::BIGINT
                                                                AS kbps_sum
FROM d
""",
    survey="L11,X2",
    category="llm",
)
def l11h_mpeg_frame_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MPEG-1 Layer III frame-stream probe (VERDICT r5 stretch item,
    scoped to the honestly-implementable layer): each document becomes
    a syntactically REAL mp3 frame stream — correct sync words, header
    field encodings, 144000·kbps/Hz slot arithmetic, CRC-16(0x8005)
    over header remainder + side info on protected frames — and the
    real frame WALKER (operators/containers.py) re-derives every
    output value by parsing those bytes: frame count, walked byte
    total, sample-accurate duration, per-frame bitrate mix.  The
    oracle recomputes the synthesis schedule arithmetically from
    length(text), so a one-bit disagreement in sync masking, length
    slots or CRC span shifts a value and fails the hash.  PCM decode
    of the main-data region remains the documented boundary: the ISO
    11172-3 Huffman tables aren't available here, and a from-memory
    reconstruction would risk silently mis-decoding real files.
    Scale: scan → mapInPandas, shuffle-free — metadata extraction and
    corruption triage over a crawled audio lake."""
    from projectmapreduce_spark.operators.multimodal import probe_mpeg_streams

    d = scan(spark, sf_dir, "documents")
    return probe_mpeg_streams(d, "doc_id", "text")


@query(
    "l11i_mp4_box_probe",
    oracle="""
WITH d AS (
  SELECT doc_id,
         octet_length(encode(coalesce(text, ''))) AS L,
         1 + least(octet_length(encode(coalesce(text, ''))) // 150, 30) AS n
  FROM documents
)
SELECT doc_id AS media_id,
       14::BIGINT AS n_boxes,
       n::BIGINT AS n_samples,
       (25 * n)::BIGINT AS duration_ms,
       list_sum(list_transform(range(n), i -> 16 + (7 * i + L) % 32))::BIGINT
                                                                AS mdat_bytes,
       (400 + 4 * n
        + list_sum(list_transform(range(n), i -> 16 + (7 * i + L) % 32)))::BIGINT
                                                                AS total_bytes
FROM d
""",
    survey="L11,X2",
    category="llm",
)
def l11i_mp4_box_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MP4 / ISO BMFF box-tree probe: each document becomes a minimal
    structurally-valid MP4 (ftyp + full moov hierarchy with mvhd /
    tkhd / mdhd / hdlr / stts / stsz / stco + mdat) and the real
    recursive box WALKER validates size/nesting integrity, extracts
    the movie header and sample tables, and CROSS-CHECKS the stsz sum
    against the physical mdat payload — the truncated-upload triage a
    media lake runs before trusting any metadata.  The oracle pins the
    full box-size arithmetic: total_bytes = 400 fixed header/moov
    bytes + 4 per stsz entry + the mdat schedule (both constants also
    golden-byte-pinned in tests/test_containers.py), so a one-byte
    layout drift in writer or walker fails the hash.  Sample DECODE is
    the documented boundary (no codec config boxes are emitted).
    Scale: scan → mapInPandas, shuffle-free."""
    from projectmapreduce_spark.operators.multimodal import probe_mp4_files

    d = scan(spark, sf_dir, "documents")
    return probe_mp4_files(d, "doc_id", "text")


# ---------- L13–L16: training-data pipeline verbs (round 2) ----------


@query(
    "l13_deterministic_split",
    oracle="""
WITH s AS (
  SELECT source, n_chars,
         CASE WHEN ((doc_id * 2654435761 + 0) % 4294967296) % 100 < 80 THEN 'train'
              WHEN ((doc_id * 2654435761 + 0) % 4294967296) % 100 < 90 THEN 'val'
              ELSE 'test' END AS split
  FROM documents
)
SELECT split, count(*) AS n_docs, count(DISTINCT source) AS n_sources,
       sum(n_chars)::BIGINT AS total_chars
FROM s GROUP BY split
""",
    survey="L13",
    category="llm",
)
def l13_deterministic_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible 80/10/10 train/val/test split by multiplicative id
    hash (operators/pipeline.py): a pure projection — no shuffle, no
    rand(), the same doc lands in the same split on every engine and
    every rebuild (the leak-free data-recipe contract)."""
    from projectmapreduce_spark.operators.pipeline import deterministic_split

    d = scan(spark, sf_dir, "documents")
    return (
        deterministic_split(d, "doc_id", train_pct=80, val_pct=10)
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("source").alias("n_sources"),
            F.sum("n_chars").alias("total_chars"),
        )
    )


@query(
    "l14_sequence_packing",
    oracle="""
WITH packed AS (
  SELECT source, n_chars,
         floor((sum(n_chars) OVER (PARTITION BY source ORDER BY doc_id
                                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                - n_chars) / 16384)::BIGINT AS chunk_id
  FROM documents
)
SELECT source, chunk_id, count(*) AS n_docs, sum(n_chars)::BIGINT AS chunk_chars
FROM packed GROUP BY source, chunk_id
""",
    survey="L14",
    category="llm",
)
def l14_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy contiguous packing of each source's documents (doc_id
    order) into 16 KiB-budget chunks — the context-window packing shape:
    one hash shuffle per stream + an in-partition running sum
    (operators/pipeline.py:pack_sequences), then a per-chunk rollup."""
    from projectmapreduce_spark.operators.pipeline import pack_sequences

    d = scan(spark, sf_dir, "documents")
    packed = pack_sequences(d, "source", "doc_id", "n_chars", budget=16384)
    return packed.groupBy("source", "chunk_id").agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("n_chars").alias("chunk_chars")
    )


@query(
    "l15_mixture_sampling",
    oracle="""
WITH w AS (
  SELECT doc_id, source, n_chars,
         CASE (substr(source, 4)::BIGINT % 4)
           WHEN 0 THEN 100 WHEN 1 THEN 50 WHEN 2 THEN 25 ELSE 10 END AS keep_pct
  FROM documents
)
SELECT source, count(*) AS n_kept, sum(n_chars)::BIGINT AS kept_chars
FROM w
WHERE ((doc_id * 2654435761 + 1) % 4294967296) % 100 < keep_pct
GROUP BY source
""",
    survey="L15",
    category="llm",
)
def l15_mixture_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic training-mixture downsampling: per-source keep
    rates (100/50/25/10 % by source shard) applied as a hash filter —
    exact reproducible rates with no rand() and no extra counting pass;
    a pushed-down filter, zero shuffle
    (operators/pipeline.py:mixture_sample)."""
    from projectmapreduce_spark.operators.pipeline import mixture_sample

    d = scan(spark, sf_dir, "documents")
    keep_pct = (
        F.when(F.substring("source", 4, 10).cast("bigint") % 4 == 0, 100)
        .when(F.substring("source", 4, 10).cast("bigint") % 4 == 1, 50)
        .when(F.substring("source", 4, 10).cast("bigint") % 4 == 2, 25)
        .otherwise(10)
    )
    return (
        mixture_sample(d, "doc_id", keep_pct, salt=1)
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_kept"), F.sum("n_chars").alias("kept_chars"))
    )


@query(
    "l16_pii_redaction",
    oracle="""
WITH aug AS (
  SELECT doc_id,
         text || ' contact user' || doc_id::VARCHAR || '@example.com or 555-'
              || lpad((doc_id % 1000)::VARCHAR, 3, '0') || '-'
              || lpad((doc_id % 10000)::VARCHAR, 4, '0') AS t
  FROM documents WHERE doc_id < 200
)
SELECT doc_id,
       regexp_replace(regexp_replace(t,
           '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}', '[REDACTED]', 'g'),
           '[0-9]{3}[- .][0-9]{3}[- .][0-9]{4}', '[REDACTED]', 'g') AS redacted,
       len(regexp_extract_all(t, '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}'))
         + len(regexp_extract_all(
               regexp_replace(t, '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}', '', 'g'),
               '[0-9]{3}[- .][0-9]{3}[- .][0-9]{4}')) AS n_pii
FROM aug
""",
    survey="L16",
    category="llm",
)
def l16_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing over text: email + phone patterns (Java/RE2-common
    syntax) replaced with a redaction token, plus a per-doc match count.
    The fixture corpus carries no PII, so each doc is augmented with a
    deterministic doc_id-derived contact string — identically on both
    engines — before scrubbing; the redacted text itself is the
    value-checked output (operators/pipeline.py:redact_pii)."""
    from projectmapreduce_spark.operators.pipeline import pii_count, redact_pii

    d = scan(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    aug = d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or 555-"),
            F.lpad((F.col("doc_id") % 1000).cast("string"), 3, "0"),
            F.lit("-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        ).alias("t"),
    )
    return aug.select(
        "doc_id",
        redact_pii("t").alias("redacted"),
        pii_count("t").alias("n_pii"),
    )


@query(
    "l17_dedup_clusters",
    oracle="""
WITH RECURSIVE words AS (
  SELECT doc_id, string_split_regex(text, '\\s+') AS w FROM documents
),
sh AS (
  SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(w) - 1),
         i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS token
  FROM words WHERE len(w) >= 3
),
sizes AS (SELECT doc_id, count(*) AS n_tok FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
  FROM sh a JOIN sh b ON a.token = b.token AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
edges AS (
  SELECT id_a, id_b FROM inter
  JOIN sizes sa ON sa.doc_id = id_a
  JOIN sizes sb ON sb.doc_id = id_b
  WHERE n_inter::DOUBLE / (sa.n_tok + sb.n_tok - n_inter) >= 0.5
),
sym AS (
  SELECT id_a AS src, id_b AS dst FROM edges
  UNION ALL
  SELECT id_b, id_a FROM edges
),
reach(id, r) AS (
  SELECT src, src FROM sym
  UNION
  SELECT s.src, r.r FROM sym s JOIN reach r ON r.id = s.dst
)
SELECT id AS doc_id, min(r) AS component FROM reach GROUP BY id
""",
    survey="L17",
    category="llm",
)
def l17_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTERS, not just pairs: exact 3-gram Jaccard ≥ 0.5
    edges (the l2b join) closed into connected components by BSP
    min-label propagation (operators/dedup.py:connected_components) —
    the survivor-selection layer a production dedup needs (keep the
    min-id doc per cluster, drop the rest).  The oracle computes the
    same closure with a recursive CTE."""
    from projectmapreduce_spark.operators.dedup import connected_components

    d = scan(spark, sf_dir, "documents").filter(
        F.size(F.split(F.col("text"), r"[ \t\n\f\r]+")) >= 3
    )
    edges = ngram_jaccard_join(d, "doc_id", "text", threshold=0.5, n=3)
    comps = connected_components(edges)
    return comps.select(F.col("id").alias("doc_id"), F.col("comp").alias("component"))


@query(
    "l18_repetition_filter",
    oracle="""
WITH t AS (
  SELECT doc_id, string_split_regex(trim(text, ' '), '\\s+') AS toks
  FROM documents
),
base AS (
  SELECT doc_id, toks, len(toks) AS n_tok,
         CASE WHEN len(toks) >= 2
              THEN list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1])
              ELSE [] END AS g2,
         CASE WHEN len(toks) >= 3
              THEN list_transform(range(1, len(toks) - 1),
                                  i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
              ELSE [] END AS g3
  FROM t
),
top2 AS (
  SELECT doc_id, max(c) AS max2 FROM (
    SELECT doc_id, gram, count(*) AS c
    FROM (SELECT doc_id, unnest(g2) AS gram FROM base) g
    GROUP BY doc_id, gram
  ) cc GROUP BY doc_id
)
SELECT b.doc_id AS doc_id,
       b.n_tok::BIGINT AS n_tok,
       1.0 - len(list_distinct(b.toks)) / b.n_tok AS dup_token_frac,
       CASE WHEN len(b.g3) > 0
            THEN 1.0 - len(list_distinct(b.g3)) / len(b.g3)
            ELSE 0.0 END AS dup_3gram_frac,
       CASE WHEN b.n_tok >= 2 THEN 2.0 * top2.max2 / b.n_tok ELSE 0.0 END
         AS top_2gram_frac,
       (CASE WHEN b.n_tok >= 2 THEN 2.0 * top2.max2 / b.n_tok ELSE 0.0 END) <= 0.18
         AND (CASE WHEN len(b.g3) > 0
                   THEN 1.0 - len(list_distinct(b.g3)) / len(b.g3)
                   ELSE 0.0 END) <= 0.6 AS keep
FROM base b LEFT JOIN top2 ON b.doc_id = top2.doc_id
""",
    survey="L18",
    category="llm",
)
def l18_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L18: Gopher-style repetition/boilerplate gate [Rae et al. 2021
    §A1.1 — public paper], token-adapted: dup-token and dup-3-gram
    fractions are computed inside the row (array_distinct — zero
    shuffle), the top-2-gram mode via ONE (doc, gram) hash aggregate;
    ``keep`` applies the documented thresholds.  Every division is an
    exact IEEE int/int divide, bit-identical across engines — no
    rounding needed."""
    from projectmapreduce_spark.operators.text import repetition_stats

    d = scan(spark, sf_dir, "documents")
    stats = repetition_stats(d, "doc_id", "text")
    return stats.select(
        F.col("id").alias("doc_id"),
        "n_tok",
        "dup_token_frac",
        "dup_3gram_frac",
        "top_2gram_frac",
        ((F.col("top_2gram_frac") <= 0.18) & (F.col("dup_3gram_frac") <= 0.6)).alias(
            "keep"
        ),
    )


@query(
    "l19_contamination_check",
    oracle="""
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(text, ' '), '\\s+') AS t FROM documents
),
sh AS (
  SELECT DISTINCT doc_id, gram FROM (
    SELECT doc_id,
           unnest(CASE WHEN len(t) >= 5
                       THEN list_transform(range(1, len(t) - 3),
                            i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' '
                                 || t[i+3] || ' ' || t[i+4])
                       ELSE [] END) AS gram
    FROM toks
  ) u
),
bench AS (SELECT DISTINCT gram FROM sh WHERE doc_id % 23 = 0),
train AS (SELECT * FROM sh WHERE doc_id % 23 <> 0),
tot AS (SELECT doc_id, count(*) AS n_grams FROM train GROUP BY doc_id),
ov AS (
  SELECT doc_id, count(*) AS n_overlap
  FROM train JOIN bench USING (gram) GROUP BY doc_id
)
SELECT t.doc_id AS doc_id,
       t.n_grams::BIGINT AS n_grams,
       coalesce(ov.n_overlap, 0)::BIGINT AS n_overlap,
       coalesce(ov.n_overlap, 0) / t.n_grams AS contamination_frac,
       coalesce(ov.n_overlap, 0) / t.n_grams > 0.05 AS contaminated
FROM tot t LEFT JOIN ov ON t.doc_id = ov.doc_id
""",
    survey="L19",
    category="llm",
)
def l19_contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L19: decontamination — training docs (doc_id % 23 != 0) checked
    for distinct-5-gram overlap against a deterministic held-out
    'benchmark' slice (doc_id % 23 == 0).  The benchmark shingle set is
    broadcast (eval sets are small); the corpus side never shuffles for
    the match.  Fractions are exact int/int IEEE divides — bit-identical
    across engines."""
    from projectmapreduce_spark.operators.pipeline import contamination_check

    d = scan(spark, sf_dir, "documents")
    bench = d.filter(F.col("doc_id") % 23 == 0)
    train = d.filter(F.col("doc_id") % 23 != 0)
    out = contamination_check(train, bench, "doc_id", "text", n=5, max_frac=0.05)
    return out.withColumnRenamed("id", "doc_id")


@query(
    "l20_epoch_shuffle",
    oracle="""
WITH k AS (
  SELECT doc_id,
         ((doc_id * 2654435761 + 0) % 4294967296) AS key_e0,
         ((doc_id * 2654435761 + 1) % 4294967296) AS key_e1
  FROM documents
)
SELECT doc_id,
       key_e0::BIGINT AS key_e0,
       key_e1::BIGINT AS key_e1,
       row_number() OVER (ORDER BY key_e0, doc_id)::BIGINT AS epoch0_pos
FROM k
""",
    survey="L20",
    category="llm",
)
def l20_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L20: epoch-reproducible corpus shuffle — each epoch's
    deterministic permutation key plus the materialized position for
    epoch 0.  Keys are exact bigint multiplicative hashes (identical in
    any engine, any cluster size, any partition layout — the
    reproducibility rand() cannot give).  The epoch-0 position
    materializes via ``global_sort_rank``: repartitionByRange on the
    key (range shuffle) + per-range local rank + broadcast cumulative
    offsets — never a global single-partition window, so the declared
    query IS the 100 TB path."""
    from projectmapreduce_spark.operators.pipeline import epoch_shuffle
    from projectmapreduce_spark.operators.rank import global_sort_rank

    d = scan(spark, sf_dir, "documents")
    out = epoch_shuffle(
        epoch_shuffle(d, "doc_id", epoch=0, key_col="key_e0"),
        "doc_id",
        epoch=1,
        key_col="key_e1",
    )
    ranked = global_sort_rank(
        out, [F.col("key_e0"), F.col("doc_id")], rank_col="epoch0_pos", dtype="long"
    )
    return ranked.select("doc_id", "key_e0", "key_e1", "epoch0_pos")


@query(
    "l21_quality_classifier",
    oracle="""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
),
feat AS (
  SELECT doc_id,
         ((list_reduce(list_prepend(0::BIGINT,
             list_transform(string_split(token, ''), c -> ascii(c)::BIGINT)),
             (acc, x) -> (acc * 31 + x) % 4294967296)
           * 1540483477) % 4294967296) % 1024 AS bucket
  FROM toks
),
weights AS (
  SELECT b AS bucket,
         ((b * 2654435761 + 7) % 4294967296) % 2001 - 1000 AS weight
  FROM (SELECT unnest(range(1024)) AS b)
),
scored AS (
  SELECT doc_id AS id, count(*)::BIGINT AS n_tokens,
         sum(weight)::BIGINT AS score_raw
  FROM feat JOIN weights USING (bucket)
  GROUP BY doc_id
)
SELECT id, n_tokens, score_raw,
       score_raw / n_tokens AS mean_weight,
       (score_raw / n_tokens > 0) AS keep
FROM scored
""",
    survey="L21,L8",
    category="llm",
)
def l21_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L21: hashed-n-gram linear quality classifier — the fastText-
    style scorer every pretraining corpus runs as a quality gate,
    expressed as pure relational ops: feature-hash tokens to a fixed
    1024-bucket space, broadcast-join the (bucket, weight) model
    table, one per-doc sum, threshold the mean.  Scoring a 100 TB
    corpus is a map-side join + one keyed aggregate — the model never
    shuffles and no Python runs.  Integer weights make the score
    bigint-exact and the mean one exact int/int IEEE divide, so even
    the float column hash-matches DuckDB.  The demo weight table
    stands in for trained weights; the plumbing is what's declared."""
    from projectmapreduce_spark.operators.text import demo_weights, hashed_linear_score

    d = scan(spark, sf_dir, "documents")
    return hashed_linear_score(d, "doc_id", "text", demo_weights(spark, 1024), 1024)


@query(
    "l22_doc_fingerprint",
    oracle="""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
),
sh AS (
  SELECT doc_id,
         list_transform(range(0, greatest(len(toks) - 5, 0) + 1),
                        i -> array_to_string(toks[i + 1 : i + 5], ' ')) AS shingles
  FROM t
)
SELECT doc_id,
       list_min(list_transform(shingles,
         s -> list_reduce(list_prepend(0::BIGINT,
                list_transform(string_split(s, ''), c -> ascii(c)::BIGINT)),
                (acc, x) -> (acc * 31 + x) % 4294967296))) AS fp
FROM sh
""",
    survey="L22,F5",
    category="llm",
)
def l22_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L22: winnowing-style document fingerprint — min poly-hash over
    5-token shingles, the document's 'rarest window'.  Near-identical
    docs share the fingerprint with high probability, making it the
    cheap blocking key for near-dup candidate generation (a one-column
    groupBy instead of a 64-hash MinHash signature when recall demands
    are modest).  Entirely in-row higher-order functions — zero
    shuffle below the project, and the hash family is the same
    engine-exact arithmetic as A12/L21, so every fingerprint
    hash-matches DuckDB.  (`operators/text.py:rolling_shingle_fingerprint`
    is the crc32 twin used internally; this declared form swaps in the
    cross-engine hash to carry a full SQL oracle.)"""
    from projectmapreduce_spark.operators.sketch import poly_hash

    d = scan(spark, sf_dir, "documents")
    arr = F.split("text", " ")
    shingles = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(arr) - 5, F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(arr, i + 1, 5)),
    )
    fp = F.array_min(F.transform(shingles, lambda s: poly_hash(s)))
    return d.select("doc_id", fp.alias("fp"))


@query(
    "l23_passage_dedup",
    oracle="""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
),
idx AS (
  SELECT doc_id, toks, unnest(range(0, (len(toks) + 9) // 10)) AS pos FROM t
),
ch AS (
  SELECT doc_id, pos,
         array_to_string(toks[pos * 10 + 1 : pos * 10 + 10], ' ') AS passage
  FROM idx
),
r AS (
  SELECT doc_id, pos, passage,
         row_number() OVER (PARTITION BY passage ORDER BY doc_id, pos) AS rn
  FROM ch
)
SELECT doc_id,
       count(*)::BIGINT                          AS n_passages,
       sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END)::BIGINT AS n_dropped,
       coalesce(string_agg(CASE WHEN rn = 1 THEN passage END, ' ' ORDER BY pos), '') AS clean_text
FROM r GROUP BY doc_id
""",
    survey="L23,L1",
    category="llm",
)
def l23_passage_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L23: cross-document passage dedup (the C4-style sub-document
    verb): chunk each doc into non-overlapping 10-token passages, keep
    only each passage's globally-FIRST occurrence (ordered by doc_id,
    position), and reassemble documents without the repeated text —
    boilerplate and copy-pasted passages vanish corpus-wide while one
    canonical copy survives.  Whole-doc dedup (L1/L2) can't do this:
    it keeps or drops entire documents.

    Shape: chunking is in-row HOFs (no shuffle); the only exchanges
    are the per-passage first-occurrence window and the per-doc
    reassembly — both single hash shuffles.  At 100 TB, partition the
    window by poly_hash(passage) instead of the passage string to cut
    shuffle bytes ~10× (kept as the string here so the oracle is
    byte-exact); reassembly collects ≤ doc-length arrays, bounded by
    the corpus's max doc size."""
    d = scan(spark, sf_dir, "documents")
    arr = F.split("text", " ")
    n_chunks = ((F.size(arr) + F.lit(9)) / F.lit(10)).cast("long")
    chunks = F.transform(
        F.sequence(F.lit(0).cast("long"), n_chunks - 1),
        lambda i: F.concat_ws(" ", F.slice(arr, (i * 10 + 1).cast("int"), 10)),
    )
    ch = d.select("doc_id", F.posexplode(chunks).alias("pos", "passage"))
    w = Window.partitionBy("passage").orderBy("doc_id", "pos")
    r = ch.select("doc_id", "pos", "passage", F.row_number().over(w).alias("rn"))
    kept = F.array_sort(F.collect_list(
        F.when(F.col("rn") == 1, F.struct("pos", "passage"))
    ))
    return r.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_passages"),
        F.sum(F.when(F.col("rn") > 1, 1).otherwise(0)).alias("n_dropped"),
        F.concat_ws(" ", F.transform(kept, lambda x: x["passage"])).alias("clean_text"),
    )


@query(
    "l24_context_chunking",
    oracle="""
WITH t AS (
  -- null = empty doc (one empty chunk): engines disagree downstream on
  -- NULL arrays (array_to_string(NULL) is NULL, Spark's concat_ws
  -- renders '') -- caught by the hostile-domain sweep
  SELECT doc_id, string_split(coalesce(text, ''), ' ') AS toks FROM documents
),
idx AS (
  SELECT doc_id, toks,
         unnest(range(0, CASE WHEN len(toks) > 32
                              THEN (len(toks) - 9) // 24 + 1
                              ELSE 1 END)) AS chunk_id
  FROM t
)
SELECT doc_id,
       chunk_id::BIGINT AS chunk_id,
       array_to_string(toks[chunk_id * 24 + 1 : chunk_id * 24 + 32], ' ')
         AS chunk_text,
       least(32, len(toks) - chunk_id * 24)::BIGINT AS n_tokens
FROM idx
""",
    survey="L24,M1",
    category="llm",
)
def l24_context_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L24: overlapping context-window chunking — split each document
    into windows of 32 tokens advancing by a 24-token stride (8-token
    overlap), the tokenize-and-window precursor to sequence packing
    (L14) and the chunk shape retrieval corpora index.  Overlap
    preserves cross-boundary context that hard cuts (L23's passages)
    destroy; every token lands in at least one chunk and the final
    chunk is allowed to run short.

    Shape: pure in-row higher-order functions over the token array —
    the 1→N chunk expansion happens inside the projection, so the
    operator is zero-shuffle and scales linearly with corpus bytes.
    The ~33% duplication factor (window/stride) multiplies OUTPUT
    bytes, not shuffle bytes; at 100 TB the chunk writer should
    partition by hash(doc_id) so downstream packing reads co-located
    chunks."""
    d = scan(spark, sf_dir, "documents")
    # null = empty doc, mirrored in the oracle's coalesce (see note)
    arr = F.split(F.coalesce(F.col("text"), F.lit("")), " ")
    n = F.size(arr)
    # ceil((n - 32) / 24) extra chunks past the first; (n-32+23) = n-9.
    n_chunks = F.when(
        n > 32, ((n - F.lit(9)) / F.lit(24)).cast("long") + 1
    ).otherwise(F.lit(1).cast("long"))
    chunks = F.transform(
        F.sequence(F.lit(0).cast("long"), n_chunks - 1),
        lambda i: F.concat_ws(" ", F.slice(arr, (i * 24 + 1).cast("int"), 32)),
    )
    ch = d.select(
        "doc_id", n.alias("n_toks"), F.posexplode(chunks).alias("chunk_id", "chunk_text")
    )
    return ch.select(
        "doc_id",
        F.col("chunk_id").cast("long").alias("chunk_id"),
        "chunk_text",
        F.least(F.lit(32), F.col("n_toks") - F.col("chunk_id") * 24)
        .cast("long")
        .alias("n_tokens"),
    )


@query(
    "l25_ngram_stats",
    oracle="""
WITH t AS (
  SELECT string_split(text, ' ') AS toks FROM documents
),
b AS (
  SELECT toks[i + 1] AS w1, toks[i + 2] AS w2
  FROM (SELECT toks, unnest(range(0, len(toks) - 1)) AS i FROM t)
),
c AS (
  SELECT w1, w2, count(*)::BIGINT AS n FROM b GROUP BY w1, w2
),
r AS (
  SELECT w1, w2, n,
         row_number() OVER (PARTITION BY w1 ORDER BY n DESC, w2 ASC) AS rnk
  FROM c
)
SELECT w1, w2, n, rnk::BIGINT AS rnk FROM r WHERE rnk <= 3
""",
    survey="L25,A1,O4",
    category="llm",
)
def l25_ngram_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L25: corpus bigram statistics — global bigram counts plus the
    top-3 continuations per leading token, the building block for
    n-gram language-model scoring, perplexity-based quality filters,
    and tokenizer-vocabulary diagnostics over a training corpus.

    Shape: bigrams are generated in-row by zipping the token array
    with itself shifted one position (zero shuffle below the count),
    then ONE hash aggregate on (w1, w2) — partial map-side counts
    collapse duplicate bigrams before the exchange, so shuffle volume
    is bounded by per-partition vocabulary, not corpus tokens.  The
    per-w1 top-3 window runs on the (small) aggregated table.  Ties
    broken by lexicographic continuation, so the rank boundary is
    engine-deterministic."""
    d = scan(spark, sf_dir, "documents")
    arr = F.split("text", " ")
    pairs = F.zip_with(
        F.slice(arr, 1, F.size(arr) - 1),
        F.slice(arr, 2, F.size(arr) - 1),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    bg = d.select(F.explode(pairs).alias("bg")).select("bg.w1", "bg.w2")
    counts = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("w1").orderBy(F.col("n").desc(), F.col("w2").asc())
    return (
        counts.select("w1", "w2", "n", F.row_number().over(w).cast("long").alias("rnk"))
        .filter(F.col("rnk") <= 3)
    )


@query(
    "l26_bm25_scoring",
    oracle="""
WITH tok AS (
  SELECT doc_id, unnest(string_split_regex(trim(text, ' '), '\\s+')) AS token FROM documents
),
tf AS (SELECT doc_id AS id, token, count(*) AS tf FROM tok GROUP BY 1, 2),
dl AS (SELECT doc_id AS id, count(*) AS dl FROM tok GROUP BY 1),
dfreq AS (SELECT token, count(DISTINCT doc_id) AS df_docs FROM tok GROUP BY token),
sc AS (
  SELECT (SELECT count(*)::DOUBLE FROM documents) AS n_docs,
         (SELECT avg(dl) FROM dl) AS avgdl
)
SELECT tf.id, tf.token, tf.tf, dfreq.df_docs, dl.dl,
       round(
         ln(1.0 + (sc.n_docs - dfreq.df_docs + 0.5) / (dfreq.df_docs + 0.5))
         * ((tf.tf * 2.2) / (tf.tf + 1.2 * (0.25 + (0.75 * dl.dl) / sc.avgdl))),
         6
       ) AS bm25
FROM tf JOIN dl USING (id) JOIN dfreq USING (token) CROSS JOIN sc
WHERE tf.id < 50
""",
    survey="L26,A1,J2",
    category="llm",
)
def l26_bm25_scoring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L26: BM25 term relevance over the corpus (k1=1.2, b=0.75,
    Lucene ``1 +`` idf) — the retrieval-index scoring pass for RAG
    corpora.  Same relational shape as TF-IDF plus per-doc length
    normalization; df table and the (N, avgdl) scalars broadcast, the
    token table shuffles once.  The expression tree is mirrored
    parenthesis-for-parenthesis in the oracle so doubles match
    bit-for-bit before the round(6)."""
    d = scan(spark, sf_dir, "documents")
    out = bm25(d, "doc_id", "text").filter(F.col("id") < 50)
    return out.select("id", "token", "tf", "df_docs", "dl", dround("bm25", 6).alias("bm25"))


@query(
    "l27_quantized_dot",
    oracle="""
WITH v AS (
  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS vec
  FROM embeddings WHERE vec_id < 16
),
q AS (
  SELECT vec_id, vec,
         list_max(list_transform(vec, x -> abs(x))) / 127.0 AS scale
  FROM v
),
qq AS (
  SELECT vec_id, vec, scale,
         CASE WHEN scale = 0 THEN list_transform(vec, x -> 0)
              ELSE list_transform(
                     vec,
                     x -> greatest(-127, least(127, floor(x / scale + 0.5)::INTEGER))
                   )
         END AS qvec
  FROM q
),
pairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         a.qvec AS qa, b.qvec AS qb,
         a.scale AS sa, b.scale AS sb,
         a.vec AS va, b.vec AS vb
  FROM qq a JOIN qq b ON a.vec_id < b.vec_id
),
dots AS (
  SELECT id_a, id_b, sum(x::BIGINT * y::BIGINT)::BIGINT AS qdot
  FROM (SELECT id_a, id_b, unnest(qa) AS x, unnest(qb) AS y FROM pairs)
  GROUP BY 1, 2
)
SELECT p.id_a, p.id_b, d.qdot,
       round(d.qdot * p.sa * p.sb, 6) AS approx_dot,
       round(list_dot_product(p.va, p.vb), 6) AS exact_dot
FROM pairs p JOIN dots d USING (id_a, id_b)
""",
    survey="L27",
    category="llm",
)
def l27_quantized_dot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L27: int8 embedding quantization + exact integer dot product —
    the 4× storage/bandwidth cut a 100 TB embedding store takes before
    ANN serving.  Quantization (`operators/similarity.py:quantize_int8`)
    is a zero-shuffle projection; codes use ``floor(x/scale + 0.5)``
    (never ``round`` — engines disagree on half-even) so the int8
    codes, and therefore the bigint dot products, are integer-exact
    and reproducible on any engine.  The demo pairs 16 vectors
    all-ways (120 rows) and reports the quantized dot alongside the
    exact double dot — the quantization-error budget made visible."""
    e = scan(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 16)
    qd = quantize_int8(e, "vec_id", "embedding")
    a = qd.select(
        F.col("vec_id").alias("id_a"),
        F.col("scale").alias("sa"),
        F.col("qvec").alias("qa"),
        F.col("embedding").alias("va"),
    )
    b = qd.select(
        F.col("vec_id").alias("id_b"),
        F.col("scale").alias("sb"),
        F.col("qvec").alias("qb"),
        F.col("embedding").alias("vb"),
    )
    pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    qdot = int_dot(F.col("qa"), F.col("qb"))
    return pairs.select(
        "id_a",
        "id_b",
        qdot.alias("qdot"),
        dround(qdot * F.col("sa") * F.col("sb"), 6).alias("approx_dot"),
        dround(dot(as_double(F.col("va")), as_double(F.col("vb"))), 6).alias("exact_dot"),
    )


@query(
    "l29_data_card",
    oracle="""
WITH per AS (
  SELECT source, lang,
         count(*)::BIGINT AS n_docs,
         sum(length(text))::BIGINT AS total_chars,
         sum(len(regexp_extract_all(text, '(\\w+|[^\\w\\s])')))::BIGINT AS total_tokens
  FROM documents
  GROUP BY source, lang
)
SELECT source, lang, n_docs, total_chars, total_tokens,
       round(total_tokens / (SELECT sum(total_tokens)::DOUBLE FROM per), 6) AS token_share
FROM per
""",
    survey="L29,A1,W3",
    category="llm",
)
def l29_data_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L29: the training-mix data card — per (source, lang) doc/char/
    BPE-ish-token totals plus each cell's share of corpus tokens, the
    report every mixture recipe (L15) is tuned against.  One hash
    aggregate over the corpus (map-side partials bound the shuffle by
    the source×lang key space); the corpus-total denominator is a
    1-row broadcast, not a second scan — at 100 TB this is a
    cells-sized exchange, never a data re-read."""
    d = scan(spark, sf_dir, "documents")
    per = d.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.length("text")).alias("total_chars"),
        F.sum(bpe_ish_token_count(F.col("text")).cast("long")).alias("total_tokens"),
    )
    total = per.agg(F.sum("total_tokens").cast("double").alias("__t"))
    return per.crossJoin(F.broadcast(total)).select(
        "source",
        "lang",
        "n_docs",
        "total_chars",
        "total_tokens",
        dround(F.col("total_tokens") / F.col("__t"), 6).alias("token_share"),
    )


@query("l28_semantic_dedup", oracle=None, survey="L28,L2,L4", category="llm")
def l28_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L28: SemDeDup-style semantic dedup — k-means-cluster the
    embeddings, then keep-first within each cluster among pairs with
    cosine ≥ 0.5 (`operators/similarity.py:semantic_dedup`).  The
    cluster blocking bounds the pair join per-cluster (sum n_c², knob
    k), exactly the role LSH bands play for text near-dup.  Rows-only:
    the learned centroids are runtime driver state, not
    SQL-expressible; survivor-set equality vs a dense numpy reference
    is pinned in tests/test_operators.py."""
    from projectmapreduce_spark.operators.similarity import semantic_dedup

    e = scan(spark, sf_dir, "embeddings")
    return semantic_dedup(e, "vec_id", "embedding", threshold=0.5, k_clusters=8, iters=1)


@query(
    "l30_corpus_funnel",
    oracle="""
WITH en AS (SELECT * FROM documents WHERE lang = 'en'),
q AS (
  SELECT * FROM en
  WHERE len(string_split_regex(trim(text, ' '), '\\s+')) >= 10
    AND length(regexp_replace(text, '\\s+', '', 'g'))
        / len(string_split_regex(trim(text, ' '), '\\s+')) <= 12.0
),
dd AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY sha256(text) ORDER BY doc_id) AS rn FROM q
  ) WHERE rn = 1
),
tok AS (
  SELECT DISTINCT doc_id, unnest(string_split_regex(text, '\\s+')) AS token FROM dd
),
sizes AS (SELECT doc_id, count(*) AS n_tok FROM tok GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
  FROM tok a JOIN tok b ON a.token = b.token AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
dup_ids AS (
  SELECT DISTINCT id_b FROM inter
  JOIN sizes sa ON sa.doc_id = id_a
  JOIN sizes sb ON sb.doc_id = id_b
  WHERE n_inter::DOUBLE / (sa.n_tok + sb.n_tok - n_inter) >= 0.8
),
nd AS (SELECT * FROM dd WHERE doc_id NOT IN (SELECT id_b FROM dup_ids)),
tr AS (
  SELECT * FROM nd
  WHERE ((doc_id * 2654435761 + 0) % 4294967296) % 100 < 80
)
SELECT * FROM (
  SELECT 1::BIGINT AS stage_ord, 'raw' AS stage, (SELECT count(*) FROM documents) AS n_docs
  UNION ALL SELECT 2, 'lang_en', (SELECT count(*) FROM en)
  UNION ALL SELECT 3, 'quality', (SELECT count(*) FROM q)
  UNION ALL SELECT 4, 'exact_dedup', (SELECT count(*) FROM dd)
  UNION ALL SELECT 5, 'near_dedup', (SELECT count(*) FROM nd)
  UNION ALL SELECT 6, 'train_split', (SELECT count(*) FROM tr)
)
""",
    survey="L30,L1,L2,L7,L8,L13",
    category="llm",
)
def l30_corpus_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L30: the END-TO-END training-corpus funnel — language filter →
    quality gate → exact dedup → unigram-Jaccard near-dedup →
    train-split, composed from the SAME operators the individual rows
    declare (quality_filter, exact_dedup, ngram_jaccard_join,
    deterministic_split), with per-stage surviving-document counts as
    the result (the funnel report every corpus build publishes).

    Composition is the point: each stage's output feeds the next with
    no materialization between (one lazy plan; Catalyst fuses the
    projection stages), and the whole funnel is SQL-oracled — the
    DuckDB mirror recomputes all six stage counts independently, so a
    semantic drift in ANY stage breaks the hash."""
    from pyspark.sql.window import Window

    from projectmapreduce_spark.operators.dedup import ngram_jaccard_join
    from projectmapreduce_spark.operators.pipeline import hash_bucket
    from projectmapreduce_spark.operators.text import _STOPWORDS, tokenize

    # Single-pass CUMULATIVE-FLAG form (round-7 rework).  The original
    # composition unioned six independent counts, so stage k's plan
    # re-derived stages 1..k — the corpus re-scanned per stage and the
    # expensive jaccard join executed TWICE (91 shuffle exchanges at
    # sf0.01).  Here every stage contributes one boolean survival flag
    # on ONE pass over the corpus; the only extra lineage is the
    # near-dup candidate derivation the join needs anyway, and the six
    # counts are conditional sums in a single aggregate (the stage
    # semantics — and the DuckDB oracle — are unchanged; each flag is
    # the conjunction of all earlier flags, exactly the old
    # filter-chain).
    d = scan(spark, sf_dir, "documents")
    toks = tokenize(F.col("text"))
    n_tok = F.size(toks)
    mean_len = F.length(F.regexp_replace(F.col("text"), r"[ \t\n\f\r]+", "")) / n_tok
    stop_arr = F.array(*[F.lit(w) for w in _STOPWORDS])
    stop_ratio = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t))) / n_tok
    quality_pred = (n_tok >= 10) & (mean_len <= 12.0) & (stop_ratio >= 0.0)

    lang_ok = F.col("lang") == "en"
    q_ok = F.coalesce(lang_ok & quality_pred, F.lit(False))
    flagged = d.select("doc_id", "text", lang_ok.alias("lang_ok"), q_ok.alias("q_ok"))
    # exact-dedup survivor among q_ok rows: min doc_id per content hash
    # (doc_id is the PK, so min == the old row_number()==1 survivor)
    wh = Window.partitionBy(F.sha2(F.col("text"), 256))
    flagged = flagged.withColumn(
        "ex_ok",
        F.col("q_ok")
        & (F.col("doc_id") == F.min(F.when(F.col("q_ok"), F.col("doc_id"))).over(wh)),
    )
    dups = (
        ngram_jaccard_join(
            flagged.filter(F.col("ex_ok")).select("doc_id", "text"),
            "doc_id",
            "text",
            threshold=0.8,
            n=1,
        )
        .select(F.col("id_b").alias("doc_id"), F.lit(True).alias("is_dup"))
        .distinct()
    )
    split_train = (
        F.when(hash_bucket("doc_id", 100, 0) < 80, F.lit("train")).otherwise(F.lit(""))
        == "train"
    )
    final = flagged.join(dups, "doc_id", "left").select(
        "lang_ok",
        "q_ok",
        "ex_ok",
        (F.col("ex_ok") & F.col("is_dup").isNull()).alias("near_ok"),
        (F.col("ex_ok") & F.col("is_dup").isNull() & split_train).alias("train_ok"),
    )
    c = final.agg(
        F.count(F.lit(1)).alias("raw"),
        F.sum(F.col("lang_ok").cast("long")).alias("lang_en"),
        F.sum(F.col("q_ok").cast("long")).alias("quality"),
        F.sum(F.col("ex_ok").cast("long")).alias("exact_dedup"),
        F.sum(F.col("near_ok").cast("long")).alias("near_dedup"),
        F.sum(F.col("train_ok").cast("long")).alias("train_split"),
    )
    names = ["raw", "lang_en", "quality", "exact_dedup", "near_dedup", "train_split"]
    return c.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).cast("long").alias("stage_ord"),
                        F.lit(n).alias("stage"),
                        F.col(n).alias("n_docs"),
                    )
                    for i, n in enumerate(names, start=1)
                ]
            )
        ).alias("s")
    ).select("s.*")


@query(
    "l31_bigram_perplexity",
    oracle="""
WITH tok AS (
  SELECT doc_id, string_split_regex(trim(text, ' '), '\\s+') AS toks FROM documents
),
bg AS (
  SELECT doc_id, t1.tok AS w1, toks[t1.i + 1] AS w2
  FROM tok, LATERAL (
    SELECT unnest(toks) AS tok, generate_subscripts(toks, 1) AS i
  ) AS t1
  WHERE t1.i < len(toks)
),
uni AS (SELECT w1, count(*) AS c1 FROM bg GROUP BY w1),
bi AS (SELECT w1, w2, count(*) AS c2 FROM bg GROUP BY w1, w2),
scored AS (
  SELECT bg.doc_id,
         ln((bi.c2 + 1.0) / (uni.c1 + 1.0)) AS lp
  FROM bg JOIN bi USING (w1, w2) JOIN uni USING (w1)
)
SELECT doc_id,
       count(*)::BIGINT AS n_bigrams,
       round(-avg(lp), 6) AS neg_mean_logp
FROM scored
GROUP BY doc_id
""",
    survey="L31,L25,L8",
    category="llm",
)
def l31_bigram_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L31: bigram language-model surprisal per document — the
    perplexity-style quality score (CCNet/Gopher pattern: docs whose
    token transitions are improbable under the corpus LM are noise).
    The 'model' is the corpus's own add-one-smoothed bigram table
    (L25's aggregates): score = −mean ln((c(w1,w2)+1)/(c(w1)+1)).
    Shape: in-row shifted-zip bigram generation, TWO vocabulary-sized
    count aggregates, then a broadcast-sized join back onto the bigram
    stream and one per-doc mean — at 100 TB the model tables are the
    only state and they are vocabulary-, not corpus-, sized.  The
    expression tree is engine-mirrored; per-bigram ln() then mean
    keeps the fold order canonical on both sides before round(6)."""
    d = scan(spark, sf_dir, "documents")
    arr = F.split(F.trim(F.col("text")), r"[ \t\n\f\r]+")
    pairs = F.zip_with(
        F.slice(arr, 1, F.size(arr) - 1),
        F.slice(arr, 2, F.size(arr) - 1),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    bg = d.select("doc_id", F.explode(pairs).alias("p")).select(
        "doc_id", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2")
    )
    # Round-11 (guide §2.4): the bigram model table is materialized
    # once (it is vocabulary²-, not corpus-, sized) and the unigram
    # table rolls up from it — c1(w1) = Σ_w2 c2(w1, w2) exactly, since
    # every bigram occurrence contributes once to its w1's unigram
    # count.  Before, uni and bi were two independent aggregates over
    # the lazy bigram stream and the scoring join's plan re-tokenized
    # the corpus a third time; now the corpus is tokenized twice (the
    # model build and the scoring stream), the algorithm's minimum.
    # Identical integer counts; the float expression tree is
    # untouched.
    bi = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2")).localCheckpoint(
        eager=True
    )
    uni = bi.groupBy("w1").agg(F.sum("c2").alias("c1"))
    lp = F.log((F.col("c2") + F.lit(1.0)) / (F.col("c1") + F.lit(1.0)))
    scored = (
        bg.join(F.broadcast(bi), ["w1", "w2"])
        .join(F.broadcast(uni), ["w1"])
        .select("doc_id", lp.alias("lp"))
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        dround(-F.avg("lp"), 6).alias("neg_mean_logp"),
    )


@query(
    "l32_source_cap",
    oracle="""
WITH k AS (
  SELECT doc_id, source,
         ((doc_id * 2654435761 + 97) % 4294967296) AS samp_key
  FROM documents
),
r AS (
  SELECT doc_id, source,
         row_number() OVER (PARTITION BY source ORDER BY samp_key, doc_id) AS samp_rank
  FROM k
)
SELECT doc_id, source, samp_rank::BIGINT AS samp_rank
FROM r
WHERE samp_rank <= 13
""",
    survey="L32,O5,W1",
    category="llm",
)
def l32_source_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L32: per-source document cap — the over-represented-source
    downsampler every corpus-mixing recipe needs (cap CommonCrawl,
    keep all of the small curated sets).

    Selection must be a deterministic UNIFORM sample per source, not
    "first N by id" (id order correlates with crawl time): each doc
    gets an exact bigint multiplicative-hash key (reproducible across
    engines/cluster sizes — same idiom as L20), and rank-within-source
    keeps the CAP smallest keys.  One shuffle on source for the rank;
    at 100 TB the window is per-source-partition-local, and sources
    hot enough to skew a partition get the L15/J11 salting treatment
    upstream.  Sources under the cap pass through whole — exactly the
    asymmetry mixture weighting (L15) can't express."""
    d = scan(spark, sf_dir, "documents").select("doc_id", "source")
    keyed = d.withColumn(
        "samp_key",
        (F.col("doc_id") * F.lit(2654435761) + F.lit(97)) % F.lit(4294967296),
    )
    w = Window.partitionBy("source").orderBy("samp_key", "doc_id")
    return (
        keyed.withColumn("samp_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("samp_rank") <= 13)
        .select("doc_id", "source", "samp_rank")
    )


@query(
    "l33_rrf_fusion",
    oracle="""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
),
tf AS (SELECT doc_id, token, count(*)::BIGINT AS tf FROM tok GROUP BY 1, 2),
qt AS (
  SELECT doc_id AS q_id, unnest(list_distinct(string_split(text, ' ')[1:5])) AS term
  FROM documents WHERE doc_id < 8
),
lex AS (
  SELECT qt.q_id, tf.doc_id AS hit_id,
         count(DISTINCT tf.token)::BIGINT AS n_hit, sum(tf.tf)::BIGINT AS tf_sum
  FROM qt JOIN tf ON tf.token = qt.term
  WHERE tf.doc_id <> qt.q_id
  GROUP BY 1, 2
),
lexc AS (
  SELECT q_id, hit_id, lex_rank FROM (
    SELECT q_id, hit_id,
           row_number() OVER (PARTITION BY q_id
                              ORDER BY n_hit DESC, tf_sum DESC, hit_id) AS lex_rank
    FROM lex) WHERE lex_rank <= 50
),
qq AS (
  SELECT vec_id,
         CASE WHEN scale = 0 THEN list_transform(vec, x -> 0)
              ELSE list_transform(
                     vec,
                     x -> greatest(-127, least(127, floor(x / scale + 0.5)::INTEGER)))
         END AS qvec
  FROM (SELECT vec_id, vec,
               list_max(list_transform(vec, x -> abs(x))) / 127.0 AS scale
        FROM (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS vec
              FROM embeddings))
),
dots AS (
  SELECT q_id, hit_id, sum(x::BIGINT * y::BIGINT)::BIGINT AS qdot
  FROM (SELECT q.vec_id AS q_id, e.vec_id AS hit_id,
               unnest(q.qvec) AS x, unnest(e.qvec) AS y
        FROM qq q JOIN qq e ON q.vec_id < 8 AND e.vec_id <> q.vec_id)
  GROUP BY 1, 2
),
semc AS (
  SELECT q_id, hit_id, sem_rank FROM (
    SELECT q_id, hit_id,
           row_number() OVER (PARTITION BY q_id
                              ORDER BY qdot DESC, hit_id) AS sem_rank
    FROM dots) WHERE sem_rank <= 50
),
fused AS (
  SELECT coalesce(l.q_id, s.q_id) AS q_id,
         coalesce(l.hit_id, s.hit_id) AS hit_id,
         l.lex_rank, s.sem_rank,
         round(CASE WHEN l.lex_rank IS NOT NULL THEN 1.0 / (60 + l.lex_rank) ELSE 0.0 END
             + CASE WHEN s.sem_rank IS NOT NULL THEN 1.0 / (60 + s.sem_rank) ELSE 0.0 END,
               8) AS rrf
  FROM lexc l FULL JOIN semc s ON l.q_id = s.q_id AND l.hit_id = s.hit_id
)
SELECT q_id, hit_id, lex_rank, sem_rank, rrf, fused_rank FROM (
  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY rrf DESC, hit_id) AS fused_rank
  FROM fused) WHERE fused_rank <= 10
""",
    survey="L33,L26,L27,W1,J3",
    category="llm",
)
def l33_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L33: hybrid-retrieval reciprocal-rank fusion (RRF, Cormack et
    al. SIGIR 2009) — fuse a LEXICAL ranking (query-term hits over the
    inverted-index shape) with a SEMANTIC ranking (int8-quantized
    embedding dot products) into one score per (query, document):
    rrf = Σ_signals 1/(60 + rank_signal), ranks from candidate lists
    capped at 50, top-10 fused hits per query.  This is the serving
    join of a RAG retrieval stack: BM25-ish recall + dense recall,
    fused without score calibration.

    Determinism contract: BOTH signals rank on integers (term-hit
    counts / summed tf; bigint quantized dots via the L27 floor(x/s +
    0.5) codes) with PK tiebreaks, so rank boundaries cannot drift on
    float ulps; the only floats are the final 1/(60+r) divides —
    identical IEEE expressions on both engines.

    Scale: candidate generation is an equi-join on term (posting
    lists; at 100 TB swap in BM25 L26 scores, same shape) and a
    broadcast-queries scoring pass (swap in the l4c/l4f ANN tiers for
    the dense leg — the fusion layer is unchanged).  Every window
    partitions by q_id, per-query state is ≤ 2×50 candidate rows, and
    the fusion itself is one (q_id, hit_id) full-outer join."""
    d = scan(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
    tf = toks.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    qt = (
        d.filter(F.col("doc_id") < 8)
        .select(
            F.col("doc_id").alias("q_id"),
            F.explode(F.array_distinct(F.slice(F.split("text", " "), 1, 5))).alias("term"),
        )
    )
    lex = (
        tf.join(F.broadcast(qt), (tf.token == qt.term) & (tf.doc_id != qt.q_id))
        .groupBy("q_id", F.col("doc_id").alias("hit_id"))
        .agg(
            F.countDistinct("token").alias("n_hit"),
            F.sum("tf").alias("tf_sum"),
        )
    )
    wl = Window.partitionBy("q_id").orderBy(
        F.col("n_hit").desc(), F.col("tf_sum").desc(), F.col("hit_id")
    )
    lexc = (
        lex.select("q_id", "hit_id", F.row_number().over(wl).cast("long").alias("lex_rank"))
        .filter(F.col("lex_rank") <= 50)
    )

    qd = quantize_int8(scan(spark, sf_dir, "embeddings"), "vec_id", "embedding")
    qside = qd.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("q_id"), F.col("qvec").alias("qa")
    )
    eside = qd.select(F.col("vec_id").alias("hit_id"), F.col("qvec").alias("qb"))
    ws = Window.partitionBy("q_id").orderBy(F.col("qdot").desc(), F.col("hit_id"))
    semc = (
        eside.join(F.broadcast(qside), F.col("hit_id") != F.col("q_id"))
        .select("q_id", "hit_id", int_dot(F.col("qa"), F.col("qb")).alias("qdot"))
        .select("q_id", "hit_id", F.row_number().over(ws).cast("long").alias("sem_rank"))
        .filter(F.col("sem_rank") <= 50)
    )

    fused = (
        lexc.withColumnsRenamed({"q_id": "lq", "hit_id": "lh"})
        .join(
            semc.withColumnsRenamed({"q_id": "sq", "hit_id": "sh"}),
            (F.col("lq") == F.col("sq")) & (F.col("lh") == F.col("sh")),
            "full_outer",
        )
        .select(
            F.coalesce("lq", "sq").alias("q_id"),
            F.coalesce("lh", "sh").alias("hit_id"),
            "lex_rank",
            "sem_rank",
            dround(
                F.when(F.col("lex_rank").isNotNull(), 1.0 / (60 + F.col("lex_rank"))).otherwise(0.0)
                + F.when(F.col("sem_rank").isNotNull(), 1.0 / (60 + F.col("sem_rank"))).otherwise(0.0),
                8,
            ).alias("rrf"),
        )
    )
    wf = Window.partitionBy("q_id").orderBy(F.col("rrf").desc(), F.col("hit_id"))
    return (
        fused.select(
            "q_id", "hit_id", "lex_rank", "sem_rank", "rrf",
            F.row_number().over(wf).cast("long").alias("fused_rank"),
        )
        .filter(F.col("fused_rank") <= 10)
    )


@query(
    "l34_weighted_sample",
    oracle="""
WITH keyed AS (
  SELECT source, doc_id,
         round(
           ln((list_reduce(list_transform(generate_series(1, 13),
                 i -> CASE WHEN ascii(substr(md5(doc_id::VARCHAR), i, 1)) BETWEEN 48 AND 57
                           THEN ascii(substr(md5(doc_id::VARCHAR), i, 1)) - 48
                           ELSE ascii(substr(md5(doc_id::VARCHAR), i, 1)) - 87 END::BIGINT),
                 (acc, n) -> acc * 16 + n) + 1)::DOUBLE
              / 4503599627370497::DOUBLE)
           / ln(1 + n_chars), 8) AS skey
  FROM documents
  WHERE n_chars > 0
)
SELECT source, doc_id, skey,
       row_number() OVER (PARTITION BY source ORDER BY skey DESC, doc_id) AS rank
FROM keyed
QUALIFY rank <= 10
ORDER BY source, rank
""",
    survey="L34",
    category="llm",
)
def l34_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L34: DETERMINISTIC weighted sampling without replacement — the
    Efraimidis–Spirakis reservoir (key = ln(u)/w, take the k largest)
    with the uniform u drawn from a PSEUDO-RANDOM FUNCTION of the
    row's own key instead of an RNG: u = (md5_52(doc_id)+1)/(2^52+1).
    This is how a 100 TB curation pipeline takes a quality-weighted
    subsample (w = ln(1+n_chars), longer docs proportionally likelier)
    that is REPRODUCIBLE run-to-run, resumable, and auditable — the
    E-S key construction gives exactly the weighted-without-replacement
    distribution when u is uniform, and the PRF makes the draw a pure
    function of the data.

    Engine-exactness: the PRF is the same md5 nibble fold as A16
    (bit-identical in both engines); ln() may differ in the last ulp
    between libms, so the SORT KEY is rounded to 8 decimals with a
    doc_id tiebreak — rank boundaries cannot drift on ulps (the same
    discipline as l33's integer ranks).  Top-k per stratum is one
    window over source — a per-group partial TakeOrdered under AQE, no
    global sort; at 100 TB the stratum count is the parallelism and
    the reservoir never materializes more than k rows per stratum
    after the window filter."""
    from projectmapreduce_spark.operators.sketch import md5_hash52

    d = scan(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    u = (md5_hash52("doc_id") + F.lit(1)).cast("double") / F.lit(float((1 << 52) + 1))
    keyed = d.select(
        "source",
        "doc_id",
        F.round(F.log(u) / F.log(F.lit(1) + F.col("n_chars")), 8).alias("skey"),
    )
    w = Window.partitionBy("source").orderBy(F.col("skey").desc(), F.col("doc_id"))
    return (
        keyed.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 10)
        .orderBy("source", "rank")
    )


@query(
    "l35_dataset_split",
    oracle="""
WITH assigned AS (
  SELECT source, n_chars, doc_id,
         list_reduce(list_transform(generate_series(1, 13),
             i -> CASE WHEN ascii(substr(md5(doc_id::VARCHAR), i, 1)) BETWEEN 48 AND 57
                       THEN ascii(substr(md5(doc_id::VARCHAR), i, 1)) - 48
                       ELSE ascii(substr(md5(doc_id::VARCHAR), i, 1)) - 87 END::BIGINT),
             (acc, n) -> acc * 16 + n) % 100 AS r
  FROM documents
)
SELECT CASE WHEN r < 96 THEN 'train' WHEN r < 98 THEN 'val' ELSE 'test' END AS split,
       source,
       count(*)::BIGINT AS n_docs,
       sum(n_chars)::BIGINT AS total_chars,
       sum(doc_id)::BIGINT AS id_checksum
FROM assigned
GROUP BY 1, 2
ORDER BY split, source
""",
    survey="L35",
    category="llm",
)
def l35_dataset_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L35: deterministic train/val/test assignment — the split a
    training pipeline must be able to RECOMPUTE years later from the
    data alone: each document's split is a pure function of its key
    (md5 PRF mod 100 → 96/2/2), so reshuffled storage, added shards,
    or a rerun on different hardware can never move a document across
    the contamination boundary.  This is the standard alternative to
    randomSplit(), whose assignment depends on partition layout and
    seed plumbing — exactly what a reproducibility audit rejects.

    Per (split, source) the query emits counts, char volume, and an
    id checksum, so downstream mixture weights (l15) and source caps
    (l32) can be validated against the same frame.  One groupBy
    shuffle; the PRF is the engine-exact A16 md5 fold, bit-identical
    in the oracle."""
    from projectmapreduce_spark.operators.sketch import md5_hash52

    d = scan(spark, sf_dir, "documents")
    r = md5_hash52("doc_id") % 100
    split = (
        F.when(r < 96, "train").when(r < 98, "val").otherwise("test").alias("split")
    )
    return (
        d.select(split, "source", "n_chars", "doc_id")
        .groupBy("split", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.sum("doc_id").alias("id_checksum"),
        )
        .orderBy("split", "source")
    )


_L36_TOKEN_HASH = """list_reduce(list_transform(generate_series(1, 13),
      i -> CASE WHEN ascii(substr(md5(tok), i, 1)) BETWEEN 48 AND 57
                THEN ascii(substr(md5(tok), i, 1)) - 48
                ELSE ascii(substr(md5(tok), i, 1)) - 87 END::BIGINT),
      (acc, n) -> acc * 16 + n)"""


@query(
    "l36_source_overlap_matrix",
    oracle=f"""
WITH tok AS (
  SELECT DISTINCT source, unnest(string_split_regex(trim(text, ' '), '\\s+')) AS tok
  FROM documents WHERE text IS NOT NULL AND trim(text, ' ') <> ''
),
h AS (
  SELECT DISTINCT source, {_L36_TOKEN_HASH} AS h FROM tok
),
sk AS (
  SELECT source, h FROM h
  QUALIFY row_number() OVER (PARTITION BY source ORDER BY h) <= 256
),
pairs AS (
  SELECT a.source AS g1, b.source AS g2
  FROM (SELECT DISTINCT source FROM sk) a
  JOIN (SELECT DISTINCT source FROM sk) b ON a.source < b.source
),
uni AS (
  SELECT p.g1, p.g2, s.h
  FROM pairs p JOIN sk s ON s.source = p.g1 OR s.source = p.g2
  GROUP BY 1, 2, 3
),
m AS (
  SELECT g1, g2, h FROM uni
  QUALIFY row_number() OVER (PARTITION BY g1, g2 ORDER BY h) <= 256
),
stats AS (
  SELECT g1, g2, count(*)::BIGINT AS k_eff, max(h) AS kth FROM m GROUP BY 1, 2
),
ovl AS (
  SELECT m.g1, m.g2, count(*)::BIGINT AS overlap
  FROM m
  JOIN sk sa ON sa.source = m.g1 AND sa.h = m.h
  JOIN sk sb ON sb.source = m.g2 AND sb.h = m.h
  GROUP BY 1, 2
)
SELECT s.g1, s.g2,
       coalesce(o.overlap, 0)::BIGINT AS overlap,
       s.k_eff,
       round(coalesce(o.overlap, 0)::DOUBLE / s.k_eff, 6) AS jaccard_est
FROM stats s LEFT JOIN ovl o ON s.g1 = o.g1 AND s.g2 = o.g2
ORDER BY jaccard_est DESC, s.g1, s.g2
""",
    survey="L36,A16",
    category="llm",
)
def l36_source_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L36: cross-source VOCABULARY-overlap matrix from KMV sketches —
    the corpus-analytics deliverable A16's set algebra exists for:
    which sources share a domain (high token-set Jaccard), which are
    disjoint — the signal mixture design (L15) and source caps (L32)
    consume.  One sketch of each source's distinct-token set (k=256
    minimum md5-52 hashes), then ALL source pairs estimated from the
    sketches alone: merged union top-k per pair, overlap fraction =
    Jaccard estimate.

    Scale shape: the corpus is touched ONCE (token explode + distinct,
    the same shuffle an exact vocabulary count pays); everything
    pairwise operates on k-row sketches — 20 sources means 190 pairs
    of <=256-element arrays, pure metadata, and 10,000 sources would
    still be array math on the driver-side-free broadcast self-join,
    never a corpus-squared comparison.  Engine-exact md5 arithmetic
    (operators/sketch.py::md5_hash52), so every estimate hash-matches
    the oracle; ties in the estimate order break on the (g1, g2)
    names.  Plan note: the g1 < g2 pair join is a
    BroadcastNestedLoopJoin BY DESIGN — an inequality join over the
    SKETCH FRAME (one row per source, 20 rows here, 10k at the
    extreme), i.e. the metadata-scale pair enumeration, never a
    corpus-side nested loop (the corpus pipeline ends at the sketch
    aggregate above it)."""
    from projectmapreduce_spark.operators.sketch import md5_hash52
    from projectmapreduce_spark.operators.text import tokenize

    k = 256
    d = scan(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull() & (F.trim("text") != "")
    )
    toks = d.select(
        "source", F.explode(tokenize(F.col("text"))).alias("tok")
    ).distinct()
    hashed = toks.select("source", md5_hash52("tok").alias("h")).distinct()
    w = Window.partitionBy("source").orderBy("h")
    sk = (
        hashed.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .groupBy("source")
        .agg(F.sort_array(F.collect_list("h")).alias("hs"))
    )
    a = sk.select(F.col("source").alias("g1"), F.col("hs").alias("a_hs"))
    b = sk.select(F.col("source").alias("g2"), F.col("hs").alias("b_hs"))
    pairs = a.join(b, F.col("g1") < F.col("g2"))
    merged = F.slice(F.sort_array(F.array_distinct(F.concat("a_hs", "b_hs"))), 1, k)
    out = pairs.select(
        "g1",
        "g2",
        merged.alias("m"),
        F.size(F.array_intersect(F.array_intersect(merged, "a_hs"), "b_hs"))
        .cast("long")
        .alias("overlap"),
    ).select(
        "g1",
        "g2",
        "overlap",
        F.size("m").cast("long").alias("k_eff"),
        F.round(F.col("overlap").cast("double") / F.size("m"), 6).alias("jaccard_est"),
    )
    return out.orderBy(F.col("jaccard_est").desc(), "g1", "g2")
