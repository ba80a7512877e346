"""Text-analysis operators for LLM-data pipelines (SURVEY.md §2.11
L5–L10 + the training-data extras: language-ID, quality scoring, token
counting, fingerprinting).

Everything is built from JVM-side expressions; the only state is small
broadcast lexicons.  Each public function returns a DataFrame (or a
Column) composable with the rest of the engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny per-language marker lexicons for the heuristic language ID.
# Public-knowledge stopword shortlists; the operator is the Spark-side
# scoring machinery — swap in real profiles (fastText, CLD3) via the
# same broadcast-join shape.
_LANG_MARKERS = {
    "en": ["the", "a", "of", "and", "is"],
    "fr": ["le", "la", "de", "et", "est"],
    "es": ["el", "la", "de", "y", "es"],
    "de": ["der", "die", "das", "und", "ist"],
    "zh": ["的", "是", "了", "在", "和"],
}

_STOPWORDS = ("a", "the", "of", "and", "is")


def normalize_text(col) -> Column:
    """L5: lowercase, strip non-word punctuation, collapse whitespace."""
    c = F.lower(col)
    c = F.regexp_replace(c, r"[^\w \t\n\f\r]", " ")
    c = F.regexp_replace(c, r"[ \t\n\f\r]+", " ")
    return F.trim(c)


def tokenize(col) -> Column:
    """L6: whitespace tokenization → array<string>.

    Explicit ASCII class ``[ \\t\\n\\f\\r]`` == RE2 ``\\s`` (DuckDB):
    Java's ``\\s`` also matches \\x0B, which RE2's does not — the
    explicit class makes engine and oracle agree on every input."""
    return F.split(F.trim(col), r"[ \t\n\f\r]+")


def bpe_ish_token_count(col) -> Column:
    """Token-count estimate with a BPE-ish regex: splits words, digit
    runs, and punctuation marks separately (the common ~GPT-style
    pre-tokenizer shape), counted JVM-side."""
    pieces = F.regexp_extract_all(col, F.lit(r"(\w+|[^\w \t\n\f\r])"), 1)
    return F.size(pieces)


def text_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """L8: per-doc quality heuristics — lengths, token stats, stopword
    ratio, alpha ratio — all single-pass map-side expressions."""
    toks = tokenize(F.col(text_col))
    n_tok = F.size(toks)
    stop_arr = F.array(*[F.lit(s) for s in _STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    n_alpha = F.length(F.regexp_replace(F.col(text_col), r"[^A-Za-z]", ""))
    return df.select(
        F.col(id_col),
        F.length(text_col).alias("n_chars"),
        n_tok.alias("n_tokens"),
        (F.length(F.regexp_replace(F.col(text_col), r"[ \t\n\f\r]+", "")) / n_tok).alias(
            "mean_token_len"
        ),
        (n_stop / n_tok).alias("stopword_ratio"),
        # empty doc → NULL ratio (try_divide), mirrored by the oracle's
        # nullif(n_chars, 0) — a plain divide is an ANSI error on the
        # hostile tier's empty documents.  n_tok is never 0 (split of
        # '' is ['']), so the divisions above stay plain.
        F.try_divide(n_alpha, F.length(text_col)).alias("alpha_ratio"),
    )


def quality_filter(
    df: DataFrame,
    text_col: str,
    min_tokens: int = 10,
    max_mean_token_len: float = 12.0,
    min_stopword_ratio: float = 0.0,
) -> DataFrame:
    """Keep docs passing the C4-style cheap quality gates."""
    toks = tokenize(F.col(text_col))
    n_tok = F.size(toks)
    mean_len = F.length(F.regexp_replace(F.col(text_col), r"[ \t\n\f\r]+", "")) / n_tok
    stop_arr = F.array(*[F.lit(s) for s in _STOPWORDS])
    stop_ratio = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t))) / n_tok
    return df.filter(
        (n_tok >= min_tokens)
        & (mean_len <= max_mean_token_len)
        & (stop_ratio >= min_stopword_ratio)
    )


def language_id(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Heuristic language ID: score = matches against each language's
    marker lexicon via explode ⋈ broadcast lexicon, argmax per doc.
    Output: (id, lang_pred, lang_score).  Ties break lexicographically
    (deterministic)."""
    spark = df.sparkSession
    lex = spark.createDataFrame(
        [(lang, w) for lang, ws in _LANG_MARKERS.items() for w in ws],
        "cand_lang string, marker string",
    )
    toks = df.select(
        F.col(id_col).alias("id"), F.explode(tokenize(F.col(text_col))).alias("token")
    )
    scores = (
        toks.join(F.broadcast(lex), toks.token == lex.marker)
        .groupBy("id", "cand_lang")
        .agg(F.count(F.lit(1)).alias("hits"))
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("id").orderBy(F.col("hits").desc(), F.col("cand_lang").asc())
    return (
        scores.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("id", F.col("cand_lang").alias("lang_pred"), F.col("hits").alias("lang_score"))
    )


def doc_fingerprint(col) -> Column:
    """Stable 64-bit-hex content fingerprint: first 16 hex chars of
    sha256 of the normalized text.  Engine-portable (DuckDB:
    ``substring(sha256(...), 1, 16)``)."""
    return F.substring(F.sha2(normalize_text(col), 256), 1, 16)


def rolling_shingle_fingerprint(df: DataFrame, id_col: str, text_col: str, n: int = 5) -> DataFrame:
    """Winnowing-style fingerprint: minimum crc32 over n-gram shingles
    (the document's 'rarest window').  Near-dup docs share it with high
    probability; used as a cheap blocking key.  Output: (id, fp)."""
    arr = tokenize(F.col(text_col))
    shingles = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(arr) - n, F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(arr, i + 1, n)),
    )
    fp = F.array_min(F.transform(shingles, lambda s: F.crc32(s)))
    return df.select(F.col(id_col).alias("id"), fp.alias("fp"))


def tf_idf(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """L9: relational TF-IDF — tf from per-doc token counts, idf =
    ln(N/df) via a broadcast of the (vocab-sized) document-frequency
    table.  Output: (id, token, tf, df_docs, tfidf)."""
    toks = df.select(
        F.col(id_col).alias("id"), F.explode(tokenize(F.col(text_col))).alias("token")
    )
    tf = toks.groupBy("id", "token").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = toks.distinct().groupBy("token").agg(F.count(F.lit(1)).alias("df_docs"))
    n_docs = df.select(F.count(F.lit(1)).alias("n_docs"))
    return (
        tf.join(F.broadcast(dfreq), "token")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "id",
            "token",
            "tf",
            "df_docs",
            (F.col("tf") * F.log(F.col("n_docs") / F.col("df_docs"))).alias("tfidf"),
        )
    )


def bm25(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """L26: BM25 term relevance (Robertson/Spärck Jones; the Lucene
    ``1 +`` idf variant so scores are always positive) — the retrieval
    scoring pass a RAG corpus index needs.

    Fully relational, same shape as :func:`tf_idf` plus per-doc length
    normalization: tf from one (doc, token) hash aggregate, df and the
    corpus-wide (N, avgdl) scalars broadcast — the fact table (tokens)
    shuffles exactly once, document-frequency state is vocabulary-sized,
    never corpus-sized.  Output: (id, token, tf, df_docs, dl, bm25).

    The arithmetic is kept in double precision with a fixed expression
    tree so the DuckDB oracle reproduces it bit-for-bit before rounding.
    """
    toks = df.select(
        F.col(id_col).alias("id"), F.explode(tokenize(F.col(text_col))).alias("token")
    )
    # ONE explode + ONE (id, token) hash aggregate; everything else —
    # doc length, document frequency, avgdl — derives from that small
    # aggregated table, so the corpus is tokenized exactly once.
    tf = toks.groupBy("id", "token").agg(F.count(F.lit(1)).alias("tf"))
    dl = tf.groupBy("id").agg(F.sum("tf").alias("dl"))
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df_docs"))
    scalars = df.agg(F.count(F.lit(1)).cast("double").alias("n_docs")).crossJoin(
        dl.agg(F.avg("dl").alias("avgdl"))
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df_docs") + F.lit(0.5))
        / (F.col("df_docs") + F.lit(0.5))
    )
    tf_part = (F.col("tf") * F.lit(k1 + 1.0)) / (
        F.col("tf")
        + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
    )
    return (
        tf.join(dl, "id")
        .join(F.broadcast(dfreq), "token")
        .crossJoin(F.broadcast(scalars))
        .select("id", "token", "tf", "df_docs", "dl", (idf * tf_part).alias("bm25"))
    )


def lexicon_score(
    df: DataFrame, id_col: str, text_col: str, lexicon: dict[str, int]
) -> DataFrame:
    """L10: per-doc lexicon scoring (sentiment-style, EDBT'16 pattern):
    explode tokens ⋈ broadcast lexicon → per-doc weight sum.  Docs with
    no lexicon hit score 0 (left join semantics)."""
    spark = df.sparkSession
    lex = spark.createDataFrame(list(lexicon.items()), "word string, weight int")
    toks = df.select(
        F.col(id_col).alias("id"), F.explode(tokenize(F.col(text_col))).alias("token")
    )
    hits = (
        toks.join(F.broadcast(lex), toks.token == lex.word)
        .groupBy("id")
        .agg(F.sum("weight").alias("score"), F.count(F.lit(1)).alias("n_hits"))
    )
    ids = df.select(F.col(id_col).alias("id"))
    return (
        ids.join(hits, "id", "left")
        .select(
            "id",
            F.coalesce("score", F.lit(0)).alias("score"),
            F.coalesce("n_hits", F.lit(0)).alias("n_hits"),
        )
    )


def _ngrams(arr: Column, n: int) -> Column:
    """Positional token n-grams as array<string>; empty array (not a
    descending-sequence artifact) when the doc has fewer than n tokens."""
    grams = F.transform(
        F.sequence(F.lit(0), F.size(arr) - n),
        lambda i: F.concat_ws(" ", F.slice(arr, i + 1, n)),
    )
    return F.when(F.size(arr) >= n, grams).otherwise(F.array().cast("array<string>"))


def repetition_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """L18: Gopher-style repetition/boilerplate metrics per document
    [Rae et al. 2021, "Scaling Language Models: ... Gopher", §A1.1 —
    public paper], adapted to token form for corpora without line
    structure:

    - ``dup_token_frac``  — 1 − distinct/total tokens
    - ``dup_3gram_frac``  — 1 − distinct/total 3-grams
    - ``top_2gram_frac``  — tokens covered by the most frequent 2-gram

    The two dup fractions are MAP-SIDE ONLY (``array_distinct`` inside
    the row — no shuffle, no state).  The top-2-gram mode needs a
    per-(doc, gram) count: that is ONE hash aggregate keyed
    (doc_id, gram) with map-side partials, then a per-doc max — linear
    in corpus size, never quadratic in doc length (the map-side
    alternative, counting each distinct gram's occurrences with a
    nested array scan, is O(distinct × len) per doc — wrong for
    100k-token docs).  Output: (id, n_tok, dup_token_frac,
    dup_3gram_frac, top_2gram_frac).
    """
    toks = tokenize(F.col(text_col))
    g2 = _ngrams(toks, 2)
    g3 = _ngrams(toks, 3)
    base = df.select(
        F.col(id_col).alias("id"),
        toks.alias("toks"),
        g2.alias("g2"),
        F.size(toks).alias("n_tok"),
        (F.lit(1.0) - F.size(F.array_distinct(toks)) / F.size(toks)).alias(
            "dup_token_frac"
        ),
        F.when(F.size(g3) > 0, F.lit(1.0) - F.size(F.array_distinct(g3)) / F.size(g3))
        .otherwise(F.lit(0.0))
        .alias("dup_3gram_frac"),
    )
    top2 = (
        base.select("id", F.explode("g2").alias("gram"))
        .groupBy("id", "gram")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("id")
        .agg(F.max("c").alias("max2"))
    )
    return (
        base.join(top2, "id", "left")
        .select(
            "id",
            F.col("n_tok").cast("long").alias("n_tok"),
            "dup_token_frac",
            "dup_3gram_frac",
            F.when(F.col("n_tok") >= 2, F.lit(2.0) * F.col("max2") / F.col("n_tok"))
            .otherwise(F.lit(0.0))
            .alias("top_2gram_frac"),
        )
    )


def hashed_linear_score(
    df: DataFrame,
    id_col: str,
    text_col: str,
    weights: DataFrame,
    n_features: int = 1024,
) -> DataFrame:
    """L21: hashed-n-gram linear classifier — the fastText-style
    quality scorer shape: feature-hash each token into a fixed bucket
    space, look the bucket up in a (bucket, weight) model table, sum
    weights per document, threshold on the mean.

    This is the Spark deployment shape for ANY linear text model: the
    trained weight vector is a small table (n_features rows) that
    BROADCASTS, so scoring a 100 TB corpus is one map-side join plus
    one per-doc aggregate — no vocabulary shuffle, no Python.  Scores
    here use integer weights, so the per-doc sum is bigint-exact and
    the mean is one exact int/int IEEE divide — fully hash-checkable
    cross-engine.

    Returns (id, n_tokens, score_raw, mean_weight, keep).
    """
    from projectmapreduce_spark.operators.sketch import cms_bucket, poly_hash

    toks = df.select(
        F.col(id_col).alias("id"), F.explode(F.split(text_col, " ")).alias("token")
    )
    feat = toks.select("id", cms_bucket(poly_hash("token"), 0, n_features).alias("bucket"))
    scored = (
        feat.join(F.broadcast(weights), "bucket")
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_tokens"), F.sum("weight").alias("score_raw"))
    )
    mean = F.col("score_raw") / F.col("n_tokens")
    return scored.select(
        "id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("score_raw").cast("long").alias("score_raw"),
        mean.alias("mean_weight"),
        (mean > 0).alias("keep"),
    )


def demo_weights(spark, n_features: int = 1024) -> DataFrame:
    """Deterministic stand-in for trained model weights: integer
    weights in [-1000, 1000] derived from the bucket id by the same
    multiplicative family as the rest of the repo.  A real deployment
    swaps this table for the trained vector — the scoring plumbing
    (broadcast join + sum) is identical."""
    b = F.col("id")
    w = ((b * F.lit(2654435761) + F.lit(7)) % F.lit(4294967296)) % F.lit(2001) - F.lit(1000)
    return spark.range(n_features).select(
        b.cast("long").alias("bucket"), w.cast("long").alias("weight")
    )
