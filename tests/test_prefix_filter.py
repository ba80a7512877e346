"""Prefix-filtered exact Jaccard must be output-identical to the naive
inverted-index join (All-Pairs/PPJoin completeness lemma)."""

from __future__ import annotations

import pytest

from projectmapreduce_spark.io import scan
from projectmapreduce_spark.operators.dedup import ngram_jaccard_join
from tests.conftest import SF_SMOKE


@pytest.mark.parametrize("threshold,n", [(0.5, 3), (0.8, 1), (0.9, 2)])
def test_prefix_filter_exactly_matches_naive(spark, threshold, n):
    d = scan(spark, SF_SMOKE, "documents")
    filt = {
        (r.id_a, r.id_b, round(r.jaccard, 9))
        for r in ngram_jaccard_join(d, "doc_id", "text", threshold, n=n).collect()
    }
    naive = {
        (r.id_a, r.id_b, round(r.jaccard, 9))
        for r in ngram_jaccard_join(
            d, "doc_id", "text", threshold, n=n, prefix_filter=False
        ).collect()
    }
    assert filt == naive


def test_arrays_join_modes_output_identical(spark):
    """The size-aware verification join (auto / forced-broadcast /
    forced-shuffle attachment of the per-doc token arrays) must be a
    pure physical-strategy choice — same pairs, same jaccard, in every
    mode (round-4 fix of the unconditional broadcast).  Runs at the
    sf0.01 correctness tier, so mode-equality plus l2b's driver
    hash-match transitively oracle-checks the shuffle path there."""
    from tests.conftest import SF_CORRECT

    d = scan(spark, SF_CORRECT, "documents")
    outs = [
        {
            (r.id_a, r.id_b, round(r.jaccard, 9))
            for r in ngram_jaccard_join(
                d, "doc_id", "text", 0.8, n=1, arrays_join=mode
            ).collect()
        }
        for mode in ("auto", "broadcast", "shuffle")
    ]
    assert outs[0] == outs[1] == outs[2]
    assert outs[0], "fixture must produce at least one duplicate pair"


def test_arrays_join_shuffle_mode_has_no_arrays_broadcast(spark):
    """In shuffle mode the arrays table must attach via SortMergeJoin —
    the 100 TB path where a corpus-sized broadcast would OOM the
    driver.  (Auto mode on small fixtures may legitimately broadcast;
    the mode knob is what makes the scale path testable.)"""
    from projectmapreduce_spark.plans import explain_str

    d = scan(spark, SF_SMOKE, "documents")
    df = ngram_jaccard_join(d, "doc_id", "text", 0.8, n=1, arrays_join="shuffle")
    s = explain_str(df, "simple")
    assert "SortMergeJoin" in s, s


def test_prefix_filter_handles_injected_edge_cases(spark):
    rows = [
        (1, "a b c d e"),
        (2, "a b c d e"),       # identical
        (3, "a b c d f"),       # 4/6 = 0.667
        (4, "z"),               # singleton doc
        (5, "z"),               # identical singleton
        (6, ""),                # empty-ish
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.id_a, r.id_b): round(r.jaccard, 6)
        for r in ngram_jaccard_join(df, "doc_id", "text", 0.6).collect()
    }
    want = {
        (r.id_a, r.id_b): round(r.jaccard, 6)
        for r in ngram_jaccard_join(df, "doc_id", "text", 0.6, prefix_filter=False).collect()
    }
    assert got == want
    assert got[(1, 2)] == 1.0
    assert got[(4, 5)] == 1.0
    assert round(got[(1, 3)], 3) == 0.667
