"""Exact n-gram span dedup (operators/ngram_spans.py): planted shared
runs must surface with the right island decomposition and length."""

from __future__ import annotations

from eth_options_data_pipeline_spark.operators.ngram_spans import (
    ngram_postings, span_dup_pairs,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_planted_span_length_and_islands(spark):
    # docs 1 and 2 share one exact 9-word run -> 5 matched 5-grams,
    # one island, longest_run_words = 5 + 5 - 1 = 9
    shared = "alpha bravo charlie delta echo foxtrot golf hotel india"
    docs = _docs(spark, [
        (1, f"one two three {shared} x1 y1 z1"),
        (2, f"uno dos {shared} p2 q2 r2 s2"),
        (3, "completely different words with no overlap at all here ok"),
    ])
    out = span_dup_pairs(ngram_postings(docs, n=5), n=5, min_matched=3).collect()
    assert len(out) == 1
    row = out[0]
    assert (row.doc_a, row.doc_b) == (1, 2)
    assert row.matched_grams == 5
    assert row.n_islands == 1
    assert row.longest_run_words == 9


def test_two_separate_islands(spark):
    # two disjoint shared runs separated by differing middles:
    # each run is 5 words = exactly one 5-gram
    run1 = "a1 a2 a3 a4 a5"
    run2 = "b1 b2 b3 b4 b5"
    docs = _docs(spark, [
        (1, f"{run1} mid1 mid2 mid3 {run2}"),
        (2, f"{run1} other stuff here {run2}"),
    ])
    out = span_dup_pairs(ngram_postings(docs, n=5), n=5, min_matched=2).collect()
    assert len(out) == 1
    assert out[0].n_islands == 2
    assert out[0].matched_grams == 2
    assert out[0].longest_run_words == 5


def test_df_gate_drops_boilerplate(spark):
    # a gram present in every doc (df=6 > max_df=5) must not pair
    boiler = "click here to accept cookies"
    rows = [(i, f"{boiler} unique{i} only{i} in{i} doc{i} here{i}")
            for i in range(6)]
    out = span_dup_pairs(ngram_postings(_docs(spark, rows), n=5),
                         n=5, min_matched=1, max_df=5).collect()
    assert out == []


def test_short_and_empty_docs_are_safe(spark):
    docs = _docs(spark, [
        (1, ""),            # empty
        (2, "just four words here"),  # shorter than n
        (3, None),          # null text
    ])
    assert ngram_postings(docs, n=5).collect() == []


def test_min_matched_threshold(spark):
    run = "w1 w2 w3 w4 w5 w6"  # 6 words -> 2 grams
    docs = _docs(spark, [(1, f"{run} tail1 tail2"), (2, f"head1 head2 {run}")])
    postings = ngram_postings(docs, n=5)
    assert span_dup_pairs(postings, n=5, min_matched=3).collect() == []
    hit = span_dup_pairs(postings, n=5, min_matched=2).collect()
    assert len(hit) == 1 and hit[0].longest_run_words == 6
