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


# ------------------------- per-doc deletion lists (dup_spans_per_doc)

def _spans(spark, rows, min_words=7, max_df=20):
    from eth_options_data_pipeline_spark.operators.ngram_spans import (
        dup_spans_per_doc,
    )
    docs = _docs(spark, rows)
    out = dup_spans_per_doc(ngram_postings(docs, n=5), n=5,
                            min_words=min_words, max_df=max_df).collect()
    spans = {}
    for r in out:
        spans.setdefault(r.doc_id, []).append((r.s, r.e))
    return {d: sorted(v) for d, v in spans.items()}


def test_identical_docs_whole_doc_is_one_span(spark):
    text = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"
    spans = _spans(spark, [(1, text), (2, text)])
    # everything is duplicated: ONE merged span covering all 10 words,
    # on both sides of the pair
    assert spans == {1: [(1, 10)], 2: [(1, 10)]}


def test_overlapping_islands_merge_into_one_span(spark):
    # doc 1 shares words 1..9 with doc 2 and words 6..14 with doc 3:
    # two different partners, overlapping coverage -> ONE merged
    # deletion span 1..14 for doc 1
    a = "s1 s2 s3 s4 s5 s6 s7 s8 s9"
    b = "t1 t2 t3 t4 t5 t6 t7 t8 t9"
    doc1 = f"{a} {b}"  # words 1..9 = a, 10..18 = b... b starts at 10
    spans = _spans(spark, [
        (1, doc1),
        (2, f"x1 x2 {a} y1 y2"),
        (3, f"z1 {b} z2 z3"),
    ])
    # doc1: span from a (1..9) and span from b (10..18) are ADJACENT
    # (10 > 9), so they stay two spans — but dup coverage is exact
    assert spans[1] == [(1, 9), (10, 18)]
    assert spans[2] == [(3, 11)]
    assert spans[3] == [(2, 10)]


def test_truly_overlapping_intervals_merge(spark):
    # doc 1's words 1..10 duplicated in doc 2; words 5..14 in doc 3:
    # intervals [1,10] and [5,14] overlap -> one merged span [1,14]
    w = [f"c{i}" for i in range(1, 19)]
    doc1 = " ".join(w)
    part_a = " ".join(w[0:10])    # words 1..10
    part_b = " ".join(w[4:14])    # words 5..14
    spans = _spans(spark, [
        (1, doc1),
        (2, f"pad1 pad2 {part_a}"),
        (3, f"{part_b} tail1 tail2"),
    ])
    assert spans[1] == [(1, 14)]


def test_short_span_below_min_words_is_cut(spark):
    # exactly one shared 5-gram = 5 words < min_words=7 -> no span
    run = "k1 k2 k3 k4 k5"
    spans = _spans(spark, [
        (1, f"{run} aaa bbb ccc ddd"),
        (2, f"xxx yyy {run} zzz www"),
    ])
    assert spans == {}
    # at min_words=5 the same pair DOES surface
    spans5 = _spans(spark, [
        (1, f"{run} aaa bbb ccc ddd"),
        (2, f"xxx yyy {run} zzz www"),
    ], min_words=5)
    assert spans5[1] == [(1, 5)] and spans5[2] == [(3, 7)]


# --------------------------------- apply-deletion (cut_dup_spans)

def test_cut_identical_docs_yield_empty_text(spark):
    """Two identical docs: every word of each is in a dup span, so the
    cleaned text is '' and the accounting zeroes out kept_words."""
    from eth_options_data_pipeline_spark.operators.ngram_spans import (
        cut_dup_spans, dup_spans_per_doc,
    )
    text = "w1 w2 w3 w4 w5 w6 w7 w8"
    docs = _docs(spark, [(1, text), (2, text)])
    spans = dup_spans_per_doc(ngram_postings(docs, n=5), n=5, min_words=7)
    out = {r.doc_id: r for r in cut_dup_spans(docs, spans).collect()}
    for d in (1, 2):
        assert out[d].clean_text == ""
        assert out[d].removed_words == 8 and out[d].kept_words == 0


def test_cut_doc_without_spans_passes_through(spark):
    from eth_options_data_pipeline_spark.operators.ngram_spans import (
        cut_dup_spans, dup_spans_per_doc,
    )
    shared = "s1 s2 s3 s4 s5 s6 s7"
    docs = _docs(spark, [
        (1, f"{shared} tail1 tail2"),
        (2, f"head1 {shared}"),
        (3, "totally unrelated text with eight different words"),
    ])
    spans = dup_spans_per_doc(ngram_postings(docs, n=5), n=5, min_words=7)
    out = {r.doc_id: r for r in cut_dup_spans(docs, spans).collect()}
    assert out[3].clean_text == "totally unrelated text with eight different words"
    assert out[3].removed_words == 0
    # span at doc START (doc 1) and doc END (doc 2) cut cleanly
    assert out[1].clean_text == "tail1 tail2"
    assert out[2].clean_text == "head1"
