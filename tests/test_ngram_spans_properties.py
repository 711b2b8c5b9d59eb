"""Property check: span_dup_pairs must agree with a brute-force
Python reference (all-pairs gram comparison + run scan) on randomized
small corpora."""

from __future__ import annotations

from collections import defaultdict

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from eth_options_data_pipeline_spark.operators.ngram_spans import (
    ngram_postings, span_dup_pairs,
)

N = 3
WORD = st.sampled_from(["aa", "bb", "cc", "dd", "ee"])  # tiny vocab -> collisions
DOC = st.lists(WORD, min_size=0, max_size=14).map(" ".join)


def _ref(texts: list[str], n: int, min_matched: int, max_df: int):
    grams = defaultdict(list)  # gram -> [(doc, pos)]
    for doc_id, text in enumerate(texts):
        words = text.split(" ") if text else []
        for i in range(len(words) - n + 1):
            grams[tuple(words[i:i + n])].append((doc_id, i + 1))
    pair_hits = defaultdict(set)  # (a, b) -> {(pa, pb)}
    for occ in grams.values():
        docs = {d for d, _ in occ}
        if not (2 <= len(docs) <= max_df):
            continue
        for da, pa in occ:
            for db, pb in occ:
                if da < db:
                    pair_hits[(da, db)].add((pa, pb))
    out = {}
    for pair, hits in pair_hits.items():
        if len(hits) < min_matched:
            continue
        by_diag = defaultdict(list)
        for pa, pb in hits:
            by_diag[pa - pb].append(pa)
        islands = []
        for pas in by_diag.values():
            pas.sort()
            run = 1
            for prev, cur in zip(pas, pas[1:]):
                if cur == prev + 1:
                    run += 1
                else:
                    islands.append(run)
                    run = 1
            islands.append(run)
        out[pair] = (len(hits), len(islands), max(islands) + n - 1)
    return out


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(texts=st.lists(DOC, min_size=2, max_size=6))
def test_span_pairs_match_bruteforce(spark, texts):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    got = {
        (r.doc_a, r.doc_b): (r.matched_grams, r.n_islands, r.longest_run_words)
        for r in span_dup_pairs(ngram_postings(docs, n=N), n=N,
                                min_matched=2, max_df=4).collect()
    }
    want = _ref(texts, N, min_matched=2, max_df=4)
    assert got == want


def _ref_spans(texts: list[str], n: int, min_words: int, max_df: int):
    """Brute-force dup_spans_per_doc: per doc, union every word
    position covered by a >=min_words shared run with any other doc,
    then read the merged intervals off the covered set."""
    min_run = max(min_words - n + 1, 1)
    grams = defaultdict(list)
    for doc_id, text in enumerate(texts):
        words = text.split(" ") if text else []
        for i in range(len(words) - n + 1):
            grams[tuple(words[i:i + n])].append((doc_id, i + 1))
    matches = defaultdict(lambda: defaultdict(list))  # doc -> (other, diag) -> [pa]
    for occ in grams.values():
        docs = {d for d, _ in occ}
        if not (2 <= len(docs) <= max_df):
            continue
        for da, pa in occ:
            for db, pb in occ:
                if da != db:
                    matches[da][(db, pa - pb)].append(pa)
    covered = defaultdict(set)  # doc -> {word position}
    for doc_id, diags in matches.items():
        for pas in diags.values():
            pas = sorted(set(pas))
            start = prev = pas[0]
            runs = []
            for cur in pas[1:]:
                if cur == prev + 1:
                    prev = cur
                else:
                    runs.append((start, prev))
                    start = prev = cur
            runs.append((start, prev))
            for s, e in runs:
                if e - s + 1 >= min_run:
                    covered[doc_id].update(range(s, e + n))  # words s..e+n-1
    out = {}
    for doc_id, pos in covered.items():
        pos = sorted(pos)
        spans = []
        start = prev = pos[0]
        for cur in pos[1:]:
            if cur == prev + 1:
                prev = cur
            else:
                spans.append((start, prev))
                start = prev = cur
        spans.append((start, prev))
        out[doc_id] = spans
    return out


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(texts=st.lists(DOC, min_size=2, max_size=6))
def test_dup_spans_cover_exactly_the_bruteforce_word_set(spark, texts):
    """dx64's kernel: the merged per-doc intervals must cover exactly
    the word positions a brute-force all-pairs run scan marks as
    duplicated (>= min_words). Interval MERGING may join adjacent
    spans the reference lists separately, so compare covered SETS —
    plus non-overlap/sortedness of the emitted intervals."""
    from eth_options_data_pipeline_spark.operators.ngram_spans import (
        dup_spans_per_doc,
    )
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    got = defaultdict(list)
    for r in dup_spans_per_doc(ngram_postings(docs, n=N), n=N,
                               min_words=N + 1, max_df=4).collect():
        got[r.doc_id].append((r.s, r.e))
    want = _ref_spans(texts, N, min_words=N + 1, max_df=4)
    got_cov = {d: set().union(*[set(range(s, e + 1)) for s, e in v])
               for d, v in got.items()}
    want_cov = {d: set().union(*[set(range(s, e + 1)) for s, e in v])
                for d, v in want.items()}
    assert got_cov == want_cov
    for spans in got.values():
        spans.sort()
        for (s1, e1), (s2, e2) in zip(spans, spans[1:]):
            assert e1 < s2  # emitted intervals never overlap


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(texts=st.lists(DOC, min_size=2, max_size=6))
def test_cut_dup_spans_reconstructs_bruteforce_clean_text(spark, texts):
    """dx66's kernel: the cleaned text must equal the brute-force
    reconstruction — every word whose position the reference covered
    set marks duplicated is gone, every other word survives in order,
    docs with no spans pass through verbatim, and the word accounting
    (total/removed/kept) is consistent."""
    from eth_options_data_pipeline_spark.operators.ngram_spans import (
        cut_dup_spans, dup_spans_per_doc,
    )
    rows = [(i, t) for i, t in enumerate(texts) if t]
    if not rows:
        return
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    spans = dup_spans_per_doc(ngram_postings(docs, n=N), n=N,
                              min_words=N + 1, max_df=4)
    got = {r.doc_id: r for r in cut_dup_spans(docs, spans).collect()}
    covered = _ref_spans(texts, N, min_words=N + 1, max_df=4)
    cov_sets = {d: set().union(*[set(range(s, e + 1)) for s, e in v])
                for d, v in covered.items()}
    assert set(got) == {i for i, _ in rows}
    for doc_id, text in rows:
        words = text.split(" ")
        cov = cov_sets.get(doc_id, set())
        want_clean = " ".join(
            w for i, w in enumerate(words, start=1) if i not in cov)
        r = got[doc_id]
        assert r.clean_text == want_clean, (doc_id, r.clean_text, want_clean)
        assert r.total_words == len(words)
        assert r.removed_words == len(cov)
        assert r.kept_words == len(words) - len(cov)
