"""Property check: pair_statistics must agree with a brute-force
Python reference (count adjacent char pairs weighted by word
frequency, rank by (count desc, pair)) on randomized corpora."""

from __future__ import annotations

from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from eth_options_data_pipeline_spark.operators.bpe import pair_statistics

WORD = st.text(alphabet="abc", min_size=0, max_size=6)
DOC = st.lists(WORD, min_size=0, max_size=10).map(" ".join)


def _ref(texts, k):
    vocab = Counter()
    for t in texts:
        for w in t.strip().split(" "):
            if w:
                vocab[w] += 1
    pairs = Counter()
    for w, freq in vocab.items():
        for i in range(len(w) - 1):
            pairs[w[i:i + 2]] += freq
    ranked = sorted(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return [(r + 1, p, c) for r, (p, c) in enumerate(ranked)]


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(DOC, min_size=0, max_size=8), st.integers(1, 5))
def test_pair_statistics_matches_reference(spark, docs, k):
    df = spark.createDataFrame(
        [(t,) for t in docs] or [(None,)], "text string")
    got = [(r.rank, r.pair, r.cnt)
           for r in pair_statistics(df, "text", k=k).collect()]
    assert sorted(got) == _ref(docs, k)
