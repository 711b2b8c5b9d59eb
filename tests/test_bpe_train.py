"""Iterated BPE trainer (operators/bpe.py train_merges): the learned
merge table must equal an explicit python trainer replica run on the
same word-frequency table, the learned merges fed back through the
apply side (tokenize_stats/token_stream) must reproduce the trainer's
own final segmentation, and the loop must stop early when the
vocabulary runs out of pairs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from eth_options_data_pipeline_spark.operators.bpe import (
    adjacent_symbol_pairs,
    pair_counts,
    segment_vocabulary,
    token_stream,
    train_merges,
    word_frequencies,
)
from tests.test_bpe_apply import _py_replica

_ROUNDS = 3


@pytest.fixture(scope="module")
def trained(spark, sf_small):
    """One 3-round trainer run shared by every consistency check in
    this module (each run is 4 Spark jobs; the checks below compare
    DIFFERENT properties of the same deterministic output)."""
    docs = spark.read.parquet(f"{sf_small}/documents.parquet").select("text")
    rows, seg = train_merges(docs, rounds=_ROUNDS)
    return docs, rows, seg


def _py_train(word_freqs, rounds):
    """Explicit greedy trainer: re-segment every word under the merges
    so far, count adjacent pairs, pick max under (cnt desc, a, b)."""
    merges, rows = [], []
    for _ in range(rounds):
        counts: dict = {}
        for w, f in word_freqs:
            syms = _py_replica(w, merges)
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + f
        if not counts:
            break
        (a, b), c = min(counts.items(),
                        key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        merges.append((a, b))
        rows.append((a, b, c))
    return merges, rows


def test_trainer_matches_python_replica(spark, trained):
    docs, rows, seg = trained
    word_freqs = [(r["w"], r["freq"])
                  for r in word_frequencies(docs).collect()]
    want_merges, want_rows = _py_train(word_freqs, _ROUNDS)
    got_rows = [(r["a"], r["b"], r["cnt"]) for r in rows]
    assert got_rows == want_rows
    assert [(a, b) for a, b, _ in got_rows] == want_merges

    # final pair stats under the learned table agree with the replica
    counts: dict = {}
    for w, f in word_freqs:
        syms = _py_replica(w, want_merges)
        for a, b in zip(syms, syms[1:]):
            counts[(a, b)] = counts.get((a, b), 0) + f
    got_final = {(r["a"], r["b"]): r["cnt"] for r in pair_counts(seg).collect()}
    assert got_final == counts


def test_learned_merges_reproduce_trainer_segmentation(spark, trained):
    """The VERDICT r08 item-4 closure: the merge table the trainer
    emits, fed to the APPLY side as a frozen table, segments exactly
    as the trainer's own final state does."""
    docs, rows, seg = trained
    merges = [(r["a"], r["b"]) for r in rows]
    applied = segment_vocabulary(docs, "text", merges)
    got = sorted((r["stream"], r["freq"]) for r in seg.collect())
    want = sorted((r["stream"], r["freq"]) for r in applied.collect())
    assert got == want
    # and the replica agrees symbol-for-symbol on a sample
    for stream, _ in got[:25]:
        word = stream.replace("·", "").replace(" ", "")
        expect = "".join(f" {s}·" for s in _py_replica(word, merges))
        assert stream == expect


def test_trainer_stops_early_without_pairs(spark):
    docs = spark.createDataFrame([("a",), ("b b",)], "text string")
    # vocabulary = {a, b}: single-char words only -> round 1 has no
    # adjacent pairs at all
    rows, seg = train_merges(docs, rounds=_ROUNDS)
    assert rows == []
    assert pair_counts(seg).count() == 0


def test_adjacent_pairs_edge_cases(spark):
    df = spark.createDataFrame(
        [("",), (" a·",), (" a· b·",), (" a· bc· d·",)], "s string")
    got = [r["p"] for r in
           df.select(adjacent_symbol_pairs(F.col("s")).alias("p")).collect()]
    assert got[0] == []
    assert got[1] == []
    assert [tuple(p) for p in got[2]] == [("a", "b")]
    assert [tuple(p) for p in got[3]] == [("a", "bc"), ("bc", "d")]


def test_trainer_round_one_equals_pair_statistics(spark, trained):
    """Round one of the loop counts single-char adjacent pairs — the
    dx55 statistic. The two formulations (substring pairs over raw
    words vs explode over the symbolized stream) must pick the same
    top pair when the maximum is unique."""
    from eth_options_data_pipeline_spark.operators.bpe import pair_statistics

    docs, rows, _seg = trained
    top2 = pair_statistics(docs, k=2).collect()
    assert top2[0]["cnt"] > top2[1]["cnt"], "corpus tie at rank 1 — pick another fixture"
    # round one of the shared 3-round run IS the k=1 training run
    assert rows[0]["a"] + rows[0]["b"] == top2[0]["pair"]
    assert rows[0]["cnt"] == top2[0]["cnt"]
