"""Duplicated-substring scrub vs an exact Python replica of the CDC
chunking + first-occurrence rule."""

from __future__ import annotations

import hashlib

import pandas as pd
import pytest

from eth_options_data_pipeline_spark.operators.fingerprint import (
    chunk_boundaries, scrub_duplicate_chunks,
)

_BASE = ("the quick brown fox jumps over the lazy dog while seventeen "
         "astronauts calibrate the orbital telescope array beyond the "
         "clouds and every sensor hums a different frequency tune ")
A_TEXT = _BASE * 4
B_TEXT = ("unique opening words here " + _BASE * 3 + " unique closing words")
D_TEXT = "entirely original content that shares nothing with the others at all"

DOCS = [
    (0, A_TEXT),
    (1, B_TEXT),
    (2, A_TEXT),   # exact duplicate of doc 0
    (3, D_TEXT),
]


def reference():
    chunks = []   # (doc_id, idx, start, length, digest)
    for did, text in DOCS:
        prev = 0
        for idx, end in enumerate(chunk_boundaries(text)):
            piece = text[prev:end]
            chunks.append((did, idx, prev, len(piece),
                           hashlib.md5(piece.encode()).hexdigest()))
            prev = end
    first = {}
    for c in sorted(chunks, key=lambda c: (c[0], c[1])):
        first.setdefault(c[4], (c[0], c[1]))
    counts = {}
    for c in chunks:
        counts[c[4]] = counts.get(c[4], 0) + 1
    out = {}
    for did, text in DOCS:
        kept, removed = [], 0
        for c in [c for c in chunks if c[0] == did]:
            if counts[c[4]] == 1 or first[c[4]] == (did, c[1]):
                kept.append(text[c[2]:c[2] + c[3]])
            else:
                removed += 1
        out[did] = ("".join(kept), removed)
    return out


@pytest.fixture(scope="module")
def scrubbed(spark):
    df = spark.createDataFrame(pd.DataFrame(DOCS, columns=["doc_id", "text"]))
    return {r["doc_id"]: r for r in scrub_duplicate_chunks(df).collect()}


def test_matches_reference(spark, scrubbed):
    want = reference()
    for did, (text, removed) in want.items():
        assert scrubbed[did]["text_scrubbed"] == text, did
        assert scrubbed[did]["n_chunks_removed"] == removed, did


def test_qualitative_shape(spark, scrubbed):
    # doc 0 self-repeats (_BASE * 4): later intra-doc occurrences are
    # scrubbed too — within-document duplicated substrings are part of
    # the Lee-et-al semantics, not an accident
    assert scrubbed[0]["text_scrubbed"].startswith("the quick brown fox")
    assert 0 < len(scrubbed[0]["text_scrubbed"]) < len(A_TEXT)
    assert scrubbed[0]["n_chunks_removed"] > 0
    # exact duplicate is scrubbed to nothing
    assert scrubbed[2]["text_scrubbed"] == ""
    # B loses its copied middle but keeps unique edges
    assert scrubbed[1]["text_scrubbed"].startswith("unique opening")
    assert scrubbed[1]["text_scrubbed"].endswith("closing words")
    assert len(scrubbed[1]["text_scrubbed"]) < len(B_TEXT)
    # unique doc untouched
    assert scrubbed[3]["text_scrubbed"] == D_TEXT
