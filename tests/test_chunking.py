"""Chunking vs an exact Python replica, plus structural invariants:
de-overlapped chunks reconstruct the token stream, and the plan is
shuffle-free (pure per-row expressions)."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from eth_options_data_pipeline_spark.operators.chunking import chunk_documents
from eth_options_data_pipeline_spark.sources import load_table

SF_DIR = "/root/testdata/sf0.001"


def _tok(t: str) -> list[str]:
    return re.split(r"\s+", t.lower().strip())


def _replica(text: str, chunk_tokens: int, overlap: int):
    ws = _tok(text)
    stride = chunk_tokens - overlap
    out, s, i = [], 0, 0
    while True:
        piece = ws[s:s + chunk_tokens]
        out.append((i, " ".join(piece), len(piece)))
        if s + chunk_tokens >= len(ws):
            return out
        s += stride
        i += 1


@pytest.mark.parametrize("chunk_tokens,overlap", [(40, 10), (40, 0), (7, 3)])
def test_matches_replica(spark, chunk_tokens, overlap):
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    texts = {r.doc_id: r.text for r in docs.collect()}
    got = chunk_documents(docs, chunk_tokens=chunk_tokens,
                          overlap=overlap).collect()
    by_doc = {}
    for r in got:
        by_doc.setdefault(r.doc_id, []).append(r)
        assert r.chunk_id == f"{r.doc_id}#{r.chunk_index}"
    assert set(by_doc) == set(texts)
    for doc_id, text in texts.items():
        rows = sorted(by_doc[doc_id], key=lambda r: r.chunk_index)
        assert [(r.chunk_index, r.chunk_text, r.n_tokens) for r in rows] == \
            _replica(text, chunk_tokens, overlap)


def test_edge_cases(spark):
    docs = spark.createDataFrame(
        [(1, "a b c"), (2, " ".join(str(i) for i in range(7))),
         (3, ""), (4, "x " * 6 + "x")],  # 3, exactly 7, empty, 7 tokens
        ["doc_id", "text"])
    got = chunk_documents(docs, chunk_tokens=7, overlap=2).collect()
    per_doc = {}
    for r in got:
        per_doc.setdefault(r.doc_id, []).append(r)
    assert len(per_doc[1]) == 1 and per_doc[1][0].n_tokens == 3
    assert len(per_doc[2]) == 1 and per_doc[2][0].n_tokens == 7
    # empty text tokenizes to [''] (Spark split semantics): one chunk
    assert len(per_doc[3]) == 1 and per_doc[3][0].n_tokens == 1
    assert len(per_doc[4]) == 1 and per_doc[4][0].n_tokens == 7


def test_deoverlap_reconstructs_stream(spark):
    text = " ".join(f"w{i}" for i in range(100))
    docs = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    rows = sorted(chunk_documents(docs, chunk_tokens=16, overlap=4).collect(),
                  key=lambda r: r.chunk_index)
    rebuilt = rows[0].chunk_text.split(" ")
    for r in rows[1:]:
        rebuilt += r.chunk_text.split(" ")[4:]
    assert rebuilt == _tok(text)


def test_plan_is_shuffle_free(spark):
    docs = load_table(spark, SF_DIR, "documents")
    plan = chunk_documents(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan
    assert "Exchange rangepartitioning" not in plan
