"""Invariant tests for the round-5 faces (RAG retrieval, vocab
coverage, streaming exact dedup). Oracle parity is covered by the
registry sweep in test_corpus_oracle.py; these pin the semantic
properties the oracle hash alone doesn't explain."""

from __future__ import annotations

from pyspark.sql import functions as F

from eth_options_data_pipeline_spark.queries.analytics13 import (
    _RAG_K,
    _RAG_NQ,
    _hash_embed,
    dx43_rag_retrieval,
    sx06_stream_dedup,
)


def test_hash_embed_deterministic_and_dim(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta alpha 42"), (2, ""), (3, "ALPHA beta")],
        "id int, text string")
    out = df.select("id", _hash_embed(F.col("text")).alias("e")).collect()
    by_id = {r.id: r.e for r in out}
    assert all(len(e) == 16 for e in by_id.values())
    # empty text -> all-zero vector, not null
    assert by_id[2] == [0.0] * 16
    # case-insensitive: "ALPHA beta" tokens == {"alpha","beta"}
    ref = df.select(_hash_embed(F.lit("alpha beta")).alias("e")).first().e
    assert by_id[3] == ref
    # token counts add: "alpha beta alpha 42" = alpha*2 + beta + 42
    again = df.select("id", _hash_embed(F.col("text")).alias("e")).collect()
    assert {r.id: r.e for r in again} == by_id


def test_rag_retrieval_shape(spark, sf_small):
    rows = dx43_rag_retrieval(spark, sf_small).collect()
    assert rows, "retrieval returned nothing"
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_chunk_id, []).append(r)
        assert -1.0 - 1e-9 <= r.sim <= 1.0 + 1e-9
        # no same-document hits: chunk ids are "<doc>#<idx>"
        assert r.chunk_id.split("#")[0] != r.query_chunk_id.split("#")[0]
    assert len(by_q) <= _RAG_NQ
    for q, hits in by_q.items():
        ranks = sorted(h.rank for h in hits)
        assert ranks == list(range(1, len(hits) + 1))
        assert len(hits) <= _RAG_K
        # ranks follow (sim desc, chunk_id asc)
        ordered = sorted(hits, key=lambda h: (-h.sim, h.chunk_id))
        assert [h.rank for h in ordered] == list(range(1, len(hits) + 1))


def test_vocab_coverage_bounds(spark, sf_small):
    """Vocab-coverage invariants, carried onto dx59 after the r14 fold
    (dx44's per-doc OOV leg now runs per corpus bucket inside the
    growth-curve face): OOV counts bounded by instance counts, rates
    in [0, 1], unigram OOV strictly below 1 wherever the top-200 vocab
    covers anything, and (gram_n, bucket) unique."""
    from eth_options_data_pipeline_spark.queries.analytics17 import (
        dx59_vocab_growth,
    )

    rows = dx59_vocab_growth(spark, sf_small).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_oov <= r.n_instances
        assert 0.0 <= r.oov_rate <= 1.0
        if r.gram_n == 1:
            # unigram instances == the bucket's token count
            assert r.n_instances == r.bucket_tokens
    keys = [(r.gram_n, r.bucket) for r in rows]
    assert len(keys) == len(set(keys))
    # the top-200 vocab must actually cover something somewhere
    assert any(r.n_oov < r.n_instances for r in rows if r.gram_n == 1)


def test_stream_dedup_keep_first(spark, sf_small):
    out = sx06_stream_dedup(spark, sf_small)
    rows = out.collect()
    keys = [(r.user_id, r.event_type) for r in rows]
    assert len(keys) == len(set(keys)), "dedup emitted a key twice"
    # closed form: min over arrival order (batch asc, event_id asc)
    ev = spark.read.parquet(f"{sf_small}/events.parquet")
    expect = (
        ev.withColumn("_b", F.col("event_id") % 3)
        .groupBy("user_id", "event_type")
        .agg(F.min(F.struct("_b", "event_id")).alias("m"))
        .select("user_id", "event_type", F.col("m.event_id").alias("event_id"))
        .collect()
    )
    got = {(r.user_id, r.event_type): r.event_id for r in rows}
    want = {(r.user_id, r.event_type): r.event_id for r in expect}
    assert got == want


def test_corpus_pipeline_invariants(spark, sf_small):
    from eth_options_data_pipeline_spark.queries.analytics13 import (
        _CX_BUDGET,
        _CX_MIN_TOKS,
        cx01_corpus_pipeline,
    )

    rows = cx01_corpus_pipeline(spark, sf_small).collect()
    assert rows
    # budget respected and every doc passed the gate
    assert max(r.cum_tokens for r in rows) <= _CX_BUDGET
    assert all(r.n_tokens >= _CX_MIN_TOKS for r in rows)
    # cum_tokens is the prefix sum in (n_tokens desc, doc_id) order
    ordered = sorted(rows, key=lambda r: (-r.n_tokens, r.doc_id))
    run = 0
    for r in ordered:
        run += r.n_tokens
        assert r.cum_tokens == run
    # survivors are exact-dedup-unique on the normalized fingerprint
    kept_ids = {r.doc_id for r in rows}
    docs = spark.read.parquet(f"{sf_small}/documents.parquet")
    from pyspark.sql import functions as F
    fps = (
        docs.where(F.col("doc_id").isin(list(kept_ids)))
        .select(F.md5(F.trim(F.regexp_replace(
            F.lower(F.col("text")), r"\s+", " "))).alias("fp"))
        .collect()
    )
    assert len({r.fp for r in fps}) == len(fps)


def test_bm25_ranking_properties(spark, sf_small):
    from eth_options_data_pipeline_spark.queries.analytics13 import (
        _BM25_K,
        _BM25_TERMS,
        dx45_bm25_topk,
    )

    rows = dx45_bm25_topk(spark, sf_small).collect()
    assert 0 < len(rows) <= _BM25_K
    assert sorted(r.rank for r in rows) == list(range(1, len(rows) + 1))
    ordered = sorted(rows, key=lambda r: (-r.score, r.doc_id))
    assert [r.rank for r in ordered] == list(range(1, len(rows) + 1))
    # every hit really contains at least one query term
    import re
    docs = {r.doc_id: r.text for r in spark.read.parquet(
        f"{sf_small}/documents.parquet").collect()}
    for r in rows:
        toks = set(re.findall(r"[a-z0-9]+", docs[r.doc_id].lower()))
        assert toks & set(_BM25_TERMS)
        assert r.score > 0


def test_rrf_fuses_both_sources(spark, sf_small):
    from eth_options_data_pipeline_spark.queries.analytics13 import (
        _RRF_K,
        _RRF_OUT,
        _RRF_POOL,
        dx46_hybrid_rrf,
    )

    rows = dx46_hybrid_rrf(spark, sf_small).collect()
    assert 0 < len(rows) <= _RRF_OUT
    hi = round(2.0 / (_RRF_K + 1), 6)          # in both lists at rank 1
    lo = round(1.0 / (_RRF_K + _RRF_POOL), 6)  # one list, last slot
    for r in rows:
        assert lo <= r.rrf <= hi
    # the fused order is (rrf desc, doc_id)
    ordered = sorted(rows, key=lambda r: (-r.rrf, r.doc_id))
    assert [r.rank for r in ordered] == list(range(1, len(rows) + 1))
