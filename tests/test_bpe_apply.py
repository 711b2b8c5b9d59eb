"""BPE apply-side semantics (operators/bpe.py token_stream /
tokenize_stats): greedy left-to-right merges, sequential composition,
word-boundary isolation, and a pure-python replica cross-check."""

from __future__ import annotations

from pyspark.sql import functions as F

from eth_options_data_pipeline_spark.operators.bpe import (
    FROZEN_MERGES,
    token_stream,
    tokenize_stats,
)


def _stream(spark, text, merges):
    df = spark.createDataFrame([(text,)], "text string")
    return df.select(token_stream(F.col("text"), merges).alias("s")).collect()[0]["s"]


def _py_replica(text, merges):
    syms = list(text.replace(" ", "▁"))
    for a, b in merges:
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def test_greedy_left_to_right(spark):
    # "lll" under merge (l,l): BPE greedy gives [ll, l], never [l, ll]
    assert _stream(spark, "lll", [("l", "l")]) == " ll· l·"
    # even runs pair up completely
    assert _stream(spark, "llll", [("l", "l")]) == " ll· ll·"


def test_sequential_composition(spark):
    # later merges consume earlier merges' output symbols
    s = _stream(spark, "the", [("t", "h"), ("th", "e")])
    assert s == " the·"


def test_no_prefix_collision(spark):
    # (m,e) must NOT fire on symbol "er" (e is a proper prefix of er)
    s = _stream(spark, "mer", [("e", "r"), ("m", "e")])
    assert s == " m· er·"


def test_word_boundary_isolation(spark):
    # ▁ sits between words, so a letter-pair merge never crosses it
    s = _stream(spark, "t h", [("t", "h")])
    assert s == " t· ▁· h·"


def test_matches_python_replica_on_corpus_sample(spark, sf_small):
    docs = (spark.read.parquet(f"{sf_small}/documents.parquet")
            .select("doc_id", "text").limit(20))
    got = {r["doc_id"]: (r["n_tokens"], r["token_prefix"])
           for r in tokenize_stats(docs).collect()}
    for row in docs.collect():
        syms = _py_replica(row["text"], FROZEN_MERGES)
        stream = "".join(" " + s for s in syms)
        assert got[row["doc_id"]] == (len(syms), stream[1:65]), row["doc_id"]


def test_property_replica_equivalence_random_inputs(spark):
    """Hypothesis sweep: for random ASCII texts and random merge
    tables (including runs, prefix-colliding symbols, and merges that
    consume earlier merges' outputs), the JVM replace-chain equals the
    explicit greedy-scan python replica."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    texts = st.text(alphabet="ler mstow", min_size=0, max_size=40)
    base = st.sampled_from(["l", "e", "r", "m", "s", "t", "o", "w", "▁"])

    @st.composite
    def merge_tables(draw):
        symbols = ["l", "e", "r", "m", "s", "t", "o", "w", "▁"]
        merges = []
        for _ in range(draw(st.integers(0, 6))):
            a = draw(st.sampled_from(symbols))
            b = draw(st.sampled_from(symbols))
            merges.append((a, b))
            symbols.append(a + b)  # later merges may consume this one
        return merges

    cases = []

    @settings(max_examples=60, deadline=None,
              derandomize=True)
    @given(texts, merge_tables())
    def collect(text, merges):
        cases.append((text, tuple(merges)))

    collect()
    # one Spark job for the whole batch (per-example Spark jobs are
    # 60x the cost for identical coverage)
    rows = [(i, t) for i, (t, _) in enumerate(cases)]
    df = spark.createDataFrame(rows, "i long, text string")
    exprs = [token_stream(F.col("text"), list(m)).alias(f"s{i}")
             for i, (_, m) in enumerate(cases)]
    got = {r["i"]: r for r in df.select("i", *exprs).collect()}
    for i, (text, merges) in enumerate(cases):
        expect = "".join(f" {s}·" for s in _py_replica(text, merges))
        assert got[i][f"s{i}"] == expect, (text, merges)


def test_line_terminator_engine_parity(spark):
    """Dotall parity (ADVICE r08): Java '.' excludes \\r \\n \\u0085
    \\u2028/9 while RE2 excludes only \\n, so without (?s) a \\r is
    symbolized by DuckDB but not Spark. Pin that both engines now
    symbolize EVERY char identically, and both match the replica."""
    import duckdb

    from eth_options_data_pipeline_spark.operators.bpe import token_stream_sql

    texts = ["a\rb", "a\nb", "a\u0085b", "a\u2028b", "a\u2029b", "\r\n"]
    merges = [("a", "\r")]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i long, text string")
    got_spark = {r["i"]: r["s"] for r in
                 df.select("i", token_stream(F.col("text"), merges).alias("s")).collect()}
    con = duckdb.connect()
    sql_expr = token_stream_sql("text", merges)
    con.execute("CREATE TABLE t(i BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", list(enumerate(texts)))
    got_duck = dict(con.execute(f"SELECT i, {sql_expr} FROM t").fetchall())
    for i, text in enumerate(texts):
        expect = "".join(f" {s}·" for s in _py_replica(text, merges))
        assert got_spark[i] == expect, (repr(text), "spark")
        assert got_duck[i] == expect, (repr(text), "duckdb")


def test_plan_is_single_projection_no_shuffle(spark, sf_small):
    docs = spark.read.parquet(f"{sf_small}/documents.parquet")
    p = tokenize_stats(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in p and "EvalPython" not in p
