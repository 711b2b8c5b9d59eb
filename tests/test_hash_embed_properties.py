"""Property-based checks for the dx43 feature-hash embedding and the
sx06 keep-first kernel: the Spark expression kernels must agree with
brute-force Python references on randomized inputs."""

from __future__ import annotations

import hashlib
import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from eth_options_data_pipeline_spark.queries.analytics13 import (
    _RAG_DIM,
    _hash_embed,
)

TEXT = st.text(
    alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd", "Zs"),
                           whitelist_characters=".,!-_"),
    min_size=0, max_size=120)


def _ref_embed(text: str) -> list[float]:
    vec = [0] * _RAG_DIM
    for tok in re.findall(r"[a-z0-9]+", text.lower()):
        h = hashlib.md5(tok.encode()).hexdigest()
        d = int(h[:13], 16) % _RAG_DIM
        s = 1 if int(h[13], 16) % 2 == 0 else -1
        vec[d] += s
    return [float(v) for v in vec]


def test_hash_embed_matches_reference(spark):
    """All hypothesis examples run through ONE Spark job (the example
    set is drawn up front) — same coverage, no per-example scheduling."""
    from hypothesis import given, settings

    texts_acc = []

    @settings(max_examples=15, deadline=None,
              suppress_health_check=list(HealthCheck),
                        derandomize=True)
    @given(texts=st.lists(TEXT, min_size=1, max_size=8))
    def collect(texts):
        texts_acc.extend(texts)

    collect()
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts_acc)], "id long, text string")
    got = {r.id: r.e for r in
           df.select("id", _hash_embed(F.col("text")).alias("e")).collect()}
    for i, t in enumerate(texts_acc):
        assert got[i] == _ref_embed(t), f"text={t!r}"


ARRIVALS = st.lists(
    st.tuples(st.integers(0, 4), st.sampled_from(["a", "b"]),
              st.integers(0, 10_000)),
    min_size=1, max_size=40, unique_by=lambda x: x[2])


def test_keep_first_batched_matches_sequential(spark):
    """The 3-batch tracked-state kernel (sx06's shape) must equal a
    sequential scan in arrival order (batch asc, event_id asc).

    Hypothesis draws the example set up front; all examples then run
    through ONE 3-batch Spark pipeline with the example index as an
    extra key (keys include ``ex``, so examples cannot interact) —
    3 Spark rounds total instead of 3 per example (was 25s of
    per-example job scheduling for identical coverage)."""
    from hypothesis import given, settings
    from pyspark.sql import Window

    cases = []

    @settings(max_examples=10, deadline=None,
              suppress_health_check=list(HealthCheck),
                        derandomize=True)
    @given(arrivals=ARRIVALS)
    def collect(arrivals):
        cases.append(list(arrivals))

    collect()
    rows = [(ex, uid, et, eid)
            for ex, arr in enumerate(cases) for uid, et, eid in arr]
    df = spark.createDataFrame(
        rows, "ex long, user_id long, event_type string, event_id long")
    keys = ["ex", "user_id", "event_type"]
    tracked = spark.createDataFrame([], "ex bigint, user_id bigint, event_type string")
    got = {}
    for i in range(3):
        batch = df.where(F.col("event_id") % 3 == i)
        w = Window.partitionBy(*keys).orderBy("event_id")
        firsts = (
            batch.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1).drop("_rn")
            .join(tracked, keys, "left_anti"))
        for r in firsts.collect():
            got[(r.ex, r.user_id, r.event_type)] = r.event_id
        tracked = tracked.unionByName(firsts.select(*keys))

    want = {}
    for ex, arr in enumerate(cases):
        for uid, et, eid in sorted(arr, key=lambda x: (x[2] % 3, x[2])):
            want.setdefault((ex, uid, et), eid)
    assert got == want
