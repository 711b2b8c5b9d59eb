"""cx05_corpus_composition: the end-to-end curate -> tokenize ->
pack -> export composition (VERDICT r12 item 6).

The oracle hash (tests/test_corpus_oracle.py) pins the values; these
tests pin the SHAPE promises the face's docstring makes: one lazy
plan whose only Python is the single Arrow pack kernel, no cartesian
product anywhere, the piece lookup broadcast, and the greedy-pack /
manifest invariants.
"""

from __future__ import annotations

from collections import defaultdict

import pytest

from eth_options_data_pipeline_spark.queries import REGISTRY
from eth_options_data_pipeline_spark.queries.analytics23 import (
    _CX05_BUDGET, _CX05_ESHARDS,
)


@pytest.fixture(scope="module")
def cx05_df(spark, sf_small):
    return REGISTRY["cx05_corpus_composition"].fn(spark, sf_small)


def test_plan_one_arrow_stage_no_cartesian(cx05_df):
    plan = cx05_df._jdf.queryExecution().executedPlan().toString()
    # the greedy pack kernel is the plan's ONE Python stage
    assert plan.count("FlatMapGroupsInPandas") == 1, plan
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the <=200-row segmented-lexicon piece lookup must broadcast
    assert "BroadcastHashJoin" in plan, plan


def test_composition_invariants(spark, sf_small, cx05_df):
    rows = cx05_df.collect()
    assert rows, "composition produced no manifest rows"

    # 1. exactly the curated docs, each packed whole exactly once
    kept = {r["doc_id"] for r in
            REGISTRY["cx01_corpus_pipeline"].fn(spark, sf_small).collect()}
    packed = [r["doc_id"] for r in rows]
    assert sorted(packed) == sorted(kept)
    assert len(packed) == len(set(packed))

    # 2. greedy-pack bound: a pack exceeds the budget only when it is
    #    one single oversized doc
    by_pack = defaultdict(list)
    for r in rows:
        by_pack[(r["shard"], r["pack_seq"])].append(r)
    for docs in by_pack.values():
        total = sum(r["ug_tokens"] for r in docs)
        if total > _CX05_BUDGET:
            assert len(docs) == 1
        # offsets are the exclusive prefix sum of the pack's tokens
        docs = sorted(docs, key=lambda r: r["offset_in_pack"])
        acc = 0
        for r in docs:
            assert r["offset_in_pack"] == acc
            acc += r["ug_tokens"]

    # 3. manifest order: export_pos is dense 1..n per export shard
    by_shard = defaultdict(list)
    for r in rows:
        assert 0 <= r["export_shard"] < _CX05_ESHARDS
        by_shard[r["export_shard"]].append(r["export_pos"])
    for ps in by_shard.values():
        assert sorted(ps) == list(range(1, len(ps) + 1))

    # 4. tokenize stage: unigram piece counts are at least 1 per word,
    #    so every doc's ug_tokens >= its curation-gate minimum of 20
    assert all(r["ug_tokens"] >= 20 for r in rows)
