"""Exactness of the q-gram-blocked approximate string join.

``fuzzy_join_pairs`` with ``block_cap=None`` must return EXACTLY the
pairs a brute-force cross product + levenshtein would — the q-gram
blocking bound (Gravano et al. 2001) says no true pair can be lost.
The test materializes that brute-force oracle in Python on the same
keys and compares pair sets, then checks the capped variant is a
subset (capping can only drop candidates, never invent matches).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from eth_options_data_pipeline_spark.operators.fuzzy_join import fuzzy_join_pairs


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


LEFT = [
    (1, "ethereum"), (2, "etherium"), (3, "bitcoin"), (4, "solana"),
    (5, "polkadot"), (6, "avalanche"), (7, "chainlink"), (8, "ETH-26DEC25"),
    (9, "aa"), (10, "ab"),
]
RIGHT = [
    (101, "ethereun"), (102, "bitcoln"), (103, "salana"), (104, "polkadott"),
    (105, "avalanch"), (106, "chainlynk"), (107, "ETH-26DEC24"),
    (108, "ba"), (109, "zz"), (110, "ethereum"),
]


def _spark_pairs(spark, max_distance, block_cap=None):
    left = spark.createDataFrame(LEFT, ["id", "key"])
    right = spark.createDataFrame(RIGHT, ["id", "key"])
    out = fuzzy_join_pairs(left, right, max_distance=max_distance,
                           block_cap=block_cap)
    return {(r.left_id, r.right_id, r.distance) for r in out.collect()}


def _oracle_pairs(max_distance):
    return {
        (li, ri, _lev(lk, rk))
        for li, lk in LEFT
        for ri, rk in RIGHT
        if _lev(lk, rk) <= max_distance
    }


def test_exact_matches_brute_force(spark):
    for d in (1, 2, 3):
        assert _spark_pairs(spark, d) == _oracle_pairs(d), f"d={d}"


def test_zero_distance_is_equality_join(spark):
    assert _spark_pairs(spark, 0) == {(1, 110, 0)}


def test_block_cap_is_subset(spark):
    full = _spark_pairs(spark, 2)
    capped = _spark_pairs(spark, 2, block_cap=3)
    assert capped <= full


def test_no_cartesian_in_plan(spark):
    left = spark.createDataFrame(LEFT, ["id", "key"])
    right = spark.createDataFrame(RIGHT, ["id", "key"])
    plan = fuzzy_join_pairs(left, right)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
