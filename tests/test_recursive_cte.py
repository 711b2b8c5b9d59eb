"""qx53_recursive_cte: the WITH RECURSIVE SQL surface (Spark 4).

Value parity with DuckDB rides the registry-wide oracle sweep; these
tests pin the face's own invariants — every customer's chain
completes exactly once, depth is the quaternary tree level — and the
plan shape: the recursion executes as Spark's iterative UnionLoop
with the parent table's columns pruned inside the loop body.
"""

from __future__ import annotations

from eth_options_data_pipeline_spark.queries import REGISTRY
from eth_options_data_pipeline_spark.sources import load_table


def _depth(key: int) -> int:
    d, cur = 0, key
    while cur > 1:
        cur = max(cur // 4, 1)
        d += 1
    return d


def test_every_customer_chain_completes_once(spark, sf_small):
    rows = REGISTRY["qx53_recursive_cte"].fn(spark, sf_small).collect()
    n_cust = load_table(spark, sf_small, "customer").count()
    assert sum(r["n_chains"] for r in rows) == n_cust
    # the per-depth histogram is the tree's level structure: depth of
    # key k is the number of /4 hops to the {0, 1} root band
    keys = [r["c_custkey"] for r in
            load_table(spark, sf_small, "customer")
            .select("c_custkey").collect()]
    expect: dict[int, int] = {}
    for k in keys:
        expect[_depth(k)] = expect.get(_depth(k), 0) + 1
    got = {r["depth"]: r["n_chains"] for r in rows}
    assert got == expect


def test_recursion_plans_as_unionloop_with_pruned_loop_body(
        spark, sf_small):
    df = REGISTRY["qx53_recursive_cte"].fn(spark, sf_small)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "UnionLoop" in plan, plan
    # the loop body's customer side must carry only the join key and
    # the balance (a pruning Project over the materialized table) —
    # a full-width feed inside an iterated join would pay 5 columns
    # x depth. Assert the pruning PROPERTY, not one exact rendering
    # (ADVICE r12 — the literal two-column regex broke on plan-format
    # or projection-order drift): some Project line must reference
    # c_custkey and c_acctbal while carrying NONE of the unused
    # customer columns. (The LogicalRDD's own schema line always
    # lists every column; the Project above it is what the loop
    # actually reads.)
    unused = ("c_name", "c_address", "c_nationkey", "c_phone",
              "c_mktsegment", "c_comment")
    pruned = [
        line for line in plan.splitlines()
        if "Project" in line and "c_custkey" in line
        and "c_acctbal" in line
        and not any(u in line for u in unused)
    ]
    assert pruned, plan
