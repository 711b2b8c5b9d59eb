"""HLL inclusion-exclusion overlaps vs exact intersection counts on
the orders table (customer overlap between order-priority segments)."""

from __future__ import annotations

import itertools

import pytest
from pyspark.sql import functions as F

from eth_options_data_pipeline_spark.operators.sketch_algebra import overlap_matrix
from eth_options_data_pipeline_spark.sources import load_table


@pytest.fixture(scope="module")
def orders(spark, sf_small):
    return load_table(spark, sf_small, "orders").select(
        "o_orderpriority", "o_custkey").cache()


def exact_overlaps(orders):
    rows = orders.distinct().collect()
    sets: dict[str, set] = {}
    for r in rows:
        sets.setdefault(r["o_orderpriority"], set()).add(r["o_custkey"])
    out = {}
    for ga, gb in itertools.combinations(sorted(sets), 2):
        out[(ga, gb)] = {
            "inter": len(sets[ga] & sets[gb]),
            "union": len(sets[ga] | sets[gb]),
            "n_a": len(sets[ga]),
            "n_b": len(sets[gb]),
        }
    return out


def test_estimates_track_exact_counts(spark, orders):
    got = {(r["group_a"], r["group_b"]): r
           for r in overlap_matrix(orders, "o_orderpriority", "o_custkey").collect()}
    want = exact_overlaps(orders)
    assert set(got) == set(want)
    for pair, w in want.items():
        g = got[pair]
        # HLL default lgConfigK=12 => ~1.6% standard error per sketch;
        # inclusion-exclusion compounds three estimates. 10% relative
        # tolerance (+2 absolute for tiny sets) is comfortably outside
        # noise while still failing on any real logic error.
        assert g["union_est"] == pytest.approx(w["union"], rel=0.10, abs=2)
        assert g["inter_est"] == pytest.approx(w["inter"], rel=0.10, abs=max(2, 0.05 * w["union"]))
        assert g["n_a"] == pytest.approx(w["n_a"], rel=0.10, abs=2)
        jac = w["inter"] / w["union"] if w["union"] else 0.0
        assert g["jaccard_est"] == pytest.approx(jac, abs=0.08)


def test_intersections_never_negative(spark, orders):
    bad = (overlap_matrix(orders, "o_orderpriority", "o_custkey")
           .where(F.col("inter_est") < 0).count())
    assert bad == 0


def test_single_scan_plan(spark, orders):
    """The overlap matrix must scan the raw table once: both join sides
    replay the cached sketch table instead of cloning the aggregation
    subtree (which would re-scan raw data per side)."""
    df = overlap_matrix(orders, "o_orderpriority", "o_custkey")
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the sketch table is a rotation-managed CACHE (r16 — safe to
    # release across invocations, unlike the former localCheckpoint):
    # both join sides read ONE InMemoryRelation, so the hll_sketch_agg
    # subtree is built once and never cloned onto a join side. The
    # toString expands the cached plan under InMemoryRelation, so the
    # agg may only appear BELOW the first InMemoryRelation line.
    assert plan.count("InMemoryTableScan") >= 2, plan
    above_cache = plan.split("InMemoryRelation", 1)[0]
    assert "hll_sketch_agg" not in above_cache, \
        "aggregation must live below the cache, not on a join side"
