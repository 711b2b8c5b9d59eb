"""qx54_variant_extract: Spark 4's VARIANT semi-structured surface.

Value parity rides the registry oracle sweep; these tests pin the
VARIANT semantics the face depends on — heterogeneous document
schemas coexisting in one column, ``try_variant_get`` returning NULL
exactly where the path is absent — and the plan shape: everything up
to the final aggregate is row-local (a single exchange in the plan).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from eth_options_data_pipeline_spark.queries import REGISTRY
from eth_options_data_pipeline_spark.sources import load_table


def _variants(spark, sf_small):
    o = load_table(spark, sf_small, "orders")
    payload = F.to_json(F.struct(
        F.col("o_orderkey").alias("id"),
        F.when(F.col("o_orderkey") % 3 == 0,
               F.array(F.col("o_orderkey") % 7)).alias("tags")))
    return o.select(
        "o_orderkey",
        F.parse_json(payload).alias("v"))


def test_heterogeneous_schemas_coexist(spark, sf_small):
    v = _variants(spark, sf_small)
    schemas = {r["s"]: r["c"] for r in
               v.select(F.schema_of_variant("v").alias("s"))
                .groupBy("s").agg(F.count(F.lit(1)).alias("c"))
                .collect()}
    assert len(schemas) == 2, schemas
    with_tags = [s for s in schemas if "tags" in s]
    assert len(with_tags) == 1
    total = sum(schemas.values())
    # every third key carries tags (keys are contiguous from 0)
    assert abs(schemas[with_tags[0]] - total / 3) <= 1


def test_try_variant_get_null_exactly_on_missing_path(spark, sf_small):
    v = _variants(spark, sf_small)
    got = v.select(
        "o_orderkey",
        F.try_variant_get("v", "$.tags[0]", "long").alias("t0"))
    bad = got.where(
        (F.col("o_orderkey") % 3 == 0) != F.col("t0").isNotNull())
    assert bad.count() == 0


def test_qx54_single_exchange_plan(spark, sf_small):
    """Construction, parse, and extraction are row-local; the only
    exchange is the final groupBy. (spread_small_input adds one
    round-robin exchange below the scan at test scale — excluded by
    counting exchanges introduced ABOVE the scan's spread.)"""
    df = REGISTRY["qx54_variant_extract"].fn(spark, sf_small)
    plan = df._jdf.queryExecution().executedPlan().toString()
    n_exchanges = plan.count("Exchange ")
    # one hashpartitioning exchange for the aggregate + the source
    # spread's round-robin — nothing else
    assert n_exchanges <= 2, plan
    assert "variant_get" in plan
