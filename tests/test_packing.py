"""Sequence packing: exactness of the greedy bound, whole-document
placement, determinism, and offset arithmetic."""

from __future__ import annotations

from pyspark.sql import functions as F

from eth_options_data_pipeline_spark.operators.packing import pack_documents
from eth_options_data_pipeline_spark.sources import load_table

SF_DIR = "/root/testdata/sf0.001"
BUDGET = 200


def _packed(spark):
    docs = load_table(spark, SF_DIR, "documents").select(
        "doc_id", F.size(F.split("text", r"\s+")).alias("n_tokens"))
    return docs, pack_documents(docs, "doc_id", "n_tokens", budget=BUDGET)


def test_every_doc_packed_whole_once(spark):
    docs, packed = _packed(spark)
    assert packed.count() == docs.count()
    assert packed.select("doc_id_packed").distinct().count() == docs.count()


def test_pack_budget_respected(spark):
    docs, packed = _packed(spark)
    totals = (
        packed.join(docs, packed.doc_id_packed == docs.doc_id)
        .groupBy("pack_id")
        .agg(F.sum("n_tokens").alias("total"), F.count(F.lit(1)).alias("n_docs"))
    )
    # a pack may exceed the budget only as a single oversize document
    bad = totals.where((F.col("total") > BUDGET) & (F.col("n_docs") > 1))
    assert bad.count() == 0
    # packing actually packs: most packs hold multiple documents
    multi = totals.where(F.col("n_docs") > 1).count()
    assert multi > 0


def test_offsets_are_running_token_positions(spark):
    docs, packed = _packed(spark)
    rows = (
        packed.join(docs, packed.doc_id_packed == docs.doc_id)
        .select("pack_id", "offset_in_pack", "n_tokens", "pack_tokens")
        .collect()
    )
    by_pack: dict[int, list] = {}
    for r in rows:
        by_pack.setdefault(r["pack_id"], []).append(r)
    for members in by_pack.values():
        members.sort(key=lambda r: r["offset_in_pack"])
        run = 0
        for r in members:
            assert r["offset_in_pack"] == run
            run += r["n_tokens"]
            assert r["pack_tokens"] == run


def test_packing_is_deterministic(spark):
    _, a = _packed(spark)
    _, b = _packed(spark)
    sa = sorted(map(tuple, a.collect()))
    sb = sorted(map(tuple, b.collect()))
    assert sa == sb
