"""resize (1->1) and frame-sample (1->N) mapInPandas plumbing faces:
schema, row-count arithmetic, determinism, and modality pushdown."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from eth_options_data_pipeline_spark.operators.multimodal import (
    documents_as_assets,
    resize_assets,
    sample_frames,
)
from eth_options_data_pipeline_spark.sources import load_table

SF_DIR = "/root/testdata/sf0.001"


def _assets(spark):
    return documents_as_assets(load_table(spark, SF_DIR, "documents"))


def test_resize_preserves_rows_and_bounds_dims(spark):
    assets = _assets(spark).cache()
    out = resize_assets(assets, max_dim=64)
    rows = out.collect()
    assert len(rows) == assets.count()
    assert out.columns == ["asset_id", "width", "height", "thumbnail"]
    for r in rows:
        assert 16 <= r["width"] <= 64 and 16 <= r["height"] <= 64
        assert len(r["thumbnail"]) <= 64 * 64 // 8
    assets.unpersist()


def test_resize_is_deterministic(spark):
    assets = _assets(spark)
    a = {r["asset_id"]: (r["width"], r["height"], bytes(r["thumbnail"]))
         for r in resize_assets(assets).collect()}
    b = {r["asset_id"]: (r["width"], r["height"], bytes(r["thumbnail"]))
         for r in resize_assets(assets).collect()}
    assert a == b


def test_frame_sampling_fanout_arithmetic(spark):
    assets = _assets(spark).cache()
    stride, max_frames = 100, 8
    out = sample_frames(assets, stride=stride, max_frames=max_frames)
    got = out.groupBy("asset_id").agg(F.count(F.lit(1)).alias("n")).collect()
    sizes = {r["asset_id"]: r["n_bytes"] for r in assets.where(
        F.col("modality") == "video").select(
        "asset_id", F.octet_length("content").alias("n_bytes")).collect()}
    assert len(got) == len(sizes) > 0
    for r in got:
        expect = min(max(sizes[r["asset_id"]] + stride - 1, 1) // stride,
                     max_frames)
        assert r["n"] == expect
    # only video modality crosses into the Python stage
    non_video = {r["asset_id"] for r in assets.where(
        F.col("modality") != "video").select("asset_id").collect()}
    assert non_video.isdisjoint({r["asset_id"] for r in got})
    assets.unpersist()


def test_corpus_text_is_ascii_so_byte_and_char_offsets_agree(spark):
    """The mm02/mm03 oracles slice `text` with CHARACTER-based
    substr/ord/length while the operators slice the UTF-8 BYTE payload
    (documents_as_assets encodes text). Parity holds only while the
    corpus is pure ASCII — this test pins that precondition at both
    sweep scales so any future non-ASCII testdata fails HERE with a
    clear message instead of as an opaque oracle hash mismatch."""
    for sf_dir in (SF_DIR, "/root/testdata/sf0.01"):
        docs = load_table(spark, sf_dir, "documents")
        non_ascii = docs.where(
            F.octet_length("text") != F.length("text")).count()
        assert non_ascii == 0, (
            f"{sf_dir}: {non_ascii} non-ASCII documents — mm02/mm03 "
            "char-based oracle SQL no longer matches the byte-based "
            "operators; rewrite the oracles byte-based before trusting "
            "their hashes")


def test_frame_checksums_match_local_slicing(spark):
    assets = _assets(spark)
    one = assets.where(F.col("modality") == "video").limit(1).collect()[0]
    out = sample_frames(assets.where(F.col("asset_id") == one["asset_id"]),
                        stride=64, max_frames=4).orderBy("frame_idx").collect()
    raw = bytes(one["content"])
    for r in out:
        sl = raw[r["frame_offset"]:r["frame_offset"] + 64]
        assert r["frame_checksum"] == hashlib.md5(sl).hexdigest()
        assert r["frame_idx"] == r["frame_offset"] // 64
