"""Containment and recall properties of the fuzzy near-dup miners.

dx10_neardup_pairs emits three methods; these tests pin the relations
between them that the docstrings claim:

* ``char_banded`` restricted to the brute slice (doc_id < 60) is a
  subset of ``char_brute`` — LSH banding can only *miss* true pairs,
  never invent ones the exact all-pairs Jaccard rejects (both verify
  with the same >= 0.5 threshold).
* The giant-bucket cap (text.LSH_BUCKET_CAP) drops no verified pair on
  the test corpus: the capped candidate set still contains every pair
  the uncapped banding verifies.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from eth_options_data_pipeline_spark.operators import text as tx
from eth_options_data_pipeline_spark.queries.analytics3 import dx10_neardup_pairs
from eth_options_data_pipeline_spark.sources import load_table

SF_DIR = "/root/testdata/sf0.01"


def _pairs(df, method):
    return {
        (r.doc_a, r.doc_b)
        for r in df.where(F.col("method") == method).select("doc_a", "doc_b").collect()
    }


def test_banded_subset_of_brute_on_slice(spark):
    out = dx10_neardup_pairs(spark, SF_DIR).cache()
    brute = _pairs(out, "char_brute")
    banded_slice = {
        (a, b) for (a, b) in _pairs(out, "char_banded") if a < 60 and b < 60
    }
    assert banded_slice <= brute
    out.unpersist()


def test_bucket_cap_drops_no_verified_pair(spark):
    docs = load_table(spark, SF_DIR, "documents")
    csh = docs.select("doc_id", tx.char_shingles("text").alias("sh")).cache()
    sig = csh.select(
        "doc_id",
        *[c.alias(f"mh{j}") for j, c in enumerate(tx.minhash_signature(F.col("sh")))],
    )
    bands = sig.select(
        "doc_id",
        F.explode(
            tx.band_keys([F.col(f"mh{j}") for j in range(tx.MINHASH_K)])
        ).alias("band_key"),
    )

    def verified(band_df):
        ba, bb = band_df.alias("a"), band_df.alias("b")
        cand = (
            ba.join(bb, (F.col("a.band_key") == F.col("b.band_key"))
                    & (F.col("a.doc_id") < F.col("b.doc_id")))
            .select(F.col("a.doc_id").alias("doc_a"),
                    F.col("b.doc_id").alias("doc_b"))
            .distinct()
        )
        sha = csh.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
        shb = csh.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))
        jv = tx.jaccard(F.col("sh_a"), F.col("sh_b"))
        return {
            (r.doc_a, r.doc_b)
            for r in cand.join(sha, "doc_a").join(shb, "doc_b")
            .where(jv >= 0.5).select("doc_a", "doc_b").collect()
        }

    capped = bands.withColumn(
        "bsz", F.count(F.lit(1)).over(Window.partitionBy("band_key"))
    ).where(F.col("bsz") <= tx.LSH_BUCKET_CAP).drop("bsz")

    assert verified(capped) == verified(bands)
    csh.unpersist()
