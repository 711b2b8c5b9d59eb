"""dx60 crafted edges: an identical pair must land in the top
calibration bucket with zero error; the bucket stats must be
internally consistent with the per-pair definition."""

from __future__ import annotations

from eth_options_data_pipeline_spark.queries.analytics18 import (
    dx60_minhash_error,
)


def test_identical_pair_lands_in_top_bucket_with_zero_error(
        spark, tmp_path):
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta eta theta", "en", "s", 1),
         (2, "alpha beta gamma delta epsilon zeta eta theta", "en", "s", 1),
         (3, "one two three four five six seven eight nine", "en", "s", 1)],
        "doc_id long, text string, lang string, source string, n_chars long")
    sf = str(tmp_path)
    docs.write.parquet(f"{sf}/documents.parquet")
    rows = {r["sig_matches"]: r for r in dx60_minhash_error(spark, sf).collect()}
    assert 8 in rows
    top = rows[8]
    assert top["est_sim"] == 1.0
    assert top["mean_exact"] == 1.0
    assert top["mean_abs_err"] == 0.0
    assert top["n_pairs"] >= 1
    for r in rows.values():
        assert 0 <= r["mean_exact"] <= 1
        assert 0 <= r["mean_abs_err"] <= 1
