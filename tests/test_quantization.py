"""int8 embedding quantization: reconstruction bound, cosine fidelity,
retrieval recall vs full precision, degenerate vectors."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from eth_options_data_pipeline_spark.operators.quantization import (
    Q_COL, SCALE_COL, cosine_q, dequantize, quantize_int8,
)
from eth_options_data_pipeline_spark.operators.vectors import cosine
from eth_options_data_pipeline_spark.sources import load_table


@pytest.fixture(scope="module")
def emb(spark, sf_small):
    return quantize_int8(
        load_table(spark, sf_small, "embeddings").select("vec_id", "embedding")
    ).cache()


def test_codes_in_range_and_scale_nonnegative(spark, emb):
    bad = emb.where(
        F.exists(F.col(Q_COL), lambda x: (x > 127) | (x < -127))
        | (F.col(SCALE_COL) < 0)
    ).count()
    assert bad == 0


def test_reconstruction_error_bound(spark, emb):
    """|x - q*s| <= s/2 elementwise (round-to-nearest guarantee)."""
    err = F.array_max(F.zip_with(
        F.col("embedding"), dequantize(F.col(Q_COL), F.col(SCALE_COL)),
        lambda x, d: F.abs(x - d)))
    # strict bound plus float slack
    bad = emb.where(err > F.col(SCALE_COL) / 2 + 1e-9).count()
    assert bad == 0


def test_cosine_fidelity(spark, emb):
    """Quantized cosine within 0.02 of float cosine across random pairs."""
    a = emb.where(F.col("vec_id") < 50).alias("a")
    b = emb.where((F.col("vec_id") >= 50) & (F.col("vec_id") < 100)).alias("b")
    pairs = a.crossJoin(b).select(
        cosine(F.col("a.embedding"), F.col("b.embedding")).alias("cf"),
        cosine_q(F.col(f"a.{Q_COL}"), F.col(f"b.{Q_COL}")).alias("cq"),
    )
    worst = pairs.agg(F.max(F.abs(F.col("cf") - F.col("cq")))).first()[0]
    assert worst < 0.02


def test_topk_recall(spark, emb):
    """Top-10 by quantized cosine recovers >= 9 of the float top-10 for
    every probe in a small probe set."""
    probes = [r["vec_id"] for r in emb.select("vec_id").limit(3).collect()]
    for pid in probes:
        p = emb.where(F.col("vec_id") == pid).first()
        base = emb.where(F.col("vec_id") != pid)
        lit_f = F.array(*[F.lit(float(x)) for x in p["embedding"]])
        lit_q = F.array(*[F.lit(int(x)).cast("tinyint") for x in p[Q_COL]])
        top_f = {r["vec_id"] for r in base
                 .orderBy(cosine(F.col("embedding"), lit_f).desc(), "vec_id")
                 .limit(10).collect()}
        top_q = {r["vec_id"] for r in base
                 .orderBy(cosine_q(F.col(Q_COL), lit_q).desc(), "vec_id")
                 .limit(10).collect()}
        assert len(top_f & top_q) >= 9, (pid, top_f, top_q)


def test_zero_vector_safe(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"vec_id": [0], "embedding": [[0.0, 0.0, 0.0]]}))
    row = quantize_int8(df).first()
    assert row[SCALE_COL] == 0.0
    assert list(row[Q_COL]) == [0, 0, 0]
