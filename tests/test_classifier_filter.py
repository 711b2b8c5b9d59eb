"""Classifier-based filtering: the trained model separates held-out
documents from two constructed vocabularies (the testdata corpus'
lang labels are independent of its text, so separability has to be
built), scoring is shuffle-free and vector-free in its output
schema, and the gate is exactly the threshold filter."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from eth_options_data_pipeline_spark.operators.classifier_filter import (
    classifier_gate, score_documents, train_quality_classifier)

GOOD = ["theorem", "lemma", "proof", "integral", "matrix", "tensor",
        "gradient", "convex", "bound", "norm"]
BAD = ["click", "subscribe", "winner", "prize", "cheap", "deal",
       "buy", "offer", "free", "casino"]
SHARED = ["the", "a", "of", "and", "to", "in", "is", "for"]


def _doc(rng, vocab):
    words = [rng.choice(vocab if rng.random() < 0.6 else SHARED)
             for _ in range(rng.randint(20, 40))]
    return " ".join(words)


def _dataset():
    rng = random.Random(0)
    rows = []
    for i in range(200):
        label = i % 2
        rows.append((i, _doc(rng, GOOD if label else BAD), float(label)))
    return rows


@pytest.fixture(scope="module")
def model_and_holdout(spark):
    rows = _dataset()
    df = spark.createDataFrame(rows, ["doc_id", "text", "label"])
    seed = df.where(F.col("doc_id") < 120)
    holdout = df.where(F.col("doc_id") >= 120)
    model = train_quality_classifier(seed)
    return model, holdout


def test_separates_heldout_domains(spark, model_and_holdout):
    model, holdout = model_and_holdout
    rows = score_documents(holdout, model) \
        .select("label", "quality_prob").collect()
    pos = [r.quality_prob for r in rows if r.label == 1.0]
    neg = [r.quality_prob for r in rows if r.label == 0.0]
    assert pos and neg
    assert all(0.0 <= p <= 1.0 for p in pos + neg)
    assert sum(pos) / len(pos) > 0.9
    assert sum(neg) / len(neg) < 0.1


def test_gate_is_threshold_filter_and_schema_clean(spark, model_and_holdout):
    model, holdout = model_and_holdout
    scored = score_documents(holdout, model)
    kept = classifier_gate(holdout, model, threshold=0.7)
    want = {r.doc_id for r in
            scored.where(F.col("quality_prob") >= 0.7).collect()}
    assert {r.doc_id for r in kept.collect()} == want
    # no ml vector types leak into the output schema
    for f in kept.schema.fields:
        assert "Vector" not in type(f.dataType).__name__
    assert set(holdout.columns) <= set(kept.columns)


def test_scoring_plan_is_shuffle_free(spark, model_and_holdout):
    model, holdout = model_and_holdout
    plan = score_documents(holdout, model) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan
    assert "Exchange rangepartitioning" not in plan
