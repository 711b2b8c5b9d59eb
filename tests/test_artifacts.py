"""session_artifact (operators/artifacts.py): build-once semantics,
crash-safe staging, and thread-safety — the freeze machinery dx65 /
vx07 / dx67 / dx68 / sx12 all ride on."""

from __future__ import annotations

import os
import shutil
import tempfile
import threading

from pyspark.sql import functions as F

from eth_options_data_pipeline_spark.operators.artifacts import (
    session_artifact,
)


def _family_root(spark, family, sf_dir):
    return os.path.join(
        tempfile.gettempdir(),
        f"{family}_{spark.sparkContext.applicationId}",
        os.path.basename(os.path.normpath(sf_dir)))


def test_builds_once_and_serves_after(spark, tmp_path):
    sf = str(tmp_path / "sfX")
    os.makedirs(sf)
    calls = []

    def build():
        calls.append(1)
        return spark.range(5).select(F.col("id").alias("v"))

    a = session_artifact(spark, "arttest_once", sf, "t", build)
    b = session_artifact(spark, "arttest_once", sf, "t", build)
    assert sorted(r["v"] for r in a.collect()) == [0, 1, 2, 3, 4]
    assert sorted(r["v"] for r in b.collect()) == [0, 1, 2, 3, 4]
    assert len(calls) == 1  # second call served the landing


def test_partial_staging_discarded_and_rebuilt(spark, tmp_path):
    """A crash mid-build leaves only a staging tree; the next call
    discards it and rebuilds — never serves a torn artifact."""
    sf = str(tmp_path / "sfY")
    os.makedirs(sf)
    root = os.path.join(_family_root(spark, "arttest_crash", sf), "t")
    staging = root + "_staging"
    os.makedirs(staging)
    with open(os.path.join(staging, "part-junk.parquet"), "w") as f:
        f.write("torn half-written artifact")
    out = session_artifact(
        spark, "arttest_crash", sf, "t",
        lambda: spark.range(3).select(F.col("id").alias("v")))
    assert sorted(r["v"] for r in out.collect()) == [0, 1, 2]
    assert not os.path.isdir(staging)
    assert os.path.isdir(root)


def test_concurrent_builders_build_exactly_once(spark, tmp_path):
    """The per-path lock serializes same-session builders (the
    threaded plan-compile fixture constructs faces concurrently)."""
    sf = str(tmp_path / "sfZ")
    os.makedirs(sf)
    calls = []
    lock = threading.Lock()

    def build():
        with lock:
            calls.append(1)
        return spark.range(4).select(F.col("id").alias("v"))

    results = [None] * 4

    def worker(i):
        results[i] = sorted(
            r["v"] for r in session_artifact(
                spark, "arttest_conc", sf, "t", build).collect())

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert all(r == [0, 1, 2, 3] for r in results)
    assert len(calls) == 1


def test_artifacts_keyed_by_sf_dir(spark, tmp_path):
    """Different sf_dirs never share a landing (same face at sf0.001
    and sf0.01 in one session must not cross-contaminate)."""
    a_dir, b_dir = str(tmp_path / "sfA"), str(tmp_path / "sfB")
    os.makedirs(a_dir)
    os.makedirs(b_dir)
    a = session_artifact(spark, "arttest_key", a_dir, "t",
                         lambda: spark.range(2).select(
                             F.lit("a").alias("tag")))
    b = session_artifact(spark, "arttest_key", b_dir, "t",
                         lambda: spark.range(2).select(
                             F.lit("b").alias("tag")))
    assert {r["tag"] for r in a.collect()} == {"a"}
    assert {r["tag"] for r in b.collect()} == {"b"}


def teardown_module(module):
    import glob
    for d in glob.glob(os.path.join(tempfile.gettempdir(), "arttest_*")):
        shutil.rmtree(d, ignore_errors=True)
