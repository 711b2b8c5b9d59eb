"""Face-level chaos tests for the sx07/sx08 scratch-staging guards
(queries/analytics16.py `_stage_slices` + `_done` gating) — VERDICT
r06 item 5. The compaction swap has its own crash matrix in
test_agg_maintain.py; these drive the FACES through the same crash
points, because the faces are what the driver actually invokes:

  (a) crash mid-staging      -> staging tree present, target absent;
                                the next invocation discards and
                                rebuilds, never serves a partial tree;
  (b) crash between sx08's base overwrite and the arrivals rename
                             -> rerun redoes the base overwrite
                                idempotently before streaming;
  (c) crash mid-stream       -> checkpoint has committed a prefix of
                                the micro-batches; the rerun resumes
                                from the checkpoint and converges;
  (d) crash between stream completion and the `_done` marker
                             -> rerun replays an already-applied
                                stream (no new files), stays exact.

Each scenario runs against its own symlinked sf_dir basename so the
per-application scratch directories are isolated from the real corpus
sweep's sx07/sx08 runs.
"""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest

# r13 suite-budget trim: stateful-stream tests run their queries
# at 2 shuffle partitions (see conftest.stream_parts)
pytestmark = pytest.mark.usefixtures("stream_parts")
from pyspark.sql import functions as F

from eth_options_data_pipeline_spark.operators.incremental_agg import (
    finalize, partial_state,
)
from eth_options_data_pipeline_spark.queries import analytics16
from eth_options_data_pipeline_spark.sources import load_table
from eth_options_data_pipeline_spark.streaming.agg_maintain import (
    StreamingAggMaintenance,
)
from eth_options_data_pipeline_spark.streaming.cdc_apply import StreamingCdcApply


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _linked_sf(tmp_path, sf_small, name):
    link = tmp_path / name
    os.symlink(sf_small, link)
    return str(link)


def _scratch(spark, prefix, sf_dir):
    return os.path.join(
        tempfile.gettempdir(),
        f"{prefix}_{spark.sparkContext.applicationId}",
        os.path.basename(os.path.normpath(sf_dir)))


def _sx07_want(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderpriority")
    return _rows(finalize(
        partial_state(orders, ["o_orderpriority"], "o_totalprice"),
        ["o_orderpriority"]))


def _sx08_want(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderpriority")
    updates = orders.where(F.col("o_orderkey") % 10 == 0).withColumn(
        "o_totalprice", F.round(F.col("o_totalprice") * 2, 2))
    base = orders.where(F.col("o_orderkey") % 3 != 0)
    merged = base.join(updates.select("o_orderkey"), "o_orderkey",
                       "left_anti").unionByName(updates)
    return _rows(merged.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.round(F.sum("o_totalprice"), 2).alias("total")))


def test_sx07_partial_staging_discarded_and_rebuilt(spark, sf_small, tmp_path):
    sf = _linked_sf(tmp_path, sf_small, "sx07stagecrash")
    scratch = _scratch(spark, "aggmaint_face", sf)
    staging = os.path.join(scratch, "in_staging")
    os.makedirs(staging)
    with open(os.path.join(staging, "part-junk.parquet"), "w") as f:
        f.write("torn half-written slice")           # crash point (a)
    got = _rows(analytics16.sx07_agg_maintain_stream(spark, sf))
    assert got == _sx07_want(spark, sf)
    assert not os.path.isdir(staging)


def test_sx07_mid_stream_crash_resumes_from_checkpoint(
        spark, sf_small, tmp_path, monkeypatch):
    sf = _linked_sf(tmp_path, sf_small, "sx07streamcrash")
    real = StreamingAggMaintenance._process_batch

    def crashing(self, batch_df, batch_id):
        if batch_id >= 1:
            raise RuntimeError("injected crash at batch 1")
        real(self, batch_df, batch_id)

    monkeypatch.setattr(StreamingAggMaintenance, "_process_batch", crashing)
    with pytest.raises(Exception):                   # crash point (c)
        analytics16.sx07_agg_maintain_stream(spark, sf)
    monkeypatch.setattr(StreamingAggMaintenance, "_process_batch", real)
    # no _done marker was written; the rerun resumes the stream from
    # the checkpoint (batch 0 committed, 1..2 replayed) and serves exact
    want = _sx07_want(spark, sf)
    assert _rows(analytics16.sx07_agg_maintain_stream(spark, sf)) == want
    # crash point (d) over the SAME completed lineage (r13 suite trim):
    # lose the done marker, the replay must serve identical rows
    shutil.rmtree(os.path.join(_scratch(spark, "aggmaint_face", sf), "_done"))
    assert _rows(analytics16.sx07_agg_maintain_stream(spark, sf)) == want


def test_sx08_crash_between_base_write_and_rename(
        spark, sf_small, tmp_path, monkeypatch):
    sf = _linked_sf(tmp_path, sf_small, "sx08basecrash")

    def staging_crash(write_slices, target):
        staging = target + "_staging"
        if os.path.isdir(staging):
            shutil.rmtree(staging)
        write_slices(staging)
        raise RuntimeError("injected crash before arrivals rename")

    monkeypatch.setattr(analytics16, "_stage_slices", staging_crash)
    with pytest.raises(RuntimeError):                # crash point (b)
        analytics16.sx08_cdc_apply_stream(spark, sf)
    scratch = _scratch(spark, "cdc_face", sf)
    assert os.path.isdir(os.path.join(scratch, "table"))       # base landed
    assert not os.path.isdir(os.path.join(scratch, "changes"))  # no rename
    monkeypatch.undo()
    # rerun redoes the base overwrite idempotently, restages, streams
    got = _rows(analytics16.sx08_cdc_apply_stream(spark, sf))
    assert got == _sx08_want(spark, sf)


def test_sx08_mid_stream_crash_replays_merge_convergently(
        spark, sf_small, tmp_path, monkeypatch):
    sf = _linked_sf(tmp_path, sf_small, "sx08streamcrash")
    real = StreamingCdcApply._process_batch
    seen = []

    def crashing(self, batch_df, batch_id):
        real(self, batch_df, batch_id)               # merge APPLIED ...
        if batch_id == 1 and not seen:
            seen.append(batch_id)
            raise RuntimeError("injected crash after batch-1 merge")

    monkeypatch.setattr(StreamingCdcApply, "_process_batch", crashing)
    with pytest.raises(Exception):                   # crash point (c),
        analytics16.sx08_cdc_apply_stream(spark, sf)  # post-apply pre-commit
    monkeypatch.setattr(StreamingCdcApply, "_process_batch", real)
    # batch 1 was applied but never committed -> the rerun REPLAYS it;
    # merge_upsert converges (same-key updates rewrite the same rows)
    want = _sx08_want(spark, sf)
    assert _rows(analytics16.sx08_cdc_apply_stream(spark, sf)) == want
    # crash point (d) over the SAME converged lineage (r13 suite trim)
    shutil.rmtree(os.path.join(_scratch(spark, "cdc_face", sf), "_done"))
    assert _rows(analytics16.sx08_cdc_apply_stream(spark, sf)) == want


# ---- round-10 faces: sx09 (containment screen), sx10 (quantiles) ----

def _sx09_want(spark, sf_dir):
    from eth_options_data_pipeline_spark.operators.containment import (
        containment_pairs,
    )
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return _rows(containment_pairs(docs))


def test_sx09_crash_matrix_single_lineage(
        spark, sf_small, tmp_path, monkeypatch):
    """Scenarios (c) mid-stream crash/resume and (d) done-marker
    replay, walked over ONE scratch lineage (r13 suite trim: the
    resume run's completed state IS the done-marker scenario's
    precondition, so chaining them saves a full face run with zero
    scenario loss)."""
    from eth_options_data_pipeline_spark.queries import analytics18
    from eth_options_data_pipeline_spark.streaming.containment_stream import (
        StreamingContainmentScreen,
    )
    sf = _linked_sf(tmp_path, sf_small, "sx09streamcrash")
    real = StreamingContainmentScreen._process_batch

    def crashing(self, batch_df, batch_id):
        if batch_id >= 1:
            raise RuntimeError("injected crash at batch 1")
        real(self, batch_df, batch_id)

    monkeypatch.setattr(StreamingContainmentScreen, "_process_batch", crashing)
    with pytest.raises(Exception):
        analytics18.sx09_containment_stream(spark, sf)     # (c) crash
    monkeypatch.setattr(StreamingContainmentScreen, "_process_batch", real)
    want = _sx09_want(spark, sf)
    assert _rows(analytics18.sx09_containment_stream(spark, sf)) == want
    # (d): same completed state, lose the done marker, replay
    shutil.rmtree(os.path.join(_scratch(spark, "contstream_face", sf), "_done"))
    assert _rows(analytics18.sx09_containment_stream(spark, sf)) == want


def test_sx10_crash_matrix_single_lineage(spark, sf_small, tmp_path):
    """Scenarios (a) partial staging discarded and (d) done-marker
    replay over ONE lineage (r13 suite trim)."""
    from eth_options_data_pipeline_spark.queries import analytics18
    sf = _linked_sf(tmp_path, sf_small, "sx10stagecrash")
    scratch = _scratch(spark, "squant_face", sf)
    staging = os.path.join(scratch, "in_staging")
    os.makedirs(staging)
    with open(os.path.join(staging, "part-junk.parquet"), "w") as f:
        f.write("torn half-written slice")                 # (a)
    first = _rows(analytics18.sx10_stream_quantiles(spark, sf))
    assert first and not os.path.isdir(staging)
    # served rows are internally consistent: cum <= tot, thresholds met
    for (permille, q, bucket, cum, tot, lo, mn, mx) in first:
        assert cum <= tot and mn <= mx
        assert cum * 1000 >= permille * tot  # cum >= ceil(permille*tot/1000)
    # (d): lose the done marker, replay must serve identical rows
    shutil.rmtree(os.path.join(scratch, "_done"))
    assert _rows(analytics18.sx10_stream_quantiles(spark, sf)) == first


# ------------------- round-11 face: sx11 (budget selection) -------------------

def _sx11_want(spark, sf_dir):
    """Batch truth: select_to_budget over the distinct corpus, same
    column order as the served face."""
    from eth_options_data_pipeline_spark.operators.selection import (
        select_to_budget,
    )
    from eth_options_data_pipeline_spark.queries.analytics20 import (
        _SX11_BUDGET,
    )
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "n_chars")
    stats = (docs.where(F.col("text").isNotNull())
             .select("doc_id",
                     F.col("n_chars").cast("long").alias("quality"),
                     F.size(F.split("text", " ")).cast("long").alias("toks")))
    sel = select_to_budget(stats, "quality", "toks", _SX11_BUDGET)
    return _rows(sel.select("doc_id", "quality", "toks",
                            F.col("cum_tokens").cast("long")))


def test_sx11_mid_stream_crash_resumes_from_checkpoint(
        spark, sf_small, tmp_path, monkeypatch):
    from eth_options_data_pipeline_spark.queries import analytics20
    from eth_options_data_pipeline_spark.streaming.budget_stream import (
        StreamingBudgetSelection,
    )
    sf = _linked_sf(tmp_path, sf_small, "sx11streamcrash")
    real = StreamingBudgetSelection._process_batch

    def crashing(self, batch_df, batch_id):
        if batch_id >= 1:
            raise RuntimeError("injected crash at batch 1")
        real(self, batch_df, batch_id)

    monkeypatch.setattr(StreamingBudgetSelection, "_process_batch", crashing)
    with pytest.raises(Exception):
        analytics20.sx11_budget_stream(spark, sf)
    monkeypatch.setattr(StreamingBudgetSelection, "_process_batch", real)
    want = _sx11_want(spark, sf)
    got = _rows(analytics20.sx11_budget_stream(spark, sf)
                .select("doc_id", "quality", "toks", "cum_tokens"))
    assert got == want
    # done-marker scenario over the SAME completed lineage (r13 suite
    # trim — formerly its own test with two more face runs): lose the
    # marker, the replay must serve identical rows
    shutil.rmtree(os.path.join(
        _scratch(spark, "budgetstream_face", sf), "_done"))
    again = analytics20.sx11_budget_stream(spark, sf).select(
        "doc_id", "quality", "toks", "cum_tokens")
    assert _rows(again) == want


def test_sx11_crash_between_docs_and_buckets_writes(
        spark, sf_small, tmp_path, monkeypatch):
    """The ADVICE r11 window: a batch crashes AFTER its docs partition
    lands but BEFORE its buckets partial lands. The replay must
    regenerate the missing partial (the anti-join excludes the batch's
    own partition), not anti-join the batch's docs away and leave its
    tokens permanently missing from the bucket totals."""
    from eth_options_data_pipeline_spark.queries import analytics20
    from eth_options_data_pipeline_spark.streaming.budget_stream import (
        StreamingBudgetSelection,
    )
    sf = _linked_sf(tmp_path, sf_small, "sx11midwrite")
    real = StreamingBudgetSelection._process_batch
    crashed = {"done": False}

    def crashing(self, batch_df, batch_id):
        real(self, batch_df, batch_id)
        if batch_id == 1 and not crashed["done"]:
            # Simulate dying between the two writes: the docs
            # partition is on disk, the buckets partial is not.
            crashed["done"] = True
            shutil.rmtree(os.path.join(
                self.buckets_dir, f"batch_id={batch_id}"))
            raise RuntimeError("injected crash after docs write")

    monkeypatch.setattr(StreamingBudgetSelection, "_process_batch", crashing)
    with pytest.raises(Exception):
        analytics20.sx11_budget_stream(spark, sf)
    monkeypatch.setattr(StreamingBudgetSelection, "_process_batch", real)
    got = _rows(analytics20.sx11_budget_stream(spark, sf)
                .select("doc_id", "quality", "toks", "cum_tokens"))
    assert got == _sx11_want(spark, sf)


# (sx11's done-marker scenario rides the mid-stream lineage above —
# r13 suite trim, zero scenario loss)


# ------------------- round-12 face: sx12 (streaming ANN index) -------------------

def _sx12_want(spark, sf_dir):
    """Batch truth: the frozen-quantizer IVF top-k over the distinct
    corpus — assign every vector with the same centroids the stream
    froze, then probe/rank exactly as the serving path does."""
    from eth_options_data_pipeline_spark.queries.analytics21 import (
        _SX12_CELLS, _SX12_NPROBE, _SX12_NQ, _SX12_TOPK, _SX12_TRAIN,
    )
    from eth_options_data_pipeline_spark.streaming.ann_stream import (
        StreamingIVFIndex, train_quantizer,
    )
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e"))
    cents = train_quantizer(
        emb.where(F.col("vec_id") < _SX12_TRAIN), k=_SX12_CELLS)
    idx = StreamingIVFIndex(
        os.path.join(tempfile.mkdtemp(prefix="sx12want"), "state"), cents)
    (idx._assign(emb).withColumn("batch_id", F.lit(0))
     .write.partitionBy("batch_id", "cell").parquet(idx.state_dir))
    return _rows(idx.topk(spark, emb.where(F.col("vec_id") < _SX12_NQ),
                          nprobe=_SX12_NPROBE, k=_SX12_TOPK))


def test_sx12_mid_stream_then_done_marker_single_lineage(
        spark, sf_small, tmp_path, monkeypatch):
    """Scenarios (c) mid-stream crash/resume and (d) done-marker
    replay over ONE scratch lineage (r13 suite trim — the resume's
    completed state is (d)'s precondition; the batch-truth want is
    computed once for both)."""
    from eth_options_data_pipeline_spark.queries import analytics21
    from eth_options_data_pipeline_spark.streaming.ann_stream import (
        StreamingIVFIndex,
    )
    sf = _linked_sf(tmp_path, sf_small, "sx12streamcrash")
    real = StreamingIVFIndex._process_batch

    def crashing(self, batch_df, batch_id):
        if batch_id >= 1:
            raise RuntimeError("injected crash at batch 1")
        real(self, batch_df, batch_id)

    monkeypatch.setattr(StreamingIVFIndex, "_process_batch", crashing)
    with pytest.raises(Exception):
        analytics21.sx12_ann_stream(spark, sf)             # (c) crash
    monkeypatch.setattr(StreamingIVFIndex, "_process_batch", real)
    want = _sx12_want(spark, sf)
    assert _rows(analytics21.sx12_ann_stream(spark, sf)) == want
    # (d): same completed state, lose the done marker, replay
    shutil.rmtree(os.path.join(
        _scratch(spark, "annstream_face", sf), "_done"))
    assert _rows(analytics21.sx12_ann_stream(spark, sf)) == want


def test_sx12_crash_after_partial_list_write_replays_idempotently(
        spark, sf_small, tmp_path, monkeypatch):
    """Crash AFTER batch 1's lists land but BEFORE the checkpoint
    commits: the replayed batch must regenerate exactly its own
    (batch_id, cell) partitions (the anti-join excludes the in-flight
    batch), leaving the served top-k equal to the batch truth. This
    scenario needs its own lineage — the crash leaves orphaned list
    partitions the other walk never creates."""
    from eth_options_data_pipeline_spark.queries import analytics21
    from eth_options_data_pipeline_spark.streaming.ann_stream import (
        StreamingIVFIndex,
    )
    sf = _linked_sf(tmp_path, sf_small, "sx12midwrite")
    real = StreamingIVFIndex._process_batch
    crashed = {"done": False}

    def crashing(self, batch_df, batch_id):
        real(self, batch_df, batch_id)
        if batch_id == 1 and not crashed["done"]:
            crashed["done"] = True
            raise RuntimeError("injected crash after list write")

    monkeypatch.setattr(StreamingIVFIndex, "_process_batch", crashing)
    with pytest.raises(Exception):
        analytics21.sx12_ann_stream(spark, sf)
    monkeypatch.setattr(StreamingIVFIndex, "_process_batch", real)
    got = _rows(analytics21.sx12_ann_stream(spark, sf))
    assert got == _sx12_want(spark, sf)
