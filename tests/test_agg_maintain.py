"""Streaming MV maintenance: served aggregate == from-scratch
recompute, micro-batch replay is idempotent, and compaction preserves
the state exactly."""

from __future__ import annotations

import pytest

# r13 suite-budget trim: stateful-stream tests run their queries
# at 2 shuffle partitions (see conftest.stream_parts)
pytestmark = pytest.mark.usefixtures("stream_parts")

import glob

from pyspark.sql import functions as F

from eth_options_data_pipeline_spark.operators.incremental_agg import (
    finalize, partial_state,
)
from eth_options_data_pipeline_spark.sources import load_table
from eth_options_data_pipeline_spark.streaming.agg_maintain import (
    StreamingAggMaintenance,
)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_maintained_equals_recompute_replay_and_compact(
        spark, sf_small, tmp_path):
    orders = load_table(spark, sf_small, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderpriority")
    arrivals = str(tmp_path / "in")
    for i in range(3):
        (orders.where(F.col("o_orderkey") % 3 == i).coalesce(1)
         .write.mode("append").parquet(arrivals))

    maint = StreamingAggMaintenance(
        str(tmp_path / "state"), ["o_orderpriority"], "o_totalprice")
    stream = (spark.readStream.schema(orders.schema)
              .option("maxFilesPerTrigger", 1).parquet(arrivals))
    q = maint.start(stream, str(tmp_path / "ckpt"))
    q.awaitTermination(180)

    want = _rows(finalize(
        partial_state(orders, ["o_orderpriority"], "o_totalprice"),
        ["o_orderpriority"]))
    assert _rows(maint.current(spark)) == want

    # replayed micro-batch (same batch_id) overwrites its own
    # partition — the served aggregate must not double-count
    maint._process_batch(orders.where(F.col("o_orderkey") % 3 == 1), 1)
    assert _rows(maint.current(spark)) == want

    # compaction folds committed partitions into the base but keeps
    # the NEWEST batch partition separate (the only one Structured
    # Streaming can replay); the aggregate is bit-identical
    maint.compact(spark)
    assert _rows(maint.current(spark)) == want
    parts = {p.split("batch_id=")[1].split("/")[0]
             for p in glob.glob(str(tmp_path / "state" / "batch_id=*"))}
    assert parts == {"-1", "2"}

    # the newest batch replayed AFTER compaction still lands
    # idempotently (overwrites its own partition, not the base)
    maint._process_batch(orders.where(F.col("o_orderkey") % 3 == 2), 2)
    assert _rows(maint.current(spark)) == want

    # a second compaction is a no-op on the served values
    maint.compact(spark)
    assert _rows(maint.current(spark)) == want


def test_compaction_torn_swap_recovers(spark, sf_small, tmp_path):
    """Kill compaction at each crash point and verify the state is
    recoverable: (a) staged tree written but old tree not yet removed
    -> rerun restages; (b) old tree removed but staged tree not yet
    moved in -> current() finishes the swap."""
    import shutil

    orders = load_table(spark, sf_small, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderpriority")
    state = str(tmp_path / "state")
    maint = StreamingAggMaintenance(
        state, ["o_orderpriority"], "o_totalprice")
    for i in range(3):
        maint._process_batch(
            orders.where(F.col("o_orderkey") % 3 == i), i)
    want = _rows(maint.current(spark))

    # crash point (a): staged exists, old tree intact
    staged_src = spark.read.parquet(state).drop("batch_id")
    from eth_options_data_pipeline_spark.operators.incremental_agg import (
        merge_states,
    )
    (merge_states(["o_orderpriority"], staged_src)
     .withColumn("batch_id", F.lit(-1))
     .write.mode("overwrite").partitionBy("batch_id")
     .parquet(state + "_compacted"))
    assert _rows(maint.current(spark)) == want     # old tree still serves
    maint.compact(spark)                           # rerun converges
    assert _rows(maint.current(spark)) == want

    # crash point (b): old tree gone, staged not yet moved
    shutil.move(state, state + "_compacted_tmp")
    shutil.move(state + "_compacted_tmp", state + "_compacted")
    assert _rows(maint.current(spark)) == want     # swap auto-finished

    # crash point (c): live tree renamed aside AND staged present
    # (crash between compact()'s two renames) — recovery must install
    # the staged tree, then clear the _old tombstone
    shutil.copytree(state, state + "_compacted")
    shutil.move(state, state + "_old")
    assert _rows(maint.current(spark)) == want
    assert not (tmp_path / "state_old").exists()
    assert not (tmp_path / "state_compacted").exists()

    # crash point (d): swap complete but the tombstone delete was torn
    # mid-rmtree — a PARTIAL _old tree beside a complete live tree must
    # be discarded, never served or merged
    shutil.copytree(state, state + "_old")
    for f in list((tmp_path / "state_old").rglob("*.parquet"))[:1]:
        f.unlink()                                  # simulate partial delete
    assert _rows(maint.current(spark)) == want
    assert not (tmp_path / "state_old").exists()

    # crash point (e): defensive — only the _old tree survives
    # (staged lost before the swap; unreachable by construction but
    # recovery restores the complete pre-compaction copy)
    shutil.move(state, state + "_old")
    assert _rows(maint.current(spark)) == want


def test_restarted_stream_lands_batch_into_torn_swap(spark, sf_small, tmp_path):
    """ADVICE r06: after a crash between compact()'s two renames, a
    restarted stream lands its batch BEFORE anything calls current().
    _process_batch must finish the torn swap first — otherwise the
    parquet write recreates state_dir holding only the new batch, and
    recovery then rmtrees the _old/_compacted sibling (the last
    complete copy), silently losing all history."""
    import shutil

    orders = load_table(spark, sf_small, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderpriority")
    state = str(tmp_path / "state")
    maint = StreamingAggMaintenance(state, ["o_orderpriority"], "o_totalprice")
    maint._process_batch(orders.where(F.col("o_orderkey") % 3 == 0), 0)
    maint._process_batch(orders.where(F.col("o_orderkey") % 3 == 1), 1)
    maint.compact(spark)

    # crash between rename(state -> _old) and rename(_compacted -> state)
    shutil.copytree(state, state + "_compacted")
    shutil.move(state, state + "_old")

    # the restarted stream's first act is landing a new batch
    maint._process_batch(orders.where(F.col("o_orderkey") % 3 == 2), 2)

    want = _rows(finalize(
        partial_state(orders, ["o_orderpriority"], "o_totalprice"),
        ["o_orderpriority"]))
    assert _rows(maint.current(spark)) == want
    assert not (tmp_path / "state_old").exists()
    assert not (tmp_path / "state_compacted").exists()
