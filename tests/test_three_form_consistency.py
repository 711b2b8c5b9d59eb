"""Three independent implementations of Open/OI_Change — incremental
join (batch), lag replay (backfill), applyInPandasWithState
(streaming) — must agree on randomized multi-batch histories.

This is the consistency triangle for the engine's core derived
quantity: any divergence in last-value-per-key semantics, default
handling, or ordering shows up as a mismatch between forms.
"""

from __future__ import annotations

import datetime as dt
import random

import pandas as pd
import pytest

# r13 suite-budget trim: stateful-stream tests run their queries
# at 2 shuffle partitions (see conftest.stream_parts)
pytestmark = pytest.mark.usefixtures("stream_parts")
from pyspark.sql import functions as F

from eth_options_data_pipeline_spark.operators.snapshot import (
    derive_open_oi_change, replay_open_oi_change,
)
from eth_options_data_pipeline_spark.streaming.stateful import stateful_open_oi_change

AS_OF = dt.datetime(2025, 10, 27, 12, 0)


def _random_batches(seed: int, n_batches: int = 4, n_symbols: int = 12):
    """Batches where symbols randomly appear/disappear across drops."""
    rng = random.Random(seed)
    batches = []
    for b in range(n_batches):
        ts = AS_OF + dt.timedelta(hours=b)
        rows = []
        for i in range(n_symbols):
            if rng.random() < 0.7:
                rows.append((
                    f"SYM{i}", ts,
                    round(rng.uniform(1, 100), 2),
                    rng.randint(0, 1000),
                ))
        batches.append(rows)
    return batches


def test_join_replay_stateful_agree(spark, tmp_path):
    """Both randomized histories (seeds 7 and 42) ride ONE run: every
    form keys strictly by SYMBOL, so prefixing each seed's symbols
    with the seed makes the combined run semantically identical to two
    separate runs — per-seed parametrization paid the 4-batch fold,
    the replay, and a full streaming query TWICE for the same
    coverage (suite budget, VERDICT r08 item 3)."""
    seed = "all"
    per = {s: _random_batches(s) for s in (7, 42)}
    batches = [
        [(f"{s}:{sym}", t, c, oi)
         for s, bs in per.items() for (sym, t, c, oi) in bs[b]]
        for b in range(len(per[7]))
    ]
    schema = "SYMBOL string, Time timestamp, Close double, OI long"

    # form 1: incremental join, folding each batch against history
    hist = None
    join_out = []
    for rows in batches:
        cur = spark.createDataFrame(rows, schema)
        if hist is None:
            derived = cur.withColumn("Open", F.lit(0.0)).withColumn(
                "OI_Change", F.lit(0).cast("long"))
        else:
            derived = derive_open_oi_change(
                cur, hist, key="SYMBOL", order_cols=("Time",)
            )
        join_out.append(derived.select("SYMBOL", "Time", "Close", "OI", "Open", "OI_Change"))
        hist = join_out[-1] if hist is None else hist.unionByName(join_out[-1])
    form_join = join_out[0]
    for d in join_out[1:]:
        form_join = form_join.unionByName(d)

    # form 2: lag replay over the whole log
    log = spark.createDataFrame([r for b in batches for r in b], schema)
    form_replay = replay_open_oi_change(log, order_cols=("Time",))

    # form 3: stateful streaming over per-batch file drops
    drop_dir = tmp_path / f"drops_{seed}"
    for b, rows in enumerate(batches):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(str(drop_dir))
    # NB: file order != batch order is possible; order by file via
    # maxFilesPerTrigger only if file names sort by batch — enforced by
    # writing sequentially (part files carry increasing job ids), but
    # to be safe the stateful form is compared as a FULL-log multiset
    # against replay, which is batch-order-insensitive per (SYMBOL, Time).
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(str(drop_dir))
    )
    q = (
        stateful_open_oi_change(stream)
        .writeStream.format("memory").queryName(f"tri_{seed}")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / f"ck_{seed}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    form_stateful = spark.sql(f"select SYMBOL, Time, Close, OI, Open, OI_Change from tri_{seed}")

    cols = ["SYMBOL", "Time", "Close", "OI", "Open", "OI_Change"]
    a = form_join.select(cols)
    b = form_replay.select(cols)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0, "join != replay"

    c = form_stateful.select(cols)
    # the streaming form may batch several files into one trigger if
    # timestamps collide; compare per-(SYMBOL, Time) values
    assert b.exceptAll(c).count() == 0 and c.exceptAll(b).count() == 0, "replay != stateful"
