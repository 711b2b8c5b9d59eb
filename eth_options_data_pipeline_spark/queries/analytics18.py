"""Round-10 faces: streaming near-containment screening (sx09).

The dx58 batch kernels run THROUGH a document stream: the corpus
arrives as micro-batches (with deliberate cross-batch re-deliveries),
each batch incrementally maintains the df-capped shingle inverted
index (streaming/containment_stream.py — idempotent batch_id-
partitioned landings, first-arrival dedup), and the served screen
must hash-match the one-shot batch containment statistic. The oracle
is dx58's SQL verbatim: streaming maintenance is invisible in the
result, which is exactly the invariant worth a driver row.

No counterpart in the reference (row-oriented options pipeline,
main.py:43-351); extends the streaming family (SURVEY §2.10).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from eth_options_data_pipeline_spark.queries.analytics16 import _stage_slices
from eth_options_data_pipeline_spark.queries.analytics17 import (
    _CONT_DF_CAP, _CONT_MIN, _CONT_N, _CONT_SQL,
)
from eth_options_data_pipeline_spark.queries.registry import query
from eth_options_data_pipeline_spark.sources import load_table

_SX09_BATCHES = 3
# every doc arrives once at slice doc_id % 3; these ALSO re-arrive in
# the last slice — the screen must not double-index them
_SX09_REDELIVER_MOD = 7


@query("sx09_containment_stream", sql=_CONT_SQL)
def sx09_containment_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming containment screen, served: three document
    micro-batches (slice = doc_id % 3, with the doc_id % 7 == 0 docs
    RE-DELIVERED in the last slice) maintain the shingle index through
    foreachBatch landings (availableNow + checkpoint); the served
    pairs must equal the batch dx58 statistic over the distinct
    corpus. Eager at construction (qx46/sx07/sx08 pattern),
    per-session scratch, stream runs once."""
    from eth_options_data_pipeline_spark.streaming.containment_stream import (
        StreamingContainmentScreen,
    )
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    scratch = os.path.join(
        tempfile.gettempdir(),
        f"contstream_face_{spark.sparkContext.applicationId}",
        os.path.basename(os.path.normpath(sf_dir)))
    arrivals = os.path.join(scratch, "in")
    state = os.path.join(scratch, "index")
    ckpt = os.path.join(scratch, "ckpt")
    done = os.path.join(scratch, "_done")
    screen = StreamingContainmentScreen(
        state, n=_CONT_N, min_containment=_CONT_MIN, df_cap=_CONT_DF_CAP)
    if not os.path.isdir(arrivals):
        def _write(staging: str) -> None:
            for i in range(_SX09_BATCHES):
                batch = docs.where(F.col("doc_id") % _SX09_BATCHES == i)
                if i == _SX09_BATCHES - 1:
                    batch = batch.unionByName(
                        docs.where(F.col("doc_id") % _SX09_REDELIVER_MOD == 0))
                batch.coalesce(1).write.mode("append").parquet(staging)
        _stage_slices(_write, arrivals)
    if not os.path.isdir(done):
        stream = (spark.readStream.schema(docs.schema)
                  .option("maxFilesPerTrigger", 1).parquet(arrivals))
        q = screen.start(stream, ckpt)
        if not q.awaitTermination(300):
            raise TimeoutError("sx09 containment stream did not finish")
        os.makedirs(done, exist_ok=True)
    return screen.screen(spark)
