#!/usr/bin/env python
"""Benchmark harness: runs the engine's headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {"q01_...": sec, ...}, "sf": 0.1}

Each query is executed to completion with a noop sink (full compute,
no driver-side result transfer) — the same work profile a cluster job
would have.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from eth_options_data_pipeline_spark.queries import REGISTRY  # noqa: E402
from eth_options_data_pipeline_spark.session import get_spark  # noqa: E402


def sf_from_dir(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="engine-bench")

    # Warm the JVM/codegen/parquet/Arrow paths outside the timed region
    # (sf0.001 reads are ~1k rows; they initialize the readers without
    # meaningfully pre-caching sf0.1 data).
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    from eth_options_data_pipeline_spark.sources import load_tables
    for df in load_tables(spark, "/root/testdata/sf0.001").values():
        df.limit(10).collect()

    timings: dict[str, float] = {}
    for name in sorted(REGISTRY):
        fn = REGISTRY[name].fn
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        df.write.mode("overwrite").format("noop").save()
        timings[name] = round(time.perf_counter() - t0, 4)

    total = round(sum(timings.values()), 4)
    print(json.dumps({
        "metric": "corpus_total_runtime",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf_from_dir(sf_dir),
        "config": {
            "master": spark.sparkContext.master,
            "shuffle_partitions": spark.conf.get("spark.sql.shuffle.partitions"),
            "aqe": spark.conf.get("spark.sql.adaptive.enabled"),
            "n_queries": len(timings),
        },
    }))


if __name__ == "__main__":
    main()
