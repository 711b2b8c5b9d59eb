"""Dump ``explain("formatted")`` for registered faces to files.

Usage: python tools/explain_face.py --out plans/r16 --suffix before \
           [--sf DIR] face [face ...]

Writes ``<out>/<face>_<suffix>.txt`` — the judge checks plan claims in
OPTIMIZATION_r16.md against these files.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def formatted_plan(df) -> str:
    jdf = df._jdf
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return jdf.queryExecution().explainString(mode)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("faces", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="plans/r16")
    ap.add_argument("--suffix", default="before")
    args = ap.parse_args()

    from eth_options_data_pipeline_spark.queries import REGISTRY
    from eth_options_data_pipeline_spark.session import get_spark

    spark = get_spark(app_name="explain-face")
    os.makedirs(args.out, exist_ok=True)
    for name in args.faces:
        df = REGISTRY[name].fn(spark, args.sf)
        path = os.path.join(args.out, f"{name}_{args.suffix}.txt")
        with open(path, "w") as f:
            f.write(formatted_plan(df))
        print(path)


if __name__ == "__main__":
    main()
