"""CLI runner: one action per run (rows_appended rides the write via an
Observation — round-1 advice: no post-write recompute), telemetry
fields, and the empty-history cold start."""

from __future__ import annotations

import json

from eth_options_data_pipeline_spark.cli import main


def test_cli_cold_and_warm_run(spark, tmp_path, capsys):
    out_dir = str(tmp_path / "chain")
    rc = main(["--config", "hourly", "--source", "synthetic",
               "--output", out_dir, "--as-of", "2025-10-27T12:30:00"])
    assert rc == 0
    rep1 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    on_disk = spark.read.parquet(out_dir).count()
    assert rep1["rows_appended"] == on_disk > 0
    assert rep1["successful_parses"] > 0 and rep1["rows_fetched"] > 0

    # warm run: history present, appends again
    rc = main(["--config", "hourly", "--source", "synthetic",
               "--output", out_dir, "--as-of", "2025-10-27T13:30:00"])
    assert rc == 0
    rep2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert spark.read.parquet(out_dir).count() == rep1["rows_appended"] + rep2["rows_appended"]
