"""Early single-caller tripwire: every registered face's physical plan
must COMPILE (VERDICT r07 item 5).

An operator API change with one in-repo caller (the dx26/zorder break)
previously surfaced as fixture-setup ERRORs in two unrelated
registry-wide plan audits — blinding the scale-killer sweeps and
crashing the bench. This test compiles each face via the shared
session-scoped ``all_plans_raw`` fixture (one ~25s pass total) and
fails with the offending face NAMES and exceptions, before any sweep
runs (the filename sorts ahead of test_corpus_oracle / test_plans).
"""

from __future__ import annotations

from eth_options_data_pipeline_spark.queries import REGISTRY


def test_all_faces_compile(all_plans_raw):
    assert set(all_plans_raw) == set(REGISTRY)
    broken = {name: exc for name, (_, _, exc) in all_plans_raw.items()
              if exc is not None}
    assert not broken, (
        "face plan-compile failures (operator API drift?): "
        + "; ".join(f"{n}: {type(e).__name__}: {e}" for n, e in sorted(broken.items()))
    )
