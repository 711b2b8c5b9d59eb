"""The driver checks the FIRST 50 names queries() yields; this pins
that every prioritized name actually resolves — a silent drop (e.g. a
face rename without updating _WINDOW_PRIORITY) would promote an
arbitrary registration-order name into the checked window and
permanently cost the dropped face its driver CORRECTNESS row."""

from __future__ import annotations

import os

from eth_options_data_pipeline_spark import queries as q


def test_window_priority_names_all_resolve():
    missing = [n for n in q._WINDOW_PRIORITY if n not in q.REGISTRY]
    assert missing == [], f"stale _WINDOW_PRIORITY entries: {missing}"
    assert len(q._WINDOW_PRIORITY) == 50
    assert len(set(q._WINDOW_PRIORITY)) == 50


def test_queries_yield_priority_order_then_registry_order():
    names = list(q.queries())
    assert names[:50] == q._WINDOW_PRIORITY
    assert set(names) == set(q.REGISTRY)
    assert len(names) == len(q.REGISTRY)


def test_every_query_has_oracle_sql():
    sqls = q.oracle_sql()
    missing = [n for n in q.REGISTRY if n not in sqls]
    assert missing == [], f"faces without oracle SQL: {missing}"


def test_regression_core_always_in_window():
    """The §2 reference-parity core must hold a driver row EVERY
    round (and the default sf0.01 sweep keys off REGRESSION_CORE, so
    a drop here would silently shrink driver-scale coverage too)."""
    assert set(q.REGRESSION_CORE) <= set(q._WINDOW_PRIORITY)
    assert set(q.REGRESSION_CORE) <= set(q.REGISTRY)


def test_window_satisfies_freshness_policy():
    """No face may go more than MAX_STALENESS (=2) rounds without a
    driver CORRECTNESS row.  ``policy_violations`` computes, for every
    registered face, the staleness it will have AFTER the upcoming
    driver round runs the current window (0 if in-window); any face
    that would exceed the limit must be rotated in.  This makes each
    round's rotation computed from the CORRECTNESS_r*.json history,
    not hand-curated (VERDICT r06 items 1 and 7)."""
    from eth_options_data_pipeline_spark.queries import window_policy as wp

    registry = list(q.REGISTRY)
    violations = wp.policy_violations(registry, q._WINDOW_PRIORITY)
    assert violations == [], (
        "faces exceeding max driver-row staleness "
        f"{wp.MAX_STALENESS}: {violations}\n"
        + wp.format_age_table(registry, q._WINDOW_PRIORITY)
    )


def _green_row():
    return {"rows_match": True, "schema_match": True, "hash_match": True,
            "spark_rows": 1, "oracle_rows": 1, "err": None}


def _fake_history(tmp_path, extra_round=None, failed=()):
    """Copy the real CORRECTNESS history into tmp and optionally land
    a synthetic next round: green rows for the CURRENT computed window
    except the names in ``failed`` (hash mismatch)."""
    import glob
    import json
    import shutil

    from eth_options_data_pipeline_spark.queries import window_policy as wp

    for p in glob.glob(os.path.join(wp._REPO_ROOT, "CORRECTNESS_r*.json")):
        shutil.copy(p, tmp_path)
    if extra_round is not None:
        rows = {}
        for name in q._WINDOW_PRIORITY:
            r = _green_row()
            if name in failed:
                r["hash_match"] = False
            rows[name] = r
        with open(tmp_path / f"CORRECTNESS_r{extra_round}.json", "w") as f:
            json.dump(rows, f)
    return str(tmp_path)


def test_computed_window_autorotates_when_next_round_lands(tmp_path):
    """The r08 designed-red-at-HEAD problem, closed: landing
    CORRECTNESS_r{N}.json must rotate the computed window for round
    N+1 with zero code change, keeping the freshness policy green."""
    from eth_options_data_pipeline_spark.queries import window_policy as wp

    root = _fake_history(tmp_path, extra_round=9)
    registry = list(q.REGISTRY)
    nxt = wp.computed_window(registry, q.REGRESSION_CORE, repo_root=root)
    assert wp.policy_violations(registry, nxt, repo_root=root) == []
    # the faces that would hit the staleness limit (left out of the
    # r09 window AND oldest green row) must all be in, and the core
    # never leaves
    last = wp.last_driver_round(root)
    left_out = set(registry) - set(q._WINDOW_PRIORITY)
    oldest = min(last.get(n, 0) for n in left_out)
    must_head = {n for n in left_out if last.get(n, 0) == oldest}
    assert must_head <= set(nxt)
    assert set(q.REGRESSION_CORE) <= set(nxt)


def test_failed_face_reenters_next_window(tmp_path):
    """A face whose driver row FAILED counts as unchecked, so it must
    re-enter the very next computed window to re-earn a green row
    (the r07 dx26 situation, now automatic)."""
    from eth_options_data_pipeline_spark.queries import window_policy as wp

    victim = next(n for n in q._WINDOW_PRIORITY
                  if n not in q.REGRESSION_CORE)
    root = _fake_history(tmp_path, extra_round=9, failed=(victim,))
    nxt = wp.computed_window(list(q.REGISTRY), q.REGRESSION_CORE,
                             repo_root=root)
    assert victim in nxt


def test_every_face_has_some_driver_row_or_is_in_window():
    """Union of all CORRECTNESS rounds + the current window must cover
    the whole registry — a new face must enter the window the round it
    is registered (never-checked faces have age = next_round)."""
    from eth_options_data_pipeline_spark.queries import window_policy as wp

    last = wp.last_driver_round()
    uncovered = [
        n for n in q.REGISTRY
        if last.get(n, 0) == 0 and n not in q._WINDOW_PRIORITY
    ]
    assert uncovered == [], f"faces with no driver row and not in window: {uncovered}"
