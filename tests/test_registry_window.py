"""The driver checks the FIRST 50 names queries() yields; this pins
that every prioritized name actually resolves — a silent drop (e.g. a
face rename without updating _WINDOW_PRIORITY) would promote an
arbitrary registration-order name into the checked window and
permanently cost the dropped face its driver CORRECTNESS row."""

from __future__ import annotations

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
