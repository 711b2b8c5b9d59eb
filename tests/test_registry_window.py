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
