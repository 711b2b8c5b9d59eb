"""Windowed funnel + cohort retention vs exact Python replicas, on
hand-built sequences covering the tricky orderings, plus a real-table
smoke over events.parquet."""

from __future__ import annotations

import datetime as dt

from eth_options_data_pipeline_spark.operators.funnel import (
    retention, window_funnel,
)

STEPS = ["view", "cart", "buy"]
WINDOW = 100   # seconds


def ts(sec: int):
    return dt.datetime(2025, 1, 1) + dt.timedelta(seconds=sec)


EVENTS = [
    # user 1: clean 3-step chain inside the window
    (1, ts(0), "view"), (1, ts(10), "cart"), (1, ts(20), "buy"),
    # user 2: full chain but buy lands outside the window of t1
    (2, ts(0), "view"), (2, ts(50), "cart"), (2, ts(150), "buy"),
    # user 3: LATER view restarts the chain -> buy back in window
    (3, ts(0), "view"), (3, ts(90), "view"),
    (3, ts(120), "cart"), (3, ts(170), "buy"),
    # user 4: wrong order (cart before any view counts nothing)
    (4, ts(0), "cart"), (4, ts(10), "buy"), (4, ts(20), "view"),
    # user 5: only unrelated events -> absent from output
    (5, ts(0), "refund"),
    # user 6: duplicate steps, interleaved noise
    (6, ts(0), "view"), (6, ts(1), "refund"), (6, ts(2), "cart"),
    (6, ts(3), "cart"), (6, ts(99), "buy"),
]


def ref_funnel(events, steps, window):
    out = {}
    for u in sorted({e[0] for e in events}):
        hits = sorted(
            [(int(e[1].timestamp()), steps.index(e[2]))
             for e in events if e[0] == u and e[2] in steps])
        if not hits:
            continue
        state = [None] * len(steps)
        for t, s in hits:
            if s == 0:
                state[0] = t if state[0] is None else max(state[0], t)
            elif state[s - 1] is not None and t - state[s - 1] <= window:
                state[s] = (state[s - 1] if state[s] is None
                            else max(state[s], state[s - 1]))
        out[u] = sum(1 for x in state if x is not None)
    return out


def test_funnel_matches_replica(spark):
    df = spark.createDataFrame(EVENTS, "user_id long, ts timestamp, event_type string")
    got = {r["user_id"]: r["depth"]
           for r in window_funnel(df, STEPS, WINDOW).collect()}
    want = ref_funnel(EVENTS, STEPS, WINDOW)
    assert got == want
    # the scenarios actually discriminate
    assert want[1] == 3 and want[2] == 2 and want[3] == 3
    assert want[4] == 1 and 5 not in want and want[6] == 3


def test_funnel_on_real_events(spark, sf_small):
    from eth_options_data_pipeline_spark.sources import load_table
    ev = load_table(spark, sf_small, "events")
    types = [r[0] for r in
             ev.groupBy("event_type").count().orderBy("count", ascending=False)
             .limit(3).collect()]
    out = window_funnel(ev, types, 3600 * 24).collect()
    assert len(out) > 0
    assert all(0 <= r["depth"] <= 3 for r in out)


RET_EVENTS = [
    # cohort 2025-01-01: users 1,2.  u1 returns in p0 and p1; u2 never
    (1, ts(0), "signup"), (1, ts(3600), "visit"),
    (1, ts(86400 * 8), "visit"),
    (2, ts(100), "signup"),
    # cohort 2025-01-03: user 3 returns in p1 only (day 9 offset)
    (3, ts(86400 * 2), "signup"), (3, ts(86400 * 11), "visit"),
    # user 4 visits but never signs up -> no cohort row
    (4, ts(0), "visit"),
]


def ref_retention(events, period_days=7, n_periods=4):
    anchors = {}
    for u, t, e in events:
        if e == "signup":
            d = t.date()
            anchors[u] = min(anchors.get(u, d), d)
    out = {}
    for u, cohort in anchors.items():
        key = cohort
        row = out.setdefault(key, [0] * (n_periods + 1))
        row[0] += 1
        buckets = set()
        for uu, t, e in events:
            if uu == u and e == "visit" and t.date() >= cohort:
                buckets.add((t.date() - cohort).days // period_days)
        for p in range(n_periods):
            if p in buckets:
                row[p + 1] += 1
    return {str(k): v for k, v in out.items()}


def test_retention_matches_replica(spark):
    df = spark.createDataFrame(RET_EVENTS, "user_id long, ts timestamp, event_type string")
    rows = retention(df, "signup", "visit").collect()
    got = {str(r["cohort_date"]): [r["cohort_size"]] + [r[f"retained_p{p}"] for p in range(4)]
           for r in rows}
    assert got == ref_retention(RET_EVENTS)
    assert got["2025-01-01"] == [2, 1, 1, 0, 0]
    assert got["2025-01-03"] == [1, 0, 1, 0, 0]
