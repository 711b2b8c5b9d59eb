"""Property tests for the expiry ladders — the only nontrivial business
logic in the reference (SURVEY §7.2 step 2: 'property-test them hard').

A pure-Python model of each ladder (transcribed from the reference's
semantics, not its code) is checked against the DataFrame implementation
over hypothesis-generated date sets.
"""

from __future__ import annotations

import datetime as dt

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql.types import DateType, StructField, StructType

from eth_options_data_pipeline_spark.operators.expiry import friday_expiries, nearest_expiries

AS_OF = dt.date(2025, 10, 27)

DATES = st.lists(
    st.dates(min_value=AS_OF - dt.timedelta(days=60), max_value=AS_OF + dt.timedelta(days=90)),
    min_size=0, max_size=25,
)


def model_nearest3(dates: list[dt.date], as_of: dt.date, k: int = 3) -> list[dt.date]:
    """main.py:43-80: distinct, >= today, ascending, first k; fallback
    (:64-65): overall max when none are current/future."""
    uniq = sorted(set(dates))
    future = [d for d in uniq if d >= as_of]
    if future:
        return future[:k]
    return [uniq[-1]] if uniq else []


def model_friday_w1w2(dates: list[dt.date], as_of: dt.date) -> list[dt.date]:
    """deltaweekly.py:43-111: active = distinct >= today; W1 = first
    Friday with >=2 active expiries strictly before it, else first
    Friday (:84-86); W2 = first Friday > W1 (:89-94)."""
    active = sorted({d for d in dates if d >= as_of})
    fridays = [d for d in active if d.weekday() == 4]
    if not fridays:
        return []
    qualified = [f for f in fridays if len([d for d in active if d < f]) >= 2]
    w1 = qualified[0] if qualified else fridays[0]
    later = [f for f in fridays if f > w1]
    return [w1] + later[:1]


def _df(spark, dates):
    return spark.createDataFrame(
        [(d,) for d in dates], StructType([StructField("expiry", DateType())])
    )


def _hypothesis_date_sets(n):
    cases = []

    @settings(max_examples=n, deadline=None,
              suppress_health_check=list(HealthCheck),
                        derandomize=True)
    @given(dates=DATES)
    def collect(dates):
        cases.append(dates)

    collect()
    return cases


def _batched(spark, op, cases):
    """Run ``op`` on every example's own tiny DataFrame, but collect
    the tagged union in ONE Spark job — 25 driver round trips were
    ~2/3 of this module's wall time for identical operator coverage
    (suite budget, VERDICT r08 item 3)."""
    from functools import reduce

    from pyspark.sql import functions as F

    dfs = [op(_df(spark, d)).withColumn("g", F.lit(g))
           for g, d in enumerate(cases)]
    rows = reduce(lambda a, b: a.unionByName(b), dfs).collect()
    per: dict[int, list] = {g: [] for g in range(len(cases))}
    for r in rows:
        per[r["g"]].append(r)
    return per


# 25 -> 18 examples (r14 suite trim): the batched union's plan-compile
# cost grows with branch count and was the module's dominant wall time
# (10.5s + 6.0s on a contended box); derandomized hypothesis keeps the
# same first-18 coverage every run, and the hand-written edge tests
# below pin the fallback branches the shrinker targets anyway.
_N_EXAMPLES = 18


def test_nearest3_matches_model(spark):
    cases = _hypothesis_date_sets(_N_EXAMPLES)
    per = _batched(spark, lambda df: nearest_expiries(df, AS_OF), cases)
    for g, dates in enumerate(cases):
        got = sorted(r["expiry"] for r in per[g])
        assert got == model_nearest3(dates, AS_OF), f"example {g}: {dates}"


def test_friday_ladder_matches_model(spark):
    cases = _hypothesis_date_sets(_N_EXAMPLES)
    per = _batched(spark, lambda df: friday_expiries(df, AS_OF), cases)
    for g, dates in enumerate(cases):
        got = [r["expiry"]
               for r in sorted(per[g], key=lambda r: r["ladder_pos"])]
        assert got == model_friday_w1w2(dates, AS_OF), f"example {g}: {dates}"


def test_nearest3_fallback_max_when_all_past(spark):
    dates = [AS_OF - dt.timedelta(days=n) for n in (3, 10, 30)]
    got = [r["expiry"] for r in nearest_expiries(_df(spark, dates), AS_OF).collect()]
    assert got == [AS_OF - dt.timedelta(days=3)]


def test_friday_w1_fallback_first_friday(spark):
    """No Friday has >=2 predecessors -> W1 = first Friday
    (deltaweekly.py:84-86)."""
    fri = AS_OF + dt.timedelta(days=(4 - AS_OF.weekday()) % 7)
    dates = [fri, fri + dt.timedelta(days=7)]
    out = friday_expiries(_df(spark, dates), AS_OF).orderBy("ladder_pos").collect()
    assert [r["expiry"] for r in out] == [fri, fri + dt.timedelta(days=7)]
