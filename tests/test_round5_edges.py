"""Empty/degenerate-input edges for the round-5 part-2 operators:
every operator must return a well-formed empty (or sentinel) result,
never a null-division or an analysis error."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from eth_options_data_pipeline_spark.operators.anomaly import rolling_zscore
from eth_options_data_pipeline_spark.operators.bpe import pair_statistics
from eth_options_data_pipeline_spark.operators.context_windows import (
    context_target_pairs,
)
from eth_options_data_pipeline_spark.operators.gapfill import gap_fill
from eth_options_data_pipeline_spark.operators.incremental_agg import (
    finalize, merge_states, partial_state,
)
from eth_options_data_pipeline_spark.operators.mixing import temperature_mix


def _empty_docs(spark):
    return spark.createDataFrame([], "doc_id long, source string")


def _empty_events(spark):
    return spark.createDataFrame(
        [], "event_id long, ts timestamp, user_id long, value double,"
            " event_type string")


def test_empty_inputs_yield_empty_outputs(spark):
    assert temperature_mix(_empty_docs(spark), "source", "doc_id").count() == 0
    assert context_target_pairs(_empty_events(spark)).count() == 0
    assert rolling_zscore(_empty_events(spark)).count() == 0
    assert gap_fill(_empty_events(spark)).count() == 0
    docs = spark.createDataFrame([(None,), ("",), ("x",)], "text string")
    # null text, empty text, single-char words -> no pairs at all
    assert pair_statistics(docs, "text", k=5).count() == 0
    ev = _empty_events(spark)
    state = partial_state(ev, ["user_id"], "value")
    assert finalize(merge_states(["user_id"], state, state),
                    ["user_id"]).count() == 0


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(
    st.tuples(st.sampled_from(["p1", "p2", "p3"]),
              st.integers(-10**6, 10**6).map(lambda c: c / 100.0)),
    min_size=1, max_size=30))
def test_partial_state_merge_matches_python(spark, rows):
    """Random 2-decimal values (negative included): merged partial
    states equal an exact-cents Python reference for every stat,
    regardless of how the rows are split into batches."""
    df = spark.createDataFrame(
        [(k, v) for k, v in rows], "grp string, value double")
    s = [partial_state(df.where(F.hash("value") % 2 == i), ["grp"], "value")
         for i in range(-1, 2)]  # hash()%2 in {-1,0,1}: 3-way split
    got = {r.grp: (r.cnt, r.total, r.min_value, r.max_value)
           for r in finalize(merge_states(["grp"], *s), ["grp"]).collect()}
    ref = {}
    for k, v in rows:
        c = round(v * 100)
        cnt, sm, mn, mx = ref.get(k, (0, 0, None, None))
        ref[k] = (cnt + 1, sm + c,
                  c if mn is None else min(mn, c),
                  c if mx is None else max(mx, c))
    for k, (cnt, sm, mn, mx) in ref.items():
        gcnt, gtot, gmin, gmax = got[k]
        assert gcnt == cnt
        assert gtot == round(sm / 100.0, 2)
        assert gmin == round(mn / 100.0, 2)
        assert gmax == round(mx / 100.0, 2)
