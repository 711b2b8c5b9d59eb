"""Oracle-checked query corpus.

Every operator claimed in SURVEY.md §2 has a named entry here: a
PySpark callable ``(spark, sf_dir) -> DataFrame`` plus (where
SQL-expressible) an equivalent ANSI-SQL string the driver runs through
DuckDB on the same parquet tables. Column names/aliases match exactly
on both sides; float aggregates are rounded identically so the
order-insensitive value hash is stable across engines.
"""

from eth_options_data_pipeline_spark.queries.registry import REGISTRY, QuerySpec, query  # noqa: F401
# Importing the modules populates REGISTRY.
from eth_options_data_pipeline_spark.queries import corpus  # noqa: F401,E402
from eth_options_data_pipeline_spark.queries import extensions  # noqa: F401,E402
from eth_options_data_pipeline_spark.queries import fuzzy  # noqa: F401,E402
from eth_options_data_pipeline_spark.queries import analytics  # noqa: F401,E402
from eth_options_data_pipeline_spark.queries import analytics2  # noqa: F401,E402
from eth_options_data_pipeline_spark.queries import analytics3  # noqa: F401,E402
from eth_options_data_pipeline_spark.queries import analytics4  # noqa: F401,E402
from eth_options_data_pipeline_spark.queries import functions_corpus  # noqa: F401,E402
from eth_options_data_pipeline_spark.queries import analytics5  # noqa: F401,E402
from eth_options_data_pipeline_spark.queries import analytics6  # noqa: F401,E402
from eth_options_data_pipeline_spark.queries import clusters  # noqa: F401,E402
from eth_options_data_pipeline_spark.queries import analytics7  # noqa: F401,E402
from eth_options_data_pipeline_spark.queries import analytics8  # noqa: F401,E402
from eth_options_data_pipeline_spark.queries import analytics9  # noqa: F401,E402
from eth_options_data_pipeline_spark.queries import analytics10  # noqa: F401,E402
from eth_options_data_pipeline_spark.queries import analytics11  # noqa: F401,E402
from eth_options_data_pipeline_spark.queries import analytics12  # noqa: F401,E402
from eth_options_data_pipeline_spark.queries import analytics13  # noqa: F401,E402
from eth_options_data_pipeline_spark.queries import analytics14  # noqa: F401,E402
from eth_options_data_pipeline_spark.queries import analytics15  # noqa: F401,E402
from eth_options_data_pipeline_spark.queries import analytics16  # noqa: F401,E402
from eth_options_data_pipeline_spark.queries import analytics17  # noqa: F401,E402
from eth_options_data_pipeline_spark.queries import analytics18  # noqa: F401,E402
from eth_options_data_pipeline_spark.queries import analytics19  # noqa: F401,E402
from eth_options_data_pipeline_spark.queries import analytics20  # noqa: F401,E402
from eth_options_data_pipeline_spark.queries import analytics21  # noqa: F401,E402
from eth_options_data_pipeline_spark.queries import analytics22  # noqa: F401,E402
from eth_options_data_pipeline_spark.queries import analytics23  # noqa: F401,E402
from eth_options_data_pipeline_spark.queries import window_policy  # noqa: E402


# ---------------------------------------------------------------------------
# Driver-window ordering.
#
# The driver's correctness harness checks the FIRST 50 queries in the order
# ``queries()`` yields them (observed: CORRECTNESS_r03..r06 each hold exactly
# the first 50 names ``queries()`` yielded that round).  Registration order is
# module-import order, so ``_WINDOW_PRIORITY`` pins an explicit rotation
# instead.
#
# Since round 9 the rotation is COMPUTED, not hand-curated
# (window_policy.computed_window): the 7-query regression core always,
# then every face by (freshness deadline asc, risk class, name) where
# deadline = last green driver round + the face's class staleness
# limit (MAX_STALENESS=2, except plain relational q-faces at 4 —
# VERDICT r09 item 3's capacity demotion; the sf0.01 driver-scale
# sweep re-verifies those between driver rows).  Faces whose LATEST
# driver row failed sort first unconditionally (deadline -1, VERDICT
# r09 item 2), then never-checked new registrations (deadline 0),
# and risk class (streaming > composition > dx kernels > vectors >
# multimodal > extensions > relational) breaks same-deadline ties.
# When the driver lands CORRECTNESS_r{N}.json the window auto-rotates
# for round N+1, so the freshness policy (asserted by
# tests/test_registry_window) holds at every commit — no end-of-round
# rotation commit, no designed-red HEAD (VERDICT r08 items 1-2).
# Everything outside the window stays covered by the sf0.001
# full-registry sweep and the sf0.01 driver-scale sweep in
# tests/test_corpus_oracle.py.
# ---------------------------------------------------------------------------
# §2-critical single-operator faces covering the reference-parity core
# (main.py/deltaweekly.py semantics). ALWAYS in the driver window, and
# ALWAYS in the default sf0.01 driver-scale sweep (tests/
# test_corpus_oracle.py) so they keep driver-scale coverage between
# driver rounds too.
REGRESSION_CORE = [
    "q01_pricing_summary",
    "q06_keep_last",
    "q07_lag_delta",
    "q08_expiry_ladder",
    "q09_friday_ladder",
    "q11_symbol_parse",
    "q21_options_pipeline",
]

_WINDOW_PRIORITY = window_policy.computed_window(
    list(REGISTRY), REGRESSION_CORE)


def _ordered_names():
    prioritized = [n for n in _WINDOW_PRIORITY if n in REGISTRY]
    seen = set(prioritized)
    return prioritized + [n for n in REGISTRY if n not in seen]


def queries():
    return {name: REGISTRY[name].fn for name in _ordered_names()}


def oracle_sql():
    return {
        name: REGISTRY[name].sql
        for name in _ordered_names()
        if REGISTRY[name].sql is not None
    }
