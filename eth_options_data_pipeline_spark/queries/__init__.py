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


def queries():
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql():
    return {name: spec.sql for name, spec in REGISTRY.items() if spec.sql is not None}
