"""eth_options_data_pipeline_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the capabilities of the reference repo
``113rajababu113-wq/eth-options-data-pipeline`` (a pandas-based hourly
ETH-options snapshot ETL; see SURVEY.md) as an idiomatic Spark
DataFrame engine over Parquet, generalized with the operators a
large-scale training-data pipeline needs (dedup, similarity search,
text analysis, embedding/multimodal columns).

Design: every operator is a pure ``(DataFrame, params) -> DataFrame``
transformation; Catalyst is the optimizer. No RDDs, no custom rules —
the physical-strategy wins (broadcast joins, predicate pushdown,
whole-stage codegen, AQE) come from declaring the plan declaratively.
"""

__version__ = "0.1.0"

from eth_options_data_pipeline_spark.session import get_spark  # noqa: F401
