"""Query registry: name -> (spark callable, oracle SQL)."""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

REGISTRY: dict[str, "QuerySpec"] = {}


@dataclass
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    sql: str | None
    doc: str = ""


def query(name: str, sql: str | None = None):
    """Decorator registering a corpus query with its DuckDB oracle."""
    def deco(fn):
        REGISTRY[name] = QuerySpec(name=name, fn=fn, sql=sql, doc=fn.__doc__ or "")
        return fn
    return deco
