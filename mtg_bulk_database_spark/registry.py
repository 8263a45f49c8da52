"""Query registry shared by the operator-query modules.

``QUERIES[name](spark, sf_dir) -> DataFrame`` and the optional
``ORACLE_SQL[name]`` DuckDB twin; see ``queries`` (reference-parity
operators) and ``pipeline_queries`` (large-scale training-data
operators) for the registered entries.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE_SQL: dict[str, str] = {}


def query(name: str, sql: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if sql is not None:
            ORACLE_SQL[name] = sql
        return fn

    return deco


def load_registry():
    """Import all query modules for their registration side effects."""
    from . import (  # noqa: F401
        pipeline_queries,
        pipeline_queries2,
        pipeline_queries3,
        pipeline_queries4,
        pipeline_queries5,
        pipeline_queries6,
        pipeline_queries7,
        pipeline_queries8,
        pipeline_queries9,
        pipeline_queries10,
        pipeline_queries11,
        pipeline_queries12,
        pipeline_queries13,
        pipeline_queries14,
        pipeline_queries15,
        pipeline_queries16,
        queries,
        queries_extra,
    )

    return QUERIES, ORACLE_SQL
