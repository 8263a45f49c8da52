"""Vector math over ``array<float|double>`` columns — pure column
expressions (higher-order functions), no UDFs, so similarity predicates
run inside codegen and scale linearly with no Python boundary.

Folds run left-to-right over the array in both Spark (``aggregate``) and
DuckDB (element-wise then ``list_sum``), keeping float results
reproducible across engines after a fixed rounding.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _dbl(c: Column) -> Column:
    return c.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(_dbl(a), _dbl(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(_dbl(a), F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def indexable_vector(a: Column) -> Column:
    """True iff the vector participates in similarity math: non-NULL
    AND non-zero norm. Zero-norm vectors have no direction, so cosine
    against them is 0/0 — Spark's non-ANSI divide yields NULL while
    DuckDB's IEEE mode yields NaN (which sorts ABOVE every real score
    in ORDER BY DESC), so letting them through silently corrupts top-k
    fronts differently per engine. Every embedding consumer filters on
    this predicate; its SQL twin is :func:`sql_indexable`."""
    return a.isNotNull() & (l2_norm(a) > 0)


# --- DuckDB-SQL twins ---------------------------------------------------


def sql_dot(a: str, b: str) -> str:
    return f"list_sum(list_transform(range(1, len({a})+1), i -> {a}[i]::DOUBLE * {b}[i]::DOUBLE))"


def sql_l2_norm(a: str) -> str:
    return f"sqrt(list_sum(list_transform({a}, x -> x::DOUBLE * x::DOUBLE)))"


def sql_cosine(a: str, b: str) -> str:
    return f"({sql_dot(a, b)} / ({sql_l2_norm(a)} * {sql_l2_norm(b)}))"


def sql_indexable(a: str) -> str:
    """DuckDB twin of :func:`indexable_vector` (NULL norm compares
    false, so NULL embeddings drop out through the same predicate)."""
    return f"({sql_l2_norm(a)} > 0)"
