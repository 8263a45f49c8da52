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


# --- DuckDB-SQL twins ---------------------------------------------------


def sql_dot(a: str, b: str) -> str:
    return f"list_sum(list_transform(range(1, len({a})+1), i -> {a}[i]::DOUBLE * {b}[i]::DOUBLE))"


def sql_l2_norm(a: str) -> str:
    return f"sqrt(list_sum(list_transform({a}, x -> x::DOUBLE * x::DOUBLE)))"


def sql_cosine(a: str, b: str) -> str:
    return f"({sql_dot(a, b)} / ({sql_l2_norm(a)} * {sql_l2_norm(b)}))"
