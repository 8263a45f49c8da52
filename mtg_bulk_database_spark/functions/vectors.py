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


# --- literal-codebook scoring (Spark-SQL string construction) -----------
#
# Scoring a scan against a FROZEN centroid table via the Column DSL
# builds n_centroids x dim `F.lit` nodes through py4j — measured
# ~1.1-1.3 s of pure driver-side construction per query at the 8x64
# portable codebook, paid on EVERY bench pass (the q223 lesson).
# Rendering the same trees as ONE SQL string parsed JVM-side costs
# ~1 ms and yields the identical Catalyst nodes (same HOF folds, same
# double literals via repr round-trip, same operator order), so values
# and oracle hashes are unchanged — verified null-safe-equal on the
# real corpus for both the plain-divide and try_divide forms.


def _spark_sql_arr(c) -> str:
    # repr() is the shortest round-trip decimal form; both Python and
    # the JVM parse it to the identical IEEE-754 double.  The D suffix
    # pins DoubleType exactly like F.lit(float).
    return "array(" + ", ".join(f"{float(v)!r}D" for v in c) + ")"


def _spark_sql_dot(a: str, b: str) -> str:
    return (
        f"aggregate(zip_with(CAST({a} AS ARRAY<DOUBLE>), "
        f"CAST({b} AS ARRAY<DOUBLE>), (x, y) -> x * y), "
        f"CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"
    )


def _spark_sql_l2(a: str) -> str:
    return (
        f"sqrt(aggregate(CAST({a} AS ARRAY<DOUBLE>), "
        f"CAST(0.0 AS DOUBLE), (acc, x) -> acc + x * x))"
    )


def lit_cosine_scores(
    col: str,
    centroids,
    *,
    round_dp: int | None = None,
    total: bool = False,
) -> Column:
    """``array(cosine(col, c) for c in centroids)`` with the centroid
    table folded in as literals — value-identical to the Column-DSL
    ``F.array(*[cosine_similarity(col, F.array(*map(F.lit, c))) ...])``
    but built as one JVM-parsed SQL string (see module note above).

    ``total=True`` uses ``try_divide`` (the ``_cos_total`` NULL-on-
    zero-norm form); ``round_dp`` applies the cross-engine rounding."""
    legs = []
    for c in centroids:
        arr = _spark_sql_arr(c)
        dotv = _spark_sql_dot(col, arr)
        den = f"{_spark_sql_l2(col)} * {_spark_sql_l2(arr)}"
        cos = (
            f"try_divide({dotv}, {den})"
            if total
            else f"({dotv} / ({den}))"
        )
        legs.append(
            f"round({cos}, {round_dp})" if round_dp is not None else cos
        )
    return F.expr("array(" + ",\n ".join(legs) + ")")


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
