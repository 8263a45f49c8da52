"""Pins for ``functions.vectors.lit_cosine_scores`` — the r11 JVM-parsed
SQL-string form of literal-codebook cosine scoring.

The optimization replaces per-component ``F.lit`` Column-DSL
construction (~1.2 s of py4j round trips per query at the 8x64
portable codebook) with one ``F.expr`` parse; it is only sound if the
parsed trees evaluate to the BIT-IDENTICAL doubles the DSL form
produced, on every variant the call sites use (plain divide vs
``try_divide``, rounded vs raw) and for every literal repr form
(including scientific notation, which runtime centroids from the
durable IVF artifact can produce).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mtg_bulk_database_spark.functions.vectors import (
    cosine_similarity,
    lit_cosine_scores,
)


def _dsl_scores(col, centroids, *, round_dp=None, total=False):
    """The pre-r11 Column-DSL construction, kept verbatim as the
    reference the SQL-string form must match."""
    from mtg_bulk_database_spark.functions.vectors import dot, l2_norm

    legs = []
    for c in centroids:
        lit = F.array(*[F.lit(v) for v in c])
        if total:
            cos = F.try_divide(
                dot(F.col(col), lit), l2_norm(F.col(col)) * l2_norm(lit)
            )
        else:
            cos = cosine_similarity(F.col(col), lit)
        legs.append(F.round(cos, round_dp) if round_dp is not None else cos)
    return F.array(*legs)


# centroids exercising plain decimals, negatives, zero, and values
# whose repr() is scientific notation (1e-05, 2.5e-17)
_CENTS = [
    [0.125, -3.5, 0.0, 1e-05],
    [2.5e-17, 7.25, -1e-07, 42.0],
    [1.0, 1.0, 1.0, 1.0],
]

_VECS = [
    ([0.5, -1.25, 3.0, 0.75],),
    ([1e-06, 2.0, -0.5, 1e300],),
    ([-7.0, 0.0, 0.125, 9.5],),
]


@pytest.mark.parametrize(
    "round_dp,total",
    [(None, False), (None, True), (6, False), (6, True), (4, True)],
)
def test_sql_string_scores_bit_identical_to_dsl(spark, round_dp, total):
    df = spark.createDataFrame(_VECS, "embedding array<double>")
    n_diff = (
        df.select(
            _dsl_scores(
                "embedding", _CENTS, round_dp=round_dp, total=total
            ).alias("a"),
            lit_cosine_scores(
                "embedding", _CENTS, round_dp=round_dp, total=total
            ).alias("b"),
        )
        .where(F.expr("exists(zip_with(a, b, (x, y) -> NOT (x <=> y)), p -> p)"))
        .count()
    )
    assert n_diff == 0


def test_sql_string_scores_match_q217_codebook(spark):
    """The real deployed codebook parses and matches the DSL form on a
    synthetic scan (the actual corpora are covered by oracle parity)."""
    from mtg_bulk_database_spark.pipeline_queries10 import _Q217_CENTROIDS

    vecs = [
        ([float((i * 37 + j * 11) % 19) - 9.0 for j in range(64)],)
        for i in range(50)
    ]
    df = spark.createDataFrame(vecs, "embedding array<double>")
    n_diff = (
        df.select(
            _dsl_scores("embedding", _Q217_CENTROIDS, round_dp=6).alias("a"),
            lit_cosine_scores(
                "embedding", _Q217_CENTROIDS, round_dp=6
            ).alias("b"),
        )
        .where(F.expr("exists(zip_with(a, b, (x, y) -> NOT (x <=> y)), p -> p)"))
        .count()
    )
    assert n_diff == 0


def test_try_divide_form_is_total_on_zero_norm(spark):
    """total=True must yield NULL (not an ANSI error) on zero-norm
    rows — the _cos_total contract the join-key pushdown relies on."""
    df = spark.createDataFrame(
        [([0.0, 0.0, 0.0, 0.0],)], "embedding array<double>"
    )
    row = df.select(
        lit_cosine_scores("embedding", _CENTS, total=True).alias("sc")
    ).collect()[0]
    assert all(v is None for v in row.sc)
