"""Ingest drift monitor: distribution shift between two table
snapshots.

A recurring ingest (the reference's re-run importer,
``import_cards.py:214-225``, and any crawl refresh) needs an answer to
"did this batch change shape?" before the merge is trusted: count
ratios, null-rate movement, and a Population Stability Index over a
fixed bucketing of a numeric column — the standard drift triad.

Engine-exactness discipline: every per-group metric is computed in ONE
aggregate row as conditional counts (never SUM over per-row floats),
and the PSI folds its fixed bucket list WITHIN the row in a fixed
order — so no cross-row float accumulation exists anywhere and the
DuckDB twin hash-matches bitwise. The one transcendental (ln) is
rounded to 6 dp per term (the repo's ln-portability rule). Laplace
smoothing (+1 per bucket) keeps empty buckets finite and is part of
the documented metric, not a hidden fudge.

Scale shape: one scan per snapshot side → one groupBy on the drift key
(partial-aggregated conditional counts, |groups × buckets| cells) →
a groups-sized join. Nothing wider than the group count ever moves.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket_counts(
    df: DataFrame,
    group_col: str,
    value_col: str,
    bounds: list[float],
    prefix: str,
) -> DataFrame:
    """One aggregate row per group: total, nulls, and a conditional
    count per fixed bucket (bounds define len(bounds)+1 buckets;
    NULLs are counted separately, not bucketed)."""
    v = F.col(value_col)
    aggs = [
        F.count(F.lit(1)).alias(f"{prefix}_n"),
        F.count(F.when(v.isNull(), 1)).alias(f"{prefix}_nulls"),
    ]
    edges = [None, *bounds, None]
    for i in range(len(bounds) + 1):
        lo, hi = edges[i], edges[i + 1]
        cond = v.isNotNull()
        if lo is not None:
            cond = cond & (v >= F.lit(lo))
        if hi is not None:
            cond = cond & (v < F.lit(hi))
        aggs.append(F.count(F.when(cond, 1)).alias(f"{prefix}_b{i}"))
    return df.groupBy(group_col).agg(*aggs)


def drift_report(
    snap_a: DataFrame,
    snap_b: DataFrame,
    group_col: str,
    value_col: str,
    bounds: list[float],
) -> DataFrame:
    """Per-group drift between snapshot A (reference) and B (new):

    - ``n_a``, ``n_b``, ``count_ratio`` = n_b/n_a (NULL when n_a = 0);
    - ``null_rate_a``, ``null_rate_b`` (6 dp);
    - ``psi`` = Σ_buckets (p_b − p_a)·ln(p_b/p_a) over the FIXED
      bucketing of ``value_col``, +1-smoothed, each ln term rounded to
      6 dp, folded left-to-right within the row. The conventional
      alarm levels: <0.1 stable, 0.1–0.25 moderate, >0.25 shifted.

    Groups present in only one snapshot appear with the other side's
    counts at 0 (full outer join) — appearance/disappearance IS drift.
    """
    a = _bucket_counts(snap_a, group_col, value_col, bounds, "a")
    b = _bucket_counts(snap_b, group_col, value_col, bounds, "b")
    return drift_report_from_counts(a, b, group_col, len(bounds) + 1)


def drift_report_from_counts(
    a: DataFrame, b: DataFrame, group_col: str, nb: int
) -> DataFrame:
    """The report's arithmetic over PREBUILT count frames (the
    ``_bucket_counts`` shape, ``a_*``/``b_*`` prefixed) — split out so
    the streaming fold's merged state feeds the identical expressions
    as the batch path (``streaming.ingest.stream_fold_drift_counts``):
    the count frame is the drift monitor's mergeable sketch, counts
    being SUM-foldable across micro-batches by construction."""
    j = a.join(b, on=group_col, how="full")

    def cnt(p: str, i: int) -> Column:
        return F.coalesce(F.col(f"{p}_b{i}"), F.lit(0))

    tot_a = F.coalesce(F.col("a_n"), F.lit(0)) - F.coalesce(
        F.col("a_nulls"), F.lit(0)
    )
    tot_b = F.coalesce(F.col("b_n"), F.lit(0)) - F.coalesce(
        F.col("b_nulls"), F.lit(0)
    )
    # +1 smoothing per bucket: denominators shift by the bucket count,
    # keeping every p strictly positive with no epsilon constant
    den_a = (tot_a + F.lit(nb)).cast("double")
    den_b = (tot_b + F.lit(nb)).cast("double")
    psi: Column = F.lit(0.0)
    for i in range(nb):
        pa = (cnt("a", i) + F.lit(1)).cast("double") / den_a
        pb = (cnt("b", i) + F.lit(1)).cast("double") / den_b
        psi = psi + (pb - pa) * F.round(F.log(pb / pa), 6)
    null_rate = lambda n, nulls: F.round(  # noqa: E731
        F.when(
            F.coalesce(F.col(n), F.lit(0)) > 0,
            F.coalesce(F.col(nulls), F.lit(0)).cast("double")
            / F.col(n),
        ).otherwise(F.lit(0.0)),
        6,
    )
    return j.select(
        group_col,
        F.coalesce(F.col("a_n"), F.lit(0)).alias("n_a"),
        F.coalesce(F.col("b_n"), F.lit(0)).alias("n_b"),
        F.when(
            F.coalesce(F.col("a_n"), F.lit(0)) > 0,
            F.coalesce(F.col("b_n"), F.lit(0)).cast("double")
            / F.col("a_n"),
        ).alias("count_ratio"),
        null_rate("a_n", "a_nulls").alias("null_rate_a"),
        null_rate("b_n", "b_nulls").alias("null_rate_b"),
        F.round(psi, 6).alias("psi"),
    )


def sql_drift_report(
    snap_a_sql: str,
    snap_b_sql: str,
    group_col: str,
    value_col: str,
    bounds: list[float],
) -> str:
    """DuckDB twin of :func:`drift_report` — identical expression tree
    (conditional counts, within-row fixed-order PSI fold)."""
    nb = len(bounds) + 1

    def bucket_cols(prefix: str) -> str:
        edges = [None, *bounds, None]
        cols = [
            f"count(*) AS {prefix}_n",
            f"count(CASE WHEN {value_col} IS NULL THEN 1 END)"
            f" AS {prefix}_nulls",
        ]
        for i in range(nb):
            lo, hi = edges[i], edges[i + 1]
            cond = f"{value_col} IS NOT NULL"
            if lo is not None:
                cond += f" AND {value_col} >= {lo!r}"
            if hi is not None:
                cond += f" AND {value_col} < {hi!r}"
            cols.append(f"count(CASE WHEN {cond} THEN 1 END) AS {prefix}_b{i}")
        return ",\n             ".join(cols)

    terms = []
    for i in range(nb):
        pa = f"((coalesce(a_b{i}, 0) + 1)::DOUBLE / _den_a)"
        pb = f"((coalesce(b_b{i}, 0) + 1)::DOUBLE / _den_b)"
        terms.append(f"({pb} - {pa}) * round(ln({pb} / {pa}), 6)")
    psi = " + ".join(terms)
    nullrate = (
        lambda n, nulls: f"round(CASE WHEN coalesce({n}, 0) > 0 THEN "
        f"coalesce({nulls}, 0)::DOUBLE / {n} ELSE 0.0 END, 6)"
    )
    return f"""
    WITH _a AS (SELECT {group_col},
             {bucket_cols('a')}
             FROM ({snap_a_sql}) GROUP BY {group_col}),
    _b AS (SELECT {group_col},
             {bucket_cols('b')}
             FROM ({snap_b_sql}) GROUP BY {group_col}),
    _j AS (SELECT coalesce(_a.{group_col}, _b.{group_col})
                      AS {group_col}, _a.* EXCLUDE ({group_col}),
                  _b.* EXCLUDE ({group_col}),
                  (coalesce(a_n, 0) - coalesce(a_nulls, 0)
                   + {nb})::DOUBLE AS _den_a,
                  (coalesce(b_n, 0) - coalesce(b_nulls, 0)
                   + {nb})::DOUBLE AS _den_b
           FROM _a FULL JOIN _b USING ({group_col}))
    SELECT {group_col},
           coalesce(a_n, 0) AS n_a,
           coalesce(b_n, 0) AS n_b,
           CASE WHEN coalesce(a_n, 0) > 0
                THEN coalesce(b_n, 0)::DOUBLE / a_n END AS count_ratio,
           {nullrate('a_n', 'a_nulls')} AS null_rate_a,
           {nullrate('b_n', 'b_nulls')} AS null_rate_b,
           round({psi}, 6) AS psi
    FROM _j"""
