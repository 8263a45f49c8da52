"""Declarative data-quality constraint checking (dbt-test / Deequ
shape): a rule set is evaluated in ONE pass over the table, plus one
anti-join per referential rule, and the report is a tiny
(rule, n_violations) frame.

The reference enforces its invariants in Postgres DDL — PRIMARY KEY,
NOT NULL, CHECK, the layout ENUM (reference ``init.sql:8-33``) — and
the importer quarantines violators before COPY. On a lakehouse there is
no DDL engine to do this, so constraint checking becomes an explicit
operator you run after ingest / before publish; this module is that
operator.

Scale: row rules compile to a single aggregate over one scan
(map-side partials, a one-row result per rule — no shuffle of data,
only of partial counts). FK rules are hash anti-joins keyed on the FK;
at 100 TB broadcast the dimension or bucket both sides, exactly like
any other join in the engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def row_rule_report(df: DataFrame, rules: dict[str, Column]) -> DataFrame:
    """Evaluate per-row violation predicates in one aggregate pass.

    ``rules`` maps rule name -> a Column that is TRUE for a VIOLATING
    row. Returns (rule, n_violations), one row per rule, stable under
    any partitioning (integer sums only).
    """
    wide = df.agg(
        *[
            F.sum(F.when(pred, 1).otherwise(0)).alias(name)
            for name, pred in rules.items()
        ]
    )
    stack_args = ", ".join(f"'{n}', `{n}`" for n in rules)
    return wide.select(
        F.expr(
            f"stack({len(rules)}, {stack_args}) AS (rule, n_violations)"
        )
    )


def unique_key_rule(df: DataFrame, key_cols: list[str], name: str) -> DataFrame:
    """Duplicate-key violations: rows beyond the first per key, among
    rows whose key is fully non-NULL (NULL keys are a NOT-NULL rule's
    business, and engines disagree on whether a NULL-bearing tuple is a
    distinct value). count(fully-keyed) - count(distinct key) in one
    aggregate — no self-join."""
    nonnull = F.lit(True)
    for c in key_cols:
        nonnull = nonnull & F.col(c).isNotNull()
    return df.agg(
        (
            F.sum(F.when(nonnull, 1).otherwise(0))
            - F.countDistinct(*key_cols)
        )
        .cast("long")
        .alias("n_violations")
    ).select(F.lit(name).alias("rule"), "n_violations")


def fk_rule(
    child: DataFrame,
    parent: DataFrame,
    on: list[tuple[str, str]],
    name: str,
    broadcast_parent: bool = False,
) -> DataFrame:
    """Referential-integrity violations: child rows with no parent.
    Hash (optionally broadcast) LEFT ANTI join, then count."""
    keys = parent.select(*[F.col(p).alias(c) for c, p in on]).distinct()
    if broadcast_parent:
        keys = F.broadcast(keys)
    orphans = child.join(keys, [c for c, _ in on], "left_anti")
    return orphans.agg(F.count("*").cast("long").alias("n_violations")).select(
        F.lit(name).alias("rule"), "n_violations"
    )


def constraint_report(*reports: DataFrame) -> DataFrame:
    """Union the per-rule frames into the final (rule, n_violations)
    report. Each input is already a 1-row-per-rule aggregate, so the
    union is metadata-cheap."""
    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out
