"""Plan-inspection utilities: the engine's scale-contract assertions.

Tests use these to pin the physical properties that make queries viable
at 100 TB — filters reaching the parquet scan, projections pruning the
read schema, dimension joins broadcasting, expressions staying inside
whole-stage codegen. A correctness-green query that loses one of these
properties is a regression even if its rows still match.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame, finalize: bool = False) -> str:
    """Physical plan string. With ``finalize`` the query runs first (noop
    sink) so AQE's final plan — with codegen markers and runtime join
    choices — is what gets inspected, not the pre-execution placeholder.
    """
    plan = df._jdf.queryExecution().executedPlan().toString()
    if finalize and "isFinalPlan=false" in plan:
        # run THIS Dataset's query execution (a noop write would build a
        # fresh one and leave this plan un-finalized)
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
    return plan


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """Filters the parquet source accepted for row-group skipping."""
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", formatted_plan(df)):
        out.extend(s.strip() for s in m.group(1).split(",") if s.strip())
    return out


def read_schema_columns(df: DataFrame) -> set[str]:
    """Union of columns actually read from parquet (column pruning)."""
    cols: set[str] = set()
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", formatted_plan(df)):
        for field in m.group(1).split(","):
            name = field.split(":")[0].strip()
            if name:
                cols.add(name)
    return cols


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in executed_plan(df)


def wholestage_codegen_ids(df: DataFrame) -> set[int]:
    """Codegen stage ids — executedPlan marks codegen'd operators with a
    ``*(n)`` prefix; the formatted explain spells out WholeStageCodegen."""
    plan = executed_plan(df, finalize=True)
    ids = {int(m.group(1)) for m in re.finditer(r"\*\((\d+)\)", plan)}
    ids |= {
        int(m.group(1))
        for m in re.finditer(r"WholeStageCodegen \((\d+)\)", formatted_plan(df))
    }
    return ids
