"""Sequential-recurrence time-series operators: EWMA smoothing and
CUSUM change detection.

These are the recurrences relational algebra cannot express as window
functions (the clamp/feedback makes them non-associative), so they run
as the brief's "custom operator" path: ``applyInPandas`` per key — one
shuffle on the key, then a linear in-order scan per group, the same
execution shape as the cogrouped as-of merge.

Differential-testing note (why these are ORACLED, unlike the other
stateful ops): both implementations execute the IDENTICAL sequence of
IEEE-754 operations in the same order — the pandas loop here and a
DuckDB recursive CTE in the registry twin — so the floating outputs
match bit-for-bit, no decimal scaffolding needed. The (ts, id) ordering
tiebreak pins the sequence itself.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def ewma(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    id_col: str,
    alpha: float = 0.5,
) -> DataFrame:
    """Exponentially-weighted moving average per key:
    ``y_0 = x_0; y_t = α·x_t + (1−α)·y_{t−1}`` over (ts, id) order."""
    out_schema = T.StructType(
        [
            df.schema[key_col],
            df.schema[id_col],
            df.schema[ts_col],
            df.schema[value_col],
            T.StructField("ewma", T.DoubleType()),
        ]
    )

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([ts_col, id_col], kind="mergesort")
        y = None
        out = []
        for x in pdf[value_col]:
            y = x if y is None else alpha * x + (1.0 - alpha) * y
            out.append(y)
        pdf = pdf[[key_col, id_col, ts_col, value_col]].copy()
        pdf["ewma"] = out
        return pdf

    return df.select(key_col, id_col, ts_col, value_col).groupBy(
        key_col
    ).applyInPandas(run, schema=out_schema)


def cusum(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    id_col: str,
    drift: float = 10.0,
    threshold: float = 25.0,
) -> DataFrame:
    """One-sided CUSUM per key: ``S_t = max(0, S_{t−1} + (x_t − k))``
    with alert when ``S_t > h`` — the classic sequential change-point
    detector (upward shifts accumulate faster than the drift allowance
    ``k`` bleeds off). The max-clamp is what makes this inexpressible
    as a prefix sum; S resets to 0 after each alert (restart rule)."""
    out_schema = T.StructType(
        [
            df.schema[key_col],
            df.schema[id_col],
            df.schema[ts_col],
            df.schema[value_col],
            T.StructField("cusum", T.DoubleType()),
            T.StructField("alert", T.BooleanType()),
        ]
    )

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([ts_col, id_col], kind="mergesort")
        s = 0.0
        ss, alerts = [], []
        for x in pdf[value_col]:
            s = s + (x - drift)
            if s < 0.0:
                s = 0.0
            fire = s > threshold
            ss.append(s)
            alerts.append(bool(fire))
            if fire:
                s = 0.0
        pdf = pdf[[key_col, id_col, ts_col, value_col]].copy()
        pdf["cusum"] = ss
        pdf["alert"] = alerts
        return pdf

    return df.select(key_col, id_col, ts_col, value_col).groupBy(
        key_col
    ).applyInPandas(run, schema=out_schema)
