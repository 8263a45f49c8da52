"""Binned range join — the scale path for range predicates WITHOUT an
equi-key.

Spark executes a pure range join (``p.ts BETWEEN i.start AND i.end``
with no equality conjunct) as a BroadcastNestedLoopJoin: every point is
tested against every interval — O(|points|·|intervals|), the join that
falls over first at 100 TB. (With an equi-key, e.g. the attribution
join's user_id, the hash join handles it — this operator is for the
keyless case: global time windows, IP→geo ranges, value-band lookups.)

The standard fix (the bin-bucketing strategy behind production range-
join optimizers): pick a bin width, assign every point to the single
bin containing its value, explode every interval to the bin RANGE it
covers, equi-join on bin id, then apply the exact range predicate.
Because a point lives in exactly one bin, each qualifying (point,
interval) pair meets in exactly one bin — no dedup step.

Cost model: interval fan-out = len/bin_width + 1 rows per interval, so
set ``bin_width`` near the typical interval length — expansion stays
~2× while the join becomes a hash/sort-merge equi-join whose shuffle
partitions by bin (time-locality ⇒ also the natural partition pruning
key when intervals are written out binned). Wildly longer-than-typical
intervals fan out proportionally; cap them upstream or split the few
giants into their own broadcast pass.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_TS_TYPES = ("timestamp", "timestamp_ntz")


def _numeric(df: DataFrame, col: str) -> Column:
    """Numeric view of a point/bound column for binning: timestamps map
    through unix seconds (truncation is monotone, so a value's bin
    always lies within its interval's exploded bin range — the EXACT
    predicate still compares the original columns)."""
    if dict(df.dtypes)[col] in _TS_TYPES:
        return F.unix_timestamp(F.col(col))
    return F.col(col)


def binned_range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bin_width: int,
    end_inclusive: bool = False,
) -> DataFrame:
    """Inner join of ``points`` to every interval containing
    ``point_col`` (``start ≤ p < end``, or ``≤ end`` when
    ``end_inclusive``) — as a binned equi-join, never a nested loop.

    Column names must be disjoint across the two inputs (the result
    carries both sides). Outer variants compose on top: aggregate the
    inner pairs, then left-join intervals back on their id.
    """
    overlap = set(points.columns) & set(intervals.columns)
    if overlap:
        raise ValueError(
            f"points/intervals share column names {sorted(overlap)}; "
            "rename one side — the joined row carries both"
        )
    if bin_width <= 0:
        raise ValueError(f"bin_width must be positive, got {bin_width}")

    pts = points.withColumn(
        "_bin", F.floor(_numeric(points, point_col) / bin_width).cast("long")
    )
    lo = F.floor(_numeric(intervals, start_col) / bin_width).cast("long")
    hi = F.floor(_numeric(intervals, end_col) / bin_width).cast("long")
    staged = intervals.withColumn("_bin_range", F.sequence(lo, hi))
    ivs = staged.select(
        *[F.col(c) for c in intervals.columns],
        F.explode_outer("_bin_range").alias("_bin"),  # _outer: the
        # InferFiltersFromGenerate guard documented in dedup.py
    ).filter(F.col("_bin").isNotNull())

    upper = (
        F.col(point_col) <= F.col(end_col)
        if end_inclusive
        else F.col(point_col) < F.col(end_col)
    )
    return (
        pts.join(ivs, on="_bin")
        .filter((F.col(point_col) >= F.col(start_col)) & upper)
        .drop("_bin")
    )
