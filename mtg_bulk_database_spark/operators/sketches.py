"""Mergeable-sketch operators: the bounded-memory frequency path.

Exact per-token counts (q100) are a fine Spark aggregation at any
scale — partial aggregation bounds the shuffle by the number of
DISTINCT keys. The sketch path matters when even the distinct-key set
is too large to keep (open-vocabulary n-grams, URL tails) or when
counts must stream with O(1) state: a count-min sketch (Cormode &
Muthukrishnan 2005) is a d×w counter matrix whose cells are pure
SUM aggregates — trivially distributed, mergeable across batches by
element-wise addition, and stored as a (d·w)-row DataFrame rather than
an opaque binary, so estimation is a JOIN any engine can run.

Guarantees: estimate ≥ true count always (counters only over-count on
collision); estimate ≤ true + εN with probability 1−δ for
w = ⌈e/ε⌉, d = ⌈ln 1/δ⌉.

Row hashing uses ``xxhash64(value, row_index)`` — 64-bit, seeded per
sketch row, JVM-side codegen; ``pmod`` keeps bucket indexes
non-negative. Deterministic across partitioning and cluster size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CMS_DEPTH = 5
CMS_WIDTH = 1024


def cms_build(
    df: DataFrame,
    col: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Build the sketch: one row per (sketch_row, bucket) with the
    collision-summed count. One explode (×depth) + one groupBy — the
    shuffle carries at most d·w distinct keys no matter the input
    size. Output: ``row_idx, bucket, cnt``."""
    rows = df.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(depth - 1)),
                lambda i: F.struct(
                    i.cast("int").alias("row_idx"),
                    F.pmod(F.xxhash64(F.col(col), i), F.lit(width))
                    .cast("int")
                    .alias("bucket"),
                ),
            )
        ).alias("_cell")
    )
    return (
        rows.select("_cell.row_idx", "_cell.bucket")
        .groupBy("row_idx", "bucket")
        .agg(F.count("*").alias("cnt"))
    )


def cms_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Element-wise addition — the mergeability that makes the sketch
    an incremental ingest artifact (per-batch sketches fold into the
    corpus sketch without touching history)."""
    return (
        a.unionByName(b)
        .groupBy("row_idx", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    col: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Point-estimate counts for ``keys[col]``: re-hash each key into
    its d cells, join the sketch (d·w rows — broadcast), take the MIN
    cell. Missing cells count 0 (no item hashed there at all).
    Output: ``keys.* , est_count``."""
    probes = keys.select(
        "*",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(depth - 1)),
                lambda i: F.pmod(F.xxhash64(F.col(col), i), F.lit(width)).cast(
                    "int"
                ),
            )
        ).alias("row_idx", "bucket"),
    )
    joined = probes.join(
        F.broadcast(sketch), on=["row_idx", "bucket"], how="left"
    ).withColumn("cnt", F.coalesce("cnt", F.lit(0)))
    key_cols = [c for c in keys.columns]
    return joined.groupBy(*key_cols).agg(F.min("cnt").alias("est_count"))
