"""Table maintenance: small-file compaction.

Repeated merges and streaming appends accumulate small files; scan
throughput at 100 TB is gated by file count (task scheduling + footer
reads), so periodic compaction is part of the ingest lifecycle — the
role Delta's OPTIMIZE plays. This parquet-native version rewrites each
partition's files into ~``target_file_bytes`` outputs via an atomic
directory swap.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import SparkSession

from .sink import _atomic_write

DEFAULT_TARGET_FILE_BYTES = 128 * 1024 * 1024


def table_file_stats(path: str) -> tuple[int, int]:
    """(n_parquet_files, total_bytes) under a table directory."""
    n, total = 0, 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                n += 1
                total += os.path.getsize(os.path.join(root, f))
    return n, total


def compact(
    spark: SparkSession,
    table_path: str,
    partition_by: str | None = None,
    target_file_bytes: int = DEFAULT_TARGET_FILE_BYTES,
) -> tuple[int, int]:
    """Rewrite the table with ≈target-sized files; returns
    (files_before, files_after). Unpartitioned tables coalesce to
    ceil(bytes/target); partitioned tables repartition on the partition
    key (one writer per partition directory)."""
    n_before, total = table_file_stats(table_path)
    df = spark.read.parquet(table_path)
    if partition_by:
        from pyspark.sql import functions as F

        df = df.repartition(F.col(partition_by))
    else:
        df = df.coalesce(max(math.ceil(total / target_file_bytes), 1))
    _atomic_write(spark, df, table_path, partition_by)
    n_after, _ = table_file_stats(table_path)
    return n_before, n_after
