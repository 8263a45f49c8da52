"""Bucketed tables: pre-shuffled storage for co-located joins (brief:
"repartition() / bucketing for co-located joins").

Writing both sides of a recurring join bucketed by the join key means
the shuffle happens ONCE at write time; every subsequent join reads
bucket-aligned files and skips the exchange entirely — at 100 TB the
recurring lineitem⋈orders style join becomes shuffle-free. Bucketed
writes require the session catalog (``saveAsTable``); the helper keeps
the bucket count a power of two so downstream AQE coalescing stays
aligned.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    n_buckets: int = 16,
    sort_col: str | None = None,
) -> None:
    writer = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort_col:
        writer = writer.sortBy(sort_col)
    writer.saveAsTable(table_name)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: str,
    how: str = "inner",
    force_sort_merge: bool = False,
) -> DataFrame:
    """Join two tables bucketed on the same key with the same bucket
    count: the planner sees compatible output partitionings and elides
    both exchanges (verify with plans.executed_plan — no Exchange on
    either side).

    ``force_sort_merge`` adds a MERGE hint — useful to demonstrate the
    co-location at small data sizes where the planner would otherwise
    broadcast one side (which disables bucketed reads entirely); at real
    fact⋈fact scale the planner picks SMJ on its own.
    """
    left = spark.table(left_table)
    if force_sort_merge:
        left = left.hint("merge")
    return left.join(spark.table(right_table), on=on, how=how)
