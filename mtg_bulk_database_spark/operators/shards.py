"""Epoch shard materialization: the physical sink for the mix
manifest (q248 → q263 chain).

A 100 TB training run does not "shuffle" an epoch by sorting the
corpus — it assigns every scheduled instance a deterministic 60-bit
hash key, hash-partitions the instance stream into shards, and writes
each shard sorted by the key.  The trainer then streams shard files in
order and gets a reproducible global shuffle with no global sort ever
executed.  This module holds that pipeline once, shared by the q263
report gate and the :func:`write_epoch_shards` sink:

- :func:`manifest_instances` — repeat-expand a manifest and key every
  instance (narrow ``explode(sequence(...))``, bounded by the epoch
  cap; no shuffle),
- :func:`shard_report` — the per-shard balance/quality aggregate
  (q263's body),
- :func:`write_epoch_shards` — ONE hash-partition exchange + per-shard
  sort + ``partitionBy(shard)`` parquet write: the physical plan the
  q263 docstring describes, executable.

Determinism: the key is ``md5_60(doc_id ':' rep_idx)``
(`operators/dedup.md5_60` — the engine-portable 60-bit md5 prefix), so
shard assignment, within-shard order, and therefore the bytes the
trainer reads are pure functions of the manifest — identical across
runs, cluster sizes, and engines.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, functions as F


def manifest_instances(man: DataFrame, n_shards: int) -> DataFrame:
    """Repeat-expand a manifest ``(doc_id, n_tok, n_repeats)`` into
    the keyed instance stream ``(doc_id, nt, rep_idx, h60, shard)``.

    The expansion is a narrow ``explode`` of a bounded sequence (the
    epoch cap bounds ``n_repeats``) — no shuffle; the hash key and the
    shard id are pure per-row expressions."""
    from .dedup import md5_60

    inst = man.filter(F.col("n_repeats") > 0).select(
        "doc_id",
        F.col("n_tok").alias("nt"),
        F.explode(
            F.sequence(
                F.lit(0).cast("long"),
                (F.col("n_repeats") - 1).cast("long"),
            )
        ).alias("rep_idx"),
    )
    return inst.select(
        "doc_id",
        "nt",
        "rep_idx",
        md5_60(
            F.concat_ws(
                ":",
                F.col("doc_id").cast("string"),
                F.col("rep_idx").cast("string"),
            )
        ).alias("h60"),
    ).withColumn("shard", F.pmod(F.col("h60"), F.lit(n_shards)))


def shard_report(inst: DataFrame) -> DataFrame:
    """Per-shard balance/quality report over a keyed instance stream:
    ``(shard, n_inst, n_docs, tok_sum, n_adjacent_same_doc,
    tok_share_micro)`` — q263's body.  The within-shard lag window
    shares the exact partitioning-and-order the sharded write sorts
    by, and the aggregate partial-combines map-side to |shards| rows.
    """
    from pyspark.sql import Window

    wsh = Window.partitionBy("shard").orderBy("h60", "doc_id", "rep_idx")
    lagged = inst.select(
        "shard",
        "doc_id",
        "nt",
        F.when(F.lag("doc_id").over(wsh) == F.col("doc_id"), 1)
        .otherwise(0)
        .alias("adj"),
    )
    per = lagged.groupBy("shard").agg(
        F.count("*").cast("long").alias("n_inst"),
        F.countDistinct("doc_id").cast("long").alias("n_docs"),
        F.sum("nt").cast("long").alias("tok_sum"),
        F.sum("adj").cast("long").alias("n_adjacent_same_doc"),
    )
    tot = per.agg(F.sum("tok_sum").cast("long").alias("total"))
    return per.join(F.broadcast(tot)).select(
        "shard",
        "n_inst",
        "n_docs",
        "tok_sum",
        "n_adjacent_same_doc",
        F.expr("(tok_sum * 1000000) DIV total").alias("tok_share_micro"),
    )


def write_epoch_shards(
    inst: DataFrame, out_dir: str, n_shards: int
) -> None:
    """Materialize the epoch: hash-partition the instance stream on
    ``shard``, sort each partition by the shuffle key, and write one
    parquet directory per shard (``shard=<k>/``).

    The plan is exactly ONE exchange (hash on ``shard``) followed by a
    per-partition sort — shards are balanced by the uniform 60-bit
    key, so no sort partition is skewed; file row order within a shard
    is the deterministic ``(h60, doc_id, rep_idx)`` total order the
    trainer consumes."""
    (
        inst.repartition(n_shards, "shard")
        .sortWithinPartitions("shard", "h60", "doc_id", "rep_idx")
        .write.partitionBy("shard")
        .mode("overwrite")
        .parquet(out_dir)
    )


def read_epoch_shard(spark, out_dir: str, shard: int) -> DataFrame:
    """One shard — partition pruning turns the path filter into a
    single-directory scan.  Row order: each FILE holds its rows in the
    (h60, doc_id, rep_idx) trainer order (the write sorts per
    partition); a trainer consuming the stream sequentially should
    read the shard's files in name order (``shard_files``), since a
    DataFrame read may split or coalesce files and only guarantees
    within-file order per split.  Callers needing a total order in
    one frame sort by the carried key columns."""
    return spark.read.parquet(out_dir).filter(F.col("shard") == shard)


def shard_files(out_dir: str, shard: int) -> list[str]:
    d = os.path.join(out_dir, f"shard={shard}")
    return sorted(
        os.path.join(d, f)
        for f in os.listdir(d)
        if f.endswith(".parquet")
    )
