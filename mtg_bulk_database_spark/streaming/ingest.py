"""Streaming ingest: the incremental-file variant of the cards pipeline
(SURVEY §1.6 — the reference's one-object-at-a-time ingest loop,
``import_cards.py:351-366``, maps naturally onto a Structured Streaming
file source with an ``availableNow`` trigger).

Dropping new bulk JSONL files into a landing directory and re-running
gives exactly-once incremental ingest with checkpoint-tracked progress —
the distributed answer to the reference's mtime freshness gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..ingest.transform import prepare_cards
from ..schemas import CARDS_RAW_SCHEMA


def stream_ingest_cards(
    spark: SparkSession,
    landing_dir: str,
    table_path: str,
    checkpoint_dir: str,
    timeout_s: int = 120,
) -> DataFrame:
    """JSONL landing dir → transform layer → append-mode parquet table.

    Note: the streaming sink is append-only; upsert semantics at the
    table level come from compacting with ``ingest.sink.merge_upsert``
    (or, in production, a ``foreachBatch`` Delta MERGE — same transform
    layer, exactly-once via the checkpoint).
    """
    raw = (
        spark.readStream.schema(CARDS_RAW_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(landing_dir)
    )
    prepared = prepare_cards(raw)
    q = (
        prepared.writeStream.format("parquet")
        .option("path", table_path)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    # awaitTermination returns False on timeout with the query still
    # running — stop it and fail loudly rather than returning a partial
    # (or missing) table (mirrors events.run_available_now)
    if not q.awaitTermination(timeout_s):
        q.stop()
        raise TimeoutError(
            f"stream_ingest_cards did not drain within {timeout_s}s "
            f"(landing_dir={landing_dir!r})"
        )
    return spark.read.parquet(table_path)


def stream_upsert_cards(
    spark: SparkSession,
    landing_dir: str,
    table_path: str,
    checkpoint_dir: str,
    key: str = "id",
    timeout_s: int = 120,
    table_format: str = "parquet",
) -> DataFrame:
    """Streaming MERGE sink: each micro-batch upserts into the target
    table via ``foreachBatch`` + ``merge_upsert`` — table-level upsert
    semantics on a stream (re-landed/corrected card files UPDATE rows
    instead of appending duplicates).

    Exactly-once composition: the checkpoint makes batch delivery
    at-least-once, and the upsert is idempotent on ``key``, so replayed
    batches converge to the same table — the same argument Delta's
    ``foreachBatch`` MERGE pattern makes in production (swap the body
    for ``deltaTable.merge``; the stream wiring is unchanged).
    """
    from ..ingest.sink import merge_upsert

    raw = (
        spark.readStream.schema(CARDS_RAW_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(landing_dir)
    )
    prepared = prepare_cards(raw)

    if table_format == "ledger":
        # snapshot-isolated streaming sink: every micro-batch commits a
        # new ledger version, so downstream readers never observe a
        # half-applied batch — the foreachBatch Delta MERGE shape with
        # the local ledger standing in for the Delta log
        from ..ingest.ledger import ledger_merge_upsert

        def upsert_batch(batch_df: DataFrame, batch_id: int) -> None:
            ledger_merge_upsert(spark, table_path, batch_df, key=key)

    elif table_format == "parquet":

        def upsert_batch(batch_df: DataFrame, batch_id: int) -> None:
            merge_upsert(spark, table_path, batch_df, key=key)

    else:
        raise ValueError(f"unknown table format: {table_format!r}")

    q = (
        prepared.writeStream.foreachBatch(upsert_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(timeout_s):
        q.stop()
        raise TimeoutError(
            f"stream_upsert_cards did not drain within {timeout_s}s "
            f"(landing_dir={landing_dir!r})"
        )
    if table_format == "ledger":
        from ..ingest.ledger import ledger_read

        return ledger_read(spark, table_path)
    return spark.read.parquet(table_path)


def stream_fold_cms(
    spark: SparkSession,
    src_dir: str,
    sketch_dir: str,
    checkpoint_dir: str,
    col: str,
    schema=None,
    timeout_s: int = 120,
) -> DataFrame:
    """Streaming frequency sketch: every micro-batch builds its own
    count-min sketch (``sketches.cms_build`` — at most d·w cells no
    matter the batch size) and APPENDS it; the corpus sketch is the
    cell-wise sum of all batch sketches, read back with one tiny
    groupBy. Each batch writes to its own ``batch=<id>`` subdirectory
    with OVERWRITE: foreachBatch is at-least-once, so a replayed batch
    id must land on the same path and replace itself rather than
    append a double-counting second copy — without this the sketch's
    ``estimate ≤ true + εN`` guarantee silently breaks on the first
    post-crash restart. Mergeability is what makes the sketch an
    ingest artifact at 100 TB (compact by re-summing when the cell
    count grows past a few multiples of d·w).

    Returns the merged corpus sketch (``row_idx, bucket, cnt``) — an
    empty sketch when the source produced no batches yet.
    """
    from ..operators.sketches import cms_build

    reader = spark.readStream
    if schema is not None:
        reader = reader.schema(schema)
    src = reader.option("maxFilesPerTrigger", 1).parquet(src_dir)

    def fold_batch(batch_df: DataFrame, batch_id: int) -> None:
        cms_build(batch_df, col).write.mode("overwrite").parquet(
            f"{sketch_dir}/batch={batch_id}"
        )

    q = (
        src.writeStream.foreachBatch(fold_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(timeout_s):
        q.stop()
        raise TimeoutError(
            f"stream_fold_cms did not drain within {timeout_s}s "
            f"(src_dir={src_dir!r})"
        )
    import os

    from pyspark.sql import functions as F

    if not os.path.isdir(sketch_dir):
        # zero micro-batches (cold-start ingest dir): empty sketch, not
        # a PATH_NOT_FOUND crash
        return spark.createDataFrame(
            [], "row_idx int, bucket int, cnt long"
        )
    return (
        spark.read.parquet(sketch_dir)
        .drop("batch")
        .groupBy("row_idx", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )


def stream_fold_quantile_sample(
    spark: SparkSession,
    src_dir: str,
    state_dir: str,
    checkpoint_dir: str,
    value_col: str,
    key_cols: list,
    group_col: str,
    quantiles: list,
    rate: float = 0.05,
    schema=None,
    timeout_s: int = 120,
) -> DataFrame:
    """Streaming leg of the quantile sketch (q202): because the
    sketch's state is a content-hash sample, the streaming fold is a
    STATELESS filter — each micro-batch appends its own sample rows
    and its per-group exact counts under ``batch=<id>`` (overwrite,
    the same at-least-once replay rule as :func:`stream_fold_cms`;
    a replayed batch replaces itself instead of double-counting).
    No state store, no watermark, no compactor: the sample union IS
    the merge.

    Returns the estimate over the merged state — schema-identical to
    ``sketches.quantile_sketch_estimate`` on the whole corpus, and
    (because sample membership is row-local) VALUE-identical to it,
    however the input was micro-batched; pinned in
    tests/test_streaming.py.
    """
    import os

    from pyspark.sql import functions as F

    from ..operators.sampling import fraction_threshold, sample_bucket

    reader = spark.readStream
    if schema is not None:
        reader = reader.schema(schema)
    src = reader.option("maxFilesPerTrigger", 1).parquet(src_dir)

    key = F.concat_ws(
        "\x1f", *[F.col(c).cast("string") for c in key_cols]
    )
    thr = fraction_threshold(rate)

    def fold_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.filter(
            (sample_bucket(key) < thr) & F.col(value_col).isNotNull()
        ).select(group_col, F.col(value_col).cast("double")).write.mode(
            "overwrite"
        ).parquet(f"{state_dir}/samples/batch={batch_id}")
        batch_df.groupBy(group_col).agg(
            F.count(
                F.when(F.col(value_col).isNotNull(), 1)
            ).alias("n")
        ).write.mode("overwrite").parquet(
            f"{state_dir}/counts/batch={batch_id}"
        )

    q = (
        src.writeStream.foreachBatch(fold_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(timeout_s):
        q.stop()
        raise TimeoutError(
            f"stream_fold_quantile_sample did not drain within "
            f"{timeout_s}s (src_dir={src_dir!r})"
        )

    qcols = [
        F.percentile(F.col(value_col), F.lit(qv)).alias(
            f"q_{str(qv).replace('.', '_')}"
        )
        for qv in quantiles
    ]
    if not os.path.isdir(f"{state_dir}/samples"):
        empty_cols = ", ".join(
            f"q_{str(qv).replace('.', '_')} double" for qv in quantiles
        )
        return spark.createDataFrame(
            [], f"{group_col} string, {empty_cols}, sample_n long, n long"
        )
    samples = spark.read.parquet(f"{state_dir}/samples").drop("batch")
    counts = spark.read.parquet(f"{state_dir}/counts").drop("batch")
    est = samples.groupBy(group_col).agg(
        *qcols, F.count(value_col).alias("sample_n")
    )
    totals = counts.groupBy(group_col).agg(F.sum("n").alias("n"))
    # full outer: a group can be all-unsampled (counts only) — emit it
    # with NULL estimates rather than dropping it, matching the batch
    # op's NULL percentile over an empty sample.
    return est.join(totals, on=group_col, how="full").select(
        group_col,
        *[
            F.col(f"q_{str(qv).replace('.', '_')}")
            for qv in quantiles
        ],
        F.coalesce("sample_n", F.lit(0)).alias("sample_n"),
        F.coalesce("n", F.lit(0)).alias("n"),
    )


def stream_fold_hll(
    spark: SparkSession,
    src_dir: str,
    state_dir: str,
    checkpoint_dir: str,
    group_col: str,
    col: str,
    schema=None,
    timeout_s: int = 120,
) -> DataFrame:
    """Streaming distinct-count sketch: each micro-batch writes its own
    HLL register frame (``sketches.hll_portable_registers`` — at most
    groups × 2^p rows per batch) under ``batch=<id>`` with OVERWRITE
    (the at-least-once replay rule shared by every fold here); the
    union sketch is MAX per register, which is associative, commutative
    AND idempotent — the strongest merge in the sketch family (even a
    double-written batch could not perturb it). Returns the per-group
    estimate over the merged registers, bit-identical to the batch
    sketch over the whole corpus (pinned in tests)."""
    import os

    from pyspark.sql import functions as F

    from ..operators.sketches import (
        hll_estimate_from_registers,
        hll_portable_registers,
    )

    reader = spark.readStream
    if schema is not None:
        reader = reader.schema(schema)
    src = reader.option("maxFilesPerTrigger", 1).parquet(src_dir)

    def fold_batch(batch_df: DataFrame, batch_id: int) -> None:
        hll_portable_registers(batch_df, group_col, col).write.mode(
            "overwrite"
        ).parquet(f"{state_dir}/batch={batch_id}")

    q = (
        src.writeStream.foreachBatch(fold_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(timeout_s):
        q.stop()
        raise TimeoutError(
            f"stream_fold_hll did not drain within {timeout_s}s "
            f"(src_dir={src_dir!r})"
        )
    if not os.path.isdir(state_dir):
        return spark.createDataFrame(
            [], f"{group_col} string, est_distinct double"
        )
    regs = (
        spark.read.parquet(state_dir)
        .drop("batch")
        .groupBy(group_col, "idx")
        .agg(F.max("M").alias("M"))
    )
    return hll_estimate_from_registers(regs, group_col)


def stream_fold_drift_counts(
    spark: SparkSession,
    src_dir: str,
    state_dir: str,
    checkpoint_dir: str,
    group_col: str,
    value_col: str,
    bounds: list,
    prefix: str = "b",
    schema=None,
    timeout_s: int = 120,
) -> DataFrame:
    """Streaming leg of the drift monitor: each micro-batch folds to
    its |groups|-row conditional-count frame (``drift._bucket_counts``
    — the monitor's mergeable state: every column is a COUNT, so the
    corpus state is the per-group SUM of batch states, associative and
    replay-safe under the same ``batch=<id>`` overwrite contract as the
    sketch folds). Feed the merged frame to
    ``drift.drift_report_from_counts`` next to a reference side and the
    report is EXPRESSION-IDENTICAL to the batch path — streamed ≡ batch
    is pinned bitwise in tests/test_drift.py.

    At 100 TB this is the shape drift monitoring wants anyway: the
    state that persists per ingest run is groups × (buckets+2) integers
    — metadata-scale — while the scan cost amortizes into the ingest
    stream itself."""
    from ..operators.drift import _bucket_counts

    reader = spark.readStream
    if schema is not None:
        reader = reader.schema(schema)
    src = reader.option("maxFilesPerTrigger", 1).parquet(src_dir)

    def fold_batch(batch_df: DataFrame, batch_id: int) -> None:
        _bucket_counts(
            batch_df, group_col, value_col, bounds, prefix
        ).write.mode("overwrite").parquet(f"{state_dir}/batch={batch_id}")

    q = (
        src.writeStream.foreachBatch(fold_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(timeout_s):
        q.stop()
        raise TimeoutError(
            f"stream_fold_drift_counts did not drain within {timeout_s}s "
            f"(src_dir={src_dir!r})"
        )
    import os

    from pyspark.sql import functions as F

    cols = [f"{prefix}_n", f"{prefix}_nulls"] + [
        f"{prefix}_b{i}" for i in range(len(bounds) + 1)
    ]
    if not os.path.isdir(state_dir):
        schema_str = f"{group_col} string, " + ", ".join(
            f"{c} long" for c in cols
        )
        return spark.createDataFrame([], schema_str)
    return (
        spark.read.parquet(state_dir)
        .drop("batch")
        .groupBy(group_col)
        .agg(*[F.sum(c).alias(c) for c in cols])
    )


def stream_fold_retention_states(
    spark: SparkSession,
    src_dir: str,
    state_dir: str,
    checkpoint_dir: str,
    timeout_s: int = 120,
    schema=None,
):
    """Streaming leg of the cohort-retention matrix (q218): each
    micro-batch folds the event stream into the two PERSISTED
    ARTIFACTS the batch query's docstring names — the per-user
    first-seen table (MIN-mergeable: the corpus first-seen is the min
    over batch minima, so an out-of-order batch that reveals an
    EARLIER first event re-bases the user's cohort correctly — the
    case a naive incremental grid gets wrong) and the distinct
    (user, activity-week) cell table (UNION-mergeable).  Both folds
    write under the same replay-safe ``batch=<id>`` overwrite contract
    as the sketch/drift folds.

    Returns ``(first_seen, activity_weeks)`` merged across all drained
    batches; feed them to :func:`retention_from_states` for a report
    row-identical to the batch ``q218`` over the same events — pinned
    in tests/test_streaming_retention.py, including a user whose
    earliest event arrives in the LAST file.

    At 100 TB these states are exactly what an ingest pipeline
    persists anyway (first-seen ~ |users| rows, activity ~ |user,week|
    rows); each micro-batch contributes a pre-aggregated frame, so the
    stream never reshuffles history — the merge is one groupBy over
    the state directory.

    State/checkpoint pairing (ADVICE r7): a FRESH checkpoint dir with
    a reused state_dir would silently merge stale ``batch=<id>``
    directories from the prior run (the per-batch overwrite only
    replaces colliding ids), so a fresh checkpoint clears the state
    subdirs first; and an empty source (zero drained batches) returns
    empty frames with the fold's exact schemas instead of throwing
    PATH_NOT_FOUND on the state read."""
    import os
    import shutil

    from pyspark.sql import functions as F

    if not os.path.isdir(checkpoint_dir) or not os.listdir(checkpoint_dir):
        # fresh run: any batch=<id> state on disk is from a PRIOR run
        # (a resumed run always has its checkpoint); drop it so the
        # merge below sees only this run's folds
        for sub in ("first", "weeks"):
            p = os.path.join(state_dir, sub)
            if os.path.isdir(p):
                shutil.rmtree(p)

    reader = spark.readStream
    if schema is not None:
        reader = reader.schema(schema)
    src = reader.option("maxFilesPerTrigger", 1).parquet(src_dir)

    def fold_batch(batch_df: DataFrame, batch_id: int) -> None:
        ev = batch_df.where(
            F.col("user_id").isNotNull() & F.col("ts").isNotNull()
        )
        ev.groupBy("user_id").agg(
            F.min("ts").alias("first_ts")
        ).write.mode("overwrite").parquet(
            f"{state_dir}/first/batch={batch_id}"
        )
        ev.select(
            "user_id",
            F.date_trunc("week", F.col("ts")).cast("date").alias("week"),
        ).distinct().write.mode("overwrite").parquet(
            f"{state_dir}/weeks/batch={batch_id}"
        )

    q = (
        src.writeStream.foreachBatch(fold_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(timeout_s):
        q.stop()
        raise TimeoutError(
            f"stream_fold_retention_states did not drain within "
            f"{timeout_s}s (src_dir={src_dir!r})"
        )
    if not os.path.isdir(os.path.join(state_dir, "first")):
        # zero drained batches: run the fold expressions over an empty
        # frame so the returned schemas match the merged-state shapes
        empty = spark.createDataFrame([], src.schema)
        return (
            empty.groupBy("user_id").agg(F.min("ts").alias("first_ts")),
            empty.select(
                "user_id",
                F.date_trunc("week", F.col("ts")).cast("date").alias("week"),
            ).distinct(),
        )
    first = (
        spark.read.parquet(f"{state_dir}/first")
        .drop("batch")
        .groupBy("user_id")
        .agg(F.min("first_ts").alias("first_ts"))
    )
    weeks = (
        spark.read.parquet(f"{state_dir}/weeks")
        .drop("batch")
        .distinct()
    )
    return first, weeks


def retention_from_states(first: DataFrame, weeks: DataFrame) -> DataFrame:
    """The q218 report tail over the MERGED streaming states — the
    same expression tree as the batch query (DATE-cast week
    truncation, integer week arithmetic, one final division), so
    streamed ≡ batch is row-exact, not approximate."""
    from pyspark.sql import functions as F

    first_seen = first.select(
        "user_id",
        F.date_trunc("week", F.col("first_ts"))
        .cast("date")
        .alias("cohort_week"),
    )
    activity = (
        weeks.join(first_seen, "user_id")
        .select(
            "user_id",
            "cohort_week",
            (F.datediff(F.col("week"), F.col("cohort_week")) / 7)
            .cast("bigint")
            .alias("week_idx"),
        )
        .distinct()
    )
    sizes = first_seen.groupBy("cohort_week").agg(
        F.count("*").alias("cohort_size")
    )
    grid = activity.groupBy("cohort_week", "week_idx").agg(
        F.count("*").alias("n_active")
    )
    return grid.join(sizes, "cohort_week").select(
        "cohort_week",
        "week_idx",
        "n_active",
        "cohort_size",
        F.round(
            F.col("n_active").cast("double") / F.col("cohort_size"), 6
        ).alias("retention"),
    )


def stream_fold_source_token_counts(
    spark: SparkSession,
    src_dir: str,
    state_dir: str,
    checkpoint_dir: str,
    timeout_s: int = 120,
    schema=None,
):
    """Streaming leg of the token-budget planner (q240): each
    micro-batch of the document stream folds into the per-source token
    count — the simplest mergeable state in the family (per-batch
    partial SUMs; the corpus total is one more SUM over batch rows),
    persisted under the same replay-safe ``batch=<id>`` overwrite
    contract as the sketch/retention folds, with the same fresh-
    checkpoint state clearing and empty-source schema guard.

    Returns the MERGED (source, n_tokens) relation; feed it to
    ``pipeline_queries13.epoch_capped_allocation`` for an allocation
    row-identical to the batch q240 over the same documents — pinned
    in tests/test_streaming_allocation.py, including a source whose
    documents are split across micro-batches.

    At 100 TB this state is what an ingest pipeline keeps anyway
    (|sources| rows per batch); the stream never reshuffles history —
    each batch contributes a pre-aggregated frame and the merge is one
    |sources|-key groupBy over the state directory."""
    import os
    import shutil

    from pyspark.sql import functions as F

    from ..pipeline_queries13 import source_token_counts

    if not os.path.isdir(checkpoint_dir) or not os.listdir(checkpoint_dir):
        p = os.path.join(state_dir, "tokcounts")
        if os.path.isdir(p):
            shutil.rmtree(p)

    reader = spark.readStream
    if schema is not None:
        reader = reader.schema(schema)
    src = reader.option("maxFilesPerTrigger", 1).parquet(src_dir)

    def fold_batch(batch_df, batch_id: int) -> None:
        source_token_counts(batch_df).write.mode("overwrite").parquet(
            f"{state_dir}/tokcounts/batch={batch_id}"
        )

    q = (
        src.writeStream.foreachBatch(fold_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(timeout_s):
        q.stop()
        raise TimeoutError(
            f"stream_fold_source_token_counts did not drain within "
            f"{timeout_s}s (src_dir={src_dir!r})"
        )
    if not os.path.isdir(os.path.join(state_dir, "tokcounts")):
        empty = spark.createDataFrame([], src.schema)
        return source_token_counts(empty)
    return (
        spark.read.parquet(f"{state_dir}/tokcounts")
        .drop("batch")
        .groupBy("source")
        .agg(F.sum("n_tokens").cast("long").alias("n_tokens"))
    )


def stream_fold_dedup_mix(
    spark: SparkSession,
    src_dir: str,
    state_dir: str,
    checkpoint_dir: str,
    timeout_s: int = 120,
    schema=None,
):
    """Streaming leg of the dedup-adjusted mix planner (q242): each
    micro-batch folds into the ``(source, fingerprint, nt, n_docs)``
    state (``pipeline_queries13.dedup_mix_state``) — counts at that
    grain are SUM-mergeable, so the merged state equals the batch
    state over the union of all batches even when copies of one
    fingerprint arrive in DIFFERENT micro-batches (the cross-batch
    duplicate case the equivalence test plants).  Same replay-safe
    ``batch=<id>`` overwrite contract, fresh-checkpoint state
    clearing, and empty-source schema guard as the other folds.

    Returns the MERGED state; feed it to
    ``dedup_adjusted_mix_from_state`` for a mix table row-identical to
    the batch q242 over the same documents.

    At 100 TB: per batch the fold writes a pre-aggregated frame
    (distinct triples in that batch); history is never reshuffled —
    the merge is one groupBy over the state directory, and the
    downstream copy-count groupBy is the only fingerprint-wide
    shuffle, exactly the batch gate's shape."""
    import os
    import shutil

    from pyspark.sql import functions as F

    from ..pipeline_queries13 import dedup_mix_state

    if not os.path.isdir(checkpoint_dir) or not os.listdir(checkpoint_dir):
        p = os.path.join(state_dir, "dedupmix")
        if os.path.isdir(p):
            shutil.rmtree(p)

    reader = spark.readStream
    if schema is not None:
        reader = reader.schema(schema)
    src = reader.option("maxFilesPerTrigger", 1).parquet(src_dir)

    def fold_batch(batch_df, batch_id: int) -> None:
        dedup_mix_state(batch_df).write.mode("overwrite").parquet(
            f"{state_dir}/dedupmix/batch={batch_id}"
        )

    q = (
        src.writeStream.foreachBatch(fold_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(timeout_s):
        q.stop()
        raise TimeoutError(
            f"stream_fold_dedup_mix did not drain within "
            f"{timeout_s}s (src_dir={src_dir!r})"
        )
    if not os.path.isdir(os.path.join(state_dir, "dedupmix")):
        empty = spark.createDataFrame([], src.schema)
        return dedup_mix_state(empty)
    return (
        spark.read.parquet(f"{state_dir}/dedupmix")
        .drop("batch")
        .groupBy("source", "fingerprint", "nt")
        .agg(F.sum("n_docs").cast("long").alias("n_docs"))
    )


def stream_fold_paragraph_dedup(
    spark: SparkSession,
    src_dir: str,
    state_dir: str,
    checkpoint_dir: str,
    timeout_s: int = 120,
    schema=None,
):
    """Streaming leg of paragraph-level dedup (q245): each micro-batch
    of the document stream folds into the paragraph OCCURRENCE ledger
    (``pipeline_queries14.paragraph_occurrences`` — the expensive
    tokenize+window+fingerprint half runs once per batch, never over
    history), under the replay-safe ``batch=<id>`` overwrite contract
    with the fresh-checkpoint clearing and empty-source guard the fold
    family shares.

    Returns the MERGED occurrence relation; feed it to
    ``paragraph_dedup_stats`` for per-document surviving-text stats
    row-identical to the batch q245 over the same documents — the
    keeper rule is a MIN(first-occurrence key) + COUNT per
    fingerprint, both mergeable over the batch union, so a paragraph
    whose TRUE first occurrence arrives in a LATER batch re-bases the
    keeper exactly like the retention fold's straggler case (pinned
    in tests/test_streaming_paragraph_dedup.py).

    At 100 TB: the ledger is one row per paragraph occurrence (two
    ints + two fixed-width keys — no text), the incremental analog of
    the persisted paragraph index; the only corpus-wide shuffle stays
    the fingerprint GROUP BY at read time."""
    import os
    import shutil

    from ..pipeline_queries14 import paragraph_occurrences, paragraph_table

    if not os.path.isdir(checkpoint_dir) or not os.listdir(checkpoint_dir):
        p = os.path.join(state_dir, "paraocc")
        if os.path.isdir(p):
            shutil.rmtree(p)

    reader = spark.readStream
    if schema is not None:
        reader = reader.schema(schema)
    src = reader.option("maxFilesPerTrigger", 1).parquet(src_dir)

    def fold_batch(batch_df, batch_id: int) -> None:
        paragraph_occurrences(
            paragraph_table(batch_df)
        ).write.mode("overwrite").parquet(
            f"{state_dir}/paraocc/batch={batch_id}"
        )

    q = (
        src.writeStream.foreachBatch(fold_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(timeout_s):
        q.stop()
        raise TimeoutError(
            f"stream_fold_paragraph_dedup did not drain within "
            f"{timeout_s}s (src_dir={src_dir!r})"
        )
    if not os.path.isdir(os.path.join(state_dir, "paraocc")):
        empty = spark.createDataFrame([], src.schema)
        return paragraph_occurrences(paragraph_table(empty))
    return spark.read.parquet(f"{state_dir}/paraocc").drop("batch")


def stream_refresh_artifacts(
    spark,
    src_dir: str,
    artifact_root: str,
    checkpoint_dir: str,
    timeout_s: int = 180,
    schema=None,
):
    """Continuous maintenance of the DURABLE ingest artifacts
    (``ingest.artifacts``): each arriving document micro-batch folds
    into the ledger tables via ``refresh_documents`` — the
    ``foreachBatch`` + table-MERGE shape a production pipeline runs,
    with the ledger supplying the atomic commits.  The first batch
    bootstraps an empty root (full build == refresh of everything);
    every later batch pays O(batch): document-grain replace for the
    paragraph/posting tables, signed SUM-merged DF deltas, MIN/SUM
    keeper-state merge on append, and the affected-fingerprint merge
    (surviving keepers fold exactly; only keeper-losing fingerprints
    rescan two pruned index columns) when a batch replaces documents.

    Replay safety rides ``refresh_documents``'s ``batch_id`` contract
    (r11): every ledger commit is stamped with the checkpoint's batch
    id, so a replay — including one after a crash BETWEEN table
    commits mid-fold — skips fully-applied tables and re-derives the
    partially-applied ones from their pinned PRE-batch snapshots
    (signed DF deltas against the pre-batch posting tables, never the
    half-updated ones).  Fully-committed replays additionally net to
    no-ops at the row level (delete + re-upsert re-derives identical
    rows; pinned in tests/test_streaming_artifacts.py).  The ledger
    versions advance but every reader's view is unchanged; vacuum
    reclaims the dead files.

    After the stream drains, any session — including a future one —
    serves queries (q254/q257/q258) from the maintained artifacts with
    zero corpus re-scans."""
    from ..ingest.artifacts import refresh_documents

    reader = spark.readStream
    if schema is not None:
        reader = reader.schema(schema)
    src = reader.option("maxFilesPerTrigger", 1).parquet(src_dir)

    def fold_batch(batch_df, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        refresh_documents(spark, artifact_root, batch_df, batch_id=batch_id)

    q = (
        src.writeStream.foreachBatch(fold_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(timeout_s):
        q.stop()
        raise TimeoutError(
            f"stream_refresh_artifacts did not drain within "
            f"{timeout_s}s (src_dir={src_dir!r})"
        )


def stream_admit_documents(
    spark,
    src_dir: str,
    artifact_root: str,
    checkpoint_dir: str,
    tau: float,
    df_cap: int,
    timeout_s: int = 180,
    schema=None,
):
    """Continuous ingest ADMISSION (the end-to-end loop a production
    pipeline runs, composing r11's transactional gate with the
    streamed artifact maintenance): each arriving document micro-batch
    is classified against the durable artifacts (exact vs keeper
    state, batch-internal exact, near-dup vs the posting index), the
    per-document decisions are committed to the durable
    ``admission_stats`` history, and ONLY admitted documents fold into
    the index via ``refresh_documents`` — so rejected duplicates never
    pollute the corpus state they would later be screened against.

    Requires a BOOTSTRAPPED artifact root (``build_document_artifacts``
    on the initial corpus, or a completed ``stream_refresh_artifacts``
    run): admission against nothing is not a meaningful screen, and
    the artifact readers raise on an uncommitted root by design.

    Exactly-once rides ``ingest.admission.admit_batch_exactly_once``
    (the decision commit is the anchor; see its docstring for the
    crash matrix).  Equivalence to the batch gate (streamed N-batch
    admission ≡ sequential ``admit_and_refresh`` calls, through every
    artifact reader AND the recorded history) is pinned in
    ``tests/test_streaming_admission.py``."""
    from ..ingest.admission import admit_batch_exactly_once

    def fold_batch(batch_df, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        admit_batch_exactly_once(
            spark, artifact_root, batch_df, tau, df_cap, batch_id
        )

    reader = spark.readStream
    if schema is not None:
        reader = reader.schema(schema)
    src = reader.option("maxFilesPerTrigger", 1).parquet(src_dir)
    q = (
        src.writeStream.foreachBatch(fold_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(timeout_s):
        q.stop()
        raise TimeoutError(
            f"stream_admit_documents did not drain within "
            f"{timeout_s}s (src_dir={src_dir!r})"
        )
