"""r8: the token-budget planner's streaming leg — per-source token
counts fold per micro-batch into a SUM-mergeable state, and the
allocation derived from the merged state must equal the batch q240
ROW-EXACTLY over the same documents.

The corpus deliberately splits every source's documents across
micro-batches (the merge case), and ships a zero-token source plus
NULL-text and NULL-source rows (the filter cases).
"""


from __future__ import annotations

import pytest

import os

import pandas as pd

from mtg_bulk_database_spark.pipeline_queries13 import (
    epoch_capped_allocation,
)
from mtg_bulk_database_spark.registry import load_registry
from mtg_bulk_database_spark.streaming.ingest import (
    stream_fold_source_token_counts,
)

QUERIES, _ = load_registry()


def _write_docs(path: str, rows) -> None:
    pd.DataFrame(
        {
            "doc_id": [r[0] for r in rows],
            "text": [r[1] for r in rows],
            "lang": ["en"] * len(rows),
            "source": [r[2] for r in rows],
            "n_chars": [len(r[1] or "") for r in rows],
        }
    ).to_parquet(path, index=False)


@pytest.mark.slow
def test_streamed_allocation_equals_batch(spark, tmp_path):
    big = " ".join(f"w{i}" for i in range(400))
    tiny = "aa bb cc dd ee"
    # each source spans MULTIPLE files: the merged count is a real
    # cross-batch SUM, not a single batch's partial
    files = [
        [(1, big, "big"), (2, tiny, "t1"), (3, "", "zero")],
        [(4, big, "big"), (5, tiny, "t2"), (6, None, "t1")],
        [(7, tiny, "t1"), (8, tiny, "t2"), (9, big, None)],
    ]
    src = tmp_path / "stream_src"
    src.mkdir()
    for i, rows in enumerate(files):
        _write_docs(str(src / f"part{i}.parquet"), rows)

    batch_dir = tmp_path / "batch"
    batch_dir.mkdir()
    _write_docs(
        str(batch_dir / "documents.parquet"),
        [r for rows in files for r in rows],
    )

    counts = stream_fold_source_token_counts(
        spark,
        str(src),
        str(tmp_path / "state"),
        str(tmp_path / "ckpt"),
        schema=(
            "doc_id bigint, text string, lang string, "
            "source string, n_chars bigint"
        ),
    )
    by_src = {r["source"]: r["n_tokens"] for r in counts.collect()}
    # NULL source filtered; NULL text counts 0; cross-batch sums merge
    assert by_src == {"big": 800, "t1": 10, "t2": 10, "zero": 0}

    streamed = {
        tuple(r)
        for r in epoch_capped_allocation(counts).collect()
    }
    batch = {
        tuple(r)
        for r in QUERIES["q240_epoch_capped_allocation"](
            spark, str(batch_dir)
        ).collect()
    }
    assert streamed == batch


def test_empty_document_stream_returns_empty_counts(spark, tmp_path):
    (tmp_path / "src").mkdir()
    counts = stream_fold_source_token_counts(
        spark,
        str(tmp_path / "src"),
        str(tmp_path / "state"),
        str(tmp_path / "ckpt"),
        schema=(
            "doc_id bigint, text string, lang string, "
            "source string, n_chars bigint"
        ),
    )
    assert counts.columns == ["source", "n_tokens"]
    assert counts.count() == 0
    # the allocation tail is total on the empty relation too
    assert epoch_capped_allocation(counts).count() == 0


def test_rerun_with_same_checkpoint_is_idempotent(spark, tmp_path):
    """The batch=<id> overwrite contract under replay: a second run
    over the SAME checkpoint drains nothing new and must return the
    identical merged counts (no double-counting from re-reading the
    state directory), and a file added between runs folds in as one
    incremental batch."""
    src = tmp_path / "src"
    src.mkdir()
    _write_docs(str(src / "p0.parquet"), [(1, "aa bb cc", "a")])
    schema = (
        "doc_id bigint, text string, lang string, "
        "source string, n_chars bigint"
    )
    args = (str(src), str(tmp_path / "state"), str(tmp_path / "ckpt"))
    first = {
        (r["source"], r["n_tokens"])
        for r in stream_fold_source_token_counts(
            spark, *args, schema=schema
        ).collect()
    }
    assert first == {("a", 3)}
    rerun = {
        (r["source"], r["n_tokens"])
        for r in stream_fold_source_token_counts(
            spark, *args, schema=schema
        ).collect()
    }
    assert rerun == first  # no drained batch, no duplication

    _write_docs(str(src / "p1.parquet"), [(2, "dd ee", "a"), (3, "x", "b")])
    resumed = {
        (r["source"], r["n_tokens"])
        for r in stream_fold_source_token_counts(
            spark, *args, schema=schema
        ).collect()
    }
    assert resumed == {("a", 5), ("b", 1)}
