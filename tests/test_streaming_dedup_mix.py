"""r9: the dedup-adjusted mix planner's streaming leg — the
(source, fingerprint, nt, n_docs) state folds per micro-batch, and the
mix derived from the merged state must equal the batch q242 ROW-EXACTLY
over the same documents.

The corpus plants every hard case: copies of one fingerprint split
ACROSS micro-batches and ACROSS sources (the cross-batch/cross-source
merge), two docs with the SAME fingerprint but DIFFERENT raw token
counts (the per-document floor the state grain exists to preserve),
NULL text, NULL source, and an empty doc.
"""


from __future__ import annotations

import pytest

import pandas as pd

from mtg_bulk_database_spark.pipeline_queries13 import (
    dedup_adjusted_mix_from_state,
)
from mtg_bulk_database_spark.registry import load_registry
from mtg_bulk_database_spark.streaming.ingest import stream_fold_dedup_mix

QUERIES, _ = load_registry()

_SCHEMA = (
    "doc_id bigint, text string, lang string, "
    "source string, n_chars bigint"
)


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


_FILES = [
    # mirror: same content in sources a (batch 0) and b (batch 1)
    [(1, "alpha beta gamma delta", "a"), (2, "uno dos tres", "c")],
    # same fingerprint as doc 1 but nt=6 vs 4: distinct-token
    # fingerprint ignores the repeats — the per-doc floor case
    [(3, "alpha beta gamma delta", "b"),
     (4, "alpha alpha beta beta gamma delta", "b")],
    [(5, "", "a"), (6, None, "b"), (7, "solo words here", None)],
]


def _drive(spark, tmp_path):
    src = tmp_path / "stream_src"
    src.mkdir()
    for i, rows in enumerate(_FILES):
        _write_docs(str(src / f"part{i}.parquet"), rows)
    batch_dir = tmp_path / "batch"
    batch_dir.mkdir()
    _write_docs(
        str(batch_dir / "documents.parquet"),
        [r for rows in _FILES for r in rows],
    )
    state = stream_fold_dedup_mix(
        spark,
        str(src),
        str(tmp_path / "state"),
        str(tmp_path / "ckpt"),
        schema=_SCHEMA,
    )
    return state, str(batch_dir)


@pytest.mark.slow
def test_streamed_dedup_mix_equals_batch(spark, tmp_path):
    state, batch_dir = _drive(spark, tmp_path)
    st = {tuple(r) for r in state.collect()}
    # the cross-batch fingerprint merged: docs 1 (src a) and 3 (src b)
    # share a fingerprint across batches; doc 4 shares it at nt=6
    by_src_nt = {(r[0], r[2]): r[3] for r in st}
    assert by_src_nt[("a", 4)] == 1 and by_src_nt[("b", 4)] == 1
    assert by_src_nt[("b", 6)] == 1

    streamed = {
        tuple(r) for r in dedup_adjusted_mix_from_state(state).collect()
    }
    batch = {
        tuple(r)
        for r in QUERIES["q242_dedup_adjusted_mix"](
            spark, batch_dir
        ).collect()
    }
    assert streamed == batch
    # the per-doc floor: fingerprint has 3 copies, so doc 4's mass is
    # (6e6 DIV 3) = 2_000_000 — summing nt first would give a
    # different floor on corpora where nt % copies != 0
    by_src = {r[0]: dict(zip(
        ["source", "n_docs", "n_tokens", "eff_tokens_micro", "eff_share"],
        r)) for r in streamed}
    assert by_src["b"]["eff_tokens_micro"] == (
        4_000_000 // 3 + 6_000_000 // 3
    )


def test_streamed_dedup_mix_idempotent_rerun(spark, tmp_path):
    state, _ = _drive(spark, tmp_path)
    first = {tuple(r) for r in state.collect()}
    # re-drive with the SAME checkpoint: no new files, no new batches,
    # state unchanged — the replay-safe overwrite contract
    again = stream_fold_dedup_mix(
        spark,
        str(tmp_path / "stream_src"),
        str(tmp_path / "state"),
        str(tmp_path / "ckpt"),
        schema=_SCHEMA,
    )
    assert {tuple(r) for r in again.collect()} == first


def test_streamed_dedup_mix_empty_source(spark, tmp_path):
    (tmp_path / "src").mkdir()
    state = stream_fold_dedup_mix(
        spark,
        str(tmp_path / "src"),
        str(tmp_path / "state"),
        str(tmp_path / "ckpt"),
        schema=_SCHEMA,
    )
    assert state.count() == 0
    assert dedup_adjusted_mix_from_state(state).count() == 0


def test_streamed_dedup_mix_stale_state_cleared(spark, tmp_path):
    """A fresh checkpoint with a leftover state dir from a previous
    run must not double-count: the fold clears the stale state."""
    stale = tmp_path / "state" / "dedupmix" / "batch=99"
    stale.mkdir(parents=True)
    _write_docs(str(tmp_path / "seed.parquet"), [(1, "x y z", "a")])
    import pandas as pd  # build a fake old state file

    pd.DataFrame(
        {
            "source": ["ghost"],
            "fingerprint": ["00" * 16],
            "nt": [5],
            "n_docs": [7],
        }
    ).to_parquet(str(stale / "part.parquet"), index=False)
    src = tmp_path / "src"
    src.mkdir()
    _write_docs(str(src / "p0.parquet"), [(1, "x y z", "a")])
    state = stream_fold_dedup_mix(
        spark,
        str(src),
        str(tmp_path / "state"),
        str(tmp_path / "ckpt"),
        schema=_SCHEMA,
    )
    rows = state.collect()
    assert {r["source"] for r in rows} == {"a"}
