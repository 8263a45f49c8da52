"""r9: paragraph-level dedup's streaming leg — the occurrence ledger
folds per micro-batch and the per-document stats derived from the
merged ledger must equal the batch q245 ROW-EXACTLY.

The planted hard case is the KEEPER STRAGGLER: the true first
occurrence (doc 1, para 0) of the shared paragraph arrives in the
LAST file — the MIN merge must re-base the keeper so doc 5's copy
(which was locally first in its own batch) ends up dropped, exactly
like the retention fold's first-seen re-basing.
"""

from __future__ import annotations

import pandas as pd

from mtg_bulk_database_spark.pipeline_queries14 import (
    paragraph_dedup_stats,
)
from mtg_bulk_database_spark.registry import load_registry
from mtg_bulk_database_spark.streaming.ingest import (
    stream_fold_paragraph_dedup,
)

QUERIES, _ = load_registry()

_SCHEMA = (
    "doc_id bigint, text string, lang string, "
    "source string, n_chars bigint"
)

_BOILER = ("nav home about contact privacy terms "
           "login logout search help faq cart")
_PROSE = ("alpha bravo charlie delta echo foxtrot "
          "golf hotel india juliet kilo lima")


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
    # batch 0: doc 5 carries the boilerplate — locally the keeper
    [(5, f"{_BOILER} {_PROSE}", "a"), (6, "uno dos tres", "b")],
    # batch 1: another copy, plus an empty and a NULL doc
    [(7, _BOILER, "c"), (8, "", "a"), (9, None, "b")],
    # batch 2 (LAST): the true global keeper (doc 1) arrives late
    [(1, _BOILER, "a")],
]


def test_streamed_paragraph_dedup_equals_batch(spark, tmp_path):
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
    occ = stream_fold_paragraph_dedup(
        spark,
        str(src),
        str(tmp_path / "state"),
        str(tmp_path / "ckpt"),
        schema=_SCHEMA,
    )
    streamed = {
        tuple(r) for r in paragraph_dedup_stats(occ).collect()
    }
    batch = {
        tuple(r)
        for r in QUERIES["q245_paragraph_dedup"](
            spark, str(batch_dir)
        ).collect()
    }
    assert streamed == batch
    rec = {r[0]: r for r in streamed}
    # the straggler keeper: doc 1 (arrived LAST) keeps its paragraph,
    # doc 5 and doc 7 drop theirs — the MIN merge re-based the keeper
    assert rec[1][2] == 0          # n_dropped for doc 1
    assert rec[5][2] == 1 and rec[7][2] == 1
    assert rec[5][3] == 12         # doc 5 keeps only its prose tokens
    assert 8 not in rec and 9 not in rec  # empty/NULL docs emit no row


def test_streamed_paragraph_dedup_empty_and_rerun(spark, tmp_path):
    (tmp_path / "src").mkdir()
    occ = stream_fold_paragraph_dedup(
        spark,
        str(tmp_path / "src"),
        str(tmp_path / "state"),
        str(tmp_path / "ckpt"),
        schema=_SCHEMA,
    )
    assert occ.count() == 0
    assert paragraph_dedup_stats(occ).count() == 0

    # now land one file, drain, then re-drain with the same checkpoint
    _write_docs(str(tmp_path / "src" / "p0.parquet"), [(1, _PROSE, "a")])
    occ = stream_fold_paragraph_dedup(
        spark,
        str(tmp_path / "src"),
        str(tmp_path / "state"),
        str(tmp_path / "ckpt"),
        schema=_SCHEMA,
    )
    first = {tuple(r) for r in occ.collect()}
    assert len(first) == 1
    again = stream_fold_paragraph_dedup(
        spark,
        str(tmp_path / "src"),
        str(tmp_path / "state"),
        str(tmp_path / "ckpt"),
        schema=_SCHEMA,
    )
    assert {tuple(r) for r in again.collect()} == first
