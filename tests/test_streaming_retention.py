"""r7: the cohort-retention matrix's streaming leg — the event stream
folds per micro-batch into the two persisted artifacts (MIN-mergeable
first-seen, UNION-mergeable user-week cells), and the report derived

from the merged states must equal the batch q218 ROW-EXACTLY.

The corpus deliberately ships a user whose EARLIEST event arrives in
the LAST file: a naive incremental grid pins that user's cohort at the
first observation and never re-bases; the MIN-merge contract handles
it by construction.
"""

from __future__ import annotations

import pytest

import os

import pandas as pd

from mtg_bulk_database_spark.registry import load_registry
from mtg_bulk_database_spark.streaming.ingest import (
    retention_from_states,
    stream_fold_retention_states,
)

QUERIES, _ = load_registry()


@pytest.mark.slow
def test_streamed_retention_equals_batch(spark, tmp_path):
    rows = []
    eid = 0

    def add(uid, ts):
        nonlocal eid
        rows.append(
            {
                "event_id": eid,
                "ts": pd.Timestamp(ts),
                "user_id": uid,
                "event_type": "view",
                "value": 1.0,
                "props": "{}",
            }
        )
        eid += 1

    # three weekly cohorts with varied activity
    for u in range(30):
        add(u, "2024-01-02 10:00:00")
        add(u, "2024-01-09 10:00:00")
        if u % 3 == 0:
            add(u, "2024-01-23 10:00:00")
    for u in range(30, 50):
        add(u, "2024-01-10 09:00:00")
        if u % 2 == 0:
            add(u, "2024-01-17 09:00:00")
    # the out-of-order user: a LATER event lands in file 0/1, the
    # EARLIEST (cohort-defining) event only in the last file
    add(99, "2024-01-18 12:00:00")

    df = pd.DataFrame(rows)
    df["ts"] = df["ts"].astype("datetime64[us]")
    src = tmp_path / "src"
    os.makedirs(src)
    # split into 3 files: earliest-by-eid first, then the straggler
    # file carrying user 99's TRUE first event
    df.iloc[:40].to_parquet(src / "part-0.parquet", index=False)
    df.iloc[40:].to_parquet(src / "part-1.parquet", index=False)
    late = pd.DataFrame(
        [
            {
                "event_id": 10_000,
                "ts": pd.Timestamp("2024-01-03 08:00:00"),
                "user_id": 99,
                "event_type": "view",
                "value": 1.0,
                "props": "{}",
            }
        ]
    )
    late["ts"] = late["ts"].astype("datetime64[us]")
    late.to_parquet(src / "part-2-late.parquet", index=False)

    first, weeks = stream_fold_retention_states(
        spark,
        str(src),
        str(tmp_path / "state"),
        str(tmp_path / "ckpt"),
        schema=(
            "event_id bigint, ts timestamp, user_id bigint, "
            "event_type string, value double, props string"
        ),
    )
    streamed = sorted(
        tuple(r) for r in retention_from_states(first, weeks).collect()
    )

    # batch reference: q218 over the SAME events as one table
    batch_dir = tmp_path / "batch"
    os.makedirs(batch_dir)
    allrows = pd.concat([df, late], ignore_index=True)
    allrows["ts"] = allrows["ts"].astype("datetime64[us]")
    allrows.to_parquet(batch_dir / "events.parquet", index=False)
    batch = sorted(
        tuple(r)
        for r in QUERIES["q218_cohort_retention"](
            spark, str(batch_dir)
        ).collect()
    )
    assert streamed == batch
    # the straggler's cohort is the Jan-1 week (their TRUE first
    # event, seen only in the last file) and their Jan-18 activity is
    # week_idx 2 of THAT cohort — only user 99 occupies this cell, so
    # its presence proves the MIN-merge re-based across batches
    import datetime as dt

    cell = [
        r for r in streamed
        if r[0] == dt.date(2024, 1, 1) and r[1] == 2
    ]
    assert cell and cell[0][2] == 1, streamed


def test_empty_source_returns_empty_states(spark, tmp_path):
    """r8 (ADVICE r7): zero drained batches must yield EMPTY state
    frames with the fold's schemas — not a PATH_NOT_FOUND throw on the
    state-directory read."""
    src = tmp_path / "src"
    os.makedirs(src)  # no files at all
    first, weeks = stream_fold_retention_states(
        spark,
        str(src),
        str(tmp_path / "state"),
        str(tmp_path / "ckpt"),
        schema=(
            "event_id bigint, ts timestamp, user_id bigint, "
            "event_type string, value double, props string"
        ),
    )
    assert first.columns == ["user_id", "first_ts"]
    assert weeks.columns == ["user_id", "week"]
    assert first.count() == 0 and weeks.count() == 0
    assert retention_from_states(first, weeks).count() == 0


@pytest.mark.slow
def test_fresh_checkpoint_clears_stale_state(spark, tmp_path):
    """r8 (ADVICE r7): reusing a state_dir with a FRESH checkpoint
    must not merge the prior run's batch directories — the second run
    sees only its own events."""
    schema = (
        "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double, props string"
    )

    def write_events(d, uids):
        rows = pd.DataFrame(
            [
                {
                    "event_id": i,
                    "ts": pd.Timestamp("2024-01-02 10:00:00"),
                    "user_id": u,
                    "event_type": "view",
                    "value": 1.0,
                    "props": "{}",
                }
                for i, u in enumerate(uids)
            ]
        )
        rows["ts"] = rows["ts"].astype("datetime64[us]")
        os.makedirs(d)
        rows.to_parquet(os.path.join(d, "part-0.parquet"), index=False)

    state = str(tmp_path / "state")
    write_events(str(tmp_path / "src1"), [1, 2, 3])
    first1, _ = stream_fold_retention_states(
        spark, str(tmp_path / "src1"), state,
        str(tmp_path / "ckpt1"), schema=schema,
    )
    assert first1.count() == 3

    # second run: DIFFERENT source, FRESH checkpoint, SAME state dir
    write_events(str(tmp_path / "src2"), [7])
    first2, weeks2 = stream_fold_retention_states(
        spark, str(tmp_path / "src2"), state,
        str(tmp_path / "ckpt2"), schema=schema,
    )
    assert {r["user_id"] for r in first2.collect()} == {7}
    assert {r["user_id"] for r in weeks2.collect()} == {7}
