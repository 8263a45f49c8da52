"""Ledger-table tests: the transaction-log format must give snapshot-
isolated readers (the property the directory-swap merge cannot), exact
merge_upsert semantics, log-driven file skipping, crash invisibility,
optimistic-concurrency commits, and retention-bounded vacuum."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from mtg_bulk_database_spark.ingest import ledger


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture()
def root(tmp_path):
    return str(tmp_path / "tbl")


def _df(spark, pairs):
    return spark.createDataFrame(pairs, "id long, val string")


def test_write_read_roundtrip_and_versioning(spark, root):
    v1 = ledger.ledger_write(spark, root, _df(spark, [(1, "a"), (2, "b")]))
    assert v1 == 1 and ledger.current_version(root) == 1
    assert _rows(ledger.ledger_read(spark, root)) == [(1, "a"), (2, "b")]
    v2 = ledger.ledger_merge_upsert(spark, root, _df(spark, [(2, "B"), (3, "c")]))
    assert v2 == 2
    assert _rows(ledger.ledger_read(spark, root)) == [(1, "a"), (2, "B"), (3, "c")]


def test_snapshot_isolation_across_commits(spark, root):
    """The core property: a reader pinned to version 1 sees version 1's
    rows unchanged after later merges commit — no transient absence, no
    torn state, because commits never touch version 1's files."""
    ledger.ledger_write(spark, root, _df(spark, [(1, "a"), (2, "b")]))
    pinned = ledger.ledger_read(spark, root)  # resolves v1's file list
    before = _rows(pinned)
    ledger.ledger_merge_upsert(spark, root, _df(spark, [(1, "A"), (9, "z")]))
    ledger.ledger_merge_upsert(spark, root, _df(spark, [(2, "B")]))
    # the pinned DataFrame AND an explicit v1 read both still see v1
    assert _rows(pinned) == before
    assert _rows(ledger.ledger_read(spark, root, version=1)) == before
    assert _rows(ledger.ledger_read(spark, root)) == [
        (1, "A"),
        (2, "B"),
        (9, "z"),
    ]


def test_merge_semantics_match_sink_and_idempotent(spark, root, tmp_path):
    from mtg_bulk_database_spark.ingest.sink import merge_upsert

    base = [(i, f"v{i}") for i in range(50)]
    upd = [(i, "NEW") for i in range(20, 30)] + [(100, "ins")]
    sink_path = str(tmp_path / "sink_tbl")
    merge_upsert(spark, sink_path, _df(spark, base), key="id")
    merge_upsert(spark, sink_path, _df(spark, upd), key="id")
    ledger.ledger_write(spark, root, _df(spark, base))
    ledger.ledger_merge_upsert(spark, root, _df(spark, upd))
    assert _rows(ledger.ledger_read(spark, root)) == _rows(
        spark.read.parquet(sink_path)
    )
    # idempotency: re-merging the same source changes nothing but the version
    v = ledger.ledger_merge_upsert(spark, root, _df(spark, upd))
    assert _rows(ledger.ledger_read(spark, root)) == _rows(
        ledger.ledger_read(spark, root, version=v - 1)
    )


def test_merge_skips_disjoint_files(spark, root):
    """Log-driven pruning: files whose key range cannot contain a source
    key carry into the new manifest untouched (same path entries)."""
    ledger.ledger_write(
        spark, root, _df(spark, [(i, "lo") for i in range(100)]).repartition(1)
    )
    ledger.ledger_merge_upsert(
        spark,
        root,
        _df(spark, [(i, "hi") for i in range(1000, 1100)]).repartition(1),
    )
    m2 = ledger._read_manifest(root, 2)
    # disjoint ranges: a later merge touching only the high range must
    # keep every low-range file entry byte-identical
    ledger.ledger_merge_upsert(
        spark, root, _df(spark, [(1050, "HI")]).repartition(1)
    )
    m3 = ledger._read_manifest(root, 3)
    lo_files_v2 = {e["path"] for e in m2["files"] if e["key_max"] is not None and e["key_max"] < 1000}
    lo_files_v3 = {e["path"] for e in m3["files"] if e["key_max"] is not None and e["key_max"] < 1000}
    assert lo_files_v2 and lo_files_v2 == lo_files_v3
    assert _rows(ledger.ledger_read(spark, root).filter(F.col("id") == 1050)) == [
        (1050, "HI")
    ]


def test_crashed_stage_is_invisible_and_vacuumable(spark, root):
    ledger.ledger_write(spark, root, _df(spark, [(1, "a")]))
    # simulate a writer that staged files, then died before commit
    orphans = ledger._stage_data_files(
        spark, root, _df(spark, [(7, "ghost")]), key="id"
    )
    assert orphans
    assert _rows(ledger.ledger_read(spark, root)) == [(1, "a")]  # invisible
    # young orphans survive vacuum (could be a live writer's stage)...
    deleted = ledger.ledger_vacuum(root, retain_versions=5, orphan_min_age_s=3600)
    assert deleted == []
    # ...aged orphans are collected
    deleted = ledger.ledger_vacuum(root, retain_versions=5, orphan_min_age_s=0.0)
    assert len(deleted) == len(orphans)
    assert _rows(ledger.ledger_read(spark, root)) == [(1, "a")]


def test_commit_race_detected_and_retried(spark, root):
    ledger.ledger_write(spark, root, _df(spark, [(1, "a")]))
    # another writer takes version 2 out from under this merge
    files = ledger._stage_data_files(spark, root, _df(spark, [(5, "x")]), "id")
    ledger._commit(root, 2, ledger._read_manifest(root, 1)["files"] + files, "id")
    with pytest.raises(ledger.ConcurrentCommitError):
        ledger._commit(root, 2, files, "id")
    # the high-level merge retries onto version 3 and lands on the NEW snapshot
    v = ledger.ledger_merge_upsert(spark, root, _df(spark, [(5, "X")]))
    assert v == 3
    assert _rows(ledger.ledger_read(spark, root)) == [(1, "a"), (5, "X")]


def test_vacuum_retention_window(spark, root):
    ledger.ledger_write(spark, root, _df(spark, [(1, "a")]))
    ledger.ledger_merge_upsert(spark, root, _df(spark, [(2, "b")]))
    ledger.ledger_merge_upsert(spark, root, _df(spark, [(3, "c")]))
    deleted = ledger.ledger_vacuum(root, retain_versions=2, orphan_min_age_s=0.0)
    assert deleted  # v1's manifest (and any unshared files) collected
    assert not os.path.exists(ledger._manifest_path(root, 1))
    # retained window fully readable
    assert len(_rows(ledger.ledger_read(spark, root, version=2))) == 2
    assert len(_rows(ledger.ledger_read(spark, root, version=3))) == 3


def test_compact_preserves_rows_and_snapshots(spark, root):
    for i in range(4):
        ledger.ledger_merge_upsert(spark, root, _df(spark, [(i, f"v{i}")]))
    before = _rows(ledger.ledger_read(spark, root))
    n_files_before = len(ledger._read_manifest(root, 4)["files"])
    v = ledger.ledger_compact(spark, root, target_files=1)
    assert v == 5
    m = ledger._read_manifest(root, 5)
    assert len(m["files"]) == 1 and n_files_before > 1
    assert _rows(ledger.ledger_read(spark, root)) == before
    # pre-compaction snapshot still readable
    assert _rows(ledger.ledger_read(spark, root, version=4)) == before


def test_ledger_diff_classifies_changes(spark, root):
    ledger.ledger_write(
        spark, root, _df(spark, [(1, "a"), (2, "b"), (3, "c")])
    )
    # v2: update 2, insert 4; v3: delete-like via... merges never delete,
    # so craft v3 manually: commit a manifest without key 1's file? Use
    # a full write instead (overwrite semantics = delete of missing keys)
    ledger.ledger_merge_upsert(spark, root, _df(spark, [(2, "B"), (4, "d")]))
    ledger.ledger_write(spark, root, _df(spark, [(2, "B"), (3, "c"), (4, "D")]))
    d12 = {
        (r["change_type"], r["id"]): r["val"]
        for r in ledger.ledger_diff(spark, root, 1, 2).collect()
    }
    assert d12 == {("update", 2): "B", ("insert", 4): "d"}
    d23 = {
        (r["change_type"], r["id"]): r["val"]
        for r in ledger.ledger_diff(spark, root, 2, 3).collect()
    }
    assert d23 == {("delete", 1): "a", ("update", 4): "D"}
    # no self-diff noise
    assert ledger.ledger_diff(spark, root, 3, 3).count() == 0


def test_write_race_detected_not_lost(spark, root, monkeypatch):
    """A commit landing while another writer stages must surface as
    ConcurrentCommitError — never be silently superseded (the lost-
    update bug class): the target version is pinned before staging."""
    real_stage = ledger._stage_data_files

    def stage_and_interleave(spark_, root_, df_, key, **kw):
        files = real_stage(spark_, root_, df_, key, **kw)
        # a second writer commits while we were staging
        other = real_stage(spark_, root_, _df(spark_, [(99, "other")]), key)
        ledger._commit(root_, ledger.current_version(root_) + 1, other, key)
        return files

    monkeypatch.setattr(ledger, "_stage_data_files", stage_and_interleave)
    with pytest.raises(ledger.ConcurrentCommitError):
        ledger.ledger_write(spark, root, _df(spark, [(1, "a")]))
    monkeypatch.setattr(ledger, "_stage_data_files", real_stage)
    # the interleaved commit's data is intact, not superseded
    assert _rows(ledger.ledger_read(spark, root)) == [(99, "other")]


def test_missing_stats_file_is_rewritten_not_skipped(spark, root):
    """A file with no usable key stats must be treated as overlapping
    (rewritten): skipping it would leave the old row beside the new one
    — a silent duplicate key."""
    ledger.ledger_write(spark, root, _df(spark, [(1, "a"), (2, "b")]))
    # blank out the stats as a stats-less legacy writer would
    m = ledger._read_manifest(root, 1)
    for e in m["files"]:
        e["key_min"] = None
        e["key_max"] = None
    import json as _json

    with open(ledger._manifest_path(root, 1), "w") as f:
        _json.dump(m, f)
    ledger.ledger_merge_upsert(spark, root, _df(spark, [(2, "B")]))
    out = ledger.ledger_read(spark, root)
    assert _rows(out) == [(1, "a"), (2, "B")]  # no duplicate key 2
    assert out.filter(F.col("id") == 2).count() == 1


def test_vacuum_collects_crashed_stage_dirs(spark, root):
    import os as _os

    ledger.ledger_write(spark, root, _df(spark, [(1, "a")]))
    # simulate a crash INSIDE staging: the _stage_* dir never got renamed
    stage = _os.path.join(root, "_stage_deadbeef")
    _os.makedirs(stage)
    with open(_os.path.join(stage, "part-0.parquet"), "wb") as f:
        f.write(b"partial")
    assert ledger.ledger_vacuum(root, orphan_min_age_s=3600.0) == []
    deleted = ledger.ledger_vacuum(root, orphan_min_age_s=0.0)
    assert stage in deleted and not _os.path.exists(stage)


def test_read_prune_skips_files_and_stays_exact(spark, root):
    """Manifest-level data skipping on read: a key-range predicate must
    plan a scan over ONLY the overlapping files (inputFiles shrinks) and
    still return exactly the matching rows."""
    # 4 disjoint single-file chunks: [0,99], [100,199], [200,299], [300,399]
    for lo in (0, 100, 200, 300):
        df = _df(spark, [(i, f"v{i}") for i in range(lo, lo + 100)]).repartition(1)
        if lo == 0:
            ledger.ledger_write(spark, root, df)
        else:
            ledger.ledger_merge_upsert(spark, root, df)
    full = ledger.ledger_read(spark, root)
    assert len(full.inputFiles()) == 4
    pruned = ledger.ledger_read(spark, root, prune={"id": (150, 160)})
    assert len(pruned.inputFiles()) == 1
    assert _rows(pruned) == [(i, f"v{i}") for i in range(150, 161)]
    # half-open bounds
    ge = ledger.ledger_read(spark, root, prune={"id": (300, None)})
    assert len(ge.inputFiles()) == 1 and ge.count() == 100
    # fully disjoint predicate: zero rows, schema preserved, no error
    empty = ledger.ledger_read(spark, root, prune={"id": (5000, 6000)})
    assert empty.count() == 0 and empty.columns == full.columns


def test_zorder_compact_enables_multicolumn_pruning(spark, root):
    """Z-order clustering: after OPTIMIZE-style compaction along (x, y),
    per-file manifest stats are tight on BOTH columns, so a point-range
    predicate on either column prunes most files — and results stay
    row-identical to the uncompacted snapshot."""
    import random

    rng = random.Random(7)
    rows = [
        (i, rng.randrange(0, 1000), rng.randrange(0, 1000))
        for i in range(4000)
    ]
    df = spark.createDataFrame(rows, "id long, x long, y long")
    ledger.ledger_write(spark, root, df.repartition(8))
    before = _rows(ledger.ledger_read(spark, root))
    v = ledger.ledger_compact(
        spark, root, target_files=16, zorder=["x", "y"]
    )
    after = _rows(ledger.ledger_read(spark, root, version=v))
    assert after == before  # clustering reorders, never changes rows
    m = ledger._read_manifest(root, v)
    assert m.get("stats_cols") == ["x", "y"]
    assert all("stats" in e for e in m["files"])
    # pruning now works on x AND y independently
    for col in ("x", "y"):
        pruned = ledger.ledger_read(spark, root, version=v, prune={col: (0, 99)})
        assert len(pruned.inputFiles()) < 16 // 2, (
            f"z-order should prune most files on {col}"
        )
        expect = sorted(r for r in before if 0 <= r[{"x": 1, "y": 2}[col]] <= 99)
        assert _rows(pruned) == expect


def test_zorder_stats_survive_later_merges(spark, root):
    """stats_cols persists in the manifest: a merge AFTER z-order
    compaction records x/y stats on its rewritten files too, so skipping
    keeps working as the table evolves."""
    rows = [(i, i % 100, (i * 7) % 100) for i in range(1000)]
    df = spark.createDataFrame(rows, "id long, x long, y long")
    ledger.ledger_write(spark, root, df.repartition(4))
    ledger.ledger_compact(spark, root, target_files=4, zorder=["x", "y"])
    v = ledger.ledger_merge_upsert(
        spark,
        root,
        spark.createDataFrame([(5, 50, 50)], "id long, x long, y long"),
    )
    m = ledger._read_manifest(root, v)
    assert m.get("stats_cols") == ["x", "y"]
    rewritten = [e for e in m["files"] if "stats" in e]
    assert rewritten, "merge-rewritten files must carry the extra stats"
    got = _rows(
        ledger.ledger_read(spark, root, version=v, prune={"id": (5, 5)})
    )
    assert got == [(5, 50, 50)]


def test_zorder_rejects_non_numeric_column(spark, root):
    ledger.ledger_write(spark, root, _df(spark, [(1, "a")]))
    with pytest.raises(TypeError, match="non-numeric"):
        ledger.ledger_compact(spark, root, zorder=["val"])


def test_restore_is_metadata_only_rollback(spark, root):
    """ledger_restore republishes an old file list as a new version:
    rows revert exactly, no data file is rewritten (same manifest
    paths), and history is preserved (the bad version stays readable)."""
    ledger.ledger_write(spark, root, _df(spark, [(1, "a"), (2, "b")]))
    ledger.ledger_merge_upsert(spark, root, _df(spark, [(2, "OOPS"), (3, "x")]))
    v1_rows = _rows(ledger.ledger_read(spark, root, version=1))
    v3 = ledger.ledger_restore(root, 1)
    assert v3 == 3
    assert _rows(ledger.ledger_read(spark, root)) == v1_rows
    m1 = ledger._read_manifest(root, 1)
    m3 = ledger._read_manifest(root, 3)
    assert [e["path"] for e in m3["files"]] == [e["path"] for e in m1["files"]]
    # the rolled-back version remains time-travelable
    assert (2, "OOPS") in _rows(ledger.ledger_read(spark, root, version=2))


def test_merge_with_added_column_widens_schema(spark, root):
    """Schema evolution: a merge whose source carries a NEW column
    widens the table; untouched old files stay as-is and read back NULL
    for the new column (mergeSchema union)."""
    ledger.ledger_write(
        spark, root, _df(spark, [(i, f"v{i}") for i in range(100)]).repartition(1)
    )
    wide = spark.createDataFrame(
        [(1000, "w", 42)], "id long, val string, extra long"
    )
    ledger.ledger_merge_upsert(spark, root, wide)
    out = ledger.ledger_read(spark, root)
    assert set(out.columns) == {"id", "val", "extra"}
    got = {r["id"]: r["extra"] for r in out.collect()}
    assert got[1000] == 42 and got[1] is None


def test_merge_across_widening_preserves_widened_values(spark, root):
    """Review-finding regression: a merge whose key range overlaps BOTH
    a pre-widening file and a post-widening file must rewrite the kept
    rows WITH their widened column values (the touched-files read needs
    mergeSchema or the widened column is silently dropped)."""
    ledger.ledger_write(
        spark,
        root,
        _df(spark, [(i, f"v{i}") for i in range(10)]).repartition(1),
    )
    wide = spark.createDataFrame(
        [(100, "w", 42), (101, "x", 43)], "id long, val string, extra long"
    )
    ledger.ledger_merge_upsert(spark, root, wide)
    # overlaps ids 0..101 → touches the old narrow file AND the wide one
    update = spark.createDataFrame([(0, "a0-new")], "id long, val string")
    ledger.ledger_merge_upsert(spark, root, update)
    got = {r["id"]: (r["val"], r["extra"]) for r in
           ledger.ledger_read(spark, root).collect()}
    assert got[100] == ("w", 42) and got[101] == ("x", 43)  # survived rewrite
    assert got[0] == ("a0-new", None)


def test_ledger_diff_across_widening_commit(spark, root):
    """CDC across the commit that evolved the schema: the old snapshot
    lacks 'extra'; the diff NULL-fills it instead of crashing."""
    ledger.ledger_write(spark, root, _df(spark, [(1, "a"), (2, "b")]))
    wide = spark.createDataFrame(
        [(2, "b2", 7), (3, "c", 9)], "id long, val string, extra long"
    )
    v2 = ledger.ledger_merge_upsert(spark, root, wide)
    diff = ledger.ledger_diff(spark, root, 1, v2)
    by = {(r["change_type"], r["id"]) for r in diff.collect()}
    assert ("insert", 3) in by
    assert ("update", 2) in by
    assert ("insert", 1) not in by and ("delete", 1) not in by


def test_all_pruned_read_keeps_widened_schema(spark, root):
    """Zero-match prune returns an empty frame with the FULL widened
    snapshot schema, whichever file the pruner would have kept."""
    ledger.ledger_write(
        spark, root, _df(spark, [(1, "a"), (2, "b")]).repartition(1)
    )
    wide = spark.createDataFrame(
        [(100, "w", 42)], "id long, val string, extra long"
    )
    ledger.ledger_merge_upsert(spark, root, wide)
    out = ledger.ledger_read(spark, root, prune={"id": (10_000, 20_000)})
    assert out.count() == 0
    assert set(out.columns) == {"id", "val", "extra"}


def test_zorder_compact_accepts_date_columns(spark, root):
    """Z-ordering by a date column (the most common time-clustering
    axis) must scale on epoch days instead of crashing on a
    date→double cast."""
    import datetime as dt

    rows = [
        (i, f"v{i}", dt.date(2024, 1, 1) + dt.timedelta(days=i % 30))
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, "id long, val string, d date")
    ledger.ledger_write(spark, root, df)
    ledger.ledger_compact(spark, root, zorder=["d", "id"], target_files=2)
    out = ledger.ledger_read(spark, root)
    assert out.count() == 40


# --- DELETE (GDPR / retention sweep) --------------------------------------


def test_delete_removes_matching_keeps_null_predicate_rows(spark, root):
    df = spark.createDataFrame(
        [(1, "a", 10), (2, "b", None), (3, "c", 99), (4, "d", 5)],
        "id long, val string, score int",
    )
    ledger.ledger_write(spark, root, df)
    v = ledger.ledger_delete(spark, root, F.col("score") > 50)
    assert v == 2
    got = _rows(ledger.ledger_read(spark, root))
    # row 3 (score 99) deleted; row 2 (NULL score) KEPT — SQL DELETE
    # null semantics
    assert [r[0] for r in got] == [1, 2, 4]
    # audit trail rides the manifest, atomic with the commit
    assert ledger._read_manifest(root, 2)["deleted_rows"] == 1


def test_delete_skips_untouched_files_and_time_travels(spark, root):
    # two disjoint key ranges -> separate files via two commits
    ledger.ledger_write(spark, root, _df(spark, [(1, "a"), (2, "b")]))
    ledger.ledger_merge_upsert(spark, root, _df(spark, [(100, "x"), (101, "y")]))
    before = {e["path"] for e in ledger._read_manifest(root, 2)["files"]}
    v = ledger.ledger_delete(spark, root, "id = 100")
    after = ledger._read_manifest(root, v)
    # low-range file(s) carried over byte-identical: their manifest
    # entries survive; only the high-range file was rewritten
    kept_paths = {e["path"] for e in after["files"]}
    assert any(p in kept_paths for p in before)
    assert _rows(ledger.ledger_read(spark, root)) == [
        (1, "a"),
        (2, "b"),
        (101, "y"),
    ]
    # deleted row is still visible at the old version (time travel);
    # hard erasure = vacuum after retention
    assert (100, "x") in _rows(ledger.ledger_read(spark, root, version=2))


def test_delete_noop_burns_no_version(spark, root):
    ledger.ledger_write(spark, root, _df(spark, [(1, "a")]))
    v = ledger.ledger_delete(spark, root, "id = 999")
    assert v == 1 and ledger.current_version(root) == 1


def test_delete_whole_file_drops_manifest_entry(spark, root):
    ledger.ledger_write(spark, root, _df(spark, [(1, "a"), (2, "b")]))
    ledger.ledger_merge_upsert(spark, root, _df(spark, [(100, "x")]))
    v = ledger.ledger_delete(spark, root, "id >= 100")
    files = ledger._read_manifest(root, v)["files"]
    assert all(e["rows"] > 0 for e in files)
    assert _rows(ledger.ledger_read(spark, root)) == [(1, "a"), (2, "b")]


def test_ledger_history_lists_versions_and_audit_fields(spark, root):
    ledger.ledger_write(spark, root, _df(spark, [(1, "a"), (2, "b")]))
    ledger.ledger_merge_upsert(spark, root, _df(spark, [(3, "c")]))
    ledger.ledger_delete(spark, root, "id = 2")
    hist = {r["version"]: r for r in ledger.ledger_history(spark, root).collect()}
    assert sorted(hist) == [1, 2, 3]
    assert hist[1]["n_rows"] == 2
    assert hist[2]["n_rows"] == 3
    assert hist[3]["n_rows"] == 2 and hist[3]["deleted_rows"] == 1
    assert all(r["key"] == "id" for r in hist.values())
    # commit times are monotone non-decreasing
    times = [hist[v]["committed_at"] for v in sorted(hist)]
    assert times == sorted(times)


def test_delete_works_under_percent_encoded_roots(spark, tmp_path):
    """Regression (r4): input_file_name() returns a percent-encoded
    Hadoop URI — a table root containing spaces used to make the
    delete probe match zero manifest paths and fail on an empty
    parquet read. The probe now URL-decodes before comparing."""
    from pyspark.sql import Row

    from mtg_bulk_database_spark.ingest.ledger import (
        ledger_delete,
        ledger_merge_upsert,
        ledger_read,
    )

    root = str(tmp_path / "with space" / "tbl")
    src = spark.createDataFrame([Row(id=i, v=f"v{i}") for i in range(6)])
    ledger_merge_upsert(spark, root, src, key="id")
    v = ledger_delete(spark, root, "id >= 4")
    assert v == 2
    assert sorted(
        r["id"] for r in ledger_read(spark, root).collect()
    ) == [0, 1, 2, 3]
