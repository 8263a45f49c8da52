"""Invariants for the ingest drift monitor (q204): PSI is zero for
identical snapshots, responds to a planted shift, and groups present
in one snapshot only still appear (appearance IS drift). Value-level
parity is the q204 DuckDB gate + fuzz legs."""

from __future__ import annotations

from pyspark.sql import functions as F

from mtg_bulk_database_spark.operators.drift import drift_report

BOUNDS = [10.0, 20.0, 40.0]


def test_identical_snapshots_zero_drift(spark):
    df = spark.createDataFrame(
        [("s", float(i % 50)) for i in range(200)], "g string, v double"
    )
    r = drift_report(df, df, "g", "v", BOUNDS).collect()[0]
    assert r["psi"] == 0.0
    assert r["count_ratio"] == 1.0
    assert r["null_rate_a"] == r["null_rate_b"] == 0.0


def test_planted_shift_raises_psi(spark):
    a = spark.createDataFrame(
        [("s", 5.0)] * 100 + [("s", 15.0)] * 100, "g string, v double"
    )
    b = spark.createDataFrame(
        [("s", 5.0)] * 20 + [("s", 50.0)] * 180, "g string, v double"
    )
    drifted = drift_report(a, b, "g", "v", BOUNDS).collect()[0]
    stable = drift_report(a, a, "g", "v", BOUNDS).collect()[0]
    assert stable["psi"] < 0.1 <= drifted["psi"]  # alarm-level shift


def test_one_sided_group_appears(spark):
    a = spark.createDataFrame([("old", 1.0)], "g string, v double")
    b = spark.createDataFrame([("new", 1.0)], "g string, v double")
    rows = {r["g"]: r for r in drift_report(a, b, "g", "v", BOUNDS).collect()}
    assert rows["old"]["n_b"] == 0 and rows["old"]["count_ratio"] == 0.0
    assert rows["new"]["n_a"] == 0 and rows["new"]["count_ratio"] is None


def test_null_values_counted_not_bucketed(spark):
    a = spark.createDataFrame(
        [("s", None), ("s", 5.0), ("s", 5.0), ("s", None)],
        "g string, v double",
    )
    r = drift_report(a, a, "g", "v", BOUNDS).collect()[0]
    assert r["null_rate_a"] == 0.5 and r["psi"] == 0.0


def test_streamed_drift_counts_equal_batch(spark, tmp_path):
    """r6: the drift monitor's streaming leg — per-micro-batch
    conditional-count frames SUM-merged across batches must feed
    drift_report_from_counts to the BITWISE-same report as the batch
    drift_report over the whole snapshots (counts are the monitor's
    mergeable sketch; batch=<id> overwrite keeps replays idempotent)."""
    from mtg_bulk_database_spark.operators.drift import (
        _bucket_counts,
        drift_report_from_counts,
    )
    from mtg_bulk_database_spark.streaming.ingest import (
        stream_fold_drift_counts,
    )

    rows_a = [("g1", float(i % 60)) for i in range(150)] + [
        ("g2", None)
    ] * 10 + [("g2", 25.0)] * 40
    rows_b = [("g1", float((i * 7) % 80)) for i in range(120)] + [
        ("g3", 5.0)
    ] * 30
    a = spark.createDataFrame(rows_a, "g string, v double")
    b = spark.createDataFrame(rows_b, "g string, v double")

    # new snapshot arrives as a STREAM in 3 files
    src = tmp_path / "src"
    b.repartition(3).write.parquet(str(src))

    merged_b = stream_fold_drift_counts(
        spark,
        str(src),
        str(tmp_path / "state"),
        str(tmp_path / "ckpt"),
        "g",
        "v",
        BOUNDS,
        prefix="b",
        schema="g string, v double",
    )
    ref_a = _bucket_counts(a, "g", "v", BOUNDS, "a")
    streamed = sorted(
        drift_report_from_counts(
            ref_a, merged_b, "g", len(BOUNDS) + 1
        ).collect()
    )
    batch = sorted(drift_report(a, b, "g", "v", BOUNDS).collect())
    assert streamed == batch
    assert {r["g"] for r in streamed} == {"g1", "g2", "g3"}
