"""IVF maintenance honesty gate (VERDICT r10 #6): the drift report
over durable vector artifacts must FLAG a planted drift — increments
that pile into one list with growing quantization error — and stay
quiet on a balanced, drift-free history."""

from __future__ import annotations

from pyspark.sql import functions as F

from mtg_bulk_database_spark.ingest import artifacts as A
from mtg_bulk_database_spark.pipeline_queries16 import ivf_drift_report

_CENTS = [[1.0, 0.0], [0.0, 1.0]]


def _emb(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id bigint, embedding array<double>"
    )


def _steps(asg, step_map):
    m = F.create_map(
        *[F.lit(x) for kv in step_map.items() for x in kv]
    )
    return asg.select(
        "vec_id",
        F.col("list_id").cast("long").alias("list_id"),
        "embedding",
        m[F.col("vec_id")].cast("long").alias("step"),
    )


def test_planted_drift_is_flagged(spark, tmp_path):
    root = str(tmp_path / "ivf")
    # base: balanced, near the centroids (tiny quantization error)
    base = _emb(spark, [
        (1, [1.0, 0.02]), (2, [1.0, -0.02]),
        (3, [0.02, 1.0]), (4, [-0.02, 1.0]),
    ])
    A.build_vector_artifacts(spark, base, root, centroids=_CENTS)
    # two increments of progressively drifted vectors: all land in
    # list 1 with growing angle to its centroid
    A.refresh_vectors(spark, root, _emb(spark, [
        (101, [0.3, 1.0]), (102, [0.35, 1.0]),
    ]))
    A.refresh_vectors(spark, root, _emb(spark, [
        (201, [0.7, 1.0]), (202, [0.75, 1.0]),
        (203, [0.8, 1.0]), (204, [0.72, 1.0]),
    ]))
    step_map = {1: 0, 2: 0, 3: 0, 4: 0, 101: 1, 102: 1,
                201: 2, 202: 2, 203: 2, 204: 2}
    rep = {
        (r["step"], r["list_id"]): r
        for r in ivf_drift_report(
            _steps(A.read_ivf_assignments(spark, root), step_map),
            _CENTS,
            err_threshold_micro=5000,
            share_cap_micro=600_000,
        ).collect()
    }
    # base: balanced (500000 micro each), near-zero error, no flags
    assert rep[(0, 0)]["share_micro"] == 500_000
    assert rep[(0, 0)]["retrain"] == 0 and rep[(0, 1)]["retrain"] == 0
    assert rep[(0, 1)]["mean_err_micro"] < 1000
    # list 0 never drifts (no increments land there)
    assert rep[(2, 0)]["retrain"] == 0
    assert rep[(2, 0)]["err_drift_micro"] == 0
    # list 1 accumulates the drifted vectors: error drift grows
    # monotonically and step 2 breaches BOTH thresholds
    assert rep[(1, 1)]["err_drift_micro"] > rep[(0, 1)]["err_drift_micro"]
    assert rep[(2, 1)]["err_drift_micro"] > rep[(1, 1)]["err_drift_micro"]
    assert rep[(2, 1)]["err_drift_micro"] > 5000
    assert rep[(2, 1)]["share_micro"] > 600_000
    assert rep[(2, 1)]["retrain"] == 1


def test_no_drift_no_flags(spark, tmp_path):
    """Increments drawn from the SAME distribution as the base leave
    every flag down — the report doesn't cry wolf."""
    root = str(tmp_path / "ivf")
    base = _emb(spark, [
        (1, [1.0, 0.05]), (2, [1.0, -0.05]),
        (3, [0.05, 1.0]), (4, [-0.05, 1.0]),
    ])
    A.build_vector_artifacts(spark, base, root, centroids=_CENTS)
    A.refresh_vectors(spark, root, _emb(spark, [
        (101, [1.0, 0.04]), (102, [0.04, 1.0]),
    ]))
    A.refresh_vectors(spark, root, _emb(spark, [
        (201, [1.0, -0.04]), (202, [-0.04, 1.0]),
    ]))
    step_map = {1: 0, 2: 0, 3: 0, 4: 0, 101: 1, 102: 1, 201: 2, 202: 2}
    rep = ivf_drift_report(
        _steps(A.read_ivf_assignments(spark, root), step_map), _CENTS
    )
    assert rep.agg(F.sum("retrain")).first()[0] == 0
