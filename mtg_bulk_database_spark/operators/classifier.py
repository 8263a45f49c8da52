"""Distributed logistic-regression quality classifier.

Web-scale curation pipelines (CCNet, Gopher, DCLM) gate documents with
a cheap learned quality model: hand-built columnar features → a linear
classifier trained against weak labels (e.g. "looks like a reference
corpus") → a per-document keep probability. The reference has no
learned component at all (its entire quality surface is the layout
whitelist, ``import_cards.py:186-189``); this module adds the learned
gate as an ENGINE operator so training and scoring both run on the
cluster.

Execution model (the part that must survive 100 TB):

- **Training is full-batch gradient descent, ONE aggregate job per
  iteration.** The weight vector (a handful of floats) lives on the
  driver and is folded into the next iteration's expression tree as
  literals — the classic "broadcast scalar model" loop. Each iteration
  scans the training frame once and reduces to |features|+1 numbers;
  nothing wider ever moves. At 100 TB you train on a deterministic
  hash-sample (``sampling.hash_sample``) and score everything — the
  sample/score split is the caller's one decision.
- **Scoring is pure codegen'd projection** — no UDF, no shuffle, no
  state: sigmoid(w·x) inlined as built-in expressions.
- **Determinism regardless of partitioning:** the per-iteration
  gradient sums cast each per-row term to ``DECIMAL(28,14)`` before
  summing (the repo's decimal-cast-sum rule), so partial-aggregation
  order cannot perturb the trained weights; two runs on any cluster
  layout produce bit-identical models. (Cross-ENGINE exactness is out
  of scope — training is iterative and has no SQL twin; the registry
  entry is a rows-only gate by design, with the invariants pinned in
  ``tests/test_classifier.py``.)

Feature engineering stays in ``text_analysis`` (stopword ratio, alpha
ratio, token counts); this module is deliberately feature-agnostic.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: decimal type for gradient partial sums: 14 fractional digits, 14
#: integral — exact for |term| ≤ 1e14 with per-row truncation error
#: ≤ 5e-15, deterministic under any aggregation order.
_GRAD_DECIMAL = "decimal(28,14)"


def _margin(feature_cols: list[str], weights: list[float]) -> Column:
    """w₀ + Σ wᵢ·xᵢ as one codegen'd expression (w₀ = intercept)."""
    m: Column = F.lit(weights[0])
    for c, w in zip(feature_cols, weights[1:]):
        m = m + F.lit(w) * F.col(c).cast("double")
    return m


def sigmoid(x: Column) -> Column:
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-x))


def train_logreg(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    lr: float = 2.0,
    iters: int = 40,
    l2: float = 0.0,
) -> list[float]:
    """Full-batch GD for logistic regression; returns
    ``[intercept, w_1, …, w_d]``.

    One Spark job per iteration: the gradient of the mean log-loss,
    ``(1/n) Σ (σ(w·x) − y)·x`` (+ l2·w), computed as |features|+1
    decimal-cast sums. Rows with a NULL label or NULL feature are
    excluded up front (a learned gate must not train on undefined
    examples). Raises on an empty training frame.
    """
    cond = F.col(label_col).isNotNull()
    for c in feature_cols:
        cond = cond & F.col(c).isNotNull()
    base = df.where(cond).select(
        F.col(label_col).cast("double").alias("_y"),
        *[F.col(c).cast("double").alias(c) for c in feature_cols],
    )
    # cache: every iteration re-scans this projection
    base = base.persist()
    try:
        n = base.count()
        if n == 0:
            raise ValueError("train_logreg: empty training frame")
        w = [0.0] * (len(feature_cols) + 1)
        for _ in range(iters):
            resid = sigmoid(_margin(feature_cols, w)) - F.col("_y")
            terms = [resid.cast(_GRAD_DECIMAL).alias("_g0")] + [
                (resid * F.col(c))
                .cast(_GRAD_DECIMAL)
                .alias(f"_g{i + 1}")
                for i, c in enumerate(feature_cols)
            ]
            sums = base.select(*terms).agg(
                *[
                    F.sum(f"_g{i}").alias(f"_g{i}")
                    for i in range(len(w))
                ]
            ).collect()[0]
            for i in range(len(w)):
                g = float(sums[f"_g{i}"]) / n + l2 * w[i]
                w[i] -= lr * g
        return w
    finally:
        base.unpersist()


def score_logreg(
    df: DataFrame,
    feature_cols: list[str],
    weights: list[float],
    out_col: str = "quality_p",
) -> DataFrame:
    """σ(w·x) as a codegen'd column — NULL features give a NULL score
    (never a silent 0.5)."""
    return df.withColumn(
        out_col, sigmoid(_margin(feature_cols, weights))
    )


def log_loss(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    weights: list[float],
) -> float:
    """Mean log-loss of ``weights`` on ``df`` (one aggregate job) —
    the training-progress metric the tests pin as decreasing."""
    p = sigmoid(_margin(feature_cols, weights))
    y = F.col(label_col).cast("double")
    eps = F.lit(1e-12)
    term = -(
        y * F.log(p + eps) + (F.lit(1.0) - y) * F.log(F.lit(1.0) - p + eps)
    )
    row = df.agg(
        F.avg(term).alias("_loss"), F.count("*").alias("_n")
    ).collect()[0]
    if row["_n"] == 0:
        return math.nan
    return float(row["_loss"])
