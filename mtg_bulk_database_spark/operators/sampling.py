"""Deterministic sampling operators for corpus curation.

Spark's built-in ``df.sample``/``sampleBy`` draw from a per-partition
RNG: results change with partitioning, retries, and engines — unusable
when a training run must be reproducible and auditable. These operators
sample by CONTENT HASH instead: a row's membership is a pure function of
its key, so the same corpus yields the same sample on any cluster, any
partitioning, any engine (md5 is portable; xxhash64 seeds differ across
engines).

Scale shape: sampling is a stateless filter on a hash expression —
codegen'd, no shuffle, pushes the surviving-fraction reduction below
every downstream shuffle. The hex-prefix bucket comparison is
LEXICOGRAPHIC on the first 4 md5 hex chars (65536 buckets), the same
trick the deterministic train/val/test split uses
(text_analysis.with_train_split).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: bucket-space resolution: 4 hex chars = 65536 buckets → fraction
#: granularity 1/65536 ≈ 0.0015%.
_BUCKETS = 65536


def fraction_threshold(fraction: float) -> str:
    """Hex threshold such that P(md5-prefix < threshold) ≈ fraction.

    fraction ≥ 1.0 callers keep all rows OUTSIDE the bucket predicate
    (a strict ``< 'ffff'`` comparison can never cover the last bucket);
    both operators here do exactly that."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    return format(min(int(fraction * _BUCKETS), _BUCKETS - 1), "04x")


def sample_bucket(key: Column) -> Column:
    """65536-way deterministic bucket: first 4 hex chars of md5(key)."""
    return F.substring(F.md5(key.cast("string")), 1, 4)


def hash_sample(
    df: DataFrame, fraction: float, key_col: str
) -> DataFrame:
    """Keep ≈``fraction`` of rows, chosen by key hash — reproducible on
    any engine/partitioning. fraction=1.0 keeps everything."""
    if fraction >= 1.0:
        return df
    return df.filter(sample_bucket(F.col(key_col)) < fraction_threshold(fraction))


def stratified_hash_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    key_col: str,
    default_fraction: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sampling — the corpus-mixing primitive
    (e.g. keep 100% of wiki, 10% of crawl). Unlisted strata get
    ``default_fraction``. One codegen'd CASE over the hash bucket; no
    shuffle, no RNG.
    """
    thresh = None
    for value, frac in sorted(fractions.items()):
        cond = F.col(strata_col) == value
        lit = F.lit(fraction_threshold(frac))
        thresh = F.when(cond, lit) if thresh is None else thresh.when(cond, lit)
    thresh = (
        thresh.otherwise(F.lit(fraction_threshold(default_fraction)))
        if thresh is not None
        else F.lit(fraction_threshold(default_fraction))
    )
    keep_all = None
    for value, frac in sorted(fractions.items()):
        if frac >= 1.0:
            cond = F.col(strata_col) == value
            keep_all = cond if keep_all is None else (keep_all | cond)
    bucket_keep = sample_bucket(F.col(key_col)) < thresh
    if keep_all is not None:
        bucket_keep = keep_all | bucket_keep
    return df.filter(bucket_keep)


def sql_sample_predicate(
    strata_col: str, fractions: dict[str, float], key_col: str, default_fraction: float = 0.0
) -> str:
    """DuckDB twin of :func:`stratified_hash_sample`'s predicate (shared
    so query and oracle can never drift)."""
    arms = " ".join(
        f"WHEN '{v}' THEN '{fraction_threshold(f)}'"
        for v, f in sorted(fractions.items())
    )
    full = [f"{strata_col} = '{v}'" for v, f in sorted(fractions.items()) if f >= 1.0]
    pred = (
        f"substr(md5({key_col}::VARCHAR), 1, 4) < "
        f"(CASE {strata_col} {arms} ELSE '{fraction_threshold(default_fraction)}' END)"
    )
    if full:
        pred = f"(({' OR '.join(full)}) OR {pred})"
    return pred


def temperature_mix(
    df: DataFrame,
    source_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    budget_frac: float = 0.5,
) -> DataFrame:
    """Temperature-scaled source mixing (α-sampling with α = 0.5, the
    multilingual-pretraining recipe): a total budget of
    ``floor(budget_frac · N)`` documents is allocated across sources in
    proportion to ``count(source)^α`` instead of raw counts, flattening
    the head sources and boosting the tail; within each source the
    winners are chosen by the same content-hash lottery as the quota
    cap (q97) — deterministic, partitioning- and engine-independent.

    Engine-exactness: source weights are ``floor(sqrt(n_s) · 1e6)``
    BIGINTs (sqrt is IEEE correctly-rounded in every engine, floor is
    exact), their sum is an exact integer, and each per-source target
    is one identical double expression ``floor((w · B) / denom)``.

    Scale shape: the allocation table is |sources| rows — computed with
    two tiny aggregates and broadcast back onto the corpus; the only
    corpus-wide cost is the per-source rank window (one shuffle on
    ``source_col``; a heavily skewed head source is the documented
    salting case). Sources whose α-boosted target exceeds their actual
    count keep every row (no upsampling here — repetition policy
    belongs to the sequence-packing stage).

    Returns kept rows: ``id_col, source_col, mix_rank, source_target``.
    """
    from pyspark.sql import Window

    counts = df.groupBy(source_col).agg(F.count("*").alias("n_s"))
    w_micro = F.floor(F.sqrt(F.col("n_s")) * F.lit(1000000.0))
    weights = counts.withColumn("w_micro", w_micro)
    denom = weights.agg(
        F.sum("w_micro").alias("denom"), F.sum("n_s").alias("n_total")
    )
    budget = F.floor(F.col("n_total") * F.lit(budget_frac))
    targets = (
        weights.crossJoin(F.broadcast(denom))
        .withColumn(
            "source_target",
            F.floor(
                (F.col("w_micro").cast("double") * budget)
                / F.col("denom").cast("double")
            ),
        )
        .select(source_col, "source_target")
    )
    rank_w = Window.partitionBy(source_col).orderBy(
        F.md5(F.coalesce(F.col(text_col), F.lit(""))), F.col(id_col)
    )
    ranked = df.withColumn("mix_rank", F.row_number().over(rank_w))
    return (
        ranked.join(F.broadcast(targets), on=source_col)
        .filter(F.col("mix_rank") <= F.col("source_target"))
        .select(id_col, source_col, "mix_rank", "source_target")
    )
