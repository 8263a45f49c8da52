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


#: largest supported weight exponent: weights are the power-of-two
#: classes 2^0 .. 2^_MAX_WEIGHT_LOG2 (see aes_score for why classes).
_MAX_WEIGHT_LOG2 = 6

#: 2^60 as an exact double — md5_60's range; division by a power of two
#: only adjusts the exponent, so u = (m+1)/2^60 is the SAME double in
#: every IEEE engine.
_TWO_60 = float(1 << 60)


def aes_uniform(key: Column) -> Column:
    """Content-hash uniform u ∈ (0, 1]: (md5₆₀(key)+1) / 2⁶⁰.

    The +1 excludes u=0 (whose A-ES score would tie across all weights)
    and the power-of-two divisor makes the quotient exponent-shift
    exact, so u is bit-identical in Spark and DuckDB for the same
    UTF-8 key."""
    from .dedup import md5_60

    return (md5_60(key) + F.lit(1)).cast("double") / F.lit(_TWO_60)


def aes_score(key: Column, weight_log2: Column) -> Column:
    """Efraimidis–Spirakis weighted-sampling score u^(1/w) for the
    power-of-two weight w = 2^j, computed as j ITERATED SQUARE ROOTS of
    the content-hash uniform — not ``pow(u, 1/w)``.

    Why weight classes instead of continuous weights: ``pow``/``ln``
    are not correctly-rounded in IEEE 754 and differ across libm
    implementations, so a pow-based score can order two rows
    differently on two engines; ``sqrt`` IS correctly-rounded
    everywhere, so u^(1/2^j) = sqrt∘…∘sqrt(u) is bit-identical in
    Spark and DuckDB and the sample is engine-exact. Power-of-two
    classes (1,2,4,…,64) are how corpus mixing actually weights
    sources (quality tiers), not a real loss of generality.

    A-ES semantics: drawing the k largest scores samples k items
    without replacement with inclusion probability increasing in w
    (exactly proportional for k=1). j ≤ 0 → score = u (weight 1);
    j > _MAX_WEIGHT_LOG2 clamps to the largest class.
    """
    u = aes_uniform(key)
    expr = F.when(weight_log2 <= 0, u)
    s = u
    for j in range(1, _MAX_WEIGHT_LOG2 + 1):
        s = F.sqrt(s)
        if j < _MAX_WEIGHT_LOG2:
            expr = expr.when(weight_log2 == j, s)
    return expr.otherwise(s)


def sql_aes_score(key_sql: str, weight_log2_sql: str) -> str:
    """DuckDB twin of :func:`aes_score` (shared builder so query and
    oracle can never drift): same md5₆₀ uniform, same iterated-sqrt
    CASE ladder."""
    u = (
        f"((('0x' || substr(md5(CAST({key_sql} AS VARCHAR)), 1, 15))::BIGINT"
        f" + 1)::DOUBLE / {int(_TWO_60)}.0)"
    )
    arms = []
    s = u
    for j in range(1, _MAX_WEIGHT_LOG2 + 1):
        s = f"sqrt({s})"
        if j < _MAX_WEIGHT_LOG2:
            arms.append(f"WHEN ({weight_log2_sql}) = {j} THEN {s}")
    arms_sql = " ".join(arms)
    return (
        f"(CASE WHEN ({weight_log2_sql}) <= 0 THEN {u} "
        f"{arms_sql} ELSE {s} END)"
    )


def weighted_hash_topk(
    df: DataFrame,
    k: int,
    key_col: str,
    weight_log2_col: str,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Deterministic weighted sampling without replacement (A-ES): keep
    the k rows with the largest ``aes_score`` — per group when
    ``group_cols`` is given, else globally.

    Scale shape: grouped → one ``row_number`` window shuffled on the
    group keys (rank predicate applies streamingly, only winners
    materialize past the filter). Global → ``orderBy().limit(k)``,
    which Spark plans as TakeOrderedAndProject: per-partition top-k
    heaps merged on the driver, never a single-partition sort. NULL
    keys are excluded (md5(NULL) is NULL and the two engines order
    NULL scores differently); callers wanting them must coalesce.
    """
    from pyspark.sql import Window

    score = aes_score(F.col(key_col), F.col(weight_log2_col))
    scored = df.filter(F.col(key_col).isNotNull()).withColumn(
        "aes_score", score
    )
    if group_cols:
        w = Window.partitionBy(*group_cols).orderBy(
            F.col("aes_score").desc(), F.col(key_col)
        )
        return scored.withColumn(
            "sample_rank", F.row_number().over(w)
        ).filter(F.col("sample_rank") <= k)
    return scored.orderBy(
        F.col("aes_score").desc(), F.col(key_col)
    ).limit(k)


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


#: cumulative Poisson(1) CDF thresholds for k = 0..6 (computed once
#: with python floats; the literals are what both engines compare
#: against, so the inverse-CDF ladder is identical everywhere).
#: Tail mass beyond k=7 is < 1e-4 — the ladder clamps there.
_POISSON1_CDF = (
    0.36787944117144233,
    0.7357588823428847,
    0.9196986029286058,
    0.9810118431238463,
    0.9963401531726563,
    0.9994058151824183,
    0.999916758850712,
)


#: replicates carved from ONE md5: 32 hex chars = 8 slices of 4 hex
#: = 8 independent 16-bit uniforms. Resolution 1/65536 quantizes the
#: Poisson probabilities by < 1.6e-5 each (immaterial for a bootstrap)
#: and buys an 8x cheaper hash stage (B replicates cost ceil(B/8) md5
#: calls per row, not B).
_SLICES_PER_MD5 = 8


def poisson1_weight(key: Column, salt: str, slice_idx: int = 0) -> Column:
    """Deterministic Poisson(1) bootstrap weight: a 16-bit uniform cut
    from hex slice ``slice_idx`` of md5(key ':' salt), pushed through
    the inverse-CDF CASE ladder. This is the Poisson bootstrap (the
    resampling scheme that needs no global count — each row draws its
    own multiplicity independently), made engine-replayable: the same
    row gets the same weight in the same replicate on any cluster or
    engine, and eight replicates share one md5 evaluation."""
    if not 0 <= slice_idx < _SLICES_PER_MD5:
        raise ValueError(f"slice_idx must be in [0, 8), got {slice_idx}")
    h = F.md5(F.concat(key.cast("string"), F.lit(":" + salt)))
    u = (
        F.conv(F.substring(h, slice_idx * 4 + 1, 4), 16, 10).cast("long")
        + F.lit(1)
    ).cast("double") / F.lit(65536.0)
    w: Column = F.lit(len(_POISSON1_CDF))
    for k in range(len(_POISSON1_CDF) - 1, -1, -1):
        w = F.when(u < F.lit(_POISSON1_CDF[k]), F.lit(k)).otherwise(w)
    return w


def sql_poisson1_weight(key_sql: str, salt: str, slice_idx: int = 0) -> str:
    """DuckDB twin of :func:`poisson1_weight` — same literals, same
    slice, same ladder order."""
    u = (
        f"((('0x' || substr(md5(CAST({key_sql} AS VARCHAR) || ':{salt}'),"
        f" {slice_idx * 4 + 1}, 4))::BIGINT + 1)::DOUBLE / 65536.0)"
    )
    arms = " ".join(
        f"WHEN {u} < {c!r} THEN {k}"
        for k, c in enumerate(_POISSON1_CDF)
    )
    return f"(CASE {arms} ELSE {len(_POISSON1_CDF)} END)"
