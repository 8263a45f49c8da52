"""Mergeable-sketch operators: the bounded-memory frequency path.

Exact per-token counts (q100) are a fine Spark aggregation at any
scale — partial aggregation bounds the shuffle by the number of
DISTINCT keys. The sketch path matters when even the distinct-key set
is too large to keep (open-vocabulary n-grams, URL tails) or when
counts must stream with O(1) state: a count-min sketch (Cormode &
Muthukrishnan 2005) is a d×w counter matrix whose cells are pure
SUM aggregates — trivially distributed, mergeable across batches by
element-wise addition, and stored as a (d·w)-row DataFrame rather than
an opaque binary, so estimation is a JOIN any engine can run.

Guarantees: estimate ≥ true count always (counters only over-count on
collision); estimate ≤ true + εN with probability 1−δ for
w = ⌈e/ε⌉, d = ⌈ln 1/δ⌉.

Row hashing uses ``xxhash64(value, row_index)`` — 64-bit, seeded per
sketch row, JVM-side codegen; ``pmod`` keeps bucket indexes
non-negative. Deterministic across partitioning and cluster size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CMS_DEPTH = 5
CMS_WIDTH = 1024


def _cms_bucket(col: str, i, width: int, portable: bool):
    """Row-seeded bucket hash.  Default: xxhash64(value, row) — fastest
    JVM path.  Portable: md5 of the ``'<row>:<value>'`` string via
    ``dedup.md5_60`` — reproducible in any engine with md5(), which is
    what gives q179 its value-hash oracle (q116's xxhash64 cells are
    opaque to DuckDB)."""
    if not portable:
        return F.pmod(F.xxhash64(F.col(col), i), F.lit(width)).cast("int")
    from .dedup import md5_60

    return F.pmod(
        md5_60(F.concat_ws(":", i.cast("string"), F.col(col))),
        F.lit(width),
    ).cast("int")


def cms_build(
    df: DataFrame,
    col: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
    portable: bool = False,
) -> DataFrame:
    """Build the sketch: one row per (sketch_row, bucket) with the
    collision-summed count. One explode (×depth) + one groupBy — the
    shuffle carries at most d·w distinct keys no matter the input
    size. Output: ``row_idx, bucket, cnt``."""
    rows = df.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(depth - 1)),
                lambda i: F.struct(
                    i.cast("int").alias("row_idx"),
                    _cms_bucket(col, i, width, portable).alias("bucket"),
                ),
            )
        ).alias("_cell")
    )
    return (
        rows.select("_cell.row_idx", "_cell.bucket")
        .groupBy("row_idx", "bucket")
        .agg(F.count("*").alias("cnt"))
    )


def cms_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Element-wise addition — the mergeability that makes the sketch
    an incremental ingest artifact (per-batch sketches fold into the
    corpus sketch without touching history)."""
    return (
        a.unionByName(b)
        .groupBy("row_idx", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    col: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
    portable: bool = False,
) -> DataFrame:
    """Point-estimate counts for ``keys[col]``: re-hash each key into
    its d cells, join the sketch (d·w rows — broadcast), take the MIN
    cell. Missing cells count 0 (no item hashed there at all).
    Output: ``keys.* , est_count``.  ``portable`` must match the
    sketch's build flag — the probe re-derives the same cells."""
    probes = keys.select(
        "*",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(depth - 1)),
                lambda i: _cms_bucket(col, i, width, portable),
            )
        ).alias("row_idx", "bucket"),
    )
    joined = probes.join(
        F.broadcast(sketch), on=["row_idx", "bucket"], how="left"
    ).withColumn("cnt", F.coalesce("cnt", F.lit(0)))
    key_cols = [c for c in keys.columns]
    return joined.groupBy(*key_cols).agg(F.min("cnt").alias("est_count"))


# ---------------------------------------------------------------------------
# Portable HyperLogLog: engine-exact registers AND estimate.
# ---------------------------------------------------------------------------

HLL_P = 12  # 2^12 registers — the Flajolet et al. 2007 default scale


def _hll_consts(p: int):
    m = 1 << p
    w_bits = 60 - p  # md5_60 yields 60 hash bits; top p select the register
    alpha = 0.7213 / (1.0 + 1.079 / m)
    # scale the harmonic sum by 2^(w_bits+1): every 2^-M term becomes the
    # INTEGER 2^(w_bits+1-M), so the register fold is an exact int64 SUM —
    # no float addition order anywhere (sum <= m * 2^(w_bits+1) < 2^62)
    scale = 1 << (w_bits + 1)
    return m, w_bits, alpha, scale


def hll_portable(
    df: DataFrame, group_col: str, col: str, p: int = HLL_P
) -> DataFrame:
    """Per-group HLL distinct estimate built from first principles on
    the engine-portable base hash (``dedup.md5_60``), designed so a
    DuckDB twin reproduces it BIT-FOR-BIT — unlike the Datasketches /
    approx_count_distinct paths (q115/q72), whose xxhash-family
    sketches no other engine can replay:

    - register index = top ``p`` hash bits; rho = leading-zero count of
      the remaining ``60-p`` bits + 1, via a generated integer CASE
      ladder (no float log2 near power-of-two boundaries);
    - the harmonic sum folds as an EXACT int64 (2^-M terms scaled to
      integers), so groupBy order cannot perturb the estimate;
    - the only float ops are one division, one optional ln, and the
      final round(4) that absorbs libm-vs-JVM last-ulp differences.

    Mergeable the standard way (max over register rows); the register
    frame (group, idx, M) is the ingest artifact, this returns the
    scalar per-group estimate ``(group_col, est_distinct)``.
    """
    regs = hll_portable_registers(df, group_col, col, p)
    return hll_estimate_from_registers(regs, group_col, p)


def hll_portable_registers(
    df: DataFrame, group_col: str, col: str, p: int = HLL_P
) -> DataFrame:
    """The sketch STATE: per-(group, register) max-rho rows — the
    mergeable half of :func:`hll_portable` (merge = MAX per register,
    associative/commutative/idempotent, so batch boundaries and replays
    cannot change the union sketch). This is the frame to persist as an
    ingest artifact or fold from a stream."""
    from .dedup import md5_60

    m, w_bits, alpha, scale = _hll_consts(p)
    h = md5_60(F.col(col))
    idx = F.shiftright(h, w_bits)
    w = h.bitwiseAND(F.lit((1 << w_bits) - 1))
    rho = F.lit(w_bits + 1)  # w == 0: all bits zero
    for r in range(w_bits, 0, -1):  # w >= 2^(w_bits-r) → rho = r
        rho = F.when(w >= (1 << (w_bits - r)), F.lit(r)).otherwise(rho)
    return (
        df.select(F.col(group_col), idx.alias("idx"), rho.alias("rho"))
        .groupBy(group_col, "idx")
        .agg(F.max("rho").alias("M"))
    )


def hll_estimate_from_registers(
    regs: DataFrame, group_col: str, p: int = HLL_P
) -> DataFrame:
    """Scalar per-group estimate from the register frame — the exact
    arithmetic documented on :func:`hll_portable`."""
    m, w_bits, alpha, scale = _hll_consts(p)
    agg = regs.groupBy(group_col).agg(
        F.sum(
            F.expr(f"shiftleft(cast(1 as bigint), {w_bits + 1} - M)")
        ).alias("sp"),
        F.count(F.lit(1)).alias("np"),
    )
    c = alpha * m * m * scale  # one python-float constant, same in SQL
    s_total = F.col("sp") + (F.lit(m) - F.col("np")) * F.lit(scale)
    raw = F.lit(c) / s_total.cast("double")
    zeros = F.lit(m) - F.col("np")
    est = F.when(
        (raw <= 2.5 * m) & (zeros > 0),
        F.round(F.lit(float(m)) * F.log(F.lit(float(m)) / zeros), 4),
    ).otherwise(F.round(raw, 4))
    return agg.select(F.col(group_col), est.alias("est_distinct"))


def sql_hll_portable(
    source_cte: str, group_col: str, val_expr: str, p: int = HLL_P
) -> str:
    """The DuckDB twin of :func:`hll_portable` over a CTE named
    ``source_cte`` exposing ``(group_col, {val_expr})`` rows."""
    m, w_bits, alpha, scale = _hll_consts(p)
    c = repr(alpha * m * m * scale)
    ladder = " ".join(
        f"WHEN w >= {1 << (w_bits - r)} THEN {r}"
        for r in range(1, w_bits + 1)
    )
    return f"""
      cells AS (
        SELECT {group_col},
               h >> {w_bits} AS idx, h & {(1 << w_bits) - 1} AS w
        FROM (SELECT {group_col},
                     ('0x' || substr(md5({val_expr}),1,15))::BIGINT AS h
              FROM {source_cte})
      ), regs AS (
        SELECT {group_col}, idx,
               max(CASE {ladder} ELSE {w_bits + 1} END) AS M
        FROM cells GROUP BY 1, 2
      ), hagg AS (
        SELECT {group_col},
               sum((1::BIGINT << ({w_bits + 1} - M))) AS sp,
               count(*) AS np
        FROM regs GROUP BY 1
      )
      SELECT {group_col},
             CASE WHEN raw <= {2.5 * m} AND ({m} - np) > 0
                  THEN round({float(m)} * ln({float(m)} / ({m} - np)), 4)
                  ELSE round(raw, 4) END AS est_distinct
      FROM (SELECT {group_col}, np,
                   {c} / (sp + ({m} - np) * {scale})::DOUBLE AS raw
            FROM hagg)"""


# ---------------------------------------------------------------------------
# Quantile sketch: deterministic hash-sample + exact selection.
# ---------------------------------------------------------------------------


def quantile_sketch_sample(
    df: DataFrame,
    key_cols: list[str],
    rate: float,
) -> DataFrame:
    """The sketch's state: a CONTENT-HASH Bernoulli sample at ``rate``
    (md5 bucket of the concatenated row key, the ``sampling`` module's
    lottery). Because membership is a pure row-local function, the
    sketch is mergeable BY CONSTRUCTION: sample(A ∪ B) literally equals
    sample(A) ∪ sample(B) — no compactor, no merge procedure, no
    randomness to reconcile across executors or engines. That trade
    buys determinism and cross-engine replays at the cost of a
    Θ(rate·n) state size where a KLL compactor holds O(1/ε·log n);
    pick ``rate ≈ target_state / n`` (the estimator's rank error is
    O(1/√(rate·n)), pinned in tests)."""
    from .sampling import fraction_threshold, sample_bucket

    key = F.concat_ws("\x1f", *[F.col(c).cast("string") for c in key_cols])
    return df.filter(sample_bucket(key) < fraction_threshold(rate))


def quantile_sketch_estimate(
    df: DataFrame,
    value_col: str,
    key_cols: list[str],
    quantiles: list[float],
    rate: float = 0.05,
    group_col: str | None = None,
) -> DataFrame:
    """Single-pass approximate quantiles: exact linear-interpolation
    selection (Spark ``percentile`` ≡ DuckDB ``quantile_cont``, parity
    pinned by the q57 family) over the deterministic hash sample, plus
    the EXACT population count ridden along in the same aggregate.
    Output: one row per group with ``q_<pct>`` estimate columns,
    ``sample_n``, and exact ``n``.

    Scale shape: one scan; the only state is the per-group sample
    inside the percentile buffer — O(rate · group size), so rate is
    the knob that keeps the buffer task-sized (the exact-percentile
    buffer trap this sketch exists to avoid). Unlike scalewin's
    two-pass exact recipe this is ONE job and mergeable across
    batches — the matview/streaming path; use scalewin when the answer
    must be exact."""
    from .sampling import fraction_threshold, sample_bucket

    key = F.concat_ws("\x1f", *[F.col(c).cast("string") for c in key_cols])
    in_sample = (sample_bucket(key) < fraction_threshold(rate)).cast(
        "int"
    )
    sampled_val = F.when(
        (in_sample == 1) & F.col(value_col).isNotNull(),
        F.col(value_col).cast("double"),
    )
    aggs = [
        F.percentile(sampled_val, F.lit(q)).alias(
            f"q_{str(q).replace('.', '_')}"
        )
        for q in quantiles
    ]
    aggs.append(F.count(sampled_val).alias("sample_n"))
    aggs.append(
        F.count(F.when(F.col(value_col).isNotNull(), 1)).alias("n")
    )
    if group_col is None:
        return df.agg(*aggs)
    return df.groupBy(group_col).agg(*aggs)


def sql_quantile_sketch_estimate(
    value_col: str,
    key_concat_sql: str,
    quantiles: list[float],
    rate: float,
    group_col: str,
    table: str,
) -> str:
    """DuckDB twin of :func:`quantile_sketch_estimate` — identical
    sample membership (md5-prefix lottery) and identical interpolation
    (quantile_cont over the same sampled values)."""
    from .sampling import fraction_threshold

    thr = fraction_threshold(rate)
    sv = (
        f"CASE WHEN substr(md5({key_concat_sql}), 1, 4) < '{thr}' "
        f"THEN {value_col}::DOUBLE END"
    )
    qcols = ",\n           ".join(
        f"quantile_cont({sv}, {q!r}) AS q_{str(q).replace('.', '_')}"
        for q in quantiles
    )
    return f"""
    SELECT {group_col},
           {qcols},
           count({sv}) AS sample_n,
           count(CASE WHEN {value_col} IS NOT NULL THEN 1 END) AS n
    FROM {table} GROUP BY {group_col}"""
