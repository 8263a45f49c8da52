"""As-of (nearest-predecessor) join — an operator Spark lacks natively
(SURVEY brief: custom operators → composition first, Pandas-backed
second). Two implementations with identical semantics:

- ``asof_join``         — pure DataFrame composition: range join on the
                          key + window-rank to keep the nearest match.
                          Correct everywhere; the range join can explode
                          when many right rows precede each left row.
- ``asof_join_pandas``  — cogrouped ``applyInPandas`` running
                          ``pd.merge_asof`` per key group: both sides
                          shuffle once on the key, each group is a
                          sorted O(n+m) merge — the 100 TB path
                          (this is how time-series stores execute ASOF).
                          Note the per-GROUP Arrow round-trip cost: the
                          auto-switch sends only deep-keyed workloads
                          here, where few large groups amortize it; for
                          many tiny groups see timeseries.py's
                          partition-batched mapInPandas discipline.

Semantics (match DuckDB's ``ASOF JOIN ... ON l.ts > r.ts``): for each
left row, the right row with the greatest ``right_ts`` strictly less
than ``left_ts`` within the same key; left join (no match → NULLs).
Both implementations also take ``direction`` ("backward" | "forward" |
"nearest") for the full kdb/pandas as-of surface, with one shared
deterministic equidistant rule (backward wins).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    direction: str = "backward",
) -> DataFrame:
    """Relational composition: left ⟕ right on key + the direction's
    time predicate, then keep the single best right row per left row.

    Directions (kdb/pandas-parity surface):
    - ``backward`` (default): greatest right_ts strictly BELOW left_ts;
    - ``forward``: smallest right_ts strictly ABOVE left_ts;
    - ``nearest``: smaller |left_ts − right_ts| of the two candidates,
      equidistant ties resolved BACKWARD (deterministic; documented —
      both implementations share the rule, the agreement tests pin it).

    Every left row is preserved — the dedup window partitions on a
    synthetic per-row id, not on the left columns (identical left rows
    would otherwise collapse into one). Ties on the boundary right_ts
    are broken deterministically over the remaining right columns.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown as-of direction: {direction!r}")
    lcols = left.columns
    rcols = [c for c in right.columns if c != on]
    r = right.select(
        F.col(on).alias("_r_key"), *[F.col(c).alias(f"r_{c}") for c in rcols]
    )
    tagged = left.withColumn("_row_id", F.monotonically_increasing_id())
    tie_breaks = [
        F.col(f"r_{c}").desc_nulls_last() for c in rcols if c != right_ts
    ]
    if direction == "backward":
        time_cond = F.col(f"r_{right_ts}") < F.col(left_ts)
        order = [F.col(f"r_{right_ts}").desc_nulls_last(), *tie_breaks]
    elif direction == "forward":
        time_cond = F.col(f"r_{right_ts}") > F.col(left_ts)
        order = [F.col(f"r_{right_ts}").asc_nulls_last(), *tie_breaks]
    else:
        # nearest: join on the key alone (both sides of left_ts are
        # candidates), rank by |Δt| with equidistant ties resolved
        # BACKWARD — a deterministic rule both implementations share
        # (pandas' merge_asof(direction="nearest") leaves the
        # equidistant case unspecified, so it is not used). Exact-equal
        # timestamps stay EXCLUDED, consistent with the strict
        # directional predicates.
        time_cond = F.col(f"r_{right_ts}") != F.col(left_ts)
        dist = F.abs(
            F.col(left_ts).cast("double")
            - F.col(f"r_{right_ts}").cast("double")
        )
        is_forward = (
            F.col(f"r_{right_ts}") > F.col(left_ts)
        ).cast("int")
        order = [
            F.when(F.col(f"r_{right_ts}").isNull(), None)
            .otherwise(dist)
            .asc_nulls_last(),
            is_forward.asc_nulls_last(),  # backward wins equidistant
            *tie_breaks,
        ]
    joined = tagged.join(
        r, (F.col(on) == F.col("_r_key")) & time_cond, "left"
    )
    w = Window.partitionBy("_row_id").orderBy(*order)
    return (
        joined.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_r_key", "_row_id")
    )


def asof_join_pandas(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    direction: str = "backward",
) -> DataFrame:
    """Cogrouped merge_asof: one shuffle per side on the key, then a
    linear sorted merge per group via Arrow — no row explosion.

    Directions match :func:`asof_join` exactly; ``nearest`` runs the
    backward AND forward merges on the same sorted left frame (both
    index-aligned) and picks per row by |Δt| with equidistant ties
    resolved backward — pandas' own ``direction="nearest"`` leaves the
    equidistant rule unspecified, so it is not used.

    The right side's non-key columns are renamed (``r_*``) in the Spark
    layer BEFORE the cogroup: when left and right share lineage (a
    self-as-of on one table), identically-named attributes are the same
    attribute to the analyzer and one side's column silently disappears
    from the Arrow batch — renaming breaks the ambiguity.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown as-of direction: {direction!r}")
    rcols = [c for c in right.columns if c != on]
    right_renamed = right.select(
        F.col(on), *[F.col(c).alias(f"r_{c}") for c in rcols]
    )
    out_schema = T.StructType(
        list(left.schema.fields)
        + [T.StructField(f"r_{c}", right.schema[c].dataType) for c in rcols]
    )

    def merge(lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        lpdf = lpdf.sort_values(left_ts, kind="mergesort").reset_index(
            drop=True
        )
        if rpdf.empty:
            for c in rcols:
                lpdf[f"r_{c}"] = None
            return lpdf
        rpdf = rpdf.drop(columns=[on]).sort_values(
            f"r_{right_ts}", kind="mergesort"
        )

        def one(d: str) -> pd.DataFrame:
            return pd.merge_asof(
                lpdf,
                rpdf,
                left_on=left_ts,
                right_on=f"r_{right_ts}",
                allow_exact_matches=False,  # strict, like ts > ts
                direction=d,
            )

        if direction in ("backward", "forward"):
            return one(direction)
        b, f = one("backward"), one("forward")
        bt = b[f"r_{right_ts}"]
        ft = f[f"r_{right_ts}"]
        d_b = (lpdf[left_ts] - bt).abs()
        d_f = (ft - lpdf[left_ts]).abs()
        take_fwd = bt.isna() | (ft.notna() & (d_f < d_b))
        out = b.copy()
        for c in rcols:
            out.loc[take_fwd, f"r_{c}"] = f.loc[take_fwd, f"r_{c}"]
        return out

    return left.groupBy(on).cogroup(right_renamed.groupBy(on)).applyInPandas(
        merge, schema=out_schema
    )


#: average right-rows-per-key above which the range join's intermediate
#: (≈ left_rows_per_key × right_rows_per_key) outweighs the cogroup's
#: fixed Arrow overhead. Measured at this repo's scale the relational
#: variant wins ~9× below it (queries_extra q56 notes); deep per-key
#: history inverts that quadratically.
AUTO_AVG_MATCHES_THRESHOLD = 64.0


def right_key_depth(right: DataFrame, on: str) -> float:
    """Average rows-per-key on the build side — the one stat the as-of
    strategy choice needs. One partial-aggregate scan (count +
    approx_count_distinct collapse to a single row — no wide shuffle).
    On a real cluster this read comes free from table-level stats
    (ANALYZE / catalog row counts); callers that join the same table
    repeatedly should compute it once and pass ``avg_depth`` through."""
    stats = right.agg(
        F.count(F.lit(1)).alias("n"),
        F.approx_count_distinct(on).alias("n_keys"),
    ).first()
    return stats["n"] / max(stats["n_keys"], 1)


def choose_asof_strategy(
    right: DataFrame, on: str, threshold: float = AUTO_AVG_MATCHES_THRESHOLD
) -> str:
    """Pick the as-of execution strategy from right-side stats: if the
    average right-side depth per key exceeds ``threshold``, the range
    join's per-left-row fan-out is the dominant cost and the linear
    cogrouped merge wins; otherwise the relational variant's codegen'd
    join is faster."""
    return (
        "pandas" if right_key_depth(right, on) > threshold else "relational"
    )


def asof_join_auto(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    strategy: str = "auto",
    threshold: float = AUTO_AVG_MATCHES_THRESHOLD,
    avg_depth: float | None = None,
    direction: str = "backward",
) -> DataFrame:
    """As-of join with stats-driven physical strategy.

    ``strategy="auto"`` (default) samples right-side key depth via
    :func:`choose_asof_strategy`; ``"relational"`` / ``"pandas"`` force a
    variant. Both produce identical columns (left columns + ``r_*``), so
    the switch is invisible to callers — the impl-agreement tests pin it.

    The auto probe is one extra column-pruned pass over the right side
    per call; callers that already know the depth (catalog/ANALYZE
    stats, or a repeated join on the same table) should pass
    ``avg_depth`` to skip it.
    """
    if strategy == "auto":
        if avg_depth is not None:
            strategy = "pandas" if avg_depth > threshold else "relational"
        else:
            strategy = choose_asof_strategy(right, on, threshold)
    if strategy == "relational":
        return asof_join(left, right, on, left_ts, right_ts, direction)
    if strategy == "pandas":
        return asof_join_pandas(left, right, on, left_ts, right_ts, direction)
    raise ValueError(f"unknown as-of strategy: {strategy!r}")
