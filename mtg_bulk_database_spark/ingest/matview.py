"""Incremental materialized-view maintenance over ledger snapshots.

At 100 TB a downstream aggregate (rows/bytes per source, token totals
per language, revenue per nation...) cannot be recomputed from scratch
after every ingest micro-batch — the recompute reads the whole table to
fold in a batch that touched 0.01% of it. Classic incremental view
maintenance (Gupta & Mumick, "Maintenance of Materialized Views") fixes
this for the SUM/COUNT algebra: the new view state is the old state
plus the aggregate of the *inserted* rows minus the aggregate of the
*removed* rows. Both changed-row sets come straight from two ledger
snapshots (``exceptAll`` each way), so the maintenance cost scales with
the CHANGE volume, not the table volume — and because ledger merges
rewrite only key-overlapping files, the snapshot diff itself reads only
rewritten files plus their originals once vacuum hasn't run.

Exactness: measures should be integral (long) or decimal so the +/-
folding is associative and order-independent; float sums drift by
partition order (the same reason ``queries_extra.q68`` accumulates
decimal moments). COUNT is maintained as ``SUM(weight)``.

Self-maintainability caveat (from the same literature): SUM/COUNT/AVG
(as sum/count) are self-maintainable under inserts AND deletes; MIN/MAX
are not (a deleted minimum forces a rescan of its group) — callers
needing MIN/MAX should recompute affected groups instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .ledger import ledger_read

_WEIGHT = "_ivm_w"
COUNT_COL = "n_rows"


def _aligned_pair(
    old: DataFrame, new: DataFrame, needed: list[str]
) -> tuple[DataFrame, DataFrame]:
    """Project both snapshots to ``needed``, NULL-filling any column
    only ONE side has: a widening merge adds a column the older
    snapshot lacks, and a metadata restore to a pre-widening version
    removes it from the newer one. Semantically the column is NULL in
    the snapshot that lacks it; crashing would make maintained views
    unable to cross the evolving (or restored) commit. A column
    missing from BOTH sides stays missing — that select error is a
    genuine bad view definition and should surface."""

    def _fill(target: DataFrame, source: DataFrame) -> DataFrame:
        have = set(target.columns)
        for f in source.schema.fields:
            if f.name in needed and f.name not in have:
                target = target.withColumn(
                    f.name, F.lit(None).cast(f.dataType)
                )
        return target

    old, new = _fill(old, new), _fill(new, old)
    return old.select(*needed), new.select(*needed)


def _agg_weighted(
    df: DataFrame, group_cols: list[str], sums: dict[str, str]
) -> DataFrame:
    """groupBy + weighted SUM/COUNT: each input row carries a +1/-1
    weight column; COUNT is SUM(w), SUM(x) is SUM(x*w). One shuffle."""
    aggs = [F.sum(F.col(_WEIGHT)).alias(COUNT_COL)]
    for out_name, src_col in sums.items():
        aggs.append(F.sum(F.col(src_col) * F.col(_WEIGHT)).alias(out_name))
    return df.groupBy(*group_cols).agg(*aggs)


def snapshot_agg(
    df: DataFrame, group_cols: list[str], sums: dict[str, str]
) -> DataFrame:
    """The view definition: COUNT(*) AS n_rows plus SUM(src) AS out for
    each ``sums`` entry, grouped by ``group_cols``. Used both for the
    initial full materialization and as the recompute oracle in tests."""
    return _agg_weighted(
        df.withColumn(_WEIGHT, F.lit(1).cast("long")), group_cols, sums
    )


def agg_delta(
    spark: SparkSession,
    root: str,
    from_version: int,
    to_version: int,
    group_cols: list[str],
    sums: dict[str, str],
) -> DataFrame:
    """The view delta between two committed ledger versions: per group,
    signed counts/sums of (rows added) minus (rows removed). Unchanged
    rows cancel out of the ``exceptAll`` multiset differences before any
    aggregation, so the shuffle carries changed rows only.

    Both snapshots are PROJECTED to the view's columns before the
    multiset difference: the view state is a pure function of those
    columns, so a change in any other column correctly produces no
    delta; the diff gets narrower (less shuffle); and non-comparable
    columns outside the view (MAP-typed ``image_uris`` on the cards
    table) stop mattering — ``exceptAll`` never sees them."""
    needed = list(dict.fromkeys([*group_cols, *sums.values()]))
    old, new = _aligned_pair(
        ledger_read(spark, root, from_version),
        ledger_read(spark, root, to_version),
        needed,
    )
    added = new.exceptAll(old).withColumn(_WEIGHT, F.lit(1).cast("long"))
    removed = old.exceptAll(new).withColumn(
        _WEIGHT, F.lit(-1).cast("long")
    )
    return _agg_weighted(added.unionByName(removed), group_cols, sums)


def _fold(
    left: DataFrame, right: DataFrame, group_cols: list[str]
) -> DataFrame:
    measures = [c for c in left.columns if c not in group_cols]
    aggs = [F.sum(F.col(c)).alias(c) for c in measures]
    return (
        left.select(*left.columns)
        .unionByName(right.select(*left.columns))
        .groupBy(*group_cols)
        .agg(*aggs)
    )


def merge_deltas(
    d1: DataFrame, d2: DataFrame, group_cols: list[str]
) -> DataFrame:
    """Combine two view deltas into one (group-wise signed addition).
    NO zero-count filtering here: an update-only delta legally has
    ``n_rows == 0`` with non-zero sum deltas, and dropping it would lose
    the change — zero-groups are eliminated only when a delta lands in
    an actual state (``apply_agg_delta``)."""
    return _fold(d1, d2, group_cols)


def apply_agg_delta(
    prev: DataFrame, delta: DataFrame, group_cols: list[str]
) -> DataFrame:
    """Fold a delta into the previous view STATE: group-wise element
    addition of every measure, dropping groups whose row count reaches
    zero (the group disappeared from the base table; in exact integer /
    decimal arithmetic its sums are then exactly zero too, so nothing
    is lost). Implemented as union + re-aggregate — one shuffle, no
    join; with ``merge_deltas`` a chain of deltas folds in any
    grouping."""
    return _fold(prev, delta, group_cols).filter(F.col(COUNT_COL) != 0)


def maintain_view(
    spark: SparkSession,
    root: str,
    prev_state: DataFrame | None,
    prev_version: int,
    to_version: int,
    group_cols: list[str],
    sums: dict[str, str],
) -> DataFrame:
    """Bring a materialized aggregate from ``prev_version`` to
    ``to_version``: full materialization when ``prev_state`` is None
    (or prev_version == 0), otherwise prev + delta. Callers persist the
    returned state (e.g. into its own ledger table) alongside the
    version number it reflects — restart-safe incremental maintenance.
    """
    if prev_state is None or prev_version == 0:
        return snapshot_agg(
            ledger_read(spark, root, to_version), group_cols, sums
        )
    if to_version == prev_version:
        return prev_state
    delta = agg_delta(
        spark, root, prev_version, to_version, group_cols, sums
    )
    return apply_agg_delta(prev_state, delta, group_cols)


# ---------------------------------------------------------------------------
# Continuous aggregate: the view state persisted as its own ledger table.
# ---------------------------------------------------------------------------


def refresh_continuous_view(
    spark: SparkSession,
    table_root: str,
    view_root: str,
    group_cols: list[str],
    sums: dict[str, str],
) -> int:
    """Advance a persisted materialized aggregate to the base table's
    current version (TimescaleDB continuous-aggregate shape): the view
    state lives in its OWN ledger table whose manifest records
    ``base_version`` — the base snapshot it reflects — ATOMICALLY with
    the state's file list. Crash-safe by construction: either the new
    state+watermark commit lands together or neither does, so a retry
    never double-applies a delta. Returns the base version now
    reflected.

    First call materializes fully; later calls read only the snapshot
    diff (change-bounded). Safe to run after every streaming micro-batch
    (each ledger commit) or on any slower cadence — versions in between
    fold into one delta.
    """
    from .ledger import (
        _commit,
        _read_manifest,
        _stage_data_files,
        current_version,
    )

    base_v = current_version(table_root)
    if base_v == 0:
        raise FileNotFoundError(f"no committed version at {table_root}")
    view_v = current_version(view_root)
    if view_v == 0:
        state = snapshot_agg(
            ledger_read(spark, table_root, base_v), group_cols, sums
        )
        reflected = 0
    else:
        m = _read_manifest(view_root, view_v)
        reflected = m["base_version"]
        if reflected == base_v:
            return base_v
        try:
            delta = agg_delta(
                spark, table_root, reflected, base_v, group_cols, sums
            )
            prev = ledger_read(spark, view_root, view_v)
            state = apply_agg_delta(prev, delta, group_cols)
        except FileNotFoundError:
            # the reflected base snapshot fell out of the retention
            # window (vacuumed) — the delta is unreconstructable, so
            # fall back to a full materialization of the current
            # snapshot. Correctness never depends on retention; only
            # the maintenance COST does.
            state = snapshot_agg(
                ledger_read(spark, table_root, base_v), group_cols, sums
            )
    key = group_cols[0]
    files = _stage_data_files(spark, view_root, state, key)
    _commit(
        view_root,
        view_v + 1,
        files,
        key,
        extra_meta={"base_version": base_v, "reflected_from": reflected},
    )
    return base_v


# ---------------------------------------------------------------------------
# MIN/MAX maintenance: affected-group recompute (not self-maintainable).
# ---------------------------------------------------------------------------


def changed_groups(
    spark: SparkSession,
    root: str,
    from_version: int,
    to_version: int,
    group_cols: list[str],
    value_cols: list[str] | None = None,
) -> DataFrame:
    """Distinct group keys touched by any insert/delete/update between
    two snapshots — the recompute frontier for non-self-maintainable
    aggregates. Change-bounded: built from the exceptAll diffs.
    ``value_cols`` restricts change detection to the columns the
    aggregate reads (same projection argument as ``agg_delta``);
    None diffs full rows (conservative; requires comparable types)."""
    needed = (
        list(dict.fromkeys([*group_cols, *value_cols]))
        if value_cols is not None
        else None
    )
    old = ledger_read(spark, root, from_version)
    new = ledger_read(spark, root, to_version)
    if needed is None:
        needed = list(new.columns)
    old, new = _aligned_pair(old, new, needed)
    return (
        new.exceptAll(old)
        .select(*group_cols)
        .unionByName(old.exceptAll(new).select(*group_cols))
        .distinct()
    )


def snapshot_minmax(
    df: DataFrame, group_cols: list[str], measures: dict[str, tuple[str, str]]
) -> DataFrame:
    """The MIN/MAX view definition: ``measures`` maps output name →
    (``"min"``|``"max"``, source column)."""
    aggs = []
    for out, (kind, src) in measures.items():
        fn = F.min if kind == "min" else F.max
        aggs.append(fn(F.col(src)).alias(out))
    return df.groupBy(*group_cols).agg(*aggs)


def maintain_minmax(
    spark: SparkSession,
    root: str,
    prev_state: DataFrame,
    prev_version: int,
    to_version: int,
    group_cols: list[str],
    measures: dict[str, tuple[str, str]],
) -> DataFrame:
    """Maintain a MIN/MAX aggregate across versions. MIN/MAX are not
    self-maintainable under deletes (removing a group's minimum says
    nothing about the new minimum), so the classic fallback applies:
    recompute ONLY the groups the diff touched, keep every other
    group's row from the previous state untouched. Cost scales with
    changed-group data volume, not table volume; the changed-group set
    is broadcast into both the semi- and anti-join, so neither side of
    the base table shuffles on the group key twice.
    """
    frontier = changed_groups(
        spark,
        root,
        prev_version,
        to_version,
        group_cols,
        value_cols=[src for _, src in measures.values()],
    ).localCheckpoint(eager=True)
    recomputed = snapshot_minmax(
        ledger_read(spark, root, to_version).join(
            F.broadcast(frontier), on=group_cols, how="left_semi"
        ),
        group_cols,
        measures,
    )
    kept = prev_state.join(
        F.broadcast(frontier), on=group_cols, how="left_anti"
    )
    return kept.unionByName(recomputed)


# ---------------------------------------------------------------------------
# Approximate-distinct maintenance: mergeable HLL sketch state.
# ---------------------------------------------------------------------------

HLL_STATE_COL = "hll_state"
HLL_ESTIMATE_COL = "approx_distinct"


def snapshot_approx_distinct(
    df: DataFrame, group_cols: list[str], col: str, lgk: int = 12
) -> DataFrame:
    """The approximate COUNT(DISTINCT col) view: per group, a
    Datasketches HLL state (binary, mergeable) plus its estimate.
    Sketch size is ~2^lgk bytes per group regardless of cardinality —
    the reason this view stays maintainable at 100 TB where exact
    per-group distinct sets would themselves be a large table."""
    return (
        df.groupBy(*group_cols)
        .agg(F.hll_sketch_agg(F.col(col), F.lit(lgk)).alias(HLL_STATE_COL))
        .withColumn(HLL_ESTIMATE_COL, F.hll_sketch_estimate(HLL_STATE_COL))
    )


def maintain_approx_distinct(
    spark: SparkSession,
    root: str,
    prev_state: DataFrame | None,
    prev_version: int,
    to_version: int,
    group_cols: list[str],
    col: str,
    lgk: int = 12,
) -> DataFrame:
    """Maintain the HLL view across ledger versions. HLL registers fold
    under set UNION only — a sketch cannot unmerge a deleted value — so
    maintenance splits the diff the same way MIN/MAX does:

    - groups with any REMOVED row recompute from the new snapshot
      (cost: changed-group volume, the Gupta-Mumick fallback);
    - purely-inserted rows fold into the surviving state with
      ``hll_union_agg`` — cost: insert volume only, the common case for
      append-mostly ingest.

    Estimates are identical to a full recompute (not merely close): HLL
    union takes the register-wise max, which is associative and
    order-independent, and the insert-only path unions the exact same
    value set a recompute would sketch."""
    if prev_state is None or prev_version == 0:
        return snapshot_approx_distinct(
            ledger_read(spark, root, to_version), group_cols, col, lgk
        )
    if to_version == prev_version:
        return prev_state
    needed = list(dict.fromkeys([*group_cols, col]))
    old, new = _aligned_pair(
        ledger_read(spark, root, prev_version),
        ledger_read(spark, root, to_version),
        needed,
    )
    added = new.exceptAll(old)
    removed = old.exceptAll(new)

    dirty = removed.select(*group_cols).distinct().localCheckpoint(eager=True)
    recomputed = snapshot_approx_distinct(
        new.join(F.broadcast(dirty), on=group_cols, how="left_semi"),
        group_cols,
        col,
        lgk,
    )
    clean_prev = prev_state.join(
        F.broadcast(dirty), on=group_cols, how="left_anti"
    )
    clean_adds = snapshot_approx_distinct(
        added.join(F.broadcast(dirty), on=group_cols, how="left_anti"),
        group_cols,
        col,
        lgk,
    )
    merged = (
        clean_prev.select(*group_cols, HLL_STATE_COL)
        .unionByName(clean_adds.select(*group_cols, HLL_STATE_COL))
        .groupBy(*group_cols)
        .agg(
            F.hll_union_agg(F.col(HLL_STATE_COL), F.lit(True)).alias(
                HLL_STATE_COL
            )
        )
        .withColumn(HLL_ESTIMATE_COL, F.hll_sketch_estimate(HLL_STATE_COL))
    )
    return merged.unionByName(recomputed)
