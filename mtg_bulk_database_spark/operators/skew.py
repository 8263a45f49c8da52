"""Skew-handling join strategies (brief: "skewed keys hurt … salting
for skew, AQE for runtime re-plan").

AQE's skew-join splitting (on in ``session.get_spark``) handles skewed
SORT-MERGE joins automatically; explicit salting remains the tool when
(a) the skew is in an aggregation, or (b) a broadcast isn't possible and
AQE's splitting can't kick in (e.g. bucketed inputs, or pre-3.0
clusters). Both operators here are pure DataFrame transforms.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _salt_expr(columns: list[str], n_salts: int, spread_identical: bool):
    """Salt column: pmod of a row-value hash. ``spread_identical`` mixes
    in ``monotonically_increasing_id`` so FULLY-identical rows (repeated
    events — a common real skew shape a value-only hash sends to one
    reducer) also spread. Trade-off, stated loudly: MID depends on the
    physical row layout, so under a shuffle-fetch failure a partially
    recomputed upstream can re-salt rows differently — Spark handles
    nondeterministic-stage rollback by recomputing, but the guarantee is
    weaker than the value-only hash, which is a pure row function and
    deterministic under ANY recompute. Default off; opt in when the
    input is a deterministic source scan (parquet files) or the job can
    tolerate retry-level nondeterminism."""
    cols = [F.col(c) for c in columns]
    if spread_identical:
        cols.append(F.monotonically_increasing_id())
    return F.pmod(F.xxhash64(*cols), F.lit(n_salts))


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    n_salts: int = 8,
    how: str = "inner",
    spread_identical: bool = False,
) -> DataFrame:
    """Equi-join where ``left`` is skewed on ``key``: left rows get a
    random-but-deterministic salt (hash of the row values), right rows
    are replicated ``n_salts`` times, and the join key becomes
    (key, salt) — one hot key fans out over ``n_salts`` reducers.

    Cost model: right side grows ×n_salts, so use when
    |right| × n_salts ≪ |left's hot keys|. Row-deterministic salting
    (pmod of a hash, not rand()) keeps results reproducible under
    retries; see ``_salt_expr`` for the ``spread_identical`` option and
    its determinism trade-off when rows are fully duplicated.

    Only left-preserving joins are allowed: under right/full outer,
    an unmatched right row would surface once per salt replica.
    """
    if how not in ("inner", "left", "left_outer", "left_semi", "left_anti"):
        raise ValueError(
            f"salted_join supports left-preserving joins only, got {how!r} "
            "(an unmatched right row would be duplicated per salt)"
        )
    salted_left = left.withColumn(
        "_salt", _salt_expr(left.columns, n_salts, spread_identical)
    )
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias("_salt")
    replicated_right = right.select("*", salts)
    out = salted_left.join(replicated_right, on=[key, "_salt"], how=how)
    return out.drop("_salt")


def salted_count(
    df: DataFrame, key: str, n_salts: int = 8, spread_identical: bool = False
) -> DataFrame:
    """Two-phase aggregation for a skewed groupBy key: partial counts on
    (key, salt), then final combine on key — the hot key's rows spread
    over ``n_salts`` partial groups instead of one reducer.

    (Spark's hash aggregate already does map-side partials; explicit
    salting matters for aggregates without partial pushdown, e.g.
    collect_list or exact distinct counts per key. ``spread_identical``:
    see ``_salt_expr``.)
    """
    partial = (
        df.withColumn("_salt", _salt_expr(df.columns, n_salts, spread_identical))
        .groupBy(key, "_salt")
        .agg(F.count("*").alias("_partial"))
    )
    return partial.groupBy(key).agg(F.sum("_partial").alias("n_rows"))
