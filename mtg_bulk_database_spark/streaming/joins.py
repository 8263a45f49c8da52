"""Stream-stream joins (Structured Streaming's interval join) — the
attribution shape: match each purchase with the same user's clicks in
the preceding hour.

Batch/stream unification again: :func:`attribution_join` is the shared
logical operator; feed it two batch DataFrames and it's a plain
range join (the q65 registry entry, oracle-checked), feed it two
streams carrying watermarks and Spark runs it as a watermarked
stream-stream join with bounded state.

State-bound mechanics (the part that matters at 100 TB/day): both sides
buffer rows in the state store until the watermark says no earlier match
can arrive. The join's time-range condition (``c.ts ∈ [p.ts − window,
p.ts)``) plus the two watermarks let Spark derive the eviction horizon —
clicks older than ``watermark + window`` below the max seen event time
are dropped from state. Without the range condition the state would be
unbounded; that's why the condition is part of the operator, not the
caller's filter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def attribution_join(
    clicks: DataFrame,
    purchases: DataFrame,
    window_minutes: int = 60,
    watermark: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Pairs (click, purchase) of the same user with the click in the
    ``window_minutes`` before the purchase (strict: click < purchase).

    Works on batch inputs as-is; for streaming inputs pass ``watermark``
    (e.g. ``"2 hours"``) — required by Spark for append-mode
    stream-stream joins, and what bounds the buffered state.

    ``how="left_outer"`` keeps purchases with NO qualifying click
    (click columns NULL) — the conversion-denominator shape. In
    streaming mode an unmatched purchase emits only once the watermark
    has passed its eligibility window (Spark must be SURE no matching
    click can still arrive), so trailing unmatched rows flush when a
    later event advances the watermark — the documented outer-join
    latency trade-off, pinned in the streaming test.
    """
    if watermark is not None:
        clicks = clicks.withWatermark("ts", watermark)
        purchases = purchases.withWatermark("ts", watermark)
    c = clicks.select(
        F.col("user_id"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    p = purchases.select(
        F.col("user_id"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    cond = (
        (F.col("c.user_id") == F.col("p.user_id"))
        & (F.col("c.click_ts") < F.col("p.purchase_ts"))
        & (
            F.col("c.click_ts")
            >= F.col("p.purchase_ts") - F.expr(f"INTERVAL {window_minutes} MINUTES")
        )
    )
    # purchases on the LEFT so "left_outer" preserves purchase rows
    return (
        p.alias("p")
        .join(c.alias("c"), cond, how)
        .select(
            F.col("p.user_id").alias("user_id"),
            "purchase_id",
            "purchase_ts",
            "purchase_value",
            "click_id",
            "click_ts",
        )
    )


def attribution_counts(
    clicks: DataFrame, purchases: DataFrame, window_minutes: int = 60
) -> DataFrame:
    """Batch rollup over the join: per purchase, how many same-user
    clicks led up to it (purchases with none kept at 0 via left join —
    the conversion-rate denominator must include them)."""
    pairs = attribution_join(clicks, purchases, window_minutes)
    p = purchases.select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id"),
        F.col("value").alias("purchase_value"),
    )
    n = pairs.groupBy("purchase_id").agg(F.count(F.lit(1)).alias("n_clicks_1h"))
    return (
        p.join(n, on="purchase_id", how="left")
        .withColumn("n_clicks_1h", F.coalesce(F.col("n_clicks_1h"), F.lit(0)))
        .select("purchase_id", "user_id", "purchase_value", "n_clicks_1h")
    )


def enrich_stream_with_dim(
    events: DataFrame, dim: DataFrame, on: str, how: str = "left"
) -> DataFrame:
    """Stream-static enrichment join — the third join mode Structured
    Streaming supports (after stream-stream and batch): each micro-batch
    joins the STATIC dimension as of that batch's execution, no state
    store involved, and the dim side broadcasts when small (the same
    plan as the batch q10 enrichment).

    Contrast with the stream-stream interval join above: no watermark
    is required because the static side never grows — but the dim is
    re-resolved per micro-batch, so swapping the underlying files
    (e.g. a ledger compaction) is picked up mid-stream; pin a version
    via ledger_read for snapshot-stable enrichment."""
    from pyspark.sql import functions as F

    return events.join(F.broadcast(dim), on, how)
