"""Custom stateful streaming operator: exactly-once event dedup via
``applyInPandasWithState`` (the brief's "custom stateful operators"
path — used when built-in aggregations/session windows can't express
the state machine).

Semantics: per key (user), remember the set of event ids already
emitted; a replayed/duplicated event arriving in any later micro-batch
is dropped. State survives restarts through the checkpoint — combined
with an idempotent sink this is end-to-end exactly-once dedup over an
at-least-once source (the standard Kafka-consumer shape).

Scale notes: state is per-key and lives in the state store (RocksDB in
production — set ``spark.sql.streaming.stateStore.providerClass``);
per-key memory is bounded by the id-set size, so an unbounded run grows
without limit. The default therefore expires idle keys after
``ttl_ms`` of processing time (``GroupStateTimeout.ProcessingTimeTimeout``):
a key whose state expired loses dedup protection for ids older than the
TTL — the standard at-least-once trade-off; replays within the TTL are
still exact. Pass ``ttl_ms=None`` for the absolute guarantee when the
key space is known-bounded.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: 24 h: long enough that realistic replays (consumer restarts,
#: redeliveries) dedup exactly; short enough that dead keys leave the
#: store daily at 100 TB/day key cardinalities.
DEFAULT_DEDUP_TTL_MS = 24 * 3600 * 1000


def stream_dedup_events(
    events: DataFrame,
    key_col: str = "user_id",
    id_col: str = "event_id",
    ttl_ms: int | None = DEFAULT_DEDUP_TTL_MS,
) -> DataFrame:
    """Emit each (key, id) at most once while the key's state lives.

    With the default ``ttl_ms``, "lives" means until the key has been
    idle for 24 h of processing time (timeout re-armed on every batch
    that touches the key) — replays inside the TTL dedup exactly; a
    replay arriving after the key expired is emitted again. Pass
    ``ttl_ms=None`` (NoTimeout) for the absolute at-most-once guarantee
    across the whole stream, at the cost of state that only grows.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = events.schema
    state_schema = "seen array<long>"
    bounded = ttl_ms is not None

    def dedup_fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if bounded and state.hasTimedOut:
            # idle past TTL: drop the id-set; nothing to emit this call
            state.remove()
            return
        seen: set[int] = set(state.get[0]) if state.exists else set()
        for pdf in pdfs:
            fresh = pdf[~pdf[id_col].isin(seen)]
            # within-batch duplicates: keep first occurrence only
            fresh = fresh.drop_duplicates(subset=[id_col], keep="first")
            if len(fresh):
                seen.update(int(x) for x in fresh[id_col])
                yield fresh
        state.update((sorted(seen),))
        if bounded:
            # re-arm: the key stays alive while traffic keeps arriving
            state.setTimeoutDuration(ttl_ms)

    return events.groupBy(key_col).applyInPandasWithState(
        dedup_fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if bounded
            else GroupStateTimeout.NoTimeout
        ),
    )

# ---------------------------------------------------------------------------
# Running per-key totals: state API v2 when available, v1 fallback.
# ---------------------------------------------------------------------------


def state_v2_available() -> bool:
    """``transformWithStateInPandas``'s Python side speaks protobuf to
    the JVM state server; in environments without the ``protobuf``
    wheel (this container) the query crashes at pre-init. Gate on the
    import — the same stdlib-fallback convention as the ijson-less
    JSON scanner (sources/scryfall.py)."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def stream_running_totals(
    events: DataFrame,
    key_col: str = "user_id",
    value_col: str = "value",
    api: str = "auto",
) -> DataFrame:
    """Running per-key totals ``(n_events, sum_micro)``: each
    micro-batch folds its rows into the key's state and emits the new
    running totals, so the LAST emitted row per key equals the batch
    aggregate over everything ingested — the equivalence the test pins.

    Float discipline: values are floored to integer micro-units PER
    EVENT before summing, making the running sum associative integer
    arithmetic — replay/batch-boundary order cannot change it (the LM
    scorer's micro-nat rule).

    ``api="v2"`` uses Spark 4's arbitrary-state API
    (``transformWithStateInPandas``: typed ValueState on a
    ``StatefulProcessor``, RocksDB-backed, requires protobuf);
    ``api="v1"`` expresses the identical state machine with
    ``applyInPandasWithState``; ``"auto"`` picks v2 when its runtime
    dependency exists. Both shuffle each micro-batch once on the key —
    the same state partitioning as a built-in streaming aggregate —
    and hold two longs per key (constant state, no TTL needed).
    """
    import math

    if api == "auto":
        api = "v2" if state_v2_available() else "v1"

    out_ddl = f"{key_col} long, n_events long, sum_micro long"

    def fold(pdfs: Iterator[pd.DataFrame], n: int, sm: int) -> tuple[int, int]:
        for pdf in pdfs:
            n += len(pdf)
            # dropna: a NULL value arrives as NaN and math.floor(nan)
            # would kill the query; the batch twin (SUM over
            # floor(value*1e6)) likewise skips NULLs while COUNT(*)
            # still counts the row
            sm += sum(
                int(math.floor(v * 1_000_000.0))
                for v in pdf[value_col].dropna()
            )
        return n, sm

    if api == "v2":
        from pyspark.sql.streaming import StatefulProcessor
        from pyspark.sql.types import LongType, StructField, StructType

        state_schema = StructType(
            [
                StructField("n_events", LongType()),
                StructField("sum_micro", LongType()),
            ]
        )

        class RunningTotals(StatefulProcessor):
            def init(self, handle):
                self._totals = handle.getValueState("totals", state_schema)

            def handleInputRows(self, key, rows, timerValues):
                n, sm = (
                    tuple(self._totals.get())
                    if self._totals.exists()
                    else (0, 0)
                )
                n, sm = fold(rows, n, sm)
                self._totals.update((n, sm))
                yield pd.DataFrame(
                    {key_col: [key[0]], "n_events": [n], "sum_micro": [sm]}
                )

            def close(self):
                pass

        return events.groupBy(key_col).transformWithStateInPandas(
            RunningTotals(),
            outputStructType=out_ddl,
            outputMode="Update",
            timeMode="None",
        )

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def totals_fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n, sm = state.get if state.exists else (0, 0)
        n, sm = fold(pdfs, int(n), int(sm))
        state.update((n, sm))
        yield pd.DataFrame(
            {key_col: [key[0]], "n_events": [n], "sum_micro": [sm]}
        )

    return events.groupBy(key_col).applyInPandasWithState(
        totals_fn,
        outputStructType=out_ddl,
        stateStructType="n_events long, sum_micro long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_dedup_within_watermark(
    events: DataFrame,
    watermark: str = "2 hours",
    key_cols: tuple[str, ...] = ("user_id", "event_id"),
) -> DataFrame:
    """Built-in event-TIME dedup: ``dropDuplicatesWithinWatermark``
    keeps the first arrival per key and drops any duplicate whose
    event time lands within the watermark delay of it.

    The contrast with :func:`stream_dedup_events` is the state bound's
    CLOCK: here state expires on event time (watermark passes → key
    forgotten — deterministic against the data itself), there on
    processing time (TTL of wall-clock idleness). Use this one when
    duplicates are known to arrive close together in event time (e.g.
    at-least-once producers that retry within minutes) — it needs no
    Python state machine at all and runs entirely in the JVM state
    store.
    """
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        list(key_cols)
    )


def stream_cusum_alerts(
    events: DataFrame,
    drift: float = 10.0,
    threshold: float = 25.0,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
    max_key_batch_rows: int = 2_000_000,
) -> DataFrame:
    """Streaming twin of ``operators.timeseries.cusum`` — the identical
    state machine (S = max(0, S + (x − k)); alert and restart at S > h)
    carried across micro-batches in per-key state, so a monitor fires
    mid-stream instead of at end-of-day batch.

    Ordering contract: within a batch, rows are processed in (ts, id)
    order; ACROSS batches the recurrence consumes them in arrival
    order — equal to the batch operator exactly when per-key arrival
    respects event time (the time-ordered-source case the equivalence
    test pins). For out-of-order sources, bound the disorder with a
    watermark-delayed upstream sort (the standard sessionize-then-fold
    arrangement).

    Memory contract: the within-batch sort buffers ONE key's
    micro-batch rows in pandas (4 small columns — ~50 MB at the 2M-row
    default), so a hot key's per-batch volume is the worker's memory
    bound, NOT total batch size across keys.  ``max_key_batch_rows``
    makes the bound loud: exceeding it raises (killing the query)
    rather than silently OOMing mid-fold; raise the limit or shrink
    micro-batches (``maxOffsetsPerTrigger`` & friends) for genuinely
    hotter keys."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = (
        f"{key_col} long, {id_col} long, {ts_col} timestamp, "
        f"{value_col} double, cusum double, alert boolean"
    )
    state_schema = "s double"

    def fold(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (s,) = state.get if state.exists else (0.0,)
        # applyInPandasWithState splits a key's micro-batch into ~10k-row
        # Arrow chunks; sorting each chunk independently would run the
        # fold out of (ts, id) order for keys with more rows per batch
        # than one chunk holds. Concatenate the WHOLE batch for the key,
        # sort once, then fold — the within-batch ordering contract in
        # the docstring holds at any batch size.
        chunks, n_rows = [], 0
        for c in pdfs:
            n_rows += len(c)
            if n_rows > max_key_batch_rows:
                raise RuntimeError(
                    f"stream_cusum_alerts: key {key} has {n_rows}+ rows "
                    f"in one micro-batch (> max_key_batch_rows="
                    f"{max_key_batch_rows}); the within-batch sort "
                    "would buffer them all — raise the limit or shrink "
                    "micro-batches"
                )
            chunks.append(c)
        if not chunks:  # defensive: key invoked with no data
            state.update((s,))
            return
        pdf = chunks[0] if len(chunks) == 1 else pd.concat(chunks, ignore_index=True)
        pdf = pdf.sort_values([ts_col, id_col], kind="mergesort")
        ss, alerts = [], []
        for x in pdf[value_col]:
            s = s + (x - drift)
            if s < 0.0:
                s = 0.0
            fire = s > threshold
            ss.append(s)
            alerts.append(bool(fire))
            if fire:
                s = 0.0
        out = pdf[[key_col, id_col, ts_col, value_col]].copy()
        out["cusum"] = ss
        out["alert"] = alerts
        yield out
        state.update((s,))

    return (
        events.select(key_col, id_col, ts_col, value_col)
        # NULL observations neither update state nor emit (the batch
        # operator's contract, operators/timeseries.py)
        .where(F.col(value_col).isNotNull())
        .groupBy(key_col)
        .applyInPandasWithState(
            fold,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def stream_time_sorted(
    events: DataFrame,
    watermark: str = "30 minutes",
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """Event-time REORDER BUFFER: per key, hold arriving rows in state
    and release them in (ts, id) order once the watermark guarantees
    nothing earlier can still arrive — the building block that turns
    any order-sensitive stateful operator (EWMA/CUSUM folds, session
    machines) into an EXACTLY order-correct one over out-of-order
    sources, at the cost of watermark-delay latency.

    Mechanics: rows with ts <= current watermark are emitted sorted;
    later rows stay buffered (state size is bounded by the disorder
    window — exactly what the watermark promises). Idle keys flush via
    EVENT-TIME TIMEOUTS pinned to the earliest buffered row: Spark only
    invokes the state function for keys PRESENT in a batch, so without
    a timeout a key whose last rows arrived batches ago would hold its
    buffer forever (found by the drain test). A drain still needs a
    final watermark-advancing batch — the sentinel discipline the
    outer-join test documents."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = (
        f"{key_col} long, {id_col} long, {ts_col} timestamp, "
        f"{value_col} double"
    )
    # buffered rows ride state as parallel arrays (micros, id, value)
    state_schema = "ts_us array<long>, ids array<long>, vals array<double>"

    # Arrow hands the worker NAIVE session-local wall-clock timestamps,
    # while getCurrentWatermarkMs() is TRUE epoch.  The INPUT direction
    # (wall-clock -> epoch) is not total in a DST timezone — localizing
    # a wall time inside the repeated/skipped hour raises
    # Ambiguous/NonExistentTimeError (r5 ADVICE) — so Spark computes
    # true epoch micros JVM-side (unix_micros on the internal
    # epoch-based TimestampType: exact, DST-free) and ships them
    # alongside.  Only the OUTPUT direction (epoch -> wall-clock, which
    # is total) runs in the worker; for that, capture the session
    # timezone driver-side.
    tz_name = (
        events.sparkSession.conf.get("spark.sql.session.timeZone", "UTC")
        or "UTC"
    )

    def fold(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        from zoneinfo import ZoneInfo

        tz = ZoneInfo(tz_name)
        ts_us, ids, vals = (
            state.get if state.exists else ([], [], [])
        )
        ts_us, ids, vals = list(ts_us), list(ids), list(vals)
        for pdf in pdfs:
            for t, i, v in zip(
                pdf["_ts_us"], pdf[id_col], pdf[value_col]
            ):
                ts_us.append(int(t))  # epoch micros, computed JVM-side
                ids.append(int(i))
                vals.append(float(v))
        wm_us = state.getCurrentWatermarkMs() * 1000
        ready = sorted(
            (t, i, v)
            for t, i, v in zip(ts_us, ids, vals)
            if t <= wm_us
        )
        held = [
            (t, i, v)
            for t, i, v in zip(ts_us, ids, vals)
            if t > wm_us
        ]
        if ready:
            yield pd.DataFrame(
                {
                    key_col: [key[0]] * len(ready),
                    id_col: [i for _, i, _ in ready],
                    ts_col: [
                        # true epoch micros -> naive session-local
                        pd.Timestamp(t, unit="us", tz="UTC")
                        .tz_convert(tz)
                        .tz_localize(None)
                        for t, _, _ in ready
                    ],
                    value_col: [v for _, _, v in ready],
                }
            )
        if held:
            state.update(
                (
                    [t for t, _, _ in held],
                    [i for _, i, _ in held],
                    [v for _, _, v in held],
                )
            )
            # wake this key when the watermark passes its earliest
            # buffered row (strictly-greater-than-watermark required)
            state.setTimeoutTimestamp(
                max(min(t for t, _, _ in held) // 1000 + 1,
                    state.getCurrentWatermarkMs() + 1)
            )
        elif state.exists:
            state.remove()  # fully drained: no stale empty state

    return (
        events.withWatermark(ts_col, watermark)
        .select(
            key_col,
            id_col,
            ts_col,
            value_col,
            F.unix_micros(F.col(ts_col)).alias("_ts_us"),
        )
        .groupBy(key_col)
        .applyInPandasWithState(
            fold,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
