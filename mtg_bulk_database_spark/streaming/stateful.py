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
per-key memory is bounded by the id-set size, so real deployments add a
timeout (``GroupStateTimeout.ProcessingTimeTimeout`` + ``state.setTimeoutDuration``)
to expire idle keys — the TTL hook is exposed but defaults off so the
dedup guarantee is absolute within a run.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame


def stream_dedup_events(
    events: DataFrame,
    key_col: str = "user_id",
    id_col: str = "event_id",
) -> DataFrame:
    """Emit each (key, id) at most once across the whole stream."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = events.schema
    state_schema = "seen array<long>"

    def dedup_fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        seen: set[int] = set(state.get[0]) if state.exists else set()
        for pdf in pdfs:
            fresh = pdf[~pdf[id_col].isin(seen)]
            # within-batch duplicates: keep first occurrence only
            fresh = fresh.drop_duplicates(subset=[id_col], keep="first")
            if len(fresh):
                seen.update(int(x) for x in fresh[id_col])
                yield fresh
        state.update((sorted(seen),))

    return events.groupBy(key_col).applyInPandasWithState(
        dedup_fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
