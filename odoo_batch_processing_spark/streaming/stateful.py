"""Custom stateful streaming operator: per-key running totals via
``applyInPandasWithState``.

The reference's only state is run-scoped (success/error counters and
the cancel flag, Odoo-Batch-Processing.user.js:400, 443-444) — driver
state, reproduced in streaming/throttle.py. This module adds the
genuinely distributed form: per-KEY state that lives in the state
store, survives across micro-batches, and scales horizontally — the
operator a 100 TB event pipeline needs for running counters/feature
accumulation where built-in windowed aggs don't fit.

State is Arrow-batched per group; the state store shuffles by key, so
the operator's scale behavior is the same hash-shuffle story as a
groupBy — skewed keys want salting upstream (SCALE.md).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = "user_id bigint, n_events bigint, min_event_id bigint, max_event_id bigint"
STATE_SCHEMA = "n bigint, mn bigint, mx bigint"


def _update_totals(key, pdfs, state: GroupState):
    import pandas as pd

    n, mn, mx = state.get if state.exists else (0, None, None)
    for pdf in pdfs:
        n += len(pdf)
        batch_mn = int(pdf["event_id"].min())
        batch_mx = int(pdf["event_id"].max())
        mn = batch_mn if mn is None else min(mn, batch_mn)
        mx = batch_mx if mx is None else max(mx, batch_mx)
    state.update((n, mn, mx))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "min_event_id": [mn], "max_event_id": [mx]}
    )


def running_totals(stream_df: DataFrame) -> DataFrame:
    """(user_id, running count, id range) emitted each micro-batch the
    key appears in; integer-only outputs so results are deterministic
    regardless of within-batch arrival order."""
    return (
        stream_df.select("user_id", "event_id")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_totals,
            OUT_SCHEMA,
            STATE_SCHEMA,
            "update",
            GroupStateTimeout.NoTimeout,
        )
    )


def running_totals_tws(stream_df: DataFrame) -> DataFrame:
    """The same operator on ``transformWithStateInPandas`` — Spark 4's
    successor arbitrary-state API (SPARK-49564): typed state handles
    (value/list/map state) instead of one opaque tuple, per-key timers,
    state TTL, and schema evolution of state between job versions.
    Requires the RocksDB state store provider (the caller sets it;
    session.RUNTIME_CONFS leaves the default provider alone so the
    legacy-API queries keep their HDFS-backed store).

    Semantics are identical to :func:`running_totals` by construction —
    the registry certifies BOTH against the same per-user-totals
    oracle, which is exactly the migration contract a production
    pipeline needs when moving off the deprecated API."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class _TotalsProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._totals = handle.getValueState("totals", STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):
            import pandas as pd

            n, mn, mx = (
                self._totals.get() if self._totals.exists() else (0, None, None)
            )
            for pdf in rows:
                n += len(pdf)
                batch_mn = int(pdf["event_id"].min())
                batch_mx = int(pdf["event_id"].max())
                mn = batch_mn if mn is None else min(mn, batch_mn)
                mx = batch_mx if mx is None else max(mx, batch_mx)
            self._totals.update((n, mn, mx))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "min_event_id": [mn],
                    "max_event_id": [mx],
                }
            )

        def close(self) -> None:
            pass

    return (
        stream_df.select("user_id", "event_id")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=_TotalsProcessor(),
            outputStructType=OUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )


TRANS_OUT_SCHEMA = "from_type string, to_type string"
TRANS_STATE_SCHEMA = "last_type string"


def _update_transitions(key, pdfs, state: GroupState):
    import pandas as pd

    prev = state.get[0] if state.exists else None
    frames = [pdf for pdf in pdfs]
    rows = (
        pd.concat(frames, ignore_index=True)
        .sort_values(["ts", "event_id"], kind="mergesort")
        if frames
        else pd.DataFrame(columns=["ts", "event_id", "event_type"])
    )
    out_from: list[str] = []
    out_to: list[str] = []
    for cur in rows["event_type"]:
        if prev is not None:
            out_from.append(prev)
            out_to.append(cur)
        prev = cur
    if prev is not None:
        state.update((prev,))
    yield pd.DataFrame({"from_type": out_from, "to_type": out_to})


def transitions_stream(stream_df: DataFrame) -> DataFrame:
    """Order-SENSITIVE cross-batch state: per-user (from → to) event
    transitions, the streaming twin of the batch lead-window transition
    matrix (operators/windows._q_event_transitions).

    Unlike running totals (commutative — any batch order sums the
    same), a transition pairs each event with its SUCCESSOR, so state
    carries the user's last event type ACROSS micro-batches and the
    operator is only exact when batches arrive in event-time order.
    The catalog query stages the source time-sliced
    (range-partitioned on (ts, event_id), one file per trigger) to
    guarantee that; within a batch the group's rows are sorted on the
    same key (stable mergesort), so boundary ties cannot flip the
    successor. That is the real contract of order-sensitive streaming
    state — and why the query can sit under the SAME exact oracle as
    the batch operator instead of a rows-only check.
    """
    return (
        stream_df.select("user_id", "ts", "event_id", "event_type")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_transitions,
            TRANS_OUT_SCHEMA,
            TRANS_STATE_SCHEMA,
            "append",
            GroupStateTimeout.NoTimeout,
        )
    )
