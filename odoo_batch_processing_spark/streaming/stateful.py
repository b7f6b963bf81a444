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
