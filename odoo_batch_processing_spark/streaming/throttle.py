"""Throttled micro-batch bulk update with cooperative cancellation
(R18 + R19 + R15 accounting, streaming form).

Reference analog: the sequential update loop sleeps ``waitTime`` ms
between rows (Odoo-Batch-Processing.user.js:499, default 400 —
user.js:230) and checks an ``isCancelled`` flag each iteration
(user.js:421-425, 456-458); work committed before cancel stays
committed (§1.3). The Spark-native restatement:

* throttle   → ``trigger(processingTime='400 milliseconds')`` +
  ``maxFilesPerTrigger`` — rate limiting belongs to the TRIGGER, not a
  sleep in the data path;
* cancel     → ``query.stop()`` between micro-batches — cooperative,
  exactly like the loop-top flag check;
* partial    → micro-batches are committed units: everything written
  by completed batches survives a stop (the reference's
  half-complete-on-cancel semantics, which batch Spark cannot and
  should not reproduce — SURVEY.md §7.4);
* accounting → per-batch success/error aggregates accumulated
  driver-side in ``foreachBatch`` (R15), final outcome CASE (R16).
"""

from __future__ import annotations

import threading
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.streaming import StreamingQuery

from odoo_batch_processing_spark.operators.bulk_update import broadcast_update, classify_outcome


@dataclass
class ThrottledBulkUpdate:
    """Streaming constant-update run over an unbounded row source."""

    column: str
    value: str
    out_dir: str
    checkpoint_dir: str
    visible: Column | None = None
    editable: Column | None = None
    readonly: Column | None = None
    trigger_ms: int = 400  # the reference's default waitTime (user.js:230)

    success_count: int = 0
    #: guarded rows (readonly / non-editable) stepped over — the
    #: reference's `continue` (user.js:477-480) increments NEITHER
    #: success nor error for these; same split as BulkUpdateResult.
    skipped_count: int = 0
    #: attempted updates that failed; 0 on the built-in functional
    #: paths (sink failures surface as exceptions, not counts).
    error_count: int = 0
    cancelled: bool = False
    _lock: threading.Lock = field(default_factory=threading.Lock, repr=False)
    _query: StreamingQuery | None = None

    def _apply_batch(self, batch_df: DataFrame, epoch_id: int) -> None:
        applied = F.lit(True)
        for guard in (self.visible, self.editable):
            if guard is not None:
                applied = applied & guard
        if self.readonly is not None:
            applied = applied & ~self.readonly
        # pin the flag on the PRE-update rows: evaluating `applied`
        # after the rewrite is wrong whenever a guard references the
        # updated column (e.g. readonly on the column being set)
        updated = broadcast_update(
            batch_df.withColumn("__applied", applied),
            self.column,
            self.value,
            visible=F.col("__applied"),
        )
        # one pass: write the batch AND count outcomes (R15)
        updated.persist()
        try:
            updated.drop("__applied").write.mode("append").parquet(self.out_dir)
            counts = updated.agg(
                F.sum(F.col("__applied").cast("int")).alias("ok"),
                F.sum((~F.col("__applied")).cast("int")).alias("skip"),
            ).head()
            with self._lock:
                self.success_count += int(counts["ok"] or 0)
                self.skipped_count += int(counts["skip"] or 0)
        finally:
            updated.unpersist()

    def start(self, stream_df: DataFrame, available_now: bool = False) -> StreamingQuery:
        writer = stream_df.writeStream.foreachBatch(self._apply_batch).option(
            "checkpointLocation", self.checkpoint_dir
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        else:
            writer = writer.trigger(processingTime=f"{self.trigger_ms} milliseconds")
        self._query = writer.start()
        return self._query

    def cancel(self) -> None:
        """R19: cooperative stop; completed micro-batches stay
        committed (user.js:456-458 keeps prior rows' updates)."""
        with self._lock:
            self.cancelled = True
        if self._query is not None:
            self._query.stop()

    @property
    def outcome(self) -> str:
        """R16's 4-way CASE over (cancelled, success, error)."""
        from pyspark.sql import SparkSession

        spark = SparkSession.getActiveSession()
        row = (
            spark.range(1)
            .select(
                classify_outcome(
                    F.lit(self.success_count), F.lit(self.error_count), F.lit(self.cancelled)
                ).alias("o")
            )
            .head()
        )
        return row["o"]
