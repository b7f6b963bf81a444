"""Run-progress tracking (R17) as a StreamingQueryListener.

Reference analog: the per-row progress bar update
`round((i+1)/rowsToProcess*100)` (Odoo-Batch-Processing.user.js:464-473).
In Spark the unit of progress is the micro-batch, not the row; the
listener receives one QueryProgressEvent per batch with numInputRows,
from which the same percentage derives when the expected total is
known up front (as it is in the reference: rowsToProcess).
"""

from __future__ import annotations

import threading
from dataclasses import dataclass, field

from pyspark.sql.streaming import StreamingQueryListener


@dataclass
class BatchProgress:
    batch_id: int
    rows: int
    cumulative_rows: int
    pct: int | None  # None when expected_total unknown


@dataclass
class ProgressTracker(StreamingQueryListener):
    """Collects per-batch progress; thread-safe (listener bus thread
    writes, caller reads)."""

    expected_total: int | None = None
    #: the owned query's name (``writeStream.queryName``). The listener
    #: bus is SESSION-WIDE: without this filter a second concurrent
    #: stream's batches would be folded into this run's cumulative
    #: count and percentage (review r14 #6). ``None`` keeps the old
    #: accept-everything behavior for single-stream callers.
    query_name: str | None = None
    _lock: threading.Lock = field(default_factory=threading.Lock, repr=False)
    batches: list[BatchProgress] = field(default_factory=list)

    def onQueryStarted(self, event) -> None:  # noqa: N802 (Spark API)
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        if self.query_name is not None and event.progress.name != self.query_name:
            return
        rows = int(event.progress.numInputRows)
        with self._lock:
            cum = (self.batches[-1].cumulative_rows if self.batches else 0) + rows
            pct = None
            if self.expected_total:
                # round((i+1)/n*100) — the reference's formula (user.js:469)
                pct = min(100, round(cum / self.expected_total * 100))
            self.batches.append(
                BatchProgress(int(event.progress.batchId), rows, cum, pct)
            )

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    @property
    def rows_seen(self) -> int:
        with self._lock:
            return self.batches[-1].cumulative_rows if self.batches else 0

    @property
    def percentages(self) -> list[int]:
        with self._lock:
            return [b.pct for b in self.batches if b.pct is not None]
