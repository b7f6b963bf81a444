"""Checkpoint-restart state recovery — the fault-tolerance property a
1000-executor streaming deployment actually leans on.

The exactly-once story so far certifies the SINK side (the
s_merge_upsert epoch ledger replays a committed batch and proves the
guard, tests/test_sinks.py) — these tests certify the STATE side: a
query stopped mid-stream and restarted from its checkpoint must
recover its operator state (dedup seen-keys, join buffers, windowed
aggregation partials) exactly, not just resume reading files.

Witness discipline (SURVEY §7.5 rule 6, applied to recovery): each
test plants data whose correct handling is ONLY possible via recovered
state — a duplicate whose first copy arrived before the stop, a join
match whose left row arrived before the stop, a window whose rows all
arrived before the stop — and pairs the assertion with a state-loss
CONTROL (a fresh checkpoint seeing only the post-restart files) that
demonstrably produces the wrong answer. If Spark ever silently lost or
skipped state recovery, the main assertions fail; if the planted data
stopped exercising state, the controls fail.

All phases are deterministic: files are staged, drained with
``processAllAvailable()``, and the query stopped — no sleeps, no
timing races. The file sink + checkpoint pair is the exactly-once
combination (the sink's own commit log dedups replayed batches), so
output parquet is directly comparable.

Reference analog: the userscript holds all progress state in page-JS
(Odoo-Batch-Processing.user.js:124-199) and a reload loses it — crash
recovery is exactly the capability the Spark restatement adds.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

#: both providers the engine targets: HDFS-backed is the local/test
#: default; RocksDB is the 100 TB production provider (state spills to
#: disk, changelog checkpointing — SCALE.md). Running every recovery
#: scenario under BOTH certifies the streaming family is
#: provider-portable: no query logic leans on HDFSBackedStateStore
#: semantics, and restart recovery holds under RocksDB's
#: snapshot+changelog reconstruction too.
PROVIDERS = {
    "hdfs": (
        "org.apache.spark.sql.execution.streaming.state."
        "HDFSBackedStateStoreProvider"
    ),
    "rocksdb": (
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider"
    ),
}


@pytest.fixture(params=sorted(PROVIDERS))
def state_provider(request, spark):
    """Pin the state-store provider for the duration of one test; the
    provider choice is baked into each query's checkpoint at start, so
    both phases of a restart scenario see the same provider."""
    key = "spark.sql.streaming.stateStore.providerClass"
    try:
        old = spark.conf.get(key)
    except Exception:
        old = None
    spark.conf.set(key, PROVIDERS[request.param])
    yield request.param
    if old is None:
        spark.conf.unset(key)
    else:
        spark.conf.set(key, old)


EVENTS_DDL = (
    "event_id bigint, ts bigint, user_id bigint, "
    "event_type string, value double, props string"
)


def _ns(minutes: int) -> int:
    base = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)
    return int((base + dt.timedelta(minutes=minutes)).timestamp() * 1_000_000_000)


def _write_events_file(spark, path: str, rows):
    spark.createDataFrame(rows, EVENTS_DDL).coalesce(1).write.mode("append").parquet(path)


def _drain(q):
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def _read_ids(spark, out: str, col: str = "event_id") -> set:
    return {r[col] for r in spark.read.parquet(out).collect()}


# ---------------------------------------------------------------------------
# 1. dropDuplicatesWithinWatermark seen-keys state
# ---------------------------------------------------------------------------
def _start_dedup(spark, src: str, ckpt: str, out: str):
    """The s_x2_stream_dedup_wm shape (streaming/queries.py) over a
    file sink: watermarked streaming dedup, append mode."""
    from odoo_batch_processing_spark.streaming.sources import change_source

    return (
        change_source(spark, src, max_files_per_trigger=1)
        .withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["event_id"])
        .select("event_id")
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .start()
    )


def test_dedup_state_survives_checkpoint_restart(spark, tmp_path, state_provider):
    src, ckpt, out = (str(tmp_path / d) for d in ("src", "ckpt", "out"))

    # phase 1: events 1,2,3 — stop after the batch commits
    _write_events_file(
        spark, src, [(i, _ns(5 * i), 1, "click", 1.0, "{}") for i in (1, 2, 3)]
    )
    _drain(_start_dedup(spark, src, ckpt, out))

    # phase 2: a DUPLICATE of event 2 (inside the 1 h dedup window of
    # its first copy) plus a new event 4, processed by a RESTARTED
    # query from the same checkpoint
    _write_events_file(
        spark, src,
        [(2, _ns(15), 1, "click", 1.0, "{}"), (4, _ns(20), 1, "click", 1.0, "{}")],
    )
    _drain(_start_dedup(spark, src, ckpt, out))

    # the duplicate is suppressible ONLY via the recovered seen-keys
    # state — each id exactly once
    assert _read_ids(spark, out) == {1, 2, 3, 4}
    assert spark.read.parquet(out).count() == 4

    # state-loss control: a fresh checkpoint that never saw phase 1
    # emits the duplicate — proving the assertion above is load-bearing
    src2, ckpt2, out2 = (str(tmp_path / d) for d in ("src2", "ckpt2", "out2"))
    _write_events_file(
        spark, src2,
        [(2, _ns(15), 1, "click", 1.0, "{}"), (4, _ns(20), 1, "click", 1.0, "{}")],
    )
    _drain(_start_dedup(spark, src2, ckpt2, out2))
    assert 2 in _read_ids(spark, out2)


# ---------------------------------------------------------------------------
# 2. stream-stream join buffered-row state
# ---------------------------------------------------------------------------
def _start_join(spark, src: str, ckpt: str, out: str):
    """The s_stream_stream_join shape (streaming/queries.py:417):
    purchases ⋈ follow-ups of the same user within 30 minutes, both
    sides watermarked, over a file sink."""
    from odoo_batch_processing_spark.streaming.sources import change_source

    purchases = (
        change_source(spark, src, max_files_per_trigger=1)
        .filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "10 minutes")
    )
    others = (
        change_source(spark, src, max_files_per_trigger=1)
        .filter(F.col("event_type") != "purchase")
        .select(
            "user_id", F.col("event_id").alias("follow_id"), F.col("ts").alias("f_ts")
        )
        .withWatermark("f_ts", "10 minutes")
    )
    joined = purchases.join(
        others,
        (purchases.user_id == others.user_id)
        & (F.col("f_ts") >= F.col("p_ts"))
        & (F.col("f_ts") < F.col("p_ts") + F.expr("INTERVAL 30 MINUTES")),
    ).select("purchase_id", "follow_id")
    return (
        joined.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .start()
    )


def test_join_state_survives_checkpoint_restart(spark, tmp_path, state_provider):
    src, ckpt, out = (str(tmp_path / d) for d in ("src", "ckpt", "out"))

    # phase 1: a purchase with no follow-up yet — buffered in join state
    _write_events_file(spark, src, [(100, _ns(0), 1, "purchase", 9.0, "{}")])
    _drain(_start_join(spark, src, ckpt, out))
    assert spark.read.parquet(out).count() == 0  # nothing matched yet

    # phase 2: the matching follow-up arrives AFTER the restart — the
    # match can only emit from the recovered left-side buffer
    _write_events_file(spark, src, [(200, _ns(5), 1, "click", 1.0, "{}")])
    _drain(_start_join(spark, src, ckpt, out))
    rows = {(r.purchase_id, r.follow_id) for r in spark.read.parquet(out).collect()}
    assert rows == {(100, 200)}

    # state-loss control: only the follow-up, fresh checkpoint → no match
    src2, ckpt2, out2 = (str(tmp_path / d) for d in ("src2", "ckpt2", "out2"))
    _write_events_file(spark, src2, [(200, _ns(5), 1, "click", 1.0, "{}")])
    _drain(_start_join(spark, src2, ckpt2, out2))
    assert spark.read.parquet(out2).count() == 0


# ---------------------------------------------------------------------------
# 3. windowed aggregation partial-count state
# ---------------------------------------------------------------------------
def _start_hourly(spark, src: str, ckpt: str, out: str):
    """The s_x7_stream_hourly shape via streaming.windowed.hourly_counts,
    append mode (windows emit when the watermark closes them)."""
    from odoo_batch_processing_spark.streaming.sources import change_source
    from odoo_batch_processing_spark.streaming.windowed import hourly_counts

    return (
        hourly_counts(
            change_source(spark, src, max_files_per_trigger=1),
            watermark="10 minutes",
        )
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .start()
    )


def test_windowed_agg_state_survives_checkpoint_restart(spark, tmp_path, state_provider):
    src, ckpt, out = (str(tmp_path / d) for d in ("src", "ckpt", "out"))

    # phase 1: two hour-0 events — the window stays OPEN (watermark at
    # ~0:10), so the partial count n=2 lives only in operator state
    _write_events_file(
        spark, src,
        [(1, _ns(5), 1, "click", 1.0, "{}"), (2, _ns(20), 1, "click", 1.0, "{}")],
    )
    _drain(_start_hourly(spark, src, ckpt, out))
    assert spark.read.parquet(out).count() == 0  # window not closed yet

    # phase 2: a far-future event closes hour 0 AFTER the restart —
    # the emitted count includes phase 1's rows only if the agg
    # partials were recovered
    _write_events_file(spark, src, [(3, _ns(400), 1, "click", 1.0, "{}")])
    _drain(_start_hourly(spark, src, ckpt, out))
    emitted = {
        (r["hour_start"].isoformat(), r["n_events"])
        for r in spark.read.parquet(out).collect()
    }
    assert ("2024-01-01T00:00:00", 2) in emitted

    # state-loss control: fresh checkpoint seeing only the far-future
    # event emits NO hour-0 window at all
    src2, ckpt2, out2 = (str(tmp_path / d) for d in ("src2", "ckpt2", "out2"))
    _write_events_file(spark, src2, [(3, _ns(400), 1, "click", 1.0, "{}")])
    _drain(_start_hourly(spark, src2, ckpt2, out2))
    hours = {
        r["hour_start"].isoformat() for r in spark.read.parquet(out2).collect()
    }
    assert "2024-01-01T00:00:00" not in hours
