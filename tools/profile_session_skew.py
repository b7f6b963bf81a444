#!/usr/bin/env python
"""Hot-key skew probe for sessionization: single per-user Window vs
the chunk-stitch decomposition (operators/windows.sessionize_chunked).

Why: AQE's skew handling splits JOIN/AGG partitions, not Window
partitions — lag/cumsum need the whole ordered partition in one task,
so a power user serializes onto one core no matter the cluster size.
The probe fabricates corpora with CONSTANT total rows where a rising
share lands on one hot user, and times both forms. Expected: the
single-Window wall rises toward the serial cost of the hot partition;
the chunked form stays ~flat (the heavy per-event pass partitions by
(user, time-chunk), and the per-user stitch runs over chunk summaries
~5 orders of magnitude smaller).

    python tools/profile_session_skew.py [--rows 4000000]

Writes SKEW_SESSION.json. Each rung also records ``auto_choice`` +
``auto_probe_sec`` — :func:`windows.choose_sessionize_form`'s
dispatch on that corpus — and ``auto_optimal``: whether the
dispatcher picked the form the timings show to be faster. Round 13
closed the r12 blemish that the chunked escape hatch was only a
documented knob: ``sessionize_auto`` is the production entrypoint,
and this artifact is the receipt that its sampled hot-key probe
lands on the winning side of the measured crossover at every rung.
The CATALOG query stays pinned to the single-Window spec (fixture
keys are unskewed, and the pinned plan then certifies the spec, not
a probe-dependent branch).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HOT_SHARES = (0.01, 0.25, 0.90)
N_COLD_USERS = 10_000
SPAN_DAYS = 30


def build_corpus(spark, out: str, n_rows: int, hot_share: float) -> None:
    """n_rows events over SPAN_DAYS; floor(hot_share*n_rows) on user 0,
    the rest hashed over N_COLD_USERS users. Timestamps hash-scattered
    over the span so sessions and chunk boundaries occur naturally."""
    from pyspark.sql import functions as F

    n_hot = int(n_rows * hot_share)
    span_sec = SPAN_DAYS * 24 * 3600
    ev = spark.range(n_rows).select(
        F.col("id").alias("event_id"),
        F.timestamp_seconds(
            F.lit(1704067200) + F.pmod(F.xxhash64(F.col("id") * 31), F.lit(span_sec))
        ).alias("ts"),
        F.when(F.col("id") < n_hot, F.lit(0))
        .otherwise(F.pmod(F.xxhash64(F.col("id")), F.lit(N_COLD_USERS)) + 1)
        .alias("user_id"),
    )
    ev.repartition(32).write.mode("overwrite").parquet(out)


def single_window_sessions(spark, path):
    from odoo_batch_processing_spark.operators.windows import sessionize_window

    return sessionize_window(spark.read.parquet(path)).select(
        "user_id", "session_id", "n_events"
    )


def chunked_sessions(spark, path):
    # time the EXACT form sessionize_auto dispatches (review r13: a
    # receipt measured at a different chunk width certifies a plan
    # the dispatcher never executes)
    from odoo_batch_processing_spark.operators.windows import (
        SESSION_AUTO_CHUNK_MINUTES,
        sessionize_chunked,
    )

    ev = spark.read.parquet(path)
    return sessionize_chunked(ev, chunk_minutes=SESSION_AUTO_CHUNK_MINUTES).select(
        "user_id", "session_id", "n_events"
    )


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--rows", type=int, default=4_000_000)
    parser.add_argument(
        "--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    )
    args = parser.parse_args()

    from odoo_batch_processing_spark.session import get_spark, release_materialized
    from odoo_batch_processing_spark.sources.sinks import scratch_dir

    spark = get_spark("session-skew", cpus=args.cpus, shuffle_partitions=args.cpus)
    spark.sparkContext.setLogLevel("ERROR")

    results = []
    for share in HOT_SHARES:
        path = os.path.join(scratch_dir(f"skew-{int(share * 100)}"), "events.parquet")
        build_corpus(spark, path, args.rows, share)
        row = {"hot_share": share, "rows": args.rows}
        for label, fn in (("window", single_window_sessions), ("chunked", chunked_sessions)):
            fn(spark, path).count()  # warm (codegen + scan)
            # drop the materialize_once pin from the warm pass —
            # otherwise the timed chunked run sameResult-matches the
            # cached window output and measures only the stitch
            release_materialized()
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            n = fn(spark, path).count()
            row[label] = {"sec": round(time.perf_counter() - t0, 2), "sessions": n}
            release_materialized()
            spark.catalog.clearCache()
        # value identity at every skew point, not just speed
        a = single_window_sessions(spark, path)
        b = chunked_sessions(spark, path)
        row["identical"] = (
            a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()
        )
        release_materialized()
        spark.catalog.clearCache()
        # the dispatcher's call on this corpus, and whether it matches
        # the measured winner (ties below 20% spread count as either)
        from odoo_batch_processing_spark.operators.windows import (
            choose_sessionize_form,
        )

        t0 = time.perf_counter()
        row["auto_choice"] = choose_sessionize_form(spark.read.parquet(path))
        row["auto_probe_sec"] = round(time.perf_counter() - t0, 3)
        w, c = row["window"]["sec"], row["chunked"]["sec"]
        measured_winner = "window" if w <= c else "chunked"
        row["auto_optimal"] = (
            row["auto_choice"] == measured_winner or abs(w - c) <= 0.2 * max(w, c)
        )
        results.append(row)
        print(
            f"[hot={share:4.0%}] window={row['window']['sec']:7.2f}s  "
            f"chunked={row['chunked']['sec']:7.2f}s  "
            f"auto={row['auto_choice']} (probe {row['auto_probe_sec']}s, "
            f"optimal={row['auto_optimal']})  "
            f"sessions={row['window']['sessions']}  identical={row['identical']}",
            file=sys.stderr,
        )

    payload = {
        "metric": "session_skew",
        "rows": args.rows,
        "hot_shares": list(HOT_SHARES),
        "results": results,
    }
    line = json.dumps(payload, separators=(",", ":"))
    with open(
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "SKEW_SESSION.json",
        ),
        "w",
    ) as fh:
        fh.write(line + "\n")
    print(line)
    return 0 if all(r["identical"] and r["auto_optimal"] for r in results) else 1


if __name__ == "__main__":
    raise SystemExit(main())
