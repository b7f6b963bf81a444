#!/usr/bin/env python
"""JSON-props-SIZE scale ladder: certify the x6 family is linear in
bytes-per-props-blob, closing the one "documented, unladdered" row of
SCALE.md's data-axis certification matrix.

Same construction as the other axis ladders: corpora with FIXED total
JSON volume (N·bytes ≈ const) and rising bytes-per-blob (×1, 4, 16).
`from_json` with an explicit schema, `get_json_object`, and the
VARIANT parse are all single-pass over the string, so every stage
should stay ~flat; a per-row quadratic (e.g. an accidental re-parse
per extracted path multiplied by path count growing with the blob)
would rise toward 16×.

The fabricated props keep the fixture's `"k"` key FIRST and append a
pad field, so typed extraction finds real values (rows stay
meaningful) while the blob grows.

    python tools/scale_jsonsize.py [--base-events 200000] [--base-bytes 64]

Writes SCALE_JSONSIZE.json; exit 1 if any stage is flagged — by the
absolute top-rung rule (> FLAG_RATIO) or by family divergence
(tools/ladder_flags.py: per-rung ratio > 2× the family median and
≥ 1.5 — the int8 lesson applied to every axis ladder).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MULTS = (1, 4, 16)
FLAG_RATIO = 4.0

STAGES = (
    "x6_json_extract",  # from_json(schema) + get_json_object twin
    "x6_json_grouped",  # parse pushed into the scan projection, then agg
    "x6_null_safe_eq",  # get_json_object present + missing paths
    "x6_variant_shred",  # parse_json once -> typed variant_get paths
)


def build_corpus(spark, out: str, n_events: int, props_bytes: int) -> None:
    """n_events synthetic events whose props blob is ~props_bytes of
    JSON: the fixture's ``{"k": <int>}`` shape plus a deterministic pad
    string. All six fixture columns are present so any x6 query's
    projection resolves."""
    from pyspark.sql import functions as F

    pad_len = max(0, props_bytes - 24)  # overhead: {"k": NN, "pad": ""}
    ev = spark.range(n_events).select(
        F.col("id").alias("event_id"),
        F.timestamp_seconds(
            F.lit(1704067200) + F.pmod(F.xxhash64(F.col("id")), F.lit(86400 * 30))
        ).alias("ts"),
        F.pmod(F.xxhash64(F.col("id") * 3), F.lit(1000)).alias("user_id"),
        F.element_at(
            F.array(F.lit("click"), F.lit("view"), F.lit("buy")),
            (F.pmod(F.col("id"), F.lit(3)) + 1).cast("int"),
        ).alias("event_type"),
        (F.pmod(F.xxhash64(F.col("id") * 7), F.lit(10000)) / 100.0).alias("value"),
        F.concat(
            F.lit('{"k": '),
            F.pmod(F.xxhash64(F.col("id") * 11), F.lit(100)).cast("string"),
            F.lit(', "pad": "'),
            F.repeat(F.lit("x"), pad_len),
            F.lit('"}'),
        ).alias("props"),
    )
    ev.repartition(16).write.mode("overwrite").parquet(
        os.path.join(out, "events.parquet")
    )


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--base-events", type=int, default=200_000)
    parser.add_argument("--base-bytes", type=int, default=64)
    parser.add_argument(
        "--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    )
    args = parser.parse_args()

    from bench import drain
    from odoo_batch_processing_spark.registry import all_queries
    from odoo_batch_processing_spark.session import get_spark, release_materialized
    from odoo_batch_processing_spark.sources.sinks import scratch_dir

    spark = get_spark("scale-jsonsize", cpus=args.cpus, shuffle_partitions=args.cpus)
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries(extended=True)

    results = []
    for mult in MULTS:
        n_events = args.base_events // mult
        nbytes = args.base_bytes * mult
        corpus = scratch_dir(f"jsonsize-{mult}x")
        build_corpus(spark, corpus, n_events, nbytes)
        for name in STAGES:  # warm pass per rung
            drain(queries[name](spark, corpus))
        row = {"mult": mult, "n_events": n_events, "props_bytes": nbytes, "stages": {}}
        for name in STAGES:
            release_materialized()
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            out_rows = drain(queries[name](spark, corpus))
            row["stages"][name] = {
                "sec": round(time.perf_counter() - t0, 2),
                "rows": out_rows,
            }
        results.append(row)
        print(
            f"[{nbytes:5d}B x {n_events:6d} events] "
            + "  ".join(f"{s}={v['sec']:.1f}s" for s, v in row["stages"].items()),
            file=sys.stderr,
        )

    from tools.ladder_flags import flagged_stages

    # both rules: absolute top-rung > FLAG_RATIO plus per-rung family
    # divergence (tools/ladder_flags.py — the int8 lesson); the
    # min_ratio guard matters most HERE, where the healthy family
    # falls to ×0.2 and a merely-flat stage must not flag
    stage_secs = {
        name: [r["stages"][name]["sec"] for r in results] for name in STAGES
    }
    flagged, divergence = flagged_stages(stage_secs, FLAG_RATIO)
    print(f"{'stage':20s} " + "  ".join(f"B*{m:<4d}" for m in MULTS), file=sys.stderr)
    for name in STAGES:
        secs = stage_secs[name]
        ratio = secs[-1] / max(secs[0], 0.01)
        dr = divergence[name]["divergent_rungs"]
        print(
            f"{name:20s} " + "  ".join(f"{s:6.2f}" for s in secs)
            + f"  (x{ratio:.1f}{'  DIVERGENT@' + str(dr) if dr else ''})",
            file=sys.stderr,
        )

    payload = {
        "metric": "scale_jsonsize",
        "base_events": args.base_events,
        "base_bytes": args.base_bytes,
        "mults": list(MULTS),
        "flag_ratio": FLAG_RATIO,
        "flagged_size_superlinear": flagged,
        "divergence": divergence,
        "results": results,
    }
    line = json.dumps(payload, separators=(",", ":"))
    with open(
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "SCALE_JSONSIZE.json",
        ),
        "w",
    ) as fh:
        fh.write(line + "\n")
    print(line)
    return 1 if flagged else 0


if __name__ == "__main__":
    raise SystemExit(main())
