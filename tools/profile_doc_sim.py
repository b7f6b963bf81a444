#!/usr/bin/env python
"""Attribution profiler for x5_doc_sim_cosine's smoke-ladder curve
(VERDICT r7 item 2: the one >1 ladder norm without an attribution).

Decomposes the query per ladder mult into its two cost terms:

* the INDEX side (explode trigrams → tf groupBy → df prune) — volume
  grows exactly ×M with the replica corpus;
* the PAIR side (postings self-join + pair groupBy) — work is
  Σ_shingle C(df, 2) candidate slots, which under the REPLICA corpus
  grows faster than M: every 4th replica is an exact copy, so kept
  shingles' df multiplies with the copy count, and the df cap
  (min(5%·n, POSTING_ABS_CAP)) itself RISES with n until the absolute
  term binds at n ≥ 20k docs.

Prints, per mult: max_df, pruned postings, pair slots Σ C(df,2),
dots rows, and wall times for index-only vs full query — enough to
read whether runtime is linear in (index volume + pair slots), i.e.
the plan is healthy and the curve is the fixture's df-growth artifact.

    python tools/profile_doc_sim.py [--mults 1,2,4,8] [--sf-dir .../sf0.1]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    parser.add_argument("--mults", default="1,2,4,8")
    parser.add_argument(
        "--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    )
    args = parser.parse_args()
    mults = [int(m) for m in args.mults.split(",")]

    from pyspark.sql import functions as F

    from odoo_batch_processing_spark.operators.text import (
        POSTING_ABS_CAP,
        pruned_shingle_postings,
    )
    from odoo_batch_processing_spark.registry import all_queries
    from odoo_batch_processing_spark.session import get_spark, release_materialized
    from odoo_batch_processing_spark.sources.sinks import scratch_dir
    from tools.scale_smoke import build_corpus

    spark = get_spark("profile-doc-sim", cpus=args.cpus, shuffle_partitions=args.cpus)
    spark.sparkContext.setLogLevel("ERROR")
    query = all_queries(extended=True)["x5_doc_sim_cosine"]

    rows = []
    warmed = False
    for mult in mults:
        corpus = scratch_dir(f"profile-docsim-{mult}x")
        n_docs = build_corpus(spark, args.sf_dir, mult, corpus)
        if not warmed:
            query(spark, corpus).count()
            warmed = True
        release_materialized()
        spark.catalog.clearCache()

        # index side alone
        t0 = time.perf_counter()
        pruned, _n = pruned_shingle_postings(spark, corpus)
        postings = pruned.count()
        t_index = time.perf_counter() - t0

        # pair-slot mass the self-join must process: Σ_shingle C(df,2)
        stats = (
            pruned.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("df"))
            .agg(
                F.sum(F.col("df") * (F.col("df") - 1) / 2).alias("pair_slots"),
                F.max("df").alias("df_max"),
                F.count(F.lit(1)).alias("kept_shingles"),
            )
            .collect()[0]
        )

        # distinct surviving pairs (dots rows, pre-limit)
        a = pruned.select("shingle", F.col("doc_id").alias("doc_a"), F.col("tf").alias("tf_a"))
        b = pruned.select("shingle", F.col("doc_id").alias("doc_b"), F.col("tf").alias("tf_b"))
        dots_rows = (
            a.join(b, "shingle")
            .filter(F.col("doc_a") < F.col("doc_b"))
            .groupBy("doc_a", "doc_b")
            .count()
            .count()
        )

        release_materialized()
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        query(spark, corpus).count()
        t_full = time.perf_counter() - t0

        max_df = min(max(2, int(math.ceil(0.05 * n_docs))), POSTING_ABS_CAP)
        rows.append(
            {
                "mult": mult,
                "n_docs": n_docs,
                "df_cap": max_df,
                "postings": postings,
                "kept_shingles": int(stats["kept_shingles"]),
                "df_max": int(stats["df_max"]),
                "pair_slots": int(stats["pair_slots"]),
                "dots_rows": dots_rows,
                "t_index_sec": round(t_index, 2),
                "t_full_sec": round(t_full, 2),
            }
        )
        print(json.dumps(rows[-1]), file=sys.stderr)

    base = rows[0]
    print(f"{'mult':>4} {'docs':>7} {'cap':>5} {'postings':>9} {'pair_slots':>11} "
          f"{'dots':>9} {'t_idx':>6} {'t_full':>7} {'slots_x':>8} {'time_x':>7}")
    for r in rows:
        print(
            f"{r['mult']:>4} {r['n_docs']:>7} {r['df_cap']:>5} {r['postings']:>9} "
            f"{r['pair_slots']:>11} {r['dots_rows']:>9} {r['t_index_sec']:>6.2f} "
            f"{r['t_full_sec']:>7.2f} "
            f"{r['pair_slots'] / base['pair_slots']:>8.2f} "
            f"{r['t_full_sec'] / base['t_full_sec']:>7.2f}"
        )
    print(json.dumps({"metric": "profile_doc_sim", "results": rows}, separators=(",", ":")))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
