#!/usr/bin/env python
"""Embedding-DIMENSION scale ladder: certify the vector family is
linear in dimensions-per-vector, not just in corpus size.

Why this exists (round 8): the corpus-count ladders replicate VECTORS,
so per-vector cost is a constant they cannot see — exactly the axis of
the round-7 ``normalized()`` finding (CollapseProject inlined the norm
fold into the transform lambda, Θ(d²) per row, 50× wall at d=512).
That bug is fixed and plan-scanned (tests/plan_scan.py), but nothing
certified the family's RUNTIME along d — the doc-length ladder
(tools/scale_doclen.py) is the text-side twin of this tool.

Mechanics: fabricate corpora with FIXED total float volume
(N·d ≈ const) and rising dimensions-per-vector (d × 1, 4, 16). Every
stage here is Θ(N·d) by design (pair sets shrink as N falls), so a
healthy engine stays ~flat across rungs while a per-vector quadratic
(Θ(N·d²) = volume·d) rises ~linearly in d — 16× by the last rung.

Flagging: two rules (tools/ladder_flags.py). Absolute —
seconds(rung)/seconds(rung0) > FLAG_RATIO on the last rung; loose
threshold (4×) because longer vectors legitimately shift work between
stages. Family divergence — at each rung, a stage whose ratio exceeds
2× the family median (and ≥1.5) flags even under the absolute line:
the pre-fix int8 Θ(d²) measured only ×2.4 at d×16 and was caught
solely by divergence from the flat-down family trend.

    python tools/scale_dim.py [--base-vecs 40000] [--base-dim 32]

Writes SCALE_DIM.json; exit 1 if any stage is flagged.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

#: dimensions-per-vector multipliers; vectors scale 1/M so volume is
#: constant. The ladder runs a rung deeper than the doc-length ladder
#: (×64 → d=2048 at the default base) because vector stages carry
#: higher fixed floors relative to their Θ(N·d) work: the pre-fix int8
#: quadratic measured only ×2.4 at d×16 — real, but under the flag
#: line; at ×64 a per-vector quadratic costs 64× rung-0 compute and
#: cannot hide under the floor.
MULTS = (1, 4, 16, 64)
FLAG_RATIO = 4.0

#: one stage per distinct d-consuming code path in the vector family
STAGES = (
    "x4_cosine_topk",  # brute force: normalize + broadcast pair dots
    "x4_ivf_topk",  # sign-bit cells + in-cell dots
    "x4_ivf_multiprobe",  # probe-cell selection (|v_i| sort) + probes
    "x4_int8_topk",  # quantize + integer dots
    "x4_kmeans_cells",  # medoid training loop (k broadcast dots/iter)
    "x3_embedding_neardup",  # in-cell all-pairs nearest neighbor
)


def build_corpus(spark, out: str, n_vecs: int, dim: int) -> None:
    """n_vecs synthetic embeddings of exactly ``dim`` float dims in
    (-2, 2) (signs balanced so the sign-bit cells populate evenly,
    like the fixture corpus), 10 labels — the fixture schema
    (vec_id BIGINT, embedding ARRAY<FLOAT>, label INT)."""
    from pyspark.sql import functions as F

    emb = spark.range(n_vecs).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(1), F.lit(dim)),
            lambda i: (
                (F.xxhash64(F.col("id") * 131 + i) % 2001) / F.lit(1000.0)
            ).cast("float"),
        ).alias("embedding"),
        (F.col("id") % 10).cast("int").alias("label"),
    )
    emb.repartition(8).write.mode("overwrite").parquet(
        os.path.join(out, "embeddings.parquet")
    )


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--base-vecs", type=int, default=40000)
    parser.add_argument("--base-dim", type=int, default=32)
    parser.add_argument(
        "--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    )
    args = parser.parse_args()

    from bench import drain
    from odoo_batch_processing_spark.registry import all_queries
    from odoo_batch_processing_spark.session import get_spark, release_materialized
    from odoo_batch_processing_spark.sources.sinks import scratch_dir

    spark = get_spark("scale-dim", cpus=args.cpus, shuffle_partitions=args.cpus)
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries(extended=True)

    results = []
    for mult in MULTS:
        n_vecs = args.base_vecs // mult
        dim = args.base_dim * mult
        corpus = scratch_dir(f"dim-{mult}x")
        build_corpus(spark, corpus, n_vecs, dim)
        # warm pass per rung (codegen + scan cache), then the timed pass
        for name in STAGES:
            drain(queries[name](spark, corpus))
        row = {"mult": mult, "n_vecs": n_vecs, "dim": dim, "stages": {}}
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
            f"[d={dim:4d} x {n_vecs:6d} vecs] "
            + "  ".join(f"{s}={v['sec']:.1f}s" for s, v in row["stages"].items()),
            file=sys.stderr,
        )

    from tools.ladder_flags import flagged_stages

    # a sub-10ms rung 0 would make the ratio meaningless (and the
    # old `else 0.0` guard silently UN-flaggable) — fail loud on
    # the floor instead of green-lighting an unmeasurable stage
    stage_secs = {
        name: [r["stages"][name]["sec"] for r in results] for name in STAGES
    }
    # both rules: absolute top-rung > FLAG_RATIO, plus per-rung family
    # divergence (>2× family-median ratio — the rule that would have
    # caught the pre-fix int8 Θ(d²) at d×16, where it measured ×2.4:
    # real, but under the absolute line; see tools/ladder_flags.py)
    flagged, divergence = flagged_stages(stage_secs, FLAG_RATIO)
    print(f"{'stage':24s} " + "  ".join(f"d*{m:<4d}" for m in MULTS), file=sys.stderr)
    for name in STAGES:
        secs = stage_secs[name]
        ratio = secs[-1] / max(secs[0], 0.01)
        dr = divergence[name]["divergent_rungs"]
        print(
            f"{name:24s} " + "  ".join(f"{s:6.2f}" for s in secs)
            + f"  (x{ratio:.1f}{'  DIVERGENT@' + str(dr) if dr else ''})",
            file=sys.stderr,
        )

    payload = {
        "metric": "scale_dim",
        "base_vecs": args.base_vecs,
        "base_dim": args.base_dim,
        "mults": list(MULTS),
        "flag_ratio": FLAG_RATIO,
        "flagged_dim_superlinear": flagged,
        "divergence": divergence,
        "results": results,
    }
    line = json.dumps(payload, separators=(",", ":"))
    with open(
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "SCALE_DIM.json",
        ),
        "w",
    ) as fh:
        fh.write(line + "\n")
    print(line)
    return 1 if flagged else 0


if __name__ == "__main__":
    raise SystemExit(main())
