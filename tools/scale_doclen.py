#!/usr/bin/env python
"""Document-LENGTH scale ladder: certify the text/shingle family is
linear in tokens-per-document, not just in corpus size.

Why this exists (round 8): the corpus-count ladders (scale_smoke /
scale_suite) replicate DOCS, so per-document cost is a constant they
cannot see — the Θ(T²) shingle re-tokenization (85× at 1 000-token
docs) was invisible to both while sitting in 16 queries. This ladder
varies the other axis: it fabricates corpora with FIXED total token
volume (N·T ≈ const) and rising tokens-per-doc (T × 1, 4, 16), so a
pipeline that is linear in token volume stays ~flat across the rungs
while a per-doc quadratic rises ~linearly in T (16× by the last rung).

Flagging: seconds(rung)/seconds(rung0) > FLAG_RATIO on the last rung
(T ×16, volume ×1). The threshold is loose (4×) because longer docs
legitimately shift work between stages (more shingles per doc, fewer
docs/pairs) — the quadratic signature this exists to catch is ≳10×.
A second, RELATIVE rule (tools/ladder_flags.py) flags a stage whose
per-rung ratio exceeds 2× the family median even under the absolute
line — the rule that would have caught int8's ×2.4-at-d×16.

    python tools/scale_doclen.py [--base-docs 4000] [--base-tokens 64]

Writes SCALE_DOCLEN.json; exit 1 if any stage is flagged.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

#: tokens-per-doc multipliers; docs scale 1/M so volume is constant
MULTS = (1, 4, 16)
FLAG_RATIO = 4.0

#: the length-sensitive stages: every family that tokenizes/shingles
#: per document (the 16-query round-8 blast radius, one per builder)
STAGES = (
    "x3_ngram_jaccard",  # dedup.shingles (width 3)
    "x3_minhash_lsh",  # shingles -> minhash signatures
    "x3_simhash",  # token-fold simhash
    "x5_doc_sim_cosine",  # text._trigrams inverted index
    "x5_gopher_repetition",  # _bigrams + token stats
    "x5_chunk_dedup_frac",  # chunk builder (width 10)
    "x9_curation_pipeline",  # quality gates: shingles(text, 5) + folds
    "x5_text_features",  # per-row token features (control: no shingles)
    # bigram LM (round 16): bigrams per doc = tokens-1, so this axis
    # is exactly its work driver; the map-side arrays_zip build must
    # stay linear in T while the constant-volume model joins shrink
    # with n_docs
    "x5_bigram_surprisal",
    # multimodal: payload = utf-8(text), so tokens-per-doc IS the
    # payload-BYTES axis — the round-7 Θ(bytes²) finding's axis,
    # previously certified only via corpus count
    "mm_neardup",  # hex-shingle simhash over payload
    "mm_decode_features",  # Arrow-batched numpy decode per payload
    "mm_frame_sample",  # fixed-size frame split (substring per frame)
)


def build_corpus(
    spark, out: str, n_docs: int, n_tokens: int, vocab: int = 500, files: int = 8
) -> None:
    """n_docs synthetic docs of exactly n_tokens tokens from a small
    shared vocabulary (so shingles do collide across docs, exercising
    the df/pair paths like real text). ``vocab`` widens the vocabulary
    for callers that need LOW cross-doc similarity (tools/scale_cores:
    at 16k docs the default 500-word vocabulary welds the corpus into
    one giant near-dup component and CC hits its iteration cap —
    per-doc compute is the thing under test there, not pair volume).
    ``files`` controls the written layout: THIS ladder keeps the
    historical 8-file layout so its rung timings stay comparable to
    the committed artifact (r18 measured: an 8→64 re-layout speeds the
    many-doc rung 0 ~25%, which alone shifts every divergence ratio);
    scale_cores passes 64 so its scan arrives split past the core
    counts under test."""
    from pyspark.sql import functions as F

    docs = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.array_join(
            F.transform(
                F.sequence(F.lit(1), F.lit(n_tokens)),
                lambda i: F.concat(
                    F.lit("w"),
                    ((F.xxhash64(F.col("id") * 7 + i) % vocab) + vocab).cast("string"),
                ),
            ),
            " ",
        ).alias("text"),
    ).select(
        "doc_id",
        "text",
        F.lit("en").alias("lang"),
        F.lit("synthetic").alias("source"),
        F.length("text").alias("n_chars"),
    )
    docs.repartition(files).write.mode("overwrite").parquet(
        os.path.join(out, "documents.parquet")
    )


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--base-docs", type=int, default=4000)
    parser.add_argument("--base-tokens", type=int, default=64)
    parser.add_argument(
        "--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    )
    args = parser.parse_args()

    from bench import drain
    from odoo_batch_processing_spark.registry import all_queries
    from odoo_batch_processing_spark.session import get_spark, release_materialized
    from odoo_batch_processing_spark.sources.sinks import scratch_dir

    spark = get_spark("scale-doclen", cpus=args.cpus, shuffle_partitions=args.cpus)
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries(extended=True)

    results = []
    warmed = False
    for mult in MULTS:
        n_docs = args.base_docs // mult
        n_tokens = args.base_tokens * mult
        corpus = scratch_dir(f"doclen-{mult}x")
        build_corpus(spark, corpus, n_docs, n_tokens)
        if not warmed:
            for name in STAGES:
                drain(queries[name](spark, corpus))
            warmed = True
        row = {"mult": mult, "n_docs": n_docs, "tokens_per_doc": n_tokens, "stages": {}}
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
            f"[T={n_tokens:5d} x {n_docs:5d} docs] "
            + "  ".join(f"{s}={v['sec']:.1f}s" for s, v in row["stages"].items()),
            file=sys.stderr,
        )

    from tools.ladder_flags import flagged_stages

    # a sub-10ms rung 0 would make the ratio meaningless (and the
    # old `else 0.0` guard silently UN-flaggable) — fail loud on
    # the floor instead of green-lighting an unmeasurable stage.
    # Both rules apply: absolute top-rung > FLAG_RATIO plus per-rung
    # family divergence (tools/ladder_flags.py — the int8 lesson).
    stage_secs = {
        name: [r["stages"][name]["sec"] for r in results] for name in STAGES
    }
    # output rows per rung feed the output-bound exemption: a stage
    # emitting an output relation that grows as fast as its seconds
    # (mm_neardup's pairs, ×29 rows for ×1.6 sec at T×16) is linear in
    # its output, not per-doc superlinear — see ladder_flags docstring
    stage_rows = {
        name: [r["stages"][name]["rows"] for r in results] for name in STAGES
    }
    flagged, divergence = flagged_stages(
        stage_secs, FLAG_RATIO, stage_rows=stage_rows
    )
    print(f"{'stage':26s} " + "  ".join(f"T*{m:<4d}" for m in MULTS), file=sys.stderr)
    for name in STAGES:
        secs = stage_secs[name]
        ratio = secs[-1] / max(secs[0], 0.01)
        dr = divergence[name]["divergent_rungs"]
        print(
            f"{name:26s} " + "  ".join(f"{s:6.2f}" for s in secs)
            + f"  (x{ratio:.1f}{'  DIVERGENT@' + str(dr) if dr else ''})",
            file=sys.stderr,
        )

    payload = {
        "metric": "scale_doclen",
        "base_docs": args.base_docs,
        "base_tokens": args.base_tokens,
        "mults": list(MULTS),
        "flag_ratio": FLAG_RATIO,
        "flagged_length_superlinear": flagged,
        "divergence": divergence,
        "results": results,
    }
    line = json.dumps(payload, separators=(",", ":"))
    with open(
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "SCALE_DOCLEN.json",
        ),
        "w",
    ) as fh:
        fh.write(line + "\n")
    print(line)
    return 1 if flagged else 0


if __name__ == "__main__":
    raise SystemExit(main())
