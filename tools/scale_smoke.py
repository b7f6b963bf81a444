#!/usr/bin/env python
"""Scale-behavior smoke: replicate the corpus M× and measure how the
near-dup / ANN / curation pipelines scale.

The sf fixtures prove CORRECTNESS; this tool probes the SCALE claim —
that the bucketed/inverted-index plans grow ~linearly in corpus size
(no hidden all-pairs term). It fabricates an M× corpus in .scratch:

* every 4th replica of a doc is an EXACT copy (a real dup cluster the
  pipeline must find — cluster size M/4);
* other replicas interleave a replica-specific token between every
  original token, so ALL their shingles differ from every other
  replica — they add index volume without adding near-dup pairs.

So the dup-pair workload grows ~M (clusters of M/4 across 1×..8×) and
the index workload grows exactly M, making "seconds vs M" a direct
read on plan scalability. Usage:

    python tools/scale_smoke.py [--mults 1,2,4,8] [--sf-dir .../sf0.1]

Prints one table + one JSON line (also written to SCALE_SMOKE.json).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_corpus(spark, sf_dir: str, mult: int, out: str) -> int:
    """Write the M× documents corpus; returns row count."""
    from pyspark.sql import functions as F

    from odoo_batch_processing_spark.operators.text import tokens

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    n = docs.count()
    reps = spark.range(mult).select(F.col("id").alias("rep"))
    # the interposer token is unique per (doc, replica): every shingle
    # of a scrambled replica contains it, so scrambled docs share NO
    # shingles with each other or the originals — they add pure index
    # volume, zero candidate pairs (the fixture vocabulary is tiny, so
    # a per-REP-only token would still collide across docs massively)
    rep_tok = F.concat(
        F.lit("r"),
        F.col("rep").cast("string"),
        F.lit("d"),
        F.col("doc_id").cast("string"),
    )
    scrambled = F.array_join(
        F.flatten(F.transform(tokens(F.col("text")), lambda x: F.array(x, rep_tok))),
        " ",
    )
    big = docs.crossJoin(reps).select(
        (F.col("doc_id") + F.col("rep") * n).alias("doc_id"),
        F.when(F.col("rep") % 4 == 0, F.col("text")).otherwise(scrambled).alias("text"),
        "lang",
        "source",
        F.length("text").alias("n_chars"),
    )
    big.write.mode("overwrite").parquet(os.path.join(out, "documents.parquet"))
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    m = emb.count()
    big_emb = emb.crossJoin(reps).select(
        (F.col("vec_id") + F.col("rep") * m).alias("vec_id"), "embedding", "label"
    )
    big_emb.write.mode("overwrite").parquet(os.path.join(out, "embeddings.parquet"))
    return n * mult


STAGES = (
    "x3_minhash_lsh",
    "x3_neardup_survivors",
    "x3_neardup_survivors_star",  # large-star/small-star CC engine
    "x3_incremental_neardup",  # batch (top decile) grows with corpus → ~linear
    "x4_cosine_topk",
    "x4_ivf_multiprobe",
    "x9_curation_pipeline",
    # round-4 session additions over the documents corpus:
    # - doc_sim/pagerank: scrambled replicas' shingles are all df=1 →
    #   pruned; postings stay ~constant while the index side grows M
    # - heavy hitters: interposer tokens add ~27k·M unique rare keys —
    #   the exact adversarial load Misra–Gries bounds state against
    "x5_doc_sim_cosine",
    "g_pagerank_simgraph",
    "x8_heavy_hitters",
    # this session's additions with corpus-scaling joins:
    # - triangles: wedge fan-out bounded by orientation; pair graph
    #   grows ~M like pagerank's
    # - containment: same capped inverted-index join as jaccard
    # - surprisal: vocabulary join grows with the interposer tokens
    "g_triangle_counts",
    "x3_containment",
    "x5_unigram_surprisal",
    # round-7 addition (VERDICT r6 item 3): the rebuilt media near-dup
    # — stream-simhash fold + capped banded self-join over the same
    # documents corpus (payload = attach_binary(text)). Expected curve
    # is x3_simhash-shaped: the per-doc shingle/vote fold dominates
    # (linear in corpus bytes); exact-copy replicas form the planted
    # dup clusters, scrambled replicas add fold volume but no pairs.
    "mm_neardup",
    # round-10 addition (VERDICT r9 #2): the DOULION sampled-triangle
    # twin — exact pass + k incidence + p=0.5 sampled pass over the
    # same capped pair graph as g_triangle_counts, so its curve should
    # track g_triangle_counts at ≲1.5× (the sampled pass re-counts on
    # half the edges ≈ 1/4 the wedges, 1/8 the surviving triangles)
    "g_doulion_triangles",
)


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    parser.add_argument("--mults", default="1,2,4,8")
    parser.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = parser.parse_args()
    mults = [int(m) for m in args.mults.split(",")]

    from bench import drain
    from odoo_batch_processing_spark.registry import all_queries
    from odoo_batch_processing_spark.session import get_spark, release_materialized
    from odoo_batch_processing_spark.sources.sinks import scratch_dir

    spark = get_spark("scale-smoke", cpus=args.cpus, shuffle_partitions=args.cpus)
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries(extended=True)

    results = []
    warmed = False
    for mult in mults:
        corpus = scratch_dir(f"scale-smoke-{mult}x")
        n_docs = build_corpus(spark, args.sf_dir, mult, corpus)
        if not warmed:  # JVM/codegen warmup outside the timed stages
            for name in STAGES:
                drain(queries[name](spark, corpus))
            warmed = True
        row = {"mult": mult, "n_docs": n_docs, "stages": {}}
        for name in STAGES:
            # honest timing: without this, a timed stage re-reads the
            # persisted intermediates its own warmup (or a prior stage)
            # cached, measuring a cache read instead of the pipeline
            release_materialized()
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            out_rows = drain(queries[name](spark, corpus))
            secs = round(time.perf_counter() - t0, 2)
            row["stages"][name] = {"sec": secs, "rows": out_rows}
        results.append(row)
        print(
            f"[{mult:2d}x] {n_docs:7d} docs  "
            + "  ".join(f"{s}={v['sec']:.1f}s/{v['rows']}r" for s, v in row["stages"].items()),
            file=sys.stderr,
        )

    # linearity read-out: seconds per 1k docs at each scale — flat-ish
    # numbers mean the plan has no quadratic term
    for name in STAGES:
        per_k = [r["stages"][name]["sec"] / (r["n_docs"] / 1000) for r in results]
        print(
            f"{name:24s} sec/1k-docs: " + "  ".join(f"{x:6.3f}" for x in per_k),
            file=sys.stderr,
        )

    payload = {"metric": "scale_smoke", "sf_dir": args.sf_dir, "results": results}
    line = json.dumps(payload, separators=(",", ":"))
    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "SCALE_SMOKE.json"), "w") as fh:
        fh.write(line + "\n")
    print(line)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
