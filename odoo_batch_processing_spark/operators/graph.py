"""Graph analytics over derived document graphs (PageRank centrality).

The reference has no graph surface (its 716-line userscript is a
row-update engine); this module extends the engine's iterative-
algorithm family (k-means in operators/similarity.py, connected
components in operators/dedup.py) with PageRank — the canonical
"rank by link structure" pass a curation pipeline uses to pick
CENTRAL survivors inside near-duplicate neighborhoods instead of
arbitrary min-id ones.

Determinism contract (how an iterative double-precision algorithm can
sit under a DuckDB hash oracle): per-edge contributions rank/deg are
quantized to integers — floor(x · 1e12) — before the per-target SUM,
so the only accumulation is EXACT bigint addition, immune to Spark's
partition-order-dependent double summation. Every remaining floating
op (the division, the scale/damping multiplies, the base add) is a
fixed-shape IEEE expression evaluated identically by both engines.
The quantization error (≤ deg · 1e-12 per node per iteration) is the
deliberate price of a bit-stable fixed-point PageRank; at 1e12 scale
it is far below any ranking-relevant difference.

100 TB shape: the rank state and degree table are one row per vertex,
partitioned by id; each iteration is one equi-join (edges ⋈ ranks on
src — both sides shuffle-partitioned by the join key) and one
groupBy(dst) with map-side partial sums of bigints. Lineage is cut
per iteration (session.truncate_lineage — reliable-checkpoint switch
applies), so plan depth stays constant over iterations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from odoo_batch_processing_spark.session import materialize_once, truncate_lineage

#: fixed-point quantization scale for edge contributions (see module
#: docstring); 1e12 keeps bigint sums far from overflow even at
#: billions of edges per target (1e12 · ranks ≤ 1 sums stay < 2^63).
QUANT_SCALE = 1e12


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    iters: int = 3,
) -> DataFrame:
    """Fixed-iteration PageRank over a directed edge list in which
    every vertex has at least one out-edge (true by construction for
    symmetrized undirected graphs, which is what the doc-similarity
    query feeds in) — so there is no dangling-mass redistribution and
    no per-iteration driver scalar.

    Returns one row per vertex: ``id``, ``deg`` (out-degree),
    ``rank`` — including vertices with no IN-edges, which receive only
    the (1−d)/N base mass each round but keep contributing their own.
    Fixed ``iters`` (not convergence-tested) keeps the result
    oracle-expressible as an unrolled CTE.
    """
    deg = edges.groupBy(src).agg(F.count(F.lit(1)).alias("deg"))
    nodes = deg.select(F.col(src).alias("id")).transform(materialize_once)
    # one column-pruned count over the (already aggregated) degree
    # table — the same driver-side scalar idiom as x5_tfidf_top_terms
    n = nodes.count()
    if n == 0:
        # empty graph: 1/n below would divide by zero — return the
        # correctly-typed empty relation so the operator composes
        # after a filters-to-zero upstream (tests/test_empty_corpus.py)
        return deg.select(
            F.col(src).alias("id"),
            F.col("deg"),
            F.lit(None).cast("double").alias("rank"),
        )
    out_edges = edges.join(deg, src).transform(materialize_once)
    ranks = nodes.select(
        "id", F.lit(1.0 / float(n)).alias("rank")
    ).transform(truncate_lineage)
    base = F.lit(0.15) / F.lit(float(n))  # literal 0.15, NOT 1-damping:
    # Python's (1-0.85) is 0.15000000000000002 — one ulp off the 0.15
    # the SQL oracle parses, which would leak into every rank
    assert damping == 0.85, "oracle is unrolled for the standard d=0.85"
    for _ in range(iters):
        contrib = out_edges.join(ranks, out_edges[src] == ranks["id"]).select(
            F.col(dst).alias("id"),
            F.floor(F.col("rank") / F.col("deg") * F.lit(QUANT_SCALE))
            .cast("bigint")
            .alias("q"),
        )
        # LEFT join from the full vertex set: a vertex with out-edges
        # but NO in-edges receives zero mass (qs → 0), yet must stay in
        # the rank relation — both to appear in the output ("one row
        # per vertex") and to keep CONTRIBUTING its own rank next
        # iteration (dropping it would also silently delete its
        # outgoing mass). On the symmetrized catalog graph every
        # vertex has in-edges and this is the same inner-join plan.
        ranks = (
            nodes.join(contrib.groupBy("id").agg(F.sum("q").alias("qs")), "id", "left")
            .select(
                "id",
                (
                    base
                    + F.lit(damping)
                    * (F.coalesce(F.col("qs"), F.lit(0)).cast("double") / F.lit(QUANT_SCALE))
                ).alias("rank"),
            )
            .transform(truncate_lineage)
        )
    return ranks.join(deg.select(F.col(src).alias("id"), "deg"), "id").select(
        "id", "deg", "rank"
    )


def _q_g_pagerank_simgraph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank centrality over the trigram co-occurrence graph: docs
    are vertices, an (undirected) edge joins any two docs sharing a
    non-stop trigram shingle — the same pruned inverted index the
    sparse doc-cosine query builds (operators/text.py
    _q_x5_doc_sim_cosine: df ≥ 2 and df ≤ 5%-of-corpus). 3 damped
    iterations at d = 0.85; output is every connected doc with its
    degree and rank.
    """
    from odoo_batch_processing_spark.operators.text import pruned_shingle_postings

    pruned, _n_docs = pruned_shingle_postings(spark, sf_dir)
    pruned = pruned.select("doc_id", "shingle")
    a = pruned.select("shingle", F.col("doc_id").alias("src"))
    b = pruned.select("shingle", F.col("doc_id").alias("dst"))
    edges = (
        a.join(b, "shingle")
        .filter(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
    )
    return pagerank(edges, iters=3).select(
        F.col("id").alias("doc_id"), "deg", "rank"
    )


QUERIES: dict = {}
ORACLES: dict = {}

QUERIES_EXT = {"g_pagerank_simgraph": _q_g_pagerank_simgraph}

# the SAME tokenization/shingle fragments the text module's oracles
# use — imported, not redefined, so the two stay in lockstep with
# pruned_shingle_postings
from odoo_batch_processing_spark.operators.text import (  # noqa: E402
    _TOKS,
    _TRIGRAMS_SQL,
)

# one unrolled iteration of the fixed-point update (see pagerank());
# {prev} is the previous rank CTE name
_ITER_SQL = """
    SELECT e.dst AS id,
           CAST(0.15 AS DOUBLE) / n.n
           + CAST(0.85 AS DOUBLE)
             * (CAST(CAST(SUM(CAST(floor(p.rank / e.deg * 1e12) AS BIGINT)) AS BIGINT) AS DOUBLE) / 1e12)
           AS rank
    FROM sym e JOIN {prev} p ON e.src = p.id CROSS JOIN n
    GROUP BY e.dst, n.n
"""

ORACLES_EXT = {
    "g_pagerank_simgraph": f"""
    WITH doc_terms AS (
        SELECT doc_id, shingle, COUNT(1) AS tf
        FROM (
            SELECT doc_id, unnest({_TRIGRAMS_SQL}) AS shingle
            FROM (SELECT doc_id, {_TOKS} AS tk FROM documents)
        )
        GROUP BY doc_id, shingle
    ), keep AS (
        SELECT shingle FROM doc_terms GROUP BY shingle
        HAVING COUNT(1) >= 2
           AND COUNT(1) <= greatest(2, CAST(ceil(0.05 * (SELECT COUNT(1) FROM documents)) AS BIGINT))
    ), pruned AS (
        SELECT doc_id, shingle FROM doc_terms JOIN keep USING (shingle)
    ), pairs AS (
        SELECT DISTINCT a.doc_id AS src, b.doc_id AS dst
        FROM pruned a JOIN pruned b USING (shingle)
        WHERE a.doc_id <> b.doc_id
    ), deg AS (
        SELECT src AS id, COUNT(1) AS deg FROM pairs GROUP BY src
    ), sym AS (
        SELECT p.src, p.dst, d.deg FROM pairs p JOIN deg d ON p.src = d.id
    ), n AS (
        SELECT CAST(COUNT(1) AS DOUBLE) AS n FROM deg
    ), r0 AS (
        SELECT id, CAST(1 AS DOUBLE) / n.n AS rank FROM deg CROSS JOIN n
    ), r1 AS ({_ITER_SQL.format(prev="r0")}
    ), r2 AS ({_ITER_SQL.format(prev="r1")}
    ), r3 AS ({_ITER_SQL.format(prev="r2")}
    )
    SELECT r3.id AS doc_id, deg.deg, r3.rank
    FROM r3 JOIN deg ON deg.id = r3.id
    """,
}
