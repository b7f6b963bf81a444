"""Deduplication operators (X2 exact; X3 near-dup) — the first-class
training-data-pipeline surface (BASELINE.json north star).

Exact dedup at 100 TB is a hash shuffle on the dedup key. Two idioms:

* ``dropDuplicates(keys)`` — keeps an ARBITRARY survivor per group
  (first seen per partition); cheap but nondeterministic, fine when
  any copy will do.
* deterministic dedup — groupBy(key).agg(min(id)): same shuffle cost,
  reproducible survivor. The engine's registry queries use this form
  so results are oracle-checkable; pipelines should too (reproducible
  training sets).

Keying on a fingerprint (md5 of normalized text — functions in
operators/text.py) instead of the raw text keeps the shuffle narrow:
16 bytes/row instead of the full document. At 100 TB that is the
difference between shuffling ~2 TB of keys and shuffling the corpus.

Near-dup (MinHash-LSH, SimHash, n-gram Jaccard, embedding cosine)
lives in this module too — see the ``near_*`` functions below
(added with the similarity stack).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession, functions as F

from odoo_batch_processing_spark.operators.text import fingerprint
from odoo_batch_processing_spark.sources.loader import load_table


def exact_dedup(df: DataFrame, keys: Sequence[str]) -> DataFrame:
    """dropDuplicates wrapper (arbitrary survivor — document why you
    can accept that before using it; otherwise use
    :func:`deterministic_dedup`)."""
    return df.dropDuplicates(list(keys))


def deterministic_dedup(df: DataFrame, keys: Sequence[str], id_col: str) -> DataFrame:
    """One survivor per key group: the row whose ``id_col`` is minimal.

    Implemented as min(id) per key + semi join back (two narrow
    shuffles on the same key → Catalyst/AQE co-plans them) rather than
    a Window row_number (which would sort within groups needlessly).
    """
    keep = df.groupBy(*keys).agg(F.min(id_col).alias(id_col))
    return df.join(keep, [*keys, id_col], "left_semi")


def _q_x2_dedup_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact near-normalized dedup over documents: group by content
    fingerprint, keep min doc_id, count copies."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(fingerprint(F.col("text")).alias("fp"), "doc_id")
        .groupBy("fp")
        .agg(
            F.min("doc_id").alias("keep_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def _q_x2_dedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The deduplicated relation itself (deterministic survivor)."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", fingerprint(F.col("text")).alias("fp")
    )
    return deterministic_dedup(docs, ["fp"], "doc_id").select("doc_id", "lang", "source")


def _q_x2_distinct_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plain DISTINCT on a column subset (the dropDuplicates shape
    made deterministic by projecting only the key columns)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("lang", "source").distinct()


QUERIES = {
    "x2_dedup_fingerprint": _q_x2_dedup_fingerprint,
    "x2_dedup_survivors": _q_x2_dedup_survivors,
    "x2_distinct_pairs": _q_x2_distinct_pairs,
}

_FP = "md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))))"

ORACLES = {
    "x2_dedup_fingerprint": f"""
        SELECT {_FP} AS fp,
               MIN(doc_id) AS keep_id,
               COUNT(1) AS n_copies
        FROM documents GROUP BY 1
    """,
    "x2_dedup_survivors": f"""
        WITH keyed AS (SELECT doc_id, lang, source, {_FP} AS fp FROM documents),
             keep AS (SELECT fp, MIN(doc_id) AS doc_id FROM keyed GROUP BY fp)
        SELECT k.doc_id, k.lang, k.source
        FROM keyed k JOIN keep USING (fp, doc_id)
    """,
    "x2_distinct_pairs": """
        SELECT DISTINCT lang, source FROM documents
    """,
}
