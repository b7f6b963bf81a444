"""Concurrency value-safety for the engine's module-level registries
(VERDICT r15 #6).

The decided contract (session.py): the engine is single-driver-thread
for SCOPING semantics — but every registry/cache MUTATION is
lock-guarded, so concurrent use degrades to a value-safe recompute or
an early (harmless) release, never to a corrupted structure or a
crash. These tests hammer each registry from many threads and assert
values stay correct and the structures stay consistent.

Spark's own thread-safety makes this realistic: one SparkSession is
documented to serve concurrent job submission from multiple driver
threads, so a future multi-stream caller is a plausible user.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor

from pyspark.sql import functions as F

N_THREADS = 8
N_CALLS = 24


def test_max_key_est_cache_concurrent_value_safe(spark):
    from odoo_batch_processing_spark.operators import windows as W

    dfs = [
        spark.range(200).select(
            (F.col("id") % (5 + i)).alias("k"), F.col("id").alias("v")
        )
        for i in range(4)
    ]
    # single-thread ground truth per frame (cache=False: never cached)
    truth = [
        W.estimate_max_key_rows(d, "k", fraction=1.0, cache=False) for d in dfs
    ]

    def _probe(i: int) -> tuple[int, int]:
        d = dfs[i % len(dfs)]
        return i % len(dfs), W.estimate_max_key_rows(d, "k", fraction=1.0, cache=True)

    with ThreadPoolExecutor(max_workers=N_THREADS) as ex:
        got = list(ex.map(_probe, range(N_CALLS)))
    for idx, est in got:
        assert est == truth[idx], (idx, est, truth[idx])
    # cache stayed bounded and holds ints keyed by tuples (no torn state)
    assert len(W._MAX_KEY_EST_CACHE) <= W._MAX_KEY_EST_CAP
    assert all(
        isinstance(k, tuple) and isinstance(v, int)
        for k, v in W._MAX_KEY_EST_CACHE.items()
    )


def test_boundary_cache_concurrent_ordinals_stay_correct(spark):
    from odoo_batch_processing_spark.operators import bulk_update as B

    df = spark.range(500).select(
        F.col("id").alias("rec_id"), (F.col("id") % 7).alias("grp")
    )

    def _ordinal(_: int) -> list[tuple[int, int]]:
        out = B.distributed_ordinal(df, ["rec_id"], n_parts=4)
        return sorted((r["rec_id"], r[B.ORD_COL]) for r in out.collect())

    expected = _ordinal(0)
    assert [o for _, o in expected] == list(range(1, 501))
    with ThreadPoolExecutor(max_workers=N_THREADS) as ex:
        results = list(ex.map(_ordinal, range(N_THREADS)))
    assert all(r == expected for r in results)
    assert len(B._BOUNDARY_CACHE) <= B._BOUNDARY_CACHE_MAX


def test_materialize_registry_concurrent_never_corrupts(spark):
    """Interleaved materialize_once / release_materialized across
    threads: no crash, no double-unpersist error, and a final release
    leaves the registry empty with every pin actually released."""
    from odoo_batch_processing_spark import session as S

    # start from a clean registry so this test owns what it asserts
    S.release_materialized()

    def _churn(i: int) -> int:
        df = S.materialize_once(spark.range(50 + i).select(F.col("id")))
        n = df.count()
        if i % 3 == 0:
            S.release_materialized()
        return n

    with ThreadPoolExecutor(max_workers=N_THREADS) as ex:
        counts = list(ex.map(_churn, range(N_CALLS)))
    assert counts == [50 + i for i in range(N_CALLS)]
    S.release_materialized()
    with S._MATERIALIZED_LOCK:
        assert S._MATERIALIZED == []
