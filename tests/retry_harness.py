"""Subprocess harness for tests/test_retry_determinism.py.

Runs in its OWN JVM because task retries require a ``local[N, F]``
master (F = maxFailures; plain ``local[N]`` fails the job on the first
task failure) and a live SparkContext's master can't be changed.

For each target query it computes the order-insensitive value hash of
the clean run, then re-runs with a PLANTED one-shot task failure — a
pass-through ``mapInPandas`` stage whose partition-0 task raises on
attempt 0 and succeeds on attempt ≥1, dropping a marker file per
attempt so the retry provably happened — and asserts the hash is
identical. This certifies the seeded-sampling family's determinism
claim UNDER TASK RE-EXECUTION (VERDICT r12 #4): membership/positions
derive from content hashes (md5/xxhash of ids), never from
``rand()``/partition-local state, so a retried task must reproduce
exactly the rows the failed attempt would have produced.

Prints ONE JSON line: {query: {match, attempts, rows}} per query.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")

TARGETS = (
    "x9_hash_sample",
    "x9_weighted_sample",
    "x9_epoch_shuffle",
    "g_doulion_triangles",
)


def poisoned(df, marker_dir: str):
    """Append a pass-through mapInPandas stage whose partition-0 task
    fails exactly once (attempt 0), recording each attempt."""
    schema = df.schema

    def f(batches):
        from pyspark import TaskContext

        tc = TaskContext.get()
        if tc.partitionId() == 0:
            open(
                os.path.join(marker_dir, f"attempt-{tc.attemptNumber()}"), "w"
            ).close()
            if tc.attemptNumber() == 0:
                raise RuntimeError("planted one-shot task failure (retry test)")
        yield from batches

    return df.mapInPandas(f, schema)


def value_hash(df) -> tuple[int, int]:
    """count + order-insensitive value hash — the one cross-process
    receipt definition, shared with the spill ladder."""
    from tools.scale_spill import _hash_drain

    return _hash_drain(df)


def main() -> int:
    from pyspark.sql import SparkSession

    from odoo_batch_processing_spark.registry import all_queries
    from odoo_batch_processing_spark.session import RUNTIME_CONFS, configure

    builder = (
        SparkSession.builder.master("local[4, 2]")  # maxFailures=2: one retry
        .appName("retry-determinism")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
    )
    for k, v in RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    spark = configure(builder.getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    queries = all_queries(extended=True)
    out: dict[str, dict] = {}
    for name in TARGETS:
        clean = value_hash(queries[name](spark, SF_DIR))
        spark.catalog.clearCache()
        marker_dir = tempfile.mkdtemp(prefix=f"retry-{name}-")
        retried = value_hash(poisoned(queries[name](spark, SF_DIR), marker_dir))
        spark.catalog.clearCache()
        attempts = sorted(os.listdir(marker_dir))
        out[name] = {
            "rows": clean[0],
            "match": clean == retried,
            "attempts": attempts,
            "retried": "attempt-0" in attempts and "attempt-1" in attempts,
        }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
