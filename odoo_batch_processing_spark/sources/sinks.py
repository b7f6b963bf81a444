"""Batch sinks (R21 — the write/commit protocol).

Reference analog: `updateCell` commits each cell by simulating the
host's event protocol (dblclick → set value → input/change → blur →
Enter; Odoo-Batch-Processing.user.js:554-621) and persistence is
delegated to the host ORM. The engine's equivalent contract is the
columnar write: `df.write.mode(...).parquet(out)` — atomic per job,
schema carried with the data, and the read-back is the verification
that the host "accepted" the write (user.js:612's success-on-dispatch
becomes success-on-commit).

Formats: parquet is the default (columnar, statistics, pushdown on
read-back); csv/json exist for interchange. At 100 TB the knobs that
matter are `partitionBy` (layout for later partition pruning),
`maxRecordsPerFile` (bounded file sizes), and in real deployments a
table format (Delta/Iceberg) for MERGE/ACID — not in this container,
stubbed behind `require_table_format()`.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession

_SCRATCH = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), ".scratch")


_SCRATCH_TTL_SECONDS = 24 * 3600


def _sweep_stale(root: str) -> None:
    """Best-effort removal of scratch dirs older than the TTL so
    repeated rounds don't accumulate sink/checkpoint debris."""
    import shutil
    import time

    try:
        now = time.time()
        for entry in os.scandir(root):
            if entry.is_dir() and now - entry.stat().st_mtime > _SCRATCH_TTL_SECONDS:
                shutil.rmtree(entry.path, ignore_errors=True)
    except OSError:
        pass


def scratch_dir(prefix: str) -> str:
    os.makedirs(_SCRATCH, exist_ok=True)
    _sweep_stale(_SCRATCH)
    return tempfile.mkdtemp(prefix=f"{prefix}-", dir=_SCRATCH)


def write_roundtrip(
    df: DataFrame,
    fmt: str = "parquet",
    partition_by: list[str] | None = None,
    out_dir: str | None = None,
) -> DataFrame:
    """Write ``df`` to a fresh sink directory and return the read-back
    relation — the commit-then-verify shape of R21."""
    spark = df.sparkSession
    out = out_dir or scratch_dir(f"sink-{fmt}")
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if fmt == "parquet":
        writer.parquet(out)
        return spark.read.schema(df.schema).parquet(out)
    if fmt == "csv":
        writer.option("header", True).csv(out)
        return spark.read.schema(df.schema).option("header", True).csv(out)
    if fmt == "json":
        writer.json(out)
        return spark.read.schema(df.schema).json(out)
    raise ValueError(f"unsupported sink format {fmt!r}")


def require_table_format() -> None:
    """Delta/Iceberg/Hudi need their jars on the classpath; this build
    ships none, so MERGE/ACID surfaces raise explicitly instead of
    silently degrading (emulation recipe: anti-join + union — see
    operators/bulk_update.zip_join_update for the join idiom)."""
    try:
        import delta  # noqa: F401  # pragma: no cover
    except ImportError as exc:  # pragma: no cover
        raise NotImplementedError(
            "no table format (Delta/Iceberg) on the classpath in this build"
        ) from exc


def _q_r21_sink_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The updated relation of r07 written to parquet and read back —
    the full EP1 pipeline INCLUDING persistence (SURVEY.md §3 step 6)."""
    from odoo_batch_processing_spark.operators.bulk_update import _q_r07_broadcast_update

    updated = _q_r07_broadcast_update(spark, sf_dir)
    return write_roundtrip(updated, "parquet")


QUERIES = {"r21_sink_roundtrip": _q_r21_sink_roundtrip}

# identical to r07: the sink must not change the relation
ORACLES = {
    "r21_sink_roundtrip": """
        SELECT o_orderkey,
               CASE WHEN o_orderstatus = 'O' AND NOT (o_orderpriority = '1-URGENT')
                    THEN '9-BULK-SET' ELSE o_orderpriority END AS o_orderpriority
        FROM orders
    """,
}
