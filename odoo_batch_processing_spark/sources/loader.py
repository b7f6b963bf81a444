"""Batch source loaders for the driver-generated parquet fixtures.

Reference analog: the single DOM table scan
(Odoo-Batch-Processing.user.js:172, 202, 432 — R1 in SURVEY.md §2).
Here a "scan" is ``spark.read.parquet`` with an explicit schema, which
gives the engine columnar vectorized reads, predicate pushdown, and
column pruning for free — the reference's row-major iteration is
deliberately NOT emulated (SURVEY.md §1.1).
"""

from __future__ import annotations

import glob
import os
from functools import lru_cache

from pyspark.sql import DataFrame, SparkSession, functions as F

from odoo_batch_processing_spark.schemas import SCHEMAS, TABLE_NAMES, events_schema
from odoo_batch_processing_spark.session import configure

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


@lru_cache(maxsize=None)
def _events_ts_unit_cached(path: str, cache_token: str) -> str:
    import pyarrow as pa
    import pyarrow.parquet as pq

    pf = pq.ParquetFile(path)
    # Legacy INT96 (files written by engines predating the
    # outputTimestampType default, session.RUNTIME_CONFS): physically
    # untyped, so pyarrow surfaces it as timestamp[ns] — but Spark's
    # vectorized reader decodes INT96 into TimestampType natively, so
    # it must take the "us" (plain TimestampType schema) branch, NOT
    # the raw-int64-nanos branch the arrow type alone would suggest.
    try:
        idx = pf.schema_arrow.get_field_index("ts")
        if pf.metadata.num_row_groups > 0 and (
            pf.metadata.row_group(0).column(idx).physical_type == "INT96"
        ):
            return "us"
    except Exception:
        pass  # fall through to the arrow-type probe
    t = pf.schema_arrow.field("ts").type
    # A non-timestamp ``ts`` (plain int64) IS the raw-nanos staging
    # contract used by the streaming fixtures — same branch as NANOS.
    if not pa.types.is_timestamp(t):
        return "ns"
    return "ns" if t.unit == "ns" else "us"


def events_ts_unit(path: str) -> str:
    """Physical unit of ``events.ts`` (``'ns'`` or ``'us'``), probed from
    the parquet footer. Fixture generations have shipped both; trusting a
    constant silently compresses the timeline 1000× when the unit flips,
    so every events read routes through this probe. One driver-side
    footer read per distinct (path, first-file) pair (cached) — no data
    is scanned.

    Invariant: all files under a directory share one ``ts`` unit (only
    the lexicographically-first file is probed). The cache keys on the
    probed file's (path, basename, mtime_ns, size), so rewriting a
    directory in-session with a different fixture generation re-probes
    instead of silently reusing a stale unit — mtime in NANOSECONDS
    plus the byte size, because 1-second mtime granularity on some
    filesystems would otherwise let a same-second same-name rewrite
    slip through with the old unit (the exact 1000× timeline
    compression this probe exists to prevent).
    """
    probe = path
    if os.path.isdir(path):
        files = sorted(glob.glob(os.path.join(path, "*.parquet")))
        if not files:
            # spool-style dirs (sources.manifest) name entries
            # "{offset:012d}-{basename}" where the basename need not
            # end in .parquet; the file-stream source reads any
            # non-hidden file regardless of suffix, so the probe must
            # too (ADVICE r16) — skip Spark metadata (_SUCCESS, .crc)
            files = sorted(
                p
                for f in os.listdir(path)
                if not f.startswith(("_", "."))
                and os.path.isfile(p := os.path.join(path, f))
            )
        if not files:
            raise FileNotFoundError(
                f"no parquet data files under {path!r} to probe events.ts unit"
            )
        probe = files[0]
    st = os.stat(probe)
    return _events_ts_unit_cached(
        probe, f"{os.path.basename(probe)}:{st.st_mtime_ns}:{st.st_size}"
    )


@lru_cache(maxsize=None)
def _footer_row_count_cached(path: str, cache_token: str) -> int:
    import pyarrow.parquet as pq

    return pq.ParquetFile(path).metadata.num_rows


def table_row_count(sf_dir: str, name: str) -> int:
    """Exact row count of a fixture table from its parquet FOOTER —
    the driver-side twin of :func:`stats_probe` for the many query
    prologues that need an UNFILTERED corpus cardinality as a plan
    scalar (df caps, idf, relative thresholds).

    Why (OPTIMIZATION r18, guide §1.2 "don't compute things you throw
    away"): ``df.count()`` on a fixture scan is a full Spark job —
    scan + (after fan_out) an exchange — ~0.1-0.2 s per call at sf0.1,
    repeated in every invocation of postings/idf-style queries. The
    footer count is the same EXACT number (parquet footers store exact
    row counts, not estimates) read in <1 ms with no job. At 100 TB
    the same discipline holds: row counts of an unchanging table come
    from table metadata, not a petabyte scan (stats_probe's rationale,
    R6).

    Keyed like :func:`events_ts_unit` on (path, mtime_ns, size), so an
    in-session rewrite of the fixture re-probes instead of reusing a
    stale count. Single-file fixtures only (``{name}.parquet`` IS a
    file in every testdata generation); a directory-shaped table would
    need per-file summation — fail loudly rather than miscount."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    if os.path.isdir(path):
        total = 0
        for f in sorted(glob.glob(os.path.join(path, "*.parquet"))):
            st = os.stat(f)
            total += _footer_row_count_cached(
                f, f"{os.path.basename(f)}:{st.st_mtime_ns}:{st.st_size}"
            )
        return total
    st = os.stat(path)
    return _footer_row_count_cached(
        path, f"{os.path.basename(path)}:{st.st_mtime_ns}:{st.st_size}"
    )


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table with its declared schema.

    ``events.ts`` lands as a microsecond TimestampType either way: a
    NANOS file arrives as int64 nanoseconds (see session.RUNTIME_CONFS)
    and is floor-converted — the same truncation DuckDB applies — while
    a MICROS file reads natively.
    """
    if name not in SCHEMAS:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    configure(spark)
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        unit = events_ts_unit(path)
        df = spark.read.schema(events_schema(unit)).parquet(path)
        if unit == "ns":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
    return spark.read.schema(SCHEMAS[name]).parquet(path)


def fan_out(df: DataFrame, spark: SparkSession, *key_cols: str) -> DataFrame:
    """Hash-repartition a narrow scan up to the session's parallelism
    before CPU-heavy per-row work (tokenize / shingle / k×md5 / simhash
    votes) — gated so it NEVER fires on an already-wide scan.

    Why it exists: the sf fixtures are single-row-group parquet files,
    and Spark cannot split a parquet file below row-group granularity —
    so the scan is ONE task regardless of ``maxPartitionBytes``, and
    every downstream map runs on one core until the first shuffle
    (``localCheckpoint`` then freezes that 1-partition layout for the
    whole pipeline). At corpus scale the scan arrives in thousands of
    splits, the gate sees parallelism ≥ cores, and this is a no-op —
    the helper can only widen a degenerate scan, never add a shuffle to
    a healthy one. Partitioning is BY HASH of ``key_cols`` (not round
    robin): deterministic under task retry and reusable by the next
    shuffle on the same key.
    """
    n = spark.sparkContext.defaultParallelism
    # probe the JVM RDD directly: `df.rdd` wraps the query in an extra
    # InternalRow→pickle conversion stage just to ask for a partition
    # count — ~2.3× the driver-side cost of the bare toRdd() probe
    # (measured 30 vs 13 ms/call; fan_out runs in nearly every catalog
    # query, several times in some). The fast path reads private
    # internals (_jdf / queryExecution), which Spark Connect does not
    # expose and upgrades may churn — fall back to the public probe
    # rather than break (ADVICE r17 #2).
    try:
        parts = df._jdf.queryExecution().toRdd().getNumPartitions()
    except Exception:  # pragma: no cover - Connect / private-API churn
        parts = df.rdd.getNumPartitions()
    if parts >= n:
        return df
    return df.repartition(n, *[F.col(c) for c in key_cols]) if key_cols else df.repartition(n)


def load_all(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    """All ten fixture tables, keyed by name."""
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def stats_probe(
    spark: SparkSession, sf_dir: str, name: str, *cols: str
) -> dict:
    """COUNT(*) plus MIN/MAX of ``cols`` answered from parquet FOOTER
    statistics — a metadata sweep, not a data read (R6's count probe
    at 100 TB: row counts over a petabyte table should not scan it).

    Aggregate pushdown is DSv2-only while the engine's default reads
    stay on V1 (bucketed zero-shuffle joins are V1-only), so this
    helper flips ``useV1SourceList`` around plan construction —
    single query, driver-side, restored in ``finally``. The pushed
    plan carries ``PushedAggregation`` (asserted in
    tests/test_stats_probe.py) and the numbers are exact: parquet
    footer row counts and typed min/max are not estimates. Falls back
    transparently (same result, data scan) if pushdown declines —
    e.g. a filter, nested type, or a writer that omitted stats."""
    configure(spark)
    path = os.path.join(sf_dir, f"{name}.parquet")
    key = "spark.sql.sources.useV1SourceList"
    prev = spark.conf.get(key)
    spark.conf.set(key, "")
    try:
        df = spark.read.parquet(path)
        aggs = [F.count(F.lit(1)).alias("n_rows")]
        for c in cols:
            aggs.append(F.min(c).alias(f"min_{c}"))
            aggs.append(F.max(c).alias(f"max_{c}"))
        row = df.agg(*aggs).first()
    finally:
        spark.conf.set(key, prev)
    return row.asDict()


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> None:
    """Register every table as a temp view for the SQL API path."""
    for name in TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
