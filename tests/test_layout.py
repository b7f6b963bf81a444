"""Z-order layout: the measurable claim is stat-box tightness — under
z-clustering EVERY row group carries a narrow min/max range on BOTH
dimensions, so a conjunctive filter prunes row groups that a
single-column sort must read."""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from tests.conftest import SF_CORRECT


def _stat_spans(out_dir: str, col: str) -> list[tuple[int, int]]:
    """(min, max) of ``col`` per row group across all files."""
    spans = []
    for f in sorted(glob.glob(os.path.join(out_dir, "*.parquet"))):
        pf = pq.ParquetFile(f)
        idx = pf.schema_arrow.get_field_index(col)
        for rg in range(pf.metadata.num_row_groups):
            st = pf.metadata.row_group(rg).column(idx).statistics
            spans.append((st.min, st.max))
    return spans


def _mean_span(spans: list[tuple[int, int]]) -> float:
    return sum(mx - mn for mn, mx in spans) / len(spans)


def test_zorder_tightens_both_dimensions(spark, tmp_path):
    from odoo_batch_processing_spark.sources.layout import zorder_write
    from odoo_batch_processing_spark.sources.loader import load_table

    li = load_table(spark, SF_CORRECT, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"
    )
    n_files = 8

    z_dir = str(tmp_path / "zorder")
    zorder_write(li, ("l_partkey", "l_suppkey"), z_dir, n_files=n_files)

    # baseline: perfect single-column clustering on l_partkey only
    single_dir = str(tmp_path / "single")
    (
        li.repartitionByRange(n_files, F.col("l_partkey"))
        .sortWithinPartitions("l_partkey")
        .write.mode("overwrite")
        .parquet(single_dir)
    )

    # relation identical under both layouts
    assert (
        spark.read.parquet(z_dir).count()
        == spark.read.parquet(single_dir).count()
        == li.count()
    )

    part_range = li.agg(
        (F.max("l_partkey") - F.min("l_partkey")).cast("double")
    ).first()[0]
    supp_range = li.agg(
        (F.max("l_suppkey") - F.min("l_suppkey")).cast("double")
    ).first()[0]

    # z-layout: BOTH dimensions clustered — every row group's stat box
    # is a fraction of the global range on each axis
    z_part = _mean_span(_stat_spans(z_dir, "l_partkey")) / part_range
    z_supp = _mean_span(_stat_spans(z_dir, "l_suppkey")) / supp_range
    assert z_part < 0.75, f"z-layout l_partkey span ratio {z_part:.2f}"
    assert z_supp < 0.6, f"z-layout l_suppkey span ratio {z_supp:.2f}"

    # single-column layout: the sorted dimension is tight but the
    # OTHER dimension's row groups span ~the whole domain — the reason
    # one sort key cannot serve two filter columns
    s_part = _mean_span(_stat_spans(single_dir, "l_partkey")) / part_range
    s_supp = _mean_span(_stat_spans(single_dir, "l_suppkey")) / supp_range
    assert s_part < z_part  # single-key clustering wins its own axis
    assert s_supp > 0.9, f"expected untamed l_suppkey, got {s_supp:.2f}"
    assert z_supp < s_supp / 1.5, "z-order must tighten the second axis"


def test_compaction_plan_on_real_file_listing(spark, tmp_path):
    """Run the planner over an ACTUAL parquet directory's _metadata
    file listing (the production input) and check the bin-packing
    bounds: groups are contiguous runs of the listing order and every
    group's size is within one file of the target on either side
    (last group excepted below)."""
    from odoo_batch_processing_spark.sources.layout import compaction_plan
    from odoo_batch_processing_spark.sources.loader import load_table

    out = str(tmp_path / "many_small_files")
    docs = load_table(spark, SF_CORRECT, "documents")
    docs.repartition(16).write.mode("overwrite").parquet(out)

    listing = (
        spark.read.parquet(out)
        .select(
            F.col("_metadata.file_path").alias("path"),
            F.col("_metadata.file_size").alias("bytes"),
        )
        .distinct()
        .withColumn("part", F.lit("t"))  # unpartitioned table: one partition
    )
    target = int(
        listing.agg(F.sum("bytes")).first()[0] // 4
    )  # aim for ~4 compacted outputs
    plan = compaction_plan(listing, "part", "path", "bytes", target).collect()
    plan.sort(key=lambda r: r["path"])

    n_files = len(plan)
    assert n_files == 16
    # groups are contiguous and nondecreasing in listing order
    gids = [r["group_id"] for r in plan]
    assert gids == sorted(gids)
    by_group: dict[int, list] = {}
    for r in plan:
        by_group.setdefault(r["group_id"], []).append(r)
    last_gid = max(by_group)
    max_file = max(r["bytes"] for r in plan)
    for gid, rows in by_group.items():
        gbytes = sum(r["bytes"] for r in rows)
        # overshoot bounded by one file
        assert gbytes < target + max_file
        # undershoot bounded by one file (except the tail group)
        if gid != last_gid:
            assert gbytes > target - max_file


def test_compact_rewrite_one_file_per_group(spark, tmp_path):
    """compact_rewrite (r17): the rewrite must (a) emit exactly ONE
    data file per planned (partition, group) directory, (b) shrink the
    total file count vs the small-file layout, and (c) preserve the
    relation exactly."""
    from odoo_batch_processing_spark.sources.layout import compact_rewrite
    from odoo_batch_processing_spark.sources.loader import load_table

    small = str(tmp_path / "small")
    ev = load_table(spark, SF_CORRECT, "events")
    ev.repartition(12).write.partitionBy("event_type").mode("overwrite").parquet(small)
    n_small = len(glob.glob(os.path.join(small, "event_type=*", "*.parquet")))
    assert n_small >= 30  # 12 files × 5 partitions, minus empties

    out = str(tmp_path / "compacted")
    total = sum(
        os.path.getsize(p)
        for p in glob.glob(os.path.join(small, "event_type=*", "*.parquet"))
    )
    back = compact_rewrite(
        small, spark, "event_type", max(total // 10, 1), out, schema=ev.schema
    )

    group_dirs = glob.glob(os.path.join(out, "event_type=*", "group_id=*"))
    assert group_dirs, "rewrite produced no group directories"
    for d in group_dirs:
        files = [f for f in os.listdir(d) if not f.startswith(("_", "."))]
        assert len(files) == 1, f"{d} has {len(files)} data files, want 1"
    assert len(group_dirs) < n_small

    want = sorted(map(tuple, ev.select("event_id", "event_type", "value").collect()))
    got = sorted(map(tuple, back.select("event_id", "event_type", "value").collect()))
    assert got == want
