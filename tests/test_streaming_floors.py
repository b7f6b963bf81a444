"""tools/streaming_floors.py wiring — the floor mapping must track the
core streaming catalog (a new core `s_*` query without a floor twin
would silently fall out of the cadence-vs-compute decomposition)."""

from __future__ import annotations

from odoo_batch_processing_spark.registry import all_queries
from tools.streaming_floors import FLOORS, MAPPING


def test_mapping_covers_exactly_the_core_streaming_family():
    core_streaming = {n for n in all_queries() if n.startswith("s_")}
    assert set(MAPPING) == core_streaming


def test_every_mapped_floor_exists():
    assert set(MAPPING.values()) <= set(FLOORS)
