"""Schema lock for the planted-corpus helper (VERDICT r10 #4).

A witness corpus is only a valid certification input if the PRODUCTION
query builders and oracle strings run on it unmodified — which they do
exactly as long as ``plant_corpus`` writes the same ``documents``
schema the real fixtures carry. Pin it against the actual fixture
parquet, not a hand-copied list, so a fixture regeneration that
changes the schema fails here first.
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq

from tests.conftest import SF_SMOKE
from tests.planted import duck_view, plant_corpus


def test_planted_schema_matches_fixture(tmp_path):
    d = plant_corpus(tmp_path / "c", [(0, "a b c"), (1, "d e")])
    planted = pq.read_schema(os.path.join(d, "documents.parquet"))
    fixture = pq.read_schema(os.path.join(SF_SMOKE, "documents.parquet"))
    assert planted.names == fixture.names
    assert [str(planted.field(n).type) for n in planted.names] == [
        str(fixture.field(n).type) for n in fixture.names
    ]


def test_planted_derived_columns_and_duck_view(tmp_path):
    d = plant_corpus(tmp_path / "c", [(7, "hello world")], source="s1")
    rows = duck_view(d).execute(
        "SELECT doc_id, text, lang, source, n_chars FROM documents"
    ).fetchall()
    assert rows == [(7, "hello world", "en", "s1", 11)]
