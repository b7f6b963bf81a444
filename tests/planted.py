"""Planted-corpus helper for cap/guard witness tests (VERDICT r10 #4).

SURVEY §7.5 rule 6 says a cap certification needs a WITNESS ROW on the
capped side of the guard — which means every new guard needs a small
synthetic corpus where the guard actually cuts something.  Four such
corpora grew ad-hoc parquet plumbing inside ``test_cap_witness.py``;
this module is that plumbing, extracted once, so the next witness (and
the DECONTAM_HOT_CAP one this round) is two calls, not thirty lines.

The written file is schema-locked to the FIXTURES.md ``documents``
table (doc_id int64, text string, lang string, source string, n_chars
int64) — witness corpora must stay drop-in substitutes for a fixture
``sf_dir`` so the PRODUCTION query builders and oracle strings run on
them unmodified (that is the whole point: certifying the shipped
wiring, not a test-only twin).  ``tests/test_planted.py`` pins the
lock against the real fixture parquet.
"""

from __future__ import annotations

import os

#: (name, pyarrow type factory) — FIXTURES.md `documents`, in order
_DOCUMENTS_COLUMNS = (
    ("doc_id", "int64"),
    ("text", "string"),
    ("lang", "string"),
    ("source", "string"),
    ("n_chars", "int64"),
)


def plant_corpus(
    dirpath,
    rows: list[tuple],
    lang: str = "en",
    source: str = "planted",
) -> str:
    """Write ``documents.parquet`` under ``dirpath`` from (doc_id,
    text) or (doc_id, text, source) tuples — the 3-form exists for
    guards whose semantics split on ``source`` (benchmark
    decontamination). Remaining FIXTURES.md columns are derived;
    returns ``str(dirpath)`` so the caller can hand it anywhere a
    fixture ``sf_dir`` is expected."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = str(dirpath)
    os.makedirs(d, exist_ok=True)
    table = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array([lang] * len(rows), pa.string()),
            "source": pa.array(
                [r[2] if len(r) > 2 else source for r in rows], pa.string()
            ),
            "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
        }
    )
    assert table.schema.names == [c for c, _ in _DOCUMENTS_COLUMNS]
    pq.write_table(table, os.path.join(d, "documents.parquet"))
    return d


def duck_view(dirpath):
    """A fresh DuckDB connection with ``documents`` registered over the
    planted dir — the same view name the driver's oracle harness
    pre-registers, so production ORACLES strings run verbatim."""
    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{str(dirpath)}/documents.parquet'"
    )
    return con
