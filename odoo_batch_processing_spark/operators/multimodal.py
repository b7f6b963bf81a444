"""Multimodal column plumbing: image/audio/video as opaque binary.

North-star surface (BASELINE.json): a 100 TB training-data pipeline
carries media as ``binary`` columns with typed metadata, decoding only
inside Arrow-batched Python (mapInPandas), never row-at-a-time.

This container has no media libraries (no PIL/librosa/av), so the
DECODE step is stubbed: `decode_media` raises NotImplementedError when
a real decoder is requested, and otherwise runs a deterministic fake
decode that exercises the REAL plumbing — binary Arrow transfer,
batch iteration, schema declaration, partition sizing. Swapping the
fake for `PIL.Image.open(io.BytesIO(payload))` is a one-line change
at the marked site.

The fixtures ship no binary column; `attach_binary` synthesizes one
from documents.text (utf-8 payload + modality/width/height metadata),
which keeps every byte deterministic and lets the metadata query be
oracle-checked in DuckDB.

Scale notes: binary payloads inflate row size — the module keeps
metadata in plain columns so filters (modality, dimensions) prune
BEFORE any payload is decoded, and `decode_media` is mapInPandas so
one task holds one Arrow batch of payloads, not the whole partition
as Python objects. `spark.sql.files.maxPartitionBytes` (and at write
time, row-group sizing) bound batch memory.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession, functions as F

from odoo_batch_processing_spark.sources.loader import load_table

MODALITIES = ("image", "audio", "video")
FRAME_BYTES = 64
FRAME_STRIDE = 4


def attach_binary(docs: DataFrame) -> DataFrame:
    """documents → (doc_id, modality, width, height, n_bytes, payload).

    Deterministic synthetic media: payload = utf-8 bytes of the text,
    modality/dimensions derived from stable columns.
    """
    return docs.select(
        "doc_id",
        F.element_at(
            F.array(*[F.lit(m) for m in MODALITIES]),
            (F.pmod(F.col("doc_id"), F.lit(3)) + 1).cast("int"),
        ).alias("modality"),
        (16 + F.pmod(F.col("n_chars"), F.lit(64))).cast("int").alias("width"),
        (16 + F.pmod(F.col("n_chars") * 7, F.lit(64))).cast("int").alias("height"),
        F.length(F.encode(F.col("text"), "UTF-8")).cast("bigint").alias("n_bytes"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
    )


def decode_media(media: DataFrame, real_decoder: bool = False) -> DataFrame:
    """Arrow-batched decode: (doc_id, modality, payload) → per-item
    features. The fake decode is a byte-sum + 16-bin byte histogram —
    deterministic stand-ins for pixel stats/spectrograms."""
    if real_decoder:
        # REAL DECODER SITE: replace with PIL/librosa/av per modality.
        raise NotImplementedError(
            "media decoding libraries are not available in this environment; "
            "wire PIL.Image.open / librosa.load / av.open here"
        )

    import numpy as np
    import pandas as pd

    out_schema = (
        "doc_id bigint, modality string, n_bytes bigint, "
        "byte_sum bigint, histogram array<bigint>"
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            arrs = [np.frombuffer(p, dtype=np.uint8) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "modality": pdf["modality"],
                    "n_bytes": [int(a.size) for a in arrs],
                    "byte_sum": [int(a.sum()) for a in arrs],
                    "histogram": [
                        np.bincount(a >> 4, minlength=16).astype("int64").tolist()
                        for a in arrs
                    ],
                }
            )

    return media.select("doc_id", "modality", "payload").mapInPandas(batches, out_schema)


def sample_frames(
    media: DataFrame, frame_bytes: int = FRAME_BYTES, stride: int = FRAME_STRIDE
) -> DataFrame:
    """'Video' frame sampling: split payload into fixed-size frames,
    keep every ``stride``-th — pure built-ins (substring on binary),
    no Python in the loop."""
    n_frames = F.ceil(F.col("n_bytes") / frame_bytes).cast("int")
    # empty payload: sequence(0, -1) yields a DESCENDING [0,-1], not an
    # empty array — guard to an empty list (matches the oracle's range)
    frame_idx = F.when(n_frames > 0, F.sequence(F.lit(0), n_frames - 1)).otherwise(
        F.array().cast("array<int>")
    )
    sampled_idx = F.filter(frame_idx, lambda i: i % stride == 0)
    frames = F.transform(
        sampled_idx,
        lambda i: F.substring(F.col("payload"), (i * frame_bytes + 1).cast("int"), frame_bytes),
    )
    return media.select(
        "doc_id",
        "modality",
        F.size(frames).cast("bigint").alias("n_sampled"),
        frames.alias("frames"),
    )


def _q_mm_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata projection over the binary table — prunable without
    touching payload bytes — plus the frame-sampling count for video
    rows (sample_frames' substring plan applied behind the modality
    filter; NULL for non-video). One query covers the metadata-prune
    and frame-sample surfaces (oracle-checked)."""
    docs = load_table(spark, sf_dir, "documents")
    media = attach_binary(docs)
    # same counting expression sample_frames materializes frames for,
    # inlined so the metadata pass stays a single scan (no self-join)
    n_frames = F.ceil(F.col("n_bytes") / FRAME_BYTES).cast("int")
    idx = F.when(n_frames > 0, F.sequence(F.lit(0), n_frames - 1)).otherwise(
        F.array().cast("array<int>")
    )
    n_sampled = F.size(F.filter(idx, lambda i: i % FRAME_STRIDE == 0)).cast("bigint")
    return media.select(
        "doc_id",
        "modality",
        "width",
        "height",
        "n_bytes",
        F.when(F.col("modality") == "video", n_sampled).alias("n_video_frames"),
    )


def _q_mm_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The mapInPandas decode path, fully hash-checked: the synthetic
    decode is deterministic arithmetic on the utf-8 payload, so DuckDB
    can restate it — byte values come from ``hex(blob)`` (high nibble =
    odd hex chars), making byte_sum and the 16-bin high-nibble
    histogram SQL-expressible. The histogram is flattened to a CSV
    string so both engines hash the same scalar representation."""
    docs = load_table(spark, sf_dir, "documents")
    return decode_media(attach_binary(docs)).select(
        "doc_id",
        "modality",
        "n_bytes",
        "byte_sum",
        F.array_join(F.col("histogram").cast("array<string>"), ",").alias("hist_csv"),
    )


def _q_mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    media = attach_binary(docs)
    vids = media.filter(F.col("modality") == "video")
    return sample_frames(vids).select("doc_id", "n_sampled")


QUERIES = {
    "mm_binary_meta": _q_mm_binary_meta,
    "mm_decode_features": _q_mm_decode_features,
}

QUERIES_EXT = {
    "mm_frame_sample": _q_mm_frame_sample,
}

ORACLES = {
    "mm_binary_meta": """
        SELECT doc_id,
               ['image', 'audio', 'video'][CAST(doc_id % 3 AS INTEGER) + 1] AS modality,
               CAST(16 + n_chars % 64 AS INTEGER) AS width,
               CAST(16 + (n_chars * 7) % 64 AS INTEGER) AS height,
               CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
               CASE WHEN doc_id % 3 = 2 THEN
                   CAST(len(list_filter(range(0, CAST(ceil(octet_length(CAST(text AS BLOB)) / 64.0) AS INTEGER)),
                            i -> i % 4 = 0)) AS BIGINT)
               END AS n_video_frames
        FROM documents
    """,
    "mm_decode_features": """
        WITH h AS (
          SELECT doc_id,
                 ['image', 'audio', 'video'][CAST(doc_id % 3 AS INTEGER) + 1] AS modality,
                 hex(CAST(text AS BLOB)) AS hx,
                 CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes
          FROM documents
        )
        SELECT doc_id, modality, n_bytes,
               -- COALESCE: list_sum over an empty list is NULL in
               -- DuckDB, but the Python decode of an empty payload
               -- sums to 0
               CAST(COALESCE(list_sum(list_transform(range(1, len(hx) + 1),
                    i -> (CASE WHEN i % 2 = 1 THEN 16 ELSE 1 END)
                         * (strpos('0123456789ABCDEF', hx[i]) - 1))), 0) AS BIGINT) AS byte_sum,
               array_to_string(
                 list_transform(range(1, 17),
                   d -> len(list_filter(range(1, len(hx) + 1, 2),
                            i -> hx[i] = '0123456789ABCDEF'[d]))), ',') AS hist_csv
        FROM h
    """,
}

ORACLES_EXT = {
    "mm_frame_sample": """
        SELECT doc_id,
               CAST(len(list_filter(range(0, CAST(ceil(octet_length(CAST(text AS BLOB)) / 64.0) AS INTEGER)),
                        i -> i % 4 = 0)) AS BIGINT) AS n_sampled
        FROM documents
        WHERE doc_id % 3 = 2
    """,
}


def _q_mm_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash near-dup over DECODED media — the multimodal
    leg of the dedup family (X3 handles text, X4 embeddings; this
    buckets on a pHash-shaped signature of the decoded features).

    Signature: each of the 16 histogram bins contributes 3 bits of its
    QUANTIZED share — (hist[d]·64 div n_bytes) mod 8 — packed into a
    48-bit bigint. Round 4's above-the-mean bit signature was CONSTANT
    over the fixture corpus (text payloads always exceed uniform share
    in the same nibbles), so the self-join degenerated to a
    within-modality cross product (ADVICE r04). The mod-8 share
    quantization keeps the fine per-doc variation the mean-bit throws
    away (fixture: 3 buckets → 106, 41,417 candidate pairs → 2,191)
    while near-identical payloads still collide. Candidates are
    exact-signature matches within a modality — the same band-bucket
    equi-join shape as MinHash-LSH — and the join is fronted by
    :func:`cap_hot_buckets` on (modality, sig) like every other bucket
    self-join in the repo, so a degenerate corpus is bounded by the
    cap, never all-pairs (the cap is a no-op at fixture scale, hence
    absent from the oracle). A real deployment swaps the synthetic
    decode for PIL/librosa features and widens the signature; the
    bucketing plan is unchanged."""
    from odoo_batch_processing_spark.operators.dedup import cap_hot_buckets

    docs = load_table(spark, sf_dir, "documents")
    feats = decode_media(attach_binary(docs))
    # `div` (exact integer division) + `% 8` inside a SQL aggregate
    # lambda: Column `/` is double division and would re-open the
    # truncate-vs-round engine gap w_twap closed
    sig = feats.select(
        "doc_id",
        "modality",
        F.expr(
            "aggregate(sequence(0, 15), 0L, (acc, d) -> acc * 8L"
            " + ((element_at(histogram, d + 1) * 64L)"
            " div greatest(n_bytes, 1L)) % 8L)"
        ).alias("sig"),
    )
    sig = cap_hot_buckets(sig, ["modality", "sig"])
    a = sig.select(F.col("doc_id").alias("doc_a"), "modality", "sig")
    b = sig.select(F.col("doc_id").alias("doc_b"), "modality", "sig")
    return (
        a.join(b, ["modality", "sig"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("modality", "sig", "doc_a", "doc_b")
    )


QUERIES_EXT["mm_neardup"] = _q_mm_neardup
ORACLES_EXT["mm_neardup"] = """
    WITH h AS (
        SELECT doc_id,
               ['image', 'audio', 'video'][CAST(doc_id % 3 AS INTEGER) + 1] AS modality,
               hex(CAST(text AS BLOB)) AS hx,
               CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes
        FROM documents
    ), sigs AS (
        SELECT doc_id, modality,
               CAST(list_sum(list_transform(range(1, 17),
                    d -> ((CAST(len(list_filter(range(1, len(hx) + 1, 2),
                                  i -> hx[i] = '0123456789ABCDEF'[d])) AS BIGINT) * 64)
                          // GREATEST(n_bytes, 1) % 8) << (3 * (16 - d)))) AS BIGINT) AS sig
        FROM h
    )
    SELECT a.modality, a.sig, a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM sigs a JOIN sigs b
      ON a.modality = b.modality AND a.sig = b.sig AND a.doc_id < b.doc_id
"""
