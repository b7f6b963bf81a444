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


def mm_stream_fingerprints(media: DataFrame) -> DataFrame:
    """(doc_id, modality, simhash): SimHash fingerprint of the DECODED
    byte stream — per-doc majority vote over the md5 hashes of the
    stream's sliding 4-byte shingles (``dedup.simhash_from_tokens``,
    the x3 machinery applied to media). This is how production A/V
    near-dup actually fingerprints (chromaprint/videohash hash the
    decoded SAMPLE STREAM, not a global histogram): a local edit
    touches only the shingles overlapping it, so the vote margins —
    and with them the code — move a few bits, not arbitrarily.

    History (VERDICT r5 #5): round 5 bucketed on one exact 48-bit
    quantized-histogram signature, which loses a near-identical pair
    the moment any bin crosses a quantization boundary; round 6's
    first attempt banded the histogram bins, but fixture payloads
    light only 3 of 16 nibble bins, so every banding left some band
    constant-per-modality and the any-band join degenerated to the
    cross product (measured ratio 1.008 at sf0.01). The stream
    simhash has no such dead-feature failure mode, and banding over
    it is EXACT for hamming ≤ bands−1 (see mm_neardup_pairs).

    The payload hex is materialized once per row before the shingle
    transform — inlining ``hex(payload)`` into the lambda would
    re-hex the payload once per shingle.

    SCALE HAZARD, fixed round 7 (found by the smoke ladder this query
    was added to): the old trailing ``filter(simhash.isNotNull())``
    was predicate-pushed BELOW the __hx projection, and the pushed
    Filter inlines the whole fold — with ``hex(encode(text))`` inside
    the shingle lambda, which higher-order-function evaluation re-runs
    PER ELEMENT: Θ(bytes²) per doc, on top of the linear projection
    (measured 120 s of a 126 s query at 4× sf0.1). ``simhash`` is NULL
    iff the shingle array is empty iff the payload is under 4 bytes
    (the first stride-0 shingle exists exactly when nb ≥ 4; shorter
    slices are length-filtered), so the null filter is replaced by the
    equivalent ``octet_length(payload) >= 4`` PRE-filter — O(bytes) at
    the scan, where pushdown helps instead of hurting. Equivalence is
    pinned by a unit test over payload lengths 0..10."""
    from odoo_batch_processing_spark.operators.dedup import simhash_from_tokens

    hx = media.filter(F.octet_length(F.col("payload")) >= 4).select(
        "doc_id", "modality", F.hex(F.col("payload")).alias("__hx"),
        F.octet_length(F.col("payload")).cast("bigint").alias("__nb"),
    )
    toks = F.expr(
        "filter(transform(sequence(0, cast(greatest(__nb - 3, 1) - 1 as int), 2),"
        " k -> substring(__hx, cast(2 * k + 1 as int), 8)),"
        " t -> length(t) = 8)"
    )
    return hx.select(
        "doc_id", "modality", simhash_from_tokens(toks).alias("simhash")
    )


def mm_neardup_pairs(fps: DataFrame, cap: int | None = None) -> DataFrame:
    """Within-modality near-dup pairs from banded stream simhashes —
    the dedup.simhash_neardup_pairs discipline with a modality scope:
    split the 32-bit code into 4 bands of 8 bits; a pair within
    HAMMING_MAX(=3) bits differs in at most 3 bands, so it MUST agree
    on ≥ 1 band — banding is exact, not approximate, for the emitted
    threshold (the planted-pair recall test rests on this theorem,
    not on luck). Candidates are hamming-verified before emission.

    Every band bucket self-join is fronted by
    :func:`dedup.cap_hot_buckets` on (modality, band, band_val); since
    round 6 the oracle mirrors the cap with a QUALIFY window, so the
    two engines stay in lockstep even on a corpus that actually trips
    it (ADVICE r5 #2)."""
    from odoo_batch_processing_spark.operators.dedup import (
        HAMMING_MAX,
        HOT_BUCKET_CAP,
        SIMHASH_BANDS,
        SIMHASH_BITS,
        cap_hot_buckets,
    )
    from odoo_batch_processing_spark.session import materialize_once

    band_bits = SIMHASH_BITS // SIMHASH_BANDS
    mask = (1 << band_bits) - 1
    banded = fps.select(
        "doc_id",
        "modality",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftright(F.col("simhash"), i * band_bits)
                        .bitwiseAND(F.lit(mask))
                        .alias("band_val"),
                    )
                    for i in range(SIMHASH_BANDS)
                ]
            )
        ).alias("bk"),
    ).select(
        "doc_id", "modality", "simhash",
        F.col("bk.band").alias("band"), F.col("bk.band_val").alias("band_val"),
    )
    # materialized once: both self-join sides read it, and the
    # upstream fingerprint scan should run once, not twice
    banded = banded.transform(materialize_once)
    banded = cap_hot_buckets(
        banded,
        ["modality", "band", "band_val"],
        cap=HOT_BUCKET_CAP if cap is None else cap,
    )
    a = banded.select(
        F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sim_a"),
        "modality", "band", "band_val",
    )
    b = banded.select(
        F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sim_b"),
        "modality", "band", "band_val",
    )
    return (
        a.join(b, ["modality", "band", "band_val"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("modality", "doc_a", "doc_b", "sim_a", "sim_b")
        .distinct()
        .withColumn(
            "hamming",
            F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b"))).cast("int"),
        )
        .filter(F.col("hamming") <= HAMMING_MAX)
        .select("modality", "doc_a", "doc_b", "hamming")
    )


def _q_mm_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual near-dup over DECODED media — the multimodal leg of
    the dedup family (X3 handles text, X4 embeddings; this fingerprints
    the decoded byte stream). See :func:`mm_stream_fingerprints`
    (recall argument + design history) and :func:`mm_neardup_pairs`
    (banding theorem, cap + join shape). A real deployment swaps the
    synthetic decode for PIL/librosa sample streams; the fingerprint
    and banding plan are unchanged. Fanned out like x3_simhash — the
    per-doc shingle/vote fold is the whole query's CPU cost and the
    fixture is one parquet split."""
    from odoo_batch_processing_spark.sources.loader import fan_out

    docs = fan_out(load_table(spark, sf_dir, "documents"), spark, "doc_id")
    media = attach_binary(docs)
    return mm_neardup_pairs(mm_stream_fingerprints(media))


QUERIES_EXT["mm_neardup"] = _q_mm_neardup
# the QUALIFY mirrors cap_hot_buckets exactly (drop every row of any
# (modality, band, band_val) bucket holding more than the cap): the
# drop is deterministic, so Spark and DuckDB agree even on a corpus
# that actually trips it (ADVICE r5 #2 — previously the cap was
# Spark-side only and a hot bucket would have failed the cross-check).
# Vote/code fragments and band constants come from dedup so the two
# simhash implementations cannot drift.
from odoo_batch_processing_spark.operators.dedup import (  # noqa: E402
    HAMMING_MAX as _MM_HAMMING_MAX,
    HOT_BUCKET_CAP as _MM_CAP,
    SIMHASH_BANDS as _MM_BANDS,
    _SIMHASH_BAND_BITS as _MM_BAND_BITS,
    _SIMHASH_CODE as _MM_CODE,
    _SIMHASH_MASK as _MM_MASK,
    _SIMHASH_VOTES as _MM_VOTES,
)

ORACLES_EXT["mm_neardup"] = f"""
    WITH h AS (
        SELECT doc_id,
               ['image', 'audio', 'video'][CAST(doc_id % 3 AS INTEGER) + 1] AS modality,
               hex(CAST(text AS BLOB)) AS hx,
               CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS nb
        FROM documents
    ), toks AS (
        SELECT doc_id, modality,
               substr(hx, CAST(2 * unnest(range(0, GREATEST(nb - 3, 1), 2)) + 1 AS INTEGER), 8) AS tok
        FROM h
    ), hashed AS (
        SELECT doc_id, modality, CAST('0x' || substr(md5(tok), 1, 15) AS BIGINT) AS h
        FROM toks WHERE len(tok) = 8
    ), votes AS (
        SELECT doc_id, modality, {_MM_VOTES} FROM hashed GROUP BY doc_id, modality
    ), codes AS (
        SELECT doc_id, modality, CAST({_MM_CODE} AS BIGINT) AS simhash FROM votes
    ), banded AS (
        SELECT doc_id, modality, simhash, band,
               (simhash >> (band * {_MM_BAND_BITS})) & {_MM_MASK} AS band_val
        FROM codes CROSS JOIN (SELECT unnest(range({_MM_BANDS})) AS band) bands
    ), capped AS (
        SELECT * FROM banded
        QUALIFY COUNT(*) OVER (PARTITION BY modality, band, band_val) <= {_MM_CAP}
    ), cand AS (
        SELECT DISTINCT a.modality, a.doc_id AS doc_a, b.doc_id AS doc_b,
                        a.simhash AS sim_a, b.simhash AS sim_b
        FROM capped a JOIN capped b
          ON a.modality = b.modality AND a.band = b.band
         AND a.band_val = b.band_val AND a.doc_id < b.doc_id
    )
    SELECT modality, doc_a, doc_b,
           CAST(bit_count(xor(sim_a, sim_b)) AS INTEGER) AS hamming
    FROM cand WHERE bit_count(xor(sim_a, sim_b)) <= {_MM_HAMMING_MAX}
"""
