"""§2.9 LLM-data-pipeline: multimodal columns.

Multimodal payloads are opaque ``binary`` columns with typed metadata
(SURVEY.md / task brief).  The container has no image/audio libraries,
so the *decode* step is a clearly-marked stub; everything Spark-side —
binary schema, Arrow batch transfer, mapInPandas plumbing, partitioning
— is real and oracle-checked where deterministic.

- multimodal_join:          text table x vector table in one plan (oracle)
- multimodal_binary_stats:  binary payloads through an Arrow-batched
                            mapInPandas pipeline, per-payload metadata
                            out (oracle — byte math is deterministic)
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table, load_tables
from ..registry import query


def decode_image(payload: bytes) -> dict:
    """STUB: real image decoding needs PIL/libjpeg, absent from this
    container.  The Spark-side plumbing (binary column -> Arrow batch ->
    pandas -> typed metadata) is exercised by extract_binary_metadata.
    """
    raise NotImplementedError(
        "image decode requires an imaging library not present in this "
        "environment; plug a real decoder into extract_binary_metadata"
    )


def extract_binary_metadata(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: per-payload metadata from binary blobs.

    Stands in for decode/feature-extract/resize: identical batch shape,
    schema, and Arrow path as a real decoder, with deterministic byte
    math instead of libjpeg.
    """
    for pdf in batches:
        payloads = pdf["payload"]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": payloads.map(len).astype("int64"),
                "first_byte": payloads.map(lambda b: b[0] if len(b) else 0).astype("int64"),
                "byte_sum": payloads.map(lambda b: sum(b) % 1_000_000_007).astype("int64"),
            }
        )


@query(
    "multimodal_join",
    category="llm_multimodal",
    oracle=(
        "SELECT lang, label, COUNT(*) AS cnt "
        "FROM documents JOIN embeddings ON doc_id = vec_id "
        "GROUP BY lang, label"
    ),
)
def multimodal_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents x embeddings: label distribution per language — a text
    column and a vector column flowing through one plan."""
    docs, emb = load_tables(spark, sf_dir, "documents", "embeddings")
    return (
        docs.join(emb, docs.doc_id == emb.vec_id)
        .groupBy("lang", "label")
        .agg(F.count("*").alias("cnt"))
    )


@query(
    "x_multimodal_binary_stats",
    category="llm_multimodal",
    oracle=(
        "SELECT doc_id, "
        "CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes, "
        "CAST(ord(text[1]) AS BIGINT) AS first_byte "
        "FROM documents"
    ),
)
def multimodal_binary_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column pipeline: text -> binary payload -> Arrow-batched
    mapInPandas -> typed metadata.

    The payload here is utf-8 text (the corpus is ASCII tokens) so the
    byte math is oracle-checkable; a real corpus would carry image/audio
    bytes through the identical plan.
    """
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )
    out = docs.mapInPandas(
        extract_binary_metadata,
        schema="doc_id long, n_bytes long, first_byte long, byte_sum long",
    )
    return out.select("doc_id", "n_bytes", "first_byte")


_RESIZE_BOX = 224  # target square, the standard vision-model input box


def plan_resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: letterbox-fit resize planning per payload.

    Source dimensions come from deterministic byte math (a real pipeline
    reads them from the image header — that decode is the stubbed step,
    see decode_image); the aspect-preserving fit into the target box is
    the REAL geometry every vision preprocessor runs.  Vectorized numpy
    float64 so the arithmetic is bit-identical to the SQL oracle.
    """
    import numpy as np

    for pdf in batches:
        n_bytes = pdf["payload"].map(len).astype("int64").to_numpy()
        src_w = 16 + n_bytes % 64
        src_h = 16 + (n_bytes * 31 % 1009) % 48
        scale = np.minimum(_RESIZE_BOX / src_w, _RESIZE_BOX / src_h)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "src_w": src_w,
                "src_h": src_h,
                "out_w": np.floor(src_w * scale).astype("int64"),
                "out_h": np.floor(src_h * scale).astype("int64"),
            }
        )


@query(
    "x_multimodal_resize",
    category="llm_multimodal",
    oracle=(
        "WITH dims AS (SELECT doc_id, "
        "  16 + octet_length(CAST(text AS BLOB)) % 64 AS src_w, "
        "  16 + (octet_length(CAST(text AS BLOB)) * 31 % 1009) % 48 AS src_h "
        "  FROM documents) "
        "SELECT doc_id, CAST(src_w AS BIGINT) AS src_w, CAST(src_h AS BIGINT) AS src_h, "
        f"CAST(floor(src_w * least({_RESIZE_BOX}.0 / src_w, {_RESIZE_BOX}.0 / src_h)) AS BIGINT) AS out_w, "
        f"CAST(floor(src_h * least({_RESIZE_BOX}.0 / src_w, {_RESIZE_BOX}.0 / src_h)) AS BIGINT) AS out_h "
        "FROM dims"
    ),
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize plumbing: binary payload -> Arrow-batched mapInPandas ->
    aspect-preserving letterbox plan (src dims, fitted dims) — the third
    of the brief's decode/feature-extract/resize/frame-sample quartet,
    same stubbed-decode discipline as the others."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )
    return docs.mapInPandas(
        plan_resize,
        schema="doc_id long, src_w long, src_h long, out_w long, out_h long",
    )


_AUDIO_FRAME = 64  # bytes per analysis frame (a stand-in sample rate)


@query(
    "x_multimodal_audio_energy",
    category="llm_multimodal",
    oracle=(
        "WITH p AS (SELECT doc_id, text AS pcm, "
        "  CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n FROM documents), "
        f"f AS (SELECT doc_id, n, i AS frame_idx FROM p, "
        f"  LATERAL (SELECT unnest(range(0, n // {_AUDIO_FRAME})) AS i) r), "
        "s AS (SELECT doc_id, frame_idx, "
        f"  CAST(list_sum(list_transform(range(1, {_AUDIO_FRAME} + 1), "
        f"    j -> ascii(substr(p.pcm, CAST(frame_idx * {_AUDIO_FRAME} + j AS INT), 1)) "
        f"       * ascii(substr(p.pcm, CAST(frame_idx * {_AUDIO_FRAME} + j AS INT), 1)))) "
        "    AS BIGINT) AS energy "
        "  FROM f JOIN p USING (doc_id, n)) "
        f"SELECT doc_id, frame_idx, CAST({_AUDIO_FRAME} AS BIGINT) AS n_samples, "
        "energy FROM s"
    ),
)
def multimodal_audio_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio-style frame feature extraction: the payload's byte stream
    is treated as 8-bit PCM, cut into fixed 64-byte frames (trailing
    partial frame dropped, as a hop-aligned analysis window would), and
    each frame reduced to its exact integer ENERGY (sum of squared
    sample values) — the per-frame feature a voice-activity or silence
    filter runs before any model sees the audio.  Unlike the
    image-decode stub, nothing here is stubbed: byte-level math is
    deterministic, so the whole modality path is hash-checked.

    Scale shape: pure per-row projection (frame explode + a bounded
    64-element fold, all JVM codegen — no Python, no shuffle); the
    operator output is the only thing that grows, one row per frame.
    A real 16-bit/stereo decode swaps the byte fold for an Arrow
    mapInPandas kernel (the x_multimodal_binary_stats path) without
    touching the frame/partition shape."""
    p = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.col("text").alias("pcm"),
        F.length(F.encode("text", "UTF-8")).cast("long").alias("n"),
    )
    frames = p.select(
        "doc_id",
        "pcm",
        F.explode(
            # sequence(0, -1) DESCENDS — explicit empty guard for
            # payloads shorter than one frame
            F.expr(
                f"CASE WHEN n >= {_AUDIO_FRAME} THEN "
                f"sequence(0, CAST(n DIV {_AUDIO_FRAME} AS INT) - 1) "
                "ELSE array() END"
            )
        ).alias("frame_idx"),
    )
    return frames.select(
        "doc_id",
        F.col("frame_idx").cast("long").alias("frame_idx"),
        F.lit(_AUDIO_FRAME).cast("long").alias("n_samples"),
        F.expr(
            f"CAST(aggregate(transform(sequence(1, {_AUDIO_FRAME}), "
            f"j -> ascii(substring(pcm, CAST(frame_idx * {_AUDIO_FRAME} AS INT) + j, 1))), "
            "CAST(0 AS BIGINT), (acc, v) -> acc + CAST(v AS BIGINT) * v) AS BIGINT)"
        ).alias("energy"),
    )
