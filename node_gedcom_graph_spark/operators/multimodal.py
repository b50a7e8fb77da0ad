"""Multimodal-column plumbing: opaque binary payloads with typed
metadata, format sniffing, and Arrow-batched feature extraction.

The container has no image/audio codecs, so the *decode* step is stubbed
(deterministic fake behind ``fake=True``, ``NotImplementedError``
otherwise — clearly marked); everything Spark-side is real and tested:
binary column handling, magic-byte sniffing as native column exprs, and
the mapInPandas batch shape a real decoder would plug into.

The driver tables carry no binary column, so payloads are derived from
documents.text (utf-8 encode) — the plumbing is payload-agnostic.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from node_gedcom_graph_spark.operators import register
from node_gedcom_graph_spark.sources.tables import load_table

# Public file-format magic numbers (hex of the leading bytes).
MAGIC_PREFIXES: tuple[tuple[str, str], ...] = (
    ("FFD8FF", "image/jpeg"),
    ("89504E47", "image/png"),
    ("47494638", "image/gif"),
    ("52494646", "audio/wav-or-avi"),  # RIFF container
    ("494433", "audio/mp3"),
    ("664C6143", "audio/flac"),
    ("1A45DFA3", "video/webm-or-mkv"),
)


def sniff_format(payload: Column) -> Column:
    """Magic-byte format sniff as a native column expression."""
    head = F.hex(F.substring(payload, 1, 8))
    expr = F.lit("application/octet-stream")
    for prefix, mime in reversed(MAGIC_PREFIXES):
        expr = F.when(head.startswith(prefix), F.lit(mime)).otherwise(expr)
    return expr


def attach_binary_metadata(df: DataFrame, payload_col: str) -> DataFrame:
    """Typed metadata columns for an opaque binary payload column."""
    p = F.col(payload_col)
    return df.withColumns(
        {
            "n_bytes": F.length(p).cast("bigint"),
            "payload_md5": F.md5(p),
            "mime_sniffed": sniff_format(p),
        }
    )


@register(
    "multimodal_binary_meta",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           md5(text) AS payload_md5,
           'application/octet-stream' AS mime_sniffed
    FROM documents
    """,
)
def multimodal_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column metadata extraction (size, content hash, sniffed
    format) — all JVM-side; md5 over the utf-8 payload bytes matches the
    oracle's md5 over the source text."""
    docs = load_table(spark, sf_dir, "documents", spread=True).select(
        "doc_id", F.encode("text", "utf-8").alias("payload")
    )
    return attach_binary_metadata(docs, "payload").select(
        "doc_id", "n_bytes", "payload_md5", "mime_sniffed"
    )


FEATURE_DIM = 8
_FEATURE_SCHEMA = (
    "doc_id long, width int, height int, channels int, features array<float>"
)


def extract_image_features(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload", fake: bool = True
) -> DataFrame:
    """Arrow-batched image decode + feature extraction over mapInPandas.

    With ``fake=True`` (default in this container) the decode is a
    deterministic stand-in: dimensions and features are derived from the
    payload's md5 digest, so outputs are reproducible and testable while
    exercising the exact batch shape (binary in -> struct + vector out)
    a real decoder would use. ``fake=False`` raises NotImplementedError
    until an image codec (e.g. PIL) is available.
    """
    if not fake:
        raise NotImplementedError(
            "real image decode requires an image codec not present in this "
            "container; wire PIL/opencv into _decode_batch and set fake=False"
        )

    def _decode_batch(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            ids, widths, heights, chans, feats = [], [], [], [], []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                digest = hashlib.md5(bytes(payload)).digest()
                ids.append(doc_id)
                widths.append(64 + digest[0] * 4)
                heights.append(64 + digest[1] * 4)
                chans.append(3)
                feats.append(
                    [round(b / 255.0, 6) for b in digest[2 : 2 + FEATURE_DIM]]
                )
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "width": widths,
                    "height": heights,
                    "channels": chans,
                    "features": feats,
                }
            )

    return df.select(
        F.col(id_col).alias(id_col), F.col(payload_col).alias(payload_col)
    ).mapInPandas(_decode_batch, _FEATURE_SCHEMA)


@register("multimodal_fake_features")  # pandas-UDF path: rows-only check
def multimodal_fake_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stubbed decode + feature extraction over the Arrow
    batch path (schema/partitioning/UDF signature are the real thing;
    only the pixel decode is faked — see extract_image_features)."""
    docs = load_table(spark, sf_dir, "documents", spread=True).select(
        "doc_id", F.encode("text", "utf-8").alias("payload")
    )
    feats = extract_image_features(docs)
    return feats.select(
        "doc_id",
        "width",
        "height",
        "channels",
        F.round(F.aggregate("features", F.lit(0.0), lambda a, x: a + x), 6).alias(
            "feature_sum"
        ),
    )


def resize_images(
    df: DataFrame,
    target_w: int,
    target_h: int,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    fake: bool = True,
) -> DataFrame:
    """Arrow-batched image resize over mapInPandas (binary in -> binary
    out + new dims). The fake resize re-encodes deterministically
    (md5-chained stretch of the payload to a size proportional to the
    target area) so length/content are reproducible; a real
    implementation replaces only the inner per-image function with
    PIL.Image.resize. Batch shape, schema, and partitioning are real.
    """
    if not fake:
        raise NotImplementedError(
            "real resize requires an image codec not present in this "
            "container; swap _fake_resize for PIL and set fake=False"
        )

    out_schema = f"{id_col} long, width int, height int, payload binary"

    def _fake_resize(payload: bytes) -> bytes:
        # Deterministic byte stream sized to the target area / 64.
        need = max(1, (target_w * target_h) // 64)
        out = bytearray()
        block = bytes(payload)[:64] or b"\x00"
        while len(out) < need:
            block = hashlib.md5(block).digest()
            out.extend(block)
        return bytes(out[:need])

    def _batch(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "width": target_w,
                    "height": target_h,
                    "payload": [_fake_resize(p) for p in pdf[payload_col]],
                }
            )

    return df.select(id_col, payload_col).mapInPandas(_batch, out_schema)


def sample_video_frames(
    df: DataFrame,
    every_n: int = 30,
    max_frames: int = 8,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    fake: bool = True,
) -> DataFrame:
    """Frame sampling for video payloads: one output row per sampled
    frame (doc_id, frame_idx, ts_ms, frame binary). The fake decoder
    derives a deterministic frame count from the payload length and
    synthesizes frame bytes from (payload md5, frame_idx); a real
    implementation swaps the inner loop for pyav/ffmpeg iteration. The
    explode-shaped output (rows >> inputs) is the part that matters for
    Spark: downstream repartitioning treats frames, not videos, as the
    unit of work.
    """
    if not fake:
        raise NotImplementedError(
            "real frame sampling requires a video codec not present in "
            "this container; swap the synthesis loop for pyav and set "
            "fake=False"
        )

    out_schema = f"{id_col} long, frame_idx int, ts_ms long, frame binary"

    def _batch(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            ids, idxs, tss, frames = [], [], [], []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                payload = bytes(payload)
                n_frames = 1 + len(payload) % 300  # fake stream length
                digest = hashlib.md5(payload).digest()
                for j, f_idx in enumerate(range(0, n_frames, every_n)):
                    if j >= max_frames:
                        break
                    ids.append(doc_id)
                    idxs.append(f_idx)
                    tss.append(f_idx * 33)  # ~30 fps
                    frames.append(
                        hashlib.md5(digest + f_idx.to_bytes(4, "big")).digest()
                    )
            yield pd.DataFrame(
                {id_col: ids, "frame_idx": idxs, "ts_ms": tss, "frame": frames}
            )

    return df.select(id_col, payload_col).mapInPandas(_batch, out_schema)


@register("multimodal_frame_sample")  # pandas-UDF path: rows-only check
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling plumbing over fake video payloads: per-frame rows
    with stable ids/timestamps and per-frame content hashes."""
    docs = load_table(spark, sf_dir, "documents", spread=True).select(
        "doc_id", F.encode("text", "utf-8").alias("payload")
    )
    frames = sample_video_frames(docs)
    return frames.select(
        "doc_id", "frame_idx", "ts_ms", F.md5("frame").alias("frame_md5")
    )
