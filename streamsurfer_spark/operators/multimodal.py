"""Multimodal column plumbing (SURVEY §2.3 D, Q-L7).

No counterpart in the reference (its only payload handling is JSON
marshalling — /root/reference/main.go:202,267); engine-side capability.

Design: media travel as opaque ``binary`` columns plus typed metadata
(modality, byte size, content hash). The Spark-side plumbing — schema,
partition sizing, Arrow-batched UDF signatures — is real and tested; the
actual decode (image/audio libs are not in this container) is stubbed behind
``decode_stub``/NotImplementedError with a deterministic fake so batch
shapes and schemas are exercised end-to-end.

Scale notes (100 TB of media):
- binary payloads ride in parquet as-is; `spark.sql.files.maxPartitionBytes`
  bounds scan-partition memory, and metadata predicates (modality, n_bytes)
  push down so a "images under 1 MB" filter never deserializes audio rows.
- feature extraction is mapInPandas — Arrow moves the binary batches
  zero-copy; per-batch decode amortizes Python overhead; output schema is
  declared up front so the optimizer can prune unused features.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

MEDIA_SCHEMA = (
    "doc_id bigint, modality string, n_bytes bigint, content_md5 string, payload binary"
)

FEATURE_SCHEMA = "doc_id bigint, modality string, n_bytes bigint, feat_dim int, feat_checksum bigint"


def as_media(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Wrap a table into the media envelope, faking payloads from text bytes.

    In production the payload column comes straight from the source (parquet
    binary / object-store pointers); here we synthesize deterministic bytes
    so the plumbing is testable without media files.
    """
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        F.col(id_col),
        (F.when(F.col(id_col) % 3 == 0, F.lit("image"))
         .when(F.col(id_col) % 3 == 1, F.lit("audio"))
         .otherwise(F.lit("video"))).alias("modality"),
        F.octet_length(payload).cast("long").alias("n_bytes"),
        F.md5(payload).alias("content_md5"),
        payload.alias("payload"),
    )


def decode_stub(payload: bytes, modality: str) -> bytes:
    """Placeholder for the real decoder (PIL / torchaudio / pyav).

    STUB: the container has no media libraries. The deterministic fake
    returns the payload unchanged so downstream shapes are real; a real
    deployment replaces this body and nothing else.
    """
    if modality not in ("image", "audio", "video"):
        raise NotImplementedError(f"unknown modality: {modality}")
    return payload


def _payload_bytes(doc_id, payload) -> bytes:
    """Loud NULL guard shared by every extractor: as_media yields a NULL
    payload whenever the source text is NULL, and ``bytes(None)`` dies
    with an opaque TypeError mid-task (r7 review). Name the document
    instead."""
    if payload is None:
        raise ValueError(
            f"multimodal: NULL payload for doc_id {doc_id} — filter NULL"
            " media rows before extraction"
        )
    return bytes(payload)


def extract_features(df: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the media envelope.

    mapInPandas: each Arrow batch arrives as a pandas DataFrame; we decode
    (stubbed) and emit fixed-schema features. feat_checksum is a
    deterministic stand-in for an embedding (sum of payload bytes) so tests
    can assert the batch plumbing moved the right bytes. (Arrow batch size
    is governed by spark.sql.execution.arrow.maxRecordsPerBatch — the old
    batch_hint parameter was dead and is gone, r7 review.)
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [
                decode_stub(_payload_bytes(d, p), m)
                for d, p, m in zip(pdf["doc_id"], pdf["payload"], pdf["modality"])
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "modality": pdf["modality"],
                    "n_bytes": pdf["n_bytes"],
                    "feat_dim": [len(d) % 512 for d in decoded],
                    # np.frombuffer + int64 sum, not Python sum(): the
                    # byte-wise Python loop was O(payload bytes) of
                    # interpreter work per row (guide §4.2 — hand whole
                    # buffers to native code). Same integer result: a
                    # uint8 view summed into int64 cannot overflow below
                    # 2^55 bytes per payload.
                    "feat_checksum": [
                        int(np.frombuffer(d, dtype=np.uint8).sum(dtype=np.int64))
                        for d in decoded
                    ],
                }
            )

    return df.mapInPandas(run, schema=FEATURE_SCHEMA)


FRAME_SCHEMA = "doc_id bigint, frame_idx int, frame_bytes bigint, frame_md5 string"


def sample_frames(df: DataFrame, n_frames: int = 4) -> DataFrame:
    """Uniform frame sampling over video rows — the 1→N expansion shape.

    A real decoder (pyav) yields frames; the deterministic stand-in slices
    the payload into n_frames equal chunks. The Spark-side contract being
    exercised: mapInPandas may emit MORE rows than it receives (batch
    explode), the output schema is declared, and non-video rows are pruned
    by a pushed-down predicate before any Python runs.
    """
    import hashlib

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {"doc_id": [], "frame_idx": [], "frame_bytes": [], "frame_md5": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                data = decode_stub(_payload_bytes(doc_id, payload), "video")
                step = max(len(data) // n_frames, 1)
                for i in range(n_frames):
                    chunk = data[i * step : (i + 1) * step]
                    if not chunk:
                        break
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(i)
                    out["frame_bytes"].append(len(chunk))
                    out["frame_md5"].append(hashlib.md5(chunk).hexdigest())
            yield pd.DataFrame(out)

    videos = df.where(F.col("modality") == "video")
    return videos.mapInPandas(run, schema=FRAME_SCHEMA)


RESIZED_SCHEMA = (
    "doc_id bigint, width int, height int, n_bytes_in bigint, "
    "n_bytes_out bigint, resized_md5 string"
)


def resize_images(df: DataFrame, width: int = 32, height: int = 32) -> DataFrame:
    """Resize image rows to a fixed (width, height) — the N→N reshape shape.

    A real deployment decodes with PIL and emits width*height*3 RGB bytes;
    the deterministic stand-in tiles/truncates the payload to exactly that
    many bytes, so the CONTRACT a trainer depends on — every output row has
    the identical byte budget — is exercised and asserted for real. Only
    image rows reach Python (metadata predicate pushed to the scan), and
    the declared schema drops the payload unless requested downstream.
    """
    import hashlib

    target = width * height * 3

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "doc_id": [], "width": [], "height": [],
                "n_bytes_in": [], "n_bytes_out": [], "resized_md5": [],
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                data = decode_stub(_payload_bytes(doc_id, payload), "image")
                # zero-length payloads tile a single zero byte so the
                # fixed byte-budget contract holds for every output row
                if not data:
                    data = b"\x00"
                reps = -(-target // len(data))  # ceil-div tile count
                resized = (data * reps)[:target]
                out["doc_id"].append(doc_id)
                out["width"].append(width)
                out["height"].append(height)
                out["n_bytes_in"].append(len(data))
                out["n_bytes_out"].append(len(resized))
                out["resized_md5"].append(hashlib.md5(resized).hexdigest())
            yield pd.DataFrame(out)

    images = df.where(F.col("modality") == "image")
    return images.mapInPandas(run, schema=RESIZED_SCHEMA)


SEGMENT_SCHEMA = (
    "doc_id bigint, seg_idx int, seg_start_ms bigint, seg_ms bigint, "
    "seg_bytes bigint, seg_md5 string"
)

# the stand-in "codec": 16 bytes of payload per millisecond of audio
BYTES_PER_MS = 16


def chunk_audio(df: DataFrame, segment_ms: int = 2, min_ms: int = 1) -> DataFrame:
    """Segment audio rows into fixed-duration windows — the audio twin of
    sample_frames (1→N expansion), keyed by time rather than frame index.

    A real deployment decodes with torchaudio/ffmpeg and slices PCM at
    segment_ms boundaries; the deterministic stand-in maps payload bytes to
    a fake timeline at BYTES_PER_MS. Exercised contracts: per-row expansion
    driven by row SIZE (not a constant), trailing-segment drop below
    min_ms, and a (doc_id, seg_idx, start_ms) addressing scheme stable
    under any partitioning. Only audio rows cross into Python.
    """
    import hashlib

    seg_bytes = segment_ms * BYTES_PER_MS
    min_bytes = min_ms * BYTES_PER_MS

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "doc_id": [], "seg_idx": [], "seg_start_ms": [],
                "seg_ms": [], "seg_bytes": [], "seg_md5": [],
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                data = decode_stub(_payload_bytes(doc_id, payload), "audio")
                for i in range(0, -(-len(data) // seg_bytes)):
                    chunk = data[i * seg_bytes : (i + 1) * seg_bytes]
                    if len(chunk) < min_bytes:
                        break
                    out["doc_id"].append(doc_id)
                    out["seg_idx"].append(i)
                    out["seg_start_ms"].append(i * segment_ms)
                    out["seg_ms"].append(len(chunk) // BYTES_PER_MS)
                    out["seg_bytes"].append(len(chunk))
                    out["seg_md5"].append(hashlib.md5(chunk).hexdigest())
            yield pd.DataFrame(out)

    audio = df.where(F.col("modality") == "audio")
    return audio.mapInPandas(run, schema=SEGMENT_SCHEMA)


# Fake media container header: 4-byte BE width, 4-byte BE height, then the
# payload body. Stands in for the fixed-offset metadata every real container
# format fronts its bytes with (PNG IHDR, WAV fmt, ISO-BMFF boxes).
HEADER_BYTES = 8


def with_binary_header(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Prepend a deterministic 8-byte big-endian (width, height) header to
    each media payload — builder side of the binary-container round trip.

    Pure codegen: int → zero-padded hex → unhex → byte concat. No Python.
    """
    w = (F.lit(64) + F.col(id_col) % 1856).cast("bigint")
    h = (F.lit(64) + (F.col(id_col) * 7) % 1016).cast("bigint")
    header = F.unhex(
        F.concat(F.lpad(F.hex(w), 8, "0"), F.lpad(F.hex(h), 8, "0"))
    )
    return df.withColumn("width", w).withColumn("height", h).withColumn(
        "payload", F.concat(header, F.col("payload"))
    )


def parse_binary_header(df: DataFrame) -> DataFrame:
    """Parse (width, height) back out of the payload's fixed-offset header
    — decoder side, also pure codegen (hex slice → base-16 conv).

    This is the scale-relevant point of binary columns in Spark: typed
    metadata extraction from billions of blobs happens entirely inside
    whole-stage codegen (zero Python, zero copies beyond the hex slice);
    only genuine media DECODING (pixels, samples) needs the Arrow/pandas
    path (extract_features et al.). The md5 is over the hex of the body
    slice so the check column is engine-portable (DuckDB's md5 is
    VARCHAR-only).
    """
    hx = F.hex(F.col("payload"))
    return df.select(
        F.col("doc_id"),
        F.col("modality"),
        F.conv(F.substring(hx, 1, 8), 16, 10).cast("bigint").alias("parsed_w"),
        F.conv(F.substring(hx, 9, 8), 16, 10).cast("bigint").alias("parsed_h"),
        F.md5(F.expr(f"substring(hex(payload), {HEADER_BYTES * 2 + 1})")).alias(
            "body_md5"
        ),
        (F.octet_length("payload") - HEADER_BYTES).cast("long").alias("body_bytes"),
    )
