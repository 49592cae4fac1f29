"""Multimodal column convention + Arrow-batched processing plumbing.

Convention: media travel as opaque ``binary`` columns next to a typed metadata
struct (format, byte length, checksum). Decode / feature-extraction runs as
``mapInPandas`` (Arrow batches, no per-row Python overhead); the actual codec
call is STUBBED — image/audio libraries are not in this container — behind a
deterministic fake so the Spark-side plumbing (schema, batching, partitioning,
UDF signature) is real and tested. Swap ``_decode_stub`` for a real decoder
(PIL/librosa/ffmpeg) on a cluster that has them.

At 100 TB: binary payloads ride the same partitioning as their keys; feature
extraction is embarrassingly parallel per Arrow batch; repartition by byte
size (not row count) before decode to even out batch cost.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("checksum", T.LongType()),
        T.StructField("feat_dim", T.IntegerType()),
        T.StructField("decode_status", T.StringType()),
    ]
)


def to_media_table(docs: DataFrame) -> DataFrame:
    """Build the multimodal convention table from documents: payload bytes +
    metadata struct. (Testdata has no real media; text bytes stand in as the
    opaque payload — the schema/partitioning contract is what's exercised.)"""
    payload = F.encode(F.col("text"), "UTF-8")
    return docs.select(
        "doc_id",
        payload.alias("payload"),
        F.struct(
            F.lit("text/plain").alias("format"),
            F.length(payload).alias("n_bytes"),
            F.md5("text").alias("checksum_md5"),
        ).alias("meta"),
    )


def _decode_stub(payload: bytes) -> dict:
    """STUB decoder: a real implementation would decode image/audio/video here
    (e.g. PIL.Image.open(io.BytesIO(payload))). Deterministic fake features:
    byte length + additive checksum of the first 64 bytes."""
    head = payload[:64]
    return {
        "n_bytes": len(payload),
        "checksum": sum(head),
        "feat_dim": 64,
        "decode_status": "stubbed",
    }


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the media table via mapInPandas."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [_decode_stub(p) for p in pdf["payload"]]
            out = pd.DataFrame(feats)
            out.insert(0, "doc_id", pdf["doc_id"].values)
            yield out

    return media.mapInPandas(batches, schema=FEATURE_SCHEMA)


def multimodal_pipeline(docs: DataFrame) -> DataFrame:
    """documents -> media convention -> batched (stubbed) decode -> features."""
    return extract_features(to_media_table(docs))


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_bytes", T.IntegerType()),
        T.StructField("frame_checksum", T.LongType()),
    ]
)

FRAME_SIZE = 16
FRAME_STRIDE = 4  # sample every 4th frame


def frame_sample(media: DataFrame) -> DataFrame:
    """Video-style frame sampling over binary payloads via mapInPandas with
    MULTI-ROW output per input (one row per sampled frame) — the batch shape a
    real video pipeline needs (decode is stubbed: fixed-size byte windows
    stand in for frames; swap the slicing for an ffmpeg/PyAV keyframe read on
    a real cluster). Frames are FRAME_SIZE-byte windows; every FRAME_STRIDE-th
    full frame is sampled and checksummed."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n_frames = len(payload) // FRAME_SIZE
                for idx in range(0, n_frames, FRAME_STRIDE):
                    chunk = payload[idx * FRAME_SIZE : (idx + 1) * FRAME_SIZE]
                    rows.append((int(doc_id), idx, len(chunk), int(sum(chunk))))
            yield pd.DataFrame(
                rows, columns=["doc_id", "frame_idx", "frame_bytes", "frame_checksum"]
            )

    return media.mapInPandas(batches, schema=FRAME_SCHEMA)


RESIZE_BUCKETS = 16

RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("resized", T.ArrayType(T.LongType())),
    ]
)


def resize_pool(media: DataFrame) -> DataFrame:
    """Resize/downsample plumbing: pool the payload into RESIZE_BUCKETS
    equal byte ranges (bucket SUMS, kept integer so the result is exact in
    any engine) via mapInPandas — the stub stand-in for an image resize
    (swap the pooling for PIL `Image.resize` on a cluster that has it; the
    Arrow batch shape, schema, and partitioning are what's exercised)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n = len(payload)
                buckets = []
                for i in range(RESIZE_BUCKETS):
                    lo = i * n // RESIZE_BUCKETS
                    hi = (i + 1) * n // RESIZE_BUCKETS
                    buckets.append(int(sum(payload[lo:hi])))
                rows.append((int(doc_id), n, buckets))
            yield pd.DataFrame(rows, columns=["doc_id", "n_bytes", "resized"])

    return media.mapInPandas(batches, schema=RESIZE_SCHEMA)


AUDIO_WIN = 32  # bytes per analysis window
AUDIO_HOP = 16  # hop size: 50% overlap

AUDIO_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("win_idx", T.IntegerType()),
        T.StructField("energy", T.LongType()),
    ]
)


def audio_windows(media: DataFrame) -> DataFrame:
    """Audio-style overlapping analysis windows over binary payloads: 32-byte
    windows at a 16-byte hop (50% overlap), per-window integer energy
    (sum of squared byte values — exact in any engine). The stub stand-in for
    an STFT/MFCC frame pass (swap the energy for librosa on a cluster that
    has it); what's exercised is the overlapping-window fan-out shape that
    audio featurization needs and frame_sample's strided windows don't:
    each byte lands in up to two output rows."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n = len(payload)
                n_wins = (n - AUDIO_WIN) // AUDIO_HOP + 1 if n >= AUDIO_WIN else 0
                for k in range(n_wins):
                    chunk = payload[k * AUDIO_HOP : k * AUDIO_HOP + AUDIO_WIN]
                    rows.append((int(doc_id), k, int(sum(b * b for b in chunk))))
            yield pd.DataFrame(rows, columns=["doc_id", "win_idx", "energy"])

    return media.mapInPandas(batches, schema=AUDIO_SCHEMA)
