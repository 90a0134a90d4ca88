"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real and tested — schemas, Arrow batch shapes,
``mapInPandas`` iteration, partition sizing; only the codec itself is a
deterministic fake (this container has no image/audio libraries). A real
decoder (PIL/ffmpeg/torchaudio) slots into ``_decode_payload`` without
touching any Spark code.

Fake container format (fixtures + tests):
    b"FAKEMM" | kind:1B (I/A/V) | width:u16 | height:u16 | n_frames:u16
    | payload bytes (pixels / samples / frames)

Scale notes: decode is embarrassingly parallel — ``mapInPandas`` streams
Arrow batches, so peak executor memory is O(batch), not O(partition).
Binary payloads dominate row size: pipelines should set
``spark.sql.execution.arrow.maxRecordsPerBatch`` low (the session
default here is 2048) and partition inputs by size
(``spark.sql.files.maxPartitionBytes``), not row count. Feature
extraction emits fixed-width float arrays → downstream joins/ANN see
a normal embedding column (operators/similarity.py).
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

MAGIC = b"FAKEMM"
HEADER = struct.Struct(">6sc3H")  # magic, kind, width, height, n_frames

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),        # image|audio|video
    T.StructField("payload", T.BinaryType(), True),
    T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
])

DECODED_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("n_frames", T.IntegerType(), True),
    T.StructField("n_bytes", T.LongType(), True),
    T.StructField("ok", T.BooleanType(), False),
    T.StructField("error", T.StringType(), True),
    T.StructField("features", T.ArrayType(T.FloatType()), True),
])

N_FEATURES = 32


def encode_fake_media(kind: str, width: int, height: int, n_frames: int,
                      payload: bytes) -> bytes:
    return HEADER.pack(MAGIC, kind[:1].upper().encode(), width, height,
                       n_frames) + payload


def _decode_payload(payload: bytes) -> tuple[str, int, int, int, bytes]:
    """Parse the fake container. A real decoder replaces this function.

    Raises on unknown formats — real JPEG/PNG/WAV decode is
    intentionally unimplemented in this environment.
    """
    if payload is None or len(payload) < HEADER.size:
        raise ValueError("truncated payload")
    magic, kind, w, h, f = HEADER.unpack_from(payload)
    if magic != MAGIC:
        raise NotImplementedError(
            "real codec decode (JPEG/PNG/WAV/MP4) not available in this "
            "environment; only the FAKEMM container is supported")
    return kind.decode(), w, h, f, payload[HEADER.size:]


def _features(body: bytes) -> np.ndarray:
    """Deterministic stand-in feature vector: L1-normalized histogram of
    the payload bytes folded into N_FEATURES buckets."""
    if len(body) == 0:
        return np.zeros(N_FEATURES, np.float32)
    arr = np.frombuffer(body, np.uint8)
    hist = np.bincount(arr % N_FEATURES, minlength=N_FEATURES).astype(np.float64)
    return (hist / hist.sum()).astype(np.float32)


def decode_media(df: DataFrame) -> DataFrame:
    """Decode + feature-extract a media table (mapInPandas, Arrow batches).

    Per-row error containment mirrors the reference's per-rule
    containment (rule_engine.py:368-378): a bad payload yields
    ok=false + error, never a task failure.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {k: [] for k in ("media_id", "kind", "width", "height",
                                   "n_frames", "n_bytes", "ok", "error",
                                   "features")}
            for mid, kind, payload in zip(pdf["media_id"], pdf["kind"],
                                          pdf["payload"]):
                out["media_id"].append(mid)
                out["kind"].append(kind)
                try:
                    _, w, h, f, body = _decode_payload(payload)
                    out["width"].append(w)
                    out["height"].append(h)
                    out["n_frames"].append(f)
                    out["n_bytes"].append(len(body))
                    out["ok"].append(True)
                    out["error"].append(None)
                    out["features"].append(_features(body))
                except Exception as exc:  # contained per row
                    for k in ("width", "height", "n_frames", "n_bytes"):
                        out[k].append(None)
                    out["ok"].append(False)
                    out["error"].append(f"{type(exc).__name__}: {exc}")
                    out["features"].append(None)
            yield pd.DataFrame(out)

    return df.mapInPandas(batches, schema=DECODED_SCHEMA)


def sample_frames(df: DataFrame, every_k: int = 2) -> DataFrame:
    """Frame sampling for video rows: emit one output row per sampled
    frame (frame payload = that frame's byte slice). Demonstrates the
    1→N mapInPandas fan-out shape real video pipelines use."""
    schema = T.StructType([
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_ix", T.IntegerType(), False),
        T.StructField("frame_bytes", T.BinaryType(), True),
    ])

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {"media_id": [], "frame_ix": [], "frame_bytes": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    kind, w, h, f, body = _decode_payload(payload)
                except Exception:
                    continue
                if kind != "V" or f == 0:
                    continue
                frame_sz = max(len(body) // max(f, 1), 1)
                for ix in range(0, f, every_k):
                    rows["media_id"].append(mid)
                    rows["frame_ix"].append(ix)
                    rows["frame_bytes"].append(
                        body[ix * frame_sz:(ix + 1) * frame_sz])
            yield pd.DataFrame(rows)

    return df.mapInPandas(batches, schema=schema)


def make_fixture_media(spark, n: int = 60, seed: int = 4242) -> DataFrame:
    """Deterministic fake media table (images/audio/video + corrupt rows)."""
    rng = np.random.default_rng(seed)
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        w, h = int(rng.integers(4, 64)), int(rng.integers(4, 64))
        frames = int(rng.integers(2, 9)) if kind == "video" else 1
        body = rng.integers(0, 256, size=w * h * frames, dtype=np.uint8).tobytes()
        if i % 17 == 0:
            payload = b"JUNK" + body[:16]  # corrupt: exercises containment
        else:
            payload = encode_fake_media(kind, w, h, frames, body)
        rows.append((i, kind, bytearray(payload),
                     {"w": str(w), "h": str(h), "frames": str(frames)}))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
