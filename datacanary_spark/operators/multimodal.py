"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real and tested — schemas, Arrow batch shapes,
``mapInPandas`` iteration, partition sizing. Decoding goes through a
CODEC ADAPTER (same gating pattern as functions/model_adapters.py for
fastText/KenLM): the deterministic FAKEMM container codec always works
(fixtures, sandbox, byte-reproducible tests), and ``PillowImageCodec``
decodes real JPEG/PNG bytes when Pillow is installed on the workers —
imports are lazy and gated with a clear error, so the sandbox (no image
libraries) falls back to per-row contained errors for real formats.
Swapping in ffmpeg/torchaudio is one more codec class; no Spark code
changes.

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


class UnsupportedPayload(Exception):
    """A codec does not recognize this payload format (the chain moves
    on to the next codec; a recognized-but-corrupt payload raises the
    codec's own error instead, which is final)."""


class FakeContainerCodec:
    """The deterministic FAKEMM container (fixtures/tests/sandbox)."""

    def decode(self, payload: bytes) -> tuple[str, int, int, int, bytes]:
        if payload is None:
            raise ValueError("null payload")
        if bytes(payload[:len(MAGIC)]) != MAGIC:
            # not ours — maybe a real (possibly tiny) image; let the
            # next codec in the chain have it
            raise UnsupportedPayload("not a FAKEMM container")
        if len(payload) < HEADER.size:
            # magic says it IS ours, so a short payload is corrupt
            # FAKEMM data — diagnose precisely, don't hand a known
            # container to the image codec for a misleading error
            raise ValueError("truncated FAKEMM payload")
        _, kind, w, h, f = HEADER.unpack_from(payload)
        return kind.decode(), w, h, f, payload[HEADER.size:]


class NetpbmImageCodec:
    """Real image decode for binary Netpbm files (P6 = RGB "PPM",
    P5 = grayscale "PGM") in pure Python — no image library needed, so
    the real-bytes path is exercisable end-to-end even where Pillow
    isn't installed. Header per the Netpbm spec: magic, then
    whitespace-separated width/height/maxval with ``#`` comments
    allowed between tokens, one whitespace byte, then raw samples
    (1 byte/sample for maxval < 256, big-endian 2 bytes otherwise).
    """

    _MAGICS = (b"P5", b"P6")

    def decode(self, payload: bytes) -> tuple[str, int, int, int, bytes]:
        if payload is None or len(payload) == 0:
            raise ValueError("truncated payload")
        buf = bytes(payload)
        if buf[:2] not in self._MAGICS:
            raise UnsupportedPayload("not a binary Netpbm image")
        magic, pos = buf[:2], 2

        def next_token(pos: int) -> tuple[int, int]:
            # skip whitespace and '#…\n' comments, then read digits
            while pos < len(buf):
                c = buf[pos:pos + 1]
                if c.isspace():
                    pos += 1
                elif c == b"#":
                    nl = buf.find(b"\n", pos)
                    if nl < 0:
                        raise ValueError("unterminated netpbm comment")
                    pos = nl + 1
                else:
                    break
            start = pos
            while pos < len(buf) and buf[pos:pos + 1].isdigit():
                pos += 1
            if pos == start:
                raise ValueError("malformed netpbm header")
            return int(buf[start:pos]), pos

        w, pos = next_token(pos)
        h, pos = next_token(pos)
        maxval, pos = next_token(pos)
        if w <= 0 or h <= 0 or not (0 < maxval < 65536):
            raise ValueError("malformed netpbm dimensions")
        # exactly ONE whitespace byte separates header from raster
        if pos >= len(buf) or not buf[pos:pos + 1].isspace():
            raise ValueError("malformed netpbm header")
        pos += 1
        channels = 3 if magic == b"P6" else 1
        bytes_per = 1 if maxval < 256 else 2
        need = w * h * channels * bytes_per
        body = buf[pos:pos + need]
        if len(body) < need:
            raise ValueError(
                f"truncated netpbm raster: need {need}, have {len(body)}")
        return "I", w, h, 1, body


class PillowImageCodec:
    """Real image decode (JPEG/PNG/WebP/…) via Pillow.

    Import is LAZY and worker-side — the class itself is a stateless
    picklable shell, mirroring model_adapters' lazy native-handle
    contract: shipping the codec in a mapInPandas closure costs bytes,
    the library loads once per worker process. Raises ImportError with
    install guidance when Pillow is absent (the sandbox case — the
    error is contained per row by decode_media).
    """

    def decode(self, payload: bytes) -> tuple[str, int, int, int, bytes]:
        import importlib
        import io

        if payload is None or len(payload) == 0:
            raise ValueError("truncated payload")
        try:
            image_mod = importlib.import_module("PIL.Image")
        except ImportError as e:
            raise ImportError(
                "the 'Pillow' package is required to decode real image "
                "bytes but is not installed; install it on driver and "
                "executors (e.g. via --archives of a packed env) or feed "
                "FAKEMM containers") from e
        img = image_mod.open(io.BytesIO(bytes(payload)))
        w, h = img.size
        # only the first frame is materialized (``convert`` reads the
        # current frame), so report n_frames=1 — the codec contract is
        # len(body) == width*height*channels*n_frames, and advertising
        # img.n_frames here would make multi-frame GIF/WebP bodies lie
        # about their geometry downstream (resize_media infers channel
        # count from exactly that equation)
        body = img.convert("RGB").tobytes()
        return "I", int(w), int(h), 1, body


class CodecChain:
    """Try codecs in order; UnsupportedPayload falls through to the
    next codec, any other error (corrupt payload, missing library) is
    final. The LAST codec's UnsupportedPayload propagates as-is."""

    def __init__(self, codecs):
        self.codecs = list(codecs)

    def decode(self, payload: bytes) -> tuple[str, int, int, int, bytes]:
        last: Exception | None = None
        for c in self.codecs:
            try:
                return c.decode(payload)
            except UnsupportedPayload as e:
                last = e
        raise last if last is not None else ValueError("no codecs")


DEFAULT_CODEC = CodecChain([FakeContainerCodec(), NetpbmImageCodec(),
                            PillowImageCodec()])


def _decode_payload(payload: bytes) -> tuple[str, int, int, int, bytes]:
    """Back-compat shim: decode with the default codec chain."""
    return DEFAULT_CODEC.decode(payload)


def _features(body: bytes) -> np.ndarray:
    """Deterministic stand-in feature vector: L1-normalized histogram of
    the payload bytes folded into N_FEATURES buckets."""
    if len(body) == 0:
        return np.zeros(N_FEATURES, np.float32)
    arr = np.frombuffer(body, np.uint8)
    hist = np.bincount(arr % N_FEATURES, minlength=N_FEATURES).astype(np.float64)
    return (hist / hist.sum()).astype(np.float32)


def decode_media(df: DataFrame, codec=None) -> DataFrame:
    """Decode + feature-extract a media table (mapInPandas, Arrow batches).

    ``codec`` is any object with ``decode(payload) -> (kind, w, h,
    n_frames, body)`` — default is the FAKEMM + Pillow chain. It ships
    in the mapInPandas closure, so it must be picklable (the provided
    codecs are stateless shells; native libraries load lazily per
    worker).

    Per-row error containment mirrors the reference's per-rule
    containment (rule_engine.py:368-378): a bad payload yields
    ok=false + error, never a task failure.
    """
    codec = DEFAULT_CODEC if codec is None else codec

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
                    _, w, h, f, body = codec.decode(payload)
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


RESIZED_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),
    T.StructField("width", T.IntegerType(), True),     # output dims
    T.StructField("height", T.IntegerType(), True),
    T.StructField("n_frames", T.IntegerType(), True),
    T.StructField("body", T.BinaryType(), True),       # resized raster
    T.StructField("ok", T.BooleanType(), False),
    T.StructField("error", T.StringType(), True),
])


def resize_media(df: DataFrame, out_w: int, out_h: int,
                 codec=None) -> DataFrame:
    """Nearest-neighbor raster resize (the thumbnail/normalization step
    a training pipeline runs before feature extraction): decode each
    payload, treat the body as ``n_frames`` stacked ``height x width``
    single-channel rasters, index-sample every frame to ``out_h x
    out_w`` with numpy (vectorized, no Python pixel loop), and emit the
    resized raster bytes. Video rows resize per frame (the frame count
    is preserved); a body whose length does not match the declared
    geometry is a contained ok=false row, same per-row error policy as
    :func:`decode_media` — never a task failure.

    Channel count is inferred from the byte length (body bytes /
    (frames*h*w)): gray Netpbm rasters are 1 channel, Pillow-decoded
    RGB is 3 — interleaved channels ride along unchanged through the
    same index-sampling.
    """
    if out_w <= 0 or out_h <= 0:
        raise ValueError(f"output dims must be positive, got "
                         f"{out_w}x{out_h}")
    codec = DEFAULT_CODEC if codec is None else codec

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {k: [] for k in ("media_id", "kind", "width", "height",
                                   "n_frames", "body", "ok", "error")}

            def bad(mid, kind, msg):
                out["media_id"].append(mid)
                out["kind"].append(kind)
                for k in ("width", "height", "n_frames", "body"):
                    out[k].append(None)
                out["ok"].append(False)
                out["error"].append(msg)

            for mid, kind, payload in zip(pdf["media_id"], pdf["kind"],
                                          pdf["payload"]):
                try:
                    _, w, h, f, body = codec.decode(payload)
                except Exception as exc:
                    bad(mid, kind, f"{type(exc).__name__}: {exc}")
                    continue
                frames = max(f, 1)
                px = w * h * frames
                if w <= 0 or h <= 0 or len(body) == 0 \
                        or len(body) % px != 0:
                    bad(mid, kind,
                        f"geometry mismatch: {len(body)} bytes for "
                        f"{frames}x{h}x{w}")
                    continue
                ch = len(body) // px
                if ch not in (1, 3, 4):
                    # only gray/RGB/RGBA interleavings are meaningful;
                    # anything else means the declared frame geometry
                    # doesn't describe the body (e.g. a codec reporting
                    # a frame count it didn't materialize)
                    bad(mid, kind,
                        f"geometry mismatch: {len(body)} bytes imply "
                        f"{ch} channels for {frames}x{h}x{w}")
                    continue
                arr = np.frombuffer(body, np.uint8) \
                        .reshape(frames, h, w, ch)
                rows = (np.arange(out_h) * h) // out_h
                cols = (np.arange(out_w) * w) // out_w
                resized = arr[:, rows][:, :, cols]
                out["media_id"].append(mid)
                out["kind"].append(kind)
                out["width"].append(out_w)
                out["height"].append(out_h)
                out["n_frames"].append(f)
                out["body"].append(resized.tobytes())
                out["ok"].append(True)
                out["error"].append(None)
            yield pd.DataFrame(out)

    return df.mapInPandas(batches, schema=RESIZED_SCHEMA)


def sample_frames(df: DataFrame, every_k: int = 2, codec=None) -> DataFrame:
    """Frame sampling for video rows: emit one output row per sampled
    frame (frame payload = that frame's byte slice). Demonstrates the
    1→N mapInPandas fan-out shape real video pipelines use."""
    codec = DEFAULT_CODEC if codec is None else codec
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
                    kind, w, h, f, body = codec.decode(payload)
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
