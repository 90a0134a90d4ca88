"""Perceptual image hashing (dHash) + hamming-banded near-dup pairs.

Image near-dup in a multimodal training corpus can't rely on byte
equality — re-encoded, resized, or slightly-edited copies of one image
share no bytes. The standard cheap answer is a 64-bit difference hash
(dHash: downscale to a 9x8 luma grid, one bit per horizontal
neighbor comparison) and near-dup = small hamming distance. The
reference toolkit has no media surface at all; this module completes
the multimodal family (operators/multimodal.py) with the dedup pass a
100-TB image-text corpus needs.

Scale shape
-----------
* ``dhash_media``: one ``mapInPandas`` pass (same codec-adapter seam as
  ``decode_media``) — decode, nearest-neighbor sample to the hash grid,
  integer luma, pack 64 bits. Embarrassingly parallel, O(batch) memory;
  per-row error containment (bad payload -> ok=false, never a task
  failure).
* ``phash_near_pairs``: NEVER all-pairs. The 64-bit hash splits into
  ``bands`` fixed bit-slices (default 4x16); by pigeonhole, two hashes
  within hamming distance d < bands share at least one identical band,
  so candidates come from an equi-join on (band_ix, band_val) — one
  shuffle on the band key, exactly the MinHash-LSH plan shape
  (operators/dedup.py) — and are confirmed with
  ``bit_count(a XOR b) <= d`` in pure JVM expressions. A
  ``max_bucket`` cap bounds flat-image skew (e.g. millions of
  single-color thumbnails hash identically; their all-zero bands would
  otherwise quadratically explode one bucket).

Determinism: the downscale is the same nearest-neighbor geometry as
``resize_media`` (index ``floor(i*src/dst)``) and the luma is integer
ITU-R BT.601 (``(77R+150G+29B)>>8``), so one byte stream hashes
identically on every engine/partitioning — the property the
oracle-checked contract query pins.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

from datacanary_spark.operators.multimodal import DEFAULT_CODEC

__all__ = ["dhash_bits", "dhash_media", "phash_near_pairs",
           "video_phash_frames", "video_near_dup_pairs",
           "audio_dhash_bits", "audio_dhash"]

HASH_W, HASH_H = 9, 8          # 8 rows x 8 comparisons = 64 bits

DHASH_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("dhash", T.LongType(), True),
    T.StructField("ok", T.BooleanType(), False),
    T.StructField("error", T.StringType(), True),
])


def dhash_bits(body: bytes, width: int, height: int, channels: int) -> int:
    """64-bit dHash of one decoded frame (pure function; shared by the
    Spark pass and the tests). Bit ``r*8+c`` (LSB first) is 1 iff the
    downscaled luma grid has ``px[r,c] < px[r,c+1]``."""
    arr = np.frombuffer(body, np.uint8)[:width * height * channels]
    arr = arr.reshape(height, width, channels).astype(np.int64)
    if channels >= 3:
        luma = (77 * arr[:, :, 0] + 150 * arr[:, :, 1]
                + 29 * arr[:, :, 2]) >> 8
    else:
        luma = arr[:, :, 0]
    rows = (np.arange(HASH_H) * height) // HASH_H
    cols = (np.arange(HASH_W) * width) // HASH_W
    grid = luma[np.ix_(rows, cols)]
    bits = (grid[:, :-1] < grid[:, 1:]).astype(np.uint64).ravel()
    # LSB-first pack; bit 63 may set the sign of the int64 — harmless,
    # both the band slicing and bit_count are sign-agnostic
    return int(np.bitwise_or.reduce(
        bits << np.arange(64, dtype=np.uint64)).astype(np.int64))


def encode_hash_image(target_bits: int) -> bytes:
    """9x8 single-channel raster whose dHash is exactly
    ``target_bits``: each row walks +1/-1 per bit. Fixture helper for
    the oracle-checked contract queries and demos (the tests keep an
    independent local twin)."""
    px = np.zeros((HASH_H, HASH_W), np.uint8)
    for r in range(HASH_H):
        px[r, 0] = 128
        for c in range(HASH_W - 1):
            bit = (target_bits >> (r * 8 + c)) & 1
            px[r, c + 1] = px[r, c] + (1 if bit else -1)
    return px.tobytes()


def dhash_media(df: DataFrame, codec=None) -> DataFrame:
    """``(media_id, payload)`` -> ``(media_id, dhash, ok, error)``.

    Decodes through the codec-adapter chain (FAKEMM / Netpbm / Pillow,
    operators/multimodal.py) and hashes the FIRST frame. Non-image
    payloads and decode failures yield ``ok=false`` with the error
    contained per row."""
    codec = DEFAULT_CODEC if codec is None else codec

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {"media_id": [], "dhash": [], "ok": [], "error": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                out["media_id"].append(mid)
                try:
                    kind, w, h, f, body = codec.decode(payload)
                    if kind != "I":
                        raise ValueError(f"not an image (kind={kind})")
                    n_px = w * h
                    if n_px == 0 or len(body) % n_px:
                        raise ValueError("body/geometry mismatch")
                    channels = len(body) // n_px // max(f, 1)
                    frame = body[:n_px * channels]
                    out["dhash"].append(dhash_bits(frame, w, h, channels))
                    out["ok"].append(True)
                    out["error"].append(None)
                except Exception as exc:  # contained per row
                    out["dhash"].append(None)
                    out["ok"].append(False)
                    out["error"].append(f"{type(exc).__name__}: {exc}")
            yield pd.DataFrame(out)

    return (df.select("media_id", "payload")
              .mapInPandas(batches, DHASH_SCHEMA))


def phash_near_pairs(hashes: DataFrame, max_distance: int = 2,
                     bands: int = 4, max_bucket: int = 10_000,
                     id_col: str = "media_id",
                     hash_col: str = "dhash") -> DataFrame:
    """Near-duplicate pairs ``(id_a, id_b, distance)`` with
    ``hamming(dhash_a, dhash_b) <= max_distance`` and ``id_a > id_b``.

    Requires ``max_distance < bands`` (the pigeonhole guarantee that
    every qualifying pair shares at least one intact band — with equal
    64/bands-bit slices, d < bands flipped bits cannot touch all
    bands). Buckets larger than ``max_bucket`` are dropped (flat-image
    skew cap, same contract as lsh_candidate_pairs' max_bucket); the
    candidate join, distinct, and bit_count verify are all JVM
    expressions — no Python past the input hashes.
    """
    if not 0 <= max_distance < bands:
        raise ValueError(f"need 0 <= max_distance < bands for the "
                         f"pigeonhole guarantee, got d={max_distance}, "
                         f"bands={bands}")
    if 64 % bands:
        raise ValueError(f"bands must divide 64, got {bands}")
    width = 64 // bands
    mask = (1 << width) - 1
    h = F.col(hash_col)
    band_vals = F.array(*[
        F.shiftrightunsigned(h, i * width).bitwiseAND(F.lit(mask))
        for i in range(bands)])

    base = (hashes.where(F.col(hash_col).isNotNull())
                  .select(F.col(id_col).alias("_id"),
                          h.alias("_h"),
                          F.posexplode(band_vals).alias("band_ix",
                                                        "band_val")))
    sized = base.withColumn(
        "_n", F.count(F.lit(1)).over(
            Window.partitionBy("band_ix", "band_val")))
    pruned = sized.where(F.col("_n") <= max_bucket).drop("_n")

    a = pruned.select(F.col("_id").alias("id_a"), F.col("_h").alias("ha"),
                      "band_ix", "band_val")
    b = pruned.select(F.col("_id").alias("id_b"), F.col("_h").alias("hb"),
                      "band_ix", "band_val")
    dist = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
    return (a.join(b, ["band_ix", "band_val"])
             .where(F.col("id_a") > F.col("id_b"))
             .where(dist <= max_distance)
             .select("id_a", "id_b", dist.alias("distance"))
             .distinct())


# ---------------------------------------------------------------------------
# Video: per-frame dHash signatures -> shared-frame near-dup pairs
# ---------------------------------------------------------------------------

FRAME_HASH_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("frame_ix", T.IntegerType(), True),
    T.StructField("dhash", T.LongType(), True),
    T.StructField("ok", T.BooleanType(), False),
    T.StructField("error", T.StringType(), True),
])


def video_phash_frames(df: DataFrame, codec=None, sample_every: int = 1,
                       max_frames: int | None = None) -> DataFrame:
    """``(media_id, payload)`` -> one row per SAMPLED frame
    ``(media_id, frame_ix, dhash, ok, error)``.

    Decodes video containers (frame-major raster body) and dHashes
    every ``sample_every``-th frame, at most ``max_frames`` per video —
    the sampling knobs bound per-row output for hour-long inputs
    (without them one video could emit 10^5 rows; with stride+cap the
    fan-out is a constant). Failed decodes emit ONE ok=false row so
    accounting never loses the video."""
    codec = DEFAULT_CODEC if codec is None else codec
    if sample_every < 1:
        raise ValueError(f"sample_every must be >= 1, got {sample_every}")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {"media_id": [], "frame_ix": [], "dhash": [],
                   "ok": [], "error": []}

            def emit(mid, ix, hv, ok, err):
                out["media_id"].append(mid)
                out["frame_ix"].append(ix)
                out["dhash"].append(hv)
                out["ok"].append(ok)
                out["error"].append(err)

            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    kind, w, h, f, body = codec.decode(payload)
                    if kind not in ("V", "I"):
                        raise ValueError(f"not video/image (kind={kind})")
                    f = max(f, 1)
                    n_px = w * h
                    if n_px == 0 or len(body) % (n_px * f):
                        raise ValueError("body/geometry mismatch")
                    channels = len(body) // (n_px * f)
                    frame_bytes = n_px * channels
                    ixs = range(0, f, sample_every)
                    if max_frames is not None:
                        ixs = list(ixs)[:max_frames]
                    for ix in ixs:
                        frame = body[ix * frame_bytes:(ix + 1) * frame_bytes]
                        emit(mid, ix, dhash_bits(frame, w, h, channels),
                             True, None)
                except Exception as exc:  # contained per row
                    emit(mid, None, None, False,
                         f"{type(exc).__name__}: {exc}")
            yield pd.DataFrame(out)

    return (df.select("media_id", "payload")
              .mapInPandas(batches, FRAME_HASH_SCHEMA))


def video_near_dup_pairs(frames: DataFrame, min_shared: int = 3,
                         max_posting: int = 10_000,
                         id_col: str = "media_id",
                         hash_col: str = "dhash") -> DataFrame:
    """Video pairs sharing >= ``min_shared`` DISTINCT frame hashes:
    ``(id_a, id_b, shared_frames)`` with ``id_a > id_b``.

    The winnowing-overlap plan shape (operators/dedup.py's
    winnow_overlap_pairs): dedupe to (video, hash) postings, drop
    ubiquitous hashes (> ``max_posting`` videos — black/title-card
    frames are the skew analogue of boilerplate fingerprints; a hash
    this common identifies nothing and would square one bucket),
    self-join on the hash, count distinct shared hashes per pair.
    Shuffles are keyed by frame hash (near-uniform) and by the pair —
    never all-pairs, no Python."""
    posts = (frames.where(F.col(hash_col).isNotNull())
                   .select(F.col(id_col).alias("_id"),
                           F.col(hash_col).alias("_h"))
                   .distinct())
    sized = posts.withColumn(
        "_n", F.count(F.lit(1)).over(Window.partitionBy("_h")))
    pruned = sized.where(F.col("_n") <= max_posting).drop("_n")
    a = pruned.select(F.col("_id").alias("id_a"), "_h")
    b = pruned.select(F.col("_id").alias("id_b"), "_h")
    return (a.join(b, "_h")
             .where(F.col("id_a") > F.col("id_b"))
             .groupBy("id_a", "id_b")
             .agg(F.count(F.lit(1)).alias("shared_frames"))
             .where(F.col("shared_frames") >= min_shared))


# ---------------------------------------------------------------------------
# Audio: 1-D envelope dHash (Philips-robust-hash shape without the FFT)
# ---------------------------------------------------------------------------

def audio_dhash_bits(samples: bytes, n_windows: int = 65) -> int:
    """64-bit envelope hash of one unsigned-8-bit sample stream: split
    into ``n_windows`` equal windows (floor boundaries), bit i is 1 iff
    window i's mean amplitude < window i+1's. The comparison is exact
    integer cross-multiplication (sum_i * len_j vs sum_j * len_i) — no
    float rounding, so one byte stream hashes identically everywhere.
    Streams shorter than ``n_windows`` samples hash to 0 (every window
    mean ties or is empty -> no strict increase)."""
    if n_windows != 65:
        raise ValueError("64-bit packing requires exactly 65 windows")
    arr = np.frombuffer(samples, np.uint8).astype(np.int64)
    n = arr.shape[0]
    if n < n_windows:
        return 0
    bounds = (np.arange(n_windows + 1) * n) // n_windows
    csum = np.concatenate([[0], np.cumsum(arr)])
    sums = csum[bounds[1:]] - csum[bounds[:-1]]
    lens = bounds[1:] - bounds[:-1]
    lt = (sums[:-1] * lens[1:] < sums[1:] * lens[:-1]).astype(np.uint64)
    return int(np.bitwise_or.reduce(
        lt << np.arange(64, dtype=np.uint64)).astype(np.int64))


def encode_hash_wave(target_bits: int, samples_per_window: int = 4) -> bytes:
    """Unsigned-8-bit sample stream of 65 constant windows whose
    envelope dHash is exactly ``target_bits`` (the 1-D twin of
    ``encode_hash_image``; fixture helper for contract queries)."""
    vals, cur = [], 128
    for w in range(65):
        vals.extend([cur] * samples_per_window)
        if w < 64:
            cur += 1 if (target_bits >> w) & 1 else -1
    return bytes(vals)


def audio_dhash(df: DataFrame, codec=None) -> DataFrame:
    """``(media_id, payload)`` -> ``(media_id, dhash, ok, error)`` for
    audio containers. Near-dup pairs come from the SAME
    ``phash_near_pairs`` banding (the hash is 64 bits either way)."""
    codec = DEFAULT_CODEC if codec is None else codec

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {"media_id": [], "dhash": [], "ok": [], "error": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                out["media_id"].append(mid)
                try:
                    kind, w, h, f, body = codec.decode(payload)
                    if kind != "A":
                        raise ValueError(f"not audio (kind={kind})")
                    out["dhash"].append(audio_dhash_bits(body))
                    out["ok"].append(True)
                    out["error"].append(None)
                except Exception as exc:  # contained per row
                    out["dhash"].append(None)
                    out["ok"].append(False)
                    out["error"].append(f"{type(exc).__name__}: {exc}")
            yield pd.DataFrame(out)

    return (df.select("media_id", "payload")
              .mapInPandas(batches, DHASH_SCHEMA))
