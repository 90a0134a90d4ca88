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

__all__ = ["dhash_bits", "dhash_media", "phash_near_pairs"]

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
