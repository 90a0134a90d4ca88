"""Perceptual dHash + hamming-banded near-dup tests."""

from __future__ import annotations

import numpy as np
import pytest

from datacanary_spark.operators.media_hash import (
    HASH_H,
    HASH_W,
    dhash_bits,
    dhash_media,
    phash_near_pairs,
)
from datacanary_spark.operators.multimodal import encode_fake_media


def grid_image(target_bits: int) -> bytes:
    """Build a 9x8 single-channel body whose dHash is exactly
    ``target_bits``: walk each row left->right, stepping +1 for a 1
    bit and -1 for a 0 bit (values stay well inside [0,255])."""
    px = np.zeros((HASH_H, HASH_W), np.uint8)
    for r in range(HASH_H):
        px[r, 0] = 128
        for c in range(HASH_W - 1):
            bit = (target_bits >> (r * 8 + c)) & 1
            px[r, c + 1] = px[r, c] + (1 if bit else -1)
    return px.tobytes()


def test_dhash_matches_constructed_bits():
    for target in (0, 0xFFFFFFFFFFFFFFFF, 0x123456789ABCDEF0,
                   1 << 63, 0xAAAAAAAAAAAAAAAA):
        body = grid_image(target)
        got = dhash_bits(body, HASH_W, HASH_H, 1)
        assert got & 0xFFFFFFFFFFFFFFFF == target


def test_dhash_hand_computed_2x2_grid():
    # 18x16 image sampled at rows (0,2,4,..) cols (0,2,4,..): make the
    # sampled grid strictly increasing left->right in every row -> all
    # 64 bits set
    w, h = 18, 16
    px = np.tile(np.arange(w, dtype=np.uint8), (h, 1))
    val = dhash_bits(px.tobytes(), w, h, 1)
    assert val & 0xFFFFFFFFFFFFFFFF == 0xFFFFFFFFFFFFFFFF
    # strictly decreasing -> no bits set
    px2 = px[:, ::-1].copy()
    assert dhash_bits(px2.tobytes(), w, h, 1) == 0


def test_dhash_ignores_unsampled_pixels():
    # 18x16 -> samples rows 0,2,..,14 and cols 0,2,..,16: perturbing an
    # odd row/col must not change the hash (re-encode robustness twin)
    w, h = 18, 16
    rng = np.random.RandomState(7)
    px = rng.randint(0, 255, (h, w)).astype(np.uint8)
    base = dhash_bits(px.tobytes(), w, h, 1)
    px[1, 1] = (int(px[1, 1]) + 100) % 256
    px[15, 17] = 0
    assert dhash_bits(px.tobytes(), w, h, 1) == base


def test_dhash_rgb_luma_vs_gray():
    # a gray RGB image (R=G=B=v) must hash like the single-channel one:
    # (77+150+29)*v >> 8 = v (the BT.601 weights sum to 256)
    w, h = HASH_W, HASH_H
    rng = np.random.RandomState(11)
    gray = rng.randint(0, 255, (h, w)).astype(np.uint8)
    rgb = np.repeat(gray[:, :, None], 3, axis=2)
    assert (dhash_bits(rgb.tobytes(), w, h, 3)
            == dhash_bits(gray.tobytes(), w, h, 1))


def _media_df(spark, rows):
    return spark.createDataFrame(rows, "media_id bigint, payload binary")


def test_dhash_media_end_to_end_and_error_containment(spark):
    body = grid_image(0x0F0F0F0F0F0F0F0F)
    rows = [
        (1, encode_fake_media("I", HASH_W, HASH_H, 1, body)),
        (2, encode_fake_media("I", HASH_W, HASH_H, 1, body)),   # dup
        (3, encode_fake_media("A", 0, 0, 1, b"\x00" * 50)),     # audio
        (4, b"garbage-not-a-container"),
        (5, None),
    ]
    out = {r.media_id: r for r in dhash_media(_media_df(spark, rows)).collect()}
    assert out[1].ok and out[2].ok
    assert out[1].dhash == out[2].dhash
    assert out[1].dhash & 0xFFFFFFFFFFFFFFFF == 0x0F0F0F0F0F0F0F0F
    for bad in (3, 4, 5):
        assert not out[bad].ok and out[bad].dhash is None
        assert out[bad].error


def test_dhash_media_netpbm_real_bytes(spark):
    # real (pure-Python-decodable) image bytes through the codec chain
    body = grid_image(0xDEADBEEFCAFEF00D)
    ppm = b"P5 9 8 255\n" + body
    out = dhash_media(_media_df(spark, [(1, ppm)])).collect()[0]
    assert out.ok
    assert out.dhash & 0xFFFFFFFFFFFFFFFF == 0xDEADBEEFCAFEF00D


def flip(bits: int, *positions: int) -> int:
    for p in positions:
        bits ^= 1 << p
    return bits


def test_phash_near_pairs_banding_and_verify(spark):
    t = 0x5A5A_1234_ABCD_0F0F
    hashes = [
        (1, t), (2, t),                 # distance 0
        (3, flip(t, 5)),                # distance 1 from t
        (4, flip(t, 5, 20, 40)),        # distance 3: beyond max_distance=2
        (5, flip(t, 0, 17, 33, 49)),    # distance 4, one flip per band:
                                        # candidate via NO band -> absent
    ]
    df = spark.createDataFrame(hashes, "media_id bigint, dhash bigint")
    got = {(r.id_a, r.id_b): r.distance
           for r in phash_near_pairs(df, max_distance=2).collect()}
    # d(4,3) = 2 (bits 20,40 differ; bands 0,3 intact -> found);
    # d(4,1) = d(4,2) = 3 and d(5,*) >= 4 -> verified away or unseen
    assert got == {(2, 1): 0, (3, 1): 1, (3, 2): 1, (4, 3): 2}

    # widen the distance budget -> need more bands for the pigeonhole
    got3 = {(r.id_a, r.id_b)
            for r in phash_near_pairs(df, max_distance=3,
                                      bands=8).collect()}
    assert {(4, 3), (4, 1), (4, 2)} <= got3
    assert all(a != 5 for a, _ in got3)           # id 5 is d>=4 from all


def test_phash_near_pairs_validation(spark):
    df = spark.createDataFrame([(1, 0)], "media_id bigint, dhash bigint")
    with pytest.raises(ValueError):
        phash_near_pairs(df, max_distance=4, bands=4)
    with pytest.raises(ValueError):
        phash_near_pairs(df, bands=5)


def test_phash_bucket_cap_drops_flat_skew(spark):
    # 50 identical all-zero hashes (flat thumbnails) + one near pair
    rows = [(i, 0) for i in range(50)]
    t = 0x0123456789ABCDEF
    rows += [(100, t), (101, flip(t, 3))]
    df = spark.createDataFrame(rows, "media_id bigint, dhash bigint")
    got = {(r.id_a, r.id_b)
           for r in phash_near_pairs(df, max_distance=2,
                                     max_bucket=10).collect()}
    # the flat bucket (50 > cap) is dropped entirely; the honest pair
    # survives because ITS bands are under the cap
    assert got == {(101, 100)}


def test_phash_plan_stays_jvm_side(spark):
    df = spark.createDataFrame([(1, 0), (2, 1)],
                               "media_id bigint, dhash bigint")
    plan = (phash_near_pairs(df)._jdf.queryExecution()
            .executedPlan().toString())
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
