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


# ---------------------------------------------------------------------------
# video: per-frame hashes + shared-frame pairs
# ---------------------------------------------------------------------------

def video_payload(frame_targets):
    body = b"".join(grid_image(t) for t in frame_targets)
    return encode_fake_media("V", HASH_W, HASH_H, len(frame_targets), body)


def test_video_phash_frames_and_sampling(spark):
    from datacanary_spark.operators.media_hash import video_phash_frames

    targets = [0x11, 0x22, 0x33, 0x44, 0x55]
    df = _media_df(spark, [(1, video_payload(targets)),
                           (2, b"not media"),
                           (3, encode_fake_media("A", 0, 0, 1, b"\x01" * 99))])
    rows = video_phash_frames(df).collect()
    good = sorted((r.frame_ix, r.dhash) for r in rows if r.media_id == 1)
    assert good == [(i, t) for i, t in enumerate(targets)]
    bad = [r for r in rows if r.media_id in (2, 3)]
    assert len(bad) == 2 and all(not r.ok and r.error for r in bad)

    sampled = video_phash_frames(df, sample_every=2, max_frames=2) \
        .where("media_id = 1").collect()
    assert sorted(r.frame_ix for r in sampled) == [0, 2]


def test_video_near_dup_pairs_shared_frames(spark):
    from datacanary_spark.operators.media_hash import (
        video_near_dup_pairs,
        video_phash_frames,
    )

    # v1 and v2 share 3 frame hashes (one repeated in v2 counts once);
    # v3 shares only 1 with v1; v4 disjoint
    df = _media_df(spark, [
        (1, video_payload([0xA, 0xB, 0xC, 0xD])),
        (2, video_payload([0xC, 0xB, 0xB, 0xA, 0xFF])),
        (3, video_payload([0xA, 0x111, 0x222])),
        (4, video_payload([0x333, 0x444])),
    ])
    frames = video_phash_frames(df)
    got = {(r.id_a, r.id_b): r.shared_frames
           for r in video_near_dup_pairs(frames, min_shared=3).collect()}
    assert got == {(2, 1): 3}
    got1 = {(r.id_a, r.id_b): r.shared_frames
            for r in video_near_dup_pairs(frames, min_shared=1).collect()}
    assert got1 == {(2, 1): 3, (3, 1): 1, (3, 2): 1}


def test_video_pairs_posting_cap_drops_ubiquitous_frames(spark):
    from datacanary_spark.operators.media_hash import video_near_dup_pairs

    # a black frame (hash 0) in 30 videos + one honest 3-frame overlap
    rows = [(i, 0, 0) for i in range(30)]
    rows += [(100, f, h) for f, h in enumerate([0x1, 0x2, 0x3])]
    rows += [(101, f, h) for f, h in enumerate([0x3, 0x2, 0x1])]
    frames = spark.createDataFrame(
        rows, "media_id bigint, frame_ix int, dhash bigint")
    got = {(r.id_a, r.id_b): r.shared_frames
           for r in video_near_dup_pairs(frames, min_shared=2,
                                         max_posting=10).collect()}
    assert got == {(101, 100): 3}


# ---------------------------------------------------------------------------
# audio: envelope dHash
# ---------------------------------------------------------------------------

def audio_wave(target_bits: int, samples_per_window: int = 4) -> bytes:
    """65 constant windows walking +1/-1 per target bit."""
    vals, cur = [], 128
    for w in range(65):
        vals.extend([cur] * samples_per_window)
        if w < 64:
            bit = (target_bits >> w) & 1
            cur += 1 if bit else -1
    return bytes(vals)


def test_audio_dhash_bits_constructed_and_edge_cases():
    from datacanary_spark.operators.media_hash import audio_dhash_bits

    for target in (0, 0xFFFFFFFFFFFFFFFF, 0x0F0F0F0F12345678):
        got = audio_dhash_bits(audio_wave(target))
        assert got & 0xFFFFFFFFFFFFFFFF == target
    assert audio_dhash_bits(b"") == 0
    assert audio_dhash_bits(b"\x05" * 10) == 0      # shorter than 65
    assert audio_dhash_bits(b"\x07" * 130) == 0     # constant: no rise
    import pytest as _pytest
    with _pytest.raises(ValueError):
        audio_dhash_bits(b"\x00" * 100, n_windows=64)


def test_audio_dhash_uneven_window_exact_integer_compare():
    from datacanary_spark.operators.media_hash import audio_dhash_bits

    # 97 samples -> uneven windows; compare vs a float-mean reference
    rng = np.random.RandomState(3)
    arr = rng.randint(0, 255, 97).astype(np.uint8)
    got = audio_dhash_bits(arr.tobytes())
    bounds = (np.arange(66) * 97) // 65
    means = [arr[bounds[i]:bounds[i + 1]].mean() for i in range(65)]
    want = 0
    for i in range(64):
        if means[i] < means[i + 1]:
            want |= 1 << i
    assert got & 0xFFFFFFFFFFFFFFFF == want


def test_audio_dhash_end_to_end_with_banded_pairs(spark):
    from datacanary_spark.operators.media_hash import (
        audio_dhash,
        phash_near_pairs,
    )

    t = 0x00FF00FF12345678
    rows = [
        (1, encode_fake_media("A", 0, 0, 1, audio_wave(t))),
        (2, encode_fake_media("A", 0, 0, 1, audio_wave(t))),
        (3, encode_fake_media("A", 0, 0, 1, audio_wave(flip(t, 7)))),
        (4, encode_fake_media("A", 0, 0, 1, audio_wave(flip(t, 1, 20, 40)))),
        (5, encode_fake_media("I", HASH_W, HASH_H, 1, grid_image(t))),
        (6, b"junk"),
    ]
    hashes = audio_dhash(_media_df(spark, rows))
    rowmap = {r.media_id: r for r in hashes.collect()}
    assert rowmap[1].ok and rowmap[1].dhash == rowmap[2].dhash
    assert not rowmap[5].ok and not rowmap[6].ok   # image/junk contained
    got = {(r.id_a, r.id_b): r.distance
           for r in phash_near_pairs(hashes, max_distance=1).collect()}
    assert got == {(2, 1): 0, (3, 1): 1, (3, 2): 1}


# ---------------------------------------------------------------------------
# media dedup job (plans/media_dedup.py + CLI dedup-media)
# ---------------------------------------------------------------------------

def _mixed_media_rows():
    t1 = 0x1111111122222222
    t2 = 0xAAAA5555AAAA5555
    img = lambda t: encode_fake_media("I", HASH_W, HASH_H, 1, grid_image(t))

    def img_rgb(t):
        # R=G=B replica: same luma hash as img(t), 3x the payload bytes
        gray = np.frombuffer(grid_image(t), np.uint8)
        return encode_fake_media("I", HASH_W, HASH_H, 1,
                                 np.repeat(gray, 3).tobytes())

    aud = lambda t: encode_fake_media("A", 0, 0, 1, audio_wave(t))
    vid = lambda ts: video_payload(ts)
    return [
        # image cluster {1,2,3}: 2 is byte-identical, 3 within distance
        # 1 and RGB (largest payload)
        (1, "image", img(t1)),
        (2, "image", img(t1)),
        (3, "image", img_rgb(flip(t1, 9))),
        (4, "image", img(t2)),                    # singleton
        # video cluster {10,11}: share 3 of 4 frames; 12 disjoint
        (10, "video", vid([0xA1, 0xA2, 0xA3, 0xA4])),
        (11, "video", vid([0xA2, 0xA3, 0xA4, 0xFFF])),
        (12, "video", vid([0xB1, 0xB2, 0xB3])),
        # audio cluster {20,21}; 22 far away
        (20, "audio", aud(t1)),
        (21, "audio", aud(flip(t1, 2))),
        (22, "audio", aud(t2)),
        # undecodable row: singleton survivor (no hash -> no edges)
        (30, "image", b"not an image"),
    ]


def test_run_media_dedup_job_end_to_end(spark, tmp_path):
    from datacanary_spark.plans.media_dedup import run_media_dedup_job

    src = str(tmp_path / "media")
    spark.createDataFrame(_mixed_media_rows(),
                          "media_id bigint, kind string, payload binary") \
        .write.parquet(src)
    out = str(tmp_path / "deduped")
    s = run_media_dedup_job(spark, src, out, keep="largest")
    assert s["media_in"] == 11
    assert s["image_pairs"] == 3 and s["video_pairs"] == 1
    assert s["audio_pairs"] == 1
    kept = sorted(r.media_id
                  for r in spark.read.parquet(out).select("media_id")
                                .collect())
    # image cluster survivor = 3 (largest payload); video = min id 10
    # (equal sizes -> id tie-break); audio = 20; singletons 4, 12, 22, 30
    assert kept == [3, 4, 10, 12, 20, 22, 30]
    assert s["media_out"] == 7 and s["by_kind_out"]["image"] == 3

    # min-id keep rule flips the image survivor to 1
    s2 = run_media_dedup_job(spark, src, str(tmp_path / "d2"), keep="min-id")
    kept2 = sorted(r.media_id
                   for r in spark.read.parquet(str(tmp_path / "d2"))
                                 .select("media_id").collect())
    assert kept2 == [1, 4, 10, 12, 20, 22, 30]


def test_media_dedup_job_releases_caches(spark, tmp_path):
    from datacanary_spark.plans.media_dedup import run_media_dedup_job

    src = str(tmp_path / "media")
    spark.createDataFrame(_mixed_media_rows(),
                          "media_id bigint, kind string, payload binary") \
        .write.parquet(src)
    baseline = spark.sparkContext._jsc.getPersistentRDDs().size()
    run_media_dedup_job(spark, src, str(tmp_path / "out"))
    # the job's CacheScope released every block it pinned
    assert spark.sparkContext._jsc.getPersistentRDDs().size() == baseline


def test_dedup_media_cli(spark, tmp_path, capsys):
    import json as _json

    from datacanary_spark.cli import main

    src = str(tmp_path / "media")
    spark.createDataFrame(_mixed_media_rows(),
                          "media_id bigint, kind string, payload binary") \
        .write.parquet(src)
    out = str(tmp_path / "out")
    assert main(["dedup-media", "--input", src, "--output", out,
                 "--keep", "largest"]) == 0
    s = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert s["media_in"] == 11 and s["media_out"] == 7
