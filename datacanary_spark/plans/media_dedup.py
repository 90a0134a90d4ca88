"""Media dedup job: perceptual near-dup over a multimodal table.

Composes the per-modality perceptual operators
(operators/media_hash.py) into the job a multimodal corpus actually
runs: route rows by declared kind, hash each modality, find near-dup
pairs, cluster them transitively (operators/graph.py connected
components — the same machinery as text near-dup), and keep one
survivor per cluster.

Scale shape: each modality's hash pass is one mapInPandas over only
its rows (the kind filter pipelines into the scan); pair generation is
the banded/posting-capped joins documented in media_hash.py; the
survivor pick is the skew-safe ``min(struct(-rank, id))`` aggregate
from cluster_survivors — never a per-cluster window. Payload bytes are
NOT shuffled by any pair/cluster stage (hashes and ids only); the only
payload-bearing stages are the initial scan and the final
survivor-filtered write.

Survivor rank: ``keep="largest"`` ranks by payload byte count (the
highest-resolution copy of an image/video usually has the most bytes);
``keep="min-id"`` is the deterministic id rule used by the text exact
dedup. Edge-free rows are singleton clusters and always survive.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datacanary_spark.operators.media_hash import (
    audio_dhash,
    dhash_media,
    phash_near_pairs,
    video_near_dup_pairs,
    video_phash_frames,
)

__all__ = ["media_near_dup_pairs_by_kind", "run_media_dedup_job"]


def media_near_dup_pairs_by_kind(
    media: DataFrame,
    image_distance: int = 2,
    audio_distance: int = 2,
    video_min_shared: int = 3,
    frame_stride: int = 1,
    max_frames: int | None = None,
    bands: int = 4,
    max_bucket: int = 10_000,
    codec=None,
) -> dict[str, DataFrame]:
    """Per-modality near-dup pair frames ``{kind: (id_a, id_b)}`` over
    a ``(media_id, kind, payload)`` table. Rows route by the DECLARED
    kind column (no wasted decodes); each modality's decode still
    verifies the container kind and contains errors per row."""
    pairs: dict[str, DataFrame] = {}
    img = media.where(F.col("kind") == "image")
    pairs["image"] = phash_near_pairs(
        dhash_media(img, codec=codec), max_distance=image_distance,
        bands=bands, max_bucket=max_bucket).select("id_a", "id_b")
    aud = media.where(F.col("kind") == "audio")
    pairs["audio"] = phash_near_pairs(
        audio_dhash(aud, codec=codec), max_distance=audio_distance,
        bands=bands, max_bucket=max_bucket).select("id_a", "id_b")
    vid = media.where(F.col("kind") == "video")
    frames = video_phash_frames(vid, codec=codec,
                                sample_every=frame_stride,
                                max_frames=max_frames)
    pairs["video"] = video_near_dup_pairs(
        frames, min_shared=video_min_shared,
        max_posting=max_bucket).select("id_a", "id_b")
    return pairs


def run_media_dedup_job(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    keep: str = "largest",
    image_distance: int = 2,
    audio_distance: int = 2,
    video_min_shared: int = 3,
    frame_stride: int = 1,
    max_frames: int | None = None,
    bands: int = 4,
    max_bucket: int = 10_000,
    codec=None,
) -> dict:
    """Read a media table, drop perceptual near-dups per modality,
    write survivors, return a lineage summary."""
    from datacanary_spark.operators.graph import cluster_survivors
    from datacanary_spark.plans.caching import CacheScope
    from datacanary_spark.sources.io import read_table

    if keep not in ("largest", "min-id"):
        raise ValueError(f"keep must be 'largest' or 'min-id', got {keep!r}")
    t0 = time.time()
    media = read_table(spark, input_path)
    summary: dict = {}
    with CacheScope() as scope:
        media = scope.persist(media)
        summary["media_in"] = media.count()
        summary["by_kind_in"] = {
            r["kind"]: r["n"]
            for r in media.groupBy("kind").agg(
                F.count(F.lit(1)).alias("n")).collect()}
        per_kind = media_near_dup_pairs_by_kind(
            media, image_distance=image_distance,
            audio_distance=audio_distance,
            video_min_shared=video_min_shared,
            frame_stride=frame_stride, max_frames=max_frames,
            bands=bands, max_bucket=max_bucket, codec=codec)
        # ids are table-global, modalities are disjoint row sets -> the
        # union is a valid edge list for one clustering pass
        all_pairs = None
        for kind, p in per_kind.items():
            p = scope.persist(p)
            summary[f"{kind}_pairs"] = p.count()
            all_pairs = p if all_pairs is None else all_pairs.unionByName(p)
        rank = (F.octet_length("payload").cast("double")
                if keep == "largest" else F.lit(0.0))
        marked = cluster_survivors(media, all_pairs, rank,
                                   id_col="media_id", persist=scope)
        survivors = marked.where(F.col("is_survivor")) \
                          .drop("component", "is_survivor")
        survivors.write.mode("overwrite").parquet(output_path)
    out = spark.read.parquet(output_path)
    summary["media_out"] = out.count()
    summary["by_kind_out"] = {
        r["kind"]: r["n"]
        for r in out.groupBy("kind").agg(
            F.count(F.lit(1)).alias("n")).collect()}
    summary["wall_sec"] = round(time.time() - t0, 3)
    return summary
