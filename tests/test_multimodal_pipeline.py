"""End-to-end multimodal curation: tar shards in -> decode -> perceptual
dedup -> curated tar shards out (S12 ∘ L5 ∘ L8b ∘ L1 in one flow) —
the pipeline a crawl-scale image-text corpus actually runs."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from bytesprocessor_spark.functions.imagecodec import encode_png
from bytesprocessor_spark.functions.multimodal import image_near_dup_pairs
from bytesprocessor_spark.sources.webdataset import (
    read_tar_shards,
    write_tar_shards,
)


def _corpus_rows(n=12, seed=7):
    """n distinct image-text samples, plus one near-dup (2 pixels
    perturbed) and one exact re-encode of sample 0."""
    rng = np.random.RandomState(seed)
    rows = []
    base = {}
    for i in range(n):
        key = f"{i:06d}"
        px = rng.randint(0, 256, (32, 32, 3)).astype(np.uint8)
        base[i] = px
        rows.append((key, "txt", f"caption {i}".encode()))
        rows.append((key, "png", encode_png(px)))
    near = base[0].copy()
    near[0, 0] = (near[0, 0] + 3) % 256
    near[5, 5] = (near[5, 5] + 2) % 256
    rows.append(("900000", "txt", b"near dup of 0"))
    rows.append(("900000", "png", encode_png(near)))
    rows.append(("900001", "txt", b"exact re-encode of 0"))
    rows.append(("900001", "png", encode_png(base[0])))
    return rows


def test_multimodal_curation_end_to_end(spark, tmp_path):
    rows = _corpus_rows()
    df = spark.createDataFrame(rows, "key string, ext string, payload binary")
    land = str(tmp_path / "landing")
    write_tar_shards(df, land, n_shards=3).collect()

    members = read_tar_shards(spark, land)
    images = members.where(F.col("ext") == "png").select(
        F.col("key").alias("media_id"), "payload"
    )
    pairs = image_near_dup_pairs(images, max_hamming=6).collect()
    dup_pairs = {(r["id_a"], r["id_b"]) for r in pairs}
    # both planted duplicates of sample 000000 are found...
    assert ("000000", "900000") in dup_pairs
    assert ("000000", "900001") in dup_pairs
    # ...and no distinct-image pair collides at this radius
    planted = {"000000", "900000", "900001"}
    assert all({a, b} <= planted for a, b in dup_pairs)

    # keep-lowest-id survivors -> curated corpus drops the two dups
    drop = {b for _, b in dup_pairs}
    curated = members.where(~F.col("key").isin(*drop))
    out = str(tmp_path / "curated")
    manifest = write_tar_shards(curated, out, n_shards=2).collect()
    assert sum(r["n_members"] for r in manifest) == 2 * 12  # 12 samples x 2

    back = read_tar_shards(spark, out)
    keys = {r["key"] for r in back.select("key").distinct().collect()}
    assert len(keys) == 12 and "900000" not in keys and "900001" not in keys
