"""End-to-end text curation: tar shards in -> quality gate -> exact +
near dedup -> token-budget packing -> curated tar shards out
(S12 ∘ L4 ∘ L1/L2 ∘ L6 in one flow) — the text half of the crawl
pipeline, mirroring tests/test_multimodal_pipeline.py."""

from __future__ import annotations

from pyspark.sql import functions as F

from bytesprocessor_spark.functions.text import quality_score, token_count
from bytesprocessor_spark.operators.dedup import exact_dedup
from bytesprocessor_spark.operators.packing import pack_sequences
from bytesprocessor_spark.sources.webdataset import (
    read_tar_shards,
    write_tar_shards,
)


def _corpus_rows(n=30):
    rows = []
    for i in range(n):
        key = f"{i:06d}"
        text = f"sample document number {i} with enough words to pass the gate " * 3
        rows.append((key, "txt", text.encode()))
    # exact duplicate of doc 6 (whitespace-normalized match)
    rows.append(("900000", "txt", rows[6][2] + b"  "))
    # junk that the quality gate must drop (no alpha, 2 tokens)
    rows.append(("900001", "txt", b"!!! ???"))
    return rows


def test_text_curation_end_to_end(spark, tmp_path):
    rows = _corpus_rows()
    df = spark.createDataFrame(rows, "key string, ext string, payload binary")
    land = str(tmp_path / "landing")
    write_tar_shards(df, land, n_shards=3).collect()

    docs = (
        read_tar_shards(spark, land)
        .where(F.col("ext") == "txt")
        .select(
            F.col("key").alias("doc_id"),
            F.decode("payload", "UTF-8").alias("text"),
        )
    )
    gated = docs.where(
        (token_count(F.col("text")) >= 10) & (quality_score(F.col("text")) > 0.0)
    )
    assert gated.where(F.col("doc_id") == "900001").count() == 0

    kept = exact_dedup(gated, text_col="text", id_col="doc_id")
    keys = {r["doc_id"] for r in kept.select("doc_id").collect()}
    assert len(keys) == 30
    # normalized-exact dup resolves to exactly ONE of the pair
    assert ("000006" in keys) ^ ("900000" in keys)

    packed = pack_sequences(
        kept.select("doc_id", token_count(F.col("text")).alias("n_tokens")),
        "n_tokens",
        id_col="doc_id",
        budget=100,
    )
    assert packed.count() == 30
    # contiguous-fill rule: every doc's sequence is its prefix // budget
    bad = packed.where(
        F.col("seq_id") != F.floor(F.col("seq_tokens_before") / 100)
    ).count()
    assert bad == 0

    curated = df.join(
        kept.select(F.col("doc_id").alias("key")), "key", "left_semi"
    )
    out = str(tmp_path / "curated")
    manifest = write_tar_shards(curated, out, n_shards=2).collect()
    assert sum(r["n_members"] for r in manifest) == 30
    back_keys = {r["key"] for r in read_tar_shards(spark, out).collect()}
    assert back_keys == keys
