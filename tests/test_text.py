"""Text-analysis function tests (L4) — the winnowing guarantee."""

from __future__ import annotations

from pyspark.sql import functions as F

from bytesprocessor_spark.functions.text import winnow_fingerprints


def test_winnow_shared_substring_guarantee(spark):
    """Winnowing's core property (Schleimer et al. '03): documents
    sharing a substring of length >= k + w - 1 (= 11 here) share at
    least one selected fingerprint; unrelated text shares none."""
    k, w = 8, 4
    common = "the quick brown fox jumps"
    rows = [
        (1, f"alpha beta {common} gamma delta"),
        (2, f"one two three {common} four"),
        (3, "completely unrelated content with zero overlap at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    out = {
        r.doc_id: set(r.fps)
        for r in df.select(
            "doc_id", winnow_fingerprints(F.col("text"), k=k, w=w).alias("fps")
        ).collect()
    }
    assert out[1] & out[2], "shared 25-char substring must share a fingerprint"
    assert not (out[1] & out[3])
    assert not (out[2] & out[3])


def test_winnow_short_doc_single_window(spark):
    df = spark.createDataFrame([(1, "tiny")], "doc_id int, text string")
    fps = df.select(winnow_fingerprints(F.col("text")).alias("f")).collect()[0].f
    assert len(fps) == 1  # one clamped gram, one window
