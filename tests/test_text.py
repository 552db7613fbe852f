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


def test_tfidf_rare_term_ranks_first(spark, tmp_path):
    """A term unique to one document must out-score that document's
    corpus-wide common terms (tf equal => idf decides), and every doc
    gets at most 3 ranked terms with contiguous ranks."""
    from bytesprocessor_spark.queries import QUERIES

    text_tfidf_topterms = QUERIES["text_tfidf_topterms"]
    common = "alpha beta gamma delta"
    rows = [(i, f"{common} filler{i % 2}") for i in range(10)]
    rows.append((99, f"{common} zyzzyva"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = text_tfidf_topterms(spark, str(tmp_path)).collect()
    by_doc: dict[int, list] = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    top99 = min(by_doc[99], key=lambda r: r.rk)
    assert top99.tok == "zyzzyva"
    for doc, rs in by_doc.items():
        assert sorted(r.rk for r in rs) == list(range(1, len(rs) + 1))
        assert len(rs) <= 3


def test_unigram_surprisal_orders_rare_above_common(spark, tmp_path):
    """A document of corpus-rare tokens must land in a higher-surprisal
    bucket than a document repeating the corpus's dominant token, and
    terciles must partition all docs."""
    from bytesprocessor_spark.queries import QUERIES

    text_unigram_surprisal = QUERIES["text_unigram_surprisal"]
    rows = [(i, "common " * 20) for i in range(8)]
    rows.append((100, "uncommon weird outlier vocabulary thing"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = {r.doc_id: r for r in text_unigram_surprisal(spark, str(tmp_path)).collect()}
    assert len(out) == 9
    assert out[100].mean_surprisal > out[0].mean_surprisal
    assert out[100].bucket == 3  # rarest doc in the tail tercile
    assert {r.bucket for r in out.values()} <= {1, 2, 3}
