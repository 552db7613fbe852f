"""Invariant tests for the round-5 training-pipeline operators
(queries_training.py) — semantic-shape properties; exact values are
pinned by the DuckDB oracle rows."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from bytesprocessor_spark.queries import QUERIES
from bytesprocessor_spark.sources.tables import load_table
from tests.conftest import SF_DIR


def test_hard_negatives_labels_differ_and_ranks_dense(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    qlabels = {r.vec_id: r.label for r in emb.where(F.col("vec_id") < 10).collect()}
    rows = QUERIES["similarity_hard_negatives"](spark, SF_DIR).collect()
    per_q: dict = {}
    for r in rows:
        assert r.neg_label != qlabels[r.query_id]  # negative by definition
        per_q.setdefault(r.query_id, []).append(r)
    for q, rs in per_q.items():
        assert [r.rank for r in rs] == list(range(1, len(rs) + 1))
        dots = [r.dot_q for r in rs]
        assert dots == sorted(dots, reverse=True)  # monotone by rank


def test_embedding_outliers_flags_top_five_percent_per_label(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    n_per_label = {
        r.label: r.n for r in emb.groupBy("label").agg(F.count("*").alias("n")).collect()
    }
    rows = QUERIES["embedding_outliers"](spark, SF_DIR).collect()
    got: dict = {}
    for r in rows:
        got[r.label] = got.get(r.label, 0) + 1
        assert r.dist_q >= 0
    for label, n in n_per_label.items():
        assert got.get(label, 0) == math.ceil(n / 20)


def test_incremental_minhash_pairs_cross_set_only(spark):
    rows = QUERIES["dedup_minhash_incremental"](spark, SF_DIR).collect()
    for r in rows:
        assert r.corpus_id % 2 == 0 and r.delta_id % 2 == 1
        assert r.jaccard >= 0.9


def test_incremental_minhash_planted_duplicate_found(spark):
    """A delta doc that copies a corpus doc verbatim must be admitted
    as a duplicate with jaccard 1.0."""
    from bytesprocessor_spark.operators.dedup import incremental_minhash_dedup

    corpus = spark.createDataFrame(
        [(0, "the quick brown fox jumps over the lazy dog again and again"),
         (2, "completely unrelated corpus text about spark physical plans")],
        "doc_id long, text string",
    )
    delta = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog again and again"),
         (3, "novel delta content that matches nothing in the corpus")],
        "doc_id long, text string",
    )
    rows = incremental_minhash_dedup(corpus, delta, threshold=0.9).collect()
    assert [(r.corpus_id, r.delta_id, r.jaccard) for r in rows] == [(0, 1, 1.0)]


def test_shard_manifest_partitions_whole_corpus(spark):
    docs = load_table(spark, SF_DIR, "documents")
    total = docs.count()
    rows = QUERIES["corpus_shard_manifest"](spark, SF_DIR).collect()
    assert sum(r.n_docs for r in rows) == total
    assert len(rows) <= 16
    for r in rows:
        # balanced hash layout: every shard within 3x of ideal on the
        # fixture (the audit column exists to catch pathological keys)
        assert 0 < r.load_ppm < 3_000_000


def test_persisted_neardup_index_matches_inflow_and_skips_corpus_text(spark, tmp_path):
    """Admission against the persisted index must (a) return exactly
    the in-flow incremental result and (b) never read the corpus
    source — the plan's only file scans are the index tables and the
    delta side."""
    from bytesprocessor_spark.operators.dedup import (
        incremental_minhash_dedup,
        neardup_admit_against_index,
        write_neardup_index,
    )

    corpus_rows = [
        (0, "the quick brown fox jumps over the lazy dog again and again"),
        (2, "completely unrelated corpus text about spark physical plans"),
        (4, "a third corpus document with its own distinct wording here"),
    ]
    corpus_path = str(tmp_path / "corpus")
    spark.createDataFrame(corpus_rows, "doc_id long, text string").write.parquet(
        corpus_path
    )
    corpus = spark.read.parquet(corpus_path)
    delta = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog again and again"),
         (3, "novel delta content that matches nothing in the corpus")],
        "doc_id long, text string",
    )
    idx = str(tmp_path / "ndidx")
    write_neardup_index(corpus, idx)

    inflow = sorted(
        (r.corpus_id, r.delta_id, r.jaccard)
        for r in incremental_minhash_dedup(corpus, delta, threshold=0.9).collect()
    )
    admitted_df = neardup_admit_against_index(spark, idx, delta, threshold=0.9)
    admitted = sorted(
        (r.corpus_id, r.delta_id, r.jaccard) for r in admitted_df.collect()
    )
    assert admitted == inflow == [(0, 1, 1.0)]

    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        admitted_df.explain("formatted")
    plan = buf.getvalue()
    assert "ndidx" in plan            # index tables are scanned
    assert "/corpus" not in plan      # corpus source never re-read


def test_weighted_sample_favors_heavy_docs(spark):
    """A w-weighted sample must over-represent heavy documents: the
    sampled docs' mean weight exceeds the corpus mean (statistical
    certainty at fixture scale), and priorities are valid (<= 0,
    monotone by rank)."""
    docs = load_table(spark, SF_DIR, "documents")
    mean_w = docs.agg(F.avg("n_chars")).collect()[0][0]
    rows = QUERIES["corpus_weighted_sample"](spark, SF_DIR).collect()
    assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
    pri = [r.priority_nano for r in rows]
    assert pri == sorted(pri, reverse=True)
    assert all(p <= 0 for p in pri)  # ln(u)/w with u in (0,1]
    sample_mean = sum(r.n_chars for r in rows) / len(rows)
    assert sample_mean > mean_w


def test_corpus_fingerprint_flips_on_any_row_change(spark):
    """Version-pin sensitivity: removing a row or editing one char
    changes the fingerprint; recomputation is order-independent."""
    from bytesprocessor_spark.queries_curation import _h60

    docs = load_table(spark, SF_DIR, "documents")
    row_ser = F.concat_ws(
        "|",
        F.col("doc_id").cast("string"),
        F.col("lang"),
        F.col("source"),
        F.col("n_chars").cast("string"),
        F.col("text"),
    )

    def fp(df):
        r = df.select(_h60(row_ser).alias("h")).agg(
            F.count(F.lit(1)).alias("n"), F.expr("bit_xor(h)").alias("f")
        ).collect()[0]
        return (r.n, r.f)

    base = fp(docs)
    assert base == fp(docs.repartition(7))          # order/partitioning independent
    assert base != fp(docs.where(F.col("doc_id") != 3))  # row removal flips
    edited = docs.withColumn(
        "text", F.when(F.col("doc_id") == 3, F.concat(F.col("text"), F.lit("x"))).otherwise(F.col("text"))
    )
    assert base != fp(edited)                        # one-char edit flips
