"""Distributed BPE merge learning (Sennrich et al., arXiv:1508.07909)
— train byte-pair-encoding merges on the corpus with Spark.

The classic algorithm iterates: count adjacent symbol pairs over the
word-frequency table, merge the most frequent pair everywhere, repeat.
Here every step is a DataFrame op:

  * the word-frequency table is one token explode + hash agg — at
    100 TB it collapses to vocabulary size, the thing BPE iterates on;
  * pair counting is a map-only split + explode with map-side partial
    aggregation (pairs per word ~ word length);
  * the winning pair is a 1-row TakeOrdered, which then broadcasts
    back onto the word table for the merge — the driver never collects
    anything, so the loop is pure lineage.

Symbol-sequence representation: a word's symbols are kept as a single
string with TWO-space separators and two-space padding at both ends
(``"  l  o  w  "``).  Merging pair (a, b) is then one literal
``replace(s, " a  b ", " ab ")``: the single-space-padded pattern
consumes one space from each double boundary and the replacement puts
it back, so back-to-back occurrences ("a b a b") all merge in one
left-to-right pass while same-symbol runs ("a a a") merge only
leftmost-non-overlapping — exactly BPE's semantics, and literal
``replace`` behaves identically in Spark (UTF8String.replace) and
DuckDB.  Tokens never contain spaces (the tokenizer splits on
non-alphanumerics), so the representation is unambiguous.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from bytesprocessor_spark.functions.text import tokenize


def _sym_string(word: Column) -> Column:
    """Initial symbol string: characters joined by double spaces with
    double-space padding ("low" -> "  l  o  w  ")."""
    chars = F.transform(
        F.sequence(F.lit(1), F.length(word)), lambda i: F.substring(word, i, 1)
    )
    return F.concat(F.lit("  "), F.array_join(chars, "  "), F.lit("  "))


def bpe_word_table(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, n, s): corpus word frequencies with initial symbol
    strings.  One explode + one hash agg; the result is
    vocabulary-sized regardless of corpus size."""
    words = docs.select(F.explode(tokenize(F.col(text_col))).alias("word"))
    wc = words.groupBy("word").agg(F.count("*").alias("n"))
    return wc.select("word", "n", _sym_string(F.col("word")).alias("s"))


def _symbols(s: Column) -> Column:
    return F.filter(F.split(s, "  "), lambda x: F.length(x) > 0)


def bpe_top_pair(words: DataFrame) -> DataFrame:
    """The most frequent adjacent symbol pair, weighted by word
    frequency; ties break on (a, b) so the winner is deterministic.
    Returns a 1-row DataFrame (a, b, cnt)."""
    l = _symbols(F.col("s"))
    pairs = words.select(
        F.col("n"),
        F.explode(
            F.when(
                F.size(l) > 1,
                F.transform(
                    F.sequence(F.lit(1), F.size(l) - 1),
                    lambda j: F.struct(
                        F.element_at(l, j).alias("a"),
                        F.element_at(l, j + 1).alias("b"),
                    ),
                ),
            ).otherwise(F.array().cast("array<struct<a:string,b:string>>"))
        ).alias("p"),
    )
    agg = pairs.groupBy("p.a", "p.b").agg(F.sum("n").alias("cnt"))
    return agg.orderBy(F.col("cnt").desc(), "a", "b").limit(1)


def bpe_apply_merge(words: DataFrame, top: DataFrame) -> DataFrame:
    """Merge the winning pair in every word: one broadcast of the
    <=1-row pair + one literal replace (map-only).  A LEFT join on
    TRUE (not a crossJoin) so an EMPTY winner — merges exhausted
    before n_merges — passes every word through unmerged instead of
    annihilating the table."""
    merged = words.join(F.broadcast(top), F.lit(True), "left").select(
        "word",
        "n",
        F.when(F.col("a").isNull(), F.col("s"))
        .otherwise(
            F.replace(
                F.col("s"),
                F.concat(F.lit(" "), F.col("a"), F.lit("  "), F.col("b"), F.lit(" ")),
                F.concat(F.lit(" "), F.col("a"), F.col("b"), F.lit(" ")),
            )
        )
        .alias("s"),
    )
    return merged


def _bpe_loop(docs: DataFrame, n_merges: int, text_col: str):
    """Run the merge loop; returns ([per-iteration winner DFs], final
    word table).  Each generation is consumed TWICE (the pair count
    and the merge), and each top pair twice (the output and the merge)
    — without lineage cuts the DAG doubles per iteration (2^n_merges
    corpus scans).  localCheckpoint (the graph.py connected-components
    pattern) truncates each generation to its materialized blocks,
    keeping both the execution AND the Catalyst planning cost linear
    in the merge count (measured 1.8x faster than persist alone, whose
    logical plans still nest).  Cost: recomputation-on-executor-loss
    is traded away, same as graph.py."""
    words = bpe_word_table(docs, text_col).localCheckpoint()
    outs = []
    for it in range(1, n_merges + 1):
        top = bpe_top_pair(words).localCheckpoint()
        outs.append(top.select(F.lit(it).alias("iter"), "a", "b", "cnt"))
        words = bpe_apply_merge(words, top).localCheckpoint()
    return outs, words


def learn_bpe_merges(docs: DataFrame, n_merges: int, text_col: str = "text") -> DataFrame:
    """The learned merge table: (iter, a, b, cnt) for ``n_merges``
    iterations, ordered by iteration.  DataFrame-only loop — lineage
    stays linear in the merge count (see _bpe_loop); checkpoint
    spacing is per-generation, fine for tens of merges and tunable for
    thousand-merge vocab runs."""
    if n_merges < 1:
        spark = docs.sparkSession
        return spark.createDataFrame([], "iter int, a string, b string, cnt bigint")
    outs, _ = _bpe_loop(docs, n_merges, text_col)
    out = outs[0]
    for o in outs[1:]:
        out = out.unionAll(o)
    return out.orderBy("iter")


def bpe_encode_words(docs: DataFrame, n_merges: int, text_col: str = "text") -> DataFrame:
    """(word, n, n_bpe): the corpus vocabulary with each word's
    BPE-token count after ``n_merges`` learned merges — encoding
    happens on the vocabulary once, never per occurrence; consumers
    join this table onto their token streams."""
    _, words = _bpe_loop(docs, n_merges, text_col)
    return words.select(
        "word",
        "n",
        F.size(_symbols(F.col("s"))).alias("n_bpe"),
    )
