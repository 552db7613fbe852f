"""Sequence packing (SURVEY §2.11 L6): group documents into
fixed-token-budget training sequences.

LLM pretraining consumes fixed-length sequences; the packing step
assigns documents to sequences so each sequence's token total fills
(and minimally overflows) the budget.  True bin packing is NP-hard and
inherently sequential; the form that scales — and the one production
pipelines use — is *greedy contiguous fill*: lay the documents out in
a deterministic order and cut a new sequence every time the running
token total crosses the budget.  That is a prefix sum, i.e. a window
cumsum, fully expressible in Catalyst and checkable in ANSI SQL.

Scale shape: one shuffle keyed on (stratum, shard).  The shard key —
derived from the content hash, so the layout is reproducible across
engines/runs/cluster layouts — bounds each window partition: packing
100 TB never funnels through a single global sort, and adding shards
is how parallelism is raised (each shard packs independently; the
budget overflow per sequence stays < max single-doc tokens).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(
    docs: DataFrame,
    token_col: Column | str,
    id_col: str,
    budget: int,
    stratum: str | None = None,
    n_shards: int = 4,
) -> DataFrame:
    """Assign each document a ``(shard, seq_id)`` so that consecutive
    documents (in content-hash order) share a sequence until the token
    budget is crossed.  Documents longer than the budget get a
    sequence of their own.  Returns the input plus ``shard``,
    ``seq_id`` and ``seq_tokens_before`` (the exclusive prefix sum —
    the document's offset inside its sequence's token stream).
    """
    toks = F.col(token_col) if isinstance(token_col, str) else token_col
    # a null count packs as 0 explicitly (sum() would skip it anyway,
    # but the contract should not hinge on aggregate null semantics)
    toks = F.coalesce(toks, F.lit(0))
    # Reproducible shard: first 4 hex digits of md5(id) mod n_shards
    # (content-derived, so identical in any engine — unlike pmod(hash)).
    shard = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 4), 16, 10)
        .cast("long") % n_shards
    )
    parts = ([stratum] if stratum else []) + ["shard"]
    order = [F.md5(F.col(id_col).cast("string")), F.col(id_col)]
    w = (
        Window.partitionBy(*parts)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    out = docs.withColumn("shard", shard).withColumn(
        "seq_tokens_before", F.coalesce(F.sum(toks).over(w), F.lit(0)).cast("long")
    )
    return out.withColumn(
        "seq_id", (F.col("seq_tokens_before") / F.lit(budget)).cast("long")
    )


def length_batches(
    df: DataFrame,
    length_col: str,
    batch_size: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Length-bucketed inference batching: assign rows to fixed-size
    batches of length-adjacent documents so per-batch padding (every
    sequence pads to its batch max) is minimal — the standard dynamic-
    batching layout for LLM inference/scoring over a corpus.

    Global rank WITHOUT a single-partition window (the naive
    ``Window.orderBy`` funnels the whole corpus into one task): rows
    are range-repartitioned and sorted on (length, id), each partition
    computes a LOCAL row_number, and the global offset comes from the
    per-partition counts — a #partitions-sized table that broadcasts.
    This is the distributed-rank pattern; every task sees only its
    range slice.  Returns per-batch stats:
    (batch_id, n_rows, max_len, padded_tokens, padding_waste) where
    padding_waste = padded - actual tokens; compare against
    batch_size * corpus_max for the unsorted worst case.
    """
    base = (
        df.select(F.col(id_col), F.col(length_col).cast("long").alias("__len"))
        .repartitionByRange(F.col("__len"), F.col(id_col))
        .sortWithinPartitions("__len", id_col)
        .withColumn("__pid", F.spark_partition_id())
    )
    from bytesprocessor_spark.operators.caching import persist_intermediate

    base = persist_intermediate(base)  # counts pass + rank pass share the sorted layout
    offsets = (
        base.groupBy("__pid")
        .agg(F.count("*").alias("__n"))
        # #partitions-row table: coalesce(1) + a materialized
        # spark_partition_id() partition column declares the bounded
        # single group without an Exchange SinglePartition or the
        # empty-spec WindowExec warning (lit(0) would be folded away)
        .coalesce(1)
        .withColumn("__opid", F.spark_partition_id())
        .withColumn(
            "__offset",
            F.coalesce(
                F.sum("__n").over(
                    Window.partitionBy("__opid")
                    .orderBy("__pid")
                    .rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .select("__pid", "__offset")
    )
    local_w = Window.partitionBy("__pid").orderBy(F.col("__len").asc(), F.col(id_col).asc())
    batched = (
        base.withColumn("__lrn", F.row_number().over(local_w))
        .join(F.broadcast(offsets), "__pid")
        .withColumn(
            "batch_id",
            ((F.col("__offset") + F.col("__lrn") - 1) / F.lit(batch_size)).cast("long"),
        )
    )
    return (
        batched.groupBy("batch_id")
        .agg(
            F.count("*").alias("n_rows"),
            F.max("__len").alias("max_len"),
            (F.count("*") * F.max("__len")).alias("padded_tokens"),
            (F.count("*") * F.max("__len") - F.sum("__len")).alias("padding_waste"),
        )
    )
