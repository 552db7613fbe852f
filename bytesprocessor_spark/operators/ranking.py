"""Distributed global rank / NTILE — the device that replaces
``Window.orderBy(...)`` with no ``partitionBy`` (which funnels the
ENTIRE input through one task: Spark plans it as
``Exchange SinglePartition`` + ``Window``, the one-machine bottleneck
that correctness tests at sf0.1 never feel and a 100 TB run dies on).

The pattern (lifted from the length-batching operator that pioneered
it here — :mod:`bytesprocessor_spark.operators.packing`):

1. ``repartitionByRange`` on the order expressions — each task owns a
   contiguous slice of the global order (sampled range boundaries;
   boundary placement does not affect rank values because the order
   is made TOTAL by a unique tiebreak column).
2. ``sortWithinPartitions`` + a LOCAL ``row_number`` per range slice
   (``Window.partitionBy(spark_partition_id())`` — every task sorts
   only its slice).
3. The global offset of each slice comes from the per-partition
   counts — a #partitions-sized table that broadcasts.  rank =
   offset + local row_number.

NTILE is then pure arithmetic on (rank, total): with ``q = total div
n`` and ``rem = total % n``, SQL NTILE gives the first ``rem`` buckets
``q + 1`` rows and the rest ``q`` — bit-identical to the engines'
``NTILE`` over the same total order, but with no single-partition
exchange anywhere in the plan.  :func:`distributed_cumsum` is the
prefix-sum sibling (per-slice local cumsum + broadcast value
offsets), and :func:`bounded_single_group` is the companion for
frames that genuinely ARE k-row (calendar/day tables, score-domain
aggregates, LIMIT outputs): it declares the single group explicitly
so the plan carries neither the ``Exchange SinglePartition`` node nor
the WindowExec warning.

Determinism: callers must pass a TOTAL order (include a unique
tiebreak key in ``order_cols``); ranks are then independent of range
boundary sampling and partition count.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from bytesprocessor_spark.operators.caching import persist_intermediate

__all__ = [
    "bounded_single_group",
    "distributed_cumsum",
    "distributed_ntile",
    "distributed_rank",
]


def bounded_single_group(df: DataFrame, col_name: str = "__opid") -> DataFrame:
    """Declare a BOUNDED (k-row aggregate / limit output) frame as one
    explicit window group: coalesce(1) (no shuffle) plus a
    materialized ``spark_partition_id()`` column (constant 0 after the
    coalesce) to use as ``Window.partitionBy(col_name)``.

    This is how bounded global windows (cumulative sums over a k-row
    aggregate, ranks over a LIMIT output) avoid BOTH the
    ``Exchange SinglePartition`` plan node and the "Moving all data to
    a single partition" WindowExec warning, while keeping exactly the
    single-group semantics they want.  A ``lit(0)`` partition spec
    does NOT do this — FoldablePropagation erases it back to the empty
    spec.  Never use on an unbounded input: that would silently
    recreate the one-task funnel this module exists to kill.
    """
    return df.coalesce(1).withColumn(col_name, F.spark_partition_id())


def distributed_rank(
    df: DataFrame,
    order_cols: list[Column],
    rank_col: str = "rank",
    total_col: str | None = None,
) -> DataFrame:
    """Append a 1-based global ``row_number`` over ``order_cols``
    (which may carry ``.desc()``) without a single-partition window.

    Returns ``df``'s columns plus ``rank_col`` (long) and, when
    ``total_col`` is given, the total row count (long) on every row —
    the (i, n) pair order-statistics estimators need.

    Plan: one range exchange (parallel), one #partitions-row offset
    table broadcast back, one hash exchange on the partition id for
    the local window (same parallelism, balanced by construction).
    """
    base = (
        df.repartitionByRange(*order_cols)
        .sortWithinPartitions(*order_cols)
        .withColumn("__pid", F.spark_partition_id())
    )
    base = persist_intermediate(base)  # counts pass + rank pass share the layout
    # The offsets windows run over a #partitions-row table, so a
    # single group is the CORRECT bounded shape — but a bare
    # Window.orderBy would still plan Exchange SinglePartition and log
    # the scary warning.  coalesce(1) (no shuffle) + partitioning on a
    # materialized spark_partition_id() column (non-foldable, constant
    # 0 after the coalesce) declares the bounded single group without
    # either.  (A lit(0) spec does NOT work: FoldablePropagation
    # erases it back to the empty spec.)
    counts = (
        base.groupBy("__pid")
        .agg(F.count("*").alias("__n"))
        .coalesce(1)
        .withColumn("__opid", F.spark_partition_id())
    )
    w_off = Window.partitionBy("__opid").orderBy("__pid")
    offsets = counts.select(
        "__pid",
        F.coalesce(
            F.sum("__n").over(w_off.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        ).alias("__offset"),
        F.sum("__n")
        .over(w_off.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
        .cast("long")
        .alias("__total"),
    )
    local_w = Window.partitionBy("__pid").orderBy(*order_cols)
    out = (
        base.withColumn("__lrn", F.row_number().over(local_w))
        .join(F.broadcast(offsets), "__pid")
        .withColumn(rank_col, (F.col("__offset") + F.col("__lrn")).cast("long"))
    )
    if total_col is not None:
        out = out.withColumn(total_col, F.col("__total"))
    return out.drop("__pid", "__lrn", "__offset", "__total")


def distributed_cumsum(
    df: DataFrame,
    order_cols: list[Column],
    value_col: str,
    cum_col: str = "cum",
) -> DataFrame:
    """Append the running SUM of ``value_col`` over the global total
    order ``order_cols`` (frame ``ROWS UNBOUNDED PRECEDING``) without
    a single-partition window — the prefix-sum sibling of
    :func:`distributed_rank`: each range slice computes a LOCAL
    cumulative sum and the per-slice value totals broadcast back as
    offsets.
    """
    base = (
        df.repartitionByRange(*order_cols)
        .sortWithinPartitions(*order_cols)
        .withColumn("__pid", F.spark_partition_id())
    )
    base = persist_intermediate(base)
    counts = (
        base.groupBy("__pid")
        .agg(F.sum(value_col).alias("__v"))
        .coalesce(1)
        .withColumn("__opid", F.spark_partition_id())
    )
    w_off = Window.partitionBy("__opid").orderBy("__pid")
    offsets = counts.select(
        "__pid",
        F.coalesce(
            F.sum("__v").over(w_off.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        ).alias("__voff"),
    )
    local_w = (
        Window.partitionBy("__pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        base.withColumn("__lcum", F.sum(value_col).over(local_w))
        .join(F.broadcast(offsets), "__pid")
        .withColumn(cum_col, F.col("__voff") + F.col("__lcum"))
        .drop("__pid", "__lcum", "__voff")
    )


def distributed_ntile(
    df: DataFrame,
    order_cols: list[Column],
    n: int,
    tile_col: str = "tile",
) -> DataFrame:
    """Append SQL-``NTILE(n)`` bucket ids (int, 1-based) over the
    total order ``order_cols`` — bit-identical bucket assignment to
    ``NTILE`` (first ``total % n`` buckets take the extra row), with
    the distributed-rank plan instead of a single-partition window.
    """
    ranked = distributed_rank(df, order_cols, rank_col="__grank", total_col="__gtot")
    # exact int64 arithmetic throughout — double division + floor can
    # round k*(q+1)/(q+1) below k at 1e12-row ranks
    tile = F.expr(
        f"CASE WHEN __grank <= (__gtot % {n}) * (__gtot div {n} + 1) "
        f"THEN (__grank - 1) div (__gtot div {n} + 1) + 1 "
        f"ELSE (__gtot % {n}) "
        f"  + (__grank - (__gtot % {n}) * (__gtot div {n} + 1) - 1) "
        f"    div greatest(__gtot div {n}, 1) + 1 END"
    ).cast("int")
    return ranked.withColumn(tile_col, tile).drop("__grank", "__gtot")
