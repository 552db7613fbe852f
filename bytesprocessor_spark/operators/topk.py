"""Sorts / limits / top-k (SURVEY §2.6 O1-O2).

``orderBy().limit(k)`` plans as TakeOrderedAndProject — each partition
keeps a k-sized heap, the driver merges k*parts rows; no global sort at
any scale.  Per-group top-k is a window rank, one shuffle on the group
key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k(df: DataFrame, k: int, *order: Column) -> DataFrame:
    """Global top-k. Pass fully-deterministic order columns (include a
    unique tiebreak key) so results are stable across retries/runs."""
    return df.orderBy(*order).limit(k)


def top_k_per_group(
    df: DataFrame,
    group_cols: list[str],
    k: int,
    *order: Column,
    rank_col: str = "rn",
    keep_rank: bool = False,
) -> DataFrame:
    w = Window.partitionBy(*group_cols).orderBy(*order)
    out = df.withColumn(rank_col, F.row_number().over(w)).where(F.col(rank_col) <= k)
    return out if keep_rank else out.drop(rank_col)
