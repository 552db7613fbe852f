"""Grouped-map / grouped-agg / UDTF surface (SURVEY §2.10 U3-U5).

These are the escape hatches for semantics the built-ins can't express
— always Arrow-batched, never row-at-a-time.  Each ships with a
built-in-only equivalent where one exists, so the Python path is a
choice, not a default (UDFs are the slow path).
"""

from __future__ import annotations

from collections.abc import Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def grouped_zscore(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    out_col: str = "zscore",
) -> DataFrame:
    """Per-group standardization via ``applyInPandas`` (U3): each group
    arrives as one pandas DataFrame; sample std (ddof=1).

    Scale note: one shuffle on the keys and each group must fit in one
    worker's memory — the same constraint any grouped-map carries.  The
    window-function equivalent (no Python, streaming partial aggs) is
    usually preferable; this operator exists for logic that genuinely
    needs whole-group pandas semantics (model scoring, complex
    reshapes).
    """
    schema_fields = df.schema.fields
    out_schema = ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in schema_fields)
    out_schema += f", `{out_col}` double"

    def standardize(pdf: pd.DataFrame) -> pd.DataFrame:
        std = pdf[value_col].std(ddof=1)
        mean = pdf[value_col].mean()
        pdf[out_col] = (pdf[value_col] - mean) / std if std and std > 0 else 0.0
        return pdf

    return df.groupBy(*keys).applyInPandas(standardize, schema=out_schema)


def grouped_weighted_mean(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    weight_col: str,
    out_col: str = "weighted_mean",
) -> DataFrame:
    """Custom aggregate via a grouped-agg pandas UDF (U4): weighted
    mean as sum(w*x)/sum(w).  A pandas UDAF participates in Spark's
    hash aggregation exactly like a built-in (partial aggregation per
    partition is NOT available to pandas UDAFs — each group's columns
    ship to one worker — so prefer built-in sum(w*x)/sum(w) expressions
    at scale; this demonstrates the surface)."""

    @F.pandas_udf("double")
    def wmean(v: pd.Series, w: pd.Series) -> float:
        denom = w.sum()
        return float((v * w).sum() / denom) if denom else float("nan")

    return df.groupBy(*keys).agg(wmean(F.col(value_col), F.col(weight_col)).alias(out_col))


def register_range_udtf(spark) -> None:
    """SQL UDTF (U5): a table function generating per-chunk record
    ranges — the SQL-visible face of the pcap chunk indexer (each
    output row describes one parse task's byte range).

    Usage after registration:
        SELECT * FROM chunk_ranges(0, 1000, 256)
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType="chunk_id int, start long, end long")
    class ChunkRanges:
        def eval(self, start: int, stop: int, step: int):
            cid = 0
            s = start
            while s < stop:
                yield cid, s, min(s + step, stop)
                cid += 1
                s += step

    spark.udtf.register("chunk_ranges", ChunkRanges)
    return None
