"""Data-quality asserts (SURVEY §2.8 Q1).

The reference hard-asserts no-NaN at four points of its pipeline
(BytesProcessor.py:168,180,192,328) and exits the job on violation.
Here the invariant is one distributed aggregation — a single pass that
counts violations per column — instead of a driver-side materialize.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, FloatType


class DataQualityError(AssertionError):
    pass


def null_counts(df: DataFrame, cols: list[str] | None = None) -> dict[str, int]:
    """NULL/NaN count per column in one aggregation pass."""
    cols = cols or df.columns
    by_type = dict(df.dtypes)
    aggs = []
    for c in cols:
        cond = F.col(c).isNull()
        if by_type.get(c) in ("double", "float"):
            cond = cond | F.isnan(F.col(c))
        aggs.append(F.sum(cond.cast("long")).alias(c))
    row = df.agg(*aggs).collect()[0]
    return {c: int(row[c] or 0) for c in cols}


def assert_no_nulls(df: DataFrame, cols: list[str] | None = None, context: str = "") -> DataFrame:
    """Fail the job (like BytesProcessor.py:168) if any NULL/NaN exists;
    returns the input unchanged so it chains inside a pipeline."""
    bad = {c: n for c, n in null_counts(df, cols).items() if n > 0}
    if bad:
        raise DataQualityError(f"nulls detected{f' ({context})' if context else ''}: {bad}")
    return df


def nan_free_floats(df: DataFrame) -> DataFrame:
    """Streaming-friendly variant: a filter that drops NaN rows instead
    of failing — for pipelines where a hard stop is not acceptable."""
    float_cols = [f.name for f in df.schema.fields if isinstance(f.dataType, (DoubleType, FloatType))]
    out = df
    for c in float_cols:
        out = out.where(~F.isnan(F.col(c)) | F.col(c).isNull())
    return out
