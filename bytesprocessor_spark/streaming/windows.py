"""Streaming windowed aggregation operators (SURVEY §2.9 ST1-ST5).

Thin, watermark-correct wrappers over Structured Streaming's windowing
— the state-store sizing rule they encode: every unbounded stateful op
(window agg, session, dedup) is paired with an event-time watermark so
state is evicted as event time advances; without one, state grows
without bound at production scale.

All helpers also run on batch DataFrames (watermark is a no-op there),
which is how the DuckDB oracle checks the same semantics in
queries_windows.py.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _maybe_watermark(df: DataFrame, ts_col: str, watermark: str | None) -> DataFrame:
    return df.withWatermark(ts_col, watermark) if watermark and df.isStreaming else df


def tumbling_agg(
    df: DataFrame,
    ts_col: str,
    size: str,
    aggs: Sequence[Column],
    keys: Sequence[str] = (),
    watermark: str | None = None,
) -> DataFrame:
    """ST1: non-overlapping event-time windows."""
    src = _maybe_watermark(df, ts_col, watermark)
    out = src.groupBy(F.window(ts_col, size), *keys).agg(*aggs)
    return out.select(
        F.col("window.start").alias("win_start"), F.col("window.end").alias("win_end"), *keys,
        *[c for c in out.columns if c not in ("window", *keys)],
    )


def sliding_agg(
    df: DataFrame,
    ts_col: str,
    size: str,
    slide: str,
    aggs: Sequence[Column],
    keys: Sequence[str] = (),
    watermark: str | None = None,
) -> DataFrame:
    """ST2: overlapping windows (each event lands in size/slide of them)."""
    src = _maybe_watermark(df, ts_col, watermark)
    out = src.groupBy(F.window(ts_col, size, slide), *keys).agg(*aggs)
    return out.select(
        F.col("window.start").alias("win_start"), F.col("window.end").alias("win_end"), *keys,
        *[c for c in out.columns if c not in ("window", *keys)],
    )


def session_agg(
    df: DataFrame,
    ts_col: str,
    gap: str,
    aggs: Sequence[Column],
    keys: Sequence[str] = (),
    watermark: str | None = None,
) -> DataFrame:
    """ST3: dynamic-length sessions closed by ``gap`` of inactivity.
    In streaming mode a watermark is mandatory (sessions can otherwise
    never be finalized) — enforced here rather than silently leaking
    state."""
    if df.isStreaming and not watermark:
        raise ValueError("session_agg on a stream requires a watermark (state eviction)")
    src = _maybe_watermark(df, ts_col, watermark)
    out = src.groupBy(F.session_window(ts_col, gap), *keys).agg(*aggs)
    return out.select(
        F.col("session_window.start").alias("session_start"),
        F.col("session_window.end").alias("session_end"),
        *keys,
        *[c for c in out.columns if c not in ("session_window", *keys)],
    )


def stream_dedup(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str | None = None,
    watermark: str | None = None,
) -> DataFrame:
    """ST5: stateful exact dedup on key columns.  With a watermark the
    key state is bounded to the watermark horizon
    (dropDuplicatesWithinWatermark); on a batch frame it is a plain
    distinct-by-key.  A STREAM without both ts_col and watermark is
    refused — silently falling back to unbounded dropDuplicates is
    exactly the state-grows-forever failure these wrappers exist to
    prevent (same guard discipline as session_agg)."""
    if df.isStreaming:
        if not (watermark and ts_col):
            raise ValueError(
                "streaming dedup requires ts_col AND watermark "
                "(unbounded key state otherwise)"
            )
        return df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(list(keys))
    return df.dropDuplicates(list(keys))
