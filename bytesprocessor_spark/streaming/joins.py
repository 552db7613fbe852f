"""Streaming joins (SURVEY §2.9 extension): the two join shapes a
streaming pipeline needs beyond windowed aggregation.

* **Stream-static enrichment** — each micro-batch joins against a
  (slowly changing) dimension snapshot; broadcast keeps it map-only,
  the stream never shuffles for the join.
* **Stream-stream interval join** — both sides are unbounded; each
  side buffers rows in the state store until the other side's
  watermark proves no more matches can arrive.  The time-interval
  condition is what BOUNDS that state: without it (or without
  watermarks) the buffers grow forever, which is the classic
  stream-join OOM at scale.  Spark derives the state retention from
  the watermark + interval bounds automatically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_static_enrich(
    stream: DataFrame, dim: DataFrame, on: str | list[str], how: str = "left"
) -> DataFrame:
    """Enrich a stream with a static dimension (re-read every batch if
    the underlying source changes).  Broadcast => no stream shuffle."""
    return stream.join(F.broadcast(dim), on, how)


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    lower: str = "0 seconds",
    upper: str = "10 minutes",
    watermark: str = "1 minute",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream join: rows match when keys are equal AND
    ``right_ts`` lies in ``[left_ts + lower, left_ts + upper]``.

    Both sides get watermarks so the state store can evict: a buffered
    left row is droppable once the right watermark passes
    ``left_ts + upper``, and vice versa.  Outer variants additionally
    need the watermark to know when to emit unmatched rows — Spark
    enforces the interval condition for them.
    """
    overlap = (set(left.columns) & set(right.columns)) - {key}
    if overlap:
        raise ValueError(
            f"interval_join: rename overlapping non-key columns first: {sorted(overlap)}"
        )
    l = left.withWatermark(left_ts, watermark).alias("l")
    r = right.withWatermark(right_ts, watermark).alias("r")
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (F.col(f"r.{right_ts}") >= F.col(f"l.{left_ts}") + F.expr(f"INTERVAL {lower}"))
        & (F.col(f"r.{right_ts}") <= F.col(f"l.{left_ts}") + F.expr(f"INTERVAL {upper}"))
    )
    out = l.join(r, cond, how)
    # one key column out (coalesced for outer variants) — the raw
    # condition join keeps both sides' copies, which makes any
    # downstream reference to the key ambiguous
    key_out = F.coalesce(F.col(f"l.{key}"), F.col(f"r.{key}")).alias(key)
    keep = [F.col(f"l.{c}") for c in left.columns if c != key] + [
        F.col(f"r.{c}") for c in right.columns if c != key
    ]
    return out.select(key_out, *keep)
