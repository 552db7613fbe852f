"""Shared registry for operator-internal persists.

Several operators cache an intermediate that feeds two consumers in
one plan (both sides of a self-join, a counts pass + a rank pass) —
the cache cannot be released before the CALLER's action runs, so the
operators register it here and long-lived sessions call
:func:`unpersist_intermediates` (or ``spark.catalog.clearCache()``,
as bench.py does) between queries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_PERSISTED: list[DataFrame] = []


def persist_intermediate(df: DataFrame) -> DataFrame:
    """Persist an operator-internal intermediate and register it for
    later release."""
    df = df.persist()
    _PERSISTED.append(df)
    return df


def unpersist_intermediates() -> None:
    """Release every cache block registered by operator internals —
    call after the consuming action in long-lived sessions."""
    while _PERSISTED:
        _PERSISTED.pop().unpersist()
