"""Arbitrary stateful streaming (SURVEY §2.9 ST6):
``applyInPandasWithState`` operators.

The pattern: per-key state lives in the state store, each micro-batch
delivers that key's new rows as pandas frames, the operator updates
state and emits output rows.  Timeouts bound state lifetime the same
way watermarks bound windowed aggs.
"""

from __future__ import annotations

from collections.abc import Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def running_totals(
    df: DataFrame,
    keys: Sequence[str] = ("user_id",),
    value_col: str = "value",
    timeout: str = "NoTimeout",
) -> DataFrame:
    """Custom stateful operator: cumulative count and sum per key
    across micro-batches — the minimal shape of the hand-rolled
    chunk-to-chunk state the reference keeps in instance attributes
    (``current_chunk`` counter etc., BytesProcessor.py:53,119),
    expressed with checkpointed, fault-tolerant state instead.

    Emits one row per key per micro-batch: (key..., n_events, total).
    """
    key_fields = ", ".join(f"{k} bigint" for k in keys)
    out_schema = f"{key_fields}, n_events bigint, total double"
    state_schema = "n bigint, total double"

    def update(key, pdfs, state: GroupState):
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf[value_col].sum())
        state.update((n, total))
        yield pd.DataFrame([[*key, n, total]], columns=[*keys, "n_events", "total"])

    return df.groupBy(*[df[k] for k in keys]).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=getattr(GroupStateTimeout, timeout),
    )
