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


def _key_schema(df: DataFrame, keys) -> str:
    """Key fields with their ACTUAL types from the input schema —
    hardcoding bigint breaks any non-long key (string event types,
    composite ids)."""
    by = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    return ", ".join(f"{k} {by[k]}" for k in keys)


def running_totals(
    df: DataFrame,
    keys: Sequence[str] = ("user_id",),
    value_col: str = "value",
    timeout: str = "NoTimeout",
    timeout_duration_ms: int | None = None,
) -> DataFrame:
    """Custom stateful operator: cumulative count and sum per key
    across micro-batches — the minimal shape of the hand-rolled
    chunk-to-chunk state the reference keeps in instance attributes
    (``current_chunk`` counter etc., BytesProcessor.py:53,119),
    expressed with checkpointed, fault-tolerant state instead.

    Emits one row per key per micro-batch: (key..., n_events, total).
    """
    if timeout == "ProcessingTimeTimeout" and timeout_duration_ms is None:
        raise ValueError("ProcessingTimeTimeout requires timeout_duration_ms")
    out_schema = f"{_key_schema(df, keys)}, n_events bigint, total double"
    state_schema = "n bigint, total double"

    def update(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            # idle horizon passed with no new rows: evict — the whole
            # point of the timeout is bounding state lifetime
            state.remove()
            return
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf[value_col].sum())
        state.update((n, total))
        if timeout_duration_ms is not None:
            state.setTimeoutDuration(timeout_duration_ms)
        yield pd.DataFrame([[*key, n, total]], columns=[*keys, "n_events", "total"])

    return df.groupBy(*[df[k] for k in keys]).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=getattr(GroupStateTimeout, timeout),
    )


def merge_topk(current: list[float], new_values, k: int) -> list[float]:
    """Associative top-k state merge: combine the persisted top-k with
    a batch's values and keep the k largest (descending)."""
    vals = list(current)
    vals.extend(new_values)
    return sorted(vals, reverse=True)[:k]


def topk_per_key(
    df: DataFrame,
    keys: Sequence[str] = ("user_id",),
    value_col: str = "value",
    k: int = 3,
) -> DataFrame:
    """Per-key running top-k via ``transformWithStateInPandas`` — the
    Spark 4 arbitrary-state API (SURVEY §2.9 ST6, modern form).

    Compared to ``applyInPandasWithState`` above, state here is a
    *managed composite* (a ListState the store maintains incrementally)
    rather than one opaque tuple, so only the top-k list — never the
    input history — is persisted.  Emits each key's current top-k after
    every micro-batch it appears in; state size is O(keys * k)
    regardless of stream length, the property that keeps an unbounded
    stream's store bounded.

    Runtime requirements: the RocksDB state store provider
    (``spark.sql.streaming.stateStore.providerClass``) and the
    ``protobuf`` package (the TWS control channel is protobuf-encoded;
    absent in this container, so the end-to-end test skips there — the
    merge logic is pinned by a pure unit test instead).
    """
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    out_schema = f"{_key_schema(df, keys)}, topk array<double>"

    class TopK(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._best = handle.getListState("best", "v double")

        def handleInputRows(self, key, rows, timerValues):
            vals = merge_topk(
                [float(t[0]) for t in self._best.get()],
                (float(v) for pdf in rows for v in pdf[value_col]),
                k,
            )
            self._best.put([(v,) for v in vals])
            yield pd.DataFrame([[*key, vals]], columns=[*keys, "topk"])

        def close(self) -> None:
            pass

    return df.groupBy(*[df[c] for c in keys]).transformWithStateInPandas(
        TopK(),
        outputStructType=out_schema,
        outputMode="Update",
        timeMode="None",
    )


def running_totals_tws(
    df: DataFrame,
    keys: Sequence[str] = ("user_id",),
    value_col: str = "value",
) -> DataFrame:
    """ST6 on the modern API: the same per-key cumulative count/sum as
    :func:`running_totals`, expressed with ``transformWithStateInPandas``
    (Spark 4's arbitrary-state operator family) — typed state variables
    on a RocksDB-backed store instead of one opaque tuple, and room for
    timers/TTL that ``applyInPandasWithState`` lacks.  Requires
    ``spark.sql.streaming.stateStore.providerClass`` set to the
    RocksDB provider before the query starts, and the ``protobuf``
    package (the state-server protocol) — absent that, the driver
    worker fails at init and the test skips; :func:`running_totals`
    is the dependency-free twin with identical semantics.
    """
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    out_schema = f"{_key_schema(df, keys)}, n_events bigint, total double"

    class _RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._agg = handle.getValueState("agg", "n bigint, total double")

        def handleInputRows(self, key, rows, timerValues):
            n, total = self._agg.get() if self._agg.exists() else (0, 0.0)
            for pdf in rows:
                n += len(pdf)
                total += float(pdf[value_col].sum())
            self._agg.update((n, total))
            yield pd.DataFrame(
                {
                    **{k: [key[i]] for i, k in enumerate(keys)},
                    "n_events": [n],
                    "total": [total],
                }
            )

        def close(self) -> None:
            pass

    return df.groupBy(*keys).transformWithStateInPandas(
        statefulProcessor=_RunningTotals(),
        outputStructType=out_schema,
        outputMode="Update",
        timeMode="None",
    )
