"""Physical-plan inspection helpers (SURVEY §4).

The engine's optimizer IS Catalyst; what the engine owes its users is
*verifiable plan quality*.  These helpers turn the informal habit of
reading ``df.explain("formatted")`` into assertions a test suite (and
CI) can hold: filters reached the scan, the scan pruned columns, the
dimension side broadcast, a pipeline stayed shuffle-free.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters entries across the plan's file scans."""
    plan = executed_plan(df)
    # capture to end of line: the filter list itself may contain ']'
    # (e.g. In(src_port, [443,80]))
    return re.findall(r"PushedFilters: \[(.*)", plan)


def scan_columns(df: DataFrame) -> list[list[str]]:
    """ReadSchema column lists per scan — the column-pruning witness."""
    plan = executed_plan(df)
    out = []
    for m in re.findall(r"ReadSchema: struct<([^>]*)>", plan):
        out.append([c.split(":")[0] for c in m.split(",") if c])
    return out


def shuffle_count(df: DataFrame) -> int:
    """Number of exchanges in the executed plan (AQE reuse not
    deduplicated — an upper bound)."""
    return executed_plan(df).count("Exchange")


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in executed_plan(df) or "BroadcastNestedLoopJoin" in executed_plan(df)


def assert_plan(
    df: DataFrame,
    max_shuffles: int | None = None,
    requires_broadcast: bool = False,
    pushed: str | None = None,
    forbid_cartesian: bool = False,
) -> DataFrame:
    """Plan-quality gate: chain into a pipeline to fail fast when a
    code change regresses the physical plan (the 100 TB failure mode is
    almost always a silent extra shuffle or a lost pushdown)."""
    plan = executed_plan(df)
    if max_shuffles is not None:
        n = plan.count("Exchange")
        if n > max_shuffles:
            raise AssertionError(f"plan has {n} exchanges (max {max_shuffles}):\n{plan}")
    if requires_broadcast and "Broadcast" not in plan:
        raise AssertionError(f"expected a broadcast join:\n{plan}")
    if pushed is not None and pushed not in plan:
        raise AssertionError(f"expected pushed filter {pushed!r}:\n{plan}")
    if forbid_cartesian and "CartesianProduct" in plan:
        raise AssertionError(f"unexpected cartesian product:\n{plan}")
    return df
