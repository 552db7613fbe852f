from bytesprocessor_spark.plans.explain import (
    executed_plan,
    has_broadcast_join,
    pushed_filters,
    scan_columns,
    shuffle_count,
)

__all__ = [
    "executed_plan",
    "has_broadcast_join",
    "pushed_filters",
    "scan_columns",
    "shuffle_count",
]
