"""Range and as-of joins (SURVEY §2.3 J6, J7).

The reference's labeling is a special-cased range join; the general
engine exposes range joins and as-of joins as first-class operators.
Spark has no native as-of join, so it is composed from built-ins —
no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def range_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_lo: str,
    dim_hi: str,
    how: str = "inner",
    extra_cond: Column | None = None,
    broadcast_dim: bool = True,
) -> DataFrame:
    """``fact.key BETWEEN dim.lo AND dim.hi`` join.

    With a small dim side this is a broadcast nested-loop join — each
    fact partition scans the broadcast intervals, no shuffle.  For two
    large sides, pre-bucketize both on a common grid and equi-join on
    the bucket first (see :func:`range_join_bucketed`).
    """
    cond = F.col(fact_key).between(F.col(dim_lo), F.col(dim_hi))
    if extra_cond is not None:
        cond = cond & extra_cond
    d = F.broadcast(dim) if broadcast_dim else dim
    return fact.join(d, cond, how)


def range_join_bucketed(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_lo: str,
    dim_hi: str,
    bucket_width: float,
) -> DataFrame:
    """Scale path for large×large range joins: explode each interval to
    the grid buckets it overlaps, equi-join on bucket (shuffle hash /
    sort-merge — pushdown-friendly), then re-check the exact predicate.
    Turns an O(n*m) nested loop into a co-partitioned equi-join.
    """
    bw = float(bucket_width)
    dim_b = dim.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(dim_lo) / bw).cast("long"),
                F.floor(F.col(dim_hi) / bw).cast("long"),
            )
        ),
    )
    fact_b = fact.withColumn("__bucket", F.floor(F.col(fact_key) / bw).cast("long"))
    out = fact_b.join(dim_b, "__bucket").where(
        F.col(fact_key).between(F.col(dim_lo), F.col(dim_hi))
    )
    return out.drop("__bucket")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str] | None = None,
    direction: str = "backward",
    allow_exact: bool = True,
) -> DataFrame:
    """As-of join: for each left row, the single right row with the
    largest ``right_ts`` <= ``left_ts`` (direction='backward') sharing
    the equi key ``on``.

    Spark-first plan: union both sides tagged with a side marker, sort
    within ``on`` partitions by time, and carry the right payload
    forward with ``last(ignorenulls) OVER (... ROWS UNBOUNDED
    PRECEDING)``.  One shuffle on the key, no per-group Python, scales
    with the key cardinality like any window.
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    rcols = right_cols if right_cols is not None else [
        c for c in right.columns if c not in (on, right_ts)
    ]

    def ts_kind(df: DataFrame, ts_col: str) -> str:
        dt = dict(df.dtypes).get(ts_col, "")
        return "time" if (dt.startswith("timestamp") or dt == "date") else "numeric"

    def orderable(df: DataFrame, ts_col: str) -> Column:
        # Timestamps (incl. TIMESTAMP_NTZ, which Spark 4 refuses to
        # cast to a numeric directly) order as exact epoch micros; the
        # NTZ->LTZ cast is identity under the engine's UTC session.
        if ts_kind(df, ts_col) == "time":
            return F.unix_micros(F.col(ts_col).cast("timestamp")).cast("double")
        return F.col(ts_col).cast("double")

    # Both __t columns must come from the same branch: a timestamp side
    # resolves to epoch MICROS while a numeric side keeps its raw scale
    # (often epoch seconds), and mixing them would silently match wrong
    # rows.  Mixed pairs are unsupported — cast one side first.
    lk, rk = ts_kind(left, left_ts), ts_kind(right, right_ts)
    if lk != rk:
        raise TypeError(
            f"asof_join: mixed ts column types are unsupported "
            f"({left_ts!r} is {lk}, {right_ts!r} is {rk}); cast one side "
            f"so both are timestamps/dates or both are numeric"
        )

    lt = left.withColumn("__t", orderable(left, left_ts))
    rt = right.withColumn("__t", orderable(right, right_ts))
    if direction == "forward":
        lt = lt.withColumn("__t", -F.col("__t"))
        rt = rt.withColumn("__t", -F.col("__t"))

    l_tag = lt.select(
        F.col(on).alias("__k"), "__t", F.lit(1).alias("__side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__lrow"),
        F.lit(None).cast(
            rt.select(F.struct(*[F.col(c) for c in rcols]).alias("s")).schema["s"].dataType
        ).alias("__rrow"),
    )
    r_tag = rt.select(
        F.col(on).alias("__k"), "__t", F.lit(0).alias("__side"),
        F.lit(None).cast(
            lt.select(F.struct(*[F.col(c) for c in left.columns]).alias("s")).schema["s"].dataType
        ).alias("__lrow"),
        F.struct(*[F.col(c) for c in rcols]).alias("__rrow"),
    )
    # Right rows sort before left rows at equal time iff exact matches
    # are allowed, so last() sees them.
    if not allow_exact:
        order = [F.col("__t"), F.col("__side").desc()]
    else:
        order = [F.col("__t"), F.col("__side")]
    w = Window.partitionBy("__k").orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    unioned = l_tag.unionByName(r_tag)
    carried = unioned.withColumn("__r", F.last("__rrow", ignorenulls=True).over(w))
    out = carried.where(F.col("__side") == 1).select(
        *[F.col("__lrow")[c].alias(c) for c in left.columns],
        *[F.col("__r")[c].alias(c) for c in rcols],
    )
    return out
