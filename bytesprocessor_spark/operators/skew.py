"""Skew mitigation operators: salted aggregation and salted joins.

Hot keys are the classic 100 TB failure mode: one reducer gets the
whole "en" language partition or the one viral user_id and the stage
runs at single-task speed.  AQE's skew-join splitting (enabled in
session.py) handles sort-merge join skew at runtime; these operators
cover the two cases AQE does not re-plan:

  * ``salted_aggregate`` — a high-cardinality-input groupBy whose KEY
    distribution is skewed.  Spark's partial aggregation already
    combines map-side, so salting only pays when per-key partial
    states are large (collect_list/collect_set/distinct counting).
    Two stages: groupBy(keys + salt) computes partials over ~1/n of
    each hot group, then groupBy(keys) merges the n partials.
  * ``salted_join`` — a shuffled equi-join with hot probe keys.  The
    big side gets a deterministic per-row salt in [0, n); the small
    side is replicated n times (explode over a literal range); the
    join key becomes (key, salt), so a hot key's rows spread over n
    tasks.  Replication multiplies the small side by n — size it like
    a broadcast decision (n * |small| must stay shuffle-cheap).

Salts derive from ``xxhash64`` over data columns — deterministic
under task retry/speculation (a random or monotonically-increasing
salt can mispair partial states when a stage re-executes; cf. the
labeling determinism fix in operators/labeling.py).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def _row_salt(df: DataFrame, n_salts: int) -> Column:
    """Deterministic pseudo-uniform salt in [0, n) from every column
    of the row (same row -> same salt on retry, different rows of one
    hot group spread uniformly)."""
    return F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salts))


def salted_aggregate(
    df: DataFrame,
    keys: Sequence[str],
    aggs: Sequence[tuple[str, str, str]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-stage skew-safe groupBy.

    ``aggs`` is (column, fn, alias) with fn in {count, sum, min, max,
    avg, collect_set} — the algebraic aggregates whose partial states
    merge associatively (avg decomposes into sum+count; collect_set
    merges by array union).  Result equals the plain one-stage
    ``df.groupBy(keys).agg(...)`` for any salt count.
    """
    partials: list[Column] = []
    finals: list[Column] = []
    for col, fn, alias in aggs:
        p = f"__p_{alias}"
        if fn == "count":
            partials.append(F.count(col).alias(p))
            finals.append(F.sum(p).alias(alias))
        elif fn == "sum":
            partials.append(F.sum(col).alias(p))
            finals.append(F.sum(p).alias(alias))
        elif fn == "min":
            partials.append(F.min(col).alias(p))
            finals.append(F.min(p).alias(alias))
        elif fn == "max":
            partials.append(F.max(col).alias(p))
            finals.append(F.max(p).alias(alias))
        elif fn == "avg":
            ps, pc = f"__ps_{alias}", f"__pc_{alias}"
            partials.append(F.sum(col).alias(ps))
            partials.append(F.count(col).alias(pc))
            finals.append((F.sum(ps) / F.sum(pc)).alias(alias))
        elif fn == "collect_set":
            partials.append(F.collect_set(col).alias(p))
            finals.append(
                F.array_sort(F.array_distinct(F.flatten(F.collect_list(p)))).alias(alias)
            )
        else:
            raise ValueError(f"unsupported salted aggregate fn: {fn}")
    salted = df.withColumn(_SALT, _row_salt(df, n_salts))
    stage1 = salted.groupBy(*keys, _SALT).agg(*partials)
    return stage1.groupBy(*keys).agg(*finals)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe shuffled equi-join: salt the big side, replicate the
    small side ``n_salts`` times, join on (key, salt).  Row-identical
    to ``big.join(small, big[big_key] == small[small_key], how)`` for
    inner/left joins."""
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left (salt padding breaks right/full)")
    b = big.withColumn(_SALT, _row_salt(big, n_salts))
    s = small.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    out = b.join(s, (b[big_key] == s[small_key]) & (b[_SALT] == s[_SALT]), how)
    return out.drop(_SALT)


def key_skew_report(
    df: DataFrame,
    key_cols: list[str] | str,
    top_k: int = 10,
) -> DataFrame:
    """Skew diagnosis in two bounded aggregations: per-key counts ->
    (n_keys, total, max, avg) plus the ``top_k`` heaviest keys with
    their share of all rows and skew factor (count / avg-count) — the
    numbers that decide whether a join/agg on this key needs salting
    (factor ~> 4-8 on a hot key is the usual trigger) and how many
    salts to use.

    Output: (key, n_rows, share, skew_factor) for the top keys, ordered
    heaviest first.  Everything reduces before reaching the driver — at
    100 TB this is one shuffle on the key plus a top-k.
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    # group on the REAL columns — string-encoding before the groupBy
    # conflates distinct composite keys (concat_ws skips NULLs and a
    # separator inside a value is ambiguous), inflating a phantom hot
    # key; the display string is derived after, with a NULL sentinel
    by_key = df.groupBy(*keys).agg(F.count("*").alias("n_rows"))
    key_expr = F.concat_ws(
        "|", *[F.coalesce(F.col(k).cast("string"), F.lit("<NULL>")) for k in keys]
    )
    counts = by_key.select(key_expr.alias("key"), "n_rows")
    from bytesprocessor_spark.operators.caching import persist_intermediate

    counts = persist_intermediate(counts)  # feeds the totals agg AND the top-k
    totals = counts.agg(
        F.sum("n_rows").alias("__total"), F.count("*").alias("__n_keys")
    )
    # orderBy+limit plans as TakeOrderedAndProject (per-partition heap
    # + driver merge of top_k rows) — a global row_number window would
    # funnel the whole per-key counts table (corpus-of-keys-sized on a
    # high-cardinality key) through one task
    top = counts.orderBy(F.col("n_rows").desc(), F.col("key").asc()).limit(top_k)
    return (
        top.crossJoin(F.broadcast(totals))
        .select(
            "key",
            "n_rows",
            F.round(F.col("n_rows") / F.col("__total"), 6).alias("share"),
            F.round(F.col("n_rows") * F.col("__n_keys") / F.col("__total"), 6).alias(
                "skew_factor"
            ),
        )
    )
