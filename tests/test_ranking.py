"""The distributed rank/NTILE device (operators/ranking.py) — the
replacement for corpus-scale ``Window.orderBy`` with no partitionBy.

Pins three properties:
  * bit-identical results to the single-partition ``row_number`` /
    ``ntile`` ground truth over the same total order (including the
    n > total edge and the uneven-bucket remainder rule);
  * a plan with NO ``Exchange SinglePartition`` anywhere — the whole
    point of the device;
  * invariance to the session shuffle-partition count (range boundary
    sampling must not leak into rank values).
"""

from __future__ import annotations

import random

from pyspark.sql import Window
from pyspark.sql import functions as F

from bytesprocessor_spark.operators.caching import unpersist_intermediates
from bytesprocessor_spark.operators.ranking import (
    bounded_single_group,
    distributed_cumsum,
    distributed_ntile,
    distributed_rank,
)
from bytesprocessor_spark.plans.explain import executed_plan


def _fixture(spark, n=997, seed=5):
    rng = random.Random(seed)
    # duplicate-heavy value column: the tiebreak id is load-bearing
    rows = [(i, rng.randint(0, 50)) for i in range(n)]
    return spark.createDataFrame(rows, "id long, v long")


def test_rank_matches_ground_truth(spark):
    df = _fixture(spark)
    got = distributed_rank(
        df, [F.col("v").desc(), F.col("id").asc()], rank_col="rk", total_col="n"
    )
    ref = df.select(
        "id",
        F.row_number()
        .over(Window.orderBy(F.col("v").desc(), "id"))
        .cast("long")
        .alias("rk_ref"),
    )
    joined = got.join(ref, "id")
    assert joined.where("rk != rk_ref").count() == 0
    assert got.select("n").distinct().collect()[0][0] == 997
    unpersist_intermediates()


def test_ntile_matches_ground_truth_all_shapes(spark):
    df = _fixture(spark, n=103)
    for n in (1, 4, 10, 103, 500):  # even, remainder, one-per-row, n > total
        got = distributed_ntile(
            df, [F.col("v").asc(), F.col("id").asc()], n, tile_col="t"
        )
        ref = df.select(
            "id", F.ntile(n).over(Window.orderBy("v", "id")).alias("t_ref")
        )
        assert got.join(ref, "id").where("t != t_ref").count() == 0, n
    unpersist_intermediates()


def test_cumsum_matches_ground_truth(spark):
    df = _fixture(spark, n=500, seed=9)
    got = distributed_cumsum(
        df, [F.col("v").desc(), F.col("id").asc()], "v", cum_col="cum"
    )
    ref = df.select(
        "id",
        F.sum("v")
        .over(
            Window.orderBy(F.col("v").desc(), "id").rowsBetween(
                Window.unboundedPreceding, 0
            )
        )
        .alias("cum_ref"),
    )
    assert got.join(ref, "id").where("cum != cum_ref").count() == 0
    assert "Exchange SinglePartition" not in executed_plan(got)
    unpersist_intermediates()


def test_rank_invariant_to_partition_count(spark):
    df = _fixture(spark, n=211)
    a = distributed_rank(
        df.repartition(1), [F.col("v").asc(), F.col("id").asc()], rank_col="rk"
    )
    b = distributed_rank(
        df.repartition(13), [F.col("v").asc(), F.col("id").asc()], rank_col="rk"
    )
    assert (
        a.select("id", "rk")
        .join(b.select("id", F.col("rk").alias("rk2")), "id")
        .where("rk != rk2")
        .count()
        == 0
    )
    unpersist_intermediates()


def test_device_plan_has_no_single_partition_exchange(spark):
    df = _fixture(spark)
    for out in (
        distributed_rank(df, [F.col("v").asc(), F.col("id").asc()], rank_col="rk"),
        distributed_ntile(df, [F.col("v").desc(), F.col("id").asc()], 7, tile_col="t"),
    ):
        plan = executed_plan(out)
        assert "Exchange SinglePartition" not in plan, plan
        # the corpus window is partitioned by the range-slice id
        assert "windowspecdefinition(__pid" in plan
    unpersist_intermediates()


def test_bounded_single_group_window_no_single_partition(spark):
    """The bounded-frame companion: a cumulative window over a k-row
    aggregate declared via bounded_single_group plans without an
    Exchange SinglePartition and still computes the right cumsum."""
    df = _fixture(spark, n=60)
    agg = df.groupBy("v").agg(F.count("*").alias("n"))
    g = bounded_single_group(agg)
    w = Window.partitionBy("__opid").orderBy("v").rowsBetween(
        Window.unboundedPreceding, 0
    )
    out = g.select("v", F.sum("n").over(w).alias("cum"))
    assert "Exchange SinglePartition" not in executed_plan(out)
    rows = {r["v"]: r["cum"] for r in out.collect()}
    ref = {
        r["v"]: r["cum"]
        for r in agg.select(
            "v",
            F.sum("n")
            .over(Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0))
            .alias("cum"),
        ).collect()
    }
    assert rows == ref
