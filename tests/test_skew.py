"""Skew-mitigation operator tests (operators/skew.py): salted results
must be row-identical to their unsalted twins, and the salted join's
physical plan must actually key on (join key, salt)."""

from __future__ import annotations

from pyspark.sql import functions as F

from bytesprocessor_spark.operators.skew import salted_aggregate, salted_join
from bytesprocessor_spark.plans.explain import executed_plan


def _skewed_df(spark):
    # 90% of rows share one hot key; values vary so salts spread.
    rows = [(("hot" if i % 10 else f"cold{i}"), i, float(i % 7)) for i in range(2000)]
    return spark.createDataFrame(rows, "k string, i long, v double")


def test_salted_aggregate_matches_plain(spark):
    df = _skewed_df(spark)
    salted = salted_aggregate(
        df,
        ["k"],
        [
            ("i", "count", "n"),
            ("i", "sum", "s"),
            ("i", "min", "lo"),
            ("i", "max", "hi"),
            ("v", "avg", "m"),
            ("v", "collect_set", "vs"),
        ],
        n_salts=7,
    ).withColumn("vs", F.array_join("vs", ","))
    plain = df.groupBy("k").agg(
        F.count("i").alias("n"),
        F.sum("i").alias("s"),
        F.min("i").alias("lo"),
        F.max("i").alias("hi"),
        F.avg("v").alias("m"),
        F.array_join(F.array_sort(F.collect_set("v")), ",").alias("vs"),
    )
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_salted_join_matches_plain(spark):
    big = _skewed_df(spark)
    small = spark.createDataFrame(
        [("hot", 1), ("cold7", 2), ("missing", 3)], "sk string, tag int"
    )
    for how in ("inner", "left"):
        salted = salted_join(big, small, "k", "sk", n_salts=5, how=how)
        plain = big.join(small, big.k == small.sk, how)
        assert sorted(map(tuple, salted.select("k", "i", "v", "tag").collect())) == sorted(
            map(tuple, plain.select("k", "i", "v", "tag").collect())
        ), how


def test_salted_join_plan_keys_on_salt(spark):
    big = _skewed_df(spark)
    small = spark.createDataFrame([("hot", 1)], "sk string, tag int")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = salted_join(big, small, "k", "sk", n_salts=5)
        j.count()
        plan = executed_plan(j)
        assert "__salt" in plan and "SortMergeJoin" in plan
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_key_skew_report_finds_hot_key(spark):
    """The diagnosis must surface the planted hot key first with the
    right share and a skew factor ~ n_keys * share."""
    from bytesprocessor_spark.operators.skew import key_skew_report

    rows = [(999, i) for i in range(900)] + [(k, 0) for k in range(100)]
    df = spark.createDataFrame(rows, "user_id long, x long")
    top = key_skew_report(df, "user_id", top_k=3).collect()
    assert top[0].key == "999"
    assert top[0].n_rows == 900
    assert abs(top[0].share - 0.9) < 1e-9
    assert abs(top[0].skew_factor - 0.9 * 101) < 1e-6


def test_key_skew_report_composite_nulls_not_conflated(spark):
    """Distinct composite keys differing only in NULL placement must
    report separately (the pre-groupBy string encoding merged them)."""
    from bytesprocessor_spark.operators.skew import key_skew_report

    rows = [("a", None)] * 5 + [(None, "a")] * 3 + [("a", "a")] * 2
    df = spark.createDataFrame(rows, "k1 string, k2 string")
    top = {r.key: r.n_rows for r in key_skew_report(df, ["k1", "k2"], top_k=5).collect()}
    assert top == {"a|<NULL>": 5, "<NULL>|a": 3, "a|a": 2}
