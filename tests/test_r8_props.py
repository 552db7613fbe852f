"""Property and edge tests for the round-8 statistic entries:

- events_changepoint: on RANDOM daily series, the engine argmax must
  equal the brute-force python argmax of |D·S_k − k·T| with the
  earliest-k tie-break, and both engines must agree (the oracle
  cross-check) — the tie-break is the part a plausible-looking
  implementation gets wrong.
- events_welch_ttest: hand-sized two-sample case checked against the
  formula evaluated in python IEEE doubles (same fixed tree).
- orders_woe_encoding: a category missing one class is excluded; the
  WOE of a present category equals python's ln on the fused ratio.
- events_conversion_latency: a purchase with no prior view is
  excluded; percentile_disc picks actual data points.
"""

import importlib.util
import math
from pathlib import Path

import duckdb
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

_spec = importlib.util.spec_from_file_location(
    "check_oracle_r8",
    Path(__file__).resolve().parents[1] / "tools" / "check_oracle.py",
)
_co = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_co)


def _cross_check(spark, name, d, views):
    from bytesprocessor_spark.queries import ORACLE, QUERIES

    con = duckdb.connect()
    for t in views:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{d}/{t}.parquet/*.parquet')"
        )
    duck = con.execute(ORACLE[name]).fetchdf()
    sdf = QUERIES[name](spark, d).toPandas()
    duck_cols, duck_rows = _co._pdf_rows(duck)
    spark_cols, spark_rows = _co._pdf_rows(sdf)
    problems = _co.compare(name, spark_cols, spark_rows, duck_cols, duck_rows)
    assert not problems, "\n".join(problems)
    return sdf


def _events(spark, rows):
    return spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(counts=st.lists(st.integers(1, 4), min_size=1, max_size=6))
def test_changepoint_matches_bruteforce_on_random_series(
    spark, tmp_path_factory, counts
):
    d = str(tmp_path_factory.mktemp("cp"))
    rows, eid = [], 0
    for day, c in enumerate(counts):
        for _ in range(c):
            rows.append(
                (eid, f"2024-01-{day + 1:02d} 12:00:00", 1, "click", 1.0, "{}")
            )
            eid += 1
    _events(spark, rows).write.parquet(f"{d}/events.parquet")
    sdf = _cross_check(spark, "events_changepoint", d, ["events"])

    D, T = len(counts), sum(counts)
    if D == 1:
        assert len(sdf) == 0, "a single-day series has no interior split"
        return
    best_k, best_score = None, -1
    s = 0
    for k in range(1, D):  # k < D
        s += counts[k - 1]
        score = abs(D * s - k * T)
        if score > best_score:  # strict: earliest k wins ties
            best_k, best_score = k, score
    row = sdf.iloc[0]
    assert len(sdf) == 1
    assert row["split_k"] == best_k
    assert row["score"] == best_score
    assert row["split_day"] == f"2024-01-{best_k:02d}"
    assert row["pre_sum"] == sum(counts[:best_k])
    assert row["post_sum"] == sum(counts[best_k:])


def _half_away(x: float) -> int:
    return int(math.copysign(math.floor(abs(x) + 0.5), x))


def test_welch_ttest_matches_python_formula(spark, tmp_path):
    d = str(tmp_path)
    views = [1.00, 2.00, 3.00, 6.00]
    purch = [2.00, 4.00, 9.00]
    rows = [
        (i, "2024-01-01 00:00:00", 1, "view", v, "{}") for i, v in enumerate(views)
    ] + [
        (100 + i, "2024-01-01 01:00:00", 2, "purchase", v, "{}")
        for i, v in enumerate(purch)
    ]
    _events(spark, rows).write.parquet(f"{d}/events.parquet")
    sdf = _cross_check(spark, "events_welch_ttest", d, ["events"])
    row = sdf.iloc[0]

    vc1 = [round(v * 100) for v in views]
    vc2 = [round(v * 100) for v in purch]
    n1, s1, q1 = len(vc1), sum(vc1), sum(x * x for x in vc1)
    n2, s2, q2 = len(vc2), sum(vc2), sum(x * x for x in vc2)
    se1 = ((q1 - s1 * s1 / n1) / (n1 - 1)) / n1
    se2 = ((q2 - s2 * s2 / n2) / (n2 - 1)) / n2
    t = (s1 / n1 - s2 / n2) / math.sqrt(se1 + se2)
    df = (se1 + se2) ** 2 / (se1 * se1 / (n1 - 1) + se2 * se2 / (n2 - 1))
    assert (row["n1"], row["n2"]) == (n1, n2)
    assert row["t_micro"] == _half_away(t * 1_000_000)
    assert row["df_milli"] == _half_away(df * 1000)


def test_woe_excludes_single_class_category(spark, tmp_path):
    d = str(tmp_path)
    # priority A: 2 pos ('F') 1 neg; B: 0 pos 2 neg (excluded);
    # C: 1 pos 1 neg
    rows = [
        (1, 1, "F", 10.0, "2024-01-01 00:00:00", "A"),
        (2, 1, "F", 10.0, "2024-01-01 00:00:00", "A"),
        (3, 1, "O", 10.0, "2024-01-01 00:00:00", "A"),
        (4, 1, "O", 10.0, "2024-01-01 00:00:00", "B"),
        (5, 1, "P", 10.0, "2024-01-01 00:00:00", "B"),
        (6, 1, "F", 10.0, "2024-01-01 00:00:00", "C"),
        (7, 1, "O", 10.0, "2024-01-01 00:00:00", "C"),
    ]
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate string, o_orderpriority string",
    ).withColumn("o_orderdate", F.col("o_orderdate").cast("timestamp_ntz")).write.parquet(
        f"{d}/orders.parquet"
    )
    sdf = _cross_check(spark, "orders_woe_encoding", d, ["orders"])
    assert list(sdf["cat"]) == ["A", "C"], "single-class B must be excluded"
    tp, tn = 3, 4
    woe_a = math.log((2 * tn) / (1 * tp))
    woe_c = math.log((1 * tn) / (1 * tp))
    a, c = sdf.iloc[0], sdf.iloc[1]
    assert a["woe_micro"] == _half_away(woe_a * 1_000_000)
    assert c["woe_micro"] == _half_away(woe_c * 1_000_000)
    assert a["pos_share_ppm"] == 2 * 1_000_000 // tp


def test_conversion_latency_requires_prior_view(spark, tmp_path):
    d = str(tmp_path)
    rows = [
        # user 1: view, purchase (+600s), view, purchase (+7200s)
        (1, "2024-01-01 00:00:00", 1, "view", 1.0, "{}"),
        (2, "2024-01-01 00:10:00", 1, "purchase", 1.0, "{}"),
        (3, "2024-01-01 01:00:00", 1, "view", 1.0, "{}"),
        (4, "2024-01-01 03:00:00", 1, "purchase", 1.0, "{}"),
        # user 2: purchase with NO prior view -> excluded
        (5, "2024-01-01 00:05:00", 2, "purchase", 1.0, "{}"),
    ]
    _events(spark, rows).write.parquet(f"{d}/events.parquet")
    sdf = _cross_check(spark, "events_conversion_latency", d, ["events"])
    row = sdf.iloc[0]
    assert row["n_conversions"] == 2
    # percentile_disc picks actual points: [600e6, 7200e6] µs
    assert row["p50_us"] == 600 * 1_000_000
    assert row["p90_us"] == 7200 * 1_000_000
    assert row["p99_us"] == 7200 * 1_000_000
    assert row["sum_lat_us"] == 7800 * 1_000_000
