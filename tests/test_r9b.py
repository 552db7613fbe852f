"""Round-9 second-batch properties: hand cases + engine/oracle
cross-checks on synthetic fixtures (the test_r9 harness)."""

from __future__ import annotations

import hashlib
import importlib.util
import math
from pathlib import Path

import duckdb  # noqa: F401 (the harness uses it)
from pyspark.sql import functions as F

_spec = importlib.util.spec_from_file_location(
    "check_oracle_r9b",
    Path(__file__).resolve().parents[1] / "tools" / "check_oracle.py",
)
_co = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_co)


def _cross_check(spark, name, d, views):
    import duckdb

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


def _h60(s):
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_ljung_box_trend_rejects_constant_drops(spark, tmp_path):
    """A112: a strongly trending daily count series is decisively NOT
    white noise (reject at every lag, r_1 near 1); lag-1 ACF matches
    a python replay of the integer-centered estimator."""
    d = str(tmp_path)
    rows, eid = [], 0
    counts = [2 * day for day in range(1, 31)]  # strong upward trend
    for day, c in enumerate(counts, start=1):
        for _ in range(c):
            rows.append(
                (eid, f"2024-01-{day:02d} 08:00:00", 1, "purchase", 1.0, "{}")
            )
            eid += 1
    _events(spark, rows).write.parquet(f"{d}/events.parquet")
    sdf = _cross_check(spark, "events_ljung_box", d, ["events"])
    assert list(sdf["lag"]) == [1, 2, 3, 4, 5, 6, 7]
    assert all(sdf["reject_white_noise"])
    # python replay of r_1
    n = len(counts)
    m = sum(counts) // n
    dev = [x - m for x in counts]
    den = sum(e * e for e in dev)
    num1 = sum(dev[t] * dev[t + 1] for t in range(n - 1))
    r1 = num1 / den
    row = sdf[sdf["lag"] == 1].iloc[0]
    assert row["r_micro"] == round(r1 * 1e6)
    assert row["n_days"] == n
    q1 = n * (n + 2) * round(r1 * r1 / (n - 1) * 1e9) // 1000000
    assert row["q_milli"] == q1


def test_ljung_box_constant_series_is_empty(spark, tmp_path):
    """A112: a constant series has zero deviance (den = 0) — no rows
    rather than a divide-by-zero artifact."""
    d = str(tmp_path)
    rows, eid = [], 0
    for day in range(1, 16):
        for _ in range(5):
            rows.append(
                (eid, f"2024-01-{day:02d} 08:00:00", 1, "purchase", 1.0, "{}")
            )
            eid += 1
    _events(spark, rows).write.parquet(f"{d}/events.parquet")
    sdf = _cross_check(spark, "events_ljung_box", d, ["events"])
    assert len(sdf) == 0


def test_jarque_bera_skewed_vs_symmetric(spark, tmp_path):
    """A113: a heavily right-skewed type rejects normality with
    positive skew; a symmetric two-point type has skew 0; both match
    a python replay of the moment formula."""
    d = str(tmp_path)
    rows, eid = [], 0
    skewed = [1.0] * 95 + [1000.0] * 5
    for v in skewed:
        rows.append((eid, "2024-01-01 08:00:00", 1, "purchase", v, "{}"))
        eid += 1
    symmetric = [10.0, 20.0] * 50
    for v in symmetric:
        rows.append((eid, "2024-01-01 08:00:00", 1, "click", v, "{}"))
        eid += 1
    _events(spark, rows).write.parquet(f"{d}/events.parquet")
    sdf = _cross_check(spark, "events_jarque_bera", d, ["events"])
    by = {r["event_type"]: r for _, r in sdf.iterrows()}
    assert by["purchase"]["skew_milli"] > 0
    assert by["purchase"]["reject_normal"]
    assert by["click"]["skew_milli"] == 0

    def replay(vals):
        u = [math.floor(v) for v in vals]
        n = len(u)
        m = math.floor(sum(u) / n)
        e = [x - m for x in u]
        s2 = sum(x * x for x in e) / n
        s3 = sum(x ** 3 for x in e) / n
        s4 = sum(x ** 4 for x in e) / n
        skew = s3 / (s2 * math.sqrt(s2))
        kurt = s4 / (s2 * s2)
        return n * (skew * skew / 6 + (kurt - 3) ** 2 / 24)

    assert abs(by["purchase"]["jb_milli"] - round(replay(skewed) * 1000)) <= 1
    assert abs(by["click"]["jb_milli"] - round(replay(symmetric) * 1000)) <= 1


def test_mcc_matches_python_replay(spark, tmp_path):
    """EV33: accuracy, macro F1 and MCC all match an independent
    python replay of the pinned argmax model."""
    d = str(tmp_path)
    classes = ("click", "error", "purchase", "signup", "view")
    rows = []
    for i in range(400):
        rows.append(
            (i, "2024-01-01 08:00:00", 1, classes[i % 5], 1.0, "{}")
        )
    _events(spark, rows).write.parquet(f"{d}/events.parquet")
    sdf = _cross_check(spark, "eval_mcc_multiclass", d, ["events"])

    def pred(eid, true_cls):
        scores = []
        for c in classes:
            s = _h60(f"cls:{eid}:{c}") % 1000000
            if c == true_cls:
                s += 250000
            scores.append(s)
        return classes[scores.index(max(scores))]

    conf = {}
    for i in range(400):
        y, yhat = classes[i % 5], pred(i, classes[i % 5])
        conf[(y, yhat)] = conf.get((y, yhat), 0) + 1
    s = sum(conf.values())
    c = sum(v for (y, yh), v in conf.items() if y == yh)
    t = {k: sum(v for (y, _), v in conf.items() if y == k) for k in classes}
    p = {k: sum(v for (_, yh), v in conf.items() if yh == k) for k in classes}
    tp = {k: conf.get((k, k), 0) for k in classes}
    spt = sum(p[k] * t[k] for k in classes)
    spp = sum(p[k] * p[k] for k in classes)
    stt = sum(t[k] * t[k] for k in classes)
    mcc = (c * s - spt) / (
        math.sqrt(s * s - spp) * math.sqrt(s * s - stt)
    )
    f1sum = sum(
        tp[k] * 2 * 1000000 // (t[k] + p[k]) for k in classes if t[k] + p[k]
    )
    kcls = sum(1 for k in classes if t[k] + p[k])
    row = sdf.iloc[0]
    assert row["n"] == s and row["n_correct"] == c
    assert row["accuracy_ppm"] == c * 1000000 // s
    assert row["macro_f1_ppm"] == f1sum // kcls
    assert abs(row["mcc_micro"] - round(mcc * 1e6)) <= 1
    # the boosted model must beat chance (200k ppm) decisively
    assert row["accuracy_ppm"] > 300000
    assert row["mcc_micro"] > 0


def test_eoq_constant_demand_zero_safety_stock(spark, tmp_path):
    """A114: constant weekly demand -> sigma 0, safety stock 0,
    reorder point = 2x weekly mean; EOQ matches the formula replay."""
    d = str(tmp_path)
    lrows = []
    # brand B1: 10 units shipped every week for 8 weeks at $2/unit
    for wk in range(8):
        day = 2 + wk * 7
        mm, dd = 1 + (day - 1) // 28, (day - 1) % 28 + 1
        lrows.append(
            (wk, 100, 1, 10.0, 20.0, 0.0, "N", "O",
             f"1995-{mm:02d}-{dd:02d} 00:00:00")
        )
    spark.createDataFrame(
        lrows,
        "l_orderkey long, l_partkey long, l_suppkey long, l_quantity double,"
        " l_extendedprice double, l_discount double, l_returnflag string,"
        " l_linestatus string, l_shipdate string",
    ).withColumn("l_shipdate", F.col("l_shipdate").cast("timestamp_ntz")).write.parquet(
        f"{d}/lineitem.parquet"
    )
    spark.createDataFrame(
        [(100, "Brand#11")], "p_partkey long, p_brand string"
    ).write.parquet(f"{d}/part.parquet")
    sdf = _cross_check(spark, "part_eoq_policy", d, ["lineitem", "part"])
    assert len(sdf) == 1
    row = sdf.iloc[0]
    assert row["safety_stock_milli"] == 0
    # weekly mean 10 units, lead 2 weeks -> ROP = 20 units
    assert row["reorder_point_milli"] == 20000
    # D = 10 units/week * 52 = 520/yr; K = $100 = 10000c; h = 0.2 * 200c
    eoq = math.sqrt(2 * 10000 * 520 / (0.2 * 200))
    assert abs(row["eoq_units_milli"] - round(eoq * 1000)) <= 1


def test_bullwhip_constant_ship_flow_filtered(spark, tmp_path):
    """A115: constant order flow + varying ship flow -> ratio 0;
    the reverse year (zero ship variance) is filtered out."""
    d = str(tmp_path)
    orows, lrows = [], []
    k = 0
    # 1995: constant daily order totals, varying ship totals
    for day in range(1, 11):
        orows.append(
            (k, 1, "F", 100.0, f"1995-01-{day:02d} 00:00:00", "1-URGENT")
        )
        lrows.append(
            (k, 1, 1, 1.0, float(10 * day), 0.0, "N", "O",
             f"1995-01-{day:02d} 00:00:00")
        )
        k += 1
    # 1996: varying order totals, constant ship totals -> filtered
    for day in range(1, 11):
        orows.append(
            (k, 1, "F", float(100 * day), f"1996-01-{day:02d} 00:00:00",
             "1-URGENT")
        )
        lrows.append(
            (k, 1, 1, 1.0, 50.0, 0.0, "N", "O",
             f"1996-01-{day:02d} 00:00:00")
        )
        k += 1
    spark.createDataFrame(
        orows,
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate string, o_orderpriority string",
    ).withColumn("o_orderdate", F.col("o_orderdate").cast("timestamp_ntz")).write.parquet(
        f"{d}/orders.parquet"
    )
    spark.createDataFrame(
        lrows,
        "l_orderkey long, l_partkey long, l_suppkey long, l_quantity double,"
        " l_extendedprice double, l_discount double, l_returnflag string,"
        " l_linestatus string, l_shipdate string",
    ).withColumn("l_shipdate", F.col("l_shipdate").cast("timestamp_ntz")).write.parquet(
        f"{d}/lineitem.parquet"
    )
    sdf = _cross_check(spark, "orders_bullwhip", d, ["orders", "lineitem"])
    assert list(sdf["yr"]) == [1995]
    row = sdf.iloc[0]
    assert row["cv2_order_micro"] == 0
    assert row["cv2_ship_micro"] > 0
    assert row["bullwhip_micro"] == 0


def test_neyman_allocation_tracks_n_sigma(spark, tmp_path):
    """A116: two equal-N strata whose sigmas differ 3:1 get a 3:1
    Neyman split while the proportional split stays 1:1."""
    d = str(tmp_path)
    rows, eid = [], 0
    for v in [10.0, 20.0] * 50:  # sigma ~ 5.025
        rows.append((eid, "2024-01-01 08:00:00", 1, "click", v, "{}"))
        eid += 1
    for v in [10.0, 40.0] * 50:  # sigma ~ 15.075 (3x)
        rows.append((eid, "2024-01-01 08:00:00", 1, "view", v, "{}"))
        eid += 1
    _events(spark, rows).write.parquet(f"{d}/events.parquet")
    sdf = _cross_check(spark, "events_neyman_allocation", d, ["events"])
    by = {r["stratum"]: r for _, r in sdf.iterrows()}
    assert by["click"]["n_proportional"] == by["view"]["n_proportional"] == 5000
    ratio = by["view"]["n_neyman"] / by["click"]["n_neyman"]
    assert 2.9 < ratio < 3.1
    assert (
        by["view"]["n_neyman"] + by["click"]["n_neyman"] <= 10000
    )  # floor division never over-allocates
