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


def test_modularity_two_triangles(spark, tmp_path):
    """GR13: two disjoint co-supplier triangles -> two communities,
    each with Q contribution 2*3/12 - (6/12)^2 = 0.25 (total Q 0.5,
    the textbook two-clique value)."""
    d = str(tmp_path)
    lrows = []
    okey = 0
    for tri in ((1, 2, 3), (4, 5, 6)):
        for a, b in ((tri[0], tri[1]), (tri[0], tri[2]), (tri[1], tri[2])):
            for _ in range(2):  # edge rule needs >= 2 shared orders
                okey += 1
                for s in (a, b):
                    lrows.append(
                        (okey, 1, s, 1.0, 1.0, 0.0, "N", "O",
                         "1995-03-01 00:00:00")
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
        [(s, 1) for s in range(1, 7)], "s_suppkey long, s_nationkey long"
    ).write.parquet(f"{d}/supplier.parquet")
    sdf = _cross_check(spark, "graph_modularity", d, ["lineitem", "supplier"])
    assert list(sdf["community"]) == [1, 4]
    assert list(sdf["n_members"]) == [3, 3]
    assert list(sdf["intra_edges"]) == [3, 3]
    assert list(sdf["degree_sum"]) == [6, 6]
    assert list(sdf["q_contrib_micro"]) == [250000, 250000]


def test_err_matches_python_replay(spark, tmp_path):
    """EV34: per-query ERR@10 matches an independent python replay of
    the pinned grade/noise hashes and the cascade fold."""
    d = str(tmp_path)
    n_docs = 40
    rows = [(i, "text %d" % i, "en", "web", 10) for i in range(n_docs)]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string,"
        " n_chars long"
    ).write.parquet(f"{d}/documents.parquet")
    sdf = _cross_check(spark, "eval_err_at_k", d, ["documents"])
    assert len(sdf) == 20
    for q in (0, 7, 19):
        scored = []
        for doc in range(n_docs):
            g = max(0, _h60(f"errg:{q}:{doc}") % 16 - 12)
            noise = _h60(f"errs:{q}:{doc}") % 262144
            scored.append((-(g * 262144 + noise), doc, g))
        scored.sort()
        top = [g for _, _, g in scored[:10]]
        t_run, d_run, s = 1, 1, 0
        for r, g in enumerate(top, start=1):
            num = (1 << g) - 1
            d_run *= 8
            s += round(num * t_run / (r * d_run) * 1e9)
            t_run *= 8 - num
        row = sdf[sdf["query_id"] == q].iloc[0]
        assert row["n_ranked"] == 10
        assert row["err_nano"] == s


def test_gtest_exact_independence_is_zero(spark, tmp_path):
    """A117: margins exactly proportional -> every cell term is ln(1)
    = 0, G = 0, no rejection."""
    d = str(tmp_path)
    rows, eid = [], 0
    # Mon 2024-01-01 (weekday), Sat 2024-01-06 (weekend)
    for etype, wd, we in (("click", 40, 10), ("view", 80, 20)):
        for _ in range(wd):
            rows.append((eid, "2024-01-01 08:00:00", 1, etype, 1.0, "{}"))
            eid += 1
        for _ in range(we):
            rows.append((eid, "2024-01-06 08:00:00", 1, etype, 1.0, "{}"))
            eid += 1
    _events(spark, rows).write.parquet(f"{d}/events.parquet")
    sdf = _cross_check(spark, "events_gtest", d, ["events"])
    row = sdf.iloc[0]
    assert row["n"] == 150
    assert row["g_micro"] == 0
    assert row["df"] == 1
    assert not row["reject_independence"]


def test_gk_gamma_perfect_monotone(spark, tmp_path):
    """A118: priority rising in lockstep with value quartile -> gamma
    and Somers' D both exactly 1."""
    d = str(tmp_path)
    orows = []
    prios = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED"]
    for i in range(8):
        orows.append(
            (i + 1, 1, "F", float(10 * (i + 1)),
             "1995-03-01 00:00:00", prios[i // 2])
        )
    spark.createDataFrame(
        orows,
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate string, o_orderpriority string",
    ).withColumn("o_orderdate", F.col("o_orderdate").cast("timestamp_ntz")).write.parquet(
        f"{d}/orders.parquet"
    )
    sdf = _cross_check(spark, "orders_gk_gamma", d, ["orders"])
    row = sdf.iloc[0]
    assert row["n_orders"] == 8
    assert row["d_pairs"] == 0
    assert row["gamma_micro"] == 1000000
    assert row["somers_d_micro"] == 1000000


def test_pinball_constant_shift(spark, tmp_path):
    """EV35: train days (even parity) at 5 events, test days at 7 ->
    pred 5 for every quantile; mean loss milli = 200/1000/1800."""
    d = str(tmp_path)
    rows, eid = [], 0
    for day in range(1, 15):
        # datediff(1970-01-01 -> 2024-01-d) = 19722 + d: parity of d
        count = 5 if day % 2 == 0 else 7
        for j in range(count):
            rows.append(
                (eid, f"2024-01-{day:02d} {8 + j:02d}:00:00", 1,
                 "purchase", 1.0, "{}")
            )
            eid += 1
    _events(spark, rows).write.parquet(f"{d}/events.parquet")
    sdf = _cross_check(spark, "eval_pinball_loss", d, ["events"])
    assert len(sdf) == 3
    by = {r["q_tenths"]: r for _, r in sdf.iterrows()}
    for qt, milli in ((1, 200), (5, 1000), (9, 1800)):
        assert by[qt]["pred"] == 5
        assert by[qt]["n_test_days"] == 7
        assert by[qt]["mean_loss_milli"] == milli


def test_lorenz_deciles_linear_values(spark, tmp_path):
    """A119: ten orders valued 1..10 -> one per decile; cumulative
    value share follows k(k+1)/110 exactly."""
    d = str(tmp_path)
    orows = [
        (i, 1, "F", float(i), "1995-03-01 00:00:00", "1-URGENT")
        for i in range(1, 11)
    ]
    spark.createDataFrame(
        orows,
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate string, o_orderpriority string",
    ).withColumn("o_orderdate", F.col("o_orderdate").cast("timestamp_ntz")).write.parquet(
        f"{d}/orders.parquet"
    )
    sdf = _cross_check(spark, "orders_lorenz_deciles", d, ["orders"])
    assert list(sdf["decile"]) == list(range(1, 11))
    assert list(sdf["n_orders"]) == [1] * 10
    for k in range(1, 11):
        row = sdf[sdf["decile"] == k].iloc[0]
        assert row["cum_pop_ppm"] == k * 1000000 // 10
        assert row["cum_value_ppm"] == k * (k + 1) // 2 * 1000000 // 55
    assert sdf["lorenz_gap_ppm"].max() > 0


def test_stream_first_touch_dedups_keys(spark, tmp_path):
    """ST23: duplicate (user, type) events — including full file
    redelivery — collapse to one surviving row per key."""
    d = str(tmp_path)
    rows = []
    eid = 0
    for user in (1, 2):
        for etype in ("click", "view"):
            for rep in range(3):  # in-key duplicates
                rows.append(
                    (eid, f"2024-01-0{rep + 1} 08:00:00", user, etype,
                     1.0, "{}")
                )
                eid += 1
    rows.append((eid, "2024-01-01 09:00:00", 3, "click", 1.0, "{}"))
    _events(spark, rows).write.parquet(f"{d}/events.parquet")
    sdf = _cross_check(spark, "stream_first_touch", d, ["events"])
    by = {r["event_type"]: r["n_first_touch"] for _, r in sdf.iterrows()}
    assert by == {"click": 3, "view": 2}


def test_hurst_trending_series_is_persistent(spark, tmp_path):
    """A120: a strongly trending series is persistent (H well above
    0.5); the w=4 average R/S matches a python replay."""
    d = str(tmp_path)
    rows, eid = [], 0
    counts = [3 * t for t in range(1, 33)]  # 32 days, strong trend
    for day, c in enumerate(counts, start=1):
        mm, dd = 1 + (day - 1) // 28, (day - 1) % 28 + 1
        for _ in range(c):
            rows.append(
                (eid, f"2024-{mm:02d}-{dd:02d} 08:00:00", 1, "purchase",
                 1.0, "{}")
            )
            eid += 1
    _events(spark, rows).write.parquet(f"{d}/events.parquet")
    sdf = _cross_check(spark, "events_hurst_rs", d, ["events"])
    assert list(sdf["w"]) == [4, 8, 16]
    assert sdf.iloc[0]["hurst_milli"] > 800  # persistent

    # python replay for w=4
    w = 4
    rs_micro = []
    for b0 in range(0, 32, w):
        blk = counts[b0:b0 + w]
        m = sum(blk) // w
        dev = [x - m for x in blk]
        cum, cums = 0, []
        for dv in dev:
            cum += dv
            cums.append(cum)
        rng = max(cums) - min(cums)
        s2 = sum(dv * dv for dv in dev)
        if s2 > 0:
            rs_micro.append(round(rng / math.sqrt(s2 / w) * 1e6))
    expect = sum(rs_micro) // len(rs_micro)
    assert sdf.iloc[0]["avg_rs_micro"] == expect
    assert sdf.iloc[0]["n_blocks"] == len(rs_micro)


def test_ece_consistent_with_calibration_bins(spark, tmp_path):
    """EV36: ECE/MCE equal the weighted/max per-bin gaps of the EV3
    calibration table on the same fixture."""
    d = str(tmp_path)
    rows = []
    for i in range(200):
        rows.append((i, [float(i % 17) / 17.0, float(i % 5) / 5.0], i % 3))
    spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label long"
    ).write.parquet(f"{d}/embeddings.parquet")
    sdf = _cross_check(spark, "eval_ece", d, ["embeddings"])
    from bytesprocessor_spark.queries import QUERIES

    bins = QUERIES["eval_calibration"](spark, d).toPandas()
    total = int(bins["n"].sum())
    ece = int((bins["n"] * bins["gap_micro"]).sum()) // total
    row = sdf.iloc[0]
    assert row["n"] == total
    assert row["ece_micro"] == ece
    assert row["mce_micro"] == int(bins["gap_micro"].max())
    assert row["n_bins_used"] == len(bins)


def test_littles_law_exact_within_month(spark, tmp_path):
    """A121: two orders fully contained in one month -> the ratio is
    exactly 1 (sum of open-days equals sum of durations)."""
    d = str(tmp_path)
    orows = [
        (1, 1, "F", 10.0, "1995-03-01 00:00:00", "1-URGENT"),
        (2, 1, "F", 10.0, "1995-03-02 00:00:00", "1-URGENT"),
    ]
    lrows = [
        (1, 10, 1, 1.0, 1.0, 0.0, "N", "O", "1995-03-03 00:00:00"),
        (2, 11, 1, 1.0, 1.0, 0.0, "N", "O", "1995-03-06 00:00:00"),
    ]
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
    sdf = _cross_check(spark, "orders_littles_law", d, ["orders", "lineitem"])
    assert len(sdf) == 1
    row = sdf.iloc[0]
    assert row["month"] == "1995-03"
    assert row["n_arrivals"] == 2
    assert row["n_days"] == 6
    # open: 1,2,2,1,1,1 = 8 open-days; durations 3 + 5 = 8
    assert row["l_milli"] == 8 * 1000 // 6
    assert row["w_milli"] == 4000
    assert row["littles_ratio_ppm"] == 1000000


def test_asof_nearest_tolerance_and_ties(spark, tmp_path):
    """J15: nearest error within 1h wins with (|dt|, time, id)
    tiebreak; out-of-tolerance purchases drop."""
    d = str(tmp_path)
    rows = [
        # user 1: purchase 10:00; errors 09:30 / 10:20 / 12:00
        (1, "2024-01-01 10:00:00", 1, "purchase", 1.0, "{}"),
        (2, "2024-01-01 09:30:00", 1, "error", 1.0, "{}"),
        (3, "2024-01-01 10:20:00", 1, "error", 1.0, "{}"),
        (4, "2024-01-01 12:00:00", 1, "error", 1.0, "{}"),
        # user 2: purchase 10:00; tie at +-20 min -> earlier error wins
        (5, "2024-01-01 10:00:00", 2, "purchase", 1.0, "{}"),
        (6, "2024-01-01 09:40:00", 2, "error", 1.0, "{}"),
        (7, "2024-01-01 10:20:00", 2, "error", 1.0, "{}"),
        # user 3: purchase with no error inside the hour -> unmatched
        (8, "2024-01-01 10:00:00", 3, "purchase", 1.0, "{}"),
        (9, "2024-01-01 11:30:00", 3, "error", 1.0, "{}"),
    ]
    _events(spark, rows).write.parquet(f"{d}/events.parquet")
    sdf = _cross_check(spark, "asof_nearest_events", d, ["events"])
    by = {r["minute_bucket"]: r for _, r in sdf.iterrows()}
    # user 1 matches error 3 at +20 min; user 2 matches error 6 at -20
    assert by[20]["n_pairs"] == 1 and by[20]["sum_err_ids"] == 3
    assert by[-20]["n_pairs"] == 1 and by[-20]["sum_err_ids"] == 6
    assert sdf["n_pairs"].sum() == 2  # user 3 unmatched


def test_user_streaks_islands(spark, tmp_path):
    """W22: days {1,2,3,5,6} -> longest 3 with 2 streaks; a single
    active day -> longest 1."""
    d = str(tmp_path)
    rows, eid = [], 0
    for day in (1, 2, 3, 5, 6):
        rows.append((eid, f"2024-01-{day:02d} 08:00:00", 1, "click", 1.0, "{}"))
        eid += 1
        rows.append((eid, f"2024-01-{day:02d} 09:00:00", 1, "view", 1.0, "{}"))
        eid += 1  # same-day second event must not split streaks
    rows.append((eid, "2024-01-01 08:00:00", 2, "click", 1.0, "{}"))
    _events(spark, rows).write.parquet(f"{d}/events.parquet")
    sdf = _cross_check(spark, "events_user_streaks", d, ["events"])
    by = {r["streak_days"]: r for _, r in sdf.iterrows()}
    assert by[3]["n_users"] == 1
    assert by[3]["sum_active_days"] == 5
    assert by[3]["sum_streaks"] == 2
    assert by[1]["n_users"] == 1


def test_range_search_membership(spark, tmp_path):
    """L3o: constructed vectors give a known neighbor set per query
    (ids and max similarity pinned)."""
    d = str(tmp_path)
    rows = [
        (0, [1.0, 0.0], 0),   # query
        (10, [0.9, 0.1], 0),  # sim ~0.994 -> neighbor
        (11, [0.5, 0.5], 0),  # sim ~0.707 -> neighbor
        (12, [0.0, 1.0], 0),  # sim 0 -> not a neighbor
        (13, [-1.0, 0.1], 0),  # negative sim -> not a neighbor
    ]
    spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label long"
    ).write.parquet(f"{d}/embeddings.parquet")
    sdf = _cross_check(spark, "similarity_range_search", d, ["embeddings"])
    assert len(sdf) == 1
    row = sdf.iloc[0]
    assert row["query_id"] == 0
    assert row["n_neighbors"] == 2
    assert row["sum_vec_ids"] == 21
    assert abs(row["max_sim_micro"] - round(0.9 / math.sqrt(0.81 + 0.01) * 1e6)) <= 1


def test_decayed_engagement_pinned_factors(spark, tmp_path):
    """A122: events at ages 0, 3 and 7 days score 1e6 + 742997 +
    500000 exactly (pinned factors, integer halving)."""
    d = str(tmp_path)
    rows = [
        (1, "2024-01-08 08:00:00", 1, "click", 1.0, "{}"),  # ref day, age 0
        (2, "2024-01-05 08:00:00", 1, "click", 1.0, "{}"),  # age 3
        (3, "2024-01-01 08:00:00", 1, "click", 1.0, "{}"),  # age 7
    ]
    _events(spark, rows).write.parquet(f"{d}/events.parquet")
    sdf = _cross_check(spark, "events_decayed_engagement", d, ["events"])
    assert len(sdf) == 1
    row = sdf.iloc[0]
    score = 1000000 + 742997 + 500000
    assert row["n_users"] == 1
    assert row["sum_score_micro"] == score
    assert row["bucket"] == math.floor(math.log2(score))


def test_ipf_raking_matches_margins(spark, tmp_path):
    """A123: after 3 IPF rounds the raked weights reproduce the full
    table's row margins to within rounding (column step ran last, so
    column sums match even tighter)."""
    d = str(tmp_path)
    orows = []
    prios = ["1-URGENT", "2-HIGH"]
    stats = ["F", "O"]
    k = 0
    for i, prio in enumerate(prios):
        for j, st in enumerate(stats):
            # full-table cell sizes 400/200/200/200; the hash sample
            # picks whatever ~10% subset it picks (large enough that
            # every cell certainly lands sample rows) — IPF must
            # re-balance it
            n = 400 if (i, j) == (0, 0) else 200
            for _ in range(n):
                k += 1
                orows.append(
                    (k, 1, st, 100.0, "1995-03-01 00:00:00", prio)
                )
    spark.createDataFrame(
        orows,
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate string, o_orderpriority string",
    ).withColumn("o_orderdate", F.col("o_orderdate").cast("timestamp_ntz")).write.parquet(
        f"{d}/orders.parquet"
    )
    sdf = _cross_check(spark, "orders_ipf_raking", d, ["orders"])
    assert len(sdf) == 4
    # column sums (last step) match targets to < 0.5% relative
    for st in stats:
        sub = sdf[sdf["status"] == st]
        target = int(sub["col_target"].iloc[0]) * 1000000
        got = int(sub["w_raked_micro"].sum())
        assert abs(got - target) <= target * 0.005
    # row sums close after the final column step too
    for prio in prios:
        sub = sdf[sdf["priority"] == prio]
        target = int(sub["row_target"].iloc[0]) * 1000000
        got = int(sub["w_raked_micro"].sum())
        assert abs(got - target) <= target * 0.05


def test_price_elasticity_planted_slope(spark, tmp_path):
    """A124: parts constructed on an exact log-log line with slope -2
    recover elasticity -2.0 and r^2 ~ 1."""
    d = str(tmp_path)
    lrows = []
    k = 0
    # part p: unit price 2^p, total qty 2^(20 - 2p) -> ln q = c - 2 ln p
    for part in range(1, 7):
        price = float(2 ** part)
        qty = float(2 ** (20 - 2 * part))
        k += 1
        lrows.append(
            (k, part, 1, qty, price * qty, 0.0, "N", "O",
             "1995-03-01 00:00:00")
        )
    spark.createDataFrame(
        lrows,
        "l_orderkey long, l_partkey long, l_suppkey long, l_quantity double,"
        " l_extendedprice double, l_discount double, l_returnflag string,"
        " l_linestatus string, l_shipdate string",
    ).withColumn("l_shipdate", F.col("l_shipdate").cast("timestamp_ntz")).write.parquet(
        f"{d}/lineitem.parquet"
    )
    sdf = _cross_check(spark, "orders_price_elasticity", d, ["lineitem"])
    row = sdf.iloc[0]
    assert row["n_parts"] == 6
    assert abs(row["elasticity_milli"] + 2000) <= 2
    assert row["r2_ppm"] >= 999990


def test_cyclic_encoding_neighbors(spark, tmp_path):
    """FE8: December and January encodings are adjacent on the circle
    (distance 2*sin(pi/12) in micro units), and the pinned literals
    sit on the unit circle."""
    d = str(tmp_path)
    orows = []
    for m in range(1, 13):
        orows.append(
            (m, 1, "F", float(m), f"1995-{m:02d}-05 00:00:00", "1-URGENT")
        )
    spark.createDataFrame(
        orows,
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate string, o_orderpriority string",
    ).withColumn("o_orderdate", F.col("o_orderdate").cast("timestamp_ntz")).write.parquet(
        f"{d}/orders.parquet"
    )
    sdf = _cross_check(spark, "orders_cyclic_encoding", d, ["orders"])
    assert list(sdf["month"]) == list(range(1, 13))
    by = {r["month"]: (r["month_sin_micro"], r["month_cos_micro"])
          for _, r in sdf.iterrows()}
    for m in range(1, 13):
        s_, c_ = by[m]
        assert abs(s_ * s_ + c_ * c_ - 10 ** 12) < 2e9  # on the circle
    dec, jan = by[12], by[1]
    dist = math.dist(dec, jan)
    assert abs(dist - 2 * math.sin(math.pi / 12) * 1e6) < 2000
    # ordinal encoding would put them 11 "months" apart; cyclic: 1
    jun = by[6]
    assert math.dist(jan, jun) > dist


def test_katz_star_center_dominates(spark, tmp_path):
    """GR14: on a 5-node star the hub's Katz score is exactly
    1 + 4a + 4a^2... in integer micro arithmetic — replayed in
    python; hub ranks first."""
    d = str(tmp_path)
    lrows = []
    okey = 0
    # star: supplier 1 paired with 2..5 (2 shared orders each)
    for leaf in (2, 3, 4, 5):
        for _ in range(2):
            okey += 1
            for s in (1, leaf):
                lrows.append(
                    (okey, 1, s, 1.0, 1.0, 0.0, "N", "O",
                     "1995-03-01 00:00:00")
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
        [(s, 1) for s in range(1, 6)], "s_suppkey long, s_nationkey long"
    ).write.parquet(f"{d}/supplier.parquet")
    sdf = _cross_check(spark, "graph_katz_centrality", d,
                       ["lineitem", "supplier"])
    # python replay of the integer trajectory
    adj = {1: [2, 3, 4, 5], 2: [1], 3: [1], 4: [1], 5: [1]}
    x = {z: 1000000 for z in adj}
    for _ in range(3):
        x = {z: 1000000 + sum(x[n] for n in adj[z]) // 10 for z in adj}
    top = sdf.iloc[0]
    assert top["node"] == 1
    assert top["katz_micro"] == x[1]
    assert top["degree"] == 4
    leaf_row = sdf[sdf["node"] == 2].iloc[0]
    assert leaf_row["katz_micro"] == x[2]
    assert x[1] > x[2]


def test_time_to_second_hand_case(spark, tmp_path):
    """W23: gaps of 100s and 400s -> median disc picks 100, P90 400,
    mean 250; single-purchase users excluded."""
    d = str(tmp_path)
    rows = [
        (1, "2024-01-01 10:00:00", 1, "purchase", 1.0, "{}"),
        (2, "2024-01-01 10:01:40", 1, "purchase", 1.0, "{}"),  # +100 s
        (3, "2024-01-01 10:05:00", 1, "purchase", 1.0, "{}"),  # third: ignored
        (4, "2024-01-01 10:00:00", 2, "purchase", 1.0, "{}"),
        (5, "2024-01-01 10:06:40", 2, "purchase", 1.0, "{}"),  # +400 s
        (6, "2024-01-01 10:00:00", 3, "purchase", 1.0, "{}"),  # only one
        (7, "2024-01-01 10:00:00", 4, "click", 1.0, "{}"),
    ]
    _events(spark, rows).write.parquet(f"{d}/events.parquet")
    sdf = _cross_check(spark, "events_time_to_second", d, ["events"])
    row = sdf.iloc[0]
    assert row["n_users"] == 2
    assert row["p25_s"] == 100
    assert row["p50_s"] == 100
    assert row["p90_s"] == 400
    assert row["mean_milli_s"] == 250000


def test_risk_pooling_anticorrelated_is_full(spark, tmp_path):
    """A126: two perfectly anti-correlated brands pool to a constant
    series -> sigma_pooled 0, benefit exactly 1e6 ppm; individual
    sigmas match a python replay."""
    d = str(tmp_path)
    lrows = []
    k = 0
    demands = {"Brand#11": [10.0, 20.0, 10.0, 20.0],
               "Brand#12": [20.0, 10.0, 20.0, 10.0]}
    pk = {"Brand#11": 1, "Brand#12": 2}
    for brand, qs in demands.items():
        for wk2, q in enumerate(qs):
            day = 2 + wk2 * 7
            k += 1
            lrows.append(
                (k, pk[brand], 1, q, q * 2, 0.0, "N", "O",
                 f"1995-01-{day:02d} 00:00:00")
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
        [(1, "Brand#11"), (2, "Brand#12")], "p_partkey long, p_brand string"
    ).write.parquet(f"{d}/part.parquet")
    sdf = _cross_check(spark, "part_risk_pooling", d, ["lineitem", "part"])
    assert len(sdf) == 1
    row = sdf.iloc[0]
    assert row["mfgr"] == "1"
    assert row["n_brands"] == 2 and row["n_weeks"] == 4
    assert row["sigma_pooled_milli"] == 0
    # each brand: d = [1000,2000,1000,2000] cents
    import statistics

    sig = round(statistics.stdev([1000, 2000, 1000, 2000]) * 1000)
    assert row["sigma_sum_milli"] == 2 * sig
    assert row["pooling_benefit_ppm"] == 1000000


def test_changepoint_tree_two_shifts(spark, tmp_path):
    """A127: a series with two level shifts (days 1-10 at 5/day,
    11-20 at 50/day, 21-30 at 5/day) splits at both boundaries across
    the two levels."""
    d = str(tmp_path)
    rows, eid = [], 0
    for day in range(1, 31):
        c = 50 if 11 <= day <= 20 else 5
        for _ in range(c):
            rows.append(
                (eid, f"2024-01-{day:02d} 08:00:00", 1, "purchase", 1.0, "{}")
            )
            eid += 1
    _events(spark, rows).write.parquet(f"{d}/events.parquet")
    sdf = _cross_check(spark, "events_changepoint_tree", d, ["events"])
    assert len(sdf) == 3
    days = {r["segment"]: r["split_day"] for _, r in sdf.iterrows()}
    # level 0 catches one boundary; level 1 catches the other inside
    # its half — between them both shift days appear
    found = set(days.values())
    assert "2024-01-10" in found or "2024-01-20" in found
    assert {"2024-01-10", "2024-01-20"} <= {
        r["split_day"] for _, r in sdf.iterrows()
    }


def test_wilcoxon_b_better_and_replay(spark, tmp_path):
    """EV37: the constructed model B dominates; W+ matches an
    independent python replay of the rank arithmetic."""
    d = str(tmp_path)
    n_rows = 300
    rows = [(i, [0.0], i % 2) for i in range(n_rows)]
    spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label long"
    ).write.parquet(f"{d}/embeddings.parquet")
    sdf = _cross_check(spark, "eval_wilcoxon_signed_rank", d, ["embeddings"])
    row = sdf.iloc[0]
    assert row["model_b_better"]
    assert row["z_milli"] > 1960

    diffs = []
    for i in range(n_rows):
        y = i % 2
        pa = _h60(f"wxa:{i}") % 1000001
        pb = _h60(f"wxb:{i}") % 500001 + y * 500000
        diff = abs(y * 1000000 - pa) - abs(y * 1000000 - pb)
        if diff != 0:
            diffs.append((abs(diff), i, diff))
    diffs.sort()
    from collections import defaultdict

    groups = defaultdict(lambda: [0, 0, 0])  # cnt, sum_rn, n_pos
    for rn, (absd, _, diff) in enumerate(diffs, start=1):
        g = groups[absd]
        g[0] += 1
        g[1] += rn
        g[2] += 1 if diff > 0 else 0
    wp = sum(npos * (srn * 1000000 // cnt) for cnt, srn, npos in groups.values())
    assert row["n_pairs"] == len(diffs)
    assert row["w_plus_micro"] == float(wp)


def test_permutation_test_replay(spark, tmp_path):
    """EV38: T_obs, the extreme count and the p-value all match an
    independent python replay of the md5-seeded sign flips; the
    constructed model difference is significant."""
    d = str(tmp_path)
    n_rows = 200
    rows = [(i, [0.0], i % 2) for i in range(n_rows)]
    spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label long"
    ).write.parquet(f"{d}/embeddings.parquet")
    sdf = _cross_check(spark, "eval_permutation_test", d, ["embeddings"])
    row = sdf.iloc[0]

    diffs = []
    for i in range(n_rows):
        y = i % 2
        pa = _h60(f"wxa:{i}") % 1000001
        pb = _h60(f"wxb:{i}") % 500001 + y * 500000
        diffs.append((i, abs(y * 1000000 - pa) - abs(y * 1000000 - pb)))
    t_obs = sum(dv for _, dv in diffs)
    n_ext = 0
    for k in range(200):
        tk = sum(
            dv if _h60(f"perm:{k}:{i}") % 2 == 0 else -dv for i, dv in diffs
        )
        if abs(tk) >= abs(t_obs):
            n_ext += 1
    assert row["t_obs"] == t_obs
    assert row["n_extreme"] == n_ext
    assert row["p_milli"] == (n_ext + 1) * 1000 // 201
    assert row["p_milli"] < 50  # B is decisively better
