"""Round-9 operator properties: hand cases + engine/oracle
cross-checks on synthetic fixtures (the test_r8b_props harness)."""

from __future__ import annotations

import datetime
import importlib.util
import math
from pathlib import Path

import duckdb  # noqa: F401 (the harness uses it)
from pyspark.sql import functions as F

_spec = importlib.util.spec_from_file_location(
    "check_oracle_r9",
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


def test_page_hinkley_flags_level_shift(spark, tmp_path):
    """A104: 10 quiet days at ~$1 means then 5 days at ~$50 — PH must
    stay under lambda through the quiet phase and flag after the
    shift; both engines agree exactly."""
    d = str(tmp_path)
    rows, eid = [], 0
    for day in range(1, 16):
        val = 1.0 if day <= 10 else 50.0
        for j in range(4):
            rows.append(
                (eid, f"2024-01-{day:02d} 0{j + 1}:00:00", 1, "purchase", val, "{}")
            )
            eid += 1
    _events(spark, rows).write.parquet(f"{d}/events.parquet")
    sdf = _cross_check(spark, "events_page_hinkley", d, ["events"])
    flags = list(sdf.sort_values("day")["drift_flag"])
    assert not any(flags[:10])
    assert flags[-1]  # the shift is eventually flagged
    # PH is nondecreasing through a pure upward shift tail
    ph = list(sdf.sort_values("day")["ph_milli"])
    assert ph[-1] > ph[9]


def test_cv2_adi_quadrants(spark, tmp_path):
    """A103: four constructed parts land in the four quadrants —
    steady-weekly/constant (smooth), sparse/constant (intermittent),
    weekly/wild (erratic), sparse/wild (lumpy)."""
    d = str(tmp_path)
    lrows = []

    def add(part, weeks, qtys):
        for i, (w, q) in enumerate(zip(weeks, qtys)):
            ship = datetime.date(1995, 1, 2) + datetime.timedelta(days=7 * w)
            lrows.append(
                (
                    len(lrows),
                    part,
                    1,
                    float(q),
                    1.0,
                    0.0,
                    "N",
                    "O",
                    f"{ship} 00:00:00",
                )
            )

    add(1, range(8), [10] * 8)                 # ADI=1, constant -> smooth
    add(2, [0, 4, 8, 12], [10] * 4)            # ADI=4, constant -> intermittent
    add(3, range(8), [1, 90, 1, 90, 1, 90, 1, 90])   # ADI=1, wild -> erratic
    add(4, [0, 4, 8, 12], [1, 90, 1, 90])      # ADI=4, wild -> lumpy
    spark.createDataFrame(
        lrows,
        "l_orderkey long, l_partkey long, l_suppkey long, l_quantity double,"
        " l_extendedprice double, l_discount double, l_returnflag string,"
        " l_linestatus string, l_shipdate string",
    ).withColumn("l_shipdate", F.col("l_shipdate").cast("timestamp_ntz")).write.parquet(
        f"{d}/lineitem.parquet"
    )
    sdf = _cross_check(spark, "part_cv2_adi_classes", d, ["lineitem"])
    got = {r["demand_class"]: r["n_parts"] for _, r in sdf.iterrows()}
    assert got == {"smooth": 1, "intermittent": 1, "erratic": 1, "lumpy": 1}


def test_theil_uniform_is_zero(spark, tmp_path):
    """A101: identical order values within and across groups give a
    zero within-index and zero between-terms (up to the milli-nat
    per-row ln quantization, < 600 micro)."""
    d = str(tmp_path)
    rows = [
        (i, 1, "F", 100.0, "1995-01-01 00:00:00", p)
        for i, p in enumerate(
            ["1-URGENT", "1-URGENT", "2-HIGH", "2-HIGH", "5-LOW", "5-LOW"]
        )
    ]
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate string, o_orderpriority string",
    ).withColumn("o_orderdate", F.col("o_orderdate").cast("timestamp_ntz")).write.parquet(
        f"{d}/orders.parquet"
    )
    sdf = _cross_check(spark, "orders_theil_index", d, ["orders"])
    assert (sdf["theil_within_micro"].abs() <= 600).all()
    assert (sdf["between_term_micro"].abs() <= 600).all()


def test_topk_accuracy_monotone_and_replay(spark, tmp_path):
    """EV29: accuracy is nondecreasing in k, and the k=1 count matches
    a python replay of the pinned scoring rule."""
    import hashlib

    d = str(tmp_path)
    types = ["click", "error", "purchase", "signup", "view"]
    rows = [
        (i, "2024-01-05 10:00:00", i % 7, types[i % 5], 1.0, "{}")
        for i in range(200)
    ]
    _events(spark, rows).write.parquet(f"{d}/events.parquet")
    sdf = _cross_check(spark, "eval_topk_accuracy", d, ["events"])
    acc = list(sdf.sort_values("k")["accuracy_ppm"])
    assert acc[0] <= acc[1] <= acc[2]

    def h60(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    hits1 = 0
    for i in range(200):
        true = types[i % 5]
        st = h60(f"cls:{i}:{true}") % 1000000 + 250000
        best = True
        for c in types:
            if c == true:
                continue
            sc = h60(f"cls:{i}:{c}") % 1000000
            if sc > st or (sc == st and c < true):
                best = False
        hits1 += best
    assert int(sdf[sdf["k"] == 1].iloc[0]["n_hits"]) == hits1


def test_burstiness_periodic_vs_bursty(spark, tmp_path):
    """A105: a perfectly periodic user lands in the B=-1 bucket (0);
    a heavy-tailed user lands in a positive-B bucket (>=10)."""
    d = str(tmp_path)
    rows, eid = [], 0
    for k in range(20):  # periodic: every 60 min exactly
        rows.append((eid, f"2024-01-01 {k:02d}:00:00", 1, "click", 1.0, "{}"))
        eid += 1
    # bursty: tight cluster then huge gaps
    mins = [0, 1, 2, 3, 4, 2000, 2001, 2002, 2003, 12000]
    for m in mins:
        rows.append(
            (
                eid,
                f"2024-01-{10 + m // 1440:02d} {(m % 1440) // 60:02d}:{m % 60:02d}:00",
                2,
                "click",
                1.0,
                "{}",
            )
        )
        eid += 1
    _events(spark, rows).write.parquet(f"{d}/events.parquet")
    sdf = _cross_check(spark, "events_user_burstiness", d, ["events"])
    buckets = {int(r["bucket"]): int(r["n_users"]) for _, r in sdf.iterrows()}
    assert buckets.get(0, 0) == 1  # sigma=0 -> B=-1 -> bucket 0
    assert sum(n for b, n in buckets.items() if b >= 10) == 1


def test_spiegelhalter_z_perfect_calibration_small(spark, tmp_path):
    """EV28: with y drawn AS the deterministic proxy's own Bernoulli
    (y=1 iff a second independent hash falls under pm), Z should be
    modest — and both engines must agree exactly on the quantized
    statistic (the cross-check is the real assertion)."""
    d = str(tmp_path)
    import hashlib

    def h60(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    rows = []
    for i in range(400):
        pm = h60(f"p:{i}") % 1000001
        y = 1 if (h60(f"draw:{i}") % 1000000) < pm else 0
        # label 0 encodes positive in the query's convention
        rows.append((i, [0.0], 0 if y else 1))
    spark.createDataFrame(rows, "vec_id long, embedding array<double>, label long").write.parquet(
        f"{d}/embeddings.parquet"
    )
    sdf = _cross_check(spark, "eval_spiegelhalter_z", d, ["embeddings"])
    z = sdf.iloc[0]["z_micro"]
    assert abs(z) < 4_000_000  # |Z| < 4 for a calibrated draw of n=400


def test_jaccard_linkpred_hand_graph(spark, tmp_path):
    """GR12: a 4-supplier hand graph — suppliers 1 and 2 share both
    neighbors {3, 4} (J = 2/(2+2-2) = 1.0); check the top row."""
    d = str(tmp_path)
    lrows = []
    # orders: (o, suppliers) — 1-3, 1-4, 2-3, 2-4 edges via co-orders
    co = [(100, 1, 3), (101, 1, 4), (102, 2, 3), (103, 2, 4)]
    for o, s1, s2 in co:
        for s in (s1, s2):
            lrows.append((o, 1, s, 1.0, 1.0, 0.0, "N", "O", "1995-06-01 00:00:00"))
    spark.createDataFrame(
        lrows,
        "l_orderkey long, l_partkey long, l_suppkey long, l_quantity double,"
        " l_extendedprice double, l_discount double, l_returnflag string,"
        " l_linestatus string, l_shipdate string",
    ).withColumn("l_shipdate", F.col("l_shipdate").cast("timestamp_ntz")).write.parquet(
        f"{d}/lineitem.parquet"
    )
    sdf = _cross_check(spark, "graph_jaccard_linkpred", d, ["lineitem"])
    top = sdf.iloc[0]
    assert (top["a"], top["b"]) == (1, 2) and top["jaccard_ppm"] == 1000000


def test_delong_and_ap_match_python_replay(spark, tmp_path):
    """EV30/EV31: AUC, DeLong SE and average precision all match an
    independent python replay of the pinned score proxy."""
    import hashlib

    d = str(tmp_path)

    def h60(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    n_rows = 300
    rows = [(i, [0.0], i % 3) for i in range(n_rows)]  # label 0 = positive
    spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label long"
    ).write.parquet(f"{d}/embeddings.parquet")
    sdf = _cross_check(spark, "eval_auc_delong_ci", d, ["embeddings"])
    apdf = _cross_check(spark, "eval_average_precision", d, ["embeddings"])

    scored = sorted(
        ((h60(f"dl:{i}") % 1000000, 1 if i % 3 == 0 else 0) for i in range(n_rows))
    )
    pos = [s for s, y in scored if y]
    neg = [s for s, y in scored if not y]
    P, N = len(pos), len(neg)
    # placement values
    v10 = []
    for s in pos:
        below = sum(1 for t in neg if t < s)
        ties = sum(1 for t in neg if t == s)
        v10.append((below + 0.5 * ties) / N)
    v01 = []
    for s in neg:
        above = sum(1 for t in pos if t > s)
        ties = sum(1 for t in pos if t == s)
        v01.append((above + 0.5 * ties) / P)
    auc = sum(v10) / P
    s10 = sum((v - auc) ** 2 for v in v10) / (P - 1)
    s01 = sum((v - auc) ** 2 for v in v01) / (N - 1)
    se = math.sqrt(s10 / P + s01 / N)
    row = sdf.iloc[0]
    assert row["n_pos"] == P and row["n_neg"] == N
    assert abs(row["auc_micro"] - round(auc * 1e6)) <= 1
    assert abs(row["se_micro"] - round(se * 1e6)) <= 1
    # average precision replay with the same integer-floor quantization
    from collections import Counter

    pc, nc = Counter(pos), Counter(neg)
    scores_desc = sorted(set(pos) | set(neg), reverse=True)
    tp = fp = 0
    acc = 0
    for s in scores_desc:
        tp += pc.get(s, 0)
        fp += nc.get(s, 0)
        acc += pc.get(s, 0) * tp * 1000000 // (tp + fp)
    assert int(apdf.iloc[0]["ap_ppm"]) == acc // P


def test_oof_encoding_excludes_own_fold(spark, tmp_path):
    """FE7: poisoning ONE fold of one category with extreme values
    must leave THAT fold's encoding untouched (it only sees the other
    folds) while shifting the other folds' encodings up."""
    import hashlib

    d = str(tmp_path)

    def fold_of(k):
        return (
            int(hashlib.md5(f"fold:{k}".encode()).hexdigest()[:15], 16) % 5
        )

    rows = []
    # populate every (cat, fold) cell with value $100
    k = 0
    cats = ["1-URGENT", "2-HIGH"]
    placed = {(c, f): 0 for c in cats for f in range(5)}
    while min(placed.values()) < 4:
        f = fold_of(k)
        c = cats[k % 2]
        if placed[(c, f)] < 4:
            rows.append((k, 1, "F", 100.0, "1995-01-01 00:00:00", c))
            placed[(c, f)] += 1
        k += 1
    # poison: cat 1-URGENT, one specific fold gets huge values
    poison_fold = 3
    extra = 0
    kk = k
    while extra < 6:
        if fold_of(kk) == poison_fold:
            rows.append((kk, 1, "F", 9000.0, "1995-01-01 00:00:00", "1-URGENT"))
            extra += 1
        kk += 1
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate string, o_orderpriority string",
    ).withColumn("o_orderdate", F.col("o_orderdate").cast("timestamp_ntz")).write.parquet(
        f"{d}/orders.parquet"
    )
    sdf = _cross_check(spark, "orders_target_encoding_oof", d, ["orders"])
    urgent = sdf[sdf["priority"] == "1-URGENT"].set_index("fold")["enc_cents_milli"]
    # the poisoned fold's own encoding saw only clean $100 folds
    others = [urgent[f] for f in range(5) if f != poison_fold]
    assert all(urgent[poison_fold] < o for o in others)


def test_odds_ratio_mh_hand_case(spark, tmp_path):
    """A107: two hand strata — MH pools to the known value and the
    crude OR differs (a Simpson construction)."""
    d = str(tmp_path)
    rows, eid = [], 0

    def stratum(day, a, b, c, dd):
        nonlocal eid
        # exposed = user_id % 2 == 1; hit = purchase
        for _ in range(a):
            rows.append((eid, f"2024-01-{day:02d} 01:00:00", 1, "purchase", 1.0, "{}")); eid += 1
        for _ in range(b):
            rows.append((eid, f"2024-01-{day:02d} 02:00:00", 1, "view", 1.0, "{}")); eid += 1
        for _ in range(c):
            rows.append((eid, f"2024-01-{day:02d} 03:00:00", 2, "purchase", 1.0, "{}")); eid += 1
        for _ in range(dd):
            rows.append((eid, f"2024-01-{day:02d} 04:00:00", 2, "view", 1.0, "{}")); eid += 1

    stratum(1, 8, 2, 4, 6)   # OR = 8*6/(2*4) = 6
    stratum(2, 1, 9, 3, 7)   # OR = 7/27
    _events(spark, rows).write.parquet(f"{d}/events.parquet")
    sdf = _cross_check(spark, "events_odds_ratio_mh", d, ["events"])
    row = sdf.iloc[0]
    t1 = 8 * 6 * 1000000 // 20 + 1 * 7 * 1000000 // 20
    t2 = 2 * 4 * 1000000 // 20 + 9 * 3 * 1000000 // 20
    assert row["or_mh_milli"] == round(t1 / t2 * 1000)
    aa, bb, cc, dd_ = 9, 11, 7, 13
    assert row["or_crude_milli"] == round(aa * dd_ / (bb * cc) * 1000)


def test_bass_recovers_planted_quadratic(spark, tmp_path):
    """A109: plant daily signup counts that EXACTLY follow
    n_t = a + b*x + c*x^2 in the scaled regressor — the fit must
    return the planted coefficients to quantization."""
    d = str(tmp_path)
    a0, b0, c0 = 20, 6, -1  # in scaled-x units (x = cum signups / 10)
    rows, eid, cum = [], 0, 0
    for day in range(1, 21):
        x = cum // 10
        n_t = a0 + b0 * x + c0 * x * x
        if n_t <= 0:  # saturation reached — the Bass process stops
            break
        for _ in range(n_t):
            rows.append(
                (eid, f"2024-01-{day:02d} 10:00:00", eid % 9, "signup", 1.0, "{}")
            )
            eid += 1
        cum += n_t
    _events(spark, rows).write.parquet(f"{d}/events.parquet")
    sdf = _cross_check(spark, "events_bass_diffusion", d, ["events"])
    row = sdf.iloc[0]
    assert abs(row["a_micro"] - a0 * 1000000) <= 5
    assert abs(row["b_micro"] - b0 * 1000000) <= 5
    assert abs(row["c_micro"] - c0 * 1000000) <= 5


def test_active_span_capped_gaps(spark, tmp_path):
    """W21: a user with gaps [5, 10, 120] minutes accrues
    5 + 10 + 15 (capped) = 30 engaged minutes -> bucket 0."""
    d = str(tmp_path)
    rows = []
    mins = [0, 5, 15, 135]
    for i, m in enumerate(mins):
        rows.append((i, f"2024-01-01 {m // 60:02d}:{m % 60:02d}:00", 1, "click", 1.0, "{}"))
    _events(spark, rows).write.parquet(f"{d}/events.parquet")
    sdf = _cross_check(spark, "events_user_active_span", d, ["events"])
    assert len(sdf) == 1
    row = sdf.iloc[0]
    assert (row["bucket_hours"], row["n_users"], row["engaged_min"]) == (0, 1, 30)


def test_otif_last_line_rule(spark, tmp_path):
    """A110: an order whose FIRST line ships on time but whose last
    line ships on day 40 is NOT OTIF (per-order completeness)."""
    d = str(tmp_path)
    orows = [
        (1, 1, "F", 100.0, "1995-03-01 00:00:00", "1-URGENT"),
        (2, 1, "F", 100.0, "1995-03-02 00:00:00", "1-URGENT"),
    ]
    lrows = [
        # order 1: lines at +5 and +40 days -> late
        (1, 10, 1, 1.0, 1.0, 0.0, "N", "O", "1995-03-06 00:00:00"),
        (1, 11, 1, 1.0, 1.0, 0.0, "N", "O", "1995-04-10 00:00:00"),
        # order 2: single line at +10 days -> OTIF
        (2, 12, 1, 1.0, 1.0, 0.0, "N", "O", "1995-03-12 00:00:00"),
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
    sdf = _cross_check(spark, "orders_fill_rate_otif", d, ["orders", "lineitem"])
    row = sdf.iloc[0]
    assert (row["n_orders"], row["n_otif"], row["otif_ppm"]) == (2, 1, 500000)


def test_murphy_identity_on_fixture(spark):
    """EV32: REL - RES + UNC equals the binned Brier score computed
    directly from the same bins (to quantization slack)."""
    import duckdb

    sf = "/root/testdata/sf0.001"
    from bytesprocessor_spark.queries import QUERIES

    sdf = QUERIES["eval_reliability_sharpness"](spark, sf).toPandas()
    row = sdf.iloc[0]
    brier_decomp = (
        row["reliability_micro"] - row["resolution_micro"] + row["uncertainty_micro"]
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{sf}/embeddings.parquet')"
    )
    # binned Brier: forecast = bin mean prediction
    direct = con.execute(
        """
        WITH s AS (
          SELECT CAST('0x' || substr(md5('p:' || CAST(vec_id AS VARCHAR)), 1, 15)
                   AS BIGINT) % 1000001 AS pm,
                 CASE WHEN label = 0 THEN 1 ELSE 0 END AS y
          FROM embeddings
        ),
        b AS (
          SELECT LEAST(pm // 100000, 9) AS bin, COUNT(*) AS n,
                 AVG(pm / 1000000.0) AS pbar, AVG(y) AS ybar
          FROM s GROUP BY 1
        )
        SELECT SUM(n * (pbar - ybar) * (pbar - ybar)) / SUM(n)
               - SUM(n * (ybar - (SELECT AVG(y) FROM s))
                       * (ybar - (SELECT AVG(y) FROM s))) / SUM(n)
               + (SELECT AVG(y) * (1 - AVG(y)) FROM s)
        FROM b
        """
    ).fetchone()[0]
    assert abs(brier_decomp - direct * 1e6) <= 5


def test_wilson_ci_python_replay(spark, tmp_path):
    """A111: bounds match the textbook Wilson formula and bracket the
    point estimate."""
    d = str(tmp_path)
    rows = []
    # 2024-01-06 is a Saturday, 2024-01-08 a Monday
    for i in range(40):
        day = "06" if i < 12 else "08"
        rows.append((i, f"2024-01-{day} 10:00:00", 1, "click", 1.0, "{}"))
    _events(spark, rows).write.parquet(f"{d}/events.parquet")
    sdf = _cross_check(spark, "events_wilson_ci", d, ["events"])
    row = sdf.iloc[0]
    k, n, z = 12, 40, 1.9599639845400545
    p = k / n
    center = p + z * z / (2 * n)
    half = z * math.sqrt(p * (1 - p) / n + z * z / (4 * n * n))
    denom = 1 + z * z / n
    assert row["ci_lo_ppm"] == round((center - half) / denom * 1e6)
    assert row["ci_hi_ppm"] == round((center + half) / denom * 1e6)
    assert row["ci_lo_ppm"] < row["p_ppm"] < row["ci_hi_ppm"]
