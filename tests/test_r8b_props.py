"""Property and edge tests for the round-8 experimentation/eval batch:

- events_kruskal_wallis: on RANDOM multi-group samples the engine H
  (and tie-corrected H) must equal the textbook rank computation done
  brute-force in python (explicit average ranks), with both engines
  agreeing; the all-tied degenerate emits NULL for the corrected H.
- eval_mcnemar: hand case checked against the continuity-corrected
  formula; the zero-discordant degenerate emits NULL (DuckDB would
  throw on CAST(NaN AS BIGINT) if it were computed).
- eval_cohens_kappa: hand case vs the po/pe formula, including a label
  absent from rater 2's marginals; the constant-rater degenerate is
  NULL.
- orders_logrank: random small survival fixtures vs a brute-force
  python log-rank (risk sets recomputed per event time, per-time E/V
  terms quantized to nano exactly as the engines do).
- eval_ips_policy_value: hand case with known propensities and a
  context whose greedy action never appears in the eval split
  (IPS contribution 0, match diagnostics must say so).
"""

import importlib.util
import math
from pathlib import Path

import duckdb
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

_spec = importlib.util.spec_from_file_location(
    "check_oracle_r8b",
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


def _half_away(x: float) -> int:
    return int(math.copysign(math.floor(abs(x) + 0.5), x))


def _kw_reference(groups):
    """Textbook Kruskal-Wallis with average ranks, replicating the
    engine's per-group term quantization."""
    pooled = sorted(v for g in groups.values() for v in g)
    n_total = len(pooled)
    # average rank per distinct value
    avg_rank, i = {}, 0
    while i < len(pooled):
        j = i
        while j < len(pooled) and pooled[j] == pooled[i]:
            j += 1
        avg_rank[pooled[i]] = (i + 1 + j) / 2.0  # mean of ranks i+1..j
        i = j
    rsum = 0
    for g in groups.values():
        two_r = sum(int(2 * avg_rank[v]) for v in g)
        rsum += _half_away(two_r * two_r / len(g) / 4.0)
    h = 12.0 / (n_total * (n_total + 1)) * rsum - 3.0 * (n_total + 1)
    ties, i = 0, 0
    while i < len(pooled):
        j = i
        while j < len(pooled) and pooled[j] == pooled[i]:
            j += 1
        t = j - i
        ties += t * t * t - t
        i = j
    corr = 1.0 - ties / (n_total**3 - n_total) if n_total > 1 else 0.0
    return h, corr, ties


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    vals=st.lists(
        st.tuples(st.sampled_from(["click", "view", "purchase"]), st.integers(0, 5)),
        min_size=2,
        max_size=24,
    )
)
def test_kruskal_wallis_matches_bruteforce(spark, tmp_path_factory, vals):
    d = str(tmp_path_factory.mktemp("kw"))
    rows = [
        (i, "2024-01-01 00:00:00", 1, g, v / 1.0, "{}")
        for i, (g, v) in enumerate(vals)
    ]
    _events(spark, rows).write.parquet(f"{d}/events.parquet")
    sdf = _cross_check(spark, "events_kruskal_wallis", d, ["events"])

    groups = {}
    for g, v in vals:
        groups.setdefault(g, []).append(v * 100)  # cents
    h, corr, ties = _kw_reference(groups)
    n_total = sum(len(g) for g in groups.values())
    assert len(sdf) == len(groups)
    for _, row in sdf.iterrows():
        assert row["n"] == len(groups[row["event_type"]])
        assert row["h_micro"] == _half_away(h * 1_000_000)
        if n_total > 1 and ties < n_total**3 - n_total:
            assert row["h_adj_micro"] == _half_away(h / corr * 1_000_000)
        else:
            assert row["h_adj_micro"] is None or (
                isinstance(row["h_adj_micro"], float)
                and math.isnan(row["h_adj_micro"])
            )


def test_mcnemar_hand_case_and_degenerate(spark, tmp_path):
    d = str(tmp_path)
    # y = (type == purchase); A: value >= 50.00; B: value + 0.10*(uid%7) >= 52.00
    rows = [
        # both right (concordant): purchase @ 60 -> a=T b=T
        (1, "2024-01-01 00:00:00", 0, "purchase", 60.0, "{}"),
        # A right, B wrong: purchase @ 51.0, uid 0 -> a=T, b=F
        (2, "2024-01-01 00:00:00", 0, "purchase", 51.0, "{}"),
        # B right, A wrong: view @ 51.0 uid 0 -> a=T (wrong), b=F (right)
        (3, "2024-01-01 00:00:00", 0, "view", 51.0, "{}"),
        # another A-only: purchase @ 50.0 uid 1 -> a=T, b: 5000+10 < 5200 F
        (4, "2024-01-01 00:00:00", 1, "purchase", 50.0, "{}"),
        # both wrong (concordant): purchase @ 10 -> a=F b=F
        (5, "2024-01-01 00:00:00", 0, "purchase", 10.0, "{}"),
    ]
    _events(spark, rows).write.parquet(f"{d}/events.parquet")
    sdf = _cross_check(spark, "eval_mcnemar", d, ["events"])
    row = sdf.iloc[0]
    assert (row["n"], row["n_a_only"], row["n_b_only"]) == (5, 2, 1)
    chi2 = (abs(2 - 1) - 1) ** 2 / (2 + 1)
    assert row["chi2_micro"] == _half_away(chi2 * 1_000_000)
    assert not row["significant_5pct"]


def test_mcnemar_no_discordant_is_null(spark, tmp_path):
    d = str(tmp_path)
    rows = [  # models always agree with each other
        (1, "2024-01-01 00:00:00", 0, "purchase", 60.0, "{}"),
        (2, "2024-01-01 00:00:00", 0, "view", 10.0, "{}"),
    ]
    _events(spark, rows).write.parquet(f"{d}/events.parquet")
    sdf = _cross_check(spark, "eval_mcnemar", d, ["events"])
    row = sdf.iloc[0]
    assert row["n_a_only"] == 0 and row["n_b_only"] == 0
    assert row["chi2_micro"] is None or (
        isinstance(row["chi2_micro"], float) and math.isnan(row["chi2_micro"])
    )


def test_cohens_kappa_formula_and_missing_marginal(spark, tmp_path):
    d = str(tmp_path)
    # event_id % 5 == 0 rows get the cyclically-next label.
    # 'view' (id 0) -> rater2 'click'; others agree.
    rows = [
        (0, "2024-01-01 00:00:00", 0, "view", 1.0, "{}"),  # r2=click
        (1, "2024-01-01 00:00:00", 0, "view", 1.0, "{}"),
        (2, "2024-01-01 00:00:00", 0, "click", 1.0, "{}"),
        (3, "2024-01-01 00:00:00", 0, "purchase", 1.0, "{}"),
        (4, "2024-01-01 00:00:00", 0, "purchase", 1.0, "{}"),
    ]
    _events(spark, rows).write.parquet(f"{d}/events.parquet")
    sdf = _cross_check(spark, "eval_cohens_kappa", d, ["events"])
    # marginals: r1 = {view:2, click:1, purchase:2}
    #            r2 = {click:2, view:1, purchase:2}
    n, agree = 5, 4
    chance = 2 * 1 + 1 * 2 + 2 * 2  # view + click + purchase
    po, pe = agree / n, chance / (n * n)
    kappa = (po - pe) / (1 - pe)
    assert list(sdf["label"]) == ["click", "purchase", "view"]
    assert list(sdf["n_r1"]) == [1, 2, 2]
    assert list(sdf["n_r2"]) == [2, 2, 1]
    assert list(sdf["n_agree"]) == [1, 2, 1]
    for k in sdf["kappa_micro"]:
        assert k == _half_away(kappa * 1_000_000)


def test_cohens_kappa_constant_raters_null(spark, tmp_path):
    d = str(tmp_path)
    rows = [  # ids not divisible by 5 -> raters agree; one label only
        (1, "2024-01-01 00:00:00", 0, "view", 1.0, "{}"),
        (2, "2024-01-01 00:00:00", 0, "view", 1.0, "{}"),
    ]
    _events(spark, rows).write.parquet(f"{d}/events.parquet")
    sdf = _cross_check(spark, "eval_cohens_kappa", d, ["events"])
    row = sdf.iloc[0]
    assert row["kappa_micro"] is None or (
        isinstance(row["kappa_micro"], float) and math.isnan(row["kappa_micro"])
    )


def _logrank_reference(subjects):
    """Brute-force log-rank over (arm1, t, observed) triples with the
    engines' per-time nano quantization."""
    times = sorted({t for _, t, obs in subjects if obs})
    o1 = e1_nano = v_nano = 0
    for t in times:
        n1 = sum(1 for a, tt, _ in subjects if a and tt >= t)
        nt = sum(1 for _, tt, _ in subjects if tt >= t)
        d1 = sum(1 for a, tt, obs in subjects if a and tt == t and obs)
        dt = sum(1 for _, tt, obs in subjects if tt == t and obs)
        if dt == 0 or nt <= 1:
            continue
        o1 += d1
        frac = n1 / nt
        e1_nano += _half_away(dt * frac * 1e9)
        v_nano += _half_away(dt * frac * (1 - frac) * (nt - dt) / (nt - 1) * 1e9)
    return o1, e1_nano, v_nano


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    subjects=st.lists(
        st.tuples(st.booleans(), st.integers(0, 5)),  # (urgent, ship_delay days)
        min_size=2,
        max_size=16,
    )
)
def test_logrank_matches_bruteforce(spark, tmp_path_factory, subjects):
    d = str(tmp_path_factory.mktemp("lr"))
    orows, lrows = [], []
    for i, (urgent, delay) in enumerate(subjects):
        pri = "1-URGENT" if urgent else "5-LOW"
        orows.append((i, 1, "F", 10.0, "1995-01-01 00:00:00", pri))
        ship = f"1995-01-{delay + 1:02d} 00:00:00"
        lrows.append((i, 1, 1, 1.0, 1.0, 0.0, "N", "O", ship))
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
    sdf = _cross_check(spark, "orders_logrank", d, ["orders", "lineitem"])
    row = sdf.iloc[0]

    subs = [(u, min(delay, 90), delay <= 90) for u, delay in subjects]
    o1, e1_nano, v_nano = _logrank_reference(subs)
    assert row["o1"] == o1
    assert row["e1_nano"] == e1_nano
    assert row["v_nano"] == v_nano
    if v_nano > 0:
        chi2 = (o1 - e1_nano / 1e9) ** 2 / (v_nano / 1e9)
        assert row["chi2_micro"] == _half_away(chi2 * 1_000_000)
    else:
        assert row["chi2_micro"] is None or (
            isinstance(row["chi2_micro"], float) and math.isnan(row["chi2_micro"])
        )


def test_ips_policy_value_hand_case(spark, tmp_path):
    d = str(tmp_path)
    rows = [
        # ctx 0 train (even ids): purchase mean 40, view mean 10 -> pi=purchase
        (0, "2024-01-01 00:00:00", 0, "purchase", 40.0, "{}"),
        (2, "2024-01-01 00:00:00", 0, "view", 10.0, "{}"),
        # ctx 0 eval (odd ids): 2 purchases (30, 50), 2 views (5, 7)
        (1, "2024-01-01 00:00:00", 0, "purchase", 30.0, "{}"),
        (3, "2024-01-01 00:00:00", 0, "purchase", 50.0, "{}"),
        (5, "2024-01-01 00:00:00", 0, "view", 5.0, "{}"),
        (7, "2024-01-01 00:00:00", 0, "view", 7.0, "{}"),
        # ctx 1 train: click mean 20 -> pi=click; eval has NO click rows
        (10, "2024-01-01 00:00:00", 1, "click", 20.0, "{}"),
        (11, "2024-01-01 00:00:00", 1, "view", 3.0, "{}"),
    ]
    _events(spark, rows).write.parquet(f"{d}/events.parquet")
    sdf = _cross_check(spark, "eval_ips_policy_value", d, ["events"])
    assert list(sdf["ctx"]) == [0, 1]
    c0, c1 = sdf.iloc[0], sdf.iloc[1]
    assert c0["pi_act"] == "purchase"
    # eval ctx0: n_c=4, matched purchases n=2 r=8000c; IPS = 8000*4/2
    assert (c0["n_c"], c0["n_match"], c0["ips_c"]) == (4, 2, 16000)
    assert c1["pi_act"] == "click"
    assert (c1["n_c"], c1["n_match"], c1["ips_c"]) == (1, 0, 0)
    # value = 16000c / 5 rows = 3200c -> *10000/100 = micro$ of 32.00
    assert c0["policy_value_microdollar"] == _half_away(16000 / 5 * 10000)
    assert c0["match_rate_micro"] == _half_away(2 / 5 * 1_000_000)


# --- second batch: HITS / Croston / FDR / JSONL quarantine ---


def test_hits_matches_bruteforce_tiny_graph(spark, tmp_path):
    """GR11: on a hand-built bipartite graph the unnormalized integer
    HITS scores equal the brute-force python iteration (h0=1,
    a = sum of adjacent h, h = sum of adjacent a, two rounds)."""
    d = str(tmp_path)
    # customers 1,2,3; parts 10,20; edges: 1-10, 2-10, 2-20, 3-20
    edges = [(1, 10), (2, 10), (2, 20), (3, 20)]
    orows = [(i, c, "F", 1.0, "1995-01-01 00:00:00", "5-LOW") for i, (c, _) in enumerate(edges)]
    lrows = [
        (i, p, 1, 1.0, 1.0, 0.0, "N", "O", "1995-01-02 00:00:00")
        for i, (_, p) in enumerate(edges)
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
    sdf = _cross_check(spark, "graph_hits", d, ["orders", "lineitem"])

    # brute force, two rounds
    h = {1: 1, 2: 1, 3: 1}
    a = {}
    for _ in range(2):
        a = {p: sum(h[c] for c, pp in edges if pp == p) for p in {10, 20}}
        h = {c: sum(a[p] for cc, p in edges if cc == c) for c in {1, 2, 3}}
    auth = sdf[sdf["role"] == "authority"]
    hubs = sdf[sdf["role"] == "hub"]
    assert {r["node"]: r["score"] for _, r in auth.iterrows()} == {
        f"p:{p}": s for p, s in a.items()
    }
    assert {r["node"]: r["score"] for _, r in hubs.iterrows()} == {
        f"c:{c}": s for c, s in h.items()
    }


def test_croston_formula_hand_case(spark, tmp_path):
    """A89: one part with demand at weeks 0,2,3,7 (sizes 100,300,100,
    200 cents): z = dyadic EWMA of sizes, p = dyadic EWMA of gaps
    [2,1,4], forecast = z/p."""
    d = str(tmp_path)
    lrows = []
    demands = [(0, 1.0), (2, 3.0), (3, 1.0), (7, 2.0)]
    for i, (week, qty) in enumerate(demands):
        ship = 1 + week * 7  # day-of-year start
        mm, dd = 1 + (ship - 1) // 28, 1 + (ship - 1) % 28
        lrows.append(
            (i, 42, 1, qty, 1.0, 0.0, "N", "O", f"1995-{mm:02d}-{dd:02d} 00:00:00")
        )
    spark.createDataFrame(
        lrows,
        "l_orderkey long, l_partkey long, l_suppkey long, l_quantity double,"
        " l_extendedprice double, l_discount double, l_returnflag string,"
        " l_linestatus string, l_shipdate string",
    ).withColumn("l_shipdate", F.col("l_shipdate").cast("timestamp_ntz")).write.parquet(
        f"{d}/lineitem.parquet"
    )
    sdf = _cross_check(spark, "part_croston_demand", d, ["lineitem"])
    assert len(sdf) == 1
    row = sdf.iloc[0]
    import datetime

    # recompute weeks the way the query does (vs 1995-01-01)
    weeks = []
    for i, (week, qty) in enumerate(demands):
        ship = 1 + week * 7
        mm, dd = 1 + (ship - 1) // 28, 1 + (ship - 1) % 28
        wk = (datetime.date(1995, mm, dd) - datetime.date(1995, 1, 1)).days // 7
        weeks.append((wk, round(qty * 100)))
    weeks.sort()
    sizes = [q for _, q in weeks]
    gaps = [weeks[i][0] - weeks[i - 1][0] for i in range(1, len(weeks))]
    z_num = sum(v * (1 << i) for i, v in enumerate(sizes))
    z_den = (1 << len(sizes)) - 1
    p_num = sum(v * (1 << i) for i, v in enumerate(gaps))
    p_den = (1 << len(gaps)) - 1
    assert (row["z_num"], row["z_den"]) == (z_num, z_den)
    assert (row["p_num"], row["p_den"]) == (p_num, p_den)
    assert row["croston_micro"] == _half_away(
        z_num * p_den / (z_den * p_num) * 10000
    )
    assert row["n_points"] == 4


def test_croston_pre_epoch_shipdates_floor_weeks(spark, tmp_path):
    """A89 regression (ADVICE r8): shipdates BEFORE the 1995-01-01
    epoch produce negative day counts, where truncate-toward-zero
    (`div`) and floor division disagree (-10 div 7 = -1, -10 // 7 =
    -2).  Both engines must bucket with FLOOR semantics — TPC-H-style
    data ships from 1992."""
    import datetime

    d = str(tmp_path)
    lrows = []
    base = datetime.date(1992, 6, 3)  # 938 days before the epoch
    demands = [(0, 1.0), (2, 3.0), (3, 1.0), (7, 2.0), (9, 5.0)]
    for i, (week, qty) in enumerate(demands):
        ship = base + datetime.timedelta(days=week * 7 + (i % 3))
        lrows.append(
            (i, 42, 1, qty, 1.0, 0.0, "N", "O", f"{ship} 00:00:00")
        )
    spark.createDataFrame(
        lrows,
        "l_orderkey long, l_partkey long, l_suppkey long, l_quantity double,"
        " l_extendedprice double, l_discount double, l_returnflag string,"
        " l_linestatus string, l_shipdate string",
    ).withColumn("l_shipdate", F.col("l_shipdate").cast("timestamp_ntz")).write.parquet(
        f"{d}/lineitem.parquet"
    )
    sdf = _cross_check(spark, "part_croston_demand", d, ["lineitem"])
    assert len(sdf) == 1
    row = sdf.iloc[0]
    # floor-week buckets recomputed by hand
    buckets = {}
    for i, (week, qty) in enumerate(demands):
        ship = base + datetime.timedelta(days=week * 7 + (i % 3))
        wk = (ship - datetime.date(1995, 1, 1)).days // 7
        assert wk < 0  # the divergent regime is actually exercised
        buckets[wk] = buckets.get(wk, 0) + round(qty * 100)
    weeks = sorted(buckets.items())
    sizes = [q for _, q in weeks][-8:]
    gaps = [weeks[i][0] - weeks[i - 1][0] for i in range(1, len(weeks))][-8:]
    z_num = sum(v * (1 << i) for i, v in enumerate(sizes))
    p_num = sum(v * (1 << i) for i, v in enumerate(gaps))
    assert (row["z_num"], row["p_num"]) == (z_num, p_num)


def test_croston_dyadic_sum_exact_past_double_ceiling(spark, tmp_path):
    """A89 regression (ADVICE r8): the dyadic EWMA numerator must be
    EXACT int64 — per-(part, week) demand sums around 2^52 cents make
    the 2^(i-1)-weighted sum exceed 2^53, where a double-precision
    reduction silently loses low bits and diverges from the oracle's
    integer list arithmetic."""
    d = str(tmp_path)
    big = (1 << 46) // 100 + 13  # quantity whose cents ~ 2^46, odd tail
    lrows = []
    for i, week in enumerate([0, 1, 2, 3, 4, 5, 6, 8]):
        ship = 1 + week * 7
        mm, dd = 1 + (ship - 1) // 28, 1 + (ship - 1) % 28
        lrows.append(
            (
                i,
                7,
                1,
                float(big + i),
                1.0,
                0.0,
                "N",
                "O",
                f"1995-{mm:02d}-{dd:02d} 00:00:00",
            )
        )
    spark.createDataFrame(
        lrows,
        "l_orderkey long, l_partkey long, l_suppkey long, l_quantity double,"
        " l_extendedprice double, l_discount double, l_returnflag string,"
        " l_linestatus string, l_shipdate string",
    ).withColumn("l_shipdate", F.col("l_shipdate").cast("timestamp_ntz")).write.parquet(
        f"{d}/lineitem.parquet"
    )
    # the cross-check IS the assertion: engine and oracle must agree
    # bit-for-bit on z_num even though the weighted sum tops 2^53
    sdf = _cross_check(spark, "part_croston_demand", d, ["lineitem"])
    assert len(sdf) == 1 and int(sdf.iloc[0]["z_num"]) > (1 << 53)


def _phi_tail(x: float) -> float:
    t = 1.0 / (1.0 + 0.2316419 * x)
    poly = t * (
        0.319381530
        + t * (-0.356563782 + t * (1.781477937 + t * (-1.821255978 + t * 1.330274429)))
    )
    return math.exp(-x * x / 2.0) / math.sqrt(2.0 * math.pi) * poly


def test_fdr_bh_matches_bruteforce(spark, tmp_path):
    """A90: engine ranks, rejection set, and q-values equal a python
    BH run over the same quantized p-values."""
    d = str(tmp_path)
    rows, eid = [], 0
    # 3 types x 3 ISO weekdays with skewed counts
    # 2024-01-01 is a Monday; use Jan 1 (Mon), 2 (Tue), 3 (Wed)
    counts = {
        ("click", 1): 30, ("click", 2): 10, ("click", 3): 10,
        ("view", 1): 10, ("view", 2): 30, ("view", 3): 10,
        ("purchase", 1): 10, ("purchase", 2): 10, ("purchase", 3): 31,
    }
    for (g, dow), c in counts.items():
        for _ in range(c):
            rows.append((eid, f"2024-01-{dow:02d} 10:00:00", 1, g, 1.0, "{}"))
            eid += 1
    _events(spark, rows).write.parquet(f"{d}/events.parquet")
    sdf = _cross_check(spark, "events_fdr_bh", d, ["events"])

    total = sum(counts.values())
    n_g = {}
    n_d = {}
    for (g, dow), c in counts.items():
        n_g[g] = n_g.get(g, 0) + c
        n_d[dow] = n_d.get(dow, 0) + c
    tests = []
    for (g, dow), c in counts.items():
        p0 = n_g[g] / total
        z = (c / n_d[dow] - p0) / math.sqrt(p0 * (1 - p0) / n_d[dow])
        p = 2.0 * _phi_tail(abs(z))
        tests.append((g, dow, _half_away(p * 1e6)))
    m = len(tests)
    tests.sort(key=lambda t: (t[2], t[0], t[1]))
    i_star = max(
        (i + 1 for i, t in enumerate(tests) if t[2] * m <= (i + 1) * 50000),
        default=0,
    )
    # q-values: cummin from the bottom of round(p*m/rank)
    qvals = [0] * m
    run = 10**18
    for i in range(m - 1, -1, -1):
        run = min(run, _half_away(tests[i][2] * m / (i + 1)))
        qvals[i] = min(1_000_000, run)
    assert len(sdf) == m
    for i, (_, row) in enumerate(sdf.iterrows()):
        g, dow, p_micro = tests[i]
        assert (row["event_type"], row["dow"], row["p_micro"]) == (g, dow, p_micro)
        assert row["rank"] == i + 1
        assert bool(row["rejected"]) == ((i + 1) <= i_star)
        assert row["qval_micro"] == qvals[i]


def test_jsonl_quarantine_accounting_small(spark, tmp_path):
    """S6b: every 11th event quarantined, type recovered from the raw
    JSON line; counts and admitted checksum match the base table."""
    d = str(tmp_path)
    rows = [
        (i, "2024-01-01 00:00:00", 1, "view" if i % 2 else "click", i * 1.0, "{}")
        for i in range(23)
    ]
    _events(spark, rows).write.parquet(f"{d}/events.parquet")
    sdf = _cross_check(spark, "jsonl_quarantine_scan", d, ["events"])
    tot = {r["event_type"]: r for _, r in sdf.iterrows()}
    # ids 0, 11, 22 are corrupted: 0/22 click, 11 view
    assert tot["click"]["n_quarantined"] == 2
    assert tot["view"]["n_quarantined"] == 1
    assert tot["click"]["n_admitted"] + tot["view"]["n_admitted"] == 20
    assert tot["click"]["n_in"] == 12 and tot["view"]["n_in"] == 11


def test_textrank_matches_manual_tiny_corpus(spark, tmp_path):
    """L27: on a two-doc corpus the word graph and the 2-round integer
    PageRank equal a brute-force python replay."""
    d = str(tmp_path)
    docs = [
        (1, "alpha beta gamma alpha", "en", "s", 10),
        (2, "beta gamma delta", "en", "s", 10),
    ]
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(f"{d}/documents.parquet")
    sdf = _cross_check(spark, "text_textrank_keywords", d, ["documents"])

    # graph build: window-3 pairs on >=4-char tokens, self-drop,
    # distinct, symmetrized
    token_docs = [["alpha", "beta", "gamma", "alpha"], ["beta", "gamma", "delta"]]
    eb = set()
    for ws in token_docs:
        for i in range(len(ws) - 1):
            if ws[i] != ws[i + 1]:
                eb.add((ws[i], ws[i + 1]))
        for i in range(len(ws) - 2):
            if ws[i] != ws[i + 2]:
                eb.add((ws[i], ws[i + 2]))
    edges = set()
    for u, v in eb:
        edges.add((u, v))
        edges.add((v, u))
    nodes = {u for u, _ in edges} | {v for _, v in edges}
    outdeg = {}
    for u, _ in edges:
        outdeg[u] = outdeg.get(u, 0) + 1
    p = {n: 1_000_000 for n in nodes}
    for _ in range(2):
        s = {n: 0 for n in nodes}
        for u, v in edges:
            s[v] += p[u] // outdeg[u]
        p = {n: 150_000 + (850_000 * s[n]) // 1_000_000 for n in nodes}
    expect = sorted(p.items(), key=lambda kv: (-kv[1], kv[0]))
    got = [(r["word"], r["textrank_micro"]) for _, r in sdf.iterrows()]
    assert got == expect[: len(got)]


# --- third batch: trend / variance-homogeneity / uplift / alpha ---


def test_cochran_armitage_formula_hand_case(spark, tmp_path):
    """A91: the trend z on a 3-dose hand case equals the textbook
    formula with weekday dose scores."""
    d = str(tmp_path)
    # 2024-01-01=Mon(1), 02=Tue(2), 03=Wed(3)
    spec = {1: (10, 2), 2: (10, 5), 3: (10, 8)}  # dose -> (n, purchases)
    rows, eid = [], 0
    for dow, (n, r) in spec.items():
        for i in range(n):
            t = "purchase" if i < r else "view"
            rows.append((eid, f"2024-01-{dow:02d} 09:00:00", 1, t, 1.0, "{}"))
            eid += 1
    _events(spark, rows).write.parquet(f"{d}/events.parquet")
    sdf = _cross_check(spark, "events_cochran_armitage", d, ["events"])
    nn = sum(n for n, _ in spec.values())
    rr = sum(r for _, r in spec.values())
    swr = sum(d_ * r for d_, (_, r) in spec.items())
    swn = sum(d_ * n for d_, (n, _) in spec.items())
    sw2n = sum(d_ * d_ * n for d_, (n, _) in spec.items())
    p = rr / nn
    z = (swr - rr * swn / nn) / math.sqrt(p * (1 - p) * (sw2n - swn * swn / nn))
    for _, row in sdf.iterrows():
        assert row["z_micro"] == _half_away(z * 1_000_000)
    assert list(sdf["dose"]) == [1, 2, 3]
    assert list(sdf["r_d"]) == [2, 5, 8]


def test_brown_forsythe_formula_hand_case(spark, tmp_path):
    """A92: F on |x - group median| equals the one-way ANOVA formula
    with percentile_disc medians (actual data points)."""
    d = str(tmp_path)
    groups = {"click": [1.0, 2.0, 3.0, 10.0], "view": [5.0, 5.0, 6.0]}
    rows, eid = [], 0
    for g, vals in groups.items():
        for v in vals:
            rows.append((eid, "2024-01-01 00:00:00", 1, g, v, "{}"))
            eid += 1
    _events(spark, rows).write.parquet(f"{d}/events.parquet")
    sdf = _cross_check(spark, "events_brown_forsythe", d, ["events"])

    def disc_median(xs):
        xs = sorted(xs)
        # percentile_disc(0.5): smallest x with cume_dist >= 0.5
        import math as _m

        idx = _m.ceil(0.5 * len(xs)) - 1
        return xs[idx]

    stats = {}
    for g, vals in groups.items():
        cents_v = [round(v * 100) for v in vals]
        med = disc_median(cents_v)
        z = [abs(x - med) for x in cents_v]
        stats[g] = (len(z), sum(z), sum(x * x for x in z))
    nn = sum(n for n, _, _ in stats.values())
    ss = sum(s1 for _, s1, _ in stats.values())
    bterm = sum(_half_away(s1 * s1 / n) for n, s1, _ in stats.values())
    q = sum(s2 for _, _, s2 in stats.values())
    k = len(stats)
    f = ((bterm - ss * ss / nn) / (k - 1)) / ((q - bterm) / (nn - k))
    for _, row in sdf.iterrows():
        g = row["event_type"]
        assert (row["n"], row["s1"], row["s2"]) == stats[g]
        assert row["f_micro"] == _half_away(f * 1_000_000)


def test_qini_matches_bruteforce(spark, tmp_path):
    """EV25: deciles, counts, and the Qini values equal a python
    replay with the same NTILE semantics (remainder rows to leading
    buckets over the unique total order)."""
    d = str(tmp_path)
    rows = []
    for eid in range(37):
        uid = eid % 4  # treated iff uid % 2 == 0
        t = "purchase" if (eid * 7) % 5 == 0 else "view"
        rows.append((eid, "2024-01-01 00:00:00", uid, t, float(eid % 11), "{}"))
    _events(spark, rows).write.parquet(f"{d}/events.parquet")
    sdf = _cross_check(spark, "eval_qini_uplift", d, ["events"])

    pop = []
    for eid, _, uid, t, v, _p in rows:
        score = round(v * 100) + 7 * (uid % 13)
        pop.append((score, eid, uid % 2 == 0, t == "purchase"))
    pop.sort(key=lambda x: (-x[0], x[1]))
    n = len(pop)
    base, rem = divmod(n, 10)
    deciles = []
    for b in range(10):
        sz = base + (1 if b < rem else 0)
        deciles.append(pop[:sz])
        pop = pop[sz:]
    cn_t = cn_c = cr_t = cr_c = 0
    for i, bucket in enumerate(deciles):
        n_t = sum(1 for _, _, tr, _ in bucket if tr)
        n_c = len(bucket) - n_t
        r_t = sum(1 for _, _, tr, y in bucket if tr and y)
        r_c = sum(1 for _, _, tr, y in bucket if not tr and y)
        cn_t += n_t
        cn_c += n_c
        cr_t += r_t
        cr_c += r_c
        row = sdf.iloc[i]
        assert (row["n_t"], row["n_c"], row["r_t"], row["r_c"]) == (
            n_t,
            n_c,
            r_t,
            r_c,
        ), f"decile {i + 1}"
        if cn_c > 0:
            assert row["qini_micro"] == _half_away(
                (cr_t - cr_c * cn_t / cn_c) * 1_000_000
            )


def test_krippendorff_alpha_matches_bruteforce(spark, tmp_path):
    """EV26: alpha on a small fixture equals the textbook coincidence
    computation (python, exact rationals via the same nano
    quantization)."""
    d = str(tmp_path)
    rows = [
        (i, "2024-01-01 00:00:00", 1, t, 1.0, "{}")
        for i, t in enumerate(
            ["view", "click", "purchase", "view", "signup", "click", "error",
             "view", "purchase", "click", "view", "error"]
        )
    ]
    _events(spark, rows).write.parquet(f"{d}/events.parquet")
    sdf = _cross_check(spark, "eval_krippendorff_alpha", d, ["events"])
    row = sdf.iloc[0]

    cyc = {"click": "error", "error": "purchase", "purchase": "signup",
           "signup": "view", "view": "click"}
    units = {}
    for eid, _, _, t, _, _ in rows:
        for r in (0, 1, 2):
            if (eid + r) % 4 == 0:
                continue
            lab = t
            if (r == 1 and eid % 5 == 0) or (r == 2 and eid % 7 == 0):
                lab = cyc[t]
            units.setdefault(eid, []).append(lab)
    do_nano = n_ratings = n_units = 0
    label_tot = {}
    for labs in units.values():
        if len(labs) < 2:
            continue
        m = len(labs)
        counts = {}
        for lb in labs:
            counts[lb] = counts.get(lb, 0) + 1
            label_tot[lb] = label_tot.get(lb, 0) + 1
        so2 = sum(c * c for c in counts.values())
        do_nano += _half_away((m * m - so2) / (m - 1) * 1e9)
        n_ratings += m
        n_units += 1
    n_tot = sum(label_tot.values())
    sn2 = sum(c * c for c in label_tot.values())
    de = (n_tot * n_tot - sn2) / (n_tot * (n_tot - 1))
    do = do_nano / 1e9 / n_ratings
    assert (row["n_units"], row["n_ratings"], row["do_nano"]) == (
        n_units,
        n_ratings,
        do_nano,
    )
    assert row["de_micro"] == _half_away(de * 1_000_000)
    assert row["alpha_micro"] == _half_away((1.0 - do / de) * 1_000_000)


# --- fourth batch: panel FE / burstiness / tokenizer audit / Weibull ---


def test_panel_within_vs_pooled_hand_case(spark, tmp_path):
    """A93: within slope removes the user level confound the pooled
    slope absorbs; both equal the python formulas."""
    d = str(tmp_path)
    # UNBALANCED design: the high-level user is observed on later
    # weekdays, so the pooled slope absorbs the level difference
    # (user 1: Tue 10.00, Wed 10.01; user 2: Mon 1.00, Tue 1.01)
    rows = [
        (1, "2024-01-02 09:00:00", 1, "view", 10.00, "{}"),
        (2, "2024-01-03 09:00:00", 1, "view", 10.01, "{}"),
        (3, "2024-01-01 09:00:00", 2, "view", 1.00, "{}"),
        (4, "2024-01-02 09:00:00", 2, "view", 1.01, "{}"),
    ]
    _events(spark, rows).write.parquet(f"{d}/events.parquet")
    sdf = _cross_check(spark, "events_panel_within", d, ["events"])
    row = sdf.iloc[0]
    users = {1: [(2, 1000), (3, 1001)], 2: [(1, 100), (2, 101)]}
    wnum = wden = 0
    gs = dict(n=0, sx=0, sy=0, sxy=0, sxx=0)
    for pts in users.values():
        n = len(pts)
        sx = sum(x for x, _ in pts)
        sy = sum(y for _, y in pts)
        sxy = sum(x * y for x, y in pts)
        sxx = sum(x * x for x, _ in pts)
        wnum += _half_away((n * sxy - sx * sy) / n * 1e6)
        wden += _half_away((n * sxx - sx * sx) / n * 1e6)
        gs["n"] += n
        gs["sx"] += sx
        gs["sy"] += sy
        gs["sxy"] += sxy
        gs["sxx"] += sxx
    beta_w = wnum / wden
    beta_p = (gs["n"] * gs["sxy"] - gs["sx"] * gs["sy"]) / (
        gs["n"] * gs["sxx"] - gs["sx"] * gs["sx"]
    )
    assert row["n_users"] == 2 and row["n_rows"] == 4
    assert row["beta_within_micro"] == _half_away(beta_w * 1e6)
    assert row["beta_pooled_micro"] == _half_away(beta_p * 1e6)
    # the fixture is built so the confound flips magnitude visibly
    assert abs(row["beta_within_micro"]) < abs(row["beta_pooled_micro"])


def test_burstiness_vmr_hand_case(spark, tmp_path):
    """L28: VMR of per-containing-doc counts matches the formula; the
    df >= 5 floor excludes thin terms."""
    d = str(tmp_path)
    # 'zap' appears in 5 docs with counts [4,1,1,1,1] (bursty);
    # 'flat' in 5 docs with counts [1,1,1,1,1] (VMR 0 under n-1 var);
    # 'thin' in only 2 docs -> excluded
    docs = []
    for i in range(5):
        zap = " ".join(["zap"] * (4 if i == 0 else 1))
        extra = " thin" if i < 2 else ""
        docs.append((i, f"{zap} flat{extra}", "en", "s", 20))
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(f"{d}/documents.parquet")
    sdf = _cross_check(spark, "text_burstiness", d, ["documents"])
    got = {r["term"]: r for _, r in sdf.iterrows()}
    assert "thin" not in got
    c = [4, 1, 1, 1, 1]
    s1, s2, df = sum(c), sum(x * x for x in c), len(c)
    vmr = ((s2 - s1 * s1 / df) / (df - 1)) / (s1 / df)
    assert got["zap"]["vmr_micro"] == _half_away(vmr * 1e6)
    assert got["zap"]["df"] == 5 and got["zap"]["total_count"] == 8
    assert got["flat"]["vmr_micro"] == 0


def test_tokenizer_audit_ratios(spark, tmp_path):
    """L29: counts and the three budget ratios per source."""
    d = str(tmp_path)
    docs = [
        (1, "Hello world", "en", "web", 11),   # 2 toks, 10 tok chars
        (2, "a bb ccc", "en", "web", 8),        # 3 toks, 6 tok chars
        (3, "xx yy", "en", "book", 5),          # 2 toks, 4 tok chars
    ]
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(f"{d}/documents.parquet")
    sdf = _cross_check(spark, "corpus_tokenizer_audit", d, ["documents"])
    web = sdf[sdf["source"] == "web"].iloc[0]
    assert (web["n_docs"], web["n_tokens"], web["n_tok_chars"]) == (2, 5, 16)
    assert web["n_bytes"] == 11 + 8
    assert web["toks_per_doc_milli"] == _half_away(5 / 2 * 1000)
    assert web["chars_per_tok_milli"] == _half_away(16 / 5 * 1000)
    assert web["bytes_per_tok_milli"] == _half_away(19 / 5 * 1000)


def test_weibull_fit_recovers_exponential(spark, tmp_path):
    """A94: median-rank regression on a small fixture equals the
    python replay (same 1e-4 plot-coordinate quantization), and a
    geometric-ish duration sample fits shape near 1."""
    d = str(tmp_path)
    durations = [1, 1, 2, 2, 3, 4, 5, 7, 9, 13]  # exponential-ish
    orows, lrows = [], []
    for i, t in enumerate(durations):
        orows.append((i, 1, "F", 1.0, "1995-01-01 00:00:00", "5-LOW"))
        mm, dd = 1 + t // 28, 1 + t % 28
        lrows.append(
            (i, 1, 1, 1.0, 1.0, 0.0, "N", "O", f"1995-{mm:02d}-{dd:02d} 00:00:00")
        )
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
    sdf = _cross_check(spark, "orders_weibull_fit", d, ["orders", "lineitem"])
    row = sdf.iloc[0]

    import datetime

    ts = []
    for i, t in enumerate(durations):
        mm, dd = 1 + t // 28, 1 + t % 28
        days = (datetime.date(1995, mm, dd) - datetime.date(1995, 1, 1)).days
        if days >= 1:
            ts.append((days, i))
    ts.sort()
    n = len(ts)
    xs, ys = [], []
    for rank, (t, _) in enumerate(ts, start=1):
        xs.append(_half_away(math.log(t) * 10000))
        f = (rank - 0.3) / (n + 0.4)
        ys.append(_half_away(math.log(-math.log(1 - f)) * 10000))
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx = sum(x * x for x in xs)
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    intercept = (sy / 10000.0 - slope * sx / 10000.0) / n
    assert row["n"] == n
    assert row["shape_milli"] == _half_away(slope * 1000)
    assert row["scale_days_milli"] == _half_away(math.exp(-intercept / slope) * 1000)
    # an exponential-ish sample should land near shape 1
    assert 500 <= row["shape_milli"] <= 1800


# --- fifth batch: capture-recapture / Bradley-Terry ---


def test_capture_recapture_chapman_formula(spark, tmp_path):
    """A95: Chapman estimate and variance from the two channel flags
    equal the formulas; ground truth rides along."""
    d = str(tmp_path)
    # 12 users; user u's events have ids chosen to control channel
    # membership: A = has an event_id % 3 == 0; B = % 5 == 0
    ids_for_user = {
        0: [3, 5], 1: [3], 2: [5], 3: [15], 4: [1], 5: [3, 10],
        6: [9], 7: [25], 8: [7], 9: [30], 10: [2], 11: [45],
    }
    rows = []
    for u, ids in ids_for_user.items():
        for i in ids:
            # make ids unique per row while preserving i mod 15
            uid_offset = 15 * 100 * (u + 1)
            rows.append((uid_offset + i, "2024-01-01 00:00:00", u, "view", 1.0, "{}"))
    _events(spark, rows).write.parquet(f"{d}/events.parquet")
    sdf = _cross_check(spark, "events_capture_recapture", d, ["events"])
    row = sdf.iloc[0]

    in_a = {u for u, ids in ids_for_user.items() if any(i % 3 == 0 for i in ids)}
    in_b = {u for u, ids in ids_for_user.items() if any(i % 5 == 0 for i in ids)}
    n_a, n_b, n_ab, n_true = len(in_a), len(in_b), len(in_a & in_b), 12
    assert (row["n_a"], row["n_b"], row["n_ab"], row["n_true"]) == (
        n_a, n_b, n_ab, n_true,
    )
    est = (n_a + 1) * (n_b + 1) / (n_ab + 1) - 1
    var = ((n_a + 1) * (n_b + 1) * (n_a - n_ab) * (n_b - n_ab)) / (
        (n_ab + 1) ** 2 * (n_ab + 2)
    )
    assert row["chapman_est_milli"] == _half_away(est * 1000)
    assert row["var_est_milli"] == _half_away(var * 1000)


def test_bradley_terry_matches_bruteforce(spark, tmp_path):
    """EV27: the 3-iteration quantized MM trajectory equals a python
    replay, and a dominant item ranks first."""
    d = str(tmp_path)
    # 3 types over 4 days; purchase always wins, click always loses
    vals = {
        "purchase": [30.0, 40.0, 50.0, 60.0],
        "view": [20.0, 25.0, 55.0, 10.0],
        "click": [10.0, 5.0, 8.0, 9.0],
    }
    rows, eid = [], 0
    for t, per_day in vals.items():
        for day, v in enumerate(per_day):
            rows.append((eid, f"2024-01-{day + 1:02d} 10:00:00", 1, t, v, "{}"))
            eid += 1
    _events(spark, rows).write.parquet(f"{d}/events.parquet")
    sdf = _cross_check(spark, "eval_bradley_terry", d, ["events"])

    items = sorted(vals)
    wins = {}
    for x in items:
        for y in items:
            if x < y:
                w_f = sum(1 for a, b in zip(vals[x], vals[y]) if a * 100 > b * 100)
                w_r = sum(1 for a, b in zip(vals[x], vals[y]) if b * 100 > a * 100)
                wins[(x, y)] = (w_f, w_f + w_r)
                wins[(y, x)] = (w_r, w_f + w_r)
    p = {i: 1_000_000_000 for i in items}
    for _ in range(3):
        raw = {}
        for i in items:
            w_i = sum(wins[(i, j)][0] for j in items if j != i)
            denom_nano = sum(
                _half_away(wins[(i, j)][1] / (p[i] + p[j]) * 1e9)
                for j in items
                if j != i
            )
            raw[i] = _half_away(w_i / (denom_nano / 1e9) * 1e9)
        tot = sum(raw.values())
        p = {i: _half_away(raw[i] / tot * 5_000_000_000) for i in items}
    expect = sorted(p.items(), key=lambda kv: (-kv[1], kv[0]))
    got = [(r["item"], r["strength_nano"]) for _, r in sdf.iterrows()]
    assert got == expect
    assert got[0][0] == "purchase" and got[-1][0] == "click"


# --- sixth batch: extreme-value pair ---


def test_gumbel_moments_formula(spark, tmp_path):
    """A96: beta/mu/rl99 equal the method-of-moments formulas over
    hand-built daily maxima."""
    d = str(tmp_path)
    # 4 days, daily max values 10.00 / 20.00 / 15.00 / 25.00
    day_vals = {1: [10.0, 3.0], 2: [20.0, 5.0], 3: [15.0], 4: [25.0, 1.0]}
    rows, eid = [], 0
    for day, vs in day_vals.items():
        for v in vs:
            rows.append((eid, f"2024-01-{day:02d} 10:00:00", 1, "view", v, "{}"))
            eid += 1
    _events(spark, rows).write.parquet(f"{d}/events.parquet")
    sdf = _cross_check(spark, "events_extreme_gumbel", d, ["events"])
    row = sdf.iloc[0]
    maxima = [1000, 2000, 1500, 2500]
    n, s1, s2 = len(maxima), sum(maxima), sum(m * m for m in maxima)
    var = (s2 - s1 * s1 / n) / (n - 1)
    beta = math.sqrt(var) * math.sqrt(6.0) / math.pi
    mu = s1 / n - 0.5772156649015329 * beta
    rl99 = mu - beta * math.log(-math.log(0.99))
    assert (row["n"], row["s1"], row["s2"]) == (n, s1, s2)
    assert row["beta_c_milli"] == _half_away(beta * 1000)
    assert row["mu_c_milli"] == _half_away(mu * 1000)
    assert row["rl99_c"] == _half_away(rl99)
    # the 99% return level must exceed every observed daily max
    assert row["rl99_c"] > max(maxima)


def test_pot_gpd_pwm_formula(spark, tmp_path):
    """A97: the PWM GPD fit over the exceedances of the exact p95
    threshold equals the Hosking-Wallis formulas."""
    d = str(tmp_path)
    # 40 values 1..40 dollars -> cents 100..4000; p95 disc = 3800
    rows = [
        (i, "2024-01-01 00:00:00", 1, "view", float(i + 1), "{}") for i in range(40)
    ]
    _events(spark, rows).write.parquet(f"{d}/events.parquet")
    sdf = _cross_check(spark, "events_peaks_over_threshold", d, ["events"])
    row = sdf.iloc[0]
    cents_v = [(i + 1) * 100 for i in range(40)]
    sv = sorted(cents_v)
    u = sv[math.ceil(0.95 * len(sv)) - 1]
    ys = sorted(c - u for c in cents_v if c > u)
    n = len(ys)
    s1 = sum(ys)
    sw = sum(i * y for i, y in enumerate(ys))  # (rank-1)*y, rank from 1
    b0 = s1 / n
    b1 = sw / (n * (n - 1))
    xi = 2.0 - b0 / (b0 - 2.0 * b1)
    sigma = 2.0 * b0 * b1 / (b0 - 2.0 * b1)
    assert (row["n"], row["threshold_c"]) == (n, u)
    assert row["xi_micro"] == _half_away(xi * 1e6)
    assert row["sigma_c_milli"] == _half_away(sigma * 1000)


def test_eb_shrinkage_matches_bruteforce(spark, tmp_path):
    """A98: prior mass and shrunk rates equal the MoM beta-binomial
    replay; heavy users barely move, light users shrink to the mean."""
    d = str(tmp_path)
    # users with (events, purchases): heavy precise, light noisy
    spec = {1: (20, 10), 2: (20, 2), 3: (2, 2), 4: (2, 0), 5: (10, 5),
            6: (10, 1), 7: (4, 2), 8: (4, 1), 9: (8, 4), 10: (8, 0)}
    rows, eid = [], 0
    for uid, (n, k) in spec.items():
        for i in range(n):
            t = "purchase" if i < k else "view"
            rows.append((eid, "2024-01-01 00:00:00", uid, t, 1.0, "{}"))
            eid += 1
    _events(spark, rows).write.parquet(f"{d}/events.parquet")
    sdf = _cross_check(spark, "events_eb_shrinkage", d, ["events"])

    rates = {u: _half_away(k / n * 1e6) for u, (n, k) in spec.items()}
    nu = len(spec)
    s1 = sum(rates.values())
    s2 = sum(v * v for v in rates.values())
    m = s1 / nu / 1e6
    v = (s2 - s1 * s1 / nu) / (nu - 1) / 1e12
    kmass = m * (1 - m) / v - 1
    assert kmass > 0
    shrunk = {
        u: _half_away((k + m * kmass) / (n + kmass) * 1e6)
        for u, (n, k) in spec.items()
    }
    order = sorted(spec, key=lambda u: (shrunk[u], u))
    base, rem = divmod(nu, 10)
    # 10 users, 10 deciles -> one per bucket
    assert list(sdf["n_users_bin"]) == [1] * 10
    for i, (_, row) in enumerate(sdf.iterrows()):
        u = order[i]
        assert row["sum_rate_u"] == rates[u]
        assert row["sum_shrunk_u"] == shrunk[u]
        assert row["k_milli"] == _half_away(kmass * 1000)
    # shrinkage property: the 2-event perfect converter (user 3) ends
    # closer to the mean than its raw 100% rate
    assert shrunk[3] < 1_000_000 and shrunk[3] < rates[3]
    # and the 20-event converter moved less (relative to its raw rate)
    assert abs(shrunk[1] - rates[1]) < abs(shrunk[3] - rates[3])


def test_burst_kleinberg_matches_bruteforce(spark, tmp_path):
    """A99: on a hand-built series with a clear mid-run burst the
    engine's Viterbi path equals the python integer replay (same
    quantized emissions) and flags exactly the burst days."""
    d = str(tmp_path)
    # two types over 23 days: a long quiet baseline keeps p0 low, so
    # the days 11-13 spike is a genuine burst under the 2*p0 state
    hot = [1] * 10 + [12, 12, 12] + [1] * 10
    cold = [9] * 23
    rows, eid = [], 0
    for day in range(len(hot)):
        for _ in range(hot[day]):
            rows.append((eid, f"2024-01-{day + 1:02d} 10:00:00", 1, "hot", 1.0, "{}"))
            eid += 1
        for _ in range(cold[day]):
            rows.append((eid, f"2024-01-{day + 1:02d} 10:00:00", 1, "cold", 1.0, "{}"))
            eid += 1
    _events(spark, rows).write.parquet(f"{d}/events.parquet")
    sdf = _cross_check(spark, "events_burst_kleinberg", d, ["events"])

    def replay(ks, ns):
        kk, nn, nd = sum(ks), sum(ns), len(ks)
        p0 = kk / nn
        p1 = min(2.0 * p0, 0.999999)
        e0 = [
            _half_away(-(k * math.log(p0) + (n - k) * math.log(1 - p0)) * 1e6)
            for k, n in zip(ks, ns)
        ]
        e1 = [
            _half_away(-(k * math.log(p1) + (n - k) * math.log(1 - p1)) * 1e6)
            for k, n in zip(ks, ns)
        ]
        t01 = _half_away(math.log(nd) * 1e6)
        c0, c1 = e0[0], e1[0] + t01
        path0, path1 = [0], [1]
        for t in range(1, nd):
            n0 = e0[t] + (c0 if c0 <= c1 else c1)
            np0 = (path0 if c0 <= c1 else path1) + [0]
            n1 = e1[t] + (c0 + t01 if c0 + t01 <= c1 else c1)
            np1 = (path0 if c0 + t01 <= c1 else path1) + [1]
            c0, c1, path0, path1 = n0, n1, np0, np1
        return path0 if c0 <= c1 else path1

    totals = [h + c for h, c in zip(hot, cold)]
    hot_path = replay(hot, totals)
    cold_path = replay(cold, totals)
    got_hot = list(sdf[sdf["event_type"] == "hot"].sort_values("day")["burst"])
    got_cold = list(sdf[sdf["event_type"] == "cold"].sort_values("day")["burst"])
    assert got_hot == hot_path
    assert got_cold == cold_path
    # the construction must actually flag the injected burst window
    assert hot_path[10:13] == [1, 1, 1]
    assert hot_path[0] == 0 and hot_path[-1] == 0
    assert all(s == 0 for s in cold_path)


def test_burst_kleinberg_calendar_past_1000_days(spark, tmp_path):
    """A99 regression (ADVICE r8): the oracle's Viterbi-path unnest
    was capped at 999 days, silently truncating longer calendars while
    the Spark replay handled any length — a >=1000-day series must now
    round-trip with identical row counts on both engines."""
    d = str(tmp_path)
    n_days = 1005
    import datetime

    base = datetime.date(2021, 1, 1)
    rows, eid = [], 0
    for i in range(n_days):
        day = base + datetime.timedelta(days=i)
        rows.append((eid, f"{day} 10:00:00", 1, "click", 1.0, "{}"))
        eid += 1
        if i % 9 == 0:  # sparse second type so shares vary
            rows.append((eid, f"{day} 10:00:00", 1, "view", 1.0, "{}"))
            eid += 1
    _events(spark, rows).write.parquet(f"{d}/events.parquet")
    sdf = _cross_check(spark, "events_burst_kleinberg", d, ["events"])
    # every (type, day) grid cell present — nothing truncated at 999
    assert len(sdf) == 2 * n_days


def test_hill_tail_matches_bruteforce(spark, tmp_path):
    """A100: gamma at each k equals the python replay with identical
    per-row ln quantization; a Pareto-ish sample recovers its index."""
    d = str(tmp_path)
    # Pareto(alpha=2)-ish deterministic sample: x_i = 100 / u^(1/2)
    # with u on a uniform grid — tail index alpha ~ 2
    n = 300
    vals = [100.0 / ((i + 0.5) / n) ** 0.5 for i in range(n)]
    rows = [
        (i, 1, "F", round(v, 2), "1995-01-01 00:00:00", "5-LOW")
        for i, v in enumerate(vals)
    ]
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate string, o_orderpriority string",
    ).withColumn("o_orderdate", F.col("o_orderdate").cast("timestamp_ntz")).write.parquet(
        f"{d}/orders.parquet"
    )
    sdf = _cross_check(spark, "orders_hill_tail", d, ["orders"])

    cents_v = sorted(
        ((round(round(v, 2) * 100), i) for i, v in enumerate(vals)),
        key=lambda t: (-t[0], t[1]),
    )
    for _, row in sdf.iterrows():
        k = int(row["k"])
        lqs = [_half_away(math.log(c) * 1e6) for c, _ in cents_v[: k + 1]]
        gamma = sum(lqs[:k]) / 1e6 / k - lqs[k] / 1e6
        assert row["hill_gamma_micro"] == _half_away(gamma * 1e6)
        assert row["alpha_milli"] == _half_away(1.0 / gamma * 1000)
        # the sample's true tail index is 2: the estimate must land
        # in a generous neighborhood at every k
        assert 1200 <= row["alpha_milli"] <= 3200
