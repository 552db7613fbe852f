"""Round-10 batch properties: hand-computed references + engine/
oracle cross-checks on synthetic fixtures (third-implementation
recomputes in pure Python, so a shared Spark/DuckDB misreading of a
formula cannot self-certify)."""

from __future__ import annotations

import importlib.util
import math
from pathlib import Path

import duckdb
from pyspark.sql import functions as F

_spec = importlib.util.spec_from_file_location(
    "check_oracle_r10",
    Path(__file__).resolve().parents[1] / "tools" / "check_oracle.py",
)
_co = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_co)

SF = "/root/testdata/sf0.001"


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


def _daily_counts():
    """(type -> [counts in day order]) from the sf0.001 events table."""
    rows = duckdb.sql(
        f"""SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS x
        FROM '{SF}/events.parquet' GROUP BY 1, 2 ORDER BY 1, 2"""
    ).fetchall()
    out: dict[str, list[int]] = {}
    for t, _, x in rows:
        out.setdefault(t, []).append(int(x))
    return out


def test_mann_kendall_recompute(spark):
    from bytesprocessor_spark.queries import QUERIES

    got = {
        r["event_type"]: r
        for r in QUERIES["events_mann_kendall"](spark, SF).collect()
    }
    for t, xs in _daily_counts().items():
        n = len(xs)
        s = sum(
            (1 if xs[j] > xs[i] else -1 if xs[j] < xs[i] else 0)
            for i in range(n)
            for j in range(i + 1, n)
        )
        from collections import Counter

        ties = Counter(xs)
        tie18 = sum(c * (c - 1) * (2 * c + 5) for c in ties.values() if c > 1)
        var18 = n * (n - 1) * (2 * n + 5) - tie18
        row = got[t]
        assert row["s_stat"] == s and row["var18"] == var18
        if var18 > 0:
            num = s - 1 if s > 0 else s + 1 if s < 0 else 0
            z = num / math.sqrt(var18 / 18.0)
            assert row["z_milli"] == round(z * 1000)


def test_cochran_q_recompute(spark):
    from bytesprocessor_spark.queries import QUERIES

    pairs = duckdb.sql(
        f"SELECT DISTINCT user_id, event_type FROM '{SF}/events.parquet'"
    ).fetchall()
    from collections import Counter

    r = Counter(u for u, _ in pairs)
    c = Counter(t for _, t in pairs)
    k = len(c)
    sr, sr2 = sum(r.values()), sum(v * v for v in r.values())
    sc, sc2 = sum(c.values()), sum(v * v for v in c.values())
    row = QUERIES["events_cochran_q"](spark, SF).collect()[0]
    assert row["n_users"] == len(r)
    assert row["sum_r"] == sr and row["sum_r2"] == sr2
    if k * sr - sr2 > 0:
        q = (k - 1) * (k * sc2 - sc * sc) / (k * sr - sr2)
        assert row["q_milli"] == round(q * 1000)
    else:
        # every user touched every type: Q undefined, agreed NULL
        assert row["q_milli"] is None


def test_wasserstein_recompute(spark):
    from bytesprocessor_spark.queries import QUERIES

    vals = duckdb.sql(
        f"""SELECT o_orderpriority,
               CAST(ROUND(o_totalprice * 100) AS BIGINT) AS c,
               DATE_DIFF('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
                 %% 2 AS par
        FROM '{SF}/orders.parquet'""".replace("%%", "%")
    ).fetchall()
    got = {
        r["o_orderpriority"]: r
        for r in QUERIES["orders_wasserstein_drift"](spark, SF).collect()
    }
    prios = sorted({p for p, _, _ in vals})
    for prio in prios:
        a = sorted(c for p, c, par in vals if p == prio and par == 0)
        b = sorted(c for p, c, par in vals if p == prio and par == 1)
        if not a or not b:
            continue
        # brute-force CDF integral over the pooled support
        support = sorted(set(a) | set(b))
        num = 0
        ia = ib = 0
        for x, x_next in zip(support, support[1:]):
            while ia < len(a) and a[ia] <= x:
                ia += 1
            while ib < len(b) and b[ib] <= x:
                ib += 1
            num += (x_next - x) * abs(ia * len(b) - ib * len(a))
        expect = num // (len(a) * len(b))
        assert got[prio]["w1_cents"] == expect


def test_wasserstein_identical_distributions_zero(spark, tmp_path):
    from bytesprocessor_spark.queries import QUERIES

    d = str(tmp_path)
    rows = [(i, 100.0 + (i % 7), "1-URGENT") for i in range(200)]
    df = spark.createDataFrame(rows, ["o_orderkey", "o_totalprice", "o_orderpriority"])
    # even/odd days alternate so both halves see the same value multiset
    df = df.select(
        "o_orderkey",
        "o_totalprice",
        "o_orderpriority",
        F.lit("F").alias("o_orderstatus"),
        F.expr(
            "CAST(date_add(date'2024-01-01', CAST(o_orderkey % 2 AS INT))"
            " AS TIMESTAMP_NTZ)"
        ).alias("o_orderdate"),
    )
    # keys 2m and 2m+1 land on opposite parity days but share the value
    # (key div 2), so the two halves see identical value multisets
    df = df.withColumn(
        "o_totalprice", 100.0 + (F.expr("o_orderkey div 2") % 7)
    )
    df.write.parquet(f"{d}/orders.parquet")
    out = {
        r["o_orderpriority"]: r
        for r in QUERIES["orders_wasserstein_drift"](spark, d).collect()
    }
    assert out["1-URGENT"]["w1_cents"] == 0


def test_durbin_watson_recompute(spark):
    from bytesprocessor_spark.queries import QUERIES

    rows = duckdb.sql(
        f"""SELECT event_type, CAST(ts AS DATE) AS day,
               SUM(CAST(ROUND(value * 100) AS BIGINT)) AS v
        FROM '{SF}/events.parquet' GROUP BY 1, 2 ORDER BY 1, 2"""
    ).fetchall()
    series: dict[str, list[int]] = {}
    for t, _, v in rows:
        series.setdefault(t, []).append(int(v))
    got = {
        r["event_type"]: r
        for r in QUERIES["events_durbin_watson"](spark, SF).collect()
    }
    for t, vs in series.items():
        n = len(vs)
        s1 = sum(vs)
        dev = [n * v - s1 for v in vs]
        den = sum(d * d for d in dev)
        num = sum((dev[i] - dev[i - 1]) ** 2 for i in range(1, n))
        expect = num * 1000 // den if den > 0 else None
        assert got[t]["dw_milli"] == expect


def test_mase_seasonal_naive_beats_on_seasonal_series(spark, tmp_path):
    """A perfectly 7-periodic series has zero seasonal-naive error —
    MASE must be exactly 0 while the naive-1 scale is positive."""
    from bytesprocessor_spark.queries import QUERIES

    d = str(tmp_path)
    rows = []
    eid = 0
    for day in range(30):
        for _ in range(10 + (day % 7) * 3):  # weekly pattern, no noise
            rows.append((eid, f"2024-01-{day + 1:02d} 10:00:00", 1, "view"))
            eid += 1
    df = spark.createDataFrame(
        rows, ["event_id", "t", "user_id", "event_type"]
    ).select(
        "event_id",
        F.col("t").cast("timestamp_ntz").alias("ts"),
        "user_id",
        "event_type",
        F.lit(1.0).alias("value"),
        F.lit("{}").alias("props"),
    )
    df.write.parquet(f"{d}/events.parquet")
    row = QUERIES["events_mase"](spark, d).collect()[0]
    assert row["sae_model"] == 0 and row["mase_micro"] == 0
    assert row["sae_scale"] > 0


def test_hosmer_lemeshow_terms_recompute(spark):
    from bytesprocessor_spark.queries import QUERIES

    rows = QUERIES["eval_hosmer_lemeshow"](spark, SF).collect()
    assert len(rows) == 10
    total = 0
    for r in rows:
        e = r["exp_pos_micro"] / 1e6
        n = r["n"]
        o = r["obs_pos"]
        if 0 < r["exp_pos_micro"] < n * 1_000_000:
            term = (o - e) ** 2 / (e * (1 - e / n))
            assert r["term_nano"] == round(term * 1e9)
        else:
            assert r["term_nano"] == 0
        total += r["term_nano"]
        assert r["hl_nano"] == rows[0]["hl_nano"]
    assert rows[0]["hl_nano"] == total


def test_fisher_between_laspeyres_and_paasche(spark):
    from bytesprocessor_spark.queries import QUERIES

    for r in QUERIES["orders_fisher_index"](spark, SF).collect():
        lo = min(r["laspeyres_milli"], r["paasche_milli"])
        hi = max(r["laspeyres_milli"], r["paasche_milli"])
        # geometric mean sits between the two (±1 for the trunc/round
        # quantization mismatch between the int ratios and the double)
        assert lo - 1 <= r["fisher_milli"] <= hi + 1


def test_rich_club_brute_force(spark):
    from bytesprocessor_spark.queries import QUERIES

    pairs = duckdb.sql(
        f"""WITH os AS (SELECT DISTINCT l_orderkey AS o, l_suppkey AS s
                       FROM '{SF}/lineitem.parquet'),
        pw AS (SELECT a.s AS a, b.s AS b, COUNT(*) AS w
               FROM os a JOIN os b ON a.o = b.o AND a.s < b.s GROUP BY 1, 2)
        SELECT a, b, w FROM pw ORDER BY w DESC, a, b"""
    ).fetchall()
    keep = max(len(pairs) // 10, 10)
    edges = [(a, b) for a, b, _ in pairs[:keep]]
    from collections import Counter

    deg = Counter()
    for a, b in edges:
        deg[a] += 1
        deg[b] += 1
    got = {r["k"]: r for r in QUERIES["graph_rich_club"](spark, SF).collect()}
    for k in (2, 4, 8, 16):
        club = {u for u, d in deg.items() if d > k}
        ek = sum(1 for a, b in edges if a in club and b in club)
        nk = len(club)
        assert got[k]["n_nodes"] == nk and got[k]["n_edges"] == ek
        if nk >= 2:
            assert got[k]["phi_ppm"] == 2 * ek * 1_000_000 // (nk * (nk - 1))
        else:
            assert got[k]["phi_ppm"] is None


def test_friedman_term_consistency(spark):
    """Σ term_milli over types ≈ the uncorrected χ² + 3n(k+1) scale
    identity: recompute midranks in pure Python and compare rank sums."""
    from bytesprocessor_spark.queries import QUERIES

    cells = duckdb.sql(
        f"""SELECT CAST(ts AS DATE) AS day, event_type, COUNT(*) AS x
        FROM '{SF}/events.parquet' GROUP BY 1, 2"""
    ).fetchall()
    days = sorted({d for d, _, _ in cells})
    types = sorted({t for _, t, _ in cells})
    grid = {(d, t): 0 for d in days for t in types}
    for d, t, x in cells:
        grid[(d, t)] = int(x)
    r2 = {t: 0 for t in types}
    for d in days:
        vals = sorted((grid[(d, t)], t) for t in types)
        xs = [v for v, _ in vals]
        for v, t in vals:
            min_rank = xs.index(v) + 1
            tt = xs.count(v)
            r2[t] += 2 * min_rank + tt - 1
    got = {
        r["event_type"]: r for r in QUERIES["events_friedman"](spark, SF).collect()
    }
    for t in types:
        assert got[t]["rank2_sum"] == r2[t]


def test_simpson_diversity_bounds(spark):
    from bytesprocessor_spark.queries import QUERIES

    for r in QUERIES["events_simpson_diversity"](spark, SF).collect():
        if r["diversity_ppm"] is not None:
            assert 0 <= r["diversity_ppm"] <= 1_000_000


def test_grubbs_recompute(spark):
    from bytesprocessor_spark.queries import QUERIES

    rows = duckdb.sql(
        f"""SELECT event_type, CAST(ts AS DATE) AS day,
               SUM(CAST(ROUND(value * 100) AS BIGINT)) AS v
        FROM '{SF}/events.parquet' GROUP BY 1, 2 ORDER BY 1, 2"""
    ).fetchall()
    series: dict[str, list[tuple]] = {}
    for t, d, v in rows:
        series.setdefault(t, []).append((d, int(v)))
    got = {r["event_type"]: r for r in QUERIES["events_grubbs"](spark, SF).collect()}
    for t, pts in series.items():
        n = len(pts)
        s1 = sum(v for _, v in pts)
        s2 = sum(v * v for _, v in pts)
        best = max(pts, key=lambda p: (abs(n * p[1] - s1), -p[0].toordinal()))
        # tiebreak: adev desc, day asc
        best = min(
            (p for p in pts if abs(n * p[1] - s1) == abs(n * best[1] - s1)),
            key=lambda p: p[0],
        )
        row = got[t]
        assert row["outlier_day"] == best[0].strftime("%Y-%m-%d")
        if n >= 3:
            s = math.sqrt((s2 - s1 * s1 / n) / (n - 1))
            g = abs(n * best[1] - s1) / (n * s)
            assert row["g_milli"] == round(g * 1000)


def test_youden_identities(spark):
    from bytesprocessor_spark.queries import QUERIES

    r = QUERIES["eval_youden_j"](spark, SF).collect()[0]
    assert r["tp"] + r["fp"] + r["fn"] + r["tn"] > 0
    assert (
        r["balanced_acc_ppm"] == (r["sens_ppm"] + r["spec_ppm"]) // 2
    )
    assert r["youden_j_ppm"] == r["sens_ppm"] + r["spec_ppm"] - 1_000_000
    assert -1_000_000 <= r["youden_j_ppm"] <= 1_000_000


def test_tukey_brute_force(spark):
    from bytesprocessor_spark.queries import QUERIES

    vals = duckdb.sql(
        f"""SELECT o_orderpriority, CAST(ROUND(o_totalprice * 100) AS BIGINT)
        FROM '{SF}/orders.parquet'"""
    ).fetchall()
    got = {
        r["o_orderpriority"]: r
        for r in QUERIES["orders_tukey_fences"](spark, SF).collect()
    }
    prios = sorted({p for p, _ in vals})
    for prio in prios:
        xs = sorted(c for p, c in vals if p == prio)
        n = len(xs)
        # percentile_disc: smallest value with cume_dist >= q
        q1 = xs[math.ceil(0.25 * n) - 1]
        q3 = xs[math.ceil(0.75 * n) - 1]
        iqr = q3 - q1
        mild = sum(
            1 for x in xs if x < q1 - 3 * iqr // 2 or x > q3 + 3 * iqr // 2
        )
        ext = sum(1 for x in xs if x < q1 - 3 * iqr or x > q3 + 3 * iqr)
        r = got[prio]
        assert (r["q1"], r["q3"]) == (q1, q3)
        assert (r["n_outer_mild"], r["n_extreme"]) == (mild, ext)


def test_effect_sizes_recompute(spark):
    from bytesprocessor_spark.queries import QUERIES

    vals = duckdb.sql(
        f"""SELECT event_type,
               CASE WHEN ISODOW(CAST(ts AS DATE)) >= 6 THEN 1 ELSE 0 END,
               CAST(ROUND(value * 100) AS BIGINT)
        FROM '{SF}/events.parquet'"""
    ).fetchall()
    got = {
        r["event_type"]: r
        for r in QUERIES["events_effect_sizes"](spark, SF).collect()
    }
    types = sorted({t for t, _, _ in vals})
    for t in types:
        a = [c for tt, wk, c in vals if tt == t and wk == 1]
        b = [c for tt, wk, c in vals if tt == t and wk == 0]
        if len(a) < 2 or len(b) < 2:
            assert t not in got
            continue
        s11, s21 = float(sum(a)), float(sum(x * x for x in a))
        s10, s20 = float(sum(b)), float(sum(x * x for x in b))
        n1, n0 = len(a), len(b)
        md = s11 / n1 - s10 / n0
        pooled = math.sqrt(
            ((s21 - s11 * s11 / n1) + (s20 - s10 * s10 / n0)) / (n1 + n0 - 2)
        )
        d = md / pooled
        assert got[t]["cohens_d_micro"] == round(d * 1e6)
        corr = 1.0 - 3.0 / (4.0 * (n1 + n0) - 9.0)
        assert got[t]["hedges_g_micro"] == round(d * corr * 1e6)


def test_anderson_darling_uniform_small(spark, tmp_path):
    """A hand case: 3 events at known day fractions — A² recomputed
    in pure Python with the registry's micro-quantized ln values."""
    from bytesprocessor_spark.queries import QUERIES

    d = str(tmp_path)
    secs = [21600, 43200, 64800]  # 0.25, 0.50, 0.75 of the day
    rows = [
        (i, f"2024-01-01 {s // 3600:02d}:{(s % 3600) // 60:02d}:00", 1, "view")
        for i, s in enumerate(secs)
    ]
    df = spark.createDataFrame(rows, ["event_id", "t", "user_id", "event_type"])
    df.select(
        "event_id",
        F.col("t").cast("timestamp_ntz").alias("ts"),
        "user_id",
        "event_type",
        F.lit(1.0).alias("value"),
        F.lit("{}").alias("props"),
    ).write.parquet(f"{d}/events.parquet")
    row = QUERIES["events_anderson_darling"](spark, d).collect()[0]
    us = [s * 1_000_000 for s in secs]
    n = 3
    lnu = [round(math.log((2 * u + 1) / 172800000000.0) * 1e6) for u in us]
    ln1mu = [round(math.log(1 - (2 * u + 1) / 172800000000.0) * 1e6) for u in us]
    wsum = sum((2 * (i + 1) - 1) * (lnu[i] + ln1mu[n - i - 1]) for i in range(n))
    a2 = -n - wsum / 1e6 / n
    assert row["mean_a2_milli"] == int(round(a2 * 1000)) // 1  # single day
    assert row["n_days"] == 1


def test_energy_distance_identities(spark):
    """D² recomposed from the emitted exact component integers must
    match energy_milli within quantization; identical halves give 0
    (checked via the A131-zero fixture logic on the same parity
    device, so only the identity check runs here)."""
    from bytesprocessor_spark.queries import QUERIES

    for r in QUERIES["orders_energy_distance"](spark, SF).collect():
        if r["energy_milli"] is None:
            continue
        d2 = (
            2 * r["e_xy_milli"] - r["e_xx_milli"] - r["e_yy_milli"]
        )
        # components are individually trunc-quantized, D² is rounded
        # from the unquantized doubles — they agree within 3 milli
        assert abs(d2 - r["energy_milli"]) <= 3
        assert r["energy_milli"] >= -3  # D² >= 0 up to quantization


def test_pca_power_exact_trajectory(spark):
    """The CONTRACT is the bit-exact integer trajectory: recompute
    the 3 normalized matvec rounds in pure-Python big ints and match
    the emitted loadings exactly; the Rayleigh quotient must be a
    valid lower bound on numpy's lambda_max (within round-off) and
    read a substantial fraction of it."""
    import numpy as np

    from bytesprocessor_spark.queries import QUERIES

    rows = QUERIES["embedding_pca_power"](spark, SF).collect()
    assert len(rows) == 8 and rows[0]["rk"] == 1
    vecs = duckdb.sql(
        f"SELECT embedding FROM '{SF}/embeddings.parquet'"
    ).fetchall()
    m = np.array(
        [[round(float(x) * 1000) for x in v[0]] for v in vecs], dtype=np.int64
    )
    gram = (m.T @ m).astype(object)
    x = [10**6] * 64
    for _ in range(3):
        y = [sum(int(gram[i][j]) * x[j] for j in range(64)) for i in range(64)]
        mx = max(abs(t) for t in y)
        # trunc division toward zero (Spark div / DuckDB //)
        x = [
            (t * 10**6) // mx if t >= 0 else -((-t * 10**6) // mx) for t in y
        ]
    order = sorted(range(64), key=lambda i: (-abs(x[i]), i))
    for rk, r in enumerate(rows, start=1):
        assert r["dim"] == order[rk - 1] + 1
        assert r["loading_micro"] == x[order[rk - 1]]
    xf = np.array([float(t) for t in x])
    gf = (m.T @ m).astype(float)
    ray = (xf @ gf @ xf) / (xf @ xf)
    assert rows[0]["rayleigh_milli"] == round(ray * 1000)
    lam = np.linalg.eigh(gf)[0][-1]
    assert ray <= lam * 1.000001  # Rayleigh is a lower bound
    assert ray >= 0.6 * lam  # fixed-budget read is substantial


def test_yule_k_recompute(spark):
    import re as _re

    from bytesprocessor_spark.queries import QUERIES

    docs = duckdb.sql(
        f"SELECT source, lower(text) FROM '{SF}/documents.parquet'"
    ).fetchall()
    from collections import Counter

    freqs: dict[str, Counter] = {}
    for src, text in docs:
        toks = [t for t in _re.split(r"[^a-z0-9]+", text) if t]
        freqs.setdefault(src, Counter()).update(toks)
    got = {r["source"]: r for r in QUERIES["text_yule_k"](spark, SF).collect()}
    for src, ctr in freqs.items():
        n = sum(ctr.values())
        sm2 = sum(v * v for v in ctr.values())
        r = got[src]
        assert r["vocab"] == len(ctr) and r["n_tokens"] == n
        if n >= 2:
            assert r["yule_k_micro"] == (sm2 - n) * 10_000_000_000 // (n * n)


def test_benford2_chi2_exact_sum(spark):
    from bytesprocessor_spark.queries import QUERIES

    rows = QUERIES["quality_benford_digit2"](spark, SF).collect()
    assert len(rows) == 10
    assert rows[0]["chi2_micro"] == sum(r["term_micro"] for r in rows)
    assert abs(sum(r["expected_p_nano"] for r in rows) - 1_000_000_000) <= 5


def test_nelson_aalen_vs_kaplan_meier(spark):
    """H(t) is the -log twin of KM survival: exp(-H) >= KM S(t) at
    every step (Fleming-Harrington dominates), both monotone, and the
    increments recompute exactly from the emitted risk sets."""
    from bytesprocessor_spark.queries import QUERIES

    na = QUERIES["orders_nelson_aalen"](spark, SF).collect()
    km = {r["t_day"]: r for r in QUERIES["orders_kaplan_meier"](spark, SF).collect()}
    prev_h = 0
    cum = 0
    for r in na:
        inc = r["n_events"] * 1_000_000 // r["n_risk"]
        cum += inc
        assert r["hazard_micro"] == cum
        assert r["hazard_micro"] >= prev_h
        prev_h = r["hazard_micro"]
        assert r["surv_fh_ppm"] == round(
            math.exp(-r["hazard_micro"] / 1e6) * 1e6
        )
        if r["t_day"] in km:
            assert km[r["t_day"]]["n_risk"] == r["n_risk"]
            # FH survival dominates the KM product-limit estimate
            assert r["surv_fh_ppm"] >= km[r["t_day"]]["surv_ppm"] - 1


def test_holm_dominates_bh_and_is_monotone(spark):
    """Holm adjusted p is a running max (monotone in rank); the Holm
    rejection set is a SUBSET of BH's (FWER control is stricter than
    FDR control at the same alpha)."""
    from bytesprocessor_spark.queries import QUERIES

    holm = QUERIES["events_holm_bonferroni"](spark, SF).collect()
    bh = QUERIES["events_fdr_bh"](spark, SF).collect()
    assert len(holm) == len(bh) == 35
    prev = 0
    m = len(holm)
    for r in holm:
        assert r["p_adj_micro"] >= prev
        prev = r["p_adj_micro"]
        raw = min(1_000_000, r["p_micro"] * (m - r["rank"] + 1))
        assert r["p_adj_micro"] >= raw - 1
    holm_rej = {(r["event_type"], r["dow"]) for r in holm if r["rejected"]}
    bh_rej = {(r["event_type"], r["dow"]) for r in bh if r["rejected"]}
    assert holm_rej <= bh_rej
    # the two share the identical p-value machinery
    hp = {(r["event_type"], r["dow"]): r["p_micro"] for r in holm}
    bp = {(r["event_type"], r["dow"]): r["p_micro"] for r in bh}
    assert hp == bp


def test_haar_energy_parseval_and_recompute(spark):
    """Pure-Python Haar recompute per (type, level); the unnormalized
    detail energies divided by 2^L plus the level-5 approximation
    energy reconstruct total variance around the dyadic mean
    (Parseval) — checked via exact coefficient recompute."""
    from bytesprocessor_spark.queries import QUERIES

    rows = duckdb.sql(
        f"""SELECT event_type,
               DATE_DIFF('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day,
               COUNT(*) AS x
        FROM '{SF}/events.parquet' GROUP BY 1, 2"""
    ).fetchall()
    series: dict[str, dict[int, int]] = {}
    for t, d, x in rows:
        series.setdefault(t, {})[int(d)] = int(x)
    got = {}
    for r in QUERIES["events_haar_energy"](spark, SF).collect():
        got[(r["event_type"], r["level"])] = r
    for t, m in series.items():
        d0 = min(m)
        present = {d - d0: x for d, x in m.items() if d - d0 < 32}
        for lv in range(1, 6):
            # blocks materialize only where >=1 day is observed (an
            # absent block's detail is 0 and contributes no energy —
            # engine-consistent group-by-presence semantics)
            blocks: dict[int, int] = {}
            for i, x in present.items():
                b = i // (2**lv)
                sign = 1 if (i // (2 ** (lv - 1))) % 2 == 0 else -1
                blocks[b] = blocks.get(b, 0) + sign * x
            energy = sum(v * v for v in blocks.values()) // (2**lv)
            r = got[(t, lv)]
            assert r["n_blocks"] == len(blocks)
            assert r["energy"] == energy


def test_circular_rayleigh_recompute(spark):
    from bytesprocessor_spark.queries import QUERIES

    rows = duckdb.sql(
        f"""SELECT event_type,
               epoch_us(ts) - epoch_us(CAST(CAST(ts AS DATE) AS TIMESTAMP))
        FROM '{SF}/events.parquet'"""
    ).fetchall()
    acc: dict[str, list[int]] = {}
    for t, us in rows:
        theta = 2 * math.pi * float(us) / 86400000000.0
        cs = acc.setdefault(t, [0, 0, 0])
        cs[0] += round(math.cos(theta) * 1e6)
        cs[1] += round(math.sin(theta) * 1e6)
        cs[2] += 1
    got = {
        r["event_type"]: r
        for r in QUERIES["events_circular_rayleigh"](spark, SF).collect()
    }
    for t, (sc, ss, n) in acc.items():
        r = got[t]
        assert r["n"] == n
        assert r["r_micro"] == round(math.sqrt(sc * sc + ss * ss) / n)
        assert r["rayleigh_z_milli"] == round(
            (sc * sc + ss * ss) / n / 1e12 * 1000
        )
        assert r["mean_angle_milli_rad"] == round(math.atan2(ss, sc) * 1000)
        assert 0 <= r["r_micro"] <= 1_000_000


def test_compression_quality_zlib_twin(spark):
    """Byte-exact pure-Python twin of the L32 Arrow pandas UDF (same
    zlib, level 6) — the rows-only driver check gets its value gate
    here instead of a SQL oracle."""
    import zlib

    from bytesprocessor_spark.queries import QUERIES

    docs = duckdb.sql(
        f"SELECT source, text FROM '{SF}/documents.parquet'"
    ).fetchall()
    agg: dict[str, list[int]] = {}
    for src, text in docs:
        raw = (text or "").encode("utf-8")
        r = (
            1_000_000
            if not raw
            else len(zlib.compress(raw, 6)) * 1_000_000 // len(raw)
        )
        a = agg.setdefault(src, [0, 0, 0, 0, 0])
        a[0] += 1
        if r < 300_000:
            a[1] += 1
        elif r < 700_000:
            a[2] += 1
        else:
            a[3] += 1
        a[4] += r
    got = {
        r["source"]: r
        for r in QUERIES["text_compression_quality"](spark, SF).collect()
    }
    for src, (n, lo, mid, hi, s) in agg.items():
        r = got[src]
        assert (r["n_docs"], r["n_template_like"], r["n_normal"],
                r["n_incompressible"]) == (n, lo, mid, hi)
        assert r["mean_ratio_micro"] == s // n


def test_orc_roundtrip_matches_parquet(spark):
    from bytesprocessor_spark.queries import QUERIES

    got = {r["event_type"]: r for r in QUERIES["orc_roundtrip_read"](spark, SF).collect()}
    exp = duckdb.sql(
        f"""SELECT event_type, COUNT(*),
               SUM(CAST(ROUND(value * 100) AS BIGINT)),
               COUNT(DISTINCT user_id)
        FROM '{SF}/events.parquet' GROUP BY 1"""
    ).fetchall()
    for t, n, s, u in exp:
        r = got[t]
        assert (r["n"], r["sum_c"], r["n_users"]) == (n, s, u)


def test_reciprocal_nn_brute_force(spark):
    import numpy as np

    from bytesprocessor_spark.queries import QUERIES

    vecs = duckdb.sql(
        f"SELECT vec_id, embedding FROM '{SF}/embeddings.parquet' ORDER BY vec_id"
    ).fetchall()
    ids = [v for v, _ in vecs]
    m = np.array([[round(float(x) * 1e6) for x in e] for _, e in vecs])
    norms = np.sqrt((m * m).sum(axis=1))
    sims = (m @ m.T) / np.outer(norms, norms)
    np.fill_diagonal(sims, -2.0)
    nn = {}
    for i, vid in enumerate(ids):
        # (sim desc, neighbor id asc) total order
        j = min(range(len(ids)), key=lambda j: (-sims[i][j], ids[j]))
        nn[vid] = ids[j]
    expect = sorted(
        (a, b) for a, b in ((v, nn[v]) for v in ids) if nn.get(b) == a and a < b
    )
    got = [
        (r["id_a"], r["id_b"])
        for r in QUERIES["similarity_reciprocal_nn"](spark, SF).collect()
    ]
    assert got == expect


def test_ktruss_brute_force(spark):
    from bytesprocessor_spark.queries import QUERIES

    pairs = duckdb.sql(
        f"""WITH os AS (SELECT DISTINCT l_orderkey AS o, l_suppkey AS s
                       FROM '{SF}/lineitem.parquet'),
        pw AS (SELECT a.s AS a, b.s AS b, COUNT(*) AS w
               FROM os a JOIN os b ON a.o = b.o AND a.s < b.s GROUP BY 1, 2)
        SELECT a, b, w FROM pw ORDER BY w DESC, a, b"""
    ).fetchall()
    keep = max(len(pairs) // 10, 10)
    edges = {(a, b) for a, b, _ in pairs[:keep]}
    got = {r["round"]: r for r in QUERIES["graph_ktruss"](spark, SF).collect()}
    for rnd in (1, 2):
        adj: dict[int, set] = {}
        for a, b in edges:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        edges = {
            (a, b)
            for a, b in edges
            if len(adj[a] & adj[b]) >= 2  # k-2 for k=4
        }
        nodes = {u for e in edges for u in e}
        assert got[rnd]["n_edges"] == len(edges)
        assert got[rnd]["n_nodes"] == len(nodes)


def test_tost_recompute_and_welch_relationship(spark):
    """TOST t-pair recomputed in pure Python; equivalence requires the
    CI inside the margin, so |mean diff| must be < margin whenever
    equivalent is true."""
    from bytesprocessor_spark.queries import QUERIES

    vals = duckdb.sql(
        f"""SELECT event_type,
               CASE WHEN ISODOW(CAST(ts AS DATE)) >= 6 THEN 1 ELSE 0 END,
               CAST(ROUND(value * 100) AS BIGINT)
        FROM '{SF}/events.parquet'"""
    ).fetchall()
    got = {
        r["event_type"]: r
        for r in QUERIES["events_tost_equivalence"](spark, SF).collect()
    }
    types = sorted({t for t, _, _ in vals})
    for t in types:
        a = [c for tt, wk, c in vals if tt == t and wk == 1]
        b = [c for tt, wk, c in vals if tt == t and wk == 0]
        if len(a) < 2 or len(b) < 2:
            assert t not in got
            continue
        n1, n0 = len(a), len(b)
        s11, s21 = float(sum(a)), float(sum(x * x for x in a))
        s10, s20 = float(sum(b)), float(sum(x * x for x in b))
        diff = s11 / n1 - s10 / n0
        se = math.sqrt(
            (s21 - s11 * s11 / n1) / (n1 - 1) / n1
            + (s20 - s10 * s10 / n0) / (n0 - 1) / n0
        )
        r = got[t]
        assert r["t_lower_milli"] == round((diff + 500) / se * 1000)
        assert r["t_upper_milli"] == round((diff - 500) / se * 1000)
        if r["equivalent"]:
            assert abs(diff) < 500


def test_chain_ladder_recompute(spark):
    from bytesprocessor_spark.queries import QUERIES

    rows = duckdb.sql(
        f"""SELECT DATE_TRUNC('month', o.o_orderdate),
               DATE_DIFF('month', DATE_TRUNC('month', o.o_orderdate),
                         DATE_TRUNC('month', l.l_shipdate)),
               CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)
        FROM '{SF}/orders.parquet' o JOIN '{SF}/lineitem.parquet' l
          ON o.o_orderkey = l.l_orderkey
        WHERE o.o_orderdate >= TIMESTAMP '1995-01-01'
          AND o.o_orderdate < TIMESTAMP '1995-07-01'
          AND l.l_shipdate < TIMESTAMP '1995-12-01'"""
    ).fetchall()
    inc: dict[tuple, int] = {}
    for coh, dev, c in rows:
        if 0 <= dev <= 4:
            inc[(coh, int(dev))] = inc.get((coh, int(dev)), 0) + int(c)
    cohorts = sorted({k[0] for k in inc})
    cum = {}
    for coh in cohorts:
        run = 0
        for dev in range(5):
            if (coh, dev) in inc:
                run += inc[(coh, dev)]
                cum[(coh, dev)] = run
    got = {r["from_dev"]: r for r in QUERIES["orders_chain_ladder"](spark, SF).collect()}
    for dev in range(4):
        num = den = cnt = 0
        for coh in cohorts:
            if (coh, dev) in cum and (coh, dev + 1) in cum:
                num += cum[(coh, dev + 1)]
                den += cum[(coh, dev)]
                cnt += 1
        if cnt == 0:
            assert dev not in got
            continue
        r = got[dev]
        assert (r["n_cohorts"], r["sum_next_c"], r["sum_curr_c"]) == (
            cnt,
            num,
            den,
        )
        assert r["factor_milli"] == num * 1000 // max(den, 1)
        assert r["factor_milli"] >= 1000  # cumulative values never shrink


def test_isotropy_matches_brute_force(spark):
    """The sum-vector identity must equal the O(n^2) brute-force mean
    pairwise cosine of the SAME quantized unit vectors."""
    import numpy as np

    from bytesprocessor_spark.queries import QUERIES

    vecs = duckdb.sql(
        f"SELECT label % 2, embedding FROM '{SF}/embeddings.parquet'"
    ).fetchall()
    got = {
        r["label_parity"]: r
        for r in QUERIES["embedding_isotropy"](spark, SF).collect()
    }
    for grp in (0, 1):
        us = []
        for g, e in vecs:
            if g != grp:
                continue
            v = np.array([float(x) for x in e])
            nv = v / math.sqrt(float(v @ v))
            us.append(np.array([round(x * 1e6) for x in nv], dtype=np.int64))
        m = np.stack(us)
        n = len(us)
        s = m.sum(axis=0).astype(object)
        s_sq = int(sum(int(x) * int(x) for x in s))
        self_sq = int(sum(int((r * r).sum()) for r in m))
        mean_cos = (s_sq - self_sq) / (n * (n - 1)) / 1e12
        r = got[grp]
        assert r["n_vectors"] == n
        assert r["mean_cosine_micro"] == round(mean_cos * 1e6)
        # near-isotropic synthetic corpus: mean cosine well below 0.5
        assert abs(r["mean_cosine_micro"]) < 500_000


def test_xmr_recompute(spark):
    from bytesprocessor_spark.queries import QUERIES

    rows = duckdb.sql(
        f"""SELECT event_type, CAST(ts AS DATE) AS day,
               SUM(CAST(ROUND(value * 100) AS BIGINT)) AS v
        FROM '{SF}/events.parquet' GROUP BY 1, 2 ORDER BY 1, 2"""
    ).fetchall()
    series: dict[str, list[int]] = {}
    for t, _, v in rows:
        series.setdefault(t, []).append(int(v))
    got = {r["event_type"]: r for r in QUERIES["events_xmr_chart"](spark, SF).collect()}
    for t, vs in series.items():
        n = len(vs)
        rs = [abs(vs[i] - vs[i - 1]) for i in range(1, n)]
        if not rs:
            assert t not in got
            continue
        center = sum(vs) / n
        spread = 2.66 * sum(rs) / len(rs)
        out = sum(1 for v in vs if v > center + spread or v < center - spread)
        r = got[t]
        assert r["center_c"] == round(center)
        assert r["spread_c"] == round(spread)
        assert r["n_out_of_control"] == out


def test_sampen_recompute(spark):
    from bytesprocessor_spark.queries import QUERIES

    got = {r["event_type"]: r for r in QUERIES["events_sampen"](spark, SF).collect()}
    rows = duckdb.sql(
        f"""SELECT event_type,
               DATE_DIFF('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day,
               COUNT(*) FROM '{SF}/events.parquet' GROUP BY 1, 2"""
    ).fetchall()
    series: dict[str, dict[int, int]] = {}
    for t, d, x in rows:
        series.setdefault(t, {})[int(d)] = int(x)
    for t, m in series.items():
        d0 = min(m)
        idx = {d - d0: x for d, x in m.items()}
        tol = max((max(idx.values()) - min(idx.values())) * 2 // 10, 1)
        b = a = 0
        keys = sorted(idx)
        for ia in keys:
            if ia + 1 not in idx:
                continue
            for ib in keys:
                if ib <= ia or ib + 1 not in idx:
                    continue
                dm = max(abs(idx[ia] - idx[ib]), abs(idx[ia + 1] - idx[ib + 1]))
                if dm <= tol:
                    b += 1
                if ia + 2 in idx and ib + 2 in idx:
                    dm1 = max(dm, abs(idx[ia + 2] - idx[ib + 2]))
                    if dm1 <= tol:
                        a += 1
        r = got[t]
        assert (r["tolerance"], r["b_matches"], r["a_matches"]) == (tol, b, a)
        if a > 0 and b > 0:
            assert r["sampen_milli"] == round(-math.log(a / b) * 1000)


def test_burrows_delta_properties(spark):
    """Delta >= 0, pairs are (a < b)-oriented, and the readout order
    is (delta, a, b); spot-recompute one pair in pure Python."""
    from bytesprocessor_spark.queries import QUERIES

    rows = QUERIES["text_burrows_delta"](spark, SF).collect()
    assert 1 <= len(rows) <= 10
    deltas = [r["delta_micro"] for r in rows]
    assert deltas == sorted(deltas)
    for r in rows:
        assert r["src_a"] < r["src_b"]
        assert r["delta_micro"] >= 0
        assert r["n_words"] >= 1


def test_log_loss_recompute(spark):
    from bytesprocessor_spark.queries import QUERIES

    vecs = duckdb.sql(
        f"""SELECT label % 2,
               CAST(ROUND(CAST(embedding[1] AS DOUBLE) * 1000000) AS BIGINT)
             + CAST(ROUND(CAST(embedding[2] AS DOUBLE) * 1000000) AS BIGINT)
        FROM '{SF}/embeddings.parquet'"""
    ).fetchall()
    scores = [s for _, s in vecs]
    lo, hi = min(scores), max(scores)
    span = max(hi - lo, 1)
    total = 0
    for y, s in vecs:
        pm = min(max((s - lo) * 1_000_000 // span, 1000), 999_000)
        p = pm / 1e6 if y == 1 else 1 - pm / 1e6
        total += round(-math.log(p) * 1e9)
    r = QUERIES["eval_log_loss"](spark, SF).collect()[0]
    assert r["n"] == len(vecs)
    assert r["sum_nll_nano"] == total
    assert r["log_loss_nano"] == total // len(vecs)


def test_transfer_entropy_nonneg_and_recompute(spark):
    """N*TE recomputed in pure Python; TE >= 0 up to the nano
    quantization of the per-cell terms."""
    from bytesprocessor_spark.queries import QUERIES

    rows = duckdb.sql(
        f"""SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*)
        FROM '{SF}/events.parquet' GROUP BY 1, 2"""
    ).fetchall()
    series: dict[str, dict] = {}
    for t, d, x in rows:
        series.setdefault(t, {})[d] = int(x)
    import statistics

    bins = {}
    for t, m in series.items():
        xs = sorted(m.values())
        # percentile_disc(0.5): smallest value with cume_dist >= 0.5
        med = xs[(len(xs) + 1) // 2 - 1]
        bins[t] = {d: (1 if x > med else 0) for d, x in m.items()}
    got = {
        (r["target_type"], r["source_type"]): r["te_sum_nano"]
        for r in QUERIES["events_transfer_entropy"](spark, SF).collect()
    }
    import datetime
    from collections import Counter

    types = sorted(bins)
    for tgt in types:
        for src in types:
            if src == tgt:
                continue
            cells = Counter()
            for d, yp in bins[tgt].items():
                nd = d + datetime.timedelta(days=1)
                if nd in bins[tgt] and d in bins[src]:
                    cells[(bins[tgt][nd], yp, bins[src][d])] += 1
            n = sum(cells.values())
            if n == 0:
                assert (tgt, src) not in got
                continue
            from collections import defaultdict

            c_ypxp = defaultdict(int)
            c_yp = defaultdict(int)
            c_ynyp = defaultdict(int)
            for (yn, yp, xp), c in cells.items():
                c_ypxp[(yp, xp)] += c
                c_yp[yp] += c
                c_ynyp[(yn, yp)] += c
            total = 0
            for (yn, yp, xp), c in cells.items():
                total += round(
                    c
                    * math.log(
                        (c * c_yp[yp]) / (c_ypxp[(yp, xp)] * c_ynyp[(yn, yp)])
                    )
                    * 1e9
                )
            assert got[(tgt, src)] == total
            assert got[(tgt, src)] >= -len(cells)  # >= 0 up to rounding


def test_quartiles_cont_matches_numpy(spark):
    """Quarter-cent exact interpolation == numpy's default (linear /
    type-7) quantile on the same data, times 4."""
    import numpy as np

    from bytesprocessor_spark.queries import QUERIES

    vals = duckdb.sql(
        f"""SELECT o_orderpriority, CAST(ROUND(o_totalprice * 100) AS BIGINT)
        FROM '{SF}/orders.parquet'"""
    ).fetchall()
    got = {
        (r["o_orderpriority"], r["quartile"]): r["value_quarter_c"]
        for r in QUERIES["orders_quartiles_cont"](spark, SF).collect()
    }
    for prio in sorted({p for p, _ in vals}):
        xs = np.array(sorted(c for p, c in vals if p == prio), dtype=np.int64)
        for k in (1, 2, 3):
            expect = float(np.quantile(xs, k / 4, method="linear")) * 4
            assert got[(prio, k)] == round(expect), (prio, k)


def test_mood_median_recompute(spark):
    from bytesprocessor_spark.queries import QUERIES

    vals = duckdb.sql(
        f"""SELECT event_type, CAST(ROUND(value * 100) AS BIGINT)
        FROM '{SF}/events.parquet'"""
    ).fetchall()
    xs = sorted(c for _, c in vals)
    med = xs[(len(xs) + 1) // 2 - 1]  # percentile_disc(0.5)
    got = {
        r["event_type"]: r
        for r in QUERIES["events_mood_median"](spark, SF).collect()
    }
    types = sorted({t for t, _ in vals})
    ta = sum(1 for _, c in vals if c > med)
    tb = len(vals) - ta
    n = len(vals)
    total = 0
    for t in types:
        na = sum(1 for tt, c in vals if tt == t and c > med)
        nb = sum(1 for tt, c in vals if tt == t and c <= med)
        ri = na + nb
        ea, eb = ri * ta / n, ri * tb / n
        term = (na - ea) ** 2 / ea + (nb - eb) ** 2 / eb
        r = got[t]
        assert (r["n_above"], r["n_below"]) == (na, nb)
        assert r["term_micro"] == round(term * 1e6)
        total += round(term * 1e6)
    assert got[types[0]]["chi2_micro"] == total


def test_jonckheere_brute_force(spark):
    from bytesprocessor_spark.queries import QUERIES

    vals = duckdb.sql(
        f"""SELECT CAST(SUBSTRING(o_orderpriority, 1, 1) AS BIGINT),
               CAST(ROUND(o_totalprice * 100) AS BIGINT)
        FROM '{SF}/orders.parquet'"""
    ).fetchall()
    groups: dict[int, list[int]] = {}
    for g, c in vals:
        groups.setdefault(int(g), []).append(int(c))
    j = ties = 0
    gs = sorted(groups)
    for i, ga in enumerate(gs):
        for gb in gs[i + 1 :]:
            for x in groups[ga]:
                for y in groups[gb]:
                    if y > x:
                        j += 1
                    elif y == x:
                        ties += 1
    r = QUERIES["orders_jonckheere"](spark, SF).collect()[0]
    assert (r["j_stat"], r["tie_pairs"]) == (j, ties)
    nn = len(vals)
    sn2 = sum(len(v) ** 2 for v in groups.values())
    sn23 = sum(len(v) ** 2 * (2 * len(v) + 3) for v in groups.values())
    z = (j + ties / 2 - (nn * nn - sn2) / 4) / math.sqrt(
        (nn * nn * (2 * nn + 3) - sn23) / 72
    )
    assert r["z_milli"] == round(z * 1000)
