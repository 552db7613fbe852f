"""Round-11 batch properties: pure-Python third-implementation
recomputes at sf0.001 (so a shared Spark/DuckDB misreading of a
formula cannot self-certify) plus structural invariants for the Avro
round-trip and the QUALIFY dedup idiom."""

from __future__ import annotations

import math
from collections import defaultdict

import duckdb

SF = "/root/testdata/sf0.001"


def _rows(q):
    return duckdb.sql(q).fetchall()


# ---------------------------------------------------------------------------
# A153 KPSS
# ---------------------------------------------------------------------------

def test_kpss_recompute(spark):
    from bytesprocessor_spark.queries import QUERIES

    got = {
        r["event_type"]: r for r in QUERIES["events_kpss"](spark, SF).collect()
    }
    series = defaultdict(list)
    for t, _, x in _rows(
        f"""SELECT event_type, CAST(ts AS DATE) d, COUNT(*) FROM
        '{SF}/events.parquet' GROUP BY 1,2 ORDER BY 1,2"""
    ):
        series[t].append(int(x))
    assert set(got) == set(series)
    for t, xs in series.items():
        n, tot = len(xs), sum(xs)
        devs = [n * x - tot for x in xs]
        ps, acc = [], 0
        for d in devs:
            acc += d
            ps.append(acc)
        sp2, sd2 = sum(p * p for p in ps), sum(d * d for d in devs)
        want = sp2 * 1_000_000 // (n * sd2) if sd2 else None
        assert got[t]["n"] == n
        assert got[t]["kpss_micro"] == want, t


# ---------------------------------------------------------------------------
# A154 Cramér-von-Mises / A155 Ansari-Bradley share the rank machinery
# ---------------------------------------------------------------------------

def _parity_samples():
    """(type -> (cents list for even users, odd users))."""
    rows = _rows(
        f"""SELECT event_type, user_id % 2, CAST(ROUND(value*100) AS BIGINT)
        FROM '{SF}/events.parquet'"""
    )
    out = defaultdict(lambda: ([], []))
    for t, g, c in rows:
        out[t][int(g)].append(int(c))
    return out


def _midranks2(combined):
    """value -> 2*midrank (exact int) for a sorted combined list."""
    r2 = {}
    i = 0
    sc = sorted(combined)
    while i < len(sc):
        j = i
        while j < len(sc) and sc[j] == sc[i]:
            j += 1
        # midrank = (first_rank + last_rank)/2; 2*mr = 2*(i+1) + (j-i) - 1
        r2[sc[i]] = 2 * (i + 1) + (j - i) - 1
        i = j
    return r2


def test_cramer_von_mises_recompute(spark):
    from bytesprocessor_spark.queries import QUERIES

    got = {
        r["event_type"]: r
        for r in QUERIES["events_cramer_von_mises"](spark, SF).collect()
    }
    for t, (ev, od) in _parity_samples().items():
        n, m = len(ev), len(od)
        r2 = _midranks2(ev + od)
        q0 = sum(
            (r2[c] - 2 * i) ** 2 for i, c in enumerate(sorted(ev), start=1)
        )
        q1 = sum(
            (r2[c] - 2 * j) ** 2 for j, c in enumerate(sorted(od), start=1)
        )
        nn = n + m
        T = (n * q0 + m * q1) / 4.0 / (float(nn) * n * m) - (
            4.0 * n * m - 1.0
        ) / (6.0 * nn)
        assert got[t]["n"] == n and got[t]["m"] == m
        assert abs(got[t]["t_micro"] - round(T * 1_000_000)) <= 1, t


def test_ansari_bradley_recompute(spark):
    from bytesprocessor_spark.queries import QUERIES

    got = {
        r["event_type"]: r
        for r in QUERIES["events_ansari_bradley"](spark, SF).collect()
    }
    for t, (ev, od) in _parity_samples().items():
        n, m = len(ev), len(od)
        nn = n + m
        r2 = _midranks2(ev + od)
        a2 = {c: min(r2[c], 2 * (nn + 1) - r2[c]) for c in r2}
        ab2 = sum(a2[c] for c in ev)
        a2sum = sum(a2[c] for c in ev) + sum(a2[c] for c in od)
        sd2 = sum((a2[c] * nn - a2sum) ** 2 for c in ev + od)
        z = (ab2 * nn - n * a2sum) * math.sqrt(
            nn * (nn - 1.0) / (float(n) * m * sd2)
        )
        assert got[t]["ab2"] == ab2
        assert abs(got[t]["z_milli"] - round(z * 1000)) <= 1, t


# ---------------------------------------------------------------------------
# A156 Bartlett
# ---------------------------------------------------------------------------

def test_bartlett_recompute(spark):
    from bytesprocessor_spark.queries import QUERIES

    rows = QUERIES["events_bartlett"](spark, SF).collect()
    groups = defaultdict(list)
    for t, c in _rows(
        f"""SELECT event_type, CAST(ROUND(value*100) AS BIGINT)
        FROM '{SF}/events.parquet'"""
    ):
        groups[t].append(int(c))
    terms, ssum, nn, invsum = {}, 0, 0, 0
    for t, cs in groups.items():
        n = len(cs)
        ssq = (n * sum(c * c for c in cs) - sum(cs) ** 2) // n
        terms[t] = round((n - 1) * (math.log(ssq) - math.log(n - 1)) * 1e6)
        ssum += ssq
        nn += n
        invsum += 10**12 // (n - 1)
    k = len(groups)
    sumterm = sum(terms.values())
    chi2 = (
        (nn - k) * (math.log(ssum) - math.log(nn - k)) - sumterm / 1e6
    ) / (1.0 + (invsum / 1e12 - 1.0 / (nn - k)) / (3.0 * (k - 1)))
    for r in rows:
        assert r["term_micro"] == terms[r["event_type"]]
        assert abs(r["chi2_milli"] - round(chi2 * 1000)) <= 1


# ---------------------------------------------------------------------------
# A157 variance ratio
# ---------------------------------------------------------------------------

def test_variance_ratio_recompute(spark):
    from bytesprocessor_spark.queries import QUERIES
    from bytesprocessor_spark.queries_r11 import _VR_LAGS

    got = {r["q"]: r for r in QUERIES["events_variance_ratio"](spark, SF).collect()}
    days = dict(
        (d, int(x))
        for d, x in _rows(
            f"""SELECT CAST(ts AS DATE) d, COUNT(*) FROM
            '{SF}/events.parquet' GROUP BY 1"""
        )
    )
    d0, d1 = min(days), max(days)
    n = (d1 - d0).days
    xs = [days.get(d0 + __import__("datetime").timedelta(days=i), 0)
          for i in range(n + 1)]
    drift = xs[-1] - xs[0]
    sb = sum((n * (xs[t] - xs[t - 1]) - drift) ** 2 for t in range(1, n + 1))
    mb = n
    for q in _VR_LAGS:
        s2 = sum(
            (n * (xs[t] - xs[t - q]) - q * drift) ** 2
            for t in range(q, n + 1)
        )
        mq = n - q + 1
        want = s2 * mb * 1000 // (sb * mq * q) if sb else None
        assert got[q]["vr_milli"] == want, q
        assert got[q]["m"] == mq


# ---------------------------------------------------------------------------
# A158 Page trend
# ---------------------------------------------------------------------------

def test_page_trend_recompute(spark):
    from bytesprocessor_spark.queries import QUERIES

    rows = QUERIES["orders_page_trend"](spark, SF).collect()
    cells = defaultdict(dict)
    for blk, j, cc in _rows(
        f"""SELECT DATE_DIFF('day', DATE '1970-01-01', o_orderdate) % 7,
        CAST(SUBSTRING(o_orderpriority,1,1) AS BIGINT),
        SUM(CAST(ROUND(o_totalprice*100) AS BIGINT))
        FROM '{SF}/orders.parquet' GROUP BY 1,2"""
    ):
        cells[int(blk)][int(j)] = int(cc)
    r2 = defaultdict(int)
    for blk, jc in cells.items():
        vals = sorted(jc.values())
        for j, cc in jc.items():
            lo = vals.index(cc) + 1
            hi = len(vals) - vals[::-1].index(cc)
            r2[j] += lo + hi  # 2 * midrank
    b, k = len(cells), len(r2)
    l2 = sum(j * v for j, v in r2.items())
    mean = b * k * (k + 1) ** 2 / 4.0
    var = b * (k**3 - k) ** 2 / (144.0 * (k - 1))
    z = (l2 / 2.0 - mean) / math.sqrt(var)
    for r in rows:
        assert r["rank2_sum"] == r2[r["j"]]
        assert r["l2"] == l2
        assert abs(r["z_milli"] - round(z * 1000)) <= 1


# ---------------------------------------------------------------------------
# A159 Benjamini-Yekutieli: monotone q-values, BY <= raw scaling, and
# the rejection region is a prefix of the p-ranking
# ---------------------------------------------------------------------------

def test_by_structure(spark):
    from bytesprocessor_spark.queries import QUERIES

    rows = QUERIES["events_benjamini_yekutieli"](spark, SF).collect()
    m = len(rows)
    c = sum(10**12 // i for i in range(1, m + 1)) / 1e12
    qs = [r["qval_micro"] for r in rows]
    assert qs == sorted(qs), "q-values must be monotone in p-rank"
    rej = [r["rejected"] for r in rows]
    assert rej == sorted(rej, reverse=True), "rejections form a prefix"
    for r in rows:
        raw = min(1_000_000, round(r["p_micro"] * m * c / r["rank"]))
        assert r["qval_micro"] <= raw + 1


# ---------------------------------------------------------------------------
# EV44 Brier decomposition: identity REL - RES + UNC ~= Brier
# ---------------------------------------------------------------------------

def test_brier_decomposition_identity(spark):
    from bytesprocessor_spark.queries import QUERIES

    rows = QUERIES["eval_brier_decomposition"](spark, SF).collect()
    r0 = rows[0]
    # recompute the raw Brier score from the pinned pseudo-model
    raw = _rows(
        f"""WITH b AS (SELECT CAST(label % 2 AS BIGINT) y,
          CAST(ROUND(CAST(embedding[1] AS DOUBLE)*1000000) AS BIGINT)
          + CAST(ROUND(CAST(embedding[2] AS DOUBLE)*1000000) AS BIGINT) s
          FROM '{SF}/embeddings.parquet'),
        mm AS (SELECT MIN(s) lo, MAX(s) hi FROM b)
        SELECT AVG(POW((s - lo) * 1000000 // GREATEST(hi - lo, 1)
                       / 1000000.0 - y, 2)) FROM b, mm"""
    )[0][0]
    lhs = (
        r0["reliability_micro"] - r0["resolution_micro"]
        + r0["uncertainty_micro"]
    )
    # within-bin forecast variance (ignored by the 3-term form) plus
    # quantization bounds the gap
    assert abs(lhs - raw * 1e6) < 25_000
    n_total = sum(r["n"] for r in rows)
    assert n_total == _rows(f"SELECT COUNT(*) FROM '{SF}/embeddings.parquet'")[0][0]


# ---------------------------------------------------------------------------
# SC7 safety stock: ladder ordering + exact recompute for one brand
# ---------------------------------------------------------------------------

def test_safety_stock_recompute(spark):
    from bytesprocessor_spark.queries import QUERIES
    from bytesprocessor_spark.queries_r11 import _SS_LEAD_DAYS

    rows = QUERIES["part_safety_stock"](spark, SF).collect()
    assert rows, "brand readout must be non-empty"
    for r in rows:
        assert r["ss90_c"] <= r["ss95_c"] <= r["ss99_c"]
        assert r["rop95_c"] >= r["ss95_c"]
    brand = rows[0]["p_brand"]
    daily = dict(
        (d, int(q))
        for d, q in _rows(
            f"""SELECT CAST(l.l_shipdate AS DATE) d,
            SUM(CAST(ROUND(l.l_quantity*100) AS BIGINT))
            FROM '{SF}/lineitem.parquet' l
            JOIN '{SF}/part.parquet' p ON l.l_partkey = p.p_partkey
            WHERE p.p_brand = '{brand}' GROUP BY 1"""
        )
    )
    span = _rows(
        f"""SELECT MIN(CAST(l_shipdate AS DATE)), MAX(CAST(l_shipdate AS DATE))
        FROM '{SF}/lineitem.parquet'"""
    )[0]
    import datetime

    n = (span[1] - span[0]).days + 1
    xs = [
        daily.get(span[0] + datetime.timedelta(days=i), 0) for i in range(n)
    ]
    var_num = n * sum(x * x for x in xs) - sum(xs) ** 2
    ss95 = round(1.644854 * math.sqrt(_SS_LEAD_DAYS * var_num) / n)
    assert rows[0]["n_days"] == n
    assert abs(rows[0]["ss95_c"] - ss95) <= 1


# ---------------------------------------------------------------------------
# SQL10 QUALIFY dedup: one row per customer, the max (date, key) order
# ---------------------------------------------------------------------------

def test_qualify_dedup_structure(spark):
    from bytesprocessor_spark.queries import QUERIES

    rows = QUERIES["sql_qualify_dedup"](spark, SF).collect()
    keys = [r["o_custkey"] for r in rows]
    assert len(keys) == len(set(keys)), "exactly one row per customer"
    want = dict(
        (ck, (str(d), ok))
        for ck, d, ok in _rows(
            f"""SELECT o_custkey, o_orderdate, o_orderkey
            FROM '{SF}/orders.parquet'
            QUALIFY ROW_NUMBER() OVER (PARTITION BY o_custkey
                ORDER BY o_orderdate DESC, o_orderkey DESC) = 1"""
        )
    )
    for r in rows[:50]:
        d, ok = want[r["o_custkey"]]
        assert r["odate"] == d[:10] and r["o_orderkey"] == ok


# ---------------------------------------------------------------------------
# A160 Quade
# ---------------------------------------------------------------------------

def test_quade_recompute(spark):
    from bytesprocessor_spark.queries import QUERIES

    got = {r["event_type"]: r for r in QUERIES["events_quade"](spark, SF).collect()}
    cells = defaultdict(dict)
    for d, t, x in _rows(
        f"""SELECT CAST(ts AS DATE), event_type, COUNT(*) FROM
        '{SF}/events.parquet' GROUP BY 1,2"""
    ):
        cells[d][t] = int(x)
    types = sorted({t for jc in cells.values() for t in jc})
    n, k = len(cells), len(types)
    # within-day midranks (2r) over the dense grid
    mr2 = {}
    for d in cells:
        xs = [cells[d].get(t, 0) for t in types]
        sx = sorted(xs)
        for t in types:
            x = cells[d].get(t, 0)
            lo = sx.index(x) + 1
            hi = len(sx) - sx[::-1].index(x)
            mr2[(d, t)] = lo + hi
    # across-day range midranks (2Q)
    rngs = {d: max(cells[d].get(t, 0) for t in types)
               - min(cells[d].get(t, 0) for t in types) for d in cells}
    sr = sorted(rngs.values())
    q2 = {}
    for d, r in rngs.items():
        lo = sr.index(r) + 1
        hi = len(sr) - sr[::-1].index(r)
        q2[d] = lo + hi
    s4 = {t: sum(q2[d] * (mr2[(d, t)] - (k + 1)) for d in cells)
          for t in types}
    sa = sum(q2[d] ** 2 * (mr2[(d, t)] - (k + 1)) ** 2
             for d in cells for t in types)
    sb = sum(v * v for v in s4.values())
    want_f = (n - 1) * sb * 1000 // (n * sa - sb) if n * sa > sb else None
    for t in types:
        assert got[t]["s4"] == s4[t], t
        assert got[t]["f_milli"] == want_f


# ---------------------------------------------------------------------------
# A161 Lilliefors: D bounds + degenerate-free + cross-type sanity
# ---------------------------------------------------------------------------

def test_lilliefors_bounds(spark):
    from bytesprocessor_spark.queries import QUERIES

    rows = QUERIES["events_lilliefors"](spark, SF).collect()
    assert rows
    for r in rows:
        # D in (0, 1e6); uniform-ish cents values are far from normal,
        # so D should comfortably exceed the 1% critical 1.031/sqrt(n)
        assert 0 < r["d_micro"] < 1_000_000
        crit = 1.031 / math.sqrt(r["n"])
        assert r["d_micro"] > crit * 1e6 * 0.5


# ---------------------------------------------------------------------------
# A162 spectral flatness
# ---------------------------------------------------------------------------

def test_spectral_flatness_recompute(spark):
    from bytesprocessor_spark.queries import QUERIES
    from bytesprocessor_spark.queries_r11 import _SPECTRAL_FREQS

    rows = QUERIES["events_spectral_flatness"](spark, SF).collect()
    assert [r["f"] for r in rows] == list(range(1, _SPECTRAL_FREQS + 1))
    days = dict(
        (d, int(x))
        for d, x in _rows(
            f"""SELECT CAST(ts AS DATE), COUNT(*) FROM
            '{SF}/events.parquet' GROUP BY 1"""
        )
    )
    import datetime

    d0, d1 = min(days), max(days)
    nn = (d1 - d0).days + 1
    xs = [days.get(d0 + datetime.timedelta(days=i), 0) for i in range(nn)]
    lns = {}
    pws = {}
    for f in range(1, _SPECTRAL_FREQS + 1):
        cf = sum(
            x * round(math.cos(2.0 * math.pi * f * t / nn) * 1e6)
            for t, x in enumerate(xs)
        )
        sf_ = sum(
            x * round(math.sin(2.0 * math.pi * f * t / nn) * 1e6)
            for t, x in enumerate(xs)
        )
        pws[f] = cf * cf + sf_ * sf_
        lns[f] = round(math.log(pws[f]) * 1e6)
    for r in rows:
        assert r["ln_p_micro"] == lns[r["f"]], r["f"]
    flat = math.exp(sum(lns.values()) / (_SPECTRAL_FREQS * 1e6)) / (
        sum(pws.values()) / _SPECTRAL_FREQS
    )
    assert abs(rows[0]["flatness_micro"] - round(flat * 1e6)) <= 1


# ---------------------------------------------------------------------------
# GR17 double sweep: BFS invariants
# ---------------------------------------------------------------------------

def test_double_sweep_structure(spark):
    from bytesprocessor_spark.queries import QUERIES
    from bytesprocessor_spark.queries_r11 import _DIAM_DEPTH

    rows = QUERIES["graph_double_sweep"](spark, SF).collect()
    dists = [r["dist"] for r in rows]
    assert dists == sorted(dists) and dists[0] == 0
    assert rows[0]["n_nodes"] == 1, "level 0 is the sweep-2 root alone"
    assert rows[0]["node_checksum"] == rows[0]["sweep2_root"]
    ecc = rows[0]["ecc_lb"]
    assert ecc == max(dists) and ecc <= _DIAM_DEPTH
    # sweep2 root is a real node of the bipartite packing
    assert rows[0]["sweep2_root"] >= 0


# ---------------------------------------------------------------------------
# A163 seasonal Mann-Kendall / A164 sign test recomputes
# ---------------------------------------------------------------------------

def test_seasonal_mann_kendall_recompute(spark):
    from bytesprocessor_spark.queries import QUERIES

    got = {
        r["event_type"]: r
        for r in QUERIES["events_seasonal_mann_kendall"](spark, SF).collect()
    }
    series = defaultdict(list)
    for t, day, x in _rows(
        f"""SELECT event_type,
        DATE_DIFF('day', DATE '1970-01-01', CAST(ts AS DATE)), COUNT(*)
        FROM '{SF}/events.parquet' GROUP BY 1,2 ORDER BY 1,2"""
    ):
        series[t].append((int(day), int(x)))
    for t, pts in series.items():
        S = 0
        var18 = 0
        for wd in range(7):
            xs = [x for d, x in pts if d % 7 == wd]
            nw = len(xs)
            S += sum(
                (xs[j] > xs[i]) - (xs[j] < xs[i])
                for i in range(nw)
                for j in range(i + 1, nw)
            )
            var18 += nw * (nw - 1) * (2 * nw + 5)
            ties = defaultdict(int)
            for x in xs:
                ties[x] += 1
            var18 -= sum(
                tt * (tt - 1) * (2 * tt + 5) for tt in ties.values() if tt > 1
            )
        assert got[t]["s_stat"] == S, t
        assert got[t]["var18"] == var18, t
        if var18 > 0:
            zc = S - 1 if S > 0 else (S + 1 if S < 0 else 0)
            z = zc / math.sqrt(var18 / 18.0)
            assert abs(got[t]["z_milli"] - round(z * 1000)) <= 1, t


def test_sign_test_recompute(spark):
    from bytesprocessor_spark.queries import QUERIES

    got = {
        r["event_type"]: r
        for r in QUERIES["events_sign_test"](spark, SF).collect()
    }
    daily = defaultdict(dict)
    for t, day, x in _rows(
        f"""SELECT event_type,
        DATE_DIFF('day', DATE '1970-01-01', CAST(ts AS DATE)), COUNT(*)
        FROM '{SF}/events.parquet' GROUP BY 1,2"""
    ):
        daily[t][int(day)] = int(x)
    for t, dd in daily.items():
        weeks = defaultdict(lambda: [0, 0, 0, 0])  # swe, dwe, swd, dwd
        for day, x in dd.items():
            w = day // 7
            if (day + 4) % 7 in (0, 6):
                weeks[w][0] += x
                weeks[w][1] += 1
            else:
                weeks[w][2] += x
                weeks[w][3] += 1
        npos = nneg = 0
        for swe, dwe, swd, dwd in weeks.values():
            if dwe == 0 or dwd == 0:
                continue
            if swe * dwd > swd * dwe:
                npos += 1
            elif swe * dwd < swd * dwe:
                nneg += 1
        assert got[t]["n_pos"] == npos and got[t]["n_neg"] == nneg, t


# ---------------------------------------------------------------------------
# EV45 weighted kappa / GR18 harmonic centrality
# ---------------------------------------------------------------------------

def test_weighted_kappa_recompute(spark):
    from bytesprocessor_spark.queries import QUERIES

    r = QUERIES["eval_weighted_kappa"](spark, SF).collect()[0]
    classes = sorted(
        t for (t,) in _rows(
            f"SELECT DISTINCT event_type FROM '{SF}/events.parquet'"
        )
    )
    idx = {c: i for i, c in enumerate(classes)}
    nxt = {"click": "error", "error": "purchase", "purchase": "signup",
           "signup": "view", "view": "click"}
    conf = defaultdict(int)
    for t, eid in _rows(
        f"SELECT event_type, event_id FROM '{SF}/events.parquet'"
    ):
        r2 = nxt[t] if eid % 5 == 0 else t
        conf[(idx[t], idx[r2])] += 1
    n = sum(conf.values())
    row = defaultdict(int)
    col = defaultdict(int)
    for (i, j), c in conf.items():
        row[i] += c
        col[j] += c
    lin_o = sum(abs(i - j) * c for (i, j), c in conf.items())
    quad_o = sum((i - j) ** 2 * c for (i, j), c in conf.items())
    lin_e = sum(abs(i - j) * row[i] * col[j] for i in row for j in col)
    quad_e = sum((i - j) ** 2 * row[i] * col[j] for i in row for j in col)
    assert r["n"] == n and r["lin_o"] == lin_o and r["quad_o"] == quad_o
    assert r["kappa_linear_micro"] == 1_000_000 - lin_o * n * 1_000_000 // lin_e
    assert (
        r["kappa_quadratic_micro"]
        == 1_000_000 - quad_o * n * 1_000_000 // quad_e
    )
    # quadratic must forgive near misses more than linear here
    assert r["kappa_quadratic_micro"] >= r["kappa_linear_micro"] - 1


def test_harmonic_centrality_consistency(spark):
    from bytesprocessor_spark.queries import QUERIES

    # harmonic score must equal the exact fold over the GR4 reach
    # histogram (same traversal, same quantization)
    reach = QUERIES["graph_bfs_reach"](spark, SF).collect()
    har = {
        r["seed_custkey"]: r
        for r in QUERIES["graph_harmonic_centrality"](spark, SF).collect()
    }
    agg = defaultdict(lambda: [0, 0])
    for r in reach:
        if r["dist"] > 0:
            agg[r["seed_custkey"]][0] += r["n_nodes"]
            agg[r["seed_custkey"]][1] += (1_000_000 // r["dist"]) * r["n_nodes"]
    assert set(har) == set(agg)
    for k, (nr, h) in agg.items():
        assert har[k]["n_reached"] == nr
        assert har[k]["harmonic_micro"] == h
