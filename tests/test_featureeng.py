"""Independent-recompute and invariant tests for the round-5
feature-engineering batch (L13 DoReMi mixture, L2f source matrix,
L4q distinctive terms, FE1 quantile bins, W12 rolling robust).
Exact cross-engine values are pinned by the DuckDB oracle rows; these
re-derive the semantics in plain Python on the sf0.001 fixtures."""

from __future__ import annotations

import hashlib
import math
import re
from collections import Counter, defaultdict
from datetime import datetime

from bytesprocessor_spark.queries import QUERIES
from bytesprocessor_spark.sources.tables import load_table
from tests.conftest import SF_DIR


def _rnd(x: float) -> int:
    """ROUND half-away-from-zero (DuckDB ROUND / Spark F.round)."""
    return int(math.copysign(math.floor(abs(x) + 0.5), x))


def _toks(text: str) -> list[str]:
    return re.findall(r"[a-z0-9]+", text.lower())


def _word3(text: str) -> set[str]:
    t = _toks(text)
    return {" ".join(t[i : i + 3]) for i in range(max(len(t) - 2, 1))}


# ---------------------------------------------------------------------------
# L13 DoReMi mixture
# ---------------------------------------------------------------------------

def test_doremi_matches_independent_python_recompute(spark):
    docs = load_table(spark, SF_DIR, "documents").select("source", "text").collect()
    cnt: Counter = Counter()
    per_src_toks: dict[str, list[str]] = defaultdict(list)
    for r in docs:
        t = _toks(r.text)
        cnt.update(t)
        per_src_toks[r.source].extend(t)
    n = sum(cnt.values())
    lp = {tok: _rnd(math.log(n / c) * 1000000) for tok, c in cnt.items()}
    rows = {}
    for src, toks in per_src_toks.items():
        n_tokens = len(toks)
        slp = sum(lp[t] for t in toks)
        mean = slp // n_tokens
        e_q = _rnd(math.exp(mean / 1000000.0) * 1000000)
        rows[src] = (n_tokens, mean, e_q)
    ze = sum(e for _, _, e in rows.values())
    nt = sum(ntk for ntk, _, _ in rows.values())
    expected = {}
    for src, (n_tokens, mean, e_q) in rows.items():
        w = e_q * 1000000 // ze
        b = n_tokens * 1000000 // nt
        expected[src] = (n_tokens, mean, w, b, w * 10000 // b)
    got = QUERIES["corpus_doremi_mixture"](spark, SF_DIR).collect()
    assert {
        r.source: (r.n_tokens, r.mean_surp_micro, r.weight_ppm, r.baseline_ppm, r.boost_bp)
        for r in got
    } == expected
    # softmax identity: weights are a probability vector (up to the
    # K-domain floor-division loss) and diverge from token share
    assert 1000000 - len(got) <= sum(r.weight_ppm for r in got) <= 1000000
    assert 1000000 - len(got) <= sum(r.baseline_ppm for r in got) <= 1000000


# ---------------------------------------------------------------------------
# L2f cross-source contamination matrix
# ---------------------------------------------------------------------------

def test_source_matrix_matches_python_pair_scan(spark):
    docs = (
        load_table(spark, SF_DIR, "documents")
        .select("doc_id", "source", "text")
        .collect()
    )
    sh = {r.doc_id: _word3(r.text) for r in docs}
    src = {r.doc_id: r.source for r in docs}
    ids = sorted(sh)
    exp_pairs: Counter = Counter()
    exp_ck: Counter = Counter()
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(sh[a] & sh[b])
            if inter and inter / (len(sh[a]) + len(sh[b]) - inter) >= 0.5:
                key = tuple(sorted((src[a], src[b])))
                exp_pairs[key] += 1
                exp_ck[key] += a + b
    got = QUERIES["dedup_source_matrix"](spark, SF_DIR).collect()
    assert {(r.source_a, r.source_b): (r.n_pairs, r.pair_checksum) for r in got} == {
        k: (exp_pairs[k], exp_ck[k]) for k in exp_pairs
    }
    # matrix orientation: upper-triangular keys only
    assert all(r.source_a <= r.source_b for r in got)


# ---------------------------------------------------------------------------
# L4q distinctive terms
# ---------------------------------------------------------------------------

def test_distinctive_terms_matches_python_recompute(spark):
    docs = load_table(spark, SF_DIR, "documents").select("source", "text").collect()
    sw: Counter = Counter()
    for r in docs:
        for t in _toks(r.text):
            sw[(r.source, t)] += 1
    wt: Counter = Counter()
    st: Counter = Counter()
    for (s, t), y in sw.items():
        wt[t] += y
        st[s] += y
    n = sum(wt.values())
    scored = defaultdict(list)
    for (s, t), y in sw.items():
        y_w, n_s = wt[t], st[s]
        ln1 = _rnd(math.log((y + y_w) / (n_s + n - (y + y_w))) * 1000000)
        ln2 = _rnd(
            math.log(((y_w - y) + y_w) / ((n - n_s) + n - ((y_w - y) + y_w))) * 1000000
        )
        scored[s].append((ln1 - ln2, t, y))
    expected = []
    for s in sorted(scored):
        top = sorted(scored[s], key=lambda x: (-x[0], x[1]))[:3]
        for rk, (d, t, y) in enumerate(top, 1):
            expected.append((s, rk, t, y, d))
    got = QUERIES["text_distinctive_terms"](spark, SF_DIR).collect()
    assert [(r.source, r.rk, r.tok, r.y_sw, r.delta_micro) for r in got] == expected


# ---------------------------------------------------------------------------
# FE1 quantile bins
# ---------------------------------------------------------------------------

def test_quantile_bins_matches_python_recompute(spark):
    orders = load_table(spark, SF_DIR, "orders").select("o_totalprice").collect()
    cents = [_rnd(r.o_totalprice * 100) for r in orders]
    hist: Counter = Counter(c // 10000 for c in cents)
    bands = sorted(hist)
    n = len(cents)
    cuts = []
    for k in range(1, 10):
        cum = 0
        for b in bands:
            cum += hist[b]
            if cum * 10 >= k * n:
                cuts.append(b)
                break
    agg = defaultdict(lambda: [0, math.inf, -math.inf, 0])
    for c in cents:
        bin_ = 1 + sum(1 for cb in cuts if c // 10000 > cb)
        a = agg[bin_]
        a[0] += 1
        a[1] = min(a[1], c)
        a[2] = max(a[2], c)
        a[3] += c
    got = QUERIES["orders_quantile_bins"](spark, SF_DIR).collect()
    assert {r.bin: [r.n_rows, r.min_cents, r.max_cents, r.sum_cents] for r in got} == dict(
        agg
    )
    # equi-depth up to band ties: bins partition the table and are
    # value-ordered with no overlap
    assert sum(r.n_rows for r in got) == n
    for a, b in zip(got, got[1:]):
        assert a.max_cents < b.min_cents


# ---------------------------------------------------------------------------
# W12 rolling robust outliers
# ---------------------------------------------------------------------------

def test_rolling_robust_matches_python_recompute(spark):
    ev = (
        load_table(spark, SF_DIR, "events")
        .where("event_type = 'purchase'")
        .select("event_id", "user_id", "ts", "value")
        .collect()
    )
    by_user = defaultdict(list)
    for r in ev:
        by_user[r.user_id].append(r)
    expected = {}
    for u, rows in by_user.items():
        rows.sort(key=lambda r: (r.ts, r.event_id))
        vals = [_rnd(r.value * 100) for r in rows]
        for i, r in enumerate(rows):
            frame = sorted(vals[max(0, i - 8) : i + 1])
            m = len(frame)
            med = frame[(m + 1) // 2 - 1]
            mad = sorted(abs(x - med) for x in frame)[(m + 1) // 2 - 1]
            expected[r.event_id] = (u, m, med, mad, abs(vals[i] - med) > 3 * mad)
    got = QUERIES["events_rolling_robust"](spark, SF_DIR).collect()
    assert len(got) == len(expected)
    assert {
        r.event_id: (r.user_id, r.n, r.med_cents, r.mad_cents, r.is_outlier)
        for r in got
    } == expected


# ---------------------------------------------------------------------------
# A32 KMV distinct sketch
# ---------------------------------------------------------------------------

def _md5_52(v) -> int:
    import hashlib

    return int(hashlib.md5(str(v).encode()).hexdigest()[:13], 16)


def test_kmv_matches_python_recompute_and_merges(spark):
    keys = {
        r.l_partkey
        for r in load_table(spark, SF_DIR, "lineitem").select("l_partkey").collect()
    }
    hashes = sorted({_md5_52(k) for k in keys})
    bottom = hashes[:64]
    n_k, kth = len(bottom), bottom[-1]
    est = (n_k - 1) * (1 << 52) // kth
    got = QUERIES["agg_kmv_distinct"](spark, SF_DIR).collect()[0]
    assert (got.n_k, got.kth_hash, got.est_distinct, got.exact_distinct) == (
        n_k,
        kth,
        est,
        len(keys),
    )
    assert got.err_ppm == abs(est - len(keys)) * 1000000 // len(keys)
    # mergeability: the union of two shards' bottom-k re-trimmed to k
    # IS the global bottom-k — the property that makes KMV a sketch
    ks = sorted(keys)
    half_a = sorted({_md5_52(k) for k in ks[::2]})[:64]
    half_b = sorted({_md5_52(k) for k in ks[1::2]})[:64]
    assert sorted(set(half_a) | set(half_b))[:64] == bottom


# ---------------------------------------------------------------------------
# A33 ABC / Pareto
# ---------------------------------------------------------------------------

def test_abc_pareto_matches_python_recompute(spark):
    orders = (
        load_table(spark, SF_DIR, "orders")
        .select("o_custkey", "o_totalprice")
        .collect()
    )
    rev: Counter = Counter()
    for r in orders:
        rev[r.o_custkey] += _rnd(r.o_totalprice * 100)
    total = sum(rev.values())
    agg = defaultdict(lambda: [0, 0, 0])
    cum = 0
    for ck in sorted(rev, key=lambda c: (-rev[c], c)):
        cum += rev[ck]
        ppm = cum * 1000000 // total
        cls = "A" if ppm <= 800000 else ("B" if ppm <= 950000 else "C")
        a = agg[cls]
        a[0] += 1
        a[1] += rev[ck]
        a[2] = max(a[2], ppm)
    got = QUERIES["orders_abc_pareto"](spark, SF_DIR).collect()
    assert {r.abc_class: [r.n_customers, r.revenue_cents, r.max_cum_ppm] for r in got} == dict(agg)
    # the tail class closes the distribution exactly
    assert max(r.max_cum_ppm for r in got) == 1000000
    assert sum(r.revenue_cents for r in got) == total


# ---------------------------------------------------------------------------
# Q10 l-diversity
# ---------------------------------------------------------------------------

def test_l_diversity_matches_python_recompute(spark):
    cust = (
        load_table(spark, SF_DIR, "customer")
        .select("c_nationkey", "c_acctbal", "c_mktsegment")
        .collect()
    )
    groups = defaultdict(set)
    sizes: Counter = Counter()
    for r in cust:
        c = _rnd(r.c_acctbal * 100)
        # engine integer division truncates toward zero (Spark div,
        # DuckDB // on BIGINT) — Python // floors, so trunc explicitly
        qi = (r.c_nationkey, int(math.copysign(abs(c) // 100000, c)))
        groups[qi].add(r.c_mktsegment)
        sizes[qi] += 1
    total = sum(sizes.values())
    agg = defaultdict(lambda: [0, 0, math.inf, 0])
    for qi, seg in groups.items():
        l = len(seg)
        b = "l=1" if l == 1 else ("l=2" if l == 2 else "l>=3")
        a = agg[b]
        a[0] += 1
        a[1] += sizes[qi]
        a[2] = min(a[2], l)
        a[3] = max(a[3], l)
    got = QUERIES["privacy_l_diversity"](spark, SF_DIR).collect()
    assert {
        r.l_bucket: [r.n_groups, r.n_rows, r.min_l, r.max_l] for r in got
    } == {b: a for b, a in agg.items()}
    for r in got:
        assert r.rows_ppm == agg[r.l_bucket][1] * 1000000 // total


# ---------------------------------------------------------------------------
# A34 autocorrelation
# ---------------------------------------------------------------------------

def test_acf_matches_python_recompute(spark):
    ev = (
        load_table(spark, SF_DIR, "events")
        .select("event_type", "ts", "value")
        .collect()
    )
    daily = defaultdict(Counter)
    for r in ev:
        daily[r.event_type][r.ts.date()] += _rnd(r.value * 100)
    expected = {}
    for t, days in daily.items():
        vs = [days[d] // 100 for d in sorted(days)]
        n, s1 = len(vs), sum(v // 1 for v in vs)
        s1 = sum(vs)
        dev = [n * v - s1 for v in vs]
        den = max(sum(d * d for d in dev), 1)
        for lag in (1, 2, 3):
            num = sum(dev[i] * dev[i - lag] for i in range(lag, n))
            q = num * 1000000
            acf = int(math.copysign(abs(q) // den, q))
            expected[(t, lag)] = (n, acf)
    got = QUERIES["events_acf"](spark, SF_DIR).collect()
    assert {(r.event_type, r.lag): (r.n_days, r.acf_ppm) for r in got} == expected
    # ACF is a correlation: bounded in ppm (allowing lag-truncation
    # slack the textbook estimator shares)
    assert all(-1100000 <= r.acf_ppm <= 1100000 for r in got)


# ---------------------------------------------------------------------------
# Q11 KS drift
# ---------------------------------------------------------------------------

def test_ks_drift_matches_python_recompute(spark):
    orders = (
        load_table(spark, SF_DIR, "orders")
        .select("o_totalprice", "o_orderdate")
        .collect()
    )
    import datetime

    split = datetime.datetime(1998, 1, 1)
    ha: Counter = Counter()
    hb: Counter = Counter()
    for r in orders:
        band = _rnd(r.o_totalprice * 100) // 1_000_000
        (ha if r.o_orderdate < split else hb)[band] += 1
    na, nb = sum(ha.values()), sum(hb.values())
    cum_a = cum_b = 0
    best = (-1, None)
    for band in sorted(set(ha) | set(hb)):
        cum_a += ha[band]
        cum_b += hb[band]
        gap = abs(cum_a * 1000000 // na - cum_b * 1000000 // nb)
        if gap > best[0]:
            best = (gap, band)
    got = QUERIES["drift_ks_orders"](spark, SF_DIR).collect()[0]
    assert (got.n_base, got.n_delta, got.d_ppm, got.argmax_band) == (
        na,
        nb,
        best[0],
        best[1],
    )
    # D is a probability-scale statistic
    assert 0 <= got.d_ppm <= 1000000


# ---------------------------------------------------------------------------
# A35 Gini
# ---------------------------------------------------------------------------

def test_gini_matches_python_recompute(spark):
    orders = (
        load_table(spark, SF_DIR, "orders")
        .select("o_custkey", "o_totalprice")
        .collect()
    )
    rev: Counter = Counter()
    for r in orders:
        rev[r.o_custkey] += _rnd(r.o_totalprice * 100)
    xs = [rev[c] for c in sorted(rev, key=lambda c: (rev[c], c))]
    n, s = len(xs), sum(xs)
    si = sum((i + 1) * x for i, x in enumerate(xs))
    gini = _rnd((2 * si - (n + 1) * s) / n / s * 1000000)
    got = QUERIES["orders_gini"](spark, SF_DIR).collect()[0]
    assert (got.n_customers, got.total_cents, got.gini_ppm) == (n, s, gini)
    assert 0 <= got.gini_ppm < 1000000


# ---------------------------------------------------------------------------
# L4r Jensen-Shannon divergence per source
# ---------------------------------------------------------------------------

def test_jsd_matches_python_recompute(spark):
    docs = load_table(spark, SF_DIR, "documents").select("source", "text").collect()
    sw: Counter = Counter()
    for r in docs:
        for t in _toks(r.text):
            sw[(r.source, t)] += 1
    wt: Counter = Counter()
    st: Counter = Counter()
    for (s, t), y in sw.items():
        wt[t] += y
        st[s] += y
    n = sum(wt.values())
    expected = {}
    for s in st:
        n_s = st[s]
        acc = 0
        for t, y_w in wt.items():
            y = sw.get((s, t), 0)
            pm = max(y * 1000000 // n_s, 1)
            qm = max((y_w - y) * 1000000 // (n - n_s), 1)
            acc += pm * _rnd(math.log(2 * pm / (pm + qm)) * 1000000)
            acc += qm * _rnd(math.log(2 * qm / (pm + qm)) * 1000000)
        # engine div truncates toward zero; acc is non-negative (JSD >= 0
        # up to quantization) so // matches
        expected[s] = (n_s, int(math.copysign(abs(acc) // 2, acc)))
    got = QUERIES["text_jsd_sources"](spark, SF_DIR).collect()
    assert {r.source: (r.n_tokens, r.jsd_pico) for r in got} == expected
    # JSD is bounded by ln 2 (693147 micro-nats x 1e6 ppm mass = pico
    # scale) and non-negative up to the +1-floor quantization slack
    for r in got:
        assert -1000 * 1000000 <= r.jsd_pico <= 693147 * 1000000


# ---------------------------------------------------------------------------
# L4s RRF hybrid fusion
# ---------------------------------------------------------------------------

def test_rrf_fusion_matches_python_recompute(spark):
    """Recompute the fusion from the two REGISTERED rankings (each is
    independently recompute-tested), pinning the rank-only contract:
    rrf = sum of 1e6 // (60 + rank) over the lists the doc appears in."""
    bm = {
        r.doc_id: r.rank
        for r in QUERIES["text_bm25_topk"](spark, SF_DIR).collect()
    }
    import hashlib  # noqa: F401 (parallel structure with other tests)

    emb = load_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding").collect()
    qv = [round(float(x) * 1000000.0) for x in next(r.embedding for r in emb if r.vec_id == 7)]

    def cos(v):
        vq = [round(float(x) * 1000000.0) for x in v]
        dot = na = nb = 0.0
        for a, b in zip(qv, vq):
            dot += a * b
            na += a * a
            nb += b * b
        return dot / (math.sqrt(na) * math.sqrt(nb))

    ranked = sorted(
        ((cos(r.embedding), r.vec_id) for r in emb if r.vec_id != 7),
        key=lambda t: (-t[0], t[1]),
    )
    cr = {vid: i + 1 for i, (_, vid) in enumerate(ranked[:20])}
    fused = {}
    for d in set(bm) | set(cr):
        fused[d] = (1000000 // (60 + bm[d]) if d in bm else 0) + (
            1000000 // (60 + cr[d]) if d in cr else 0
        )
    expected = sorted(fused.items(), key=lambda t: (-t[1], t[0]))[:10]
    got = QUERIES["retrieval_rrf_fusion"](spark, SF_DIR).collect()
    assert [(r.doc_id, r.rrf_micro) for r in got] == expected
    assert [r.rank for r in got] == list(range(1, len(got) + 1))
    for r in got:
        assert (r.bm25_rank > 0) == (r.doc_id in bm)
        assert (r.cos_rank > 0) == (r.doc_id in cr)
        # docs on BOTH lists outrank equal-rank single-list docs —
        # the property RRF exists for
        if r.bm25_rank and r.cos_rank:
            assert r.rrf_micro >= 1000000 // 61


# ---------------------------------------------------------------------------
# Q12 bot screen
# ---------------------------------------------------------------------------

def test_bot_score_matches_python_recompute(spark):
    ev = (
        load_table(spark, SF_DIR, "events")
        .select("user_id", "ts", "event_id")
        .collect()
    )
    by_user = defaultdict(list)
    for r in ev:
        by_user[r.user_id].append((r.ts, r.event_id))
    rows = []
    for u, es in by_user.items():
        es.sort()
        secs = [int(t.timestamp()) for t, _ in es]
        gaps = [b - a for a, b in zip(secs, secs[1:])]
        n = len(gaps)
        if n < 5:
            continue
        # lower median BY RANK with arrival-order (seq) tiebreak —
        # ties in gap value resolve by position, matching the engines
        order = sorted(range(n), key=lambda i: (gaps[i], i))
        med = gaps[order[(n + 1) // 2 - 1]]
        dorder = sorted(range(n), key=lambda i: (abs(gaps[i] - med), i))
        mad = abs(gaps[dorder[(n + 1) // 2 - 1]] - med)
        rows.append((mad * 1000000 // max(med, 1), u, n, med, mad))
    rows.sort(key=lambda t: (t[0], t[1]))
    expected = [(u, n, med, mad, reg) for reg, u, n, med, mad in rows[:20]]
    got = QUERIES["events_bot_score"](spark, SF_DIR).collect()
    assert [
        (r.user_id, r.n_gaps, r.med_gap_s, r.mad_gap_s, r.regularity_ppm) for r in got
    ] == expected
    # most-suspicious-first ordering
    assert all(a.regularity_ppm <= b.regularity_ppm for a, b in zip(got, got[1:]))


# ---------------------------------------------------------------------------
# Q13 categorical entropy profile
# ---------------------------------------------------------------------------

def test_entropy_profile_matches_python_recompute(spark):
    orders = (
        load_table(spark, SF_DIR, "orders")
        .select("o_orderstatus", "o_orderpriority", "o_orderdate")
        .collect()
    )
    cols = {
        "o_orderstatus": Counter(r.o_orderstatus for r in orders),
        "o_orderpriority": Counter(r.o_orderpriority for r in orders),
        "order_year": Counter(str(r.o_orderdate.year) for r in orders),
    }
    expected = {}
    for col, cnt in cols.items():
        n = sum(cnt.values())
        acc = 0
        for c in cnt.values():
            pm = max(c * 1000000 // n, 1)
            acc += pm * _rnd(math.log(pm / 1000000) * 1000000)
        # -SUM(...) div 1e6 with engine trunc-toward-zero semantics:
        # negate first, then truncate
        ent = int(math.copysign(abs(-acc) // 1000000, -acc))
        k = len(cnt)
        norm = ent * 1000000 // max(_rnd(math.log(k) * 1000000), 1) if k > 1 else 0
        expected[col] = (k, ent, norm)
    got = QUERIES["profile_entropy_orders"](spark, SF_DIR).collect()
    assert {r.col: (r.n_distinct, r.entropy_micronats, r.norm_entropy_ppm) for r in got} == expected
    # normalized entropy is a [0, 1e6]-scale share (floor-quantization
    # can push a uniform column a hair past the bound, never by more
    # than the pm floor slack)
    for r in got:
        assert 0 <= r.norm_entropy_ppm <= 1001000


# ---------------------------------------------------------------------------
# A36 KMV set operations
# ---------------------------------------------------------------------------

def test_kmv_set_ops_matches_python_recompute(spark):
    a_keys = {
        r.o_custkey
        for r in load_table(spark, SF_DIR, "orders").select("o_custkey").collect()
    }
    b_keys = {
        r.c_custkey
        for r in load_table(spark, SF_DIR, "customer").select("c_custkey").collect()
    }
    sa = sorted({_md5_52(k) for k in a_keys})[:64]
    sb = sorted({_md5_52(k) for k in b_keys})[:64]
    su = sorted(set(sa) | set(sb))[:64]
    ka, kb, ku = len(sa), len(sb), len(su)
    matches = sum(1 for h in su if h in set(sa) and h in set(sb))
    est_u = (ku - 1) * (1 << 52) // su[-1]
    got = QUERIES["agg_kmv_set_ops"](spark, SF_DIR).collect()[0]
    assert (got.k, got.matches, got.exact_intersection) == (
        ka,
        matches,
        len(a_keys & b_keys),
    )
    assert got.est_a == (ka - 1) * (1 << 52) // sa[-1]
    assert got.est_b == (kb - 1) * (1 << 52) // sb[-1]
    assert got.est_union == est_u
    assert got.est_intersection == matches * est_u // ku
    # sketch algebra sanity: the union estimate is not below either
    # side's estimate by more than sketch noise, and the intersection
    # estimate is bounded by the union estimate
    assert got.est_intersection <= got.est_union


# ---------------------------------------------------------------------------
# A15b Markov stationary distribution
# ---------------------------------------------------------------------------

def test_markov_stationary_matches_python_recompute(spark):
    ev = (
        load_table(spark, SF_DIR, "events")
        .select("user_id", "event_type", "ts", "event_id")
        .collect()
    )
    by_user = defaultdict(list)
    for r in ev:
        by_user[r.user_id].append((r.ts, r.event_id, r.event_type))
    trans: Counter = Counter()
    for es in by_user.values():
        es.sort()
        for (_, _, a), (_, _, b) in zip(es, es[1:]):
            trans[(a, b)] += 1
    tot: Counter = Counter()
    for (a, _), n in trans.items():
        tot[a] += n
    p = {(a, b): 1000000 * n // tot[a] for (a, b), n in trans.items()}
    states = sorted(tot)
    k = len(states)
    v = {s: 1000000 // k for s in states}
    for _ in range(10):
        nxt = defaultdict(int)
        for (a, b), pm in p.items():
            nxt[b] += v[a] * pm
        v = {s: acc // 1000000 for s, acc in nxt.items()}
    got = QUERIES["events_markov_stationary"](spark, SF_DIR).collect()
    assert {r.state: r.pi_ppm for r in got} == v
    # equilibrium is a (quantization-lossy) probability vector
    assert 1000000 - 50 * len(got) <= sum(r.pi_ppm for r in got) <= 1000000


# ---------------------------------------------------------------------------
# A37 Kaplan-Meier
# ---------------------------------------------------------------------------

def test_kaplan_meier_matches_python_recompute(spark):
    import datetime

    cutoff = datetime.datetime(1995, 7, 1)
    li = (
        load_table(spark, SF_DIR, "lineitem")
        .select("l_orderkey", "l_shipdate")
        .collect()
    )
    orders = (
        load_table(spark, SF_DIR, "orders")
        .select("o_orderkey", "o_orderdate")
        .collect()
    )
    first_ship = {}
    for r in li:
        k = r.l_orderkey
        if k not in first_ship or r.l_shipdate < first_ship[k]:
            first_ship[k] = r.l_shipdate
    obs = []
    for r in orders:
        if r.o_orderdate >= cutoff or r.o_orderkey not in first_ship:
            continue
        fsd = first_ship[r.o_orderkey]
        if fsd <= cutoff:
            obs.append(((fsd.date() - r.o_orderdate.date()).days, 1))
        else:
            obs.append(((cutoff.date() - r.o_orderdate.date()).days, 0))
    n_total = len(obs)
    h = defaultdict(lambda: [0, 0])
    for t, ev in obs:
        h[t][0] += 1
        h[t][1] += ev
    cum_prev = 0
    lsum = 0
    expected = []
    for t in sorted(h):
        m, d = h[t]
        n_risk = n_total - cum_prev
        cum_prev += m
        if d == 0:
            continue
        f_ppm = (n_risk - d) * 1000000 // n_risk
        lsum += _rnd(math.log(f_ppm / 1000000) * 1000000)
        expected.append((t, n_risk, d, _rnd(math.exp(lsum / 1000000) * 1000000)))
    got = QUERIES["orders_kaplan_meier"](spark, SF_DIR).collect()
    assert [(r.t_day, r.n_risk, r.n_events, r.surv_ppm) for r in got] == expected
    # survival is monotone non-increasing from ~1e6 (quantization can
    # wobble a final exp by an ulp, never upward by more than 1)
    for a, b in zip(got, got[1:]):
        assert b.surv_ppm <= a.surv_ppm + 1
    assert got[0].surv_ppm <= 1000000


# ---------------------------------------------------------------------------
# L4t Zipf fit
# ---------------------------------------------------------------------------

def test_zipf_fit_matches_python_recompute(spark):
    docs = load_table(spark, SF_DIR, "documents").select("text").collect()
    cnt: Counter = Counter()
    for r in docs:
        cnt.update(_toks(r.text))
    spectrum = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:500]
    xs = [_rnd(math.log(i + 1) * 1000000) for i in range(len(spectrum))]
    ys = [_rnd(math.log(c) * 1000000) for _, c in spectrum]
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx = sum(x * x for x in xs)
    syy = sum(y * y for y in ys)
    num = float(n) * float(sxy) - float(sx) * float(sy)
    den = float(n) * float(sxx) - float(sx) * float(sx)
    slope = num / den
    got = QUERIES["text_zipf_fit"](spark, SF_DIR).collect()[0]
    assert got.n_ranks == n
    assert got.slope_micro == _rnd(slope * 1000000)
    assert got.intercept_micro == _rnd((float(sy) - slope * float(sx)) / float(n))
    assert got.r2_ppm == _rnd(
        num * num / (den * (float(n) * float(syy) - float(sy) * float(sy))) * 1000000
    )
    # frequency spectra always slope down; r^2 is a [0,1e6] share (the
    # synthetic sf0.001 fixture is templated, so only the bound holds —
    # the naturalness screen reads the VALUE, not a fixed floor)
    assert got.slope_micro < 0
    assert 0 <= got.r2_ppm <= 1000000


# ---------------------------------------------------------------------------
# L4u Flesch readability
# ---------------------------------------------------------------------------

def test_readability_matches_python_recompute(spark):
    docs = load_table(spark, SF_DIR, "documents").select("source", "text").collect()
    agg = defaultdict(lambda: [0, 0, 0, 0])
    for r in docs:
        w = len(_toks(r.text))
        s = max(len(re.findall(r"[.!?]+", r.text)), 1)
        y = len(re.findall(r"[aeiouy]+", r.text.lower()))
        a = agg[r.source]
        a[0] += 1
        a[1] += w
        a[2] += s
        a[3] += y
    got = QUERIES["text_readability"](spark, SF_DIR).collect()
    for r in got:
        n, w, s, y = agg[r.source]
        assert (r.n_docs, r.words, r.sentences, r.syllables) == (n, w, s, y)
        assert r.flesch_milli == _rnd((206.835 - 1.015 * (w / s) - 84.6 * (y / w)) * 1000)
    assert {r.source for r in got} == set(agg)


# ---------------------------------------------------------------------------
# A15c Markov entropy rate
# ---------------------------------------------------------------------------

def test_entropy_rate_matches_python_recompute(spark):
    ev = (
        load_table(spark, SF_DIR, "events")
        .select("user_id", "event_type", "ts", "event_id")
        .collect()
    )
    by_user = defaultdict(list)
    for r in ev:
        by_user[r.user_id].append((r.ts, r.event_id, r.event_type))
    trans: Counter = Counter()
    for es in by_user.values():
        es.sort()
        for (_, _, a), (_, _, b) in zip(es, es[1:]):
            trans[(a, b)] += 1
    tot: Counter = Counter()
    for (a, _), n in trans.items():
        tot[a] += n
    p = {(a, b): 1000000 * n // tot[a] for (a, b), n in trans.items()}
    states = sorted(tot)
    k = len(states)
    v = {s: 1000000 // k for s in states}
    for _ in range(10):
        nxt = defaultdict(int)
        for (a, b), pm in p.items():
            nxt[b] += v[a] * pm
        v = {s: acc // 1000000 for s, acc in nxt.items()}
    rowent = {}
    for a in states:
        acc = -sum(
            pm * _rnd(math.log(pm / 1000000) * 1000000)
            for (x, _b), pm in p.items()
            if x == a and pm > 0
        )
        rowent[a] = int(math.copysign(abs(acc) // 1000000, acc))
    h = sum(v[a] * rowent[a] for a in states)
    h_rate = int(math.copysign(abs(h) // 1000000, h))
    lnk = max(_rnd(math.log(k) * 1000000), 1)
    got = QUERIES["events_entropy_rate"](spark, SF_DIR).collect()[0]
    assert got.entropy_rate_micronats == h_rate
    assert got.max_entropy_micronats == _rnd(math.log(k) * 1000000)
    assert got.predictability_ppm == h_rate * 1000000 // lnk
    # entropy rate is bounded by ln(K)
    assert 0 <= got.entropy_rate_micronats <= got.max_entropy_micronats + 1000


# ---------------------------------------------------------------------------
# GR5 degree histogram
# ---------------------------------------------------------------------------

def test_degree_histogram_matches_python_recompute(spark):
    li = (
        load_table(spark, SF_DIR, "lineitem")
        .select("l_orderkey", "l_suppkey")
        .collect()
    )
    orders = (
        load_table(spark, SF_DIR, "orders").select("o_orderkey", "o_custkey").collect()
    )
    cust_of = {r.o_orderkey: r.o_custkey for r in orders}
    edges = {
        (cust_of[r.l_orderkey] * 2, r.l_suppkey * 2 + 1)
        for r in li
        if r.l_orderkey in cust_of
    }
    deg: Counter = Counter()
    for c, s in edges:
        deg[c] += 1
        deg[s] += 1
    agg = defaultdict(lambda: [0, 0])
    for node, d in deg.items():
        key = ("customer" if node % 2 == 0 else "supplier", d)
        agg[key][0] += 1
        agg[key][1] += node
    got = QUERIES["graph_degree_histogram"](spark, SF_DIR).collect()
    assert {(r.side, r.degree): [r.n_nodes, r.node_checksum] for r in got} == dict(agg)
    # the bipartition covers every node exactly once
    assert sum(r.n_nodes for r in got) == len(deg)


# ---------------------------------------------------------------------------
# A38 SPRT
# ---------------------------------------------------------------------------

def test_sprt_matches_python_recompute(spark):
    ev = load_table(spark, SF_DIR, "events").select("ts", "event_type").collect()
    daily = defaultdict(lambda: [0, 0])
    for r in ev:
        a = daily[r.ts.date()]
        a[0] += 1
        a[1] += r.event_type == "purchase"
    c1 = _rnd(math.log(0.05 / 0.04) * 1000000)
    c2 = _rnd(math.log(0.95 / 0.96) * 1000000)
    ub = _rnd(math.log(19.0) * 1000000)
    lb = _rnd(math.log(1.0 / 19.0) * 1000000)
    llr = 0
    expected = []
    for day in sorted(daily):
        n, x = daily[day]
        llr += x * c1 + (n - x) * c2
        dec = "accept_h1" if llr >= ub else ("accept_h0" if llr <= lb else "continue")
        expected.append((day.isoformat(), n, x, llr, dec))
    got = QUERIES["events_sprt"](spark, SF_DIR).collect()
    assert [
        (r.day, r.n_events, r.n_conversions, r.llr_micro, r.decision) for r in got
    ] == expected
    # a terminal decision, once reached under monotone evidence, is
    # what the analyst reads off the LAST row — pin it matches Python
    assert got[-1].decision == expected[-1][4]


# ---------------------------------------------------------------------------
# EV10 isotonic calibration
# ---------------------------------------------------------------------------

def test_isotonic_matches_python_recompute_and_pav(spark):
    emb = load_table(spark, SF_DIR, "embeddings").select(
        "vec_id", "label", "embedding"
    ).collect()
    scored = [
        (
            r.label % 2,
            _rnd(float(r.embedding[0]) * 1000000) + _rnd(float(r.embedding[1]) * 1000000),
        )
        for r in emb
    ]
    lo = min(s for _, s in scored)
    hi = max(s for _, s in scored)
    bins = defaultdict(lambda: [0, 0])
    for y, s in scored:
        pm = (s - lo) * 1000000 // max(hi - lo, 1)
        b = min(pm // 100000, 9)
        bins[b][0] += 1
        bins[b][1] += y
    order = sorted(bins)
    cn = cy = 0
    pre = {}
    for b in order:
        n, sy = bins[b]
        pre[b] = (cn, cy)  # before-values
        cn += n
        cy += sy
    cum_n = {b: pre[b][0] + bins[b][0] for b in order}
    cum_y = {b: pre[b][1] + bins[b][1] for b in order}

    def mean(a, b):
        return (cum_y[b] - pre[a][1]) * 1000000 // (cum_n[b] - pre[a][0])

    iso = {}
    for i in order:
        iso[i] = max(
            min(mean(a, b) for b in order if b >= i) for a in order if a <= i
        )
    got = QUERIES["eval_isotonic_calibration"](spark, SF_DIR).collect()
    assert {r.bin: (r.n, r.raw_micro, r.iso_micro) for r in got} == {
        b: (bins[b][0], bins[b][1] * 1000000 // bins[b][0], iso[b]) for b in order
    }
    # the defining isotonic property: fitted values are monotone
    # nondecreasing in the bin order
    fitted = [r.iso_micro for r in sorted(got, key=lambda r: r.bin)]
    assert fitted == sorted(fitted)
    # and agree with classic sequential PAV pooling on the same
    # floor-quantized means (cross-checks the minimax identity)
    pools = [[bins[b][1], bins[b][0], b] for b in order]
    merged = True
    while merged:
        merged = False
        for j in range(len(pools) - 1):
            if pools[j][0] * pools[j + 1][1] > pools[j + 1][0] * pools[j][1]:
                pools[j][0] += pools[j + 1][0]
                pools[j][1] += pools[j + 1][1]
                del pools[j + 1]
                merged = True
                break
    # map each bin to its pool's value: walk pools in order,
    # consuming bins until the pool's weight is exhausted
    vals = []
    pi = 0
    consumed = 0
    for b in order:
        sy, n, _ = pools[pi]
        vals.append((b, sy * 1000000 // n))
        consumed += bins[b][0]
        if consumed >= n:
            pi += 1
            consumed = 0
    assert {b: v for b, v in vals} == iso


# ---------------------------------------------------------------------------
# L14 negative-sampling distribution
# ---------------------------------------------------------------------------

def test_negative_sampling_matches_python_recompute(spark):
    docs = load_table(spark, SF_DIR, "documents").select("text").collect()
    cnt: Counter = Counter()
    for r in docs:
        cnt.update(_toks(r.text))
    sm = {t: _rnd(math.exp(0.75 * math.log(c)) * 1000000) for t, c in cnt.items()}
    total, zsm = sum(cnt.values()), sum(sm.values())
    top = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:50]
    expected = []
    for rank, (t, c) in enumerate(top, 1):
        raw = c * 1000000 // total
        smo = sm[t] * 1000000 // zsm
        expected.append((rank, t, c, raw, smo, smo * 10000 // max(raw, 1)))
    got = QUERIES["corpus_negative_sampling"](spark, SF_DIR).collect()
    assert [
        (r.rank, r.tok, r.cnt, r.raw_ppm, r.smoothed_ppm, r.flatten_bp) for r in got
    ] == expected
    # the 3/4 power demotes the head: the most frequent token's
    # smoothed share is below its raw share
    assert got[0].flatten_bp < 10000


# ---------------------------------------------------------------------------
# L4v RAKE keyphrases
# ---------------------------------------------------------------------------

def test_rake_matches_python_recompute(spark):
    from bytesprocessor_spark.functions.text import _EN_STOPWORDS

    stop = set(_EN_STOPWORDS)
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text").collect()
    phrases = []  # (phrase_string, words)
    for r in docs:
        run = []
        for t in _toks(r.text) + ["the"]:  # sentinel flush
            if t in stop:
                if run and len(run) <= 3:
                    phrases.append(" ".join(run))
                run = []
            else:
                run.append(t)
    freq: Counter = Counter()
    deg: Counter = Counter()
    for p in phrases:
        ws = p.split(" ")
        for w in ws:
            freq[w] += 1
            deg[w] += len(ws)
    s_q = {w: deg[w] * 1000000 // freq[w] for w in freq}
    scored = defaultdict(lambda: [0, 0])
    for p in phrases:
        sc = sum(s_q[w] for w in p.split(" "))
        scored[p][0] += 1
        scored[p][1] = sc
    top = sorted(scored.items(), key=lambda kv: (-kv[1][1], kv[0]))[:20]
    expected = [
        (p, n_occ, sc, rank)
        for rank, (p, (n_occ, sc)) in enumerate(top, 1)
    ]
    got = QUERIES["text_rake_keyphrases"](spark, SF_DIR).collect()
    assert [(r.phrase, r.n_occurrences, r.score_micro, r.rank) for r in got] == expected
    # RAKE's defining bias: multi-word phrases outrank their own
    # constituent single words (deg >= freq always => s_q >= 1e6)
    assert all(" " not in p or sc >= 2000000 for p, _, sc, _ in expected)


# ---------------------------------------------------------------------------
# D1 date dimension
# ---------------------------------------------------------------------------

def test_dim_date_matches_python_calendar(spark):
    import datetime

    got = QUERIES["dim_date_build"](spark, SF_DIR).collect()
    d = datetime.date(1992, 1, 1)
    end = datetime.date(1998, 12, 31)
    expected = []
    while d <= end:
        iso = d.isocalendar()
        last = (d.replace(day=28) + datetime.timedelta(days=4)).replace(
            day=1
        ) - datetime.timedelta(days=1)
        expected.append(
            (
                d.isoformat(),
                d.year,
                (d.month - 1) // 3 + 1,
                d.month,
                d.day,
                iso[2],
                iso[1],
                iso[2] >= 6,
                d == last,
            )
        )
        d += datetime.timedelta(days=1)
    assert [
        (
            r.d,
            r.year,
            r.quarter,
            r.month,
            r.dom,
            r.dow_iso,
            r.iso_week,
            r.is_weekend,
            r.is_month_end,
        )
        for r in got
    ] == expected
    assert len(got) == 2557


# ---------------------------------------------------------------------------
# A39 Theil-Sen
# ---------------------------------------------------------------------------

def test_theil_sen_matches_python_recompute(spark):
    ev = (
        load_table(spark, SF_DIR, "events")
        .select("event_type", "ts", "value")
        .collect()
    )
    daily = defaultdict(Counter)
    for r in ev:
        daily[r.event_type][r.ts.date()] += _rnd(r.value * 100)
    expected = {}
    for t, days in daily.items():
        ds = sorted(days)
        vs = {d: days[d] // 100 for d in ds}
        slopes = []
        for i, da in enumerate(ds):
            for db in ds[i + 1 :]:
                dy = (vs[db] - vs[da]) * 1000000
                dx = (db - da).days
                slopes.append((int(math.copysign(abs(dy) // dx, dy)), da, db))
        slopes.sort()
        n_pairs = len(slopes)
        med = slopes[(n_pairs + 1) // 2 - 1][0]
        expected[t] = (len(ds), n_pairs, med)
    got = QUERIES["events_theil_sen"](spark, SF_DIR).collect()
    assert {r.event_type: (r.n_days, r.n_pairs, r.ts_slope_micro) for r in got} == expected


# ---------------------------------------------------------------------------
# ST14 streaming SPRT
# ---------------------------------------------------------------------------

def test_stream_sprt_equals_batch_sprt(spark):
    """Batch/stream parity: the drained streaming aggregation must
    reproduce the batch sequential test row-for-row (the LLR
    increments are integer constants, so micro-batch order cannot
    move the cumulative sum)."""
    batch = QUERIES["events_sprt"](spark, SF_DIR).collect()
    stream = QUERIES["stream_sprt"](spark, SF_DIR).collect()
    key = lambda r: (r.day, r.n_events, r.n_conversions, r.llr_micro, r.decision)  # noqa: E731
    assert [key(r) for r in stream] == [key(r) for r in batch]


# ---------------------------------------------------------------------------
# EV11 cross-validated AUC
# ---------------------------------------------------------------------------

def test_cv_auc_matches_python_recompute(spark):
    emb = load_table(spark, SF_DIR, "embeddings").select(
        "vec_id", "label", "embedding"
    ).collect()
    folds = defaultdict(list)
    import hashlib

    for r in emb:
        fold = int(hashlib.md5(str(r.vec_id).encode()).hexdigest()[:15], 16) % 5
        score = _rnd(float(r.embedding[0]) * 1000000) + _rnd(
            float(r.embedding[1]) * 1000000
        )
        folds[fold].append((r.label % 2, score))
    expected = {}
    for fold, rows in folds.items():
        pos = sorted(s for y, s in rows if y == 1)
        neg = sorted(s for y, s in rows if y == 0)
        import bisect

        two_u = 0
        for s in pos:
            lt = bisect.bisect_left(neg, s)
            eq = bisect.bisect_right(neg, s) - lt
            two_u += 2 * lt + eq
        auc = (
            two_u * 1000000 // (2 * len(pos) * len(neg))
            if pos and neg
            else None
        )
        expected[fold] = (len(pos), len(neg), auc)
    got = QUERIES["eval_cv_auc"](spark, SF_DIR).collect()
    assert {r.fold: (r.n_pos, r.n_neg, r.auc_micro) for r in got} == expected
    # the spread readout exists: >1 fold, all AUCs in [0, 1e6]
    assert len(got) > 1
    assert all(r.auc_micro is None or 0 <= r.auc_micro <= 1000000 for r in got)


# ---------------------------------------------------------------------------
# A40 Mann-Whitney
# ---------------------------------------------------------------------------

def test_mann_whitney_matches_python_recompute(spark):
    import bisect

    ev = (
        load_table(spark, SF_DIR, "events")
        .select("event_type", "ts", "value")
        .collect()
    )
    groups = defaultdict(lambda: ([], []))  # (weekend, weekday)
    for r in ev:
        v = _rnd(r.value * 100)
        wk = r.ts.date().isoweekday() >= 6
        groups[r.event_type][0 if wk else 1].append(v)
    got = QUERIES["events_mann_whitney"](spark, SF_DIR).collect()
    for r in got:
        we, wd = groups[r.event_type]
        wd_sorted = sorted(wd)
        two_u = 0
        for v in we:
            lt = bisect.bisect_left(wd_sorted, v)
            eq = bisect.bisect_right(wd_sorted, v) - lt
            two_u += 2 * lt + eq
        m, n = len(we), len(wd)
        z = (two_u - m * n) / math.sqrt(m * n * (m + n + 1.0) / 3.0)
        assert (r.n_weekend, r.n_weekday, r.two_u) == (m, n, two_u)
        assert r.z_micro == _rnd(z * 1000000)
        assert r.significant_5pct == (abs(r.z_micro) >= 1959964)
    assert {r.event_type for r in got} == set(groups)


# ---------------------------------------------------------------------------
# A41 chi-square
# ---------------------------------------------------------------------------

def test_chi_square_matches_python_recompute(spark):
    ev = load_table(spark, SF_DIR, "events").select("event_type", "ts").collect()
    obs: Counter = Counter()
    for r in ev:
        obs[(r.event_type, r.ts.date().isoweekday() >= 6)] += 1
    row: Counter = Counter()
    col: Counter = Counter()
    for (t, wk), n in obs.items():
        row[t] += n
        col[wk] += n
    total = sum(obs.values())
    chi2 = 0
    for (t, wk), n in obs.items():
        e = row[t] * col[wk] / total
        chi2 += _rnd((n - e) * (n - e) / e * 1000000)
    got = QUERIES["events_chi_square"](spark, SF_DIR).collect()[0]
    assert (got.n_cells, got.dof, got.chi2_micro) == (len(obs), len(row) - 1, chi2)
    assert got.significant_5pct == (chi2 >= 9487729)
    assert got.chi2_micro >= 0


# ---------------------------------------------------------------------------
# W13 DAU growth
# ---------------------------------------------------------------------------

def test_dau_growth_matches_python_recompute(spark):
    import datetime

    ev = load_table(spark, SF_DIR, "events").select("user_id", "ts").collect()
    ud = {(r.user_id, r.ts.date()) for r in ev}
    days = sorted({d for _, d in ud})
    dau = Counter(d for _, d in ud)
    first = {}
    for u, d in sorted(ud, key=lambda t: t[1]):
        first.setdefault(u, d)
    nu = Counter(first.values())
    wau = {
        d: len({u for u, ad in ud if d - datetime.timedelta(days=6) <= ad <= d})
        for d in days
    }
    cum = 0
    expected = []
    for d in days:
        cum += nu[d]
        expected.append((d.isoformat(), dau[d], wau[d], nu[d], cum))
    got = QUERIES["events_dau_growth"](spark, SF_DIR).collect()
    assert [
        (r.day, r.dau, r.wau_7d, r.new_users, r.cum_users) for r in got
    ] == expected
    # identities: WAU >= DAU always; the cumulative curve ends at the
    # total distinct user count
    assert all(r.wau_7d >= r.dau for r in got)
    assert got[-1].cum_users == len(first)


# ---------------------------------------------------------------------------
# A42 cohort LTV
# ---------------------------------------------------------------------------

def test_cohort_ltv_matches_python_recompute(spark):
    orders = (
        load_table(spark, SF_DIR, "orders")
        .select("o_custkey", "o_orderdate", "o_totalprice")
        .collect()
    )
    first = {}
    for r in orders:
        y = r.o_orderdate.year
        if r.o_custkey not in first or y < first[r.o_custkey]:
            first[r.o_custkey] = y
    size = Counter(first.values())
    agg = defaultdict(lambda: [0, set()])
    for r in orders:
        cy = first[r.o_custkey]
        age = r.o_orderdate.year - cy
        a = agg[(cy, age)]
        a[0] += _rnd(r.o_totalprice * 100)
        a[1].add(r.o_custkey)
    expected = []
    for cy in sorted({k[0] for k in agg}):
        cum = 0
        for age in sorted(k[1] for k in agg if k[0] == cy):
            rev, users = agg[(cy, age)]
            cum += rev
            expected.append(
                (cy, age, size[cy], len(users), rev, cum, cum * 100 // size[cy])
            )
    got = QUERIES["orders_cohort_ltv"](spark, SF_DIR).collect()
    assert [
        (
            r.cohort_year,
            r.age,
            r.cohort_size,
            r.active_customers,
            r.rev_cents,
            r.cum_rev_cents,
            r.ltv_per_customer_centicents,
        )
        for r in got
    ] == expected
    # LTV curves are monotone nondecreasing within a cohort
    by_cohort = defaultdict(list)
    for r in got:
        by_cohort[r.cohort_year].append(r.cum_rev_cents)
    for curve in by_cohort.values():
        assert curve == sorted(curve)


# ---------------------------------------------------------------------------
# W14 audience overlap
# ---------------------------------------------------------------------------

def test_audience_overlap_matches_python_recompute(spark):
    ev = load_table(spark, SF_DIR, "events").select("event_type", "user_id").collect()
    sets = defaultdict(set)
    for r in ev:
        sets[r.event_type].add(r.user_id)
    types = sorted(sets)
    expected = []
    for i, ta in enumerate(types):
        for tb in types[i + 1 :]:
            both = len(sets[ta] & sets[tb])
            if both == 0:
                continue
            na, nb = len(sets[ta]), len(sets[tb])
            expected.append((ta, tb, na, nb, both, both * 1000000 // (na + nb - both)))
    got = QUERIES["events_audience_overlap"](spark, SF_DIR).collect()
    assert [
        (r.type_a, r.type_b, r.n_a, r.n_b, r.n_both, r.jaccard_ppm) for r in got
    ] == expected
    # Jaccard is a [0, 1e6] similarity and symmetric keys are
    # canonicalized to the upper triangle
    assert all(0 <= r.jaccard_ppm <= 1000000 and r.type_a < r.type_b for r in got)


# ---------------------------------------------------------------------------
# A43 power analysis
# ---------------------------------------------------------------------------

def test_power_analysis_matches_python_recompute(spark):
    ev = load_table(spark, SF_DIR, "events").select("event_type", "value").collect()
    groups = defaultdict(list)
    for r in ev:
        groups[r.event_type].append(_rnd(r.value * 100))
    got = QUERIES["events_power_analysis"](spark, SF_DIR).collect()
    for r in got:
        vs = groups[r.event_type]
        n, s1 = len(vs), sum(vs)
        s2 = sum(v * v for v in vs)
        var = (n * s2 - s1 * s1) / (n * (n - 1.0))
        mde = (1.959964 + 0.841621) * math.sqrt(2.0 * var / (n / 2.0))
        assert (r.n, r.mean_centicents) == (n, s1 * 100 // n)
        assert r.var_cents2 == _rnd(var)
        assert r.mde_millicents == _rnd(mde * 1000)
        assert r.mde_relative_ppm == _rnd(mde / (s1 / n) * 1000000)
        # sanity: the MDE shrinks as 1/sqrt(n) — it must be well under
        # the mean at fixture sizes
        assert 0 < r.mde_relative_ppm < 1000000
    assert {r.event_type for r in got} == set(groups)


# ---------------------------------------------------------------------------
# Q14 t-closeness
# ---------------------------------------------------------------------------

def _tdiv(a: int, b: int) -> int:
    """Integer division truncating toward zero (DuckDB // / Spark div)."""
    q = abs(a) // b
    return -q if a < 0 else q


def test_t_closeness_matches_python_recompute(spark):
    rows = load_table(spark, SF_DIR, "customer").select(
        "c_nationkey", "c_acctbal", "c_mktsegment"
    ).collect()
    cells: Counter = Counter()
    for r in rows:
        band = _tdiv(_rnd(r.c_acctbal * 100), 100000)
        cells[(r.c_nationkey, band, r.c_mktsegment)] += 1
    total = sum(cells.values())
    glob: Counter = Counter()
    grp: Counter = Counter()
    for (nk, band, seg), c in cells.items():
        glob[seg] += c
        grp[(nk, band)] += c
    buckets: dict[str, list[tuple[int, int]]] = defaultdict(list)
    for (nk, band), k in grp.items():
        tvd = sum(
            max(c * 1000000 // k - glob[seg] * 1000000 // total, 0)
            for (n2, b2, seg), c in cells.items()
            if (n2, b2) == (nk, band)
        )
        b = (
            "t<=0.10" if tvd <= 100000
            else "0.10<t<=0.20" if tvd <= 200000
            else "t>0.20"
        )
        buckets[b].append((k, tvd))
    got = QUERIES["privacy_t_closeness"](spark, SF_DIR).collect()
    assert {r.t_bucket for r in got} == set(buckets)
    for r in got:
        ks = buckets[r.t_bucket]
        assert r.n_groups == len(ks)
        assert r.n_rows == sum(k for k, _ in ks)
        assert r.min_tvd_ppm == min(t for _, t in ks)
        assert r.max_tvd_ppm == max(t for _, t in ks)
        # TVD is a [0, 1e6] distance in its positive-part form
        assert 0 <= r.min_tvd_ppm <= r.max_tvd_ppm <= 1000000
    # every customer row lands in exactly one bucket
    assert sum(r.n_rows for r in got) == total


# ---------------------------------------------------------------------------
# A44 difference-in-differences
# ---------------------------------------------------------------------------

_DID_SPLIT = datetime(2024, 1, 16)


def test_did_matches_python_recompute(spark):
    ev = load_table(spark, SF_DIR, "events").select(
        "event_type", "user_id", "ts", "value"
    ).collect()
    cells: dict = defaultdict(lambda: [0, 0, 0])  # n, s, q per (type, grp, post)
    for r in ev:
        g = int(hashlib.md5(str(r.user_id).encode()).hexdigest()[:15], 16) % 2
        p = r.ts >= _DID_SPLIT
        c = _rnd(r.value * 100)
        cell = cells[(r.event_type, g, p)]
        cell[0] += 1
        cell[1] += c
        cell[2] += c * c
    got = QUERIES["events_did"](spark, SF_DIR).collect()
    types = {t for (t, _, _) in cells}
    assert {r.event_type for r in got} == types
    for r in got:
        tp = cells[(r.event_type, 1, True)]
        tq = cells[(r.event_type, 1, False)]
        cp = cells[(r.event_type, 0, True)]
        cq = cells[(r.event_type, 0, False)]
        assert (r.n_treat_post, r.n_treat_pre, r.n_ctrl_post, r.n_ctrl_pre) == (
            tp[0], tq[0], cp[0], cq[0],
        )
        did = (tp[1] / tp[0] - tq[1] / tq[0]) - (cp[1] / cp[0] - cq[1] / cq[0])
        se = math.sqrt(sum(
            ((n * q - s * s) / (n * (n - 1.0))) / n for n, s, q in (tp, tq, cp, cq)
        ))
        assert r.did_millicents == _rnd(did * 1000)
        assert r.se_millicents == _rnd(se * 1000)
        # the shared time trend cancels: |DiD| is far below the raw
        # post-pre delta scale, and SE > 0 at fixture sizes
        assert r.se_millicents > 0


# ---------------------------------------------------------------------------
# GR6 Adamic-Adar (recomputed at sf0.01 — the sf0.001 graph is
# complete under the decile rule, leaving no non-adjacent pairs)
# ---------------------------------------------------------------------------

def test_adamic_adar_matches_python_recompute(spark):
    sf01 = "/root/testdata/sf0.01"
    li = load_table(spark, sf01, "lineitem").select(
        "l_orderkey", "l_suppkey"
    ).collect()
    by_order: dict = defaultdict(set)
    for r in li:
        by_order[r.l_orderkey].add(r.l_suppkey)
    pw: Counter = Counter()
    for supps in by_order.values():
        ss = sorted(supps)
        for i, a in enumerate(ss):
            for b in ss[i + 1:]:
                pw[(a, b)] += 1
    pw = {k: v for k, v in pw.items() if v >= 2}
    n_pairs = len(pw)
    hist: Counter = Counter(pw.values())
    budget = max(n_pairs // 10, 1)
    thr = None
    n_ge = 0
    for w in sorted(hist, reverse=True):
        n_ge += hist[w]
        if n_ge <= budget:
            thr = w
    t = thr if thr is not None else max(hist)
    edges = {k for k, v in pw.items() if v >= t}
    nbrs: dict = defaultdict(set)
    for a, b in edges:
        nbrs[a].add(b)
        nbrs[b].add(a)
    wmic = {z: _rnd(1000000.0 / math.log(len(vs))) for z, vs in nbrs.items() if len(vs) >= 2}
    aa: dict = defaultdict(lambda: [0, 0])
    for z, vs in nbrs.items():
        if z not in wmic:
            continue
        vss = sorted(vs)
        for i, a in enumerate(vss):
            for b in vss[i + 1:]:
                if (a, b) in edges:
                    continue
                aa[(a, b)][0] += 1
                aa[(a, b)][1] += wmic[z]
    top = sorted(aa.items(), key=lambda kv: (-kv[1][1], kv[0]))[:20]
    expected = [(a, b, nc, s) for (a, b), (nc, s) in top]
    got = QUERIES["graph_adamic_adar"](spark, sf01).collect()
    assert [(r.supp_a, r.supp_b, r.n_common, r.aa_micro) for r in got] == expected
    # predicted pairs are genuinely non-adjacent and oriented
    assert all((r.supp_a, r.supp_b) not in edges and r.supp_a < r.supp_b for r in got)


def test_adamic_adar_wait_thr_none_branch():
    """The fallback branch: when the heaviest weight class alone
    exceeds a decile, the threshold falls back to the max weight."""
    hist = {3: 5, 2: 95}  # 100 pairs; budget 10; n_ge(3)=5<=10, n_ge(2)=100>10
    budget = max(100 // 10, 1)
    thr, n_ge = None, 0
    for w in sorted(hist, reverse=True):
        n_ge += hist[w]
        if n_ge <= budget:
            thr = w
    assert thr == 3
    hist2 = {2: 100}  # the single class exceeds the budget -> fallback
    thr2, n_ge = None, 0
    for w in sorted(hist2, reverse=True):
        n_ge += hist2[w]
        if n_ge <= budget:
            thr2 = w
    assert thr2 is None  # operator COALESCEs to MAX(w) = 2


# ---------------------------------------------------------------------------
# L15 temperature sampling
# ---------------------------------------------------------------------------

def test_temperature_sample_matches_python_recompute(spark):
    docs = load_table(spark, SF_DIR, "documents").select("lang", "n_chars").collect()
    n_docs: Counter = Counter()
    n_chars: Counter = Counter()
    for r in docs:
        n_docs[r.lang] += 1
        n_chars[r.lang] += r.n_chars
    wq = {l: _rnd(math.exp(0.3 * math.log(n_chars[l])) * 1000000) for l in n_chars}
    total, zw = sum(n_chars.values()), sum(wq.values())
    got = QUERIES["corpus_temperature_sample"](spark, SF_DIR).collect()
    assert [r.lang for r in got] == sorted(n_chars)
    for r in got:
        raw = n_chars[r.lang] * 1000000 // total
        smp = wq[r.lang] * 1000000 // zw
        assert (r.n_docs, r.n_chars, r.raw_ppm, r.sampled_ppm) == (
            n_docs[r.lang], n_chars[r.lang], raw, smp,
        )
        assert r.boost_bp == smp * 10000 // max(raw, 1)
    # the defining property: the head is down-sampled, the tail up-sampled
    head = max(n_chars, key=lambda l: n_chars[l])
    tail = min(n_chars, key=lambda l: n_chars[l])
    by_lang = {r.lang: r for r in got}
    assert by_lang[head].boost_bp <= 10000 <= by_lang[tail].boost_bp


# ---------------------------------------------------------------------------
# W15 growth accounting
# ---------------------------------------------------------------------------

def test_growth_accounting_matches_python_recompute(spark):
    ev = load_table(spark, SF_DIR, "events").select("user_id", "ts").collect()
    weeks: dict = defaultdict(set)
    for r in ev:
        weeks[r.user_id].add(int(r.ts.timestamp()) // 604800)
    agg: dict = defaultdict(lambda: [0, 0, 0, 0])  # active, new, ret, res
    for wk_set in weeks.values():
        ws = sorted(wk_set)
        for i, w in enumerate(ws):
            a = agg[w]
            a[0] += 1
            if i == 0:
                a[1] += 1
            elif ws[i - 1] == w - 1:
                a[2] += 1
            else:
                a[3] += 1
    got = QUERIES["events_growth_accounting"](spark, SF_DIR).collect()
    assert [r.wk for r in got] == sorted(agg)
    for r in got:
        act, new, ret, res = agg[r.wk]
        assert (r.active, r.new_users, r.retained, r.resurrected) == (
            act, new, ret, res,
        )
        # the growth-accounting identity
        assert r.active == r.new_users + r.retained + r.resurrected
        prev_active = agg[r.wk - 1][0] if (r.wk - 1) in agg else 0
        assert r.churned == prev_active - r.retained


# ---------------------------------------------------------------------------
# A45 forecast baselines
# ---------------------------------------------------------------------------

def test_forecast_baselines_matches_python_recompute(spark):
    ev = load_table(spark, SF_DIR, "events").select(
        "event_type", "ts", "value"
    ).collect()
    daily: dict = defaultdict(int)
    for r in ev:
        daily[(r.event_type, r.ts.date())] += _rnd(r.value * 100)
    series: dict = defaultdict(list)
    for (t, d), yc in sorted(daily.items()):
        series[t].append(yc)
    expected = {}
    for t, ys in series.items():
        for model, k in (("naive", 1), ("snaive", 7)):
            pairs = [(ys[i], ys[i - k]) for i in range(k, len(ys))]
            n = len(pairs)
            mae = sum(abs(y - f) for y, f in pairs) // n
            smape = sum(
                2000000 * abs(y - f) // max(abs(y) + abs(f), 1) for y, f in pairs
            ) // n
            expected[(t, model)] = (n, mae, smape)
    got = QUERIES["events_forecast_baselines"](spark, SF_DIR).collect()
    assert {(r.event_type, r.model) for r in got} == set(expected)
    for r in got:
        assert (r.n_days, r.mae_cents, r.smape_ppm) == expected[
            (r.event_type, r.model)
        ]
        assert 0 <= r.smape_ppm <= 2000000  # sMAPE is bounded by 200%


# ---------------------------------------------------------------------------
# O8 skyline — verified against the quadratic NOT-EXISTS dominance
# definition (a genuinely different algorithm than the staircase)
# ---------------------------------------------------------------------------

def test_skyline_matches_quadratic_dominance_recompute(spark):
    rows = load_table(spark, SF_DIR, "part").select(
        "p_partkey", "p_retailprice", "p_size"
    ).collect()
    cells: dict = {}
    for r in rows:
        key = (_rnd(r.p_retailprice * 100), r.p_size)
        n, mk = cells.get(key, (0, None))
        cells[key] = (n + 1, r.p_partkey if mk is None else min(mk, r.p_partkey))
    pts = list(cells)
    sky = [
        (p, s)
        for (p, s) in pts
        if not any(
            q <= p and t >= s and (q < p or t > s) for (q, t) in pts
        )
    ]
    expected = [
        (p, s, cells[(p, s)][0], cells[(p, s)][1]) for p, s in sorted(sky)
    ]
    got = QUERIES["part_skyline"](spark, SF_DIR).collect()
    assert [(r.price_c, r.size, r.n_parts, r.min_partkey) for r in got] == expected
    # skyline staircase property: price strictly increases, size strictly
    # increases along it (minimize price / maximize size orientation)
    for a, b in zip(got, got[1:]):
        assert a.price_c < b.price_c and a.size < b.size


# ---------------------------------------------------------------------------
# L16 quality sweep
# ---------------------------------------------------------------------------

_QS_STOPWORDS = {
    "the", "of", "and", "to", "in", "a", "is", "that", "for", "it",
    "on", "with", "as", "was", "be", "are", "this", "by", "at", "or",
}


def test_quality_sweep_matches_python_recompute(spark):
    docs = load_table(spark, SF_DIR, "documents").select("text", "n_chars").collect()
    buckets: dict = defaultdict(lambda: [0, 0])
    for r in docs:
        toks = _toks(r.text)
        n_stop = sum(1 for t in toks if t in _QS_STOPWORDS)
        ppm = n_stop * 1000000 // max(len(toks), 1)
        b = min(ppm // 20000, 9)
        buckets[b][0] += 1
        buckets[b][1] += r.n_chars
    total_docs = sum(v[0] for v in buckets.values())
    total_chars = sum(v[1] for v in buckets.values())
    got = QUERIES["text_quality_sweep"](spark, SF_DIR).collect()
    for r in got:
        b = r.threshold_ppm // 20000
        docs_kept = sum(v[0] for k, v in buckets.items() if k >= b)
        chars_kept = sum(v[1] for k, v in buckets.items() if k >= b)
        assert (r.docs_kept, r.chars_kept) == (docs_kept, chars_kept)
        assert r.docs_share_ppm == docs_kept * 1000000 // total_docs
        assert r.chars_share_ppm == chars_kept * 1000000 // total_chars
    # yield is monotone non-increasing in the threshold
    kept = [r.docs_kept for r in sorted(got, key=lambda r: r.threshold_ppm)]
    assert kept == sorted(kept, reverse=True)
    assert kept[0] == total_docs  # threshold 0 keeps everything
