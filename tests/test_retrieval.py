"""Invariant and independent-recompute tests for the retrieval /
linkage / traversal / forecast / privacy / time-travel batch
(queries_retrieval.py + the A31/J11/Q9 rows).  Exact cross-engine
values are pinned by the DuckDB oracle rows; these pin the semantics
against independent Python recomputes and hand-built graphs."""

from __future__ import annotations

import math
import re
from collections import Counter, defaultdict

from pyspark.sql import functions as F

from bytesprocessor_spark.queries import QUERIES
from bytesprocessor_spark.sources.tables import load_table
from tests.conftest import SF_DIR


# ---------------------------------------------------------------------------
# BM25
# ---------------------------------------------------------------------------

def _py_bm25_topk(rows, terms, k1=1.2, b=0.75, topk=20):
    toks = {r.doc_id: re.findall(r"[a-z0-9]+", r.text.lower()) for r in rows}
    dl = {d: len(t) for d, t in toks.items()}
    n_docs = len(toks)
    total = sum(dl.values())
    tf = {d: Counter(t) for d, t in toks.items()}
    df = {q: sum(1 for d in toks if tf[d][q] > 0) for q in terms}
    scored = []
    for d in toks:
        s, hit = 0, 0
        for q in terms:
            f = tf[d][q]
            if f == 0:
                continue
            hit += 1
            idf = math.log(1.0 + (float(n_docs - df[q]) + 0.5) / (float(df[q]) + 0.5))
            frac = (float(f) * (1.0 + k1)) / (
                float(f) + k1 * ((1.0 - b) + b * (float(dl[d] * n_docs) / float(total)))
            )
            s += round(idf * frac * 1000000)
        if hit:
            scored.append((d, hit, s))
    scored.sort(key=lambda x: (-x[2], x[0]))
    return scored[:topk]


def test_bm25_matches_independent_python_recompute(spark):
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text").collect()
    expected = _py_bm25_topk(docs, ("spark", "merge", "vector"))
    got = QUERIES["text_bm25_topk"](spark, SF_DIR).collect()
    assert [(r.doc_id, r.n_terms, r.score_micro) for r in got] == expected
    assert [r.rank for r in got] == list(range(1, len(got) + 1))
    # ranking is strictly score-descending with id tiebreak
    for a, c in zip(got, got[1:]):
        assert (a.score_micro, -a.doc_id) >= (c.score_micro, -c.doc_id)


# ---------------------------------------------------------------------------
# Blocked fuzzy linkage
# ---------------------------------------------------------------------------

def _py_lev(a, b):
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_linkage_matches_independent_python_recompute(spark):
    """Full block-then-verify recompute in Python: every probe's match
    is the min-(distance, partkey) candidate within its block, the
    distance is 1 (the source name is always a candidate, and nothing
    can be closer than one edit since probes contain '#' which no
    catalog name does), and n_candidates equals the block size."""
    out = QUERIES["linkage_blocked_fuzzy"](spark, SF_DIR).collect()
    names = {
        r.p_partkey: r.p_name
        for r in load_table(spark, SF_DIR, "part").select("p_partkey", "p_name").collect()
    }
    by_block = defaultdict(list)
    for k, v in names.items():
        by_block[re.findall(r"[a-z]+$", v)[0]].append((k, v))
    probes = {k: "#" + v[1:] for k, v in names.items() if k < 100}
    assert {r.probe_id for r in out} == set(probes)
    for r in out:
        probe = probes[r.probe_id]
        block = by_block[re.findall(r"[a-z]+$", probe)[0]]
        scored = sorted((_py_lev(probe, nm), k) for k, nm in block)
        assert r.dist == 1 == scored[0][0]
        assert r.matched_id == scored[0][1]
        assert r.matched_name == names[r.matched_id]
        assert r.n_candidates == len(block) < len(names)


# ---------------------------------------------------------------------------
# BFS
# ---------------------------------------------------------------------------

def test_bfs_hand_graph(spark):
    """Path graph 1-2-3-4-5 plus an isolated edge 10-11: distances
    from seeds {1, 10} are the textbook values, nodes beyond max_depth
    are absent."""
    from bytesprocessor_spark.operators.graph import bfs_distances

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11)], ["src", "dst"]
    )
    sym = edges.union(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    seeds = spark.createDataFrame([(1,), (10,)], ["seed"])
    got = {
        (r.seed, r.node): r.dist
        for r in bfs_distances(sym, seeds, max_depth=3).collect()
    }
    assert got == {
        (1, 1): 0, (1, 2): 1, (1, 3): 2, (1, 4): 3,
        (10, 10): 0, (10, 11): 1,
    }


def test_bfs_reach_bipartite_parity(spark):
    """On the bipartite trade graph, odd hops land on suppliers (odd
    packed ids) and even hops on customers — the checksum parity pins
    it; every seed has exactly one dist-0 node (itself)."""
    rows = QUERIES["graph_bfs_reach"](spark, SF_DIR).collect()
    by_seed = defaultdict(dict)
    for r in rows:
        by_seed[r.seed_custkey][r.dist] = r
    for seed, dists in by_seed.items():
        assert dists[0].n_nodes == 1 and dists[0].node_checksum == 2 * seed
        for d, r in dists.items():
            if d % 2 == 1:  # supplier side: all node ids odd
                assert r.node_checksum % 2 == r.n_nodes % 2
            else:  # customer side: all node ids even
                assert r.node_checksum % 2 == 0


# ---------------------------------------------------------------------------
# Holt forecast
# ---------------------------------------------------------------------------

def _py_holt(ys):
    l, b = float(ys[0]), float(ys[1]) - float(ys[0])
    for y in ys[1:]:
        l_new = (float(y) + (l + b)) * 0.5
        b = ((l_new - l) + b) * 0.5
        l = l_new
    return l, b


def test_holt_matches_independent_python_recompute(spark):
    ev = load_table(spark, SF_DIR, "events")
    daily = (
        ev.groupBy("event_type", F.date_trunc("day", "ts").alias("day"))
        .agg(F.sum(F.round(F.col("value") * 100).cast("long")).alias("yc"))
        .collect()
    )
    series = defaultdict(list)
    for r in daily:
        series[r.event_type].append((r.day, r.yc))
    got = {r.event_type: r for r in QUERIES["events_holt_forecast"](spark, SF_DIR).collect()}
    assert set(got) == set(series)
    for et, pts in series.items():
        ys = [yc for _, yc in sorted(pts)]
        l, b = _py_holt(ys)
        r = got[et]
        assert r.n_days == len(ys)
        assert r.level_mc == round(l * 1000)
        assert r.trend_mc == round(b * 1000)
        assert r.fc1_mc == round((l + b * 1) * 1000)
        assert r.fc3_mc == round((l + b * 3) * 1000)


def test_holt_linear_series_is_tracked_exactly():
    """On an exactly linear series the recurrence locks on: level ==
    last observation, trend == slope (textbook sanity)."""
    ys = [100 + 7 * t for t in range(12)]
    l, b = _py_holt(ys)
    assert l == ys[-1] and b == 7.0


# ---------------------------------------------------------------------------
# SCD2 as-of lookup
# ---------------------------------------------------------------------------

def test_scd2_asof_covers_every_fact_exactly_once(spark):
    out = QUERIES["scd2_asof_lookup"](spark, SF_DIR).collect()
    li = load_table(spark, SF_DIR, "lineitem").select("l_orderkey")
    o = load_table(spark, SF_DIR, "orders").where(F.col("o_custkey") <= 300)
    n_facts = li.join(o.select("o_orderkey"), li.l_orderkey == F.col("o_orderkey")).count()
    assert sum(r.n_facts for r in out) == n_facts  # left join: no loss, no fanout
    pre = [r for r in out if r.prio_at_ship == "PRE-HISTORY"]
    assert len(pre) == 1 and pre[0].version_mass == 0
    # pre-history facts always drift (their order's priority is a real value)
    assert pre[0].n_drifted == pre[0].n_facts
    for r in out:
        assert 0 <= r.n_drifted <= r.n_facts
        if r.prio_at_ship != "PRE-HISTORY":
            assert r.version_mass >= r.n_facts  # versions start at 1


# ---------------------------------------------------------------------------
# k-anonymity
# ---------------------------------------------------------------------------

def test_k_anonymity_partitions_the_table(spark):
    out = QUERIES["privacy_k_anonymity"](spark, SF_DIR).collect()
    n_customers = load_table(spark, SF_DIR, "customer").count()
    assert sum(r.n_rows for r in out) == n_customers
    assert sum(r.rows_ppm for r in out) <= 1_000_000
    assert sum(r.rows_ppm for r in out) >= 1_000_000 - len(out)  # floor slack
    bounds = {"k=1": (1, 1), "k=2-4": (2, 4), "k=5-9": (5, 9), "k>=10": (10, 10**9)}
    for r in out:
        lo, hi = bounds[r.k_bucket]
        assert lo <= r.min_k <= r.max_k <= hi
        assert r.n_groups * r.min_k <= r.n_rows <= r.n_groups * r.max_k
