"""Hand-computed and invariant tests for the round-4 warehouse
operators (queries_warehouse.py).  Exact values are pinned by the
DuckDB oracle rows; these pin the semantics on tiny inputs where the
expected output is derivable by hand."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from bytesprocessor_spark.queries import QUERIES
from tests.conftest import SF_DIR


def test_scd2_ranges_partition_history(spark):
    """Validity ranges must tile each customer's history: version 1
    starts the history, consecutive ranges chain valid_to ==
    next.valid_from, exactly one current row per customer, and
    n_orders sums to the customer's order count."""
    rows = QUERIES["scd2_order_priority"](spark, SF_DIR).collect()
    by_cust: dict[int, list] = {}
    for r in rows:
        by_cust.setdefault(r.custkey, []).append(r)
    from bytesprocessor_spark.sources.tables import load_table

    order_counts = dict(
        load_table(spark, SF_DIR, "orders")
        .where(F.col("o_custkey") <= 300)
        .groupBy("o_custkey")
        .count()
        .collect()
    )
    assert set(by_cust) == set(order_counts)
    for ck, hist in by_cust.items():
        hist.sort(key=lambda r: r.version)
        assert [r.version for r in hist] == list(range(1, len(hist) + 1))
        assert sum(r.n_orders for r in hist) == order_counts[ck]
        assert sum(1 for r in hist if r.is_current) == 1
        assert hist[-1].is_current and hist[-1].valid_to == "9999-12-31 00:00:00"
        for a, b in zip(hist, hist[1:]):
            assert a.valid_to == b.valid_from  # half-open ranges chain
            assert a.priority != b.priority  # runs are maximal


def test_scd2_hand_computed_collapse(spark):
    """A 6-row change stream with a revisited value collapses to the
    hand-derived 4 ranges (revisiting an old value opens a NEW range —
    the SCD2 property a naive GROUP BY value would destroy)."""
    df = spark.createDataFrame(
        [
            (1, 101, "2024-01-01", "A"),
            (1, 102, "2024-02-01", "A"),
            (1, 103, "2024-03-01", "B"),
            (1, 104, "2024-04-01", "A"),  # back to A -> new version
            (1, 105, "2024-05-01", "A"),
            (2, 201, "2024-01-15", "C"),
        ],
        "custkey long, okey long, d string, prio string",
    ).select("custkey", "okey", F.col("d").cast("timestamp").alias("d"), "prio")
    w = Window.partitionBy("custkey").orderBy("d", "okey")
    seq = df.withColumn("prev", F.lag("prio").over(w))
    chg = F.when(F.col("prev").isNull() | (F.col("prev") != F.col("prio")), 1).otherwise(0)
    v = seq.withColumn(
        "version", F.sum(chg).over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    got = sorted(
        v.groupBy("custkey", "version")
        .agg(F.min("prio").alias("prio"), F.count("*").alias("n"))
        .collect()
    )
    assert [(r.custkey, r.version, r.prio, r.n) for r in got] == [
        (1, 1, "A", 2),
        (1, 2, "B", 1),
        (1, 3, "A", 2),
        (2, 1, "C", 1),
    ]


def test_gap_fill_covers_full_spine_and_carries(spark):
    """The output covers every (type, hour) cell of the calendar spine
    exactly once; carried_cents is non-decreasing only at observation
    points (it equals the previous value on gap hours); zero-count
    hours never introduce new carried values."""
    rows = QUERIES["events_gap_fill"](spark, SF_DIR).collect()
    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r)
    spine_lens = {len(v) for v in by_type.values()}
    assert len(spine_lens) == 1  # every type has the identical spine
    for hist in by_type.values():
        hist.sort(key=lambda r: r.hr)
        prev = 0
        for r in hist:
            if r.n_events == 0:
                assert r.carried_cents == prev  # LOCF: gaps carry
            prev = r.carried_cents
    # hours are contiguous: 1-hour steps end-to-end
    hrs = sorted({r.hr for r in rows})
    assert len(hrs) == len(rows) // len(by_type)


def test_profile_card_counts_match_table(spark):
    from bytesprocessor_spark.sources.tables import load_table

    o = load_table(spark, SF_DIR, "orders")
    n = o.count()
    rows = {r.col_name: r for r in QUERIES["profile_orders_card"](spark, SF_DIR).collect()}
    assert set(rows) == {
        "o_custkey", "o_orderdate", "o_orderkey", "o_orderpriority",
        "o_orderstatus", "o_totalprice_cents",
    }
    for r in rows.values():
        assert r.n_rows == n and r.n_nulls == 0
    assert rows["o_orderkey"].n_distinct == n  # primary key
    assert int(rows["o_custkey"].min_repr) >= 0
    assert int(rows["o_custkey"].max_repr) >= int(rows["o_custkey"].min_repr)


def test_referential_audit_clean_fixture(spark):
    rows = QUERIES["audit_referential_integrity"](spark, SF_DIR).collect()
    assert len(rows) == 7
    assert all(r.n_orphan_rows == 0 and r.n_orphan_keys == 0 for r in rows)
    assert all(r.n_child > 0 for r in rows)


def test_referential_audit_detects_planted_orphans(spark):
    """The audit shape on a planted 2-orphan child: NULL keys are not
    violations, orphan rows vs distinct orphan keys differ."""
    child = spark.createDataFrame(
        [(1,), (1,), (2,), (99,), (99,), (None,)], "k int"
    )
    parent = spark.createDataFrame([(1,), (2,), (3,)], "k int").withColumn(
        "__hit", F.lit(1)
    )
    orphan = F.col("k").isNotNull() & F.col("__hit").isNull()
    row = (
        child.join(F.broadcast(parent), "k", "left")
        .agg(
            F.count(F.lit(1)).alias("n_child"),
            F.count(F.when(orphan, 1)).alias("n_orphan_rows"),
            F.countDistinct(F.when(orphan, F.col("k"))).alias("n_orphan_keys"),
        )
        .collect()[0]
    )
    assert (row.n_child, row.n_orphan_rows, row.n_orphan_keys) == (6, 2, 1)


def test_incremental_rollup_equals_full_recompute(spark):
    """The merged base+delta rollup must be row-identical to a direct
    full-table rollup (the defining property of incremental
    maintenance)."""
    from bytesprocessor_spark.sources.tables import load_table

    merged = {
        r.month: (r.n_orders, r.revenue)
        for r in QUERIES["orders_incremental_rollup"](spark, SF_DIR).collect()
    }
    o = load_table(spark, SF_DIR, "orders")
    full = {
        r.month: (r.n, float(r.rc) / 100.0)
        for r in o.groupBy(
            F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM").alias("month")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("rc"),
        )
        .collect()
    }
    assert merged == full


def test_classifier_score_matches_independent_recompute(spark):
    """The per-source readout must equal a from-scratch driver-side
    recompute of the hashing trick (python re + hashlib — no Spark
    expressions shared with the implementation), pinning tokenizer,
    bucket hash, weight derivation, and the exact-integer sums."""
    import hashlib
    import re

    from bytesprocessor_spark.sources.tables import load_table

    def h60(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    docs = load_table(spark, SF_DIR, "documents").select(
        "doc_id", "source", "text"
    ).collect()
    per_source: dict[str, list[int]] = {}
    for d in docs:
        score = 0
        for tok in re.split(r"[^a-z0-9]+", d.text.lower()):
            if tok:
                score += h60(str(h60(tok) % 512)) % 2001 - 1000
        per_source.setdefault(d.source, []).append(score)
    expect = {
        src: (
            len(scores),
            sum(1 for s in scores if s > 0),
            sum(scores),
            min(scores),
            max(scores),
        )
        for src, scores in per_source.items()
    }
    got = {
        r.source: (
            r.n_docs, r.n_positive, r.sum_score_micro,
            r.min_score_micro, r.max_score_micro,
        )
        for r in QUERIES["text_classifier_score"](spark, SF_DIR).collect()
    }
    assert got == expect


def test_triangles_hand_graph(spark):
    """K4 has exactly 4 triangles and 12 wedges; a 4-path has 0 and 2.
    Replicates the oriented two-join enumeration on literal edges."""
    def count(edges):
        e = spark.createDataFrame(edges, "a int, b int")
        e1, e2, e3 = e.alias("e1"), e.alias("e2"), e.alias("e3")
        return (
            e1.join(e2, F.col("e1.b") == F.col("e2.a"))
            .join(e3, (F.col("e3.a") == F.col("e1.a")) & (F.col("e3.b") == F.col("e2.b")))
            .count()
        )

    k4 = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
    path = [(1, 2), (2, 3), (3, 4)]
    assert count(k4) == 4
    assert count(path) == 0


def test_triangles_fixture_consistency(spark):
    """3*triangles <= wedges (every triangle closes 3 wedges), and the
    supplier graph at this sf is non-degenerate."""
    row = QUERIES["graph_triangles"](spark, SF_DIR).collect()[0]
    assert row.n_nodes > 0 and row.n_edges > 0
    assert 3 * row.n_triangles <= row.n_wedges


def test_prefix_rerank_full_pool_equals_brute_force(spark):
    """With the candidate pool covering the whole corpus, staged
    rerank must return exactly the brute-force integer-dot top-k —
    the staging can only lose recall via pool truncation, never via
    the rerank itself."""
    from bytesprocessor_spark.sources.tables import load_table
    from bytesprocessor_spark.functions.vectors import dot_product
    import bytesprocessor_spark.queries_warehouse as qw

    emb = load_table(spark, SF_DIR, "embeddings")
    e = emb.select(
        "vec_id",
        F.transform("embedding", lambda x: F.round(x.cast("double") * 1000000.0)).alias("v"),
    )
    q = F.broadcast(
        e.where(F.col("vec_id") < 5).select(
            F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
        )
    )
    brute = (
        e.crossJoin(q)
        .where(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id", "vec_id",
            dot_product(F.col("qv"), F.col("v")).cast("long").alias("dot"),
        )
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("query_id").orderBy(F.col("dot").desc(), F.col("vec_id"))
    expect = {
        (r.query_id, r.rank): r.vec_id
        for r in brute.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= qw._RERANK_K)
        .collect()
    }
    n = emb.count()
    old_pool = qw._RERANK_POOL
    qw._RERANK_POOL = n  # pool == corpus: staging is lossless
    try:
        got = {
            (r.query_id, r.rank): r.vec_id
            for r in QUERIES["similarity_prefix_rerank"](spark, SF_DIR).collect()
        }
    finally:
        qw._RERANK_POOL = old_pool
    assert got == expect


def test_approx_percentile_bound_holds(spark):
    rows = QUERIES["agg_approx_percentile"](spark, SF_DIR).collect()
    assert len(rows) == 3
    for r in rows:
        assert r.approx_within_1pct
        # median*2 <= 2*p95: order statistics are ordered
        assert r.p50_cents_x2 <= 2 * r.p95_cents


def test_time_split_partitions_are_disjoint_and_ordered(spark):
    """Split bands tile the event timeline: counts sum to the table,
    and max(train) < min(embargo) <= ... < min(future) — the embargo
    really separates train from test in time."""
    from bytesprocessor_spark.sources.tables import load_table

    rows = {r.split: r for r in QUERIES["events_time_split"](spark, SF_DIR).collect()}
    total = load_table(spark, SF_DIR, "events").count()
    assert sum(r.n_events for r in rows.values()) == total
    present = [s for s in ("train", "embargo", "test", "future") if s in rows]
    for a, b in zip(present, present[1:]):
        assert rows[a].last_ts < rows[b].first_ts


def test_stream_trending_topk_matches_batch_window(spark):
    """The drained streaming result must equal the batch sliding-window
    computation (replay validity of windowed counting)."""
    from bytesprocessor_spark.sources.tables import load_table

    got = {
        (r.win_start, r.rank): (r.event_type, r.n)
        for r in QUERIES["stream_trending_topk"](spark, SF_DIR).collect()
    }
    ev = load_table(spark, SF_DIR, "events")
    counts = ev.groupBy(
        F.window("ts", "6 hours", "3 hours").alias("win"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n"))
    rk = F.row_number().over(
        Window.partitionBy("win_start").orderBy(F.col("n").desc(), "event_type")
    )
    expect = {
        (r.win_start, r.rank): (r.event_type, r.n)
        for r in counts.select(
            F.date_format("win.start", "yyyy-MM-dd HH:mm:ss").alias("win_start"),
            "event_type",
            "n",
        )
        .withColumn("rank", rk)
        .where(F.col("rank") <= 3)
        .collect()
    }
    assert got == expect


def test_schema_evolution_union(spark, tmp_path):
    """S13: generation 1 (id int, v float) + generation 2 (id long,
    v double, extra string) read as one frame: ids widened, missing
    extra -> NULL, row set complete — and the plan has no shuffle
    (unions concatenate partitions)."""
    from bytesprocessor_spark.sources.tables import read_parquet_evolved

    g1 = str(tmp_path / "g1")
    g2 = str(tmp_path / "g2")
    spark.createDataFrame([(1, 1.5), (2, 2.5)], "id int, v float").write.parquet(g1)
    spark.createDataFrame(
        [(3, 3.5, "x")], "id long, v double, extra string"
    ).write.parquet(g2)
    df = read_parquet_evolved(
        spark, g1, g2, type_widening={"id": "long", "v": "double"}
    )
    assert dict(df.dtypes)["id"] == "bigint"
    assert dict(df.dtypes)["v"] == "double"
    rows = {r.id: (r.v, r.extra) for r in df.collect()}
    assert rows == {1: (1.5, None), 2: (2.5, None), 3: (3.5, "x")}
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_heavy_hitters_bounds_hold(spark):
    rows = QUERIES["agg_heavy_hitters"](spark, SF_DIR).collect()
    assert len(rows) == 10
    assert all(r.cms_ge_exact and r.cms_within_eps for r in rows)
    counts = [r.exact_count for r in rows]
    assert counts == sorted(counts, reverse=True)


def test_psi_contributions_nonnegative_and_consistent(spark):
    """Every PSI term (p-q)ln(p/q) is >= 0 by construction (signs
    agree; quantization preserves sign), and bucket counts cover the
    table."""
    from bytesprocessor_spark.sources.tables import load_table

    rows = QUERIES["drift_psi_orders"](spark, SF_DIR).collect()
    assert all(r.contrib_pico >= 0 for r in rows)
    total = load_table(spark, SF_DIR, "orders").count()
    assert sum(r.n_base + r.n_delta for r in rows) == total
    assert any(r.contrib_pico > 0 for r in rows) or len(rows) == 1


def test_psi_identical_eras_is_zero(spark):
    """Two identical distributions must produce PSI == 0 in every
    bucket (pm == qm -> contribution exactly 0) — replicated inline on
    a 50/50 duplicated literal frame."""
    base = spark.createDataFrame([(i % 7,) for i in range(70)], "bucket long")
    b = base.withColumn("era", F.lit(0)).unionAll(base.withColumn("era", F.lit(1)))
    c = b.groupBy("bucket").agg(
        (F.count(F.when(F.col("era") == 0, 1)) + 1).alias("nb"),
        (F.count(F.when(F.col("era") == 1, 1)) + 1).alias("nd"),
    )
    tot = c.agg(F.sum("nb").alias("tb"), F.sum("nd").alias("td"))
    p = c.crossJoin(F.broadcast(tot)).select(
        F.floor(F.col("nb") * 1000000 / F.col("tb")).alias("pm"),
        F.floor(F.col("nd") * 1000000 / F.col("td")).alias("qm"),
    )
    assert all(r.pm == r.qm for r in p.collect())


def test_gram_matrix_matches_numpy(spark):
    """The distributed Gram matrix must equal a from-scratch numpy
    recompute on the collected (quantized) vectors — exact integer
    equality, every cell."""
    import numpy as np

    from bytesprocessor_spark.sources.tables import load_table

    vecs = [
        r.embedding
        for r in load_table(spark, SF_DIR, "embeddings").select("embedding").collect()
    ]
    V = np.round(np.array(vecs, dtype=np.float64) * 1000.0).astype(np.int64)
    G = V.T @ V  # full symmetric Gram
    got = {
        (r.i, r.j): r.gram
        for r in QUERIES["embedding_gram_matrix"](spark, SF_DIR).collect()
    }
    d = V.shape[1]
    assert len(got) == d * (d + 1) // 2
    for (i, j), g in got.items():
        assert g == int(G[i - 1, j - 1]), (i, j)


def test_winsorized_mean_is_robust(spark):
    """Clipping bounds the mean: winsorized_mean lies within [lo, hi]
    of the raw distribution and clip counts stay near 5% tails."""
    rows = QUERIES["agg_winsorized_stats"](spark, SF_DIR).collect()
    assert len(rows) == 3
    for r in rows:
        assert r.n_clipped_low < 0.06 * r.n
        assert r.n_clipped_high <= 0.05 * r.n + 1
        # clipping pulls tails inward; with a right-skewed price
        # distribution the winsorized mean cannot exceed the raw mean
        # by more than the clip slack
        assert abs(r.winsorized_mean - r.raw_mean) < r.raw_mean * 0.2


def test_vocab_growth_monotone_and_complete(spark):
    """Vocabulary size grows monotonically with docs seen and the last
    checkpoint (>= max doc count) equals the full corpus vocabulary."""
    from bytesprocessor_spark.functions.text import tokenize
    from bytesprocessor_spark.sources.tables import load_table

    rows = QUERIES["text_vocab_growth"](spark, SF_DIR).collect()
    sizes = [r.vocab_size for r in sorted(rows, key=lambda r: r.docs_seen)]
    assert sizes == sorted(sizes)
    d = load_table(spark, SF_DIR, "documents")
    full_vocab = (
        d.select(F.explode(tokenize(F.col("text"))).alias("t")).distinct().count()
    )
    if d.count() <= rows[-1].docs_seen:
        assert sizes[-1] == full_vocab


def test_cuped_removes_pre_period_imbalance(spark):
    """With y == x exactly (perfect covariate), theta == 1 and the
    CUPED adjustment collapses both arms to the pooled pre-period
    mean — arm imbalance vanishes entirely."""
    rows = [(0, 100, 100), (0, 200, 200), (1, 400, 400), (1, 600, 600)]
    u = spark.createDataFrame(rows, "grp int, x long, y long")
    pool = u.agg(
        F.count(F.lit(1)).alias("n"), F.sum("x").alias("sx"), F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    g = u.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n_users"), F.sum("x").alias("gx"), F.sum("y").alias("gy")
    )
    theta = (
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
        / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    )
    adj = (
        F.col("gy").cast("double") / F.col("n_users")
        - theta * (
            F.col("gx").cast("double") / F.col("n_users")
            - F.col("sx").cast("double") / F.col("n")
        )
    )
    out = {r.grp: r.adj for r in g.crossJoin(F.broadcast(pool)).select("grp", adj.alias("adj")).collect()}
    assert out[0] == out[1] == 325.0  # pooled pre mean (100+200+400+600)/4


def test_cuped_fixture_readout_shape(spark):
    rows = QUERIES["events_cuped"](spark, SF_DIR).collect()
    assert [r.grp for r in rows] == [0, 1]
    for r in rows:
        assert r.n_users > 0
        # the adjustment is a correction, not a rewrite: same ballpark
        assert abs(r.cuped_adjusted_post - r.mean_post) < max(abs(r.mean_post), 1.0)


def test_overwrite_partitions_touches_only_named_partitions(spark, tmp_path):
    """Dynamic-overwrite backfill: rewriting one partition's data must
    leave sibling partitions byte-identical and must not drop them
    (static overwrite truncates the whole table first — the failure
    mode this helper exists to prevent); re-running the same backfill
    is idempotent."""
    from bytesprocessor_spark.sources.tables import overwrite_partitions

    path = str(tmp_path / "t")
    base = spark.createDataFrame(
        [(1, "a", 10), (2, "a", 20), (3, "b", 30), (4, "c", 40)],
        "id long, day string, v long",
    )
    base.write.partitionBy("day").parquet(path)

    fix = spark.createDataFrame([(2, "a", 99)], "id long, day string, v long")
    overwrite_partitions(fix, path, ["day"])
    rows = {(r.id, r.day, r.v) for r in spark.read.parquet(path).collect()}
    assert rows == {(2, "a", 99), (3, "b", 30), (4, "c", 40)}  # b, c intact

    overwrite_partitions(fix, path, ["day"])  # idempotent re-run
    rows2 = {(r.id, r.day, r.v) for r in spark.read.parquet(path).collect()}
    assert rows2 == rows
