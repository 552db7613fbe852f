"""Round-7 analytics batch: feature-engineering, lakehouse-evolution,
and rank/dispersion statistics rows extending SURVEY §2.

- FE2 orders_target_encoding: leave-one-out target encoding — THE
  standard categorical encoder for gradient-boosted models.  The
  100 TB shape matters: the naive window-over-category plan shuffles
  every row by a 5-value key (maximum skew); the right plan is a
  5-row aggregate BROADCAST back onto the scan, so the fact table
  never shuffles.
- S16 schema_evolution_read: two parquet batches with different
  schemas under one table root, read through mergeSchema — the
  lakehouse column-add contract (old files yield NULLs, new files
  carry the column; no rewrite).
- A73 part_kendall_tau: Kendall tau-a rank concordance per bounded
  group via an equi-join pair enumeration (<= C(50,2) pairs per
  brand), the ordinal complement of A66's Spearman.
- A79 events_overdispersion: variance-to-mean ratio (index of
  dispersion) of daily counts per event type — the Poisson-ness
  screen run before choosing a count model; exact-integer VMR via
  the n*Σx²-(Σx)² identity.
- J14 orders_interval_overlap: interval x interval OVERLAP join via
  month-bin blocking (explode each interval to the calendar bins it
  touches, equi-join on bin, dedup, verify exactly) — the scale form
  of a predicate no sort-merge join can run; J6's range join covers
  point-in-interval, this covers interval-vs-interval.

Reference scope note: the reference engine ends at the labeled packet
table (BytesProcessor.py:121-187); these are EXT rows of the analytics
surface SURVEY §2 declares on top of it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bytesprocessor_spark.queries import _t, cents, query


# ---------------------------------------------------------------------------
# FE2: leave-one-out target encoding
# ---------------------------------------------------------------------------

@query(
    "orders_target_encoding",
    """
    WITH y AS (
      SELECT o_orderkey, o_orderpriority,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS y_c
      FROM orders
    ),
    cat AS (
      SELECT o_orderpriority,
             CAST(COUNT(*) AS BIGINT) AS n_cat,
             CAST(SUM(y_c) AS BIGINT) AS sum_c
      FROM y GROUP BY o_orderpriority
    ),
    enc AS (
      SELECT y.o_orderkey, y.o_orderpriority,
             (cat.sum_c - y.y_c) * 100 // (cat.n_cat - 1) AS enc_cc
      FROM y JOIN cat USING (o_orderpriority)
      WHERE cat.n_cat > 1
    )
    SELECT o_orderpriority,
           CAST(o_orderkey % 8 AS BIGINT) AS key_bucket,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(MIN(enc_cc) AS BIGINT) AS min_enc_cc,
           CAST(MAX(enc_cc) AS BIGINT) AS max_enc_cc,
           CAST(SUM(enc_cc) AS BIGINT) AS sum_enc_cc
    FROM enc GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def orders_target_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FE2 leave-one-out target encoding: each row's category encode is
    the mean target of every OTHER row in its category,
    (sum_cat - y_i) / (n_cat - 1) — the leakage-safe form (plain mean
    encoding leaks the row's own label into its feature).

    Exact arithmetic: targets in cents, encode in centi-cents via
    truncating integer division (both engines truncate toward zero).

    Scale shape: the category table is a 5-row aggregate BROADCAST
    onto the fact scan — the fact table never shuffles (the window
    formulation would hash-partition 100 TB by a 5-value key, the
    worst skew possible).  Readout is a bounded
    (category x key-bucket) rollup."""
    y = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        cents(F.col("o_totalprice")).alias("y_c"),
    )
    cat = y.groupBy("o_orderpriority").agg(
        F.count("*").cast("long").alias("n_cat"),
        F.sum("y_c").cast("long").alias("sum_c"),
    )
    enc = (
        y.join(F.broadcast(cat), "o_orderpriority")
        .where(F.col("n_cat") > 1)
        .select(
            "o_orderpriority",
            (F.col("o_orderkey") % 8).cast("long").alias("key_bucket"),
            F.expr("(sum_c - y_c) * 100 div (n_cat - 1)").alias("enc_cc"),
        )
    )
    return (
        enc.groupBy("o_orderpriority", "key_bucket")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.min("enc_cc").cast("long").alias("min_enc_cc"),
            F.max("enc_cc").cast("long").alias("max_enc_cc"),
            F.sum("enc_cc").cast("long").alias("sum_enc_cc"),
        )
        .orderBy("o_orderpriority", "key_bucket")
    )


# ---------------------------------------------------------------------------
# S16: schema-evolution read (mergeSchema column add)
# ---------------------------------------------------------------------------

@query(
    "schema_evolution_read",
    """
    WITH e AS (
      SELECT event_id, event_type,
             CASE WHEN event_id % 2 = 1
                  THEN CAST(ROUND(value * 100) AS BIGINT) END AS value_c
      FROM events
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN value_c IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_pre_evolution,
           CAST(COALESCE(SUM(value_c), 0) AS BIGINT) AS sum_value_c,
           CAST(MIN(event_id) AS BIGINT) AS min_event_id
    FROM e GROUP BY event_type ORDER BY event_type
    """,
)
def schema_evolution_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S16 schema evolution: a table root holding files written BEFORE
    and AFTER a column add, read as one relation.  Batch 1 (even
    event_ids) lands without ``value_c``; batch 2 (odd) lands with it;
    ``mergeSchema`` unions the file schemas so batch-1 rows surface
    NULL — the lakehouse additive-evolution contract (no rewrite of
    old files, exactly how Delta/Iceberg add columns).

    The oracle recomputes the union semantics from the events
    arithmetic: equality proves old-file rows survive with NULLs (not
    dropped, not defaulted) and new-file values round-trip.

    EAGER_QUERIES member: writes the two-schema fixture at
    construction.  Scale shape: mergeSchema costs one footer read per
    FILE (not per row) at planning time; the scan itself is ordinary
    columnar pruning — missing columns materialize as null vectors,
    no data movement."""
    import os
    import shutil
    import tempfile

    ev = _t(spark, sf_dir, "events")
    land = tempfile.mkdtemp(prefix="bp_schevo_")
    try:
        root = os.path.join(land, "tbl")
        ev.where(F.col("event_id") % 2 == 0).select(
            "event_id", "event_type"
        ).write.parquet(root)
        ev.where(F.col("event_id") % 2 == 1).select(
            "event_id",
            "event_type",
            cents(F.col("value")).alias("value_c"),
        ).write.mode("append").parquet(root)

        merged = spark.read.option("mergeSchema", "true").parquet(root)
        out = (
            merged.groupBy("event_type")
            .agg(
                F.count("*").cast("long").alias("n"),
                F.sum(F.when(F.col("value_c").isNull(), 1).otherwise(0))
                .cast("long")
                .alias("n_pre_evolution"),
                F.coalesce(F.sum("value_c"), F.lit(0))
                .cast("long")
                .alias("sum_value_c"),
                F.min("event_id").cast("long").alias("min_event_id"),
            )
            .orderBy("event_type")
        )
        # bounded localize (one row per event type) so the fixture drops
        return spark.createDataFrame(out.collect(), out.schema)
    finally:
        shutil.rmtree(land, ignore_errors=True)


# ---------------------------------------------------------------------------
# A73: Kendall tau-a rank concordance per bounded group
# ---------------------------------------------------------------------------

@query(
    "part_kendall_tau",
    """
    WITH m AS (
      SELECT p_brand, p_size,
             CAST(SUM(CAST(ROUND(p_retailprice * 100) AS BIGINT)) AS BIGINT)
               AS metric_c
      FROM part GROUP BY p_brand, p_size
    ),
    pairs AS (
      SELECT a.p_brand,
             CASE WHEN (b.metric_c - a.metric_c) > 0 THEN 1 ELSE 0 END AS conc,
             CASE WHEN (b.metric_c - a.metric_c) < 0 THEN 1 ELSE 0 END AS disc
      FROM m a JOIN m b
        ON a.p_brand = b.p_brand AND a.p_size < b.p_size
    )
    SELECT p_brand,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(SUM(conc) AS BIGINT) AS n_conc,
           CAST(SUM(disc) AS BIGINT) AS n_disc,
           CAST((SUM(conc) - SUM(disc)) * 1000000 // COUNT(*) AS BIGINT)
             AS tau_ppm
    FROM pairs GROUP BY p_brand ORDER BY p_brand
    """,
)
def part_kendall_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A73 Kendall tau-a: per brand, rank concordance between part size
    and total retail value — does bigger consistently mean pricier?
    Pairs ordered by size (a.size < b.size) are concordant when the
    metric also rises, discordant when it falls; tau-a = (C - D) /
    n_pairs (ties count neither).  The ordinal complement of A66's
    Spearman (which correlates rank VALUES; tau counts pair
    inversions and is the statistic behind tau distance / sort
    quality measures).

    Exact arithmetic: integer cents metric, ppm tau via truncating
    division (matches DuckDB // on negative numerators).

    Scale shape: pair enumeration is an EQUI-join on brand over the
    (brand, size) AGGREGATE (<= 50 rows per brand -> <= C(50,2) pairs
    per group, millions of raw parts never pair) — per-group-bounded
    quadratic work after a linear aggregate, the same contract as the
    SemDeDup cell bound."""
    m = (
        _t(spark, sf_dir, "part")
        .groupBy("p_brand", "p_size")
        .agg(F.sum(cents(F.col("p_retailprice"))).cast("long").alias("metric_c"))
    )
    a, b = m.alias("a"), m.alias("b")
    pairs = a.join(
        b,
        (F.col("a.p_brand") == F.col("b.p_brand"))
        & (F.col("a.p_size") < F.col("b.p_size")),
    ).select(
        F.col("a.p_brand").alias("p_brand"),
        (F.col("b.metric_c") > F.col("a.metric_c")).cast("int").alias("conc"),
        (F.col("b.metric_c") < F.col("a.metric_c")).cast("int").alias("disc"),
    )
    return (
        pairs.groupBy("p_brand")
        .agg(
            F.count("*").cast("long").alias("n_pairs"),
            F.sum("conc").cast("long").alias("n_conc"),
            F.sum("disc").cast("long").alias("n_disc"),
        )
        .select(
            "p_brand",
            "n_pairs",
            "n_conc",
            "n_disc",
            F.expr("(n_conc - n_disc) * 1000000 div n_pairs").alias("tau_ppm"),
        )
        .orderBy("p_brand")
    )


# ---------------------------------------------------------------------------
# A79: overdispersion screen (variance-to-mean ratio of daily counts)
# ---------------------------------------------------------------------------

@query(
    "events_overdispersion",
    """
    WITH d AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(COUNT(*) AS BIGINT) AS x
      FROM events GROUP BY 1, 2
    ),
    s AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n_days,
             CAST(SUM(x) AS BIGINT) AS sum_x,
             CAST(SUM(x * x) AS BIGINT) AS sum_x2
      FROM d GROUP BY event_type
    )
    SELECT event_type, n_days, sum_x, sum_x2,
           CAST((n_days * sum_x2 - sum_x * sum_x) * 1000000
                // ((n_days - 1) * sum_x) AS BIGINT) AS vmr_ppm,
           (n_days * sum_x2 - sum_x * sum_x) * 1000000
             // ((n_days - 1) * sum_x) > 1500000 AS overdispersed
    FROM s WHERE n_days > 1 AND sum_x > 0
    ORDER BY event_type
    """,
)
def events_overdispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A79 index of dispersion: per event type, the variance-to-mean
    ratio of DAILY event counts.  Poisson arrivals give VMR = 1;
    VMR >> 1 (bursty users, campaigns, incidents) means a Poisson
    count model will wildly understate tail probabilities — the screen
    run before choosing negative-binomial over Poisson, and a cheap
    burstiness monitor for ingest volumes.

    Exact arithmetic: VMR = sample_var / mean simplifies to
    (n·Σx² − (Σx)²) / ((n−1)·Σx) — all-integer, one truncating
    division at ppm scale; flag threshold 1.5 chosen so both verdicts
    occur on the fixture.

    Scale shape: two cascaded hash aggregates (events → day cells →
    per-type moment sums); the day-cell table is calendar-bounded, the
    moment identity needs no second pass and no centered data."""
    d = (
        _t(spark, sf_dir, "events")
        .groupBy(
            "event_type",
            F.date_trunc("day", "ts").cast("date").alias("day"),
        )
        .agg(F.count("*").cast("long").alias("x"))
    )
    s = d.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_days"),
        F.sum("x").cast("long").alias("sum_x"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sum_x2"),
    )
    return (
        s.where((F.col("n_days") > 1) & (F.col("sum_x") > 0))
        .select(
            "event_type",
            "n_days",
            "sum_x",
            "sum_x2",
            F.expr(
                "(n_days * sum_x2 - sum_x * sum_x) * 1000000"
                " div ((n_days - 1) * sum_x)"
            ).alias("vmr_ppm"),
        )
        .withColumn("overdispersed", F.col("vmr_ppm") > 1500000)
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# J14: interval x interval overlap join via calendar-bin blocking
# ---------------------------------------------------------------------------

@query(
    "orders_interval_overlap",
    """
    WITH iv AS (
      SELECT o_orderkey, o_custkey, o_orderstatus,
             CAST(o_orderdate AS DATE) AS s,
             CAST(o_orderdate AS DATE)
               + CAST(1 + o_orderkey % 21 AS INTEGER) AS e
      FROM orders WHERE o_custkey % 50 = 7
    ),
    l AS (SELECT * FROM iv WHERE o_orderstatus = 'O'),
    r AS (SELECT * FROM iv WHERE o_orderstatus = 'F'),
    p AS (
      SELECT l.o_orderkey AS l_key, r.o_orderkey AS r_key,
             GREATEST(l.s, r.s) AS os, LEAST(l.e, r.e) AS oe
      FROM l JOIN r
        ON l.o_custkey % 10 = r.o_custkey % 10
       AND l.s <= r.e AND r.s <= l.e
    )
    SELECT CAST(YEAR(os) * 12 + MONTH(os) - 1 AS BIGINT) AS month_idx,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(SUM(oe - os + 1) AS BIGINT) AS sum_overlap_days,
           CAST(MIN(l_key) AS BIGINT) AS min_l_key,
           CAST(MAX(r_key) AS BIGINT) AS max_r_key
    FROM p GROUP BY 1 ORDER BY 1
    """,
)
def orders_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J14 interval x interval overlap join: every (open-order,
    finished-order) pair of the same customer block whose validity
    windows intersect — the predicate behind double-booking detection,
    concurrent-session attribution, and temporal FK checks.  J6's
    range join places a POINT in an interval; overlap is
    interval-vs-interval, where the naive theta join is quadratic.

    Scale pattern (the bucketed-range-join idea applied twice): each
    interval EXPLODES to the calendar months it touches (<= 2 bins for
    these <= 22-day windows), the join runs as an EQUI-join on
    (customer block, month bin) — overlapping intervals share a
    calendar day, hence a month, so blocking loses nothing — and
    pairs straddling a month boundary are deduplicated by keeping the
    bin of the overlap start.  The exact predicate then verifies each
    bounded candidate list.  No CartesianProduct, no
    BroadcastNestedLoopJoin anywhere in the plan.

    Determinism: pure integer date arithmetic (day-granularity
    intervals, inclusive ends)."""
    iv = (
        _t(spark, sf_dir, "orders")
        .where(F.col("o_custkey") % 50 == 7)
        .select(
            "o_orderkey",
            "o_custkey",
            "o_orderstatus",
            F.col("o_orderdate").cast("date").alias("s"),
            F.expr(
                "date_add(CAST(o_orderdate AS DATE),"
                " CAST(1 + o_orderkey % 21 AS INT))"
            ).alias("e"),
        )
    )
    mi = lambda c: F.year(c) * 12 + F.month(c) - 1  # noqa: E731
    binned = iv.withColumn(
        "bin", F.explode(F.sequence(mi(F.col("s")), mi(F.col("e"))))
    ).withColumn("blk", F.col("o_custkey") % 10)
    l = binned.where(F.col("o_orderstatus") == "O").select(
        F.col("o_orderkey").alias("l_key"),
        F.col("s").alias("l_s"),
        F.col("e").alias("l_e"),
        "blk",
        "bin",
    )
    r = binned.where(F.col("o_orderstatus") == "F").select(
        F.col("o_orderkey").alias("r_key"),
        F.col("s").alias("r_s"),
        F.col("e").alias("r_e"),
        "blk",
        "bin",
    )
    pairs = (
        l.join(r, ["blk", "bin"])
        .where((F.col("l_s") <= F.col("r_e")) & (F.col("r_s") <= F.col("l_e")))
        .withColumn("os", F.greatest("l_s", "r_s"))
        .withColumn("oe", F.least("l_e", "r_e"))
        # a pair straddling a month boundary appears once per shared
        # bin: keep only the overlap-start bin (no distinct needed)
        .where(F.col("bin") == mi(F.col("os")))
    )
    return (
        pairs.groupBy(mi(F.col("os")).cast("long").alias("month_idx"))
        .agg(
            F.count("*").cast("long").alias("n_pairs"),
            F.sum(F.datediff("oe", "os") + 1).cast("long").alias(
                "sum_overlap_days"
            ),
            F.min("l_key").cast("long").alias("min_l_key"),
            F.max("r_key").cast("long").alias("max_r_key"),
        )
        .orderBy("month_idx")
    )


# ---------------------------------------------------------------------------
# GR9: label-propagation community detection (synchronous LPA)
# ---------------------------------------------------------------------------

_LPA_ITERS = 3


def _lpa_oracle_sql() -> str:
    parts = [
        """
    WITH os AS MATERIALIZED (
      SELECT DISTINCT l.l_orderkey AS o, l.l_suppkey AS s, su.s_nationkey AS nk
      FROM lineitem l JOIN supplier su ON l.l_suppkey = su.s_suppkey
    ),
    e0 AS MATERIALIZED (
      SELECT a.s AS a, b.s AS b
      FROM os a JOIN os b ON a.o = b.o AND a.nk = b.nk AND a.s < b.s
      GROUP BY 1, 2 HAVING COUNT(*) >= 2
    ),
    l0 AS MATERIALIZED (
      SELECT z, z AS lbl
      FROM (SELECT a AS z FROM e0 UNION SELECT b AS z FROM e0)
    )"""
    ]
    for i in range(1, _LPA_ITERS + 1):
        p = i - 1
        parts.append(f"""
    c{i} AS MATERIALIZED (
      SELECT z, lbl, COUNT(*) AS cnt FROM (
        SELECT e.a AS z, l.lbl FROM e0 e JOIN l{p} l ON e.b = l.z
        UNION ALL
        SELECT e.b AS z, l.lbl FROM e0 e JOIN l{p} l ON e.a = l.z
      ) GROUP BY z, lbl),
    l{i} AS MATERIALIZED (
      SELECT z, lbl FROM (
        SELECT z, lbl,
               ROW_NUMBER() OVER (PARTITION BY z
                                  ORDER BY cnt DESC, lbl) AS rn
        FROM c{i}
      ) WHERE rn = 1)""")
    parts.append(f""",
    comm AS (
      SELECT lbl, CAST(COUNT(*) AS BIGINT) AS n_members
      FROM l{_LPA_ITERS} GROUP BY lbl
    )
    SELECT n_members AS community_size,
           CAST(COUNT(*) AS BIGINT) AS n_communities,
           CAST(SUM(n_members) AS BIGINT) AS n_nodes,
           CAST(MIN(lbl) AS BIGINT) AS min_label
    FROM comm GROUP BY 1 ORDER BY 1
    """)
    # head, then the per-iteration CTE pairs comma-joined, then the
    # final readout (which begins with its own comma)
    return ",".join(parts[:-1]) + parts[-1]


@query("graph_lpa_communities", _lpa_oracle_sql())
def graph_lpa_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GR9 community detection by synchronous label propagation
    (Raghavan et al. 2007, arXiv:0709.2938) over the NATION-blocked
    co-supplier graph (same-nation suppliers sharing >= 2 orders — the
    GR7 edge rule restricted to regional networks, which keeps the
    community structure non-trivial; the unblocked graph is so dense
    one label floods everything in 3 rounds): every
    node starts as its own label; each round it adopts the most
    frequent label among its neighbors (ties -> smallest label), run
    for a FIXED 3 synchronized rounds so the trajectory — normally
    update-order-dependent, the reason LPA results are hard to
    reproduce — is bit-deterministic and SQL-replayable (the oracle
    chains one CTE per round).

    Readout: the community-size histogram (how many communities of
    each size, total membership, smallest label as a spot check) —
    bounded by the distinct-size count.

    Scale shape: per round, one union of two equi-joins
    (edges x labels) + one (node, label) count + one per-node argmax
    aggregate — all shuffles keyed on node ids, labels are longs, the
    argmax is min_by over a (-count, label) struct (a pure aggregate,
    no per-node sort); lineage is cut per round with localCheckpoint
    like GR2's power iteration."""
    li = _t(spark, sf_dir, "lineitem")
    su = _t(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("s"), F.col("s_nationkey").alias("nk")
    )
    os_ = (
        li.select(F.col("l_orderkey").alias("o"), F.col("l_suppkey").alias("s"))
        .distinct()
        .join(F.broadcast(su), "s")
    )
    a, b = os_.alias("a"), os_.alias("b")
    e0 = (
        a.join(
            b,
            (F.col("a.o") == F.col("b.o"))
            & (F.col("a.nk") == F.col("b.nk"))
            & (F.col("a.s") < F.col("b.s")),
        )
        .groupBy(F.col("a.s").alias("a"), F.col("b.s").alias("b"))
        .count()
        .where(F.col("count") >= 2)
        .select("a", "b")
        .localCheckpoint(eager=False)
    )
    labels = (
        e0.select(F.col("a").alias("z"))
        .union(e0.select(F.col("b").alias("z")))
        .distinct()
        .select("z", F.col("z").alias("lbl"))
    )
    for _ in range(_LPA_ITERS):
        nbr = (
            e0.join(labels.withColumnRenamed("z", "b"), "b")
            .select(F.col("a").alias("z"), "lbl")
            .union(
                e0.join(labels.withColumnRenamed("z", "a"), "a").select(
                    F.col("b").alias("z"), "lbl"
                )
            )
        )
        counts = nbr.groupBy("z", "lbl").agg(F.count(F.lit(1)).alias("cnt"))
        labels = counts.groupBy("z").agg(
            F.expr("min_by(lbl, named_struct('nc', -cnt, 'lbl', lbl))").alias("lbl")
        ).localCheckpoint(eager=False)
    comm = labels.groupBy("lbl").agg(F.count(F.lit(1)).cast("long").alias("n_members"))
    return (
        comm.groupBy(F.col("n_members").alias("community_size"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_communities"),
            F.sum("n_members").cast("long").alias("n_nodes"),
            F.min("lbl").cast("long").alias("min_label"),
        )
        .orderBy("community_size")
    )
