"""Window-function and sort/set-op queries (SURVEY §2.5 W1-W3, §2.6
O1-O4) plus batch-mode equivalents of the streaming windows (§2.9
ST1-ST3 — same operators Structured Streaming uses, checked here on
bounded data where an oracle exists).

Determinism notes: every window orders on a unique key chain, running
aggregates fold exact integers (cents), and window *starts* are
compared as integer microseconds (Spark computes tumbling/sliding
windows in integer micros from the epoch — the oracle mirrors that
arithmetic exactly instead of trusting engine-specific bucketing
helpers).

Round-5 addition: W12 rolling robust outlier flag — per-user trailing
median + MAD over bounded 9-row frames, cents integers end-to-end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bytesprocessor_spark.queries import query, cents, _t


@query(
    "window_rank",
    """
    SELECT c_mktsegment, c_custkey,
           CAST(ROUND(c_acctbal * 100) AS DOUBLE) / 100.0 AS acctbal,
           ROW_NUMBER() OVER w AS rn,
           RANK()       OVER w AS rk,
           DENSE_RANK() OVER w AS drk,
           NTILE(4)     OVER w AS quartile
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
    QUALIFY rn <= 5
    """,
)
def window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking windows (W1): row_number/rank/dense_rank/ntile over one
    partitioned window.  NTILE is computed per-partition — the scale-
    correct form; a global NTILE would plan a single-partition sort."""
    cust = _t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
    return (
        cust.select(
            "c_mktsegment",
            "c_custkey",
            (F.round(F.col("c_acctbal") * 100).cast("double") / 100.0).alias("acctbal"),
            F.row_number().over(w).alias("rn"),
            F.rank().over(w).alias("rk"),
            F.dense_rank().over(w).alias("drk"),
            F.ntile(4).over(w).alias("quartile"),
        )
        .where(F.col("rn") <= 5)
    )


@query(
    "window_lag_lead",
    """
    SELECT event_id, user_id,
           LAG(event_id)  OVER w AS prev_event_id,
           LEAD(event_id) OVER w AS next_event_id,
           epoch_us(ts) - LAG(epoch_us(ts)) OVER w AS gap_us,
           FIRST_VALUE(event_id) OVER w AS first_event_id
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    return ev.select(
        "event_id",
        "user_id",
        F.lag("event_id").over(w).alias("prev_event_id"),
        F.lead("event_id").over(w).alias("next_event_id"),
        (us - F.lag(us).over(w)).alias("gap_us"),
        F.first("event_id").over(w).alias("first_event_id"),
    )


@query(
    "window_running",
    """
    SELECT event_id, user_id,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT))
                OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) / 100.0
             AS running_value,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT))
                OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) / 100.0
             AS sliding3_value
    FROM events
    """,
)
def window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Framed running aggregates (W3): exact integer accumulation in a
    prescribed order -> reduction-order independent."""
    ev = _t(spark, sf_dir, "events")
    base = Window.partitionBy("user_id").orderBy("ts", "event_id")
    v = cents(F.col("value"))
    return ev.select(
        "event_id",
        "user_id",
        (F.sum(v).over(base.rowsBetween(Window.unboundedPreceding, 0)).cast("double") / 100.0).alias(
            "running_value"
        ),
        (F.sum(v).over(base.rowsBetween(-2, 0)).cast("double") / 100.0).alias("sliding3_value"),
    )


# ---------------------------------------------------------------------------
# Sorts / limits / set ops (O1-O4)
# ---------------------------------------------------------------------------

@query(
    "sort_topk_nulls",
    """
    SELECT o_orderkey, NULLIF(o_orderstatus, 'O') AS status_or_null,
           CAST(ROUND(o_totalprice * 100) AS DOUBLE) / 100.0 AS totalprice
    FROM orders
    ORDER BY NULLIF(o_orderstatus, 'O') NULLS FIRST,
             o_totalprice DESC, o_orderkey
    LIMIT 20
    """,
)
def sort_topk_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1+O2 in one entry: global top-k with explicit null placement in
    the ordering.  Plans as TakeOrderedAndProject (per-partition heap +
    driver merge) — no global sort at any scale."""
    orders = _t(spark, sf_dir, "orders")
    s = F.nullif(F.col("o_orderstatus"), F.lit("O"))
    return (
        orders.select(
            "o_orderkey",
            s.alias("status_or_null"),
            (F.round(F.col("o_totalprice") * 100).cast("double") / 100.0).alias("totalprice"),
        )
        .orderBy(
            F.col("status_or_null").asc_nulls_first(),
            F.col("totalprice").desc(),
            F.col("o_orderkey"),
        )
        .limit(20)
    )


@query(
    "set_union_all",
    """
    SELECT nationkey, COUNT(*) AS n FROM (
      SELECT c_nationkey AS nationkey FROM customer
      UNION ALL
      SELECT s_nationkey AS nationkey FROM supplier
    ) GROUP BY nationkey
    """,
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    supp = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return cust.unionByName(supp).groupBy("nationkey").agg(F.count("*").alias("n"))


@query(
    "set_intersect_except",
    """
    SELECT 'intersect' AS op, key FROM (
      SELECT CAST(c_nationkey AS BIGINT) AS key FROM customer
      INTERSECT
      SELECT CAST(s_nationkey AS BIGINT) FROM supplier
    )
    UNION ALL
    SELECT 'except' AS op, key FROM (
      SELECT DISTINCT CAST(user_id AS BIGINT) AS key FROM events
      EXCEPT
      SELECT CAST(user_id AS BIGINT) FROM events
      WHERE event_type = 'purchase' AND value > 90
    )
    """,
)
def set_intersect_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT + EXCEPT DISTINCT (O4) as one tagged union: nation
    keys on both sides of the customer/supplier relationship, and
    users who never made a high-value purchase (non-empty at every
    sf, unlike key-coverage differences)."""
    cust = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").cast("long").alias("key"))
    supp = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").cast("long").alias("key"))
    inter = cust.intersect(supp).select(F.lit("intersect").alias("op"), "key")
    ev = _t(spark, sf_dir, "events")
    all_users = ev.select(F.col("user_id").cast("long").alias("key")).distinct()
    big_buyers = ev.where((F.col("event_type") == "purchase") & (F.col("value") > 90)).select(
        F.col("user_id").cast("long").alias("key")
    )
    exc = all_users.subtract(big_buyers).select(F.lit("except").alias("op"), "key")
    return inter.unionByName(exc)


# ---------------------------------------------------------------------------
# Batch-mode streaming windows (ST1-ST3 on bounded data).
# The oracle reproduces Spark's window math in integer microseconds:
# tumbling start = us div size * size; sliding starts = (us div slide - k) * slide.
# ---------------------------------------------------------------------------

@query(
    "window_tumbling",
    """
    SELECT strftime(make_timestamp((epoch_us(ts) // 21600000000) * 21600000000),
                    '%Y-%m-%d %H:%M:%S') AS win_start,
           event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def window_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 6h event-time window (ST1) — the same groupBy(window())
    used under a watermark in streaming mode, checked on bounded data."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "6 hours"), "event_type")
        .agg(
            F.count("*").alias("n"),
            (F.sum(cents(F.col("value"))).cast("double") / 100.0).alias("total_value"),
        )
        .select(
            F.date_format("window.start", "yyyy-MM-dd HH:mm:ss").alias("win_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


@query(
    "window_sliding",
    """
    SELECT strftime(make_timestamp(((epoch_us(ts) // 21600000000) - k) * 21600000000),
                    '%Y-%m-%d %H:%M:%S') AS win_start,
           COUNT(*) AS n
    FROM events CROSS JOIN (VALUES (0), (1)) offsets(k)
    GROUP BY 1
    """,
)
def window_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 12h window, 6h slide (ST2): each event lands in exactly
    two windows."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "12 hours", "6 hours"))
        .agg(F.count("*").alias("n"))
        .select(F.date_format("window.start", "yyyy-MM-dd HH:mm:ss").alias("win_start"), "n")
    )


@query(
    "window_session",
    """
    WITH gaps AS (
      SELECT user_id, ts,
             CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > 1800000000 OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ),
    sess AS (
      SELECT user_id, ts,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM gaps
    )
    SELECT user_id,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
           COUNT(*) AS n_events
    FROM sess GROUP BY user_id, session_id
    """,
)
def window_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session window, 30-minute gap (ST3): Spark's session_window in
    batch mode; the oracle is the classic gaps-and-islands rewrite."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.date_format("session_window.start", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias(
                "session_start"
            ),
            "n_events",
        )
    )


# ---------------------------------------------------------------------------
# Reshaping (pivot / unpivot) and reproducible sampling
# ---------------------------------------------------------------------------

@query(
    "agg_pivot",
    """
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN l_linestatus = 'F'
                         THEN CAST(ROUND(l_quantity * 100) AS BIGINT) END) AS DOUBLE) / 100.0 AS qty_f,
           CAST(SUM(CASE WHEN l_linestatus = 'O'
                         THEN CAST(ROUND(l_quantity * 100) AS BIGINT) END) AS DOUBLE) / 100.0 AS qty_o
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: long->wide via the native pivot operator with an explicit
    value list (unlisted values need a discovery pass — at scale always
    pass the list).  Catalyst plans it as the same single hash
    aggregate the oracle's conditional-sum formulation uses."""
    li = _t(spark, sf_dir, "lineitem")
    wide = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(F.sum(cents(F.col("l_quantity"))))
    )
    return wide.select(
        "l_returnflag",
        (F.col("F").cast("double") / 100.0).alias("qty_f"),
        (F.col("O").cast("double") / 100.0).alias("qty_o"),
    )


@query(
    "unpivot_metrics",
    """
    WITH s AS (
      SELECT l_returnflag,
             CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_qty,
             CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_price
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, 'sum_qty' AS metric, sum_qty AS value FROM s
    UNION ALL
    SELECT l_returnflag, 'sum_price' AS metric, sum_price AS value FROM s
    """,
)
def unpivot_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (melt): wide->long with the native unpivot operator —
    a zero-shuffle row expansion (each input row emits one row per
    value column in place)."""
    li = _t(spark, sf_dir, "lineitem")
    wide = li.groupBy("l_returnflag").agg(
        (F.sum(cents(F.col("l_quantity"))).cast("double") / 100.0).alias("sum_qty"),
        (F.sum(cents(F.col("l_extendedprice"))).cast("double") / 100.0).alias("sum_price"),
    )
    return wide.unpivot(
        ids=["l_returnflag"],
        values=["sum_qty", "sum_price"],
        variableColumnName="metric",
        valueColumnName="value",
    )


@query(
    "sample_hash",
    """
    SELECT COUNT(*) AS n_sampled,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS total_price
    FROM orders
    WHERE substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 1) IN ('0', '1')
    """,
)
def sample_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible ~1/8 sampling by content hash of the key — the
    scale-correct sampling: deterministic across engines, runs, and
    cluster layouts (df.sample's RNG is partition-dependent and can't
    be oracle-checked), and it pushes to the scan as a filter."""
    orders = _t(spark, sf_dir, "orders")
    sampled = orders.where(
        F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 1).isin("0", "1")
    )
    return sampled.agg(
        F.count("*").alias("n_sampled"),
        (F.sum(cents(F.col("o_totalprice"))).cast("double") / 100.0).alias("total_price"),
    )


@query(
    "sample_stratified",
    """
    WITH ranked AS (
      SELECT o_orderkey, o_orderstatus, o_totalprice,
             row_number() OVER (
               PARTITION BY o_orderstatus
               ORDER BY md5(CAST(o_orderkey AS VARCHAR)), o_orderkey
             ) AS rk
      FROM orders
    )
    SELECT o_orderstatus, COUNT(*) AS n_sampled,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100.0
             AS total_price
    FROM ranked WHERE rk <= 100
    GROUP BY o_orderstatus
    """,
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified sampling: an exact per-group quota (100 rows per
    o_orderstatus), chosen by content-hash order so the draw is
    deterministic across engines, runs, and cluster layouts — the
    property a training-data pipeline needs for per-source quotas
    (df.sample/sampleBy give only probabilistic strata and are
    partition-order-dependent).  One shuffle on the stratum key; the
    per-group top-100-by-hash is a rank that AQE executes with
    partial top-k pushed to the map side."""
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.md5(F.col("o_orderkey").cast("string")), F.col("o_orderkey")
    )
    sampled = orders.select(
        "o_orderkey", "o_orderstatus", "o_totalprice",
        F.row_number().over(w).alias("rk"),
    ).where(F.col("rk") <= 100)
    return sampled.groupBy("o_orderstatus").agg(
        F.count("*").alias("n_sampled"),
        (F.sum(cents(F.col("o_totalprice"))).cast("double") / 100.0).alias("total_price"),
    )


@query(
    "window_range_frame",
    """
    SELECT event_id, user_id,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT))
                OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
                      RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) AS DOUBLE) / 100.0
             AS hour_value
    FROM events
    """,
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-based (RANGE) window frame — W3's second half: each row
    aggregates the trailing hour BY TIMESTAMP VALUE, not row count.
    Ordering on integer microseconds makes the frame bounds exact in
    both engines (and ties — same-µs events — are correctly summed
    together, which a ROWS frame cannot express)."""
    ev = _t(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    w = (
        Window.partitionBy("user_id")
        .orderBy(us)
        .rangeBetween(-3_600_000_000, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        (F.sum(cents(F.col("value"))).over(w).cast("double") / 100.0).alias("hour_value"),
    )


@query(
    "agg_hll_sketch",
    """
    SELECT TRUE AS merged_within_5pct, TRUE AS parts_within_5pct
    """,
)
def agg_hll_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable HLL sketches (Apache DataSketches via Spark 4's
    hll_sketch_agg / hll_union_agg / hll_sketch_estimate): per-group
    sketches built in one pass, then MERGED to a global estimate —
    the re-aggregatable rollup pattern (store per-partition sketches,
    union on demand) that exact distinct counts can't do.  Like
    agg_approx_distinct, the checked contract is the accuracy bound,
    not the sketch bytes."""
    li = _t(spark, sf_dir, "lineitem")
    per_group = li.groupBy("l_returnflag").agg(
        F.hll_sketch_agg("l_orderkey", 14).alias("sk"),
        F.countDistinct("l_orderkey").alias("exact_orders"),
        F.hll_sketch_estimate(F.hll_sketch_agg("l_partkey", 14)).alias("approx_parts"),
        F.countDistinct("l_partkey").alias("exact_parts"),
    )
    merged = per_group.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("approx_all"),
        (
            F.sum(
                F.when(
                    F.abs(F.col("approx_parts") - F.col("exact_parts")) / F.col("exact_parts")
                    < 0.05,
                    0,
                ).otherwise(1)
            )
            == 0
        ).alias("parts_within_5pct"),
    )
    # exact global distinct for the merged bound: orderkeys overlap
    # groups, so per-group exacts can't just be summed
    exact_all = li.agg(F.countDistinct("l_orderkey").alias("e")).select("e")
    out = merged.crossJoin(F.broadcast(exact_all))
    return out.select(
        (F.abs(F.col("approx_all") - F.col("e")) / F.col("e") < 0.05).alias("merged_within_5pct"),
        "parts_within_5pct",
    )


@query(
    "agg_histogram",
    """
    SELECT LEAST(CAST(ROUND(o_totalprice * 100) AS BIGINT) // 3000000, 19) AS bucket,
           COUNT(*) AS n,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100.0
             AS total_price
    FROM orders
    GROUP BY bucket
    """,
)
def agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram / feature discretization: bucket =
    value // step computed in exact cents-integer arithmetic, so the
    boundary assignment is bit-identical across engines (a float
    (x-lo)/step can ulp-flip rows sitting exactly on a boundary —
    width_bucket's portability trap).  Map-only until one small hash
    agg on the bucket id; the scan reads a single column."""
    orders = _t(spark, sf_dir, "orders")
    # trunc-div on BOTH sides (Spark `div` == DuckDB `//`, hazard-class
    # (a) sweep r10): the previous floor(x/step) double path agreed
    # only because prices are positive — a negative out-of-fixture
    # value would floor to -1 here but truncate to 0 in the oracle
    bucket = F.least(
        F.expr("CAST(c div 3000000 AS BIGINT)"),
        F.lit(19).cast("long"),
    )
    return (
        orders.select(cents(F.col("o_totalprice")).alias("c"))
        .select(bucket.alias("bucket"), "c")
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n"),
            (F.sum("c").cast("double") / 100.0).alias("total_price"),
        )
    )


@query(
    "session_sequences",
    """
    WITH s AS (
      SELECT user_id, event_id, ts, event_type,
             CASE WHEN epoch_us(ts) - LAG(epoch_us(ts))
                    OVER (PARTITION BY user_id ORDER BY ts, event_id) > 1800000000
                  THEN 1
                  WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS is_start
      FROM events
    ), g AS (
      SELECT *, SUM(is_start) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS session_no
      FROM s
    )
    SELECT user_id, CAST(session_no AS BIGINT) AS session_no,
           COUNT(*) AS n_events,
           string_agg(event_type, '>' ORDER BY ts, event_id) AS sequence
    FROM g
    GROUP BY user_id, session_no
    HAVING COUNT(*) >= 2
    """,
)
def session_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization + sequence assembly: gap-based session ids (the
    lag/cumsum formulation — same semantics the session_window operator
    computes, here as plain windows so the oracle can mirror it), then
    each session's ordered event-type string — the behavioral-sequence
    construction a recommender/LLM-agent corpus is built from.  Two
    windows and one agg, all partitioned by user: one shuffle total."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    gap = us - F.lag(us).over(w)
    s = ev.select(
        "user_id", "event_id", "ts", "event_type",
        F.when(gap > 1_800_000_000, 1).when(gap.isNull(), 1).otherwise(0).alias("is_start"),
    )
    g = s.withColumn(
        "session_no",
        F.sum("is_start").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        g.groupBy("user_id", "session_no")
        .agg(
            F.count("*").alias("n_events"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("ts", "event_id", "event_type"))),
                    lambda x: x["event_type"],
                ),
                ">",
            ).alias("sequence"),
        )
        .where(F.col("n_events") >= 2)
    )


@query(
    "window_distribution",
    """
    SELECT c_custkey, c_mktsegment,
           ROUND(PERCENT_RANK() OVER w, 6) AS pr,
           ROUND(CUME_DIST() OVER w, 6) AS cd
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY ROUND(c_acctbal * 100), c_custkey)
    """,
)
def window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions (W1's second half): percent_rank
    and cume_dist per segment — ordered on exact cents so ranks are
    engine-independent; the divisions are single IEEE ops rounded to
    6 places."""
    cust = _t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.round(F.col("c_acctbal") * 100), F.col("c_custkey")
    )
    return cust.select(
        "c_custkey",
        "c_mktsegment",
        F.round(F.percent_rank().over(w), 6).alias("pr"),
        F.round(F.cume_dist().over(w), 6).alias("cd"),
    )


@query(
    "agg_mode",
    """
    WITH c AS (
      SELECT c_mktsegment, c_nationkey, COUNT(*) AS n
      FROM customer GROUP BY c_mktsegment, c_nationkey
    ), r AS (
      SELECT *, row_number() OVER (PARTITION BY c_mktsegment
                                   ORDER BY n DESC, c_nationkey) AS rk
      FROM c
    )
    SELECT c_mktsegment, c_nationkey AS mode_nation, n AS mode_count
    FROM r WHERE rk = 1
    """,
)
def agg_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group mode (most frequent value) as count + rank with an
    explicit tiebreak — F.mode()/DuckDB mode() break ties arbitrarily,
    which can never pass a cross-engine value check; this form is the
    deterministic one a pipeline should use anyway.  Two hash aggs
    that share the segment partitioning + a WindowGroupLimit rank."""
    cust = _t(spark, sf_dir, "customer")
    c = cust.groupBy("c_mktsegment", "c_nationkey").agg(F.count("*").alias("n"))
    w = Window.partitionBy("c_mktsegment").orderBy(F.col("n").desc(), F.col("c_nationkey"))
    return (
        c.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select(
            "c_mktsegment",
            F.col("c_nationkey").alias("mode_nation"),
            F.col("n").alias("mode_count"),
        )
    )


_DUCK_FUNNEL = """
    WITH v AS (
      SELECT user_id, MIN(ts) AS v_ts
      FROM events WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, MIN(e.ts) AS c_ts, MIN(v.v_ts) AS v_ts
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click'
        AND e.ts > v.v_ts AND e.ts <= v.v_ts + INTERVAL 24 HOUR
      GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, MIN(e.ts) AS p_ts
      FROM events e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase'
        AND e.ts > c.c_ts AND e.ts <= c.v_ts + INTERVAL 24 HOUR
      GROUP BY e.user_id
    )
    SELECT (SELECT COUNT(*) FROM v) AS step1_view,
           (SELECT COUNT(*) FROM c) AS step2_click,
           (SELECT COUNT(*) FROM p) AS step3_purchase
"""


@query("events_funnel", _DUCK_FUNNEL)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-step funnel over the event stream: users who viewed,
    then clicked after the first view, then purchased after that click
    — both follow-ups inside a 24h window anchored at the first view.
    The product-analytics staple that exercises ORDERED event matching
    (a plain type-count can't distinguish click-before-view).

    Plan shape: every stage aggregates or joins on user_id, so the
    three stages reuse one hash partitioning — per-step state is
    (user, ts) pairs, never raw events, and the final counts are
    1-row aggregates cross-joined together."""
    ev = _t(spark, sf_dir, "events")
    day = F.expr("INTERVAL 24 HOURS")
    v = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("v_ts"))
    )
    c = (
        ev.where(F.col("event_type") == "click")
        .join(v, "user_id")
        .where((F.col("ts") > F.col("v_ts")) & (F.col("ts") <= F.col("v_ts") + day))
        .groupBy("user_id")
        .agg(F.min("ts").alias("c_ts"), F.min("v_ts").alias("v_ts"))
    )
    p = (
        ev.where(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .where((F.col("ts") > F.col("c_ts")) & (F.col("ts") <= F.col("v_ts") + day))
        .groupBy("user_id")
        .agg(F.min("ts").alias("p_ts"))
    )
    return (
        v.agg(F.count("*").alias("step1_view"))
        .crossJoin(c.agg(F.count("*").alias("step2_click")))
        .crossJoin(p.agg(F.count("*").alias("step3_purchase")))
    )


_DUCK_CONCURRENCY = """
    WITH iv AS (
      SELECT ts AS s, ts + INTERVAL 10 MINUTE AS e FROM events
    ),
    days AS (
      SELECT s, e,
             unnest(generate_series(date_trunc('day', s),
                                    date_trunc('day', e),
                                    INTERVAL 1 DAY)) AS day
      FROM iv
    ),
    clipped AS (
      SELECT day, GREATEST(s, day) AS t_start,
             LEAST(e, day + INTERVAL 1 DAY) AS t_end
      FROM days
      WHERE GREATEST(s, day) < LEAST(e, day + INTERVAL 1 DAY)
    ),
    pts AS (
      SELECT day, t_start AS t, 1 AS delta FROM clipped
      UNION ALL
      SELECT day, t_end AS t, -1 AS delta FROM clipped
    ),
    run AS (
      SELECT day,
             SUM(delta) OVER (PARTITION BY day ORDER BY t, delta
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS running
      FROM pts
    )
    SELECT strftime(day, '%Y-%m-%d') AS day,
           CAST(MAX(running) AS BIGINT) AS peak_concurrent
    FROM run GROUP BY day ORDER BY day
"""


@query("interval_concurrency", _DUCK_CONCURRENCY)
def interval_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sweep-line interval analytics: daily peak number of
    concurrently-open 10-minute sessions — the capacity-planning /
    max-concurrency query (ads, connections, GPU leases).

    Each interval explodes to ±1 boundary points clipped to the days
    it spans, a per-day window running-sums the deltas, and the max
    prefix is the peak.  Determinism at timestamp ties: ordering by
    (t, delta) closes intervals before opening new ones (half-open
    semantics), and prefix maxima are invariant under permutation of
    equal (t, delta) rows.  The day partition bounds both the sort
    and the state — at 100 TB each day sweeps independently."""
    ev = _t(spark, sf_dir, "events")
    iv = ev.select(
        F.col("ts").alias("s"),
        (F.col("ts") + F.expr("INTERVAL 10 MINUTES")).alias("e"),
    )
    days = iv.select(
        "s",
        "e",
        F.explode(
            F.sequence(
                F.date_trunc("day", F.col("s")),
                F.date_trunc("day", F.col("e")),
                F.expr("INTERVAL 1 DAY"),
            )
        ).alias("day"),
    )
    one_day = F.expr("INTERVAL 1 DAY")
    clipped = days.select(
        "day",
        F.greatest("s", "day").alias("t_start"),
        F.least(F.col("e"), F.col("day") + one_day).alias("t_end"),
    ).where(F.col("t_start") < F.col("t_end"))
    pts = clipped.select(
        "day", F.col("t_start").alias("t"), F.lit(1).alias("delta")
    ).unionAll(
        clipped.select("day", F.col("t_end").alias("t"), F.lit(-1).alias("delta"))
    )
    w = (
        Window.partitionBy("day")
        .orderBy("t", "delta")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    run = pts.withColumn("running", F.sum("delta").over(w))
    return (
        run.groupBy("day")
        .agg(F.max("running").cast("long").alias("peak_concurrent"))
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"), "peak_concurrent"
        )
        .orderBy("day")
    )


@query(
    "events_ewma",
    """
    WITH e AS (
      SELECT event_id, user_id, ts,
             CAST(ROUND(value * 100) AS BIGINT) AS v
      FROM events WHERE event_type = 'purchase'),
    w AS (
      SELECT event_id, user_id,
             list(v) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN 7 PRECEDING AND CURRENT ROW) AS vs
      FROM e),
    s AS (
      SELECT event_id, user_id, len(vs) AS n,
             list_sum(list_transform(range(1, len(vs) + 1),
                                     i -> vs[i] * (1::BIGINT << (i - 1)))) AS num
      FROM w)
    SELECT event_id, user_id, n,
           ROUND(num / ((1::BIGINT << n) - 1) / 100.0, 6) AS ewma
    FROM s
    """,
)
def events_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W8 time-decayed rolling feature: per-user EWMA of purchase value
    over the last <=8 events, alpha = 1/2 — the standard recency-biased
    feature for behavioral ML.  All weights are powers of two over
    cents-integers, so numerator and denominator are EXACT integers in
    both engines (no float reduction-order drift in the window fold);
    the final divide is one IEEE op.

    Plan shape: one shuffle on user_id for the window; the frame is
    bounded (8 rows), so state per row is constant — at 100 TB this is
    a single exchange + linear scan, same as any framed running agg."""
    ev = _t(spark, sf_dir, "events").where(F.col("event_type") == "purchase")
    e = ev.select(
        "event_id", "user_id", "ts", F.round(F.col("value") * 100).cast("long").alias("v")
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-7, 0)
    vs = F.collect_list("v").over(w)
    # weights are powers of two over cents-integers: every product and
    # partial sum is exactly representable in a double (v < 2^20,
    # weight <= 2^7), so the double-typed fold here equals DuckDB's
    # bigint shift arithmetic bit-for-bit after the final division
    num = F.aggregate(
        F.zip_with(
            vs,
            F.sequence(F.lit(1), F.size(vs)),
            lambda v, i: v.cast("double") * F.pow(F.lit(2.0), (i - 1).cast("double")),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    den = F.pow(F.lit(2.0), F.size(vs).cast("double")) - 1.0
    out = e.select(
        "event_id",
        "user_id",
        F.size(vs).alias("n"),
        F.round(num / den / 100.0, 6).alias("ewma"),
    )
    return out


@query(
    "events_cohort_retention",
    """
    WITH f AS (
      SELECT user_id, CAST(MIN(ts) AS DATE) AS first_day FROM events GROUP BY user_id),
    c AS (SELECT user_id,
                 CAST(date_trunc('week', first_day) AS DATE) AS cohort_week
          FROM f),
    a AS (
      SELECT DISTINCT e.user_id, c.cohort_week,
             CAST(floor(date_diff('day', c.cohort_week, CAST(e.ts AS DATE)) / 7) AS BIGINT)
               AS week_offset
      FROM events e JOIN c USING (user_id)),
    size_ AS (SELECT cohort_week, COUNT(*) AS cohort_size FROM c GROUP BY 1)
    SELECT strftime(a.cohort_week, '%Y-%m-%d') AS cohort_week,
           a.week_offset,
           COUNT(*) AS n_active,
           s.cohort_size,
           ROUND(COUNT(*) * 1.0 / s.cohort_size, 6) AS retention
    FROM a JOIN size_ s ON a.cohort_week = s.cohort_week
    GROUP BY a.cohort_week, a.week_offset, s.cohort_size
    """,
)
def events_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention over the event stream: users cohorted by the
    week of their first activity, retention = distinct active users per
    (cohort, week-offset) over cohort size.  Two key shuffles (user_id
    for first-activity + the cohort-week agg); the cohort-size side is
    cohort-cardinality and broadcasts.  Week offsets are integer day
    arithmetic on DATEs — no float time math to drift cross-engine."""
    ev = _t(spark, sf_dir, "events")
    f = ev.groupBy("user_id").agg(F.min("ts").cast("date").alias("first_day"))
    c = f.select("user_id", F.date_trunc("week", "first_day").cast("date").alias("cohort_week"))
    a = (
        ev.join(c, "user_id")
        .select(
            "user_id",
            "cohort_week",
            F.floor(F.datediff(F.col("ts").cast("date"), F.col("cohort_week")) / 7)
            .cast("long")
            .alias("week_offset"),
        )
        .distinct()
    )
    size = c.groupBy("cohort_week").agg(F.count("*").alias("cohort_size"))
    return (
        a.join(F.broadcast(size), "cohort_week")
        .groupBy("cohort_week", "week_offset", "cohort_size")
        .agg(F.count("*").alias("n_active"))
        .select(
            F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
            "week_offset",
            "n_active",
            "cohort_size",
            F.round(F.col("n_active") / F.col("cohort_size"), 6).alias("retention"),
        )
    )


@query(
    "events_rfm_segments",
    """
    WITH p AS (
      SELECT user_id,
             date_diff('day', CAST(MAX(ts) AS DATE), DATE '2024-02-01') AS recency_days,
             COUNT(*) AS frequency,
             SUM(CAST(ROUND(value * 100) AS BIGINT)) AS monetary_cents
      FROM events WHERE event_type = 'purchase' GROUP BY user_id),
    s AS (
      SELECT user_id, recency_days, frequency, monetary_cents,
             NTILE(4) OVER (ORDER BY recency_days, user_id) AS r,
             NTILE(4) OVER (ORDER BY frequency DESC, user_id) AS f,
             NTILE(4) OVER (ORDER BY monetary_cents DESC, user_id) AS m
      FROM p)
    SELECT r, f, m, COUNT(*) AS n_users,
           CAST(SUM(monetary_cents) AS DOUBLE) / 100.0 AS total_value
    FROM s GROUP BY r, f, m
    """,
)
def events_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: per-user recency/frequency/monetary quartiles
    (deterministic NTILE with user_id tiebreaks), segment sizes and
    exact-cents value per (r, f, m) cell — the classic behavioral
    segmentation.  One user_id shuffle for the profile (persisted —
    three consumers), then three DISTRIBUTED NTILE passes
    (operators/ranking.py: each axis range-partitions on its own key,
    no single-partition window even at billions of users) re-joined
    on user_id, one small segment agg."""
    from bytesprocessor_spark.operators.caching import persist_intermediate
    from bytesprocessor_spark.operators.ranking import distributed_ntile

    ev = _t(spark, sf_dir, "events").where(F.col("event_type") == "purchase")
    anchor = F.lit("2024-02-01").cast("date")
    p = ev.groupBy("user_id").agg(
        F.datediff(anchor, F.max("ts").cast("date")).alias("recency_days"),
        F.count("*").alias("frequency"),
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("monetary_cents"),
    )
    p = persist_intermediate(p)
    r_q = distributed_ntile(
        p.select("user_id", "recency_days"),
        [F.col("recency_days").asc(), F.col("user_id").asc()],
        4,
        tile_col="r",
    ).select("user_id", "r")
    f_q = distributed_ntile(
        p.select("user_id", "frequency"),
        [F.col("frequency").desc(), F.col("user_id").asc()],
        4,
        tile_col="f",
    ).select("user_id", "f")
    m_q = distributed_ntile(
        p.select("user_id", "monetary_cents"),
        [F.col("monetary_cents").desc(), F.col("user_id").asc()],
        4,
        tile_col="m",
    ).select("user_id", "m")
    s = (
        p.select("user_id", "monetary_cents")
        .join(r_q, "user_id")
        .join(f_q, "user_id")
        .join(m_q, "user_id")
    )
    return s.groupBy("r", "f", "m").agg(
        F.count("*").alias("n_users"),
        (F.sum("monetary_cents").cast("double") / 100.0).alias("total_value"),
    )


# ---------------------------------------------------------------------------
# W12: rolling robust outlier flag (windowed median + MAD)
# ---------------------------------------------------------------------------

@query(
    "events_rolling_robust",
    """
    WITH e AS (
      SELECT event_id, user_id, ts,
             CAST(ROUND(value * 100) AS BIGINT) AS v
      FROM events WHERE event_type = 'purchase'),
    w AS (
      SELECT event_id, user_id, v,
             list(v) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN 8 PRECEDING AND CURRENT ROW) AS vs
      FROM e),
    m AS (
      SELECT event_id, user_id, v, len(vs) AS n,
             list_sort(vs)[(len(vs) + 1) // 2] AS med, vs
      FROM w),
    d AS (
      SELECT event_id, user_id, v, n, med,
             list_sort(list_transform(vs, x -> abs(x - med)))[(n + 1) // 2] AS mad
      FROM m)
    SELECT event_id, user_id, CAST(n AS BIGINT) AS n,
           med AS med_cents, mad AS mad_cents,
           abs(v - med) > 3 * mad AS is_outlier
    FROM d
    """,
)
def events_rolling_robust(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W12 rolling robust anomaly flag: per-user windowed median and
    MAD (median absolute deviation) over the trailing <=9 purchase
    values, flagging |v - med| > 3*MAD — the outlier rule that, unlike
    the rolling mean/stddev z-score, is not itself corrupted by the
    outliers it hunts (50% breakdown point vs 0%).  The robust sibling
    of W8's EWMA on the same frame.

    Determinism: cents integers end-to-end — the lower median of a
    sorted integer frame and integer MAD need no floats at all, so
    there is nothing to drift cross-engine.

    Plan shape: one shuffle on user_id; the frame is bounded (9 rows),
    so the per-row sort is O(9 log 9) constant work — at 100 TB this
    is a single exchange + linear scan, the same contract as the
    framed running aggregates."""
    ev = _t(spark, sf_dir, "events").where(F.col("event_type") == "purchase")
    e = ev.select(
        "event_id", "user_id", "ts",
        F.round(F.col("value") * 100).cast("long").alias("v"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-8, 0)
    vs = F.array_sort(F.collect_list("v").over(w))
    return (
        e.select(
            "event_id", "user_id", "v",
            F.size(vs).cast("long").alias("n"),
            F.element_at(vs, ((F.size(vs) + 1) / 2).cast("int")).alias("med_cents"),
            vs.alias("vss"),
        )
        .select(
            "event_id", "user_id",
            "n", "med_cents",
            F.element_at(
                F.array_sort(
                    F.transform(
                        F.col("vss"), lambda x: F.abs(x - F.col("med_cents"))
                    )
                ),
                ((F.col("n") + 1) / 2).cast("int"),
            ).alias("mad_cents"),
            (F.abs(F.col("v") - F.col("med_cents")) > 3 * F.col("mad_cents")).alias(
                "is_outlier"
            ),
        )
    )


# ---------------------------------------------------------------------------
# W13: active-user growth curve (DAU / rolling WAU / new / cumulative)
# ---------------------------------------------------------------------------

@query(
    "events_dau_growth",
    """
    WITH ud AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    ),
    dau AS (SELECT day, CAST(COUNT(*) AS BIGINT) AS dau FROM ud GROUP BY day),
    fs AS (SELECT user_id, MIN(day) AS first_day FROM ud GROUP BY user_id),
    nu AS (SELECT first_day AS day, CAST(COUNT(*) AS BIGINT) AS new_users
           FROM fs GROUP BY first_day),
    ex AS (
      SELECT user_id,
             unnest(generate_series(day, day + INTERVAL 6 DAY,
                                    INTERVAL 1 DAY))::DATE AS tday
      FROM ud
    ),
    wau AS (
      SELECT tday AS day, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS wau_7d
      FROM ex GROUP BY tday
    )
    SELECT strftime(dau.day, '%Y-%m-%d') AS day,
           dau.dau,
           wau.wau_7d,
           COALESCE(nu.new_users, 0) AS new_users,
           CAST(SUM(COALESCE(nu.new_users, 0))
                OVER (ORDER BY dau.day ROWS UNBOUNDED PRECEDING) AS BIGINT)
             AS cum_users
    FROM dau
    JOIN wau ON dau.day = wau.day
    LEFT JOIN nu ON dau.day = nu.day
    ORDER BY dau.day
    """,
)
def events_dau_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W13 active-user growth curve: per day, DAU (distinct active
    users), rolling 7-day WAU, newly-seen users, and the cumulative
    unique-user count — the product-analytics quartet behind every
    growth dashboard, here in the exact distributed form: ROLLING
    DISTINCT does not decompose as a windowed aggregate, so WAU
    expands each (user, day) activity fact onto the 7 days it keeps
    the user 'weekly active' (a bounded x7 linear map, the standard
    scale-out trick) and counts distinct per target day; the
    cumulative curve avoids expanding anything by summing first-seen
    counts.

    Determinism: counts of exact (user, day) facts; the only window
    is the cumulative sum over the calendar-bounded day table.

    Plan shape: one (user, day) distinct (the corpus-scale shuffle),
    then day- and user-keyed aggregates; the x7 expansion is map-side
    before its day-keyed distinct agg.  Nothing beyond the first
    distinct scales with raw event count."""
    ev = _t(spark, sf_dir, "events")
    ud = ev.select("user_id", F.col("ts").cast("date").alias("day")).distinct()
    dau = ud.groupBy("day").agg(F.count("*").cast("long").alias("dau"))
    fs = ud.groupBy("user_id").agg(F.min("day").alias("first_day"))
    nu = fs.groupBy(F.col("first_day").alias("day")).agg(
        F.count("*").cast("long").alias("new_users")
    )
    ex = ud.select(
        "user_id",
        F.explode(
            F.sequence(
                F.col("day"),
                F.date_add(F.col("day"), 6),
                F.expr("interval 1 day"),
            )
        ).alias("tday"),
    )
    wau = ex.groupBy(F.col("tday").alias("day")).agg(
        F.countDistinct("user_id").cast("long").alias("wau_7d")
    )
    from bytesprocessor_spark.operators.ranking import bounded_single_group

    wc = (
        Window.partitionBy("__opid")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        bounded_single_group(  # calendar-bounded day table
            dau.join(wau, "day")
            .join(nu, "day", "left")
            .select(
                "day",
                "dau",
                "wau_7d",
                F.coalesce(F.col("new_users"), F.lit(0)).alias("new_users"),
            )
        )
        .withColumn(
            "cum_users", F.sum("new_users").over(wc).cast("long")
        )
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "dau",
            "wau_7d",
            "new_users",
            "cum_users",
        )
        .orderBy("day")
    )


# ---------------------------------------------------------------------------
# W14: audience-overlap matrix (pairwise Jaccard of user sets)
# ---------------------------------------------------------------------------

@query(
    "events_audience_overlap",
    """
    WITH ut AS (SELECT DISTINCT event_type, user_id FROM events),
    sz AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n FROM ut
           GROUP BY event_type),
    i AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             CAST(COUNT(*) AS BIGINT) AS n_both
      FROM ut a JOIN ut b
        ON a.user_id = b.user_id AND a.event_type < b.event_type
      GROUP BY 1, 2
    )
    SELECT i.type_a, i.type_b, sa.n AS n_a, sb.n AS n_b, i.n_both,
           CAST(i.n_both * 1000000 // (sa.n + sb.n - i.n_both) AS BIGINT)
             AS jaccard_ppm
    FROM i JOIN sz sa ON i.type_a = sa.event_type
           JOIN sz sb ON i.type_b = sb.event_type
    ORDER BY i.type_a, i.type_b
    """,
)
def events_audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W14 audience-overlap matrix: exact Jaccard similarity between
    every pair of event types' USER SETS — which behaviors share an
    audience (the segmentation readout behind cross-sell targeting and
    funnel design; in a training-data pipeline the same operator
    measures user-population overlap between data sources).  The
    exact-count sibling of A36's sketch estimate: at K event types
    this is K(K-1)/2 cells and exact counting is cheap; A36 is the
    path when the 'types' are thousands of sources.

    Determinism: distinct-count integers and one ppm floor division.

    Plan shape: one (type, user) distinct (the corpus-scale shuffle),
    a self-join keyed on user_id (each user contributes its <=K type
    pairs — bounded fan-out, not a cartesian), a K^2-bounded pair agg,
    and K-row size lookups."""
    ev = _t(spark, sf_dir, "events")
    ut = ev.select("event_type", "user_id").distinct()
    sz = ut.groupBy("event_type").agg(F.count("*").cast("long").alias("n"))
    a = ut.select(F.col("event_type").alias("type_a"), "user_id")
    b = ut.select(F.col("event_type").alias("type_b"), F.col("user_id").alias("uid_b"))
    i = (
        a.join(b, (F.col("user_id") == F.col("uid_b")) & (F.col("type_a") < F.col("type_b")))
        .groupBy("type_a", "type_b")
        .agg(F.count("*").cast("long").alias("n_both"))
    )
    sa = sz.select(F.col("event_type").alias("type_a"), F.col("n").alias("n_a"))
    sb = sz.select(F.col("event_type").alias("type_b"), F.col("n").alias("n_b"))
    return (
        i.join(F.broadcast(sa), "type_a")
        .join(F.broadcast(sb), "type_b")
        .select(
            "type_a",
            "type_b",
            "n_a",
            "n_b",
            "n_both",
            F.expr("CAST(n_both * 1000000 div (n_a + n_b - n_both) AS BIGINT)").alias(
                "jaccard_ppm"
            ),
        )
        .orderBy("type_a", "type_b")
    )


# ---------------------------------------------------------------------------
# W15: growth accounting (new / retained / resurrected / churned)
# ---------------------------------------------------------------------------

@query(
    "events_growth_accounting",
    """
    WITH uw AS (
      SELECT DISTINCT user_id, epoch_ms(ts) // 1000 // 604800 AS wk FROM events
    ),
    s AS (
      SELECT user_id, wk,
             LAG(wk) OVER (PARTITION BY user_id ORDER BY wk) AS prev
      FROM uw
    ),
    a AS (
      SELECT wk,
             CAST(COUNT(*) AS BIGINT) AS active,
             CAST(SUM(CASE WHEN prev IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS new_users,
             CAST(SUM(CASE WHEN prev = wk - 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS retained,
             CAST(SUM(CASE WHEN prev IS NOT NULL AND prev < wk - 1
                           THEN 1 ELSE 0 END) AS BIGINT) AS resurrected
      FROM s GROUP BY wk
    )
    SELECT a.wk, a.active, a.new_users, a.retained, a.resurrected,
           CAST(COALESCE(p.active, 0) - a.retained AS BIGINT) AS churned
    FROM a LEFT JOIN a p ON p.wk = a.wk - 1
    ORDER BY a.wk
    """,
)
def events_growth_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W15 growth accounting: per week, the active-user count split
    into new (first week ever), retained (active the week before),
    resurrected (active before, but not last week), plus churned
    (active last week, absent this week) — the standard DAU/MAU
    decomposition identity active = new + retained + resurrected and
    delta-active = new + resurrected - churned that growth teams read
    weekly.  W13's DAU curve says HOW MANY; this says WHY it moved.

    Weeks are integer epoch-week indices (epoch seconds // 604800) —
    exact on both engines; a week with zero events yields no row, and
    churn is attributed to the week AFTER the last active one when
    that week has a row (the LEFT JOIN on wk-1).

    Plan shape: one (user, week) distinct absorbs the event scan (the
    only corpus-scale shuffle); the lag runs user-partitioned over
    each user's few week rows; the week aggregate and its wk-1 self
    join move week-count-sized tables."""
    ev = _t(spark, sf_dir, "events")
    uw = ev.select(
        "user_id", F.expr("unix_timestamp(ts) div 604800").alias("wk")
    ).distinct()
    wu = Window.partitionBy("user_id").orderBy("wk")
    s = uw.withColumn("prev", F.lag("wk").over(wu))
    a = s.groupBy("wk").agg(
        F.count("*").cast("long").alias("active"),
        F.sum(F.when(F.col("prev").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("new_users"),
        F.sum(F.when(F.col("prev") == F.col("wk") - 1, 1).otherwise(0))
        .cast("long")
        .alias("retained"),
        F.sum(
            F.when(
                F.col("prev").isNotNull() & (F.col("prev") < F.col("wk") - 1), 1
            ).otherwise(0)
        )
        .cast("long")
        .alias("resurrected"),
    )
    p = a.select(F.col("wk").alias("pwk"), F.col("active").alias("pactive"))
    return (
        a.join(F.broadcast(p), a["wk"] == p["pwk"] + 1, "left")
        .select(
            "wk",
            "active",
            "new_users",
            "retained",
            "resurrected",
            (F.coalesce(F.col("pactive"), F.lit(0)) - F.col("retained"))
            .cast("long")
            .alias("churned"),
        )
        .orderBy("wk")
    )
