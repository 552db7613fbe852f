"""The oracle-checked query corpus — one entry per SURVEY §2 operator.

Each query exists twice: as a Spark DataFrame program (QUERIES) and as
ANSI SQL for the DuckDB oracle (ORACLE).  The driver runs both at
sf0.01 and compares row count + schema + an order-insensitive value
hash, so every query here is engineered to be *bit-deterministic
across engines*:

  * Money/metric aggregation uses exact integer arithmetic
    (``ROUND(x*100) AS BIGINT`` cents) so SUM/AVG/STDDEV never depend
    on floating-point reduction order — Spark's partial aggregation
    and DuckDB's single-node fold would otherwise differ in final
    ulps.  Final division back to a double is a single IEEE op,
    identical on both engines.
  * Top-k / limit queries carry a unique tiebreak key in the ordering.
  * Window frames order on unique keys, so running aggregates fold in
    a prescribed sequence.
  * Timestamps are emitted as formatted strings, never raw timestamps.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bytesprocessor_spark.sources.tables import load_table

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE: dict[str, str] = {}

# Entries whose callable EXECUTES Spark jobs at construction time
# (streaming drains that must run a query to produce their sink rows):
# plan sweeps / EXPLAIN-only tooling should skip these or expect full
# jobs to run.  (agg_heavy_hitters left this list in round 6: its
# Count-Min sketch is now declarative DataFrame ops, fully lazy.)
EAGER_QUERIES = frozenset({
    "stream_dedup",
    "stream_static_enrich",
    "stream_interval_join",
    "stream_cdc_apply",
    "stream_quality_gate",
    "stream_trending_topk",
    "stream_running_totals",
    "stream_neardup_admission",
    "stream_drift_monitor",
    "stream_sprt",
    "stream_srm_monitor",
    "stream_slo_burn",
    "stream_lateness_audit",
    "stream_interval_join_outer",
    "stream_session_windows",
    # S15 oracle row: writes + reads a temp txnlog table at construction
    "txnlog_snapshot_read",
    # S1/S1b oracle row: collects the bounded event slice and writes
    # the mixed pcap+pcapng capture directory at construction
    "packets_mixed_capture",
    # S16 oracle row: writes the two-schema parquet fixture at
    # construction
    "schema_evolution_read",
    # S17 oracle row: writes the hive-partitioned fixture at
    # construction
    "partitioned_table_prune",
    # bounded candidate-pool collect at construction (driver-side
    # greedy rerank over KBs)
    "similarity_mmr_rerank",
    # S6 oracle row: writes the dirty-CSV fixture at construction
    "csv_quarantine_scan",
    # S6b oracle row: writes the dirty-JSONL fixture at construction
    "jsonl_quarantine_scan",
    # S15+ oracle row: writes, compacts, and reads a temp txnlog
    # table at construction
    "txnlog_compact_read",
    # S18 oracle row: writes three commits and reads the change feed
    # at construction
    "txnlog_changes_read",
    # ST22 streaming drain
    "stream_page_hinkley",
    # L3j: d²-bounded Gram localize + exact-int eigensolve at
    # construction (r11 k-row-localize rewrite)
    "embedding_pca_power",
    # S19 oracle row: writes + reads the temp ORC copy at construction
    "orc_roundtrip_read",
    # GR16 k-truss: 2 peeling rounds count/checkpoint at construction
    "graph_ktruss",
    # A15b/A15c: K²-row transition-matrix localize + exact-int power
    # iteration at construction (r11 k-row-localize rewrite)
    "events_markov_stationary",
    "events_entropy_rate",
    # EV27: K²-row duel-matrix localize + mirrored MM fit at
    # construction (r11 k-row-localize rewrite)
    "eval_bradley_terry",
    # L4l/L4l2: vocabulary-bounded word-table localize + driver-side
    # merge loop at construction (r11 single-trainer rewrite)
    "text_bpe_learn",
    "text_bpe_encode",
})


def query(name: str, sql: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if sql is not None:
            ORACLE[name] = sql
        return fn

    return deco


def cents(col) -> F.Column:
    """Exact integer money: dollars-double -> cents-bigint.

    The inputs are 2-decimal values stored as doubles; ``x*100`` lands
    within 1e-9 of an integer, so round-to-nearest is unambiguous and
    identical across engines.  All downstream aggregation is exact
    64-bit integer math.
    """
    return F.round(col * 100).cast("long")


def bp(col) -> F.Column:
    """Basis points: 2-decimal ratio-double (e.g. discount) -> bigint."""
    return F.round(col * 10000).cast("long")


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Relational core: scan -> filter -> aggregate -> sort  (S5, P5, A1, O1)
# ---------------------------------------------------------------------------

@query(
    "q1_pricing_summary",
    """
    SELECT
      l_returnflag,
      l_linestatus,
      CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_qty,
      CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_base_price,
      CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT) * (10000 - CAST(ROUND(l_discount * 10000) AS BIGINT))) AS DOUBLE) / 1000000.0 AS sum_disc_price,
      CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS DOUBLE) / 100.0 / COUNT(*) AS avg_qty,
      CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 100.0 / COUNT(*) AS avg_price,
      CAST(SUM(CAST(ROUND(l_discount * 10000) AS BIGINT)) AS DOUBLE) / 10000.0 / COUNT(*) AS avg_disc,
      COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 skeleton: the flagship scan->filter->agg pipeline.
    Filter + integer conversions happen before the (partial+final) hash
    aggregate; the parquet scan reads only the 6 referenced columns."""
    li = _t(spark, sf_dir, "lineitem")
    qty_c, price_c, disc_b = cents(F.col("l_quantity")), cents(F.col("l_extendedprice")), bp(F.col("l_discount"))
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            (F.sum(qty_c).cast("double") / 100.0).alias("sum_qty"),
            (F.sum(price_c).cast("double") / 100.0).alias("sum_base_price"),
            (F.sum(price_c * (F.lit(10000) - disc_b)).cast("double") / 1000000.0).alias("sum_disc_price"),
            (F.sum(qty_c).cast("double") / 100.0 / F.count("*")).alias("avg_qty"),
            (F.sum(price_c).cast("double") / 100.0 / F.count("*")).alias("avg_price"),
            (F.sum(disc_b).cast("double") / 10000.0 / F.count("*")).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@query(
    "q3_shipping_priority",
    """
    SELECT
      l_orderkey,
      CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT) * (10000 - CAST(ROUND(l_discount * 10000) AS BIGINT))) AS DOUBLE) / 1000000.0 AS revenue,
      strftime(o_orderdate, '%Y-%m-%d') AS orderdate
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
      AND l_shipdate  > TIMESTAMP '1995-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 skeleton: 3-way join + agg + deterministic top-k.
    customer is small -> broadcast; lineitem⋈orders shuffles once on
    the orderkey.  Top-k plans as TakeOrderedAndProject."""
    cust = _t(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1995-03-15 00:00:00").cast("timestamp")
    )
    li = _t(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1995-03-15 00:00:00").cast("timestamp")
    )
    price_c, disc_b = cents(F.col("l_extendedprice")), bp(F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg((F.sum(price_c * (F.lit(10000) - disc_b)).cast("double") / 1000000.0).alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


@query(
    "q5_local_supplier",
    """
    SELECT
      n_name,
      CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT) * (10000 - CAST(ROUND(l_discount * 10000) AS BIGINT))) AS DOUBLE) / 1000000.0 AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
    GROUP BY n_name
    """,
)
def q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 skeleton: 6-way star join.  region/nation/supplier/
    customer are dimensions -> broadcast; the single big shuffle is
    lineitem⋈orders."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    price_c, disc_b = cents(F.col("l_extendedprice")), bp(F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey) & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg((F.sum(price_c * (F.lit(10000) - disc_b)).cast("double") / 1000000.0).alias("revenue"))
    )


# ---------------------------------------------------------------------------
# Join surface (J2-J5)
# ---------------------------------------------------------------------------

@query(
    "join_inner",
    """
    SELECT o_orderstatus, COUNT(*) AS n_lines,
           CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS total_price
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderstatus
    """,
)
def join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    li, orders = _t(spark, sf_dir, "lineitem"), _t(spark, sf_dir, "orders")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey, "inner")
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n_lines"),
            (F.sum(cents(F.col("l_extendedprice"))).cast("double") / 100.0).alias("total_price"),
        )
    )


@query(
    "join_outer",
    """
    SELECT 'left' AS side, c_mktsegment AS grp,
           COUNT(*) AS n_rows,
           CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_no_order,
           CAST(0 AS BIGINT) AS n_no_customer
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_mktsegment
    UNION ALL
    SELECT 'full' AS side, 'ALL' AS grp,
           COUNT(*) AS n_rows,
           CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_no_order,
           CAST(SUM(CASE WHEN c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_no_customer
    FROM customer FULL OUTER JOIN orders ON c_custkey = o_custkey
    """,
)
def join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Outer-join surface (J3), both variants in one checked result:
    LEFT join null-padding counted per segment, FULL join dangling rows
    counted on both sides (tagged union keeps one entry per family —
    the correctness gate checks a bounded number of entries, so each
    row group must earn its slot)."""
    cust, orders = _t(spark, sf_dir, "customer"), _t(spark, sf_dir, "orders")
    left = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum(F.when(F.col("o_orderkey").isNull(), 1).otherwise(0)).alias("n_no_order"),
        )
        .select(
            F.lit("left").alias("side"),
            F.col("c_mktsegment").alias("grp"),
            "n_rows",
            "n_no_order",
            F.lit(0).cast("long").alias("n_no_customer"),
        )
    )
    full = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "full")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum(F.when(F.col("o_orderkey").isNull(), 1).otherwise(0)).alias("n_no_order"),
            F.sum(F.when(F.col("c_custkey").isNull(), 1).otherwise(0)).alias("n_no_customer"),
        )
        .select(F.lit("full").alias("side"), F.lit("ALL").alias("grp"), "n_rows", "n_no_order", "n_no_customer")
    )
    return left.unionByName(full)


@query(
    "join_semi_anti",
    """
    SELECT 'semi' AS op, c_mktsegment AS grp, COUNT(*) AS n
    FROM customer
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY c_mktsegment
    UNION ALL
    SELECT 'anti' AS op, p_brand AS grp, COUNT(*) AS n
    FROM part
    WHERE NOT EXISTS (SELECT 1 FROM lineitem
                      WHERE l_partkey = p_partkey AND l_quantity >= 49)
    GROUP BY p_brand
    """,
)
def join_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi + anti join (J4) as one tagged union: customers that have
    orders (semi), and parts never ordered in bulk (anti — the
    quantity filter keeps the result non-empty at every sf)."""
    cust, orders = _t(spark, sf_dir, "customer"), _t(spark, sf_dir, "orders")
    part, li = _t(spark, sf_dir, "part"), _t(spark, sf_dir, "lineitem")
    semi = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi")
        .groupBy(F.col("c_mktsegment").alias("grp"))
        .agg(F.count("*").alias("n"))
        .select(F.lit("semi").alias("op"), "grp", "n")
    )
    bulk = li.where(F.col("l_quantity") >= 49)
    anti = (
        part.join(bulk, part.p_partkey == bulk.l_partkey, "left_anti")
        .groupBy(F.col("p_brand").alias("grp"))
        .agg(F.count("*").alias("n"))
        .select(F.lit("anti").alias("op"), "grp", "n")
    )
    return semi.unionByName(anti)


@query(
    "join_cross",
    """
    SELECT r_name, n_name
    FROM region CROSS JOIN nation
    """,
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    region, nation = _t(spark, sf_dir, "region"), _t(spark, sf_dir, "nation")
    return region.crossJoin(nation).select("r_name", "n_name")


# ---------------------------------------------------------------------------
# Aggregation surface (A2-A7)
# ---------------------------------------------------------------------------

@query(
    "agg_distinct",
    """
    SELECT l_returnflag,
           COUNT(DISTINCT l_orderkey) AS n_orders,
           COUNT(DISTINCT l_partkey)  AS n_parts,
           COUNT(DISTINCT l_suppkey)  AS n_supps
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
    )


@query(
    "agg_approx_distinct",
    """
    SELECT TRUE AS orders_within_5pct, TRUE AS parts_within_5pct
    """,
)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ sketches can't hash-match an exact oracle, so the checked
    contract is the approximation guarantee itself: |approx-exact| <
    5% relative error with rsd pinned at 1% (the default 5% rsd can
    legitimately exceed a 5% observed error at small cardinalities)."""
    li = _t(spark, sf_dir, "lineitem")
    row = li.agg(
        F.approx_count_distinct("l_orderkey", rsd=0.01).alias("a_orders"),
        F.countDistinct("l_orderkey").alias("e_orders"),
        F.approx_count_distinct("l_partkey", rsd=0.01).alias("a_parts"),
        F.countDistinct("l_partkey").alias("e_parts"),
    )
    return row.select(
        (F.abs(F.col("a_orders") - F.col("e_orders")) / F.col("e_orders") < 0.05).alias(
            "orders_within_5pct"
        ),
        (F.abs(F.col("a_parts") - F.col("e_parts")) / F.col("e_parts") < 0.05).alias(
            "parts_within_5pct"
        ),
    )


@query(
    "agg_global",
    """
    SELECT COUNT(*) AS n_rows,
           CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS total_qty,
           CAST(MIN(ROUND(l_extendedprice * 100)) AS DOUBLE) / 100.0 AS min_price,
           CAST(MAX(ROUND(l_extendedprice * 100)) AS DOUBLE) / 100.0 AS max_price
    FROM lineitem
    """,
)
def agg_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.agg(
        F.count("*").alias("n_rows"),
        (F.sum(cents(F.col("l_quantity"))).cast("double") / 100.0).alias("total_qty"),
        (F.min(F.round(F.col("l_extendedprice") * 100)).cast("double") / 100.0).alias("min_price"),
        (F.max(F.round(F.col("l_extendedprice") * 100)).cast("double") / 100.0).alias("max_price"),
    )


@query(
    "agg_rollup",
    """
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
           CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n"),
        (F.sum(cents(F.col("l_quantity"))).cast("double") / 100.0).alias("sum_qty"),
    )


@query(
    "agg_cube",
    """
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(F.count("*").alias("n"))


@query(
    "agg_stats",
    """
    WITH s AS (
      SELECT l_returnflag,
             COUNT(*) AS n,
             SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS s1,
             SUM(CAST(ROUND(l_quantity * 100) AS BIGINT) * CAST(ROUND(l_quantity * 100) AS BIGINT)) AS s2,
             SUM(CAST(ROUND(l_discount * 10000) AS BIGINT)) AS sy,
             SUM(CAST(ROUND(l_discount * 10000) AS BIGINT) * CAST(ROUND(l_discount * 10000) AS BIGINT)) AS sy2,
             SUM(CAST(ROUND(l_quantity * 100) AS BIGINT) * CAST(ROUND(l_discount * 10000) AS BIGINT)) AS sxy
      FROM lineitem GROUP BY l_returnflag
    )
    , p AS (
      SELECT l_returnflag,
             quantile_cont(l_quantity, 0.5) AS median_qty,
             CAST(quantile_disc(l_quantity, 0.9) AS DOUBLE) AS p90_qty_disc
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT s.l_returnflag, n,
           (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n) / (n - 1) / 10000.0 AS var_qty,
           SQRT((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n) / (n - 1)) / 100.0 AS stddev_qty,
           (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(sy AS DOUBLE))
             / (SQRT(CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
                * SQRT(CAST(n AS DOUBLE) * CAST(sy2 AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
             AS corr_qty_disc,
           median_qty, p90_qty_disc
    FROM s JOIN p ON s.l_returnflag = p.l_returnflag
    """,
)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 in one entry: variance/stddev/correlation from exact integer
    sums (the
    shuffle-sensitive part stays in exact arithmetic, floats appear
    only in the final scalar expression — reduction-order independent)
    plus exact percentiles (continuous + discrete; quantities are
    small integers stored as doubles, so linear interpolation is exact
    in both engines)."""
    li = _t(spark, sf_dir, "lineitem")
    q = cents(F.col("l_quantity"))
    d = bp(F.col("l_discount"))
    s = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum(q).alias("s1"),
        F.sum(q * q).alias("s2"),
        F.sum(d).alias("sy"),
        F.sum(d * d).alias("sy2"),
        F.sum(q * d).alias("sxy"),
        F.percentile("l_quantity", 0.5).alias("median_qty"),
        F.expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY l_quantity)").alias("p90_qty_disc"),
    )
    nD = F.col("n").cast("double")
    s1D, s2D = F.col("s1").cast("double"), F.col("s2").cast("double")
    syD, sy2D, sxyD = F.col("sy").cast("double"), F.col("sy2").cast("double"), F.col("sxy").cast("double")
    var = (s2D - s1D * s1D / F.col("n")) / (F.col("n") - 1)
    corr = (nD * sxyD - s1D * syD) / (
        F.sqrt(nD * s2D - s1D * s1D) * F.sqrt(nD * sy2D - syD * syD)
    )
    return s.select(
        "l_returnflag",
        "n",
        (var / 10000.0).alias("var_qty"),
        (F.sqrt(var) / 100.0).alias("stddev_qty"),
        corr.alias("corr_qty_disc"),
        "median_qty",
        "p90_qty_disc",
    )


def _load_extended_modules() -> None:
    """Pull in the other query families (registered via @query on
    import).  Called at the bottom of this module so the registry is
    complete whenever ``queries`` is imported."""
    import bytesprocessor_spark.queries_windows  # noqa: F401
    import bytesprocessor_spark.queries_functions  # noqa: F401
    import bytesprocessor_spark.queries_ref  # noqa: F401
    import bytesprocessor_spark.queries_llm  # noqa: F401
    import bytesprocessor_spark.queries_udf  # noqa: F401
    import bytesprocessor_spark.queries_sql  # noqa: F401
    import bytesprocessor_spark.queries_streaming  # noqa: F401
    import bytesprocessor_spark.queries_curation  # noqa: F401
    import bytesprocessor_spark.queries_warehouse  # noqa: F401
    import bytesprocessor_spark.queries_training  # noqa: F401
    import bytesprocessor_spark.queries_eval  # noqa: F401
    import bytesprocessor_spark.queries_retrieval  # noqa: F401
    import bytesprocessor_spark.queries_scale  # noqa: F401
    import bytesprocessor_spark.queries_mlstats  # noqa: F401
    import bytesprocessor_spark.queries_r7  # noqa: F401
    import bytesprocessor_spark.queries_r8  # noqa: F401
    import bytesprocessor_spark.queries_r8b  # noqa: F401
    import bytesprocessor_spark.queries_r9  # noqa: F401
    import bytesprocessor_spark.queries_r9b  # noqa: F401
    import bytesprocessor_spark.queries_r10  # noqa: F401
    import bytesprocessor_spark.queries_r11  # noqa: F401


@query(
    "agg_collect",
    """
    SELECT n_regionkey,
           string_agg(DISTINCT n_name, ',' ORDER BY n_name) AS nations
    FROM nation GROUP BY n_regionkey
    """,
)
def agg_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_set canonicalized to a sorted joined string so the value
    is set-semantics-stable across engines."""
    nation = _t(spark, sf_dir, "nation")
    return nation.groupBy("n_regionkey").agg(
        F.array_join(F.array_sort(F.collect_set("n_name")), ",").alias("nations")
    )


_load_extended_modules()

# Entries whose semantics are not SQL-expressible (engine-specific
# hashing, approximate ANN) register here without an oracle — the
# driver records the weaker rows-only check for them (see
# __spark_entry__ docstring).
from bytesprocessor_spark.queries_llm import QUERIES_NO_ORACLE as _NO_ORACLE  # noqa: E402

QUERIES.update(_NO_ORACLE)


_CHECK_ORDER = [
    # --- round-11 rotation (VERDICT r10 #1: burn the certification
    # backlog).  The 63 never-driver-checked entries (orders_bullwhip
    # .. orders_jonckheere, preserved in their prior relative order)
    # head the list; the driver window covers the first 50, leaving 13
    # carried to round 12.  NEW round-11 entries are appended
    # immediately AFTER this 63-entry block (before the already-
    # certified tail) so the burn-down stays monotonic.
    # --- never driver-checked backlog (63 entries) ---
    "orders_bullwhip",
    "events_neyman_allocation",
    "graph_modularity",
    "eval_err_at_k",
    "events_gtest",
    "orders_gk_gamma",
    "eval_pinball_loss",
    "orders_lorenz_deciles",
    "stream_first_touch",
    "events_hurst_rs",
    "eval_ece",
    "orders_littles_law",
    "asof_nearest_events",
    "events_user_streaks",
    "similarity_range_search",
    "events_decayed_engagement",
    "orders_ipf_raking",
    "orders_price_elasticity",
    "orders_cyclic_encoding",
    "graph_katz_centrality",
    "events_time_to_second",
    "part_risk_pooling",
    "events_changepoint_tree",
    "eval_wilcoxon_signed_rank",
    "eval_permutation_test",
    "events_mann_kendall",
    "events_friedman",
    "events_cochran_q",
    "orders_wasserstein_drift",
    "events_simpson_diversity",
    "events_durbin_watson",
    "events_mase",
    "eval_hosmer_lemeshow",
    "orders_fisher_index",
    "graph_rich_club",
    "orders_nelson_aalen",
    "events_holm_bonferroni",
    "events_anderson_darling",
    "events_grubbs",
    "eval_youden_j",
    "orders_tukey_fences",
    "events_effect_sizes",
    "text_yule_k",
    "quality_benford_digit2",
    "embedding_pca_power",
    "orders_energy_distance",
    "events_haar_energy",
    "events_circular_rayleigh",
    "orc_roundtrip_read",
    "text_compression_quality",
    "similarity_reciprocal_nn",
    "graph_ktruss",
    "events_tost_equivalence",
    "orders_chain_ladder",
    "embedding_isotropy",
    "events_xmr_chart",
    "events_sampen",
    "text_burrows_delta",
    "eval_log_loss",
    "events_transfer_entropy",
    "orders_quartiles_cont",
    "events_mood_median",
    "orders_jonckheere",
    # --- round-11 additions (appended behind the backlog block) ---
    "avro_roundtrip_read",
    "dedup_editratio_verified",
    "events_kpss",
    "events_cramer_von_mises",
    "events_ansari_bradley",
    "events_bartlett",
    "events_variance_ratio",
    "orders_page_trend",
    "events_benjamini_yekutieli",
    "eval_brier_decomposition",
    "part_safety_stock",
    "sql_qualify_dedup",
    "events_quade",
    "events_lilliefors",
    "events_spectral_flatness",
    "graph_double_sweep",
    "xml_roundtrip_read",
    "avro_schema_evolution",
    "jsonl_roundtrip_read",
    "csv_roundtrip_read",
    "events_seasonal_mann_kendall",
    "events_sign_test",
    "eval_weighted_kappa",
    "graph_harmonic_centrality",
    # --- already driver-certified (rounds 1-10 windows), rotated to tail ---
    "events_mix_entropy_daily",
    "sql_try_cast_tolerance",
    "events_event_study",
    "orders_incremental_rollup",
    "text_classifier_score",
    "graph_triangles",
    "similarity_prefix_rerank",
    "agg_approx_percentile",
    "events_time_split",
    "drift_psi_orders",
    "embedding_gram_matrix",
    "agg_winsorized_stats",
    "text_vocab_growth",
    "events_cuped",
    "session_sequences",
    "text_chunking",
    "multimodal_image_ann",
    "dedup_cluster_keep",
    "merge_upsert_orders",
    "text_repetition",
    "corpus_mixture",
    "events_funnel",
    "embedding_centroids",
    "interval_concurrency",
    "stream_static_enrich",
    "stream_cdc_apply",
    "orders_theil_index",
    "orders_newsvendor",
    "part_cv2_adi_classes",
    "events_page_hinkley",
    "events_user_burstiness",
    "part_abc_xyz_matrix",
    "eval_spiegelhalter_z",
    "eval_topk_accuracy",
    "corpus_length_profile",
    "graph_jaccard_linkpred",
    "stream_page_hinkley",
    "eval_auc_delong_ci",
    "eval_average_precision",
    "orders_target_encoding_oof",
    "events_odds_ratio_mh",
    "events_bass_diffusion",
    "events_user_active_span",
    "orders_fill_rate_otif",
    "eval_reliability_sharpness",
    "events_wilson_ci",
    "events_ljung_box",
    "events_jarque_bera",
    "eval_mcc_multiclass",
    "part_eoq_policy",
    "pack_length_batches",
    "dedup_span_ngrams",
    "embedding_kmeans",
    "events_mad_outliers",
    "corpus_split_assign",
    "text_bpe_learn",
    "events_markov_transitions",
    "stream_quality_gate",
    "events_seasonality",
    "text_stats",
    "privacy_t_closeness",
    "events_did",
    "graph_adamic_adar",
    "corpus_temperature_sample",
    "events_growth_accounting",
    "events_forecast_baselines",
    "part_skyline",
    "text_quality_sweep",
    "dedup_block_hamming",
    "dedup_minhash_incremental",
    "embedding_outliers",
    "similarity_hard_negatives",
    "corpus_shard_manifest",
    "stream_neardup_admission",
    "corpus_weighted_sample",
    "text_bm25_topk",
    "linkage_blocked_fuzzy",
    "graph_bfs_reach",
    "events_holt_forecast",
    "scd2_asof_lookup",
    "privacy_k_anonymity",
    "corpus_doremi_mixture",
    "dedup_source_matrix",
    "text_distinctive_terms",
    "orders_quantile_bins",
    "events_rolling_robust",
    "agg_kmv_distinct",
    "orders_abc_pareto",
    "privacy_l_diversity",
    "events_acf",
    "drift_ks_orders",
    "orders_gini",
    "text_jsd_sources",
    "retrieval_rrf_fusion",
    "events_bot_score",
    "profile_entropy_orders",
    "agg_kmv_set_ops",
    "events_markov_stationary",
    "orders_kaplan_meier",
    "events_cusum",
    "similarity_ivf_index_topk",
    "dedup_semantic_pairs",
    "dedup_semantic_keep",
    "text_tfidf_topterms",
    "text_unigram_surprisal",
    "stream_interval_join",
    "dedup_simhash_pairs",
    "similarity_lsh_topk",
    "key_skew_report",
    "events_ewma",
    "dedup_incremental",
    "events_cohort_retention",
    "text_bigram_surprisal",
    "events_rfm_segments",
    "agg_cube",
    "join_cross",
    "window_sliding",
    "window_session",
    "dedup_exact_stats",
    "dedup_embedding_keep",
    "quality_expectations",
    "multimodal_audio_meta",
    "corpus_dsir_weights",
    "similarity_pq_topk",
    "graph_pagerank",
    "text_bpe_encode",
    "dedup_containment_pairs",
    "snapshot_diff_orders",
    "corpus_mixture_sample",
    "sql_recursive_cte",
    "sql_lateral_topn",
    "sql_variant_props",
    "events_linear_trend",
    "events_attribution",
    "events_ab_test",
    "dedup_containment_keep",
    "text_collocations",
    "sql_not_in_nulls",
    "set_ops_all",
    "sql_fuzzy_match",
    "events_correlation_matrix",
    "text_top_tokens",
    "q3_shipping_priority",
    "q5_local_supplier",
    "q1_pricing_summary",
    "join_inner",
    "join_outer",
    "join_semi_anti",
    "range_join_tiers",
    "asof_join_events",
    "agg_distinct",
    "agg_approx_distinct",
    "agg_global",
    "agg_rollup",
    "agg_stats",
    "agg_collect",
    "window_rank",
    "window_lag_lead",
    "window_running",
    "sort_topk_nulls",
    "set_union_all",
    "set_intersect_except",
    "window_tumbling",
    "string_funcs",
    "datetime_funcs",
    "math_funcs",
    "conditional_case",
    "json_funcs",
    "array_map_funcs",
    "label_attacks_parity",
    "extract_ranges_parity",
    "quality_no_nulls",
    "port_filter_parity",
    "dedup_exact_keep",
    "dedup_jaccard_pairs",
    "dedup_minhash_verified",
    "dedup_embedding_pairs",
    "dedup_embedding_lsh",
    "similarity_topk",
    "similarity_ivf_topk",
    "text_quality",
    "text_lang_id",
    "multimodal_join",
    "multimodal_image_meta",
    "grouped_zscore_udf",
    "grouped_wmean_udaf",
    "udtf_chunk_ranges",
    "sql_scalar_cte",
    "pack_sequences",
    "corpus_curation",
    "text_contamination",
    "text_pii_scrub",
    "embedding_quantize",
    "text_bpe_tokens",
    "flow_aggregate",
    "events_ols",
    "orders_clamped_balance",
    "text_lexical_diversity",
    "text_novelty_gain",
    "events_holt_winters",
    "embedding_jl_distortion",
    "quality_cross_field_rules",
    "eval_brier_profile",
    "stream_interval_join_outer",
    "orders_join_ivm",
    "txnlog_snapshot_read",
    "part_sourcing_risk",
    "orders_ratio_to_report",
    "stream_lateness_audit",
    "biflow_aggregate",
    "quality_benford",
    "agg_weighted_median",
    "orders_market_basket",
    "scd2_order_priority",
    "events_gap_fill",
    "profile_orders_card",
    "audit_referential_integrity",
    "stream_trending_topk",
    "text_zipf_fit",
    "text_readability",
    "events_entropy_rate",
    "graph_degree_histogram",
    "events_sprt",
    "eval_isotonic_calibration",
    "corpus_negative_sampling",
    "text_rake_keyphrases",
    "dim_date_build",
    "events_theil_sen",
    "stream_sprt",
    "eval_cv_auc",
    "events_mann_whitney",
    "events_chi_square",
    "events_dau_growth",
    "orders_cohort_ltv",
    "events_audience_overlap",
    "events_power_analysis",
    "stream_dedup",
    "agg_heavy_hitters",
    "q2_min_cost_supplier",
    "q20_excess_suppliers",
    "stream_running_totals",
    "corpus_leakage_safe_split",
    "dedup_threshold_sweep",
    "eval_auc",
    "packets_mixed_capture",
    "orders_target_encoding",
    "schema_evolution_read",
    "part_kendall_tau",
    "events_overdispersion",
    "orders_interval_overlap",
    "stream_session_windows",
    "graph_lpa_communities",
    "eval_pr_curve",
    "eval_calibration",
    "events_group_kfold",
    "eval_ann_recall",
    "eval_knn_label_prop",
    "embedding_dim_stats",
    "eval_ndcg",
    "eval_confusion_matrix",
    "stream_drift_monitor",
    "corpus_fingerprint",
    "sql_group_by_all",
    "bitwise_funcs",
    "grouping_sets_sql",
    "from_json_funcs",
    "multimodal_video_frames",
    "sql_exists_in_subquery",
    "text_winnow_fingerprint",
    "agg_salted",
    "join_salted",
    "agg_pivot",
    "unpivot_metrics",
    "sample_hash",
    "sample_stratified",
    "text_inverted_index",
    "agg_histogram",
    "join_bloom_prune",
    "events_stl_decompose",
    "text_oov_rate",
    "corpus_curriculum",
    "events_rolling_distinct",
    "events_lateness_histogram",
    "privacy_dp_release",
    "corpus_span_corruption",
    "eval_perplexity_holdout",
    "similarity_mmr_rerank",
    "graph_k_core",
    "events_path_regex",
    "eval_mrr",
    "range_join_binned",
    "events_poisson_rate",
    "eval_lift_gains",
    "text_script_mix",
    "eval_regression_metrics",
    "part_frequency_encoding",
    "orders_cramers_v",
    "partitioned_table_prune",
    "dedup_minhash_calibration",
    "q4_order_priority",
    "q6_forecast_revenue",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_profit",
    "q10_returned_items",
    "q11_important_parts",
    "q12_shipping_delay",
    "q13_customer_distribution",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q16_supplier_part_counts",
    "q17_small_quantity_revenue",
    "q18_large_orders",
    "q19_disjunctive_predicates",
    "q21_waiting_suppliers",
    "q22_dormant_customers",
    "packets_portscan",
    "packets_ddos_fanin",
    "window_distribution",
    "window_range_frame",
    "agg_mode",
    "agg_hll_sketch",
    "corpus_token_budget",
    "events_bootstrap_ci",
    "orders_price_index",
    "dedup_cluster_sizes",
    "quality_uniqueness",
    "orders_mix_shift",
    "orders_xyz_classes",
    "text_template_mining",
    "eval_fairness_parity",
    "events_runs_test",
    "events_srm_check",
    "orders_shipping_sla",
    "events_hourly_profile",
    "stream_srm_monitor",
    "orders_duplicate_payments",
    "events_anova",
    "orders_seasonal_index",
    "corpus_split_drift",
    "orders_segment_migration",
    "orders_open_aging",
    "events_conversion_windows",
    "orders_drawdown",
    "csv_quarantine_scan",
    "graph_clustering_coeff",
    "events_conversion_latency",
    "feature_hashing_trick",
    "vocab_coverage_curve",
    "events_changepoint",
    "orders_woe_encoding",
    "events_welch_ttest",
    "txnlog_compact_read",
    "events_kruskal_wallis",
    "eval_mcnemar",
    "eval_cohens_kappa",
    "orders_logrank",
    "eval_ips_policy_value",
    "jsonl_quarantine_scan",
    "graph_hits",
    "part_croston_demand",
    "events_fdr_bh",
    "text_textrank_keywords",
    "events_cochran_armitage",
    "events_brown_forsythe",
    "eval_qini_uplift",
    "eval_krippendorff_alpha",
    "events_panel_within",
    "text_burstiness",
    "corpus_tokenizer_audit",
    "orders_weibull_fit",
    "events_capture_recapture",
    "eval_bradley_terry",
    "events_extreme_gumbel",
    "events_peaks_over_threshold",
    "txnlog_changes_read",
    "events_eb_shrinkage",
    "events_burst_kleinberg",
    "orders_hill_tail",
    "events_slo_burn",
    "orders_rolling_yoy",
    "eval_threshold_cost",
    "orders_replenishment_cycle",
    "events_return_hazard",
    "orders_hhi",
    "supplier_lead_time",
    "corpus_release_manifest",
    "events_gap_percentiles",
    "orders_discount_effect",
    "graph_assortativity",
    "corpus_dataset_card",
    "part_spearman",
    "orders_period_end_loading",
    "stream_slo_burn",
]


def _apply_check_order() -> None:
    missing = [n for n in _CHECK_ORDER if n not in QUERIES]
    extra = [n for n in QUERIES if n not in _CHECK_ORDER]
    if missing or extra:
        raise RuntimeError(f"registry/order drift: missing={missing} extra={extra}")
    ordered_q = {n: QUERIES[n] for n in _CHECK_ORDER}
    QUERIES.clear()
    QUERIES.update(ordered_q)
    ordered_o = {n: ORACLE[n] for n in _CHECK_ORDER if n in ORACLE}
    ORACLE.clear()
    ORACLE.update(ordered_o)


_apply_check_order()
