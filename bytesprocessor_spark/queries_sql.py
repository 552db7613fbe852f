"""SQL-passthrough surface: queries expressed as ONE ANSI-SQL string
executed verbatim by both engines — Spark (``spark.sql`` over temp
views) and the DuckDB oracle.  This is the strongest form of the
correctness contract (not merely equivalent plans, the same text) and
exercises the parser/analyzer paths the DataFrame corpus doesn't:
correlated EXISTS, IN-subqueries, correlated scalar subqueries (all
decorrelated by Catalyst into joins — the reference has no subquery
machinery at all), and CTE + window SQL.

Determinism: money comparisons go through the exact-cents pattern
(see queries.py docstring); outputs are ordered with unique tiebreaks
and LIMITed so the checked sets are stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bytesprocessor_spark.queries import query, cents, bp, _t


def _sql(spark: SparkSession, sf_dir: str, sql: str, tables: tuple[str, ...]) -> DataFrame:
    for t in tables:
        _t(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(sql)


_EXISTS_IN_SQL = """
    SELECT c_custkey, c_name
    FROM customer c
    WHERE EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
    )
    AND c_nationkey IN (
      SELECT n_nationkey FROM nation WHERE n_regionkey IN (1, 2)
    )
    ORDER BY c_custkey
    LIMIT 100
"""


@query("sql_exists_in_subquery", _EXISTS_IN_SQL)
def sql_exists_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS + uncorrelated IN in one statement: Catalyst
    rewrites the EXISTS to a left-semi join (RewritePredicateSubquery)
    and the IN to a semi join against a broadcast-sized dimension; the
    same text runs verbatim on DuckDB."""
    return _sql(spark, sf_dir, _EXISTS_IN_SQL, ("customer", "orders", "nation"))


_SCALAR_CTE_SQL = """
    WITH above AS (
      SELECT p_partkey, p_brand, p_retailprice
      FROM part p
      WHERE CAST(ROUND(p_retailprice * 100) AS BIGINT) > (
        SELECT CAST(SUM(CAST(ROUND(p2.p_retailprice * 100) AS BIGINT)) AS DOUBLE)
               / COUNT(*)
        FROM part p2
        WHERE p2.p_brand = p.p_brand
      )
    ),
    ranked AS (
      SELECT p_partkey, p_brand, p_retailprice,
             ROW_NUMBER() OVER (
               PARTITION BY p_brand
               ORDER BY CAST(ROUND(p_retailprice * 100) AS BIGINT) DESC, p_partkey
             ) AS rk
      FROM above
    )
    SELECT p_partkey, p_brand, p_retailprice, rk
    FROM ranked
    WHERE rk <= 3
    ORDER BY p_brand, rk, p_partkey
    LIMIT 100
"""


@query("sql_scalar_cte", _SCALAR_CTE_SQL)
def sql_scalar_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery (above-brand-average predicate,
    decorrelated by Catalyst into an aggregate + join) feeding a CTE +
    ranking window — the three subquery-machinery paths the DataFrame
    corpus can't exercise, in one verbatim-shared text.  Exact-cents
    arithmetic keeps the group averages bit-identical across engines."""
    return _sql(spark, sf_dir, _SCALAR_CTE_SQL, ("part",))


# --- composite TPC-H skeletons (tail entries; families proven earlier) ------


@query(
    "q6_forecast_revenue",
    """
    SELECT CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                    * CAST(ROUND(l_discount * 10000) AS BIGINT)) AS DOUBLE) / 1000000.0
             AS revenue,
           COUNT(*) AS n
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND ROUND(l_discount * 10000) BETWEEN 500 AND 700
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 skeleton: the pure scan-side query — every predicate
    pushes to parquet (PushedFilters), zero joins, one global agg.
    The discount band compares in exact basis points, not floats."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & bp(F.col("l_discount")).between(500, 700)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            (F.sum(cents(F.col("l_extendedprice")) * bp(F.col("l_discount"))).cast("double") / 1_000_000.0).alias("revenue"),
            F.count("*").alias("n"),
        )
    )


@query(
    "q10_returned_items",
    """
    SELECT c_custkey, c_name, n_name,
           CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                    * (10000 - CAST(ROUND(l_discount * 10000) AS BIGINT))) AS DOUBLE) / 1000000.0
             AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1995-10-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1996-01-01 00:00:00'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 skeleton: returned-item revenue ranking.  lineitem ⋈
    orders is the one big shuffle; customer and nation broadcast; the
    top-20 plans as TakeOrderedAndProject."""
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    orders = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1995-10-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-01-01 00:00:00").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    price_c, disc_b = cents(F.col("l_extendedprice")), bp(F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg((F.sum(price_c * (F.lit(10000) - disc_b)).cast("double") / 1_000_000.0).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@query(
    "q18_large_orders",
    """
    SELECT o_orderkey,
           CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS DOUBLE) / 100.0
             AS total_qty
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderkey
    HAVING SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) > 15000
    ORDER BY total_qty DESC, o_orderkey
    LIMIT 20
    """,
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 skeleton (large-volume orders): join + agg + HAVING +
    deterministic top-k.  The HAVING folds into the post-agg filter;
    one orderkey shuffle, top-k plans as TakeOrderedAndProject."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    qty_c = cents(F.col("l_quantity"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderkey")
        .agg(F.sum(qty_c).alias("__q"))
        .where(F.col("__q") > 15000)
        .select(
            F.col("o_orderkey"),
            (F.col("__q").cast("double") / 100.0).alias("total_qty"),
        )
        .orderBy(F.col("total_qty").desc(), F.col("o_orderkey"))
        .limit(20)
    )


@query(
    "q14_promo_revenue",
    """
    SELECT CAST(SUM(CASE WHEN p_type = 'PROMO'
                         THEN CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                              * (10000 - CAST(ROUND(l_discount * 10000) AS BIGINT))
                         ELSE 0 END) AS DOUBLE)
           / CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                      * (10000 - CAST(ROUND(l_discount * 10000) AS BIGINT))) AS DOUBLE)
             * 100.0 AS promo_pct,
           COUNT(*) AS n
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1996-02-01 00:00:00'
    """,
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 skeleton: conditional-aggregate ratio over a fact ⋈
    dim join — part broadcasts, lineitem's pushed date filter bounds
    the scan to one month; the promo share is a ratio of two exact
    integer sums (one IEEE division at the end)."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-02-01 00:00:00").cast("timestamp"))
    )
    part = _t(spark, sf_dir, "part")
    disc_price = cents(F.col("l_extendedprice")) * (F.lit(10000) - bp(F.col("l_discount")))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            (
                F.sum(F.when(F.col("p_type") == "PROMO", disc_price).otherwise(0)).cast("double")
                / F.sum(disc_price).cast("double")
                * 100.0
            ).alias("promo_pct"),
            F.count("*").alias("n"),
        )
    )


@query(
    "q4_order_priority",
    """
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority
    """,
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 skeleton: EXISTS decorrelates to a left-semi join with
    a mixed equi + non-equi condition (shipped strictly after the
    order date); one orderkey shuffle, then a tiny priority agg."""
    orders = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    cond = (orders.o_orderkey == li.l_orderkey) & (li.l_shipdate > orders.o_orderdate)
    return (
        orders.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


@query(
    "q13_customer_distribution",
    """
    WITH c_orders AS (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey
    )
    SELECT c_count, COUNT(*) AS custdist
    FROM c_orders GROUP BY c_count
    """,
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 skeleton: order-count-per-customer distribution — a
    LEFT OUTER join whose unmatched rows MUST survive into COUNT(col)
    = 0 (the classic outer-join-with-agg correctness trap), then a
    second tiny aggregation over the counts."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@query(
    "q19_disjunctive_predicates",
    """
    SELECT CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                    * (10000 - CAST(ROUND(l_discount * 10000) AS BIGINT))) AS DOUBLE)
             / 1000000.0 AS revenue,
           COUNT(*) AS n
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
       OR (p_type  = 'PROMO'  AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)
    """,
)
def q19_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 skeleton: an OR of AND-groups spanning both join
    sides.  Catalyst extracts the common single-side conjuncts
    (l_quantity ranges push to the lineitem scan, p_size to part)
    while the cross-side residual evaluates post-join — the predicate
    shape that separates a real optimizer from a literal translator."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    j = li.join(F.broadcast(part), part.p_partkey == li.l_partkey)
    q = F.col("l_quantity")
    pred = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15) & q.between(1, 11))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(1, 25) & q.between(10, 20))
        | ((F.col("p_type") == "PROMO") & F.col("p_size").between(1, 35) & q.between(20, 30))
    )
    disc_price = cents(F.col("l_extendedprice")) * (F.lit(10000) - bp(F.col("l_discount")))
    return j.where(pred).agg(
        (F.sum(disc_price).cast("double") / 1_000_000.0).alias("revenue"),
        F.count("*").alias("n"),
    )


@query(
    "q7_volume_shipping",
    """
    SELECT supp_nation, cust_nation, l_year,
           CAST(SUM(v) AS DOUBLE) / 1000000.0 AS revenue,
           COUNT(*) AS n
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS l_year,
             CAST(ROUND(l_extendedprice * 100) AS BIGINT)
               * (10000 - CAST(ROUND(l_discount * 10000) AS BIGINT)) AS v
      FROM supplier, lineitem, orders, customer, nation n1, nation n2
      WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
        AND c_custkey = o_custkey
        AND s_nationkey = n1.n_nationkey AND c_nationkey = n2.n_nationkey
        AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    )
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 skeleton: bilateral trade volume between two nations by
    ship year.  lineitem ⋈ orders is the single big shuffle; customer,
    supplier and both nation role-aliases broadcast; the symmetric
    nation-pair disjunction evaluates post-join on broadcast columns."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
        | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    )
    v = cents(F.col("l_extendedprice")) * (F.lit(10000) - bp(F.col("l_discount")))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n1), supp.s_nationkey == F.col("n1_key"))
        .join(F.broadcast(n2), cust.c_nationkey == F.col("n2_key"))
        .where(pair)
        .withColumn("l_year", F.year("l_shipdate").cast("long"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(
            (F.sum(v).cast("double") / 1_000_000.0).alias("revenue"),
            F.count("*").alias("n"),
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@query(
    "q8_market_share",
    """
    SELECT o_year,
           CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN v ELSE 0 END) AS DOUBLE)
             / CAST(SUM(v) AS DOUBLE) AS mkt_share,
           COUNT(*) AS n
    FROM (
      SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
             CAST(ROUND(l_extendedprice * 100) AS BIGINT)
               * (10000 - CAST(ROUND(l_discount * 10000) AS BIGINT)) AS v,
             n2.n_name AS supp_nation
      FROM part, supplier, lineitem, orders, customer, nation n1, nation n2, region
      WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
        AND l_orderkey = o_orderkey AND o_custkey = c_custkey
        AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey
        AND r_name = 'ASIA' AND s_nationkey = n2.n_nationkey
        AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
        AND p_type = 'PROMO'
    )
    GROUP BY o_year
    ORDER BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 skeleton: one nation's share of PROMO-part revenue sold
    into one region, by order year — a 7-table star join where every
    dimension broadcasts and the share is a ratio of two exact integer
    conditional sums."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").where(F.col("p_type") == "PROMO")
    orders = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    v = cents(F.col("l_extendedprice")) * (F.lit(10000) - bp(F.col("l_discount")))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n1), cust.c_nationkey == F.col("n1_key"))
        .join(F.broadcast(region), F.col("n1_region") == region.r_regionkey)
        .join(F.broadcast(n2), supp.s_nationkey == F.col("n2_key"))
        .withColumn("o_year", F.year("o_orderdate").cast("long"))
        .withColumn("v", v)
        .groupBy("o_year")
        .agg(
            (
                F.sum(F.when(F.col("supp_nation") == "NATION_3", F.col("v")).otherwise(0)).cast("double")
                / F.sum("v").cast("double")
            ).alias("mkt_share"),
            F.count("*").alias("n"),
        )
        .orderBy("o_year")
    )


@query(
    "q15_top_supplier",
    """
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                 * (10000 - CAST(ROUND(l_discount * 10000) AS BIGINT))) AS total_rev_i
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name,
           CAST(total_rev_i AS DOUBLE) / 1000000.0 AS total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_rev_i = (SELECT MAX(total_rev_i) FROM revenue)
    ORDER BY s_suppkey
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 skeleton: quarter revenue per supplier, keep the
    max-revenue supplier(s) via an uncorrelated scalar subquery over
    the same derived table.  The revenue agg computes once per branch
    over exact integer sums, so the max comparison is never a float
    tie; supplier broadcasts onto the 100-row revenue table."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    supp = _t(spark, sf_dir, "supplier")
    v = cents(F.col("l_extendedprice")) * (F.lit(10000) - bp(F.col("l_discount")))
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(v).alias("total_rev_i")
    )
    max_rev = revenue.agg(F.max("total_rev_i").alias("m"))
    return (
        revenue.join(F.broadcast(max_rev), F.col("total_rev_i") == F.col("m"))
        .join(F.broadcast(supp), F.col("supplier_no") == supp.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            (F.col("total_rev_i").cast("double") / 1_000_000.0).alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


@query(
    "q16_supplier_part_counts",
    """
    SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1'
      AND p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
      AND NOT EXISTS (SELECT 1 FROM supplier
                      WHERE s_acctbal < 0 AND s_suppkey = l_suppkey)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    LIMIT 50
    """,
)
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 adaptation (the schema has no partsupp; the
    part-supplier relation is derived from lineitem): distinct
    supplier counts per part attribute bucket, excluding suppliers in
    negative account standing via NOT EXISTS → a broadcast anti join
    (left_anti matches NOT EXISTS semantics exactly, including on
    NULL keys — the oracle SQL is written as NOT EXISTS for the same
    reason).  count(DISTINCT) expands partials per key, so the agg
    stays two-phase without a global shuffle of raw rows."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#1")
        & F.col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29)
    )
    bad_supp = _t(spark, sf_dir, "supplier").where(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(
            F.broadcast(bad_supp), li.l_suppkey == bad_supp.s_suppkey, "left_anti"
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
        .limit(50)
    )


@query(
    "q17_small_quantity_revenue",
    """
    WITH pa AS (
      SELECT l_partkey AS pk,
             SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS sq,
             COUNT(*) AS cq
      FROM lineitem GROUP BY l_partkey
    )
    SELECT CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS DOUBLE)
             / 700.0 AS avg_yearly,
           COUNT(*) AS n
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN pa   ON pk = l_partkey
    WHERE p_brand = 'Brand#3'
      AND 5 * CAST(ROUND(l_quantity * 100) AS BIGINT) * cq < sq
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 skeleton: revenue from below-one-fifth-of-part-average
    quantity orders.  The correlated avg subquery is written in its
    decorrelated form (per-part agg re-joined to the fact) and the
    0.2·avg comparison cross-multiplies to exact integers
    (5·qty·count < sum), so no engine disagrees at the boundary.
    The per-part agg and the fact join share the l_partkey
    partitioning — one shuffle feeds both."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#3")
    qty_c = cents(F.col("l_quantity"))
    pa = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.sum(qty_c).alias("sq"), F.count("*").alias("cq")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(pa, li.l_partkey == pa.pk)
        .where(F.lit(5) * qty_c * F.col("cq") < F.col("sq"))
        .agg(
            (F.sum(cents(F.col("l_extendedprice"))).cast("double") / 700.0).alias(
                "avg_yearly"
            ),
            F.count("*").alias("n"),
        )
    )


@query(
    "q22_dormant_customers",
    """
    WITH avg_bal AS (
      SELECT CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS DOUBLE)
               / COUNT(*) AS ab
      FROM customer WHERE c_acctbal > 0
    )
    SELECT c_nationkey,
           COUNT(*) AS numcust,
           CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS DOUBLE) / 100.0
             AS totacctbal
    FROM customer c
    WHERE CAST(ROUND(c_acctbal * 100) AS BIGINT) > (SELECT ab FROM avg_bal)
      AND NOT EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c.c_custkey
          AND o_orderdate >= TIMESTAMP '1999-01-01 00:00:00'
      )
    GROUP BY c_nationkey
    ORDER BY c_nationkey
    """,
)
def q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 adaptation (no phone column — nationkey stands in for
    the country code): wealthy-but-dormant customers.  The global
    average is a broadcast scalar (sum in exact cents, one IEEE
    division both engines compute identically); NOT EXISTS becomes a
    left-anti join against recent orders."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= F.lit("1999-01-01 00:00:00").cast("timestamp")
    )
    bal_c = cents(F.col("c_acctbal"))
    avg_bal = (
        cust.where(F.col("c_acctbal") > 0)
        .agg((F.sum(bal_c).cast("double") / F.count("*")).alias("ab"))
    )
    return (
        cust.join(F.broadcast(avg_bal), bal_c > F.col("ab"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("numcust"),
            (F.sum(bal_c).cast("double") / 100.0).alias("totacctbal"),
        )
        .orderBy("c_nationkey")
    )


@query(
    "q9_product_profit",
    """
    SELECT n_name, o_year,
           CAST(SUM(amount_micro) AS DOUBLE) / 1000000.0 AS sum_profit,
           COUNT(*) AS n
    FROM (
      SELECT n_name,
             CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
             CAST(ROUND(l_extendedprice * 100) AS BIGINT)
               * (10000 - CAST(ROUND(l_discount * 10000) AS BIGINT))
             - CAST(ROUND(p_retailprice * 100) AS BIGINT)
               * CAST(ROUND(l_quantity * 100) AS BIGINT) AS amount_micro
      FROM lineitem
      JOIN part     ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN nation   ON s_nationkey = n_nationkey
      WHERE p_type = 'STANDARD'
    )
    GROUP BY n_name, o_year
    ORDER BY n_name, o_year DESC
    """,
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 adaptation (no partsupp: p_retailprice stands in for
    ps_supplycost): profit by supplier nation and order year.  Both
    price terms stay integer micro-dollars (cents×bp and cents×cents
    ×100 share the 1e-6 scale) so the profit sum is exact; part/
    supplier/nation broadcast, lineitem ⋈ orders is the one shuffle."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").where(F.col("p_type") == "STANDARD")
    supp = _t(spark, sf_dir, "supplier")
    orders = _t(spark, sf_dir, "orders")
    nation = _t(spark, sf_dir, "nation")
    amount = cents(F.col("l_extendedprice")) * (
        F.lit(10000) - bp(F.col("l_discount"))
    ) - cents(F.col("p_retailprice")) * cents(F.col("l_quantity"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .withColumn("o_year", F.year("o_orderdate").cast("long"))
        .withColumn("amount_micro", amount)
        .groupBy("n_name", "o_year")
        .agg(
            (F.sum("amount_micro").cast("double") / 1_000_000.0).alias("sum_profit"),
            F.count("*").alias("n"),
        )
        .orderBy(F.col("n_name"), F.col("o_year").desc())
    )


@query(
    "q11_important_parts",
    """
    WITH v AS (
      SELECT l_partkey,
             SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS val
      FROM lineitem GROUP BY l_partkey
    )
    SELECT l_partkey, CAST(val AS DOUBLE) / 100.0 AS part_value
    FROM v
    WHERE 2000 * val > (SELECT SUM(val) FROM v)
    ORDER BY val DESC, l_partkey
    LIMIT 100
    """,
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 adaptation (no partsupp: traded value from lineitem
    stands in for stock value): parts whose value exceeds a fixed
    fraction of the global total.  The HAVING-against-global-scalar
    compares 2000·val > Σval in exact integers — the uncorrelated
    scalar subquery broadcasts, and the same per-part aggregate feeds
    both branches (one shuffle)."""
    li = _t(spark, sf_dir, "lineitem")
    v = li.groupBy("l_partkey").agg(F.sum(cents(F.col("l_extendedprice"))).alias("val"))
    total = v.agg(F.sum("val").alias("t"))
    return (
        v.join(F.broadcast(total), F.lit(2000) * F.col("val") > F.col("t"))
        .select(
            "l_partkey", (F.col("val").cast("double") / 100.0).alias("part_value"),
            "val",
        )
        .orderBy(F.col("val").desc(), "l_partkey")
        .limit(100)
        .drop("val")
    )


@query(
    "q12_shipping_delay",
    """
    SELECT CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 'high' ELSE 'low' END AS priority_class,
           CAST(SUM(CASE WHEN l_shipdate >= o_orderdate + INTERVAL 60 DAY
                         THEN 1 ELSE 0 END) AS BIGINT) AS late_count,
           COUNT(*) AS line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= o_orderdate + INTERVAL 30 DAY
    GROUP BY 1
    ORDER BY priority_class
    """,
)
def q12_shipping_delay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 adaptation (no shipmode/commitdate/receiptdate
    columns: lateness is ship-after-order-date+interval): dual
    conditional counts per priority class — the CASE-inside-SUM
    shape of the original, with timestamp+INTERVAL arithmetic both
    engines evaluate identically."""
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    j = orders.join(li, orders.o_orderkey == li.l_orderkey).where(
        F.col("l_shipdate") >= F.col("o_orderdate") + F.expr("INTERVAL 30 DAY")
    )
    return (
        j.withColumn(
            "priority_class",
            F.when(
                F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), "high"
            ).otherwise("low"),
        )
        .groupBy("priority_class")
        .agg(
            F.sum(
                F.when(
                    F.col("l_shipdate")
                    >= F.col("o_orderdate") + F.expr("INTERVAL 60 DAY"),
                    1,
                ).otherwise(0)
            ).alias("late_count"),
            F.count("*").alias("line_count"),
        )
        .orderBy("priority_class")
    )


@query(
    "q21_waiting_suppliers",
    """
    SELECT s_name, COUNT(*) AS numwait
    FROM supplier, lineitem l1, orders, nation
    WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
      AND o_orderstatus = 'F'
      AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
      AND s_nationkey = n_nationkey AND n_name = 'NATION_5'
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 20
    """,
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 adaptation (lateness = shipped >60 days after order
    date; the original keys on receipt-vs-commit dates the schema
    lacks): suppliers who were the SOLE late supplier on a finalized
    multi-supplier order.  EXISTS + correlated NOT EXISTS — the
    decorrelation stress test — expressed as one verbatim SQL text;
    Catalyst plans a semi join and an anti join on l_orderkey against
    the same lineitem scan."""
    return _sql(
        spark,
        sf_dir,
        """
        SELECT s_name, COUNT(*) AS numwait
        FROM supplier, lineitem l1, orders, nation
        WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
          AND o_orderstatus = 'F'
          AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
          AND EXISTS (SELECT 1 FROM lineitem l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM lineitem l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
          AND s_nationkey = n_nationkey AND n_name = 'NATION_5'
        GROUP BY s_name
        ORDER BY numwait DESC, s_name
        LIMIT 20
        """,
        ("supplier", "lineitem", "orders", "nation"),
    )


_RECURSIVE_CTE_SQL = """
WITH RECURSIVE months(m) AS (
  SELECT TIMESTAMP '1995-01-01 00:00:00'
  UNION ALL
  SELECT m + INTERVAL 1 MONTH FROM months
  WHERE m < TIMESTAMP '2000-12-01 00:00:00'
),
o AS (
  SELECT date_trunc('month', o_orderdate) AS m,
         COUNT(*) AS n_orders,
         SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS cents
  FROM orders GROUP BY 1
)
SELECT months.m AS month_start,
       COALESCE(o.n_orders, 0) AS n_orders,
       CAST(COALESCE(o.cents, 0) AS DOUBLE) / 100.0 AS total_price
FROM months LEFT JOIN o ON months.m = o.m
ORDER BY month_start
"""


@query("sql_recursive_cte", _RECURSIVE_CTE_SQL)
def sql_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITH RECURSIVE (new in Spark 4): a 72-row month spine generated
    by the recursion, left-joined onto monthly order rollups — the
    gap-preserving time-series report SQL users reach recursion for.
    The SAME text runs verbatim on both engines; the spine is bounded
    (72 iterations, well under spark.sql.cteRecursionLevelLimit) and
    the rollup is one partial-agg shuffle, so recursion cost is
    driver-trivial and the heavy side stays a normal scan+agg."""
    return _sql(spark, sf_dir, _RECURSIVE_CTE_SQL, ("orders",))


_LATERAL_SQL = """
SELECT c.c_custkey, l.o_orderkey, l.total_price
FROM (SELECT c_custkey FROM customer WHERE c_custkey <= 50) c,
LATERAL (
  SELECT o_orderkey,
         CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT) AS DOUBLE) / 100.0
           AS total_price
  FROM orders
  WHERE o_custkey = c.c_custkey
  ORDER BY o_totalprice DESC, o_orderkey
  LIMIT 2
) l
ORDER BY c.c_custkey, l.o_orderkey
"""


@query("sql_lateral_topn", _LATERAL_SQL)
def sql_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery with per-row ORDER BY + LIMIT — the
    top-N-per-entity idiom in its SQL-native form (the DataFrame corpus
    covers the window-rank form; this exercises Spark's lateral-join
    decorrelation).  Same text verbatim on both engines; Catalyst
    rewrites the per-customer limit into a ranked join, so execution
    is a shuffle join + window, not N correlated scans."""
    return _sql(spark, sf_dir, _LATERAL_SQL, ("customer", "orders"))


@query(
    "sql_variant_props",
    """
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS k_sum,
           MIN(CAST(props->>'$.k' AS BIGINT)) AS k_min,
           MAX(CAST(props->>'$.k' AS BIGINT)) AS k_max
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def sql_variant_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VARIANT (new in Spark 4): the semi-structured fast path —
    ``parse_json`` once into a variant column, typed path extraction
    with ``variant_get`` (binary-encoded traversal, no re-parse per
    field), exact integer aggregation per event type.  The DuckDB
    oracle extracts the same path with its JSON operators — the
    engines' values must agree even though the encodings differ."""
    ev = _t(spark, sf_dir, "events")
    k = F.expr("variant_get(parse_json(props), '$.k', 'long')")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("k").alias("k_sum"),
            F.min("k").alias("k_min"),
            F.max("k").alias("k_max"),
        )
        .orderBy("event_type")
    )


_NOT_IN_NULLS_SQL = """
SELECT
  (SELECT COUNT(*) FROM customer
   WHERE c_custkey <= 100
     AND c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_custkey <= 50))
    AS n_clean_probe,
  (SELECT COUNT(*) FROM customer
   WHERE c_custkey <= 100
     AND c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_custkey <= 50
                           UNION ALL SELECT NULL))
    AS n_null_probe
"""


@query("sql_not_in_nulls", _NOT_IN_NULLS_SQL)
def sql_not_in_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The classic engine-divergence trap, pinned: NOT IN against a
    probe set CONTAINING a NULL must return zero rows (three-valued
    logic: x <> NULL is unknown, so no row can prove membership-
    absence), while the same probe without the NULL behaves like an
    anti join.  Both branches run as one verbatim text on both
    engines; Spark plans the null-aware anti join for the NULL branch
    (a broadcast null-aware anti at scale) — callers who actually want
    anti-join semantics should write NOT EXISTS, which is why the
    TPC-H q16 oracle does."""
    return _sql(spark, sf_dir, _NOT_IN_NULLS_SQL, ("customer", "orders"))


_SET_OPS_ALL_SQL = """
WITH a AS (
  SELECT l_suppkey AS k FROM lineitem WHERE l_linenumber <= 2
),
b AS (
  SELECT l_suppkey AS k FROM lineitem WHERE l_linenumber >= 2
),
i AS (SELECT k FROM a INTERSECT ALL SELECT k FROM b),
x AS (SELECT k FROM a EXCEPT ALL SELECT k FROM b)
SELECT
  (SELECT COUNT(*) FROM i) AS n_intersect_all,
  (SELECT COUNT(*) FROM x) AS n_except_all,
  (SELECT COUNT(DISTINCT k) FROM i) AS n_intersect_keys,
  (SELECT COALESCE(CAST(SUM(k) AS BIGINT), 0) FROM x) AS except_key_sum
"""


@query("set_ops_all", _SET_OPS_ALL_SQL)
def set_ops_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-semantics set operations (O4 completion): INTERSECT ALL
    keeps min(multiplicity) copies and EXCEPT ALL subtracts
    multiplicities — the forms DISTINCT set ops silently collapse.
    Same text verbatim on both engines; the overlapping line-number
    bands guarantee every multiplicity case (a-only, b-only, both,
    repeated) occurs."""
    return _sql(spark, sf_dir, _SET_OPS_ALL_SQL, ("lineitem",))


_FUZZY_SQL = """
WITH probes AS (
  SELECT s_suppkey AS probe_id,
         replace(replace(s_name, '#', '-'), '0', 'O') AS probe
  FROM supplier WHERE s_suppkey <= 20
),
cand AS (
  SELECT p.probe_id, p.probe, s.s_suppkey, s.s_name,
         levenshtein(p.probe, s.s_name) AS dist
  FROM probes p CROSS JOIN supplier s
),
best AS (
  SELECT probe_id, probe, s_suppkey, s_name, dist,
         ROW_NUMBER() OVER (PARTITION BY probe_id
                            ORDER BY dist, s_suppkey) AS rk
  FROM cand
)
SELECT probe_id, probe, s_suppkey AS matched_id, s_name AS matched_name, dist
FROM best WHERE rk = 1 ORDER BY probe_id
"""


@query("sql_fuzzy_match", _FUZZY_SQL)
def sql_fuzzy_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance record linkage (F-family completion): noisy probe
    names (deterministic character corruptions of real supplier names)
    resolve back to their source row by minimum Levenshtein distance
    with an id tie-break.  Same text verbatim on both engines.  The
    demonstration uses the exact small-probe cross join; at 100 TB the
    blocking step (q-gram or phonetic-key equi-join before scoring) is
    the same containment/LSH machinery the dedup family ships."""
    return _sql(spark, sf_dir, _FUZZY_SQL, ("supplier",))


@query(
    "q2_min_cost_supplier",
    """
    WITH ps AS (
      SELECT l_partkey AS pk, l_suppkey AS sk,
             MIN(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS cost_c
      FROM lineitem GROUP BY 1, 2
    ),
    eu AS (
      SELECT s_suppkey, s_acctbal, s_name, n_name
      FROM supplier JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE'
    ),
    cand AS (
      SELECT p_partkey, p_name, sk, cost_c
      FROM part JOIN ps ON p_partkey = pk
      WHERE p_type = 'STANDARD' AND p_size <= 15
    ),
    m AS (
      SELECT c.p_partkey, c.p_name, c.cost_c,
             s.s_acctbal, s.s_name, s.n_name,
             MIN(c.cost_c) OVER (PARTITION BY c.p_partkey) AS mn
      FROM cand c JOIN eu s ON s.s_suppkey = c.sk
    )
    SELECT CAST(ROUND(s_acctbal * 100) AS BIGINT) AS acctbal_c,
           s_name, n_name, p_partkey, p_name,
           CAST(cost_c AS DOUBLE) / 100.0 AS min_cost
    FROM m WHERE cost_c = mn
    ORDER BY acctbal_c DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 adaptation (the fixture schema has no partsupp, so —
    exactly like q16 — the part-supplier relation is DERIVED from
    lineitem, with the minimum observed line price per (part,
    supplier) standing in for ps_supplycost): for each qualifying
    part, the EUROPE supplier(s) offering the minimum cost, ranked by
    account balance.  The original's correlated min-subquery is
    expressed in its decorrelated form: a window MIN over the
    candidate set partitioned by part — one shuffle on p_partkey
    instead of a per-row rescan.

    Plan: the derived ps is one (partkey, suppkey) aggregate of
    lineitem (the only fact-sized shuffle); part filters broadcast
    onto it; the EUROPE supplier dimension broadcasts; the window min
    + filter replaces the correlated subquery.  acctbal is emitted in
    exact cents for the cross-engine sort."""
    li = _t(spark, sf_dir, "lineitem")
    ps = li.groupBy(
        F.col("l_partkey").alias("pk"), F.col("l_suppkey").alias("sk")
    ).agg(F.min(cents(F.col("l_extendedprice"))).alias("cost_c"))
    eu = (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(_t(spark, sf_dir, "nation")),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(_t(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")),
              F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_acctbal", "s_name", "n_name")
    )
    part = _t(spark, sf_dir, "part").where(
        (F.col("p_type") == "STANDARD") & (F.col("p_size") <= 15)
    )
    cand = ps.join(F.broadcast(part), ps.pk == part.p_partkey).select(
        "p_partkey", "p_name", "sk", "cost_c"
    )
    m = cand.join(F.broadcast(eu), cand.sk == eu.s_suppkey).withColumn(
        "mn", F.min("cost_c").over(Window.partitionBy("p_partkey"))
    )
    return (
        m.where(F.col("cost_c") == F.col("mn"))
        .select(
            cents(F.col("s_acctbal")).alias("acctbal_c"),
            "s_name", "n_name", "p_partkey", "p_name",
            (F.col("cost_c").cast("double") / 100.0).alias("min_cost"),
        )
        .orderBy(F.col("acctbal_c").desc(), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@query(
    "q20_excess_suppliers",
    """
    WITH ps AS (
      SELECT l_partkey AS pk, l_suppkey AS sk,
             SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS supplied_c
      FROM lineitem GROUP BY 1, 2
    ),
    shipped AS (
      SELECT l_partkey AS pk,
             SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS ship_c
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY 1
    ),
    excess AS (
      SELECT DISTINCT ps.sk
      FROM ps
      JOIN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%') sp
        ON ps.pk = sp.p_partkey
      JOIN shipped ON shipped.pk = ps.pk
      WHERE ps.supplied_c * 2 > shipped.ship_c
    )
    SELECT s_name, n_name
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WHERE s_suppkey IN (SELECT sk FROM excess)
      AND n_name IN ('NATION_3', 'NATION_7', 'NATION_11')
    ORDER BY s_name
    """,
)
def q20_excess_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 adaptation (no partsupp / ps_availqty in the fixture
    schema): "available quantity" is DERIVED as each (part, supplier)
    pair's total supplied quantity from lineitem, and a supplier has
    excess stock in a part when that exceeds half the part's 1997
    shipments — preserving the original's shape: a nation-filtered
    supplier list semi-joined against a nested quantity-threshold
    subquery over name-matched parts.

    Plan: both derived aggregates share the lineitem scan family and
    shuffle on partkey-led keys; the small-parts filter broadcasts;
    the final IN is a left-semi join against the DISTINCT supplier
    set (broadcast — supplier keys are tiny at any scale)."""
    li = _t(spark, sf_dir, "lineitem")
    qty_c = cents(F.col("l_quantity"))
    ps = li.groupBy(
        F.col("l_partkey").alias("pk"), F.col("l_suppkey").alias("sk")
    ).agg(F.sum(qty_c).alias("supplied_c"))
    shipped = (
        li.where(
            (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
        )
        .groupBy(F.col("l_partkey").alias("pk"))
        .agg(F.sum(qty_c).alias("ship_c"))
    )
    small = _t(spark, sf_dir, "part").where(F.col("p_name").like("small%")).select(
        "p_partkey"
    )
    excess = (
        ps.join(F.broadcast(small), ps.pk == F.col("p_partkey"))
        .join(shipped, "pk")
        .where(F.col("supplied_c") * 2 > F.col("ship_c"))
        .select("sk")
        .distinct()
    )
    supp = _t(spark, sf_dir, "supplier").join(
        F.broadcast(_t(spark, sf_dir, "nation")),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).where(F.col("n_name").isin("NATION_3", "NATION_7", "NATION_11"))
    return (
        supp.join(F.broadcast(excess), supp.s_suppkey == excess.sk, "left_semi")
        .select("s_name", "n_name")
        .orderBy("s_name")
    )


_GROUP_BY_ALL_SQL = """
SELECT l_returnflag, l_linestatus,
       COUNT(*) AS n,
       CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS DOUBLE) / 100.0
         AS total_qty
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
GROUP BY ALL
ORDER BY l_returnflag, l_linestatus
"""


@query("sql_group_by_all", _GROUP_BY_ALL_SQL)
def sql_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-surface parity row: GROUP BY ALL (every non-aggregate
    select item becomes a grouping key — the DuckDB-popularized
    shorthand Spark adopted in 3.4).  The SAME text runs verbatim on
    both engines; the planner resolution must agree on which items
    are keys.  Plans identically to the explicit GROUP BY: one
    partial+final hash aggregate over the pushed-down scan."""
    return _sql(spark, sf_dir, _GROUP_BY_ALL_SQL, ("lineitem",))


_BITWISE_SQL = """
SELECT l_linenumber,
       BIT_AND(l_orderkey) AS key_and,
       BIT_OR(l_orderkey) AS key_or,
       BIT_XOR(l_orderkey) AS key_xor,
       COUNT(*) AS n
FROM lineitem
WHERE l_orderkey < 1024
GROUP BY l_linenumber
ORDER BY l_linenumber
"""


@query("bitwise_funcs", _BITWISE_SQL)
def bitwise_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F11 bitwise aggregate surface: BIT_AND/BIT_OR/BIT_XOR over
    integer keys — the flag-mask rollup family (permission masks,
    feature-bit unions, XOR parity checks).  All three are
    commutative+associative on two's-complement integers, so the
    partial/final split is exact by construction on any engine — the
    rare aggregate that needs NO quantization discipline.  Same text
    both engines; one hash-agg shuffle."""
    return _sql(spark, sf_dir, _BITWISE_SQL, ("lineitem",))


_TRY_CAST_SQL = """
    WITH d AS (
      SELECT event_type,
             TRY_CAST(regexp_extract(props, '[0-9]+', 0) AS BIGINT) AS k_num,
             TRY_CAST(event_type AS BIGINT) AS type_num
      FROM events
    )
    SELECT event_type,
           COUNT(*) AS n,
           COUNT(k_num) AS n_props_parsed,
           COUNT(type_num) AS n_type_numeric,
           CAST(SUM(COALESCE(k_num, 0)) AS BIGINT) AS k_total
    FROM d GROUP BY event_type ORDER BY event_type
"""


@query("sql_try_cast_tolerance", _TRY_CAST_SQL)
def sql_try_cast_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tolerant schema-on-read parsing, pinned: TRY_CAST yields NULL
    instead of failing the job on malformed input — under ANSI mode
    (this engine's default posture) a plain CAST of dirty data KILLS
    the query, so ingestion layers must reach for the TRY_ family, and
    this row proves both engines agree on the tolerant semantics (the
    numeric extraction parses on every row; casting a word column
    yields NULL on every row — both outcomes exercised).  One verbatim
    text on both engines, the sql_not_in_nulls discipline for the
    error-handling axis."""
    return _sql(spark, sf_dir, _TRY_CAST_SQL, ("events",))
