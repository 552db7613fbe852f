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

from pyspark.sql import DataFrame, SparkSession
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
