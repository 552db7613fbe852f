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

from bytesprocessor_spark.queries import query, _t


def _sql(spark: SparkSession, sf_dir: str, sql: str, tables: tuple[str, ...]) -> DataFrame:
    for t in tables:
        _t(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(sql)


_EXISTS_SQL = """
    SELECT c_custkey, c_name
    FROM customer c
    WHERE EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
    )
    ORDER BY c_custkey
    LIMIT 100
"""


@query("sql_exists_subquery", _EXISTS_SQL)
def sql_exists_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS — Catalyst rewrites to a left-semi join
    (RewritePredicateSubquery); same text runs on DuckDB."""
    return _sql(spark, sf_dir, _EXISTS_SQL, ("customer", "orders"))


_IN_SQL = """
    SELECT s_suppkey, s_name
    FROM supplier
    WHERE s_nationkey IN (
      SELECT n_nationkey FROM nation WHERE n_regionkey = 1
    )
    ORDER BY s_suppkey
"""


@query("sql_in_subquery", _IN_SQL)
def sql_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-subquery -> semi join against a broadcast-sized dimension."""
    return _sql(spark, sf_dir, _IN_SQL, ("supplier", "nation"))


_SCALAR_SQL = """
    SELECT p_partkey, p_brand, p_retailprice
    FROM part p
    WHERE CAST(ROUND(p_retailprice * 100) AS BIGINT) > (
      SELECT CAST(SUM(CAST(ROUND(p2.p_retailprice * 100) AS BIGINT)) AS DOUBLE)
             / COUNT(*)
      FROM part p2
      WHERE p2.p_brand = p.p_brand
    )
    ORDER BY p_partkey
    LIMIT 100
"""


@query("sql_scalar_subquery", _SCALAR_SQL)
def sql_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery (above-brand-average predicate) —
    decorrelated into an aggregate + join; exact-cents arithmetic keeps
    the group averages bit-identical across engines."""
    return _sql(spark, sf_dir, _SCALAR_SQL, ("part",))


_CTE_SQL = """
    WITH ranked AS (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (
               PARTITION BY o_custkey
               ORDER BY CAST(ROUND(o_totalprice * 100) AS BIGINT) DESC, o_orderkey
             ) AS rk
      FROM orders
    )
    SELECT o_custkey, o_orderkey, o_totalprice
    FROM ranked
    WHERE rk = 1
    ORDER BY o_custkey
    LIMIT 100
"""


@query("sql_cte_top_order", _CTE_SQL)
def sql_cte_top_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CTE + ranking window in pure SQL: each customer's single most
    expensive order (unique tiebreak on o_orderkey)."""
    return _sql(spark, sf_dir, _CTE_SQL, ("orders",))
