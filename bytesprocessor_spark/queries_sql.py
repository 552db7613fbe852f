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
