"""Scalar-function surface queries (SURVEY §2.7 F4-F9) and the
range/as-of join operators (§2.3 J6-J7).

Each family gets one query exercising several functions at once, all
chosen for bit-identical cross-engine behavior (no transcendental
functions in checked output; round() ties agree because both engines
round half away from zero for doubles).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bytesprocessor_spark.queries import query, cents, _t
from bytesprocessor_spark.operators.joins import asof_join, range_join


@query(
    "string_funcs",
    """
    SELECT p_partkey,
           UPPER(p_name) AS name_upper,
           LENGTH(p_name) AS name_len,
           SUBSTRING(p_name, 1, 4) AS name_prefix,
           split_part(p_name, ' ', 1) AS first_word,
           regexp_extract(p_brand, '([0-9]+)', 1) AS brand_num,
           CONCAT(p_brand, ':', p_type) AS brand_type,
           REPLACE(p_name, ' ', '_') AS name_snake,
           LPAD(CAST(p_size AS VARCHAR), 4, '0') AS size_padded,
           (p_type LIKE '%ECO%') AS is_eco,
           TRIM('  ' || p_name || ' ') AS name_trimmed
    FROM part
    """,
)
def string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.length("p_name").alias("name_len"),
        F.substring("p_name", 1, 4).alias("name_prefix"),
        F.split_part(F.col("p_name"), F.lit(" "), F.lit(1)).alias("first_word"),
        F.regexp_extract("p_brand", r"([0-9]+)", 1).alias("brand_num"),
        F.concat(F.col("p_brand"), F.lit(":"), F.col("p_type")).alias("brand_type"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("name_snake"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        F.col("p_type").like("%ECO%").alias("is_eco"),
        F.trim(F.concat(F.lit("  "), F.col("p_name"), F.lit(" "))).alias("name_trimmed"),
    )


@query(
    "datetime_funcs",
    """
    SELECT o_orderkey,
           EXTRACT(year FROM o_orderdate)    AS order_year,
           EXTRACT(month FROM o_orderdate)   AS order_month,
           EXTRACT(quarter FROM o_orderdate) AS order_quarter,
           EXTRACT(day FROM o_orderdate)     AS order_day,
           strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
           strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d')    AS due_date,
           date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since_95,
           epoch_us(o_orderdate) AS order_us
    FROM orders
    """,
)
def datetime_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return orders.select(
        "o_orderkey",
        F.year(d).cast("long").alias("order_year"),
        F.month(d).cast("long").alias("order_month"),
        F.quarter(d).cast("long").alias("order_quarter"),
        F.dayofmonth(d).cast("long").alias("order_day"),
        F.date_format(F.date_trunc("month", d), "yyyy-MM-dd").alias("month_start"),
        F.date_format(F.date_add(d, 30), "yyyy-MM-dd").alias("due_date"),
        F.datediff(d.cast("date"), F.lit("1995-01-01").cast("date")).cast("long").alias(
            "days_since_95"
        ),
        # o_orderdate loads as TIMESTAMP_NTZ; with a UTC session the
        # instant is unchanged by the cast unix_micros requires.
        F.unix_micros(d.cast("timestamp")).alias("order_us"),
    )


@query(
    "math_funcs",
    """
    SELECT l_orderkey, l_linenumber,
           ABS(l_quantity - 25.0)            AS qty_dev,
           CAST(FLOOR(l_extendedprice / 1000.0) AS BIGINT) AS price_k_floor,
           CAST(CEIL(l_extendedprice / 1000.0) AS BIGINT)  AS price_k_ceil,
           ROUND(l_discount, 1)              AS disc_rounded,
           SQRT(l_quantity)                  AS qty_sqrt,
           l_quantity * l_quantity           AS qty_sq,
           l_orderkey % 7                    AS key_mod,
           CAST(SIGN(l_discount - 0.05) AS DOUBLE) AS disc_sign,
           GREATEST(l_quantity, 10.0)        AS qty_hi,
           LEAST(l_quantity, 10.0)           AS qty_lo
    FROM lineitem
    WHERE l_linenumber = 1
    """,
)
def math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_linenumber") == 1)
    q, p, disc = F.col("l_quantity"), F.col("l_extendedprice"), F.col("l_discount")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(q - 25.0).alias("qty_dev"),
        F.floor(p / 1000.0).alias("price_k_floor"),
        F.ceil(p / 1000.0).alias("price_k_ceil"),
        F.round(disc, 1).alias("disc_rounded"),
        F.sqrt(q).alias("qty_sqrt"),
        (q * q).alias("qty_sq"),
        (F.col("l_orderkey") % 7).alias("key_mod"),
        F.signum(disc - 0.05).alias("disc_sign"),
        F.greatest(q, F.lit(10.0)).alias("qty_hi"),
        F.least(q, F.lit(10.0)).alias("qty_lo"),
    )


@query(
    "conditional_case",
    """
    SELECT
      CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 'high'
           WHEN o_orderpriority = '3-MEDIUM' THEN 'medium'
           ELSE 'low' END AS priority_class,
      COALESCE(NULLIF(o_orderstatus, 'O'), 'open') AS status_text,
      COUNT(*) AS n,
      CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS total
    FROM orders
    GROUP BY 1, 2
    """,
)
def conditional_case(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE/COALESCE/NULLIF (F9) — the same expression family the
    reference's labeling loop lowers to (BytesProcessor.py:326-327)."""
    orders = _t(spark, sf_dir, "orders")
    pr = F.col("o_orderpriority")
    return (
        orders.groupBy(
            F.when(pr.isin("1-URGENT", "2-HIGH"), "high")
            .when(pr == "3-MEDIUM", "medium")
            .otherwise("low")
            .alias("priority_class"),
            F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("open")).alias(
                "status_text"
            ),
        )
        .agg(
            F.count("*").alias("n"),
            (F.sum(cents(F.col("o_totalprice"))).cast("double") / 100.0).alias("total"),
        )
    )


@query(
    "json_funcs",
    """
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           CAST(SUM(CASE WHEN CAST(json_extract_string(props, '$.k') AS BIGINT) > 50
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_big_k
    FROM events
    GROUP BY event_type
    """,
)
def json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction (F8) over the events.props payload column."""
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(k).alias("sum_k"),
        F.sum(F.when(k > 50, 1).otherwise(0)).alias("n_big_k"),
    )


# ---------------------------------------------------------------------------
# Range join (J6) and as-of join (J7)
# ---------------------------------------------------------------------------

@query(
    "range_join_tiers",
    """
    SELECT tier, COUNT(*) AS n,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS total_value
    FROM events
    JOIN (VALUES ('small', 0.0, 9.99), ('medium', 10.0, 49.99), ('large', 50.0, 1e9))
         tiers(tier, lo, hi)
      ON value BETWEEN lo AND hi
    GROUP BY tier
    """,
)
def range_join_tiers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval join of a fact table against a tiny tier dimension —
    broadcast nested-loop, zero shuffle on the fact side (J6; the
    generalization of the reference's time-window labeling)."""
    ev = _t(spark, sf_dir, "events")
    tiers = spark.createDataFrame(
        [("small", 0.0, 9.99), ("medium", 10.0, 49.99), ("large", 50.0, 1e9)],
        "tier string, lo double, hi double",
    )
    joined = range_join(ev, tiers, fact_key="value", dim_lo="lo", dim_hi="hi")
    return joined.groupBy("tier").agg(
        F.count("*").alias("n"),
        (F.sum(cents(F.col("value"))).cast("double") / 100.0).alias("total_value"),
    )


@query(
    "asof_join_events",
    """
    SELECT c.event_id,
           c.user_id,
           p.event_id AS purchase_event_id,
           CAST(ROUND(p.value * 100) AS DOUBLE) / 100.0 AS purchase_value
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON c.user_id = p.user_id AND c.ts >= p.ts
    """,
)
def asof_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (J7): for each click, the user's latest purchase at or
    before it.  Spark plan: tagged union + last(ignorenulls) window —
    one shuffle on user_id, no per-group Python (see operators.joins).
    DuckDB's native ASOF JOIN is the oracle."""
    ev = _t(spark, sf_dir, "events")
    clicks = ev.where(F.col("event_type") == "click")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        F.col("user_id"),
        F.col("ts"),
        F.col("event_id").alias("purchase_event_id"),
        F.col("value").alias("purchase_value"),
    )
    out = asof_join(
        clicks,
        purchases,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        right_cols=["purchase_event_id", "purchase_value"],
    )
    return out.select(
        "event_id",
        "user_id",
        "purchase_event_id",
        (F.round(F.col("purchase_value") * 100).cast("double") / 100.0).alias("purchase_value"),
    )
