"""UDF-surface and SQL-passthrough queries (SURVEY §2.10 U3-U5, §2.4
A4 grouping sets, §2.7 F7/F8).

Python-boundary determinism: every pandas UDF here reduces integers
(cents / basis points) with the exact-sum formulas, so results are
independent of the arbitrary row order Spark delivers groups in — the
same discipline the rest of the corpus applies to shuffles.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bytesprocessor_spark.queries import query, cents, _t


@query(
    "grouping_sets_sql",
    """
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
           CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
)
def grouping_sets_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 grouping sets through the SQL surface (spark.sql over a temp
    view — Catalyst plans it identically to the DataFrame form)."""
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
               CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_qty
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


@query(
    "array_map_funcs",
    """
    SELECT vec_id,
           len(embedding) AS dim,
           ROUND(CAST(embedding[1] AS DOUBLE), 6) AS first_val,
           len(list_filter(embedding, x -> x > 0)) AS n_positive,
           ROUND(list_aggregate(list_transform(embedding,
                 x -> round(CAST(x AS DOUBLE) * 1000000)), 'sum') / 1000000.0, 6) AS sum_q,
           list_contains(list_transform(embedding, x -> x > 0.5), TRUE) AS any_big
    FROM embeddings
    """,
)
def array_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F7 higher-order array functions (size/element_at/filter/
    transform/aggregate/contains) — sums on fixed-point ints so the
    fold order can't matter."""
    emb = _t(spark, sf_dir, "embeddings")
    e = F.col("embedding")
    return emb.select(
        "vec_id",
        F.size(e).alias("dim"),
        F.round(F.element_at(e, 1).cast("double"), 6).alias("first_val"),
        F.size(F.filter(e, lambda x: x > 0)).alias("n_positive"),
        F.round(
            F.aggregate(
                F.transform(e, lambda x: F.round(x.cast("double") * 1000000.0)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            / 1000000.0,
            6,
        ).alias("sum_q"),
        F.array_contains(F.transform(e, lambda x: x > 0.5), True).alias("any_big"),
    )


@query(
    "from_json_funcs",
    """
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
           CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_mod
    FROM events
    WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) IS NOT NULL
    """,
)
def from_json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F8 structured JSON parsing: from_json with an explicit schema
    (vs json_funcs' path extraction)."""
    ev = _t(spark, sf_dir, "events")
    parsed = ev.withColumn("j", F.from_json("props", "k BIGINT"))
    return parsed.where(F.col("j.k").isNotNull()).select(
        "event_id",
        F.col("j.k").alias("k"),
        (F.col("j.k") % 10).alias("k_mod"),
    )


@query(
    "grouped_zscore_udf",
    """
    WITH s AS (
      SELECT event_type,
             COUNT(*) AS n,
             SUM(CAST(ROUND(value * 100) AS BIGINT)) AS s1,
             SUM(CAST(ROUND(value * 100) AS BIGINT) * CAST(ROUND(value * 100) AS BIGINT)) AS s2
      FROM events GROUP BY event_type
    )
    SELECT e.event_id, e.event_type,
           ROUND((CAST(ROUND(e.value * 100) AS BIGINT) - CAST(s.s1 AS DOUBLE) / s.n)
                 / SQRT((CAST(s.s2 AS DOUBLE) - CAST(s.s1 AS DOUBLE) * CAST(s.s1 AS DOUBLE) / s.n)
                        / (s.n - 1)), 6) AS zscore
    FROM events e JOIN s USING (event_type)
    """,
)
def grouped_zscore_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U3 grouped-map: per-event-type standardization via
    applyInPandas.  The UDF reduces exact integer sums (s1, s2) so its
    output is row-order independent and matches the SQL oracle's
    closed-form bit for bit."""
    ev = _t(spark, sf_dir, "events").select(
        "event_id", "event_type", cents(F.col("value")).alias("vc")
    )

    def standardize(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        s1 = int(pdf["vc"].sum())
        s2 = int((pdf["vc"] * pdf["vc"]).sum())
        mean = s1 / n
        var = (s2 - s1 * s1 / n) / (n - 1) if n > 1 else float("nan")
        z = (pdf["vc"] - mean) / (var ** 0.5)
        return pd.DataFrame(
            {"event_id": pdf["event_id"], "event_type": pdf["event_type"], "zscore": z.round(6)}
        )

    return ev.groupBy("event_type").applyInPandas(
        standardize, schema="event_id long, event_type string, zscore double"
    )


@query(
    "grouped_wmean_udaf",
    """
    SELECT event_type,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)
                    * CAST(json_extract_string(props, '$.k') AS BIGINT)) AS DOUBLE)
             / SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) / 100.0 AS wmean_value
    FROM events
    GROUP BY event_type
    """,
)
def grouped_wmean_udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U4 custom aggregate: k-weighted mean event value as a pandas
    grouped-agg UDF over exact integers."""
    ev = _t(spark, sf_dir, "events").select(
        "event_type",
        cents(F.col("value")).alias("vc"),
        F.get_json_object("props", "$.k").cast("long").alias("w"),
    )

    @F.pandas_udf("double")
    def wmean(v: pd.Series, w: pd.Series) -> float:
        num = int((v * w).sum())
        den = int(w.sum())
        return num / den / 100.0 if den else float("nan")

    return ev.groupBy("event_type").agg(wmean("vc", "w").alias("wmean_value"))


@query(
    "udtf_chunk_ranges",
    """
    SELECT i AS chunk_id, i * 700 AS start, LEAST((i + 1) * 700, 10000) AS "end"
    FROM range(0, 15) t(i)
    """,
)
def udtf_chunk_ranges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U5 SQL UDTF: the chunk-range generator (the SQL face of the pcap
    record indexer) called from SQL."""
    from bytesprocessor_spark.operators.grouped import register_range_udtf

    register_range_udtf(spark)
    return spark.sql("SELECT * FROM chunk_ranges(0, 10000, 700)")
