"""Round-8 analytics batch.

- S6+ csv_quarantine_scan: the ORACLE row for the tolerant CSV scan
  (VERDICT r7 #4 — the last SQL-expressible pytest-only gap in §2).
  A dirty CSV file is derived DETERMINISTICALLY from the events table
  (every event_id % 7 == 0 row gets a non-numeric value field), read
  back through ``read_csv_tolerant`` (PERMISSIVE + corrupt-record
  capture), and the admit/quarantine accounting per event type —
  including the type parsed back out of the quarantined RAW lines —
  must equal what the oracle computes from the base table's
  arithmetic alone.  This checks the full tolerant-scan contract:
  no row lost, no row double-counted, corrupt capture preserves the
  raw line verbatim.

Reference scope note: the reference engine ends at the labeled packet
table (BytesProcessor.py:121-187); these are EXT rows of the analytics
surface SURVEY §2 declares on top of it.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bytesprocessor_spark.queries import _t, cents, query
from bytesprocessor_spark.sources.tables import read_csv_tolerant


# ---------------------------------------------------------------------------
# S6+: tolerant CSV scan with quarantine accounting
# ---------------------------------------------------------------------------

@query(
    "csv_quarantine_scan",
    """
    WITH e AS (
      SELECT event_type,
             (event_id % 7 = 0) AS quarantined,
             CAST(ROUND(value * 100) AS BIGINT) AS val_c
      FROM events)
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_in,
           CAST(SUM(CASE WHEN quarantined THEN 0 ELSE 1 END) AS BIGINT)
             AS n_admitted,
           CAST(SUM(CASE WHEN quarantined THEN 1 ELSE 0 END) AS BIGINT)
             AS n_quarantined,
           CAST(SUM(CASE WHEN quarantined THEN 0 ELSE val_c END) AS BIGINT)
             AS sum_val_admitted_c
    FROM e GROUP BY event_type ORDER BY event_type
    """,
)
def csv_quarantine_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S6 oracle row: tolerant CSV ingest with quarantine accounting.

    Every events row is serialized to a CSV line; rows with
    ``event_id % 7 == 0`` get a deliberately non-numeric value field
    ("x" prefix), which PERMISSIVE parsing must quarantine (corrupt
    raw line captured, nothing thrown).  The readback then accounts
    per event type: admitted rows from the typed columns, quarantined
    rows by parsing the type back out of the captured raw line — so a
    dropped, duplicated, or mangled corrupt record shows up as a count
    or checksum mismatch against the base-table oracle.

    Scale shape: the scan is one pass (cached across the two splits),
    the gate is row-local, and only the per-type counters shuffle —
    the same ingest posture as the streaming quality gate (ST10), with
    the corrupt-capture contract under test on top.
    """
    ev = _t(spark, sf_dir, "events").select(
        "event_id", "event_type", cents(F.col("value")).alias("val_c")
    )
    val_txt = F.when(
        F.col("event_id") % 7 == 0, F.concat(F.lit("x"), F.col("val_c"))
    ).otherwise(F.col("val_c").cast("string"))
    line = F.concat_ws(",", F.col("event_id"), F.col("event_type"), val_txt)

    workdir = tempfile.mkdtemp(prefix="bp_csvq_")
    handle = None
    try:
        dirty = os.path.join(workdir, "dirty_csv")
        ev.select(line.alias("value")).write.mode("overwrite").text(dirty)
        good, bad, handle = read_csv_tolerant(
            spark,
            dirty,
            "event_id long, event_type string, val_c long",
            with_handle=True,
        )
        adm = good.groupBy("event_type").agg(
            F.count("*").alias("n_admitted"),
            F.sum("val_c").alias("sum_val_admitted_c"),
        )
        quar = (
            bad.select(
                F.split(F.col("_corrupt_record"), ",").getItem(1).alias("event_type")
            )
            .groupBy("event_type")
            .agg(F.count("*").alias("n_quarantined"))
        )
        out = (
            adm.join(quar, "event_type", "full_outer")
            .select(
                "event_type",
                (
                    F.coalesce(F.col("n_admitted"), F.lit(0))
                    + F.coalesce(F.col("n_quarantined"), F.lit(0))
                ).alias("n_in"),
                F.coalesce(F.col("n_admitted"), F.lit(0)).alias("n_admitted"),
                F.coalesce(F.col("n_quarantined"), F.lit(0)).alias("n_quarantined"),
                F.coalesce(F.col("sum_val_admitted_c"), F.lit(0)).alias(
                    "sum_val_admitted_c"
                ),
            )
            .orderBy("event_type")
        )
        # bounded result (one row per event type) — localize so the
        # temp dir can be deleted and the cached scan released now
        return spark.createDataFrame(out.collect(), out.schema)
    finally:
        if handle is not None:
            handle.unpersist()
        shutil.rmtree(workdir, ignore_errors=True)
