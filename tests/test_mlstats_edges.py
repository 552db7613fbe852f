"""Edge cases for the round-6 mlstats entries, found in review:

- events_holt_winters on a series SHORTER than the 7-slot season: the
  Spark replay's forecast index went negative (Python wrap / IndexError)
  where the oracle's list index yields NULL — both sides now fall back
  to a 0 seasonal term; this test replays the entry cross-engine on a
  synthesized table with 3-day and 10-day series.
- txn_vacuum retention: min_age_seconds protects an in-flight writer's
  landed-but-uncommitted data; keep_versions < 1 is rejected.
"""

import importlib.util
from pathlib import Path

import duckdb
import pytest
from pyspark.sql import functions as F

_spec = importlib.util.spec_from_file_location(
    "check_oracle_edges",
    Path(__file__).resolve().parents[1] / "tools" / "check_oracle.py",
)
_co = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_co)


def test_holt_winters_short_series_matches_oracle(spark, tmp_path):
    """One event type with only 3 days of data (shorter than the
    season) next to a 10-day type — both engines must agree."""
    from bytesprocessor_spark.queries import ORACLE, QUERIES

    d = str(tmp_path)
    rows = []
    eid = 0
    for day in range(3):  # 'tiny' series: 3 days
        rows.append((eid, f"2024-01-{day + 1:02d} 10:00:00", 1, "tiny", 7.5, "{}"))
        eid += 1
    for day in range(10):  # 'full' series: 10 days (> season)
        rows.append((eid, f"2024-01-{day + 1:02d} 12:00:00", 2, "full", 3.25, "{}"))
        eid += 1
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    ev.write.parquet(f"{d}/events.parquet")

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{d}/events.parquet/*.parquet')"
    )
    duck = con.execute(ORACLE["events_holt_winters"]).fetchdf()
    sdf = QUERIES["events_holt_winters"](spark, d).toPandas()
    duck_cols, duck_rows = _co._pdf_rows(duck)
    spark_cols, spark_rows = _co._pdf_rows(sdf)
    problems = _co.compare(
        "events_holt_winters", spark_cols, spark_rows, duck_cols, duck_rows
    )
    assert not problems, "\n".join(problems)
    assert len(spark_rows) == 14  # 2 types x 7 horizons


def test_vacuum_min_age_protects_young_dirs(spark, tmp_path):
    from bytesprocessor_spark.sources.txnlog import (
        txn_read,
        txn_vacuum,
        txn_write,
    )

    t = str(tmp_path / "tbl")
    txn_write(spark.range(5), t, mode="append")
    txn_write(spark.range(5, 8), t, mode="overwrite")
    # young unreferenced dir survives a retention-window vacuum ...
    stats = txn_vacuum(t, keep_versions=1, min_age_seconds=3600)
    assert stats["removed_files"] == 0
    # ... and is reclaimed once the window is waived
    stats = txn_vacuum(t, keep_versions=1, min_age_seconds=0)
    assert stats["removed_files"] == 1
    assert txn_read(spark, t).count() == 3


def test_vacuum_rejects_keep_versions_zero(spark, tmp_path):
    from bytesprocessor_spark.sources.txnlog import txn_vacuum, txn_write

    t = str(tmp_path / "tbl")
    txn_write(spark.range(3), t)
    with pytest.raises(ValueError):
        txn_vacuum(t, keep_versions=0)
