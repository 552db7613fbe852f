"""Invariant tests for the event-analytics operators (W6 funnel, W7
interval concurrency) — properties that must hold on ANY input, checked
on the sf0.001 fixture tables; exact values are pinned by the DuckDB
oracle rows, so these guard the semantic shape, not constants."""

from __future__ import annotations

from pyspark.sql import functions as F

from bytesprocessor_spark.queries import QUERIES
from bytesprocessor_spark.sources.tables import load_table
from tests.conftest import SF_DIR


def test_funnel_steps_monotone_nonincreasing(spark):
    row = QUERIES["events_funnel"](spark, SF_DIR).collect()[0]
    assert row.step1_view >= row.step2_click >= row.step3_purchase >= 0


def test_funnel_step1_matches_distinct_viewers(spark):
    ev = load_table(spark, SF_DIR, "events")
    viewers = (
        ev.where(F.col("event_type") == "view").select("user_id").distinct().count()
    )
    row = QUERIES["events_funnel"](spark, SF_DIR).collect()[0]
    assert row.step1_view == viewers


def test_concurrency_peak_bounds(spark):
    """1 <= daily peak <= number of intervals touching that day, and
    every day with an event appears exactly once."""
    ev = load_table(spark, SF_DIR, "events")
    per_day_events = dict(
        ev.select(F.date_format("ts", "yyyy-MM-dd").alias("day"))
        .groupBy("day")
        .count()
        .collect()
    )
    rows = QUERIES["interval_concurrency"](spark, SF_DIR).collect()
    days_out = {r.day for r in rows}
    assert set(per_day_events) <= days_out  # every event day has a peak
    from datetime import date, timedelta

    for r in rows:
        # Intervals are 10 minutes (< 1 day), so everything open on day D
        # started on D or spilled over from D-1: peak <= starts(D) +
        # starts(D-1).  A day in the output with zero starts exists only
        # as spill-over, so the lower bound stays 1 either way.
        d = date.fromisoformat(r.day)
        prev = (d - timedelta(days=1)).isoformat()
        upper = per_day_events.get(r.day, 0) + per_day_events.get(prev, 0)
        assert 1 <= r.peak_concurrent <= upper


def test_concurrency_single_interval_is_one(spark):
    """A lone interval must yield peak 1 on its day (sanity of the
    +1/-1 ordering: close-before-open must not zero it out)."""
    df = spark.createDataFrame(
        [(1, "2024-03-01 10:00:00")], "event_id long, ts string"
    ).select("event_id", F.col("ts").cast("timestamp").alias("ts"))
    # reusing the registered query on a temp dir is not possible (it
    # loads parquet), so replicate the sweep inline on one interval
    # through the same public expressions
    iv = df.select(
        F.col("ts").alias("s"), (F.col("ts") + F.expr("INTERVAL 10 MINUTES")).alias("e")
    )
    days = iv.select(
        "s", "e",
        F.explode(
            F.sequence(
                F.date_trunc("day", F.col("s")),
                F.date_trunc("day", F.col("e")),
                F.expr("INTERVAL 1 DAY"),
            )
        ).alias("day"),
    )
    clipped = days.select(
        "day",
        F.greatest("s", "day").alias("t_start"),
        F.least(F.col("e"), F.col("day") + F.expr("INTERVAL 1 DAY")).alias("t_end"),
    ).where(F.col("t_start") < F.col("t_end"))
    pts = clipped.select("day", F.col("t_start").alias("t"), F.lit(1).alias("delta")).unionAll(
        clipped.select("day", F.col("t_end").alias("t"), F.lit(-1).alias("delta"))
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy("day")
        .orderBy("t", "delta")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    peak = (
        pts.withColumn("r", F.sum("delta").over(w))
        .agg(F.max("r").alias("p"))
        .collect()[0]
        .p
    )
    assert peak == 1


def test_length_batches_invariants(spark):
    """Every batch holds <= batch_size rows; batches partition the
    corpus; sorted batching's padding waste is no worse than the
    unsorted upper bound (n_rows * (corpus_max - corpus_min))."""
    import random

    from bytesprocessor_spark.operators.packing import length_batches

    rng = random.Random(5)
    rows = [(i, rng.randint(10, 500)) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, n_chars long")
    out = length_batches(df, "n_chars", batch_size=32).collect()
    assert sum(r.n_rows for r in out) == 300
    assert all(r.n_rows <= 32 for r in out)
    assert all(r.padding_waste >= 0 for r in out)
    lens = [l for _, l in rows]
    assert sum(r.padding_waste for r in out) <= len(rows) * (max(lens) - min(lens))


def test_asof_join_rejects_mixed_ts_types(spark):
    """A timestamp side resolves __t to epoch micros while a numeric
    side keeps its raw scale, so a mixed pair would silently match
    wrong rows — the operator must refuse it up front."""
    import pytest

    from bytesprocessor_spark.operators.joins import asof_join

    left = spark.createDataFrame(
        [(1, "2024-01-01 00:00:10")], "k long, ts string"
    ).select("k", F.col("ts").cast("timestamp").alias("ts"))
    right = spark.createDataFrame([(1, 5.0, "x")], "k long, t double, v string")
    with pytest.raises(TypeError, match="mixed ts column types"):
        asof_join(left, right, on="k", left_ts="ts", right_ts="t")


def test_read_parquet_quarantine_skips_corrupt_and_names_it(spark, tmp_path):
    """S14: a directory with two healthy parquet files and one
    truncated one reads tolerantly — all healthy rows survive, and the
    audit names exactly the corrupt file."""
    from bytesprocessor_spark.sources.tables import read_parquet_quarantine

    d = tmp_path / "tbl"
    d.mkdir()
    spark.range(0, 50).write.parquet(str(d / "ignore_me"))  # build rows
    import shutil

    # two healthy single-file parquet parts
    for i, lo in enumerate((0, 50)):
        part = tmp_path / f"part{i}"
        spark.range(lo, lo + 50).coalesce(1).write.mode("overwrite").parquet(str(part))
        src = next(p for p in part.iterdir() if p.name.endswith(".parquet"))
        shutil.copy(src, d / f"good-{i}.parquet")
    shutil.rmtree(d / "ignore_me")
    # one corrupt: valid parquet magic, garbage after
    (d / "bad-0.parquet").write_bytes(b"PAR1" + b"\x00" * 64)

    rows, audit = read_parquet_quarantine(spark, str(d))
    got = sorted(r.id for r in rows.collect())
    assert got == list(range(100))
    a = {r.file_name: r.is_quarantined for r in audit.collect()}
    assert a == {"good-0.parquet": False, "good-1.parquet": False, "bad-0.parquet": True}
