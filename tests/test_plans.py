"""Plan-quality regression tests (SURVEY §4): the 100 TB failure mode
is a silent extra shuffle or a lost pushdown, so the physical-plan
properties of the headline queries are pinned here."""

from __future__ import annotations

from bytesprocessor_spark.plans.explain import (
    assert_plan,
    pushed_filters,
    scan_columns,
    shuffle_count,
)
from bytesprocessor_spark.queries import QUERIES
from tests.conftest import SF_DIR


def test_q1_single_shuffle_with_pushdown(spark):
    df = QUERIES["q1_pricing_summary"](spark, SF_DIR)
    assert shuffle_count(df) == 1  # partial+final agg only
    assert any("LessThanOrEqual(l_shipdate" in p for p in pushed_filters(df))


def test_q3_broadcasts_and_prunes(spark):
    df = QUERIES["q3_shipping_priority"](spark, SF_DIR)
    assert_plan(df, requires_broadcast=True, forbid_cartesian=True)
    cols = scan_columns(df)
    assert all(len(c) <= 4 for c in cols)  # no scan reads full tables


def test_asof_join_single_shuffle(spark):
    df = QUERIES["asof_join_events"](spark, SF_DIR)
    assert shuffle_count(df) <= 1  # union + one window partitioning


def test_range_join_broadcasts(spark):
    df = QUERIES["range_join_tiers"](spark, SF_DIR)
    assert_plan(df, requires_broadcast=True)


def test_label_parity_no_join_no_shuffle_before_agg(spark):
    """Labeling is a pure expression — exactly the aggregation shuffle,
    no join operator in the plan."""
    df = QUERIES["label_attacks_parity"](spark, SF_DIR)
    assert shuffle_count(df) == 1
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan


def test_extract_ranges_pushdown_on_parquet(spark):
    df = QUERIES["extract_ranges_parity"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # disjunctive between-filter exists pre-scan (computed column, so
    # it is a post-scan filter here, but only over projected columns)
    assert "Filter" in plan
    assert all(len(c) <= 3 for c in scan_columns(df))