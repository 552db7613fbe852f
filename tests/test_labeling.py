"""Labeling operator semantics (SURVEY §3.4: precedence, direction
rules, fixed reference bugs) + the join-based variant's equivalence.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bytesprocessor_spark.operators.labeling import (
    AttackSpec,
    attacks_to_df,
    extract_ranges,
    label_attacks,
    label_attacks_join,
)

PACKETS = [
    # (ts, src, dst) — designed around two overlapping windows
    (100.0, "a1", "v1"),   # alpha window, attacker->victim
    (100.0, "v1", "a1"),   # alpha window, reverse (bidirectional rule)
    (150.0, "a1", "x1"),   # alpha+beta overlap, src-only beta wins (later in list)
    (150.0, "a2", "v1"),   # overlap, matches alpha only (a2 not beta attacker)
    (210.0, "x1", "v9"),   # gamma window, victim-only rule
    (210.0, "v9", "x1"),   # gamma window, wrong direction (dst!=v9)
    (300.0, "a1", "v1"),   # outside all windows
    (100.0, "x1", "x2"),   # in-window bystander
]

ATTACKS = (
    AttackSpec(50.0, 180.0, "alpha", attacker_ips=("a1", "a2"), victim_ips=("v1",)),
    AttackSpec(140.0, 180.0, "beta", attacker_ips=("a1",)),
    AttackSpec(200.0, 250.0, "gamma", victim_ips=("v9",)),
)


@pytest.fixture(scope="module")
def packets_df(spark):
    return spark.createDataFrame(
        PACKETS, "timestamp double, src_ip string, dst_ip string"
    )


def expected_labels():
    return [
        ("a1", "v1", 100.0, "alpha", True),
        ("v1", "a1", 100.0, "alpha", False),
        ("a1", "x1", 150.0, "beta", True),   # last-wins over alpha? (alpha needs dst v1 — only beta matches)
        ("a2", "v1", 150.0, "alpha", True),  # beta window but a2 not beta attacker; fwd via alpha
        ("x1", "v9", 210.0, "gamma", False),  # victim-only labels, NO forward (fixed KeyError)
        ("v9", "x1", 210.0, "benign", False),
        ("a1", "v1", 300.0, "benign", False),
        ("x1", "x2", 100.0, "benign", False),
    ]


def test_label_attacks_semantics(packets_df):
    out = label_attacks(packets_df, ATTACKS).collect()
    got = {(r.src_ip, r.dst_ip, r.timestamp): (r.label, r.is_forward) for r in out}
    for src, dst, ts, label, fwd in expected_labels():
        assert got[(src, dst, ts)] == (label, fwd), (src, dst, ts)


def test_last_wins_precedence(spark):
    """Overlapping attacks: the LAST list entry must win
    (BytesProcessor.py:326-327)."""
    df = spark.createDataFrame([(10.0, "a", "v")], "timestamp double, src_ip string, dst_ip string")
    attacks = (
        AttackSpec(0.0, 20.0, "first", attacker_ips=("a",), victim_ips=("v",)),
        AttackSpec(5.0, 15.0, "second", attacker_ips=("a",), victim_ips=("v",)),
    )
    assert label_attacks(df, attacks).first().label == "second"
    # and in reverse declaration order
    assert label_attacks(df, attacks[::-1]).first().label == "first"


def test_empty_attack_list_is_noop(packets_df):
    out = label_attacks(packets_df, ()).collect()
    assert all(r.label == "benign" and r.is_forward is False for r in out)


def test_boundaries_inclusive(spark):
    """between() is inclusive at both ends (BytesProcessor.py:298,349)."""
    df = spark.createDataFrame(
        [(50.0, "a1", "v1"), (180.0, "a1", "v1"), (180.0000001, "a1", "v1")],
        "timestamp double, src_ip string, dst_ip string",
    )
    out = label_attacks(df, ATTACKS[:1]).orderBy("timestamp").collect()
    assert [r.label for r in out] == ["alpha", "alpha", "benign"]


def test_join_variant_matches_expression_variant(spark, packets_df):
    """label_attacks_join (broadcast non-equi join + max-idx pick) must
    agree with the when-chain on every row, including precedence."""
    expr_out = label_attacks(packets_df, ATTACKS)
    join_out = label_attacks_join(packets_df, attacks_to_df(spark, ATTACKS))
    cols = ["timestamp", "src_ip", "dst_ip", "label", "is_forward"]
    assert sorted(map(tuple, expr_out.select(cols).collect())) == sorted(
        map(tuple, join_out.select(cols).collect())
    )


def test_extract_ranges(spark):
    df = spark.createDataFrame([(float(t),) for t in range(0, 100, 10)], "timestamp double")
    out = extract_ranges(df, [(10, 30), (70, 80)])
    assert sorted(r.timestamp for r in out.collect()) == [10.0, 20.0, 30.0, 70.0, 80.0]
    # empty ranges -> no-op (reference crashed, SURVEY §3.4.3)
    assert extract_ranges(df, []).count() == 10


def test_extract_ranges_pushdown(spark, tmp_path):
    """The OR-of-between predicate must reach the parquet scan."""
    p = str(tmp_path / "t.parquet")
    spark.createDataFrame([(float(t),) for t in range(100)], "timestamp double").write.parquet(p)
    plan = extract_ranges(spark.read.parquet(p), [(10, 20)])._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "GreaterThanOrEqual(timestamp,10.0)" in plan
