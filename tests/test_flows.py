"""Flow aggregation tests over the fixture capture."""

from __future__ import annotations

from pyspark.sql import functions as F

from bytesprocessor_spark.operators.flows import biflow_stats, flow_stats
from bytesprocessor_spark.plans.explain import shuffle_count
from bytesprocessor_spark.sources.pcap import read_pcap

from tests.test_pcap import make_fixture_pcap


def _packets(spark, tmp_path):
    p = str(tmp_path / "f.pcap")
    make_fixture_pcap(p)
    return read_pcap(spark, p)


def test_flow_stats_five_tuple(spark, tmp_path):
    pk = _packets(spark, tmp_path)
    flows = flow_stats(pk)
    # plan gate BEFORE execution (AQE's post-run plan prints shuffle
    # nodes a second time as query stages)
    assert shuffle_count(flows) == 1
    rows = {(r.src_ip, r.dst_ip, r.src_port, r.dst_port, r.protocol): r for r in flows.collect()}
    # packets 0 and 3 share the exact 5-tuple (10.0.0.1 -> 10.0.0.2 tcp 1234->80)
    key = ("10.0.0.1", "10.0.0.2", 1234, 80, "6")
    assert rows[key].n_packets == 2
    assert rows[key].t_first == 1000.5 and rows[key].t_last == 5000.0
    assert rows[key].duration == 3999.5
    assert sum(r.n_packets for r in rows.values()) == 9


def test_flow_stats_gap_splits_idle_tuple(spark, tmp_path):
    pk = _packets(spark, tmp_path)
    flows = flow_stats(pk, gap_seconds=60.0)
    hits = [
        r
        for r in flows.collect()
        if (r.src_ip, r.dst_ip, r.src_port, r.dst_port) == ("10.0.0.1", "10.0.0.2", 1234, 80)
    ]
    # the 1000.5 and 5000.0 packets are > 60s apart -> two flow records
    assert sorted(r.n_packets for r in hits) == [1, 1]


def test_biflow_merges_directions(spark, tmp_path):
    pk = _packets(spark, tmp_path)
    bi = biflow_stats(pk)
    rows = {(r.ip_a, r.ip_b, r.port_a, r.port_b): r for r in bi.collect()}
    # packets 0 (1234->80) and 1 (80->1234) are one conversation;
    # canonical endpoint a = (10.0.0.1, 1234) since ip breaks the tie
    conv = rows[("10.0.0.1", "10.0.0.2", 1234, 80)]
    assert conv.n_packets == 3  # pkts 0, 1, 3
    assert conv.n_fwd == 2 and conv.n_rev == 1
    assert conv.bytes_fwd > 0 and conv.bytes_rev > 0
    assert conv.t_first == 1000.5


def test_flow_oracle_rows_conserve_packets(spark):
    """flow_aggregate / biflow_aggregate (A9 oracle rows): session
    splitting and endpoint canonicalization must CONSERVE packets and
    bytes — every input packet lands in exactly one flow and one
    conversation, and biflow fwd+rev counters partition the packets."""
    from bytesprocessor_spark.queries import QUERIES

    sf = "/root/testdata/sf0.001"
    n_events = spark.read.parquet(f"{sf}/events.parquet").count()

    flows = QUERIES["flow_aggregate"](spark, sf).collect()
    assert sum(r.n_packets for r in flows) == n_events
    assert all(r.n_flows >= 1 and r.t_first_s <= r.t_last_s for r in flows)

    bi = QUERIES["biflow_aggregate"](spark, sf).collect()
    assert sum(r.n_packets for r in bi) == n_events
    for r in bi:
        assert r.n_fwd + r.n_rev == r.n_packets
        assert r.ip_a <= r.ip_b  # canonical endpoint order
    # both rollups see the same total byte mass
    from pyspark.sql import functions as F  # noqa: F401

    assert sum(r.bytes_fwd + r.bytes_rev for r in bi) == sum(
        r.n_bytes for r in flows
    )
