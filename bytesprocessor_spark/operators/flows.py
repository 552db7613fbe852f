"""Flow aggregation over parsed packets — netflow-style records from
the pcap pipeline's output (the natural next analytics step over the
reference's packet table; BytesProcessor emits packets only).

A *flow* is the classic 5-tuple (src_ip, dst_ip, src_port, dst_port,
protocol); a *biflow* canonicalizes the two endpoints so both
directions of a conversation land in one record with per-direction
counters.  An idle ``gap_seconds`` splits long-lived 5-tuples into
separate flow records — expressed as Spark's ``session_window``, so
the split is a single hash aggregation (partial + final, no window
sort) and works identically in Structured Streaming under a watermark.

Scale posture: one shuffle keyed on the flow tuple; counters are
map-side-combined partials.  Hot flows (one elephant 5-tuple) are the
skew case — compose with operators/skew.py:salted_aggregate when a
capture is dominated by a single conversation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_KEY = ["src_ip", "dst_ip", "src_port", "dst_port", "protocol"]


def _flow_aggs() -> list[F.Column]:
    return [
        F.count("*").alias("n_packets"),
        F.sum(F.length("payload")).alias("n_bytes"),
        F.min("timestamp").alias("t_first"),
        F.max("timestamp").alias("t_last"),
        (F.max("timestamp") - F.min("timestamp")).alias("duration"),
    ]


def flow_stats(packets: DataFrame, gap_seconds: float | None = None) -> DataFrame:
    """Unidirectional flow records keyed on the 5-tuple; with
    ``gap_seconds`` set, a 5-tuple idle for longer than the gap starts
    a new flow record (session semantics)."""
    if gap_seconds is None:
        return packets.groupBy(*_KEY).agg(*_flow_aggs())
    ts = F.timestamp_seconds(F.col("timestamp"))
    return (
        packets.groupBy(
            F.session_window(ts, f"{gap_seconds} seconds").alias("w"), *_KEY
        )
        .agg(*_flow_aggs())
        .drop("w")
    )


def biflow_stats(packets: DataFrame, gap_seconds: float | None = None) -> DataFrame:
    """Bidirectional conversation records: endpoints are ordered
    canonically ((ip, port) lexicographic min first -> ep_a/ep_b), the
    per-packet direction is retained, and counters split into
    forward (a->b) / reverse (b->a).  The canonical key means both
    directions hash to the same reducer — one shuffle, one record."""
    a_first = (F.col("src_ip") < F.col("dst_ip")) | (
        (F.col("src_ip") == F.col("dst_ip")) & (F.col("src_port") <= F.col("dst_port"))
    )
    oriented = packets.select(
        F.when(a_first, F.col("src_ip")).otherwise(F.col("dst_ip")).alias("ip_a"),
        F.when(a_first, F.col("dst_ip")).otherwise(F.col("src_ip")).alias("ip_b"),
        F.when(a_first, F.col("src_port")).otherwise(F.col("dst_port")).alias("port_a"),
        F.when(a_first, F.col("dst_port")).otherwise(F.col("src_port")).alias("port_b"),
        "protocol",
        a_first.alias("is_fwd"),
        "timestamp",
        "payload",
    )
    keys = ["ip_a", "ip_b", "port_a", "port_b", "protocol"]
    aggs = [
        F.count("*").alias("n_packets"),
        F.sum(F.col("is_fwd").cast("long")).alias("n_fwd"),
        F.sum((~F.col("is_fwd")).cast("long")).alias("n_rev"),
        F.sum(F.length("payload")).alias("n_bytes"),
        F.sum(F.when(F.col("is_fwd"), F.length("payload")).otherwise(0)).alias("bytes_fwd"),
        F.sum(F.when(~F.col("is_fwd"), F.length("payload")).otherwise(0)).alias("bytes_rev"),
        F.min("timestamp").alias("t_first"),
        F.max("timestamp").alias("t_last"),
    ]
    if gap_seconds is None:
        return oriented.groupBy(*keys).agg(*aggs)
    ts = F.timestamp_seconds(F.col("timestamp"))
    return (
        oriented.groupBy(F.session_window(ts, f"{gap_seconds} seconds").alias("w"), *keys)
        .agg(*aggs)
        .drop("w")
    )
