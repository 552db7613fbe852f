from bytesprocessor_spark.streaming.windows import (
    session_agg,
    sliding_agg,
    stream_dedup,
    tumbling_agg,
)
from bytesprocessor_spark.streaming.pcap_stream import stream_pcap_directory
from bytesprocessor_spark.streaming.stateful import running_totals, topk_per_key
from bytesprocessor_spark.streaming.joins import interval_join, stream_static_enrich
from bytesprocessor_spark.streaming.cdc import (
    apply_cdc_stream,
    init_cdc_table,
    read_cdc_table,
)

__all__ = [
    "apply_cdc_stream",
    "init_cdc_table",
    "read_cdc_table",
    "session_agg",
    "sliding_agg",
    "stream_dedup",
    "tumbling_agg",
    "stream_pcap_directory",
    "running_totals",
    "topk_per_key",
    "interval_join",
    "stream_static_enrich",
]
