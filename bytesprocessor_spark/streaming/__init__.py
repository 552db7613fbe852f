from bytesprocessor_spark.streaming.windows import (
    session_agg,
    sliding_agg,
    stream_dedup,
    tumbling_agg,
)
from bytesprocessor_spark.streaming.pcap_stream import stream_pcap_directory

__all__ = [
    "session_agg",
    "sliding_agg",
    "stream_dedup",
    "tumbling_agg",
    "stream_pcap_directory",
]
