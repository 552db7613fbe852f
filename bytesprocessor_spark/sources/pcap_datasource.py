"""Spark 4 Python DataSource for pcap files (SURVEY §7 step 8).

Makes the record-offset split reader a first-class source:

    spark.dataSource.register(PcapDataSource)
    df = spark.read.format("pcap").option("split_packets", 50000).load(path)

Planning mirrors :func:`bytesprocessor_spark.sources.pcap.read_pcap_split`:

  * ``partitions()`` (driver): header-walk each file's record index —
    16 bytes read + one seek per record, no payload ever loaded — and
    emit one InputPartition per ~``split_packets``-record byte range.
  * ``read(partition)`` (executor): range-read [offset, offset+length)
    and parse with the shared frame parser.

Object-storage posture: both the header walk and the range read only
need ``open() -> seek/read`` semantics, i.e. exactly what an S3-style
ranged GET provides.  Swapping ``open(path, "rb")`` for an
fsspec/boto3 ranged reader makes this source cloud-native with no
change to planning: partitions are (path, offset, length) triples
either way, so executors issue one bounded GET per chunk and never
hold a whole capture in memory.  (The container has no object-store
client, so the local-file opener is the one wired in; the seam is
``_open_range``.)

The reference reads captures serially in chunked batches
(BytesProcessor.py:62-81, 196-205); this source is the distributed
equivalent with no duplicate-tail bug (SURVEY §3.4.4).
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from bytesprocessor_spark.sources.pcap import (
    PACKET_SCHEMA,
    index_capture_chunks,
    iter_chunk_records,
    parse_frame,
)

_COL_ORDER = [f.name for f in PACKET_SCHEMA.fields]


class PcapChunk(InputPartition):
    """One byte-range of whole capture records (classic pcap or pcapng
    blocks): the unit of parallelism."""

    def __init__(
        self, path: str, offset: int, length: int, endian: str, frac_div: float, meta: str = ""
    ):
        self.path = path
        self.offset = offset
        self.length = length
        self.endian = endian
        self.frac_div = frac_div
        self.meta = meta


def _open_range(path: str, offset: int, length: int) -> bytes:
    """Bounded range read — the single seam to replace with an
    object-store ranged GET (fsspec: ``fs.cat_file(path, offset,
    offset+length)``)."""
    with open(path, "rb") as f:
        f.seek(offset)
        return f.read(length)


def _resolve_paths(path: str) -> list[str]:
    import glob
    import os

    if os.path.isdir(path):
        return sorted(
            glob.glob(os.path.join(path, "*.pcap")) + glob.glob(os.path.join(path, "*.pcapng"))
        )
    return sorted(glob.glob(path)) or [path]


class PcapReader(DataSourceReader):
    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("pcap source requires a path: .load('/data/*.pcap')")
        self.split_packets = int(options.get("split_packets", 100_000))
        # opt-in extended protocol parse (ICMP/ICMPv6/SCTP/IPv6)
        self.extended = str(options.get("extended", "false")).lower() == "true"

    def partitions(self) -> Sequence[PcapChunk]:
        parts = [
            PcapChunk(*chunk)
            for p in _resolve_paths(self.path)
            for chunk in index_capture_chunks(p, self.split_packets)
        ]
        # Spark requires >= 1 partition; an empty capture yields no rows.
        return parts or [PcapChunk(self.path, 0, 0, "<", 1e6)]

    def read(self, partition: PcapChunk) -> Iterator[tuple]:
        if partition.length <= 0:
            return
        data = _open_range(partition.path, partition.offset, partition.length)
        for ts, frame in iter_chunk_records(
            data, partition.endian, partition.frac_div, getattr(partition, "meta", "")
        ):
            try:
                row = parse_frame(ts, frame, self.extended)
            except Exception:
                continue
            if row is not None:
                yield tuple(row[c] for c in _COL_ORDER)


class PcapDataSource(DataSource):
    """``spark.read.format("pcap")`` — see module docstring."""

    @classmethod
    def name(cls) -> str:
        return "pcap"

    def schema(self):
        return PACKET_SCHEMA

    def reader(self, schema) -> PcapReader:
        return PcapReader(self.options)
