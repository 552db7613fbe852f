"""Avro Object Container File source/sink, implemented in-repo.

This container image ships no ``spark-avro`` jar and has no network, so
the Avro datasource is built here from the PUBLIC Apache Avro 1.12
specification (container-file + binary-encoding chapters), the same way
``sources/pcap.py`` builds the pcap/pcapng formats from their public
specs.  Parity row: SURVEY §2 S20 (format-matrix closure next to
parquet S5, ORC S19, CSV/JSONL S6, WebDataset S12); the reference ETL
(BytesProcessor.py:1, pandas/dpkt pipeline) emits parquet only — Avro
is part of the "every mainstream format a migrating user expects"
surface, not a reference-specific behavior.

Supported schema surface (covers every fixture table):
``long``/``int`` -> long, ``double``/``float`` -> double, ``string``,
``binary`` -> bytes, ``boolean``; nullable columns become the standard
``["null", T]`` union.  Codecs: ``null`` and ``deflate`` (raw RFC 1951
via zlib, per spec).

Execution model
---------------
* ``write_avro(df, path)`` is distributed: ``mapInPandas`` encodes each
  Spark partition into ONE container file (one Avro block per Arrow
  batch), so write parallelism equals partition count and no rows ever
  collect to the driver.  The returned one-row-per-file manifest is the
  write receipt (collect it to force the job; k = #partitions rows).
* ``read_avro(spark, path, schema)`` lists the part files (driver-side
  listing of a bounded file manifest, exactly like Spark's own file
  index), distributes one file per task, and decodes with
  ``mapInPandas``.  Real Avro splits files on the 16-byte sync marker;
  per-file tasks match the writer's one-file-per-partition layout, so
  read parallelism equals write parallelism without needing the
  sync-scan (documented scale path: add record-offset splits as in
  sources/pcap.py:450 when single files grow past a task).

Determinism: the sync marker is derived (md5 of schema + partition id),
not random, so byte-identical inputs produce byte-identical files.
"""
from __future__ import annotations

import hashlib
import json
import os
import struct
import zlib
from typing import Iterable, Iterator, List, Tuple

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

MAGIC = b"Obj\x01"
SYNC_SIZE = 16

_SPARK_TO_AVRO = {
    T.LongType: "long",
    T.IntegerType: "long",
    T.ShortType: "long",
    T.ByteType: "long",
    T.DoubleType: "double",
    T.FloatType: "double",
    T.StringType: "string",
    T.BinaryType: "bytes",
    T.BooleanType: "boolean",
}


# ---------------------------------------------------------------------------
# binary encoding primitives (Avro spec: zigzag varint longs)
# ---------------------------------------------------------------------------

def _encode_long(n: int, out: bytearray) -> None:
    z = (n << 1) ^ (n >> 63)
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def _decode_long(data: bytes, pos: int) -> Tuple[int, int]:
    shift = 0
    acc = 0
    while True:
        b = data[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1), pos


def _encode_bytes(b: bytes, out: bytearray) -> None:
    _encode_long(len(b), out)
    out += b


# ---------------------------------------------------------------------------
# schema mapping
# ---------------------------------------------------------------------------

def _avro_fields(schema: T.StructType) -> List[Tuple[str, str, bool]]:
    fields = []
    for f in schema.fields:
        atype = _SPARK_TO_AVRO.get(type(f.dataType))
        if atype is None:
            raise ValueError(
                f"avro source: unsupported Spark type {f.dataType} "
                f"for column {f.name!r}"
            )
        fields.append((f.name, atype, bool(f.nullable)))
    return fields


def _avro_schema_json(name: str, fields: List[Tuple[str, str, bool]]) -> str:
    recs = []
    for fname, atype, nullable in fields:
        ftype = ["null", atype] if nullable else atype
        recs.append({"name": fname, "type": ftype})
    return json.dumps(
        {"type": "record", "name": name, "fields": recs},
        separators=(",", ":"),
        sort_keys=True,
    )


# ---------------------------------------------------------------------------
# row codec (one function per type keeps the hot loop dispatch-free)
# ---------------------------------------------------------------------------

def _encode_rows(
    rows: Iterable[tuple], fields: List[Tuple[str, str, bool]]
) -> bytearray:
    out = bytearray()
    enc_long = _encode_long
    enc_bytes = _encode_bytes
    pack_d = struct.Struct("<d").pack
    for row in rows:
        for (fname, atype, nullable), v in zip(fields, row):
            if nullable:
                if v is None:
                    out.append(0x00)  # union branch 0 = null
                    continue
                out.append(0x02)  # union branch 1 (zigzag varint of 1)
            elif v is None:
                raise ValueError(f"null in non-nullable column {fname!r}")
            if atype == "long":
                enc_long(int(v), out)
            elif atype == "double":
                out += pack_d(float(v))
            elif atype == "string":
                enc_bytes(str(v).encode("utf-8"), out)
            elif atype == "bytes":
                enc_bytes(bytes(v), out)
            else:  # boolean
                out.append(0x01 if v else 0x00)
    return out


def _decode_rows(
    data: bytes, pos: int, count: int, fields: List[Tuple[str, str, bool]]
) -> List[list]:
    dec_long = _decode_long
    unpack_d = struct.Struct("<d").unpack_from
    cols: List[list] = [[] for _ in fields]
    for _ in range(count):
        for i, (fname, atype, nullable) in enumerate(fields):
            if nullable:
                branch, pos = dec_long(data, pos)
                if branch == 0:
                    cols[i].append(None)
                    continue
            if atype == "long":
                v, pos = dec_long(data, pos)
            elif atype == "double":
                (v,) = unpack_d(data, pos)
                pos += 8
            elif atype == "string":
                n, pos = dec_long(data, pos)
                v = data[pos : pos + n].decode("utf-8")
                pos += n
            elif atype == "bytes":
                n, pos = dec_long(data, pos)
                v = bytes(data[pos : pos + n])
                pos += n
            else:  # boolean
                v = bool(data[pos])
                pos += 1
            cols[i].append(v)
    return cols


# ---------------------------------------------------------------------------
# container file
# ---------------------------------------------------------------------------

def _file_header(schema_json: str, codec: str, sync: bytes) -> bytearray:
    out = bytearray(MAGIC)
    meta = {
        "avro.schema": schema_json.encode("utf-8"),
        "avro.codec": codec.encode("utf-8"),
    }
    _encode_long(len(meta), out)
    for k, v in sorted(meta.items()):
        _encode_bytes(k.encode("utf-8"), out)
        _encode_bytes(v, out)
    _encode_long(0, out)  # map terminator
    out += sync
    return out


def _append_block(
    out: bytearray, payload: bytes, count: int, codec: str, sync: bytes
) -> None:
    if codec == "deflate":
        comp = zlib.compressobj(6, zlib.DEFLATED, -15)
        payload = comp.compress(payload) + comp.flush()
    _encode_long(count, out)
    _encode_long(len(payload), out)
    out += payload
    out += sync


def write_avro_bytes(
    batches: Iterable[pd.DataFrame],
    fields: List[Tuple[str, str, bool]],
    schema_json: str,
    codec: str,
    sync: bytes,
) -> Tuple[bytearray, int]:
    """Encode pandas batches into one container file's bytes."""
    out = _file_header(schema_json, codec, sync)
    total = 0
    for pdf in batches:
        if not len(pdf):
            continue
        rows = (
            tuple(None if pd.isna(v) else v for v in row)
            for row in pdf.itertuples(index=False, name=None)
        )
        payload = _encode_rows(rows, fields)
        _append_block(out, bytes(payload), len(pdf), codec, sync)
        total += len(pdf)
    return out, total


def _embedded_fields(embedded: dict) -> List[Tuple[str, str, bool]]:
    """(name, type, nullable) triples from an embedded schema JSON."""
    out = []
    for f in embedded.get("fields", []):
        t = f["type"]
        if isinstance(t, list):
            non_null = [x for x in t if x != "null"]
            if len(non_null) != 1 or not isinstance(non_null[0], str):
                raise ValueError(f"unsupported avro union {t!r}")
            out.append((f["name"], non_null[0], True))
        else:
            out.append((f["name"], t, False))
    return out


# Avro spec schema-resolution promotions this reader supports
# (writer type -> reader types it may widen to)
_PROMOTIONS = {"long": {"double"}}


def _resolve_fields(
    writer: List[Tuple[str, str, bool]],
    reader: List[Tuple[str, str, bool]],
) -> List[int]:
    """Avro schema resolution (spec "Schema Resolution" chapter):
    match by field NAME; writer fields absent from the reader are
    decoded and discarded; reader fields absent from the writer must
    be nullable (default null); types must match or be a supported
    promotion.  Returns, per reader field, the writer column index
    or -1 for fill-with-null."""
    widx = {f[0]: i for i, f in enumerate(writer)}
    mapping = []
    for rname, rtype, rnull in reader:
        i = widx.get(rname)
        if i is None:
            if not rnull:
                raise ValueError(
                    f"avro resolution: reader field {rname!r} is absent "
                    "from the file and not nullable"
                )
            mapping.append(-1)
            continue
        wtype = writer[i][1]
        if wtype != rtype and rtype not in _PROMOTIONS.get(wtype, ()):
            raise ValueError(
                f"avro resolution: field {rname!r} is {wtype} in the file, "
                f"cannot read as {rtype}"
            )
        mapping.append(i)
    return mapping


def parse_avro_bytes(
    data: bytes,
    fields: List[Tuple[str, str, bool]],
    resolve: bool = False,
) -> List[list]:
    """Decode one container file into per-column value lists,
    verifying magic, embedded schema, and every sync marker.

    With ``resolve=False`` the embedded schema must name exactly the
    requested fields in order.  With ``resolve=True`` the Avro
    schema-resolution rules apply: fields match by name, dropped
    writer fields are skipped, added nullable reader fields read
    null, and long->double promotion is honored."""
    if data[:4] != MAGIC:
        raise ValueError("not an Avro object container file (bad magic)")
    pos = 4
    n_meta, pos = _decode_long(data, pos)
    meta = {}
    while n_meta:
        for _ in range(n_meta):
            klen, pos = _decode_long(data, pos)
            k = data[pos : pos + klen].decode("utf-8")
            pos += klen
            vlen, pos = _decode_long(data, pos)
            meta[k] = data[pos : pos + vlen]
            pos += vlen
        n_meta, pos = _decode_long(data, pos)
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    if codec not in ("null", "deflate"):
        raise ValueError(f"unsupported avro codec {codec!r}")
    embedded = json.loads(meta["avro.schema"].decode("utf-8"))
    writer_fields = _embedded_fields(embedded)
    if resolve:
        mapping = _resolve_fields(writer_fields, fields)
    else:
        want = [f[0] for f in fields]
        got = [f[0] for f in writer_fields]
        if got != want:
            raise ValueError(
                f"avro schema mismatch: file has {got}, want {want}"
            )
        mapping = list(range(len(fields)))
    sync = data[pos : pos + SYNC_SIZE]
    pos += SYNC_SIZE
    wcols: List[list] = [[] for _ in writer_fields]
    n = len(data)
    while pos < n:
        count, pos = _decode_long(data, pos)
        size, pos = _decode_long(data, pos)
        payload = data[pos : pos + size]
        pos += size
        if codec == "deflate":
            payload = zlib.decompress(payload, -15)
        block_cols = _decode_rows(payload, 0, count, writer_fields)
        for acc, bc in zip(wcols, block_cols):
            acc.extend(bc)
        if data[pos : pos + SYNC_SIZE] != sync:
            raise ValueError("avro block sync-marker mismatch (corrupt file)")
        pos += SYNC_SIZE
    n_rows = len(wcols[0]) if wcols else 0
    out: List[list] = []
    for (rname, rtype, _), wi in zip(fields, mapping):
        if wi < 0:
            out.append([None] * n_rows)
        elif rtype == "double" and writer_fields[wi][1] == "long":
            out.append(
                [None if v is None else float(v) for v in wcols[wi]]
            )
        else:
            out.append(wcols[wi])
    return out


# ---------------------------------------------------------------------------
# Spark-facing API
# ---------------------------------------------------------------------------

def write_avro(df: DataFrame, path: str, codec: str = "deflate") -> DataFrame:
    """Distributed Avro write: one container file per partition.

    Returns the (path, n_rows, n_bytes) manifest DataFrame; collecting
    it runs the job.  The manifest is k = #partitions rows — bounded.
    """
    fields = _avro_fields(df.schema)
    schema_json = _avro_schema_json("bp_record", fields)
    os.makedirs(path, exist_ok=True)

    def encode_part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        sync = hashlib.md5(
            (schema_json + f"|{pid}").encode("utf-8")
        ).digest()
        data, total = write_avro_bytes(batches, fields, schema_json, codec, sync)
        fname = os.path.join(path, f"part-{pid:05d}.avro")
        with open(fname, "wb") as fh:
            fh.write(data)
        yield pd.DataFrame(
            {"path": [fname], "n_rows": [total], "n_bytes": [len(data)]}
        )

    return df.mapInPandas(encode_part, "path string, n_rows long, n_bytes long")


_PANDAS_DTYPE = {"long": "Int64", "double": "float64", "boolean": "boolean"}


def read_avro(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    resolve: bool = False,
) -> DataFrame:
    """Distributed Avro read: one file per task, schema-verified.
    ``resolve=True`` applies the spec's schema-resolution rules
    (match by name, drop/add-nullable, long->double promotion)."""
    fields = _avro_fields(schema)
    files = sorted(
        os.path.join(path, f)
        for f in os.listdir(path)
        if f.endswith(".avro")
    )
    if not files:
        return spark.createDataFrame([], schema)
    fdf = spark.createDataFrame([(f,) for f in files], "path string").repartition(
        len(files)
    )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for f in pdf["path"]:
                with open(f, "rb") as fh:
                    cols = parse_avro_bytes(fh.read(), fields, resolve=resolve)
                out = {}
                for (fname, atype, _), vals in zip(fields, cols):
                    dtype = _PANDAS_DTYPE.get(atype)
                    out[fname] = (
                        pd.Series(vals, dtype=dtype)
                        if dtype
                        else pd.Series(vals, dtype="object")
                    )
                yield pd.DataFrame(out) if out else pd.DataFrame()

    return fdf.mapInPandas(decode, schema)
