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

import numpy as np
import pandas as pd
import pyarrow as pa

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

MAGIC = b"Obj\x01"
SYNC_SIZE = 16

# Rows per container block.  Small blocks cost ~19 framing bytes each
# (negligible) and let the reader decode every block of a file in
# LOCKSTEP — a cursor vector indexed by block, advanced with vectorized
# numpy gathers — instead of a per-row Python loop (guide §4.2: hand
# whole batches to native code).  512 keeps the lockstep width high
# (e.g. a 100k-row file decodes as 196 parallel lanes x 512 steps).
_BLOCK_ROWS = 512

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
# vectorized codec kernels (numpy / pyarrow)
#
# The per-row encoder/decoder below (_encode_rows/_decode_rows) are the
# reference implementations: dispatch-free Python loops, kept as the
# fallback for exotic inputs and as the equivalence twin in tests.  The
# hot path encodes a whole pandas batch column-wise with numpy (zigzag
# varints emitted by up-to-10 masked vector passes, fragments
# interleaved row-wise with one ragged scatter per column) and decodes
# all blocks of a file in lockstep (one cursor per block, vectorized
# gathers).  Byte output is identical to the reference encoder.
# ---------------------------------------------------------------------------

_VARINT_THRESH = np.array([1 << (7 * k) for k in range(1, 10)], dtype=np.uint64)


def _zigzag_np(v: np.ndarray) -> np.ndarray:
    """int64 array -> uint64 zigzag codes (bit-identical to _encode_long's
    (n << 1) ^ (n >> 63) on the int64 domain)."""
    v = v.astype(np.int64, copy=False)
    return ((v << np.int64(1)) ^ (v >> np.int64(63))).view(np.uint64)


def _varint_frags(z: np.ndarray) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Encode uint64 zigzag codes as varints.

    Returns (buf, nbytes, starts): one contiguous uint8 buffer holding
    the concatenated varints in input order, the per-value byte count,
    and each value's start offset in buf."""
    n = len(z)
    nb = np.ones(n, dtype=np.int64)
    for t in _VARINT_THRESH:
        nb += (z >= t)
    starts = np.zeros(n, dtype=np.int64)
    if n > 1:
        np.cumsum(nb[:-1], out=starts[1:])
    buf = np.empty(int(nb.sum()), dtype=np.uint8)
    for k in range(10):
        idx = np.flatnonzero(nb > k)
        if not len(idx):
            break
        b = ((z[idx] >> np.uint64(7 * k)) & np.uint64(0x7F)).astype(np.uint8)
        b[nb[idx] - 1 > k] |= 0x80
        buf[starts[idx] + k] = b
    return buf, nb, starts


def _ragged_scatter(
    dst: np.ndarray,
    dst_starts: np.ndarray,
    src: np.ndarray,
    src_starts: np.ndarray,
    lens: np.ndarray,
) -> None:
    """dst[dst_starts[i] + j] = src[src_starts[i] + j] for j < lens[i]."""
    total = int(lens.sum())
    if not total:
        return
    within = np.arange(total, dtype=np.int64) - np.repeat(
        np.cumsum(lens) - lens, lens
    )
    dst[np.repeat(dst_starts, lens) + within] = src[
        np.repeat(src_starts, lens) + within
    ]


def _column_arrow(col: pd.Series, atype: str) -> pa.Array:
    """Arrow-ize one pandas column under the reference encoder's
    coercions (pd.isna -> null; long accepts integral floats)."""
    target = {
        "long": pa.int64(),
        "double": pa.float64(),
        "boolean": pa.bool_(),
        "string": pa.large_utf8(),
        "bytes": pa.large_binary(),
    }[atype]
    arr = pa.array(col, from_pandas=True)
    if arr.type != target:
        # safe cast: raises on fractional floats / overflow, which sends
        # the batch to the reference row encoder (int(v) truncation).
        arr = arr.cast(target)
    return arr


def _encode_columns(pdf: pd.DataFrame, fields) -> Tuple[np.ndarray, np.ndarray]:
    """Vectorized batch encode.  Returns (payload uint8 buffer for the
    whole batch, per-row start offsets incl. the trailing total), byte-
    identical to _encode_rows over the same rows."""
    n = len(pdf)
    frags = []  # per field: (col_buf, col_starts, col_lens)
    for (fname, atype, nullable), col in zip(fields, (pdf[c] for c in pdf.columns)):
        arr = _column_arrow(col, atype)
        null = arr.is_null().to_numpy(zero_copy_only=False)
        if null.any() and not nullable:
            raise ValueError(f"null in non-nullable column {fname!r}")
        live = np.flatnonzero(~null)
        if atype == "long":
            vbuf, vnb, vstarts = _varint_frags(
                _zigzag_np(arr.fill_null(0).to_numpy(zero_copy_only=False)[live])
            )
            vlens = vnb
        elif atype == "double":
            vals = arr.fill_null(0.0).to_numpy(zero_copy_only=False)[live]
            vbuf = vals.astype("<f8", copy=False).view(np.uint8)
            vlens = np.full(len(live), 8, dtype=np.int64)
            vstarts = np.arange(len(live), dtype=np.int64) * 8
        elif atype == "boolean":
            vbuf = (
                arr.fill_null(False)
                .to_numpy(zero_copy_only=False)[live]
                .astype(np.uint8)
            )
            vlens = np.ones(len(live), dtype=np.int64)
            vstarts = np.arange(len(live), dtype=np.int64)
        else:  # string / bytes: offsets+data buffers, length varint + payload
            arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
            offs = np.frombuffer(arr.buffers()[1], dtype=np.int64, count=len(arr) + 1)
            offs = offs[arr.offset : arr.offset + len(arr) + 1]
            data_buf = arr.buffers()[2]
            data = (
                np.frombuffer(data_buf, dtype=np.uint8)
                if data_buf is not None and len(data_buf)
                else np.empty(0, dtype=np.uint8)
            )
            plens = (offs[1:] - offs[:-1])[live]
            pstarts = offs[:-1][live]
            lbuf, lnb, lstarts = _varint_frags((plens.astype(np.uint64)) << np.uint64(1))
            vlens = lnb + plens
            vstarts = np.zeros(len(live), dtype=np.int64)
            if len(live) > 1:
                np.cumsum(vlens[:-1], out=vstarts[1:])
            vbuf = np.empty(int(vlens.sum()), dtype=np.uint8)
            _ragged_scatter(vbuf, vstarts, lbuf, lstarts, lnb)
            _ragged_scatter(vbuf, vstarts + lnb, data, pstarts, plens)
        frags.append((vbuf, vstarts, vlens, live, null, nullable))
    row_lens = np.zeros(n, dtype=np.int64)
    for _, _, vlens, live, _, nullable in frags:
        if nullable:
            row_lens += 1
        fl = np.zeros(n, dtype=np.int64)
        fl[live] = vlens
        row_lens += fl
    row_starts = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(row_lens, out=row_starts[1:])
    out = np.empty(int(row_starts[-1]), dtype=np.uint8)
    cursor = row_starts[:-1].copy()
    for vbuf, vstarts, vlens, live, null, nullable in frags:
        if nullable:
            out[cursor] = np.where(null, 0x00, 0x02).astype(np.uint8)
            cursor += 1
        _ragged_scatter(out, cursor[live], vbuf, vstarts, vlens)
        cursor[live] += vlens
    return out, row_starts


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


def _unzigzag_np(z: np.ndarray) -> np.ndarray:
    """uint64 zigzag codes -> int64 values."""
    return ((z >> np.uint64(1)) ^ (np.uint64(0) - (z & np.uint64(1)))).view(
        np.int64
    )


def _decode_varint_lockstep(
    buf: np.ndarray, cur: np.ndarray, lanes: np.ndarray
) -> np.ndarray:
    """Decode one varint per lane (lanes index into cur), advancing each
    lane's cursor.  Returns the uint64 zigzag codes aligned with lanes."""
    acc = np.zeros(len(lanes), dtype=np.uint64)
    live = np.arange(len(lanes))
    for k in range(10):
        pos = lanes[live]
        b = buf[cur[pos]]
        cur[pos] += 1
        acc[live] |= (b.astype(np.uint64) & np.uint64(0x7F)) << np.uint64(7 * k)
        live = live[(b & 0x80) != 0]
        if not len(live):
            return acc
    raise ValueError("avro varint longer than 10 bytes (corrupt file)")


def _decode_blocks_lockstep(
    payloads: List[bytes],
    counts: List[int],
    fields: List[Tuple[str, str, bool]],
) -> List[list]:
    """Decode all blocks of one container file in lockstep: one cursor
    per block, every per-row step a vectorized gather across blocks.
    Returns per-field Python value lists in file row order (equal to
    running _decode_rows over each block and concatenating)."""
    B = len(payloads)
    counts_a = np.asarray(counts, dtype=np.int64)
    if not B or not counts_a.sum():
        return [[] for _ in fields]
    lens = np.asarray([len(p) for p in payloads], dtype=np.int64)
    starts = np.zeros(B, dtype=np.int64)
    if B > 1:
        np.cumsum(lens[:-1], out=starts[1:])
    buf = np.frombuffer(b"".join(payloads), dtype=np.uint8)
    maxc = int(counts_a.max())
    cur = starts.copy()
    store = []
    for _, atype, _ in fields:
        if atype == "long":
            vals = np.zeros((maxc, B), dtype=np.int64)
        elif atype == "double":
            vals = np.zeros((maxc, B), dtype=np.float64)
        elif atype == "boolean":
            vals = np.zeros((maxc, B), dtype=bool)
        else:  # string / bytes: (payload start, payload len) per cell
            vals = (
                np.zeros((maxc, B), dtype=np.int64),
                np.zeros((maxc, B), dtype=np.int64),
            )
        store.append((vals, np.zeros((maxc, B), dtype=bool)))
    lane_ids = np.arange(B)
    eight = np.arange(8, dtype=np.int64)
    for i in range(maxc):
        act = lane_ids[i < counts_a]
        if not len(act):
            break
        for (_, atype, nullable), (vals, nulls) in zip(fields, store):
            lanes = act
            if nullable:
                branch = buf[cur[lanes]]
                cur[lanes] += 1
                isnull = branch == 0
                nulls[i, lanes] = isnull
                lanes = lanes[~isnull]
                if not len(lanes):
                    continue
            if atype == "long":
                vals[i, lanes] = _unzigzag_np(
                    _decode_varint_lockstep(buf, cur, lanes)
                )
            elif atype == "double":
                raw = buf[cur[lanes][:, None] + eight]
                vals[i, lanes] = raw.copy().view("<f8").ravel()
                cur[lanes] += 8
            elif atype == "boolean":
                vals[i, lanes] = buf[cur[lanes]] != 0
                cur[lanes] += 1
            else:
                plen = _unzigzag_np(_decode_varint_lockstep(buf, cur, lanes))
                vals[0][i, lanes] = cur[lanes]
                vals[1][i, lanes] = plen
                cur[lanes] += plen
    # flatten to file row order (block-major) and convert to lists
    valid = np.arange(maxc)[None, :] < counts_a[:, None]  # (B, maxc)
    out: List[list] = []
    for (_, atype, _), (vals, nulls) in zip(fields, store):
        nullflat = nulls.T[valid]
        if atype in ("long", "double", "boolean"):
            lst = vals.T[valid].tolist()
            if nullflat.any():
                for j in np.flatnonzero(nullflat):
                    lst[j] = None
        else:
            sflat = vals[0].T[valid]
            lflat = vals[1].T[valid]
            n_rows = len(lflat)
            offs = np.zeros(n_rows + 1, dtype=np.int64)
            np.cumsum(lflat, out=offs[1:])
            data = np.empty(int(offs[-1]), dtype=np.uint8)
            _ragged_scatter(data, offs[:-1], buf, sflat, lflat)
            validity = None
            if nullflat.any():
                validity = pa.py_buffer(
                    np.packbits(~nullflat, bitorder="little").tobytes()
                )
            typ = pa.large_utf8() if atype == "string" else pa.large_binary()
            lst = pa.Array.from_buffers(
                typ,
                n_rows,
                [validity, pa.py_buffer(offs.tobytes()), pa.py_buffer(data.tobytes())],
            ).to_pylist()
        out.append(lst)
    return out


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
        try:
            buf, row_starts = _encode_columns(pdf, fields)
        except ValueError:
            raise
        except Exception:
            # exotic cell types Arrow refuses (str()-coercible objects,
            # fractional floats in long columns): reference row encoder.
            rows = (
                tuple(None if pd.isna(v) else v for v in row)
                for row in pdf.itertuples(index=False, name=None)
            )
            buf = np.frombuffer(bytes(_encode_rows(rows, fields)), dtype=np.uint8)
            row_starts = None
        n = len(pdf)
        if row_starts is None:
            # row offsets unknown on the fallback path: single block
            _append_block(out, buf.tobytes(), n, codec, sync)
        else:
            for lo in range(0, n, _BLOCK_ROWS):
                hi = min(lo + _BLOCK_ROWS, n)
                _append_block(
                    out,
                    buf[row_starts[lo] : row_starts[hi]].tobytes(),
                    hi - lo,
                    codec,
                    sync,
                )
        total += n
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
    n = len(data)
    payloads: List[bytes] = []
    counts: List[int] = []
    while pos < n:
        count, pos = _decode_long(data, pos)
        size, pos = _decode_long(data, pos)
        payload = data[pos : pos + size]
        pos += size
        if codec == "deflate":
            payload = zlib.decompress(payload, -15)
        payloads.append(payload)
        counts.append(count)
        if data[pos : pos + SYNC_SIZE] != sync:
            raise ValueError("avro block sync-marker mismatch (corrupt file)")
        pos += SYNC_SIZE
    wcols = _decode_blocks_lockstep(payloads, counts, writer_fields)
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
