"""S20 Avro object-container source: byte-level codec pins + Spark
round-trip.  The format is built from the public Apache Avro 1.12 spec
(see sources/avro.py module docstring); these tests pin the encoding
invariants the spec fixes (zigzag varints, deflate raw-RFC1951 blocks,
sync discipline) plus full-fidelity round-trips through Spark."""
import os

import pandas as pd
import pytest

from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from bytesprocessor_spark.sources.avro import (
    _decode_long,
    _encode_long,
    parse_avro_bytes,
    read_avro,
    write_avro,
    write_avro_bytes,
    _avro_fields,
    _avro_schema_json,
)

def test_zigzag_varint_spec_vectors():
    # Avro spec examples: 0->00, -1->01, 1->02, -2->03, 2->04,
    # -64->7f, 64->80 01
    vectors = {0: b"\x00", -1: b"\x01", 1: b"\x02", -2: b"\x03",
               2: b"\x04", -64: b"\x7f", 64: b"\x80\x01"}
    for n, want in vectors.items():
        out = bytearray()
        _encode_long(n, out)
        assert bytes(out) == want, n
        back, pos = _decode_long(bytes(out), 0)
        assert back == n and pos == len(want)


def test_long_roundtrip_extremes():
    for n in (2**63 - 1, -(2**63), 12345678901234, -987654321):
        out = bytearray()
        _encode_long(n, out)
        back, _ = _decode_long(bytes(out), 0)
        assert back == n


def test_container_roundtrip_bytes_level():
    schema = T.StructType([
        T.StructField("k", T.LongType(), False),
        T.StructField("v", T.DoubleType(), True),
        T.StructField("s", T.StringType(), True),
        T.StructField("b", T.BinaryType(), True),
        T.StructField("f", T.BooleanType(), True),
    ])
    fields = _avro_fields(schema)
    sj = _avro_schema_json("t", fields)
    pdf = pd.DataFrame({
        "k": [1, 2, 3],
        "v": [1.5, None, -0.25],
        "s": ["a", None, "héllo"],
        "b": [b"\x00\xff", b"", None],
        "f": [True, False, None],
    })
    for codec in ("null", "deflate"):
        data, total = write_avro_bytes([pdf], fields, sj, codec, b"S" * 16)
        assert total == 3
        cols = parse_avro_bytes(bytes(data), fields)
        assert cols[0] == [1, 2, 3]
        assert cols[1][0] == 1.5 and cols[1][1] is None and cols[1][2] == -0.25
        assert cols[2] == ["a", None, "héllo"]
        assert cols[3] == [b"\x00\xff", b"", None]
        assert cols[4] == [True, False, None]


def test_corrupt_sync_and_schema_mismatch_raise():
    schema = T.StructType([T.StructField("k", T.LongType(), False)])
    fields = _avro_fields(schema)
    sj = _avro_schema_json("t", fields)
    data, _ = write_avro_bytes(
        [pd.DataFrame({"k": [1, 2]})], fields, sj, "null", b"S" * 16
    )
    bad = bytearray(data)
    bad[-1] ^= 0xFF  # clobber trailing sync
    with pytest.raises(ValueError, match="sync"):
        parse_avro_bytes(bytes(bad), fields)
    other = _avro_fields(
        T.StructType([T.StructField("other", T.LongType(), False)])
    )
    with pytest.raises(ValueError, match="schema mismatch"):
        parse_avro_bytes(bytes(data), other)


def test_spark_roundtrip_events(spark, tmp_path):  # noqa: F811
    sf = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
    ev = (
        spark.read.parquet(f"{sf}/events.parquet")
        .select("event_type", "value", "user_id")
        .repartition(4)
    )
    out = str(tmp_path / "events_avro")
    manifest = write_avro(ev, out).collect()
    assert sum(r.n_rows for r in manifest) == ev.count()
    assert len(manifest) == 4 and all(r.n_bytes > 0 for r in manifest)
    back = read_avro(spark, out, ev.schema)
    a = ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("sum_c"),
    ).collect()
    b = back.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("sum_c"),
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_spark_roundtrip_nulls(spark, tmp_path):  # noqa: F811
    df = spark.createDataFrame(
        [Row(k=1, s="x"), Row(k=2, s=None), Row(k=3, s="z")],
        T.StructType([
            T.StructField("k", T.LongType(), False),
            T.StructField("s", T.StringType(), True),
        ]),
    ).repartition(2)
    out = str(tmp_path / "nulls_avro")
    write_avro(df, out, codec="null").collect()
    back = read_avro(spark, out, df.schema).collect()
    assert sorted((r.k, r.s) for r in back) == [(1, "x"), (2, None), (3, "z")]


def test_schema_resolution_drop_add_promote(spark, tmp_path):  # noqa: F811
    df = spark.createDataFrame(
        [Row(k=1, v=1.5, s="a"), Row(k=2, v=None, s="b")],
        T.StructType([
            T.StructField("k", T.LongType(), False),
            T.StructField("v", T.DoubleType(), True),
            T.StructField("s", T.StringType(), True),
        ]),
    ).repartition(1)
    out = str(tmp_path / "evo_avro")
    write_avro(df, out).collect()
    evolved = T.StructType([
        T.StructField("s", T.StringType(), True),   # reordered
        T.StructField("k", T.DoubleType(), True),   # promoted long->double
        T.StructField("extra", T.LongType(), True), # added nullable
    ])
    back = sorted(
        read_avro(spark, out, evolved, resolve=True).collect(),
        key=lambda r: r.s,
    )
    assert [(r.s, r.k, r.extra) for r in back] == [
        ("a", 1.0, None), ("b", 2.0, None)]


def test_schema_resolution_rejects_bad_shapes(spark, tmp_path):  # noqa: F811
    df = spark.createDataFrame(
        [Row(k=1)], T.StructType([T.StructField("k", T.LongType(), False)])
    ).repartition(1)
    out = str(tmp_path / "evo_bad")
    write_avro(df, out).collect()
    import pytest as _pytest

    missing_nonnull = T.StructType([T.StructField("z", T.LongType(), False)])
    with _pytest.raises(Exception, match="not nullable"):
        read_avro(spark, out, missing_nonnull, resolve=True).collect()
    bad_promote = T.StructType([T.StructField("k", T.StringType(), True)])
    with _pytest.raises(Exception, match="cannot read"):
        read_avro(spark, out, bad_promote, resolve=True).collect()


def test_vectorized_codec_matches_reference():
    """r11 optimization pin: the numpy batch encoder emits BYTE-IDENTICAL
    payloads to the reference row encoder, and the lockstep block decoder
    returns exactly what the reference row decoder returns — over every
    supported type, nulls, int64 extremes, inf/-0.0, empty strings/bytes."""
    import numpy as np

    from bytesprocessor_spark.sources.avro import (
        _decode_blocks_lockstep,
        _decode_rows,
        _encode_columns,
        _encode_rows,
    )

    schema = T.StructType([
        T.StructField("k", T.LongType(), True),
        T.StructField("kk", T.LongType(), False),
        T.StructField("v", T.DoubleType(), True),
        T.StructField("s", T.StringType(), True),
        T.StructField("b", T.BinaryType(), True),
        T.StructField("f", T.BooleanType(), True),
    ])
    fields = _avro_fields(schema)
    pdf = pd.DataFrame({
        "k": pd.array([1, None, -(2**63), 2**63 - 1, 0, 64, -64], dtype="Int64"),
        "kk": pd.array([-1, 2, 300000, -(2**62), 7, 0, 1], dtype="Int64"),
        "v": pd.array(
            [1.5, None, float("inf"), -0.0, float("-inf"), 1e308, -2.25],
            dtype="float64",
        ),
        "s": pd.Series(["a", None, "héllo", "", "x" * 300, "☃", "q"]),
        "b": pd.Series([b"\x00\xff", b"", None, b"xyz", b"\x80" * 130, b"1", b"2"]),
        "f": pd.array([True, False, None, True, None, False, True], dtype="boolean"),
    })
    rows = [
        tuple(None if pd.isna(v) else v for v in row)
        for row in pdf.itertuples(index=False, name=None)
    ]
    ref = bytes(_encode_rows(iter(rows), fields))
    buf, row_starts = _encode_columns(pdf, fields)
    assert buf.tobytes() == ref
    assert row_starts[-1] == len(ref)
    # lockstep decode over a multi-block split == reference row decode,
    # including a short tail block
    payloads = [
        bytes(buf[row_starts[0] : row_starts[3]]),
        bytes(buf[row_starts[3] : row_starts[5]]),
        bytes(buf[row_starts[5] : row_starts[7]]),
    ]
    got = _decode_blocks_lockstep(payloads, [3, 2, 2], fields)
    want = _decode_rows(ref, 0, 7, fields)
    assert got == want
    # empty-input shape
    assert _decode_blocks_lockstep([], [], fields) == [[] for _ in fields]


def test_codec_property_roundtrip():
    """Hypothesis: arbitrary rows of every supported type survive the
    byte-level container round-trip exactly (both codecs)."""
    from hypothesis import given, settings, strategies as st

    schema = T.StructType([
        T.StructField("k", T.LongType(), True),
        T.StructField("v", T.DoubleType(), True),
        T.StructField("s", T.StringType(), True),
        T.StructField("b", T.BinaryType(), True),
        T.StructField("f", T.BooleanType(), True),
    ])
    fields = _avro_fields(schema)
    sj = _avro_schema_json("t", fields)
    row = st.tuples(
        st.one_of(st.none(), st.integers(-(2**63), 2**63 - 1)),
        st.one_of(st.none(), st.floats(allow_nan=False)),
        st.one_of(st.none(), st.text(max_size=40)),
        st.one_of(st.none(), st.binary(max_size=40)),
        st.one_of(st.none(), st.booleans()),
    )

    @settings(max_examples=50, deadline=None)
    @given(st.lists(row, max_size=20), st.sampled_from(["null", "deflate"]))
    def check(rows, codec):
        # build nullable columns directly — a row-tuple DataFrame would
        # route big ints through float64 and lose precision past 2^53
        pdf = pd.DataFrame(
            {
                "k": pd.array([r[0] for r in rows], dtype="Int64"),
                "v": pd.array([r[1] for r in rows], dtype="float64"),
                "s": pd.Series([r[2] for r in rows], dtype="object"),
                "b": pd.Series([r[3] for r in rows], dtype="object"),
                "f": pd.array([r[4] for r in rows], dtype="boolean"),
            }
        )
        data, total = write_avro_bytes([pdf], fields, sj, codec, b"S" * 16)
        assert total == len(rows)
        cols = parse_avro_bytes(bytes(data), fields)
        for i, (name, _, _) in enumerate(fields):
            want = [r[i] for r in rows]
            assert cols[i] == want, name

    check()
