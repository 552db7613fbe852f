"""Property-based tests (SURVEY §5.2) over the pure-Python surfaces —
no SparkSession, so hypothesis can run hundreds of examples: the pcap
writer/reader roundtrip, frame parsing + anonymization invariants, the
pcapng container, winnowing, and the streaming top-k merge."""

from __future__ import annotations

import struct

from hypothesis import given, settings
from hypothesis import strategies as st

from bytesprocessor_spark.sources.pcap import (
    PROTO_TCP,
    PROTO_UDP,
    iter_pcap_records,
    parse_frame,
    write_pcap,
)
from bytesprocessor_spark.sources.pcapng import iter_pcapng_records, write_pcapng
from bytesprocessor_spark.streaming.stateful import merge_topk

# --- strategies -------------------------------------------------------------

ts_strategy = st.floats(
    min_value=0.0, max_value=4_000_000_000.0, allow_nan=False, allow_infinity=False
)
payload = st.binary(min_size=0, max_size=200)
port = st.integers(min_value=0, max_value=65535)
ip = st.tuples(*[st.integers(0, 255)] * 4).map(lambda t: ".".join(map(str, t)))


@st.composite
def tcp_udp_frame(draw):
    proto = draw(st.sampled_from([PROTO_TCP, PROTO_UDP]))
    src, dst = draw(ip), draw(ip)
    sport, dport = draw(port), draw(port)
    data = draw(payload)
    if proto == PROTO_TCP:
        l4 = struct.pack(">HHIIBBHHH", sport, dport, 0, 0, 0x50, 0x18, 8192, 0xCAFE, 0) + data
    else:
        l4 = struct.pack(">HHHH", sport, dport, 8 + len(data), 0xFACE) + data
    total = 20 + len(l4)
    hdr = struct.pack(
        ">BBHHHBBH4s4s", 0x45, 0, total, 1, 0, 64, proto, 0xBEEF,
        bytes(int(x) for x in src.split(".")),
        bytes(int(x) for x in dst.split(".")),
    )
    eth = b"\x02" * 6 + b"\x01" * 6 + struct.pack(">H", 0x0800)
    return (src, dst, sport, dport, proto), eth + hdr + l4


# --- pcap/pcapng roundtrip --------------------------------------------------

@settings(max_examples=60, deadline=None)
@given(st.lists(st.tuples(ts_strategy, st.binary(min_size=0, max_size=300)), max_size=20))
def test_pcap_roundtrip_any_bytes(tmp_path_factory, pkts):
    """write_pcap -> iter_pcap_records preserves count, µs-rounded
    timestamps, and exact frame bytes for ARBITRARY frame payloads."""
    p = str(tmp_path_factory.mktemp("prop") / "r.pcap")
    write_pcap(p, pkts)
    got = list(iter_pcap_records(open(p, "rb").read()))
    assert len(got) == len(pkts)
    for (ts, buf), (gts, gbuf) in zip(pkts, got):
        assert gbuf == buf
        assert abs(gts - ts) <= 5e-7 + 1e-9 * ts  # µs quantization


@settings(max_examples=60, deadline=None)
@given(st.lists(st.tuples(ts_strategy, st.binary(min_size=0, max_size=300)), max_size=20))
def test_pcapng_matches_pcap_for_any_frames(tmp_path_factory, pkts):
    """The pcapng writer/reader agrees with the classic-pcap pair on
    arbitrary frames (same count, same bytes, ns-exact timestamps)."""
    d = tmp_path_factory.mktemp("prop")
    write_pcapng(str(d / "x.pcapng"), pkts, tsresol=6)
    ng = list(iter_pcapng_records(open(str(d / "x.pcapng"), "rb").read()))
    write_pcap(str(d / "x.pcap"), pkts)
    classic = list(iter_pcap_records(open(str(d / "x.pcap"), "rb").read()))
    assert [b for _, b in ng] == [b for _, b in classic]
    for (t1, _), (t2, _) in zip(ng, classic):
        assert abs(t1 - t2) <= 1e-6


# --- parse/anonymize invariants --------------------------------------------

@settings(max_examples=120, deadline=None)
@given(tcp_udp_frame(), st.floats(0, 2e9, allow_nan=False))
def test_parse_frame_fields_and_anonymization(frame_spec, ts):
    (src, dst, sport, dport, proto), frame = frame_spec
    row = parse_frame(ts, frame)
    assert row is not None
    assert (row["src_ip"], row["dst_ip"]) == (src, dst)
    assert (row["src_port"], row["dst_port"]) == (sport, dport)
    assert row["protocol"] == str(proto)
    # anonymization: addresses + ports zeroed IN the bytes, everything
    # else byte-identical to the original IP layer
    orig_ip = frame[14:]
    anon = row["payload"]
    assert len(anon) == len(orig_ip)
    assert anon[12:20] == b"\x00" * 8
    assert anon[20:24] == b"\x00" * 4
    assert anon[:12] == orig_ip[:12]
    assert anon[24:] == orig_ip[24:]


@settings(max_examples=120, deadline=None)
@given(st.binary(min_size=0, max_size=120), st.floats(0, 2e9, allow_nan=False))
def test_parse_frame_never_raises_on_garbage(junk, ts):
    """The per-row error contract (BP:251-253): arbitrary bytes either
    parse or return None — struct errors never escape for frames the
    length checks admit."""
    eth = b"\x02" * 6 + b"\x01" * 6 + struct.pack(">H", 0x0800)
    assert parse_frame(ts, junk) is None or True  # no exception path
    parse_frame(ts, eth + junk)  # must not raise


# --- streaming top-k merge ---------------------------------------------------

@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.floats(allow_nan=False, allow_infinity=False, width=32), max_size=30),
    st.lists(st.floats(allow_nan=False, allow_infinity=False, width=32), max_size=30),
    st.integers(1, 10),
)
def test_merge_topk_equals_global_topk(a, b, k):
    """Merging batch-by-batch equals the global top-k — the property
    that makes per-micro-batch state updates correct."""
    incremental = merge_topk(merge_topk([], a, k), b, k)
    assert incremental == sorted(a + b, reverse=True)[:k]


rgb_strategy = st.integers(1, 12).flatmap(
    lambda h: st.integers(1, 12).flatmap(
        lambda w: st.lists(
            st.integers(0, 255), min_size=h * w * 3, max_size=h * w * 3
        ).map(lambda px: (h, w, px))
    )
)


@settings(max_examples=40, deadline=None)
@given(rgb_strategy)
def test_png_bmp_roundtrip_any_pixels(dims):
    """Built-in image codecs: encode -> decode is exact for ANY RGB
    content at any small dimension (both PNG with its filter/zlib layer
    and bottom-up-row BMP)."""
    import numpy as np

    from bytesprocessor_spark.functions.imagecodec import (
        decode_image_builtin, encode_bmp, encode_png,
    )

    h, w, px = dims
    rgb = np.array(px, dtype=np.uint8).reshape(h, w, 3)
    assert np.array_equal(decode_image_builtin(encode_png(rgb)), rgb)
    assert np.array_equal(decode_image_builtin(encode_bmp(rgb)), rgb)


@settings(max_examples=40, deadline=None)
@given(
    st.lists(st.integers(-32768, 32767), min_size=1, max_size=500),
    st.sampled_from([8000, 16000, 44100]),
)
def test_wav_decode_any_pcm16(samples, sr):
    """decode_audio_wav: rate/sample-count exact, amplitude features
    finite and bounded for any PCM-16 content."""
    import io
    import math
    import wave

    import numpy as np

    from bytesprocessor_spark.functions.multimodal import decode_audio_wav

    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(sr)
        wf.writeframes(np.array(samples, dtype="<i2").tobytes())
    rate, n, feats = decode_audio_wav(buf.getvalue())
    assert rate == sr and n == len(samples)
    assert len(feats) == 8 and all(math.isfinite(f) for f in feats)
    rms, mean_abs, peak, zcr = feats[:4]
    assert abs(peak - max(abs(s) for s in samples) / 32768.0) < 1e-12
    assert 0.0 <= rms <= abs(peak) + 1e-12 >= mean_abs >= 0.0
    assert 0.0 <= zcr <= 1.0
    assert abs(sum(feats[4:]) - 1.0) < 1e-9  # histogram fractions sum to 1


# --- BPE double-space replace representation --------------------------------

def _ref_bpe_merge(syms, a, b):
    """Reference left-to-right non-overlapping pair merge."""
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


_sym = st.text(alphabet="abcdef", min_size=1, max_size=3)


@settings(max_examples=300, deadline=None)
@given(st.lists(_sym, min_size=1, max_size=12), _sym, _sym)
def test_bpe_replace_representation_is_exact(syms, a, b):
    """The operators/bpe.py trick — symbols joined with double spaces,
    merge = literal replace of ' a  b ' with ' ab ' — must equal the
    reference pair-merge for ANY symbol sequence and pair, including
    back-to-back occurrences and same-symbol runs.  Python
    str.replace shares the left-to-right non-overlapping semantics of
    Spark's UTF8String.replace and DuckDB's replace(), so this pins
    the representation for all three engines."""
    s = "  " + "  ".join(syms) + "  "
    s2 = s.replace(f" {a}  {b} ", f" {a}{b} ")
    parsed = [x for x in s2.split("  ") if x]
    assert parsed == _ref_bpe_merge(syms, a, b)


# --- PQ exact-integer distance identity -------------------------------------

@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.integers(-2_000_000, 2_000_000), min_size=1, max_size=16),
    st.data(),
)
def test_pq_einsum_distance_identity_is_exact(xs, data):
    """operators/pq.py computes ||x-c||^2 as |x|^2 - 2<x,c> + |c|^2 in
    float64 — for micro-quantized inputs every term and partial sum is
    an exact integer below 2^53, so the identity matches arbitrary-
    precision integer arithmetic bit-for-bit."""
    import numpy as np

    cs = data.draw(
        st.lists(
            st.integers(-2_000_000, 2_000_000), min_size=len(xs), max_size=len(xs)
        )
    )
    x = np.array(xs, dtype=np.float64)
    c = np.array(cs, dtype=np.float64)
    d_f64 = float(x @ x) - 2.0 * float(x @ c) + float(c @ c)
    d_int = sum((a - b) * (a - b) for a, b in zip(xs, cs))  # Python bigints
    assert d_f64 == d_int


# --- WebDataset member explode ----------------------------------------------

@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.text(alphabet="abcdefghij0123456789_-", min_size=1, max_size=12),
            st.sampled_from(["txt", "bin", "json", ""]),
            st.binary(min_size=0, max_size=256),
        ),
        min_size=0,
        max_size=12,
        unique_by=lambda t: (t[0], t[1]),
    )
)
def test_tar_member_explode_roundtrip(members):
    """sources/webdataset._explode_members recovers every (key, ext,
    payload) from an arbitrary tar, including extension-less names and
    empty payloads."""
    import io
    import tarfile

    import pandas as pd

    from bytesprocessor_spark.sources.webdataset import _explode_members

    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        for key, ext, payload in members:
            name = f"{key}.{ext}" if ext else key
            info = tarfile.TarInfo(name=name)
            info.size = len(payload)
            tf.addfile(info, io.BytesIO(payload))
    pdf = pd.DataFrame({"path": ["/x/shard-0.tar"], "content": [buf.getvalue()]})
    out = pd.concat(list(_explode_members([pdf]))) if members else None
    got = (
        {(r.key, r.ext): bytes(r.payload) for r in out.itertuples()}
        if out is not None
        else {}
    )
    want = {(k, e): p for k, e, p in members}
    assert got == want
