"""Real-codec tests for the L5 multimodal operators: the built-in
PNG/BMP/PPM image decoders and the stdlib PCM-WAV audio decoder, both
standalone and driven through the Spark mapInPandas operators.  When
PIL is present (deployment images), the PIL path is additionally
checked for pixel-level agreement with the built-in path."""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np
import pytest

from bytesprocessor_spark.functions.imagecodec import (
    _HAVE_PIL,
    decode_image,
    decode_image_builtin,
    encode_bmp,
    encode_png,
    pixel_features,
)
from bytesprocessor_spark.functions.multimodal import (
    audio_features,
    decode_audio_wav,
    image_features,
)


def _test_pixels(h=5, w=7, seed=3):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)


def test_png_roundtrip_exact_pixels():
    px = _test_pixels()
    w, h, feats = decode_image(encode_png(px))
    assert (w, h) == (px.shape[1], px.shape[0])
    assert feats == pixel_features(px)
    assert np.array_equal(decode_image_builtin(encode_png(px)), px)


def _filtered_png(px: np.ndarray, ftype: int) -> bytes:
    """Hand-build a PNG whose scanlines use the given filter type, so
    the decoder's reconstruction (not just the filter-0 path our
    encoder emits) is exercised.  The filtered bytes are computed as
    the spec's forward filter; decoding must invert it exactly."""
    h, w = px.shape[:2]
    ch, stride = 3, w * 3
    flat = px.reshape(h, stride).astype(np.int16)
    raw = b""
    prev = np.zeros(stride, dtype=np.int16)
    for y in range(h):
        line = flat[y]
        left = np.concatenate([np.zeros(ch, np.int16), line[:-ch]])
        ul = np.concatenate([np.zeros(ch, np.int16), prev[:-ch]])
        if ftype == 1:
            filt = line - left
        elif ftype == 2:
            filt = line - prev
        elif ftype == 3:
            filt = line - ((left + prev) >> 1)
        elif ftype == 4:
            p = left + prev - ul
            pa, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - ul)
            pred = np.where((pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, ul))
            filt = line - pred
        else:
            filt = line
        raw += bytes([ftype]) + (filt & 0xFF).astype(np.uint8).tobytes()
        prev = line

    def chunk(ctype, data):
        body = ctype + data
        return struct.pack(">I", len(data)) + body + struct.pack(">I", zlib.crc32(body))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
def test_png_filter_reconstruction(ftype):
    px = _test_pixels(h=4, w=6, seed=ftype + 10)
    assert np.array_equal(decode_image_builtin(_filtered_png(px, ftype)), px)


def test_bmp_roundtrip_exact_pixels():
    px = _test_pixels(h=3, w=5, seed=7)  # odd width exercises row padding
    w, h, feats = decode_image(encode_bmp(px))
    assert (w, h) == (5, 3)
    assert feats == pixel_features(px)


def test_ppm_roundtrip_exact_pixels():
    px = _test_pixels(h=4, w=4, seed=9)
    ppm = b"P6\n# comment\n4 4\n255\n" + px.tobytes()
    w, h, feats = decode_image(ppm)
    assert (w, h) == (4, 4)
    assert feats == pixel_features(px)


def test_decode_image_rejects_garbage():
    with pytest.raises(ValueError):
        decode_image(b"\x00\x01\x02 definitely not an image")
    with pytest.raises(ValueError):
        decode_image(b"")


@pytest.mark.skipif(not _HAVE_PIL, reason="PIL not installed in this container")
def test_pil_path_agrees_with_builtin():
    px = _test_pixels(h=6, w=6, seed=11)
    png = encode_png(px)
    from PIL import Image

    with Image.open(io.BytesIO(png)) as im:
        assert np.array_equal(np.asarray(im.convert("RGB")), px)
    assert decode_image(png) == (6, 6, pixel_features(px))


def _wav_bytes(samples: np.ndarray, sr: int = 16000, ch: int = 1) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(ch)
        wf.setsampwidth(2)
        wf.setframerate(sr)
        wf.writeframes((samples * 32767).astype("<i2").tobytes())
    return buf.getvalue()


def test_wav_decode_real():
    t = np.arange(0, 1600) / 16000.0
    sig = 0.5 * np.sin(2 * np.pi * 440 * t)
    sr, n, feats = decode_audio_wav(_wav_bytes(sig))
    assert sr == 16000 and n == 1600
    rms, mean_abs, peak, zcr = feats[:4]
    assert 0.30 < rms < 0.40          # sine RMS = amp/sqrt(2) ~ 0.354
    assert 0.25 < mean_abs < 0.35     # sine mean|x| = 2*amp/pi ~ 0.318
    assert 0.49 < peak <= 0.51
    assert 0.04 < zcr < 0.07          # 440 Hz -> ~880 crossings/s
    assert abs(sum(feats[4:]) - 1.0) < 1e-9  # histogram fractions


def test_image_features_spark_end_to_end_real_codec(spark):
    from bytesprocessor_spark.functions.imagecodec import decode_image as codec

    pngs = {i: _test_pixels(h=3 + i, w=4 + i, seed=20 + i) for i in range(3)}
    rows = [(i, bytearray(encode_png(px))) for i, px in pngs.items()]
    rows.append((99, bytearray(b"corrupt-payload")))
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r.media_id: r for r in image_features(df, codec=codec).collect()}
    for i, px in pngs.items():
        assert (got[i].width, got[i].height) == (px.shape[1], px.shape[0])
        assert got[i].features == pytest.approx(pixel_features(px), abs=1e-6)
    assert got[99].width is None and got[99].features is None  # error -> null row


def test_audio_features_spark_end_to_end_real_codec(spark):
    sig = np.linspace(-0.25, 0.25, 800)
    df = spark.createDataFrame(
        [(1, bytearray(_wav_bytes(sig, sr=8000))), (2, bytearray(b"not-a-wav"))],
        "media_id long, payload binary",
    )
    got = {r.media_id: r for r in audio_features(df, codec=decode_audio_wav).collect()}
    assert got[1].sample_rate == 8000 and got[1].n_samples == 800
    assert got[1].duration_s == pytest.approx(0.1)
    assert got[2].sample_rate is None  # corrupt payload -> null row


def test_ingest_media_dir_end_to_end(spark, tmp_path):
    """L5 ingest: a directory of real PNG + WAV files becomes the
    media-table shape via binaryFile (stable hash ids, kind/mime from
    extension, metadata map), and the ingested payloads decode through
    the real codec path."""
    import numpy as np

    from bytesprocessor_spark.functions.imagecodec import decode_image, encode_png
    from bytesprocessor_spark.functions.multimodal import (
        image_features,
        ingest_media_dir,
    )

    d = tmp_path / "media"
    d.mkdir()
    px = _test_pixels(4, 4)
    (d / "a.png").write_bytes(encode_png(px))
    (d / "b.png").write_bytes(encode_png(_test_pixels(3, 5, seed=9)))
    (d / "c.wav").write_bytes(_wav_bytes(np.zeros(100, dtype=np.int16)))
    (d / "notes.txt").write_text("not media")

    media = ingest_media_dir(spark, str(d))
    rows = {r.meta["src_path"].rsplit("/", 1)[-1]: r for r in media.collect()}
    assert rows["a.png"].kind == "image" and rows["a.png"].mime == "image/png"
    assert rows["c.wav"].kind == "audio"
    assert rows["notes.txt"].kind == "unknown"
    assert all(int(r.meta["n_bytes"]) == len(r.payload) for r in rows.values())

    # re-ingest => identical ids (path-hash stability)
    again = {r.meta["src_path"]: r.media_id for r in ingest_media_dir(spark, str(d)).collect()}
    assert {r.meta["src_path"]: r.media_id for r in rows.values()} == again

    images = media.where(media.kind == "image")
    feats = image_features(images, codec=decode_image).collect()
    dims = {(r.width, r.height) for r in feats}
    assert dims == {(4, 4), (5, 3)}


def test_image_near_dup_pairs_perceptual(spark):
    """aHash image dedup: a re-encoded copy (PNG vs BMP of the same
    pixels) and a lightly-noised copy pair with the original at low
    Hamming; a structurally different image does not pair."""
    import numpy as np

    from bytesprocessor_spark.functions.imagecodec import encode_bmp, encode_png
    from bytesprocessor_spark.functions.multimodal import image_near_dup_pairs

    rng = np.random.default_rng(3)
    base = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
    noised = np.clip(base.astype(int) + rng.integers(-4, 5, base.shape), 0, 255).astype(
        np.uint8
    )
    other = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
    rows = [
        (1, encode_png(base)),
        (2, encode_bmp(base)),     # identical pixels, different container
        (3, encode_png(noised)),
        (4, encode_png(other)),
        (5, b"not an image"),      # undecodable -> dropped, not fatal
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    pairs = {(r.id_a, r.id_b): r.hamming for r in image_near_dup_pairs(df, max_hamming=7).collect()}
    assert pairs.get((1, 2)) == 0
    assert (1, 3) in pairs and pairs[(1, 3)] <= 7
    assert not any(4 in p for p in pairs)
    assert not any(5 in p for p in pairs)
