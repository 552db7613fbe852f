"""Real image decode for the multimodal operators (SURVEY §2.11 L5).

Codec resolution order in :func:`decode_image`:

1. **PIL**, when importable — the production path (any format PIL
   knows; same pixel array => same features as the built-in path).
2. **Built-in pure-stdlib decoders** — PNG (zlib inflate + full
   filter reconstruction incl. Paeth), uncompressed 24-bit BMP, and
   binary PPM (P6).  These are REAL decoders producing the actual
   pixel array, not hash stubs; they exist so the container this
   engine is developed in (no PIL baked in) still exercises the
   entire decode -> featurize path end-to-end.
3. Unknown format -> ``ValueError`` (the mapInPandas wrapper in
   ``functions/multimodal.py`` turns per-row codec errors into null
   feature rows, so one corrupt payload never kills a 100 TB job).

The feature signature (:func:`pixel_features`) is computed from the
decoded pixels only, so every codec backend agrees bit-for-bit on the
same image.  The built-in decoders favor clarity over speed (per-
scanline Python loop in the PNG unfilter); at scale you ship PIL in
the executor image and this module automatically prefers it.

Parity note: the reference has no multimodal surface at all
(BytesProcessor.py:56-354 is packet-only); L5 is part of the
training-data-pipeline extension mandated by SURVEY §2.11.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

try:  # the production codec — absent in this dev container
    from PIL import Image as _PILImage  # type: ignore

    _HAVE_PIL = True
except Exception:  # pragma: no cover - environment dependent
    _PILImage = None
    _HAVE_PIL = False


def pixel_features(rgb: np.ndarray) -> list[float]:
    """16-float signature from an (h, w, 3) uint8 array: mean R/G/B,
    mean gray, then a 12-bin gray-level histogram (fractions).  Pure
    deterministic arithmetic on the pixel array, so every decode
    backend produces identical features for identical pixels."""
    px = rgb.astype(np.float64)
    means = px.reshape(-1, 3).mean(axis=0) / 255.0
    gray = px.mean(axis=2)
    hist, _ = np.histogram(gray, bins=12, range=(0.0, 256.0))
    frac = hist.astype(np.float64) / gray.size
    return [float(x) for x in (*means, gray.mean() / 255.0, *frac)]


# ---------------------------------------------------------------------------
# Built-in decoders (stdlib + numpy only)
# ---------------------------------------------------------------------------

def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _decode_png(payload: bytes) -> np.ndarray:
    """Minimal PNG decoder: 8-bit depth, color types 0/2/4/6, no
    interlace.  Full filter reconstruction (None/Sub/Up/Average/
    Paeth) per the PNG spec §9; returns (h, w, 3) uint8."""
    if payload[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG")
    pos, idat, meta = 8, [], None
    while pos + 8 <= len(payload):
        (length,), ctype = struct.unpack_from(">I", payload, pos), payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IHDR":
            w, h, depth, color, _comp, _filt, interlace = struct.unpack(">IIBBBBB", data)
            if depth != 8 or interlace != 0 or color not in (0, 2, 4, 6):
                raise ValueError(f"unsupported PNG (depth={depth} color={color} interlace={interlace})")
            meta = (w, h, {0: 1, 2: 3, 4: 2, 6: 4}[color])
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
    if meta is None or not idat:
        raise ValueError("truncated PNG")
    w, h, ch = meta
    raw = zlib.decompress(b"".join(idat))
    stride = w * ch
    if len(raw) < h * (stride + 1):
        raise ValueError("short PNG pixel data")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        ftype = raw[y * (stride + 1)]
        line = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1).copy()
        if ftype == 1:  # Sub — sequential along the line
            for i in range(ch, stride):
                line[i] = (int(line[i]) + int(line[i - ch])) & 0xFF
        elif ftype == 2:  # Up — vectorized
            line = (line.astype(np.int16) + prev).astype(np.uint8)
        elif ftype == 3:  # Average
            for i in range(stride):
                left = int(line[i - ch]) if i >= ch else 0
                line[i] = (line[i] + ((left + int(prev[i])) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                left = int(line[i - ch]) if i >= ch else 0
                ul = int(prev[i - ch]) if i >= ch else 0
                line[i] = (line[i] + _paeth(left, int(prev[i]), ul)) & 0xFF
        elif ftype != 0:
            raise ValueError(f"bad PNG filter {ftype}")
        out[y] = line
        prev = out[y]
    px = out.reshape(h, w, ch)
    if ch == 1:
        return np.repeat(px, 3, axis=2)
    if ch == 2:  # gray + alpha -> drop alpha
        return np.repeat(px[:, :, :1], 3, axis=2)
    return px[:, :, :3]  # RGB / RGBA -> RGB


def _decode_bmp(payload: bytes) -> np.ndarray:
    """Uncompressed 24-bit BI_RGB BMP -> (h, w, 3) uint8 (rows are
    stored bottom-up, BGR, 4-byte padded)."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP")
    (off,) = struct.unpack_from("<I", payload, 10)
    w, h = struct.unpack_from("<ii", payload, 18)
    (bpp,) = struct.unpack_from("<H", payload, 28)
    (comp,) = struct.unpack_from("<I", payload, 30)
    if bpp != 24 or comp != 0:
        raise ValueError(f"unsupported BMP (bpp={bpp} compression={comp})")
    flip = h > 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    rows = [
        np.frombuffer(payload, dtype=np.uint8, count=w * 3, offset=off + y * stride)
        .reshape(w, 3)[:, ::-1]  # BGR -> RGB
        for y in range(h)
    ]
    px = np.stack(rows[::-1] if flip else rows)
    return px


def _decode_ppm(payload: bytes) -> np.ndarray:
    """Binary PPM (P6), maxval 255 -> (h, w, 3) uint8."""
    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM")
    # header: magic, width, height, maxval as whitespace/comment-separated tokens
    tokens, pos = [], 2
    while len(tokens) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        tokens.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = tokens
    if maxval != 255:
        raise ValueError("only maxval=255 PPM supported")
    return np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=pos).reshape(h, w, 3)


def decode_image_builtin(payload: bytes) -> np.ndarray:
    """Dispatch on magic bytes to the pure-stdlib decoders."""
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        return _decode_png(payload)
    if payload[:2] == b"BM":
        return _decode_bmp(payload)
    if payload[:2] == b"P6":
        return _decode_ppm(payload)
    raise ValueError("unknown image format (built-in decoders: PNG/BMP/PPM)")


def decode_pixels(payload: bytes) -> np.ndarray:
    """(h, w, 3) uint8 pixel decode — PIL when available (any format
    PIL knows: JPEG, WebP, ...), else the built-in PNG/BMP/PPM
    decoders.  The shared pixel seam for every pixel-level operator
    (features, perceptual hashing)."""
    if not payload:
        raise ValueError("empty image payload")
    if _HAVE_PIL:
        import io

        with _PILImage.open(io.BytesIO(payload)) as im:
            return np.asarray(im.convert("RGB"), dtype=np.uint8)
    return decode_image_builtin(payload)


def decode_image(payload: bytes) -> tuple[int, int, list[float]]:
    """REAL image codec for ``functions.multimodal.image_features``:
    returns (width, height, 16-float pixel feature signature) from
    :func:`decode_pixels`."""
    rgb = decode_pixels(payload)
    h, w = rgb.shape[:2]
    return w, h, pixel_features(rgb)


# ---------------------------------------------------------------------------
# Tiny stdlib PNG/BMP writers — test fixtures need real files without PIL
# ---------------------------------------------------------------------------

def encode_png(rgb: np.ndarray) -> bytes:
    """(h, w, 3) uint8 -> PNG bytes (filter 0 scanlines, one IDAT)."""
    h, w = rgb.shape[:2]

    def chunk(ctype: bytes, data: bytes) -> bytes:
        body = ctype + data
        return struct.pack(">I", len(data)) + body + struct.pack(">I", zlib.crc32(body))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = b"".join(b"\x00" + rgb[y].tobytes() for y in range(h))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def encode_bmp(rgb: np.ndarray) -> bytes:
    """(h, w, 3) uint8 -> uncompressed 24-bit BMP bytes."""
    h, w = rgb.shape[:2]
    stride = (w * 3 + 3) & ~3
    pad = b"\x00" * (stride - w * 3)
    rows = b"".join(rgb[y, :, ::-1].tobytes() + pad for y in range(h - 1, -1, -1))
    header = struct.pack("<2sIHHI", b"BM", 54 + len(rows), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(rows), 2835, 2835, 0, 0)
    return header + info + rows
