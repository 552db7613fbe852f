"""Multimodal column operators (SURVEY §2.11 L5): image/audio/video
payloads as opaque binary columns with typed metadata, processed by
Arrow-batched UDFs over ``mapInPandas``.

Decode kernels are pluggable via the ``codec=`` hooks:

* **Real image decode** — ``functions.imagecodec.decode_image``
  (PIL when importable, else built-in pure-stdlib PNG/BMP/PPM
  decoders) producing features from the actual pixels.
* **Real audio decode** — :func:`decode_audio_wav` (stdlib ``wave``,
  PCM 8/16-bit) producing rate/length/amplitude features.
* **Deterministic hash stubs** — kept as the oracle-checkable
  kernels: their sha256-derived outputs are reproducible in ANY
  engine, which is what lets multimodal_image_meta/audio_meta/
  video_frames be DuckDB-verified end-to-end.  Video demux has no
  stdlib decoder, so the frame sampler remains stub-only (a real
  build plugs pyav/ffmpeg into the same hook).

The Spark side (schemas, Arrow batch iteration, partitioning, UDF
signatures, per-row error -> null-row policy) is identical whichever
kernel is plugged in.  The binary-payload pattern itself is exactly
how the pcap pipeline carries packets (BinaryType payload,
BytesProcessor.py:248).
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

# media record: payload + typed metadata, the L5 table shape
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("mime", T.StringType(), True),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

IMAGE_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("features", T.ArrayType(T.FloatType()), True),
    ]
)


def _stub_decode_image(payload: bytes) -> tuple[int, int, list[float]]:
    """Deterministic ORACLE-mode decode: dimensions and a 16-float
    signature derived from a content hash, reproducible in SQL (the
    multimodal_image_meta oracle re-derives it).  The REAL kernel with
    the same signature is ``functions.imagecodec.decode_image``
    (PIL, or built-in PNG/BMP/PPM) — pass it as ``codec=`` to
    :func:`image_features` to featurize actual pixels."""
    h = hashlib.sha256(payload or b"").digest()
    width = 1 + (struct.unpack_from(">H", h, 0)[0] % 4096)
    height = 1 + (struct.unpack_from(">H", h, 2)[0] % 4096)
    feats = [b / 255.0 for b in h[:16]]
    return width, height, feats


def image_features(
    df: DataFrame,
    codec: Callable[[bytes], tuple[int, int, list[float]]] = _stub_decode_image,
    payload_col: str = "payload",
    id_col: str = "media_id",
) -> DataFrame:
    """Decode + featurize image payloads via ``mapInPandas``: the codec
    runs once per row inside an Arrow batch; output is a typed feature
    table.  Partitioning is inherited — media tables should be stored
    with size-balanced files so decode work spreads evenly."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                try:
                    w, h, feats = codec(bytes(payload) if payload is not None else b"")
                except NotImplementedError:
                    raise
                except Exception:
                    out.append((mid, None, None, None, None))
                    continue
                out.append((mid, w, h, len(payload or b""), feats))
            yield pd.DataFrame(
                out, columns=["media_id", "width", "height", "n_bytes", "features"]
            )

    return df.select(id_col, payload_col).mapInPandas(run, schema=IMAGE_FEATURE_SCHEMA)


def _stub_sample_frames(payload: bytes, n_frames: int) -> list[bytes]:
    """Deterministic fake frame sampler: n content-addressed pseudo
    frames (sha256 of payload + ':' + ascii index — a form any SQL
    engine can reproduce, which is what the multimodal_video_frames
    oracle does).  A real implementation would demux with pyav/ffmpeg.
    """
    return [
        hashlib.sha256((payload or b"") + b":" + str(i).encode()).digest()
        for i in range(n_frames)
    ]


def sample_video_frames(
    df: DataFrame,
    n_frames: int = 4,
    codec: Callable[[bytes, int], list[bytes]] = _stub_sample_frames,
    payload_col: str = "payload",
    id_col: str = "media_id",
) -> DataFrame:
    """Video -> one row per sampled frame (media_id, frame_idx,
    frame_bytes): the fan-out shape for downstream image featurization.
    """
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("frame_idx", T.IntegerType(), False),
            T.StructField("frame", T.BinaryType(), True),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                frames = codec(bytes(payload) if payload is not None else b"", n_frames)
                rows.extend((mid, i, fr) for i, fr in enumerate(frames))
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "frame"])

    return df.select(id_col, payload_col).mapInPandas(run, schema=schema)


def decode_audio_stub(payload: bytes) -> list[float]:
    """Raising placeholder for formats with no stdlib decoder (mp3,
    flac, ogg...) — a real build plugs librosa/soundfile here.  PCM
    WAV decodes for real via :func:`decode_audio_wav`."""
    raise NotImplementedError("audio decode requires an audio codec library")


def decode_audio_wav(payload: bytes) -> tuple[int, int, list[float]]:
    """REAL audio codec for :func:`audio_features`: PCM WAV (8/16-bit,
    any channel count) via the stdlib ``wave`` module — no external
    library.  Returns (sample_rate, n_samples, 8-float signature):
    RMS, mean |x|, peak |x|, zero-crossing rate, then a 4-bin |x|
    histogram (fractions) — deterministic arithmetic on the decoded
    samples, so any backend decoding the same PCM agrees."""
    import io
    import wave

    import numpy as np

    with wave.open(io.BytesIO(payload or b"")) as wf:
        sr = wf.getframerate()
        n = wf.getnframes()
        ch = wf.getnchannels()
        sw = wf.getsampwidth()
        frames = wf.readframes(n)
    if sw == 2:
        arr = np.frombuffer(frames, dtype="<i2").astype(np.float64) / 32768.0
    elif sw == 1:
        arr = (np.frombuffer(frames, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    else:
        raise ValueError(f"unsupported WAV sample width {sw}")
    if ch > 1:
        arr = arr.reshape(-1, ch).mean(axis=1)
    if len(arr) == 0:
        raise ValueError("empty WAV")
    a = np.abs(arr)
    zc = float(np.count_nonzero(np.signbit(arr[1:]) != np.signbit(arr[:-1]))) / len(arr)
    hist, _ = np.histogram(a, bins=4, range=(0.0, 1.0))
    feats = [
        float(np.sqrt(np.mean(arr * arr))),
        float(a.mean()),
        float(a.max()),
        zc,
        *(float(x) / len(arr) for x in hist),
    ]
    return sr, n, feats


AUDIO_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("n_samples", T.LongType(), True),
        T.StructField("duration_s", T.DoubleType(), True),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("features", T.ArrayType(T.FloatType()), True),
    ]
)


def _stub_decode_audio_meta(payload: bytes) -> tuple[int, int, list[float]]:
    """Deterministic fake audio decode (the testable twin of
    ``decode_audio_stub``): sample rate, sample count and an 8-float
    signature derived from sha256(payload) — arithmetic a SQL engine
    can reproduce (the multimodal_audio_meta oracle does).  A real
    build swaps in soundfile/librosa behind the same signature."""
    h = hashlib.sha256(payload or b"").digest()
    sample_rate = 8000 * (1 + h[4] % 6)  # 8/16/24/32/40/48 kHz
    n_samples = 1 + (struct.unpack_from(">I", h, 8)[0] % 16_000_000)
    feats = [b / 255.0 for b in h[16:24]]
    return sample_rate, n_samples, feats


def audio_features(
    df: DataFrame,
    codec: Callable[[bytes], tuple[int, int, list[float]]] = _stub_decode_audio_meta,
    payload_col: str = "payload",
    id_col: str = "media_id",
) -> DataFrame:
    """Decode + featurize audio payloads via ``mapInPandas`` — same
    Arrow-batched plumbing contract as :func:`image_features`, with
    duration derived as one IEEE division of exact integers."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                try:
                    sr, n, feats = codec(bytes(payload) if payload is not None else b"")
                    # derived INSIDE the try: a parseable-but-corrupt WAV
                    # can declare framerate 0, and one bad payload must
                    # yield a null row, never kill the job
                    duration = n / sr
                except NotImplementedError:
                    raise
                except Exception:
                    out.append((mid, None, None, None, None, None))
                    continue
                out.append((mid, sr, n, duration, len(payload or b""), feats))
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id", "sample_rate", "n_samples", "duration_s", "n_bytes", "features",
                ],
            )

    return df.select(id_col, payload_col).mapInPandas(run, schema=AUDIO_FEATURE_SCHEMA)


_EXT_TO_KIND = {
    "png": ("image", "image/png"),
    "bmp": ("image", "image/bmp"),
    "ppm": ("image", "image/x-portable-pixmap"),
    "jpg": ("image", "image/jpeg"),
    "jpeg": ("image", "image/jpeg"),
    "wav": ("audio", "audio/wav"),
    "flac": ("audio", "audio/flac"),
    "mp3": ("audio", "audio/mpeg"),
    "mp4": ("video", "video/mp4"),
    "mkv": ("video", "video/x-matroska"),
    "webm": ("video", "video/webm"),
}


def ingest_media_dir(
    spark,
    path: str,
    glob: str | None = None,
    recursive: bool = True,
) -> DataFrame:
    """Ingest a directory of raw media files into the L5 media-table
    shape (:data:`MEDIA_SCHEMA` columns) via Spark's built-in
    ``binaryFile`` source: one task per file, payload as BinaryType,
    kind/mime derived from the extension, source path + length +
    modification time carried as typed metadata.

    ``media_id`` is the xxhash64 of the file path — stable across
    re-ingests (re-running over a grown directory keeps existing ids),
    which is what the downstream dedup/feature tables key on.  At lake
    scale, pair with ``partitionBy("kind")`` on the write so decode
    jobs scan only their modality.
    """
    from pyspark.sql import functions as F

    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    if recursive:
        reader = reader.option("recursiveFileLookup", "true")
    files = reader.load(path)
    ext = F.lower(F.element_at(F.split(F.col("path"), r"\."), -1))
    kind = F.lit(None).cast("string")
    mime = F.lit(None).cast("string")
    for e, (k, m) in _EXT_TO_KIND.items():
        kind = F.when(ext == e, F.lit(k)).otherwise(kind)
        mime = F.when(ext == e, F.lit(m)).otherwise(mime)
    return files.select(
        F.xxhash64("path").alias("media_id"),
        F.coalesce(kind, F.lit("unknown")).alias("kind"),
        mime.alias("mime"),
        F.col("content").alias("payload"),
        F.create_map(
            F.lit("src_path"), F.col("path"),
            F.lit("n_bytes"), F.col("length").cast("string"),
            F.lit("mtime"), F.col("modificationTime").cast("string"),
        ).alias("meta"),
    )


def image_ahash(
    df: DataFrame,
    codec: Callable[[bytes], "object"] | None = None,
    payload_col: str = "payload",
    id_col: str = "media_id",
    grid: int = 8,
    n_blocks: int = 4,
) -> DataFrame:
    """Perceptual average-hash (aHash) per image: decode, grayscale,
    block-mean downsample to ``grid``x``grid``, threshold at the mean —
    64 bits packed into ``n_blocks`` longs, the same sketch shape the
    text SimHash uses, so :func:`operators.dedup.block_hamming_pairs`
    runs the pigeonhole near-dup join over images unchanged.

    Robust to re-encoding and mild noise (the dedup cases a crawl
    actually hits); NOT to crops/rotations — that regime needs
    embedding dedup (L2) over a learned image encoder.
    ``codec`` decodes payload -> HxWx3 uint8 array (defaults to the
    built-in PNG/BMP/PPM decoder); undecodable rows yield null hashes.
    """
    import numpy as np

    if codec is None:
        # PIL-preferred pixel seam: JPEG/WebP decode when PIL exists,
        # built-in PNG/BMP/PPM otherwise — same default reach as
        # ingest_media_dir's accepted extensions
        from bytesprocessor_spark.functions.imagecodec import decode_pixels

        codec = decode_pixels
    width = grid * grid // n_blocks

    # carry the caller's id type through — hardcoding LongType here
    # silently coerced string keys (e.g. WebDataset sample basenames)
    schema = T.StructType(
        [
            T.StructField("id", df.schema[id_col].dataType, False),
            T.StructField("sh", T.ArrayType(T.LongType()), True),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                try:
                    rgb = np.asarray(codec(bytes(payload or b"")), dtype=np.float64)
                    gray = rgb.mean(axis=2)
                    h, w = gray.shape
                    # block-mean resize: average each grid cell
                    ys = (np.arange(grid + 1) * h) // grid
                    xs = (np.arange(grid + 1) * w) // grid
                    cells = np.array(
                        [
                            [
                                gray[ys[i]:max(ys[i + 1], ys[i] + 1),
                                     xs[j]:max(xs[j + 1], xs[j] + 1)].mean()
                                for j in range(grid)
                            ]
                            for i in range(grid)
                        ]
                    )
                    bits = (cells > cells.mean()).astype(np.int64).ravel()
                    blocks = [
                        int("".join(map(str, bits[b * width:(b + 1) * width])), 2)
                        for b in range(n_blocks)
                    ]
                    out.append((mid, blocks))
                except NotImplementedError:
                    raise  # an unimplemented codec must fail loudly,
                    # not read as "no duplicates" (same policy as
                    # image_features/audio_features)
                except Exception:
                    out.append((mid, None))
            yield pd.DataFrame(out, columns=["id", "sh"])

    return df.select(id_col, payload_col).mapInPandas(run, schema=schema)


def image_near_dup_pairs(
    df: DataFrame,
    max_hamming: int = 6,
    codec: Callable[[bytes], "object"] | None = None,
    payload_col: str = "payload",
    id_col: str = "media_id",
) -> DataFrame:
    """L5∘L2 composite: perceptual-hash near-duplicate image pairs via
    the same pigeonhole block join as text SimHash — decode once
    (Arrow-batched), a few longs per image thereafter; candidate join
    keys are (block, value), never pixels.

    The pigeonhole guarantee needs ``max_hamming < n_blocks`` (a pair
    within d bit flips must leave >= 1 of d+1 blocks untouched), so the
    block count adapts to the requested radius: the smallest
    power-of-two divisor of the 64 sketch bits that exceeds
    ``max_hamming`` (4 for d<=3, 8 for d<=7; larger radii are
    rejected — the blocks would be too narrow to prune and a 64-bit
    perceptual hash doesn't separate at that distance anyway)."""
    from pyspark.sql import functions as F

    from bytesprocessor_spark.operators.dedup import block_hamming_pairs

    if max_hamming >= 8:
        # 16+ blocks of a 64-bit sketch are only 4 bits wide: the
        # (block, value) equi-join buckets collapse to 16 values and
        # the "pigeonhole" candidate set degenerates toward the full
        # cross join.  Radii this large are past what a 64-bit
        # perceptual hash separates anyway — use embedding dedup (L2).
        raise ValueError(
            "max_hamming must be < 8 for the pigeonhole join on a 64-bit "
            "aHash (larger radii need embedding-based dedup)"
        )
    n_blocks = 4 if max_hamming < 4 else 8
    sk = image_ahash(df, codec=codec, payload_col=payload_col, id_col=id_col, n_blocks=n_blocks)
    return block_hamming_pairs(sk.where(F.col("sh").isNotNull()), max_hamming)
