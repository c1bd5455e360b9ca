"""Multimodal columns (BASELINE.json north-star): image/audio/video as
opaque BINARY columns with typed metadata, processed by Arrow-batched
``mapInPandas`` operators.

The container has no image/audio codecs, so the decode kernel is
STUBBED (deterministic byte-level fake behind an import-try —
``_decode_image`` raises NotImplementedError if someone flips
``USE_REAL_CODECS`` without PIL present). Everything Spark-side is
real and tested: binary schema, metadata struct, batch iteration
shape, per-partition processing, frame-sampling explode.

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
    """Deterministic stand-in for decode→feature-extract: a 16-bin
    byte histogram normalized to sum 1 — stable across runs/engines,
    shaped like a real embedding head."""
    if not payload:
        return [0.0] * _N_BINS
    arr = np.frombuffer(payload, dtype=np.uint8)
    bins = np.bincount(arr % _N_BINS, minlength=_N_BINS)
    return (bins / float(len(payload))).tolist()


def extract_features(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: batch-in/batch-out, never materializes the
    whole partition. This is the exact signature a real GPU/codec
    kernel plugs into."""
    for pdf in pdfs:
        feats = pdf["payload"].map(
            _decode_image if USE_REAL_CODECS else _fake_features
        )
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "mime": pdf["mime"],
                "n_bytes": pdf["n_bytes"],
                "features": feats,
            }
        )


@register("mm_decode_features", oracle=None, tags=("llm", "multimodal", "udf"))
def mm_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode + feature-extract over the binary column via mapInPandas
    (Arrow batches). Rows-only driver check; determinism and batch
    shape pinned in tests/test_llm.py."""
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


@register("mm_frame_sample", oracle=None, tags=("llm", "multimodal", "udf"))
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video-style frame sampling over binary payloads (video/mp4 rows
    only): mapInPandas explode into (doc_id, frame_idx, frame) rows.
    Rows-only driver check; shape pinned in tests/test_llm.py."""
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
    """Audio feature kernel: interpret the payload as unsigned 8-bit PCM,
    compute per-window RMS and peak — the exact batch shape a real
    (librosa/torchaudio) feature extractor plugs into; numpy here so
    the pipeline is testable without codec libraries."""
    import numpy as np

    for pdf in pdfs:
        out = {"doc_id": [], "window_idx": [], "rms": [], "peak": []}
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            samples = np.frombuffer(bytes(payload), dtype=np.uint8).astype(
                np.float64
            )
            samples = (samples - 128.0) / 128.0  # center to [-1, 1)
            n_win = len(samples) // _AUDIO_WIN
            for w in range(n_win):
                seg = samples[w * _AUDIO_WIN : (w + 1) * _AUDIO_WIN]
                out["doc_id"].append(doc_id)
                out["window_idx"].append(w)
                out["rms"].append(round(float(np.sqrt(np.mean(seg**2))), 6))
                out["peak"].append(round(float(np.abs(seg).max()), 6))
        yield pd.DataFrame(out)


@register("mm_audio_rms", oracle=None, tags=("llm", "multimodal", "udf"))
def mm_audio_rms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed RMS/peak over 'audio' payloads (audio/wav rows):
    mapInPandas explode into one row per analysis window. Rows-only
    driver check; determinism and window math pinned in
    tests/test_llm.py."""
    binary = mm_binary_ingest_impl(spark, sf_dir).filter(
        F.col("mime") == "audio/wav"
    )
    return binary.mapInPandas(audio_window_rms, _RMS_SCHEMA)


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
    block averaging — the deterministic stand-in for PIL's
    Image.resize(..., BOX); a real codec swaps in at the marked line
    without touching the Spark plumbing."""
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
            raw = np.frombuffer(bytes(payload), dtype=np.uint8)
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
            out["doc_id"].append(doc_id)
            out["src_side"].append(side)
            out["out_side"].append(_OUT_SIDE)
            out["pixels"].append(thumb.round().astype(np.uint8).tobytes())
            out["mean_px"].append(round(float(thumb.mean()), 6))
        yield pd.DataFrame(out)


@register("mm_image_resize", oracle=None, tags=("llm", "multimodal", "udf"))
def mm_image_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Thumbnail resize over 'image' payloads (image/png rows):
    mapInPandas box-filter downsample to a fixed 8x8 grid. Rows-only
    driver check; block-average math recomputed by hand in
    tests/test_llm.py. Map-only — blobs never shuffle; at scale the
    kernel is GPU/codec-swappable per Arrow batch."""
    binary = mm_binary_ingest_impl(spark, sf_dir).filter(
        F.col("mime") == "image/png"
    )
    return binary.mapInPandas(resize_images, _RESIZE_SCHEMA)
