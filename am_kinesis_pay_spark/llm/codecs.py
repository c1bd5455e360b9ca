"""Real container codecs for the multimodal path (no codec libraries
needed): RIFF/WAVE PCM audio and uncompressed 24-bit BMP images, each
with a writer and a validating parser in pure numpy.

llm/multimodal.py's feature kernels deliberately stub the decode step
because this image ships no PIL/librosa — but uncompressed CONTAINER
formats need no codec library at all, only correct header/chunk
parsing. This module upgrades the stub honestly: WAV and BMP decode
for REAL (magic numbers, chunk walking, row padding, bottom-up row
order, channel order), while compressed codecs (PNG/JPEG/MP4) remain
gated behind USE_REAL_CODECS exactly as before.

The `mm_codec_roundtrip` operator proves the decoders end-to-end
inside a Spark plan: synthesize genuine WAV/BMP blobs from document
bytes in one mapInPandas stage, decode them with the real parsers,
and emit header-derived metadata plus an md5 over the DECODED
samples/pixels. Because encode→decode must reproduce the source bytes
bit-for-bit (incl. undoing BMP's 4-byte row padding and BGR order),
the md5 only matches DuckDB's md5 over the same source prefix if the
parser actually walks the format — which is what the oracle checks.
Deterministically corrupted blobs (doc_id % 31 == 0: magic overwritten)
must route to a quarantine row, not crash the job — the error-routing
pattern a 100 TB media pipeline needs (decode failures are data, not
exceptions).

Scale shape: map-only over Arrow batches, blobs never enter a shuffle
key, output is fixed-width metadata — identical plumbing to the other
mm_* kernels (SCALE.md multimodal note applies unchanged).
"""

from __future__ import annotations

import hashlib
import struct
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

from am_kinesis_pay_spark.registry import register
from am_kinesis_pay_spark.llm.multimodal import mm_binary_ingest_impl

WAV_SAMPLE_RATE = 8000


# --- RIFF/WAVE (PCM) ---------------------------------------------------


def encode_wav(
    pcm: np.ndarray, sample_rate: int = WAV_SAMPLE_RATE, channels: int = 1
) -> bytes:
    """Minimal canonical RIFF/WAVE writer: fmt chunk (PCM) + data
    chunk. 8-bit PCM is unsigned by spec; 16-bit is signed LE."""
    pcm = np.asarray(pcm)
    if pcm.dtype == np.uint8:
        bits = 8
    elif pcm.dtype == np.int16:
        bits = 16
    else:
        raise ValueError(f"unsupported PCM dtype {pcm.dtype}")
    data = pcm.tobytes()
    block_align = channels * bits // 8
    fmt = struct.pack(
        "<HHIIHH",
        1,  # wFormatTag = PCM
        channels,
        sample_rate,
        sample_rate * block_align,  # byte rate
        block_align,
        bits,
    )
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(blob: bytes) -> tuple[dict, np.ndarray]:
    """Validating RIFF chunk walker. Returns (header metadata, samples).
    Raises ValueError on malformed input — callers route, not crash."""
    if len(blob) < 12 or blob[0:4] != b"RIFF" or blob[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    (riff_size,) = struct.unpack_from("<I", blob, 4)
    if riff_size != len(blob) - 8:
        raise ValueError("RIFF size field disagrees with stream length")
    pos, fmt_meta, data = 12, None, None
    while pos + 8 <= len(blob):
        cid = blob[pos : pos + 4]
        (csize,) = struct.unpack_from("<I", blob, pos + 4)
        payload = blob[pos + 8 : pos + 8 + csize]
        if len(payload) != csize:
            raise ValueError(f"truncated chunk {cid!r}")
        if cid == b"fmt ":
            tag, channels, rate, _brate, _align, bits = struct.unpack_from(
                "<HHIIHH", payload, 0
            )
            if tag != 1:
                raise ValueError(f"not PCM (wFormatTag={tag})")
            fmt_meta = {"channels": channels, "sample_rate": rate, "bits": bits}
        elif cid == b"data":
            data = payload
        pos += 8 + csize + (csize & 1)  # chunks are word-aligned
    if fmt_meta is None or data is None:
        raise ValueError("missing fmt/data chunk")
    dtype = np.uint8 if fmt_meta["bits"] == 8 else np.dtype("<i2")
    samples = np.frombuffer(data, dtype=dtype)
    fmt_meta["n_samples"] = len(samples) // fmt_meta["channels"]
    return fmt_meta, samples


# --- BMP (uncompressed 24-bit, BITMAPINFOHEADER) -----------------------


def encode_bmp(gray: np.ndarray) -> bytes:
    """Canonical uncompressed 24-bit BMP from an HxW uint8 grayscale
    array: BGR triplets (equal channels), rows bottom-up, each row
    padded to a 4-byte boundary — the format as real writers emit it."""
    gray = np.asarray(gray, dtype=np.uint8)
    h, w = gray.shape
    row_raw = w * 3
    pad = (-row_raw) % 4
    rows = []
    for r in range(h - 1, -1, -1):  # bottom-up
        bgr = np.repeat(gray[r], 3).tobytes()
        rows.append(bgr + b"\x00" * pad)
    pixel_data = b"".join(rows)
    info = struct.pack(
        "<IiiHHIIiiII",
        40,  # biSize (BITMAPINFOHEADER)
        w,
        h,  # positive height = bottom-up
        1,  # planes
        24,  # bpp
        0,  # BI_RGB (uncompressed)
        len(pixel_data),
        2835,
        2835,  # 72 DPI
        0,
        0,
    )
    offset = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", offset + len(pixel_data), 0, 0, offset)
    return header + info + pixel_data


def decode_bmp(blob: bytes) -> tuple[dict, np.ndarray]:
    """Validating BMP parser for the uncompressed 24-bit form. Undoes
    row padding, bottom-up order, and channel replication; returns
    (metadata, HxW uint8 grayscale). Raises ValueError on anything
    malformed or unsupported."""
    if len(blob) < 54 or blob[0:2] != b"BM":
        raise ValueError("not a BMP stream")
    _, fsize, _, _, offset = struct.unpack_from("<2sIHHI", blob, 0)
    if fsize != len(blob):
        raise ValueError("BMP size field disagrees with stream length")
    bisize, w, h, planes, bpp, comp = struct.unpack_from("<IiiHHI", blob, 14)
    if bisize != 40 or planes != 1 or bpp != 24 or comp != 0:
        raise ValueError("unsupported BMP variant")
    if w <= 0 or h <= 0:
        raise ValueError("top-down/degenerate BMP not supported here")
    row_raw = w * 3
    stride = row_raw + ((-row_raw) % 4)
    if offset + stride * h > len(blob):
        raise ValueError("truncated pixel array")
    rows = np.frombuffer(
        blob, dtype=np.uint8, count=stride * h, offset=offset
    ).reshape(h, stride)[:, :row_raw]
    bgr = rows.reshape(h, w, 3)[::-1]  # undo bottom-up
    if not (bgr[..., 0] == bgr[..., 1]).all() or not (
        bgr[..., 1] == bgr[..., 2]
    ).all():
        # color images are fine to parse; this pipeline stores gray
        raise ValueError("expected grayscale-replicated channels")
    return {"width": w, "height": h, "bits": bpp}, bgr[..., 0].copy()


# --- PNG (8-bit grayscale, non-interlaced; REAL zlib inflate) ----------
#
# A COMPRESSED format decoded for real with no codec library: PNG is
# zlib DEFLATE (stdlib) over per-scanline-filtered rows. The decoder
# below does genuine format work — chunk walking with per-chunk CRC-32
# verification, IHDR validation, IDAT reassembly, inflate, and
# reversal of all five scanline filters (None/Sub/Up/Average/Paeth).
# Only formats needing an actual signal codec (JPEG DCT, MP4/audio
# codecs) remain gated behind USE_REAL_CODECS.

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def encode_png(gray: np.ndarray, filter_mode: str = "none") -> bytes:
    """Genuine PNG writer (8-bit grayscale, color type 0, non-
    interlaced): real zlib DEFLATE over filtered scanlines, CRC-32 on
    every chunk. ``filter_mode`` 'none' emits filter-0 rows (the fast-
    writer shape); 'cycle' rotates through all five PNG filter types
    row by row, producing streams that exercise every reverse-filter
    path in the decoder — as real optimizing encoders do."""
    gray = np.asarray(gray, dtype=np.uint8)
    h, w = gray.shape
    raw = bytearray()
    prev = np.zeros(w, dtype=np.int16)
    for r in range(h):
        row = gray[r].astype(np.int16)
        ft = 0 if filter_mode == "none" else r % 5
        if ft == 0:
            filt = gray[r].tobytes()
        elif ft == 1:  # Sub
            left = np.concatenate(([0], row[:-1]))
            filt = ((row - left) % 256).astype(np.uint8).tobytes()
        elif ft == 2:  # Up
            filt = ((row - prev) % 256).astype(np.uint8).tobytes()
        elif ft == 3:  # Average
            left = np.concatenate(([0], row[:-1]))
            filt = ((row - (left + prev) // 2) % 256).astype(np.uint8).tobytes()
        else:  # Paeth
            out = bytearray(w)
            for i in range(w):
                a = int(row[i - 1]) if i else 0
                b = int(prev[i])
                c = int(prev[i - 1]) if i else 0
                out[i] = (int(row[i]) - _paeth(a, b, c)) % 256
            filt = bytes(out)
        raw.append(ft)
        raw += filt
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _png_chunk(b"IEND", b"")
    )


def decode_png(blob: bytes) -> tuple[dict, np.ndarray]:
    """Validating PNG decoder for the 8-bit grayscale non-interlaced
    form: signature + chunk walk with CRC-32 verification on EVERY
    chunk, IHDR-first/IEND-last ordering, IDAT reassembly, real zlib
    inflate, size cross-check against IHDR dims, then reversal of all
    five scanline filters. Raises ValueError on anything malformed or
    unsupported — callers route, not crash."""
    if len(blob) < 8 or blob[:8] != _PNG_SIG:
        raise ValueError("not a PNG stream")
    pos = 8
    ihdr: dict | None = None
    idat = bytearray()
    seen_end = False
    while pos < len(blob):
        if pos + 8 > len(blob):
            raise ValueError("truncated chunk header")
        (clen,) = struct.unpack_from(">I", blob, pos)
        ctype = blob[pos + 4 : pos + 8]
        if pos + 12 + clen > len(blob):
            raise ValueError(f"truncated chunk {ctype!r}")
        data = blob[pos + 8 : pos + 8 + clen]
        (crc,) = struct.unpack_from(">I", blob, pos + 8 + clen)
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"CRC mismatch in chunk {ctype!r}")
        if ihdr is None:
            if ctype != b"IHDR":
                raise ValueError("first chunk is not IHDR")
            w, h, depth, color, comp, filt, inter = struct.unpack(
                ">IIBBBBB", data
            )
            if depth != 8 or color != 0 or comp != 0 or filt != 0 or inter != 0:
                raise ValueError(
                    "unsupported PNG variant (need gray8 non-interlaced)"
                )
            if w < 1 or h < 1:
                raise ValueError("degenerate PNG dimensions")
            ihdr = {"width": w, "height": h, "bits": depth}
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            seen_end = True
            pos += 12 + clen
            break
        pos += 12 + clen
    if ihdr is None or not seen_end or not idat:
        raise ValueError("missing IHDR/IDAT/IEND")
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as e:
        raise ValueError(f"corrupt DEFLATE stream: {e}") from None
    w, h = ihdr["width"], ihdr["height"]
    if len(raw) != (w + 1) * h:
        raise ValueError("decompressed size disagrees with IHDR dims")
    gray = np.zeros((h, w), dtype=np.uint8)
    prev = np.zeros(w, dtype=np.int32)
    for r in range(h):
        ft = raw[r * (w + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=w, offset=r * (w + 1) + 1
        ).astype(np.int32)
        if ft == 0:
            rec = line
        elif ft == 2:  # Up: vectorized
            rec = (line + prev) % 256
        elif ft in (1, 3, 4):  # left-dependent: sequential within row
            rec = np.zeros(w, dtype=np.int32)
            for i in range(w):
                a = int(rec[i - 1]) if i else 0
                if ft == 1:
                    pred = a
                elif ft == 3:
                    pred = (a + int(prev[i])) // 2
                else:
                    pred = _paeth(
                        a, int(prev[i]), int(prev[i - 1]) if i else 0
                    )
                rec[i] = (int(line[i]) + pred) % 256
        else:
            raise ValueError(f"unknown scanline filter {ft}")
        gray[r] = rec.astype(np.uint8)
        prev = rec
    return ihdr, gray


# --- GIF87a (8-bit grayscale, single image; REAL LZW from scratch) ----
#
# A second compressed format, and unlike PNG the compressor itself is
# ours: GIF's variable-width LZW (9->12-bit codes, CLEAR/EOI, the
# KwKwK same-code case, dictionary reset at 4096) implemented from the
# public specification. Encoder and decoder are developed against the
# spec independently of each other and pinned by roundtrip property
# tests including the degenerate runs that force KwKwK and the
# dictionary-reset path. GIF carries NO integrity checksum, so unlike
# PNG only STRUCTURAL corruption (magic, truncation, size fields,
# invalid codes) is detectable — documented honestly where it matters.

_GIF_MAGICS = (b"GIF87a", b"GIF89a")


def _lzw_encode(data: bytes, min_code_size: int = 8) -> bytes:
    """GIF-variant LZW: emits CLEAR first, grows code width when the
    next free code crosses a power of two, resets the dictionary via
    CLEAR when it fills at 4096, ends with EOI. LSB-first bit packing
    (the GIF convention)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nacc = 0
    width = min_code_size + 1

    def emit(code: int) -> None:
        nonlocal acc, nacc
        acc |= code << nacc
        nacc += width
        while nacc >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nacc -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    emit(clear)
    w = b""
    for byte in data:
        wc = w + bytes([byte])
        if wc in table:
            w = wc
            continue
        emit(table[w])
        if next_code < 4096:
            table[wc] = next_code
            next_code += 1
            # one LATER than the decoder's own growth point: the
            # decoder's dictionary add lags the encoder's by one code,
            # so its table reaches 2^width one code after ours does
            if next_code == (1 << width) + 1 and width < 12:
                width += 1
        else:
            emit(clear)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        w = bytes([byte])
    if w:
        emit(table[w])
    emit(eoi)
    if nacc:
        out.append(acc & 0xFF)
    return bytes(out)


def _lzw_decode(data: bytes, min_code_size: int = 8) -> bytes:
    """Validating GIF-variant LZW decoder: handles width growth, the
    KwKwK (code == next free code) case, CLEAR resets, and rejects
    out-of-range codes or streams missing EOI."""
    clear = 1 << min_code_size
    eoi = clear + 1
    width = min_code_size + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    out = bytearray()
    acc = 0
    nacc = 0
    pos = 0
    prev: bytes | None = None
    ended = False
    while True:
        while nacc < width:
            if pos >= len(data):
                if ended:
                    break
                raise ValueError("LZW stream ended without EOI")
            acc |= data[pos] << nacc
            pos += 1
            nacc += 8
        if nacc < width:
            break
        code = acc & ((1 << width) - 1)
        acc >>= width
        nacc -= width
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            ended = True
            break
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]  # KwKwK
        else:
            raise ValueError(f"invalid LZW code {code}")
        out += entry
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry
    if not ended:
        raise ValueError("LZW stream ended without EOI")
    return bytes(out)


def encode_gif(gray: np.ndarray) -> bytes:
    """Genuine GIF87a writer for an HxW uint8 grayscale array: logical
    screen descriptor, 256-entry grayscale global color table, image
    descriptor, real LZW-compressed indices in <=255-byte sub-blocks,
    trailer."""
    gray = np.asarray(gray, dtype=np.uint8)
    h, w = gray.shape
    out = bytearray(b"GIF87a")
    out += struct.pack("<HH", w, h)
    out.append(0xF7)  # GCT present, 8-bit color res, 256 entries
    out += b"\x00\x00"  # bg color, aspect
    for i in range(256):  # grayscale global color table
        out += bytes((i, i, i))
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + b"\x00"
    out.append(8)  # LZW min code size
    compressed = _lzw_encode(gray.tobytes())
    for i in range(0, len(compressed), 255):
        block = compressed[i : i + 255]
        out.append(len(block))
        out += block
    out += b"\x00\x3b"  # block terminator + trailer
    return bytes(out)


def decode_gif(blob: bytes) -> tuple[dict, np.ndarray]:
    """Validating GIF decoder for the grayscale single-image form:
    magic, screen/image descriptors, grayscale color table check,
    extension-block skipping (GIF89a streams), sub-block reassembly,
    real LZW decode, pixel-count cross-check. Raises ValueError on
    anything malformed — note GIF has NO checksum, so only structural
    corruption is detectable (PNG's CRC walk is the integrity story)."""
    if len(blob) < 13 or blob[:6] not in _GIF_MAGICS:
        raise ValueError("not a GIF stream")
    w, h = struct.unpack_from("<HH", blob, 6)
    packed = blob[10]
    if not packed & 0x80:
        raise ValueError("missing global color table")
    gct_size = 2 << (packed & 0x07)
    pos = 13
    gct = blob[pos : pos + 3 * gct_size]
    if len(gct) != 3 * gct_size:
        raise ValueError("truncated color table")
    pal = np.frombuffer(gct, dtype=np.uint8).reshape(gct_size, 3)
    if not (pal[:, 0] == pal[:, 1]).all() or not (pal[:, 1] == pal[:, 2]).all():
        raise ValueError("expected grayscale color table")
    pos += 3 * gct_size
    while pos < len(blob) and blob[pos] == 0x21:  # extension blocks
        pos += 2
        while pos < len(blob) and blob[pos] != 0:
            pos += 1 + blob[pos]
        pos += 1
    if pos >= len(blob) or blob[pos] != 0x2C:
        raise ValueError("missing image descriptor")
    ix, iy, iw, ih = struct.unpack_from("<HHHH", blob, pos + 1)
    ipacked = blob[pos + 9]
    if (ix, iy, iw, ih) != (0, 0, w, h) or ipacked & 0xC0:
        raise ValueError("unsupported GIF layout (offset/local-table/interlace)")
    pos += 10
    if pos >= len(blob):
        raise ValueError("truncated before LZW data")
    min_code = blob[pos]
    if min_code != 8:
        raise ValueError(f"unsupported LZW min code size {min_code}")
    pos += 1
    compressed = bytearray()
    while True:
        if pos >= len(blob):
            raise ValueError("unterminated sub-block chain")
        n = blob[pos]
        pos += 1
        if n == 0:
            break
        block = blob[pos : pos + n]
        if len(block) != n:
            raise ValueError("truncated sub-block")
        compressed += block
        pos += n
    if pos >= len(blob) or blob[pos] != 0x3B:
        raise ValueError("missing GIF trailer")
    indices = _lzw_decode(bytes(compressed))
    if len(indices) != w * h:
        raise ValueError("decoded pixel count disagrees with dimensions")
    idx = np.frombuffer(indices, dtype=np.uint8)
    if gct_size < 256 and int(idx.max(initial=0)) >= gct_size:
        raise ValueError("pixel index outside color table")
    gray = pal[idx, 0].reshape(h, w).copy()
    return {"width": w, "height": h, "bits": 8}, gray


# --- Spark operator ----------------------------------------------------

_ROUNDTRIP_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("container", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_samples", T.IntegerType()),
        T.StructField("payload_md5", T.StringType()),
    ]
)

_CORRUPT_MOD = 31


def codec_roundtrip(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Encode each blob into its REAL container (wav for audio rows,
    bmp for image rows), corrupt the magic of every doc_id % 31 == 0
    blob, then decode with the validating parsers. payload_md5 hashes
    the DECODED samples/pixels — equal to the source bytes' md5 only
    if the parser truly reverses the container layout."""
    for pdf in pdfs:
        out = {k.name: [] for k in _ROUNDTRIP_SCHEMA.fields}

        def emit(doc_id, container, width, height, rate, n, md5hex):
            out["doc_id"].append(doc_id)
            out["container"].append(container)
            out["width"].append(width)
            out["height"].append(height)
            out["sample_rate"].append(rate)
            out["n_samples"].append(n)
            out["payload_md5"].append(md5hex)

        for doc_id, mime, payload in zip(
            pdf["doc_id"], pdf["mime"], pdf["payload"]
        ):
            raw = np.frombuffer(bytes(payload), dtype=np.uint8)
            if mime == "audio/wav":
                blob = encode_wav(raw)
            elif mime == "image/png":  # stand-in image bytes -> real BMP
                side = int(len(raw) ** 0.5)
                if side < 1:
                    continue
                blob = encode_bmp(raw[: side * side].reshape(side, side))
            else:
                continue  # compressed video stays behind USE_REAL_CODECS
            if doc_id % _CORRUPT_MOD == 0:
                blob = b"XX" + blob[2:]
            try:
                if mime == "audio/wav":
                    meta, samples = decode_wav(blob)
                    emit(
                        doc_id,
                        "wav",
                        None,
                        None,
                        meta["sample_rate"],
                        meta["n_samples"],
                        hashlib.md5(samples.tobytes()).hexdigest(),
                    )
                else:
                    meta, gray = decode_bmp(blob)
                    emit(
                        doc_id,
                        "bmp",
                        meta["width"],
                        meta["height"],
                        None,
                        None,
                        hashlib.md5(gray.tobytes()).hexdigest(),
                    )
            except ValueError:
                emit(doc_id, "corrupt", None, None, None, None, None)
        yield pd.DataFrame(out)


_ROUNDTRIP_ORACLE = f"""
WITH blobs AS (
  SELECT doc_id, text, octet_length(encode(text)) AS n,
    CASE WHEN doc_id % 3 = 0 THEN 'image/png' ELSE 'audio/wav' END AS mime
  FROM documents WHERE doc_id % 3 IN (0, 1)
), sized AS (
  SELECT *, CAST(floor(sqrt(n)) AS INT) AS side FROM blobs
)
SELECT doc_id,
  CASE WHEN doc_id % {_CORRUPT_MOD} = 0 THEN 'corrupt'
       WHEN mime = 'audio/wav' THEN 'wav' ELSE 'bmp' END AS container,
  CASE WHEN doc_id % {_CORRUPT_MOD} <> 0 AND mime = 'image/png'
       THEN side END AS width,
  CASE WHEN doc_id % {_CORRUPT_MOD} <> 0 AND mime = 'image/png'
       THEN side END AS height,
  CASE WHEN doc_id % {_CORRUPT_MOD} <> 0 AND mime = 'audio/wav'
       THEN {WAV_SAMPLE_RATE} END AS sample_rate,
  CASE WHEN doc_id % {_CORRUPT_MOD} <> 0 AND mime = 'audio/wav'
       THEN CAST(n AS INTEGER) END AS n_samples,
  CASE WHEN doc_id % {_CORRUPT_MOD} = 0 THEN NULL
       WHEN mime = 'audio/wav' THEN md5(text)
       ELSE md5(substr(text, 1, side * side)) END AS payload_md5
FROM sized
WHERE NOT (mime = 'image/png' AND side < 1)
"""


@register(
    "mm_codec_roundtrip",
    oracle=_ROUNDTRIP_ORACLE,
    tags=("llm", "multimodal", "udf"),
)
def mm_codec_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real-container decode proof: wrap each audio/image payload in a
    genuine WAV/BMP (writers above), decode with the validating
    parsers, and emit header metadata + an md5 over the decoded
    samples/pixels. Oracle-exact because decode(encode(bytes)) must be
    bit-identical to the source prefix (DuckDB hashes the same bytes
    directly; ASCII corpus: char == byte), header fields are
    deterministic arithmetic, and corrupted-magic rows (doc_id % 31)
    must surface as quarantine rows — decode failures are data. Video
    rows are excluded: MP4 needs real compressed codecs, still gated
    behind USE_REAL_CODECS in llm/multimodal.py."""
    binary = mm_binary_ingest_impl(spark, sf_dir).filter(
        F.col("mime").isin("audio/wav", "image/png")
    )
    return binary.mapInPandas(codec_roundtrip, _ROUNDTRIP_SCHEMA)


_PNG_ROUNDTRIP_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("container", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("payload_md5", T.StringType()),
    ]
)

# SIG(8) + IHDR chunk(4 len + 4 type + 13 data + 4 crc) + IDAT header(8)
_PNG_FIRST_IDAT_BYTE = 8 + 25 + 8


def png_roundtrip(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Encode each image payload as a GENUINE compressed PNG (cycling
    through all five scanline filters), corrupt one DEFLATE byte of
    every doc_id % 31 == 0 blob (signature and layout stay plausible —
    only CRC verification can catch it), then decode with the
    validating inflate+unfilter parser. payload_md5 hashes the DECODED
    pixels — equal to the source bytes' md5 only if the decoder truly
    reverses compression and filtering."""
    for pdf in pdfs:
        out: dict[str, list] = {k.name: [] for k in _PNG_ROUNDTRIP_SCHEMA.fields}
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            raw = np.frombuffer(bytes(payload), dtype=np.uint8)
            side = int(len(raw) ** 0.5)
            if side < 1:
                continue
            blob = encode_png(
                raw[: side * side].reshape(side, side), filter_mode="cycle"
            )
            if doc_id % _CORRUPT_MOD == 0:
                b = bytearray(blob)
                b[_PNG_FIRST_IDAT_BYTE] ^= 0xFF
                blob = bytes(b)
            try:
                meta, gray = decode_png(blob)
                out["doc_id"].append(doc_id)
                out["container"].append("png")
                out["width"].append(meta["width"])
                out["height"].append(meta["height"])
                out["payload_md5"].append(
                    hashlib.md5(gray.tobytes()).hexdigest()
                )
            except ValueError:
                out["doc_id"].append(doc_id)
                out["container"].append("corrupt")
                out["width"].append(None)
                out["height"].append(None)
                out["payload_md5"].append(None)
        yield pd.DataFrame(out)


_PNG_ROUNDTRIP_ORACLE = f"""
WITH imgs AS (
  SELECT doc_id, text,
    CAST(floor(sqrt(octet_length(encode(text)))) AS INT) AS side
  FROM documents WHERE doc_id % 3 = 0
)
SELECT doc_id,
  CASE WHEN doc_id % {_CORRUPT_MOD} = 0 THEN 'corrupt' ELSE 'png' END AS container,
  CASE WHEN doc_id % {_CORRUPT_MOD} <> 0 THEN side END AS width,
  CASE WHEN doc_id % {_CORRUPT_MOD} <> 0 THEN side END AS height,
  CASE WHEN doc_id % {_CORRUPT_MOD} <> 0
       THEN md5(substr(text, 1, side * side)) END AS payload_md5
FROM imgs WHERE side >= 1
"""


@register(
    "mm_codec_png_roundtrip",
    oracle=_PNG_ROUNDTRIP_ORACLE,
    tags=("llm", "multimodal", "udf"),
)
def mm_codec_png_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COMPRESSED-container decode proof, no codec library: each image
    payload becomes a genuine zlib-DEFLATE PNG with all five scanline
    filters in play, and the validating decoder (CRC walk + inflate +
    unfilter) must reproduce the source pixels bit-for-bit for the md5
    to match DuckDB's hash of the same bytes. Deflate-corrupted blobs
    (doc_id % 31 — one flipped IDAT byte, catchable only by CRC) must
    route to quarantine rows, not crash the job. Map-only over Arrow
    batches; JPEG/MP4 (actual signal codecs) remain the only gated
    formats."""
    binary = mm_binary_ingest_impl(spark, sf_dir).filter(
        F.col("mime") == "image/png"
    )
    return binary.mapInPandas(png_roundtrip, _PNG_ROUNDTRIP_SCHEMA)


def gif_roundtrip(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Encode each image payload as a genuine GIF87a (real from-scratch
    LZW), corrupt the magic of every doc_id % 31 == 0 blob (GIF has no
    checksum, so structural corruption is the detectable class), then
    decode with the validating parser. payload_md5 hashes the DECODED
    pixels — equal to the source bytes' md5 only if the LZW round trip
    is exact."""
    for pdf in pdfs:
        out: dict[str, list] = {
            k.name: [] for k in _PNG_ROUNDTRIP_SCHEMA.fields
        }
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            raw = np.frombuffer(bytes(payload), dtype=np.uint8)
            side = int(len(raw) ** 0.5)
            if side < 1:
                continue
            blob = encode_gif(raw[: side * side].reshape(side, side))
            if doc_id % _CORRUPT_MOD == 0:
                blob = b"XX" + blob[2:]
            try:
                meta, gray = decode_gif(blob)
                out["doc_id"].append(doc_id)
                out["container"].append("gif")
                out["width"].append(meta["width"])
                out["height"].append(meta["height"])
                out["payload_md5"].append(
                    hashlib.md5(gray.tobytes()).hexdigest()
                )
            except ValueError:
                out["doc_id"].append(doc_id)
                out["container"].append("corrupt")
                out["width"].append(None)
                out["height"].append(None)
                out["payload_md5"].append(None)
        yield pd.DataFrame(out)


_GIF_ROUNDTRIP_ORACLE = f"""
WITH imgs AS (
  SELECT doc_id, text,
    CAST(floor(sqrt(octet_length(encode(text)))) AS INT) AS side
  FROM documents WHERE doc_id % 3 = 0
)
SELECT doc_id,
  CASE WHEN doc_id % {_CORRUPT_MOD} = 0 THEN 'corrupt' ELSE 'gif' END AS container,
  CASE WHEN doc_id % {_CORRUPT_MOD} <> 0 THEN side END AS width,
  CASE WHEN doc_id % {_CORRUPT_MOD} <> 0 THEN side END AS height,
  CASE WHEN doc_id % {_CORRUPT_MOD} <> 0
       THEN md5(substr(text, 1, side * side)) END AS payload_md5
FROM imgs WHERE side >= 1
"""


@register(
    "mm_codec_gif_roundtrip",
    oracle=_GIF_ROUNDTRIP_ORACLE,
    tags=("llm", "multimodal", "udf"),
)
def mm_codec_gif_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second compressed-container proof, with the COMPRESSOR itself
    from scratch: GIF87a whose variable-width LZW (9→12-bit codes,
    KwKwK case, 4096 dictionary reset) is implemented from the public
    spec — no library at any layer. The md5 over decoded pixels
    matches DuckDB's hash of the source bytes only if compression and
    decompression are both exact; magic-corrupted blobs route to
    quarantine (GIF carries no CRC, so structural corruption is the
    honest detectable class — PNG's chunk CRCs are the integrity
    story). Map-only over Arrow batches."""
    binary = mm_binary_ingest_impl(spark, sf_dir).filter(
        F.col("mime") == "image/png"
    )
    return binary.mapInPandas(gif_roundtrip, _PNG_ROUNDTRIP_SCHEMA)
