"""Property tests for the real container codecs (llm/codecs.py):
decode(encode(x)) must be bit-exact for ANY payload — every PCM
width/rate/length for WAV, every image shape (hitting all four BMP
row-padding remainders) for BMP, and every scanline-filter mix for
the compressed PNG path (real zlib inflate + unfilter). No Spark
session needed; hypothesis drives the numpy kernels directly."""

from __future__ import annotations

import math

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from am_kinesis_pay_spark.llm.codecs import (
    decode_bmp,
    decode_png,
    decode_wav,
    encode_bmp,
    encode_png,
    encode_wav,
)


@settings(max_examples=200, deadline=None)
@given(
    st.binary(min_size=0, max_size=4096),
    st.sampled_from([8000, 16000, 44100, 48000]),
)
def test_wav8_roundtrip(payload: bytes, rate: int):
    pcm = np.frombuffer(payload, dtype=np.uint8)
    meta, got = decode_wav(encode_wav(pcm, sample_rate=rate))
    assert (got == pcm).all()
    assert meta == {
        "channels": 1,
        "sample_rate": rate,
        "bits": 8,
        "n_samples": len(pcm),
    }


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.integers(min_value=-32768, max_value=32767), min_size=0, max_size=2048
    )
)
def test_wav16_roundtrip(samples: list[int]):
    pcm = np.asarray(samples, dtype=np.int16)
    meta, got = decode_wav(encode_wav(pcm))
    assert (got == pcm).all()
    assert meta["bits"] == 16 and meta["n_samples"] == len(pcm)


@settings(max_examples=200, deadline=None)
@given(
    st.integers(min_value=1, max_value=40),
    st.integers(min_value=1, max_value=40),
    st.integers(min_value=0, max_value=255),
)
def test_bmp_roundtrip_every_padding(h: int, w: int, seed: int):
    # deterministic pseudo-random pixels from the seed — hypothesis
    # shrinks on (h, w, seed) instead of a giant pixel list
    img = ((np.arange(h * w, dtype=np.int64) * 151 + seed) % 251).astype(
        np.uint8
    ).reshape(h, w)
    meta, got = decode_bmp(encode_bmp(img))
    assert (got == img).all()
    assert meta == {"width": w, "height": h, "bits": 24}


@settings(max_examples=200, deadline=None)
@given(
    st.integers(min_value=1, max_value=40),
    st.integers(min_value=1, max_value=40),
    st.integers(min_value=0, max_value=255),
    st.sampled_from(["none", "cycle"]),
)
def test_png_roundtrip_all_filters(h: int, w: int, seed: int, mode: str):
    # 'cycle' rotates through all five scanline filters (None/Sub/Up/
    # Average/Paeth), so any h >= 5 exercises every reverse path; the
    # DEFLATE stream is real zlib either way
    img = ((np.arange(h * w, dtype=np.int64) * 151 + seed) % 251).astype(
        np.uint8
    ).reshape(h, w)
    meta, got = decode_png(encode_png(img, filter_mode=mode))
    assert (got == img).all()
    assert meta == {"width": w, "height": h, "bits": 8}


@settings(max_examples=60, deadline=None)
@given(
    st.integers(min_value=2, max_value=30),
    st.integers(min_value=0, max_value=255),
    st.integers(min_value=0, max_value=10_000),
)
def test_png_corruption_never_passes_silently(side: int, seed: int, pos: int):
    """Flip any single byte anywhere in the stream: the validating
    decoder must either reject it (CRC / structure / size checks) or
    — never — return wrong pixels as if nothing happened."""
    img = ((np.arange(side * side, dtype=np.int64) * 73 + seed) % 256).astype(
        np.uint8
    ).reshape(side, side)
    blob = bytearray(encode_png(img, filter_mode="cycle"))
    blob[pos % len(blob)] ^= 0xA5
    with pytest.raises(ValueError):
        decode_png(bytes(blob))


def test_png_truncation_rejected():
    img = np.arange(64, dtype=np.uint8).reshape(8, 8)
    blob = encode_png(img)
    for cut in (4, 20, len(blob) // 2, len(blob) - 1):
        with pytest.raises(ValueError):
            decode_png(blob[:cut])


@settings(max_examples=150, deadline=None)
@given(
    st.integers(min_value=1, max_value=40),
    st.integers(min_value=1, max_value=40),
    st.integers(min_value=0, max_value=255),
)
def test_gif_roundtrip(h: int, w: int, seed: int):
    from am_kinesis_pay_spark.llm.codecs import decode_gif, encode_gif

    img = ((np.arange(h * w, dtype=np.int64) * 151 + seed) % 251).astype(
        np.uint8
    ).reshape(h, w)
    meta, got = decode_gif(encode_gif(img))
    assert (got == img).all()
    assert meta == {"width": w, "height": h, "bits": 8}


def test_gif_lzw_edge_cases():
    """The LZW paths a lazy implementation gets wrong: KwKwK (constant
    runs emit a code equal to the next free entry), width growth past
    9/10/11 bits, and the 4096-entry dictionary reset."""
    import numpy as np

    from am_kinesis_pay_spark.llm.codecs import (
        _lzw_decode,
        _lzw_encode,
        decode_gif,
        encode_gif,
    )

    # constant run -> immediate KwKwK on the second code
    assert _lzw_decode(_lzw_encode(b"\x07" * 500)) == b"\x07" * 500
    # high-entropy stream long enough to fill the table past 4096
    rng = (np.arange(9000, dtype=np.int64) * 2654435761 % 256).astype(np.uint8)
    assert _lzw_decode(_lzw_encode(rng.tobytes())) == rng.tobytes()
    img = rng[: 90 * 90].reshape(90, 90)
    meta, got = decode_gif(encode_gif(img))
    assert (got == img).all()
    # and the encoder genuinely compresses a compressible stream
    assert len(_lzw_encode(b"ab" * 2000)) < 1000


def test_gif_structural_corruption_rejected():
    import numpy as np

    from am_kinesis_pay_spark.llm.codecs import decode_gif, encode_gif

    img = (np.arange(400, dtype=np.int64) % 256).astype(np.uint8).reshape(20, 20)
    blob = encode_gif(img)
    with pytest.raises(ValueError):
        decode_gif(b"XX" + blob[2:])  # magic
    with pytest.raises(ValueError):
        decode_gif(blob[:-1])  # missing trailer
    with pytest.raises(ValueError):
        decode_gif(blob[: len(blob) // 2])  # truncated sub-blocks
    # wrong dimension field: pixel-count cross-check must catch it
    bad = bytearray(blob)
    bad[6] = 19  # width 20 -> 19
    with pytest.raises(ValueError):
        decode_gif(bytes(bad))


# --- JPEG (baseline DCT signal codec) ----------------------------------


@settings(max_examples=150, deadline=None)
@given(
    st.integers(min_value=1, max_value=40),
    st.integers(min_value=1, max_value=40),
    st.integers(min_value=0, max_value=255),
)
def test_jpeg_bounded_error_roundtrip(h: int, w: int, seed: int):
    """JPEG is lossy: the contract is header-exact dims plus a bounded
    reconstruction error. 12 is ~1.5x the worst error ever observed at
    quality 95 on adversarial (pure-noise) content; the registered
    operator's JPEG_TOL=16 sits above this with further margin."""
    from am_kinesis_pay_spark.llm.codecs import decode_jpeg, encode_jpeg

    img = ((np.arange(h * w, dtype=np.int64) * 151 + seed) % 251).astype(
        np.uint8
    ).reshape(h, w)
    meta, got = decode_jpeg(encode_jpeg(img))
    assert meta == {"width": w, "height": h, "bits": 8}
    assert got.shape == (h, w)
    assert int(np.abs(got.astype(int) - img.astype(int)).max()) <= 12


@settings(max_examples=60, deadline=None)
@given(
    st.integers(min_value=1, max_value=30),
    st.integers(min_value=1, max_value=30),
    st.integers(min_value=0, max_value=255),
)
def test_jpeg_flat_blocks_are_exact(h: int, w: int, v: int):
    """A constant image is DC-only after the DCT; with the q95 DC step
    (2) the per-pixel error is <= 1/8, so the clip+round output must be
    bit-exact — this pins the DCT normalization, quant/dequant pairing,
    DC differential chain, and padding/crop in one assertion."""
    from am_kinesis_pay_spark.llm.codecs import decode_jpeg, encode_jpeg

    img = np.full((h, w), v, dtype=np.uint8)
    _, got = decode_jpeg(encode_jpeg(img))
    assert (got == img).all()


def test_jpeg_smooth_content_is_tight():
    """Smooth gradients (the content JPEG is designed for) reconstruct
    near-exactly at q95 — a wrong zigzag or basis ordering would blow
    this immediately while still passing a loose noise bound."""
    from am_kinesis_pay_spark.llm.codecs import decode_jpeg, encode_jpeg

    img = np.tile(np.arange(256, dtype=np.uint8), (16, 1))[:, :100]
    _, got = decode_jpeg(encode_jpeg(img))
    assert int(np.abs(got.astype(int) - img.astype(int)).max()) <= 1
    img2 = np.add.outer(np.arange(33), np.arange(57)).astype(np.uint8) * 2
    _, got2 = decode_jpeg(encode_jpeg(img2))
    assert int(np.abs(got2.astype(int) - img2.astype(int)).max()) <= 2


def test_jpeg_decoder_reads_tables_from_stream():
    """The decoder must use the stream's DQT, not the module constant:
    re-encode at a coarser quality and check the reconstruction still
    lands within that table's quant bound (a decoder hardwired to the
    q95 table would dequantize wrongly and miss by a wide margin)."""
    from am_kinesis_pay_spark.llm.codecs import (
        _jpeg_qtable,
        decode_jpeg,
        encode_jpeg,
    )

    rng = ((np.arange(24 * 24, dtype=np.int64) * 97 + 13) % 256).astype(
        np.uint8
    ).reshape(24, 24)
    blob50 = encode_jpeg(rng, quality=50)
    _, got50 = decode_jpeg(blob50)
    bound = float(np.sqrt(np.sum((_jpeg_qtable(50) / 2.0) ** 2))) + 1.0
    err = float(np.abs(got50.astype(int) - rng.astype(int)).max())
    assert err <= bound
    # and q50 must be visibly lossier than q95 on the same content
    _, got95 = decode_jpeg(encode_jpeg(rng, quality=95))
    assert (
        np.abs(got95.astype(int) - rng.astype(int)).mean()
        < np.abs(got50.astype(int) - rng.astype(int)).mean()
    )


def test_jpeg_structural_corruption_rejected():
    from am_kinesis_pay_spark.llm.codecs import decode_jpeg, encode_jpeg

    img = (np.arange(400, dtype=np.int64) % 256).astype(np.uint8).reshape(20, 20)
    blob = encode_jpeg(img)
    with pytest.raises(ValueError):
        decode_jpeg(b"XX" + blob[2:])  # SOI magic
    with pytest.raises(ValueError):
        decode_jpeg(blob[:-2])  # missing EOI
    with pytest.raises(ValueError):
        decode_jpeg(blob[: len(blob) // 3])  # truncated mid-segment
    # entropy stream cut mid-block: Huffman decode must fail loudly
    with pytest.raises(ValueError):
        decode_jpeg(blob[:-8] + b"\xff\xd9")


def test_gif_lzw_eos_width_growth_edge():
    """End-of-stream width off-by-one: when the decoder's lagged
    dictionary add on the FINAL data code lands exactly on a 2^width
    boundary, the decoder grows its code width before reading EOI —
    the encoder must emit EOI at the grown width too. With the stream
    byte-aligned at that point (no padding bits to mask the skew) the
    unfixed encoder produced a stream the decoder rejects with
    'ended without EOI'. The triggering add-count (8444, past two
    4096-entry resets) was found by exhaustive simulation of the
    data-independent bits(n) recurrence."""
    from am_kinesis_pay_spark.llm.codecs import _lzw_decode, _lzw_encode

    # Martin's prefer-largest greedy walks an Eulerian path over byte
    # pairs, so every byte after the first triggers a dictionary add;
    # pairs are globally distinct, hence still fresh after resets.
    out = bytearray([0])
    used: set = set()
    prev = 0
    for _ in range(8444):
        b = 255
        while (prev, b) in used:
            b -= 1
        used.add((prev, b))
        out.append(b)
        prev = b
    data = bytes(out)
    assert _lzw_decode(_lzw_encode(data)) == data
    # neighbors of the boundary stay green too
    assert _lzw_decode(_lzw_encode(data[:-1])) == data[:-1]
    assert _lzw_decode(_lzw_encode(data + b"\x00")) == data + b"\x00"


def test_jpeg_fill_bytes_and_standalone_markers():
    """T.81 B.1.1.2 fill bytes (extra 0xFF before a marker) and
    zero-payload standalone markers (TEM 0x01, RSTn 0xD0-0xD7) are
    legal in foreign baseline JPEGs between SOI and SOS; the marker
    walk must skip them instead of misparsing a bogus length word."""
    from am_kinesis_pay_spark.llm.codecs import decode_jpeg, encode_jpeg

    img = (np.arange(400, dtype=np.int64) % 256).astype(np.uint8).reshape(20, 20)
    blob = encode_jpeg(img)
    _, want = decode_jpeg(blob)

    # inject after SOI: fill bytes, TEM, an RSTn, more fill
    foreign = blob[:2] + b"\xff\xff\xff\x01\xff\xd3\xff\xff" + blob[2:]
    meta, got = decode_jpeg(foreign)
    assert meta["width"] == 20 and meta["height"] == 20
    assert (got == want).all()


# --- IMA ADPCM (lossy audio signal codec) ------------------------------


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.integers(min_value=-32768, max_value=32767),
        min_size=1,
        max_size=2000,
    ),
    st.sampled_from([8000, 16000, 44100]),
)
def test_adpcm_lockstep_exactness(samples: list[int], rate: int):
    """The codec invariant: decode(encode(x)) must equal the encoder's
    own integer reconstruction BIT-EXACTLY for ANY input (the encoder
    runs the decoder's state machine in lockstep — drift is a bug, not
    quantization), with the fact chunk restoring the exact length."""
    from am_kinesis_pay_spark.llm.codecs import (
        _adpcm_encode_core,
        decode_wav,
        encode_adpcm_wav,
    )

    pcm = np.array(samples, dtype=np.int16)
    _h, _p, recon, _n = _adpcm_encode_core(pcm)
    meta, got = decode_wav(encode_adpcm_wav(pcm, sample_rate=rate))
    assert meta == {
        "channels": 1,
        "sample_rate": rate,
        "bits": 4,
        "codec": "ima_adpcm",
        "n_samples": len(pcm),
    }
    assert (got == recon).all()


def test_adpcm_smooth_signal_error_bound():
    """Lossy-vs-source contract on realistic content: a smooth sine
    tracks within a small bound (the step table adapts down), while
    the worst case (full-range white noise) is documented as large —
    ADPCM is a 4:1 codec, not lossless."""
    from am_kinesis_pay_spark.llm.codecs import decode_wav, encode_adpcm_wav

    t = np.arange(8000)
    s = (6000 * np.sin(2 * np.pi * t / 200)).astype(np.int16)
    _, got = decode_wav(encode_adpcm_wav(s))
    err = int(np.abs(got.astype(int) - s.astype(int)).max())
    assert err <= 64, err  # measured 28; 64 leaves margin


def test_adpcm_structural_corruption_rejected():
    from am_kinesis_pay_spark.llm.codecs import (
        _ADPCM_STEP_IDX_OFFSET,
        decode_wav,
        encode_adpcm_wav,
    )

    pcm = (np.arange(1500) % 251).astype(np.int16)
    blob = encode_adpcm_wav(pcm)
    # step index beyond the 88-entry table
    b = bytearray(blob)
    b[_ADPCM_STEP_IDX_OFFSET] = 0xFF
    with pytest.raises(ValueError):
        decode_wav(bytes(b))
    # torn block framing (data no longer a whole number of blocks)
    with pytest.raises(ValueError):
        decode_wav(blob[:-7] )
    # stereo / wrong bit width rejected via fmt validation
    b = bytearray(blob)
    b[22] = 2  # nChannels
    with pytest.raises(ValueError):
        decode_wav(bytes(b))


def test_adpcm_sniff_decode_default():
    """_container_decode must handle ADPCM WAV out of the box — the
    RIFF sniff routes through decode_wav, which now dispatches on
    wFormatTag. Only MP4 remains gated."""
    from am_kinesis_pay_spark.llm.codecs import decode_wav, encode_adpcm_wav
    from am_kinesis_pay_spark.llm.multimodal import _container_decode

    pcm = (1000 * np.sin(np.arange(3000) / 20)).astype(np.int16)
    blob = encode_adpcm_wav(pcm)
    _, got = decode_wav(blob)
    assert _container_decode(blob) == got.tobytes()


# --- MP4 / ISO BMFF container ------------------------------------------


@settings(max_examples=120, deadline=None)
@given(
    st.lists(st.binary(min_size=0, max_size=400), min_size=1, max_size=12)
)
def test_mp4_container_roundtrip(frames: list):
    """Demux(mux(frames)) must return every sample bit-exactly for any
    frame count/sizes (including empty samples) — the sample tables
    (stsz/stco/stsc/stts) fully determine the byte ranges."""
    from am_kinesis_pay_spark.llm.codecs import decode_mp4, encode_mp4

    meta, got = decode_mp4(encode_mp4(frames))
    assert got == frames
    assert meta["n_samples"] == len(frames)


def test_mp4_structural_corruption_rejected():
    from am_kinesis_pay_spark.llm.codecs import decode_mp4, encode_mp4

    blob = encode_mp4([b"abc", b"defg"])
    with pytest.raises(ValueError):
        decode_mp4(blob[:-5])  # truncated moov
    bb = bytearray(blob)
    bb[23] ^= 0x01  # mdat size: box tiling breaks
    with pytest.raises(ValueError):
        decode_mp4(bytes(bb))
    with pytest.raises(ValueError):
        decode_mp4(b"XXXX" + blob[4:])  # ftyp box size corrupted
    # stts/stsz disagreement must be caught, not silently sliced
    idx = blob.find(b"stts")
    bb = bytearray(blob)
    bb[idx + 12 : idx + 16] = (99).to_bytes(4, "big")  # sample count
    with pytest.raises(ValueError):
        decode_mp4(bytes(bb))


def test_mp4_sniff_decode_default():
    """_container_decode recognizes the ftyp magic and returns the
    demuxed sample bytes — real container handling by default, codec
    inside the samples still gated."""
    from am_kinesis_pay_spark.llm.codecs import encode_mp4
    from am_kinesis_pay_spark.llm.multimodal import _container_decode

    frames = [b"alpha", b"", b"beta" * 50]
    assert _container_decode(encode_mp4(frames)) == b"".join(frames)


# --- MJPEG-in-MP4 video -------------------------------------------------


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.integers(min_value=0, max_value=255), min_size=64, max_size=64
    ),
    st.integers(min_value=1, max_value=6),
)
def test_mjpeg_video_roundtrip(pix: list, n_frames: int):
    """mux(encode_jpeg(frame_i)) -> demux -> decode_jpeg(sample_i) must
    recover every frame within the JPEG quantization bound, any frame
    count — the full video pipeline with no codec library."""
    from am_kinesis_pay_spark.llm.codecs import (
        JPEG_TOL,
        decode_jpeg,
        decode_mp4,
        encode_jpeg,
        encode_mp4,
    )

    frame = np.array(pix, dtype=np.uint8).reshape(8, 8)
    frames = [
        np.clip(frame.astype(np.int32) + 7 * i, 0, 255).astype(np.uint8)
        for i in range(n_frames)
    ]
    blob = encode_mp4([encode_jpeg(f) for f in frames])
    meta, got = decode_mp4(blob)
    assert meta["n_samples"] == n_frames
    for src, sample in zip(frames, got):
        _, gray = decode_jpeg(sample)
        assert gray.shape == (8, 8)
        assert int(np.abs(gray.astype(np.int64) - src.astype(np.int64)).max()) <= JPEG_TOL


def test_mjpeg_container_decode_dispatch():
    """_container_decode must fully decode an all-JPEG-sample MP4 to
    pixel bytes (true video decode), fall back to raw sample bytes for
    non-JPEG samples, and reject a broken JPEG sample to the byte-level
    path (None) rather than half-decoding."""
    from am_kinesis_pay_spark.llm.codecs import (
        decode_jpeg,
        encode_jpeg,
        encode_mp4,
    )
    from am_kinesis_pay_spark.llm.multimodal import _container_decode

    rng = np.random.default_rng(11)
    frames = [
        rng.integers(0, 256, (16, 16)).astype(np.uint8) for _ in range(3)
    ]
    jpegs = [encode_jpeg(f) for f in frames]
    blob = encode_mp4(jpegs)
    decoded = _container_decode(blob)
    assert decoded == b"".join(
        decode_jpeg(j)[1].tobytes() for j in jpegs
    )
    assert len(decoded) == 3 * 16 * 16

    raw_blob = encode_mp4([b"plain text sample", b"another one"])
    assert _container_decode(raw_blob) == b"plain text sampleanother one"

    bad = encode_mp4([jpegs[0], b"\xff\xd8corrupt-not-a-jpeg"])
    assert _container_decode(bad) is None


from am_kinesis_pay_spark.llm import codecs as C


class TestPVideo:
    """MPV1 motion-compensated P-frame codec (r6): roundtrip bounds,
    closed-loop determinism, motion-search correctness on pure
    translation, GOP chain-break quarantine, structural validation."""

    def _frames(self, seed=7, n=4, side=32, shift=2):
        rng = np.random.default_rng(seed)
        base = rng.integers(0, 256, (side + shift * n, side), dtype=np.uint8)
        return [base[shift * f : shift * f + side, :].copy() for f in range(n)]

    def test_roundtrip_bounded_error(self):
        frames = self._frames()
        blob = C.encode_pvideo(frames)
        meta, got = C.decode_pvideo(blob)
        assert meta["n_samples"] == len(frames) and meta["codec"] == "mpv1"
        for g, f in zip(got, frames):
            assert g.shape == f.shape
            err = int(np.abs(g.astype(np.int64) - f.astype(np.int64)).max())
            assert err <= C._PVID_TOL, err

    def test_encode_deterministic(self):
        frames = self._frames(seed=11)
        assert C.encode_pvideo(frames) == C.encode_pvideo(frames)

    def test_motion_search_finds_pure_translation(self):
        # a frame that is EXACTLY the reference shifted down-right by
        # (3, 5) must yield mv (3, 5) for every interior macroblock and
        # a near-zero residual (only the entering border is new)
        rng = np.random.default_rng(3)
        ref = rng.integers(0, 256, (64, 64), dtype=np.uint8)
        cur = np.roll(np.roll(ref, -3, axis=0), -5, axis=1)
        mvs = C._pvid_motion_search(cur, ref)
        # interior MBs (not touching the wrap-around edges)
        grid = mvs.reshape(4, 4, 2)
        assert np.all(grid[:3, :3] == np.array([3, 5]))

    def test_pframe_residual_exact_on_perfect_prediction(self):
        # if cur == ref the residual quantizes to all-zero and the
        # reconstruction is bit-exact
        rng = np.random.default_rng(5)
        ref = rng.integers(0, 256, (32, 32), dtype=np.uint8)
        sample, recon = C.encode_pframe(ref.copy(), ref)
        assert np.array_equal(recon, ref)
        assert np.array_equal(C.decode_pframe(sample, ref), ref)

    def test_corrupt_pframe_quarantines_tail_not_iframe(self):
        frames = self._frames(seed=13)
        blob = C.encode_pvideo(frames)
        i = blob.index(C._PVID_MAGIC)
        bad = blob[:i] + b"XXXX" + blob[i + 4 :]
        _, samples = C.decode_mp4(bad)  # container walk survives
        _, recon = C.decode_jpeg(samples[0])  # I-frame survives
        ok = 1
        for s in samples[1:]:
            try:
                recon = C.decode_pframe(s, recon)
                ok += 1
            except ValueError:
                break
        assert ok == 1  # P1 and its dependents quarantine

    def test_validation_errors(self):
        frames = self._frames(seed=17)
        ref = frames[0]
        sample, _ = C.encode_pframe(frames[1], ref)
        with pytest.raises(ValueError, match="magic"):
            C.decode_pframe(b"JUNK" + sample[4:], ref)
        with pytest.raises(ValueError, match="dims disagree"):
            C.decode_pframe(sample, np.zeros((48, 48), dtype=np.uint8))
        with pytest.raises(ValueError, match="motion vector"):
            # mv byte 0 -> dy = -8, outside the +/-7 search range
            C.decode_pframe(sample[:9] + b"\x00" + sample[10:], ref)
        with pytest.raises(ValueError, match="length disagrees"):
            C.decode_pframe(sample + b"\x00", ref)
        with pytest.raises(ValueError):
            C.decode_pframe(sample[:-3], ref)

    def test_container_decode_sniffs_mpv1(self):
        from am_kinesis_pay_spark.llm.multimodal import _container_decode

        frames = self._frames(seed=19)
        blob = C.encode_pvideo(frames)
        decoded = _container_decode(blob)
        assert decoded is not None
        assert len(decoded) == sum(f.size for f in frames)


class TestKFLC:
    """KFLC lossless audio (FLAC-class fixed LPC + planar Rice)."""

    def _cases(self):
        import numpy as np

        return [
            np.array([7], dtype=np.int16),
            np.array([0, 0, 0], dtype=np.int16),
            np.arange(-5000, 5000, 7, dtype=np.int16),   # linear ramp
            np.full(700, -123, dtype=np.int16),           # constant
            np.array(
                [int(8000 * math.sin(i / 9)) for i in range(3000)],
                dtype=np.int16,
            ),
            np.array([32767, -32768] * 300, dtype=np.int16),  # worst case
            np.frombuffer(bytes(range(256)) * 5, dtype="<i2").copy(),
        ]

    def test_roundtrip_lossless(self):
        import numpy as np

        from am_kinesis_pay_spark.llm.codecs import decode_kflc, encode_kflc

        for pcm in self._cases():
            meta, got = decode_kflc(encode_kflc(pcm))
            assert np.array_equal(got, pcm)
            assert meta["n_samples"] == len(pcm)
            assert meta["n_blocks"] == -(-len(pcm) // 256)

    def test_smooth_signals_actually_compress(self):
        from am_kinesis_pay_spark.llm.codecs import encode_kflc

        ramp, const, sine = self._cases()[2], self._cases()[3], self._cases()[4]
        for pcm in (ramp, const):  # near-zero residuals: >4x smaller
            assert len(encode_kflc(pcm)) < 2 * len(pcm) / 4
        # a fast sine still beats raw PCM (residuals ~8 bits/sample)
        assert len(encode_kflc(sine)) < 2 * len(sine)

    def test_checksum_detects_corruption(self):
        import pytest as _pytest

        from am_kinesis_pay_spark.llm.codecs import decode_kflc, encode_kflc

        for pcm in self._cases():
            blob = bytearray(encode_kflc(pcm))
            blob[12 + 4] ^= 0xFF  # first block's integrity word
            with _pytest.raises(ValueError, match="checksum"):
                decode_kflc(bytes(blob))

    def test_residual_bitflip_is_caught_by_checksum(self):
        """The error class Rice coding alone cannot see: flip a bit in
        the REMAINDER section — the stream still parses, the samples
        are plausibly wrong, only the integrity word notices."""
        import numpy as np
        import pytest as _pytest

        from am_kinesis_pay_spark.llm.codecs import decode_kflc, encode_kflc

        pcm = np.array(
            [int(8000 * math.sin(i / 9)) for i in range(256)], dtype=np.int16
        )
        blob = bytearray(encode_kflc(pcm))
        blob[-1] ^= 0x80  # inside the last block's k-bit section
        with _pytest.raises(ValueError):
            decode_kflc(bytes(blob))

    def test_validation_errors(self):
        import pytest as _pytest

        from am_kinesis_pay_spark.llm.codecs import decode_kflc, encode_kflc

        with _pytest.raises(ValueError, match="KFLC"):
            decode_kflc(b"NOPE" + b"\x00" * 20)
        with _pytest.raises(ValueError):
            decode_kflc(encode_kflc(self._cases()[4])[:40])  # truncated


@settings(max_examples=200, deadline=None)
@given(st.binary(min_size=2, max_size=4096))
def test_kflc_roundtrip_fuzz(payload: bytes):
    """KFLC must be LOSSLESS on arbitrary int16 content — hypothesis
    hammers the predictor-order choice, Rice parameter, block padding,
    and planar bit-packing edges the fixed cases cannot enumerate."""
    from am_kinesis_pay_spark.llm.codecs import decode_kflc, encode_kflc

    pcm = np.frombuffer(payload[: len(payload) // 2 * 2], dtype="<i2")
    if len(pcm) < 1:
        return
    meta, got = decode_kflc(encode_kflc(pcm))
    assert np.array_equal(got, pcm)
    assert meta["n_samples"] == len(pcm)
    assert meta["n_blocks"] == -(-len(pcm) // 256)
