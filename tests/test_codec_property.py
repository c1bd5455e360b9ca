"""Property tests for the real container codecs (llm/codecs.py):
decode(encode(x)) must be bit-exact for ANY payload — every PCM
width/rate/length for WAV, every image shape (hitting all four BMP
row-padding remainders) for BMP. No Spark session needed; hypothesis
drives the numpy kernels directly."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings, strategies as st

from am_kinesis_pay_spark.llm.codecs import (
    decode_bmp,
    decode_wav,
    encode_bmp,
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
