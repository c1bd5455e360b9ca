"""Checks for LLM-pipeline ops with no SQL oracle: ANN recall vs the
exact baseline, multimodal decode determinism and frame shapes."""

from __future__ import annotations

from am_kinesis_pay_spark.llm.multimodal import _FRAME_SIZE, _N_BINS, _N_FRAMES, _fake_features
from am_kinesis_pay_spark.registry import queries

from tests.conftest import SF_DIR


def test_ann_lsh_correctness_and_recall(spark):
    """The synthetic embeddings are uniform-random (no angular
    clusters), so absolute recall vs exact top-k is data-limited; what
    the machinery must guarantee: candidates are generated, returned
    cosines are numerically right (numpy cross-check), ranking is
    correct within each query, and recall is clearly above broken
    (≈0)."""
    import math

    from am_kinesis_pay_spark.tables import load

    ann_rows = queries()["vec_ann_lsh"](spark, SF_DIR).collect()
    assert ann_rows, "ANN produced no candidates"
    vecs = {
        r.vec_id: r.embedding
        for r in load(spark, SF_DIR, "embeddings").collect()
    }

    def cos(a, b):
        dot = sum(float(x) * float(y) for x, y in zip(a, b))
        na = math.sqrt(sum(float(x) ** 2 for x in a))
        nb = math.sqrt(sum(float(y) ** 2 for y in b))
        return dot / (na * nb)

    by_query: dict[int, list] = {}
    for r in ann_rows:
        by_query.setdefault(r.query_id, []).append(r)
        got = r.cosine
        want = round(cos(vecs[r.query_id], vecs[r.neighbor_id]), 6)
        assert abs(got - want) < 1e-5, (r.query_id, r.neighbor_id, got, want)
    for q, rows in by_query.items():
        ranked = sorted(rows, key=lambda r: r.rank)
        cosines = [r.cosine for r in ranked]
        assert cosines == sorted(cosines, reverse=True), f"ranking broken for {q}"

    exact = {
        (r.query_id, r.neighbor_id)
        for r in queries()["vec_cosine_topk"](spark, SF_DIR).collect()
    }
    ann = {(r.query_id, r.neighbor_id) for r in ann_rows}
    recall = len(exact & ann) / len(exact)
    assert recall >= 0.2, f"recall {recall:.2f} ≈ broken signatures"


def test_fake_features_deterministic_and_normalized():
    payload = b"some deterministic payload bytes"
    f1, f2 = _fake_features(payload), _fake_features(payload)
    assert f1 == f2
    assert len(f1) == _N_BINS
    assert abs(sum(f1) - 1.0) < 1e-9
    assert _fake_features(b"") == [0.0] * _N_BINS


def test_container_decode_sniffs_real_containers():
    """The default dispatch must take the REAL decode path on genuine
    containers (not the byte-level fallback), and fall back cleanly on
    near-miss payloads that merely share the magic prefix."""
    import numpy as np

    from am_kinesis_pay_spark.llm.codecs import encode_bmp, encode_wav
    from am_kinesis_pay_spark.llm.multimodal import (
        _container_decode,
        _features_dispatch,
    )

    pcm = np.arange(300, dtype=np.uint8)
    wav = encode_wav(pcm)
    assert _container_decode(wav) == pcm.tobytes()
    # histogram over DECODED samples == histogram of the raw pcm,
    # which differs from the histogram over the container bytes
    assert _features_dispatch(wav) == _fake_features(pcm.tobytes())
    assert _features_dispatch(wav) != _fake_features(wav)

    gray = (np.arange(100, dtype=np.uint8) * 7 % 256).reshape(10, 10).astype(np.uint8)
    bmp = encode_bmp(gray)
    assert _container_decode(bmp) == gray.tobytes()
    assert _features_dispatch(bmp) == _fake_features(gray.tobytes())

    # compressed path: a real PNG (zlib DEFLATE + scanline filters)
    # must decode to the same pixels — and its container bytes look
    # nothing like the pixel bytes, so the histogram proves the inflate
    from am_kinesis_pay_spark.llm.codecs import encode_png

    png = encode_png(gray, filter_mode="cycle")
    assert _container_decode(png) == gray.tobytes()
    assert _features_dispatch(png) == _fake_features(gray.tobytes())
    assert _features_dispatch(png) != _fake_features(png)

    # magic-prefixed but malformed -> validating parser rejects,
    # dispatch falls back to the byte-level head instead of raising
    for fake in (b"RIFF not a real wave stream", b"BM but not a bitmap"):
        assert _container_decode(fake) is None
        assert _features_dispatch(fake) == _fake_features(fake)


def test_mm_decode_features_schema_and_determinism(spark):
    df = queries()["mm_decode_features"](spark, SF_DIR)
    rows1 = {r.doc_id: tuple(r.features) for r in df.limit(50).collect()}
    rows2 = {r.doc_id: tuple(r.features) for r in df.limit(50).collect()}
    assert rows1 == rows2
    assert all(len(v) == _N_BINS for v in rows1.values())
    assert all(abs(sum(v) - 1.0) < 1e-9 for v in rows1.values())


def test_mm_frame_sample_shapes(spark):
    df = queries()["mm_frame_sample"](spark, SF_DIR)
    rows = df.limit(200).collect()
    assert rows
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, frames in by_doc.items():
        idxs = sorted(f.frame_idx for f in frames)
        assert idxs == list(range(len(idxs)))
        for f in frames:
            assert len(f.frame) <= _FRAME_SIZE
            assert f.frame_offset >= 0
    full_docs = [f for fs in by_doc.values() if len(fs) == _N_FRAMES for f in fs]
    assert full_docs, "no doc yielded the full frame count"


def test_ann_ivf_correctness(spark):
    """IVF machinery: candidates generated, cosines numerically right,
    ranking correct, recall clearly above broken (data is uniform-
    random so absolute recall is bounded by the nprobe/K scan rate)."""
    import math

    from am_kinesis_pay_spark.tables import load

    rows = queries()["vec_ann_ivf"](spark, SF_DIR).collect()
    assert rows
    vecs = {
        r.vec_id: r.embedding for r in load(spark, SF_DIR, "embeddings").collect()
    }

    def cos(a, b):
        dot = sum(float(x) * float(y) for x, y in zip(a, b))
        return dot / (
            math.sqrt(sum(float(x) ** 2 for x in a))
            * math.sqrt(sum(float(y) ** 2 for y in b))
        )

    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
        want = round(cos(vecs[r.query_id], vecs[r.neighbor_id]), 6)
        assert abs(r.cosine - want) < 1e-5
    for q, rs in by_q.items():
        ranked = sorted(rs, key=lambda r: r.rank)
        cosines = [r.cosine for r in ranked]
        assert cosines == sorted(cosines, reverse=True)

    exact = {
        (r.query_id, r.neighbor_id)
        for r in queries()["vec_cosine_topk"](spark, SF_DIR).collect()
    }
    ann = {(r.query_id, r.neighbor_id) for r in rows}
    recall = len(exact & ann) / len(exact)
    assert recall >= 0.1, f"recall {recall:.2f} ≈ broken assignment"


def test_mm_audio_rms_window_math(spark):
    import math

    rows = queries()["mm_audio_rms"](spark, SF_DIR).limit(100).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.rms <= 1.0 and 0.0 <= r.peak <= 1.0
        assert r.rms <= r.peak + 1e-9  # RMS never exceeds the peak
    # recompute one window by hand from the source text bytes
    from am_kinesis_pay_spark.tables import load

    first = rows[0]
    doc = (
        load(spark, SF_DIR, "documents")
        .filter(f"doc_id = {first.doc_id}")
        .collect()[0]
    )
    payload = doc.text.encode()
    seg = [((b - 128.0) / 128.0) for b in payload[:256]]
    want_rms = round(math.sqrt(sum(x * x for x in seg) / len(seg)), 6)
    assert abs(first.rms - want_rms) < 1e-6


def test_image_resize_shapes_and_block_math(spark):
    """Every thumbnail is exactly 8x8 bytes; spot-check one doc's
    block-average against a direct numpy recomputation of the same
    definition (square crop, box filter, round)."""
    import numpy as np

    from am_kinesis_pay_spark.llm.multimodal import _OUT_SIDE
    from am_kinesis_pay_spark.tables import load

    rows = queries()["mm_image_resize"](spark, SF_DIR).collect()
    assert rows, "no image rows resized"
    for r in rows:
        assert r.out_side == _OUT_SIDE
        assert len(r.pixels) == _OUT_SIDE * _OUT_SIDE
        assert r.src_side >= _OUT_SIDE
        assert 0.0 <= r.mean_px <= 255.0

    docs = {
        d.doc_id: d.text
        for d in load(spark, SF_DIR, "documents").collect()
    }
    r0 = min(rows, key=lambda r: r.doc_id)
    raw = np.frombuffer(docs[r0.doc_id].encode("utf-8"), dtype=np.uint8)
    side = int(len(raw) ** 0.5)
    img = raw[: side * side].reshape(side, side).astype(np.float64)
    crop = side - side % _OUT_SIDE
    blocks = img[:crop, :crop].reshape(
        _OUT_SIDE, crop // _OUT_SIDE, _OUT_SIDE, crop // _OUT_SIDE
    )
    want = np.floor(blocks.mean(axis=(1, 3)) + 0.5).astype(np.uint8).tobytes()
    assert bytes(r0.pixels) == want


def test_rolling_hash_matches_sequential_recurrence(spark):
    """The vectorized window-matrix hashes must equal the canonical
    Karp-Rabin rolling recurrence h' = (h - out*B^(W-1))*B + in mod M,
    re-derived here character by character for one document."""
    from am_kinesis_pay_spark.llm.text import _RK_BASE, _RK_MOD, _RK_WINDOW
    from am_kinesis_pay_spark.tables import load

    rows = queries()["text_rolling_hash"](spark, SF_DIR).collect()
    assert rows
    by_id = {r.doc_id: r for r in rows}
    doc = min(
        (d for d in load(spark, SF_DIR, "documents").collect() if d.doc_id in by_id),
        key=lambda d: d.doc_id,
    )
    raw = doc.text.encode("utf-8")
    lead = pow(_RK_BASE, _RK_WINDOW - 1, _RK_MOD)
    h = 0
    for b in raw[:_RK_WINDOW]:
        h = (h * _RK_BASE + b) % _RK_MOD
    hashes = [h]
    for i in range(len(raw) - _RK_WINDOW):
        h = ((h - raw[i] * lead) * _RK_BASE + raw[i + _RK_WINDOW]) % _RK_MOD
        hashes.append(h)
    got = by_id[doc.doc_id]
    assert got.n_windows == len(hashes)
    assert got.min_hash == min(hashes)
    assert got.n_distinct == len(set(hashes))


def test_label_centroids_match_numpy(spark):
    import numpy as np

    from am_kinesis_pay_spark.tables import load

    rows = queries()["emb_label_centroids"](spark, SF_DIR).collect()
    raw = load(spark, SF_DIR, "embeddings").collect()
    by_label: dict[int, list] = {}
    for r in raw:
        by_label.setdefault(r.label, []).append(np.array(r.embedding, dtype=np.float64))
    assert len(rows) == len(by_label)
    for r in rows:
        expect = np.mean(np.stack(by_label[r.label]), axis=0)
        assert r.n_vecs == len(by_label[r.label])
        assert np.allclose(np.array(r.centroid), expect, atol=1e-9)


def test_kmeans_deterministic_and_inertia_decreases(spark):
    import numpy as np

    from am_kinesis_pay_spark.llm.similarity import _KMEANS_K
    from am_kinesis_pay_spark.tables import load

    rows = queries()["emb_kmeans"](spark, SF_DIR).collect()
    # every cluster id is one of the k seeds; membership covers the corpus
    assert all(0 <= r.cid < _KMEANS_K for r in rows)
    n_total = load(spark, SF_DIR, "embeddings").count()
    assert sum(r.n_members for r in rows) == n_total
    assert all(r.inertia >= 0 for r in rows)

    # re-derive iteration 1 by hand: assignment to the seed vectors,
    # then per-cluster means; iteration-2 inertia (what the query
    # reports) must not exceed iteration-1 inertia (Lloyd monotonicity)
    raw = load(spark, SF_DIR, "embeddings").collect()
    vecs = {r.vec_id: np.array(r.embedding, dtype=np.float64) for r in raw}
    seeds = np.stack([vecs[i] for i in range(_KMEANS_K)])
    X = np.stack([vecs[k] for k in sorted(vecs)])
    d1 = ((X[:, None, :] - seeds[None, :, :]) ** 2).sum(axis=2)
    inertia1 = d1.min(axis=1).sum()
    assign1 = d1.argmin(axis=1)
    cents = np.stack(
        [
            X[assign1 == c].mean(axis=0).astype(np.float32).astype(np.float64)
            if (assign1 == c).any()
            else seeds[c]
            for c in range(_KMEANS_K)
        ]
    )
    d2 = ((X[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    inertia2 = d2.min(axis=1).sum()
    reported = sum(r.inertia for r in rows)
    assert reported <= inertia1 + 1e-6
    assert abs(reported - inertia2) < 1e-3


def test_ann_pq_adc_math_and_recall(spark):
    """PQ machinery: ADC scores reproduce exactly from independently
    retrained codebooks (training is deterministic — same sample, same
    seeds, same 2 Lloyd iterations), ranking is ADC-descending, and
    recall vs exact top-k is clearly above broken (data is uniform-
    random, so absolute recall is quantization-limited)."""
    import numpy as np

    from am_kinesis_pay_spark.llm.similarity import PQ_TRAIN, _pq_train
    from am_kinesis_pay_spark.tables import load

    rows = queries()["vec_ann_pq"](spark, SF_DIR).collect()
    assert rows
    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    for q, rs in by_q.items():
        ranked = sorted(rs, key=lambda r: r.rank)
        scores = [r.adc_cosine for r in ranked]
        assert scores == sorted(scores, reverse=True)
        assert all(r.neighbor_id != q for r in rs)

    # retrain codebooks from the same deterministic sample and
    # recompute one query's ADC scores from scratch
    vecs = {
        r.vec_id: np.array(r.embedding, dtype=np.float64)
        for r in load(spark, SF_DIR, "embeddings").collect()
    }
    ids = sorted(vecs)
    tmat = np.stack([vecs[i] for i in ids[:PQ_TRAIN]])
    tmat /= np.linalg.norm(tmat, axis=1, keepdims=True)
    books = _pq_train(tmat)
    m, k, dsub = books.shape
    qid = min(by_q)
    qv = vecs[qid] / np.linalg.norm(vecs[qid])
    tab = np.einsum("sd,sjd->sj", qv.reshape(m, dsub), books)
    for r in sorted(by_q[qid], key=lambda r: r.rank)[:5]:
        nv = vecs[r.neighbor_id] / np.linalg.norm(vecs[r.neighbor_id])
        codes = (
            ((nv.reshape(m, 1, dsub) - books) ** 2).sum(axis=2).argmin(axis=1)
        )
        want = round(float(tab[np.arange(m), codes].sum()), 6)
        assert abs(r.adc_cosine - want) < 1e-6, (r, want)

    exact = {
        (r.query_id, r.neighbor_id)
        for r in queries()["vec_cosine_topk"](spark, SF_DIR).collect()
    }
    ann = {(r.query_id, r.neighbor_id) for r in rows}
    recall = len(exact & ann) / len(exact)
    assert recall >= 0.1, f"recall {recall:.2f} ≈ broken quantization"

    # inline recall_at_10 audit column (VERDICT r8 #5): per-query
    # constant in [0, 1] that equals |PQ top-10 ∩ exact-cosine top-10|
    # / |exact top-10|, the exact set recomputed by brute force here
    # (6-dp pre-round + neighbor_id tie-break, the engine's own rule)
    nall = {i: v / np.linalg.norm(v) for i, v in vecs.items()}
    for qid, rs in by_q.items():
        vals = {r.recall_at_10 for r in rs}
        assert len(vals) == 1, f"recall_at_10 not constant for q{qid}"
        sims = sorted(
            (
                (round(float(nall[qid] @ nall[i]), 6), -i)
                for i in vecs
                if i != qid
            ),
            reverse=True,
        )[:10]
        exact10 = {-ni for _, ni in sims}
        got10 = {r.neighbor_id for r in rs}
        want = round(len(exact10 & got10) / len(exact10), 3)
        assert vals.pop() == want, (qid, want)


def test_pca_power_matches_numpy_and_captures_variance(spark):
    """Distributed power iteration reproduces the numpy reference
    (same deterministic start, same round count) and the resulting
    component captures at least as much variance as the start vector
    — the monotonicity that makes power iteration converge."""
    import numpy as np

    from am_kinesis_pay_spark.llm.similarity import PCA_ITERS
    from am_kinesis_pay_spark.tables import load

    rows = queries()["emb_pca_power"](spark, SF_DIR).collect()
    assert rows
    got = np.array([r.loading for r in sorted(rows, key=lambda r: r.pos)])
    assert abs(np.linalg.norm(got) - 1.0) < 1e-6

    mat = np.stack(
        [
            np.array(r.embedding, dtype=np.float64)
            for r in load(spark, SF_DIR, "embeddings").collect()
        ]
    )
    mu = mat.mean(axis=0)
    c = mat - mu
    v = np.ones(mat.shape[1]) / np.sqrt(mat.shape[1])
    v0 = v.copy()
    for _ in range(PCA_ITERS):
        s = c.T @ (c @ v)
        v = s / np.linalg.norm(s)
    assert np.abs(got - v).max() < 1e-6

    def captured(u):
        return float(u @ (c.T @ (c @ u)))

    assert captured(got) >= captured(v0) - 1e-9
    mu_got = np.array([r.mean for r in sorted(rows, key=lambda r: r.pos)])
    assert np.abs(mu_got - mu).max() < 1e-6


def test_emb_dedup_cosine_multi_tile_parity(spark, ducks, monkeypatch):
    """Force the tiled path (many small build-side tiles) and require
    exact oracle parity — proves tiling neither drops nor duplicates
    pairs. The default tile size covers the whole test corpus in one
    tile, so without this the multi-tile branch would go untested."""
    from am_kinesis_pay_spark.llm import dedup

    from tests.conftest import compare_query

    monkeypatch.setattr(dedup, "_COSINE_TILE_ROWS", 7)
    compare_query(spark, ducks, "emb_dedup_cosine", SF_DIR)


def test_emb_dedup_cosine_lsh_subset_of_exact(spark):
    """LSH-blocked near-dup pairs must be a subset of the exact
    all-pairs result (no false positives — verification is exact), with
    usable recall on the fixture corpus."""
    exact = {
        (r.vec_a, r.vec_b)
        for r in queries()["emb_dedup_cosine"](spark, SF_DIR).collect()
    }
    lsh = {
        (r.vec_a, r.vec_b)
        for r in queries()["emb_dedup_cosine_lsh"](spark, SF_DIR).collect()
    }
    assert lsh <= exact
    if exact:
        assert len(lsh) / len(exact) >= 0.2, f"recall {len(lsh)/len(exact):.2f}"


def test_emb_semdedup_semantic_subset_of_exact(spark):
    """SemDeDup's 'semantic' drops must pair with their keeper inside
    the exact all-pairs near-dup set (cell scoping only restricts the
    candidate space; the verify is exact), and every 'exact' drop must
    name its own group min as keeper."""
    exact = {
        (r.vec_a, r.vec_b)
        for r in queries()["emb_dedup_cosine"](spark, SF_DIR).collect()
    }
    card = queries()["emb_semdedup"](spark, SF_DIR).collect()
    for r in card:
        lo, hi = min(r.keep_id, r.vec_id), max(r.keep_id, r.vec_id)
        if r.reason == "semantic":
            assert (lo, hi) in exact, (r.keep_id, r.vec_id)
            assert r.keep_id < r.vec_id
        else:
            assert r.reason == "exact" and r.keep_id < r.vec_id


def test_codec_wav_bmp_roundtrip_and_validation():
    """Real-container codecs (llm/codecs.py): encode→decode is
    bit-exact for 8/16-bit PCM WAV and 24-bit grayscale BMP (incl.
    undoing row padding + bottom-up order), header metadata is parsed
    from the stream, and every malformed-stream class raises
    ValueError rather than returning garbage."""
    import struct

    import numpy as np
    import pytest as _pytest

    from am_kinesis_pay_spark.llm.codecs import (
        decode_bmp,
        decode_wav,
        encode_bmp,
        encode_wav,
    )

    pcm8 = np.arange(256, dtype=np.uint8)
    meta, got = decode_wav(encode_wav(pcm8))
    assert (got == pcm8).all()
    assert meta == {
        "channels": 1,
        "sample_rate": 8000,
        "bits": 8,
        "n_samples": 256,
    }

    pcm16 = (np.arange(999) * 2731 % 32768).astype(np.int16)
    meta, got = decode_wav(encode_wav(pcm16, sample_rate=44100))
    assert (got == pcm16).all()
    assert meta["bits"] == 16 and meta["sample_rate"] == 44100

    # widths 5..9 cross every 4-byte row-padding case (pad 1,0,3,2,1)
    for w in range(5, 10):
        img = (np.arange(4 * w, dtype=np.uint32) * 37 % 256).astype(
            np.uint8
        ).reshape(4, w)
        meta, got = decode_bmp(encode_bmp(img))
        assert (got == img).all()
        assert meta == {"width": w, "height": 4, "bits": 24}

    wav = encode_wav(pcm8)
    bmp = encode_bmp(np.zeros((8, 8), np.uint8))
    for decode, bad in (
        (decode_wav, b"XX" + wav[2:]),  # wrong magic
        (decode_wav, wav[:-4]),  # truncated data chunk
        (decode_wav, wav[:4] + struct.pack("<I", 7) + wav[8:]),  # size lie
        (decode_bmp, b"XX" + bmp[2:]),
        (decode_bmp, bmp[:-8]),
        (decode_bmp, bmp[:2] + struct.pack("<I", 7) + bmp[6:]),
    ):
        with _pytest.raises(ValueError):
            decode(bad)


def test_codec_corruption_rate_and_containers(spark):
    """mm_codec_roundtrip end-to-end: exactly the doc_id % 31 rows are
    quarantined, every surviving wav row carries the header-derived
    sample metadata, and bmp dimensions match the square crop rule."""
    rows = queries()["mm_codec_roundtrip"](spark, SF_DIR).collect()
    assert rows
    by_container = {}
    for r in rows:
        by_container.setdefault(r.container, []).append(r)
    assert set(by_container) == {"wav", "bmp", "corrupt"}
    for r in by_container["corrupt"]:
        assert r.doc_id % 31 == 0 and r.payload_md5 is None
    for r in by_container["wav"]:
        assert r.sample_rate == 8000 and r.n_samples > 0 and r.width is None
    for r in by_container["bmp"]:
        assert r.width == r.height and r.width >= 1 and r.sample_rate is None


def test_ann_ivf_pq_full_rederivation(spark):
    """IVF-PQ: the entire pipeline — centroid sample, cell assignment,
    probe selection, PQ encoding, ADC scoring, top-k — re-derived from
    scratch in numpy and matched EXACTLY against the Spark result, so
    the composition introduces nothing the two parent operators
    (vec_ann_ivf, vec_ann_pq) didn't already pin."""
    import hashlib

    import numpy as np

    from am_kinesis_pay_spark.llm.similarity import (
        IVF_K,
        IVF_NPROBE,
        N_QUERIES,
        PQ_TRAIN,
        TOP_K,
        _pq_train,
    )
    from am_kinesis_pay_spark.tables import load

    rows = queries()["vec_ann_ivf_pq"](spark, SF_DIR).collect()
    assert rows

    vecs = {
        r.vec_id: np.array(r.embedding, dtype=np.float64)
        for r in load(spark, SF_DIR, "embeddings").collect()
    }
    ids = sorted(vecs)
    mat = np.stack([vecs[i] for i in ids])
    nmat = mat / np.linalg.norm(mat, axis=1, keepdims=True)

    # coarse quantizer: IVF_K smallest md5(vec_id), the vec_ann_ivf rule
    cent_ids = sorted(
        ids, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i)
    )[:IVF_K]
    cent = np.stack([vecs[i] for i in cent_ids])
    cent /= np.linalg.norm(cent, axis=1, keepdims=True)
    sims = np.round(nmat @ cent.T, 6)
    cells = sims.argmax(axis=1)
    cell_of = {ids[i]: cells[i] for i in range(len(ids))}

    # PQ codebooks from the deterministic vec_id-order sample
    books = _pq_train(nmat[: min(PQ_TRAIN, len(ids))])
    m, k, dsub = books.shape
    sub = nmat.reshape(len(ids), m, dsub)
    codes = (
        ((sub[:, :, None, :] - books[None, :, :, :]) ** 2).sum(axis=3)
    ).argmin(axis=2)
    code_of = {ids[i]: codes[i] for i in range(len(ids))}

    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    assert set(by_q) == {q for q in ids if q < N_QUERIES}

    for qid in by_q:
        qv = vecs[qid] / np.linalg.norm(vecs[qid])
        qsims = np.round(qv @ cent.T, 6)
        probe = np.argsort(-qsims, kind="stable")[:IVF_NPROBE]
        cand = [
            i for i in ids if i != qid and cell_of[i] in set(probe.tolist())
        ]
        tab = np.einsum("sd,sjd->sj", qv.reshape(m, dsub), books)
        scored = sorted(
            (
                (
                    -round(float(tab[np.arange(m), code_of[i]].sum()), 6),
                    i,
                )
                for i in cand
            ),
        )[:TOP_K]
        want = [(i, -s) for s, i in scored]
        got = [
            (r.neighbor_id, r.adc_cosine)
            for r in sorted(by_q[qid], key=lambda r: r.rank)
        ]
        assert got == [(i, round(s, 6)) for i, s in want], (qid, got, want)

    # the probed-cell bound actually bit: at least one query's
    # candidate set (re-derived above from probed cells) is a strict
    # subset of the corpus — i.e. nprobe < K actually pruned work
    pruned_any = False
    for qid in by_q:
        qv = vecs[qid] / np.linalg.norm(vecs[qid])
        qsims = np.round(qv @ cent.T, 6)
        probe = set(np.argsort(-qsims, kind="stable")[:IVF_NPROBE].tolist())
        n_cand = sum(1 for i in ids if i != qid and cell_of[i] in probe)
        if n_cand < len(ids) - 1:
            pruned_any = True
            break
    assert pruned_any, "IVF probe bound never pruned any candidate"

    # inline recall_at_5 audit column (VERDICT r8 #5): per-query
    # constant equal to |probed ADC top-5 ∩ exact-cosine top-5| / 5,
    # exact set recomputed by brute force with the engine's 6-dp
    # pre-round + neighbor_id tie-break
    for qid, rs in by_q.items():
        vals = {getattr(r, f"recall_at_{TOP_K}") for r in rs}
        assert len(vals) == 1, f"recall_at_{TOP_K} not constant for q{qid}"
        qv = vecs[qid] / np.linalg.norm(vecs[qid])
        sims = sorted(
            (
                (round(float(qv @ nmat[ids.index(i)]), 6), -i)
                for i in ids
                if i != qid
            ),
            reverse=True,
        )[:TOP_K]
        exact_k = {-ni for _, ni in sims}
        got_k = {r.neighbor_id for r in rs}
        want = round(len(exact_k & got_k) / len(exact_k), 3)
        assert vals.pop() == want, (qid, want)


def _pure_bpe(sf_dir):
    """Independent pure-Python BPE (Sennrich alg.) on the corpus read
    WITHOUT Spark (duckdb): returns (merge_table, final_vocab) where
    merge_table rows are (rank, left, right, merged, pair_count) and
    final_vocab is the Counter of fully-merged symbol tuples per
    distinct word, weighted by corpus word count."""
    from collections import Counter

    import duckdb

    from am_kinesis_pay_spark.llm.text import _BPE_EOW, _BPE_MERGES

    texts = [
        r[0]
        for r in duckdb.sql(
            f"SELECT text FROM '{sf_dir}/documents.parquet'"
        ).fetchall()
    ]
    vocab = Counter()
    for t in texts:
        for w in t.split(" "):
            if w:
                vocab[tuple(list(w) + [_BPE_EOW])] += 1
    merges = []
    for rank in range(1, _BPE_MERGES + 1):
        pairs = Counter()
        for syms, cnt in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += cnt
        if not pairs:
            break
        # argmax: count desc, then lexicographic pair asc
        (left, right), cnt = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0])
        )
        if cnt < 2:
            break
        merges.append((rank, left, right, left + right, cnt))
        new_vocab = Counter()
        for syms, c in vocab.items():
            res, i = [], 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == left
                    and syms[i + 1] == right
                ):
                    res.append(left + right)
                    i += 2
                else:
                    res.append(syms[i])
                    i += 1
            new_vocab[tuple(res)] += c
        vocab = new_vocab
    return merges, vocab


def test_bpe_train_matches_pure_python_mirror(spark):
    """Exact merge-sequence parity: the distributed BPE trainer must
    produce the identical (rank, left, right, merged, pair_count)
    sequence as an independent pure-Python BPE (Sennrich alg.) run on
    the same corpus read WITHOUT Spark (duckdb). Pins the pair
    extraction, count aggregation, argmax tiebreak (count desc, then
    lexicographic), and the leftmost-first non-overlapping merge
    collapse."""
    from am_kinesis_pay_spark.llm.text import _BPE_MERGES
    from am_kinesis_pay_spark.registry import REGISTRY

    expected, _ = _pure_bpe(SF_DIR)
    got = [
        tuple(r)
        for r in REGISTRY["text_bpe_train"].fn(spark, SF_DIR).collect()
    ]
    assert got == expected
    assert len(got) == _BPE_MERGES  # this corpus yields a full ladder


def test_bpe_encode_matches_pure_python_mirror(spark):
    """Exact token-frequency parity for the encode pass: tokenizing
    the corpus with the learned merges (nested JVM folds over the
    distinct-word vocab, weighted by word count) must equal the
    pure-Python mirror's final vocab state exactly — top-K rows,
    count-desc/token-asc order, ranks, lengths, and counts."""
    from collections import Counter

    from am_kinesis_pay_spark.llm.text import _BPE_ENCODE_TOPK, _BPE_EOW
    from am_kinesis_pay_spark.registry import REGISTRY

    _, final_vocab = _pure_bpe(SF_DIR)
    tok_counts = Counter()
    for syms, cnt in final_vocab.items():
        for s in syms:
            tok_counts[s] += cnt
    ordered = sorted(tok_counts.items(), key=lambda kv: (-kv[1], kv[0]))
    expected = [
        (i + 1, tok, len(tok), cnt)
        for i, (tok, cnt) in enumerate(ordered[:_BPE_ENCODE_TOPK])
    ]
    got = [
        tuple(r)
        for r in REGISTRY["text_bpe_encode"].fn(spark, SF_DIR).collect()
    ]
    assert got == expected
    # the merges actually bit: at least one multi-char merged subword
    # (not the bare end-of-word marker) made the top-K
    assert any(
        len(tok) > 1 and tok != _BPE_EOW for _, tok, _, _ in got
    )


def _pure_bpe_batched(sf_dir, k, batch_n):
    """Independent pure-Python BATCHED BPE mirror: per round, rank all
    pairs (count desc, lexicographic), truncate to the same candidate
    window the distributed trainer collects, greedily accept up to
    batch_n symbol-disjoint pairs, apply them (order-independent by
    disjointness), repeat. Returns rows shaped like
    text_bpe_train_batched: (rank, round, left, right, merged, count)."""
    from collections import Counter

    import duckdb

    from am_kinesis_pay_spark.llm.text import _BPE_CAND_FACTOR, _BPE_EOW

    texts = [
        r[0]
        for r in duckdb.sql(
            f"SELECT text FROM '{sf_dir}/documents.parquet'"
        ).fetchall()
    ]
    vocab = Counter()
    for t in texts:
        for w in t.split(" "):
            if w:
                vocab[tuple(list(w) + [_BPE_EOW])] += 1
    merges, rnd = [], 0
    while len(merges) < k:
        pairs = Counter()
        for syms, cnt in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += cnt
        cand = sorted(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[
            : batch_n * _BPE_CAND_FACTOR
        ]
        used, accepted = set(), []
        for (l, r), c in cand:
            if c < 2:
                break
            if l in used or r in used:
                continue
            accepted.append((l, r, c))
            used.update((l, r))
            if len(accepted) >= min(batch_n, k - len(merges)):
                break
        if not accepted:
            break
        rnd += 1
        batch = {(l, r): l + r for l, r, _ in accepted}
        for l, r, c in accepted:
            merges.append((len(merges) + 1, rnd, l, r, l + r, c))
        new_vocab = Counter()
        for syms, c in vocab.items():
            res, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) in batch:
                    res.append(batch[(syms[i], syms[i + 1])])
                    i += 2
                else:
                    res.append(syms[i])
                    i += 1
            new_vocab[tuple(res)] += c
        vocab = new_vocab
    return merges, rnd


def test_bpe_batched_n1_is_exact_sennrich(spark):
    """batched(k, N=1) must reduce to the exact Sennrich sequence the
    sequential trainer (and its pure-Python mirror) produces."""
    from am_kinesis_pay_spark.llm.text import (
        _BPE_MERGES,
        _bpe_train_merges,
    )
    from am_kinesis_pay_spark.registry import REGISTRY

    merges, n_rounds = _bpe_train_merges(spark, SF_DIR, _BPE_MERGES, 1)
    assert n_rounds == len(merges)  # one merge per round at N=1
    got = [(rk, l, r, m, c) for (rk, _rnd, l, r, m, c) in merges]
    want = [
        tuple(r)
        for r in REGISTRY["text_bpe_train"].fn(spark, SF_DIR).collect()
    ]
    assert got == want
    assert got == _pure_bpe(SF_DIR)[0]


def test_bpe_batched_matches_pure_python_batched_mirror(spark):
    """Exact ladder parity for the batched trainer (N>1) against the
    independent pure-Python batched mirror, and the round-compression
    receipt: k merges land in ceil-ish k/N rounds, each round's
    accepted pairs pairwise symbol-disjoint."""
    from am_kinesis_pay_spark.llm.text import _BPE_BATCH_N, _BPE_MERGES
    from am_kinesis_pay_spark.registry import REGISTRY

    want, n_rounds = _pure_bpe_batched(SF_DIR, _BPE_MERGES, _BPE_BATCH_N)
    got = [
        tuple(r)
        for r in REGISTRY["text_bpe_train_batched"].fn(spark, SF_DIR).collect()
    ]
    assert got == want
    assert len(got) == _BPE_MERGES
    rounds = {rnd for _, rnd, *_ in got}
    assert len(rounds) == n_rounds
    assert n_rounds < _BPE_MERGES  # batching genuinely cut rounds
    # within-round disjointness (the order-independence precondition)
    from collections import defaultdict

    by_round = defaultdict(list)
    for _, rnd, l, r, _, _ in got:
        by_round[rnd].append((l, r))
    for prs in by_round.values():
        syms = [s for p in prs for s in p]
        assert len(syms) == len(set(syms))


def test_bpe_remat_spill_preserves_ladder(spark, monkeypatch):
    """The fold-depth bound: spilling the collapsed vocab to scratch
    parquet every _BPE_REMAT_ROUNDS rounds and restarting the fold
    stack must leave the merge ladder (ranks, rounds, pairs, counts)
    exactly unchanged — the spilled frame IS the collapsed state."""
    import am_kinesis_pay_spark.llm.text as TX

    monkeypatch.setattr(TX, "_BPE_REMAT_ROUNDS", 2)
    with_spill, r1 = TX._bpe_train_merges(spark, SF_DIR, 8, 1)
    monkeypatch.setattr(TX, "_BPE_REMAT_ROUNDS", 10**9)
    without, r2 = TX._bpe_train_merges(spark, SF_DIR, 8, 1)
    assert with_spill == without and r1 == r2


def test_zero_norm_embedding_kernels_safe(spark, tmp_path_factory):
    """ADVICE r5: a zero-norm embedding (or a zero-norm centroid drawn
    from it) must not poison the numpy assignment kernels — a plain
    divide makes a NaN row and np.argmax treats NaN as maximal, so one
    zero vector could capture EVERY cell assignment. unit_rows clamps
    the norm; end-to-end, vec_ann_ivf and emb_semdedup must run on a
    fixture containing zero vectors and never let the zero vector's
    cell swallow the corpus."""
    import numpy as np

    from am_kinesis_pay_spark.llm.nputil import nan_to_neginf, unit_rows

    a = np.array([[0.0, 0.0], [3.0, 4.0]])
    u = unit_rows(a)
    assert not np.isnan(u).any()
    assert np.allclose(u, [[0.0, 0.0], [0.6, 0.8]])
    sims = nan_to_neginf(np.array([[np.nan, 0.2], [0.9, np.nan]]))
    assert sims.argmax(axis=1).tolist() == [1, 0]

    # end-to-end: copy sf0.001 embeddings, zero out a handful of rows
    # (including one early enough to be picked as a centroid candidate)
    import duckdb

    src = "/root/testdata/sf0.001"
    out = str(tmp_path_factory.mktemp("zero_norm_sf"))
    con = duckdb.connect()
    con.execute(f"""
      COPY (SELECT vec_id,
                   CASE WHEN vec_id % 7 = 0
                        THEN CAST(list_transform(embedding, x -> CAST(0.0 AS FLOAT)) AS FLOAT[])
                        ELSE embedding END AS embedding,
                   label
            FROM '{src}/embeddings.parquet')
      TO '{out}/embeddings.parquet' (FORMAT PARQUET)""")
    con.close()

    from am_kinesis_pay_spark.registry import queries

    qs = queries()
    ivf = qs["vec_ann_ivf"](spark, out).collect()
    assert len(ivf) > 0
    # the semdedup path also builds centroids + assignments from scratch
    sem = qs["emb_semdedup"](spark, out)
    n_total = spark.read.parquet(f"{out}/embeddings.parquet").count()
    kept = sem.count()
    # zero vectors have cosine 0 to everything (below every threshold),
    # so they can never be flagged dups of each other or anything else;
    # a NaN-poisoned argmax would instead pile the corpus into one cell
    assert 0 < kept <= n_total


def test_cdc_chunks_tile_exactly(spark):
    """text_dedup_cdc's chunking must TILE: per doc, chunk lengths sum
    to the doc length (no gap, no overlap) — the invariant that makes
    chunk-hash dedup equal substring dedup at chunk granularity."""
    from pyspark.sql import Window as W, functions as F

    from am_kinesis_pay_spark.llm.dedup import _CDC_BOUND, _CDC_GRAM
    from am_kinesis_pay_spark.tables import load

    docs = load(spark, SF_DIR, "documents")
    g = _CDC_GRAM
    pos = docs.select(
        "doc_id",
        F.length("text").alias("lt"),
        F.explode(
            F.filter(
                F.sequence(F.lit(g), F.length("text")),
                lambda i: F.md5(F.col("text").substr(i - (g - 1), F.lit(g)))
                < _CDC_BOUND,
            )
        ).alias("i"),
    )
    w = W.partitionBy("doc_id").orderBy("i")
    lens = pos.withColumn(
        "prev", F.coalesce(F.lag("i", 1).over(w), F.lit(0))
    ).groupBy("doc_id").agg(
        F.max("lt").alias("lt"),
        F.sum(F.col("i") - F.col("prev")).alias("body"),
        F.max("i").alias("mx"),
    )
    bad = (
        docs.select("doc_id", F.length("text").alias("lt0"))
        .join(lens, "doc_id", "left")
        .withColumn(
            "total",
            F.coalesce("body", F.lit(0))
            + F.greatest(
                F.col("lt0") - F.coalesce("mx", F.lit(0)), F.lit(0)
            ),
        )
        .filter(F.col("total") != F.col("lt0"))
        .count()
    )
    assert bad == 0


def test_ann_nsw_recall_vs_exact(spark):
    """vec_ann_nsw's beam search must find a useful fraction of the
    exact top-5 from ONE entry point in 3 hops — the recall anchor the
    whole ANN ladder carries (exact path = vec_cosine_topk)."""
    from am_kinesis_pay_spark.registry import queries

    qs = queries()
    exact = {}
    for r in qs["vec_cosine_topk"](spark, SF_DIR).collect():
        exact.setdefault(r.query_id, set()).add(r.neighbor_id)
    got = {}
    for r in qs["vec_ann_nsw"](spark, SF_DIR).collect():
        got.setdefault(r.query_id, set()).add(r.neighbor_id)
    assert set(got) == set(exact)  # every query answered, exactly top-5 rows
    hits = sum(len(got[q] & exact[q]) for q in exact)
    total = sum(len(v) for v in exact.values())
    recall = hits / total
    # measured 0.62 at sf0.001; assert a floor with slack for future
    # fixture regeneration, and that it beats random (which would be ~0)
    assert recall >= 0.3, recall
