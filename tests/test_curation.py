"""Semantic invariants for the corpus-curation operators — properties
the DuckDB oracle can't express (it only confirms engine parity, not
that the shared semantics are the *right* ones)."""

from __future__ import annotations

from pyspark.sql import functions as F

from am_kinesis_pay_spark.llm.curation import (
    _BENCH_MOD,
    _CHUNK,
    _MIX_QUOTA,
    _PACK_BUDGET,
    _STRIDE,
)
from am_kinesis_pay_spark.registry import queries
from am_kinesis_pay_spark.tables import load

from tests.conftest import SF_DIR


def test_chunks_cover_every_token(spark):
    """Every token index of every doc falls inside >= 1 chunk, chunks
    start on stride boundaries, and only the last chunk may be short."""
    chunks = queries()["text_chunk_sliding"](spark, SF_DIR).collect()
    docs = {
        r.doc_id: r.n
        for r in load(spark, SF_DIR, "documents")
        .select("doc_id", F.size(F.split("text", " ")).alias("n"))
        .collect()
    }
    by_doc: dict[int, list] = {}
    for c in chunks:
        by_doc.setdefault(c.doc_id, []).append(c)
    assert set(by_doc) == set(docs)
    for doc_id, cs in by_doc.items():
        cs.sort(key=lambda c: c.start_token)
        n = docs[doc_id]
        covered_to = 0
        for c in cs:
            assert c.start_token % _STRIDE == 0
            assert c.start_token <= covered_to  # no gap
            assert c.n_chunk_tokens == min(_CHUNK, n - c.start_token)
            assert len(c.chunk_text.split(" ")) == c.n_chunk_tokens
            covered_to = max(covered_to, c.start_token + c.n_chunk_tokens)
        assert covered_to == n  # full coverage


def test_decontaminate_excludes_benchmark_and_flags_dups(spark):
    """Benchmark docs never appear in the output; any doc that is an
    exact duplicate of a benchmark doc must be flagged contaminated."""
    rows = queries()["text_decontaminate"](spark, SF_DIR).collect()
    assert all(r.doc_id % _BENCH_MOD != 0 for r in rows)
    assert all(0 <= r.n_contaminated <= r.n_grams for r in rows)
    assert all(r.is_contaminated == (r.n_contaminated > 0) for r in rows)

    docs = load(spark, SF_DIR, "documents").select("doc_id", "text").collect()
    bench_texts = {r.text for r in docs if r.doc_id % _BENCH_MOD == 0}
    flagged = {r.doc_id for r in rows if r.is_contaminated}
    for r in docs:
        if (
            r.doc_id % _BENCH_MOD != 0
            and r.text in bench_texts
            and len(r.text.split(" ")) >= 5
        ):
            assert r.doc_id in flagged, f"exact benchmark dup {r.doc_id} not flagged"


def test_mixture_sample_hits_quota(spark):
    """Per-language draw = min(quota, available); ranks are 1..n dense."""
    rows = queries()["sample_mixture"](spark, SF_DIR).collect()
    avail = {
        r.lang: r.n
        for r in load(spark, SF_DIR, "documents").groupBy("lang").count()
        .withColumnRenamed("count", "n").collect()
    }
    by_lang: dict[str, list] = {}
    for r in rows:
        by_lang.setdefault(r.lang, []).append(r.sample_rank)
    for lang, quota in _MIX_QUOTA.items():
        got = sorted(by_lang.get(lang, []))
        assert got == list(range(1, min(quota, avail.get(lang, 0)) + 1))


def test_packing_is_greedy_within_shard(spark):
    """Within each source shard, pack ids are non-decreasing in doc
    order and a pack never exceeds budget + one document (greedy
    overflow bound)."""
    rows = queries()["text_pack_sequences"](spark, SF_DIR).collect()
    by_src: dict[str, list] = {}
    for r in rows:
        by_src.setdefault(r.source, []).append(r)
    for src, rs in by_src.items():
        rs.sort(key=lambda r: r.doc_id)
        prev_pack, cum = 0, 0
        for r in rs:
            cum += r.n_tokens
            assert r.cum_tokens == cum
            assert r.pack_id >= prev_pack
            assert r.pack_id == (r.cum_tokens - r.n_tokens) // _PACK_BUDGET
            prev_pack = r.pack_id


# -- pure-formula property tests (no Spark; exhaustive over doc sizes) --


def _chunk_starts(n: int, chunk: int, stride: int) -> list[int]:
    """Python mirror of the start-index expression both engines run."""
    import math

    last = max(math.ceil((n - chunk) / stride) * stride, 0)
    return list(range(0, last + 1, stride))


def test_chunk_start_formula_properties():
    from hypothesis import given, strategies as st

    @given(st.integers(min_value=1, max_value=5000))
    def check(n):
        starts = _chunk_starts(n, _CHUNK, _STRIDE)
        # every token covered, first chunk at 0, starts strictly increase
        assert starts[0] == 0
        assert all(b - a == _STRIDE for a, b in zip(starts, starts[1:]))
        assert starts[-1] + _CHUNK >= n  # tail covered
        if len(starts) > 1:
            # no fully-redundant final window
            assert starts[-1] < n
            assert starts[-2] + _CHUNK < n
        # chunk count is the minimal count for full coverage
        import math

        expected = 1 + max(math.ceil((n - _CHUNK) / _STRIDE), 0)
        assert len(starts) == expected

    check()


def test_pack_id_formula_properties():
    from hypothesis import given, strategies as st

    @given(st.lists(st.integers(min_value=1, max_value=200), min_size=1, max_size=200))
    def check(tokens):
        cum = 0
        prev_pack = 0
        packs: dict[int, int] = {}
        for t in tokens:
            pack = cum // _PACK_BUDGET  # = (cum_after - t) // budget
            cum += t
            assert pack >= prev_pack  # monotone
            prev_pack = pack
            packs[pack] = packs.get(pack, 0) + t
        # greedy bound: a pack only overflows by the doc that crossed it
        for pack, total in packs.items():
            assert total <= _PACK_BUDGET + max(tokens)
        # packs are dense 0..max
        assert sorted(packs) == list(range(max(packs) + 1))

    check()


def test_shard_shuffle_is_a_balanced_permutation(spark):
    """Round-robin dealing over the md5 order: shard sizes differ by at
    most 1, every (shard, pos) slot is unique, and the mapping is a
    permutation of the corpus (no doc lost or duplicated)."""
    from am_kinesis_pay_spark.registry import queries
    from am_kinesis_pay_spark.tables import load
    from tests.conftest import SF_DIR

    out = queries()["sample_shard_shuffle"](spark, SF_DIR)
    rows = out.collect()
    n_docs = load(spark, SF_DIR, "documents").count()
    assert len(rows) == n_docs
    assert len({r.doc_id for r in rows}) == n_docs
    assert len({(r.shard, r.pos) for r in rows}) == n_docs
    sizes = {}
    for r in rows:
        sizes[r.shard] = sizes.get(r.shard, 0) + 1
    assert max(sizes.values()) - min(sizes.values()) <= 1
    # stability: deleting no docs, the same corpus yields the same deal
    again = queries()["sample_shard_shuffle"](spark, SF_DIR).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_keep_best_selects_one_longest_doc_per_cluster(spark):
    """Exactly one kept doc per cluster; the kept doc has the cluster's
    max n_chars; cluster sizes sum back to the corpus size."""
    from am_kinesis_pay_spark.registry import queries
    from am_kinesis_pay_spark.tables import load
    from tests.conftest import SF_DIR

    out = queries()["text_dedup_keep_best"](spark, SF_DIR)
    rows = out.collect()
    docs = {
        r.doc_id: r.n_chars
        for r in load(spark, SF_DIR, "documents").select(
            "doc_id", "n_chars"
        ).collect()
    }
    assert len(rows) == len(docs)
    by_cluster: dict[int, list] = {}
    for r in rows:
        by_cluster.setdefault(r.cluster_id, []).append(r)
    for cid, members in by_cluster.items():
        kept = [m for m in members if m.is_kept]
        assert len(kept) == 1, f"cluster {cid}: {len(kept)} kept"
        assert docs[kept[0].doc_id] == max(docs[m.doc_id] for m in members)
        assert all(m.cluster_size == len(members) for m in members)


def test_classifier_train_reduces_logloss(spark):
    """The trained weights must beat the zero-weight baseline (mean
    logloss ln 2) on the training objective — i.e. the distributed GD
    actually descends — and the trace must be run-to-run deterministic
    (fixed-point BIGINT discipline leaves no float-order freedom)."""
    import math

    from am_kinesis_pay_spark.registry import queries
    from am_kinesis_pay_spark.tables import load
    from tests.conftest import SF_DIR

    w = {r.bucket: r.weight for r in
         queries()["text_classifier_train"](spark, SF_DIR).collect()}
    assert len(w) == 32
    assert any(v != 0.0 for v in w.values())

    docs = load(spark, SF_DIR, "documents").select(
        "doc_id", "lang", "text"
    ).collect()
    import hashlib

    losses = []
    for r in docs:
        toks = [t for t in r.text.split(" ") if t]
        if not toks:
            continue
        feats: dict[int, int] = {}
        for t in toks:
            j = int(hashlib.md5(t.encode()).hexdigest()[:4], 16) % 32
            feats[j] = feats.get(j, 0) + 1
        logit = sum(w[j] * c / len(toks) for j, c in feats.items())
        y = 1 if r.lang == "en" else 0
        p = 1.0 / (1.0 + math.exp(-logit))
        losses.append(-(y * math.log(p) + (1 - y) * math.log(1.0 - p)))
    assert sum(losses) / len(losses) < math.log(2)

    again = {r.bucket: r.weight for r in
             queries()["text_classifier_train"](spark, SF_DIR).collect()}
    assert again == w


def test_bloom_decontaminate_one_sided_error(spark):
    """Bloom's defining law, observed per doc: NO false negatives —
    every truly contaminated gram instance is bloom-hit (n_bloom_hits
    >= n_true_hits), false positives are exactly the surplus, and the
    truth column agrees with text_decontaminate's exact n_contaminated
    per doc (same gram construction, same benchmark split)."""
    bloom = {
        r.doc_id: r
        for r in queries()["text_decontaminate_bloom"](
            spark, SF_DIR
        ).collect()
    }
    exact = {
        r.doc_id: r
        for r in queries()["text_decontaminate"](spark, SF_DIR).collect()
    }
    assert set(bloom) == set(exact)
    for doc_id, b in bloom.items():
        assert b.n_bloom_hits >= b.n_true_hits  # no false negatives
        assert b.n_false_pos == b.n_bloom_hits - b.n_true_hits
        assert b.n_true_hits == exact[doc_id].n_contaminated
        assert b.n_grams == exact[doc_id].n_grams
        assert b.is_flagged == (1 if b.n_bloom_hits > 0 else 0)


def test_token_budget_coin_and_saturation(spark, ducks):
    """sample_token_budget invariants: the acceptance coin is the
    md5-of-doc_id threshold recomputed independently in Python
    (selection is exactly reproducible — no RNG); sources whose rate
    saturates at 1.0 keep EVERYTHING; and each source's fill ratio is
    tokens_kept over the per-source target."""
    import hashlib

    rows = queries()["sample_token_budget"](spark, SF_DIR).collect()
    per_doc = ducks.execute(
        "SELECT doc_id, source, len(string_split(text, ' ')) FROM documents"
    ).fetchall()
    total = sum(t for _, _, t in per_doc)
    budget = 0.5 * total
    n_sources = len(rows)
    target = budget / n_sources

    def frac(doc_id):
        h = hashlib.md5(str(doc_id).encode()).hexdigest()
        return int(h[:15], 16) / float(1 << 60)

    for r in rows:
        rate = min(1.0, target / r.tokens_total)
        kept = [
            (d, t) for d, s, t in per_doc
            if s == r.source and frac(d) < rate
        ]
        assert r.docs_kept == len(kept), (r.source, r.docs_kept, len(kept))
        assert r.tokens_kept == sum(t for _, t in kept)
        if r.rate == 1.0:
            assert r.docs_kept == r.n_docs
            assert r.tokens_kept == r.tokens_total
        assert abs(r.fill_ratio - r.tokens_kept / target) < 1e-6


def test_dsir_selection_matches_python_recompute(spark, ducks):
    """pipeline_dsir_selection re-derived end-to-end in pure Python
    (hashlib md5 bucket hashing, Laplace-smoothed log ratios at 6-dp
    freeze, average per doc): the selected set, its order keys, and
    every weight must match — and no target-domain doc may appear in
    the selection."""
    import hashlib
    import math as m

    from am_kinesis_pay_spark.llm.curation import (
        _DSIR2_B,
        _DSIR2_N,
        _DSIR2_TARGET,
    )

    rows = queries()["pipeline_dsir_selection"](spark, SF_DIR).collect()
    assert len(rows) <= _DSIR2_N
    assert all(r.source not in _DSIR2_TARGET for r in rows)

    docs = ducks.execute(
        "SELECT doc_id, source, text FROM documents"
    ).fetchall()

    def buckets(text):
        t = text.split(" ")
        out = []
        for i in range(len(t) - 1):
            h = hashlib.md5(f"{t[i]} {t[i+1]}".encode()).hexdigest()
            out.append(int(h[:15], 16) % _DSIR2_B)
        return out

    tgt, raw = {}, {}
    per_doc = {}
    for doc_id, source, text in docs:
        bs = buckets(text)
        if not bs:
            continue
        side = tgt if source in _DSIR2_TARGET else raw
        for b in bs:
            side[b] = side.get(b, 0) + 1
        if source not in _DSIR2_TARGET:
            per_doc[doc_id] = (source, bs)
    t_tot, r_tot = sum(tgt.values()), sum(raw.values())
    lr = {
        b: round(
            m.log((tgt.get(b, 0) + 1.0) / (t_tot + _DSIR2_B))
            - m.log((c + 1.0) / (r_tot + _DSIR2_B)),
            6,
        )
        for b, c in raw.items()
    }
    scored = [
        (
            round(sum(lr[b] for b in bs) / len(bs), 6),
            doc_id,
            source,
            len(bs),
        )
        for doc_id, (source, bs) in per_doc.items()
    ]
    scored.sort(key=lambda x: (-x[0], x[1]))
    want = scored[: _DSIR2_N]
    got = sorted(
        [(r.avg_log_ratio, r.doc_id, r.source, r.n_bigrams) for r in rows],
        key=lambda x: (-x[0], x[1]),
    )
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert g[1] == w[1] and g[2] == w[2] and g[3] == w[3], (g, w)
        assert abs(g[0] - w[0]) < 2e-6, (g, w)


def test_upsample_repeat_matches_python_coin(spark, ducks):
    """sample_upsample_repeat re-derived in Python: per-source factor,
    per-doc copy count (floor + md5-coin fractional), realized copies
    and tokens must match exactly; balance law: every source's
    expected token mass is the SAME target."""
    import hashlib

    rows = {r.source: r for r in
            queries()["sample_upsample_repeat"](spark, SF_DIR).collect()}
    per_doc = ducks.execute(
        "SELECT doc_id, source, len(string_split(text, ' '))"
        " FROM documents"
    ).fetchall()
    by_src = {}
    for d, s, t in per_doc:
        by_src.setdefault(s, []).append((d, t))
    target = sum(t for _, _, t in per_doc) / len(by_src)

    def frac(doc_id):
        h = hashlib.md5(str(doc_id).encode()).hexdigest()
        return int(h[:15], 16) / float(1 << 60)

    import math as m

    for s, docs in by_src.items():
        tokens_total = sum(t for _, t in docs)
        factor = target / tokens_total
        copies = tokens = 0
        for d, t in docs:
            n = int(m.floor(factor)) + (
                1 if frac(d) < factor - m.floor(factor) else 0
            )
            copies += n
            tokens += n * t
        r = rows[s]
        assert r.copies_out == copies, (s, r.copies_out, copies)
        assert r.tokens_out == tokens
        assert abs(r.factor - factor) < 2e-6
        assert abs(r.fill_ratio - tokens / target) < 2e-6
