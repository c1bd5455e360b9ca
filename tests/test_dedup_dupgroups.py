"""Duplicate-group mitigation for the MinHash/LSH family
(llm/dedup.py section header): boilerplate dup-groups are the NORM in
web corpora at 100 TB — identical docs share ALL bands, so naive LSH
candidates grow quadratically per group. These tests pin both halves
of the fix on an adversarial synthetic corpus:

1. EXACT-DUP COLLAPSE — heavy copy-groups cost ONE representative in
   the signature/band/verify stages; member pairs come back through
   arithmetic expansion, value-identical to the DuckDB oracle.
2. PER-BAND BUCKET CAP — >BAND_CAP DISTINCT texts engineered into one
   bucket (distinct strings with identical shingle SETS) are capped
   deterministically, identically on both engines.
"""

from __future__ import annotations

import math
import os

import numpy as np
import pytest

from am_kinesis_pay_spark.llm import dedup as D
from am_kinesis_pay_spark.tables import TABLES

from tests.conftest import SF_DIR, _duck_con, compare_query

# copies in the heavy exact-dup group; distinct texts in the capped
# bucket (identical shingle sets -> one (band, band_val) bucket)
N_COPIES = 50
N_BUCKET = D.BAND_CAP + 6


def _texts() -> list[tuple[int, str]]:
    rows: list[tuple[int, str]] = []
    i = 0

    def add(t: str):
        nonlocal i
        rows.append((i, t))
        i += 1

    # heavy exact-dup group: N_COPIES identical docs
    for _ in range(N_COPIES):
        add("alpha beta gamma delta epsilon zeta")
    # near-dup of the group's text (shares most shingles)
    add("alpha beta gamma delta epsilon eta")
    # >BAND_CAP distinct texts with IDENTICAL shingle sets: repeating a
    # 3-word cycle k>=2 times always yields the same 3 shingles, so all
    # land in one bucket while being distinct strings (no collapse)
    for k in range(2, 2 + N_BUCKET):
        add(" ".join(["red", "green", "blue"] * k))
    # dup group BELOW the shingle threshold (<3 tokens): must emit no
    # pairs (no shingles -> never a candidate, same as the old oracle)
    for _ in range(5):
        add("tiny doc")
    # unrelated singletons
    add("one completely unrelated document about spark execution")
    add("another text speaking only of parquet column pruning")
    return rows


@pytest.fixture(scope="module")
def dup_dir(tmp_path_factory):
    # single-FILE parquet (pyarrow), like the driver's testdata — DuckDB
    # views point at '<t>.parquet' paths, not Spark part-file dirs
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = str(tmp_path_factory.mktemp("dup_sf"))
    for t in TABLES:
        if t in ("documents", "embeddings"):
            continue
        src = pq.read_table(os.path.join(SF_DIR, f"{t}.parquet"))
        pq.write_table(src.slice(0, 0), os.path.join(d, f"{t}.parquet"))
    texts = _texts()
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([i for i, _ in texts], pa.int64()),
                "text": pa.array([t for _, t in texts], pa.string()),
                "lang": pa.array(["en"] * len(texts), pa.string()),
                "source": pa.array(["synthetic"] * len(texts), pa.string()),
                "n_chars": pa.array([len(t) for _, t in texts], pa.int64()),
            }
        ),
        os.path.join(d, "documents.parquet"),
    )
    # embeddings: one 30-copy duplicate vector group spanning batch
    # (vec_id % 10 == 0) and corpus ids, plus distinct vectors
    rng = np.random.default_rng(7)
    base = rng.normal(size=64).astype("float32")
    embs = [base] * 30 + [
        rng.normal(size=64).astype("float32") for _ in range(30)
    ]
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(60), pa.int64()),
                "embedding": pa.array(
                    [list(map(float, v)) for v in embs],
                    pa.list_(pa.float32()),
                ),
                "label": pa.array(
                    [0] * 30 + [1] * 30, pa.int32()
                ),
            }
        ),
        os.path.join(d, "embeddings.parquet"),
    )
    return d


@pytest.fixture(scope="module")
def dup_ducks(dup_dir):
    con = _duck_con(dup_dir)
    yield con
    con.close()


@pytest.mark.parametrize(
    "name",
    [
        "text_dedup_minhash",
        "text_dedup_clusters",
        "text_dedup_keep_best",
        "text_dedup_minhash_incremental",
        "text_decontaminate_fuzzy",
        "emb_dedup_incremental",
        "text_dedup_containment",
        "text_dedup_ngram",
        "emb_dedup_cosine_lsh",
        "emb_dedup_clusters",
        "text_dedup_substring",
    ],
)
def test_family_parity_on_dup_heavy_corpus(spark, dup_dir, dup_ducks, name):
    compare_query(spark, dup_ducks, name, dup_dir)


def test_collapse_bounds_rep_stage(spark, dup_dir):
    """The expensive stages see one row per DISTINCT shingled text: the
    rep index must hold exactly the distinct texts with >=3 tokens, no
    matter how many copies exist."""
    texts = _texts()
    distinct_shingled = {t for _, t in texts if len(t.split(" ")) >= 3}
    idx = D._rep_index(spark, dup_dir)
    assert idx.count() == len(distinct_shingled)
    # the 50-copy group contributes exactly ONE rep row
    assert (
        idx.filter("doc_id = 0").count() == 1
    ), "heavy dup group must collapse to its min-doc_id representative"


def test_band_cap_bounds_bucket_pairs(spark, dup_dir):
    """N_BUCKET distinct texts share one bucket per band; the cap keeps
    only BAND_CAP of them (deterministic md5 order), so rep-level
    pairs from that bucket are C(cap, 2), not C(N_BUCKET, 2)."""
    rp = D._rep_pairs(spark, dup_dir)
    # bucket doc ids start after the copies + near-dup
    lo = N_COPIES + 1
    hi = lo + N_BUCKET
    bucket_pairs = rp.filter(
        f"rep_a >= {lo} and rep_a < {hi} and rep_b >= {lo} and rep_b < {hi}"
    ).count()
    cap = D.BAND_CAP
    assert bucket_pairs == cap * (cap - 1) // 2
    # and the uncapped count would have been strictly larger
    assert bucket_pairs < N_BUCKET * (N_BUCKET - 1) // 2


def test_expansion_recovers_member_pairs(spark, dup_dir):
    """Intra-group pairs come back arithmetically at Jaccard 1.0:
    C(N_COPIES, 2) pairs for the copy group, plus cross pairs to the
    near-dup singleton at the rep-level Jaccard."""
    pairs = (
        D.text_dedup_minhash(spark, dup_dir)
        .filter(f"doc_a < {N_COPIES + 1} and doc_b < {N_COPIES + 1}")
        .collect()
    )
    intra = [r for r in pairs if r.doc_b < N_COPIES]
    cross = [r for r in pairs if r.doc_b == N_COPIES]
    assert len(intra) == N_COPIES * (N_COPIES - 1) // 2
    assert all(r.jaccard == 1.0 for r in intra)
    # the near-dup doc (id N_COPIES) shares 3 of 4+4-3... its Jaccard
    # vs the group text: |∩|/(|A|+|B|-|∩|) with 4-shingle docs = 3/5
    assert len(cross) == N_COPIES
    assert all(math.isclose(r.jaccard, 0.6) for r in cross)


def test_sub_shingle_dup_group_emits_nothing(spark, dup_dir):
    """<3-token dup groups have no shingles, hence no pairs — the
    expansion must not invent intra pairs for unshingled groups."""
    lo = N_COPIES + 1 + N_BUCKET
    out = D.text_dedup_minhash(spark, dup_dir).filter(
        f"doc_a >= {lo} and doc_a < {lo + 5}"
    )
    assert out.count() == 0


def test_label_propagation_converges_on_long_chains(spark):
    """Min-label propagation advances one hop per round, so a chain of
    n groups needs ~n rounds — the old fixed 20-round cap returned
    WRONG labels silently for diameter > 20. Pin a 35-node chain (plus
    a disjoint triangle) against a pure-Python union-find."""
    pairs = [(i, i + 1) for i in range(35)] + [(100, 101), (101, 102), (100, 102)]
    df = spark.createDataFrame(pairs, "a bigint, b bigint")
    got = {
        r.node: r.cluster_id
        for r in D._min_label_components(df, "a", "b", "node").collect()
    }
    # union-find ground truth
    parent: dict = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want_nodes = {x for p in pairs for x in p}
    want = {x: find(x) for x in want_nodes}
    assert got == want
