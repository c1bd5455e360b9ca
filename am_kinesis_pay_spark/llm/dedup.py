"""Deduplication operators (BASELINE.json north-star; SURVEY.md §2.10).

Five dedup strategies, each a real pipeline over ``documents`` /
``embeddings``:

- exact:   normalize → hash → keep first doc per hash
- minhash: shingle → md5 minhash signature → LSH bands → bucket join →
           exact-Jaccard verify (the full candidate-generation +
           verification pipeline, not just the sketch)
- simhash: per-token md5-derived bit votes → 16-bit signature
- ngram:   within-blocking-key exact Jaccard on 3-token shingles
- cosine:  embedding near-dup pairs above a cosine threshold

Everything uses md5 (bit-identical in DuckDB) instead of murmur3 so
every stage is oracle-checkable — including MinHash, which is usually
waved through as "not SQL-expressible".

Scale notes (100 TB): the only all-pairs product is within LSH buckets
(minhash) or within a blocking key (ngram) — never global. Signatures
are one shuffle per stage on doc_id; the bucket join shuffles on
(band, band_value), where hot buckets (boilerplate docs) are the skew
risk — AQE skew-join handles moderate cases, salting the band value is
the escape hatch. Embedding near-dup ships both forms: the tiled exact
all-pairs baseline (emb_dedup_cosine) and the subquadratic LSH-blocked
variant (emb_dedup_cosine_lsh), both oracle-checked.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from am_kinesis_pay_spark.registry import REGISTRY, register
from am_kinesis_pay_spark.tables import load

N_PERM = 8  # minhash permutations
BAND_W = 2  # rows per LSH band → 4 bands, catches J ≳ 0.5


@register(
    "text_dedup_exact",
    oracle="""
WITH keyed AS (
  SELECT doc_id, md5(lower(trim(text))) AS text_key,
    ROW_NUMBER() OVER (PARTITION BY md5(lower(trim(text))) ORDER BY doc_id) AS rn
  FROM documents
)
SELECT text_key, MIN(doc_id) AS keep_doc_id, COUNT(*) AS n_copies
FROM keyed
GROUP BY text_key
""",
    tags=("llm", "dedup"),
)
def text_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup on normalized text: one hash-shuffle, keep the
    lowest doc_id per group (deterministic, unlike dropDuplicates)."""
    docs = load(spark, sf_dir, "documents")
    return (
        docs.select(
            "doc_id", F.md5(F.lower(F.trim("text"))).alias("text_key")
        )
        .groupBy("text_key")
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def _shingles(docs: DataFrame) -> DataFrame:
    """Distinct 3-token shingles per doc (shared with winnowing)."""
    toks = docs.select("doc_id", F.split("text", " ").alias("t")).filter(
        F.size("t") >= 3
    )
    return toks.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size("t") - 3),
                lambda i: F.concat_ws(
                    " ",
                    F.element_at("t", i + 1),
                    F.element_at("t", i + 2),
                    F.element_at("t", i + 3),
                ),
            )
        ).alias("shingle"),
    ).distinct()


_MINHASH_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
), shingles AS (
  SELECT DISTINCT doc_id, concat_ws(' ', t[i+1], t[i+2], t[i+3]) AS shingle
  FROM (SELECT doc_id, t, unnest(range(0, len(t) - 2)) AS i
        FROM toks WHERE len(t) >= 3)
), mh AS (
  SELECT doc_id, s.seed,
    MIN(md5(concat(CAST(s.seed AS VARCHAR), ':', shingle))) AS h
  FROM shingles, generate_series(0, {N_PERM - 1}) AS s(seed)
  GROUP BY doc_id, s.seed
), bands AS (
  SELECT doc_id, seed // {BAND_W} AS band,
    string_agg(h, '|' ORDER BY seed) AS band_val
  FROM mh GROUP BY doc_id, seed // {BAND_W}
), cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.band_val = b.band_val AND a.doc_id < b.doc_id
), sizes AS (
  SELECT doc_id, COUNT(*) AS n FROM shingles GROUP BY doc_id
), verified AS (
  SELECT c.doc_a, c.doc_b, COUNT(*) AS n_common, sa.n AS n_a, sb.n AS n_b
  FROM cand c
  JOIN shingles x ON x.doc_id = c.doc_a
  JOIN shingles y ON y.doc_id = c.doc_b AND y.shingle = x.shingle
  JOIN sizes sa ON sa.doc_id = c.doc_a
  JOIN sizes sb ON sb.doc_id = c.doc_b
  GROUP BY c.doc_a, c.doc_b, sa.n, sb.n
)
SELECT doc_a, doc_b,
  round(CAST(n_common AS DOUBLE) / (n_a + n_b - n_common), 6) AS jaccard
FROM verified
WHERE CAST(n_common AS DOUBLE) / (n_a + n_b - n_common) >= 0.5
"""


@register("text_dedup_minhash", oracle=_MINHASH_ORACLE, tags=("llm", "dedup"))
def text_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash + LSH near-dup pipeline, fully oracle-checked:
    shingle → 8-perm md5 minhash → 4 two-row bands → bucket join for
    candidates → exact-Jaccard verification at 0.5.

    md5(seed || ':' || shingle) replaces MLlib's murmur3 permutations
    so DuckDB reproduces the signature bit-for-bit; the pipeline shape
    is exactly MinHashLSH's (SURVEY.md §4.2 row 'MinHash')."""
    docs = load(spark, sf_dir, "documents")
    sh = _shingles(docs)
    # per-doc signatures AND shingle sets in ONE aggregation pass —
    # no seed cross join, one shuffle on doc_id, N_PERM min() columns
    # plus collect_set computed with map-side partial aggregation.
    # Carrying the set (bounded by doc length) lets verification be a
    # join + array_intersect instead of re-joining exploded shingles
    # per candidate pair (3 fewer shuffles). The frame has THREE
    # consumers (band stage + two verify sides), so it persists for
    # the duration of the query only: the tiny pair RESULT materializes
    # eagerly to scratch parquet inside a try/finally whose unpersist
    # releases the blocks before returning — cache-speed during the
    # query (re-aggregating instead costs +9 s at the 10× stress),
    # zero storage pinned after it (the leak class ADVICE r2 flagged).
    from am_kinesis_pay_spark.paths import scratch_path

    per_doc = (
        sh.groupBy("doc_id")
        .agg(
            *[
                F.min(F.md5(F.concat(F.lit(f"{s}:"), F.col("shingle")))).alias(f"h{s}")
                for s in range(N_PERM)
            ],
            F.collect_set("shingle").alias("sh_set"),
        )
        .persist()
    )
    mins = per_doc
    # bands: BAND_W consecutive signature rows concatenated
    band_exprs = [
        F.struct(
            F.lit(b).alias("band"),
            F.concat_ws(
                "|", *[F.col(f"h{s}") for s in range(b * BAND_W, (b + 1) * BAND_W)]
            ).alias("band_val"),
        )
        for b in range(N_PERM // BAND_W)
    ]
    bands = mins.select(
        "doc_id", F.explode(F.array(*band_exprs)).alias("bv")
    ).select("doc_id", F.col("bv.band").alias("band"), F.col("bv.band_val").alias("band_val"))
    # bucket join: only docs sharing a full band collide
    a = bands.select(
        F.col("doc_id").alias("doc_a"), "band", "band_val"
    )
    b = bands.select(
        F.col("doc_id").alias("doc_b"), "band", "band_val"
    )
    cand = (
        a.join(b, ["band", "band_val"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    # exact-Jaccard verify: candidate pairs are few, shingle sets are
    # doc-bounded — join the per-doc sets back in and intersect arrays.
    sets = per_doc.select("doc_id", "sh_set")
    verified = (
        cand.join(
            sets.select(F.col("doc_id").alias("doc_a"), F.col("sh_set").alias("set_a")),
            "doc_a",
        )
        .join(
            sets.select(F.col("doc_id").alias("doc_b"), F.col("sh_set").alias("set_b")),
            "doc_b",
        )
        .select(
            "doc_a",
            "doc_b",
            F.size(F.array_intersect("set_a", "set_b")).alias("n_common"),
            F.size("set_a").alias("n_a"),
            F.size("set_b").alias("n_b"),
        )
    )
    jac = F.col("n_common").cast("double") / (
        F.col("n_a") + F.col("n_b") - F.col("n_common")
    )
    pairs = verified.filter(jac >= 0.5).select(
        "doc_a", "doc_b", F.round(jac, 6).alias("jaccard")
    )
    out_path = scratch_path(spark, "akps_minhash_pairs")
    try:
        pairs.write.mode("overwrite").parquet(out_path)
    finally:
        per_doc.unpersist()
    return spark.read.schema(
        "doc_a bigint, doc_b bigint, jaccard double"
    ).parquet(out_path)


_HI_NIBBLE = ("8", "9", "a", "b", "c", "d", "e", "f")

_SIMHASH_ORACLE = (
    """
WITH toks AS (
  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS token
  FROM documents
), h AS (
  SELECT doc_id, md5(token) AS hx FROM toks
), votes AS (
  SELECT doc_id,
"""
    + ",\n".join(
        f"    SUM(CASE WHEN substr(hx, {p + 1}, 1) IN "
        f"('8','9','a','b','c','d','e','f') THEN 1 ELSE -1 END) AS v{p}"
        for p in range(16)
    )
    + """
  FROM h GROUP BY doc_id
)
SELECT doc_id, CAST("""
    + " + ".join(
        f"(CASE WHEN v{p} > 0 THEN {1 << p} ELSE 0 END)" for p in range(16)
    )
    + """ AS BIGINT) AS simhash16
FROM votes
"""
)


@register("text_dedup_simhash", oracle=_SIMHASH_ORACLE, tags=("llm", "dedup"))
def text_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bit SimHash, the standard single-hash formulation: each
    distinct token is hashed ONCE (md5), bit p of the signature takes
    a ±1 vote from the high bit of hex nibble p, and the signature
    sets bits with positive majorities. One hash + one aggregation
    per doc — no bit-dimension row blowup (the previous form
    cross-joined tokens × 16 bit rows, multiplying the shuffle 16×).
    Near-dup docs differ in few bits; pair search joins on rotated
    signature bands (the standard Hamming-LSH trick) — here the
    signature itself is the checked output."""
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("token")
    ).distinct()
    hashed = toks.select("doc_id", F.md5("token").alias("hx"))
    votes = hashed.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.substring("hx", p + 1, 1).isin(*_HI_NIBBLE), 1).otherwise(-1)
            ).alias(f"v{p}")
            for p in range(16)
        ]
    )
    sig = None
    for p in range(16):
        term = F.when(F.col(f"v{p}") > 0, F.lit(1 << p)).otherwise(F.lit(0))
        sig = term if sig is None else sig + term
    return votes.select("doc_id", sig.cast("bigint").alias("simhash16"))


_NGRAM_ORACLE = """
WITH toks AS (
  SELECT doc_id, source, string_split(text, ' ') AS t FROM documents
), shingles AS (
  SELECT DISTINCT doc_id, source, concat_ws(' ', t[i+1], t[i+2], t[i+3]) AS shingle
  FROM (SELECT doc_id, source, t, unnest(range(0, len(t) - 2)) AS i
        FROM toks WHERE len(t) >= 3)
), sizes AS (
  SELECT doc_id, COUNT(*) AS n FROM shingles GROUP BY doc_id
), common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
  FROM shingles a
  JOIN shingles b ON a.source = b.source AND a.shingle = b.shingle
                 AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT c.doc_a, c.doc_b,
  round(CAST(c.n_common AS DOUBLE) / (sa.n + sb.n - c.n_common), 6) AS jaccard
FROM common c
JOIN sizes sa ON sa.doc_id = c.doc_a
JOIN sizes sb ON sb.doc_id = c.doc_b
WHERE CAST(c.n_common AS DOUBLE) / (sa.n + sb.n - c.n_common) >= 0.4
"""


@register("text_dedup_ngram", oracle=_NGRAM_ORACLE, tags=("llm", "dedup"))
def text_dedup_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram Jaccard dedup with blocking: candidate pairs share a
    blocking key (source) AND at least one 3-token shingle — the
    shingle join generates candidates and counts intersections in one
    pass (no LSH approximation; exact within the block)."""
    docs = load(spark, sf_dir, "documents")
    toks = docs.select("doc_id", "source", F.split("text", " ").alias("t")).filter(
        F.size("t") >= 3
    )
    sh = toks.select(
        "doc_id",
        "source",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size("t") - 3),
                lambda i: F.concat_ws(
                    " ",
                    F.element_at("t", i + 1),
                    F.element_at("t", i + 2),
                    F.element_at("t", i + 3),
                ),
            )
        ).alias("shingle"),
    ).distinct()
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = sh.select(F.col("doc_id").alias("doc_a"), "source", "shingle")
    b = sh.select(F.col("doc_id").alias("doc_b"), "source", "shingle")
    common = (
        a.join(b, ["source", "shingle"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    j = common.join(
        sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("n_a")), "doc_a"
    ).join(
        sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("n_b")), "doc_b"
    )
    jac = F.col("n_common").cast("double") / (
        F.col("n_a") + F.col("n_b") - F.col("n_common")
    )
    return j.filter(jac >= 0.4).select(
        "doc_a", "doc_b", F.round(jac, 6).alias("jaccard")
    )


_CONTAIN_ORACLE = """
WITH toks AS (
  SELECT doc_id, source, string_split(text, ' ') AS t FROM documents
), shingles AS (
  SELECT DISTINCT doc_id, source, concat_ws(' ', t[i+1], t[i+2], t[i+3]) AS shingle
  FROM (SELECT doc_id, source, t, unnest(range(0, len(t) - 2)) AS i
        FROM toks WHERE len(t) >= 3)
), sizes AS (
  SELECT doc_id, COUNT(*) AS n FROM shingles GROUP BY doc_id
), common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
  FROM shingles a
  JOIN shingles b ON a.source = b.source AND a.shingle = b.shingle
                 AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT c.doc_a, c.doc_b,
  round(CAST(c.n_common AS DOUBLE) / sa.n, 6) AS contain_a,
  round(CAST(c.n_common AS DOUBLE) / sb.n, 6) AS contain_b
FROM common c
JOIN sizes sa ON sa.doc_id = c.doc_a
JOIN sizes sb ON sb.doc_id = c.doc_b
WHERE CAST(c.n_common AS DOUBLE) / LEAST(sa.n, sb.n) >= 0.5
"""


@register("text_dedup_containment", oracle=_CONTAIN_ORACLE, tags=("llm", "dedup"))
def text_dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric containment dedup: C(A,B) = |shingles(A) ∩
    shingles(B)| / |shingles(A)| — catches a document EMBEDDED in a
    longer one (quote farms, boilerplate wrappers, concatenated
    crawls), which symmetric Jaccard under-scores because the union is
    dominated by the longer doc. Pairs qualify when the smaller side is
    >= 50% contained; both directions are reported so the caller can
    tell subset from overlap. Same blocked shingle join as
    text_dedup_ngram (candidates share source + a 3-token shingle), so
    the same scale shape: no global all-pairs, shuffle keyed on
    (source, shingle)."""
    docs = load(spark, sf_dir, "documents")
    toks = docs.select("doc_id", "source", F.split("text", " ").alias("t")).filter(
        F.size("t") >= 3
    )
    sh = toks.select(
        "doc_id",
        "source",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size("t") - 3),
                lambda i: F.concat_ws(
                    " ",
                    F.element_at("t", i + 1),
                    F.element_at("t", i + 2),
                    F.element_at("t", i + 3),
                ),
            )
        ).alias("shingle"),
    ).distinct()
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = sh.select(F.col("doc_id").alias("doc_a"), "source", "shingle")
    b = sh.select(F.col("doc_id").alias("doc_b"), "source", "shingle")
    common = (
        a.join(b, ["source", "shingle"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    j = common.join(
        sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("n_a")), "doc_a"
    ).join(
        sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("n_b")), "doc_b"
    )
    nc = F.col("n_common").cast("double")
    return (
        j.filter(nc / F.least("n_a", "n_b") >= 0.5)
        .select(
            "doc_a",
            "doc_b",
            F.round(nc / F.col("n_a"), 6).alias("contain_a"),
            F.round(nc / F.col("n_b"), 6).alias("contain_b"),
        )
    )


_COSINE_DEDUP_ORACLE = """
WITH norms AS (
  SELECT vec_id, embedding,
    sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
  FROM embeddings
)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
  round(list_sum(list_transform(list_zip(a.embedding, b.embedding),
        p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))) / (a.nrm * b.nrm), 6) AS cosine
FROM norms a JOIN norms b ON a.vec_id < b.vec_id
WHERE list_sum(list_transform(list_zip(a.embedding, b.embedding),
        p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))) / (a.nrm * b.nrm) >= 0.45
"""


# Build-side tile size for emb_dedup_cosine: bounds what the driver
# ever materializes (8192 × 64 dims × 8 B ≈ 4 MB per tile). Env
# override lets tests force the multi-tile path at tiny SF.
_COSINE_TILE_ROWS = int(os.environ.get("AKPS_COSINE_TILE_ROWS", "8192"))


@register("emb_dedup_cosine", oracle=_COSINE_DEDUP_ORACLE, tags=("llm", "dedup"))
def emb_dedup_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup: all pairs above cosine 0.45 (the synthetic
    embeddings are uniform-random, so 0.45 marks the far tail — real
    corpora would use ~0.9), as a TILED blocked matrix product.

    The corpus is split into hash-mod tiles of ≤~_COSINE_TILE_ROWS
    rows (vec_id % n_tiles — uniform regardless of id distribution);
    each tile is collected (bounded: ~4 MB), broadcast, and matmul'd
    against every Arrow batch of the full corpus (vectorized BLAS,
    ~50× faster than a per-pair fold over array columns); per-tile
    results union. The driver never holds more than one tile — the
    round-1 full-corpus toPandas() is gone. Each unordered pair lands
    exactly once: probe row a meets build row b only in the single
    tile containing b, masked to a < b. Exact all-pairs is inherently
    O(n²) compute — n_tiles probe passes over the corpus is that cost
    made explicit; the LSH/SimHash entries are the subquadratic path.

    Tiles execute EAGERLY through a small thread pool (≤4 tile jobs
    in flight — Spark's scheduler runs them concurrently), each
    writing its pairs to a per-tile scratch parquet dir and
    destroy()ing its broadcast the moment its job finishes — so the
    aggregate executor broadcast footprint is bounded by pool width ×
    tile (~16 MB), not O(corpus) as a lazy union of still-referenced
    broadcasts would be, while keeping the cluster busy across tiles;
    the surviving pairs stream to disk, the checkpoint shape a 100 TB
    run needs anyway. Cosine rounded to 6 dp absorbs summation-order
    divergence vs the sequential-fold oracle. Multi-tile parity vs the
    oracle is pinned in tests/test_llm.py (AKPS_COSINE_TILE_ROWS)."""
    import math

    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    emb = load(spark, sf_dir, "embeddings")
    out_schema = T.StructType(
        [
            T.StructField("vec_a", T.LongType()),
            T.StructField("vec_b", T.LongType()),
            T.StructField("cosine", T.DoubleType()),
        ]
    )
    n = emb.count()
    if n == 0:
        return spark.createDataFrame([], out_schema)
    n_tiles = max(1, math.ceil(n / _COSINE_TILE_ROWS))
    probe = emb.select("vec_id", "embedding")

    def tile_kernel(bc):
        def block_pairs(pdfs):
            ids_b, mat_b = bc.value
            for pdf in pdfs:
                if pdf.empty:
                    continue
                a_ids = pdf["vec_id"].to_numpy()
                a = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
                a_n = a / np.linalg.norm(a, axis=1, keepdims=True)
                sims = a_n @ mat_b.T
                # upper triangle only (vec_a < vec_b), threshold pre-round
                mask = (sims >= 0.45) & (a_ids[:, None] < ids_b[None, :])
                ai, bi = np.nonzero(mask)
                yield pd.DataFrame(
                    {
                        "vec_a": a_ids[ai],
                        "vec_b": ids_b[bi],
                        "cosine": np.round(sims[ai, bi], 6),
                    }
                )

        return block_pairs

    import shutil
    from concurrent.futures import ThreadPoolExecutor

    from am_kinesis_pay_spark.paths import scratch_path

    out_dir = scratch_path(spark, "akps_cosine_tiles")
    shutil.rmtree(out_dir, ignore_errors=True)

    def run_tile(t: int) -> str | None:
        tile = probe.filter(
            F.pmod(F.col("vec_id"), F.lit(n_tiles)) == t
        ).toPandas()
        if tile.empty:
            return None
        ids_t = tile["vec_id"].to_numpy()
        mat_t = np.stack(tile["embedding"].to_numpy()).astype(np.float64)
        mat_t = mat_t / np.linalg.norm(mat_t, axis=1, keepdims=True)
        bc = spark.sparkContext.broadcast((ids_t, mat_t))
        try:
            path = os.path.join(out_dir, f"tile-{t:05d}")
            probe.mapInPandas(tile_kernel(bc), out_schema).write.mode(
                "overwrite"
            ).parquet(path)
            return path
        finally:
            bc.destroy()  # hard-release as soon as this tile's job ends

    with ThreadPoolExecutor(max_workers=min(4, n_tiles)) as pool:
        paths = [p for p in pool.map(run_tile, range(n_tiles)) if p]
    if not paths:
        return spark.createDataFrame([], out_schema)
    return spark.read.schema(out_schema).parquet(*paths)


def _emb_lsh_dedup_oracle() -> str:
    from am_kinesis_pay_spark.llm.similarity import sig_sql_ctes

    return (
        "WITH "
        + sig_sql_ctes()
        + """, cand AS (
  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
  FROM banded a JOIN banded b USING (band)
  WHERE a.vec_id < b.vec_id
), scored AS (
  SELECT cand.vec_a, cand.vec_b,
    round(list_sum(list_transform(list_zip(na.embedding, nb.embedding),
          p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))) / (na.nrm * nb.nrm), 6) AS cosine
  FROM cand
  JOIN norms na ON na.vec_id = cand.vec_a
  JOIN norms nb ON nb.vec_id = cand.vec_b
)
SELECT vec_a, vec_b, cosine FROM scored WHERE cosine >= 0.45
"""
    )


@register(
    "emb_dedup_cosine_lsh",
    oracle=_emb_lsh_dedup_oracle(),
    tags=("llm", "dedup", "ann"),
)
def emb_dedup_cosine_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup, LSH-blocked form: candidate pairs come only
    from shared sign-LSH bands (4x4-bit bands of the 16-bit signature),
    then exact cosine verify >= 0.45 inside candidates. Fully
    oracle-checked: the DuckDB oracle rebuilds signatures from the
    baked plane weights and replicates candidates + verification. No
    broadcast, no driver materialization — signatures are one map
    pass, candidates shuffle on the band key exactly like
    text_dedup_minhash's LSH bucket join.

    BAND-WIDTH TRADEOFF (the 100 TB knob): a b-bit band splits each
    band's bucket space 2^b ways, so expected within-bucket pair work
    is n²/2^b per band — band bits must GROW with corpus size (and
    recall per band is p^b, p = 1 - acos(θ)/π). The fixture threshold
    0.45 on uniform-random data gives p≈0.65, forcing shallow 4-bit
    bands (recall pinned ≥0.2 in tests) whose 16-value space is
    quadratic-in-n at scale. Production near-dup thresholds (θ≈0.9,
    p≈0.86) support 8-16-bit bands from 32-64 planes: buckets stay
    O(n/2^b) with recall recovered by adding bands. Same planes, same
    oracle construction — only the constants change."""
    from am_kinesis_pay_spark.llm.similarity import (
        _dot,
        _lsh_signature,
        _norms,
        lsh_band_cols,
    )

    emb = load(spark, sf_dir, "embeddings")
    norms = _norms(emb).withColumn("sig", _lsh_signature())
    # candidates carry IDs ONLY through the band join and the pair
    # dedup — the 64-float embedding payload would otherwise ride
    # every collided pair through two shuffles (~30x the bytes);
    # vectors join back in by id once per side AFTER dedup
    banded = norms.select(
        "vec_id", F.explode(F.array(*lsh_band_cols())).alias("band")
    )
    a = banded.select(F.col("vec_id").alias("vec_a"), "band")
    b = banded.select(F.col("vec_id").alias("vec_b"), "band")
    cand = (
        a.join(b, "band")
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b")
        .dropDuplicates(["vec_a", "vec_b"])
    )
    vecs = norms.select("vec_id", "embedding", "nrm")
    pairs = cand.join(
        vecs.select(
            F.col("vec_id").alias("vec_a"),
            F.col("embedding").alias("ea"),
            F.col("nrm").alias("na"),
        ),
        "vec_a",
    ).join(
        vecs.select(
            F.col("vec_id").alias("vec_b"),
            F.col("embedding").alias("eb"),
            F.col("nrm").alias("nb"),
        ),
        "vec_b",
    )
    cos = F.round(_dot("ea", "eb") / (F.col("na") * F.col("nb")), 6)
    return (
        pairs.select("vec_a", "vec_b", cos.alias("cosine"))
        .filter(F.col("cosine") >= 0.45)
    )


# Splice the MinHash pipeline in as CTEs: its final SELECT becomes the
# `pairs` CTE, then a recursive transitive closure assigns min-label
# components.
_mh_body = _MINHASH_ORACLE.strip()
_mh_ctes, _mh_final = _mh_body.rsplit("SELECT doc_a, doc_b,", 1)
_CLUSTER_ORACLE = (
    "WITH RECURSIVE "
    + _mh_ctes.strip()[len("WITH ") :].rstrip()
    + ",\npairs AS (\nSELECT doc_a, doc_b,"
    + _mh_final
    + """),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION
  SELECT doc_b AS src, doc_a AS dst FROM pairs
), nodes AS (
  SELECT DISTINCT src AS doc_id FROM edges
), reach(doc_id, other) AS (
  SELECT doc_id, doc_id FROM nodes
  UNION
  SELECT r.doc_id, e.dst FROM reach r JOIN edges e ON e.src = r.other
)
SELECT doc_id, MIN(other) AS cluster_id
FROM reach
GROUP BY doc_id
"""
)


def _min_label_components(pairs: DataFrame, a: str, b: str, id_col: str) -> DataFrame:
    """Connected components by min-label propagation over an undirected
    pair list: every node starts as its own label, each round adopts
    the min label among itself and its neighbors, loop to fixpoint.
    Convergence ≤ graph diameter rounds; each round is one join + one
    aggregation, every iteration localCheckpoints to cut the growing
    lineage (the standard Spark iterative-algorithm discipline)."""
    # symmetrize via ONE explode, not a union of two selects — a union
    # would traverse the whole candidate pipeline twice on first
    # materialization (each branch re-evaluates its lineage)
    edges = (
        pairs.select(
            F.explode(
                F.array(
                    F.struct(F.col(a).alias("src"), F.col(b).alias("dst")),
                    F.struct(F.col(b).alias("src"), F.col(a).alias("dst")),
                )
            ).alias("e")
        )
        .select("e.src", "e.dst")
        .distinct()
        .persist()
    )
    labels = edges.select(F.col("src").alias(id_col)).distinct().withColumn(
        "cluster_id", F.col(id_col)
    )
    for it in range(20):  # diameter bound; tiny graphs converge in 2-3
        neighbor_min = (
            edges.join(labels, edges.dst == labels[id_col])
            .groupBy(F.col("src").alias(id_col))
            .agg(F.min("cluster_id").alias("nbr_min"))
        )
        # carry the previous label through the checkpoint so change
        # detection is a filter on the materialized frame, not a join
        updated = (
            labels.join(neighbor_min, id_col, "left")
            .select(
                id_col,
                F.col("cluster_id").alias("prev_id"),
                F.least(
                    F.col("cluster_id"), F.coalesce("nbr_min", F.col("cluster_id"))
                ).alias("cluster_id"),
            )
            .localCheckpoint()
        )
        labels = updated.select(id_col, "cluster_id")
        # round 0 always changes when any edge exists — skip the check
        if it > 0:
            changed = (
                updated.filter(F.col("prev_id") != F.col("cluster_id"))
                .limit(1)
                .count()
            )
            if changed == 0:
                break
    edges.unpersist()
    return labels


@register("text_dedup_clusters", oracle=_CLUSTER_ORACLE, tags=("llm", "dedup", "iterative"))
def text_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components over the MinHash near-dup graph — the
    iterative-algorithm surface (keep one doc per duplicate CLUSTER,
    not per pair; pairs alone under-deduplicate transitive chains
    A≈B≈C). Label propagation via _min_label_components; oracle:
    recursive-CTE transitive closure with min-label per node."""
    pairs = REGISTRY["text_dedup_minhash"].fn(spark, sf_dir).select("doc_a", "doc_b")
    return _min_label_components(pairs, "doc_a", "doc_b", "doc_id")


def _emb_cluster_oracle() -> str:
    base = _emb_lsh_dedup_oracle().strip()
    ctes, _ = base.split("\nSELECT vec_a, vec_b, cosine FROM scored", 1)
    return (
        "WITH RECURSIVE "
        + ctes[len("WITH ") :]
        + """, pairs AS (
  SELECT vec_a, vec_b FROM scored WHERE cosine >= 0.45
), edges AS (
  SELECT vec_a AS src, vec_b AS dst FROM pairs
  UNION
  SELECT vec_b AS src, vec_a AS dst FROM pairs
), nodes AS (
  SELECT DISTINCT src AS vec_id FROM edges
), reach(vec_id, other) AS (
  SELECT vec_id, vec_id FROM nodes
  UNION
  SELECT r.vec_id, e.dst FROM reach r JOIN edges e ON e.src = r.other
)
SELECT vec_id, MIN(other) AS cluster_id
FROM reach
GROUP BY vec_id
"""
    )


@register(
    "emb_dedup_clusters",
    oracle=_emb_cluster_oracle(),
    tags=("llm", "dedup", "iterative", "ann"),
)
def emb_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components over the LSH-blocked embedding near-dup
    graph (emb_dedup_cosine_lsh pairs) — keep one vector per duplicate
    CLUSTER: semantic near-dups chain transitively (A≈B≈C with
    cos(A,C) below threshold), so pair-level dedup under-removes
    exactly like its text twin. Same min-label propagation loop as
    text_dedup_clusters, same recursive-CTE oracle shape over the
    sign-LSH candidate SQL — every stage of candidate generation,
    verification, and clustering is exact on both engines."""
    pairs = REGISTRY["emb_dedup_cosine_lsh"].fn(spark, sf_dir).select(
        "vec_a", "vec_b"
    )
    return _min_label_components(pairs, "vec_a", "vec_b", "vec_id")


@register(
    "text_dedup_incremental",
    oracle="""
WITH hashed AS (
  SELECT doc_id, md5(lower(trim(text))) AS text_key,
    doc_id % 10 = 0 AS is_new
  FROM documents
), corpus AS (
  SELECT DISTINCT text_key FROM hashed WHERE NOT is_new
), fresh AS (
  SELECT h.doc_id, h.text_key
  FROM hashed h
  WHERE h.is_new AND NOT EXISTS (
    SELECT 1 FROM corpus c WHERE c.text_key = h.text_key)
)
SELECT doc_id, text_key FROM (
  SELECT doc_id, text_key,
    ROW_NUMBER() OVER (PARTITION BY text_key ORDER BY doc_id) AS rn
  FROM fresh) t
WHERE rn = 1
""",
    tags=("llm", "dedup"),
)
def text_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-ingest dedup — the shape every continuously-crawled
    corpus runs daily: an incoming batch (docs with doc_id % 10 == 0
    stand in for today's crawl) is deduplicated (1) against the
    existing corpus via LEFT ANTI join on the normalized content hash,
    then (2) within itself (first doc_id wins per hash). Only the
    batch shuffles at batch size; the corpus side contributes one
    DISTINCT hash projection — at 100 TB that projection is the
    persisted hash index of the corpus (narrow, bucketed by hash), so
    daily ingest cost is O(batch + index probe), never O(corpus
    rescan). Generalizes the reference's duplicate-payment guard
    (kinesis-pay.php:515-518) from one key to content identity."""
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", F.md5(F.lower(F.trim("text"))).alias("text_key")
    )
    batch = docs.filter(F.col("doc_id") % 10 == 0)
    corpus_keys = docs.filter(F.col("doc_id") % 10 != 0).select(
        "text_key"
    ).distinct()
    fresh = batch.join(corpus_keys, "text_key", "left_anti")
    w = W.partitionBy("text_key").orderBy("doc_id")
    return (
        fresh.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "text_key")
    )


# Reuse the cluster oracle's recursive CTEs: demote its terminal SELECT
# into a `comp` CTE, then rank within clusters (COALESCE labels
# singleton docs with their own id).
_KEEP_BEST_ORACLE = _CLUSTER_ORACLE.replace(
    "SELECT doc_id, MIN(other) AS cluster_id\nFROM reach\nGROUP BY doc_id",
    """comp AS (
  SELECT doc_id, MIN(other) AS cluster_id FROM reach GROUP BY doc_id
), labeled AS (
  SELECT d.doc_id,
    COALESCE(c.cluster_id, d.doc_id) AS cluster_id,
    d.n_chars
  FROM documents d LEFT JOIN comp c ON c.doc_id = d.doc_id
), ranked AS (
  SELECT doc_id, cluster_id,
    ROW_NUMBER() OVER (
      PARTITION BY cluster_id ORDER BY n_chars DESC, doc_id
    ) AS rn,
    COUNT(*) OVER (PARTITION BY cluster_id) AS cluster_size
  FROM labeled
)
SELECT doc_id, cluster_id, rn = 1 AS is_kept,
  CAST(cluster_size AS BIGINT) AS cluster_size
FROM ranked""",
).replace(")\ncomp AS (", "),\ncomp AS (", 1)


@register(
    "text_dedup_keep_best",
    oracle=_KEEP_BEST_ORACLE,
    tags=("llm", "dedup", "iterative"),
)
def text_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-level keep-best selection — the decision step after
    near-dup clustering: every document gets its MinHash cluster label
    (singletons label themselves), and within each cluster the
    highest-quality member survives (longest n_chars, doc_id as the
    deterministic tiebreak — the proxy for 'prefer the canonical
    source copy' in a multi-source crawl). Emits the full corpus with
    (cluster_id, is_kept, cluster_size) so downstream stages can
    either filter is_kept or soft-weight by cluster_size. Plan: the
    label-propagation result (small: only docs that appear in a
    near-dup pair) LEFT-joins the corpus — at 100 TB the cluster map
    broadcasts, the corpus never reshuffles for the label join, and
    the keep-best window shuffles once on cluster_id, where
    cluster-size skew is bounded by the dedup threshold itself."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "n_chars")
    comp = REGISTRY["text_dedup_clusters"].fn(spark, sf_dir)
    labeled = docs.join(
        F.broadcast(comp.withColumnRenamed("cluster_id", "cl")),
        "doc_id",
        "left",
    ).select(
        "doc_id",
        F.coalesce("cl", "doc_id").alias("cluster_id"),
        "n_chars",
    )
    w = W.partitionBy("cluster_id").orderBy(F.desc("n_chars"), "doc_id")
    return (
        labeled.select(
            "doc_id",
            "cluster_id",
            (F.row_number().over(w) == 1).alias("is_kept"),
            F.count(F.lit(1))
            .over(W.partitionBy("cluster_id"))
            .cast("long")
            .alias("cluster_size"),
        )
    )


_MINHASH_INC_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, doc_id % 10 = 0 AS is_new, string_split(text, ' ') AS t
  FROM documents
), shingles AS (
  SELECT DISTINCT doc_id, is_new,
    concat_ws(' ', t[i+1], t[i+2], t[i+3]) AS shingle
  FROM (SELECT doc_id, is_new, t, unnest(range(0, len(t) - 2)) AS i
        FROM toks WHERE len(t) >= 3)
), mh AS (
  SELECT doc_id, is_new, s.seed,
    MIN(md5(concat(CAST(s.seed AS VARCHAR), ':', shingle))) AS h
  FROM shingles, generate_series(0, {N_PERM - 1}) AS s(seed)
  GROUP BY doc_id, is_new, s.seed
), bands AS (
  SELECT doc_id, is_new, seed // {BAND_W} AS band,
    string_agg(h, '|' ORDER BY seed) AS band_val
  FROM mh GROUP BY doc_id, is_new, seed // {BAND_W}
), cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, a.is_new AS a_is_new, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.band_val = b.band_val AND b.is_new
   AND (NOT a.is_new OR a.doc_id < b.doc_id)
), sizes AS (
  SELECT doc_id, COUNT(*) AS n FROM shingles GROUP BY doc_id
), verified AS (
  SELECT c.doc_a, c.a_is_new, c.doc_b,
    COUNT(*) AS n_common, sa.n AS n_a, sb.n AS n_b
  FROM cand c
  JOIN shingles x ON x.doc_id = c.doc_a
  JOIN shingles y ON y.doc_id = c.doc_b AND y.shingle = x.shingle
  JOIN sizes sa ON sa.doc_id = c.doc_a
  JOIN sizes sb ON sb.doc_id = c.doc_b
  GROUP BY c.doc_a, c.a_is_new, c.doc_b, sa.n, sb.n
), near AS (
  SELECT doc_a, a_is_new, doc_b FROM verified
  WHERE CAST(n_common AS DOUBLE) / (n_a + n_b - n_common) >= 0.5
)
SELECT doc_b AS doc_id,
  CASE WHEN MIN(CASE WHEN NOT a_is_new THEN doc_a END) IS NOT NULL
       THEN 'corpus_dup' ELSE 'batch_dup' END AS drop_reason,
  CAST(COALESCE(MIN(CASE WHEN NOT a_is_new THEN doc_a END),
                MIN(CASE WHEN a_is_new THEN doc_a END)) AS BIGINT)
    AS matched_doc
FROM near GROUP BY doc_b
"""


@register(
    "text_dedup_minhash_incremental",
    oracle=_MINHASH_INC_ORACLE,
    tags=("llm", "dedup"),
)
def text_dedup_minhash_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental NEAR-dup ingest — text_dedup_incremental's exact-hash
    shape upgraded to MinHash/LSH, the production workload of every
    continuously-crawled corpus: today's batch (doc_id % 10 == 0 stands
    in) is near-dup-checked (1) against the EXISTING corpus through the
    persisted LSH band index, then (2) within itself (smaller doc_id
    wins). Candidates come only from shared band buckets — corpus-side
    cost is the index probe, never an all-pairs or corpus rescan —
    then exact-Jaccard verification at 0.5 decides. Returns the batch
    docs to DROP with the deciding reason ('corpus_dup' beats
    'batch_dup') and the smallest matching doc as evidence.

    Scale shape: at 100 TB the corpus band index ((band, band_val) ->
    doc_id, bucketed by band_val) is a persisted table maintained by
    appending each day's accepted batch; daily cost is O(batch bands +
    collided candidates). The corpus side here carries only (band_val,
    doc_id) into the join — signatures and shingle sets stream from
    the same one-pass aggregation the base pipeline uses
    (text_dedup_minhash's plan, llm/dedup.py). Within-batch pairs
    reuse the identical buckets; no second index. Simplification
    shared with the oracle: a batch doc matching ANY smaller batch doc
    is dropped (no survivor-chain recomputation — the keep-best
    cluster form is `text_dedup_keep_best`)."""
    from am_kinesis_pay_spark.paths import scratch_path

    docs = load(spark, sf_dir, "documents")
    sh = _shingles(docs)
    per_doc_plan = (
        sh.groupBy("doc_id")
        .agg(
            *[
                F.min(
                    F.md5(F.concat(F.lit(f"{s}:"), F.col("shingle")))
                ).alias(f"h{s}")
                for s in range(N_PERM)
            ],
            F.collect_set("shingle").alias("sh_set"),
        )
        .withColumn("is_new", F.col("doc_id") % 10 == 0)
    )
    # four consumers (two band sides, two signature-set sides) read
    # this frame — materialize it to scratch parquet instead of
    # cache(): one computation either way, but no executor storage
    # stays pinned after the query (no in-plan unpersist point exists),
    # and at scale this IS the persisted band/signature index the
    # docstring describes (ingest maintains it; probes just read it).
    # Measured at the 10× stress: spill 4.0 s vs 2.6 s for the leaked
    # r2 cache vs ~20 s for the persist+eager-result pattern that wins
    # for text_dedup_minhash — the right release mechanism is per-op.
    idx_path = scratch_path(spark, "akps_minhash_inc_index")
    per_doc_plan.write.mode("overwrite").parquet(idx_path)
    per_doc = spark.read.parquet(idx_path)
    band_exprs = [
        F.struct(
            F.lit(b).alias("band"),
            F.concat_ws(
                "|",
                *[F.col(f"h{s}") for s in range(b * BAND_W, (b + 1) * BAND_W)],
            ).alias("band_val"),
        )
        for b in range(N_PERM // BAND_W)
    ]
    bands = per_doc.select(
        "doc_id", "is_new", F.explode(F.array(*band_exprs)).alias("bv")
    ).select(
        "doc_id",
        "is_new",
        F.col("bv.band").alias("band"),
        F.col("bv.band_val").alias("band_val"),
    )
    a = bands.select(
        F.col("doc_id").alias("doc_a"),
        F.col("is_new").alias("a_is_new"),
        "band",
        "band_val",
    )
    b = bands.filter("is_new").select(
        F.col("doc_id").alias("doc_b"), "band", "band_val"
    )
    cand = (
        a.join(b, ["band", "band_val"])
        .filter(~F.col("a_is_new") | (F.col("doc_a") < F.col("doc_b")))
        .select("doc_a", "a_is_new", "doc_b")
        .distinct()
    )
    sets = per_doc.select("doc_id", "sh_set")
    verified = (
        cand.join(
            sets.select(
                F.col("doc_id").alias("doc_a"), F.col("sh_set").alias("set_a")
            ),
            "doc_a",
        )
        .join(
            sets.select(
                F.col("doc_id").alias("doc_b"), F.col("sh_set").alias("set_b")
            ),
            "doc_b",
        )
        .select(
            "doc_a",
            "a_is_new",
            "doc_b",
            F.size(F.array_intersect("set_a", "set_b")).alias("n_common"),
            F.size("set_a").alias("n_a"),
            F.size("set_b").alias("n_b"),
        )
    )
    jac = F.col("n_common").cast("double") / (
        F.col("n_a") + F.col("n_b") - F.col("n_common")
    )
    near = verified.filter(jac >= 0.5).select("doc_a", "a_is_new", "doc_b")
    corpus_match = F.min(
        F.when(~F.col("a_is_new"), F.col("doc_a"))
    ).alias("corpus_match")
    batch_match = F.min(
        F.when(F.col("a_is_new"), F.col("doc_a"))
    ).alias("batch_match")
    return (
        near.groupBy(F.col("doc_b").alias("doc_id"))
        .agg(corpus_match, batch_match)
        .select(
            "doc_id",
            F.when(F.col("corpus_match").isNotNull(), "corpus_dup")
            .otherwise("batch_dup")
            .alias("drop_reason"),
            F.coalesce("corpus_match", "batch_match")
            .cast("bigint")
            .alias("matched_doc"),
        )
    )


def _emb_inc_oracle() -> str:
    from am_kinesis_pay_spark.llm.similarity import sig_sql_ctes

    return (
        "WITH "
        + sig_sql_ctes()
        + """, cand AS (
  SELECT DISTINCT a.vec_id AS vec_a, a.vec_id % 10 = 0 AS a_is_new,
         b.vec_id AS vec_b
  FROM banded a JOIN banded b USING (band)
  WHERE b.vec_id % 10 = 0
    AND (a.vec_id % 10 <> 0 OR a.vec_id < b.vec_id)
), near AS (
  SELECT cand.vec_a, cand.a_is_new, cand.vec_b
  FROM cand
  JOIN norms na ON na.vec_id = cand.vec_a
  JOIN norms nb ON nb.vec_id = cand.vec_b
  WHERE round(list_sum(list_transform(list_zip(na.embedding, nb.embedding),
        p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))) / (na.nrm * nb.nrm), 6)
        >= 0.45
)
SELECT vec_b AS vec_id,
  CASE WHEN MIN(CASE WHEN NOT a_is_new THEN vec_a END) IS NOT NULL
       THEN 'corpus_dup' ELSE 'batch_dup' END AS drop_reason,
  CAST(COALESCE(MIN(CASE WHEN NOT a_is_new THEN vec_a END),
                MIN(CASE WHEN a_is_new THEN vec_a END)) AS BIGINT)
    AS matched_vec
FROM near GROUP BY vec_b
"""
    )


@register(
    "emb_dedup_incremental",
    oracle=_emb_inc_oracle(),
    tags=("llm", "dedup", "ann"),
)
def emb_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental EMBEDDING near-dup ingest — the semantic twin of
    `text_dedup_minhash_incremental`, closing the daily-crawl story in
    vector space: today's batch (vec_id % 10 == 0) probes the corpus's
    persisted sign-LSH band index for candidates, exact-cosine
    verifies at 0.45, and within-batch pairs reuse the same buckets
    (smaller vec_id wins). Returns the batch vectors to DROP with
    reason ('corpus_dup' beats 'batch_dup') and the smallest matching
    vector as evidence.

    Scale shape: the corpus contributes only (band, vec_id) rows — the
    persisted index, appended daily with accepted batches — and the
    embedding payloads join back by id strictly AFTER the id-only
    candidate dedup (the measured 30x shuffle-byte rule from
    emb_dedup_cosine_lsh). Daily cost is O(batch bands + collisions);
    the corpus is never rescanned, never broadcast, never all-paired.
    Band-width tradeoff identical to emb_dedup_cosine_lsh's docstring
    (bits grow with corpus size)."""
    from am_kinesis_pay_spark.llm.similarity import (
        _dot,
        _lsh_signature,
        _norms,
        lsh_band_cols,
    )

    emb = load(spark, sf_dir, "embeddings")
    norms = _norms(emb).withColumn("sig", _lsh_signature())
    banded = norms.select(
        "vec_id",
        (F.col("vec_id") % 10 == 0).alias("is_new"),
        F.explode(F.array(*lsh_band_cols())).alias("band"),
    )
    a = banded.select(
        F.col("vec_id").alias("vec_a"),
        F.col("is_new").alias("a_is_new"),
        "band",
    )
    b = banded.filter("is_new").select(F.col("vec_id").alias("vec_b"), "band")
    cand = (
        a.join(b, "band")
        .filter(~F.col("a_is_new") | (F.col("vec_a") < F.col("vec_b")))
        .select("vec_a", "a_is_new", "vec_b")
        .distinct()
    )
    vecs = norms.select("vec_id", "embedding", "nrm")
    near = (
        cand.join(
            vecs.select(
                F.col("vec_id").alias("vec_a"),
                F.col("embedding").alias("ea"),
                F.col("nrm").alias("na"),
            ),
            "vec_a",
        )
        .join(
            vecs.select(
                F.col("vec_id").alias("vec_b"),
                F.col("embedding").alias("eb"),
                F.col("nrm").alias("nb"),
            ),
            "vec_b",
        )
        .filter(
            F.round(_dot("ea", "eb") / (F.col("na") * F.col("nb")), 6) >= 0.45
        )
        .select("vec_a", "a_is_new", "vec_b")
    )
    return (
        near.groupBy(F.col("vec_b").alias("vec_id"))
        .agg(
            F.min(F.when(~F.col("a_is_new"), F.col("vec_a"))).alias(
                "corpus_match"
            ),
            F.min(F.when(F.col("a_is_new"), F.col("vec_a"))).alias(
                "batch_match"
            ),
        )
        .select(
            "vec_id",
            F.when(F.col("corpus_match").isNotNull(), "corpus_dup")
            .otherwise("batch_dup")
            .alias("drop_reason"),
            F.coalesce("corpus_match", "batch_match")
            .cast("bigint")
            .alias("matched_vec"),
        )
    )
