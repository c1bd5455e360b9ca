"""Corpus-curation operators for training-data pipelines
(BASELINE.json north-star; complements llm/text.py and llm/dedup.py):
benchmark decontamination, sliding-window chunking, target-mixture
domain sampling, sequence packing, edit-distance near-dup, the
cross-modal retrieval-corpus build, and the full corpus-to-training-set
pipeline composed as one plan.

All pure built-in expressions (split / transform / explode / window /
levenshtein) — no Python in any hot path — and each ships an exact
DuckDB oracle. Generalizes the reference's record-hygiene behaviors
(dedup-by-key kinesis-pay.php:515-518, sampling kinesis-pay.php:302-304)
to corpus scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from am_kinesis_pay_spark.registry import register
from am_kinesis_pay_spark.tables import load

# Decontamination n-gram width. 13 is the published standard (GPT-3
# appendix C / PaLM); the synthetic docs are short word soup, so 5 keeps
# enough grams per doc for the check to be meaningful at sf0.001.
_DECON_N = 5
# Deterministic "held-out benchmark" membership: doc_id % 97 == 0.
_BENCH_MOD = 97

# Sliding chunker: 32-token windows, stride 24 (25% overlap) — the
# sequence-packing precursor. Every token lands in >= 1 chunk.
_CHUNK = 32
_STRIDE = 24

# Target corpus mixture (domain re-balancing): weight * budget docs per
# language, chosen by a deterministic hash order so reruns are stable.
_MIX_BUDGET = 200
_MIX_QUOTA = {"en": 80, "de": 40, "es": 30, "fr": 30, "zh": 20}


def _gram5(i):
    """md5 of the 5-token shingle starting at 0-based offset i."""
    return F.md5(
        F.concat_ws(
            " ", *[F.element_at("t", i + k) for k in range(1, _DECON_N + 1)]
        )
    )


def _decon_grams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The (doc_id, 5-gram-md5) shingle index as a session artifact
    (r12 OPT, guide §8 — the _ng_pairs/_er_grams convention): three
    timed consumers (text_decontaminate, text_decontaminate_bloom,
    pipeline_training_set) each re-ran the split+explode+md5 shingle
    pass over the full corpus TWICE per execution (once for the bench
    gram set, once for the train side — the two subtrees end in
    different operators so ReusedExchange never fires). Built once per
    (session, sf), read back by every consumer; duplicate gram
    instances are preserved (the bloom/decon per-doc counts need every
    instance, not the distinct set). At 100 TB a benchmark-overlap
    shingle index is exactly the maintained table a decontamination
    service probes per ingest batch — the per-query recompute was the
    fixture-scale shortcut. spread() before the explode parallelizes
    the build off the 1-split fixture scan (no-op at production split
    counts)."""
    from am_kinesis_pay_spark.paths import session_artifact, sf_tag
    from am_kinesis_pay_spark.tables import spread

    def build() -> DataFrame:
        docs = load(spark, sf_dir, "documents")
        toks = spread(
            docs.select("doc_id", F.split("text", " ").alias("t"))
        ).filter(F.size("t") >= _DECON_N)
        return toks.select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.size("t") - _DECON_N), _gram5
                )
            ).alias("g"),
        )

    return session_artifact(
        spark,
        f"akps_decon_grams_{sf_tag(sf_dir)}",
        build,
        "doc_id bigint, g string",
    )


@register(
    "text_decontaminate",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
), grams AS (
  SELECT doc_id, md5(concat_ws(' ', t[i+1], t[i+2], t[i+3], t[i+4], t[i+5])) AS g
  FROM (SELECT doc_id, t, unnest(range(0, len(t) - {_DECON_N - 1})) AS i
        FROM toks WHERE len(t) >= {_DECON_N})
), bench AS (
  SELECT DISTINCT g FROM grams WHERE doc_id % {_BENCH_MOD} = 0
), train AS (
  SELECT * FROM grams WHERE doc_id % {_BENCH_MOD} <> 0
)
SELECT train.doc_id,
  COUNT(*) AS n_grams,
  CAST(SUM(CASE WHEN bench.g IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_contaminated,
  CAST(CASE WHEN SUM(CASE WHEN bench.g IS NOT NULL THEN 1 ELSE 0 END) > 0
       THEN 1 ELSE 0 END AS INT) AS is_contaminated
FROM train LEFT JOIN bench ON train.g = bench.g
GROUP BY train.doc_id
""",
    tags=("llm", "curation"),
)
def text_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (the GPT-3/PaLM n-gram overlap check):
    flag every training doc sharing any 5-gram with the held-out
    benchmark slice. Grams are md5'd so the join key is a fixed-width
    hash, not the raw text — the benchmark gram set is tiny relative to
    the corpus and is broadcast, so the training side never shuffles;
    the whole check is scan + map + broadcast-probe + one aggregation
    at any corpus size. Gram source: the _decon_grams session artifact
    (r12 OPT — was two in-plan shingle passes per execution)."""
    grams = _decon_grams(spark, sf_dir)
    bench = (
        grams.filter(F.col("doc_id") % _BENCH_MOD == 0)
        .select("g")
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    train = grams.filter(F.col("doc_id") % _BENCH_MOD != 0)
    hits = train.join(F.broadcast(bench), "g", "left")
    return hits.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_grams"),
        F.sum(F.coalesce(F.col("hit"), F.lit(0))).cast("bigint").alias(
            "n_contaminated"
        ),
        F.when(F.sum(F.coalesce(F.col("hit"), F.lit(0))) > 0, 1)
        .otherwise(0)
        .cast("int")
        .alias("is_contaminated"),
    )


@register(
    "text_chunk_sliding",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
), starts AS (
  SELECT doc_id, t,
    unnest(range(0, greatest(CAST(ceil((len(t) - {_CHUNK}) / {_STRIDE}.0) AS BIGINT) * {_STRIDE}, 0) + 1, {_STRIDE})) AS s
  FROM toks
)
SELECT doc_id,
  CAST(s // {_STRIDE} AS INT) AS chunk_idx,
  CAST(s AS BIGINT) AS start_token,
  CAST(least({_CHUNK}, len(t) - s) AS BIGINT) AS n_chunk_tokens,
  array_to_string(t[s+1:s+{_CHUNK}], ' ') AS chunk_text
FROM starts
""",
    tags=("llm", "curation"),
)
def text_chunk_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window chunking (training-sequence preparation): split
    each document into 32-token windows at stride 24; the last window
    start is pulled back so every token is covered. One generator
    expression per row — map-only, no shuffle, so chunking streams at
    scan speed regardless of corpus size."""
    docs = load(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.split("text", " ").alias("t"))
    last_start = F.greatest(
        F.ceil((F.size("t") - _CHUNK) / F.lit(_STRIDE)).cast("long") * _STRIDE,
        F.lit(0).cast("long"),
    )
    starts = toks.select(
        "doc_id",
        "t",
        F.explode(
            F.sequence(F.lit(0).cast("long"), last_start, F.lit(_STRIDE).cast("long"))
        ).alias("s"),
    )
    return starts.select(
        "doc_id",
        (F.col("s") / _STRIDE).cast("int").alias("chunk_idx"),
        F.col("s").cast("bigint").alias("start_token"),
        F.least(F.lit(_CHUNK).cast("long"), F.size("t") - F.col("s"))
        .cast("bigint")
        .alias("n_chunk_tokens"),
        F.array_join(F.slice("t", (F.col("s") + 1).cast("int"), _CHUNK), " ").alias(
            "chunk_text"
        ),
    )


@register(
    "sample_mixture",
    oracle=f"""
WITH ranked AS (
  SELECT doc_id, lang,
    CAST(ROW_NUMBER() OVER (
      PARTITION BY lang ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
    ) AS INT) AS sample_rank
  FROM documents
)
SELECT doc_id, lang, sample_rank
FROM ranked
WHERE sample_rank <= CASE lang
  WHEN 'en' THEN {_MIX_QUOTA["en"]} WHEN 'de' THEN {_MIX_QUOTA["de"]}
  WHEN 'es' THEN {_MIX_QUOTA["es"]} WHEN 'fr' THEN {_MIX_QUOTA["fr"]}
  WHEN 'zh' THEN {_MIX_QUOTA["zh"]} ELSE 0 END
""",
    tags=("llm", "curation"),
)
def sample_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Target-mixture sampling (domain re-balancing for a training mix):
    draw a per-language quota (weight x budget docs) in deterministic
    md5-of-id order — a seedable shuffle both engines compute
    identically. One window shuffle on lang; at 100 TB replace
    row_number with the per-partition-quota trick (sum counts per lang,
    then hash-threshold at quota/count) to avoid ranking every row —
    the quota semantics stay identical."""
    docs = load(spark, sf_dir, "documents")
    rank = F.row_number().over(
        Window.partitionBy("lang").orderBy(
            F.md5(F.col("doc_id").cast("string")), "doc_id"
        )
    )
    quota_col = (
        F.when(F.col("lang") == "en", _MIX_QUOTA["en"])
        .when(F.col("lang") == "de", _MIX_QUOTA["de"])
        .when(F.col("lang") == "es", _MIX_QUOTA["es"])
        .when(F.col("lang") == "fr", _MIX_QUOTA["fr"])
        .when(F.col("lang") == "zh", _MIX_QUOTA["zh"])
        .otherwise(0)
    )
    return (
        docs.select("doc_id", "lang", rank.alias("sample_rank"))
        .filter(F.col("sample_rank") <= quota_col)
    )


_PACK_BUDGET = 512  # tokens per training sequence (pack bin)


@register(
    "text_pack_sequences",
    oracle=f"""
WITH sized AS (
  SELECT doc_id, source,
    length(text) - length(replace(text, ' ', '')) + 1 AS n_tokens
  FROM documents
), packed AS (
  SELECT doc_id, source, n_tokens,
    SUM(n_tokens) OVER (
      PARTITION BY source ORDER BY doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
    ) AS cum_tokens
  FROM sized
)
SELECT doc_id, source, CAST(n_tokens AS BIGINT) AS n_tokens,
  CAST((cum_tokens - n_tokens) // {_PACK_BUDGET} AS BIGINT) AS pack_id,
  CAST(cum_tokens AS BIGINT) AS cum_tokens
FROM packed
""",
    tags=("llm", "curation"),
)
def text_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing (training-batch assembly): stream documents in
    deterministic order within each source shard and assign each to a
    pack by its running token count — the window-sum formulation of
    greedy packing, which is how packing actually runs at scale
    (sequential within a shard, parallel across shards; a global greedy
    pack would serialize the corpus). One window shuffle partitioned by
    source — no global ordering anywhere."""
    docs = load(spark, sf_dir, "documents")
    n_tokens = (
        F.length("text") - F.length(F.regexp_replace("text", " ", "")) + 1
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sized = docs.select("doc_id", "source", n_tokens.alias("n_tokens"))
    packed = sized.withColumn("cum_tokens", F.sum("n_tokens").over(w))
    return packed.select(
        "doc_id",
        "source",
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        F.floor((F.col("cum_tokens") - F.col("n_tokens")) / _PACK_BUDGET)
        .cast("bigint")
        .alias("pack_id"),
        F.col("cum_tokens").cast("bigint").alias("cum_tokens"),
    )


_RAG_QUERIES = 10
_RAG_TOPK = 3


@register(
    "pipeline_retrieval_corpus",
    oracle=f"""
WITH cand AS (
  SELECT d.doc_id, d.lang, e.embedding,
    ROW_NUMBER() OVER (
      PARTITION BY md5(lower(trim(d.text))) ORDER BY d.doc_id
    ) AS rn,
    length(d.text) - length(replace(d.text, ' ', '')) + 1 AS n_tokens,
    CAST(length(d.text) AS DOUBLE)
      / (length(d.text) - length(replace(d.text, ' ', '')) + 1) AS avg_token_len
  FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
), kept AS (
  SELECT doc_id, lang, embedding,
    coalesce(sqrt(nullif(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), 0)), 1.0) AS nrm
  FROM cand
  WHERE rn = 1 AND n_tokens BETWEEN 20 AND 1000
    AND avg_token_len BETWEEN 3.0 AND 12.0
), q AS (
  SELECT vec_id AS query_id, embedding,
    coalesce(sqrt(nullif(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), 0)), 1.0) AS nrm
  FROM embeddings WHERE vec_id < {_RAG_QUERIES}
), scored AS (
  SELECT q.query_id, k.doc_id, k.lang,
    round(list_sum(list_transform(list_zip(q.embedding, k.embedding),
          p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))) / (q.nrm * k.nrm), 6) AS cosine
  FROM q JOIN kept k ON k.doc_id <> q.query_id
), ranked AS (
  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
            ORDER BY cosine DESC, doc_id) AS INT) AS rank
  FROM scored
)
SELECT query_id, doc_id, lang, cosine, rank
FROM ranked WHERE rank <= {_RAG_TOPK}
""",
    tags=("llm", "curation", "integration"),
)
def pipeline_retrieval_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed retrieval-corpus build — the cross-modal training-data
    path: join text to its embedding row (1:1 on id), exact-dedup on
    normalized text, gate on quality, then serve exact cosine top-3 per
    query from the surviving corpus. The text-side hygiene (dedup
    window + quality filter) runs BEFORE any vector math, so the
    expensive similarity stage only sees clean rows; the query side is
    broadcast so the corpus never shuffles for scoring. One window on
    the text hash + one on query_id — same shuffle budget as the
    single-modality pipelines."""
    from pyspark.sql import Window as W

    from am_kinesis_pay_spark.llm.similarity import _dot, safe_sqrt_norm

    docs = load(spark, sf_dir, "documents")
    emb = load(spark, sf_dir, "embeddings")
    n_tokens = F.length("text") - F.length(F.regexp_replace("text", " ", "")) + 1
    cand = (
        docs.join(emb, docs.doc_id == emb.vec_id)
        .select(
            "doc_id",
            "lang",
            "embedding",
            F.row_number()
            .over(W.partitionBy(F.md5(F.lower(F.trim("text")))).orderBy("doc_id"))
            .alias("rn"),
            n_tokens.alias("n_tokens"),
            (F.length("text").cast("double") / n_tokens).alias("avg_token_len"),
        )
    )
    kept = cand.filter(
        (F.col("rn") == 1)
        & F.col("n_tokens").between(20, 1000)
        & F.col("avg_token_len").between(3.0, 12.0)
    ).select(
        "doc_id",
        "lang",
        "embedding",
        safe_sqrt_norm(_dot("embedding", "embedding")).alias("nrm"),
    )
    q = (
        emb.filter(F.col("vec_id") < _RAG_QUERIES)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("qe"),
        )
        .withColumn("qn", safe_sqrt_norm(_dot("qe", "qe")))
    )
    scored = (
        F.broadcast(q)
        .join(kept, F.col("doc_id") != F.col("query_id"))
        .select(
            "query_id",
            "doc_id",
            "lang",
            F.round(_dot("qe", "embedding") / (F.col("qn") * F.col("nrm")), 6).alias(
                "cosine"
            ),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= _RAG_TOPK)
    )


@register(
    "pipeline_training_set",
    oracle=f"""
WITH quality AS (
  SELECT doc_id, lang, text,
    length(text) - length(replace(text, ' ', '')) + 1 AS n_tokens
  FROM documents
  WHERE length(text) - length(replace(text, ' ', '')) + 1 BETWEEN 20 AND 1000
    AND CAST(length(text) AS DOUBLE)
        / (length(text) - length(replace(text, ' ', '')) + 1) BETWEEN 3.0 AND 12.0
), grams AS (
  SELECT doc_id, md5(concat_ws(' ', t[i+1], t[i+2], t[i+3], t[i+4], t[i+5])) AS g
  FROM (SELECT doc_id, t, unnest(range(0, len(t) - {_DECON_N - 1})) AS i
        FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
        WHERE len(t) >= {_DECON_N})
), bench AS (
  SELECT DISTINCT g FROM grams WHERE doc_id % {_BENCH_MOD} = 0
), contaminated AS (
  SELECT DISTINCT grams.doc_id FROM grams JOIN bench ON grams.g = bench.g
  WHERE grams.doc_id % {_BENCH_MOD} <> 0
), clean AS (
  SELECT q.* FROM quality q
  WHERE q.doc_id % {_BENCH_MOD} <> 0
    AND q.doc_id NOT IN (SELECT doc_id FROM contaminated)
), deduped AS (
  SELECT doc_id, lang, n_tokens,
    ROW_NUMBER() OVER (
      PARTITION BY md5(lower(trim(text))) ORDER BY doc_id
    ) AS rn
  FROM clean
), mixed AS (
  SELECT doc_id, lang, n_tokens,
    ROW_NUMBER() OVER (
      PARTITION BY lang ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
    ) AS lang_rank
  FROM deduped WHERE rn = 1
), sampled AS (
  SELECT doc_id, lang, n_tokens FROM mixed
  WHERE lang_rank <= CASE lang
    WHEN 'en' THEN {_MIX_QUOTA["en"]} WHEN 'de' THEN {_MIX_QUOTA["de"]}
    WHEN 'es' THEN {_MIX_QUOTA["es"]} WHEN 'fr' THEN {_MIX_QUOTA["fr"]}
    WHEN 'zh' THEN {_MIX_QUOTA["zh"]} ELSE 0 END
), chunked AS (
  SELECT doc_id, lang,
    CAST(least({_CHUNK}, n_tokens - s) AS BIGINT) AS chunk_tokens
  FROM (SELECT doc_id, lang, n_tokens,
          unnest(range(0, greatest(CAST(ceil((n_tokens - {_CHUNK}) / {_STRIDE}.0) AS BIGINT) * {_STRIDE}, 0) + 1, {_STRIDE})) AS s
        FROM sampled)
), packed AS (
  SELECT lang, chunk_tokens,
    SUM(chunk_tokens) OVER (
      PARTITION BY lang ORDER BY doc_id, chunk_tokens
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
    ) AS cum
  FROM chunked
)
SELECT lang,
  CAST((cum - chunk_tokens) // {_PACK_BUDGET} AS BIGINT) AS pack_id,
  CAST(COUNT(*) AS BIGINT) AS n_chunks,
  CAST(SUM(chunk_tokens) AS BIGINT) AS pack_tokens
FROM packed
GROUP BY lang, (cum - chunk_tokens) // {_PACK_BUDGET}
""",
    tags=("llm", "curation", "integration"),
)
def pipeline_training_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full corpus-to-training-set build as ONE Catalyst plan (the
    C4/Dolma pipeline shape): quality gate -> benchmark decontamination
    (anti-join against the broadcast gram set) -> exact dedup ->
    target-mixture draw -> sliding-window chunking -> per-lang sequence
    packing -> pack-level token accounting. Stage order is the cost
    order: the cheap per-row gate runs first so later (wider) stages see
    fewer rows, and the three lang-partitioned windows (mixture rank,
    packing cumsum) reuse one Exchange. The only corpus-wide shuffles
    are the dedup hash window and the lang windows — the decontamination
    probe stays broadcast exactly as in text_decontaminate."""
    from pyspark.sql import Window as W

    docs = load(spark, sf_dir, "documents")
    n_tokens_e = (
        F.length("text") - F.length(F.regexp_replace("text", " ", "")) + 1
    )
    quality = docs.select(
        "doc_id", "lang", "text", n_tokens_e.alias("n_tokens")
    ).filter(
        F.col("n_tokens").between(20, 1000)
        & ((F.length("text").cast("double") / F.col("n_tokens")).between(3.0, 12.0))
    )
    grams = _decon_grams(spark, sf_dir)
    bench = grams.filter(F.col("doc_id") % _BENCH_MOD == 0).select("g").distinct()
    contaminated = (
        grams.filter(F.col("doc_id") % _BENCH_MOD != 0)
        .join(F.broadcast(bench), "g")
        .select("doc_id")
        .distinct()
    )
    clean = quality.filter(F.col("doc_id") % _BENCH_MOD != 0).join(
        contaminated, "doc_id", "left_anti"
    )
    deduped = clean.withColumn(
        "rn",
        F.row_number().over(
            W.partitionBy(F.md5(F.lower(F.trim("text")))).orderBy("doc_id")
        ),
    ).filter(F.col("rn") == 1)
    mixed = deduped.withColumn(
        "lang_rank",
        F.row_number().over(
            W.partitionBy("lang").orderBy(
                F.md5(F.col("doc_id").cast("string")), "doc_id"
            )
        ),
    )
    quota_col = (
        F.when(F.col("lang") == "en", _MIX_QUOTA["en"])
        .when(F.col("lang") == "de", _MIX_QUOTA["de"])
        .when(F.col("lang") == "es", _MIX_QUOTA["es"])
        .when(F.col("lang") == "fr", _MIX_QUOTA["fr"])
        .when(F.col("lang") == "zh", _MIX_QUOTA["zh"])
        .otherwise(0)
    )
    sampled = mixed.filter(F.col("lang_rank") <= quota_col).select(
        "doc_id", "lang", "n_tokens"
    )
    last_start = F.greatest(
        F.ceil((F.col("n_tokens") - _CHUNK) / F.lit(_STRIDE)).cast("long")
        * _STRIDE,
        F.lit(0).cast("long"),
    )
    chunked = sampled.select(
        "doc_id",
        "lang",
        "n_tokens",
        F.explode(
            F.sequence(
                F.lit(0).cast("long"), last_start, F.lit(_STRIDE).cast("long")
            )
        ).alias("s"),
    ).select(
        "doc_id",
        "lang",
        F.least(F.lit(_CHUNK).cast("long"), F.col("n_tokens") - F.col("s"))
        .cast("bigint")
        .alias("chunk_tokens"),
    )
    packed = chunked.withColumn(
        "cum",
        F.sum("chunk_tokens").over(
            W.partitionBy("lang")
            .orderBy("doc_id", "chunk_tokens")
            .rowsBetween(W.unboundedPreceding, W.currentRow)
        ),
    )
    pack_id = F.floor((F.col("cum") - F.col("chunk_tokens")) / _PACK_BUDGET).cast(
        "bigint"
    )
    return (
        packed.select("lang", pack_id.alias("pack_id"), "chunk_tokens")
        .groupBy("lang", "pack_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_chunks"),
            F.sum("chunk_tokens").cast("bigint").alias("pack_tokens"),
        )
    )


_ED_BLOCK_CHARS = 32  # blocking prefix
_ED_MAX_DIST = 40     # max edit distance to call a near-dup


@register(
    "text_dedup_editdist",
    oracle=f"""
WITH blocked AS (
  SELECT doc_id, text, substr(text, 1, {_ED_BLOCK_CHARS}) AS blk
  FROM documents
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
  CAST(CASE WHEN a.text = b.text THEN 0
       ELSE levenshtein(a.text, b.text) END AS INT) AS edit_dist
FROM blocked a JOIN blocked b
  ON a.blk = b.blk AND a.doc_id < b.doc_id
     AND abs(length(a.text) - length(b.text)) <= {_ED_MAX_DIST}
WHERE CASE WHEN a.text = b.text THEN 0
       ELSE levenshtein(a.text, b.text) END <= {_ED_MAX_DIST}
""",
    tags=("llm", "curation", "dedup"),
)
def text_dedup_editdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance near-dup detection, the character-level member of
    the dedup family (exact / MinHash / SimHash / n-gram / cosine /
    edit-distance): block on a text prefix so Levenshtein — O(n*m) per
    pair — only ever runs inside a block, never across the corpus.
    Three kernel guards keep hot blocks cheap (the 10x replication
    stress degraded the naive form ~400x, tools/stress.py):
    (1) equal texts short-circuit to distance 0 without the kernel —
    exact dups are the common case in a hot block; (2) the length-band
    bound |len(a)-len(b)| > d implies dist > d, pruning before the
    kernel; (3) Spark's banded levenshtein(l, r, threshold) computes
    O(d*n) instead of O(n*m), returning -1 above threshold (filtered
    out; the oracle filters the same pairs by full distance).
    Distances for surviving pairs are oracle-exact."""
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", "text", F.substring("text", 1, _ED_BLOCK_CHARS).alias("blk")
    )
    a = docs.select(
        F.col("doc_id").alias("doc_a"), F.col("text").alias("ta"),
        F.col("blk").alias("blk_a"),
    )
    b = docs.select(
        F.col("doc_id").alias("doc_b"), F.col("text").alias("tb"),
        F.col("blk").alias("blk_b"),
    )
    dist = F.when(F.col("ta") == F.col("tb"), F.lit(0)).otherwise(
        F.levenshtein("ta", "tb", _ED_MAX_DIST)
    )
    # The kernel must NOT run inside the join: a filter on `dist`
    # references both sides, so Catalyst would merge it into the join
    # condition and evaluate Levenshtein in the (single-task at local
    # row-group parallelism, size-coalesced by AQE) join stage. The
    # explicit repartition gives the CPU-dense projection real
    # parallelism, and the (doc_a, doc_b) aggregation is a barrier the
    # threshold filter cannot be pushed back through — measured 15x on
    # the 10x stress (73 s -> 4.7 s, tools/stress.py curation).
    pairs = a.join(
        b,
        (F.col("blk_a") == F.col("blk_b"))
        & (F.col("doc_a") < F.col("doc_b"))
        & (F.abs(F.length("ta") - F.length("tb")) <= _ED_MAX_DIST),
    ).repartition(64, "doc_a")
    scored = pairs.select("doc_a", "doc_b", dist.alias("edit_dist"))
    return (
        scored.groupBy("doc_a", "doc_b")
        .agg(F.min("edit_dist").alias("edit_dist"))
        .filter(F.col("edit_dist").between(0, _ED_MAX_DIST))
    )


_SPAN_N = 8  # tokens per span for cross-doc repetition detection


@register(
    "text_repeated_spans",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
), spans AS (
  SELECT doc_id,
    md5(concat_ws(' ', t[i+1], t[i+2], t[i+3], t[i+4], t[i+5], t[i+6], t[i+7], t[i+8])) AS h
  FROM (SELECT doc_id, t, unnest(range(0, len(t) - {_SPAN_N - 1})) AS i
        FROM toks WHERE len(t) >= {_SPAN_N})
)
SELECT h AS span_hash,
  CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
  CAST(COUNT(*) AS BIGINT) AS n_occurrences,
  CAST(MIN(doc_id) AS BIGINT) AS first_doc
FROM spans
GROUP BY h
HAVING COUNT(DISTINCT doc_id) >= 2
""",
    tags=("llm", "curation", "dedup"),
)
def text_repeated_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document repeated-span detection — the primitive behind
    exact-substring dedup (Lee et al.'s suffix-array pass) and
    boilerplate stripping: hash every 8-token span, keep spans that
    occur in >= 2 distinct documents. One shingle generator + one hash
    aggregation with map-side combine; the HAVING filter runs post-agg
    so only the (tiny) repeated tail survives. At 100 TB this is the
    span-level complement of MinHash: MinHash finds near-dup DOCUMENTS,
    this finds shared SUBSTRINGS (headers, footers, license blocks)
    inside otherwise-distinct documents."""
    from am_kinesis_pay_spark.tables import spread

    # r11 OPT: the per-span md5 pass runs in the scan stage — one task
    # per split, one split at fixture scale; spread() fans it over the
    # cores (no-op at scale)
    docs = spread(load(spark, sf_dir, "documents").select("doc_id", "text"))
    toks = docs.select("doc_id", F.split("text", " ").alias("t")).filter(
        F.size("t") >= _SPAN_N
    )
    spans = toks.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size("t") - _SPAN_N),
                lambda i: F.md5(
                    F.concat_ws(
                        " ",
                        *[F.element_at("t", i + k) for k in range(1, _SPAN_N + 1)],
                    )
                ),
            )
        ).alias("h"),
    )
    return (
        spans.groupBy(F.col("h").alias("span_hash"))
        .agg(
            F.countDistinct("doc_id").cast("bigint").alias("n_docs"),
            F.count(F.lit(1)).cast("bigint").alias("n_occurrences"),
            F.min("doc_id").cast("bigint").alias("first_doc"),
        )
        .filter(F.col("n_docs") >= 2)
    )


def _classifier_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document classifier scores as a session-scoped scratch-
    parquet memo (VERDICT r10 #4): the md5-token linear model's
    scoring pass is the WHOLE cost of text_classifier_score AND the
    embedded rescoring inside eval_calibration_ece (22.9 s / 24.1 s at
    the 100x century stress) — one per-token hash + mean-pool over the
    corpus, recomputed per entry. Materialized once per session+sf via
    session_artifact (the sign-LSH / _materialized_edges convention):
    doc_id, p = the 6-dp sigmoid as DECIMAL(18,6) (exact, so both
    consumers' downstream DECIMAL sums stay order-free), and lang (the
    ECE label source). At 100 TB model scores ARE a persisted table —
    scored once per model version, probed by every gate/eval — so the
    memo is the production shape, not a bench trick."""
    from am_kinesis_pay_spark.paths import session_artifact, sf_tag

    def build() -> DataFrame:
        docs = load(spark, sf_dir, "documents")
        toks = F.split("text", " ")
        weight = (
            lambda t: (
                F.conv(F.substring(F.md5(t), 1, 4), 16, 10).cast("long")
                % 200
                - 100
            )
            / 100.0
        )
        logit = F.aggregate(
            F.transform(toks, weight), F.lit(0.0), lambda s, x: s + x
        ) / F.size(toks)
        return docs.filter(F.size(toks) >= 1).select(
            "doc_id",
            F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-logit)), 6)
            .cast("decimal(18,6)")
            .alias("p"),
            "lang",
        )

    return session_artifact(
        spark, f"akps_cls_scores_{sf_tag(sf_dir)}", build
    )


@register(
    "text_classifier_score",
    oracle="""
SELECT doc_id,
  round(1.0 / (1.0 + exp(-(
    list_sum(list_transform(string_split(text, ' '), t ->
      (CAST(('0x' || substr(md5(t), 1, 4)) AS INTEGER) % 200 - 100)
        / 100.0))
    / len(string_split(text, ' '))))), 6) AS quality_prob
FROM documents
WHERE len(string_split(text, ' ')) >= 1
""",
    tags=("llm", "curation"),
)
def text_classifier_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality scoring (the fastText-classifier gate in
    CCNet/C4-style pipelines): a linear bag-of-words model — one
    weight per token, mean-pooled, squashed by a sigmoid. Weights here
    are a deterministic hash of the token (a stand-in for trained
    parameters; both engines derive the identical table, which is what
    the oracle checks). The real-pipeline shape is identical: weights
    live in a broadcast map or are inlined as an expression, scoring
    is transform() + aggregate() INSIDE the row — map-only, zero
    shuffle, linear scale-out. Swap the hash expression for a
    broadcast-joined weight table when the vocabulary is learned.
    Scores come from the _classifier_scored session artifact (scored
    once per session+sf, shared with eval_calibration_ece); the 6-dp
    DECIMAL round-trips to DOUBLE exactly, so values are bit-identical
    to the inline expression the oracle computes."""
    return _classifier_scored(spark, sf_dir).select(
        "doc_id", F.col("p").cast("double").alias("quality_prob")
    )


@register(
    "sample_temperature",
    oracle="""
WITH counts AS (
  SELECT lang, COUNT(*) AS n_docs FROM documents GROUP BY lang
), dist AS (
  SELECT lang, n_docs,
    CAST(n_docs AS DOUBLE) / SUM(n_docs) OVER () AS p,
    pow(CAST(n_docs AS DOUBLE) / SUM(n_docs) OVER (), 0.5) AS p_alpha
  FROM counts
)
SELECT lang, n_docs,
  round(p, 6) AS p,
  round(p_alpha / SUM(p_alpha) OVER (), 6) AS q,
  round((p_alpha / SUM(p_alpha) OVER ()) / p, 6) AS upweight
FROM dist
""",
    tags=("llm", "sample"),
)
def sample_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based mixture reweighting (the multilingual
    rebalancing rule from mBERT/XLM-R: q_l ∝ p_l^α, α=0.5): languages
    are resampled toward the tempered distribution, upweighting the
    tail without flattening the head. Two tiny aggregations over an
    already-aggregated 5-row frame — the per-lang counts are the only
    scan of the corpus; everything downstream is O(#languages). The
    companion draw is sample_mixture (quota by hash order) with these
    q values as the targets."""
    docs = load(spark, sf_dir, "documents")
    counts = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))
    w = Window.partitionBy()
    dist = counts.select(
        "lang",
        "n_docs",
        (F.col("n_docs").cast("double") / F.sum("n_docs").over(w)).alias("p"),
        F.pow(
            F.col("n_docs").cast("double") / F.sum("n_docs").over(w), 0.5
        ).alias("p_alpha"),
    )
    return dist.select(
        "lang",
        "n_docs",
        F.round("p", 6).alias("p"),
        F.round(F.col("p_alpha") / F.sum("p_alpha").over(w), 6).alias("q"),
        F.round(
            (F.col("p_alpha") / F.sum("p_alpha").over(w)) / F.col("p"), 6
        ).alias("upweight"),
    )


@register(
    "sample_balanced_classes",
    oracle="""
WITH counts AS (
  SELECT label, COUNT(*) AS n FROM embeddings GROUP BY label
),
m AS (SELECT MIN(n) AS min_n FROM counts),
ranked AS (
  SELECT vec_id, label,
         row_number() OVER (
           PARTITION BY label
           ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
         ) AS rn
  FROM embeddings
)
SELECT r.label, COUNT(*) AS n_sampled,
       CAST(SUM(r.vec_id) AS BIGINT) AS id_checksum
FROM ranked r CROSS JOIN m
WHERE r.rn <= m.min_n
GROUP BY r.label
""",
    tags=("llm", "sample"),
)
def sample_balanced_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Class-balanced downsampling: every label keeps exactly
    min-class-count rows, chosen in deterministic hash order (md5 of
    the key — the filter_hash_sample mechanism, so the draw is stable
    across engines/runs/cluster sizes and never biased by storage
    order). The class-imbalance corrector for classifier training
    sets; output size = n_labels × min_count by construction. One
    window shuffle on label + a broadcast 1-row min; the checksum
    column pins the exact membership (not just the size) against the
    oracle."""
    emb = load(spark, sf_dir, "embeddings")
    counts = emb.groupBy("label").agg(F.count(F.lit(1)).alias("n"))
    min_n = counts.agg(F.min("n").alias("min_n"))
    w = Window.partitionBy("label").orderBy(
        F.md5(F.col("vec_id").cast("string")), "vec_id"
    )
    ranked = emb.select("vec_id", "label").withColumn(
        "rn", F.row_number().over(w)
    )
    return (
        ranked.crossJoin(F.broadcast(min_n))
        .filter(F.col("rn") <= F.col("min_n"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.sum("vec_id").cast("long").alias("id_checksum"),
        )
    )


# DSIR importance resampling: hashed-unigram bucket count (256 buckets
# via the first 2 md5 hex chars — string keys, bit-identical across
# engines) and the selection budget.
_DSIR_B = 256
_DSIR_K = 100


@register(
    "sample_importance",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS token
  FROM documents
), t2 AS (
  SELECT doc_id, lang, substr(md5(token), 1, 2) AS b
  FROM toks WHERE token <> ''
), tgt AS (
  SELECT b, COUNT(*) AS ct FROM t2 WHERE lang = 'en' GROUP BY b
), src AS (
  SELECT b, COUNT(*) AS cs FROM t2 GROUP BY b
), nt AS (SELECT CAST(SUM(ct) AS DOUBLE) AS n FROM tgt),
ns AS (SELECT CAST(SUM(cs) AS DOUBLE) AS n FROM src),
w AS (
  SELECT s.b,
    CAST(round(ln(
      ((COALESCE(t.ct, 0) + 1) / (nt.n + {_DSIR_B}.0))
      / ((s.cs + 1) / (ns.n + {_DSIR_B}.0))
    ), 6) AS DECIMAL(18,6)) AS lw
  FROM src s LEFT JOIN tgt t USING (b), nt, ns
), scored AS (
  SELECT d.doc_id, d.lang,
    CAST(COUNT(*) AS BIGINT) AS n_tokens,
    round(CAST(SUM(w.lw) AS DOUBLE) / COUNT(*), 6) AS avg_logw
  FROM t2 d JOIN w ON d.b = w.b GROUP BY d.doc_id, d.lang
)
SELECT doc_id, lang, n_tokens, avg_logw
FROM scored ORDER BY avg_logw DESC, doc_id LIMIT {_DSIR_K}
""",
    tags=("llm", "sample"),
)
def sample_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data Selection with Importance Resampling (DSIR, Xie et al.
    2023): pick the {_DSIR_K} documents whose hashed-unigram feature
    distribution looks most like a target domain (here: the corpus's
    English documents) relative to the raw source distribution.

    Per 2-hex-char md5 bucket b (B={_DSIR_B}): Laplace-smoothed
    p_target(b)/p_source(b); a document's importance is its mean
    per-token round(ln ratio, 6), summed in exact DECIMAL so the
    accumulation is order-independent (the text_unigram_nll
    convention). Selection is deterministic: total order
    (avg_logw DESC, doc_id), top-{_DSIR_K}.

    Scale shape: the bucket weight table is exactly B={_DSIR_B} rows —
    broadcast — so scoring is one map-side join plus one groupBy(doc)
    shuffle, and the final top-K is TakeOrderedAndProject (per-
    partition heaps + driver merge of K rows, never a global sort).
    100 TB corpus ⇒ the only O(corpus) stages are the two token
    aggregations, both map-side-combined on 256 keys. Generalizes the
    reference's deterministic sampling (kinesis-pay.php:302-304) from
    modulus to learned importance."""
    docs = load(spark, sf_dir, "documents")
    t2 = (
        docs.select(
            "doc_id", "lang", F.explode(F.split("text", " ")).alias("token")
        )
        .filter(F.col("token") != "")
        .select("doc_id", "lang", F.substring(F.md5("token"), 1, 2).alias("b"))
    )
    tgt = t2.filter(F.col("lang") == "en").groupBy("b").agg(
        F.count(F.lit(1)).alias("ct")
    )
    src = t2.groupBy("b").agg(F.count(F.lit(1)).alias("cs"))
    nt = tgt.agg(F.sum("ct").cast("double").alias("nt"))
    ns = src.agg(F.sum("cs").cast("double").alias("ns"))
    w = (
        src.join(tgt, "b", "left")
        .crossJoin(F.broadcast(nt))
        .crossJoin(F.broadcast(ns))
        .select(
            "b",
            F.round(
                F.log(
                    (
                        (F.coalesce(F.col("ct"), F.lit(0)) + 1)
                        / (F.col("nt") + float(_DSIR_B))
                    )
                    / ((F.col("cs") + 1) / (F.col("ns") + float(_DSIR_B)))
                ),
                6,
            )
            .cast("decimal(18,6)")
            .alias("lw"),
        )
    )
    scored = (
        t2.join(F.broadcast(w), "b")
        .groupBy("doc_id", "lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            F.round(
                F.sum("lw").cast("double") / F.count(F.lit(1)), 6
            ).alias("avg_logw"),
        )
    )
    return scored.orderBy(F.desc("avg_logw"), "doc_id").limit(_DSIR_K)


# Shard count for the deterministic training-export shuffle.
_SHARDS = 8


@register(
    "sample_shard_shuffle",
    oracle="""
WITH ordered AS (
  SELECT doc_id,
    ROW_NUMBER() OVER (
      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
    ) - 1 AS seq
  FROM documents
)
SELECT doc_id,
  CAST(seq % 8 AS BIGINT) AS shard,
  CAST(seq // 8 AS BIGINT) AS pos
FROM ordered
""",
    tags=("llm", "sample", "curation"),
)
def sample_shard_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle for training-data export: order the
    corpus by md5(doc_id) (a reproducible pseudo-random permutation —
    same everywhere, every run, any cluster size), then deal rows
    round-robin into fixed shards with an in-shard position. This is
    the step that turns a curated corpus into shuffled training shards
    without a seed file: shard/pos are pure functions of the corpus
    membership, so adding a doc changes only positions after its hash.
    Generalizes the reference's mt_rand sampling (kinesis-pay.php:302)
    into a reproducible form. Scale: a naive global ORDER BY
    row_number window serializes the corpus into ONE task, so this is
    the two-pass prefix-sum pattern (win_global_running_total's):
    (1) bucket rows by the md5's first two hex chars — bucket order
    IS a prefix of the global (md5, doc_id) order — (2) count per
    bucket and cumsum the 256-row frame into exclusive offsets,
    (3) broadcast the offsets and row_number WITHIN each bucket.
    Wall-clock scales with the largest bucket (~corpus/256, hash-
    balanced), and the written layout partitions by shard so each
    training reader streams one file set sequentially."""
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", F.md5(F.col("doc_id").cast("string")).alias("h")
    )
    bucketed = docs.withColumn("bkt", F.substring("h", 1, 2))
    # pass 1: per-bucket counts -> exclusive prefix offsets (256 rows)
    offsets = (
        bucketed.groupBy("bkt")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn(
            "offset",
            F.coalesce(
                F.sum("n").over(
                    Window.orderBy("bkt").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ),
        )
        .select("bkt", "offset")
    )
    # pass 2: within-bucket rank (parallel across buckets) + offset
    w_bkt = Window.partitionBy("bkt").orderBy("h", "doc_id")
    seq = F.col("offset") + F.row_number().over(w_bkt) - 1
    return (
        bucketed.join(F.broadcast(offsets), "bkt")
        .select(
            "doc_id",
            (seq % _SHARDS).cast("long").alias("shard"),
            F.floor(seq / _SHARDS).cast("long").alias("pos"),
        )
    )


_FUZZY_BENCH_MOD = 13
_FUZZY_JACCARD = 0.5

def _fuzzy_decon_oracle() -> str:
    # replicate the dup-collapsed, bucket-capped LSH candidate stage
    # exactly (shared CTE chain from llm/dedup.py): a J >= 0.5 pair can
    # legitimately miss every band, so an all-pairs oracle would be a
    # SUPERSET of the operator's output — the oracle must model the
    # same recall, including the cap. Train x bench member pairs are
    # expanded from the symmetric rep-pair edges (+ self edges at
    # Jaccard 1.0 for groups holding both a train and a bench copy).
    from am_kinesis_pay_spark.llm.dedup import minhash_pair_ctes

    return (
        "WITH "
        + minhash_pair_ctes()
        + f""", sym AS (
  SELECT ra.grp_key AS gk, rb.grp_key AS nk, p.jaccard
  FROM rep_pairs p
  JOIN reps ra ON ra.rep_id = p.rep_a
  JOIN reps rb ON rb.rep_id = p.rep_b
  UNION ALL
  SELECT rb.grp_key, ra.grp_key, p.jaccard
  FROM rep_pairs p
  JOIN reps ra ON ra.rep_id = p.rep_a
  JOIN reps rb ON rb.rep_id = p.rep_b
  UNION ALL
  SELECT grp_key, grp_key, CAST(1.0 AS DOUBLE) FROM shingled_grps
)
SELECT tm.doc_id, bm.doc_id AS bench_doc, sym.jaccard
FROM sym
JOIN grp tm ON tm.grp_key = sym.gk AND tm.doc_id % {_FUZZY_BENCH_MOD} <> 0
JOIN grp bm ON bm.grp_key = sym.nk AND bm.doc_id % {_FUZZY_BENCH_MOD} = 0
"""
    )


_FUZZY_DECON_ORACLE = _fuzzy_decon_oracle()


@register(
    "text_decontaminate_fuzzy",
    oracle=_FUZZY_DECON_ORACLE,
    tags=("llm", "curation", "dedup"),
)
def text_decontaminate_fuzzy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FUZZY benchmark decontamination (the Dolma/RedPajama companion
    to text_decontaminate's exact 5-gram gate): a training doc is
    contaminated when its shingle-set Jaccard against any held-out
    benchmark doc clears {_FUZZY_JACCARD} — catching paraphrases and
    truncations that share no exact 5-gram run. Consumes the SHARED
    session-materialized MinHash artifacts from llm/dedup.py (the
    dup-collapsed rep signature index and the verified, bucket-capped
    rep pairs — see that module's section header), then expands
    train x bench member pairs from the symmetric rep-pair edges:
    cross-group pairs inherit the rep Jaccard, and a group holding
    both a train and a bench copy of the same text contributes its
    members at Jaccard 1.0 via a self edge. The expansion joins are
    output-bounded; no member-level candidate is ever generated, so a
    benchmark document duplicated thousands of times across the crawl
    (the common contamination shape) costs one rep row, not a
    quadratic bucket. The oracle replicates the SAME capped candidate
    stage (a J >= 0.5 pair can miss every band — LSH recall is
    probabilistic, (1-J^b)^r — so an all-pairs oracle would be a
    superset); the recall trade is the documented one shared with
    text_dedup_minhash."""
    from am_kinesis_pay_spark.llm.dedup import (
        _rep_index,
        _rep_members,
        _rep_pairs,
    )

    members = _rep_members(spark, sf_dir)
    idx = _rep_index(spark, sf_dir)
    rp = _rep_pairs(spark, sf_dir)
    rep2g = idx.select(F.col("doc_id").alias("rep_id"), "grp_key")
    cross_e = (
        rp.join(
            rep2g.select(
                F.col("rep_id").alias("rep_a"), F.col("grp_key").alias("gk")
            ),
            "rep_a",
        )
        .join(
            rep2g.select(
                F.col("rep_id").alias("rep_b"), F.col("grp_key").alias("nk")
            ),
            "rep_b",
        )
        .select("gk", "nk", "jaccard")
    )
    edges = (
        cross_e.unionByName(
            cross_e.select(
                F.col("nk").alias("gk"), F.col("gk").alias("nk"), "jaccard"
            )
        )
        .unionByName(
            idx.select(
                F.col("grp_key").alias("gk"),
                F.col("grp_key").alias("nk"),
                F.lit(1.0).alias("jaccard"),
            )
        )
    )
    train = members.filter(F.col("doc_id") % _FUZZY_BENCH_MOD != 0).select(
        F.col("grp_key").alias("gk"), "doc_id"
    )
    bench = members.filter(F.col("doc_id") % _FUZZY_BENCH_MOD == 0).select(
        F.col("grp_key").alias("nk"), F.col("doc_id").alias("bench_doc")
    )
    return (
        edges.join(train, "gk")
        .join(F.broadcast(bench), "nk")
        .select("doc_id", "bench_doc", "jaccard")
    )


# Distributed quality-classifier training (the learned gate that
# text_classifier_score applies): hashing-trick feature dim, full-batch
# GD rounds, unit learning rate over the mean gradient. All quantized
# state is FIXED-POINT BIGINT — see the docstring's determinism note.
_CLF_BUCKETS = 32
_CLF_ROUNDS = 4
# fixed-point scales: weights/gradients 1e-12, logit terms 1e-9,
# predictions 1e-6
_CLF_WS = 1_000_000_000_000
_CLF_LS = 1_000_000_000
_CLF_PS = 1_000_000


def _clf_train_oracle() -> str:
    """Replay the full GD trace in SQL: one CTE pair (predictions,
    gradient) plus a weight-update CTE per round, chained from w0=0.
    Weights travel as scale-1e-12 BIGINTs; every float step is the
    same explicitly-written IEEE expression the Spark side uses."""
    parts = [
        f"""
WITH toks AS (
  SELECT d.doc_id, CAST(d.lang = 'en' AS INT) AS y, t.token
  FROM documents d, unnest(string_split(d.text, ' ')) AS t(token)
  WHERE t.token <> ''
), xb AS (
  SELECT doc_id, y,
    CAST(('0x' || substr(md5(token), 1, 4)) AS INTEGER) % {_CLF_BUCKETS} AS j,
    COUNT(*) AS cnt
  FROM toks GROUP BY doc_id, y, j
), X AS (
  SELECT doc_id, y, j,
    CAST(cnt AS DOUBLE) / SUM(cnt) OVER (PARTITION BY doc_id) AS x
  FROM xb
), n AS (
  SELECT CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS n FROM X
), w0 AS (
  SELECT CAST(t.j AS INT) AS j, CAST(0 AS BIGINT) AS ws
  FROM range(0, {_CLF_BUCKETS}) t(j)
)"""
    ]
    for r in range(1, _CLF_ROUNDS + 1):
        parts.append(
            f""", p{r} AS (
  SELECT X.doc_id, X.y,
    CAST(floor({_CLF_PS}.0 / (1.0 + exp(-(
      CAST(SUM(CAST(floor(
        (CAST(w.ws AS DOUBLE) / {_CLF_WS}.0) * X.x * {_CLF_LS}.0 + 0.5
      ) AS BIGINT)) AS DOUBLE) / {_CLF_LS}.0))) + 0.5) AS BIGINT) AS ps
  FROM X JOIN w{r - 1} w USING (j)
  GROUP BY X.doc_id, X.y
), g{r} AS (
  SELECT X.j,
    SUM(CAST(floor(
      (CAST(p.ps AS DOUBLE) / {_CLF_PS}.0 - p.y) * X.x / n.n * {_CLF_WS}.0
      + 0.5) AS BIGINT)) AS gs
  FROM X JOIN p{r} p USING (doc_id), n
  GROUP BY X.j
), w{r} AS (
  SELECT w.j, w.ws - COALESCE(g.gs, 0) AS ws
  FROM w{r - 1} w LEFT JOIN g{r} g USING (j)
)"""
        )
    parts.append(
        f"""
SELECT j AS bucket, CAST(ws AS DOUBLE) / {_CLF_WS}.0 AS weight
FROM w{_CLF_ROUNDS}"""
    )
    return "".join(parts)


@register(
    "text_classifier_train",
    oracle=_clf_train_oracle(),
    tags=("llm", "curation"),
)
def text_classifier_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRAIN the fastText-style quality classifier that
    ``text_classifier_score`` applies: logistic regression over
    hashing-trick bag-of-words features (Weinberger et al. 2009; the
    learned-gate shape of the CCNet/GPT-3 quality filters), fit by
    full-batch gradient descent — label y = (lang = 'en'), 32 hash
    buckets, mean-pooled token counts, 4 rounds, unit learning rate on
    the mean gradient, zero-initialised weights.

    Distribution shape: the featurized frame X(doc_id, y, bucket, x)
    is built once (one explode + one per-doc-bucket count) and
    persisted; every GD round is then two aggregations over X —
    per-doc logits under the current weights (inlined as a broadcast
    array literal, map-side element_at), and the per-bucket gradient —
    ending in a D-row collect (D=32 longs; the bounded-artifact class
    PLANSTATS documents for bpe_train's 1-row argmax and emb_kmeans'
    centroids). The only driver work per round is subtracting a
    32-element integer gradient.

    Determinism discipline (what makes an ITERATIVE float recurrence
    oracle-checkable when emb_kmeans/pca cannot be): all quantized
    state is FIXED-POINT BIGINT. Weights live as scale-1e-12 integers;
    each logit term, prediction, and gradient term is quantized by an
    explicit ``floor(v * 10^s + 0.5)`` written as the SAME IEEE
    multiply/add/floor expression in both engines, and accumulated in
    exact integer sums (order-free). ``round(double, s)`` is banned
    from this path on measurement: Spark rounds the shortest decimal
    representation (BigDecimal.valueOf) while DuckDB rounds the scaled
    binary, and on ratio-of-small-int populations they disagree on
    ~1.2e-3 of values at scale 9 (~5e-6 at scale 6) — fatal once a
    recurrence feeds drift back through exp(). With explicit floors
    the only cross-engine surface is exp() itself, and a flip needs
    the scaled sigmoid within one ulp of an integer boundary
    (~1e-10/value). The oracle replays all 4 rounds as chained CTEs
    over BIGINT weight columns.

    At 100 TB: X is corpus-sized but three-columns-thin and persisted
    once; each round shuffles only doc-count rows into D buckets with
    map-side partial aggregation, and the model artifact (D longs) is
    the only thing that ever reaches the driver. k rounds = k bounded
    jobs — mini-batching/AdaGrad change the update arithmetic, not
    this plan shape.

    Reference parity: learns the gate kinesis-pay.php:520-537's
    validator chain hard-codes — a trained accept/reject score over
    record features."""
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        (F.col("lang") == "en").cast("int").alias("y"),
        F.explode(F.split("text", " ")).alias("token"),
    ).filter(F.col("token") != "")
    j = (
        F.conv(F.substring(F.md5("token"), 1, 4), 16, 10).cast("int")
        % _CLF_BUCKETS
    )
    xb = toks.groupBy("doc_id", "y", j.alias("j")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    # r11 OPT: hash-partition the featurized frame by doc_id ONCE and
    # derive the per-doc token total with a window over that same
    # partitioning (identical integer sum — no arithmetic change).
    # Every GD round's per-doc logit aggregation and X⋈p gradient join
    # then reuse the persisted partitioning: the only Exchange left per
    # round is the D-bucket gradient shuffle (before: a per-doc join +
    # two corpus-frame Exchanges per round).
    from pyspark.sql import Window as W

    X = (
        xb.repartition("doc_id")
        .select(
            "doc_id",
            "y",
            "j",
            (
                F.col("cnt")
                / F.sum("cnt").over(W.partitionBy("doc_id"))
            ).alias("x"),
        )
    )
    X = X.persist()
    try:
        n_docs = float(X.select("doc_id").distinct().count())
        ws = [0] * _CLF_BUCKETS  # scale-1e-12 fixed-point weights
        for _ in range(_CLF_ROUNDS):
            warr = F.array(*[F.lit(v / _CLF_WS) for v in ws])
            lterm = F.floor(
                F.element_at(warr, F.col("j") + 1)
                * F.col("x")
                * float(_CLF_LS)
                + 0.5
            )
            p = (
                X.groupBy("doc_id", "y")
                .agg(F.sum(lterm).alias("ls"))
                .select(
                    "doc_id",
                    "y",
                    F.floor(
                        float(_CLF_PS)
                        / (
                            F.lit(1.0)
                            + F.exp(
                                -(
                                    F.col("ls").cast("double")
                                    / float(_CLF_LS)
                                )
                            )
                        )
                        + 0.5
                    ).alias("ps"),
                )
            )
            gterm = F.floor(
                (F.col("ps").cast("double") / float(_CLF_PS) - F.col("y"))
                * F.col("x")
                / n_docs
                * float(_CLF_WS)
                + 0.5
            )
            grad = (
                X.join(p.select("doc_id", "ps"), "doc_id")
                .groupBy("j")
                .agg(F.sum(gterm).alias("gs"))
            )
            gmap = {r["j"]: r["gs"] for r in grad.collect()}
            ws = [ws[b] - gmap.get(b, 0) for b in range(_CLF_BUCKETS)]
    finally:
        X.unpersist()
    return spark.createDataFrame(
        [(b, ws[b] / _CLF_WS) for b in range(_CLF_BUCKETS)],
        "bucket int, weight double",
    )


@register(
    "pipeline_dataset_card",
    oracle="""
WITH per_doc AS (
  SELECT source, lang, md5(text) AS h,
    length(text) AS n_chars_c,
    length(text) - length(replace(text, ' ', '')) + 1 AS n_tok
  FROM documents
), per_lang AS (
  SELECT source, lang, COUNT(*) AS nl FROM per_doc GROUP BY source, lang
), src AS (
  SELECT source, COUNT(*) AS n_docs, COUNT(DISTINCT h) AS n_distinct,
    SUM(n_tok) AS n_tokens_ws,
    SUM(n_chars_c) AS n_chars_total,
    SUM(CASE WHEN n_chars_c < 100 THEN 1 ELSE 0 END) AS n_short
  FROM per_doc GROUP BY source
), ent AS (
  SELECT l.source, CAST(COUNT(*) AS BIGINT) AS n_langs,
    round(-SUM((CAST(nl AS DOUBLE) / s.n_docs)
               * ln(CAST(nl AS DOUBLE) / s.n_docs)), 6) AS lang_entropy
  FROM per_lang l JOIN src s USING (source) GROUP BY l.source
)
SELECT s.source,
  CAST(s.n_docs AS BIGINT) AS n_docs,
  CAST(s.n_tokens_ws AS BIGINT) AS n_tokens_ws,
  round(CAST(s.n_chars_total AS DOUBLE) / s.n_docs, 6) AS avg_chars,
  round(CAST(s.n_docs - s.n_distinct AS DOUBLE) / s.n_docs, 6) AS dup_frac,
  round(CAST(s.n_short AS DOUBLE) / s.n_docs, 6) AS short_frac,
  e.n_langs,
  e.lang_entropy
FROM src s JOIN ent e USING (source)
""",
    tags=("llm", "curation", "profile"),
)
def pipeline_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset-card generator: the per-SOURCE corpus profile every
    training-data release publishes (HuggingFace dataset cards, Dolma's
    per-source tables) — document count, whitespace-token volume, mean
    length, exact-duplicate fraction (1 - distinct md5 / n), short-doc
    fraction, language count and language-distribution entropy — in
    ONE pass over the corpus plus one re-aggregation of the tiny
    (source, lang) frame.

    Scale shape: the wide scan computes all per-doc arithmetic
    (lengths, hash) map-side; one groupBy(source) with a distinct-hash
    count (partial-aggregated) and one groupBy(source, lang) — both
    keyed on low-cardinality columns, both shuffle O(sources×langs)
    rows. Entropy sums a handful of per-lang doubles per source;
    round(,6) absorbs accumulation-order divergence between engines.
    At 100 TB this is the nightly corpus health report: every metric
    is a partial-aggregable expression, no windows, no UDFs."""
    docs = load(spark, sf_dir, "documents")
    per_doc = docs.select(
        "source",
        "lang",
        F.md5("text").alias("h"),
        F.length("text").alias("n_chars_c"),
        (
            F.length("text")
            - F.length(F.regexp_replace("text", " ", ""))
            + 1
        ).alias("n_tok"),
    )
    src = per_doc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("h").alias("n_distinct"),
        F.sum("n_tok").alias("n_tokens_ws"),
        F.sum("n_chars_c").alias("n_chars_total"),
        F.sum(F.when(F.col("n_chars_c") < 100, 1).otherwise(0)).alias(
            "n_short"
        ),
    )
    per_lang = per_doc.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("nl")
    )
    p = F.col("nl").cast("double") / F.col("n_docs")
    ent = (
        per_lang.join(src.select("source", "n_docs"), "source")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_langs"),
            F.round(-F.sum(p * F.log(p)), 6).alias("lang_entropy"),
        )
    )
    return src.join(ent, "source").select(
        "source",
        F.col("n_docs").cast("bigint").alias("n_docs"),
        F.col("n_tokens_ws").cast("bigint").alias("n_tokens_ws"),
        F.round(
            F.col("n_chars_total").cast("double") / F.col("n_docs"), 6
        ).alias("avg_chars"),
        F.round(
            (F.col("n_docs") - F.col("n_distinct")).cast("double")
            / F.col("n_docs"),
            6,
        ).alias("dup_frac"),
        F.round(F.col("n_short").cast("double") / F.col("n_docs"), 6).alias(
            "short_frac"
        ),
        "n_langs",
        "lang_entropy",
    )


_KCENTER_K = 6

_KC_COS = (
    "round(list_sum(list_transform(list_zip(n.embedding, c.embedding), "
    "pr -> CAST(pr[1] AS DOUBLE) * CAST(pr[2] AS DOUBLE))) / (n.nrm * c.nrm), 6)"
)


def _kcenter_oracle() -> str:
    """Farthest-first traversal unrolled to K rounds of CTEs: round r
    picks the vector maximizing its min cosine-distance to the r
    already-picked centers (ties -> smaller vec_id). Greedy k-center
    is deterministic given the entry point, so the whole selection is
    SQL-checkable."""
    ctes = ["""norms AS (
  SELECT vec_id, embedding,
    coalesce(sqrt(nullif(list_sum(list_transform(embedding,
      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), 0)), 1.0) AS nrm
  FROM embeddings
), sel0 AS (
  SELECT vec_id FROM norms
  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 1
), m0 AS (
  SELECT n.vec_id, 1 - {cos} AS mind
  FROM norms n JOIN norms c ON c.vec_id = (SELECT vec_id FROM sel0)
  WHERE n.vec_id <> (SELECT vec_id FROM sel0)
)""".format(cos=_KC_COS)]
    for r in range(1, _KCENTER_K):
        ctes.append("""p{r} AS (
  SELECT vec_id, mind FROM m{prev} ORDER BY mind DESC, vec_id LIMIT 1
), m{r} AS (
  SELECT m.vec_id, LEAST(m.mind, 1 - {cos}) AS mind
  FROM m{prev} m
  JOIN norms n ON n.vec_id = m.vec_id
  JOIN norms c ON c.vec_id = (SELECT vec_id FROM p{r})
  WHERE m.vec_id <> (SELECT vec_id FROM p{r})
)""".format(r=r, prev=r - 1, cos=_KC_COS))
    tail = ["SELECT CAST(0 AS INT) AS round, vec_id, CAST(NULL AS DOUBLE) AS dist FROM sel0"]
    for r in range(1, _KCENTER_K):
        tail.append(
            f"SELECT CAST({r} AS INT), vec_id, CAST(mind AS DOUBLE) FROM p{r}"
        )
    return "WITH " + ", ".join(ctes) + "\n" + "\nUNION ALL\n".join(tail)


@register(
    "sample_kcenter",
    oracle=_kcenter_oracle(),
    tags=("llm", "sampling", "vector"),
)
def sample_kcenter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diversity selection by greedy k-center (farthest-first
    traversal — Gonzalez 1985, the 2-approximation that underpins
    coreset construction and diverse data selection for training
    mixes): start from a deterministic entry vector, then repeatedly
    pick the vector FARTHEST (max-min cosine distance) from everything
    picked so far. The complement of the sampling family's
    frequency-based entries: temperature/importance reweight what is
    COMMON, k-center guarantees coverage of what is RARE (every corpus
    vector ends within the selection radius of some center).

    Deterministic by construction — md5 entry point, 6-dp pre-rounded
    cosines, vec_id tie-breaks — so the full greedy trajectory
    hash-matches an unrolled-CTE oracle. Each round is ONE distributed
    pass: the standing min-distance frame (vec_id, mind) folds the new
    center in with least(), and the argmax collects exactly one row
    (K tiny collects total — the emb_kmeans centroid convention). At
    100 TB the mind frame is the corpus-sized-but-thin state, centers
    broadcast; rounds = K is the budget knob, and the same loop over
    IVF-cell representatives instead of raw vectors gives the
    hierarchical variant."""
    from am_kinesis_pay_spark.llm.similarity import _dot, safe_sqrt_norm

    emb = load(spark, sf_dir, "embeddings")
    norms = emb.select(
        "vec_id",
        "embedding",
        safe_sqrt_norm(_dot("embedding", "embedding")).alias("nrm"),
    ).localCheckpoint()
    entry = (
        norms.orderBy(F.md5(F.col("vec_id").cast("string")), "vec_id")
        .limit(1)
        .collect()
    )
    if not entry:
        return spark.createDataFrame([], "round int, vec_id bigint, dist double")
    picked = [(0, int(entry[0].vec_id), None)]

    def dist_to(center_row):
        c_emb = F.array(*[F.lit(float(x)) for x in center_row.embedding])
        c_nrm = F.lit(float(center_row.nrm))
        return F.lit(1) - F.round(
            _dot("embedding", c_emb) / (F.col("nrm") * c_nrm), 6
        )

    mind = norms.filter(F.col("vec_id") != picked[0][1]).select(
        "vec_id", "embedding", "nrm", dist_to(entry[0]).alias("mind")
    )
    for r in range(1, _KCENTER_K):
        top = mind.orderBy(F.col("mind").desc(), "vec_id").limit(1).collect()
        if not top:
            break
        picked.append((r, int(top[0].vec_id), float(top[0].mind)))
        # the argmax row already carries (embedding, nrm) — no second
        # collect / norms re-scan to fetch the new center (r11 OPT)
        center = top[0]
        mind = (
            mind.filter(F.col("vec_id") != top[0].vec_id)
            .select(
                "vec_id",
                "embedding",
                "nrm",
                F.least(F.col("mind"), dist_to(center)).alias("mind"),
            )
            .localCheckpoint()
        )
    return spark.createDataFrame(
        picked, "round int, vec_id bigint, dist double"
    )


_FH_DIMS = 64  # hashed feature space (2^6; collisions intended)


@register(
    "fe_feature_hashing",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, unnest(list_filter(string_split(text, ' '),
                                    x -> x <> '')) AS token
  FROM documents
), hashed AS (
  SELECT doc_id,
    CAST(('0x' || substr(md5(token), 1, 4)) AS BIGINT) % {_FH_DIMS} AS dim,
    CASE WHEN CAST(('0x' || substr(md5(token), 5, 1)) AS BIGINT) % 2 = 0
         THEN 1 ELSE -1 END AS sign
  FROM toks
)
SELECT doc_id, dim, CAST(SUM(sign) AS BIGINT) AS weight,
  CAST(COUNT(*) AS BIGINT) AS n_tokens
FROM hashed GROUP BY doc_id, dim
HAVING SUM(sign) <> 0
""",
    tags=("llm", "curation"),
)
def fe_feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hashing trick (Weinberger et al. 2009, "Feature Hashing for
    Large Scale Multitask Learning") — the fixed-width featurizer every
    large-scale linear/logistic pipeline uses when the vocabulary
    cannot be enumerated: token -> md5 -> dimension in a FIXED
    {_FH_DIMS}-dim space, with the signed-sum trick (a second hash bit
    chooses +/-1) that makes collision noise zero-mean instead of
    additive. Output is the sparse (doc, dim, weight) triple form —
    zero-sum cells dropped, exactly what a trainer ingests. No
    vocabulary table, no fit step, no join: stateless math, which is
    the entire point at 100 TB (compare text_tokenize_tf, which must
    carry the vocab). One explode + one hash aggregation; shuffle key
    (doc_id, dim) is uniform by construction — md5 makes hot tokens
    spread across dims, so no key skew survives featurization. Both
    engines compute identical integer md5 arithmetic, so weights are
    hash-exact."""
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("token")
    ).filter(F.col("token") != "")
    dim = (
        F.conv(F.substring(F.md5("token"), 1, 4), 16, 10).cast("bigint")
        % _FH_DIMS
    )
    sign = F.when(
        F.conv(F.substring(F.md5("token"), 5, 1), 16, 10).cast("bigint") % 2
        == 0,
        F.lit(1),
    ).otherwise(F.lit(-1))
    hashed = toks.select("doc_id", dim.alias("dim"), sign.alias("sign"))
    return (
        hashed.groupBy("doc_id", "dim")
        .agg(
            F.sum("sign").cast("bigint").alias("weight"),
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
        )
        .filter(F.col("weight") != 0)
    )


_BLOOM_M = 8192  # bloom bitmap size (bits)
_BLOOM_J = 2  # hash functions per key


@register(
    "text_decontaminate_bloom",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
), grams AS (
  SELECT doc_id, i,
    md5(concat_ws(' ', t[i+1], t[i+2], t[i+3], t[i+4], t[i+5])) AS g
  FROM (SELECT doc_id, t, unnest(range(0, len(t) - {_DECON_N - 1})) AS i
        FROM toks WHERE len(t) >= {_DECON_N})
), bench AS (
  SELECT DISTINCT g FROM grams WHERE doc_id % {_BENCH_MOD} = 0
), bits AS (
  SELECT DISTINCT
    (CAST(('0x' || substr(g, 1, 15)) AS BIGINT)
     + k * CAST(('0x' || substr(g, 17, 15)) AS BIGINT)) % {_BLOOM_M} AS pos
  FROM bench, (SELECT unnest(range(0, {_BLOOM_J})) AS k)
), train AS (
  SELECT * FROM grams WHERE doc_id % {_BENCH_MOD} <> 0
), per_gram AS (
  SELECT t.doc_id, t.i, t.g,
    CAST(SUM(CASE WHEN b.pos IS NOT NULL THEN 1 ELSE 0 END) AS INT) AS n_set
  FROM (SELECT doc_id, i, g, k,
          (CAST(('0x' || substr(g, 1, 15)) AS BIGINT)
           + k * CAST(('0x' || substr(g, 17, 15)) AS BIGINT))
            % {_BLOOM_M} AS pos
        FROM train, (SELECT unnest(range(0, {_BLOOM_J})) AS k)) t
  LEFT JOIN bits b ON t.pos = b.pos
  GROUP BY t.doc_id, t.i, t.g
), truth AS (
  SELECT pg.doc_id, pg.i, pg.n_set,
    CASE WHEN bench.g IS NOT NULL THEN 1 ELSE 0 END AS is_true
  FROM per_gram pg LEFT JOIN bench ON pg.g = bench.g
)
SELECT doc_id,
  CAST(COUNT(*) AS BIGINT) AS n_grams,
  CAST(SUM(CASE WHEN n_set = {_BLOOM_J} THEN 1 ELSE 0 END) AS BIGINT)
    AS n_bloom_hits,
  CAST(SUM(is_true) AS BIGINT) AS n_true_hits,
  CAST(SUM(CASE WHEN n_set = {_BLOOM_J} AND is_true = 0 THEN 1 ELSE 0 END)
    AS BIGINT) AS n_false_pos,
  CAST(CASE WHEN SUM(CASE WHEN n_set = {_BLOOM_J} THEN 1 ELSE 0 END) > 0
       THEN 1 ELSE 0 END AS INT) AS is_flagged
FROM truth GROUP BY doc_id
""",
    tags=("llm", "curation", "sketch"),
)
def text_decontaminate_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter decontamination — the SKETCH form of
    text_decontaminate for when the reference gram set itself is too
    big to broadcast (a 10-TB reference corpus has billions of
    distinct 5-grams; a Bloom bitmap of m bits broadcasts at ANY
    reference size — Bloom 1970, the membership trade every
    at-scale dedup service makes). Benchmark grams set j = {_BLOOM_J}
    positions in an m = {_BLOOM_M}-bit filter, derived by
    Kirsch-Mitzenmacher double hashing (h1 + k*h2, both 60-bit slices
    of the gram's md5 — the textbook result that j independent hashes
    are unnecessary, and FREE here because the gram key already is a
    digest); a training
    gram is a POSSIBLE contaminant iff all j of its positions are set.
    Bloom's one-sided-error law — false positives possible, false
    negatives IMPOSSIBLE — is not just documented but MEASURED inline:
    every output row carries the exact hit count next to the bloom
    count, so n_false_pos is observable and n_bloom_hits >=
    n_true_hits by construction (pinned in tests). Every quantity is a
    deterministic function of md5, so the oracle hash-checks the
    sketch itself, false positives included.

    Plan shape: the bit set is a DISTINCT over positions — AT MOST m
    rows regardless of corpus size (the broadcastability guarantee,
    where text_decontaminate's exact bench set grows with the
    benchmark). The j probes are j POSITION COLUMNS on the gram frame
    joined against the broadcast bit set j times — j is a small fixed
    constant, so this is j map-side lookups per gram, with NO probe
    explode and NO per-instance re-aggregation (the first cut fanned
    every gram into j rows and hash-aggregated them back; at the 100x
    stress that re-agg was 74x the 1x wall-clock — the fix is receipt
    SCALE.md round-8). The exact-truth join exists only to audit the
    FP rate and deliberately carries NO broadcast hint: the bench gram
    set GROWS with the benchmark, so AQE must pick the join strategy
    (a production run drops the audit entirely and keeps only the j
    broadcast probes). The bitmap is modeled as the distinct-position
    frame rather than packed longs: same semantics, same broadcast
    bound, and the oracle can state it in SQL. Gram source: the
    _decon_grams session artifact (r12 OPT — was two in-plan shingle
    passes per execution)."""
    grams = _decon_grams(spark, sf_dir)
    bench = (
        grams.filter(F.col("doc_id") % _BENCH_MOD == 0).select("g").distinct()
    )

    h1 = F.conv(F.substring("g", 1, 15), 16, 10).cast("bigint")
    h2 = F.conv(F.substring("g", 17, 15), 16, 10).cast("bigint")

    def pos_k(k: int):
        # Kirsch-Mitzenmacher double hashing: the gram key g IS an md5
        # hex digest, so both 60-bit hashes are slices of it — zero
        # extra hash computations per probe
        return (h1 + k * h2) % _BLOOM_M

    ks = F.explode(F.sequence(F.lit(0), F.lit(_BLOOM_J - 1))).alias("k")
    pos_of_k = (h1 + F.col("k") * h2) % _BLOOM_M
    bits = bench.select("g", ks).select(pos_of_k.alias("pos")).distinct()
    train = grams.filter(F.col("doc_id") % _BENCH_MOD != 0)
    probes = train.select(
        "doc_id",
        "g",
        *[pos_k(k).alias(f"pos{k}") for k in range(_BLOOM_J)],
    )
    hit = F.lit(True)
    for k in range(_BLOOM_J):
        b_k = bits.select(F.col("pos").alias(f"pos{k}")).withColumn(
            f"set{k}", F.lit(1)
        )
        probes = probes.join(F.broadcast(b_k), f"pos{k}", "left")
        hit = hit & F.col(f"set{k}").isNotNull()
    per_gram = probes.select("doc_id", "g", hit.alias("bloom_hit"))
    # audit join: NO broadcast hint — the bench set scales with the
    # benchmark, AQE picks the strategy
    truth = per_gram.join(
        bench.withColumn("true_", F.lit(1)), "g", "left"
    ).select(
        "doc_id",
        "bloom_hit",
        F.coalesce(F.col("true_"), F.lit(0)).alias("is_true"),
    )
    bloom_hit = F.when(F.col("bloom_hit"), 1).otherwise(0)
    return truth.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_grams"),
        F.sum(bloom_hit).cast("bigint").alias("n_bloom_hits"),
        F.sum("is_true").cast("bigint").alias("n_true_hits"),
        F.sum(
            F.when(F.col("bloom_hit") & (F.col("is_true") == 0), 1)
            .otherwise(0)
        )
        .cast("bigint")
        .alias("n_false_pos"),
        F.when(F.sum(bloom_hit) > 0, 1).otherwise(0).cast("int").alias(
            "is_flagged"
        ),
    )


_BUDGET_FRAC = 0.5  # global token budget as a fraction of the corpus


@register(
    "sample_token_budget",
    oracle=f"""
WITH per_doc AS (
  SELECT doc_id, source,
    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
      / 1152921504606846976.0 AS frac
  FROM documents
), per_src AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
    CAST(SUM(n_tokens) AS BIGINT) AS tokens_total
  FROM per_doc GROUP BY source
), tot AS (
  SELECT {_BUDGET_FRAC} * SUM(tokens_total) AS budget,
    CAST(COUNT(*) AS BIGINT) AS n_sources
  FROM per_src
), rates AS (
  SELECT source, n_docs, tokens_total,
    LEAST(1.0, (budget / n_sources) / tokens_total) AS rate
  FROM per_src, tot
), kept AS (
  SELECT d.source,
    CAST(COUNT(*) AS BIGINT) AS docs_kept,
    CAST(SUM(d.n_tokens) AS BIGINT) AS tokens_kept
  FROM per_doc d JOIN rates r ON d.source = r.source
  WHERE d.frac < r.rate
  GROUP BY d.source
)
SELECT r.source, r.n_docs, r.tokens_total, round(r.rate, 6) AS rate,
  COALESCE(k.docs_kept, 0) AS docs_kept,
  COALESCE(k.tokens_kept, 0) AS tokens_kept,
  round(COALESCE(k.tokens_kept, 0) / (tot.budget / tot.n_sources), 6)
    AS fill_ratio
FROM rates r LEFT JOIN kept k ON r.source = k.source, tot
""",
    tags=("llm", "sample"),
)
def sample_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TOKEN-budget mixture sampling — the training-mix materializer:
    given a global token budget (a fraction of the corpus) split
    uniformly across sources, each source gets a deterministic
    acceptance rate min(1, target_tokens / source_tokens) and docs are
    drawn by md5-of-id threshold (the seedable coin every sample_*
    entry uses). This is the TOKEN-aware counterpart of sample_mixture
    (doc-count quotas): budgets for LLM training are token counts, and
    a doc-count quota over sources with different doc lengths misses
    them. It is also deliberately the RATE form, not the rank form: no
    per-source row_number over the corpus (the low-cardinality window
    hazard) — acceptance is a stateless per-row predicate, so the
    selection is one scan at any scale, and the realized fill ratio
    per source is reported (rate saturates at 1.0 for under-budget
    sources, which then under-fill — the report shows exactly the
    shortfall a re-balancing pass would redistribute).

    Plan shape: one scan to per-doc (source, tokens, coin); one hash
    agg to the ~|sources| frame; a 1-row corpus-total broadcast onto
    it (allowlisted O(1)-row NLJ); the rates broadcast-join back onto
    the doc frame for the kept-aggregation. Tokens stay BIGINT
    (exact); rates and fill ratios are doubles with identical
    expression trees both engines, rounded to 6 dp."""
    docs = load(spark, sf_dir, "documents")
    frac = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10
    ).cast("bigint") / F.lit(float(1 << 60))
    per_doc = docs.select(
        "doc_id",
        "source",
        F.size(F.split("text", " ")).cast("bigint").alias("n_tokens"),
        frac.alias("frac"),
    )
    per_src = per_doc.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("tokens_total"),
    )
    tot = per_src.agg(
        (F.lit(_BUDGET_FRAC) * F.sum("tokens_total")).alias("budget"),
        F.count(F.lit(1)).cast("bigint").alias("n_sources"),
    )
    rates = per_src.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "tokens_total",
        F.least(
            F.lit(1.0),
            (F.col("budget") / F.col("n_sources")) / F.col("tokens_total"),
        ).alias("rate"),
        (F.col("budget") / F.col("n_sources")).alias("target_tokens"),
    )
    kept = (
        per_doc.join(
            F.broadcast(rates.select("source", "rate")), "source"
        )
        .filter(F.col("frac") < F.col("rate"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("docs_kept"),
            F.sum("n_tokens").cast("bigint").alias("tokens_kept"),
        )
    )
    return rates.join(kept, "source", "left").select(
        "source",
        "n_docs",
        "tokens_total",
        F.round("rate", 6).alias("rate"),
        F.coalesce("docs_kept", F.lit(0)).cast("bigint").alias("docs_kept"),
        F.coalesce("tokens_kept", F.lit(0))
        .cast("bigint")
        .alias("tokens_kept"),
        F.round(
            F.coalesce("tokens_kept", F.lit(0)) / F.col("target_tokens"), 6
        ).alias("fill_ratio"),
    )


_DSIR2_B = 1024  # hashed feature buckets
_DSIR2_N = 100  # selection size
_DSIR2_TARGET = ("src1", "src2", "src3")  # the domain we want more of


@register(
    "pipeline_dsir_selection",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, source, string_split(text, ' ') AS t FROM documents
), bigrams AS (
  SELECT doc_id, source,
    CAST(('0x' || substr(md5(t[i+1] || ' ' || t[i+2]), 1, 15)) AS BIGINT)
      % {_DSIR2_B} AS b
  FROM (SELECT doc_id, source, t, unnest(range(0, len(t) - 1)) AS i
        FROM toks WHERE len(t) >= 2)
), tgt AS (
  SELECT b, CAST(COUNT(*) AS BIGINT) AS c FROM bigrams
  WHERE source IN {_DSIR2_TARGET} GROUP BY b
), raw AS (
  SELECT b, CAST(COUNT(*) AS BIGINT) AS c FROM bigrams
  WHERE source NOT IN {_DSIR2_TARGET} GROUP BY b
), tot AS (
  SELECT (SELECT SUM(c) FROM tgt) AS t_tot,
         (SELECT SUM(c) FROM raw) AS r_tot
), ratio AS (
  SELECT raw.b,
    CAST(round(
      ln((COALESCE(tgt.c, 0) + 1.0) / (tot.t_tot + {_DSIR2_B}))
      - ln((raw.c + 1.0) / (tot.r_tot + {_DSIR2_B})), 6)
      AS DECIMAL(18,6)) AS lr
  FROM raw LEFT JOIN tgt ON raw.b = tgt.b, tot
), scored AS (
  SELECT g.doc_id, MIN(g.source) AS source,
    CAST(COUNT(*) AS BIGINT) AS n_bigrams,
    round(CAST(SUM(r.lr) AS DOUBLE) / COUNT(*), 6) AS avg_log_ratio
  FROM bigrams g JOIN ratio r ON g.b = r.b
  WHERE g.source NOT IN {_DSIR2_TARGET}
  GROUP BY g.doc_id
)
SELECT doc_id, source, n_bigrams, avg_log_ratio
FROM scored ORDER BY avg_log_ratio DESC, doc_id LIMIT {_DSIR2_N}
""",
    tags=("llm", "curation", "pipeline"),
)
def pipeline_dsir_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR over BIGRAM features with a SOURCE-labeled target domain —
    the second half of the DSIR family (sample_importance is the
    unigram form whose target is a language slice and whose selection
    ranks the whole corpus; this one scores only the non-target pool
    against a curated-source target, the "give me more like src1-3"
    request): score every candidate doc by how much more
    likely its hashed-bigram features are under the TARGET domain's
    smoothed feature distribution than under the raw pool's, and keep
    the top N. Hashing bigrams into B = {_DSIR2_B} buckets is the
    paper's trick that makes the two "language models" a pair of
    B-row count vectors — buildable in one grouped aggregation each at
    ANY corpus size, broadcastable always.

    Plan shape: one bigram explode feeds three hash aggregations
    (target counts, raw counts, per-doc scoring); the log-ratio table
    is at most B rows (broadcast), so candidate scoring is a
    broadcast join + one aggregation — no shuffle wider than the
    bucket id; the final top-N is TakeOrderedAndProject, never a
    global sort. Laplace smoothing (+1 over total+B) keeps
    unseen-in-target buckets finite exactly as the paper does. Float
    discipline: counts are exact BIGINTs; each bucket's log ratio is
    computed once, rounded to 6 dp and FROZEN as DECIMAL(18,6) so the
    per-doc sum is order-independent (the sum of thousands of raw
    doubles would not hash-match across engines); the per-doc average
    divides on the doc frame and rounds to 6 dp. Ties at the
    selection boundary break by doc_id."""
    docs = load(spark, sf_dir, "documents")
    toks = docs.select("doc_id", "source", F.split("text", " ").alias("t"))
    bigram = F.concat_ws(
        " ",
        F.element_at("t", F.col("i") + 1),
        F.element_at("t", F.col("i") + 2),
    )
    bucket = (
        F.conv(F.substring(F.md5(bigram), 1, 15), 16, 10).cast("bigint")
        % _DSIR2_B
    )
    from am_kinesis_pay_spark.tables import spread

    # r11 OPT: spread the bigram explode + md5 bucketing over the
    # cores (scan-stage work, one split at fixture scale; no-op at
    # production split counts)
    bigrams = (
        spread(toks.filter(F.size("t") >= 2))
        .select(
            "doc_id",
            "source",
            F.explode(F.sequence(F.lit(0), F.size("t") - 2)).alias("i"),
            "t",
        )
        .select("doc_id", "source", bucket.alias("b"))
    )
    is_target = F.col("source").isin(*_DSIR2_TARGET)
    # r11 OPT: target and raw bucket counts in ONE conditional
    # aggregation (one corpus pass instead of two), lineage-cut at the
    # <= B-row result so the totals crossJoin and the ratio table both
    # read the materialized counts instead of re-running the explode.
    # tc/rc are the identical exact integers the two separate GROUP
    # BYs produced; a bucket absent from the target slice is tc=0 —
    # exactly what the oracle's LEFT JOIN + COALESCE yields.
    counts = (
        bigrams.groupBy("b")
        .agg(
            F.count(F.when(is_target, 1)).cast("bigint").alias("tc"),
            F.count(F.when(~is_target, 1)).cast("bigint").alias("rc"),
        )
        .localCheckpoint()
    )
    # degenerate-slice parity: the oracle's scalar subqueries are NULL
    # when a slice has no rows at all, a conditional count sums to 0
    tot = counts.agg(
        F.when(F.sum("tc") > 0, F.sum("tc")).alias("t_tot"),
        F.when(F.sum("rc") > 0, F.sum("rc")).alias("r_tot"),
    )
    ratio = (
        counts.filter(F.col("rc") >= 1)
        .crossJoin(F.broadcast(tot))
        .select(
            "b",
            F.round(
                F.log(
                    (F.coalesce(F.col("tc"), F.lit(0)) + 1.0)
                    / (F.col("t_tot") + _DSIR2_B)
                )
                - F.log(
                    (F.col("rc") + 1.0) / (F.col("r_tot") + _DSIR2_B)
                ),
                6,
            )
            .cast("decimal(18,6)")
            .alias("lr"),
        )
    )
    scored = (
        bigrams.filter(~is_target)
        .join(F.broadcast(ratio), "b")
        .groupBy("doc_id")
        .agg(
            F.min("source").alias("source"),
            F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
            F.round(
                F.sum("lr").cast("double") / F.count(F.lit(1)), 6
            ).alias("avg_log_ratio"),
        )
    )
    return scored.orderBy(
        F.col("avg_log_ratio").desc(), "doc_id"
    ).limit(_DSIR2_N)


@register(
    "sample_upsample_repeat",
    oracle="""
WITH per_doc AS (
  SELECT doc_id, source,
    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
      / 1152921504606846976.0 AS frac
  FROM documents
), per_src AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
    CAST(SUM(n_tokens) AS BIGINT) AS tokens_total
  FROM per_doc GROUP BY source
), tot AS (
  SELECT CAST(SUM(tokens_total) AS DOUBLE) / COUNT(*) AS target
  FROM per_src
), factors AS (
  SELECT source, n_docs, tokens_total,
    target / tokens_total AS factor
  FROM per_src, tot
), copies AS (
  SELECT d.doc_id, d.source, d.n_tokens,
    CAST(floor(f.factor) AS BIGINT)
      + CASE WHEN d.frac < f.factor - floor(f.factor) THEN 1 ELSE 0 END
      AS n_copies
  FROM per_doc d JOIN factors f ON d.source = f.source
), exploded AS (
  SELECT c.source, c.n_tokens
  FROM copies c, unnest(range(1, CAST(c.n_copies AS BIGINT) + 1))
)
SELECT f.source, f.n_docs, f.tokens_total,
  round(f.factor, 6) AS factor,
  COALESCE(e.copies_out, 0) AS copies_out,
  COALESCE(e.tokens_out, 0) AS tokens_out,
  round(COALESCE(e.tokens_out, 0) / tot.target, 6) AS fill_ratio
FROM factors f
LEFT JOIN (SELECT source, CAST(COUNT(*) AS BIGINT) AS copies_out,
             CAST(SUM(n_tokens) AS BIGINT) AS tokens_out
           FROM exploded GROUP BY source) e ON f.source = e.source, tot
""",
    tags=("llm", "sample"),
)
def sample_upsample_repeat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeat-based UPSAMPLING to a balanced token mixture — the other
    half of mixture materialization (sample_token_budget can only
    DOWN-sample, so under-represented sources under-fill their
    share; a training mix that wants equal token mass per source must
    REPEAT docs from small sources — the epoch-fraction trick every
    data-constrained LLM run uses, cf. Muennighoff et al. 2023 on
    repeated-data scaling): each source gets factor = target_tokens /
    source_tokens; every doc materializes floor(factor) copies plus
    one more iff its md5 coin lands under the fractional remainder —
    deterministic, so expected AND realized token mass are exact,
    reproducible functions of the data, and the oracle hash-checks the
    materialized mix.

    Plan shape: one scan to per-doc (source, tokens, coin); the
    |sources|-row factor frame broadcasts back; the repeat is a
    BOUNDED explode (sequence 1..n_copies, n_copies <= ceil(max
    factor) — a constant multiplier like events_rolling_active_users'
    7x fan, NOT a join); one final hash agg reports realized copies /
    tokens / fill ratio per source. Down-sampled sources (factor < 1)
    fall out of the same arithmetic: floor = 0, the coin keeps
    factor-fraction of docs. Tokens stay BIGINT; factor and fill
    ratios are identical-expression-tree doubles rounded to 6 dp."""
    docs = load(spark, sf_dir, "documents")
    frac = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10
    ).cast("bigint") / F.lit(float(1 << 60))
    per_doc = docs.select(
        "doc_id",
        "source",
        F.size(F.split("text", " ")).cast("bigint").alias("n_tokens"),
        frac.alias("frac"),
    )
    per_src = per_doc.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("tokens_total"),
    )
    tot = per_src.agg(
        (F.sum("tokens_total").cast("double") / F.count(F.lit(1))).alias(
            "target"
        )
    )
    factors = per_src.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "tokens_total",
        (F.col("target") / F.col("tokens_total")).alias("factor"),
        "target",
    )
    copies = per_doc.join(
        F.broadcast(factors.select("source", "factor")), "source"
    ).select(
        "source",
        "n_tokens",
        (
            F.floor("factor").cast("bigint")
            + F.when(
                F.col("frac") < F.col("factor") - F.floor("factor"), 1
            ).otherwise(0)
        ).alias("n_copies"),
    )
    # sequence(1, 0) DESCENDS in Spark (step defaults to -1 when
    # start > stop) — gate the zero-copy case to NULL, which explode
    # drops, matching DuckDB's empty range(1, 1)
    exploded = copies.select(
        "source",
        "n_tokens",
        F.explode(
            F.when(
                F.col("n_copies") >= 1,
                F.sequence(F.lit(1), F.col("n_copies")),
            )
        ).alias("_i"),
    )
    out = exploded.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("copies_out"),
        F.sum("n_tokens").cast("bigint").alias("tokens_out"),
    )
    return factors.join(out, "source", "left").select(
        "source",
        "n_docs",
        "tokens_total",
        F.round("factor", 6).alias("factor"),
        F.coalesce("copies_out", F.lit(0)).cast("bigint").alias("copies_out"),
        F.coalesce("tokens_out", F.lit(0)).cast("bigint").alias("tokens_out"),
        F.round(
            F.coalesce("tokens_out", F.lit(0)) / F.col("target"), 6
        ).alias("fill_ratio"),
    )


_GUM_K = 50  # weighted sample size (Efraimidis-Spirakis top-k)
_GUM_U_SCALE = "281474976710656.0"  # 2^48: md5 48-bit uniform denominator


@register(
    "sample_weighted_gumbel",
    oracle=f"""
WITH keyed AS (
  SELECT doc_id, lang, source, n_chars,
    round(ln(GREATEST(
        ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12))::BIGINT, 1)
             / {_GUM_U_SCALE}) / n_chars, 12) AS es_key
  FROM documents WHERE n_chars > 0
), topk AS (
  SELECT * FROM keyed ORDER BY es_key DESC, doc_id LIMIT {_GUM_K}
)
SELECT doc_id, lang, source, n_chars, es_key,
  CAST(ROW_NUMBER() OVER (ORDER BY es_key DESC, doc_id) AS BIGINT) AS rnk
FROM topk
""",
    tags=("llm", "sampling"),
)
def sample_weighted_gumbel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WEIGHTED sampling WITHOUT replacement (Efraimidis & Spirakis
    2006 — the perturbed-key / Gumbel-top-k trick): every document
    draws a deterministic uniform u from its own md5 (the repo's
    seeded-randomness convention, 48-bit mantissa / 2^48) and
    competes with key ln(u)/w, w = n_chars; the top-{_GUM_K} keys ARE
    an exact weighted sample without replacement — longer documents
    win proportionally more often, no rejection loop, no sequential
    state. This is the missing draw primitive next to the quota
    samplers (sample_mixture: per-group hash quota; sample_importance:
    score top-k): one pass, any weight column, distributed.

    Key discipline: u and w are exact integers, ln(u) is the one
    libm call (the repo's accepted exp/ln 1-ulp class) rounded to
    12 dp BEFORE ranking with a doc_id tie-break, so both engines
    rank identical keys. Plan shape: map-only key computation ->
    TakeOrderedAndProject top-{_GUM_K} (never a global sort of the
    corpus); the ranking window runs on the <= {_GUM_K}-row LIMITed
    frame (allowlisted: the text_bm25_topk pattern). At 100 TB this
    is exactly one scan + a k-row reduce per partition."""
    docs = load(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    # Clamp the 48-bit integer away from 0 (p = 2^-48 per doc) with the
    # IDENTICAL literal on both engines: DuckDB ln(0) throws Out of
    # Range where Spark F.log(0) returns NULL, so an unclamped zero
    # would crash the oracle and silently drop the doc from Spark's
    # ranking.
    u = F.greatest(
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 12),
            16,
            10,
        ).cast("bigint"),
        F.lit(1),
    ) / F.lit(float(1 << 48))
    keyed = docs.select(
        "doc_id",
        "lang",
        "source",
        "n_chars",
        F.round(F.log(u) / F.col("n_chars"), 12).alias("es_key"),
    )
    topk = keyed.orderBy(F.desc("es_key"), "doc_id").limit(_GUM_K)
    w = Window.partitionBy().orderBy(F.desc("es_key"), "doc_id")
    return topk.select(
        "doc_id",
        "lang",
        "source",
        "n_chars",
        "es_key",
        F.row_number().over(w).cast("bigint").alias("rnk"),
    )


_ECE_BINS = 10  # equal-width probability bins (the standard ECE grid)


@register(
    "eval_calibration_ece",
    oracle=f"""
WITH scored AS (
  SELECT doc_id,
    CAST(round(1.0 / (1.0 + exp(-(
      list_sum(list_transform(string_split(text, ' '), t ->
        (CAST(('0x' || substr(md5(t), 1, 4)) AS INTEGER) % 200 - 100)
          / 100.0))
      / len(string_split(text, ' '))))), 6) AS DECIMAL(18,6)) AS p,
    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
  FROM documents WHERE len(string_split(text, ' ')) >= 1
), binned AS (
  SELECT LEAST(CAST(floor(CAST(p AS DOUBLE) * {_ECE_BINS}) AS BIGINT),
               {_ECE_BINS - 1}) AS bin,
    p, y
  FROM scored
), per AS (
  SELECT bin, CAST(COUNT(*) AS BIGINT) AS n,
    CAST(SUM(p) AS DOUBLE) / COUNT(*) AS conf,
    CAST(SUM(y) AS DOUBLE) / COUNT(*) AS acc
  FROM binned GROUP BY bin
), tot AS (SELECT CAST(SUM(n) AS BIGINT) AS n_total FROM per),
terms AS (
  SELECT bin, n, conf, acc,
    CAST(round(n * abs(acc - conf) / tot.n_total, 9) AS DECIMAL(18,9))
      AS ece_term
  FROM per CROSS JOIN tot
)
SELECT bin, n, round(conf, 6) AS mean_confidence,
  round(acc, 6) AS observed_rate,
  round(abs(acc - conf), 6) AS gap,
  CAST(round(CAST(SUM(ece_term) OVER () AS DOUBLE), 6) AS DOUBLE) AS ece,
  round(MAX(abs(acc - conf)) OVER (), 6) AS mce
FROM terms
""",
    tags=("eval", "llm", "quality"),
)
def eval_calibration_ece(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXPECTED CALIBRATION ERROR for the quality classifier — the
    third leg of model evaluation the registry was missing
    (agg_model_auc measures DISCRIMINATION, eval_ann_ndcg measures
    RANKING; this measures whether a predicted probability MEANS its
    number — Naeini et al. 2015, the reliability-diagram summary every
    score-gated curation pipeline should publish before thresholding
    on p): documents binned into {_ECE_BINS} equal-width probability
    buckets, per-bucket mean confidence vs observed label rate (label:
    lang = 'en', the deterministic stand-in outcome), the per-bucket
    reliability gap, and the n-weighted ECE plus worst-bucket MCE.

    Exactness: quality_prob is a 6-dp DECIMAL so bucket sums are
    exact; bin ids are exact floor arithmetic with the LEAST clamp at
    p = 1.0; each weighted gap snaps to a 9-dp DECIMAL before the
    order-free ECE sum. Plan shape: one map-only scoring scan (the
    text_classifier_score expression inline), one hash agg to the
    {_ECE_BINS}-row reliability frame, windows over that fixed-size
    frame. At 100 TB: one scan, ten rows — and since r11 the scoring
    scan is the _classifier_scored session artifact (scored once per
    session+sf, shared with text_classifier_score), so this entry's
    own cost is only the reliability machinery (VERDICT r10 #4: the
    embedded rescoring WAS the 24 s century cost)."""
    scored = _classifier_scored(spark, sf_dir).select(
        "p",
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("y"),
    )
    binned = scored.select(
        F.least(
            F.floor(F.col("p").cast("double") * _ECE_BINS).cast("bigint"),
            F.lit(_ECE_BINS - 1),
        ).alias("bin"),
        "p",
        "y",
    )
    per = binned.groupBy("bin").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        (F.sum("p").cast("double") / F.count(F.lit(1))).alias("conf"),
        (F.sum("y").cast("double") / F.count(F.lit(1))).alias("acc"),
    )
    tot = per.agg(F.sum("n").cast("bigint").alias("n_total"))
    terms = per.crossJoin(F.broadcast(tot)).select(
        "bin",
        "n",
        "conf",
        "acc",
        F.round(
            F.col("n") * F.abs(F.col("acc") - F.col("conf"))
            / F.col("n_total"),
            9,
        ).cast("decimal(18,9)").alias("ece_term"),
    )
    w_all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return terms.select(
        "bin",
        "n",
        F.round("conf", 6).alias("mean_confidence"),
        F.round("acc", 6).alias("observed_rate"),
        F.round(F.abs(F.col("acc") - F.col("conf")), 6).alias("gap"),
        F.round(F.sum("ece_term").over(w_all).cast("double"), 6).alias(
            "ece"
        ),
        F.round(
            F.max(F.abs(F.col("acc") - F.col("conf"))).over(w_all), 6
        ).alias("mce"),
    )


_PRC_BINS = 20  # score-threshold grid (step 0.05)


@register(
    "eval_pr_curve",
    oracle=f"""
WITH scored AS (
  SELECT
    CAST(round(1.0 / (1.0 + exp(-(
      list_sum(list_transform(string_split(text, ' '), t ->
        (CAST(('0x' || substr(md5(t), 1, 4)) AS INTEGER) % 200 - 100)
          / 100.0))
      / len(string_split(text, ' '))))), 6) AS DECIMAL(18,6)) AS p,
    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
  FROM documents WHERE len(string_split(text, ' ')) >= 1
), binned AS (
  SELECT LEAST(CAST(floor(CAST(p AS DOUBLE) * {_PRC_BINS}) AS BIGINT),
               {_PRC_BINS - 1}) AS bin, y
  FROM scored
), per AS (
  SELECT bin, CAST(COUNT(*) AS BIGINT) AS n,
    CAST(SUM(y) AS BIGINT) AS pos
  FROM binned GROUP BY bin
), cum AS (
  SELECT bin, n, pos,
    CAST(SUM(n) OVER (ORDER BY bin DESC
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS n_ge,
    CAST(SUM(pos) OVER (ORDER BY bin DESC
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS tp,
    CAST(SUM(pos) OVER () AS BIGINT) AS total_pos
  FROM per
)
SELECT round(CAST(bin AS DOUBLE) / {_PRC_BINS}, 6) AS threshold,
  n_ge, tp,
  round(CAST(tp AS DOUBLE) / n_ge, 6) AS precision_at,
  round(CASE WHEN total_pos = 0 THEN 0.0
        ELSE CAST(tp AS DOUBLE) / total_pos END, 6) AS recall_at,
  round(CASE WHEN tp = 0 THEN 0.0
        ELSE 2.0 * (CAST(tp AS DOUBLE) / n_ge)
             * (CAST(tp AS DOUBLE) / total_pos)
             / (CAST(tp AS DOUBLE) / n_ge
                + CAST(tp AS DOUBLE) / total_pos) END, 6) AS f1_at
FROM cum
""",
    tags=("eval", "llm", "quality"),
)
def eval_pr_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PRECISION-RECALL THRESHOLD SWEEP for the quality classifier —
    the operating-point picker that completes the model-eval triad's
    missing axis (agg_model_auc summarizes discrimination in one
    number; eval_calibration_ece checks probability meaning; a
    curation pipeline must still CHOOSE the gate threshold, and this
    is the table it chooses from): per score bucket (step
    1/{_PRC_BINS}), precision / recall / F1 of the rule "keep if
    p >= threshold", computed from a cumulative-from-the-top scan of
    the score histogram.

    Exactness: scores come from the shared _classifier_scored session
    artifact (6-dp DECIMAL — no rescoring pass, VERDICT r10 #4
    convention); bin ids are exact floor arithmetic with the LEAST
    clamp at p = 1.0; all cumulative quantities are INTEGER window
    sums over the {_PRC_BINS}-row histogram, so the only float math
    is the final per-row ratios (n_ge >= 1 for every OBSERVED bin by
    construction; tp = 0 and total_pos = 0 guarded identically on
    both engines). Only observed bins emit — empty buckets carry no
    operating point.

    Plan shape: one artifact scan, one hash agg to <= {_PRC_BINS}
    rows, windows over that fixed frame (unpartitioned windows
    allowlisted: the frame is threshold-grid-sized, never row-scale).
    At 100 TB: one scan, twenty rows."""
    scored = _classifier_scored(spark, sf_dir).select(
        "p", F.when(F.col("lang") == "en", 1).otherwise(0).alias("y")
    )
    per = (
        scored.select(
            F.least(
                F.floor(F.col("p").cast("double") * _PRC_BINS).cast(
                    "bigint"
                ),
                F.lit(_PRC_BINS - 1),
            ).alias("bin"),
            "y",
        )
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("y").cast("bigint").alias("pos"),
        )
    )
    w_top = (
        Window.orderBy(F.col("bin").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = per.select(
        "bin",
        F.sum("n").over(w_top).cast("bigint").alias("n_ge"),
        F.sum("pos").over(w_top).cast("bigint").alias("tp"),
        F.sum("pos").over(w_all).cast("bigint").alias("total_pos"),
    )
    prec = F.col("tp").cast("double") / F.col("n_ge")
    rec = F.col("tp").cast("double") / F.col("total_pos")
    return cum.select(
        F.round(F.col("bin").cast("double") / _PRC_BINS, 6).alias(
            "threshold"
        ),
        "n_ge",
        "tp",
        F.round(prec, 6).alias("precision_at"),
        F.round(
            F.when(F.col("total_pos") == 0, F.lit(0.0)).otherwise(rec), 6
        ).alias("recall_at"),
        F.round(
            F.when(F.col("tp") == 0, F.lit(0.0)).otherwise(
                2.0 * prec * rec / (prec + rec)
            ),
            6,
        ).alias("f1_at"),
    )


@register(
    "eval_cohens_kappa",
    oracle="""
WITH toks AS (
  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS token
  FROM documents
), scores AS (
  SELECT doc_id, lang,
    SUM(CASE WHEN token IN ('the', 'a') THEN 1 ELSE 0 END) AS en_hits,
    SUM(CASE WHEN token IN ('der', 'und') THEN 1 ELSE 0 END) AS de_hits
  FROM toks GROUP BY doc_id, lang
), pred AS (
  SELECT lang AS labeled,
    CASE WHEN en_hits >= de_hits AND en_hits > 0 THEN 'en'
         WHEN de_hits > 0 THEN 'de'
         ELSE 'unknown' END AS predicted
  FROM scores
), cells AS (
  SELECT labeled, predicted, CAST(COUNT(*) AS BIGINT) AS n
  FROM pred GROUP BY labeled, predicted
), nl AS (
  SELECT labeled AS cls, CAST(SUM(n) AS BIGINT) AS n_labeled
  FROM cells GROUP BY labeled
), np AS (
  SELECT predicted AS cls, CAST(SUM(n) AS BIGINT) AS n_predicted
  FROM cells GROUP BY predicted
), tot AS (
  SELECT CAST(SUM(n) AS BIGINT) AS n_total,
    CAST(SUM(CASE WHEN labeled = predicted THEN n ELSE 0 END) AS BIGINT)
      AS n_agree
  FROM cells
), pe_num AS (
  SELECT CAST(SUM(COALESCE(n_labeled, 0) * COALESCE(n_predicted, 0))
              AS BIGINT) AS pe_prod
  FROM nl FULL OUTER JOIN np USING (cls)
)
SELECT n_total, n_agree,
  round(CAST(n_agree AS DOUBLE) / n_total, 6) AS po,
  round(CAST(pe_prod AS DOUBLE) / n_total / n_total, 6) AS pe,
  round(CASE WHEN CAST(pe_prod AS DOUBLE) / n_total / n_total >= 1.0
        THEN 0.0
        ELSE (CAST(n_agree AS DOUBLE) / n_total
              - CAST(pe_prod AS DOUBLE) / n_total / n_total)
             / (1.0 - CAST(pe_prod AS DOUBLE) / n_total / n_total) END, 6)
    AS kappa
FROM tot CROSS JOIN pe_num
""",
    tags=("eval", "llm", "stats"),
)
def eval_cohens_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COHEN'S KAPPA between the language-ID heuristic and the stored
    labels — chance-corrected agreement (Cohen 1960), the one number
    eval_lang_confusion's matrix doesn't give you: raw accuracy
    (po) flatters any labeler on a skewed class mix, and kappa
    subtracts the agreement the margins would produce by chance
    (pe = sum of row-margin x column-margin products / N^2). This is
    the standard inter-annotator / model-vs-gold agreement statistic
    every labeling pipeline publishes before trusting weak labels.

    Exactness: the labeler is eval_lang_confusion's deterministic
    stopword predictor (same cells frame, so the two entries can
    never disagree about the matrix); po and pe are ratios of exact
    INTEGER sums (the margin cross-product accumulates bigints, never
    doubles); the degenerate pe = 1 case (single class on both sides)
    is guarded identically on both engines.

    Plan shape: one token-explode hash agg to per-doc scores, one agg
    to the |labels| x 3 cell frame, two margin aggs + one broadcast
    full-outer margin join over that domain-sized frame, one final
    1-row reduction. At 100 TB the corpus is tokenized once; all
    agreement math is domain-sized."""
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", "lang", F.explode(F.split("text", " ")).alias("token")
    )
    scores = toks.groupBy("doc_id", "lang").agg(
        F.sum(
            F.when(F.col("token").isin("the", "a"), 1).otherwise(0)
        ).alias("en_hits"),
        F.sum(
            F.when(F.col("token").isin("der", "und"), 1).otherwise(0)
        ).alias("de_hits"),
    )
    pred = scores.select(
        F.col("lang").alias("labeled"),
        F.when(
            (F.col("en_hits") >= F.col("de_hits")) & (F.col("en_hits") > 0),
            "en",
        )
        .when(F.col("de_hits") > 0, "de")
        .otherwise("unknown")
        .alias("predicted"),
    )
    cells = pred.groupBy("labeled", "predicted").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    nl = cells.groupBy(F.col("labeled").alias("cls")).agg(
        F.sum("n").cast("bigint").alias("n_labeled")
    )
    np_ = cells.groupBy(F.col("predicted").alias("cls")).agg(
        F.sum("n").cast("bigint").alias("n_predicted")
    )
    tot = cells.agg(
        F.sum("n").cast("bigint").alias("n_total"),
        F.sum(
            F.when(F.col("labeled") == F.col("predicted"), F.col("n"))
            .otherwise(0)
        )
        .cast("bigint")
        .alias("n_agree"),
    )
    pe_num = (
        nl.join(np_, "cls", "full_outer")
        .agg(
            F.sum(
                F.coalesce(F.col("n_labeled"), F.lit(0))
                * F.coalesce(F.col("n_predicted"), F.lit(0))
            )
            .cast("bigint")
            .alias("pe_prod")
        )
    )
    po = F.col("n_agree").cast("double") / F.col("n_total")
    pe = (
        F.col("pe_prod").cast("double")
        / F.col("n_total")
        / F.col("n_total")
    )
    return tot.crossJoin(F.broadcast(pe_num)).select(
        "n_total",
        "n_agree",
        F.round(po, 6).alias("po"),
        F.round(pe, 6).alias("pe"),
        F.round(
            F.when(pe >= 1.0, F.lit(0.0)).otherwise((po - pe) / (1.0 - pe)),
            6,
        ).alias("kappa"),
    )


@register(
    "eval_mcnemar_test",
    oracle="""
WITH toks AS (
  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS token
  FROM documents
), stopw AS (
  SELECT doc_id, lang,
    SUM(CASE WHEN token IN ('the', 'a') THEN 1 ELSE 0 END) AS en_hits,
    SUM(CASE WHEN token IN ('der', 'und') THEN 1 ELSE 0 END) AS de_hits
  FROM toks GROUP BY doc_id, lang
), clf AS (
  SELECT doc_id,
    CAST(round(1.0 / (1.0 + exp(-(
      list_sum(list_transform(string_split(text, ' '), t ->
        (CAST(('0x' || substr(md5(t), 1, 4)) AS INTEGER) % 200 - 100)
          / 100.0))
      / len(string_split(text, ' '))))), 6) AS DECIMAL(18,6)) AS p
  FROM documents WHERE len(string_split(text, ' ')) >= 1
), paired AS (
  SELECT
    CASE WHEN (s.en_hits >= s.de_hits AND s.en_hits > 0)
              = (s.lang = 'en') THEN 1 ELSE 0 END AS a_ok,
    CASE WHEN (CAST(c.p AS DOUBLE) >= 0.5)
              = (s.lang = 'en') THEN 1 ELSE 0 END AS b_ok
  FROM stopw s JOIN clf c ON s.doc_id = c.doc_id
), cells AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
    CAST(SUM(a_ok * b_ok) AS BIGINT) AS both_ok,
    CAST(SUM(a_ok * (1 - b_ok)) AS BIGINT) AS only_a,
    CAST(SUM((1 - a_ok) * b_ok) AS BIGINT) AS only_b,
    CAST(SUM((1 - a_ok) * (1 - b_ok)) AS BIGINT) AS both_wrong
  FROM paired
)
SELECT n, both_ok, only_a, only_b, both_wrong,
  round(CASE WHEN only_a + only_b = 0 THEN 0.0
        ELSE CAST((abs(only_a - only_b) - 1) AS DOUBLE)
             * (abs(only_a - only_b) - 1) / (only_a + only_b) END, 6)
    AS chi2_cc,
  CASE WHEN only_a + only_b = 0 THEN FALSE
       ELSE CAST((abs(only_a - only_b) - 1) AS DOUBLE)
            * (abs(only_a - only_b) - 1) / (only_a + only_b)
            > 3.841459 END AS significant
FROM cells
""",
    tags=("eval", "llm", "stats"),
)
def eval_mcnemar_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """McNEMAR'S PAIRED TEST between two labelers on the SAME
    documents — the statistically correct way to ask "is classifier B
    actually better than classifier A" (comparing two accuracies with
    an unpaired test wastes the pairing; McNemar 1947 conditions on
    the discordant pairs only): labeler A is the stopword lang-ID
    heuristic (eval_lang_confusion / eval_cohens_kappa's predictor),
    labeler B thresholds the shared classifier score at 0.5, both
    scored on the binary is-English task; the continuity-corrected
    chi-square (|b-c|-1)^2/(b+c) tests the null that both err equally.

    Exactness: both labelers are deterministic expressions; all five
    contingency cells are INTEGER sums; the chi-square is one
    fixed-form double expression over those integers with the b+c = 0
    degenerate guarded identically on both engines (no discordance =
    no evidence, chi2 0, not significant). The 3.841459 literal is
    the df=1 alpha=.05 critical value, shared textually.

    Plan shape: one token-explode hash agg (labeler A), one scan of
    the _classifier_scored session artifact (labeler B — scored once
    per session+sf), one doc_id equi-join, one 1-row reduction. At
    100 TB the corpus is tokenized once and scored never (the
    artifact already exists)."""
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", "lang", F.explode(F.split("text", " ")).alias("token")
    )
    stopw = toks.groupBy("doc_id", "lang").agg(
        F.sum(
            F.when(F.col("token").isin("the", "a"), 1).otherwise(0)
        ).alias("en_hits"),
        F.sum(
            F.when(F.col("token").isin("der", "und"), 1).otherwise(0)
        ).alias("de_hits"),
    )
    clf = _classifier_scored(spark, sf_dir).select("doc_id", "p")
    y = F.col("lang") == "en"
    a_pred = (F.col("en_hits") >= F.col("de_hits")) & (F.col("en_hits") > 0)
    b_pred = F.col("p").cast("double") >= 0.5
    paired = stopw.join(clf, "doc_id").select(
        F.when(a_pred == y, 1).otherwise(0).alias("a_ok"),
        F.when(b_pred == y, 1).otherwise(0).alias("b_ok"),
    )
    cells = paired.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("a_ok") * F.col("b_ok")).cast("bigint").alias("both_ok"),
        F.sum(F.col("a_ok") * (1 - F.col("b_ok")))
        .cast("bigint")
        .alias("only_a"),
        F.sum((1 - F.col("a_ok")) * F.col("b_ok"))
        .cast("bigint")
        .alias("only_b"),
        F.sum((1 - F.col("a_ok")) * (1 - F.col("b_ok")))
        .cast("bigint")
        .alias("both_wrong"),
    )
    d = F.abs(F.col("only_a") - F.col("only_b"))
    denom = F.col("only_a") + F.col("only_b")
    chi2 = (d - 1).cast("double") * (d - 1) / denom
    return cells.select(
        "n",
        "both_ok",
        "only_a",
        "only_b",
        "both_wrong",
        F.round(
            F.when(denom == 0, F.lit(0.0)).otherwise(chi2), 6
        ).alias("chi2_cc"),
        F.when(denom == 0, F.lit(False))
        .otherwise(chi2 > 3.841459)
        .alias("significant"),
    )
