"""Similarity search over embeddings (BASELINE.json north-star).

- vec_cosine_topk: exact brute-force top-k for a bounded query set —
  the correctness baseline. Scales as |Q|×|N|: fine for small Q at any
  corpus size (queries broadcast), wrong for all-pairs.
- vec_knn_label:   k-NN majority-label classification on top of it.
- vec_ann_lsh:     the scale path — random-hyperplane (sign) LSH:
  16-bit signatures from md5-derived pseudo-random planes, candidates
  share a signature band, exact re-rank inside buckets only. At 100 TB
  the bucket join replaces the brute-force cross product; recall vs
  the exact baseline is pinned in tests/test_llm.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from am_kinesis_pay_spark.registry import register
from am_kinesis_pay_spark.tables import load
from am_kinesis_pay_spark.llm.nputil import nan_to_neginf, unit_rows

N_QUERIES = 10  # query set: vec_id < 10
TOP_K = 5


def _dot(a: str, b: str):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def safe_sqrt_norm(d):
    """Zero-norm clamp for cosine divisors: a zero vector keeps norm 1.0
    (cosine 0 against everything) instead of a 0 divisor, which is an
    ANSI-mode DIVIDE_BY_ZERO crash on dirty data. The SQL oracles clamp
    identically via coalesce(sqrt(nullif(s, 0)), 1.0) — which also maps
    a NULL sum-of-squares (NULL/empty embedding) to 1.0, so the outer
    coalesce here mirrors that too: a NULL when-condition is not-true,
    falls to otherwise(sqrt(NULL)) = NULL, and the coalesce clamps it
    exactly like the oracle (ADVICE r5 + r6)."""
    return F.coalesce(
        F.when(d == F.lit(0.0), F.lit(1.0)).otherwise(F.sqrt(d)), F.lit(1.0)
    )


def _norms(emb: DataFrame) -> DataFrame:
    return emb.select(
        "vec_id",
        "label",
        "embedding",
        safe_sqrt_norm(_dot("embedding", "embedding")).alias("nrm"),
    )


_TOPK_ORACLE = f"""
WITH norms AS (
  SELECT vec_id, label, embedding,
    coalesce(sqrt(nullif(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), 0)), 1.0) AS nrm
  FROM embeddings
), scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, c.label AS neighbor_label,
    round(list_sum(list_transform(list_zip(q.embedding, c.embedding),
          p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))) / (q.nrm * c.nrm), 6) AS cosine
  FROM norms q JOIN norms c ON q.vec_id < {N_QUERIES} AND c.vec_id <> q.vec_id
), ranked AS (
  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
            ORDER BY cosine DESC, neighbor_id) AS INT) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, neighbor_label, cosine, rank
FROM ranked WHERE rank <= {TOP_K}
"""


@register("vec_cosine_topk", oracle=_TOPK_ORACLE, tags=("llm", "similarity"))
def vec_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-k cosine neighbors for the query set (vec_id < 10).
    The query side is broadcast, so the corpus side streams through
    map tasks — no shuffle of the big side; ranking ties broken by
    neighbor_id for cross-engine determinism (cosine rounded to 6 dp
    BEFORE ranking so both engines rank identical keys). r12 OPT
    (guide §8): served from the _exact_pairs_artifact — the identical
    scoring pipeline, built once per session instead of per call; the
    inline SQL oracle still spells the full dot pass and hash-checks
    the artifact's contents."""
    return _exact_topk_full(spark, sf_dir, TOP_K).select(
        "query_id", "neighbor_id", "neighbor_label", "cosine", "rank"
    )


_KNN_ORACLE = f"""
WITH norms AS (
  SELECT vec_id, label, embedding,
    coalesce(sqrt(nullif(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), 0)), 1.0) AS nrm
  FROM embeddings
), scored AS (
  SELECT q.vec_id AS query_id, q.label AS true_label,
    c.vec_id AS neighbor_id, c.label AS neighbor_label,
    round(list_sum(list_transform(list_zip(q.embedding, c.embedding),
          p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))) / (q.nrm * c.nrm), 6) AS cosine
  FROM norms q JOIN norms c ON q.vec_id < {N_QUERIES} AND c.vec_id <> q.vec_id
), ranked AS (
  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
            ORDER BY cosine DESC, neighbor_id) AS INT) AS rank
  FROM scored
), votes AS (
  SELECT query_id, true_label, neighbor_label, COUNT(*) AS n_votes
  FROM ranked WHERE rank <= {TOP_K}
  GROUP BY query_id, true_label, neighbor_label
), best AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
            ORDER BY n_votes DESC, neighbor_label) AS vr
  FROM votes
)
SELECT query_id, true_label, neighbor_label AS predicted_label, n_votes
FROM best WHERE vr = 1
"""


@register("vec_knn_label", oracle=_KNN_ORACLE, tags=("llm", "similarity"))
def vec_knn_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN majority-label vote over the exact top-k (ties → smallest
    label, deterministic on both engines). r12 OPT (guide §8): the
    top-k neighbor list comes from the _exact_pairs_artifact instead
    of re-running the corpus dot pass; the query's own true_label is a
    10-row broadcast lookup on the raw table."""
    emb = load(spark, sf_dir, "embeddings")
    truth = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("true_label"),
    )
    votes = (
        _exact_topk_full(spark, sf_dir, TOP_K)
        .join(F.broadcast(truth), "query_id")
        .groupBy("query_id", "true_label", "neighbor_label")
        .agg(F.count(F.lit(1)).alias("n_votes"))
    )
    wv = W.partitionBy("query_id").orderBy(
        F.col("n_votes").desc(), F.col("neighbor_label")
    )
    return (
        votes.withColumn("vr", F.row_number().over(wv))
        .filter(F.col("vr") == 1)
        .select(
            "query_id",
            "true_label",
            F.col("neighbor_label").alias("predicted_label"),
            "n_votes",
        )
    )


N_PLANES = 16
_EMB_DIM = 64
IVF_K = 16  # coarse-quantizer cells
IVF_NPROBE = 4  # cells searched per query


_IVF_ORACLE = """
WITH ordered AS (
  SELECT vec_id, embedding FROM embeddings
  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
  LIMIT {IVF_K}
), cent AS (
  SELECT embedding AS cemb,
    coalesce(sqrt(nullif(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), 0)), 1.0) AS cnrm,
    CAST(ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS INT) AS cell
  FROM ordered
), norms AS (
  SELECT vec_id, embedding,
    coalesce(sqrt(nullif(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), 0)), 1.0) AS nrm
  FROM embeddings
), cellsims AS (
  SELECT n.vec_id, c.cell,
    round(list_sum(list_transform(list_zip(n.embedding, c.cemb),
          p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))) / (n.nrm * c.cnrm), 6) AS csim
  FROM norms n CROSS JOIN cent c
), assigned AS (
  SELECT vec_id, cell FROM (
    SELECT vec_id, cell,
      ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY csim DESC, cell) AS arn
    FROM cellsims) t
  WHERE arn = 1
), probes AS (
  SELECT vec_id AS query_id, cell FROM (
    SELECT vec_id, cell,
      ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY csim DESC, cell) AS prn
    FROM cellsims WHERE vec_id < {N_QUERIES}) t
  WHERE prn <= {IVF_NPROBE}
), cand AS (
  SELECT DISTINCT p.query_id, a.vec_id AS neighbor_id
  FROM probes p JOIN assigned a USING (cell)
  WHERE a.vec_id <> p.query_id
), scored AS (
  SELECT cand.query_id, cand.neighbor_id,
    round(list_sum(list_transform(list_zip(q.embedding, c.embedding),
          p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))) / (q.nrm * c.nrm), 6) AS cosine
  FROM cand
  JOIN norms q ON q.vec_id = cand.query_id
  JOIN norms c ON c.vec_id = cand.neighbor_id
), ranked AS (
  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
            ORDER BY cosine DESC, neighbor_id) AS INT) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, cosine, rank FROM ranked WHERE rank <= {TOP_K}
""".format(
    IVF_K=IVF_K, N_QUERIES=N_QUERIES, IVF_NPROBE=IVF_NPROBE, TOP_K=TOP_K
)


@register("vec_ann_ivf", oracle=_IVF_ORACLE, tags=("llm", "similarity", "ann"))
def vec_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN via IVF (inverted-file index): a deterministic coarse
    quantizer (the IVF_K corpus vectors with the smallest
    md5(vec_id) — a hash-order uniform sample, no RNG), each corpus
    vector assigned to its nearest centroid cell, queries probe their
    IVF_NPROBE nearest cells and re-rank exactly inside them.
    Fully oracle-checked: the quantizer, assignment, probe, and
    re-rank stages are all replicated in DuckDB SQL; centroid sims
    round to 6 dp BEFORE argmax/top-nprobe (ties → lowest cell) so
    both engines pick identical cells.

    Scale shape: ONLY the K centroids ever touch the driver —
    selected by a distributed top-K (each scan task keeps at most K
    candidates), collected as K×dim floats, and broadcast. Assignment
    is one map pass over the corpus (blocked matmul vs the K
    centroids); the probe join shuffles only (query, cell) pairs —
    candidates are |corpus| × nprobe / K on average, a 4/16 = 25%
    scan here and arbitrarily sharper with larger K at real scale.
    No O(corpus) materialization anywhere."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    emb = load(spark, sf_dir, "embeddings")
    cent_rows = (
        emb.select("vec_id", "embedding")
        .orderBy(F.md5(F.col("vec_id").cast("string")), F.col("vec_id"))
        .limit(IVF_K)
        .collect()
    )
    if not cent_rows:
        return spark.createDataFrame(
            [], "query_id long, neighbor_id long, cosine double, rank int"
        )
    cent_raw = np.stack([np.asarray(r.embedding, dtype=np.float64) for r in cent_rows])
    cent = unit_rows(cent_raw)
    bc = spark.sparkContext.broadcast(cent)

    assign_schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("cell", T.IntegerType()),
        ]
    )

    def assign(pdfs):
        cent_b = bc.value
        for pdf in pdfs:
            if pdf.empty:
                continue
            a = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            a_n = unit_rows(a)
            # round to 6 dp BEFORE argmax (ties -> lowest cell) so the
            # picked cell is bit-identical to the SQL oracle's
            sims = nan_to_neginf(np.round(a_n @ cent_b.T, 6))
            cells = sims.argmax(axis=1)
            yield pd.DataFrame(
                {"vec_id": pdf["vec_id"], "cell": cells.astype("int32")}
            )

    assigned = emb.select("vec_id", "embedding").mapInPandas(
        assign, assign_schema
    )

    probe_schema = T.StructType(
        [
            T.StructField("query_id", T.LongType()),
            T.StructField("cell", T.IntegerType()),
        ]
    )

    def probes(pdfs):
        cent_b = bc.value
        for pdf in pdfs:
            if pdf.empty:
                continue
            a = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            a_n = unit_rows(a)
            # same 6 dp pre-round; stable sort breaks ties by lowest
            # cell, matching ORDER BY csim DESC, cell in the oracle
            sims = nan_to_neginf(np.round(a_n @ cent_b.T, 6))
            top = np.argsort(-sims, axis=1, kind="stable")[:, :IVF_NPROBE]
            qids = np.repeat(pdf["vec_id"].to_numpy(), IVF_NPROBE)
            yield pd.DataFrame(
                {"query_id": qids, "cell": top.ravel().astype("int32")}
            )

    q_emb = emb.filter(F.col("vec_id") < N_QUERIES)
    q_probes = q_emb.select("vec_id", "embedding").mapInPandas(
        probes, probe_schema
    )

    norms = _norms(emb)
    cand = (
        q_probes.join(assigned, "cell")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    q = norms.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qe"),
        F.col("nrm").alias("qn"),
    )
    c = norms.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("ce"),
        F.col("nrm").alias("cn"),
    )
    scored = (
        cand.join(F.broadcast(q), "query_id")
        .join(c, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(_dot("qe", "ce") / (F.col("qn") * F.col("cn")), 6).alias(
                "cosine"
            ),
        )
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def _ivf_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF centroid table as a session artifact: (cell, embedding) for
    the IVF_K deterministic md5-order centroids — the ~2 KB frame a
    production index stores next to the assignments."""
    from am_kinesis_pay_spark.paths import (
        session_artifact as _materialize,
        sf_tag as _sf_tag,
    )

    def build():
        emb = load(spark, sf_dir, "embeddings")
        w = W.orderBy(F.md5(F.col("vec_id").cast("string")), "vec_id")
        return (
            emb.select("vec_id", "embedding")
            .orderBy(F.md5(F.col("vec_id").cast("string")), F.col("vec_id"))
            .limit(IVF_K)
            .select(
                (F.row_number().over(w) - 1).cast("int").alias("cell"),
                "embedding",
            )
        )

    return _materialize(
        spark,
        f"akps_ivf_cent_{_sf_tag(sf_dir)}",
        build,
        "cell int, embedding array<float>",
    )


def _ivf_assignments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF inverted file as a session artifact: (vec_id, cell) for the
    whole corpus — built once per (session, sf) by the same broadcast
    matmul assignment pass vec_ann_ivf runs inline; daily ingest
    appends to this table instead of recomputing it."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    from am_kinesis_pay_spark.paths import (
        session_artifact as _materialize,
        sf_tag as _sf_tag,
    )

    def build():
        emb = load(spark, sf_dir, "embeddings")
        cent_rows = _ivf_centroids(spark, sf_dir).orderBy("cell").collect()
        if not cent_rows:
            return spark.createDataFrame([], "vec_id bigint, cell int")
        cent_raw = np.stack(
            [np.asarray(r.embedding, dtype=np.float64) for r in cent_rows]
        )
        cent = unit_rows(cent_raw)
        bc = spark.sparkContext.broadcast(cent)

        schema = T.StructType(
            [
                T.StructField("vec_id", T.LongType()),
                T.StructField("cell", T.IntegerType()),
            ]
        )

        def assign(pdfs):
            cent_b = bc.value
            for pdf in pdfs:
                if pdf.empty:
                    continue
                a = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
                a_n = unit_rows(a)
                sims = nan_to_neginf(np.round(a_n @ cent_b.T, 6))
                yield pd.DataFrame(
                    {
                        "vec_id": pdf["vec_id"],
                        "cell": sims.argmax(axis=1).astype("int32"),
                    }
                )

        return emb.select("vec_id", "embedding").mapInPandas(assign, schema)

    return _materialize(
        spark,
        f"akps_ivf_assign_{_sf_tag(sf_dir)}",
        build,
        "vec_id bigint, cell int",
    )


@register(
    "vec_ann_ivf_indexed",
    oracle=_IVF_ORACLE,
    tags=("llm", "similarity", "ann", "incremental"),
)
def vec_ann_ivf_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """vec_ann_ivf with the index PERSISTED: centroids and the
    inverted file (vec_id -> cell) are session artifacts
    (_ivf_centroids/_ivf_assignments) built once per (session, sf) and
    probed by every search — the build-once/search-many shape a
    production ANN service runs, where the index is a maintained table
    and queries pay only probe + re-rank. Identical semantics and the
    IDENTICAL DuckDB oracle as vec_ann_ivf (the index changes where
    the assignment lives, never what it is); at 100 TB the assignments
    table is bucketed by cell so a probe reads only its cells' buckets,
    and daily ingest appends new vectors' assignments instead of
    recomputing the corpus."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    emb = load(spark, sf_dir, "embeddings")
    cent_rows = _ivf_centroids(spark, sf_dir).orderBy("cell").collect()
    if not cent_rows:
        return spark.createDataFrame(
            [], "query_id long, neighbor_id long, cosine double, rank int"
        )
    cent_raw = np.stack(
        [np.asarray(r.embedding, dtype=np.float64) for r in cent_rows]
    )
    cent = unit_rows(cent_raw)
    bc = spark.sparkContext.broadcast(cent)
    assigned = _ivf_assignments(spark, sf_dir)

    probe_schema = T.StructType(
        [
            T.StructField("query_id", T.LongType()),
            T.StructField("cell", T.IntegerType()),
        ]
    )

    def probes(pdfs):
        cent_b = bc.value
        for pdf in pdfs:
            if pdf.empty:
                continue
            a = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            a_n = unit_rows(a)
            sims = nan_to_neginf(np.round(a_n @ cent_b.T, 6))
            top = np.argsort(-sims, axis=1, kind="stable")[:, :IVF_NPROBE]
            qids = np.repeat(pdf["vec_id"].to_numpy(), IVF_NPROBE)
            yield pd.DataFrame(
                {"query_id": qids, "cell": top.ravel().astype("int32")}
            )

    q_probes = (
        emb.filter(F.col("vec_id") < N_QUERIES)
        .select("vec_id", "embedding")
        .mapInPandas(probes, probe_schema)
    )
    norms = _norms(emb)
    cand = (
        q_probes.join(assigned, "cell")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    q = norms.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qe"),
        F.col("nrm").alias("qn"),
    )
    c = norms.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("ce"),
        F.col("nrm").alias("cn"),
    )
    scored = (
        cand.join(F.broadcast(q), "query_id")
        .join(c, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(_dot("qe", "ce") / (F.col("qn") * F.col("cn")), 6).alias(
                "cosine"
            ),
        )
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def _plane_weights() -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes: weight(p, d) derives
    from md5(f"{p}:{d}") — no RNG, identical across runs/engines.
    Computed once driver-side (N_PLANES × dim constants), not per row."""
    import hashlib

    return [
        [
            int(hashlib.md5(f"{p}:{d}".encode()).hexdigest()[:6], 16)
            / float(16**6)
            - 0.5
            for d in range(_EMB_DIM)
        ]
        for p in range(N_PLANES)
    ]


def lsh_band_cols(sig_col: str = "sig") -> list:
    """The 4x4-bit band keys of a 16-bit signature, as tagged strings
    ('b{i}:{value}') so different bands can never collide in a join."""
    return [
        F.concat(
            F.lit(f"b{i}:"),
            F.shiftright(F.col(sig_col), 4 * i)
            .bitwiseAND(F.lit(0xF))
            .cast("string"),
        )
        for i in range(4)
    ]


def _lsh_signature(emb_col: str = "embedding") -> F.Column:
    """Random-hyperplane signature: bit p = sign of dot(embedding,
    plane_p). One Arrow-batched matmul against the 16×64 plane matrix —
    a literal-array Catalyst fold per plane works but costs seconds of
    codegen compile for a 1000-literal expression tree; the vectorized
    kernel is both the faster and the 100 TB shape (BLAS per batch)."""
    return _get_sig_udf()(F.col(emb_col))


_SIG_UDF_CACHE: list = []


def _get_sig_udf():
    """Build the signature pandas UDF once per process — deferred
    because return-type parsing needs an active SparkSession."""
    if _SIG_UDF_CACHE:
        return _SIG_UDF_CACHE[0]
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    planes_t = np.array(_plane_weights()).T  # dim × N_PLANES
    bit_weights = (1 << np.arange(N_PLANES)).astype(np.int64)

    def sig_kernel(emb):
        if emb.empty:
            return pd.Series([], dtype="int64")
        mat = np.stack(emb.to_numpy()).astype(np.float64)
        bits = (mat @ planes_t) > 0
        return pd.Series(bits @ bit_weights)

    sig_kernel.__annotations__ = {"emb": pd.Series, "return": pd.Series}
    udf = pandas_udf("long")(sig_kernel)
    _SIG_UDF_CACHE.append(udf)
    return udf


def _planes_values_sql() -> str:
    """The 16x64 plane weights as a SQL VALUES body — repr() round-trips
    float64 exactly, so DuckDB parses bit-identical doubles. Shared by
    every oracle that replicates the sign-LSH sketch."""
    return ",\n    ".join(
        "({p}, [{w}])".format(p=p, w=", ".join(repr(x) for x in row))
        for p, row in enumerate(_plane_weights())
    )


_SIG_SQL_CTES = """planes (p, wts) AS (
  VALUES
    {planes}
), norms AS (
  SELECT vec_id, embedding,
    coalesce(sqrt(nullif(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), 0)), 1.0) AS nrm
  FROM {src}
), dots AS (
  SELECT n.vec_id, pl.p,
    list_sum(list_transform(list_zip(n.embedding, pl.wts),
          z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE))) AS d
  FROM norms n CROSS JOIN planes pl
), sigs AS (
  SELECT vec_id,
    CAST(SUM(CASE WHEN d > 0 THEN CAST(1 AS BIGINT) << p ELSE 0 END) AS BIGINT) AS sig
  FROM dots GROUP BY vec_id
), banded AS (
  SELECT vec_id, 'b' || CAST(i AS VARCHAR) || ':'
    || CAST((sig >> (4 * i)) & 15 AS VARCHAR) AS band
  FROM sigs CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS i) bands
)"""


def sig_sql_ctes(src: str = "embeddings") -> str:
    """Signature/band CTE block (planes→norms→dots→sigs→banded) for
    DuckDB oracles of sign-LSH pipelines; ``src`` swaps the vector
    source (e.g. a dup-collapsed representative CTE)."""
    return _SIG_SQL_CTES.format(planes=_planes_values_sql(), src=src)


def _lsh_oracle() -> str:
    """DuckDB replica of the full LSH pipeline. The md5-derived plane
    weights are baked in as literal lists (repr() round-trips float64
    exactly), so signature bits, bands, candidate generation, and the
    exact re-rank are all oracle-checked — the sketch is deterministic
    BY CONSTRUCTION, which is what makes an exact cross-engine check
    possible at all (cf. the HLL entries, where it is not)."""
    planes = _planes_values_sql()
    return """
WITH planes (p, wts) AS (
  VALUES
    {planes}
), norms AS (
  SELECT vec_id, embedding,
    coalesce(sqrt(nullif(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), 0)), 1.0) AS nrm
  FROM embeddings
), dots AS (
  SELECT n.vec_id, pl.p,
    list_sum(list_transform(list_zip(n.embedding, pl.wts),
          z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE))) AS d
  FROM norms n CROSS JOIN planes pl
), sigs AS (
  SELECT vec_id,
    CAST(SUM(CASE WHEN d > 0 THEN CAST(1 AS BIGINT) << p ELSE 0 END) AS BIGINT) AS sig
  FROM dots GROUP BY vec_id
), banded AS (
  SELECT vec_id, 'b' || CAST(i AS VARCHAR) || ':'
    || CAST((sig >> (4 * i)) & 15 AS VARCHAR) AS band
  FROM sigs CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS i) bands
), cand AS (
  SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
  FROM banded q JOIN banded c USING (band)
  WHERE q.vec_id < {N_QUERIES} AND c.vec_id <> q.vec_id
), scored AS (
  SELECT cand.query_id, cand.neighbor_id,
    round(list_sum(list_transform(list_zip(q.embedding, c.embedding),
          pr -> CAST(pr[1] AS DOUBLE) * CAST(pr[2] AS DOUBLE))) / (q.nrm * c.nrm), 6) AS cosine
  FROM cand
  JOIN norms q ON q.vec_id = cand.query_id
  JOIN norms c ON c.vec_id = cand.neighbor_id
), ranked AS (
  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
            ORDER BY cosine DESC, neighbor_id) AS INT) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, cosine, rank FROM ranked WHERE rank <= {TOP_K}
""".format(planes=planes, N_QUERIES=N_QUERIES, TOP_K=TOP_K)


def _lsh_topk_artifact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The sign-LSH index's served top-k list as a session artifact
    (r12 OPT, guide §8 — the _classifier_scored convention: the served
    ANN results are the shared structure the ranking-quality audit
    grades): vec_ann_lsh returns it and eval_ann_ndcg references it
    TWICE per plan (DCG join + MRR join), each reference previously
    re-running the full signature/band-join/re-rank pipeline."""
    from am_kinesis_pay_spark.paths import session_artifact, sf_tag

    return session_artifact(
        spark,
        f"akps_ann_lsh_topk_{sf_tag(sf_dir)}",
        lambda: _lsh_topk_build(spark, sf_dir),
        "query_id bigint, neighbor_id bigint, cosine double, rank int",
    )


@register("vec_ann_lsh", oracle=_lsh_oracle(), tags=("llm", "similarity", "ann"))
def vec_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN via sign-LSH: 16-bit signatures from md5-derived planes,
    candidates = corpus vectors sharing any 4-bit band with the query,
    exact cosine re-rank within candidates only. Fully oracle-checked:
    the plane weights are embedded in the DuckDB oracle as literals,
    so signatures, bands, and the re-rank replicate exactly (sign
    flips would need |dot| within float ulp of 0 — not observed at
    any SF). Recall@k vs the exact baseline is asserted in
    tests/test_llm.py. At 100 TB: signatures are one map pass, the
    band join shuffles signatures not vectors, and re-rank touches only
    bucket-mates. r12 OPT: served from the _lsh_topk_artifact (built
    once per session; eval_ann_ndcg probes the same artifact twice)."""
    return _lsh_topk_artifact(spark, sf_dir).select(
        "query_id", "neighbor_id", "cosine", "rank"
    )


def _lsh_topk_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    norms = _norms(emb).withColumn("sig", _lsh_signature())
    # 4 bands of 4 bits: a candidate shares ANY band with the query.
    # Narrower bands trade precision for recall — the right side of the
    # tradeoff when the re-rank step is exact anyway.
    band_cols = lsh_band_cols()
    banded = norms.select(
        "vec_id",
        "label",
        "embedding",
        "nrm",
        F.explode(F.array(*band_cols)).alias("band"),
    )
    q = banded.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qe"),
        F.col("nrm").alias("qn"),
        "band",
    )
    c = banded.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("ce"),
        F.col("nrm").alias("cn"),
        "band",
    )
    cand = (
        q.join(c, "band")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", "qe", "qn", "ce", "cn")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = cand.select(
        "query_id",
        "neighbor_id",
        F.round(_dot("qe", "ce") / (F.col("qn") * F.col("cn")), 6).alias("cosine"),
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


@register("emb_label_centroids", oracle=None, tags=("llm", "vector"))
def emb_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid of the embedding column — the building block
    for class prototypes, cluster seeding, and drift monitoring.
    posexplode → per-(label, dim) mean → re-assemble the vector with an
    order-preserving sort — fully distributed (no collect), one shuffle
    keyed by (label, dim) so the reduce side has label_count × dim
    cells regardless of corpus size. Rows-only driver check: cross-row
    float means are accumulation-order dependent, so exact SQL-oracle
    hashing is impossible by construction; numeric parity vs numpy is
    pinned in tests/test_llm.py instead."""
    emb = load(spark, sf_dir, "embeddings")
    ex = emb.select("label", F.posexplode("embedding").alias("pos", "x"))
    per_dim = ex.groupBy("label", "pos").agg(
        F.avg(F.col("x").cast("double")).alias("m"),
        F.count(F.lit(1)).alias("c"),
    )
    return per_dim.groupBy("label").agg(
        F.max("c").cast("bigint").alias("n_vecs"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "m"))), lambda s: s["m"]
        ).alias("centroid"),
    )


_KMEANS_K = 10
_KMEANS_ITERS = 2


def _sq_dist(a: str, b: str):
    return F.aggregate(
        F.zip_with(
            a, b, lambda x, y: (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double"))
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


@register("emb_kmeans", oracle=None, tags=("llm", "vector", "iterative"))
def emb_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed k-means (2 Lloyd iterations, deterministic seeds =
    vec_id < k) — the iterative-algorithm representative: per
    iteration, broadcast the k×dim centroid table, assign each vector
    to its nearest centroid with an argmin over a broadcast join
    (never a shuffle of the corpus side), then recompute centroids by
    per-(cluster, dim) mean. Driver state is k vectors per iteration —
    independent of corpus size — which is exactly how MLlib's KMeans
    structures the loop. Output: per-cluster size + within-cluster
    inertia. Rows-only (iterative float means are not SQL-expressible);
    tests/test_llm.py pins seeds→assignment determinism and that
    inertia is non-increasing across the iterations."""
    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    cent = (
        emb.filter(F.col("vec_id") < _KMEANS_K)
        .select(F.col("vec_id").alias("cid"), F.col("embedding").alias("ce"))
    )
    assigned = None
    for _ in range(_KMEANS_ITERS):
        pairs = emb.crossJoin(F.broadcast(cent)).select(
            "vec_id",
            "embedding",
            "cid",
            _sq_dist("embedding", "ce").alias("d"),
        )
        assigned = pairs.groupBy("vec_id", "embedding").agg(
            F.min(F.struct("d", "cid")).alias("best")
        ).select(
            "vec_id", "embedding", F.col("best.cid").alias("cid"), F.col("best.d").alias("d")
        )
        per_dim = (
            assigned.select("cid", F.posexplode("embedding").alias("pos", "x"))
            .groupBy("cid", "pos")
            .agg(F.avg(F.col("x").cast("double")).alias("m"))
        )
        cent = per_dim.groupBy("cid").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "m"))),
                lambda s: s["m"].cast("float"),
            ).alias("ce")
        )
    return assigned.groupBy("cid").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_members"),
        F.round(F.sum("d"), 6).alias("inertia"),
    )


PQ_M = 8  # subspaces (64-dim embedding -> 8 dims each)
PQ_K = 16  # centroids per subspace codebook
PQ_TRAIN = 256  # training-sample size (vec_id order, deterministic)


def _pq_train(mat, m: int = PQ_M, k: int = PQ_K, iters: int = 2):
    """Train per-subspace codebooks: deterministic seeds (every
    n/k-th training vector in vec_id order — no RNG) + 2 Lloyd
    iterations per subspace. Returns (m, k, d/m) float64. Driver-side
    on a fixed-size sample: cost is O(PQ_TRAIN * k) regardless of
    corpus size."""
    import numpy as np

    d = mat.shape[1]
    dsub = d // m
    books = []
    for s in range(m):
        sub = mat[:, s * dsub : (s + 1) * dsub]
        step = max(len(sub) // k, 1)
        cent = sub[::step][:k].copy()
        for _ in range(iters):
            d2 = ((sub[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for j in range(len(cent)):
                pts = sub[assign == j]
                if len(pts):
                    cent[j] = pts.mean(axis=0)
        books.append(cent)
    return np.stack(books)


_EXACT_PAIRS_KMAX = 10  # max k any recall-audit consumer asks for


def _exact_pairs_artifact(spark, sf_dir: str) -> DataFrame:
    """Exact-cosine top-k ground truth as a session artifact — built
    once at k={_EXACT_PAIRS_KMAX} with neighbor_label, 6-dp cosine and
    rank columns; every consumer filters on rank and projects what it
    needs. 10-query broadcast, one corpus map pass, per-query top-k
    reduce; the corpus side is spread() before the nested-loop scoring
    pass (guide §2.5 — a 1-split fixture scan put the whole dot pass
    on one core; no-op at production split counts).

    r12 OPT (guide §8): vec_ann_pq (k=10) and vec_ann_ivf_pq (k=5)
    re-ran this exact pipeline per call; r12 extends the artifact with
    label+cosine so vec_cosine_topk, vec_knn_label and eval_ann_ndcg's
    three truth references stop re-running the interpreted 64-dim dot
    pass too. At 100 TB an exact ground-truth sample for recall/order
    audits is a maintained table, not a per-query recompute."""
    from am_kinesis_pay_spark.paths import session_artifact, sf_tag
    from am_kinesis_pay_spark.tables import spread

    def build() -> DataFrame:
        norms = _norms(load(spark, sf_dir, "embeddings"))
        q = norms.filter(F.col("vec_id") < N_QUERIES).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("qe"),
            F.col("nrm").alias("qn"),
        )
        c = spread(norms).select(
            F.col("vec_id").alias("neighbor_id"),
            F.col("label").alias("neighbor_label"),
            F.col("embedding").alias("ce"),
            F.col("nrm").alias("cn"),
        )
        scored = (
            F.broadcast(q)
            .join(c, F.col("neighbor_id") != F.col("query_id"))
            .select(
                "query_id",
                "neighbor_id",
                "neighbor_label",
                F.round(
                    _dot("qe", "ce") / (F.col("qn") * F.col("cn")), 6
                ).alias("cosine"),
            )
        )
        w = W.partitionBy("query_id").orderBy(
            F.col("cosine").desc(), F.col("neighbor_id")
        )
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= _EXACT_PAIRS_KMAX)
            .select(
                "query_id", "neighbor_id", "neighbor_label", "cosine", "rank"
            )
        )

    return session_artifact(
        spark,
        f"akps_ann_exact_pairs_{sf_tag(sf_dir)}",
        build,
        "query_id bigint, neighbor_id bigint, neighbor_label int,"
        " cosine double, rank int",
    )


def _exact_topk_full(spark, sf_dir: str, k: int) -> DataFrame:
    """Full exact top-k rows (neighbor_label + 6-dp cosine + rank)
    from the artifact (r12 OPT: vec_cosine_topk, vec_knn_label and
    eval_ann_ndcg's truth branch each re-ran the corpus dot pass per
    call — and eval_ann_ndcg referenced it THREE times in one plan)."""
    if k > _EXACT_PAIRS_KMAX:
        raise ValueError(f"k={k} exceeds artifact kmax={_EXACT_PAIRS_KMAX}")
    return _exact_pairs_artifact(spark, sf_dir).filter(F.col("rank") <= k)


def _exact_topk_pairs(spark, sf_dir: str, k: int) -> DataFrame:
    """(query_id, neighbor_id) projection of the exact ground truth —
    the PQ family's recall-audit probe (VERDICT r8 #5)."""
    return _exact_topk_full(spark, sf_dir, k).select(
        "query_id", "neighbor_id"
    )


def _attach_recall(res: DataFrame, exact_pairs: DataFrame, col: str) -> DataFrame:
    """Per-query recall vs the exact ground truth, attached as a
    constant column on every result row (the within_tol pattern —
    VERDICT r8 #5: every rows-only sketch entry carries a tested
    inline accuracy proof): recall = |ANN top-k ∩ exact top-k| /
    |exact top-k|. Both per-query frames are |queries|-row broadcasts."""
    marked = res.join(
        F.broadcast(exact_pairs.withColumn("_hit", F.lit(1))),
        ["query_id", "neighbor_id"],
        "left",
    )
    hits = marked.groupBy("query_id").agg(
        F.sum(F.coalesce(F.col("_hit"), F.lit(0))).alias("_n_hit")
    )
    denom = exact_pairs.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("_n_exact")
    )
    rec = hits.join(denom, "query_id").select(
        "query_id",
        F.round(F.col("_n_hit") / F.col("_n_exact"), 3).alias(col),
    )
    return res.join(F.broadcast(rec), "query_id")


@register("vec_ann_pq", oracle=None, tags=("llm", "similarity", "ann"))
def vec_ann_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN via product quantization (the memory-bound scale path):
    each normalized corpus vector is compressed to PQ_M 4-bit codes
    (64 floats -> 8 bytes, a 32x reduction), and query-to-corpus
    similarity is an asymmetric-distance (ADC) table lookup — the
    query stays exact, only the corpus side is quantized. Rows-only
    driver check; ADC math + recall vs exact top-k pinned in
    tests/test_llm.py, and every row carries an inline recall_at_10
    audit column (this query's PQ top-10 vs the exact-cosine top-10,
    the within_tol discipline) so even a rows-only sample shows
    estimator accuracy — the audit costs one extra broadcast-join
    corpus pass, the same price vec_cosine_topk already pays.

    Scale shape — the piece IVF/LSH lack: ONLY the codebooks
    (m*k*dsub floats, ~2 KB) and the 10 query ADC tables are
    broadcast; the corpus never leaves the executors, and the scored
    stream is top-k-reduced per query. 100 TB of raw vectors becomes
    ~3 TB of codes that fit in cluster RAM; compose with the IVF
    coarse quantizer (vec_ann_ivf) for IVF-PQ, the standard
    billion-scale layout."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    emb = load(spark, sf_dir, "embeddings")
    out_schema = (
        "query_id long, neighbor_id long, adc_cosine double, rank int,"
        " recall_at_10 double"
    )
    train = (
        emb.orderBy("vec_id").limit(PQ_TRAIN).select("embedding").toPandas()
    )
    if train.empty:
        return spark.createDataFrame([], out_schema)
    tmat = np.stack(train["embedding"].to_numpy()).astype(np.float64)
    tmat = unit_rows(tmat)
    books = _pq_train(tmat)  # (m, k, dsub)

    qpdf = (
        emb.filter(F.col("vec_id") < N_QUERIES)
        .select("vec_id", "embedding")
        .toPandas()
    )
    qmat = np.stack(qpdf["embedding"].to_numpy()).astype(np.float64)
    qmat = unit_rows(qmat)
    m, k, dsub = books.shape
    # ADC tables: tabs[q, s, j] = <query_q subspace s, codeword j>
    tabs = np.einsum("qsd,sjd->qsj", qmat.reshape(len(qmat), m, dsub), books)
    qids = qpdf["vec_id"].to_numpy()
    bc = spark.sparkContext.broadcast((books, tabs, qids))

    def score(pdfs):
        books_b, tabs_b, qids_b = bc.value
        mm, kk, dd = books_b.shape
        srange = np.arange(mm)
        for pdf in pdfs:
            if pdf.empty:
                continue
            a = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            a = unit_rows(a)
            sub = a.reshape(len(a), mm, dd)
            # encode: nearest codeword per subspace (B, m)
            d2 = ((sub[:, :, None, :] - books_b[None, :, :, :]) ** 2).sum(
                axis=3
            )
            codes = d2.argmin(axis=2)
            nid = pdf["vec_id"].to_numpy()
            for qi, qid in enumerate(qids_b):
                adc = tabs_b[qi][srange[None, :], codes].sum(axis=1)
                keep = nid != qid
                yield pd.DataFrame(
                    {
                        "query_id": np.full(keep.sum(), qid, dtype=np.int64),
                        "neighbor_id": nid[keep],
                        "adc_cosine": np.round(adc[keep], 6),
                    }
                )

    scored = emb.select("vec_id", "embedding").mapInPandas(
        score,
        T.StructType(
            [
                T.StructField("query_id", T.LongType()),
                T.StructField("neighbor_id", T.LongType()),
                T.StructField("adc_cosine", T.DoubleType()),
            ]
        ),
    )
    w = W.partitionBy("query_id").orderBy(
        F.desc("adc_cosine"), F.asc("neighbor_id")
    )
    topk = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 10)
        .select("query_id", "neighbor_id", "adc_cosine", "rank")
    )
    exact = _exact_topk_pairs(spark, sf_dir, 10)
    return _attach_recall(topk, exact, "recall_at_10").select(
        "query_id", "neighbor_id", "adc_cosine", "rank", "recall_at_10"
    )


PCA_ITERS = 2  # power-iteration rounds (deterministic all-ones start)


@register("emb_pca_power", oracle=None, tags=("llm", "similarity", "pca"))
def emb_pca_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal component by distributed power iteration — the
    dimensionality-reduction primitive (whitening, drift detection,
    spectral init) done Spark-shaped: each round is (1) a map-only
    per-row centered projection d_i = (x_i - mu)·v via zip_with +
    aggregate, (2) one posexplode shuffle keyed by dimension summing
    (x_ij - mu_j)·d_i. Only DIM-sized reductions (the mean, and v
    between rounds) ever reach the driver — never rows, so the pattern
    is corpus-size-independent: 100 TB of vectors costs ITERS scans +
    ITERS dim-keyed shuffles whose reduce side is DIM cells. Rows-only
    check: cross-row float sums are accumulation-order dependent;
    numpy parity + variance-capture monotonicity pinned in
    tests/test_llm.py."""
    import math

    emb = load(spark, sf_dir, "embeddings")
    ex = emb.select(F.posexplode("embedding").alias("pos", "x"))
    mu_rows = (
        ex.groupBy("pos").agg(F.avg(F.col("x").cast("double")).alias("m"))
        .collect()
    )
    if not mu_rows:
        return spark.createDataFrame(
            [], "pos int, loading double, mean double"
        )
    mu = [r.m for r in sorted(mu_rows, key=lambda r: r.pos)]
    dim = len(mu)
    v = [1.0 / math.sqrt(dim)] * dim

    def arr(vals):
        return F.array(*[F.lit(float(x)) for x in vals])

    for _ in range(PCA_ITERS):
        centered = F.zip_with("embedding", arr(mu), lambda x, m: x - m)
        dot = F.aggregate(
            F.zip_with(centered, arr(v), lambda c, w: c * w),
            F.lit(0.0),
            lambda s, x: s + x,
        )
        s_rows = (
            emb.select(centered.alias("c"), dot.alias("d"))
            .select(F.posexplode("c").alias("pos", "cx"), "d")
            .groupBy("pos")
            .agg(F.sum(F.col("cx") * F.col("d")).alias("s"))
            .collect()
        )
        s = [r.s for r in sorted(s_rows, key=lambda r: r.pos)]
        norm = math.sqrt(sum(x * x for x in s)) or 1.0
        v = [x / norm for x in s]

    out = [(i, round(v[i], 8), round(mu[i], 8)) for i in range(dim)]
    return spark.createDataFrame(out, "pos int, loading double, mean double")


_MRL_DIM = 16  # retained prefix dims (of 64) — 4x compression

_MRL_ORACLE = f"""
WITH pref AS (
  SELECT vec_id, embedding[1:{_MRL_DIM}] AS e FROM embeddings
),
full_v AS (
  SELECT vec_id, embedding AS e FROM embeddings
),
rank_of AS (
  SELECT 'full' AS kind, q.vec_id AS query_id, c.vec_id AS neighbor_id,
    ROW_NUMBER() OVER (
      PARTITION BY q.vec_id
      ORDER BY round(
        list_sum(list_transform(list_zip(q.e, c.e),
                 p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
        / (coalesce(sqrt(nullif(list_sum(list_transform(q.e, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), 0)), 1.0)
           * coalesce(sqrt(nullif(list_sum(list_transform(c.e, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), 0)), 1.0)), 6)
        DESC, c.vec_id
    ) AS rank
  FROM full_v q JOIN full_v c ON q.vec_id < {N_QUERIES} AND c.vec_id <> q.vec_id
  UNION ALL
  SELECT 'pref', q.vec_id, c.vec_id,
    ROW_NUMBER() OVER (
      PARTITION BY q.vec_id
      ORDER BY round(
        list_sum(list_transform(list_zip(q.e, c.e),
                 p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
        / (coalesce(sqrt(nullif(list_sum(list_transform(q.e, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), 0)), 1.0)
           * coalesce(sqrt(nullif(list_sum(list_transform(c.e, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), 0)), 1.0)), 6)
        DESC, c.vec_id
    ) AS rank
  FROM pref q JOIN pref c ON q.vec_id < {N_QUERIES} AND c.vec_id <> q.vec_id
),
topk AS (SELECT * FROM rank_of WHERE rank <= {TOP_K})
SELECT f.query_id,
  COUNT(p.neighbor_id) AS n_overlap,
  CAST(COUNT(p.neighbor_id) AS DOUBLE) / {TOP_K} AS recall_at_k
FROM (SELECT * FROM topk WHERE kind = 'full') f
LEFT JOIN (SELECT * FROM topk WHERE kind = 'pref') p
  ON f.query_id = p.query_id AND f.neighbor_id = p.neighbor_id
GROUP BY f.query_id
"""


@register("vec_matryoshka_recall", oracle=_MRL_ORACLE, tags=("llm", "similarity"))
def vec_matryoshka_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka-style dimension truncation audit: top-k neighbors
    computed on the FIRST 16 of 64 dims (4x cheaper dot products, 4x
    smaller index) versus the full-dimension ground truth, reported as
    recall@k per query. This is the measurement that decides whether a
    prefix-truncated index is good enough before committing to it at
    corpus scale — the same two-tier shape as vec_ann_pq (cheap scan,
    exact semantics audited). Both rankings share the broadcast-query /
    streamed-corpus plan of vec_cosine_topk; the recall join runs on
    the k x |Q| toplists only. On this synthetic corpus recall is LOW
    (~0-0.2) and that is the correct finding: random embeddings have
    no information concentrated in prefix dims — truncation is only
    safe for Matryoshka-trained models, and this audit is the gate
    that tells you which case you are in."""
    emb = load(spark, sf_dir, "embeddings")

    def topk(df: DataFrame, col):
        n = df.select(
            "vec_id",
            col.alias("e"),
        ).withColumn("nrm", safe_sqrt_norm(_dot("e", "e")))
        q = n.filter(F.col("vec_id") < N_QUERIES).select(
            F.col("vec_id").alias("query_id"),
            F.col("e").alias("qe"),
            F.col("nrm").alias("qn"),
        )
        c = n.select(
            F.col("vec_id").alias("neighbor_id"),
            F.col("e").alias("ce"),
            F.col("nrm").alias("cn"),
        )
        scored = (
            F.broadcast(q)
            .join(c, F.col("neighbor_id") != F.col("query_id"))
            .select(
                "query_id",
                "neighbor_id",
                F.round(_dot("qe", "ce") / (F.col("qn") * F.col("cn")), 6).alias(
                    "cos"
                ),
            )
        )
        w = W.partitionBy("query_id").orderBy(
            F.col("cos").desc(), F.col("neighbor_id")
        )
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= TOP_K)
            .select("query_id", "neighbor_id")
        )

    full = topk(emb, F.col("embedding"))
    pref = topk(emb, F.slice("embedding", 1, _MRL_DIM)).withColumnRenamed(
        "neighbor_id", "p_neighbor_id"
    )
    return (
        full.join(
            pref,
            (full.query_id == pref.query_id)
            & (F.col("neighbor_id") == F.col("p_neighbor_id")),
            "left",
        )
        .drop(pref.query_id)
        .groupBy("query_id")
        .agg(
            F.count("p_neighbor_id").alias("n_overlap"),
            (F.count("p_neighbor_id").cast("double") / TOP_K).alias(
                "recall_at_k"
            ),
        )
    )


@register(
    "emb_label_centroids_long",
    oracle="""
WITH flat AS (
  SELECT label, generate_subscripts(embedding, 1) AS i, unnest(embedding) AS x
  FROM embeddings
)
SELECT label, CAST(i - 1 AS BIGINT) AS dim,
  round(CAST(SUM(CAST(CAST(x AS DOUBLE) AS DECIMAL(38,18))) AS DOUBLE)
        / COUNT(*), 9) AS mean_component
FROM flat
GROUP BY label, i
""",
    tags=("llm", "vectors"),
)
def emb_label_centroids_long(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid in TALL form (label, dim, mean component) —
    the fully oracle-checked companion to emb_label_centroids' array
    output (rows-only): component means go through exact DECIMAL sums
    (compat.py convention), so both engines agree bit-for-bit despite
    float accumulation-order differences. Same plan shape: posexplode
    → one hash aggregation on (label, dim); the reduce side is
    labels x dims rows regardless of corpus size."""
    emb = load(spark, sf_dir, "embeddings")
    return (
        emb.select("label", F.posexplode("embedding").alias("dim", "x"))
        .groupBy("label", F.col("dim").cast("bigint").alias("dim"))
        .agg(
            F.round(
                F.sum(
                    F.col("x").cast("double").cast("decimal(38,18)")
                ).cast("double")
                / F.count(F.lit(1)),
                9,
            ).alias("mean_component")
        )
    )


@register(
    "vec_quantize_int8",
    oracle="""
WITH scaled AS (
  SELECT vec_id, embedding,
    CAST(list_min(embedding) AS DOUBLE) AS mn,
    (CAST(list_max(embedding) AS DOUBLE)
      - CAST(list_min(embedding) AS DOUBLE)) / 255.0 AS sc
  FROM embeddings
)
SELECT vec_id,
  CASE WHEN sc = 0 THEN list_transform(embedding, x -> 0)
       ELSE list_transform(embedding,
         x -> CAST(floor((CAST(x AS DOUBLE) - mn) / sc + 0.5) AS INTEGER))
  END AS codes,
  round(CASE WHEN sc = 0 THEN 0.0
       ELSE list_max(list_transform(embedding,
         x -> abs(mn + floor((CAST(x AS DOUBLE) - mn) / sc + 0.5) * sc
                  - CAST(x AS DOUBLE))))
  END, 9) AS max_abs_err
FROM scaled
""",
    tags=("llm", "ann", "quantize"),
)
def vec_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar int8 quantization of the embedding corpus — the storage/
    serving compression step beside vec_ann_pq's codebook compression:
    each vector is rescaled to its own [min, max] range and every
    component snapped to a 0..255 code (4x smaller than float32, and
    the form int8-SIMD distance kernels consume). Emits the codes plus
    the per-vector max reconstruction error so a pipeline can gate on
    quantization loss. Everything is per-row arithmetic on the vector
    itself (map-only, zero shuffles, scan-bound at any corpus size);
    floor(v + 0.5) is used instead of round() so both engines apply
    the identical IEEE-double op chain — min/max of floats are exact,
    and every subsequent op is deterministic double arithmetic, which
    is why even the reconstruction error is oracle-exact to 9 dp.
    Constant vectors (range 0) take the all-zero code path."""
    emb = load(spark, sf_dir, "embeddings")
    mnd = F.array_min("embedding").cast("double")
    sc = (F.array_max("embedding").cast("double") - mnd) / F.lit(255.0)
    base = emb.select("vec_id", "embedding", mnd.alias("mn"), sc.alias("sc"))

    def code(x):
        return F.floor(
            (x.cast("double") - F.col("mn")) / F.col("sc") + F.lit(0.5)
        )

    codes = F.when(
        F.col("sc") == 0,
        F.transform("embedding", lambda x: F.lit(0)),
    ).otherwise(
        F.transform("embedding", lambda x: code(x).cast("int"))
    )
    err = F.when(F.col("sc") == 0, F.lit(0.0)).otherwise(
        F.array_max(
            F.transform(
                "embedding",
                lambda x: F.abs(
                    F.col("mn") + code(x) * F.col("sc") - x.cast("double")
                ),
            )
        )
    )
    return base.select(
        "vec_id",
        codes.alias("codes"),
        F.round(err, 9).alias("max_abs_err"),
    )


@register("vec_ann_ivf_pq", oracle=None, tags=("llm", "similarity", "ann"))
def vec_ann_ivf_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ — the billion-scale ANN layout (the FAISS IVFADC
    composition): vec_ann_ivf's coarse quantizer bounds WHICH corpus
    cells a query scans (nprobe/K of the data), and vec_ann_pq's
    product quantization bounds WHAT a scanned row costs (8-byte codes
    + ADC table lookups instead of 64-float dot products). Rows-only
    driver check (PQ codebook training is iterative float accumulation
    — order-dependent, no exact SQL oracle can exist); the full
    pipeline is re-derived from scratch in numpy and matched exactly
    in tests/test_llm.py, recall vs the exact top-k pinned alongside,
    and every row carries an inline recall_at_5 audit column (probed
    ADC top-5 vs exact-cosine top-5 — the within_tol discipline,
    VERDICT r8 #5). Recall here is bounded by the nprobe/K scan rate
    on uniform-random fixtures, which the audit column makes visible
    instead of hiding.

    Scale shape: driver/broadcast state is the K centroids, the
    m*k*dsub codebooks (~2 KB), and the |queries| ADC tables — all
    corpus-size-independent. ONE map pass over the corpus emits (cell,
    codes) per vector — assignment and encoding share the scan. The
    probe join shuffles candidates by cell (nprobe/K of the corpus),
    and candidates carry only their 8 int codes into ADC scoring —
    the raw embedding column is never shuffled at all, which is the
    whole IVF-PQ bargain: at 100 TB of vectors the shuffled bytes are
    ~1/32 of the LSH/IVF exact re-rank paths. Cited shapes:
    vec_ann_ivf (llm/similarity.py:246) + vec_ann_pq (:710)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    emb = load(spark, sf_dir, "embeddings")
    out_schema = (
        "query_id long, neighbor_id long, adc_cosine double, rank int,"
        f" recall_at_{TOP_K} double"
    )
    # one bounded driver pull where three were (r12 OPT, guide §5 /
    # VERDICT r11 #4): the md5-ordered centroid seed, the vec_id-ordered
    # PQ training sample and the fixed query set are three tiny subsets
    # of the same scan — union them with a branch tag and collect ONCE
    # (statusTracker: 1 job where 3 were); each branch keeps its own
    # Spark-side sort+limit, and Python re-sorts by the carried keys so
    # the selected sets and their orders are byte-identical
    mkey = F.md5(F.col("vec_id").cast("string"))
    null_k = F.lit(None).cast("string").alias("k")
    b_cent = (
        emb.select(
            F.lit(0).alias("which"), "vec_id", mkey.alias("k"), "embedding"
        )
        .orderBy("k", "vec_id")
        .limit(IVF_K)
    )
    b_train = (
        emb.select(F.lit(1).alias("which"), "vec_id", null_k, "embedding")
        .orderBy("vec_id")
        .limit(PQ_TRAIN)
    )
    b_query = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.lit(2).alias("which"), "vec_id", null_k, "embedding"
    )
    pulled = b_cent.unionByName(b_train).unionByName(b_query).collect()
    cent_rows = sorted(
        (r for r in pulled if r.which == 0), key=lambda r: (r.k, r.vec_id)
    )
    if not cent_rows:
        return spark.createDataFrame([], out_schema)
    cent_raw = np.stack(
        [np.asarray(r.embedding, dtype=np.float64) for r in cent_rows]
    )
    cent = unit_rows(cent_raw)

    train_rows = sorted(
        (r for r in pulled if r.which == 1), key=lambda r: r.vec_id
    )
    tmat = np.stack(
        [np.asarray(r.embedding, dtype=np.float64) for r in train_rows]
    )
    tmat = unit_rows(tmat)
    books = _pq_train(tmat)  # (m, k, dsub)
    m, k, dsub = books.shape

    # queries are a bounded fixed set: probes + ADC tables driver-side
    q_rows = sorted(
        (r for r in pulled if r.which == 2), key=lambda r: r.vec_id
    )
    if not q_rows:
        return spark.createDataFrame([], out_schema)
    qmat = np.stack(
        [np.asarray(r.embedding, dtype=np.float64) for r in q_rows]
    )
    qmat = unit_rows(qmat)
    qids = np.array([r.vec_id for r in q_rows], dtype=np.int64)
    # 6 dp pre-round + stable sort: identical cell picks to vec_ann_ivf
    qsims = np.round(qmat @ cent.T, 6)
    qprobe = np.argsort(-qsims, axis=1, kind="stable")[:, :IVF_NPROBE]
    probes_df = spark.createDataFrame(
        [
            (int(qids[i]), int(c))
            for i in range(len(qids))
            for c in qprobe[i]
        ],
        "query_id long, cell int",
    )
    tabs = np.einsum("qsd,sjd->qsj", qmat.reshape(len(qmat), m, dsub), books)
    bc = spark.sparkContext.broadcast((cent, books, tabs, qids))

    def encode(pdfs):
        cent_b, books_b, _, _ = bc.value
        mm, kk, dd = books_b.shape
        for pdf in pdfs:
            if pdf.empty:
                continue
            a = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            a_n = unit_rows(a)
            cells = np.round(a_n @ cent_b.T, 6).argmax(axis=1)
            sub = a_n.reshape(len(a_n), mm, dd)
            d2 = ((sub[:, :, None, :] - books_b[None, :, :, :]) ** 2).sum(
                axis=3
            )
            codes = d2.argmin(axis=2)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"],
                    "cell": cells.astype("int32"),
                    "codes": list(codes.astype("int32")),
                }
            )

    assigned = emb.select("vec_id", "embedding").mapInPandas(
        encode,
        T.StructType(
            [
                T.StructField("vec_id", T.LongType()),
                T.StructField("cell", T.IntegerType()),
                T.StructField("codes", T.ArrayType(T.IntegerType())),
            ]
        ),
    )
    cand = (
        F.broadcast(probes_df)
        .join(assigned, "cell")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"), "codes")
    )

    def adc_score(pdfs):
        _, books_b, tabs_b, qids_b = bc.value
        mm = books_b.shape[0]
        srange = np.arange(mm)
        qindex = {int(q): i for i, q in enumerate(qids_b)}
        for pdf in pdfs:
            if pdf.empty:
                continue
            codes = np.stack(pdf["codes"].to_numpy()).astype(np.int64)
            qi = pdf["query_id"].map(qindex).to_numpy()
            adc = tabs_b[qi[:, None], srange[None, :], codes].sum(axis=1)
            yield pd.DataFrame(
                {
                    "query_id": pdf["query_id"],
                    "neighbor_id": pdf["neighbor_id"],
                    "adc_cosine": np.round(adc, 6),
                }
            )

    scored = cand.mapInPandas(
        adc_score,
        T.StructType(
            [
                T.StructField("query_id", T.LongType()),
                T.StructField("neighbor_id", T.LongType()),
                T.StructField("adc_cosine", T.DoubleType()),
            ]
        ),
    )
    w = W.partitionBy("query_id").orderBy(
        F.desc("adc_cosine"), F.asc("neighbor_id")
    )
    topk = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "adc_cosine", "rank")
    )
    exact = _exact_topk_pairs(spark, sf_dir, TOP_K)
    return _attach_recall(topk, exact, f"recall_at_{TOP_K}").select(
        "query_id",
        "neighbor_id",
        "adc_cosine",
        "rank",
        f"recall_at_{TOP_K}",
    )


_TRIPLET_ORACLE = f"""
WITH norms AS (
  SELECT vec_id, label, embedding,
    coalesce(sqrt(nullif(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), 0)), 1.0) AS nrm
  FROM embeddings
), scored AS (
  SELECT q.vec_id AS anchor_id, q.label AS anchor_label,
    c.vec_id AS cand_id, c.label AS cand_label,
    CASE WHEN c.label = q.label THEN 1 ELSE 0 END AS same_label,
    round(list_sum(list_transform(list_zip(q.embedding, c.embedding),
          p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))) / (q.nrm * c.nrm), 6) AS cosine
  FROM norms q JOIN norms c ON q.vec_id < {N_QUERIES} AND c.vec_id <> q.vec_id
), best AS (
  SELECT * FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY anchor_id, same_label
              ORDER BY cosine DESC, cand_id) AS rn
    FROM scored) t
  WHERE rn = 1
)
SELECT p.anchor_id, p.anchor_label,
  p.cand_id AS positive_id, p.cosine AS pos_cosine,
  n.cand_id AS negative_id, n.cand_label AS negative_label,
  n.cosine AS neg_cosine,
  round(p.cosine - n.cosine, 6) AS margin
FROM best p JOIN best n
  ON p.anchor_id = n.anchor_id AND p.same_label = 1 AND n.same_label = 0
"""


@register("emb_triplet_mine", oracle=_TRIPLET_ORACLE, tags=("llm", "similarity"))
def emb_triplet_mine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-triplet mining for metric-learning / contrastive training
    data (the FaceNet/CLIP batch-construction primitive): for each
    anchor, the hardest POSITIVE (most-similar same-label vector — the
    pair the model must keep together) and the hardest NEGATIVE
    (most-similar different-label vector — the impostor it must push
    away), plus the margin between them. Anchors whose margin is small
    or negative are exactly the training triplets worth sampling.

    Plan shape: identical scan economics to ``vec_cosine_topk`` — the
    bounded anchor set broadcasts, the corpus streams map-side, and
    BOTH extremes come from ONE window pass partitioned by (anchor,
    same_label) instead of two separate joins; the final positive x
    negative pairing joins two 1-row-per-anchor frames. At 100 TB,
    swap the exact scan for the IVF/PQ candidate generation
    (vec_ann_ivf_pq) and mine within probed cells — the standard
    approximate-hard-negative pipeline; cosines round to 6 dp before
    ranking (repo convention) so both engines pick identical
    triplets."""
    emb = load(spark, sf_dir, "embeddings")
    norms = _norms(emb)
    q = norms.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("anchor_id"),
        F.col("label").alias("anchor_label"),
        F.col("embedding").alias("qe"),
        F.col("nrm").alias("qn"),
    )
    c = norms.select(
        F.col("vec_id").alias("cand_id"),
        F.col("label").alias("cand_label"),
        F.col("embedding").alias("ce"),
        F.col("nrm").alias("cn"),
    )
    scored = (
        F.broadcast(q)
        .join(c, F.col("cand_id") != F.col("anchor_id"))
        .select(
            "anchor_id",
            "anchor_label",
            "cand_id",
            "cand_label",
            F.when(F.col("cand_label") == F.col("anchor_label"), 1)
            .otherwise(0)
            .alias("same_label"),
            F.round(_dot("qe", "ce") / (F.col("qn") * F.col("cn")), 6).alias(
                "cosine"
            ),
        )
    )
    w = W.partitionBy("anchor_id", "same_label").orderBy(
        F.desc("cosine"), F.asc("cand_id")
    )
    best = scored.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") == 1
    )
    pos = best.filter(F.col("same_label") == 1).select(
        "anchor_id",
        "anchor_label",
        F.col("cand_id").alias("positive_id"),
        F.col("cosine").alias("pos_cosine"),
    )
    neg = best.filter(F.col("same_label") == 0).select(
        "anchor_id",
        F.col("cand_id").alias("negative_id"),
        F.col("cand_label").alias("negative_label"),
        F.col("cosine").alias("neg_cosine"),
    )
    return pos.join(neg, "anchor_id").select(
        "anchor_id",
        "anchor_label",
        "positive_id",
        "pos_cosine",
        "negative_id",
        "negative_label",
        "neg_cosine",
        F.round(F.col("pos_cosine") - F.col("neg_cosine"), 6).alias("margin"),
    )


_RRF_K = 60  # the standard reciprocal-rank-fusion constant


_HYBRID_RRF_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
), shingles AS (
  SELECT DISTINCT doc_id, concat_ws(' ', t[i+1], t[i+2], t[i+3]) AS shingle
  FROM (SELECT doc_id, t, unnest(range(0, len(t) - 2)) AS i
        FROM toks WHERE len(t) >= 3)
), sizes AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n FROM shingles GROUP BY doc_id
), cand AS (
  SELECT q.doc_id AS query_id, c.doc_id AS cand_id, COUNT(*) AS n_common
  FROM shingles q JOIN shingles c
    ON q.shingle = c.shingle AND q.doc_id < {N_QUERIES}
   AND c.doc_id <> q.doc_id
  GROUP BY q.doc_id, c.doc_id
), norms AS (
  SELECT vec_id, embedding,
    coalesce(sqrt(nullif(list_sum(list_transform(embedding,
         x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), 0)), 1.0) AS nrm
  FROM embeddings
), scored AS (
  SELECT cand.query_id, cand.cand_id,
    round(CAST(cand.n_common AS DOUBLE)
          / (sq.n + sc.n - cand.n_common), 6) AS jaccard,
    round(list_sum(list_transform(list_zip(nq.embedding, nc.embedding),
          p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
          / (nq.nrm * nc.nrm), 6) AS cosine
  FROM cand
  JOIN sizes sq ON sq.doc_id = cand.query_id
  JOIN sizes sc ON sc.doc_id = cand.cand_id
  JOIN norms nq ON nq.vec_id = cand.query_id
  JOIN norms nc ON nc.vec_id = cand.cand_id
), ranked AS (
  SELECT query_id, cand_id,
    CAST(ROW_NUMBER() OVER (PARTITION BY query_id
         ORDER BY jaccard DESC, cand_id) AS INT) AS r_lex,
    CAST(ROW_NUMBER() OVER (PARTITION BY query_id
         ORDER BY cosine DESC, cand_id) AS INT) AS r_dense
  FROM scored
), fused AS (
  SELECT query_id, cand_id, r_lex, r_dense,
    round(1.0 / ({_RRF_K} + r_lex) + 1.0 / ({_RRF_K} + r_dense), 9) AS rrf
  FROM ranked
)
SELECT query_id, cand_id, r_lex, r_dense, rrf, rank FROM (
  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
            ORDER BY rrf DESC, cand_id) AS INT) AS rank
  FROM fused) t
WHERE rank <= {TOP_K}
"""


@register(
    "pipeline_hybrid_rrf",
    oracle=_HYBRID_RRF_ORACLE,
    tags=("llm", "similarity", "pipeline"),
)
def pipeline_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval with reciprocal-rank fusion (Cormack et al.)
    in the retrieve-then-rerank shape production stacks ship: an
    INVERTED-INDEX candidate stage (docs sharing >= 1 three-token
    shingle with the query — the BM25-family first-stage retriever),
    then BOTH signals score that candidate set — lexical = exact
    shingle Jaccard from the overlap counts the index join already
    produced, dense = embedding cosine fetched by two id equi-joins
    (documents ⋈ embeddings are 1:1 by id) — and the fused score
    1/(60+r_lex) + 1/(60+r_dense) re-ranks. Scoreless fusion is
    immune to the two signals' incomparable scales, which is why RRF
    beats score mixing in practice. Zero-overlap documents never
    enter: their RRF contribution beyond the candidate depth is the
    same constant for every such doc, so they cannot crack a top-k
    that any shingle-sharing candidate occupies.

    Plan shape: candidates come ONLY from the shingle equi-join
    (ids-only rows through the shuffle: query_id, cand_id, then one
    partial-aggregated overlap count) — there is no theta join and no
    per-pair string work anywhere; sizes and embeddings join back by
    id AFTER the candidate set is bounded. Both rank windows share
    one query_id shuffle (two sorts, same partitioning), and the
    fused top-k rides the same partitioning again. At 100 TB the
    dense-recall path (high-cosine docs with zero lexical overlap) is
    restored by unioning vec_ann_ivf_pq candidates into the same
    scored frame before the windows; ranks are integers, so the fused
    score is float-exact on both engines (1/(60+r) summed in fixed
    order, rounded 9 dp)."""
    from am_kinesis_pay_spark.llm.dedup import _shingles

    docs = load(spark, sf_dir, "documents")
    sh = _shingles(docs)
    sizes = sh.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    q_sh = sh.filter(F.col("doc_id") < N_QUERIES).select(
        F.col("doc_id").alias("query_id"), "shingle"
    )
    c_sh = sh.select(F.col("doc_id").alias("cand_id"), "shingle")
    # the bounded query-side shingle set broadcasts; the corpus posting
    # stream probes it map-side, so the only shuffle carrying pair rows
    # is the partial-aggregated overlap count
    cand = (
        F.broadcast(q_sh)
        .join(c_sh, "shingle")
        .filter(F.col("cand_id") != F.col("query_id"))
        .groupBy("query_id", "cand_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_common"))
    )

    norms = _norms(load(spark, sf_dir, "embeddings"))
    scored = (
        cand.join(
            sizes.select(F.col("doc_id").alias("query_id"), F.col("n").alias("q_n")),
            "query_id",
        )
        .join(
            sizes.select(F.col("doc_id").alias("cand_id"), F.col("n").alias("c_n")),
            "cand_id",
        )
        .join(
            norms.select(
                F.col("vec_id").alias("query_id"),
                F.col("embedding").alias("qe"),
                F.col("nrm").alias("qn"),
            ),
            "query_id",
        )
        .join(
            norms.select(
                F.col("vec_id").alias("cand_id"),
                F.col("embedding").alias("ce"),
                F.col("nrm").alias("cn"),
            ),
            "cand_id",
        )
        .select(
            "query_id",
            "cand_id",
            F.round(
                F.col("n_common").cast("double")
                / (F.col("q_n") + F.col("c_n") - F.col("n_common")),
                6,
            ).alias("jaccard"),
            F.round(_dot("qe", "ce") / (F.col("qn") * F.col("cn")), 6).alias(
                "cosine"
            ),
        )
    )
    w_lex = W.partitionBy("query_id").orderBy(F.desc("jaccard"), F.asc("cand_id"))
    w_d = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("cand_id"))
    ranked = scored.select(
        "query_id",
        "cand_id",
        F.row_number().over(w_lex).cast("int").alias("r_lex"),
        F.row_number().over(w_d).cast("int").alias("r_dense"),
    )
    fused = ranked.select(
        "query_id",
        "cand_id",
        "r_lex",
        "r_dense",
        F.round(
            1.0 / (_RRF_K + F.col("r_lex")) + 1.0 / (_RRF_K + F.col("r_dense")),
            9,
        ).alias("rrf"),
    )
    w_f = W.partitionBy("query_id").orderBy(F.desc("rrf"), F.asc("cand_id"))
    return (
        fused.withColumn("rank", F.row_number().over(w_f).cast("int"))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "cand_id", "r_lex", "r_dense", "rrf", "rank")
    )


# --- Graph ANN (NSW-style greedy beam over a bucketed k-NN graph) ------

_NSW_DEG = 8      # out-degree of the neighbor graph
_NSW_BEAM = 16    # beam width per hop
_NSW_HOPS = 3     # fixed hop count (unrolled in the SQL oracle)
_NSW_GCAP = 256   # per-bucket cap during graph construction (md5 order)


def _nsw_oracle() -> str:
    """DuckDB replica of the FULL graph-ANN pipeline — bucketed k-NN
    graph construction and the 3-hop greedy beam search unrolled as
    CTE chains. Like _lsh_oracle, everything is deterministic by
    construction (md5 planes, 6-dp pre-round, id tie-breaks), which is
    what makes a graph index exactly oracle-checkable at all."""
    cos_q = (
        "round(list_sum(list_transform(list_zip(q.qe, n.embedding), "
        "pr -> CAST(pr[1] AS DOUBLE) * CAST(pr[2] AS DOUBLE))) "
        "/ (q.qn * n.nrm), 6)"
    )
    hops = []
    prev = "beam0"
    for hop in range(1, _NSW_HOPS + 1):
        hops.append(f""", cand{hop} AS (
  SELECT DISTINCT query_id, node FROM (
    SELECT query_id, node FROM {prev}
    UNION ALL
    SELECT b.query_id, e.dst AS node FROM {prev} b JOIN edges e ON e.src = b.node
  ) u WHERE node <> query_id
), scored{hop} AS (
  SELECT c.query_id, c.node, {cos_q} AS cosine
  FROM cand{hop} c
  JOIN queries q ON q.query_id = c.query_id
  JOIN norms n ON n.vec_id = c.node
), beam{hop} AS (
  SELECT query_id, node, cosine FROM (
    SELECT query_id, node, cosine,
      ROW_NUMBER() OVER (PARTITION BY query_id
                         ORDER BY cosine DESC, node) AS rn
    FROM scored{hop}) b
  WHERE rn <= {_NSW_BEAM}
)""")
        prev = f"beam{hop}"
    return f"""
WITH {sig_sql_ctes()}, gbuckets AS (
  SELECT vec_id, band FROM (
    SELECT vec_id, band,
      ROW_NUMBER() OVER (PARTITION BY band
                         ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rn
    FROM banded) t
  WHERE rn <= {_NSW_GCAP}
), gpairs AS (
  SELECT DISTINCT a.vec_id AS src, b.vec_id AS dst
  FROM gbuckets a JOIN gbuckets b ON a.band = b.band
  WHERE a.vec_id <> b.vec_id
), gscored AS (
  SELECT g.src, g.dst,
    round(list_sum(list_transform(list_zip(sa.embedding, sb.embedding),
          pr -> CAST(pr[1] AS DOUBLE) * CAST(pr[2] AS DOUBLE)))
          / (sa.nrm * sb.nrm), 6) AS cosine
  FROM gpairs g
  JOIN norms sa ON sa.vec_id = g.src
  JOIN norms sb ON sb.vec_id = g.dst
), edges AS (
  SELECT src, dst FROM (
    SELECT src, dst,
      ROW_NUMBER() OVER (PARTITION BY src ORDER BY cosine DESC, dst) AS rn
    FROM gscored) e
  WHERE rn <= {_NSW_DEG}
), entry AS (
  SELECT vec_id FROM norms WHERE vec_id >= {N_QUERIES}
  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 1
), queries AS (
  SELECT vec_id AS query_id, embedding AS qe, nrm AS qn
  FROM norms WHERE vec_id < {N_QUERIES}
), beam0 AS (
  SELECT q.query_id, e.vec_id AS node FROM queries q CROSS JOIN entry e
){''.join(hops)}
SELECT query_id, neighbor_id, cosine, rank FROM (
  SELECT query_id, node AS neighbor_id, cosine,
    CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, node) AS INT) AS rank
  FROM beam{_NSW_HOPS}) f
WHERE rank <= {TOP_K}
"""


def _nsw_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The NSW neighbor graph as a session artifact: per-node top-8
    out-edges by exact cosine among LSH-bucket peers (buckets capped at
    256 in md5 order). Built once per (session, sf) — the index a
    production graph-ANN service maintains by daily upserts; searches
    read edges, never candidates."""
    from am_kinesis_pay_spark.paths import (
        session_artifact as _materialize,
        sf_tag as _sf_tag,
    )

    def build():
        emb = load(spark, sf_dir, "embeddings")
        banded = (
            _norms(emb)
            .withColumn("sig", _lsh_signature())
            .select("vec_id", "embedding", "nrm",
                    F.explode(F.array(*lsh_band_cols())).alias("band"))
        )
        w_cap = W.partitionBy("band").orderBy(
            F.md5(F.col("vec_id").cast("string")), "vec_id"
        )
        buckets = (
            banded.withColumn("rn", F.row_number().over(w_cap))
            .filter(F.col("rn") <= _NSW_GCAP)
            .drop("rn")
        )
        a = buckets.select(
            F.col("vec_id").alias("src"),
            F.col("embedding").alias("ea"),
            F.col("nrm").alias("na"),
            "band",
        )
        b = buckets.select(
            F.col("vec_id").alias("dst"),
            F.col("embedding").alias("eb"),
            F.col("nrm").alias("nb"),
            "band",
        )
        pairs = (
            a.join(b, "band")
            .filter(F.col("src") != F.col("dst"))
            .dropDuplicates(["src", "dst"])
        )
        scored = pairs.select(
            "src",
            "dst",
            F.round(_dot("ea", "eb") / (F.col("na") * F.col("nb")), 6).alias(
                "cosine"
            ),
        )
        w_deg = W.partitionBy("src").orderBy(
            F.col("cosine").desc(), F.col("dst")
        )
        return (
            scored.withColumn("rn", F.row_number().over(w_deg))
            .filter(F.col("rn") <= _NSW_DEG)
            .select("src", "dst")
        )

    return _materialize(
        spark,
        f"akps_nsw_edges_{_sf_tag(sf_dir)}",
        build,
        "src bigint, dst bigint",
    )


@register("vec_ann_nsw", oracle=_nsw_oracle(), tags=("llm", "similarity", "ann"))
def vec_ann_nsw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graph ANN — the modern index family (NSW, Malkov et al. 2014;
    HNSW's single-layer ancestor), completing the ladder beside
    LSH/IVF/PQ: a k-NN GRAPH (per-node top-8 cosine edges among
    LSH-bucket peers, a session artifact like the IVF inverted file)
    searched by GREEDY BEAM — start every query at one deterministic
    entry node, expand the beam's out-edges, keep the best 16 by exact
    cosine, repeat 3 hops, emit the top-5. Simplified from production
    HNSW exactly where determinism demands it: fixed hop count instead
    of convergence detection, one layer instead of a hierarchy — which
    is what lets the ENTIRE pipeline (graph construction included)
    hash-match a DuckDB oracle, something no other engine's HNSW can
    claim. Recall vs the exact brute-force baseline is additionally
    pinned in tests/test_llm.py.

    At 100 TB: construction is the indexing cost (bucketed candidates,
    capped at 256/bucket, one shuffle to rank edges per node; daily
    ingest appends new nodes' edges); a search touches beam x degree
    nodes per hop — independent of corpus size, the property that makes
    graph ANN the production default. The edges table is the only
    thing searches read; it bucket-joins against the beam frontier."""
    emb = load(spark, sf_dir, "embeddings")
    norms = _norms(emb)
    edges = _nsw_edges(spark, sf_dir)
    entry = (
        norms.filter(F.col("vec_id") >= N_QUERIES)
        .orderBy(F.md5(F.col("vec_id").cast("string")), "vec_id")
        .limit(1)
        .select(F.col("vec_id").alias("node"))
    )
    queries = norms.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qe"),
        F.col("nrm").alias("qn"),
    )
    corpus = norms.select(
        F.col("vec_id").alias("node"),
        F.col("embedding").alias("ne"),
        F.col("nrm").alias("nn"),
    )
    beam = queries.select("query_id").crossJoin(F.broadcast(entry))
    for _hop in range(_NSW_HOPS):
        frontier = beam.select("query_id", "node")
        expanded = frontier.unionByName(
            frontier.join(
                edges, frontier.node == edges.src
            ).select("query_id", F.col("dst").alias("node"))
        ).dropDuplicates(["query_id", "node"]).filter(
            F.col("node") != F.col("query_id")
        )
        scored = (
            expanded.join(F.broadcast(queries), "query_id")
            .join(corpus, "node")
            .select(
                "query_id",
                "node",
                F.round(
                    _dot("qe", "ne") / (F.col("qn") * F.col("nn")), 6
                ).alias("cosine"),
            )
        )
        w_beam = W.partitionBy("query_id").orderBy(
            F.col("cosine").desc(), F.col("node")
        )
        beam = (
            scored.withColumn("rn", F.row_number().over(w_beam))
            .filter(F.col("rn") <= _NSW_BEAM)
            .drop("rn")
        )
    w_final = W.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("node")
    )
    return (
        beam.withColumn("rank", F.row_number().over(w_final).cast("int"))
        .filter(F.col("rank") <= TOP_K)
        .select(
            "query_id",
            F.col("node").alias("neighbor_id"),
            "cosine",
            "rank",
        )
    )


_EOUT_Z = "2.0"  # outlier flag threshold (z-score of within-label dist2)


@register(
    "emb_centroid_outliers",
    oracle=f"""
WITH flat AS (
  SELECT vec_id, label, generate_subscripts(embedding, 1) AS i,
    unnest(embedding) AS x
  FROM embeddings
), cent AS (
  SELECT label, i,
    round(CAST(SUM(CAST(CAST(x AS DOUBLE) AS DECIMAL(38,18))) AS DOUBLE)
          / COUNT(*), 9) AS m
  FROM flat GROUP BY label, i
), carr AS (
  SELECT label, list(m ORDER BY i) AS cm FROM cent GROUP BY label
), dist AS (
  SELECT e.vec_id, e.label,
    CAST(round(list_sum(list_transform(list_zip(e.embedding, c.cm),
      p -> (CAST(p[1] AS DOUBLE) - p[2]) * (CAST(p[1] AS DOUBLE) - p[2]))),
      6) AS DECIMAL(18,6)) AS d2
  FROM embeddings e JOIN carr c ON e.label = c.label
), stats AS (
  SELECT label, CAST(COUNT(*) AS BIGINT) AS n_label,
    SUM(d2) AS s, SUM(d2 * d2) AS ss
  FROM dist GROUP BY label
), mv AS (
  SELECT label, n_label, CAST(s AS DOUBLE) / n_label AS mean_d2,
    (CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n_label)
      / (n_label - 1) AS var_d2
  FROM stats WHERE n_label >= 2
), mvp AS (
  SELECT * FROM mv WHERE var_d2 > 0
)
SELECT d.vec_id, d.label, CAST(d.d2 AS DOUBLE) AS dist2,
  round(m.mean_d2, 6) AS label_mean_dist2,
  round((CAST(d.d2 AS DOUBLE) - m.mean_d2) / sqrt(m.var_d2), 6) AS z,
  (CAST(d.d2 AS DOUBLE) - m.mean_d2) / sqrt(m.var_d2) > {_EOUT_Z}
    AS is_outlier,
  m.n_label
FROM dist d JOIN mvp m ON d.label = m.label
""",
    tags=("llm", "vectors", "quality"),
)
def emb_centroid_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MISLABELED-SAMPLE detection for embedding training data: each
    vector's squared distance to its OWN label centroid, z-scored
    within the label — the standard label-noise / poisoning filter a
    curation pipeline runs before fine-tuning (a vector far from its
    class center is a labeling-error candidate). Flags z > {_EOUT_Z}.

    Exactness despite float geometry: centroids are the
    emb_label_centroids_long fixed-point components (exact DECIMAL
    sums, 9-dp rounds); the squared-deviation fold runs on doubles in
    both engines' identical left-to-right array order (the
    vec_cosine_topk list-parity convention) and the per-vector dist2
    snaps to a 6-dp DECIMAL, so the label moments come from exact
    DECIMAL (sum, sum-sq) — every cross-ROW accumulation is
    order-free integers, and even the z > {_EOUT_Z} boundary is
    deterministic cross-engine.

    Plan shape: ONE posexplode pass builds the labels x dims centroid
    frame (640 tall rows, re-assembled into 10 label ARRAYS and
    broadcast); the distance pass then never explodes or shuffles at
    all — each vector folds its own array against its label's
    centroid array in a single codegen'd F.aggregate (zip_with,
    per-dim 12-dp round, exact DECIMAL accumulator), one row in, one
    row out. Then one hash agg to the |labels| moment frame
    (broadcast back). At 100 TB: one explode-aggregate for the
    centroids, one map-only fold for distances, two tiny broadcasts —
    the corpus embedding column is never shuffled. (The first cut
    exploded twice and re-aggregated by vec_id: 7.9x at century; this
    form removes that second explode+shuffle entirely.)"""
    emb = load(spark, sf_dir, "embeddings")
    flat = emb.select(
        "vec_id", "label", F.posexplode("embedding").alias("i", "x")
    )
    cent = flat.groupBy("label", "i").agg(
        F.round(
            F.sum(F.col("x").cast("double").cast("decimal(38,18)"))
            .cast("double")
            / F.count(F.lit(1)),
            9,
        ).alias("m")
    )
    cent_arr = cent.groupBy("label").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("i", "m"))),
            lambda s: s["m"],
        ).alias("carr")
    )
    # The in-array fold runs on DOUBLES in both engines' identical
    # left-to-right element order (the vec_cosine_topk _dot/list_sum
    # parity convention, oracle-proven at 3 SFs), then the per-vector
    # result snaps to a 6-dp DECIMAL so every CROSS-ROW sum downstream
    # is exact and order-free.
    fold = F.aggregate(
        F.zip_with(
            "embedding",
            "carr",
            lambda x, m: (x.cast("double") - m) * (x.cast("double") - m),
        ),
        F.lit(0.0),
        lambda acc, el: acc + el,
    )
    dist = emb.join(F.broadcast(cent_arr), "label").select(
        "vec_id",
        "label",
        F.round(fold.cast("double"), 6).cast("decimal(18,6)").alias("d2"),
    )
    # dist feeds BOTH the moment aggregation and the final join: cut
    # the lineage so the 64-term fold runs once, not twice (the frame
    # is 1/|dims| the width of the corpus — vec_id, label, one decimal)
    dist = dist.localCheckpoint()
    stats = dist.groupBy("label").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_label"),
        F.sum("d2").alias("s"),
        F.sum(F.col("d2") * F.col("d2")).alias("ss"),
    )
    mean_d2 = F.col("s").cast("double") / F.col("n_label")
    var_d2 = (
        F.col("ss").cast("double")
        - F.col("s").cast("double")
        * F.col("s").cast("double")
        / F.col("n_label")
    ) / (F.col("n_label") - 1)
    mv = (
        stats.filter(F.col("n_label") >= 2)
        .select(
            "label",
            "n_label",
            mean_d2.alias("mean_d2"),
            var_d2.alias("var_d2"),
        )
        .filter(F.col("var_d2") > 0)
    )
    zexpr = (F.col("d2").cast("double") - F.col("mean_d2")) / F.sqrt(
        F.col("var_d2")
    )
    return dist.join(F.broadcast(mv), "label").select(
        "vec_id",
        "label",
        F.col("d2").cast("double").alias("dist2"),
        F.round("mean_d2", 6).alias("label_mean_dist2"),
        F.round(zexpr, 6).alias("z"),
        (zexpr > F.lit(float(_EOUT_Z))).alias("is_outlier"),
        "n_label",
    )


def _ndcg_oracle() -> str:
    """Exact-vs-LSH ranking-quality oracle: the exact chain and the
    LSH chain (same plane literals as _lsh_oracle) under renamed CTEs,
    composed into per-query nDCG / MRR / recall."""
    planes = _planes_values_sql()
    return """
WITH planes (p, wts) AS (
  VALUES
    {planes}
), norms AS (
  SELECT vec_id, embedding,
    coalesce(sqrt(nullif(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), 0)), 1.0) AS nrm
  FROM embeddings
), e_scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
    round(list_sum(list_transform(list_zip(q.embedding, c.embedding),
          pr -> CAST(pr[1] AS DOUBLE) * CAST(pr[2] AS DOUBLE))) / (q.nrm * c.nrm), 6) AS cosine
  FROM norms q JOIN norms c ON q.vec_id < {N_QUERIES} AND c.vec_id <> q.vec_id
), e_ranked AS (
  SELECT query_id, neighbor_id,
    CAST(ROW_NUMBER() OVER (PARTITION BY query_id
         ORDER BY cosine DESC, neighbor_id) AS INT) AS e_rank
  FROM e_scored
), truth AS (
  SELECT query_id, neighbor_id, e_rank,
    CAST({TOP_K} + 1 - e_rank AS BIGINT) AS gain
  FROM e_ranked WHERE e_rank <= {TOP_K}
), dots AS (
  SELECT n.vec_id, pl.p,
    list_sum(list_transform(list_zip(n.embedding, pl.wts),
          z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE))) AS d
  FROM norms n CROSS JOIN planes pl
), sigs AS (
  SELECT vec_id,
    CAST(SUM(CASE WHEN d > 0 THEN CAST(1 AS BIGINT) << p ELSE 0 END) AS BIGINT) AS sig
  FROM dots GROUP BY vec_id
), banded AS (
  SELECT vec_id, 'b' || CAST(i AS VARCHAR) || ':'
    || CAST((sig >> (4 * i)) & 15 AS VARCHAR) AS band
  FROM sigs CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS i) bands
), cand AS (
  SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
  FROM banded q JOIN banded c USING (band)
  WHERE q.vec_id < {N_QUERIES} AND c.vec_id <> q.vec_id
), l_scored AS (
  SELECT cand.query_id, cand.neighbor_id,
    round(list_sum(list_transform(list_zip(q.embedding, c.embedding),
          pr -> CAST(pr[1] AS DOUBLE) * CAST(pr[2] AS DOUBLE))) / (q.nrm * c.nrm), 6) AS cosine
  FROM cand
  JOIN norms q ON q.vec_id = cand.query_id
  JOIN norms c ON c.vec_id = cand.neighbor_id
), l_ranked AS (
  SELECT query_id, neighbor_id,
    CAST(ROW_NUMBER() OVER (PARTITION BY query_id
         ORDER BY cosine DESC, neighbor_id) AS INT) AS l_rank
  FROM l_scored
), l_top AS (
  SELECT query_id, neighbor_id, l_rank FROM l_ranked WHERE l_rank <= {TOP_K}
), dcg AS (
  SELECT l.query_id,
    SUM(CAST(round(COALESCE(t.gain, 0)
             / (ln(CAST(1 + l.l_rank AS DOUBLE)) / ln(CAST(2 AS DOUBLE))), 9)
        AS DECIMAL(18,9))) AS dcg,
    CAST(SUM(CASE WHEN t.gain IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
      AS n_hits
  FROM l_top l LEFT JOIN truth t
    ON t.query_id = l.query_id AND t.neighbor_id = l.neighbor_id
  GROUP BY l.query_id
), idcg AS (
  SELECT query_id,
    SUM(CAST(round(gain
             / (ln(CAST(1 + e_rank AS DOUBLE)) / ln(CAST(2 AS DOUBLE))), 9)
        AS DECIMAL(18,9))) AS idcg
  FROM truth GROUP BY query_id
), mrr AS (
  SELECT t.query_id,
    COALESCE(round(1.0 / MIN(l.l_rank), 6), 0.0) AS mrr
  FROM truth t LEFT JOIN l_top l
    ON l.query_id = t.query_id AND l.neighbor_id = t.neighbor_id
  WHERE t.e_rank = 1
  GROUP BY t.query_id
)
SELECT i.query_id, CAST(COALESCE(d.n_hits, 0) AS BIGINT) AS n_hits,
  round(CAST(COALESCE(d.n_hits, 0) AS DOUBLE) / {TOP_K}, 6) AS recall_at_k,
  round(CAST(COALESCE(d.dcg, 0) AS DOUBLE) / CAST(i.idcg AS DOUBLE), 6) AS ndcg_at_k,
  CAST(COALESCE(m.mrr, 0.0) AS DOUBLE) AS mrr
FROM idcg i
LEFT JOIN dcg d ON d.query_id = i.query_id
LEFT JOIN mrr m ON m.query_id = i.query_id
""".format(planes=planes, N_QUERIES=N_QUERIES, TOP_K=TOP_K)


@register(
    "eval_ann_ndcg",
    oracle=_ndcg_oracle(),
    tags=("eval", "similarity", "ann"),
)
def eval_ann_ndcg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANKING-QUALITY eval for the sign-LSH ANN index — recall@k says
    whether the right neighbors were found; nDCG@k and MRR say whether
    they arrived in the right ORDER, which is what a retrieval stack
    actually serves (Jarvelin & Kekalainen 2002): per query, graded
    relevance gain = {TOP_K}+1-exact_rank for the exact-cosine top-
    {TOP_K}, DCG over the LSH list's positions (gain / log2(1+rank)),
    normalized by the exact list's own DCG; MRR is the reciprocal LSH
    rank of the single best exact neighbor (0 when the index misses it
    entirely). Completes the eval family's coverage of the ANN stack:
    vec_ann_pq carries recall-only audits; this measures ORDER, on the
    fully oracle-checked LSH index.

    Exactness: gains and ranks are exact integers; each DCG term snaps
    to a 9-dp DECIMAL before the order-free per-query sum (both
    engines evaluate the identical ln(1+rank)/ln(2) double); the final
    nDCG divides two exact DECIMAL sums. Plan shape: composes the two
    existing entries' plans (exact top-k: broadcast query set over one
    corpus scan; LSH: signature map + band join) plus three joins on
    the <= {N_QUERIES} x {TOP_K}-row ranked frames. At 100 TB the
    audit adds nothing beyond the two rankings it grades."""
    # r12 OPT (guide §8): this plan references the exact ranking THREE
    # times (DCG gain join, IDCG, MRR) and the LSH ranking TWICE (DCG,
    # MRR) — each reference re-ran its full scoring pipeline. Both now
    # read their session artifacts; every reference is a tiny scan.
    exact = _exact_topk_full(spark, sf_dir, TOP_K).select(
        "query_id",
        "neighbor_id",
        F.col("rank").alias("e_rank"),
        (F.lit(TOP_K + 1) - F.col("rank")).cast("bigint").alias("gain"),
    )
    lsh = _lsh_topk_artifact(spark, sf_dir).select(
        "query_id", "neighbor_id", F.col("rank").alias("l_rank")
    )
    log2 = lambda c: F.log(F.lit(1.0) + c) / F.log(F.lit(2.0))  # noqa: E731
    dcg = (
        lsh.join(
            F.broadcast(exact.select("query_id", "neighbor_id", "gain")),
            ["query_id", "neighbor_id"],
            "left",
        )
        .groupBy("query_id")
        .agg(
            F.sum(
                F.round(
                    F.coalesce(F.col("gain"), F.lit(0))
                    / log2(F.col("l_rank")),
                    9,
                ).cast("decimal(18,9)")
            ).alias("dcg"),
            F.sum(
                F.when(F.col("gain").isNotNull(), 1).otherwise(0)
            ).cast("bigint").alias("n_hits"),
        )
    )
    idcg = exact.groupBy("query_id").agg(
        F.sum(
            F.round(F.col("gain") / log2(F.col("e_rank")), 9).cast(
                "decimal(18,9)"
            )
        ).alias("idcg")
    )
    # MRR is measured on the SERVED top-k list (rank of the best
    # exact neighbor within what the index actually returns; 0 when
    # it is not served at all)
    mrr = (
        exact.filter(F.col("e_rank") == 1)
        .select("query_id", "neighbor_id")
        .join(lsh, ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(
            F.coalesce(
                F.round(F.lit(1.0) / F.min("l_rank"), 6), F.lit(0.0)
            ).alias("mrr")
        )
    )
    # Drive the final frame from the EXACT-ranking query set (idcg has
    # every query by construction) with left joins + COALESCE (ADVICE
    # r10): a query whose LSH candidate set is completely empty must
    # score recall 0 / nDCG 0 / MRR 0, not silently vanish from the
    # eval — the worst-performing queries are the whole point.
    hits0 = F.coalesce(F.col("n_hits"), F.lit(0)).cast("bigint")
    return (
        idcg.join(F.broadcast(dcg), "query_id", "left")
        .join(F.broadcast(mrr), "query_id", "left")
        .select(
            "query_id",
            hits0.alias("n_hits"),
            F.round(hits0.cast("double") / F.lit(TOP_K), 6).alias(
                "recall_at_k"
            ),
            F.round(
                F.coalesce(F.col("dcg"), F.lit(0)).cast("double")
                / F.col("idcg").cast("double"),
                6,
            ).alias("ndcg_at_k"),
            F.coalesce(F.col("mrr"), F.lit(0.0)).cast("double").alias(
                "mrr"
            ),
        )
    )
