"""Entity resolution (record linkage) and privacy-audit operators.

Record linkage is the data-integration half of dedup: the documents
pipeline (llm/dedup.py) finds near-identical TEXT; linkage finds
records that DESCRIBE the same entity across structured fields —
blocking to bound the candidate space, pairwise field-similarity
scoring, and a match threshold (the Fellegi-Sunter decision shape,
JASA 1969). The k-anonymity/l-diversity audit is the governance
counterpart: before a table ships to analysts, quasi-identifier
group sizes bound re-identification risk (Sweeney 2002; l-diversity
Machanavajjhala et al. 2007).

Reference parity: generalizes the reference's record-hygiene surface —
dedup-by-key kinesis-pay.php:515-518 (same-entity detection) and the
masked audit sampling kinesis-pay.php:302-304/:446-462 (what may leave
the system) — from payment records to arbitrary structured tables.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from am_kinesis_pay_spark.registry import register
from am_kinesis_pay_spark.tables import load

# Fellegi-Sunter style fused score: name edit-similarity dominates,
# account-balance closeness corroborates. Threshold picked so matches
# are a minority class at both test SFs (23/88 pairs at sf0.001).
_ER_W_NAME = 0.7
_ER_W_BAL = 0.3
_ER_TAU = 0.85
# Deterministic per-block membership cap (the dedup.py BAND_CAP /
# integration.py _CC_DAY_CAP pattern): a hot blocking key's candidate
# set is quadratic in block size, so block membership is bounded to the
# first _ER_BLOCK_CAP records in md5(custkey) order — a no-op at the
# test SFs (max block 152 at sf0.1) that bounds any block to
# C(256,2)=32,640 pairs at any scale. Mirrored verbatim in the oracle.
_ER_BLOCK_CAP = int(os.environ.get("AKPS_ER_BLOCK_CAP", "256"))
# k-anonymity / l-diversity audit parameters
_KANON_K = 5
_LDIV_L = 3


_ER_PAIRS_ORACLE_BODY = f"""
capped AS (
  SELECT c_custkey, c_name, c_nationkey, c_mktsegment, c_acctbal FROM (
    SELECT *, ROW_NUMBER() OVER (
        PARTITION BY c_nationkey, c_mktsegment
        ORDER BY md5(CAST(c_custkey AS VARCHAR)), c_custkey) AS rn
    FROM customer) c
  WHERE rn <= {_ER_BLOCK_CAP}
), pairs AS (
  SELECT a.c_custkey AS custkey_a, b.c_custkey AS custkey_b,
    CAST(levenshtein(a.c_name, b.c_name) AS INT) AS lev,
    1.0 - levenshtein(a.c_name, b.c_name)
      / CAST(greatest(length(a.c_name), length(b.c_name)) AS DOUBLE)
      AS name_sim,
    1.0 - abs(a.c_acctbal - b.c_acctbal)
      / (abs(a.c_acctbal) + abs(b.c_acctbal) + 1.0) AS bal_sim
  FROM capped a JOIN capped b
    ON a.c_nationkey = b.c_nationkey
   AND a.c_mktsegment = b.c_mktsegment
   AND a.c_custkey < b.c_custkey
), matched AS (
  SELECT custkey_a, custkey_b, lev, name_sim, bal_sim,
    {_ER_W_NAME} * name_sim + {_ER_W_BAL} * bal_sim AS score
  FROM pairs
  WHERE {_ER_W_NAME} * name_sim + {_ER_W_BAL} * bal_sim >= {_ER_TAU}
)"""


@register(
    "er_customer_linkage",
    oracle="WITH " + _ER_PAIRS_ORACLE_BODY + "\nSELECT * FROM matched",
    tags=("linkage", "join"),
)
def er_customer_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Record linkage over the customer table — the blocking →
    pairwise-scoring → threshold pipeline of every entity-resolution
    system (Fellegi-Sunter 1969): candidate pairs come ONLY from a
    self-equi-join on the blocking key (c_nationkey, c_mktsegment) —
    never a cross join — each pair is scored by a fused field
    similarity (name edit-distance similarity, weight 0.7; relative
    account-balance closeness, weight 0.3), and pairs at or above
    tau=0.85 are declared matches.

    Determinism: every feature is a per-row expression — levenshtein
    (identical unit-cost definition in both engines), exact IEEE
    division/multiply/add in identical order — with no cross-row float
    accumulation anywhere, so scores are bit-identical without any
    rounding step.

    At 100 TB the plan shape is the production one: ONE shuffle of
    each record to its block (equi-join on the blocking key), pair
    generation and scoring entirely within blocks, output bounded by
    the threshold. Candidate count is quadratic in BLOCK size, linear
    in block count — the blocking key's selectivity is the scale knob
    (the same lever as the MinHash band count in llm/dedup.py; for
    dirty keys the upgrades are er_sorted_neighborhood and
    er_lsh_blocking below, which change the key derivation, not this
    plan). Since r6, block membership is BOUNDED: each block keeps its
    first _ER_BLOCK_CAP=256 records in md5(custkey) order (mirrored in
    the oracle) — a no-op at the test SFs (max block 152 at sf0.1),
    and at any scale no block exceeds C(256,2) pairs, so total work is
    linear in block count. 10x stress receipt in SCALE.md (linkage
    row); a hot nation×segment additionally gets AQE skew-split.

    Reference parity: kinesis-pay.php:515-518 treats records with the
    same payment key as one entity; this generalizes same-entity
    detection to fuzzy multi-field evidence."""
    cust = load(spark, sf_dir, "customer")
    w_blk = Window.partitionBy("c_nationkey", "c_mktsegment").orderBy(
        F.md5(F.col("c_custkey").cast("string")), "c_custkey"
    )
    c = (
        cust.withColumn("rn", F.row_number().over(w_blk))
        .filter(F.col("rn") <= _ER_BLOCK_CAP)
        .drop("rn")
        # Explicit rebalance of the JOIN PROBE side: AQE coalesces the
        # window stage's output by BYTES (a few MB of capped rows), but
        # every probe row fans out to up to C(256,2) levenshtein pairs
        # in the broadcast hash join — the cheap-input/expensive-
        # downstream blind spot that serialized the whole pair stage
        # into one task (measured 15.3 s at 10x coalesced vs 2.3 s
        # spread; SCALE.md r7 linkage table). The partition count is
        # EXPLICIT because AQE would re-coalesce a column-only
        # repartition by the same bytes heuristic; repartition cost is
        # the capped frame itself: <= blocks x 256 thin rows at any
        # scale.
        .repartition(32, F.col("c_custkey"))
    )
    a = c.select(
        F.col("c_custkey").alias("custkey_a"),
        F.col("c_name").alias("name_a"),
        F.col("c_nationkey").alias("nk"),
        F.col("c_mktsegment").alias("seg"),
        F.col("c_acctbal").alias("bal_a"),
    )
    b = c.select(
        F.col("c_custkey").alias("custkey_b"),
        F.col("c_name").alias("name_b"),
        F.col("c_nationkey").alias("nk"),
        F.col("c_mktsegment").alias("seg"),
        F.col("c_acctbal").alias("bal_b"),
    )
    pairs = a.join(b, ["nk", "seg"]).filter(
        F.col("custkey_a") < F.col("custkey_b")
    )
    lev = F.levenshtein("name_a", "name_b")
    name_sim = F.lit(1.0) - lev / F.greatest(
        F.length("name_a"), F.length("name_b")
    ).cast("double")
    bal_sim = F.lit(1.0) - F.abs(F.col("bal_a") - F.col("bal_b")) / (
        F.abs("bal_a") + F.abs("bal_b") + F.lit(1.0)
    )
    scored = pairs.select(
        "custkey_a",
        "custkey_b",
        lev.cast("int").alias("lev"),
        name_sim.alias("name_sim"),
        bal_sim.alias("bal_sim"),
        (
            F.lit(_ER_W_NAME) * name_sim + F.lit(_ER_W_BAL) * bal_sim
        ).alias("score"),
    )
    return scored.filter(F.col("score") >= _ER_TAU)


@register(
    "dq_k_anonymity",
    oracle=f"""
SELECT c_nationkey, c_mktsegment,
  CAST(COUNT(*) AS BIGINT) AS group_size,
  COUNT(*) >= {_KANON_K} AS k_anonymous,
  CAST(COUNT(DISTINCT CAST(floor(c_acctbal / 1000) AS BIGINT)) AS BIGINT)
    AS l_diversity,
  COUNT(DISTINCT CAST(floor(c_acctbal / 1000) AS BIGINT)) >= {_LDIV_L}
    AS l_diverse
FROM customer
GROUP BY c_nationkey, c_mktsegment
""",
    tags=("linkage", "dq"),
)
def dq_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Privacy-release audit: k-anonymity (Sweeney 2002) and
    l-diversity (Machanavajjhala et al. 2007) over the customer
    table's quasi-identifier (c_nationkey, c_mktsegment) — every QI
    group reports its size (re-identification risk: a group below
    k=5 pins an individual to few candidates) and the number of
    distinct sensitive values it contains (the banded account
    balance; a k-anonymous group with ONE sensitive value still
    leaks it — that is exactly what l-diversity catches).

    One hash aggregation with map-side partials; COUNT(DISTINCT)
    expands to the standard two-phase expand-aggregate. Output is
    QI-group-sized (tiny), so at 100 TB this is a single pass over
    the table — the audit every release pipeline can afford to run
    per batch. Generalizes the reference's release gate (masked,
    sampled audit logging, kinesis-pay.php:302-304/:446-462) from
    per-record masking to distribution-level risk."""
    c = load(spark, sf_dir, "customer")
    sens = F.floor(F.col("c_acctbal") / 1000).cast("bigint")
    return (
        c.groupBy("c_nationkey", "c_mktsegment")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("group_size"),
            F.countDistinct(sens).cast("bigint").alias("l_diversity"),
        )
        .select(
            "c_nationkey",
            "c_mktsegment",
            "group_size",
            (F.col("group_size") >= _KANON_K).alias("k_anonymous"),
            "l_diversity",
            (F.col("l_diversity") >= _LDIV_L).alias("l_diverse"),
        )
    )


# Sorted-neighborhood method: window width (candidates per record).
_SNM_W = 6


@register(
    "er_sorted_neighborhood",
    oracle=f"""
WITH ranked AS (
  SELECT c_custkey, c_name, c_acctbal,
    ROW_NUMBER() OVER (ORDER BY c_name) AS seq
  FROM customer
), pairs AS (
  SELECT a.c_custkey AS custkey_a, b.c_custkey AS custkey_b,
    CAST(b.seq - a.seq AS INT) AS gap,
    CAST(levenshtein(a.c_name, b.c_name) AS INT) AS lev,
    1.0 - levenshtein(a.c_name, b.c_name)
      / CAST(greatest(length(a.c_name), length(b.c_name)) AS DOUBLE)
      AS name_sim,
    1.0 - abs(a.c_acctbal - b.c_acctbal)
      / (abs(a.c_acctbal) + abs(b.c_acctbal) + 1.0) AS bal_sim
  FROM ranked a JOIN ranked b
    ON b.seq - a.seq BETWEEN 1 AND {_SNM_W - 1}
)
SELECT custkey_a, custkey_b, gap, lev, name_sim, bal_sim,
  {_ER_W_NAME} * name_sim + {_ER_W_BAL} * bal_sim AS score
FROM pairs
WHERE {_ER_W_NAME} * name_sim + {_ER_W_BAL} * bal_sim >= {_ER_TAU}
""",
    tags=("linkage", "join"),
)
def er_sorted_neighborhood(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted-neighborhood record linkage (Hernandez & Stolfo 1995) —
    the LINEAR-candidate alternative to er_customer_linkage's
    blocking: sort records by a discriminating key (c_name), then
    score each record only against its next w-1=5 neighbors in key
    order. Candidates are O(n·w) by construction — no block can go
    quadratic, which is exactly the failure mode blocking has on a
    hot key. Same fused similarity and tau as the blocking variant.

    Scale shape (how a GLOBAL sort order is used without a global
    sort): the sequence number comes from the two-pass prefix-sum
    rank — records bucket by a key prefix (substr of the sort key),
    per-bucket row_numbers are offset by the cumulative counts of the
    ordered bucket frame (bucket-count-sized window, never a
    single-task global window; the agg_decile_lift pattern) — and
    neighbor pairs come from an EQUI-join on the sequence block
    floor(seq/w), each left record probing its own and the next
    block. One shuffle to rank, one equi-shuffle to pair; w is the
    recall/cost dial (multi-pass SNM re-runs with a second sort key,
    a second registry entry away)."""
    c = load(spark, sf_dir, "customer")
    bucket = F.substring("c_name", 10, 4)
    per_bucket = (
        c.groupBy(bucket.alias("bkt"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w_cum = (
        Window.orderBy("bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = per_bucket.select(
        "bkt", F.coalesce(F.sum("cnt").over(w_cum), F.lit(0)).alias("off")
    )
    w_in = Window.partitionBy("bkt").orderBy("c_name")
    ranked = (
        c.withColumn("bkt", bucket)
        .join(F.broadcast(offsets), "bkt")
        .select(
            "c_custkey",
            "c_name",
            "c_acctbal",
            (F.row_number().over(w_in) + F.col("off")).alias("seq"),
        )
    )
    blk = F.floor((F.col("seq") - 1) / _SNM_W)
    a = ranked.select(
        F.col("c_custkey").alias("custkey_a"),
        F.col("c_name").alias("name_a"),
        F.col("c_acctbal").alias("bal_a"),
        F.col("seq").alias("seq_a"),
        F.explode(F.array(blk, blk + 1)).alias("probe_blk"),
    )
    b = ranked.select(
        F.col("c_custkey").alias("custkey_b"),
        F.col("c_name").alias("name_b"),
        F.col("c_acctbal").alias("bal_b"),
        F.col("seq").alias("seq_b"),
        blk.alias("probe_blk"),
    )
    # pinned spread on the join key: the ranked frame is byte-small
    # out of its window stage, so AQE coalesces the neighbor join into
    # few tasks while every row fans out to w-1 levenshtein pairs —
    # the same cheap-input/expensive-projection blind spot fixed in
    # er_customer_linkage (measured 3.1 s coalesced vs 1.3 s spread at
    # 10x); explicit numPartitions because AQE re-coalesces otherwise
    pairs = a.repartition(32, "probe_blk").join(
        b.repartition(32, "probe_blk"), "probe_blk"
    ).filter(
        (F.col("seq_b") - F.col("seq_a")).between(1, _SNM_W - 1)
    )
    lev = F.levenshtein("name_a", "name_b")
    name_sim = F.lit(1.0) - lev / F.greatest(
        F.length("name_a"), F.length("name_b")
    ).cast("double")
    bal_sim = F.lit(1.0) - F.abs(F.col("bal_a") - F.col("bal_b")) / (
        F.abs("bal_a") + F.abs("bal_b") + 1.0
    )
    scored = pairs.select(
        "custkey_a",
        "custkey_b",
        (F.col("seq_b") - F.col("seq_a")).cast("int").alias("gap"),
        lev.cast("int").alias("lev"),
        name_sim.alias("name_sim"),
        bal_sim.alias("bal_sim"),
        (
            F.lit(_ER_W_NAME) * name_sim + F.lit(_ER_W_BAL) * bal_sim
        ).alias("score"),
    )
    return scored.filter(F.col("score") >= _ER_TAU)


# LSH blocking parameters: 8 md5 minhash permutations in 4 bands of 2
# (the dedup.py N_PERM/BAND_W convention), per-bucket cap 64, gram
# document-frequency ceiling 20%. Tau is higher than the blocking
# variant's because banded candidates are name-similar BY CONSTRUCTION.
_LSH_PERM = 8
_LSH_BAND_W = 2
_LSH_BUCKET_CAP = int(os.environ.get("AKPS_ER_LSH_CAP", "64"))
_LSH_DF_MAX = 0.20
_ER_LSH_TAU = 0.93


def _er_grams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DF-filtered character-3-gram index over customer names —
    the blocking index er_lsh_blocking minhashes. Session artifact
    (r12 OPT, guide §8 / the _ng_pairs convention): the raw gram frame
    was traversed TWICE per call in-plan (once to count document
    frequencies, once to apply the DF ceiling — the two subtrees end
    in different exchanges, so ReusedExchange never fires), and at
    100 TB a blocking index over a reference roster is exactly the
    persisted structure an ER pipeline maintains once and probes per
    batch. The gram explode is spread() before the first exchange
    (guide §2.5): the fixture's 1-split scan put the whole
    explode+distinct pass on one core."""
    from am_kinesis_pay_spark.paths import session_artifact, sf_tag
    from am_kinesis_pay_spark.tables import spread

    def build() -> DataFrame:
        cust = load(spark, sf_dir, "customer").filter(
            F.length("c_name") >= 3
        )
        grams = spread(cust.select("c_custkey", "c_name")).select(
            "c_custkey",
            F.explode(
                F.array_distinct(
                    F.transform(
                        F.sequence(F.lit(1), F.length("c_name") - 2),
                        lambda i: F.col("c_name").substr(i, F.lit(3)),
                    )
                )
            ).alias("g"),
        )
        df_counts = grams.groupBy("g").agg(F.count(F.lit(1)).alias("df"))
        n = cust.agg(F.count(F.lit(1)).alias("n"))
        return (
            grams.join(df_counts, "g")
            .crossJoin(F.broadcast(n))
            .filter(F.col("df") <= F.lit(_LSH_DF_MAX) * F.col("n"))
            .select("c_custkey", "g")
        )

    return session_artifact(
        spark,
        f"akps_er_grams_{sf_tag(sf_dir)}",
        build,
        "c_custkey bigint, g string",
    )


@register(
    "er_lsh_blocking",
    oracle=f"""
WITH grams AS (
  SELECT DISTINCT c_custkey, substr(c_name, CAST(i AS INT), 3) AS g
  FROM customer, unnest(range(1, length(c_name) - 1)) t(i)
), df AS (
  SELECT g, COUNT(*) AS df FROM grams GROUP BY g
), n AS (SELECT COUNT(*) AS n FROM customer),
rare AS (
  SELECT gr.c_custkey, gr.g FROM grams gr JOIN df ON df.g = gr.g, n
  WHERE df.df <= {_LSH_DF_MAX} * n.n
), mh AS (
  SELECT c_custkey, s.seed,
    MIN(md5(concat(CAST(s.seed AS VARCHAR), ':', g))) AS h
  FROM rare, generate_series(0, {_LSH_PERM - 1}) AS s(seed)
  GROUP BY c_custkey, s.seed
), bands AS (
  SELECT c_custkey, seed // {_LSH_BAND_W} AS band,
    string_agg(h, '|' ORDER BY seed) AS band_val
  FROM mh GROUP BY c_custkey, seed // {_LSH_BAND_W}
), capped AS (
  SELECT c_custkey, band, band_val FROM (
    SELECT c_custkey, band, band_val,
      ROW_NUMBER() OVER (PARTITION BY band, band_val
                         ORDER BY md5(CAST(c_custkey AS VARCHAR)), c_custkey)
        AS rn
    FROM bands) c
  WHERE rn <= {_LSH_BUCKET_CAP}
), cand AS (
  SELECT DISTINCT a.c_custkey AS custkey_a, b.c_custkey AS custkey_b
  FROM capped a JOIN capped b
    ON a.band = b.band AND a.band_val = b.band_val
   AND a.c_custkey < b.c_custkey
), pairs AS (
  SELECT c.custkey_a, c.custkey_b,
    CAST(levenshtein(a.c_name, b.c_name) AS INT) AS lev,
    1.0 - levenshtein(a.c_name, b.c_name)
      / CAST(greatest(length(a.c_name), length(b.c_name)) AS DOUBLE)
      AS name_sim,
    1.0 - abs(a.c_acctbal - b.c_acctbal)
      / (abs(a.c_acctbal) + abs(b.c_acctbal) + 1.0) AS bal_sim
  FROM cand c
  JOIN customer a ON a.c_custkey = c.custkey_a
  JOIN customer b ON b.c_custkey = c.custkey_b
)
SELECT custkey_a, custkey_b, lev, name_sim, bal_sim,
  {_ER_W_NAME} * name_sim + {_ER_W_BAL} * bal_sim AS score
FROM pairs
WHERE {_ER_W_NAME} * name_sim + {_ER_W_BAL} * bal_sim >= {_ER_LSH_TAU}
""",
    tags=("linkage", "join"),
)
def er_lsh_blocking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH blocking for DIRTY keys — the third blocking strategy in the
    ER family (er_customer_linkage: clean categorical key;
    er_sorted_neighborhood: sortable key; here: no usable key at all).
    Candidates come from MinHash-banded character 3-grams of the name
    itself — the llm/dedup.py machinery verbatim (md5 permutations,
    4 bands of 2, deterministic per-bucket cap in md5 order) applied
    to a structured field.

    The one ER-specific addition is gram DOCUMENT-FREQUENCY filtering:
    names share boilerplate ('Customer#000...' here; 'Inc', 'LLC',
    'Street' in real rosters), and boilerplate grams dominate every
    minhash — measured on this fixture, raw grams put 87% of the
    corpus into ONE band bucket. Dropping grams present in more than
    20% of records (the stopword-removal standard in ER blocking)
    leaves the discriminating grams: max bucket falls 13,067 -> 482 at
    sf0.1 before the cap even applies.

    At 100 TB every stage is bounded: gram/DF/minhash passes are
    linear scans with map-side combines; buckets are capped at 64 in
    deterministic md5 order (hot-boilerplate buckets truncate, other
    bands recover the recall — the dedup.py argument); candidate pairs
    are <= C(64,2) per bucket, linear in bucket count; scoring touches
    candidates only. Tau=0.93 (vs 0.85) because banded candidates are
    name-similar by construction.

    Reference parity: same record-hygiene surface as er_customer_linkage
    (kinesis-pay.php:515-518), keyed on fuzzy name evidence instead of
    exact payment keys."""
    cust = load(spark, sf_dir, "customer").filter(F.length("c_name") >= 3)
    rare = _er_grams(spark, sf_dir)
    # one agg computes all 8 permutation minima (the _rep_index shape)
    sigs = rare.groupBy("c_custkey").agg(
        *[
            F.min(F.md5(F.concat(F.lit(f"{s}:"), F.col("g")))).alias(f"h{s}")
            for s in range(_LSH_PERM)
        ]
    )
    band_structs = [
        F.struct(
            F.lit(b).alias("band"),
            F.concat_ws(
                "|",
                *[
                    F.col(f"h{s}")
                    for s in range(b * _LSH_BAND_W, (b + 1) * _LSH_BAND_W)
                ],
            ).alias("band_val"),
        )
        for b in range(_LSH_PERM // _LSH_BAND_W)
    ]
    bands = sigs.select(
        "c_custkey", F.explode(F.array(*band_structs)).alias("bv")
    ).select(
        "c_custkey",
        F.col("bv.band").alias("band"),
        F.col("bv.band_val").alias("band_val"),
    )
    w_cap = Window.partitionBy("band", "band_val").orderBy(
        F.md5(F.col("c_custkey").cast("string")), "c_custkey"
    )
    capped = (
        bands.withColumn("rn", F.row_number().over(w_cap))
        .filter(F.col("rn") <= _LSH_BUCKET_CAP)
        .drop("rn")
    )
    cand = (
        capped.select(F.col("c_custkey").alias("custkey_a"), "band", "band_val")
        .join(
            capped.select(
                F.col("c_custkey").alias("custkey_b"), "band", "band_val"
            ),
            ["band", "band_val"],
        )
        .filter(F.col("custkey_a") < F.col("custkey_b"))
        .select("custkey_a", "custkey_b")
        .distinct()
        # pinned spread before the field joins + levenshtein scoring:
        # the id-only candidate frame is byte-tiny post-distinct, so
        # AQE coalesces the scoring stage (the er_customer_linkage
        # blind spot; ~1.5x warm at sf0.1)
        .repartition(32, "custkey_a")
    )
    fields = ["c_custkey", "c_name", "c_acctbal"]
    pairs = cand.join(
        cust.select(*fields).toDF("custkey_a", "name_a", "bal_a"), "custkey_a"
    ).join(
        cust.select(*fields).toDF("custkey_b", "name_b", "bal_b"), "custkey_b"
    )
    lev = F.levenshtein("name_a", "name_b")
    name_sim = F.lit(1.0) - lev / F.greatest(
        F.length("name_a"), F.length("name_b")
    ).cast("double")
    bal_sim = F.lit(1.0) - F.abs(F.col("bal_a") - F.col("bal_b")) / (
        F.abs("bal_a") + F.abs("bal_b") + F.lit(1.0)
    )
    scored = pairs.select(
        "custkey_a",
        "custkey_b",
        lev.cast("int").alias("lev"),
        name_sim.alias("name_sim"),
        bal_sim.alias("bal_sim"),
        (
            F.lit(_ER_W_NAME) * name_sim + F.lit(_ER_W_BAL) * bal_sim
        ).alias("score"),
    )
    return scored.filter(F.col("score") >= _ER_LSH_TAU)


# Differential-privacy release parameters: epsilon per count query,
# Laplace scale b = sensitivity/epsilon = 1/epsilon for a count.
_DP_EPSILON = 0.5


@register(
    "dq_dp_noise",
    oracle=f"""
WITH counts AS (
  SELECT c_nationkey, c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n
  FROM customer GROUP BY c_nationkey, c_mktsegment
), seeded AS (
  SELECT c_nationkey, c_mktsegment, n,
    CAST(('0x' || substr(md5(concat(CAST(c_nationkey AS VARCHAR), ':',
                                    c_mktsegment)), 1, 12)) AS BIGINT)
      / CAST(281474976710656 AS DOUBLE) AS u
  FROM counts
)
SELECT c_nationkey, c_mktsegment,
  CAST(n AS DOUBLE)
    + round(-(1.0 / {_DP_EPSILON})
            * (CASE WHEN u >= 0.5 THEN 1.0 ELSE -1.0 END)
            * ln(GREATEST(1.0 - 2.0 * abs(u - 0.5),
                          3.552713678800501e-15)), 6) AS noisy_count,
  CAST({_DP_EPSILON} AS DOUBLE) AS epsilon
FROM seeded
""",
    tags=("linkage", "dq"),
)
def dq_dp_noise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differentially-private count release (Dwork et al. 2006): each
    QI group's count is published with Laplace(1/epsilon) noise — the
    mechanism behind every DP analytics release (US Census TopDown,
    ad-measurement aggregates), and the quantitative counterpart to
    dq_k_anonymity's threshold audit: instead of suppressing small
    groups, EVERY group is perturbed just enough that one individual's
    presence changes the output distribution by at most e^epsilon.

    Noise is SEEDED (inverse-CDF sampling of Laplace from an
    md5-derived uniform per group) — exactly how DP test harnesses
    make the mechanism reproducible: u = first 12 md5 hex chars / 2^48,
    noise = -(1/eps)*sign(u-1/2)*ln(1-2|u-1/2|), identical expression
    both engines, 6-dp rounded. The true count never appears in the
    output. One hash aggregation + per-row map arithmetic; at 100 TB
    this is one pass, and the per-group seed becomes the per-release
    RNG key a production system rotates.

    Reference parity: the masked, SAMPLED audit emission
    (kinesis-pay.php:302-304/:446-462) is the reference's
    privacy-budgeted release path; this is the modern
    distribution-level version of the same contract."""
    c = load(spark, sf_dir, "customer")
    counts = c.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    u = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.col("c_nationkey").cast("string"),
                    F.lit(":"),
                    F.col("c_mktsegment"),
                )
            ),
            1,
            12,
        ),
        16,
        10,
    ).cast("bigint") / F.lit(float(1 << 48))
    # u in {0, 0.5, 1} (p = 2^-48 each per key) makes the ln argument
    # exactly 0 — DuckDB ln(0) throws where Spark returns NULL; clamp
    # at 1/2^48 with the identical literal (the sample_weighted_gumbel
    # convention)
    noise = F.round(
        -(F.lit(1.0) / _DP_EPSILON)
        * F.when(u >= 0.5, F.lit(1.0)).otherwise(F.lit(-1.0))
        * F.log(
            F.greatest(
                F.lit(1.0) - 2.0 * F.abs(u - F.lit(0.5)),
                F.lit(3.552713678800501e-15),
            )
        ),
        6,
    )
    return counts.select(
        "c_nationkey",
        "c_mktsegment",
        (F.col("n").cast("double") + noise).alias("noisy_count"),
        F.lit(_DP_EPSILON).alias("epsilon"),
    )


_GOLDEN_ORACLE = (
    "WITH RECURSIVE "
    + _ER_PAIRS_ORACLE_BODY
    + """, edges AS (
  SELECT custkey_a AS src, custkey_b AS dst FROM matched
  UNION
  SELECT custkey_b AS src, custkey_a AS dst FROM matched
), nodes AS (
  SELECT DISTINCT src AS node FROM edges
), reach(node, other) AS (
  SELECT node, node FROM nodes
  UNION
  SELECT r.node, e.dst FROM reach r JOIN edges e ON e.src = r.other
), lab AS (
  SELECT node AS c_custkey, MIN(other) AS cluster_id
  FROM reach GROUP BY node
), members AS (
  SELECT c.c_custkey, c.c_name, c.c_acctbal,
    COALESCE(lab.cluster_id, c.c_custkey) AS cluster_id
  FROM customer c LEFT JOIN lab ON c.c_custkey = lab.c_custkey
), sized AS (
  SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS n_members
  FROM members GROUP BY cluster_id HAVING COUNT(*) >= 2
), ranked AS (
  SELECT m.cluster_id, m.c_custkey, m.c_name, m.c_acctbal,
    ROW_NUMBER() OVER (PARTITION BY m.cluster_id
                       ORDER BY m.c_acctbal DESC, m.c_custkey) AS rn
  FROM members m JOIN sized s ON m.cluster_id = s.cluster_id
)
SELECT r.cluster_id, s.n_members,
  MIN(r.c_custkey) AS canonical_custkey,
  MAX(CASE WHEN r.rn = 1 THEN r.c_name END) AS golden_name,
  round(MAX(r.c_acctbal), 2) AS max_acctbal,
  CAST(SUM(CAST(round(r.c_acctbal, 2) AS DECIMAL(18,2))) AS DOUBLE)
    AS total_acctbal
FROM ranked r JOIN sized s ON r.cluster_id = s.cluster_id
GROUP BY r.cluster_id, s.n_members
"""
)


@register(
    "er_golden_record",
    oracle=_GOLDEN_ORACLE,
    tags=("linkage", "iterative"),
)
def er_golden_record(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GOLDEN RECORD construction — the survivorship step that
    completes the entity-resolution pipeline (linkage finds PAIRS;
    master-data management needs one canonical record per ENTITY):
    matched pairs from er_customer_linkage are clustered by
    connected components (pairs alone under-merge transitive chains
    A≈B≈C — the same argument as text_dedup_clusters), then each
    multi-member cluster elects its golden attributes by explicit
    survivorship rules: canonical key = MIN custkey (stable),
    golden name = the name of the highest-balance member (richest
    record wins, ties by lowest custkey), plus max / DECIMAL-summed
    balances as the merge audit.

    Plan shape: the pair graph lives inside the linkage blocks
    ((nation, segment), capped at _ER_BLOCK_CAP), so components are
    BLOCK-BOUNDED — and that invariant makes iterative CC unnecessary:
    clustering is a per-block union-find over Arrow batches
    (applyInPandas grouped on the blocking key), one shuffle, no
    driver rounds; the survivorship window partitions by
    cluster_id — high cardinality, bounded partitions (<= block cap).
    Oracle: the SAME linkage CTE feeds a recursive-CTE transitive
    closure with min-label collapse, so Spark's iterative loop is
    checked against an independent closure implementation end to end
    (cluster ids AND all survivorship columns hash-compared)."""
    import pandas as pd

    from am_kinesis_pay_spark.registry import REGISTRY

    pairs = REGISTRY["er_customer_linkage"].fn(spark, sf_dir)
    # Components can NEVER cross a blocking key (candidate pairs only
    # exist within (nation, segment) blocks), so connected components
    # here are embarrassingly parallel: one union-find per block via
    # applyInPandas — ZERO driver-side rounds. An iterative global CC
    # (min-label: 15.2 s, pointer doubling: 12.6 s at sf0.1 — both
    # dominated by ~1 s/round fixed job overhead) is the WRONG tool
    # when blocking already bounds every component to <= _ER_BLOCK_CAP
    # nodes; block-local union-find is one shuffle on the block key
    # and runs in ~2 s. Unbounded graphs (no blocking invariant) still
    # need pointer_doubling_components — that is graph_kcore /
    # graph_cc_pointer_doubling territory.
    blocks = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_mktsegment"
    )
    bp = pairs.join(
        blocks, pairs.custkey_a == blocks.c_custkey
    ).select("custkey_a", "custkey_b", "c_nationkey", "c_mktsegment")

    def _block_uf(pdf: pd.DataFrame) -> pd.DataFrame:
        parent: dict = {}

        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in zip(pdf["custkey_a"], pdf["custkey_b"]):
            ra, rb = find(int(a)), find(int(b))
            if ra != rb:
                # attach the larger root under the smaller so the
                # component root IS the component minimum
                parent[max(ra, rb)] = min(ra, rb)
        nodes = sorted(parent)
        return pd.DataFrame(
            {"c_custkey": nodes, "cluster_id": [find(n) for n in nodes]}
        )

    labels = bp.groupBy("c_nationkey", "c_mktsegment").applyInPandas(
        _block_uf, "c_custkey bigint, cluster_id bigint"
    )
    cust = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal"
    )
    members = cust.join(labels, "c_custkey", "left").select(
        "c_custkey",
        "c_name",
        "c_acctbal",
        F.coalesce("cluster_id", "c_custkey").alias("cluster_id"),
    )
    # r11 OPT: cluster size as a window over the SAME cluster_id
    # partitioning as the survivorship rank — the previous
    # groupBy+join referenced `members` twice, which re-ran the
    # union-find applyInPandas (a Python evaluation node is never
    # exchange-reused) a second time per execution
    w_cluster = Window.partitionBy("cluster_id")
    ranked = members.withColumn(
        "n_members",
        F.count(F.lit(1)).over(w_cluster).cast("bigint"),
    ).filter(F.col("n_members") >= 2).withColumn(
        "rn",
        F.row_number().over(
            w_cluster.orderBy(F.col("c_acctbal").desc(), "c_custkey")
        ),
    )
    return ranked.groupBy("cluster_id", "n_members").agg(
        F.min("c_custkey").alias("canonical_custkey"),
        F.max(F.when(F.col("rn") == 1, F.col("c_name"))).alias(
            "golden_name"
        ),
        F.round(F.max("c_acctbal"), 2).alias("max_acctbal"),
        F.sum(F.round("c_acctbal", 2).cast("decimal(18,2)"))
        .cast("double")
        .alias("total_acctbal"),
    )
