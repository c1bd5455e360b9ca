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

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from am_kinesis_pay_spark.registry import register
from am_kinesis_pay_spark.tables import load

# Fellegi-Sunter style fused score: name edit-similarity dominates,
# account-balance closeness corroborates. Threshold picked so matches
# are a minority class at both test SFs (23/88 pairs at sf0.001).
_ER_W_NAME = 0.7
_ER_W_BAL = 0.3
_ER_TAU = 0.85
# k-anonymity / l-diversity audit parameters
_KANON_K = 5
_LDIV_L = 3


@register(
    "er_customer_linkage",
    oracle=f"""
WITH pairs AS (
  SELECT a.c_custkey AS custkey_a, b.c_custkey AS custkey_b,
    CAST(levenshtein(a.c_name, b.c_name) AS INT) AS lev,
    1.0 - levenshtein(a.c_name, b.c_name)
      / CAST(greatest(length(a.c_name), length(b.c_name)) AS DOUBLE)
      AS name_sim,
    1.0 - abs(a.c_acctbal - b.c_acctbal)
      / (abs(a.c_acctbal) + abs(b.c_acctbal) + 1.0) AS bal_sim
  FROM customer a JOIN customer b
    ON a.c_nationkey = b.c_nationkey
   AND a.c_mktsegment = b.c_mktsegment
   AND a.c_custkey < b.c_custkey
)
SELECT custkey_a, custkey_b, lev, name_sim, bal_sim,
  {_ER_W_NAME} * name_sim + {_ER_W_BAL} * bal_sim AS score
FROM pairs
WHERE {_ER_W_NAME} * name_sim + {_ER_W_BAL} * bal_sim >= {_ER_TAU}
""",
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
    dirty keys the upgrades are sorted-neighborhood windows or LSH
    blocking, which change the key derivation, not this plan). A hot
    block (skewed nation×segment) is AQE skew-join territory; the
    deterministic per-bucket cap pattern (dedup.py BAND_CAP) applies
    unchanged if a block must be bounded.

    Reference parity: kinesis-pay.php:515-518 treats records with the
    same payment key as one entity; this generalizes same-entity
    detection to fuzzy multi-field evidence."""
    c = load(spark, sf_dir, "customer")
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
    pairs = a.join(b, "probe_blk").filter(
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
