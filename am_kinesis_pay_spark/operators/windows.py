"""Window functions (SURVEY.md §2.5, W1–W5).

Scale notes: every window here partitions by a high-cardinality key
(payment/user/customer), so state per partition is small and the
single shuffle per window spec is the floor. W4's global ORDER BY
window is the one deliberate exception — documented there.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from am_kinesis_pay_spark.functions.compat import dec
from am_kinesis_pay_spark.registry import register
from am_kinesis_pay_spark.tables import load


@register(
    "win_poll_seq",
    oracle="""
SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
  CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts) AS INT) AS poll_seq
FROM events
""",
    tags=("window",),
)
def win_poll_seq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1 [REF]: the monotone per-payment poll counter (`pollCount++`,
    kinesis-pay.php:231-233) as row_number per key ordered by time."""
    ev = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts")
    return ev.select(
        "event_id", "user_id", "ts", F.row_number().over(w).alias("poll_seq")
    )


@register(
    "win_rank_topk",
    oracle="""
WITH spend AS (
  SELECT c.c_nationkey, c.c_custkey,
    CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spend
  FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
  GROUP BY c.c_nationkey, c.c_custkey
)
SELECT c_nationkey, c_custkey, total_spend,
  CAST(RANK() OVER (PARTITION BY c_nationkey ORDER BY total_spend DESC, c_custkey) AS INT) AS spend_rank,
  CAST(DENSE_RANK() OVER (PARTITION BY c_nationkey ORDER BY total_spend DESC, c_custkey) AS INT) AS spend_dense_rank
FROM spend
""",
    tags=("window",),
)
def win_rank_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2 [DRV]: rank / dense_rank of customers by spend per nation.
    c_custkey tie-break keeps ranks deterministic across engines."""
    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    spend = (
        customer.join(orders, orders.o_custkey == customer.c_custkey)
        .groupBy("c_nationkey", "c_custkey")
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_spend")
        )
    )
    w = W.partitionBy("c_nationkey").orderBy(
        F.col("total_spend").desc(), F.col("c_custkey")
    )
    return spend.select(
        "c_nationkey",
        "c_custkey",
        "total_spend",
        F.rank().over(w).alias("spend_rank"),
        F.dense_rank().over(w).alias("spend_dense_rank"),
    )


@register(
    "win_lag_status_change",
    oracle="""
WITH seq AS (
  SELECT user_id, ts, event_type,
    LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts) AS prev_type
  FROM events
)
SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, prev_type, event_type
FROM seq
WHERE prev_type IS NOT NULL AND prev_type <> event_type
""",
    tags=("window",),
)
def win_lag_status_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3 [REF]: status-transition detection between consecutive polls
    (pending→processed etc., kinesis-pay.php:239-249) via lag()."""
    ev = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts")
    return (
        ev.select(
            "user_id",
            "ts",
            "event_type",
            F.lag("event_type").over(w).alias("prev_type"),
        )
        .filter(
            F.col("prev_type").isNotNull()
            & (F.col("prev_type") != F.col("event_type"))
        )
        .select("user_id", "ts", "prev_type", "event_type")
    )


@register(
    "win_running_total",
    oracle="""
SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
  CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (
    PARTITION BY user_id ORDER BY ts
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_value
FROM events
""",
    tags=("window",),
)
def win_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W4 [DRV]: cumulative value over time per user. Partitioned by
    user_id — a truly global running total would serialize into one
    task at 100 TB; per-key framing is the scalable form (a global one
    would be two-pass: per-partition sums + prefix-broadcast)."""
    ev = load(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        F.sum(F.col("value").cast("decimal(18,2)")).over(w).cast("double").alias(
            "running_value"
        ),
    )


@register(
    "win_global_running_total",
    oracle="""
SELECT event_id, CAST(ts AS TIMESTAMP) AS ts,
  CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (
    ORDER BY ts ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_value
FROM events
""",
    tags=("window", "scale-pattern"),
)
def win_global_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[DRV] GLOBAL cumulative sum — the two-pass prefix-sum pattern
    (SCALE.md): a naive global ORDER BY window serializes into one
    task; instead (1) bucket rows by day, (2) cumsum the per-day totals
    (tiny frame), (3) broadcast the per-day offsets back and cumsum
    within each day partition. Wall-clock scales with the largest
    day, not the whole stream."""
    ev = load(spark, sf_dir, "events").select(
        "event_id", "ts", dec("value", 2).alias("v")
    )
    day = F.date_trunc("day", "ts").alias("day")
    with_day = ev.select("event_id", "ts", "v", day)
    # pass 1: per-day totals → exclusive prefix offsets (tiny: one row/day)
    day_offsets = (
        with_day.groupBy("day")
        .agg(F.sum("v").alias("day_total"))
        .withColumn(
            "offset",
            F.coalesce(
                F.sum("day_total").over(
                    W.orderBy("day").rowsBetween(W.unboundedPreceding, -1)
                ),
                F.lit("0").cast("decimal(28,2)"),
            ),
        )
        .select("day", "offset")
    )
    # pass 2: within-day cumsum (parallel across days) + broadcast offset
    w_day = W.partitionBy("day").orderBy("ts").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    return (
        with_day.join(F.broadcast(day_offsets), "day")
        .withColumn("running_value", (F.sum("v").over(w_day) + F.col("offset")).cast("double"))
        .select("event_id", "ts", "running_value")
    )


@register(
    "agg_percentiles",
    oracle="""
SELECT event_type,
  round(quantile_cont(value, 0.25), 6) AS p25,
  round(quantile_cont(value, 0.50), 6) AS p50,
  round(quantile_cont(value, 0.90), 6) AS p90
FROM events
GROUP BY event_type
""",
    tags=("agg", "percentile"),
)
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[DRV] exact interpolated percentiles (both engines use the
    type-7 linear interpolation convention; rounded to 6 dp to absorb
    interpolation-arithmetic ulps). At 100 TB the approximate
    `percentile_approx` (KLL/GK sketch) replaces this — exact
    percentile is a full sort per group."""
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.25)"), 6).alias("p25"),
        F.round(F.expr("percentile(value, 0.50)"), 6).alias("p50"),
        F.round(F.expr("percentile(value, 0.90)"), 6).alias("p90"),
    )


@register(
    "udaf_user_zscore",
    oracle="""
WITH stats AS (
  SELECT user_id,
    AVG(value) AS mu,
    stddev_samp(value) AS sigma
  FROM events GROUP BY user_id
)
SELECT e.event_id, e.user_id,
  round((e.value - s.mu) / s.sigma, 6) AS zscore
FROM events e JOIN stats s ON e.user_id = s.user_id
WHERE s.sigma > 0
""",
    tags=("window", "udaf"),
)
def udaf_user_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[DRV] grouped-map applyInPandas (the UDAF surface, SURVEY §2.11):
    per-user z-score normalization computed inside a pandas kernel —
    the shape custom per-group math (feature normalization, curve
    fitting) plugs into. Oracle spells out the same formula in SQL;
    6-dp rounding absorbs accumulation-order ulps between pandas and
    the engines. The kernel works on numpy views, not pandas Series —
    per-group Series reductions cost ~1 ms each at ~66-row groups,
    which dominates wall time across thousands of groups (1.4x
    end-to-end at sf0.1). Single-row groups drop out, matching the
    oracle's `sigma > 0` (stddev_samp of one row is NULL)."""
    import numpy as np
    import pandas as pd

    ev = load(spark, sf_dir, "events").select("event_id", "user_id", "value")

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf["value"].to_numpy()
        if v.size < 2:
            return pdf.iloc[0:0][["event_id", "user_id"]].assign(zscore=[])
        mu = v.mean()
        sigma = v.std(ddof=1)
        if not sigma or sigma <= 0:
            return pdf.iloc[0:0][["event_id", "user_id"]].assign(zscore=[])
        return pd.DataFrame(
            {
                "event_id": pdf["event_id"].to_numpy(),
                "user_id": pdf["user_id"].to_numpy(),
                "zscore": np.round((v - mu) / sigma, 6),
            }
        )

    # pinned spread: AQE coalesces the groupBy exchange by BYTES (a
    # thin frame), serializing the per-group PYTHON kernels into few
    # tasks — the cheap-input/expensive-compute blind spot, which is
    # even sharper when the downstream cost is an Arrow round trip per
    # group (measured 2.9 s coalesced vs 0.9 s spread at sf0.1). The
    # explicit repartition carries the same hash key, so the groupBy
    # adds no second exchange.
    return (
        ev.repartition(32, "user_id")
        .groupBy("user_id")
        .applyInPandas(zscore, "event_id long, user_id long, zscore double")
    )


@register(
    "win_frame_sliding_avg",
    oracle="""
SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
  CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE)
    / COUNT(*) OVER w AS sliding_avg
FROM events
WINDOW w AS (
  PARTITION BY user_id ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
  RANGE BETWEEN 86400 PRECEDING AND CURRENT ROW)
""",
    tags=("window",),
)
def win_frame_sliding_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W5 [DRV]: trailing-24h moving average per user over a RANGE
    frame keyed on epoch seconds (range frames over timestamps differ
    between engines; integer seconds are portable). AVG is decomposed
    into exact-SUM/COUNT for cross-engine float determinism."""
    ev = load(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy(F.unix_timestamp("ts"))
        .rangeBetween(-86400, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        (
            F.sum(F.col("value").cast("decimal(18,2)")).over(w).cast("double")
            / F.count(F.lit(1)).over(w)
        ).alias("sliding_avg"),
    )


@register("agg_percentile_approx", oracle=None, tags=("agg", "approx"))
def agg_percentile_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[DRV] approximate percentiles via Spark's GK/KLL-style sketch —
    the 100 TB path where exact interpolation (agg_percentiles) would
    need a full sort per group. No oracle (a sketch estimate is
    implementation-defined), so like the HLL twins the result CARRIES
    its own bounded-error audit (VERDICT r7 #6): the sketch's actual
    guarantee is on RANK, not value — the returned element's rank r
    satisfies |r/n - q| <= eps (eps = 1/accuracy) — so the audit
    recomputes each returned element's true rank interval
    [count(< a)/n, count(<= a)/n] against the events scan and emits
    ``within_tol`` = the target quantile falls inside that interval
    widened by eps + 1/n (the 1/n is rank discretization). A value
    bracket against the exact twin would need local density
    assumptions; the rank check is assumption-free and exactly the
    published sketch contract. Asserted all-true in
    test_engine.py::test_sketch_entries_within_tolerance.

    Plan shape: one sketch aggregation (5 groups x 3 quantiles -> 15
    rows), broadcast back onto a single events scan, one hash
    aggregation — the audit adds one scan, no sort, no extra shuffle
    of the fact table beyond the groupBy."""
    accuracy = 10000
    qs = [0.25, 0.5, 0.9]
    ev = load(spark, sf_dir, "events").select("event_type", "value")
    approx = ev.groupBy("event_type").agg(
        F.percentile_approx("value", qs, accuracy).alias("approx_pcts")
    )
    exploded = approx.select(
        "event_type",
        F.posexplode("approx_pcts").alias("q_idx", "approx_value"),
    ).withColumn(
        "q",
        F.element_at(
            F.array(*[F.lit(q) for q in qs]), F.col("q_idx") + 1
        ),
    )
    ranked = (
        ev.join(F.broadcast(exploded), "event_type")
        .groupBy("event_type", "q_idx", "q", "approx_value")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.when(F.col("value") < F.col("approx_value"), 1).otherwise(0)
            ).alias("n_lt"),
            F.sum(
                F.when(F.col("value") <= F.col("approx_value"), 1).otherwise(0)
            ).alias("n_le"),
        )
    )
    slack = F.lit(1.0 / accuracy) + F.lit(1.0) / F.col("n")
    return ranked.select(
        "event_type",
        "q",
        "approx_value",
        (F.col("n_lt") / F.col("n")).alias("rank_lo"),
        (F.col("n_le") / F.col("n")).alias("rank_hi"),
        (
            (F.col("q") >= F.col("n_lt") / F.col("n") - slack)
            & (F.col("q") <= F.col("n_le") / F.col("n") + slack)
        ).alias("within_tol"),
    ).orderBy("event_type", "q")


@register(
    "win_ntile_quartile",
    oracle="""
SELECT c_custkey, c_mktsegment, c_acctbal,
  CAST(ntile(4) OVER (
    PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey
  ) AS BIGINT) AS balance_quartile
FROM customer
""",
    tags=("window",),
)
def win_ntile_quartile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[DRV] ntile bucketing: balance quartiles within each market
    segment (the cohort-assignment shape for stratified sampling of
    training data). Total ordering via the (acctbal, custkey)
    tie-break keeps bucket edges deterministic across engines.

    REWRITTEN r8 off the naive `ntile(4).over(partitionBy(segment))`:
    a 5-value partition key is 5 single-task whole-table sorts at
    scale. Each row's exact position comes from the distinct-value
    decomposition (win_dist_ranks), and NTILE's exact bucket law is
    then pure integer arithmetic — with q = n div k and r = n mod k,
    the first r buckets hold q+1 rows: bucket = ceil(pos/(q+1)) while
    pos <= r*(q+1), else r + ceil((pos - r*(q+1))/q). The oracle
    keeps the NATIVE ntile(), so the hash match proves the arithmetic
    reproduces Spark's and DuckDB's shared NTILE semantics exactly
    (including the unequal-bucket remainder rule)."""
    c = load(spark, sf_dir, "customer")
    k = 4
    dv = c.groupBy("c_mktsegment", "c_acctbal").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    w_pre = (
        W.partitionBy("c_mktsegment")
        .orderBy("c_acctbal")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    w_all = W.partitionBy("c_mktsegment").rowsBetween(
        W.unboundedPreceding, W.unboundedFollowing
    )
    frame = dv.select(
        "c_mktsegment",
        "c_acctbal",
        F.coalesce(F.sum("cnt").over(w_pre), F.lit(0)).alias("cum_before"),
        F.sum("cnt").over(w_all).alias("n_seg"),
    )
    w_tie = W.partitionBy("c_mktsegment", "c_acctbal").orderBy("c_custkey")
    positioned = (
        c.join(frame, ["c_mktsegment", "c_acctbal"])
        .withColumn(
            "pos", F.col("cum_before") + F.row_number().over(w_tie)
        )
        .withColumn("q", F.expr(f"n_seg div {k}"))
        .withColumn("r", F.col("n_seg") % k)
    )
    # ceil(a/b) written as (a + b - 1) div b: BIGINT-exact throughout
    bucket = F.when(
        F.col("pos") <= F.col("r") * (F.col("q") + 1),
        F.expr("(pos + q) div (q + 1)"),
    ).otherwise(F.expr("r + (pos - r * (q + 1) + q - 1) div q"))
    return positioned.select(
        "c_custkey",
        "c_mktsegment",
        "c_acctbal",
        bucket.cast("bigint").alias("balance_quartile"),
    )


@register(
    "win_dist_ranks",
    oracle="""
SELECT c_custkey, c_mktsegment,
  round(percent_rank() OVER w, 9) AS pct_rank,
  round(cume_dist() OVER w, 9) AS cum_dist
FROM customer
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
""",
    tags=("window",),
)
def win_dist_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributional ranks (percent_rank / cume_dist) per segment —
    the remaining members of the ranking-function family beyond
    rank/dense_rank/ntile.

    REWRITTEN r8 off the naive `over(partitionBy(segment))` form: a
    5-value partition key is 5 single-task sorts of the whole table —
    the low-cardinality cousin of the global-window hazard the plan
    lint guards (measured on the same shape: 0.39 s -> 2.99 s for
    100x rows, a line that dies at the next decade). Both fractions
    now derive from the distinct-value pattern: hash-agg to the
    per-(segment, acctbal) frame (2-dp money domain — saturating),
    prefix-count window over THAT frame, then each row's exact
    position = cum_before + row_number within its tie group
    (high-cardinality (segment, acctbal) partition). With the
    composite total order every row is its own peer group, so
    cume_dist = position/N and percent_rank = (position-1)/(N-1)
    exactly — the oracle keeps the NATIVE window functions, so the
    hash match proves the decomposition. 100x receipt in SCALE.md."""
    c = load(spark, sf_dir, "customer")
    dv = c.groupBy("c_mktsegment", "c_acctbal").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    w_pre = (
        W.partitionBy("c_mktsegment")
        .orderBy("c_acctbal")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    w_all = W.partitionBy("c_mktsegment").rowsBetween(
        W.unboundedPreceding, W.unboundedFollowing
    )
    frame = dv.select(
        "c_mktsegment",
        "c_acctbal",
        F.coalesce(F.sum("cnt").over(w_pre), F.lit(0)).alias("cum_before"),
        F.sum("cnt").over(w_all).alias("n_seg"),
    )
    w_tie = W.partitionBy("c_mktsegment", "c_acctbal").orderBy("c_custkey")
    pos = F.col("cum_before") + F.row_number().over(w_tie)
    return (
        c.join(frame, ["c_mktsegment", "c_acctbal"])
        .select(
            "c_custkey",
            "c_mktsegment",
            F.round((pos - 1) / (F.col("n_seg") - 1), 9).alias("pct_rank"),
            F.round(pos / F.col("n_seg"), 9).alias("cum_dist"),
        )
    )


@register(
    "win_sessionize",
    oracle="""
WITH flagged AS (
  SELECT event_id, user_id, ts,
    CASE WHEN ts - COALESCE(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                            ts - INTERVAL 1 HOUR)
              > INTERVAL 30 MINUTE
         THEN 1 ELSE 0 END AS new_session
  FROM events
)
SELECT event_id, user_id,
  CAST(SUM(new_session) OVER (
    PARTITION BY user_id ORDER BY ts, event_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
  ) AS BIGINT) AS session_id
FROM flagged
""",
    tags=("window", "session"),
)
def win_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level sessionization (the assignment counterpart of the
    session_window aggregate): lag the per-user event time, flag gaps
    over 30 minutes, and turn the flags into session ids with a running
    sum. Both windows share the user_id partitioning and (ts, event_id)
    order, so Catalyst plans ONE Exchange + ONE Sort for the pair —
    sessionizing is exactly as expensive as one window pass however
    large the event history. The first event seeds a synthetic 1-hour
    gap so session ids start at 1 in both engines."""
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = load(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "ts",
        F.when(
            F.col("ts").cast("timestamp").cast("long")
            - F.coalesce(
                F.lag("ts").over(w).cast("timestamp").cast("long"),
                F.col("ts").cast("timestamp").cast("long") - 3600,
            )
            > 1800,
            1,
        )
        .otherwise(0)
        .alias("new_session"),
    )
    return flagged.select(
        "event_id",
        "user_id",
        F.sum("new_session")
        .over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
        .cast("bigint")
        .alias("session_id"),
    )


@register(
    "win_out_of_order_profile",
    oracle="""
WITH lateness AS (
  SELECT event_id,
    GREATEST(
      COALESCE(MAX(epoch(CAST(ts AS TIMESTAMP))) OVER (
        PARTITION BY user_id ORDER BY event_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
      ) - epoch(CAST(ts AS TIMESTAMP)), 0), 0) AS late_s
  FROM events
)
SELECT
  CASE WHEN late_s = 0 THEN 'in-order'
       WHEN late_s <= 60 THEN '<=1min'
       WHEN late_s <= 600 THEN '<=10min'
       ELSE '>10min' END AS lateness_bucket,
  COUNT(*) AS n_events,
  CAST(MAX(late_s) AS BIGINT) AS max_late_s
FROM lateness
GROUP BY 1
""",
    tags=("window", "streaming", "diagnostics"),
)
def win_out_of_order_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-orderness profiling — the measurement that justifies a
    watermark setting: per event, lateness = (running max event-time so
    far in arrival order) - (own event-time), bucketed into a
    histogram. Arrival order = event_id (the ingest sequence). A
    watermark of X covers exactly the events in buckets <= X, so this
    query IS the empirical basis for `withWatermark` (SURVEY §2.9
    stream_watermark_expiry). One window shuffle on user_id + one tiny
    aggregation."""
    w = (
        W.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    late = load(spark, sf_dir, "events").select(
        "event_id",
        F.greatest(
            F.coalesce(
                F.max(F.col("ts").cast("timestamp").cast("long")).over(w) - F.col("ts").cast("timestamp").cast("long"),
                F.lit(0).cast("long"),
            ),
            F.lit(0).cast("long"),
        ).alias("late_s"),
    )
    return (
        late.select(
            F.when(F.col("late_s") == 0, "in-order")
            .when(F.col("late_s") <= 60, "<=1min")
            .when(F.col("late_s") <= 600, "<=10min")
            .otherwise(">10min")
            .alias("lateness_bucket"),
            "late_s",
        )
        .groupBy("lateness_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.max("late_s").cast("bigint").alias("max_late_s"),
        )
    )


@register(
    "win_markov_transitions",
    oracle="""
WITH seq AS (
  SELECT user_id, event_type,
    lag(event_type) OVER (
      PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
  FROM events
)
SELECT prev_type, event_type AS next_type, COUNT(*) AS n,
  round(CAST(COUNT(*) AS DOUBLE)
    / SUM(COUNT(*)) OVER (PARTITION BY prev_type), 6) AS p
FROM seq WHERE prev_type IS NOT NULL
GROUP BY prev_type, event_type
""",
    tags=("window", "stats"),
)
def win_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order behavior model: the event-type transition matrix
    (lag over each user's timeline, then count and row-normalize
    per source state) — the empirical Markov chain behind funnel
    diagnostics and next-event prediction baselines, and the
    generalization of the reference's pending→terminal transition
    detection (W3, kinesis-pay.php:239-249) from one payment to the
    whole population. One shuffle for the per-user lag, one for the
    5x5 count aggregation; the normalizing window runs on the
    25-row transition frame, so cost is O(events) + O(states^2)."""
    ev = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    ).filter(F.col("prev_type").isNotNull())
    counts = seq.groupBy("prev_type", F.col("event_type").alias("next_type")).agg(
        F.count(F.lit(1)).alias("n")
    )
    norm = W.partitionBy("prev_type")
    return counts.select(
        "prev_type",
        "next_type",
        "n",
        F.round(
            F.col("n").cast("double") / F.sum("n").over(norm), 6
        ).alias("p"),
    )


@register(
    "win_gaps_islands",
    oracle="""
WITH active_days AS (
  SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS d
  FROM events
),
islands AS (
  SELECT user_id, d,
         d - CAST(row_number() OVER (PARTITION BY user_id ORDER BY d) AS INTEGER) AS island_key
  FROM active_days
),
streaks AS (
  SELECT user_id, island_key, COUNT(*) AS streak_days,
         MIN(d) AS streak_start
  FROM islands
  GROUP BY user_id, island_key
)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_streaks,
       CAST(MAX(streak_days) AS BIGINT) AS longest_streak,
       MIN(streak_start) AS first_active
FROM streaks
GROUP BY user_id
""",
    tags=("window",),
)
def win_gaps_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: per-user consecutive-active-day streaks via
    the classic date-minus-row_number island key (consecutive days
    share one key; any gap starts a new island). Generalizes the
    reference's poll-continuity question — "is the browser still
    polling every 10 s or did the loop break?" (kinesis-pay.php:263,
    264-268) — to activity-streak analytics. One window shuffle on
    user_id, then two hash aggregations that reuse the same
    partitioning; the distinct-days pre-step bounds window input to
    (users × days), not raw events."""
    ev = load(spark, sf_dir, "events")
    active = ev.select(
        "user_id", F.to_date(F.date_trunc("day", "ts")).alias("d")
    ).distinct()
    w = W.partitionBy("user_id").orderBy("d")
    islands = active.withColumn(
        "island_key", F.date_sub("d", F.row_number().over(w))
    )
    streaks = islands.groupBy("user_id", "island_key").agg(
        F.count(F.lit(1)).alias("streak_days"),
        F.min("d").alias("streak_start"),
    )
    return streaks.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_streaks"),
        F.max("streak_days").alias("longest_streak"),
        F.min("streak_start").alias("first_active"),
    )


@register(
    "win_range_interval",
    oracle="""
WITH daily AS (
  SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS d,
         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS day_value
  FROM events WHERE event_type = 'purchase'
  GROUP BY user_id, CAST(date_trunc('day', ts) AS DATE)
)
SELECT user_id, d, day_value,
  CAST(SUM(CAST(day_value AS DECIMAL(18,2))) OVER (
    PARTITION BY user_id ORDER BY d
    RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW
  ) AS DOUBLE) AS trailing_7d
FROM daily
""",
    tags=("window",),
)
def win_range_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-based RANGE frame: per-user trailing-7-day purchase total
    over a daily series — the frame is defined by the ORDER-BY VALUE
    (calendar distance), not row position, so gaps in the series are
    handled correctly (a missing day still ages out of the window).
    W5's numeric rangeBetween generalized to intervals; same SQL text
    shape on both engines. One shuffle on user_id; the daily pre-
    aggregation bounds window input to users x days at any event
    volume."""
    ev = load(spark, sf_dir, "events")
    daily = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy(
            "user_id", F.to_date(F.date_trunc("day", "ts")).alias("d")
        )
        .agg(
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("day_value")
        )
    )
    w = (
        W.partitionBy("user_id")
        .orderBy(F.col("d").cast("timestamp").cast("long"))
        .rangeBetween(-6 * 86400, 0)
    )
    return daily.select(
        "user_id",
        "d",
        "day_value",
        F.sum(F.col("day_value").cast("decimal(18,2)"))
        .over(w)
        .cast("double")
        .alias("trailing_7d"),
    )


@register(
    "events_attribution_linear",
    oracle="""
WITH seq AS (
  SELECT event_id, user_id, ts, event_type,
    MIN(CASE WHEN event_type = 'purchase'
             THEN {'ts': ts, 'event_id': event_id} END)
      OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS conv
  FROM events
), touches AS (
  SELECT user_id, event_type, conv.event_id AS conv_id
  FROM seq
  WHERE event_type IN ('view', 'click') AND conv IS NOT NULL
    AND conv.ts <= ts + INTERVAL 7 DAY
), credited AS (
  SELECT event_type,
    CAST(round(1.0 / COUNT(*) OVER (PARTITION BY user_id, conv_id), 6)
         AS DECIMAL(18,6)) AS credit
  FROM touches
)
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_touches,
  CAST(SUM(credit) AS DOUBLE) AS total_credit
FROM credited GROUP BY event_type
""",
    tags=("window", "integration"),
)
def events_attribution_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-touch attribution, linear model — the marketing-warehouse
    workload beside the funnel: every view/click "touch" that precedes
    a user's next purchase within a 7-day lookback shares that
    conversion's credit equally (1/n per touch); per-channel totals
    come out as (event_type, touches, credit).

    Plan shape: ONE window pass per user assigns each event its next
    purchase — a running MIN over a (ts, event_id) struct on the
    suffix frame, so the "which conversion does this touch belong to"
    join never materializes as a join at all (the struct min is the
    same single-Exchange-per-user-partition trick as join_asof_rate,
    pointed forward). A second window keyed on (user, conversion)
    sizes each credit split, then one hash aggregate. Credit fractions
    round to 6 dp and accumulate in DECIMAL (repo float convention) so
    the cross-engine sum is exact. Alternative models are the same
    plan with a different credit expression: first/last-touch =
    row_number()==1 on the same partition, time-decay = pow over the
    ts gap — the expensive part (conversion assignment) is shared:
    since r11 it is the `_touch_assignment` session artifact, built
    once per session+sf and scanned by all three credit models."""
    credited = _touch_assignment(spark, sf_dir).select(
        "event_type",
        F.round(F.lit(1.0) / F.col("n"), 6)
        .cast("decimal(18,6)")
        .alias("credit"),
    )
    return credited.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_touches"),
        F.sum("credit").cast("double").alias("total_credit"),
    )


def _touch_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The attribution family's shared expensive stage as a session
    artifact (r11; the _classifier_scored / _materialized_edges
    convention): every view/click touch assigned its next purchase
    within the 7-day lookback via the per-user forward struct-min
    window, then rank-resolved per (user, conversion) — rn_asc and the
    path size n are everything any credit model needs (last touch is
    rn_asc = n, linear is 1/n, U-shape reads both edges), so the
    materialized frame carries no timestamps and each model is one
    scan + one hash agg. The assignment windows were ~90% of all three
    entries' cost at the 100x century (43-54 s each, SCALE.md r11);
    at 100 TB the touch->conversion map IS a persisted table scored
    once per day and probed by every attribution/report consumer."""
    from am_kinesis_pay_spark.paths import session_artifact, sf_tag

    def build() -> DataFrame:
        ev = load(spark, sf_dir, "events")
        w_next = (
            W.partitionBy("user_id")
            .orderBy("ts", "event_id")
            .rowsBetween(W.currentRow, W.unboundedFollowing)
        )
        conv = F.min(
            F.when(
                F.col("event_type") == "purchase", F.struct("ts", "event_id")
            )
        ).over(w_next)
        seq = ev.select(
            "event_id", "user_id", "ts", "event_type", conv.alias("conv")
        )
        touches = seq.filter(
            F.col("event_type").isin("view", "click")
            & F.col("conv").isNotNull()
            & (F.col("conv.ts") <= F.col("ts") + F.expr("INTERVAL 7 DAY"))
        ).select(
            "user_id", "ts", "event_id", "event_type",
            F.col("conv.event_id").alias("conv_id"),
        )
        w_asc = W.partitionBy("user_id", "conv_id").orderBy("ts", "event_id")
        w_conv = W.partitionBy("user_id", "conv_id")
        return touches.select(
            "user_id",
            "conv_id",
            "event_type",
            F.row_number().over(w_asc).alias("rn_asc"),
            F.count(F.lit(1)).over(w_conv).cast("bigint").alias("n"),
        )

    return session_artifact(spark, f"akps_touch_{sf_tag(sf_dir)}", build)


@register(
    "events_rfm_segments",
    oracle="""
WITH maxd AS (
  SELECT MAX(CAST(ts AS DATE)) AS corpus_max FROM events
), per_user AS (
  SELECT user_id,
    date_diff('day', MAX(CAST(ts AS DATE)), (SELECT corpus_max FROM maxd))
      AS recency_days,
    CAST(COUNT(*) AS BIGINT) AS frequency,
    CAST(SUM(CAST(round(value, 3) AS DECIMAL(18,6))) AS DOUBLE) AS monetary
  FROM events WHERE event_type = 'purchase'
  GROUP BY user_id
)
SELECT user_id, CAST(recency_days AS BIGINT) AS recency_days,
  frequency, monetary,
  CAST(NTILE(4) OVER (ORDER BY recency_days ASC, user_id) AS INT) AS r_q,
  CAST(NTILE(4) OVER (ORDER BY frequency DESC, user_id) AS INT) AS f_q,
  CAST(NTILE(4) OVER (ORDER BY monetary DESC, user_id) AS INT) AS m_q,
  CAST(NTILE(4) OVER (ORDER BY recency_days ASC, user_id) AS VARCHAR)
    || CAST(NTILE(4) OVER (ORDER BY frequency DESC, user_id) AS VARCHAR)
    || CAST(NTILE(4) OVER (ORDER BY monetary DESC, user_id) AS VARCHAR)
    AS segment
FROM per_user
""",
    tags=("window", "integration"),
)
def events_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation — the classic marketing-warehouse
    scoring beside attribution: per purchaser, Recency (days since
    last purchase vs corpus max date), Frequency (purchase count) and
    Monetary (exact-DECIMAL spend), each quartiled into 1..4 (1 =
    best) and concatenated into the '111'-style segment label.

    Plan shape (rewritten off the 3× global-NTILE single-task sort,
    VERDICT r6): ONE hash aggregate reduces the fact table to a
    row-per-purchaser frame; the corpus max date is a 1-row broadcast.
    Each axis then gets an EXACT global row_number via the two-pass
    prefix pattern (win_global_running_total): rows bucket by the axis
    value (recency/frequency are small integer domains; monetary
    buckets by floor(monetary), a value-RANGE-sized domain), pass 1
    prefix-sums per-bucket counts over ordered buckets (a tiny
    bucket-frame window, never a row-scale one), pass 2 row_numbers
    WITHIN each bucket (partitioned window, parallel across buckets)
    and adds the broadcast offset. NTILE(4) is then pure arithmetic on
    (row_number, n): the first n%4 tiles take ceil(n/4) rows, the rest
    floor(n/4) — bit-identical to the oracle's NTILE, ties broken on
    user_id in both engines. Wall-clock scales with the largest
    bucket, not the user count."""
    ev = load(spark, sf_dir, "events")
    maxd = ev.agg(F.max(F.col("ts").cast("date")).alias("corpus_max"))
    per_user = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.max(F.col("ts").cast("date")).alias("last_purchase"),
            F.count(F.lit(1)).cast("bigint").alias("frequency"),
            F.sum(F.round("value", 3).cast("decimal(18,6)"))
            .cast("double")
            .alias("monetary"),
        )
        .crossJoin(F.broadcast(maxd))
        .select(
            "user_id",
            F.datediff("corpus_max", "last_purchase")
            .cast("bigint")
            .alias("recency_days"),
            "frequency",
            "monetary",
        )
        # r12 OPT (guide §5): per_user feeds the ranked base, all
        # three axis_rownum pipelines and the n_row count — five
        # references, each re-running the fact scan + purchase agg
        # (16 scans per execution in PLANSTATS). One lineage cut of
        # the row-per-purchaser frame makes it one scan.
        .localCheckpoint()
    )

    def axis_rownum(val: str, bucket, descending: bool, out: str):
        """Exact global row_number over (val, user_id) without a global
        sort: per-bucket counts -> exclusive prefix offsets (bucket-
        frame window), then a PARTITIONED row_number within buckets
        plus the broadcast offset. Buckets are contiguous under the
        axis order because the bucket fn is monotonic in val."""
        b = per_user.select("user_id", val).withColumn("_b", bucket)
        counts = b.groupBy("_b").agg(
            F.count(F.lit(1)).cast("bigint").alias("_c")
        )
        w_off = W.orderBy(
            F.desc("_b") if descending else F.asc("_b")
        ).rowsBetween(W.unboundedPreceding, -1)
        offs = counts.select(
            "_b",
            F.coalesce(F.sum("_c").over(w_off), F.lit(0))
            .cast("bigint")
            .alias("_off"),
        )
        order = (
            [F.desc(val), F.asc("user_id")]
            if descending
            else [F.asc(val), F.asc("user_id")]
        )
        w_in = W.partitionBy("_b").orderBy(*order)
        return b.join(F.broadcast(offs), "_b").select(
            "user_id",
            (F.row_number().over(w_in) + F.col("_off"))
            .cast("bigint")
            .alias(out),
        )

    n_row = per_user.agg(F.count(F.lit(1)).cast("bigint").alias("_n"))
    ranked = (
        per_user.join(
            axis_rownum("recency_days", F.col("recency_days"), False, "_rn_r"),
            "user_id",
        )
        .join(
            axis_rownum("frequency", F.col("frequency"), True, "_rn_f"),
            "user_id",
        )
        .join(
            axis_rownum("monetary", F.floor("monetary"), True, "_rn_m"),
            "user_id",
        )
        .crossJoin(F.broadcast(n_row))
    )

    def tile(rn):
        # NTILE(4) from (row_number, n): q = n div 4, rem = n mod 4;
        # rows 1..rem*(q+1) fall in the first rem (larger) tiles.
        q = F.floor(F.col("_n") / 4).cast("bigint")
        rem = (F.col("_n") % 4).cast("bigint")
        head = rem * (q + 1)
        in_head = F.floor((F.col(rn) + q) / (q + 1))  # ceil(rn/(q+1))
        in_tail = rem + F.floor((F.col(rn) - head + q - 1) / q)
        return F.when(F.col(rn) <= head, in_head).otherwise(in_tail)

    r_q, f_q, m_q = tile("_rn_r"), tile("_rn_f"), tile("_rn_m")
    return ranked.select(
        "user_id",
        "recency_days",
        "frequency",
        "monetary",
        r_q.cast("int").alias("r_q"),
        f_q.cast("int").alias("f_q"),
        m_q.cast("int").alias("m_q"),
        F.concat(
            r_q.cast("int").cast("string"),
            f_q.cast("int").cast("string"),
            m_q.cast("int").cast("string"),
        ).alias("segment"),
    )


@register(
    "events_attribution_last",
    oracle="""
WITH seq AS (
  SELECT event_id, user_id, ts, event_type,
    MIN(CASE WHEN event_type = 'purchase'
             THEN {'ts': ts, 'event_id': event_id} END)
      OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS conv
  FROM events
), touches AS (
  SELECT user_id, ts, event_id, event_type, conv.event_id AS conv_id
  FROM seq
  WHERE event_type IN ('view', 'click') AND conv IS NOT NULL
    AND conv.ts <= ts + INTERVAL 7 DAY
), last_touch AS (
  SELECT event_type FROM (
    SELECT event_type,
      ROW_NUMBER() OVER (PARTITION BY user_id, conv_id
                         ORDER BY ts DESC, event_id DESC) AS rn
    FROM touches) t
  WHERE rn = 1
)
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS conversions_won
FROM last_touch GROUP BY event_type
""",
    tags=("window", "integration"),
)
def events_attribution_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution — the companion model that makes
    `events_attribution_linear`'s claim executable: the EXPENSIVE stage
    (assigning every touch its next conversion via the forward
    struct-min window) is identical, and only the credit expression
    changes — here the final touch before each conversion takes the
    whole credit (a row_number pick per (user, conversion) instead of
    a 1/n split), so the output is integer-exact with no float
    convention at all. Same single per-user Exchange; first-touch and
    time-decay are the same two-line swap. Reads the shared
    `_touch_assignment` artifact (r11): last touch is rn_asc = n on
    the strict (ts, event_id) order the artifact rank-resolved."""
    return (
        _touch_assignment(spark, sf_dir)
        .filter(F.col("rn_asc") == F.col("n"))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).cast("bigint").alias("conversions_won"))
    )


_EWMA_ALPHA = 0.3
_EWMA_LAGS = 8  # truncation: (1-alpha)^8 ~ 0.058 residual weight


def _ewma_oracle() -> str:
    w = [(1.0 - _EWMA_ALPHA) ** k for k in range(_EWMA_LAGS)]
    num = "\n      + ".join(
        f"COALESCE({w[k]!r} * lag_{k}, 0.0)" for k in range(_EWMA_LAGS)
    )
    den = "\n      + ".join(
        f"CASE WHEN lag_{k} IS NOT NULL THEN {w[k]!r} ELSE 0.0 END"
        for k in range(_EWMA_LAGS)
    )
    lags = ",\n    ".join(
        f"CAST(LAG(day_value, {k}) OVER "
        "(PARTITION BY user_id ORDER BY day) AS DOUBLE) AS lag_" + str(k)
        for k in range(_EWMA_LAGS)
    )
    return f"""
WITH daily AS (
  SELECT user_id, CAST(ts AS DATE) AS day,
    CAST(SUM(CAST(round(value, 3) AS DECIMAL(18,6))) AS DOUBLE) AS day_value
  FROM events GROUP BY user_id, CAST(ts AS DATE)
), lagged AS (
  SELECT user_id, day, day_value,
    {lags}
  FROM daily
)
SELECT user_id, day, day_value,
  round(({num})
    / ({den}), 6) AS ewma
FROM lagged
"""


@register("win_ewma", oracle=_ewma_oracle(), tags=("window", "timeseries"))
def win_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially weighted moving average over each user's daily
    series — the smoothing/monitoring primitive beside
    ``win_frame_sliding_avg``'s uniform window: recent observations
    dominate (weight (1-α)^k at lag k, α=0.3), normalized over the
    weights actually present (pandas ``ewm(adjust=True)`` over
    observations), truncated at 8 lags where the residual tail weight
    is <6%. Truncation is what makes the recurrence WINDOWABLE: the
    exact EWMA is a sequential recurrence no frame can express, but
    the 8-term form is one window pass of LAG columns — the trade
    every streaming metrics system makes.

    Plan shape: one hash aggregate to the per-(user, day) frame, then
    ONE window Exchange+Sort per user serving all 8 LAGs. Per-term
    weights multiply in a fixed textual order and the 8-term sums are
    written as one explicit chain, so the double arithmetic is
    identical on both engines; day totals come from exact-DECIMAL
    accumulation before any float math."""
    ev = load(spark, sf_dir, "events")
    daily = (
        ev.groupBy("user_id", F.col("ts").cast("date").alias("day"))
        .agg(
            F.sum(F.round("value", 3).cast("decimal(18,6)"))
            .cast("double")
            .alias("day_value")
        )
    )
    w_user = W.partitionBy("user_id").orderBy("day")
    lagged = daily.select(
        "user_id",
        "day",
        "day_value",
        *[
            F.lag("day_value", k).over(w_user).cast("double").alias(f"lag_{k}")
            for k in range(_EWMA_LAGS)
        ],
    )
    weights = [(1.0 - _EWMA_ALPHA) ** k for k in range(_EWMA_LAGS)]
    num = F.coalesce(F.lit(weights[0]) * F.col("lag_0"), F.lit(0.0))
    den = F.when(F.col("lag_0").isNotNull(), F.lit(weights[0])).otherwise(0.0)
    for k in range(1, _EWMA_LAGS):
        num = num + F.coalesce(
            F.lit(weights[k]) * F.col(f"lag_{k}"), F.lit(0.0)
        )
        den = den + F.when(
            F.col(f"lag_{k}").isNotNull(), F.lit(weights[k])
        ).otherwise(0.0)
    return lagged.select(
        "user_id", "day", "day_value", F.round(num / den, 6).alias("ewma")
    )


def _arrow_group_stats(table):
    """applyInArrow kernel: one pyarrow.Table in, one out — columnar
    end-to-end, zero pandas conversion. Exact-typed reductions only
    (count, integer sum, double min/max), so the oracle hash needs no
    rounding convention."""
    import pyarrow as pa
    import pyarrow.compute as pc

    return pa.table(
        {
            "user_id": pa.array(
                [table.column("user_id")[0].as_py()], pa.int64()
            ),
            "n_events": pa.array([table.num_rows], pa.int64()),
            "sum_event_id": pa.array(
                [pc.sum(table.column("event_id")).as_py()], pa.int64()
            ),
            "min_value": pa.array(
                [pc.min(table.column("value")).as_py()], pa.float64()
            ),
            "max_value": pa.array(
                [pc.max(table.column("value")).as_py()], pa.float64()
            ),
        }
    )


@register(
    "udaf_arrow_groupstats",
    oracle="""
SELECT user_id,
  COUNT(*) AS n_events,
  CAST(SUM(event_id) AS BIGINT) AS sum_event_id,
  MIN(value) AS min_value,
  MAX(value) AS max_value
FROM events GROUP BY user_id
""",
    tags=("window", "udaf", "arrow"),
)
def udaf_arrow_groupstats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[DRV] grouped-map applyInArrow (Spark 4's arrow-NATIVE grouped
    API, completing the §2.11 surface beside the pandas forms): the
    kernel receives each group as a pyarrow.Table and returns one —
    no Arrow->pandas->Arrow round trip, which is the fast path for
    kernels that are themselves columnar (pyarrow.compute, numpy on
    zero-copy buffers, DuckDB-on-Arrow). Same one-shuffle plan as any
    grouped map; reductions here are exact-typed so the DuckDB oracle
    matches bit-for-bit with no float convention."""
    ev = load(spark, sf_dir, "events").select("user_id", "event_id", "value")
    return ev.groupBy("user_id").applyInArrow(
        _arrow_group_stats,
        schema=(
            "user_id bigint, n_events bigint, sum_event_id bigint, "
            "min_value double, max_value double"
        ),
    )


def _arrow_hist_partials(batches):
    """mapInArrow kernel: per-RecordBatch partial histogram — each
    Arrow batch folds to at most 40 (bin, n) rows before anything
    shuffles, the map-side-combine discipline expressed manually on
    the Arrow surface."""
    import pyarrow as pa
    import pyarrow.compute as pc

    for batch in batches:
        v = batch.column("value")
        bins = pc.cast(
            pc.floor(pc.divide(pc.cast(v, pa.float64()), 25.0)), pa.int32()
        )
        # count_all, not the default only_valid count: a NULL value row
        # lands in the null bin and the oracle's COUNT(*) counts it —
        # pyarrow's ("bin", "count") would report that group as 0
        counts = pa.table({"bin": bins}).group_by("bin").aggregate(
            [([], "count_all")]
        )
        yield pa.record_batch(
            {
                "bin": counts.column("bin").combine_chunks(),
                "n": pc.cast(
                    counts.column("count_all"), pa.int64()
                ).combine_chunks(),
            }
        )


@register(
    "agg_hist_arrow_map",
    oracle="""
SELECT CAST(floor(value / 25.0) AS INT) AS bin,
  COUNT(*) AS n
FROM events
GROUP BY CAST(floor(value / 25.0) AS INT)
""",
    tags=("agg", "udaf", "arrow"),
)
def agg_hist_arrow_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[DRV] mapInArrow (the last §2.11 Arrow surface beside
    applyInArrow / pandas_udf / mapInPandas): a streaming per-batch
    kernel that receives raw pyarrow.RecordBatches and emits bounded
    partial histograms (≤40 rows per batch), which one tiny groupBy
    then merges — hand-rolled map-side combine on the Arrow path.
    Bin = floor(value/25) is one IEEE divide + floor, identical in
    both engines, so the merged counts hash-match the direct SQL
    GROUP BY with no rounding convention. At 100 TB the shuffle
    carries only bins × input-partitions rows — this is how a custom
    columnar kernel (a tokenizer, a decoder stats pass) should
    aggregate: fold inside the batch, merge small."""
    ev = load(spark, sf_dir, "events").select("value")
    partials = ev.mapInArrow(_arrow_hist_partials, "bin int, n bigint")
    return partials.groupBy("bin").agg(
        F.sum("n").cast("bigint").alias("n")
    )


@register(
    "win_running_distinct",
    oracle="""
WITH fs AS (
  SELECT user_id, event_type, MIN(CAST(ts AS DATE)) AS first_day
  FROM events GROUP BY user_id, event_type
), days AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
), newt AS (
  SELECT user_id, first_day AS day, COUNT(*) AS n_new
  FROM fs GROUP BY user_id, first_day
)
SELECT d.user_id, d.day,
  CAST(COALESCE(n.n_new, 0) AS BIGINT) AS n_new_types,
  CAST(SUM(COALESCE(n.n_new, 0)) OVER (
         PARTITION BY d.user_id ORDER BY d.day) AS BIGINT)
    AS cum_distinct_types
FROM days d LEFT JOIN newt n ON n.user_id = d.user_id AND n.day = d.day
""",
    tags=("window", "agg"),
)
def win_running_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running DISTINCT count per user — cumulative distinct event
    types by day — via the first-seen + prefix-sum rewrite: a distinct
    value contributes exactly once, on the day it first appears, so
    cumulative-distinct = running SUM of per-day first-appearance
    counts. The naive form (COUNT(DISTINCT) OVER a growing frame, or
    collect_set + size) carries the whole distinct SET as per-row
    window state — O(alphabet) memory per row and unsupported /
    quadratic in most engines; the rewrite needs one (user, type)
    aggregate, one (user, day) aggregate, and a per-user running sum
    over day rows. The same trick scales to any
    cumulative-distinct-cardinality question (new customers per week,
    first-touch attribution) at 100 TB: every stage is a bounded
    hash aggregate and the window input is O(users × days), never
    O(events)."""
    ev = load(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("day"), "event_type"
    )
    fs = ev.groupBy("user_id", "event_type").agg(
        F.min("day").alias("first_day")
    )
    days = ev.select("user_id", "day").distinct()
    newt = fs.groupBy(
        "user_id", F.col("first_day").alias("day")
    ).agg(F.count(F.lit(1)).alias("n_new"))
    w = W.partitionBy("user_id").orderBy("day")
    joined = days.join(newt, ["user_id", "day"], "left").select(
        "user_id",
        "day",
        F.coalesce("n_new", F.lit(0)).alias("n_new_raw"),
    )
    return joined.select(
        "user_id",
        "day",
        F.col("n_new_raw").cast("bigint").alias("n_new_types"),
        F.sum("n_new_raw").over(w).cast("bigint").alias(
            "cum_distinct_types"
        ),
    )


@register(
    "win_pattern_match",
    oracle="""
WITH sym AS (
  SELECT user_id, ts, event_id,
    CASE event_type WHEN 'click' THEN 'c' WHEN 'view' THEN 'v'
         WHEN 'purchase' THEN 'p' ELSE 'o' END AS s
  FROM events
), paths AS (
  SELECT user_id, string_agg(s, '' ORDER BY ts, event_id) AS path,
    CAST(COUNT(*) AS BIGINT) AS n_events
  FROM sym GROUP BY user_id
)
SELECT user_id, n_events,
  CAST(len(regexp_extract_all(path, 'cv*p')) AS BIGINT) AS n_funnels,
  CAST(len(regexp_extract_all(path, 'pp+')) AS BIGINT) AS n_buy_streaks,
  path LIKE '%p' AS ends_converted
FROM paths
""",
    tags=("window", "sql"),
)
def win_pattern_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-pattern matching over ordered event sequences — the SQL:2016
    MATCH_RECOGNIZE capability (R010) that neither engine ships,
    expressed through its classical equivalence: a per-key ORDERED
    symbol string + regular expressions (patterns over rows ARE a
    regular language over the event alphabet). Each user's events
    collapse to a path string in (ts, event_id) order — click 'c',
    view 'v', purchase 'p', other 'o' — and the funnel pattern
    ``cv*p`` (click, any views, purchase), purchase streaks ``pp+``,
    and terminal conversion are counted by non-overlapping leftmost
    regex matching, identical in RE2 and the JVM for star-only
    patterns (no alternation ambiguity).

    Order determinism is the load-bearing part: the string is built by
    sorting each user's collected (ts, event_id, sym) structs — an
    explicit total order, never collect-order. One shuffle on user_id;
    per-user state is the path string (bounded by events-per-user, the
    session-length bound every MATCH_RECOGNIZE engine also carries —
    a user's pattern state never leaves its partition). At 100 TB the
    alphabet-projection trick is also the STORAGE answer: pattern
    queries scan a symbols column, not the event payload."""
    ev = load(spark, sf_dir, "events")
    sym = ev.select(
        "user_id",
        F.struct(
            "ts",
            "event_id",
            F.when(F.col("event_type") == "click", "c")
            .when(F.col("event_type") == "view", "v")
            .when(F.col("event_type") == "purchase", "p")
            .otherwise("o")
            .alias("s"),
        ).alias("e"),
    )
    paths = sym.groupBy("user_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list("e")), lambda e: e["s"]
            ),
            "",
        ).alias("path"),
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
    )
    return paths.select(
        "user_id",
        "n_events",
        F.size(F.expr("regexp_extract_all(path, 'cv*p', 0)"))
        .cast("bigint")
        .alias("n_funnels"),
        F.size(F.expr("regexp_extract_all(path, 'pp+', 0)"))
        .cast("bigint")
        .alias("n_buy_streaks"),
        F.col("path").endswith("p").alias("ends_converted"),
    )


@register(
    "win_drawdown",
    oracle="""
WITH running AS (
  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
    SUM(CAST(value AS DECIMAL(18,2))) OVER (
      PARTITION BY user_id ORDER BY ts, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS bal
  FROM events
), peaks AS (
  SELECT user_id, event_id, ts, bal,
    MAX(bal) OVER (
      PARTITION BY user_id ORDER BY ts, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak
  FROM running
)
SELECT user_id,
  CAST(MAX(peak - bal) AS DOUBLE) AS max_drawdown,
  CAST(MAX(peak) AS DOUBLE) AS peak_balance,
  CAST(COUNT(*) AS BIGINT) AS n_events
FROM peaks GROUP BY user_id
""",
    tags=("window", "finance"),
)
def win_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum drawdown per user — the risk statistic every ledger /
    portfolio monitor computes (largest peak-to-trough fall of the
    running balance): one cumulative-sum window, one running-max
    window over it, one aggregation of the gap. Composes W4's running
    total with a second stacked frame — the point this entry pins is
    that BOTH windows share the identical partitioning and ordering,
    so Catalyst evaluates them in ONE Window operator after ONE
    shuffle (visible in the plan: a single Exchange, a single sort,
    two window functions in the same node). Exact DECIMAL throughout;
    the per-user drawdown maximum is order-deterministic via the
    (ts, event_id) tie-break. At 100 TB: per-user state, one shuffle,
    output user-sized — the same envelope as win_running_total."""
    ev = load(spark, sf_dir, "events")
    # both windows share (partition, order, frame): one Exchange, one
    # Sort, one Window node evaluates cumsum and running-max-of-cumsum
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    bal = F.sum(F.col("value").cast("decimal(18,2)")).over(w)
    frame = ev.select(
        "user_id",
        bal.alias("bal"),
        F.max(bal).over(w).alias("peak"),
    )
    return frame.groupBy("user_id").agg(
        F.max(F.col("peak") - F.col("bal")).cast("double").alias(
            "max_drawdown"
        ),
        F.max("peak").cast("double").alias("peak_balance"),
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
    )


@register(
    "win_lead_label",
    oracle="""
SELECT event_id, user_id, event_type,
  MIN(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END)
    OVER (PARTITION BY user_id ORDER BY ts, event_id
          ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
    - epoch_us(ts) AS label_us
FROM events
""",
    tags=("window", "feature"),
)
def win_lead_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supervised-label generation: time-to-next-purchase per event —
    for every event the microseconds until the SAME user's next
    purchase (NULL when none follows = right-censored). This is the
    standard churn/conversion label pass of a training pipeline: the
    label is a leakage-free forward-looking window (strictly AFTER the
    current row via 1 FOLLOWING), never a join back onto the future
    table. Microsecond BIGINT arithmetic keeps it exact across
    engines (no float epoch). One shuffle on user_id, one ordered
    window — at 100 TB this partitions by the label key and scales
    with the largest user history, not total rows."""
    ev = load(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(1, W.unboundedFollowing)
    )
    nxt = F.min(
        F.when(F.col("event_type") == "purchase", F.unix_micros("ts"))
    ).over(w)
    return ev.select(
        "event_id",
        "user_id",
        "event_type",
        (nxt - F.unix_micros("ts")).alias("label_us"),
    )


@register(
    "win_rolling_regression",
    oracle="""
WITH daily AS (
  SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS d,
    CAST(SUM(CAST(round(value, 3) AS DECIMAL(18,3))) AS DECIMAL(18,3)) AS y
  FROM events GROUP BY user_id, CAST(date_trunc('day', ts) AS DATE)
), indexed AS (
  SELECT user_id, d, y,
    CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY d) AS BIGINT)
      AS x
  FROM daily
), framed AS (
  SELECT user_id, d, y,
    CAST(COUNT(*) OVER w AS BIGINT) AS n,
    CAST(SUM(x) OVER w AS BIGINT) AS sx,
    CAST(SUM(x * x) OVER w AS BIGINT) AS sxx,
    CAST(SUM(y) OVER w AS DOUBLE) AS sy,
    CAST(SUM(x * y) OVER w AS DOUBLE) AS sxy
  FROM indexed
  WINDOW w AS (PARTITION BY user_id ORDER BY x
               ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
)
SELECT user_id, d, round(CAST(y AS DOUBLE), 6) AS y,
  round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope_7d
FROM framed WHERE n = 7
""",
    tags=("window", "stats"),
)
def win_rolling_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLING regression — the trailing-window trend every
    monitoring/finance dashboard draws (is this user's daily spend
    accelerating?): per user, the OLS slope of daily value against
    the active-day index over a trailing 7-row frame, computed
    entirely from WINDOW-FRAME SUFFICIENT STATISTICS (n, Σx, Σx²,
    Σy, Σxy over the frame) — the frame-sum trick that turns a
    per-window regression into five built-in SUM windows sharing one
    sort, no UDF, no per-window refit. Completes the regression
    family: agg_ols_trend (global), agg_ols_multifeature (grouped
    multi-feature), this one (windowed).

    Plan shape: one hash agg to (user, day) — the only row-scale
    stage — then ONE window sort per user partition evaluating all
    five frame sums together (Spark fuses same-frame windows into a
    single WindowExec). Warm-up rows (frame not yet full) are
    excluded so every slope covers exactly 7 active days. Float
    discipline: x is an exact BIGINT rank, its sums exact; y stays
    DECIMAL(18,3) THROUGH the frame sums (exact and order-independent
    — a double frame sum would expose the engines' different window
    summation orders, segment tree vs sequential), casting to DOUBLE
    only for the slope arithmetic on identical trees, rounded to
    6 dp."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        "user_id", F.to_date(F.date_trunc("day", "ts")).alias("d")
    ).agg(
        F.sum(F.round("value", 3).cast("decimal(18,3)"))
        .cast("decimal(18,3)")
        .alias("y")
    )
    w_rank = W.partitionBy("user_id").orderBy("d")
    indexed = daily.withColumn(
        "x", F.row_number().over(w_rank).cast("bigint")
    )
    w7 = W.partitionBy("user_id").orderBy("x").rowsBetween(-6, 0)
    framed = indexed.select(
        "user_id",
        "d",
        "y",
        F.count(F.lit(1)).over(w7).cast("bigint").alias("n"),
        F.sum("x").over(w7).cast("bigint").alias("sx"),
        F.sum(F.col("x") * F.col("x")).over(w7).cast("bigint").alias("sxx"),
        F.sum("y").over(w7).cast("double").alias("sy"),
        F.sum(F.col("x") * F.col("y")).over(w7).cast("double").alias("sxy"),
    )
    n, sx, sxx = F.col("n"), F.col("sx"), F.col("sxx")
    sy, sxy = F.col("sy"), F.col("sxy")
    return framed.filter(n == 7).select(
        "user_id",
        "d",
        F.round(F.col("y").cast("double"), 6).alias("y"),
        F.round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6).alias(
            "slope_7d"
        ),
    )


_HAMPEL_K = "4.4478"  # 3 sigma * 1.4826 (normal-consistent MAD factor)


@register(
    "win_hampel_filter",
    oracle=f"""
WITH d AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
    CAST(SUM(CAST(round(value, 2) AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS v
  FROM events WHERE value IS NOT NULL GROUP BY event_type, CAST(ts AS DATE)
), w AS (
  SELECT event_type, day, v,
    list(v) OVER (PARTITION BY event_type ORDER BY day
      ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS lst
  FROM d
), m AS (
  SELECT event_type, day, v,
    CAST(len(lst) AS BIGINT) AS n_window,
    list_sort(lst)[CAST(floor((len(lst) + 1) / 2.0) AS BIGINT)] AS med,
    lst
  FROM w
), md AS (
  SELECT event_type, day, v, n_window, med,
    list_sort(list_transform(lst, x -> abs(x - med)))[
      CAST(floor((n_window + 1) / 2.0) AS BIGINT)] AS mad
  FROM m
)
SELECT event_type, day, CAST(v AS DOUBLE) AS v, n_window,
  CAST(med AS DOUBLE) AS rolling_med,
  CAST(mad AS DOUBLE) AS rolling_mad,
  CAST(abs(v - med) AS DOUBLE) > {_HAMPEL_K} * CAST(mad AS DOUBLE)
    AS is_spike,
  CAST(CASE WHEN CAST(abs(v - med) AS DOUBLE)
                 > {_HAMPEL_K} * CAST(mad AS DOUBLE)
       THEN med ELSE v END AS DOUBLE) AS despiked
FROM md
""",
    tags=("window", "timeseries", "dq"),
)
def win_hampel_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HAMPEL FILTER — rolling-window robust despike of the per-segment
    daily revenue series (Hampel 1974; the standard sensor/metric
    despiker: a point more than 3 normal-consistent MADs from the
    trailing-7 rolling MEDIAN is a spike and is replaced by that
    median). Complements agg_anomaly_mad, which flags against GLOBAL
    median/MAD — the Hampel form adapts to level shifts, so a step
    change doesn't flag every subsequent day.

    Exactness despite rolling order statistics: the daily series is
    an exact DECIMAL(18,2) sum; the rolling median and MAD are TYPE-1
    lower-middle ranks (floor((n+1)/2)) picked from the sorted window
    array — no interpolation, both engines extract the identical
    DECIMAL element — and the spike test casts those exact decimals
    to double against one shared literal ({_HAMPEL_K}).

    Plan shape: one hash agg to the (day x segment) domain frame,
    then ONE window (partitioned by segment, 7-row frame) whose
    collect_list materializes <= 7 decimals per row — the sort is a
    7-element in-memory array sort inside codegen'd expressions, not
    a shuffle. At 100 TB the window input is the saturating calendar
    domain, never row-scale."""
    ev = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    d = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(
        F.sum(F.round("value", 2).cast("decimal(18,2)"))
        .cast("decimal(18,2)")
        .alias("v")
    )
    win = W.partitionBy("event_type").orderBy("day").rowsBetween(-6, 0)
    w = d.select(
        "event_type", "day", "v", F.collect_list("v").over(win).alias("lst")
    )
    k = F.floor((F.size("lst") + 1) / F.lit(2.0)).cast("int")
    m = w.select(
        "event_type",
        "day",
        "v",
        F.size("lst").cast("bigint").alias("n_window"),
        F.element_at(F.array_sort("lst"), k).alias("med"),
        "lst",
    )
    k2 = F.floor((F.col("n_window") + 1) / F.lit(2.0)).cast("int")
    md = m.select(
        "event_type",
        "day",
        "v",
        "n_window",
        "med",
        F.element_at(
            F.array_sort(
                F.transform("lst", lambda x: F.abs(x - F.col("med")))
            ),
            k2,
        ).alias("mad"),
    )
    spike = F.abs(F.col("v") - F.col("med")).cast("double") > F.lit(
        float(_HAMPEL_K)
    ) * F.col("mad").cast("double")
    return md.select(
        "event_type",
        "day",
        F.col("v").cast("double").alias("v"),
        "n_window",
        F.col("med").cast("double").alias("rolling_med"),
        F.col("mad").cast("double").alias("rolling_mad"),
        spike.alias("is_spike"),
        F.when(spike, F.col("med"))
        .otherwise(F.col("v"))
        .cast("double")
        .alias("despiked"),
    )


_LOCF_MOD = 97  # sparsifying user sample: the panel with genuine gaps


@register(
    "win_locf_backfill",
    oracle=f"""
WITH obs AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
    CAST(round(CAST(SUM(CAST(round(value, 2) AS DECIMAL(18,2))) AS DOUBLE)
               / COUNT(*), 6) AS DECIMAL(18,6)) AS obs
  FROM events
  WHERE value IS NOT NULL AND user_id % {_LOCF_MOD} = 0
  GROUP BY event_type, CAST(ts AS DATE)
), bounds AS (
  SELECT CAST(date_trunc('day', MIN(ts)) AS DATE) AS d0,
         CAST(date_trunc('day', MAX(ts)) AS DATE) AS d1 FROM events
), calendar AS (
  SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
  FROM bounds
), grid AS (
  SELECT c.day, t.event_type
  FROM calendar c, (SELECT DISTINCT event_type FROM events) t
), sparse AS (
  SELECT g.day, g.event_type, o.obs
  FROM grid g LEFT JOIN obs o
    ON g.day = o.day AND g.event_type = o.event_type
)
SELECT day, event_type, CAST(obs AS DOUBLE) AS obs,
  CAST(LAST_VALUE(obs IGNORE NULLS) OVER (
    PARTITION BY event_type ORDER BY day
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS filled,
  obs IS NULL AND LAST_VALUE(obs IGNORE NULLS) OVER (
    PARTITION BY event_type ORDER BY day
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) IS NOT NULL
    AS is_carried
FROM sparse
""",
    tags=("window", "timeseries"),
)
def win_locf_backfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LOCF (last-observation-carried-forward) panel densification —
    the forward-fill every feature-store and panel-regression pipeline
    needs (a sensor that reports intermittently still has a "current
    value" on every calendar day): a sparse per-segment daily series
    (deliberately sparsified to a 1/{_LOCF_MOD} user panel so gaps are
    real at any SF) is densified onto the full calendar x segment grid,
    missing days carry the most recent prior observation, and rows
    with no prior observation stay NULL (leading edge — LOCF never
    invents data). Complements events_gapfill_daily, which ZERO-fills:
    zero is the right identity for additive counts, LOCF for level
    readings. `is_carried` marks synthetic values so downstream
    models can weight them.

    Plan shape: one hash agg to the sparse observation frame, the
    1-row bounds aggregate -> sequence/explode calendar (engine-side,
    never collected), a broadcast grid LEFT JOIN, and ONE window
    (partitioned by segment over the calendar-domain frame) using
    last(ignorenulls) — Spark's frame-bounded IGNORE NULLS scan, the
    same physical shape as DuckDB's LAST_VALUE IGNORE NULLS. At
    100 TB the window input is |days| x |segments|, saturating."""
    ev = load(spark, sf_dir, "events")
    obs = (
        ev.filter(
            F.col("value").isNotNull()
            & (F.col("user_id") % _LOCF_MOD == 0)
        )
        .groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(
            F.round(
                F.sum(F.round("value", 2).cast("decimal(18,2)"))
                .cast("double")
                / F.count(F.lit(1)),
                6,
            )
            .cast("decimal(18,6)")
            .alias("obs")
        )
    )
    return _locf_densify(ev, obs)


def _locf_densify(ev: DataFrame, obs: DataFrame) -> DataFrame:
    """Stateless densification view over a sparse (day, event_type,
    obs) panel: calendar x segment grid from the full events bounds,
    LEFT JOIN the observations, forward-fill with last-IGNORE NULLS.
    Shared by the batch entry above and the streaming twins
    (streaming/batch_equiv.py::stream_locf_incremental and the TWS
    golden in tests/test_streaming.py), so the serving-layer fill can
    never drift from the batch specification."""
    bounds = ev.agg(
        F.to_date(F.date_trunc("day", F.min("ts"))).alias("d0"),
        F.to_date(F.date_trunc("day", F.max("ts"))).alias("d1"),
    )
    calendar = bounds.select(
        F.explode(
            F.sequence(F.col("d0"), F.col("d1"))
        ).alias("day")
    )
    types = ev.select("event_type").distinct()
    grid = F.broadcast(calendar).crossJoin(F.broadcast(types))
    sparse = grid.join(obs, ["day", "event_type"], "left")
    win = (
        W.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    filled = F.last("obs", ignorenulls=True).over(win)
    return sparse.select(
        "day",
        "event_type",
        F.col("obs").cast("double").alias("obs"),
        filled.cast("double").alias("filled"),
        (F.col("obs").isNull() & filled.isNotNull()).alias("is_carried"),
    )


@register(
    "events_attribution_position",
    oracle="""
WITH seq AS (
  SELECT event_id, user_id, ts, event_type,
    MIN(CASE WHEN event_type = 'purchase'
             THEN {'ts': ts, 'event_id': event_id} END)
      OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS conv
  FROM events
), touches AS (
  SELECT user_id, ts, event_id, event_type, conv.event_id AS conv_id
  FROM seq
  WHERE event_type IN ('view', 'click') AND conv IS NOT NULL
    AND conv.ts <= ts + INTERVAL 7 DAY
), ranked AS (
  SELECT event_type,
    ROW_NUMBER() OVER (PARTITION BY user_id, conv_id
                       ORDER BY ts, event_id) AS rn_asc,
    ROW_NUMBER() OVER (PARTITION BY user_id, conv_id
                       ORDER BY ts DESC, event_id DESC) AS rn_desc,
    COUNT(*) OVER (PARTITION BY user_id, conv_id) AS n
  FROM touches
), credited AS (
  SELECT event_type,
    CASE WHEN n = 1 THEN CAST(1.0 AS DECIMAL(18,9))
         WHEN n = 2 THEN CAST(0.5 AS DECIMAL(18,9))
         WHEN rn_asc = 1 OR rn_desc = 1 THEN CAST(0.4 AS DECIMAL(18,9))
         ELSE CAST(round(0.2 / (n - 2), 9) AS DECIMAL(18,9))
    END AS credit
  FROM ranked
)
SELECT event_type,
  CAST(COUNT(*) AS BIGINT) AS n_touches,
  round(CAST(SUM(credit) AS DOUBLE), 6) AS credit
FROM credited GROUP BY event_type
""",
    tags=("window", "integration"),
)
def events_attribution_position(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POSITION-BASED (U-shaped, 40/20/40) attribution — the third
    credit model on the shared touch-assignment pipeline
    (events_attribution_last takes the final touch, _linear splits
    1/n; the U-shape gives 40% to the FIRST touch that opened the
    path and 40% to the LAST that closed it, splitting the remaining
    20% across the middle — the standard compromise between first-
    and last-touch bias). The expensive stage (forward struct-min
    window assigning every view/click its next purchase within 7
    days) is byte-identical to the other two entries; only the credit
    expression changes.

    Exactness: single-touch paths get the whole 1.0 and two-touch
    paths 0.5 each (the degenerate U where edges overlap — stated so
    credit always sums to exactly 1 per conversion); edge credits are
    the exact DECIMAL 0.4; each middle share snaps round(0.2/(n-2), 9)
    to a 9-dp DECIMAL before the ORDER-FREE decimal sum (the 1/(n-2)
    division is IEEE-exact-identical on both engines). Rank ties
    break by event_id in both directions, so rn_asc/rn_desc are
    deterministic.

    Plan shape: one per-user window Exchange serves the conversion
    assignment, one per-(user, conv) window serves both ranks and the
    path size, one hash agg to |touch types| rows. Same single
    user-keyed shuffle discipline as the sibling entries; at 100 TB
    nothing here exceeds the per-user sort the family already pays —
    and since r11 that sort lives in the shared `_touch_assignment`
    artifact, so this entry itself is one scan + one hash agg."""
    # (ts, event_id) is a STRICT total order within a path, so the
    # descending rank is n + 1 - rn_asc — the artifact's one window
    # sort serves both edge ranks and the path size (the oracle spells
    # out both ROW_NUMBERs; identical values)
    ranked = _touch_assignment(spark, sf_dir).withColumn(
        "rn_desc", F.col("n") + 1 - F.col("rn_asc")
    )
    n = F.col("n")
    credit = (
        F.when(n == 1, F.lit("1.0").cast("decimal(18,9)"))
        .when(n == 2, F.lit("0.5").cast("decimal(18,9)"))
        .when(
            (F.col("rn_asc") == 1) | (F.col("rn_desc") == 1),
            F.lit("0.4").cast("decimal(18,9)"),
        )
        .otherwise(
            F.round(F.lit(0.2) / (n - 2), 9).cast("decimal(18,9)")
        )
    )
    return (
        ranked.select("event_type", credit.alias("credit"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_touches"),
            F.round(F.sum("credit").cast("double"), 6).alias("credit"),
        )
    )
