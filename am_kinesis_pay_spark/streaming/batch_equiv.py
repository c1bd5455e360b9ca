"""Streaming semantics as batch queries (SURVEY.md §2.9).

Structured Streaming's core property (the batch≡stream equivalence of
the incrementalized plan) lets every streaming operator be specified —
and oracle-checked — as a batch query over the bounded ``events``
table. ``tests/test_streaming.py`` replays the same data through
``readStream`` and asserts the results are identical; these batch
forms are the specification.

Scale notes: tumbling/sliding windows and dedup shuffle once on
(key, window); session windows shuffle on key then sort within
partitions. Watermarking bounds state: at 100 TB/day the state store
holds only windows newer than the watermark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from am_kinesis_pay_spark.functions.compat import dsum
from am_kinesis_pay_spark.registry import register
from am_kinesis_pay_spark.tables import load


@register(
    "stream_tumbling_count",
    oracle="""
SELECT CAST(time_bucket(INTERVAL '1 day', ts) AS TIMESTAMP) AS window_start,
  CAST(time_bucket(INTERVAL '1 day', ts) + INTERVAL '1 day' AS TIMESTAMP) AS window_end,
  event_type,
  COUNT(*) AS n_events,
  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events
GROUP BY 1, 2, 3
""",
    tags=("streaming",),
)
def stream_tumbling_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[DRV] events per type per tumbling day — the poll-cadence
    telemetry (kinesis-pay.php:263) aggregated into fixed windows."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


@register(
    "stream_sliding_avg",
    oracle="""
WITH expanded AS (
  SELECT unnest([
      time_bucket(INTERVAL '12 hours', ts),
      time_bucket(INTERVAL '12 hours', ts) - INTERVAL '12 hours'
    ]) AS window_start,
    value
  FROM events
)
SELECT CAST(window_start AS TIMESTAMP) AS window_start,
  CAST(window_start + INTERVAL '24 hours' AS TIMESTAMP) AS window_end,
  COUNT(*) AS n_events,
  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_value
FROM expanded
GROUP BY 1, 2
""",
    tags=("streaming",),
)
def stream_sliding_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[DRV] 24h windows sliding every 12h — each event lands in
    exactly two windows (epoch-aligned, matching Spark's alignment).
    AVG decomposed into exact-sum/count for cross-engine parity."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "24 hours", "12 hours").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (dsum("value") / F.count(F.lit(1))).alias("avg_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n_events",
            "avg_value",
        )
    )


@register(
    "stream_session_window",
    oracle="""
WITH flagged AS (
  SELECT user_id, ts, value,
    CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
           OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts) >= INTERVAL '30 minutes'
         THEN 1 ELSE 0 END AS new_session
  FROM events
), numbered AS (
  SELECT user_id, ts, value,
    SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM flagged
)
SELECT user_id,
  CAST(MIN(ts) AS TIMESTAMP) AS session_start,
  CAST(MAX(ts) + INTERVAL '30 minutes' AS TIMESTAMP) AS session_end,
  COUNT(*) AS n_events,
  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM numbered
GROUP BY user_id, session_id
""",
    tags=("streaming",),
)
def stream_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[DRV] per-user sessions with a 30-minute gap timeout — the
    poll-burst grouping implied by the reference's failsafe window
    (kinesis-pay.php:264-268). Spark's native session_window; the
    oracle reconstructs identical sessions with lag + gap cumsum
    (session end = last event + gap, Spark's convention; an event at
    exactly gap distance starts a new session on both paths)."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value").alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


@register(
    "stream_watermark_expiry",
    oracle="""
WITH first_seen AS (
  SELECT user_id, ts,
    MIN(ts) OVER (PARTITION BY user_id) AS created_at
  FROM events
)
SELECT user_id,
  CASE WHEN ts <= created_at + INTERVAL '10 minutes' THEN 'on_time' ELSE 'expired' END AS expiry_route,
  COUNT(*) AS n_events
FROM first_seen
GROUP BY 1, 2
""",
    tags=("streaming",),
)
def stream_watermark_expiry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[REF] kinesis-pay.php:210,245-268 — the 10-minute expiry
    deadline as an event-time routing rule: events after
    first_seen+10min take the 'expired' path (the reference redirects;
    a streaming watermark would GC the state — see
    streaming/state_machine.py for the stateful variant)."""
    ev = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id")
    return (
        ev.withColumn("created_at", F.min("ts").over(w))
        .withColumn(
            "expiry_route",
            F.when(
                F.col("ts") <= F.col("created_at") + F.expr("INTERVAL 10 MINUTES"),
                "on_time",
            ).otherwise("expired"),
        )
        .groupBy("user_id", "expiry_route")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )


@register(
    "stream_dedup_payment",
    oracle="""
SELECT user_id, event_type, event_id, CAST(ts AS TIMESTAMP) AS ts, value
FROM (
  SELECT user_id, event_type, event_id, ts, value,
    ROW_NUMBER() OVER (PARTITION BY user_id, event_type ORDER BY ts) AS rn
  FROM events
)
WHERE rn = 1
""",
    tags=("streaming",),
)
def stream_dedup_payment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[REF] kinesis-pay.php:515-518 — exactly-once processing keyed by
    globalPaymentId: keep the FIRST event per (user, type). Batch form
    uses a deterministic row_number (ts is unique) rather than
    dropDuplicates, whose row pick is arbitrary; the streaming form
    (dropDuplicates + watermark) is first-arrival by definition."""
    ev = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id", "event_type").orderBy("ts")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_type", "event_id", "ts", "value")
    )


@register(
    "stream_poll_throttle_log",
    oracle="""
SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, poll_seq
FROM (
  SELECT user_id, ts,
    CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts) AS INT) AS poll_seq
  FROM events
)
WHERE poll_seq % 10 = 0
""",
    tags=("streaming",),
)
def stream_poll_throttle_log(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[REF] kinesis-pay.php:302-304 — emit every 10th poll per payment
    to the audit log (per-key sequence, then modulus — the stream-
    ordered version of filter_mod_sample)."""
    ev = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts")
    return (
        ev.withColumn("poll_seq", F.row_number().over(w))
        .filter(F.col("poll_seq") % 10 == 0)
        .select("user_id", "ts", "poll_seq")
    )


@register(
    "stream_state_machine_batch",
    oracle="""
WITH first_seen AS (
  SELECT user_id, MIN(ts) AS created_at FROM events GROUP BY user_id
), terminal AS (
  SELECT e.user_id,
    MIN(CASE WHEN e.event_type = 'purchase' THEN e.ts END) AS first_processed,
    MIN(CASE WHEN e.event_type = 'error' THEN e.ts END) AS first_rejected
  FROM events e JOIN first_seen f ON e.user_id = f.user_id
  WHERE e.ts <= f.created_at + INTERVAL '10 minutes'
  GROUP BY e.user_id
)
SELECT f.user_id,
  CASE
    WHEN t.first_processed IS NOT NULL
     AND (t.first_rejected IS NULL OR t.first_processed <= t.first_rejected)
    THEN 'processed'
    WHEN t.first_rejected IS NOT NULL THEN 'rejected'
    ELSE 'expired'
  END AS final_state,
  CAST(COALESCE(
    CASE
      WHEN t.first_processed IS NOT NULL
       AND (t.first_rejected IS NULL OR t.first_processed <= t.first_rejected)
      THEN t.first_processed
      ELSE t.first_rejected
    END,
    f.created_at + INTERVAL '10 minutes'
  ) AS TIMESTAMP) AS decided_at
FROM first_seen f
LEFT JOIN terminal t ON f.user_id = t.user_id
""",
    tags=("streaming", "state"),
)
def stream_state_machine_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[REF] kinesis-pay.php:239-249,323-346 — the payment state
    machine in batch form: pending → processed (first 'purchase') /
    rejected (first 'error') / expired (deadline passes with no
    terminal event). Only the FIRST terminal transition counts — the
    exactly-once approval contract (:515-518). The true incremental
    version with timeouts lives in streaming/state_machine.py."""
    ev = load(spark, sf_dir, "events")
    first_seen = ev.groupBy("user_id").agg(F.min("ts").alias("created_at"))
    in_window = ev.join(first_seen, "user_id").filter(
        F.col("ts") <= F.col("created_at") + F.expr("INTERVAL 10 MINUTES")
    )
    terminal = in_window.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "first_processed"
        ),
        F.min(F.when(F.col("event_type") == "error", F.col("ts"))).alias(
            "first_rejected"
        ),
    )
    processed_wins = F.col("first_processed").isNotNull() & (
        F.col("first_rejected").isNull()
        | (F.col("first_processed") <= F.col("first_rejected"))
    )
    return (
        first_seen.join(terminal, "user_id", "left")
        .select(
            "user_id",
            F.when(processed_wins, "processed")
            .when(F.col("first_rejected").isNotNull(), "rejected")
            .otherwise("expired")
            .alias("final_state"),
            F.coalesce(
                F.when(processed_wins, F.col("first_processed")).otherwise(
                    F.col("first_rejected")
                ),
                F.col("created_at") + F.expr("INTERVAL 10 MINUTES"),
            ).alias("decided_at"),
        )
    )


@register(
    "stream_window_percentile",
    oracle="""
SELECT CAST(time_bucket(INTERVAL '1 day', ts) AS TIMESTAMP) AS window_start,
  event_type,
  round(quantile_cont(value, 0.50), 6) AS p50,
  round(quantile_cont(value, 0.95), 6) AS p95,
  COUNT(*) AS n_events
FROM events
GROUP BY 1, 2
""",
    tags=("streaming", "percentile"),
)
def stream_window_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[DRV] per-window order statistics: median and p95 latency-style
    values per event type per tumbling day — the SLO-monitoring shape.
    Batch form uses exact interpolated percentiles (oracle-checked);
    the incremental counterpart swaps in percentile_approx, whose
    KLL-style sketch is mergeable and therefore valid inside a
    streaming state store where a full per-window sort is not."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(
            F.round(F.expr("percentile(value, 0.50)"), 6).alias("p50"),
            F.round(F.expr("percentile(value, 0.95)"), 6).alias("p95"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "p50",
            "p95",
            "n_events",
        )
    )


@register(
    "stream_stream_join",
    oracle="""
SELECT a.event_id AS click_id,
  b.event_id AS purchase_id,
  a.user_id AS user_id,
  CAST(date_diff('second', a.ts, b.ts) AS BIGINT) AS lag_sec
FROM events a
JOIN events b
  ON a.user_id = b.user_id
 AND b.ts > a.ts
 AND b.ts <= a.ts + INTERVAL 5 MINUTE
WHERE a.event_type = 'click' AND b.event_type = 'purchase'
""",
    tags=("streaming", "join"),
)
def stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[DRV] stream-stream interval join, batch specification: each
    click attributed to every purchase by the same user within the next
    5 minutes (the reference's payment-created -> status-callback
    correlation, kinesis-pay.php:231-263, as a two-stream join). The
    incremental form joins two watermarked readStreams on the same
    equi + time-band condition (tests/test_streaming.py::
    test_stream_stream_join_matches_batch replays exactly this plan);
    the watermark plus the closed 5-minute band bounds both state
    stores, so at 100 TB/day each side retains only ~watermark+band
    of rows keyed by user_id — state is O(rate x window), not O(
    history). Batch plan: two pushed-down scans of one file, a single
    shuffle on user_id each side into a sort-merge join; the band
    predicate rides the join as a secondary condition, never a
    cross-product."""
    ev = load(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id"),
        F.col("ts").alias("click_ts"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("purchase_ts"),
    )
    return (
        clicks.join(
            purchases,
            (F.col("user_id") == F.col("p_user"))
            & (F.col("purchase_ts") > F.col("click_ts"))
            & (
                F.col("purchase_ts")
                <= F.col("click_ts") + F.expr("INTERVAL 5 MINUTES")
            ),
        )
        .select(
            "click_id",
            "purchase_id",
            "user_id",
            (
                F.unix_timestamp("purchase_ts") - F.unix_timestamp("click_ts")
            ).alias("lag_sec"),
        )
    )


@register(
    "stream_static_enrich",
    oracle="""
SELECT e.event_id, e.user_id, c.c_name, c.c_mktsegment, e.value
FROM events e JOIN customer c ON e.user_id = c.c_custkey
WHERE e.event_type = 'purchase'
""",
    tags=("streaming", "join"),
)
def stream_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[DRV] stream-static dimension enrichment, batch specification:
    each purchase event joined to the (slowly-changing, broadcast-able)
    customer dimension — the standard streaming-ETL enrichment the
    reference performs per poll when it resolves a payment's member
    record (kinesis-pay.php:298-300), lifted to a stream. The
    incremental form joins a watermarked readStream against the SAME
    static DataFrame (tests/test_streaming.py::
    test_stream_static_enrich_matches_batch): Spark re-plans the
    static side per micro-batch, so dim updates between batches are
    picked up, and the join needs NO state store at all — the static
    side broadcasts into every micro-batch, which is why this shape
    scales to any stream rate. value passes through unrounded: raw
    column, bit-identical on both engines."""
    ev = load(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    cust = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_mktsegment"
    )
    return ev.join(
        F.broadcast(cust), ev.user_id == cust.c_custkey
    ).select("event_id", "user_id", "c_name", "c_mktsegment", "value")


@register(
    "stream_outer_join",
    oracle="""
SELECT a.event_id AS click_id,
  b.event_id AS purchase_id,
  a.user_id AS user_id,
  CAST(date_diff('second', a.ts, b.ts) AS BIGINT) AS lag_sec
FROM (SELECT * FROM events WHERE event_type = 'click') a
LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') b
  ON a.user_id = b.user_id
 AND b.ts > a.ts
 AND b.ts <= a.ts + INTERVAL 5 MINUTE
""",
    tags=("streaming", "join"),
)
def stream_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[DRV] stream-stream LEFT OUTER interval join, batch
    specification — the abandonment detector that the inner form
    (stream_stream_join) cannot express: every click appears, matched
    to its within-5-minute purchases OR with NULL purchase columns
    when none arrives. In the incremental form this is exactly the
    join class watermarks exist for: the engine may emit the NULL row
    only once the watermark passes click_ts + 5 minutes (no purchase
    can still arrive), so BOTH sides need watermarks and the outer
    row's latency equals the allowed lateness — the
    completeness-vs-latency trade stated as a join type
    (tests/test_streaming.py::test_stream_outer_join_matches_batch
    replays this plan on a real readStream). State stays
    O(rate x (watermark + band)) per side keyed on user_id, as in the
    inner form; the unmatched-click scan is the state store's expiry
    sweep, not a second pass. Reference parity: payments whose status
    callback never arrives are precisely the rows the reference's
    expiry path reaps (kinesis-pay.php:210,264-268)."""
    ev = load(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id"),
        F.col("ts").alias("click_ts"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("purchase_ts"),
    )
    return clicks.join(
        purchases,
        (F.col("user_id") == F.col("p_user"))
        & (F.col("purchase_ts") > F.col("click_ts"))
        & (
            F.col("purchase_ts")
            <= F.col("click_ts") + F.expr("INTERVAL 5 MINUTES")
        ),
        "left",
    ).select(
        "click_id",
        "purchase_id",
        "user_id",
        (
            F.unix_timestamp("purchase_ts") - F.unix_timestamp("click_ts")
        ).cast("bigint").alias("lag_sec"),
    )


@register(
    "stream_topk_per_window",
    oracle="""
WITH counts AS (
  SELECT CAST(time_bucket(INTERVAL '1 day', ts) AS TIMESTAMP)
           AS window_start,
    event_type, CAST(COUNT(*) AS BIGINT) AS n_events
  FROM events GROUP BY 1, 2
), ranked AS (
  SELECT window_start, event_type, n_events,
    CAST(ROW_NUMBER() OVER (PARTITION BY window_start
      ORDER BY n_events DESC, event_type) AS INT) AS rnk
  FROM counts
)
SELECT window_start, event_type, n_events, rnk
FROM ranked WHERE rnk <= 3
""",
    tags=("streaming",),
)
def stream_topk_per_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[DRV] Trending-items: top-3 event types per tumbling day — the
    dashboard staple ("what's hot this hour?"). Structured Streaming
    cannot rank INSIDE the stream (ordinary window functions are
    unsupported over unbounded input), so the production shape is
    two-phase: the STREAM maintains the per-(window, type) counts —
    incremental, mergeable state, exactly stream_tumbling_count's
    aggregation — and the RANK runs at the sink over each emitted
    window's handful of rows (foreachBatch / the serving layer). The
    batch form here fuses both phases; the golden test in
    test_streaming.py runs the REAL readStream aggregation to
    completion and applies the identical sink-side rank, proving the
    two-phase decomposition equals the fused batch query.

    Scale shape: the stream side is one incremental hash aggregation
    whose state is |windows| x |event types| rows; the rank partitions
    by window_start over that already-reduced frame (day-count
    partitions of |event_types| rows each). Ties break by event_type
    so top-3 is deterministic."""
    ev = load(spark, sf_dir, "events")
    counts = ev.groupBy(
        F.window("ts", "1 day").alias("w"), "event_type"
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_events"))
    from pyspark.sql import Window as W

    ranked = counts.select(
        F.col("w.start").alias("window_start"), "event_type", "n_events"
    ).withColumn(
        "rnk",
        F.row_number()
        .over(
            W.partitionBy("window_start").orderBy(
                F.col("n_events").desc(), "event_type"
            )
        )
        .cast("int"),
    )
    return ranked.filter(F.col("rnk") <= 3)


#: trailing MAU window in days — a deliberate module-local mirror of
#: operators/integration.py::_STICK_WINDOW and
#: streaming/tws_stickiness.py::STICK_WINDOW (importing across registry
#: modules at decoration time risks import-order cycles; the three
#: literals are pinned equal by tests/test_streaming.py)
_STICK_W = 28


@register(
    "stream_stickiness_incremental",
    oracle=f"""
WITH du AS (SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events),
days AS (SELECT DISTINCT d FROM du),
dau AS (SELECT d, CAST(COUNT(*) AS BIGINT) AS dau FROM du GROUP BY d),
mau AS (
  SELECT days.d, CAST(COUNT(DISTINCT du.user_id) AS BIGINT) AS mau
  FROM days JOIN du
    ON du.d BETWEEN days.d - INTERVAL {_STICK_W - 1} DAY AND days.d
  GROUP BY days.d
)
SELECT dau.d AS day, dau.dau, mau.mau,
  round(CAST(dau.dau AS DOUBLE) / mau.mau, 6) AS stickiness
FROM dau JOIN mau ON dau.d = mau.d
""",
    tags=("streaming", "incremental", "events"),
)
def stream_stickiness_incremental(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """INCREMENTAL DAU/MAU stickiness maintenance (VERDICT r9 #7): the
    events table replayed as micro-batch epochs (event_id % 3, with
    epoch 1 REDELIVERED like sink_additive_rollup), each epoch folding
    only its NEW information into two state frames — `seen` (first-seen
    (day, user) pairs) and `cov` ((user, spine-day) trailing-window
    coverage) — and emitting additive delta rows. Identity: a user
    with active-day set S contributes +1 MAU to each day of
    union([s, s+{_STICK_W - 1}] for s in S), so emitting +1 per NEWLY
    covered (user, day) makes MAU(d) = sum of deltas at d; DAU deltas
    are the first-seen pairs themselves. Summing the changelog then
    equals the one-shot batch query (`events_stickiness_dau_mau` — the
    oracle here IS that entry's oracle), and the redelivered epoch is
    absorbed by the anti-joins: at-least-once in, exactly-once out.

    This is the batch SPECIFICATION of streaming/tws_stickiness.py
    (MapState per user, same delta algebra); the readStream golden
    test in tests/test_streaming.py pins the TWS changelog to this
    output. Plan shape per epoch: one distinct reduction, two
    left_anti joins against localCheckpointed state frames (each
    state frame is (day x user)-bounded — saturating calendar domain,
    never row-scale), one explode(sequence) with fixed
    x{_STICK_W} fan-out. At 100 TB/day the state frames are the
    store a production pipeline would keep in a table; the per-epoch
    work is proportional to the epoch's NEW pairs only."""
    ev = load(spark, sf_dir, "events").select(
        "event_id", F.to_date("ts").alias("d"), "user_id"
    )
    seen = None  # (d, user_id) first-seen pairs
    cov = None  # (user_id, cd) covered spine days
    deltas = []
    for epoch in (0, 1, 1, 2):  # epoch 1 redelivered on purpose
        batch = (
            ev.filter(F.col("event_id") % 3 == epoch)
            .select("d", "user_id")
            .distinct()
        )
        new_pairs = (
            batch
            if seen is None
            else batch.join(seen, ["d", "user_id"], "left_anti")
        )
        # state frames feed BOTH the next epoch's anti-join and the
        # union: cut lineage each epoch or the 4-epoch DAG re-derives
        # every prior epoch's distinct per reference. new_pairs is cut
        # BEFORE the coverage fan-out (r11 OPT: cand used to be built
        # on the UN-cut frame, so the epoch's distinct + anti-join ran
        # a second time inside new_cov's checkpoint)
        new_pairs = new_pairs.localCheckpoint()
        cand = new_pairs.select(
            "user_id",
            F.explode(
                F.sequence(
                    F.col("d"), F.date_add(F.col("d"), _STICK_W - 1)
                )
            ).alias("cd"),
        ).distinct()
        new_cov = (
            cand
            if cov is None
            else cand.join(cov, ["user_id", "cd"], "left_anti")
        )
        new_cov = new_cov.localCheckpoint()
        deltas.append(
            new_pairs.select(
                F.col("d").alias("day"),
                F.lit(1).cast("bigint").alias("dau_delta"),
                F.lit(0).cast("bigint").alias("mau_delta"),
            ).unionAll(
                new_cov.select(
                    F.col("cd").alias("day"),
                    F.lit(0).cast("bigint").alias("dau_delta"),
                    F.lit(1).cast("bigint").alias("mau_delta"),
                )
            )
        )
        seen = new_pairs if seen is None else seen.unionAll(new_pairs)
        cov = new_cov if cov is None else cov.unionAll(new_cov)
    changelog = deltas[0]
    for d in deltas[1:]:
        changelog = changelog.unionAll(d)
    rolled = changelog.groupBy("day").agg(
        F.sum("dau_delta").cast("bigint").alias("dau"),
        F.sum("mau_delta").cast("bigint").alias("mau"),
    )
    # observed days only (the batch entry's day spine): dau >= 1
    return rolled.filter(F.col("dau") >= 1).select(
        "day",
        "dau",
        "mau",
        F.round(F.col("dau").cast("double") / F.col("mau"), 6).alias(
            "stickiness"
        ),
    )


# ---------------------------------------------------------------------------
# Incremental despike / backfill twins (VERDICT r10 #7).
#
# The oracles are the BATCH entries' own oracle strings, looked up from
# the registry (operators.windows is imported by registry._load_all
# before this module, and importing it here directly is acyclic — it
# has no path back into streaming.*), so the twin's contract can never
# drift from the batch specification. tests/test_streaming.py addition-
# ally pins the two oracle strings equal through the public API.
# ---------------------------------------------------------------------------

from am_kinesis_pay_spark.operators import windows as _win_ops  # noqa: E402
from am_kinesis_pay_spark.registry import REGISTRY as _REG  # noqa: E402

_HAMPEL_ORACLE = _REG["win_hampel_filter"].oracle
_LOCF_ORACLE = _REG["win_locf_backfill"].oracle

#: Hampel output columns carried through the upsert changelog
_HAMPEL_COLS = (
    "v", "n_window", "rolling_med", "rolling_mad", "is_spike", "despiked",
)


@register(
    "stream_hampel_incremental",
    oracle=_HAMPEL_ORACLE,
    tags=("streaming", "incremental", "window", "dq"),
)
def stream_hampel_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL Hampel despike maintenance (VERDICT r10 #7): the
    events table replayed as 3 micro-batch epochs (event_id % 3), each
    epoch folding its partial day-sums into the per-segment daily
    accumulator and re-emitting an UPSERT for every row whose trailing
    7-ROW window changed — a dirty day's arrival (or a brand-new day's
    insertion, which shifts the row frames) affects exactly that day
    and the <= 6 following observed days, detected plan-side as
    max(dirty) over the same rowsBetween(-6, 0) frame the filter
    itself uses. Folding the changelog last-writer-wins per
    (event_type, day) equals the one-shot `win_hampel_filter` (the
    oracle here IS that entry's oracle string, registry-shared): the
    final upsert for each day was computed after the last batch that
    touched any window day, i.e. from the complete accumulator.

    This is the batch SPECIFICATION of streaming/tws_despike.py::
    HampelProcessor (MapState day -> exact cents, same affected-set
    algebra); the readStream golden in tests/test_streaming.py pins
    the TWS changelog fold to the batch output. Day sums are NOT
    redelivery-idempotent, so unlike the stickiness twin the epochs
    partition the stream exactly once — an at-least-once source
    composes with the upstream stream_dedup_payment.

    Plan shape per epoch: one partial hash agg on the epoch slice, a
    full-outer merge with the localCheckpointed accumulator (both
    sides (day x segment)-bounded — saturating calendar domain), and
    ONE 7-row window pass over the merged frame. At 100 TB/day the
    accumulator is the store a production pipeline keeps in a table;
    per-epoch work is the epoch's partials plus the domain frame."""
    ev = (
        load(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            "event_id",
            "event_type",
            F.to_date("ts").alias("day"),
            F.round("value", 2).cast("decimal(18,2)").alias("pv"),
        )
    )
    acc = None
    upserts = []
    winf = W.partitionBy("event_type").orderBy("day").rowsBetween(-6, 0)
    for seq in (0, 1, 2):
        part = (
            ev.filter(F.col("event_id") % 3 == seq)
            .groupBy("event_type", "day")
            .agg(F.sum("pv").cast("decimal(18,2)").alias("pv"))
        )
        if acc is None:
            merged = part.select(
                "event_type",
                "day",
                F.col("pv").cast("decimal(18,2)").alias("v"),
                F.lit(True).alias("dirty"),
            )
        else:
            merged = acc.join(part, ["event_type", "day"], "full_outer").select(
                "event_type",
                "day",
                (
                    F.coalesce(F.col("v"), F.lit(0).cast("decimal(18,2)"))
                    + F.coalesce(F.col("pv"), F.lit(0).cast("decimal(18,2)"))
                )
                .cast("decimal(18,2)")
                .alias("v"),
                F.col("pv").isNotNull().alias("dirty"),
            )
        # r11 OPT: cut lineage on MERGED (not on the acc projection
        # below) — the upsert branch is consumed only by the final
        # action, which otherwise re-runs each epoch's partial agg +
        # full-outer merge a second time there
        merged = merged.localCheckpoint()
        framed = merged.select(
            "event_type",
            "day",
            "v",
            F.collect_list("v").over(winf).alias("lst"),
            F.max("dirty").over(winf).alias("affected"),
        )
        k = F.floor((F.size("lst") + 1) / F.lit(2.0)).cast("int")
        m = framed.filter("affected").select(
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
            float(_win_ops._HAMPEL_K)
        ) * F.col("mad").cast("double")
        upserts.append(
            md.select(
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
                F.lit(seq).cast("long").alias("seq"),
            )
        )
        # the accumulator is a projection of the already-cut merged
        acc = merged.select("event_type", "day", "v")
    changelog = upserts[0]
    for u in upserts[1:]:
        changelog = changelog.unionAll(u)
    return (
        changelog.groupBy("event_type", "day")
        .agg(F.max_by(F.struct(*_HAMPEL_COLS), "seq").alias("r"))
        .select("event_type", "day", "r.*")
    )


@register(
    "stream_locf_incremental",
    oracle=_LOCF_ORACLE,
    tags=("streaming", "incremental", "window", "timeseries"),
)
def stream_locf_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL LOCF observation-panel maintenance (VERDICT r10
    #7): the sparsified 1/{mod} user sample replayed as 3 micro-batch
    epochs, each folding partial (sum, count) day accumulators into
    the per-segment panel and upserting the dirty days' RAW
    accumulators (mean + half-up rounding applied once, engine-side,
    after the last-writer-wins fold — no intermediate float rounding).
    The calendar densification (grid LEFT JOIN + last-IGNORE NULLS
    window) is the batch entry's own `_locf_densify`, shared code: the
    stateful part of streaming LOCF is exactly the sparse panel; the
    forward-fill is a stateless serving view over it. Folded output
    therefore equals the one-shot `win_locf_backfill` (the oracle here
    IS that entry's oracle string, registry-shared).

    This is the batch SPECIFICATION of streaming/tws_despike.py::
    LocfPanelProcessor (MapState day -> (sum cents, count)); the
    readStream golden in tests/test_streaming.py pins the TWS
    changelog fold, densified by the same helper, to the batch
    output. Same exactly-once note as the Hampel twin.

    Plan shape per epoch: one partial hash agg on the epoch slice and
    a full-outer merge with the localCheckpointed panel (both sides
    (day x segment)-bounded); the densify adds one broadcast grid
    join and ONE segment-partitioned window over the calendar
    domain."""
    ev = load(spark, sf_dir, "events")
    src = ev.filter(
        F.col("value").isNotNull()
        & (F.col("user_id") % _win_ops._LOCF_MOD == 0)
    ).select(
        "event_id",
        "event_type",
        F.to_date("ts").alias("day"),
        F.round("value", 2).cast("decimal(18,2)").alias("pv"),
    )
    acc = None
    upserts = []
    for seq in (0, 1, 2):
        part = (
            src.filter(F.col("event_id") % 3 == seq)
            .groupBy("event_type", "day")
            .agg(
                F.sum("pv").cast("decimal(18,2)").alias("ps"),
                F.count(F.lit(1)).cast("bigint").alias("pc"),
            )
        )
        if acc is None:
            merged = part.select(
                "event_type",
                "day",
                F.col("ps").cast("decimal(18,2)").alias("s"),
                F.col("pc").alias("c"),
                F.lit(True).alias("dirty"),
            )
        else:
            merged = acc.join(part, ["event_type", "day"], "full_outer").select(
                "event_type",
                "day",
                (
                    F.coalesce(F.col("s"), F.lit(0).cast("decimal(18,2)"))
                    + F.coalesce(F.col("ps"), F.lit(0).cast("decimal(18,2)"))
                )
                .cast("decimal(18,2)")
                .alias("s"),
                (
                    F.coalesce(F.col("c"), F.lit(0).cast("bigint"))
                    + F.coalesce(F.col("pc"), F.lit(0).cast("bigint"))
                )
                .cast("bigint")
                .alias("c"),
                F.col("ps").isNotNull().alias("dirty"),
            )
        # r11 OPT: same merged-level lineage cut as the Hampel twin
        merged = merged.localCheckpoint()
        upserts.append(
            merged.filter("dirty").select(
                "event_type",
                "day",
                "s",
                "c",
                F.lit(seq).cast("long").alias("seq"),
            )
        )
        acc = merged.select("event_type", "day", "s", "c")
    changelog = upserts[0]
    for u in upserts[1:]:
        changelog = changelog.unionAll(u)
    obs = (
        changelog.groupBy("event_type", "day")
        .agg(F.max_by(F.struct("s", "c"), "seq").alias("r"))
        .select(
            "event_type",
            "day",
            F.round(F.col("r.s").cast("double") / F.col("r.c"), 6)
            .cast("decimal(18,6)")
            .alias("obs"),
        )
    )
    return _win_ops._locf_densify(ev, obs)


from am_kinesis_pay_spark.operators import maintenance as _maint_ops  # noqa: E402,F401

_SCD2_ORACLE = _REG["dim_scd2_build"].oracle


@register(
    "stream_scd2_incremental",
    oracle=_SCD2_ORACLE,
    tags=("streaming", "incremental", "maintenance"),
)
def stream_scd2_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL SCD Type-2 dimension maintenance (the warehouse
    MERGE every CDC pipeline runs nightly, done as 3 ordered
    micro-batch epochs): each epoch's events fold into the maintained
    [valid_from, valid_to) interval table — the epoch's rows chain
    their change detection off the STATE's current status per user
    (lag within the batch, COALESCEd with the state seed), a user's
    previously-current interval is CLOSED at the first new change's
    timestamp, new intervals append with the last one open. After the
    final epoch the table equals the one-shot `dim_scd2_build` (the
    oracle here IS that entry's oracle string, registry-shared):
    arrival order is event-time order (epochs split by event_id
    TERTILES, the staged-file replay contract in streaming/runner.py
    — an out-of-order CDC feed needs an upstream reorder buffer, the
    tws_reorder shape, since SCD2 closes intervals irrevocably).

    Plan shape per epoch: one window pass over the EPOCH slice (never
    the history), one broadcast-sized join against the current-row
    frame (|users| — dimension-sized, the state a production pipeline
    keeps as the dimension table itself), and a localCheckpoint
    lineage cut. Per-epoch work is proportional to the epoch's
    changes; the closed history is touched only by the final union.
    At 100 TB/day this is exactly the MERGE INTO shape the
    sink_kv_upsert / delta-protocol family serves."""
    ev = load(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "event_type"
    )
    # r11 OPT: the tertile boundary is ONE scalar — collect it once
    # (bounded-artifact class) instead of broadcast-joining an agg
    # frame whose full-scan lineage re-ran inside every epoch's
    # checkpoint action. long/long `/` is double division in both
    # forms, so the tertile assignment is bit-identical.
    mx_row = ev.agg(F.max("event_id").alias("mx")).collect()[0]
    mx_v = int(mx_row["mx"]) if mx_row["mx"] is not None else 0
    ev3 = ev.select(
        "user_id",
        "event_id",
        "ts",
        "event_type",
        F.floor(F.col("event_id") * 3 / F.lit(mx_v + 1))
        .cast("int")
        .alias("epoch"),
    )
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    closed = None  # finished intervals (is_current = false)
    current = None  # one open interval per user
    for epoch in (0, 1, 2):
        batch = ev3.filter(F.col("epoch") == epoch).select(
            "user_id", "event_id", "ts", "event_type"
        )
        chained = batch.withColumn(
            "prev_in_batch", F.lag("event_type").over(w)
        )
        if current is None:
            seeded = chained.withColumn("seed_status", F.lit(None).cast("string"))
        else:
            seed = current.select(
                "user_id", F.col("status").alias("seed_status")
            )
            seeded = chained.join(F.broadcast(seed), "user_id", "left")
        eff_prev = F.coalesce(F.col("prev_in_batch"), F.col("seed_status"))
        # ONE heavy window pass per epoch lives above `changes`; cut
        # lineage HERE so every downstream consumer (the opened
        # intervals, the close timestamps, the next epoch's seed) reads
        # the small materialized change set instead of re-running it
        changes = seeded.filter(
            eff_prev.isNull() | (eff_prev != F.col("event_type"))
        ).select("user_id", "event_id", "ts", "event_type").localCheckpoint()
        # intervals opened by this batch: valid_to chains to the NEXT
        # change in the same batch; the last stays open (current)
        opened = changes.select(
            "user_id",
            F.col("event_type").alias("status"),
            F.col("ts").alias("valid_from"),
            F.lead("ts").over(w).alias("valid_to"),
        )
        first_change = changes.groupBy("user_id").agg(
            F.min_by("ts", F.struct("ts", "event_id")).alias("first_ts")
        )
        if current is not None:
            touched = current.join(F.broadcast(first_change), "user_id", "left")
            newly_closed = touched.filter(F.col("first_ts").isNotNull()).select(
                "user_id",
                "status",
                "valid_from",
                F.col("first_ts").alias("valid_to"),
            )
            still_open = touched.filter(F.col("first_ts").isNull()).select(
                "user_id", "status", "valid_from", "valid_to"
            )
            closed = closed.unionAll(newly_closed) if closed is not None else newly_closed
        else:
            still_open = None
        new_closed = opened.filter(F.col("valid_to").isNotNull())
        new_open = opened.filter(F.col("valid_to").isNull())
        closed = (
            closed.unionAll(new_closed) if closed is not None else new_closed
        )
        current = (
            new_open if still_open is None else still_open.unionAll(new_open)
        )
        # `current` and `closed` both hang off the checkpointed change
        # set (domain-sized), so no further lineage cuts are needed —
        # the next epoch's broadcast seed and the final union are
        # cheap re-reads of small frames
    return closed.select(
        "user_id",
        "status",
        "valid_from",
        "valid_to",
        F.lit(False).alias("is_current"),
    ).unionAll(
        current.select(
            "user_id",
            "status",
            "valid_from",
            F.lit(None).cast(closed.schema["valid_to"].dataType).alias("valid_to"),
            F.lit(True).alias("is_current"),
        )
    )
