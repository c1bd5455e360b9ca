"""UDTF surface (SURVEY.md §2.11): table-valued functions.

The reference's schemaless invoice data bag (``data()->set(k,v)``,
kinesis-pay.php:15-16,176,509) maps to a tall (entity, key, value)
layout; this UDTF explodes a JSON KV document into those rows — the
generic "JSON bag → relational" bridge. Built-in ``explode(map)`` does
this for typed maps; the UDTF handles the untyped/ragged case (mixed
scalar types, nested values stringified) that a fixed MapType can't.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.functions import udtf

from am_kinesis_pay_spark.registry import register
from am_kinesis_pay_spark.tables import load


@udtf(returnType="key: string, value: string, value_kind: string")
class ExplodeJsonBag:
    """One output row per top-level JSON key; non-JSON input yields a
    single ('_raw', text, 'unparseable') row — the reference's
    plain-text-or-JSON fallback (kinesis-pay.php:158-162). Plain
    pickle transfer on purpose: measured 10x FASTER than useArrow=True
    here (14.8s vs 1.4s at sf0.1) — Arrow UDTFs pay a per-yielded-row
    conversion cost that swamps ragged generator output."""

    def eval(self, doc: str):  # noqa: D102
        if doc is None:
            return
        try:
            parsed = json.loads(doc)
        except (ValueError, TypeError):
            yield ("_raw", doc, "unparseable")
            return
        if not isinstance(parsed, dict):
            yield ("_raw", doc, type(parsed).__name__)
            return
        for k, v in parsed.items():
            kind = type(v).__name__
            if isinstance(v, (dict, list)):
                yield (k, json.dumps(v, separators=(",", ":")), kind)
            elif isinstance(v, bool):
                yield (k, "true" if v else "false", kind)
            elif v is None:
                yield (k, None, "null")
            else:
                yield (k, str(v), kind)


@register(
    "udtf_explode_json_bag",
    oracle="""
SELECT event_id, 'k' AS key,
  json_extract_string(props, '$.k') AS value,
  'int' AS value_kind
FROM events WHERE props IS NOT NULL
""",
    tags=("udtf", "json"),
)
def udtf_explode_json_bag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explode events.props through the UDTF with a LATERAL join.
    The oracle covers the fixture corpus (every props value is a
    one-key int object, verified at all SFs), so key/value/kind land
    exactly; the generic branches — nested values, non-JSON fallback,
    bool/null normalization — have no fixture rows and stay pinned by
    tests/test_udtf.py's direct eval() cases."""
    from am_kinesis_pay_spark.tables import spread

    spark.udtf.register("explode_json_bag", ExplodeJsonBag)
    ev = load(spark, sf_dir, "events")
    # r11 OPT: the LATERAL streams partitions through Python workers —
    # at fixture scale the scan is ONE split, so every row went through
    # ONE worker; spread() fans the json.loads cost over the cores
    # (no-op at scale where splits >= cores)
    spread(ev.select("event_id", "props")).createOrReplaceTempView(
        "events_props_v"
    )
    return spark.sql(
        """
        SELECT e.event_id, b.key, b.value, b.value_kind
        FROM events_props_v e,
        LATERAL explode_json_bag(e.props) b
        """
    )


class SplitFixedUdtf:
    """POLYMORPHIC UDTF (Spark 4 ``analyze()`` surface): output schema
    is computed at plan time from the constant header argument —
    ``kpay_split_fixed('a,b,c', line)`` produces columns (a, b, c) —
    the schema-on-read delimited-splitter every ingest layer wants,
    impossible with a static ``returnType``. ``analyze`` runs on the
    driver during resolution (the argument must be foldable); ``eval``
    splits each line, truncating extra fields and NULL-padding missing
    ones, so ragged rows degrade instead of erroring (the reference's
    fail-open posture, kinesis-pay.php:158-162)."""

    @staticmethod
    def analyze(header, line):
        from pyspark.sql.types import StringType, StructType
        from pyspark.sql.udtf import AnalyzeResult

        if header.value is None:
            raise ValueError(
                "kpay_split_fixed: header must be a constant string"
            )
        st = StructType()
        for c in str(header.value).split(","):
            st = st.add(c.strip(), StringType())
        return AnalyzeResult(schema=st)

    def eval(self, header: str, line: str):
        cols = str(header).split(",")
        parts = (line or "").split(",")
        parts = parts[: len(cols)] + [None] * (len(cols) - len(parts))
        yield tuple(parts)


@register(
    "udtf_split_fixed",
    oracle="""
SELECT event_id,
  CAST(event_id AS VARCHAR) AS eid,
  event_type AS kind,
  strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day
FROM events
""",
    tags=("udtf",),
)
def udtf_split_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drive the polymorphic UDTF end-to-end: a delimited line column
    is synthesized from events (id, type, day — all
    deterministic-format fields, no float rendering), then split back
    through ``kpay_split_fixed`` with its dynamic schema and compared
    field-for-field against the direct projection. The LATERAL
    correlation keeps the UDTF streaming per-partition (no shuffle);
    the plan-time ``analyze`` call is the piece the static-returnType
    twin (`udtf_explode_json_bag`) cannot express."""
    from pyspark.sql.functions import udtf as udtf_fn

    from am_kinesis_pay_spark.tables import spread

    spark.udtf.register("kpay_split_fixed", udtf_fn(SplitFixedUdtf))
    ev = load(spark, sf_dir, "events").select(
        "event_id",
        F.concat_ws(
            ",",
            F.col("event_id").cast("string"),
            F.col("event_type"),
            F.date_format("ts", "yyyy-MM-dd"),
        ).alias("line"),
    )
    # r11 OPT: same single-split → single-Python-worker fix as
    # udtf_explode_json_bag (spread is a no-op at scale)
    spread(ev).createOrReplaceTempView("events_lines_v")
    return spark.sql(
        """
        SELECT e.event_id, s.eid, s.kind, s.day
        FROM events_lines_v e,
        LATERAL kpay_split_fixed('eid,kind,day', e.line) s
        """
    )


_TA_GAP_S = 1800  # session gap threshold (30 min), matches stream_session_window


@udtf(returnType=(
    "user_id: bigint, n_events: bigint, n_sessions: bigint,"
    " max_gap_s: bigint"
))
class UserSessionStats:
    """TABLE-argument UDTF (Spark 4 TVF input relations): consumes one
    user's events — the engine feeds whole partitions because the call
    site says PARTITION BY user_id ORDER BY ts — accumulates gap
    statistics row-by-row in eval(), and emits ONE summary row from
    terminate(). The imperative per-partition form of sessionization:
    state is O(1) per partition (prev timestamp, counters), rows
    arrive in engine-guaranteed order, nothing is collected."""

    def __init__(self):
        self.user = None
        self.prev_us = None
        self.n = 0
        self.sessions = 0
        self.max_gap = 0

    def eval(self, row):  # noqa: D102
        # positional access on purpose (r12 OPT): the view projects
        # (user_id, t_us, event_id) and Row.__getitem__ by position
        # skips the per-row field-name lookup — measured ~15% off the
        # whole entry at sf0.1 (the eval loop IS the query cost)
        self.user = row[0]
        t = row[1]
        self.n += 1
        if self.prev_us is None:
            self.sessions = 1
        else:
            gap = t - self.prev_us
            if gap > _TA_GAP_S * 1000000:
                self.sessions += 1
            if gap > self.max_gap:
                self.max_gap = gap
        self.prev_us = t

    def terminate(self):  # noqa: D102
        if self.user is not None:
            yield (
                self.user,
                self.n,
                self.sessions,
                self.max_gap // 1000000,
            )


@register(
    "udtf_table_arg_sessions",
    oracle=f"""
WITH seq AS (
  SELECT user_id, epoch_us(ts) AS t,
    LAG(epoch_us(ts)) OVER (PARTITION BY user_id
                            ORDER BY epoch_us(ts), event_id) AS prev_t
  FROM events
)
SELECT user_id,
  CAST(COUNT(*) AS BIGINT) AS n_events,
  CAST(1 + SUM(CASE WHEN t - prev_t > {_TA_GAP_S} * 1000000
               THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions,
  CAST(COALESCE(MAX(t - prev_t), 0) // 1000000 AS BIGINT) AS max_gap_s
FROM seq GROUP BY user_id
""",
    tags=("udtf",),
)
def udtf_table_arg_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UDTF with a TABLE ARGUMENT (Spark 4: a TVF consuming an input
    RELATION with PARTITION BY / ORDER BY at the call site,
    SPARK-44503) — the last §2.11 Python-surface form: where
    udtf_explode_json_bag maps scalar→rows and the polymorphic UDTF
    computes its schema at plan time, this one receives WHOLE
    PARTITIONS of a table in engine-guaranteed order and reduces each
    to a summary row (per-user session count / max gap — the
    imperative twin of stream_session_window's declarative
    session_window, same 30-minute gap rule).

    The partition contract does the heavy lifting: PARTITION BY
    user_id ORDER BY t_us means Spark shuffles and sorts ONCE and the
    UDTF sees rows in order with O(1) state — the same execution
    shape as a window function, but with arbitrary imperative logic.
    Timestamps pass as exact BIGINT micros (the events nano/micro
    convention); ties order by (t_us, event_id) in BOTH the call site
    and the oracle's LAG so partner choice is engine-identical.
    At 100 TB this is one shuffle on the natural key, embarrassingly
    parallel across users — but note the row-at-a-time Python cost:
    fine for summary UDTFs, and anything expressible as built-ins
    (this oracle IS one) should prefer them — the entry exists to
    pin the API surface, and the oracle proves the two forms equal."""
    ev = load(spark, sf_dir, "events")
    spark.udtf.register("akps_user_session_stats", UserSessionStats)
    ev.select(
        "user_id", F.unix_micros("ts").alias("t_us"), "event_id"
    ).createOrReplaceTempView("events_ta_v")
    return spark.sql(
        """
        SELECT user_id, n_events, n_sessions, max_gap_s
        FROM akps_user_session_stats(
          TABLE(events_ta_v)
          PARTITION BY user_id ORDER BY (t_us, event_id))
        """
    )
