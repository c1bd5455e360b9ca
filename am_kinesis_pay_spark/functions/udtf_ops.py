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
    spark.udtf.register("explode_json_bag", ExplodeJsonBag)
    ev = load(spark, sf_dir, "events")
    ev.select("event_id", "props").createOrReplaceTempView("events_props_v")
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
    ev.createOrReplaceTempView("events_lines_v")
    return spark.sql(
        """
        SELECT e.event_id, s.eid, s.kind, s.day
        FROM events_lines_v e,
        LATERAL kpay_split_fixed('eid,kind,day', e.line) s
        """
    )
