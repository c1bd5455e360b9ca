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
