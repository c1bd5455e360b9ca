"""UDTF semantics: JSON bag explode incl. the non-JSON fallback row."""

from __future__ import annotations


from am_kinesis_pay_spark.functions.udtf_ops import ExplodeJsonBag
from am_kinesis_pay_spark.registry import queries

from tests.conftest import SF_DIR


def test_udtf_on_events(spark):
    rows = queries()["udtf_explode_json_bag"](spark, SF_DIR).limit(20).collect()
    assert rows
    assert all(r.key == "k" and r.value_kind == "int" for r in rows)


def test_udtf_fallbacks(spark):
    spark.udtf.register("explode_json_bag_t", ExplodeJsonBag)
    df = spark.createDataFrame(
        [(1, '{"a": 1, "b": "x", "c": null, "d": [1,2], "e": true}'),
         (2, "plain text body"),
         (3, None),
         (4, "[1,2,3]")],
        "id long, doc string",
    )
    df.createOrReplaceTempView("udtf_fixture")
    out = spark.sql(
        "SELECT f.id, b.* FROM udtf_fixture f, LATERAL explode_json_bag_t(f.doc) b"
    ).collect()
    by_id = {}
    for r in out:
        by_id.setdefault(r.id, {})[r.key] = (r.value, r.value_kind)
    assert by_id[1]["a"] == ("1", "int")
    assert by_id[1]["b"] == ("x", "str")
    assert by_id[1]["c"] == (None, "null")
    assert by_id[1]["d"] == ("[1,2]", "list")
    assert by_id[1]["e"] == ("true", "bool")
    # non-JSON → plain-text fallback (kinesis-pay.php:158-162)
    assert by_id[2]["_raw"] == ("plain text body", "unparseable")
    assert 3 not in by_id  # NULL input yields no rows
    assert by_id[4]["_raw"] == ("[1,2,3]", "list")


def test_split_fixed_ragged_and_dynamic_schema(spark):
    """Polymorphic analyze(): the output schema follows the header
    argument, extra fields truncate, missing fields NULL-pad."""
    from pyspark.sql.functions import udtf as udtf_fn

    from am_kinesis_pay_spark.functions.udtf_ops import SplitFixedUdtf

    spark.udtf.register("kpay_split_fixed_t", udtf_fn(SplitFixedUdtf))
    rows = spark.sql(
        "SELECT s.* FROM VALUES ('a,b,c,EXTRA'), ('only_one'), (NULL) t(line),"
        " LATERAL kpay_split_fixed_t('x,y,z', t.line) s"
    ).collect()
    assert [tuple(r) for r in rows] == [
        ("a", "b", "c"),
        ("only_one", None, None),
        ("", None, None),
    ]
    two = spark.sql(
        "SELECT s.* FROM VALUES ('p,q') t(line),"
        " LATERAL kpay_split_fixed_t('left,right', t.line) s"
    )
    assert two.columns == ["left", "right"]
