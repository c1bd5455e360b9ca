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


def test_table_arg_sessions_matches_python_walk(spark, ducks):
    """The TABLE-argument UDTF's per-user summaries re-derived by a
    pure-Python walk over the same (t_us, event_id)-ordered events:
    session splits at gap > 30 min, max gap, and event counts must
    match for every user — proving the engine really delivered whole
    partitions in order to the UDTF."""
    from am_kinesis_pay_spark.registry import queries

    got = {
        r.user_id: (r.n_events, r.n_sessions, r.max_gap_s)
        for r in queries()["udtf_table_arg_sessions"](
            spark, SF_DIR
        ).collect()
    }
    seqs = {}
    for u, t in ducks.execute(
        "SELECT user_id, epoch_us(ts) FROM events"
        " ORDER BY user_id, epoch_us(ts), event_id"
    ).fetchall():
        seqs.setdefault(u, []).append(t)
    assert set(got) == set(seqs)
    for u, ts in seqs.items():
        sessions, max_gap = 1, 0
        for a, b in zip(ts, ts[1:]):
            gap = b - a
            if gap > 1800 * 1000000:
                sessions += 1
            max_gap = max(max_gap, gap)
        assert got[u] == (len(ts), sessions, max_gap // 1000000), u
