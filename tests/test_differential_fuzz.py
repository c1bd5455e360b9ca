"""Differential fuzzing: random predicate trees and integer
aggregations rendered BOTH as Spark Column expressions and as DuckDB
SQL, executed on the same parquet, compared exactly. The fixed oracle
suite checks each operator's one query; this sweeps the expression
space between them (comparison directions, AND/OR/NOT nesting, mod
arithmetic, string equality, timestamp bounds) where engine-semantics
drift (NULL handling, type coercion, rounding of literals) would hide.

Only exactly-typed expressions are generated on purpose: integer and
string comparisons, integer modulo, and timestamp literals — decimal
multiply/divide is excluded because Spark and DuckDB legitimately
differ on result precision/scale rules (that class is covered by the
DECIMAL conventions in functions/compat.py instead)."""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from pyspark.sql import functions as F

from tests.conftest import SF_DIR

# (name, kind) — exactly-typed lineitem columns
_INT_COLS = ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"]
_STR_COLS = [("l_returnflag", ["A", "N", "R"]), ("l_linestatus", ["F", "O"])]
_CMP = ["<", "<=", ">", ">=", "=", "<>"]


@st.composite
def predicate(draw, depth: int = 0):
    """Random predicate AST rendered as (spark_expr_str, duck_sql) —
    the same SQL text works for both engines, so generation emits one
    string and each side parses it natively (Spark via F.expr)."""
    if depth >= 3 or draw(st.booleans()):
        kind = draw(st.sampled_from(["int_cmp", "int_mod", "str_eq", "ts"]))
        if kind == "int_cmp":
            col = draw(st.sampled_from(_INT_COLS))
            op = draw(st.sampled_from(_CMP))
            val = draw(st.integers(min_value=0, max_value=60_000))
            return f"({col} {op} {val})"
        if kind == "int_mod":
            col = draw(st.sampled_from(_INT_COLS))
            k = draw(st.integers(min_value=2, max_value=97))
            r = draw(st.integers(min_value=0, max_value=96)) % k
            return f"(({col} % {k}) = {r})"
        if kind == "str_eq":
            col, vals = draw(st.sampled_from(_STR_COLS))
            val = draw(st.sampled_from(vals))
            neg = draw(st.booleans())
            return f"({col} {'<>' if neg else '='} '{val}')"
        day = draw(st.integers(min_value=1, max_value=28))
        month = draw(st.integers(min_value=1, max_value=12))
        year = draw(st.sampled_from([1993, 1995, 1997]))
        op = draw(st.sampled_from(["<", ">="]))
        return f"(l_shipdate {op} TIMESTAMP '{year}-{month:02d}-{day:02d} 00:00:00')"
    combiner = draw(st.sampled_from(["AND", "OR"]))
    left = draw(predicate(depth=depth + 1))
    right = draw(predicate(depth=depth + 1))
    node = f"({left} {combiner} {right})"
    if draw(st.booleans()):
        node = f"(NOT {node})"
    return node


@pytest.fixture(scope="module")
def duck_li():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM '{SF_DIR}/lineitem.parquet'"
    )
    yield con
    con.close()


@pytest.fixture(scope="module")
def spark_li(spark):
    from am_kinesis_pay_spark.tables import load

    df = load(spark, SF_DIR, "lineitem")
    df.createOrReplaceTempView("lineitem_fuzz")
    return df


@settings(
    max_examples=40,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(pred=predicate())
def test_random_predicates_agree(spark, spark_li, duck_li, pred):
    """count + exact integer checksum of the matching rows must agree:
    a checksum catches 'same cardinality, different rows'."""
    got = (
        spark_li.filter(F.expr(pred))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(
                F.sum(F.col("l_orderkey") * 7 + F.col("l_linenumber")),
                F.lit(0),
            ).alias("chk"),
        )
        .collect()[0]
    )
    want = duck_li.execute(
        "SELECT COUNT(*), COALESCE(SUM(l_orderkey * 7 + l_linenumber), 0) "
        f"FROM lineitem WHERE {pred}"
    ).fetchone()
    assert (got.n, got.chk) == (want[0], want[1]), pred


@pytest.fixture(scope="module")
def duck_join(duck_li):
    duck_li.execute(
        f"CREATE VIEW orders AS SELECT * FROM '{SF_DIR}/orders.parquet'"
    )
    duck_li.execute(
        f"CREATE VIEW customer AS SELECT * FROM '{SF_DIR}/customer.parquet'"
    )
    return duck_li


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    how=st.sampled_from(["inner", "left", "left_semi", "left_anti"]),
    okey=st.integers(min_value=0, max_value=5000),
    bal=st.integers(min_value=-999, max_value=9999),
)
def test_random_joins_agree(spark, duck_join, how, okey, bal):
    """Every join strategy family (inner/outer/semi/anti) under random
    pushable filters on both sides: count + integer checksum parity."""
    from am_kinesis_pay_spark.tables import load

    o = load(spark, SF_DIR, "orders").filter(F.col("o_orderkey") % 7 < 5).filter(
        F.col("o_orderkey") >= okey
    )
    c = load(spark, SF_DIR, "customer").filter(F.col("c_acctbal") > bal)
    j = o.join(c, o.o_custkey == c.c_custkey, how)
    got = j.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.sum("o_orderkey"), F.lit(0)).alias("chk"),
    ).collect()[0]
    sql_how = {
        "inner": "JOIN",
        "left": "LEFT JOIN",
        "left_semi": "SEMI JOIN",
        "left_anti": "ANTI JOIN",
    }[how]
    want = duck_join.execute(
        "SELECT COUNT(*), COALESCE(SUM(o_orderkey), 0) FROM "
        f"(SELECT * FROM orders WHERE o_orderkey % 7 < 5 AND o_orderkey >= {okey}) o "
        f"{sql_how} (SELECT * FROM customer WHERE c_acctbal > {bal}) c "
        "ON o.o_custkey = c.c_custkey"
    ).fetchone()
    assert (got.n, got.chk) == (want[0], want[1]), (how, okey, bal)


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    lo=st.integers(min_value=-5, max_value=0),
    hi=st.integers(min_value=0, max_value=5),
    part=st.sampled_from(["l_returnflag", "l_linestatus", "l_suppkey"]),
)
def test_random_window_frames_agree(spark, spark_li, duck_li, lo, hi, part):
    """Random ROWS BETWEEN frames: windowed integer sums must match
    row-for-row (checksummed). The fixture's (l_orderkey,
    l_linenumber) is NOT unique (synthetic data), so the summed column
    itself is the final tiebreaker — rows tied on all three sort keys
    are interchangeable for every frame sum, making the comparison
    tie-permutation-invariant without requiring a unique key."""
    from pyspark.sql import Window as W

    w = (
        W.partitionBy(part)
        .orderBy("l_orderkey", "l_linenumber", "l_suppkey")
        .rowsBetween(lo, hi)
    )
    got = (
        spark_li.filter(F.col("l_orderkey") % 13 == 0)
        .withColumn("ws", F.sum("l_suppkey").over(w))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("ws") * (F.col("l_orderkey") % 1000 + 1)).alias("chk"),
        )
        .collect()[0]
    )
    want = duck_li.execute(
        f"""
WITH win AS (
  SELECT l_orderkey,
    SUM(l_suppkey) OVER (PARTITION BY {part}
      ORDER BY l_orderkey, l_linenumber, l_suppkey
      ROWS BETWEEN {-lo} PRECEDING AND {hi} FOLLOWING) AS ws
  FROM lineitem WHERE l_orderkey % 13 = 0
)
SELECT COUNT(*), SUM(ws * (l_orderkey % 1000 + 1)) FROM win
"""
    ).fetchone()
    assert (got.n, got.chk) == (want[0], want[1]), (lo, hi, part)


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    pred=predicate(),
    group=st.sampled_from(["l_returnflag", "l_linestatus", "l_linenumber"]),
)
def test_random_filtered_aggregations_agree(
    spark, spark_li, duck_li, pred, group
):
    """Grouped COUNT + exact integer SUM under a random filter: the
    whole (filter -> shuffle -> agg) path differentially checked."""
    got = {
        tuple(r)[:1]: tuple(r)[1:]
        for r in spark_li.filter(F.expr(pred))
        .groupBy(group)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("l_suppkey").alias("s"),
        )
        .collect()
    }
    want = {
        (r[0],): (r[1], r[2])
        for r in duck_li.execute(
            f"SELECT {group}, COUNT(*), SUM(l_suppkey) "
            f"FROM lineitem WHERE {pred} GROUP BY {group}"
        ).fetchall()
    }
    assert got == want, pred


# --- scalar-function trees (the §2.8 surface) --------------------------
#
# round/floor/ceil/mod/abs/string-concat/substr/case-change/date-part
# compositions, rendered per-engine where syntax diverges (integer
# division is `DIV` in Spark SQL and `//` in DuckDB; string casts are
# STRING vs VARCHAR). Values are compared EXACTLY as sorted multisets
# over a deterministic row subset — this is where half-up-vs-half-even
# rounding and type-coercion drift would hide. Double round() was
# cross-checked over 20k .xx5-boundary cases before inclusion (both
# engines round the represented double half away from zero).

_SCALAR_SUBSET = "l_orderkey % 97 = 0"


@st.composite
def _int_expr(draw, depth: int = 0):
    """Integer-typed expression tree -> (spark_sql, duck_sql)."""
    if depth >= 3 or draw(st.booleans()):
        kind = draw(st.sampled_from(["col", "lit", "datepart"]))
        if kind == "col":
            c = draw(st.sampled_from(_INT_COLS))
            return c, c
        if kind == "lit":
            v = draw(st.integers(min_value=0, max_value=999))
            return str(v), str(v)
        part = draw(st.sampled_from(["year", "month", "day"]))
        return f"{part}(l_shipdate)", f"{part}(l_shipdate)"
    kind = draw(
        st.sampled_from(["add", "sub", "mul", "mod", "idiv", "abs", "floor", "ceil", "round100"])
    )
    ls, ld = draw(_int_expr(depth=depth + 1))
    if kind == "abs":
        return f"abs({ls} - 500)", f"abs({ld} - 500)"
    if kind == "floor":
        k = draw(st.integers(min_value=1, max_value=13))
        return (
            f"CAST(floor(({ls}) / {k}) AS BIGINT)",
            f"CAST(floor(({ld}) / {k}) AS BIGINT)",
        )
    if kind == "ceil":
        k = draw(st.integers(min_value=1, max_value=13))
        return (
            f"CAST(ceil(({ls}) / {k}) AS BIGINT)",
            f"CAST(ceil(({ld}) / {k}) AS BIGINT)",
        )
    if kind == "round100":
        # scaled-double rounding: hits .xx5 boundaries by construction
        return (
            f"CAST(round(({ls}) * 0.005, 2) * 1000 AS BIGINT)",
            f"CAST(round(({ld}) * 0.005, 2) * 1000 AS BIGINT)",
        )
    rs, rd = draw(_int_expr(depth=depth + 1))
    if kind == "add":
        return f"({ls} + {rs})", f"({ld} + {rd})"
    if kind == "sub":
        return f"({ls} - {rs})", f"({ld} - {rd})"
    if kind == "mul":
        k = draw(st.integers(min_value=0, max_value=9))
        return f"(({ls}) * {k})", f"(({ld}) * {k})"
    if kind == "mod":
        k = draw(st.integers(min_value=2, max_value=97))
        return f"(({ls}) % {k})", f"(({ld}) % {k})"
    k = draw(st.integers(min_value=1, max_value=13))  # integer division
    return f"(({ls}) DIV {k})", f"(({ld}) // {k})"


@st.composite
def _str_expr(draw, depth: int = 0):
    """String-typed expression tree -> (spark_sql, duck_sql)."""
    if depth >= 2 or draw(st.booleans()):
        kind = draw(st.sampled_from(["col", "lit", "cast_int"]))
        if kind == "col":
            c, _ = draw(st.sampled_from(_STR_COLS))
            return c, c
        if kind == "lit":
            v = draw(st.sampled_from(["x", "Pay", "_9", "zZ"]))
            return f"'{v}'", f"'{v}'"
        i_s, i_d = draw(_int_expr(depth=2))
        return f"CAST({i_s} AS STRING)", f"CAST({i_d} AS VARCHAR)"
    kind = draw(st.sampled_from(["concat", "upper", "lower", "substr"]))
    ls, ld = draw(_str_expr(depth=depth + 1))
    if kind == "upper":
        return f"upper({ls})", f"upper({ld})"
    if kind == "lower":
        return f"lower({ls})", f"lower({ld})"
    if kind == "substr":
        start = draw(st.integers(min_value=1, max_value=3))
        n = draw(st.integers(min_value=0, max_value=5))
        return f"substr({ls}, {start}, {n})", f"substr({ld}, {start}, {n})"
    rs, rd = draw(_str_expr(depth=depth + 1))
    return f"({ls} || '_' || {rs})", f"({ld} || '_' || {rd})"


_FUZZ_SF_DIRS = [SF_DIR]
_DRIVER_SF = "/root/testdata/sf0.01"
import os as _os

if _os.path.isdir(_DRIVER_SF) and _os.path.realpath(
    _DRIVER_SF
) != _os.path.realpath(SF_DIR):
    _FUZZ_SF_DIRS.append(_DRIVER_SF)


@pytest.fixture(scope="module", params=_FUZZ_SF_DIRS)
def scalar_engines(request, spark):
    from am_kinesis_pay_spark.tables import load

    sf_dir = request.param
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM '{sf_dir}/lineitem.parquet'"
    )
    sdf = load(spark, sf_dir, "lineitem").filter(_SCALAR_SUBSET)
    yield sdf, con
    con.close()


@settings(
    max_examples=40,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(expr=st.one_of(_int_expr(), _str_expr()))
def test_random_scalar_trees_agree(spark, scalar_engines, expr):
    """Exact multiset equality of the scalar expression's values over
    the deterministic row subset, at the module's SF (parametrized to
    include the driver's sf0.01 when present)."""
    sdf, con = scalar_engines
    s_sql, d_sql = expr
    got = sorted(
        r[0] for r in sdf.selectExpr(f"{s_sql} AS v").collect()
    )
    want = sorted(
        r[0]
        for r in con.execute(
            f"SELECT {d_sql} AS v FROM lineitem WHERE {_SCALAR_SUBSET}"
        ).fetchall()
    )
    assert got == want, (s_sql, d_sql)


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    pa=predicate(),
    pb=predicate(),
    op=st.sampled_from(
        ["UNION ALL", "UNION", "INTERSECT", "EXCEPT", "INTERSECT ALL", "EXCEPT ALL"]
    ),
)
def test_random_setops_agree(spark, spark_li, duck_li, pa, pb, op):
    """Set-operation algebra under random branch predicates: bag
    (ALL) and set (DISTINCT) variants of union/intersect/except must
    agree on count + exact integer checksum. The same SQL text runs on
    both engines (Spark over the registered temp view), so this sweeps
    the dedup-before-or-after semantics and NULL-row equality rules
    where engines drift."""
    proj = "l_orderkey, l_linenumber, l_returnflag"
    body = (
        f"SELECT {proj} FROM {{t}} WHERE {pa} "
        f"{op} "
        f"SELECT {proj} FROM {{t}} WHERE {pb}"
    )
    outer = (
        "SELECT COUNT(*), COALESCE(SUM(l_orderkey * 31 + l_linenumber), 0) "
        "FROM ({q}) s"
    )
    got = spark.sql(outer.format(q=body.format(t="lineitem_fuzz"))).collect()[0]
    want = duck_li.execute(
        outer.format(q=body.format(t="lineitem"))
    ).fetchone()
    assert (got[0], got[1]) == (want[0], want[1]), (op, pa, pb)
