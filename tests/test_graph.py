"""Graph operator properties that the SQL oracle alone can't pin:

- graph_triangle_count vs an INDEPENDENT pure-Python triangle counter
  (set-intersection over adjacency lists — a different algorithm than
  both the Spark degree-oriented join and the DuckDB 3-way-join
  oracle), so an error shared by the two join formulations would still
  be caught.
- the per-day participation cap actually binds and stays
  engine-parity when it does (the registered default never binds at
  test SFs, so without this the cap path would be dead code in CI).
- the wedge fan-out stays parallel: the explicit-count repartition
  must survive into the physical plan, because AQE otherwise
  coalesces the (tiny) edge list to one partition and pipelines the
  entire triangle explosion through a single task (measured 440 s at
  the 10x stress).
"""

from __future__ import annotations

import hashlib
from collections import defaultdict

from pyspark.sql import functions as F

from am_kinesis_pay_spark.operators.integration import (
    _TRI_DAY_CAP,
    _copurchase_edges,
    _oriented_triangles,
)
from tests.conftest import SF_DIR


def _python_triangles(edges):
    """Independent counter: per-node triangle credit via sorted
    adjacency-set intersection."""
    adj = defaultdict(set)
    for s, t in edges:
        adj[s].add(t)
        adj[t].add(s)
    credit = defaultdict(int)
    nodes = sorted(adj)
    for a in nodes:
        for b in adj[a]:
            if b <= a:
                continue
            for c in adj[a] & adj[b]:
                if c > b:
                    for v in (a, b, c):
                        credit[v] += 1
    return dict(credit)


def test_triangle_count_matches_independent_python(spark):
    got = {
        r["user_id"]: r["n_triangles"]
        for r in __import__("am_kinesis_pay_spark.registry", fromlist=["queries"])
        .queries()["graph_triangle_count"](spark, SF_DIR)
        .collect()
    }
    edges = [
        (r["s"], r["t"])
        for r in _copurchase_edges(spark, SF_DIR, _TRI_DAY_CAP).collect()
    ]
    assert got == _python_triangles(edges)


def test_day_cap_binds_with_engine_parity(spark, ducks):
    """With cap=2 (below every SF's max purchasers/day) the capped
    edge set must (a) be a strict subset of the uncapped one and (b)
    match DuckDB running the identical deterministic md5-order cap."""
    capped = {
        (r["s"], r["t"]) for r in _copurchase_edges(spark, SF_DIR, 2).collect()
    }
    full = {
        (r["s"], r["t"])
        for r in _copurchase_edges(spark, SF_DIR, 10**9).collect()
    }
    assert capped <= full
    duck = ducks.execute(
        """
        WITH a0 AS (
          SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS d, user_id
          FROM events WHERE event_type = 'purchase' AND value > 120
        ), a AS (
          SELECT d, user_id FROM (
            SELECT d, user_id, ROW_NUMBER() OVER (
              PARTITION BY d ORDER BY md5(CAST(user_id AS VARCHAR)), user_id
            ) AS rn FROM a0
          ) WHERE rn <= 2
        )
        SELECT DISTINCT x.user_id AS s, y.user_id AS t
        FROM a x JOIN a y USING (d) WHERE x.user_id < y.user_id
        """
    ).fetchall()
    assert capped == {(s, t) for s, t in duck}
    # the cap binds somewhere at every SF (max purchasers/day >= 3 even
    # at sf0.001), so this is not vacuous
    assert capped != full


def test_oriented_triangles_counts_each_once(spark):
    """Every undirected triangle appears exactly once in the oriented
    enumeration (no per-corner duplication before the explode)."""
    tri = _oriented_triangles(_copurchase_edges(spark, SF_DIR, _TRI_DAY_CAP))
    rows = tri.collect()
    keys = [tuple(sorted((r["na"], r["nb"], r["nc"]))) for r in rows]
    assert len(keys) == len(set(keys))
    # orientation invariant: the wedge corner has the minimum
    # (degree, id) key, and all three corners are distinct
    for r in rows:
        assert len({r["na"], r["nb"], r["nc"]}) == 3


def test_wedge_fanout_stays_parallel(spark):
    """The explicit-count repartition must appear in the optimized
    plan; without it AQE coalesces the pre-fan-out exchange to one
    partition and serializes the triangle explosion."""
    tri = _oriented_triangles(_copurchase_edges(spark, SF_DIR, _TRI_DAY_CAP))
    plan = tri._jdf.queryExecution().toString()
    assert "REPARTITION_BY_NUM" in plan


def test_doulion_coin_is_md5_deterministic(spark):
    """The Doulion edge coin must match a Python md5 recomputation
    (same bytes DuckDB hashes), and the estimate is 8x the sampled
    count by construction."""
    from am_kinesis_pay_spark.registry import queries

    edges = _copurchase_edges(spark, SF_DIR, _TRI_DAY_CAP).collect()
    kept = {
        (r["s"], r["t"])
        for r in edges
        if int(hashlib.md5(f"{r['s']}-{r['t']}".encode()).hexdigest()[:4], 16) % 2
        == 0
    }
    coin = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        "-", F.col("s").cast("string"), F.col("t").cast("string")
                    )
                ),
                1,
                4,
            ),
            16,
            10,
        ).cast("long")
        % 2
        == 0
    )
    spark_kept = {
        (r["s"], r["t"])
        for r in _copurchase_edges(spark, SF_DIR, _TRI_DAY_CAP)
        .filter(coin)
        .collect()
    }
    assert spark_kept == kept
    row = queries()["graph_triangle_doulion"](spark, SF_DIR).collect()[0]
    assert row["n_triangles_est"] == 8 * row["n_sampled_triangles"]


def test_kcore_laws_and_fixpoint(spark, ducks):
    """The three defining k-core properties, pinned against an
    independent pure-Python peel over the same thresholded edge set:
    (1) min-degree law — every survivor has >= K neighbors IN the
    core; (2) maximality — no peeled node would qualify if added back;
    (3) the bounded-round Spark result IS the true fixpoint (the
    fixture converges well inside the round budget)."""
    import collections

    from am_kinesis_pay_spark.operators.integration import (
        _KCORE_DAY_CAP,
        _KCORE_K,
        _KCORE_ROUNDS,
        _KCORE_W,
    )
    from am_kinesis_pay_spark.registry import queries

    got = {
        r.node: r.core_degree
        for r in queries()["graph_kcore"](spark, SF_DIR).collect()
    }
    edges = ducks.execute(f"""
        WITH du AS (
          SELECT d, user_id FROM (
            SELECT d, user_id, ROW_NUMBER() OVER (PARTITION BY d
              ORDER BY md5(CAST(user_id AS VARCHAR)), user_id) AS rn
            FROM (SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS d,
                         user_id
                  FROM events WHERE event_type = 'purchase') x) c
          WHERE rn <= {_KCORE_DAY_CAP})
        SELECT src, dst FROM (
          SELECT a.user_id AS src, b.user_id AS dst, COUNT(*) AS w
          FROM du a JOIN du b USING (d) WHERE a.user_id <> b.user_id
          GROUP BY 1, 2) t WHERE w >= {_KCORE_W}
    """).fetchall()
    adj = collections.defaultdict(set)
    for s, t in edges:
        adj[s].add(t)
    alive, rounds = set(adj), 0
    while True:
        new = {
            u
            for u in alive
            if sum(1 for v in adj[u] if v in alive) >= _KCORE_K
        }
        rounds += 1
        if new == alive:
            break
        alive = new
    assert rounds <= _KCORE_ROUNDS // 2, rounds  # converges with slack
    assert set(got) == alive  # (3) true fixpoint
    for u, deg in got.items():
        in_core = sum(1 for v in adj[u] if v in alive)
        assert deg == in_core and deg >= _KCORE_K  # (1)
    for u in set(adj) - alive:  # (2) maximality
        assert sum(1 for v in adj[u] if v in alive) < _KCORE_K or not alive
