"""Independent re-derivations and invariants for the session's
analytics operators — the same strategy as the IVF-PQ golden test:
recompute the statistic from raw fixture rows in plain Python and
match the operator's output exactly, so the oracle-parity check and
this test fail independently."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from am_kinesis_pay_spark.registry import queries
from am_kinesis_pay_spark.tables import load

from tests.conftest import SF_DIR


def test_ab_ttest_matches_hand_computation(spark):
    """Welch t-statistic and dof re-derived from the raw purchase rows
    with textbook formulas (per-row 3-dp rounding mirrored exactly)."""
    rows = (
        load(spark, SF_DIR, "events")
        .filter(F.col("event_type") == "purchase")
        .select("user_id", "value")
        .collect()
    )
    a = [round(r.value, 3) for r in rows if r.user_id % 2 == 0]
    b = [round(r.value, 3) for r in rows if r.user_id % 2 == 1]
    n_a, n_b = len(a), len(b)
    mean_a, mean_b = sum(a) / n_a, sum(b) / n_b
    var_a = (sum(x * x for x in a) - sum(a) ** 2 / n_a) / (n_a - 1)
    var_b = (sum(x * x for x in b) - sum(b) ** 2 / n_b) / (n_b - 1)
    se2 = var_a / n_a + var_b / n_b
    t = (mean_a - mean_b) / math.sqrt(se2)
    dof = se2**2 / (
        (var_a / n_a) ** 2 / (n_a - 1) + (var_b / n_b) ** 2 / (n_b - 1)
    )

    got = queries()["agg_ab_ttest"](spark, SF_DIR).collect()[0]
    assert (got.n_a, got.n_b) == (n_a, n_b)
    assert abs(got.mean_a - mean_a) < 1e-5
    assert abs(got.mean_b - mean_b) < 1e-5
    assert abs(got.t_stat - t) < 1e-5, (got.t_stat, t)
    assert abs(got.welch_dof - dof) < 1e-3, (got.welch_dof, dof)


def test_rfm_quartiles_are_balanced_and_consistent(spark):
    """NTILE invariants: quartile sizes differ by at most 1 per
    dimension, better quartile never has a worse underlying value, and
    the segment string equals the three scores."""
    rows = queries()["events_rfm_segments"](spark, SF_DIR).collect()
    assert rows
    for dim, key, better_is_smaller in (
        ("r_q", "recency_days", True),
        ("f_q", "frequency", False),
        ("m_q", "monetary", False),
    ):
        sizes: dict[int, int] = {}
        for r in rows:
            sizes[getattr(r, dim)] = sizes.get(getattr(r, dim), 0) + 1
        assert set(sizes) <= {1, 2, 3, 4}
        assert max(sizes.values()) - min(sizes.values()) <= 1, (dim, sizes)
        # boundary consistency: every value in quartile q sorts no
        # worse than every value in quartile q+1 (ties may straddle)
        by_q: dict[int, list] = {}
        for r in rows:
            by_q.setdefault(getattr(r, dim), []).append(getattr(r, key))
        for q in sorted(by_q)[:-1]:
            if better_is_smaller:
                assert max(by_q[q]) <= min(by_q[q + 1]), (dim, q)
            else:
                assert min(by_q[q]) >= max(by_q[q + 1]), (dim, q)
    for r in rows:
        assert r.segment == f"{r.r_q}{r.f_q}{r.m_q}"


def test_attribution_credit_conserves_per_conversion(spark):
    """Linear attribution must hand out exactly 1.0 credit per credited
    conversion (within per-touch 6-dp rounding): the sum of per-channel
    credits equals the number of distinct (user, conversion) groups
    that received at least one touch."""
    got = queries()["events_attribution_linear"](spark, SF_DIR).collect()
    total_credit = sum(r.total_credit for r in got)
    n_touches = sum(r.n_touches for r in got)

    # independent recount of credited conversions from raw events
    ev = sorted(
        (
            (r.user_id, r.ts, r.event_id, r.event_type)
            for r in load(spark, SF_DIR, "events").collect()
        ),
        key=lambda t: (t[0], t[1], t[2]),
    )
    from collections import defaultdict
    from datetime import timedelta

    by_user = defaultdict(list)
    for u, ts, eid, et in ev:
        by_user[u].append((ts, eid, et))
    conversions = set()
    touch_count = 0
    for u, seq in by_user.items():
        purchases = [(ts, eid) for ts, eid, et in seq if et == "purchase"]
        for ts, eid, et in seq:
            if et not in ("view", "click"):
                continue
            # exact operator rule: the earliest purchase strictly after
            # the touch in (ts, event_id) window order
            nxt = min(
                (
                    (pts, pid)
                    for pts, pid in purchases
                    if (pts, pid) > (ts, eid)
                ),
                default=None,
            )
            if nxt is not None and nxt[0] <= ts + timedelta(days=7):
                conversions.add((u, nxt[1]))
                touch_count += 1
    assert n_touches == touch_count
    assert abs(total_credit - len(conversions)) < 1e-3, (
        total_credit,
        len(conversions),
    )


def test_model_auc_matches_pairwise_definition(spark):
    """Rank-sum AUC must equal the O(n²) pairwise definition —
    P(score_pos > score_neg) + 0.5·P(tie) — computed directly."""
    rows = (
        load(spark, SF_DIR, "events")
        .groupBy("user_id")
        .agg(
            F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0)).alias(
                "score"
            ),
            F.max(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("value") >= 150),
                    1,
                ).otherwise(0)
            ).alias("label"),
        )
        .collect()
    )
    pos = [r.score for r in rows if r.label == 1]
    neg = [r.score for r in rows if r.label == 0]
    assert pos and neg
    wins = sum(1 for p in pos for n in neg if p > n)
    ties = sum(1 for p in pos for n in neg if p == n)
    want = (wins + 0.5 * ties) / (len(pos) * len(neg))

    got = queries()["agg_model_auc"](spark, SF_DIR).collect()[0]
    assert (got.n_pos, got.n_neg) == (len(pos), len(neg))
    assert abs(got.auc - want) < 1e-6, (got.auc, want)


def test_survival_km_matches_hand_computation(spark):
    """Kaplan-Meier re-derived from raw fixture rows in plain Python:
    per-user lifetimes, 7-day right-censoring, reverse-cumulative risk
    set, product-limit survival."""
    rows = (
        load(spark, SF_DIR, "events")
        .select("user_id", "ts")
        .collect()
    )
    per_user: dict[int, list] = {}
    tmax = max(r.ts for r in rows)
    for r in rows:
        cur = per_user.setdefault(r.user_id, [r.ts, r.ts])
        cur[0] = min(cur[0], r.ts)
        cur[1] = max(cur[1], r.ts)
    import datetime

    per_day: dict[int, list] = {}
    for first, last in per_user.values():
        life = (last.date() - first.date()).days
        censored = last >= tmax - datetime.timedelta(days=7)
        d = per_day.setdefault(life, [0, 0])
        d[0] += 0 if censored else 1
        d[1] += 1
    days = sorted(per_day)
    at_risk, seen = {}, 0
    for day in reversed(days):
        seen += per_day[day][1]
        at_risk[day] = seen
    want, surv, dead = {}, 1.0, False
    for day in days:
        d, n = per_day[day][0], at_risk[day]
        if d == n:
            dead = True
        elif not dead:
            surv *= 1.0 - d / n
        want[day] = (d, n, 0.0 if dead else round(surv, 6))

    got = {
        r.day: (r.deaths, r.at_risk, r.survival)
        for r in queries()["events_survival_km"](spark, SF_DIR).collect()
    }
    assert set(got) == set(want)
    for day in want:
        gd, gn, gs = got[day]
        wd, wn, ws = want[day]
        assert (gd, gn) == (wd, wn), (day, got[day], want[day])
        assert abs(gs - ws) < 2e-6, (day, got[day], want[day])


def test_survival_km_total_churn_guard(spark, tmp_path):
    """The d == n edge (everyone at risk churns): survival must pin to
    exactly 0.0 from that day on, with Spark AND the DuckDB oracle
    agreeing — DuckDB's ln(0) raises and Spark's log(0) is a silently
    sum-skipped NULL, so only the explicit flag keeps them identical."""
    import glob
    import shutil

    import duckdb
    import pandas as pd

    from am_kinesis_pay_spark.registry import REGISTRY

    rows = []
    for u in range(20):
        rows.append((u * 10 + 1, "2024-01-01 00:00:00", u, "click", 1.0, "{}"))
        rows.append(
            (u * 10 + 2, f"2024-01-{(u % 5) + 2:02d} 00:00:00", u, "click", 1.0, "{}")
        )
    # one censored straggler defines the horizon, far past the churns
    rows.append((999, "2024-03-01 00:00:00", 999, "click", 1.0, "{}"))
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    pdf["ts"] = pd.to_datetime(pdf["ts"])
    sf = str(tmp_path / "sf")
    import os

    os.makedirs(sf, exist_ok=True)
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "documents", "embeddings"]:
        shutil.copy(f"{SF_DIR}/{t}.parquet", f"{sf}/{t}.parquet")
    stage = str(tmp_path / "ev")
    spark.createDataFrame(pdf).coalesce(1).write.mode("overwrite").parquet(stage)
    shutil.copy(glob.glob(f"{stage}/part-*.parquet")[0], f"{sf}/events.parquet")

    got = sorted(
        tuple(r) for r in queries()["events_survival_km"](spark, sf).collect()
    )
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet'")
    want = sorted(
        tuple(r)
        for r in con.execute(REGISTRY["events_survival_km"].oracle).fetchall()
    )
    con.close()
    assert got == want
    # day 5 is the last uncensored lifetime: every at-risk user churns
    by_day = {r[0]: r for r in got}
    assert by_day[5][3] == 0.0
    assert by_day[0][3] > 0.0


def test_pointer_doubling_log_rounds_on_path_graph(spark):
    """The O(log n) claim, pinned: a 64-node path graph (diameter 63)
    must converge in ~log2(64) pointer-doubling rounds — plain
    min-label propagation would need 63. Also checks the labels: one
    component, minimum node id wins."""
    from am_kinesis_pay_spark.operators.integration import (
        pointer_doubling_components,
    )

    chain = [(i, i + 1) for i in range(63)] + [(i + 1, i) for i in range(63)]
    edges = spark.createDataFrame(chain, "src bigint, dst bigint")
    labels, rounds = pointer_doubling_components(edges)
    rows = labels.collect()
    assert len(rows) == 64
    assert {r.lbl for r in rows} == {0}
    assert rounds <= 10, f"pointer doubling took {rounds} rounds on a path"


def test_pointer_doubling_matches_label_propagation(spark):
    """Same components as the plain min-label loop on a multi-component
    random-ish graph (deterministic edge set)."""
    from am_kinesis_pay_spark.llm.dedup import _min_label_components
    from am_kinesis_pay_spark.operators.integration import (
        pointer_doubling_components,
    )

    pairs = [(i, (i * 7) % 40 + (i % 3) * 40) for i in range(0, 40, 2)]
    pairs = [(a, b) for a, b in pairs if a != b]
    pdf = spark.createDataFrame(pairs, "a bigint, b bigint")
    lp = {
        (r["node"], r["cluster_id"])
        for r in _min_label_components(pdf, "a", "b", "node").collect()
    }
    sym = pdf.selectExpr("a AS src", "b AS dst").unionByName(
        pdf.selectExpr("b AS src", "a AS dst")
    )
    pd_labels, _ = pointer_doubling_components(sym)
    pd_set = {(r.node, r.lbl) for r in pd_labels.collect()}
    assert lp == pd_set


def test_cuped_pooled_variance_reduction_and_mean_identity(spark):
    """θ = cov/var is the least-squares minimizer over the POOLED
    population, so pooled var(y - θx) = var_y - cov²/var_x <= var_y —
    the CUPED guarantee (a single arm's variance may legitimately rise
    when its own cov/var differs from the global θ, especially at tiny
    n). Also: the user-weighted adjusted mean equals the raw mean via
    the θ·Σ(x - E[x]) = 0 identity, and each arm's reported stats match
    a direct per-user recomputation."""
    import statistics

    from am_kinesis_pay_spark.operators.aggregations import _CUPED_SPLIT
    from am_kinesis_pay_spark.registry import queries
    from am_kinesis_pay_spark.tables import load
    from pyspark.sql import functions as F

    rows = {r.arm: r for r in queries()["agg_cuped_adjusted"](spark, SF_DIR).collect()}
    assert len(rows) == 2
    split = F.lit(f"{_CUPED_SPLIT} 00:00:00").cast("timestamp")
    u = (
        load(spark, SF_DIR, "events")
        .groupBy("user_id")
        .agg(
            F.sum(F.when(F.col("ts") < split, 1).otherwise(0)).alias("x"),
            F.coalesce(
                F.sum(
                    F.when(
                        F.col("ts") >= split,
                        F.col("value").cast("decimal(18,2)"),
                    )
                ),
                F.lit(0),
            ).alias("y"),
        )
        .collect()
    )
    xs = [float(r.x) for r in u]
    ys = [float(r.y) for r in u]
    n = len(xs)
    mx = sum(xs) / n
    cov = sum((a - mx) * (b - sum(ys) / n) for a, b in zip(xs, ys)) / (n - 1)
    theta = cov / statistics.variance(xs)
    assert abs(theta - rows[0].theta) < 1e-6
    # pooled guarantee
    adj = [b - theta * (a - mx) for a, b in zip(xs, ys)]
    assert statistics.variance(adj) <= statistics.variance(ys) + 1e-9
    # mean identity + per-arm recomputation
    total = sum(r.n_users for r in rows.values())
    raw = sum(r.mean_y * r.n_users for r in rows.values()) / total
    madj = sum(r.mean_y_cuped * r.n_users for r in rows.values()) / total
    assert abs(raw - madj) < 1e-9
    for arm in (0, 1):
        ya = [y for r, y in zip(u, adj) if r.user_id % 2 == arm]
        assert abs(statistics.variance(ya) - rows[arm].var_y_cuped) < 1e-6


def test_anova_matches_hand_computation(spark):
    """One-way ANOVA F re-derived from raw event rows with the textbook
    between/within decomposition (exact-decimal group sums mirrored via
    2-dp cents arithmetic)."""
    rows = (
        load(spark, SF_DIR, "events")
        .select("event_type", "value")
        .collect()
    )
    groups: dict[str, list[int]] = {}
    for r in rows:
        groups.setdefault(r.event_type, []).append(round(r.value * 100))
    k = len(groups)
    n = sum(len(v) for v in groups.values())
    s_all = sum(sum(v) for v in groups.values()) / 100.0
    ssb = sum(
        round(
            len(v) * (sum(v) / 100.0 / len(v) - s_all / n) ** 2, 6
        )
        for v in groups.values()
    )
    ssw = sum(
        round(
            sum(x * x for x in v) / 10000.0
            - (sum(v) / 100.0) ** 2 / len(v),
            6,
        )
        for v in groups.values()
    )
    f = (ssb / (k - 1)) / (ssw / (n - k))

    got = queries()["agg_anova_oneway"](spark, SF_DIR).collect()[0]
    assert got.k == k and got.n == n
    assert math.isclose(got.ssb, ssb, rel_tol=1e-9)
    assert math.isclose(got.ssw, ssw, rel_tol=1e-9)
    assert math.isclose(got.f_stat, round(f, 6), rel_tol=1e-6)


def test_pan_mask_luhn_gate(spark):
    """The mask decision must agree row-for-row with a textbook Python
    Luhn validator run on the emitted candidate string — and the
    fixture guarantees both branches occur."""

    def luhn_ok(pan: str) -> bool:
        total = 0
        for i, ch in enumerate(reversed(pan)):
            d = int(ch)
            if i % 2 == 1:
                d *= 2
                if d > 9:
                    d -= 9
            total += d
        return total % 10 == 0

    rows = queries()["fn_pan_mask"](spark, SF_DIR).collect()
    assert rows
    seen = {True: 0, False: 0}
    for r in rows:
        expect = luhn_ok(r.candidate)
        assert r.luhn_valid == expect, r
        seen[expect] += 1
        if expect:
            assert r.masked == "**** **** **** " + r.candidate[-4:]
        else:
            assert r.masked == r.candidate
    assert seen[True] > 0 and seen[False] > 0  # both branches exercised


def test_golden_record_matches_union_find(spark, ducks):
    """er_golden_record checked against an independent Python
    union-find over the SAME matched pairs (a different clustering
    algorithm than both Spark's min-label loop and the oracle's
    recursive closure), with survivorship recomputed per cluster:
    membership, canonical key, richest-member name, and balances must
    all agree; every cluster must have >= 2 members; cluster_id must
    be the component MINIMUM."""
    from am_kinesis_pay_spark.registry import REGISTRY, queries

    got = {r.cluster_id: r for r in
           queries()["er_golden_record"](spark, SF_DIR).collect()}
    pairs = ducks.execute(
        REGISTRY["er_customer_linkage"].oracle
    ).fetchall()
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b, *_ in pairs:
        union(a, b)
    clusters = {}
    for node in list(parent):
        clusters.setdefault(find(node), set()).add(node)
    cust = {
        k: (n, bal)
        for k, n, bal in ducks.execute(
            "SELECT c_custkey, c_name, c_acctbal FROM customer"
        ).fetchall()
    }
    want = {}
    for root, members in clusters.items():
        if len(members) < 2:
            continue
        cid = min(members)
        richest = max(members, key=lambda m: (cust[m][1], -m))
        want[cid] = (
            len(members),
            min(members),
            cust[richest][0],
            round(max(cust[m][1] for m in members), 2),
            round(sum(round(cust[m][1], 2) for m in members), 2),
        )
    assert set(got) == set(want)
    for cid, (n, canon, name, mx, tot) in want.items():
        g = got[cid]
        assert g.n_members == n and g.canonical_custkey == canon
        assert g.golden_name == name
        assert abs(g.max_acctbal - mx) < 1e-6
        assert abs(g.total_acctbal - tot) < 1e-6
        assert cid == canon  # min-label invariant


def test_concurrency_curve_matches_python_sweep(spark, ducks):
    """events_concurrency_curve re-derived by a pure-Python sweep
    line: sessionize each user's ordered events (30-min gap), emit
    ±1 boundaries, walk the global instant order accumulating
    concurrency with starts-before-ends at equal instants, and take
    per-day peaks — must match exactly. Conservation law: the final
    prefix sum is zero (every start has an end)."""
    from am_kinesis_pay_spark.registry import queries

    got = {
        r.day: (r.peak_concurrency, r.n_boundary_instants)
        for r in queries()["events_concurrency_curve"](
            spark, SF_DIR
        ).collect()
    }
    rows = ducks.execute(
        "SELECT user_id, epoch_us(ts), event_id FROM events"
        " ORDER BY user_id, epoch_us(ts), event_id"
    ).fetchall()
    sessions = []
    cur_u, start, last = None, None, None
    for u, t, _eid in rows:
        if u != cur_u or t - last > 1800 * 1000000:
            if cur_u is not None:
                sessions.append((start, last))
            cur_u, start = u, t
        last = t
    sessions.append((start, last))
    per_t = {}
    for s, e in sessions:
        net, plus = per_t.get(s, (0, 0))
        per_t[s] = (net + 1, plus + 1)
        net, plus = per_t.get(e, (0, 0))
        per_t[e] = (net - 1, plus)
    import datetime as dt

    prefix, want = 0, {}
    for t in sorted(per_t):
        net, plus = per_t[t]
        peak_here = prefix + plus
        day = dt.datetime(1970, 1, 1) + dt.timedelta(microseconds=t)
        day = day.date()
        p, n = want.get(day, (0, 0))
        want[day] = (max(p, peak_here), n + 1)
        prefix += net
    assert prefix == 0  # conservation
    assert got == want


def test_lpa_aggregate_argmax_matches_window_pick(spark):
    """r12 OPT pins: graph_label_propagation's max_by((c, -lbl))
    argmax must equal the old row_number()=1 window pick (mode of
    neighbor labels, ties toward the SMALLER label), and the dropped
    carry-forward join must be vestigial (every node of a symmetric
    edge set receives votes). Brute-forced on a hand graph with a
    deliberate tie: node 30's neighbors {10, 20} vote 1:1, so the
    smaller label 10 must win."""
    from pyspark.sql import functions as F

    pairs = [(10, 30), (20, 30), (10, 20), (40, 10), (40, 20), (40, 30)]
    sym = [(a, b) for a, b in pairs] + [(b, a) for a, b in pairs]
    edges = spark.createDataFrame(sym, "src bigint, dst bigint")
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("lbl"))
    )
    votes = (
        edges.join(
            F.broadcast(labels.select(F.col("node").alias("dst"), "lbl")),
            "dst",
        )
        .groupBy(F.col("src").alias("node"), "lbl")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    got = {
        (r.node, r.lbl)
        for r in votes.groupBy("node")
        .agg(
            F.max_by(
                "lbl", F.struct(F.col("c"), (-F.col("lbl")).alias("nl"))
            ).alias("lbl")
        )
        .collect()
    }
    # brute force: mode of neighbor labels, ties -> smaller label
    from collections import Counter, defaultdict

    nbrs = defaultdict(list)
    for a, b in sym:
        nbrs[a].append(b)  # labels are initial = node ids
    want = set()
    for n, vs in nbrs.items():
        cnt = Counter(vs)
        best = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
        want.add((n, best))
    assert got == want
    assert (30, 10) in got, "tie must break toward the smaller label"
    # every node voted on (the carry-forward join was vestigial)
    assert {n for n, _ in got} == set(nbrs)


def test_er_grams_artifact_matches_inline_computation(spark):
    """r12 OPT pins: the _er_grams session artifact equals the inline
    gram + document-frequency computation it replaced (distinct
    3-grams per customer, grams in >20% of names dropped)."""
    from pyspark.sql import functions as F

    from am_kinesis_pay_spark.operators.linkage import (
        _LSH_DF_MAX,
        _er_grams,
    )
    from am_kinesis_pay_spark.tables import load
    from tests.conftest import SF_DIR

    cust = load(spark, SF_DIR, "customer").filter(F.length("c_name") >= 3)
    grams = cust.select(
        "c_custkey",
        F.explode(
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(1), F.length("c_name") - 2),
                    lambda i: F.col("c_name").substr(i, F.lit(3)),
                )
            )
        ).alias("g"),
    )
    df_counts = grams.groupBy("g").agg(F.count(F.lit(1)).alias("df"))
    n = cust.agg(F.count(F.lit(1)).alias("n"))
    want = {
        (r.c_custkey, r.g)
        for r in grams.join(df_counts, "g")
        .crossJoin(F.broadcast(n))
        .filter(F.col("df") <= F.lit(_LSH_DF_MAX) * F.col("n"))
        .select("c_custkey", "g")
        .collect()
    }
    got = {
        (r.c_custkey, r.g) for r in _er_grams(spark, SF_DIR).collect()
    }
    assert got == want and len(got) > 0
