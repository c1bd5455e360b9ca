"""Semantic pins for the round-8 statistics/feature batch — properties
the DuckDB oracle's hash equality cannot express by itself: the BH
rejection-prefix law, Welch's formula against an independent numpy
computation, equi-depth bin structure, label leakage-freedom, and
Neyman allocation feasibility."""

from __future__ import annotations

import math

from am_kinesis_pay_spark.registry import queries

from tests.conftest import SF_DIR


def test_benjamini_hochberg_rejects_a_prefix(spark):
    """The BH procedure's defining structure: sort p ascending; the
    rejected set is EXACTLY ranks 1..k* where k* is the largest k with
    p_(k) <= k*alpha/m — a prefix, never a gap, even where individual
    p_(i) > i*alpha/m inside the prefix."""
    rows = queries()["agg_benjamini_hochberg"](spark, SF_DIR).collect()
    rows.sort(key=lambda r: r.k)
    m = rows[0].m
    # m = POPULATED buckets (sparse user ids at small SF leave empty
    # residues), never more than the 20 bucket domain
    assert len(rows) == m and 2 <= m <= 20
    ks_ok = [r.k for r in rows if r.p <= r.k * 0.05 / m]
    k_star = max(ks_ok) if ks_ok else 0
    for r in rows:
        assert r.rejected == (r.k <= k_star), (r, k_star)
    # p-values are valid probabilities and ordered by rank
    ps = [r.p for r in rows]
    assert ps == sorted(ps) and all(0.0 <= p <= 1.0 for p in ps)


def test_welch_matches_numpy(spark, ducks):
    """agg_ab_ttest's t and Welch dof recomputed independently (numpy
    float64 over the raw columns, textbook formulas) must agree to the
    6-dp rounding — the existing Welch entry gains the same
    independent-recomputation pin the rest of the r8 stats batch has."""
    import numpy as np

    out = queries()["agg_ab_ttest"](spark, SF_DIR).collect()[0]
    v1 = np.array(
        [
            round(r[0], 3)
            for r in ducks.execute(
                "SELECT value FROM events WHERE event_type='purchase'"
                " AND user_id % 2 = 0"
            ).fetchall()
        ]
    )
    v2 = np.array(
        [
            round(r[0], 3)
            for r in ducks.execute(
                "SELECT value FROM events WHERE event_type='purchase'"
                " AND user_id % 2 <> 0"
            ).fetchall()
        ]
    )
    se1 = v1.var(ddof=1) / len(v1)
    se2 = v2.var(ddof=1) / len(v2)
    t = (v1.mean() - v2.mean()) / math.sqrt(se1 + se2)
    df = (se1 + se2) ** 2 / (se1**2 / (len(v1) - 1) + se2**2 / (len(v2) - 1))
    assert out.n_a == len(v1) and out.n_b == len(v2)
    assert abs(out.t_stat - t) < 1e-4, (out.t_stat, t)
    assert abs(out.welch_dof - df) < 1e-3, (out.welch_dof, df)


def test_quantile_binning_structure(spark):
    """Equi-depth bins: ids are a dense 0..K-1 prefix, value ranges are
    disjoint and ordered, and no bin exceeds the ideal depth by more
    than the largest single-value multiplicity (ties are atomic)."""
    rows = queries()["fe_quantile_binning"](spark, SF_DIR).collect()
    rows.sort(key=lambda r: r.bin)
    assert [r.bin for r in rows] == list(range(len(rows)))
    for a, b in zip(rows, rows[1:]):
        assert a.hi <= b.lo, (a, b)
    n = sum(r.n_rows for r in rows)
    ideal = n / len(rows)
    max_mult = max(
        r.n_rows for r in rows
    )  # loose: any bin is at least one whole tie-run
    assert all(r.n_rows <= ideal + max_mult for r in rows)


def test_lead_label_is_leakage_free(spark):
    """Every non-null label points at a REAL purchase strictly in the
    user's future: re-derive the next-purchase time per user in pandas
    and compare exactly (BIGINT micros)."""
    ev = (
        queries()["win_lead_label"](spark, SF_DIR)
        .toPandas()
        .sort_values("event_id")
    )
    from am_kinesis_pay_spark.tables import load

    raw = load(spark, SF_DIR, "events").select(
        "event_id", "user_id", "ts", "event_type"
    ).toPandas()
    raw["us"] = raw["ts"].astype("datetime64[us]").astype("int64")
    raw = raw.sort_values(["user_id", "us", "event_id"])
    expected = {}
    for _, grp in raw.groupby("user_id", sort=False):
        rows = list(grp.itertuples())
        nxt = None
        for r in reversed(rows):
            expected[r.event_id] = None if nxt is None else nxt - r.us
            if r.event_type == "purchase":
                nxt = r.us
    got = dict(zip(ev["event_id"], ev["label_us"]))
    assert len(got) == len(expected)
    for eid, want in expected.items():
        have = got[eid]
        if want is None:
            assert have is None or (isinstance(have, float) and math.isnan(have))
        else:
            assert have == want, (eid, have, want)
        assert want is None or want > 0  # strictly future


def test_neyman_allocation_feasible(spark):
    """Per stratum: the take equals min(allocation, stratum size), the
    total never exceeds the budget, and membership is the md5 prefix
    (re-derivable)."""
    import collections
    import hashlib

    from am_kinesis_pay_spark.tables import load

    rows = queries()["sample_neyman"](spark, SF_DIR).collect()
    taken = collections.Counter(r.c_mktsegment for r in rows)
    alloc = {r.c_mktsegment: r.stratum_take for r in rows}
    assert sum(taken.values()) <= 1000
    full = load(spark, SF_DIR, "customer").select(
        "c_custkey", "c_mktsegment"
    ).collect()
    by_seg: dict = collections.defaultdict(list)
    for r in full:
        by_seg[r.c_mktsegment].append(r.c_custkey)
    chosen = {(r.c_mktsegment, r.c_custkey) for r in rows}
    for seg, n_take in alloc.items():
        assert taken[seg] == min(n_take, len(by_seg[seg]))
        want = sorted(
            by_seg[seg],
            key=lambda k: (hashlib.md5(str(k).encode()).hexdigest(), k),
        )[: taken[seg]]
        assert {(seg, k) for k in want} == {
            c for c in chosen if c[0] == seg
        }


def test_delta_method_matches_numpy(spark, ducks):
    """agg_delta_method_ci recomputed independently: per-user (x, y)
    pairs pulled raw from DuckDB, ratio/SE via the textbook delta
    formula in numpy float64 — must agree to the 6-dp rounding, and
    the CI must be exactly ratio ± z * se."""
    import numpy as np

    rows = {r.arm: r for r in
            queries()["agg_delta_method_ci"](spark, SF_DIR).collect()}
    assert set(rows) == {"A", "B"}
    per_user = ducks.execute(
        "SELECT user_id % 2 = 0 AS grp_a,"
        " COALESCE(SUM(CASE WHEN event_type='purchase'"
        "   THEN round(value, 3) END), 0) AS x,"
        " COUNT(*) AS y FROM events GROUP BY user_id"
    ).fetchall()
    for arm, want_a in (("A", True), ("B", False)):
        x = np.array([float(r[1]) for r in per_user if r[0] == want_a])
        y = np.array([float(r[2]) for r in per_user if r[0] == want_a])
        n = len(x)
        ratio = x.sum() / y.sum()
        var_x, var_y = x.var(ddof=1), y.var(ddof=1)
        cov = np.cov(x, y, ddof=1)[0, 1]
        se = math.sqrt(
            (var_x - 2 * ratio * cov + ratio * ratio * var_y) / n
        ) / y.mean()
        got = rows[arm]
        assert got.n == n
        assert abs(got.ratio - ratio) < 2e-6, (arm, got.ratio, ratio)
        assert abs(got.se_ratio - se) < 2e-6, (arm, got.se_ratio, se)
        assert abs(got.ci_lo - (got.ratio - 1.959964 * got.se_ratio)) < 2e-6
        assert abs(got.ci_hi - (got.ratio + 1.959964 * got.se_ratio)) < 2e-6


def test_ols_multifeature_matches_numpy(spark, ducks):
    """agg_ols_multifeature's Cramer-rule coefficients recomputed with
    numpy's linear solver over the same normal equations, and with
    np.linalg.lstsq over the RAW design matrix — both must agree to
    the 6-dp rounding (the system is well-conditioned: quantity and
    discount are uncorrelated by construction)."""
    import numpy as np

    rows = queries()["agg_ols_multifeature"](spark, SF_DIR).collect()
    assert len(rows) == 3  # l_returnflag in {A, N, R}
    for r in rows:
        raw = ducks.execute(
            "SELECT l_quantity, l_discount, l_extendedprice FROM lineitem"
            " WHERE l_returnflag = ?", [r.l_returnflag]
        ).fetchall()
        X = np.array([[1.0, float(a), float(b)] for a, b, _ in raw])
        yv = np.array([float(c) for _, _, c in raw])
        beta, *_ = np.linalg.lstsq(X, yv, rcond=None)
        assert r.n == len(raw)
        assert abs(r.intercept - beta[0]) < 1e-4, (r, beta)
        assert abs(r.coef_quantity - beta[1]) < 1e-5, (r, beta)
        assert abs(r.coef_discount - beta[2]) < 1e-3, (r, beta)
        resid = yv - X @ beta
        sst = ((yv - yv.mean()) ** 2).sum()
        assert abs(r.r2 - (1 - (resid ** 2).sum() / sst)) < 1e-5
        assert 0.0 <= r.r2 <= 1.0


def test_theta_setops_estimator_laws(spark, ducks):
    """The theta-sketch set-algebra invariants hash equality cannot
    state: inclusion-exclusion ties the four estimates together
    exactly; the union estimate sits inside its 3-sigma audit band;
    exact counts match an independent DuckDB set computation; and
    estimates are nonnegative with intersect <= min(est_a, est_b)
    inflated by at most sketch noise."""
    row = queries()["agg_theta_setops"](spark, SF_DIR).collect()[0]
    assert row.within_tol_union
    got_exact = ducks.execute(
        "SELECT COUNT(DISTINCT user_id) FILTER ("
        "  user_id IN (SELECT user_id FROM events WHERE event_type='click')"
        "  AND user_id IN (SELECT user_id FROM events"
        "                  WHERE event_type='purchase')),"
        " COUNT(DISTINCT user_id)"
        " FROM events WHERE event_type IN ('click', 'purchase')"
    ).fetchone()
    assert row.exact_intersect == got_exact[0]
    assert row.exact_union == got_exact[1]
    assert abs(
        (row.est_click + row.est_purchase - row.est_intersect)
        - row.est_union
    ) < 2e-6
    assert row.est_intersect >= 0.0
    assert row.est_union >= max(row.est_click, row.est_purchase) - 2e-6


def test_rolling_active_users_set_semantics(spark, ducks):
    """WAU(d) must equal the size of the UNION of the 7 trailing daily
    user sets, recomputed independently with Python set algebra — the
    property that distinguishes rolling-distinct from a (wrong) sum of
    daily distincts. Also: WAU >= DAU, stickiness in (0, 1], and the
    warm-up days with an incomplete trailing week are excluded."""
    import datetime as dt

    rows = queries()["events_rolling_active_users"](spark, SF_DIR).collect()
    day_sets: dict = {}
    for d, u in ducks.execute(
        "SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE), user_id"
        " FROM events"
    ).fetchall():
        day_sets.setdefault(d, set()).add(u)
    min_d = min(day_sets)
    assert rows and all(r.d >= min_d + dt.timedelta(days=6) for r in rows)
    for r in rows:
        union = set()
        for k in range(7):
            union |= day_sets.get(r.d - dt.timedelta(days=k), set())
        assert r.wau == len(union), (r.d, r.wau, len(union))
        assert r.dau == len(day_sets.get(r.d, set()))
        assert r.wau >= r.dau
        assert 0.0 < r.stickiness <= 1.0


def test_period_over_period_calendar_exactness(spark, ducks):
    """The WoW join must be CALENDAR-exact: revenue_prior_week equals
    the daily revenue exactly 7 days earlier (recomputed raw), and is
    NULL exactly when that calendar day has no orders — the gap case a
    row-offset LAG gets wrong."""
    import datetime as dt

    rows = queries()["agg_period_over_period"](spark, SF_DIR).collect()
    daily = {
        d: float(rev)
        for d, rev in ducks.execute(
            "SELECT CAST(date_trunc('day', o_orderdate) AS DATE),"
            " SUM(CAST(round(o_totalprice, 2) AS DECIMAL(18,2)))"
            " FROM orders GROUP BY 1"
        ).fetchall()
    }
    assert len(rows) == len(daily)
    n_gaps = 0
    for r in rows:
        prior_day = r.d - dt.timedelta(days=7)
        if prior_day in daily:
            assert r.revenue_prior_week is not None
            assert abs(r.revenue_prior_week - daily[prior_day]) < 1e-6
        else:
            n_gaps += 1
            assert r.revenue_prior_week is None and r.wow_pct is None
    assert n_gaps >= 1  # the warm-up week guarantees at least some gaps


def test_referential_integrity_identities(spark, ducks):
    """Child totals must match raw table counts, orphan counts the
    independent anti-join counts, and the pct the exact ratio."""
    rows = {r.relationship: r for r in
            queries()["dq_referential_integrity"](spark, SF_DIR).collect()}
    assert set(rows) == {
        "orders->customer", "lineitem->orders", "lineitem->part"
    }
    checks = {
        "orders->customer": (
            "SELECT COUNT(*) FROM orders",
            "SELECT COUNT(*) FROM orders WHERE o_custkey NOT IN"
            " (SELECT c_custkey FROM customer)",
        ),
        "lineitem->orders": (
            "SELECT COUNT(*) FROM lineitem",
            "SELECT COUNT(*) FROM lineitem WHERE l_orderkey NOT IN"
            " (SELECT o_orderkey FROM orders)",
        ),
        "lineitem->part": (
            "SELECT COUNT(*) FROM lineitem",
            "SELECT COUNT(*) FROM lineitem WHERE l_partkey NOT IN"
            " (SELECT p_partkey FROM part)",
        ),
    }
    for rel, (q_total, q_orphan) in checks.items():
        r = rows[rel]
        assert r.child_rows == ducks.execute(q_total).fetchone()[0]
        assert r.orphan_rows == ducks.execute(q_orphan).fetchone()[0]
        assert abs(r.orphan_pct - r.orphan_rows / r.child_rows * 100) < 1e-6


def test_recursive_spine_is_contiguous_and_conserves(spark, ducks):
    """fn_sql_recursive's engine-generated month spine must be exactly
    the contiguous calendar from the first to the last order month
    (every month once — the recursion's termination and step laws),
    and the joined aggregates must conserve the raw totals."""
    rows = sorted(
        queries()["fn_sql_recursive"](spark, SF_DIR).collect(),
        key=lambda r: r.m,
    )
    lo, hi, n_total = ducks.execute(
        "SELECT CAST(date_trunc('month', MIN(o_orderdate)) AS DATE),"
        " CAST(date_trunc('month', MAX(o_orderdate)) AS DATE), COUNT(*)"
        " FROM orders"
    ).fetchone()
    assert rows[0].m == lo and rows[-1].m == hi
    for a, b in zip(rows, rows[1:]):
        nxt = (a.m.replace(day=1, month=a.m.month % 12 + 1,
                           year=a.m.year + (a.m.month == 12)))
        assert b.m == nxt, (a.m, b.m)
    assert sum(r.n_orders for r in rows) == n_total
    assert all(r.revenue >= 0.0 for r in rows)


def test_mutual_information_matches_python(spark, ducks):
    """agg_mutual_information recomputed from the raw contingency
    table in Python floats: MI, both entropies and the NMI must agree
    to rounding; information-theory laws hold (MI >= 0, MI <= min(H),
    0 <= NMI <= 1)."""
    import math as m

    row = queries()["agg_mutual_information"](spark, SF_DIR).collect()[0]
    cells = ducks.execute(
        "SELECT event_type, dayofweek(CAST(ts AS DATE)), COUNT(*)"
        " FROM events GROUP BY 1, 2"
    ).fetchall()
    n = sum(c for _, _, c in cells)
    nx, ny = {}, {}
    for x, y, c in cells:
        nx[x] = nx.get(x, 0) + c
        ny[y] = ny.get(y, 0) + c
    mi = sum(
        round((c / n) * m.log((c * n) / (nx[x] * ny[y])), 9)
        for x, y, c in cells
    )
    hx = sum(round(-(v / n) * m.log(v / n), 9) for v in nx.values())
    hy = sum(round(-(v / n) * m.log(v / n), 9) for v in ny.values())
    assert abs(row.mi_nats - mi) < 2e-6
    assert abs(row.h_event_type - hx) < 2e-6
    assert abs(row.h_weekday - hy) < 2e-6
    assert abs(row.nmi - mi / m.sqrt(hx * hy)) < 2e-6
    assert row.mi_nats >= -1e-9
    assert row.mi_nats <= min(hx, hy) + 1e-9
    assert -1e-9 <= row.nmi <= 1 + 1e-9


def test_lag_features_leakage_free(spark, ducks):
    """fe_lag_features recomputed per user in Python: lag/lead are
    ACTIVE-day offsets, the rolling mean covers exactly the trailing
    <=7 active days, and the target is strictly future (the last
    active day of every user emits no row — no fabricated label)."""
    rows = queries()["fe_lag_features"](spark, SF_DIR).collect()
    daily = {}
    for u, d, ne, dv in ducks.execute(
        "SELECT user_id, CAST(date_trunc('day', ts) AS DATE), COUNT(*),"
        " CAST(SUM(CAST(round(value, 3) AS DECIMAL(18,3))) AS DOUBLE)"
        " FROM events GROUP BY 1, 2"
    ).fetchall():
        daily.setdefault(u, []).append((d, ne, dv))
    for u in daily:
        daily[u].sort()
    got = {(r.user_id, r.d): r for r in rows}
    n_expected = 0
    for u, seq in daily.items():
        for i, (d, ne, dv) in enumerate(seq):
            if i + 1 >= len(seq):
                assert (u, d) not in got  # last active day: no label
                continue
            n_expected += 1
            r = got[(u, d)]
            assert r.n_events == ne
            assert r.target_next_events == seq[i + 1][1]
            assert r.lag1_events == (seq[i - 1][1] if i >= 1 else None)
            assert r.lag7_events == (seq[i - 7][1] if i >= 7 else None)
            window = [v for _, _, v in seq[max(0, i - 6): i + 1]]
            assert r.roll7_n == len(window)
            assert abs(r.roll7_value - round(sum(window) / len(window), 6)) < 2e-6
    assert len(rows) == n_expected


def test_holt_linear_matches_python_fixed_point(spark, ducks):
    """ts_holt_linear's (level, trend) trajectory recomputed with the
    same integer fixed-point recurrence in pure Python — must match
    exactly (no float enters the fold), and forecast = level +
    7*trend by construction. Guards the fold engine itself: DuckDB
    1.0's list_reduce rebinds struct accumulator fields to
    already-evaluated output fields (found while building this entry),
    which is why the oracle uses a recursive CTE instead."""
    S = 1000000
    rows = {r.event_type: r for r in
            queries()["ts_holt_linear"](spark, SF_DIR).collect()}
    daily = {}
    for et, d, n in ducks.execute(
        "SELECT event_type, CAST(ts AS DATE), COUNT(*) FROM events"
        " GROUP BY 1, 2 ORDER BY 2"
    ).fetchall():
        daily.setdefault(et, []).append(n)
    for et, ys in daily.items():
        l, b = ys[0] * S, 0
        for y in ys[1:]:
            n1 = 3 * y * S + 7 * (l + b) + 5
            l_new = (n1 - (n1 % 10 + 10) % 10) // 10
            n2 = (l_new - l) + 9 * b + 5
            b_new = (n2 - (n2 % 10 + 10) % 10) // 10
            l, b = l_new, b_new
        r = rows[et]
        assert r.n_days == len(ys)
        assert abs(r.level - round(l / S, 6)) < 1e-9, (et, r.level, l / S)
        assert abs(r.trend - round(b / S, 6)) < 1e-9
        assert abs(r.forecast_7d - round((l + 7 * b) / S, 6)) < 1e-9


def test_bot_detection_cv_recompute(spark, ducks):
    """events_bot_detection's per-user cv recomputed from raw
    microsecond gaps in Python; users below the 5-gap floor excluded;
    flag consistent with the threshold."""
    import math as m

    rows = {r.user_id: r for r in
            queries()["events_bot_detection"](spark, SF_DIR).collect()}
    seqs = {}
    for u, t in ducks.execute(
        "SELECT user_id, epoch_us(ts) FROM events ORDER BY 1, 2"
    ).fetchall():
        seqs.setdefault(u, []).append(t)
    for u, ts in seqs.items():
        gaps = [b - a for a, b in zip(ts, ts[1:])]
        if len(gaps) < 5:
            assert u not in rows
            continue
        n = len(gaps)
        s1, s2 = sum(gaps), sum(g * g for g in gaps)
        mean = s1 / n
        sd = m.sqrt((s2 - s1 * s1 / n) / (n - 1))
        r = rows[u]
        assert r.n_gaps == n
        assert abs(r.cv - sd / mean) < 2e-6
        assert r.is_regular == (sd / mean < 0.5)


def test_rolling_regression_matches_lstsq(spark, ducks):
    """win_rolling_regression's frame-sum slope recomputed with
    numpy.polyfit over the raw trailing-7 (x, y) points for every
    emitted row of a sample of users; warm-up rows (fewer than 7
    active days) must be absent."""
    import numpy as np

    rows = queries()["win_rolling_regression"](spark, SF_DIR).collect()
    daily = {}
    for u, d, y in ducks.execute(
        "SELECT user_id, CAST(date_trunc('day', ts) AS DATE),"
        " SUM(CAST(round(value, 3) AS DECIMAL(18,3)))"
        " FROM events GROUP BY 1, 2 ORDER BY 2"
    ).fetchall():
        daily.setdefault(u, []).append(float(y))
    got = {}
    for r in rows:
        got.setdefault(r.user_id, []).append(r)
    for u, seq in daily.items():
        expect_rows = max(0, len(seq) - 6)
        assert len(got.get(u, [])) == expect_rows, u
    sample = sorted(got)[:25]
    for u in sample:
        seq = daily[u]
        urows = sorted(got[u], key=lambda r: r.d)
        for j, r in enumerate(urows):
            ys = seq[j: j + 7]
            xs = np.arange(j + 1, j + 8, dtype=float)
            slope = np.polyfit(xs, np.array(ys), 1)[0]
            assert abs(r.slope_7d - slope) < 1e-4, (u, r.d, r.slope_7d, slope)


def test_raking_ipf_calibration_laws(spark, ducks):
    """IPF's defining properties, plus an exact Python re-walk of the
    quantized trajectory: after the final COLUMN step every column
    margin matches its target to quantization (max_col_err ~ 0), row
    margins carry only the alternation residual, weights are positive,
    and total mass is preserved to rounding."""
    rows = queries()["agg_raking_ipf"](spark, SF_DIR).collect()
    cells = {
        (x, y): n
        for x, y, n in ducks.execute(
            "SELECT event_type, isodow(CAST(ts AS DATE)), COUNT(*)"
            " FROM events GROUP BY 1, 2"
        ).fetchall()
    }
    total = sum(cells.values())
    xs = sorted({k[0] for k in cells})
    ys = sorted({k[1] for k in cells})
    w = {k: float(v) for k, v in cells.items()}

    def adjust(axis, target):
        keys = xs if axis == 0 else ys
        for k in keys:
            s = sum(v for kk, v in w.items() if kk[axis] == k)
            for kk in list(w):
                if kk[axis] == k:
                    w[kk] = round(w[kk] * (target / s), 9)

    for _ in range(2):
        adjust(0, total / len(xs))
        adjust(1, total / len(ys))
    got = {(r.event_type, r.iso_weekday): r for r in rows}
    assert set(got) == set(cells)
    for k, r in got.items():
        assert abs(r.raked_weight - round(w[k], 6)) < 2e-6, (k, r, w[k])
        assert r.raked_weight > 0
        assert r.n == cells[k]
    r0 = rows[0]
    assert r0.max_col_err < 1e-6  # exact after the final col step
    assert r0.max_row_err < 0.05  # alternation residual only
    assert abs(sum(r.raked_weight for r in rows) - total) < 1e-3


def test_hte_segments_matches_python(spark, ducks):
    """Per-segment uplift readout recomputed from raw per-user
    conversions in Python: counts, rates, uplift and the
    two-proportion z must match; z is NULL exactly when the standard
    error degenerates (both rates 0 or 1, or an empty arm)."""
    import math as m

    rows = {r.segment: r for r in
            queries()["agg_hte_segments"](spark, SF_DIR).collect()}
    per_user = ducks.execute(
        "SELECT user_id, MAX(CASE WHEN event_type='purchase' THEN 1"
        " ELSE 0 END) FROM events GROUP BY user_id"
    ).fetchall()
    segs = {}
    for u, conv in per_user:
        key = (int(u % 5), u % 2 == 0)
        n, c = segs.get(key, (0, 0))
        segs[key] = (n + 1, c + conv)
    for seg in sorted(rows):
        n_a, c_a = segs.get((seg, True), (0, 0))
        n_b, c_b = segs.get((seg, False), (0, 0))
        r = rows[seg]
        assert (r.n_a, r.n_b) == (n_a, n_b)
        p_a = c_a / n_a if n_a else None
        p_b = c_b / n_b if n_b else None
        if p_a is None or p_b is None:
            assert r.uplift is None
            continue
        assert abs(r.rate_a - p_a) < 2e-6 and abs(r.rate_b - p_b) < 2e-6
        assert abs(r.uplift - (p_a - p_b)) < 2e-6
        se = m.sqrt(p_a * (1 - p_a) / n_a + p_b * (1 - p_b) / n_b)
        if se == 0:
            assert r.z is None
        else:
            assert abs(r.z - (p_a - p_b) / se) < 2e-6


def test_freshness_watermark_laws(spark, ducks):
    """dq_freshness invariants: the watermark is the corpus max, so at
    least one type reports lag 0; every lag equals the independent
    floor((wm - last)/60s) in exact integer micros; is_stale matches
    the SLA threshold."""
    rows = queries()["dq_freshness"](spark, SF_DIR).collect()
    raw = ducks.execute(
        "SELECT event_type, COUNT(*), MAX(epoch_us(ts)) FROM events"
        " GROUP BY 1"
    ).fetchall()
    wm = max(t for _, _, t in raw)
    want = {et: (n, (wm - t) // 60000000) for et, n, t in raw}
    assert {r.event_type for r in rows} == set(want)
    assert min(r.lag_minutes for r in rows) == 0
    for r in rows:
        n, lag = want[r.event_type]
        assert r.n_events == n
        assert r.lag_minutes == lag
        assert r.is_stale == (lag > 90)


def test_heavy_change_is_true_topn_by_delta(spark, ducks):
    """agg_heavy_change recomputed fully in Python: the reported set
    must be EXACTLY the top-N items by |n2-n1| (ties by item id), the
    counts must match a raw recompute of the midpoint split, and the
    relative change its +1-smoothed formula."""
    rows = queries()["agg_heavy_change"](spark, SF_DIR).collect()
    raw = ducks.execute(
        "SELECT CAST(json_extract_string(props, '$.k') AS INT),"
        " epoch_us(ts) FROM events"
    ).fetchall()
    ts = [t for _, t in raw]
    mid = min(ts) + (max(ts) - min(ts)) // 2
    counts = {}
    for item, t in raw:
        n1, n2 = counts.get(item, (0, 0))
        if t < mid:
            n1 += 1
        else:
            n2 += 1
        counts[item] = (n1, n2)
    ranked = sorted(
        counts.items(), key=lambda kv: (-abs(kv[1][1] - kv[1][0]), kv[0])
    )[:10]
    assert [(r.item, r.n1, r.n2) for r in rows] == [
        (i, a, b) for i, (a, b) in ranked
    ]
    for r in rows:
        assert r.delta == r.n2 - r.n1
        assert abs(r.rel_change - round((r.n2 - r.n1) / (r.n1 + 1), 6)) < 1e-9
