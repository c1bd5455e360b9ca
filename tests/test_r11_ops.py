"""Semantic pins for the round-11 operator batch (beyond the oracle
hash parity tests/test_oracle.py already enforces): each test asserts
the law the entry claims — most by full independent recomputation in
plain Python from the same fixture — so a refactor that kept hash
parity with a wrong formula on both engines would still fail."""

from __future__ import annotations

import hashlib
import math
from decimal import Decimal

from pyspark.sql import functions as F

from am_kinesis_pay_spark.registry import queries
from am_kinesis_pay_spark.tables import load

from tests.conftest import SF_DIR


def _daily_decimal(spark):
    """The shared per-(segment, day) exact DECIMAL daily revenue frame
    (the Hampel / Mann-Kendall / CCF input), recomputed in Python."""
    rows = (
        load(spark, SF_DIR, "events")
        .filter(F.col("value").isNotNull())
        .select(
            "event_type",
            F.col("ts").cast("date").alias("day"),
            F.round("value", 2).cast("decimal(18,2)").alias("v"),
        )
        .collect()
    )
    daily: dict[tuple, Decimal] = {}
    for r in rows:
        k = (r.event_type, r.day)
        daily[k] = daily.get(k, Decimal(0)) + r.v
    return daily


def test_capture_recapture_recomputes(spark):
    """Full recomputation: rebuild both capture sets from the raw
    fixture, apply Chapman's formula, and match every output column."""
    from am_kinesis_pay_spark.operators.aggregations import _CRC_SPLIT_DAY

    ev = load(spark, SF_DIR, "events").select(
        "event_type", "user_id", F.dayofmonth("ts").alias("dom")
    ).collect()
    c1: dict[str, set] = {}
    c2: dict[str, set] = {}
    for r in ev:
        (c1 if r.dom <= _CRC_SPLIT_DAY else c2).setdefault(
            r.event_type, set()
        ).add(r.user_id)
    got = {r.event_type: r for r in queries()["agg_capture_recapture"](
        spark, SF_DIR
    ).collect()}
    assert set(got) == set(c1) | set(c2)
    for et, r in got.items():
        s1, s2 = c1.get(et, set()), c2.get(et, set())
        n1, n2, m = len(s1), len(s2), len(s1 & s2)
        assert (r.n1, r.n2, r.m) == (n1, n2, m)
        assert r.n_true == len(s1 | s2)
        chapman = (n1 + 1) * (n2 + 1) / (m + 1) - 1
        assert abs(r.n_chapman - round(chapman, 2)) <= 1e-9
        assert abs(r.rel_err - round((chapman - r.n_true) / r.n_true, 6)) <= 1e-9
        assert r.var_chapman >= 0


def test_permutation_test_recomputes(spark):
    """Full recomputation: per-user DECIMAL (sum, count), the md5
    relabeling coin, all 64 permuted differences, and the add-one
    p-value — matched exactly."""
    from am_kinesis_pay_spark.operators.aggregations import _PERM_B

    ev = (
        load(spark, SF_DIR, "events")
        .filter(F.col("value").isNotNull())
        .select(
            "user_id", F.round("value", 2).cast("decimal(18,2)").alias("v")
        )
        .collect()
    )
    users: dict[int, list] = {}
    for r in ev:
        s, c = users.get(r.user_id, (Decimal(0), 0))
        users[r.user_id] = (s + r.v, c + 1)

    def diff(label):
        s0 = sum(s for u, (s, c) in users.items() if label(u) == 0)
        c0 = sum(c for u, (s, c) in users.items() if label(u) == 0)
        s1 = sum(s for u, (s, c) in users.items() if label(u) == 1)
        c1 = sum(c for u, (s, c) in users.items() if label(u) == 1)
        return float(s0) / c0 - float(s1) / c1

    d_obs = diff(lambda u: u % 2)
    coin = lambda u, b: int(
        hashlib.md5(f"{u}-{b}".encode()).hexdigest()[:4], 16
    ) % 2
    d_bs = [diff(lambda u, b=b: coin(u, b)) for b in range(_PERM_B)]
    n_extreme = sum(1 for d in d_bs if abs(d) >= abs(d_obs))
    row = queries()["agg_permutation_test"](spark, SF_DIR).collect()[0]
    assert row.n_perms == _PERM_B
    assert abs(row.obs_diff - round(d_obs, 6)) <= 1e-9
    assert row.n_extreme == n_extreme
    assert abs(
        row.p_value - round((1 + n_extreme) / (1 + _PERM_B), 6)
    ) <= 1e-9
    assert 1 / (1 + _PERM_B) <= row.p_value <= 1.0


def test_mann_kendall_recomputes(spark):
    """Full recomputation of S, the tie-corrected variance, the
    continuity-corrected Z, the trend call, and the Theil-Sen slope
    (type-1 lower median of pairwise slopes) per segment."""
    from am_kinesis_pay_spark.operators.integration import _MK_Z

    daily = _daily_decimal(spark)
    got = {r.event_type: r for r in queries()["ts_mann_kendall"](
        spark, SF_DIR
    ).collect()}
    for et in {k[0] for k in daily}:
        series = sorted(
            (d, v) for (e, d), v in daily.items() if e == et
        )
        n = len(series)
        s_stat = 0
        slopes = []
        for i in range(n):
            for j in range(i + 1, n):
                dv = series[j][1] - series[i][1]
                s_stat += (dv > 0) - (dv < 0)
                slopes.append(
                    float(dv) / (series[j][0] - series[i][0]).days
                )
        ties: dict[Decimal, int] = {}
        for _, v in series:
            ties[v] = ties.get(v, 0) + 1
        tie_term = sum(t * (t - 1) * (2 * t + 5) for t in ties.values())
        var_s = (n * (n - 1) * (2 * n + 5) - tie_term) / 18.0
        slopes.sort()
        sen = slopes[(len(slopes) + 1) // 2 - 1]
        r = got[et]
        assert (r.n_days, r.s_stat) == (n, s_stat)
        assert abs(r.var_s - round(var_s, 6)) <= 1e-9
        if var_s <= 0:
            z = 0.0
        elif s_stat > 0:
            z = (s_stat - 1) / math.sqrt(var_s)
        elif s_stat < 0:
            z = (s_stat + 1) / math.sqrt(var_s)
        else:
            z = 0.0
        assert abs(r.z - round(z, 6)) <= 1e-9
        want_trend = (
            "increasing"
            if z > float(_MK_Z)
            else "decreasing" if z < -float(_MK_Z) else "no_trend"
        )
        assert r.trend == want_trend
        assert abs(r.sen_slope - round(sen, 6)) <= 1e-9


def test_cross_correlation_recomputes(spark):
    """Full recomputation of the lagged Pearson correlation from exact
    decimal moments for every (pair, lag) row; |ccf| <= 1 and the
    lag-0 matrix is symmetric."""
    daily = _daily_decimal(spark)
    rows = queries()["ts_cross_correlation"](spark, SF_DIR).collect()
    assert rows
    by_key = {}
    for r in rows:
        assert -1.0 <= r.ccf <= 1.0
        by_key[(r.lead_type, r.lag_type, r.lag)] = r
        xs, ys = [], []
        for (e, d), v in daily.items():
            if e != r.lead_type:
                continue
            import datetime

            other = (r.lag_type, d + datetime.timedelta(days=int(r.lag)))
            if other in daily:
                xs.append(v)
                ys.append(daily[other])
        n = len(xs)
        assert n == r.n and n >= 3
        sx, sy = sum(xs), sum(ys)
        sxy = sum(x * y for x, y in zip(xs, ys))
        sxx = sum(x * x for x in xs)
        syy = sum(y * y for y in ys)
        den = (n * float(sxx) - float(sx) ** 2) * (
            n * float(syy) - float(sy) ** 2
        )
        want = (
            0.0
            if den <= 0
            else (n * float(sxy) - float(sx) * float(sy)) / math.sqrt(den)
        )
        assert abs(r.ccf - round(want, 6)) <= 1e-9
    for (a, b, lag), r in by_key.items():
        if lag == 0 and (b, a, 0) in by_key:
            assert abs(r.ccf - by_key[(b, a, 0)].ccf) <= 1e-9


def test_adamic_adar_recomputes(spark):
    """Full recomputation over the shared edges artifact: candidates
    are exactly the non-adjacent pairs with >= min common neighbors,
    and AA / RA / Jaccard match with the entry's snapping discipline."""
    from am_kinesis_pay_spark.operators.integration import (
        _AA_MIN_CN,
        _materialized_edges,
    )

    edges = {
        (r.s, r.t) for r in _materialized_edges(spark, SF_DIR).collect()
    }
    adj: dict[int, set] = {}
    for s, t in edges:
        adj.setdefault(s, set()).add(t)
        adj.setdefault(t, set()).add(s)
    want = {}
    nodes = sorted(adj)
    for i, u in enumerate(nodes):
        for w in nodes[i + 1 :]:
            if (u, w) in edges:
                continue
            common = adj[u] & adj[w]
            if len(common) < _AA_MIN_CN:
                continue
            aa = sum(
                Decimal(str(round(1.0 / math.log(len(adj[z])), 9)))
                for z in common
            )
            ra = sum(
                Decimal(str(round(1.0 / len(adj[z]), 9))) for z in common
            )
            jac = len(common) / (len(adj[u]) + len(adj[w]) - len(common))
            want[(u, w)] = (len(common), float(aa), float(ra), jac)
    rows = queries()["graph_adamic_adar"](spark, SF_DIR).collect()
    assert {(r.u, r.w) for r in rows} == set(want)
    for r in rows:
        cn, aa, ra, jac = want[(r.u, r.w)]
        assert r.common_neighbors == cn
        assert abs(r.adamic_adar - round(aa, 6)) <= 1e-9
        assert abs(r.resource_alloc - round(ra, 6)) <= 1e-9
        assert abs(r.jaccard - round(jac, 6)) <= 1e-9


def test_pr_curve_recomputes(spark):
    """Full recomputation from the classifier scores + labels: per
    observed threshold bucket, n_ge / tp / precision / recall / F1;
    recall is non-increasing in threshold."""
    from am_kinesis_pay_spark.llm.curation import _PRC_BINS, _classifier_scored

    scored = _classifier_scored(spark, SF_DIR).collect()
    bins: dict[int, list] = {}
    for r in scored:
        b = min(int(float(r.p) * _PRC_BINS), _PRC_BINS - 1)
        n, pos = bins.get(b, (0, 0))
        bins[b] = (n + 1, pos + (1 if r.lang == "en" else 0))
    total_pos = sum(p for _, p in bins.values())
    rows = sorted(
        queries()["eval_pr_curve"](spark, SF_DIR).collect(),
        key=lambda r: r.threshold,
    )
    assert len(rows) == len(bins)
    prev_recall = None
    for r in sorted(rows, key=lambda r: r.threshold):
        b = round(r.threshold * _PRC_BINS)
        n_ge = sum(n for bb, (n, _) in bins.items() if bb >= b)
        tp = sum(p for bb, (_, p) in bins.items() if bb >= b)
        assert (r.n_ge, r.tp) == (n_ge, tp)
        assert abs(r.precision_at - round(tp / n_ge, 6)) <= 1e-9
        rec = 0.0 if total_pos == 0 else tp / total_pos
        assert abs(r.recall_at - round(rec, 6)) <= 1e-9
        if tp == 0:
            assert r.f1_at == 0.0
        else:
            p_, q_ = tp / n_ge, tp / total_pos
            assert abs(r.f1_at - round(2 * p_ * q_ / (p_ + q_), 6)) <= 1e-9
        if prev_recall is not None:
            assert rec <= prev_recall + 1e-12
        prev_recall = rec


def test_cohens_kappa_recomputes(spark):
    """Kappa recomputed from eval_lang_confusion's own cells (the two
    entries share the labeler by construction): po, pe from margin
    products, kappa = (po-pe)/(1-pe)."""
    cells = queries()["eval_lang_confusion"](spark, SF_DIR).collect()
    n_total = sum(r.n for r in cells)
    n_agree = sum(r.n for r in cells if r.labeled == r.predicted)
    nl: dict[str, int] = {}
    np_: dict[str, int] = {}
    for r in cells:
        nl[r.labeled] = nl.get(r.labeled, 0) + r.n
        np_[r.predicted] = np_.get(r.predicted, 0) + r.n
    pe_prod = sum(
        nl.get(c, 0) * np_.get(c, 0) for c in set(nl) | set(np_)
    )
    po = n_agree / n_total
    pe = pe_prod / n_total / n_total
    row = queries()["eval_cohens_kappa"](spark, SF_DIR).collect()[0]
    assert (row.n_total, row.n_agree) == (n_total, n_agree)
    assert abs(row.po - round(po, 6)) <= 1e-9
    assert abs(row.pe - round(pe, 6)) <= 1e-9
    want_kappa = 0.0 if pe >= 1.0 else (po - pe) / (1.0 - pe)
    assert abs(row.kappa - round(want_kappa, 6)) <= 1e-9
    assert row.kappa <= row.po + 1e-12  # chance correction only shrinks


def test_attribution_position_credit_conserves(spark):
    """Every conversion path's credits sum to exactly 1, so total
    credit across touch types equals the number of credited paths
    (recomputed independently), and total touches match the linear
    entry's touch count (same assignment stage)."""
    ev = load(spark, SF_DIR, "events")
    from pyspark.sql import Window as W

    w_next = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.currentRow, W.unboundedFollowing)
    )
    conv = F.min(
        F.when(F.col("event_type") == "purchase", F.struct("ts", "event_id"))
    ).over(w_next)
    touches = (
        ev.select("event_id", "user_id", "ts", "event_type", conv.alias("conv"))
        .filter(
            F.col("event_type").isin("view", "click")
            & F.col("conv").isNotNull()
            & (F.col("conv.ts") <= F.col("ts") + F.expr("INTERVAL 7 DAY"))
        )
        .select("user_id", F.col("conv.event_id").alias("conv_id"))
    )
    n_paths = touches.distinct().count()
    n_touches = touches.count()
    rows = queries()["events_attribution_position"](spark, SF_DIR).collect()
    assert sum(r.n_touches for r in rows) == n_touches
    assert abs(sum(r.credit for r in rows) - n_paths) <= 1e-4 * n_paths + 1e-6


def test_scd2_incremental_equals_oneshot_and_interval_laws(spark):
    """The epoch-replayed SCD2 merge equals the one-shot build row for
    row, and the interval algebra holds per user: exactly one open
    (is_current) interval, each closed interval's valid_to is the next
    interval's valid_from, statuses alternate at every boundary."""
    got = sorted(
        map(tuple, queries()["stream_scd2_incremental"](spark, SF_DIR).collect())
    )
    want = sorted(
        map(tuple, queries()["dim_scd2_build"](spark, SF_DIR).collect())
    )
    assert got == want
    by_user: dict[int, list] = {}
    for u, status, vf, vt, cur in got:
        by_user.setdefault(u, []).append((vf, vt, status, cur))
    for u, ivs in by_user.items():
        ivs.sort()
        assert sum(1 for _, vt, _, cur in ivs if cur) == 1
        assert ivs[-1][1] is None and ivs[-1][3]
        for (vf1, vt1, s1, _), (vf2, _, s2, _) in zip(ivs, ivs[1:]):
            assert vt1 == vf2
            assert s1 != s2


def test_mcnemar_recomputes(spark):
    """Full recomputation of the paired contingency cells from the two
    deterministic labelers and the continuity-corrected chi-square."""
    from am_kinesis_pay_spark.llm.curation import _classifier_scored

    docs = {
        r.doc_id: (r.text, r.lang)
        for r in load(spark, SF_DIR, "documents").collect()
    }
    clf = {r.doc_id: float(r.p) for r in _classifier_scored(spark, SF_DIR).collect()}
    cells = {"both_ok": 0, "only_a": 0, "only_b": 0, "both_wrong": 0}
    n = 0
    for doc_id, (text, lang) in docs.items():
        if doc_id not in clf:
            continue
        toks = text.split(" ")
        en = sum(1 for t in toks if t in ("the", "a"))
        de = sum(1 for t in toks if t in ("der", "und"))
        y = lang == "en"
        a_ok = ((en >= de) and (en > 0)) == y
        b_ok = (clf[doc_id] >= 0.5) == y
        key = (
            "both_ok" if a_ok and b_ok
            else "only_a" if a_ok
            else "only_b" if b_ok
            else "both_wrong"
        )
        cells[key] += 1
        n += 1
    row = queries()["eval_mcnemar_test"](spark, SF_DIR).collect()[0]
    assert row.n == n
    for k, v in cells.items():
        assert getattr(row, k) == v
    b, c = cells["only_a"], cells["only_b"]
    chi2 = 0.0 if b + c == 0 else (abs(b - c) - 1) ** 2 / (b + c)
    assert abs(row.chi2_cc - round(chi2, 6)) <= 1e-9
    assert row.significant == (chi2 > 3.841459)


def test_best_split_recomputes_and_gain_laws(spark):
    """Full recomputation of the Gini gain curve from value-bucket
    counts; exactly one is_best row and it is the argmax (ties to the
    lowest threshold); every gain is non-negative (impurity is
    concave, so no split worsens the weighted Gini)."""
    ev = (
        load(spark, SF_DIR, "events")
        .filter(F.col("value").isNotNull())
        .select(
            F.round("value", 1).cast("decimal(18,1)").alias("x"),
            F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
        )
        .collect()
    )
    by_x: dict = {}
    for r in ev:
        cn, cp = by_x.get(r.x, (0, 0))
        by_x[r.x] = (cn + 1, cp + r.y)
    xs = sorted(by_x)
    n = sum(c for c, _ in by_x.values())
    pos = sum(p for _, p in by_x.values())

    def gini(cnt, p):
        return 1.0 - (p * p + (cnt - p) * (cnt - p)) / (cnt * cnt)

    want = {}
    nl = pl = 0
    for x in xs:
        nl += by_x[x][0]
        pl += by_x[x][1]
        if nl == n:
            break
        g = (
            gini(n, pos)
            - nl / n * gini(nl, pl)
            - (n - nl) / n * gini(n - nl, pos - pl)
        )
        want[float(x)] = (nl, n - nl, round(g, 6))
    rows = queries()["fe_best_split"](spark, SF_DIR).collect()
    assert {r.threshold for r in rows} == set(want)
    for r in rows:
        wnl, wnr, wg = want[r.threshold]
        assert (r.n_left, r.n_right) == (wnl, wnr)
        assert abs(r.gini_gain - wg) <= 1e-9
        assert r.gini_gain >= -1e-9
    best = [r for r in rows if r.is_best]
    assert len(best) == 1
    top = max(want.values(), key=lambda t: t[2])[2]
    assert best[0].gini_gain == top
    assert best[0].threshold == min(
        t for t, (_, _, g) in want.items() if g == top
    )


def test_group_kfold_recomputes_and_partitions(spark):
    """Folds partition users (no leakage by construction — asserted
    from an independent recompute), shares sum to 1, and every cell
    matches the md5 assignment recomputed in Python."""
    from am_kinesis_pay_spark.operators.maintenance import _KFOLD_K

    ev = load(spark, SF_DIR, "events").select("user_id", "event_type").collect()
    fold_of = lambda u: int(
        hashlib.md5(str(u).encode()).hexdigest()[:4], 16
    ) % _KFOLD_K
    cells: dict[int, list] = {}
    for r in ev:
        f = fold_of(r.user_id)
        n, users, pur = cells.get(f, (0, set(), 0))
        users = users | {r.user_id}
        cells[f] = (n + 1, users, pur + (r.event_type == "purchase"))
    rows = queries()["sample_group_kfold"](spark, SF_DIR).collect()
    assert {r.fold for r in rows} == set(cells)
    total = sum(n for n, _, _ in cells.values())
    assert abs(sum(r.row_share for r in rows) - 1.0) <= 1e-5
    for r in rows:
        n, users, pur = cells[r.fold]
        assert (r.n_rows, r.n_users, r.n_purchases) == (n, len(users), pur)
        assert abs(r.row_share - round(n / total, 6)) <= 1e-9
        assert abs(r.purchase_rate - round(pur / n, 6)) <= 1e-9
        assert r.no_leakage  # md5(user) is a function: one fold per user


def test_dispersion_check_recomputes(spark):
    """Moments recomputed from raw per-user counts; the dispersion
    ratio is var/mean and the flag matches the shared 1.5 literal."""
    ev = load(spark, SF_DIR, "events").select("event_type", "user_id").collect()
    counts: dict[tuple, int] = {}
    for r in ev:
        counts[(r.event_type, r.user_id)] = counts.get(
            (r.event_type, r.user_id), 0
        ) + 1
    rows = queries()["agg_dispersion_check"](spark, SF_DIR).collect()
    for r in rows:
        ks = [k for (et, _), k in counts.items() if et == r.event_type]
        n = len(ks)
        assert n == r.n_users and n >= 2
        s1, s2 = sum(ks), sum(k * k for k in ks)
        mean = s1 / n
        var = (s2 - s1 * s1 / n) / (n - 1)
        assert abs(r.mean_k - round(mean, 6)) <= 1e-9
        assert abs(r.var_k - round(var, 6)) <= 1e-9
        assert abs(r.dispersion - round(var / mean, 6)) <= 1e-9
        assert r.overdispersed == (var / mean > 1.5)
