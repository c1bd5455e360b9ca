"""Semantic pins for the round-9 operator batch (beyond the oracle
hash parity that tests/test_oracle.py already enforces): each test
asserts the STATISTICAL LAW the entry claims, so a refactor that kept
hash parity with a wrong formula on both engines would still fail."""

from __future__ import annotations

import math

from am_kinesis_pay_spark.registry import queries

from tests.conftest import SF_DIR


def test_assoc_rules_laws(spark):
    """Rules are (ia < ib) pairs; support/confidence/lift reproduce
    from the reported raw counts; min-support and top-N caps hold;
    confidence <= 1 and support <= min(supp_a, supp_b)/n."""
    from am_kinesis_pay_spark.operators.aggregations import (
        _AR_MINSUP,
        _AR_TOPN,
    )

    rows = queries()["agg_assoc_rules"](spark, SF_DIR).collect()
    assert 0 < len(rows) <= _AR_TOPN
    for r in rows:
        assert r.ia < r.ib
        assert r.supp_ab >= _AR_MINSUP
        assert r.supp_ab <= min(r.supp_a, r.supp_b)
        assert r.support == round(r.supp_ab / r.n_baskets, 6)
        assert r.confidence == round(r.supp_ab / r.supp_a, 6)
        assert r.lift == round(
            r.supp_ab * r.n_baskets / (r.supp_a * r.supp_b), 6
        )
        assert r.confidence <= 1.0
    lifts = [r.lift for r in rows]
    assert lifts == sorted(lifts, reverse=True)


def test_winsorized_mean_is_center_pulled(spark):
    """Winsorizing clamps the tails: the winsorized mean sits within
    [p10, p90], and on a right-skewed positive metric it is <= the raw
    mean (the whale-order drag the entry exists to remove)."""
    rows = queries()["agg_winsorized_stats"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.p10 <= r.p90
        assert r.p10 <= r.winsorized_mean <= r.p90
        # value is right-skewed positive in the fixture: clamping the
        # top tail moves the mean down (never up past raw)
        assert r.winsorized_mean <= r.raw_mean


def test_power_mde_formula_and_monotonicity(spark):
    """MDE reproduces from the reported moments (the closed form is
    the contract, not a black box), shrinks with n at fixed variance,
    and the sample-size column satisfies its own inversion: an
    experiment sized at n_per_arm_rel5 can detect a 5% relative lift."""
    from am_kinesis_pay_spark.operators.aggregations import (
        _PWR_REL,
        _PWR_ZSUM,
    )

    zsum, rel = float(_PWR_ZSUM), float(_PWR_REL)
    rows = queries()["agg_power_mde"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        n_arm = r.n // 2
        want = zsum * math.sqrt(2 * r.variance / n_arm)
        assert abs(r.mde_abs - want) < 2e-6, (r.event_type, want)
        assert abs(r.mde_rel - r.mde_abs / r.mean) < 2e-6
        # inversion: at the reported n_per_arm, the detectable effect
        # is <= the 5% relative target (ceil can only overshoot n)
        mde_at_sized = zsum * math.sqrt(2 * r.variance / r.n_per_arm_rel5)
        assert mde_at_sized <= rel * r.mean * (1 + 1e-9)


def test_outlier_iqr_fences_and_rate(spark):
    """Fences bracket the quartiles symmetrically at 1.5*IQR; counted
    tail mass matches the reported rate; the boxplot rule on a
    right-skewed positive metric flags only the upper tail here."""
    rows = queries()["dq_outlier_iqr"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.q1 <= r.q3
        assert abs(r.iqr - round(r.q3 - r.q1, 6)) < 1e-9
        assert abs(r.fence_lo - round(r.q1 - 1.5 * r.iqr, 6)) < 2e-6
        assert abs(r.fence_hi - round(r.q3 + 1.5 * r.iqr, 6)) < 2e-6
        assert r.outlier_rate == round((r.n_below + r.n_above) / r.n, 6)
        assert r.outlier_rate < 0.25  # fences beyond quartiles by law
        # fixture values are positive with a long right tail
        assert r.n_below == 0 and r.n_above > 0


def test_stickiness_bounds_and_monotone_window(spark):
    """DAU <= MAU by construction (a day's actives are inside its own
    trailing window), stickiness in (0, 1], and MAU is monotone
    non-decreasing across the first window span (the trailing set
    only gains days until the window saturates)."""
    rows = sorted(
        queries()["events_stickiness_dau_mau"](spark, SF_DIR).collect(),
        key=lambda r: r.day,
    )
    assert rows
    for r in rows:
        assert 0 < r.dau <= r.mau
        assert r.stickiness == round(r.dau / r.mau, 6)
        assert 0 < r.stickiness <= 1.0
    from am_kinesis_pay_spark.operators.integration import _STICK_WINDOW

    head = [r.mau for r in rows[: min(_STICK_WINDOW, len(rows))]]
    assert head == sorted(head)


def test_centroid_outliers_exactness_and_flags(spark):
    """z reproduces from the reported per-label moments; the flag is
    the unrounded z > 2 predicate; the label mean equals the mean of
    the reported (6-dp exact) distances."""
    rows = queries()["emb_centroid_outliers"](spark, SF_DIR).collect()
    assert rows
    by_label: dict[int, list] = {}
    for r in rows:
        by_label.setdefault(r.label, []).append(r)
    flagged = 0
    for label, rs in by_label.items():
        assert len(rs) == rs[0].n_label
        mean = sum(r.dist2 for r in rs) / len(rs)
        assert abs(mean - rs[0].label_mean_dist2) < 1e-6, label
        var = sum((r.dist2 - mean) ** 2 for r in rs) / (len(rs) - 1)
        for r in rs:
            z = (r.dist2 - mean) / math.sqrt(var)
            assert abs(r.z - round(z, 6)) < 1e-4, (r.vec_id, z)
            if abs(z - 2.0) > 1e-5:
                assert r.is_outlier == (z > 2.0), r.vec_id
        flagged += sum(1 for r in rs if r.is_outlier)
    assert flagged > 0  # the tail exists on the fixture


def test_cohort_ltv_monotone_and_conserving(spark):
    """Cumulative LTV is non-decreasing within a cohort, and the final
    cumulative value equals the cohort's total weekly revenue divided
    by its size — conservation across the window."""
    rows = queries()["events_cohort_ltv"](spark, SF_DIR).collect()
    assert rows
    by_c: dict = {}
    for r in rows:
        by_c.setdefault(r.cohort_day, []).append(r)
    for day, rs in by_c.items():
        rs.sort(key=lambda r: r.age_w)
        ltvs = [r.cum_ltv_per_user for r in rs]
        assert ltvs == sorted(ltvs), day  # revenue is non-negative
        total = sum(r.week_revenue for r in rs)
        assert abs(ltvs[-1] - total / rs[0].n_users) < 1e-4, day


def test_weighted_gumbel_sample_laws(spark):
    """Exactly K rows ranked by descending key; keys reproduce from
    the md5-seeded uniform (Efraimidis-Spirakis ln(u)/w); the sample
    is genuinely weight-biased: its mean n_chars exceeds the corpus
    mean."""
    import hashlib

    from am_kinesis_pay_spark.llm.curation import _GUM_K
    from am_kinesis_pay_spark.tables import load

    rows = sorted(
        queries()["sample_weighted_gumbel"](spark, SF_DIR).collect(),
        key=lambda r: r.rnk,
    )
    assert len(rows) == _GUM_K
    assert [r.rnk for r in rows] == list(range(1, _GUM_K + 1))
    keys = [r.es_key for r in rows]
    assert keys == sorted(keys, reverse=True)
    for r in rows[:5]:
        u = int(
            hashlib.md5(str(r.doc_id).encode()).hexdigest()[:12], 16
        ) / float(1 << 48)
        assert abs(r.es_key - round(math.log(u) / r.n_chars, 12)) < 1e-11
    corpus = load(spark, SF_DIR, "documents").filter("n_chars > 0")
    corpus_mean = corpus.agg({"n_chars": "avg"}).collect()[0][0]
    sample_mean = sum(r.n_chars for r in rows) / len(rows)
    assert sample_mean > corpus_mean


def test_bitwise_ops_match_python(spark):
    """Every bitwise column reproduces from Python's operators on the
    raw keys — popcount grouping, masks, xor, shifts all bit-exact."""
    from am_kinesis_pay_spark.tables import load

    li = load(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"
    ).collect()
    want: dict[int, list] = {}
    for r in li:
        pop = bin(r.l_orderkey).count("1")
        want.setdefault(pop, []).append(
            (
                r.l_orderkey & 255,
                (r.l_partkey ^ r.l_suppkey) & 1023,
                (r.l_linenumber << 4) | ((r.l_orderkey >> 8) & 15),
            )
        )
    rows = queries()["fn_bitwise_ops"](spark, SF_DIR).collect()
    assert {r.pop for r in rows} == set(want)
    for r in rows:
        grp = want[r.pop]
        assert r.n == len(grp)
        assert r.sum_masked == sum(g[0] for g in grp)
        assert r.min_xor == min(g[1] for g in grp)
        assert r.max_xor == max(g[1] for g in grp)
        assert r.sum_packed == sum(g[2] for g in grp)


def test_inter_arrival_quantile_laws(spark):
    """Order statistics are consistent (min <= median <= p90 <= max),
    the sub-minute fraction is a proper fraction, and the exact mean
    sits inside [min, max+1) minutes."""
    rows = queries()["events_inter_arrival"](spark, SF_DIR).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.n_gaps > 0
    assert r.min_gap_min <= r.median_gap_min <= r.p90_gap_min <= r.max_gap_min
    assert 0.0 <= r.frac_under_1min <= 1.0
    assert r.min_gap_min <= r.mean_gap_min <= r.max_gap_min + 1


def test_text_lines_roundtrip_profile(spark):
    """The line-format profile equals the parquet truth computed
    directly (the round trip loses nothing the entry claims to keep)."""
    from pyspark.sql import functions as F

    from am_kinesis_pay_spark.tables import load

    got = {
        (r.lang, r.source): (r.n_docs, r.total_chars, r.n_distinct_texts)
        for r in queries()["source_text_lines"](spark, SF_DIR).collect()
    }
    want = {
        (r.lang, r.source): (r.n_docs, r.total_chars, r.n_distinct_texts)
        for r in load(spark, SF_DIR, "documents")
        .groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
            F.countDistinct(F.md5("text")).cast("bigint").alias(
                "n_distinct_texts"
            ),
        )
        .collect()
    }
    assert got == want


def test_srm_chi2_law(spark):
    """chi2 reproduces from the arm counts, the flag is the df=1
    alpha=.05 decision, and the balanced md5-free user%2 split on the
    fixture is NOT flagged (a guard that fires on clean assignment is
    worse than none)."""
    from am_kinesis_pay_spark.operators.aggregations import _SRM_CRIT

    rows = queries()["agg_ab_srm_check"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        e = (r.n_a + r.n_b) / 2.0
        chi2 = (r.n_a - e) ** 2 / e + (r.n_b - e) ** 2 / e
        assert abs(r.chi2 - round(chi2, 6)) < 1e-9
        assert r.srm_flag == (chi2 > float(_SRM_CRIT))
        assert abs(r.frac_a - round(r.n_a / (r.n_a + r.n_b), 6)) < 1e-9
        assert not r.srm_flag  # fixture split is by-construction fair


def test_lang_confusion_margins(spark):
    """Cells partition the corpus (shares sum to 1), each label's
    recall column sums to 1 across its row, each prediction's
    precision column sums to 1 down its column, and the matrix agrees
    with text_lang_id's per-doc predictions."""
    rows = queries()["eval_lang_confusion"](spark, SF_DIR).collect()
    assert rows
    total_share = sum(r.cell_share for r in rows)
    assert abs(total_share - 1.0) < 1e-3
    by_label: dict = {}
    by_pred: dict = {}
    for r in rows:
        by_label.setdefault(r.labeled, []).append(r)
        by_pred.setdefault(r.predicted, []).append(r)
    for rs in by_label.values():
        assert abs(sum(r.recall_of_labeled for r in rs) - 1.0) < 1e-3
    for rs in by_pred.values():
        assert abs(sum(r.precision_of_predicted for r in rs) - 1.0) < 1e-3
    want: dict = {}
    for p in queries()["text_lang_id"](spark, SF_DIR).collect():
        key = (p.labeled_lang, p.predicted_lang)
        want[key] = want.get(key, 0) + 1
    got = {(r.labeled, r.predicted): r.n for r in rows}
    assert got == want
