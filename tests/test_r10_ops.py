"""Semantic pins for the round-10 operator batch (beyond the oracle
hash parity tests/test_oracle.py already enforces): each test asserts
the law the entry claims — several by full independent recomputation
in plain Python from the same fixture — so a refactor that kept hash
parity with a wrong formula on both engines would still fail."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from am_kinesis_pay_spark.registry import queries
from am_kinesis_pay_spark.tables import load

from tests.conftest import SF_DIR


def test_diff_in_diff_identity_and_flag(spark):
    """DiD is exactly (treat post-pre) - (control post-pre); z = did/se;
    the significance flag is |z| > the shared critical literal."""
    from am_kinesis_pay_spark.operators.aggregations import _DID_ZCRIT

    rows = queries()["agg_diff_in_diff"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.se > 0
        assert abs(r.did - round(r.delta_treat - r.delta_control, 6)) <= 2e-6
        assert abs(r.z - r.did / r.se) < 2e-5
        assert r.significant == (abs(r.did / r.se) > float(_DID_ZCRIT))


def test_jackknife_reproduces_from_block_moments(spark):
    """Full recomputation: rebuild the block (count, sum) moments from
    the raw fixture, apply the leave-one-out formula with the entry's
    exact snapping discipline, and match theta_bar and se to 6 dp."""
    from decimal import Decimal

    from am_kinesis_pay_spark.operators.aggregations import _JK_BUCKETS

    ev = (
        load(spark, SF_DIR, "events")
        .filter(F.col("value").isNotNull())
        .select(
            "event_type",
            (F.col("user_id") % _JK_BUCKETS).alias("j"),
            F.round("value", 2).cast("decimal(18,2)").alias("v"),
        )
        .collect()
    )
    blocks: dict[tuple, list] = {}
    for r in ev:
        key = (r.event_type, r.j)
        n, s = blocks.get(key, (0, Decimal(0)))
        blocks[key] = (n + 1, s + r.v)
    want = {}
    for et in {k[0] for k in blocks}:
        bs = [(n, s) for (e, _), (n, s) in blocks.items() if e == et]
        n_tot = sum(n for n, _ in bs)
        s_tot = sum(s for _, s in bs)
        thetas = [
            round(float(s_tot - s) / (n_tot - n), 12)
            for n, s in bs
            if n_tot - n > 0
        ]
        jn = len(thetas)
        bar = sum(Decimal(str(t)) for t in thetas) / jn  # DECIMAL sum
        barf = float(bar)
        sd2 = sum(
            Decimal(str(round((t - barf) * (t - barf), 18))) for t in thetas
        )
        want[et] = (
            round(barf, 6),
            round(math.sqrt((jn - 1) / jn * float(sd2)), 6),
            jn,
        )
    rows = queries()["agg_jackknife_variance"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        wb, ws, wj = want[r.event_type]
        assert r.n_blocks == wj
        assert abs(r.theta_bar - wb) <= 1e-6, r.event_type
        assert abs(r.se_jackknife - ws) <= 1e-6, r.event_type


def test_hampel_recomputes_rolling_median_mad(spark):
    """Full recomputation of the trailing-7 type-1 rolling median/MAD
    per series, plus the replacement rule: despiked == rolling median
    exactly when flagged, == the observation otherwise."""
    from decimal import Decimal

    from am_kinesis_pay_spark.operators.windows import _HAMPEL_K

    rows = queries()["win_hampel_filter"](spark, SF_DIR).collect()
    assert rows
    series: dict[str, list] = {}
    for r in sorted(rows, key=lambda r: (r.event_type, r.day)):
        series.setdefault(r.event_type, []).append(r)
    for et, rs in series.items():
        window: list[Decimal] = []
        for r in rs:
            window.append(Decimal(str(r.v)))
            frame = window[-7:]
            k = (len(frame) + 1) // 2
            med = sorted(frame)[k - 1]
            mad = sorted(abs(x - med) for x in frame)[k - 1]
            assert r.n_window == len(frame)
            assert float(med) == r.rolling_med, (et, r.day)
            assert float(mad) == r.rolling_mad, (et, r.day)
            spike = abs(float(Decimal(str(r.v)) - med)) > float(
                _HAMPEL_K
            ) * float(mad)
            assert r.is_spike == spike, (et, r.day)
            assert r.despiked == (float(med) if spike else r.v)


def test_locf_carries_last_observation_exactly(spark):
    """The grid is dense (|days| x |segments|); filled is NULL only
    before a segment's first observation; observed rows pass through;
    gap rows carry the most recent prior observation; is_carried marks
    exactly the synthetic rows."""
    rows = queries()["win_locf_backfill"](spark, SF_DIR).collect()
    assert rows
    days = {r.day for r in rows}
    types = {r.event_type for r in rows}
    assert len(rows) == len(days) * len(types)
    # the sparsified panel must contain genuine gaps for the test to bite
    assert any(r.obs is None for r in rows)
    series: dict[str, list] = {}
    for r in sorted(rows, key=lambda r: (r.event_type, r.day)):
        series.setdefault(r.event_type, []).append(r)
    for et, rs in series.items():
        last = None
        for r in rs:
            if r.obs is not None:
                last = r.obs
                assert r.filled == r.obs
                assert not r.is_carried
            else:
                assert r.filled == last, (et, r.day)
                assert r.is_carried == (last is not None)


def test_vocab_coverage_recomputes_and_is_monotone(spark):
    """Coverage checkpoints recompute exactly from the whitespace
    token counts; the curve is monotone nondecreasing in k and hits
    1.0 once k >= vocab_size."""
    docs = load(spark, SF_DIR, "documents").select("text").collect()
    from collections import Counter

    freqs = Counter()
    for r in docs:
        freqs.update(w for w in r.text.split(" ") if w != "")
    ranked = sorted(freqs.items(), key=lambda kv: (-kv[1], kv[0]))
    total = sum(freqs.values())

    def cov(k):
        return round(sum(f for _, f in ranked[:k]) / total, 6)

    row = queries()["text_vocab_coverage"](spark, SF_DIR).collect()[0]
    assert row.vocab_size == len(ranked)
    assert row.total_tokens == total
    assert row.cov_at_10 == cov(10)
    assert row.cov_at_100 == cov(100)
    assert row.cov_at_1000 == cov(1000)
    assert row.cov_at_10000 == cov(10000)
    assert (
        row.cov_at_10
        <= row.cov_at_100
        <= row.cov_at_1000
        <= row.cov_at_10000
        <= 1.0
    )
    if row.vocab_size <= 10000:
        assert row.cov_at_10000 == 1.0


def test_forecast_backtest_skill_identity_and_ols(spark):
    """skill == 1 - mae/mae_naive; OLS coefficients recompute from the
    train-slice daily sums (exact integer/DECIMAL moments); MAE
    recomputes from the test slice with the same 6-dp snapping."""
    from decimal import Decimal

    from am_kinesis_pay_spark.operators.integration import _FB_TRAIN_DAYS

    ev = (
        load(spark, SF_DIR, "events")
        .filter(F.col("value").isNotNull())
        .select("event_type", F.to_date("ts").alias("day"), "value")
        .collect()
    )
    d0 = min(r.day for r in ev)
    daily: dict[tuple, Decimal] = {}
    for r in ev:
        t = (r.day - d0).days
        key = (r.event_type, t)
        daily[key] = daily.get(key, Decimal(0)) + Decimal(
            str(round(r.value, 2))
        )
    rows = queries()["eval_forecast_backtest"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        train = sorted(
            (t, v) for (e, t), v in daily.items()
            if e == r.event_type and t < _FB_TRAIN_DAYS
        )
        test = sorted(
            (t, v) for (e, t), v in daily.items()
            if e == r.event_type and t >= _FB_TRAIN_DAYS
        )
        n = len(train)
        sx = sum(t for t, _ in train)
        sy = sum(v for _, v in train)
        sxy = sum(t * v for t, v in train)
        sxx = sum(t * t for t, _ in train)
        slope = float(n * sxy - sx * sy) / float(n * sxx - sx * sx)
        intercept = (float(sy) - slope * sx) / n
        y_last = max(train)[1]
        assert r.n_train == n and r.n_test == len(test)
        assert abs(r.slope - round(slope, 6)) <= 1e-6
        assert abs(r.intercept - round(intercept, 6)) <= 1e-6
        mae = float(
            sum(
                Decimal(
                    str(round(abs(float(v) - (intercept + slope * t)), 6))
                )
                for t, v in test
            )
        ) / len(test)
        mae_n = float(
            sum(
                Decimal(str(round(abs(float(v) - float(y_last)), 6)))
                for t, v in test
            )
        ) / len(test)
        assert abs(r.mae - round(mae, 6)) <= 1e-6
        assert abs(r.mae_naive - round(mae_n, 6)) <= 1e-6
        assert abs(r.skill - round(1 - mae / mae_n, 6)) <= 2e-6


def test_minhash_recall_truth_recomputes(spark):
    """The recall audit's ground truth recomputes exactly in Python
    from raw texts (rep collapse, 3-token shingles, exact Jaccard at
    the pipeline threshold, md5-ordered anchor pool), and the reported
    hits are a subset of the pipeline's own verified pair set."""
    import hashlib

    from am_kinesis_pay_spark.llm.dedup import _EVMR_K, _rep_pairs

    docs = load(spark, SF_DIR, "documents").select("doc_id", "text").collect()
    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()  # noqa: E731
    groups: dict[str, int] = {}
    texts: dict[int, str] = {}
    for r in docs:
        k = md5(r.text)
        if k not in groups or r.doc_id < groups[k]:
            groups[k] = r.doc_id
        texts[r.doc_id] = r.text

    def shingles(text):
        t = text.split(" ")
        if len(t) < 3:
            return set()
        return {" ".join(t[i : i + 3]) for i in range(len(t) - 2)}

    reps = {rid: shingles(texts[rid]) for rid in groups.values()}
    reps = {rid: s for rid, s in reps.items() if s}  # shingled reps only
    anchors = sorted(reps, key=lambda d: (md5(str(d)), d))[:_EVMR_K]
    truth = {}
    for a in anchors:
        sa = reps[a]
        near = set()
        for b, sb in reps.items():
            if b == a:
                continue
            inter = len(sa & sb)
            if inter and inter / (len(sa) + len(sb) - inter) >= 0.5:
                near.add(b)
        if near:
            truth[a] = near
    rows = queries()["eval_minhash_recall"](spark, SF_DIR).collect()
    assert {r.anchor_id for r in rows} == set(truth)
    pipeline_pairs = {
        (r.rep_a, r.rep_b) for r in _rep_pairs(spark, SF_DIR).collect()
    }
    total_true = sum(len(v) for v in truth.values())
    total_found = 0
    for r in rows:
        assert r.n_true == len(truth[r.anchor_id])
        found = sum(
            1
            for b in truth[r.anchor_id]
            if (min(r.anchor_id, b), max(r.anchor_id, b)) in pipeline_pairs
        )
        assert r.n_found == found
        assert 0 <= r.n_found <= r.n_true
        assert r.recall == round(r.n_found / r.n_true, 6)
        total_found += found
    for r in rows:
        assert r.overall_recall == round(total_found / total_true, 6)


def test_ann_ndcg_recomputes_from_both_rankings(spark):
    """nDCG/MRR/recall recompute exactly in Python from the two
    rankings the eval composes (exact top-k and the LSH top-k), with
    the entry's 9-dp term snapping."""
    from decimal import Decimal

    from am_kinesis_pay_spark.llm.similarity import TOP_K

    exact = {}
    for r in queries()["vec_cosine_topk"](spark, SF_DIR).collect():
        exact.setdefault(r.query_id, {})[r.neighbor_id] = r.rank
    lsh = {}
    for r in queries()["vec_ann_lsh"](spark, SF_DIR).collect():
        lsh.setdefault(r.query_id, {})[r.neighbor_id] = r.rank
    rows = queries()["eval_ann_ndcg"](spark, SF_DIR).collect()
    assert {r.query_id for r in rows} == set(exact)
    for r in rows:
        gains = {
            n: TOP_K + 1 - rk for n, rk in exact[r.query_id].items()
        }
        served = lsh.get(r.query_id, {})
        hits = sum(1 for n in served if n in gains)
        assert r.n_hits == hits
        assert r.recall_at_k == round(hits / TOP_K, 6)
        dcg = sum(
            Decimal(
                str(
                    round(
                        gains.get(n, 0)
                        / (math.log(1 + rk) / math.log(2)),
                        9,
                    )
                )
            )
            for n, rk in served.items()
        )
        idcg = sum(
            Decimal(
                str(round(g / (math.log(1 + rk) / math.log(2)), 9))
            )
            for n, rk in exact[r.query_id].items()
            for g in [TOP_K + 1 - rk]
        )
        assert r.ndcg_at_k == round(float(dcg) / float(idcg), 6)
        best = next(
            n for n, rk in exact[r.query_id].items() if rk == 1
        )
        want_mrr = round(1.0 / served[best], 6) if best in served else 0.0
        assert r.mrr == want_mrr
        assert 0.0 <= r.ndcg_at_k <= 1.0


def test_calibration_ece_recomputes(spark):
    """ECE/MCE recompute exactly in Python from the classifier's own
    scores (the already-oracle-checked quality_prob) and the lang
    labels, with the entry's bin/snap discipline."""
    from decimal import Decimal

    from am_kinesis_pay_spark.llm.curation import _ECE_BINS

    probs = {
        r.doc_id: r.quality_prob
        for r in queries()["text_classifier_score"](spark, SF_DIR).collect()
    }
    langs = {
        r.doc_id: r.lang
        for r in load(spark, SF_DIR, "documents")
        .select("doc_id", "lang")
        .collect()
    }
    bins: dict[int, list] = {}
    for d, p in probs.items():
        b = min(int(p * _ECE_BINS), _ECE_BINS - 1)
        bins.setdefault(b, []).append((Decimal(str(p)), langs[d] == "en"))
    n_total = sum(len(v) for v in bins.values())
    per = {}
    for b, vals in bins.items():
        n = len(vals)
        conf = float(sum(p for p, _ in vals)) / n
        acc = sum(1 for _, y in vals if y) / n
        per[b] = (n, conf, acc)
    ece = float(
        sum(
            Decimal(str(round(n * abs(acc - conf) / n_total, 9)))
            for n, conf, acc in per.values()
        )
    )
    mce = max(abs(acc - conf) for _, conf, acc in per.values())
    rows = queries()["eval_calibration_ece"](spark, SF_DIR).collect()
    assert {r.bin for r in rows} == set(per)
    for r in rows:
        n, conf, acc = per[r.bin]
        assert r.n == n
        assert r.mean_confidence == round(conf, 6)
        assert r.observed_rate == round(acc, 6)
        assert r.gap == round(abs(acc - conf), 6)
        assert r.ece == round(ece, 6)
        assert r.mce == round(mce, 6)


def test_tost_equivalence_laws(spark):
    """z_lower/z_upper reproduce from the reported diff/margin/se; the
    equivalent flag is exactly (z_lower > z) AND (z_upper < -z); and
    TOST is consistent: equivalence implies |diff| < margin."""
    from am_kinesis_pay_spark.operators.aggregations import _TOST_Z1

    z1 = float(_TOST_Z1)
    rows = queries()["agg_tost_equivalence"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.se > 0 and r.margin > 0
        assert abs(r.z_lower - round((r.diff + r.margin) / r.se, 6)) <= 2e-5
        assert abs(r.z_upper - round((r.diff - r.margin) / r.se, 6)) <= 2e-5
        want = ((r.diff + r.margin) / r.se > z1) and (
            (r.diff - r.margin) / r.se < -z1
        )
        assert r.equivalent == want
        if r.equivalent:
            assert abs(r.diff) < r.margin
