"""Engine-wide plan hygiene sweep over every registered query:

1. NO query may plan a CartesianProduct.
2. BroadcastNestedLoopJoin only where a deliberately tiny broadcast
   side makes it the right plan (scalar subquery results, the ≤10-row
   ANN query set) — allowlisted with justifications.
3. NO query may plan an UNPARTITIONED Window over a row-scale frame
   (VERDICT r6: a global Window sort serializes into one task at
   100 TB — the class that let agg_mann_whitney/agg_ks_test ship with
   single-task global rank windows). Every Window whose partitionSpec
   is empty must sit above a PROVABLY REDUCED frame and be allowlisted
   with the proof.

These are the properties that decide whether a query survives a 100×
scale-up, enforced for the WHOLE surface instead of per-query spot
checks."""

from __future__ import annotations

import pytest

from am_kinesis_pay_spark.registry import queries

from tests.conftest import SF_DIR

# Each entry's NLJ side is O(1) rows by construction:
#   scalar aggregates cross-joined back (corpus size, global totals),
#   the ≤10-row ANN query set joined with a != predicate, or the
#   gapfill date spine.
_NLJ_ALLOWED = {
    "agg_anova_oneway",  # 1-row grand-total broadcast onto the k-group frame
    "agg_bootstrap_ci",  # 1-row full-mean broadcast onto the 1-row CI frame
    "agg_sprt_sequential",  # 1-row stop-day broadcast onto the day frame
    "agg_heavy_change",  # 1-row midpoint broadcast onto the fact scan
    "agg_assoc_rules",  # 1-row n_baskets broadcast onto the <=C(20,2)-row rule frame
    "agg_mutual_information",  # 1-row corpus-total broadcast onto the <=35-cell frame
    "agg_raking_ipf",  # 1-row dims/audit broadcasts onto the <=35-cell frame
    "agg_theta_setops",  # 1-row est/common/exact aggregate frames combined
    "agg_benjamini_hochberg",  # 1-row grand-total broadcast onto 20 buckets
    "agg_chi_square",  # 1-row (r, c) dims broadcast onto the 1-row chi2
    "agg_cuped_adjusted",  # 1-row global-theta broadcast
    "agg_decile_lift",  # 1-row totals broadcast onto the 10-row frame
    "agg_histogram_equidepth",
    "agg_ks_test",  # 1-row (n1, n2) totals broadcast onto the ECDF frame
    "agg_skew_profile",
    "emb_kmeans",
    "emb_triplet_mine",  # ≤10-row anchor set joined with a != predicate
    "dq_benford",  # 1-row digit-total broadcast onto the 9-row frame
    "dq_freshness",  # 1-row watermark broadcast onto the |event_types| frame
    "dq_psi_drift",  # 1-row span + totals broadcasts onto the ≤20-bucket frame
    "fe_woe_iv",  # 1-row goods/bads totals + 1-row IV broadcasts onto 5 segments
    "sample_neyman",  # 1-row weight-total broadcast onto the 5-strata frame
    "sample_token_budget",  # 1-row corpus-token-total broadcast onto ~20 sources
    "sample_upsample_repeat",  # 1-row target-tokens broadcast onto ~20 sources
    "er_lsh_blocking",  # 1-row corpus-count broadcast (gram-DF threshold)
    "events_funnel_ordered",
    "events_gapfill_daily",
    "eval_calibration_ece",  # 1-row n_total broadcast onto the 10-bin reliability frame
    "eval_forecast_backtest",  # 1-row global min-date broadcast (day-offset origin)
    "win_locf_backfill",  # calendar x |segments| grid: both sides broadcast-bounded (1-row bounds -> sequence spine, distinct event types)
    "stream_locf_incremental",  # same _locf_densify grid as win_locf_backfill (shared helper)
    "agg_permutation_test",  # 1-row observed-diff broadcast onto the 64-row permutation frame
    "eval_cohens_kappa",  # 1-row margin-product broadcast onto the 1-row totals frame
    "stream_scd2_incremental",  # 1-row max-event-id broadcast (epoch tertile split)
    "sample_group_kfold",  # 1-row leakage-audit broadcast onto the 5-fold frame
    "events_rfm_segments",  # 1-row corpus-max-date + 1-row n broadcasts
    "events_rolling_active_users",  # 1-row min-day broadcast (warm-up trim)
    "fe_target_encoding",  # 1-row global-prior broadcast
    "events_survival_km",  # 1-row horizon-max-ts broadcast
    "text_collocations_pmi",  # 1-row corpus-token-total broadcast
    "graph_pagerank",
    "pipeline_dsir_selection",  # 1-row corpus-total broadcast onto the <=1024-bucket ratio frame
    "pipeline_retrieval_corpus",
    "q_dormant_balances",
    "sample_balanced_classes",
    "sample_importance",
    "sink_bloom_skip_index",  # ≤3-row probe set, non-equi zone-map check
    "sink_zorder_layout",  # 1-row bounds + 1-row n_total broadcasts
    "text_bigram_nll",  # 1-row corpus-token-total broadcast
    "text_kneser_ney",  # 1-row bigram-type-total broadcast
    "text_ccnet_buckets",  # 1-row corpus-token-total broadcast
    "text_bm25_topk",  # 1-row corpus-stats (N, avgdl, df) broadcast
    "text_source_divergence",  # sources × DISTINCT-vocab scoring grid — the cross product IS the semantics, both sides broadcast-sized at any corpus scale
    "text_tfidf_topterms",
    "text_unigram_nll",
    "vec_ann_nsw",  # 1-row entry-node broadcast onto the 10-row query set
    "vec_ann_pq",  # r9 recall audit: ≤10-row exact ground-truth query set joined with a != predicate
    "vec_ann_ivf_pq",  # r9 recall audit: same ≤10-row query-set != join
    "vec_cosine_topk",
    "eval_ann_ndcg",  # composes vec_cosine_topk's ≤10-row query-set != join (same bound)
    "vec_matryoshka_recall",
    "vec_knn_label",
}

# Unpartitioned-Window allowlist: every entry names the REDUCED frame
# the window runs over (the proof it is not a row-scale global sort).
# Frames are reduced by a hash aggregation BELOW the window; their
# cardinality is a DOMAIN size (days, buckets, distinct values, vocab,
# languages, ≤K survivors of a limit), which saturates while row count
# grows — the win_global_running_total / agg_decile_lift pattern.
_GLOBAL_WINDOW_ALLOWED = {
    "agg_benjamini_hochberg": "20-row hypothesis frame (bucket count = hypothesis count by construction)",
    "agg_chi_square": "contingency frame: |event_types| x 7 weekday cells",
    "agg_decile_lift": "decile/bucket prefix frames (<= ~100 buckets)",
    "agg_ks_test": "distinct-value frame (2-dp money domain; 13k @ 40k rows, saturating)",
    "agg_mann_whitney": "distinct-value frame (2-dp money domain, saturating)",
    "agg_model_auc": "score-bucket prefix frame (fixed bucket count)",
    "agg_sprt_sequential": "per-day cumulative frame (calendar domain)",
    "er_sorted_neighborhood": "key-prefix bucket-count prefix frames (2x)",
    "events_anomaly_rate_spike": "per-day frame (calendar domain)",
    "eval_lang_confusion": "|langs| x 3 confusion-cell frame (label/prediction domains, saturating)",
    "eval_calibration_ece": "<= 10-row reliability-bin frame (fixed bin count)",
    "eval_pr_curve": "<= 20-row score-histogram frame (fixed threshold grid)",
    "fe_best_split": "distinct-value frame (1-dp money domain, saturating) — prefix + total + rank windows",
    "sample_group_kfold": "5-row fold frame (fixed fold count) — row-share total window",
    "eval_minhash_recall": "<=64-row per-anchor recall frame (anchors are a TakeOrderedAndProject limit)",
    "events_inter_arrival": "minute-gap distinct frame (bounded by the calendar span in minutes, saturating)",
    "events_path_analysis": "distinct 3-step path frame (|event_types|^3)",
    "events_concurrency_curve": "day-offset prefix frame (calendar domain, the win_global_running_total two-pass)",
    "events_rfm_segments": "3x per-axis bucket-count prefix frames (value-domain buckets, not users)",
    "events_survival_km": "distinct event-time (day) frames",
    "fe_quantile_binning": "distinct-value frame (2-dp money domain, saturating) — prefix + total windows",
    "sample_shard_shuffle": "shard-bucket-count prefix frame (fixed shard count)",
    "sample_temperature": "per-language frame (|langs| rows)",
    "sink_zorder_layout": "file-bucket-count prefix frame (fixed file count)",
    "sample_weighted_gumbel": "<=50-row frame after orderBy().limit(50) (TakeOrderedAndProject)",
    "text_bm25_topk": "<=10-row frame after orderBy().limit(10) (TakeOrderedAndProject)",
    "text_bpe_encode": "merge-table vocab frame (bounded merge count)",
    "text_collocations_pmi": "<=20-row frame after orderBy().limit(20)",
    "text_vocab_coverage": "distinct-vocab frequency frame (the text_zipf_fit rank)",
    "text_zipf_fit": "distinct-vocab frequency frame",
    "ts_changepoint_binseg": "per-day frame (calendar domain) — seq/prefix/total/rank windows",
    "win_global_running_total": "per-day totals prefix frame (the two-pass pattern itself)",
}


def _count_global_windows(df) -> int:
    """Walk the optimized logical plan (children + subquery plans) and
    count Window nodes with an EMPTY partitionSpec — each one is a
    single-task sort of its input frame at execution time."""
    found = 0
    stack = [df._jdf.queryExecution().optimizedPlan()]
    while stack:
        node = stack.pop()
        if (
            node.getClass().getSimpleName() == "Window"
            and node.partitionSpec().isEmpty()
        ):
            found += 1
        children = node.children()
        for i in range(children.length()):
            stack.append(children.apply(i))
        try:
            subs = node.subqueries()
            for i in range(subs.length()):
                stack.append(subs.apply(i))
        except Exception:
            pass  # node kinds without subquery support
    return found


@pytest.mark.parametrize("name", sorted(queries().keys()))
def test_plan_hygiene(spark, name):
    df = queries()[name](spark, SF_DIR)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "CartesianProduct" not in plan, f"{name} plans a cartesian product"
    if name not in _NLJ_ALLOWED:
        assert "BroadcastNestedLoopJoin" not in plan, (
            f"{name} plans an unexpected nested-loop join"
        )
    n_global = _count_global_windows(df)
    if name not in _GLOBAL_WINDOW_ALLOWED:
        assert n_global == 0, (
            f"{name} plans {n_global} unpartitioned Window(s) — a global "
            "single-task sort at scale; reduce the frame first (distinct-"
            "value / bucket prefix / orderBy().limit()) and allowlist with "
            "the proof"
        )


# ---------------------------------------------------------------------------
# Runtime (post-AQE, executed) shape for the ITERATIVE allowlist —
# VERDICT r8 #2: these queries' static plans overstate shuffles by an
# Exchange per unrolled convergence round, so the static sweep above
# cannot see a real shuffle-storm regression in them. Each is executed
# once at sf0.001 and its final AdaptiveSparkPlan tree is parsed with
# the SAME parser tools/plan_stats.py uses for PLANSTATS.md's runtime
# column. Bounds are the measured executed counts + slack for AQE
# variation; a loop that stops localCheckpointing would blow through
# them immediately (agg_raking_ipf: 143 static vs 12 executed).
_ITERATIVE_RUNTIME_MAX_EX = {
    "agg_raking_ipf": 16,  # measured 12 (+32 ReusedExchange)
    "graph_pagerank": 4,  # measured 0 (rounds checkpoint-truncated)
    "graph_kcore": 6,  # measured 3
    "graph_cc_pointer_doubling": 3,  # measured 0
    "emb_kmeans": 8,  # measured 5
    "text_dedup_clusters": 3,  # measured 0
    "text_classifier_train": 3,  # measured 0
}


@pytest.mark.parametrize("name", sorted(_ITERATIVE_RUNTIME_MAX_EX))
def test_iterative_runtime_plan_shape(spark, name):
    from tools.plan_stats import plan_string, runtime_ops

    df = queries()[name](spark, SF_DIR)
    rops = runtime_ops(df)  # executes once, parses the final plan
    final = plan_string(df)
    assert "CartesianProduct" not in final, (
        f"{name}: executed plan contains a cartesian product"
    )
    bound = _ITERATIVE_RUNTIME_MAX_EX[name]
    assert rops["Exchange"] <= bound, (
        f"{name}: executed plan runs {rops['Exchange']} Exchanges "
        f"(bound {bound}) — is the convergence loop still "
        "localCheckpointing per round?"
    )
