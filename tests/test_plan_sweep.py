"""Engine-wide plan hygiene sweep: NO registered query may plan a
CartesianProduct, and BroadcastNestedLoopJoin is allowed only where a
deliberately tiny broadcast side makes it the right plan (scalar
subquery results, the ≤10-row ANN query set). Everything else must be
a hash/sort-merge join — the property that decides whether a query
survives a 100× scale-up, enforced for the WHOLE surface instead of
per-query spot checks."""

from __future__ import annotations

import pytest

from am_kinesis_pay_spark.registry import queries

from tests.conftest import SF_DIR

# Each entry's NLJ side is O(1) rows by construction:
#   scalar aggregates cross-joined back (corpus size, global totals),
#   the ≤10-row ANN query set joined with a != predicate, or the
#   gapfill date spine.
_NLJ_ALLOWED = {
    "agg_chi_square",  # 1-row (r, c) dims broadcast onto the 1-row chi2
    "agg_cuped_adjusted",  # 1-row global-theta broadcast
    "agg_decile_lift",  # 1-row totals broadcast onto the 10-row frame
    "agg_histogram_equidepth",
    "agg_ks_test",  # 1-row (n1, n2) totals broadcast onto the ECDF frame
    "agg_skew_profile",
    "emb_kmeans",
    "emb_triplet_mine",  # ≤10-row anchor set joined with a != predicate
    "dq_benford",  # 1-row digit-total broadcast onto the 9-row frame
    "er_lsh_blocking",  # 1-row corpus-count broadcast (gram-DF threshold)
    "events_funnel_ordered",
    "events_gapfill_daily",
    "events_rfm_segments",  # 1-row corpus-max-date broadcast
    "fe_target_encoding",  # 1-row global-prior broadcast
    "events_survival_km",  # 1-row horizon-max-ts broadcast
    "text_collocations_pmi",  # 1-row corpus-token-total broadcast
    "graph_pagerank",
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
    "vec_cosine_topk",
    "vec_matryoshka_recall",
    "vec_knn_label",
}


@pytest.mark.parametrize("name", sorted(queries().keys()))
def test_no_accidental_cross_product(spark, name):
    df = queries()[name](spark, SF_DIR)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "CartesianProduct" not in plan, f"{name} plans a cartesian product"
    if name not in _NLJ_ALLOWED:
        assert "BroadcastNestedLoopJoin" not in plan, (
            f"{name} plans an unexpected nested-loop join"
        )
