#!/usr/bin/env python
"""Reproduce the SCALE.md 10x stress runs.

Builds scaled copies of the sf0.1 fixtures under /tmp (documents 10x
with offset doc_ids, or lineitem+orders 10x with offset orderkeys) and
times a set of registered queries against them with the noop sink.

Usage:
    python tools/stress.py docs      # 50k documents  (dedup/text stress)
    python tools/stress.py facts     # 6M lineitem    (join stress)
    python tools/stress.py curation  # 50k docs + 20k vecs + 1M events
                                     # (curation/rollup/funnel stress)
    python tools/stress.py maint     # same 10x build; the maintenance /
                                     # runtime-filter / sketch operators
    python tools/stress.py century   # 100x docs (500k) + 100x vecs
                                     # (200k): the dedup/curation family
                                     # at two orders of magnitude
    python tools/stress.py century_facts  # 100x events (10M) + lineitem
                                     # (60M) + orders (15M): the agg/
                                     # window/join/streaming families
    python tools/stress.py century_linkage  # 100x customer (1.5M rows,
                                     # replicas keep their block): the
                                     # ER family two decades up
    python tools/stress.py base q1 q2 ...  # 1x baseline at sf0.1 for
                                     # the named queries (same harness:
                                     # warm session, noop sink)

Any mode accepts trailing query names to restrict the sweep:
    python tools/stress.py century_facts agg_mann_whitney agg_ks_test
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = "/root/testdata/sf0.1"
ALL_TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

DOCS_QUERIES = [
    "text_dedup_minhash", "text_dedup_simhash", "text_dedup_clusters",
    "pipeline_corpus_filter", "text_repetition_ratio", "text_rolling_hash",
    "text_winnow_fingerprint", "text_classifier_score",
    "text_dedup_containment", "text_dedup_keep_best",
    "sample_shard_shuffle", "text_bm25_topk", "text_dedup_minhash_incremental",
    "mm_codec_png_roundtrip", "mm_decode_features_real",
    "mm_codec_gif_roundtrip", "text_decontaminate_fuzzy",
    "mm_codec_jpeg_roundtrip", "text_gopher_rules", "text_bpe_train",
    "text_bpe_encode",
    # r4 additions: perplexity terciles, distributed GD trainer, and
    # the MJPEG video pipeline (frames never shuffle; map-only)
    "text_ccnet_buckets", "text_classifier_train", "mm_codec_mjpeg_video",
    # r6: inter-frame predictive video (MPV1 motion-compensated GOPs)
    "mm_codec_pframe_video",
    # r5: one-pass per-source corpus profile + drift monitor
    "pipeline_dataset_card", "text_source_divergence",
    # r6: content-defined chunking dedup, KN-smoothed LM scoring,
    # Zipf corpus fit
    "text_dedup_cdc", "text_kneser_ney", "text_zipf_fit",
    # r7: lossless audio (KFLC fixed-LPC + planar Rice; map-only)
    # and the hashing-trick featurizer (stateless, no vocab join)
    "mm_codec_lossless_audio", "fe_feature_hashing",
]
FACTS_QUERIES = [
    "agg_pricing_summary", "join_inner_equi", "q_shipping_priority",
    "q_market_share", "q_nation_profit", "q_sole_late_shipper",
    "sort_global", "q_forecast_revenue", "join_range_bucketed",
    # r6: these scale with orders/lineitem, so they stress here
    "mv_join_delta", "dq_benford", "join_allocation_fifo",
]
MAINT_QUERIES = [
    "dim_scd2_build", "dim_scd2_point_in_time", "stream_cdc_apply",
    "win_gaps_islands", "agg_hll_partitioned", "agg_bitmap_distinct",
    "agg_heavy_hitters", "join_bloom_runtime", "graph_reachability",
    "dq_expectations", "sample_balanced_classes", "join_asof_tolerance",
    "sample_train_split", "sink_partition_overwrite", "fn_collation_group",
    "graph_triangle_count", "graph_triangle_doulion", "graph_cc_pointer_doubling",
    "mv_incremental_refresh", "sink_additive_rollup", "agg_cuped_adjusted",
    "agg_ols_trend", "agg_hist_arrow_map", "agg_ordered_listagg",
    "win_running_distinct", "join_asof_nearest",
    "stream_stream_join",
    "events_survival_km", "stream_static_enrich", "udaf_arrow_groupstats",
    # r6: the ER family at 10x customer (replicas keep their block, so
    # blocks genuinely grow 10x — the hot-block / hot-bucket stress the
    # r5 verdict asked to measure; caps bound both)
    "er_customer_linkage", "er_sorted_neighborhood", "er_lsh_blocking",
    "dq_k_anonymity",
    # r6: join-view IVM, mergeable quantile rollup, outer stream join,
    # pattern matching, LPA communities, integer-exact ACF, Benford
    "agg_quantile_rollup", "stream_outer_join",
    "win_pattern_match", "graph_label_propagation", "ts_autocorrelation",
    # r7: oracle-exact mergeable KMV sketch (daily partials + merge)
    # and count-min counters (d x w cells ARE the reduce state)
    "agg_kmv_distinct", "agg_count_min",
]
CURATION_QUERIES = [
    "text_decontaminate", "text_chunk_sliding", "text_pack_sequences",
    "sample_mixture", "pipeline_retrieval_corpus", "pipeline_training_set",
    "emb_kmeans", "emb_label_centroids", "agg_time_rollup",
    "events_funnel_ordered", "text_dedup_editdist", "win_sessionize",
    "win_out_of_order_profile", "agg_skew_profile", "sample_temperature",
    "vec_ann_pq", "agg_anomaly_mad",
    "emb_dedup_cosine", "vec_ann_ivf", "sample_importance",
    "sink_zorder_layout", "emb_triplet_mine", "vec_ann_ivf_pq",
    "pipeline_hybrid_rrf", "emb_dedup_incremental",
    # r4: emb_dedup_cosine_lsh / emb_dedup_clusters rejoin the sweep —
    # the dup-group collapse + per-band cap dropped them 69 s / 80 s
    # -> 7.4 s / 4.7 s at 10x (they were excluded in r2/r3 because the
    # 0.45-threshold 4-bit bands made their buckets quadratic in n).
    "emb_dedup_cosine_lsh", "emb_dedup_clusters",
    # r5: cluster-scoped SemDeDup shares the same session artifacts
    "emb_semdedup", "vec_ann_ivf_indexed",
    # r6: graph ANN (persisted k-NN graph + beam search) and k-center
    # diverse selection
    "vec_ann_nsw", "sample_kcenter",
]


CENTURY_FACTS_QUERIES = [
    # 100x receipts for the relational/agg/window/streaming families
    # (10M events / 60M lineitem / 15M orders): each entry names its
    # sub-linear mechanism in SCALE.md — bounded group cardinality,
    # single-shuffle windows, partial aggregation, broadcast dims
    "agg_pricing_summary", "agg_status_counts", "agg_grouping_sets",
    "agg_time_rollup", "join_inner_equi", "q_shipping_priority",
    "sort_global", "win_sessionize", "win_running_total",
    "events_funnel_ordered", "join_asof_rate",
    "stream_state_machine_batch", "stream_dedup_payment",
    "agg_hll_partitioned", "agg_bitmap_distinct",
    # r6 additions over the same 100x events/facts
    "agg_quantile_rollup", "ts_autocorrelation", "win_pattern_match",
    "stream_outer_join", "mv_join_delta", "dq_benford",
    # r7: the statistics family post-rewrite (distinct-value prefix
    # frames) + RFM post-rewrite (bucketed two-pass NTILE) — the r6
    # verdict's weak pair must show its century receipt
    "agg_mann_whitney", "agg_ks_test", "agg_chi_square",
    "events_rfm_segments", "agg_bootstrap_ci", "agg_sprt_sequential",
    # r8 (VERDICT r7 #4): century receipts for the rest of the r7
    # sketch/statistics batch — each is one hash agg + domain frames
    "agg_kmv_distinct", "agg_count_min", "agg_anova_oneway",
    # r8 new entries over 100x facts: domain-frame stats, the
    # distinct-value binning pattern, the per-user label window, and
    # the degree-capped bipartite projection (orders 100x makes
    # per-customer item sets cross the cap — the saturation case)
    "agg_benjamini_hochberg", "dq_psi_drift",
    "fe_quantile_binning", "win_lead_label", "ts_changepoint_binseg",
    "graph_bipartite_projection", "fe_woe_iv", "dq_null_profile",
    # r8 (this session): delta-method/theta/OLS (one hash agg + tiny
    # frames), rolling-AU (bounded 7x fan of the day-user frame),
    # WoW (day-frame self-join), FK audit (per-rel join+agg pass),
    # k-core (bounded peel rounds over the thresholded graph)
    "agg_delta_method_ci", "agg_theta_setops", "agg_ols_multifeature",
    "events_rolling_active_users", "agg_period_over_period",
    "dq_referential_integrity", "graph_kcore",
    # r8 (this session, batch 7): one window pass over the day-reduced
    # frame; one contingency agg + 35-cell frames
    "fe_lag_features", "agg_mutual_information",
    # r8 (this session, batches 8-9): stream-shaped tumbling agg +
    # tiny rank frame; series fold on the day domain; per-user gap
    # window + sufficient-statistics agg
    "stream_topk_per_window", "ts_holt_linear", "events_bot_detection",
    # r8 (this session, batch 10): frame-sum rolling OLS (one window
    # sort per user); IPF on the <=35-cell contingency frame
    "win_rolling_regression", "agg_raking_ipf",
    # r8 (this session, batch 11): row-at-a-time Python by design (the
    # API-surface pin) — expect honest linearity at Python speed
    "udtf_table_arg_sessions",
    # r8 (this session, batch 12): per-user agg + 5-row segment frame;
    # type frame + 1-row watermark broadcast
    "agg_hte_segments", "dq_freshness",
    # r8 (this session, batch 13): midpoint split + one conditional
    # hash agg; JSON extraction is the per-row cost
    "agg_heavy_change",
    # r8 (this session, batch 14): sweep-line occupancy — session
    # window + distinct-instant frame + day-two-pass prefix
    "events_concurrency_curve",
]

CENTURY_LINKAGE_QUERIES = [
    # 100x customer with replicas INSIDE their (nation, segment) block:
    # the ER caps' saturation receipt (blocks grow 100x, pair work must
    # go flat once a block crosses its cap, like vec_ann_nsw's)
    "er_customer_linkage", "er_sorted_neighborhood", "er_lsh_blocking",
    "dq_k_anonymity",
    # r8: customer-keyed entries — distributional ranks / NTILE /
    # Neyman selection after the low-cardinality-window rewrites
    "win_dist_ranks", "win_ntile_quartile", "sample_neyman",
    # r8 (this session): golden record — per-block union-find, so 100x
    # replicas inside their block must show cap-bounded flat pair work
    "er_golden_record",
]

CENTURY_QUERIES = [
    # 100x receipts: every entry here must scale ~linearly because its
    # heavy stages run on DISTINCT content (dup-collapse reps, value
    # groups) or are map-only — replication grows members, not reps
    "text_tokenize_tf", "text_gopher_rules", "pipeline_dataset_card",
    "text_ccnet_buckets", "text_dedup_exact", "text_dedup_minhash",
    "text_dedup_clusters", "text_dedup_keep_best", "text_dedup_substring",
    "emb_dedup_cosine_lsh", "emb_dedup_clusters", "emb_semdedup",
    "emb_dedup_incremental", "sample_shard_shuffle", "pipeline_corpus_filter",
    # r6: CDC dedup is character-bound (linear by contract); the graph
    # ANN build is cap-bounded; k-center is K fixed rounds
    "text_dedup_cdc", "vec_ann_nsw", "sample_kcenter",
    # r8 (VERDICT r7 #4): map-only KFLC codec + stateless hashing-trick
    # featurizer — both should be ~linear in corpus bytes
    "mm_codec_lossless_audio", "fe_feature_hashing",
    # r8: JSONL write+read is two linear passes over corpus bytes
    "source_jsonl_roundtrip",
    # r8 (this session): bloom probe is j broadcast lookups per gram
    # (bit frame bounded by m at any reference size); token-budget
    # sampling is a stateless per-row coin + |sources| frames
    "text_decontaminate_bloom", "sample_token_budget",
    # r8 (this session): DSIR is explode + <=1024-bucket aggs; repeat
    # upsampling is a bounded explode; XML roundtrip is linear format
    # I/O like JSONL
    "pipeline_dsir_selection", "sample_upsample_repeat",
    "source_xml_roundtrip",
]


def build(mode: str) -> str:
    import duckdb

    if mode == "century_facts":
        out = "/tmp/stress100_facts"
        os.makedirs(out, exist_ok=True)
        if not os.path.exists(os.path.join(out, "lineitem.parquet")):
            con = duckdb.connect()
            con.execute(f"""
              COPY (SELECT event_id + 1000000 * r AS event_id, ts,
                           user_id + 100 * r AS user_id, event_type, value, props
                    FROM '{BASE}/events.parquet', generate_series(0, 99) g(r))
              TO '{out}/events.parquet' (FORMAT PARQUET)""")
            con.execute(f"""
              COPY (SELECT l_orderkey + 10000000 * r AS l_orderkey, l_partkey,
                           l_suppkey, l_linenumber, l_quantity, l_extendedprice,
                           l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate
                    FROM '{BASE}/lineitem.parquet', generate_series(0, 99) g(r))
              TO '{out}/lineitem.parquet' (FORMAT PARQUET)""")
            con.execute(f"""
              COPY (SELECT o_orderkey + 10000000 * r AS o_orderkey, o_custkey,
                           o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
                    FROM '{BASE}/orders.parquet', generate_series(0, 99) g(r))
              TO '{out}/orders.parquet' (FORMAT PARQUET)""")
            for t in ALL_TABLES:
                if t not in ("events", "lineitem", "orders"):
                    shutil.copy(f"{BASE}/{t}.parquet", f"{out}/{t}.parquet")
        return out

    if mode == "century_linkage":
        out = "/tmp/stress100_linkage"
        os.makedirs(out, exist_ok=True)
        if not os.path.exists(os.path.join(out, "customer.parquet")):
            con = duckdb.connect()
            # replicas keep their (nation, segment) block and get fresh
            # names/keys — every ER block genuinely grows 100x
            con.execute(f"""
              COPY (SELECT c_custkey + 1000000 * r AS c_custkey,
                           CASE WHEN r = 0 THEN c_name
                                ELSE concat('Customer#', lpad(CAST(c_custkey + 1000000 * r AS VARCHAR), 9, '0'))
                           END AS c_name,
                           c_nationkey, c_mktsegment,
                           c_acctbal + r AS c_acctbal
                    FROM '{BASE}/customer.parquet', generate_series(0, 99) g(r))
              TO '{out}/customer.parquet' (FORMAT PARQUET)""")
            for t in ALL_TABLES:
                if t != "customer":
                    shutil.copy(f"{BASE}/{t}.parquet", f"{out}/{t}.parquet")
        return out

    if mode == "base":
        return BASE

    if mode == "century":
        out = "/tmp/stress100_century"
        os.makedirs(out, exist_ok=True)
        if not os.path.exists(os.path.join(out, "documents.parquet")):
            con = duckdb.connect()
            con.execute(f"""
              COPY (SELECT doc_id + 100000 * r AS doc_id, text, lang, source, n_chars
                    FROM '{BASE}/documents.parquet', generate_series(0, 99) g(r))
              TO '{out}/documents.parquet' (FORMAT PARQUET)""")
            con.execute(f"""
              COPY (SELECT vec_id + 100000 * r AS vec_id, embedding, label
                    FROM '{BASE}/embeddings.parquet', generate_series(0, 99) g(r))
              TO '{out}/embeddings.parquet' (FORMAT PARQUET)""")
            for t in ALL_TABLES:
                if t not in ("documents", "embeddings"):
                    shutil.copy(f"{BASE}/{t}.parquet", f"{out}/{t}.parquet")
        return out

    out = f"/tmp/stress10_{mode}"
    os.makedirs(out, exist_ok=True)
    marker = "documents.parquet" if mode == "docs" else "lineitem.parquet"
    if not os.path.exists(os.path.join(out, marker)):
        con = duckdb.connect()
        scaled = set()
        if mode == "docs":
            con.execute(f"""
              COPY (SELECT doc_id + 100000 * r AS doc_id, text, lang, source, n_chars
                    FROM '{BASE}/documents.parquet', generate_series(0, 9) g(r))
              TO '{out}/documents.parquet' (FORMAT PARQUET)""")
            scaled = {"documents"}
        elif mode == "curation":
            con.execute(f"""
              COPY (SELECT doc_id + 100000 * r AS doc_id, text, lang, source, n_chars
                    FROM '{BASE}/documents.parquet', generate_series(0, 9) g(r))
              TO '{out}/documents.parquet' (FORMAT PARQUET)""")
            # same offset as documents so the 1:1 doc_id=vec_id join
            # survives the scale-up
            con.execute(f"""
              COPY (SELECT vec_id + 100000 * r AS vec_id, embedding, label
                    FROM '{BASE}/embeddings.parquet', generate_series(0, 9) g(r))
              TO '{out}/embeddings.parquet' (FORMAT PARQUET)""")
            con.execute(f"""
              COPY (SELECT event_id + 1000000 * r AS event_id, ts, user_id + 100 * r AS user_id,
                           event_type, value, props
                    FROM '{BASE}/events.parquet', generate_series(0, 9) g(r))
              TO '{out}/events.parquet' (FORMAT PARQUET)""")
            # r6: customer 10x for the linkage family — replicas keep
            # their (nation, segment) block and get fresh names/keys,
            # so ER blocks genuinely grow 10x (the hot-block stress)
            con.execute(f"""
              COPY (SELECT c_custkey + 1000000 * r AS c_custkey,
                           CASE WHEN r = 0 THEN c_name
                                ELSE concat('Customer#', lpad(CAST(c_custkey + 1000000 * r AS VARCHAR), 9, '0'))
                           END AS c_name,
                           c_nationkey, c_mktsegment,
                           c_acctbal + r AS c_acctbal
                    FROM '{BASE}/customer.parquet', generate_series(0, 9) g(r))
              TO '{out}/customer.parquet' (FORMAT PARQUET)""")
            scaled = {"documents", "embeddings", "events", "customer"}
        else:
            con.execute(f"""
              COPY (SELECT l_orderkey + 10000000 * r AS l_orderkey, l_partkey,
                           l_suppkey, l_linenumber, l_quantity, l_extendedprice,
                           l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate
                    FROM '{BASE}/lineitem.parquet', generate_series(0, 9) g(r))
              TO '{out}/lineitem.parquet' (FORMAT PARQUET)""")
            con.execute(f"""
              COPY (SELECT o_orderkey + 10000000 * r AS o_orderkey, o_custkey,
                           o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
                    FROM '{BASE}/orders.parquet', generate_series(0, 9) g(r))
              TO '{out}/orders.parquet' (FORMAT PARQUET)""")
            scaled = {"lineitem", "orders"}
        for t in ALL_TABLES:
            if t not in scaled:
                shutil.copy(f"{BASE}/{t}.parquet", f"{out}/{t}.parquet")
    return out


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "facts"
    only = sys.argv[2:]
    assert mode in (
        "docs", "facts", "curation", "maint", "century", "century_facts",
        "century_linkage", "base",
    ), ("mode must be docs|facts|curation|maint|century|century_facts|"
        "century_linkage|base")
    sf_dir = build("curation" if mode == "maint" else mode)

    from am_kinesis_pay_spark.registry import queries
    from am_kinesis_pay_spark.session import get_session

    spark = get_session(f"stress_{mode}")
    qs = queries()
    qs["agg_status_counts"](spark, sf_dir).write.mode("overwrite").format(
        "noop"
    ).save()
    names = {
        "docs": DOCS_QUERIES,
        "facts": FACTS_QUERIES,
        "curation": CURATION_QUERIES,
        "maint": MAINT_QUERIES,
        "century": CENTURY_QUERIES,
        "century_facts": CENTURY_FACTS_QUERIES,
        "century_linkage": CENTURY_LINKAGE_QUERIES,
        "base": [],
    }[mode]
    if only:
        unknown = [n for n in only if n not in qs]
        assert not unknown, f"unknown queries: {unknown}"
        names = list(only)  # run exactly what was asked, in given order
    for name in names:
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).write.mode("overwrite").format("noop").save()
        print(f"{time.perf_counter() - t0:7.2f}  {name}")


if __name__ == "__main__":
    main()
