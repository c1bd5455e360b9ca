#!/usr/bin/env python
"""Regenerate PLANS.md: formatted physical plans for the load-bearing
queries, with scale annotations. Run from the repo root."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
# The annotated generation lives inline in the repo history; simplest
# regeneration: dump the operator tree per query.
from am_kinesis_pay_spark.session import get_session
from am_kinesis_pay_spark.registry import queries

NAMES = [
    "agg_pricing_summary", "join_asof_rate", "join_broadcast_dim",
    "join_range_theta", "q_shipping_priority", "text_dedup_minhash",
    "sort_limit", "text_decontaminate", "agg_time_rollup",
    "join_dpp", "join_skew_salted", "text_winnow_fingerprint",
    "text_classifier_score", "text_dedup_incremental",
    "dim_scd2_build", "agg_heavy_hitters", "stream_cdc_apply",
    "dim_scd2_point_in_time", "agg_bitmap_distinct", "win_gaps_islands",
    "graph_reachability",
]

if __name__ == "__main__":
    spark = get_session("plans")
    for name in NAMES:
        df = queries()[name](spark, "/root/testdata/sf0.001")
        print(f"== {name} ==")
        df.explain("formatted")
