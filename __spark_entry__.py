"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query; ``queries()`` exposes every
implemented operator from SURVEY.md §2.3 (+ LLM-pipeline extensions);
``oracle_sql()`` gives the DuckDB twin for each (omitted only for
non-SQL-expressible pipelines, e.g. mapInPandas decoders).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from quiver_spark.registry import load_all_operators  # noqa: E402

# Registration order drives which queries a bounded correctness sample sees
# first. Rotated per round so every operator gets a recent driver-green row.
# Round 7 window (50), per VERDICT r6 item 3: (a) quiver_narrow_projection —
# new this round, never sampled; (b) the 23 displaced rows whose last
# driver-green is round 4 (all re-verified green at sf0.01 locally in
# rounds 6 AND 7, so the aging carried no correctness risk); (c)
# dedup_simhash and ann_lsh_buckets, whose last driver rows predate the
# 60-bit / multi-table rework — the reworked versions get their first
# driver proof here; (d) fill to 50 with the oldest half of the round-5
# window. Position 51+ holds the rest of the round-5 window (round 8's
# natural leaders), then the freshly-green round-6 names follow in
# registry order.
_PRIORITY = [
    # (a) new this round — never sampled
    "quiver_narrow_projection",
    "pipeline_pack_sequences",
    "text_context_windows",
    "sample_token_budget",
    "dedup_canonical_docs",
    "quiver_inplace_compact_scan",
    "events_anomaly_hours",
    "text_length_histogram",
    "quiver_scan_events",
    # (b) last driver-verified in round 4 — oldest green rows
    "multimodal_binary_meta",
    "q8_market_share",
    "q9_product_profit",
    "agg_quantiles",
    "q3_shipping_priority",
    "q6_forecast_revenue",
    "q14_promo_revenue",
    "q19_bracket_revenue",
    "agg_collect_sorted",
    "agg_minby_maxby",
    "embedding_norm_stats",
    "q22_idle_customers",
    "agg_string_ordered",
    "setop_bag_semantics",
    "setop_intersect_all",
    "setop_union_distinct",
    "scalar_array_funcs",
    "scalar_json_funcs",
    "scalar_regexp_funcs",
    "text_token_topk",
    "text_quality_stats",
    "text_lang_id",
    "text_fingerprint",
    # (c) reworked since their last driver row (r4: 16-bit simhash /
    # single-table LSH) — first driver proof of the hardened versions
    "dedup_simhash",
    "ann_lsh_buckets",
    # (d) oldest half of the round-5 window
    "q4_order_priority",
    "q5_region_revenue",
    "q10_returned_items",
    "q18_large_orders",
    "outer_join_coverage",
    "semi_join_customers",
    "anti_join_customers",
    "nonequi_acctbal_pairs",
    "window_rank_orders",
    "window_running_total",
    "window_lag_gap",
    "window_ntile_share",
    "rollup_returns",
    "cube_orders",
    "setop_intersect_nations",
    "setop_except_nations",
    # position 51+: remaining round-5 rows — round 8's natural leaders
    "setop_union_counts",
    "scalar_string_funcs",
    "scalar_date_funcs",
    "scalar_math_funcs",
    "scalar_subquery_above_avg",
    "in_between_filter",
    "null_handling",
    "case_when_buckets",
    "topk_orders",
    "distinct_counts",
    "agg_stats_moments",
    "dedup_minhash_signature",
    "events_hourly_rollup",
    "events_sliding_daily",
    "events_json_extract",
    "events_sessionize",
    "events_pivot_types",
    "quiver_sql_view_agg",
    "quiver_scan_bools",
    "dedup_clusters",
    "ann_ivf_topk",
    "events_gapfill_hourly",
    "sample_stratified_docs",
    "decontaminate_eval_overlap",
    "text_repetition_stats",
    "q13_customer_distribution",
    "q15_top_supplier",
    "unpivot_lineitem_metrics",
    "multimodal_resize_stub",
    "multimodal_frame_sample",
    "scalar_map_funcs",
    "grouped_minmax_norm",
]


def _ordered_specs():
    specs = load_all_operators()
    rank = {n: i for i, n in enumerate(_PRIORITY)}
    return dict(
        sorted(
            specs.items(),
            key=lambda kv: (rank.get(kv[0], len(rank)), list(specs).index(kv[0])),
        )
    )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on sf0.001: the Q1-style pricing summary computed
    over the NATIVE quiver format scan (parquet → quiver conversion cached
    under /tmp on first run) — one call exercises the writer, the adaptive
    codec cascade, the DataSource scan, and the relational layer."""
    specs = load_all_operators()
    return specs["quiver_scan_q1"].spark(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.spark for name, spec in _ordered_specs().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle
        for name, spec in _ordered_specs().items()
        if spec.oracle is not None
    }
