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
# Round 14 window (50). Staleness audit at the start of round 14 (computed
# from CORRECTNESS_r1..r13; every one of the 196 queries registered then
# has at least one driver-green row and ZERO failures ever): r10-stale =
# 50, r11 = 48, r12 = 48, r13 = 50; 8 new gates this round (204 total).
# Window: (a) the 6 NEW round-14 gates (trained-PQ ANN with recall, the
# full watermarked stream-pipeline on the all-JVM path, streaming
# SESSION windows on the same path, DSIR importance weights, IVF-PQ
# residual quantization, largest-remainder mixture schedule, PCA top-2
# deflation, SemDeDup cluster-blocked semantic dedup) — every new gate
# gets a driver
# row in its birth round, keeping the
# all-queries-driver-green union invariant; (b) the 7 queries whose
# ENGINE or SHAPE materially changed this round (k-means update join
# carried through the assignment; TF-IDF n_docs regex escape; Bloom
# sparse-word left-join in both engines; hierarchical epoch-shuffle
# fingerprint; columns=/limit= now routed onto the JVM reader, which
# rewires quiver_unified_scan's probes and quiver_limit_head's relation;
# the JVM streaming sink's commit path gained the GC age-gate +
# heartbeat); (c) 35 of the 50 r10-stale rows — the oldest cohort.
# 8+7+35 = 50; position 51+ falls back to registry order. The 15
# r10-stale rows deferred to round 15 (they will head its window
# alongside the r11 cohort) are the simple relational operators with
# every-round pytest parity and no code motion since r10 (anti_join_
# customers, cube_orders, nonequi_acctbal_pairs, outer_join_coverage,
# rollup_returns, semi_join_customers, setop_except_nations,
# setop_intersect_nations, window_lag_gap, window_ntile_share,
# window_rank_orders, window_running_total) plus multimodal_binary_meta
# (metadata-only scan whose plumbing the r13-green
# multimodal_decode_features exercises end-to-end, pytest parity every
# round), dedup_simhash (its signature pipeline is exercised
# end-to-end by the r13-green dedup_simhash_pairs, pytest parity every
# round), and quiver_analyze_stats (covered by test_maintenance's
# ANALYZE pins + the analyze-stats broadcast-gate plan test, pytest
# parity every round).
_PRIORITY = [
    # (a) new round-14 gates
    "ann_pq_trained_topk",
    "quiverjvm_stream_pipeline_scan",
    "quiverjvm_stream_sessions_scan",
    "sample_dsir_weights",
    "ann_ivf_pq_topk",
    "pipeline_mixture_schedule",
    "embedding_pca_top2_deflation",
    "dedup_semantic_semdedup",
    # (b) materially changed this round
    "embedding_kmeans_clusters",
    "text_tfidf_topk",
    "sketch_bloom_membership",
    "pipeline_epoch_shuffle_plan",
    "quiver_unified_scan",
    "quiver_limit_head",
    "quiverjvm_stream_sink_scan",
    # (c) 35 of the 50 round-10-stale rows
    "ann_lsh_buckets",
    "dedup_span_excision",
    "q10_returned_items",
    "q11_important_supply",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q16_supplier_part_counts",
    "q18_large_orders",
    "q19_bracket_revenue",
    "q20_promotion_suppliers",
    "q21_waiting_suppliers",
    "q22_idle_customers",
    "q2_min_cost_supplier",
    "q3_shipping_priority",
    "q4_order_priority",
    "q5_region_revenue",
    "q6_forecast_revenue",
    "q8_market_share",
    "q9_product_profit",
    "quiver_alter_evolution_scan",
    "quiver_bloom_lookup_scan",
    "quiver_check_constraint_scan",
    "quiver_clustered_scan",
    "quiver_delete_scan",
    "quiver_incremental_scan",
    "quiver_merge_cdc_scan",
    "quiver_merge_upsert_scan",
    "quiver_repartitioned_scan",
    "quiver_snapshot_diff",
    "quiver_update_scan",
    "quiver_zorder_scan",
    "quiverjvm_ingest_roundtrip",
    "quiverjvm_scan_agg",
    "text_blocklist_filter",
    "text_pii_scrub",
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
