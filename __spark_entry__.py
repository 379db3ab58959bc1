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
# Round 12 window (50). Staleness audit at the start of round 12 (computed
# from CORRECTNESS_r1..r11; every one of the 172 queries registered then
# has at least one driver-green row and ZERO failures ever): r8-stale = 22,
# r9 = 50, r10 = 50, r11 = 50; 7 new gates this round (179 total). Window:
# (a) the 22 r8-stale rows — the oldest cohort, exhausted this round so no
# query's newest green row will be older than round 9; (b) the 7 new
# round-12 gates; (c) the 2 queries whose CODE materially changed this
# round despite an r11-green row (text_char_lm_score: plan + bigram
# kernel; quiver_unified_scan: routing semantics); (d) fill from the r9
# cohort, rerouted format gates first (their ENGINE changed to quiverjvm
# this round under quiver_relation's engine="auto"). Position 51+ falls
# back to registry order.
_PRIORITY = [
    # (a) the 22 round-8-stale rows
    "q13_customer_distribution",
    "quiver_rollback_scan",
    "quiver_scan_bools",
    "quiver_scan_delta",
    "quiver_scan_freq",
    "quiver_scan_nested_types",
    "quiver_scan_uints",
    "quiver_sql_view_agg",
    "quiver_time_travel_scan",
    "sample_per_source_topk",
    "sample_stratified_docs",
    "scalar_date_funcs",
    "scalar_map_funcs",
    "scalar_math_funcs",
    "scalar_string_funcs",
    "scalar_subquery_above_avg",
    "setop_union_counts",
    "text_bigram_topk",
    "text_repetition_stats",
    "text_type_token_ratio",
    "topk_orders",
    "unpivot_lineitem_metrics",
    # (b) new round-12 gates
    "quiverjvm_nested_scan",
    "quiverjvm_uint_scan",
    "quiverjvm_default_fill_scan",
    "text_zipf_slope",
    "pipeline_mixture_weights",
    "decontaminate_embedding_overlap",
    "quiverjvm_limit_scan",
    # (c) materially changed this round
    "text_char_lm_score",
    "quiver_unified_scan",
    # (d) r9-cohort fill — rerouted format gates first (engine changed)
    "quiver_adaptive_zstd_join",
    "quiver_batch_read",
    "quiver_compacted_scan",
    "quiver_limit_head",
    "quiver_manifest_packed_scan",
    "quiver_manifest_rebuild_scan",
    "quiver_merge_schemas_scan",
    "quiver_partitioned_scan",
    "quiver_pruned_date_scan",
    "quiver_scan_checksums",
    "quiver_scan_decimals",
    "quiver_scan_documents",
    "quiver_scan_embeddings",
    "quiver_scan_q1",
    "ann_cosine_topk",
    "ann_dot_topk",
    "ann_lsh_bucketed_pairs",
    "ann_sq8_topk",
    "approx_distinct_parts",
]
# (three r9 fill rows — asof_join_events_orders, correlated_small_quantity,
# arrow_ipc_merge_scan — yielded their slots to the three late round-12
# gates; they stay r9-green, above the stated r8 floor)


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
