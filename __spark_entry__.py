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
# Round 16 window (50). Staleness audit at the start of round 16 (computed
# from CORRECTNESS_r01..r15; every one of the 209 queries registered then
# has at least one driver-green row and ZERO hard failures ever):
# r11-stale = 22, r12 = 46, r13 = 45, r14 = 46, r15 = 50; 2 new gates
# this round (211 total). Window: (a) the 2 NEW round-16 gates
# (COUNT(col)/AVG metadata pushdown; exact-collapsed SemDeDup) — every
# new gate gets a driver row in its birth round, keeping the
# all-queries-driver-green union invariant; (b) the 5 queries whose
# ENGINE or SHAPE materially changed this round (both SemDeDup gates:
# corpus-derived K via sem_auto_k + the predicted_recall column; the
# three aggregate-pushdown / partition-classification gates riding the
# hardened acceptance path — per-file schema vouching, page_rows
# reconciliation, union-schema collision rule, deep key-dir probe);
# (c) the 22 r11-stale rows deferred from round 15 — the oldest cohort,
# now cleared; (d) 21 of the 46 r12-stale rows, prioritizing the format
# scans the round-16 JVM changes touch (merge-schemas, partitioned,
# pruned, quiverjvm_*) and ANN pipelines over simple relational rows.
# 2+5+22+21 = 50; position 51+ falls back to registry order. The 25
# r12-stale rows deferred to round 17 (they will head its window) are
# simple scan/relational/scalar rows with every-round pytest parity and
# no code motion since r12: approx_distinct_parts,
# pipeline_mixture_weights, quiver_scan_bools, quiver_scan_decimals,
# quiver_scan_delta, quiver_scan_documents, quiver_scan_embeddings,
# quiver_scan_freq, quiver_scan_nested_types, quiver_scan_uints,
# quiver_sql_view_agg, sample_per_source_topk, sample_stratified_docs,
# scalar_date_funcs, scalar_map_funcs, scalar_math_funcs,
# scalar_string_funcs, scalar_subquery_above_avg, setop_union_counts,
# text_bigram_topk, text_repetition_stats, text_type_token_ratio,
# text_zipf_slope, topk_orders, unpivot_lineitem_metrics.
_PRIORITY = [
    # (a) new round-16 gates
    "quiver_countcol_pushdown",
    "dedup_semantic_semdedup_collapsed",
    # (b) materially changed this round
    "dedup_semantic_semdedup",
    "dedup_semantic_semdedup_cos",
    "quiver_count_pushdown",
    "quiver_grouped_count_pushdown",
    "quiverjvm_partitioned_ingest",
    # (c) the 22 round-11-stale rows deferred from round 15
    "agg_collect_sorted",
    "agg_minby_maxby",
    "agg_quantiles",
    "agg_stats_moments",
    "agg_string_ordered",
    "case_when_buckets",
    "distinct_counts",
    "grouped_minmax_norm",
    "in_between_filter",
    "null_handling",
    "q12_priority_shipping",
    "scalar_array_funcs",
    "scalar_json_funcs",
    "scalar_regexp_funcs",
    "setop_bag_semantics",
    "setop_intersect_all",
    "setop_union_distinct",
    "text_fingerprint",
    "text_lang_id",
    "text_length_histogram",
    "text_quality_stats",
    "text_token_topk",
    # (d) 21 of the 46 round-12-stale rows (format paths + ANN)
    "quiver_merge_schemas_scan",
    "quiver_partitioned_scan",
    "quiver_pruned_date_scan",
    "quiverjvm_default_fill_scan",
    "quiverjvm_limit_scan",
    "quiverjvm_nested_scan",
    "quiverjvm_uint_scan",
    "quiver_batch_read",
    "quiver_compacted_scan",
    "quiver_manifest_packed_scan",
    "quiver_manifest_rebuild_scan",
    "quiver_rollback_scan",
    "quiver_scan_q1",
    "quiver_scan_checksums",
    "quiver_adaptive_zstd_join",
    "ann_cosine_topk",
    "ann_dot_topk",
    "ann_lsh_bucketed_pairs",
    "ann_sq8_topk",
    "text_char_lm_score",
    "q13_customer_distribution",
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
