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
# Round 11 window (50), per VERDICT r10 item 2: (a) the 24 rows whose
# newest driver-green row is round 7 (positions 1-24 — the r10 window had
# room for only part of the stale cohort); (b) the new round-11 gates;
# (c) fill with the round-8 cohort (44 rows; the ones that don't fit stay
# r8-green, which is the stated floor). Exact staleness audit at the
# start of round 11: round-7 cohort = 24, round-8 = 44, round-9 = 50,
# round-10 = 50 (computed from CORRECTNESS_r1..r10; every one of the 168
# queries registered then has at least one driver-green row and zero
# failures ever; 4 more gates registered this round for a total of 172).
# The 50-slot window covers (a) + the 4 new gates + the first 22 of (c);
# position 51+ falls back to registry order.
_PRIORITY = [
    # (a) the 24 round-7-stale rows — VERDICT r10 item 2 puts them first
    "agg_collect_sorted",
    "agg_minby_maxby",
    "agg_quantiles",
    "agg_string_ordered",
    "dedup_canonical_docs",
    "embedding_norm_stats",
    "events_anomaly_hours",
    "pipeline_pack_sequences",
    "quiver_inplace_compact_scan",
    "quiver_narrow_projection",
    "quiver_scan_events",
    "sample_token_budget",
    "scalar_array_funcs",
    "scalar_json_funcs",
    "scalar_regexp_funcs",
    "setop_bag_semantics",
    "setop_intersect_all",
    "setop_union_distinct",
    "text_context_windows",
    "text_fingerprint",
    "text_lang_id",
    "text_length_histogram",
    "text_quality_stats",
    "text_token_topk",
    # (b) new round-11 gates (inserted as they land)
    "quiver_unified_scan",
    "quiverjvm_partitioned_ingest",
    "quiverjvm_alter_scan",
    "text_char_lm_score",
    # (c) round-8 cohort fill (oldest-first coverage; overflow past slot 50
    # stays round-8-green, the stated floor)
    "agg_stats_moments",
    "ann_ivf_topk",
    "arrow_ipc_scan",
    "case_when_buckets",
    "decontaminate_eval_overlap",
    "dedup_clusters",
    "dedup_cross_source_matrix",
    "dedup_minhash_signature",
    "distinct_counts",
    "events_gapfill_hourly",
    "events_hourly_rollup",
    "events_json_extract",
    "events_pivot_types",
    "events_sessionize",
    "events_sliding_daily",
    "events_transition_matrix",
    "grouped_minmax_norm",
    "in_between_filter",
    "multimodal_frame_sample",
    "multimodal_resize_stub",
    "null_handling",
    "q12_priority_shipping",
    "q13_customer_distribution",
    "quiver_rollback_scan",
    "quiver_scan_bools",
    "quiver_scan_delta",
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
