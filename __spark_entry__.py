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
# Round 15 window (50). Staleness audit at the start of round 15 (computed
# from CORRECTNESS_r1..r14; every one of the 204 queries registered then
# has at least one driver-green row and ZERO hard failures ever — the two
# historical `no_oracle` rows are the designed rows-only checks):
# r10-stale = 15, r11 = 48, r12 = 46, r13 = 45, r14 = 50; 5 new gates
# this round (209 total). Window: (a) the 5 NEW round-15 gates
# (spherical k-means, SemDeDup blocking on it, the unified batch write
# router, metadata-served COUNT/MIN/MAX/SUM pushdown, and the
# partition-grouped pushdown) — every new gate gets a
# driver row in its birth round, keeping the all-queries-driver-green
# union invariant; (b) the 4 queries whose ENGINE or SHAPE materially
# changed this round (SemDeDup's report stage became a union-aggregate
# via the shared _sem_pairs; the epoch-shuffle rank is now
# range-partitioned; quiverjvm_scan_agg representing the hardened JVM
# read path — header-magic check + sidecar crc32 verification on every
# page read; the JVM streaming sink's GC walk became
# cutoff-short-circuiting); (c) the 15 r10-stale rows deferred from
# round 14 — the oldest cohort, now cleared; (d) 26 of the 48 r11-stale
# rows, prioritizing format-path scans (the CRC change touches every
# quiverjvm read) and operator-logic pipelines over simple relational
# rows. 5+4+15+26 = 50; position 51+ falls back to registry order. The
# 22 r11-stale rows deferred to round 16 (they will head its window)
# are the simple relational/scalar operators with every-round pytest
# parity and no code motion since r11 — plus text_fingerprint
# (rolling-hash pipeline, pytest parity every round, displaced by the
# fifth new gate): agg_collect_sorted,
# agg_minby_maxby, agg_quantiles, agg_stats_moments, agg_string_ordered,
# case_when_buckets, distinct_counts, grouped_minmax_norm,
# in_between_filter, null_handling, q12_priority_shipping,
# scalar_array_funcs, scalar_json_funcs, scalar_regexp_funcs,
# setop_bag_semantics, setop_intersect_all, setop_union_distinct,
# text_lang_id, text_length_histogram, text_quality_stats,
# text_token_topk.
_PRIORITY = [
    # (a) new round-15 gates
    "embedding_kmeans_cosine",
    "dedup_semantic_semdedup_cos",
    "quiver_write_unified_scan",
    "quiver_count_pushdown",
    "quiver_grouped_count_pushdown",
    # (b) materially changed this round
    "dedup_semantic_semdedup",
    "pipeline_epoch_shuffle_plan",
    "quiverjvm_scan_agg",
    "quiverjvm_stream_sink_scan",
    # (c) the 15 round-10-stale rows deferred from round 14
    "anti_join_customers",
    "cube_orders",
    "dedup_simhash",
    "multimodal_binary_meta",
    "nonequi_acctbal_pairs",
    "outer_join_coverage",
    "quiver_analyze_stats",
    "rollup_returns",
    "semi_join_customers",
    "setop_except_nations",
    "setop_intersect_nations",
    "window_lag_gap",
    "window_ntile_share",
    "window_rank_orders",
    "window_running_total",
    # (d) 26 of the 48 round-11-stale rows (format paths + pipelines)
    "arrow_ipc_scan",
    "quiver_inplace_compact_scan",
    "quiver_narrow_projection",
    "quiver_scan_events",
    "quiverjvm_alter_scan",
    "quiverjvm_partitioned_ingest",
    "ann_ivf_topk",
    "decontaminate_eval_overlap",
    "dedup_canonical_docs",
    "dedup_clusters",
    "dedup_cross_source_matrix",
    "dedup_minhash_signature",
    "embedding_norm_stats",
    "events_anomaly_hours",
    "events_gapfill_hourly",
    "events_hourly_rollup",
    "events_json_extract",
    "events_pivot_types",
    "events_sessionize",
    "events_sliding_daily",
    "events_transition_matrix",
    "multimodal_frame_sample",
    "multimodal_resize_stub",
    "pipeline_pack_sequences",
    "sample_token_budget",
    "text_context_windows",
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
