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
# Round 13 window (50). Staleness audit at the start of round 13 (computed
# from CORRECTNESS_r1..r12; every one of the 179 queries registered then
# has at least one driver-green row and ZERO failures ever): r9-stale = 31,
# r10 = 50, r11 = 48, r12 = 50; 17 new gates this round (196 total). Window:
# (a) the 31 r9-stale rows — the oldest cohort, exhausted this round so no
# query's newest green row will be older than round 10; (b) the 17 new
# round-13 gates (JVM time travel / CDC / SQL catalog / stream source /
# stream sink, the KL divergence, Gopher-rule filter, Bloom membership,
# k-means, PQ, PCA, HLL-union, n-gram novelty, SCD-2 history,
# referential-audit, TF-IDF, and epoch-shuffle operators — every NEW gate
# gets a driver row this round, keeping the all-queries-driver-green
# union invariant); (c) 2 of the 4 queries whose ENGINE or shape
# materially changed this round (time-travel scans reroute to quiverjvm
# under quiver_relation's engine="auto", and the decontamination
# eval-cap fix; quiver_incremental_scan and quiver_merge_schemas_scan
# yield their slots to new gates — the incremental path is covered by
# the (b) quiverjvm_cdc_scan gate + the CDC-stamping pins, and the
# merge-schemas routing by this session's JVM merge/mixed-engine pytest
# pins). 31+17+2 = 50; position 51+ falls back to registry order.
_PRIORITY = [
    # (a) the 31 round-9-stale rows
    "arrow_ipc_merge_scan",
    "asof_join_events_orders",
    "correlated_small_quantity",
    "dedup_chunk_exact",
    "dedup_exact_docs",
    "dedup_minhash_pairs",
    "dedup_ngram_jaccard",
    "dedup_simhash_pairs",
    "dedup_winnow_pairs",
    "embedding_dim_stats",
    "embedding_near_dup",
    "events_funnel_steps",
    "events_interval_join",
    "events_latest_per_user",
    "events_locf_impute",
    "events_moving_avg_24h",
    "events_retention_cohorts",
    "hypertable_rollup",
    "multimodal_decode_features",
    "pipeline_corpus_summary",
    "q1_pricing_summary",
    "q7_nation_volume",
    "range_join_user_bursts",
    "sample_temperature_mix",
    "sketch_count_min",
    "sketch_histogram_quantiles",
    "text_token_bpe",
    "text_winnow_fingerprints",
    "udtf_token_explode",
    "window_distribution_funcs",
    "window_range_frame",
    # (b) new round-13 gates
    "quiverjvm_time_travel_scan",
    "quiverjvm_cdc_scan",
    "quiverjvm_sql_catalog_table",
    "quiverjvm_stream_scan",
    "text_source_kl_divergence",
    "quiverjvm_stream_sink_scan",
    "text_gopher_quality_filter",
    "sketch_bloom_membership",
    "embedding_kmeans_clusters",
    "ann_pq_topk",
    "embedding_pca_power_iteration",
    "sketch_hll_union",
    "text_ngram_novelty",
    "events_scd2_history",
    "dq_referential_audit",
    "text_tfidf_topk",
    "pipeline_epoch_shuffle_plan",
    # (c) materially changed this round (semantic-option routing; the
    # decontamination eval slice gained its fixed cap — the x10 sweep
    # caught eval-scaling quadratic work)
    "quiver_time_travel_scan",
    "decontaminate_embedding_overlap",
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
