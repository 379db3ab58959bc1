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
# Round 17 window (50), per the round-16 verdict's item 1 and the rotation
# contract's clause (b) "queries whose ENGINE or SHAPE materially changed
# this round" — REAPPLIED AT ROUND CLOSE, after the optimization work, so
# the window covers what actually changed:
# (a) the 24 round-16-rewritten queries that had no driver sf0.01 row yet
#     (the r16 window was authored before those rewrites landed); most of
#     this round's changes overlap this set (minhash/simhash/ngram pair
#     streaming, spread front ends, canonical/clusters front-end effects),
#     so clause (b) coverage rides along;
# (b) the 12 remaining queries whose engine or shape materially changed in
#     round 17 and are not already in (a): the three SemDeDup variants
#     (streamed per-bucket pair scorer), the vectorized
#     gopher/tfidf/lang_id/token_budget stats, the span-excision dup
#     aggregate, the stream-scan state-partition sizing, and the three
#     spread JVM passes (DSIR, PII scrub, moment aggregation);
# (c) the first 14 of the 25 r12-stale rows promised to head this window
#     (simple scan/relational/scalar rows, pytest-parity every round).
# 24+12+14 = 50; position 51+ falls back to registry order. Deferred to
# round 18 (r12-stale remainder; the last two already carry round-16
# driver-green rows): scalar_math_funcs, scalar_string_funcs,
# scalar_subquery_above_avg, setop_union_counts, text_bigram_topk,
# text_type_token_ratio, text_zipf_slope, topk_orders,
# unpivot_lineitem_metrics, approx_distinct_parts, text_repetition_stats.
_PRIORITY = [
    # (a) the 24 round-16 rewrites awaiting a driver sf0.01 row
    "dedup_minhash_signature",
    "dedup_minhash_pairs",
    "dedup_clusters",
    "dedup_canonical_docs",
    "dedup_simhash",
    "dedup_simhash_pairs",
    "dedup_ngram_jaccard",
    "dedup_winnow_pairs",
    "text_winnow_fingerprints",
    "text_char_lm_score",
    "decontaminate_eval_overlap",
    "decontaminate_embedding_overlap",
    "embedding_kmeans_clusters",
    "embedding_kmeans_cosine",
    "embedding_pca_power_iteration",
    "embedding_pca_top2_deflation",
    "ann_ivf_topk",
    "ann_pq_topk",
    "ann_ivf_pq_topk",
    "ann_pq_trained_topk",
    "ann_lsh_buckets",
    "ann_lsh_bucketed_pairs",
    "embedding_near_dup",
    "quiver_snapshot_diff",
    # (b) round-17 engine/shape changes not already above
    "dedup_semantic_semdedup",
    "dedup_semantic_semdedup_cos",
    "dedup_semantic_semdedup_collapsed",
    "text_gopher_quality_filter",
    "text_tfidf_topk",
    "text_lang_id",
    "sample_token_budget",
    "dedup_span_excision",
    "quiverjvm_stream_scan",
    "sample_dsir_weights",
    "text_pii_scrub",
    "agg_stats_moments",
    # (c) 14 of the 25 promised r12-stale rows
    "pipeline_mixture_weights",
    "quiver_scan_bools",
    "quiver_scan_decimals",
    "quiver_scan_delta",
    "quiver_scan_documents",
    "quiver_scan_embeddings",
    "quiver_scan_freq",
    "quiver_scan_nested_types",
    "quiver_scan_uints",
    "quiver_sql_view_agg",
    "sample_per_source_topk",
    "sample_stratified_docs",
    "scalar_date_funcs",
    "scalar_map_funcs",
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
