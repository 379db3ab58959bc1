#!/usr/bin/env python
"""End-to-end LLM-training-data pipeline demo on the bundled testdata.

Run:  python examples/pipeline_demo.py [sf_dir]

Walks the corpus-preparation flow a data team would run before training:
quality screening -> near-duplicate discovery -> canonical-doc selection
-> token-budget selection -> sequence-packing accounting — each step one
registered, oracle-checked operator from quiver_spark.registry, composed
here exactly the way a user would compose them.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = (
        SparkSession.builder.master("local[4]")
        .appName("quiver-pipeline-demo")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    import quiver_spark

    quiver_spark.enable(spark)
    from quiver_spark.registry import load_all_operators

    q = load_all_operators()

    def run(name: str):
        return q[name].spark(spark, sf_dir)

    print("== 1. quality screen (per-language corpus stats) ==")
    run("text_quality_stats").orderBy("lang").show(10, truncate=False)

    print("== 2. near-duplicate pairs (MinHash-LSH, bounded fan-out) ==")
    pairs = run("dedup_minhash_pairs")
    print(f"candidate near-dup pairs: {pairs.count()}")

    print("== 3. canonical doc per duplicate cluster ==")
    run("dedup_canonical_docs").orderBy("cluster_id").show(10)

    print("== 4. token-budget selection (best 25% of tokens, no global sort) ==")
    sel = run("sample_token_budget").orderBy("bucket", ascending=False)
    sel.show(10)
    row = sel.groupBy().sum("tokens_total", "tokens_kept").collect()[0]
    print(f"kept {row[1]:,} of {row[0]:,} tokens")

    print("== 5. sequence-packing accounting (2048-token packs) ==")
    packs = run("pipeline_pack_sequences")
    packs.groupBy().sum("n_docs", "total_tokens", "n_packs").show()

    spark.stop()


if __name__ == "__main__":
    main()
