"""SemDeDup subshard-cap recall — measure the documented trade.

`dedup_semantic_semdedup` bounds the within-cluster quadratic by
md5-subsharding clusters beyond SEM_CAP vectors; pairs ACROSS subshards
of the same cluster are never compared. This script makes that trade a
NUMBER instead of an assertion (round 15, VERDICT r14 Next #5): on a
sampled slice — the N largest over-cap clusters of the scaled fixture —
it computes every true duplicate pair (the unblocked oracle) and the
pairs the subsharded blocking keeps, and reports kept-pair recall.

Usage:
    PYTHONPATH=/root/repo python examples/semdedup_recall.py \
        --factor 100 --clusters 3

The unblocked slice join is O(sum sz^2) — bounded by limiting the slice
to --clusters clusters, exactly how a production recall audit would
sample. Random md5 subsharding predicts recall ≈ 1/nsub per cluster
(each pair's two sides land in the same subshard with p = 1/nsub); the
measurement validates that model on real data.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=100)
    ap.add_argument("--clusters", type=int, default=3,
                    help="largest over-cap clusters to audit")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from examples.decade_sweep import build_fixture
    from quiver_spark.operators.pipeline9 import (
        SEM_CAP,
        SEM_TAU,
        _sem_assign_l2,
    )
    from quiver_spark.functions import int_dot
    from quiver_spark.session import get_spark

    spark = get_spark("semdedup-recall")
    fixture = build_fixture(spark, args.factor)
    print(f"fixture: {fixture}", file=sys.stderr)

    assign = _sem_assign_l2(spark, fixture).localCheckpoint(eager=False)
    sizes = (
        assign.groupBy("cid")
        .agg(F.count(F.lit(1)).alias("sz"))
        .filter(F.col("sz") > SEM_CAP)
        .orderBy(F.desc("sz"), F.asc("cid"))
        .limit(args.clusters)
        .withColumn(
            "nsub",
            F.expr(f"CAST((sz + {SEM_CAP - 1}) DIV {SEM_CAP} AS BIGINT)"),
        )
    )
    picked = sizes.collect()
    sl = assign.join(F.broadcast(sizes), "cid").select(
        "cid", "vec_id", "iv", "nrm", "nsub",
        (
            F.conv(
                F.substring(F.md5(F.col("vec_id").cast("string")), 1, 8),
                16, 10,
            ).cast("bigint") % F.col("nsub")
        ).alias("subk"),
    ).localCheckpoint(eager=False)

    a = sl.select(
        "cid", "subk",
        F.col("vec_id").alias("va"), F.col("iv").alias("iva"),
        F.col("nrm").alias("na"),
    )
    b = sl.select(
        "cid", "subk",
        F.col("vec_id").alias("vb"), F.col("iv").alias("ivb"),
        F.col("nrm").alias("nb"),
    )
    cosv = int_dot("iva", "ivb").cast("double") / (
        F.sqrt(F.col("na").cast("double"))
        * F.sqrt(F.col("nb").cast("double"))
    )

    def dup_pairs_by_cluster(joined):
        rows = (
            joined.filter(F.col("va") < F.col("vb"))
            .filter(cosv >= SEM_TAU)
            .groupBy("cid")
            .count()
            .collect()
        )
        return {r.cid: r["count"] for r in rows}

    tot_by = dup_pairs_by_cluster(a.drop("subk").join(b.drop("subk"), ["cid"]))
    kept_by = dup_pairs_by_cluster(a.join(b, ["cid", "subk"]))
    total = sum(tot_by.values())
    kept = sum(kept_by.values())
    # the 1/nsub model, weighted by each cluster's TRUE pair count so it
    # is comparable with the pair-weighted measured recall (an unweighted
    # mean of 1/nsub would misstate the model whenever cluster sizes
    # differ — round-15 self-review finding)
    predicted = (
        sum(tot_by.get(r.cid, 0) / r.nsub for r in picked) / total
        if total
        else None
    )
    out = {
        "factor": args.factor,
        "clusters": [
            {
                "cid": r.cid,
                "sz": r.sz,
                "nsub": r.nsub,
                "pairs": tot_by.get(r.cid, 0),
                "kept": kept_by.get(r.cid, 0),
            }
            for r in picked
        ],
        "dup_pairs_unblocked": total,
        "dup_pairs_kept": kept,
        "recall": round(kept / total, 4) if total else None,
        "predicted_recall_weighted_1_over_nsub": (
            round(predicted, 4) if predicted is not None else None
        ),
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
