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


def _collapsed_recall(spark, fixture: str, factor: int) -> int:
    """Weighted kept-pair recall of the COLLAPSED operator (round 16):
    identical vectors collapse to (rep, weight) before clustering, so
    every identity pair (C(w,2) per rep — the bulk of a duplicate-heavy
    corpus) is kept closed-form regardless of subsharding; the cap's
    loss applies only to cross-rep pairs, and sem_auto_k keeps distinct
    clusters near SEM_TARGET. Audits ALL clusters (the distinct corpus
    is small by construction)."""
    from pyspark.sql import functions as F

    from quiver_spark.functions import int_dot
    from quiver_spark.operators.pipeline9 import (
        SEM_CAP_D,
        SEM_TAU,
        _l2_seed_assign,
        sem_auto_k,
    )
    from quiver_spark.operators.similarity2 import _int_corpus

    reps = (
        _int_corpus(spark, fixture)
        .groupBy("iv")
        .agg(F.min("vec_id").alias("vec_id"), F.count(F.lit(1)).alias("w"))
        .withColumn("nrm", int_dot("iv", "iv"))
        .select("vec_id", "iv", "nrm", "w")
        .localCheckpoint(eager=False)
    )
    n_distinct = reps.count()
    k = sem_auto_k(n_distinct)
    assign = _l2_seed_assign(reps, k).localCheckpoint(eager=False)
    sizes = (
        assign.groupBy("cid")
        .agg(F.count(F.lit(1)).alias("szd"))
        .withColumn(
            "nsub",
            F.expr(f"CAST((szd + {SEM_CAP_D - 1}) DIV {SEM_CAP_D} AS BIGINT)"),
        )
    )
    ident = assign.agg(
        F.sum(F.expr("w * (w - 1) DIV 2")).alias("s")
    ).collect()[0]["s"] or 0
    sub = assign.join(F.broadcast(sizes), "cid").select(
        "cid", "vec_id", "iv", "nrm", "w",
        (
            F.conv(
                F.substring(F.md5(F.col("vec_id").cast("string")), 1, 8),
                16, 10,
            ).cast("bigint") % F.col("nsub")
        ).alias("subk"),
    ).localCheckpoint(eager=False)
    a = sub.select(
        "cid", "subk", F.col("vec_id").alias("va"),
        F.col("iv").alias("iva"), F.col("nrm").alias("na"),
        F.col("w").alias("wa"),
    )
    b = sub.select(
        "cid", "subk", F.col("vec_id").alias("vb"),
        F.col("iv").alias("ivb"), F.col("nrm").alias("nb"),
        F.col("w").alias("wb"),
    )
    cosv = int_dot("iva", "ivb").cast("double") / (
        F.sqrt(F.col("na").cast("double"))
        * F.sqrt(F.col("nb").cast("double"))
    )

    def dup_weight(joined):
        r = (
            joined.filter(F.col("va") < F.col("vb"))
            .filter(cosv >= SEM_TAU)
            .agg(F.sum(F.col("wa") * F.col("wb")).alias("s"))
            .collect()[0]["s"]
        )
        return r or 0

    tot_cross = dup_weight(a.drop("subk").join(b.drop("subk"), ["cid"]))
    kept_cross = dup_weight(a.join(b, ["cid", "subk"]))
    total = ident + tot_cross
    kept = ident + kept_cross
    out = {
        "factor": factor,
        "mode": "collapsed",
        "n_distinct": n_distinct,
        "auto_k": k,
        "dup_pairs_identity_weighted": int(ident),
        "dup_pairs_cross_unblocked_weighted": int(tot_cross),
        "dup_pairs_cross_kept_weighted": int(kept_cross),
        "dup_pairs_unblocked": int(total),
        "dup_pairs_kept": int(kept),
        "recall": round(kept / total, 4) if total else None,
    }
    print(json.dumps(out))
    return 0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=100)
    ap.add_argument("--clusters", type=int, default=3,
                    help="largest over-cap clusters to audit")
    ap.add_argument("--collapsed", action="store_true",
                    help="audit the exact-collapsed operator (weighted)")
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

    if args.collapsed:
        return _collapsed_recall(spark, fixture, args.factor)

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
