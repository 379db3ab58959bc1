"""Round-14 LLM-pipeline operators: data-selection / importance weighting.

``sample_dsir_weights`` re-expresses DSIR (Data Selection via Importance
Resampling, Xie et al. 2023, arXiv:2302.03169) in pure DataFrame algebra:
hashed n-gram features, a target-vs-raw bucket model, and per-document
log-likelihood-ratio importance weights — the standard public recipe for
"pick the 10% of a web crawl that looks like the target domain" at
pretraining scale.

Determinism (the driver hash-compares): the bucket model's log-ratios are
computed on IDENTICAL double operands in both engines (one literal
formula, one ln, one multiply, one ROUND) and QUANTIZED to micro-nat
BIGINTs; every document weight is then an exact integer sum of bucket
scores, so no float addition order can smear the hash.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from quiver_spark.registry import register
from quiver_spark.tables import load

# --------------------------------------------------------------------------
# DSIR importance weights (hashed-feature log-likelihood ratios)
# --------------------------------------------------------------------------

DSIR_BUCKETS = 128  #: hashed unigram feature space (production: 10k+)
DSIR_TARGET_LANG = "en"  #: the "target domain": English documents
DSIR_SCALE = 1_000_000  #: log-ratio quantization (micro-nats, exact ints)

_DSIR_BKT_SQL = (
    f"(('0x' || substr(md5(tok), 1, 8))::BIGINT % {DSIR_BUCKETS})"
)
#: one literal smoothing formula, identical in both engines: IEEE ops on
#: identical operands → identical doubles → identical quantization.
#: `1e0`-style literals, NOT `1.0` — Spark parses `1.0` as DECIMAL(2,1)
#: and the whole ratio then runs under decimal division/rounding rules
#: (measured ~1e-5 relative drift vs DuckDB's plan); `1e0` is DOUBLE in
#: both engines, keeping the arithmetic pure IEEE
_DSIR_LR = (
    "LN(((ct + 1e0) / (t + {B}e0)) / ((cr + 1e0) / (r + {B}e0)))"
    " * {S}"
)


@register(
    "sample_dsir_weights",
    oracle=f"""
WITH toks AS (
    SELECT doc_id, lang, unnest(list_filter(
        regexp_split_to_array(text, '\\s+'), x -> x <> '')) AS tok
    FROM documents
),
b AS (
    SELECT doc_id, lang, {_DSIR_BKT_SQL} AS bkt FROM toks
),
model AS (
    SELECT bkt,
           COUNT(*) AS cr,
           SUM(CASE WHEN lang = '{DSIR_TARGET_LANG}' THEN 1 ELSE 0 END) AS ct
    FROM b GROUP BY bkt
),
tot AS (SELECT SUM(cr) AS r, SUM(ct) AS t FROM model),
lr AS (
    SELECT m.bkt,
           CAST(ROUND({_DSIR_LR.format(B=DSIR_BUCKETS, S=DSIR_SCALE)})
                AS BIGINT) AS lrq
    FROM model m, tot
),
perdoc AS (
    SELECT b.doc_id, SUM(l.lrq) AS w
    FROM b JOIN lr l ON b.bkt = l.bkt
    GROUP BY b.doc_id
),
scored AS (
    SELECT d.doc_id, d.source, d.n_chars, COALESCE(p.w, 0) AS w
    FROM documents d LEFT JOIN perdoc p ON d.doc_id = p.doc_id
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN w > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_selected,
       CAST(SUM(CASE WHEN w > 0 THEN n_chars ELSE 0 END) AS BIGINT)
           AS selected_chars,
       CAST(SUM(w) AS BIGINT) AS weight_sum,
       CAST(MAX(w) AS BIGINT) AS max_weight
FROM scored
GROUP BY source
""",
    tags=("sampling", "dsir", "importance", "pipeline", "training"),
)
def sample_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weighting (Xie et al. 2023): score every document
    by how much more likely its hashed-unigram features are under the
    TARGET distribution ({DSIR_TARGET_LANG}-language docs) than under the
    RAW corpus, and report the per-source selection funnel for the
    weight>0 resampling rule. This is the data-selection step between
    dedup and mixture weighting in a pretraining pipeline: cheap hashed
    features, no trained classifier, corpus-scale.

    Plan shape (100 TB posture): ONE corpus token shuffle builds the
    {DSIR_BUCKETS}-bucket model ({DSIR_BUCKETS} keys, map-side combined —
    target and raw counts in the same pass via a conditional sum); the
    model's quantized log-ratios collapse into ONE broadcast map row, and
    every document then scores MAP-SIDE by folding its token array over
    the map — an exact BIGINT sum, no second corpus shuffle, no window,
    no join against corpus-scale relations. The final per-source rollup
    is a ~20-key aggregate. Zero-token docs carry weight 0 (counted, not
    selected — the LEFT JOIN in the oracle)."""
    from quiver_spark.tables import spread

    # round 17: spread the single-split gate-SF scan across cores before
    # the two md5-heavy JVM passes (explode model build + scoring fold —
    # guide §2.5); every aggregate downstream is an exact bigint sum, so
    # the result is partition-invariant
    docs = spread(
        load(spark, sf_dir, "documents"), spark, sf_dir, "documents"
    )
    toks = docs.select(
        "lang",
        F.explode(
            F.expr("filter(split(text, '\\\\s+'), x -> x <> '')")
        ).alias("tok"),
    )
    bkt = (
        F.conv(F.substring(F.md5("tok"), 1, 8), 16, 10).cast("bigint")
        % DSIR_BUCKETS
    )
    model = (
        toks.select(bkt.alias("bkt"), "lang")
        .groupBy("bkt")
        .agg(
            F.count(F.lit(1)).alias("cr"),
            F.sum(
                F.when(F.col("lang") == DSIR_TARGET_LANG, 1).otherwise(0)
            ).alias("ct"),
        )
        # ≤ DSIR_BUCKETS rows; three consumers (totals + the map) — the
        # checkpoint computes the corpus aggregate exactly once
        .localCheckpoint(eager=False)
    )
    tot = model.agg(
        F.sum("cr").alias("r"), F.sum("ct").alias("t")
    )
    lr = model.crossJoin(F.broadcast(tot)).select(
        "bkt",
        F.round(
            F.expr(_DSIR_LR.format(B=DSIR_BUCKETS, S=DSIR_SCALE))
        )
        .cast("bigint")
        .alias("lrq"),
    )
    # the whole model as ONE broadcast map row
    lrmap = lr.agg(
        F.map_from_entries(
            F.expr("sort_array(collect_list(struct(bkt, lrq)))")
        ).alias("m")
    )
    fold = f"""
    aggregate(
        filter(split(text, '\\\\s+'), x -> x <> ''),
        CAST(0 AS BIGINT),
        (acc, tok) -> acc + element_at(
            m, CAST(conv(substring(md5(tok), 1, 8), 16, 10) AS BIGINT)
               % {DSIR_BUCKETS}))
    """
    scored = docs.crossJoin(F.broadcast(lrmap)).select(
        "source",
        "n_chars",
        F.expr(fold).alias("w"),
    )
    return scored.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.when(F.col("w") > 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_selected"),
        F.sum(F.when(F.col("w") > 0, F.col("n_chars")).otherwise(0))
        .cast("bigint")
        .alias("selected_chars"),
        F.sum("w").cast("bigint").alias("weight_sum"),
        F.max("w").cast("bigint").alias("max_weight"),
    )


# --------------------------------------------------------------------------
# IVF-PQ: coarse lists + residual product quantization (the serving path)
# --------------------------------------------------------------------------


def _ivfpq_oracle() -> str:
    from quiver_spark.operators.similarity import (
        N_CENTROIDS,
        N_PROBE_LISTS,
        N_PROBES,
        SQL_IV,
        TOP_K,
    )
    from quiver_spark.operators.similarity2 import PQ_K, PQ_M, PQ_SUB

    return f"""
WITH iv AS ({SQL_IV}),
cent_ids AS (
    SELECT vec_id AS cid FROM embeddings
    WHERE vec_id >= {N_PROBES} ORDER BY vec_id LIMIT {N_CENTROIDS}
),
cent AS (
    SELECT c.cid, iv.i, iv.xi FROM iv JOIN cent_ids c ON iv.vec_id = c.cid
),
ad AS (
    SELECT iv.vec_id, c.cid, SUM((iv.xi - c.xi) * (iv.xi - c.xi)) AS d2
    FROM iv JOIN cent c ON iv.i = c.i
    WHERE iv.vec_id >= {N_PROBES}
    GROUP BY 1, 2
),
assign AS (
    SELECT vec_id, cid FROM (
        SELECT vec_id, cid,
               ROW_NUMBER() OVER (
                   PARTITION BY vec_id ORDER BY d2, cid) AS r
        FROM ad
    ) WHERE r = 1
),
rv AS (
    SELECT iv.vec_id, a.cid, iv.i, iv.xi - c.xi AS ri
    FROM iv
    JOIN assign a ON iv.vec_id = a.vec_id
    JOIN cent c ON a.cid = c.cid AND iv.i = c.i
),
donor_ids AS (
    SELECT vec_id FROM embeddings
    WHERE vec_id >= {N_PROBES} ORDER BY vec_id LIMIT {PQ_K}
),
cw AS (
    SELECT r.vec_id AS dcid, (r.i - 1) // {PQ_SUB} AS m,
           (r.i - 1) % {PQ_SUB} AS si, r.ri AS ci
    FROM rv r JOIN donor_ids d ON r.vec_id = d.vec_id
),
rsub AS (
    SELECT vec_id, cid, (i - 1) // {PQ_SUB} AS m, (i - 1) % {PQ_SUB} AS si, ri
    FROM rv
),
cd2 AS (
    SELECT s.vec_id, s.cid, s.m, w.dcid,
           SUM((s.ri - w.ci) * (s.ri - w.ci)) AS d2
    FROM rsub s JOIN cw w ON s.m = w.m AND s.si = w.si
    GROUP BY 1, 2, 3, 4
),
codes AS (
    SELECT vec_id, cid, m, dcid FROM (
        SELECT vec_id, cid, m, dcid,
               ROW_NUMBER() OVER (
                   PARTITION BY vec_id, m ORDER BY d2, dcid) AS r
        FROM cd2
    ) WHERE r = 1
),
q AS (SELECT vec_id AS qid, i, xi FROM iv WHERE vec_id < {N_PROBES}),
qd2 AS (
    SELECT q.qid, c.cid, SUM((q.xi - c.xi) * (q.xi - c.xi)) AS d2
    FROM q JOIN cent c ON q.i = c.i
    GROUP BY 1, 2
),
probes AS (
    SELECT qid, cid FROM (
        SELECT qid, cid,
               ROW_NUMBER() OVER (
                   PARTITION BY qid ORDER BY d2, cid) AS r
        FROM qd2
    ) WHERE r <= {N_PROBE_LISTS}
),
base AS (
    SELECT q.qid, c.cid, SUM(q.xi * c.xi) AS idot
    FROM q JOIN cent c ON q.i = c.i
    GROUP BY 1, 2
),
adc AS (
    SELECT q.qid, w.m, w.dcid, SUM(q.xi * w.ci) AS idot
    FROM q JOIN cw w
      ON (q.i - 1) // {PQ_SUB} = w.m AND (q.i - 1) % {PQ_SUB} = w.si
    GROUP BY 1, 2, 3
),
scores AS (
    SELECT p.qid, k.vec_id,
           ANY_VALUE(b.idot) + SUM(a.idot) AS s
    FROM codes k
    JOIN probes p ON k.cid = p.cid
    JOIN base b ON b.qid = p.qid AND b.cid = p.cid
    JOIN adc a ON a.qid = p.qid AND a.m = k.m AND a.dcid = k.dcid
    GROUP BY 1, 2
),
ranked AS (
    SELECT qid, vec_id, CAST(s AS DOUBLE) AS adc_dot,
           ROW_NUMBER() OVER (
               PARTITION BY qid ORDER BY s DESC, vec_id) AS rnk
    FROM scores
)
SELECT qid, vec_id, adc_dot, rnk FROM ranked WHERE rnk <= {TOP_K}
"""


@register(
    "ann_ivf_pq_topk",
    oracle=_ivfpq_oracle(),
    tags=("similarity", "ann", "ivf", "pq", "quantization"),
)
def ann_ivf_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ — the composition real vector-search engines serve from
    (FAISS IndexIVFPQ): a coarse quantizer partitions the corpus into
    inverted lists, every vector's RESIDUAL (vector − its coarse
    centroid) is product-quantized, and a query (a) probes only its
    nprobe nearest lists, (b) reconstructs approximate inner products as
    dot(q, centroid) + Σ_m ADC-lookup(q_m, codeword) — touching codes,
    never corpus vectors. Completes the quantization family: coarse
    (ann_ivf_topk) × fine (ann_pq_topk / ann_pq_trained_topk) composed.

    Plan shape (round 16, guide §4.2 + §2.3): centroids, the donor
    residual codebook, probe lists, base dots and ADC tables are all
    driver-built exact-int tables (metadata scale) shipped by broadcast
    variable into ONE vectorized corpus pass — coarse-assign, residual,
    PQ-encode, probed-list mask, ADC score and per-batch top-k per
    query, emitting only candidate rows. No corpus-scale (qid, vec_id)
    aggregate, no interpreted per-row folds; the only exchange left is
    the tiny candidate window."""
    import numpy as np

    from pyspark.sql import Window
    from pyspark.sql.types import LongType, StructField, StructType

    from quiver_spark.operators.similarity import (
        N_CENTROIDS,
        N_PROBE_LISTS,
        N_PROBES,
        TOP_K,
    )
    from quiver_spark.operators.similarity2 import (
        PQ_K,
        PQ_M,
        PQ_SUB,
        _batch_topk,
        _int_corpus,
        _list_matrix,
        _seed_probe_np,
    )

    emb = _int_corpus(spark, sf_dir)
    corpus = emb.filter(F.col("vec_id") >= N_PROBES)
    # ONE TakeOrdered pass serves probes, centroids AND donors (the 16
    # lowest non-probe ids are both, N_CENTROIDS == PQ_K)
    qids, Q, _, S = _seed_probe_np(emb, N_PROBES, max(N_CENTROIDS, PQ_K))
    C = S[:N_CENTROIDS]  # coarse centroids, cid-ascending
    cn = (C * C).sum(axis=1)

    def coarse(X):
        """Exact-int argmin to the coarse centroids (lowest-cid ties)."""
        d2 = (X * X).sum(axis=1)[:, None] + cn[None, :] - 2 * (X @ C.T)
        return np.argmin(d2, axis=1)

    # donor residuals → per-subspace codebooks (dcid-ascending)
    D = S[:PQ_K]
    RV = D - C[coarse(D)]
    CB = [RV[:, m * PQ_SUB : (m + 1) * PQ_SUB] for m in range(PQ_M)]
    # probes: nprobe nearest lists per query by exact d2 (ties lowest
    # cid) + the base dot(q, centroid) term
    nq = len(qids)
    qd2 = (Q * Q).sum(axis=1)[:, None] + cn[None, :] - 2 * (Q @ C.T)
    base = Q @ C.T  # exact int dots
    probe_mask = np.zeros((nq, N_CENTROIDS), dtype=bool)
    for j in range(nq):
        order = np.lexsort((np.arange(N_CENTROIDS), qd2[j]))
        probe_mask[j, order[:N_PROBE_LISTS]] = True
    ADC = [
        Q[:, m * PQ_SUB : (m + 1) * PQ_SUB] @ CB[m].T for m in range(PQ_M)
    ]

    bc = spark.sparkContext.broadcast(
        (C, cn, CB, ADC, qids, probe_mask, base)
    )
    schema = StructType(
        [
            StructField("qid", LongType(), False),
            StructField("vec_id", LongType(), False),
            StructField("s", LongType(), False),
        ]
    )

    def fn(batches):
        import numpy as np
        import pyarrow as pa

        C_, cn_, CB_, ADC_, qids_, pm_, base_ = bc.value
        M = len(CB_)
        SUB = CB_[0].shape[1]
        for batch in batches:
            n = batch.num_rows
            if n == 0:
                continue
            vids = np.asarray(batch.column(0)).astype(np.int64, copy=False)
            X = _list_matrix(batch.column(1), n)
            d2 = (
                (X * X).sum(axis=1)[:, None] + cn_[None, :] - 2 * (X @ C_.T)
            )
            cidx = np.argmin(d2, axis=1)
            R = X - C_[cidx]
            Sc = np.zeros((len(qids_), n), dtype=np.int64)
            for m in range(M):
                Rm = R[:, m * SUB : (m + 1) * SUB]
                kn = (CB_[m] * CB_[m]).sum(axis=1)
                rd2 = (
                    (Rm * Rm).sum(axis=1)[:, None]
                    + kn[None, :]
                    - 2 * (Rm @ CB_[m].T)
                )
                code = np.argmin(rd2, axis=1)
                Sc += ADC_[m][:, code]
            Sc += base_[:, cidx]
            outs = []
            for j in range(len(qids_)):
                mask = pm_[j, cidx]
                if not mask.any():
                    continue
                oq, ov, os_ = _batch_topk(
                    vids[mask], Sc[j][mask][None, :], qids_[j : j + 1], TOP_K
                )
                outs.append((oq, ov, os_))
            if not outs:
                continue
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(np.concatenate([o[i] for o in outs]))
                    for i in range(3)
                ],
                names=["qid", "vec_id", "s"],
            )

    cand = corpus.select("vec_id", "iv").mapInArrow(fn, schema)
    wr = Window.partitionBy("qid").orderBy(F.desc("s"), F.asc("vec_id"))
    return (
        cand.withColumn("rnk", F.row_number().over(wr))
        .filter(F.col("rnk") <= TOP_K)
        .select(
            "qid", "vec_id", F.col("s").cast("double").alias("adc_dot"), "rnk"
        )
    )

# --------------------------------------------------------------------------
# Mixture schedule: weights → an exact integer per-epoch allocation
# --------------------------------------------------------------------------

MIX_BUDGET = 1000  #: documents drawn per epoch across all sources
MIX_SCALE = 1_000_000  #: sqrt-weight quantization (exact-integer seats)


@register(
    "pipeline_mixture_schedule",
    oracle=f"""
WITH counts AS (
    SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source
),
sq AS (
    SELECT source, n_docs,
           CAST(ROUND(SQRT(CAST(n_docs AS DOUBLE)) * {MIX_SCALE}) AS BIGINT)
               AS s
    FROM counts
),
d AS (SELECT SUM(s) AS den FROM sq),
q AS (
    SELECT sq.source, sq.n_docs, sq.s, d.den,
           (sq.s * {MIX_BUDGET}) // d.den AS base_quota,
           (sq.s * {MIX_BUDGET}) % d.den AS rem
    FROM sq, d
),
tot AS (SELECT SUM(base_quota) AS assigned FROM q),
r AS (
    SELECT q.*, tot.assigned,
           ROW_NUMBER() OVER (ORDER BY q.rem DESC, q.source) AS rrank
    FROM q, tot
)
SELECT source,
       CAST(n_docs AS BIGINT) AS n_docs,
       CAST(s AS DOUBLE) / CAST(den AS DOUBLE) AS weight,
       CAST(base_quota AS BIGINT) AS base_quota,
       CAST(CASE WHEN rrank <= {MIX_BUDGET} - assigned THEN 1 ELSE 0 END
            AS BIGINT) AS extra,
       CAST(base_quota + CASE WHEN rrank <= {MIX_BUDGET} - assigned
                              THEN 1 ELSE 0 END AS BIGINT) AS quota
FROM r
""",
    tags=("sampling", "mixture", "schedule", "pipeline", "training"),
)
def pipeline_mixture_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Turn mixture WEIGHTS into an exact integer per-epoch allocation —
    the step between choosing domain weights and actually drawing a
    training epoch: sqrt-scaled weights (the UniMax-style dampening of
    head sources) are apportioned over a MIX_BUDGET-document budget by
    the LARGEST-REMAINDER method, so ``SUM(quota) == MIX_BUDGET``
    exactly — reproducible across engines, reruns, and reshards.

    Determinism is PURE-INTEGER: the sqrt weight quantizes once to a
    micro-seat BIGINT (one IEEE sqrt + multiply + ROUND of identical
    operands), and from there quota = (seats × budget) div total_seats
    with the remainder ordering on exact integer modulos — no float sum
    whose order could smear a FLOOR boundary (the naive
    SUM(SQRT(...)) OVER () denominator drifts in the last ulp between
    engines). The reported ``weight`` is one exact-int division, for
    display only.

    Plan shape: ONE corpus-count shuffle (per-source, ~20 keys); every
    window/rank downstream runs over the ≤|sources| row table."""
    docs = load(spark, sf_dir, "documents")
    counts = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    from pyspark.sql import Window

    sq = counts.select(
        "source",
        "n_docs",
        F.round(F.sqrt(F.col("n_docs").cast("double")) * MIX_SCALE)
        .cast("bigint")
        .alias("s"),
    )
    den = sq.agg(F.sum("s").alias("den"))
    q = sq.crossJoin(F.broadcast(den)).select(
        "source",
        "n_docs",
        "s",
        "den",
        F.expr(f"(s * {MIX_BUDGET}) div den").alias("base_quota"),
        F.expr(f"(s * {MIX_BUDGET}) % den").alias("rem"),
    )
    wall = Window.partitionBy()
    r = q.select(
        "source",
        "n_docs",
        "s",
        "den",
        "base_quota",
        "rem",
        F.sum("base_quota").over(wall).alias("assigned"),
        F.row_number()
        .over(Window.partitionBy().orderBy(F.desc("rem"), F.asc("source")))
        .alias("rrank"),
    )
    extra = F.when(
        F.col("rrank") <= F.lit(MIX_BUDGET) - F.col("assigned"), 1
    ).otherwise(0)
    return r.select(
        "source",
        F.col("n_docs").cast("bigint").alias("n_docs"),
        (F.col("s").cast("double") / F.col("den").cast("double")).alias(
            "weight"
        ),
        F.col("base_quota").cast("bigint").alias("base_quota"),
        extra.cast("bigint").alias("extra"),
        (F.col("base_quota") + extra).cast("bigint").alias("quota"),
    )


# --------------------------------------------------------------------------
# SemDeDup: semantic deduplication via cluster-blocked cosine pairs
# --------------------------------------------------------------------------

SEM_CAP = 64  #: pairwise block bound — big clusters subshard by md5
SEM_TAU = 0.25  #: cosine near-duplicate threshold (demo-corpus scaled)
#: auto-K target mean cluster size: half the cap, so a typical cluster
#: stays under SEM_CAP and nsub stays 1 (the subshard-cap recall model
#: is recall ≈ 1/nsub — round-15 measured it exactly)
SEM_TARGET = SEM_CAP // 2
SEM_K_MIN = 8
SEM_K_MAX = 65536
#: the COLLAPSED gate's pairwise block bound, sized for DISTINCT-vector
#: space: exact-collapse removes the viral-duplicate threat (each value
#: appears once), so over-cap clusters there reflect true semantic
#: density, which auto-K already targets at SEM_TARGET — the cap only
#: guards adversarially dense regions. 32× the target mean keeps
#: realistic skewed clusters whole (nsub = 1 → recall 1, measured at
#: ×100) while still bounding a pathological cluster at ~0.5M pairs.
SEM_CAP_D = 1024


def sem_auto_k(n: int) -> int:
    """The EXECUTABLE cluster-count rule (round 16, VERDICT r15 Next #1):
    K = clamp(ceil(N / SEM_TARGET), SEM_K_MIN, SEM_K_MAX), so the mean
    cluster size tracks SEM_TARGET as the corpus grows and the
    documented "K scales with N in production" prose is code, not a
    footnote. Round-15 measured recall = 1/nsub = 0.016 at ×100 under a
    FIXED K=64 — exactly the silent loss this derivation prevents."""
    return max(SEM_K_MIN, min(SEM_K_MAX, -(-int(n) // SEM_TARGET)))


#: DuckDB twin of sem_auto_k over a COUNT(*) of the assignment corpus —
#: spliced into oracle LIMIT subqueries so both engines derive the SAME K
SEM_AUTO_K_SQL = (
    f"GREATEST({SEM_K_MIN}, LEAST({SEM_K_MAX},"
    f" CAST(CEIL(COUNT(*) / {SEM_TARGET}.0) AS BIGINT)))"
)


@register(
    "dedup_semantic_semdedup",
    oracle=f"""
WITH ivl AS (
    SELECT vec_id,
           list_transform(embedding,
               x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS iv
    FROM embeddings
),
n AS (
    SELECT vec_id, iv,
           CAST(list_dot_product(iv, iv) AS DOUBLE) AS nrm
    FROM ivl
),
cent AS (
    SELECT vec_id AS cid, iv AS cv,
           CAST(list_dot_product(iv, iv) AS DOUBLE) AS cnrm
    FROM ivl
    WHERE vec_id IN (SELECT vec_id FROM embeddings
                     ORDER BY vec_id
                     LIMIT (SELECT {SEM_AUTO_K_SQL} FROM embeddings))
),
routers AS (
    SELECT cid AS rid, cv AS rv, cnrm AS rnrm FROM cent
    ORDER BY cid
    LIMIT (SELECT CAST(CEIL(SQRT(COUNT(*))) AS BIGINT) FROM cent)
),
sgrp AS (
    SELECT cid, cv, cnrm, rid AS g FROM (
        SELECT c.cid, c.cv, c.cnrm, r.rid,
               ROW_NUMBER() OVER (
                   PARTITION BY c.cid
                   ORDER BY c.cnrm + r.rnrm
                         - 2 * CAST(list_dot_product(c.cv, r.rv) AS DOUBLE),
                       r.rid) AS rr
        FROM cent c CROSS JOIN routers r
    ) WHERE rr = 1
),
rowr AS (
    SELECT vec_id, g FROM (
        SELECT n.vec_id, r.rid AS g,
               ROW_NUMBER() OVER (
                   PARTITION BY n.vec_id
                   ORDER BY n.nrm + r.rnrm
                         - 2 * CAST(list_dot_product(n.iv, r.rv) AS DOUBLE),
                       r.rid) AS rr
        FROM n CROSS JOIN routers r
    ) WHERE rr = 1
),
assign AS (
    SELECT vec_id, cid FROM (
        SELECT n.vec_id, s.cid,
               ROW_NUMBER() OVER (
                   PARTITION BY n.vec_id
                   ORDER BY n.nrm + s.cnrm
                         - 2 * CAST(list_dot_product(n.iv, s.cv) AS DOUBLE),
                       s.cid) AS rr
        FROM n
        JOIN rowr ON n.vec_id = rowr.vec_id
        JOIN sgrp s ON s.g = rowr.g
    ) WHERE rr = 1
),
sizes AS (
    SELECT cid, COUNT(*) AS sz, (COUNT(*) + {SEM_CAP - 1}) // {SEM_CAP} AS nsub
    FROM assign GROUP BY cid
),
sub AS (
    SELECT a.vec_id, a.cid, s.nsub,
           (('0x' || substr(md5(CAST(a.vec_id AS VARCHAR)), 1, 8))::BIGINT
               % s.nsub) AS subk
    FROM assign a JOIN sizes s ON a.cid = s.cid
),
pairs AS (
    SELECT a.cid, a.vec_id AS va, b.vec_id AS vb
    FROM sub a JOIN sub b
      ON a.cid = b.cid AND a.subk = b.subk AND a.vec_id < b.vec_id
),
scored AS (
    SELECT p.cid, p.va, p.vb,
           CAST(list_dot_product(na.iv, nb.iv) AS DOUBLE)
               / (SQRT(na.nrm) * SQRT(nb.nrm)) AS cosv
    FROM pairs p
    JOIN n na ON p.va = na.vec_id
    JOIN n nb ON p.vb = nb.vec_id
),
agg AS (
    SELECT cid,
           COUNT(*) AS pairs_checked,
           SUM(CASE WHEN cosv >= {SEM_TAU} THEN 1 ELSE 0 END) AS n_dups,
           COUNT(DISTINCT CASE WHEN cosv >= {SEM_TAU} THEN vb END)
               AS n_dropped
    FROM scored GROUP BY cid
)
SELECT s.cid,
       CAST(s.sz AS BIGINT) AS n_vecs,
       CAST(s.nsub AS BIGINT) AS n_subshards,
       CAST(1.0 / s.nsub AS DOUBLE) AS predicted_recall,
       CAST(COALESCE(a.pairs_checked, 0) AS BIGINT) AS pairs_checked,
       CAST(COALESCE(a.n_dups, 0) AS BIGINT) AS n_dups,
       CAST(COALESCE(a.n_dropped, 0) AS BIGINT) AS n_dropped
FROM sizes s LEFT JOIN agg a ON s.cid = a.cid
""",
    tags=("dedup", "semantic", "semdedup", "clustering", "embedding"),
)
def dedup_semantic_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    deduplication by CLUSTER-blocked cosine comparison — assign every
    embedding to its nearest of sem_auto_k(N) centroids, compare pairs
    only WITHIN a cluster, and flag pairs above the cosine threshold,
    keeping the lowest vec_id (n_dropped counts the would-be-removed
    side). The cluster-blocked complement of embedding_near_dup's LSH
    blocking — the published recipe for "dedup 100 TB of embeddings
    without the all-pairs join".

    100 TB posture: assignment is the map-side broadcast fold (vectors
    and norms ride THROUGH it — no corpus re-join, the k-means round-14
    contract); the ONE corpus-scale shuffle is the self-join on the
    blocking key, and its quadratic term is bounded the way every dedup
    family member bounds fan-out: clusters beyond {SEM_CAP} vectors
    subshard by md5(vec_id) into ceil(size/{SEM_CAP}) blocks. Pairs
    across subshards are sacrificed — recall ≈ 1/nsub (round-15
    measured the model exactly) — so K is DERIVED from the corpus size
    (sem_auto_k: mean cluster ≈ SEM_TARGET keeps nsub near 1) and every
    report row carries predicted_recall = 1/nsub, making the loss a
    visible number instead of prose. Determinism: exact-int dots (the
    oracle's list_dot_product doubles are < 2^53, so identical
    integers), d2 via norms − 2·dot on identical operands, cosine = one
    dot over two sqrts of identical ints — the embedding_near_dup
    recipe."""
    return _sem_pairs(_sem_assign_l2(spark, sf_dir))


def _l2_seed_assign(reps: DataFrame, k: int) -> DataFrame:
    """TWO-LEVEL L2-to-seed assignment over (vec_id, iv, nrm[, …]) rows,
    appending `cid`. Seeds are the k lowest vec_ids; the k1 = ⌈√k⌉
    lowest of them are ROUTERS. Each seed belongs to its nearest
    router's group (tie → lowest router id); each corpus row folds over
    the k1 routers, then over ONLY its chosen group's seeds — O(√k) work
    per row instead of O(k), which is what keeps the corpus-derived K
    rule (sem_auto_k: K ∝ N) from turning assignment into an O(N²)
    scan. The IVF coarse-routing idea; deterministic (exact-int d2,
    lowest-id ties), so the oracle replays it exactly. A row that IS a
    seed routes to its own group (both argmins share the router metric)
    and assigns to itself — flat-argmin parity where it matters.

    Everything stays map-side: the seeds are driver-collected (k×d only
    — the MLlib centroid pattern) and the routed argmin runs as numpy
    matmuls per Arrow batch (round 16, optimization guide §4.2 — the
    interpreted O(√k·d)-per-row Catalyst fold was the dominant per-row
    cost); the corpus never shuffles to be assigned (the k-means
    round-14 contract). Bit-identical to the fold it replaces: exact
    int64 d2 via the nrm + cn − 2·dot identity, first-minimum ties over
    rid-/cid-ascending candidates."""
    from pyspark.sql.types import LongType, StructField, StructType

    from quiver_spark.operators.similarity2 import _cent_np

    k1 = math.isqrt(max(k - 1, 0)) + 1  # exact ⌈√k⌉
    cent = (
        reps.orderBy("vec_id")
        .limit(k)
        .select(F.col("vec_id").alias("cid"), F.col("iv").alias("cv"))
    )
    cids, C = _cent_np(cent)
    spark = reps.sparkSession
    bc = spark.sparkContext.broadcast((cids, C, k1))
    in_names = list(reps.columns)
    ivi = in_names.index("iv")
    out_names = in_names + ["cid"]
    schema = StructType(
        list(reps.schema.fields) + [StructField("cid", LongType(), False)]
    )

    def fn(batches):
        import numpy as np
        import pyarrow as pa

        from quiver_spark.operators.similarity2 import _list_matrix

        cids_, C_, k1_ = bc.value
        R = C_[:k1_]  # routers = the k1 lowest-cid seeds
        rcn = (R * R).sum(axis=1)
        RT = np.ascontiguousarray(R.T)

        def route(X, nrm):
            # exact int64 d2 to each router; first min = lowest rid
            d2 = nrm[:, None] + rcn[None, :] - 2 * (X @ RT)
            return np.argmin(d2, axis=1)

        scn = (C_ * C_).sum(axis=1)
        g_seed = route(C_, scn)
        groups = [np.nonzero(g_seed == g)[0] for g in range(k1_)]
        for batch in batches:
            n = batch.num_rows
            if n == 0:
                continue
            X = _list_matrix(batch.column(ivi), n)
            nrm = (X * X).sum(axis=1)
            gx = route(X, nrm)
            cid = np.empty(n, dtype=np.int64)
            for g in np.unique(gx):
                m = gx == g
                idxs = groups[g]
                if len(idxs) == 0:
                    # unreachable by the shared tie rule (a row only
                    # routes to a group whose router routed to itself)
                    raise ValueError(f"empty seed group {g} in routed assign")
                S = C_[idxs]
                d2 = (
                    nrm[m][:, None]
                    + scn[idxs][None, :]
                    - 2 * (X[m] @ S.T)
                )
                cid[m] = cids_[idxs[np.argmin(d2, axis=1)]]
            yield pa.RecordBatch.from_arrays(
                list(batch.columns) + [pa.array(cid)], names=out_names
            )

    return reps.mapInArrow(fn, schema)


def _sem_assign_l2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The base gate's L2-to-seed assignment (vec_id, iv, nrm, cid) with
    the corpus-derived K — extracted so examples/semdedup_recall.py
    measures the subshard cap's recall against the SAME assignment the
    gate blocks on."""
    from quiver_spark.functions import int_dot

    from quiver_spark.operators.similarity2 import _int_corpus

    emb = _int_corpus(spark, sf_dir).withColumn("nrm", int_dot("iv", "iv"))
    return _l2_seed_assign(emb, sem_auto_k(emb.count()))


def _sem_bucket_stats(sub: DataFrame, weighted: bool) -> DataFrame:
    """Per-cluster partial pair statistics from ONE shuffle (round 17,
    guide §2.4 + §4.2): partition the subsharded assignment by its
    blocking key (cid, subk), sort within partitions so blocks are
    contiguous, and stream every block through a vectorized in-bucket
    pair scorer. Replaces the (cid, subk) self-join — which shuffled the
    iv payload twice and scored each pair with an interpreted
    aggregate(zip_with) fold — with one exchange of the payload and one
    numpy matmul per block.

    Exactness: the cosine is the SAME arithmetic the JVM fold ran —
    exact int64 dot (|x|·|y|·d far below 2^63), cast to double, divided
    by the product of two correctly-rounded sqrts of exactly-
    representable int64 norms (< 2^53) — identical IEEE steps, so the
    ≥ SEM_TAU verdicts are bit-identical. The emitted rows are
    per-BUCKET partials, exact under the downstream per-cid SUM because
    every block is wholly contained in one emit call and every vec_id
    belongs to exactly one (cid, subk) block — so per-bucket DISTINCT
    drop counts add up to the per-cid COUNT(DISTINCT dropv) they
    replace, and pair/dup counts are plain integer sums.

    ``weighted`` switches the dup statistic: False → (pc, dup, ndrop)
    for the plain SemDeDup report, True → (pc, dupw = Σ wa·wb over
    duplicate pairs) for the collapsed/rep-weighted variant."""
    from pyspark.sql.types import LongType, StructField, StructType

    from quiver_spark.operators._bucketpairs import stream_bucket_pairs

    cols = ["cid", "subk", "vec_id", "nrm", "iv"] + (
        ["w"] if weighted else []
    )
    rows = (
        sub.select(*cols)
        .repartition("cid", "subk")
        .sortWithinPartitions("cid", "subk", "vec_id")
    )
    tau = SEM_TAU

    def emit(tbl, i, j):
        import numpy as np
        import pyarrow as pa

        from quiver_spark.operators.similarity2 import _list_matrix

        cid = tbl.column(0).to_numpy()
        vid = tbl.column(2).to_numpy()
        nrm = tbl.column(3).to_numpy()
        X = _list_matrix(tbl.column(4).combine_chunks(), tbl.num_rows)
        ia, ja = i.to_numpy(), j.to_numpy()
        dots = np.einsum("ij,ij->i", X[ia], X[ja])
        cos = dots.astype(np.float64) / (
            np.sqrt(nrm[ia].astype(np.float64))
            * np.sqrt(nrm[ja].astype(np.float64))
        )
        dup = cos >= tau
        uc, inv = np.unique(cid[ia], return_inverse=True)
        pc = np.bincount(inv, minlength=len(uc)).astype(np.int64)
        if weighted:
            w = tbl.column(5).to_numpy()
            # exact int64 accumulation (bincount weights are float64 and
            # would round above 2^53 at extreme copy counts)
            dupw = np.zeros(len(uc), dtype=np.int64)
            np.add.at(dupw, inv[dup], w[ia[dup]] * w[ja[dup]])
            arrs = [pa.array(uc), pa.array(pc), pa.array(dupw)]
            return pa.RecordBatch.from_arrays(
                arrs, names=["cid", "pc", "dupw"]
            )
        dups = np.bincount(inv[dup], minlength=len(uc)).astype(np.int64)
        # distinct dropped ids per cid: unique (cid, vb) among dup pairs
        # (vb lives in exactly one block, so per-call uniqueness is
        # global uniqueness)
        ndrop = np.zeros(len(uc), dtype=np.int64)
        if dup.any():
            dc, dv = cid[ja[dup]], vid[ja[dup]]
            uniq = np.unique(np.stack([dc, dv], axis=1), axis=0)
            di = np.searchsorted(uc, uniq[:, 0])
            ndrop = np.bincount(di, minlength=len(uc)).astype(np.int64)
        arrs = [
            pa.array(uc),
            pa.array(pc),
            pa.array(dups),
            pa.array(ndrop),
        ]
        return pa.RecordBatch.from_arrays(
            arrs, names=["cid", "pc", "dup", "ndrop"]
        )

    fields = [
        StructField("cid", LongType(), False),
        StructField("pc", LongType(), False),
    ] + (
        [StructField("dupw", LongType(), False)]
        if weighted
        else [
            StructField("dup", LongType(), False),
            StructField("ndrop", LongType(), False),
        ]
    )
    # no bucket cap here — the md5 subsharding already bounds block sizes
    # by design, and every pair must be scored (the oracle drops none)
    return rows.mapInArrow(
        stream_bucket_pairs(2, lambda _b: 1 << 62, emit),
        StructType(fields),
    )


def _sem_pairs(assign: DataFrame) -> DataFrame:
    """The SemDeDup pair stage, shared by the L2-seed and spherical
    blockings: within-cluster md5-subsharded cosine comparison + the
    per-cluster report. ``assign`` must carry (vec_id, iv, nrm, cid).

    The assignment has TWO consumers (sizes + the pair join) and its
    centroid argmin/argmax fold is the expensive map-side step — the lazy
    checkpoint materializes it once (SemDeDup itself persists cluster
    assignments; the dedup-family localCheckpoint precedent)."""
    assign = assign.select("vec_id", "iv", "nrm", "cid").localCheckpoint(
        eager=False
    )
    sizes = assign.groupBy("cid").agg(F.count(F.lit(1)).alias("sz")).select(
        "cid",
        "sz",
        F.expr(f"CAST((sz + {SEM_CAP - 1}) DIV {SEM_CAP} AS BIGINT)").alias(
            "nsub"
        ),
    )
    sub = assign.join(F.broadcast(sizes), "cid").select(
        "cid",
        "vec_id",
        "iv",
        "nrm",
        (
            F.conv(
                F.substring(F.md5(F.col("vec_id").cast("string")), 1, 8),
                16,
                10,
            ).cast("bigint")
            % F.col("nsub")
        ).alias("subk"),
    )
    # round 17: ONE (cid, subk) exchange + streamed in-bucket scoring —
    # see _sem_bucket_stats. The self-join and its per-pair interpreted
    # int_dot fold are gone; only ≤|buckets| partial rows leave the pass.
    stats = _sem_bucket_stats(sub, weighted=False)
    # per-cluster report WITHOUT a sizes⟕pairs join: the size rows union
    # in as zero-pair contributions and ONE ≤K-key aggregate produces the
    # report, so zero-pair clusters survive and no report join exists to
    # mis-plan (a broadcast hint on the pair-side rollup propagates into
    # its subtree and flips the corpus-scale pair self-join to a
    # broadcast of the whole corpus — observed in the executed plan)
    pairpart = stats.select(
        "cid",
        F.lit(None).cast("bigint").alias("sz"),
        F.lit(None).cast("bigint").alias("nsub"),
        "pc",
        "dup",
        "ndrop",
    )
    sizepart = sizes.select(
        "cid",
        F.col("sz").cast("bigint").alias("sz"),
        F.col("nsub").cast("bigint").alias("nsub"),
        F.lit(0).cast("bigint").alias("pc"),
        F.lit(0).cast("bigint").alias("dup"),
        F.lit(0).cast("bigint").alias("ndrop"),
    )
    return (
        sizepart.unionByName(pairpart)
        .groupBy("cid")
        .agg(
            F.max("sz").cast("bigint").alias("n_vecs"),
            F.max("nsub").cast("bigint").alias("n_subshards"),
            F.sum("pc").cast("bigint").alias("pairs_checked"),
            F.sum("dup").cast("bigint").alias("n_dups"),
            F.sum("ndrop").cast("bigint").alias("n_dropped"),
        )
        # the executable recall model (1/nsub per cluster, round-15
        # measured): every report row SHOWS what the subshard cap costs
        .withColumn(
            "predicted_recall",
            F.lit(1.0) / F.col("n_subshards").cast("double"),
        )
        .select(
            "cid", "n_vecs", "n_subshards", "predicted_recall",
            "pairs_checked", "n_dups", "n_dropped",
        )
    )


def _semdedup_cos_oracle() -> str:
    from quiver_spark.operators.similarity import SQL_IV
    from quiver_spark.operators.similarity2 import KM_ITERS, cos_chain_sql

    # seed count derived from corpus size, exactly like the Spark side
    chain, final = cos_chain_sql(
        f"(SELECT {SEM_AUTO_K_SQL} FROM embeddings)", KM_ITERS
    )
    return f"""
WITH ivl AS (
    SELECT vec_id,
           list_transform(embedding,
               x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS iv
    FROM embeddings
),
n AS (
    SELECT vec_id, iv,
           CAST(list_dot_product(iv, iv) AS DOUBLE) AS nrm
    FROM ivl
),
iv AS ({SQL_IV}),{chain},
assign AS (SELECT vec_id, cid FROM {final}),
sizes AS (
    SELECT cid, COUNT(*) AS sz, (COUNT(*) + {SEM_CAP - 1}) // {SEM_CAP} AS nsub
    FROM assign GROUP BY cid
),
sub AS (
    SELECT a.vec_id, a.cid, s.nsub,
           (('0x' || substr(md5(CAST(a.vec_id AS VARCHAR)), 1, 8))::BIGINT
               % s.nsub) AS subk
    FROM assign a JOIN sizes s ON a.cid = s.cid
),
pairs AS (
    SELECT a.cid, a.vec_id AS va, b.vec_id AS vb
    FROM sub a JOIN sub b
      ON a.cid = b.cid AND a.subk = b.subk AND a.vec_id < b.vec_id
),
scored AS (
    SELECT p.cid, p.va, p.vb,
           CAST(list_dot_product(na.iv, nb.iv) AS DOUBLE)
               / (SQRT(na.nrm) * SQRT(nb.nrm)) AS cosv
    FROM pairs p
    JOIN n na ON p.va = na.vec_id
    JOIN n nb ON p.vb = nb.vec_id
),
agg AS (
    SELECT cid,
           COUNT(*) AS pairs_checked,
           SUM(CASE WHEN cosv >= {SEM_TAU} THEN 1 ELSE 0 END) AS n_dups,
           COUNT(DISTINCT CASE WHEN cosv >= {SEM_TAU} THEN vb END)
               AS n_dropped
    FROM scored GROUP BY cid
)
SELECT s.cid,
       CAST(s.sz AS BIGINT) AS n_vecs,
       CAST(s.nsub AS BIGINT) AS n_subshards,
       CAST(1.0 / s.nsub AS DOUBLE) AS predicted_recall,
       CAST(COALESCE(a.pairs_checked, 0) AS BIGINT) AS pairs_checked,
       CAST(COALESCE(a.n_dups, 0) AS BIGINT) AS n_dups,
       CAST(COALESCE(a.n_dropped, 0) AS BIGINT) AS n_dropped
FROM sizes s LEFT JOIN agg a ON s.cid = a.cid
"""


@register(
    "dedup_semantic_semdedup_cos",
    oracle=_semdedup_cos_oracle(),
    tags=("dedup", "semantic", "semdedup", "cosine", "clustering",
          "embedding"),
)
def dedup_semantic_semdedup_cos(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup blocking on SPHERICAL k-means (round 15, VERDICT r14
    Next #3): the published recipe's actual clustering — the base gate
    blocks on L2-to-seed assignment while its dedup criterion is cosine;
    here the blocking geometry matches the criterion (max-cosine
    assignment to centroids trained by similarity2.spherical_kmeans,
    KM_ITERS rounds over sem_auto_k(N) corpus-derived seeds), and the
    oracle replays the SAME unrolled chain the embedding_kmeans_cosine
    gate certifies (cos_chain_sql, dynamic seed LIMIT).

    100 TB posture unchanged from the base gate: training never shuffles
    the corpus (broadcast-fold assignment + (cid, component) partial-sum
    updates), vectors/norms ride THROUGH the final assignment, the one
    corpus-scale shuffle is the blocking-key self-join, and over-cap
    clusters md5-subshard with the documented recall trade."""
    from quiver_spark.functions import int_dot
    from quiver_spark.operators.similarity2 import (
        KM_ITERS,
        _int_corpus,
        spherical_kmeans,
    )

    emb = _int_corpus(spark, sf_dir).withColumn("nrm", int_dot("iv", "iv"))
    assign = spherical_kmeans(emb, sem_auto_k(emb.count()), KM_ITERS)
    return _sem_pairs(assign)


@register(
    "dedup_semantic_semdedup_collapsed",
    oracle=f"""
WITH ivl AS (
    SELECT vec_id,
           list_transform(embedding,
               x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS iv
    FROM embeddings
),
g AS (
    SELECT iv, MIN(vec_id) AS vec_id, COUNT(*) AS w
    FROM ivl GROUP BY iv
),
n AS (
    SELECT vec_id, iv, w,
           CAST(list_dot_product(iv, iv) AS DOUBLE) AS nrm
    FROM g
),
cent AS (
    SELECT vec_id AS cid, iv AS cv,
           CAST(list_dot_product(iv, iv) AS DOUBLE) AS cnrm
    FROM g
    WHERE vec_id IN (SELECT vec_id FROM g ORDER BY vec_id
                     LIMIT (SELECT {{AUTOK}} FROM g))
),
routers AS (
    SELECT cid AS rid, cv AS rv, cnrm AS rnrm FROM cent
    ORDER BY cid
    LIMIT (SELECT CAST(CEIL(SQRT(COUNT(*))) AS BIGINT) FROM cent)
),
sgrp AS (
    SELECT cid, cv, cnrm, rid AS grp FROM (
        SELECT c.cid, c.cv, c.cnrm, r.rid,
               ROW_NUMBER() OVER (
                   PARTITION BY c.cid
                   ORDER BY c.cnrm + r.rnrm
                         - 2 * CAST(list_dot_product(c.cv, r.rv) AS DOUBLE),
                       r.rid) AS rr
        FROM cent c CROSS JOIN routers r
    ) WHERE rr = 1
),
rowr AS (
    SELECT vec_id, grp FROM (
        SELECT n.vec_id, r.rid AS grp,
               ROW_NUMBER() OVER (
                   PARTITION BY n.vec_id
                   ORDER BY n.nrm + r.rnrm
                         - 2 * CAST(list_dot_product(n.iv, r.rv) AS DOUBLE),
                       r.rid) AS rr
        FROM n CROSS JOIN routers r
    ) WHERE rr = 1
),
assign AS (
    SELECT nn.vec_id, nn.iv, nn.w, nn.nrm, x.cid
    FROM (SELECT vec_id, cid FROM (
              SELECT n.vec_id, s.cid,
                     ROW_NUMBER() OVER (
                         PARTITION BY n.vec_id
                         ORDER BY n.nrm + s.cnrm
                               - 2 * CAST(list_dot_product(n.iv, s.cv)
                                          AS DOUBLE),
                             s.cid) AS rr
              FROM n
              JOIN rowr ON n.vec_id = rowr.vec_id
              JOIN sgrp s ON s.grp = rowr.grp
          ) WHERE rr = 1) x
    JOIN n nn ON x.vec_id = nn.vec_id
),
sizes AS (
    SELECT cid, COUNT(*) AS szd, SUM(w) AS wsum,
           SUM(w * (w - 1) // 2) AS ident_dups,
           (COUNT(*) + {SEM_CAP_D - 1}) // {SEM_CAP_D} AS nsub
    FROM assign GROUP BY cid
),
sub AS (
    SELECT a.vec_id, a.iv, a.w, a.nrm, a.cid, s.nsub,
           (('0x' || substr(md5(CAST(a.vec_id AS VARCHAR)), 1, 8))::BIGINT
               % s.nsub) AS subk
    FROM assign a JOIN sizes s ON a.cid = s.cid
),
scored AS (
    SELECT a.cid,
           CASE WHEN CAST(list_dot_product(a.iv, b.iv) AS DOUBLE)
                     / (SQRT(a.nrm) * SQRT(b.nrm)) >= {SEM_TAU}
                THEN a.w * b.w ELSE 0 END AS dupw
    FROM sub a JOIN sub b
      ON a.cid = b.cid AND a.subk = b.subk AND a.vec_id < b.vec_id
),
agg AS (
    SELECT cid, COUNT(*) AS pairs_checked, SUM(dupw) AS dupw
    FROM scored GROUP BY cid
)
SELECT s.cid,
       CAST(s.wsum AS BIGINT) AS n_vecs,
       CAST(s.szd AS BIGINT) AS n_distinct,
       CAST(s.nsub AS BIGINT) AS n_subshards,
       CAST(1.0 / s.nsub AS DOUBLE) AS predicted_recall,
       CAST(COALESCE(a.pairs_checked, 0) AS BIGINT) AS pairs_checked,
       CAST(COALESCE(a.dupw, 0) + s.ident_dups AS BIGINT) AS n_dups_w
FROM sizes s LEFT JOIN agg a ON s.cid = a.cid
""".replace("{AUTOK}", SEM_AUTO_K_SQL),
    tags=("dedup", "semantic", "semdedup", "collapsed", "embedding"),
)
def dedup_semantic_semdedup_collapsed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup over EXACT-COLLAPSED vectors (round 16): hash-group
    identical embeddings first (rep = lowest vec_id, weight = copy
    count), cluster only the DISTINCT vectors (sem_auto_k over the
    distinct count), and report WEIGHTED duplicate pairs — cross-rep
    pairs contribute w_a·w_b when cos ≥ τ, and each rep's own copies
    contribute C(w,2) CLOSED-FORM (identical vectors are duplicates by
    identity; no join needed, so a viral 10M-copy duplicate costs O(1)
    instead of 5·10¹³ pair rows).

    This is the production-shaped SemDeDup: web corpora are dominated by
    exact duplicates, and collapsing first means (a) the subshard cap's
    recall loss applies only to the small distinct-pair tail — the ×100
    recall audit (examples/semdedup_recall.py --collapsed) moves from
    0.016 (round-15 fixed-K) to 1.0 — and (b) the pair join's quadratic
    is bounded by DISTINCT cluster sizes, which sem_auto_k keeps near
    SEM_TARGET; the cap here is SEM_CAP_D (distinct space: the
    viral-duplicate threat is collapsed away, so only adversarial
    semantic density needs the guard). 100 TB posture: one exact-dedup shuffle (hash groupBy on
    the vector), broadcast-fold assignment, one distinct-scale pair
    shuffle; the corpus never joins itself at full weight."""
    from quiver_spark.functions import int_dot
    from quiver_spark.operators.similarity2 import _int_corpus

    reps = (
        _int_corpus(spark, sf_dir)
        .groupBy("iv")
        .agg(F.min("vec_id").alias("vec_id"), F.count(F.lit(1)).alias("w"))
        .withColumn("nrm", int_dot("iv", "iv"))
        .select("vec_id", "iv", "nrm", "w")
        .localCheckpoint(eager=False)
    )
    assign = _l2_seed_assign(reps, sem_auto_k(reps.count())).localCheckpoint(
        eager=False
    )
    sizes = (
        assign.groupBy("cid")
        .agg(
            F.count(F.lit(1)).alias("szd"),
            F.sum("w").alias("wsum"),
            F.sum(F.expr("w * (w - 1) DIV 2")).alias("ident_dups"),
        )
        .withColumn(
            "nsub",
            F.expr(f"CAST((szd + {SEM_CAP_D - 1}) DIV {SEM_CAP_D} AS BIGINT)"),
        )
    )
    sub = assign.join(
        F.broadcast(sizes.select("cid", "nsub")), "cid"
    ).select(
        "cid",
        "vec_id",
        "iv",
        "nrm",
        "w",
        (
            F.conv(
                F.substring(F.md5(F.col("vec_id").cast("string")), 1, 8),
                16,
                10,
            ).cast("bigint")
            % F.col("nsub")
        ).alias("subk"),
    )
    # round 17: ONE (cid, subk) exchange + streamed in-bucket scoring —
    # see _sem_bucket_stats. The self-join and its per-pair interpreted
    # int_dot fold are gone; only ≤|buckets| partial rows leave the pass.
    stats = _sem_bucket_stats(sub, weighted=True)
    # union-aggregate report (the _sem_pairs pattern — no sizes⟕pairs
    # join for a broadcast hint to mis-plan)
    pairpart = stats.select(
        "cid",
        F.lit(None).cast("bigint").alias("szd"),
        F.lit(None).cast("bigint").alias("wsum"),
        F.lit(None).cast("bigint").alias("ident_dups"),
        F.lit(None).cast("bigint").alias("nsub"),
        "pc",
        F.col("dupw"),
    )
    sizepart = sizes.select(
        "cid",
        F.col("szd").cast("bigint"),
        F.col("wsum").cast("bigint"),
        F.col("ident_dups").cast("bigint"),
        F.col("nsub").cast("bigint"),
        F.lit(0).cast("bigint").alias("pc"),
        F.lit(0).cast("bigint").alias("dupw"),
    )
    return (
        sizepart.unionByName(pairpart)
        .groupBy("cid")
        .agg(
            F.max("wsum").cast("bigint").alias("n_vecs"),
            F.max("szd").cast("bigint").alias("n_distinct"),
            F.max("nsub").cast("bigint").alias("n_subshards"),
            F.sum("pc").cast("bigint").alias("pairs_checked"),
            (F.sum("dupw") + F.max("ident_dups")).cast("bigint").alias(
                "n_dups_w"
            ),
        )
        .withColumn(
            "predicted_recall",
            F.lit(1.0) / F.col("n_subshards").cast("double"),
        )
        .select(
            "cid", "n_vecs", "n_distinct", "n_subshards",
            "predicted_recall", "pairs_checked", "n_dups_w",
        )
    )
