"""Vector-index TRAINING operators (round 13): distributed Lloyd k-means
and product quantization — the two steps a 100 TB ANN pipeline runs before
any of the search operators in similarity.py can exist.

similarity.py's IVF search assumes a coarse quantizer; this module trains
one. ``embedding_kmeans_clusters`` is textbook distributed k-means:
centroids live in a broadcast (K×d is tiny), ASSIGNMENT is map-side (the
corpus never shuffles for it), and the UPDATE step is one uniform groupBy
on (cluster, component) per iteration — the exact plan shape Spark MLlib
uses, re-expressed in pure DataFrame algebra so the oracle can replay it.
``ann_pq_topk`` completes the quantization family next to ann_sq8_topk
(scalar) and ann_ivf_topk (coarse): per-subspace codebooks, corpus encoded
to 4 small codes (16× compression of the scaled-int vectors), queries
scored against codes via an ADC lookup table without touching any corpus
vector.

Determinism (the driver hash-compares): vectors are scaled BIGINTs
(functions.int_vec); centroid updates re-quantize the component mean with
ONE IEEE division + ROUND on identical operands, so iterated centroids are
bit-identical across engines; all distances / dot products are exact
integer sums; every argmin carries a total tie-break order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window
from pyspark.sql import functions as F

from quiver_spark.functions import int_dot, int_vec
from quiver_spark.registry import register
from quiver_spark.tables import load
from quiver_spark.operators.similarity import N_PROBES, SQL_IV, TOP_K

# --------------------------------------------------------------------------
# Distributed Lloyd k-means (the IVF coarse-quantizer trainer)
# --------------------------------------------------------------------------

KM_K = 8  #: clusters; seeds = the KM_K lowest vec_ids (deterministic init)
KM_ITERS = 2  #: Lloyd iterations (fixed so the oracle can unroll them)

_DIST2 = (
    "aggregate(zip_with({v}, {c}, (x, y) -> (x - y) * (x - y)),"
    " CAST(0 AS BIGINT), (acc, d) -> acc + d)"
)


# --------------------------------------------------------------------------
# Vectorized centroid assignment (round 16, optimization guide §4.2)
#
# The interpreted Catalyst fold over K centroids costs O(K·d) allocating
# lambda steps PER ROW; with the corpus-derived K of the SemDeDup gates
# (sem_auto_k: K ∝ N) that assignment pass is the dominant wall in every
# k-means-blocked query (measured round 16: dedup_semantic_semdedup_cos
# 5.0 s at sf0.1, ~3 s of it the two training folds). These helpers run
# the SAME exact argmin/argmax as the folds — one numpy matmul per Arrow
# batch — with centroids collected to the driver per Lloyd round (K×d
# only, the Spark MLlib KMeans pattern) and shipped via a broadcast
# variable. Bit-identical by construction:
#   * integer dots/d2 are exact int64 (|dot| ≤ d·scale² < 2^53; the
#     nrm + cn − 2·dot identity equals the fold's Σ(x−y)² in integers);
#   * cosine scores divide/sqrt the SAME float64 operands the fold casts;
#   * np.argmin/argmax keep the FIRST optimum over cid-ascending
#     centroids — the folds' lowest-cid tie rule.
# The corpus still never shuffles to be assigned: mapInArrow is a
# map-side node, exactly like the broadcast fold it replaces.
# --------------------------------------------------------------------------


def _cent_np(cent: DataFrame, id_col: str = "cid", vec_col: str = "cv"):
    """Driver-side centroid materialization → (cids, C) sorted by cid,
    as int64 numpy arrays. K×d values only — metadata-scale at any
    corpus size (the K_MAX clamp bounds it at ~33 MB)."""
    import numpy as np

    rows = cent.select(id_col, vec_col).collect()
    if not rows:
        # loud guard (ADVICE r16): callers collect data-dependent sets
        # (eval probes, seeds); an empty one used to die in reshape(0,-1)
        raise ValueError(
            f"_cent_np: empty ({id_col}, {vec_col}) input — the collected "
            "probe/centroid set matched no rows"
        )
    rows.sort(key=lambda r: r[0])
    cids = np.array([r[0] for r in rows], dtype=np.int64)
    C = np.array([list(r[1]) for r in rows], dtype=np.int64)
    return cids, C.reshape(len(rows), -1)


def _list_matrix(arr, n: int):
    """Arrow list<int64> column → (n, d) int64 matrix, zero-copy off the
    child buffer. Raises on nulls/ragged rows (the int corpus is uniform
    by construction — a violation is data corruption, not a case)."""
    import numpy as np

    if arr.null_count:
        raise ValueError("null embedding vector in assignment input")
    off = np.asarray(arr.offsets)
    child = np.asarray(arr.values)
    w = np.diff(off)
    if n and not (w == w[0]).all():
        raise ValueError("ragged embedding vectors in assignment input")
    d = int(w[0]) if n else 0
    return (
        child[int(off[0]) : int(off[0]) + n * d]
        .reshape(n, d)
        .astype(np.int64, copy=False)
    )


def _np_assign(emb: DataFrame, cids, C, mode: str, out_cols) -> DataFrame:
    """Exact vectorized assignment: appends ``out_cols`` (cid + dotv for
    mode='cos', cid + d2 for mode='l2') to every row of ``emb``. Every
    input column rides through (the k-means round-14 contract)."""
    from pyspark.sql.types import LongType, StructField, StructType

    spark = emb.sparkSession
    bc = spark.sparkContext.broadcast((cids, C))
    in_names = list(emb.columns)
    ivi = in_names.index("iv")
    out_names = in_names + list(out_cols)
    schema = StructType(
        list(emb.schema.fields)
        + [StructField(c, LongType(), False) for c in out_cols]
    )

    def fn(batches):
        import numpy as np
        import pyarrow as pa

        cids_, C_ = bc.value
        CT = np.ascontiguousarray(C_.T)
        cn = (C_ * C_).sum(axis=1)
        if mode == "cos":
            sq = np.sqrt(cn.astype(np.float64))
            zero = cn == 0
        for batch in batches:
            n = batch.num_rows
            if n == 0:
                continue
            X = _list_matrix(batch.column(ivi), n)
            dots = X @ CT
            if mode == "cos":
                with np.errstate(divide="ignore", invalid="ignore"):
                    sc = dots / sq
                if zero.any():
                    sc[:, zero] = -np.inf
                idx = np.argmax(sc, axis=1)
                extra = [cids_[idx], dots[np.arange(n), idx]]
            else:
                nrm = (X * X).sum(axis=1)
                d2 = nrm[:, None] + cn[None, :] - 2 * dots
                idx = np.argmin(d2, axis=1)
                extra = [cids_[idx], d2[np.arange(n), idx]]
            yield pa.RecordBatch.from_arrays(
                list(batch.columns) + [pa.array(e) for e in extra],
                names=out_names,
            )

    return emb.mapInArrow(fn, schema)


def _seed_probe_np(emb: DataFrame, n_probes: int, n_seeds: int):
    """(qids, Q, sids, S): all probe vectors (vec_id < n_probes) and the
    n_seeds lowest non-probe vectors, from ONE TakeOrdered job — probes
    sort before every non-probe, so the lowest n_probes+n_seeds rows by
    vec_id contain both sets exactly. Replaces two separate driver
    collects (each a full corpus-scan job)."""
    import numpy as np

    rows = emb.select("vec_id", "iv").orderBy("vec_id").limit(
        n_probes + n_seeds
    ).collect()
    rows.sort(key=lambda r: r["vec_id"])
    pr = [r for r in rows if r["vec_id"] < n_probes]
    se = [r for r in rows if r["vec_id"] >= n_probes][:n_seeds]

    def mat(rs):
        ids = np.array([r["vec_id"] for r in rs], dtype=np.int64)
        V = np.array([list(r["iv"]) for r in rs], dtype=np.int64)
        return ids, V.reshape(len(rs), -1)

    qids, Q = mat(pr)
    sids, S = mat(se)
    return qids, Q, sids, S


def _batch_topk(vids, S, qids, k):
    """Per-query per-batch top-k candidates from a batch score matrix
    S (nq × n): any GLOBAL top-k row by (s DESC, vec_id ASC) is inside
    its batch's top-k for that query, so emitting k rows per (query,
    batch) into the final (tiny) global window is exact. Returns
    (qid, vec_id, s) int64 arrays."""
    import numpy as np

    oq, ov, os_ = [], [], []
    for j in range(len(qids)):
        key = -S[j]
        if key.dtype.kind == "f":
            # Spark sorts NaN above every double: DESC puts NaN first
            key = np.where(np.isnan(key), -np.inf, key)
        order = np.lexsort((vids, key))[:k]
        oq.append(np.full(len(order), qids[j], dtype=np.int64))
        ov.append(vids[order])
        os_.append(S[j][order])
    return (
        np.concatenate(oq),
        np.concatenate(ov),
        np.concatenate(os_),
    )


def _pq_candidates(corpus: DataFrame, CB, ADC, qids, k) -> DataFrame:
    """ONE vectorized corpus pass for PQ ADC serving (round 16, guide
    §4.2 + §2.3): per Arrow batch, encode each row's M sub-slices
    against the broadcast codebook (exact int64 d2 argmin, first-min =
    lowest cid over cid-ascending codewords — the fold's tie rule), sum
    the M ADC table lookups per query, and emit only the per-(query,
    batch) top-k candidate rows. Replaces the interpreted per-row
    M×K fold + M-codes posexplode + broadcast ADC join + corpus-scale
    (qid, vec_id) aggregate — the only exchange left downstream is the
    tiny candidate window."""
    import numpy as np
    from pyspark.sql.types import LongType, StructField, StructType

    spark = corpus.sparkSession
    bc = spark.sparkContext.broadcast(
        (
            [np.asarray(c) for c in CB],
            [np.asarray(a) for a in ADC],
            np.asarray(qids, dtype=np.int64),
        )
    )
    schema = StructType(
        [
            StructField("qid", LongType(), False),
            StructField("vec_id", LongType(), False),
            StructField("s", LongType(), False),
        ]
    )
    src = corpus.select("vec_id", "iv")

    def fn(batches):
        import numpy as np
        import pyarrow as pa

        CB_, ADC_, qids_ = bc.value
        M = len(CB_)
        SUB = CB_[0].shape[1]
        cn = [(c * c).sum(axis=1) for c in CB_]
        CT = [np.ascontiguousarray(c.T) for c in CB_]
        for batch in batches:
            n = batch.num_rows
            if n == 0:
                continue
            vids = np.asarray(batch.column(0)).astype(np.int64, copy=False)
            X = _list_matrix(batch.column(1), n)
            S = np.zeros((len(qids_), n), dtype=np.int64)
            for m in range(M):
                Xm = X[:, m * SUB : (m + 1) * SUB]
                d2 = (
                    (Xm * Xm).sum(axis=1)[:, None]
                    + cn[m][None, :]
                    - 2 * (Xm @ CT[m])
                )
                code = np.argmin(d2, axis=1)
                S += ADC_[m][:, code]
            oq, ov, os_ = _batch_topk(vids, S, qids_, k)
            yield pa.RecordBatch.from_arrays(
                [pa.array(oq), pa.array(ov), pa.array(os_)],
                names=["qid", "vec_id", "s"],
            )

    return src.mapInArrow(fn, schema)


def _pqt_partials(corpus: DataFrame, CB) -> DataFrame:
    """One Lloyd-round corpus pass for per-subspace codebooks: per Arrow
    batch, encode each row's M sub-slices (exact argmin, lowest-index
    ties) and emit M·K·SUB partial component sums + counts; the shuffle
    carries that constant-bounded partial set (map-combined), exactly
    like the (m, cid, si) aggregate it replaces — minus the corpus-scale
    posexplode feeding it."""
    import numpy as np
    from pyspark.sql.types import LongType, StructField, StructType

    spark = corpus.sparkSession
    bc = spark.sparkContext.broadcast([np.asarray(c) for c in CB])
    schema = StructType(
        [
            StructField(n, LongType(), False)
            for n in ("m", "k", "si", "s", "c")
        ]
    )

    def fn(batches):
        import numpy as np
        import pyarrow as pa

        CB_ = bc.value
        M = len(CB_)
        SUB = CB_[0].shape[1]
        for batch in batches:
            n = batch.num_rows
            if n == 0:
                continue
            X = _list_matrix(batch.column(0), n)
            cols = {nm: [] for nm in ("m", "k", "si", "s", "c")}
            for m in range(M):
                Xm = X[:, m * SUB : (m + 1) * SUB]
                cn = (CB_[m] * CB_[m]).sum(axis=1)
                d2 = (
                    (Xm * Xm).sum(axis=1)[:, None]
                    + cn[None, :]
                    - 2 * (Xm @ CB_[m].T)
                )
                code = np.argmin(d2, axis=1)
                # only NON-EMPTY codewords emit rows: a codeword no row
                # chose must vanish from the next codebook (the grouped
                # aggregate it replaces had no row to produce either)
                for kk in np.unique(code):
                    mask = code == kk
                    ps = Xm[mask].sum(axis=0)
                    cnt = int(mask.sum())
                    cols["m"] += [m] * SUB
                    cols["k"] += [int(kk)] * SUB
                    cols["si"] += list(range(SUB))
                    cols["s"] += [int(x) for x in ps]
                    cols["c"] += [cnt] * SUB
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(
                        np.array(cols[nm], dtype=np.int64)
                    )
                    for nm in ("m", "k", "si", "s", "c")
                ],
                names=["m", "k", "si", "s", "c"],
            )

    return (
        corpus.select("iv")
        .mapInArrow(fn, schema)
        .groupBy("m", "k", "si")
        .agg(F.sum("s").alias("s"), F.sum("c").alias("c"))
    )


def _pqt_candidates(corpus: DataFrame, CB, ADC, qids, Q, k) -> DataFrame:
    """The trained-PQ serving pass: like _pq_candidates, but the SAME
    corpus pass also computes the exact int-dot top-k per query (the
    recall yardstick) — rows tagged kind=0 (ADC score) / kind=1 (exact
    dot). One scan instead of two; downstream windows see only
    per-batch top-k candidates."""
    import numpy as np
    from pyspark.sql.types import LongType, StructField, StructType

    spark = corpus.sparkSession
    bc = spark.sparkContext.broadcast(
        (
            [np.asarray(c) for c in CB],
            [np.asarray(a) for a in ADC],
            np.asarray(qids, dtype=np.int64),
            np.asarray(Q),
        )
    )
    schema = StructType(
        [
            StructField(n, LongType(), False)
            for n in ("kind", "qid", "vec_id", "s")
        ]
    )
    src = corpus.select("vec_id", "iv")

    def fn(batches):
        import numpy as np
        import pyarrow as pa

        CB_, ADC_, qids_, Q_ = bc.value
        M = len(CB_)
        SUB = CB_[0].shape[1]
        QT = np.ascontiguousarray(Q_.T)
        for batch in batches:
            n = batch.num_rows
            if n == 0:
                continue
            vids = np.asarray(batch.column(0)).astype(np.int64, copy=False)
            X = _list_matrix(batch.column(1), n)
            S = np.zeros((len(qids_), n), dtype=np.int64)
            for m in range(M):
                Xm = X[:, m * SUB : (m + 1) * SUB]
                cn = (CB_[m] * CB_[m]).sum(axis=1)
                d2 = (
                    (Xm * Xm).sum(axis=1)[:, None]
                    + cn[None, :]
                    - 2 * (Xm @ CB_[m].T)
                )
                code = np.argmin(d2, axis=1)
                S += ADC_[m][:, code]
            E = (X @ QT).T  # exact int dots, (nq × n)
            out = []
            for kind, mat in ((0, S), (1, E)):
                oq, ov, os_ = _batch_topk(vids, mat, qids_, k)
                out.append(
                    (np.full(len(oq), kind, dtype=np.int64), oq, ov, os_)
                )
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(np.concatenate([o[i] for o in out]))
                    for i in range(4)
                ],
                names=["kind", "qid", "vec_id", "s"],
            )

    return src.mapInArrow(fn, schema)


def _km_oracle() -> str:
    """Unrolled two-iteration Lloyd chain over the exploded int view."""
    steps = []
    prev = "c0"
    for it in range(1, KM_ITERS + 1):
        steps.append(f"""
d{it} AS (
    SELECT iv.vec_id, c.cid, SUM((iv.xi - c.ci) * (iv.xi - c.ci)) AS d2
    FROM iv JOIN {prev} c ON iv.i = c.i
    GROUP BY 1, 2
),
a{it} AS (
    SELECT vec_id, cid, d2 FROM (
        SELECT vec_id, cid, d2,
               ROW_NUMBER() OVER (
                   PARTITION BY vec_id ORDER BY d2, cid) AS r
        FROM d{it}
    ) WHERE r = 1
)""")
        if it < KM_ITERS:
            steps.append(f"""
c{it} AS (
    SELECT a.cid, iv.i,
           CAST(ROUND(CAST(SUM(iv.xi) AS DOUBLE) / COUNT(*)) AS BIGINT) AS ci
    FROM a{it} a JOIN iv ON a.vec_id = iv.vec_id
    GROUP BY 1, 2
)""")
        prev = f"c{it}"
    chain = ",".join(steps)
    return f"""
WITH iv AS ({SQL_IV}),
c0 AS (
    SELECT vec_id AS cid, i, xi AS ci FROM iv
    WHERE vec_id IN (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT {KM_K})
),{chain}
SELECT cid,
       CAST(COUNT(*) AS BIGINT) AS n_vecs,
       CAST(SUM(d2) AS DOUBLE) AS inertia
FROM a{KM_ITERS}
GROUP BY cid
"""


@register(
    "embedding_kmeans_clusters",
    oracle=_km_oracle(),
    tags=("similarity", "kmeans", "clustering", "training"),
)
def embedding_kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed Lloyd k-means over the embedding corpus: {KM_K} seeds
    (the lowest vec_ids — the deterministic stand-in for k-means‖
    sampling), {KM_ITERS} assignment/update rounds, reporting per-cluster
    size and inertia (sum of squared distances to the assigned centroid).

    The 100 TB plan shape: centroids are a K×d BROADCAST (a few KiB), so
    assignment is map-side — the corpus is scanned once per iteration and
    never shuffles; the update step shuffles only (cluster, component)
    partial sums (K·d rows after map-side combine, regardless of corpus
    size). Distances are exact integer sums; the re-quantized centroid
    mean (one IEEE divide + ROUND of identical operands) keeps iterations
    bit-identical across engines. Empty clusters drop out (both engines
    GROUP BY observed assignments only)."""
    emb = _int_corpus(spark, sf_dir)
    cent = (
        emb.orderBy("vec_id")
        .limit(KM_K)
        .select(F.col("vec_id").alias("cid"), F.col("iv").alias("cv"))
    )
    assign = None
    for it in range(1, KM_ITERS + 1):
        assign = _np_assign(emb, *_cent_np(cent), "l2", ("cid", "d2"))
        if it < KM_ITERS:
            cent = _km_update(assign)
    return assign.groupBy("cid").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_vecs"),
        F.sum("d2").cast("double").alias("inertia"),
    )


def _int_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    # round 17 NEGATIVE RESULT: tables.spread() on this scan (the
    # documents-family treatment) measured a consistent LOSS on every
    # consumer in a paired same-session A/B (semdedup 1.77→2.17,
    # kmeans_clusters 1.06→1.40, ann_pq_trained 1.63→1.84,
    # pca_top2 1.87→2.13, ivf_pq 0.59→0.64): the embedding passes are
    # numpy matmuls over 2,000 rows — far lighter than the md5 text
    # passes — so the extra exchange plus multi-task scheduling costs
    # more than the parallelism returns. Left unspread on evidence.
    e = load(spark, sf_dir, "embeddings")
    return e.select("vec_id", int_vec("embedding").alias("iv"))


def _km_update(assign: DataFrame) -> DataFrame:
    """Centroid update: component partial sums (map-side combine), one
    uniform (cid, i) shuffle, re-quantized mean, array re-assembly. Takes
    the assignment ONLY — the vectors arrive projected through it, so no
    corpus-scale relation is ever on a join side."""
    comp = (
        assign.select("cid", F.posexplode("iv").alias("i", "xi"))
        .groupBy("cid", "i")
        .agg(
            F.round(
                F.sum("xi").cast("double") / F.count(F.lit(1))
            )
            .cast("bigint")
            .alias("ci")
        )
    )
    return comp.groupBy("cid").agg(
        F.expr(
            "transform(array_sort(collect_list(named_struct('i', i, 'ci', ci)),"
            " (a, b) -> a.i - b.i), s -> s.ci)"
        ).alias("cv")
    )


# --------------------------------------------------------------------------
# Spherical (cosine) k-means — SemDeDup's actual clustering geometry
# --------------------------------------------------------------------------

def spherical_kmeans(emb: DataFrame, k: int, iters: int) -> DataFrame:
    """Spherical k-means (Dhillon & Modha 2001): maximize cosine to the
    centroid instead of minimizing L2. The centroid update is the SAME
    re-quantized component mean as Lloyd (_km_update): the published
    normalized-mean update only changes the centroid's LENGTH, cosine
    assignment is scale-invariant in the centroid, and staying on the
    int grid keeps iterations bit-identical across engines — so the
    un-normalized mean IS the normalized-mean variant with one fewer
    float pass. Seeds = the k lowest vec_ids. Returns the final
    assignment with every input column riding through plus (cid, dotv).
    Zero joins between corpus-scale relations: assignment is the
    vectorized map-side _np_assign (round 16: numpy matmul per Arrow
    batch, centroids driver-collected per round — the MLlib pattern),
    the update shuffles only (cid, component) partial sums."""
    cent = (
        emb.select("vec_id", "iv")
        .orderBy("vec_id")
        .limit(k)
        .select(F.col("vec_id").alias("cid"), F.col("iv").alias("cv"))
    )
    assign = None
    for it in range(1, iters + 1):
        assign = _np_assign(emb, *_cent_np(cent), "cos", ("cid", "dotv"))
        if it < iters:
            cent = _km_update(
                assign.select("cid", "iv")
            )
    return assign


def cos_chain_sql(k: int | str, iters: int = KM_ITERS) -> tuple[str, str]:
    """(CTE fragment, final-assignment CTE name) for an unrolled
    spherical k-means chain over an exploded int view named ``iv``
    (vec_id, i, xi). Shared by the embedding_kmeans_cosine oracle and
    the spherical SemDeDup blocking oracle (pipeline9), so the two
    gates provably replay the SAME clustering. ``k`` may be an int or a
    SQL expression string (e.g. a scalar subquery deriving K from the
    corpus size — the sem_auto_k twin); it lands in the seed LIMIT."""
    steps = []
    prev = "c0"
    for it in range(1, iters + 1):
        steps.append(f"""
n{it} AS (
    SELECT cid, SUM(ci * ci) AS cn FROM {prev} GROUP BY cid
),
d{it} AS (
    SELECT iv.vec_id, c.cid, SUM(iv.xi * c.ci) AS dot
    FROM iv JOIN {prev} c ON iv.i = c.i
    GROUP BY 1, 2
),
s{it} AS (
    SELECT d.vec_id, d.cid, d.dot,
           CASE WHEN n.cn = 0 THEN CAST('-infinity' AS DOUBLE)
                ELSE CAST(d.dot AS DOUBLE) / SQRT(CAST(n.cn AS DOUBLE))
           END AS sc
    FROM d{it} d JOIN n{it} n ON d.cid = n.cid
),
a{it} AS (
    SELECT vec_id, cid, dot FROM (
        SELECT vec_id, cid, dot,
               ROW_NUMBER() OVER (
                   PARTITION BY vec_id ORDER BY sc DESC, cid) AS r
        FROM s{it}
    ) WHERE r = 1
)""")
        if it < iters:
            steps.append(f"""
c{it} AS (
    SELECT a.cid, iv.i,
           CAST(ROUND(CAST(SUM(iv.xi) AS DOUBLE) / COUNT(*)) AS BIGINT) AS ci
    FROM a{it} a JOIN iv ON a.vec_id = iv.vec_id
    GROUP BY 1, 2
)""")
        prev = f"c{it}"
    chain = ",".join(steps)
    frag = f"""
c0 AS (
    SELECT vec_id AS cid, i, xi AS ci FROM iv
    WHERE vec_id IN (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT {k})
),{chain}"""
    return frag, f"a{iters}"


def _km_cos_oracle() -> str:
    chain, final = cos_chain_sql(KM_K)
    return f"""
WITH iv AS ({SQL_IV}),{chain}
SELECT cid,
       CAST(COUNT(*) AS BIGINT) AS n_vecs,
       CAST(SUM(dot) AS BIGINT) AS sum_dot
FROM {final}
GROUP BY cid
"""


@register(
    "embedding_kmeans_cosine",
    oracle=_km_cos_oracle(),
    tags=("similarity", "kmeans", "cosine", "clustering", "training"),
)
def embedding_kmeans_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spherical k-means gate (round 15, VERDICT r14 Next #3): {KM_K}
    seeds, {KM_ITERS} max-cosine assignment / re-quantized-mean update
    rounds, reporting per-cluster size and the exact integer sum of
    dot(x, c) to the assigned centroid (sum-of-cosines would be an
    order-dependent float sum; the BIGINT dot total is the
    deterministic signature of the same assignment).

    This is the clustering the published SemDeDup recipe actually runs
    (Abbas et al. 2023 cluster on cosine, not L2) —
    dedup_semantic_semdedup_cos blocks on exactly this assignment. Same
    100 TB shape as the L2 gate: K×d broadcast, map-side assignment,
    (cid, component) partial-sum update, corpus never on a join side."""
    assign = spherical_kmeans(_int_corpus(spark, sf_dir), KM_K, KM_ITERS)
    return assign.groupBy("cid").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_vecs"),
        F.sum("dotv").cast("bigint").alias("sum_dot"),
    )


# --------------------------------------------------------------------------
# Product quantization + ADC top-k
# --------------------------------------------------------------------------

PQ_M = 4  #: subspaces (64 dims → 4 × 16)
PQ_SUB = 16  #: dims per subspace
PQ_K = 16  #: codewords per subspace; donors = 16 lowest non-probe ids


def _pq_oracle() -> str:
    return f"""
WITH iv AS ({SQL_IV}),
donors AS (
    SELECT vec_id FROM embeddings WHERE vec_id >= {N_PROBES}
    ORDER BY vec_id LIMIT {PQ_K}
),
cw AS (
    SELECT vec_id AS cid, (i - 1) // {PQ_SUB} AS m,
           (i - 1) % {PQ_SUB} AS si, xi AS ci
    FROM iv WHERE vec_id IN (SELECT vec_id FROM donors)
),
corpus AS (
    SELECT vec_id, (i - 1) // {PQ_SUB} AS m, (i - 1) % {PQ_SUB} AS si, xi
    FROM iv WHERE vec_id >= {N_PROBES}
),
dists AS (
    SELECT c.vec_id, c.m, w.cid, SUM((c.xi - w.ci) * (c.xi - w.ci)) AS d2
    FROM corpus c JOIN cw w ON c.m = w.m AND c.si = w.si
    GROUP BY 1, 2, 3
),
codes AS (
    SELECT vec_id, m, cid FROM (
        SELECT vec_id, m, cid,
               ROW_NUMBER() OVER (
                   PARTITION BY vec_id, m ORDER BY d2, cid) AS r
        FROM dists
    ) WHERE r = 1
),
q AS (
    SELECT vec_id AS qid, (i - 1) // {PQ_SUB} AS m, (i - 1) % {PQ_SUB} AS si,
           xi AS qi
    FROM iv WHERE vec_id < {N_PROBES}
),
adc AS (
    SELECT q.qid, w.m, w.cid, SUM(q.qi * w.ci) AS idot
    FROM q JOIN cw w ON q.m = w.m AND q.si = w.si
    GROUP BY 1, 2, 3
),
scores AS (
    SELECT a.qid, k.vec_id, SUM(a.idot) AS s
    FROM codes k JOIN adc a ON k.m = a.m AND k.cid = a.cid
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
    "ann_pq_topk",
    oracle=_pq_oracle(),
    tags=("similarity", "ann", "pq", "quantization"),
)
def ann_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantized ANN with asymmetric distance computation: the
    64-dim vectors split into {PQ_M} subspaces of {PQ_SUB} dims; each
    subspace gets a {PQ_K}-codeword codebook (donor sub-vectors of the
    {PQ_K} lowest non-probe ids — the deterministic stand-in for
    per-subspace k-means, which embedding_kmeans_clusters supplies at
    scale); every corpus vector is ENCODED to {PQ_M} codes (16× smaller
    than the int vectors — the index that fits in memory at 100 TB); each
    query builds a {PQ_M}×{PQ_K} ADC table of exact-int sub-dot-products
    and scores candidates by summing {PQ_M} table lookups — no corpus
    vector is touched at query time.

    Plan shape (round 16, guide §4.2 + §2.3): codebook and ADC tables
    are driver-built (K×d + nq·M·K exact ints — metadata scale) and ship
    by broadcast variable into ONE vectorized corpus pass
    (_pq_candidates: encode + ADC-score + per-batch top-k per query);
    the only exchange left is the tiny candidate window. Codes are never
    exploded into rows and no corpus-scale (qid, vec_id) aggregate
    exists anymore."""
    emb = _int_corpus(spark, sf_dir)
    corpus = emb.filter(F.col("vec_id") >= N_PROBES)
    qids, Q, _, D = _seed_probe_np(emb, N_PROBES, PQ_K)
    # per-subspace codebooks (cid-ascending: donors sorted by vec_id) and
    # exact-int ADC tables ADC[m][q, c] = Q_m(q) · CB_m(c)
    CB = [D[:, m * PQ_SUB : (m + 1) * PQ_SUB] for m in range(PQ_M)]
    ADC = [
        Q[:, m * PQ_SUB : (m + 1) * PQ_SUB] @ CB[m].T for m in range(PQ_M)
    ]
    cand = _pq_candidates(corpus, CB, ADC, qids, TOP_K)
    wr = Window.partitionBy("qid").orderBy(F.desc("s"), F.asc("vec_id"))
    return (
        cand.withColumn("rnk", F.row_number().over(wr))
        .filter(F.col("rnk") <= TOP_K)
        .select("qid", "vec_id", F.col("s").cast("double").alias("adc_dot"), "rnk")
    )


# --------------------------------------------------------------------------
# Trained product quantization: per-subspace Lloyd codebooks + ADC recall
# --------------------------------------------------------------------------

PQT_ITERS = 2  #: Lloyd rounds per subspace codebook (oracle-unrolled)


def _pqt_oracle() -> str:
    """Unrolled per-subspace Lloyd chain + ADC scoring + recall vs the
    exact top-k over the same non-probe candidate set."""
    steps = []
    prev = "c0"
    for it in range(1, PQT_ITERS + 1):
        steps.append(f"""
dd{it} AS (
    SELECT s.vec_id, s.m, c.cid, SUM((s.xi - c.ci) * (s.xi - c.ci)) AS d2
    FROM sub s JOIN {prev} c ON s.m = c.m AND s.si = c.si
    GROUP BY 1, 2, 3
),
a{it} AS (
    SELECT vec_id, m, cid FROM (
        SELECT vec_id, m, cid,
               ROW_NUMBER() OVER (
                   PARTITION BY vec_id, m ORDER BY d2, cid) AS r
        FROM dd{it}
    ) WHERE r = 1
)""")
        if it < PQT_ITERS:
            steps.append(f"""
c{it} AS (
    SELECT a.cid, s.m, s.si,
           CAST(ROUND(CAST(SUM(s.xi) AS DOUBLE) / COUNT(*)) AS BIGINT) AS ci
    FROM a{it} a JOIN sub s ON a.vec_id = s.vec_id AND a.m = s.m
    GROUP BY 1, 2, 3
)""")
        prev = f"c{it}"
    chain = ",".join(steps)
    final_cb = f"c{PQT_ITERS - 1}" if PQT_ITERS > 1 else "c0"
    return f"""
WITH iv AS ({SQL_IV}),
sub AS (
    SELECT vec_id, (i - 1) // {PQ_SUB} AS m, (i - 1) % {PQ_SUB} AS si, xi
    FROM iv WHERE vec_id >= {N_PROBES}
),
c0 AS (
    SELECT vec_id AS cid, m, si, xi AS ci FROM sub
    WHERE vec_id IN (SELECT vec_id FROM embeddings
                     WHERE vec_id >= {N_PROBES}
                     ORDER BY vec_id LIMIT {PQ_K})
),{chain},
q AS (
    SELECT vec_id AS qid, (i - 1) // {PQ_SUB} AS m,
           (i - 1) % {PQ_SUB} AS si, xi AS qi
    FROM iv WHERE vec_id < {N_PROBES}
),
adc AS (
    SELECT q.qid, c.m, c.cid, SUM(q.qi * c.ci) AS idot
    FROM q JOIN {final_cb} c ON q.m = c.m AND q.si = c.si
    GROUP BY 1, 2, 3
),
scores AS (
    SELECT a.qid, k.vec_id, SUM(a.idot) AS s
    FROM a{PQT_ITERS} k JOIN adc a ON k.m = a.m AND k.cid = a.cid
    GROUP BY 1, 2
),
pq AS (
    SELECT qid, vec_id FROM (
        SELECT qid, vec_id,
               ROW_NUMBER() OVER (
                   PARTITION BY qid ORDER BY s DESC, vec_id) AS rnk
        FROM scores
    ) WHERE rnk <= {TOP_K}
),
exact_dots AS (
    SELECT q.qid, s.vec_id, SUM(s.xi * q.qi) AS idot
    FROM sub s JOIN q ON s.m = q.m AND s.si = q.si
    GROUP BY 1, 2
),
exact AS (
    SELECT qid, vec_id FROM (
        SELECT qid, vec_id,
               ROW_NUMBER() OVER (
                   PARTITION BY qid ORDER BY idot DESC, vec_id) AS rnk
        FROM exact_dots
    ) WHERE rnk <= {TOP_K}
),
hits AS (
    SELECT e.qid, COUNT(*) AS n_hits
    FROM exact e JOIN pq p ON e.qid = p.qid AND e.vec_id = p.vec_id
    GROUP BY 1
)
SELECT qs.qid,
       CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,
       CAST(COALESCE(h.n_hits, 0) AS DOUBLE) / {TOP_K} AS recall
FROM (SELECT DISTINCT qid FROM q) qs LEFT JOIN hits h ON qs.qid = h.qid
"""


@register(
    "ann_pq_trained_topk",
    oracle=_pqt_oracle(),
    tags=("similarity", "ann", "pq", "quantization", "training"),
)
def ann_pq_trained_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end trained product quantization (round 14, VERDICT r13
    Next #3): per-subspace codebooks come from {PQT_ITERS} rounds of the
    SAME distributed Lloyd recipe as embedding_kmeans_clusters (seeds =
    the {PQ_K} lowest non-probe ids' sub-vectors, re-quantized bigint
    means), instead of ann_pq_topk's deterministic donor stand-ins —
    then the corpus is encoded against the trained codebook, queries
    score via ADC lookups, and the gate reports per-query RECALL against
    the exact top-{TOP_K} over the same candidate set.

    Plan shape (round 16, guide §4.2 + §1.2): each training round is ONE
    vectorized corpus pass (_pqt_partials — encode + M·K·{PQ_SUB}
    map-combined partial sums; the shuffle width is unchanged, the
    corpus-scale posexplode feeding it is gone); the codebook update
    (ROUND(sum/count) — the identical float64 op sequence, see
    _round_half_up) folds on the driver between passes. Serving + the
    exact recall yardstick share ONE final corpus pass
    (_pqt_candidates), emitting only per-batch top-k candidates —
    no corpus-scale (qid, vec_id) aggregate, no brute-force crossJoin
    leg, and the update's two-consumer checkpoint dance is obsolete."""
    import numpy as np

    emb = _int_corpus(spark, sf_dir)
    corpus = emb.filter(F.col("vec_id") >= N_PROBES)
    qids, Q, _, D = _seed_probe_np(emb, N_PROBES, PQ_K)
    CB = [D[:, m * PQ_SUB : (m + 1) * PQ_SUB] for m in range(PQ_M)]
    for _ in range(PQT_ITERS - 1):
        rows = _pqt_partials(corpus, CB).collect()
        # rebuild per subspace keeping ONLY codewords some row chose
        # (grouped-aggregate semantics), in k-ascending order — which is
        # cid-ascending, preserving the argmin lowest-cid tie rule
        upd: list[dict[int, dict[int, int]]] = [
            {} for _ in range(PQ_M)
        ]
        for r in rows:
            # ROUND(sum/count): two correctly-rounded casts + one IEEE
            # divide on identical operands, HALF_UP — as the expression
            upd[r["m"]].setdefault(int(r["k"]), {})[int(r["si"])] = (
                _round_half_up(float(r["s"]) / float(r["c"]))
            )
        CB = [
            np.array(
                [
                    [upd[m][kk][si] for si in range(PQ_SUB)]
                    for kk in sorted(upd[m])
                ],
                dtype=np.int64,
            )
            for m in range(PQ_M)
        ]
    ADC = [
        Q[:, m * PQ_SUB : (m + 1) * PQ_SUB] @ CB[m].T for m in range(PQ_M)
    ]
    cand = _pqt_candidates(corpus, CB, ADC, qids, Q, TOP_K).localCheckpoint(
        eager=False  # pq and exact windows both read the single pass
    )
    wr = Window.partitionBy("qid").orderBy(F.desc("s"), F.asc("vec_id"))
    pq = (
        cand.filter(F.col("kind") == 0)
        .withColumn("rnk", F.row_number().over(wr))
        .filter(F.col("rnk") <= TOP_K)
        .select("qid", "vec_id")
    )
    exact = (
        cand.filter(F.col("kind") == 1)
        .withColumn("rnk", F.row_number().over(wr))
        .filter(F.col("rnk") <= TOP_K)
        .select("qid", "vec_id")
    )
    # both top-k sets are ≤ N_PROBES·TOP_K rows BY CONSTRUCTION — broadcast
    # them so the recall join never sort-merges corpus-lineage relations
    hits = exact.join(F.broadcast(pq), ["qid", "vec_id"]).groupBy("qid").agg(
        F.count(F.lit(1)).alias("n_hits")
    )
    qdf = spark.createDataFrame(
        [(int(q),) for q in qids], "qid bigint"
    )
    return qdf.join(F.broadcast(hits), "qid", "left").select(
        "qid",
        F.coalesce(F.col("n_hits"), F.lit(0)).cast("bigint").alias("n_hits"),
        (
            F.coalesce(F.col("n_hits"), F.lit(0)).cast("double") / TOP_K
        ).alias("recall"),
    )


# --------------------------------------------------------------------------
# PCA top component via distributed power iteration
# --------------------------------------------------------------------------

PCA_ITERS = 2  #: power-iteration rounds (fixed so the oracle unrolls)
PCA_SCALE = 1_000_000  #: loading re-quantization scale per round


def _pca_oracle() -> str:
    steps = []
    prev = "v0"
    for t in range(1, PCA_ITERS + 1):
        steps.append(f"""
s{t} AS (
    SELECT iv.vec_id, SUM(iv.xi * v.v) AS s
    FROM iv JOIN {prev} v ON iv.i = v.i
    GROUP BY iv.vec_id
),
y{t} AS (
    SELECT iv.i, SUM(CAST(s.s AS HUGEINT) * iv.xi) AS y
    FROM iv JOIN s{t} s ON iv.vec_id = s.vec_id
    GROUP BY iv.i
),
m{t} AS (SELECT MAX(ABS(y)) AS m FROM y{t}),
v{t} AS (
    SELECT i, CAST(ROUND(CAST(y AS DOUBLE) / CAST(m AS DOUBLE)
                         * {PCA_SCALE}) AS BIGINT) AS v
    FROM y{t}, m{t}
)""")
        prev = f"v{t}"
    chain = ",".join(steps)
    return f"""
WITH iv AS ({SQL_IV}),
v0 AS (SELECT CAST(i AS BIGINT) AS i, CAST({PCA_SCALE} AS BIGINT) AS v
       FROM range(1, 65) t(i)),{chain}
SELECT i, v AS loading FROM v{PCA_ITERS}
"""


def _round_half_up(x: float) -> int:
    """Driver-side replica of Spark's ROUND(double): RoundBase quantizes
    the double's SHORTEST decimal representation (BigDecimal.valueOf)
    with HALF_UP (ties away from zero). Python's repr() is the same
    shortest round-trip decimal and decimal.ROUND_HALF_UP the same tie
    rule, so intermediate power-iteration vectors re-quantized here are
    bit-identical to the DataFrame expression they replace
    (tests/test_plans.py::test_round_half_up_matches_spark pins the
    boundary cases)."""
    import decimal

    return int(
        decimal.Decimal(repr(float(x))).quantize(
            decimal.Decimal(1), rounding=decimal.ROUND_HALF_UP
        )
    )


def _lit_bigint_array(vals) -> str:
    """SQL literal for an exact BIGINT array (a driver-computed
    direction vector entering a corpus pass as a constant — no 1-row
    crossJoin/broadcast build per round)."""
    return (
        "array(" + ", ".join(f"CAST({int(v)} AS BIGINT)" for v in vals) + ")"
    )


def _pca_ys(emb: DataFrame, vecs, names) -> DataFrame:
    """One corpus pass computing y_j = Xᵀ(X·v_j) for SEVERAL literal
    direction vectors at once (independent directions share the scan and
    the 64-key shuffle). Vectorized (round 16, guide §4.2 — the
    interpreted fold + posexplode ran 64·N rows through one task): two
    numpy matmuls per Arrow batch emit a 64-row EXACT partial sum, and
    ONE 64-key decimal(38,0) aggregate folds the per-batch partials
    (map-combined — the shuffle carries 64 keys regardless of corpus
    size, exactly as before).

    Exactness: s = X·v is exact int64 (|s| ≤ 64·2^20·2^21 < 2^47, bound
    asserted per batch); Xᵀ·s splits s = hi·2^23 + lo so each int64
    matmul accumulates ≤ 2^17 terms of ≤ 2^45 — overflow-free — and the
    halves recombine into arbitrary-precision Python ints, so the
    decimal(38,0) totals are THE SAME integers the fold produced."""
    import numpy as np
    from pyspark.sql.types import (
        DecimalType,
        IntegerType,
        StructField,
        StructType,
    )

    V = np.array([[int(x) for x in v] for v in vecs], dtype=np.int64)
    spark = emb.sparkSession
    bc = spark.sparkContext.broadcast(V)
    schema = StructType(
        [StructField("i", IntegerType(), False)]
        + [StructField(n, DecimalType(38, 0), False) for n in names]
    )
    cols = list(names)

    def fn(batches):
        import numpy as np
        import pyarrow as pa

        from quiver_spark.operators.similarity2 import _list_matrix

        V_ = bc.value
        k, d = V_.shape
        idx = pa.array(range(1, d + 1), type=pa.int32())
        dect = pa.decimal128(38, 0)
        SH, CH = 23, 1 << 17
        for batch in batches:
            n = batch.num_rows
            if n == 0:
                continue
            X = _list_matrix(batch.column(0), n)
            if int(np.abs(X).max(initial=0)) >= (1 << 21):
                raise ValueError(
                    "embedding component exceeds the exact-matmul bound"
                )
            ys = []
            for j in range(k):
                s = X @ V_[j]
                hi = s >> SH
                lo = s - (hi << SH)
                acc_hi = [0] * d
                acc_lo = [0] * d
                for c0 in range(0, n, CH):
                    Xc = X[c0 : c0 + CH]
                    h = Xc.T @ hi[c0 : c0 + CH]
                    low = Xc.T @ lo[c0 : c0 + CH]
                    for i in range(d):
                        acc_hi[i] += int(h[i])
                        acc_lo[i] += int(low[i])
                ys.append(
                    pa.array(
                        [(a << SH) + b for a, b in zip(acc_hi, acc_lo)],
                        type=dect,
                    )
                )
            yield pa.RecordBatch.from_arrays([idx] + ys, names=["i"] + cols)

    part = emb.select("iv").mapInArrow(fn, schema)
    return part.groupBy("i").agg(*[F.sum(n).alias(n) for n in cols])


def _pca_y(emb: DataFrame, vvals) -> DataFrame:
    """One power-iteration corpus pass y = Xᵀ(X·v) against a LITERAL
    direction vector (see _pca_ys)."""
    return _pca_ys(emb, [vvals], ["y"])


def _renorm_py(yrows) -> list[int]:
    """Driver renorm of a collected 64-row y: v_i = ROUND(y_i/max|y|·S),
    the exact float64 op sequence of the renorm DataFrame expression
    (decimal→double casts are correctly rounded in all three engines;
    the divide/multiply see identical operands)."""
    ys = [int(r["y"]) for r in sorted(yrows, key=lambda r: r["i"])]
    m = float(max(abs(y) for y in ys))
    return [_round_half_up(float(y) / m * PCA_SCALE) for y in ys]


@register(
    "embedding_pca_power_iteration",
    oracle=_pca_oracle(),
    tags=("similarity", "pca", "training"),
)
def embedding_pca_power_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dominant principal direction of the (uncentered) embedding corpus
    via {PCA_ITERS} distributed power-iteration rounds — the
    dimensionality-reduction / whitening trainer next to the k-means and
    PQ trainers. Per round: ``s = X·v`` is a map-side fold against the
    broadcast 64-component direction (the corpus never shuffles for it),
    ``y = Xᵀ·s`` is ONE posexplode aggregate whose shuffle carries 64
    keys of map-combined partial sums regardless of corpus size, and the
    direction re-quantizes by its max-magnitude component.

    Determinism: X entries and v are scaled BIGINTs, so s is an exact
    integer fold; the y sums are exact 38-digit decimal integers (DuckDB
    mirrors with HUGEINT — same integers); each round's only
    floating-point steps are two casts of identical exact integers and
    one IEEE divide+round. Sign is pinned by the all-positive seed.

    Round-16 shape (guide §1.2 — fewer, cheaper jobs, same math): power
    iteration is inherently sequential, so each INTERMEDIATE round
    collects its 64-row y to the driver and re-quantizes there
    (_renorm_py — the identical float64 op sequence), feeding the next
    round a literal direction vector. That removes the per-round lazy
    localCheckpoint cascade, its broadcast builds, and the 1-row
    crossJoins (measured: 1.41 s → ~0.6 s at sf0.1). The FINAL round's
    renorm stays a DataFrame expression, so the emitted loadings are
    rounded by Spark itself."""
    emb = _int_corpus(spark, sf_dir)
    v = [PCA_SCALE] * 64
    for _ in range(PCA_ITERS - 1):
        v = _renorm_py(_pca_y(emb, v).collect())
    y = _pca_y(emb, v).localCheckpoint(eager=False)  # two consumers
    m = y.agg(F.max(F.abs(F.col("y"))).alias("m"))
    return y.crossJoin(F.broadcast(m)).select(
        "i",
        F.round(
            F.col("y").cast("double") / F.col("m").cast("double") * PCA_SCALE
        )
        .cast("bigint")
        .alias("loading"),
    )

# --------------------------------------------------------------------------
# PCA top-2 via deflation (the whitening/reduction trainer, second axis)
# --------------------------------------------------------------------------


def _pca2_oracle() -> str:
    """v1 chain (as in _pca_oracle), then cy = C·v1 once, then PCA_ITERS
    rounds of DEFLATED power iteration for u: the second-axis update is
    num_i = (C·u)_i · S − ratio · cy_i with ratio = ROUND(S·(v1·u)/(v1·v1))
    — all exact HUGEINT until the single normalization divide."""
    steps = []
    prev = "v0"
    for t in range(1, PCA_ITERS + 1):
        steps.append(f"""
s{t} AS (
    SELECT iv.vec_id, SUM(iv.xi * v.v) AS s
    FROM iv JOIN {prev} v ON iv.i = v.i
    GROUP BY iv.vec_id
),
y{t} AS (
    SELECT iv.i, SUM(CAST(s.s AS HUGEINT) * iv.xi) AS y
    FROM iv JOIN s{t} s ON iv.vec_id = s.vec_id
    GROUP BY iv.i
),
m{t} AS (SELECT MAX(ABS(y)) AS m FROM y{t}),
v{t} AS (
    SELECT i, CAST(ROUND(CAST(y AS DOUBLE) / CAST(m AS DOUBLE)
                         * {PCA_SCALE}) AS BIGINT) AS v
    FROM y{t}, m{t}
)""")
        prev = f"v{t}"
    v1 = prev
    usteps = []
    uprev = "u0"
    for t in range(1, PCA_ITERS + 1):
        usteps.append(f"""
su{t} AS (
    SELECT iv.vec_id, SUM(iv.xi * u.v) AS s
    FROM iv JOIN {uprev} u ON iv.i = u.i
    GROUP BY iv.vec_id
),
yu{t} AS (
    SELECT iv.i, SUM(CAST(s.s AS HUGEINT) * iv.xi) AS y
    FROM iv JOIN su{t} s ON iv.vec_id = s.vec_id
    GROUP BY iv.i
),
rat{t} AS (
    SELECT CAST(ROUND(
        CAST((SELECT SUM(CAST(v.v AS HUGEINT) * u.v)
              FROM {v1} v JOIN {uprev} u ON v.i = u.i) AS DOUBLE)
        / CAST((SELECT SUM(CAST(v.v AS HUGEINT) * v.v) FROM {v1} v)
               AS DOUBLE) * {PCA_SCALE}) AS HUGEINT) AS r
),
num{t} AS (
    SELECT y.i, y.y * {PCA_SCALE} - rat{t}.r * cy.y AS num
    FROM yu{t} y JOIN cy ON y.i = cy.i, rat{t}
),
mu{t} AS (SELECT MAX(ABS(num)) AS m FROM num{t}),
u{t} AS (
    SELECT i, CAST(ROUND(CAST(num AS DOUBLE) / CAST(m AS DOUBLE)
                         * {PCA_SCALE}) AS BIGINT) AS v
    FROM num{t}, mu{t}
)""")
        uprev = f"u{t}"
    chain = ",".join(steps)
    uchain = ",".join(usteps)
    return f"""
WITH iv AS ({SQL_IV}),
v0 AS (SELECT CAST(i AS BIGINT) AS i, CAST({PCA_SCALE} AS BIGINT) AS v
       FROM range(1, 65) t(i)),{chain},
sc AS (
    SELECT iv.vec_id, SUM(iv.xi * v.v) AS s
    FROM iv JOIN {v1} v ON iv.i = v.i
    GROUP BY iv.vec_id
),
cy AS (
    SELECT iv.i, SUM(CAST(s.s AS HUGEINT) * iv.xi) AS y
    FROM iv JOIN sc s ON iv.vec_id = s.vec_id
    GROUP BY iv.i
),
u0 AS (SELECT CAST(i AS BIGINT) AS i,
              CAST(CASE WHEN i % 2 = 0 THEN {PCA_SCALE}
                   ELSE -{PCA_SCALE} END AS BIGINT) AS v
       FROM range(1, 65) t(i)),{uchain}
SELECT v.i, v.v AS loading1, u.v AS loading2
FROM {v1} v JOIN {uprev} u ON v.i = u.i
"""


@register(
    "embedding_pca_top2_deflation",
    oracle=_pca2_oracle(),
    tags=("similarity", "pca", "deflation", "training"),
)
def embedding_pca_top2_deflation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SECOND principal direction via deflation (round 14) — the axis a
    whitening/reduction pipeline needs after
    embedding_pca_power_iteration's dominant one: u iterates under the
    DEFLATED operator C − λ1·v1v1ᵀ/(v1ᵀv1), expressed without ever
    materializing C: per round, C·u is the same two-pass fold/aggregate
    as the top-1 chain, and the deflation term reuses ONE fixed
    ``cy = C·v1`` corpus aggregate, so each extra round costs one corpus
    pass — not a Gram matrix.

    Exact-integer discipline (the driver hash-compares): the update
    numerator is ``(C·u)_i·S − ratio·cy_i`` where
    ``ratio = ROUND(S·(v1·u)/(v1·v1))`` — v1·u and v1·v1 are exact
    BIGINT dots (< 2^53, so the one IEEE divide is on identical
    operands), and the numerator stays exact 38-digit decimal (DuckDB
    HUGEINT mirrors it); the common 1/S factor cancels in the max-abs
    re-quantization. The alternating-sign seed keeps u0 from being
    parallel to the (all-positive-seeded) v1.

    Round-16 shape (guide §1.2 — fewer, cheaper jobs, same math): like
    embedding_pca_power_iteration, every INTERMEDIATE 64-row
    renorm/ratio step runs on the driver (_renorm_py/_round_half_up —
    the identical float64 op sequence, pinned by
    test_round_half_up_matches_spark), feeding each corpus pass a
    literal direction vector; and cy = C·v1 shares ONE corpus pass with
    the first u round (_pca_ys — independent directions reuse the scan
    and the 64-key shuffle). 2·PCA_ITERS+1 corpus passes become
    PCA_ITERS+PCA_ITERS−1+1 with no checkpoint cascade, no broadcast
    builds, no 64-row joins. The FINAL round's numerator + renorm stay
    DataFrame expressions, so the emitted loadings are rounded by Spark
    itself."""
    emb = _int_corpus(spark, sf_dir)

    # --- top-1 chain (identical math to embedding_pca_power_iteration;
    #     v1 is consumed numerically below, so all rounds driver-renorm) ---
    v = [PCA_SCALE] * 64
    for _ in range(PCA_ITERS):
        v = _renorm_py(_pca_y(emb, v).collect())
    v1 = v
    vv = sum(x * x for x in v1)  # exact int — the decimal(38,0) dot

    # --- deflated power iteration for u ---
    u = [PCA_SCALE if i % 2 == 0 else -PCA_SCALE for i in range(1, 65)]
    cy: list[int] = []

    def ratio(uvec) -> int:
        # ROUND(S·(v1·u)/(v1·v1)): exact int dots, then the same two
        # correctly-rounded casts + IEEE divide/multiply as the
        # expression it replaces
        uv = sum(a * b for a, b in zip(v1, uvec))
        return _round_half_up(float(uv) / float(vv) * PCA_SCALE)

    if PCA_ITERS == 1:
        rows = sorted(
            _pca_ys(emb, [v1], ["cy"]).collect(), key=lambda r: r["i"]
        )
        cy = [int(r["cy"]) for r in rows]
    # driver rounds 1..PCA_ITERS−1 (the final round stays in Spark below)
    for t in range(1, PCA_ITERS):
        if t == 1:
            # cy = C·v1 and the first u round share one corpus pass
            rows = sorted(
                _pca_ys(emb, [v1, u], ["cy", "yu"]).collect(),
                key=lambda r: r["i"],
            )
            cy = [int(r["cy"]) for r in rows]
            yu = [int(r["yu"]) for r in rows]
        else:
            yu = [
                int(r["y"])
                for r in sorted(
                    _pca_y(emb, u).collect(), key=lambda r: r["i"]
                )
            ]
        r = ratio(u)
        num = [y * PCA_SCALE - r * c for y, c in zip(yu, cy)]
        m = float(max(abs(x) for x in num))
        u = [_round_half_up(float(x) / m * PCA_SCALE) for x in num]

    # final round: numerator + renorm as DataFrame expressions over the
    # last corpus pass (checkpointed — num feeds both m and the output)
    rfin = ratio(u)
    cyarr = (
        "array("
        + ", ".join(f"CAST({int(c)} AS DECIMAL(38,0))" for c in cy)
        + ")"
    )
    y = _pca_y(emb, u).localCheckpoint(eager=False)
    num = y.select(
        "i",
        (
            F.col("y") * F.lit(PCA_SCALE).cast("decimal(38,0)")
            - F.lit(int(rfin)).cast("decimal(38,0)")
            * F.expr(f"element_at({cyarr}, CAST(i AS INT))")
        ).alias("num"),
    )
    m = num.agg(F.max(F.abs(F.col("num"))).alias("m"))
    v1arr = _lit_bigint_array(v1)
    return num.crossJoin(F.broadcast(m)).select(
        "i",
        F.expr(f"element_at({v1arr}, CAST(i AS INT))").alias("loading1"),
        F.round(
            F.col("num").cast("double") / F.col("m").cast("double")
            * PCA_SCALE
        )
        .cast("bigint")
        .alias("loading2"),
    )
