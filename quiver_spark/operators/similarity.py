"""Similarity search over embedding columns (driver mandate): brute-force
top-k (the correctness baseline) and blocked near-duplicate detection (the
scale path — candidate pairs only form inside a blocking key).

Determinism: embeddings are quantized to scaled BIGINTs (functions.int_vec),
so dot products are exact integer sums — bit-identical in Spark and DuckDB —
and the only floating-point steps (sqrt / divide) are single IEEE ops on
identical operands.

Scale posture: the query side of ann_* is broadcast (small set of probe
vectors); candidates never shuffle. Near-dup blocks on `label` so the
quadratic term is bounded per block (at 100 TB you'd block on an LSH bucket
or IVF centroid id — same plan shape, see dedup_minhash_pairs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window
from pyspark.sql import functions as F

from quiver_spark.functions import int_dot, int_vec
from quiver_spark.registry import register
from quiver_spark.tables import load

N_PROBES = 5  # ann_* uses vec_id < N_PROBES as the probe set
TOP_K = 10

#: DuckDB: embeddings exploded to (vec_id, label, i, scaled-int component).
SQL_IV = """
SELECT vec_id, label, generate_subscripts(embedding, 1) AS i,
       CAST(ROUND(CAST(unnest(embedding) AS DOUBLE) * 1000000) AS BIGINT) AS xi
FROM embeddings
"""


def _int_emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings")
    return e.select("vec_id", "label", int_vec("embedding").alias("iv"))


@register(
    "ann_dot_topk",
    oracle=f"""
WITH iv AS ({SQL_IV}),
q AS (SELECT vec_id AS qid, i, xi AS qi FROM iv WHERE vec_id < {N_PROBES}),
dots AS (
    SELECT q.qid, iv.vec_id, SUM(iv.xi * q.qi) AS idot
    FROM iv JOIN q ON iv.i = q.i AND iv.vec_id <> q.qid
    GROUP BY q.qid, iv.vec_id
),
ranked AS (
    SELECT qid, vec_id, CAST(idot AS DOUBLE) AS dot,
           ROW_NUMBER() OVER (PARTITION BY qid ORDER BY idot DESC, vec_id) AS rnk
    FROM dots
)
SELECT qid, vec_id, dot, rnk FROM ranked WHERE rnk <= {TOP_K}
""",
    tags=("similarity", "ann"),
)
def ann_dot_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force inner-product top-k: probes broadcast against the corpus,
    exact integer dot products, per-probe ranked window."""
    emb = _int_emb(spark, sf_dir)
    q = emb.filter(F.col("vec_id") < N_PROBES).select(
        F.col("vec_id").alias("qid"), F.col("iv").alias("qv")
    )
    pairs = emb.join(F.broadcast(q), F.col("vec_id") != F.col("qid"))
    scored = pairs.select(
        "qid", "vec_id", int_dot("iv", "qv").alias("idot")
    )
    w = Window.partitionBy("qid").orderBy(F.desc("idot"), F.asc("vec_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOP_K)
        .select("qid", "vec_id", F.col("idot").cast("double").alias("dot"), "rnk")
    )


@register(
    "ann_cosine_topk",
    oracle=f"""
WITH iv AS ({SQL_IV}),
norms AS (SELECT vec_id, SUM(xi * xi) AS nrm FROM iv GROUP BY vec_id),
q AS (SELECT vec_id AS qid, i, xi AS qi FROM iv WHERE vec_id < {N_PROBES}),
dots AS (
    SELECT q.qid, iv.vec_id, SUM(iv.xi * q.qi) AS idot
    FROM iv JOIN q ON iv.i = q.i AND iv.vec_id <> q.qid
    GROUP BY q.qid, iv.vec_id
),
scored AS (
    SELECT d.qid, d.vec_id,
           CAST(d.idot AS DOUBLE) / (SQRT(CAST(nq.nrm AS DOUBLE)) * SQRT(CAST(nc.nrm AS DOUBLE))) AS cos
    FROM dots d
    JOIN norms nq ON d.qid = nq.vec_id
    JOIN norms nc ON d.vec_id = nc.vec_id
),
ranked AS (
    SELECT qid, vec_id, cos,
           ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rnk
    FROM scored
)
SELECT qid, vec_id, cos, rnk FROM ranked WHERE rnk <= {TOP_K}
""",
    tags=("similarity", "ann", "cosine"),
)
def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k (exact integer dot + norms, one IEEE
    division per pair)."""
    emb = _int_emb(spark, sf_dir).withColumn("nrm", int_dot("iv", "iv"))
    q = emb.filter(F.col("vec_id") < N_PROBES).select(
        F.col("vec_id").alias("qid"),
        F.col("iv").alias("qv"),
        F.col("nrm").alias("qnrm"),
    )
    pairs = emb.join(F.broadcast(q), F.col("vec_id") != F.col("qid"))
    scored = pairs.select(
        "qid",
        "vec_id",
        (
            int_dot("iv", "qv").cast("double")
            / (F.sqrt(F.col("qnrm").cast("double")) * F.sqrt(F.col("nrm").cast("double")))
        ).alias("cos"),
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOP_K)
        .select("qid", "vec_id", "cos", "rnk")
    )


@register(
    "embedding_norm_stats",
    oracle=f"""
WITH iv AS ({SQL_IV}),
norms AS (SELECT vec_id, label, SUM(xi * xi) AS nrm
          FROM iv GROUP BY vec_id, label)
SELECT label, COUNT(*) AS cnt,
       CAST(SUM(nrm) AS DOUBLE) / COUNT(*) AS avg_sq_norm,
       CAST(MIN(nrm) AS BIGINT) AS min_sq_norm,
       CAST(MAX(nrm) AS BIGINT) AS max_sq_norm
FROM norms
GROUP BY label
""",
    tags=("similarity", "stats"),
)
def embedding_norm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label squared-norm statistics (exact integer norms)."""
    emb = _int_emb(spark, sf_dir).withColumn("nrm", int_dot("iv", "iv"))
    return emb.groupBy("label").agg(
        F.count(F.lit(1)).alias("cnt"),
        (F.sum("nrm").cast("double") / F.count(F.lit(1))).alias("avg_sq_norm"),
        F.min("nrm").cast("bigint").alias("min_sq_norm"),
        F.max("nrm").cast("bigint").alias("max_sq_norm"),
    )


NEAR_DUP_COS = 0.25


def _near_dup_oracle() -> str:
    from quiver_spark.operators.pipeline2 import _sql_lsh_signature

    from quiver_spark.operators.pipeline2 import MAX_LSH_BUCKET

    return f"""
WITH {_sql_lsh_signature()},
kept_buckets AS (
    SELECT tbl, sig AS s FROM sig
    GROUP BY tbl, sig HAVING COUNT(*) <= {MAX_LSH_BUCKET}
),
kept AS (
    SELECT sig.vec_id, sig.tbl, sig.sig FROM sig
    JOIN kept_buckets ON sig.tbl = kept_buckets.tbl
                     AND sig.sig = kept_buckets.s
),
cand AS (
    SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
    FROM kept a
    JOIN kept b ON a.tbl = b.tbl AND a.sig = b.sig
              AND a.vec_id < b.vec_id
),
norms AS (SELECT vec_id, SUM(xi * xi) AS nrm FROM iv GROUP BY vec_id),
labels AS (SELECT vec_id, MIN(label) AS label FROM iv GROUP BY vec_id),
dots AS (
    SELECT c.vec_a, c.vec_b, SUM(ia.xi * ib.xi) AS idot
    FROM cand c
    JOIN iv ia ON ia.vec_id = c.vec_a
    JOIN iv ib ON ib.vec_id = c.vec_b AND ia.i = ib.i
    GROUP BY 1, 2
)
SELECT d.vec_a, d.vec_b, la.label = lb.label AS same_label,
       CAST(idot AS DOUBLE) / (SQRT(CAST(na.nrm AS DOUBLE)) * SQRT(CAST(nb.nrm AS DOUBLE))) AS cos
FROM dots d
JOIN norms na ON d.vec_a = na.vec_id
JOIN norms nb ON d.vec_b = nb.vec_id
JOIN labels la ON d.vec_a = la.vec_id
JOIN labels lb ON d.vec_b = lb.vec_id
WHERE CAST(idot AS DOUBLE) / (SQRT(CAST(na.nrm AS DOUBLE)) * SQRT(CAST(nb.nrm AS DOUBLE))) > {NEAR_DUP_COS}
"""


@register(
    "embedding_near_dup",
    oracle=_near_dup_oracle(),
    tags=("similarity", "dedup", "blocked"),
)
def embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate pairs blocked on the random-hyperplane LSH bucket
    (pipeline2._lsh_signature) — the 100 TB-safe blocking key: buckets are
    data-determined and exponentially unlikely to go hot, unlike a
    categorical `label` whose hottest value makes label-blocking quadratic.
    Emits whether the near-dups also agree on `label` (cross-label
    near-dups are the interesting dedup signal)."""
    from quiver_spark.operators.pipeline2 import _lsh_signature

    from quiver_spark.operators.pipeline2 import MAX_LSH_BUCKET

    sig = _lsh_signature(spark, sf_dir).localCheckpoint()
    kept_buckets = (
        sig.groupBy("tbl", "sig")
        .agg(F.count(F.lit(1)).alias("bsz"))
        .filter(F.col("bsz") <= MAX_LSH_BUCKET)
        .select("tbl", "sig")
    )
    sig = sig.join(kept_buckets, ["tbl", "sig"])
    a = sig.select(F.col("vec_id").alias("vec_a"), "tbl", "sig")
    b = sig.select(F.col("vec_id").alias("vec_b"), "tbl", "sig")
    cand = (
        a.join(b, ["tbl", "sig"])
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b")
        .distinct()
    )
    emb = _int_emb(spark, sf_dir).withColumn("nrm", int_dot("iv", "iv"))
    ea = emb.select(
        F.col("vec_id").alias("vec_a"),
        F.col("label").alias("la"),
        F.col("iv").alias("iva"),
        F.col("nrm").alias("na"),
    )
    eb = emb.select(
        F.col("vec_id").alias("vec_b"),
        F.col("label").alias("lb"),
        F.col("iv").alias("ivb"),
        F.col("nrm").alias("nb"),
    )
    pairs = cand.join(ea, "vec_a").join(eb, "vec_b")
    cos = int_dot("iva", "ivb").cast("double") / (
        F.sqrt(F.col("na").cast("double")) * F.sqrt(F.col("nb").cast("double"))
    )
    return pairs.select(
        "vec_a",
        "vec_b",
        (F.col("la") == F.col("lb")).alias("same_label"),
        cos.alias("cos"),
    ).filter(F.col("cos") > NEAR_DUP_COS)


# --------------------------------------------------------------------------
# IVF-Flat ANN (inverted-file index: centroid lists + probed search)
# --------------------------------------------------------------------------

N_CENTROIDS = 16  # deterministic coarse quantizer: 16 lowest non-probe ids
N_PROBE_LISTS = 4  # nprobe: candidate lists searched per query


def _ivf_oracle() -> str:
    cos = (
        "CAST({d}.idot AS DOUBLE) / (SQRT(CAST({n1}.nrm AS DOUBLE)) * "
        "SQRT(CAST({n2}.nrm AS DOUBLE)))"
    )
    return f"""
WITH iv AS ({SQL_IV}),
norms AS (SELECT vec_id, SUM(xi * xi) AS nrm FROM iv GROUP BY vec_id),
cent_ids AS (
    SELECT vec_id AS cid FROM embeddings
    WHERE vec_id >= {N_PROBES} ORDER BY vec_id LIMIT {N_CENTROIDS}
),
cent AS (SELECT cid, i, xi FROM iv JOIN cent_ids ON iv.vec_id = cid),
adots AS (
    SELECT iv.vec_id, c.cid, SUM(iv.xi * c.xi) AS idot
    FROM iv JOIN cent c ON iv.i = c.i
    GROUP BY 1, 2
),
assign AS (
    SELECT vec_id, cid FROM (
        SELECT a.vec_id, a.cid,
               ROW_NUMBER() OVER (
                   PARTITION BY a.vec_id
                   ORDER BY {cos.format(d='a', n1='n', n2='nc')} DESC, a.cid
               ) AS r
        FROM adots a
        JOIN norms n ON a.vec_id = n.vec_id
        JOIN norms nc ON a.cid = nc.vec_id
    ) WHERE r = 1
),
q AS (SELECT vec_id AS qid, i, xi FROM iv WHERE vec_id < {N_PROBES}),
qdots AS (
    SELECT q.qid, c.cid, SUM(q.xi * c.xi) AS idot
    FROM q JOIN cent c ON q.i = c.i
    GROUP BY 1, 2
),
probes AS (
    SELECT qid, cid FROM (
        SELECT d.qid, d.cid,
               ROW_NUMBER() OVER (
                   PARTITION BY d.qid
                   ORDER BY {cos.format(d='d', n1='nq', n2='nc')} DESC, d.cid
               ) AS r
        FROM qdots d
        JOIN norms nq ON d.qid = nq.vec_id
        JOIN norms nc ON d.cid = nc.vec_id
    ) WHERE r <= {N_PROBE_LISTS}
),
cands AS (
    SELECT p.qid, a.vec_id FROM probes p
    JOIN assign a ON p.cid = a.cid
    WHERE a.vec_id <> p.qid
),
cdots AS (
    SELECT c.qid, c.vec_id, SUM(ia.xi * q.xi) AS idot
    FROM cands c
    JOIN iv ia ON ia.vec_id = c.vec_id
    JOIN q ON q.qid = c.qid AND q.i = ia.i
    GROUP BY 1, 2
),
ranked AS (
    SELECT d.qid, d.vec_id, {cos.format(d='d', n1='nq', n2='nc')} AS cos,
           ROW_NUMBER() OVER (
               PARTITION BY d.qid
               ORDER BY {cos.format(d='d', n1='nq', n2='nc')} DESC, d.vec_id
           ) AS rnk
    FROM cdots d
    JOIN norms nq ON d.qid = nq.vec_id
    JOIN norms nc ON d.vec_id = nc.vec_id
)
SELECT qid, vec_id, cos, rnk FROM ranked WHERE rnk <= {TOP_K}
"""


@register(
    "ann_ivf_topk",
    oracle=_ivf_oracle(),
    tags=("similarity", "ann", "ivf"),
)
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-Flat approximate top-k: a deterministic coarse quantizer (the 16
    lowest non-probe vec_ids as centroids — the sampled-seed variant of
    k-means init), every corpus vector assigned to its nearest centroid
    list, and each query searching only its nprobe=4 nearest lists.

    The 100 TB shape of real vector search (round 16, guide §4.2 +
    §2.3): centroids and probe lists are driver-built exact tables
    shipped by broadcast variable into ONE vectorized corpus pass —
    coarse-assign (max-cosine, lowest-cid ties), probed-list mask,
    cosine score and per-batch top-k per query — emitting only candidate
    rows into the tiny final window. The corpus never shuffles for
    indexing OR scoring; list-size skew becomes batch-local numpy work
    instead of a skewed join."""
    import numpy as np
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    from quiver_spark.operators.similarity2 import (
        _batch_topk,
        _cent_np,
        _list_matrix,
    )

    emb = _int_emb(spark, sf_dir)
    _, C = _cent_np(
        emb.filter(F.col("vec_id") >= N_PROBES)
        .orderBy("vec_id")
        .limit(N_CENTROIDS),
        "vec_id",
        "iv",
    )
    qids, Q = _cent_np(emb.filter(F.col("vec_id") < N_PROBES), "vec_id", "iv")
    cn = (C * C).sum(axis=1)
    qn = (Q * Q).sum(axis=1)
    csq = np.sqrt(cn.astype(np.float64))
    # probe lists per query: top-nprobe by (qcos DESC, cid ASC) — the
    # identical float64 op sequence (cast dot, divide by the sqrt
    # product) as the window expression it replaces
    with np.errstate(divide="ignore", invalid="ignore"):
        qcos = (Q @ C.T) / (np.sqrt(qn.astype(np.float64))[:, None] * csq)
    probe_mask = np.zeros((len(qids), N_CENTROIDS), dtype=bool)
    for j in range(len(qids)):
        key = np.where(np.isnan(-qcos[j]), -np.inf, -qcos[j])
        order = np.lexsort((np.arange(N_CENTROIDS), key))
        probe_mask[j, order[:N_PROBE_LISTS]] = True

    bc = spark.sparkContext.broadcast((C, cn, qids, Q, qn, probe_mask))
    schema = StructType(
        [
            StructField("qid", LongType(), False),
            StructField("vec_id", LongType(), False),
            StructField("cos", DoubleType(), False),
        ]
    )

    def fn(batches):
        import numpy as np
        import pyarrow as pa

        C_, cn_, qids_, Q_, qn_, pm_ = bc.value
        csq_ = np.sqrt(cn_.astype(np.float64))
        qsq_ = np.sqrt(qn_.astype(np.float64))
        for batch in batches:
            n = batch.num_rows
            if n == 0:
                continue
            vids = np.asarray(batch.column(0)).astype(np.int64, copy=False)
            X = _list_matrix(batch.column(1), n)
            nrm = (X * X).sum(axis=1)
            nsq = np.sqrt(nrm.astype(np.float64))
            with np.errstate(divide="ignore", invalid="ignore"):
                ccos = (X @ C_.T) / (nsq[:, None] * csq_[None, :])
                # argmax keeps the FIRST maximum over cid-ascending
                # centroids; an all-NaN row (zero norm) also resolves to
                # index 0 — both matching (ccos DESC, cid ASC) with
                # Spark's NaN-greatest ordering
                cidx = np.argmax(ccos, axis=1)
                Sc = (X @ Q_.T).T / (qsq_[:, None] * nsq[None, :])
            outs = []
            for j in range(len(qids_)):
                mask = pm_[j, cidx] & (vids != qids_[j])
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
                names=["qid", "vec_id", "cos"],
            )

    cand = emb.select("vec_id", "iv").mapInArrow(fn, schema)
    wr = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        cand.withColumn("rnk", F.row_number().over(wr))
        .filter(F.col("rnk") <= TOP_K)
        .select("qid", "vec_id", "cos", "rnk")
    )


@register(
    "embedding_dim_stats",
    oracle="""
WITH iv AS (
    SELECT generate_subscripts(embedding, 1) AS dim,
           CAST(ROUND(CAST(unnest(embedding) AS DOUBLE) * 1000000) AS BIGINT)
               AS xi
    FROM embeddings
),
agg AS (
    SELECT dim, COUNT(*) AS n,
           CAST(SUM(xi) AS BIGINT) AS s1,
           CAST(SUM(xi * xi) AS BIGINT) AS s2
    FROM iv GROUP BY dim
)
SELECT dim, n, s1, s2,
       CAST(s1 AS DOUBLE) / n AS mean_scaled,
       CAST(s2 AS DOUBLE) / n
           - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)
           AS var_scaled
FROM agg
""",
    tags=("similarity", "embedding", "stats"),
)
def embedding_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension mean/variance over the embedding corpus — the
    normalization-statistics pass every embedding pipeline runs before
    whitening, quantization calibration, or drift monitoring. Components
    are quantized to scaled ints (exact, order-insensitive sums; squares
    stay far inside int64 at any shipped SF), and the only floating-point
    steps are single correctly-rounded divisions/multiplies on identical
    operands — bit-identical across engines and across partitionings.

    Scale: explode is map-side; ONE shuffle on the 64-value dim key; at
    100 TB this is the textbook combiner-friendly moment aggregation."""
    e = load(spark, sf_dir, "embeddings")
    iv = e.select(
        F.posexplode(int_vec("embedding")).alias("pos", "xi")
    ).select((F.col("pos") + 1).alias("dim"), "xi")
    mean = F.col("s1").cast("double") / F.col("n")
    return (
        iv.groupBy("dim")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("xi").cast("bigint").alias("s1"),
            F.sum(F.col("xi") * F.col("xi")).cast("bigint").alias("s2"),
        )
        .select(
            "dim",
            "n",
            "s1",
            "s2",
            mean.alias("mean_scaled"),
            (F.col("s2").cast("double") / F.col("n") - mean * mean).alias(
                "var_scaled"
            ),
        )
    )


@register(
    "decontaminate_embedding_overlap",
    oracle=f"""
WITH iv AS ({SQL_IV}),
norms AS (SELECT vec_id, SUM(xi * xi) AS nrm FROM iv GROUP BY vec_id),
q AS (SELECT vec_id AS qid, i, xi AS qi FROM iv
     WHERE vec_id % 37 = 0 AND vec_id < 2000),
dots AS (
    SELECT q.qid, iv.vec_id, SUM(iv.xi * q.qi) AS idot
    FROM iv JOIN q ON iv.i = q.i
    GROUP BY q.qid, iv.vec_id
),
mx AS (
    SELECT d.vec_id,
           MAX(CAST(d.idot AS DOUBLE)
               / (SQRT(CAST(nq.nrm AS DOUBLE)) * SQRT(CAST(nc.nrm AS DOUBLE)))) AS mx
    FROM dots d
    JOIN norms nq ON d.qid = nq.vec_id
    JOIN norms nc ON d.vec_id = nc.vec_id
    GROUP BY d.vec_id
),
lab AS (SELECT DISTINCT vec_id, label FROM iv)
SELECT l.label,
       COUNT(*) AS corpus,
       CAST(SUM(CASE WHEN m.mx >= 0.95 THEN 1 ELSE 0 END) AS BIGINT) AS leaked,
       ROUND(AVG(m.mx), 3) AS avg_max_cos,
       ROUND(MAX(m.mx), 3) AS top_max_cos
FROM mx m JOIN lab l ON m.vec_id = l.vec_id
GROUP BY l.label
""",
    tags=("similarity", "decontamination", "embedding"),
)
def decontaminate_embedding_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SEMANTIC eval-set decontamination — the embedding-space complement
    of the n-gram `decontaminate_eval_overlap`: an eval benchmark (a
    deterministic slice, vec_id % 37 — leaked into the corpus by
    construction, the real-world failure) is swept against the WHOLE
    corpus by exact-integer cosine; any training vector at cos >= 0.95 to
    any eval vector is flagged. Identical vectors land at exactly 1.0, so
    the planted leaks are all caught; rates report per label.

    100 TB posture (round 16, guide §4.2): the eval set is driver-
    collected (eval benchmarks are tiny against a pretraining corpus)
    and ships by broadcast variable into ONE vectorized corpus pass —
    the per-doc max-similarity is a numpy matmul + row-max per Arrow
    batch (exact int64 dots, then the identical cast/sqrt/divide float64
    sequence; np.max propagates NaN exactly like array_max's
    NaN-greatest rule) — the corpus is scanned once, never shuffled
    except the final per-label aggregate."""
    import numpy as np
    from pyspark.sql.types import DoubleType, StructField, StructType

    from quiver_spark.operators.similarity2 import _cent_np, _list_matrix

    emb = _int_emb(spark, sf_dir)
    # the eval benchmark is a FIXED set: vec_id % 37 under a constant cap
    # (2000 = one decade of ids above every driver SF, so the slice is
    # identical at sf0.001-0.1 AND stays fixed on the x10/x100 decade
    # fixtures — a benchmark does not grow with the corpus; without the
    # cap the sweep measured eval x10 TIMES corpus x10 = x100 work, the
    # round-13 sweep catch)
    _, P = _cent_np(
        emb.filter((F.col("vec_id") % 37 == 0) & (F.col("vec_id") < 2000)),
        "vec_id",
        "iv",
    )
    pn = (P * P).sum(axis=1)
    bc = spark.sparkContext.broadcast((P, pn))
    src = emb.select("label", "iv")
    schema = StructType(
        [src.schema.fields[0], StructField("mx", DoubleType(), True)]
    )

    def fn(batches):
        import numpy as np
        import pyarrow as pa

        P_, pn_ = bc.value
        PT = np.ascontiguousarray(P_.T)
        psq = np.sqrt(pn_.astype(np.float64))
        for batch in batches:
            n = batch.num_rows
            if n == 0:
                continue
            X = _list_matrix(batch.column(1), n)
            nrm = (X * X).sum(axis=1)
            with np.errstate(divide="ignore", invalid="ignore"):
                cos = (X @ PT) / (
                    np.sqrt(nrm.astype(np.float64))[:, None] * psq[None, :]
                )
            yield pa.RecordBatch.from_arrays(
                [batch.column(0), pa.array(np.max(cos, axis=1))],
                names=["label", "mx"],
            )

    per = src.mapInArrow(fn, schema)
    return per.groupBy("label").agg(
        F.count(F.lit(1)).alias("corpus"),
        F.sum(F.when(F.col("mx") >= 0.95, 1).otherwise(0))
        .cast("bigint")
        .alias("leaked"),
        F.round(F.avg("mx"), 3).alias("avg_max_cos"),
        F.round(F.max("mx"), 3).alias("top_max_cos"),
    )
