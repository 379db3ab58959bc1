"""Second LLM-pipeline battery (driver mandate): n-gram Jaccard dedup and
LSH-bucketed similarity search — the two scale paths missing from
dedup.py / similarity.py.

Scale posture:
- ngram-Jaccard generates candidate pairs ONLY through a shingle-inverted-
  index join, with a document-frequency cap on shingles (stop-shingle
  removal) so no hot key explodes the join — at 100 TB the df-cap is the
  difference between a bounded shuffle and a quadratic one.
- LSH bucketing reduces ANN from corpus × corpus to per-(table, bucket)
  blocks (4 tables × 12 planes, md5-derived literal integer weights
  embedded in BOTH engines' expressions), so the DuckDB oracle checks the
  exact same buckets; oversized buckets are capped before any self-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from quiver_spark.functions import int_vec
from quiver_spark.operators.dedup import SQL_SHINGLES, _raw_shingles
from quiver_spark.registry import register
from quiver_spark.tables import load

JACCARD_THRESHOLD = 0.5
#: stop-shingle cap: drop shingles appearing in more docs than
#: GREATEST(MAX_SHINGLE_DF, ceil(corpus docs / SHINGLE_DF_DIV)). The cap
#: must scale with the corpus: an ABSOLUTE cap silently destroys recall
#: once true duplicate density multiplies every shared shingle's df past
#: it — measured round 9 on a 10×-duplicated corpus, where df=50 dropped
#: every shingle and the pair count collapsed to ZERO. The relative term
#: keeps stop-shingles (df ~ corpus-proportional) out while real
#: near-dup shingles (df ~ dup-group size) survive; at the gate SFs
#: (≤5,000 docs) the floor of 50 is the binding term, so historical
#: driver-green rows are byte-identical.
MAX_SHINGLE_DF = 50
#: 1 / the relative fraction (0.2% of corpus docs). Stored as a DIVISOR
#: so BOTH engines compute the cap in exact integer arithmetic —
#: ceil(nd/500) = (nd + 499) DIV 500. A float literal would differ
#: between engines: DuckDB parses 0.002 as exact DECIMAL while Spark's
#: lit(0.002) is a double a hair above it, so for nd near a multiple of
#: 500 the two ceils could disagree by one and the caps diverge.
SHINGLE_DF_DIV = 500
#: Multi-table random-hyperplane LSH (OR-construction): L tables of k
#: planes each — the same architecture as the minhash bands. One fixed
#: table caps the bucket space at 2^k forever, so buckets (and the
#: per-bucket quadratic pair term) grow linearly with the corpus; tables
#: recover recall (a close pair needs to collide in ANY table) while
#: finer per-table buckets keep collisions similarity-driven. Weights are
#: md5-derived literal integers in [-3, 3] embedded in BOTH engines'
#: expressions — the previous affine pattern ((i*31 + j*17) % 7) reduced
#: to 3(i+j) % 7, making plane j+7 an exact DUPLICATE of plane j.
LSH_TABLES = 4
LSH_PLANES_PER_TABLE = 12
EMB_DIM = 64  # driver testdata embedding width (TESTDATA.md)
#: bucket cap for pair generation (same rationale as MAX_BAND_BUCKET)
MAX_LSH_BUCKET = 256
COS_THRESHOLD = 0.3


def _shingle_ints(d: DataFrame, with_size: bool = False) -> DataFrame:
    """(doc_id, sh[, n_sh]): per-document DISTINCT 60-bit word-3-gram
    fingerprints (top 60 bits of md5 — exactly
    conv(substr(md5(shingle), 1, 15), 16, 10)), emitted from one
    vectorized pass. Tokens split on single spaces (empties kept),
    shingles joined with single spaces — the _raw_shingles contract.
    ``with_size`` adds the document's distinct-shingle count to every
    row (each input row is one whole document, so the per-doc COUNT(*)
    of the sized CTE is just len(seen) — no extra aggregation pass)."""
    from pyspark.sql.types import LongType, StructField, StructType

    fields = [
        StructField("doc_id", LongType(), False),
        StructField("sh", LongType(), False),
    ]
    if with_size:
        fields.append(StructField("n_sh", LongType(), False))
    schema = StructType(fields)

    def fn(batches):
        import hashlib

        import numpy as np
        import pyarrow as pa

        for batch in batches:
            if batch.num_rows == 0:
                continue
            # memo scope = ONE batch (ADVICE r16): a per-partition memo
            # holds every distinct shingle string of the partition —
            # unbounded growth on large text partitions; the md5-per-
            # distinct saving applies within a batch either way
            memo: dict[str, int] = {}
            texts = batch.column(1).to_pylist()
            out_d: list[int] = []
            out_s: list[int] = []
            out_n: list[int] = []
            docs = np.asarray(batch.column(0)).astype(np.int64)
            for di, t in enumerate(texts):
                toks = t.split(" ")
                seen = set()
                for i in range(len(toks) - 2):
                    shs = toks[i] + " " + toks[i + 1] + " " + toks[i + 2]
                    v = memo.get(shs)
                    if v is None:
                        v = (
                            int.from_bytes(
                                hashlib.md5(shs.encode()).digest()[:8],
                                "big",
                            )
                            >> 4
                        )
                        memo[shs] = v
                    seen.add(v)
                did = int(docs[di])
                for v in seen:
                    out_d.append(did)
                    out_s.append(v)
                if with_size:
                    out_n += [len(seen)] * len(seen)
            if not out_d:
                continue
            cols = [
                pa.array(np.array(out_d, dtype=np.int64)),
                pa.array(np.array(out_s, dtype=np.int64)),
            ]
            names = ["doc_id", "sh"]
            if with_size:
                cols.append(pa.array(np.array(out_n, dtype=np.int64)))
                names.append("n_sh")
            yield pa.RecordBatch.from_arrays(cols, names=names)

    return d.select("doc_id", "text").mapInArrow(fn, schema)


@register(
    "dedup_ngram_jaccard",
    oracle=f"""
WITH shingles0 AS ({SQL_SHINGLES}),
shingles AS (
    SELECT DISTINCT doc_id,
           CAST(CONCAT('0x', SUBSTR(md5(shingle), 1, 15)) AS BIGINT) AS sh
    FROM shingles0
),
sized AS (SELECT doc_id, COUNT(*) AS n_sh FROM shingles GROUP BY doc_id),
kept AS (
    SELECT doc_id, sh FROM shingles
    WHERE sh IN (
        SELECT sh FROM shingles GROUP BY sh
        HAVING COUNT(*) <= GREATEST({MAX_SHINGLE_DF},
            CAST(((SELECT COUNT(*) FROM documents)
                + {SHINGLE_DF_DIV - 1}) // {SHINGLE_DF_DIV} AS BIGINT))
    )
),
pairs AS (
    SELECT a.doc_id AS a, b.doc_id AS b, COUNT(*) AS inter
    FROM kept a JOIN kept b ON a.sh = b.sh AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
)
SELECT p.a, p.b,
       ROUND(CAST(p.inter AS DOUBLE) / (sa.n_sh + sb.n_sh - p.inter), 4)
           AS jaccard
FROM pairs p
JOIN sized sa ON p.a = sa.doc_id
JOIN sized sb ON p.b = sb.doc_id
WHERE CAST(p.inter AS DOUBLE) / (sa.n_sh + sb.n_sh - p.inter)
      >= {JACCARD_THRESHOLD}
""",
    tags=("dedup", "ngram", "jaccard"),
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word-3-gram Jaccard near-dup pairs via a shingle inverted index.

    Shingles are hashed to a 60-bit int64 (md5 prefix — identical
    arithmetic in Spark's conv() and DuckDB's hex cast) as soon as they are
    generated: the inverted-index shuffle then moves 8-byte keys instead of
    ~30-char strings, cutting shuffle bytes several-fold. Jaccard is
    computed over the hashed shingle sets on BOTH engines, so the rare
    60-bit collision cannot cause a mismatch. Exact integer counts; the
    Jaccard itself is one IEEE division of identical integers."""
    from pyspark.sql.types import LongType, StructField, StructType

    from quiver_spark.operators._bucketpairs import stream_bucket_pairs

    d = load(spark, sf_dir, "documents")
    # Round-16 shape (guide §4.2): ONE mapInArrow pass emits the per-doc
    # DISTINCT 60-bit shingle fingerprints directly — no shingle-string
    # explosion, no distinct shuffle of strings, md5 once per DISTINCT
    # shingle text (hashlib — the digest Spark's md5() computes; the
    # 15-hex-char prefix IS the big-endian top 60 bits, hi >> 4). The
    # set of (doc_id, hash) rows is identical to the hash-then-distinct
    # chain it replaces. with_size carries the per-doc distinct-shingle
    # count on every row (round 17) so the sized CTE needs no aggregate
    # and no join — na/nb ride the pair rows into the final groupBy.
    sh = _shingle_ints(d, with_size=True)
    # corpus-relative df cap (see SHINGLE_DF_DIV): the 1-row doc count
    # rides a broadcast cross join so the whole threshold stays inside the
    # plan — no driver-side action. Integer-exact ceil(nd/DIV) on both
    # engines ((nd + DIV-1) DIV DIV — no float literal can diverge).
    # Corpus size = COUNT(*) over the DOCUMENTS table (see round-10 note:
    # a distinct-count over the shingle table was a full extra pass).
    ndocs = d.agg(F.count(F.lit(1)).alias("nd"))
    # Round-17 shape (guide §2.4): the df-cap filter, the inverted-index
    # self-join and the pair counting shared ONE bucket key (sh) but ran
    # as a count aggregate + filter join + self-join — three corpus-scale
    # shuffles on that key (26 Exchanges / 10 joins in the round-16
    # plan). Now the shingle table is shuffled ONCE by sh, sorted within
    # partitions so buckets are contiguous, and a streaming pass applies
    # the df cap and emits the in-bucket (a < b) pairs with na/nb
    # attached — identical pair multiset (doc_id is unique per bucket:
    # the shingle set is per-doc distinct; buckets above the cap are
    # counted, never buffered, so task memory is bounded at cap+1 rows).
    rows = (
        sh.crossJoin(F.broadcast(ndocs))
        .select("sh", "doc_id", "n_sh", "nd")
        .repartition("sh")
        .sortWithinPartitions("sh", "doc_id")
    )
    max_df, df_div = MAX_SHINGLE_DF, SHINGLE_DF_DIV

    def cap_fn(batch):
        nd = batch.column(3)[0].as_py()
        return max(max_df, (nd + df_div - 1) // df_div)

    def emit(tbl, i, j):
        import pyarrow as pa

        doc = tbl.column(1).combine_chunks()
        nsh = tbl.column(2).combine_chunks()
        return pa.RecordBatch.from_arrays(
            [doc.take(i), doc.take(j), nsh.take(i), nsh.take(j)],
            names=["a", "b", "na", "nb"],
        )

    pair_schema = StructType(
        [
            StructField("a", LongType(), False),
            StructField("b", LongType(), False),
            StructField("na", LongType(), False),
            StructField("nb", LongType(), False),
        ]
    )
    pairs = rows.mapInArrow(
        stream_bucket_pairs(1, cap_fn, emit), pair_schema
    ).groupBy("a", "b").agg(
        F.count(F.lit(1)).alias("inter"),
        # na/nb are functionally determined by a/b — max picks the value
        F.max("na").alias("na"),
        F.max("nb").alias("nb"),
    )
    jac = F.col("inter").cast("double") / (
        F.col("na") + F.col("nb") - F.col("inter")
    )
    return (
        pairs.filter(jac >= JACCARD_THRESHOLD)
        .select("a", "b", F.round(jac, 4).alias("jaccard"))
    )


def _plane_weights(j: int) -> list[int]:
    """Deterministic md5-derived hyperplane weights in [-3, 3] for plane j
    — one integer per embedding dimension, embedded as LITERALS in both
    engines' expressions so the buckets are bit-identical. md5 (not an
    affine pattern) so no two planes are linearly related."""
    import hashlib

    return [
        int(hashlib.md5(f"{i}_{j}".encode()).hexdigest()[:4], 16) % 7 - 3
        for i in range(EMB_DIM)
    ]


def _lsh_signature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, label, tbl, sig): one row per (vector, table), sig = the
    table's k-bit bucket string.

    Round-16 shape (guide §4.2): the 48 plane dots run as ONE numpy
    matmul per Arrow batch inside mapInArrow (the interpreted
    aggregate/zip_with fold cost O(planes·dim) lambda steps per row),
    and each table's leg is emitted straight from the batch — exact
    int64 dots (|w| ≤ 3, so |dot| ≤ 64·3·2²¹ < 2³¹), identical '1'/'0'
    sign rule, identical row multiset to the UNION-ALL legs it
    replaces. The embedding-width guard stays loud: a non-{EMB_DIM}-dim
    vector raises instead of silently null-padding the dots."""
    import numpy as np
    from pyspark.sql.types import (
        IntegerType,
        StringType,
        StructField,
        StructType,
    )

    from quiver_spark.operators.similarity2 import _list_matrix

    e = load(spark, sf_dir, "embeddings")
    iv = e.select("vec_id", "label", int_vec("embedding").alias("iv"))
    W = np.array(
        [
            _plane_weights(j)
            for j in range(LSH_TABLES * LSH_PLANES_PER_TABLE)
        ],
        dtype=np.int64,
    )
    bc = spark.sparkContext.broadcast(W)
    # passthrough columns keep their INPUT types (label is an int in the
    # embeddings table); only tbl/sig are new, and iv stays INSIDE the
    # node — 4x the vector payload never crosses the Python boundary back
    schema = StructType(
        [f for f in iv.schema.fields if f.name != "iv"]
        + [
            StructField("tbl", IntegerType(), False),
            StructField("sig", StringType(), False),
        ]
    )

    def fn(batches):
        import numpy as np
        import pyarrow as pa

        W_ = bc.value
        WT = np.ascontiguousarray(W_.T)
        P = LSH_PLANES_PER_TABLE
        for batch in batches:
            n = batch.num_rows
            if n == 0:
                continue
            X = _list_matrix(batch.column(2), n)
            if X.shape[1] != EMB_DIM:
                raise ValueError(
                    f"embedding width {X.shape[1]} does not match the "
                    f"{EMB_DIM}-dim LSH plane literals (pipeline2.EMB_DIM)"
                )
            bits = (X @ WT) > 0
            chars = np.where(bits, 49, 48).astype(np.uint8)  # '1' / '0'
            offs = np.arange(n + 1, dtype=np.int32) * P
            for t in range(LSH_TABLES):
                seg = np.ascontiguousarray(chars[:, t * P : (t + 1) * P])
                sig = pa.StringArray.from_buffers(
                    n,
                    pa.py_buffer(offs.tobytes()),
                    pa.py_buffer(seg.tobytes()),
                )
                yield pa.RecordBatch.from_arrays(
                    [
                        batch.column(0),
                        batch.column(1),
                        pa.array(np.full(n, t, dtype=np.int32)),
                        sig,
                    ],
                    names=["vec_id", "label", "tbl", "sig"],
                )

    return iv.mapInArrow(fn, schema)


def _sql_lsh_signature() -> str:
    """DuckDB twin: the same literal weight arrays, indexed 1-based."""
    table_sigs = []
    for t in range(LSH_TABLES):
        bits = []
        for p in range(LSH_PLANES_PER_TABLE):
            w = _plane_weights(t * LSH_PLANES_PER_TABLE + p)
            arr = "[" + ", ".join(str(x) for x in w) + "]"
            bits.append(
                f"CASE WHEN SUM(xi * CAST(({arr})[i] AS BIGINT)) > 0 "
                "THEN '1' ELSE '0' END"
            )
        table_sigs.append(" || ".join(bits) + f" AS sig{t}")
    legs = " UNION ALL ".join(
        f"SELECT vec_id, label, {t} AS tbl, sig{t} AS sig FROM sigs0"
        for t in range(LSH_TABLES)
    )
    return f"""
iv AS (
    SELECT vec_id, label, generate_subscripts(embedding, 1) AS i,
           CAST(ROUND(CAST(unnest(embedding) AS DOUBLE) * 1000000) AS BIGINT) AS xi
    FROM embeddings
),
sigs0 AS (
    SELECT vec_id, label, {', '.join(table_sigs)}
    FROM iv GROUP BY vec_id, label
),
sig AS ({legs})
"""


@register(
    "ann_lsh_buckets",
    oracle=f"""
WITH {_sql_lsh_signature()}
SELECT tbl, sig, COUNT(*) AS bucket_size,
       CAST(MIN(vec_id) AS BIGINT) AS min_vec,
       COUNT(DISTINCT label) AS n_labels
FROM sig GROUP BY tbl, sig
""",
    tags=("similarity", "ann", "lsh"),
)
def ann_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-table random-hyperplane LSH bucket histogram — the
    partitioning step of bucketed ANN. Each (table, bucket) is an
    independent block; at scale the bucket is the shuffle key, tables
    recover recall, and per-table granularity (2^k buckets) keeps block
    sizes similarity-driven instead of corpus-proportional."""
    sig = _lsh_signature(spark, sf_dir)
    return sig.groupBy("tbl", "sig").agg(
        F.count(F.lit(1)).alias("bucket_size"),
        F.min("vec_id").cast("bigint").alias("min_vec"),
        F.countDistinct("label").alias("n_labels"),
    )


@register(
    "ann_lsh_bucketed_pairs",
    oracle=f"""
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
    SELECT DISTINCT a.vec_id AS a, b.vec_id AS b
    FROM kept a
    JOIN kept b ON a.tbl = b.tbl AND a.sig = b.sig
               AND a.vec_id < b.vec_id
),
dots AS (
    SELECT c.a, c.b, SUM(ia.xi * ib.xi) AS idot
    FROM cand c
    JOIN iv ia ON ia.vec_id = c.a
    JOIN iv ib ON ib.vec_id = c.b AND ia.i = ib.i
    GROUP BY c.a, c.b
),
norms AS (SELECT vec_id, SUM(xi * xi) AS nrm FROM iv GROUP BY vec_id)
SELECT d.a, d.b,
       ROUND(CAST(d.idot AS DOUBLE) / (SQRT(CAST(na.nrm AS DOUBLE)) * SQRT(CAST(nb.nrm AS DOUBLE))), 4) AS cos
FROM dots d JOIN norms na ON d.a = na.vec_id JOIN norms nb ON d.b = nb.vec_id
WHERE CAST(d.idot AS DOUBLE) / (SQRT(CAST(na.nrm AS DOUBLE)) * SQRT(CAST(nb.nrm AS DOUBLE))) >= {COS_THRESHOLD}
""",
    tags=("similarity", "ann", "lsh"),
)
def ann_lsh_bucketed_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed ANN candidate pairs: exact integer cosine, but ONLY for
    pairs sharing a (table, bucket) — the scale path next to
    ann_cosine_topk's brute force. A pair colliding in several tables is
    deduped BEFORE scoring; buckets above MAX_LSH_BUCKET are dropped
    (viral/degenerate-bucket cap, as in the minhash/simhash generators).
    Exact integer dots and norms; cosine is sqrt+divide on identical
    operands both sides."""
    from quiver_spark.functions import int_dot

    sig = _lsh_signature(spark, sf_dir).localCheckpoint()
    kept_buckets = (
        sig.groupBy("tbl", "sig")
        .agg(F.count(F.lit(1)).alias("bsz"))
        .filter(F.col("bsz") <= MAX_LSH_BUCKET)
        .select("tbl", "sig")
    )
    kept = sig.join(kept_buckets, ["tbl", "sig"]).select(
        "vec_id", "tbl", "sig"
    )
    a = kept.select(F.col("vec_id").alias("a"), "tbl", "sig")
    b = kept.select(F.col("vec_id").alias("b"), "tbl", "sig")
    cand = (
        a.join(b, ["tbl", "sig"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )
    e = load(spark, sf_dir, "embeddings")
    iv = e.select("vec_id", int_vec("embedding").alias("iv"))
    va = iv.select(F.col("vec_id").alias("a"), F.col("iv").alias("va"))
    vb = iv.select(F.col("vec_id").alias("b"), F.col("iv").alias("vb"))
    nrm = lambda c: F.aggregate(c, F.lit(0).cast("bigint"), lambda acc, x: acc + x * x)
    scored = (
        cand.join(va, "a")
        .join(vb, "b")
        .select(
            "a",
            "b",
            int_dot("va", "vb").alias("idot"),
            nrm("va").alias("na"),
            nrm("vb").alias("nb"),
        )
    )
    cos = F.col("idot").cast("double") / (
        F.sqrt(F.col("na").cast("double")) * F.sqrt(F.col("nb").cast("double"))
    )
    return scored.filter(cos >= COS_THRESHOLD).select(
        "a", "b", F.round(cos, 4).alias("cos")
    )
