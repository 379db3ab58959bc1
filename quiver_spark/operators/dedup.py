"""Deduplication operators for LLM training-data pipelines (driver mandate):
exact dedup, MinHash+LSH banding, SimHash fingerprints.

Scale posture: every pipeline here is shuffle-bounded by (doc_id, small key)
pairs — shingling and hashing are map-side, candidate generation joins on
band-hash buckets (the LSH trick: only near-duplicates collide, so the join
fan-out stays tiny even at 100 TB). Hashes are md5-based so the DuckDB
oracles can reproduce them bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from quiver_spark.registry import register
from quiver_spark.tables import load, spread

N_HASHES = 8  # minhash signature length
BAND_SIZE = 2  # rows per LSH band → 4 bands
N_BANDS = N_HASHES // BAND_SIZE
#: band-bucket size cap for PAIR GENERATION: a group of k docs sharing a
#: band hash yields k(k-1)/2 candidate pairs — a viral duplicate (or a
#: band-hash collision cluster) turns one bucket quadratic at fleet scale.
#: Buckets larger than this are dropped from pair generation (mirrored in
#: the oracle CTE): a >64-member near-identical group is the EXACT-dedup
#: pass's job (hash the text, keep one), not pairwise estimation's. The
#: shipped testdata never approaches the cap, so results are unchanged
#: there; at 100 TB this is what bounds the worst bucket's fan-out.
MAX_BAND_BUCKET = 64


@register(
    "dedup_exact_docs",
    oracle="""
SELECT CAST(MIN(doc_id) AS BIGINT) AS keep_id, COUNT(*) AS dup_cnt
FROM documents
GROUP BY md5(text)
""",
    tags=("dedup", "exact"),
)
def dedup_exact_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-groupBy on content fingerprint, keep the lowest
    doc_id per group. One shuffle on the 128-bit hash — uniform keys, no
    skew, scales to any corpus size."""
    d = load(spark, sf_dir, "documents")
    return (
        d.groupBy(F.md5(F.col("text").cast("binary")).alias("_h"))
        .agg(
            F.min("doc_id").cast("bigint").alias("keep_id"),
            F.count(F.lit(1)).alias("dup_cnt"),
        )
        .select("keep_id", "dup_cnt")
    )


def _raw_ngrams(
    df: DataFrame, n: int, alias: str = "ngram", with_pos: bool = False
) -> DataFrame:
    """(doc_id[, pos], <alias>) — word n-grams per document, WITH per-doc
    repeats (no distinct; callers dedup on whatever key they project).
    ``with_pos`` adds the 0-based n-gram position (winnowing needs it).

    Built with a single array transform (map-side, no self-join): for token
    array t, ngram_i = t[i] ' ' … ' ' t[i+n-1]. The token array is
    materialized ONCE per row (a 4× split of large texts measured 29s →
    ~7s at sf0.1). Shared by the 3-gram shingle pipelines (dedup,
    decontamination, winnowing) and the 2-gram repetition stats."""
    parts = "concat(x" + "".join(
        f", ' ', toks[i + {k}]" for k in range(1, n)
    ) + ")"
    grams = F.expr(
        f"transform(slice(toks, 1, greatest(size(toks) - {n - 1}, 0)), "
        f"(x, i) -> {parts})"
    )
    base = df.select("doc_id", F.split("text", " ").alias("toks"))
    if with_pos:
        return base.select(
            "doc_id", F.posexplode(grams).alias("pos", alias)
        )
    return base.select("doc_id", F.explode(grams).alias(alias))


def sql_ngrams(
    n: int,
    alias: str = "ngram",
    distinct: bool = False,
    with_pos: bool = False,
) -> str:
    """DuckDB twin of _raw_ngrams (1-based list indexing: i runs
    1..len-(n-1), i.e. range(1, greatest(len - (n-2), 1))). ``with_pos``
    adds a 1-based position column (vs Spark's 0-based posexplode — both
    orderings are identical, callers must offset absolute comparisons)."""
    terms = " || ' ' || ".join(
        f"list_extract(toks, i + {k})" if k else "list_extract(toks, i)"
        for k in range(n)
    )
    lst = (
        f"[{terms}\n     FOR i IN range(1, greatest(len(toks) - {n - 2}, 1))]"
    )
    src = "(SELECT doc_id, string_split(text, ' ') AS toks FROM documents)"
    if with_pos:
        return f"""
SELECT doc_id, generate_subscripts(lst, 1) AS pos, unnest(lst) AS {alias}
FROM (SELECT doc_id, {lst} AS lst FROM {src})
"""
    d = "DISTINCT " if distinct else ""
    return f"""
SELECT {d}doc_id, unnest(
    {lst}
) AS {alias}
FROM {src}
"""


def _raw_shingles(df: DataFrame) -> DataFrame:
    """(doc_id, shingle) pairs — word 3-grams, repeats kept."""
    return _raw_ngrams(df, 3, alias="shingle")


def _shingles(df: DataFrame) -> DataFrame:
    """(doc_id, shingle) pairs — distinct word 3-grams per document."""
    return _raw_shingles(df).distinct()


#: DuckDB twin of _shingles.
SQL_SHINGLES = sql_ngrams(3, alias="shingle", distinct=True)


def _minhash_signature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """doc_id → m0..m7 minhash signature columns (md5-seeded min-hashing).

    Round-16 shape (guide §4.2 + §2.3): ONE mapInArrow pass emits the
    finished signature row per document — no shingle explosion, no
    (doc, seed) shuffle, no pivot. Inside the pass, md5 runs once per
    DISTINCT shingle text per seed (MIN is duplicate-invariant, and the
    corpus measures ~10 shingle instances per distinct value), via
    hashlib (the same md5 Spark's expression computes — hex parity is
    exact); per-(doc, seed) minima vectorize as one lexsort over the
    instance table per seed (lexicographic (hi, lo) uint64 order ==
    lowercase-hex string order). Map-side; the output is one
    signature-width row per doc."""
    import numpy as np
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    # round 17: spread the single-split gate-SF scan across cores before
    # the Python pass (guide §2.5); per-doc output — partition-invariant
    d = spread(
        load(spark, sf_dir, "documents").select("doc_id", "text"),
        spark,
        sf_dir,
        "documents",
    )
    schema = StructType(
        [StructField("doc_id", LongType(), False)]
        + [
            StructField(f"m{i}", StringType(), False)
            for i in range(N_HASHES)
        ]
    )
    nseeds = N_HASHES

    def fn(batches):
        import hashlib

        import numpy as np
        import pyarrow as pa

        seeds = [f"{s}:".encode() for s in range(nseeds)]
        for batch in batches:
            if batch.num_rows == 0:
                continue
            texts = batch.column(1).to_pylist()
            memo: dict[str, int] = {}
            digs: list[bytes] = []
            dids: list[int] = []
            sids: list[int] = []
            for di, t in enumerate(texts):
                toks = t.split(" ")
                for i in range(len(toks) - 2):
                    sh = toks[i] + " " + toks[i + 1] + " " + toks[i + 2]
                    sid = memo.get(sh)
                    if sid is None:
                        sid = len(memo)
                        memo[sh] = sid
                        b = sh.encode()
                        for sp in seeds:
                            digs.append(hashlib.md5(sp + b).digest())
                    dids.append(di)
                    sids.append(sid)
            if not dids:
                continue
            # (ndistinct, nseeds) big-endian digest halves
            dg = np.frombuffer(b"".join(digs), dtype=">u8").reshape(
                len(memo), nseeds, 2
            )
            hi_t = np.ascontiguousarray(dg[:, :, 0])
            lo_t = np.ascontiguousarray(dg[:, :, 1])
            did = np.array(dids, dtype=np.int64)
            sid = np.array(sids, dtype=np.int64)
            udocs, dinv = np.unique(did, return_inverse=True)
            cols = [
                pa.array(
                    np.asarray(batch.column(0)).astype(np.int64)[udocs]
                )
            ]
            for s in range(nseeds):
                hs = hi_t[sid, s]
                ls_ = lo_t[sid, s]
                order = np.lexsort((ls_, hs, dinv))
                first = np.empty(len(order), dtype=bool)
                first[0] = True
                first[1:] = dinv[order][1:] != dinv[order][:-1]
                win = order[first]
                cols.append(
                    pa.array(
                        [
                            f"{int(h):016x}{int(l):016x}"
                            for h, l in zip(hs[win], ls_[win])
                        ]
                    )
                )
            yield pa.RecordBatch.from_arrays(
                cols, names=["doc_id"] + [f"m{i}" for i in range(nseeds)]
            )

    return d.mapInArrow(fn, schema)


def _sql_minhash_signature() -> str:
    pivot = ", ".join(
        f"MIN(CASE WHEN seed = {i} THEN mh END) AS m{i}" for i in range(N_HASHES)
    )
    return f"""
shingles AS ({SQL_SHINGLES}),
hashed AS (
    SELECT doc_id, seed, md5(CAST(seed AS VARCHAR) || ':' || shingle) AS h
    FROM shingles CROSS JOIN (SELECT unnest(range({N_HASHES})) AS seed)
),
mh AS (SELECT doc_id, seed, MIN(h) AS mh FROM hashed GROUP BY doc_id, seed),
sig AS (SELECT doc_id, {pivot} FROM mh GROUP BY doc_id)
"""


def _sql_bands() -> str:
    parts = []
    for b in range(N_BANDS):
        cols = " || ',' || ".join(
            f"m{b * BAND_SIZE + j}" for j in range(BAND_SIZE)
        )
        parts.append(
            f"SELECT doc_id, {b} AS band, md5({cols}) AS band_hash FROM sig"
        )
    return " UNION ALL ".join(parts)


@register(
    "dedup_minhash_signature",
    oracle="WITH " + _sql_minhash_signature() + "\nSELECT doc_id, "
    + ", ".join(f"m{i}" for i in range(N_HASHES))
    + " FROM sig",
    tags=("dedup", "minhash"),
)
def dedup_minhash_signature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash signatures (8 md5-seeded hashes over word 3-gram shingles).
    Shingle→hash→min is map-side + one (doc,seed) aggregation."""
    sig = _minhash_signature(spark, sf_dir)
    return sig.select("doc_id", *[f"m{i}" for i in range(N_HASHES)])


def _sql_agree() -> str:
    """Signature-agreement sum (the est_jaccard numerator), shared by the
    pairs and clusters oracles so the two edge definitions cannot drift."""
    return " + ".join(
        f"CASE WHEN sa.m{i} = sb.m{i} THEN 1 ELSE 0 END"
        for i in range(N_HASHES)
    )


def _sql_cand_chain() -> str:
    """sig → bands → cand CTE chain shared by the pairs/clusters oracles."""
    return (
        _sql_minhash_signature()
        + f""",
bands AS ({_sql_bands()}),
kept_buckets AS (
    SELECT band, band_hash FROM bands
    GROUP BY band, band_hash HAVING COUNT(*) <= {MAX_BAND_BUCKET}
),
kept AS (
    SELECT bands.* FROM bands
    JOIN kept_buckets USING (band, band_hash)
),
cand AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM kept a
    JOIN kept b ON a.band = b.band AND a.band_hash = b.band_hash
               AND a.doc_id < b.doc_id
)"""
    )


@register(
    "dedup_minhash_pairs",
    oracle="WITH "
    + _sql_cand_chain()
    + f"""
SELECT doc_a, doc_b,
       CAST(({_sql_agree()}) AS DOUBLE) / {N_HASHES} AS est_jaccard
FROM cand
JOIN sig sa ON doc_a = sa.doc_id
JOIN sig sb ON doc_b = sb.doc_id
""",
    tags=("dedup", "minhash", "lsh"),
)
def dedup_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH candidate pairs: band the signatures (4 bands × 2 rows),
    bucket-join on band hash, estimate Jaccard from signature agreement.
    The join key is the band hash, so only near-dup docs ever meet — and
    buckets larger than MAX_BAND_BUCKET are dropped before the self-join,
    so no single viral-duplicate (or collision) bucket can go quadratic:
    the worst bucket's fan-out is bounded at k(k-1)/2 with k <= 64."""
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    from quiver_spark.operators._bucketpairs import stream_bucket_pairs

    sig = _minhash_signature(spark, sf_dir)
    # one stack() pass instead of N_BANDS unioned re-scans (round 16 —
    # same rows, one scan, one Generate); the signature columns ride
    # along so agreement is computable inside the bucket (round 17)
    legs = ", ".join(
        f"{b}, md5(CAST(concat_ws(',', "
        + ", ".join(f"m{b * BAND_SIZE + j}" for j in range(BAND_SIZE))
        + ") AS BINARY))"
        for b in range(N_BANDS)
    )
    ms = [f"m{i}" for i in range(N_HASHES)]
    bands = sig.selectExpr(
        f"stack({N_BANDS}, {legs}) AS (band, band_hash)", "doc_id", *ms
    )
    # Round-17 shape (guide §2.4): bucket-size aggregate + filter join +
    # self-join + two signature joins shared the (band, band_hash) and
    # doc_id keys but cost six shuffles and three joins (16 Exchanges in
    # the round-16 plan). One shuffle now: partition by the band key,
    # sort within partitions, stream contiguous buckets through the
    # shared cap-and-pair pass; the est_jaccard numerator is the count
    # of equal signature columns, computed per pair from the carried
    # m0..m7 strings (Arrow equality of the identical hex digests the
    # JVM compared) — n/8 is binary-exact in a double. distinct() then
    # dedups pairs that collide in several bands: est_jaccard is
    # functionally determined by (doc_a, doc_b), so a three-column
    # distinct equals the oracle's pair-distinct + signature join.
    # (The round-16 sig.cache() is gone WITH the multi-branch plan that
    # justified it — sig now has a single consumer. Its removal costs
    # the bench's repeat passes their cache-hot minimum on THIS query,
    # but dedup_clusters / dedup_canonical_docs, which pay the pairs
    # pipeline cold inside an eager checkpoint every run, got faster by
    # the same cold delta — see OPTIMIZATION_r17.md.)
    rows = bands.repartition("band", "band_hash").sortWithinPartitions(
        "band", "band_hash", "doc_id"
    )
    cap, nh = MAX_BAND_BUCKET, N_HASHES

    def emit(tbl, i, j):
        import pyarrow as pa
        import pyarrow.compute as pc

        doc = tbl.column(2).combine_chunks()
        agree = None
        for c in range(3, 3 + nh):
            col = tbl.column(c).combine_chunks()
            eq = pc.cast(pc.equal(col.take(i), col.take(j)), pa.int32())
            agree = eq if agree is None else pc.add(agree, eq)
        est = pc.divide(pc.cast(agree, pa.float64()), float(nh))
        return pa.RecordBatch.from_arrays(
            [doc.take(i), doc.take(j), est],
            names=["doc_a", "doc_b", "est_jaccard"],
        )

    pair_schema = StructType(
        [
            StructField("doc_a", LongType(), False),
            StructField("doc_b", LongType(), False),
            StructField("est_jaccard", DoubleType(), False),
        ]
    )
    return rows.mapInArrow(
        stream_bucket_pairs(2, lambda _b: cap, emit), pair_schema
    ).distinct()


# --------------------------------------------------------------------------
# SimHash
# --------------------------------------------------------------------------

#: 60-bit fingerprint (15 md5 nibbles): the production-shaped width.
#: The earlier 16-bit variant collapsed at scale — its two 8-bit bands
#: give only 256 buckets, so candidate pairs grew QUADRATICALLY with the
#: corpus (measured: 5k pairs at sf0.01 → 540k at sf0.1). With 4 bands ×
#: 15 bits (32768 buckets each) band collisions track genuine similarity,
#: and 60 < 63 keeps the assembled hash inside a signed BIGINT.
SIMHASH_BITS = 60
SIMHASH_BAND_BITS = 15
SIMHASH_N_BANDS = SIMHASH_BITS // SIMHASH_BAND_BITS
#: band-bucket cap for pair generation (same rationale as MAX_BAND_BUCKET)
MAX_SIMHASH_BUCKET = 256
_HEX = "0123456789abcdef"


def _sql_simhash() -> str:
    # hash each token ONCE (md5 is ~15× the cost of the nibble slicing),
    # then slice all 15 nibbles out of the one hex string
    nibbles = ", ".join(
        f"(POSITION(SUBSTR(h, {n + 1}, 1) IN '{_HEX}') - 1) AS nib{n}"
        for n in range(SIMHASH_BITS // 4)
    )
    bit_sums = ", ".join(
        f"SUM(2 * ((nib{j // 4} // {1 << (j % 4)}) % 2) - 1) AS s{j}"
        for j in range(SIMHASH_BITS)
    )
    assemble = " + ".join(
        f"(CASE WHEN s{j} > 0 THEN {1 << j} ELSE 0 END)"
        for j in range(SIMHASH_BITS)
    )
    return f"""
WITH tok AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
),
hashed AS (SELECT doc_id, md5(token) AS h FROM tok WHERE token <> ''),
nibs AS (SELECT doc_id, {nibbles} FROM hashed),
sums AS (SELECT doc_id, {bit_sums} FROM nibs GROUP BY doc_id)
SELECT doc_id, CAST({assemble} AS BIGINT) AS simhash FROM sums
"""


@register(
    "dedup_simhash",
    oracle=_sql_simhash(),
    tags=("dedup", "simhash"),
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash document fingerprint: each token votes ±1 on every fingerprint
    bit (weighted by occurrence), bit = sign of the tally. Near-dup docs get
    near-equal fingerprints (small Hamming distance). Pure map + one
    per-doc aggregation.

    Round-16 shape (guide §4.2): ONE mapInArrow pass emits the finished
    (doc_id, simhash) row — no token explosion, no 60-column aggregate.
    md5 runs once per DISTINCT token (hashlib — the same digest Spark's
    expression computed over every occurrence); the top-60-bit vote
    table comes from the digest's first 15 hex nibbles exactly as the
    nibble/CASE chain did; per-doc tallies vectorize as 60 bincounts
    over the occurrence table (exact: integer votes, magnitudes far
    below 2^53), and bit j is set iff its tally is STRICTLY positive —
    the identical sign rule."""
    import numpy as np
    from pyspark.sql.types import LongType, StructField, StructType

    # round 17: spread the single-split gate-SF scan across cores before
    # the Python pass (guide §2.5); per-doc output — partition-invariant
    d = spread(
        load(spark, sf_dir, "documents").select("doc_id", "text"),
        spark,
        sf_dir,
        "documents",
    )
    schema = StructType(
        [
            StructField("doc_id", LongType(), False),
            StructField("simhash", LongType(), False),
        ]
    )
    nbits = SIMHASH_BITS

    def fn(batches):
        import hashlib

        import numpy as np
        import pyarrow as pa

        for batch in batches:
            if batch.num_rows == 0:
                continue
            texts = batch.column(1).to_pylist()
            memo: dict[str, int] = {}
            his: list[int] = []
            dids: list[int] = []
            tids: list[int] = []
            for di, t in enumerate(texts):
                for tok in t.split(" "):
                    if tok == "":
                        continue
                    tid = memo.get(tok)
                    if tid is None:
                        tid = len(memo)
                        memo[tok] = tid
                        his.append(
                            int.from_bytes(
                                hashlib.md5(tok.encode()).digest()[:8],
                                "big",
                            )
                        )
                    dids.append(di)
                    tids.append(tid)
            if not dids:
                continue
            hi = np.array(his, dtype=np.uint64)
            # bit j lives in nibble j//4 (hex char index), weight 2^(j%4):
            # nib n = (hi >> (60 - 4n)) & 0xF, so bit j = (hi >>
            # (60 - 4*(j//4) + j%4))... extract per-bit columns directly
            B2 = np.empty((len(his), nbits), dtype=np.int8)
            for j in range(nbits):
                shift = np.uint64(60 - 4 * (j // 4) + (j % 4))
                B2[:, j] = (
                    ((hi >> shift) & np.uint64(1)).astype(np.int8) * 2 - 1
                )
            did = np.array(dids, dtype=np.int64)
            tid = np.array(tids, dtype=np.int64)
            udocs, dinv = np.unique(did, return_inverse=True)
            nd = len(udocs)
            sh = np.zeros(nd, dtype=np.int64)
            for j in range(nbits):
                v = np.bincount(
                    dinv, weights=B2[tid, j].astype(np.float64), minlength=nd
                )
                sh |= (v > 0).astype(np.int64) << j
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(
                        np.asarray(batch.column(0)).astype(np.int64)[udocs]
                    ),
                    pa.array(sh),
                ],
                names=["doc_id", "simhash"],
            )

    return d.mapInArrow(fn, schema)


# --------------------------------------------------------------------------
# Duplicate clustering (connected components over the near-dup graph)
# --------------------------------------------------------------------------

#: minimum estimated Jaccard for an LSH candidate pair to become an edge
CLUSTER_JACCARD = 0.5
#: label-propagation safety cap — the loop normally exits on convergence
#: (rounds needed = component diameter, small for dup clusters); hitting
#: the cap without converging raises instead of silently returning labels
#: that are not component minima (the recursive-CTE oracle has no cap)
MAX_LP_ITERS = 60


def _cluster_edges_sql() -> str:
    """Shared sig→bands→cand chain + thresholded edges + symmetric view."""
    return (
        _sql_cand_chain()
        + f""",
edges AS (
    SELECT doc_a, doc_b
    FROM cand
    JOIN sig sa ON doc_a = sa.doc_id
    JOIN sig sb ON doc_b = sb.doc_id
    WHERE CAST(({_sql_agree()}) AS DOUBLE) / {N_HASHES} >= {CLUSTER_JACCARD}
),
sym AS (
    SELECT doc_a AS src, doc_b AS dst FROM edges
    UNION ALL
    SELECT doc_b AS src, doc_a AS dst FROM edges
)"""
    )


@register(
    "dedup_clusters",
    oracle="WITH RECURSIVE "
    + _cluster_edges_sql()
    + """,
reach(node, label) AS (
    SELECT src, src FROM sym
    UNION
    SELECT sym.src, reach.label FROM sym JOIN reach ON sym.dst = reach.node
)
SELECT node AS doc_id, CAST(MIN(label) AS BIGINT) AS cluster_id
FROM reach GROUP BY node
""",
    tags=("dedup", "minhash", "lsh", "graph", "iterative"),
)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster assignment: connected components over the
    MinHash-LSH near-duplicate graph (edges = candidate pairs with
    estimated Jaccard >= 0.5), cluster_id = min doc_id of the component —
    the step a training pipeline runs after pair generation to pick one
    canonical document per duplicate group.

    Implemented as iterative min-label propagation in DataFrame ops over
    the symmetric edge list PLUS self-loops, so one join + one min-groupBy
    per round covers both neighbor labels and the node's own (no
    left-join/coalesce leg), followed by a pointer-jumping shortcut (the
    large-star/small-star trick): each node re-reads its label's OWN label,
    so min labels race down chains in O(log diameter) rounds instead of
    O(diameter). Labels only ever decrease, so SUM(label) is a monotone
    convergence witness — the loop exits when it stops falling (a scalar
    agg per round, no data ever collected to the driver). Each round's
    labels are localCheckpoint()ed: without that, round N's logical plan
    re-embeds rounds 0..N-1 and Catalyst/AQE replanning cost itself grows
    per round. At 100 TB the per-round cost is shuffles keyed on doc_id,
    the edge set is duplicate-density-proportional (LSH-bounded), and
    exhausting the safety cap raises instead of returning labels that are
    not component minima.
    """
    # localCheckpoint the edge list BEFORE mirroring it: (a) the propagation
    # union has three branches, so without materialization the whole LSH
    # pair pipeline would run once per branch; (b) unlike persist(), the
    # checkpoint TRUNCATES the logical plan — with persist, every round's
    # join still re-embeds (and Catalyst re-analyzes) the full LSH pipeline
    # tree, which measured as ~0.7 s/round of pure planning at sf0.1.
    # Trade-off: checkpointed blocks are not lineage-recoverable — on a
    # cluster, an executor loss mid-loop fails the job and the caller
    # retries; acceptable for a seconds-per-round iterative tail.
    edges = (
        dedup_minhash_pairs(spark, sf_dir)
        .filter(F.col("est_jaccard") >= CLUSTER_JACCARD)
        .select("doc_a", "doc_b")
        .localCheckpoint()
    )
    nodes = (
        edges.select(F.col("doc_a").alias("node"))
        .unionByName(edges.select(F.col("doc_b").alias("node")))
        .distinct()
    )
    # propagation graph = both edge directions + a self-loop per node (the
    # self-loop carries the node's own label through the min)
    prop = (
        edges.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .unionByName(
            edges.select(
                F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")
            )
        )
        .unionByName(
            nodes.select(
                F.col("node").alias("src"), F.col("node").alias("dst")
            )
        )
        .localCheckpoint()  # same plan-truncation rationale as edges
    )
    labels = nodes.select("node", F.col("node").alias("label")).localCheckpoint()
    # None sentinel: the first round always runs (labels start as node ids,
    # any edge lowers some label), so an init-sum job is unnecessary
    prev_sum = None
    converged = False
    for _ in range(MAX_LP_ITERS):
        neigh = (
            prop.join(labels, prop["dst"] == labels["node"])
            .groupBy("src")
            .agg(F.min("label").alias("label"))
            .withColumnRenamed("src", "node")
        )
        # pointer-jumping: every label value is itself a node (component
        # minima are doc_ids, and self-loops keep every node present as a
        # src), so an inner join re-reads each node's label's label —
        # jlabel <= label always, and label depth halves per round
        hop = neigh.select(
            F.col("node").alias("jnode"), F.col("label").alias("jlabel")
        )
        new_labels = (
            neigh.join(hop, neigh["label"] == hop["jnode"])
            .select("node", F.col("jlabel").alias("label"))
            # lazy: the convergence agg below is the materializing action,
            # so checkpoint + witness cost ONE job per round, not two
            .localCheckpoint(eager=False)
        )
        cur_sum = new_labels.agg(
            F.sum(F.col("label").cast("decimal(38,0)")).alias("s")
        ).first()["s"]
        labels.unpersist()
        labels = new_labels
        if cur_sum == prev_sum:
            converged = True
            break
        prev_sum = cur_sum
    edges.unpersist()
    prop.unpersist()
    if not converged:
        raise RuntimeError(
            f"dedup_clusters: label propagation did not converge within "
            f"{MAX_LP_ITERS} rounds (pathologically deep duplicate chain)"
        )
    return labels.select(
        F.col("node").alias("doc_id"),
        F.col("label").cast("bigint").alias("cluster_id"),
    )


#: max Hamming distance for a simhash candidate pair to count as near-dup
SIMHASH_HAMMING_MAX = 3


def _sql_simhash_bands() -> str:
    """doc_id, simhash, band, bval — one row per (doc, band)."""
    legs = " UNION ALL ".join(
        f"SELECT doc_id, simhash, {k} AS band, "
        f"(simhash // {1 << (k * SIMHASH_BAND_BITS)}) % "
        f"{1 << SIMHASH_BAND_BITS} AS bval FROM sh"
        for k in range(SIMHASH_N_BANDS)
    )
    return legs


@register(
    "dedup_simhash_pairs",
    oracle=f"""
WITH sh AS ({_sql_simhash()}),
bands AS ({_sql_simhash_bands()}),
kept_buckets AS (
    SELECT band, bval FROM bands
    GROUP BY band, bval HAVING COUNT(*) <= {MAX_SIMHASH_BUCKET}
),
kept AS (
    SELECT bands.* FROM bands JOIN kept_buckets USING (band, bval)
),
cand AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
           a.simhash AS ha, b.simhash AS hb
    FROM kept a
    JOIN kept b ON a.band = b.band AND a.bval = b.bval
               AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b, CAST(bit_count(xor(ha, hb)) AS BIGINT) AS hamming
FROM cand
WHERE bit_count(xor(ha, hb)) <= {SIMHASH_HAMMING_MAX}
""",
    tags=("dedup", "simhash", "pairs"),
)
def dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-duplicate pairs: band the 60-bit fingerprint into four
    15-bit bands, bucket-join per band (4 bands > max Hamming 3, so a pair
    within the threshold is GUARANTEED to agree exactly on at least one
    band — pigeonhole), then filter exactly on popcount of the XOR.
    Buckets above MAX_SIMHASH_BUCKET are dropped before the self-join
    (same viral-group rationale as the minhash cap), so shuffle stays
    proportional to genuine near-dup density at any corpus size."""
    from pyspark.sql.types import LongType, StructField, StructType

    from quiver_spark.operators._bucketpairs import (
        popcount64,
        stream_bucket_pairs,
    )

    sh = dedup_simhash(spark, sf_dir)
    # one stack() pass instead of N_BANDS unioned re-scans (round 16)
    legs = ", ".join(
        f"{k}, (simhash div {1 << (k * SIMHASH_BAND_BITS)})"
        f" % {1 << SIMHASH_BAND_BITS}"
        for k in range(SIMHASH_N_BANDS)
    )
    bands = sh.selectExpr(
        f"stack({SIMHASH_N_BANDS}, {legs}) AS (band, bval)",
        "doc_id",
        "simhash",
    )
    # Round-17 shape (guide §2.4): bucket-size aggregate + filter join +
    # self-join shared the (band, bval) key but cost three corpus-scale
    # shuffles (12 Exchanges in the round-16 plan; the fingerprint
    # pipeline needed a localCheckpoint just to keep its ~12 plan
    # branches analyzable). One shuffle now — the fingerprint pass has a
    # single consumer, so the checkpoint is gone too: partition by the
    # band key, sort within partitions, stream contiguous buckets
    # through the shared cap-and-pair pass, compute the Hamming distance
    # per pair (vectorized xor + popcount — the same popcount the JVM's
    # bit_count ran) and apply the <= max filter before the distinct
    # (filter commutes with distinct; ha/hb are functionally determined
    # by the doc ids, so the two-column distinct is the oracle's cand
    # distinct).
    rows = bands.repartition("band", "bval").sortWithinPartitions(
        "band", "bval", "doc_id"
    )
    cap, hmax = MAX_SIMHASH_BUCKET, SIMHASH_HAMMING_MAX

    def emit(tbl, i, j):
        import numpy as np
        import pyarrow as pa

        doc = tbl.column(2).to_numpy()
        hsh = tbl.column(3).to_numpy()
        ia, ja = i.to_numpy(), j.to_numpy()
        ham = popcount64(hsh[ia] ^ hsh[ja]).astype(np.int64)
        keep = ham <= hmax
        return pa.RecordBatch.from_arrays(
            [
                pa.array(doc[ia][keep]),
                pa.array(doc[ja][keep]),
                pa.array(ham[keep]),
            ],
            names=["doc_a", "doc_b", "hamming"],
        )

    pair_schema = StructType(
        [
            StructField("doc_a", LongType(), False),
            StructField("doc_b", LongType(), False),
            StructField("hamming", LongType(), False),
        ]
    )
    return rows.mapInArrow(
        stream_bucket_pairs(2, lambda _b: cap, emit), pair_schema
    ).distinct()
