"""Corpus-quality rule filtering and membership sketches (round 13).

Two operator families a 100 TB pretraining pipeline runs constantly:

- ``text_gopher_quality_filter`` — the Gopher/RefinedWeb-style document
  quality rule bundle (word-count bounds, mean word length, stopword
  presence, top-word repetition, alphabetic-word fraction), evaluated
  ENTIRELY map-side with array expressions: the corpus is scanned once
  and never shuffled; only the ≤|sources|-row verdict table aggregates.
- ``sketch_bloom_membership`` — a distributed Bloom filter built as a
  ``bit_or`` word aggregation (the sketch is a monoid: 1000 executors
  OR partial bitmaps, exactly like the count-min grid in sketches.py),
  then probed via a broadcast of the 128-word bitmap. The 100 TB use is
  "have we already crawled this URL / ingested this doc id" membership
  without shuffling the big side.

Determinism: every rule threshold is integer-exact (cross-multiplied
instead of ratio floats) and the Bloom grid is md5-derived, so DuckDB
reproduces bit-identical results.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from quiver_spark.registry import register
from quiver_spark.tables import load, spread

# --------------------------------------------------------------------------
# Gopher-style quality rules (integer-exact thresholds)
# --------------------------------------------------------------------------

#: rule constants — chosen to discriminate on the synthetic corpus while
#: matching the published Gopher rule SHAPES (Rae et al. 2021, table A1).
GQ_MIN_WORDS = 20
GQ_MAX_WORDS = 80
GQ_MIN_MEAN_LEN = 3  # 3·nw ≤ chars
GQ_MAX_MEAN_LEN = 10  # chars ≤ 10·nw
GQ_MIN_STOPWORDS = 2
GQ_STOPWORDS = ("the", "a", "and", "to", "of", "in", "is", "that")
GQ_TOP_FRAC_DEN = 5  # top word ≤ 1/5 of words: 5·maxc ≤ nw
GQ_ALPHA_NUM = 4  # alpha words ≥ 4/5 of words: 5·alpha ≥ 4·nw
GQ_ALPHA_DEN = 5

_SQL_STOPLIST = ", ".join(f"'{w}'" for w in GQ_STOPWORDS)


@register(
    "text_gopher_quality_filter",
    oracle=f"""
WITH w AS (
    SELECT doc_id, source,
           list_filter(regexp_split_to_array(text, '\\s+'),
                       x -> x <> '') AS words
    FROM documents
),
twm AS (
    SELECT doc_id, MAX(c) AS maxc FROM (
        SELECT doc_id, word, COUNT(*) AS c FROM (
            SELECT doc_id, unnest(words) AS word FROM w
        ) GROUP BY doc_id, word
    ) GROUP BY doc_id
),
stats AS (
    -- LEFT join: a zero-word document has no twm row but must still be
    -- counted (the Spark fold yields maxc=0 for it); COALESCE keeps the
    -- r_top rule's 5*0 <= 0 semantics identical on both engines
    SELECT w.doc_id, w.source,
           CAST(len(words) AS BIGINT) AS nw,
           CAST(COALESCE(list_sum(list_transform(words, x -> length(x))), 0)
                AS BIGINT) AS chars,
           CAST(len(list_filter(words,
                x -> list_contains([{_SQL_STOPLIST}], x))) AS BIGINT)
               AS stopc,
           CAST(len(list_filter(words,
                x -> regexp_matches(x, '[a-zA-Z]'))) AS BIGINT) AS alphac,
           COALESCE(twm.maxc, 0) AS maxc
    FROM w LEFT JOIN twm ON w.doc_id = twm.doc_id
),
rules AS (
    SELECT source,
           (nw BETWEEN {GQ_MIN_WORDS} AND {GQ_MAX_WORDS}) AS r_wc,
           ({GQ_MIN_MEAN_LEN} * nw <= chars
            AND chars <= {GQ_MAX_MEAN_LEN} * nw) AS r_len,
           (stopc >= {GQ_MIN_STOPWORDS}) AS r_stop,
           ({GQ_TOP_FRAC_DEN} * maxc <= nw) AS r_top,
           ({GQ_ALPHA_DEN} * alphac >= {GQ_ALPHA_NUM} * nw) AS r_alpha
    FROM stats
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN NOT r_wc THEN 1 ELSE 0 END) AS BIGINT)
           AS fail_wordcount,
       CAST(SUM(CASE WHEN NOT r_len THEN 1 ELSE 0 END) AS BIGINT)
           AS fail_meanlen,
       CAST(SUM(CASE WHEN NOT r_stop THEN 1 ELSE 0 END) AS BIGINT)
           AS fail_stopwords,
       CAST(SUM(CASE WHEN NOT r_top THEN 1 ELSE 0 END) AS BIGINT)
           AS fail_topword,
       CAST(SUM(CASE WHEN NOT r_alpha THEN 1 ELSE 0 END) AS BIGINT)
           AS fail_alpha,
       CAST(SUM(CASE WHEN r_wc AND r_len AND r_stop AND r_top AND r_alpha
                THEN 1 ELSE 0 END) AS BIGINT) AS n_pass
FROM rules
GROUP BY source
""",
    tags=("text", "quality", "gopher", "pipeline"),
)
def text_gopher_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style quality-rule bundle, one map-side pass over the corpus.

    Five published rule shapes (word-count bounds, mean word length,
    stopword presence, top-word repetition cap, alphabetic-word fraction)
    are computed in ONE vectorized pass — so the document text never
    shuffles; the only exchange carries ≤|sources| verdict rows.
    Thresholds are cross-multiplied integers (``5·maxc ≤ nw`` instead of
    ``maxc/nw ≤ 0.2``), so the verdict is bit-exact in any engine.

    Round 17 (guide §4.2): the five statistics ran as interpreted JVM
    array expressions per row — a sort_array + O(n) lambda fold for the
    top-word count, an rlike per WORD for the alpha rule. One mapInArrow
    pass computes them per batch in C (one split, a Counter for the
    multiplicity max, per-DISTINCT-token memoized length/stopword/alpha
    lookups — the memo resets per batch). Token semantics are pinned to
    the JVM expressions they replace: Java regex \\s+ ==
    re.ASCII \\s+ == [ \\t\\n\\x0B\\f\\r]+, empties dropped, length in
    code points, rlike '[a-zA-Z]' == re.search. Counts are exact ints."""
    from pyspark.sql.types import LongType, StructField, StructType

    # round 17: spread the single-split gate-SF scan across cores
    # before the Python pass (guide §2.5); per-doc output rows —
    # partition-invariant
    docs = spread(
        load(spark, sf_dir, "documents"), spark, sf_dir, "documents"
    )
    src = docs.select("source", "text")
    _schema = StructType(
        [src.schema.fields[0]]
        + [
            StructField(n, LongType(), False)
            for n in ("nw", "chars", "stopc", "alphac", "maxc")
        ]
    )
    _stops = frozenset(GQ_STOPWORDS)

    def _fn(batches):
        import re
        from collections import Counter

        import pyarrow as pa

        ws = re.compile(r"\s+", re.ASCII)
        has_alpha = re.compile("[a-zA-Z]").search
        for batch in batches:
            if batch.num_rows == 0:
                continue
            texts = batch.column(1).to_pylist()
            cols = ([], [], [], [], [])
            tinfo: dict[str, tuple[int, int, int]] = {}
            for t in texts:
                toks = [w for w in ws.split(t) if w]
                c = Counter(toks)
                nw = len(toks)
                chars = stopc = alphac = 0
                for w, k in c.items():
                    info = tinfo.get(w)
                    if info is None:
                        info = (
                            len(w),
                            1 if w in _stops else 0,
                            1 if has_alpha(w) else 0,
                        )
                        tinfo[w] = info
                    chars += info[0] * k
                    stopc += info[1] * k
                    alphac += info[2] * k
                cols[0].append(nw)
                cols[1].append(chars)
                cols[2].append(stopc)
                cols[3].append(alphac)
                cols[4].append(max(c.values()) if c else 0)
            yield pa.RecordBatch.from_arrays(
                [batch.column(0)]
                + [pa.array(x, type=pa.int64()) for x in cols],
                names=["source", "nw", "chars", "stopc", "alphac", "maxc"],
            )

    stats = src.mapInArrow(_fn, _schema)
    rules = stats.select(
        "source",
        F.col("nw").between(GQ_MIN_WORDS, GQ_MAX_WORDS).alias("r_wc"),
        (
            (F.lit(GQ_MIN_MEAN_LEN) * F.col("nw") <= F.col("chars"))
            & (F.col("chars") <= F.lit(GQ_MAX_MEAN_LEN) * F.col("nw"))
        ).alias("r_len"),
        (F.col("stopc") >= GQ_MIN_STOPWORDS).alias("r_stop"),
        (F.lit(GQ_TOP_FRAC_DEN) * F.col("maxc") <= F.col("nw")).alias(
            "r_top"
        ),
        (
            F.lit(GQ_ALPHA_DEN) * F.col("alphac")
            >= F.lit(GQ_ALPHA_NUM) * F.col("nw")
        ).alias("r_alpha"),
    )

    def fails(c: str) -> F.Column:
        return F.sum(F.when(~F.col(c), 1).otherwise(0)).cast("bigint")

    return rules.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        fails("r_wc").alias("fail_wordcount"),
        fails("r_len").alias("fail_meanlen"),
        fails("r_stop").alias("fail_stopwords"),
        fails("r_top").alias("fail_topword"),
        fails("r_alpha").alias("fail_alpha"),
        F.sum(
            F.when(
                F.col("r_wc")
                & F.col("r_len")
                & F.col("r_stop")
                & F.col("r_top")
                & F.col("r_alpha"),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("n_pass"),
    )


# --------------------------------------------------------------------------
# Distributed Bloom-filter membership (bit_or word aggregation)
# --------------------------------------------------------------------------

BF_BITS = 4096  #: filter size m
BF_WORDS = 128  #: 32 bits per word — stays positive in a BIGINT
BF_HASHES = 4  #: k independent md5-derived hash rows


def _bf_pos_spark(row: int, key: F.Column) -> F.Column:
    """Bit position of ``key`` under hash row ``row`` (md5 grid — the same
    engine-portable hash family as sketch_count_min)."""
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"{row}:"), key.cast("string"))), 1, 8
            ),
            16,
            10,
        ).cast("bigint")
        % BF_BITS
    )


def _bf_pos_sql(row: int, key: str) -> str:
    return (
        f"(('0x' || substr(md5('{row}:' || CAST({key} AS VARCHAR)), 1, 8))"
        f"::BIGINT % {BF_BITS})"
    )


def _bf_bit_sql(row: int, key: str) -> str:
    p = _bf_pos_sql(row, key)
    return f"SELECT {p} // 32 AS word, {p} % 32 AS bit"


@register(
    "sketch_bloom_membership",
    oracle=f"""
WITH keys AS (SELECT DISTINCT o_custkey FROM orders),
cells AS (
    {" UNION ALL ".join(f"{_bf_bit_sql(r, 'o_custkey')} FROM keys" for r in range(BF_HASHES))}
),
bloom AS (
    SELECT word, BIT_OR(CAST(1 AS BIGINT) << CAST(bit AS INTEGER)) AS bits
    FROM cells GROUP BY word
),
probes AS (
    {" UNION ALL ".join(f"SELECT c_custkey, c_mktsegment, {_bf_pos_sql(r, 'c_custkey')} // 32 AS word, {_bf_pos_sql(r, 'c_custkey')} % 32 AS bit FROM customer" for r in range(BF_HASHES))}
),
hits AS (
    SELECT p.c_custkey, p.c_mktsegment,
           MIN(CASE WHEN ((COALESCE(b.bits, 0) >> CAST(p.bit AS INTEGER)) & 1) = 1
               THEN 1 ELSE 0 END) AS all_set
    FROM probes p LEFT JOIN bloom b ON p.word = b.word
    GROUP BY 1, 2
),
verdict AS (
    SELECT h.c_mktsegment, h.all_set,
           CASE WHEN k.o_custkey IS NULL THEN 0 ELSE 1 END AS exact_member
    FROM hits h LEFT JOIN keys k ON h.c_custkey = k.o_custkey
)
SELECT c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(exact_member) AS BIGINT) AS exact_members,
       CAST(SUM(all_set) AS BIGINT) AS bloom_positives,
       CAST(SUM(CASE WHEN all_set = 1 AND exact_member = 0 THEN 1 ELSE 0 END)
            AS BIGINT) AS false_positives
FROM verdict
GROUP BY c_mktsegment
""",
    tags=("sketch", "bloom", "membership", "dedup"),
)
def sketch_bloom_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed Bloom filter: build a {BF_BITS}-bit filter over the set
    of custkeys that placed orders as a ``bit_or`` aggregation of
    {BF_WORDS} 32-bit words (partial bitmaps from every executor OR
    together — the sketch is a monoid, the exact posture of a 100 TB
    "seen this URL?" crawl dedup), then probe every customer key through
    a BROADCAST of the bitmap and tally false positives against the exact
    semi-join answer per market segment.

    The big build side shuffles only (word, bit) pairs — {BF_HASHES} rows
    per key — and the probe side never shuffles at all (broadcast join +
    map-side bit test). Bloom guarantees no false negatives:
    ``bloom_positives ≥ exact_members`` in every group, checked exactly
    by the oracle."""
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    keys = orders.select("o_custkey").distinct()

    def positions(key: str) -> F.Column:
        # all BF_HASHES bit positions in ONE array so the build/probe sides
        # each scan their table exactly once (a per-row union would rescan
        # the table per hash row)
        return F.array(
            *[_bf_pos_spark(r, F.col(key)) for r in range(BF_HASHES)]
        )

    cells = keys.select(
        F.explode(positions("o_custkey")).alias("pos")
    ).select(
        (F.col("pos") / 32).cast("bigint").alias("word"),
        (F.col("pos") % 32).cast("int").alias("bit"),
    )
    bloom = cells.groupBy("word").agg(
        F.bit_or(F.expr("shiftleft(CAST(1 AS BIGINT), bit)")).alias("bits")
    )
    probes = cust.select(
        "c_custkey",
        "c_mktsegment",
        F.explode(positions("c_custkey")).alias("pos"),
    ).select(
        "c_custkey",
        "c_mktsegment",
        (F.col("pos") / 32).cast("bigint").alias("word"),
        (F.col("pos") % 32).cast("int").alias("bit"),
    )
    # LEFT join + COALESCE(bits, 0): a probe landing in an all-zero word
    # has NO bloom row, and a real Bloom filter reads that as an unset bit
    # (definite non-member) — an inner join would silently drop the probe
    # from the MIN and overcount positives on sparse filters (ADVICE r13).
    hits = (
        probes.join(F.broadcast(bloom), "word", "left")
        .select(
            "c_custkey",
            "c_mktsegment",
            F.when(
                F.expr(
                    "(shiftright(COALESCE(bits, CAST(0 AS BIGINT)), bit)"
                    " & CAST(1 AS BIGINT))"
                )
                == 1,
                1,
            )
            .otherwise(0)
            .alias("set_bit"),
        )
        .groupBy("c_custkey", "c_mktsegment")
        .agg(F.min("set_bit").alias("all_set"))
    )
    verdict = hits.join(
        keys.withColumnRenamed("o_custkey", "c_custkey").withColumn(
            "exact_member", F.lit(1)
        ),
        "c_custkey",
        "left",
    ).fillna({"exact_member": 0})
    return verdict.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_customers"),
        F.sum("exact_member").cast("bigint").alias("exact_members"),
        F.sum("all_set").cast("bigint").alias("bloom_positives"),
        F.sum(
            F.when((F.col("all_set") == 1) & (F.col("exact_member") == 0), 1)
            .otherwise(0)
        )
        .cast("bigint")
        .alias("false_positives"),
    )


# --------------------------------------------------------------------------
# N-gram novelty: how much of each source is first-seen content?
# --------------------------------------------------------------------------


@register(
    "text_ngram_novelty",
    oracle="""
WITH shingles AS (
    SELECT DISTINCT doc_id, w1 || ' ' || w2 || ' ' || w3 AS shingle
    FROM (
        SELECT doc_id,
               words[i] AS w1, words[i+1] AS w2, words[i+2] AS w3
        FROM (
            SELECT doc_id,
                   list_filter(regexp_split_to_array(text, '\\s+'),
                               x -> x <> '') AS words
            FROM documents
        ), UNNEST(range(1, GREATEST(len(words) - 1, 1))) t(i)
    )
),
per_doc AS (
    SELECT doc_id, COUNT(*) AS n_grams FROM shingles GROUP BY doc_id
),
firsts AS (
    SELECT MIN(doc_id) AS first_doc FROM shingles GROUP BY shingle
),
first_counts AS (
    SELECT first_doc AS doc_id, COUNT(*) AS n_first
    FROM firsts GROUP BY first_doc
)
SELECT d.source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(p.n_grams) AS BIGINT) AS grams,
       CAST(SUM(COALESCE(f.n_first, 0)) AS BIGINT) AS first_seen,
       CAST((10000 * SUM(COALESCE(f.n_first, 0)))
            // SUM(p.n_grams) AS BIGINT) AS novelty_bp
FROM per_doc p
JOIN documents d ON p.doc_id = d.doc_id
LEFT JOIN first_counts f ON p.doc_id = f.doc_id
GROUP BY d.source
""",
    tags=("text", "novelty", "dedup", "pipeline"),
)
def text_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source n-gram NOVELTY — the data-curation view of duplication:
    of each document's distinct word 3-grams, how many appear for the
    FIRST time (by doc_id order) in that document? A source that mostly
    re-states earlier shingles contributes little novel signal to a
    training mix, however large its token count.

    Plan: one shingle explode (shared shape with the dedup family), a
    (shingle → min doc_id) aggregate, and the per-doc first-seen counts
    come from GROUPING THE MINIMA — no join back to the corpus-scale
    shingle set. Novelty is integer basis points (exact ``div``)."""
    from quiver_spark.operators.dedup import _shingles

    # round 17: spread on this scan measured a wash in a paired A/B
    # (1.15 -> 1.16 s) — the explode is light next to the two aggregate
    # shuffles; left unspread
    docs = load(spark, sf_dir, "documents")
    sh = _shingles(docs)
    per_doc = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_grams"))
    first_counts = (
        sh.groupBy("shingle")
        .agg(F.min("doc_id").alias("doc_id"))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_first"))
    )
    per = (
        per_doc.join(first_counts, "doc_id", "left")
        .fillna({"n_first": 0})
        .join(docs.select("doc_id", "source"), "doc_id")
    )
    return per.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_grams").cast("bigint").alias("grams"),
        F.sum("n_first").cast("bigint").alias("first_seen"),
        F.expr("CAST((10000 * SUM(n_first)) DIV SUM(n_grams) AS BIGINT)").alias(
            "novelty_bp"
        ),
    )


# --------------------------------------------------------------------------
# TF-IDF keywords per source
# --------------------------------------------------------------------------

TFIDF_TOPK = 5


@register(
    "text_tfidf_topk",
    oracle=f"""
WITH toks AS (
    SELECT doc_id, source, unnest(list_filter(
        regexp_split_to_array(text, '\\s+'), x -> x <> '')) AS token
    FROM documents
),
n AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM toks),
df AS (SELECT token, COUNT(DISTINCT doc_id) AS doc_freq FROM toks GROUP BY token),
stf AS (
    SELECT source, token, COUNT(*) AS sum_tf
    FROM toks GROUP BY source, token
),
scored AS (
    SELECT s.source, s.token, d.doc_freq,
           CAST(s.sum_tf AS BIGINT) AS sum_tf,
           CAST(s.sum_tf AS DOUBLE)
               * (LN((CAST(n.n_docs AS DOUBLE) + 1)
                     / (CAST(d.doc_freq AS DOUBLE) + 1)) + 1) AS tfidf
    FROM stf s JOIN df d ON s.token = d.token CROSS JOIN n
),
ranked AS (
    SELECT source, token, CAST(doc_freq AS BIGINT) AS doc_freq, sum_tf, tfidf,
           ROW_NUMBER() OVER (
               PARTITION BY source ORDER BY tfidf DESC, token) AS rnk
    FROM scored
)
SELECT source, token, doc_freq, sum_tf, tfidf, rnk
FROM ranked WHERE rnk <= {TFIDF_TOPK}
""",
    tags=("text", "tfidf", "keywords", "pipeline"),
)
def text_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source TF-IDF keywords — the corpus-characterization statistic
    next to zipf/TTR/top-k counts: smooth-IDF (ln((N+1)/(df+1))+1) scored
    over source-level term frequencies, top-5 terms per source.

    Determinism without banning logarithms: the score is computed as
    ``exact_bigint_sum_tf × idf`` — ONE multiplication of identical
    operands per (source, token) — never a float SUM whose order could
    differ across engines; ln on identical doubles is correctly rounded
    identically (the zipf-slope operator pins the same property).

    Plan shape (round 17, guide §4.2 + §2.3): ONE vectorized corpus pass
    replaces the three JVM tokenizations (the stf explode, a second
    explode feeding the two-phase countDistinct, and the map-side n_docs
    scan), and the shuffle now carries per-batch PRE-AGGREGATED (token,
    count) partials instead of every token occurrence. Exactness: every
    document lands in exactly one Arrow batch, so the per-batch
    per-token distinct-document counts partition the corpus disjointly —
    summing them IS countDistinct(doc_id); occurrence counts are plain
    sums; the n_docs partials count docs with ≥1 token. Tokenization is
    pinned to the JVM split it replaces (Java \\s+ == re.ASCII \\s+,
    empties dropped). The token join stays between the two AGGREGATES,
    per-source top-k windows over ≤|vocabulary| rows."""
    from pyspark.sql.types import (
        IntegerType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    docs = load(spark, sf_dir, "documents")
    _schema = StructType(
        [
            StructField("kind", IntegerType(), False),
            StructField("token", StringType(), True),
            StructField("source", StringType(), True),
            StructField("cnt", LongType(), False),
        ]
    )

    def _fn(batches):
        import re
        from collections import Counter

        import pyarrow as pa

        ws = re.compile(r"\s+", re.ASCII)
        for batch in batches:
            if batch.num_rows == 0:
                continue
            sources = batch.column(0).to_pylist()
            texts = batch.column(1).to_pylist()
            stf_c: Counter = Counter()
            df_c: Counter = Counter()
            nd = 0
            for s, t in zip(sources, texts):
                toks = [w for w in ws.split(t) if w]
                if not toks:
                    continue
                nd += 1
                c = Counter(toks)
                for w, k in c.items():
                    stf_c[(s, w)] += k
                df_c.update(c.keys())
            kinds, tok_a, src_a, cnt_a = [], [], [], []
            for (s, w), k in stf_c.items():
                kinds.append(0)
                tok_a.append(w)
                src_a.append(s)
                cnt_a.append(k)
            for w, k in df_c.items():
                kinds.append(1)
                tok_a.append(w)
                src_a.append(None)
                cnt_a.append(k)
            kinds.append(2)
            tok_a.append(None)
            src_a.append(None)
            cnt_a.append(nd)
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(kinds, type=pa.int32()),
                    pa.array(tok_a, type=pa.string()),
                    pa.array(src_a, type=pa.string()),
                    pa.array(cnt_a, type=pa.int64()),
                ],
                names=["kind", "token", "source", "cnt"],
            )

    # one pass, three consumers (n, df, stf) — the lazy checkpoint holds
    # the vocabulary-bounded partials, never the corpus
    parts = (
        docs.select("source", "text")
        .mapInArrow(_fn, _schema)
        .localCheckpoint(eager=False)
    )
    n = parts.filter(F.col("kind") == 2).agg(
        F.sum("cnt").alias("n_docs")
    )
    df = parts.filter(F.col("kind") == 1).groupBy("token").agg(
        F.sum("cnt").alias("doc_freq")
    )
    stf = parts.filter(F.col("kind") == 0).groupBy("source", "token").agg(
        F.sum("cnt").alias("sum_tf")
    )
    idf = (
        F.log(
            (F.col("n_docs").cast("double") + 1)
            / (F.col("doc_freq").cast("double") + 1)
        )
        + 1
    )
    scored = stf.join(df, "token").crossJoin(F.broadcast(n)).select(
        "source",
        "token",
        F.col("doc_freq").cast("bigint").alias("doc_freq"),
        F.col("sum_tf").cast("bigint").alias("sum_tf"),
        (F.col("sum_tf").cast("double") * idf).alias("tfidf"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("source").orderBy(F.desc("tfidf"), F.asc("token"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TFIDF_TOPK)
    )


# --------------------------------------------------------------------------
# Deterministic epoch shuffle planning (training-order reproducibility)
# --------------------------------------------------------------------------

EPOCHS = 3
SHARDS = 8
#: positions per fingerprint chunk (round 14, VERDICT r13 Next #4): the
#: per-(epoch, shard) order fingerprint is hierarchical — md5 per
#: fixed-size chunk of the position sequence, then md5 over the ordered
#: chunk digests — so no reducer ever materializes a whole shard's
#: doc_id list (the flat collect_list held O(corpus/shards) structs in
#: one row). 64 here so every test SF exercises the two-level path; the
#: production knob is ~64k (5M docs / 24 shards / 64k ≈ 4 digests at
#: level 2 — bounded either way: level 1 holds ≤ EPOCH_CHUNK structs,
#: level 2 ≤ ceil(shard/EPOCH_CHUNK) 32-char digests).
EPOCH_CHUNK = 64


@register(
    "pipeline_epoch_shuffle_plan",
    oracle=f"""
WITH placed AS (
    SELECT e.epoch, d.doc_id, d.n_chars,
           md5(CAST(e.epoch AS VARCHAR) || ':' || CAST(d.doc_id AS VARCHAR))
               AS h,
           (('0x' || substr(md5(CAST(e.epoch AS VARCHAR) || ':'
                || CAST(d.doc_id AS VARCHAR)), 1, 8))::BIGINT % {SHARDS})
               AS shard
    FROM documents d
    CROSS JOIN (SELECT unnest(range({EPOCHS})) AS epoch) e
),
ranked AS (
    SELECT epoch, shard, doc_id, n_chars,
           ROW_NUMBER() OVER (
               PARTITION BY epoch, shard ORDER BY h, doc_id) AS pos
    FROM placed
),
chunked AS (
    SELECT epoch, shard, (pos - 1) // {EPOCH_CHUNK} AS chunk,
           COUNT(*) AS n, SUM(n_chars) AS chars,
           md5(string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY pos)) AS cd
    FROM ranked
    GROUP BY 1, 2, 3
)
SELECT CAST(epoch AS BIGINT) AS epoch,
       CAST(shard AS BIGINT) AS shard,
       CAST(SUM(n) AS BIGINT) AS n_docs,
       CAST(SUM(chars) AS BIGINT) AS chars,
       md5(string_agg(cd, ',' ORDER BY chunk)) AS order_fingerprint
FROM chunked
GROUP BY epoch, shard
""",
    tags=("pipeline", "sampling", "shuffle", "training"),
)
def pipeline_epoch_shuffle_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-epoch training-data shuffle plan: every document
    gets a seeded pseudo-random position — shard and in-shard order both
    derive from md5(epoch:doc_id) — so a re-run, a re-shard, or a DIFFERENT
    ENGINE reproduces byte-identical data order (the property that makes a
    training run resumable and an ablation comparable). The
    order_fingerprint column proves it: a HIERARCHICAL md5 — each
    {EPOCH_CHUNK}-position chunk of the shard's doc_id sequence digests
    independently, then the ordered chunk digests digest again —
    hash-compared against DuckDB computing the same two levels.

    Plan shape: placement is pure map-side arithmetic (corpus × tiny epoch
    array); the only corpus-scale exchange is the (epoch, shard) window —
    the chunk aggregate keys on (epoch, shard, chunk), a SUPERSET of the
    window's partitioning, so it reuses the exchange, and no reducer row
    ever holds more than {EPOCH_CHUNK} positions (the round-13 flat
    collect_list held O(corpus/shards) structs in one row — the window's
    sort spills, a collect_list doesn't)."""
    docs = load(spark, sf_dir, "documents")
    placed = docs.select(
        "doc_id",
        "n_chars",
        F.explode(F.expr(f"sequence(0, {EPOCHS - 1})")).alias("epoch"),
    ).select(
        "epoch",
        "doc_id",
        "n_chars",
        F.md5(
            F.concat(
                F.col("epoch").cast("string"),
                F.lit(":"),
                F.col("doc_id").cast("string"),
            )
        ).alias("h"),
    ).withColumn(
        "shard",
        F.conv(F.substring("h", 1, 8), 16, 10).cast("bigint") % SHARDS,
    )
    from pyspark.sql import Window

    # Round 15 (VERDICT r14 Next #6): the global rank no longer runs as
    # Window.partitionBy(epoch, shard) — that plan has exactly
    # EPOCHS×SHARDS reducer tasks, so with O(1) shards the per-task sort
    # grows linearly with the corpus (spill-safe but a parallelism
    # ceiling: 72 tasks each sorting corpus/72 at 100 TB). Instead the
    # corpus RANGE-partitions on the full sort key — reducer pressure is
    # corpus/shuffle.partitions, scaling with the CLUSTER — and the
    # exact row_number is reconstructed without any corpus-wide window:
    # within a range partition rows are sorted and
    # monotonically_increasing_id assigns CONSECUTIVE ids per partition,
    # so pos = (per-(epoch,shard,pid) offset from the tiny count rollup)
    # + (mid − min(mid)) + 1. The checkpoint materializes the ranked
    # corpus once for its two consumers (counts + join), which also
    # pins one sort order for the id assignment. Fingerprints are
    # byte-identical to the window formulation (the oracle is unchanged);
    # the trade is one extra corpus-scale exchange (the chunk aggregate
    # can no longer reuse the rank partitioning) for unbounded rank
    # parallelism — recorded in BASELINE.md.
    seg = (
        placed.repartitionByRange("epoch", "shard", "h", "doc_id")
        .sortWithinPartitions("epoch", "shard", "h", "doc_id")
        .select(
            "*",
            F.spark_partition_id().alias("pid"),
            F.monotonically_increasing_id().alias("mid"),
        )
        .localCheckpoint(eager=False)
    )
    counts = seg.groupBy("epoch", "shard", "pid").agg(
        F.count(F.lit(1)).alias("bn"), F.min("mid").alias("mn")
    )
    woff = (
        Window.partitionBy("epoch", "shard")
        .orderBy("pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = counts.select(
        "epoch",
        "shard",
        "pid",
        "mn",
        F.coalesce(F.sum("bn").over(woff), F.lit(0)).alias("off"),
    )
    # offs is ≤ epochs·shards·shuffle-partitions rows — broadcast; the
    # hint's subtree holds no joins, so no propagation hazard
    ranked = seg.join(F.broadcast(offs), ["epoch", "shard", "pid"]).select(
        "epoch",
        "shard",
        "doc_id",
        "n_chars",
        (F.col("off") + (F.col("mid") - F.col("mn")) + 1).alias("pos"),
    )
    # Level 1 keys on (epoch, shard, chunk) and its collect_list is
    # bounded by EPOCH_CHUNK; level 2 collects only the 32-char chunk
    # digests — no reducer row exceeds EPOCH_CHUNK positions either way.
    chunked = (
        ranked.withColumn(
            "chunk", ((F.col("pos") - 1) / EPOCH_CHUNK).cast("bigint")
        )
        .groupBy("epoch", "shard", "chunk")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("n_chars").alias("chars"),
            F.md5(
                F.concat_ws(
                    ",",
                    F.expr(
                        "transform(array_sort(collect_list(named_struct("
                        "'pos', pos, 'doc_id', doc_id)),"
                        " (a, b) -> CAST(a.pos - b.pos AS INT)),"
                        " s -> CAST(s.doc_id AS STRING))"
                    ),
                )
            ).alias("cd"),
        )
    )
    agg = chunked.groupBy("epoch", "shard").agg(
        F.sum("n").cast("bigint").alias("n_docs"),
        F.sum("chars").cast("bigint").alias("chars"),
        F.md5(
            F.concat_ws(
                ",",
                F.expr(
                    "transform(array_sort(collect_list(named_struct("
                    "'chunk', chunk, 'cd', cd)),"
                    " (a, b) -> CAST(a.chunk - b.chunk AS INT)),"
                    " s -> s.cd)"
                ),
            )
        ).alias("order_fingerprint"),
    )
    return agg.select(
        F.col("epoch").cast("bigint").alias("epoch"),
        F.col("shard").cast("bigint").alias("shard"),
        "n_docs",
        "chars",
        "order_fingerprint",
    )
