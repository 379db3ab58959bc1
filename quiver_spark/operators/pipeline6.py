"""Corpus-analysis battery #6: lexical-statistics and cross-source
duplication operators a pretraining-data pipeline runs before mixing —
bigram distributions (tokenizer/quality diagnostics), type-token ratios
(vocabulary richness per source, the classic repetition smell test), and
the cross-source duplicate matrix (which source pairs ship the same
documents — drives source-level dedup priorities and mixture debugging).

The reference (a columnar format library) has no text surface; these are
driver-mandated LLM-pipeline extensions in the same mold as
operators/text.py, built from JVM-side explode/agg/window primitives only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from quiver_spark.registry import register
from quiver_spark.tables import load


@register(
    "text_bigram_topk",
    oracle="""
WITH arr AS (
    SELECT lang,
           list_filter(string_split(text, ' '), t -> t <> '') AS a
    FROM documents
),
big AS (
    SELECT lang,
           unnest(list_transform(range(1, len(a)),
                                 i -> a[i] || ' ' || a[i + 1])) AS bigram
    FROM arr
),
cnt AS (
    SELECT lang, bigram, COUNT(*) AS cnt FROM big GROUP BY lang, bigram
)
SELECT lang, bigram, cnt
FROM (
    SELECT lang, bigram, cnt,
           ROW_NUMBER() OVER (PARTITION BY lang
                              ORDER BY cnt DESC, bigram) AS rk
    FROM cnt
)
WHERE rk <= 10
""",
    tags=("text", "ngram", "topk", "window"),
)
def text_bigram_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 token bigrams per language — the co-occurrence diagnostic
    that surfaces boilerplate and templated text before training.

    Spark side: bigrams come from zipping the token array with itself
    shifted by one (``slice``+``zip_with`` — pure map-side JVM arrays, no
    posexplode self-join), then one (lang, bigram) count shuffle and a
    per-lang ranked window with a deterministic (cnt DESC, bigram) tie
    break. The oracle builds the same bigrams with a list_transform over
    index ranges — a different construction, one answer. At 100 TB the
    window input is the aggregated bigram relation (vocabulary²-bounded,
    hash-distributed), never the corpus."""
    d = load(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.col("text"), " "), lambda t: t != "")
    bigrams = F.zip_with(
        F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
        F.slice(
            toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))
        ),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    cnt = (
        d.select("lang", F.explode(bigrams).alias("bigram"))
        .groupBy("lang", "bigram")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.partitionBy("lang").orderBy(F.desc("cnt"), "bigram")
    return (
        cnt.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 10)
        .select("lang", "bigram", "cnt")
    )


@register(
    "text_type_token_ratio",
    oracle="""
WITH tok AS (
    SELECT doc_id, source, unnest(string_split(text, ' ')) AS token
    FROM documents
)
SELECT source,
       COUNT(*) AS n_tokens,
       COUNT(DISTINCT token) AS n_types,
       CAST(COUNT(DISTINCT token) * 10000 // COUNT(*) AS BIGINT)
           AS ttr_10k
FROM tok
WHERE token <> ''
GROUP BY source
""",
    tags=("text", "agg", "distinct"),
)
def text_type_token_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-token ratio per source — vocabulary richness scaled to basis
    points with INTEGER division (engine-identical; no float ratio to
    hash-mismatch on). A source whose TTR collapses relative to its peers
    is shipping templated/repeated text.

    Scale shape: explode is map-side; one (source, token) distinct-count
    aggregate shuffle. Sources are few, tokens distribute by hash —
    no skew pivot."""
    d = load(spark, sf_dir, "documents")
    return (
        d.select("source", F.explode(F.split("text", " ")).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.countDistinct("token").alias("n_types"),
        )
        .withColumn(
            # `div` is Spark's integral division — exact bigint floor
            # semantics matching DuckDB's `//` (a double true-division
            # could round up across an integer boundary at 2^52-scale
            # counts and hash-mismatch)
            "ttr_10k",
            F.expr("(n_types * 10000) div n_tokens"),
        )
    )


@register(
    "dedup_cross_source_matrix",
    oracle="""
WITH h AS (
    SELECT DISTINCT
           md5(array_to_string(
               list_filter(string_split(text, ' '), t -> t <> '')[1:12],
               ' ')) AS h,
           source
    FROM documents
)
SELECT a.source AS source_a, b.source AS source_b,
       COUNT(*) AS shared_docs
FROM h a JOIN h b ON a.h = b.h AND a.source < b.source
GROUP BY source_a, source_b
""",
    tags=("dedup", "join", "matrix"),
)
def dedup_cross_source_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source duplication matrix: for every pair of sources, how
    many distinct leading-prefix fingerprints (first 12 tokens — the
    boilerplate/header signature; whole-text md5 finds nothing shared in
    this corpus) they BOTH ship. The source-level view of dedup that
    decides which feeds to de-prioritize in the mixture.

    Scale shape: one distinct on (fingerprint, source) — corpus-sized,
    uniform md5 keys — then a self-join ON THE FINGERPRINT whose per-key
    fan-out is bounded by the source count (≤ #sources² pairs per key,
    with #sources a config-scale constant, not data-scale), then a
    #sources²-sized aggregate. The same bounded-blocking discipline as
    every pair generator in operators/dedup.py."""
    d = load(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.col("text"), " "), lambda t: t != "")
    h = d.select(
        F.md5(F.concat_ws(" ", F.slice(toks, 1, 12))).alias("h"), "source"
    ).distinct()
    a = h.alias("a")
    b = h.alias("b")
    return (
        a.join(
            b,
            (F.col("a.h") == F.col("b.h"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
        )
        .agg(F.count(F.lit(1)).alias("shared_docs"))
    )


@register(
    "sample_per_source_topk",
    oracle="""
SELECT source, doc_id, n_chars
FROM (
    SELECT source, doc_id, n_chars,
           ROW_NUMBER() OVER (PARTITION BY source
                              ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
               AS rk
    FROM documents
)
WHERE rk <= 5
""",
    tags=("sampling", "window", "deterministic"),
)
def sample_per_source_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-source sample: the 5 documents per source whose
    md5(doc_id) ranks lowest — a seedless, engine-independent stand-in
    for per-stratum reservoir sampling. Hash-ranking makes the sample
    stable across runs, engines, and partitionings (no RNG state), which
    is what makes pipeline reruns reproducible.

    Scale shape: one window shuffle on the source key; rank-k windows
    early-out per partition. With heavy sources, the same pattern runs as
    a two-phase top-k (per-partition head, then merge) — Spark's window
    TopK pushdown handles the single-key-skew case via AQE."""
    d = load(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    return (
        d.select(
            "source",
            "doc_id",
            "n_chars",
            F.row_number().over(w).alias("rk"),
        )
        .filter(F.col("rk") <= 5)
        .drop("rk")
    )


#: duplicated-span k-gram width (tokens). Long spans = true duplication
#: (the ExactSubstr posture, Lee et al. 2022 "Deduplicating Training
#: Data Makes Language Models Better", scaled to the fixture corpus);
#: short k would excise coincidental n-gram overlap.
SPAN_K = 16


@register(
    "dedup_span_excision",
    oracle="""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
),
grams AS (
  SELECT doc_id, g.pos AS pos,
         array_to_string(t[g.pos : g.pos + 15], ' ') AS gram
  FROM toks, LATERAL (
    SELECT unnest(generate_series(1, greatest(len(t) - 15, 0))) AS pos
  ) g
),
dup AS (
  SELECT gram, min(doc_id) AS owner
  FROM grams GROUP BY gram HAVING COUNT(DISTINCT doc_id) >= 2
),
excised AS (
  SELECT DISTINCT g.doc_id, u.idx
  FROM grams g
  JOIN dup d USING (gram),
  LATERAL (SELECT unnest(generate_series(g.pos, g.pos + 15)) AS idx) u
  WHERE g.doc_id <> d.owner
),
kept AS (
  SELECT tk.doc_id,
         string_agg(tk.tok, ' ' ORDER BY tk.idx) AS clean_text,
         COUNT(*) AS tokens_kept
  FROM (
    SELECT toks.doc_id, i.idx, toks.t[i.idx] AS tok
    FROM toks, LATERAL (
      SELECT unnest(generate_series(1, len(toks.t))) AS idx
    ) i
  ) tk
  LEFT JOIN excised e ON e.doc_id = tk.doc_id AND e.idx = tk.idx
  WHERE e.idx IS NULL
  GROUP BY tk.doc_id
)
SELECT toks.doc_id,
       CAST(coalesce(kept.tokens_kept, 0) AS BIGINT) AS tokens_kept,
       CAST(len(toks.t) - coalesce(kept.tokens_kept, 0) AS BIGINT)
           AS tokens_removed,
       coalesce(kept.clean_text, '') AS clean_text
FROM toks LEFT JOIN kept USING (doc_id)
""",
    tags=("dedup", "text", "span"),
)
def dedup_span_excision(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicated-SPAN excision — substring-level exact dedup (the
    ExactSubstr analogue of Lee et al. 2022, expressed in Spark
    built-ins): any ``SPAN_K``-token gram appearing in ≥2 documents is a
    duplicated span; every occurrence OUTSIDE the owning document (min
    doc_id — keep-one semantics) is excised token-wise, and each
    document is rebuilt from its surviving tokens. Returns per document
    the kept/removed token counts and the cleaned text.

    Plan shape for 100 TB: gram construction is map-side
    (posexplode over token windows, one row per token position); the
    only shuffles are the gram groupBy (owner + document-frequency — the
    same uniform-hash key as every shingle index here) and the final
    per-document regroup. The index expansion is bounded by
    excised-positions × K, i.e. proportional to ACTUAL duplication, not
    corpus size; no pair enumeration ever happens (the quadratic
    candidate-pair stage of MinHash/ngram dedup is absent entirely —
    this operator's output is the cleaned corpus itself)."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    toks = docs.select(
        "doc_id", F.split("text", " ").alias("t")
    ).localCheckpoint(eager=False)
    k = SPAN_K
    # one row per gram start (1-based to mirror the oracle): the gram is
    # the space-join of tokens [pos, pos+k)
    grams = toks.select(
        "doc_id",
        F.posexplode(
            # CASE guard: Spark's sequence(1, 0) counts DOWN ([1, 0]),
            # so a doc shorter than k tokens must yield an EMPTY gram
            # array, not a descending one
            F.expr(
                f"CASE WHEN size(t) >= {k} THEN "
                f"transform(sequence(1, size(t) - {k - 1}),"
                f" p -> array_join(slice(t, p, {k}), ' ')) "
                f"ELSE array() END"
            )
        ).alias("p0", "gram"),
    ).select(
        "doc_id",
        (F.col("p0") + F.lit(1)).alias("pos"),
        # shuffle a 64-bit fingerprint, not the k-token string: the
        # group/join payload shrinks ~10×. Collision odds over G grams
        # are ~G²/2⁶⁵ (≈1e-8 at a million grams) — the standard
        # ExactSubstr engineering tradeoff.
        F.xxhash64("gram").alias("gram"),
        # two consumers (the owner groupBy and the excision join) whose
        # exchanges carry DIFFERENT payloads, so exchange reuse cannot
        # merge them — without the checkpoint the token-window transform
        # + hash runs twice (plan showed 2× posexplode/xxhash64)
    ).localCheckpoint(eager=False)
    # round 17 (guide §2.3): "appears in >= 2 distinct docs" is exactly
    # min(doc_id) != max(doc_id) — the count_distinct forced a two-phase
    # distinct aggregate ((gram, doc_id) partial dedup shuffle); min/max
    # partial-aggregate map-side and shuffle one row per gram per task
    dup = (
        grams.groupBy("gram")
        .agg(
            F.min("doc_id").alias("owner"),
            F.max("doc_id").alias("_mx"),
        )
        .filter(F.col("_mx") != F.col("owner"))
        .drop("_mx")
    )
    excised = (
        grams.join(dup, "gram")
        .filter(F.col("doc_id") != F.col("owner"))
        .select(
            "doc_id",
            F.explode(
                F.expr(f"sequence(pos, pos + {k - 1})")
            ).alias("idx"),
        )
        .distinct()
        # three consumers (touched-doc set, the anti-join, and the
        # counts) would otherwise each recompute the whole gram shuffle
        # — truncate the lineage so it runs once (plan audit showed the
        # dup subtree tripled without this)
        .localCheckpoint(eager=False)
    )
    # rebuild ONLY the documents that actually lost a span — at real
    # duplication rates that is a small fraction of the corpus, so the
    # token-explode/regroup cost tracks duplication, not corpus size;
    # untouched documents pass through with their original text
    touched = excised.select("doc_id").distinct()
    tokens = (
        toks.join(touched, "doc_id", "left_semi")
        .select("doc_id", F.posexplode("t").alias("i0", "tok"))
        .select("doc_id", (F.col("i0") + F.lit(1)).alias("idx"), "tok")
    )
    kept = (
        tokens.join(excised, ["doc_id", "idx"], "left_anti")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("tokens_kept"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("idx", "tok"))
                    ),
                    lambda x: x["tok"],
                ),
                " ",
            ).alias("clean_text"),
        )
    )
    return (
        toks.select(
            "doc_id",
            F.size("t").alias("n_tokens"),
            F.array_join("t", " ").alias("orig_text"),
        )
        .join(touched.withColumn("_touched", F.lit(True)), "doc_id", "left")
        .join(kept, "doc_id", "left")
        .select(
            "doc_id",
            F.when(F.col("_touched").isNull(), F.col("n_tokens"))
            .otherwise(F.coalesce("tokens_kept", F.lit(0)))
            .cast("bigint")
            .alias("tokens_kept"),
            F.when(F.col("_touched").isNull(), F.lit(0))
            .otherwise(
                F.col("n_tokens") - F.coalesce("tokens_kept", F.lit(0))
            )
            .cast("bigint")
            .alias("tokens_removed"),
            F.when(F.col("_touched").isNull(), F.col("orig_text"))
            .otherwise(F.coalesce("clean_text", F.lit("")))
            .alias("clean_text"),
        )
    )
