"""Training-data pipeline battery #4: chunk-granular exact dedup,
temperature-scaled mixture resampling, int8 scalar-quantized ANN, and the
batch twin of the watermarked stream-stream interval join.

Determinism rules follow the registry contract: hash gates are md5 over row
keys (reproducible across engines/reshards), quantization uses only
correctly-rounded IEEE ops (multiply, add, sqrt, floor) on identical
operands, and similarity scores are exact integer arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window
from pyspark.sql import functions as F

from quiver_spark.functions import int_vec
from quiver_spark.registry import register
from quiver_spark.tables import load

#: words per chunk for chunk-granular exact dedup
CHUNK_WORDS = 16
#: duplicated chunks reported (cnt DESC, hash ASC — hash is a unique
#: tiebreaker, so the LIMIT is deterministic)
CHUNK_TOP = 20

#: temperature for mixture resampling: rate ∝ (min_cnt/cnt)^(1-τ) with
#: τ = 1/2, i.e. sqrt — chosen because sqrt is CORRECTLY ROUNDED in IEEE
#: 754 (unlike pow), so both engines compute bit-identical rates
MIX_TAU_NOTE = 0.5

#: probes / k for the quantized ANN (matches the ann_* family)
SQ8_PROBES = 5
SQ8_TOP_K = 10


@register(
    "dedup_chunk_exact",
    oracle=f"""
WITH w AS (
    SELECT doc_id, string_split(text, ' ') AS words FROM documents
),
c AS (
    SELECT doc_id,
           md5(array_to_string(
               words[(i*{CHUNK_WORDS}+1):(i*{CHUNK_WORDS}+{CHUNK_WORDS})],
               ' ')) AS chunk_hash
    FROM w, LATERAL (
        SELECT unnest(generate_series(
            0, CAST(len(words)//{CHUNK_WORDS} AS INTEGER) - 1)) AS i
    ) t
)
SELECT chunk_hash,
       COUNT(*) AS n_occurrences,
       COUNT(DISTINCT doc_id) AS n_docs
FROM c
GROUP BY chunk_hash
HAVING COUNT(*) > 1
ORDER BY n_occurrences DESC, chunk_hash
LIMIT {CHUNK_TOP}
""",
    tags=("dedup", "chunk", "pipeline"),
)
def dedup_chunk_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk-granular exact dedup (the SlimPajama/RefinedWeb substring-dedup
    step at fixed granularity): every document is cut into consecutive
    {CHUNK_WORDS}-word chunks (partial tail dropped), each chunk keyed by
    md5, and chunks occurring more than once are surfaced — the candidates
    an exact-substring deduper would cut from all-but-one document.

    Scale: chunking is a pure map (explode is map-side one-to-many), the
    only shuffle is the groupBy on the uniform md5 key, and the top-k is
    TakeOrderedAndProject — no skew, no driver loops. At 100 TB this is one
    pass over the corpus with a combiner-friendly count aggregate."""
    d = load(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    n_chunks = (F.size(words) / CHUNK_WORDS).cast("int")
    chunks = (
        d.select(
            "doc_id",
            words.alias("words"),
            n_chunks.alias("n_chunks"),
        )
        .filter(F.col("n_chunks") >= 1)
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.col("n_chunks") - 1),
                    lambda i: F.md5(
                        F.concat_ws(
                            " ",
                            F.slice(
                                F.col("words"),
                                i * CHUNK_WORDS + 1,
                                CHUNK_WORDS,
                            ),
                        )
                    ),
                )
            ).alias("chunk_hash"),
        )
    )
    return (
        chunks.groupBy("chunk_hash")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
        .filter(F.col("n_occurrences") > 1)
        .orderBy(F.desc("n_occurrences"), F.asc("chunk_hash"))
        .limit(CHUNK_TOP)
    )


@register(
    "sample_temperature_mix",
    oracle="""
WITH counts AS (
    SELECT lang, COUNT(*) AS cnt FROM documents GROUP BY lang
),
rates AS (
    SELECT lang, cnt,
           CAST(FLOOR(1000.0 * SQRT(
               CAST(MIN(cnt) OVER () AS DOUBLE) / CAST(cnt AS DOUBLE)
           )) AS BIGINT) AS rate_permille
    FROM counts
),
gated AS (
    SELECT d.lang, r.cnt, r.rate_permille,
           CAST(CONCAT('0x', SUBSTR(md5(CAST(d.doc_id AS VARCHAR)), 1, 8))
                AS BIGINT) % 1000 AS gate
    FROM documents d JOIN rates r ON d.lang = r.lang
)
SELECT lang,
       CAST(MAX(cnt) AS BIGINT) AS total_docs,
       CAST(MAX(rate_permille) AS BIGINT) AS rate_permille,
       CAST(SUM(CASE WHEN gate < rate_permille THEN 1 ELSE 0 END) AS BIGINT)
           AS sampled_docs
FROM gated
GROUP BY lang
""",
    tags=("sampling", "mixture", "pipeline"),
)
def sample_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled mixture resampling (the UNIMAX-style source
    rebalancing step): per-language keep rates ∝ (min_cnt/cnt)^(1-τ) with
    τ = 1/2 flatten the language distribution toward the smallest slice
    without a hand-written rate table; each document then passes the same
    deterministic md5(doc_id) gate as sample_stratified_docs.

    τ = 1/2 makes the exponent a SQRT, which IEEE 754 rounds correctly —
    so Spark and the oracle compute bit-identical rates (pow() would not
    guarantee that across libms).

    Scale: pass 1 is a combiner-friendly count per language (tiny result),
    broadcast back; pass 2 is a map-side gate + one aggregation. The corpus
    itself never shuffles — the same posture as the stratified sampler."""
    d = load(spark, sf_dir, "documents")
    counts = d.groupBy("lang").agg(F.count(F.lit(1)).alias("cnt"))
    rates = counts.withColumn(
        "rate_permille",
        F.floor(
            1000.0
            * F.sqrt(
                F.min("cnt").over(Window.partitionBy(F.lit(1))).cast("double")
                / F.col("cnt").cast("double")
            )
        ).cast("bigint"),
    )
    gate = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("bigint")
        % 1000
    )
    gated = d.join(F.broadcast(rates), "lang").select(
        "lang", "cnt", "rate_permille", gate.alias("gate")
    )
    return gated.groupBy("lang").agg(
        F.max("cnt").cast("bigint").alias("total_docs"),
        F.max("rate_permille").cast("bigint").alias("rate_permille"),
        F.sum(F.when(F.col("gate") < F.col("rate_permille"), 1).otherwise(0))
        .cast("bigint")
        .alias("sampled_docs"),
    )


#: DuckDB: int8 codes per (vec_id, subscript) — floor(clip(x)*127 + 0.5)
#: is round-half-up in exact IEEE steps (multiply, add, floor)
_SQL_CODES = """
SELECT vec_id, generate_subscripts(embedding, 1) AS i,
       CAST(FLOOR(LEAST(GREATEST(CAST(unnest(embedding) AS DOUBLE), -1.0),
                        1.0) * 127 + 0.5) AS BIGINT) AS ci
FROM embeddings
"""

_SQL_PROBES = f"""
SELECT vec_id AS qid, generate_subscripts(embedding, 1) AS i,
       CAST(ROUND(CAST(unnest(embedding) AS DOUBLE) * 1000000) AS BIGINT) AS qi
FROM embeddings WHERE vec_id < {SQ8_PROBES}
"""


@register(
    "ann_sq8_topk",
    oracle=f"""
WITH codes AS ({_SQL_CODES}),
q AS ({_SQL_PROBES}),
dots AS (
    SELECT q.qid, c.vec_id, SUM(c.ci * q.qi) AS idot
    FROM codes c JOIN q ON c.i = q.i AND c.vec_id <> q.qid
    GROUP BY q.qid, c.vec_id
),
ranked AS (
    SELECT qid, vec_id, CAST(idot AS DOUBLE) AS adc_dot,
           ROW_NUMBER() OVER (PARTITION BY qid ORDER BY idot DESC, vec_id)
               AS rnk
    FROM dots
)
SELECT qid, vec_id, adc_dot, rnk FROM ranked WHERE rnk <= {SQ8_TOP_K}
""",
    tags=("similarity", "ann", "quantization"),
)
def ann_sq8_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-quantized (int8) ANN with asymmetric distance computation:
    the corpus is stored as one signed byte per dimension (8× smaller than
    float64 — the difference between an in-memory and a spilled index at
    100 TB of embeddings), probes stay full precision, and candidates are
    ranked by the exact integer ADC dot product code·probe. The int8 code
    is floor(clip(x, -1, 1)·127 + 0.5) — round-half-up composed from
    correctly-rounded IEEE ops, bit-identical across engines.

    Scale: codes are a pure map over the corpus; probes broadcast; ranking
    is a per-probe window over the bounded candidate set. The quantized
    corpus is the artifact a production pipeline would persist (codes +
    per-block scale) and scan instead of raw floats."""
    e = load(spark, sf_dir, "embeddings")
    codes = e.select(
        "vec_id",
        F.expr(
            "transform(embedding, x -> CAST(FLOOR("
            "LEAST(GREATEST(CAST(x AS DOUBLE), -1.0D), 1.0D) * 127 + 0.5"
            ") AS BIGINT))"
        ).alias("code"),
    )
    q = e.filter(F.col("vec_id") < SQ8_PROBES).select(
        F.col("vec_id").alias("qid"), int_vec("embedding").alias("qv")
    )
    pairs = codes.join(F.broadcast(q), F.col("vec_id") != F.col("qid"))
    scored = pairs.select(
        "qid",
        "vec_id",
        F.expr(
            "aggregate(zip_with(code, qv, (x, y) -> x * y), "
            "CAST(0 AS BIGINT), (acc, v) -> acc + v)"
        ).alias("idot"),
    )
    w = Window.partitionBy("qid").orderBy(F.desc("idot"), F.asc("vec_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= SQ8_TOP_K)
        .select(
            "qid",
            "vec_id",
            F.col("idot").cast("double").alias("adc_dot"),
            "rnk",
        )
    )


@register(
    "events_interval_join",
    oracle="""
SELECT strftime(date_trunc('hour', v.ts), '%Y-%m-%d %H:%M:%S') AS view_hour,
       COUNT(*) AS n_pairs,
       COUNT(DISTINCT v.user_id) AS n_users,
       CAST(SUM(epoch_us(p.ts) - epoch_us(v.ts)) AS BIGINT) AS sum_lag_us
FROM events v
JOIN events p
  ON v.user_id = p.user_id
 AND v.event_type = 'view'
 AND p.event_type = 'purchase'
 AND p.ts >= v.ts
 AND p.ts <= v.ts + INTERVAL 1 HOUR
GROUP BY 1
""",
    tags=("events", "join", "interval", "streaming-twin"),
)
def events_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the watermarked stream-stream interval join
    (quiver_spark.streaming.events.view_purchase_join): every view event
    joined to the same user's purchase events within the following hour —
    the attribution/conversion join — rolled up per view-hour so the
    oracle output stays bounded.

    Scale: the join keys on user_id (uniform), the time bound keeps state
    per key small, and in the streaming form the watermark bounds retained
    state to the join horizon — Spark drops buffered rows older than
    watermark − interval on both sides."""
    ev = load(spark, sf_dir, "events")
    v = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"), F.col("ts").alias("v_ts")
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts")
    )
    pairs = v.join(
        p,
        (F.col("v_user") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("v_ts"))
        & (F.col("p_ts") <= F.col("v_ts") + F.expr("INTERVAL 1 HOUR")),
    )
    return (
        pairs.groupBy(
            F.date_format(F.date_trunc("hour", F.col("v_ts")), "yyyy-MM-dd HH:mm:ss").alias(
                "view_hour"
            )
        )
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.countDistinct("v_user").alias("n_users"),
            # whole-microsecond integer lag, computed on the naive
            # timestamps directly (timestampdiff on NTZ is calendar
            # arithmetic — no session-timezone/DST dependence; and unlike
            # unix_timestamp it does not truncate sub-second components)
            F.sum(F.expr("timestampdiff(MICROSECOND, v_ts, p_ts)"))
            .cast("bigint")
            .alias("sum_lag_us"),
        )
    )


#: corpus-summary pipeline constants
QUALITY_MIN_TOKENS = 20
QUALITY_MAX_CHARS = 2000
SUMMARY_SAMPLE_PERMILLE = 800


@register(
    "pipeline_corpus_summary",
    oracle=f"""
WITH base AS (
    SELECT doc_id, lang, text,
           (LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1) AS n_tokens,
           (LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1)
               >= {QUALITY_MIN_TOKENS}
           AND LENGTH(text) <= {QUALITY_MAX_CHARS} AS is_q
    FROM documents
),
canon AS (
    SELECT lang, doc_id, n_tokens,
           ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn,
           CAST(CONCAT('0x', SUBSTR(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                AS BIGINT) % 1000 AS gate
    FROM base WHERE is_q
),
q AS (
    SELECT lang,
           COUNT(*) AS docs_quality,
           CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS docs_dedup,
           CAST(SUM(CASE WHEN rn = 1
                         AND gate < {SUMMARY_SAMPLE_PERMILLE}
                    THEN 1 ELSE 0 END) AS BIGINT) AS docs_sampled,
           CAST(SUM(CASE WHEN rn = 1
                         AND gate < {SUMMARY_SAMPLE_PERMILLE}
                    THEN n_tokens ELSE 0 END) AS BIGINT)
               AS tokens_sampled
    FROM canon GROUP BY lang
)
SELECT b.lang,
       COUNT(*) AS docs_in,
       COALESCE(MAX(q.docs_quality), 0) AS docs_quality,
       COALESCE(MAX(q.docs_dedup), 0) AS docs_dedup,
       COALESCE(MAX(q.docs_sampled), 0) AS docs_sampled,
       COALESCE(MAX(q.tokens_sampled), 0) AS tokens_sampled
FROM base b LEFT JOIN q ON b.lang = q.lang
GROUP BY b.lang
""",
    tags=("pipeline", "composite", "dedup", "sampling", "quality"),
)
def pipeline_corpus_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end pretraining-corpus funnel as ONE declarative plan:
    quality gate (token/length bounds) → exact dedup keeping the smallest
    doc_id per md5(text) → deterministic hash-gate sampling → per-language
    accounting of every stage (docs in, surviving quality, surviving
    dedup, sampled, tokens shipped).

    Scale posture: quality flags and gates are map-side; the dedup window
    keys on md5(text) (uniform); the per-stage accounting is one small
    aggregate joined back. At 100 TB the funnel is two shuffles — exactly
    what the equivalent chained-jobs pipeline would pay, but visible to
    Catalyst as one plan (shared scan, pushed projections)."""
    from quiver_spark.operators.text import token_count_col

    d = load(spark, sf_dir, "documents")
    base = d.select(
        "doc_id",
        "lang",
        "text",
        token_count_col().alias("n_tokens"),
        (
            (token_count_col() >= QUALITY_MIN_TOKENS)
            & (F.length("text") <= QUALITY_MAX_CHARS)
        ).alias("is_q"),
    )
    w = Window.partitionBy(F.md5(F.col("text"))).orderBy("doc_id")
    gate = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("bigint")
        % 1000
    )
    canon = (
        base.filter("is_q")
        .withColumn("rn", F.row_number().over(w))
        .withColumn("gate", gate)
    )
    keep = F.col("rn") == 1
    samp = keep & (F.col("gate") < SUMMARY_SAMPLE_PERMILLE)
    q = canon.groupBy("lang").agg(
        F.count(F.lit(1)).alias("docs_quality"),
        F.sum(F.when(keep, 1).otherwise(0)).cast("bigint").alias("docs_dedup"),
        F.sum(F.when(samp, 1).otherwise(0)).cast("bigint").alias("docs_sampled"),
        F.sum(F.when(samp, F.col("n_tokens")).otherwise(0))
        .cast("bigint")
        .alias("tokens_sampled"),
    )
    return (
        base.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("docs_in"))
        .join(q, "lang", "left")
        .select(
            "lang",
            "docs_in",
            F.coalesce("docs_quality", F.lit(0)).alias("docs_quality"),
            F.coalesce("docs_dedup", F.lit(0)).alias("docs_dedup"),
            F.coalesce("docs_sampled", F.lit(0)).alias("docs_sampled"),
            F.coalesce("tokens_sampled", F.lit(0)).alias("tokens_sampled"),
        )
    )


@register(
    "events_latest_per_user",
    oracle="""
SELECT user_id,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS last_ts,
       event_type AS last_type,
       value AS last_value
FROM (
    SELECT *, ROW_NUMBER() OVER (
        PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
    FROM events
) WHERE rn = 1
""",
    tags=("events", "window", "upsert"),
)
def events_latest_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-record-per-key compaction (the upsert/SCD-1 materialization:
    collapse an append-only event log to each key's current state).
    row_number over (user_id, ts DESC, event_id DESC) — the unique
    event_id tiebreak makes the winner deterministic. One shuffle on the
    uniform user_id key; at 100 TB this is the standard log-compaction
    plan (and with a sorted quiver layout the window becomes
    near-streaming)."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("last_ts"),
            F.col("event_type").alias("last_type"),
            F.col("value").alias("last_value"),
        )
    )
