"""Training-data pipeline battery #5: sequence packing and context-window
chunking — the two token-geometry operations between a cleaned corpus and
a training dataloader.

Packing ("concat-then-chunk") decides how documents fill fixed
token-budget training sequences; chunking splits long documents into
overlapping context windows for retrieval/embedding corpora. Both are
deterministic pure-SQL plans: whitespace tokens, md5-derived shard keys,
integer division — bit-identical on Spark and DuckDB.

Scale posture: packing needs a running token offset, which is a GLOBAL
ordered prefix sum — a single-partition bottleneck if taken literally. The
engine therefore packs per md5-derived SHARD (the way real packers pack
per worker/file): one shuffle on a uniform 64-way key, an ordered window
WITHIN each shard, and every shard streams independently. At 100 TB the
shard count is a constant to raise, not a design change. Chunking is a
pure map + explode — no shuffle before the final per-doc aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window
from pyspark.sql import functions as F

from quiver_spark.registry import register
from quiver_spark.tables import load

#: tokens per packed training sequence
PACK_TOKENS = 2048
#: uniform md5-derived shard count for shard-local packing
PACK_SHARDS = 64

#: context-window geometry (tokens per window / stride between starts)
WIN_TOKENS = 64
WIN_STRIDE = 48

#: whitespace tokens, empty strings dropped — the same token definition on
#: both engines (split on single spaces; consecutive spaces yield empties
#: that the filter removes)
_SPARK_TOKENS = "filter(split(text, ' '), x -> x <> '')"
_SQL_TOKENS = "list_filter(string_split(text, ' '), x -> x <> '')"


@register(
    "pipeline_pack_sequences",
    oracle=f"""
WITH toks AS (
    SELECT doc_id,
           CAST(CONCAT('0x', SUBSTR(md5(CAST(doc_id AS VARCHAR)), 1, 4))
                AS BIGINT) % {PACK_SHARDS} AS shard,
           len({_SQL_TOKENS}) AS n_tok
    FROM documents
),
placed AS (
    SELECT shard, n_tok,
           COALESCE(SUM(n_tok) OVER (
               PARTITION BY shard ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
           ), 0) AS cum_prev
    FROM toks
    WHERE n_tok > 0
)
SELECT shard,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
       CAST((SUM(n_tok) - 1) // {PACK_TOKENS} + 1 AS BIGINT) AS n_packs,
       CAST(SUM(CASE WHEN cum_prev // {PACK_TOKENS}
                     <> (cum_prev + n_tok - 1) // {PACK_TOKENS}
                THEN 1 ELSE 0 END) AS BIGINT) AS boundary_docs,
       CAST(MAX((cum_prev + n_tok - 1) // {PACK_TOKENS}
                - cum_prev // {PACK_TOKENS} + 1) AS BIGINT) AS max_span
FROM placed
GROUP BY shard
""",
    tags=("pipeline", "packing", "tokens"),
)
def pipeline_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-packing accounting (concat-then-chunk): documents are laid
    end-to-end in doc_id order within each md5 shard and cut into
    {PACK_TOKENS}-token training sequences. Per shard: docs, tokens, packs
    produced, docs straddling a pack boundary (they get split), and the
    widest span any document covers — the numbers a dataloader needs to
    budget an epoch.

    The running offset is a window ORDER BY doc_id within the shard, so
    the plan has exactly one shuffle (on the uniform shard key) and no
    global ordering anywhere."""
    d = load(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        (
            F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10)
            .cast("bigint")
            % PACK_SHARDS
        ).alias("shard"),
        F.expr(f"size({_SPARK_TOKENS})").cast("bigint").alias("n_tok"),
    ).filter(F.col("n_tok") > 0)
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    placed = toks.select(
        "shard",
        "n_tok",
        F.coalesce(F.sum("n_tok").over(w), F.lit(0)).alias("cum_prev"),
    )
    first_pack = F.expr(f"cum_prev div {PACK_TOKENS}")
    last_pack = F.expr(f"(cum_prev + n_tok - 1) div {PACK_TOKENS}")
    return placed.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").cast("bigint").alias("total_tokens"),
        F.expr(f"(sum(n_tok) - 1) div {PACK_TOKENS} + 1")
        .cast("bigint")
        .alias("n_packs"),
        F.sum(F.when(first_pack != last_pack, 1).otherwise(0))
        .cast("bigint")
        .alias("boundary_docs"),
        F.max(last_pack - first_pack + 1).cast("bigint").alias("max_span"),
    )


@register(
    "text_context_windows",
    oracle=f"""
WITH toks AS (
    SELECT doc_id, {_SQL_TOKENS} AS words, len({_SQL_TOKENS}) AS n_tok
    FROM documents
),
sized AS (
    SELECT doc_id, words, n_tok,
           CASE WHEN n_tok <= {WIN_TOKENS} THEN 1
                ELSE (n_tok - {WIN_TOKENS} + {WIN_STRIDE} - 1)
                     // {WIN_STRIDE} + 1 END AS n_win
    FROM toks WHERE n_tok > 0
),
wins AS (
    SELECT doc_id, n_tok, n_win, i,
           array_to_string(
               words[(i*{WIN_STRIDE}+1):(i*{WIN_STRIDE}+{WIN_TOKENS})],
               ' ') AS chunk
    FROM sized, LATERAL (
        SELECT unnest(generate_series(0, CAST(n_win AS INTEGER) - 1)) AS i
    ) t
)
SELECT doc_id,
       CAST(MAX(n_win) AS BIGINT) AS n_windows,
       CAST(SUM(LEAST({WIN_TOKENS}, n_tok - i*{WIN_STRIDE})) AS BIGINT)
           AS window_tokens,
       SUBSTR(MIN(md5(chunk)), 1, 8) AS min_fp
FROM wins
GROUP BY doc_id
""",
    tags=("text", "chunking", "tokens"),
)
def text_context_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping context-window chunking: each document is split into
    {WIN_TOKENS}-token windows starting every {WIN_STRIDE} tokens (the
    standard retrieval-corpus shape — tail windows overlap so no token is
    orphaned). Emits per-doc window counts, the summed window token mass
    (overlap makes it exceed n_tok), and a min-md5 fingerprint over the
    materialized chunk TEXTS — proving the chunks themselves, not just
    their counts, are identical across engines.

    Pure map + explode: no shuffle until the per-doc aggregate, so the
    operator streams at input bandwidth on any corpus size."""
    d = load(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.expr(_SPARK_TOKENS).alias("words"),
        F.expr(f"size({_SPARK_TOKENS})").cast("bigint").alias("n_tok"),
    ).filter(F.col("n_tok") > 0)
    sized = toks.withColumn(
        "n_win",
        F.when(F.col("n_tok") <= WIN_TOKENS, F.lit(1)).otherwise(
            F.expr(
                f"(n_tok - {WIN_TOKENS} + {WIN_STRIDE} - 1) div {WIN_STRIDE} + 1"
            )
        ),
    )
    wins = sized.select(
        "doc_id",
        "n_tok",
        "n_win",
        "words",
        F.expr("explode(sequence(0, cast(n_win as int) - 1))").alias("i"),
    ).select(
        "doc_id",
        "n_tok",
        "n_win",
        "i",
        F.expr(
            f"array_join(slice(words, i*{WIN_STRIDE}+1, {WIN_TOKENS}), ' ')"
        ).alias("chunk"),
    )
    return wins.groupBy("doc_id").agg(
        F.max("n_win").cast("bigint").alias("n_windows"),
        F.sum(
            F.least(F.lit(WIN_TOKENS), F.col("n_tok") - F.col("i") * WIN_STRIDE)
        )
        .cast("bigint")
        .alias("window_tokens"),
        F.substring(F.min(F.md5("chunk")), 1, 8).alias("min_fp"),
    )
