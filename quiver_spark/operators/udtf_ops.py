"""Python UDTF surface (SURVEY §2.3 UDF/UDAF/UDTF row — Spark 4 user-defined
table functions, the row-generating extension point).

UDTFs are the slow path (row-at-a-time Python); the registered query bounds
the input (doc_id < 50) so the extension point is exercised without putting
a Python loop on the hot path — the same work at corpus scale would use the
built-in posexplode (see text_token_topk)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import udtf

from quiver_spark.registry import register
from quiver_spark.tables import load

UDTF_DOC_LIMIT = 50


@udtf(returnType="pos: int, token: string")
class TokenExplode:
    """Yield (position, token) for each whitespace token of the input."""

    def eval(self, text: str):  # noqa: D102
        if text is None:
            return
        for i, tok in enumerate(text.split(" ")):
            yield i, tok


@register(
    "udtf_token_explode",
    oracle=f"""
SELECT doc_id, CAST(i - 1 AS INTEGER) AS pos, tok AS token
FROM (
    SELECT doc_id,
           unnest(string_split(text, ' ')) AS tok,
           generate_subscripts(string_split(text, ' '), 1) AS i
    FROM documents WHERE doc_id < {UDTF_DOC_LIMIT}
)
""",
    tags=("udtf", "text"),
)
def udtf_token_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lateral-join a Python UDTF against the documents table."""
    spark.udtf.register("token_explode", TokenExplode)
    d = load(spark, sf_dir, "documents").filter(
        F.col("doc_id") < UDTF_DOC_LIMIT
    )
    # the input binds as a DataFrame argument ({src}), not a named temp
    # view: fixed view names are session-global, so concurrent callers in
    # one SparkSession could race between view replacement and analysis
    return spark.sql(
        "SELECT doc_id, t.pos, t.token "
        "FROM {src}, LATERAL token_explode(text) t",
        src=d,
    )


@register(
    "grouped_minmax_norm",
    oracle="""
SELECT doc_id, lang, n_chars,
       CAST(CASE WHEN mx = mn THEN 0
                 ELSE ((n_chars - mn) * 10000) // (mx - mn) END AS BIGINT)
           AS norm_10k
FROM (
    SELECT doc_id, lang, n_chars,
           MIN(n_chars) OVER (PARTITION BY lang) AS mn,
           MAX(n_chars) OVER (PARTITION BY lang) AS mx
    FROM documents
)
""",
    tags=("udf", "applyInPandas", "grouped-map"),
)
def grouped_minmax_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map applyInPandas (the Arrow UDAF-style shape): per-language
    min-max normalization of document length onto an integer 0..10000
    scale. The group statistic and the normalization happen in one pandas
    function per group — pure integer arithmetic, so the window-function
    oracle reproduces it exactly. One shuffle on the group key; each group
    must fit one executor's memory, which is the documented applyInPandas
    contract (bounded here: languages are a small domain, and a skewed
    group would move this to the window-function form the oracle uses)."""
    import pandas as pd

    def _norm(pdf: pd.DataFrame) -> pd.DataFrame:
        mn, mx = int(pdf["n_chars"].min()), int(pdf["n_chars"].max())
        span = mx - mn
        norm = (
            ((pdf["n_chars"].astype("int64") - mn) * 10000) // span
            if span
            else pd.Series(0, index=pdf.index, dtype="int64")
        )
        return pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].astype("int64"),
                "lang": pdf["lang"],
                "n_chars": pdf["n_chars"].astype("int64"),
                "norm_10k": norm.astype("int64"),
            }
        )

    d = load(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    return d.groupBy("lang").applyInPandas(
        _norm,
        schema="doc_id: bigint, lang: string, n_chars: bigint, norm_10k: bigint",
    )
