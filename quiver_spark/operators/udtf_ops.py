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
    d.createOrReplaceTempView("_udtf_docs")
    return spark.sql(
        "SELECT doc_id, t.pos, t.token "
        "FROM _udtf_docs, LATERAL token_explode(text) t"
    )
