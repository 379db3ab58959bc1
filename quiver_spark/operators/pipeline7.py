"""Corpus-analysis battery #7: PII detection/redaction — the scrub pass
every pretraining-data pipeline runs before mixing (emails, phone
numbers, IP addresses → typed placeholders, with per-source audit
counts and a residual-leak check).

The synthetic corpus carries no organic PII by construction, so the
fixture deterministically plants reproducible synthetic PII derived from
``doc_id`` IDENTICALLY on both engines (Spark and the DuckDB oracle);
the operator under test is the engine-side detection + redaction
pipeline itself — JVM regexp primitives, map-side, one final aggregate.

The reference (a columnar format library) has no text surface; this is
a driver-mandated LLM-pipeline extension in the same mold as
operators/text.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from quiver_spark.registry import register
from quiver_spark.tables import load, spread

#: detection patterns — deliberately simple, portable regex (Java regex
#: on the Spark side, RE2 in the DuckDB oracle): word-ish email, a
#: NANP-style 555 phone, dotted-quad IPv4
EMAIL_RE = "[a-z0-9]+@[a-z0-9]+\\.[a-z]+"
PHONE_RE = "\\b555-[0-9]{4}\\b"
IP_RE = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"


@register(
    "text_pii_scrub",
    oracle=f"""
WITH enriched AS (
    SELECT doc_id, source,
           text
           || CASE WHEN doc_id % 3 = 0
                   THEN ' contact user' || doc_id::VARCHAR
                        || '@mail' || (doc_id % 7)::VARCHAR || '.com'
                   ELSE '' END
           || CASE WHEN doc_id % 4 = 0
                   THEN ' call 555-' || lpad((doc_id % 10000)::VARCHAR,
                                             4, '0')
                   ELSE '' END
           || CASE WHEN doc_id % 5 = 0
                   THEN ' from 10.' || (doc_id % 256)::VARCHAR || '.0.1'
                   ELSE '' END AS text
    FROM documents
),
scrubbed AS (
    SELECT doc_id, source,
           len(regexp_extract_all(text, '{EMAIL_RE}')) AS emails,
           len(regexp_extract_all(text, '{PHONE_RE}')) AS phones,
           len(regexp_extract_all(text, '{IP_RE}')) AS ips,
           regexp_replace(
               regexp_replace(
                   regexp_replace(text, '{EMAIL_RE}', '<EMAIL>', 'g'),
                   '{PHONE_RE}', '<PHONE>', 'g'),
               '{IP_RE}', '<IP>', 'g') AS redacted
    FROM enriched
)
SELECT source,
       COUNT(*) AS docs,
       CAST(SUM(CASE WHEN emails + phones + ips > 0 THEN 1 ELSE 0 END)
            AS BIGINT) AS docs_with_pii,
       CAST(SUM(emails) AS BIGINT) AS emails,
       CAST(SUM(phones) AS BIGINT) AS phones,
       CAST(SUM(ips) AS BIGINT) AS ips,
       CAST(SUM(len(regexp_extract_all(redacted, '{EMAIL_RE}'))
                + len(regexp_extract_all(redacted, '{PHONE_RE}'))
                + len(regexp_extract_all(redacted, '{IP_RE}')))
            AS BIGINT) AS residual,
       MIN(md5(redacted)) AS min_fp,
       MAX(md5(redacted)) AS max_fp
FROM scrubbed
GROUP BY source
""",
    tags=("text", "pii", "redaction", "regexp"),
)
def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub audit per source: detect emails / 555-phones / IPv4s,
    redact them to typed placeholders, and report counts plus a
    residual-leak check (re-running detection on the redacted text MUST
    find zero — the column the oracle would expose if redaction and
    detection ever disagreed) and md5 fingerprints of the redacted
    texts (an engine redacting differently hash-fails).

    Plan shape: the whole scrub is map-side JVM regexp (regexp_count /
    regexp_replace — no UDF, no Python), one (source) aggregate shuffle.
    At 100 TB: the scan streams once; cost is O(corpus) regex over
    Arrow-backed strings with a 20-group final agg."""
    # round 17: spread the single-split gate-SF scan across cores before
    # the per-doc JVM regex battery (guide §2.5); int sums + min/max md5
    # strings — partition-invariant
    d = spread(load(spark, sf_dir, "documents"), spark, sf_dir, "documents")
    enriched = F.concat(
        F.col("text"),
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(
                F.lit(" contact user"),
                F.col("doc_id").cast("string"),
                F.lit("@mail"),
                (F.col("doc_id") % 7).cast("string"),
                F.lit(".com"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 4 == 0,
            F.concat(
                F.lit(" call 555-"),
                F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 5 == 0,
            F.concat(
                F.lit(" from 10."),
                (F.col("doc_id") % 256).cast("string"),
                F.lit(".0.1"),
            ),
        ).otherwise(F.lit("")),
    )
    t = F.col("t")
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(t, EMAIL_RE, "<EMAIL>"),
            PHONE_RE,
            "<PHONE>",
        ),
        IP_RE,
        "<IP>",
    )
    s = (
        d.withColumn("t", enriched)
        .select(
            "source",
            F.regexp_count(t, F.lit(EMAIL_RE)).alias("emails"),
            F.regexp_count(t, F.lit(PHONE_RE)).alias("phones"),
            F.regexp_count(t, F.lit(IP_RE)).alias("ips"),
            F.md5(redacted).alias("fp"),
            (
                F.regexp_count(redacted, F.lit(EMAIL_RE))
                + F.regexp_count(redacted, F.lit(PHONE_RE))
                + F.regexp_count(redacted, F.lit(IP_RE))
            ).alias("res"),
        )
    )
    return s.groupBy("source").agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum(
            F.when(
                F.col("emails") + F.col("phones") + F.col("ips") > 0, 1
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("docs_with_pii"),
        F.sum("emails").cast("bigint").alias("emails"),
        F.sum("phones").cast("bigint").alias("phones"),
        F.sum("ips").cast("bigint").alias("ips"),
        F.sum("res").cast("bigint").alias("residual"),
        F.min("fp").alias("min_fp"),
        F.max("fp").alias("max_fp"),
    )


def _codes_lens(arr):
    """Arrow string column → (codes, lens): the concatenated per-row
    code-point sequence (int64) and each row's code-point count. ASCII
    batches decode zero-copy off the UTF-8 data buffer; any multi-byte
    row falls back to an exact per-row UTF-32 decode (code points, not
    UTF-16 units — matching UTF8String's char semantics). Nulls are a
    contract violation upstream (documents.text is non-null)."""
    import numpy as np
    import pyarrow as pa

    if arr.null_count:
        raise ValueError("null text in char-LM input")
    odt = np.int64 if pa.types.is_large_string(arr.type) else np.int32
    off = np.frombuffer(arr.buffers()[1], dtype=odt)[
        arr.offset : arr.offset + len(arr) + 1
    ].astype(np.int64)
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
    seg = data[off[0] : off[-1]]
    if not (seg & 0x80).any():
        return seg.astype(np.int64), np.diff(off)
    texts = arr.to_pylist()
    codes = [
        np.frombuffer(t.encode("utf-32-le"), dtype=np.uint32) for t in texts
    ]
    lens = np.array([len(c) for c in codes], dtype=np.int64)
    return (
        np.concatenate(codes).astype(np.int64)
        if codes
        else np.empty(0, dtype=np.int64)
    ), lens


def _bigram_keys(codes, lens):
    """Within-row consecutive code-point pairs, packed c1·2²¹ + c2 (code
    points < 2²¹). Pairs never cross row boundaries; rows are ≥ 2 code
    points by the caller's filter, so every row yields len−1 pairs in
    position order."""
    import numpy as np

    if codes.size == 0:
        return np.empty(0, dtype=np.int64)
    keys = (codes[:-1] << 21) | codes[1:]
    mask = np.ones(codes.size - 1, dtype=bool)
    ends = np.cumsum(lens)[:-1]  # first index of each later row
    mask[ends - 1] = False  # last char of a row starts no pair
    return keys[mask]


#: document-level blocklist — the C4-style "bad words" gate; fixed
#: deterministic terms drawn from the synthetic corpus vocabulary
BLOCK_TERMS = ("slow", "dup", "leak")


@register(
    "text_blocklist_filter",
    oracle=f"""
WITH tok AS (
    SELECT doc_id, source,
           list_filter(string_split(text, ' '), t -> t <> '') AS a
    FROM documents
),
hits AS (
    SELECT doc_id, source, len(a) AS toks,
           len(list_filter(a,
               t -> list_contains({list(BLOCK_TERMS)!r}, t))) AS hits
    FROM tok
)
SELECT source,
       COUNT(*) AS docs,
       CAST(SUM(CASE WHEN hits > 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS blocked_docs,
       CAST(SUM(hits) AS BIGINT) AS term_hits,
       CAST(SUM(CASE WHEN hits = 0 THEN toks ELSE 0 END) AS BIGINT)
           AS kept_tokens
FROM hits
GROUP BY source
""",
    tags=("text", "filter", "blocklist"),
)
def text_blocklist_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document-level blocklist filtering (the C4 "bad words" gate) with
    the per-source audit a mixture pipeline needs: how many documents
    each source loses to the gate and how much token mass survives.

    Plan shape: tokenization + blocklist matching are pure map-side JVM
    array ops (``filter`` over the token array against a literal array —
    no explode, no UDF, no shuffle before the per-source aggregate). At
    100 TB the corpus streams once; the blocklist is a Catalyst literal,
    broadcast-free by construction."""
    d = load(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.col("text"), " "), lambda t: t != "")
    block = F.array(*[F.lit(t) for t in BLOCK_TERMS])
    hits = F.size(
        F.filter(toks, lambda t: F.array_contains(block, t))
    )
    h = d.select(
        "source",
        F.size(toks).alias("toks"),
        hits.alias("hits"),
    )
    return h.groupBy("source").agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum(F.when(F.col("hits") > 0, 1).otherwise(0))
        .cast("bigint")
        .alias("blocked_docs"),
        F.sum("hits").cast("bigint").alias("term_hits"),
        F.sum(F.when(F.col("hits") == 0, F.col("toks")).otherwise(0))
        .cast("bigint")
        .alias("kept_tokens"),
    )


@register(
    "text_char_lm_score",
    oracle=r"""
WITH norm AS (
    SELECT doc_id, source,
           lower(regexp_replace(text, '\s+', ' ', 'g')) AS t
    FROM documents
),
bg AS (
    SELECT doc_id, source, substr(t, i, 2) AS bg, substr(t, i, 1) AS c1
    FROM norm, UNNEST(generate_series(1, length(t) - 1)) AS u(i)
    WHERE length(t) >= 2
),
model AS (SELECT bg, COUNT(*) AS cnt FROM bg GROUP BY bg),
pref AS (SELECT c1, COUNT(*) AS cnt1 FROM bg GROUP BY c1),
v AS (SELECT COUNT(DISTINCT c1) AS v FROM bg),
scored AS (
    SELECT b.doc_id, b.source,
           AVG(-log2((m.cnt + 1.0) / (p.cnt1 + v.v))) AS bits
    FROM bg b
    JOIN model m USING (bg)
    JOIN pref p USING (c1)
    CROSS JOIN v
    GROUP BY b.doc_id, b.source
)
SELECT source,
       COUNT(*) AS docs,
       ROUND(AVG(bits), 3) AS avg_bits_per_char,
       ROUND(MAX(bits), 3) AS max_bits_per_char
FROM scored
GROUP BY source
""",
    tags=("text", "quality", "lm", "pipeline"),
)
def text_char_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style LM quality scoring, self-trained: a character-bigram
    model is fitted over the WHOLE corpus in one aggregate, then every
    document is scored as its average surprisal (bits per character,
    add-one smoothing) under that model — the standard language-model
    filter for pretraining data (high bits = gibberish/boilerplate
    outliers, low = fluent text), here with the corpus as its own model
    so no external LM is needed.

    100 TB posture (round-16 shape, guide §4.2): BOTH corpus passes are
    vectorized MapInArrow nodes — the model-fit pass emits ≤ alphabet²
    per-batch partial counts (the only data-scale shuffle is that
    constant-bounded aggregate), the model (alphabet² ints — metadata
    scale) is driver-folded into a surprisal lookup table and shipped
    back by broadcast variable, and the scoring pass emits one (doc,
    bits) row per document straight into the per-source aggregate. No
    per-bigram row explosion, no joins. Before round 16 each pass
    exploded every char bigram into a row (O(total_chars) rows through
    two Generates + three broadcast joins — measured 3.3 s at sf0.1 for
    1.5M chars). Counts are exact integers either way; the only float
    steps (divide, log2, avg) happen once per bigram TYPE / per doc, and
    scores round to 3 decimals so float summation orders cannot smear
    the hash."""
    from quiver_spark.tables import load

    import numpy as np
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    # round 17: spread the single-split gate-SF scan across cores before
    # the Python passes (guide §2.5); the bincount partials are exact
    # integers and the scores are per-doc — both partition-invariant
    d = spread(
        load(spark, sf_dir, "documents")
        .select(
            "doc_id",
            "source",
            F.lower(F.regexp_replace("text", r"\s+", " ")).alias("t"),
        )
        .filter(F.length("t") >= 2),
        spark,
        sf_dir,
        "documents",
    )

    # --- pass 1: bigram model (per-batch numpy bincount partials) ---
    def count_fn(batches):
        import numpy as np
        import pyarrow as pa

        for batch in batches:
            n = batch.num_rows
            if n == 0:
                continue
            codes, lens = _codes_lens(batch.column(0))
            keys = _bigram_keys(codes, lens)
            uk, cnt = np.unique(keys, return_counts=True)
            yield pa.RecordBatch.from_arrays(
                [pa.array(uk), pa.array(cnt.astype(np.int64))],
                names=["bgk", "cnt"],
            )

    model_rows = (
        d.select("t")
        .mapInArrow(
            count_fn,
            StructType(
                [
                    StructField("bgk", LongType(), False),
                    StructField("cnt", LongType(), False),
                ]
            ),
        )
        .groupBy("bgk")
        .agg(F.sum("cnt").alias("cnt"))
        .collect()
    )
    # driver fold (alphabet² ints): first-char histogram + vocab size +
    # per-bigram surprisal — same formula, same exact int operands as the
    # broadcast-join expression this replaces
    mkeys = np.array(sorted(r["bgk"] for r in model_rows), dtype=np.int64)
    mcnt = np.empty(len(mkeys), dtype=np.int64)
    cnt_of = {r["bgk"]: int(r["cnt"]) for r in model_rows}
    for i, k in enumerate(mkeys):
        mcnt[i] = cnt_of[int(k)]
    c1s = mkeys >> 21
    pref: dict[int, int] = {}
    for c1, cn in zip(c1s.tolist(), mcnt.tolist()):
        pref[c1] = pref.get(c1, 0) + cn
    v = len(pref)
    cnt1 = np.array([pref[int(c)] for c in c1s], dtype=np.int64)
    mbits = -np.log2((mcnt + 1.0) / (cnt1 + float(v)))
    bc = spark.sparkContext.broadcast((mkeys, mbits))

    # --- pass 2: per-doc average surprisal ---
    out_schema = StructType(
        [
            StructField("doc_id", LongType(), False),
            StructField("source", StringType(), False),
            StructField("bits", DoubleType(), False),
        ]
    )

    def score_fn(batches):
        import numpy as np
        import pyarrow as pa

        mk, mb = bc.value
        for batch in batches:
            n = batch.num_rows
            if n == 0:
                continue
            codes, lens = _codes_lens(batch.column(2))
            keys = _bigram_keys(codes, lens)
            idx = np.searchsorted(mk, keys)
            if keys.size:
                # clip BEFORE indexing (ADVICE r16): a key above the
                # largest model key returns idx == len(mk), and mk[idx]
                # would IndexError before the intended guard fired; the
                # clipped compare still catches it (key > mk[-1] ≠ key)
                if mk.size == 0:
                    raise ValueError("bigram missing from model")
                idx = np.minimum(idx, mk.size - 1)
                if not (mk[idx] == keys).all():
                    # every corpus bigram is in the corpus-trained model
                    raise ValueError("bigram missing from model")
            bits = mb[idx]
            npairs = lens - 1
            starts = np.zeros(len(npairs), dtype=np.int64)
            np.cumsum(npairs[:-1], out=starts[1:])
            sums = np.add.reduceat(bits, starts) if keys.size else starts
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column(0),
                    batch.column(1),
                    pa.array(sums / npairs),
                ],
                names=["doc_id", "source", "bits"],
            )

    scored = d.mapInArrow(score_fn, out_schema)
    return scored.groupBy("source").agg(
        F.count(F.lit(1)).alias("docs"),
        F.round(F.avg("bits"), 3).alias("avg_bits_per_char"),
        F.round(F.max("bits"), 3).alias("max_bits_per_char"),
    )


@register(
    "text_zipf_slope",
    oracle="""
WITH tok AS (
    SELECT source, unnest(string_split(lower(text), ' ')) AS token
    FROM documents
),
counts AS (
    SELECT source, token, COUNT(*) AS cnt
    FROM tok WHERE token <> ''
    GROUP BY source, token
),
ranked AS (
    SELECT source, cnt,
           ROW_NUMBER() OVER (
               PARTITION BY source ORDER BY cnt DESC, token
           ) AS rnk
    FROM counts
),
head AS (
    SELECT source, ln(CAST(rnk AS DOUBLE)) AS x, ln(CAST(cnt AS DOUBLE)) AS y
    FROM ranked WHERE rnk <= 200
),
fit AS (
    SELECT source,
           COUNT(*) AS n,
           SUM(x) AS sx, SUM(y) AS sy, SUM(x * y) AS sxy, SUM(x * x) AS sxx
    FROM head GROUP BY source
),
vocab AS (
    SELECT source, COUNT(*) AS vocab, CAST(MAX(cnt) AS BIGINT) AS top_cnt
    FROM counts GROUP BY source
)
SELECT f.source,
       CAST(v.vocab AS BIGINT) AS vocab,
       v.top_cnt,
       ROUND((f.n * f.sxy - f.sx * f.sy) / (f.n * f.sxx - f.sx * f.sx), 3)
           AS zipf_slope
FROM fit f JOIN vocab v ON f.source = v.source
""",
    tags=("text", "analysis", "zipf", "pipeline"),
)
def text_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source Zipf-exponent fit — the standard power-law diagnostic for
    corpus quality (natural text fits log(freq) ≈ a + s·log(rank) with
    s ≈ −1; boilerplate/templated/spam slices bend the head of the
    curve): least-squares slope over the top-200 ranks of each source's
    token frequency distribution, plus vocabulary size and the top token
    count.

    100 TB posture: the explode is map-side and only (source, token)
    partial counts shuffle — word-count shape; the rank window partitions
    BY SOURCE (parallel across sources, and only the 200-row heads feed
    the regression); the slope is computed from the five classical
    sufficient statistics (n, Σx, Σy, Σxy, Σx²) with the same explicit
    formula on both engines so no engine-specific regression kernel can
    smear the hash (rounded to 3 decimals for float-order stability)."""
    from pyspark.sql import Window

    d = load(spark, sf_dir, "documents")
    counts = (
        d.select(
            "source",
            F.explode(F.split(F.lower("text"), " ")).alias("token"),
        )
        .filter(F.col("token") != "")
        .groupBy("source", "token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.partitionBy("source").orderBy(F.desc("cnt"), "token")
    ranked = counts.withColumn("rnk", F.row_number().over(w))
    head = ranked.filter(F.col("rnk") <= 200).select(
        "source",
        F.log(F.col("rnk").cast("double")).alias("x"),
        F.log(F.col("cnt").cast("double")).alias("y"),
    )
    fit = head.groupBy("source").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    vocab = counts.groupBy("source").agg(
        F.count(F.lit(1)).alias("vocab"),
        F.max("cnt").cast("bigint").alias("top_cnt"),
    )
    slope = (
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
        / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
    )
    return fit.join(vocab, "source").select(
        "source",
        F.col("vocab").cast("bigint").alias("vocab"),
        "top_cnt",
        F.round(slope, 3).alias("zipf_slope"),
    )


#: target pretraining-mixture weights per language (integer weights keep
#: the feasibility arithmetic exact: K = min(tokens DIV w) is a bigint,
#: sampled tokens = K*w exactly matches the w ratios)
MIX_WEIGHTS: tuple[tuple[str, int], ...] = (
    ("en", 4),
    ("fr", 2),
    ("de", 2),
    ("es", 1),
    ("zh", 1),
)


@register(
    "pipeline_mixture_weights",
    oracle=f"""
WITH w(lang, w) AS (VALUES ('en', 4), ('fr', 2), ('de', 2), ('es', 1), ('zh', 1)),
toks AS (
    SELECT lang,
           COUNT(*) AS docs,
           CAST(SUM(LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1)
                AS BIGINT) AS tokens
    FROM documents
    GROUP BY lang
),
j AS (SELECT t.lang, t.docs, t.tokens, w.w FROM toks t JOIN w ON t.lang = w.lang),
k AS (SELECT MIN(tokens // w) AS k FROM j)
SELECT j.lang,
       j.docs,
       j.tokens,
       CAST(j.w AS BIGINT) AS w,
       CAST(k.k * j.w AS BIGINT) AS sampled_tokens,
       ROUND(CAST(k.k * j.w AS DOUBLE) / j.tokens, 4) AS accept_rate
FROM j CROSS JOIN k
""",
    tags=("pipeline", "sampling", "mixture"),
)
def pipeline_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture planning for a pretraining run: given integer target
    weights per language, compute each language's acceptance rate for the
    LARGEST corpus achievable at exactly that mix WITHOUT upsampling —
    the binding language (smallest tokens/weight) samples at 1.0 and
    everything else downsamples proportionally. The feasibility constant
    K = min(tokens DIV w) and the sampled token budgets K*w are exact
    bigint arithmetic on both engines; only the reported rate rounds.

    100 TB posture: one token-count aggregate over the corpus (map-side
    length arithmetic, no tokenizer UDF), a ≤|langs|-row broadcast join
    with the weight table, and a 1-row broadcast of K back across it —
    the corpus is scanned once and never shuffled by anything wider than
    the language key."""
    from quiver_spark.operators.text import token_count_col

    d = load(spark, sf_dir, "documents")
    toks = d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum(token_count_col()).cast("bigint").alias("tokens"),
    )
    w = spark.createDataFrame(list(MIX_WEIGHTS), "lang string, w int")
    j = toks.join(F.broadcast(w), "lang")
    k = j.agg(F.min(F.expr("tokens DIV w")).alias("k"))
    return j.crossJoin(F.broadcast(k)).select(
        "lang",
        "docs",
        "tokens",
        F.col("w").cast("bigint").alias("w"),
        (F.col("k") * F.col("w")).cast("bigint").alias("sampled_tokens"),
        F.round(
            (F.col("k") * F.col("w")).cast("double") / F.col("tokens"), 4
        ).alias("accept_rate"),
    )


@register(
    "text_source_kl_divergence",
    oracle="""
WITH toks AS (
    SELECT source, t AS token
    FROM (
        SELECT source, unnest(string_split(text, ' ')) AS t
        FROM documents
    )
    WHERE t <> ''
),
counts AS (
    SELECT source, token, COUNT(*) AS c FROM toks GROUP BY source, token
),
gcounts AS (SELECT token, SUM(c) AS g FROM counts GROUP BY token),
vocab AS (SELECT token, g FROM gcounts ORDER BY g DESC, token LIMIT 500),
nv AS (SELECT CAST(SUM(g) AS BIGINT) AS n FROM vocab),
ns AS (
    SELECT source, CAST(SUM(c) AS BIGINT) AS n_s
    FROM counts JOIN vocab USING (token)
    GROUP BY source
)
SELECT c.source,
       CAST(ns.n_s AS BIGINT) AS vocab_tokens,
       ROUND(SUM((CAST(c.c AS DOUBLE) / ns.n_s)
                 * LN((CAST(c.c AS DOUBLE) / ns.n_s)
                      / (CAST(v.g AS DOUBLE) / nv.n))), 3) AS kl
FROM counts c
JOIN vocab v USING (token)
JOIN ns ON c.source = ns.source
CROSS JOIN nv
GROUP BY c.source, ns.n_s
""",
    tags=("text", "pipeline", "mixture", "quality"),
    bench=True,
)
def text_source_kl_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source unigram KL divergence from the corpus distribution —
    the domain-shift diagnostic a mixture planner reads next to
    `pipeline_mixture_weights`: a source whose token distribution sits
    far from the corpus mean (templated boilerplate, scraped navigation,
    a different register) shows up as a high KL(P_source || P_corpus)
    long before training does.

    Distributions are restricted to the top-500 global-vocabulary tokens
    (count-DESC, token tie break — deterministic on both engines), each
    side renormalized within the vocabulary; a vocab token absent from a
    source contributes its defined 0 term, and Q > 0 everywhere by
    construction, so the divergence is finite. Counts stay exact bigints
    until the final double KL, which rounds to 3 for the hash.

    100 TB posture: one (source, token) count shuffle over the corpus,
    one token-shape global aggregate, then everything downstream joins
    through the BROADCAST 500-row vocabulary — the per-source sums are
    vocabulary-bounded, never corpus-bounded, and the TakeOrdered top-500
    never materializes the full vocabulary on one node."""
    d = load(spark, sf_dir, "documents")
    toks = d.select(
        "source",
        F.explode(
            F.filter(F.split(F.col("text"), " "), lambda t: t != "")
        ).alias("token"),
    )
    # five consumers derive from `counts` (global counts → vocab → nv,
    # the vocab join, the per-source totals) — without a checkpoint each
    # re-runs the corpus explode+count (plan audit: 5 Generates). The
    # lazy localCheckpoint truncates lineage so the corpus is exploded
    # ONCE; the checkpointed relation is (source, token) × count —
    # vocabulary-bounded, tiny against the corpus at any scale.
    counts = toks.groupBy("source", "token").agg(
        F.count(F.lit(1)).alias("c")
    ).localCheckpoint(eager=False)
    glob = counts.groupBy("token").agg(F.sum("c").alias("g"))
    vocab = glob.orderBy(F.col("g").desc(), "token").limit(500)
    nv = vocab.agg(F.sum("g").cast("bigint").alias("n"))
    j = counts.join(F.broadcast(vocab), "token")
    ns = j.groupBy("source").agg(F.sum("c").cast("bigint").alias("n_s"))
    term = (F.col("c").cast("double") / F.col("n_s")) * F.log(
        (F.col("c").cast("double") / F.col("n_s"))
        / (F.col("g").cast("double") / F.col("n"))
    )
    return (
        j.join(F.broadcast(ns), "source")
        .crossJoin(F.broadcast(nv))
        .groupBy("source", "n_s")
        .agg(F.round(F.sum(term), 3).alias("kl"))
        .select(
            "source",
            F.col("n_s").alias("vocab_tokens"),
            "kl",
        )
    )
