"""Skew hardening for LSH pair generation: a viral duplicate group (one
text repeated many times) must be excluded by the band-bucket cap instead
of going quadratic, while ordinary near-dup pairs keep flowing — and the
DuckDB oracle (which carries the same cap in its CTE) agrees exactly."""

from __future__ import annotations

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from quiver_spark.operators.dedup import MAX_BAND_BUCKET
from quiver_spark.registry import load_all_operators


@pytest.fixture(scope="module")
def skew_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("skew_sf")
    viral = "the same viral boilerplate text repeated across the corpus " * 4
    near_a = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 3
    near_b = near_a + "one extra tail"
    texts = [viral] * (MAX_BAND_BUCKET + 36) + [near_a, near_b]
    n = len(texts)
    t = pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * n),
            "source": pa.array(["s0"] * n),
            "n_chars": pa.array([len(x) for x in texts], pa.int64()),
        }
    )
    pq.write_table(t, str(d / "documents.parquet"))
    return str(d)


def test_viral_bucket_capped_near_dups_survive(spark, skew_dir):
    specs = load_all_operators()
    pairs = specs["dedup_minhash_pairs"].spark(spark, skew_dir).collect()
    got = {(r.doc_a, r.doc_b) for r in pairs}
    viral_ids = set(range(MAX_BAND_BUCKET + 36))
    # the 100-member identical group produced ZERO pairs (bucket capped) …
    assert not any(a in viral_ids and b in viral_ids for a, b in got)
    # … while the genuine small near-dup pair still surfaces
    a_id, b_id = MAX_BAND_BUCKET + 36, MAX_BAND_BUCKET + 37
    assert (a_id, b_id) in got

    # the oracle (same cap in its CTE) agrees exactly
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{skew_dir}/documents.parquet')"
    )
    want = {
        (r[0], r[1])
        for r in con.execute(specs["dedup_minhash_pairs"].oracle).fetchall()
    }
    assert got == want


def test_clusters_inherit_the_cap(spark, skew_dir):
    """dedup_clusters over the capped edge set: the viral group forms no
    cluster (its edges were capped away); the near-dup pair forms one
    2-member cluster labeled by its min doc_id."""
    specs = load_all_operators()
    rows = specs["dedup_clusters"].spark(spark, skew_dir).collect()
    labels = {r.doc_id: r.cluster_id for r in rows}
    a_id, b_id = MAX_BAND_BUCKET + 36, MAX_BAND_BUCKET + 37
    assert labels == {a_id: a_id, b_id: a_id}


def test_lsh_signature_rejects_wrong_embedding_width(spark, monkeypatch):
    """The LSH plane-weight literals are EMB_DIM long; any other embedding
    width must fail LOUDLY (zip_with would otherwise null-pad every dot to
    NULL → all-zero signatures → one degenerate bucket, while the DuckDB
    oracle sums a partial dot — silent cross-engine divergence). The guard
    rides inside sig0's concat so column pruning cannot drop it."""
    import pyspark.sql.functions as F
    from py4j.protocol import Py4JJavaError

    from quiver_spark.operators import pipeline2

    bad = spark.range(3).select(
        F.col("id").alias("vec_id"),
        F.lit("a").alias("label"),
        F.array_repeat(F.lit(0.5), pipeline2.EMB_DIM - 1).alias("embedding"),
    )
    monkeypatch.setattr(pipeline2, "load", lambda *_a, **_k: bad)
    with pytest.raises((Py4JJavaError, Exception), match="embedding width"):
        pipeline2._lsh_signature(spark, "unused").collect()


def test_lsh_or_construction_recall_on_planted_near_dups(spark, monkeypatch):
    """Recall regression guard for the 4-table OR-construction (the twin of
    test_sq8_recall_against_exact): 50 planted near-dup pairs (cos ~0.97,
    seeded) among 200 background unit vectors must be recovered at >=75%
    by ann_lsh_bucketed_pairs. Theory for 4 tables x 12 planes at
    cos 0.97: per-table collision (1 - theta/pi)^12 ~ 0.39, OR over 4
    tables ~ 0.86; measured 42/50 = 0.84 deterministic at pin time. A
    broken table (or a bucket-cap regression dropping genuine near-dup
    buckets) roughly halves this, so the 0.75 floor separates real
    regressions from arithmetic-path jitter."""
    import numpy as np

    from quiver_spark.operators import pipeline2

    rng = np.random.default_rng(42)
    base = rng.normal(0, 1, (200, pipeline2.EMB_DIM))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    dup = base[:50] + rng.normal(0, 0.03, (50, pipeline2.EMB_DIM))
    dup /= np.linalg.norm(dup, axis=1, keepdims=True)
    allv = np.vstack([base, dup]).astype(np.float32)
    rows = [(i, "x", [float(v) for v in allv[i]]) for i in range(250)]
    df = spark.createDataFrame(
        rows, "vec_id long, label string, embedding array<float>"
    )
    monkeypatch.setattr(pipeline2, "load", lambda *_a, **_k: df)
    found = pipeline2.ann_lsh_bucketed_pairs(spark, "unused").collect()
    fset = {(min(r.a, r.b), max(r.a, r.b)) for r in found}
    planted = {(i, 200 + i) for i in range(50)}
    recovered = len(planted & fset)
    assert recovered >= 38, f"recall collapsed: {recovered}/50 planted pairs"


from hypothesis import given, settings, strategies as st


@settings(max_examples=5, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=900), min_size=1, max_size=80)
)
def test_pack_sequences_matches_python_reference(spark, token_counts):
    """Property pin for the packing arithmetic: on random corpora the
    Spark plan must agree with a naive single-threaded Python packer
    (same md5 shards, same doc_id order, same integer division). The
    DuckDB oracle already cross-checks the fixed corpus; this covers
    arbitrary token-count shapes including zero-token docs, single-doc
    shards, and docs spanning several packs."""
    import hashlib

    import pyspark.sql.functions as F

    from quiver_spark.operators import pipeline5

    rows = [(i, "x " * k) for i, k in enumerate(token_counts)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    # independent reference implementation
    B, S = pipeline5.PACK_TOKENS, pipeline5.PACK_SHARDS
    shards: dict[int, list[tuple[int, int]]] = {}
    for i, k in enumerate(token_counts):
        if k == 0:
            continue
        sh = int(hashlib.md5(str(i).encode()).hexdigest()[:4], 16) % S
        shards.setdefault(sh, []).append((i, k))
    expected = {}
    for sh, members in shards.items():
        cum = 0
        boundary = 0
        max_span = 0
        for _i, k in sorted(members):
            first, last = cum // B, (cum + k - 1) // B
            boundary += first != last
            max_span = max(max_span, last - first + 1)
            cum += k
        expected[sh] = (
            len(members), cum, (cum - 1) // B + 1, boundary, max_span
        )

    import unittest.mock as mock

    with mock.patch.object(pipeline5, "load", lambda *_a, **_k: docs):
        got = {
            r.shard: (
                r.n_docs, r.total_tokens, r.n_packs, r.boundary_docs, r.max_span
            )
            for r in pipeline5.pipeline_pack_sequences(spark, "unused").collect()
        }
    assert got == expected


def test_span_excision_keep_one_semantics(spark, tmp_path):
    """ExactSubstr-style span excision: the owning (min doc_id) document
    keeps the duplicated span; every other occurrence is cut token-wise;
    documents without cross-doc spans pass through verbatim; docs
    shorter than the gram width are never touched."""
    import pyspark.sql.functions as F

    from quiver_spark.operators.pipeline6 import SPAN_K, dedup_span_excision

    span = " ".join(f"w{i}" for i in range(SPAN_K))
    rows = [
        (1, f"alpha {span} beta"),        # owner: keeps the span
        (2, f"gamma {span} delta"),       # dup: span excised
        (3, "completely unrelated text"),  # untouched, passes verbatim
        (4, "tiny"),                       # shorter than k: never touched
    ]
    import pandas as pd

    sf = str(tmp_path)
    pd.DataFrame(
        {
            "doc_id": [r[0] for r in rows],
            "text": [r[1] for r in rows],
            "lang": ["en"] * 4,
            "source": ["s"] * 4,
            "n_chars": [len(r[1]) for r in rows],
        }
    ).to_parquet(f"{sf}/documents.parquet")
    out = {
        r.doc_id: r for r in dedup_span_excision(spark, sf).collect()
    }
    assert out[1].tokens_removed == 0 and out[1].clean_text == rows[0][1]
    # doc 2 loses the span tokens ONLY (alpha/gamma/delta words survive)
    assert out[2].tokens_removed == SPAN_K
    assert out[2].clean_text == "gamma delta"
    assert out[3].tokens_removed == 0 and out[3].clean_text == rows[2][1]
    assert out[4].tokens_removed == 0 and out[4].clean_text == "tiny"


def test_gopher_topword_fold_matches_counter(spark):
    """The sorted-array max-run-length fold inside
    text_gopher_quality_filter computes the most-frequent-word count
    without an explode; cross-check it against collections.Counter on
    200 seeded-random word lists (incl. empty, all-equal, and
    max-run-at-END lists — the fold's accumulator must not lose a run
    that never terminates)."""
    import random
    from collections import Counter

    rng = random.Random(13)
    vocab = ["a", "bb", "ccc", "dd", "e"]
    docs = []
    for i in range(200):
        n = rng.randrange(0, 30)
        words = [rng.choice(vocab) for _ in range(n)]
        if i % 7 == 0:
            words = ["zz"] * rng.randrange(1, 6)  # all-equal
        if i % 11 == 0 and words:
            words = sorted(words)  # max run ends the array
        docs.append((i, " ".join(words)))
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    words = "filter(split(text, '\\\\s+'), x -> x <> '')"
    maxc = f"""
    aggregate(
        sort_array({words}),
        named_struct('prev', CAST(NULL AS STRING), 'run', 0L, 'best', 0L),
        (s, x) -> named_struct(
            'prev', x,
            'run', IF(x <=> s.prev, s.run + 1, 1L),
            'best', GREATEST(s.best, IF(x <=> s.prev, s.run + 1, 1L))),
        s -> s.best)
    """
    from pyspark.sql import functions as F

    got = {
        r.doc_id: r.maxc
        for r in df.select("doc_id", F.expr(maxc).alias("maxc")).collect()
    }
    for i, text in docs:
        want = max(Counter(text.split()).values(), default=0)
        assert got[i] == want, (i, text, got[i], want)


def test_gopher_filter_counts_zero_word_docs(spark, tmp_path):
    """A corpus with empty / whitespace-only documents: both engines must
    COUNT them (nw=0, maxc=0) — the oracle's per-doc top-word CTE has no
    row for them, and an inner join silently dropped them pre-fix."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from quiver_spark.registry import load_all_operators

    d = str(tmp_path / "sf")
    import os

    os.makedirs(d)
    docs = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
            "text": pa.array(
                ["the a quick fox", "", "   ", "a a a a a the of b"], pa.string()
            ),
            "lang": pa.array(["en"] * 4),
            "source": pa.array(["s0", "s0", "s1", "s1"]),
            "n_chars": pa.array([15, 0, 3, 18], pa.int64()),
        }
    )
    pq.write_table(docs, os.path.join(d, "documents.parquet"))
    spec = load_all_operators()["text_gopher_quality_filter"]
    got = spec.spark(spark, d).toPandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{d}/documents.parquet'"
    )
    want = con.execute(spec.oracle).fetchdf()

    def norm(pdf):
        pdf = pdf.reindex(sorted(pdf.columns), axis=1)
        return sorted(
            tuple(repr(x) for x in r) for r in pdf.itertuples(index=False)
        )

    assert norm(got) == norm(want)
    assert int(got["n_docs"].sum()) == 4  # the empty docs are counted


def test_tfidf_n_matches_oracle_on_pathological_docs(spark, tmp_path):
    """text_tfidf_topk's smooth-IDF N: whitespace-only docs must NOT count
    as tokenized and all-'s' docs MUST (ADVICE r13 — a single-escaped
    '\\s+' in the F.expr literal reached Spark as the regex 's+', split
    on the LETTER s, flipping both classes vs the oracle's \\s+)."""
    import os

    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from quiver_spark.registry import load_all_operators

    d = str(tmp_path / "sf")
    os.makedirs(d)
    docs = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3, 4], pa.int64()),
            "text": pa.array(
                [
                    "alpha beta beta",
                    "   ",  # whitespace-only: zero tokens under \s+
                    "ssss",  # all-'s': ONE token under \s+, zero under 's+'
                    "alpha gamma",
                    "",
                ],
                pa.string(),
            ),
            "lang": pa.array(["en"] * 5),
            "source": pa.array(["s0", "s0", "s1", "s1", "s1"]),
            "n_chars": pa.array([15, 3, 4, 11, 0], pa.int64()),
        }
    )
    pq.write_table(docs, os.path.join(d, "documents.parquet"))
    spec = load_all_operators()["text_tfidf_topk"]
    got = spec.spark(spark, d).toPandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{d}/documents.parquet'"
    )
    want = con.execute(spec.oracle).fetchdf()

    def norm(pdf):
        pdf = pdf.reindex(sorted(pdf.columns), axis=1)
        return sorted(
            tuple(repr(x) for x in r) for r in pdf.itertuples(index=False)
        )

    assert norm(got) == norm(want)
    # N = docs with >=1 \s+ token: ids 0, 2, 3 → smooth idf over n_docs=3
    import math

    alpha = want[want.token == "alpha"].iloc[0]
    assert float(alpha.tfidf) == float(alpha.sum_tf) * (
        math.log((3 + 1) / (float(alpha.doc_freq) + 1)) + 1
    )


def test_bloom_membership_sparse_filter_counts_all_probes(spark, tmp_path):
    """sketch_bloom_membership on a SPARSE filter: a probe landing in a
    word with no bloom row must read COALESCE(bits,0)=0 — definite
    non-member — not silently drop out of the MIN (ADVICE r13: the inner
    join overcounted bloom_positives and could vanish a customer whose
    every probe hit an empty word)."""
    import os

    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from quiver_spark.registry import load_all_operators

    d = str(tmp_path / "sf")
    os.makedirs(d)
    # ONE order key → ≤4 set bits in a 4096-bit filter; 40 customers make
    # probes into empty words near-certain
    pq.write_table(
        pa.table({"o_custkey": pa.array([7], pa.int64())}),
        os.path.join(d, "orders.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array(list(range(1, 41)), pa.int64()),
                "c_mktsegment": pa.array(
                    ["SEG%d" % (i % 3) for i in range(40)]
                ),
            }
        ),
        os.path.join(d, "customer.parquet"),
    )
    spec = load_all_operators()["sketch_bloom_membership"]
    got = spec.spark(spark, d).toPandas()
    con = duckdb.connect()
    for t in ("orders", "customer"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{d}/{t}.parquet'")
    want = con.execute(spec.oracle).fetchdf()

    def norm(pdf):
        pdf = pdf.reindex(sorted(pdf.columns), axis=1)
        return sorted(
            tuple(repr(x) for x in r) for r in pdf.itertuples(index=False)
        )

    assert norm(got) == norm(want)
    # every customer is tallied (pre-fix: empty-word probes vanished)
    assert int(got["n_customers"].sum()) == 40
    # no false negatives, and the sparse filter keeps positives honest:
    # exactly one exact member (custkey 7), bloom_positives ≥ that
    assert int(got["exact_members"].sum()) == 1
    assert int(got["bloom_positives"].sum()) >= 1
