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
