"""Driver-contract invariants for __spark_entry__ — the file the driver
actually calls. A rotation typo (stale name, duplicate, dropped oracle)
would silently shrink the correctness sample; pin it here."""

from __future__ import annotations

import sys
from pathlib import Path

REPO = str(Path(__file__).resolve().parent.parent)
if REPO not in sys.path:
    sys.path.insert(0, REPO)

import __spark_entry__ as entry  # noqa: E402
from quiver_spark.registry import load_all_operators  # noqa: E402

SPECS = load_all_operators()


def test_priority_names_are_registered():
    missing = [n for n in entry._PRIORITY if n not in SPECS]
    assert not missing, f"_PRIORITY references unregistered queries: {missing}"


def test_priority_has_no_duplicates():
    dupes = [n for n in set(entry._PRIORITY) if entry._PRIORITY.count(n) > 1]
    assert not dupes, dupes


def test_priority_fills_the_sample_window():
    # the driver samples a bounded window (50 in rounds 1-4); the rotation
    # must supply at least that many explicitly-ordered names
    assert len(entry._PRIORITY) >= 50


def test_queries_lead_with_priority():
    names = list(entry.queries())
    k = len(entry._PRIORITY)
    assert names[:k] == entry._PRIORITY


def test_every_query_has_an_oracle_or_is_documented():
    # every registered query currently carries an oracle; if one is ever
    # added without (rows-only check), this asserts it was deliberate
    qs = set(entry.queries())
    os_ = set(entry.oracle_sql())
    rows_only = qs - os_
    assert rows_only == set(), (
        f"queries without oracles (add one or whitelist here): {rows_only}"
    )


def test_oracle_sql_is_subset_of_queries():
    extra = set(entry.oracle_sql()) - set(entry.queries())
    assert extra == set(), extra


def test_every_pair_generator_is_fanout_bounded():
    """Scale guardrail: every operator that self-joins on a blocking key
    must carry an explicit fan-out bound — a band-bucket cap or a
    document-frequency cap — so no viral duplicate or degenerate bucket
    can go quadratic. This test pins the constants so a future operator
    (or a refactor that drops a cap) fails loudly here."""
    from quiver_spark.operators import dedup, pipeline2, pipeline3

    assert 2 <= dedup.MAX_BAND_BUCKET <= 1 << 12
    assert 2 <= dedup.MAX_SIMHASH_BUCKET <= 1 << 12
    assert 2 <= pipeline2.MAX_LSH_BUCKET <= 1 << 12
    assert 2 <= pipeline2.MAX_SHINGLE_DF <= 1 << 12
    assert 2 <= pipeline3.MAX_FP_DF <= 1 << 12
    # simhash pigeonhole: bands must exceed the Hamming threshold for the
    # at-least-one-clean-band guarantee
    assert dedup.SIMHASH_N_BANDS > dedup.SIMHASH_HAMMING_MAX
    # assembled simhash must fit a signed 64-bit integer
    assert dedup.SIMHASH_BITS < 64
    # the caps appear in BOTH engines' texts (oracle carries the same cap)
    from quiver_spark.registry import load_all_operators

    specs = load_all_operators()
    assert f"<= {dedup.MAX_BAND_BUCKET}" in specs["dedup_minhash_pairs"].oracle
    assert f"<= {dedup.MAX_SIMHASH_BUCKET}" in specs["dedup_simhash_pairs"].oracle
    assert f"<= {pipeline2.MAX_LSH_BUCKET}" in specs["ann_lsh_bucketed_pairs"].oracle
    assert f"<= {pipeline2.MAX_LSH_BUCKET}" in specs["embedding_near_dup"].oracle
