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
