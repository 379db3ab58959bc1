"""Unit tests for the streaming in-bucket pair generator (round 17).

The Spark-level oracle-parity tests exercise the happy path, but at the
gate SFs most buckets fit inside one Arrow batch — the batch-spanning
pending logic (a bucket split across 2+ batches, a viral bucket larger
than the cap spanning batches, a batch fully inside one bucket) needs
direct coverage. These tests feed hand-sliced record batches through
stream_bucket_pairs and compare against a brute-force reference.
"""

from __future__ import annotations

import itertools
import random

import pyarrow as pa
import pytest

from quiver_spark.operators._bucketpairs import (
    popcount64,
    stream_bucket_pairs,
)


def _brute_pairs(rows, n_keys, cap):
    """Reference: group rows by key, drop buckets above cap, emit i<j
    pairs ordered by doc (rows are (key..., doc))."""
    out = []
    for _, grp in itertools.groupby(rows, key=lambda r: r[:n_keys]):
        grp = list(grp)
        if len(grp) > cap:
            continue
        for a, b in itertools.combinations(grp, 2):
            out.append((a[n_keys], b[n_keys]))
    return sorted(out)


def _run(rows, n_keys, cap, batch_size):
    """Run the generator over rows sliced into batch_size chunks."""
    names = [f"k{i}" for i in range(n_keys)] + ["doc"]
    batches = []
    for s in range(0, len(rows), batch_size):
        chunk = rows[s : s + batch_size]
        cols = [pa.array([r[c] for r in chunk]) for c in range(n_keys + 1)]
        batches.append(pa.RecordBatch.from_arrays(cols, names=names))

    def emit(tbl, i, j):
        doc = tbl.column(n_keys).combine_chunks()
        return pa.RecordBatch.from_arrays(
            [doc.take(i), doc.take(j)], names=["doc_a", "doc_b"]
        )

    fn = stream_bucket_pairs(n_keys, lambda _b: cap, emit)
    got = []
    for out in fn(iter(batches)):
        got += list(zip(out.column(0).to_pylist(), out.column(1).to_pylist()))
    return sorted(got)


def _mk_rows(rng, n_buckets, max_sz, n_keys):
    rows = []
    doc = 0
    for b in range(n_buckets):
        key = tuple(
            (b * 7 + k) if k == 0 else f"h{b:04d}" for k in range(n_keys)
        )
        for _ in range(rng.randint(1, max_sz)):
            rows.append(key + (doc,))
            doc += 1
    return rows


@pytest.mark.parametrize("batch_size", [1, 2, 3, 7, 10_000])
@pytest.mark.parametrize("cap", [2, 4, 64])
def test_stream_bucket_pairs_matches_bruteforce(batch_size, cap):
    rng = random.Random(17)
    rows = _mk_rows(rng, n_buckets=23, max_sz=9, n_keys=2)
    assert _run(rows, 2, cap, batch_size) == _brute_pairs(rows, 2, cap)


def test_viral_bucket_spanning_batches_is_dropped():
    # one bucket of 10 rows with cap 4, sliced into 3-row batches: the
    # bucket spans four batches and must be counted (10 > 4) and dropped
    rows = [(1, "x", d) for d in range(10)] + [(2, "y", 10), (2, "y", 11)]
    assert _run(rows, 2, cap=4, batch_size=3) == [(10, 11)]


def test_bucket_exactly_at_cap_spanning_batches_is_kept():
    rows = [(1, "x", d) for d in range(4)]
    assert _run(rows, 2, cap=4, batch_size=3) == _brute_pairs(rows, 2, 4)
    assert len(_run(rows, 2, cap=4, batch_size=3)) == 6


def test_batch_entirely_inside_one_bucket():
    # middle batches contain no key change at all
    rows = [(5, "k", d) for d in range(7)] + [(6, "z", 7), (6, "z", 8)]
    for bs in (2, 3, 7):
        assert _run(rows, 2, cap=64, batch_size=bs) == _brute_pairs(
            rows, 2, 64
        )


def test_singleton_buckets_emit_nothing():
    rows = [(i, f"h{i}", i) for i in range(9)]
    assert _run(rows, 2, cap=64, batch_size=4) == []


def test_popcount64_matches_int_bit_count():
    import numpy as np

    rng = random.Random(7)
    vals = [rng.getrandbits(63) for _ in range(1000)] + [0, 1, (1 << 63) - 1]
    arr = np.array(vals, dtype=np.int64)
    got = popcount64(arr)
    assert [int(x) for x in got] == [v.bit_count() for v in vals]
