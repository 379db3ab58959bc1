"""Streaming in-bucket pair generation for the LSH-style pair queries.

All four pair generators (minhash, simhash, winnow, ngram-Jaccard) share
one logical shape: bucket rows by a key, drop buckets larger than a cap,
and emit every in-bucket (doc_a < doc_b) pair. The classic DataFrame
spelling needs a bucket-size aggregate, a filter join back onto the rows,
and a self-join — three corpus-scale shuffles keyed the same way plus the
pair-side aggregate (round-16 plans: 12–26 Exchanges per query).

This module implements the single-shuffle version (guide §2.4): shuffle
the rows ONCE by the bucket key, sort within partitions so buckets are
contiguous, and stream them through a mapInArrow pass that applies the
cap and emits the pairs. Memory is bounded: at most cap+1 rows of the
current bucket are ever buffered (a viral bucket is counted, not stored),
and the JVM sort below the pass spills gracefully. Pair generation is
vectorized across every complete bucket of a batch via cached
np.triu_indices tables keyed by bucket size.

Exactness: rows arrive sorted by (key…, doc_id), doc_id is unique within
a bucket for every caller, so local i<j implies doc_a < doc_b — the
oracles' pair rule. The cap compares the TRUE bucket size (counted across
batch boundaries), identical to the HAVING COUNT(*) <= cap subquery.
"""

from __future__ import annotations


def stream_bucket_pairs(n_keys, cap_fn, emit_fn):
    """Build a mapInArrow function generating in-bucket (i < j) pairs.

    Input batches MUST be sorted by the first ``n_keys`` columns then by
    a per-bucket-unique row id (the callers sort by doc_id).

    - ``cap_fn(batch) -> int``: max bucket size kept (a literal, or read
      from a carried column of the first non-empty batch).
    - ``emit_fn(table, i, j) -> pyarrow.RecordBatch``: the output pairs
      for index arrays ``i``/``j`` (row indices into ``table``, which
      holds one or more complete buckets).
    """

    def fn(batches):
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc

        pair_cache: dict[int, tuple] = {}

        def pair_idx(starts, sizes):
            """Global (i, j) index arrays for i<j pairs of every bucket,
            vectorized per distinct bucket size."""
            outs_i, outs_j = [], []
            for s in np.unique(sizes):
                loc = pair_cache.get(int(s))
                if loc is None:
                    loc = np.triu_indices(int(s), 1)
                    pair_cache[int(s)] = loc
                g = starts[sizes == s]
                outs_i.append((g[:, None] + loc[0][None, :]).ravel())
                outs_j.append((g[:, None] + loc[1][None, :]).ravel())
            return np.concatenate(outs_i), np.concatenate(outs_j)

        def key_change_mask(tbl):
            """bool[n-1]: True where row r+1 starts a new bucket."""
            n = tbl.num_rows
            neq = None
            for c in range(n_keys):
                col = tbl.column(c).combine_chunks()
                d = pc.not_equal(col.slice(1, n - 1), col.slice(0, n - 1))
                d = d.to_numpy(zero_copy_only=False)
                neq = d if neq is None else (neq | d)
            return neq

        def same_key(tbl_a, tbl_b):
            """First row of tbl_b has the bucket key of tbl_a's rows."""
            return all(
                tbl_a.column(c)[0].as_py() == tbl_b.column(c)[0].as_py()
                for c in range(n_keys)
            )

        cap = None
        # the open (possibly batch-spanning) bucket: true row count so
        # far, plus at most cap+1 buffered rows (enough both to decide
        # the cap and to emit the pairs if it survives)
        pend_tbl = None
        pend_n = 0

        def close_bucket():
            nonlocal pend_tbl, pend_n
            out = None
            if pend_tbl is not None and 2 <= pend_n <= cap:
                i, j = pair_idx(
                    np.zeros(1, dtype=np.int64),
                    np.array([pend_tbl.num_rows], dtype=np.int64),
                )
                out = emit_fn(pend_tbl, pa.array(i), pa.array(j))
            pend_tbl = None
            pend_n = 0
            return out

        for batch in batches:
            if batch.num_rows == 0:
                continue
            if cap is None:
                cap = int(cap_fn(batch))
            tbl = pa.Table.from_batches([batch])
            n = tbl.num_rows
            if n > 1:
                bnds = np.flatnonzero(key_change_mask(tbl)) + 1
            else:
                bnds = np.empty(0, dtype=np.int64)
            starts = np.concatenate(([0], bnds)).astype(np.int64)
            ends = np.concatenate((bnds, [n])).astype(np.int64)

            if pend_tbl is not None:
                if same_key(pend_tbl, tbl):
                    # first segment continues the open bucket
                    seg_n = int(ends[0])
                    pend_n += seg_n
                    room = cap + 1 - pend_tbl.num_rows
                    if room > 0:
                        pend_tbl = pa.concat_tables(
                            [pend_tbl, tbl.slice(0, min(seg_n, room))]
                        )
                    starts, ends = starts[1:], ends[1:]
                    if len(starts) == 0:
                        continue  # whole batch belongs to the open bucket
                out = close_bucket()
                if out is not None and out.num_rows:
                    yield out

            # the last segment may continue into the next batch → pend it
            ls, le = int(starts[-1]), int(ends[-1])
            pend_n = le - ls
            pend_tbl = tbl.slice(ls, min(pend_n, cap + 1))
            starts, ends = starts[:-1], ends[:-1]

            if len(starts):
                sizes = ends - starts
                keep = (sizes >= 2) & (sizes <= cap)
                if keep.any():
                    i, j = pair_idx(starts[keep], sizes[keep])
                    out = emit_fn(tbl, pa.array(i), pa.array(j))
                    if out.num_rows:
                        yield out

        if cap is not None:
            out = close_bucket()
            if out is not None and out.num_rows:
                yield out

    return fn


def popcount64(x):
    """Vectorized 64-bit popcount (SWAR) over a numpy array viewed as
    uint64 — numpy<2 has no bitwise_count."""
    import numpy as np

    x = x.astype(np.uint64, copy=True)
    m1 = np.uint64(0x5555555555555555)
    m2 = np.uint64(0x3333333333333333)
    m4 = np.uint64(0x0F0F0F0F0F0F0F0F)
    h = np.uint64(0x0101010101010101)
    x -= (x >> np.uint64(1)) & m1
    x = (x & m2) + ((x >> np.uint64(2)) & m2)
    x = (x + (x >> np.uint64(4))) & m4
    return (x * h) >> np.uint64(56)
