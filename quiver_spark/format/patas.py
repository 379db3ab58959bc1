"""Patas codec — DuckDB's "patas" XOR-with-reference float compression,
byte-compatible with the reference (src/compression/double/patas.rs):

- value[0] stored raw little-endian.
- value[i>0]: find the most recent index holding the SAME bit pattern
  (hash lookup); if none within the last 128 values, reference i-1.
  xor = bits[i] ^ bits[ref]; store
  ``pack(ref_diff:7b, sig_bytes:3b, trailing_zeros:6b)`` as u16 LE followed
  by the significant bytes of ``xor >> trailing_zeros``.
- equal values (xor == 0) store sig_bytes = 0 and trailing_zeros = nbits-1
  (the reference's ``trailing_zeros - is_equal`` trick, patas.rs:76-95).
- 8 significant bytes are encoded as sig_bytes = 0 (3-bit field) and
  disambiguated on decode by ``trailing_zeros < 63`` (unpack quirk,
  patas.rs:160-166) — only possible for f64.

The decode chain is inherently sequential (each value references one of
the previous 128 OUTPUTS), so this is a Python loop — the reason `patas`
sits in WriteOptions.forbidden by default (SURVEY §7 "hard parts"): the
engine always DECODES patas pages but only writes them when explicitly
enabled.
"""

from __future__ import annotations

import numpy as np


def encode(bits: np.ndarray) -> bytes:
    """bits: uint32/uint64 view of the float page values.

    Fully numpy-vectorized (no per-value Python loop): the reference index
    of value i is its most recent IDENTICAL bit pattern (else 0), demoted
    to i-1 when more than 127 back — computed with a stable argsort over
    the unique-inverse ids; trailing-zero counts come from an exact
    power-of-two log2 of the isolated lowest set bit; significant-byte
    counts from per-byte-plane nonzero masks; and the variable-length
    payload is assembled with cumsum offsets + 8 masked scatters.
    Byte-identical to the sequential formulation (kept in git history),
    ~100x its throughput — fast enough for the default chooser list."""
    nbytes = bits.dtype.itemsize
    nbits = nbytes * 8
    n = len(bits)
    if n == 0:
        return b""
    u = bits.astype(np.uint64, copy=False)
    idx = np.arange(n, dtype=np.int64)

    # prev[i] = last j<i with u[j] == u[i], else -1 (the dict in the
    # reference's ring-buffer lookup, patas.rs:34-58): one stable sort
    # groups equal values while preserving index order within each group
    order = np.argsort(u, kind="stable")
    prev = np.full(n, -1, dtype=np.int64)
    same = u[order][1:] == u[order][:-1]
    prev[order[1:][same]] = order[:-1][same]

    ref = np.where(prev >= 0, prev, 0)
    ref = np.where(idx - ref >= 128, idx - 1, ref)
    diff = (idx - ref).astype(np.uint64)
    xor = u ^ u[ref]

    # exact trailing zeros: lowest set bit is a power of two, so float64
    # log2 is exact for it at any width up to 2^63
    lowbit = xor & (~xor + np.uint64(1))
    tz = np.zeros(n, dtype=np.uint64)
    nz = xor != 0
    tz[nz] = np.log2(lowbit[nz].astype(np.float64)).astype(np.uint64)
    shifted = np.zeros(n, dtype=np.uint64)
    shifted[nz] = xor[nz] >> tz[nz]
    # exact significant-byte count from byte planes (a float log2 of the
    # full value can round up across a byte boundary; this cannot)
    planes = (
        shifted[:, None] >> (np.uint64(8) * np.arange(8, dtype=np.uint64))
    ).astype(np.uint8)
    sig_bytes = np.where(
        nz, 8 - np.argmax(planes[:, ::-1] != 0, axis=1), 0
    ).astype(np.int64)
    tz_stored = np.where(nz, tz, np.uint64(nbits - 1))

    packed = (
        ((diff & np.uint64(0x7F)) << np.uint64(9))
        | ((sig_bytes.astype(np.uint64) & np.uint64(7)) << np.uint64(6))
        | (tz_stored & np.uint64(0x3F))
    ).astype(np.uint16)

    # payload layout: [raw value 0][2B packed + sig bytes]per value>0 —
    # built as a fixed 10-byte-per-value matrix whose unused cells are
    # compacted away with one boolean mask over the raveled bytes
    wide = np.empty((n, 10), dtype=np.uint8)
    wide[:, 0] = (packed & 0xFF).astype(np.uint8)
    wide[:, 1] = (packed >> 8).astype(np.uint8)
    wide[:, 2:] = planes
    keep = np.empty((n, 10), dtype=bool)
    keep[:, :2] = True
    keep[:, 2:] = np.arange(8, dtype=np.int64) < sig_bytes[:, None]
    keep[0, :] = False
    return (
        u[0].astype(bits.dtype.type).tobytes()
        + wide.ravel()[keep.ravel()].tobytes()
    )


def decode(buf: memoryview, length: int, dtype: np.dtype) -> np.ndarray:
    """Inverse of encode; returns the float array."""
    udt = np.dtype(f"<u{dtype.itemsize}")
    nbytes = udt.itemsize
    nbits = nbytes * 8
    mask = (1 << nbits) - 1
    if length == 0:
        return np.empty(0, dtype=dtype)
    vals = [int.from_bytes(buf[0:nbytes], "little")]
    pos = nbytes
    for _ in range(length - 1):
        packed = buf[pos] | (buf[pos + 1] << 8)
        pos += 2
        diff = (packed >> 9) & 0x7F
        sig = (packed >> 6) & 0x07
        tz = packed & 0x3F
        if nbits == 64 and tz < 63 and sig == 0:
            sig = 8
        v = int.from_bytes(buf[pos : pos + sig], "little") if sig else 0
        pos += sig
        vals.append(((v << tz) ^ vals[-diff]) & mask)
    return np.array(vals, dtype=udt).view(dtype)


def sample_ratio(bits: np.ndarray, sample_count: int = 10, sample_size: int = 64) -> float:
    """Estimated compression ratio from compressing evenly-spaced sample
    runs (the reference's compress_sample_ratio, compression/mod.rs:29-33)."""
    n = len(bits)
    if n == 0:
        return 0.0
    if n <= sample_count * sample_size:
        sample = bits
    else:
        step = n // sample_count
        parts = [bits[i * step : i * step + sample_size] for i in range(sample_count)]
        sample = np.concatenate(parts)
    raw = len(sample) * bits.dtype.itemsize
    comp = len(encode(sample))
    return raw / max(comp, 1)
