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
    """bits: uint32/uint64 view of the float page values."""
    nbytes = bits.dtype.itemsize
    nbits = nbytes * 8
    out = bytearray()
    indices: dict[int, int] = {}
    vals = bits.tolist()
    for i, v in enumerate(vals):
        if i == 0:
            out += v.to_bytes(nbytes, "little")
        else:
            ref = indices.get(v, 0)
            if (i - ref) >= 128:
                ref = i - 1
            diff = i - ref
            xor = v ^ vals[ref]
            if xor == 0:
                tz_stored = nbits - 1
                sig_bytes = 0
            else:
                tz = (xor & -xor).bit_length() - 1
                lz = nbits - xor.bit_length()
                sig_bits = nbits - tz - lz
                sig_bytes = (sig_bits >> 3) + (1 if sig_bits & 7 else 0)
                tz_stored = tz
            packed = ((diff & 0x7F) << 9) | ((sig_bytes & 7) << 6) | (tz_stored & 0x3F)
            out += packed.to_bytes(2, "little")
            if sig_bytes:
                out += (xor >> tz_stored).to_bytes(8, "little")[:sig_bytes]
        indices[v] = i
    return bytes(out)


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
