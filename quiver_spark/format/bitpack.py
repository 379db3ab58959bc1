"""BitPacker4x-compatible bit packing, numpy-vectorized.

The Bitpacking / DeltaBitpacking codecs pack u32 values in 128-value blocks
using the 4-lane SIMD layout of the `bitpacking` crate's BitPacker4x
(reference: src/compression/integer/bp.rs:33-101, delta_bp.rs:33-110):

- A block's 128 values are viewed as 32 SIMD words of 4 consecutive values;
  lane l therefore carries values v[l], v[l+4], ..., v[l+124].
- Each lane's 32 values are packed LSB-first into `num_bits` u32 words.
- Output interleaves lanes: 128-bit word k = (lane0_word_k .. lane3_word_k).
- Per block: u8 num_bits prefix, then num_bits*16 payload bytes.
- Delta flavor packs per-lane word deltas v[i]-v[i-1] (the block's first
  word subtracts the running `initial` = previous block's last raw value,
  broadcast to all lanes); num_bits still comes from the raw block max
  (mirroring the reference, which calls num_bits(chunk) for both flavors).

Vectorization: blocks are grouped by num_bits so the 32-step pack/unpack
loop runs once per distinct bit width, not once per block.
"""

from __future__ import annotations

import numpy as np

BLOCK = 128
WORDS = 32  # SIMD words per block (BLOCK / 4 lanes)


def _bits_needed(x: np.ndarray) -> np.ndarray:
    """Bits needed per value (0 → 0). ceil(log2(x+1)) is exact for u32 in
    float64 (x+1 ≤ 2^32 is exactly representable; log2 of exact powers of
    two is exact)."""
    x = x.astype(np.float64)
    return np.where(x == 0, 0, np.ceil(np.log2(x + 1.0))).astype(np.uint8)


def _pack_group(words: np.ndarray, b: int) -> np.ndarray:
    """Pack (n, 32, 4) u64 words at bit width b → (n, b*4) u32."""
    n = words.shape[0]
    out = np.empty((n, b, 4), dtype=np.uint32)
    acc = np.zeros((n, 4), dtype=np.uint64)
    filled = 0
    k = 0
    for i in range(WORDS):
        acc |= words[:, i, :] << np.uint64(filled)
        filled += b
        if filled >= 32:
            out[:, k, :] = (acc & np.uint64(0xFFFFFFFF)).astype(np.uint32)
            acc >>= np.uint64(32)
            filled -= 32
            k += 1
    assert k == b and filled == 0
    return out.reshape(n, b * 4)


def _unpack_group(packed: np.ndarray, b: int) -> np.ndarray:
    """Unpack (n, b*4) u32 at width b → (n, 32, 4) u32 values.

    Fully vectorized: each lane's packed words form an LSB-first bitstream
    of 32 b-bit values, so unpackbits over the lane bytes + a shift-reduce
    reassembles every value with no per-word Python loop."""
    n = packed.shape[0]
    # (n, b, 4) u32 → lane-major bytes (n, 4, b*4)
    lane_bytes = (
        packed.reshape(n, b, 4)
        .transpose(0, 2, 1)
        .copy()
        .view(np.uint8)
        .reshape(n, 4, b * 4)
    )
    bits = np.unpackbits(lane_bytes, axis=-1, bitorder="little")
    # (n, 4, 32 values, b bits) LSB first → zero-pad each value to 32 bits
    # and let packbits reassemble the u32s (C-speed, no wide reduce)
    padded = np.zeros((n, 4, WORDS, 32), dtype=np.uint8)
    padded[..., :b] = bits.reshape(n, 4, WORDS, b)
    vals = np.packbits(padded, axis=-1, bitorder="little").view(np.uint32)
    return vals.reshape(n, 4, WORDS).transpose(0, 2, 1)  # (n, 32, 4)


def _emit(blocks_u64: np.ndarray, bits: np.ndarray) -> bytes:
    """Group-by-width pack + per-block (num_bits, payload) emission."""
    nblocks = blocks_u64.shape[0]
    payload_rows: list[bytes | None] = [None] * nblocks
    for b in np.unique(bits):
        idx = np.nonzero(bits == b)[0]
        if b == 0:
            for i in idx:
                payload_rows[i] = b""
        else:
            packed = _pack_group(blocks_u64[idx], int(b))
            for j, i in enumerate(idx):
                payload_rows[i] = packed[j].tobytes()
    out = bytearray()
    for blk in range(nblocks):
        out.append(int(bits[blk]))
        out += payload_rows[blk]
    return bytes(out)


def _parse(buf: memoryview, nblocks: int) -> np.ndarray:
    """Inverse of _emit framing: → (nblocks, 32, 4) u32 word array."""
    raw = np.frombuffer(buf, dtype=np.uint8)
    # fast path: every block at the first block's width → headers sit at
    # arithmetic positions (verified vectorized); else the sequential scan
    b0 = int(raw[0]) if nblocks else 0
    stride = 1 + 16 * b0
    starts = np.arange(nblocks, dtype=np.int64) * stride
    if len(raw) == nblocks * stride and bool((raw[starts] == b0).all()):
        bits = np.full(nblocks, b0, dtype=np.uint8)
        offsets = starts + 1
    else:
        bits = np.empty(nblocks, dtype=np.uint8)
        offsets = np.empty(nblocks, dtype=np.int64)
        pos = 0
        for blk in range(nblocks):
            b = raw[pos]
            bits[blk] = b
            offsets[blk] = pos + 1
            pos += 1 + int(b) * 16
    out = np.empty((nblocks, WORDS, 4), dtype=np.uint32)
    for b in np.unique(bits):
        idx = np.nonzero(bits == b)[0]
        if b == 0:
            out[idx] = 0
            continue
        # one fancy-index gather for the whole width group (no per-block
        # frombuffer/stack)
        byte_idx = offsets[idx][:, None] + np.arange(int(b) * 16, dtype=np.int64)
        packed = raw[byte_idx].view(np.uint32).reshape(len(idx), int(b) * 4)
        out[idx] = _unpack_group(packed, int(b))
    return out


def pack(values: np.ndarray) -> bytes:
    """Plain BitPacker4x compress of u32 values (len % 128 == 0)."""
    v = np.ascontiguousarray(values, dtype=np.uint32)
    assert len(v) % BLOCK == 0 and len(v) > 0
    blocks = v.reshape(-1, WORDS, 4)
    bits = _bits_needed(blocks.reshape(blocks.shape[0], -1).max(axis=1))
    return _emit(blocks.astype(np.uint64), bits)


def unpack(buf: memoryview, length: int) -> np.ndarray:
    nblocks = (length + BLOCK - 1) // BLOCK
    return _parse(buf, nblocks).reshape(nblocks * BLOCK)[:length]


def pack_sorted(values: np.ndarray, initial: int = 0) -> bytes:
    v = np.ascontiguousarray(values, dtype=np.uint32)
    assert len(v) % BLOCK == 0 and len(v) > 0
    blocks = v.reshape(-1, WORDS, 4)
    nblocks = blocks.shape[0]
    prev = np.empty_like(blocks)
    prev[:, 1:, :] = blocks[:, :-1, :]
    inits = np.empty(nblocks, dtype=np.uint32)
    inits[0] = initial
    if nblocks > 1:
        inits[1:] = v[BLOCK - 1 :: BLOCK][:-1]  # prior block's last raw value
    prev[:, 0, :] = inits[:, None]
    deltas = blocks - prev  # u32 wrap-around == SIMD sub semantics
    bits = _bits_needed(blocks.reshape(nblocks, -1).max(axis=1))
    return _emit(deltas.astype(np.uint64), bits)


def unpack_sorted(buf: memoryview, length: int, initial: int = 0) -> np.ndarray:
    nblocks = (length + BLOCK - 1) // BLOCK
    deltas = _parse(buf, nblocks).astype(np.uint64)
    # per-lane integration within each block ...
    vals = np.cumsum(deltas, axis=1)
    # ... seeded by a per-block initial: lane-3 total of the previous block
    block_last = vals[:, -1, 3]
    inits = np.zeros(nblocks, dtype=np.uint64)
    inits[0] = initial
    if nblocks > 1:
        inits[1:] = initial + np.cumsum(block_last)[:-1]
    vals += inits[:, None, None]
    return vals.astype(np.uint32).reshape(nblocks * BLOCK)[:length]
