"""Reference-golden interop fixtures.

Every golden file below is hand-assembled with deliberately simple,
loop-based code that follows the reference Rust sources line by line
(citations per helper), completely independent of the
``quiver_spark.format`` encoders. A self-consistent-but-wrong layout in
our writer+reader pair therefore fails here even though round-trip tests
pass (the exact bug class of the round-2 decimal cascade).

Two directions:

- **decode**: assemble a file the way the reference writer would and
  assert ``read_table`` produces the expected arrays (can we read
  reference-written files?).
- **encode byte-compare**: run our encoders on the same data with the
  codec forced and assert byte-identical output for the deterministic
  codecs (OneValue / RLE / Bitpacking / DeltaBitpacking / None and the
  envelope itself). Dict (entry order) and basic Lz4/Zstd/Snappy
  (library bitstreams) are legitimately non-deterministic across
  implementations and only get decode-direction coverage.
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa
import pytest

from quiver_spark.format.codecs import (
    CodecOptions,
    encode_boolean,
    encode_fixed,
    encode_numeric,
)
from quiver_spark.format.reader import read_table
from quiver_spark.format.writer import WriteOptions, write_table

# ---------------------------------------------------------------------------
# Independent golden assemblers (struct.pack loops, no quiver_spark encoders)
# ---------------------------------------------------------------------------

NONE, LZ4, ZSTD, SNAPPY = 0, 1, 2, 3
RLE, DICT, ONE_VALUE, FREQ, BP, DELTA_BP, PATAS = 10, 11, 12, 13, 14, 15, 16


def frame(codec: int, payload: bytes, uncompressed: int) -> bytes:
    """`codec u8 | compressed u32 | uncompressed u32 | payload`
    (src/compression/integer/mod.rs:49-63, read_basic.rs:181-189)."""
    return struct.pack("<BII", codec, len(payload), uncompressed) + payload


def validity_prefix(valid: list[bool]) -> bytes:
    """`def_levels_len u32 | hybrid-RLE bitpacked def levels`
    (write_validity, src/write/serialize.rs:200-215; single bitpacked run —
    read_validity treats RLE runs as unreachable, read_basic.rs:59)."""
    groups = (len(valid) + 7) // 8
    header = bytearray()
    n = (groups << 1) | 1  # ULEB128, LSB=1 → bitpacked run
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            header.append(b | 0x80)
        else:
            header.append(b)
            break
    bits = 0
    for i, v in enumerate(valid):
        if v:
            bits |= 1 << i
    levels = bytes(header) + bits.to_bytes(groups, "little")
    return struct.pack("<I", len(levels)) + levels


def envelope(fields: list[pa.Field], column_pages: list[list[tuple[bytes, int]]]) -> bytes:
    """Full file: magic+pad | per-column contiguous pages | schema (raw
    flatbuffer, arrow2 schema_to_bytes) | meta | sizes | EOS
    (src/write/writer.rs:91-167, write_continuation common.rs:124-128)."""
    buf = bytearray(b"ARROW2\x00\x00")
    metas = []
    for pages in column_pages:
        off = len(buf)
        pm = []
        for pb, nv in pages:
            buf += pb
            pm.append((len(pb), nv))
        metas.append((off, pm))
    schema_bytes = pa.schema(fields).serialize().to_pybytes()[8:]
    buf += schema_bytes
    meta = bytearray(struct.pack("<Q", len(metas)))
    for off, pm in metas:
        meta += struct.pack("<QQ", off, len(pm))
        for ln, nv in pm:
            meta += struct.pack("<QQ", ln, nv)
    buf += meta
    buf += struct.pack("<II", len(schema_bytes), len(meta))
    buf += b"\xff\xff\xff\xff" + struct.pack("<i", 0)
    return bytes(buf)


def ref_rle(values: list, valid: list[bool], pack_value) -> bytes:
    """(count u32, value)* runs; nulls extend the current run and leading
    nulls merge into the first valid run (integer/rle.rs:64-95)."""
    out = bytearray()
    seen = 0
    last = None
    all_null = True
    for v, ok in zip(values, valid):
        if ok:
            if all_null:
                all_null, last, seen = False, v, seen + 1
            elif v != last:
                out += struct.pack("<I", seen) + pack_value(last)
                last, seen = v, 1
            else:
                seen += 1
        else:
            seen += 1
    if seen:
        out += struct.pack("<I", seen) + pack_value(0 if last is None else last)
    return bytes(out)


def ref_roaring(positions: list[int]) -> bytes:
    """Portable roaring, no-run-container flavor (cookie 12346) as
    roaring-rs serialize_into writes it for a small array container."""
    assert all(p < 65536 for p in positions) and positions == sorted(positions)
    out = struct.pack("<II", 12346, 1)  # cookie, 1 container
    out += struct.pack("<HH", 0, len(positions) - 1)  # key, card-1
    out += struct.pack("<I", 16)  # offsets section: container at byte 16
    for p in positions:
        out += struct.pack("<H", p)
    return out


def ref_bitpack_block(vals: list[int], num_bits: int | None = None) -> bytes:
    """One BitPacker4x 128-value block: u8 num_bits + interleaved 4-lane
    packing — lane l carries vals[l::4], each lane's 32 values packed
    LSB-first into num_bits u32 words, output word w = (lane0_w..lane3_w)
    (integer/bp.rs:33-64; bitpacking crate BitPacker4x layout)."""
    assert len(vals) == 128
    if num_bits is None:
        num_bits = max(v.bit_length() for v in vals)
    out = bytearray([num_bits])
    if num_bits == 0:
        return bytes(out)
    lane_words = []
    for lane in range(4):
        stream = 0
        for j, v in enumerate(vals[lane::4]):
            stream |= v << (j * num_bits)
        lane_words.append([(stream >> (32 * w)) & 0xFFFFFFFF for w in range(num_bits)])
    for w in range(num_bits):
        for lane in range(4):
            out += struct.pack("<I", lane_words[lane][w])
    return bytes(out)


def ref_delta_bitpack(vals: list[int]) -> bytes:
    """compress_sorted: per-block, delta word k = V_k - V_{k-1} lane-wise
    (first word subtracts broadcast initial = previous block's last raw
    value); num_bits comes from the RAW chunk (delta_bp.rs:44-64)."""
    out = bytearray()
    initial = 0
    for start in range(0, len(vals), 128):
        chunk = vals[start : start + 128]
        deltas = [
            (v - (chunk[i - 4] if i >= 4 else initial)) & 0xFFFFFFFF
            for i, v in enumerate(chunk)
        ]
        out += ref_bitpack_block(deltas, num_bits=max(v.bit_length() for v in chunk))
        initial = chunk[-1]
    return bytes(out)


def _tz64(x: int) -> int:
    if x == 0:
        return 64
    return (x & -x).bit_length() - 1


def ref_patas(vals: list[float]) -> bytes:
    """Patas XOR ring-buffer encode (double/patas.rs:34-105, pack at
    :144-149): first value raw, then per value u16
    (ref_diff:7 | sig_bytes:3 | trailing_zeros:6) + significant bytes."""
    out = bytearray()
    indices: dict[int, int] = {}
    history: list[int] = []
    for i, v in enumerate(vals):
        bits = struct.unpack("<Q", struct.pack("<d", v))[0]
        if i == 0:
            out += struct.pack("<Q", bits)
        else:
            ref_idx = indices.get(bits, 0)
            if ref_idx > i or (i - ref_idx) >= 128:
                ref_idx = i - 1
            diff = i - ref_idx
            xor = bits ^ history[i - diff]
            tz = _tz64(xor)
            lz = 64 - xor.bit_length() if xor else 64
            is_eq = 1 if tz == 64 else 0
            sig_bits = 0 if is_eq else 64 - tz - lz
            sig_bytes = (sig_bits >> 3) + (1 if sig_bits & 7 else 0)
            out += struct.pack("<H", (diff << 9) | ((sig_bytes & 7) << 6) | (tz - is_eq))
            out += ((xor >> (tz - is_eq)).to_bytes(8, "little"))[:sig_bytes]
        history.append(bits)
        indices[bits] = i
    return bytes(out)


def i32(*vals) -> bytes:
    return struct.pack(f"<{len(vals)}i", *vals)


def i64(*vals) -> bytes:
    return struct.pack(f"<{len(vals)}q", *vals)


def f64(*vals) -> bytes:
    return struct.pack(f"<{len(vals)}d", *vals)


def dec16(v: int) -> bytes:
    return v.to_bytes(16, "little", signed=True)


def _write(tmp_path, name: str, data: bytes) -> str:
    p = str(tmp_path / name)
    with open(p, "wb") as f:
        f.write(data)
    return p


def _col(tbl: pa.Table, name: str) -> list:
    return tbl.column(name).to_pylist()


# ---------------------------------------------------------------------------
# Decode direction: reference-shaped bytes → our reader
# ---------------------------------------------------------------------------


def test_envelope_two_columns_two_pages(tmp_path):
    fields = [pa.field("a", pa.int64(), nullable=False),
              pa.field("b", pa.float64(), nullable=False)]
    a_pages = [(frame(NONE, i64(1, 2, 3), 24), 3), (frame(NONE, i64(4, 5), 16), 2)]
    b_pages = [(frame(NONE, f64(1.5, -2.5, 3.25), 24), 3), (frame(NONE, f64(0.0, 9.75), 16), 2)]
    p = _write(tmp_path, "two.quiver", envelope(fields, [a_pages, b_pages]))
    t = read_table(p)
    assert _col(t, "a") == [1, 2, 3, 4, 5]
    assert _col(t, "b") == [1.5, -2.5, 3.25, 0.0, 9.75]


def test_nullable_int32_basic(tmp_path):
    # junk sentinel (-999) in the values buffer at null slots must be masked
    valid = [True, False, True, True, False]
    page = validity_prefix(valid) + frame(NONE, i32(7, -999, 8, 9, -999), 20)
    fields = [pa.field("a", pa.int32(), nullable=True)]
    p = _write(tmp_path, "nul.quiver", envelope(fields, [[(page, 5)]]))
    assert _col(read_table(p), "a") == [7, None, 8, 9, None]


def test_basic_compressed_codecs(tmp_path):
    raw = i64(*range(100))
    for codec, pa_name in [(LZ4, "lz4_raw"), (ZSTD, "zstd"), (SNAPPY, "snappy")]:
        payload = pa.Codec(pa_name).compress(raw).to_pybytes()
        fields = [pa.field("a", pa.int64(), nullable=False)]
        p = _write(tmp_path, f"c{codec}.quiver",
                   envelope(fields, [[(frame(codec, payload, len(raw)), 100)]]))
        assert _col(read_table(p), "a") == list(range(100))


def test_int_one_value(tmp_path):
    # leading null: OneValue stores the first *valid* value
    # (integer/one_value.rs:63-75)
    valid = [False, True, True, True]
    page = validity_prefix(valid) + frame(ONE_VALUE, i64(42), 32)
    fields = [pa.field("a", pa.int64(), nullable=True)]
    p = _write(tmp_path, "ov.quiver", envelope(fields, [[(page, 4)]]))
    assert _col(read_table(p), "a") == [None, 42, 42, 42]


def test_int_rle_null_run_merge(tmp_path):
    # leading nulls merge into the first valid run; interior nulls extend
    # the current run (integer/rle.rs:64-95)
    vals = [0, 0, 5, 5, 0, 7]
    valid = [False, False, True, True, False, True]
    payload = ref_rle(vals, valid, lambda v: i32(v))
    assert payload == struct.pack("<Ii", 5, 5) + struct.pack("<Ii", 1, 7)
    page = validity_prefix(valid) + frame(RLE, payload, 24)
    fields = [pa.field("a", pa.int32(), nullable=True)]
    p = _write(tmp_path, "rle.quiver", envelope(fields, [[(page, 6)]]))
    assert _col(read_table(p), "a") == [None, None, 5, 5, None, 7]


def test_int_dict_insertion_order(tmp_path):
    # reference dict entries are insertion-ordered (not sorted); null
    # reuses the previous index (integer/dict.rs:44-55)
    indices = frame(NONE, struct.pack("<6I", 0, 1, 0, 0, 1, 1), 24)
    payload = indices + struct.pack("<I", 2) + i32(30, 10)
    valid = [True, True, True, False, True, True]
    page = validity_prefix(valid) + frame(DICT, payload, 24)
    fields = [pa.field("a", pa.int32(), nullable=True)]
    p = _write(tmp_path, "dict.quiver", envelope(fields, [[(page, 6)]]))
    assert _col(read_table(p), "a") == [30, 10, 30, None, 10, 10]


def test_int_freq_with_exceptions(tmp_path):
    # top value + roaring exception positions + recursively-framed
    # exceptions (integer/freq.rs:60-87)
    vals = [100] * 12
    vals[3], vals[8] = 5, 7
    valid = [True] * 11 + [False]
    exceptions = frame(NONE, i32(5, 7), 8)
    payload = i32(100) + struct.pack("<I", len(ref_roaring([3, 8]))) + ref_roaring([3, 8]) + exceptions
    page = validity_prefix(valid) + frame(FREQ, payload, 48)
    fields = [pa.field("a", pa.int32(), nullable=True)]
    p = _write(tmp_path, "freq.quiver", envelope(fields, [[(page, 12)]]))
    expect = [100] * 12
    expect[3], expect[8] = 5, 7
    expect[11] = None
    assert _col(read_table(p), "a") == expect


def test_int_bitpacking_two_blocks(tmp_path):
    rng = np.random.default_rng(7)
    vals = [int(x) for x in rng.integers(0, 2**13, size=128)] + [
        int(x) for x in rng.integers(0, 2**5, size=128)
    ]
    payload = ref_bitpack_block(vals[:128]) + ref_bitpack_block(vals[128:])
    fields = [pa.field("a", pa.int32(), nullable=False)]
    p = _write(tmp_path, "bp.quiver",
               envelope(fields, [[(frame(BP, payload, 1024), 256)]]))
    assert _col(read_table(p), "a") == vals


def test_int_delta_bitpacking_chained_blocks(tmp_path):
    rng = np.random.default_rng(8)
    vals = np.cumsum(rng.integers(0, 9, size=256)).astype(int).tolist()
    payload = ref_delta_bitpack(vals)
    fields = [pa.field("a", pa.int32(), nullable=False)]
    p = _write(tmp_path, "dbp.quiver",
               envelope(fields, [[(frame(DELTA_BP, payload, 1024), 256)]]))
    assert _col(read_table(p), "a") == vals


def test_double_one_value_and_rle(tmp_path):
    ov_page = frame(ONE_VALUE, f64(2.5), 32)
    rle_payload = ref_rle([1.5, 1.5, 1.5, -4.25], [True] * 4, lambda v: f64(v))
    rle_page = frame(RLE, rle_payload, 32)
    fields = [pa.field("a", pa.float64(), nullable=False),
              pa.field("b", pa.float64(), nullable=False)]
    p = _write(tmp_path, "dbl.quiver",
               envelope(fields, [[(ov_page, 4)], [(rle_page, 4)]]))
    t = read_table(p)
    assert _col(t, "a") == [2.5] * 4
    assert _col(t, "b") == [1.5, 1.5, 1.5, -4.25]


def test_double_patas(tmp_path):
    vals = [1.5, 1.5, 2.25, 1.5, -17.125, 2.25, 2.25, 1e300, 0.0, 1.5]
    payload = ref_patas(vals)
    fields = [pa.field("a", pa.float64(), nullable=False)]
    p = _write(tmp_path, "patas.quiver",
               envelope(fields, [[(frame(PATAS, payload, 80), 10)]]))
    assert _col(read_table(p), "a") == vals


def test_utf8_basic_two_pages_offset_rebase(tmp_path):
    # binary basic pages = two back-to-back frames (offsets re-based to 0,
    # then values); cross-page offsets are fixed up on read
    # (binary/mod.rs:42-90,136-144)
    def bin_page(strs: list[str]) -> bytes:
        offs, total = [0], 0
        for s in strs:
            total += len(s.encode())
            offs.append(total)
        data = "".join(strs).encode()
        return (frame(NONE, struct.pack(f"<{len(offs)}i", *offs), 4 * len(offs))
                + frame(NONE, data, len(data)))

    fields = [pa.field("s", pa.string(), nullable=False)]
    pages = [(bin_page(["ab", "", "cde"]), 3), (bin_page(["fg", "hij"]), 2)]
    p = _write(tmp_path, "str.quiver", envelope(fields, [pages]))
    assert _col(read_table(p), "s") == ["ab", "", "cde", "fg", "hij"]


def test_binary_one_value(tmp_path):
    # `len u32 | value` (binary/one_value.rs:64-69)
    payload = struct.pack("<I", 3) + b"xyz"
    fields = [pa.field("s", pa.string(), nullable=False)]
    p = _write(tmp_path, "bov.quiver",
               envelope(fields, [[(frame(ONE_VALUE, payload, 12), 4)]]))
    assert _col(read_table(p), "s") == ["xyz"] * 4


def test_utf8_freq_plain_exceptions(tmp_path):
    # binary Freq: top_len u64 | top | bm_size u32 | bm | plain exceptions
    # (len u64 | bytes)* — NOT recursively framed (binary/freq.rs:80-100)
    strs = ["hot"] * 9 + ["x", "hot", "yy"]
    positions = [9, 11]
    payload = struct.pack("<Q", 3) + b"hot"
    payload += struct.pack("<I", len(ref_roaring(positions))) + ref_roaring(positions)
    payload += struct.pack("<Q", 1) + b"x" + struct.pack("<Q", 2) + b"yy"
    fields = [pa.field("s", pa.string(), nullable=False)]
    p = _write(tmp_path, "bfreq.quiver",
               envelope(fields, [[(frame(FREQ, payload, 30), 12)]]))
    assert _col(read_table(p), "s") == strs


def test_utf8_dict_u64_lengths(tmp_path):
    # binary Dict values are (len u64 | bytes)* in insertion order
    # (binary/dict.rs:78-90)
    indices = frame(NONE, struct.pack("<5I", 0, 1, 1, 0, 2), 20)
    payload = indices + struct.pack("<I", 3)
    for s in [b"bb", b"a", b"ccc"]:
        payload += struct.pack("<Q", len(s)) + s
    fields = [pa.field("s", pa.string(), nullable=False)]
    p = _write(tmp_path, "bdict.quiver",
               envelope(fields, [[(frame(DICT, payload, 9), 5)]]))
    assert _col(read_table(p), "s") == ["bb", "a", "a", "bb", "ccc"]


def test_boolean_basic_onevalue_rle(tmp_path):
    # basic: LSB-first bitmap bytes, uncompressed header = ROW count
    # (boolean/mod.rs:43-60); OneValue: single byte (one_value.rs:44-52);
    # RLE: (count u32, value u8)* (rle.rs:31-66)
    vals = [True, False, True, True, False, False, True, False, True, True]
    bits = 0
    for i, v in enumerate(vals):
        if v:
            bits |= 1 << i
    basic_page = frame(NONE, bits.to_bytes(2, "little"), 10)
    ov_page = frame(ONE_VALUE, b"\x01", 4)
    rle_vals = [True, True, False, False, False, True]
    rle_valid = [True, True, False, True, True, True]
    rle_payload = ref_rle(rle_vals, rle_valid, lambda v: bytes([int(v)]))
    rle_page = validity_prefix(rle_valid) + frame(RLE, rle_payload, 6)
    fields = [pa.field("a", pa.bool_(), nullable=False),
              pa.field("b", pa.bool_(), nullable=False),
              pa.field("c", pa.bool_(), nullable=True)]
    # column row counts must agree; pad shorter columns to 10 rows
    ov10 = frame(ONE_VALUE, b"\x01", 4)
    rle10_vals = rle_vals + [True] * 4
    rle10_valid = rle_valid + [True] * 4
    rle10 = validity_prefix(rle10_valid) + frame(
        RLE, ref_rle(rle10_vals, rle10_valid, lambda v: bytes([int(v)])), 10
    )
    p = _write(tmp_path, "bool.quiver",
               envelope(fields, [[(basic_page, 10)], [(ov10, 10)], [(rle10, 10)]]))
    t = read_table(p)
    assert _col(t, "a") == vals
    assert _col(t, "b") == [True] * 10
    assert _col(t, "c") == [True, True, None, False, False, True, True, True, True, True]


def test_null_column_zero_byte_pages(tmp_path):
    # Null pages carry no bytes at all; num_values alone reconstructs the
    # array (write_simple `Null => {}` serialize.rs:63, null.rs:84-89)
    fields = [pa.field("n", pa.null(), nullable=True),
              pa.field("a", pa.int64(), nullable=False)]
    n_pages = [(b"", 3), (b"", 2)]
    a_pages = [(frame(NONE, i64(1, 2, 3), 24), 3), (frame(NONE, i64(4, 5), 16), 2)]
    p = _write(tmp_path, "null.quiver", envelope(fields, [n_pages, a_pages]))
    t = read_table(p)
    assert _col(t, "n") == [None] * 5
    assert _col(t, "a") == [1, 2, 3, 4, 5]


def test_null_column_write_roundtrip_and_bytes(tmp_path):
    t = pa.table({"n": pa.nulls(7), "a": pa.array(range(7), type=pa.int32())})
    t = t.cast(pa.schema([pa.field("n", pa.null(), nullable=True),
                          pa.field("a", pa.int32(), nullable=False)]))
    p = str(tmp_path / "nw.quiver")
    write_table(t, p, WriteOptions(default_codec="none", compress_ratio=None,
                                   max_page_size=4, page_stats=False))
    back = read_table(p)
    assert _col(back, "n") == [None] * 7
    assert _col(back, "a") == list(range(7))
    # byte-identity vs the independent envelope (2 pages of 4+3 rows)
    fields = [pa.field("n", pa.null(), nullable=True),
              pa.field("a", pa.int32(), nullable=False)]
    expect = envelope(fields, [
        [(b"", 4), (b"", 3)],
        [(frame(NONE, i32(0, 1, 2, 3), 16), 4), (frame(NONE, i32(4, 5, 6), 12), 3)],
    ])
    with open(p, "rb") as f:
        assert f.read() == expect


def test_decimal128_fixed_cascade(tmp_path):
    # Int128 leaves run the integer cascade with a 16-byte value slot
    # (integer/traits.rs:30-34, round-tripped by tests/it/io.rs:48-75)
    typ = pa.decimal128(25, 3)
    ov = frame(ONE_VALUE, dec16(12345), 64)
    rle_payload = (struct.pack("<I", 2) + dec16(-7_000_000_000_000_000_000_000)
                   + struct.pack("<I", 2) + dec16(55))
    rle = frame(RLE, rle_payload, 64)
    indices = frame(NONE, struct.pack("<4I", 0, 1, 0, 1), 16)
    dict_payload = indices + struct.pack("<I", 2) + dec16(11) + dec16(-22)
    dic = frame(DICT, dict_payload, 64)
    exceptions = frame(NONE, dec16(999), 16)
    freq_payload = (dec16(10**20) + struct.pack("<I", len(ref_roaring([2])))
                    + ref_roaring([2]) + exceptions)
    frq = frame(FREQ, freq_payload, 64)
    fields = [pa.field(n, typ, nullable=False) for n in ("ov", "rle", "dic", "frq")]
    p = _write(tmp_path, "dec.quiver",
               envelope(fields, [[(ov, 4)], [(rle, 4)], [(dic, 4)], [(frq, 4)]]))
    t = read_table(p)
    from decimal import Decimal

    q = Decimal(1).scaleb(-3)
    assert _col(t, "ov") == [Decimal(12345).scaleb(-3)] * 4
    assert _col(t, "rle") == [Decimal(-7_000_000_000_000_000_000_000).scaleb(-3)] * 2 + [Decimal(55).scaleb(-3)] * 2
    assert _col(t, "dic") == [Decimal(11).scaleb(-3), Decimal(-22).scaleb(-3)] * 2
    assert _col(t, "frq") == [Decimal(10**20).scaleb(-3), Decimal(10**20).scaleb(-3),
                              Decimal(999).scaleb(-3), Decimal(10**20).scaleb(-3)]
    assert q  # silence lints


def ref_levels(levels: list[int], width: int) -> bytes:
    """Hybrid-RLE levels, one bitpacked run at `width` bits LSB-first
    (parquet2 hybrid_rle bitpacked encoding; the reference decodes via
    HybridRleDecoder at read_basic.rs:84-85)."""
    n = len(levels)
    groups = (n + 7) // 8
    header = bytearray()
    h = (groups << 1) | 1
    while True:
        b = h & 0x7F
        h >>= 7
        if h:
            header.append(b | 0x80)
        else:
            header.append(b)
            break
    stream = 0
    for i, v in enumerate(levels):
        stream |= v << (i * width)
    return bytes(header) + stream.to_bytes(groups * width, "little")


def nested_page(rows: int, rep: list[int], rep_w: int, def_: list[int],
                def_w: int, values_frame: bytes) -> bytes:
    """`rows u32 | rep_len u32 | def_len u32 | rep | def | values`
    (write_nested_validity serialize.rs:217-232; the u32 prefix is the ROW
    count, the page meta num_values is the SLOT count, common.rs:79-108)."""
    rep_b = ref_levels(rep, rep_w) if rep_w > 0 else b""
    def_b = ref_levels(def_, def_w) if def_w > 0 else b""
    return (struct.pack("<III", rows, len(rep_b), len(def_b))
            + rep_b + def_b + values_frame)


def test_nested_list_golden(tmp_path):
    # rows: [[1, None, 2], [], None, [3]] — nullable list of nullable int32
    # max_rep=1, max_def=3; slots=6, rows=4; present values [1, 2, 3]
    rep = [0, 1, 1, 0, 0, 0]
    def_ = [3, 2, 3, 1, 0, 3]
    page = nested_page(4, rep, 1, def_, 2, frame(NONE, i32(1, 2, 3), 12))
    fields = [pa.field("l", pa.list_(pa.field("element", pa.int32(),
                                              nullable=True)), nullable=True)]
    p = _write(tmp_path, "nl.quiver", envelope(fields, [[(page, 6)]]))
    assert _col(read_table(p), "l") == [[1, None, 2], [], None, [3]]


def test_nested_struct_zero_width_rep_golden(tmp_path):
    # struct<a int32 nullable> nullable: max_rep=0 → parquet writers emit a
    # ZERO-width rep stream (get_bit_width(0)==0); our reader must treat the
    # empty buffer as all-zero levels. max_def=2; rows=slots=3.
    # rows: [{a: 5}, None, {a: None}] → def [2, 0, 1]
    page = nested_page(3, [], 0, [2, 0, 1], 2, frame(NONE, i32(5), 4))
    fields = [pa.field("s", pa.struct([pa.field("a", pa.int32(),
                                                nullable=True)]), nullable=True)]
    p = _write(tmp_path, "ns.quiver", envelope(fields, [[(page, 3)]]))
    assert _col(read_table(p), "s") == [{"a": 5}, None, {"a": None}]


def test_nested_meta_num_values_is_slot_count(tmp_path):
    """Writer round-trip + meta semantics: nested leaf page metas carry the
    SLOT count (reference common.rs:103-107), the prefix carries rows."""
    from quiver_spark.format.reader import read_meta

    t = pa.table({"l": pa.array([[1, 2, 3], [], [4]],
                                type=pa.list_(pa.int64()))})
    p = str(tmp_path / "slots.quiver")
    write_table(t, p, WriteOptions(default_codec="none", compress_ratio=None,
                                   page_stats=False))
    with open(p, "rb") as f:
        metas = read_meta(f)
    # slots: row0 → 3, row1 (empty) → 1, row2 → 1 ⇒ 5
    assert metas[0].pages[0].num_values == 5
    assert _col(read_table(p), "l") == [[1, 2, 3], [], [4]]


# ---------------------------------------------------------------------------
# Encode direction: our encoders must emit reference-identical bytes for
# the deterministic codecs
# ---------------------------------------------------------------------------


def _force(codec_name: str, default: str = "none") -> CodecOptions:
    all_typed = {"rle", "dict", "one_value", "freq", "bitpacking",
                 "delta_bitpacking", "patas"}
    from quiver_spark.format.constants import NAME_TO_CODEC

    return CodecOptions(
        default_codec=NAME_TO_CODEC[default],
        compress_ratio=1.0,
        forbidden=frozenset(NAME_TO_CODEC[c] for c in all_typed - {codec_name}),
    )


def test_encode_none_frame_bytes():
    vals = np.arange(50, dtype=np.int64)
    opts = CodecOptions(default_codec=NONE, compress_ratio=None, forbidden=frozenset())
    assert encode_numeric(vals, None, opts, False) == frame(NONE, i64(*range(50)), 400)


def test_encode_one_value_bytes():
    vals = np.full(100, 7, dtype=np.int64)
    got = encode_numeric(vals, None, _force("one_value"), False)
    assert got == frame(ONE_VALUE, i64(7), 800)


def test_encode_rle_bytes_nonnull():
    vals = np.array([3] * 60 + [9] * 40, dtype=np.int32)
    got = encode_numeric(vals, None, _force("rle"), False)
    expect = frame(RLE, ref_rle(vals.tolist(), [True] * 100, lambda v: i32(v)), 400)
    assert got == expect


def test_encode_rle_bytes_null_run_merge():
    # leading + interior nulls must merge runs exactly like the reference
    vals = np.array([0, 0, 5, 5, 5, 7, 7, 7], dtype=np.int32)
    valid = np.array([False, False, True, True, False, True, True, True])
    got = encode_numeric(np.where(valid, vals, 0), valid, _force("rle"), False)
    # reference: leading 2 nulls + 5,5 then null extends the 5-run (count 5),
    # then 7,7,7
    expect = frame(RLE, struct.pack("<Ii", 5, 5) + struct.pack("<Ii", 3, 7), 32)
    assert got == expect


def test_encode_bitpacking_bytes():
    rng = np.random.default_rng(11)
    vals = rng.integers(0, 2**9, size=256, dtype=np.int32)
    got = encode_numeric(vals, None, _force("bitpacking"), False)
    expect_payload = (ref_bitpack_block([int(x) for x in vals[:128]])
                      + ref_bitpack_block([int(x) for x in vals[128:]]))
    assert got == frame(BP, expect_payload, 1024)


def test_encode_delta_bitpacking_bytes():
    rng = np.random.default_rng(12)
    vals = np.cumsum(rng.integers(0, 5, size=256)).astype(np.int32)
    got = encode_numeric(vals, None, _force("delta_bitpacking"), False)
    assert got == frame(DELTA_BP, ref_delta_bitpack([int(x) for x in vals]), 1024)


def test_encode_patas_bytes():
    vals = np.array([1.5, 1.5, 2.25, 1.5, -17.125, 2.25, 2.25, 1e300, 0.0, 1.5])
    got = encode_numeric(vals, None, _force("patas"), True)
    assert got == frame(PATAS, ref_patas(vals.tolist()), 80)


def test_encode_boolean_one_value_bytes():
    vals = np.ones(40, dtype=bool)
    got = encode_boolean(vals, None, _force("one_value"))
    assert got == frame(ONE_VALUE, b"\x01", 40)


def test_encode_fixed_one_value_and_rle_bytes():
    rows = np.frombuffer(dec16(42) * 10, dtype=np.uint8).reshape(10, 16)
    got = encode_fixed(rows.copy(), None, _force("one_value"))
    assert got == frame(ONE_VALUE, dec16(42), 160)

    rows2 = np.frombuffer(dec16(1) * 6 + dec16(-2) * 4, dtype=np.uint8).reshape(10, 16)
    got2 = encode_fixed(rows2.copy(), None, _force("rle"))
    expect2 = frame(RLE, struct.pack("<I", 6) + dec16(1) + struct.pack("<I", 4) + dec16(-2), 160)
    assert got2 == expect2


def test_write_table_envelope_bytes(tmp_path):
    """Full-file byte identity for the deterministic None codec: our
    write_table output == the independently assembled reference envelope."""
    t = pa.table({"a": pa.array([1, 2, 3], type=pa.int64())})
    t = t.cast(pa.schema([pa.field("a", pa.int64(), nullable=False)]))
    p = str(tmp_path / "w.quiver")
    write_table(t, p, WriteOptions(default_codec="none", compress_ratio=None,
                                   page_stats=False))
    with open(p, "rb") as f:
        got = f.read()
    fields = [pa.field("a", pa.int64(), nullable=False)]
    expect = envelope(fields, [[(frame(NONE, i64(1, 2, 3), 24), 3)]])
    assert got == expect


def test_validity_prefix_bytes(tmp_path):
    """Nullable page validity prefix byte-identity through write_table."""
    arr = pa.array([5, None, 6], type=pa.int64())
    t = pa.table({"a": arr})
    p = str(tmp_path / "v.quiver")
    write_table(t, p, WriteOptions(default_codec="none", compress_ratio=None,
                                   page_stats=False))
    with open(p, "rb") as f:
        got = f.read()
    page = validity_prefix([True, False, True]) + frame(NONE, i64(5, 0, 6), 24)
    fields = [pa.field("a", pa.int64(), nullable=True)]
    # values at null slots: our writer zero-fills (reference keeps the
    # arrow buffer's contents, which arrow also zero-initializes for
    # freshly-built arrays) — byte-equal for this construction
    expect = envelope(fields, [[(page, 3)]])
    assert got == expect


def test_uint_golden_read_and_spark_widening(tmp_path, spark):
    """Unsigned-int golden files through BOTH boundaries (SURVEY §1.3).

    The reference writes UInt8/16/32/64 leaves through the plain integer
    cascade at their physical width (src/write/primitive.rs:55-70); Spark
    has no unsigned types, so the engine must widen on read —
    uint8→short, uint16→int, uint32→long, uint64→decimal(20,0) — and
    values above the same-width signed max must survive (an overflowing
    LongType map would corrupt uint64 silently)."""
    import struct as _s

    def u(fmt, *vals):
        return b"".join(_s.pack(fmt, v) for v in vals)

    fields = [
        pa.field("u8", pa.uint8(), nullable=False),
        pa.field("u16", pa.uint16(), nullable=False),
        pa.field("u32", pa.uint32(), nullable=False),
        pa.field("u64", pa.uint64(), nullable=False),
    ]
    u8v = [0, 200, 255]
    u16v = [0, 40000, 65535]
    u32v = [0, 3_000_000_000, 4_294_967_295]
    u64v = [0, 10_000_000_000_000_000_000, 18_446_744_073_709_551_615]
    pages = [
        [(frame(NONE, u("<B", *u8v), 3), 3)],
        [(frame(NONE, u("<H", *u16v), 6), 3)],
        [(frame(NONE, u("<I", *u32v), 12), 3)],
        [(frame(NONE, u("<Q", *u64v), 24), 3)],
    ]
    p = _write(tmp_path, "uints.quiver", envelope(fields, pages))

    # format-level read keeps the physical uint types
    t = read_table(p)
    assert t.schema.field("u64").type == pa.uint64()
    assert _col(t, "u8") == u8v
    assert _col(t, "u16") == u16v
    assert _col(t, "u32") == u32v
    assert _col(t, "u64") == u64v

    # Spark boundary widens
    from quiver_spark.sources import register

    register(spark)
    df = spark.read.format("quiver").load(str(tmp_path))
    dt = dict(df.dtypes)
    assert dt == {
        "u8": "smallint",
        "u16": "int",
        "u32": "bigint",
        "u64": "decimal(20,0)",
    }
    rows = sorted(df.collect(), key=lambda r: r.u8)
    import decimal as _d

    assert [r.u8 for r in rows] == u8v
    assert [r.u16 for r in rows] == u16v
    assert [r.u32 for r in rows] == u32v
    assert [r.u64 for r in rows] == [_d.Decimal(v) for v in u64v]
