"""Round-trip tests for the quiver format, mirroring the reference's own
strategy (tests/it/io.rs): seeded random data × codec-forcing matrix ×
page sizes, write → read → exact equality. Plus parquet cross-checks on the
driver's testdata."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from quiver_spark.format.reader import read_meta, read_table
from quiver_spark.format.writer import WriteOptions, write_table

RNG = np.random.default_rng(42)


def _random_table(n: int, null_density: float, uniq: int | None) -> pa.Table:
    def maybe_null(arr):
        if null_density == 0:
            return None
        return RNG.random(n) < null_density

    ints = RNG.integers(0, uniq or 2**31, size=n, dtype=np.int64)
    i32 = RNG.integers(0, uniq or 2**20, size=n, dtype=np.int32)
    dbls = np.round(RNG.random(n) * (uniq or 1000), 3)
    flts = dbls.astype(np.float32)
    bools = RNG.integers(0, 2, size=n).astype(bool)
    strs = np.array(
        [f"s{v}" for v in RNG.integers(0, uniq or 10_000, size=n)], dtype=object
    )
    cols = {
        "i64": pa.array(ints, mask=maybe_null(ints)),
        "i32": pa.array(i32, mask=maybe_null(i32)),
        "f64": pa.array(dbls, mask=maybe_null(dbls)),
        "f32": pa.array(flts, mask=maybe_null(flts)),
        "b": pa.array(bools, mask=maybe_null(bools)),
        "s": pa.array(strs, mask=maybe_null(strs), type=pa.string()),
    }
    return pa.table(cols)


def _assert_tables_equal(a: pa.Table, b: pa.Table):
    assert a.schema.names == b.schema.names
    a, b = a.combine_chunks(), b.combine_chunks()
    for name in a.schema.names:
        ca, cb = a.column(name), b.column(name)
        assert ca.to_pylist() == cb.to_pylist(), f"column {name} differs"


CODEC_MATRIX = ["none", "lz4", "zstd", "snappy"]


@pytest.mark.parametrize("codec", CODEC_MATRIX)
@pytest.mark.parametrize("null_density", [0.0, 0.3])
def test_roundtrip_basic_codecs(tmp_path, codec, null_density):
    t = _random_table(5000, null_density, None)
    path = str(tmp_path / "t.quiver")
    write_table(
        t, path, WriteOptions(default_codec=codec, compress_ratio=None, max_page_size=2048)
    )
    _assert_tables_equal(t, read_table(path))


@pytest.mark.parametrize("null_density", [0.0, 0.2, 0.5])
def test_roundtrip_adaptive(tmp_path, null_density):
    """Adaptive chooser on low-cardinality data → dict/rle/freq pages."""
    t = _random_table(6000, null_density, uniq=8)
    path = str(tmp_path / "t.quiver")
    write_table(t, path, WriteOptions(compress_ratio=2.0, max_page_size=2048))
    _assert_tables_equal(t, read_table(path))


def test_roundtrip_forced_codecs(tmp_path):
    """The analogue of the reference's forced-codec CI matrix
    (STRAWBOAT_* envs, src/util/env.rs:20-24): shrink the candidate set so
    a targeted codec wins, then round-trip."""
    cases = {
        "freq": pa.table(
            {"x": pa.array(np.where(RNG.random(4096) < 0.95, 1000, RNG.integers(0, 1 << 20, 4096)).astype(np.int64))}
        ),
        "dict": pa.table({"x": pa.array(RNG.integers(0, 5, 4096).astype(np.int64))}),
        "rle": pa.table({"x": pa.array(np.repeat(np.arange(16, dtype=np.int64), 256))}),
        "one_value": pa.table({"x": pa.array(np.full(4096, 7, dtype=np.int64))}),
        "bitpacking": pa.table({"x": pa.array(RNG.integers(0, 1 << 10, 4096).astype(np.int32))}),
        "delta_bitpacking": pa.table({"x": pa.array(np.sort(RNG.integers(0, 1 << 20, 4096)).astype(np.int32))}),
    }
    all_codecs = ("rle", "dict", "one_value", "freq", "bitpacking", "delta_bitpacking", "patas")
    for target, table in cases.items():
        forbidden = tuple(c for c in all_codecs if c != target)
        path = "/tmp/forced.quiver"
        write_table(
            table,
            path,
            WriteOptions(compress_ratio=1.01, max_page_size=4096, forbidden=forbidden),
        )
        got = read_table(path)
        _assert_tables_equal(table, got)


def test_roundtrip_string_specials(tmp_path):
    t = pa.table(
        {
            "s": pa.array(["", "a", None, "αβγ", "x" * 1000, "", None, "tail"]),
            "bin": pa.array([b"", b"\x00\xff", None, b"abc", b"", b"z", b"q", None], type=pa.binary()),
        }
    )
    path = str(tmp_path / "t.quiver")
    write_table(t, path, WriteOptions(max_page_size=3))
    _assert_tables_equal(t, read_table(path))


def test_roundtrip_timestamps(tmp_path):
    t = pq.read_table("/root/testdata/sf0.001/lineitem.parquet")
    path = str(tmp_path / "li.quiver")
    write_table(t, path, WriteOptions())
    _assert_tables_equal(t, read_table(path))


def test_roundtrip_all_testdata_flat(tmp_path):
    """Parquet cross-check on every flat driver table (the reference's
    parquet interop examples, examples/strawboat_write.rs:57-67)."""
    for name in ["region", "nation", "customer", "supplier", "part", "orders", "documents"]:
        t = pq.read_table(f"/root/testdata/sf0.001/{name}.parquet")
        path = str(tmp_path / f"{name}.quiver")
        write_table(t, path, WriteOptions())
        _assert_tables_equal(t, read_table(path))


def test_page_range_and_pruning(tmp_path):
    t = _random_table(10_000, 0.1, 100)
    path = str(tmp_path / "t.quiver")
    write_table(t, path, WriteOptions(max_page_size=1000))
    with open(path, "rb") as f:
        metas = read_meta(f)
    assert len(metas[0].pages) == 10
    part = read_table(path, columns=["i64", "s"], page_start=3, page_end=5)
    assert part.num_rows == 2000
    assert part.schema.names == ["i64", "s"]
    expect = t.select(["i64", "s"]).slice(3000, 2000)
    _assert_tables_equal(expect, part)


def test_empty_strings_column_all_null(tmp_path):
    t = pa.table({"s": pa.array([None, None, None], type=pa.string())})
    path = str(tmp_path / "t.quiver")
    write_table(t, path, WriteOptions())
    _assert_tables_equal(t, read_table(path))
