"""Reader robustness: malformed files must fail loudly and promptly.

The reference trusts its own writer; a Spark deployment cannot — at fleet
scale, truncated uploads (killed tasks, partial object-store puts) and
corrupt footers WILL be scanned eventually. Every malformed input must
raise a clean Python exception: no hang, no silent wrong data, no
interpreter crash.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from quiver_spark.format.reader import read_table
from quiver_spark.format.writer import write_table


@pytest.fixture(scope="module")
def sample_file(tmp_path_factory):
    rng = np.random.default_rng(7)
    n = 2000  # keeps the file under the 64 KiB footer tail pre-read, so
    # the whole-file header-magic check is active
    t = pa.table(
        {
            "i": pa.array(rng.integers(0, 100, n), pa.int32()),
            "s": pa.array([f"v{v}" for v in rng.integers(0, 50, n)]),
            "f": pa.array(rng.normal(size=n)),
        }
    )
    path = str(tmp_path_factory.mktemp("robust") / "sample.quiver")
    write_table(t, path)
    with open(path, "rb") as fh:
        return t, path, fh.read()


def test_roundtrip_intact(sample_file):
    t, path, _data = sample_file
    assert read_table(path).equals(t)


def test_truncation_always_raises(sample_file, tmp_path):
    """Any strict prefix of a valid file must raise — a truncated footer
    (or a footer whose offsets point past EOF) must never be interpreted
    as a shorter-but-valid table."""
    _t, _path, data = sample_file
    n = len(data)
    cuts = sorted(
        {0, 1, 7, 8, n // 4, n // 2, 3 * n // 4, n - 32, n - 16, n - 12,
         n - 8, n - 4, n - 1}
    )
    for cut in cuts:
        p = str(tmp_path / f"cut{cut}.quiver")
        with open(p, "wb") as fh:
            fh.write(data[:cut])
        with pytest.raises(Exception):
            read_table(p)


def test_overwritten_footer_raises(sample_file, tmp_path):
    """A file whose tail was overwritten with garbage (partial rewrite)
    must raise. (0xAA fill, not zeros: the EOS trailer legitimately ends
    in four zero bytes.)"""
    _t, _path, data = sample_file
    for tail in (4, 12, 64):
        p = str(tmp_path / f"garbled{tail}.quiver")
        with open(p, "wb") as fh:
            fh.write(data[:-tail] + b"\xaa" * tail)
        with pytest.raises(Exception):
            read_table(p)


def test_wrong_magic_raises(sample_file, tmp_path):
    _t, _path, data = sample_file
    p = str(tmp_path / "magic.quiver")
    with open(p, "wb") as fh:
        fh.write(b"PAR1" + data[4:])
    with pytest.raises(Exception):
        read_table(p)


def test_page_checksum_detects_bit_flip(sample_file, tmp_path):
    """A single flipped byte inside a page body must be caught by the
    sidecar crc32 before the codec layer can decode garbage into
    plausible-looking values."""
    import shutil

    _t, path, data = sample_file
    p = str(tmp_path / "flipped.quiver")
    mid = len(data) // 3  # inside page data, far from header and footer
    with open(p, "wb") as fh:
        fh.write(data[:mid] + bytes([data[mid] ^ 0xFF]) + data[mid + 1 :])
    shutil.copy(path + ".stats.json", p + ".stats.json")
    with pytest.raises(ValueError, match="checksum"):
        read_table(p)


def test_page_checksum_absent_sidecar_still_reads(sample_file, tmp_path):
    """Files without a sidecar (e.g. reference-written) read normally —
    verification only engages when the checksum record exists."""
    import shutil

    t, path, _data = sample_file
    p = str(tmp_path / "nosidecar.quiver")
    shutil.copy(path, p)
    assert read_table(p).equals(t)


def test_stats_off_rewrite_removes_stale_sidecar(tmp_path):
    """Overwriting a file with page_stats=False must remove the previous
    sidecar — its checksums would wrongly reject the healthy new file."""
    from quiver_spark.format.writer import WriteOptions, write_table

    p = str(tmp_path / "rewrite.quiver")
    t1 = pa.table({"i": pa.array(range(1000), pa.int64())})
    write_table(t1, p)  # sidecar with crcs
    t2 = pa.table({"i": pa.array(range(2000), pa.int64())})
    write_table(t2, p, WriteOptions(page_stats=False))
    import os

    assert not os.path.exists(p + ".stats.json")
    assert read_table(p).equals(t2)


def test_shape_mismatched_sidecar_is_ignored(tmp_path):
    """A sidecar whose checksum shape disagrees with the footer (stale
    leftover) must disable verification, not reject or crash."""
    import json

    from quiver_spark.format.writer import write_table

    p = str(tmp_path / "shape.quiver")
    t = pa.table({"i": pa.array(range(1000), pa.int64())})
    write_table(t, p)
    side = p + ".stats.json"
    stats = json.load(open(side))
    stats["page_crc32"] = [[1, 2, 3, 4, 5, 6, 7]]  # wrong page count
    json.dump(stats, open(side, "w"))
    assert read_table(p).equals(t)


def test_short_file_raises_valueerror_everywhere(tmp_path):
    """Files shorter than the 16-byte size trailer must raise the canonical
    'not a quiver file' ValueError from EVERY footer entry point — not the
    OSError a bare seek(-16, 2) would produce (read_meta/infer_schema used
    to seek before the size guard ran)."""
    from quiver_spark.format.reader import infer_schema, read_footer, read_meta

    for size in (0, 1, 10, 15):
        p = str(tmp_path / f"short{size}.quiver")
        with open(p, "wb") as fh:
            fh.write(b"x" * size)
        for entry in (read_meta, infer_schema, read_footer):
            with open(p, "rb") as fh:
                with pytest.raises(ValueError, match="too short"):
                    entry(fh)


def test_sidecar_publish_is_atomic(sample_file, tmp_path):
    """write_sidecar must publish via temp + os.replace: no partially
    written sidecar is ever visible at the final path, and no temp files
    are left behind after a successful publish."""
    import os

    from quiver_spark.format import stats as stats_mod

    _t, path, _data = sample_file
    side = path + stats_mod.STATS_SUFFIX
    assert os.path.exists(side)  # writer published one
    stats = stats_mod.load_sidecar(path)
    stats_mod.write_sidecar(path, stats)  # re-publish over the live one
    assert stats_mod.load_sidecar(path) == stats
    leftovers = [
        f for f in os.listdir(os.path.dirname(path)) if ".tmp." in f
    ]
    assert leftovers == []


def test_random_bytes_never_hang_or_crash(tmp_path):
    """Arbitrary byte blobs handed to the reader must raise a clean Python
    exception — never hang, never return fabricated data, never kill the
    interpreter. (An object store at fleet scale WILL eventually serve
    garbage at a .quiver key.) Deterministic high-volume fuzz: seeded
    random blobs plus adversarial tails that mimic the EOS trailer with
    hostile size fields."""
    import struct

    import numpy as np

    from quiver_spark.format.constants import EOS

    rng = np.random.default_rng(42)
    blobs = [bytes(rng.integers(0, 256, n, dtype=np.uint8)) for n in
             (0, 1, 8, 16, 32, 64, 200, 1000, 5000) for _ in range(8)]
    # adversarial: valid EOS trailer, hostile schema/meta sizes
    for schema_size, meta_size in [
        (0, 0), (1, 1), (2**31 - 1, 2**31 - 1), (0, 2**32 - 9),
        (123456, 0), (0, 123456),
    ]:
        body = bytes(rng.integers(0, 256, 64, dtype=np.uint8))
        blobs.append(
            body + struct.pack("<II", schema_size, meta_size) + EOS
        )
    failures = []
    for i, blob in enumerate(blobs):
        p = str(tmp_path / f"fuzz{i}.quiver")
        with open(p, "wb") as fh:
            fh.write(blob)
        try:
            read_table(p)
            failures.append(i)  # fabricated success on garbage
        except Exception:
            pass  # any clean Python exception is the contract
    assert not failures, f"garbage blobs decoded 'successfully': {failures}"


def test_corrupt_sidecar_never_blocks_reads(sample_file, tmp_path):
    """A garbled/truncated/wrong-shape stats sidecar must only disable
    verification and pruning — the data read itself always succeeds
    (load_sidecar returns None on parse failure; shape-mismatched CRC
    lists are ignored by crcs_if_consistent)."""
    import shutil

    from quiver_spark.format.stats import STATS_SUFFIX

    t, path, _data = sample_file
    for i, garbage in enumerate(
        [b"", b"{", b"\x00\xff\x13garbage", b'{"version": 99}',
         b'{"version": 1, "page_rows": [1], "page_crc32": [[123]]}']
    ):
        p = str(tmp_path / f"side{i}.quiver")
        shutil.copy(path, p)
        with open(p + STATS_SUFFIX, "wb") as fh:
            fh.write(garbage)
        assert read_table(p).equals(t), f"garbage sidecar #{i} broke the read"
