"""Incremental (CDC-lite) scans over the manifest commit sequence.

Pins the contract from sources/manifest.py + maintenance.table_changes:
* every sink commit bumps a monotone ``commit_seq`` and stamps the files
  it published; the sequence survives generation swaps (overwrite seeds
  the fresh manifest's counter from the superseded snapshot's);
* ``.option("changes_since", N)`` scans ONLY files committed after N —
  appends surface exactly the appended rows, copy-on-write rewrites
  surface rewritten files wholesale while carried (hard-linked) files
  keep their original stamp and never reappear;
* files the manifest cannot vouch for are conservatively included
  (at-least-once for change consumers, never silent loss);
* both table formats share the contract.

At 100 TB this is what lets a downstream pipeline process a table's new
data without rescanning the table: the planner reads one manifest and
plans O(changed files), not O(files).
"""

from __future__ import annotations

import os

import pytest

from quiver_spark import maintenance
from quiver_spark.sources.manifest import load_manifest
from quiver_spark.sources.quiver_datasource import _data_root, register

from conftest import SF_DIR


def _write(spark, df, path, mode, fmt="quiver", **options):
    register(spark)
    w = df.write.format(fmt).mode(mode)
    for k, v in options.items():
        w = w.option(k, v)
    w.save(path)


@pytest.fixture(scope="module")
def nation_df(spark):
    return spark.read.parquet(f"{SF_DIR}/nation.parquet")


def test_commit_seq_increments_and_survives_overwrite(
    spark, nation_df, tmp_path
):
    d = str(tmp_path / "t")
    _write(spark, nation_df, d, "overwrite")
    assert maintenance.current_commit(d) == 1
    _write(spark, nation_df.limit(3), d, "append")
    assert maintenance.current_commit(d) == 2
    # overwrite publishes a FRESH generation manifest — the counter must
    # continue, not restart, or consumers' cursors would go backwards
    _write(spark, nation_df.limit(5), d, "overwrite")
    assert maintenance.current_commit(d) == 3
    man = load_manifest(_data_root(d))
    assert man.commit_seq == 3
    assert {e.commit for e in man.entries.values()} == {3}


def test_changes_since_returns_exactly_the_appended_rows(
    spark, nation_df, tmp_path
):
    d = str(tmp_path / "t")
    _write(spark, nation_df.filter("n_nationkey < 10"), d, "overwrite")
    cursor = maintenance.current_commit(d)
    _write(
        spark,
        nation_df.filter("n_nationkey >= 10 and n_nationkey < 20"),
        d,
        "append",
    )
    _write(spark, nation_df.filter("n_nationkey >= 20"), d, "append")
    got = sorted(
        r.n_nationkey
        for r in maintenance.table_changes(spark, d, cursor).collect()
    )
    assert got == list(range(10, 25))
    # cursor at head → empty; cursor 0 → everything
    head = maintenance.current_commit(d)
    assert maintenance.table_changes(spark, d, head).count() == 0
    assert maintenance.table_changes(spark, d, 0).count() == 25


def test_dml_rewrite_changes_exclude_carried_files(spark, nation_df, tmp_path):
    d = str(tmp_path / "t")
    _write(
        spark,
        nation_df.repartitionByRange(5, "n_nationkey"),
        d,
        "overwrite",
    )
    files_before = len(load_manifest(_data_root(d)).entries)
    assert files_before == 5
    cursor = maintenance.current_commit(d)
    res = maintenance.delete_where(spark, d, "n_nationkey = 3")
    assert res["files_rewritten"] < files_before
    changed = (
        spark.read.format("quiver")
        .option("changes_since", str(cursor))
        .option("file_column", "_file")
        .load(d)
    )
    rows = changed.collect()
    # only the rewritten file(s) surface: the deleted key's 5-row
    # neighborhood minus the deleted row — carried files never reappear
    keys = sorted(r.n_nationkey for r in rows)
    assert 3 not in keys
    # rewritten-file rows only, never the whole table
    assert 0 < len(keys) < 20
    # and the carried entries kept their ORIGINAL stamp
    after = load_manifest(_data_root(d))
    assert after.commit_seq == cursor + 1
    carried = [e for e in after.entries.values() if e.commit <= cursor]
    assert len(carried) == res["files_carried"]
    assert len({r._file for r in rows}) == len(after.entries) - len(carried)


def test_unvouched_files_are_conservatively_included(
    spark, nation_df, tmp_path
):
    d = str(tmp_path / "t")
    _write(spark, nation_df, d, "overwrite")
    cursor = maintenance.current_commit(d)
    assert maintenance.table_changes(spark, d, cursor).count() == 0
    # an out-of-band writer (library write_table, older engine) drops a
    # file the manifest doesn't list → it must surface as changed
    import pyarrow as pa

    from quiver_spark.format.writer import WriteOptions, write_table

    root = _data_root(d)
    extra = pa.table(
        {
            "n_nationkey": pa.array([99], pa.int64()),
            "n_name": pa.array(["X"], pa.string()),
            "n_regionkey": pa.array([0], pa.int64()),
            "n_comment": pa.array(["out of band"], pa.string()),
        }
    )
    write_table(extra, os.path.join(root, "oob.quiver"), WriteOptions())
    got = maintenance.table_changes(spark, d, cursor).collect()
    assert [r.n_nationkey for r in got] == [99]


def test_arrow_format_shares_the_contract(spark, nation_df, tmp_path):
    d = str(tmp_path / "t")
    _write(spark, nation_df.filter("n_nationkey < 20"), d, "overwrite",
           fmt="arrowipc")
    cursor = maintenance.current_commit(d)
    _write(spark, nation_df.filter("n_nationkey >= 20"), d, "append",
           fmt="arrowipc")
    got = sorted(
        r.n_nationkey
        for r in maintenance.table_changes(
            spark, d, cursor, format="arrowipc"
        ).collect()
    )
    assert got == list(range(20, 25))


def test_rebuild_resets_to_baseline(spark, nation_df, tmp_path):
    d = str(tmp_path / "t")
    _write(spark, nation_df, d, "overwrite")
    assert maintenance.current_commit(d) == 1
    from quiver_spark.sources.manifest import rebuild_manifest

    rebuild_manifest(_data_root(d))
    assert maintenance.current_commit(d) == 0
    assert maintenance.table_changes(spark, d, 0).count() == 0
    # the next commit starts the sequence again from the rebuilt baseline
    _write(spark, nation_df.limit(2), d, "append")
    assert maintenance.current_commit(d) == 1
    assert maintenance.table_changes(spark, d, 0).count() == 2
