"""Compaction maintenance: many small files → few row-targeted files, flat
and Hive-partitioned, contents preserved exactly."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from quiver_spark import maintenance
from quiver_spark.sources import register

from conftest import SF_DIR


def _rows(spark, d):
    return sorted(
        map(tuple, spark.read.format("quiver").load(d).collect())
    )


def test_compact_flat_dir(spark, tmp_path):
    register(spark)
    src, dst = str(tmp_path / "small"), str(tmp_path / "big")
    df = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    (
        df.repartition(30)
        .write.format("quiver")
        .mode("overwrite")
        .save(src)
    )
    n_small = len(glob.glob(os.path.join(src, "*.quiver")))
    assert n_small == 30  # one small file per task — the streaming-sink shape
    before = _rows(spark, src)

    out = maintenance.compact(spark, src, dst, target_rows_per_file=100_000)
    assert out["files_before"] == n_small
    assert out["files_after"] < n_small and out["files_after"] <= 2
    assert out["rows"] == out["rows_after"] == len(before)
    assert _rows(spark, dst) == before


def test_compact_partitioned_dir(spark, tmp_path):
    register(spark)
    src, dst = str(tmp_path / "psmall"), str(tmp_path / "pbig")
    df = spark.read.parquet(f"{SF_DIR}/documents.parquet").withColumn(
        "doc_id", F.col("doc_id").cast("long")
    )
    (
        df.repartition(8)
        .write.format("quiver")
        .option("partition_by", "lang")
        .option("max_rows_per_file", "50")
        .mode("overwrite")
        .save(src)
    )
    before = _rows(spark, src)
    out = maintenance.compact(spark, src, dst, target_rows_per_file=100_000)
    assert out["partition_by"] == ["lang"]
    assert out["files_after"] < out["files_before"]
    # layout preserved: lang=... subdirs, no top-level files
    langs = sorted(
        os.path.basename(p)
        for p in glob.glob(os.path.join(dst, "lang=*"))
    )
    assert langs and all(d.startswith("lang=") for d in langs)
    assert not glob.glob(os.path.join(dst, "*.quiver"))
    assert _rows(spark, dst) == before


def test_compact_local_flat(spark, tmp_path):
    register(spark)
    src = str(tmp_path / "lsmall")
    df = spark.read.parquet(f"{SF_DIR}/nation.parquet")
    (
        df.repartition(5)
        .write.format("quiver")
        .mode("overwrite")
        .save(src)
    )
    dst = str(tmp_path / "merged.quiver")
    out = maintenance.compact_local(src, dst)
    assert out["files_before"] == 5 and out["files_after"] == 1
    from quiver_spark.format.reader import read_table

    assert read_table(dst).num_rows == df.count()


def test_compact_local_refuses_partitioned(spark, tmp_path):
    register(spark)
    src = str(tmp_path / "lpart")
    spark.read.parquet(f"{SF_DIR}/documents.parquet").write.format(
        "quiver"
    ).option("partition_by", "lang").mode("overwrite").save(src)
    with pytest.raises(ValueError, match="partitioned"):
        maintenance.compact_local(src, str(tmp_path / "x.quiver"))
