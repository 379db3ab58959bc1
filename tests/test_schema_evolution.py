"""Schema evolution across an accreting quiver directory: files written at
different times may gain or lack columns. Default table schema is the first
file's (parquet's default); merge_schemas=true unions footers; scans
null-fill columns a file lacks and ignore columns beyond the table schema;
type conflicts fail loudly with the file named."""

from __future__ import annotations

import os

import pyarrow as pa
import pytest

from quiver_spark.format.writer import write_table
from quiver_spark.sources import register


def _dir(tmp_path, name, tables):
    d = tmp_path / name
    os.makedirs(d, exist_ok=True)
    for fname, t in tables:
        write_table(t, str(d / fname))
    return str(d)


@pytest.fixture()
def evolved_dir(tmp_path):
    a = pa.table(
        {
            "k": pa.array([1, 2, 3], pa.int64()),
            "s": pa.array(["a", "b", "c"]),
        }
    )
    b = pa.table(
        {
            "k": pa.array([4, 5], pa.int64()),
            "s": pa.array(["d", "e"]),
            "extra": pa.array([1.5, 2.5], pa.float64()),
        }
    )
    return _dir(tmp_path, "evo", [("a.quiver", a), ("b.quiver", b)])


def test_default_schema_is_first_file_extra_ignored(spark, evolved_dir):
    register(spark)
    df = spark.read.format("quiver").load(evolved_dir)
    assert df.columns == ["k", "s"]
    rows = sorted(map(tuple, df.collect()))
    assert rows == [(1, "a"), (2, "b"), (3, "c"), (4, "d"), (5, "e")]


def test_merge_schemas_unions_and_null_fills(spark, evolved_dir):
    register(spark)
    df = (
        spark.read.format("quiver")
        .option("merge_schemas", "true")
        .load(evolved_dir)
    )
    assert df.columns == ["k", "s", "extra"]
    rows = sorted(map(tuple, df.collect()))
    assert rows == [
        (1, "a", None),
        (2, "b", None),
        (3, "c", None),
        (4, "d", 1.5),
        (5, "e", 2.5),
    ]


def test_file_missing_table_column_null_fills(spark, tmp_path):
    register(spark)
    a = pa.table(
        {"k": pa.array([1, 2], pa.int64()), "s": pa.array(["a", "b"])}
    )
    b = pa.table({"k": pa.array([3], pa.int64())})  # dropped column s
    d = _dir(tmp_path, "dropped", [("a.quiver", a), ("b.quiver", b)])
    df = spark.read.format("quiver").load(d)
    rows = sorted(map(tuple, df.collect()), key=lambda r: r[0])
    assert rows == [(1, "a"), (2, "b"), (3, None)]


def test_type_conflict_fails_loudly(spark, tmp_path):
    register(spark)
    a = pa.table({"k": pa.array([1], pa.int64())})
    b = pa.table({"k": pa.array(["oops"])})
    d = _dir(tmp_path, "conflict", [("a.quiver", a), ("b.quiver", b)])
    with pytest.raises(Exception, match="merge_schemas type conflict"):
        (
            spark.read.format("quiver")
            .option("merge_schemas", "true")
            .load(d)
            .collect()
        )
    with pytest.raises(Exception, match="type conflict|SCHEMA"):
        spark.read.format("quiver").load(d).collect()


def test_projection_of_null_filled_column_only(spark, tmp_path):
    """Selecting ONLY an evolved-away column still returns the right row
    count per file (probe decode supplies row counts)."""
    register(spark)
    a = pa.table(
        {"k": pa.array([1, 2], pa.int64()), "s": pa.array(["a", "b"])}
    )
    b = pa.table({"k": pa.array([3, 4, 5], pa.int64())})
    d = _dir(tmp_path, "projnull", [("a.quiver", a), ("b.quiver", b)])
    df = spark.read.format("quiver").load(d).select("s")
    vals = sorted((r[0] or "~") for r in df.collect())
    assert vals == ["a", "b", "~", "~", "~"]


def test_streaming_read_evolving_dir(spark, tmp_path):
    """The quiver STREAM source must apply the same evolution semantics as
    batch: a file lacking a stream-schema column is null-filled (the
    stream's fixed schema is forwarded to the per-partition reader —
    without that, a late slim file would emit wrong-schema batches)."""
    register(spark)
    a = pa.table(
        {"k": pa.array([1, 2], pa.int64()), "s": pa.array(["a", "b"])}
    )
    b = pa.table({"k": pa.array([3], pa.int64())})
    d = _dir(tmp_path, "stream_evo", [("a.quiver", a), ("b.quiver", b)])
    q = (
        spark.readStream.format("quiver")
        .load(d)
        .writeStream.format("memory")
        .queryName("evo_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt-evo"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = sorted(map(tuple, spark.table("evo_stream").collect()))
    assert rows == [(1, "a"), (2, "b"), (3, None)]


def test_schema_evolution_inside_live_generation(spark, tmp_path):
    """Generations × evolution: an overwrite creates gen-000001; a later
    APPEND with an extra column lands inside the live generation, and
    merge_schemas=true unions the fields with null-fill — the same
    evolution contract as a flat directory, just resolved through the
    pointer."""
    from pyspark.sql import functions as F

    from quiver_spark.sources import register
    from quiver_spark.sources.quiver_datasource import _data_root

    register(spark)
    out = str(tmp_path / "evo_gen")
    spark.range(10).selectExpr("id AS a").write.format("quiver").mode(
        "overwrite"
    ).save(out)
    spark.range(5).selectExpr("id + 100 AS a", "id AS b").write.format(
        "quiver"
    ).mode("append").save(out)
    import os as _os

    # both files live under the single live generation
    gen = _data_root(out)
    assert _os.path.basename(gen) == "gen-000001"
    merged = (
        spark.read.format("quiver")
        .option("merge_schemas", "true")
        .load(out)
    )
    assert sorted(merged.columns) == ["a", "b"]
    assert merged.count() == 15
    assert merged.filter(F.col("b").isNull()).count() == 10
