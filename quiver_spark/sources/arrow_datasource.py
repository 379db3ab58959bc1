"""Arrow IPC file format (.arrow, random-access "Feather V2") as a Spark
data source — ``spark.read.format("arrowipc")`` / ``df.write.format(
"arrowipc")``.

Why it exists: the reference format IS Arrow-native (its schema travels as
Arrow IPC bytes, /root/reference/src/write/writer.rs:137-139, and its
arrays are arrow2 arrays), so users of the reference ecosystem hold
datasets in Arrow IPC files — a format Spark cannot read natively. This
source makes them first-class tables next to quiver and parquet.

Design, mirroring the quiver source at the right altitude:

* SPLITS are record-batch ranges. The IPC footer names every batch
  (``RecordBatchFileReader.num_record_batches``); splits cover
  ``[batch_start, batch_end)`` sized by the same dynamic byte floor as the
  quiver planner — clamp(total_bytes / planning_parallelism, 1 MiB,
  partition_bytes) — using file-size/batch-count as the per-batch byte
  estimate (the footer stores no per-batch sizes).
* READS are zero-copy: files open through ``pyarrow.memory_map``, so a
  batch is buffer views over the mapping, and a ``columns`` projection
  selects buffers without touching the rest (IPC stores raw Arrow buffers;
  there is nothing to decode).
* WRITES reuse the quiver sink's whole commit protocol — staged task
  output, atomic generation overwrites, retention/time travel, the
  multi-writer lock/claim/CAS guards (pointer_store.py) — by subclassing
  the writer and swapping only the bytes-on-disk step for
  ``pyarrow.ipc.new_file``. One table layout, two formats.

No statistics exist in IPC footers, so there is no page pruning here;
filters evaluate row-level above the scan (Catalyst), and the format's
role is interop + mmap-fast local pipelines, not selective scans.
"""

from __future__ import annotations

import os
import uuid
from dataclasses import dataclass
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamArrowWriter,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType

from quiver_spark.sources.quiver_datasource import (
    DEFAULT_PARTITION_BYTES,
    QuiverWriter,
    _data_root,
    _list_files_pattern,
    _opt_path,
    _spark_field,
    _spark_schema,
)

FORMAT_NAME = "arrowipc"


def _list_arrow_files(path: str) -> list[str]:
    return _list_files_pattern(_data_root(path), "*.arrow")


def _open_reader(file: str):
    import pyarrow as pa
    import pyarrow.ipc as ipc

    return ipc.open_file(pa.memory_map(file, "r"))


@dataclass
class ArrowIpcPartition(InputPartition):
    file: str
    batch_start: int
    batch_end: int


class ArrowIpcScanReader(DataSourceReader):
    def __init__(self, options, schema: StructType | None):
        self.options = options
        self.path = _data_root(
            _opt_path(options), options.get("version")
        )
        cols = options.get("columns")
        self.columns = (
            [c.strip() for c in cols.split(",")] if cols else None
        )
        self.partition_bytes = int(
            options.get("partition_bytes", DEFAULT_PARTITION_BYTES)
        )
        mpb = options.get("min_partition_bytes")
        self.min_partition_bytes = int(mpb) if mpb is not None else None
        self.planning_parallelism = max(
            1,
            int(
                options.get(
                    "planning_parallelism", str(os.cpu_count() or 8)
                )
            ),
        )

    def partitions(self):
        # pass 1: per-file batch counts + byte estimates (footer-only)
        plans: list[tuple[str, int, float]] = []
        total = 0
        for file in _list_arrow_files(self.path):
            n = _open_reader(file).num_record_batches
            if n == 0:
                continue
            size = os.path.getsize(file)
            plans.append((file, n, size / n))
            total += size
        if self.min_partition_bytes is not None:
            floor = self.min_partition_bytes
        else:
            floor = min(
                max(total // self.planning_parallelism, 1 << 20),
                self.partition_bytes,
            )
        parts: list[ArrowIpcPartition] = []
        for file, n, per_batch in plans:
            # batches per split so each carries ~floor bytes (>=1)
            step = max(1, int(floor // max(per_batch, 1)))
            for s in range(0, n, step):
                parts.append(
                    ArrowIpcPartition(file, s, min(s + step, n))
                )
        if not parts:
            files = _list_arrow_files(self.path)
            anchor = files[0] if files else os.path.join(self.path, "_none")
            parts.append(ArrowIpcPartition(anchor, 0, 0))
        return parts

    def read(self, partition: ArrowIpcPartition) -> Iterator:
        if partition.batch_end <= partition.batch_start:
            return iter(())
        reader = _open_reader(partition.file)

        def gen():
            import pyarrow as pa

            for i in range(partition.batch_start, partition.batch_end):
                batch = reader.get_batch(i)  # buffer views over the mmap
                if self.columns is not None:
                    missing = [
                        c
                        for c in self.columns
                        if c not in batch.schema.names
                    ]
                    if missing:
                        raise ValueError(
                            f"columns {missing} not in {partition.file}; "
                            f"file has {batch.schema.names}"
                        )
                    batch = batch.select(self.columns)
                # foreign-file normalization: cast leaves Spark's Arrow
                # reader rejects (ns timestamps, uints, ...) exactly like
                # the quiver reader does; our own sink's files are
                # already normalized and skip the casts
                casts = [
                    (j, _spark_field(batch.schema.field(j)).type)
                    for j in range(batch.num_columns)
                    if _spark_field(batch.schema.field(j)).type
                    != batch.schema.field(j).type
                ]
                if casts:
                    import pyarrow.compute as pc

                    arrays = list(batch.columns)
                    for j, t in casts:
                        # allow_time_truncate: Spark's timestamp domain is
                        # microseconds — ns fractions are dropped exactly
                        # as Spark's own Arrow ingestion drops them;
                        # value-range overflows still error
                        arrays[j] = pc.cast(
                            arrays[j],
                            options=pc.CastOptions(
                                target_type=t, allow_time_truncate=True
                            ),
                        )
                    batch = pa.RecordBatch.from_arrays(
                        arrays, schema=_spark_schema(batch.schema)
                    )
                yield batch

        return gen()


class ArrowIpcWriter(QuiverWriter):
    """The quiver sink's staged-commit / generation / multi-writer
    machinery with Arrow IPC bytes on disk. Only ``write()`` (the
    task-side bytes step) and the empty-table/file-listing hooks differ;
    overwrite atomicity, retention, time travel, rollback, and the
    concurrency guards are inherited verbatim."""

    DATA_GLOBS = ("*.arrow",)

    def _list_data_files(self) -> list[str]:
        return _list_arrow_files(self.path)

    def _write_empty(self, dst_root: str, arrow_schema) -> None:
        import pyarrow as pa
        import pyarrow.ipc as ipc

        dst = os.path.join(dst_root, f"part-{uuid.uuid4().hex}.arrow")
        with ipc.new_file(dst, arrow_schema) as w:
            w.write_batch(
                pa.RecordBatch.from_arrays(
                    [pa.array([], type=f.type) for f in arrow_schema],
                    schema=arrow_schema,
                )
            )

    def write(self, iterator):
        """One task → one .arrow file of the task's batches (rolling to a
        new file past max_rows, like the quiver writer), staged under the
        hidden `_temporary/` root for the driver-side publish."""
        import pyarrow as pa
        import pyarrow.ipc as ipc

        from quiver_spark.sources.quiver_datasource import (
            _STAGING_DIR,
            QuiverCommit,
        )

        task_dir = os.path.join(self.path, _STAGING_DIR, uuid.uuid4().hex)
        os.makedirs(task_dir, exist_ok=True)
        staged: list[str] = []
        writer = None
        rows = 0

        def roll(schema):
            nonlocal writer, rows
            if writer is not None:
                writer.close()
            rel = f"part-{uuid.uuid4().hex}.arrow"
            staged.append(rel)
            writer = ipc.new_file(os.path.join(task_dir, rel), schema)
            rows = 0

        for batch in iterator:
            if writer is None or rows >= self.max_rows:
                roll(batch.schema)
            writer.write_batch(batch)
            rows += batch.num_rows
        if writer is not None:
            writer.close()
        return QuiverCommit(task_dir=task_dir, files=tuple(staged))


class ArrowIpcDataSource(DataSource):
    """Arrow IPC random-access files as a Spark data source."""

    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def schema(self):
        from pyspark.sql.pandas.types import from_arrow_schema

        path = _opt_path(self.options)
        if not path:
            raise ValueError("arrowipc datasource requires a path")
        path = _data_root(path, self.options.get("version"))
        files = _list_arrow_files(path)
        if not files:
            raise ValueError(f"no .arrow files under {path}")
        arrow_schema = _open_reader(files[0]).schema
        cols = self.options.get("columns")
        if cols:
            keep = [c.strip() for c in cols.split(",")]
            missing = [c for c in keep if c not in arrow_schema.names]
            if missing:
                raise ValueError(
                    f"columns {missing} not in {files[0]}; file has "
                    f"{arrow_schema.names}"
                )
            import pyarrow as pa

            arrow_schema = pa.schema(
                [arrow_schema.field(c) for c in keep]
            )
        # same normalization + NTZ preference as the quiver source: a
        # tz-less Arrow timestamp is a wall-clock reading and must map to
        # TimestampNTZType, not the session-zone TimestampType
        return from_arrow_schema(
            _spark_schema(arrow_schema), prefer_timestamp_ntz=True
        )

    def reader(self, schema: StructType):
        return ArrowIpcScanReader(self.options, schema)

    def writer(self, schema: StructType, overwrite: bool):
        return ArrowIpcWriter(
            self.options, spark_schema=schema, overwrite=overwrite
        )

    def streamWriter(self, schema: StructType, overwrite: bool):  # noqa: N802
        path = _opt_path(self.options)
        if not path:
            raise ValueError("arrowipc datasource requires a path")
        os.makedirs(path, exist_ok=True)
        return ArrowIpcStreamWriter(self.options)

    def streamReader(self, schema: StructType):  # noqa: N802
        return ArrowIpcStreamReader(self.options, schema)


def register_arrow(spark) -> None:
    """Register the arrowipc format with a session (idempotent)."""
    from quiver_spark.sources.quiver_datasource import (
        _REGISTERED_SESSIONS,
        ship_package,
    )

    ship_package(spark)
    key = ("arrowipc", id(spark))
    if key in _REGISTERED_SESSIONS:
        return
    spark.dataSource.register(ArrowIpcDataSource)
    _REGISTERED_SESSIONS.add(key)


class ArrowIpcStreamWriter(ArrowIpcWriter, DataSourceStreamArrowWriter):
    """Streaming sink for .arrow tables: Arrow IPC bytes on disk under
    the quiver streaming sink's per-batch commit-log protocol (replayed
    batches idempotent, aborted batches dropped)."""

    COMMIT_LOG = "_quiver_commits"

    def commit(self, messages, batchId) -> None:  # noqa: N803
        from quiver_spark.sources.quiver_datasource import QuiverStreamWriter

        QuiverStreamWriter.commit(self, messages, batchId)

    def abort(self, messages, batchId) -> None:  # noqa: N803
        QuiverWriter.abort(self, messages)


class ArrowIpcStreamReader(DataSourceStreamReader):
    """Streaming SOURCE over a .arrow directory: micro-batches are deltas
    of the sorted file listing, exactly like the quiver stream source
    (offsets are consumed relative file names; files are immutable once
    committed). Splits are record-batch ranges per new file."""

    def __init__(self, options, schema: StructType):
        from quiver_spark.sources.quiver_datasource import QuiverStreamReader

        # delegate the offset/rate-limit machinery wholesale; only file
        # listing, split planning, and reading are format-specific
        self._inner = QuiverStreamReader(options, schema)
        self._inner._files = self._files  # type: ignore[method-assign]
        self.options = options
        self.schema_struct = schema
        self.path = self._inner.path
        self.partition_bytes = int(
            options.get("partition_bytes", DEFAULT_PARTITION_BYTES)
        )

    def _files(self) -> list[str]:
        return [
            os.path.relpath(f, self.path)
            for f in _list_arrow_files(self.path)
        ]

    def initialOffset(self) -> dict:  # noqa: N802 (Spark API name)
        return self._inner.initialOffset()

    def latestOffset(self) -> dict:  # noqa: N802
        return self._inner.latestOffset()

    def commit(self, end: dict) -> None:
        self._inner.commit(end)

    def stop(self) -> None:
        return None

    def partitions(self, start: dict, end: dict):
        self._inner._advance(start.get("files", []))
        self._inner._advance(end.get("files", []))
        seen = set(start.get("files", []))
        new = [f for f in end.get("files", []) if f not in seen]
        parts: list[ArrowIpcPartition] = []
        for name in new:
            file = os.path.join(self.path, name)
            if not os.path.exists(file):
                continue
            n = _open_reader(file).num_record_batches
            if n == 0:
                continue
            per_batch = os.path.getsize(file) / n
            step = max(1, int(self.partition_bytes // max(per_batch, 1)))
            for s in range(0, n, step):
                parts.append(ArrowIpcPartition(file, s, min(s + step, n)))
        if not parts:
            files = _list_arrow_files(self.path)
            anchor = files[0] if files else os.path.join(self.path, "_none")
            parts.append(ArrowIpcPartition(anchor, 0, 0))
        return parts

    def read(self, partition: ArrowIpcPartition) -> Iterator:
        opts = dict(self.options)
        opts["path"] = self.path
        opts.pop("max_files_per_trigger", None)
        return ArrowIpcScanReader(opts, self.schema_struct).read(partition)
