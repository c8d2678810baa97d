"""Distributed Arrow IPC *file* source — closes the reference's ArrowExec
surface (``/root/reference/src/util.rs:26,504-507`` walks ArrowExec scan
nodes exactly like Parquet/Csv/NdJson/Avro ones: DataFusion registers
``.arrow`` files as external tables and splits them for parallel scans).
Spark ships no IPC file reader, so this is a Spark 4 Python Data Source —
the same pattern as ``sources/avro.py`` and ``sources/s3store.py``.

How it distributes: the Arrow IPC FILE format ends in a FOOTER listing
every record batch's block offset, so the PLANNER learns the batch count
from the footer alone (memory-mapped, no data bytes touched) and emits one
input partition per contiguous RUN of record batches packed to
``batches_per_partition`` (default 1 — one partition per batch, the same
split unit ArrowExec uses; raise it for files written with tiny batches).
EVERY EXECUTOR memory-maps the file and reads exactly its batches — Arrow
batches pass straight through the Python Data Source Arrow fast path with
ZERO conversion (this is the one source format where the on-disk bytes ARE
the engine's wire format).

A path may be a single file or a directory of ``.arrow``/``.feather``/
``.ipc`` files (the reference's ListingTable shape); schema comes from the
first file's footer. The IPC *stream* format (no footer) is out of scope —
DataFusion's ArrowExec reads the file format too.
"""

from __future__ import annotations

import os

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

ARROW_SUFFIXES = (".arrow", ".feather", ".ipc")


def _list_arrow_files(path: str) -> list[str]:
    if "://" in path and not path.startswith("file://"):
        # Executors open paths with plain os I/O (memory_map), so only
        # local/shared-filesystem paths can work; failing here beats the
        # misleading "no arrow IPC files at s3://..." (advisor round-8).
        raise ValueError(
            f"arrow IPC source is local/shared-filesystem only; got {path!r} "
            "(for object stores, convert to parquet or use register_parquet)"
        )
    path = path[len("file://"):] if path.startswith("file://") else path
    if os.path.isfile(path):
        return [path]
    if os.path.isdir(path):
        out = sorted(
            os.path.join(path, f)
            for f in os.listdir(path)
            if f.endswith(ARROW_SUFFIXES)
        )
        if out:
            return out
    raise FileNotFoundError(f"no arrow IPC files at {path}")


def _open_file(path: str):
    import pyarrow as pa

    # memory_map: footer + requested batches only ever touch the page
    # cache for the bytes actually read.
    return pa.ipc.open_file(pa.memory_map(path))


class ArrowIPCDataSource(DataSource):
    """``spark.read.format("arrowipc").option("path", ...)``."""

    @classmethod
    def name(cls) -> str:
        return "arrowipc"

    def schema(self):
        from pyspark.sql.pandas.types import from_arrow_schema

        files = _list_arrow_files(self.options["path"])
        return from_arrow_schema(_open_file(files[0]).schema)

    def reader(self, schema):
        return _ArrowIPCReader(schema, dict(self.options))


class _ArrowIPCReader(DataSourceReader):
    def __init__(self, schema, options: dict):
        self.schema = schema
        self.options = options
        self.batches_per_partition = int(options.get("batches_per_partition", 1))
        self._parts: list | None = None

    def partitions(self):
        if self._parts is None:
            step = max(1, self.batches_per_partition)
            parts = []
            first_schema = None
            first_file = None
            for f in _list_arrow_files(self.options["path"]):
                reader = _open_file(f)  # footer-only
                # A directory mixing schemas would pass planning (schema()
                # reads only the first footer) and surface as a confusing
                # executor-side batch-schema error; validate every footer
                # here, where they are all opened anyway (advisor round-8).
                if first_schema is None:
                    first_schema, first_file = reader.schema, f
                elif not reader.schema.equals(first_schema):
                    raise ValueError(
                        f"arrow IPC schema mismatch under {self.options['path']!r}: "
                        f"{f} has schema {reader.schema} but {first_file} has "
                        f"{first_schema}; all files in a listing must share one schema"
                    )
                n = reader.num_record_batches
                for start in range(0, n, step):
                    parts.append((f, start, min(start + step, n)))
            self._parts = [InputPartition(p) for p in parts]
        return self._parts

    def read(self, partition):
        path, start, end = partition.value
        reader = _open_file(path)
        for i in range(start, end):
            yield reader.get_batch(i)  # RecordBatch: zero-copy fast path


def register_arrow_ipc(spark) -> None:
    """Idempotently register the ``arrowipc`` format on a session."""
    spark.dataSource.register(ArrowIPCDataSource)
