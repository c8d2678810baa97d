"""Distributed HTTP CSV source — a Spark 4 Python Data Source that closes
the reference's http object-store capability (``/root/reference/
examples/http_csv.py:27-35`` streams CSV over http via DataFusion's object
store) WITHOUT the driver-spool fallback's single-node bottleneck.

How it distributes: the planner issues one HEAD request; when the server
advertises ``Accept-Ranges: bytes``, the file is split into byte-range
partitions and EVERY EXECUTOR fetches its own range with an HTTP ``Range``
header — the same split-at-newline technique Spark's file sources use for
text: each partition skips its first (possibly partial) line and reads
through the first newline PAST its end, so every line lands in exactly one
partition. No Range support (or unknown length) degrades to one partition,
still executor-side, never a driver spool.

Schema: header + sampled type inference (long/double/string) from the
first chunk, so the SQL surface matches a ``spark.read.csv`` with
``inferSchema`` for the common types.
"""

from __future__ import annotations

import io
import urllib.request

from pyspark.sql import types as T
from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

#: target bytes per partition (small default so tests exercise >1 split;
#: production sets option("partition_bytes", 128<<20) or similar).
DEFAULT_PARTITION_BYTES = 4 << 20
_SAMPLE_BYTES = 64 << 10


def _fetch(url: str, start: int | None = None, end: int | None = None,
           timeout: float = 60.0) -> bytes:
    req = urllib.request.Request(url)
    if start is not None:
        req.add_header("Range", f"bytes={start}-{'' if end is None else end}")
    with urllib.request.urlopen(req, timeout=timeout) as resp:  # noqa: S310 - user-supplied source
        return resp.read()


def _probe(url: str, timeout: float = 60.0) -> tuple[int | None, bool]:
    """(content_length, supports_ranges) via one HEAD request."""
    req = urllib.request.Request(url, method="HEAD")
    try:
        with urllib.request.urlopen(req, timeout=timeout) as resp:  # noqa: S310
            length = resp.headers.get("Content-Length")
            ranges = resp.headers.get("Accept-Ranges", "").lower() == "bytes"
            return (int(length) if length else None), ranges
    except Exception:
        return None, False


def _infer_field(values: list[str]) -> T.DataType:
    non_empty = [v for v in values if v != ""]
    if not non_empty:
        return T.StringType()
    try:
        for v in non_empty:
            int(v)
        return T.LongType()
    except ValueError:
        pass
    try:
        for v in non_empty:
            float(v)
        return T.DoubleType()
    except ValueError:
        return T.StringType()


class HttpCsvDataSource(DataSource):
    """``spark.read.format("http_csv").option("url", ...).load()``."""

    @classmethod
    def name(cls) -> str:
        return "http_csv"

    def schema(self):
        import csv

        url = self.options["url"]
        sample = _fetch(url, 0, _SAMPLE_BYTES - 1)
        # drop the trailing (possibly truncated) line of the sample
        text = sample.decode("utf-8", errors="replace")
        lines = text.split("\n")
        if len(lines) > 1:
            lines = lines[:-1]
        rows = list(csv.reader(io.StringIO("\n".join(lines))))
        header, data = rows[0], rows[1:]
        return T.StructType(
            [
                T.StructField(
                    name.strip() or f"_c{i}",
                    _infer_field([r[i] for r in data if i < len(r)]),
                )
                for i, name in enumerate(header)
            ]
        )

    def reader(self, schema):
        return _HttpCsvReader(schema, self.options)


class _HttpCsvReader(DataSourceReader):
    def __init__(self, schema, options):
        self.schema = schema
        self.url = options["url"]
        self.part_bytes = int(
            options.get("partition_bytes", DEFAULT_PARTITION_BYTES)
        )
        self.timeout = float(options.get("timeout", 60.0))

    def partitions(self):
        length, ranged = _probe(self.url, self.timeout)
        if not ranged or not length or length <= self.part_bytes:
            return [InputPartition((0, None))]
        starts = list(range(0, length, self.part_bytes))
        return [
            InputPartition((s, min(s + self.part_bytes, length) - 1))
            for s in starts
        ]

    def read(self, partition):
        import csv

        start, end = partition.value
        if end is None:  # single whole-file partition
            chunk = _fetch(self.url, None, None, self.timeout)
        else:
            # Over-read past the range end to finish the final line; skip
            # the first (possibly partial) line unless we own byte 0. Each
            # line is then emitted by exactly one partition — including the
            # exact-boundary case, where the previous partition's over-read
            # completes the line starting at our first byte.
            body = _fetch(self.url, start, end, self.timeout)
            try:  # past EOF on the last partition -> 416/empty: no tail
                tail = _fetch(self.url, end + 1, end + 1_048_576, self.timeout)
            except Exception:
                tail = b""
            chunk = body + tail.split(b"\n", 1)[0]
        text = chunk.decode("utf-8", errors="replace")
        lines = text.split("\n")
        # start>0: drop the partial first line (owned by the previous
        # partition); start==0: drop the header row.
        lines = lines[1:]
        if lines and lines[-1] == "":
            lines = lines[:-1]
        casts = []
        for f in self.schema.fields:
            if isinstance(f.dataType, T.LongType):
                casts.append(lambda v: int(v) if v != "" else None)
            elif isinstance(f.dataType, T.DoubleType):
                casts.append(lambda v: float(v) if v != "" else None)
            else:
                casts.append(lambda v: v if v != "" else None)
        for row in csv.reader(lines):
            if not row:
                continue
            yield tuple(
                c(row[i]) if i < len(row) else None for i, c in enumerate(casts)
            )


def register_http_csv(spark) -> None:
    """Idempotently register the ``http_csv`` format on a session."""
    spark.dataSource.register(HttpCsvDataSource)
