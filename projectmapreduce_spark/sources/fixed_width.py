"""Custom connector via the Python DataSource API (Spark 4) — a
FIXED-WIDTH text reader, the classic mainframe/export record format
Spark has no native source for.

This exercises the engine's connector EXTENSION surface: a data source
written entirely in Python (no JVM code) that plugs into
``spark.read.format(...)`` with schema declaration, one input
partition per file (so a directory of N files scans with N-way
parallelism, exactly like the built-in file sources), and per-partition
iterator reads executed on the workers.

Encoding contract (binary-safe by construction — the reason this
format survives hostile data): every field is hex (strings: UTF-8
bytes hexed then right-padded with spaces; int64: 16 hex chars,
two's-complement; float64: 16 hex chars of the IEEE-754 big-endian
bits, so NaN/±inf/-0.0 round-trip bit-exactly); NULL is the field
width of ``Z`` characters, which can never collide with hex/padding.
Newlines or control characters in the DATA can therefore never break
the LINE framing.

Scale notes: reads stream line-by-line per file (no whole-file
buffering); the planner ships only (path, spec) per partition.  Column
pruning/pushdown are not implemented — a fixed-width record must be
sliced whole anyway, and filters stay in the Spark plan where codegen
runs them (the API's ``pushFilters`` hook is the extension point if a
field-level skip index existed).
"""

from __future__ import annotations

import os
import struct
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType

FORMAT_NAME = "pmr_fixedwidth"


def _field_width(field_type: str, declared: int) -> int:
    if field_type in ("bigint", "long"):
        return 16
    if field_type == "double":
        return 16
    return declared  # string: caller-declared hex width


def encode_long(v) -> str:
    if v is None:
        return "Z" * 16
    return format(v & 0xFFFFFFFFFFFFFFFF, "016x")


def decode_long(s: str):
    if s[0] == "Z":
        return None
    u = int(s, 16)
    return u - (1 << 64) if u >= (1 << 63) else u


def encode_double(v) -> str:
    if v is None:
        return "Z" * 16
    return struct.pack(">d", v).hex()


def decode_double(s: str):
    if s[0] == "Z":
        return None
    return struct.unpack(">d", bytes.fromhex(s))[0]


def encode_string(v, width: int) -> str:
    if v is None:
        return "Z" * width
    h = v.encode("utf-8").hex()
    if len(h) > width:
        raise ValueError(f"string field overflows declared hex width {width}: {v!r}")
    return h.ljust(width)


def decode_string(s: str):
    if s and s[0] == "Z":
        return None
    return bytes.fromhex(s.strip()).decode("utf-8")


class _FilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class FixedWidthReader(DataSourceReader):
    def __init__(self, options: dict, schema: StructType):
        self.path = options["path"]
        # spec: comma-separated per-field "type" or "type:width" (strings)
        parts = options["spec"].split(",")
        if len(parts) != len(schema.fields):
            raise ValueError(
                f"spec has {len(parts)} fields but schema declares "
                f"{len(schema.fields)} — a silent zip-truncation here would "
                "surface as an opaque executor-side row/schema mismatch"
            )
        self.spec = []
        for part, field in zip(parts, schema.fields):
            bits = part.split(":")
            t = bits[0]
            w = _field_width(t, int(bits[1]) if len(bits) > 1 else 0)
            self.spec.append((t, w))

    def partitions(self):
        return [
            _FilePartition(os.path.join(self.path, f))
            for f in sorted(os.listdir(self.path))
            if f.endswith(".txt") and not f.startswith("_")
        ]

    def read(self, partition: _FilePartition) -> Iterator[tuple]:
        decoders = []
        off = 0
        for t, w in self.spec:
            lo, hi = off, off + w
            if t in ("bigint", "long"):
                decoders.append(lambda ln, lo=lo, hi=hi: decode_long(ln[lo:hi]))
            elif t == "double":
                decoders.append(lambda ln, lo=lo, hi=hi: decode_double(ln[lo:hi]))
            else:
                decoders.append(lambda ln, lo=lo, hi=hi: decode_string(ln[lo:hi]))
            off = hi
        with open(partition.path, encoding="ascii") as fh:
            for line in fh:
                line = line.rstrip("\n")
                yield tuple(d(line) for d in decoders)


class FixedWidthDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def schema(self):
        return self.options["ddl"]

    def reader(self, schema: StructType) -> FixedWidthReader:
        return FixedWidthReader(self.options, schema)

    def streamReader(self, schema: StructType) -> "FixedWidthStreamReader":
        return FixedWidthStreamReader(self.options, schema)


def register(spark) -> None:
    spark.dataSource.register(FixedWidthDataSource)


def encode_lines_fn(spec: list[tuple[str, int]]):
    """Build a ``mapInArrow`` kernel turning rows into fixed-width lines
    (the WRITE side, used by the declared round-trip query and tests).
    Arrow, not pandas, deliberately: a pandas float64 column renders
    BOTH null and NaN as NaN, which would conflate a missing balance
    with a NaN balance — ``to_pylist()`` on the Arrow array preserves
    None vs float('nan').  ``spec`` mirrors the reader:
    (type, hex_width_for_strings)."""
    import pyarrow as pa

    def fn(batches):
        for b in batches:
            cols = [c.to_pylist() for c in b.columns]
            lines = []
            for vals in zip(*cols):
                parts = []
                for (t, w), v in zip(spec, vals):
                    if t in ("bigint", "long"):
                        parts.append(encode_long(v))
                    elif t == "double":
                        parts.append(encode_double(v))
                    else:
                        parts.append(encode_string(v, w))
                lines.append("".join(parts))
            yield pa.RecordBatch.from_arrays([pa.array(lines, pa.string())], names=["value"])

    return fn


class FixedWidthStreamReader(DataSourceStreamReader):
    """Streaming read of a fixed-width directory: the OFFSET is the
    count of files consumed (files ordered by name — the writer's
    part-file naming makes that the ingest order), each micro-batch
    plans one InputPartition per newly-visible file, and `read` reuses
    the batch decoder verbatim — the batch/streaming parity Spark's
    own file source has, for a custom Python connector.

    ``filesPerTrigger`` rate-limits how many files each call to
    ``latestOffset`` exposes (the maxFilesPerTrigger analog; 0 =
    everything at once).  Offsets are checkpointed by the engine; a
    restarted query resumes from the committed file count, so replay
    is exactly-once per file.
    """

    def __init__(self, options: dict, schema: StructType):
        self._batch = FixedWidthReader(options, schema)
        self._per_trigger = int(options.get("filesPerTrigger", "0"))

    def _files(self) -> list[str]:
        return [p.path for p in self._batch.partitions()]

    def initialOffset(self) -> dict:
        return {"n_files": 0}

    def latestOffset(self) -> dict:
        n = len(self._files())
        if self._per_trigger > 0:
            cur = getattr(self, "_exposed", 0)
            n = min(cur + self._per_trigger, n)
        self._exposed = n
        return {"n_files": n}

    def partitions(self, start: dict, end: dict):
        # Checkpoint-restart safety: a restarted reader's pacing state
        # (_exposed) restarts at 0, so a paced latestOffset could lag
        # the COMMITTED start offset the engine hands back.  Clamp the
        # pace to the restart point here (partitions() always sees the
        # committed start), so the next latestOffset resumes FROM the
        # checkpoint instead of replaying from zero — the exactly-once
        # resume the class docstring promises.  Pinned by
        # tests/test_streaming.py::test_s21_checkpoint_restart_resumes.
        self._exposed = max(getattr(self, "_exposed", 0), start["n_files"])
        files = self._files()
        return [_FilePartition(p) for p in files[start["n_files"] : end["n_files"]]]

    def read(self, partition: _FilePartition) -> Iterator[tuple]:
        return self._batch.read(partition)

    def commit(self, end: dict) -> None:
        # Monotonic floor for the pacing state (belt to partitions()'s
        # braces — commit may fire without a subsequent partitions call
        # before the next latestOffset on some trigger cadences).
        self._exposed = max(getattr(self, "_exposed", 0), end["n_files"])


def write_supplier_fixed_width(spark, sf_dir: str, path: str, n_files: int = 8):
    """Write the supplier table as ``n_files`` fixed-width text files
    (shared by the s20 batch and s21 streaming round-trip queries and
    their tests).  Returns the data-sized string hex width ``w``; the
    read spec is ``f"long,string:{w},long,double"`` with ddl
    ``s_suppkey bigint, s_name string, s_nationkey bigint,
    s_acctbal double``."""
    import pyspark.sql.functions as F

    from projectmapreduce_spark.io import scan

    sup = scan(spark, sf_dir, "supplier").select(
        "s_suppkey",
        "s_name",
        F.col("s_nationkey").cast("long").alias("s_nationkey"),
        "s_acctbal",
    )
    w = (
        sup.agg(F.max(F.length(F.encode(F.coalesce("s_name", F.lit("")), "utf-8"))))
        .collect()[0][0]
        or 1
    ) * 2
    spec = [("long", 0), ("string", w), ("long", 0), ("double", 0)]
    (
        sup.repartition(n_files)
        .mapInArrow(encode_lines_fn(spec), "value string")
        .write.mode("overwrite")
        .text(path)
    )
    return w


SUPPLIER_DDL = "s_suppkey bigint, s_name string, s_nationkey bigint, s_acctbal double"
