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

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
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
