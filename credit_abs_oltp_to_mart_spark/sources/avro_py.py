"""Avro landing format without spark-avro: a pure-Python implementation of
the Avro Object Container File spec (read + write) exposed to Spark through
the Python DataSource API.

The reference lands data through Postgres only; Avro is the one common
landing format this environment's Spark build cannot read (no spark-avro
module on the classpath). Rather than stubbing it, the container format is
implemented from the public Avro 1.11 spec: magic ``Obj\\x01``, file
metadata map (``avro.schema`` JSON, ``avro.codec``), 16-byte sync marker,
then blocks of ``(count, size, payload, sync)`` with ``null`` or raw-
``deflate`` codecs. Supported schema surface — records of the primitive
types plus ``[null, T]`` unions — covers what a landing feed carries;
logical types decode as their base primitive.

Scale: one input partition per file (the natural Avro split — blocks
within a file are sequential by design), decoded into Arrow record
batches. ``spark.read.format("avro_py").load(dir)`` after ``register()``.
"""

from __future__ import annotations

import glob as _glob
import io
import json
import os
import struct
import zlib
from typing import Any

MAGIC = b"Obj\x01"

_PRIMITIVES = {"null", "boolean", "int", "long", "float", "double", "bytes", "string"}


# --------------------------------------------------------------------------
# binary codec (Avro spec: zigzag varints, little-endian IEEE floats)
# --------------------------------------------------------------------------

def _write_long(buf: io.BytesIO, n: int) -> None:
    n = (n << 1) ^ (n >> 63)  # zigzag
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            buf.write(bytes([b | 0x80]))
        else:
            buf.write(bytes([b]))
            return


def _read_long(buf: io.BytesIO) -> int:
    shift, acc = 0, 0
    while True:
        raw = buf.read(1)
        if not raw:
            raise EOFError("truncated varint")
        b = raw[0]
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1)  # un-zigzag


def _write_bytes(buf: io.BytesIO, b: bytes) -> None:
    _write_long(buf, len(b))
    buf.write(b)


def _read_bytes(buf: io.BytesIO) -> bytes:
    n = _read_long(buf)
    b = buf.read(n)
    if len(b) != n:
        raise EOFError("truncated bytes")
    return b


def _write_value(buf: io.BytesIO, typ: Any, v: Any) -> None:
    if isinstance(typ, dict):  # {"type": "int", "logicalType": ...}
        return _write_value(buf, typ["type"], v)
    if isinstance(typ, list):  # union — index then branch value
        if v is None and "null" in typ:
            _write_long(buf, typ.index("null"))
            return
        idx = next(i for i, t in enumerate(typ) if t != "null")
        _write_long(buf, idx)
        return _write_value(buf, typ[idx], v)
    if typ == "null":
        return
    if typ == "boolean":
        buf.write(b"\x01" if v else b"\x00")
    elif typ in ("int", "long"):
        _write_long(buf, int(v))
    elif typ == "float":
        buf.write(struct.pack("<f", float(v)))
    elif typ == "double":
        buf.write(struct.pack("<d", float(v)))
    elif typ == "bytes":
        _write_bytes(buf, bytes(v))
    elif typ == "string":
        _write_bytes(buf, v.encode("utf-8"))
    else:
        raise NotImplementedError(f"avro type {typ!r}")


def _read_value(buf: io.BytesIO, typ: Any) -> Any:
    if isinstance(typ, dict):
        return _read_value(buf, typ["type"])
    if isinstance(typ, list):
        idx = _read_long(buf)
        return _read_value(buf, typ[idx])
    if typ == "null":
        return None
    if typ == "boolean":
        return buf.read(1) == b"\x01"
    if typ in ("int", "long"):
        return _read_long(buf)
    if typ == "float":
        return struct.unpack("<f", buf.read(4))[0]
    if typ == "double":
        return struct.unpack("<d", buf.read(8))[0]
    if typ == "bytes":
        return _read_bytes(buf)
    if typ == "string":
        return _read_bytes(buf).decode("utf-8")
    raise NotImplementedError(f"avro type {typ!r}")


# --------------------------------------------------------------------------
# container files
# --------------------------------------------------------------------------

def write_avro(
    path: str,
    schema: dict,
    rows: list[dict],
    *,
    codec: str = "deflate",
    sync: bytes = b"\x00" * 16,
    rows_per_block: int = 1000,
) -> None:
    """Write an Object Container File. ``schema`` is the record schema dict;
    blocks are raw-deflate (wbits=-15, per spec) unless codec='null'."""
    assert codec in ("null", "deflate")
    fields = schema["fields"]
    with open(path, "wb") as f:
        f.write(MAGIC)
        meta = io.BytesIO()
        pairs = {
            "avro.schema": json.dumps(schema).encode(),
            "avro.codec": codec.encode(),
        }
        _write_long(meta, len(pairs))
        for k, v in pairs.items():
            _write_bytes(meta, k.encode())
            _write_bytes(meta, v)
        _write_long(meta, 0)  # end of metadata map
        f.write(meta.getvalue())
        f.write(sync)
        for i in range(0, len(rows), rows_per_block):
            chunk = rows[i : i + rows_per_block]
            payload = io.BytesIO()
            for r in chunk:
                for fld in fields:
                    _write_value(payload, fld["type"], r[fld["name"]])
            data = payload.getvalue()
            if codec == "deflate":
                c = zlib.compressobj(9, zlib.DEFLATED, -15)
                data = c.compress(data) + c.flush()
            head = io.BytesIO()
            _write_long(head, len(chunk))
            _write_long(head, len(data))
            f.write(head.getvalue())
            f.write(data)
            f.write(sync)


def _read_header(buf: io.BytesIO, path: str) -> tuple[dict, str, bytes]:
    """Parse magic + metadata map + sync -> (schema, codec, sync marker)."""
    if buf.read(4) != MAGIC:
        raise ValueError(f"{path}: not an Avro object container file")
    meta: dict[str, bytes] = {}
    while True:
        n = _read_long(buf)
        if n == 0:
            break
        if n < 0:  # negative count: abs items, preceded by a block byte size
            n = -n
            _read_long(buf)
        for _ in range(n):
            k = _read_bytes(buf).decode()
            meta[k] = _read_bytes(buf)
    schema = json.loads(meta["avro.schema"])
    codec = meta.get("avro.codec", b"null").decode()
    if codec not in ("null", "deflate"):
        raise NotImplementedError(f"{path}: avro codec {codec}")
    return schema, codec, buf.read(16)


def read_avro_header(path: str) -> dict:
    """Schema from the file header only — no block decompression/decode.

    Reads just enough leading bytes for the metadata map (schema JSON is
    header-resident per spec), so schema inference on a multi-GB landing
    file stays O(header)."""
    with open(path, "rb") as f:
        head = f.read(1 << 20)  # headers are tiny; 1 MiB is generous
    schema, _, _ = _read_header(io.BytesIO(head), path)
    return schema


def read_avro_file(path: str) -> tuple[dict, list[dict]]:
    """Decode one container file -> (schema dict, rows). Validates magic,
    codec, and every block's sync marker."""
    with open(path, "rb") as f:
        blob = f.read()
    buf = io.BytesIO(blob)
    schema, codec, sync = _read_header(buf, path)
    fields = schema["fields"]
    rows: list[dict] = []
    while buf.tell() < len(blob):
        count = _read_long(buf)
        size = _read_long(buf)
        data = buf.read(size)
        if codec == "deflate":
            data = zlib.decompress(data, -15)
        block = io.BytesIO(data)
        for _ in range(count):
            rows.append(
                {f["name"]: _read_value(block, f["type"]) for f in fields}
            )
        if buf.read(16) != sync:
            raise ValueError(f"{path}: sync marker mismatch (corrupt block)")
    return schema, rows


# --------------------------------------------------------------------------
# Spark integration
# --------------------------------------------------------------------------

def _avro_to_spark_type(typ: Any) -> str:
    if isinstance(typ, dict):
        return _avro_to_spark_type(typ["type"])
    if isinstance(typ, list):
        non_null = [t for t in typ if t != "null"]
        if len(non_null) != 1:
            raise NotImplementedError(f"multi-branch union {typ}")
        return _avro_to_spark_type(non_null[0])
    return {
        "boolean": "boolean", "int": "int", "long": "bigint",
        "float": "float", "double": "double", "bytes": "binary",
        "string": "string",
    }[typ]


def avro_schema_to_ddl(schema: dict) -> str:
    return ", ".join(
        f"{f['name']} {_avro_to_spark_type(f['type'])}" for f in schema["fields"]
    )


def _file_list(path: str) -> list[str]:
    if os.path.isdir(path):
        return sorted(_glob.glob(os.path.join(path, "*.avro")))
    return sorted(_glob.glob(path)) or [path]


def make_avro_datasource():
    """Build the DataSource class lazily (pyspark import stays off the
    module path for pure-codec users)."""
    from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
    from pyspark.sql.types import StructType

    class _FilePartition(InputPartition):
        def __init__(self, path: str):
            self.path = path

    class AvroPyReader(DataSourceReader):
        def __init__(self, options):
            self.path = options.get("path")
            if not self.path:
                raise ValueError("avro_py: .load(path) is required")

        def partitions(self):
            return [_FilePartition(p) for p in _file_list(self.path)]

        def read(self, partition: _FilePartition):
            import pyarrow as pa

            pa_types = {
                "boolean": pa.bool_(), "int": pa.int32(), "long": pa.int64(),
                "float": pa.float32(), "double": pa.float64(),
                "bytes": pa.binary(), "string": pa.string(),
            }

            def _pa_type(typ):
                if isinstance(typ, dict):
                    return _pa_type(typ["type"])
                if isinstance(typ, list):
                    return _pa_type([t for t in typ if t != "null"][0])
                return pa_types[typ]

            schema, rows = read_avro_file(partition.path)
            names = [f["name"] for f in schema["fields"]]
            if rows:
                # explicit Arrow types: the batch must match the DECLARED
                # Spark schema (avro int -> int32, float -> float32), not
                # whatever pa.array would infer from Python ints/floats
                yield pa.record_batch(
                    [
                        pa.array(
                            [r[f["name"]] for r in rows],
                            type=_pa_type(f["type"]),
                        )
                        for f in schema["fields"]
                    ],
                    names=names,
                )

    class AvroPyDataSource(DataSource):
        @classmethod
        def name(cls) -> str:
            return "avro_py"

        def schema(self) -> str | StructType:
            files = _file_list(self.options.get("path", ""))
            if not files:
                raise ValueError("avro_py: no files match path")
            # header-only: do NOT decode the first file's blocks here
            return avro_schema_to_ddl(read_avro_header(files[0]))

        def reader(self, schema: StructType) -> DataSourceReader:
            return AvroPyReader(self.options)

    return AvroPyDataSource


def register(spark) -> None:
    spark.dataSource.register(make_avro_datasource())
