"""Minimal pure-Python Avro object-container codec (write + read).

Apache Iceberg's manifest lists and manifest files are Avro object
container files (Iceberg table spec, "Manifests" / "Manifest Lists");
this sandbox ships no avro library, so ``linkgraph.iceberg_lite`` needs
its own codec. Everything here follows the public Apache Avro 1.11
specification ("Binary encoding" + "Object Container Files") — zigzag
varint longs, length-prefixed strings/bytes, branch-indexed unions,
blocked arrays/maps, and the ``Obj\\x01`` container framing with a
16-byte sync marker per block.

Scope (deliberately small — what Iceberg metadata needs, nothing more):
- primitives: null, boolean, int, long, float, double, bytes, string
- complex: record, array, map, fixed, and unions (any branch count;
  encode picks "null" for None, else the first structurally-matching
  branch — Iceberg metadata only ever uses ["null", X])
- codecs: "null" (default) and "deflate" (raw RFC-1951 via zlib)
- logicalType attributes pass through untouched (Iceberg encodes e.g.
  timestamps as plain longs)

Schemas are plain parsed-JSON dicts in Avro schema syntax; values are
Python dicts / lists / scalars. Named-type references are resolved
against previously-defined names in document order, as the spec allows.

Reference parity note: the reference repo (sr-murthy/ccm) has no
storage layer at all — this module exists for the north rule's
Iceberg-backed checkpoint/scan mandate (BASELINE.json:6,16), not for
any reference file.
"""

from __future__ import annotations

import io
import json
import os
import struct
import zlib
from typing import Any, BinaryIO, Iterable, Iterator

MAGIC = b"Obj\x01"

# ---------------------------------------------------------------------------
# primitive binary encoding


def _zigzag(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def _unzigzag(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def write_long(out: BinaryIO, n: int) -> None:
    z = _zigzag(n)
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.write(bytes((b | 0x80,)))
        else:
            out.write(bytes((b,)))
            return


def read_long(inp: BinaryIO) -> int:
    shift = 0
    acc = 0
    while True:
        raw = inp.read(1)
        if not raw:
            raise EOFError("truncated varint")
        b = raw[0]
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            return _unzigzag(acc)
        shift += 7


def _write_bytes(out: BinaryIO, b: bytes) -> None:
    write_long(out, len(b))
    out.write(b)


def _read_bytes(inp: BinaryIO) -> bytes:
    n = read_long(inp)
    b = inp.read(n)
    if len(b) != n:
        raise EOFError("truncated bytes")
    return b


# ---------------------------------------------------------------------------
# schema-driven encode / decode


class _Names:
    """Named-type registry: records/fixeds register, strings resolve."""

    def __init__(self) -> None:
        self.defs: dict[str, Any] = {}

    def resolve(self, schema: Any) -> Any:
        if isinstance(schema, str) and schema in self.defs:
            return self.defs[schema]
        return schema

    def register(self, schema: dict) -> None:
        name = schema.get("name")
        if name:
            self.defs[name] = schema
            ns = schema.get("namespace")
            if ns:
                self.defs[f"{ns}.{name}"] = schema


def _type_of(schema: Any) -> Any:
    """Unwrap {"type": "long", "logicalType": ...} style wrappers."""
    if isinstance(schema, dict) and isinstance(schema.get("type"), str) and \
            schema["type"] not in ("record", "array", "map", "fixed", "enum"):
        return schema["type"]
    return schema


def _branch_matches(schema: Any, value: Any, names: _Names) -> bool:
    s = _type_of(names.resolve(schema))
    if s == "null":
        return value is None
    if value is None:
        return False
    if s == "boolean":
        return isinstance(value, bool)
    if s in ("int", "long"):
        return isinstance(value, int) and not isinstance(value, bool)
    if s in ("float", "double"):
        return isinstance(value, (int, float)) and not isinstance(value, bool)
    if s == "string":
        return isinstance(value, str)
    if s == "bytes":
        return isinstance(value, (bytes, bytearray))
    if isinstance(s, dict):
        t = s.get("type")
        if t == "record":
            return isinstance(value, dict)
        if t == "fixed":
            return isinstance(value, (bytes, bytearray))
        if t == "array":
            return isinstance(value, (list, tuple))
        if t == "map":
            return isinstance(value, dict)
    return False


def encode(out: BinaryIO, schema: Any, value: Any,
           names: _Names | None = None) -> None:
    names = names or _Names()
    schema = names.resolve(schema)
    if isinstance(schema, list):  # union: branch index, then value
        for i, branch in enumerate(schema):
            if _branch_matches(branch, value, names):
                write_long(out, i)
                encode(out, branch, value, names)
                return
        raise TypeError(f"no union branch in {schema} matches {value!r}")
    s = _type_of(schema)
    if s == "null":
        return
    if s == "boolean":
        out.write(b"\x01" if value else b"\x00")
    elif s in ("int", "long"):
        write_long(out, int(value))
    elif s == "float":
        out.write(struct.pack("<f", float(value)))
    elif s == "double":
        out.write(struct.pack("<d", float(value)))
    elif s == "bytes":
        _write_bytes(out, bytes(value))
    elif s == "string":
        _write_bytes(out, value.encode("utf-8"))
    elif isinstance(s, dict) and s["type"] == "record":
        names.register(s)
        for f in s["fields"]:
            if f["name"] not in value and "default" in f:
                encode(out, f["type"], f["default"], names)
            else:
                encode(out, f["type"], value[f["name"]], names)
    elif isinstance(s, dict) and s["type"] == "fixed":
        names.register(s)
        b = bytes(value)
        if len(b) != s["size"]:
            raise ValueError(f"fixed size {s['size']} != {len(b)}")
        out.write(b)
    elif isinstance(s, dict) and s["type"] == "array":
        items = list(value)
        if items:
            write_long(out, len(items))
            for it in items:
                encode(out, s["items"], it, names)
        write_long(out, 0)
    elif isinstance(s, dict) and s["type"] == "map":
        if value:
            write_long(out, len(value))
            for k, v in value.items():
                _write_bytes(out, k.encode("utf-8"))
                encode(out, s["values"], v, names)
        write_long(out, 0)
    else:
        raise TypeError(f"unsupported avro schema: {schema!r}")


def decode(inp: BinaryIO, schema: Any, names: _Names | None = None) -> Any:
    names = names or _Names()
    schema = names.resolve(schema)
    if isinstance(schema, list):
        idx = read_long(inp)
        return decode(inp, schema[idx], names)
    s = _type_of(schema)
    if s == "null":
        return None
    if s == "boolean":
        return inp.read(1) == b"\x01"
    if s in ("int", "long"):
        return read_long(inp)
    if s == "float":
        return struct.unpack("<f", inp.read(4))[0]
    if s == "double":
        return struct.unpack("<d", inp.read(8))[0]
    if s == "bytes":
        return _read_bytes(inp)
    if s == "string":
        return _read_bytes(inp).decode("utf-8")
    if isinstance(s, dict) and s["type"] == "record":
        names.register(s)
        return {f["name"]: decode(inp, f["type"], names) for f in s["fields"]}
    if isinstance(s, dict) and s["type"] == "fixed":
        names.register(s)
        return inp.read(s["size"])
    if isinstance(s, dict) and s["type"] == "array":
        out = []
        while True:
            n = read_long(inp)
            if n == 0:
                return out
            if n < 0:  # block with byte-size prefix (spec-legal)
                read_long(inp)
                n = -n
            for _ in range(n):
                out.append(decode(inp, s["items"], names))
    if isinstance(s, dict) and s["type"] == "map":
        out = {}
        while True:
            n = read_long(inp)
            if n == 0:
                return out
            if n < 0:
                read_long(inp)
                n = -n
            for _ in range(n):
                k = _read_bytes(inp).decode("utf-8")
                out[k] = decode(inp, s["values"], names)
    raise TypeError(f"unsupported avro schema: {schema!r}")


# ---------------------------------------------------------------------------
# object container files

_META_SCHEMA = {"type": "map", "values": "bytes"}


def write_container(path: str, schema: dict, records: Iterable[dict],
                    metadata: dict[str, bytes] | None = None,
                    codec: str = "null", sync: bytes | None = None) -> int:
    """Write an Avro object container file; returns its byte length.

    One block holds all records — Iceberg manifests are small relative
    to the data they index, and single-block files are spec-legal.
    """
    if codec not in ("null", "deflate"):
        raise ValueError(f"unsupported codec {codec!r}")
    sync = sync or os.urandom(16)
    meta = {"avro.schema": json.dumps(schema).encode(),
            "avro.codec": codec.encode()}
    meta.update(metadata or {})
    body = io.BytesIO()
    names = _Names()
    count = 0
    for rec in records:
        encode(body, schema, rec, names)
        count += 1
    payload = body.getvalue()
    if codec == "deflate":  # raw RFC-1951 stream per the avro spec
        comp = zlib.compressobj(9, zlib.DEFLATED, -15)
        payload = comp.compress(payload) + comp.flush()
    tmp = f"{path}.tmp"
    with open(tmp, "wb") as f:
        f.write(MAGIC)
        encode(f, _META_SCHEMA, meta)
        f.write(sync)
        if count:
            write_long(f, count)
            write_long(f, len(payload))
            f.write(payload)
            f.write(sync)
    os.replace(tmp, path)
    return os.path.getsize(path)


def read_container(path: str) -> tuple[dict, dict[str, bytes], list[dict]]:
    """Read an Avro object container file → (schema, metadata, records)."""
    with open(path, "rb") as f:
        if f.read(4) != MAGIC:
            raise ValueError(f"{path}: not an avro object container file")
        meta = decode(f, _META_SCHEMA)
        schema = json.loads(meta["avro.schema"])
        codec = meta.get("avro.codec", b"null").decode()
        sync = f.read(16)
        records: list[dict] = []
        names = _Names()
        while True:
            try:
                count = read_long(f)
            except EOFError:
                break
            size = read_long(f)
            payload = f.read(size)
            if codec == "deflate":
                payload = zlib.decompress(payload, -15)
            elif codec != "null":
                raise ValueError(f"unsupported codec {codec!r}")
            buf = io.BytesIO(payload)
            for _ in range(count):
                records.append(decode(buf, schema, names))
            if f.read(16) != sync:
                raise ValueError(f"{path}: bad sync marker")
    return schema, meta, records


def iter_container(path: str) -> Iterator[dict]:
    return iter(read_container(path)[2])
