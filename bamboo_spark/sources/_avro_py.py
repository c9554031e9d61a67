"""Minimal pure-Python Avro container-file decoder.

Implemented from the public Avro 1.x specification
(https://avro.apache.org/docs/current/specification/): container magic
``Obj\\x01``, metadata map with ``avro.schema``/``avro.codec``, 16-byte
sync marker, then blocks of (record count, byte size, payload, sync).
Codecs: null, deflate (raw DEFLATE). Values: zigzag-varint ints/longs,
little-endian IEEE floats, length-prefixed bytes/strings, index-coded
enums/unions, count-block arrays/maps, records as field concatenation.

This is the *fallback* path used when the spark-avro connector jar is not
on the classpath (see avro.py). It decodes on the driver — correctness
parity only; the distributed connector path is the scale path.

Reference behaviors matched (decoder-level): enum → symbol string,
fixed/bytes → bytes, nullable union → None/value
(reference python/bamboo_tests/avro_tests.py:145-197); general
non-nullable unions raise, as in the reference (avro.hpp:56).
"""

from __future__ import annotations

import io
import json
import struct
import zlib
from typing import Any, Dict, List, Tuple

from pyspark.sql import types as T

MAGIC = b"Obj\x01"


class AvroDecodeError(ValueError):
    pass


class _Reader:
    __slots__ = ("buf", "pos")

    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def read(self, n: int) -> bytes:
        out = self.buf[self.pos : self.pos + n]
        if len(out) != n:
            raise AvroDecodeError("Unexpected end of Avro data")
        self.pos += n
        return out

    def at_end(self) -> bool:
        return self.pos >= len(self.buf)

    def read_long(self) -> int:
        shift = 0
        acc = 0
        while True:
            b = self.buf[self.pos]
            self.pos += 1
            acc |= (b & 0x7F) << shift
            if not (b & 0x80):
                break
            shift += 7
        return (acc >> 1) ^ -(acc & 1)  # zigzag

    def read_bytes(self) -> bytes:
        return self.read(self.read_long())

    def read_utf8(self) -> str:
        return self.read_bytes().decode("utf-8")


def _resolve_named(schema: Any, names: Dict[str, Any]) -> Any:
    """Register/replace named-type references."""
    if isinstance(schema, str) and schema in names:
        return names[schema]
    return schema


def _decode_value(r: _Reader, schema: Any, names: Dict[str, Any]) -> Any:
    schema = _resolve_named(schema, names)
    if isinstance(schema, list):  # union
        idx = r.read_long()
        return _decode_value(r, schema[idx], names)
    if isinstance(schema, dict):
        stype = schema["type"]
        if stype == "record":
            if "name" in schema:
                names[schema["name"]] = schema
            return {
                f["name"]: _decode_value(r, f["type"], names)
                for f in schema["fields"]
            }
        if stype == "enum":
            names.setdefault(schema.get("name", ""), schema)
            return schema["symbols"][r.read_long()]
        if stype == "fixed":
            names.setdefault(schema.get("name", ""), schema)
            return r.read(schema["size"])
        if stype == "array":
            out = []
            while True:
                count = r.read_long()
                if count == 0:
                    break
                if count < 0:
                    r.read_long()  # block byte size; unused
                    count = -count
                for _ in range(count):
                    out.append(_decode_value(r, schema["items"], names))
            return out
        if stype == "map":
            out = {}
            while True:
                count = r.read_long()
                if count == 0:
                    break
                if count < 0:
                    r.read_long()
                    count = -count
                for _ in range(count):
                    key = r.read_utf8()
                    out[key] = _decode_value(r, schema["values"], names)
            return out
        return _decode_value(r, stype, names)
    if schema == "null":
        return None
    if schema == "boolean":
        return r.read(1) != b"\x00"
    if schema in ("int", "long"):
        return r.read_long()
    if schema == "float":
        return struct.unpack("<f", r.read(4))[0]
    if schema == "double":
        return struct.unpack("<d", r.read(8))[0]
    if schema == "bytes":
        return r.read_bytes()
    if schema == "string":
        return r.read_utf8()
    raise AvroDecodeError("Unsupported Avro schema: %r" % (schema,))


def decode_container(data: bytes) -> Tuple[List[Any], Any]:
    """Decode a whole container file → (records, parsed schema JSON)."""
    r = _Reader(data)
    if r.read(4) != MAGIC:
        raise AvroDecodeError("Not an Avro container file (bad magic)")
    meta: Dict[str, bytes] = {}
    while True:
        count = r.read_long()
        if count == 0:
            break
        if count < 0:
            r.read_long()
            count = -count
        for _ in range(count):
            key = r.read_utf8()
            meta[key] = r.read_bytes()
    schema = json.loads(meta["avro.schema"])
    codec = meta.get("avro.codec", b"null").decode()
    sync = r.read(16)
    records: List[Any] = []
    names: Dict[str, Any] = {}
    while not r.at_end():
        n = r.read_long()
        size = r.read_long()
        payload = r.read(size)
        if codec == "deflate":
            payload = zlib.decompress(payload, -15)
        elif codec != "null":
            raise AvroDecodeError("Unsupported Avro codec: %s" % codec)
        block = _Reader(payload)
        for _ in range(n):
            records.append(_decode_value(block, schema, names))
        if r.read(16) != sync:
            raise AvroDecodeError("Sync marker mismatch")
    return records, schema


# -- schema mapping ---------------------------------------------------------

_PRIMITIVES = {
    "null": T.NullType(),
    "boolean": T.BooleanType(),
    "int": T.IntegerType(),
    "long": T.LongType(),
    "float": T.FloatType(),
    "double": T.DoubleType(),
    "bytes": T.BinaryType(),
    "string": T.StringType(),
}


def avro_to_spark(schema: Any, names: Dict[str, Any] | None = None) -> T.DataType:
    """Avro schema JSON → Spark DataType (nullable union → nullable field;
    enum → string; fixed → binary; general unions unsupported, matching
    the reference's avro.hpp:56)."""
    names = names if names is not None else {}
    schema = _resolve_named(schema, names)
    if isinstance(schema, list):
        non_null = [s for s in schema if s != "null"]
        if len(non_null) != 1:
            raise AvroDecodeError("General (non-nullable) unions are not supported")
        return avro_to_spark(non_null[0], names)
    if isinstance(schema, dict):
        stype = schema["type"]
        if stype == "record":
            if "name" in schema:
                names[schema["name"]] = schema
            return T.StructType(
                [
                    T.StructField(f["name"], avro_to_spark(f["type"], names), True)
                    for f in schema["fields"]
                ]
            )
        if stype == "enum":
            return T.StringType()
        if stype == "fixed":
            return T.BinaryType()
        if stype == "array":
            return T.ArrayType(avro_to_spark(schema["items"], names), True)
        if stype == "map":
            return T.MapType(T.StringType(), avro_to_spark(schema["values"], names), True)
        return avro_to_spark(stype, names)
    if schema in _PRIMITIVES:
        return _PRIMITIVES[schema]
    raise AvroDecodeError("Unsupported Avro schema: %r" % (schema,))
