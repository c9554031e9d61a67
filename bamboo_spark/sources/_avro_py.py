"""Minimal pure-Python Avro container-file decoder.

Implemented from the public Avro 1.x specification
(https://avro.apache.org/docs/current/specification/): container magic
``Obj\\x01``, metadata map with ``avro.schema``/``avro.codec``, 16-byte
sync marker, then blocks of (record count, byte size, payload, sync).
Codecs: null, deflate (raw DEFLATE). Values: zigzag-varint ints/longs,
little-endian IEEE floats, length-prefixed bytes/strings, index-coded
enums/unions, count-block arrays/maps, records as field concatenation.

This is the *fallback* path used when the spark-avro connector jar is not
on the classpath (see avro.py). Execution model: the driver scans only
block headers (count/size varints — payloads skipped), then the value
decode runs on executors inside ``mapInArrow`` over block ranges; Avro
blocks are the natural split unit (spec: each block is independently
decodable after the header). Clusion pushdown happens at decode time:
excluded fields are *walked but never materialized* (``_skip_value`` —
Avro's data-dependent sizes force the walk, but skipped strings/bytes/
subtrees allocate nothing), mirroring the reference's reader-schema
pruning (avro_direct.cpp:107-166).

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
        buf = self.buf
        pos = self.pos
        n = len(buf)
        shift = 0
        acc = 0
        while True:
            if pos >= n:
                raise AvroDecodeError("Unexpected end of Avro data")
            b = buf[pos]
            pos += 1
            acc |= (b & 0x7F) << shift
            if not (b & 0x80):
                break
            shift += 7
            if shift > 70:
                raise AvroDecodeError("Malformed varint in Avro data")
        self.pos = pos
        return (acc >> 1) ^ -(acc & 1)  # zigzag

    def skip(self, n: int) -> None:
        if self.pos + n > len(self.buf):
            raise AvroDecodeError("Unexpected end of Avro data")
        self.pos += n

    def read_bytes(self) -> bytes:
        return self.read(self.read_long())

    def read_utf8(self) -> str:
        try:
            return self.read_bytes().decode("utf-8")
        except UnicodeDecodeError as e:
            raise AvroDecodeError("Invalid UTF-8 in Avro string: %s" % e) from e


def _resolve_named(schema: Any, names: Dict[str, Any]) -> Any:
    """Register/replace named-type references."""
    if isinstance(schema, str) and schema in names:
        return names[schema]
    return schema


def _keeps_avro(schema: Any, fltr: Any, parent_included: bool, names: Dict[str, Any]) -> bool:
    """Mirror of projection._keeps on the Avro schema JSON: a subtree is
    kept iff it contains at least one included leaf. Decode-time pruning
    and the Catalyst nested projection therefore select the same columns."""
    schema = _resolve_named(schema, names)
    included = fltr.include.explicit or (parent_included and not fltr.exclude.explicit)
    if isinstance(schema, list):
        non_null = [s for s in schema if s != "null"]
        return _keeps_avro(non_null[0], fltr, parent_included, names) if len(non_null) == 1 else included
    if isinstance(schema, dict):
        stype = schema["type"]
        if stype == "record":
            return any(
                _keeps_avro(f["type"], fltr.child(f["name"]), included, names)
                for f in schema["fields"]
            )
        if stype == "array":
            return _keeps_avro(schema["items"], fltr, parent_included, names)
        if stype in ("enum", "fixed", "map"):
            return included
        return _keeps_avro(stype, fltr, parent_included, names)
    return included


def _skip_value(r: _Reader, schema: Any, names: Dict[str, Any]) -> None:
    """Advance the reader past one value without materializing anything —
    the decode-time half of clusion pushdown (the walk is forced by
    Avro's data-dependent sizes; allocation is not)."""
    schema = _resolve_named(schema, names)
    if isinstance(schema, list):  # union
        idx = r.read_long()
        if not 0 <= idx < len(schema):
            raise AvroDecodeError("Union branch index %d out of range" % idx)
        _skip_value(r, schema[idx], names)
        return
    if isinstance(schema, dict):
        stype = schema["type"]
        if stype == "record":
            if "name" in schema:
                names[schema["name"]] = schema
            for f in schema["fields"]:
                _skip_value(r, f["type"], names)
            return
        if stype == "enum":
            names.setdefault(schema.get("name", ""), schema)
            r.read_long()
            return
        if stype == "fixed":
            names.setdefault(schema.get("name", ""), schema)
            r.skip(schema["size"])
            return
        if stype == "array":
            while True:
                count = r.read_long()
                if count == 0:
                    return
                if count < 0:
                    # negative count: block byte size follows — jump it
                    r.skip(r.read_long())
                    continue
                for _ in range(count):
                    _skip_value(r, schema["items"], names)
        if stype == "map":
            while True:
                count = r.read_long()
                if count == 0:
                    return
                if count < 0:
                    r.skip(r.read_long())
                    continue
                for _ in range(count):
                    r.skip(r.read_long())  # key
                    _skip_value(r, schema["values"], names)
        _skip_value(r, stype, names)
        return
    if schema == "null":
        return
    if schema == "boolean":
        r.skip(1)
        return
    if schema in ("int", "long"):
        r.read_long()
        return
    if schema == "float":
        r.skip(4)
        return
    if schema == "double":
        r.skip(8)
        return
    if schema in ("bytes", "string"):
        r.skip(r.read_long())
        return
    raise AvroDecodeError("Unsupported Avro schema: %r" % (schema,))


def _decode_value(
    r: _Reader,
    schema: Any,
    names: Dict[str, Any],
    fltr: Any = None,
    parent_included: bool = True,
) -> Any:
    schema = _resolve_named(schema, names)
    if isinstance(schema, list):  # union
        idx = r.read_long()
        if not 0 <= idx < len(schema):
            raise AvroDecodeError("Union branch index %d out of range" % idx)
        return _decode_value(r, schema[idx], names, fltr, parent_included)
    if isinstance(schema, dict):
        stype = schema["type"]
        logical = schema.get("logicalType")
        if logical is not None:
            # logical types decode to Arrow-ready representations with
            # the SAME semantics spark-avro applies (so the fallback and
            # connector paths agree): date → epoch days, timestamps →
            # epoch µs, decimal → two's-complement unscaled → Decimal
            if logical == "date" and stype == "int":
                return r.read_long()
            if logical == "timestamp-micros" and stype == "long":
                return r.read_long()
            if logical == "timestamp-millis" and stype == "long":
                return r.read_long() * 1000
            if logical == "decimal" and stype in ("bytes", "fixed"):
                import decimal as _dec

                raw = (
                    r.read_bytes()
                    if stype == "bytes"
                    else r.read(schema["size"])
                )
                unscaled = int.from_bytes(raw, "big", signed=True)
                return _dec.Decimal(unscaled).scaleb(-schema.get("scale", 0))
            # unknown/unsupported logical annotations fall through to
            # the underlying type (spark-avro behavior)
        if stype == "record":
            if "name" in schema:
                names[schema["name"]] = schema
            if fltr is None:
                return {
                    f["name"]: _decode_value(r, f["type"], names)
                    for f in schema["fields"]
                }
            included = fltr.include.explicit or (
                parent_included and not fltr.exclude.explicit
            )
            out = {}
            for f in schema["fields"]:
                child = fltr.child(f["name"])
                if _keeps_avro(f["type"], child, included, names):
                    out[f["name"]] = _decode_value(r, f["type"], names, child, included)
                else:
                    _skip_value(r, f["type"], names)
            return out
        if stype == "enum":
            names.setdefault(schema.get("name", ""), schema)
            idx = r.read_long()
            if not 0 <= idx < len(schema["symbols"]):
                raise AvroDecodeError("Enum index %d out of range" % idx)
            return schema["symbols"][idx]
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
                    out.append(
                        _decode_value(r, schema["items"], names, fltr, parent_included)
                    )
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
        return _decode_value(r, stype, names, fltr, parent_included)
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


def scan_header(data: bytes) -> Tuple[Any, str, bytes, int]:
    """Parse container magic + metadata map → (schema JSON, codec, sync
    marker, first-block offset). Block payloads are not touched."""
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
    if codec not in ("null", "deflate"):
        raise AvroDecodeError("Unsupported Avro codec: %s" % codec)
    sync = r.read(16)
    return schema, codec, sync, r.pos


def scan_blocks(data: bytes, pos: int, sync: bytes) -> List[Tuple[int, int, int]]:
    """Walk block headers collecting (payload offset, payload size,
    record count) — the metadata pass. Payload bytes are skipped, not
    read; each block is then independently decodable on an executor."""
    r = _Reader(data)
    r.pos = pos
    blocks: List[Tuple[int, int, int]] = []
    while not r.at_end():
        n = r.read_long()
        size = r.read_long()
        blocks.append((r.pos, size, n))
        r.skip(size)
        if r.read(16) != sync:
            raise AvroDecodeError("Sync marker mismatch")
    return blocks


def scan_header_stream(reader) -> Tuple[Any, str, bytes, int]:
    """Streaming twin of ``scan_header`` over a ChunkedReader: reads
    magic + metadata map + sync marker in bounded chunks. Returns
    (schema JSON, codec, sync, first-block offset)."""
    if reader.read(4) != MAGIC:
        raise AvroDecodeError("Not an Avro container file (bad magic)")
    meta: Dict[str, bytes] = {}
    while True:
        count = reader.read_zigzag()
        if count == 0:
            break
        if count < 0:
            reader.read_zigzag()  # block byte size; unused
            count = -count
        for _ in range(count):
            klen = reader.read_zigzag()
            key = reader.read(klen).decode("utf-8")
            vlen = reader.read_zigzag()
            meta[key] = reader.read(vlen)
    schema = json.loads(meta["avro.schema"])
    codec = meta.get("avro.codec", b"null").decode()
    if codec not in ("null", "deflate"):
        raise AvroDecodeError("Unsupported Avro codec: %s" % codec)
    sync = reader.read(16)
    return schema, codec, sync, reader.tell()


def scan_blocks_stream(reader, sync: bytes) -> List[Tuple[int, int, int]]:
    """Streaming twin of ``scan_blocks``: hop block headers, seeking past
    payloads (only the count/size varints and the 16-byte sync marker
    are ever read). Driver memory is O(n_blocks) header tuples plus one
    read buffer — never O(file)."""
    blocks: List[Tuple[int, int, int]] = []
    while not reader.eof():
        n = reader.read_zigzag()
        size = reader.read_zigzag()
        if size < 0:
            raise AvroDecodeError("Negative Avro block size")
        blocks.append((reader.tell(), size, n))
        reader.skip(size)
        if reader.read(16) != sync:
            raise AvroDecodeError("Sync marker mismatch")
    return blocks


def decode_block(
    payload: bytes,
    n: int,
    codec: str,
    schema: Any,
    fltr: Any = None,
    implicit_root: bool = True,
) -> List[Any]:
    """Decode one block's records — the executor-side kernel."""
    if codec == "deflate":
        payload = zlib.decompress(payload, -15)
    block = _Reader(payload)
    names: Dict[str, Any] = {}
    if fltr is None:
        return [_decode_value(block, schema, names) for _ in range(n)]
    return [
        _decode_value(block, schema, names, fltr, implicit_root) for _ in range(n)
    ]


def decode_container(data: bytes, fltr: Any = None, implicit_root: bool = True) -> Tuple[List[Any], Any]:
    """Decode a whole container file → (records, parsed schema JSON)."""
    schema, codec, sync, pos = scan_header(data)
    records: List[Any] = []
    for off, size, n in scan_blocks(data, pos, sync):
        records.extend(
            decode_block(data[off : off + size], n, codec, schema, fltr, implicit_root)
        )
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
        logical = schema.get("logicalType")
        if logical is not None:
            # spark-avro's logical-type mapping
            if logical == "date" and stype == "int":
                return T.DateType()
            if logical in ("timestamp-micros", "timestamp-millis") and stype == "long":
                return T.TimestampType()
            if logical == "decimal" and stype in ("bytes", "fixed"):
                return T.DecimalType(schema.get("precision", 38), schema.get("scale", 0))
            # uuid annotates string → string; time-* fall through to the
            # underlying type (matching spark-avro)
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
