"""Ingestion-surface demo: every reference source format end to end.

    python examples/sources_demo.py

1. from_json  — document/stream JSON with schema inference.
2. from_avro  — container decode with decode-time clusion pushdown
   (excluded fields never materialized).
3. from_pbd   — protobuf-records container, executor-parallel wire
   decode, proto2 default fill for absent fields.
4. from_arrow — Arrow IPC with type widening.
5. from_object — live Python objects.
6. read_pbd   — multi-file fan-out (one decode task per file).
"""

import io
import json
import os
import struct
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bamboo_spark import (
    from_arrow,
    from_avro,
    from_json,
    from_object,
    from_pbd,
    get_spark,
    read_pbd,
)


def main() -> None:
    spark = get_spark("sources_demo")
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "tests"))
    from test_pbd import _container, _field_desc, _ld, _message_desc, _tag, _varint
    from test_sources import _avro_bytes

    # 1. JSON
    doc = '[{"user": {"name": "ada", "scores": [1, 2]}}, {"user": {"name": "bob", "scores": [3]}}]'
    print("from_json:")
    print(from_json(doc, spark=spark).flatten().to_pandas().to_string(index=False))

    # 2. Avro with pushdown: the excluded field is never even parsed
    schema = {
        "type": "record",
        "name": "r",
        "fields": [
            {"name": "id", "type": "long"},
            {"name": "payload", "type": "string"},
            {"name": "tags", "type": {"type": "array", "items": "string"}},
        ],
    }
    records = [
        {"id": 1, "payload": "big blob we do not want", "tags": ["a", "b"]},
        {"id": 2, "payload": "another blob", "tags": ["c"]},
    ]
    ds = from_avro(_avro_bytes(schema, records), exclude=["payload"], spark=spark)
    print("\nfrom_avro (payload excluded at decode time):")
    print(ds.flatten().to_pandas().to_string(index=False))

    # 3. PBD: absent optional field surfaces its proto2 default
    desc = _message_desc(
        "Rec", [_field_desc("a", 1, 3), _field_desc("s", 2, 9)]
    )
    recs = [_tag(1, 0) + _varint(41)]  # "s" absent → default ""
    print("\nfrom_pbd (proto2 default fill):")
    print(
        from_pbd(_container([desc], "t.Rec", recs), spark=spark)
        .flatten()
        .to_pandas()
        .to_string(index=False)
    )

    # 4. Arrow IPC
    import pyarrow as pa

    table = pa.table({"x": pa.array([1, 2], type=pa.uint32()), "y": ["p", "q"]})
    sink = io.BytesIO()
    with pa.ipc.new_stream(sink, table.schema) as w:
        w.write_table(table)
    print("\nfrom_arrow (uint32 widened):")
    print(from_arrow(sink.getvalue(), spark=spark).flatten().to_pandas().to_string(index=False))

    # 5. live objects
    print("\nfrom_object:")
    print(
        from_object([{"k": "a", "vs": [1.5, 2.5]}], spark=spark)
        .flatten()
        .to_pandas()
        .to_string(index=False)
    )

    # 6. multi-file PBD fan-out
    d = tempfile.mkdtemp()
    for fi in range(3):
        chunk = [_tag(1, 0) + _varint(fi * 10 + i) for i in range(3)]
        with open(os.path.join(d, "part%d.pbd" % fi), "wb") as fh:
            fh.write(_container([_message_desc("Rec", [_field_desc("a", 1, 3)])], "t.Rec", chunk))
    got = sorted(read_pbd(os.path.join(d, "*.pbd"), spark=spark).flatten().to_pandas()["a"])
    print("\nread_pbd over 3 files:", got)


if __name__ == "__main__":
    main()
