"""Ingestion surface: JSON, Avro, Protobuf(PBD), Arrow, Python objects.

Each source produces a ``Dataset`` over a (possibly nested) DataFrame —
the Spark-side analogue of the reference's ``from_*`` converters
(reference python/bamboo/core.py:30-54). Schema-first formats pre-type
the tree; inference formats union field sets across rows and leave
all-null fields as NullType (≈ IncompleteNode).
"""
