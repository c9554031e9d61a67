"""LLM-data-pipeline operators over DataFrames.

These are the engine's extensions beyond the reference's flatten surface
(SURVEY.md §2 end / §7.6): deduplication (exact, n-gram Jaccard,
MinHash-LSH, SimHash, embedding cosine), similarity search, text
analysis, and multimodal-column plumbing. Every operator is declared
with built-in ``pyspark.sql.functions`` (JVM-side, codegen'd) except the
explicitly-marked Pandas-UDF decode paths.

Determinism contract: operators whose outputs are checked against the
DuckDB oracle derive all hashing from ``md5`` (identical in both
engines) or produce outputs verified by exact arithmetic, so LSH-style
candidate pruning never changes the result set — it only prunes work.
"""

from bamboo_spark.operators._cache import release_caches, tracked_persist

__all__ = ["release_caches", "tracked_persist"]
