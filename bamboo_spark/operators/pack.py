"""Sequence packing: global token offsets + concat-then-chunk assignment.

The training-data shape: documents are concatenated in a canonical
order (doc_id) and split into fixed-size context windows. The core
primitive is a GLOBAL prefix sum of token counts — the textbook
single-partition window is a scale dead-end (one task sorts the world),
so this implements the canonical distributed two-phase scan:

1. shard by id range (order-respecting partitioning),
2. per-shard local cumulative sums (parallel windows),
3. per-shard totals — P rows — prefix-summed on the driver and joined
   back as broadcast shard bases.

The only global state that ever leaves the executors is one row per
shard. Same output as the single-window plan, bit-for-bit (integer
arithmetic), verified against the DuckDB oracle's global window.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, Window, functions as F


def token_offsets(
    df: DataFrame,
    id_col: str = "doc_id",
    count_expr: Optional[F.Column] = None,
    shards: int = 32,
) -> DataFrame:
    """(id, n_tokens, start_offset) with start_offset = total tokens in
    all lower-id documents — the distributed prefix scan described in
    the module docstring. ``count_expr`` defaults to whitespace token
    count of ``text``."""
    from bamboo_spark.operators._cache import tracked_persist

    n_tokens = (
        count_expr if count_expr is not None else F.size(F.split(F.col("text"), " "))
    ).cast("bigint")
    # persist the NARROW (id, n_tokens) frame BEFORE the metadata agg:
    # the max-id collect, the in-shard window and the shard totals all
    # consume it, and without the cache each consumer re-executes the
    # whole upstream subtree (for q_export_manifest that is the full
    # curation pipeline, 3x) — guide §1.2 / §5: two longs per row,
    # upstream runs once
    counts = tracked_persist(
        df.select(F.col(id_col).alias("id"), n_tokens.alias("n_tokens"))
    )

    # FULLY LAZY (r13): the max-id range probe and the P-row shard-base
    # fold used to be two synchronous driver collects at plan-build
    # time. Both now ride the returned plan — the range comes from a
    # 1-row broadcast aggregate, the ≤``shards`` shard totals
    # prefix-sum in a single-partition window BOUNDED by construction
    # (one row per shard) and broadcast back. Zero driver collects;
    # the offsets are the same exact integers (any monotone range
    # sharding yields identical global prefix sums).
    mm = counts.agg(
        F.expr(
            "greatest(cast(1 as long), cast((max(id) + %d) div %d as long))"
            % (shards, shards)
        ).alias("__width")
    )
    sharded = counts.crossJoin(F.broadcast(mm)).withColumn(
        "shard", F.expr("cast(id div __width as int)")
    )

    w = Window.partitionBy("shard").orderBy("id")
    local = sharded.withColumn(
        "local_end", F.sum("n_tokens").over(w)
    )  # inclusive cumsum within shard

    w_base = Window.orderBy("shard").rowsBetween(
        Window.unboundedPreceding, -1
    )  # single partition of ≤ `shards` rows — bounded by construction
    base_df = (
        sharded.groupBy("shard")
        .agg(F.sum("n_tokens").alias("t"))
        .select(
            "shard",
            F.coalesce(F.sum("t").over(w_base), F.lit(0))
            .cast("long")
            .alias("shard_base"),
        )
    )

    return (
        local.join(F.broadcast(base_df), "shard")
        .select(
            F.col("id").alias(id_col),
            "n_tokens",
            (F.col("shard_base") + F.col("local_end") - F.col("n_tokens")).alias(
                "start_offset"
            ),
        )
    )


def pack_chunks(
    df: DataFrame,
    context_len: int = 2048,
    id_col: str = "doc_id",
    count_expr: Optional[F.Column] = None,
    shards: int = 32,
) -> DataFrame:
    """Concat-then-chunk packing: documents laid end-to-end in id order
    and cut into ``context_len``-token windows. Emits per document its
    first chunk, the chunk its last token lands in, and whether it
    straddles a boundary — the bookkeeping a sequence-packing data
    loader needs to slice documents into training windows."""
    off = token_offsets(df, id_col, count_expr, shards)
    # integer `div`, not float division: offsets must stay exact past 2^53
    first = F.expr("start_offset div %d" % context_len)
    last = F.expr("(start_offset + n_tokens - 1) div %d" % context_len)
    return off.select(
        id_col,
        "n_tokens",
        "start_offset",
        first.alias("chunk_id"),
        last.alias("last_chunk_id"),
        (first != last).cast("bigint").alias("straddles"),
    )


def pack_chunks_duck(context_len: int = 2048) -> str:
    """Oracle: the same offsets via one global window (fine at oracle
    scale; the Spark side exists precisely because this plan isn't)."""
    return """
with c as (
  select doc_id, len(string_split(text, ' '))::BIGINT n_tokens from documents
),
o as (
  select doc_id, n_tokens,
         coalesce(sum(n_tokens) over (order by doc_id
             rows between unbounded preceding and 1 preceding), 0)::BIGINT start_offset
  from c
)
select doc_id, n_tokens, start_offset,
       (start_offset // {L})::BIGINT chunk_id,
       ((start_offset + n_tokens - 1) // {L})::BIGINT last_chunk_id,
       ((start_offset // {L}) != ((start_offset + n_tokens - 1) // {L}))::BIGINT straddles
from o
""".format(L=context_len)


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int = 64,
    stride: int = 48,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Split each document into overlapping token-window chunks — the
    context-window preparation step ahead of tokenization (stride <
    chunk_tokens gives fixed overlap so no span is lost at a boundary).

    Pure array expressions: one split, a ``sequence`` of chunk starts,
    one explode — scan-speed, embarrassingly parallel, no shuffle at
    any corpus size. Emits (doc_id, chunk_id, n_chunk_tokens,
    chunk_text); the final partial window is kept (a trailing remnant
    shorter than the overlap would duplicate the previous chunk's tail
    and is dropped by construction of the start sequence).

    Requires ``0 < stride <= chunk_tokens``: a larger stride would leave
    gaps between windows (spans silently lost), zero would never
    advance.
    """
    if not 0 < stride <= chunk_tokens:
        raise ValueError(
            "chunk_documents requires 0 < stride <= chunk_tokens; got "
            "stride=%d, chunk_tokens=%d" % (stride, chunk_tokens)
        )
    starts = (
        "case when size(__toks) <= {c} then array(0) else "
        "sequence(0, size(__toks) - {o} - 1, {s}) end"
    ).format(c=chunk_tokens, o=chunk_tokens - stride, s=stride)
    return (
        df.selectExpr(id_col, "split(%s, ' ') as __toks" % text_col)
        .selectExpr(id_col, "__toks", "posexplode(%s) as (chunk_id, start)" % starts)
        .selectExpr(
            id_col,
            "cast(chunk_id as bigint) as chunk_id",
            "slice(__toks, start + 1, %d) as __chunk" % chunk_tokens,
        )
        .selectExpr(
            id_col,
            "chunk_id",
            "cast(size(__chunk) as bigint) as n_chunk_tokens",
            "array_join(__chunk, ' ') as chunk_text",
        )
    )


def chunk_documents_duck(chunk_tokens: int = 64, stride: int = 48) -> str:
    """Oracle: same chunk starts via generate_series (1-based lists)."""
    return """
with toks as (select doc_id, string_split(text, ' ') t from documents),
starts as (
  select doc_id, t,
         case when len(t) <= {c} then [0]
              else generate_series(0, len(t) - {o} - 1, {s}) end ss
  from toks
),
ex as (
  select doc_id, t, generate_subscripts(ss, 1) - 1 chunk_id, unnest(ss) st
  from starts
)
select doc_id, chunk_id::BIGINT chunk_id,
       len(t[st + 1 : st + {c}])::BIGINT n_chunk_tokens,
       array_to_string(t[st + 1 : st + {c}], ' ') chunk_text
from ex
order by doc_id, chunk_id
""".format(c=chunk_tokens, o=chunk_tokens - stride, s=stride)


def shard_manifest(
    df: DataFrame,
    shard_tokens: int = 4096,
    id_col: str = "doc_id",
    count_expr: Optional[F.Column] = None,
    shards: int = 32,
) -> DataFrame:
    """Export manifest: assign documents (in canonical id order) to
    fixed-token-budget output shards — the writer-side plan for "emit
    the corpus as N-token files". Built on the same distributed prefix
    scan as ``pack_chunks``: shard id = start_offset div budget, plus
    the in-shard offset a writer needs to lay the doc down without
    re-scanning its predecessors. A document longer than the budget
    still gets one shard id (its start's); ``spans_shards`` flags it
    for the writer's continuation logic.
    """
    off = token_offsets(df, id_col, count_expr, shards)
    first = F.expr("start_offset div %d" % shard_tokens)
    last = F.expr("(start_offset + n_tokens - 1) div %d" % shard_tokens)
    return off.select(
        id_col,
        "n_tokens",
        first.alias("shard_id"),
        (F.col("start_offset") - first * shard_tokens).alias("shard_offset"),
        (last != first).cast("bigint").alias("spans_shards"),
    )


def shard_manifest_duck(shard_tokens: int = 4096, src: str = "documents") -> str:
    """Oracle: the same assignment via one global window. ``src`` lets
    a composed oracle run the manifest over an upstream CTE."""
    return """
with c as (
  select doc_id, len(string_split(text, ' '))::BIGINT n_tokens from {src}
),
o as (
  select doc_id, n_tokens,
         coalesce(sum(n_tokens) over (order by doc_id
             rows between unbounded preceding and 1 preceding), 0)::BIGINT so
  from c
)
select doc_id, n_tokens,
       (so // {s})::BIGINT shard_id,
       (so - (so // {s}) * {s})::BIGINT shard_offset,
       (((so + n_tokens - 1) // {s}) != (so // {s}))::BIGINT spans_shards
from o order by doc_id
""".format(s=shard_tokens, src=src)


def token_offsets_per_key(
    df: DataFrame,
    key_cols,
    id_col: str = "doc_id",
    count_expr: Optional[F.Column] = None,
    shards: int = 32,
) -> DataFrame:
    """Per-key token offsets: ``start_offset`` = tokens in all lower-id
    documents OF THE SAME KEY — the per-dataset packing shape (each
    source/split packs its own context windows independently).

    Unlike the global :func:`token_offsets` (whose P shard totals
    prefix-sum on the driver), this variant is FULLY distributed: the
    per-(key, shard) totals prefix-sum inside a window partitioned by
    key over at most ``shards`` rows per key — thousands of keys never
    funnel anything to the driver, and no window partition ever holds
    more than ``shards`` rows or one (key, shard) slice of documents."""
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    n_tokens = (
        count_expr if count_expr is not None else F.size(F.split(F.col("text"), " "))
    ).cast("bigint")
    from bamboo_spark.operators._cache import tracked_persist

    # same single-execution discipline as token_offsets: narrow frame,
    # persisted once, consumed by the max-id agg + window + totals
    counts = tracked_persist(
        df.select(*keys, F.col(id_col).alias("id"), n_tokens.alias("n_tokens"))
    )
    # lazy range probe (r13): same 1-row broadcast aggregate as
    # token_offsets — no plan-build-time driver collect
    mm = counts.agg(
        F.expr(
            "greatest(cast(1 as long), cast((max(id) + %d) div %d as long))"
            % (shards, shards)
        ).alias("__width")
    )
    sharded = counts.crossJoin(F.broadcast(mm)).withColumn(
        "shard", F.expr("cast(id div __width as int)")
    )
    w_local = Window.partitionBy(*(keys + ["shard"])).orderBy("id")
    local = sharded.withColumn("local_end", F.sum("n_tokens").over(w_local))
    totals = sharded.groupBy(*(keys + ["shard"])).agg(
        F.sum("n_tokens").alias("t")
    )
    w_base = (
        Window.partitionBy(*keys)
        .orderBy("shard")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    bases = totals.withColumn(
        "shard_base", F.coalesce(F.sum("t").over(w_base), F.lit(0))
    ).drop("t")
    return local.join(bases, keys + ["shard"]).select(
        *keys,
        F.col("id").alias(id_col),
        "n_tokens",
        (F.col("shard_base") + F.col("local_end") - F.col("n_tokens")).alias(
            "start_offset"
        ),
    )


def pack_chunks_per_key(
    df: DataFrame,
    key_cols,
    context_len: int = 2048,
    id_col: str = "doc_id",
    count_expr: Optional[F.Column] = None,
    shards: int = 32,
) -> DataFrame:
    """Per-key concat-then-chunk packing: every key (source, split, …)
    lays its documents end-to-end in id order and cuts its own
    ``context_len`` windows — chunk ids restart per key. Same exact
    integer bookkeeping as the global :func:`pack_chunks`."""
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    off = token_offsets_per_key(df, keys, id_col, count_expr, shards)
    first = F.expr("start_offset div %d" % context_len)
    last = F.expr("(start_offset + n_tokens - 1) div %d" % context_len)
    return off.select(
        *keys,
        id_col,
        "n_tokens",
        "start_offset",
        first.alias("chunk_id"),
        last.alias("last_chunk_id"),
        (first != last).cast("bigint").alias("straddles"),
    )
