"""Record linkage: scalable edit-distance similarity self-join.

Entity resolution's core primitive — find all id pairs whose (normalized)
string keys are within ``max_dist`` Levenshtein edits — WITHOUT the n²
comparison. Candidate generation is PassJoin-style segment pigeonholing
(Li, Deng, Feng, VLDB'11 — public literature; the reference library has
no counterpart surface):

* partition every string into ``k = d+1`` contiguous segments; at most
  ``d`` edit operations can touch at most ``d`` segments, so two strings
  within ``d`` edits share at least ONE segment verbatim — and because
  net insertions/deletions before that segment cannot exceed the edit
  budget, its occurrence in the partner starts within ``±d`` of its home
  position;
* so the index holds only ``k`` segments per string, probes enumerate the
  ``(partner_length, segment, ±d start)`` grid (≤ (d+1)²·(2d+1) short
  substrings per string), and candidates require an EXACT segment==
  substring match — far more selective than any q-gram scheme on
  low-entropy corpora, where 3-gram signatures collapse (measured on the
  synthetic docs: 375 distinct 3-grams across 150k instances turned an
  Ed-Join prefix filter into a 4.2M-pair candidate set; segments give
  ~110k);
* pairs whose SHORTER side has fewer than ``k`` characters can't be
  segmented — both sides of such a pair are ≤ 2d chars, and they fall
  back to a length-bucket block (short keys are inherently dense; the
  block is still an equi-join);
* every candidate is verified EXACTLY with ``levenshtein(a, b, d)`` (the
  banded O(d·n) form), so pruning can never change the answer.

Scale shape: the index/probe tables are short substrings keyed by
(partner_len, segment_no, content) — an equi-join with no windows, no
sort, and the only per-string fan-out a constant ≤ (d+1)²·(2d+1). The
full keys are touched exactly twice: once to cut segments/probes (all
inside codegen — substring over a position sequence, no indexed array
access) and once at the final verify join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from bamboo_spark.operators._cache import tracked_persist


def edit_distance_pairs(
    df: DataFrame,
    id_col: str,
    key_col: str,
    max_dist: int,
) -> DataFrame:
    """All unordered id pairs with ``levenshtein(key_a, key_b) <= max_dist``.

    Output: (id_a, id_b, dist), id_a < id_b, one row per pair. NULL keys
    never match (SQL join semantics). ``max_dist >= 1``; exact-equality
    linkage (``max_dist=0``) is a hash groupBy — use
    :mod:`bamboo_spark.operators.dedup` for that.
    """
    if max_dist < 1:
        raise ValueError("max_dist must be >= 1; got %d" % max_dist)
    d = max_dist
    k = d + 1

    keys = tracked_persist(
        df.select(
            F.col(id_col).alias("_id"),
            F.col(key_col).cast("string").alias("_key"),
            F.length(key_col).cast("int").alias("_len"),
        ).where(F.col(key_col).isNotNull())
    )

    # Even partition scheme, shared by index and probe: for a string of
    # length l, segment i (1-based, i <= k) has
    #   len_i(l) = l div k + (1 if i <= l mod k else 0)
    #   p_i(l)   = (i-1)*(l div k) + least(i-1, l mod k) + 1
    def seg_len(l: str, i: str) -> str:
        return "((%s) div %d) + if((%s) <= (%s) %% %d, 1, 0)" % (l, k, i, l, k)

    def seg_pos(l: str, i: str) -> str:
        return "((%s) - 1) * ((%s) div %d) + least((%s) - 1, (%s) %% %d) + 1" % (
            i,
            l,
            k,
            i,
            l,
            k,
        )

    # --- index: k segments per string (strings long enough to segment)
    idx_expr = (
        "filter(transform(sequence(1, %(k)d), i -> named_struct("
        "'_l', _len, '_i', i, "
        "'_seg', substring(_key, %(pos)s, %(slen)s)"
        ")), x -> length(x._seg) >= 1)"
    ) % {
        "k": k,
        "pos": seg_pos("_len", "i"),
        "slen": seg_len("_len", "i"),
    }
    segs = keys.where(F.col("_len") >= k).select(
        F.col("_id").alias("_idg"),
        F.explode(F.expr(idx_expr)).alias("_e"),
    ).select("_idg", "_e._l", "_e._i", F.col("_e._seg").alias("_sub"))

    # --- probe: for partner lengths l in [len-d, len] (l >= k), every
    # segment's ±d start window; empty/clipped windows filtered out
    probe_expr = (
        "filter(flatten(flatten("
        "transform(sequence(_len - %(d)d, _len), l -> "
        " transform(sequence(1, %(k)d), i -> "
        "  transform(sequence((%(pos)s) - %(d)d, (%(pos)s) + %(d)d), st -> "
        "   named_struct('_l', l, '_i', i, '_st', st, '_sl', %(slen)s)"
        "))))), "
        "x -> x._l >= %(k)d and x._st >= 1 and x._sl >= 1 "
        "and x._st + x._sl - 1 <= _len)"
    ) % {
        "d": d,
        "k": k,
        "pos": seg_pos("l", "i"),
        "slen": seg_len("l", "i"),
    }
    probes = keys.where(F.col("_len") >= k).select(
        F.col("_id").alias("_idp"),
        F.col("_key").alias("_kp"),
        F.explode(F.expr(probe_expr)).alias("_e"),
    ).select(
        "_idp",
        "_e._l",
        "_e._i",
        F.expr("substring(_kp, _e._st, _e._sl)").alias("_sub"),
    )

    seg_cands = (
        probes.join(segs, ["_l", "_i", "_sub"])
        .where(F.col("_idp") != F.col("_idg"))
        .select(
            F.least("_idp", "_idg").alias("_ida"),
            F.greatest("_idp", "_idg").alias("_idb"),
        )
    )

    # --- short pool: pairs whose shorter side is < k chars; both sides
    # of such a pair are <= 2d chars (length filter), block on length
    shorts = keys.where(F.col("_len") <= 2 * d)
    sa = shorts.select(
        F.col("_id").alias("_ida"),
        F.explode(
            F.sequence(
                F.greatest(F.col("_len") - d, F.lit(0)), F.col("_len") + d
            )
        ).alias("_lv"),
    )
    sb = shorts.select(F.col("_id").alias("_idb"), F.col("_len").alias("_lv"))
    short_cands = (
        sa.join(sb, "_lv")
        .where(F.col("_ida") < F.col("_idb"))
        .select("_ida", "_idb")
    )

    cands = seg_cands.unionByName(short_cands).distinct()

    # --- exact verify ---------------------------------------------------
    ka = keys.select(F.col("_id").alias("_ida"), F.col("_key").alias("_ka"))
    kb = keys.select(F.col("_id").alias("_idb"), F.col("_key").alias("_kb"))
    verified = (
        cands.join(ka, "_ida")
        .join(kb, "_idb")
        .withColumn("_dist", F.levenshtein("_ka", "_kb", d))
        .where(F.col("_dist") >= 0)
    )
    return verified.select(
        F.col("_ida").alias("id_a"),
        F.col("_idb").alias("id_b"),
        F.col("_dist").cast("int").alias("dist"),
    )
