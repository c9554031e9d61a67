"""Closed-form text classification: multinomial Naive Bayes.

The classifier-gate stage of a curation pipeline (fastText-style
lang-ID / quality filters) in its distributed, oracle-checkable
reduction (McCallum & Nigam 1998, "A Comparison of Event Models for
Naive Bayes Text Classification"). Training is pure aggregation —
per-(label, token) counts with Laplace smoothing — and inference is a
broadcast-lookup scan, so both ends are plain Catalyst plans with no
iteration and no Python.

Determinism contract (the engine's integer-quantization rule): every
log-probability is quantized to integer MICRO-NATS (round(ln(p)*1e6))
BEFORE any sum. Per-doc class scores are then exact integer sums —
order-independent and bit-identical across engines — and the argmax
tie-breaks on the label, so predictions replay exactly in the DuckDB
oracle.

Scale shape: the token stream aggregates ONCE into the (label, token)
count table; the dense likelihood table is |vocab| x |labels| rows —
vocab-bounded standing state, broadcast for scoring (``top_v`` caps it
with a per-label OOV floor, the same pattern as the surprisal vocab
cap); scoring costs the token scan x |labels| (a handful), all
map-combined aggregates, no window anywhere.
"""

from __future__ import annotations

from typing import Optional, Tuple

from pyspark.sql import DataFrame, functions as F

from bamboo_spark.operators._cache import tracked_persist

_LP = "cast(round(ln((%s) / (%s)) * 1e6, 0) as bigint)"


def nb_train(
    docs: DataFrame,
    text_col: str = "text",
    label_col: str = "lang",
    top_v: Optional[int] = None,
) -> Tuple[DataFrame, DataFrame]:
    """Train multinomial NB with add-one smoothing. Returns
    ``(likelihoods, classes)``:

    * ``likelihoods`` — (label, t, lp_u): dense |vocab| x |labels|
      micro-nat log-likelihood table (every kept vocab token has a row
      for EVERY label — absent counts smooth to 1/(tot+V));
    * ``classes`` — (label, lp0_u, prior_u): per-label OOV floor
      (ln(1/(tot+V))) and document prior (ln(n_label/n_docs)).

    ``top_v`` keeps only the V most frequent tokens (count desc, token
    asc — deterministic) so the broadcastable table is budget-bounded;
    tokens outside it score the floor at inference.
    """
    tok = docs.select(
        F.col(label_col).alias("label"),
        F.explode(F.split(text_col, " ")).alias("t"),
    ).where(F.col("t") != "")
    # persist the (label, token) count table: it feeds THREE branches
    # (vocab agg, per-class totals, the dense-likelihood left join) and
    # each broadcast subtree downstream would otherwise re-run the
    # corpus-sized token-explode aggregate — measured 36 jobs for 2.5 s
    # of task time on lang_nb_confusion (guide §1.2: never compute the
    # expensive thing twice). The table is |vocab|x|labels| rows —
    # bounded standing state, not corpus-sized.
    ct = tracked_persist(
        tok.groupBy("label", "t").agg(F.count(F.lit(1)).alias("c"))
    )
    vocab = ct.groupBy("t").agg(F.sum("c").alias("cn"))
    if top_v is not None:
        vocab = vocab.orderBy(F.col("cn").desc(), F.col("t").asc()).limit(top_v)
    vocab = vocab.select("t")
    cls = ct.groupBy("label").agg(F.sum("c").alias("tot"))
    nv = vocab.agg(F.count(F.lit(1)).alias("v"))
    likelihoods = (
        vocab.crossJoin(cls)
        .join(ct, ["label", "t"], "left")
        .crossJoin(F.broadcast(nv))
        .select(
            "label",
            "t",
            F.expr(
                _LP
                % (
                    "cast(coalesce(c, 0) + 1 as double)",
                    "cast(tot + v as double)",
                )
            ).alias("lp_u"),
        )
    )
    total = docs.agg(F.count(F.lit(1)).alias("nd"))
    prior = (
        docs.groupBy(F.col(label_col).alias("label"))
        .agg(F.count(F.lit(1)).alias("n"))
        .crossJoin(F.broadcast(total))
        .select(
            "label",
            F.expr(_LP % ("cast(n as double)", "cast(nd as double)")).alias(
                "prior_u"
            ),
        )
    )
    floor = cls.crossJoin(F.broadcast(nv)).select(
        "label",
        F.expr(_LP % ("cast(1 as double)", "cast(tot + v as double)")).alias(
            "lp0_u"
        ),
    )
    # classes is |labels| rows but its subtree includes the prior's
    # full-corpus doc count — persisted so the 2-3 broadcast branches
    # that consume it (scores floor, prior add, classify) scan docs once
    classes = tracked_persist(floor.join(prior, "label"))
    return likelihoods, classes


def nb_scores(
    docs: DataFrame,
    likelihoods: DataFrame,
    classes: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Score every doc against every trained label and return the full
    (id_col, label, score) table — score = prior + sum of per-token
    micro-nat likelihoods (exact integer, OOV tokens at the label's
    floor). The raw material for argmax (:func:`nb_classify`), margins,
    and threshold-curve evaluation (ROC/AUC)."""
    tok = docs.select(
        id_col, F.explode(F.split(text_col, " ")).alias("t")
    ).where(F.col("t") != "")
    return (
        tok.crossJoin(F.broadcast(classes.select("label", "lp0_u")))
        .join(
            F.broadcast(likelihoods.withColumnRenamed("lp_u", "_lp")),
            ["label", "t"],
            "left",
        )
        .select(
            id_col,
            "label",
            F.coalesce(F.col("_lp"), F.col("lp0_u")).alias("lp_u"),
        )
        .groupBy(id_col, "label")
        .agg(F.sum("lp_u").alias("s"))
        .join(F.broadcast(classes.select("label", "prior_u")), "label")
        .select(id_col, "label", (F.col("s") + F.col("prior_u")).alias("score"))
    )


def nb_classify(
    docs: DataFrame,
    likelihoods: DataFrame,
    classes: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "pred_label",
) -> DataFrame:
    """Score every doc against every trained label and return
    (id_col, out_col) — argmax of prior + sum of per-token micro-nat
    likelihoods, OOV tokens at the label's floor. Tie-break: greater
    label name (same rule as the oracle's ``order by score desc,
    label desc``)."""
    scored = nb_scores(
        docs, likelihoods, classes, text_col=text_col, id_col=id_col
    ).select(
        id_col,
        F.struct(
            F.col("score").alias("sc"), F.col("label").alias("cl")
        ).alias("z"),
    )
    return (
        scored.groupBy(id_col)
        .agg(F.max("z").alias("b"))
        .select(id_col, F.col("b.cl").alias(out_col))
    )
