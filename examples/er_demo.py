"""Entity-resolution + tokenizer-training demo.

    python examples/er_demo.py [sf_dir]

1. Fuzzy record linkage over 32-char title keys (PassJoin segment
   pigeonholing + banded levenshtein verify).
2. Converged connected components over the match edges.
3. Golden-record survivorship (lowest id per entity) + cluster sizes.
4. Incremental ingest: a "new batch" probed against the stored corpus
   segment index (O(batch), never a corpus re-pair).
5. BPE merge training on the word-count table + corpus token budget
   under the learned merges.

Everything is declarative DataFrame API — the same code runs on a
cluster unchanged.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from bamboo_spark import get_spark
from bamboo_spark.operators import bpe, dedup
from bamboo_spark.operators.linkage import edit_distance_join, edit_distance_pairs


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("er_demo")

    docs = spark.read.parquet("%s/documents.parquet" % sf_dir)
    keyed = docs.select(
        "doc_id", F.lower(F.substring("text", 1, 32)).alias("title_key")
    )

    # -- 1: fuzzy matching
    pairs = edit_distance_pairs(keyed, "doc_id", "title_key", max_dist=3)
    print("match edges (d<=3): %d" % pairs.count())
    pairs.orderBy("dist", "id_a").show(5, truncate=False)

    # -- 2+3: cluster + survivorship
    comp = dedup.connected_components_converged(
        pairs.select(
            F.col("id_a").alias("doc_a"), F.col("id_b").alias("doc_b")
        )
    )
    golden = (
        comp.groupBy("component")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cluster_size"))
        .orderBy(F.col("cluster_size").desc(), "component")
    )
    print("entities: %d" % golden.count())
    golden.show(5)

    # -- 4: incremental ingest against the stored segment index
    new = keyed.where(F.col("doc_id") >= 250)
    corpus = keyed.where(F.col("doc_id") < 250)
    inc = edit_distance_join(new, corpus, "doc_id", "title_key", max_dist=3)
    print("new-batch matches vs stored corpus: %d" % inc.count())

    # -- 5: BPE training + token budget
    merges = bpe.bpe_train(docs, "text", n_merges=6)
    print("learned merges:")
    merges.show(truncate=False)
    counts = bpe.bpe_encode_counts(docs, "text", n_merges=6)
    counts.agg(
        F.sum("n_words").alias("whitespace_tokens"),
        F.sum("n_bpe_tokens").alias("bpe_tokens"),
    ).show()


if __name__ == "__main__":
    main()
