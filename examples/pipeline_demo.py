"""End-to-end demo: the full bamboo_spark surface in one pipeline.

    python examples/pipeline_demo.py [sf_dir]

1. Ingest nested JSON (reference-style from_json → Dataset).
2. Flatten with bamboo semantics (broadcast-repeat, inner join).
3. Run the training-data pipeline over the documents table:
   normalize → stable-sample → near-dup detection (MinHash-LSH)
   → duplicate-cluster labeling → keep cluster canonicals.
4. Write the cleaned corpus as partitioned parquet.

Every step is declarative DataFrame API — Catalyst plans it; nothing
here depends on local[*] and the same code runs on a cluster.
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from bamboo_spark import Dataset, from_json, get_spark
from bamboo_spark.operators import dedup, text


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("pipeline_demo")

    # -- 1+2: nested ingestion + flatten (the reference's core workflow)
    doc = '[{"a": null, "b": [1, 2]}, {"a": -1.0, "b": [3, 4]}]'
    flat = from_json(doc, spark=spark).flatten().to_pandas()
    print("flatten (README example):")
    print(flat.to_string(index=False))

    # -- 3: training-data pipeline over the documents table
    docs = spark.read.parquet("%s/documents.parquet" % sf_dir)

    sampled = docs.where(text.stable_sample_pct("doc_id") < 80)  # 80% stable sample

    # Bloom ingest guard: treat doc_id < 250 as the previously-ingested
    # corpus; new docs whose content fingerprint it already contains are
    # dropped before any expensive curation work. The batch filters
    # itself map-side against the corpus's broadcast bitmap; only Bloom
    # survivors reach the exact verify join.
    already = dedup.bloom_dedup_incremental(
        docs, text.fingerprint_expr(), split_id=250
    )
    fresh = sampled.join(already.select("doc_id"), "doc_id", "left_anti")

    # curation pre-passes, all scan-speed or broadcast-shaped:
    # PII scrub (regexp redaction), repetition filter (Gopher-style),
    # benchmark decontamination (broadcast 4-gram overlap vs eval slice)
    scrubbed = fresh.selectExpr(
        "doc_id", "source", "%s as text" % text.scrub_pii_sql("text")
    )
    # Gopher-rules composite filter (scan-speed; keeps an audit trail
    # of drop reasons so thresholds can be tuned before committing)
    flags = text.gopher_filter(scrubbed)
    non_repetitive = scrubbed.join(
        flags.where(F.col("keep") == 1).select("doc_id"), "doc_id"
    )
    sh4 = text.word_shingles_sql("split(text, ' ')", 4)
    eval_grams = (
        docs.where(F.col("doc_id") % 97 == 0)
        .selectExpr("explode(array_distinct(%s)) as s" % sh4)
        .distinct()
    )
    contaminated = (
        non_repetitive.selectExpr("doc_id", "explode(array_distinct(%s)) as s" % sh4)
        .join(F.broadcast(eval_grams), "s")
        .select("doc_id")
        .distinct()
    )
    clean = non_repetitive.join(contaminated, "doc_id", "left_anti")
    print(
        "curation: %d sampled -> %d past bloom guard -> %d past quality"
        " filter -> %d after decontamination"
        % (sampled.count(), fresh.count(), non_repetitive.count(), clean.count())
    )

    # paragraph-level dedup: drop exact-duplicate 20-token segments
    # corpus-wide and reassemble the surviving text (digests shuffle,
    # text never does)
    seg = dedup.segment_dedup(clean, block_tokens=20)
    clean = (
        clean.drop("text")
        .join(seg.where(F.col("n_kept") > 0), "doc_id")
        .selectExpr("doc_id", "source", "dedup_text as text")
    )

    normed = clean.withColumn("norm", text.normalize_text("text"))

    pairs = dedup.minhash_lsh_pairs(
        normed.select("doc_id", F.col("norm").alias("text")),
        threshold=0.7,
        num_hashes=64,
    )
    clusters = dedup.connected_components(pairs, iterations=4)
    # keep the BEST copy per duplicate cluster (argmax quality, not
    # min id): canonical_docs is a map-combinable aggregate
    scored = normed.select("doc_id", text.quality_score("text").alias("quality"))
    reps = dedup.canonical_docs(clusters, scored)
    canonical = reps.select(F.col("keep_id").alias("doc_id"))
    dropped = clusters.join(
        reps.select("component", "keep_id"), "component"
    ).where(F.col("doc_id") != F.col("keep_id")).select("doc_id")

    keep = normed.join(dropped.select("doc_id"), "doc_id", "left_anti")
    n_in, n_out = docs.count(), keep.count()
    print(
        "\ndocs: %d -> sampled: %d -> kept after near-dup removal: %d "
        "(%d dup clusters, %d docs dropped)"
        % (n_in, sampled.count(), n_out, canonical.count(), dropped.count())
    )

    # -- 4: mix, split, pack (the tokenization-facing tail of the pipeline)
    from bamboo_spark.operators import pack

    lang = F.expr(text.lang_id_sql("split(text, ' ')"))
    mixed = keep.withColumn("lang", lang).where(
        text.stable_sample_pct("doc_id")
        < F.when(F.col("lang") == "en", 90).otherwise(60)
    )
    # distinct hash input for the split so it decorrelates from the
    # sampling buckets above (same md5 machinery, salted id)
    split = mixed.withColumn(
        "split",
        F.when(
            text.stable_sample_pct("concat(doc_id, '-split')") < 90, "train"
        ).otherwise("eval"),
    )
    packed = pack.pack_chunks(split.where(F.col("split") == "train"), context_len=2048)
    n_chunks = packed.agg(F.max("last_chunk_id")).collect()[0][0]
    straddlers = packed.where(F.col("straddles") == 1).count()
    print(
        "mixed: %d -> train: %d docs -> %s context windows (%d boundary-straddling docs)"
        % (
            mixed.count(),
            split.where(F.col("split") == "train").count(),
            (n_chunks + 1) if n_chunks is not None else 0,
            straddlers,
        )
    )

    # -- 5: partitioned sink
    out = os.path.join(tempfile.mkdtemp(), "corpus")
    Dataset(split.withColumn("stratum", F.col("source"))).write_parquet(
        out, partition_by=["stratum"]
    )
    parts = sorted(p for p in os.listdir(out) if p.startswith("stratum="))
    print("wrote %s (%d partitions)" % (out, len(parts)))


if __name__ == "__main__":
    main()
