#!/usr/bin/env python
"""End-to-end training-data preparation example over the synthetic
documents + embeddings tables: the functions/ suite in one pipeline.

    python examples/training_data.py [sf_dir]

Stages (each prints a one-line summary):

1.  **Exact dedupe** — content-hash groups, min-id canonical copy.
2.  **Near-dup pruning** — MinHash+LSH candidate pairs -> connected
    components -> keep each cluster's canonical document.
3.  **Quality + language filter** — lang-id, token/punct/stopword
    stats, Gopher repetition metrics (dup-3-gram fraction, top-token
    share), quality floor.
4.  **Paragraph dedup** — corpus-wide first-occurrence paragraph
    dedup over composite documents (boilerplate removal).
5.  **Embedding near-dups** — hyperplane-LSH buckets over the
    embeddings table, cosine >= 0.999 pairs.
6.  **Split + sample** — leakage-free train/val/test hash split, a
    deterministic 10% subsample of train, and an exact-200-doc
    eval probe set.
7.  **BM25 retrieval probe** — rank the kept corpus against a query
    bag, top-10.
8.  **PII scrub + eval-set decontamination** — redact PII-shaped
    spans, then drop every train doc sharing a 5-gram with the eval
    probe set (GPT-3-style decontamination).
9.  **Sequence packing** — first-fit-decreasing packing of the final
    train set into 256-token training rows.

Everything is deterministic (seeded hashes, no RNG state): re-running
prints identical numbers.
"""

from __future__ import annotations

import os
import sys

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from transforms_for_apache_kafka_connect_spark.functions import (
    add_repetition_stats,
    decontaminate,
    pack_sequences,
    scrub_pii,
    add_text_stats,
    bm25_rank,
    dedup_paragraphs,
    detect_lang,
    deterministic_top_sample,
    exact_duplicates,
    hash_sample,
    hash_split,
    minhash_lsh_duplicates,
    near_dup_clusters,
)
from transforms_for_apache_kafka_connect_spark.functions.dedupe import (
    embedding_near_duplicates,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = (
        SparkSession.builder.master("local[4]")
        .appName("tkc-training-data")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n0 = docs.count()

    # 1. exact dedupe: drop every non-canonical copy
    dups = exact_duplicates(docs)
    losers = dups.filter(F.col("doc_id") != F.col("canonical_id")).select(
        "doc_id"
    )
    docs1 = docs.join(losers, "doc_id", "left_anti")
    n1 = docs1.count()
    print(f"1. exact dedupe: {n0} -> {n1} docs "
          f"({n0 - n1} non-canonical copies dropped)")

    # 2. near-dup clusters (MinHash-LSH candidates, jaccard >= 0.8):
    # keep each cluster's canonical (smallest id) document
    clusters = near_dup_clusters(
        docs1, threshold=0.8, id_col="doc_id", text_col="text"
    )
    near_losers = clusters.filter(
        F.col("doc_id") != F.col("canonical_id")
    ).select("doc_id")
    docs2 = docs1.join(near_losers, "doc_id", "left_anti")
    n2 = docs2.count()
    print(f"2. near-dup pruning: {n1} -> {n2} docs "
          f"({n1 - n2} near-duplicates dropped)")

    # 3. language + quality floor, incl. Gopher repetition filters
    scored = add_repetition_stats(
        add_text_stats(
            docs2.withColumn("lang_detected", detect_lang(F.col("text")))
        )
    )
    kept = scored.filter(
        (F.col("lang_detected") != "und")
        & (F.col("n_tokens") >= 10)
        & (F.col("punct_ratio") < 0.3)
        & (F.col("top_token_frac") < 0.5)   # "word word word..." spam
        & (F.col("dup_ngram_frac") < 0.9)   # looped boilerplate
    )
    n3 = kept.count()
    by_lang = {r["lang_detected"]: r["count"]
               for r in kept.groupBy("lang_detected").count().collect()}
    print(f"3. quality/lang filter: {n2} -> {n3} docs, by lang {by_lang}")

    # 4. paragraph-level dedup: stitch overlapping composite docs (to
    # plant cross-document boilerplate), then strip every repeated
    # paragraph's later occurrences
    half = F.floor(F.col("doc_id") / 2)
    comp = (
        docs.filter("doc_id < 100")
        .select(
            F.explode(F.array(half, half - 1)).alias("comp_id"),
            "doc_id",
            "text",
        )
        .filter((F.col("comp_id") >= 0) & (F.col("comp_id") <= 48))
        .groupBy("comp_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("doc_id", "text"))),
                    lambda s: s["text"],
                ),
                "\n\n",
            ).alias("text")
        )
    )
    comp = comp.cache()
    deduped = dedup_paragraphs(comp, id_col="comp_id")
    # totals from the INPUT (fully-redundant composites drop out of
    # the dedup output entirely and must still count)
    n_comp, total_paras = comp.agg(
        F.count(F.lit(1)),
        F.sum(F.size(F.split("text", "\n\n", -1))),
    ).first()
    kept_paras = deduped.agg(F.sum("n_paras_kept")).first()[0]
    print(f"4. paragraph dedup: {total_paras} paragraphs across "
          f"{n_comp} composite docs -> {kept_paras} kept "
          f"({total_paras - kept_paras} cross-doc repeats stripped)")

    # 5. embedding-space near-dups (cosine >= 0.999 via hyperplane
    # LSH). Random synthetic embeddings have no natural near-dups, so
    # inject 20 exact copies — the pipeline must find exactly those.
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    dim = len(emb.select("embedding").first()[0])
    planted = emb.unionByName(
        emb.filter("vec_id < 20").withColumn(
            "vec_id", F.col("vec_id") + 100_000
        )
    )
    pairs = embedding_near_duplicates(planted, dim=dim, threshold=0.999)
    n_pairs = pairs.count()
    print(f"5. embedding near-dups: planted 20 copies among "
          f"{emb.count()} vectors (dim {dim}); found {n_pairs} pairs "
          f"at cosine>=0.999")
    assert n_pairs >= 20

    # 6. leakage-free split + nested deterministic samples
    split = hash_split(
        kept, {"train": 0.9, "val": 0.05, "test": 0.05}, id_cols=["doc_id"]
    )
    counts = {r["split"]: r["count"]
              for r in split.groupBy("split").count().collect()}
    train = split.filter("split = 'train'")
    sample10 = hash_sample(train, 0.1, id_cols=["doc_id"])
    probe = deterministic_top_sample(kept, 200, id_cols=["doc_id"])
    print(f"6. split {counts}; train 10% sample = {sample10.count()} docs; "
          f"eval probe = {probe.count()} docs (all membership stable "
          f"across runs/partitionings)")

    # 7. BM25 retrieval probe over the kept corpus
    top = bm25_rank(kept, ["merge", "window", "scan"], top_k=10).collect()
    print(f"7. bm25 top-10 for ['merge','window','scan']: "
          f"{[(r['doc_id'], r['bm25']) for r in top[:3]]} ...")

    # 8. PII scrub, then decontaminate train against the eval probe
    scrubbed = scrub_pii(train, ["text"])
    clean = decontaminate(
        scrubbed, probe.select("doc_id", "text"), n=5, mode="drop"
    )
    n_train, n_clean = train.count(), clean.count()
    print(f"8. pii-scrubbed {n_train} train docs; decontamination "
          f"dropped {n_train - n_clean} sharing a 5-gram with the "
          f"{probe.count()}-doc eval probe -> {n_clean} kept")
    assert n_clean <= n_train

    # 9. pack the surviving train docs into 256-token training rows
    packed = pack_sequences(clean, max_tokens=256)
    n_packs = packed.select("pack_id").distinct().count()
    util = packed.groupBy("pack_id").agg(
        F.sum("n_tokens").alias("t")).agg(F.avg("t")).first()[0]
    print(f"9. packed {n_clean} docs into {n_packs} sequences of "
          f"<=256 tokens (mean fill {util:.1f})")
    assert n_packs < n_clean

    spark.stop()
    print("done")


if __name__ == "__main__":
    main()
