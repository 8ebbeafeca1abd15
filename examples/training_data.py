#!/usr/bin/env python
"""End-to-end training-data preparation example over the synthetic
documents + embeddings tables: the functions/ suite in one pipeline.

    python examples/training_data.py [sf_dir]

Stages (each prints a one-line summary):

1.  **Exact dedupe** — content-hash groups, min-id canonical copy.
2.  **Near-dup pruning** — MinHash+LSH candidate pairs -> connected
    components -> keep each cluster's canonical document.
3.  **Quality + language filter** — lang-id, token/punct/stopword
    stats, quality floor.
4.  **Embedding near-dups** — hyperplane-LSH buckets over the
    embeddings table, cosine >= 0.999 pairs.
5.  **Split + sample** — leakage-free train/val/test hash split, a
    deterministic 10% subsample of train, and an exact-200-doc
    eval probe set.

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
    add_text_stats,
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

    # 3. language + quality floor
    scored = add_text_stats(
        docs2.withColumn("lang_detected", detect_lang(F.col("text")))
    )
    kept = scored.filter(
        (F.col("lang_detected") != "und")
        & (F.col("n_tokens") >= 10)
        & (F.col("punct_ratio") < 0.3)
    )
    n3 = kept.count()
    by_lang = {r["lang_detected"]: r["count"]
               for r in kept.groupBy("lang_detected").count().collect()}
    print(f"3. quality/lang filter: {n2} -> {n3} docs, by lang {by_lang}")

    # 4. embedding-space near-dups (cosine >= 0.999 via hyperplane
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
    print(f"4. embedding near-dups: planted 20 copies among "
          f"{emb.count()} vectors (dim {dim}); found {n_pairs} pairs "
          f"at cosine>=0.999")
    assert n_pairs >= 20

    # 5. leakage-free split + nested deterministic samples
    split = hash_split(
        kept, {"train": 0.9, "val": 0.05, "test": 0.05}, id_cols=["doc_id"]
    )
    counts = {r["split"]: r["count"]
              for r in split.groupBy("split").count().collect()}
    train = split.filter("split = 'train'")
    sample10 = hash_sample(train, 0.1, id_cols=["doc_id"])
    probe = deterministic_top_sample(kept, 200, id_cols=["doc_id"])
    print(f"5. split {counts}; train 10% sample = {sample10.count()} docs; "
          f"eval probe = {probe.count()} docs (all membership stable "
          f"across runs/partitionings)")

    spark.stop()
    print("done")


if __name__ == "__main__":
    main()
