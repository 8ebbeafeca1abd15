"""Connected components + near-dup clustering (the dedup pipeline
tail: pairs -> components -> canonical representative)."""

from __future__ import annotations

from pyspark.sql import functions as F

from transforms_for_apache_kafka_connect_spark.functions import (
    connected_components,
    near_dup_clusters,
)


def test_connected_components_chain_and_islands(spark):
    # chain 1-2-3-4 (diameter 3) + island pair 10-11 + cross pair 20-21
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (21, 20)],
        "id_a bigint, id_b bigint",
    )
    got = {
        r["id"]: r["component"]
        for r in connected_components(pairs).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20}


def test_connected_components_long_chain_converges(spark):
    n = 12  # diameter 11 — exercises multi-round propagation
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "id_a bigint, id_b bigint"
    )
    got = connected_components(pairs)
    assert got.filter(F.col("component") != 0).count() == 0
    assert got.count() == n + 1


def test_near_dup_clusters_canonicalizes_copies(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog again and again"),
        (2, "the quick brown fox jumps over the lazy dog again and again"),
        (3, "completely different text about spark shuffles and parquet files"),
        (4, "completely different text about spark shuffles and parquet files"),
        (5, "an unrelated singleton document with its own unique words here"),
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {
        r["doc_id"]: r["canonical_id"]
        for r in near_dup_clusters(docs, threshold=0.8).collect()
    }
    assert got == {1: 1, 2: 1, 3: 3, 4: 3}  # singleton 5 absent
