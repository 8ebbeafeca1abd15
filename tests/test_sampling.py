"""Deterministic sampling/splitting ops (functions/sampling.py):
membership determinism across runs AND partitionings, nested-sample
subset laws, split completeness, plan shapes (zero shuffle where
promised)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from transforms_for_apache_kafka_connect_spark.functions import (
    deterministic_top_sample,
    hash_sample,
    hash_split,
    stratified_sample,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_hash_split_partitions_every_row_once(spark, docs):
    out = hash_split(
        docs, {"train": 0.8, "val": 0.1, "test": 0.1}, id_cols=["doc_id"]
    )
    n = docs.count()
    counts = {r["split"]: r["count"]
              for r in out.groupBy("split").count().collect()}
    assert sum(counts.values()) == n
    assert set(counts) <= {"train", "val", "test"}
    # roughly proportional (hash uniformity; 500 docs -> loose bounds)
    assert counts["train"] > 0.6 * n
    # deterministic across runs and partitionings
    a = {r["doc_id"]: r["split"] for r in out.collect()}
    b = {
        r["doc_id"]: r["split"]
        for r in hash_split(
            docs.repartition(7), {"train": 0.8, "val": 0.1, "test": 0.1},
            id_cols=["doc_id"],
        ).collect()
    }
    assert a == b


def test_hash_split_leakage_free_on_shared_id(spark, docs):
    # two "chunks" of the same document must land in the same split
    chunks = docs.select("doc_id").unionByName(docs.select("doc_id"))
    out = hash_split(chunks, {"train": 0.5, "test": 0.5}, id_cols=["doc_id"])
    assert (
        out.groupBy("doc_id")
        .agg(F.countDistinct("split").alias("k"))
        .filter("k > 1")
        .count()
        == 0
    )


def test_hash_sample_nested_subset_property(spark, docs):
    s10 = {r["doc_id"] for r in hash_sample(
        docs, 0.1, id_cols=["doc_id"]).select("doc_id").collect()}
    s30 = {r["doc_id"] for r in hash_sample(
        docs, 0.3, id_cols=["doc_id"]).select("doc_id").collect()}
    assert s10 <= s30
    n = docs.count()
    assert 0 < len(s10) < len(s30) < n
    # different seed -> different membership
    s10b = {r["doc_id"] for r in hash_sample(
        docs, 0.1, id_cols=["doc_id"], seed=7).select("doc_id").collect()}
    assert s10 != s10b


def test_stratified_sample_per_stratum_fractions(spark, docs):
    langs = [r[0] for r in docs.select("lang").distinct().collect()]
    keep_all, keep_none = langs[0], langs[1]
    out = stratified_sample(
        docs, {keep_all: 1.0, keep_none: 0.0},
        strata_col="lang", id_cols=["doc_id"], default_fraction=0.5,
    )
    got = {r["lang"]: r["count"]
           for r in out.groupBy("lang").count().collect()}
    full = {r["lang"]: r["count"]
            for r in docs.groupBy("lang").count().collect()}
    assert got[keep_all] == full[keep_all]
    assert keep_none not in got
    for lang in langs[2:]:
        assert 0 < got.get(lang, 0) < full[lang]


def test_deterministic_top_sample_exact_and_nested(spark, docs):
    t50 = deterministic_top_sample(docs, 50, id_cols=["doc_id"])
    assert t50.count() == 50
    ids50 = {r["doc_id"] for r in t50.select("doc_id").collect()}
    ids200 = {r["doc_id"] for r in deterministic_top_sample(
        docs, 200, id_cols=["doc_id"]).select("doc_id").collect()}
    assert ids50 <= ids200 and len(ids200) == 200
    # stable across partitionings
    again = {r["doc_id"] for r in deterministic_top_sample(
        docs.repartition(5), 50, id_cols=["doc_id"]
    ).select("doc_id").collect()}
    assert again == ids50
    # n beyond the corpus returns everything; n=0 nothing
    assert deterministic_top_sample(docs, 10**6, id_cols=["doc_id"]).count() \
        == docs.count()
    assert deterministic_top_sample(docs, 0, id_cols=["doc_id"]).count() == 0


def test_filter_ops_add_no_exchange(spark, docs):
    # hash_split / hash_sample / stratified_sample are pure projections
    # + filters: their plans contain NO Exchange and NO Python
    for df in (
        hash_split(docs, {"a": 0.5, "b": 0.5}, id_cols=["doc_id"]),
        hash_sample(docs, 0.2, id_cols=["doc_id"]),
        stratified_sample(docs, {"en": 0.5}, strata_col="lang",
                          id_cols=["doc_id"], default_fraction=0.1),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan[:400]
        assert "Python" not in plan


def test_top_sample_exchange_is_bounded(spark, docs):
    # the one op that moves rows: Catalyst plans the limit+rank as
    # TakeOrderedAndProject (per-task top-n, single bounded reduce) —
    # or, if that rewrite ever regresses, a WindowGroupLimit below the
    # exchange; either way no task ships more than n rows
    plan = deterministic_top_sample(
        docs, 25, id_cols=["doc_id"]
    )._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan or "WindowGroupLimit" in plan, (
        plan[:400]
    )


def test_fraction_one_keeps_every_row(spark, docs):
    # the unit hash must be STRICTLY below 1.0 for every row (2^53
    # bucket fold) so fraction=1.0 is a true keep-all
    assert hash_sample(docs, 1.0, id_cols=["doc_id"]).count() == docs.count()


def test_validation_errors(spark, docs):
    with pytest.raises(ValueError, match="at least one split"):
        hash_split(docs, {}, id_cols=["doc_id"])
    with pytest.raises(ValueError, match="non-negative"):
        hash_split(docs, {"a": -1.0}, id_cols=["doc_id"])
    with pytest.raises(ValueError, match=r"in \[0, 1\]"):
        hash_sample(docs, 1.5, id_cols=["doc_id"])
    with pytest.raises(ValueError, match=r"in \[0, 1\]"):
        stratified_sample(docs, {"en": 2.0}, strata_col="lang",
                          id_cols=["doc_id"])
    with pytest.raises(ValueError, match="default_fraction"):
        stratified_sample(docs, {"en": 0.5}, strata_col="lang",
                          id_cols=["doc_id"], default_fraction=5.0)
    with pytest.raises(ValueError, match=">= 0"):
        deterministic_top_sample(docs, -1, id_cols=["doc_id"])


def test_sha2_mode_laws_and_cross_engine_parity(spark, docs):
    """hash_fn='sha2': same laws (partition, nesting), plus the whole
    point — an external engine (DuckDB here) recomputes the SAME
    membership from sha256, bit for bit."""
    import duckdb

    from transforms_for_apache_kafka_connect_spark.functions.sampling import (
        _unit_hash,
    )

    split = hash_split(
        docs, {"train": 0.75, "val": 0.125, "test": 0.125},
        id_cols=["doc_id"], hash_fn="sha2",
    )
    assert split.count() == docs.count()
    small = set(
        r["doc_id"] for r in
        hash_sample(docs, 0.1, id_cols=["doc_id"], hash_fn="sha2")
        .select("doc_id").collect()
    )
    big = set(
        r["doc_id"] for r in
        hash_sample(docs, 0.3, id_cols=["doc_id"], hash_fn="sha2")
        .select("doc_id").collect()
    )
    assert small <= big and 0 < len(small) < len(big)

    got = {
        r["doc_id"]: r["u"]
        for r in docs.withColumn(
            "u", _unit_hash(["doc_id"], 42, "sha2")
        ).select("doc_id", "u").collect()
    }
    con = duckdb.connect()
    external = con.sql(
        "SELECT doc_id, CAST(('0x' || substring(sha256(concat_ws('|', "
        "CAST(doc_id AS VARCHAR), '42')), 1, 13)) AS BIGINT) "
        "/ 4503599627370496.0 AS u "
        f"FROM '/root/testdata/sf0.001/documents.parquet'"
    ).fetchall()
    assert len(external) == len(got)
    assert all(got[d] == u for d, u in external)

    with pytest.raises(ValueError, match="unknown hash_fn"):
        hash_sample(docs, 0.5, id_cols=["doc_id"], hash_fn="md5")
