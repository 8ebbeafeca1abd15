"""Training-corpus preparation ops added in continuation 7:
eval-set decontamination (n-gram overlap), PII scrubbing, and greedy
sequence packing (functions/text.py, functions/sampling.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from transforms_for_apache_kafka_connect_spark.functions import (
    decontaminate,
    pack_sequences,
    scrub_pii,
)

# ---------------------------------------------------------- decontaminate


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_decontaminate_flags_ngram_overlap(spark):
    train = _docs(spark, [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "an entirely different sentence with no overlap at all"),
        (3, "prefix words then THE QUICK BROWN fox appears here"),  # case-insensitive
        (4, "quick brown dog"),  # shares words but no full 3-gram
    ])
    ev = _docs(spark, [(100, "watch the quick brown fox run")])
    out = decontaminate(train, ev, n=3)
    got = {r["doc_id"]: r["contaminated"] for r in out.collect()}
    assert got == {1: True, 2: False, 3: True, 4: False}
    # drop mode removes exactly the flagged rows, column disappears
    kept = decontaminate(train, ev, n=3, mode="drop")
    assert {r["doc_id"] for r in kept.collect()} == {2, 4}
    assert "contaminated" not in kept.columns


def test_decontaminate_matches_bruteforce_oracle(spark):
    """Hash-set path == brute-force string-gram intersection on a
    corpus with real overlap structure (documents testdata)."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    ev = docs.filter(F.col("doc_id") % 41 == 0).select("doc_id", "text")
    train = docs.filter(F.col("doc_id") % 41 != 0).select("doc_id", "text")
    got = {
        r["doc_id"]
        for r in decontaminate(train, ev, n=5).filter("contaminated").collect()
    }
    from transforms_for_apache_kafka_connect_spark.functions.dedupe import (
        word_shingles,
    )
    eg = ev.select(F.explode(word_shingles(F.col("text"), 5)).alias("g")).distinct()
    tg = train.select(
        "doc_id", F.explode(word_shingles(F.col("text"), 5)).alias("g")
    )
    expected = {r["doc_id"] for r in tg.join(eg, "g").select("doc_id").distinct().collect()}
    assert got == expected
    assert expected  # the fixture actually exercises the overlap path


def test_decontaminate_short_docs_and_bad_mode(spark):
    train = _docs(spark, [(1, "too short"), (2, "")])
    ev = _docs(spark, [(9, "too short indeed")])
    out = decontaminate(train, ev, n=13)
    assert all(not r["contaminated"] for r in out.collect())
    with pytest.raises(ValueError, match="mode"):
        decontaminate(train, ev, mode="purge")


def test_decontaminate_plan_broadcasts_eval_side(spark):
    train = _docs(spark, [(1, "a b c d e")])
    ev = _docs(spark, [(2, "c d e f g")])
    plan = decontaminate(train, ev, n=3)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# -------------------------------------------------------------- scrub_pii


def test_scrub_pii_patterns(spark):
    df = spark.createDataFrame(
        [(1, "mail bob.smith+x@corp-site.co.uk from 10.0.255.7 "
             "ssn 123-45-6789 call +14155550100 done")],
        "id long, text string",
    )
    out = scrub_pii(df, ["text"]).collect()[0]["text"]
    assert out == ("mail <PII> from <PII> ssn <PII> call <PII> done")
    # non-PII text passes through byte-identical
    clean = spark.createDataFrame(
        [(1, "nothing sensitive here 1.2 v3 a-b at x.y")], "id long, text string"
    )
    assert scrub_pii(clean, ["text"]).collect()[0]["text"] == \
        "nothing sensitive here 1.2 v3 a-b at x.y"


def test_scrub_pii_custom_patterns_and_plan(spark):
    df = spark.createDataFrame([(1, "id ABC-99 ok")], "id long, text string")
    out = scrub_pii(
        df, ["text"], patterns={"code": r"\b[A-Z]{3}-\d{2}\b"},
        replacement="#",
    )
    assert out.collect()[0]["text"] == "id # ok"
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Python" not in plan


# --------------------------------------------------------- pack_sequences


def test_pack_sequences_laws(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    packed = pack_sequences(docs, max_tokens=128).cache()
    n_docs = docs.count()
    # every document exactly once
    assert packed.count() == n_docs
    assert packed.select("doc_id").distinct().count() == n_docs
    # no pack exceeds the budget unless it is a single oversize doc
    agg = packed.groupBy("pack_id").agg(
        F.sum("n_tokens").alias("tot"), F.count("*").alias("n")
    )
    bad = agg.filter((F.col("tot") > 128) & (F.col("n") > 1)).count()
    assert bad == 0
    # pack positions are dense 0..n-1
    pos = packed.groupBy("pack_id").agg(
        F.count("*").alias("n"), F.max("pack_pos").alias("mx"),
        F.min("pack_pos").alias("mn"),
    )
    assert pos.filter((F.col("mx") != F.col("n") - 1) | (F.col("mn") != 0)).count() == 0
    # packing is useful: fewer packs than docs at this budget
    assert agg.count() < n_docs
    packed.unpersist()


def test_pack_sequences_deterministic_across_partitionings(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = pack_sequences(docs.repartition(1), max_tokens=200)
    b = pack_sequences(docs.repartition(7, "lang"), max_tokens=200)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_pack_sequences_oversize_doc_gets_own_pack(spark):
    df = spark.createDataFrame(
        [(1, "w " * 50), (2, "x y"), (3, "z")], "doc_id long, text string"
    )
    packed = pack_sequences(df, max_tokens=10, n_shards=1)
    rows = {r["doc_id"]: r for r in packed.collect()}
    # doc 1 (50 tokens > 10) is alone in its pack
    own = [r for r in rows.values() if r["pack_id"] == rows[1]["pack_id"]]
    assert len(own) == 1
    # docs 2 and 3 (2 + 1 tokens) share one pack
    assert rows[2]["pack_id"] == rows[3]["pack_id"]
