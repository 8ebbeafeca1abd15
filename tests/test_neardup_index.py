"""Changelog-maintained MinHash-LSH index: near-dups of NEW docs
against an indexed corpus, with the index kept consistent by the
Replayer maintenance loop — including deletes, text updates, and
crash-replay. The money test: query results equal the batch LSH
operator run over corpus + query docs, restricted to cross pairs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from transforms_for_apache_kafka_connect_spark.functions import (
    minhash_lsh_duplicates,
)
from transforms_for_apache_kafka_connect_spark.plans.chain import Chain
from transforms_for_apache_kafka_connect_spark.streaming import (
    LakeTable,
    NearDupIndex,
    Replayer,
)

_VAL = T.StructType([T.StructField("text", T.StringType())])
_ENV = T.StructType([
    T.StructField("topic", T.StringType(), False),
    T.StructField("partition", T.IntegerType(), False),
    T.StructField("key", T.StructType([T.StructField("doc_id", T.LongType())])),
    T.StructField("value", T.StructType([
        T.StructField("op", T.StringType()),
        T.StructField("lsn", T.LongType()),
        T.StructField("ts_ms", T.LongType()),
        T.StructField("before", _VAL),
        T.StructField("after", _VAL),
    ])),
    T.StructField("timestamp", T.LongType()),
    T.StructField("headers", T.MapType(T.StringType(), T.StringType())),
])


def _env(spark, events):
    """events: (lsn, doc_id, op, text) -> CDC envelope."""
    rows = []
    for lsn, did, op, text in events:
        after = None if op == "d" else (text,)
        rows.append(("docs", 0, (did,), (op, lsn, lsn, None, after), lsn, None))
    return spark.createDataFrame(rows, _ENV)


def _corpus_texts(spark, n=40):
    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .orderBy("doc_id")
        .limit(n)
        .collect()
    )
    return [(r["doc_id"], r["text"]) for r in docs]


@pytest.fixture(scope="module")
def indexed(spark, tmp_path_factory):
    """Corpus of 40 real doc texts replayed through a changelog table
    with the index attached; two batches."""
    tmp = tmp_path_factory.mktemp("ndi")
    table = LakeTable(str(tmp / "t"), key_cols=["doc_id"], n_buckets=4,
                      merge_strategy="broadcast", changelog=True,
                      discovery=False)
    index = NearDupIndex(root=str(tmp / "idx"), num_hashes=32, bands=16)
    rep = Replayer(table=table, chain=Chain([]), epoch="e",
                   maintain=[index])
    events = [
        (i + 1, did, "u", text)
        for i, (did, text) in enumerate(_corpus_texts(spark))
    ]
    rep.replay(_env(spark, events), batch_width=20, start_pos=0,
               max_pos=len(events) + 1)
    return table, index, rep, events


def _query_docs(spark, events, k=5):
    """New docs: exact clones of the first k corpus texts (ids 9000+i)
    plus one unrelated text that must match nothing."""
    rows = [(9000 + i, events[i][3]) for i in range(k)]
    rows.append((9999, "zzz qqq xxx unique sentinel words " * 4))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_near_dups_match_batch_lsh_operator(spark, indexed):
    table, index, _, events = indexed
    q = _query_docs(spark, events)
    got = {
        (r["query_id"], r["corpus_id"], r["jaccard"])
        for r in index.near_dups_of(
            spark, q, threshold=0.8, corpus=table.read(spark)
        ).collect()
    }
    # oracle: the batch operator over corpus+query, cross pairs only
    both = table.read(spark).select("doc_id", "text").unionByName(q)
    want = {
        (r["id_b"], r["id_a"], r["jaccard"])
        for r in minhash_lsh_duplicates(
            both, num_hashes=32, bands=16, threshold=0.8
        ).collect()
        if r["id_b"] >= 9000 and r["id_a"] < 9000  # (query, corpus)
    }
    assert got == want and len(got) >= 5
    # the sentinel doc matched nothing
    assert not any(qid == 9999 for qid, _, _ in got)


def test_estimate_mode_is_index_only_and_exact_for_clones(spark, indexed):
    table, index, _, events = indexed
    q = _query_docs(spark, events)
    got = {
        (r["query_id"], r["corpus_id"]): r["est_jaccard"]
        for r in index.near_dups_of(spark, q, threshold=0.9).collect()
    }
    # a clone's signature matches in every position -> estimate 1.0
    for i in range(5):
        assert got[(9000 + i, events[i][1])] == 1.0


def test_index_maintained_under_update_and_delete(spark, tmp_path):
    texts = _corpus_texts(spark, 6)
    table = LakeTable(str(tmp_path / "t"), key_cols=["doc_id"], n_buckets=2,
                      merge_strategy="broadcast", changelog=True,
                      discovery=False)
    index = NearDupIndex(root=str(tmp_path / "idx"), num_hashes=32,
                         bands=16, n_buckets=2)
    rep = Replayer(table=table, chain=Chain([]), epoch="e",
                   maintain=[index])
    events = [(i + 1, did, "u", t) for i, (did, t) in enumerate(texts)]
    # batch 1: delete doc0, blank doc1's text, rewrite doc2 to doc3's text
    d0, d1, d2, d3 = texts[0][0], texts[1][0], texts[2][0], texts[3][0]
    events += [
        (11, d0, "d", None),
        (12, d1, "u", "   "),
        (13, d2, "u", texts[3][1]),
    ]
    rep.replay(_env(spark, events), batch_width=10, start_pos=0,
               max_pos=20)
    # bands table holds exactly 16 rows per live indexed doc (4 docs)
    assert index.bands_table.read(spark).count() == 16 * 4
    assert index.sigs_table.read(spark).count() == 4
    live_ids = {
        r["id"] for r in index.sigs_table.read(spark).select("id").collect()
    }
    assert live_ids == {d2, d3, texts[4][0], texts[5][0]}

    # querying doc0's old text finds nothing; doc3's text now finds BOTH
    q = spark.createDataFrame(
        [(9000, texts[0][1]), (9001, texts[3][1])],
        "doc_id long, text string",
    )
    got = {
        (r["query_id"], r["corpus_id"])
        for r in index.near_dups_of(spark, q, threshold=0.9).collect()
    }
    assert got == {(9001, d2), (9001, d3)}


def test_index_replay_is_exactly_once(spark, indexed):
    table, index, rep, events = indexed
    before = sorted(
        (r["id"], r["band"], r["bh"])
        for r in index.bands_table.read(spark).collect()
    )
    rep.replay(_env(spark, events), batch_width=20, start_pos=0,
               max_pos=len(events) + 1)
    after = sorted(
        (r["id"], r["band"], r["bh"])
        for r in index.bands_table.read(spark).collect()
    )
    assert before == after


def test_candidate_plan_never_cartesian(spark, indexed):
    _, index, _, events = indexed
    q = _query_docs(spark, events)
    plan = index.candidates(spark, q)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_index_validations(tmp_path):
    with pytest.raises(ValueError, match="divisible"):
        NearDupIndex(root=str(tmp_path / "x"), num_hashes=32, bands=5)


def test_short_docs_never_enter_the_index(spark, tmp_path):
    """Review regression: docs with fewer than n words have EMPTY
    shingle sets -> all-NULL signatures -> every band hashes to the
    same bh (concat_ws skips NULLs), colliding all short docs with
    each other in all bands. They must be excluded on both the index
    and query sides."""
    table = LakeTable(str(tmp_path / "t"), key_cols=["doc_id"], n_buckets=2,
                      merge_strategy="broadcast", changelog=True,
                      discovery=False)
    index = NearDupIndex(root=str(tmp_path / "idx"), num_hashes=32,
                         bands=16, n_buckets=2)
    rep = Replayer(table=table, chain=Chain([]), epoch="e",
                   maintain=[index])
    events = [(i + 1, i, "u", f"word{i} two") for i in range(20)]  # 2 words
    events.append((21, 100, "u", "a real document with enough words to shingle"))
    rep.replay(_env(spark, events), batch_width=30, start_pos=0,
               max_pos=30)
    # only the real doc is indexed
    assert index.sigs_table.read(spark).count() == 1
    assert index.bands_table.read(spark).count() == 16
    # a short query doc produces no candidates (and no error)
    q = spark.createDataFrame(
        [(9000, "tiny doc"), (9001, "a real document with enough words to shingle")],
        "doc_id long, text string",
    )
    got = index.near_dups_of(spark, q, threshold=0.9).collect()
    assert {(r["query_id"], r["corpus_id"]) for r in got} == {(9001, 100)}
