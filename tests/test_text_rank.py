"""BM25 ranked retrieval (functions/text.py bm25_rank) and corpus-wide
paragraph dedup (functions/dedupe.py dedup_paragraphs).

BM25 expectations are hand-computed from the Okapi formula with the
Robertson idf ln(1 + (N - df + 0.5)/(df + 0.5)) — same constants the
gate oracle SQL pins, so a drift in either shows here first.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from transforms_for_apache_kafka_connect_spark.functions import (
    bm25_rank,
    dedup_paragraphs,
)

K1, B = 1.2, 0.75


def _bm25(corpus: dict[int, str], terms: list[str]) -> dict[int, float]:
    toks = {d: t.lower().split() for d, t in corpus.items()}
    n = len(corpus)
    avgdl = sum(len(v) for v in toks.values()) / n
    df = {
        t: sum(1 for v in toks.values() if t in v) for t in terms
    }
    out: dict[int, float] = {}
    for d, v in toks.items():
        s = 0.0
        for t in terms:
            tf = v.count(t)
            if tf == 0 or df[t] == 0:
                continue
            idf = math.log(1 + (n - df[t] + 0.5) / (df[t] + 0.5))
            s += idf * tf * (K1 + 1) / (
                tf + K1 * (1 - B + B * len(v) / avgdl)
            )
        if s > 0:
            out[d] = round(s, 4)
    return out


CORPUS = {
    0: "spark merge window scan",
    1: "merge merge merge filter",
    2: "the quick brown fox jumps over the lazy dog",
    3: "window window spark",
    4: "scan",
}


def test_bm25_matches_hand_formula(spark):
    df = spark.createDataFrame(
        list(CORPUS.items()), ["doc_id", "text"]
    )
    got = {
        r["doc_id"]: r["bm25"]
        for r in bm25_rank(df, ["spark", "merge", "window"]).collect()
    }
    assert got == _bm25(CORPUS, ["spark", "merge", "window"])


def test_bm25_top_k_cut_and_tiebreak(spark):
    # five identical docs: equal scores, tie broken by ascending id
    df = spark.createDataFrame(
        [(i, "spark x") for i in range(5)], ["doc_id", "text"]
    )
    rows = bm25_rank(df, ["spark"], top_k=3).collect()
    assert [r["doc_id"] for r in rows] == [0, 1, 2]
    assert len({r["bm25"] for r in rows}) == 1


def test_bm25_case_insensitive_and_no_match_excluded(spark):
    df = spark.createDataFrame(
        [(0, "SPARK Spark spark"), (1, "nothing here")],
        ["doc_id", "text"],
    )
    rows = bm25_rank(df, ["Spark"]).collect()
    # doc 1 scores 0 (sum over no rows) and never reaches the output
    assert [r["doc_id"] for r in rows] == [0]


def test_bm25_empty_terms_error(spark):
    df = spark.createDataFrame([(0, "x")], ["doc_id", "text"])
    with pytest.raises(ValueError, match="query_terms"):
        bm25_rank(df, [])


# ------------------------------------------------------------- paragraphs

PARA_DOCS = [
    (0, "A\n\nB\n\nC"),
    (1, "B\n\nD"),  # B first seen in doc 0
    (2, "A\n\nB"),  # fully redundant -> dropped entirely
    (3, "C\n\nE\n\nE"),  # within-doc repeat: E kept once
]


def test_paragraph_dedup_hand_case(spark):
    df = spark.createDataFrame(PARA_DOCS, ["doc_id", "text"])
    got = {
        r["doc_id"]: (
            r["text_deduped"], r["n_paras_kept"], r["n_paras_total"]
        )
        for r in dedup_paragraphs(df).collect()
    }
    assert got == {
        0: ("A\n\nB\n\nC", 3, 3),
        1: ("D", 1, 2),
        3: ("E", 1, 3),
    }


def test_paragraph_dedup_idempotent(spark):
    df = spark.createDataFrame(PARA_DOCS, ["doc_id", "text"])
    once = dedup_paragraphs(df).select(
        "doc_id", F.col("text_deduped").alias("text")
    )
    twice = dedup_paragraphs(once)
    got = {
        r["doc_id"]: r["text_deduped"] for r in twice.collect()
    }
    assert got == {0: "A\n\nB\n\nC", 1: "D", 3: "E"}
    # second pass keeps everything (no duplicates remain)
    assert all(
        r["n_paras_kept"] == r["n_paras_total"]
        for r in twice.collect()
    )


def test_paragraph_dedup_regex_metachar_separator(spark):
    # '. ' must be treated literally, not as regex any-char + space
    df = spark.createDataFrame(
        [(0, "ab. cd"), (1, "ab. ef")], ["doc_id", "text"]
    )
    got = {
        r["doc_id"]: r["text_deduped"]
        for r in dedup_paragraphs(df, sep=". ").collect()
    }
    assert got == {0: "ab. cd", 1: "ef"}


def test_paragraph_dedup_no_window_and_no_python_in_plan(spark):
    # the first-occurrence pick must be the skew-immune min(struct)
    # AGGREGATE, never a window over the paragraph hash, and the whole
    # plan stays JVM-side
    df = spark.createDataFrame(PARA_DOCS, ["doc_id", "text"])
    plan = (
        dedup_paragraphs(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" not in plan
    assert "Python" not in plan
    assert "partial_min" in plan  # map-side combine before the shuffle


def test_bm25_plan_is_jvm_side_take_ordered(spark):
    df = spark.createDataFrame(
        list(CORPUS.items()), ["doc_id", "text"]
    )
    plan = (
        bm25_rank(df, ["spark"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Python" not in plan
    assert "TakeOrderedAndProject" in plan  # top-k, never a full sort
    assert "CartesianProduct" not in plan


# ------------------------------------------------------ repetition stats

from transforms_for_apache_kafka_connect_spark.functions import (  # noqa: E402
    add_repetition_stats,
)


def test_repetition_stats_hand_case(spark):
    docs = [
        # 5 tokens -> 3 3-grams, all distinct; top token 'a' x2 of 5
        (0, "a b c a b"),
        # pure spam: 4 tokens, 2 3-grams both 'x x x' -> dup 1/2;
        # top token 4/4
        (1, "x x x x"),
        # too short for a 3-gram, top token 1/2
        (2, "y z"),
        (3, ""),  # empty -> both 0.0
        (4, "   "),  # whitespace-only -> both 0.0
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["dup_ngram_frac"], r["top_token_frac"])
        for r in add_repetition_stats(df).collect()
    }
    assert got == {
        0: (0.0, 0.4),
        1: (0.5, 1.0),
        2: (0.0, 0.5),
        3: (0.0, 0.0),
        4: (0.0, 0.0),
    }


def test_repetition_stats_case_insensitive_mode(spark):
    df = spark.createDataFrame([(0, "The THE the ok")], ["doc_id", "text"])
    r = add_repetition_stats(df).collect()[0]
    assert r["top_token_frac"] == 0.75


def test_repetition_stats_plan_has_no_shuffle_or_python(spark):
    df = spark.createDataFrame([(0, "a b c")], ["doc_id", "text"])
    plan = (
        add_repetition_stats(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan  # pure per-row expressions
    assert "Python" not in plan
