"""Text analysis for large-scale training-data pipelines.

All JVM-side Column expressions (no Python in the hot path): language
ID (stopword-marker heuristic), quality scoring (length / punctuation /
stopword ratios), token counting (whitespace + a BPE-ish regex), and
document fingerprinting (normalized rolling hash).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: BPE-ish token pattern: word pieces OR single non-space punctuation
BPE_TOKEN_PATTERN = r"[A-Za-z0-9_]+|[^\sA-Za-z0-9_]"

#: tiny marker-word sets per language (whitespace-delimited match)
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is", "that", "with", "for"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "mit", "ein"],
    "fr": ["le", "la", "et", "les", "des", "est", "dans", "une"],
    "es": ["el", "la", "los", "que", "es", "una", "para", "con"],
}

STOPWORDS_EN = LANG_MARKERS["en"] + ["a", "in", "it", "on", "as", "are", "was"]


def token_count(col: Column, mode: str = "whitespace") -> Column:
    """Token count: 'whitespace' split or 'bpe' regex pieces."""
    if mode == "whitespace":
        trimmed = F.trim(col)
        return F.when(trimmed == "", F.lit(0)).otherwise(
            F.size(F.split(trimmed, r"\s+"))
        )
    if mode == "bpe":
        return F.regexp_count(col, F.lit(BPE_TOKEN_PATTERN))
    raise ValueError(f"unknown token mode: {mode}")


def _marker_hits(col: Column, words: list[str]) -> Column:
    # count whitespace-delimited marker-word occurrences, case-insensitive
    pat = r"(?i)\b(?:" + "|".join(words) + r")\b"
    return F.regexp_count(col, F.lit(pat))


def detect_lang(col: Column, langs: list[str] | None = None) -> Column:
    """Argmax of marker-word hit counts; 'und' (undetermined) if zero."""
    langs = langs or list(LANG_MARKERS)
    scores = [(_marker_hits(col, LANG_MARKERS[l]).alias(l), l) for l in langs]
    best = F.greatest(*[s for s, _ in scores]) if len(scores) > 1 else scores[0][0]
    result = F.lit("und")
    # first language reaching the max wins (deterministic order)
    for score, lang in reversed(scores):
        result = F.when((score == best) & (best > 0), F.lit(lang)).otherwise(result)
    return result


def fingerprint(col: Column) -> Column:
    """Normalized document fingerprint: xxhash64 of the
    lowercased, whitespace-collapsed text — exact-dup detection robust
    to case/whitespace noise."""
    normalized = F.regexp_replace(F.lower(F.trim(col)), r"\s+", " ")
    return F.xxhash64(normalized)


def add_text_stats(
    df: DataFrame, text_col: str = "text", prefix: str = ""
) -> DataFrame:
    """Append quality-scoring columns (all codegen'd, one pass)."""
    c = F.col(text_col)
    n_chars = F.length(c)
    n_tokens = token_count(c)
    n_punct = F.regexp_count(c, F.lit(r"[^\w\s]"))
    stop_hits = _marker_hits(c, STOPWORDS_EN)
    p = prefix
    return (
        df.withColumn(p + "n_chars_computed", n_chars)
        .withColumn(p + "n_tokens", n_tokens)
        .withColumn(p + "n_tokens_bpe", token_count(c, "bpe"))
        .withColumn(
            p + "punct_ratio",
            F.when(n_chars > 0, n_punct / n_chars).otherwise(F.lit(0.0)),
        )
        .withColumn(
            p + "stopword_ratio",
            F.when(n_tokens > 0, stop_hits / n_tokens).otherwise(F.lit(0.0)),
        )
        .withColumn(
            p + "quality_score",
            F.round(
                F.least(n_tokens / 100.0, F.lit(1.0)) * 0.5
                + F.when(n_tokens > 0, stop_hits / n_tokens).otherwise(0.0) * 2.0
                + F.when(
                    n_chars > 0, 1.0 - F.least(n_punct / n_chars * 4, F.lit(1.0))
                ).otherwise(0.0)
                * 0.5,
                6,
            ),
        )
    )


def add_repetition_stats(
    df: DataFrame, text_col: str = "text", prefix: str = "", n: int = 3
) -> DataFrame:
    """Gopher-style within-document repetition metrics (quality
    filters for training corpora):

    * ``dup_ngram_frac`` — fraction of word ``n``-grams that are
      repeats (``1 - distinct/total``); boilerplate and looped text
      score high. 0.0 for docs with no ``n``-gram.
    * ``top_token_frac`` — the most frequent token's share of all
      tokens; degenerate "word word word ..." spam scores near 1.0.
      0.0 for empty docs.

    Scale shape: both are pure per-row Column expressions — zero
    shuffles, zero Python. The token mode is computed by a linear
    ``aggregate`` fold over the sorted token array (longest equal run),
    not by exploding the corpus into a (doc, token) shuffle.
    """
    from transforms_for_apache_kafka_connect_spark.functions.dedupe import (
        word_shingles,
    )

    c = F.col(text_col)
    is_empty = F.trim(c) == ""
    words = F.split(F.lower(F.trim(c)), r"\s+")
    grams_total = F.greatest(F.size(words) - (n - 1), F.lit(0))
    grams_distinct = F.size(word_shingles(c, n))
    dup_frac = F.when(
        ~is_empty & (grams_total > 0),
        F.round(1.0 - grams_distinct / grams_total, 6),
    ).otherwise(F.lit(0.0))
    # mode count = longest equal run in the sorted array: a linear fold
    # (tokens after split of trimmed text are never "", so "" is a safe
    # initial sentinel for prev)
    run0 = F.struct(
        F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
    )

    def _step(a, x):
        run = F.when(x == a["prev"], a["run"] + 1).otherwise(F.lit(1))
        return F.struct(
            x.alias("prev"),
            run.alias("run"),
            F.greatest(a["best"], run).alias("best"),
        )

    mode_n = F.aggregate(
        F.array_sort(words), run0, _step, lambda a: a["best"]
    )
    top_frac = F.when(
        ~is_empty, F.round(mode_n / F.size(words), 6)
    ).otherwise(F.lit(0.0))
    p = prefix
    return df.withColumn(p + "dup_ngram_frac", dup_frac).withColumn(
        p + "top_token_frac", top_frac
    )


def bm25_rank(
    docs: DataFrame,
    query_terms: list[str],
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    top_k: int = 20,
    round_to: int = 4,
) -> DataFrame:
    """BM25 ranked retrieval: score every document against a bag of
    query terms and return the ``top_k`` by Okapi BM25
    (Robertson/Walker idf variant ``ln(1 + (N - df + 0.5)/(df + 0.5))``,
    always positive).

    Scale shape (the part that matters at 100 TB):

    * the tokenizer is a codegen'd ``explode(split(...))`` over the
      scan, and the ``isin(query_terms)`` filter sits directly on the
      exploded tokens — only matching (doc, term) rows ever reach a
      shuffle, so the shuffled volume is bounded by |Q| × matching
      docs, not by corpus token count;
    * per-document length rides the projection alongside the explode
      (``dl`` is computed from the same row), so no join back to the
      corpus is ever needed;
    * document frequencies are a ≤|Q|-row aggregate, broadcast back;
    * corpus-level N / avgdl is a 1-row aggregate cross-joined in
      (Catalyst broadcasts single-row sides);
    * the final cut is ``orderBy(...).limit(k)`` — planned as a
      TakeOrdered, never a full sort.

    Scores are rounded to ``round_to`` decimals *before* ordering so
    ranking is reproducible across partitionings (float sum order);
    ties break on ascending ``id_col``.
    """
    if not query_terms:
        raise ValueError("bm25_rank: query_terms must be non-empty")
    terms = sorted({t.lower() for t in query_terms})
    c = F.col(text_col)
    toks = docs.select(
        F.col(id_col),
        token_count(c).alias("__dl"),
        F.explode(F.split(F.lower(F.trim(c)), r"\s+")).alias("__tok"),
    ).filter(F.col("__tok").isin(terms))
    tf = toks.groupBy(id_col, "__dl", "__tok").agg(
        F.count(F.lit(1)).alias("__tf")
    )
    dfreq = tf.groupBy("__tok").agg(F.count(F.lit(1)).alias("__df"))
    stats = docs.agg(
        F.count(F.lit(1)).alias("__n"),
        F.avg(token_count(c)).alias("__avgdl"),
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("__n") - F.col("__df") + 0.5) / (F.col("__df") + 0.5)
    )
    tf_part = (F.col("__tf") * (k1 + 1)) / (
        F.col("__tf")
        + k1 * (1 - b + b * F.col("__dl") / F.col("__avgdl"))
    )
    return (
        tf.join(F.broadcast(dfreq), "__tok")
        .crossJoin(F.broadcast(stats))
        .groupBy(id_col)
        .agg(F.round(F.sum(idf * tf_part), round_to).alias("bm25"))
        .orderBy(F.desc("bm25"), F.asc(id_col))
        .limit(top_k)
    )


def prepare_training_docs(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang: str = "en",
    min_quality: float = 0.9,
) -> DataFrame:
    """End-to-end training-data preparation pipeline: exact dedupe →
    language filter → quality floor, in ONE fused plan.

    Scale shape: the dedupe is a single shuffle on sha256(text) with a
    map-side-combining ``min_by`` (the whole surviving row rides the
    aggregate — no second join back to the input), and every filter/
    scoring expression after it is a codegen'd Column over the
    deduplicated (smaller) survivor set. At 100 TB: one wide shuffle
    keyed by content hash, then embarrassingly parallel scoring.

    Returns (id, lang_detected, n_tokens, quality_score) for the kept
    documents — the canonical (min-id) copy of each distinct text that
    scores as ``lang`` and clears ``min_quality``.
    """
    # shuffle only what the output needs: (id, text) — at corpus scale
    # the text column dominates and is unavoidable (the quality/lang
    # scoring runs post-dedupe), but side columns stay pruned
    packed = F.struct(F.col(id_col), F.col(text_col))
    canonical = (
        df.groupBy(F.sha2(F.col(text_col), 256).alias("__text_sha"))
        .agg(F.min_by(packed, F.col(id_col)).alias("__r"))
        .select("__r.*")
    )
    scored = add_text_stats(canonical, text_col=text_col).withColumn(
        "lang_detected", detect_lang(F.col(text_col))
    )
    return scored.filter(
        (F.col("lang_detected") == lang)
        & (F.col("quality_score") >= min_quality)
    ).select(id_col, "lang_detected", "n_tokens", "quality_score")


#: default PII patterns — deliberately conservative, RE2-compatible
#: (no lookaround) so the same pattern text runs identically on Spark
#: (java.util.regex) and any RE2-based oracle engine
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
    "intl_phone": r"\+\d{7,15}\b",
}


def scrub_pii(
    df: DataFrame,
    cols: list[str],
    *,
    patterns: dict[str, str] | None = None,
    replacement: str = "<PII>",
) -> DataFrame:
    """Redact PII-shaped spans (C4-style pre-training hygiene): each
    pattern is applied as a global ``regexp_replace`` in dict order.

    Scale shape: pure per-row Column expressions — zero shuffles, zero
    Python; a 100 TB scrub is exactly the cost of one scan + rewrite.
    Patterns stay in the conservative RE2-compatible subset (character
    classes, bounded repeats, ``\\b``) — no lookaround — so the scrub
    is portable across regex engines and cannot backtrack
    pathologically on adversarial documents.
    """
    pats = patterns if patterns is not None else PII_PATTERNS
    out = df
    for c in cols:
        expr = F.col(c)
        for pat in pats.values():
            expr = F.regexp_replace(expr, pat, replacement)
        out = out.withColumn(c, expr)
    return out


def decontaminate(
    train: DataFrame,
    eval_df: DataFrame,
    *,
    n: int = 13,
    id_col: str = "doc_id",
    text_col: str = "text",
    eval_text_col: str | None = None,
    mode: str = "flag",
) -> DataFrame:
    """Eval-set decontamination by word n-gram overlap (the GPT-3-style
    13-gram rule): a training document is contaminated iff it shares
    at least one lowercased word ``n``-gram with ANY eval document.

    ``mode='flag'`` appends boolean ``contaminated``; ``mode='drop'``
    removes contaminated rows.

    Scale shape (100 TB train corpus vs a small eval set): the eval
    side collapses to a DISTINCT n-gram hash set and is broadcast —
    the train side explodes to (id, gram-hash) pairs but those flow
    scan → broadcast-semi-join → distinct(id), so the only exchange
    carries contaminated ids (bounded by the train row count, usually
    a tiny fraction), never the exploded grams. Gram comparison is on
    ``xxhash64`` of the gram text: 64-bit collisions at eval-set scale
    (≤ 10^9 grams) are ~1e-10-probable per doc and only ever
    over-flag, which is the safe direction for decontamination.
    """
    if mode not in ("flag", "drop"):
        raise ValueError(f"mode must be 'flag' or 'drop', got {mode!r}")
    from transforms_for_apache_kafka_connect_spark.functions.dedupe import (
        word_shingles,
    )

    ecol = eval_text_col or text_col
    eval_grams = (
        eval_df.select(
            F.explode(word_shingles(F.col(ecol), n)).alias("__gram")
        )
        .select(F.xxhash64("__gram").alias("__gh"))
        .distinct()
    )
    hit_ids = (
        train.select(
            F.col(id_col),
            F.explode(word_shingles(F.col(text_col), n)).alias("__gram"),
        )
        .select(id_col, F.xxhash64("__gram").alias("__gh"))
        .join(F.broadcast(eval_grams), "__gh", "left_semi")
        .select(id_col)
        .distinct()
        .withColumn("__contaminated", F.lit(True))
    )
    flagged = train.join(hit_ids, id_col, "left").withColumn(
        "contaminated", F.coalesce(F.col("__contaminated"), F.lit(False))
    ).drop("__contaminated")
    if mode == "drop":
        return flagged.filter(~F.col("contaminated")).drop("contaminated")
    return flagged
