"""Deduplication family for training-data pipelines.

Exact (hash groupBy), MinHash+LSH (shingle -> minhash -> band ->
bucket-join -> jaccard verify), SimHash (JVM token hashing + Arrow
bit-fold), word-n-gram Jaccard, and embedding-cosine near-dup
(hyperplane LSH buckets + exact verify).

Scale notes: every candidate-generation step is a shuffle on a
*bucket key* (band hash / hyperplane signature), never an all-pairs
cross join; exact verification runs only within buckets. Map-side the
signatures are pure Column expressions over arrays (codegen'd);
SimHash's 64-bit fold is the one Arrow-vectorized pandas_udf (the
per-bit popcount loop is not expressible as a fixed-size expression
tree at acceptable cost).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


# ------------------------------------------------------------------ exact

def exact_duplicates(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, canonical_id, text_hash, group_size) for every row in a
    duplicate group of size >= 2; canonical = min id (one shuffle)."""
    h = F.sha2(F.col(text_col), 256)
    groups = (
        df.select(F.col(id_col), h.alias("text_hash"))
        .groupBy("text_hash")
        .agg(
            F.min(id_col).alias("canonical_id"),
            F.count(F.lit(1)).alias("group_size"),
            F.collect_list(id_col).alias("ids"),
        )
        .filter(F.col("group_size") >= 2)
    )
    return groups.select(
        F.explode("ids").alias(id_col), "canonical_id", "text_hash", "group_size"
    )


def dedup_paragraphs(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n\n",
) -> DataFrame:
    """Corpus-wide paragraph-level deduplication (the within/between-
    document exact-substring dedup of Lee et al., *Deduplicating
    Training Data Makes Language Models Better*, at paragraph
    granularity): every repeated paragraph keeps only its FIRST
    occurrence ordered by ``(id, position)``; documents are reassembled
    from their surviving paragraphs in original order. Documents whose
    every paragraph occurred earlier are dropped entirely (fully
    redundant documents).

    Returns ``(id_col, text_deduped, n_paras_kept, n_paras_total)``.

    Scale shape: the first-occurrence pick is a **map-side-combining
    aggregate** — ``groupBy(sha256(para)).agg(min(struct(id, pos,
    n_total, para)))`` — so a boilerplate paragraph repeated 10^9
    times collapses to one row per map task before the shuffle (a
    window over the paragraph hash would put the whole hot group in
    one task; the aggregate is skew-immune). ``min`` over the struct
    orders by the leading ``(id, pos)``, which is unique, so the
    winning row itself carries its paragraph text and document totals
    — no join back to the corpus. Reassembly is one more combining
    shuffle on the document id. Two shuffles total, both partial-agg.
    """
    import re as _re

    # split once per row: the regex scan over the full document is the
    # dominant per-row cost, so project the array and reuse it for
    # both the count and the explode
    arr = df.select(
        F.col(id_col),
        F.split(F.col(text_col), _re.escape(sep), -1).alias("__arr"),
    )
    paras = arr.select(
        F.col(id_col),
        F.size("__arr").alias("__n_total"),
        F.posexplode("__arr").alias("__pos", "__para"),
    )
    winners = (
        paras.groupBy(F.sha2(F.col("__para"), 256).alias("__h"))
        .agg(
            F.min(
                F.struct(
                    F.col(id_col), "__pos", "__n_total", "__para"
                )
            ).alias("__w")
        )
        .select("__w.*")
    )
    kept = F.struct("__pos", "__para")
    return (
        winners.groupBy(id_col, "__n_total")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(kept)),
                    lambda s: s["__para"],
                ),
                sep,
            ).alias("text_deduped"),
            F.count(F.lit(1)).alias("n_paras_kept"),
        )
        .select(
            id_col,
            "text_deduped",
            "n_paras_kept",
            F.col("__n_total").alias("n_paras_total"),
        )
    )


# -------------------------------------------------------------- shingles

def word_shingles(col: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles (lowercased), JVM-side.

    Docs with fewer than n words yield an EMPTY array — the k < 1 case
    must short-circuit, because ``sequence(1, 0)`` is a DESCENDING
    [1, 0] sequence in Spark and the 0 would crash ``slice`` (start
    must be nonzero). Latent until short docs reached this expression
    unguarded; regression-pinned in tests/test_functions.py."""
    words = F.split(F.lower(F.trim(col)), r"\s+")
    k = F.size(words) - (n - 1)
    grams = F.when(
        k >= 1,
        F.transform(
            F.sequence(F.lit(1), k),
            lambda i: F.concat_ws(" ", F.slice(words, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.array_distinct(grams)


def jaccard_expr(a: Column, b: Column) -> Column:
    inter = F.size(F.array_intersect(a, b))
    union = F.size(F.array_union(a, b))
    return F.when(union > 0, inter / union).otherwise(F.lit(0.0))


def ngram_jaccard_pairs(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.8,
    block_col: str | None = None,
    allow_full_cross: bool = False,
    num_hashes: int = 32,
    bands: int = 32,
    persist: bool = True,
) -> DataFrame:
    """Word-n-gram Jaccard >= threshold pairs, safe by default at scale.

    Candidate generation, in priority order:

    * ``block_col`` given: equi-join within the caller's blocking key.
    * default: MinHash-band blocking over the same shingles — with the
      default r = num_hashes/bands = 1, any shared min-hash makes a
      candidate pair, so the miss probability for a pair at similarity
      s is (1-s)^num_hashes (~2e-13 at s=0.6) while exact Jaccard
      verification keeps precision exact. Every shuffle is on a band
      key — never an all-pairs product.
    * ``allow_full_cross=True``: explicit opt-in to the unblocked
      O(n²) self-join (exhaustive baseline for tiny inputs ONLY; at
      corpus scale this is a cartesian product).
    """
    if block_col or allow_full_cross:
        base = df.select(
            F.col(id_col).alias("id"),
            word_shingles(F.col(text_col), n).alias("sh"),
            *( [F.col(block_col).alias("blk")] if block_col else [] ),
        )
        a, b = base.alias("a"), base.alias("b")
        cond = F.col("a.id") < F.col("b.id")
        if block_col:
            joined = a.join(b, (F.col("a.blk") == F.col("b.blk")) & cond)
        else:
            joined = a.join(b, cond)
        return (
            joined.select(
                F.col("a.id").alias("id_a"),
                F.col("b.id").alias("id_b"),
                F.round(jaccard_expr(F.col("a.sh"), F.col("b.sh")), 6).alias("jaccard"),
            )
            .filter(F.col("jaccard") >= threshold)
        )

    sig = df.select(
        F.col(id_col).alias("id"),
        word_shingles(F.col(text_col), n).alias("sh"),
        minhash_signature(F.col(text_col), num_hashes, n).alias("sig"),
    )
    if persist:
        # the signature frame feeds candidate generation AND the verify
        # join; persisting avoids recomputing shingles+signatures. The
        # cache lives until the SESSION ends — callers invoking this in
        # a loop should pass persist=False (recompute) or unpersist via
        # spark.catalog.clearCache() between shards.
        sig = sig.persist()
    verified = _verify_jaccard(
        _band_candidates(sig, num_hashes, bands), sig, threshold
    )
    return verified


# -------------------------------------------------------------- minhash

def minhash_signature(col: Column, num_hashes: int = 32, n: int = 3) -> Column:
    """Array of ``num_hashes`` min-hashes over word n-gram shingles.

    Each family member must hash the SHINGLE seeded by the family
    index i — and only that. The lambda passed to ``F.transform`` must
    stay single-argument: a two-arg lambda (e.g. the ``lambda s, i=i``
    default-capture idiom) is interpreted by Spark as
    ``(element, array_index)``, silently rebinding i to the shingle's
    POSITION — every family member degenerates to the same expression
    and the signature only matches on exact duplicates (caught by the
    near-dup screening example; regression-pinned in
    tests/test_functions.py)."""
    sh = word_shingles(col, n)

    def member(i: int) -> Column:
        return F.array_min(F.transform(sh, lambda s: F.xxhash64(s, F.lit(i))))

    return F.array(*[member(i) for i in range(num_hashes)])


def band_rows(
    sig_df: DataFrame, id_name: str, num_hashes: int, bands: int
) -> DataFrame:
    """(id, sig) -> one row per (id, band) with the band hash ``bh``.

    THE banding expression — shared by the batch LSH operator here and
    the changelog-maintained index (streaming/neardup_index.py), which
    must produce bit-identical band hashes or index queries and batch
    results silently desynchronize."""
    assert num_hashes % bands == 0
    r = num_hashes // bands
    return sig_df.select(
        F.col(id_name),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band"),
                        F.xxhash64(
                            F.concat_ws(
                                ",",
                                *[
                                    F.element_at(F.col("sig"), bi * r + j + 1).cast("string")
                                    for j in range(r)
                                ],
                            )
                        ).alias("bh"),
                    )
                    for bi in range(bands)
                ]
            )
        ).alias("b"),
    ).select(id_name, "b.band", "b.bh")


def _band_candidates(sig_df: DataFrame, num_hashes: int, bands: int) -> DataFrame:
    """(id, sig) -> distinct candidate pairs (id_a < id_b) whose
    signatures collide in >=1 band of r = num_hashes/bands rows.
    Candidate generation = explode bands -> shuffle on (band,
    band_hash) -> equi-join: every shuffle is on a bucket key, never an
    all-pairs product."""
    banded = band_rows(sig_df, "id", num_hashes, bands)

    x, y = banded.alias("x"), banded.alias("y")
    return (
        x.join(
            y,
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.bh") == F.col("y.bh"))
            & (F.col("x.id") < F.col("y.id")),
        )
        .select(F.col("x.id").alias("id_a"), F.col("y.id").alias("id_b"))
        .distinct()
    )


def _verify_jaccard(
    candidates: DataFrame, base: DataFrame, threshold: float
) -> DataFrame:
    """Join shingle arrays back by id and keep exact Jaccard >= t."""
    sa = base.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"))
    sb = base.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"))
    return (
        candidates.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(jaccard_expr(F.col("sh_a"), F.col("sh_b")), 6).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def minhash_lsh_duplicates(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 8,
    n: int = 3,
    threshold: float = 0.7,
    persist: bool = True,
) -> DataFrame:
    """MinHash + banded LSH near-dup pairs, verified by exact Jaccard.

    rows-per-band r = num_hashes/bands; collision prob ~ 1-(1-s^r)^b.
    ``persist`` caches the signature frame for the candidate+verify
    joins (see ngram_jaccard_pairs for the cache-lifecycle note).
    """
    base = df.select(
        F.col(id_col).alias("id"),
        word_shingles(F.col(text_col), n).alias("sh"),
        minhash_signature(F.col(text_col), num_hashes, n).alias("sig"),
    )
    if persist:
        base = base.persist()
    return _verify_jaccard(
        _band_candidates(base, num_hashes, bands), base, threshold
    )


# --------------------------------------------------------------- simhash

@F.pandas_udf(T.LongType())
def _simhash_fold(token_hashes: pd.Series) -> pd.Series:
    """Arrow-vectorized 64-bit SimHash fold, vectorized across the
    WHOLE batch (not per row): flatten every row's token hashes into
    one array, expand to a (total_tokens, 64) bit matrix, segment-sum
    per row with ``np.add.reduceat``, and take the sign bit vector.
    The only per-row Python work is collecting array lengths — all bit
    math is batch-level numpy."""
    n = len(token_hashes)
    out = np.zeros(n, dtype=np.int64)
    rows = [
        None if h is None else np.asarray(h, dtype=np.int64)
        for h in token_hashes
    ]
    lens = np.array([0 if r is None else len(r) for r in rows], dtype=np.int64)
    nz = lens > 0
    if not nz.any():
        return pd.Series(out)
    flat = np.concatenate([r for r in rows if r is not None and len(r)])
    bits = (
        (flat.view(np.uint64)[:, None] >> np.arange(64, dtype=np.uint64)) & 1
    ).astype(np.int64)
    seg_starts = np.concatenate(([0], np.cumsum(lens[nz])[:-1]))
    sums = np.add.reduceat(bits, seg_starts, axis=0)  # (n_nonzero_rows, 64)
    votes = 2 * sums - lens[nz][:, None]
    sigs = ((votes > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum(
        axis=1, dtype=np.uint64
    )
    out[nz] = sigs.view(np.int64)
    return pd.Series(out)


def simhash_signatures(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, simhash) — token hashing JVM-side, bit fold via Arrow."""
    tokens = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    token_hashes = F.transform(tokens, lambda t: F.xxhash64(t))
    return df.select(
        F.col(id_col),
        _simhash_fold(token_hashes).alias("simhash"),
    )


def hamming64(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b))


# -------------------------------------------------- embedding near-dup

def _hyperplane_bits(vec: Column, dim: int, n_planes: int, seed: int) -> Column:
    """Deterministic random-hyperplane sign bits as a packed long.

    Hyperplane coefficients are pseudo-random in {-1,+1} derived from
    xxhash-like mixing of (plane, coord) — computed as a Column
    expression so the signature is JVM-side."""
    def coeff_stream(p: int) -> Column:
        # deterministic ±1 coefficient stream per plane. The transform
        # lambda must stay SINGLE-argument: a two-arg lambda is
        # (element, array_index) to Spark, which would rebind p to the
        # coordinate index and collapse every plane into the same one
        # (2 buckets total — the all-pairs blowup LSH exists to avoid).
        # Same arity bug class as minhash_signature; regression-pinned.
        return F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda i: (
                F.when(
                    F.pmod(F.xxhash64(i, F.lit(p), F.lit(seed)), F.lit(2)) == 0, 1.0
                ).otherwise(-1.0)
            ),
        )

    bits = []
    for p in range(n_planes):
        dot = F.aggregate(
            F.zip_with(vec, coeff_stream(p), lambda v, c: v * c),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bits.append(F.when(dot >= 0, F.lit(1)).otherwise(F.lit(0)) * (2**p))
    return sum(bits[1:], bits[0]).cast("long")


def embedding_near_duplicates(
    df: DataFrame,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int,
    threshold: float = 0.95,
    n_planes: int = 12,
    seed: int = 42,
) -> DataFrame:
    """Cosine near-dup pairs via hyperplane-LSH buckets + exact verify.

    Bucket key = packed sign bits; near-identical vectors agree on all
    planes with high probability. Exact cosine runs only within buckets.
    """
    from transforms_for_apache_kafka_connect_spark.functions.similarity import (
        cosine_expr,
    )

    base = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        _hyperplane_bits(F.col(vec_col), dim, n_planes, seed).alias("bucket"),
    )
    a, b = base.alias("a"), base.alias("b")
    return (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.round(cosine_expr(F.col("a.v"), F.col("b.v")), 6).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


# ------------------------------------------------- near-dup clustering

def connected_components(
    pairs: DataFrame,
    *,
    left_col: str = "id_a",
    right_col: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """Connected components over a near-duplicate pair list:
    ``(id, component)`` with component = the smallest id reachable.

    Iterative min-label propagation: each round every vertex adopts the
    minimum label in its closed neighborhood (one shuffle join + one
    aggregate per round), stopping when a round changes nothing. Rounds
    needed = graph diameter — near-dup graphs are unions of small
    quasi-cliques (copies of the same document), so 2-4 rounds in
    practice. The convergence check rides the SAME aggregate (count of
    changed labels), not an extra pass. For adversarial long-chain
    graphs at 10^10 edges, switch to the alternating large-star/
    small-star formulation (Kiveris et al.) — same join shape, fewer
    rounds; this propagation is the simple special case that matches
    the dedup workload.
    """
    # iterative algorithms MUST truncate lineage each round —
    # localCheckpoint (eager) materializes the round's result and cuts
    # the plan, or round N's plan contains all N-1 predecessors and the
    # driver melts before the data does. (At cluster scale with
    # executor loss in play, swap for reliable checkpoint() on a
    # checkpoint dir — same shape.)
    edges = (
        pairs.select(
            F.col(left_col).alias("src"), F.col(right_col).alias("dst")
        )
        .union(
            pairs.select(
                F.col(right_col).alias("src"), F.col(left_col).alias("dst")
            )
        )
        .distinct()
        .localCheckpoint()
    )
    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("component", F.col("id"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        neighbor_min = (
            edges.join(labels, edges.dst == labels.id, "inner")
            .groupBy("src")
            .agg(F.min("component").alias("nbr_min"))
        )
        stepped = (
            labels.join(neighbor_min, labels.id == neighbor_min.src, "left")
            .select(
                "id",
                F.least(
                    F.col("component"),
                    F.coalesce(F.col("nbr_min"), F.col("component")),
                ).alias("component"),
                F.coalesce(
                    F.col("nbr_min") < F.col("component"), F.lit(False)
                ).alias("__changed"),
            )
            .localCheckpoint()  # eager: one materialization per round
        )
        changed = stepped.filter(F.col("__changed")).limit(1).count()
        labels = stepped.drop("__changed")
        if changed == 0:
            return labels
    # silent non-convergence would split true components into several
    # "canonical" clusters — a dedup pipeline would then keep duplicate
    # copies while believing it deduped. Fail loudly instead.
    raise RuntimeError(
        f"connected_components did not converge within max_iter="
        f"{max_iter} rounds; the pair graph has a longer chain than "
        f"expected — raise max_iter (rounds needed = graph diameter)"
    )


def near_dup_clusters(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 16,
    n: int = 3,
    threshold: float = 0.8,
    max_iter: int = 25,
) -> DataFrame:
    """End-to-end near-dup clustering: MinHash-LSH pairs → connected
    components → one row per clustered document with its canonical
    representative (= the smallest id in the component, the row a
    dedup pipeline keeps). Documents with no near-dup stay absent —
    they are their own cluster trivially."""
    pairs = minhash_lsh_duplicates(
        df, text_col=text_col, id_col=id_col,
        num_hashes=num_hashes, bands=bands, n=n, threshold=threshold,
    )
    comp = connected_components(pairs, max_iter=max_iter)
    return comp.select(
        F.col("id").alias(id_col), F.col("component").alias("canonical_id")
    )
