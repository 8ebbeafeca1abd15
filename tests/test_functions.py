"""Tests for the training-data pipeline ops: dedup family, similarity
search, text analysis, multimodal plumbing."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from transforms_for_apache_kafka_connect_spark.functions import (
    add_text_stats,
    brute_force_topk,
    detect_lang,
    exact_duplicates,
    fingerprint,
    ivf_topk,
    lsh_topk,
    minhash_lsh_duplicates,
    ngram_jaccard_pairs,
    simhash_signatures,
    token_count,
    embedding_near_duplicates,
)
from transforms_for_apache_kafka_connect_spark.functions.dedupe import (
    hamming64,
    jaccard_expr,
    word_shingles,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").cache()


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").cache()


# ------------------------------------------------------------------ text

def test_token_count(spark):
    df = spark.createDataFrame(
        [("hello world foo",), ("  ",), ("a,b c!",)], "text: string"
    )
    out = df.select(
        token_count(F.col("text")).alias("ws"),
        token_count(F.col("text"), "bpe").alias("bpe"),
    ).collect()
    assert [r["ws"] for r in out] == [3, 0, 2]
    # bpe: a , b c ! -> 5 pieces
    assert out[2]["bpe"] == 5


def test_detect_lang(spark):
    df = spark.createDataFrame(
        [
            ("the cat and the dog went to the park",),
            ("der Hund und die Katze ist nicht da",),
            ("le chat et les chiens dans la maison",),
            ("zzz qqq xxx",),
        ],
        "text: string",
    )
    out = [r[0] for r in df.select(detect_lang(F.col("text"))).collect()]
    assert out == ["en", "de", "fr", "und"]


def test_fingerprint_whitespace_case_invariant(spark):
    df = spark.createDataFrame(
        [("Hello   World",), ("hello world",), ("different",)], "text: string"
    )
    fps = [r[0] for r in df.select(fingerprint(F.col("text"))).collect()]
    assert fps[0] == fps[1] != fps[2]


def test_text_stats(docs):
    out = add_text_stats(docs).select(
        "doc_id", "n_chars", "n_chars_computed", "n_tokens", "punct_ratio",
        "stopword_ratio", "quality_score",
    )
    rows = out.collect()
    assert all(r["n_chars"] == r["n_chars_computed"] for r in rows)
    assert all(0 <= r["punct_ratio"] <= 1 for r in rows)
    assert all(r["n_tokens"] > 0 for r in rows)


# ----------------------------------------------------------------- dedup

def test_exact_duplicates(spark, docs):
    dup = docs.limit(10).withColumn("doc_id", F.col("doc_id") + 100_000)
    out = exact_duplicates(docs.unionByName(dup)).collect()
    assert len(out) == 20  # 10 groups x 2 members
    groups = {}
    for r in out:
        groups.setdefault(r["text_hash"], []).append(r)
    for g in groups.values():
        assert len(g) == 2
        assert all(r["canonical_id"] == min(x["doc_id"] for x in g) for r in g)


def test_exact_duplicates_none(docs):
    assert exact_duplicates(docs).count() == 0


def test_word_shingles_and_jaccard(spark):
    df = spark.createDataFrame(
        [("a b c d e", "a b c d x")], "t1: string, t2: string"
    )
    row = df.select(
        word_shingles(F.col("t1")).alias("s1"),
        word_shingles(F.col("t2")).alias("s2"),
    ).select(jaccard_expr(F.col("s1"), F.col("s2")).alias("j")).first()
    # shingles: {abc,bcd,cde} vs {abc,bcd,cdx}: inter 2, union 4
    assert abs(row["j"] - 0.5) < 1e-9


def test_ngram_jaccard_pairs_finds_near_dups(spark, docs):
    # mutate 5 docs slightly: append one word -> high but <1 jaccard
    mutated = (
        docs.limit(5)
        .withColumn("doc_id", F.col("doc_id") + 100_000)
        .withColumn("text", F.concat(F.col("text"), F.lit(" extraword")))
    )
    out = ngram_jaccard_pairs(
        docs.unionByName(mutated), threshold=0.6
    ).collect()
    pairs = {(r["id_a"], r["id_b"]) for r in out}
    expect = {(i, i + 100_000) for i in range(5)}
    assert expect <= pairs
    assert all(0.6 <= r["jaccard"] < 1.0 for r in out if r["id_b"] >= 100_000)


def test_ngram_default_blocking_safe_and_equivalent(spark, docs):
    # the DEFAULT candidate path must never plan an all-pairs product —
    # a forgotten block_col at corpus scale would otherwise be a
    # cartesian join — and on this fixture its verified output equals
    # the exhaustive opt-in path (r=1 bands: miss prob ~(1-s)^32)
    mutated = (
        docs.limit(6)
        .withColumn("doc_id", F.col("doc_id") + 100_000)
        .withColumn("text", F.concat(F.col("text"), F.lit(" extraword")))
    )
    both = docs.limit(60).unionByName(mutated)
    blocked = ngram_jaccard_pairs(both, threshold=0.6)
    plan = blocked._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    got = {(r["id_a"], r["id_b"], r["jaccard"]) for r in blocked.collect()}
    brute = {
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in ngram_jaccard_pairs(
            both, threshold=0.6, allow_full_cross=True
        ).collect()
    }
    assert got == brute
    # while the opt-in path really is the unblocked product
    cross_plan = (
        ngram_jaccard_pairs(both, threshold=0.6, allow_full_cross=True)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" in cross_plan or "BroadcastNestedLoopJoin" in cross_plan


def test_minhash_lsh_matches_bruteforce(spark, docs):
    mutated = (
        docs.limit(8)
        .withColumn("doc_id", F.col("doc_id") + 100_000)
        .withColumn("text", F.concat(F.col("text"), F.lit(" tail")))
    )
    both = docs.limit(60).unionByName(mutated)
    lsh = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_duplicates(both, threshold=0.7).collect()
    }
    brute = {
        (r["id_a"], r["id_b"])
        for r in ngram_jaccard_pairs(
            both, threshold=0.7, allow_full_cross=True
        ).collect()
    }
    # LSH verified output is a subset of brute force; recall high for
    # near-identical docs (jaccard ~0.9 -> P(collide) ~ 1)
    assert lsh <= brute
    assert len(lsh) >= len(brute) * 0.8


def test_simhash(spark, docs):
    sigs = simhash_signatures(docs.limit(20)).collect()
    assert len({r["simhash"] for r in sigs}) > 1
    # near-identical docs -> small hamming distance
    base = docs.limit(3)
    mutated = base.withColumn("doc_id", F.col("doc_id") + 100_000).withColumn(
        "text", F.concat(F.col("text"), F.lit(" x"))
    )
    s1 = simhash_signatures(base).withColumnRenamed("simhash", "h1")
    s2 = (
        simhash_signatures(mutated)
        .withColumn("doc_id", F.col("doc_id") - 100_000)
        .withColumnRenamed("simhash", "h2")
    )
    joined = s1.join(s2, "doc_id").select(
        hamming64(F.col("h1"), F.col("h2")).alias("d")
    )
    assert all(r["d"] <= 16 for r in joined.collect())


def test_simhash_matches_pure_python_oracle(spark, docs):
    # rows+value oracle for the Arrow fold (VERDICT r01 #7): token
    # hashes come from the same JVM xxhash64 expression; the 64-bit
    # SimHash fold is recomputed in plain Python and must match bit-f-bit
    # (covers empty and single-token docs via extra fixture rows)
    from transforms_for_apache_kafka_connect_spark.functions.dedupe import (
        simhash_signatures,
    )

    extra = spark.createDataFrame(
        [(9001, ""), (9002, "one"), (9003, "  ")],
        "doc_id long, text string",
    )
    base = docs.limit(30).select("doc_id", "text").unionByName(extra)
    tokens = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    hashes = {
        r["doc_id"]: r["th"]
        for r in base.select(
            "doc_id", F.transform(tokens, lambda t: F.xxhash64(t)).alias("th")
        ).collect()
    }

    def py_simhash(hs):
        if not hs:
            return 0
        votes = [0] * 64
        for h in hs:
            u = h & 0xFFFFFFFFFFFFFFFF
            for b in range(64):
                votes[b] += 1 if (u >> b) & 1 else -1
        sig = 0
        for b in range(64):
            if votes[b] > 0:
                sig |= 1 << b
        return sig - (1 << 64) if sig >= (1 << 63) else sig

    got = {
        r["doc_id"]: r["simhash"]
        for r in simhash_signatures(base).collect()
    }
    assert set(got) == set(hashes)
    for doc_id, hs in hashes.items():
        assert got[doc_id] == py_simhash(hs), f"doc {doc_id}"


def test_embedding_near_duplicates(spark, emb):
    # inject exact copies: cosine 1.0, must be found
    dup = emb.limit(5).withColumn("vec_id", F.col("vec_id") + 100_000)
    out = embedding_near_duplicates(
        emb.unionByName(dup), dim=64, threshold=0.999
    ).collect()
    pairs = {(r["id_a"], r["id_b"]) for r in out}
    assert {(i, i + 100_000) for i in range(5)} <= pairs


# ------------------------------------------------------------ similarity

def test_brute_force_topk(spark, emb):
    queries = emb.limit(3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = brute_force_topk(emb, queries, k=5)
    rows = out.collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) == {0, 1, 2}
    for q, rs in by_q.items():
        assert len(rs) == 5
        sims = [r["cosine"] for r in sorted(rs, key=lambda r: r["rank"])]
        assert sims == sorted(sims, reverse=True)
        assert all(r["neighbor_id"] != q for r in rs)


def test_brute_force_local_topk_identical_to_plain(spark, emb):
    # the Arrow local-top-k pre-reduction must not change the result:
    # a global top-k row is by definition in its batch's local top-k
    queries = emb.limit(4).select(F.col("vec_id").alias("query_id"), "embedding")
    plain = brute_force_topk(emb, queries, k=7, local_topk=False).collect()
    local = brute_force_topk(emb, queries, k=7, local_topk=True).collect()
    key = lambda r: (r["query_id"], r["rank"])
    assert sorted(
        [(r["query_id"], r["rank"], r["neighbor_id"], r["cosine"]) for r in plain]
    ) == sorted(
        [(r["query_id"], r["rank"], r["neighbor_id"], r["cosine"]) for r in local]
    )


def test_lsh_topk_finds_true_near_neighbors(spark, emb):
    # identical query vectors -> identical LSH signature -> guaranteed
    # same bucket: recall@1 must be 1.0 for true near-dups
    queries = emb.limit(3).select(
        (F.col("vec_id") + 100_000).alias("query_id"), "embedding"
    )
    approx = lsh_topk(emb, queries, k=1, dim=64, n_planes=8).collect()
    got = {(r["query_id"], r["neighbor_id"]) for r in approx}
    assert {(100_000 + i, i) for i in range(3)} <= got
    assert all(r["cosine"] > 0.999 for r in approx)


def test_ivf_topk_exact_dup_recall(spark, emb):
    # an exact-duplicate query lands in the same coarse list as its
    # source vector (same nearest centroid), so IVF must return it at
    # rank 1 with cosine ~1
    queries = emb.limit(3).select(
        (F.col("vec_id") + 100_000).alias("query_id"), "embedding"
    )
    approx = ivf_topk(emb, queries, k=1, n_lists=8, n_probe=2).collect()
    got = {(r["query_id"], r["neighbor_id"]) for r in approx}
    assert {(100_000 + i, i) for i in range(3)} <= got
    assert all(r["cosine"] > 0.999 for r in approx)


# ------------------------------------------------------------ multimodal

def test_ann_gate_entries_meet_recall_floor(spark):
    # the approximate gate entries emit measured recall@5 vs the exact
    # brute-force top-k; assert the floor the gate rows claim
    import __spark_entry__ as entrymod

    for name in ("lsh_ann", "ivf_ann"):
        rows = entrymod.queries()[name](spark, "/root/testdata/sf0.001").collect()
        assert len(rows) == 5
        mean_recall = sum(r["recall"] for r in rows) / len(rows)
        assert mean_recall >= 0.8, f"{name} mean recall {mean_recall}"
        assert all(r["recall"] >= 0.4 for r in rows), f"{name}: {rows}"


def test_multimodal_features(spark):
    from transforms_for_apache_kafka_connect_spark.functions.multimodal import (
        extract_features,
        sample_frames,
        synthetic_media,
    )

    media = synthetic_media(spark, 100)
    feats = extract_features(media).collect()
    assert len(feats) == 100
    assert all(len(r["features"]) == 16 for r in feats)
    assert all(0.0 <= v <= 1.0 for r in feats for v in r["features"])
    # deterministic
    again = extract_features(synthetic_media(spark, 100)).collect()
    assert {r["media_id"]: r["features"] for r in feats} == {
        r["media_id"]: r["features"] for r in again
    }
    frames = sample_frames(media, every_ms=250)
    n_videos = media.filter("kind = 'video'").count()
    assert frames.count() == n_videos * 4  # 1000ms / 250ms


def test_multimodal_resize(spark):
    from transforms_for_apache_kafka_connect_spark.functions.multimodal import (
        resize_images,
        synthetic_media,
    )

    media = synthetic_media(spark, 100)
    n_images = media.filter("kind = 'image'").count()
    out = resize_images(media, 32, 16).collect()
    assert len(out) == n_images
    assert all(r["width"] == 32 and r["height"] == 16 for r in out)
    # resized payload has exactly width*height bytes, deterministically
    assert all(len(r["payload"]) == 32 * 16 for r in out)
    again = {r["media_id"]: r["payload"] for r in resize_images(media, 32, 16).collect()}
    assert {r["media_id"]: r["payload"] for r in out} == again


def test_multimodal_decode_stub_raises(spark):
    from transforms_for_apache_kafka_connect_spark.functions.multimodal import (
        HAS_PIL,
        extract_features,
        synthetic_media,
    )

    if HAS_PIL:
        pytest.skip("Pillow present: the real-codec tests cover fake=False")
    with pytest.raises(Exception, match="NotImplementedError|Pillow"):
        extract_features(synthetic_media(spark, 5), fake=False).collect()


def _png_media(spark, n=8):
    """Tiny real PNGs (solid-color gradients) as a media table —
    only constructible when Pillow is importable."""
    import io as _io

    from PIL import Image

    rows = []
    for i in range(n):
        im = Image.new("RGB", (8 + i, 6 + i), (i * 20 % 256, 80, 160))
        buf = _io.BytesIO()
        im.save(buf, format="PNG")
        rows.append((i, "image", "image/png", 8 + i, 6 + i, None, buf.getvalue()))
    from transforms_for_apache_kafka_connect_spark.functions.multimodal import (
        MEDIA_SCHEMA,
    )

    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_multimodal_real_codec_features(spark):
    from transforms_for_apache_kafka_connect_spark.functions.multimodal import (
        FEATURE_DIM,
        HAS_PIL,
        extract_features,
    )

    if not HAS_PIL:
        pytest.skip("Pillow not on this container (sandbox pip build)")
    media = _png_media(spark)
    feats = extract_features(media, fake=False).collect()
    assert len(feats) == 8
    for r in feats:
        assert len(r["features"]) == FEATURE_DIM
        assert all(0.0 <= f <= 1.0 for f in r["features"])
    # deterministic across runs
    again = extract_features(media, fake=False).collect()
    assert {r["media_id"]: r["features"] for r in feats} == {
        r["media_id"]: r["features"] for r in again
    }


def test_multimodal_real_codec_resize(spark):
    from transforms_for_apache_kafka_connect_spark.functions.multimodal import (
        HAS_PIL,
        resize_images,
    )

    if not HAS_PIL:
        pytest.skip("Pillow not on this container (sandbox pip build)")
    out = resize_images(_png_media(spark), 16, 12, fake=False).collect()
    assert len(out) == 8
    # real L-mode resample keeps the byte-count contract
    assert all(len(r["payload"]) == 16 * 12 for r in out)


def test_prepare_training_docs_pipeline(spark):
    from transforms_for_apache_kafka_connect_spark.functions import (
        prepare_training_docs,
    )

    en = (
        "the quick brown fox and the lazy dog that is with us for a walk "
        "in the park and it is a fine day as the sun is on the hill"
    )
    de = "der hund und die katze das ist nicht mit ein problem der tag"
    rows = [
        (1, en),
        (2, en),          # exact dup of 1 -> dropped, 1 is canonical
        (3, de),          # wrong language -> dropped
        (4, "x! y? z."),  # punctuation junk -> fails the quality floor
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = prepare_training_docs(df, lang="en", min_quality=0.5).collect()
    assert [r["doc_id"] for r in out] == [1]
    r = out[0]
    assert r["lang_detected"] == "en"
    assert r["n_tokens"] == len(en.split())
    assert r["quality_score"] >= 0.5

    # dedupe keeps the MIN id even when the smaller id arrives later
    df2 = spark.createDataFrame([(9, en), (5, en)], "doc_id long, text string")
    out2 = prepare_training_docs(df2, lang="en", min_quality=0.5).collect()
    assert [r["doc_id"] for r in out2] == [5]


def test_minhash_family_members_are_independent(spark):
    """Regression for the F.transform lambda-arity bug: a two-arg
    lambda is (element, array_index) to Spark, which degenerated every
    family member to the same expression — signatures then matched
    ONLY on exact duplicates. Pin the real family properties: members
    differ from each other, and two near-identical docs (jaccard
    ~0.83) agree in ~jaccard of the positions."""
    from transforms_for_apache_kafka_connect_spark.functions.dedupe import (
        minhash_signature,
    )

    base = "shared boilerplate header words seven " + (
        "lorem ipsum dolor sit amet " * 3
    )
    df = spark.createDataFrame(
        [(1, base), (2, base + " trailing tweak")], "id long, t string"
    )
    sigs = {
        r["id"]: r["sig"]
        for r in df.select(
            "id", minhash_signature(F.col("t"), 32).alias("sig")
        ).collect()
    }
    # members are a real family (not one expression repeated)
    assert len(set(sigs[1])) > 16
    # near-identical docs agree in roughly jaccard of positions
    agree = sum(a == b for a, b in zip(sigs[1], sigs[2]))
    assert 20 <= agree < 32, agree


def test_hyperplane_family_planes_are_distinct(spark):
    """Same arity-bug class in _hyperplane_bits: the plane index was
    rebound to the coordinate index, collapsing every plane into one
    (2 buckets total). Pin that n_planes yields a spread of buckets."""
    from transforms_for_apache_kafka_connect_spark.functions.dedupe import (
        _hyperplane_bits,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    buckets = {
        r[0]
        for r in emb.select(
            _hyperplane_bits(F.col("embedding"), 64, 4, seed=7)
        ).distinct().collect()
    }
    # 4 real planes -> well more than the degenerate {0, 15} pair
    assert len(buckets) > 8, sorted(buckets)


def test_word_shingles_short_docs_are_empty_not_crash(spark):
    """sequence(1, 0) is DESCENDING in Spark — unguarded, a doc with
    fewer than n words crashed slice() with start=0."""
    from transforms_for_apache_kafka_connect_spark.functions.dedupe import (
        word_shingles,
    )

    df = spark.createDataFrame(
        [("one",), ("one two",), ("one two three",), ("   ",), (None,)],
        "t string",
    )
    got = [r[0] for r in df.select(word_shingles(F.col("t"))).collect()]
    assert got[0] == [] and got[1] == [] and got[3] == []
    assert got[2] == ["one two three"]
    # NULL text yields the empty set too (when() short-circuits the
    # null propagation) — same "nothing to shingle" semantics
    assert got[4] == []
