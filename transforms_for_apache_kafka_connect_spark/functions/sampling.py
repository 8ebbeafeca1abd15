"""Deterministic sampling and dataset splitting for training-data
pipelines — the ops that carve a 100 TB corpus into train/val/test and
bounded samples without ever shuffling it.

Everything here is a pure Column expression over a stable hash of the
row's id (xxhash64, seeded): no RNG state, no shuffle, no driver
round-trip — the same row lands in the same split/sample on every run,
on any cluster layout, under any partitioning. That determinism is the
property training pipelines actually need (resumable jobs, reproducible
ablations, leakage-free splits that survive re-partitioning); Spark's
``df.sample``/``randomSplit`` are per-partition-RNG based and change
membership when the partitioning changes.

Scale shapes:

* ``hash_split`` / ``hash_sample`` — zero-shuffle projections (a
  filter on a hash range); at 100 TB they run at scan speed.
* ``stratified_sample`` — same zero-shuffle filter, per-stratum
  fractions resolved from a broadcastable dict (no groupBy).
* ``deterministic_top_sample`` — exact fixed-size N: rank by hash via
  one partial top-N aggregation (WindowGroupLimit prunes map-side), the
  only op here that pays an exchange, bounded to N rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: hash-space modulus: 2^53 buckets keep every value exactly
#: representable as a double, so u = bucket / 2^53 lies in [0, 1)
#: STRICTLY (a raw int64->double cast can round up to 2^63 and produce
#: exactly 1.0, making those rows unreachable by any fraction)
_BUCKETS = 2**53
#: sha2 mode folds the first 13 hex chars (52 bits) instead — also
#: exactly representable, and recomputable by ANY engine with sha256
_SHA_BUCKETS = 2**52


def _unit_hash(
    cols: list[str] | list[Column], seed: int, hash_fn: str = "xxhash64"
) -> Column:
    """Stable per-row position in [0, 1).

    * ``"xxhash64"`` (default) — seeded xxhash64 folded into 2^53
      exactly-representable buckets; the fast JVM-codegen path.
    * ``"sha2"`` — first 52 bits of sha256 over a ``'|'``-joined
      string rendering of the id columns + seed. Slower, but every
      engine with sha256 reproduces the SAME membership (external
      systems, SQL oracles: ``('0x' || substring(sha256(
      concat_ws('|', id, seed)), 1, 13))::BIGINT / 2^52``), so a
      split assigned here can be re-derived off-Spark bit-for-bit.
      Id columns are rendered with CAST(... AS STRING); NULL ids are
      skipped by concat_ws — keep id columns non-null (they identify
      the row).
    """
    if hash_fn == "xxhash64":
        h = F.pmod(F.xxhash64(*cols, F.lit(seed)), F.lit(_BUCKETS))
        return h.cast("double") / F.lit(float(_BUCKETS))
    if hash_fn == "sha2":
        rendered = [
            (F.col(c) if isinstance(c, str) else c).cast("string")
            for c in cols
        ]
        digest = F.sha2(F.concat_ws("|", *rendered, F.lit(str(seed))), 256)
        h = F.conv(F.substring(digest, 1, 13), 16, 10).cast("long")
        return h.cast("double") / F.lit(float(_SHA_BUCKETS))
    raise ValueError(f"unknown hash_fn: {hash_fn!r} (xxhash64|sha2)")


def hash_split(
    df: DataFrame,
    weights: dict[str, float],
    *,
    id_cols: list[str],
    seed: int = 42,
    split_col: str = "split",
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Assign every row to exactly one named split (train/val/test…)
    by hash range — deterministic, leakage-free, zero-shuffle.

    ``weights`` maps split name -> relative weight (normalized
    internally). Rows with equal ``id_cols`` always land in the same
    split — hash the DOCUMENT id, not the chunk id, to keep all chunks
    of one document on the same side of the split.
    """
    if not weights:
        raise ValueError("weights must name at least one split")
    if any(w < 0 for w in weights.values()) or sum(weights.values()) <= 0:
        raise ValueError(f"weights must be non-negative and sum > 0: {weights}")
    total = float(sum(weights.values()))
    u = _unit_hash(id_cols, seed, hash_fn)
    expr = None
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name] / total
        cond = u < F.lit(acc)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(
            cond, F.lit(name)
        )
    last = F.lit(names[-1])
    expr = last if expr is None else expr.otherwise(last)
    return df.withColumn(split_col, expr)


def hash_sample(
    df: DataFrame,
    fraction: float,
    *,
    id_cols: list[str],
    seed: int = 42,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Keep a deterministic ~``fraction`` of rows (hash threshold).
    Nested property: the ``fraction=0.1`` sample is a SUBSET of the
    ``fraction=0.2`` sample at the same seed — shrink/grow a training
    mix without resampling the world."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1]: {fraction}")
    return df.filter(_unit_hash(id_cols, seed, hash_fn) < F.lit(float(fraction)))


def stratified_sample(
    df: DataFrame,
    fractions: dict,
    *,
    strata_col: str,
    id_cols: list[str],
    default_fraction: float = 0.0,
    seed: int = 42,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. rebalance languages in
    a training mix): ``fractions`` maps stratum value -> keep fraction;
    unlisted strata keep ``default_fraction``. Zero shuffle — the
    per-stratum threshold is a CASE expression, not a join."""
    for k, v in fractions.items():
        if not 0.0 <= v <= 1.0:
            raise ValueError(f"fraction for {k!r} must be in [0, 1]: {v}")
    if not 0.0 <= default_fraction <= 1.0:
        raise ValueError(
            f"default_fraction must be in [0, 1]: {default_fraction}"
        )
    u = _unit_hash(id_cols, seed, hash_fn)
    thr = None
    for k, v in fractions.items():
        cond = F.col(strata_col) == F.lit(k)
        thr = F.when(cond, F.lit(float(v))) if thr is None else thr.when(
            cond, F.lit(float(v))
        )
    thr = (
        F.lit(float(default_fraction))
        if thr is None
        else thr.otherwise(F.lit(float(default_fraction)))
    )
    return df.filter(u < thr)


def deterministic_top_sample(
    df: DataFrame,
    n: int,
    *,
    id_cols: list[str],
    seed: int = 42,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Exactly ``min(n, count)`` rows, chosen deterministically: rank
    all rows by their seeded hash and keep the smallest ``n`` — a
    reproducible stand-in for reservoir sampling whose membership is
    stable across runs AND nested across sizes (top-1000 ⊃ top-100).

    ``id_cols`` must uniquely identify rows: the tie-break is
    (hash, id_cols), so duplicate-id rows at the rank-``n`` boundary
    would be resolved by partition layout, not deterministically —
    which ids are kept stays stable, but which duplicate PAYLOAD
    survives would not. Feed row-unique ids (e.g. doc_id + chunk_id),
    unlike ``hash_split`` where the shared document id is the point.

    The only sampling op that moves rows — and Catalyst plans it as
    ``TakeOrderedAndProject``: each task keeps its local top-``n`` and
    one bounded reduce merges them, so at most n×tasks rows ever leave
    a task (verified by plan test), not the corpus."""
    if n < 0:
        raise ValueError(f"n must be >= 0: {n}")
    if n == 0:
        return df.limit(0)
    u = _unit_hash(id_cols, seed, hash_fn).alias("__u")
    w = Window.orderBy(F.col("__u"), *[F.col(c) for c in id_cols])
    return (
        df.withColumn("__u", u)
        .withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= n)
        .drop("__u", "__rk")
    )


def pack_sequences(
    df: DataFrame,
    *,
    max_tokens: int,
    id_col: str = "doc_id",
    n_tokens_col: str | None = None,
    text_col: str = "text",
    n_shards: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Greedy sequence packing for training: assign documents to packs
    so each pack's token total stays ≤ ``max_tokens`` (a document
    longer than ``max_tokens`` gets a pack of its own — truncation is
    the caller's policy, not silent data loss here).

    Deterministic at any parallelism: documents hash into ``n_shards``
    logical shards (seeded xxhash64 of the id — no dependence on
    physical partitioning), and each shard packs its docs greedily in
    (n_tokens DESC, id) order — first-fit-decreasing, the classic
    ~11/9-OPT bin-packing heuristic. The same corpus packs identically
    on 2 cores or 2000.

    Returns (id, n_tokens, pack_id, pack_pos) where ``pack_id`` is
    globally unique (``shard * 2^40 + local``) and ``pack_pos`` is the
    document's position within its pack.

    Scale shape: ONE exchange on the shard key; packing itself is an
    Arrow-batched ``applyInPandas`` per shard — sequential greedy
    packing is inherently order-dependent, so this is the honest place
    for Python, and its input per shard is (id, n_tokens) pairs only
    (two longs per document, never the text).
    """
    import pandas as pd

    tokens = (
        F.col(n_tokens_col)
        if n_tokens_col
        else F.size(F.split(F.lower(F.trim(F.col(text_col))), r"\s+"))
    )
    slim = df.select(
        F.col(id_col).alias("id"),
        tokens.cast("long").alias("n_tokens"),
        F.pmod(F.xxhash64(F.col(id_col), F.lit(seed)), F.lit(n_shards))
        .cast("int")
        .alias("__shard"),
    )

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            ["n_tokens", "id"], ascending=[False, True], kind="mergesort"
        )
        shard = int(pdf["__shard"].iloc[0]) if len(pdf) else 0
        packs: list[int] = []  # remaining capacity per open pack
        pack_ids, pack_pos, sizes = [], [], []
        counts: list[int] = []
        for t in pdf["n_tokens"].to_numpy():
            t = int(t)
            placed = -1
            for i, cap in enumerate(packs):
                if t <= cap:
                    placed = i
                    break
            if placed < 0:
                packs.append(max(max_tokens - t, 0))
                counts.append(1)
                placed = len(packs) - 1
            else:
                packs[placed] -= t
                counts[placed] += 1
            pack_ids.append(shard * (1 << 40) + placed)
            pack_pos.append(counts[placed] - 1)
        out = pdf[["id", "n_tokens"]].copy()
        out["pack_id"] = pd.Series(pack_ids, index=pdf.index, dtype="int64")
        out["pack_pos"] = pd.Series(pack_pos, index=pdf.index, dtype="int64")
        return out

    packed = slim.groupBy("__shard").applyInPandas(
        _pack, schema="id long, n_tokens long, pack_id long, pack_pos long"
    )
    return packed.withColumnRenamed("id", id_col)
