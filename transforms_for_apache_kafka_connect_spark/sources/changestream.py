"""Deterministic synthetic change stream over the `repositories` table.

Shape per BASELINE.json ``input_hint`` / FIXTURES.md F10: base table
``(repo, path, commit, lang, content)``; change events keyed
``(repo, path)`` with a Debezium-style envelope
``{op, lsn, ts_ms, before, after}`` (op matching the reference's
FilterByFieldValueTest envelope, FilterByFieldValueTest.java:237-278).

Design for 10^10 events: everything derives JVM-side from
``spark.range(n)`` — no Python loop, no driver data, no UDFs. The
stream is a pure function of (seed, n_events, n_repos, paths_per_repo)
so any slice can be regenerated on any cluster size, which is what
makes replay/resume testable and the bench reproducible.

Skew: repo ids follow a zipf-like power law via inverse-CDF
``repo_id = floor(N * u^alpha)`` (alpha>1 concentrates mass on low
ids), exercising the salted/AQE skew path in the merge.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

LANGS = ["py", "java", "rs", "go", "js", "c", "md"]

#: op mix: ~30% creates, ~49% updates, ~10% reads (Debezium snapshot
#: records), ~10% deletes, ~1% tombstones (FIXTURES.md F10)
OP_BUCKETS = [(30, "c"), (79, "u"), (89, "r"), (99, "d")]  # 99+ -> tombstone


def _u01(col: Column, seed: int, salt: int) -> Column:
    """Deterministic uniform [0,1) from an id column."""
    h = F.xxhash64(col, F.lit(seed), F.lit(salt))
    return (F.pmod(h, F.lit(1_000_000)).cast("double")) / 1_000_000.0


def change_stream(
    spark: SparkSession,
    n_events: int,
    *,
    n_repos: int = 100,
    paths_per_repo: int = 10,
    seed: int = 42,
    alpha: float = 2.5,
    partitions: int | None = None,
) -> DataFrame:
    """Envelope DataFrame of ``n_events`` deterministic change events.

    Columns: topic, partition, key:struct<repo,path>,
    value:struct<op,lsn,ts_ms,before,after> (null value = tombstone
    *record*; we additionally null ``after`` for op='d'),
    timestamp, headers.
    """
    rng = spark.range(0, n_events, 1, partitions) if partitions else spark.range(n_events)
    lsn = F.col("id")

    u_repo = _u01(lsn, seed, 1)
    repo_id = F.floor(F.lit(n_repos) * F.pow(u_repo, F.lit(alpha))).cast("long")
    path_id = F.pmod(F.xxhash64(lsn, F.lit(seed), F.lit(2)), F.lit(paths_per_repo))
    repo = F.concat(F.lit("repo-"), repo_id.cast("string"))
    path = F.concat(F.lit("src/f"), path_id.cast("string"), F.lit(".py"))

    op_roll = F.pmod(F.xxhash64(lsn, F.lit(seed), F.lit(3)), F.lit(100))
    op = F.lit("t")
    for hi, name in reversed(OP_BUCKETS):
        op = F.when(op_roll < hi, F.lit(name)).otherwise(op)
    is_tombstone = op_roll >= 99

    ts_ms = F.lit(1_600_000_000_000) + lsn  # monotone with lsn
    lang = F.element_at(
        F.array(*[F.lit(x) for x in LANGS]),
        (F.pmod(F.xxhash64(lsn, F.lit(seed), F.lit(4)), F.lit(len(LANGS))) + 1).cast("int"),
    )
    commit = F.lower(F.hex(F.xxhash64(repo, path, lsn, F.lit(seed))))
    # content: deterministic pseudo-text, ~256 chars, pure function of
    # (repo, path, lsn) -> final-state sha256 parity is checkable by any
    # independent replayer
    content = F.repeat(F.sha2(F.concat(repo, path, lsn.cast("string")), 256), 4)

    after = F.struct(
        repo.alias("repo"),
        path.alias("path"),
        commit.alias("commit"),
        lang.alias("lang"),
        content.alias("content"),
    )
    after_t = after.cast(
        "struct<repo:string,path:string,commit:string,lang:string,content:string>"
    )
    null_after = F.lit(None).cast(
        "struct<repo:string,path:string,commit:string,lang:string,content:string>"
    )

    value = F.struct(
        op.alias("op"),
        lsn.alias("lsn"),
        ts_ms.alias("ts_ms"),
        null_after.alias("before"),
        F.when(op.isin("c", "u", "r"), after_t).otherwise(null_after).alias("after"),
    )
    value_t = value.cast(
        "struct<op:string,lsn:bigint,ts_ms:bigint,"
        "before:struct<repo:string,path:string,commit:string,lang:string,content:string>,"
        "after:struct<repo:string,path:string,commit:string,lang:string,content:string>>"
    )

    return rng.select(
        F.lit("repositories").alias("topic"),
        F.pmod(F.xxhash64(repo, path), F.lit(32)).cast("int").alias("partition"),
        F.struct(repo.alias("repo"), path.alias("path")).alias("key"),
        # tombstone record == null value (when() without otherwise -> typed null)
        F.when(~is_tombstone, value_t).alias("value"),
        ts_ms.alias("timestamp"),
        F.lit(None).cast("map<string,string>").alias("headers"),
    )


def repositories_snapshot(spark: SparkSession, events: DataFrame) -> DataFrame:
    """Single-shuffle oracle replay: the final `repositories` state that
    a sequential one-record-at-a-time application of ``events`` yields.

    Used by tests/bench as the independent truth for per-row
    sha256(content) parity (BASELINE.json invariant). Tombstone records
    (value IS NULL) carry no key-state change semantics of their own in
    Debezium (they follow a delete), so they are ignored here; 'd'
    deletes the key; c/u/r upsert ``after``.
    """
    live = events.filter(F.col("value").isNotNull())
    last = (
        live.groupBy("key")
        .agg(F.max_by(F.col("value"), F.col("value.lsn")).alias("value"))
    )
    return (
        last.filter(F.col("value.op") != "d")
        .select("value.after.*")
    )


def snapshot_envelope(
    df: DataFrame,
    key_cols: list[str],
    *,
    lsn: int,
    topic: str = "snapshot",
    ts_ms: int | None = None,
) -> DataFrame:
    """Table-shaped rows -> op='r' change envelope (the Debezium
    initial-snapshot *read* event; reference FilterByFieldValueTest
    envelope shape, FilterByFieldValueTest.java:237-278).

    Every row carries the SAME ``lsn`` — the source position the
    snapshot is consistent with — exactly as Debezium stamps snapshot
    records with the snapshot's single binlog position. Pure Column
    expressions over ``df`` (no shuffle, no UDF): at 100 TB the
    envelope is a free projection fused into the snapshot scan.
    """
    from pyspark.sql import types as T

    missing = [c for c in key_cols if c not in df.columns]
    if missing:
        raise ValueError(f"snapshot is missing key columns {missing}")
    after = F.struct(*[F.col(c).alias(c) for c in df.columns])
    null_row = F.lit(None).cast(T.StructType(list(df.schema.fields)))
    stamp = F.lit(int(lsn if ts_ms is None else ts_ms)).cast("long")
    value = F.struct(
        F.lit("r").alias("op"),
        F.lit(int(lsn)).cast("long").alias("lsn"),
        stamp.alias("ts_ms"),
        null_row.alias("before"),
        after.alias("after"),
    )
    return df.select(
        F.lit(topic).alias("topic"),
        F.lit(0).cast("int").alias("partition"),
        F.struct(*[F.col(c).alias(c) for c in key_cols]).alias("key"),
        value.alias("value"),
        F.lit(int(lsn)).cast("long").alias("timestamp"),
        F.lit(None).cast("map<string,string>").alias("headers"),
    )
