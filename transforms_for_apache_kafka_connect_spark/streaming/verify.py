"""Distributed state-parity verification: prove two table states equal
(or list exactly how they differ) without ever collecting either side.

The north rule this engine is built against demands that "after full
replay the final table state must match the reference via per-row
content sha256 equality". At 10^10 rows that comparison is itself a
big-data job, so this module gives it the shape the MySQL ecosystem's
pt-table-checksum settled on (public Percona docs; the same idea backs
Debezium's incremental-snapshot verification):

1. ``table_checksum`` — ONE map-side-combining aggregate per side:
   every row folds into its key bucket as an order-independent digest
   (bit_xor of seeded hashes of the row's sha256 + a row count). The
   result is ``n_buckets`` rows, however big the table is.
2. ``table_diff`` — compare those tiny frames; for the buckets that
   disagree (usually none or a handful) re-read ONLY those buckets on
   both sides (bucket-pruned file skipping on the lake side) and
   anti-join row digests both ways. A 100 TB comparison that differs
   in one bucket rescans 1/n_buckets of each side, not the tables.

Order-independence of the bucket fold uses XOR, which cancels on
duplicate identical rows — safe here because a keyed lake table is
key-unique and the key is part of every row digest; the row count
closes the remaining n↔n+2k ambiguity for identical-row multisets.

The row digest's canonical string encoding (name:Vlen:value; with an
``N`` branch for NULL) is deliberately expressible in ANSI SQL, so an
independent engine (the driver's DuckDB oracle) can recompute it —
cross-engine parity holds for string/integer columns; floats should be
scaled to integers first (engine float-to-string notations differ).

Reference parity note: the reference repo (Aiven SMT catalog) ships no
verification utility; the invariant this implements is the graft's
BASELINE.json north rule itself.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from transforms_for_apache_kafka_connect_spark.streaming.sink import (
    BUCKET_COL,
    LakeTable,
    _bucket_expr,
)

#: number of seeded 64-bit words the bucket digest folds per row —
#: collision probability for a bucket-level false "equal" is ~2^-256
_N_WORDS = 4


def row_digest(cols: list[str]) -> Column:
    """sha256 over a canonical, injective encoding of the named columns:
    ``<name>:N;`` for NULL, ``<name>:V<len>:<value>;`` otherwise. The
    length prefix makes the concatenation injective even when values
    contain the separator characters. Values are ``CAST(col AS STRING)``
    — for cross-engine reproducibility digest integers and strings (or
    pre-scale floats to integers); any castable type is fine when both
    sides are computed by this same function."""
    if not cols:
        raise ValueError("row_digest needs at least one column")
    parts: list[Column] = []
    for c in cols:
        sv = F.col(c).cast("string")
        parts.append(
            F.concat(
                F.lit(f"{c}:"),
                F.when(F.col(c).isNull(), F.lit("N;")).otherwise(
                    F.concat(
                        F.lit("V"),
                        F.length(sv).cast("string"),
                        F.lit(":"),
                        sv,
                        F.lit(";"),
                    )
                ),
            )
        )
    return F.sha2(F.concat(*parts), 256)


def _digest_cols(table: LakeTable, df: DataFrame, cols: list[str] | None) -> list[str]:
    if cols is not None:
        missing = [c for c in cols if c not in df.columns]
        if missing:
            raise ValueError(f"digest columns not in frame: {missing}")
        return list(cols)
    # default: every key + payload column the read surfaces, minus
    # engine-internal bookkeeping that legitimately differs between an
    # engine table and an externally-built expected frame
    skip = {BUCKET_COL, "_lsn", "_deleted", "__seq"}
    return [c for c in df.columns if c not in skip]


def _bucketed(table: LakeTable, df: DataFrame) -> DataFrame:
    """Attach the table's bucket column, casting key columns UP to the
    table's manifest types first — the bucket hash is type-sensitive
    (xxhash64(int 5) != xxhash64(long 5)), so an expected frame whose
    keys arrived narrower must hash with the table's types or every
    comparison would be bucket-garbage."""
    key_types = {
        f.name: f.dataType
        for f in table.read(df.sparkSession).schema.fields
        if f.name in table.key_cols
    }
    casts = [
        F.col(c).cast(key_types[c]).alias(c) if c in key_types else F.col(c)
        for c in df.columns
    ]
    df = df.select(*casts)
    return df.withColumn(
        BUCKET_COL, _bucket_expr(table.key_cols, table.n_buckets)
    )


def checksum_frame(
    table: LakeTable, df: DataFrame, cols: list[str]
) -> DataFrame:
    """Per-bucket checksum of an arbitrary frame using the table's
    bucketing: (bucket, n_rows, x0..x3). One exchange; the bit_xor /
    count aggregates combine map-side, so the shuffle carries at most
    ``n_buckets`` rows per input partition regardless of table size."""
    dig = row_digest(cols)
    words = [
        F.xxhash64(dig, F.lit(i)).alias(f"_w{i}") for i in range(_N_WORDS)
    ]
    return (
        _bucketed(table, df)
        .select(BUCKET_COL, *words)
        .groupBy(F.col(BUCKET_COL).alias("bucket"))
        .agg(
            F.count("*").alias("n_rows"),
            *[F.bit_xor(f"_w{i}").alias(f"x{i}") for i in range(_N_WORDS)],
        )
    )


def table_checksum(
    spark: SparkSession,
    table: LakeTable,
    cols: list[str] | None = None,
    version: int | None = None,
) -> DataFrame:
    """Per-bucket order-independent checksum of the table's current (or
    time-travelled) state. Two runs agree iff the states agree on the
    digested columns — compare frames from different clusters, different
    days, or engine-vs-reference to certify replay parity without
    moving row data."""
    df = table.read(spark, version=version)
    return checksum_frame(table, df, _digest_cols(table, df, cols))


def table_diff(
    spark: SparkSession,
    table: LakeTable,
    expected: DataFrame,
    cols: list[str] | None = None,
    version: int | None = None,
) -> DataFrame:
    """Exact row-level difference between the table state and an
    ``expected`` frame (a reference snapshot, another table's read, a
    recomputed oracle): rows only the table has come back with side
    ``'table'``, rows only the expected side has with ``'expected'``
    (a changed row appears once per side). Columns: (side, *key_cols,
    row_sha256).

    Two phases: per-bucket checksums decide WHICH buckets disagree
    (tiny frames, collected driver-side — bounded by n_buckets, the
    same adjudicated idiom as the sink's bucket aggregates); then both
    sides re-read only those buckets — the lake side via manifest
    bucket pruning, the expected side via a bucket filter — and
    anti-join row digests. Identical states never read row data twice;
    a localized divergence rescans only its buckets."""
    state = table.read(spark, version=version)
    dcols = _digest_cols(table, state, cols)
    for k in table.key_cols:
        if k not in dcols:
            raise ValueError(
                f"digest columns must include every key column (missing {k!r})"
            )
    a_sum = checksum_frame(table, state, dcols).alias("a")
    e_sum = checksum_frame(table, expected, dcols).alias("e")
    joined = a_sum.join(e_sum, on="bucket", how="full").select(
        "bucket",
        (
            F.coalesce(F.col("a.n_rows"), F.lit(-1)).eqNullSafe(
                F.coalesce(F.col("e.n_rows"), F.lit(-1))
            )
            & F.concat_ws(
                ",", *[F.col(f"a.x{i}").cast("string") for i in range(_N_WORDS)]
            ).eqNullSafe(
                F.concat_ws(
                    ",", *[F.col(f"e.x{i}").cast("string") for i in range(_N_WORDS)]
                )
            )
        ).alias("same"),
    )
    bad = sorted(r["bucket"] for r in joined.filter(~F.col("same")).collect())
    schema = ", ".join(
        ["side string"]
        + [f"`{k}` {state.schema[k].dataType.simpleString()}" for k in table.key_cols]
        + ["row_sha256 string"]
    )
    if not bad:
        return spark.createDataFrame([], schema)
    # digest-count comparison rather than a plain anti-join: an
    # expected frame carrying a DUPLICATE of a table row must surface
    # as a multiplicity diff, not vanish (an anti-join sees the digest
    # on both sides and reports nothing)
    a_g = (
        table.read(spark, version=version, buckets=bad)
        .select(*table.key_cols, row_digest(dcols).alias("row_sha256"))
        .groupBy("row_sha256", *table.key_cols)
        .count()
        .alias("a")
    )
    e_g = (
        _bucketed(table, expected)
        .filter(F.col(BUCKET_COL).isin([int(b) for b in bad]))
        .select(*table.key_cols, row_digest(dcols).alias("row_sha256"))
        .groupBy("row_sha256", *table.key_cols)
        .count()
        .alias("e")
    )
    cnt_a = F.coalesce(F.col("a.count"), F.lit(0))
    cnt_e = F.coalesce(F.col("e.count"), F.lit(0))
    return (
        a_g.join(e_g, on="row_sha256", how="full")
        .filter(cnt_a != cnt_e)
        .select(
            F.when(cnt_a > cnt_e, F.lit("table"))
            .otherwise(F.lit("expected"))
            .alias("side"),
            *[
                F.coalesce(F.col(f"a.{k}"), F.col(f"e.{k}")).alias(k)
                for k in table.key_cols
            ],
            "row_sha256",
        )
    )


def repair_state(
    spark: SparkSession,
    table: LakeTable,
    expected: DataFrame,
    *,
    cols: list[str] | None = None,
    epoch: str = "repair",
    batch_id: int = 0,
) -> dict[str, Any]:
    """Make the table's state equal ``expected`` on the digested
    columns, by applying ONLY the difference: keys present on the
    expected side upsert with expected's full row, keys only the table
    has are deleted — one ordinary ledgered merge built from the
    bucket-pruned diff, so on a ``discovery=True`` table repairing a
    localized divergence rewrites only its touched buckets (a full
    overwrite would rewrite the table; dense-mode tables rewrite all
    buckets per merge by design).

    Exactly-once on (epoch, batch_id) through the table's ledger.
    Returns {'repaired': n_upserts, 'deleted': n_deletes, ...} (or the
    ledger's skip record). Refuses an ``expected`` frame with duplicate
    keys among the differing rows — 'make equal to' is undefined then.
    """
    if table.committed(epoch, batch_id):
        return {"skipped": True, "reason": "already committed"}
    diff = table_diff(spark, table, expected, cols=cols)
    keys = list(table.key_cols)
    e_keys = diff.filter(F.col("side") == "expected").select(*keys)
    t_keys = diff.filter(F.col("side") == "table").select(*keys)
    # expected's full rows for keys that need upserting (the diff only
    # carries keys + digests); key types cast up like the diff did
    exp_rows = _bucketed(table, expected).drop(BUCKET_COL).join(
        F.broadcast(e_keys.distinct()), on=keys, how="left_semi"
    )
    dup = (
        exp_rows.groupBy(*keys).count().filter(F.col("count") > 1).count()
    )
    if dup:
        raise ValueError(
            f"expected frame has {dup} duplicate keys among the "
            "differing rows — cannot repair to an ambiguous state"
        )
    upserts = exp_rows.withColumn("__is_delete", F.lit(False))
    deletes = (
        t_keys.distinct()
        .join(e_keys.distinct(), on=keys, how="left_anti")
        .select(
            *keys,
            *[
                F.lit(None).cast(f.dataType).alias(f.name)
                for f in upserts.schema.fields
                if f.name not in keys and f.name != "__is_delete"
            ],
            F.lit(True).alias("__is_delete"),
        )
    )
    n_up = upserts.count()
    n_del = deletes.count()
    if not (n_up or n_del):
        table.commit_empty(epoch=epoch, batch_id=batch_id)
        return {"repaired": 0, "deleted": 0, "match": True}
    r = table.merge(
        upserts.unionByName(deletes), epoch=epoch, batch_id=batch_id
    )
    return {"repaired": n_up, "deleted": n_del, **r}


def verify_state(
    spark: SparkSession,
    table: LakeTable,
    expected: DataFrame,
    cols: list[str] | None = None,
    version: int | None = None,
) -> dict[str, Any]:
    """Convenience summary: {'match': bool, 'n_table_only': int,
    'n_expected_only': int, 'sample': [up to 20 diff rows]}."""
    diff = table_diff(spark, table, expected, cols=cols, version=version)
    rows = diff.limit(10_000).collect()
    n_a = sum(1 for r in rows if r["side"] == "table")
    n_e = len(rows) - n_a
    return {
        "match": not rows,
        "n_table_only": n_a,
        "n_expected_only": n_e,
        "sample": [r.asDict() for r in rows[:20]],
    }
