"""Partial-column (patch) merge semantics (streaming/patch.py):
sequential-apply oracle parity under random sparse streams, delete
clearing, cross-batch overlay, exactly-once, and the changelog carrying
full patched post-images."""

from __future__ import annotations

import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F
from pyspark.sql import types as T

from transforms_for_apache_kafka_connect_spark.streaming import (
    LakeTable,
    fold_sparse,
    patch_apply,
)

_PT = T.StructType([
    T.StructField("x", T.DoubleType()),
    T.StructField("y", T.StringType()),
])
_ET = T.StructType([
    T.StructField("topic", T.StringType(), False),
    T.StructField("partition", T.IntegerType(), False),
    T.StructField("key", T.StructType([T.StructField("k", T.StringType())])),
    T.StructField("value", T.StructType([
        T.StructField("op", T.StringType()),
        T.StructField("lsn", T.LongType()),
        T.StructField("ts_ms", T.LongType()),
        T.StructField("before", _PT),
        T.StructField("after", _PT),
    ])),
    T.StructField("timestamp", T.LongType()),
    T.StructField("headers", T.MapType(T.StringType(), T.StringType())),
])


def _env(spark, events):
    """events: (lsn, k, op, x, y) — op 'u' with x/y possibly None
    (sparse: None = not provided) or 'd'."""
    return spark.createDataFrame(
        [
            ("t", 0, (k,),
             (op, lsn, 0, None, None if op == "d" else (x, y)), lsn, None)
            for lsn, k, op, x, y in events
        ],
        _ET,
    )


def _sequential_oracle(events):
    """Apply each event in LSN order: u overlays non-None columns,
    d clears the row. Returns {k: (x, y, last_lsn)}."""
    state = {}
    for lsn, k, op, x, y in sorted(events):
        if op == "d":
            state.pop(k, None)
        else:
            cur = state.get(k, (None, None, None))
            state[k] = (
                x if x is not None else cur[0],
                y if y is not None else cur[1],
                lsn,
            )
    return state


def _table_state(spark, table):
    return {
        r["k"]: (r["x"], r["y"], r["_lsn"])
        for r in table.read(spark).collect()
    }


def _mk_table(tmp_path, **kw):
    return LakeTable(str(tmp_path / "t"), key_cols=["k"], n_buckets=4,
                     merge_strategy="broadcast", discovery=False, **kw)


def test_patch_overlays_unmentioned_columns(spark, tmp_path):
    table = _mk_table(tmp_path)
    patch_apply(table, _env(spark, [
        (1, "a", "u", 1.0, "first"),
    ]), epoch="e", batch_id=0)
    # batch 1: sparse update provides only x — y must survive
    patch_apply(table, _env(spark, [
        (2, "a", "u", 2.0, None),
    ]), epoch="e", batch_id=1)
    assert _table_state(spark, table) == {"a": (2.0, "first", 2)}


def test_patch_delete_clears_unprovided(spark, tmp_path):
    table = _mk_table(tmp_path)
    patch_apply(table, _env(spark, [(1, "a", "u", 1.0, "old")]),
                epoch="e", batch_id=0)
    # delete then sparse rebirth IN ONE BATCH: 'old' must NOT resurrect
    patch_apply(table, _env(spark, [
        (2, "a", "d", None, None),
        (3, "a", "u", 3.0, None),
    ]), epoch="e", batch_id=1)
    assert _table_state(spark, table) == {"a": (3.0, None, 3)}


def test_patch_last_delete_wins(spark, tmp_path):
    table = _mk_table(tmp_path)
    patch_apply(table, _env(spark, [(1, "a", "u", 1.0, "v")]),
                epoch="e", batch_id=0)
    patch_apply(table, _env(spark, [
        (2, "a", "u", 2.0, None),
        (3, "a", "d", None, None),
    ]), epoch="e", batch_id=1)
    assert _table_state(spark, table) == {}


def test_patch_intra_batch_columns_fold(spark, tmp_path):
    """Two sparse updates in ONE batch each providing a different
    column: both stick (row-grain LWW would drop the first)."""
    table = _mk_table(tmp_path)
    patch_apply(table, _env(spark, [
        (1, "a", "u", 1.0, None),
        (2, "a", "u", None, "two"),
    ]), epoch="e", batch_id=0)
    assert _table_state(spark, table) == {"a": (1.0, "two", 2)}


def test_patch_exactly_once(spark, tmp_path):
    table = _mk_table(tmp_path)
    b0 = _env(spark, [(1, "a", "u", 1.0, "v")])
    b1 = _env(spark, [(2, "a", "u", None, "w")])
    patch_apply(table, b0, epoch="e", batch_id=0)
    patch_apply(table, b1, epoch="e", batch_id=1)
    before = _table_state(spark, table)
    patch_apply(table, b1, epoch="e", batch_id=1)  # replay: ledger no-op
    assert _table_state(spark, table) == before == {"a": (1.0, "w", 2)}


def test_patch_changelog_carries_full_postimage(spark, tmp_path):
    """Downstream consumers see whole patched rows: the changelog
    post-image of a sparse update holds the overlaid columns."""
    table = _mk_table(tmp_path, changelog=True)
    patch_apply(table, _env(spark, [(1, "a", "u", 1.0, "keep")]),
                epoch="e", batch_id=0)
    patch_apply(table, _env(spark, [(2, "a", "u", 2.0, None)]),
                epoch="e", batch_id=1)
    post = (
        table.read_changelog(spark)
        .filter((F.col("batch_id") == 1)
                & (F.col("_change_type") == "update_postimage"))
        .collect()
    )
    assert len(post) == 1
    assert (post[0]["x"], post[0]["y"]) == (2.0, "keep")


def test_fold_sparse_payload_fields_subset(spark):
    folded = fold_sparse(
        _env(spark, [(1, "a", "u", 1.0, "v")]), ["k"],
        payload_fields=["x"],
    )
    assert set(folded.columns) == {"k", "x", "_lsn", "__is_delete",
                                   "__had_delete"}


_events_strategy = st.lists(
    st.tuples(
        st.integers(0, 60),                      # lsn (deduped below)
        st.sampled_from(["a", "b", "c"]),
        st.sampled_from(["u", "u", "u", "d"]),
        st.one_of(st.none(), st.floats(allow_nan=False, allow_infinity=False,
                                       width=32)),
        st.one_of(st.none(), st.text("xy", min_size=1, max_size=2)),
    ),
    min_size=1, max_size=20,
)


@settings(max_examples=20, deadline=None)
@given(_events_strategy)
def test_patch_matches_sequential_oracle(spark, tmp_path_factory, events):
    # unique LSNs (the binlog contract the fold assumes)
    seen, uniq = set(), []
    for lsn, k, op, x, y in events:
        if lsn in seen:
            continue
        seen.add(lsn)
        uniq.append((lsn, k, op, x, y))
    events = uniq
    tmp = tmp_path_factory.mktemp("patch_prop")
    table = _mk_table(tmp)
    # split into two batches at the median LSN: composition across the
    # ledger must equal the single global fold
    cut = sorted(l for l, *_ in events)[len(events) // 2]
    b0 = [e for e in events if e[0] <= cut]
    b1 = [e for e in events if e[0] > cut]
    if b0:
        patch_apply(table, _env(spark, b0), epoch="e", batch_id=0)
    if b1:
        patch_apply(table, _env(spark, b1), epoch="e", batch_id=1)
    got = _table_state(spark, table)
    want = _sequential_oracle(events)
    assert got == want


def test_stream_patch_into_end_to_end(spark, tmp_path):
    """Streaming entry: sparse envelopes land through readStream ->
    foreachBatch patch_apply in SOURCE ORDER (the binlog-tail contract
    every merge path shares); final state equals the sequential-apply
    oracle exactly, and a second drained run from the same checkpoint
    is a no-op (ledger + checkpoint)."""
    import time as _time

    from transforms_for_apache_kafka_connect_spark.streaming import (
        stream_patch_into,
    )

    events = [
        (1, "a", "u", 1.0, "one"),
        (2, "b", "u", 2.0, None),
        (3, "a", "u", None, "uno"),   # sparse: only y
        (4, "b", "d", None, None),
        (5, "b", "u", 5.0, None),     # reborn sparse: y stays NULL
        (6, "a", "u", 6.0, None),     # sparse: only x
    ]
    src = str(tmp_path / "src")
    # three LSN-ordered appends -> three source-ordered micro-batches
    # (FileStreamSource orders by modification time)
    for lo, hi in ((1, 2), (3, 4), (5, 6)):
        chunk = [e for e in events if lo <= e[0] <= hi]
        _env(spark, chunk).coalesce(1).write.mode("append").parquet(src)
        _time.sleep(1.1)
    table = _mk_table(tmp_path)
    env_schema = _env(spark, events).schema

    def run():
        q = stream_patch_into(
            table,
            spark.readStream.schema(env_schema)
            .option("maxFilesPerTrigger", 1).parquet(src),
            str(tmp_path / "ckpt"),
            available_now=True,
        )
        q.awaitTermination(600)
        q.stop()

    run()
    got = _table_state(spark, table)
    assert got == _sequential_oracle(events) == {
        "a": (6.0, "uno", 6), "b": (5.0, None, 5),
    }
    run()  # restart from the same checkpoint: nothing changes
    assert _table_state(spark, table) == got
