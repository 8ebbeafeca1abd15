"""Property-based check (hypothesis): for ANY sequence of batches of
change events, the changelog is a complete and consistent record —

1. folding it forward (apply post-images, retract deletes, in batch
   order) reproduces the final table state, and
2. an incremental COUNT aggregate maintained from it equals a
   recompute over the final table

under all three merge strategies. Same adversarial generator as
test_property_merge (duplicate deliveries, delete-then-reinsert,
delete of absent keys, delete-only batches, empty batches).
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from transforms_for_apache_kafka_connect_spark import Chain
from transforms_for_apache_kafka_connect_spark.streaming import (
    LakeTable,
    MaintainedAggregate,
    Replayer,
)

from tests.test_property_merge import _mk_batches, _oracle, stream


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow, HealthCheck.function_scoped_fixture,
    ],
)
@given(
    batches=stream,
    strategy=st.sampled_from(["shuffle", "broadcast", "append"]),
)
def test_changelog_fold_and_maintained_count_match_oracle(
    spark, tmp_path_factory, batches, strategy
):
    root = str(tmp_path_factory.mktemp("prop_chg"))
    table = LakeTable(
        root + "/t", key_cols=["id"], n_buckets=4,
        discovery=(strategy != "broadcast"), merge_strategy=strategy,
        changelog=True,
    )
    agg = LakeTable(
        root + "/agg", key_cols=["id"], n_buckets=2,
        merge_strategy="broadcast",
    )
    rep = Replayer(
        table=table, chain=Chain([]), epoch="p", unique_lsn=True,
        maintain=[MaintainedAggregate(table=agg, group_cols=["id"])],
    )
    for bi, df in enumerate(_mk_batches(spark, batches)):
        rep.apply_batch(df, bi)

    expected = _oracle(batches)

    # 1. fold the changelog forward -> final state
    try:
        chg = table.read_changelog(spark)
    except ValueError:
        # no batch ever wrote changes -> table must be empty
        assert not expected
        return
    folded = (
        chg.filter(F.col("_change_type") != "update_preimage")
        .groupBy("id")
        .agg(
            F.max_by(
                F.struct("_change_type", "content"), F.col("batch_id")
            ).alias("w")
        )
        .filter(F.col("w._change_type") != "delete")
        .select("id", "w.content")
    )
    got = {r["id"]: r["content"] for r in folded.collect()}
    assert got == expected, f"strategy={strategy} fold mismatch"

    # 2. maintained per-key count == 1 for exactly the live keys
    if expected:
        counts = {
            r["id"]: r["n_rows"] for r in agg.read(spark).collect()
        }
        assert counts == {k: 1 for k in expected}, (
            f"strategy={strategy} maintained count mismatch"
        )
    else:
        m = agg.manifest()
        assert m["schema"] is None or agg.read(spark).count() == 0


# ------------------------------------------ maintained SCD2 (SCD2Table)

from transforms_for_apache_kafka_connect_spark.streaming import (  # noqa: E402
    SCD2Table,
    scd2_history,
)


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["a", "b", "c"]),
            st.sampled_from(["u", "u", "d"]),
            st.integers(-5, 5),
        ),
        min_size=1, max_size=18,
    ),
    st.integers(2, 9),
)
def test_scd2_table_parity_law(spark, tmp_path_factory, ops, width):
    """For ANY changelog stream and ANY batch width: the maintained
    type-2 table equals scd2_history over the full netted changelog —
    intervals, payloads and is_current."""
    from pyspark.sql import functions as F

    from transforms_for_apache_kafka_connect_spark.plans.chain import Chain
    from transforms_for_apache_kafka_connect_spark.streaming import (
        LakeTable,
        Replayer,
    )

    events = [
        (i, k, op, float(v) if op != "d" else None)
        for i, (k, op, v) in enumerate(ops)
    ]
    tmp = tmp_path_factory.mktemp("scd2_prop")
    table = LakeTable(str(tmp / "t"), key_cols=["k"], n_buckets=2,
                      merge_strategy="broadcast", changelog=True,
                      discovery=False)
    scd2 = SCD2Table(root=str(tmp / "scd2"), key_cols=["k"], n_buckets=2)
    rep = Replayer(table=table, chain=Chain([]), epoch="e",
                   maintain=[scd2])
    env = spark.createDataFrame(
        [("t", 0, (k,), (op, lsn, 0, None,
                         None if op == "d" else (v,)), lsn, None)
         for lsn, k, op, v in events],
        "topic string, partition int, key struct<k:string>, "
        "value struct<op:string, lsn:long, ts_ms:long, "
        "before:struct<v:double>, after:struct<v:double>>, "
        "timestamp long, headers map<string,string>",
    )
    rep.replay(env, batch_width=width, start_pos=0, max_pos=len(events))
    changes = table.read_changelog(spark).filter(
        F.col("_change_type") != "update_preimage"
    ).select(
        "k",
        F.when(F.col("_change_type") == "delete", F.lit("d"))
        .otherwise(F.lit("u")).alias("op"),
        "v",
        F.col("_change_lsn").alias("lsn"),
    )
    want = sorted(
        (r["k"], r["valid_from"], r["valid_to"], r["is_current"], r["v"])
        for r in scd2_history(changes, ["k"], "lsn", op_col="op")
        .drop("version").collect()
    )
    got = sorted(
        (r["k"], r["valid_from"], r["valid_to"], r["is_current"], r["v"])
        for r in scd2.read(spark, table).collect()
    )
    assert got == want
