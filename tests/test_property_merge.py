"""Property-based check (hypothesis): for ANY sequence of batches of
change events, the final table state equals a single-threaded Python
dict replay — under ALL THREE merge strategies (COW shuffle, COW
broadcast anti-join, merge-on-read append). This is the engine's core
claim (north_rule: final-state parity after replay) exercised on
adversarial inputs rather than the friendly generator distribution:
duplicate LSN deliveries, delete-then-reinsert, keys that never exist,
batches that only delete, empty batches.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from transforms_for_apache_kafka_connect_spark import Chain
from transforms_for_apache_kafka_connect_spark.streaming import LakeTable, Replayer

# an event: (key id, op, batch index it lands in)
# LSN = global emission order -> unique and monotone, like a binlog
event = st.tuples(st.integers(0, 3), st.sampled_from(["c", "u", "d"]))

stream = st.lists(
    st.lists(event, min_size=0, max_size=8), min_size=1, max_size=4
)


def _mk_batches(spark, batches):
    """Assign LSNs in order; content is a pure function of (key, lsn)."""
    dfs, lsn = [], 0
    for bi, evs in enumerate(batches):
        rows = []
        for k, op in evs:
            lsn += 1
            rows.append(
                ("t", 0, (f"k{k}",), (op, lsn, lsn, (f"c-{k}-{lsn}",)), lsn, None)
            )
        dfs.append(
            spark.createDataFrame(
                rows,
                "topic string, partition int, key struct<id:string>, "
                "value struct<op:string,lsn:bigint,ts_ms:bigint,"
                "after:struct<content:string>>, "
                "timestamp long, headers map<string,string>",
            )
            if rows
            else spark.createDataFrame(
                [],
                "topic string, partition int, key struct<id:string>, "
                "value struct<op:string,lsn:bigint,ts_ms:bigint,"
                "after:struct<content:string>>, "
                "timestamp long, headers map<string,string>",
            )
        )
    return dfs


def _oracle(batches):
    """Single-threaded replay: apply events in LSN order."""
    state, lsn = {}, 0
    for evs in batches:
        for k, op in evs:
            lsn += 1
            if op == "d":
                state.pop(f"k{k}", None)
            else:
                state[f"k{k}"] = f"c-{k}-{lsn}"
    return state


def test_empty_batch_broadcast_merge_commits_without_rewrite(
    spark, tmp_path_factory
):
    """Regression: an empty batch in dense (broadcast) mode used to
    make Observation.get unretrievable — AQE's empty-relation
    propagation pruned the CollectMetrics node, PythonSQLUtils.toPyRow
    failed its schema assertion, and the error gate (rightly refusing
    to swallow arbitrary failures) failed the batch. observation_pruned
    now recognizes that exact signature as 'observed subtree was empty
    = zero errors' and the batch commits."""
    root = str(tmp_path_factory.mktemp("empty_bcast"))
    table = LakeTable(
        root, key_cols=["id"], n_buckets=4,
        discovery=False, merge_strategy="broadcast",
    )
    rep = Replayer(table=table, chain=Chain([]), epoch="p", unique_lsn=True)
    batches = [[(0, "c"), (1, "c")], [], [(0, "d")], []]
    for bi, df in enumerate(_mk_batches(spark, batches)):
        rep.apply_batch(df, bi)
    m = table.manifest()
    assert ["p", 1] in m["committed"] and ["p", 3] in m["committed"]
    got = {
        r["id"]: r["content"]
        for r in table.read(spark).select("id", "content").collect()
    }
    assert got == _oracle(batches)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(batches=stream, strategy=st.sampled_from(["shuffle", "broadcast", "append"]))
def test_merge_matches_dict_oracle_all_strategies(
    spark, tmp_path_factory, batches, strategy
):
    root = str(tmp_path_factory.mktemp("prop_merge"))
    table = LakeTable(
        root, key_cols=["id"], n_buckets=4,
        discovery=(strategy != "broadcast"), merge_strategy=strategy,
    )
    rep = Replayer(table=table, chain=Chain([]), epoch="p", unique_lsn=True)
    for bi, df in enumerate(_mk_batches(spark, batches)):
        rep.apply_batch(df, bi)

    expected = _oracle(batches)
    try:
        got = {
            r["id"]: r["content"]
            for r in table.read(spark).select("id", "content").collect()
        }
    except ValueError as e:
        # an all-empty stream never commits a schema: table stays empty
        assert "no schema" in str(e) and not expected
        return
    assert got == expected, f"strategy={strategy}"
