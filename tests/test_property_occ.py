"""Property law (hypothesis): for ANY split of a change stream across
two writers and ANY staleness of each writer's planning manifest, the
multi-writer OCC commit path converges to the same final state as a
single-threaded dict replay of the global stream — rebases and full
re-runs included, ledger exactly-once throughout.

Staleness is injected deterministically: before each merge the acting
writer's ``manifest()`` serves a snapshot from up to two commits back
(exactly what a writer that planned long before claiming sees), so
hypothesis explores rebase-eligible AND rerun-forcing interleavings
that the threaded tests can only hit by chance.
"""

from __future__ import annotations

import copy
import types

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from transforms_for_apache_kafka_connect_spark.streaming import LakeTable

SCHEMA = "k long, v string, _lsn long, __is_delete boolean"

# an event: (key id 0..3, is_delete); LSN = global emission order
event = st.tuples(st.integers(0, 3), st.booleans())
# a global stream cut into 2-5 batches, each assigned to one writer
batches_strategy = st.lists(
    st.tuples(
        st.sampled_from(["w1", "w2"]),
        st.lists(event, min_size=0, max_size=6),
        st.integers(0, 2),  # manifest staleness (commits back) at plan time
    ),
    min_size=2,
    max_size=5,
)


def _serve_stale(table, snapshot):
    orig = LakeTable.manifest
    state = {"served": False}

    def fake(self, version=None):
        if version is None and not state["served"]:
            state["served"] = True
            return copy.deepcopy(snapshot)
        return orig(self, version)

    table.manifest = types.MethodType(fake, table)


@pytest.mark.parametrize("strategy", ["broadcast", "append"])
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(plan=batches_strategy)
def test_occ_interleavings_converge(spark, tmp_path_factory, strategy, plan):
    root = str(tmp_path_factory.mktemp("occ_prop") / "t")

    # oracle: single-threaded LWW dict replay of the global stream
    expected: dict[int, tuple] = {}
    lsn = 0
    enriched = []
    for writer, evs, stale in plan:
        rows = []
        for k, is_del in evs:
            lsn += 1
            rows.append((k, None if is_del else f"v-{k}-{lsn}", lsn, is_del))
            if is_del:
                expected.pop(k, None)
            else:
                expected[k] = (f"v-{k}-{lsn}", lsn)
        enriched.append((writer, rows, stale))

    snapshots = [None]  # index 0 = virtual empty table
    batch_ids = {"w1": 0, "w2": 0}
    for writer, raw_rows, stale in enriched:
        # merge()'s contract is <=1 row per key (callers run lww_dedupe
        # first): collapse each batch to its per-key winner by lsn
        winners: dict[int, tuple] = {}
        for row in raw_rows:
            winners[row[0]] = row
        rows = sorted(winners.values())
        table = LakeTable(root, key_cols=["k"], n_buckets=4,
                          merge_strategy=strategy)
        if stale and len(snapshots) > 1:
            snap = snapshots[max(0, len(snapshots) - 1 - stale)]
            if snap is not None:
                _serve_stale(table, snap)
        df = spark.createDataFrame(rows, SCHEMA)
        table.merge(df, epoch=writer, batch_id=batch_ids[writer],
                    delete_col="__is_delete")
        batch_ids[writer] += 1
        snapshots.append(copy.deepcopy(LakeTable(
            root, key_cols=["k"], n_buckets=4).manifest()))

    final = LakeTable(root, key_cols=["k"], n_buckets=4,
                      merge_strategy=strategy)
    m = final.manifest()
    for w, n in batch_ids.items():
        for bid in range(n):
            assert [w, bid] in m["committed"], (w, bid)
    seen = [tuple(e) for e in m["committed"]]
    assert len(seen) == len(set(seen))
    got = {
        r["k"]: (r["v"], r["_lsn"])
        for r in final.read(spark).select("k", "v", "_lsn").collect()
    } if m["schema"] is not None else {}
    assert got == expected
