"""Property-based check (hypothesis): for ANY sequence of merge
batches whose value-column type drifts within the lossless lattice
(int/long/float-as-int… here: the integral chain and double), the
final table state equals a plain Python dict LWW replay with every
value taken exactly — under all three merge strategies. Type drift
must never change WHICH row wins nor WHAT value it carries, and the
key column arriving narrow must keep hashing into the wide bucket.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from transforms_for_apache_kafka_connect_spark.errors import (
    SchemaEnforcementError,
)
from transforms_for_apache_kafka_connect_spark.streaming import LakeTable

# an update: (key 0..3, value small-int, delete?, value dtype)
upd = st.tuples(
    st.integers(0, 3),
    st.integers(0, 100),
    st.booleans(),
    st.sampled_from(["int", "long", "double"]),
)
# per-batch KEY dtype drift: int keys must supersede long-keyed rows
batch = st.tuples(
    st.lists(upd, min_size=0, max_size=6),
    st.sampled_from(["int", "long"]),
)
stream = st.lists(batch, min_size=1, max_size=4)


@pytest.mark.parametrize("strategy", ["shuffle", "broadcast", "append"])
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(batches=stream)
def test_widened_replay_matches_dict_oracle(
    spark, tmp_path_factory, strategy, batches
):
    root = tmp_path_factory.mktemp("widen_prop")
    # the FIRST batch's value dtype fixes the table's starting point;
    # later batches may widen it. Keys: make batch 0 long-keyed so
    # later int-keyed batches exercise the pre-bucket upcast.
    table = LakeTable(
        str(root / "t"), key_cols=["k"], n_buckets=4,
        merge_strategy=strategy,
    )
    oracle: dict[int, tuple[int, float]] = {}
    value_dtypes = []
    lsn = 0
    skipped = False
    for bi, (ups, key_dt) in enumerate(batches):
        key_dt = "long" if bi == 0 else key_dt
        per_key = {}
        for k, v, is_del, v_dt in ups:
            lsn += 1
            per_key[k] = (lsn, v, is_del)
        dts = [u[3] for u in ups]
        v_dt_batch = ("double" if "double" in dts
                      else "long" if "long" in dts else "int")
        value_dtypes.append(v_dt_batch)
        rows = [
            (k, float(v) if v_dt_batch == "double" else v, ls, is_del)
            for k, (ls, v, is_del) in per_key.items()
        ]
        df = spark.createDataFrame(
            rows,
            f"k {key_dt}, v {v_dt_batch}, _lsn long, __is_delete boolean",
        )
        try:
            table.merge(df, epoch="e", batch_id=bi)
        except SchemaEnforcementError:
            # int table + double batch is int->double (allowed);
            # long table + double batch is refused (lossy) — the
            # oracle must then skip this and all later batches
            skipped = True
            break
        for k, (ls, v, is_del) in per_key.items():
            if is_del:
                oracle.pop(k, None)
            else:
                oracle[k] = float(v) if v_dt_batch == "double" else v
    if not oracle and skipped:
        return
    try:
        got = {r["k"]: r["v"] for r in table.read(spark).collect()}
    except ValueError:
        # table never got a schema (every batch empty)
        assert not oracle
        return
    assert got == pytest.approx(oracle)
    # every key is unique in the table (the bucket-hash law)
    assert len(got) == table.read(spark).count()
