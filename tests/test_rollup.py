"""TimeRollup: multi-granularity continuous aggregates maintained from
the changelog. The invariant under test everywhere: after any replay,
each granularity's rollup equals a from-scratch GROUP BY time_bucket
over the FINAL table state — including when updates MOVE a row's
timestamp across buckets (the retraction must leave the old bucket)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from transforms_for_apache_kafka_connect_spark.plans.chain import Chain
from transforms_for_apache_kafka_connect_spark.streaming import (
    LakeTable,
    Replayer,
    TimeRollup,
    granularity_ms,
    time_bucket,
)

HOUR = 3_600_000
DAY = 86_400_000
BASE = 1_600_000_000_000 - (1_600_000_000_000 % DAY)  # day-aligned


def test_granularity_ms_parses():
    assert granularity_ms("1 hour") == HOUR
    assert granularity_ms("15 minutes") == 15 * 60_000
    assert granularity_ms("2 days") == 2 * DAY
    for bad in ("1 month", "hourly", "0 hours", "-1 day"):
        with pytest.raises(ValueError):
            granularity_ms(bad)


def test_time_bucket_integer_math(spark):
    df = spark.createDataFrame(
        [(BASE + HOUR + 1,), (BASE + HOUR,), (BASE + 2 * HOUR - 1,),
         (-1,)],  # pre-1970: bucket start must be at-or-before
        "ts long",
    )
    got = [r[0] for r in df.select(time_bucket("ts", "1 hour")).collect()]
    assert got == [BASE + HOUR, BASE + HOUR, BASE + HOUR, -HOUR]


_VAL_T = T.StructType([
    T.StructField("val", T.DoubleType()),
    T.StructField("ts_ms", T.LongType()),
])
_ENV_T = T.StructType([
    T.StructField("topic", T.StringType(), False),
    T.StructField("partition", T.IntegerType(), False),
    T.StructField("key", T.StructType([T.StructField("k", T.StringType())])),
    T.StructField("value", T.StructType([
        T.StructField("op", T.StringType()),
        T.StructField("lsn", T.LongType()),
        T.StructField("ts_ms", T.LongType()),
        T.StructField("before", _VAL_T),
        T.StructField("after", _VAL_T),
    ])),
    T.StructField("timestamp", T.LongType()),
    T.StructField("headers", T.MapType(T.StringType(), T.StringType())),
])


def _env(spark, events):
    """events: (lsn, key, op, val, ts_ms) -> CDC envelope frame."""
    rows = []
    for lsn, k, op, val, ts in events:
        after = None if op == "d" else (val, ts)
        rows.append(
            ("t", 0, (k,), (op, lsn, ts or 0, None, after), lsn, None)
        )
    return spark.createDataFrame(rows, _ENV_T)


@pytest.fixture()
def replayed(spark, tmp_path):
    """3 keys, 3 batches; key 'a' moves across hour AND day buckets,
    'b' is deleted, 'c' moves within one bucket."""
    events = [
        # batch 0: lsn 0..9
        (1, "a", "u", 1.0, BASE + 10),
        (2, "b", "u", 2.0, BASE + HOUR + 10),
        (3, "c", "u", 3.0, BASE + 20),
        # batch 1: lsn 10..19 — a moves to the next DAY
        (11, "a", "u", 4.0, BASE + DAY + 50),
        (12, "c", "u", 5.0, BASE + 30),  # same bucket, new val
        # batch 2: lsn 20..29 — b deleted, a moves hour within day 2
        (21, "b", "d", None, None),
        (22, "a", "u", 6.0, BASE + DAY + 2 * HOUR),
    ]
    table = LakeTable(str(tmp_path / "t"), key_cols=["k"], n_buckets=4,
                      merge_strategy="broadcast", changelog=True,
                      discovery=False)
    roll = TimeRollup(
        root=str(tmp_path / "roll"), time_col="ts_ms",
        granularities=["1 hour", "1 day"], sum_cols=["val"],
    )
    rep = Replayer(table=table, chain=Chain([]), epoch="e",
                   maintain=roll.specs)
    rep.replay(_env(spark, events), batch_width=10, start_pos=0, max_pos=30)
    return table, roll, rep, events


def _recompute(spark, table, gran):
    return {
        (r[0],): (r[1], r[2])
        for r in table.read(spark)
        .groupBy(time_bucket("ts_ms", gran))
        .agg(F.count("*").alias("n"), F.sum("val").alias("s"))
        .collect()
    }


def _rollup_state(spark, roll, gran):
    return {
        (r["bucket_ms"],): (r["n_rows"], r["sum_val"])
        for r in roll.read(spark, gran).collect()
    }


def test_rollup_equals_recompute_all_granularities(spark, replayed):
    table, roll, _, _ = replayed
    for gran in ("1 hour", "1 day"):
        got = _rollup_state(spark, roll, gran)
        want = _recompute(spark, table, gran)
        assert got == want and len(got) > 0, gran


def test_rollup_moved_timestamp_left_old_bucket(spark, replayed):
    table, roll, _, _ = replayed
    hour = _rollup_state(spark, roll, "1 hour")
    # final state: a@(BASE+DAY+2h, 6.0), c@(BASE, 5.0); b deleted
    assert hour == {
        (BASE,): (1, 5.0),
        (BASE + DAY + 2 * HOUR,): (1, 6.0),
    }
    day = _rollup_state(spark, roll, "1 day")
    assert day == {(BASE,): (1, 5.0), (BASE + DAY,): (1, 6.0)}


def test_rollup_replay_is_exactly_once(spark, replayed):
    table, roll, rep, events = replayed
    before = {g: _rollup_state(spark, roll, g) for g in ("1 hour", "1 day")}
    rep.replay(_env(spark, events), batch_width=10, start_pos=0, max_pos=30)
    after = {g: _rollup_state(spark, roll, g) for g in ("1 hour", "1 day")}
    assert before == after


def test_rollup_granularities_are_consistent(spark, replayed):
    """Summing hour buckets within each day == the day rollup."""
    _, roll, _, _ = replayed
    hour = roll.read(spark, "1 hour")
    folded = {
        (r[0],): (r[1], r[2])
        for r in hour.groupBy(time_bucket("bucket_ms", "1 day"))
        .agg(F.sum("n_rows").alias("n"), F.sum("sum_val").alias("s"))
        .collect()
    }
    assert folded == _rollup_state(spark, roll, "1 day")


def test_rollup_rejects_bad_config(tmp_path):
    with pytest.raises(ValueError):
        TimeRollup(root=str(tmp_path), time_col="ts", granularities=[])
    with pytest.raises(ValueError):
        TimeRollup(root=str(tmp_path), time_col="ts",
                   granularities=["1 hour", "60 minutes"])  # same width
    with pytest.raises(KeyError):
        TimeRollup(root=str(tmp_path), time_col="ts",
                   granularities=["1 hour"]).table("1 day")


# ----------------------------------------------------- HLL distinct


def _roll_distinct(tmp_path, name, **kw):
    return TimeRollup(
        root=str(tmp_path / name), time_col="ts_ms",
        granularities=["1 hour", "1 day"], distinct_cols=["k"], **kw,
    )


def _distinct_state(spark, roll, gran):
    return {
        r["bucket_ms"]: (r["n_rows"], r["approx_distinct_k"])
        for r in roll.read(spark, gran).collect()
    }


def test_rollup_distinct_tracks_exact_on_append(spark, tmp_path):
    """Append-only stream: the maintained HLL estimate equals the exact
    per-bucket COUNT(DISTINCT k) (small cardinalities are exact)."""
    # unique keys -> pure inserts; the distinct column is `val`, which
    # repeats within and across buckets (distinct < count per bucket)
    events = [
        (i + 1, f"k{i}", "u", float(i % 7), BASE + (i % 5) * HOUR + i)
        for i in range(40)
    ]
    table = LakeTable(str(tmp_path / "t"), key_cols=["k"], n_buckets=4,
                      merge_strategy="broadcast", changelog=True,
                      discovery=False)
    roll = TimeRollup(
        root=str(tmp_path / "roll"), time_col="ts_ms",
        granularities=["1 hour", "1 day"], distinct_cols=["val"],
    )
    rep = Replayer(table=table, chain=Chain([]), epoch="e",
                   maintain=roll.specs)
    rep.replay(_env(spark, events), batch_width=20, start_pos=0,
               max_pos=41)
    for gran in ("1 hour", "1 day"):
        exact = {
            r[0]: r[1]
            for r in table.read(spark)
            .groupBy(time_bucket("ts_ms", gran))
            .agg(F.countDistinct("val").alias("d"))
            .collect()
        }
        got = {
            r["bucket_ms"]: r["approx_distinct_val"]
            for r in roll.read(spark, gran).collect()
        }
        assert got == exact and exact


def test_rollup_distinct_same_bucket_update_is_exact(spark, tmp_path):
    """An update that keeps (bucket, k) nets to zero — allowed under
    on_retraction='error' and the estimate stays exact."""
    table = LakeTable(str(tmp_path / "t"), key_cols=["k"], n_buckets=2,
                      merge_strategy="broadcast", changelog=True,
                      discovery=False)
    roll = _roll_distinct(tmp_path, "roll")
    rep = Replayer(table=table, chain=Chain([]), epoch="e",
                   maintain=roll.specs)
    # batch 0 inserts; batch 1 updates the same keys in the same hour
    # bucket with new values
    rep.replay(_env(spark, [
        (1, "a", "u", 1.0, BASE + 10),
        (2, "b", "u", 2.0, BASE + 20),
        (11, "a", "u", 9.0, BASE + 30),
        (12, "b", "u", 8.0, BASE + 40),
    ]), batch_width=10, start_pos=0, max_pos=20)
    assert _distinct_state(spark, roll, "1 hour") == {BASE: (2, 2)}


def test_rollup_distinct_error_on_member_leaving(spark, tmp_path):
    """A timestamp move across buckets retracts the member from its old
    bucket: on_retraction='error' (default) must refuse the batch."""
    table = LakeTable(str(tmp_path / "t"), key_cols=["k"], n_buckets=2,
                      merge_strategy="broadcast", changelog=True,
                      discovery=False)
    roll = _roll_distinct(tmp_path, "roll")
    rep = Replayer(table=table, chain=Chain([]), epoch="e",
                   maintain=roll.specs)
    # batch 0 inserts, batch 1 moves the timestamp across buckets
    with pytest.raises(ValueError, match="cannot forget"):
        rep.replay(_env(spark, [
            (1, "a", "u", 1.0, BASE + 10),
            (11, "a", "u", 2.0, BASE + DAY),
        ]), batch_width=10, start_pos=0, max_pos=20)
    # a delete is a retraction too
    roll2 = _roll_distinct(tmp_path, "roll2")
    table2 = LakeTable(str(tmp_path / "t2"), key_cols=["k"], n_buckets=2,
                       merge_strategy="broadcast", changelog=True,
                       discovery=False)
    rep2 = Replayer(table=table2, chain=Chain([]), epoch="e",
                    maintain=roll2.specs)
    with pytest.raises(ValueError, match="cannot forget"):
        rep2.replay(_env(spark, [
            (1, "a", "u", 1.0, BASE + 10),
            (11, "a", "d", None, 0),
        ]), batch_width=10, start_pos=0, max_pos=20)


def test_rollup_distinct_stale_mode_is_upper_bound(spark, tmp_path):
    """on_retraction='stale': the fold proceeds; the moved member stays
    counted in its old bucket (distinct-ever-seen) and appears in the
    new one."""
    table = LakeTable(str(tmp_path / "t"), key_cols=["k"], n_buckets=2,
                      merge_strategy="broadcast", changelog=True,
                      discovery=False)
    roll = _roll_distinct(tmp_path, "roll", on_retraction="stale")
    rep = Replayer(table=table, chain=Chain([]), epoch="e",
                   maintain=roll.specs)
    rep.replay(_env(spark, [
        (1, "a", "u", 1.0, BASE + 10),
        (2, "b", "u", 1.0, BASE + 20),
        (11, "a", "u", 2.0, BASE + DAY),
    ]), batch_width=10, start_pos=0, max_pos=20)
    got = _distinct_state(spark, roll, "1 day")
    # old day bucket: n_rows says 1 (b), distinct-ever says 2 (a stayed)
    assert got[BASE] == (1, 2)
    assert got[BASE + DAY] == (1, 1)


def test_rollup_distinct_sketches_merge_up(spark, tmp_path):
    """Mergeability: unioning the HOUR sketches inside each day equals
    the maintained DAY estimates — the property that lets ad-hoc
    coarser windows derive from finer rollups without a base rescan."""
    events = [
        (i + 1, f"u{i}", "u", float(i % 11), BASE + (i % 30) * HOUR + i)
        for i in range(60)
    ]
    table = LakeTable(str(tmp_path / "t"), key_cols=["k"], n_buckets=4,
                      merge_strategy="broadcast", changelog=True,
                      discovery=False)
    roll = TimeRollup(
        root=str(tmp_path / "roll"), time_col="ts_ms",
        granularities=["1 hour", "1 day"], distinct_cols=["val"],
    )
    rep = Replayer(table=table, chain=Chain([]), epoch="e",
                   maintain=roll.specs)
    rep.replay(_env(spark, events), batch_width=30, start_pos=0,
               max_pos=61)
    hour = roll.read_sketches(spark, "1 hour")
    folded = {
        r[0]: r[1]
        for r in hour.groupBy(time_bucket("bucket_ms", "1 day"))
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("hll_val")).alias("d")
        )
        .collect()
    }
    day = {
        r["bucket_ms"]: r["approx_distinct_val"]
        for r in roll.read(spark, "1 day").collect()
    }
    assert folded == day and len(day) >= 2


def test_rollup_distinct_recompute_mode_is_exact_under_moves(spark, tmp_path):
    """on_retraction='recompute': the full adversarial scenario —
    timestamp moves across hour AND day buckets plus a delete — and
    every granularity's distinct estimate still equals an exact
    COUNT(DISTINCT k) recompute over the final state."""
    events = [
        (1, "a", "u", 1.0, BASE + 10),
        (2, "b", "u", 2.0, BASE + HOUR + 10),
        (3, "c", "u", 3.0, BASE + 20),
        (11, "a", "u", 4.0, BASE + DAY + 50),   # a moves to next day
        (12, "c", "u", 5.0, BASE + 30),          # same bucket, new val
        (21, "b", "d", None, 0),                 # b deleted
        (22, "a", "u", 6.0, BASE + DAY + 2 * HOUR),  # a moves hour
    ]
    table = LakeTable(str(tmp_path / "t"), key_cols=["k"], n_buckets=4,
                      merge_strategy="broadcast", changelog=True,
                      discovery=False)
    roll = _roll_distinct(tmp_path, "roll", on_retraction="recompute")
    rep = Replayer(table=table, chain=Chain([]), epoch="e",
                   maintain=roll.specs)
    rep.replay(_env(spark, events), batch_width=10, start_pos=0,
               max_pos=30)
    for gran in ("1 hour", "1 day"):
        exact = {
            r[0]: r[1]
            for r in table.read(spark)
            .groupBy(time_bucket("ts_ms", gran))
            .agg(F.countDistinct("k").alias("d"))
            .collect()
        }
        got = {b: d for b, (_, d) in _distinct_state(spark, roll, gran).items()}
        assert got == exact and exact, gran
    # and replaying the same events is still a no-op
    before = _distinct_state(spark, roll, "1 day")
    rep.replay(_env(spark, events), batch_width=10, start_pos=0,
               max_pos=30)
    assert _distinct_state(spark, roll, "1 day") == before


def test_rollup_distinct_recompute_requires_base(spark, tmp_path):
    from transforms_for_apache_kafka_connect_spark.streaming.incremental import (
        incremental_agg_update,
    )

    agg = LakeTable(str(tmp_path / "agg"), key_cols=["g"], n_buckets=2,
                    discovery=False, merge_strategy="broadcast")
    chg = spark.createDataFrame(
        [("g1", "x", "insert")], "g string, k string, _change_type string"
    )
    with pytest.raises(ValueError, match="base_table"):
        incremental_agg_update(
            agg, chg, group_cols=["g"], distinct_cols=["k"],
            on_retraction="recompute", epoch="e", batch_id=0,
        )
    with pytest.raises(ValueError, match="on_retraction"):
        incremental_agg_update(
            agg, chg, group_cols=["g"], distinct_cols=["k"],
            on_retraction="never", epoch="e", batch_id=0,
        )


# ----------------------------------------------------- KLL quantiles


def _roll_quant(tmp_path, name, **kw):
    return TimeRollup(
        root=str(tmp_path / name), time_col="ts_ms",
        granularities=["1 hour", "1 day"], quantile_cols=["val"], **kw,
    )


def _quant_state(spark, roll, gran):
    return {
        r["bucket_ms"]: (r["p50_val"], r["p95_val"])
        for r in roll.read(
            spark, gran, quantiles={"val": [0.5, 0.95]}
        ).collect()
    }


def _quant_recompute(spark, table, gran):
    """From-scratch KLL over final state — same sketch function, so
    equality is convention-free."""
    return {
        r[0]: (r[1], r[2])
        for r in table.read(spark)
        .groupBy(time_bucket("ts_ms", gran))
        .agg(F.kll_sketch_agg_double(F.col("val").cast("double")).alias("s"))
        .select(
            "bucket_ms",
            F.kll_sketch_get_quantile_double("s", F.lit(0.5)),
            F.kll_sketch_get_quantile_double("s", F.lit(0.95)),
        )
        .collect()
    }


def test_rollup_quantiles_track_recompute_on_append(spark, tmp_path):
    events = [
        (i + 1, f"k{i}", "u", float((i * 7) % 23), BASE + (i % 5) * HOUR + i)
        for i in range(60)
    ]
    table = LakeTable(str(tmp_path / "t"), key_cols=["k"], n_buckets=4,
                      merge_strategy="broadcast", changelog=True,
                      discovery=False)
    roll = _roll_quant(tmp_path, "roll")
    rep = Replayer(table=table, chain=Chain([]), epoch="e",
                   maintain=roll.specs)
    rep.replay(_env(spark, events), batch_width=20, start_pos=0,
               max_pos=61)
    for gran, n_buckets in (("1 hour", 5), ("1 day", 1)):
        got = _quant_state(spark, roll, gran)
        want = _quant_recompute(spark, table, gran)
        assert got == want and len(got) == n_buckets, gran
    # probes are real member values and bounded by min/max
    probed = roll.read(spark, "1 day",
                       quantiles={"val": [0.0, 0.5, 1.0]}).collect()
    vals = {float((i * 7) % 23) for i in range(60)}
    for r in probed:
        assert r["p0_val"] <= r["p50_val"] <= r["p100_val"]
        assert r["p50_val"] in vals


def test_rollup_quantiles_strict_guard_and_recompute(spark, tmp_path):
    """A same-value update is FINE for HLL but violates KLL (weights);
    'error' refuses, 'recompute' stays equal to a from-scratch KLL."""
    events = [
        (1, "a", "u", 5.0, BASE + 10),
        (2, "b", "u", 7.0, BASE + 20),
        (11, "a", "u", 5.0, BASE + 30),  # same value, same bucket
    ]
    table = LakeTable(str(tmp_path / "t"), key_cols=["k"], n_buckets=2,
                      merge_strategy="broadcast", changelog=True,
                      discovery=False)
    roll = _roll_quant(tmp_path, "roll")
    rep = Replayer(table=table, chain=Chain([]), epoch="e",
                   maintain=roll.specs)
    with pytest.raises(ValueError, match="cannot forget"):
        rep.replay(_env(spark, events), batch_width=10, start_pos=0,
                   max_pos=20)

    table2 = LakeTable(str(tmp_path / "t2"), key_cols=["k"], n_buckets=2,
                       merge_strategy="broadcast", changelog=True,
                       discovery=False)
    roll2 = _roll_quant(tmp_path, "roll2", on_retraction="recompute")
    rep2 = Replayer(table=table2, chain=Chain([]), epoch="e",
                    maintain=roll2.specs)
    # add a cross-bucket move and a delete for good measure
    events2 = events + [(21, "b", "d", None, 0),
                        (22, "a", "u", 9.0, BASE + DAY)]
    rep2.replay(_env(spark, events2), batch_width=10, start_pos=0,
                max_pos=30)
    for gran in ("1 hour", "1 day"):
        assert _quant_state(spark, roll2, gran) == _quant_recompute(
            spark, table2, gran
        ), gran


def test_rollup_quantiles_merge_up(spark, tmp_path):
    events = [
        (i + 1, f"k{i}", "u", float(i % 13), BASE + (i % 30) * HOUR)
        for i in range(90)
    ]
    table = LakeTable(str(tmp_path / "t"), key_cols=["k"], n_buckets=4,
                      merge_strategy="broadcast", changelog=True,
                      discovery=False)
    roll = _roll_quant(tmp_path, "roll")
    rep = Replayer(table=table, chain=Chain([]), epoch="e",
                   maintain=roll.specs)
    rep.replay(_env(spark, events), batch_width=45, start_pos=0,
               max_pos=91)
    hour = roll.read_sketches(spark, "1 hour")
    merged = {
        r[0]: r[1]
        for r in hour.groupBy(time_bucket("bucket_ms", "1 day"))
        .agg(
            F.reduce(
                F.collect_list("kll_val"),
                F.lit(None).cast("binary"),
                lambda acc, s: F.when(acc.isNull(), s).otherwise(
                    F.kll_sketch_merge_double(acc, s)
                ),
            ).alias("s")
        )
        .select("bucket_ms",
                F.kll_sketch_get_quantile_double("s", F.lit(0.5)))
        .collect()
    }
    day = {
        r["bucket_ms"]: r["p50_val"]
        for r in roll.read(spark, "1 day",
                           quantiles={"val": [0.5]}).collect()
    }
    assert merged == day and len(day) >= 2


def test_rollup_quantiles_validations(spark, tmp_path):
    roll = _roll_quant(tmp_path, "roll")
    with pytest.raises(KeyError, match="quantile_cols"):
        roll.read(spark, "1 hour", quantiles={"nope": [0.5]})


def test_rollup_quantiles_all_null_group_reads_as_null(spark, tmp_path):
    """Review regression: an all-NULL quantile column yields a non-NULL
    EMPTY KLL buffer from kll_sketch_agg_double, which the probe
    rejects (KLL_INVALID_INPUT_SKETCH_BUFFER) — the sketch must be
    nullified at the source and the probe return NULL."""
    table = LakeTable(str(tmp_path / "t"), key_cols=["k"], n_buckets=2,
                      merge_strategy="broadcast", changelog=True,
                      discovery=False)
    roll = _roll_quant(tmp_path, "roll")
    rep = Replayer(table=table, chain=Chain([]), epoch="e",
                   maintain=roll.specs)
    # bucket BASE: only NULL vals; bucket BASE+HOUR: real vals
    rep.replay(_env(spark, [
        (1, "a", "u", None, BASE + 10),
        (2, "b", "u", None, BASE + 20),
        (3, "c", "u", 4.0, BASE + HOUR + 10),
    ]), batch_width=10, start_pos=0, max_pos=10)
    got = {
        r["bucket_ms"]: r["p50_val"]
        for r in roll.read(spark, "1 hour",
                           quantiles={"val": [0.5]}).collect()
    }
    assert got == {BASE: None, BASE + HOUR: 4.0}


# ----------------------------------------------------- MIN/MAX bounds


def _roll_mm(tmp_path, name, **kw):
    return TimeRollup(
        root=str(tmp_path / name), time_col="ts_ms",
        granularities=["1 hour", "1 day"], minmax_cols=["val"], **kw,
    )


def _mm_state(spark, roll, gran):
    return {
        r["bucket_ms"]: (r["n_rows"], r["min_val"], r["max_val"])
        for r in roll.read(spark, gran).collect()
    }


def _mm_exact(spark, table, gran):
    return {
        r[0]: (r[1], r[2], r[3])
        for r in table.read(spark)
        .groupBy(time_bucket("ts_ms", gran))
        .agg(F.count(F.lit(1)), F.min("val"), F.max("val"))
        .collect()
    }


def test_rollup_minmax_tracks_exact_on_append(spark, tmp_path):
    """Pure inserts: min/max fold via least/greatest, exact under the
    default 'error' policy (no retraction ever fires the guard)."""
    table = LakeTable(str(tmp_path / "t"), key_cols=["k"], n_buckets=4,
                      merge_strategy="broadcast", changelog=True,
                      discovery=False)
    roll = _roll_mm(tmp_path, "roll")
    rep = Replayer(table=table, chain=Chain([]), epoch="e",
                   maintain=roll.specs)
    rep.replay(_env(spark, [
        (1, "a", "c", 5.0, BASE + 10),
        (2, "b", "c", 1.0, BASE + 20),
        (3, "c", "c", 9.0, BASE + HOUR + 10),
        (11, "d", "c", -2.0, BASE + 30),   # second batch lowers the min
        (12, "e", "c", 11.0, BASE + HOUR + 20),
    ]), batch_width=10, start_pos=0, max_pos=20)
    for gran in ("1 hour", "1 day"):
        assert _mm_state(spark, roll, gran) == _mm_exact(
            spark, table, gran
        ), gran


def test_rollup_minmax_interior_retraction_folds_free(spark, tmp_path):
    """A retraction strictly inside (min, max) cannot move a bound —
    it must fold WITHOUT violating, even under on_retraction='error'
    (the guard is value-aware, not any-retraction like KLL)."""
    table = LakeTable(str(tmp_path / "t"), key_cols=["k"], n_buckets=4,
                      merge_strategy="broadcast", changelog=True,
                      discovery=False)
    roll = _roll_mm(tmp_path, "roll")  # default on_retraction='error'
    rep = Replayer(table=table, chain=Chain([]), epoch="e",
                   maintain=roll.specs)
    rep.replay(_env(spark, [
        (1, "a", "c", 1.0, BASE + 10),
        (2, "b", "c", 5.0, BASE + 20),   # interior value
        (3, "c", "c", 9.0, BASE + 30),
        (11, "b", "u", 6.0, BASE + 40),  # retracts interior 5.0 -> ok
    ]), batch_width=10, start_pos=0, max_pos=20)
    assert _mm_state(spark, roll, "1 hour") == {BASE: (3, 1.0, 9.0)}


def test_rollup_minmax_error_when_bound_retracted(spark, tmp_path):
    table = LakeTable(str(tmp_path / "t"), key_cols=["k"], n_buckets=4,
                      merge_strategy="broadcast", changelog=True,
                      discovery=False)
    roll = _roll_mm(tmp_path, "roll")
    rep = Replayer(table=table, chain=Chain([]), epoch="e",
                   maintain=roll.specs)
    # batch 0 inserts; batch 1 deletes the current max -> must refuse
    with pytest.raises(ValueError, match="min/max"):
        rep.replay(_env(spark, [
            (1, "a", "c", 1.0, BASE + 10),
            (2, "b", "c", 9.0, BASE + 20),
            (11, "b", "d", None, 0),
        ]), batch_width=10, start_pos=0, max_pos=20)


def test_rollup_minmax_recompute_is_exact_under_moves(spark, tmp_path):
    """on_retraction='recompute': timestamp moves across buckets, a
    same-bucket value change AND a bound delete — every granularity's
    min/max still equals an exact recompute; re-replay is a no-op."""
    events = [
        (1, "a", "u", 1.0, BASE + 10),
        (2, "b", "u", 9.0, BASE + HOUR + 10),
        (3, "c", "u", 3.0, BASE + 20),
        (11, "a", "u", 4.0, BASE + DAY + 50),       # min leaves its day
        (12, "c", "u", -5.0, BASE + 30),             # new min, same bucket
        (21, "b", "d", None, 0),                     # delete a max
        (22, "a", "u", 6.0, BASE + DAY + 2 * HOUR),  # move hour again
    ]
    table = LakeTable(str(tmp_path / "t"), key_cols=["k"], n_buckets=4,
                      merge_strategy="broadcast", changelog=True,
                      discovery=False)
    roll = _roll_mm(tmp_path, "roll", on_retraction="recompute")
    rep = Replayer(table=table, chain=Chain([]), epoch="e",
                   maintain=roll.specs)
    rep.replay(_env(spark, events), batch_width=10, start_pos=0,
               max_pos=30)
    for gran in ("1 hour", "1 day"):
        assert _mm_state(spark, roll, gran) == _mm_exact(
            spark, table, gran
        ), gran
    before = _mm_state(spark, roll, "1 day")
    rep.replay(_env(spark, events), batch_width=10, start_pos=0,
               max_pos=30)
    assert _mm_state(spark, roll, "1 day") == before


def test_rollup_minmax_stale_is_envelope(spark, tmp_path):
    """'stale': bounds become the monotone ever-seen envelope — always
    at-or-outside the exact bounds, never inside."""
    events = [
        (1, "a", "u", 1.0, BASE + 10),
        (2, "b", "u", 9.0, BASE + 20),
        (11, "a", "d", None, 0),   # exact min rises to 9.0
        (12, "b", "u", 5.0, BASE + 30),  # exact max drops to 5.0
    ]
    table = LakeTable(str(tmp_path / "t"), key_cols=["k"], n_buckets=4,
                      merge_strategy="broadcast", changelog=True,
                      discovery=False)
    roll = _roll_mm(tmp_path, "roll", on_retraction="stale")
    rep = Replayer(table=table, chain=Chain([]), epoch="e",
                   maintain=roll.specs)
    rep.replay(_env(spark, events), batch_width=10, start_pos=0,
               max_pos=20)
    got = _mm_state(spark, roll, "1 hour")
    exact = _mm_exact(spark, table, "1 hour")
    assert got[BASE][0] == exact[BASE][0] == 1
    assert got[BASE][1] <= exact[BASE][1]  # envelope min <= exact min
    assert got[BASE][2] >= exact[BASE][2]  # envelope max >= exact max
    assert got[BASE] == (1, 1.0, 9.0)


def test_rollup_minmax_recompute_requires_base(spark, tmp_path):
    from transforms_for_apache_kafka_connect_spark.streaming.incremental import (
        incremental_agg_update,
    )

    agg = LakeTable(str(tmp_path / "agg"), key_cols=["g"], n_buckets=2,
                    discovery=False, merge_strategy="broadcast")
    chg = spark.createDataFrame(
        [("g1", 1.0, "insert")], "g string, v double, _change_type string"
    )
    with pytest.raises(ValueError, match="base_table"):
        incremental_agg_update(
            agg, chg, group_cols=["g"], minmax_cols=["v"],
            on_retraction="recompute", epoch="e", batch_id=0,
        )


def test_rollup_minmax_same_value_churn_at_bound_folds_free(spark, tmp_path):
    """Review regression: the standard LWW update pair for a row whose
    OTHER columns changed retracts and reinserts the SAME value — the
    value nets zero in the batch, so even when it holds a bound the
    guard must not fire (default 'error' policy keeps replaying) and
    the fold stays exact."""
    table = LakeTable(str(tmp_path / "t"), key_cols=["k"], n_buckets=4,
                      merge_strategy="broadcast", changelog=True,
                      discovery=False)
    roll = _roll_mm(tmp_path, "roll")  # default on_retraction='error'
    rep = Replayer(table=table, chain=Chain([]), epoch="e",
                   maintain=roll.specs)
    rep.replay(_env(spark, [
        (1, "a", "c", 1.0, BASE + 10),   # the bucket min
        (2, "b", "c", 9.0, BASE + 20),
        # batch 1: 'a' updated with the SAME val/ts (a non-measure
        # change in real life): pre-image retracts 1.0, post-image
        # reinserts it -> net 0 at the min
        (11, "a", "u", 1.0, BASE + 10),
    ]), batch_width=10, start_pos=0, max_pos=20)
    assert _mm_state(spark, roll, "1 hour") == {BASE: (2, 1.0, 9.0)}


# ------------------------------------------------- moments (avg/var/std)


def _roll_mom(tmp_path, name, **kw):
    return TimeRollup(
        root=str(tmp_path / name), time_col="ts_ms",
        granularities=["1 hour", "1 day"], moment_cols=["val"], **kw,
    )


def _mom_state(spark, roll, gran):
    return {
        r["bucket_ms"]: (r["n_rows"], r["avg_val"], r["var_val"], r["std_val"])
        for r in roll.read(spark, gran).collect()
    }


def _mom_recompute(spark, table, gran):
    return {
        r[0]: (r[1], r[2], r[3], r[4])
        for r in table.read(spark)
        .groupBy(time_bucket("ts_ms", gran))
        .agg(
            F.count("*").alias("n"),
            F.avg("val").alias("a"),
            F.var_samp("val").alias("v"),
            F.stddev_samp("val").alias("s"),
        )
        .collect()
    }


def _approx_eq(a, b, tol=1e-9):
    if a is None or b is None:
        return a is None and b is None
    return abs(a - b) <= tol * max(1.0, abs(a), abs(b))


def test_rollup_moments_equal_recompute_under_moves_and_deletes(
    spark, tmp_path
):
    """Moments are exactly self-maintainable: after updates that move
    values AND timestamps, plus deletes, the maintained avg/var/std
    equals a from-scratch AVG/VAR_SAMP/STDDEV_SAMP over the final state
    — with the default on_retraction='error' (no guard ever fires)."""
    events = [
        (1, "a", "u", 1.0, BASE + 10),
        (2, "b", "u", 2.0, BASE + 20),
        (3, "c", "u", 30.0, BASE + 30),
        (4, "d", "u", 4.0, BASE + HOUR + 40),
        # batch 1: a's VALUE moves (retraction at the old value), c
        # moves to another DAY (cross-bucket retraction)
        (11, "a", "u", 7.5, BASE + 10),
        (12, "c", "u", 30.0, BASE + DAY + 50),
        # batch 2: b deleted, d same-value churn (net-zero retraction)
        (21, "b", "d", None, None),
        (22, "d", "u", 4.0, BASE + HOUR + 40),
    ]
    table = LakeTable(str(tmp_path / "t"), key_cols=["k"], n_buckets=4,
                      merge_strategy="broadcast", changelog=True,
                      discovery=False)
    roll = _roll_mom(tmp_path, "roll")  # default on_retraction='error'
    rep = Replayer(table=table, chain=Chain([]), epoch="e",
                   maintain=roll.specs)
    rep.replay(_env(spark, events), batch_width=10, start_pos=0, max_pos=30)
    for gran in ("1 hour", "1 day"):
        got = _mom_state(spark, roll, gran)
        want = _mom_recompute(spark, table, gran)
        assert set(got) == set(want) and len(got) > 0, gran
        for b in got:
            gn, ga, gv, gs = got[b]
            wn, wa, wv, ws = want[b]
            assert gn == wn, (gran, b)
            assert _approx_eq(ga, wa), (gran, b, ga, wa)
            assert _approx_eq(gv, wv), (gran, b, gv, wv)
            assert _approx_eq(gs, ws), (gran, b, gs, ws)


def test_rollup_moments_additive_upward(spark, tmp_path):
    """Raw power sums are additive: summing hour buckets' m0/m1/m2
    within each day reproduces the day rollup's moments exactly."""
    events = [
        (i + 1, f"k{i}", "u", float((i * 7) % 13), BASE + (i % 30) * HOUR)
        for i in range(60)
    ]
    table = LakeTable(str(tmp_path / "t"), key_cols=["k"], n_buckets=4,
                      merge_strategy="broadcast", changelog=True,
                      discovery=False)
    roll = _roll_mom(tmp_path, "roll")
    rep = Replayer(table=table, chain=Chain([]), epoch="e",
                   maintain=roll.specs)
    rep.replay(_env(spark, events), batch_width=100, start_pos=0,
               max_pos=100)
    hour = roll.read_sketches(spark, "1 hour")
    folded = {
        r[0]: (r[1], r[2], r[3])
        for r in hour.groupBy(time_bucket("bucket_ms", "1 day"))
        .agg(F.sum("m0_val").alias("m0"), F.sum("m1_val").alias("m1"),
             F.sum("m2_val").alias("m2"))
        .collect()
    }
    day = {
        r["bucket_ms"]: (r["m0_val"], r["m1_val"], r["m2_val"])
        for r in roll.read_sketches(spark, "1 day").collect()
    }
    assert folded == day and len(day) > 0


def test_rollup_moments_null_semantics(spark, tmp_path):
    """NULL values move no moment: a bucket whose members are all NULL
    reads avg/var/std = NULL with m0 = 0 (but n_rows counts the rows);
    a single non-null member has a defined avg but NULL var/std."""
    events = [
        (1, "a", "u", None, BASE + 10),
        (2, "b", "u", None, BASE + 20),
        (3, "c", "u", 5.0, BASE + HOUR + 30),
    ]
    table = LakeTable(str(tmp_path / "t"), key_cols=["k"], n_buckets=4,
                      merge_strategy="broadcast", changelog=True,
                      discovery=False)
    roll = _roll_mom(tmp_path, "roll")
    rep = Replayer(table=table, chain=Chain([]), epoch="e",
                   maintain=roll.specs)
    rep.replay(_env(spark, events), batch_width=10, start_pos=0, max_pos=10)
    got = _mom_state(spark, roll, "1 hour")
    assert got[BASE] == (2, None, None, None)
    n, a, v, s = got[BASE + HOUR]
    assert (n, a) == (1, 5.0) and v is None and s is None
    raw = {
        r["bucket_ms"]: r["m0_val"]
        for r in roll.read_sketches(spark, "1 hour").collect()
    }
    assert raw == {BASE: 0, BASE + HOUR: 1}


def test_rollup_moments_exactly_once(spark, tmp_path):
    events = [
        (1, "a", "u", 2.0, BASE + 10),
        (2, "b", "u", 4.0, BASE + 20),
    ]
    table = LakeTable(str(tmp_path / "t"), key_cols=["k"], n_buckets=4,
                      merge_strategy="broadcast", changelog=True,
                      discovery=False)
    roll = _roll_mom(tmp_path, "roll")
    rep = Replayer(table=table, chain=Chain([]), epoch="e",
                   maintain=roll.specs)
    rep.replay(_env(spark, events), batch_width=10, start_pos=0, max_pos=10)
    before = _mom_state(spark, roll, "1 hour")
    rep.replay(_env(spark, events), batch_width=10, start_pos=0, max_pos=10)
    assert _mom_state(spark, roll, "1 hour") == before
    assert before[BASE][1:] == (3.0, 2.0, 2.0 ** 0.5)


# ---------------------------------------------------- exact heavy hitters

_CAT_T = T.StructType([
    T.StructField("cat", T.StringType()),
    T.StructField("ts_ms", T.LongType()),
])
_CENV_T = T.StructType([
    T.StructField("topic", T.StringType(), False),
    T.StructField("partition", T.IntegerType(), False),
    T.StructField("key", T.StructType([T.StructField("k", T.StringType())])),
    T.StructField("value", T.StructType([
        T.StructField("op", T.StringType()),
        T.StructField("lsn", T.LongType()),
        T.StructField("ts_ms", T.LongType()),
        T.StructField("before", _CAT_T),
        T.StructField("after", _CAT_T),
    ])),
    T.StructField("timestamp", T.LongType()),
    T.StructField("headers", T.MapType(T.StringType(), T.StringType())),
])


def _cenv(spark, events):
    rows = []
    for lsn, k, op, cat, ts in events:
        after = None if op == "d" else (cat, ts)
        rows.append(("t", 0, (k,), (op, lsn, ts or 0, None, after), lsn, None))
    return spark.createDataFrame(rows, _CENV_T)


@pytest.fixture()
def freq_replayed(spark, tmp_path):
    """Keys flip categories, move buckets and die: every transition the
    signed occurrence counts must absorb."""
    events = [
        # batch 0: x/x/y in hour 0, y in hour 1
        (1, "a", "u", "x", BASE + 10),
        (2, "b", "u", "x", BASE + 20),
        (3, "c", "u", "y", BASE + 30),
        (4, "d", "u", "y", BASE + HOUR + 5),
        # batch 1: a flips x->y (count must MOVE between values),
        # d moves hour 1 -> hour 0 keeping y
        (11, "a", "u", "y", BASE + 10),
        (12, "d", "u", "y", BASE + 40),
        # batch 2: b deleted (x count drops to zero in hour 0)
        (21, "b", "d", None, None),
    ]
    table = LakeTable(str(tmp_path / "t"), key_cols=["k"], n_buckets=4,
                      merge_strategy="broadcast", changelog=True,
                      discovery=False)
    roll = TimeRollup(
        root=str(tmp_path / "roll"), time_col="ts_ms",
        granularities=["1 hour", "1 day"], freq_cols=["cat"],
    )
    rep = Replayer(table=table, chain=Chain([]), epoch="e",
                   maintain=roll.specs)
    rep.replay(_cenv(spark, events), batch_width=10, start_pos=0, max_pos=30)
    return table, roll


def test_topk_values_equals_recompute(spark, freq_replayed):
    table, roll = freq_replayed
    for gran in ("1 hour", "1 day"):
        got = {
            (r["bucket_ms"], r["cat"]): (r["n_occ"], r["rank"])
            for r in roll.topk_values(spark, gran, "cat", k=10).collect()
        }
        # recompute: counts per (bucket, cat) over the FINAL table,
        # same (count desc, value asc) ranking
        rows = (
            table.read(spark)
            .groupBy(time_bucket("ts_ms", gran).alias("b"), "cat")
            .agg(F.count("*").alias("n"))
            .collect()
        )
        want = {}
        per_bucket: dict = {}
        for r in rows:
            per_bucket.setdefault(r["b"], []).append((r["cat"], r["n"]))
        for b, items in per_bucket.items():
            items.sort(key=lambda t: (-t[1], t[0]))
            for i, (cat, n) in enumerate(items):
                want[(b, cat)] = (n, i + 1)
        assert got == want and got, gran
    # final state: hour 0 has y x3 (a flipped, d moved in), x is GONE
    h0 = {
        r["cat"]: r["n_occ"]
        for r in roll.topk_values(spark, "1 hour", "cat", k=5)
        .filter(F.col("bucket_ms") == BASE).collect()
    }
    assert h0 == {"y": 3}


def test_topk_k_cut_and_additivity(spark, freq_replayed):
    table, roll = freq_replayed
    top1 = roll.topk_values(spark, "1 hour", "cat", k=1)
    assert top1.groupBy("bucket_ms").count().filter("count > 1").count() == 0
    # day counts are the sum of that day's hour counts (additivity)
    hour = roll._freq_tables[(HOUR, "cat")].read(spark)
    day_from_hours = {
        (r["b"], r["cat"]): r["n"]
        for r in hour.groupBy(
            (F.col("bucket_ms") - F.pmod(F.col("bucket_ms"), F.lit(DAY)))
            .alias("b"), "cat",
        ).agg(F.sum("n_occ").alias("n")).filter("n > 0").collect()
    }
    day = {
        (r["bucket_ms"], r["cat"]): r["n_occ"]
        for r in roll._freq_tables[(DAY, "cat")].read(spark)
        .filter("n_occ > 0").collect()
    }
    assert day == day_from_hours


def test_read_unaffected_by_freq_specs(spark, freq_replayed):
    # freq specs interleave into .specs; table()/read() must still
    # resolve the MAIN rollup table for every granularity (a zip over
    # (granularities, specs) misaligned once freq_cols existed)
    table, roll = freq_replayed
    for gran in ("1 hour", "1 day"):
        got = {r["bucket_ms"]: r["n_rows"]
               for r in roll.read(spark, gran).collect()}
        want = {
            r["b"]: r["n"]
            for r in table.read(spark)
            .groupBy(time_bucket("ts_ms", gran).alias("b"))
            .agg(F.count("*").alias("n")).collect()
        }
        assert got == want and got, gran


def test_freq_cols_validation(spark, tmp_path):
    with pytest.raises(ValueError, match="group col"):
        TimeRollup(root=str(tmp_path / "r"), time_col="ts_ms",
                   granularities=["1 hour"], group_cols=["cat"],
                   freq_cols=["cat"])
    roll = TimeRollup(root=str(tmp_path / "r2"), time_col="ts_ms",
                      granularities=["1 hour"], freq_cols=["cat"])
    with pytest.raises(KeyError, match="freq_cols"):
        roll.topk_values(spark, "1 hour", "other", k=3)


def test_recompute_collect_cap_falls_back_to_join(spark, tmp_path):
    """Adversarial mass retraction: every group's minimum moves in one
    batch, so the violated-group set exceeds ``max_recompute_collect``.
    The rebuild must switch to the join-based plan — no driver collect
    beyond the cap — and stay exact."""
    from transforms_for_apache_kafka_connect_spark.streaming.incremental import (
        batch_changes,
        incremental_agg_update,
    )
    from pyspark.sql import DataFrame as _DF

    base = LakeTable(str(tmp_path / "b"), key_cols=["k"], n_buckets=4,
                     changelog=True, discovery=False,
                     merge_strategy="broadcast")
    agg = LakeTable(str(tmp_path / "a"), key_cols=["g"], n_buckets=2,
                    discovery=False, merge_strategy="broadcast")
    n_groups, cap = 20, 3

    def _upd(rows):
        return spark.createDataFrame(
            rows, "k long, g string, v double, _lsn long"
        ).withColumn("__is_delete", F.lit(False))

    def _fold(batch_id):
        chg = batch_changes(base, spark, epoch="e", batch_id=batch_id)
        incremental_agg_update(
            agg, chg, group_cols=["g"], minmax_cols=["v"],
            on_retraction="recompute", base_table=base,
            max_recompute_collect=cap, epoch="e", batch_id=batch_id,
        )

    base.merge(_upd(
        [(2 * g, f"g{g}", 1.0, 1) for g in range(n_groups)]
        + [(2 * g + 1, f"g{g}", 5.0, 1) for g in range(n_groups)]
    ), epoch="e", batch_id=0)
    _fold(0)

    # every group's min row moves UP -> all n_groups violate at once
    collected_sizes = []
    orig_collect = _DF.collect

    def spy(self):
        out = orig_collect(self)
        collected_sizes.append(len(out))
        return out

    _DF.collect = spy
    try:
        base.merge(
            _upd([(2 * g, f"g{g}", 3.0, 2) for g in range(n_groups)]),
            epoch="e", batch_id=1,
        )
        _fold(1)
    finally:
        _DF.collect = orig_collect
    # the bounded probe returned cap+1 rows and nothing larger was
    # ever collected for the violated set (merge internals collect
    # bucket ids etc., all <= n_buckets here)
    assert max(collected_sizes, default=0) <= cap + 1
    exact = {
        (r["g"]): (r["mn"], r["mx"])
        for r in base.read(spark).groupBy("g")
        .agg(F.min("v").alias("mn"), F.max("v").alias("mx")).collect()
    }
    got = {
        r["g"]: (r["min_v"], r["max_v"])
        for r in agg.read(spark).select("g", "min_v", "max_v").collect()
    }
    assert got == exact
    assert exact[f"g0"] == (3.0, 5.0)
