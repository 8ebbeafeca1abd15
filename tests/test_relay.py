"""CDC relay (streaming/relay.py): a changelog=True table re-emitted
as a canonical change-stream envelope, consumed downstream through the
stock boundaries — the engine as a CDC source."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from transforms_for_apache_kafka_connect_spark import Chain
from transforms_for_apache_kafka_connect_spark.record import enforce
from transforms_for_apache_kafka_connect_spark.sources import (
    change_stream,
    envelope_from_avro,
    envelope_from_json,
    repositories_snapshot,
    spark_to_avro_schema,
)
from transforms_for_apache_kafka_connect_spark.streaming import (
    LakeTable,
    Replayer,
    changelog_envelope,
    publish_changelog,
)


def _build_source(spark, tmp_path, n=3_000):
    base = 1_600_000_000_000
    events = change_stream(spark, n, n_repos=15, paths_per_repo=5)
    src = LakeTable(str(tmp_path / "src"), n_buckets=4, changelog=True)
    rep = Replayer(table=src, chain=Chain([]), epoch="e1", unique_lsn=True)
    # 3 batches so the changelog spans several (epoch, batch_id) dirs
    rep.replay(events, batch_width=-(-n // 3), max_pos=base + n,
               start_pos=base)
    return events, src


def test_changelog_envelope_shape_and_ops(spark, tmp_path):
    events, src = _build_source(spark, tmp_path)
    env = changelog_envelope(src, spark)
    assert [f.name for f in env.schema.fields] == [
        "topic", "partition", "key", "value", "timestamp", "headers",
    ]
    ops = {r[0] for r in env.select("value.op").distinct().collect()}
    assert ops <= {"c", "u", "d"} and "c" in ops
    # update events fold pre+post into ONE event carrying both images
    ups = env.filter(F.col("value.op") == "u")
    if ups.count():
        assert ups.filter(
            F.col("value.before").isNull() | F.col("value.after").isNull()
        ).count() == 0
    # deletes carry only the before image
    dels = env.filter(F.col("value.op") == "d")
    if dels.count():
        assert dels.filter(F.col("value.after").isNotNull()).count() == 0
    # one event per (key, change lsn)
    assert env.groupBy("key", "value.lsn").count().filter("count > 1").count() == 0


def test_relay_hop_reproduces_source_state(spark, tmp_path):
    """src table --changelog_envelope--> Replayer(dst): dst must equal
    src without ever reading src's data files (the relay analog of
    cdc_second_hop, via the PUBLIC envelope instead of internals)."""
    events, src = _build_source(spark, tmp_path)
    env = changelog_envelope(src, spark)
    dst = LakeTable(str(tmp_path / "dst"), n_buckets=4)
    Replayer(table=dst, chain=Chain([]), epoch="relay",
             unique_lsn=True).apply_batch(env, 0)
    a = src.read(spark).select("repo", "path", "content")
    b = dst.read(spark).select("repo", "path", "content")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    # idempotent re-relay: applying the same changelog again (new batch
    # id, same LSNs) converges to the same state
    Replayer(table=dst, chain=Chain([]), epoch="relay",
             unique_lsn=True).apply_batch(env, 1)
    b2 = dst.read(spark).select("repo", "path", "content")
    assert a.exceptAll(b2).count() == 0 and b2.exceptAll(a).count() == 0


@pytest.mark.parametrize("fmt", ["json", "avro", "maxwell", "canal", "dms"])
def test_publish_roundtrip_and_consume(spark, tmp_path, fmt):
    """publish_changelog bytes -> stock boundary -> Replayer: a
    downstream engine instance consumes the published stream with zero
    custom code and reproduces the source state."""
    events, src = _build_source(spark, tmp_path, n=2_000)
    env = changelog_envelope(src, spark)
    raw = publish_changelog(
        src, spark, format=fmt,
        confluent_framing=(fmt == "avro"), use_jvm=False,
    )
    assert dict(raw.dtypes)["value"] == "binary"
    if fmt == "json":
        back = envelope_from_json(
            raw,
            key_schema=env.schema["key"].dataType,
            value_schema=env.schema["value"].dataType,
        )
    elif fmt in ("maxwell", "canal", "dms"):
        from transforms_for_apache_kafka_connect_spark.sources import (
            cdc_envelopes as ce,
        )

        decode = {"maxwell": ce.envelope_from_maxwell,
                  "canal": ce.envelope_from_canal,
                  "dms": ce.envelope_from_dms}[fmt]
        back = decode(
            raw,
            data_schema=env.schema["value"].dataType["after"].dataType,
            key_fields=["repo", "path"],
            lsn=F.col("offset"),
        )
    else:
        from transforms_for_apache_kafka_connect_spark.streaming import (
            relay_schemas,
        )

        back = envelope_from_avro(
            raw, **relay_schemas(src, spark),
            confluent_framing=True,
            use_jvm=False,
        )
    back = enforce(back)
    dst = LakeTable(str(tmp_path / f"dst_{fmt}"), n_buckets=4)
    Replayer(table=dst, chain=Chain([]), epoch="consume",
             unique_lsn=True).apply_batch(back, 0)
    a = src.read(spark).select("repo", "path", "content")
    b = dst.read(spark).select("repo", "path", "content")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_publish_json_rejects_framing_args(spark, tmp_path):
    # refusing beats silently publishing unframed bytes a framed
    # consumer would corrupt
    _, src = _build_source(spark, tmp_path, n=500)
    with pytest.raises(ValueError, match="format='avro'"):
        publish_changelog(src, spark, format="json", confluent_framing=True)
    with pytest.raises(ValueError, match="format='avro'"):
        publish_changelog(src, spark, format="json", schema_id=9)


def test_relay_requires_changelog(spark, tmp_path):
    plain = LakeTable(str(tmp_path / "plain"), n_buckets=4)
    Replayer(table=plain, chain=Chain([]), epoch="e1").apply_batch(
        change_stream(spark, 200, n_repos=5, paths_per_repo=3), 0
    )
    with pytest.raises(ValueError, match="changelog"):
        changelog_envelope(plain, spark)


def test_relay_plan_has_no_join(spark, tmp_path):
    # scale shape: one scan + one aggregate — no joins, no window sorts
    _, src = _build_source(spark, tmp_path, n=1_000)
    env = changelog_envelope(src, spark)
    plan = env._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "simple"
        )
    )
    assert "Join" not in plan or "left_semi" in plan.lower()
    assert "Window" not in plan


def test_cli_relay_maintenance(spark, tmp_path):
    import json as _json
    import os as _os
    import subprocess
    import sys as _sys

    _, src = _build_source(spark, tmp_path, n=1_000)
    out_dir = str(tmp_path / "relayed")
    repo = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
    out = subprocess.run(
        [
            _sys.executable, "-m", "transforms_for_apache_kafka_connect_spark",
            "--table", str(tmp_path / "src"),
            "--maintenance", "relay",
            "--relay-out", out_dir,
            "--relay-format", "avro",
            # no --epoch: relay defaults to ALL committed epochs
            "--buckets", "4",
            "--master", "local[4]",
        ],
        env=dict(_os.environ, PYTHONPATH=repo),
        capture_output=True, text=True, timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    summary = _json.loads(out.stdout.strip().splitlines()[-1])
    assert summary["op"] == "relay" and summary["n_events"] > 0
    raw = spark.read.parquet(out_dir)
    assert dict(raw.dtypes)["value"] == "binary"
    # payloads are Confluent-framed
    first = raw.select("value").first()[0]
    assert first[:1] == b"\x00"


def test_relay_observe_counters(spark, tmp_path):
    """CollectMetrics counters ride the envelope plan: per-op counts
    match the emitted rows, at zero extra passes (one action computes
    both), via the standard pyspark Observation handle."""
    from pyspark.sql import Observation

    _, src = _build_source(spark, tmp_path)
    obs = Observation()
    env = changelog_envelope(src, spark, observe=obs)
    by_op = {
        r["op"]: r["n"]
        for r in env.groupBy(F.col("value.op").alias("op"))
        .agg(F.count(F.lit(1)).alias("n")).collect()
    }
    m = obs.get
    assert m["n_events"] == sum(by_op.values())
    assert m["n_creates"] == by_op.get("c", 0)
    assert m["n_updates"] == by_op.get("u", 0)
    assert m["n_deletes"] == by_op.get("d", 0)
