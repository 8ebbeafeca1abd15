"""Physical topic routing: SMT chain rewrites `topic`, route_write
lands each record under its topic directory (reference entry point B —
IntegrationTest.java:174-183 asserts per-topic delivery)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from transforms_for_apache_kafka_connect_spark import Chain, envelope
from transforms_for_apache_kafka_connect_spark.streaming import route_write


def test_route_write_fans_out_by_topic(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, ["click", "view", "purchase"][i % 3], float(i)) for i in range(99)],
        "event_id long, event_type string, amount double",
    )
    env = envelope(df, key_cols=["event_id"], value_cols=["event_type", "amount"])
    chain = Chain([
        {"type": "extract_topic", "field.name": "event_type"},
        {"type": "regex_router", "regex": "purchase", "replacement": "orders"},
    ])
    routed = chain.run(env)
    root = str(tmp_path / "topics")
    topics = route_write(routed, root)
    assert topics == ["click", "orders", "view"]
    for t, n in [("click", 33), ("orders", 33), ("view", 33)]:
        part = os.path.join(root, f"topic={t}")
        assert os.path.isdir(part)
        got = spark.read.parquet(part)
        assert got.count() == n
        # flattened value fields present per-topic
        assert {"event_type", "amount", "timestamp"} <= set(got.columns)
    # append mode: a second batch lands in the same directories
    route_write(routed, root)
    assert spark.read.parquet(os.path.join(root, "topic=click")).count() == 66


def test_route_write_value_field_colliding_with_envelope(spark, tmp_path):
    # a value struct field named topic/timestamp/key must not produce a
    # duplicate column after flattening — it gets a value_ prefix
    df = spark.createDataFrame(
        [(1, "t_a", "inner_topic", 7), (2, "t_b", "inner2", 8)],
        "id long, route string, topic string, timestamp long",
    )
    env = envelope(df, key_cols=["id"], value_cols=["route", "topic", "timestamp"])
    routed = Chain([{"type": "extract_topic", "field.name": "route"}]).run(env)
    root = str(tmp_path / "topics")
    topics = route_write(routed, root)
    assert topics == ["t_a", "t_b"]
    got = spark.read.parquet(os.path.join(root, "topic=t_a"))
    assert {"value_topic", "value_timestamp", "route", "timestamp", "key"} <= set(
        got.columns
    )
    assert got.first()["value_topic"] == "inner_topic"


def test_route_write_empty_batch_returns_no_topics(spark, tmp_path):
    df = spark.createDataFrame([], "id long, route string")
    env = envelope(df, key_cols=["id"], value_cols=["route"])
    routed = Chain([{"type": "extract_topic", "field.name": "route"}]).run(env)
    assert route_write(routed, str(tmp_path / "topics")) == []


def _cdc_env(spark, rows):
    """Envelope rows with a non-canonical value field ``tenant`` that
    an SMT can route on."""
    return spark.createDataFrame(
        rows,
        "topic string, partition int, key struct<repo:string,path:string>, "
        "value struct<op:string,lsn:bigint,ts_ms:bigint,"
        "after:struct<content:string>,tenant:string>, "
        "timestamp long, headers map<string,string>",
    )


def _tenant_rows():
    return [
        # acme: p0 created then updated; p1 created then deleted
        ("src", 0, ("r0", "p0"), ("c", 1, 1, ("a-old",), "acme"), 1, None),
        ("src", 0, ("r0", "p0"), ("u", 5, 5, ("a-new",), "acme"), 5, None),
        ("src", 0, ("r0", "p1"), ("c", 2, 2, ("a-gone",), "acme"), 2, None),
        ("src", 0, ("r0", "p1"), ("d", 6, 6, None, "acme"), 6, None),
        # globex: one live key — same (repo, path) as acme's deleted one,
        # proving keys are scoped per topic
        ("src", 0, ("r0", "p1"), ("c", 3, 3, ("g-live",), "globex"), 3, None),
    ]


def test_topic_table_router_per_topic_tables(spark, tmp_path):
    from transforms_for_apache_kafka_connect_spark.streaming import (
        TopicTableRouter,
    )

    router = TopicTableRouter(
        root=str(tmp_path / "tables"),
        chain=Chain([{"type": "extract_topic", "field.name": "tenant"}]),
        epoch="e1",
        table_opts={"n_buckets": 4},
        replayer_opts={"unique_lsn": True},
    )
    r = router.apply_batch(_cdc_env(spark, _tenant_rows()), 0)
    assert sorted(r["topics"]) == ["acme", "globex"]
    acme = {
        (row["path"], row["content"])
        for row in router.table_for("acme").read(spark).collect()
    }
    assert acme == {("p0", "a-new")}  # LWW applied, delete applied
    globex = router.table_for("globex").read(spark).collect()
    assert [(g["path"], g["content"]) for g in globex] == [("p1", "g-live")]
    # exactly-once: replaying the batch skips every topic's commit
    r2 = router.apply_batch(_cdc_env(spark, _tenant_rows()), 0)
    assert all(v.get("skipped") for v in r2["topics"].values())


def test_topic_table_router_partial_crash_replay(spark, tmp_path):
    """Crash between topic commits: the committed table skips on
    replay, the other commits — per-destination exactly-once."""
    from transforms_for_apache_kafka_connect_spark.streaming import (
        Replayer,
        TopicTableRouter,
    )

    router = TopicTableRouter(
        root=str(tmp_path / "tables"),
        chain=Chain([{"type": "extract_topic", "field.name": "tenant"}]),
        epoch="e1",
        table_opts={"n_buckets": 4},
    )
    # simulate 'acme already committed before the crash'
    pre = Replayer(table=router.table_for("acme"), chain=Chain([]), epoch="e1")
    routed = Chain(
        [{"type": "extract_topic", "field.name": "tenant"}]
    ).run(_cdc_env(spark, _tenant_rows()))
    pre.apply_batch(routed.filter(F.col("topic") == "acme"), 0)
    v_acme = router.table_for("acme").manifest()["version"]

    r = router.apply_batch(_cdc_env(spark, _tenant_rows()), 0)
    assert r["topics"]["acme"].get("skipped") is True
    assert r["topics"]["globex"]["skipped"] is False
    assert router.table_for("acme").manifest()["version"] == v_acme
    assert router.table_for("globex").read(spark).count() == 1


def test_topic_table_router_encodes_topic_dirs(spark, tmp_path):
    import os as _os

    from transforms_for_apache_kafka_connect_spark.streaming import (
        TopicTableRouter,
    )

    rows = [
        ("src", 0, ("r0", "p0"), ("c", 1, 1, ("x",), "a/b c"), 1, None),
        ("src", 0, ("r0", "p1"), ("c", 2, 2, ("y",), "a.b-c"), 2, None),
    ]
    router = TopicTableRouter(
        root=str(tmp_path / "tables"),
        chain=Chain([{"type": "extract_topic", "field.name": "tenant"}]),
        table_opts={"n_buckets": 2},
    )
    r = router.apply_batch(_cdc_env(spark, rows), 0)
    assert sorted(r["topics"]) == ["a.b-c", "a/b c"]
    assert _os.path.isdir(str(tmp_path / "tables" / "a%2Fb%20c"))
    assert router.table_for("a/b c").read(spark).count() == 1


def test_topic_table_router_streaming(spark, tmp_path):
    """File-source stream -> per-topic tables via foreachBatch;
    checkpoint restart is a no-op (per-destination exactly-once)."""
    from transforms_for_apache_kafka_connect_spark.streaming import (
        TopicTableRouter,
    )

    rows = _tenant_rows()
    src = str(tmp_path / "incoming")
    env = _cdc_env(spark, rows)
    env.filter(F.col("timestamp") <= 3).write.parquet(src + "/f1.parquet")
    env.filter(F.col("timestamp") > 3).write.parquet(src + "/f2.parquet")

    router = TopicTableRouter(
        root=str(tmp_path / "tables"),
        chain=Chain([{"type": "extract_topic", "field.name": "tenant"}]),
        epoch="s1",
        table_opts={"n_buckets": 2},
    )
    stream_df = spark.readStream.schema(env.schema).parquet(src + "/*")
    q = router.stream(stream_df, str(tmp_path / "ckpt"), available_now=True)
    q.awaitTermination(120)

    acme = {
        (r["path"], r["content"])
        for r in router.table_for("acme").read(spark).collect()
    }
    assert acme == {("p0", "a-new")}
    assert router.table_for("globex").read(spark).count() == 1

    v = {
        t: router.table_for(t).manifest()["version"]
        for t in ("acme", "globex")
    }
    q2 = router.stream(
        spark.readStream.schema(env.schema).parquet(src + "/*"),
        str(tmp_path / "ckpt"),
        available_now=True,
    )
    q2.awaitTermination(120)
    for t in ("acme", "globex"):
        assert router.table_for(t).manifest()["version"] == v[t]


def test_topic_dir_traversal_and_empty():
    import pytest as _pytest

    from transforms_for_apache_kafka_connect_spark.streaming.router import (
        _topic_dir,
    )

    assert _topic_dir("..") == "%2E%2E"
    assert _topic_dir(".") == "%2E"
    assert _topic_dir("a.b") == "a.b"  # interior dots stay readable
    with _pytest.raises(ValueError, match="empty topic"):
        _topic_dir("")


def test_topic_router_null_topic_fails_batch(spark, tmp_path):
    import pytest as _pytest

    from transforms_for_apache_kafka_connect_spark.errors import DataException
    from transforms_for_apache_kafka_connect_spark.streaming import (
        TopicTableRouter,
    )

    rows = [
        ("src", 0, ("r0", "p0"), ("c", 1, 1, ("x",), "t-a"), 1, None),
        (None, 0, ("r1", "p0"), ("c", 2, 2, ("y",), "t-b"), 2, None),
    ]
    router = TopicTableRouter(
        root=str(tmp_path / "tables"), table_opts={"n_buckets": 2},
    )
    with _pytest.raises(DataException, match="NULL topic"):
        router.apply_batch(_cdc_env(spark, rows), 0)


def test_topic_router_poison_topic_does_not_starve_siblings(spark, tmp_path):
    """A failing topic (per-record error, fail mode) must not block
    later topics: every topic is attempted, the committed ones skip on
    replay, and one exception summarizes the failures."""
    import pytest as _pytest

    from transforms_for_apache_kafka_connect_spark.errors import DataException
    from transforms_for_apache_kafka_connect_spark.streaming import (
        TopicTableRouter,
    )

    rows = [
        # 'aaa' has a tombstone RECORD (value NULL) that fail-mode
        # TombstoneHandler turns into a per-record error
        ("aaa", 0, ("r0", "p0"), None, 1, None),
        ("aaa", 0, ("r0", "p1"), ("c", 2, 2, ("x",), None), 2, None),
        ("zzz", 0, ("r1", "p0"), ("c", 3, 3, ("y",), None), 3, None),
    ]
    router = TopicTableRouter(
        root=str(tmp_path / "tables"),
        chain=Chain([{"type": "tombstone_handler", "behavior": "fail"}]),
        table_opts={"n_buckets": 2},
    )
    with _pytest.raises(DataException, match="1 topic.s. failed .aaa."):
        router.apply_batch(_cdc_env(spark, rows), 0)
    # the alphabetically-later clean topic committed anyway
    assert router.table_for("zzz").read(spark).count() == 1
    # replay: zzz skips via its ledger, aaa fails again
    with _pytest.raises(DataException, match="aaa"):
        router.apply_batch(_cdc_env(spark, rows), 0)
    assert router.table_for("zzz").manifest()["version"] == 1


def test_topic_router_per_topic_dlq(spark, tmp_path):
    """DLQ mode quarantines each topic under its own subdirectory —
    one topic's overwrite-idempotent batch dir cannot clobber
    another's."""
    import os as _os

    from transforms_for_apache_kafka_connect_spark.streaming import (
        TopicTableRouter,
    )

    rows = [
        ("aaa", 0, ("r0", "p0"), None, 1, None),  # errored (tombstone)
        ("aaa", 0, ("r0", "p1"), ("c", 2, 2, ("x",), None), 2, None),
        ("zzz", 0, ("r1", "p0"), None, 3, None),  # errored (tombstone)
        ("zzz", 0, ("r1", "p1"), ("c", 4, 4, ("y",), None), 4, None),
    ]
    dlq = str(tmp_path / "dlq")
    router = TopicTableRouter(
        root=str(tmp_path / "tables"),
        chain=Chain([{"type": "tombstone_handler", "behavior": "fail"}]),
        table_opts={"n_buckets": 2},
        replayer_opts={"error_mode": "dlq", "dlq_dir": dlq},
    )
    r = router.apply_batch(_cdc_env(spark, rows), 0)
    assert sorted(r["topics"]) == ["aaa", "zzz"]
    for t in ("aaa", "zzz"):
        assert router.table_for(t).read(spark).count() == 1
        tdir = _os.path.join(dlq, t)
        assert _os.path.isdir(tdir), tdir
        quarantined = spark.read.parquet(tdir)
        assert quarantined.count() == 1
