"""CLI entrypoint test: `python -m transforms_for_apache_kafka_connect_spark`
(the spark-submit surface, north_rule) replays a stream end-to-end in a
fresh process and leaves a table this session can read."""

from __future__ import annotations

import json
import os

import pytest
import subprocess
import sys

from pyspark.sql import functions as F

from transforms_for_apache_kafka_connect_spark.sources import (
    change_stream,
    repositories_snapshot,
)
from transforms_for_apache_kafka_connect_spark.streaming import LakeTable

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_cli_batch_replay(spark, tmp_path):
    n = 2_000
    events = change_stream(spark, n, n_repos=20, paths_per_repo=5)
    events.write.mode("overwrite").parquet(str(tmp_path / "events"))
    chain_spec = [
        {"type": "tombstone_handler", "behavior": "drop_silent"},
        {"type": "filter_by_field_value", "field.name": "op",
         "field.value": "r", "field.value.matches": False},
    ]
    (tmp_path / "chain.json").write_text(json.dumps(chain_spec))

    env = dict(os.environ, PYTHONPATH=REPO)
    out = subprocess.run(
        [
            sys.executable, "-m", "transforms_for_apache_kafka_connect_spark",
            "--events", str(tmp_path / "events"),
            "--table", str(tmp_path / "table"),
            "--chain", str(tmp_path / "chain.json"),
            "--batches", "2",
            "--buckets", "4",
            "--master", "local[4]",
            "--merge-strategy", "broadcast",
            "--no-discovery",
        ],
        env=env, capture_output=True, text=True, timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    summary = json.loads(out.stdout.strip().splitlines()[-1])
    assert summary["applied"] == 2 and summary["skipped"] == 0

    table = LakeTable(str(tmp_path / "table"), n_buckets=4)
    final = table.read(spark)
    oracle = repositories_snapshot(
        spark, events.filter(F.col("value").isNull() | (F.col("value.op") != "r"))
    )
    assert final.count() == oracle.count()

    # second CLI run over the same table: ledger skips every batch
    out2 = subprocess.run(
        [
            sys.executable, "-m", "transforms_for_apache_kafka_connect_spark",
            "--events", str(tmp_path / "events"),
            "--table", str(tmp_path / "table"),
            "--chain", str(tmp_path / "chain.json"),
            "--batches", "2", "--buckets", "4", "--master", "local[4]",
            "--merge-strategy", "broadcast", "--no-discovery",
        ],
        env=env, capture_output=True, text=True, timeout=300,
    )
    assert out2.returncode == 0, out2.stderr[-2000:]
    summary2 = json.loads(out2.stdout.strip().splitlines()[-1])
    assert summary2["applied"] == 0 and summary2["skipped"] == 2


def test_cli_empty_events_and_bad_slice_col(spark, tmp_path):
    # an empty events dir or a non-numeric slice column must exit with
    # a clear message, not an opaque TypeError on max()+1
    events = change_stream(spark, 100, n_repos=5, paths_per_repo=2)
    empty = events.filter("timestamp < 0")
    empty.write.mode("overwrite").parquet(str(tmp_path / "empty_events"))
    events.write.mode("overwrite").parquet(str(tmp_path / "events"))

    env = dict(os.environ, PYTHONPATH=REPO)
    base = [
        sys.executable, "-m", "transforms_for_apache_kafka_connect_spark",
        "--table", str(tmp_path / "table"),
        "--batches", "2", "--buckets", "4", "--master", "local[2]",
    ]
    out = subprocess.run(
        base + ["--events", str(tmp_path / "empty_events")],
        env=env, capture_output=True, text=True, timeout=300,
    )
    assert out.returncode == 2
    assert "no events" in out.stderr

    out2 = subprocess.run(
        base + ["--events", str(tmp_path / "events"), "--slice-col", "topic"],
        env=env, capture_output=True, text=True, timeout=300,
    )
    assert out2.returncode == 2
    assert "numeric" in out2.stderr

    out3 = subprocess.run(
        base + ["--events", str(tmp_path / "events"), "--slice-col", "nope"],
        env=env, capture_output=True, text=True, timeout=300,
    )
    assert out3.returncode == 2
    assert "not found" in out3.stderr


def test_cli_maintenance_ops(spark, tmp_path):
    # in-process main(): compact / vacuum / rescale over a real table
    from transforms_for_apache_kafka_connect_spark.cli import main

    events = change_stream(spark, 1_000, n_repos=10, paths_per_repo=4)
    events.write.mode("overwrite").parquet(str(tmp_path / "events"))
    root = str(tmp_path / "table")
    base = ["--table", root, "--buckets", "4", "--batches", "2"]
    assert main(base + ["--events", str(tmp_path / "events")]) == 0

    table = LakeTable(root, n_buckets=4)
    before = table.read(spark).orderBy("repo", "path").collect()
    assert main(base + ["--maintenance", "compact", "--compact-all-buckets"]) == 0
    assert main(base + ["--maintenance", "vacuum"]) == 0
    assert main(base + ["--maintenance", "rescale"]) == 2  # missing target
    assert main(base + ["--maintenance", "rescale", "--rescale-buckets", "8"]) == 0
    t2 = LakeTable(root, n_buckets=4)
    assert t2.n_buckets == 8
    assert t2.read(spark).orderBy("repo", "path").collect() == before
    # no --events and no --maintenance -> clear error
    assert main(base) == 2


def test_cli_lookup_and_publish(spark, tmp_path, capsys):
    import json as _json

    from transforms_for_apache_kafka_connect_spark.cli import main

    events = change_stream(spark, 1_000, n_repos=10, paths_per_repo=4)
    events.write.mode("overwrite").parquet(str(tmp_path / "events"))
    root = str(tmp_path / "table")
    base = ["--table", root, "--buckets", "4", "--batches", "2"]
    assert main(base + ["--events", str(tmp_path / "events")]) == 0
    capsys.readouterr()

    table = LakeTable(root, n_buckets=4)
    any_row = table.read(spark).select("repo", "path").first()
    key = _json.dumps({"repo": any_row["repo"], "path": any_row["path"]})
    assert main(base + ["--maintenance", "lookup", "--key", key]) == 0
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert len(out["rows"]) == 1
    assert out["rows"][0]["repo"] == any_row["repo"]

    assert main(base + ["--maintenance", "lookup"]) == 2  # missing --key
    assert main(base + ["--maintenance", "publish"]) == 2  # missing token
    # user errors exit 2 with a message, never a traceback
    assert main(base + ["--maintenance", "lookup", "--key", "{bad"]) == 2
    assert main(base + ["--maintenance", "lookup", "--key", "[1,2]"]) == 2
    assert main(base + ["--maintenance", "lookup",
                        "--key", '{"repo": "r1"}']) == 2
    assert main(base + ["--maintenance", "publish",
                        "--staged-token", "staged-bogus"]) == 2


def test_cli_streaming_backfill(spark, tmp_path):
    n = 1_000
    events = change_stream(spark, n, n_repos=10, paths_per_repo=4)
    events.write.mode("overwrite").parquet(str(tmp_path / "events"))

    env = dict(os.environ, PYTHONPATH=REPO)
    out = subprocess.run(
        [
            sys.executable, "-m", "transforms_for_apache_kafka_connect_spark",
            "--events", str(tmp_path / "events"),
            "--table", str(tmp_path / "table"),
            "--streaming",
            "--checkpoint", str(tmp_path / "ckpt"),
            "--buckets", "4",
            "--master", "local[4]",
        ],
        env=env, capture_output=True, text=True, timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert json.loads(out.stdout.strip().splitlines()[-1])["mode"] == "streaming"
    table = LakeTable(str(tmp_path / "table"), n_buckets=4)
    oracle = repositories_snapshot(spark, events)
    assert table.read(spark).count() == oracle.count()


def test_cli_streaming_raw_avro(spark, tmp_path):
    # --raw-avro with an .avsc schema file: the Confluent-framed Avro
    # tail through the CLI's streaming backfill
    import json as _json

    from transforms_for_apache_kafka_connect_spark.sources import (
        envelope_to_avro,
        spark_to_avro_schema,
    )

    n = 800
    events = change_stream(spark, n, n_repos=10, paths_per_repo=4)
    v_schema = spark_to_avro_schema(events.schema["value"].dataType, "v")
    k_schema = spark_to_avro_schema(events.schema["key"].dataType, "k")
    envelope_to_avro(
        events, value_schema=v_schema, key_schema=k_schema,
        confluent_framing=True, use_jvm=False,
    ).write.mode("overwrite").parquet(str(tmp_path / "raw"))
    (tmp_path / "v.avsc").write_text(_json.dumps(v_schema))
    (tmp_path / "k.avsc").write_text(_json.dumps(k_schema))

    env = dict(os.environ, PYTHONPATH=REPO)
    out = subprocess.run(
        [
            sys.executable, "-m", "transforms_for_apache_kafka_connect_spark",
            "--events", str(tmp_path / "raw"),
            "--table", str(tmp_path / "table"),
            "--streaming",
            "--checkpoint", str(tmp_path / "ckpt"),
            "--raw-avro", "--confluent-framing",
            "--key-schema", str(tmp_path / "k.avsc"),
            "--value-schema", str(tmp_path / "v.avsc"),
            "--buckets", "4",
            "--master", "local[4]",
        ],
        env=env, capture_output=True, text=True, timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    table = LakeTable(str(tmp_path / "table"), n_buckets=4)
    oracle = repositories_snapshot(spark, events)
    assert table.read(spark).count() == oracle.count()


def test_cli_properties_evolving_avro_stream(spark, tmp_path):
    """Regression (review finding): the CLI must forward the properties
    file's writer.schemas.file map to engine.stream — without it, old
    writer-schema payloads fail decode (or byte-misparse)."""
    import json as _json

    from transforms_for_apache_kafka_connect_spark.sources import encode_record

    K = {"type": "record", "name": "k",
         "fields": [{"name": "repo", "type": "string"},
                    {"name": "path", "type": "string"}]}
    AFTER_V1 = {"type": "record", "name": "a",
                "fields": [{"name": "content", "type": ["null", "string"]}]}
    V1 = {"type": "record", "name": "v",
          "fields": [{"name": "op", "type": "string"},
                     {"name": "lsn", "type": "long"},
                     {"name": "ts_ms", "type": ["null", "long"]},
                     {"name": "after", "type": ["null", AFTER_V1]}]}
    AFTER_V2 = {"type": "record", "name": "a",
                "fields": [{"name": "content", "type": ["null", "string"]},
                           {"name": "lang", "type": ["null", "string"]}]}
    V2 = {"type": "record", "name": "v",
          "fields": [{"name": "op", "type": "string"},
                     {"name": "lsn", "type": "long"},
                     {"name": "ts_ms", "type": ["null", "long"]},
                     {"name": "after", "type": ["null", AFTER_V2]}]}

    def framed(sid, schema, rec):
        return b"\x00" + sid.to_bytes(4, "big") + encode_record(schema, rec)

    rows = [
        (framed(1, K, {"repo": "r0", "path": f"p{i}"}),
         framed(1, V1, {"op": "c", "lsn": i, "ts_ms": i,
                        "after": {"content": f"old_{i}"}}))
        for i in range(10)
    ] + [
        (framed(2, K, {"repo": "r0", "path": "p0"}),
         framed(2, V2, {"op": "u", "lsn": 100, "ts_ms": 100,
                        "after": {"content": "new_0", "lang": "py"}}))
    ]
    spark.createDataFrame(rows, "key binary, value binary").write.parquet(
        str(tmp_path / "raw")
    )
    (tmp_path / "v.avsc").write_text(_json.dumps(V2))
    (tmp_path / "k.avsc").write_text(_json.dumps(K))
    (tmp_path / "writers.json").write_text(_json.dumps({"1": V1, "2": V2}))
    props = tmp_path / "connector.properties"
    props.write_text(
        "transforms=drop\n"
        "transforms.drop.type="
        "io.aiven.kafka.connect.transforms.TombstoneHandler\n"
        "transforms.drop.behavior=drop_silent\n"
        "key.converter=io.confluent.connect.avro.AvroConverter\n"
        f"key.converter.schema.file={tmp_path / 'k.avsc'}\n"
        "value.converter=io.confluent.connect.avro.AvroConverter\n"
        f"value.converter.schema.file={tmp_path / 'v.avsc'}\n"
        f"value.converter.writer.schemas.file={tmp_path / 'writers.json'}\n"
    )
    env = dict(os.environ, PYTHONPATH=REPO)
    out = subprocess.run(
        [
            sys.executable, "-m", "transforms_for_apache_kafka_connect_spark",
            "--events", str(tmp_path / "raw"),
            "--table", str(tmp_path / "table"),
            "--streaming",
            "--checkpoint", str(tmp_path / "ckpt"),
            "--chain", str(props),
            "--buckets", "4",
            "--master", "local[4]",
        ],
        env=env, capture_output=True, text=True, timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    table = LakeTable(str(tmp_path / "table"), n_buckets=4)
    final = {(r["repo"], r["path"]): r for r in table.read(spark).collect()}
    assert len(final) == 10
    assert final[("r0", "p0")]["content"] == "new_0"
    assert final[("r0", "p0")]["lang"] == "py"
    assert final[("r0", "p1")]["lang"] is None


def test_cli_blooms_and_sorted_compact(spark, tmp_path, capsys):
    from transforms_for_apache_kafka_connect_spark.cli import main

    events = change_stream(spark, 1_000, n_repos=10, paths_per_repo=4)
    events.write.mode("overwrite").parquet(str(tmp_path / "events"))
    root = str(tmp_path / "table")
    base = ["--table", root, "--buckets", "4", "--batches", "2",
            "--collect-blooms"]
    assert main(base + ["--events", str(tmp_path / "events")]) == 0
    table = LakeTable(root, n_buckets=4)
    m = table.manifest()
    files = [f for fs in m["buckets"].values() for f in fs]
    assert set(m["file_blooms"]) == set(files)
    assert main(base + ["--maintenance", "compact",
                        "--compact-all-buckets", "--compact-no-sort"]) == 0
    capsys.readouterr()

    # z-order layout over two payload columns; contents must survive
    before = sorted(
        (r["repo"], r["path"], r["_lsn"])
        for r in table.read(spark).collect()
    )
    assert main(base + ["--maintenance", "compact", "--compact-all-buckets",
                        "--compact-layout", "zorder",
                        "--compact-sort-cols", "_lsn,repo"]) == 0
    after = sorted(
        (r["repo"], r["path"], r["_lsn"])
        for r in LakeTable(root, n_buckets=4).read(spark).collect()
    )
    assert after == before
    capsys.readouterr()


def test_cli_routed_mode(spark, tmp_path, capsys):
    import json as _json

    from transforms_for_apache_kafka_connect_spark.cli import main
    from transforms_for_apache_kafka_connect_spark.streaming import (
        TopicTableRouter,
    )

    rows = [
        ("src", 0, ("r0", "p0"), ("c", 1, 1, ("x",), "t-a"), 1, None),
        ("src", 0, ("r0", "p0"), ("u", 2, 2, ("y",), "t-a"), 2, None),
        ("src", 0, ("r1", "p0"), ("c", 3, 3, ("z",), "t-b"), 3, None),
    ]
    env = spark.createDataFrame(
        rows,
        "topic string, partition int, key struct<repo:string,path:string>, "
        "value struct<op:string,lsn:bigint,ts_ms:bigint,"
        "after:struct<content:string>,tenant:string>, "
        "timestamp long, headers map<string,string>",
    )
    env.write.parquet(str(tmp_path / "events"))
    chain_spec = [{"type": "extract_topic", "field.name": "tenant"}]
    (tmp_path / "chain.json").write_text(_json.dumps(chain_spec))

    root = str(tmp_path / "tables")
    assert main([
        "--table", root, "--events", str(tmp_path / "events"),
        "--chain", str(tmp_path / "chain.json"),
        "--buckets", "2", "--batches", "1", "--routed",
    ]) == 0
    summary = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["routed"] is True and summary["topics"] == ["t-a", "t-b"]

    router = TopicTableRouter(root=root, table_opts={"n_buckets": 2})
    a = router.table_for("t-a").read(spark).collect()
    assert [(r["path"], r["content"]) for r in a] == [("p0", "y")]
    assert router.table_for("t-b").read(spark).count() == 1

    # maintenance ops need one concrete table: --routed is an error
    assert main(["--table", root, "--routed",
                 "--maintenance", "compact"]) == 2


def test_cli_properties_chain(spark, tmp_path):
    """--chain accepts a Kafka Connect .properties file — a reference
    user's connector config runs unmodified."""
    n = 1_000
    events = change_stream(spark, n, n_repos=10, paths_per_repo=5)
    events.write.mode("overwrite").parquet(str(tmp_path / "events"))
    (tmp_path / "connector.properties").write_text(
        "transforms=dropTombstones,noReads\n"
        "transforms.dropTombstones.type="
        "io.aiven.kafka.connect.transforms.TombstoneHandler\n"
        "transforms.dropTombstones.behavior=drop_silent\n"
        "transforms.noReads.type="
        "io.aiven.kafka.connect.transforms.FilterByFieldValue$Value\n"
        "transforms.noReads.field.name=op\n"
        "transforms.noReads.field.value=r\n"
        "transforms.noReads.field.value.matches=false\n"
    )
    env = dict(os.environ, PYTHONPATH=REPO)
    out = subprocess.run(
        [
            sys.executable, "-m", "transforms_for_apache_kafka_connect_spark",
            "--events", str(tmp_path / "events"),
            "--table", str(tmp_path / "table"),
            "--chain", str(tmp_path / "connector.properties"),
            "--batches", "1",
            "--buckets", "4",
            "--master", "local[4]",
            "--merge-strategy", "broadcast",
            "--no-discovery",
        ],
        env=env, capture_output=True, text=True, timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    table = LakeTable(str(tmp_path / "table"), n_buckets=4)
    oracle = repositories_snapshot(
        spark, events.filter(F.col("value").isNull() | (F.col("value.op") != "r"))
    )
    assert table.read(spark).count() == oracle.count()


def test_cli_maintenance_stats(spark, tmp_path, capsys):
    import json as _json

    from transforms_for_apache_kafka_connect_spark.cli import main

    events = change_stream(spark, 1_000, n_repos=10, paths_per_repo=4)
    events.write.mode("overwrite").parquet(str(tmp_path / "events"))
    root = str(tmp_path / "table")
    base = ["--table", root, "--buckets", "4", "--batches", "2"]
    assert main(base + ["--events", str(tmp_path / "events")]) == 0
    capsys.readouterr()

    assert main(base + ["--maintenance", "stats"]) == 0
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["op"] == "stats"
    assert out["n_buckets"] == 4
    assert out["total_files"] > 0 and out["total_bytes"] > 0
    assert out["committed_batches"] == 2


def test_cli_bootstrap_then_replay(spark, tmp_path, capsys):
    import json as _json

    from transforms_for_apache_kafka_connect_spark.cli import main
    from transforms_for_apache_kafka_connect_spark.sources.changestream import (
        repositories_snapshot,
    )
    from transforms_for_apache_kafka_connect_spark.streaming.sink import (
        LakeTable,
    )

    n, cut, base = 1_000, 500, 1_600_000_000_000
    events = change_stream(spark, n, n_repos=10, paths_per_repo=4)
    events.write.mode("overwrite").parquet(str(tmp_path / "events"))
    snap = repositories_snapshot(
        spark, events.filter(F.col("value.lsn") < cut)
    )
    snap.write.mode("overwrite").parquet(str(tmp_path / "snap"))

    root = str(tmp_path / "table")
    # bootstrap-only invocation (no --events)
    assert main(["--table", root, "--buckets", "4",
                 "--bootstrap", str(tmp_path / "snap"),
                 "--snapshot-lsn", str(cut - 1)]) == 0
    out = capsys.readouterr().out.strip().splitlines()
    boot = _json.loads(out[-1])
    assert boot["mode"] == "bootstrap" and not boot.get("skipped")

    # handoff: replay the WHOLE stream; the fence drops pre-cut events
    assert main(["--table", root, "--buckets", "4", "--batches", "2",
                 "--events", str(tmp_path / "events")]) == 0
    capsys.readouterr()

    table = LakeTable(root, n_buckets=4)
    assert table.extra() == {"snapshot_lsn": cut - 1}
    got = {
        (r["repo"], r["path"]): r["content"]
        for r in table.read(spark).collect()
    }
    want = {
        (r["repo"], r["path"]): r["content"]
        for r in repositories_snapshot(spark, events).collect()
    }
    assert got == want


def test_cli_bootstrap_requires_snapshot_lsn(tmp_path, capsys):
    from transforms_for_apache_kafka_connect_spark.cli import main

    assert main(["--table", str(tmp_path / "t"),
                 "--bootstrap", str(tmp_path / "snap")]) == 2
    assert "--snapshot-lsn" in capsys.readouterr().err


def test_cli_lookup_many_keys(spark, tmp_path, capsys):
    import json as _json

    from transforms_for_apache_kafka_connect_spark.cli import main

    events = change_stream(spark, 600, n_repos=6, paths_per_repo=3)
    events.write.mode("overwrite").parquet(str(tmp_path / "events"))
    root = str(tmp_path / "table")
    assert main(["--table", root, "--buckets", "4", "--batches", "1",
                 "--events", str(tmp_path / "events")]) == 0
    capsys.readouterr()

    keys = _json.dumps([
        {"repo": "repo-0", "path": "src/f0.py"},
        {"repo": "repo-1", "path": "src/f1.py"},
        {"repo": "repo-none", "path": "nope"},
    ])
    assert main(["--table", root, "--buckets", "4",
                 "--maintenance", "lookup", "--keys", keys]) == 0
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["op"] == "lookup"
    found = {(r["repo"], r["path"]) for r in out["rows"]}
    assert ("repo-none", "nope") not in found

    # malformed --keys -> exit 2
    assert main(["--table", root, "--buckets", "4",
                 "--maintenance", "lookup", "--keys", '{"not": "a list"}'
                 ]) == 2


def test_cli_patch_semantics(spark, tmp_path):
    """--merge-semantics patch: sparse updates from the CLI land with
    per-column overlay semantics; incompatible flags exit 2."""
    from transforms_for_apache_kafka_connect_spark.cli import main

    rows = [
        # (lsn, k, op, x, y) — sparse: None = not provided
        (1, "a", "u", 1.0, "one"),
        (2, "a", "u", 2.0, None),     # y must survive
        (3, "b", "u", 3.0, "bee"),
        (4, "b", "d", None, None),
        (5, "b", "u", 5.0, None),     # reborn: y stays NULL
    ]
    env = spark.createDataFrame(
        [("t", 0, (k,),
          (op, lsn, 0, None, None if op == "d" else (x, y)), lsn, None)
         for lsn, k, op, x, y in rows],
        "topic string, partition int, key struct<k:string>, "
        "value struct<op:string, lsn:long, ts_ms:long, "
        "before:struct<x:double,y:string>, after:struct<x:double,y:string>>, "
        "timestamp long, headers map<string,string>",
    )
    env.write.mode("overwrite").parquet(str(tmp_path / "events"))
    base = [
        "--events", str(tmp_path / "events"),
        "--table", str(tmp_path / "table"),
        "--key-cols", "k", "--buckets", "4",
        "--batches", "2", "--merge-semantics", "patch",
        "--merge-strategy", "broadcast", "--no-discovery",
        "--master", "local[2]",
    ]
    assert main(base + ["--routed"]) == 2
    assert main(base) == 0
    got = {
        r["k"]: (r["x"], r["y"], r["_lsn"])
        for r in LakeTable(
            str(tmp_path / "table"), key_cols=["k"], discovery=False
        ).read(spark).collect()
    }
    assert got == {"a": (2.0, "one", 2), "b": (5.0, None, 5)}
    # replay: every batch skips through the ledger
    assert main(base) == 0
    got2 = {
        r["k"]: (r["x"], r["y"], r["_lsn"])
        for r in LakeTable(
            str(tmp_path / "table"), key_cols=["k"], discovery=False
        ).read(spark).collect()
    }
    assert got2 == got


def test_cli_checksum_and_diff(spark, tmp_path, capsys):
    import json as _json

    from transforms_for_apache_kafka_connect_spark.cli import main

    events = change_stream(spark, 1_000, n_repos=10, paths_per_repo=4)
    events.write.mode("overwrite").parquet(str(tmp_path / "events"))
    root_a, root_b = str(tmp_path / "a"), str(tmp_path / "b")
    for root in (root_a, root_b):
        assert main(["--table", root, "--buckets", "4", "--batches", "2",
                     "--events", str(tmp_path / "events")]) == 0
    capsys.readouterr()

    def last_json():
        return _json.loads(capsys.readouterr().out.strip().splitlines()[-1])

    # same replay -> same fingerprint; a tampered state -> different
    sums = []
    for root in (root_a, root_b):
        assert main(["--table", root, "--buckets", "4",
                     "--maintenance", "checksum"]) == 0
        sums.append(last_json())
    assert sums[0]["table_sha256"] == sums[1]["table_sha256"]
    assert sums[0]["n_rows"] > 0

    # diff against the twin lake root: match
    assert main(["--table", root_a, "--buckets", "4",
                 "--maintenance", "diff", "--expected", root_b]) == 0
    assert last_json()["match"] is True

    # diff against a tampered parquet snapshot: the dropped key surfaces
    cur = LakeTable(root_a, n_buckets=4).read(spark)
    victim = cur.orderBy("repo", "path").first()
    cur.filter(
        ~((cur.repo == victim["repo"]) & (cur.path == victim["path"]))
    ).write.parquet(str(tmp_path / "exp"))
    assert main(["--table", root_a, "--buckets", "4",
                 "--maintenance", "diff",
                 "--expected", str(tmp_path / "exp")]) == 0
    out = last_json()
    assert out["match"] is False
    assert [(r["side"], r["repo"], r["path"]) for r in out["rows"]] == [
        ("table", victim["repo"], victim["path"])
    ]

    # repair: apply the diff, then the states are provably equal
    assert main(["--table", root_a, "--buckets", "4",
                 "--maintenance", "repair",
                 "--expected", str(tmp_path / "exp")]) == 0
    out = last_json()
    assert out["repaired"] == 0 and out["deleted"] == 1
    assert main(["--table", root_a, "--buckets", "4",
                 "--maintenance", "diff",
                 "--expected", str(tmp_path / "exp")]) == 0
    assert last_json()["match"] is True

    # user errors exit 2, never a traceback
    assert main(["--table", root_a, "--buckets", "4",
                 "--maintenance", "diff"]) == 2
    assert main(["--table", root_a, "--buckets", "4",
                 "--maintenance", "repair"]) == 2
    assert main(["--table", root_a, "--buckets", "4",
                 "--maintenance", "diff", "--expected", root_b,
                 "--diff-cols", "content"]) == 2


def test_cli_track_gaps(spark, tmp_path, capsys):
    import json as _json

    from transforms_for_apache_kafka_connect_spark.cli import main
    from transforms_for_apache_kafka_connect_spark.errors import DataException

    # change_stream LSNs are dense event ids, so punching a hole in the
    # slice makes --track-gaps dense fire
    events = change_stream(spark, 500, n_repos=10, paths_per_repo=4)
    events.filter("timestamp % 97 != 50").write.mode("overwrite").parquet(
        str(tmp_path / "holey")
    )
    events.write.mode("overwrite").parquet(str(tmp_path / "full"))
    root = str(tmp_path / "table")
    base = ["--table", root, "--buckets", "4", "--batches", "2"]

    # policy error: the batch with the hole aborts (reference
    # DataException model — the task fails, the batch stays replayable)
    with pytest.raises(DataException, match="sequence continuity"):
        main(base + ["--events", str(tmp_path / "holey"),
                     "--track-gaps", "dense", "--gaps-by", "topic"])

    # policy warn: proceeds, reports the anomaly count in the output
    assert main(base + ["--events", str(tmp_path / "holey"),
                        "--track-gaps", "dense", "--gaps-by", "topic",
                        "--gaps-policy", "warn",
                        "--gaps-report-dir", str(tmp_path / "rep")]) == 0
    lines = [
        _json.loads(ln)
        for ln in capsys.readouterr().out.strip().splitlines()
        if ln.startswith("{")
    ]
    assert sum(b.get("gap_anomalies", 0) for b in lines) > 0

    # clean stream on a fresh table: no anomalies, exit 0
    root2 = str(tmp_path / "table2")
    assert main(["--table", root2, "--buckets", "4", "--batches", "2",
                 "--events", str(tmp_path / "full"),
                 "--track-gaps", "dense", "--gaps-by", "topic"]) == 0

    # routed mode: ONE tracker over the raw source batch (warn run
    # proceeds and reports; state lives beside the router root)
    root3 = str(tmp_path / "routed")
    assert main(["--table", root3, "--buckets", "4", "--batches", "2",
                 "--events", str(tmp_path / "holey"), "--routed",
                 "--track-gaps", "dense", "--gaps-by", "topic",
                 "--gaps-policy", "warn"]) == 0
    lines = [
        _json.loads(ln)
        for ln in capsys.readouterr().out.strip().splitlines()
        if ln.startswith("{")
    ]
    assert sum(b.get("gap_anomalies", 0) for b in lines) > 0
    assert LakeTable(
        os.path.join(root3, "_seq_state"), discovery=False
    ).read(spark).count() == 1


def test_cli_sql_query(spark, tmp_path, capsys):
    """--maintenance query: ad-hoc SQL over a lake table (and a routed
    root) from the shell, rows as JSON lines."""
    import json as _json

    from transforms_for_apache_kafka_connect_spark.cli import main

    events = change_stream(spark, 1_000, n_repos=10, paths_per_repo=4)
    events.write.mode("overwrite").parquet(str(tmp_path / "events"))
    root = str(tmp_path / "table")
    base = ["--table", root, "--buckets", "4", "--batches", "2"]
    assert main(base + ["--events", str(tmp_path / "events")]) == 0
    capsys.readouterr()

    assert main(base + [
        "--maintenance", "query",
        "--sql", "SELECT lang, count(*) AS n FROM t GROUP BY lang ORDER BY lang",
    ]) == 0
    out = capsys.readouterr().out.strip().splitlines()
    rows = [_json.loads(line) for line in out[:-1]]
    summary = _json.loads(out[-1])
    assert summary["op"] == "query" and summary["views"] == ["t"]
    want = {
        r["lang"]: r["n"]
        for r in LakeTable(root, n_buckets=4).read(spark)
        .groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    assert {r["lang"]: r["n"] for r in rows} == want
    # missing --sql is a usage error
    assert main(base + ["--maintenance", "query"]) == 2
    # --sql-limit caps printed rows
    capsys.readouterr()
    assert main(base + [
        "--maintenance", "query", "--sql", "SELECT * FROM t", "--sql-limit", "3",
    ]) == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert _json.loads(out[-1])["rows_printed"] == 3
