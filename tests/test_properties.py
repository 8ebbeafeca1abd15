"""Connector-properties compatibility loader tests: the reference's
own declaration surface (README.md:33-37, IntegrationTest.java:222-229)
parsed into a compiled Chain — a reference user's properties file runs
unmodified."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from transforms_for_apache_kafka_connect_spark import chain_from_properties
from transforms_for_apache_kafka_connect_spark.errors import ConfigException
from transforms_for_apache_kafka_connect_spark.plans.properties import (
    chain_specs_from_properties,
    parse_properties,
)


def test_parse_properties_java_subset():
    text = "\n".join(
        [
            "# comment",
            "! also a comment",
            "",
            "a=1",
            "b: two",
            "c three",
            "d.with.dots=x=y",  # only the FIRST separator splits
            "e=multi\\",
            "   line",  # continuation: leading whitespace stripped
            "f=tab\\tsep",
            "g=uni\\u0041",
            "h=trailing\\\\",  # escaped backslash is NOT a continuation
            "keyonly",
        ]
    )
    props = parse_properties(text)
    assert props == {
        "a": "1",
        "b": "two",
        "c": "three",
        "d.with.dots": "x=y",
        "e": "multiline",
        "f": "tab\tsep",
        "g": "uniA",
        "h": "trailing\\",
        "keyonly": "",
    }


REFERENCE_PROPS = """
# the reference README's chain shape, verbatim class names
transforms=routeByType,hashEmail,dropTombstones
transforms.routeByType.type=io.aiven.kafka.connect.transforms.ExtractTopic$Value
transforms.routeByType.field.name=type
transforms.routeByType.skip.missing.or.null=true
transforms.hashEmail.type=io.aiven.kafka.connect.transforms.Hash$Value
transforms.hashEmail.field.name=email
transforms.hashEmail.function=sha256
transforms.dropTombstones.type=io.aiven.kafka.connect.transforms.TombstoneHandler
transforms.dropTombstones.behavior=drop_silent
"""


def test_specs_from_reference_properties():
    specs = chain_specs_from_properties(parse_properties(REFERENCE_PROPS))
    assert specs == [
        {
            "type": "extract_topic",
            "place": "value",
            "field.name": "type",
            "skip.missing.or.null": True,
        },
        {
            "type": "hash",
            "place": "value",
            "field.name": "email",
            "function": "sha256",
        },
        {"type": "tombstone_handler", "behavior": "drop_silent"},
    ]


def test_chain_from_properties_end_to_end(spark):
    rows = [
        ("t", 0, None, ("a", "jerry@big-corp.com"), 1, None),
        ("t", 0, None, ("b", None), 2, None),
        ("t", 0, None, None, 3, None),  # tombstone -> dropped
    ]
    df = spark.createDataFrame(
        rows,
        "topic string, partition int, key string, "
        "value struct<type:string,email:string>, "
        "timestamp long, headers map<string,string>",
    )
    chain = chain_from_properties(
        REFERENCE_PROPS.replace("function=sha256", "function=sha256")
        + "transforms.hashEmail.skip.missing.or.null=true\n"
    )
    out = chain.run(df).orderBy("timestamp").collect()
    assert len(out) == 2
    # golden digest from the reference's HashTest.java fixture value
    assert out[0]["value"]["email"] == (
        "20e85b05e7349963fc64746fbc7f3f4fdf31507921360847ebef333b229cf2d6"
    )
    assert out[0]["topic"] == "a" and out[1]["topic"] == "b"


def test_chain_from_properties_with_predicate(spark):
    props = """
transforms=maskOnTopic
transforms.maskOnTopic.type=org.apache.kafka.connect.transforms.MaskField$Value
transforms.maskOnTopic.fields=secret
transforms.maskOnTopic.predicate=isSensitive
transforms.maskOnTopic.negate=false
predicates=isSensitive
predicates.isSensitive.type=org.apache.kafka.connect.transforms.predicates.TopicNameMatches
predicates.isSensitive.pattern=sensitive-.*
"""
    rows = [
        ("sensitive-a", 0, None, ("hush",), 1, None),
        ("public-b", 0, None, ("loud",), 2, None),
    ]
    df = spark.createDataFrame(
        rows,
        "topic string, partition int, key string, "
        "value struct<secret:string>, timestamp long, "
        "headers map<string,string>",
    )
    out = chain_from_properties(props).run(df).orderBy("timestamp").collect()
    assert out[0]["value"]["secret"] == ""  # masked (string null-value)
    assert out[1]["value"]["secret"] == "loud"  # predicate false -> untouched


def test_chain_from_properties_file_path(spark, tmp_path):
    p = tmp_path / "connector.properties"
    p.write_text(REFERENCE_PROPS)
    chain = chain_from_properties(str(p))
    assert len(chain.stages) == 3


def test_properties_errors():
    with pytest.raises(ConfigException, match="no transforms"):
        chain_from_properties("other=1\n")
    with pytest.raises(ConfigException, match="Unknown transformation class"):
        chain_from_properties(
            "transforms=x\ntransforms.x.type=com.example.Nope\n"
        )
    with pytest.raises(ConfigException, match="no 'transforms.x.type'"):
        chain_from_properties("transforms=x\ntransforms.x.field.name=a\n")
    with pytest.raises(ConfigException, match="Unknown class suffix"):
        chain_from_properties(
            "transforms=x\n"
            "transforms.x.type=io.aiven.kafka.connect.transforms.Hash$Both\n"
        )
    with pytest.raises(ConfigException, match="undeclared predicate"):
        chain_from_properties(
            "transforms=x\n"
            "transforms.x.type=io.aiven.kafka.connect.transforms.MakeTombstone\n"
            "transforms.x.predicate=nope\n"
        )
    with pytest.raises(ConfigException, match="no .Key/.Value variants"):
        chain_from_properties(
            "transforms=x\n"
            "transforms.x.type="
            "io.aiven.kafka.connect.transforms.TombstoneHandler$Value\n"
        )
    # config errors inside a stage surface at build time (configure())
    with pytest.raises(ConfigException):
        chain_from_properties(
            "transforms=x\n"
            "transforms.x.type=io.aiven.kafka.connect.transforms.Hash$Value\n"
            "transforms.x.function=sha999\n"
        )


def test_converters_from_properties():
    from transforms_for_apache_kafka_connect_spark.plans.properties import (
        converters_from_properties,
    )

    # no converter declared -> empty (caller keeps explicit kwargs)
    assert converters_from_properties("transforms=\n") == {}
    # JsonConverter with pinned DDL schema
    conv = converters_from_properties(
        "value.converter=org.apache.kafka.connect.json.JsonConverter\n"
        "value.converter.schema=user_id bigint, event_type string\n"
    )
    assert conv["raw_format"] == "json"
    assert conv["confluent_framing"] is False
    # AvroConverter implies the Confluent wire frame
    conv = converters_from_properties(
        "value.converter=io.confluent.connect.avro.AvroConverter\n"
        'value.converter.schema={"type":"record","name":"v","fields":[]}\n'
    )
    assert conv["raw_format"] == "avro" and conv["confluent_framing"] is True
    # StringConverter -> passthrough, no schema needed
    assert converters_from_properties(
        "value.converter=org.apache.kafka.connect.storage.StringConverter\n"
    ) == {"raw_format": None}


def test_converters_from_properties_errors():
    from transforms_for_apache_kafka_connect_spark.plans.properties import (
        converters_from_properties,
    )

    with pytest.raises(ConfigException, match="Unknown converter class"):
        converters_from_properties("value.converter=com.example.Bogus\n")
    with pytest.raises(ConfigException, match="must be pinned"):
        converters_from_properties(
            "value.converter=io.confluent.connect.avro.AvroConverter\n"
        )
    with pytest.raises(ConfigException, match="differs from the value"):
        converters_from_properties(
            "key.converter=org.apache.kafka.connect.json.JsonConverter\n"
            "key.converter.schema=id bigint\n"
            "value.converter=io.confluent.connect.avro.AvroConverter\n"
            'value.converter.schema={"type":"record","name":"v","fields":[]}\n'
        )
    # a typed KEY converter cannot hijack an untyped/absent VALUE
    # converter (review finding: StringConverter values + Avro keys
    # must refuse, not decode strings as framed Avro)
    with pytest.raises(ConfigException, match="differs from the value"):
        converters_from_properties(
            "key.converter=io.confluent.connect.avro.AvroConverter\n"
            'key.converter.schema={"type":"record","name":"k","fields":[]}\n'
            "value.converter=org.apache.kafka.connect.storage.StringConverter\n"
        )
    with pytest.raises(ConfigException, match="differs from the value"):
        converters_from_properties(
            "key.converter=org.apache.kafka.connect.json.JsonConverter\n"
            "key.converter.schema=id bigint\n"
        )


def test_converters_schema_file(tmp_path):
    from transforms_for_apache_kafka_connect_spark.plans.properties import (
        converters_from_properties,
    )

    f = tmp_path / "v.avsc"
    f.write_text('{"type":"record","name":"v","fields":[]}')
    conv = converters_from_properties(
        "value.converter=io.confluent.connect.avro.AvroConverter\n"
        f"value.converter.schema.file={f}\n"
    )
    assert conv["value_schema"].startswith('{"type":"record"')


def test_properties_driven_avro_stream(spark, tmp_path):
    """One .properties file declares the chain AND the Avro converter
    (pinned schemas) — the whole Connect deployment surface drives the
    streaming entry via prepare_stream_events kwargs."""
    import json as _json

    from transforms_for_apache_kafka_connect_spark.plans.properties import (
        converters_from_properties,
    )
    from transforms_for_apache_kafka_connect_spark.sources import (
        change_stream,
        envelope_to_avro,
        repositories_snapshot,
        spark_to_avro_schema,
    )
    from transforms_for_apache_kafka_connect_spark.streaming import (
        LakeTable,
        Replayer,
    )

    events = change_stream(spark, 1_000, n_repos=10, paths_per_repo=4)
    v_schema = spark_to_avro_schema(events.schema["value"].dataType, "v")
    k_schema = spark_to_avro_schema(events.schema["key"].dataType, "k")
    src = str(tmp_path / "raw")
    envelope_to_avro(
        events, value_schema=v_schema, key_schema=k_schema,
        confluent_framing=True, use_jvm=False,
    ).write.parquet(src)
    (tmp_path / "v.avsc").write_text(_json.dumps(v_schema))
    (tmp_path / "k.avsc").write_text(_json.dumps(k_schema))
    props_file = tmp_path / "connector.properties"
    props_file.write_text(
        "transforms=drop\n"
        "transforms.drop.type="
        "io.aiven.kafka.connect.transforms.TombstoneHandler\n"
        "transforms.drop.behavior=drop_silent\n"
        "key.converter=io.confluent.connect.avro.AvroConverter\n"
        f"key.converter.schema.file={tmp_path / 'k.avsc'}\n"
        "value.converter=io.confluent.connect.avro.AvroConverter\n"
        f"value.converter.schema.file={tmp_path / 'v.avsc'}\n"
    )

    conv = converters_from_properties(str(props_file))
    table = LakeTable(str(tmp_path / "t"), n_buckets=4)
    rep = Replayer(
        table=table, chain=chain_from_properties(str(props_file)), epoch="e1"
    )
    stream = spark.readStream.schema(
        spark.read.parquet(src).schema
    ).parquet(src)
    q = rep.stream(
        stream, str(tmp_path / "ckpt"), available_now=True, **conv
    )
    q.awaitTermination(300)
    q.stop()
    assert table.read(spark).count() == repositories_snapshot(
        spark, events
    ).count()


def test_converters_writer_schemas_file(tmp_path):
    import json as _json

    from transforms_for_apache_kafka_connect_spark.plans.properties import (
        converters_from_properties,
    )

    v1 = {"type": "record", "name": "v",
          "fields": [{"name": "a", "type": "int"}]}
    v2 = {"type": "record", "name": "v",
          "fields": [{"name": "a", "type": "long"},
                     {"name": "b", "type": ["null", "string"]}]}
    (tmp_path / "v.avsc").write_text(_json.dumps(v2))
    (tmp_path / "writers.json").write_text(_json.dumps({"1": v1, "2": v2}))
    conv = converters_from_properties(
        "value.converter=io.confluent.connect.avro.AvroConverter\n"
        f"value.converter.schema.file={tmp_path / 'v.avsc'}\n"
        f"value.converter.writer.schemas.file={tmp_path / 'writers.json'}\n"
    )
    assert set(conv["writer_schemas"]) == {1, 2}
    assert conv["writer_schemas"][1]["fields"][0]["type"] == "int"
    # writer schemas on a JSON converter make no sense
    with pytest.raises(ConfigException, match="only applies to"):
        converters_from_properties(
            "value.converter=org.apache.kafka.connect.json.JsonConverter\n"
            "value.converter.schema=a bigint\n"
            f"value.converter.writer.schemas.file={tmp_path / 'writers.json'}\n"
        )


def test_error_policy_from_properties(tmp_path):
    from transforms_for_apache_kafka_connect_spark.plans.properties import (
        error_policy_from_properties,
    )

    # undeclared -> caller keeps defaults
    assert error_policy_from_properties("transforms=\n") == {}
    assert error_policy_from_properties("errors.tolerance=none\n") == {
        "error_mode": "fail"
    }
    assert error_policy_from_properties(
        "errors.tolerance=all\n"
        "errors.deadletterqueue.dir=/data/dlq\n"
    ) == {"error_mode": "dlq", "dlq_dir": "/data/dlq"}
    # the stock Connect key works as the dir name too
    assert error_policy_from_properties(
        "errors.tolerance=all\n"
        "errors.deadletterqueue.topic.name=dlq_topic\n"
    ) == {"error_mode": "dlq", "dlq_dir": "dlq_topic"}
    with pytest.raises(ConfigException, match="quarantine target"):
        error_policy_from_properties("errors.tolerance=all\n")
    with pytest.raises(ConfigException, match="'none' or 'all'"):
        error_policy_from_properties("errors.tolerance=sometimes\n")


def test_cli_error_policy_from_properties(spark, tmp_path):
    """A .properties chain declaring errors.tolerance=all routes errored
    records to the declared DLQ dir instead of aborting the batch."""
    import os as _os
    import subprocess
    import sys as _sys

    from transforms_for_apache_kafka_connect_spark.sources import change_stream

    # error events: null event field hashed WITHOUT skip -> per-record error
    events = change_stream(spark, 500, n_repos=10, paths_per_repo=4)
    events.write.mode("overwrite").parquet(str(tmp_path / "events"))
    dlq = str(tmp_path / "dlq")
    props = tmp_path / "c.properties"
    props.write_text(
        "transforms=h\n"
        "transforms.h.type=io.aiven.kafka.connect.transforms.Hash$Value\n"
        "transforms.h.field.name=after.content\n"
        "transforms.h.function=sha256\n"   # no skip: tombstones error
        "errors.tolerance=all\n"
        f"errors.deadletterqueue.dir={dlq}\n"
    )
    repo = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
    out = subprocess.run(
        [
            _sys.executable, "-m", "transforms_for_apache_kafka_connect_spark",
            "--events", str(tmp_path / "events"),
            "--table", str(tmp_path / "table"),
            "--chain", str(props),
            "--batches", "1",
            "--buckets", "4",
            "--master", "local[4]",
        ],
        env=dict(_os.environ, PYTHONPATH=repo),
        capture_output=True, text=True, timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    # tombstones (null value) have no after.content -> DLQ'd, batch merged
    assert _os.path.isdir(dlq)


def test_sequence_policy_from_properties(tmp_path):
    from transforms_for_apache_kafka_connect_spark.plans.properties import (
        sequence_policy_from_properties,
    )

    root = str(tmp_path / "state")
    # undeclared -> caller keeps defaults
    assert sequence_policy_from_properties("transforms=\n", root) == {}
    out = sequence_policy_from_properties(
        "source.sequence.check=dense\n", root
    )
    tr = out["track_gaps"]
    assert (tr.mode, tr.by, tr.seq) == (
        "dense", ("topic", "partition"), "timestamp"
    )
    assert out["gaps_policy"] == "error" and "gaps_report_dir" not in out
    out2 = sequence_policy_from_properties(
        "source.sequence.check=monotonic\n"
        "source.sequence.by=topic\n"
        "source.sequence.seq=value.lsn\n"
        "source.sequence.policy=warn\n"
        "source.sequence.report.dir=/data/gaps\n",
        root,
    )
    tr2 = out2["track_gaps"]
    assert (tr2.mode, tr2.by, tr2.seq) == ("monotonic", ("topic",), "value.lsn")
    assert out2["gaps_policy"] == "warn"
    assert out2["gaps_report_dir"] == "/data/gaps"
    assert tr2.table.root == root
    with pytest.raises(ConfigException, match="dense.*monotonic"):
        sequence_policy_from_properties("source.sequence.check=exact\n", root)
    with pytest.raises(ConfigException, match="'error' or 'warn'"):
        sequence_policy_from_properties(
            "source.sequence.check=dense\nsource.sequence.policy=skip\n",
            root,
        )


def test_cli_sequence_policy_from_properties(spark, tmp_path):
    """One properties file declares the whole deployment INCLUDING
    lost-event detection: a punched hole fails the run under the
    declared error policy; warn proceeds and reports."""
    import json as _json

    from transforms_for_apache_kafka_connect_spark.cli import main
    from transforms_for_apache_kafka_connect_spark.errors import DataException
    from transforms_for_apache_kafka_connect_spark.sources import change_stream

    events = change_stream(spark, 400, n_repos=10, paths_per_repo=4)
    events.filter("timestamp % 83 != 7").write.mode("overwrite").parquet(
        str(tmp_path / "holey")
    )
    chain = (
        "transforms=th\n"
        "transforms.th.type="
        "io.aiven.kafka.connect.transforms.TombstoneHandler\n"
        "transforms.th.behavior=drop_silent\n"
    )
    props = tmp_path / "conn.properties"
    props.write_text(
        chain
        + "source.sequence.check=dense\n"
        + "source.sequence.by=topic\n"
    )
    base = ["--table", str(tmp_path / "t"), "--buckets", "4",
            "--batches", "2", "--chain", str(props)]
    with pytest.raises(DataException, match="sequence continuity"):
        main(base + ["--events", str(tmp_path / "holey")])
    # warn via the properties file
    props.write_text(
        chain
        + "source.sequence.check=dense\n"
        + "source.sequence.by=topic\n"
        + "source.sequence.policy=warn\n"
    )
    assert main(base + ["--events", str(tmp_path / "holey")]) == 0
