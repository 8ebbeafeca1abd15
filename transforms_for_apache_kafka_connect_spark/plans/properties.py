"""Kafka Connect properties-file compatibility loader.

The reference's users declare chains in connector PROPERTIES, not
Python specs (reference README.md:33-37, IntegrationTest.java:222-229):

    transforms=routeByType,hashEmail
    transforms.routeByType.type=io.aiven.kafka.connect.transforms.ExtractTopic$Value
    transforms.routeByType.field.name=type
    transforms.hashEmail.type=io.aiven.kafka.connect.transforms.Hash$Value
    transforms.hashEmail.field.name=email
    transforms.hashEmail.function=sha256
    predicates=isTombstone
    predicates.isTombstone.type=org.apache.kafka.connect.transforms.predicates.RecordIsTombstone
    transforms.hashEmail.predicate=isTombstone
    transforms.hashEmail.negate=true

This module turns exactly that text into a compiled :class:`Chain`, so
a reference user switches engines WITHOUT rewriting their configs:
``chain_from_properties(open("connector.properties").read())``.

Java class names map to registered stage types; the ``$Key``/``$Value``
suffix becomes the ``place`` config on stages that carry one. Values
stay strings (the stages own typed parsing, like ConfigDef) except the
literals ``true``/``false``, which Connect's BOOLEAN configs parse
case-insensitively.

The parser implements the java.util.Properties subset connector files
actually use: ``#``/``!`` comments, ``=``/``:``/whitespace separators,
backslash line continuations, and ``\\t \\n \\r \\f \\\\ \\uXXXX``
escapes (an unknown escape drops the backslash, like Java).
"""

from __future__ import annotations

import os
from typing import Mapping

from transforms_for_apache_kafka_connect_spark.errors import ConfigException

_AIVEN = "io.aiven.kafka.connect.transforms."
_STOCK = "org.apache.kafka.connect.transforms."
_DBZ = "io.debezium.transforms."

#: Java transformation class (no $Key/$Value suffix) -> stage type
CLASS_TO_TYPE: dict[str, str] = {
    _AIVEN + "ExtractTopic": "extract_topic",
    _AIVEN + "ExtractTopicFromSchemaName": "extract_topic_from_schema_name",
    _AIVEN + "ExtractTimestamp": "extract_timestamp",
    _AIVEN + "Hash": "hash",
    _AIVEN + "ConcatFields": "concat_fields",
    _AIVEN + "CaseTransform": "case_transform",
    _AIVEN + "FilterByFieldValue": "filter_by_field_value",
    _AIVEN + "FilterByFieldName": "filter_by_field_name",
    _AIVEN + "MakeTombstone": "make_tombstone",
    _AIVEN + "TombstoneHandler": "tombstone_handler",
    _AIVEN + "KeyToValue": "key_to_value",
    _STOCK + "RegexRouter": "regex_router",
    _STOCK + "ExtractField": "extract_field",
    _STOCK + "MaskField": "mask_field",
    _STOCK + "TimestampRouter": "timestamp_router",
    _STOCK + "HeaderFrom": "header_from",
    _STOCK + "Filter": "filter",
    _STOCK + "InsertField": "insert_field",
    _STOCK + "ReplaceField": "replace_field",
    _STOCK + "ValueToKey": "value_to_key",
    _STOCK + "HoistField": "hoist_field",
    _STOCK + "Flatten": "flatten",
    _STOCK + "Cast": "cast",
    _STOCK + "SetSchemaMetadata": "set_schema_metadata",
    _STOCK + "TimestampConverter": "timestamp_converter",
    _STOCK + "InsertHeader": "insert_header",
    _STOCK + "DropHeaders": "drop_headers",
    _DBZ + "ExtractNewRecordState": "extract_new_record_state",
    _DBZ + "outbox.EventRouter": "event_router",
}

PREDICATE_CLASS_TO_TYPE: dict[str, str] = {
    _STOCK + "predicates.TopicNameMatches": "topic_name_matches",
    _STOCK + "predicates.HasHeaderKey": "has_header_key",
    _STOCK + "predicates.RecordIsTombstone": "record_is_tombstone",
}

_ESCAPES = {"t": "\t", "n": "\n", "r": "\r", "f": "\f"}


def _unescape(s: str) -> str:
    out = []
    i = 0
    while i < len(s):
        c = s[i]
        if c != "\\" or i + 1 >= len(s):
            out.append(c)
            i += 1
            continue
        nxt = s[i + 1]
        if nxt == "u":
            out.append(chr(int(s[i + 2 : i + 6], 16)))
            i += 6
        else:
            out.append(_ESCAPES.get(nxt, nxt))
            i += 2
    return "".join(out)


def parse_properties(text: str) -> dict[str, str]:
    """java.util.Properties text -> ordered {key: value} dict."""
    # fold line continuations (a logical line ends when the physical
    # line has an EVEN number of trailing backslashes)
    logical: list[str] = []
    pending = ""
    for raw in text.splitlines():
        line = raw.lstrip() if not pending else raw.lstrip()
        if not pending and (not line or line[0] in "#!"):
            continue
        n_bs = len(line) - len(line.rstrip("\\"))
        if n_bs % 2 == 1:
            pending += line[:-1]
            continue
        logical.append(pending + line)
        pending = ""
    if pending:
        logical.append(pending)

    props: dict[str, str] = {}
    for line in logical:
        # first unescaped =, :, or whitespace splits key from value
        key_end = None
        i = 0
        while i < len(line):
            c = line[i]
            if c == "\\":
                i += 2
                continue
            if c in "=:" or c.isspace():
                key_end = i
                break
            i += 1
        if key_end is None:
            props[_unescape(line)] = ""
            continue
        key = line[:key_end]
        rest = line[key_end:].lstrip()
        if rest[:1] in "=:":
            rest = rest[1:].lstrip()
        props[_unescape(key)] = _unescape(rest)
    return props


def _coerce(value: str):
    if value.lower() == "true":
        return True
    if value.lower() == "false":
        return False
    return value


def _split_class(cls: str) -> tuple[str, str | None]:
    """'pkg.Cls$Value' -> (stage type, place) via the class table."""
    base, _, suffix = cls.partition("$")
    if base not in CLASS_TO_TYPE:
        raise ConfigException(
            f"Unknown transformation class: {cls!r}. Known classes: "
            f"{sorted(CLASS_TO_TYPE)}"
        )
    place = {"Key": "key", "Value": "value", "": None}.get(suffix)
    if place is None and suffix:
        raise ConfigException(
            f"Unknown class suffix {('$' + suffix)!r} in {cls!r} "
            f"(expected $Key or $Value)"
        )
    return CLASS_TO_TYPE[base], place


def _alias_config(props: Mapping[str, str], prefix: str) -> dict[str, str]:
    plen = len(prefix)
    return {k[plen:]: v for k, v in props.items() if k.startswith(prefix)}


def chain_specs_from_properties(props: Mapping[str, str]) -> list[dict]:
    """Connector properties -> the Chain compiler's list-of-dicts spec.

    Reads ``transforms`` (ordered aliases), each alias's
    ``transforms.<alias>.*`` block, and the ``predicates.<alias>.*``
    blocks referenced via ``transforms.<alias>.predicate`` /
    ``.negate`` — the full Connect chain-declaration surface.
    """
    aliases = [a.strip() for a in props.get("transforms", "").split(",") if a.strip()]
    if not aliases:
        raise ConfigException(
            "properties declare no transforms (missing/empty 'transforms' key)"
        )
    predicate_specs: dict[str, dict] = {}
    for palias in (
        p.strip() for p in props.get("predicates", "").split(",") if p.strip()
    ):
        pconf = _alias_config(props, f"predicates.{palias}.")
        pcls = pconf.pop("type", None)
        if pcls not in PREDICATE_CLASS_TO_TYPE:
            raise ConfigException(
                f"Unknown predicate class: {pcls!r}. Known: "
                f"{sorted(PREDICATE_CLASS_TO_TYPE)}"
            )
        predicate_specs[palias] = {
            "type": PREDICATE_CLASS_TO_TYPE[pcls],
            **{k: _coerce(v) for k, v in pconf.items()},
        }

    from transforms_for_apache_kafka_connect_spark.operators.base import (
        STAGE_REGISTRY,
    )

    specs: list[dict] = []
    for alias in aliases:
        conf = _alias_config(props, f"transforms.{alias}.")
        cls = conf.pop("type", None)
        if cls is None:
            raise ConfigException(
                f"transform alias {alias!r} has no "
                f"'transforms.{alias}.type' entry"
            )
        type_name, place = _split_class(cls)
        spec: dict = {"type": type_name}
        if place is not None:
            fields = getattr(STAGE_REGISTRY[type_name], "__dataclass_fields__", {})
            if "place" not in fields:
                raise ConfigException(
                    f"{cls!r}: {type_name} has no $Key/$Value variants"
                )
            spec["place"] = place
        palias = conf.pop("predicate", None)
        negate = conf.pop("negate", None)
        if palias is not None:
            if palias not in predicate_specs:
                raise ConfigException(
                    f"transform alias {alias!r} references undeclared "
                    f"predicate {palias!r}"
                )
            spec["predicate"] = predicate_specs[palias]
            if negate is not None:
                spec["negate"] = _coerce(negate)
        spec.update({k: _coerce(v) for k, v in conf.items()})
        specs.append(spec)
    return specs


def _load_props(source) -> dict[str, str]:
    if isinstance(source, Mapping):
        return dict(source)
    if "\n" not in source and os.path.exists(source):
        with open(source) as f:
            source = f.read()
    return parse_properties(source)


def chain_from_properties(source):
    """Compile a :class:`Chain` from connector properties.

    ``source`` may be the properties TEXT, a path to a ``.properties``
    file, or an already-parsed mapping.
    """
    from transforms_for_apache_kafka_connect_spark.plans.chain import Chain

    return Chain(chain_specs_from_properties(_load_props(source)))


#: Connect converter class -> engine raw_format (None = UTF-8 string
#: passthrough, no typed boundary)
CONVERTER_CLASS_TO_FORMAT: dict[str, str | None] = {
    "org.apache.kafka.connect.json.JsonConverter": "json",
    "io.confluent.connect.avro.AvroConverter": "avro",
    "io.confluent.connect.protobuf.ProtobufConverter": "protobuf",
    "org.apache.kafka.connect.storage.StringConverter": None,
    "org.apache.kafka.connect.converters.ByteArrayConverter": None,
}


def converters_from_properties(source) -> dict:
    """Connect worker/connector converter declarations -> the engine's
    streaming-boundary kwargs (``prepare_stream_events`` /
    ``Replayer.stream``).

    Reads ``key.converter`` / ``value.converter`` and their config
    blocks. Since this engine runs offline (no schema-registry call),
    the writer schema must be PINNED next to the converter — the engine
    extension keys are:

    * ``value.converter.schema`` — inline schema (Spark DDL for
      JsonConverter, Avro JSON for AvroConverter)
    * ``value.converter.schema.file`` — path to a file holding it
      (same two spellings for ``key.converter.*``)
    * ``value.converter.writer.schemas.file`` — path to a JSON object
      ``{schema_id: avro schema}``: a registryless snapshot of the
      registry's id->schema map, enabling mid-stream schema evolution
      (each payload decoded with the writer schema its frame names,
      resolved onto the reader ``value.converter.schema``)

    For AvroConverter and ProtobufConverter the Confluent wire framing
    is implied (that IS those converters' wire format; protobuf frames
    additionally carry message indexes). Returns a dict with
    ``raw_format``, ``key_schema``, ``value_schema``,
    ``confluent_framing`` (+ ``writer_schemas`` when declared) — empty
    dict when no converter is declared.
    """
    props = _load_props(source)
    dialect = props.get("source.cdc.envelope")
    if dialect is not None:
        # engine extension: third-party CDC wire envelopes (no Connect
        # converter class exists for these) — sources/cdc_envelopes.py.
        # ``value.converter.schema``/``.file`` types the row payload,
        # ``source.cdc.key.fields`` names its primary key.
        if dialect not in ("maxwell", "canal", "dms"):
            raise ConfigException(
                f"Unknown source.cdc.envelope: {dialect!r}. Known: "
                "canal, dms, maxwell"
            )
        if "value.converter" in props or "key.converter" in props:
            raise ConfigException(
                "source.cdc.envelope conflicts with key/value.converter"
                " — the envelope adapter IS the value boundary"
            )
        inline = props.get("value.converter.schema")
        path = props.get("value.converter.schema.file")
        if inline is None and path is not None:
            with open(path) as f:
                inline = f.read()
        out: dict = {"raw_format": dialect, "value_schema": inline,
                     "confluent_framing": False}
        kf = props.get("source.cdc.key.fields")
        if kf:
            out["key_fields"] = [c.strip() for c in kf.split(",") if c.strip()]
        return out
    if "value.converter" not in props and "key.converter" not in props:
        return {}

    def fmt(side: str):
        cls = props.get(f"{side}.converter")
        if cls is None:
            return None
        if cls not in CONVERTER_CLASS_TO_FORMAT:
            raise ConfigException(
                f"Unknown converter class: {cls!r}. Known: "
                f"{sorted(CONVERTER_CLASS_TO_FORMAT)}"
            )
        return CONVERTER_CLASS_TO_FORMAT[cls]

    def schema(side: str):
        inline = props.get(f"{side}.converter.schema")
        if inline is not None:
            return inline
        path = props.get(f"{side}.converter.schema.file")
        if path is not None:
            with open(path) as f:
                return f.read()
        return None

    vfmt, kfmt = fmt("value"), fmt("key")
    v_declared = "value.converter" in props
    k_declared = "key.converter" in props
    # the boundary decodes both sides with ONE converter per stream:
    # the value converter decides the format. A typed KEY converter
    # next to an untyped/absent VALUE converter (e.g. Avro keys over
    # StringConverter values) is a real Connect config the engine
    # cannot express — refuse loudly instead of hijacking the value
    # decode (a passthrough value payload parsed as framed Avro would
    # error every record).
    raw_format = vfmt if v_declared else None
    if k_declared and kfmt is not None and kfmt != raw_format:
        raise ConfigException(
            f"key.converter format ({kfmt}) differs from the value "
            f"converter's ({raw_format}); the engine boundary decodes "
            "both sides with one converter per stream"
        )
    out: dict = {"raw_format": raw_format}
    if raw_format is None:
        return out
    out["key_schema"] = schema("key")
    out["value_schema"] = schema("value")
    # Avro and protobuf registry converters both imply the Confluent
    # wire frame (that IS those converters' byte format)
    out["confluent_framing"] = raw_format in ("avro", "protobuf")
    writers_path = props.get("value.converter.writer.schemas.file")
    if writers_path is not None:
        if raw_format != "avro":
            raise ConfigException(
                "value.converter.writer.schemas.file only applies to "
                "AvroConverter (per-id writer schemas ride the "
                "Confluent frame)"
            )
        import json as _json

        with open(writers_path) as f:
            out["writer_schemas"] = {
                int(k): v for k, v in _json.load(f).items()
            }
    registry_url = props.get("value.converter.schema.registry.url")
    if registry_url is not None:
        # the STANDARD AvroConverter key (public Confluent converter
        # config) — maps to the live HTTP registry client; mutually
        # exclusive with the offline snapshot file above
        if raw_format != "avro":
            raise ConfigException(
                "value.converter.schema.registry.url only applies to "
                "AvroConverter"
            )
        if "writer_schemas" in out:
            raise ConfigException(
                "set either value.converter.writer.schemas.file (an "
                "offline id->schema snapshot) or "
                "value.converter.schema.registry.url (a live "
                "registry), not both"
            )
        from transforms_for_apache_kafka_connect_spark.sources.schema_registry import (
            HttpSchemaRegistry,
        )

        out["schema_registry"] = HttpSchemaRegistry(registry_url)
    if out["value_schema"] is None:
        raise ConfigException(
            "converter declared but no pinned schema: set "
            "'value.converter.schema' (inline) or "
            "'value.converter.schema.file' — this engine runs without "
            "a schema registry, so the writer schema must be pinned"
        )
    return out


def error_policy_from_properties(source) -> dict:
    """Connect error-handling declarations -> the engine's Replayer
    kwargs (``error_mode``/``dlq_dir``).

    Maps the standard worker keys (public Connect config):

    * ``errors.tolerance=none`` (default) -> ``error_mode="fail"``
      (first errored record aborts the batch — the reference's
      DataException model)
    * ``errors.tolerance=all`` -> ``error_mode="dlq"``; the quarantine
      directory comes from ``errors.deadletterqueue.topic.name``
      resolved against the engine extension key
      ``errors.deadletterqueue.dir`` (the engine writes a directory,
      not a Kafka topic — one of the two must be set)

    Returns an empty dict when no error keys are declared (caller
    keeps its defaults).
    """
    props = _load_props(source)
    tolerance = props.get("errors.tolerance")
    if tolerance is None:
        return {}
    if tolerance == "none":
        return {"error_mode": "fail"}
    if tolerance != "all":
        raise ConfigException(
            f"errors.tolerance must be 'none' or 'all', got {tolerance!r}"
        )
    dlq_dir = props.get("errors.deadletterqueue.dir") or props.get(
        "errors.deadletterqueue.topic.name"
    )
    if not dlq_dir:
        raise ConfigException(
            "errors.tolerance=all requires a quarantine target: set "
            "'errors.deadletterqueue.dir' (engine extension) or "
            "'errors.deadletterqueue.topic.name'"
        )
    return {"error_mode": "dlq", "dlq_dir": dlq_dir}


def sequence_policy_from_properties(source, state_root: str) -> dict:
    """Engine-extension sequence-continuity declarations -> Replayer /
    TopicTableRouter kwargs (``track_gaps``/``gaps_policy``/
    ``gaps_report_dir``) — the whole deployment, including its
    lost-event detection, stays declared in ONE properties file.

    Keys (engine extensions; Connect itself has no continuity checking
    — it delegates to the broker's offset contract, which a
    lake-building engine must replace):

    * ``source.sequence.check`` = ``dense`` | ``monotonic`` (absent ->
      no tracking, empty dict returned)
    * ``source.sequence.by`` = comma-separated envelope columns
      defining a sequence domain (default ``topic,partition``)
    * ``source.sequence.seq`` = envelope expression giving each
      record's sequence number (default ``timestamp`` — the offset
      slot every record carries)
    * ``source.sequence.policy`` = ``error`` (default) | ``warn``
    * ``source.sequence.report.dir`` = optional parquet root for
      per-batch anomaly rows

    ``state_root`` roots the tracker's watermark table (the CLI passes
    ``<table>/_seq_state``).
    """
    props = _load_props(source)
    mode = props.get("source.sequence.check")
    if mode is None:
        return {}
    if mode not in ("dense", "monotonic"):
        raise ConfigException(
            f"source.sequence.check must be 'dense' or 'monotonic', "
            f"got {mode!r}"
        )
    policy = props.get("source.sequence.policy", "error")
    if policy not in ("error", "warn"):
        raise ConfigException(
            f"source.sequence.policy must be 'error' or 'warn', "
            f"got {policy!r}"
        )
    by = [
        c.strip()
        for c in props.get("source.sequence.by", "topic,partition").split(",")
        if c.strip()
    ]
    from transforms_for_apache_kafka_connect_spark.streaming.gaps import (
        SequenceTracker,
    )
    from transforms_for_apache_kafka_connect_spark.streaming.sink import (
        LakeTable,
    )

    tracker = SequenceTracker(
        table=LakeTable(
            state_root, key_cols=by, n_buckets=1,
            discovery=False, merge_strategy="broadcast",
        ),
        by=tuple(by),
        seq=props.get("source.sequence.seq", "timestamp"),
        mode=mode,
    )
    out = {"track_gaps": tracker, "gaps_policy": policy}
    if props.get("source.sequence.report.dir"):
        out["gaps_report_dir"] = props["source.sequence.report.dir"]
    return out
