"""Third-party CDC envelope adapters: Maxwell, Canal, AWS DMS → the
engine's standard change envelope.

The reference's chains sit behind Debezium connectors (its one
CustomConverter is a Debezium converter — reference
debezium/converters/MoneyConverter.java:27-64), but real Kafka CDC
estates also carry Maxwell's daemon, Alibaba Canal, and AWS DMS
streams. Each emits a different JSON envelope on the wire; this module
normalizes all three into the SAME envelope ``changestream.py``
produces — ``topic, partition, key:struct<pk...>,
value:struct<op, lsn, ts_ms, before, after>, timestamp, headers`` —
so the entire downstream engine (SMT chain, LWW dedupe, ledgered
merge, changelog, views) consumes them unchanged.

Wire formats implemented from the public docs only:

* **Maxwell** (maxwells-daemon.io "dataformat"): one row per message —
  ``{database, table, type, ts, xid?, commit?, data, old?}``. ``type``
  maps insert→c, update→u, delete→d, bootstrap-insert→r (the snapshot
  analog); ``bootstrap-start``/``bootstrap-complete`` carry no row and
  are dropped; any other type (DDL passthrough etc.) lands on the
  per-record error channel. ``old`` holds ONLY the changed columns'
  previous values, so the before-image is ``data`` overlaid with
  ``old`` — membership is tested with ``json_object_keys`` so an
  explicit ``"old": {"col": null}`` (column became non-null) is
  distinguished from an absent key.

* **Canal** (Alibaba Canal "FlatMessage" JSON): one message carries
  MANY rows — ``{data: [...], old: [...], database, table, es, ts,
  type, isDdl, pkNames?}`` — and serializes every column value as a
  JSON string (or null). Rows are ``posexplode``d so ``old[i]`` stays
  aligned with ``data[i]``; values parse as ``map<string,string>`` and
  cast per-field to the declared schema (Canal's all-strings
  convention would null out a typed ``from_json``). DDL messages
  (``isDdl``) are dropped; unknown types error.

* **AWS DMS** (Kinesis/Kafka target JSON): ``{data, metadata}`` with
  ``metadata.operation`` load→r, insert→c, update→u, delete→d and an
  ISO-8601 ``metadata.timestamp``. ``record-type: "control"`` messages
  (DDL/task events) are dropped.

LSN assignment: none of the three exposes a usable global LSN in its
payload (Maxwell's ``position`` is optional and file-relative), so the
adapters use the engine's Kafka-boundary convention
(json_boundary.envelope_from_kafka): an ``offset`` column on the input
frame — the natural per-partition LSN for compacted-topic ingestion —
or an explicit ``lsn`` Column expression. One of the two must exist:
LWW correctness is not something to guess.

Spark-first: everything is ``from_json`` / ``get_json_object`` /
``transform``-style Column expressions — one Catalyst plan, zero
Python in the hot path. Malformed JSON follows the converter error
contract (SERIALIZATION_ERROR → batch-fail gate); null raw values are
tombstone *records* and pass through as null-value envelopes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from transforms_for_apache_kafka_connect_spark.record import (
    ensure_error_col,
    merge_error,
)
from transforms_for_apache_kafka_connect_spark.sources.json_boundary import (
    SERIALIZATION_ERROR,
    _parse_with_corruption,
)

__all__ = [
    "envelope_from_maxwell",
    "envelope_from_canal",
    "envelope_from_dms",
    "envelope_to_maxwell",
]


def _schema(s: T.StructType | str) -> T.StructType:
    return T._parse_datatype_string(s) if isinstance(s, str) else s


def _lsn_expr(df: DataFrame, lsn: Column | str | None) -> Column:
    if lsn is not None:
        return (F.col(lsn) if isinstance(lsn, str) else lsn).cast("long")
    if "offset" in df.columns:
        return F.col("offset").cast("long")
    raise ValueError(
        "no LSN source: the input frame has no 'offset' column and no "
        "explicit lsn= was given — LWW ordering cannot be inferred"
    )


def _env_slot(df: DataFrame, name: str, default: Column) -> Column:
    return F.col(name) if name in df.columns else default


def _std_envelope(
    df: DataFrame,
    *,
    op: Column,
    lsn: Column,
    ts_ms: Column,
    before: Column,
    after: Column,
    key_fields: list[str],
    topic: Column,
    extra_headers: dict[str, Column],
) -> DataFrame:
    """Assemble the engine's standard change envelope.

    The key struct reads from the image that HAS the row: after for
    c/u/r, before for d (a delete's after is null by construction).
    A null raw value is a tombstone *record*: it keeps a NULL value
    slot (the MakeTombstone/TombstoneHandler contract), never an
    empty struct.
    """
    raw_value = F.col("__cdc_raw")
    image = F.when(op == "d", before).otherwise(after)
    key = F.struct(*[image.getField(f).alias(f) for f in key_fields])
    hdr_items: list[Column] = []
    for k, v in extra_headers.items():
        hdr_items.append(F.lit(k))
        hdr_items.append(v.cast("string"))
    new_headers = F.map_filter(
        F.create_map(*hdr_items), lambda _, v: v.isNotNull()
    )
    base_headers = _env_slot(
        df, "headers", F.lit(None).cast("map<string,string>")
    )
    headers = F.when(
        base_headers.isNotNull(), F.map_concat(base_headers, new_headers)
    ).otherwise(new_headers)
    return df.select(
        topic.alias("topic"),
        _env_slot(df, "partition", F.lit(0)).cast("int").alias("partition"),
        F.when(raw_value.isNotNull(), key).alias("key"),
        F.when(
            raw_value.isNotNull(),
            F.struct(
                op.alias("op"),
                lsn.alias("lsn"),
                ts_ms.cast("long").alias("ts_ms"),
                before.alias("before"),
                after.alias("after"),
            ),
        ).alias("value"),
        _env_slot(df, "timestamp", ts_ms).cast("long").alias("timestamp"),
        headers.alias("headers"),
        F.col("__cdc_bad").alias("__cdc_bad"),
        F.col("__cdc_raw").alias("__cdc_raw"),
        F.col("__cdc_drop").alias("__cdc_drop"),
        F.col("__cdc_unknown").alias("__cdc_unknown"),
    )


def _finish(env: DataFrame, source: str) -> DataFrame:
    env = ensure_error_col(env)
    env = merge_error(
        env,
        F.col("__cdc_bad"),
        F.concat(
            F.lit(SERIALIZATION_ERROR),
            F.format_string(
                "invalid %s document: %s", F.lit(source), F.col("__cdc_raw")
            ),
        ),
    )
    env = merge_error(
        env,
        F.col("__cdc_unknown").isNotNull(),
        F.format_string(
            "Unknown %s record type: %s", F.lit(source), F.col("__cdc_unknown")
        ),
    )
    return env.filter(~F.col("__cdc_drop")).drop(
        "__cdc_bad", "__cdc_raw", "__cdc_drop", "__cdc_unknown"
    )


def _overlay_from_json_keys(
    data: Column, old_struct: Column, old_raw: Column, schema: T.StructType
) -> Column:
    """before-image = ``data`` overlaid with ``old`` where ``old``
    provides the column — presence tested on the raw JSON's key set so
    an explicit null in ``old`` wins over the post-image value."""
    keys = F.json_object_keys(old_raw)
    fields = [
        F.when(F.array_contains(keys, f.name), old_struct.getField(f.name))
        .otherwise(data.getField(f.name))
        .alias(f.name)
        for f in schema.fields
    ]
    return F.when(old_raw.isNotNull(), F.struct(*fields)).otherwise(data)


_MAXWELL_META = (
    "database string, table string, type string, ts long, xid long, "
    "commit boolean"
)


def envelope_from_maxwell(
    raw: DataFrame,
    *,
    data_schema: T.StructType | str,
    key_fields: list[str],
    lsn: Column | str | None = None,
    value_col: str = "value",
) -> DataFrame:
    """Maxwell daemon JSON stream → standard change envelope.

    ``raw`` needs ``value`` (string/binary JSON; null = tombstone
    record) plus optionally topic/partition/timestamp/headers/offset.
    ``data_schema`` types the row payload; ``key_fields`` name its
    primary key. Source metadata (database, table, xid) lands in
    headers as ``__maxwell_*`` for downstream routing operators.
    """
    schema = _schema(data_schema)
    lsn_c = _lsn_expr(raw, lsn)
    raw_v = F.col(value_col).cast("string")

    meta, meta_bad = _parse_with_corruption(
        raw_v, T._parse_datatype_string(_MAXWELL_META)
    )
    data = F.from_json(F.get_json_object(raw_v, "$.data"), schema)
    old_raw = F.get_json_object(raw_v, "$.old")
    old = F.from_json(old_raw, schema)

    typ = meta.getField("type")
    op = (
        F.when(typ == "insert", F.lit("c"))
        .when(typ == "update", F.lit("u"))
        .when(typ == "delete", F.lit("d"))
        .when(typ == "bootstrap-insert", F.lit("r"))
    )
    drop = F.coalesce(
        raw_v.isNotNull()
        & typ.isin("bootstrap-start", "bootstrap-complete"),
        F.lit(False),
    )
    bad = raw_v.isNotNull() & meta_bad
    unknown = F.when(
        raw_v.isNotNull() & ~bad & ~drop & op.isNull(),
        F.coalesce(typ, F.lit("<missing type>")),
    )

    null_row = F.lit(None).cast(schema)
    before = (
        F.when(op == "u", _overlay_from_json_keys(data, old, old_raw, schema))
        .when(op == "d", data)
        .otherwise(null_row)
    )
    after = F.when(op == "d", null_row).otherwise(data)
    ts_ms = meta.getField("ts") * 1000

    env = _std_envelope(
        raw.withColumn("__cdc_bad", bad)
        .withColumn("__cdc_raw", raw_v)
        .withColumn("__cdc_drop", drop)
        .withColumn("__cdc_unknown", unknown),
        op=op,
        lsn=lsn_c,
        ts_ms=ts_ms,
        before=before,
        after=after,
        key_fields=key_fields,
        topic=_env_slot(
            raw,
            "topic",
            F.concat_ws(".", meta.getField("database"), meta.getField("table")),
        ),
        extra_headers={
            "__maxwell_database": meta.getField("database"),
            "__maxwell_table": meta.getField("table"),
            "__maxwell_xid": meta.getField("xid"),
        },
    )
    return _finish(env, "Maxwell")


_CANAL_META = (
    "database string, table string, type string, es long, ts long, "
    "id long, isDdl boolean, pkNames array<string>, "
    "data array<map<string,string>>, old array<map<string,string>>"
)


def envelope_from_canal(
    raw: DataFrame,
    *,
    data_schema: T.StructType | str,
    key_fields: list[str],
    lsn: Column | str | None = None,
    value_col: str = "value",
) -> DataFrame:
    """Canal FlatMessage JSON stream → standard change envelope.

    One Canal message carries many rows; each becomes one envelope
    record and the multi-row LSN stays total by sub-ordering the
    message LSN with the row position (``lsn * max_rows + pos`` would
    renumber, so the envelope keeps ``lsn`` per message and relies on
    Canal's contract that one message never carries two images of the
    same key — pkNames-changing statements split messages).

    Canal serializes every value as a JSON string; rows parse as
    ``map<string,string>`` and cast per-field to ``data_schema``.
    """
    schema = _schema(data_schema)
    lsn_c = _lsn_expr(raw, lsn)
    raw_v = F.col(value_col).cast("string")

    meta, meta_bad = _parse_with_corruption(
        raw_v, T._parse_datatype_string(_CANAL_META)
    )
    typ = meta.getField("type")
    op = (
        F.when(typ == "INSERT", F.lit("c"))
        .when(typ == "UPDATE", F.lit("u"))
        .when(typ == "DELETE", F.lit("d"))
    )
    is_ddl = F.coalesce(meta.getField("isDdl"), F.lit(False))
    bad = raw_v.isNotNull() & meta_bad
    drop = raw_v.isNotNull() & ~bad & is_ddl
    unknown = F.when(
        raw_v.isNotNull() & ~bad & ~drop & op.isNull(),
        F.coalesce(typ, F.lit("<missing type>")),
    )

    prepped = (
        raw.withColumn("__cdc_bad", bad)
        .withColumn("__cdc_raw", raw_v)
        .withColumn("__cdc_drop", drop)
        .withColumn("__cdc_unknown", unknown)
        .withColumn("__cdc_meta", meta)
        # tombstones / malformed / dropped rows keep exactly one output
        # row: explode a single-null array instead of the (absent) data
        .withColumn(
            "__cdc_rows",
            F.when(
                raw_v.isNotNull() & ~bad & ~drop & op.isNotNull(),
                meta.getField("data"),
            ).otherwise(F.array(F.lit(None).cast("map<string,string>"))),
        )
        .select(
            "*",
            F.posexplode_outer("__cdc_rows").alias("__cdc_pos", "__cdc_row"),
        )
    )

    def typed(m: Column) -> Column:
        return F.struct(
            *[
                F.element_at(m, f.name).cast(f.dataType).alias(f.name)
                for f in schema.fields
            ]
        )

    meta_c = F.col("__cdc_meta")
    row = F.col("__cdc_row")
    old_m = F.element_at(meta_c.getField("old"), F.col("__cdc_pos") + 1)
    data = F.when(row.isNotNull(), typed(row))
    overlaid = F.struct(
        *[
            F.when(
                F.map_contains_key(old_m, f.name),
                F.element_at(old_m, f.name).cast(f.dataType),
            )
            .otherwise(data.getField(f.name))
            .alias(f.name)
            for f in schema.fields
        ]
    )
    op_c = (
        F.when(F.col("__cdc_row").isNull(), F.lit(None).cast("string"))
        .when(meta_c.getField("type") == "INSERT", F.lit("c"))
        .when(meta_c.getField("type") == "UPDATE", F.lit("u"))
        .otherwise(F.lit("d"))
    )
    null_row = F.lit(None).cast(schema)
    before = (
        F.when(op_c == "u", F.when(old_m.isNotNull(), overlaid).otherwise(data))
        .when(op_c == "d", data)
        .otherwise(null_row)
    )
    after = F.when(op_c == "d", null_row).otherwise(data)

    env = _std_envelope(
        prepped,
        op=op_c,
        lsn=lsn_c,
        ts_ms=F.coalesce(meta_c.getField("es"), meta_c.getField("ts")),
        before=before,
        after=after,
        key_fields=key_fields,
        topic=_env_slot(
            prepped,
            "topic",
            F.concat_ws(
                ".", meta_c.getField("database"), meta_c.getField("table")
            ),
        ),
        extra_headers={
            "__canal_database": meta_c.getField("database"),
            "__canal_table": meta_c.getField("table"),
            "__canal_batch_id": meta_c.getField("id"),
        },
    )
    return _finish(env, "Canal")


_DMS_META = (
    "timestamp string, `record-type` string, operation string, "
    "`schema-name` string, `table-name` string, `transaction-id` long"
)


def envelope_from_dms(
    raw: DataFrame,
    *,
    data_schema: T.StructType | str,
    key_fields: list[str],
    lsn: Column | str | None = None,
    value_col: str = "value",
) -> DataFrame:
    """AWS DMS (Kinesis/Kafka target) JSON stream → standard change
    envelope. ``metadata.operation`` load→r (full-load rows),
    insert→c, update→u, delete→d; control records are dropped.
    DMS's ``data`` is the post-image for load/insert/update and the
    deleted row for delete (before-image support in DMS is an optional
    task setting; when absent — the default — updates carry no
    before)."""
    schema = _schema(data_schema)
    lsn_c = _lsn_expr(raw, lsn)
    raw_v = F.col(value_col).cast("string")

    doc, doc_bad = _parse_with_corruption(
        raw_v,
        T.StructType(
            [
                T.StructField(
                    "metadata", T._parse_datatype_string(_DMS_META)
                )
            ]
        ),
    )
    meta = doc.getField("metadata")
    data = F.from_json(F.get_json_object(raw_v, "$.data"), schema)
    oper = meta.getField("operation")
    op = (
        F.when(oper == "load", F.lit("r"))
        .when(oper == "insert", F.lit("c"))
        .when(oper == "update", F.lit("u"))
        .when(oper == "delete", F.lit("d"))
    )
    bad = raw_v.isNotNull() & doc_bad
    drop = F.coalesce(
        raw_v.isNotNull()
        & ~bad
        & (meta.getField("record-type") != F.lit("data")),
        F.lit(False),
    )
    unknown = F.when(
        raw_v.isNotNull() & ~bad & ~drop & op.isNull(),
        F.coalesce(oper, F.lit("<missing operation>")),
    )

    null_row = F.lit(None).cast(schema)
    before = F.when(op == "d", data).otherwise(null_row)
    after = F.when(op == "d", null_row).otherwise(data)
    ts_ms = F.unix_millis(F.to_timestamp(meta.getField("timestamp")))

    env = _std_envelope(
        raw.withColumn("__cdc_bad", bad)
        .withColumn("__cdc_raw", raw_v)
        .withColumn("__cdc_drop", drop)
        .withColumn("__cdc_unknown", unknown),
        op=op,
        lsn=lsn_c,
        ts_ms=ts_ms,
        before=before,
        after=after,
        key_fields=key_fields,
        topic=_env_slot(
            raw,
            "topic",
            F.concat_ws(
                ".",
                meta.getField("schema-name"),
                meta.getField("table-name"),
            ),
        ),
        extra_headers={
            "__dms_schema": meta.getField("schema-name"),
            "__dms_table": meta.getField("table-name"),
            "__dms_txn": meta.getField("transaction-id"),
        },
    )
    return _finish(env, "DMS")


def envelope_to_maxwell(
    env: DataFrame,
    *,
    database: str = "engine",
    table: str | None = None,
    data_fields: list[str] | None = None,
) -> DataFrame:
    """Standard change envelope → Maxwell wire JSON (the inverse of
    :func:`envelope_from_maxwell`): the engine as a CDC *source* for
    downstream Maxwell consumers, complementing relay.py's
    Debezium-style publisher.

    Emission rules (Maxwell's documented shapes):

    * op c→insert, u→update, d→delete, r→bootstrap-insert;
    * ``data`` = after-image for insert/update/bootstrap, the
      before-image for delete (Maxwell deletes carry the deleted row);
    * ``old`` = the changed-columns diff between before and after for
      updates — only columns whose value differs appear, with their
      OLD value (null-to-value and value-to-null transitions count as
      changes, exactly what the ``json_object_keys`` overlay on the
      decode side reconstructs);
    * ``ts`` = envelope ``ts_ms`` floored to seconds; ``xid`` = lsn;
    * tombstone records (null value) stay null-value records.

    Output: ``(topic, partition, key, value, timestamp, headers,
    offset)`` with ``value`` the Maxwell JSON string and ``offset``
    carrying the LSN — feeding this straight back to
    ``envelope_from_maxwell`` reproduces the envelope (round-trip
    law-tested), modulo Maxwell's own lossiness: a delete's after-side
    is gone and bootstrap rows re-enter as op 'r'.
    """
    vdt = env.schema["value"].dataType
    if data_fields is None:
        data_fields = [f.name for f in vdt["after"].dataType.fields]
    after, before = F.col("value.after"), F.col("value.before")
    op = F.col("value.op")
    typ = (
        F.when(op == "c", F.lit("insert"))
        .when(op == "u", F.lit("update"))
        .when(op == "d", F.lit("delete"))
        .otherwise(F.lit("bootstrap-insert"))
    )
    image = F.when(op == "d", before).otherwise(after)
    # a delete whose before-image is null (key-only changelogs) still
    # carries its primary key: key-struct fields backfill the image
    kdt = env.schema["key"].dataType
    key_names = (
        {f.name for f in kdt.fields} if isinstance(kdt, T.StructType)
        else set()
    )
    data = F.struct(
        *[
            (
                F.coalesce(image.getField(f), F.col("key").getField(f))
                if f in key_names
                else image.getField(f)
            ).alias(f)
            for f in data_fields
        ]
    )
    # old: per changed column, a 1-key JSON fragment ("col":oldval or
    # "col":null); to_json cannot express "present with null", so the
    # fragments are assembled by hand and concatenated
    def _json_scalar(col: Column) -> Column:
        # JSON-escaped scalar: to_json only takes containers, so wrap
        # in a 1-field struct and strip the {"x": ... } shell
        wrapped = F.to_json(F.struct(col.alias("x")))
        return F.when(col.isNull(), F.lit("null")).otherwise(
            wrapped.substr(F.lit(6), F.length(wrapped) - 6)
        )

    def _old_frag(f: str) -> Column:
        rendered = _json_scalar(before.getField(f))
        return F.when(
            ~before.getField(f).eqNullSafe(after.getField(f)),
            F.concat(F.lit(f'"{f}":'), rendered),
        )

    frags = [_old_frag(f) for f in data_fields]
    old_body = F.concat_ws(",", F.array_compact(F.array(*frags)))
    old_json = F.when(
        (op == "u") & before.isNotNull() & (old_body != ""),
        F.concat(F.lit("{"), old_body, F.lit("}")),
    )
    tbl = F.lit(table) if table is not None else F.split(
        F.col("topic"), r"\."
    ).getItem(0)
    doc = F.concat(
        F.lit('{"database":'), _json_scalar(F.lit(database)),
        F.lit(',"table":'), _json_scalar(tbl),
        F.lit(',"type":"'), typ, F.lit('"'),
        F.lit(',"ts":'),
        F.coalesce(
            F.floor(F.col("value.ts_ms") / 1000).cast("string"), F.lit("0")
        ),
        F.lit(',"xid":'), F.col("value.lsn").cast("string"),
        F.lit(',"data":'), F.to_json(data),
        F.when(old_json.isNotNull(), F.concat(F.lit(',"old":'), old_json))
        .otherwise(F.lit("")),
        F.lit("}"),
    )
    return env.select(
        F.col("topic"),
        F.col("partition"),
        F.to_json(F.col("key")).alias("key"),
        F.when(F.col("value").isNotNull(), doc).alias("value"),
        F.col("timestamp"),
        F.col("headers"),
        F.col("value.lsn").alias("offset"),
    )


def envelope_to_canal(
    env: DataFrame,
    *,
    database: str = "engine",
    table: str | None = None,
    data_fields: list[str] | None = None,
) -> DataFrame:
    """Standard change envelope → Canal FlatMessage JSON (the inverse
    of :func:`envelope_from_canal`, single-row messages — a legal
    FlatMessage subset every Canal consumer handles; the decoder's
    posexplode sees exactly one row per message).

    Emission rules (Canal's documented conventions):

    * op c→INSERT, u→UPDATE, d→DELETE; op 'r' rows emit as INSERT
      (Canal has no bootstrap marker — snapshot rows ARE inserts to a
      Canal consumer);
    * every value serializes as a STRING (Canal stringifies all column
      values); NULL column values stay JSON null;
    * ``data`` = [after-image] for insert/update, [before-image] for
      delete (key-struct backfill when before-images are null);
    * ``old`` = [changed-columns map] for updates — only columns whose
      value differs, carrying the OLD value;
    * ``es``/``ts`` = envelope ``ts_ms``; ``id`` = lsn; ``isDdl`` =
      false; ``pkNames`` = the key-struct field names;
    * tombstone records (null value) stay null-value records.

    Output mirrors :func:`envelope_to_maxwell`: ``(topic, partition,
    key, value, timestamp, headers, offset)`` — round-trips through
    ``envelope_from_canal`` (law-tested) modulo Canal's own lossiness
    (deletes lose their after side, 'r' re-enters as 'c')."""
    vdt = env.schema["value"].dataType
    if data_fields is None:
        data_fields = [f.name for f in vdt["after"].dataType.fields]
    after, before = F.col("value.after"), F.col("value.before")
    op = F.col("value.op")
    typ = (
        F.when(op == "d", F.lit("DELETE"))
        .when(op == "u", F.lit("UPDATE"))
        .otherwise(F.lit("INSERT"))
    )
    image = F.when(op == "d", before).otherwise(after)
    kdt = env.schema["key"].dataType
    key_names = (
        [f.name for f in kdt.fields] if isinstance(kdt, T.StructType) else []
    )

    def _img_field(f: str) -> Column:
        col = image.getField(f)
        if f in key_names:
            col = F.coalesce(col, F.col("key").getField(f))
        return col.cast("string")

    data_map = F.map_from_arrays(
        F.array(*[F.lit(f) for f in data_fields]),
        F.array(*[_img_field(f) for f in data_fields]),
    )
    # old: map of only the CHANGED columns with their old values —
    # entries filtered on a per-column changed flag, so present-with-
    # null old values survive (a null map VALUE is legal)
    old_entries = F.filter(
        F.array(
            *[
                F.struct(
                    F.lit(f).alias("k"),
                    before.getField(f).cast("string").alias("v"),
                    (~before.getField(f).eqNullSafe(after.getField(f)))
                    .alias("chg"),
                )
                for f in data_fields
            ]
        ),
        lambda e: e.getField("chg"),
    )
    old_map = F.map_from_entries(
        F.transform(
            old_entries,
            lambda e: F.struct(e.getField("k"), e.getField("v")),
        )
    )
    has_old = (op == "u") & before.isNotNull() & (F.size(old_entries) > 0)
    tbl = F.lit(table) if table is not None else F.split(
        F.col("topic"), r"\."
    ).getItem(0)
    body = F.struct(
        F.lit(database).alias("database"),
        tbl.alias("table"),
        typ.alias("type"),
        F.coalesce(F.col("value.ts_ms"), F.lit(0)).alias("es"),
        F.coalesce(F.col("value.ts_ms"), F.lit(0)).alias("ts"),
        F.col("value.lsn").alias("id"),
        F.lit(False).alias("isDdl"),
        F.array(*[F.lit(k) for k in key_names]).alias("pkNames"),
        F.array(data_map).alias("data"),
        F.when(has_old, F.array(old_map)).alias("old"),
    )
    return env.select(
        F.col("topic"),
        F.col("partition"),
        F.to_json(F.col("key")).alias("key"),
        F.when(F.col("value").isNotNull(), F.to_json(body)).alias("value"),
        F.col("timestamp"),
        F.col("headers"),
        F.col("value.lsn").alias("offset"),
    )


def envelope_to_dms(
    env: DataFrame,
    *,
    schema_name: str = "engine",
    table: str | None = None,
    data_fields: list[str] | None = None,
) -> DataFrame:
    """Standard change envelope → AWS DMS (Kinesis/Kafka target) JSON
    (the inverse of :func:`envelope_from_dms`).

    Emission rules (DMS's documented shapes): op r→load, c→insert,
    u→update, d→delete; ``data`` = post-image (the deleted row for
    deletes — DMS's default task setting carries no before-images, so
    updates emit post-image only); ``metadata`` carries the ISO-8601
    timestamp (UTC, derived from ``ts_ms``), ``record-type='data'``,
    schema/table names and ``transaction-id`` = lsn. Tombstone records
    stay null-value records. Round-trips through
    ``envelope_from_dms`` (law-tested) modulo DMS's lossiness (no
    before-images, c/r distinction restored by the load mapping)."""
    vdt = env.schema["value"].dataType
    if data_fields is None:
        data_fields = [f.name for f in vdt["after"].dataType.fields]
    after, before = F.col("value.after"), F.col("value.before")
    op = F.col("value.op")
    oper = (
        F.when(op == "r", F.lit("load"))
        .when(op == "c", F.lit("insert"))
        .when(op == "u", F.lit("update"))
        .when(op == "d", F.lit("delete"))
    )
    image = F.when(op == "d", before).otherwise(after)
    kdt = env.schema["key"].dataType
    key_names = (
        {f.name for f in kdt.fields} if isinstance(kdt, T.StructType)
        else set()
    )
    data = F.struct(
        *[
            (
                F.coalesce(image.getField(f), F.col("key").getField(f))
                if f in key_names
                else image.getField(f)
            ).alias(f)
            for f in data_fields
        ]
    )
    tbl = F.lit(table) if table is not None else F.split(
        F.col("topic"), r"\."
    ).getItem(0)
    # date_format renders in the SESSION timezone; shifting the instant
    # by to_utc_timestamp(ts, current_timezone()) makes the rendered
    # wall time UTC whatever the session is set to (the 'Z' is honest)
    iso_ts = F.date_format(
        F.to_utc_timestamp(
            F.timestamp_millis(F.coalesce(F.col("value.ts_ms"), F.lit(0))),
            F.current_timezone(),
        ),
        "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'",
    )
    body = F.struct(
        data.alias("data"),
        F.struct(
            iso_ts.alias("timestamp"),
            F.lit("data").alias("record-type"),
            oper.alias("operation"),
            F.lit(schema_name).alias("schema-name"),
            tbl.alias("table-name"),
            F.col("value.lsn").alias("transaction-id"),
        ).alias("metadata"),
    )
    return env.select(
        F.col("topic"),
        F.col("partition"),
        F.to_json(F.col("key")).alias("key"),
        F.when(F.col("value").isNotNull(), F.to_json(body)).alias("value"),
        F.col("timestamp"),
        F.col("headers"),
        F.col("value.lsn").alias("offset"),
    )
