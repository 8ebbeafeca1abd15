"""Debezium-compat transforms: ExtractNewRecordState (envelope unwrap)
and the outbox EventRouter.

The reference ships a Debezium ``CustomConverter`` (MoneyConverter,
reference debezium/converters/MoneyConverter.java:27-64) and pins its
filter semantics on a Debezium change-event envelope
(FilterByFieldValueTest.java:237-278: ``{before, after, source, op,
ts_ms, transaction}``), so real chains built on the reference sit
behind Debezium connectors. These two stages are the Debezium SMTs
those chains use most (public semantics per the Debezium docs for
``io.debezium.transforms.ExtractNewRecordState`` and
``io.debezium.transforms.outbox.EventRouter``):

* ``extract_new_record_state`` — flatten the envelope to the row state:
  value <- ``after`` for create/update/snapshot-read; deletes follow
  ``delete.handling.mode``:
    - ``drop``: delete events removed from the stream;
    - ``none`` (tombstone): delete becomes a tombstone (value = null) —
      feeds MakeTombstone/TombstoneHandler/the merge's delete path;
    - ``rewrite``: value <- ``before`` state plus a ``__deleted``
      string field ("true"; non-deletes get "false").
  ``drop.tombstones`` (default true) drops pre-existing tombstones.
  ``add.fields`` copies envelope/source metadata (e.g. "op,ts_ms,
  source.lsn") into the flattened value as ``__op``/``__source_lsn``
  (``add.fields.prefix``, default "__"); ``add.headers`` does the same
  into the record headers. ``route.by.field`` re-routes topic by a
  field of the flattened state.

* ``event_router`` — transactional-outbox routing over the UNWRAPPED
  outbox row (chain it after extract_new_record_state, which is what
  Debezium's EventRouter does internally): topic <-
  ``route.topic.replacement`` with ``${routedByValue}`` substituted by
  the ``route.by.field`` column (default ``aggregatetype``), key <-
  ``table.field.event.key`` (default ``aggregateid``), value <- the
  ``table.field.event.payload`` column (default ``payload``), optional
  record timestamp from ``table.field.event.timestamp``; a null/empty
  payload becomes a tombstone when
  ``route.tombstone.on.empty.payload`` is set.

Spark-first: both are pure Column expressions over the envelope —
the whole unwrap+route chain stays one Catalyst plan, no UDFs.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from transforms_for_apache_kafka_connect_spark.errors import (
    ConfigException,
    DataException,
)
from transforms_for_apache_kafka_connect_spark.operators.base import (
    Stage,
    is_struct,
    parse_list,
    place_type,
    project_to_struct,
    register,
    struct_field_type,
    struct_has_field,
    template_concat,
)
from transforms_for_apache_kafka_connect_spark.record import keep_rows, merge_error

_DELETE_MODES = ("drop", "none", "rewrite")


@register("extract_new_record_state")
@dataclass
class ExtractNewRecordState(Stage):
    """Debezium ExtractNewRecordState (envelope unwrap)."""

    #: this mutator can also DROP rows (tombstones, delete events) —
    #: the predicate-guard when-merge cannot restore dropped rows, so
    #: Guarded refuses it (operators/predicates.py)
    drops_rows = True

    delete_handling_mode: str = "none"
    drop_tombstones: bool = True
    add_fields: list[str] | str | None = None
    add_fields_prefix: str = "__"
    add_headers: list[str] | str | None = None
    add_headers_prefix: str = "__"
    route_by_field: str | None = None

    def __post_init__(self):
        if self.delete_handling_mode not in _DELETE_MODES:
            raise ConfigException(
                f"Invalid value {self.delete_handling_mode} for configuration "
                f"delete.handling.mode: String must be one of: "
                f"{', '.join(_DELETE_MODES)}"
            )
        self.add_fields = parse_list(self.add_fields) or []
        self.add_headers = parse_list(self.add_headers) or []

    def _meta(self, value: Column, dt: T.StructType, path: str) -> Column:
        """Envelope/source metadata column for add.fields/add.headers."""
        if not struct_has_field(dt, path):
            raise DataException(
                f"{path} is not a valid field name"
            )
        out = value
        for part in path.split("."):
            out = out.getField(part)
        return out

    def apply(self, df: DataFrame) -> DataFrame:
        dt = place_type(df, "value")
        if not is_struct(dt):
            raise DataException(
                "ExtractNewRecordState requires a Debezium envelope STRUCT "
                f"value: {dt.simpleString()}"
            )
        for required in ("op", "after"):
            if required not in dt.fieldNames():
                raise DataException(
                    f"Expected Debezium envelope with '{required}' field, "
                    f"got: {dt.simpleString()}"
                )
        value = F.col("value")
        op = value.getField("op")
        is_delete = value.isNotNull() & F.coalesce(
            op == F.lit("d"), F.lit(False)
        )

        # a non-tombstone envelope with a null op is malformed — error
        # the record (batch-fail gate) instead of silently dropping it
        # (drop mode) or emitting a spurious tombstone (none mode)
        df = merge_error(
            df,
            value.isNotNull() & op.isNull(),
            F.lit(
                "Debezium envelope record has null 'op' — cannot unwrap"
            ),
        )

        if self.drop_tombstones:
            df = keep_rows(df, F.col("value").isNotNull())

        if self.delete_handling_mode == "drop":
            df = keep_rows(df, F.col("value").isNull() | ~is_delete)

        # flattened state: after for c/u/r; rewrite mode resurrects the
        # before image for deletes
        after_t = struct_field_type(dt, "after")
        if not isinstance(after_t, T.StructType):
            raise DataException(
                f"Envelope 'after' must be STRUCT, got: {after_t.simpleString()}"
            )
        state = value.getField("after")
        if self.delete_handling_mode == "rewrite":
            if "before" in dt.fieldNames() and isinstance(
                struct_field_type(dt, "before"), T.StructType
            ):
                before = value.getField("before")
                # project before -> after field shape (missing = null)
                state = F.when(is_delete, project_to_struct(before,
                    struct_field_type(dt, "before"), after_t)).otherwise(state)
            deleted = F.when(is_delete, F.lit("true")).otherwise(F.lit("false"))
            state = state.withField("__deleted", deleted)
        extras: list[tuple[str, Column]] = []
        for path in self.add_fields:
            name = self.add_fields_prefix + path.replace(".", "_")
            extras.append((name, self._meta(value, dt, path)))
        for name, expr in extras:
            state = state.withField(name, expr)

        new_value = state
        if self.delete_handling_mode == "none":
            # delete -> tombstone (downstream TombstoneHandler / merge
            # delete path consumes it)
            new_value = F.when(~is_delete, state)
        new_value = F.when(F.col("value").isNotNull(), new_value)
        out = df.withColumn("__unwrapped", new_value)

        if self.add_headers:
            empty = F.create_map().cast("map<string,string>")
            headers = F.coalesce(F.col("headers"), empty)

            def drop_key(h):
                return lambda k, _v: k != F.lit(h)

            for path in self.add_headers:
                name = self.add_headers_prefix + path.replace(".", "_")
                hval = self._meta(value, dt, path).cast("string")
                headers = F.when(
                    F.col("value").isNotNull() & hval.isNotNull(),
                    F.map_concat(
                        F.map_filter(headers, drop_key(name)),
                        F.create_map(F.lit(name), hval),
                    ),
                ).otherwise(headers)
            out = out.withColumn("headers", headers)

        out = out.withColumn("value", F.col("__unwrapped")).drop("__unwrapped")
        if self.route_by_field:
            if self.route_by_field not in after_t.fieldNames():
                raise DataException(
                    f"Unknown field: {self.route_by_field}"
                )
            routed = F.col("value").getField(self.route_by_field).cast("string")
            out = out.withColumn(
                "topic", F.coalesce(routed, F.col("topic"))
            )
        return out


@register("event_router")
@dataclass
class EventRouter(Stage):
    """Debezium outbox EventRouter over the unwrapped outbox row."""

    route_by_field: str = "aggregatetype"
    route_topic_replacement: str = "outbox.event.${routedByValue}"
    table_field_event_key: str = "aggregateid"
    table_field_event_payload: str = "payload"
    table_field_event_timestamp: str | None = None
    route_tombstone_on_empty_payload: bool = False

    def apply(self, df: DataFrame) -> DataFrame:
        dt = place_type(df, "value")
        if not is_struct(dt):
            raise DataException(
                f"EventRouter requires a STRUCT outbox row: {dt.simpleString()}"
            )
        for f in (self.route_by_field, self.table_field_event_key,
                  self.table_field_event_payload):
            if f not in dt.fieldNames():
                raise DataException(f"Unknown field: {f}")
        value = F.col("value")
        routed = value.getField(self.route_by_field).cast("string")
        topic = template_concat(
            self.route_topic_replacement, {"routedByValue": routed}
        )

        key = F.struct(
            value.getField(self.table_field_event_key).alias("id")
        )
        payload = value.getField(self.table_field_event_payload)
        if self.route_tombstone_on_empty_payload:
            payload_t = struct_field_type(dt, self.table_field_event_payload)
            empty = payload.isNull()
            if isinstance(payload_t, T.StringType):
                empty = empty | (payload == F.lit(""))
            new_value = F.when(~empty, payload)
        else:
            new_value = payload

        out = (
            df.withColumn("topic", F.when(value.isNotNull(), topic)
                          .otherwise(F.col("topic")))
            .withColumn("key", F.when(value.isNotNull(), key))
            .withColumn("__routed_value", F.when(value.isNotNull(), new_value))
        )
        if self.table_field_event_timestamp:
            if self.table_field_event_timestamp not in dt.fieldNames():
                raise DataException(
                    f"Unknown field: {self.table_field_event_timestamp}"
                )
            ts_src = value.getField(self.table_field_event_timestamp)
            ts_t = struct_field_type(dt, self.table_field_event_timestamp)
            # envelope timestamps are epoch MILLIS: cast(timestamp as
            # long) would yield seconds — 1000x off — so temporal
            # columns go through unix_millis
            if isinstance(ts_t, (T.TimestampType, T.TimestampNTZType)):
                ts = F.unix_millis(ts_src.cast("timestamp"))
            else:
                ts = ts_src.cast("long")
            out = out.withColumn(
                "timestamp", F.coalesce(ts, F.col("timestamp"))
            )
        return out.withColumn("value", F.col("__routed_value")).drop(
            "__routed_value"
        )
