"""Stage protocol + struct/map dual-regime helpers.

A ``Stage`` is the engine's equivalent of the reference's
``Transformation<R>`` plugin (configure/apply — ExtractTopic.java:59-70):
config is validated eagerly in ``__init__`` (raising ``ConfigException``
before any data, like ``configure()``), and ``apply`` is a pure
``DataFrame -> DataFrame`` built from Column expressions so Catalyst
fuses a whole chain into one plan (SURVEY.md §3, §4.2).

Dual regimes (SURVEY.md §1.2): a stage inspects the Spark type of its
place column — ``StructType`` == reference schema-ful path,
``MapType`` == reference schemaless path — and reproduces each path's
semantics (missing-field handling, blank-vs-empty checks).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from transforms_for_apache_kafka_connect_spark.errors import ConfigException

# registry: config "type" name -> Stage subclass (chain compiler uses it)
STAGE_REGISTRY: dict[str, type] = {}


def register(name: str):
    def deco(cls):
        STAGE_REGISTRY[name] = cls
        cls.type_name = name
        return cls

    return deco


@dataclass
class Stage:
    """Base: subclasses set ``place`` ('key'|'value') and implement apply."""

    type_name = "stage"
    #: True for stages that only drop rows / record errors (row-local
    #: predicates) — they commute with LWW winner selection, so the
    #: engine may run them before dedupe and defer mutator stages to the
    #: (much smaller) winner set (engine.py lww pushdown)
    is_row_filter = False

    def apply(self, df: DataFrame) -> DataFrame:  # pragma: no cover - abstract
        raise NotImplementedError

    def __call__(self, df: DataFrame) -> DataFrame:
        return self.apply(df)


def require(cond: bool, msg: str) -> None:
    if not cond:
        raise ConfigException(msg)


# --- Kafka AbstractConfig/ConfigDef message parity -------------------
# The reference's config classes surface Kafka's standard ConfigDef
# errors; these helpers reproduce them byte-identically (asserted
# against HashConfigTest.java:33-37, ExtractTimestampConfigTest.java:
# 31-44, ConcatFieldsConfigTest.java:36-49, TombstoneHandlerConfigTest,
# ExtractTopicFromSchemaNameConfigTest in tests/test_config_parity.py).

def missing_required(name: str) -> None:
    """Kafka ConfigDef NO_DEFAULT_VALUE error."""
    raise ConfigException(
        f'Missing required configuration "{name}" which has no default value.'
    )


def invalid_value(name: str, value, reason: str) -> None:
    """Kafka ConfigException(name, value, reason) message format.
    Note the double space for empty values — Kafka interpolates the
    value verbatim."""
    raise ConfigException(f"Invalid value {value} for configuration {name}: {reason}")


def parse_list(value) -> list[str] | None:
    """Kafka ConfigDef.Type.LIST parse: None stays None (missing),
    '' -> [] (empty list is VALID for a required LIST — reference
    ConcatFieldsConfigTest.java:44-49 expects the error to come from
    the NEXT missing key), 'a,b' -> ['a','b']."""
    if value is None or isinstance(value, list):
        return value
    if isinstance(value, str):
        return [] if value == "" else [s.strip() for s in value.split(",")]
    return list(value)


def new_observation(stage: "Stage"):
    """Fresh Observation for this apply() call (Observations are
    single-action objects), remembered on the stage so the engine can
    read drop/route/mutate metrics after the batch action
    (north_star: transform-level metrics ride the SAME job — no extra
    pass)."""
    import uuid

    from pyspark.sql import Observation

    obs = Observation(f"{stage.observe_name}_{uuid.uuid4().hex[:8]}")
    stage.last_observation = obs
    return obs


def observe_metric(stage: "Stage", df: DataFrame, cond, metric: str) -> DataFrame:
    """Attach a transform-level counter (north_star drop/route/mutate
    metrics) when the stage has an ``observe_name``; rides the batch's
    one action — no extra job."""
    if not getattr(stage, "observe_name", None):
        return df
    return df.observe(
        new_observation(stage),
        F.sum(F.when(cond, 1).otherwise(0)).alias(metric),
    )


def place_type(df: DataFrame, place: str) -> T.DataType:
    """DataType of the key/value envelope column."""
    return df.schema[place].dataType


def is_struct(dt: T.DataType) -> bool:
    return isinstance(dt, T.StructType)


def is_map(dt: T.DataType) -> bool:
    return isinstance(dt, T.MapType)


def struct_has_field(dt: T.StructType, field: str) -> bool:
    """Field presence; supports dotted nested paths ('after.content') —
    an engine extension beyond the reference's flat structs."""
    cur: T.DataType = dt
    for part in field.split("."):
        if not isinstance(cur, T.StructType) or part not in cur.fieldNames():
            return False
        cur = cur[part].dataType
    return True


def struct_field_type(dt: T.StructType, field: str) -> T.DataType:
    cur: T.DataType = dt
    for part in field.split("."):
        cur = cur[part].dataType  # type: ignore[index]
    return cur


def get_field(col: Column, dt: T.DataType, field: str) -> Column:
    """Field access in either regime.

    struct: ``col.field`` (schema-checked by caller; dotted paths
    descend); map: ``element_at`` (missing key -> null, matching
    schemaless Map.get).
    """
    if is_map(dt):
        return F.element_at(col, F.lit(field))
    out = col
    for part in field.split("."):
        out = out.getField(part)
    return out


def set_field(col: Column, dt: T.DataType, field: str, expr: Column) -> Column:
    """Field update/append in either regime, null-input-safe.

    struct: ``withField`` (appends if absent — schema widening, like
    ConcatFields.java:75,109); map: rebuild with the key overridden.
    """
    if is_map(dt):
        val = expr.cast(dt.valueType)
        cleaned = F.map_filter(col, lambda k, _v: k != F.lit(field))
        # map_concat propagates null input -> null output (tombstone-safe)
        return F.map_concat(cleaned, F.create_map(F.lit(field), val))
    # withField propagates null struct -> null struct (tombstone-safe)
    return col.withField(field, expr)


# Spark type -> Connect Schema.Type name, for reference-parity messages
_CONNECT_TYPE = {
    T.ByteType: "INT8",
    T.ShortType: "INT16",
    T.IntegerType: "INT32",
    T.LongType: "INT64",
    T.FloatType: "FLOAT32",
    T.DoubleType: "FLOAT64",
    T.BooleanType: "BOOLEAN",
    T.StringType: "STRING",
    T.StructType: "STRUCT",
    T.MapType: "MAP",
    T.ArrayType: "ARRAY",
    T.BinaryType: "BYTES",
    T.TimestampType: "Timestamp",
}


def connect_type_name(dt: T.DataType) -> str:
    return _CONNECT_TYPE.get(type(dt), dt.simpleString().upper())


SUPPORTED_SCALAR_TYPES = (
    T.ByteType,
    T.ShortType,
    T.IntegerType,
    T.LongType,
    T.FloatType,
    T.DoubleType,
    T.BooleanType,
    T.StringType,
)


def align_to_type(
    old: Column, old_dt: T.DataType, new_dt: T.DataType, *, context: str
) -> Column:
    """Rebuild ``old`` in the shape of ``new_dt`` — only for WIDENING
    changes (new struct ⊇ old struct fields, recursively; or an atomic
    -> atomic cast). A narrowing change (field dropped) or a
    struct<->atomic replacement cannot be merged row-conditionally
    without corrupting the rows that keep the old value, so it raises
    ``ConfigException`` at plan time instead of silently losing data.
    """
    if old_dt == new_dt:
        return old
    if isinstance(old_dt, T.StructType) and isinstance(new_dt, T.StructType):
        new_names = set(new_dt.fieldNames())
        dropped = [n for n in old_dt.fieldNames() if n not in new_names]
        if dropped:
            raise ConfigException(
                f"{context}: stage narrows the struct (drops fields "
                f"{dropped}) — a conditional merge would silently lose "
                f"those fields on non-matching rows"
            )
        old_names = set(old_dt.fieldNames())
        parts = []
        for f in new_dt.fields:
            if f.name in old_names:
                parts.append(
                    align_to_type(
                        old.getField(f.name),
                        old_dt[f.name].dataType,
                        f.dataType,
                        context=context,
                    ).alias(f.name)
                )
            else:
                parts.append(F.lit(None).cast(f.dataType).alias(f.name))
        # null struct in -> null struct out (tombstone-safe)
        return F.when(old.isNotNull(), F.struct(*parts))
    atomic = (
        T.StringType, T.BooleanType, T.ByteType, T.ShortType,
        T.IntegerType, T.LongType, T.FloatType, T.DoubleType,
        T.DecimalType, T.TimestampType, T.DateType,
    )
    if isinstance(old_dt, atomic) and isinstance(new_dt, atomic):
        return old.cast(new_dt)
    raise ConfigException(
        f"{context}: stage replaces column type "
        f"{old_dt.simpleString()} with {new_dt.simpleString()} — "
        f"cannot merge conditionally"
    )


def project_to_struct(
    col: Column, src: T.StructType, dst: T.StructType
) -> Column:
    """Rebuild ``col`` (src struct) in dst's field shape: shared fields
    copied (cast as needed), dst-only fields null, src-only fields
    DROPPED (intentional — e.g. a Debezium before-image projected into
    the after-image shape). For the strict widening-only variant used
    by conditional merges, see ``align_to_type``."""
    src_names = set(src.fieldNames())
    parts = []
    for f in dst.fields:
        if f.name in src_names:
            parts.append(col.getField(f.name).cast(f.dataType).alias(f.name))
        else:
            parts.append(F.lit(None).cast(f.dataType).alias(f.name))
    return F.when(col.isNotNull(), F.struct(*parts))


def template_concat(template: str, placeholders: dict[str, Column]) -> Column:
    """``"a.${x}.b"``-style format string -> one ``concat`` Column,
    substituting each ``${name}`` with its Column (shared by
    TimestampRouter and the outbox EventRouter)."""
    parts: list[Column] = []
    rest = template
    while rest:
        hits = [
            (rest.find("${" + name + "}"), name)
            for name in placeholders
            if rest.find("${" + name + "}") >= 0
        ]
        if not hits:
            parts.append(F.lit(rest))
            break
        idx, name = min(hits)
        if idx > 0:
            parts.append(F.lit(rest[:idx]))
        parts.append(placeholders[name])
        rest = rest[idx + len("${" + name + "}"):]
    return F.concat(*parts) if parts else F.lit("")


def parse_typed_literal(s: str) -> Column:
    """Typed parse of a config string, like ``Values.parseString``
    (reference FilterByFieldValue.java:83: "42" parses to a numeric and
    equals a byte-42 payload per FilterByFieldValueTest.java:211-226).

    Spark's numeric type coercion on ``col == lit(x)`` then reproduces
    the typed-equality semantics.
    """
    low = s.strip().lower()
    if low in ("true", "false"):
        return F.lit(low == "true")
    try:
        return F.lit(int(s))
    except ValueError:
        pass
    try:
        return F.lit(float(s))
    except ValueError:
        pass
    return F.lit(s)
