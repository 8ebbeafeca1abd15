"""ReplaceField — stock Kafka Connect SMT compatibility
(org.apache.kafka.connect.transforms.ReplaceField): drop, keep, or
rename fields of the key/value.

Like the RegexRouter compat stage, this exists because the reference's
integration chains freely mix Aiven SMTs with stock ones
(IntegrationTest.java:226-229) — a user switching to this engine keeps
their whole chain. Stock semantics:

* ``exclude``: listed fields are dropped;
* ``include``: when non-empty, ONLY listed fields are kept (applied
  after exclude);
* ``renames``: "old:new" pairs applied to the surviving fields;
* field order is preserved (struct regime); unknown names are ignored.

Spark mapping: one struct rebuild / map transform per record place —
pure Column expressions, fused by Catalyst with the rest of the chain.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from transforms_for_apache_kafka_connect_spark.errors import ConfigException
from transforms_for_apache_kafka_connect_spark.operators.base import (
    Stage,
    is_map,
    is_struct,
    parse_list,
    place_type,
    register,
    require,
)


def _parse_renames(spec) -> dict[str, str]:
    if not spec:
        return {}
    if isinstance(spec, dict):
        return dict(spec)
    out: dict[str, str] = {}
    for pair in parse_list(spec) or []:
        if ":" not in pair:
            raise ConfigException(
                f"Invalid rename mapping: {pair} (format: oldName:newName)"
            )
        k, v = pair.split(":", 1)
        out[k] = v
    return out


@register("replace_field")
@dataclass
class ReplaceField(Stage):
    exclude: list[str] | str | None = None
    include: list[str] | str | None = None
    renames: dict[str, str] | list[str] | str | None = field(default=None)
    place: str = "value"

    def __post_init__(self):
        self.exclude = parse_list(self.exclude) or []
        self.include = parse_list(self.include) or []
        self._renames = _parse_renames(self.renames)
        require(self.place in ("key", "value"), "place must be key or value")

    def _keep(self, name: str) -> bool:
        if name in self.exclude:
            return False
        return not self.include or name in self.include

    def apply(self, df: DataFrame) -> DataFrame:
        dt = place_type(df, self.place)
        col = F.col(self.place)
        if is_struct(dt):
            fields = [
                (f.name, self._renames.get(f.name, f.name))
                for f in dt.fields
                if self._keep(f.name)
            ]
            # struct() on zero fields is invalid; an all-dropped value
            # becomes a null struct<> placeholder column
            if not fields:
                new = F.lit(None).cast("struct<__empty:string>")
            else:
                new = F.struct(
                    *[col.getField(src).alias(dst) for src, dst in fields]
                )
                # null input (tombstone) stays null
                new = F.when(col.isNotNull(), new)
            return df.withColumn(self.place, new)
        if is_map(dt):
            kept = F.map_filter(col, lambda k, _v: self._map_keep(k))
            if self._renames:
                mapping = F.create_map(
                    *[F.lit(x) for kv in self._renames.items() for x in kv]
                )
                kept = F.map_from_entries(
                    F.transform(
                        F.map_entries(kept),
                        lambda e: F.struct(
                            F.coalesce(mapping[e["key"]], e["key"]).alias("key"),
                            e["value"].alias("value"),
                        ),
                    )
                )
            return df.withColumn(self.place, kept)
        return df  # scalar place: nothing to replace

    def _map_keep(self, k):
        cond = F.lit(True)
        if self.exclude:
            cond = cond & ~k.isin(*self.exclude)
        if self.include:
            cond = cond & k.isin(*self.include)
        return cond
