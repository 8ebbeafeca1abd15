"""Hash — replace a whole STRING key/value or a STRING field with the
lowercase-hex md5/sha1/sha256 digest of its UTF-8 bytes.

Reference: Hash.java:40-244 + utils/Hex.java:19-35. Semantics:
* digest of ``string.getBytes()`` (Hash.java:161-165); we pin UTF-8
  (SURVEY.md §2.2.1) which is what Spark's md5/sha1/sha2 hash;
* lowercase hex (Hex.java:26-34) — Spark md5/sha1/sha2 are already
  lowercase hex, golden values in HashTest.java:43-65 match;
* whole-place path requires STRING type (Hash.java:142-147);
* named-field path requires STRUCT/MAP place (:99) and STRING field
  (:117-121); missing schema field -> skip or error (:108-115);
* null value/field -> skip (pass through) or per-record error
  (:125-131,149-157) per ``skip.missing.or.null`` (HashConfig.java).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from transforms_for_apache_kafka_connect_spark.errors import DataException
from transforms_for_apache_kafka_connect_spark.operators.base import (
    Stage,
    connect_type_name,
    get_field,
    is_map,
    is_struct,
    invalid_value,
    missing_required,
    place_type,
    register,
    require,
    set_field,
    struct_has_field,
)
from transforms_for_apache_kafka_connect_spark.record import merge_error

HASH_FUNCTIONS = ("md5", "sha1", "sha256")


def digest(col: Column, function: str) -> Column:
    if function == "md5":
        return F.md5(col)
    if function == "sha1":
        return F.sha1(col)
    return F.sha2(col, 256)


@register("hash")
@dataclass
class Hash(Stage):
    function: str | None = None
    field_name: str | None = None
    skip_missing_or_null: bool = False
    place: str = "value"
    #: optional metrics name: observes `mutated` = #rows hashed
    observe_name: str | None = None

    def __post_init__(self):
        # HashConfig.java:56-65: function is required (NO_DEFAULT) with a
        # ValidString(md5, sha1, sha256) validator; messages byte-match
        # Kafka's ConfigDef (HashConfigTest.java:33-37)
        if self.function is None:
            missing_required("function")
        if self.function not in HASH_FUNCTIONS:
            invalid_value(
                "function", self.function,
                f"String must be one of: {', '.join(HASH_FUNCTIONS)}",
            )
        # empty field.name counts as absent (HashConfigTest emptyFieldName)
        if not self.field_name:
            self.field_name = None
        require(self.place in ("key", "value"), "place must be key or value")

    def apply(self, df: DataFrame) -> DataFrame:
        dt = place_type(df, self.place)
        col = F.col(self.place)
        if not self.field_name:
            if not isinstance(dt, T.StringType):
                raise DataException(
                    f"{self.place} schema type must be STRING: {connect_type_name(dt)}"
                )
            if not self.skip_missing_or_null:
                df = merge_error(
                    df, col.isNull(), F.lit(f"{self.place} can't be null: <record>")
                )
            from transforms_for_apache_kafka_connect_spark.operators.base import (
                observe_metric,
            )

            df = observe_metric(self, df, col.isNotNull(), "mutated")
            return df.withColumn(
                self.place, F.when(col.isNotNull(), digest(col, self.function)).otherwise(col)
            )

        if is_struct(dt):
            if not struct_has_field(dt, self.field_name):
                if self.skip_missing_or_null:
                    return df
                raise DataException(
                    f"{self.field_name} in {self.place} schema can't be missing: <record>"
                )
            from transforms_for_apache_kafka_connect_spark.operators.base import (
                struct_field_type,
            )

            fdt = struct_field_type(dt, self.field_name)
            if not isinstance(fdt, T.StringType):
                raise DataException(
                    f"{self.field_name} schema type in {self.place} must be STRING: "
                    f"{connect_type_name(fdt)}"
                )
        elif not is_map(dt):
            raise DataException(
                f"{self.place} schema type must be STRUCT if field name is specified: "
                f"{connect_type_name(dt)}"
            )

        fval = get_field(col, dt, self.field_name)
        if not self.skip_missing_or_null:
            df = merge_error(
                df,
                col.isNotNull() & fval.isNull(),
                F.lit(f"{self.field_name} in {self.place} can't be null: <record>"),
            )
        from transforms_for_apache_kafka_connect_spark.operators.base import (
            observe_metric,
        )

        df = observe_metric(self, df, fval.isNotNull(), "mutated")
        hashed = digest(fval.cast("string"), self.function)
        if is_map(dt):
            # don't add the key to a map when it's missing/null (skip path)
            new_col = F.when(
                fval.isNotNull(), set_field(col, dt, self.field_name, hashed)
            ).otherwise(col)
        else:
            new_col = set_field(
                col, dt, self.field_name,
                F.when(fval.isNotNull(), hashed).otherwise(fval.cast("string")),
            )
        return df.withColumn(self.place, new_col)
