"""Chain compiler — declarative SMT chain spec -> one composed plan.

The reference declares chains in connector properties
(``transforms=a,b`` + per-alias config — IntegrationTest.java:222-229)
and folds them per record (SURVEY.md §3). Here a chain is a list of
stage specs; compilation validates every config eagerly (the
``configure()`` analog) and composition is plain function composition
over DataFrames, so Catalyst's CollapseProject / PushDownPredicates /
whole-stage codegen fuse the entire chain into ONE pass (SURVEY.md §4.2)
— there is no per-stage materialization.

Spec form (reference property names, dots allowed):

    Chain([
        {"type": "filter_by_field_value", "field.name": "op",
         "field.value": "r", "field.value.matches": False},
        {"type": "hash", "field.name": "content", "function": "sha256"},
        {"type": "tombstone_handler", "behavior": "drop_warn"},
    ])

Run modes: ``chain(df)`` returns the transformed DataFrame with the
error column still attached; ``chain.run(df)`` enforces the batch-fail
contract (raise on first per-record error) and strips it.
"""

from __future__ import annotations

from typing import Callable, Iterable, Mapping, Union

from pyspark.sql import DataFrame

from transforms_for_apache_kafka_connect_spark.errors import ConfigException
from transforms_for_apache_kafka_connect_spark.operators.base import (
    STAGE_REGISTRY,
    Stage,
)
from transforms_for_apache_kafka_connect_spark.record import enforce, ensure_error_col

StageSpec = Union[Stage, Mapping, Callable[[DataFrame], DataFrame]]


def _pythonize_key(key: str) -> str:
    return key.replace(".", "_").replace("-", "_")


def build_stage(spec: Mapping) -> Stage:
    """Instantiate a registered stage from a reference-style config dict.

    Connect predicate guards ride the same spec (``predicate`` =
    predicate config dict or instance, ``negate`` = bool), exactly like
    ``transforms.X.predicate`` / ``transforms.X.negate`` in connector
    properties; the stage is wrapped so it applies only to matching
    rows (operators/predicates.py).
    """
    spec = dict(spec)
    type_name = spec.pop("type", None)
    predicate = spec.pop("predicate", None)
    negate = bool(spec.pop("negate", False))
    if type_name not in STAGE_REGISTRY:
        raise ConfigException(
            f"Unknown transform type: {type_name!r}. "
            f"Known: {sorted(STAGE_REGISTRY)}"
        )
    kwargs = {_pythonize_key(k): v for k, v in spec.items()}
    try:
        stage = STAGE_REGISTRY[type_name](**kwargs)
    except TypeError as exc:  # unknown config key -> config error, not a crash
        raise ConfigException(f"Invalid config for transform {type_name!r}: {exc}") from exc
    if predicate is not None:
        from transforms_for_apache_kafka_connect_spark.operators.predicates import (
            Guarded,
        )

        return Guarded(stage, predicate, negate=negate)
    return stage


class Chain:
    """Validated, composed SMT chain (config errors raise at build time)."""

    def __init__(self, specs: Iterable[StageSpec]):
        self.stages: list[Callable[[DataFrame], DataFrame]] = []
        for spec in specs:
            if isinstance(spec, Stage):
                self.stages.append(spec)
            elif isinstance(spec, Mapping):
                self.stages.append(build_stage(spec))
            elif callable(spec):
                self.stages.append(spec)
            else:
                raise ConfigException(f"Invalid stage spec: {spec!r}")

    def apply(self, df: DataFrame) -> DataFrame:
        df = ensure_error_col(df)
        for stage in self.stages:
            df = stage(df)
        return df

    __call__ = apply

    def run(self, df: DataFrame) -> DataFrame:
        """Apply + enforce the reference's fail-on-first-record contract."""
        return enforce(self.apply(df))
