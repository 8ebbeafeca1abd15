"""PySpark-native CDC ingest engine with the transform capabilities of
Aiven's transforms-for-apache-kafka-connect SMT catalog.

Brand-new Spark-first design (NOT a port): every SMT is a declarative
``Stage`` compiling to Catalyst Column expressions over a change-event
envelope DataFrame; chains fuse into one plan; the replay loop applies
micro-batches through LWW dedupe into a key-partitioned lake table with
an exactly-once commit ledger.

Reference behavior studied at /root/reference (Aiven-Open/
transforms-for-apache-kafka-connect); file:line citations in each
operator docstring point at the behavior being reproduced.
"""

from transforms_for_apache_kafka_connect_spark.errors import (
    ConfigException,
    DataException,
)
from transforms_for_apache_kafka_connect_spark.record import (
    ENVELOPE_COLUMNS,
    ERROR_COL,
    envelope,
)
from transforms_for_apache_kafka_connect_spark.plans.chain import Chain, build_stage
from transforms_for_apache_kafka_connect_spark.plans.properties import (
    chain_from_properties,
)

__all__ = [
    "ConfigException",
    "DataException",
    "ENVELOPE_COLUMNS",
    "ERROR_COL",
    "envelope",
    "Chain",
    "chain_from_properties",
    "build_stage",
]

__version__ = "0.1.0"
