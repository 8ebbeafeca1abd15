"""Runnable demo: sketch-backed observability rollups + streaming
near-dup screening over one CDC replay.

- TimeRollup with HLL distinct + KLL quantile columns: "distinct
  committers and p95 content length per hour", maintained from each
  commit's changelog, exact under the recompute retraction policy.
- NearDupIndex: "is this incoming doc a near-dup of anything already
  ingested" as one equi-join per batch.

Run: python examples/observability.py
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from transforms_for_apache_kafka_connect_spark.plans.chain import Chain
from transforms_for_apache_kafka_connect_spark.streaming import (
    LakeTable,
    NearDupIndex,
    Replayer,
    TimeRollup,
)

HOUR = 3_600_000
BASE = 1_600_000_000_000 - (1_600_000_000_000 % 86_400_000)

_VAL = T.StructType([
    T.StructField("author", T.StringType()),
    T.StructField("text", T.StringType()),
    T.StructField("n_chars", T.DoubleType()),
    T.StructField("ts_ms", T.LongType()),
])
_ENV = T.StructType([
    T.StructField("topic", T.StringType(), False),
    T.StructField("partition", T.IntegerType(), False),
    T.StructField("key", T.StructType([T.StructField("doc_id", T.LongType())])),
    T.StructField("value", T.StructType([
        T.StructField("op", T.StringType()),
        T.StructField("lsn", T.LongType()),
        T.StructField("ts_ms", T.LongType()),
        T.StructField("before", _VAL),
        T.StructField("after", _VAL),
    ])),
    T.StructField("timestamp", T.LongType()),
    T.StructField("headers", T.MapType(T.StringType(), T.StringType())),
])


def main() -> None:
    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    tmp = tempfile.mkdtemp(prefix="tkc_obs_")

    # synthetic doc ingest: 300 docs over 6 hours, 12 authors, a few
    # texts repeated near-verbatim
    rows = []
    for i in range(300):
        text = f"shared boilerplate header words {i % 25} " + (
            "lorem ipsum dolor sit amet " * (2 + i % 3)
        )
        rows.append((
            "docs", 0, (i,),
            ("c", i + 1, BASE + (i % 6) * HOUR + i,
             None, (f"author{i % 12}", text, float(len(text)),
                    BASE + (i % 6) * HOUR + i)),
            i + 1, None,
        ))
    env = spark.createDataFrame(rows, _ENV)

    table = LakeTable(f"{tmp}/docs", key_cols=["doc_id"], n_buckets=4,
                      merge_strategy="broadcast", changelog=True,
                      discovery=False)
    roll = TimeRollup(
        root=f"{tmp}/roll", time_col="ts_ms",
        granularities=["1 hour"], sum_cols=["n_chars"],
        distinct_cols=["author"], quantile_cols=["n_chars"],
        on_retraction="recompute",
    )
    index = NearDupIndex(root=f"{tmp}/idx", num_hashes=32, bands=16)
    rep = Replayer(table=table, chain=Chain([]), epoch="obs",
                   maintain=[*roll.specs, index])
    rep.replay(env, batch_width=100, start_pos=0, max_pos=301)

    print("per-hour: rows, distinct authors, p50/p95 content length")
    hourly = roll.read(
        spark, "1 hour", quantiles={"n_chars": [0.5, 0.95]}
    ).orderBy("bucket_ms")
    for r in hourly.collect():
        print(f"  {r.bucket_ms}: n={r.n_rows} "
              f"authors={r.approx_distinct_author} "
              f"p50={r.p50_n_chars:.0f} p95={r.p95_n_chars:.0f}")
    assert hourly.count() == 6

    # incoming batch: 2 near-clones of ingested docs + 1 novel doc
    incoming = spark.createDataFrame(
        [
            (9001, rows[7][3][4][1] + " trailing tweak"),
            (9002, rows[130][3][4][1]),
            (9003, "completely novel content with unique vocabulary " * 3),
        ],
        "doc_id long, text string",
    )
    dups = index.near_dups_of(spark, incoming, threshold=0.6).orderBy(
        "query_id", "corpus_id"
    )
    hits = dups.collect()
    print(f"near-dup screening: {len(hits)} candidate dups")
    for r in hits[:5]:
        print(f"  new doc {r.query_id} ~ ingested {r.corpus_id} "
              f"(est jaccard {r.est_jaccard})")
    assert {r.query_id for r in hits} >= {9001, 9002}
    assert all(r.query_id != 9003 for r in hits)

    spark.stop()
    print("OK")


if __name__ == "__main__":
    main()
