#!/usr/bin/env python
"""Bare-Spark ceiling probe: scan + sha256 + aggregate over the SAME
generated events parquet, no engine code. Run once per parallelism:

    python BENCH/spark_scan_probe.py <cpus> <events_parquet_dir>

Prints one JSON line {"cpus": N, "rows_per_sec": R}. Used by
scaling.py to bound what ANY Spark job can show on this machine.
"""

from __future__ import annotations

import json
import sys
import time


def main() -> None:
    cpus = int(sys.argv[1])
    path = sys.argv[2]
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.files.maxPartitionBytes", "16m")
        .config("spark.sql.files.openCostInBytes", "1m")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    df = spark.read.parquet(path)
    n = df.count()
    t0 = time.perf_counter()
    df.select(
        F.sha2(F.coalesce(F.col("value.after.content"), F.lit("")), 256).alias("h")
    ).agg(F.count(F.lit(1)), F.min("h")).collect()
    t = time.perf_counter() - t0
    print(json.dumps({"cpus": cpus, "rows_per_sec": round(n / t)}))


if __name__ == "__main__":
    main()
