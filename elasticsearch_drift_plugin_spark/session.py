"""SparkSession factory with the engine's required settings.

UTC session time zone is load-bearing: the reference rounds exclusively in
UTC (time-zone support is stubbed out everywhere in the reference —
es-8.18.2 ProportionalSumAggregationBuilder.java:432-434), and the DuckDB
correctness oracle compares naive-UTC timestamps.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "spark-drift", cpus: int | None = None) -> SparkSession:
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(max(cpus, 4)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # Coalesce post-shuffle partitions by SIZE, not up to the cluster's
        # parallelism (the Spark tuning guide's recommended production
        # setting): at scale partitions stay ~advisory-size; on small inputs
        # it collapses near-empty shuffle tasks instead of scheduling
        # hundreds of them.
        .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .getOrCreate()
    )
