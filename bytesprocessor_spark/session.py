"""SparkSession factory with scale-appropriate defaults.

The reference hand-rolls its executor (spawn pool, manual chunking,
``gc.collect()`` — BytesProcessor.py:62-94,132-135); on Spark all of
that is the scheduler's job.  The only knobs that matter are the ones
set here: AQE (runtime re-plan + skew-join), Arrow for the Python
boundary, UTC so results are oracle-comparable, and shuffle
parallelism sized to cores instead of the 200 default.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "bytesprocessor-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession tuned for this engine.

    In local mode the shuffle-partition count defaults to the core
    count — at cluster scale you would size it so post-shuffle
    partitions land near 128-256 MB (AQE coalescing then adjusts at
    runtime, so over-provisioning is safe).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus) if cpus.isdigit() else 32

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        # no \r progress frames on the console: harness tail-captures
        # stdout/stderr and carriage-return frames corrupt the capture
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
