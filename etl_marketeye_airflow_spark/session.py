"""SparkSession factory.

Local mode is a single JVM with N executor threads; on a real cluster the
same code runs unchanged — every knob here is either scale-neutral (AQE,
Arrow, UTC) or derived from the environment.  See SURVEY.md §4 for what we
rely on Catalyst for (pushdown, pruning, join planning, codegen, AQE skew
handling) and therefore must not defeat with UDFs or driver-side loops.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))


def get_spark(
    app_name: str = "marketeye-spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    - AQE on: runtime partition coalescing + skew-join handling. The
      reference data is skewed (one product group held 995 of 25,558
      offers — SURVEY.md §4); at 100 TB the same shape needs AQE or
      manual salting, so it is on everywhere, tests included.
    - ``spark.sql.shuffle.partitions`` defaults to ~cores locally; on a
      cluster AQE coalesces from this initial number, so oversizing is
      cheap and undersizing is not — callers can raise it via the arg.
    - UTC session timezone so timestamp semantics match the DuckDB
      oracle (naive-UTC) used by the correctness gate.
    """
    cpus = cpus or default_parallelism()
    shuffle = shuffle_partitions or max(cpus, 4)
    builder = (
        SparkSession.builder.master(os.environ.get("SPARK_MASTER", f"local[{cpus}]"))
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
