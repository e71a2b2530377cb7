"""Parquet table loaders for the driver's synthetic star schema.

Tables (TESTDATA.md): region nation customer supplier part orders lineitem
events documents embeddings — one parquet file each under an sf dir.

Reads are plain ``spark.read.parquet`` so Catalyst keeps predicate pushdown
and column pruning; do NOT cache here — callers decide persistence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events with its TIMESTAMP(NANOS) column made usable.

    Spark 4 rejects parquet nano timestamps outright; with
    ``spark.sql.legacy.parquet.nanosAsLong`` (runtime-settable) the
    column reads as nanos-since-epoch LONG.  We expose ``ts_us``
    (integer microseconds, exact) — event-time queries should compare
    integers, matching DuckDB's ``epoch_us(ts)`` bit-for-bit; float
    epochs differ from DuckDB in sub-microsecond rounding.
    """
    from pyspark.sql import functions as F

    # The conf is captured at DataFrame-CREATION time (verified: actions
    # on the returned df succeed after restore), so restore immediately —
    # leaking it would silently change nano-timestamp parquet reads for
    # every later query on the shared driver session (convention #5).
    prev = spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", None)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    try:
        df = spark.read.parquet(f"{sf_dir}/events.parquet")
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
        else:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", prev)
    return df.withColumn("ts_us", F.expr("ts div 1000"))


EVENTS_STREAM_SCHEMA = (
    "event_id long, ts long, user_id long, event_type string,"
    " value double, props string"
)


def load_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of load_events: the nano-timestamp events table as
    a file stream, with ``_t`` (TIMESTAMP, µs precision) ready for
    watermarks/windows and ``ts_us`` (integer µs) for exact arithmetic.

    One definition for the schema string and the nanosAsLong
    save/restore dance — q31/q63/q65-style streaming queries must not
    each carry their own copy that can drift.
    """
    from pyspark.sql import functions as F

    prev = spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", None)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    try:
        df = (
            spark.readStream.schema(EVENTS_STREAM_SCHEMA)
            .option("pathGlobFilter", "events.parquet")  # file source needs a DIR
            .parquet(sf_dir)
        )
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
        else:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", prev)
    return df.withColumn("ts_us", F.expr("ts div 1000")).withColumn(
        "_t", F.timestamp_micros(F.expr("ts div 1000"))
    )


def load_tables(spark: SparkSession, sf_dir: str, names=TABLES) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names}


def register_views(spark: SparkSession, sf_dir: str, names=TABLES) -> None:
    for n in names:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)
