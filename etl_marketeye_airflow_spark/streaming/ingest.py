"""Structured Streaming ingestion (SURVEY.md §2.9 upgrade path).

The reference has ZERO streaming operators — its daily full-recompute
with overwrite sinks is the batch equivalent of a Trigger.AvailableNow
run.  These are the idiomatic streaming upgrades (extension, not parity):

- ``stream_etl_available_now``: file-source stream over a raw dir →
  the SAME adapter expressions → foreachBatch full-merge overwrite.
  Catches up on whatever files landed, then stops — exactly the daily
  cadence, but incremental-file-discovery and restartable via the
  checkpoint.  The merge stays a full groupBy per batch because the
  reference's merge semantics are global (last write wins).
- ``windowed_event_counts``: watermarked tumbling-window counts over an
  event stream — the standard late-data-tolerant aggregation shape
  (1 shuffle per window; state bounded by the watermark).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..adapters import transform_avito, transform_electroplanet, transform_jumia
from ..operators.merge import merge_products, union_sources
from ..schemas import AVITO_RAW_SCHEMA, ELECTROPLANET_RAW_SCHEMA, JUMIA_RAW_SCHEMA


def stream_etl_available_now(
    spark: SparkSession,
    raw_dir: str,
    out_path: str,
    checkpoint_dir: str,
    staged_path: str | None = None,
):
    """Incremental file ingestion → cumulative merge → overwrite.

    Each micro-batch APPENDS its adapter output to ``staged_path``
    (default: ``<checkpoint_dir>/_staged``) and then re-merges the FULL
    staged set into ``out_path``.  Merging only the batch and
    overwriting would silently drop products from earlier batches/runs
    (a restart with new files would wipe history).  foreachBatch retries
    may append a batch twice — harmless: the merge dedups offers on
    (product_id, source, url, price), so the pipeline is idempotent.

    Returns the started StreamingQuery (AvailableNow: runs to catch-up
    then finishes; call .awaitTermination()).
    """
    staged = staged_path or f"{checkpoint_dir.rstrip('/')}/_staged"
    streams = []
    for schema, transform, glob in (
        (AVITO_RAW_SCHEMA, transform_avito, "*avito*"),
        (JUMIA_RAW_SCHEMA, transform_jumia, "*jumia*"),
        (ELECTROPLANET_RAW_SCHEMA, transform_electroplanet, "*electro*"),
    ):
        # Streaming file source reads NDJSON only (one record per line) —
        # the standard landing format for continuously-arriving scrapes.
        # Array-layout files belong to the batch path (json_source.py
        # probes per file; a stream can't).  Corrupt lines are dropped
        # via the corrupt-record column, same as batch S2.
        schema_c = T.StructType(
            list(schema.fields) + [T.StructField("_corrupt_record", T.StringType(), True)]
        )
        raw = (
            spark.readStream.schema(schema_c)
            .option("pathGlobFilter", glob)
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", "_corrupt_record")
            .json(raw_dir)
            .filter(F.col("_corrupt_record").isNull())
            .drop("_corrupt_record")
        )
        streams.append(transform(raw))
    unioned = union_sources(*streams)

    def write_batch(batch_df: DataFrame, epoch_id: int) -> None:
        batch_df.write.mode("append").parquet(staged)
        merge_products(batch_df.sparkSession.read.parquet(staged)).write.mode(
            "overwrite"
        ).json(out_path)

    return (
        unioned.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def windowed_event_counts(
    events_stream: DataFrame,
    window_duration: str = "1 hour",
    watermark_delay: str = "10 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    """Watermarked tumbling-window counts per event_type.

    State is bounded: windows older than the watermark are finalized and
    evicted — the scale-safe shape for infinite streams.
    """
    return (
        events_stream.withWatermark(ts_col, watermark_delay)
        .groupBy(F.window(F.col(ts_col), window_duration), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("total_value"),
        )
        .select(
            F.date_format("window.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )
