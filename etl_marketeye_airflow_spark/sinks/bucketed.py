"""Bucketed-table sink/source: the repeated big-big join without the
repeated shuffle.

At 100 TB the orders⋈lineitem family re-shuffles both facts on every
run unless the tables are BUCKETED on the join key: bucketed scans
satisfy the join's required hash distribution directly, so the
sort-merge join runs with zero Exchange nodes, and point lookups on the
bucket key prune to 1/n_buckets of the files (SelectedBucketsCount).
`tests/test_bucketing.py` pins both properties through this API.

Spark constraint worth knowing: `bucketBy` requires `saveAsTable` (the
bucket spec lives in the catalog, not the parquet footer), so these are
catalog tables — pass `path` to control the storage location while
keeping the metadata.  Reading the files directly with
`spark.read.parquet` silently LOSES bucketing; always read back via the
table name (`read_bucketed`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int = 128,
    sort: bool = True,
    path: str | None = None,
) -> None:
    """Persist ``df`` bucketed (and per-bucket sorted) on ``key``.

    ``sort=True`` additionally sorts within buckets, which lets the
    sort-merge join skip the per-partition Sort too — the scan comes
    back join-ready.  Pick ``n_buckets`` for the TARGET cluster: a
    bucket is the unit of join parallelism forever after (128–4096 at
    100 TB; re-bucketing is a full rewrite).
    """
    writer = df.write.mode("overwrite").format("parquet").bucketBy(n_buckets, key)
    if sort:
        writer = writer.sortBy(key)
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table WITH its bucket metadata (a direct parquet
    read of the same files would silently drop it)."""
    return spark.table(table)
