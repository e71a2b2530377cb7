"""Tolerant JSON ingestion (S1-S3 in SURVEY.md §2.1).

Reference behavior:
- S1 file discovery by filename substring patterns:
  config/pipeline_config.py:66-72 + plugins/marketeye_operators.py:84-100.
- S2 tolerant load: JSON-array files OR NDJSON, corrupt lines skipped,
  empty → []: dags/marketeye_etl_dag.py:33-59.
- S3 sentinel scrub: data/raw/clean_avito_data.py:5-35.

Spark mapping: path globs + ``mode=PERMISSIVE`` with a corrupt-record
column replace the per-line try/except; reading both layouts means one
pass with multiLine=False for NDJSON plus one with multiLine=True for
array files (selected per file by a cheap first-byte probe at driver
side — file *listing* is driver work in the reference too, and is O(#files),
not O(data)).
"""

from __future__ import annotations

import fnmatch
import os
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..config import SOURCE_PATTERNS

_CORRUPT = "_corrupt_record"


def discover_source_files(raw_dir: str, source: str) -> list[str]:
    """S1: filenames containing any of the source's patterns."""
    patterns = SOURCE_PATTERNS[source]
    out = []
    for p in sorted(Path(raw_dir).glob("*")):
        if p.is_file() and any(pat in p.name.lower() for pat in patterns):
            out.append(str(p))
    return out


def _looks_like_array(path: str, probe_bytes: int = 4096) -> bool:
    with open(path, "rb") as f:
        head = f.read(probe_bytes).lstrip()
    return head.startswith(b"[")


def read_json_tolerant(
    spark: SparkSession, paths: list[str], schema: T.StructType
) -> DataFrame:
    """S2/S3: read array-or-NDJSON files with corrupt rows dropped.

    The schema is augmented with a corrupt-record column; rows that fail
    to parse land there and are filtered out (same net effect as the
    reference's per-line try/except skip).
    """
    if not paths:
        return spark.createDataFrame([], schema)
    schema_with_corrupt = T.StructType(
        list(schema.fields) + [T.StructField(_CORRUPT, T.StringType(), True)]
    )
    array_files = [p for p in paths if _looks_like_array(p)]
    ndjson_files = [p for p in paths if p not in array_files]
    parts = []
    for files, multiline in ((array_files, True), (ndjson_files, False)):
        if files:
            parts.append(
                spark.read.schema(schema_with_corrupt)
                .option("multiLine", multiline)
                .option("mode", "PERMISSIVE")
                .option("columnNameOfCorruptRecord", _CORRUPT)
                .json(files)
            )
    df = parts[0]
    for p in parts[1:]:
        df = df.unionByName(p)
    # The corrupt-row filter also references a data column: Spark
    # disallows raw-JSON queries whose referenced columns are ONLY the
    # corrupt-record column (e.g. a bare .count() right after this
    # filter would throw).  For corrupt rows every data column is null,
    # so the extra isNotNull disjunct never changes the result.
    first_data = schema.fields[0].name
    keep = F.col(_CORRUPT).isNull() | F.col(first_data).isNotNull()
    return df.filter(keep).drop(_CORRUPT)


def read_source(
    spark: SparkSession, raw_dir: str, source: str, schema: T.StructType
) -> DataFrame:
    return read_json_tolerant(spark, discover_source_files(raw_dir, source), schema)
