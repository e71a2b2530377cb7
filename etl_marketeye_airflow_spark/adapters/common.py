"""Shared helpers for master-schema assembly."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..schemas import MASTER_SCHEMA, OFFER_SCHEMA

# Offer fields in schema order; adapters supply a dict of the ones they
# have and the rest become typed nulls.
_OFFER_FIELDS = [f.name for f in OFFER_SCHEMA.fields]


def build_offer(**fields: Column) -> Column:
    """Assemble one offer struct with nulls for absent per-source fields."""
    cols = []
    for f in OFFER_SCHEMA.fields:
        c = fields.get(f.name)
        if c is None:
            c = F.lit(None).cast(f.dataType)
        cols.append(c.cast(f.dataType).alias(f.name))
    return F.struct(*cols)


def build_metadata(source: str, scraped_at: Column | None = None) -> Column:
    """metadata struct; created/updated stamped from the batch clock.

    The reference stamps datetime.now() per row (non-deterministic);
    the engine uses current_timestamp() — constant-folded per query,
    deterministic within a run (SURVEY §7.3 determinism note).
    """
    ts = F.date_format(F.current_timestamp(), "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")
    return F.struct(
        F.array(F.lit(source)).alias("sources"),
        ts.alias("created_at"),
        ts.alias("last_updated"),
    )


def finalize_master(df: DataFrame) -> DataFrame:
    """Project to exact master-schema column order/types.

    P4/P6 (drop rows without product_id) is an INVARIANT here, not a
    filter: adapter ids come from concat_ws over never-empty brand/model
    parts, so they cannot be null or ''.  Do NOT add a filter on the
    derived id — predicate pushdown substitutes the whole id→model→brand
    expression tree into the predicate (measured: a 1.5 MB Filter node,
    ~30× plan blowup).  External master-doc ingestion must filter null
    ids at its own scan, where the predicate is a cheap column ref.
    """
    cols = [F.col(f.name).cast(f.dataType).alias(f.name) for f in MASTER_SCHEMA.fields]
    return df.select(*cols)
