"""Jumia adapter (P2): raw marketplace products → master schema.

Reference: scripts/data_processors/jumia_extractor.py:15-54 (transform).
Condition is constant 'new' (canonical lowercase — the class variant's
'Neuf' casing is a reference inconsistency we don't replicate, SURVEY §2.13).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import (
    clean_price,
    extract_model_from_title,
    extract_rating,
    normalize_brand,
    product_id,
)
from ..functions.specs import jumia_dict_specs, jumia_text_specs, merge_spec_maps
from .common import build_metadata, build_offer, finalize_master


def transform_jumia(raw: DataFrame) -> DataFrame:
    # Staged columns to avoid expression-tree duplication (see avito.py).
    staged = (
        raw.withColumn("_brand", normalize_brand(raw["brand"]))
        .withColumn("_model", extract_model_from_title(raw["title"], F.col("_brand")))
        .withColumn("_pid", product_id(F.col("_brand"), F.col("_model"), raw["title"]))
    )
    brand, model, pid = F.col("_brand"), F.col("_model"), F.col("_pid")
    raw = staged

    offer = build_offer(
        source=F.lit("Jumia"),
        price=clean_price(raw["price"]),
        original_price=clean_price(raw["old_price"]),
        currency=F.lit("MAD"),
        condition=F.lit("new"),
        rating=extract_rating(raw["rating"]),
        reviews_count=raw["reviews_count_text"],
        url=raw["product_url"],
        scraped_at=raw["scraped_at"],
    )

    # text-extracted specs win over dict-scanned ones only where absent:
    # reference populates text specs first, then overwrites from the dict
    # (jumia_extractor.py:80-109) — so dict entries take precedence.
    specs = merge_spec_maps(jumia_dict_specs(raw["specs"]), jumia_text_specs(raw["title"], raw["description"]))

    return finalize_master(
        raw.select(
            pid.alias("product_id"),
            brand.alias("brand"),
            model.alias("model"),
            F.trim(F.coalesce(raw["title"], F.lit(""))).alias("product_name"),
            F.lit("Smartphone").alias("category"),
            specs.alias("specifications"),
            F.array(offer).alias("offers"),
            build_metadata("Jumia").alias("metadata"),
        )
    )
