"""Electroplanet adapter (P3): raw retailer products → master schema.

Reference: scripts/data_processors/electroplanet_extractor.py:14-55 —
the nested-struct source: model from specifications['Modèle'], rating
and review count from reviews_summary.{average_rating,total_reviews},
French spec-key translation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import clean_price, extract_model_from_title, normalize_brand, product_id
from ..functions.specs import electroplanet_specs
from .common import build_metadata, build_offer, finalize_master


def transform_electroplanet(raw: DataFrame) -> DataFrame:
    # Staged columns to avoid expression-tree duplication (see avito.py).
    spec_model = F.nullif(F.trim(F.element_at(raw["specifications"], F.lit("Modèle"))), F.lit(""))
    staged = (
        raw.withColumn("_brand", normalize_brand(raw["brand"]))
        .withColumn(
            "_model",
            F.coalesce(spec_model, extract_model_from_title(raw["name"], F.col("_brand"))),
        )
        .withColumn("_pid", product_id(F.col("_brand"), F.col("_model"), raw["name"]))
    )
    brand, model, pid = F.col("_brand"), F.col("_model"), F.col("_pid")
    raw = staged

    offer = build_offer(
        source=F.lit("Electroplanet"),
        price=clean_price(raw["price"]),
        original_price=clean_price(raw["old_price"]),
        currency=F.lit("MAD"),
        condition=F.lit("new"),
        rating=raw["reviews_summary"]["average_rating"],
        reviews_count=raw["reviews_summary"]["total_reviews"].cast("string"),
        url=raw["product_url"],
        scraped_at=F.coalesce(raw["detailed_scraped_at"], raw["scraped_at"]),
    )

    return finalize_master(
        raw.select(
            pid.alias("product_id"),
            brand.alias("brand"),
            model.alias("model"),
            F.trim(F.coalesce(raw["name"], F.lit(""))).alias("product_name"),
            F.lit("Smartphone").alias("category"),
            electroplanet_specs(raw["specifications"]).alias("specifications"),
            F.array(offer).alias("offers"),
            build_metadata("Electroplanet").alias("metadata"),
        )
    )
