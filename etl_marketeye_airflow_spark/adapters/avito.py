"""Avito adapter (P1): raw classified ads → master schema.

Reference: scripts/data_processors/avito_extractor.py:19-84 (transform) —
the regex-heaviest source: brand/model fallback chains, condition map,
URL rebuild, direct-field specs.  Cites per expression in functions/.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import (
    build_avito_url,
    clean_price,
    determine_condition,
    extract_brand,
    extract_model,
    product_id,
)
from ..functions.specs import avito_specs
from .common import build_metadata, build_offer, finalize_master


def transform_avito(raw: DataFrame) -> DataFrame:
    # Stage brand → model → id as real columns: each step references the
    # previous ATTRIBUTE, not a copy of its expression tree.  Inlining
    # these (one giant select) duplicates the brand CASE-chain into every
    # consumer and blows the plan to megabytes — Catalyst analysis time
    # then dominates.  CollapseProject keeps non-cheap, multi-referenced
    # aliases staged, so this also holds in the optimized plan.
    staged = (
        raw.withColumn("_brand", extract_brand(raw["brand"], raw["title"], raw["model"]))
        .withColumn("_model", extract_model(raw["title"], F.col("_brand"), raw["model"]))
        .withColumn("_pid", product_id(F.col("_brand"), F.col("_model"), raw["title"], avito=True))
    )
    brand, model, pid = F.col("_brand"), F.col("_model"), F.col("_pid")
    raw = staged

    offer = build_offer(
        source=F.lit("Avito"),
        price=clean_price(raw["price"]),
        currency=F.lit("MAD"),
        condition=determine_condition(raw["condition"], default="used"),
        seller_type=F.coalesce(raw["seller_type"], F.lit("PRIVATE")),
        seller_name=F.coalesce(raw["seller_name"], F.lit("")),
        location=F.struct(
            F.coalesce(raw["city"], F.lit("")).alias("city"),
            F.coalesce(raw["area"], F.lit("")).alias("area"),
        ),
        url=build_avito_url(raw["url"], raw["ad_id"]),
        scraped_at=raw["list_time"],
    )

    return finalize_master(
        raw.select(
            pid.alias("product_id"),
            brand.alias("brand"),
            model.alias("model"),
            F.trim(F.coalesce(raw["title"], F.lit(""))).alias("product_name"),
            F.lit("Smartphone").alias("category"),
            avito_specs(
                raw["storage"], raw["ram"], raw["battery_health"], raw["color"], raw["condition"]
            ).alias("specifications"),
            F.array(offer).alias("offers"),
            build_metadata("Avito").alias("metadata"),
        )
    )
