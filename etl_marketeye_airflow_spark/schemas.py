"""Explicit StructTypes for raw sources and the unified master product.

The reference's schema is implicit (dict .get() defaulting everywhere);
the engine makes it explicit so scans prune columns and never infer on
100 TB inputs.  Master schema contract: SURVEY.md §1.3, derived from
scripts/data_processors/base_extractor.py:17-30 and the three transform
functions in dags/marketeye_etl_dag.py (:316-341, :451-472, :585-606).
"""

from __future__ import annotations

from pyspark.sql import types as T


def _s(name: str) -> T.StructField:
    return T.StructField(name, T.StringType(), True)


# --- raw per-source schemas (dirty scraped fields stay strings) -----------

AVITO_RAW_SCHEMA = T.StructType(
    [
        _s("ad_id"),
        _s("title"),
        _s("description"),
        _s("price"),
        _s("city"),
        _s("area"),
        _s("seller_type"),
        _s("seller_name"),
        _s("category"),
        _s("url"),
        _s("list_time"),
        _s("brand"),
        _s("model"),
        _s("storage"),
        _s("ram"),
        _s("battery_health"),
        _s("color"),
        _s("condition"),
    ]
)

JUMIA_RAW_SCHEMA = T.StructType(
    [
        _s("title"),
        _s("brand"),
        _s("price"),
        _s("old_price"),
        _s("rating"),
        _s("reviews_count_text"),
        _s("product_url"),
        _s("scraped_at"),
        _s("description"),
        T.StructField("specs", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

ELECTROPLANET_RAW_SCHEMA = T.StructType(
    [
        _s("name"),
        _s("brand"),
        _s("price"),
        _s("old_price"),
        _s("product_url"),
        _s("scraped_at"),
        _s("detailed_scraped_at"),
        T.StructField("specifications", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField(
            "reviews_summary",
            T.StructType(
                [
                    T.StructField("average_rating", T.DoubleType(), True),
                    T.StructField("total_reviews", T.LongType(), True),
                ]
            ),
            True,
        ),
        T.StructField("is_promotion", T.BooleanType(), True),
    ]
)

# --- unified master schema --------------------------------------------------

LOCATION_SCHEMA = T.StructType([_s("city"), _s("area")])

OFFER_SCHEMA = T.StructType(
    [
        _s("source"),
        T.StructField("price", T.DoubleType(), True),
        T.StructField("original_price", T.DoubleType(), True),
        _s("currency"),
        _s("condition"),
        _s("seller_type"),
        _s("seller_name"),
        T.StructField("location", LOCATION_SCHEMA, True),
        T.StructField("rating", T.DoubleType(), True),
        _s("reviews_count"),
        _s("url"),
        _s("scraped_at"),
    ]
)

METADATA_SCHEMA = T.StructType(
    [
        T.StructField("sources", T.ArrayType(T.StringType()), True),
        _s("created_at"),
        _s("last_updated"),
    ]
)

MASTER_SCHEMA = T.StructType(
    [
        _s("product_id"),
        _s("brand"),
        _s("model"),
        _s("product_name"),
        _s("category"),
        T.StructField("specifications", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("offers", T.ArrayType(OFFER_SCHEMA), True),
        T.StructField("metadata", METADATA_SCHEMA, True),
    ]
)

# Flat relational projection: one row per offer (SURVEY §1.1 "relational
# projection"; dags/marketeye_etl_dag.py:871-907 products/offers split).
OFFER_FLAT_COLUMNS = [
    "product_id",
    "brand",
    "model",
    "product_name",
    "source",
    "price",
    "original_price",
    "currency",
    "condition",
    "seller_type",
    "seller_name",
    "city",
    "area",
    "rating",
    "reviews_count",
    "url",
    "scraped_at",
]
