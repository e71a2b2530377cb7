"""Pure Column-expression builders (SURVEY.md §2.8, F1–F18).

Every function here returns a ``pyspark.sql.Column`` — composable,
Catalyst-visible, whole-stage-codegen-able.  NO Python UDFs: the
reference's ~450 LoC of row-at-a-time regex/fallback logic is
re-expressed as column algebra so predicate pushdown, pruning, and
codegen stay intact at 100 TB.
"""

from .cleaning import clean_model_name, clean_price, safe_string, scrub_sentinels
from .brands import normalize_brand, brand_from_text, extract_brand
from .models import extract_model, extract_model_from_title
from .ids import normalize_product_id, product_id
from .conditions import determine_condition
from .ratings import extract_rating
from .urls import build_avito_url

__all__ = [
    "brand_from_text",
    "build_avito_url",
    "clean_model_name",
    "clean_price",
    "determine_condition",
    "extract_brand",
    "extract_model",
    "extract_model_from_title",
    "extract_rating",
    "normalize_brand",
    "normalize_product_id",
    "product_id",
    "safe_string",
    "scrub_sentinels",
]
