"""Deterministic product-id expressions (F7-F8 in SURVEY.md §2.8).

Reference behavior (cites into /root/reference/ETL-marketeye_airflow-main/):
- base form '{brand}_{model}' with second-title-word fallback:
  scripts/data_processors/base_extractor.py:103-114.
- avito form with [a-z]+\\d+ token fallback then md5-of-title fallback:
  scripts/data_processors/avito_extractor.py:251-280.
- pre-merge re-normalization: dags/marketeye_etl_dag.py:645-650.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .cleaning import safe_string


def _alnum_lower(c: Column) -> Column:
    return F.regexp_replace(F.lower(safe_string(c)), r"[^a-z0-9]", "")


def product_id(brand: Column, model: Column, title: Column, *, avito: bool = False) -> Column:
    """F7: '{clean_brand}_{clean_model}' with unknown-model fallbacks.

    base semantics (avito=False): unknown model → second word of the
    alnum-spaced title.  avito semantics (avito=True): unknown model →
    first [a-z]+\\d+\\w* token of the lowercase title, else
    'title_' + md5(title)[:8].
    """
    clean_brand = _alnum_lower(brand)
    clean_model = _alnum_lower(model)
    unknown = clean_model == "unknown"

    if avito:
        token = F.nullif(
            F.regexp_extract(F.lower(safe_string(title)), r"\b([a-z]+\d+\w*)\b", 1), F.lit("")
        )
        md5_fallback = F.concat(F.lit("title_"), F.substring(F.md5(safe_string(title)), 1, 8))
        fallback = F.coalesce(token, md5_fallback)
    else:
        title_words = F.split(
            F.trim(F.regexp_replace(F.lower(safe_string(title)), r"[^a-z0-9]", " ")), r"\s+"
        )
        second_word = F.when(F.size(title_words) > 1, F.element_at(title_words, 2))
        fallback = F.coalesce(second_word, F.lit("unknown"))

    model_part = F.when(unknown, fallback).otherwise(clean_model)
    return F.concat_ws("_", clean_brand, model_part)


def normalize_product_id(pid: Column) -> Column:
    """F8: lowercase + spaces→underscores, applied before the merge groupBy."""
    return F.regexp_replace(F.lower(F.trim(safe_string(pid))), r"\s+", "_")
