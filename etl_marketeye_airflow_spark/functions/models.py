"""Model extraction expressions (F6 in SURVEY.md §2.8).

Reference behavior (cites into /root/reference/ETL-marketeye_airflow-main/):
- model-field fast path + title regex cascade + meaningful-words fallback:
  scripts/data_processors/avito_extractor.py:147-195 (canonical semantics).
- base variant with Samsung-specific 'galaxy …' patterns:
  scripts/data_processors/base_extractor.py:53-87 (used by the Jumia path).

The ordered pattern cascade is expressed as ``coalesce(nullif(
regexp_extract(...)))`` — first pattern that matches wins, exactly like
the reference's loop-with-early-return.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .cleaning import safe_string

# Ordered title patterns (avito_extractor.py:167-173), applied to the
# UPPERCASED title with the brand substring removed.
_TITLE_PATTERNS = (
    r"([A-Z]+\s*\d+\s*[A-Z]*\s*\d*\s*[A-Z]*)",  # S24 ULTRA, 12T PRO
    r"(\d+\s*[A-Z]+\s*\d*)",                    # 12 PRO, 14 PLUS
    r"([A-Z]+\s*\d+)",                          # GALAXY S21, REDMI NOTE 12
    r"(\d+\s*[A-Z]{2,})",                       # 256GB, 512 GO
    r"([A-Z]{2,}\s*\d+)",                       # NOTE 10, TAB S9
)

# base_extractor.py:64-73 variants (lower-cased input).
_SAMSUNG_PATTERNS = (
    r"galaxy\s+([a-z]\d+\w*\s*\d*\w*)",
    r"([a-z]\d+\w*\s*\d*\w*)\s+",
)
_GENERIC_PATTERNS = (
    r"(\d+\s*go|\d+\s*gb)",
    r"(\d+\s*go\s+\d+\s*go\s+ram)",
    r"([a-z]+\s*\d+\w*)",
)

_MARKETING_WORDS = r"\b(ULTRA|PRO|PLUS|MAX|MINI|LITE)\b"


def _first_extract(text: Column, patterns) -> Column:
    """First non-empty regexp_extract over an ordered pattern list."""
    return F.coalesce(
        *[F.nullif(F.regexp_extract(text, p, 1), F.lit("")) for p in patterns],
        F.lit(None).cast("string"),
    )


def _collapse_upper(c: Column) -> Column:
    return F.upper(F.trim(F.regexp_replace(c, r"\s+", " ")))


def extract_model(title: Column, brand: Column, model_field: Column | None = None) -> Column:
    """F6, avito semantics: field → title-pattern cascade → first-words → Unknown."""
    # 1. model field fast path (sentinels treated as missing)
    if model_field is not None:
        mf = F.trim(model_field.cast("string"))
        field_ok = mf.isNotNull() & ~F.upper(mf).isin("", "NULL", "NONE", "UNKNOWN")
        cleaned_field = _collapse_upper(F.regexp_replace(F.upper(mf), r"[^\w\s]", " "))
        from_field = F.when(field_ok & (cleaned_field != ""), cleaned_field)
    else:
        from_field = F.lit(None).cast("string")

    # 2. title cascade on UPPER(title) minus the brand substring
    title_up = F.upper(safe_string(title))
    brand_known = brand.isNotNull() & (brand != "Unknown")
    scan_text = F.when(brand_known, F.replace(title_up, F.upper(brand), F.lit(""))).otherwise(title_up)
    raw_match = _first_extract(scan_text, _TITLE_PATTERNS)
    stripped = _collapse_upper(F.regexp_replace(raw_match, _MARKETING_WORDS, ""))
    from_title = F.when(raw_match.isNotNull() & (F.length(stripped) > 1), stripped)

    # 3. first ≤3 meaningful words (len>2, not pure digits) of the scan text
    words = F.slice(F.split(F.trim(scan_text), r"\s+"), 1, 3)
    meaningful = F.filter(words, lambda w: (F.length(w) > 2) & ~w.rlike(r"^\d+$"))
    joined = F.array_join(meaningful, " ")
    from_words = F.when(joined != "", F.upper(joined))

    return F.coalesce(from_field, from_title, from_words, F.lit("Unknown"))


def extract_model_from_title(title: Column, brand: Column) -> Column:
    """F6, base_extractor semantics (Jumia path): lowercase title minus brand,
    Samsung-specific patterns first for Samsung, then generic patterns."""
    t = F.lower(safe_string(title))
    b = F.lower(safe_string(brand))
    scan = F.trim(F.replace(t, b, F.lit("")))
    is_samsung = b.contains("samsung")
    samsung_first = _first_extract(scan, _SAMSUNG_PATTERNS + _GENERIC_PATTERNS)
    generic_only = _first_extract(scan, _GENERIC_PATTERNS)
    matched = F.when(is_samsung, samsung_first).otherwise(generic_only)
    model = _collapse_upper(matched)
    return F.when(safe_string(title) == "", "Unknown").otherwise(
        F.coalesce(F.nullif(model, F.lit("")), F.lit("Unknown"))
    )
