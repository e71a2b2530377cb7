"""String / price cleaning expressions (F1-F3, F13-F14 in SURVEY.md §2.8).

Reference behavior (file:line cites are into /root/reference/
ETL-marketeye_airflow-main/):

- clean_price: scripts/data_processors/avito_extractor.py:197-231
  (`_extract_price_fixed`) — the European-format-aware variant, chosen
  as THE canonical price parser.  The simpler dags/marketeye_etl_dag.py:61-71
  variant mis-parses thousands separators ("13,875 DH" → 13.875); we do
  not replicate that bug (SURVEY §2.13).
- safe_string: scripts/data_processors/base_extractor.py:32-38.
- clean_model_name: scripts/data_processors/base_extractor.py:141-150.
- sentinel scrub: data/raw/clean_avito_data.py:5-35.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..config import NULL_SENTINELS


def safe_string(c: Column) -> Column:
    """None → '' ; anything else → its string form (F13)."""
    return F.coalesce(c.cast("string"), F.lit(""))


def scrub_sentinels(c: Column, sentinels: tuple[str, ...] = NULL_SENTINELS) -> Column:
    """Map dirty string sentinels ('NULL', 'NaN', …) and blanks to null (S3)."""
    s = F.upper(F.trim(c.cast("string")))
    return F.when(s.isin(*sentinels), F.lit(None).cast("string")).otherwise(c.cast("string"))


def clean_price(c: Column) -> Column:
    """Parse a scraped price string/number to MAD float (F2 semantics).

    Handles: "250 DH" → 250.0; "4.500,00" → 4500.0 (European);
    "1,200.50 MAD" → 1200.5 (Anglo); "4,500" → 4500.0 (comma-only:
    thousands); bare numerics pass through; unparseable → 0.0.

    Divergence from the reference (documented): when BOTH separators are
    present, avito_extractor.py:215-218 unconditionally treats '.' as
    thousands, so Anglo "1,200.50" parses as 1.2005.  We treat the
    LAST-occurring separator as the decimal point, which handles both
    formats; the European cases the reference targeted parse identically.
    """
    s = safe_string(c)
    stripped = F.regexp_replace(s, r"[^\d,.]", "")
    both = stripped.contains(",") & stripped.contains(".")
    comma_only = stripped.contains(",") & ~stripped.contains(".")
    # Length of text after the LAST occurrence — smaller means "occurs later".
    tail_comma = F.length(F.substring_index(stripped, ",", -1))
    tail_dot = F.length(F.substring_index(stripped, ".", -1))
    comma_is_decimal = both & (tail_comma < tail_dot)
    normalized = (
        F.when(comma_is_decimal, F.regexp_replace(F.regexp_replace(stripped, r"\.", ""), ",", "."))
        .when(both, F.regexp_replace(stripped, ",", ""))
        .when(comma_only, F.regexp_replace(stripped, ",", ""))
        .otherwise(stripped)
    )
    first_number = F.regexp_extract(normalized, r"(\d+\.?\d*)", 1)
    return F.coalesce(F.nullif(first_number, F.lit("")).cast("double"), F.lit(0.0))


def clean_model_name(c: Column) -> Column:
    """Non-alnum → space, collapse whitespace, uppercase; empty → Unknown (F14)."""
    cleaned = F.upper(
        F.trim(F.regexp_replace(F.regexp_replace(safe_string(c), r"[^a-zA-Z0-9\s]", " "), r"\s+", " "))
    )
    return F.when(cleaned == "", "Unknown").otherwise(cleaned)
