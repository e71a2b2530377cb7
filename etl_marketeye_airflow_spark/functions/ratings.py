"""Rating extraction (F10 in SURVEY.md §2.8).

Reference behavior: scripts/data_processors/jumia_extractor.py:56-78 —
'4.5 out of 5' / '4.5/5' / bare decimal → float; missing → 0.0.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .cleaning import safe_string


def extract_rating(rating: Column) -> Column:
    s = safe_string(rating)
    out_of = F.nullif(F.regexp_extract(s, r"(\d+\.?\d*)\s*out of\s*\d+", 1), F.lit(""))
    slash = F.nullif(F.regexp_extract(s, r"(\d+\.?\d*)\s*/\s*\d+", 1), F.lit(""))
    bare = F.nullif(F.regexp_extract(s, r"(\d+\.?\d*)", 1), F.lit(""))
    return F.coalesce(
        F.coalesce(out_of, slash, bare).cast("double"),
        F.lit(0.0),
    )
