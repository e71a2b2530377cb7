"""URL building (F15 in SURVEY.md §2.8).

Reference behavior: scripts/data_processors/avito_extractor.py:306-316 —
keep url if it contains 'avito.ma', else build from ad_id, else homepage.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def build_avito_url(url: Column, ad_id: Column) -> Column:
    u = url.cast("string")
    aid = F.trim(ad_id.cast("string"))
    return (
        F.when(u.isNotNull() & u.contains("avito.ma"), u)
        .when(aid.isNotNull() & (aid != ""), F.concat(F.lit("https://www.avito.ma/vi/"), aid, F.lit(".htm")))
        .otherwise(F.lit("https://www.avito.ma/"))
    )
