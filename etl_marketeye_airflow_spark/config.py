"""Canonical mapping tables for the normalization expressions.

The reference carries several near-duplicate copies of these tables with
divergent entries (see SURVEY.md §2.13).  The engine fixes ONE canonical
version of each and documents the divergences it resolves:

- brand mapping: union of config/pipeline_config.py:22-34 and the DAG /
  avito-extractor tables.  Conflict resolved: HONOR → 'Honor'
  (dags/marketeye_etl_dag.py:83) — NOT 'Huawei' (avito_extractor.py:102).
- condition mapping: avito_extractor.py:291-298 semantics, matched
  longest-key-first so 'comme neuf' → 'like new' wins over 'neuf' → 'new'
  (the DAG's dict-order variant hits 'neuf' first — a reference bug we
  do not replicate).
- ordering matters everywhere: first match wins, mirroring the
  reference's ordered-dict iteration.
"""

from __future__ import annotations

# (substring-to-find-in-lowercased-input, canonical brand) — first match wins.
# From config/pipeline_config.py:22-34 (incl. typo keys samsng/samsuung/
# hauwei) + title-scan extras GALAXY/PIXEL (avito_extractor.py:121-132).
BRAND_MAPPING: tuple[tuple[str, str], ...] = (
    ("samsung", "Samsung"),
    ("samsng", "Samsung"),
    ("samsuung", "Samsung"),
    ("apple", "Apple"),
    ("iphone", "Apple"),
    ("huawei", "Huawei"),
    ("hauwei", "Huawei"),
    ("xiaomi", "Xiaomi"),
    ("redmi", "Xiaomi"),
    ("poco", "Xiaomi"),
    ("oppo", "Oppo"),
    ("realme", "Realme"),
    ("nokia", "Nokia"),
    ("tecno", "Tecno"),
    ("infinix", "Infinix"),
    ("vivo", "Vivo"),
    ("honor", "Honor"),
    ("oneplus", "OnePlus"),
    ("motorola", "Motorola"),
    ("moto", "Motorola"),
    ("google", "Google"),
    ("pixel", "Google"),
    ("sony", "Sony"),
    ("lg", "LG"),
)

# Extra patterns only valid when scanning a product TITLE (not a brand
# field): 'galaxy' implies Samsung (avito_extractor.py:123).
TITLE_BRAND_MAPPING: tuple[tuple[str, str], ...] = (("galaxy", "Samsung"),) + BRAND_MAPPING

# (substring, canonical condition) — matched longest-key-first.
# From avito_extractor.py:291-298.
CONDITION_MAPPING: tuple[tuple[str, str], ...] = tuple(
    sorted(
        [
            ("neuf", "new"),
            ("new", "new"),
            ("nouveau", "new"),
            ("bon", "good"),
            ("good", "good"),
            ("excellent", "good"),
            ("moyen", "fair"),
            ("fair", "fair"),
            ("acceptable", "fair"),
            ("mauvais", "poor"),
            ("poor", "poor"),
            ("endommagé", "poor"),
            ("comme neuf", "like new"),
            ("like new", "like new"),
            ("refurbished", "refurbished"),
            ("reconditionné", "refurbished"),
        ],
        key=lambda kv: -len(kv[0]),
    )
)

# Filename substrings per source (config/pipeline_config.py:66-72).
SOURCE_PATTERNS: dict[str, list[str]] = {
    "jumia": ["jumia", "android", "product"],
    "electroplanet": ["electroplanet", "electro"],
    "avito": ["avito", "ads"],
}

# Electroplanet French spec keys → canonical (electroplanet_extractor.py:62-71).
ELECTROPLANET_SPEC_MAPPING: dict[str, str] = {
    "Capacité de stockage interne": "storage",
    "Capacité de la RAM": "ram",
    "Marque": "brand",
    "Modèle": "model",
    "Résolution de la caméra arrière (numerique)": "camera",
    "Famille de processeur": "processor",
    "Afficher le nom du marketing technologique": "screen_tech",
    "Écran Gorilla Glass": "gorilla_glass",
}

# String sentinels treated as null in dirty scraped fields
# (avito_extractor.py:94, :151; clean_avito_data.py:11-23).
NULL_SENTINELS: tuple[str, ...] = ("", "NULL", "NONE", "NAN", "INCONNU", "UNKNOWN")
