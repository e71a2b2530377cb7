"""Per-source raw→master-schema projections (P1-P3 in SURVEY.md §2.2).

Each adapter is a pure DataFrame transform: raw source DF in, master-schema
DF out (one product row per raw record, single-offer array).  All logic is
Column expressions from ``functions/`` — the whole projection stays inside
whole-stage codegen.
"""

from .avito import transform_avito
from .jumia import transform_jumia
from .electroplanet import transform_electroplanet

ADAPTERS = {
    "avito": transform_avito,
    "jumia": transform_jumia,
    "electroplanet": transform_electroplanet,
}

__all__ = ["ADAPTERS", "transform_avito", "transform_electroplanet", "transform_jumia"]
