"""Collection registry — the engine's analog of the reference's
HlsCollection enum (constants.py:22-41): concept id, collection id,
and origin date per collection."""

from __future__ import annotations

import datetime as dt
from dataclasses import dataclass


@dataclass(frozen=True)
class Collection:
    name: str
    concept_id: str
    origin_date: dt.date

    @property
    def collection_id(self) -> str:
        return f"{self.name}_2.0"


#: concept ids and origin dates per the reference (constants.py:11-19)
COLLECTIONS = {
    "HLSL30": Collection("HLSL30", "C2021957657-LPCLOUD", dt.date(2013, 4, 11)),
    "HLSS30": Collection("HLSS30", "C2021957295-LPCLOUD", dt.date(2015, 11, 28)),
}
