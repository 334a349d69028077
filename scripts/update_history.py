#!/usr/bin/env python
"""Merge a driver CORRECTNESS_r{N}.json into CHECKED_HISTORY.json.

The driver's correctness gate only verifies the first 50 registry
entries per round, so the registry rotates unchecked queries into the
window each round (see queries/__init__.py). This script records which
queries were checked / passed in a given round so the rotation knows
what still needs a green row.

Usage: python scripts/update_history.py CORRECTNESS_r01.json 1
"""

from __future__ import annotations

import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
HIST_PATH = os.path.join(ROOT, "CHECKED_HISTORY.json")


def main() -> None:
    corr_path, round_no = sys.argv[1], int(sys.argv[2])
    with open(corr_path) as f:
        corr = json.load(f)
    hist: dict[str, dict] = {}
    if os.path.exists(HIST_PATH):
        with open(HIST_PATH) as f:
            hist = json.load(f)

    for name, row in corr.items():
        ent = hist.setdefault(name, {"checked": [], "green": []})
        if round_no not in ent["checked"]:
            ent["checked"].append(round_no)
        # rows-only checks report rows_match only; full checks need all
        # three. err==None plus no explicit False counts as green.
        ok = row.get("err") is None and all(
            v is not False
            for v in (row.get("rows_match"), row.get("schema_match"),
                      row.get("hash_match"))
        )
        if ok and round_no not in ent["green"]:
            ent["green"].append(round_no)

    with open(HIST_PATH, "w") as f:
        json.dump(hist, f, indent=1, sort_keys=True)
    n_green = sum(1 for e in hist.values() if e["green"])
    print(f"history: {len(hist)} checked ever, {n_green} green ever")


if __name__ == "__main__":
    main()
