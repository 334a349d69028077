#!/usr/bin/env python
"""Merge a driver CORRECTNESS_r{N}.json into CHECKED_HISTORY.json.

The driver's correctness gate only verifies the first 50 registry
entries per round, so the registry rotates unchecked queries into the
window each round (see queries/__init__.py). This script records which
queries were checked / passed in a given round so the rotation knows
what still needs a green row.

Usage: python scripts/update_history.py CORRECTNESS_r01.json 1
       python scripts/update_history.py          # fold ALL CORRECTNESS_r*.json
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
HIST_PATH = os.path.join(ROOT, "CHECKED_HISTORY.json")


def _fold(hist: dict, corr: dict, round_no: int) -> None:
    for name, row in corr.items():
        ent = hist.setdefault(name, {"checked": [], "green": []})
        if round_no not in ent["checked"]:
            ent["checked"].append(round_no)
            ent["checked"].sort()
        # A rows-only query (no oracle_sql) gets err == "no_oracle" with
        # spark_rows populated — that IS the driver's rows-only pass.
        # Full checks need err==None and no explicit False.
        if row.get("err") == "no_oracle":
            ok = row.get("spark_rows") is not None
        else:
            ok = row.get("err") is None and all(
                v is not False
                for v in (row.get("rows_match"), row.get("schema_match"),
                          row.get("hash_match"))
            )
        if ok and round_no not in ent["green"]:
            ent["green"].append(round_no)
            ent["green"].sort()


def main() -> None:
    hist: dict[str, dict] = {}
    if os.path.exists(HIST_PATH):
        with open(HIST_PATH) as f:
            hist = json.load(f)

    if len(sys.argv) >= 3:
        pairs = [(sys.argv[1], int(sys.argv[2]))]
    else:
        pairs = []
        for path in sorted(glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json"))):
            m = re.search(r"_r(\d+)\.json$", path)
            if m:
                pairs.append((path, int(m.group(1))))
        if not pairs:
            sys.exit("no CORRECTNESS_r*.json found and no args given")

    for corr_path, round_no in pairs:
        with open(corr_path) as f:
            corr = json.load(f)
        _fold(hist, corr, round_no)

    with open(HIST_PATH, "w") as f:
        json.dump(hist, f, indent=1, sort_keys=True)
    n_green = sum(1 for e in hist.values() if e["green"])
    print(f"history: {len(hist)} checked ever, {n_green} green ever")


if __name__ == "__main__":
    main()
