#!/usr/bin/env python
"""Bench regression gate: compare a fresh BENCH_DETAIL.json against a
baseline (default: the committed one from the previous round) and fail
on per-query regressions beyond a threshold.

Run BEFORE committing refreshed bench artifacts:

    python bench.py                       # writes BENCH_DETAIL.json
    python scripts/bench_gate.py          # new file vs git HEAD's copy
    python scripts/bench_gate.py old.json new.json   # explicit files

Exit 1 on any regression > --threshold (default 1.5x) among queries
present in both files, unless the query is named in --allow (a
deliberate perf-for-scale trade recorded in the commit message).
Sub-0.2s timings are noise-dominated at sf0.1 and are compared against
a 0.2s floor instead of raw ratio.
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys

FLOOR_SEC = 0.2  # below this, local jitter dominates; ratio is meaningless


def load_baseline_from_git(path: str) -> dict:
    out = subprocess.run(
        ["git", "show", f"HEAD:{path}"],
        capture_output=True,
        text=True,
        check=True,
    )
    return json.loads(out.stdout)


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("old", nargs="?", default=None,
                    help="baseline BENCH_DETAIL.json (default: git HEAD copy)")
    ap.add_argument("new", nargs="?", default="BENCH_DETAIL.json")
    ap.add_argument("--threshold", type=float, default=1.5)
    ap.add_argument("--allow", action="append", default=[],
                    metavar="QUERY", help="accept a known regression")
    args = ap.parse_args()

    if args.old:
        with open(args.old) as f:
            old = json.load(f)
    else:
        old = load_baseline_from_git("BENCH_DETAIL.json")
    with open(args.new) as f:
        new = json.load(f)

    # an sf0.01 dev run must never masquerade as the sf0.1 baseline
    # (it did once: a verify-step bench at sf0.01 overwrote
    # BENCH_DETAIL.json, got committed, and the next gate read 2-4x
    # phantom regressions) — refuse to compare across scale factors
    if old.get("sf") != new.get("sf"):
        print(
            f"ERROR: baseline sf={old.get('sf')} vs new sf={new.get('sf')} — "
            "not comparable; re-run bench.py at the baseline's sf or pass "
            "an explicit baseline file recorded at the same sf"
        )
        return 2

    oq, nq = old["queries"], new["queries"]
    # host-weather normalization: when both files carry the fixed
    # synthetic probe, scale the new timings by the probe ratio
    # (clamped) so a slow-host run doesn't read as a code regression
    op = (old.get("host_probe_after") or {}).get("spark_range_agg_s")
    np_ = (new.get("host_probe_after") or {}).get("spark_range_agg_s")
    if op and np_:
        scale = min(2.0, max(0.5, op / np_))
        if abs(scale - 1.0) > 0.05:
            print(f"host probe {op:.2f}s -> {np_:.2f}s: scaling new timings x{scale:.2f}")
        nq = {k: v * scale for k, v in nq.items()}
    shared = sorted(set(oq) & set(nq))
    regressed, improved = [], 0
    for name in shared:
        a, b = max(oq[name], FLOOR_SEC), max(nq[name], FLOOR_SEC)
        ratio = b / a
        if ratio > args.threshold and name not in args.allow:
            regressed.append((name, oq[name], nq[name], ratio))
        elif ratio < 1 / args.threshold:
            improved += 1

    tot_old = sum(oq[n] for n in shared)
    tot_new = sum(nq[n] for n in shared)
    print(
        f"{len(shared)} shared queries: total {tot_old:.1f}s -> "
        f"{tot_new:.1f}s ({tot_new / max(tot_old, 1e-9):.2f}x), "
        f"{improved} improved >{args.threshold}x, "
        f"{len(regressed)} regressed >{args.threshold}x"
    )
    for name, a, b, r in sorted(regressed, key=lambda x: -x[3]):
        print(f"REGRESSED {name}: {a:.2f}s -> {b:.2f}s ({r:.2f}x)")
    return 1 if regressed else 0


if __name__ == "__main__":
    sys.exit(main())
