#!/usr/bin/env python
"""Bench regression gate: compare a fresh BENCH_DETAIL.json against
(1) the committed baseline from git HEAD (within-round drift) AND
(2) the previous ROUND's snapshot in BENCH_ROUNDS/ (cumulative drift
— the round-3 verdict found 1.27x of unseen cross-round creep when
each within-round gate only ratcheted against HEAD).

Run BEFORE committing refreshed bench artifacts:

    python bench.py                       # writes BENCH_DETAIL.json
    python scripts/bench_gate.py          # HEAD + latest BENCH_ROUNDS
    python scripts/bench_gate.py old.json new.json   # explicit files

Exit 1 on any regression > --threshold (default 1.5x) among queries
present in both files, unless the query is named in --allow (a
deliberate perf-for-scale trade recorded in the commit message).
Sub-0.2s timings are noise-dominated at sf0.1 and are compared against
a 0.2s floor instead of raw ratio.

Host-weather normalization (round-5 verdict, "What's wrong" #3): the
single-value synthetic probe swung 1.6x WITHIN one sweep and flipped
gate verdicts between same-day runs, so both comparisons are now
normalized by a PAIRED CONTROL SET — the median old/new ratio over a
fixed list of plan-stable, mid-duration queries that no round has
touched since round 1 (they re-run inside the same bench session as
everything else, so their drift IS the host drift). The probe value
is still printed for context but no longer scales anything.

End-of-round bookkeeping: snapshot the final BENCH_DETAIL.json as
BENCH_ROUNDS/r{N:02d}.json so the next round has a cumulative anchor.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import subprocess
import sys

FLOOR_SEC = 0.2  # below this, local jitter dominates; ratio is meaningless

# Paired control set: plan-stable queries (single scan + trivial
# plan, untouched since round 1) spanning the mid-duration band —
# every control sits comfortably ABOVE FLOOR_SEC (0.33-0.49 s in the
# r06 detail), so none gets its ratio pinned to 1.0 by the floor
# (round-6 advice: q_regexp_extract/q_string_funcs sat at ~0.15 s and
# contributed no host-drift signal). Their median old/new ratio
# estimates the host factor for the whole session. A code change to
# any ONE of them barely moves the MEDIAN, and the gate still flags
# it per-query like everything else.
CONTROL_QUERIES = [
    "q_join_left_semi",
    "q_grouping_sets",
    "q_math_funcs",
    "q_pivot",
    "q_join_range",
    "q_hash_agg",
]


def _median(xs: list[float]) -> float:
    s = sorted(xs)
    n = len(s)
    return s[n // 2] if n % 2 else 0.5 * (s[n // 2 - 1] + s[n // 2])


def load_baseline_from_git(path: str) -> dict | None:
    out = subprocess.run(
        ["git", "show", f"HEAD:{path}"],
        capture_output=True,
        text=True,
    )
    if out.returncode != 0:
        return None
    return json.loads(out.stdout)


def latest_round_snapshot(root: str) -> tuple[str, dict] | None:
    snaps = sorted(glob.glob(os.path.join(root, "BENCH_ROUNDS", "r*.json")))
    if not snaps:
        return None
    with open(snaps[-1]) as f:
        return os.path.basename(snaps[-1]), json.load(f)


def compare(
    old: dict, new: dict, threshold: float, allow: list[str], label: str
) -> list[tuple]:
    """Probe-normalized per-query comparison; prints a summary line
    and any regressions; returns the regression list."""
    # an sf0.01 dev run must never masquerade as the sf0.1 baseline
    # (it did once: a verify-step bench at sf0.01 overwrote
    # BENCH_DETAIL.json, got committed, and the next gate read 2-4x
    # phantom regressions) — refuse to compare across scale factors
    if old.get("sf") != new.get("sf"):
        print(
            f"[{label}] ERROR: baseline sf={old.get('sf')} vs new "
            f"sf={new.get('sf')} — not comparable; re-run bench.py at "
            "the baseline's sf or pass a baseline recorded at the same sf"
        )
        return [("__sf_mismatch__", 0.0, 0.0, 0.0)]

    oq, nq = old["queries"], new["queries"]
    # host-weather normalization via the paired control set: median
    # old/new ratio over the plan-stable controls present in both
    # files (floored — a sub-floor control is jitter, not signal)
    ctl = [
        max(oq[c], FLOOR_SEC) / max(nq[c], FLOOR_SEC)
        for c in CONTROL_QUERIES
        if c in oq and c in nq
    ]
    if len(ctl) >= 3:
        scale = min(2.0, max(0.5, _median(ctl)))
        if abs(scale - 1.0) > 0.05:
            print(
                f"[{label}] control set ({len(ctl)} queries, median "
                f"ratio {_median(ctl):.2f}): scaling new timings "
                f"x{scale:.2f}"
            )
        nq = {k: v * scale for k, v in nq.items()}
    # the old probe is informational only (round-5 verdict: it swung
    # 1.6x within one sweep — not fit to normalize anything)
    op = (old.get("host_probe_after") or {}).get("spark_range_agg_s")
    np_ = (new.get("host_probe_after") or {}).get("spark_range_agg_s")
    if op and np_ and abs(op / np_ - 1.0) > 0.2:
        print(f"[{label}] (host probe, fyi: {op:.2f}s -> {np_:.2f}s)")
    shared = sorted(set(oq) & set(nq))
    regressed, improved = [], 0
    for name in shared:
        a, b = max(oq[name], FLOOR_SEC), max(nq[name], FLOOR_SEC)
        ratio = b / a
        if ratio > threshold and name not in allow:
            regressed.append((name, oq[name], nq[name], ratio))
        elif ratio < 1 / threshold:
            improved += 1

    tot_old = sum(oq[n] for n in shared)
    tot_new = sum(nq[n] for n in shared)
    print(
        f"[{label}] {len(shared)} shared queries: total {tot_old:.1f}s -> "
        f"{tot_new:.1f}s ({tot_new / max(tot_old, 1e-9):.2f}x), "
        f"{improved} improved >{threshold}x, "
        f"{len(regressed)} regressed >{threshold}x"
    )
    for name, a, b, r in sorted(regressed, key=lambda x: -x[3]):
        print(f"[{label}] REGRESSED {name}: {a:.2f}s -> {b:.2f}s ({r:.2f}x)")
    return regressed


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("old", nargs="?", default=None,
                    help="baseline BENCH_DETAIL.json (default: git HEAD copy)")
    ap.add_argument("new", nargs="?", default="BENCH_DETAIL.json")
    ap.add_argument("--threshold", type=float, default=1.5)
    ap.add_argument("--allow", action="append", default=[],
                    metavar="QUERY", help="accept a known regression")
    ap.add_argument("--skip-cumulative", action="store_true",
                    help="only gate against the primary baseline")
    args = ap.parse_args()

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(args.new) as f:
        new = json.load(f)

    failures = 0
    if args.old:
        with open(args.old) as f:
            old = json.load(f)
        if compare(old, new, args.threshold, args.allow, "baseline"):
            failures += 1
    else:
        old = load_baseline_from_git("BENCH_DETAIL.json")
        if old is None:
            print("[HEAD] no committed BENCH_DETAIL.json — skipping")
        elif compare(old, new, args.threshold, args.allow, "HEAD"):
            failures += 1

    if not args.skip_cumulative:
        snap = latest_round_snapshot(root)
        if snap is None:
            print("[round] no BENCH_ROUNDS/r*.json snapshot — skipping "
                  "cumulative gate (snapshot the end-of-round "
                  "BENCH_DETAIL.json there)")
        else:
            name, old_round = snap
            if compare(old_round, new, args.threshold, args.allow,
                       f"round:{name}"):
                failures += 1

    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
