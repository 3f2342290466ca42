#!/usr/bin/env python3
"""Verify the _FRONT rotation window against the driver's CORRECTNESS
artifacts on disk.

The driver checks only the FIRST 50 registry entries per round, so the
standing rotation policy (queries/__init__.py header) is: every entry
with no driver row in any CORRECTNESS_r*.json goes first, then the
stalest cohort fills the 50-slot window. This script recomputes that
window from the artifacts and asserts the registry's actual head
matches, so a stale _FRONT can't silently burn a driver round
re-checking greens (the round-8-verdict failure mode).

Usage: python tools/rotation_check.py   (exit 0 = window is correct)
"""
from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

WINDOW = 50


def latest_driver_round(repo: str = REPO) -> dict[str, int]:
    """entry name -> newest round with a driver CORRECTNESS row.

    The glob must be ``r*`` (not ``r0*``) with regex round parsing so
    rounds >= 10 are counted — otherwise entries checked only in r10+
    read as never-checked exactly when the window math matters.
    """
    latest: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        m = re.search(r"_r(\d+)\.json$", os.path.basename(path))
        if not m:
            continue
        rnd = int(m.group(1))
        data = json.load(open(path))
        rows = data.get("queries", data)
        if isinstance(rows, dict):
            for name in rows:
                latest[name] = max(rnd, latest.get(name, 0))
    return latest


def main() -> int:
    from kafka_data_explorer_cdc_spark.queries import REGISTRY

    reg = list(REGISTRY)
    latest = latest_driver_round()
    head = reg[:WINDOW]

    never = [n for n in reg if n not in latest]
    never_missing = [n for n in never if n not in head]
    ok = True
    if never_missing and len(never) <= WINDOW:
        print(f"FAIL: never-driver-checked entries outside the {WINDOW}-slot "
              f"window: {never_missing}")
        ok = False

    # Staleness sanity: nothing in the head should be fresher than the
    # stalest entry left outside it (never-checked = round 0).
    outside = reg[WINDOW:]
    if outside:
        stalest_outside = min(latest.get(n, 0) for n in outside)
        too_fresh = [n for n in head
                     if latest.get(n, 0) > stalest_outside + 1]
        if too_fresh:
            print(f"WARN: window entries fresher than round "
                  f"{stalest_outside + 1} while staler entries wait: "
                  f"{too_fresh[:10]}{'...' if len(too_fresh) > 10 else ''}")

    stale_counts: dict[int, int] = {}
    for n in head:
        stale_counts[latest.get(n, 0)] = stale_counts.get(latest.get(n, 0), 0) + 1
    print(f"registry={len(reg)} ever-checked={len(latest)} "
          f"never={len(never)} window={WINDOW}")
    print("window composition by newest driver round (0=never):",
          dict(sorted(stale_counts.items())))
    if ok:
        print("OK: rotation window is correct")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
