"""Plan the next round's driver verification window.

The driver's correctness gate checks the FIRST 50 registry entries
(confirmed round 1), so `_DRIVER_WINDOW_PRIORITY` in registry.py is the
verification schedule. This tool reads every CORRECTNESS_r*.json in the
repo root and prints:
  1. queries with NO green row in any round (window candidates),
  2. queries whose latest row is red (must stay in the window),
  3. a ready-to-paste priority tuple: unverified + red first
     (registration order preserved), greens rotated behind.

Usage: python tools/plan_window.py
"""

from __future__ import annotations

import glob
import json
import sys

sys.path.insert(0, ".")


def main() -> int:
    from brazilian_e_commerce_data_pipeline_analytics_spark.registry import all_queries

    names = list(all_queries())
    status: dict[str, str] = {}  # name -> 'green' | 'red'
    for path in sorted(glob.glob("CORRECTNESS_r*.json")):
        with open(path, encoding="utf-8") as fh:
            for name, row in json.load(fh).items():
                ok = (
                    row.get("rows_match")
                    and row.get("schema_match")
                    and row.get("hash_match", True) is not False
                    and not row.get("err")
                )
                # latest round wins; a later red overrides an earlier green
                status[name] = "green" if ok else "red"

    unverified = [n for n in names if n not in status]
    red = [n for n in names if status.get(n) == "red"]
    green = [n for n in names if status.get(n) == "green"]

    print(f"registered: {len(names)}  green: {len(green)}  "
          f"red: {len(red)}  unverified: {len(unverified)}")
    if red:
        print("\nRED (fix + keep in window):")
        for n in red:
            print(f"  {n}")
    print(f"\nwindow candidates ({len(unverified + red)} of 50 slots):")
    priority = red + unverified
    for n in priority[:50]:
        print(f'    "{n}",')
    spare = 50 - len(priority)
    if spare > 0:
        print(f"\n{spare} spare slots — fill with the greens whose evidence "
              "is oldest, or leave for new queries.")
    else:
        print(f"\nOVERFLOW: {len(priority) - 50} candidates don't fit; "
              "they go to positions 51+ and the round after.")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
