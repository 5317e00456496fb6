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
import os
import sys

sys.path.insert(0, ".")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    from round_checklist import green_rows

    from brazilian_e_commerce_data_pipeline_analytics_spark.registry import all_queries

    names = list(all_queries())
    # ONE green definition for the whole toolchain: round_checklist's
    # green_rows() is what tests/test_registry.py's rotation invariant
    # imports, so a tuple pasted from here can never disagree with the
    # test (a second local predicate drifted once — round-7 review).
    ever_green, _rows_only = green_rows()
    status: dict[str, str] = {}  # name -> 'green' | 'red'
    last_green: dict[str, int] = {}
    for path in sorted(glob.glob("CORRECTNESS_r*.json")):
        rnd = int("".join(ch for ch in path.split("_r")[1] if ch.isdigit()))
        with open(path, encoding="utf-8") as fh:
            for name, row in json.load(fh).items():
                ok = (
                    not row.get("err")
                    and row.get("rows_match")
                    # same green definition as round_checklist.green_rows
                    # — schema_match included (ADVICE r7)
                    and row.get("schema_match", True)
                    and row.get("hash_match")
                )
                # latest round wins; a later red overrides an earlier green
                status[name] = "green" if ok else "red"
                if ok:
                    last_green[name] = rnd

    unverified = [n for n in names if n not in ever_green]
    red = [n for n in names if n in ever_green and status.get(n) == "red"]
    green = [n for n in names if n in ever_green and status.get(n) == "green"]

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

    # Ready-to-paste FULL priority tuple (round-7 upgrade): no-green
    # queries first, then every green sorted by (last-green round asc,
    # current priority order) — paste over _DRIVER_WINDOW_PRIORITY, add
    # new queries at the very front as they land, and the rotation is
    # one command per round.
    order = {n: i for i, n in enumerate(names)}
    greens_sorted = sorted(
        [n for n in names if n in ever_green and n not in set(red)],
        key=lambda n: (last_green.get(n, 0), order[n]),
    )
    full = priority + greens_sorted
    if "--paste" in sys.argv:
        print("\n# --- ready-to-paste _DRIVER_WINDOW_PRIORITY body ---")
        head, rest = full[:50], full[50:]
        for n in head:
            print(f'    "{n}",')
        print("    # -- below here: outside the 50-row window --")
        for n in rest:
            print(f'    "{n}",')
    else:
        print("\n(run with --paste for the full ready-to-paste tuple body)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
