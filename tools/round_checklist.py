"""Round-end checklist (VERDICT r3 item 7): make "sim-verified before
rotation" mechanical. Computes which registered queries still lack a
green driver CORRECTNESS row across all CORRECTNESS_r*.json files in
the repo root, then runs exactly those through the driver-semantics
comparison (tools/check_subset.py) at the gate scale.

    python tools/round_checklist.py            # verify all pending queries
    python tools/round_checklist.py --list     # just print the pending set
    python tools/round_checklist.py --sf /root/testdata/sf0.01

Exit 0 = every pending query is sim-verified (safe to rotate into the
driver window); non-zero = something would land red.
"""

from __future__ import annotations

import glob
import json
import os
import subprocess
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
_ROOT = os.path.dirname(_HERE)
sys.path.insert(0, _ROOT)


def green_rows() -> tuple[set[str], set[str]]:
    """(hash-green names, rows-only-evidenced names) across all
    CORRECTNESS_r*.json. The driver records oracle-less queries as
    err='no_oracle' with a spark_rows count — that is full evidence for
    a query that is STILL oracle-less, but not for one that has since
    gained an oracle (it then needs a real hash-green row)."""
    green: set[str] = set()
    rows_only: set[str] = set()
    for path in sorted(glob.glob(os.path.join(_ROOT, "CORRECTNESS_r*.json"))):
        with open(path) as f:
            data = json.load(f)
        for name, row in data.items():
            if not isinstance(row, dict):
                continue
            if row.get("err") == "no_oracle" and (row.get("spark_rows") or 0) > 0:
                rows_only.add(name)
            elif (
                not row.get("err")
                and row.get("rows_match")
                # schema_match is part of the driver's green definition;
                # dropping it here once let a schema-red row count green
                # for window rotation (ADVICE r7). Every recorded round
                # carries the key; default True keeps hypothetical older
                # formats readable.
                and row.get("schema_match", True)
                and row.get("hash_match")
            ):
                green.add(name)
    return green, rows_only


def main() -> int:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.01"
    if "--sf" in args:
        i = args.index("--sf")
        sf_dir = args[i + 1]
        del args[i : i + 2]
    list_only = "--list" in args

    from brazilian_e_commerce_data_pipeline_analytics_spark.registry import all_queries

    queries = all_queries()
    registered = list(queries)
    green, rows_only = green_rows()
    covered = set(green)
    covered |= {n for n in rows_only if n in queries and queries[n].oracle is None}
    pending = [n for n in registered if n not in covered]
    print(
        f"registered={len(registered)} hash-green={len(green & set(registered))} "
        f"rows-only-covered={len(covered - green)} pending={len(pending)}"
    )
    if not pending:
        print("nothing pending — every registered query has a green driver row")
        return 0
    for n in pending:
        print(f"  pending: {n}")
    if list_only:
        return 0

    # Delegate to check_subset in-process-free form (fresh interpreter so
    # its Spark session/config starts clean, like the driver's).
    cmd = [
        sys.executable,
        os.path.join(_HERE, "check_subset.py"),
        *pending,
        "--sf",
        sf_dir,
    ]
    return subprocess.call(cmd)


if __name__ == "__main__":
    sys.exit(main())
