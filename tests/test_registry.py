"""Registry invariants that keep the driver-window rotation honest.

The driver's correctness gate only checks the FIRST 50 entries of
``registry.all_queries()`` each round, so a query registered without a
slot in that window accrues no hard evidence (VERDICT r6 item 1: the 11
late round-6 additions sat behind the window for a full round). These
tests make the rotation rule — "every query with no green driver row
sits inside the window head" — mechanical instead of prose.
"""

from __future__ import annotations

import os
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(_ROOT, "tools"))

from brazilian_e_commerce_data_pipeline_analytics_spark import registry

_WINDOW = 50  # confirmed round 1: CORRECTNESS_r01.json held exactly 50 rows


def test_no_green_row_query_outside_window():
    """Every registered query lacking a green CORRECTNESS row must sit
    in the first 50 registry slots, or the next driver round cannot
    produce its first evidence (the rotation invariant from VERDICT r6
    item 1). Reads the CORRECTNESS_r*.json union exactly the way
    tools/round_checklist.py does."""
    from round_checklist import green_rows

    green, rows_only = green_rows()
    ordered = list(registry.all_queries().values())
    window = {q.name for q in ordered[:_WINDOW]}
    missing = [
        q.name
        for q in ordered[_WINDOW:]
        if q.name not in green
        and not (q.oracle is None and q.name in rows_only)
    ]
    assert not missing, (
        f"queries with no green driver row outside the {_WINDOW}-slot "
        f"window (rotate _DRIVER_WINDOW_PRIORITY): {missing}"
    )
    # sanity: the window itself is exactly filled (a short window head
    # silently hands slots to stale registration order)
    assert len(ordered) >= _WINDOW
    assert len(window) == _WINDOW


def test_priority_list_matches_registry_exactly():
    """The priority tuple must name every registered query exactly once
    and nothing else — a typo'd name would silently fall out of the
    window and a stale name would shift every slot after it."""
    names = list(registry._DRIVER_WINDOW_PRIORITY)
    assert len(names) == len(set(names)), "duplicate names in priority"
    registered = set(registry.all_queries())
    extra = [n for n in names if n not in registered]
    missing = sorted(registered - set(names))
    assert not extra, f"priority names not registered: {extra}"
    assert not missing, f"registered queries missing from priority: {missing}"


def test_below_here_marker_sits_at_slot_50():
    """The '-- below here --' comment in registry.py documents where the
    driver window ends; twice (r9, r10-planning) it drifted from the
    real boundary and mis-stated which rows were getting evidence
    (VERDICT r10 item 7). Parse the source and assert exactly
    ``_WINDOW`` query names precede it."""
    import inspect
    import re

    src = inspect.getsource(registry)
    body = re.search(
        r"_DRIVER_WINDOW_PRIORITY: tuple\[str, \.\.\.\] = \((.*?)\n\)",
        src,
        re.S,
    ).group(1)
    before_marker = body.split("below here")[0]
    names_before = re.findall(r'"(q[^"]+)"', before_marker)
    assert len(names_before) == _WINDOW, (
        f"'below here' marker sits after {len(names_before)} names, "
        f"expected exactly {_WINDOW} — move the marker or the rows"
    )
