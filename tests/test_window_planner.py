"""Adjudication-window invariants: the driver grades the FIRST 50
registry entries, so a malformed rotation (wrong size, duplicate, typo)
silently burns driver coverage. These checks import the same logic
``tools/next_window.py --check`` runs, without needing a SparkSession.
"""

from __future__ import annotations

import importlib.util
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

spec = importlib.util.spec_from_file_location(
    "next_window", os.path.join(REPO, "tools", "next_window.py"))
nw = importlib.util.module_from_spec(spec)
spec.loader.exec_module(nw)


def test_current_window_is_valid():
    names = nw.registry_order()
    win = nw.current_window()
    assert len(win) == nw.WINDOW
    assert len(set(win)) == len(win)
    assert all(n in names for n in win)
    # The just-consumed state is HEALTHY, not wasted coverage: once the
    # driver's latest CORRECTNESS_r{N}.json entry set IS this exact
    # window, every window entry is by definition "already adjudicated"
    # and the right action is to rotate, not to fail the suite (the
    # same allowance `tools/next_window.py --check` prints as a NOTE —
    # VERDICT r7 item 3).
    import glob
    import json
    import re
    paths = sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")))
    if paths and set(json.load(open(paths[-1]))) == set(win):
        return
    # Age-rotation invariant (policy since round 10, full-registry
    # adjudication done): never-adjudicated entries are always in, and
    # no entry OUTSIDE the window may have a strictly older grade than
    # a non-MUST filler entry INSIDE it — the tools/next_window.py
    # --check rule, re-asserted here so the suite catches a hand-edited
    # rotation that burns coverage.
    # (never-adjudicated entries outside are exempt: new operators land
    # BEHIND a pinned mid-round window by design and lead the next
    # rotation via propose()).
    seen = nw.adjudication_history()
    inside = {n: seen.get(n, 0) for n in win if n not in nw.MUST}
    outside = {n: seen[n] for n in names if n not in win and n in seen}
    if inside and outside:
        assert min(outside.values()) >= max(inside.values()), (
            "graded entries outside the window are staler than filler "
            "inside")


def test_registry_order_matches_source():
    # registry_order() itself raises on drift between the register()
    # calls in the source and the live REGISTRY dict — a parse-failure
    # here means a rename was not carried through.
    names = nw.registry_order()
    assert len(names) == len(set(names))
    assert len(names) >= 217  # never shrinks


def test_proposal_fills_window_without_waste():
    names = nw.registry_order()
    seen = nw.adjudication_history()
    win = nw.propose(names, seen, must=[])
    assert len(win) == nw.WINDOW
    assert len(set(win)) == nw.WINDOW
    never = [n for n in names if n not in seen]
    # every non-MUST slot goes to never-adjudicated work while any
    # remains; after that, filler is oldest-grade-first
    non_must = [n for n in win if n not in nw.MUST]
    if len(never) >= len(non_must):
        assert all(n in never for n in non_must)
    else:
        assert all(n in non_must for n in never), (
            "never-adjudicated entries must always be proposed")
        filler = [n for n in non_must if n in seen]
        if filler:
            newest_in = max(seen[n] for n in filler)
            outside = [seen[n] for n in names
                       if n not in win and n in seen]
            if outside:
                assert min(outside) >= newest_in
