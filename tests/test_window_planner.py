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
    # No slot is wasted: every entry is flagship, a MUST re-grade
    # (code/oracle changed since its last adjudication), or has never
    # faced the driver. (The flagship six need not LEAD the window —
    # rounds 7-8 deliberately spend their slots on backlog, per
    # VERDICT r6 item 2 / r7 item 1 — but any already-adjudicated
    # non-flagship non-MUST entry in the window is burned coverage.)
    seen = nw.adjudication_history()
    wasted = [n for n in win if n in seen
              and n not in nw.FLAGSHIP and n not in nw.MUST]
    assert not wasted


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
    # every non-flagship non-MUST slot goes to never-adjudicated work
    # while any remains
    non_flag = [n for n in win
                if n not in nw.FLAGSHIP and n not in nw.MUST]
    if len(never) >= len(non_flag):
        assert all(n in never for n in non_flag)
