#!/usr/bin/env python3
"""Adjudication-window planner: compute driver-coverage debt and propose
the next 50-entry ``_ADJUDICATION_FIRST`` rotation.

The driver adjudicates only the FIRST 50 registry entries per round
(``CORRECTNESS_r{N}.json``).  Rotating that window by hand from the PREP
comments proved error-prone as the registry grew past 200 entries, so this
tool derives everything from the committed artifacts:

  * registry order + names  — imported from ``plans.registry`` (the real
    thing the driver sees, so typos are impossible);
  * adjudication history    — union of every ``CORRECTNESS_r*.json`` at the
    repo root, keeping the LATEST round each entry was seen;
  * the proposed window     — ``--must`` names first (code changed this
    round — deserves a fresh row), then never-adjudicated entries in
    registry-thematic order, then OLDEST-GRADE-FIRST filler: every
    remaining slot goes to the entry whose last driver grade is stalest
    (ties broken by registry order).  With a 348-entry registry and a
    50-slot window this guarantees every entry re-proves within ~7
    rounds; flagship entries rotate back in on the same age schedule
    rather than consuming a slot every round.

Usage:
    python tools/next_window.py                  # report + proposed window
    python tools/next_window.py --check          # validate the CURRENT window
    python tools/next_window.py --must simhash_fingerprints ...

``--check`` exits non-zero if the current ``_ADJUDICATION_FIRST`` contains a
duplicate, is not exactly WINDOW entries, or violates the age rotation: an
entry outside the window has a strictly older grade than a non-MUST filler
entry inside it.  It also prints the fleet's maximum staleness (rounds since
the oldest grade) so rotation health is visible at a glance.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WINDOW = 50

# Entries whose code or oracle changed since their last adjudication —
# they deserve a fresh driver row even though they were graded before.
# Reset this each round when the fix list changes.
MUST: tuple[str, ...] = (
    # r09: the five former rows-only entries were rebuilt as audit
    # panels WITH oracles (new output schemas) — their last driver
    # rows grade the old shapes, so round 10 re-adjudicates them.
    # (keyframe_caption_align, also new in r09, is never-adjudicated
    # and enters the round-10 proposal automatically.)
    "approx_distinct",
    "approx_quantiles_events",
    "hll_sketch_users",
    "stratified_sample_fractions",
    "ann_topk_blas",
    # r09: exact-vs-blocked gate re-sized (50k -> 5k) after the scale
    # probe's straggler; output unchanged at test SFs, re-grade anyway.
    # (r10 additionally swapped its blocked path's label blocking for
    # trained-quantizer cells — test-SF output still unchanged, the
    # exact path rules there; it sits in the round-10 pinned window.)
    "embedding_near_dup",
    # r10: the 30-query scale probe caught two fixed-blocking-key
    # scale bugs, both fixed with semantics changes (new oracles) —
    # round 11 must re-grade them:
    #  * reciprocal_nn_pairs — label blocking (cells don't scale with
    #    n) -> trained K-proportional quantizer cells; 132.9x -> 1.85x
    #    under 10x data.
    #  * suffix_prefix_overlap — uncapped boundary-bigram buckets
    #    (vocabulary-bounded key space) -> absolute per-side df cap
    #    STITCH_DF_CAP (inert at committed SFs, max df 15); 110.5x ->
    #    8.07x.
    "reciprocal_nn_pairs",
    "suffix_prefix_overlap",
)


def registry_order() -> list[str]:
    """Registry names in THEMATIC source order (pre-rotation).

    Imports the registry module, then re-derives the original grouping by
    parsing ``register("name"`` calls from the source — the in-memory dict
    has already been reordered by ``_reorder_for_adjudication``.
    """
    sys.path.insert(0, REPO)
    from mapreduce_in_pthreads_spark.plans import registry as reg  # noqa: F401

    src = open(os.path.join(
        REPO, "mapreduce_in_pthreads_spark", "plans", "registry.py")).read()
    names = re.findall(r'^register\(\s*"([a-zA-Z0-9_]+)"', src, re.M)
    live = set(reg.REGISTRY)
    missing = [n for n in names if n not in live]
    extra = sorted(live - set(names))
    if missing or extra:
        raise SystemExit(f"source/registry drift: missing={missing} extra={extra}")
    return names


def adjudication_history() -> dict[str, int]:
    """name -> latest round number in which the driver adjudicated it."""
    seen: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"r(\d+)\.json$", path).group(1))
        for name in json.load(open(path)):
            seen[name] = max(rnd, seen.get(name, 0))
    return seen


def current_window() -> list[str]:
    sys.path.insert(0, REPO)
    from mapreduce_in_pthreads_spark.plans import registry as reg

    return list(reg._ADJUDICATION_FIRST)


def propose(names: list[str], seen: dict[str, int], must: list[str]) -> list[str]:
    window: list[str] = []
    for n in (*MUST, *must):  # changed-code re-grades lead
        if n not in names:
            raise SystemExit(f"--must {n!r} is not a registry entry")
        if n not in window:
            window.append(n)
    for n in names:  # never-adjudicated, thematic order
        if len(window) >= WINDOW:
            break
        if n not in seen and n not in window:
            window.append(n)
    # Filler: oldest grade first (stable on registry order for ties), so
    # every entry re-proves within ceil(len(names)/WINDOW) rounds.
    if len(window) < WINDOW:
        for n in sorted(names, key=lambda n: seen.get(n, 0)):
            if len(window) >= WINDOW:
                break
            if n not in window:
                window.append(n)
    return window[:WINDOW]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true",
                    help="validate the current _ADJUDICATION_FIRST instead")
    ap.add_argument("--must", nargs="*", default=[],
                    help="entries whose code changed this round")
    args = ap.parse_args()

    names = registry_order()
    seen = adjudication_history()
    never = [n for n in names if n not in seen]
    print(f"registry entries:        {len(names)}")
    print(f"ever driver-adjudicated: {len(seen)}")
    print(f"never adjudicated:       {len(never)}")

    if args.check:
        win = current_window()
        errors = []
        if len(win) != WINDOW:
            errors.append(f"window has {len(win)} entries, want {WINDOW}")
        if len(set(win)) != len(win):
            dupes = sorted({n for n in win if win.count(n) > 1})
            errors.append(f"duplicates: {dupes}")
        unknown = [n for n in win if n not in names]
        if unknown:
            errors.append(f"not in registry: {unknown}")
        # Post-round state is HEALTHY, not an error: once the driver's
        # CORRECTNESS_r{N} lands, every window entry is by definition
        # "already adjudicated" — if the latest round's entry set IS
        # this exact window, the window was simply consumed and the
        # right action is to rotate, not to fix anything.
        paths = sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")))
        consumed = False
        if paths and not unknown:
            latest = paths[-1]
            latest_rnd = int(re.search(r"r(\d+)\.json$", latest).group(1))
            consumed = set(json.load(open(latest))) == set(win)
        if consumed:
            print(f"NOTE: window already consumed by CORRECTNESS_r"
                  f"{latest_rnd:02d} (entry sets match exactly) — healthy "
                  "post-round state; rotate with `python tools/"
                  "next_window.py` before the next driver run")
        else:
            # Age-rotation invariant: no GRADED entry OUTSIDE the window
            # may be strictly staler than a non-MUST filler entry INSIDE
            # it. MUST entries are exempt (a code change outranks age);
            # never-adjudicated entries outside the window are exempt
            # too — new operators land BEHIND a pinned mid-round window
            # by design (the registry's round-N additions convention)
            # and lead the very next rotation via propose().
            inside = {n: seen.get(n, 0) for n in win
                      if n not in MUST and n not in args.must}
            outside = {n: seen[n] for n in names
                       if n not in win and n in seen}
            if inside and outside:
                newest_in = max(inside.values())
                stalest_out = min(outside.values())
                if stalest_out < newest_in:
                    displaced = sorted(
                        n for n, r in outside.items() if r < newest_in)
                    errors.append(
                        "age rotation violated: entries outside the window "
                        f"have older grades (r{stalest_out}) than filler "
                        f"inside it (r{newest_in}); displaced: {displaced}")
        covered = [n for n in win if n not in seen]
        print(f"current window: {len(win)} entries, "
              f"{len(covered)} never-adjudicated covered, "
              f"{len(never) - len(covered)} left for later rounds")
        if seen:
            latest_rnd = max(seen.values())
            graded = {n: seen[n] for n in names if n in seen}
            oldest_rnd = min(graded.values())
            oldest = sorted(n for n, r in graded.items() if r == oldest_rnd)
            print(f"max staleness: {latest_rnd - oldest_rnd} rounds "
                  f"(oldest grade r{oldest_rnd:02d} on {len(oldest)} "
                  f"entries, e.g. {oldest[:4]})")
        for e in errors:
            print(f"ERROR: {e}")
        return 1 if errors else 0

    win = propose(names, seen, args.must)
    leftover = [n for n in never if n not in win]
    print(f"\nproposed window ({len(win)}):")
    for i in range(0, len(win), 3):
        print("    " + ", ".join(f'"{n}"' for n in win[i:i + 3]) + ",")
    print(f"\nleft for the round after ({len(leftover)}):")
    print("  " + ", ".join(leftover))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
