"""Driver-window freshness policy.

The driver hash-checks only the first 50 names ``queries()`` yields
(one ``CORRECTNESS_r{N}.json`` row per name per round).  Faces outside
the window keep only the local sf0.001/sf0.01 sweeps between rounds,
so a face left out too long drifts away from its last *driver* check.

Policy (VERDICT r06 item 1): **no registered face goes more than
``MAX_STALENESS`` rounds without a driver row** — i.e. for every face,
``current_round - last_driver_round <= MAX_STALENESS``, where a face in
the current window counts as checked this round.

This module is the single source of truth for per-face driver-row age:
``tools/verify_driver.py`` prints the age table from it, and
``tests/test_registry_window.py`` asserts the policy from it, so each
round's rotation is computed, not hand-curated.
"""

from __future__ import annotations

import glob
import json
import os
import re

MAX_STALENESS = 2

_REPO_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def correctness_rounds(repo_root: str = _REPO_ROOT) -> dict[int, set[str]]:
    """round number -> set of face names with a driver row that round."""
    out: dict[int, set[str]] = {}
    for path in sorted(glob.glob(os.path.join(repo_root, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        with open(path) as f:
            rows = json.load(f)
        out[int(m.group(1))] = set(rows)
    return out


def last_driver_round(repo_root: str = _REPO_ROOT) -> dict[str, int]:
    """face name -> most recent round with a driver row (0 = never).

    Names are taken as-recorded; renamed/retired faces simply stop
    matching the live registry and are ignored by callers that join
    against it.
    """
    last: dict[str, int] = {}
    for rnd, names in correctness_rounds(repo_root).items():
        for n in names:
            last[n] = max(last.get(n, 0), rnd)
    return last


def age_table(
    registry_names: list[str],
    window_names: list[str],
    repo_root: str = _REPO_ROOT,
) -> list[tuple[str, int, int, bool]]:
    """Per-face ``(name, last_round, post_window_staleness, in_window)``.

    ``post_window_staleness`` is the age the face will have AFTER the
    upcoming driver round runs the given window: 0 if the face is in
    the window, else ``next_round - last_round``.  Sorted stalest-first.
    """
    rounds = correctness_rounds(repo_root)   # one history parse per call
    last: dict[str, int] = {}
    for rnd, names in rounds.items():
        for name in names:
            last[name] = max(last.get(name, 0), rnd)
    next_round = max(rounds, default=0) + 1
    in_window = set(window_names)
    rows = []
    for name in registry_names:
        lr = last.get(name, 0)
        stale = 0 if name in in_window else (next_round - lr if lr else next_round)
        rows.append((name, lr, stale, name in in_window))
    rows.sort(key=lambda r: (-r[2], r[1], r[0]))
    return rows


def policy_violations(
    registry_names: list[str],
    window_names: list[str],
    repo_root: str = _REPO_ROOT,
) -> list[tuple[str, int, int]]:
    """Faces whose post-window staleness would exceed MAX_STALENESS."""
    return [
        (name, lr, stale)
        for name, lr, stale, _ in age_table(registry_names, window_names, repo_root)
        if stale > MAX_STALENESS
    ]


def format_age_table(
    registry_names: list[str],
    window_names: list[str],
    repo_root: str = _REPO_ROOT,
) -> str:
    lines = ["face                            last_r  next_age  window"]
    for name, lr, stale, inw in age_table(registry_names, window_names, repo_root):
        lines.append(
            f"{name:<32}{lr or '-':>5}{stale:>9}  {'*' if inw else ''}"
        )
    return "\n".join(lines)
