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
WINDOW_SIZE = 50

_REPO_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def _row_green(row: dict) -> bool:
    """A driver row counts as a CHECK only if it passed: full oracle
    rows need the value-hash match; rows-only faces (err='no_oracle')
    need a recorded row count. Errored/mismatched rows do NOT count,
    so a face that fails in round N sorts as stale and auto-re-enters
    round N+1's computed window to re-earn its green row."""
    if row.get("hash_match"):
        return bool(row.get("rows_match")) and bool(row.get("schema_match"))
    return row.get("err") == "no_oracle" and row.get("spark_rows") is not None


def correctness_rounds(repo_root: str = _REPO_ROOT) -> dict[int, set[str]]:
    """round number -> set of face names with a GREEN driver row that
    round (see _row_green; failed rows are treated as unchecked)."""
    out: dict[int, set[str]] = {}
    for path in sorted(glob.glob(os.path.join(repo_root, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        with open(path) as f:
            rows = json.load(f)
        out[int(m.group(1))] = {n for n, r in rows.items() if _row_green(r)}
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


# Tie-break rank for faces at the SAME staleness: streaming/stateful
# faces are the hardest to re-verify locally (a driver row is worth
# the most), compositions next, then the kernel-heavy dx faces, the
# vector stack, multimodal, extensions, and last the plain relational
# q-faces (the sf0.01 sweeps re-verify those convincingly between
# driver rows). Within a class, name order. Because chosen faces get
# fresh rows and unchosen ones age, the ordering is self-balancing
# round-robin — no face can starve while slack exists.
_RISK_CLASS = {"sx": 0, "cx": 1, "dx": 2, "vx": 3, "mm": 4, "qx": 5}


def _risk_rank(name: str) -> int:
    return _RISK_CLASS.get(name[:2], 6)


def computed_window(registry_names: list, core: list,
                    size: int = WINDOW_SIZE,
                    repo_root: str = _REPO_ROOT) -> list:
    """The driver window, COMPUTED from the CORRECTNESS history — no
    hand curation, no end-of-round rotation commit (VERDICT r08 item
    2). Membership: the regression core always; then every registered
    face ordered by (last green driver round asc, risk class, name),
    so never-checked faces (round 0 — new registrations and faces
    whose last row failed) enter immediately and the stalest faces
    head every window. When a new CORRECTNESS_r{N}.json lands, the
    window rotates for round N+1 by construction, keeping the
    freshness policy green at every commit."""
    last = last_driver_round(repo_root)
    core_in = [n for n in core if n in registry_names]
    rest = sorted(
        (n for n in registry_names if n not in set(core_in)),
        key=lambda n: (last.get(n, 0), _risk_rank(n), n),
    )
    return (core_in + rest)[:size]


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
