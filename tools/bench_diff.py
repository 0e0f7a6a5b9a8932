"""Per-query bench regression diff: compare two BENCH_r{N}.json readings.

Usage:
    python tools/bench_diff.py [old.json] [new.json]

With no args, diffs the two most recent BENCH_r*.json in the repo root.
Prints one line per query with the timing ratio, flags >1.5x slowdowns
(on queries slower than 0.5s — sub-second readings are noise-dominated;
run-to-run variance on a contended machine is large, see SURVEY §6), and
exits 1 if any flagged regression exists so a driver can gate on it.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

SLOWDOWN = 1.5
MIN_SEC = 0.5  # ignore sub-second queries: dominated by scheduler noise


def _load(path: str) -> dict:
    with open(path) as f:
        raw = json.load(f)
    # driver files wrap the bench line as {"parsed": {...}}; accept both
    return raw.get("parsed") or raw


def _latest_two() -> tuple[str, str]:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    paths = glob.glob(os.path.join(root, "BENCH_r*.json"))

    def rnum(p: str) -> int:
        m = re.search(r"BENCH_r(\d+)", p)
        return int(m.group(1)) if m else -1

    paths = [p for p in sorted(paths, key=rnum) if _load(p)]
    if len(paths) < 2:
        raise SystemExit("need two parsed BENCH_r*.json files (or pass paths)")
    return paths[-2], paths[-1]


def main(argv: list[str]) -> int:
    # --core: gate on the FROZEN core only (the cross-round regression
    # bar; the ever-growing full headline compares key-by-key too, but
    # its noise floor is wider — see SURVEY §6)
    core_only = "--core" in argv
    argv = [a for a in argv if a != "--core"]
    old_path, new_path = argv[1:3] if len(argv) >= 3 else _latest_two()
    old, new = _load(old_path), _load(new_path)
    oldq, newq = old.get("queries", {}), new.get("queries", {})
    if core_only:
        sys.path.insert(
            0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        )
        from bench import CORE

        oldq = {k: v for k, v in oldq.items() if k in CORE}
        newq = {k: v for k, v in newq.items() if k in CORE}
    flagged = []
    print(f"# {old_path} ({old.get('value')}s) -> {new_path} ({new.get('value')}s)")
    for key in sorted(newq):
        if key not in oldq:
            print(f"{key:35s} NEW     {newq[key]:7.3f}s")
            continue
        a, b = oldq[key], newq[key]
        ratio = b / a if a > 0 else float("inf")
        mark = ""
        if ratio > SLOWDOWN and b > MIN_SEC:
            mark = "  <-- REGRESSION"
            flagged.append(key)
        print(f"{key:35s} {a:7.3f}s {b:7.3f}s  x{ratio:5.2f}{mark}")
    for key in sorted(set(oldq) - set(newq)):
        print(f"{key:35s} REMOVED ({oldq[key]:.3f}s)")
    if flagged:
        print(f"regressions: {flagged}")
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv))
