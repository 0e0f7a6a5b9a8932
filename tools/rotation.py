"""Staleness-rotation composer: print the next round's _RECONFIRM list.

Reads every CORRECTNESS_r*.json, computes each registered key's NEWEST
official green round, and emits the N stalest confirmed keys in
oldest-record-first order (ties broken by registry iteration order, so
the output is deterministic). Paste the list into registry._RECONFIRM
at round open — after folding the previous round's greens into
_CONFIRMED — and the 50-slot driver window becomes the staleness
rotation automatically.

Usage: python tools/rotation.py [N=50]
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from maap_data_pipelines_spark import registry  # noqa: E402


def latest_green() -> dict[str, int]:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    latest: dict[str, int] = {}
    for f in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        rnd = int("".join(c for c in os.path.basename(f) if c.isdigit()))
        rows = json.load(open(f))
        for k, v in rows.items():
            if v.get("rows_match") and v.get("schema_match") and v.get("hash_match"):
                latest[k] = max(latest.get(k, 0), rnd)
    return latest


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    latest = latest_green()
    qs = list(registry.queries())
    never = [k for k in qs if k not in latest]
    if never:
        print(f"# WARNING: {len(never)} keys have NO green record (they")
        print("# lead the window automatically once unconfirmed):")
        for k in never:
            print(f"#   {k}")
    order = {k: i for i, k in enumerate(qs)}
    stale = sorted(
        (k for k in qs if k in latest), key=lambda k: (latest[k], order[k])
    )
    print(f"# stalest {n} of {len(stale)} recorded keys (newest-record round first):")
    print("_RECONFIRM = [")
    for k in stale[:n]:
        print(f'    "{k}",  # r{latest[k]}')
    print("]")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
