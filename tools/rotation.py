"""Recompute the driver-sample priority order for __spark_entry__.py.

The driver's correctness gate samples the FIRST 50 registry entries
each round, so the order must rotate: gates that have never earned a
driver CORRECTNESS row come first, then gates whose last green row is
oldest (ties broken by registry order). This prints the new priority
list; paste the first 50 into ``_PRIORITY`` (and sweep them locally
first: ``python tools/check_correctness.py /root/testdata/sf0.01
$(python tools/rotation.py --head)``).

Usage:
    python tools/rotation.py            # annotated listing
    python tools/rotation.py --head     # space-separated first 50
    python tools/rotation.py --python   # paste-ready _PRIORITY body
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def rotation() -> list[tuple[str, int | None]]:
    import __spark_entry__ as entrymod

    rounds: dict[str, int] = {}
    for path in sorted(glob.glob("CORRECTNESS_r*.json")):
        rnd = int(path.split("_r")[1].split(".")[0])
        with open(path) as f:
            for name, row in json.load(f).items():
                if row.get("hash_match") or row.get("rows_match"):
                    rounds[name] = max(rounds.get(name, 0), rnd)
    qs = list(entrymod.queries().keys())
    order = {q: i for i, q in enumerate(qs)}
    never = [q for q in qs if q not in rounds]
    seen = sorted(
        (q for q in qs if q in rounds), key=lambda q: (rounds[q], order[q])
    )
    return [(q, None) for q in never] + [(q, rounds[q]) for q in seen]


def main() -> None:
    rot = rotation()
    if "--head" in sys.argv:
        print(" ".join(q for q, _ in rot[:50]))
        return
    if "--python" in sys.argv:
        print("_PRIORITY = [")
        print("    # tier 1 — never driver-sampled")
        tier2 = False
        for q, rnd in rot[:50]:
            if rnd is not None and not tier2:
                print("    # tier 2 — oldest driver-green first")
                tier2 = True
            print(f'    "{q}",')
        print("]")
        return
    for q, rnd in rot:
        print(f"{'never' if rnd is None else f'r{rnd}':>6}  {q}")


if __name__ == "__main__":
    main()
