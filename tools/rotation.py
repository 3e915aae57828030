"""Recompute the driver-sample priority order for __spark_entry__.py.

The driver's correctness gate samples the FIRST 50 registry entries
each round, so the order must rotate: gates that have never earned a
driver CORRECTNESS row come first, then gates whose last green row is
oldest (ties broken by registry order). This prints the new priority
list; paste the first 50 into ``_PRIORITY`` (and sweep them locally
first: ``python tools/check_correctness.py /root/testdata/sf0.01
$(python tools/rotation.py --head)``).

Re-verification bound (round-11 protocol decision): every gate must
earn a fresh driver CORRECTNESS row within MAX_AGE_ROUNDS of its last
one. At 253+ gates / 50 driver slots per round, a full cycle takes
ceil(N/50) >= 6 rounds, so the bound is 6 — compensated by the
full-registry LOCAL sweep (both SFs) running every round. ``--check``
fails (exit 1) if the CURRENT head-50 ordering would let any gate's
driver age exceed the bound next round.

Usage:
    python tools/rotation.py            # annotated listing
    python tools/rotation.py --head     # space-separated first 50
    python tools/rotation.py --python   # paste-ready _PRIORITY body
    python tools/rotation.py --check    # enforce the age bound; exit 1 on breach
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
    for path in sorted(
        glob.glob("CORRECTNESS_r*.json")
        + glob.glob("docs/history/CORRECTNESS_r*.json")
    ):
        rnd = int(os.path.basename(path).split("_r")[1].split(".")[0])
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


MAX_AGE_ROUNDS = 6


def check() -> int:
    """Enforce the <=MAX_AGE_ROUNDS driver-age bound against the
    REGISTRY ordering actually shipped (the head-50 the driver will
    sample), not the recomputed ideal: a gate whose last green row is
    already MAX_AGE_ROUNDS-1 rounds old and is NOT in the shipped
    head-50 breaches the bound next round."""
    import __spark_entry__ as entrymod

    rounds: dict[str, int] = {}
    latest = 0
    for path in sorted(
        glob.glob("CORRECTNESS_r*.json")
        + glob.glob("docs/history/CORRECTNESS_r*.json")
    ):
        rnd = int(os.path.basename(path).split("_r")[1].split(".")[0])
        latest = max(latest, rnd)
        with open(path) as f:
            for name, row in json.load(f).items():
                if row.get("hash_match") or row.get("rows_match"):
                    rounds[name] = max(rounds.get(name, 0), rnd)
    head = set(list(entrymod.queries().keys())[:50])
    nxt = latest + 1  # the round the shipped head-50 will be sampled in
    bad = []
    for q in entrymod.queries():
        age_next = nxt - rounds.get(q, nxt)
        if q not in head and age_next >= MAX_AGE_ROUNDS:
            bad.append((q, rounds.get(q), age_next))
    if bad:
        print(f"AGE-BOUND BREACH (> {MAX_AGE_ROUNDS - 1} rounds unsampled "
              "and not in the shipped head-50):")
        for q, last, age in bad:
            print(f"  {q}: last green r{last}, age r{nxt} = {age}")
        return 1
    print(
        f"ok: every gate either sits in the shipped head-50 or has "
        f"driver age < {MAX_AGE_ROUNDS} at r{nxt}"
    )
    return 0


def main() -> None:
    if "--check" in sys.argv:
        sys.exit(check())
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
