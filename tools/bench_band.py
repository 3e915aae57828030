"""Aggregate N back-to-back bench runs into a median + spread band
(r12 verdict item #3: same-day host drift of up to 2x on unchanged
code exceeds any per-query signal, so regressions must be called
against a MEASURED band, not a single-run delta).

    python tools/bench_band.py out.json run1.json run2.json ...

Writes one JSON line with the bench schema plus per-query
``spread`` = (max-min)/median over the runs, and prints a table of
queries whose median moved outside the band vs a comparison file
given with --baseline.
"""

from __future__ import annotations

import json
import statistics
import sys


def _load(path: str) -> dict:
    with open(path) as f:
        return json.loads(f.read().strip().splitlines()[-1])


#: sub-noise floor: a band narrower than this is treated as 10% (a
#: 3-run min can be accidentally tight) and absolute moves under
#: 0.25 s are never flagged — same rules the --baseline comparison
#: applies below
BAND_FLOOR = 0.10
ABS_FLOOR_SEC = 0.25


def band_flag(timing: float, median: float, spread: float) -> str:
    """Classify one timing against a stored (median, spread) band:
    ``inside`` / ``above`` / ``below``. The single methodology both
    this tool's --baseline mode and bench.py's per-query annotation
    use, so the driver artifact and the local band agree by
    construction."""
    band = max(spread, BAND_FLOOR)
    if timing > median * (1.0 + band) and timing - median > ABS_FLOOR_SEC:
        return "above"
    if timing < median * (1.0 - band) and median - timing > ABS_FLOOR_SEC:
        return "below"
    return "inside"


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    baseline_path = None
    for a in sys.argv[1:]:
        if a.startswith("--baseline="):
            baseline_path = a.split("=", 1)[1]
    out_path, run_paths = args[0], args[1:]
    runs = [_load(p) for p in run_paths]
    names = set(runs[0]["queries"])
    for r in runs[1:]:
        names &= set(r["queries"])

    queries, spread = {}, {}
    for q in sorted(names):
        vals = sorted(r["queries"][q] for r in runs)
        med = statistics.median(vals)
        queries[q] = round(med, 3)
        spread[q] = round((vals[-1] - vals[0]) / med, 3) if med > 0 else 0.0

    payload = {
        "metric": runs[0].get("metric", "headline_total_sec"),
        "value": round(sum(queries.values()), 3),
        "unit": "sec",
        "queries": queries,
        "sf": runs[0].get("sf"),
        "runs": len(runs),
        "spread": spread,
        "note": (
            "median over back-to-back runs in one session; spread = "
            "(max-min)/median per query — regressions are called only "
            "when a later median moves beyond this band"
        ),
    }
    with open(out_path, "w") as f:
        f.write(json.dumps(payload) + "\n")
    print(f"wrote {out_path}: {payload['value']}s over {len(queries)} queries "
          f"(median spread {statistics.median(spread.values()):.1%}, "
          f"max {max(spread.values()):.1%})")

    if baseline_path:
        base = _load(baseline_path)["queries"]
        flagged = []
        for q in sorted(names & set(base)):
            if base[q] > 0 and band_flag(queries[q], base[q], spread[q]) == "above":
                flagged.append((q, base[q], queries[q], spread[q]))
        if flagged:
            print("outside-band regressions vs", baseline_path)
            for q, b, m, s in flagged:
                print(f"  {q}: {b:.2f}s -> {m:.2f}s (band {s:.1%})")
        else:
            print("no outside-band regressions vs", baseline_path)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
