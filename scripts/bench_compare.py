"""Like-for-like round-over-round bench table (round-3 verdict item #4).

    python scripts/bench_compare.py BENCH_r03.json /tmp/bench_r4.json

First arg: the driver's recorded BENCH_r{N}.json (has a `parsed` key) or
a raw `bench.py` output line. Second: the newer run. Emits a markdown
table comparing per-query MINIMA — for runs that carry
`query_rep_secs` (round 4+) the min over reps, else the single recorded
value (round ≤3 secondaries were single-rep; flagged in the cell).
"""

from __future__ import annotations

import json
import sys


def load(path: str) -> dict:
    with open(path) as f:
        d = json.load(f)
    return d.get("parsed", d)


def minima(d: dict) -> dict[str, tuple[float, int]]:
    reps = d.get("query_rep_secs", {})
    out = {}
    for q, v in d["queries"].items():
        r = reps.get(q)
        out[q] = (min(r), len(r)) if r else (v, 1)
    return out


def main() -> None:
    old, new = load(sys.argv[1]), load(sys.argv[2])
    mo, mn = minima(old), minima(new)
    print("| query | r3 min (reps) | r4 min (reps) | r4/r3 |")
    print("|---|---|---|---|")
    for q in mn:
        if q not in mo:
            print(f"| {q} | — (new) | {mn[q][0]:.2f} (n={mn[q][1]}) | — |")
            continue
        (vo, no), (vn, nn) = mo[q], mn[q]
        print(
            f"| {q} | {vo:.2f} (n={no}) | {vn:.2f} (n={nn}) "
            f"| {vn / vo:.2f}x |"
        )
    for q in mo:
        if q not in mn:
            print(f"| {q} | {mo[q][0]:.2f} (n={mo[q][1]}) | — (dropped) | — |")


if __name__ == "__main__":
    main()
