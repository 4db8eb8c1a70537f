"""Merge tiled-path scaling run(s) into BENCH_SCALING.json as
`tiled_pool` (round-4 verdict item #7: the 24-pair official pool times
the broadcast headline; the 100 TB shape is the tiled join, which adds
a real all-to-all — record its own pooled medians alongside).

    python scripts/merge_tiled_pool.py /tmp/scaling_tiled_run*.json
"""

from __future__ import annotations

import json
import statistics
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def main() -> None:
    runs = [json.load(open(p)) for p in sys.argv[1:]]
    if not runs:
        raise SystemExit("usage: merge_tiled_pool.py run1.json [run2.json ...]")
    for r in runs:
        if r.get("scaling_query") != "geo_join_tiled":
            raise SystemExit("a run is not a geo_join_tiled scaling run")
    pairs = [p for r in runs for p in r["pair_samples"]]
    quota = [p["quota_efficiency"] for p in pairs if "quota_efficiency" in p]
    pool = {
        "scaling_query": "geo_join_tiled",
        "n_runs": len(runs),
        "n_pairs": len(pairs),
        "scaling_efficiency": round(
            statistics.median(p["efficiency"] for p in pairs), 3
        ),
        "equalized_scaling_efficiency": round(
            statistics.median(p["equalized_efficiency"] for p in pairs), 3
        ),
        "quota_scaling_efficiency": (
            round(statistics.median(quota), 3) if quota else None
        ),
        "platform_pure_compute_efficiency": runs[-1][
            "platform_pure_compute_efficiency"
        ],
        "pair_samples": pairs,
        "selection_note": (
            "every interleaved pair of every tiled protocol run pooled; "
            "no run selection"
        ),
    }
    path = ROOT / "BENCH_SCALING.json"
    doc = json.load(open(path))
    doc["tiled_pool"] = pool
    doc["round"] = 5
    json.dump(doc, open(path, "w"), indent=1)
    print(json.dumps({k: v for k, v in pool.items() if k != "pair_samples"}))


if __name__ == "__main__":
    main()
