"""Cluster job entrypoint (north_rule: "run via ray job submit on a
fixed-size multi-node Ray cluster").

On a real cluster:

    ray job submit --working-dir . -- \
        python scripts/job_entry.py --osm s3://…/osm --build s3://…/build \
        --steps areas,graph,tags,tile,raster,join,dump

The job driver attaches to the submitting cluster (``RAY_ADDRESS`` is
injected by the job server; ``address="auto"``), runs the requested
pipeline steps in order, and writes a run-level metrics JSON
(`<build>/_RUN_METRICS.json`: per-step wall seconds + the per-partition
manifest metrics rolled up) so an operator can audit throughput without
scraping logs. Steps with per-partition lineage manifests (``tile``,
``raster``, ``join --partitioned`` outputs) resume from checkpoint: a
resubmitted job skips committed partitions.

This sandbox has no job server (``ray[default]`` extras absent), so the
script is exercised by direct invocation — the driver logic is identical
either way; only who calls ``ray.init`` differs.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_STEPS = "synth,areas,graph,tags,tile,raster,join,dump"


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--osm", required=True)
    p.add_argument("--build", required=True)
    p.add_argument("--steps", default=DEFAULT_STEPS)
    p.add_argument("--pages", type=int, default=2000)
    p.add_argument("--partitions", type=int, default=8)
    args = p.parse_args(argv)

    import ray

    if not ray.is_initialized():
        # under `ray job submit`, RAY_ADDRESS points at the cluster; the
        # sandbox/test path runs a local session instead
        addr = os.environ.get("RAY_ADDRESS", "local")
        kwargs = {"address": addr, "include_dashboard": False, "logging_level": "ERROR"}
        if addr == "local":
            kwargs["num_cpus"] = int(os.environ.get("RAY_GRAFT_CPUS", "8"))
        ray.init(**kwargs)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from osm_jigsaw_ray import cli

    metrics: dict = {"steps": {}, "cluster_cpus": int(ray.cluster_resources().get("CPU", 0))}
    for step in args.steps.split(","):
        step = step.strip()
        if step not in cli.STEPS:
            raise SystemExit(f"unknown step {step!r} (have {sorted(cli.STEPS)})")
        argv_step = [step, "--osm", args.osm, "--build", args.build,
                     "--out", args.osm, "--pages", str(args.pages),
                     "--partitions", str(args.partitions)]
        t0 = time.monotonic()
        cli.main(argv_step)
        metrics["steps"][step] = round(time.monotonic() - t0, 3)

    # roll up per-partition manifest metrics for the resumable outputs
    from osm_jigsaw_ray.state.manifest import MANIFEST_NAME

    rollup: dict = {}
    for sub in ("tiles", "raster"):
        root = os.path.join(args.build, sub)
        if not os.path.isdir(root):
            continue
        parts = [d for d in os.listdir(root)
                 if os.path.exists(os.path.join(root, d, MANIFEST_NAME))]
        tot_rows = tot_bytes = 0
        tot_write = 0.0
        for d in parts:
            with open(os.path.join(root, d, MANIFEST_NAME)) as f:
                m = json.load(f)
            tot_rows += m.get("rows", 0)
            mm = m.get("metrics", {})
            tot_bytes += mm.get("bytes", 0)
            tot_write += mm.get("write_s", 0.0)
        rollup[sub] = {
            "partitions": len(parts),
            "rows": tot_rows,
            "bytes": tot_bytes,
            "write_s": round(tot_write, 3),
        }
    metrics["partitions"] = rollup

    out = os.path.join(args.build, "_RUN_METRICS.json")
    with open(out, "w") as f:
        json.dump(metrics, f, indent=1)
    print("job_entry:", json.dumps(metrics))
    return metrics


if __name__ == "__main__":
    main()
    import ray

    if ray.is_initialized():
        ray.shutdown()
