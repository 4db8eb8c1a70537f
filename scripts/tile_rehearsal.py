"""Planet-shaped tile-write rehearsal (round-3 verdict item #7).

The co-partitioned tile write (`tiling.write_tiles`) is verified at
100k areas; the scale claim is a ~15M-area planet. This rehearses the
full `cli tile` step — assign → tile_graph_edges join → membership
derivation → co-partition shuffles → per-partition manifest-committed
write — at 1M synthetic areas (10x the round-3 rehearsal) with
precision-3 geohash tiles, and records the evidence the claim needs:

  * wall time of the tile step (input synth time excluded, reported),
  * peak single-worker RSS and peak whole-tree RSS sampled at 1 Hz —
    per-task input proportional to its tiles means no worker ever
    holds anything catalog-sized,
  * the committed-partition count plus the per-tile row distribution
    (max / p99 / median areas-per-tile) scanned from the lineage
    manifests.

Usage:
    python scripts/tile_rehearsal.py [--areas 1000000] [--precision 3]
        [--partitions 64] [--build /tmp/ray_jigsaw_rehearsal]

Prints one JSON line; paste the summary into BENCH_RESULTS.md.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import threading
import time
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

CHUNK = 50_000


def synth_inputs(build: str, n: int) -> float:
    """Deterministic n-area build dir (areas / graph_edges / taggings),
    written in 50k-area chunks so the synth side never holds the
    catalog either. Edges form a 10-ary containment tree over area ids
    (every area reachable => every area gets tile memberships)."""
    from osm_jigsaw_ray.fixtures import synthetic_area_catalog

    t0 = time.time()
    for sub in ("areas", "graph_edges", "taggings"):
        d = f"{build}/{sub}"
        if os.path.isdir(d):
            shutil.rmtree(d)
        os.makedirs(d)
    for c, off in enumerate(range(0, n, CHUNK)):
        m = min(CHUNK, n - off)
        t = synthetic_area_catalog(m, seed=1000 + c)
        ids = np.arange(off, off + m, dtype=np.int64)
        osm = pa.array([[f"way/{i}"] for i in ids], pa.list_(pa.string()))
        t = t.set_column(0, "area_id", pa.array(ids)).set_column(
            1, "osm_ids", osm
        )
        pq.write_table(t, f"{build}/areas/part-{c:04d}.parquet")
        child = ids if off else ids[1:]
        pq.write_table(
            pa.table(
                {
                    "parent_area_id": pa.array(child // 10),
                    "child_area_id": pa.array(child),
                }
            ),
            f"{build}/graph_edges/part-{c:04d}.parquet",
        )
        pq.write_table(
            pa.table(
                {
                    "osm_id": pa.array([f"way/{i}" for i in ids], pa.string()),
                    "keys": pa.array([["name"]] * m, pa.list_(pa.string())),
                    "values": pa.array(
                        [[f"Area {i}"] for i in ids], pa.list_(pa.string())
                    ),
                }
            ),
            f"{build}/taggings/part-{c:04d}.parquet",
        )
    return time.time() - t0


def _smaps_split(pid: str) -> dict | None:
    """Private vs shared RSS split from /proc/<pid>/smaps_rollup (MB).

    VmRSS alone cannot distinguish a catalog-sized private heap (a real
    scale problem) from read-only mappings of the plasma object store
    in /dev/shm (benign — one physical copy shared by every process
    that maps it). Private_Clean+Private_Dirty is the process's own
    memory; Shared_* is the mapped store."""
    try:
        vals = {}
        with open(f"/proc/{pid}/smaps_rollup") as f:
            for line in f:
                k = line.split(":")[0]
                if k in (
                    "Rss",
                    "Pss",
                    "Shared_Clean",
                    "Shared_Dirty",
                    "Private_Clean",
                    "Private_Dirty",
                ):
                    vals[k] = int(line.split()[1]) / 1024.0
        if not vals:
            return None
        return {
            "rss": vals.get("Rss", 0.0),
            "pss": vals.get("Pss", 0.0),
            "private": vals.get("Private_Clean", 0.0)
            + vals.get("Private_Dirty", 0.0),
            "shared": vals.get("Shared_Clean", 0.0)
            + vals.get("Shared_Dirty", 0.0),
        }
    except OSError:
        return None


class RssSampler(threading.Thread):
    """1 Hz sampler over /proc: peak single-process RSS and peak total
    RSS across the tile subprocess + every ray worker/raylet, plus a
    private/shared split (smaps_rollup) for the CLI driver process and
    the worst single worker."""

    def __init__(self):
        super().__init__(daemon=True)
        self.peak_single_mb = 0.0
        self.peak_total_mb = 0.0
        # per-category peaks (MB): driver = the osm_jigsaw_ray.cli proc
        self.driver = {"rss": 0.0, "pss": 0.0, "private": 0.0, "shared": 0.0}
        self.worker = {"rss": 0.0, "pss": 0.0, "private": 0.0, "shared": 0.0}
        self.stop = threading.Event()

    @staticmethod
    def _procs():
        for pid in os.listdir("/proc"):
            if not pid.isdigit():
                continue
            try:
                with open(f"/proc/{pid}/cmdline", "rb") as f:
                    cmd = f.read().decode(errors="replace")
                if not any(
                    k in cmd
                    for k in ("ray::", "raylet", "osm_jigsaw_ray.cli", "ray/_private")
                ):
                    continue
                kind = "driver" if "osm_jigsaw_ray.cli" in cmd else "worker"
                with open(f"/proc/{pid}/status") as f:
                    for line in f:
                        if line.startswith("VmRSS:"):
                            yield pid, kind, int(line.split()[1]) / 1024.0
                            break
            except OSError:
                continue

    def run(self):
        while not self.stop.is_set():
            sizes = []
            for pid, kind, rss in self._procs():
                sizes.append(rss)
                peaks = self.driver if kind == "driver" else self.worker
                if rss > peaks["rss"]:
                    split = _smaps_split(pid)
                    if split:
                        peaks.update(split)
                    else:
                        peaks["rss"] = rss
            if sizes:
                self.peak_single_mb = max(self.peak_single_mb, max(sizes))
                self.peak_total_mb = max(self.peak_total_mb, sum(sizes))
            self.stop.wait(1.0)


def scan_manifests(tiles_root: str) -> dict:
    """Per-tile area counts from the committed lineage manifests
    (fingerprint '<a>a/<e>e/<t>t')."""
    areas_per_tile = []
    for part in os.listdir(tiles_root):
        mf = os.path.join(tiles_root, part, "_MANIFEST.json")
        if not os.path.isfile(mf):
            continue
        with open(mf) as f:
            fp = json.load(f).get("fingerprint", "0a")
        areas_per_tile.append(int(fp.split("a")[0]))
    a = np.sort(np.array(areas_per_tile or [0]))
    return {
        "tiles": int(len(a)),
        "areas_per_tile_max": int(a[-1]),
        "areas_per_tile_p99": int(a[min(len(a) - 1, int(len(a) * 0.99))]),
        "areas_per_tile_median": int(a[len(a) // 2]),
        "membership_rows_total": int(a.sum()),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--areas", type=int, default=1_000_000)
    ap.add_argument("--precision", type=int, default=3)
    ap.add_argument("--partitions", type=int, default=64)
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    ap.add_argument("--build", default="/tmp/ray_jigsaw_rehearsal")
    ap.add_argument("--shuffle", choices=("sort", "hash"), default="sort")
    ap.add_argument("--keep-inputs", action="store_true")
    args = ap.parse_args()

    if args.keep_inputs and os.path.isdir(f"{args.build}/areas"):
        synth_s = 0.0
    else:
        synth_s = synth_inputs(args.build, args.areas)
    tiles = f"{args.build}/tiles"
    if os.path.isdir(tiles):
        shutil.rmtree(tiles)

    sampler = RssSampler()
    sampler.start()
    t0 = time.time()
    proc = subprocess.run(
        [
            sys.executable,
            "-m",
            "osm_jigsaw_ray.cli",
            "tile",
            "--build",
            args.build,
            "--tile-precision",
            str(args.precision),
            "--partitions",
            str(args.partitions),
            "--shuffle",
            args.shuffle,
        ],
        env=dict(os.environ, RAY_GRAFT_CPUS=str(args.cpus)),
        cwd=str(ROOT),
        capture_output=True,
        text=True,
    )
    wall = time.time() - t0
    sampler.stop.set()
    sampler.join(2.0)
    if proc.returncode != 0:
        sys.stderr.write(proc.stdout[-4000:] + proc.stderr[-4000:])
        raise SystemExit(proc.returncode)
    summary = next(
        (l for l in proc.stdout.splitlines() if l.startswith("tile:")), ""
    )
    rec = {
        "metric": "planet-shaped tile write rehearsal (cli tile wall sec)",
        "areas": args.areas,
        "precision": args.precision,
        "partitions": args.partitions,
        "num_cpus": args.cpus,
        "shuffle": args.shuffle,
        "tile_wall_sec": round(wall, 1),
        "areas_per_sec": round(args.areas / wall, 1),
        "synth_input_sec": round(synth_s, 1),
        "peak_worker_rss_mb": round(sampler.peak_single_mb, 1),
        "peak_tree_rss_mb": round(sampler.peak_total_mb, 1),
        "driver_split_mb": {k: round(v, 1) for k, v in sampler.driver.items()},
        "worker_split_mb": {k: round(v, 1) for k, v in sampler.worker.items()},
        "cli_summary": summary,
        **scan_manifests(tiles),
    }
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
