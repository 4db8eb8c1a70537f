"""Planet-shaped containment-graph rehearsal (round-4 verdict item #5).

The distributed graph builder (`pipelines.graph.build_graph_edges` —
cell-homed children x cover-replicated parents + partition-hashed
transitive reduction) and `topological_depths` are verified at 100k
areas (round 3, 468,374 edges, ~39 s). This rehearses BOTH at 1M areas
— the tile writer's rehearsal scale — under the engine-default hash
shuffle, and records the evidence the 15M-area planet claim needs:

  * a NESTED synthetic catalog whose true containment graph is known
    in closed form (a 4-ary grid hierarchy: every area's box strictly
    inside its parent cell's box, siblings disjoint), so the golden
    check is exact: reduced edges == n (one direct parent per area +
    one ROOT edge for the single top-level area), and the depth
    histogram == the per-level population exactly;
  * wall time for build_graph_edges and topological_depths separately;
  * driver private RSS + peak single-worker private RSS sampled at
    1 Hz (same smaps_rollup split as tile_rehearsal.py) — the two
    things the verdict says to watch are the `_oversized_parents`
    broadcast (here: the top levels of the hierarchy, bounded by
    construction) and the transitive-reduction 2-path expansion
    (Sigma_mid in(mid) x out(mid) ~ n * L(L+1)/2 rows, distributed).

The hierarchy is the right planet shape: real OSM nesting is a
shallow-but-wide admin tree (continent > country > region > ... ~10
levels), which is exactly what levels of a 4-ary grid give. Spans run
from world-sized (level 0, an oversized-parent broadcast candidate)
down to ~0.3 degrees (level ~9), covering both builder paths.

Usage:
    python scripts/graph_rehearsal.py [--areas 1000000] [--precision 2]
        [--partitions 64] [--ring-points 16]

Prints one JSON line; paste the summary into BENCH_RESULTS.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

import numpy as np
import pyarrow as pa

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))
sys.path.insert(0, str(ROOT / "scripts"))

import threading  # noqa: E402

from tile_rehearsal import _smaps_split  # noqa: E402  (smaps RSS split)


class _Sampler(threading.Thread):
    """1 Hz peak-RSS sampler: this script's own process is the driver;
    every ray:: worker / raylet is a worker. Private vs shared split via
    smaps_rollup (see tile_rehearsal._smaps_split — shared plasma maps
    are benign; private heap is the scale signal)."""

    def __init__(self):
        super().__init__(daemon=True)
        self.driver = {"rss": 0.0, "private": 0.0, "shared": 0.0}
        self.worker = {"rss": 0.0, "private": 0.0, "shared": 0.0}
        self._stop = threading.Event()
        self._self_pid = str(os.getpid())

    def _worker_pids(self):
        for pid in os.listdir("/proc"):
            if not pid.isdigit() or pid == self._self_pid:
                continue
            try:
                with open(f"/proc/{pid}/cmdline", "rb") as f:
                    cmd = f.read().decode(errors="replace")
            except OSError:
                continue
            if any(k in cmd for k in ("ray::", "raylet", "ray/_private")):
                yield pid

    def run(self):
        while not self._stop.is_set():
            d = _smaps_split(self._self_pid)
            if d and d["rss"] > self.driver["rss"]:
                self.driver.update(
                    {k: d[k] for k in ("rss", "private", "shared")}
                )
            for pid in self._worker_pids():
                w = _smaps_split(pid)
                if w and w["rss"] > self.worker["rss"]:
                    self.worker.update(
                        {k: w[k] for k in ("rss", "private", "shared")}
                    )
            self._stop.wait(1.0)

    def start_(self):
        self.start()

    def stop_(self):
        self._stop.set()

    def summary(self) -> dict:
        return {
            "driver_peak_mb": {k: round(v, 1) for k, v in self.driver.items()},
            "worker_peak_mb": {k: round(v, 1) for k, v in self.worker.items()},
        }

LAT0, LAT1 = -80.0, 80.0
LON0, LON1 = -170.0, 170.0


def level_sizes(n: int) -> list[int]:
    """Full 4-ary levels 0..L-1 plus a partial last level reaching n."""
    sizes, total, lvl = [], 0, 0
    while total < n:
        full = 4**lvl
        sizes.append(min(full, n - total))
        total += sizes[-1]
        lvl += 1
    return sizes


def synth_catalog(build: str, n: int, ring_points: int) -> tuple[float, list[int]]:
    """Chunked parquet write of the nested catalog (never holds the
    catalog whole)."""
    import shutil

    import pyarrow.parquet as pq

    t0 = time.time()
    d = f"{build}/areas"
    if os.path.isdir(d):
        shutil.rmtree(d)
    os.makedirs(d)
    sizes = level_sizes(n)
    part = 0
    for lvl, count in enumerate(sizes):
        for off in range(0, count, 100_000):
            m = min(100_000, count - off)
            cells = np.arange(off, off + m, dtype=np.int64)
            pq.write_table(
                _level_slice(lvl, cells, ring_points),
                f"{d}/part-{part:05d}.parquet",
            )
            part += 1
    return time.time() - t0, sizes


def _level_slice(lvl: int, cells: np.ndarray, ring_points: int) -> pa.Table:
    side = 2**lvl
    row, col = cells // side, cells % side
    dla = (LAT1 - LAT0) / side
    dlo = (LON1 - LON0) / side
    inset = 0.0001 * (lvl + 1)
    la0 = LAT0 + row * dla + inset
    la1 = LAT0 + (row + 1) * dla - inset
    lo0 = LON0 + col * dlo + inset
    lo1 = LON0 + (col + 1) * dlo - inset
    offset = (4**lvl - 1) // 3
    ids = offset + cells
    k = max(1, ring_points // 4)
    t = np.linspace(0.0, 1.0, k, endpoint=False)
    lats_col, lons_col = [], []
    for i in range(cells.size):
        a0, a1, o0, o1 = la0[i], la1[i], lo0[i], lo1[i]
        lats_col.append(
            np.concatenate(
                [np.full(k, a0), a0 + (a1 - a0) * t, np.full(k, a1), a1 - (a1 - a0) * t]
            )
        )
        lons_col.append(
            np.concatenate(
                [o0 + (o1 - o0) * t, np.full(k, o1), o1 - (o1 - o0) * t, np.full(k, o0)]
            )
        )
    return pa.table(
        {
            "area_id": pa.array(ids, pa.int64()),
            "osm_ids": pa.array(
                [[f"way/{i}"] for i in ids.tolist()], pa.list_(pa.string())
            ),
            "lats": pa.array(lats_col, pa.list_(pa.float64())),
            "lons": pa.array(lons_col, pa.list_(pa.float64())),
            "area": pa.array((la1 - la0) * (lo1 - lo0), pa.float64()),
            "min_lat": pa.array(la0),
            "min_lon": pa.array(lo0),
            "max_lat": pa.array(la1),
            "max_lon": pa.array(lo1),
        }
    )


def expected_depth_hist(sizes: list[int]) -> dict[int, int]:
    """Level l areas sit at depth l+1 (the single level-0 root is the
    one ROOT-parented top-level area, depth 1)."""
    return {lvl + 1: count for lvl, count in enumerate(sizes)}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--areas", type=int, default=1_000_000)
    ap.add_argument("--precision", type=int, default=2)
    ap.add_argument("--partitions", type=int, default=64)
    ap.add_argument("--ring-points", type=int, default=16)
    ap.add_argument("--build", default="/tmp/ray_jigsaw_graph_rehearsal")
    args = ap.parse_args()

    os.makedirs(args.build, exist_ok=True)
    synth_sec, sizes = synth_catalog(args.build, args.areas, args.ring_points)
    n = sum(sizes)
    print(
        f"synth: {n} areas over {len(sizes)} levels in {synth_sec:.1f}s",
        file=sys.stderr,
    )

    import ray

    ray.init(
        address="local",
        num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
        include_dashboard=False,
        logging_level="ERROR",
    )
    import ray.data as rd
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from osm_jigsaw_ray.pipelines.graph import ROOT_AREA_ID, build_graph_edges
    from osm_jigsaw_ray.pipelines.graph import topological_depths
    from osm_jigsaw_ray.pipelines.shuffle import apply_default_strategy

    shuffle_mode = apply_default_strategy()

    sampler = _Sampler()
    sampler.start_()

    t0 = time.time()
    edges = build_graph_edges(
        rd.read_parquet(f"{args.build}/areas"),
        precision=args.precision,
        join_partitions=args.partitions,
    )
    out = f"{args.build}/graph_edges"
    import shutil

    if os.path.isdir(out):
        shutil.rmtree(out)
    edges.write_parquet(out)
    build_sec = time.time() - t0

    edges_ds = rd.read_parquet(out)
    n_edges = edges_ds.count()

    t1 = time.time()
    depths = topological_depths(edges_ds, num_partitions=args.partitions)
    hist = (
        depths.to_pandas().groupby("depth")["area_id"].count().to_dict()
    )  # <= L rows on the driver
    depth_sec = time.time() - t1
    sampler.stop_()

    # golden checks: exactly one reduced edge per area (direct parent;
    # the root gets the ROOT edge) and the exact per-level histogram
    want_hist = expected_depth_hist(sizes)
    golden_edges = n_edges == n
    golden_depths = {int(k): int(v) for k, v in hist.items()} == want_hist
    # spot-check: the root edge exists
    root_children = edges_ds.map_batches(
        lambda b: pa.table(
            {"n": pa.array([
                int(pa.compute.sum(
                    pa.compute.equal(b["parent_area_id"], ROOT_AREA_ID)
                ).as_py() or 0)
            ])}
        ),
        batch_format="pyarrow",
    ).sum("n")

    result = {
        "metric": "graph_rehearsal",
        "areas": n,
        "levels": len(sizes),
        "shuffle": shuffle_mode,
        "precision": args.precision,
        "partitions": args.partitions,
        "ring_points": args.ring_points,
        "synth_sec": round(synth_sec, 1),
        "build_graph_edges_sec": round(build_sec, 1),
        "edges_per_sec": round(n / build_sec, 1),
        "topological_depths_sec": round(depth_sec, 1),
        "n_edges": n_edges,
        "root_children": root_children,
        "golden_edges": golden_edges,
        "golden_depths": golden_depths,
        "mem": sampler.summary(),
    }
    print(json.dumps(result))
    ray.shutdown()
    if not (golden_edges and golden_depths and root_children == 1):
        sys.exit("GOLDEN CHECK FAILED")


if __name__ == "__main__":
    main()
