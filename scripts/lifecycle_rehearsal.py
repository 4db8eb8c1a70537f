"""Chained full-lifecycle rehearsal (round-4 verdict item #6).

One CLI run ``areas -> graph -> tags -> tile -> join --tiled`` at 1M
areas / 1M pages under the ENGINE DEFAULT strategy — the ``go.bash``
analog at rehearsal scale (reference ``go.bash:10-20`` chains the same
steps), proving the steps COMPOSE under hash mode, not just pass
individually. Records per-step wall time + per-step driver/worker peak
RSS (each step is its own ``python -m osm_jigsaw_ray.cli`` process,
exactly how a planet run would execute) and finishes with a golden-row
check.

Input synthesis (driver-side, chunked parquet, untimed):
  * the NESTED 4-ary grid hierarchy of graph_rehearsal.py, expressed as
    raw OSM ENTITIES — 4 corner nodes + 1 closed named way per area —
    so the `areas` step does real ring assembly / way→points joins and
    the `graph` step's output is known in closed form (n edges: one
    direct parent per area + one ROOT edge);
  * 1M synthetic crawl pages (the bench corpus generator).

Golden checks:
  * areas count == n, graph edge count == n (the closed-form tree);
  * join rows == n_pages;
  * golden ROWS: for a deterministic sample of pages, the engine's
    containment chain (join-row ``area_ids`` mapped to osm ids through
    the areas table) must equal the chain computed independently from
    the grid construction (a page point at (lat, lon) is inside the
    level-l box iff it clears the inset bounds of its level-l cell).

Usage:
    python scripts/lifecycle_rehearsal.py [--areas 1000000]
        [--pages 1000000] [--partitions 64] [--tile-precision 3]
        [--sample 500]

Prints one JSON line; paste the summary into BENCH_RESULTS.md.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import time
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))
sys.path.insert(0, str(ROOT / "scripts"))

from graph_rehearsal import LAT0, LAT1, LON0, LON1, level_sizes  # noqa: E402
from tile_rehearsal import RssSampler  # noqa: E402

CHUNK = 100_000


def _level_boxes(lvl: int, cells: np.ndarray):
    """Inset box bounds for level-`lvl` cells — the graph_rehearsal
    construction (absolute inset grows with depth => strict nesting)."""
    side = 2**lvl
    row, col = cells // side, cells % side
    dla = (LAT1 - LAT0) / side
    dlo = (LON1 - LON0) / side
    inset = 0.0001 * (lvl + 1)
    la0 = LAT0 + row * dla + inset
    la1 = LAT0 + (row + 1) * dla - inset
    lo0 = LON0 + col * dlo + inset
    lo1 = LON0 + (col + 1) * dlo - inset
    return la0, la1, lo0, lo1


def synth_entities(osm_dir: str, n: int) -> tuple[float, list[int]]:
    """Chunked nodes/ways parquet for the nested hierarchy: area gid
    (level offset + cell) -> way_id = gid, 4 corner nodes 4*gid..4*gid+3,
    closed + named => resolve_areas yields exactly one area per way."""
    from osm_jigsaw_ray.model import (
        NODES_SCHEMA,
        RELATIONS_SCHEMA,
        WAYS_SCHEMA,
    )

    t0 = time.time()
    for sub in ("nodes", "ways", "relations"):
        d = f"{osm_dir}/{sub}.parquet"
        if os.path.isdir(d):
            shutil.rmtree(d)
        os.makedirs(d)
    sizes = level_sizes(n)
    part = 0
    for lvl, count in enumerate(sizes):
        offset = (4**lvl - 1) // 3
        for off in range(0, count, CHUNK):
            m = min(CHUNK, count - off)
            cells = np.arange(off, off + m, dtype=np.int64)
            gids = offset + cells
            la0, la1, lo0, lo1 = _level_boxes(lvl, cells)
            # corners CCW: (la0,lo0) (la0,lo1) (la1,lo1) (la1,lo0)
            nid = (4 * gids[:, None] + np.arange(4)[None, :]).reshape(-1)
            lat = np.stack([la0, la0, la1, la1], axis=1).reshape(-1)
            lon = np.stack([lo0, lo1, lo1, lo0], axis=1).reshape(-1)
            nodes = pa.table(
                {
                    "node_id": pa.array(nid, pa.int64()),
                    "lat": pa.array(lat, pa.float64()),
                    "lon": pa.array(lon, pa.float64()),
                    "tags": pa.array([[]] * nid.size, NODES_SCHEMA.field("tags").type),
                }
            )
            node_ids = np.concatenate(
                [4 * gids[:, None] + np.arange(4)[None, :], 4 * gids[:, None]],
                axis=1,
            )
            ways = pa.table(
                {
                    "way_id": pa.array(gids, pa.int64()),
                    "node_ids": pa.array(node_ids.tolist(), pa.list_(pa.int64())),
                    "tags": pa.array(
                        [
                            [{"key": "name", "value": f"Area {g}"}]
                            for g in gids.tolist()
                        ],
                        WAYS_SCHEMA.field("tags").type,
                    ),
                }
            )
            pq.write_table(nodes, f"{osm_dir}/nodes.parquet/part-{part:05d}.parquet")
            pq.write_table(ways, f"{osm_dir}/ways.parquet/part-{part:05d}.parquet")
            part += 1
    empty_rels = pa.table(
        {f.name: pa.array([], f.type) for f in RELATIONS_SCHEMA}
    )
    pq.write_table(empty_rels, f"{osm_dir}/relations.parquet/part-00000.parquet")
    return time.time() - t0, sizes


def synth_pages(osm_dir: str, n_pages: int, ncpu: int) -> float:
    """The bench page corpus, written once to {osm}/pages.parquet."""
    t0 = time.time()
    d = f"{osm_dir}/pages.parquet"
    if os.path.isdir(d) and os.listdir(d):
        return 0.0
    import ray

    ray.init(
        address="local", num_cpus=ncpu, include_dashboard=False,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from osm_jigsaw_ray.sources.pages import synthetic_pages

    synthetic_pages(n_pages, parallelism=256, filler_kb=2).write_parquet(d)
    ray.shutdown()
    return time.time() - t0


def expected_chain(lat: float, lon: float, sizes: list[int]) -> list[int]:
    """Deepest-first gid chain of nested boxes containing the point —
    computed straight from the grid arithmetic, independent of the
    engine."""
    chain = []
    for lvl, count in enumerate(sizes):
        side = 2**lvl
        dla = (LAT1 - LAT0) / side
        dlo = (LON1 - LON0) / side
        row = int((lat - LAT0) // dla)
        col = int((lon - LON0) // dlo)
        if not (0 <= row < side and 0 <= col < side):
            continue
        cell = row * side + col
        if cell >= count:
            continue
        la0, la1, lo0, lo1 = _level_boxes(lvl, np.array([cell]))
        if la0[0] < lat < la1[0] and lo0[0] < lon < lo1[0]:
            chain.append((4**lvl - 1) // 3 + cell)
    return list(reversed(chain))  # deepest first


def golden_rows(build: str, sizes: list[int], sample: int, n_pages: int) -> dict:
    """Engine join rows vs the construction for a deterministic page
    sample. Check-side only (the script may hold the areas id->osm map;
    the ENGINE never did)."""
    import duckdb

    from osm_jigsaw_ray.fixtures import page_points
    from osm_jigsaw_ray.model import parse_osm_id

    con = duckdb.connect()
    rng = np.random.default_rng(7)
    ids = np.sort(rng.choice(n_pages, size=sample, replace=False))
    urls = [f"https://example.org/p/{i:08d}" for i in ids.tolist()]
    lat, lon = page_points(ids)
    rows = con.execute(
        "SELECT url, area_ids FROM read_parquet(?) WHERE url IN ("
        + ",".join("?" * len(urls))
        + ")",
        [f"{build}/join_rows/*.parquet", *urls],
    ).fetchall()
    got_by_url = {u: a for u, a in rows}
    # area_id -> osm way gid (areas table scan, check-side)
    amap = {}
    for aid, osm_ids in con.execute(
        f"SELECT area_id, osm_ids FROM read_parquet('{build}/areas/*.parquet')"
    ).fetchall():
        amap[aid] = parse_osm_id(osm_ids[0])[0]
    mismatches = []
    for i, u in enumerate(urls):
        want = expected_chain(float(lat[i]), float(lon[i]), sizes)
        got = [amap[a] for a in (got_by_url.get(u) or [])]
        if sorted(got) != sorted(want):
            mismatches.append({"url": u, "want": want, "got": got})
    return {
        "sampled": len(urls),
        "found": len(rows),
        "mismatches": mismatches[:5],
        "n_mismatches": len(mismatches),
    }


def run_step(argv: list[str], env: dict) -> tuple[float, dict]:
    sampler = RssSampler()
    sampler.start()
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, "-m", "osm_jigsaw_ray.cli", *argv],
        env=env, cwd=str(ROOT), capture_output=True, text=True,
    )
    dt = time.time() - t0
    sampler.stop.set()
    sampler.join(timeout=5)
    if proc.returncode != 0:
        print(proc.stdout[-2000:], file=sys.stderr)
        print(proc.stderr[-4000:], file=sys.stderr)
        raise RuntimeError(f"step {argv[0]} failed (rc={proc.returncode})")
    print(f"  {argv[0]}: {dt:.1f}s  {proc.stdout.strip().splitlines()[-1] if proc.stdout.strip() else ''}", file=sys.stderr)
    return dt, {
        "driver_peak_mb": {k: round(v, 1) for k, v in sampler.driver.items()},
        "worker_peak_mb": {k: round(v, 1) for k, v in sampler.worker.items()},
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--areas", type=int, default=1_000_000)
    ap.add_argument("--pages", type=int, default=1_000_000)
    ap.add_argument("--partitions", type=int, default=64)
    ap.add_argument("--tile-precision", type=int, default=3)
    ap.add_argument("--sample", type=int, default=500)
    ap.add_argument("--root", default="/tmp/ray_jigsaw_lifecycle")
    args = ap.parse_args()

    osm_dir = f"{args.root}/osm"
    build = f"{args.root}/build"
    os.makedirs(osm_dir, exist_ok=True)
    os.makedirs(build, exist_ok=True)
    ncpu = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

    synth_sec, sizes = synth_entities(osm_dir, args.areas)
    n = sum(sizes)
    pages_sec = synth_pages(osm_dir, args.pages, ncpu)
    print(
        f"synth: {n} areas ({len(sizes)} levels) in {synth_sec:.1f}s, "
        f"{args.pages} pages in {pages_sec:.1f}s",
        file=sys.stderr,
    )

    env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
    env.pop("GRAFT_SHUFFLE", None)  # the point: the ENGINE DEFAULT
    common = ["--osm", osm_dir, "--build", build,
              "--partitions", str(args.partitions)]
    steps: dict[str, dict] = {}
    t_all = time.time()
    for argv in (
        ["areas", *common],
        ["graph", *common, "--cell-precision", "2"],
        ["tags", *common],
        ["tile", *common, "--tile-precision", str(args.tile_precision)],
        ["join", *common, "--tiled", "--tile-precision", str(args.tile_precision)],
    ):
        dt, mem = run_step(argv, env)
        steps[argv[0]] = {"sec": round(dt, 1), **mem}
    total_sec = time.time() - t_all

    import duckdb

    con = duckdb.connect()
    n_areas = con.execute(
        f"SELECT count(*) FROM read_parquet('{build}/areas/*.parquet')"
    ).fetchone()[0]
    n_edges = con.execute(
        f"SELECT count(*) FROM read_parquet('{build}/graph_edges/*.parquet')"
    ).fetchone()[0]
    n_join = con.execute(
        f"SELECT count(*) FROM read_parquet('{build}/join_rows/*.parquet')"
    ).fetchone()[0]
    golden = golden_rows(build, sizes, args.sample, args.pages)

    result = {
        "metric": "lifecycle_rehearsal",
        "areas": n,
        "pages": args.pages,
        "partitions": args.partitions,
        "tile_precision": args.tile_precision,
        "synth_sec": round(synth_sec + pages_sec, 1),
        "steps": steps,
        "total_sec": round(total_sec, 1),
        "n_areas": n_areas,
        "n_edges": n_edges,
        "n_join_rows": n_join,
        "golden_areas": n_areas == n,
        "golden_edges": n_edges == n,
        "golden_join_count": n_join == args.pages,
        "golden_rows": golden,
    }
    print(json.dumps(result))
    ok = (
        result["golden_areas"]
        and result["golden_edges"]
        and result["golden_join_count"]
        and golden["n_mismatches"] == 0
        and golden["found"] == golden["sampled"]
    )
    if not ok:
        sys.exit("GOLDEN CHECK FAILED")


if __name__ == "__main__":
    main()
