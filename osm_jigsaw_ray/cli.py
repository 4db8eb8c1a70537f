"""Step-selector CLI — the analog of the reference's ``-s <step>``
dispatch + ``go.bash`` step runner (``Main.scala:40-55``,
``go.bash:10-20``): each step reads the previous step's parquet and
writes its own, so the pipeline is resumable step-wise (and per-partition
within ``tile``/``join`` via lineage manifests).

    python -m osm_jigsaw_ray.cli synth --out /tmp/build/osm [--pages N]
    python -m osm_jigsaw_ray.cli areas --osm /tmp/build/osm --build /tmp/build
    # --osm may also point at a real extract: --osm planet.osm.pbf (S1)
    python -m osm_jigsaw_ray.cli graph --build /tmp/build
    python -m osm_jigsaw_ray.cli tags  --osm /tmp/build/osm --build /tmp/build
    python -m osm_jigsaw_ray.cli tile  --build /tmp/build
    python -m osm_jigsaw_ray.cli raster --build /tmp/build
    python -m osm_jigsaw_ray.cli join  --osm /tmp/build/osm --build /tmp/build [--partitioned]
    python -m osm_jigsaw_ray.cli dump  --build /tmp/build
"""

from __future__ import annotations

import argparse
import os
import sys
import time


def _ray_up():
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "8")),
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False


def _read(path):
    import ray.data as rd

    return rd.read_parquet(path)


def _read_pages(path):
    """Pruned, fusion-eligible page-corpus read (text re-derives from
    html; one block per file keeps Read->Map fusion eligible)."""
    from .sources.pages import PAGE_READ_COLS, read_pages

    return read_pages(path, columns=PAGE_READ_COLS)


def _read_entities(osm: str, entity_type: str):
    """Entity-table source: a directory of parquet tables, or a real
    ``.osm.pbf`` extract (S1 — parsed by the pure-python blob-parallel
    reader in ``sources/pbf.py``)."""
    if osm.endswith(".pbf"):
        from .sources.pbf import read_osm_pbf

        return read_osm_pbf(osm, entity_type)
    return _read(f"{osm}/{entity_type}.parquet")


def _clear_dir(path):
    import shutil

    if os.path.isdir(path):
        shutil.rmtree(path)


def step_synth(args):
    import pyarrow.parquet as pq

    from .fixtures import build_osm_fixture_tables, generate_pages

    os.makedirs(args.out, exist_ok=True)
    for name, table in build_osm_fixture_tables().items():
        pq.write_table(table, f"{args.out}/{name}.parquet")
    pq.write_table(generate_pages(args.pages), f"{args.out}/pages.parquet")
    from .sources.pbf import write_osm_pbf

    write_osm_pbf(build_osm_fixture_tables(), f"{args.out}/fixture.osm.pbf")
    print(f"synth: wrote nodes/ways/relations/pages (+ fixture.osm.pbf) under {args.out}")


def step_areas(args):
    _ray_up()
    from .pipelines.areas import resolve_areas

    areas = resolve_areas(
        _read_entities(args.osm, "nodes"),
        _read_entities(args.osm, "ways"),
        _read_entities(args.osm, "relations"),
        join_partitions=args.partitions,
    )
    out = f"{args.build}/areas"
    _clear_dir(out)
    areas.write_parquet(out)
    print(f"areas: wrote {out}")


def step_graph(args):
    _ray_up()
    from .pipelines.graph import build_graph_edges

    edges = build_graph_edges(
        _read(f"{args.build}/areas"),
        precision=args.cell_precision,
        join_partitions=args.partitions,
    )
    out = f"{args.build}/graph_edges"
    _clear_dir(out)
    edges.write_parquet(out)
    print(f"graph: wrote {out}")


def step_tags(args):
    _ray_up()
    from .pipelines.tags import extract_taggings_semijoin

    # distributed semi-join: the used-id side streams from the areas
    # table — no driver-held id set (15M-area planets have heap-sized
    # used sets)
    taggings = extract_taggings_semijoin(
        _read_entities(args.osm, "ways"),
        _read_entities(args.osm, "relations"),
        _read(f"{args.build}/areas"),
        num_partitions=args.partitions,
    )
    out = f"{args.build}/taggings"
    _clear_dir(out)
    taggings.write_parquet(out)
    print(f"tags: wrote {out}")


def _load_pack(build):
    from .model import tags_to_dict
    from .stages.pip import build_area_pack

    areas_df = _read(f"{build}/areas").to_pandas()
    edges_df = _read(f"{build}/graph_edges").to_pandas()
    tags_df = _read(f"{build}/taggings").to_pandas()
    taggings = {
        r["osm_id"]: tags_to_dict(r["tags"]) for _, r in tags_df.iterrows()
    }
    return build_area_pack(areas_df, edges_df, taggings), areas_df, edges_df


def step_tile(args):
    _ray_up()
    from .pipelines.tiling import assign_area_tiles, tile_graph_edges, write_tiles

    # streaming end-to-end: areas/edges/taggings stay Datasets — nothing
    # catalog-sized touches the driver or gets broadcast
    areas = _read(f"{args.build}/areas")
    assignments = assign_area_tiles(
        areas,
        precision=args.tile_precision,
        grid=args.tile_grid,
        s2_level=args.s2_level,
    )
    tile_edges = tile_graph_edges(
        _read(f"{args.build}/graph_edges"), assignments,
        join_partitions=args.partitions,
    )
    out = f"{args.build}/tiles"
    done = write_tiles(
        areas, tile_edges, _read(f"{args.build}/taggings"), out,
        num_partitions=args.partitions,
    )
    print(f"tile: committed {len(done)} new partitions under {out}")


def step_raster(args):
    _ray_up()
    from .pipelines.raster import (
        RasterGrid,
        rasterize_areas,
        rasterize_areas_grouped,
        write_raster_bands,
    )

    grid = RasterGrid(args.raster_rows, args.raster_rows * 2)
    if args.grouped:
        # shuffle path: streams the areas Dataset — no driver-side pack
        runs = rasterize_areas_grouped(
            _read(f"{args.build}/areas"), grid, band_rows=args.band_rows
        )
    else:
        pack, _, _ = _load_pack(args.build)
        runs = rasterize_areas(pack, grid, band_rows=args.band_rows)
    out = f"{args.build}/raster"
    done = write_raster_bands(runs, grid, out, band_rows=args.band_rows)
    print(f"raster: committed {len(done)} new band partitions under {out}")


def step_join(args):
    _ray_up()
    from .pipelines.pages import (
        geo_join_pages,
        geo_join_pages_partitioned,
        geo_join_pages_tiled,
        write_join_rows,
    )

    if args.tiled:
        # fully out-of-core path: polygons read lazily per shuffle group
        # from the `tile` step's partitions; the only global structure is
        # the slim kNN/taggings side object (never the polygon pack)
        from .stages.pip import build_knn_side_from_tables

        tiles_root = f"{args.build}/tiles"
        if not os.path.isdir(tiles_root):
            sys.exit("join --tiled: run the tile step first")
        shared = build_knn_side_from_tables(
            _read(f"{args.build}/areas"), _read(f"{args.build}/taggings")
        )
        pages = _read_pages(f"{args.osm}/pages.parquet")
        t0 = time.time()
        joined = geo_join_pages_tiled(
            pages, tiles_root, shared, tiles_precision=args.tile_precision
        )
        out = f"{args.build}/join_rows"
        _clear_dir(out)
        joined.write_parquet(out)
        n = _read(out).count()
        dt = time.time() - t0
        print(f"join: {n} rows -> {out} in {dt:.1f}s ({n/dt:.0f} pages/s, tiled)")
        return

    if args.partitioned:
        # Dataset-native co-partitioned join (no _load_pack: the polygon
        # side must never be rebuilt whole on the driver — the
        # reference's single-heap bottleneck is the thing this path
        # exists to remove)
        from .stages.pip import build_knn_side_from_tables

        shared = build_knn_side_from_tables(
            _read(f"{args.build}/areas"), _read(f"{args.build}/taggings")
        )
        pages = _read_pages(f"{args.osm}/pages.parquet")
        t0 = time.time()
        joined = geo_join_pages_partitioned(
            pages,
            _read(f"{args.build}/areas"),
            _read(f"{args.build}/graph_edges"),
            shared,  # slim kNN arrays + naming projection only
            taggings=_read(f"{args.build}/taggings"),  # rides the co-partition
            join_partitions=args.partitions,
        )
        out = f"{args.build}/join_rows"
        _clear_dir(out)
        joined.write_parquet(out)
        n = _read(out).count()
        dt = time.time() - t0
        print(f"join: {n} rows -> {out} in {dt:.1f}s ({n/dt:.0f} pages/s, partitioned)")
        return

    pack, _, _ = _load_pack(args.build)
    if args.resumable:
        # checkpoint-resumable path: one committed partition per input
        # shard; rerun skips finished shards (never re-reads their pages)
        corpus = f"{args.osm}/pages_shards"
        if not os.path.isdir(corpus):
            # atomic: write the shard corpus to a tmp dir and rename on
            # completion — a crash mid-write must not leave a partial
            # directory that a rerun would silently treat as the full
            # corpus (permanent data loss on the resume path)
            import shutil

            tmp = f"{corpus}.tmp"
            if os.path.isdir(tmp):
                shutil.rmtree(tmp)
            _read(f"{args.osm}/pages.parquet").repartition(
                args.partitions
            ).write_parquet(tmp)
            os.replace(tmp, corpus)
        out = f"{args.build}/join_parts"
        t0 = time.time()
        done = write_join_rows(corpus, pack, out)
        dt = time.time() - t0
        print(f"join: committed {len(done)} new shard partitions -> {out} in {dt:.1f}s")
        return
    pages = _read_pages(f"{args.osm}/pages.parquet")
    t0 = time.time()
    # default (no concurrency) = read-fused task path: html never
    # crosses the object store (see pipelines.pages.geo_join_pages)
    joined = geo_join_pages(pages, pack)
    out = f"{args.build}/join_rows"
    # overwrite, don't append: write_parquet adds files to an existing
    # dir, so a re-run would silently double the row count
    _clear_dir(out)
    # paths is list<list<int64>>; parquet handles nested lists fine
    joined.write_parquet(out)
    n = _read(out).count()
    dt = time.time() - t0
    print(f"join: {n} rows -> {out} in {dt:.1f}s ({n/dt:.0f} pages/s)")


def step_dump(args):
    _ray_up()
    from .pipelines.dump import dump_names

    pack, _, _ = _load_pack(args.build)
    out = f"{args.build}/leaf_names"
    _clear_dir(out)
    dump_names(pack).write_parquet(out)
    print(f"dump: wrote {out}")


STEPS = {
    "synth": step_synth,
    "areas": step_areas,
    "graph": step_graph,
    "tags": step_tags,
    "tile": step_tile,
    "raster": step_raster,
    "join": step_join,
    "dump": step_dump,
}


def main(argv=None):
    p = argparse.ArgumentParser(prog="osm_jigsaw_ray", description=__doc__)
    p.add_argument("step", choices=STEPS)
    p.add_argument("--osm", default="/tmp/ray_jigsaw/osm")
    p.add_argument("--build", default="/tmp/ray_jigsaw/build")
    p.add_argument("--out", default="/tmp/ray_jigsaw/osm")
    p.add_argument("--pages", type=int, default=2000)
    p.add_argument("--partitions", type=int, default=8)
    p.add_argument("--cell-precision", type=int, default=1)
    p.add_argument("--tile-precision", type=int, default=2)
    p.add_argument("--tile-grid", choices=("geohash", "s2"), default="geohash")
    p.add_argument("--s2-level", type=int, default=7)
    p.add_argument("--raster-rows", type=int, default=180)
    p.add_argument("--band-rows", type=int, default=30)
    p.add_argument("--partitioned", action="store_true")
    p.add_argument("--resumable", action="store_true")
    p.add_argument("--tiled", action="store_true")
    p.add_argument("--grouped", action="store_true")
    p.add_argument(
        "--shuffle",
        choices=("sort", "hash"),
        default=os.environ.get("GRAFT_SHUFFLE", "hash"),
        help="all-to-all strategy. Default 'hash' (actor-aggregated; "
        "keeps driver memory flat on catalog-scale shuffles — the sort "
        "strategy's driver heap grows with the catalog and crashed the "
        "raylet at 1M areas; see pipelines.shuffle.enable_hash_shuffle). "
        "'sort' (the Ray default) stays as the opt-out.",
    )
    args = p.parse_args(argv)
    os.makedirs(args.build, exist_ok=True)
    if args.step != "synth":  # synth is pure driver-side parquet writing
        _ray_up()
        from .pipelines.shuffle import disable_hash_shuffle, enable_hash_shuffle

        if args.shuffle == "hash":
            enable_hash_shuffle()
        else:
            disable_hash_shuffle()
    STEPS[args.step](args)


if __name__ == "__main__":
    main()
    import ray

    if ray.is_initialized():
        ray.shutdown()
