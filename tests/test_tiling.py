"""Tiling tests (C7 semantics): intersect-based area→tile assignment,
induced per-tile graph, lineage manifests + resume skip."""

import os

import pandas as pd
import pyarrow.parquet as pq
import pytest

from osm_jigsaw_ray.fixtures import build_osm_fixture_tables
from osm_jigsaw_ray.geometry import geohash_bbox, geohash_encode
from osm_jigsaw_ray.pipelines.areas import areas_dataset_from_df, resolve_areas
from osm_jigsaw_ray.pipelines.graph import build_graph_edges
from osm_jigsaw_ray.pipelines.tags import extract_taggings, taggings_to_dict
from osm_jigsaw_ray.pipelines.tiling import (
    assign_area_tiles,
    tile_graph_edges,
    write_tiles,
)
from osm_jigsaw_ray.state.manifest import (
    PartitionManifest,
    commit_partition,
    pending_partitions,
    read_manifest,
)
import numpy as np


@pytest.fixture(scope="module")
def polygon_side(ray_session):
    import ray.data as rd

    t = build_osm_fixture_tables()
    nodes = rd.from_arrow(t["nodes"])
    ways = rd.from_arrow(t["ways"])
    relations = rd.from_arrow(t["relations"])
    areas = resolve_areas(nodes, ways, relations, join_partitions=4)
    areas_df = areas.to_pandas()
    edges = build_graph_edges(areas_dataset_from_df(areas_df), precision=1, join_partitions=4)
    return areas_df, edges.to_pandas()


def test_area_tile_assignment(polygon_side, ray_session):
    import ray.data as rd

    areas_df, _ = polygon_side
    assignments = assign_area_tiles(areas_dataset_from_df(areas_df), precision=2).to_pandas()
    # every area appears in at least one tile; every assigned tile's bbox
    # really intersects the area bbox
    assert set(assignments["area_id"]) == set(areas_df["area_id"])
    by_id = areas_df.set_index("area_id", drop=False)
    for _, r in assignments.iterrows():
        b = geohash_bbox(r["tile_id"])
        a = by_id.loc[r["area_id"]]
        assert not (
            b[2] < a["min_lat"] or a["max_lat"] < b[0]
            or b[3] < a["min_lon"] or a["max_lon"] < b[1]
        )
    # the small box lives in exactly the tiles covering (-1..1)^2
    small = by_id[(by_id["area"] == 4.0)].iloc[0]
    small_tiles = set(
        assignments[assignments["area_id"] == small["area_id"]]["tile_id"]
    )
    want = set(
        geohash_encode(
            np.array([-0.9, -0.9, 0.9, 0.9]), np.array([-0.9, 0.9, -0.9, 0.9]), 2
        ).tolist()
    )
    assert want <= small_tiles


def test_area_tile_assignment_s2_grid(polygon_side, ray_session):
    """grid="s2": every area appears; every point inside an area's bbox
    maps (by point encode) to a tile that area is assigned to — the
    superset contract the S2 TileServer needs."""
    from osm_jigsaw_ray.s2 import s2_encode, s2_token

    areas_df, _ = polygon_side
    assignments = assign_area_tiles(
        areas_dataset_from_df(areas_df), grid="s2", s2_level=6
    ).to_pandas()
    assert set(assignments["area_id"]) == set(areas_df["area_id"])
    tiles_by_area = assignments.groupby("area_id")["tile_id"].agg(set).to_dict()
    rng = np.random.default_rng(11)
    for _, a in areas_df.iterrows():
        la = rng.uniform(a["min_lat"], a["max_lat"], 25)
        lo = rng.uniform(a["min_lon"], a["max_lon"], 25)
        toks = set(s2_token(s2_encode(la, lo, 6)).tolist())
        assert toks <= tiles_by_area[a["area_id"]], a["area_id"]


def test_tile_server_s2_grid_matches_full_pack(polygon_side, ray_session, tmp_path):
    import ray.data as rd

    from osm_jigsaw_ray.fixtures import build_osm_fixture_tables as _tbl
    from osm_jigsaw_ray.serve import TileServer
    from osm_jigsaw_ray.stages.pip import build_area_pack, reverse_point

    areas_df, edges_df = polygon_side
    t = _tbl()
    used = {o for ids in areas_df["osm_ids"] for o in ids}
    taggings = taggings_to_dict(
        extract_taggings(
            rd.from_arrow(t["ways"]), rd.from_arrow(t["relations"]), used
        )
    )
    assignments = assign_area_tiles(
        areas_dataset_from_df(areas_df), grid="s2", s2_level=5
    )
    tile_edges = tile_graph_edges(
        rd.from_pandas(edges_df), assignments, join_partitions=4
    )
    out = str(tmp_path / "tiles_s2")
    write_tiles(areas_df, tile_edges.to_pandas(), taggings, out)

    full_pack = build_area_pack(areas_df, edges_df, taggings)
    server = TileServer(out, grid="s2", s2_level=5)
    for lat, lon, lang in [
        (0.5, 0.5, "de"),
        (30.5, 120.5, None),
        (27.0, -25.0, "en"),
        (-45.0, 105.0, "en"),
    ]:
        want = reverse_point(full_pack, lat, lon, lang)
        got = server.reverse(lat, lon, lang)
        assert got["paths"] == want["paths"], (lat, lon)
        assert got["name"] == want["name"], (lat, lon)
    ocean = server.reverse(82.0, 170.0)
    assert ocean["paths"] == [] and ocean["name"] == ""


def test_assign_area_tiles_matches_exact_per_cell_loop(ray_session):
    """Vectorized cover + ring_cells_intersect must reproduce the
    per-(area, cell) rings_intersect loop exactly on a random catalog."""
    import ray.data as rd

    from osm_jigsaw_ray.fixtures import synthetic_area_catalog
    from osm_jigsaw_ray.geometry import geohash_bbox, geohash_cover, rings_intersect

    tbl = synthetic_area_catalog(200, seed=9)
    got = (
        assign_area_tiles(rd.from_arrow(tbl), precision=2)
        .to_pandas()
        .sort_values(["tile_id", "area_id"])
        .reset_index(drop=True)
    )
    want = []
    df = tbl.to_pandas()
    for _, r in df.iterrows():
        rl = np.asarray(r["lats"], dtype=np.float64)
        rn = np.asarray(r["lons"], dtype=np.float64)
        for cell in geohash_cover(
            (r["min_lat"], r["min_lon"], r["max_lat"], r["max_lon"]), 2
        ):
            b = geohash_bbox(cell)
            if rings_intersect(
                rl, rn,
                np.array([b[0], b[0], b[2], b[2]]),
                np.array([b[1], b[3], b[3], b[1]]),
            ):
                want.append((cell, int(r["area_id"])))
    want_df = (
        pd.DataFrame(want, columns=["tile_id", "area_id"])
        .sort_values(["tile_id", "area_id"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want_df)


def test_tile_graph_edges_induced(polygon_side, ray_session):
    import ray.data as rd

    areas_df, edges_df = polygon_side
    assignments = assign_area_tiles(areas_dataset_from_df(areas_df), precision=2)
    tile_edges = tile_graph_edges(
        rd.from_pandas(edges_df), assignments, join_partitions=4
    ).to_pandas()
    # edges only between areas assigned to that tile (or from root)
    adf = assign_area_tiles(areas_dataset_from_df(areas_df), precision=2).to_pandas()
    tile_areas = adf.groupby("tile_id")["area_id"].agg(set).to_dict()
    for _, r in tile_edges.iterrows():
        cell_areas = tile_areas[r["tile_id"]]
        assert r["child_area_id"] in cell_areas
        assert r["parent_area_id"] == -1 or r["parent_area_id"] in cell_areas


def test_write_tiles_and_resume(polygon_side, ray_session, tmp_path):
    import ray.data as rd

    areas_df, edges_df = polygon_side
    t = build_osm_fixture_tables()
    used = {o for ids in areas_df["osm_ids"] for o in ids}
    taggings = taggings_to_dict(
        extract_taggings(
            rd.from_arrow(t["ways"]), rd.from_arrow(t["relations"]), used
        )
    )
    assignments = assign_area_tiles(areas_dataset_from_df(areas_df), precision=1)
    tile_edges = tile_graph_edges(
        rd.from_pandas(edges_df), assignments, join_partitions=4
    ).to_pandas()

    out = str(tmp_path / "tiles")
    committed = write_tiles(areas_df, tile_edges, taggings, out)
    assert committed
    # a committed tile has data + manifest
    name = committed[0]
    assert read_manifest(out, name) is not None
    g = pq.read_table(os.path.join(out, name, "graph.parquet")).to_pandas()
    assert set(g.columns) == {"parent_area_id", "child_area_id"}
    a = pq.read_table(os.path.join(out, name, "areas.parquet"))
    assert a.num_rows > 0
    tg = pq.read_table(os.path.join(out, name, "tags.parquet"))
    assert tg.num_rows > 0

    # resume: nothing pending afterwards; second call is a no-op
    assert pending_partitions(out, committed) == []
    again = write_tiles(areas_df, tile_edges, taggings, out)
    assert again == []


def test_manifest_atomicity(tmp_path):
    out = str(tmp_path / "m")

    def bad_write(tmp_dir):
        with open(os.path.join(tmp_dir, "x"), "w") as f:
            f.write("partial")
        raise RuntimeError("crash mid-write")

    with pytest.raises(RuntimeError):
        commit_partition(
            out, "p1", bad_write, PartitionManifest("p1", 0, "", [])
        )
    assert pending_partitions(out, ["p1"]) == ["p1"]
    # no stray tmp dirs surviving
    assert all(not d.startswith(".p1") for d in os.listdir(out)) if os.path.exists(out) else True

    def good_write(tmp_dir):
        with open(os.path.join(tmp_dir, "x"), "w") as f:
            f.write("ok")

    commit_partition(out, "p1", good_write, PartitionManifest("p1", 1, "f", ["i"]))
    assert pending_partitions(out, ["p1"]) == []
    m = read_manifest(out, "p1")
    assert m.rows == 1 and m.inputs == ["i"]


def test_tile_server_reverse_matches_full_pack(polygon_side, ray_session, tmp_path):
    """ST6 analog: reverse geocoding served from lazily-loaded tile
    partitions must agree with the full in-memory pack for contained
    points, without ever loading the global pack."""
    import ray.data as rd

    from osm_jigsaw_ray.serve import TileServer
    from osm_jigsaw_ray.stages.pip import build_area_pack, reverse_point

    areas_df, edges_df = polygon_side
    t = build_osm_fixture_tables()
    used = {o for ids in areas_df["osm_ids"] for o in ids}
    taggings = taggings_to_dict(
        extract_taggings(
            rd.from_arrow(t["ways"]), rd.from_arrow(t["relations"]), used
        )
    )
    assignments = assign_area_tiles(areas_dataset_from_df(areas_df), precision=1)
    tile_edges = tile_graph_edges(
        rd.from_pandas(edges_df), assignments, join_partitions=4
    )
    out = str(tmp_path / "tiles_srv")
    write_tiles(areas_df, tile_edges, taggings, out)

    full_pack = build_area_pack(areas_df, edges_df, taggings)
    server = TileServer(out, tile_precision=1)

    points = [
        (0.5, 0.5, "de"),     # nested trio interior
        (30.5, 120.5, None),  # megacity
        (1.5, 0.0, None),     # medium band
        (27.0, -25.0, "en"),  # fits_both overlap region
        (-45.0, 105.0, "en"), # archipelago mainland
    ]
    for lat, lon, lang in points:
        want = reverse_point(full_pack, lat, lon, lang)
        got = server.reverse(lat, lon, lang)
        assert got["paths"] == want["paths"], (lat, lon)
        assert got["name"] == want["name"], (lat, lon)
        assert got["cell_id"] == want["cell_id"]

    # ocean point: its tile has no partition -> empty result, no error
    ocean = server.reverse(82.0, 170.0)
    assert ocean["paths"] == [] and ocean["name"] == ""

    # LRU stays bounded
    assert len(server._cache) <= server.cache_tiles


def test_extract_taggings_semijoin_matches_broadcast(polygon_side, ray_session):
    """The distributed used-id semi-join must return exactly the
    broadcast-set variant's rows."""
    import ray.data as rd

    from osm_jigsaw_ray.pipelines.tags import (
        extract_taggings,
        extract_taggings_semijoin,
    )

    areas_df, _ = polygon_side
    t = build_osm_fixture_tables()
    ways = rd.from_arrow(t["ways"])
    relations = rd.from_arrow(t["relations"])
    used = {o for ids in areas_df["osm_ids"] for o in ids}

    want = (
        extract_taggings(ways, relations, used)
        .to_pandas()
        .assign(tags=lambda d: d["tags"].map(lambda x: tuple(map(tuple, (sorted((e["key"], e["value"]) for e in x))))))
        .sort_values("osm_id")
        .reset_index(drop=True)
    )
    got = (
        extract_taggings_semijoin(ways, relations, areas_dataset_from_df(areas_df))
        .to_pandas()
        .assign(tags=lambda d: d["tags"].map(lambda x: tuple(map(tuple, (sorted((e["key"], e["value"]) for e in x))))))
        .sort_values("osm_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)


def test_write_tiles_hash_shuffle_parity(polygon_side, ray_session, tmp_path):
    """The actor-aggregated hash-shuffle strategy must commit exactly
    the same tiles with exactly the same parquet contents as the
    default sort shuffle — same memberships, same per-tile areas /
    edges / tags ordering (write_partition sorts within tiles, so the
    files are deterministic under either shuffle)."""
    import ray.data as rd

    from osm_jigsaw_ray.pipelines.shuffle import shuffle_strategy

    areas_df, edges_df = polygon_side
    t = build_osm_fixture_tables()
    used = {o for ids in areas_df["osm_ids"] for o in ids}
    taggings = taggings_to_dict(
        extract_taggings(
            rd.from_arrow(t["ways"]), rd.from_arrow(t["relations"]), used
        )
    )
    assignments = assign_area_tiles(areas_dataset_from_df(areas_df), precision=1)
    tile_edges = tile_graph_edges(
        rd.from_pandas(edges_df), assignments, join_partitions=4
    ).to_pandas()

    out_sort = str(tmp_path / "tiles_sort")
    with shuffle_strategy("sort"):
        committed_sort = write_tiles(areas_df, tile_edges, taggings, out_sort)

    out_hash = str(tmp_path / "tiles_hash")
    with shuffle_strategy("hash"):
        committed_hash = write_tiles(areas_df, tile_edges, taggings, out_hash)

    assert committed_hash == committed_sort
    for name in committed_sort:
        for f in ("graph.parquet", "areas.parquet", "tags.parquet"):
            a = pq.read_table(os.path.join(out_sort, name, f))
            b = pq.read_table(os.path.join(out_hash, name, f))
            assert a.equals(b), (name, f)
