"""HTTP serving layer tests: routes /reverse /name /tags /raster
/healthz answered over real tile + raster partitions, responses matching
the in-memory reverse_point / raster_lookup answers."""

import json
import threading
import urllib.request

import pytest
import ray.data as rd

from osm_jigsaw_ray.fixtures import build_osm_fixture_tables
from osm_jigsaw_ray.http_api import JigsawApi, make_server
from osm_jigsaw_ray.pipelines.areas import areas_dataset_from_df, resolve_areas
from osm_jigsaw_ray.pipelines.graph import build_graph_edges
from osm_jigsaw_ray.pipelines.tags import extract_taggings, taggings_to_dict
from osm_jigsaw_ray.pipelines.tiling import (
    assign_area_tiles,
    tile_graph_edges,
    write_tiles,
)


@pytest.fixture(scope="module")
def served(ray_session, tmp_path_factory):
    """tiles + raster written once; one live HTTP server for the module."""
    t = build_osm_fixture_tables()
    nodes, ways, relations = (
        rd.from_arrow(t["nodes"]),
        rd.from_arrow(t["ways"]),
        rd.from_arrow(t["relations"]),
    )
    areas_df = resolve_areas(nodes, ways, relations, join_partitions=4).to_pandas()
    edges_df = build_graph_edges(
        areas_dataset_from_df(areas_df), precision=1, join_partitions=4
    ).to_pandas()
    used = {o for ids in areas_df["osm_ids"] for o in ids}
    taggings = taggings_to_dict(extract_taggings(ways, relations, used))

    root = tmp_path_factory.mktemp("http_api")
    tiles = str(root / "tiles")
    assignments = assign_area_tiles(areas_dataset_from_df(areas_df), precision=1)
    write_tiles(
        areas_df,
        tile_graph_edges(rd.from_pandas(edges_df), assignments, join_partitions=4),
        taggings,
        tiles,
    )

    from osm_jigsaw_ray.pipelines.raster import (
        RasterGrid,
        rasterize_areas,
        write_raster_bands,
    )
    from osm_jigsaw_ray.stages.pip import build_area_pack

    pack = build_area_pack(areas_df, edges_df, taggings)
    grid = RasterGrid(180, 360)
    raster = str(root / "raster")
    write_raster_bands(rasterize_areas(pack, grid, band_rows=30), grid, raster, band_rows=30)

    api = JigsawApi(
        tiles, tile_precision=1, raster_root=raster, raster_grid=grid,
        raster_band_rows=30,
    )
    srv = make_server(api)
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    port = srv.server_address[1]
    try:
        yield f"http://127.0.0.1:{port}", pack, grid, raster
    finally:
        srv.shutdown()


def _get(url, headers=None):
    req = urllib.request.Request(url, headers=headers or {})
    try:
        with urllib.request.urlopen(req, timeout=10) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_healthz(served):
    base, *_ = served
    assert _get(f"{base}/healthz") == (200, {"status": "ok"})


def test_reverse_and_name_match_full_pack(served):
    from osm_jigsaw_ray.stages.pip import reverse_point

    base, pack, *_ = served
    for lat, lon, lang in [(0.5, 0.5, "de"), (30.5, 120.5, None), (27.0, -25.0, "en")]:
        q = f"lat={lat}&lon={lon}" + (f"&lang={lang}" if lang else "")
        status, got = _get(f"{base}/reverse?{q}")
        want = reverse_point(pack, lat, lon, lang)
        assert status == 200
        assert got["paths"] == [list(p) for p in want["paths"]]
        assert got["name"] == want["name"]
        status, got_name = _get(f"{base}/name?{q}")
        assert (status, got_name["name"]) == (200, want["name"])


def test_accept_language_header_picks_language(served):
    from osm_jigsaw_ray.stages.pip import reverse_point

    base, pack, *_ = served
    want = reverse_point(pack, 0.5, 0.5, "de")
    _, got = _get(
        f"{base}/name?lat=0.5&lon=0.5", headers={"Accept-Language": "de-DE,de;q=0.9"}
    )
    assert got["name"] == want["name"]


def test_tags_route_tile_local(served):
    base, pack, *_ = served
    # megacity node tags from its own tile
    osm_id = next(
        o for aid in pack["areas"] for o in pack["areas"][aid]["osm_ids"]
        if o in pack["taggings"] and pack["taggings"][o].get("name") == "Megacity"
    )
    _, got = _get(f"{base}/tags?osm_id={osm_id}&lat=30.5&lon=120.5")
    assert got["tags"] == dict(pack["taggings"][osm_id])


def test_raster_route_matches_raster_lookup(served):
    from osm_jigsaw_ray.pipelines.raster import raster_lookup

    base, _, grid, raster = served
    for lat, lon in [(0.5, 0.5), (82.5, 170.5)]:
        _, got = _get(f"{base}/raster?lat={lat}&lon={lon}")
        want = raster_lookup(raster, grid, lat, lon, band_rows=30)
        assert got == {k: want[k] for k in got}
        assert set(want) == set(got)


def test_bad_requests(served):
    base, *_ = served
    status, body = _get(f"{base}/reverse?lat=abc&lon=1")
    assert status == 400 and "error" in body
    status, body = _get(f"{base}/nope")
    assert status == 404


def test_show_resolves_claimed_path(served):
    import numpy as np

    base, pack, *_ = served
    # derive a real multi-node path from /reverse (0.5, 0.5 sits in
    # nested fixture boxes), then claim it back through /show
    _, rev = _get(f"{base}/reverse?lat=0.5&lon=0.5")
    path = max(rev["paths"], key=len)
    assert len(path) >= 2
    q = "/".join(str(a) for a in path)
    status, nodes = _get(f"{base}/show?q={q}&lat=0.5&lon=0.5")
    assert status == 200
    assert [n["id"] for n in nodes] == path
    for n in nodes:
        a = pack["areas"][n["id"]]
        assert np.isclose(n["area"], a["area"])
        assert [e["osmId"] for e in n["entities"]] == list(a["osm_ids"])
        # entity names resolve from taggings (fixture areas are named)
        for e in n["entities"]:
            assert e["name"]
    # components not found are skipped WITHOUT advancing (reference
    # found.foreach semantics): a bogus id mid-path drops only itself
    q_bogus = "/".join([str(path[0]), "999999999"] + [str(a) for a in path[1:]])
    _, nodes2 = _get(f"{base}/show?q={q_bogus}&lat=0.5&lon=0.5")
    assert [n["id"] for n in nodes2] == path


def test_points_returns_leaf_outline(served):
    import numpy as np

    base, pack, *_ = served
    _, rev = _get(f"{base}/reverse?lat=0.5&lon=0.5")
    path = max(rev["paths"], key=len)
    q = "/".join(str(a) for a in path)
    status, pts = _get(f"{base}/points?q={q}&lat=0.5&lon=0.5")
    assert status == 200
    leaf = pack["areas"][path[-1]]
    assert np.allclose([p["lat"] for p in pts], leaf["lats"])
    assert np.allclose([p["lon"] for p in pts], leaf["lons"])
    # unresolvable path -> 404 (reference NotFound)
    status, body = _get(f"{base}/points?q=999999999&lat=0.5&lon=0.5")
    assert status == 404 and "error" in body


def test_s2_grid_http_lifecycle_matches_geohash(served, ray_session, tmp_path):
    """Full tile->serve->reverse lifecycle on the S2 grid: tiles written
    with --tile-grid s2 semantics, served through JigsawApi(grid="s2"),
    pinned route-for-route against the geohash-served answers."""
    import threading

    import ray.data as rd

    from osm_jigsaw_ray.fixtures import build_osm_fixture_tables
    from osm_jigsaw_ray.pipelines.areas import areas_dataset_from_df, resolve_areas
    from osm_jigsaw_ray.pipelines.graph import build_graph_edges
    from osm_jigsaw_ray.pipelines.tags import extract_taggings, taggings_to_dict
    from osm_jigsaw_ray.pipelines.tiling import (
        assign_area_tiles,
        tile_graph_edges,
        write_tiles,
    )

    base_gh, *_ = served
    t = build_osm_fixture_tables()
    areas_df = resolve_areas(
        rd.from_arrow(t["nodes"]), rd.from_arrow(t["ways"]),
        rd.from_arrow(t["relations"]), join_partitions=4,
    ).to_pandas()
    edges_df = build_graph_edges(
        areas_dataset_from_df(areas_df), precision=1, join_partitions=4
    ).to_pandas()
    used = {o for ids in areas_df["osm_ids"] for o in ids}
    taggings = taggings_to_dict(
        extract_taggings(rd.from_arrow(t["ways"]), rd.from_arrow(t["relations"]), used)
    )
    tiles_s2 = str(tmp_path / "tiles_s2")
    assignments = assign_area_tiles(
        areas_dataset_from_df(areas_df), grid="s2", s2_level=5
    )
    write_tiles(
        areas_df,
        tile_graph_edges(rd.from_pandas(edges_df), assignments, join_partitions=4),
        taggings,
        tiles_s2,
    )
    api = JigsawApi(tiles_s2, grid="s2", s2_level=5)
    srv = make_server(api)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    base_s2 = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        for lat, lon in [(0.5, 0.5), (30.5, 120.5), (27.0, -25.0), (-45.0, 105.0)]:
            _, want = _get(f"{base_gh}/reverse?lat={lat}&lon={lon}")
            _, got = _get(f"{base_s2}/reverse?lat={lat}&lon={lon}")
            assert got["paths"] == want["paths"], (lat, lon)
            assert got["name"] == want["name"], (lat, lon)
            if want["paths"]:
                q = "/".join(str(a) for a in max(want["paths"], key=len))
                _, show_want = _get(f"{base_gh}/show?q={q}&lat={lat}&lon={lon}")
                _, show_got = _get(f"{base_s2}/show?q={q}&lat={lat}&lon={lon}")
                assert show_got == show_want, (lat, lon)
    finally:
        srv.shutdown()
