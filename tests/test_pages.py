"""End-to-end page-join tests: extraction invariant, PIP descent paths,
kNN fallback, naming, tile assignment; broadcast vs salted-partitioned
join parity (the N-vs-4N determinism surface)."""

import numpy as np
import pandas as pd
import pytest

from osm_jigsaw_ray.fixtures import BOXES, build_osm_fixture_tables, generate_pages
from osm_jigsaw_ray.geometry import geohash_encode
from osm_jigsaw_ray.pipelines.areas import areas_dataset_from_df, resolve_areas
from osm_jigsaw_ray.pipelines.graph import build_graph_edges
from osm_jigsaw_ray.pipelines.pages import (
    extract_pages,
    geo_join_pages,
    geo_join_pages_partitioned,
)
from osm_jigsaw_ray.pipelines.tags import extract_taggings, taggings_to_dict
from osm_jigsaw_ray.stages.pip import build_area_pack

N_PAGES = 300


@pytest.fixture(scope="module")
def polygon_side(ray_session):
    import ray.data as rd

    t = build_osm_fixture_tables()
    nodes = rd.from_arrow(t["nodes"])
    ways = rd.from_arrow(t["ways"])
    relations = rd.from_arrow(t["relations"])
    areas_df = resolve_areas(nodes, ways, relations, join_partitions=4).to_pandas()
    edges_df = build_graph_edges(
        areas_dataset_from_df(areas_df), precision=1, join_partitions=4
    ).to_pandas()
    used = {o for ids in areas_df["osm_ids"] for o in ids}
    taggings = taggings_to_dict(extract_taggings(ways, relations, used))
    return build_area_pack(areas_df, edges_df, taggings), areas_df, edges_df


@pytest.fixture(scope="module")
def joined(polygon_side):
    import ray.data as rd

    pack, _, _ = polygon_side
    pages = rd.from_arrow(generate_pages(N_PAGES))
    out = geo_join_pages(pages, pack, concurrency=2, extract_concurrency=2)
    df = out.to_pandas().sort_values("url").reset_index(drop=True)
    return df


def test_extraction_byte_identical(ray_session):
    import ray.data as rd

    pages = generate_pages(200)
    extracted = extract_pages(rd.from_arrow(pages), concurrency=2).to_pandas()
    extracted = extracted.sort_values("url").reset_index(drop=True)
    want = pages.to_pandas().sort_values("url").reset_index(drop=True)
    assert (extracted["text"] == want["text"]).all()
    assert "html" not in extracted.columns


def test_geo_resolution_roundtrips_points(ray_session):
    import ray.data as rd

    from osm_jigsaw_ray.fixtures import page_points

    pages = generate_pages(200)
    extracted = extract_pages(rd.from_arrow(pages), concurrency=2).to_pandas()
    extracted = extracted.sort_values("url").reset_index(drop=True)
    lat, lon = page_points(np.arange(200))
    assert np.array_equal(extracted["lat"].to_numpy(), lat)
    assert np.array_equal(extracted["lon"].to_numpy(), lon)


def _expected_region(i: int) -> str:
    u = ((i * 2654435761 + 12345) % 4294967296) / 4294967296.0
    for kind, hi in [
        ("megacity", 0.35), ("small", 0.50), ("medium_band", 0.60),
        ("fits_both", 0.70), ("left_only", 0.80), ("arch", 0.90), ("ocean", 1.01),
    ]:
        if u < hi:
            return kind
    raise AssertionError


def test_join_rows_nested_paths(joined, polygon_side):
    pack, areas_df, _ = polygon_side

    def area_id_of(osm_suffix_box):
        lat0, lat1, lon0, lon1 = BOXES[osm_suffix_box]
        m = areas_df[
            (areas_df["min_lat"] == lat0) & (areas_df["max_lat"] == lat1)
            & (areas_df["min_lon"] == lon0) & (areas_df["max_lon"] == lon1)
        ]
        assert len(m) == 1
        return int(m.iloc[0]["area_id"])

    large, excl, med, small = (
        area_id_of("large"), area_id_of("excluded"),
        area_id_of("medium"), area_id_of("small"),
    )
    for i, row in joined.iterrows():
        region = _expected_region(i)
        paths = [list(p) for p in row["paths"]]
        area_ids = list(row["area_ids"])
        if region == "small":
            assert paths == [[large, excl, med, small]]
        elif region == "medium_band":
            assert paths == [[large, excl, med]]
        elif region == "megacity":
            assert area_ids == [area_id_of("megacity")]
        elif region == "ocean":
            assert len(area_ids) == 0
            assert row["nearest_area_id"] >= 0
        elif region == "fits_both":
            # multi-parent: two paths, one through left, one through overlapping
            assert len(paths) == 2
            leaves = {p[-1] for p in paths}
            assert leaves == {area_id_of("fits_both")}
            firsts = {p[0] for p in paths}
            assert firsts == {area_id_of("left"), area_id_of("overlapping")}


def test_join_rows_naming(joined):
    for i, row in joined.iterrows():
        region = _expected_region(i)
        if region == "small":
            # excluded (timezone) dropped; largest-first concatenation;
            # lang-preferred name for 'small' where available
            if row["lang"] == "de":
                assert row["name"] == "Grossland, Medium, Kleinburg"
            elif row["lang"] == "en":
                assert row["name"] == "Large, Medium, Small"
            else:  # fr/es: no name:<lang> -> fallback to bare `name`
                assert row["name"] == "Large, Medium, Klein"
        elif region == "megacity":
            assert row["name"] == "Megacity"
        elif region == "left_only":
            assert row["name"] == "Left"


def test_tile_assignment_matches_geohash(joined):
    want = geohash_encode(
        joined["lat"].to_numpy(), joined["lon"].to_numpy(), 3
    )
    assert (joined["cell_id"].to_numpy() == want).all()


def test_reverse_point_api(polygon_side):
    from osm_jigsaw_ray.stages.pip import reverse_point

    pack, _, _ = polygon_side
    # point inside the nested chain
    r = reverse_point(pack, 0.5, 0.5)
    assert r["name"] == "Large, Medium, Small"
    assert len(r["paths"]) == 1 and len(r["paths"][0]) == 4
    assert r["nearest_area_id"] is None
    r_de = reverse_point(pack, 0.5, 0.5, language="de")
    assert r_de["name"] == "Grossland, Medium, Kleinburg"
    # ocean point: kNN fallback
    r2 = reverse_point(pack, 82.0, 170.0)
    assert r2["area_ids"] == [] and r2["nearest_area_id"] is not None


def test_nan_point_rows_are_flagged_not_fabricated(polygon_side, ray_session):
    # pages whose html had no geo.position meta carry NaN lat/lon: they
    # must get cell_id="", nearest_area_id=-1, name="" — not the
    # first area by argmin-over-NaN + a garbage geohash
    import pyarrow as pa

    from osm_jigsaw_ray.stages.pip import PipJoiner

    pack, _, _ = polygon_side
    joiner = PipJoiner(pack)
    batch = pa.table(
        {
            "lat": pa.array([float("nan"), 0.5, float("nan")], pa.float64()),
            "lon": pa.array([0.5, 0.5, float("nan")], pa.float64()),
            "lang": pa.array(["en", "en", "en"], pa.string()),
        }
    )
    out = joiner(batch).to_pylist()
    for row in (out[0], out[2]):
        assert row["cell_id"] == ""
        assert row["nearest_area_id"] == -1
        assert row["name"] == ""
        assert row["area_ids"] == []
    assert out[1]["nearest_area_id"] == -1 and out[1]["area_ids"] != []


def _box_pack(boxes: dict[int, tuple]) -> dict:
    areas = {}
    for aid, (lat0, lat1, lon0, lon1) in boxes.items():
        lats = np.array([lat0, lat0, lat1, lat1], dtype=float)
        lons = np.array([lon0, lon1, lon1, lon0], dtype=float)
        areas[aid] = {
            "lats": lats,
            "lons": lons,
            "bbox": (lat0, lon0, lat1, lon1),
            "area": (lat1 - lat0) * (lon1 - lon0),
            "osm_ids": [f"{aid}W"],
        }
    return {
        "areas": areas,
        "children": {-1: sorted(boxes)},
        "top_level": sorted(boxes),
        "taggings": {},
    }


def test_partitioned_knn_fallback_is_global(ray_session):
    # a miss INSIDE a covered cell must still resolve against ALL area
    # centroids (the shared kNN side object), not just the cell's subset:
    # point (44, 0.8) sits in box 1's precision-1 cell but its true
    # nearest centroid is box 2 in a different cell
    import pyarrow as pa

    from osm_jigsaw_ray.pipelines.pages import _split_pack_by_cell
    from osm_jigsaw_ray.stages.pip import PipJoiner, build_knn_side

    pack = _box_pack({1: (0, 1, 0, 1), 2: (50, 51, 0, 1)})
    cell_packs = _split_pack_by_cell(pack, precision=1)
    shared = build_knn_side(pack)
    batch = pa.table(
        {
            "lat": pa.array([44.0], pa.float64()),
            "lon": pa.array([0.8], pa.float64()),
            "lang": pa.array(["en"], pa.string()),
        }
    )
    cell = geohash_encode(np.array([44.0]), np.array([0.8]), 1)[0]
    cell_pack = cell_packs[cell]
    assert 2 not in cell_pack["areas"]  # the scenario: nearest not in cell
    part = PipJoiner(cell_pack, shared=shared)(batch).to_pylist()[0]
    full = PipJoiner(pack)(batch).to_pylist()[0]
    assert part["nearest_area_id"] == full["nearest_area_id"] == 2


def test_partitioned_join_matches_broadcast(polygon_side):
    import ray.data as rd

    pack, _, _ = polygon_side
    pages = rd.from_arrow(generate_pages(N_PAGES))
    broadcast = (
        geo_join_pages(pages, pack, concurrency=2, extract_concurrency=2)
        .to_pandas().sort_values("url").reset_index(drop=True)
    )
    pages2 = rd.from_arrow(generate_pages(N_PAGES))
    partitioned = (
        geo_join_pages_partitioned(
            pages2, pack, cell_precision=2, hot_cell_threshold=50,
            hot_cell_salt=4, extract_concurrency=2,
        )
        .to_pandas().sort_values("url").reset_index(drop=True)
    )
    cols = ["url", "cell_id", "nearest_area_id", "name"]
    pd.testing.assert_frame_equal(broadcast[cols], partitioned[cols])
    assert broadcast["area_ids"].map(list).equals(partitioned["area_ids"].map(list))
    assert broadcast["paths"].map(
        lambda ps: [list(p) for p in ps]
    ).equals(partitioned["paths"].map(lambda ps: [list(p) for p in ps]))
