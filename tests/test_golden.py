"""Golden regression (FIXTURES.md §2): the full pipeline must reproduce
the committed golden outputs bit-for-bit on every run and at any
parallelism — the determinism guarantee that replaces the reference's
run-order-dependent ids (SURVEY.md §4 determinism hazards)."""

import os

import pyarrow.parquet as pq
import pytest

from osm_jigsaw_ray.fixtures import build_osm_fixture_tables, generate_pages

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


@pytest.fixture(scope="module")
def rebuilt(ray_session):
    import ray.data as rd

    from osm_jigsaw_ray.pipelines.areas import resolve_areas
    from osm_jigsaw_ray.pipelines.areas import areas_dataset_from_df
    from osm_jigsaw_ray.pipelines.dump import dump_names
    from osm_jigsaw_ray.pipelines.graph import build_graph_edges
    from osm_jigsaw_ray.pipelines.pages import geo_join_pages
    from osm_jigsaw_ray.pipelines.tags import extract_taggings, taggings_to_dict
    from osm_jigsaw_ray.stages.pip import build_area_pack

    t = build_osm_fixture_tables()
    ways = rd.from_arrow(t["ways"])
    relations = rd.from_arrow(t["relations"])
    areas_df = resolve_areas(
        rd.from_arrow(t["nodes"]), ways, relations, join_partitions=4
    ).to_pandas()
    edges_df = build_graph_edges(
        areas_dataset_from_df(areas_df), precision=1, join_partitions=4
    ).to_pandas()
    used = {o for ids in areas_df["osm_ids"] for o in ids}
    taggings = taggings_to_dict(extract_taggings(ways, relations, used))
    pack = build_area_pack(areas_df, edges_df, taggings)

    joined = geo_join_pages(
        rd.from_arrow(generate_pages(300)), pack, concurrency=2, extract_concurrency=2
    ).to_pandas().sort_values("url").reset_index(drop=True)
    joined["paths_flat"] = joined["paths"].map(
        lambda ps: ";".join(",".join(str(a) for a in p) for p in ps)
    )
    names = dump_names(pack).to_pandas().sort_values("leaf_area_id").reset_index(drop=True)
    return joined, edges_df, names


def test_golden_join_rows(rebuilt):
    joined, _, _ = rebuilt
    want = pq.read_table(f"{GOLDEN}/join_rows.parquet").to_pandas()
    got = joined[["url", "cell_id", "nearest_area_id", "name", "paths_flat"]]
    assert got.equals(want)


def test_golden_graph_edges(rebuilt):
    _, edges_df, _ = rebuilt
    want = pq.read_table(f"{GOLDEN}/graph_edges.parquet").to_pandas()
    got = edges_df.sort_values(
        ["parent_area_id", "child_area_id"]
    ).reset_index(drop=True)
    assert got.equals(want)


def test_golden_leaf_names(rebuilt):
    _, _, names = rebuilt
    want = pq.read_table(f"{GOLDEN}/leaf_names.parquet").to_pandas()
    assert names[["leaf_area_id", "name"]].equals(want)
