"""Full-graph dump (C10), named-node extraction (F7), entity counts (F6)."""

import pytest

from osm_jigsaw_ray.fixtures import build_osm_fixture_tables
from osm_jigsaw_ray.pipelines.areas import (
    areas_dataset_from_df,
    entity_type_counts,
    extract_named_nodes,
    resolve_areas,
)
from osm_jigsaw_ray.pipelines.dump import all_leaf_paths, dump_names
from osm_jigsaw_ray.pipelines.graph import build_graph_edges
from osm_jigsaw_ray.pipelines.tags import extract_taggings, taggings_to_dict
from osm_jigsaw_ray.stages.pip import build_area_pack


@pytest.fixture(scope="module")
def pack(ray_session):
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
    return build_area_pack(areas_df, edges_df, taggings)


def test_all_leaf_paths_structure(pack):
    lp = all_leaf_paths(pack)
    # leaves = areas with no children; every path ends at its leaf
    for leaf, paths in lp.items():
        assert pack["children"].get(leaf, []) == []
        for p in paths:
            assert p[-1] == leaf
    # the nested chain produces a depth-4 path (large>excluded>medium>small)
    depths = {max(len(p) for p in paths) for paths in lp.values()}
    assert max(depths) == 4
    # fits_both leaf reached via two parents
    two_parent = [paths for paths in lp.values() if len(paths) == 2]
    assert len(two_parent) >= 1


def test_dump_names(pack):
    df = dump_names(pack).to_pandas()
    assert len(df) == len(all_leaf_paths(pack))
    names = set(df["name"])
    # nested chain: excluded timezone ring dropped from the name
    assert "Large, Medium, Small" in names
    # multi-parent leaf merges both parents into one name
    fits = [n for n in names if "Fits House" in n]
    assert len(fits) == 1
    assert "Left" in fits[0] and "Overlapping" in fits[0]
    # island leaves of the archipelago name as the relation
    assert "The Islands" in names


def test_extract_named_nodes(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from osm_jigsaw_ray.model import NODES_SCHEMA, dict_to_tags

    nodes = rd.from_arrow(
        pa.Table.from_pylist(
            [
                {"node_id": 1, "lat": 1.0, "lon": 2.0, "tags": dict_to_tags({"name": "X"})},
                {"node_id": 2, "lat": 3.0, "lon": 4.0, "tags": dict_to_tags({"highway": "stop"})},
                {"node_id": 3, "lat": 5.0, "lon": 6.0, "tags": dict_to_tags({"name:fr": "Y"})},
            ],
            schema=NODES_SCHEMA,
        )
    )
    out = extract_named_nodes(nodes).to_pandas().sort_values("osm_id")
    assert out["osm_id"].tolist() == ["1N", "3N"]
    assert out["lat"].tolist() == [1.0, 5.0]


def test_entity_type_counts(ray_session):
    import ray.data as rd

    t = build_osm_fixture_tables()
    df = entity_type_counts(
        rd.from_arrow(t["nodes"]),
        rd.from_arrow(t["ways"]),
        rd.from_arrow(t["relations"]),
    ).set_index("entity_type")
    assert df.loc["node", "n"] == t["nodes"].num_rows
    assert df.loc["way", "n"] == t["ways"].num_rows
    assert df.loc["relation", "n"] == 6
    assert df.loc["relation", "named"] == 6
    # named ways: the 10 box/"unclosed" ways carry names; ring segments don't
    assert df.loc["way", "named"] == 11
