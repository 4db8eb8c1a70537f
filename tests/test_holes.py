"""Opt-in hole-aware PIP (beyond reference parity): role-inner rings
subtract from containment when attached; default packs keep reference
semantics (inner rings ignored)."""

import pyarrow as pa
import pytest
import ray.data as rd

from osm_jigsaw_ray.fixtures import _Builder
from osm_jigsaw_ray.model import NODES_SCHEMA, RELATIONS_SCHEMA, WAYS_SCHEMA
from osm_jigsaw_ray.pipelines.areas import (
    resolve_area_holes,
    resolve_areas,
    areas_dataset_from_df,
)
from osm_jigsaw_ray.pipelines.graph import build_graph_edges
from osm_jigsaw_ray.stages.pip import attach_holes, build_area_pack, reverse_point


@pytest.fixture(scope="module")
def donut_world(ray_session):
    """A big parent box, a donut relation (outer 0..10, hole 3..7), and
    an island way (4..5) nested inside the hole."""
    b = _Builder()
    b.closed_way_box((-20.0, 20.0, -20.0, 20.0), {"name": "Parent"})
    outer = b.box_ways_split((0.0, 10.0, 0.0, 10.0), n_splits=2)
    inner = b.box_ways_split((3.0, 7.0, 3.0, 7.0), n_splits=2)
    rid = b.relation(
        [(w, "way", "outer") for w in outer]
        + [(w, "way", "inner") for w in inner],
        {"name": "Donut"},
    )
    b.closed_way_box((4.0, 5.0, 4.0, 5.0), {"name": "Island"})
    nodes = rd.from_arrow(pa.Table.from_pylist(b.nodes, schema=NODES_SCHEMA))
    ways = rd.from_arrow(pa.Table.from_pylist(b.ways, schema=WAYS_SCHEMA))
    relations = rd.from_arrow(
        pa.Table.from_pylist(b.relations, schema=RELATIONS_SCHEMA)
    )

    areas_df = resolve_areas(nodes, ways, relations, join_partitions=4).to_pandas()
    edges_df = build_graph_edges(
        areas_dataset_from_df(areas_df), precision=1, join_partitions=4
    ).to_pandas()
    holes_df = resolve_area_holes(
        nodes, ways, relations, join_partitions=4
    ).to_pandas()
    from osm_jigsaw_ray.model import osm_id_for
    taggings = {osm_id_for(rid, "relation"): {"name": "Donut"}}
    pack = build_area_pack(areas_df, edges_df, taggings)
    name_by_id = {}
    for aid, a in pack["areas"].items():
        if abs(a["area"] - 1600.0) < 1e-9:
            name_by_id["Parent"] = aid
        elif abs(a["area"] - 100.0) < 1e-9:
            name_by_id["Donut"] = aid
        elif abs(a["area"] - 1.0) < 1e-9:
            name_by_id["Island"] = aid
    assert set(name_by_id) == {"Parent", "Donut", "Island"}
    return pack, holes_df, name_by_id


def test_hole_rings_resolved(donut_world):
    _, holes_df, _ = donut_world
    assert len(holes_df) == 1  # one inner ring, keyed to the relation
    assert holes_df["osm_id"].iloc[0].endswith("R")  # osm_id_for format
    assert sorted(set(holes_df["lats"].iloc[0])) == [3.0, 7.0]


def test_default_pack_keeps_reference_parity(donut_world):
    """Without attach_holes the donut contains its hole interior — the
    reference's outer-only semantics."""
    pack, _, ids = donut_world
    got = reverse_point(pack, 5.5, 3.5)  # in the hole, not on the island
    assert ids["Donut"] in got["area_ids"]


def test_hole_subtracts_containment(donut_world):
    pack, holes_df, ids = donut_world
    hp = attach_holes(pack, holes_df)

    annulus = reverse_point(hp, 1.0, 1.0)  # inside donut, outside hole
    assert ids["Donut"] in annulus["area_ids"]
    assert annulus["paths"] == [[ids["Parent"], ids["Donut"]]]

    in_hole = reverse_point(hp, 5.5, 3.5)  # hole interior, off the island
    assert ids["Donut"] not in in_hole["area_ids"]
    assert in_hole["paths"] == [[ids["Parent"]]]

    island = reverse_point(hp, 4.5, 4.5)  # nested inside the hole
    assert ids["Island"] in island["area_ids"]
    assert ids["Donut"] not in island["area_ids"]
    # the donut is removed from the path; the island stays reachable
    assert island["paths"] == [[ids["Parent"], ids["Island"]]]

    outside = reverse_point(hp, 15.0, 15.0)  # parent only
    assert outside["paths"] == [[ids["Parent"]]]


def test_original_pack_unchanged_by_attach(donut_world):
    """attach_holes returns a NEW pack; the input keeps reference
    semantics afterwards (no shared-state mutation)."""
    pack, holes_df, ids = donut_world
    attach_holes(pack, holes_df)
    assert all("holes" not in a for a in pack["areas"].values())
    got = reverse_point(pack, 5.5, 3.5)
    assert ids["Donut"] in got["area_ids"]
