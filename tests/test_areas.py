"""Area-resolution pipeline tests — mirror OutlineBuilderSpec,
AreaResolverSpec, RelationExpanderSpec, OuterWayResolverSpec and the
dedup behavior of RenderAndDeduplicateAreas (SURVEY.md §5)."""

import numpy as np
import pytest

from osm_jigsaw_ray.fixtures import BOXES, build_osm_fixture_tables
from osm_jigsaw_ray.geometry import ring_area
from osm_jigsaw_ray.pipelines.areas import (
    dropped_relation_ids,
    expand_relation,
    join_ways_into_rings,
    resolve_areas,
    resolve_outer_way_ids,
)


def test_join_ways_assembles_out_of_order_reversed():
    # a square split into 3 ways, scrambled and one reversed
    # ring: 1-2-3-4-1
    ways = [
        (30, [4, 1]),          # closing edge
        (10, [1, 2, 3]),
        (20, [4, 3]),          # reversed orientation
    ]
    rings = join_ways_into_rings(ways)
    assert len(rings) == 1
    assert rings[0][0] == rings[0][-1]
    assert set(rings[0]) == {1, 2, 3, 4}


def test_join_ways_drops_open_chains():
    rings = join_ways_into_rings([(1, [1, 2, 3]), (2, [5, 6])])
    assert rings == []


def test_join_ways_multiple_rings():
    ways = [
        (1, [1, 2]), (2, [2, 3]), (3, [3, 1]),     # ring A
        (4, [10, 11]), (5, [11, 12]), (6, [12, 10]),  # ring B
    ]
    rings = join_ways_into_rings(ways)
    assert len(rings) == 2


def test_expand_relation_cycles_and_missing():
    rels = {
        1: [{"ref": 2, "type": "relation", "role": ""}],
        2: [{"ref": 1, "type": "relation", "role": ""}],
        3: [{"ref": 99, "type": "relation", "role": ""}],  # missing sub
        4: [{"ref": 100, "type": "way", "role": "outer"}],
        5: [{"ref": 4, "type": "relation", "role": "subarea"}],
    }
    assert expand_relation(1, rels) is None
    assert expand_relation(2, rels) is None
    assert expand_relation(3, rels) is None
    assert expand_relation(4, rels) == [4]
    assert expand_relation(5, rels) == [5, 4]


def test_outer_way_resolution_roles():
    rels = {
        1: [
            {"ref": 100, "type": "way", "role": "outer"},
            {"ref": 101, "type": "way", "role": "inner"},
            {"ref": 2, "type": "relation", "role": "subarea"},  # NOT followed
            {"ref": 3, "type": "relation", "role": "outer"},    # followed
        ],
        2: [{"ref": 200, "type": "way", "role": "outer"}],
        3: [{"ref": 300, "type": "way", "role": "outer"}],
    }
    assert resolve_outer_way_ids(1, rels) == [100, 300]
    # circular outer refs are skipped, not fatal
    rels[3].append({"ref": 1, "type": "relation", "role": "outer"})
    assert resolve_outer_way_ids(1, rels) == [100, 300]


@pytest.fixture(scope="module")
def fixture_areas(ray_session):
    import ray.data as rd

    t = build_osm_fixture_tables()
    areas = resolve_areas(
        rd.from_arrow(t["nodes"]),
        rd.from_arrow(t["ways"]),
        rd.from_arrow(t["relations"]),
        join_partitions=4,
    )
    return areas.to_pandas()


def _by_osm_membership(df, needle):
    return df[df["osm_ids"].map(lambda ids: any(needle in o for o in ids))]


def test_resolved_area_counts(fixture_areas):
    df = fixture_areas
    # archipelago relation -> 3 rings (NYC/New-Zealand analog,
    # AreaResolverSpec.scala:52-108): exactly one osm id owns 3 areas
    from collections import Counter

    counts = Counter(o for ids in df["osm_ids"] for o in ids)
    multi = {o: c for o, c in counts.items() if c > 1}
    assert len(multi) == 1
    (arch_id, n), = multi.items()
    assert arch_id.endswith("R") and n == 3
    arch_areas = sorted(
        df[df["osm_ids"].map(lambda ids: arch_id in ids)]["area"].tolist()
    )
    assert arch_areas == pytest.approx([1.0, 1.0, 100.0])  # 2 islands + mainland


def test_unclosed_and_unnamed_excluded(fixture_areas):
    df = fixture_areas
    # unclosed way box (70..72 lat, 60..62 lon) produced no area
    assert df[(df["min_lon"] >= 59) & (df["max_lon"] <= 63) & (df["min_lat"] >= 69)].empty
    # unnamed box (lon 50..52) produced no area
    assert df[(df["min_lon"] >= 49) & (df["max_lon"] <= 53) & (df["min_lat"] >= 69)].empty


def test_cyclic_relations_dropped(fixture_areas):
    df = fixture_areas
    # cyclic_a / cyclic_b boxes (lon 70..76 at lat 70..72) never became areas
    assert df[(df["min_lon"] >= 69) & (df["min_lat"] >= 69)].empty


def test_dropped_relation_ids(ray_session):
    import ray.data as rd

    t = build_osm_fixture_tables()
    dropped = dropped_relation_ids(rd.from_arrow(t["relations"]))
    assert dropped == [9500, 9501]


def test_duplicate_shapes_merge_osm_ids(fixture_areas):
    df = fixture_areas
    lat0, lat1, lon0, lon1 = BOXES["dup"]
    dup = df[
        (df["min_lat"] == lat0) & (df["max_lat"] == lat1)
        & (df["min_lon"] == lon0) & (df["max_lon"] == lon1)
    ]
    assert len(dup) == 1  # exact dedup merged the way and the relation
    osm_ids = list(dup.iloc[0]["osm_ids"])
    assert len(osm_ids) == 2
    assert any(o.endswith("W") for o in osm_ids)
    assert any(o.endswith("R") for o in osm_ids)


def test_subarea_child_ways_not_in_parent(fixture_areas):
    df = fixture_areas
    # parent ring must be the parent box only (no child-way contamination)
    parent = df[
        (df["min_lat"] == 60.0) & (df["max_lat"] == 65.0)
        & (df["min_lon"] == -5.0) & (df["max_lon"] == 0.0)
    ]
    assert len(parent) == 1
    assert parent.iloc[0]["area"] == pytest.approx(25.0)
    child = df[(df["min_lat"] == 61.0) & (df["max_lat"] == 62.0)]
    assert len(child) == 1  # child still resolves standalone


def test_measures_match_geometry(fixture_areas):
    df = fixture_areas
    for _, row in df.iterrows():
        lats = np.asarray(row["lats"], dtype=float)
        lons = np.asarray(row["lons"], dtype=float)
        assert row["area"] == pytest.approx(ring_area(lats, lons))
        assert row["min_lat"] == lats.min() and row["max_lat"] == lats.max()


def test_area_ids_stable_and_unique(fixture_areas):
    df = fixture_areas
    assert df["area_id"].is_unique
    assert (df["area_id"] >= 0).all()


def test_resolve_areas_ways_only_extract(ray_session):
    """A relation-free extract is legal OSM: the relation ring path is
    skipped entirely (joining an EMPTY Dataset side used to surface
    Ray's schema-less empty-hash-partition ArrowInvalid) and closed
    named ways still resolve."""
    import pyarrow as pa
    import ray.data as rd

    from osm_jigsaw_ray.model import RELATIONS_SCHEMA

    t = build_osm_fixture_tables()
    empty_rels = pa.table(
        {f.name: pa.array([], f.type) for f in RELATIONS_SCHEMA}
    )
    got = resolve_areas(
        rd.from_arrow(t["nodes"]),
        rd.from_arrow(t["ways"]),
        rd.from_arrow(empty_rels),
        join_partitions=4,
    ).to_pandas()
    # every area here comes from a closed named way; relation-derived
    # areas are gone, way-derived ones unchanged vs the full fixture
    assert len(got) > 0
    assert all(
        all(o.endswith("W") for o in ids) for ids in got["osm_ids"]
    )
    full = resolve_areas(
        rd.from_arrow(t["nodes"]),
        rd.from_arrow(t["ways"]),
        rd.from_arrow(t["relations"]),
        join_partitions=4,
    ).to_pandas()
    # each ways-only area matches a full-run area carrying (at least)
    # the same way ids — "at least" because A3 merges a way-derived
    # shape with its relation-derived duplicate into one area whose
    # osm_ids union both (e.g. 5011W rides with a relation id)
    full_sets = [set(ids) for ids in full["osm_ids"]]
    for ids in got["osm_ids"]:
        assert any(set(ids) <= f for f in full_sets), ids
    # and every purely way-derived full area is present in the
    # ways-only run unchanged
    for f, ids in zip(full_sets, full["osm_ids"]):
        if all(o.endswith("W") for o in ids):
            assert any(set(g) == f for g in map(set, got["osm_ids"])), ids
