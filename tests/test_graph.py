"""Containment-graph tests — mirror GraphBuilderSpec.scala:28-93 (nesting,
insertion-order invariance, trickle-down, multi-parent attachment) and
check sequential-sift-down ↔ distributed-builder parity."""

import numpy as np
import pandas as pd
import pytest

from osm_jigsaw_ray.geometry import ring_area, ring_bbox
from osm_jigsaw_ray.pipelines.graph import (
    ROOT_AREA_ID,
    AreaRec,
    build_graph_edges,
    edges_to_adjacency,
    sift_down_graph,
)


def rec(area_id, lat0, lat1, lon0, lon1):
    lats = np.array([lat0, lat0, lat1, lat1], dtype=float)
    lons = np.array([lon0, lon1, lon1, lon0], dtype=float)
    return AreaRec(
        area_id=area_id,
        lats=lats,
        lons=lons,
        area=ring_area(lats, lons),
        bbox=ring_bbox(lats, lons),
    )


LARGE = rec(1, -10, 10, -10, 10)
MEDIUM = rec(2, -2, 2, -2, 2)
SMALL = rec(3, -1, 1, -1, 1)
LEFT = rec(4, -10, 10, -10, 0)
RIGHT = rec(5, -10, 10, 0, 10)
# disjoint overlap trio (same-level semantics need areas not nested in LARGE)
OLEFT = rec(6, 20, 40, -40, -20)
OOVER = rec(7, 20, 40, -30, -10)
OFITS = rec(8, 25, 30, -28, -22)


def test_single_node_under_root():
    adj = sift_down_graph([LARGE])
    assert adj[ROOT_AREA_ID] == {1}


def test_boundary_sharing_children_same_level():
    # left/right share edges with large yet nest inside it
    # (GraphBuilderSpec.scala:34-44)
    adj = sift_down_graph([LARGE, LEFT, RIGHT])
    assert adj[ROOT_AREA_ID] == {1}
    assert adj[1] == {4, 5}


def test_trickle_down_and_insertion_order_invariance():
    expected = {ROOT_AREA_ID: {1}, 1: {2}, 2: {3}, 3: set()}
    for order in ([LARGE, MEDIUM, SMALL], [SMALL, MEDIUM, LARGE], [MEDIUM, SMALL, LARGE]):
        assert sift_down_graph(order) == expected


def test_multi_parent_attachment():
    adj = sift_down_graph([OLEFT, OOVER, OFITS])
    assert adj[ROOT_AREA_ID] == {6, 7}
    assert adj[6] == {8}
    assert adj[7] == {8}


def _recs_to_ds(recs):
    import ray.data as rd

    return rd.from_pandas(
        pd.DataFrame(
            {
                "area_id": [r.area_id for r in recs],
                "osm_ids": [list(r.osm_ids) for r in recs],
                "lats": [r.lats for r in recs],
                "lons": [r.lons for r in recs],
                "area": [r.area for r in recs],
                "min_lat": [r.bbox[0] for r in recs],
                "min_lon": [r.bbox[1] for r in recs],
                "max_lat": [r.bbox[2] for r in recs],
                "max_lon": [r.bbox[3] for r in recs],
            }
        )
    )


def test_equal_area_mutual_contains_stays_acyclic():
    # geometrically-equal rings with different vertex sets (one has a
    # redundant collinear point) survive signature dedup; the builder must
    # break the mutual-contains tie (smaller id = parent), not 2-cycle
    lats_b = np.array([0, 0, 0, 1, 1], dtype=float)  # extra collinear pt
    lons_b = np.array([0, 0.5, 1, 1, 0], dtype=float)
    eq_a = rec(11, 0, 1, 0, 1)
    eq_b = AreaRec(
        area_id=12,
        lats=lats_b,
        lons=lons_b,
        area=ring_area(lats_b, lons_b),
        bbox=ring_bbox(lats_b, lons_b),
    )
    outer = rec(10, -1, 2, -1, 2)
    want = {ROOT_AREA_ID: {10}, 10: {11}, 11: {12}, 12: set()}
    for order in ([outer, eq_a, eq_b], [eq_b, eq_a, outer]):
        assert sift_down_graph(order) == want


def test_equal_area_mutual_contains_distributed(ray_session):
    lats_b = np.array([0, 0, 0, 1, 1], dtype=float)
    lons_b = np.array([0, 0.5, 1, 1, 0], dtype=float)
    eq_b = AreaRec(
        area_id=12,
        lats=lats_b,
        lons=lons_b,
        area=ring_area(lats_b, lons_b),
        bbox=ring_bbox(lats_b, lons_b),
    )
    recs = [rec(10, -1, 2, -1, 2), rec(11, 0, 1, 0, 1), eq_b]
    edges = build_graph_edges(_recs_to_ds(recs), precision=1, join_partitions=2)
    got = {k: v for k, v in edges_to_adjacency(edges.to_pandas()).items() if v}
    assert got == {ROOT_AREA_ID: [10], 10: [11], 11: [12]}


def test_distributed_matches_sift_down(ray_session):
    recs = [LARGE, MEDIUM, SMALL, LEFT, RIGHT, OLEFT, OOVER, OFITS]
    edges = build_graph_edges(_recs_to_ds(recs), precision=1, join_partitions=2)
    got = edges_to_adjacency(edges.to_pandas())
    want = {k: sorted(v) for k, v in sift_down_graph(recs).items() if v}
    got = {k: v for k, v in got.items() if v}
    assert got == want


def test_distributed_matches_sift_down_random_boxes(ray_session):
    # property-style parity on a deterministic pseudo-random box set
    rng = np.random.RandomState(7)
    recs = []
    for i in range(40):
        lat0 = rng.uniform(-60, 50)
        lon0 = rng.uniform(-150, 140)
        dlat = rng.uniform(0.5, 25)
        dlon = rng.uniform(0.5, 25)
        recs.append(rec(100 + i, lat0, lat0 + dlat, lon0, lon0 + dlon))
    edges = build_graph_edges(_recs_to_ds(recs), precision=1, join_partitions=2)
    got = {k: v for k, v in edges_to_adjacency(edges.to_pandas()).items() if v}
    want = {k: sorted(v) for k, v in sift_down_graph(recs).items() if v}
    assert got == want


def test_distributed_matches_sift_down_nested_families(ray_session):
    """Containment-rich parity at a scale where cell co-partitioning,
    over-cover broadcasting and transitive reduction all engage: ~300
    boxes in nested families with cross-family overlaps, precision 2."""
    rng = np.random.RandomState(23)
    recs = []
    aid = 1000
    for fam in range(30):
        lat0 = rng.uniform(-55, 25)
        lon0 = rng.uniform(-150, 110)
        w = rng.uniform(8, 30)
        h = rng.uniform(8, 30)
        # nested chain of depth 4 (shrink capped < 0.5 so boxes stay valid)
        for depth in range(4):
            shrink = 0.12 * depth
            recs.append(
                rec(
                    aid,
                    lat0 + h * shrink,
                    lat0 + h * (1 - shrink),
                    lon0 + w * shrink,
                    lon0 + w * (1 - shrink),
                )
            )
            aid += 1
        # two overlapping siblings inside the family (multi-parent bait)
        for _ in range(2):
            a0 = lat0 + rng.uniform(0.05, 0.3) * h
            o0 = lon0 + rng.uniform(0.05, 0.3) * w
            recs.append(
                rec(aid, a0, a0 + 0.5 * h, o0, o0 + 0.5 * w)
            )
            aid += 1
        # exact duplicate of the family root under a new id (equal-area
        # mutual containment — the r1 ADVICE DAG-corruption case)
        if fam % 5 == 0:
            recs.append(rec(aid, lat0, lat0 + h, lon0, lon0 + w))
            aid += 1
    # a few continental over-cover parents spanning many cells
    for i in range(4):
        recs.append(rec(aid, -80 + i, 80 - i, -170 + i, 170 - i))
        aid += 1

    edges = build_graph_edges(_recs_to_ds(recs), precision=2, join_partitions=4)
    got = {k: v for k, v in edges_to_adjacency(edges.to_pandas()).items() if v}
    want = {k: sorted(v) for k, v in sift_down_graph(recs).items() if v}
    assert got == want


def _longest_path_depths(edges_df):
    """Brute-force longest root→area path by edge relaxation."""
    depth = {ROOT_AREA_ID: 0}
    pairs = list(zip(edges_df["parent_area_id"], edges_df["child_area_id"]))
    changed = True
    while changed:
        changed = False
        for p, c in pairs:
            if p in depth and depth.get(c, -1) < depth[p] + 1:
                depth[c] = depth[p] + 1
                changed = True
    depth.pop(ROOT_AREA_ID)
    return {int(k): int(v) for k, v in depth.items()}


def test_topological_depths_nested_and_multiparent(ray_session):
    import ray.data as rd

    from osm_jigsaw_ray.pipelines.graph import topological_depths

    recs = [LARGE, MEDIUM, SMALL, LEFT, RIGHT, OLEFT, OOVER, OFITS]
    edges_df = build_graph_edges(
        _recs_to_ds(recs), precision=1, join_partitions=2
    ).to_pandas()
    got = topological_depths(rd.from_pandas(edges_df), num_partitions=4).to_pandas()
    got_map = dict(zip(got["area_id"].astype(int), got["depth"].astype(int)))
    assert got_map == _longest_path_depths(edges_df)
    # the depth IS a topological key: every edge strictly increases it
    for p, c in zip(edges_df["parent_area_id"], edges_df["child_area_id"]):
        if p != ROOT_AREA_ID:
            assert got_map[c] > got_map[p]


def test_topological_depths_raises_on_round_exhaustion(ray_session):
    """A cyclic edge set (or a DAG deeper than max_rounds) must fail
    loudly instead of returning silently-truncated depths."""
    import ray.data as rd

    from osm_jigsaw_ray.pipelines.graph import topological_depths

    edges_df = pd.DataFrame(
        {
            "parent_area_id": [ROOT_AREA_ID, 1, 2, 3],
            "child_area_id": [1, 2, 3, 1],  # 1 -> 2 -> 3 -> 1 cycle
        }
    )
    with pytest.raises(ValueError, match="max_rounds"):
        topological_depths(rd.from_pandas(edges_df), max_rounds=8)


def test_topological_depths_random_boxes(ray_session):
    import ray.data as rd

    from osm_jigsaw_ray.pipelines.graph import topological_depths

    rng = np.random.RandomState(7)
    recs = []
    for i in range(40):
        lat0 = rng.uniform(-60, 50)
        lon0 = rng.uniform(-150, 140)
        recs.append(
            rec(100 + i, lat0, lat0 + rng.uniform(0.5, 25), lon0, lon0 + rng.uniform(0.5, 25))
        )
    edges_df = build_graph_edges(
        _recs_to_ds(recs), precision=1, join_partitions=2
    ).to_pandas()
    got = topological_depths(rd.from_pandas(edges_df), num_partitions=4).to_pandas()
    got_map = dict(zip(got["area_id"].astype(int), got["depth"].astype(int)))
    assert got_map == _longest_path_depths(edges_df)


def test_topological_depths_deep_chain(ray_session):
    """12-deep nesting chain (real OSM nesting tops out around this):
    round count tracks DAG depth, results exact, multi-block edge input
    handled. Each round is one fixed-cost Ray groupby, so the chain
    length is kept realistic — the algorithm is O(depth) rounds by
    design, not O(areas)."""
    import ray.data as rd

    from osm_jigsaw_ray.pipelines.graph import topological_depths

    n = 12
    edges = pd.DataFrame(
        {
            "parent_area_id": [ROOT_AREA_ID] + list(range(1, n)),
            "child_area_id": list(range(1, n + 1)),
        }
    )
    ds = rd.from_pandas(edges).repartition(7)
    got = topological_depths(ds, num_partitions=4, max_rounds=32).to_pandas()
    assert dict(zip(got["area_id"], got["depth"])) == {
        i: i for i in range(1, n + 1)
    }
