"""Geometry kernel tests — mirror the reference's BoundingBoxSpec,
AreaComparisonSpec, TileGeneratorSpec semantics (SURVEY.md §5)."""

import numpy as np
import pytest

from osm_jigsaw_ray.geometry import (
    canonical_ring_signature,
    geohash_bbox,
    geohash_cells,
    geohash_cover,
    geohash_encode,
    points_in_ring,
    ring_area,
    ring_bbox,
    ring_contains_ring,
    rings_intersect,
    stable_area_id,
)


def box_ring(lat0, lat1, lon0, lon1):
    lats = np.array([lat0, lat0, lat1, lat1, lat0], dtype=float)
    lons = np.array([lon0, lon1, lon1, lon0, lon0], dtype=float)
    return lats, lons


LARGE = box_ring(-10, 10, -10, 10)
MEDIUM = box_ring(-2, 2, -2, 2)
SMALL = box_ring(-1, 1, -1, 1)
LEFT = box_ring(-10, 10, -10, 0)   # shares boundary with LARGE
RIGHT = box_ring(-10, 10, 0, 10)
OVERLAP = box_ring(-10, 10, -5, 5)


def test_ring_area_box():
    # 20x20 box = 400 deg^2; abs() of either orientation
    assert ring_area(*LARGE) == pytest.approx(400.0)
    lats, lons = LARGE
    assert ring_area(lats[::-1], lons[::-1]) == pytest.approx(400.0)
    # open ring (no duplicated closing vertex) closes implicitly
    assert ring_area(lats[:-1], lons[:-1]) == pytest.approx(400.0)


def test_ring_bbox():
    assert ring_bbox(*LARGE) == (-10.0, -10.0, 10.0, 10.0)


def test_points_in_ring_interior_exterior_boundary():
    lats, lons = MEDIUM
    pts_lat = np.array([0.0, 5.0, 2.0, -2.0, 1.99])
    pts_lon = np.array([0.0, 5.0, 0.0, -2.0, -1.99])
    got = points_in_ring(lats, lons, pts_lat, pts_lon)
    # interior, exterior, on-edge (closure => inside), corner, interior
    assert got.tolist() == [True, False, True, True, True]


def test_contains_nested_and_boundary_sharing():
    # Bournemouth ⊇ Holdenhurst analog (AreaComparisonSpec.scala:17-44)
    assert ring_contains_ring(*LARGE, *MEDIUM)
    assert not ring_contains_ring(*MEDIUM, *LARGE)
    assert ring_contains_ring(*MEDIUM, *SMALL)
    # boundary-sharing child counts as contained (GraphBuilderSpec left/right)
    assert ring_contains_ring(*LARGE, *LEFT)
    assert ring_contains_ring(*LARGE, *RIGHT)
    # identical rings mutually contain (dedup's areaSame)
    assert ring_contains_ring(*SMALL, *SMALL)
    # partial overlap is not containment either way
    assert not ring_contains_ring(*LEFT, *OVERLAP)
    assert not ring_contains_ring(*OVERLAP, *LEFT)


def test_intersects():
    assert rings_intersect(*LEFT, *OVERLAP)
    assert rings_intersect(*LARGE, *SMALL)
    far = box_ring(50, 60, 50, 60)
    assert not rings_intersect(*LARGE, *far)


def test_canonical_signature_invariance():
    lats, lons = MEDIUM
    sig = canonical_ring_signature(lats, lons)
    # rotation
    r_lats = np.roll(lats[:-1], 2)
    r_lons = np.roll(lons[:-1], 2)
    assert canonical_ring_signature(r_lats, r_lons) == sig
    # orientation flip
    assert canonical_ring_signature(lats[::-1], lons[::-1]) == sig
    # different ring -> different signature / id
    sig2 = canonical_ring_signature(*SMALL)
    assert sig2 != sig
    assert stable_area_id(sig) != stable_area_id(sig2)
    assert 0 <= stable_area_id(sig) < 2**63


def test_geohash_known_values():
    # classic reference point: (57.64911, 10.40744) -> u4pruydqqvj
    got = geohash_encode(np.array([57.64911]), np.array([10.40744]), 11)[0]
    assert got == "u4pruydqqvj"
    got3 = geohash_encode(np.array([57.64911, 0.0]), np.array([10.40744, 0.0]), 3)
    assert got3.tolist() == ["u4p", "s00"]


def test_geohash_cell_counts():
    # TileGeneratorSpec.scala:9-14 — 32 / 1024 / 32768 tiles at res 1/2/3
    assert len(geohash_cells(1)) == 32
    assert len(geohash_cells(2)) == 1024


def test_geohash_bbox_roundtrip():
    bbox = geohash_bbox("u4p")
    assert bbox[0] < 57.64911 < bbox[2]
    assert bbox[1] < 10.40744 < bbox[3]
    # encoding the cell center returns the cell
    lat = (bbox[0] + bbox[2]) / 2
    lon = (bbox[1] + bbox[3]) / 2
    assert geohash_encode(np.array([lat]), np.array([lon]), 3)[0] == "u4p"


def test_geohash_cover():
    cover = geohash_cover((-10, -10, 10, 10), 1)
    # must include the cells of the box corners and center
    for lat, lon in [(-10, -10), (10, 10), (0, 0), (-10, 10), (10, -10)]:
        gh = geohash_encode(np.array([lat + 0.001]), np.array([lon + 0.001]), 1)[0]
        assert gh in cover
    # and not the whole planet
    assert len(cover) < 32


def test_prepared_ring_matches_points_in_ring():
    """PreparedRing (y-bucketed ST4 acceleration) must be bit-identical
    to the dense winding test on random star polygons, boundary points
    included."""
    from osm_jigsaw_ray.geometry import PreparedRing

    rng = np.random.default_rng(7)
    for trial in range(25):
        v = int(rng.integers(3, 120))
        ang = np.sort(rng.uniform(0, 2 * np.pi, v))
        r = rng.uniform(0.5, 2.0, v)
        rx, ry = r * np.cos(ang), r * np.sin(ang)
        if trial % 3 == 0:  # explicit closing vertex variant
            rx = np.append(rx, rx[0])
            ry = np.append(ry, ry[0])
        p = int(rng.integers(1, 300))
        px = np.concatenate([rng.uniform(-2.5, 2.5, p), rx[:3], [(rx[0] + rx[1]) / 2]])
        py = np.concatenate([rng.uniform(-2.5, 2.5, p), ry[:3], [(ry[0] + ry[1]) / 2]])
        dense = points_in_ring(rx, ry, px, py)
        fast = PreparedRing(rx, ry).contains(px, py)
        assert (dense == fast).all()


def test_prepared_ring_degenerate():
    from osm_jigsaw_ray.geometry import PreparedRing

    pr = PreparedRing(np.array([0.0, 1.0]), np.array([0.0, 1.0]))
    assert not pr.contains(np.array([0.5]), np.array([0.5])).any()
    pr2 = PreparedRing(np.array([]), np.array([]))
    assert pr2.contains(np.array([0.0]), np.array([0.0])).tolist() == [False]


def test_grid_knn_matches_dense_argmin():
    """GridKNN (bounded J10 fallback) must return exactly the dense
    argmin's answer — smallest-id tie-break included — for random,
    clustered, tied, and far-outside query points."""
    from osm_jigsaw_ray.stages.pip import GridKNN

    rng = np.random.default_rng(11)
    for trial in range(12):
        n = int(rng.integers(1, 400))
        ids = np.sort(rng.choice(10_000, size=n, replace=False)).astype(np.int64)
        clats = rng.uniform(-60, 60, n)
        clons = rng.uniform(-150, 150, n)
        if trial % 3 == 0 and n > 2:
            # exact duplicate centroid under two ids -> distance tie
            clats[-1], clons[-1] = clats[0], clons[0]
        g = GridKNN(ids, clats, clons)
        p = int(rng.integers(1, 300))
        plats = np.concatenate(
            [rng.uniform(-60, 60, p), [89.0, -89.0], clats[:2]]
        )
        plons = np.concatenate(
            [rng.uniform(-150, 150, p), [179.0, -179.0], clons[:2]]
        )
        got = g.nearest(plats, plons)
        d2 = (clats[None, :] - plats[:, None]) ** 2 + (
            clons[None, :] - plons[:, None]
        ) ** 2
        want = ids[np.argmin(d2, axis=1)]
        assert (got == want).all(), (trial, np.flatnonzero(got != want)[:5])


def test_grid_knn_empty():
    from osm_jigsaw_ray.stages.pip import GridKNN

    g = GridKNN(np.array([], np.int64), np.array([]), np.array([]))
    assert g.nearest(np.array([1.0]), np.array([2.0])).tolist() == [-1]
