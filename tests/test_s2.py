"""S2 cell index: anchors, structural properties, distributed cover.

The encoder is validated three ways: external anchors (face-cell
tokens; a published Manhattan token), agreement between two independent
implementations (vectorized LUT walk vs bit-at-a-time spec walk), and
structural Hilbert-curve / id-layout properties."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from osm_jigsaw_ray.s2 import (
    LOOKUP_IJ,
    LOOKUP_POS,
    MAX_LEVEL,
    s2_encode,
    s2_encode_scalar,
    s2_face,
    s2_id_from_face_pos,
    s2_level,
    s2_normalize_cells,
    s2_parent,
    s2_pos_at_level,
    s2_token,
    s2_token_to_id,
)

def _rand_points(n, seed=7):
    rng = np.random.default_rng(seed)
    return rng.uniform(-89.9, 89.9, n), rng.uniform(-180.0, 180.0, n)


# --- external anchors -------------------------------------------------


def test_face_cell_tokens():
    """The six level-0 face cells have the canonical tokens 1,3,5,7,9,b
    (documented id layout: face << 61 | 1 << 60)."""
    pts = [(0, 0), (0, 90), (90, 0), (0, 180), (0, -90), (-90, 0)]
    ids = s2_encode(
        np.array([p[0] for p in pts], float),
        np.array([p[1] for p in pts], float),
        level=0,
    )
    assert list(s2_token(ids)) == ["1", "3", "5", "7", "9", "b"]
    assert s2_face(ids).tolist() == [0, 1, 2, 3, 4, 5]


def test_published_city_tokens():
    """Level-12 tokens for well-known points match the prefixes that
    appear throughout public S2 materials (Manhattan cells are 89c25*,
    central London 4876*) — an end-to-end anchor that face layout,
    projection, and Hilbert orientation all match canonical S2."""
    ny = s2_token(s2_encode(np.array([40.7580]), np.array([-73.9855]), 12))[0]
    assert ny == "89c2585"
    ldn = s2_token(s2_encode(np.array([51.5014]), np.array([-0.1419]), 12))[0]
    assert ldn.startswith("4876")


# --- implementation cross-validation ----------------------------------


def test_scalar_spec_walk_matches_vectorized():
    lats, lons = _rand_points(300)
    for level in (0, 1, 4, 12, 29, 30):
        vec = s2_encode(lats, lons, level)
        scal = np.array(
            [s2_encode_scalar(a, b, level) for a, b in zip(lats, lons)],
            dtype=np.uint64,
        )
        assert (vec == scal).all()


def test_lookup_tables_are_inverse():
    for key in range(1 << 10):
        v = int(LOOKUP_POS[key])
        orig = key & 3
        assert int(LOOKUP_IJ[(v & ~3) | orig]) == ((key & ~3) | (v & 3))


# --- structural properties --------------------------------------------


def test_parent_prefix_and_level():
    lats, lons = _rand_points(500, seed=3)
    leaf = s2_encode(lats, lons, MAX_LEVEL)
    assert (s2_level(leaf) == MAX_LEVEL).all()
    for level in (2, 9, 17):
        direct = s2_encode(lats, lons, level)
        assert (s2_parent(leaf, level) == direct).all()
        assert (s2_level(direct) == level).all()
        # children sort inside the parent's contiguous id range
        lsb = np.uint64(1 << (2 * (MAX_LEVEL - level)))
        assert (leaf >= direct - (lsb - np.uint64(1))).all()
        assert (leaf <= direct + (lsb - np.uint64(1))).all()


def test_face_pos_roundtrip():
    lats, lons = _rand_points(200, seed=5)
    for level in (1, 8, 15):
        ids = s2_encode(lats, lons, level)
        back = s2_id_from_face_pos(
            s2_face(ids), s2_pos_at_level(ids, level), level
        )
        assert (back == ids).all()


def test_token_roundtrip_keeps_leading_zeros():
    lats, lons = _rand_points(300, seed=9)
    ids = s2_encode(lats, lons, MAX_LEVEL)
    for t, i in zip(s2_token(ids), ids):
        assert s2_token_to_id(t) == int(i)
    # face-0 position 0 leaf: id == 1, token is 16 digits
    small = s2_id_from_face_pos(np.array([0]), np.array([0]), MAX_LEVEL)
    assert s2_token(small)[0] == "0000000000000001"
    assert s2_token_to_id("0000000000000001") == 1


def test_hilbert_curve_is_adjacent_within_face():
    """Cells consecutive on the curve at a level are edge-adjacent in
    (i, j) — THE property that makes sorted id ranges spatially
    contiguous (why S2 ids are good range-partition keys)."""
    from osm_jigsaw_ray.s2 import _IJ_TO_POS, _POS_TO_IJ, _POS_TO_ORIENT, _SWAP

    def pos_to_ij(face, pos, level):
        orient = face & _SWAP
        i = j = 0
        for k in range(level):
            p = (pos >> (2 * (level - 1 - k))) & 3
            ij = _POS_TO_IJ[orient][p]
            i = (i << 1) | (ij >> 1)
            j = (j << 1) | (ij & 1)
            orient ^= _POS_TO_ORIENT[p]
        return i, j

    for face in (0, 1, 5):
        prev = None
        for p in range(4**4):
            ij = pos_to_ij(face, p, 4)
            if prev is not None:
                assert abs(ij[0] - prev[0]) + abs(ij[1] - prev[1]) == 1
            prev = ij


def test_encode_deterministic_and_level_12_spread():
    lats, lons = _rand_points(1000, seed=13)
    a = s2_encode(lats, lons, 12)
    b = s2_encode(lats, lons, 12)
    assert (a == b).all()
    assert len(np.unique(a)) > 900  # random global points rarely collide


# --- cell-union normalization ----------------------------------------


def test_normalize_collapses_siblings_recursively():
    # 16 level-10 grandchildren of one level-8 cell -> that cell
    gk = s2_id_from_face_pos(
        np.full(16, 2), np.arange(25 * 16, 25 * 16 + 16), 10
    )
    out = s2_normalize_cells(gk)
    assert out.size == 1 and s2_level(out)[0] == 8


def test_normalize_drops_contained_cells_either_order():
    par = s2_id_from_face_pos(np.array([2]), np.array([100]), 9)
    kid = s2_id_from_face_pos(np.array([2]), np.array([401]), 10)
    for arr in ([par[0], kid[0]], [kid[0], par[0]]):
        out = s2_normalize_cells(np.array(arr, dtype=np.uint64))
        assert out.tolist() == [int(par[0])]


def test_normalize_promotion_duplicate_does_not_overpromote():
    # {P0, P0's four children, P1, P2}: the children collapse to P0,
    # which DUPLICATES the explicit P0 already in the set — the dup must
    # not count as a 4th sibling of the grandparent (P3 is absent, so
    # promoting to G would over-cover). Expected: exactly {P0, P1, P2}.
    g_pos = 25  # any level-9 position
    p = s2_id_from_face_pos(np.full(3, 2), np.arange(4 * g_pos, 4 * g_pos + 3), 10)
    kids = s2_id_from_face_pos(np.full(4, 2), np.arange(16 * g_pos, 16 * g_pos + 4), 11)
    out = s2_normalize_cells(np.concatenate([p, kids]))
    assert sorted(out.tolist()) == sorted(p.tolist())


def test_normalize_idempotent_and_disjoint():
    lats, lons = _rand_points(3000, seed=21)
    ids = s2_encode(lats, lons, 11)
    n1 = s2_normalize_cells(ids)
    assert (s2_normalize_cells(n1) == n1).all()
    # disjoint: sorted ranges must not overlap
    from osm_jigsaw_ray.s2 import _lsb

    mx = n1 + (_lsb(n1) - np.uint64(1))
    mn = n1 - (_lsb(n1) - np.uint64(1))
    assert (mn[1:] > mx[:-1]).all()


# --- rect covering ----------------------------------------------------


RECTS = [
    (40.0, 41.0, -74.5, -73.5),     # mid-lat small (NYC-ish)
    (-1.0, 1.0, -1.0, 1.0),         # equator, face 0 center
    (-0.5, 0.5, 179.0, 180.0),      # touches the anti-meridian edge
    (84.0, 89.5, -180.0, 180.0),    # polar cap ring (face 2)
    (-89.5, -84.0, -180.0, 180.0),  # south polar cap (face 5)
    (44.0, 46.0, 43.0, 47.0),       # spans face 0/1 corner region
    (-46.0, -44.0, -180.0, -130.0), # southern mid-lat, face 4/5 edge
    (10.0, 70.0, -170.0, 170.0),    # huge wide rect (span > 180)
    (41.0, 41.0, 12.0, 12.0),       # degenerate point rect
]


def test_rect_cover_is_superset_of_point_cells():
    """THE contract tiling relies on: every point in the rect encodes
    to a cell contained in the cover (dense grid sample per rect)."""
    from osm_jigsaw_ray.s2 import s2_rect_cover

    for lat0, lat1, lon0, lon1 in RECTS:
        for level in (2, 5, 8):
            cover = set(s2_rect_cover(lat0, lat1, lon0, lon1, level).tolist())
            assert cover
            g = np.linspace(0.0, 1.0, 40)
            la, lo = np.meshgrid(lat0 + g * (lat1 - lat0), lon0 + g * (lon1 - lon0))
            cells = s2_encode(la.ravel(), lo.ravel(), level)
            missing = set(np.unique(cells).tolist()) - cover
            assert not missing, (lat0, lat1, lon0, lon1, level, missing)


def test_rect_cover_is_tight_for_small_rects():
    """A small rect's cover must not balloon: at a level where the rect
    spans O(1) cells the cover stays within a small constant of the
    exact cell count (conservativeness is bbox-of-footprint only)."""
    from osm_jigsaw_ray.s2 import s2_rect_cover

    cover = s2_rect_cover(40.0, 40.4, -74.2, -73.8, 8)
    g = np.linspace(0.0, 1.0, 200)
    la, lo = np.meshgrid(40.0 + g * 0.4, -74.2 + g * 0.4)
    exact = np.unique(s2_encode(la.ravel(), lo.ravel(), 8))
    assert exact.size <= cover.size <= 4 * exact.size + 8


def test_rect_cover_normalize_and_validation():
    from osm_jigsaw_ray.s2 import _lsb, s2_rect_cover

    cov = s2_rect_cover(10.0, 30.0, 100.0, 120.0, 7, normalize=True)
    assert (s2_normalize_cells(cov) == cov).all()
    mx = cov + (_lsb(cov) - np.uint64(1))
    assert (cov[1:] - (_lsb(cov[1:]) - np.uint64(1)) > mx[:-1]).all()
    with pytest.raises(ValueError):
        s2_rect_cover(1.0, 0.0, 0.0, 1.0, 5)
    with pytest.raises(ValueError):
        s2_rect_cover(0.0, 1.0, 0.0, 1.0, 31)


# --- distributed pipeline --------------------------------------------


def test_corpus_cover_matches_single_shot(ray_session):  # noqa: F811
    from osm_jigsaw_ray.pipelines.cells import s2_corpus_cover

    # dense patch -> collapses below AND above the shard level
    g = np.linspace(10.0, 30.0, 150)
    lats, lons = np.meshgrid(g, np.linspace(100.0, 120.0, 150))
    lats, lons = lats.ravel(), lons.ravel()
    ds = rd.from_arrow(pa.table({"lat": lats, "lon": lons})).repartition(8)
    cover = s2_corpus_cover(ds, level=8, shard_level=4).to_pandas()
    got = np.sort(
        np.concatenate(
            [
                s2_id_from_face_pos(
                    gg["s2_face"].to_numpy(), gg["s2_pos"].to_numpy(), int(l)
                )
                for l, gg in cover.groupby("s2_level")
            ]
        )
    )
    exp = np.sort(s2_normalize_cells(s2_encode(lats, lons, 8)))
    assert got.size == exp.size and (got == exp).all()
    assert int(cover["s2_level"].min()) < 4  # driver finish engaged
    # output is sorted by cell id and tokens decode back
    ids_in_order = np.concatenate(
        [
            s2_id_from_face_pos(
                np.array([f]), np.array([p]), int(l)
            )
            for f, l, p in zip(
                cover["s2_face"], cover["s2_level"], cover["s2_pos"]
            )
        ]
    )
    assert (ids_in_order[1:] > ids_in_order[:-1]).all()
    for t, i in zip(cover["s2_token"], ids_in_order):
        assert s2_token_to_id(t) == int(i)


def test_s2_cells_for_points(ray_session):  # noqa: F811
    from osm_jigsaw_ray.pipelines.cells import s2_cells_for_points

    lats, lons = _rand_points(400, seed=2)
    ds = rd.from_arrow(pa.table({"lat": lats, "lon": lons}))
    out = s2_cells_for_points(ds, level=12).to_pandas()
    exp = s2_encode(lats, lons, 12)
    got = s2_id_from_face_pos(
        out["s2_face"].to_numpy(), out["s2_pos"].to_numpy(), 12
    )
    assert (np.sort(got) == np.sort(exp)).all()
    assert (out["s2_level"] == 12).all()
