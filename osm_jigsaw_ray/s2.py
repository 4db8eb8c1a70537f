"""S2 cell-id index, vectorized from scratch.

The north rule asks for an "H3/S2 index" whose "batched encode stage
assigns compact cell covers". This module re-derives the *public* S2
cell-id scheme — the 6-face cube projection, the quadratic uv<->st
transform, and the face-continuous Hilbert space-filling curve with the
published 4-entry position/orientation tables — as numpy kernels over
batches (no per-row Python in the encode hot path). It is written from
the openly documented algorithm (s2geometry's docs / Apache-2.0 sources
describe the exact tables and bit layout); nothing here is ported from
``/root/reference`` (the reference uses no cell index at all — its
containment graph is a global sift-down, ``graph/GraphBuilder.scala``).

Cell-id layout (64 bits, unsigned): 3 face bits, then 2*level Hilbert
position bits, then a single 1 marker bit, then zeros. The Hilbert
position makes ids at a fixed level *spatially sortable*: contiguous id
ranges are contiguous on the sphere, which is what makes S2 ids good
shuffle/partition keys at scale (range-partition the id space and
nearby cells land on the same worker).

Two independent implementations are kept on purpose:

- ``s2_encode``        — vectorized, 4-bit lookup-table Hilbert steps
                         (8 table gathers per batch, numpy throughout);
- ``s2_encode_scalar`` — bit-at-a-time spec walk with no lookup table.

``tests/test_s2.py`` asserts they agree everywhere, plus external
anchors (face-cell tokens, a published Manhattan token prefix) and
structural properties (Hilbert adjacency, parent-prefix containment,
token round-trip).
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "MAX_LEVEL",
    "s2_encode",
    "s2_encode_scalar",
    "s2_token",
    "s2_token_to_id",
    "s2_level",
    "s2_parent",
    "s2_face",
    "s2_pos_at_level",
    "s2_id_from_face_pos",
    "s2_normalize_cells",
    "s2_rect_cover",
    "LOOKUP_POS",
    "LOOKUP_IJ",
]

MAX_LEVEL = 30
_SWAP, _INVERT = 1, 2
# Hilbert sub-cell traversal: for each orientation, the (i,j) quadrant
# (2 bits: i<<1|j) visited at curve position 0..3, and the orientation
# change each position applies. These four rows are the published S2
# constants (kPosToIJ / kPosToOrientation).
_POS_TO_IJ = ((0, 1, 3, 2), (0, 2, 3, 1), (3, 2, 0, 1), (3, 1, 0, 2))
_POS_TO_ORIENT = (_SWAP, 0, 0, _SWAP | _INVERT)
# inverse: orientation x (i,j) quadrant -> curve position
_IJ_TO_POS = tuple(
    tuple(row.index(ij) for ij in range(4)) for row in _POS_TO_IJ
)


def _build_lookups() -> tuple[np.ndarray, np.ndarray]:
    """4-level (4-bit-per-axis) Hilbert step tables.

    ``LOOKUP_POS[(ij16 << 2) | orient] = (pos8 << 2) | orient'`` maps a
    4-bit (i, j) nibble pair plus incoming orientation to 8 curve
    position bits plus outgoing orientation; ``LOOKUP_IJ`` is the
    inverse. Built once per process by expanding the 1-bit tables four
    levels deep (the standard construction)."""
    lookup_pos = np.zeros(1 << 10, dtype=np.int64)
    lookup_ij = np.zeros(1 << 10, dtype=np.int64)

    def init(level: int, i: int, j: int, orig: int, pos: int, orient: int):
        if level == 4:
            ij = (i << 4) + j
            lookup_pos[(ij << 2) + orig] = (pos << 2) + orient
            lookup_ij[(pos << 2) + orig] = (ij << 2) + orient
            return
        r = _POS_TO_IJ[orient]
        for idx in range(4):
            init(
                level + 1,
                (i << 1) + (r[idx] >> 1),
                (j << 1) + (r[idx] & 1),
                orig,
                (pos << 2) + idx,
                orient ^ _POS_TO_ORIENT[idx],
            )

    for o in range(4):
        init(0, 0, 0, o, 0, o)
    return lookup_pos, lookup_ij


LOOKUP_POS, LOOKUP_IJ = _build_lookups()


def _xyz(lats: np.ndarray, lons: np.ndarray):
    lat = np.radians(np.asarray(lats, dtype=np.float64))
    lon = np.radians(np.asarray(lons, dtype=np.float64))
    coslat = np.cos(lat)
    return coslat * np.cos(lon), coslat * np.sin(lon), np.sin(lat)


def _face_uv(x: np.ndarray, y: np.ndarray, z: np.ndarray):
    """Cube face (0..5) + in-face (u, v) coordinates, vectorized.

    Face = axis of the largest-|component| (ties to the higher axis,
    matching the documented LargestAbsComponent), +3 when that
    component is negative; (u, v) are the two remaining components
    divided by the major one, signed per the published face table."""
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    axis = np.where(ax > ay, np.where(ax > az, 0, 2), np.where(ay > az, 1, 2))
    major = np.choose(axis, (x, y, z))
    face = np.where(major < 0, axis + 3, axis)
    # u, v per face (documented ValidFaceXYZtoUV table)
    u = np.empty_like(x)
    v = np.empty_like(x)
    for f, (ue, ve) in enumerate(
        (
            (lambda: y / x, lambda: z / x),        # 0: +x
            (lambda: -x / y, lambda: z / y),       # 1: +y
            (lambda: -x / z, lambda: -y / z),      # 2: +z
            (lambda: z / x, lambda: y / x),        # 3: -x
            (lambda: z / y, lambda: -x / y),       # 4: -y
            (lambda: -y / z, lambda: -x / z),      # 5: -z
        )
    ):
        m = face == f
        if m.any():
            with np.errstate(divide="ignore", invalid="ignore"):
                u[m] = ue()[m]
                v[m] = ve()[m]
    return face.astype(np.int64), u, v


def _uv_to_st(u: np.ndarray) -> np.ndarray:
    # quadratic projection (the S2 default): cell areas vary ~2.1x
    # instead of the ~5.2x of the linear transform
    with np.errstate(invalid="ignore"):  # where() evaluates both arms
        return np.where(
            u >= 0,
            0.5 * np.sqrt(1.0 + 3.0 * u),
            1.0 - 0.5 * np.sqrt(1.0 - 3.0 * u),
        )


def _st_to_ij(s: np.ndarray) -> np.ndarray:
    return np.clip(
        np.floor(s * (1 << MAX_LEVEL)).astype(np.int64), 0, (1 << MAX_LEVEL) - 1
    )


def _from_face_ij(face: np.ndarray, i: np.ndarray, j: np.ndarray) -> np.ndarray:
    """(face, leaf i, leaf j) -> leaf cell ids: the Hilbert walk as 8
    lookup-table gathers (vectorized core shared by encode and cover)."""
    n = face.astype(np.uint64) << np.uint64(60)
    bits = face & _SWAP  # faces alternate start orientation -> curve is
    # continuous across face boundaries
    for k in range(7, -1, -1):
        key = (bits + (((i >> (4 * k)) & 15) << 6) + (((j >> (4 * k)) & 15) << 2))
        val = LOOKUP_POS[key]
        n |= (val >> 2).astype(np.uint64) << np.uint64(8 * k)
        bits = val & 3
    return n * np.uint64(2) + np.uint64(1)  # leaf (level 30)


def s2_encode(lats, lons, level: int = MAX_LEVEL) -> np.ndarray:
    """lat/lon degrees -> uint64 S2 cell ids at ``level``. Vectorized:
    trig + face/uv selection + 8 lookup-table gathers, no Python loop
    over rows."""
    if not 0 <= level <= MAX_LEVEL:
        raise ValueError(f"level must be in [0, {MAX_LEVEL}]")
    x, y, z = _xyz(lats, lons)
    face, u, v = _face_uv(x, y, z)
    i = _st_to_ij(_uv_to_st(u))
    j = _st_to_ij(_uv_to_st(v))
    ids = _from_face_ij(face, i, j)
    if level < MAX_LEVEL:
        ids = s2_parent(ids, level)
    return ids


def s2_encode_scalar(lat: float, lon: float, level: int = MAX_LEVEL) -> int:
    """Independent spec-walk implementation (1 bit per level, no lookup
    table) used to cross-validate ``s2_encode`` in tests."""
    x, y, z = _xyz(np.array([lat]), np.array([lon]))
    face_a, u_a, v_a = _face_uv(x, y, z)
    face = int(face_a[0])
    i = int(_st_to_ij(_uv_to_st(u_a))[0])
    j = int(_st_to_ij(_uv_to_st(v_a))[0])
    orient = face & _SWAP
    pos = 0
    for k in range(MAX_LEVEL - 1, -1, -1):
        ij = (((i >> k) & 1) << 1) | ((j >> k) & 1)
        p = _IJ_TO_POS[orient][ij]
        pos = (pos << 2) | p
        orient ^= _POS_TO_ORIENT[p]
    cid = (face << 61) | (pos << 1) | 1
    if level < MAX_LEVEL:
        lsb = 1 << (2 * (MAX_LEVEL - level))
        cid = (cid & ~(lsb - 1)) | lsb
    return cid


# --- id structure helpers (all vectorized over uint64 arrays) ---------


def _lsb(ids: np.ndarray) -> np.ndarray:
    ids = np.asarray(ids, dtype=np.uint64)
    return ids & (~ids + np.uint64(1))


def s2_level(ids) -> np.ndarray:
    """Level of each id (position of the trailing marker bit)."""
    # lsb is an exact power of two <= 2^60: float64 log2 is exact
    tz = np.log2(_lsb(ids).astype(np.float64)).astype(np.int64)
    return MAX_LEVEL - (tz >> 1)


def s2_parent(ids, level: int) -> np.ndarray:
    ids = np.asarray(ids, dtype=np.uint64)
    lsb = np.uint64(1 << (2 * (MAX_LEVEL - level)))
    return (ids & ~(lsb - np.uint64(1))) | lsb


def s2_face(ids) -> np.ndarray:
    return (np.asarray(ids, dtype=np.uint64) >> np.uint64(61)).astype(np.int64)


def s2_pos_at_level(ids, level: int) -> np.ndarray:
    """The 2*level Hilbert position bits (face excluded) of each id,
    which must be at ``level`` or deeper."""
    ids = np.asarray(ids, dtype=np.uint64)
    shift = np.uint64(61 - 2 * level)
    mask = np.uint64((1 << (2 * level)) - 1)
    return ((ids >> shift) & mask).astype(np.int64)


def s2_id_from_face_pos(face, pos, level: int) -> np.ndarray:
    """Inverse of (s2_face, s2_pos_at_level) at a fixed level."""
    face = np.asarray(face, dtype=np.uint64)
    pos = np.asarray(pos, dtype=np.uint64)
    return (
        (face << np.uint64(61))
        | (pos << np.uint64(61 - 2 * level))
        | np.uint64(1 << (60 - 2 * level))
    )


def s2_token(ids) -> np.ndarray:
    """Canonical S2 token: the 16-hex-digit id with trailing zero
    digits stripped ('X' for the zero id, which never arises here)."""
    ids = np.asarray(ids, dtype=np.uint64)
    tz = np.log2(_lsb(ids).astype(np.float64)).astype(np.int64)
    shifted = ids >> (4 * (tz >> 2)).astype(np.uint64)
    width = 16 - (tz >> 2)  # leading zeros are significant in tokens
    return np.array(
        [format(v, f"0{w}x") for v, w in zip(shifted, width)], dtype=object
    )


def s2_token_to_id(token: str) -> int:
    return int(token, 16) << (4 * (16 - len(token)))


# --- cell-union normalization (compact covers) ------------------------


def s2_normalize_cells(ids) -> np.ndarray:
    """Normalize a set of cell ids into a *compact cover*: dedup, drop
    cells contained in coarser cells of the set, and recursively
    replace any 4 complete siblings by their parent (S2CellUnion
    "Normalize" semantics). Pure numpy; operates on an in-memory id
    set — the distributed corpus-cover pipeline
    (``pipelines.cells.s2_corpus_cover``) shards this by a coarse
    ancestor so each shard's set is small."""
    ids = np.unique(np.asarray(ids, dtype=np.uint64))
    if ids.size == 0:
        return ids
    levels = s2_level(ids)
    for lvl in range(int(levels.max()), 0, -1):
        at = ids[levels == lvl]
        if at.size >= 4:
            parents = s2_parent(at, lvl - 1)
            uniq, counts = np.unique(parents, return_counts=True)
            promote = uniq[counts == 4]
            if promote.size:
                drop = np.isin(parents, promote)
                # re-unique: a promoted parent may duplicate a pre-existing
                # copy of that cell in the set, and the duplicate would
                # inflate the next level's sibling count (over-cover bug)
                ids = np.unique(
                    np.concatenate([ids[levels != lvl], at[~drop], promote])
                )
                levels = s2_level(ids)
    # drop cells contained in a coarser cell of the set: scan in id
    # order keeping a stack — a cell covers the id range
    # [id - lsb + 1, id + lsb - 1], and an ancestor can sort either
    # side of a descendant, so the new cell may both be contained by
    # the last kept cell OR contain it (pop in that case)
    ids = np.sort(ids)
    lsb = _lsb(ids)
    out_id: list[int] = []
    out_max: list[int] = []
    for k in range(ids.size):  # cover sets are output-sized (small)
        cid = int(ids[k])
        cmin = cid - int(lsb[k]) + 1
        cmax = cid + int(lsb[k]) - 1
        while out_id and out_id[-1] >= cmin:  # new cell contains last
            out_id.pop()
            out_max.pop()
        if out_max and cid <= out_max[-1]:  # last contains new cell
            continue
        out_id.append(cid)
        out_max.append(cmax)
    return np.array(out_id, dtype=np.uint64)


# --- rect -> cell covering (the RegionCoverer analog for the lat/lon
# --- bounding rects this engine's areas carry) -------------------------


def _st_to_uv(s: np.ndarray) -> np.ndarray:
    """Inverse of the quadratic uv->st transform (exact closed form)."""
    return np.where(
        s >= 0.5,
        (4.0 * s * s - 1.0) / 3.0,
        (1.0 - 4.0 * (1.0 - s) * (1.0 - s)) / 3.0,
    )


def _sector_uv_bbox(r0, r1, phi0_deg, phi1_deg):
    """bbox of the annular sector {r in [r0, r1], phi in [phi0, phi1]}:
    extremes of r*cos/sin(phi) sit at interval endpoints or at axis
    crossings (multiples of 90 deg) inside the interval."""
    angles = [phi0_deg, phi1_deg]
    k = int(np.ceil(phi0_deg / 90.0))
    while k * 90.0 <= phi1_deg:
        angles.append(k * 90.0)
        k += 1
    xs, ys = [], []
    for a in angles:
        c, s = np.cos(np.radians(a)), np.sin(np.radians(a))
        for r in (r0, r1):
            xs.append(r * c)
            ys.append(r * s)
    return min(xs), max(xs), min(ys), max(ys)


_FACE_CENTER_LON = {0: 0.0, 1: 90.0, 3: 180.0, 4: -90.0}


def _rect_face_uv_bbox(face, lat0, lat1, lon0, lon1):
    """uv-plane bbox of the rect's spherical region as projected on
    ``face`` — a SUPERSET of the uv coordinates of every rect point
    that could belong to the face (conservative-exact: per-axis
    monotonicity arguments, no sampling). Returns None when no rect
    point can project onto this face. Rects must not cross the +-180
    meridian (split at the caller)."""
    big = 1.5  # cells live in [-1, 1]; clamp keeps arithmetic finite
    if face in _FACE_CENTER_LON:
        c = _FACE_CENTER_LON[face]
        # signed lon offset from face center, wrapped to [-180, 180];
        # a wide rect (span > 180) can intersect the face's (-90, 90)
        # wedge in TWO disjoint lon' intervals — check both wrappings
        d0 = (lon0 - c + 180.0) % 360.0 - 180.0
        span = lon1 - lon0
        boxes = []
        for base in (d0, d0 - 360.0):
            lo, hi = max(base, -89.99), min(base + span, 89.99)
            if lo > hi:
                continue
            g0, g1 = np.tan(np.radians(lo)), np.tan(np.radians(hi))
            # tan(lat)/cos(lon'): monotone in lat; for fixed lat the
            # extremes over lon' sit at the cos extremes of the interval
            cos_cands = [np.cos(np.radians(lo)), np.cos(np.radians(hi))]
            if lo <= 0.0 <= hi:
                cos_cands.append(1.0)
            cmin, cmax = min(cos_cands), max(cos_cands)
            t0 = np.tan(np.radians(max(lat0, -89.99)))
            t1 = np.tan(np.radians(min(lat1, 89.99)))
            hs = [t / cc for t in (t0, t1) for cc in (cmin, cmax) if cc > 0]
            h0, h1 = min(hs), max(hs)
            if face in (0, 1):  # u = tan(lon'), v = tan(lat)/cos(lon')
                boxes.append((g0, g1, h0, h1))
            else:  # faces 3, 4: u = -tan(lat)/cos(lon'), v = tan(lon')
                boxes.append((-h1, -h0, g0, g1))
        if not boxes:
            return None
        u0 = min(b[0] for b in boxes)
        u1 = max(b[1] for b in boxes)
        v0 = min(b[2] for b in boxes)
        v1 = max(b[3] for b in boxes)
    elif face == 2:  # +z: (u, v) = cot(lat) * (cos(lon+180), sin(lon+180))
        if lat1 <= 0:
            return None
        a0 = max(lat0, 0.01)
        r1 = 1.0 / np.tan(np.radians(a0))
        r0 = 0.0 if lat1 >= 89.999 else 1.0 / np.tan(np.radians(lat1))
        u0, u1, v0, v1 = _sector_uv_bbox(r0, r1, lon0 + 180.0, lon1 + 180.0)
    else:  # face 5, -z: u = cot(-lat)*sin(lon) = r*cos(90-lon), v = r*sin(90-lon)
        if lat0 >= 0:
            return None
        a1 = min(lat1, -0.01)
        r1 = 1.0 / np.tan(np.radians(-a1))
        r0 = 0.0 if lat0 <= -89.999 else 1.0 / np.tan(np.radians(-lat0))
        u0, u1, v0, v1 = _sector_uv_bbox(r0, r1, 90.0 - lon1, 90.0 - lon0)
    u0, u1 = max(u0, -big), min(u1, big)
    v0, v1 = max(v0, -big), min(v1, big)
    if u0 > 1.0 or u1 < -1.0 or v0 > 1.0 or v1 < -1.0:
        return None
    return u0, u1, v0, v1


def s2_rect_cover(
    lat0: float,
    lat1: float,
    lon0: float,
    lon1: float,
    level: int,
    normalize: bool = False,
) -> np.ndarray:
    """Cell ids at ``level`` covering the lat/lon rect — a guaranteed
    SUPERSET of the level-``level`` cells of every point in the rect
    (property-tested by dense sampling in ``tests/test_s2.py``).

    Per face, the rect's spherical region has a closed-form uv-plane
    bounding box (tangent monotonicity on equatorial faces, annular
    sector on polar faces); the cover is a breadth-first descent from
    the face cells keeping cells whose exact uv-rect (dyadic st bounds
    through the inverse quadratic transform) intersects that bbox.
    Conservative only through the per-face bbox of the (non-rectangular)
    region footprint — typically a handful of extra boundary cells."""
    if not 0 <= level <= MAX_LEVEL:
        raise ValueError(f"level must be in [0, {MAX_LEVEL}]")
    if lat1 < lat0 or lon1 < lon0:
        raise ValueError("need lat0 <= lat1 and lon0 <= lon1")
    out = []
    for face in range(6):
        bbox = _rect_face_uv_bbox(face, lat0, lat1, lon0, lon1)
        if bbox is None:
            continue
        bu0, bu1, bv0, bv1 = bbox
        # frontier of cells at the current level, as (i, j) in level units
        fi = np.array([0], dtype=np.int64)
        fj = np.array([0], dtype=np.int64)
        for lvl in range(level):
            # split each cell into its 4 children
            fi = (fi[:, None] * 2 + np.array([0, 0, 1, 1])).ravel()
            fj = (fj[:, None] * 2 + np.array([0, 1, 0, 1])).ravel()
            inv = 1.0 / (1 << (lvl + 1))
            cu0 = _st_to_uv(fi * inv)
            cu1 = _st_to_uv((fi + 1) * inv)
            cv0 = _st_to_uv(fj * inv)
            cv1 = _st_to_uv((fj + 1) * inv)
            keep = (cu1 >= bu0) & (cu0 <= bu1) & (cv1 >= bv0) & (cv0 <= bv1)
            fi, fj = fi[keep], fj[keep]
            if fi.size == 0:
                break
        if fi.size:
            shift = MAX_LEVEL - level
            ids = _from_face_ij(
                np.full(fi.size, face, dtype=np.int64), fi << shift, fj << shift
            )
            out.append(s2_parent(ids, level) if level < MAX_LEVEL else ids)
    if not out:
        return np.array([], dtype=np.uint64)
    cover = np.sort(np.concatenate(out))
    return s2_normalize_cells(cover) if normalize else cover
