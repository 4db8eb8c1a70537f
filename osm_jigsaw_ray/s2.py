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

    n = face.astype(np.uint64) << np.uint64(60)
    bits = face & _SWAP  # faces alternate start orientation -> curve is
    # continuous across face boundaries
    for k in range(7, -1, -1):
        key = (bits + (((i >> (4 * k)) & 15) << 6) + (((j >> (4 * k)) & 15) << 2))
        val = LOOKUP_POS[key]
        n |= (val >> 2).astype(np.uint64) << np.uint64(8 * k)
        bits = val & 3
    ids = n * np.uint64(2) + np.uint64(1)  # leaf (level 30)
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
                ids = np.concatenate([ids[levels != lvl], at[~drop], promote])
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
