"""Planar geometry kernels (numpy, vectorized) for the ray-jigsaw engine.

The reference (tonytw1/osm-jigsaw) does all geometry through the esri
geometry API on a planar ``SpatialReference.create(1)`` — lat/lon treated
as plain x/y coordinates with **x = lat, y = lon**
(``osm-jigsaw-parser/src/main/scala/resolving/PolygonBuilding.scala:26-45``,
``areas/AreaComparision.scala:8-10``). Planar degree^2 areas and the
unhandled 180th-meridian wraparound are *semantics to preserve*, not bugs
to fix, so every kernel here is planar.

No shapely / GEOS in this environment: point-in-polygon is an exact
winding-number test on the ring coordinates (per the north-star statement
in BASELINE.json), polygon-polygon containment is a closure-based test
(all vertices inside-or-on + no proper edge crossings), and areas use the
shoelace formula — all vectorized numpy.

Containment is **closure-based** to match esri ``OperatorContains`` as
exercised by the reference's own spec: in
``graphing/GraphBuilderSpec.scala:34-44`` the ``left``/``right`` halves
share edges with ``large`` yet are its children, so boundary contact must
count as contained.
"""

from __future__ import annotations

import hashlib

import numpy as np

__all__ = [
    "ring_area",
    "ring_bbox",
    "points_in_ring",
    "PreparedRing",
    "ring_contains_ring",
    "rings_intersect",
    "bbox_contains_bbox",
    "bbox_intersects_bbox",
    "canonical_ring_signature",
    "stable_area_id",
    "geohash_encode",
    "geohash_bbox",
    "geohash_cells",
    "GEOHASH_BASE32",
]

_EPS = 1e-12


# ---------------------------------------------------------------------------
# scalar ring measures
# ---------------------------------------------------------------------------

def ring_area(lats: np.ndarray, lons: np.ndarray) -> float:
    """Planar shoelace area in degree^2, absolute value.

    Mirrors ``Math.abs(polygon.calculateArea2D())``
    (``osm-jigsaw-parser/src/main/scala/areas/AreaComparision.scala:25-27``).
    The ring closes implicitly (esri auto-closes paths); an explicitly
    duplicated closing vertex contributes zero and is harmless.
    """
    x = np.asarray(lats, dtype=np.float64)
    y = np.asarray(lons, dtype=np.float64)
    if x.size < 3:
        return 0.0
    x2 = np.roll(x, -1)
    y2 = np.roll(y, -1)
    return float(abs(np.sum(x * y2 - x2 * y)) * 0.5)


def ring_bbox(lats: np.ndarray, lons: np.ndarray) -> tuple[float, float, float, float]:
    """(min_lat, min_lon, max_lat, max_lon).

    The reference returns ``(minX, maxY, maxX, minY)`` with x=lat, y=lon
    (``resolving/BoundingBox.scala:7-23``); this is the same information in
    a fixed, explicit order.
    """
    lats = np.asarray(lats, dtype=np.float64)
    lons = np.asarray(lons, dtype=np.float64)
    return (
        float(lats.min()),
        float(lons.min()),
        float(lats.max()),
        float(lons.max()),
    )


def bbox_contains_bbox(outer, inner) -> bool:
    o0, o1, o2, o3 = outer
    i0, i1, i2, i3 = inner
    return o0 <= i0 + _EPS and o1 <= i1 + _EPS and o2 >= i2 - _EPS and o3 >= i3 - _EPS


def bbox_intersects_bbox(a, b) -> bool:
    return not (a[2] < b[0] or b[2] < a[0] or a[3] < b[1] or b[3] < a[1])


# ---------------------------------------------------------------------------
# point-in-polygon: winding number, vectorized over points
# ---------------------------------------------------------------------------

def points_in_ring(
    ring_lats: np.ndarray,
    ring_lons: np.ndarray,
    pt_lats: np.ndarray,
    pt_lons: np.ndarray,
) -> np.ndarray:
    """Exact winding-number point-in-polygon over many points at once.

    Returns a bool array; points on the ring boundary count as inside
    (closure semantics — see module docstring). O(V * P) numpy ops where V
    is ring length, P point count. Replaces the per-point
    ``OperatorContains.execute(polygon, point)`` of
    ``osm-jigsaw-api/app/areas/AreaComparison.scala:40-42``.
    """
    rx = np.asarray(ring_lats, dtype=np.float64)
    ry = np.asarray(ring_lons, dtype=np.float64)
    px = np.asarray(pt_lats, dtype=np.float64)
    py = np.asarray(pt_lons, dtype=np.float64)
    n = px.shape[0]
    if rx.size < 3 or n == 0:
        return np.zeros(n, dtype=bool)
    # drop explicit closing vertex if present
    if rx[0] == rx[-1] and ry[0] == ry[-1]:
        rx = rx[:-1]
        ry = ry[:-1]
        if rx.size < 3:
            return np.zeros(n, dtype=bool)

    # tile the point dimension so the (V, chunk) intermediates stay
    # cache-resident — the dense (V, P) product otherwise streams
    # hundreds of MB through memory per call on planet-sized rings
    max_cells = 1_000_000
    if rx.size * n > max_cells:
        chunk = max(16, max_cells // rx.size)
        out = np.empty(n, dtype=bool)
        for s in range(0, n, chunk):
            out[s : s + chunk] = points_in_ring(rx, ry, px[s : s + chunk], py[s : s + chunk])
        return out

    x1 = rx[:, None]  # (V, 1)
    y1 = ry[:, None]
    x2 = np.roll(rx, -1)[:, None]
    y2 = np.roll(ry, -1)[:, None]

    # cross product of (edge vector, vertex->point vector): sign = side of edge
    cross = (x2 - x1) * (py[None, :] - y1) - (y2 - y1) * (px[None, :] - x1)

    upward = (y1 <= py[None, :]) & (y2 > py[None, :])
    downward = (y1 > py[None, :]) & (y2 <= py[None, :])
    wn = (upward & (cross > 0)).sum(axis=0) - (downward & (cross < 0)).sum(axis=0)
    inside = wn != 0

    # boundary: point collinear with edge and within its bbox
    on_edge = (
        (np.abs(cross) <= _EPS)
        & (px[None, :] >= np.minimum(x1, x2) - _EPS)
        & (px[None, :] <= np.maximum(x1, x2) + _EPS)
        & (py[None, :] >= np.minimum(y1, y2) - _EPS)
        & (py[None, :] <= np.maximum(y1, y2) + _EPS)
    ).any(axis=0)
    return inside | on_edge


class PreparedRing:
    """y-bucketed edge index for repeated PIP tests against one ring —
    the per-actor "geometry acceleration" analog of the reference's
    ``OperatorContains.accelerateGeometry`` (ST4,
    ``graphing/GraphBuilder.scala:92-94,120``): built once per hot ring
    in actor state, reused for every batch.

    Exactly the same winding-number / boundary arithmetic as
    :func:`points_in_ring` — an edge can only contribute to a point's
    winding count or boundary test when the point's y (lon) lies within
    the edge's eps-widened y-span, so each point consults only the edges
    bucketed at its own y. Per-point work drops from O(V) to O(edges
    crossing its y-band) (~O(1) for real polygons); equivalence is
    pinned by ``tests/test_geometry.py``.
    """

    __slots__ = (
        "ok", "x1", "y1", "x2", "y2", "ylo", "h", "B", "edge_by_bucket",
        "indptr",
    )

    def __init__(self, ring_lats, ring_lons, max_buckets: int = 1024):
        rx = np.asarray(ring_lats, dtype=np.float64)
        ry = np.asarray(ring_lons, dtype=np.float64)
        if rx.size >= 3 and rx[0] == rx[-1] and ry[0] == ry[-1]:
            rx, ry = rx[:-1], ry[:-1]
        self.ok = rx.size >= 3
        if not self.ok:
            return
        self.x1, self.y1 = rx, ry
        self.x2, self.y2 = np.roll(rx, -1), np.roll(ry, -1)
        ylo = float(ry.min()) - _EPS
        yhi = float(ry.max()) + _EPS
        B = int(min(max_buckets, max(1, rx.size)))
        self.ylo = ylo
        self.B = B
        self.h = max((yhi - ylo) / B, 1e-300)
        e_lo = np.minimum(self.y1, self.y2) - _EPS
        e_hi = np.maximum(self.y1, self.y2) + _EPS
        b0 = np.clip(((e_lo - ylo) / self.h).astype(np.int64), 0, B - 1)
        b1 = np.clip(((e_hi - ylo) / self.h).astype(np.int64), 0, B - 1)
        spans = b1 - b0 + 1
        edge_ids = np.repeat(np.arange(rx.size, dtype=np.int64), spans)
        csum = np.cumsum(spans) - spans
        buckets = (
            np.arange(int(spans.sum()), dtype=np.int64)
            - np.repeat(csum, spans)
            + np.repeat(b0, spans)
        )
        order = np.argsort(buckets, kind="stable")
        self.edge_by_bucket = edge_ids[order]
        self.indptr = np.searchsorted(
            buckets[order], np.arange(B + 1, dtype=np.int64)
        )

    def contains(self, pt_lats: np.ndarray, pt_lons: np.ndarray) -> np.ndarray:
        px = np.asarray(pt_lats, dtype=np.float64)
        py = np.asarray(pt_lons, dtype=np.float64)
        n = px.size
        out = np.zeros(n, dtype=bool)
        if not self.ok or n == 0:
            return out
        pb = np.floor((py - self.ylo) / self.h)
        in_range = (pb >= 0) & (pb < self.B)
        if not in_range.any():
            return out
        pbi = pb[in_range].astype(np.int64)
        pxs, pys = px[in_range], py[in_range]
        starts = self.indptr[pbi]
        cnt = self.indptr[pbi + 1] - starts
        total = int(cnt.sum())
        if total == 0:
            return out
        seg_off = np.cumsum(cnt) - cnt
        flat = (
            np.arange(total, dtype=np.int64)
            - np.repeat(seg_off, cnt)
            + np.repeat(starts, cnt)
        )
        p_rel = np.repeat(np.arange(pbi.size, dtype=np.int64), cnt)
        e = self.edge_by_bucket[flat]
        X1, Y1, X2, Y2 = self.x1[e], self.y1[e], self.x2[e], self.y2[e]
        PX, PY = pxs[p_rel], pys[p_rel]
        cross = (X2 - X1) * (PY - Y1) - (Y2 - Y1) * (PX - X1)
        up = (Y1 <= PY) & (Y2 > PY) & (cross > 0)
        dn = (Y1 > PY) & (Y2 <= PY) & (cross < 0)
        wn = np.bincount(
            p_rel,
            weights=up.astype(np.float64) - dn.astype(np.float64),
            minlength=pbi.size,
        )
        on = (
            (np.abs(cross) <= _EPS)
            & (PX >= np.minimum(X1, X2) - _EPS)
            & (PX <= np.maximum(X1, X2) + _EPS)
            & (PY >= np.minimum(Y1, Y2) - _EPS)
            & (PY <= np.maximum(Y1, Y2) + _EPS)
        )
        on_p = np.bincount(p_rel, weights=on, minlength=pbi.size) > 0
        out[in_range] = (wn != 0) | on_p
        return out


# ---------------------------------------------------------------------------
# polygon-polygon predicates
# ---------------------------------------------------------------------------

def _proper_crossings(ax1, ay1, ax2, ay2, bx1, by1, bx2, by2) -> bool:
    """True if any edge of A properly crosses any edge of B (vectorized
    all-pairs; endpoint/collinear contact is NOT a proper crossing)."""
    # orientation of (p, q, r): sign of cross((q-p), (r-p))
    d1 = (ax2 - ax1)[:, None] * (by1[None, :] - ay1[:, None]) - (ay2 - ay1)[:, None] * (
        bx1[None, :] - ax1[:, None]
    )
    d2 = (ax2 - ax1)[:, None] * (by2[None, :] - ay1[:, None]) - (ay2 - ay1)[:, None] * (
        bx2[None, :] - ax1[:, None]
    )
    d3 = (bx2 - bx1)[None, :] * (ay1[:, None] - by1[None, :]) - (by2 - by1)[None, :] * (
        ax1[:, None] - bx1[None, :]
    )
    d4 = (bx2 - bx1)[None, :] * (ay2[:, None] - by1[None, :]) - (by2 - by1)[None, :] * (
        ax2[:, None] - bx1[None, :]
    )
    return bool(
        (
            (np.sign(d1) * np.sign(d2) < -_EPS)
            & (np.sign(d3) * np.sign(d4) < -_EPS)
            & (np.abs(d1) > _EPS)
            & (np.abs(d2) > _EPS)
            & (np.abs(d3) > _EPS)
            & (np.abs(d4) > _EPS)
        ).any()
    )


def _edges(lats: np.ndarray, lons: np.ndarray):
    rx = np.asarray(lats, dtype=np.float64)
    ry = np.asarray(lons, dtype=np.float64)
    if rx[0] == rx[-1] and ry[0] == ry[-1]:
        rx, ry = rx[:-1], ry[:-1]
    return rx, ry, np.roll(rx, -1), np.roll(ry, -1)


def ring_contains_ring(a_lats, a_lons, b_lats, b_lons) -> bool:
    """Closure containment: ring A contains ring B.

    True iff every vertex of B is inside-or-on A and no edge of B properly
    crosses an edge of A. Identical rings contain each other (needed by
    exact dedup's mutual-contains check, ``areas/AreaComparision.scala:20-23``)
    and boundary-sharing children count as contained (GraphBuilderSpec
    left/right-in-large case).
    """
    if not bbox_contains_bbox(ring_bbox(a_lats, a_lons), ring_bbox(b_lats, b_lons)):
        return False
    bx = np.asarray(b_lats, dtype=np.float64)
    by = np.asarray(b_lons, dtype=np.float64)
    if not points_in_ring(a_lats, a_lons, bx, by).all():
        return False
    ax1, ay1, ax2, ay2 = _edges(a_lats, a_lons)
    bx1, by1, bx2, by2 = _edges(b_lats, b_lons)
    return not _proper_crossings(ax1, ay1, ax2, ay2, bx1, by1, bx2, by2)


def rings_intersect(a_lats, a_lons, b_lats, b_lons) -> bool:
    """Closure intersection test (``OperatorIntersects`` analog, used by
    tiling, ``steps/Tiling.scala:71``): any vertex of one inside the other,
    or any proper edge crossing."""
    if not bbox_intersects_bbox(ring_bbox(a_lats, a_lons), ring_bbox(b_lats, b_lons)):
        return False
    ax = np.asarray(a_lats, dtype=np.float64)
    ay = np.asarray(a_lons, dtype=np.float64)
    bx = np.asarray(b_lats, dtype=np.float64)
    by = np.asarray(b_lons, dtype=np.float64)
    if points_in_ring(a_lats, a_lons, bx, by).any():
        return True
    if points_in_ring(b_lats, b_lons, ax, ay).any():
        return True
    ax1, ay1, ax2, ay2 = _edges(a_lats, a_lons)
    bx1, by1, bx2, by2 = _edges(b_lats, b_lons)
    return _proper_crossings(ax1, ay1, ax2, ay2, bx1, by1, bx2, by2)


# ---------------------------------------------------------------------------
# canonical ring identity (replaces run-order-dependent AreaIdSequence)
# ---------------------------------------------------------------------------

def canonical_ring_signature(lats, lons) -> bytes:
    """Orientation- and rotation-invariant signature of a ring.

    The reference assigns areas run-order-dependent ``AtomicLong`` ids
    (``model/AreaIdSequence.scala:5-12``) and deduplicates by exact area +
    mutual contains (``steps/RenderAndDeduplicateAreas.scala:72-120``). We
    instead key on a canonical form of the vertex sequence so ids are
    content-derived and stable under any parallelism: drop the closing
    vertex, rotate so the lexicographically smallest (lat, lon) vertex is
    first, pick the direction whose successor vertex is smaller, and hash
    the raw float64 bytes.
    """
    x = np.asarray(lats, dtype=np.float64)
    y = np.asarray(lons, dtype=np.float64)
    if x.size and x[0] == x[-1] and y[0] == y[-1]:
        x, y = x[:-1], y[:-1]
    n = x.size
    if n == 0:
        return b""
    # index of lexicographically smallest (lat, lon)
    order = np.lexsort((y, x))
    start = int(order[0])
    idx_f = (start + np.arange(n)) % n  # forward
    idx_b = (start - np.arange(n)) % n  # backward
    fwd = np.stack([x[idx_f], y[idx_f]], axis=1)
    bwd = np.stack([x[idx_b], y[idx_b]], axis=1)
    # compare flattened sequences lexicographically
    ff = fwd.ravel()
    bb = bwd.ravel()
    cmp = np.nonzero(ff != bb)[0]
    chosen = fwd if (cmp.size == 0 or ff[cmp[0]] <= bb[cmp[0]]) else bwd
    return np.ascontiguousarray(chosen).tobytes()


def stable_area_id(signature: bytes) -> int:
    """Content-derived int64 area id (non-negative) from a ring signature."""
    h = hashlib.blake2b(signature, digest_size=8).digest()
    return int.from_bytes(h, "big") >> 1  # keep positive in int64


# ---------------------------------------------------------------------------
# geohash (vectorized) — the reference's cell index
# ---------------------------------------------------------------------------

GEOHASH_BASE32 = "0123456789bcdefghjkmnpqrstuvwxyz"
_B32_ARR = np.frombuffer(GEOHASH_BASE32.encode(), dtype=np.uint8)


def geohash_encode(lats: np.ndarray, lons: np.ndarray, precision: int = 3) -> np.ndarray:
    """Vectorized geohash encode → array of base32 strings.

    Same cell scheme as ``ch.hsr.geohash.GeoHash.withCharacterPrecision``
    used in ``osm-jigsaw-api/app/graph/GraphService.scala:31-32`` and
    ``tiles/TileGenerator.scala:13-31`` (res 3 => 32,768 tiles). Bits
    interleave lon-first; 5 bits per character.
    """
    lats = np.asarray(lats, dtype=np.float64)
    lons = np.asarray(lons, dtype=np.float64)
    nbits = 5 * precision
    nlon = (nbits + 1) // 2
    nlat = nbits // 2
    lon_q = np.clip(
        ((lons + 180.0) / 360.0 * (1 << nlon)).astype(np.uint64), 0, (1 << nlon) - 1
    )
    lat_q = np.clip(
        ((lats + 90.0) / 180.0 * (1 << nlat)).astype(np.uint64), 0, (1 << nlat) - 1
    )
    code = np.zeros(lats.shape, dtype=np.uint64)
    # interleave: bit position from MSB; even positions (0,2,..) take lon bits
    for i in range(nbits):
        if i % 2 == 0:
            bit = (lon_q >> np.uint64(nlon - 1 - i // 2)) & np.uint64(1)
        else:
            bit = (lat_q >> np.uint64(nlat - 1 - i // 2)) & np.uint64(1)
        code = (code << np.uint64(1)) | bit
    # split into 5-bit chars
    chars = np.empty((precision,) + lats.shape, dtype=np.uint8)
    for c in range(precision):
        shift = np.uint64(5 * (precision - 1 - c))
        chars[c] = _B32_ARR[((code >> shift) & np.uint64(31)).astype(np.int64)]
    flat = np.ascontiguousarray(chars.T.reshape(-1, precision))
    return flat.view(f"S{precision}").ravel().astype(str)


def geohash_bbox(gh: str) -> tuple[float, float, float, float]:
    """(min_lat, min_lon, max_lat, max_lon) of a geohash cell."""
    lat_lo, lat_hi = -90.0, 90.0
    lon_lo, lon_hi = -180.0, 180.0
    even = True
    for ch in gh:
        v = GEOHASH_BASE32.index(ch)
        for b in (16, 8, 4, 2, 1):
            if even:
                mid = (lon_lo + lon_hi) / 2
                if v & b:
                    lon_lo = mid
                else:
                    lon_hi = mid
            else:
                mid = (lat_lo + lat_hi) / 2
                if v & b:
                    lat_lo = mid
                else:
                    lat_hi = mid
            even = not even
    return (lat_lo, lon_lo, lat_hi, lon_hi)


def geohash_cells(precision: int) -> list[str]:
    """All 32^p geohash cells at a precision (res 3 => 32,768 — matches
    ``tiles/TileGeneratorSpec.scala:9-14``: 32 / 1,024 / 32,768)."""
    from itertools import product

    return ["".join(p) for p in product(GEOHASH_BASE32, repeat=precision)]


def _cover_grid(precision: int) -> tuple[float, float]:
    """(lat_step, lon_step) of the geohash grid at a precision."""
    nbits = 5 * precision
    return 180.0 / (1 << (nbits // 2)), 360.0 / (1 << ((nbits + 1) // 2))


def geohash_cover_ranges(
    min_lat, min_lon, max_lat, max_lon, precision: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Vectorized bbox→cover as inclusive integer cell-index ranges
    (lat_lo, lat_hi, lon_lo, lon_hi) per input bbox; an empty cover has
    hi < lo. Index arithmetic identical to :func:`geohash_cover`."""
    lat_step, lon_step = _cover_grid(precision)
    lat_lo_f = np.maximum(np.asarray(min_lat, np.float64), -90.0)
    lat_hi_f = np.minimum(np.asarray(max_lat, np.float64), 90.0 - 1e-12)
    lon_lo_f = np.maximum(np.asarray(min_lon, np.float64), -180.0)
    lon_hi_f = np.minimum(np.asarray(max_lon, np.float64), 180.0 - 1e-12)
    lat_lo = np.floor((lat_lo_f + 90.0) / lat_step).astype(np.int64)
    lat_hi = np.floor((lat_hi_f + 90.0) / lat_step).astype(np.int64)
    lon_lo = np.floor((lon_lo_f + 180.0) / lon_step).astype(np.int64)
    lon_hi = np.floor((lon_hi_f + 180.0) / lon_step).astype(np.int64)
    empty = (lat_lo_f > lat_hi_f) | (lon_lo_f > lon_hi_f)
    lat_hi = np.where(empty, lat_lo - 1, lat_hi)
    lon_hi = np.where(empty, lon_lo - 1, lon_hi)
    return lat_lo, lat_hi, lon_lo, lon_hi


def geohash_cover_counts(min_lat, min_lon, max_lat, max_lon, precision: int) -> np.ndarray:
    """Vectorized ``len(geohash_cover(bbox, precision))`` per bbox."""
    lat_lo, lat_hi, lon_lo, lon_hi = geohash_cover_ranges(
        min_lat, min_lon, max_lat, max_lon, precision
    )
    return np.maximum(lat_hi - lat_lo + 1, 0) * np.maximum(lon_hi - lon_lo + 1, 0)


def geohash_cover_batch(
    min_lat, min_lon, max_lat, max_lon, precision: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Vectorized batch cover enumeration: one call covers a whole batch
    of bboxes (replaces a per-area :func:`geohash_cover` loop). Returns
    ``(row, cells, cell_lat0, cell_lon0, cell_lat1, cell_lon1)`` where
    ``row[k]`` is the input bbox index of candidate cell ``cells[k]``
    and the cell bbox columns carry each cell's exact bounds. Candidates
    are emitted row-major (a bbox's cells are contiguous)."""
    lat_step, lon_step = _cover_grid(precision)
    lat_lo, lat_hi, lon_lo, lon_hi = geohash_cover_ranges(
        min_lat, min_lon, max_lat, max_lon, precision
    )
    nlat = np.maximum(lat_hi - lat_lo + 1, 0)
    nlon = np.maximum(lon_hi - lon_lo + 1, 0)
    counts = nlat * nlon
    total = int(counts.sum())
    if total == 0:
        z = np.array([], np.int64)
        zf = np.array([], np.float64)
        return z, np.array([], dtype="U32"), zf, zf, zf, zf
    row = np.repeat(np.arange(counts.size, dtype=np.int64), counts)
    off = np.arange(total, dtype=np.int64) - np.repeat(
        np.cumsum(counts) - counts, counts
    )
    lat_idx = lat_lo[row] + off // np.maximum(nlon[row], 1)
    lon_idx = lon_lo[row] + off % np.maximum(nlon[row], 1)
    cell_lat0 = lat_idx * lat_step - 90.0
    cell_lon0 = lon_idx * lon_step - 180.0
    cells = geohash_encode(
        cell_lat0 + lat_step / 2, cell_lon0 + lon_step / 2, precision
    )
    return row, cells, cell_lat0, cell_lon0, cell_lat0 + lat_step, cell_lon0 + lon_step


def ring_cells_intersect(
    lats, lons, cell_lat0, cell_lon0, cell_lat1, cell_lon1
) -> np.ndarray:
    """Vectorized :func:`rings_intersect` of ONE ring against many cell
    rects — exact-equivalent: (1) closed-interval vertex-in-cell (a
    strict subset of the cell ring's inclusive-boundary test, so a True
    here is always a rings_intersect True), (2) cell corners against the
    ring via the same :func:`points_in_ring` rings_intersect uses, and
    (3) the exact pairwise test on whatever survives both screens (cells
    sliced edge-through-corner with no vertex inside either shape)."""
    x = np.asarray(lats, dtype=np.float64)
    y = np.asarray(lons, dtype=np.float64)
    n = cell_lat0.size
    out = np.zeros(n, dtype=bool)
    # (1) any ring vertex inside a cell — chunked so (cells × verts)
    # broadcast stays bounded for continent-sized rings
    chunk = max(1, 4_000_000 // max(x.size, 1))
    for s in range(0, n, chunk):
        e = min(n, s + chunk)
        out[s:e] = (
            (x[None, :] >= cell_lat0[s:e, None])
            & (x[None, :] <= cell_lat1[s:e, None])
            & (y[None, :] >= cell_lon0[s:e, None])
            & (y[None, :] <= cell_lon1[s:e, None])
        ).any(axis=1)
    # (2) any cell corner inside-or-on the ring
    rem = np.flatnonzero(~out)
    if rem.size:
        cl0, cl1 = cell_lat0[rem], cell_lat1[rem]
        cn0, cn1 = cell_lon0[rem], cell_lon1[rem]
        corner_lat = np.concatenate([cl0, cl0, cl1, cl1])
        corner_lon = np.concatenate([cn0, cn1, cn1, cn0])
        inside = points_in_ring(x, y, corner_lat, corner_lon)
        out[rem[inside.reshape(4, -1).any(axis=0)]] = True
    # (3) exact fallback: edge-crossing-only intersections
    for j in np.flatnonzero(~out):
        cell_lats = np.array([cell_lat0[j], cell_lat0[j], cell_lat1[j], cell_lat1[j]])
        cell_lons = np.array([cell_lon0[j], cell_lon1[j], cell_lon1[j], cell_lon0[j]])
        if rings_intersect(x, y, cell_lats, cell_lons):
            out[j] = True
    return out


def geohash_cover(bbox: tuple[float, float, float, float], precision: int) -> list[str]:
    """Geohash cells intersecting a (min_lat, min_lon, max_lat, max_lon)
    bbox — the cell-cover used to co-partition areas with points."""
    min_lat, min_lon, max_lat, max_lon = bbox
    nbits = 5 * precision
    nlon_bits = (nbits + 1) // 2
    nlat_bits = nbits // 2
    lon_step = 360.0 / (1 << nlon_bits)
    lat_step = 180.0 / (1 << nlat_bits)
    lat_lo = max(min_lat, -90.0)
    lat_hi = min(max_lat, 90.0 - 1e-12)
    lon_lo = max(min_lon, -180.0)
    lon_hi = min(max_lon, 180.0 - 1e-12)
    if lat_lo > lat_hi or lon_lo > lon_hi:
        return []
    lat_cells = np.arange(
        np.floor((lat_lo + 90.0) / lat_step), np.floor((lat_hi + 90.0) / lat_step) + 1
    )
    lon_cells = np.arange(
        np.floor((lon_lo + 180.0) / lon_step), np.floor((lon_hi + 180.0) / lon_step) + 1
    )
    lat_centers = lat_cells * lat_step - 90.0 + lat_step / 2
    lon_centers = lon_cells * lon_step - 180.0 + lon_step / 2
    glats = np.repeat(lat_centers, lon_centers.size)
    glons = np.tile(lon_centers, lat_centers.size)
    return sorted(set(geohash_encode(glats, glons, precision).tolist()))
