"""Point-in-polygon descent + kNN fallback + naming stage (J8/J10/C8/C9).

Re-expresses the reference API's per-request graph descent
(``osm-jigsaw-api/app/graph/GraphService.scala:63-90`` ``pathsDownTo`` +
``app/areas/AreaComparison.scala:14-47``) as a batched actor-pool
``map_batches`` stage:

* the **area pack** (polygons as numpy rings, containment adjacency,
  taggings) is built once, put in the object store (``ray.put``), and
  rehydrated once per actor in ``__init__`` — the per-actor
  prepared-geometry / polygon-cache analog (ST4/ST5);
* per batch, the containment DAG is walked **frontier-style**: for each
  top-level area, one vectorized winding-number test over every point in
  the batch (bbox mask first), then recurse into children on the
  surviving subset — each point yields all its root→leaf paths exactly
  like ``nodesContaining`` does per request;
* points contained by nothing fall back to the nearest area by ring
  centroid (J10, kNN fallback mandated by the north star);
* naming (C9) runs in the same actor via the broadcast taggings.

Scale note: this is the broadcast-small-side join — right for an area
pack that fits the object store (planet untiled = 13 GB). The
partitioned path for bigger-than-memory packs is
``pipelines/pages.py::geo_join_pages_partitioned`` (salted
groupby-on-cell co-partition).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from ..geometry import PreparedRing, geohash_encode
from ..naming import name_for_paths

ROOT_AREA_ID = -1


def densify_pack(pack: dict, points_per_edge: int = 32) -> dict:
    """Interpolate extra vertices along every ring edge (shape-identical
    polygons, N× the vertices). Real OSM areas carry thousands of points
    per ring (planet areas file = 13 GB, SURVEY.md §6); the fixture boxes
    have 4 — benchmarks densify so the winding-number work per page is
    representative. Purely a benchmarking/realism transform."""
    out_areas = {}
    for aid, a in pack["areas"].items():
        lats, lons = a["lats"], a["lons"]
        nlat, nlon = [], []
        n = lats.size
        for i in range(n):
            j = (i + 1) % n
            t = np.linspace(0.0, 1.0, points_per_edge, endpoint=False)
            nlat.append(lats[i] + (lats[j] - lats[i]) * t)
            nlon.append(lons[i] + (lons[j] - lons[i]) * t)
        out_areas[aid] = {
            **a,
            "lats": np.concatenate(nlat),
            "lons": np.concatenate(nlon),
        }
    return {**pack, "areas": out_areas}


def build_area_pack(
    areas_df: pd.DataFrame,
    edges_df: pd.DataFrame,
    taggings: dict[str, dict[str, str]],
) -> dict:
    """areas + graph edges + taggings → the broadcastable pack consumed by
    :class:`PipJoiner`. Children are pre-sorted by descending area then id
    so descent order (and therefore path order) is deterministic."""
    areas: dict[int, dict] = {}
    for _, r in areas_df.iterrows():
        areas[int(r["area_id"])] = {
            "lats": np.asarray(r["lats"], dtype=np.float64),
            "lons": np.asarray(r["lons"], dtype=np.float64),
            "bbox": (
                float(r["min_lat"]),
                float(r["min_lon"]),
                float(r["max_lat"]),
                float(r["max_lon"]),
            ),
            "area": float(r["area"]),
            "osm_ids": list(r["osm_ids"]),
        }
    children: dict[int, list[int]] = {}
    for p, c in zip(
        edges_df["parent_area_id"].tolist(), edges_df["child_area_id"].tolist()
    ):
        children.setdefault(int(p), []).append(int(c))
    for p in children:
        children[p].sort(key=lambda a: (-areas[a]["area"], a))
    top_level = children.get(ROOT_AREA_ID, [])
    return {
        "areas": areas,
        "children": children,
        "top_level": top_level,
        "taggings": taggings,
    }


def pack_from_tables(
    areas_df: pd.DataFrame,
    edges_df: pd.DataFrame,
    taggings: dict[str, dict[str, str]] | None = None,
) -> dict:
    """Cell/tile-subset pack: :func:`build_area_pack` + orphan promotion.

    A tile's induced subgraph may lack explicit root edges for areas
    whose only parents fall outside the tile — promote such orphans to
    top level so descent can reach them (the reference's per-tile graph
    files have the same property: every kept node is reachable,
    ``steps/Tiling.scala:60-96``). With ``taggings=None`` the pack omits
    the key entirely so :class:`PipJoiner` names through its ``shared``
    side object (one global taggings copy, never per-cell)."""
    pack = build_area_pack(
        areas_df, edges_df, taggings if taggings is not None else {}
    )
    if taggings is None:
        pack.pop("taggings")
    known_children = {c for kids in pack["children"].values() for c in kids}
    orphans = [
        aid
        for aid in pack["areas"]
        if aid not in known_children and aid not in pack["top_level"]
    ]
    if orphans:
        areas = pack["areas"]
        tops = pack["top_level"] + orphans
        tops.sort(key=lambda a: (-areas[a]["area"], a))
        pack["top_level"] = tops
        pack["children"][ROOT_AREA_ID] = tops
    return pack


def attach_holes(pack: dict, holes) -> dict:
    """Opt-in hole-aware containment (beyond reference parity — see
    :func:`pipelines.areas.resolve_area_holes`): returns a NEW pack
    whose areas carry their inner rings as ``"holes"`` lists. ``holes``
    is the (osm_id, lats, lons) holes table (Dataset or DataFrame). A
    hole attaches to every area whose ``osm_ids`` include the owning
    relation id. Packs never passed through here are byte-identical to
    before — hole awareness is off by default."""
    import pandas as pd

    if not isinstance(holes, pd.DataFrame):
        holes = holes.to_pandas()
    by_osm: dict[str, list] = {}
    for _, r in holes.iterrows():
        by_osm.setdefault(str(r["osm_id"]), []).append(
            (
                np.asarray(r["lats"], dtype=np.float64),
                np.asarray(r["lons"], dtype=np.float64),
            )
        )
    out_areas = {}
    for aid, a in pack["areas"].items():
        rings = [h for o in a["osm_ids"] for h in by_osm.get(o, [])]
        out_areas[aid] = {**a, "holes": rings} if rings else a
    return {**pack, "areas": out_areas}


def reverse_point(
    pack: dict, lat: float, lon: float, language: str | None = None
) -> dict:
    """Single-point reverse geocode — the ``GET /reverse?lat&lon`` /
    ``/name`` API analog (``controllers/Application.scala:22-51``):
    returns {"paths": [...], "area_ids": [...], "name": str,
    "nearest_area_id": int|None}. A convenience wrapper over the batch
    joiner for interactive use."""
    joiner = PipJoiner(pack, name_results=True)
    batch = pa.table(
        {
            "lat": pa.array([float(lat)], pa.float64()),
            "lon": pa.array([float(lon)], pa.float64()),
            "lang": pa.array([language], pa.string()),
        }
    )
    row = joiner(batch).to_pylist()[0]
    return {
        "paths": [list(p) for p in row["paths"]],
        "area_ids": list(row["area_ids"]),
        "name": row["name"],
        "nearest_area_id": row["nearest_area_id"] if not row["area_ids"] else None,
        "cell_id": row["cell_id"],
    }


def build_knn_side(pack: dict) -> dict:
    """Global kNN fallback side data: centroid arrays + per-area naming
    metadata (osm_ids, size) + the NAMING PROJECTION of the taggings
    (:func:`..naming.project_naming_tags` — name*/addr:housename/
    excluded-pair keys only, exact for naming) — everything a
    partitioned joiner needs besides its own cell's polygons. EVERY
    field is a numpy/Arrow buffer (:class:`..state.sidestore.ArrowOsmList`
    / :class:`..state.sidestore.ArrowTagStore` for the osm ids and the
    projection) so the ``ray.put`` copy is plasma-MAPPED shared by all
    workers on a node — Python tuple/dict representations rehydrated
    into each worker's private heap (~2.2 GB/worker at 1M areas,
    BENCH_RESULTS.md lifecycle rehearsal) — never the reference's
    2.3 GB planet tag table per worker."""
    from ..state.sidestore import ArrowOsmList, naming_store_from_taggings

    areas = pack["areas"]
    ids = sorted(areas)
    return {
        "knn_ids": np.array(ids, dtype=np.int64),
        "knn_lat": np.array([areas[i]["lats"].mean() for i in ids], dtype=np.float64),
        "knn_lon": np.array([areas[i]["lons"].mean() for i in ids], dtype=np.float64),
        "knn_osm": ArrowOsmList.from_lists([areas[i]["osm_ids"] for i in ids]),
        "knn_area": np.array([areas[i]["area"] for i in ids], dtype=np.float64),
        "taggings": naming_store_from_taggings(pack["taggings"]),
    }


def build_knn_side_from_tables(areas, taggings) -> dict:
    """Pack-free :func:`build_knn_side`: the shared kNN/naming side
    object built straight from the areas Dataset (per-ring centroid
    means, bit-identical to :func:`build_knn_side`'s ``np.mean``) and a
    taggings Dataset — so the tiled/partitioned joins' ONLY global
    structure is these slim arrays (8+8+8 B + osm ids per area) plus
    the NAMING PROJECTION of the tags (name*/addr:housename/
    excluded-pair keys, :func:`..naming.project_naming_tags`) — never
    the polygon pack and never the full tag table (2.3 GB at planet
    scale). ``taggings`` may also be a plain dict."""
    def _ring_means(col: pa.ChunkedArray) -> np.ndarray:
        # per-ring np.mean over zero-copy views — bit-identical to
        # build_knn_side's areas[i]["lats"].mean() (np.mean's pairwise
        # summation), which a batch-wide cumsum difference is NOT: on
        # kNN distance near-ties the tiled/partitioned join could
        # otherwise diverge from the broadcast path in the last ulp.
        # Cost is one tiny np.mean per AREA (not per point), on the
        # one-off slim-side build.
        arr = col.combine_chunks()
        offs = np.asarray(arr.offsets).astype(np.int64)
        vals = arr.values.to_numpy(zero_copy_only=False)
        return np.array(
            [
                vals[s:e].mean() if e > s else 0.0
                for s, e in zip(offs[:-1], offs[1:])
            ],
            dtype=np.float64,
        )

    rows = []
    for batch in areas.select_columns(
        ["area_id", "lats", "lons", "area", "osm_ids"]
    ).iter_batches(batch_format="pyarrow"):
        rows.append(
            (
                batch["area_id"].to_numpy(zero_copy_only=False).astype(np.int64),
                _ring_means(batch["lats"]),
                _ring_means(batch["lons"]),
                batch["area"].to_numpy(zero_copy_only=False).astype(np.float64),
                [tuple(x) for x in batch["osm_ids"].to_pylist()],
            )
        )
    ids = np.concatenate([r[0] for r in rows]) if rows else np.array([], np.int64)
    order = np.argsort(ids, kind="stable")
    osm_flat = [t for r in rows for t in r[4]]
    from ..state.sidestore import ArrowOsmList, naming_store_from_taggings

    return {
        "knn_ids": ids[order],
        "knn_lat": (np.concatenate([r[1] for r in rows]) if rows else np.array([]))[order],
        "knn_lon": (np.concatenate([r[2] for r in rows]) if rows else np.array([]))[order],
        "knn_osm": ArrowOsmList.from_lists([osm_flat[i] for i in order]),
        "knn_area": (np.concatenate([r[3] for r in rows]) if rows else np.array([]))[order],
        # projected DISTRIBUTED, stored as Arrow buffers (plasma-shared
        # across workers; the full planet tag table — 2.3 GB — never
        # lands whole on any process)
        "taggings": naming_store_from_taggings(taggings),
    }


class GridKNN:
    """Grid-bucketed nearest-centroid index (J10 scale path): centroids
    bucket once into a coarse lat/lon grid; each query point searches
    expanding Chebyshev rings of cells and stops when its best squared
    distance is provably ≤ the minimum possible distance to the next
    ring (ring r+1 cells are ≥ r·cell_deg away from any point inside
    the query's cell). Exact: returns the same id as the dense
    (misses × n_areas) matrix the round-1 fallback built — including
    the smallest-id tie-break — without ever materializing it.
    Planar degree² metric, no meridian wrap (reference semantics)."""

    def __init__(self, ids: np.ndarray, lats: np.ndarray, lons: np.ndarray):
        # ids must be ascending (build_knn_side sorts) so candidate
        # order inherits the smallest-id-wins argmin tie-break
        self.ids = np.asarray(ids, dtype=np.int64)
        self.lats = np.asarray(lats, dtype=np.float64)
        self.lons = np.asarray(lons, dtype=np.float64)
        n = self.ids.size
        if n == 0:
            self.cell = 1.0
            self.buckets: dict[tuple[int, int], np.ndarray] = {}
            return
        lat_span = max(self.lats.max() - self.lats.min(), 1e-9)
        lon_span = max(self.lons.max() - self.lons.min(), 1e-9)
        side = max(1, int(np.ceil(np.sqrt(n))))
        self.cell = max(lat_span, lon_span) / side
        self.lat0 = float(self.lats.min())
        self.lon0 = float(self.lons.min())
        ci = np.floor((self.lats - self.lat0) / self.cell).astype(np.int64)
        cj = np.floor((self.lons - self.lon0) / self.cell).astype(np.int64)
        self.buckets = {}
        order = np.lexsort((np.arange(n), cj, ci))
        keys = np.stack([ci[order], cj[order]], axis=1)
        change = np.flatnonzero(np.any(np.diff(keys, axis=0) != 0, axis=1)) + 1
        for seg in np.split(order, change):
            self.buckets[(int(ci[seg[0]]), int(cj[seg[0]]))] = np.sort(seg)
        self.ci_lo, self.ci_hi = int(ci.min()), int(ci.max())
        self.cj_lo, self.cj_hi = int(cj.min()), int(cj.max())
        self.max_ring = int(max(ci.max() - ci.min(), cj.max() - cj.min())) + 1

    def _ring_cells(self, i: int, j: int, r: int):
        if r == 0:
            yield (i, j)
            return
        for dj in range(-r, r + 1):
            yield (i - r, j + dj)
            yield (i + r, j + dj)
        for di in range(-r + 1, r):
            yield (i + di, j - r)
            yield (i + di, j + r)

    def nearest(self, plats: np.ndarray, plons: np.ndarray) -> np.ndarray:
        plats = np.asarray(plats, dtype=np.float64)
        plons = np.asarray(plons, dtype=np.float64)
        n = plats.size
        out = np.full(n, -1, dtype=np.int64)
        if self.ids.size == 0 or n == 0:
            return out
        # clamp far-outside queries onto the grid extent: the ring lower
        # bound below stays valid from the clamped cell (the point lies
        # beyond it in exactly the clamped axes), and the ring cap then
        # covers every bucket
        pi = np.clip(
            np.floor((plats - self.lat0) / self.cell).astype(np.int64),
            self.ci_lo,
            self.ci_hi,
        )
        pj = np.clip(
            np.floor((plons - self.lon0) / self.cell).astype(np.int64),
            self.cj_lo,
            self.cj_hi,
        )
        # group query points by grid cell: co-located points share rings
        order = np.lexsort((np.arange(n), pj, pi))
        keys = np.stack([pi[order], pj[order]], axis=1)
        change = (
            np.flatnonzero(np.any(np.diff(keys, axis=0) != 0, axis=1)) + 1
            if n > 1
            else np.array([], dtype=np.int64)
        )
        for seg in np.split(order, change):
            i, j = int(pi[seg[0]]), int(pj[seg[0]])
            best_d2 = np.full(seg.size, np.inf)
            best_idx = np.full(seg.size, -1, dtype=np.int64)
            for r in range(0, self.max_ring + 2):
                if r > 0:
                    # cells at ring >= r are at least (r-1)*cell away from
                    # any point inside (or clamped to) cell (i, j); strict
                    # `<` keeps searching on exact-boundary ties so the
                    # global smallest-id tie-break below stays exact
                    bound = (r - 1) * self.cell
                    if (best_idx >= 0).all() and (best_d2 < bound * bound).all():
                        break
                cand_list = [
                    self.buckets[c]
                    for c in self._ring_cells(i, j, r)
                    if c in self.buckets
                ]
                if not cand_list:
                    continue
                cand = np.sort(np.concatenate(cand_list))
                d2 = (self.lats[cand][None, :] - plats[seg][:, None]) ** 2 + (
                    self.lons[cand][None, :] - plons[seg][:, None]
                ) ** 2
                loc = np.argmin(d2, axis=1)
                dmin = d2[np.arange(seg.size), loc]
                new_idx = cand[loc]
                # argmin-first within the (id-sorted) ring candidates plus
                # an explicit equal-distance smaller-id preference across
                # rings == the dense argmin's global smallest-id tie-break
                upd = (dmin < best_d2) | (
                    (dmin == best_d2) & (new_idx < best_idx)
                )
                best_d2[upd] = dmin[upd]
                best_idx[upd] = new_idx[upd]
            out[seg] = self.ids[best_idx]
        return out


class _ChainTags:
    """Two-level tag lookup: the cell/tile pack's own (full) taggings
    first, the shared side's global naming projection second — so a
    partitioned joiner names in-cell path areas from rows that rode its
    own co-partition shuffle, and only the kNN-fallback area (which may
    lie outside the cell) reads the slim global projection. Exposes the
    one method naming consumes (``.get``)."""

    __slots__ = ("local", "fallback")

    def __init__(self, local: dict, fallback: dict):
        self.local = local
        self.fallback = fallback

    def get(self, key, default=None):
        v = self.local.get(key)
        if v is not None:
            return v
        v = self.fallback.get(key)
        return v if v is not None else default


class PipJoiner:
    """Actor-pool batch joiner: (url, lat, lon, lang, ...) → join rows.

    ``shared`` (dict or ObjectRef) optionally carries the global kNN
    fallback arrays + the naming projection of the taggings (see
    :func:`build_knn_side`) so a cell-partitioned joiner holding only
    its cell's polygons still resolves uncontained points against ALL
    area centroids — keeping the partitioned path's output identical to
    the broadcast path's."""

    def __init__(
        self,
        pack_ref,
        tile_precision: int = 3,
        name_results: bool = True,
        shared=None,
    ):
        pack = ray.get(pack_ref) if not isinstance(pack_ref, dict) else pack_ref
        if shared is not None and not isinstance(shared, dict):
            shared = ray.get(shared)
        self.areas = pack["areas"]
        self.children = pack["children"]
        self.top_level = pack["top_level"]
        if "taggings" in pack and shared is not None and "taggings" in shared:
            # pack-local (full, rode the co-partition) first; shared
            # global naming projection for out-of-cell fallback areas
            self.taggings = _ChainTags(pack["taggings"], shared["taggings"])
        elif "taggings" in pack:
            self.taggings = pack["taggings"]
        else:
            self.taggings = shared["taggings"]
        self.tile_precision = tile_precision
        self.name_results = name_results
        if shared is not None and "knn_ids" in shared:
            self.knn_ids = shared["knn_ids"]
            self.knn_lat = shared["knn_lat"]
            self.knn_lon = shared["knn_lon"]
            self._knn_osm = shared["knn_osm"]
            self._knn_area = shared["knn_area"]
        else:
            side = build_knn_side({"areas": self.areas, "taggings": {}})
            self.knn_ids = side["knn_ids"]
            self.knn_lat = side["knn_lat"]
            self.knn_lon = side["knn_lon"]
            self._knn_osm = side["knn_osm"]
            self._knn_area = side["knn_area"]
        self._name_cache: dict = {}
        self._knn_grid: GridKNN | None = None
        # lazily-built per-area PreparedRing cache (ST4 geometry
        # acceleration analog): only rings whose bbox a batch actually
        # hits pay the one-time bucketing cost
        self._rings: dict[int, PreparedRing] = {}
        # opt-in hole awareness (attach_holes): descent stays on outer
        # rings (nested islands inside holes remain reachable) and paths
        # are post-filtered per point — zero cost when no area has holes
        self._has_holes = any("holes" in a for a in self.areas.values())
        self._hole_rings: dict[tuple[int, int], PreparedRing] = {}

    def _ring(self, aid: int) -> PreparedRing:
        pr = self._rings.get(aid)
        if pr is None:
            a = self.areas[aid]
            pr = PreparedRing(a["lats"], a["lons"])
            self._rings[aid] = pr
        return pr

    def _area_info(self, aid: int) -> tuple[tuple, float]:
        """(osm_ids, planar size) for naming — local polygon pack first,
        else the shared kNN metadata (sorted-array binary search; a
        fallback id may not be in this cell's pack)."""
        a = self.areas.get(aid)
        if a is not None:
            return tuple(a["osm_ids"]), a["area"]
        j = int(np.searchsorted(self.knn_ids, aid))
        if j >= self.knn_ids.size or self.knn_ids[j] != aid:
            return (), 0.0
        return tuple(self._knn_osm[j]), float(self._knn_area[j])

    # -- DAG descent -------------------------------------------------------
    def _descend(
        self,
        area_id: int,
        pts_idx: np.ndarray,
        lats: np.ndarray,
        lons: np.ndarray,
        prefix: tuple,
        paths_out: dict[int, list[tuple]],
    ):
        """Recursive frontier descent: pts_idx are the points inside
        ``area_id``; extend their path, recurse into containing children;
        points no child contains terminate here."""
        path = prefix + (area_id,)
        kids = self.children.get(area_id, [])
        covered = np.zeros(pts_idx.size, dtype=bool)
        for child in kids:
            a = self.areas[child]
            b = a["bbox"]
            mask = (
                (lats[pts_idx] >= b[0])
                & (lats[pts_idx] <= b[2])
                & (lons[pts_idx] >= b[1])
                & (lons[pts_idx] <= b[3])
            )
            if not mask.any():
                continue
            cand = pts_idx[mask]
            inside = self._ring(child).contains(lats[cand], lons[cand])
            if inside.any():
                hit = cand[inside]
                self._descend(child, hit, lats, lons, path, paths_out)
                covered[np.isin(pts_idx, hit)] = True
        terminal = pts_idx[~covered]
        for i in terminal:
            paths_out.setdefault(int(i), []).append(path)

    def _in_any_hole(self, aid: int, lat: float, lon: float) -> bool:
        """True when the point falls in a hole ring of the area (the
        hole's closure is subtracted: boundary points count as in the
        hole)."""
        for hidx, (hla, hlo) in enumerate(self.areas[aid].get("holes", ())):
            pr = self._hole_rings.get((aid, hidx))
            if pr is None:
                pr = PreparedRing(hla, hlo)
                self._hole_rings[(aid, hidx)] = pr
            if bool(pr.contains(np.array([lat]), np.array([lon]))[0]):
                return True
        return False

    def _filter_hole_paths(
        self, paths_out: dict[int, list[tuple]], lats, lons
    ) -> dict[int, list[tuple]]:
        """Drop hole-excluded areas from each point's paths: descent ran
        on outer rings, so a path may pass THROUGH a donut area to reach
        an island nested in its hole — the donut is removed, the island
        kept. Paths collapsing to a strict prefix of another of the same
        point's paths (no longer maximal) and empty paths drop."""
        out: dict[int, list[tuple]] = {}
        for i, plist in paths_out.items():
            la, lo = float(lats[i]), float(lons[i])
            filtered = []
            for path in plist:
                kept = tuple(
                    aid
                    for aid in path
                    if not (
                        "holes" in self.areas.get(aid, {})
                        and self._in_any_hole(aid, la, lo)
                    )
                )
                if kept:
                    filtered.append(kept)
            uniq = sorted(set(filtered), key=lambda p: (len(p), p))
            final = [
                p
                for p in uniq
                if not any(q != p and q[: len(p)] == p for q in uniq)
            ]
            if final:
                out[i] = final
        return out

    def _paths_for_batch(self, lats, lons) -> dict[int, list[tuple]]:
        paths_out: dict[int, list[tuple]] = {}
        all_idx = np.arange(lats.size)
        for top in self.top_level:
            a = self.areas[top]
            b = a["bbox"]
            mask = (lats >= b[0]) & (lats <= b[2]) & (lons >= b[1]) & (lons <= b[3])
            if not mask.any():
                continue
            cand = all_idx[mask]
            inside = self._ring(top).contains(lats[cand], lons[cand])
            if inside.any():
                self._descend(top, cand[inside], lats, lons, (), paths_out)
        if self._has_holes:
            paths_out = self._filter_hole_paths(paths_out, lats, lons)
        return paths_out

    def _name_for(self, name_paths: tuple, lang) -> str:
        """Memoized naming: pages sharing a point region share identical
        path sets, so the (paths, lang) key hit rate is near 100% — this
        removes per-row python naming from the hot loop."""
        key = (name_paths, lang)
        cached = self._name_cache.get(key)
        if cached is None:
            naming_input = [
                [self._area_info(a) for a in p] for p in name_paths
            ]
            cached = name_for_paths(naming_input, self.taggings, lang)
            if len(self._name_cache) < 100_000:
                self._name_cache[key] = cached
        return cached

    # -- batch entry -------------------------------------------------------
    def __call__(self, batch: pa.Table) -> pa.Table:
        lats = batch["lat"].to_numpy(zero_copy_only=False).astype(np.float64)
        lons = batch["lon"].to_numpy(zero_copy_only=False).astype(np.float64)
        langs = (
            batch["lang"].to_pylist() if "lang" in batch.column_names else [None] * len(batch)
        )
        n = len(batch)
        paths_out = self._paths_for_batch(lats, lons)

        # pages whose html carried no geo.position meta have lat/lon = NaN:
        # they must not reach the kNN (argmin over an all-NaN row returns 0
        # → a fabricated nearest area) nor the geohash cast (NaN→uint64 is
        # garbage); they keep cell_id="", nearest_area_id=-1, name=""
        valid = ~(np.isnan(lats) | np.isnan(lons))
        cells = np.full(n, "", dtype=object)
        if valid.any():
            cells[valid] = geohash_encode(
                lats[valid], lons[valid], self.tile_precision
            )
        area_ids_col: list[list[int]] = []
        paths_col: list[list[list[int]]] = []
        nearest_col = np.full(n, -1, dtype=np.int64)
        names: list[str] = [""] * n

        # grid-bucketed kNN for all uncontained (valid) points at once
        # (J10): built lazily once per actor; exact same answers as the
        # dense (misses x n_areas) matrix, never materializing it
        misses = np.array(
            [i for i in range(n) if i not in paths_out and valid[i]],
            dtype=np.int64,
        )
        if misses.size and self.knn_ids.size:
            if self._knn_grid is None:
                self._knn_grid = GridKNN(self.knn_ids, self.knn_lat, self.knn_lon)
            nearest_col[misses] = self._knn_grid.nearest(
                lats[misses], lons[misses]
            )

        ids_cache: dict[tuple, list[int]] = {}
        for i in range(n):
            paths = tuple(paths_out.get(i, ()))
            if paths:
                seen = ids_cache.get(paths)
                if seen is None:
                    seen = []
                    for p in paths:
                        for a in p:
                            if a not in seen:
                                seen.append(a)
                    ids_cache[paths] = seen
                area_ids_col.append(seen)
                paths_col.append([list(p) for p in paths])
            else:
                area_ids_col.append([])
                paths_col.append([])
            if self.name_results:
                name_paths = paths or (
                    ((int(nearest_col[i]),),) if nearest_col[i] >= 0 else ()
                )
                names[i] = self._name_for(name_paths, langs[i])

        out = batch.append_column("cell_id", pa.array(cells.tolist(), pa.string()))
        out = out.append_column(
            "area_ids", pa.array(area_ids_col, pa.list_(pa.int64()))
        )
        out = out.append_column(
            "paths", pa.array(paths_col, pa.list_(pa.list_(pa.int64())))
        )
        out = out.append_column("nearest_area_id", pa.array(nearest_col, pa.int64()))
        if self.name_results:
            out = out.append_column("name", pa.array(names, pa.string()))
        return out
