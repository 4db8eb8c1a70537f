"""Tile-served reverse geocoding (ST6 analog).

The reference API answers ``GET /reverse?lat&lon`` from per-geohash-tile
files fetched lazily and held in a Guava cache of 10
(``osm-jigsaw-api/app/graph/GraphService.scala:23-60``; tiling is what
takes its heap from 64 GB to 4 GB — ``/root/reference/README.md:10,164``).
:class:`TileServer` is the engine-side equivalent: it answers point
queries from the ``tiles/`` partitions :func:`pipelines.tiling.write_tiles`
materializes — per-tile parquet read on first touch, LRU of built
:class:`PipJoiner` packs — without ever loading the global area pack.
"""

from __future__ import annotations

from collections import OrderedDict

import numpy as np
import pyarrow.parquet as pq

from .geometry import geohash_encode
from .stages.pip import PipJoiner

ROOT_AREA_ID = -1


def load_tile_pack(tiles_root: str, tile: str) -> dict | None:
    """One tile partition (``tile=<id>/{areas,graph,tags}.parquet``) →
    a PipJoiner-ready pack, or None when the tile has no partition
    (ocean). Shared by :class:`TileServer` and the tiled batch join
    (``pipelines.pages.geo_join_pages_tiled``)."""
    import os

    import pandas as pd

    part = os.path.join(tiles_root, f"tile={tile}")
    if not os.path.exists(os.path.join(part, "_MANIFEST.json")):
        return None
    areas_df = pq.read_table(os.path.join(part, "areas.parquet")).to_pandas()
    edges_df = pq.read_table(os.path.join(part, "graph.parquet")).to_pandas()
    tags_df = pq.read_table(os.path.join(part, "tags.parquet")).to_pandas()
    taggings = {
        r["osm_id"]: dict(zip(r["keys"], r["values"]))
        for _, r in tags_df.iterrows()
    }
    edges_df = pd.DataFrame(
        {
            "parent_area_id": edges_df["parent_area_id"],
            "child_area_id": edges_df["child_area_id"],
        }
    )
    # build_area_pack + orphan promotion (root edges may fall outside
    # the tile) — shared with the partitioned join's per-cell packs
    from .stages.pip import pack_from_tables

    return pack_from_tables(areas_df, edges_df, taggings)


class TileServer:
    """Lazy per-tile reverse geocoder over a ``tiles/`` directory.

    ``tile_precision`` must match the precision the tiles were written
    at. ``cache_tiles`` mirrors the reference's 10-entry Guava cache.
    Points whose tile has no partition (ocean) return empty paths; the
    kNN fallback is tile-local by construction (the global pack is
    exactly what a tile server must not load)."""

    def __init__(
        self,
        tiles_root: str,
        tile_precision: int = 1,
        cache_tiles: int = 10,
        grid: str = "geohash",
        s2_level: int = 7,
    ):
        if grid not in ("geohash", "s2"):
            raise ValueError(f"unknown tile grid {grid!r}")
        self.root = tiles_root
        self.precision = tile_precision
        self.cache_tiles = cache_tiles
        self.grid = grid
        self.s2_level = s2_level
        self._cache: OrderedDict[str, PipJoiner | None] = OrderedDict()

    def _tile_of(self, lat: float, lon: float) -> str:
        """Point -> tile id under the server's grid (exact for points
        under both grids; only the polygon-side assignment is a
        superset cover for s2)."""
        if self.grid == "s2":
            from .s2 import s2_encode, s2_token

            return str(
                s2_token(
                    s2_encode(np.array([lat]), np.array([lon]), self.s2_level)
                )[0]
            )
        return str(
            geohash_encode(np.array([lat]), np.array([lon]), self.precision)[0]
        )

    def _load_tile(self, gh: str) -> PipJoiner | None:
        pack = load_tile_pack(self.root, gh)
        return None if pack is None else PipJoiner(pack)

    def _joiner(self, gh: str) -> PipJoiner | None:
        if gh in self._cache:
            self._cache.move_to_end(gh)
            return self._cache[gh]
        joiner = self._load_tile(gh)
        self._cache[gh] = joiner
        if len(self._cache) > self.cache_tiles:
            self._cache.popitem(last=False)
        return joiner

    def nodes_for(self, q: str, lat: float, lon: float) -> list[int]:
        """Resolve a claimed ``/``-separated area-id path against the
        graph of the tile covering (lat, lon) — the
        ``nodesFor``/``parseComponents`` walk of the reference
        (``osm-jigsaw-api/app/controllers/Application.scala:81-106,118-120``):
        starting from the tile's root children, each component that IS a
        child of the current node appends and descends; components not
        found are skipped WITHOUT advancing (reference ``found.foreach``
        semantics). Returns the matched area ids in walk order."""
        joiner = self._joiner(self._tile_of(lat, lon))
        if joiner is None:
            return []
        components = [int(c) for c in q.split("/") if c]
        nodes: list[int] = []
        current_children = joiner.top_level
        for nxt in components:
            if nxt in current_children:
                nodes.append(nxt)
                current_children = joiner.children.get(nxt, [])
        return nodes

    def _render_node(self, joiner: PipJoiner, aid: int, language: str | None) -> dict:
        """The ``renderNode`` analog (``Application.scala:125-134``):
        per-osm-id entities named through the tile's taggings (fallback:
        the area id string), plus child count and planar size."""
        from .model import name_from_tags_for_language

        a = joiner.areas[aid]
        entities = [
            {
                "osmId": o,
                "name": name_from_tags_for_language(
                    joiner.taggings.get(o, {}), language or "en"
                )
                or str(aid),
            }
            for o in a["osm_ids"]
        ]
        return {
            "id": aid,
            "entities": entities,
            "children": len(joiner.children.get(aid, [])),
            "area": a["area"],
        }

    def show(self, q: str, lat: float, lon: float, language: str | None = None) -> list[dict]:
        """``GET /show?q&lat&lon`` analog: the rendered graph nodes of a
        claimed path (``Application.scala:54-61``)."""
        joiner = self._joiner(self._tile_of(lat, lon))
        if joiner is None:
            return []
        return [
            self._render_node(joiner, aid, language)
            for aid in self.nodes_for(q, lat, lon)
        ]

    def points(self, q: str, lat: float, lon: float) -> list[dict] | None:
        """``GET /points?q&lat&lon`` analog: the outline ring of the
        LAST node the claimed path resolves to
        (``Application.scala:64-77``), or None (→ 404) when the path
        matches nothing."""
        joiner = self._joiner(self._tile_of(lat, lon))
        if joiner is None:
            return None
        nodes = self.nodes_for(q, lat, lon)
        if not nodes:
            return None
        a = joiner.areas[nodes[-1]]
        return [
            {"lat": float(la), "lon": float(lo)}
            for la, lo in zip(a["lats"], a["lons"])
        ]

    def reverse(self, lat: float, lon: float, language: str | None = None) -> dict:
        gh = self._tile_of(lat, lon)
        joiner = self._joiner(gh)
        if joiner is None:
            return {
                "paths": [],
                "area_ids": [],
                "name": "",
                "nearest_area_id": None,
                "cell_id": "",
                "tile": gh,
            }
        import pyarrow as pa

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
            "tile": gh,
        }
