"""Tiling (C7, ``steps/Tiling.scala:20-135``): materialize per-geohash-cell
tile partitions of the area graph.

The reference loads the whole graph into heap and, per geohash-res-3 tile
(32,768 of them), walks it keeping nodes whose area **intersects** the
tile bbox, writing per-tile graph/areas/tags files. Ray-Data-native
re-expression:

* area→tile assignment is a ``map_batches`` flat-map: each area emits one
  row per covering geohash cell that passes the exact
  ``rings_intersect`` test against the cell bbox (the cover prefilter
  replaces the per-tile full-graph walk);
* the per-tile graph is the induced subgraph: since children are
  spatially inside parents, child-intersects-tile ⇒ parent does, so the
  per-tile edge set is just ``edges ⋈ assignments`` on the child id;
* per-tile parquet partitions are written under ``tile=<geohash>/`` with
  per-partition lineage manifests (checkpoint-resume per north_rule) —
  the analog of the reference's ``.graphv2-<gh>.pbf`` family but
  resumable and columnar.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from ..geometry import geohash_bbox, geohash_cover, rings_intersect
from ..state.manifest import PartitionManifest, commit_partition, pending_partitions

ROOT_AREA_ID = -1


def assign_area_tiles(
    areas: rd.Dataset,
    *,
    precision: int = 3,
    grid: str = "geohash",
    s2_level: int = 7,
) -> rd.Dataset:
    """areas → (tile_id, area_id) assignment rows (A4/J7).

    ``grid="geohash"`` (the reference's scheme): bbox cover refined by
    the exact ring-vs-cell-rect intersection (geohash cells ARE lat/lon
    rects). ``grid="s2"``: tile ids are S2 tokens at ``s2_level`` from
    ``s2_rect_cover`` of the area bbox — a guaranteed-superset covering
    (S2 cells are not lat/lon rects, so the cover is refined in
    uv-space against the bbox footprint instead of per-ring; a superset
    is exactly what tile-serving correctness requires)."""
    if grid not in ("geohash", "s2"):
        raise ValueError(f"unknown tile grid {grid!r}")

    def fn(batch: pa.Table) -> pa.Table:
        from ..s2 import s2_rect_cover, s2_token

        tiles: list[str] = []
        ids: list[int] = []
        aid = batch["area_id"].to_pylist()
        lats_col = batch["lats"].to_pylist()
        lons_col = batch["lons"].to_pylist()
        min_lat = batch["min_lat"].to_numpy()
        min_lon = batch["min_lon"].to_numpy()
        max_lat = batch["max_lat"].to_numpy()
        max_lon = batch["max_lon"].to_numpy()
        for i in range(len(batch)):
            if grid == "s2":
                cover_ids = s2_rect_cover(
                    min_lat[i], max_lat[i], min_lon[i], max_lon[i], s2_level
                )
                for tok in s2_token(cover_ids):
                    tiles.append(tok)
                    ids.append(int(aid[i]))
                continue
            ring_lats = np.asarray(lats_col[i], dtype=np.float64)
            ring_lons = np.asarray(lons_col[i], dtype=np.float64)
            cover = geohash_cover(
                (min_lat[i], min_lon[i], max_lat[i], max_lon[i]), precision
            )
            for cell in cover:
                b = geohash_bbox(cell)
                cell_lats = np.array([b[0], b[0], b[2], b[2]])
                cell_lons = np.array([b[1], b[3], b[3], b[1]])
                if rings_intersect(ring_lats, ring_lons, cell_lats, cell_lons):
                    tiles.append(cell)
                    ids.append(int(aid[i]))
        return pa.table(
            {
                "tile_id": pa.array(tiles, pa.string()),
                "area_id": pa.array(ids, pa.int64()),
            }
        )

    return areas.map_batches(fn, batch_format="pyarrow")


def tile_graph_edges(
    edges: rd.Dataset, assignments: rd.Dataset, *, join_partitions: int = 8
) -> rd.Dataset:
    """(tile_id, parent_area_id, child_area_id) induced per-tile subgraph:
    every edge whose child intersects the tile (parent then must —
    children are spatially nested; root edges keep the synthetic root)."""
    child_assign = assignments.map_batches(
        lambda b: pa.table({"child_area_id": b["area_id"], "tile_id": b["tile_id"]}),
        batch_format="pyarrow",
    )
    joined = edges.join(
        child_assign,
        join_type="inner",
        num_partitions=join_partitions,
        on=("child_area_id",),
    )
    return joined.select_columns(["tile_id", "parent_area_id", "child_area_id"])


def write_tiles(
    areas_df: pd.DataFrame,
    tile_edges,
    taggings: dict[str, dict[str, str]],
    out_root: str,
) -> list[str]:
    """Materialize per-tile partitions (areas + graph + tags parquet) with
    lineage manifests; returns newly-committed partition names.

    Distributed: ``groupby(tile_id).map_groups`` runs one task per tile —
    each group holds exactly its tile's edges, pulls the broadcast area
    catalog + taggings (ONE object-store copy, ``ray.get`` is cached per
    worker process), writes its parquet trio and commits the manifest
    worker-side. Already-committed tiles short-circuit inside the group
    (the checkpoint-resume path), so a rerun shuffles edge rows but
    rewrites nothing. ``out_root`` must be a filesystem every worker can
    reach (shared fs / object store on a real cluster).

    ``tile_edges`` may be a Dataset or a DataFrame (tests use the
    latter)."""
    import ray

    if isinstance(tile_edges, pd.DataFrame):
        tile_edges = rd.from_pandas(tile_edges)

    areas_ref = ray.put(areas_df)
    tags_ref = ray.put(taggings)

    def write_one(group: pd.DataFrame) -> pd.DataFrame:
        import pyarrow.parquet as pq

        t = group["tile_id"].iloc[0]
        part = f"tile={t}"
        if not pending_partitions(out_root, [part]):
            return pd.DataFrame({"tile": [part], "new": [False]})
        areas_all = ray.get(areas_ref)
        tags_all = ray.get(tags_ref)
        area_by_id = areas_all.set_index("area_id", drop=False)
        tile_area_ids = sorted(
            set(group["child_area_id"]) | set(group["parent_area_id"]) - {ROOT_AREA_ID}
        )
        a = area_by_id.loc[area_by_id.index.intersection(tile_area_ids)]
        osm_ids = {o for ids in a["osm_ids"] for o in ids}
        tag_rows = [
            {"osm_id": o, "keys": list(tags_all[o]), "values": list(tags_all[o].values())}
            for o in sorted(osm_ids)
            if o in tags_all
        ]

        def write_fn(tmp_dir):
            pq.write_table(
                pa.Table.from_pandas(
                    group[["parent_area_id", "child_area_id"]],
                    preserve_index=False,
                ),
                f"{tmp_dir}/graph.parquet",
            )
            pq.write_table(
                pa.Table.from_pandas(a.reset_index(drop=True), preserve_index=False),
                f"{tmp_dir}/areas.parquet",
            )
            tags_table = (
                pa.Table.from_pylist(tag_rows)
                if tag_rows
                else pa.table(
                    {
                        "osm_id": pa.array([], pa.string()),
                        "keys": pa.array([], pa.list_(pa.string())),
                        "values": pa.array([], pa.list_(pa.string())),
                    }
                )
            )
            pq.write_table(tags_table, f"{tmp_dir}/tags.parquet")

        commit_partition(
            out_root,
            part,
            write_fn,
            PartitionManifest(
                partition=part,
                rows=len(group),
                fingerprint=f"{len(a)}a/{len(group)}e/{len(tag_rows)}t",
                inputs=["areas", "graph_edges", "taggings"],
            ),
        )
        return pd.DataFrame({"tile": [part], "new": [True]})

    res = (
        tile_edges.groupby("tile_id")
        .map_groups(write_one, batch_format="pandas")
        .to_pandas()
    )
    if res.empty or "tile" not in res.columns:
        return []
    return sorted(res[res["new"]]["tile"])
