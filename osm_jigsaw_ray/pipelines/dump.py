"""Full-graph name dump (C10) — the reference's ``osm-jigsaw-output``
CLI (``osm-jigsaw-output/src/main/scala/Main.scala:18-71``): enumerate
every root→leaf trace of the containment DAG, group traces by leaf, and
name each leaf group via naive naming. The whole-output verification
surface of the engine.

Ray expression: leaves fan out as a Dataset and each row names itself
against the broadcast pack (at planet scale this runs per tile partition
— the per-tile packs of ``pipelines/tiling.py`` bound actor state)."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from ..naming import name_for_paths

ROOT_AREA_ID = -1


def all_leaf_paths(pack: dict) -> dict[int, list[tuple[int, ...]]]:
    """{leaf_area_id: [root→leaf paths]} via DFS from every top-level
    area (cycle-free by construction: containment is a partial order)."""
    children = pack["children"]
    out: dict[int, list[tuple[int, ...]]] = {}

    def walk(aid: int, prefix: tuple):
        path = prefix + (aid,)
        kids = children.get(aid, [])
        if not kids:
            out.setdefault(aid, []).append(path)
            return
        for c in kids:
            walk(c, path)

    for top in pack["top_level"]:
        walk(top, ())
    return out


def dump_names(pack_or_ref, language: str | None = None) -> rd.Dataset:
    """Dataset of (leaf_area_id, name, osm_ids) — one row per leaf."""
    pack = (
        pack_or_ref if isinstance(pack_or_ref, dict) else ray.get(pack_or_ref)
    )
    leaf_paths = all_leaf_paths(pack)
    leaves = sorted(leaf_paths)
    pack_ref = ray.put(pack) if isinstance(pack_or_ref, dict) else pack_or_ref
    paths_ref = ray.put(leaf_paths)

    def name_batch(batch: pa.Table) -> pa.Table:
        p = ray.get(pack_ref)
        lp = ray.get(paths_ref)
        areas = p["areas"]
        names, osm_ids_col = [], []
        for leaf in batch["leaf_area_id"].to_pylist():
            paths = [
                [(areas[a]["osm_ids"], areas[a]["area"]) for a in path]
                for path in lp[leaf]
            ]
            names.append(name_for_paths(paths, p["taggings"], language))
            osm_ids_col.append(areas[leaf]["osm_ids"])
        return pa.table(
            {
                "leaf_area_id": batch["leaf_area_id"],
                "name": pa.array(names, pa.string()),
                "osm_ids": pa.array(osm_ids_col, pa.list_(pa.string())),
            }
        )

    ds = rd.from_arrow(
        pa.table({"leaf_area_id": pa.array(leaves, pa.int64())})
    )
    return ds.map_batches(name_batch, batch_format="pyarrow")
