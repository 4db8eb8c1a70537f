"""Tag extraction (F8/J5, ``steps/ExtractAreaTags.scala:16-43``):
collect the taggings of every osm entity referenced by a resolved area.

The used-id set is a broadcast semi-join (small side: one string per
area-contributing entity), applied as a vectorized membership filter over
the ways/relations scans — the Ray analog of the reference's in-heap
``Set`` + full-extract rescan.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from ..model import osm_id_for, tags_to_dict


def _extract_for(
    ds: rd.Dataset, id_col: str, entity_type: str, used_ref
) -> rd.Dataset:
    def fn(batch: pa.Table) -> pa.Table:
        used: pa.Array = ray.get(used_ref)  # pre-sorted Arrow value set
        osm_ids = pc.binary_join_element_wise(
            pc.cast(batch[id_col], pa.string()), entity_type[0].upper(), ""
        )
        mask = pc.is_in(osm_ids, value_set=used)
        out = pa.table({"osm_id": osm_ids, "tags": batch["tags"]})
        return out.filter(mask)

    return ds.map_batches(fn, batch_format="pyarrow")


def extract_taggings(
    ways: rd.Dataset, relations: rd.Dataset, used_osm_ids: set[str]
) -> rd.Dataset:
    """(ways, relations, used id set) → taggings Dataset (osm_id, tags).
    The value set converts to ONE Arrow array up front (it was rebuilt
    per batch). For a used-id side too large to hold anywhere, use
    :func:`extract_taggings_semijoin`."""
    used_ref = ray.put(pa.array(sorted(used_osm_ids), pa.string()))
    w = _extract_for(ways.select_columns(["way_id", "tags"]), "way_id", "way", used_ref)
    r = _extract_for(
        relations.select_columns(["rel_id", "tags"]), "rel_id", "relation", used_ref
    )
    return w.union(r)


def extract_taggings_semijoin(
    ways: rd.Dataset,
    relations: rd.Dataset,
    areas: rd.Dataset,
    *,
    num_partitions: int = 64,
) -> rd.Dataset:
    """Fully distributed variant: the used-id side stays a Dataset
    (exploded straight from ``areas.osm_ids``) and co-partitions with
    the entity tag tables through one hash shuffle — no driver- or
    worker-held global id set, the shape for a 15M-area planet where
    the used set itself is heap-sized. Arrow end-to-end (tags are
    list<struct> and must not round-trip pandas). Output rows equal
    :func:`extract_taggings`'s."""
    import numpy as np

    from .shuffle import hash_strings

    tags_type = ways.schema().base_schema.field("tags").type

    def part_col(ids: pa.Array, n: int) -> pa.Array:
        # vectorized (no per-row crc32 in the planet tag-shuffle map side)
        return pa.array((hash_strings(ids) % np.uint64(n)).astype(np.int32))

    def member_rows(batch: pa.Table) -> pa.Table:
        col = batch["osm_ids"].combine_chunks()
        flat = col.flatten().cast(pa.string())
        tbl = pa.table(
            {
                "osm_id": flat,
                "tags": pa.nulls(len(flat), tags_type),
                "__m": pa.array(np.ones(len(flat), dtype=bool)),
            }
        )
        return tbl.append_column("__part", part_col(flat, num_partitions))

    def entity_rows(id_col: str, entity_type: str):
        def fn(batch: pa.Table) -> pa.Table:
            osm_ids = pc.binary_join_element_wise(
                pc.cast(batch[id_col], pa.string()), entity_type[0].upper(), ""
            )
            tbl = pa.table(
                {
                    "osm_id": osm_ids,
                    "tags": batch["tags"].combine_chunks().cast(tags_type),
                    "__m": pa.array(np.zeros(len(batch), dtype=bool)),
                }
            )
            return tbl.append_column(
                "__part", part_col(tbl["osm_id"].combine_chunks(), num_partitions)
            )

        return fn

    unioned = (
        areas.select_columns(["osm_ids"])
        .map_batches(member_rows, batch_format="pyarrow")
        .union(
            ways.select_columns(["way_id", "tags"]).map_batches(
                entity_rows("way_id", "way"), batch_format="pyarrow"
            )
        )
        .union(
            relations.select_columns(["rel_id", "tags"]).map_batches(
                entity_rows("rel_id", "relation"), batch_format="pyarrow"
            )
        )
    )

    def keep_used(group: pa.Table) -> pa.Table:
        m = group["__m"].to_numpy(zero_copy_only=False)
        members = group.filter(pa.array(m))
        ents = group.filter(pa.array(~m))
        if len(members) == 0 or len(ents) == 0:
            return pa.table(
                {"osm_id": pa.array([], pa.string()), "tags": pa.array([], tags_type)}
            )
        mask = pc.is_in(
            ents["osm_id"],
            value_set=members["osm_id"].combine_chunks().unique(),
        )
        kept = ents.filter(mask)
        return pa.table({"osm_id": kept["osm_id"], "tags": kept["tags"]})

    from .shuffle import grouped_map

    return grouped_map(
        unioned,
        "__part",
        keep_used,
        num_partitions=num_partitions,
        batch_format="pyarrow",
        whole_partition=True,  # is_in semi-join matches ids in-block
    )


def taggings_to_dict(taggings: rd.Dataset) -> dict[str, dict[str, str]]:
    """Materialize the (small) taggings table into the broadcastable
    ``{osm_id: {k: v}}`` map used by naming (ST7 analog)."""
    out: dict[str, dict[str, str]] = {}
    for batch in taggings.iter_batches(batch_format="pyarrow"):
        for osm_id, tags in zip(
            batch["osm_id"].to_pylist(), batch["tags"].to_pylist()
        ):
            out[osm_id] = tags_to_dict(tags)
    return out
