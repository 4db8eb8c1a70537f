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
        used: set[str] = ray.get(used_ref)
        osm_ids = pc.binary_join_element_wise(
            pc.cast(batch[id_col], pa.string()), entity_type[0].upper(), ""
        )
        mask = pc.is_in(osm_ids, value_set=pa.array(sorted(used), pa.string()))
        out = pa.table({"osm_id": osm_ids, "tags": batch["tags"]})
        return out.filter(mask)

    return ds.map_batches(fn, batch_format="pyarrow")


def extract_taggings(
    ways: rd.Dataset, relations: rd.Dataset, used_osm_ids: set[str]
) -> rd.Dataset:
    """(ways, relations, used id set) → taggings Dataset (osm_id, tags)."""
    used_ref = ray.put(used_osm_ids)
    w = _extract_for(ways.select_columns(["way_id", "tags"]), "way_id", "way", used_ref)
    r = _extract_for(
        relations.select_columns(["rel_id", "tags"]), "rel_id", "relation", used_ref
    )
    return w.union(r)


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
