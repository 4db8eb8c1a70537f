"""Vectorized per-batch entity predicates / projections (SURVEY.md §2.2).

These run inside ``map_batches(..., batch_format="pyarrow")`` over
zero-copy Arrow batches — list-offset segment reductions with numpy
instead of per-row Python, since the ways/relations scans are hot at
planet scale.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _segment_any(flags: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """Per-list 'any(flag)' over a flattened list array given offsets."""
    n = offsets.size - 1
    out = np.zeros(n, dtype=bool)
    lengths = np.diff(offsets)
    nonempty = lengths > 0
    if flags.size:
        cums = np.concatenate([[0], np.cumsum(flags.astype(np.int64))])
        seg_sums = cums[offsets[1:]] - cums[offsets[:-1]]
        out = seg_sums > 0
    return out & nonempty


def _list_offsets(arr: pa.Array) -> np.ndarray:
    arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
    if isinstance(arr, pa.ListArray) or isinstance(arr, pa.LargeListArray):
        return arr.offsets.to_numpy(zero_copy_only=False), arr
    raise TypeError(f"not a list array: {arr.type}")


def tags_have_name(tags: pa.Array) -> np.ndarray:
    """``hasName`` (``graphing/EntitiesToGraph.scala:16-18``): any tag key
    == "name", startswith "name:", or == "addr:housename". Vectorized:
    flatten keys, evaluate the predicate once, segment-reduce by offsets."""
    offsets, arr = _list_offsets(tags)
    flat = arr.flatten()  # struct<key,value> array
    keys = flat.field("key")
    is_name = pc.or_(
        pc.or_(pc.equal(keys, "name"), pc.starts_with(keys, "name:")),
        pc.equal(keys, "addr:housename"),
    )
    flags = np.asarray(is_name.fill_null(False).to_numpy(zero_copy_only=False), dtype=bool)
    # flatten() yields only this array's window; rebase offsets to it
    return _segment_any(flags, offsets - offsets[0])


def ways_closed(node_ids: pa.Array) -> np.ndarray:
    """Vectorized ``way.isClosed``: first node id == last node id and the
    way has >= 4 node refs (a degenerate 2-3 point 'ring' has no area)."""
    offsets, arr = _list_offsets(node_ids)
    values = arr.values.to_numpy(zero_copy_only=False)
    lengths = np.diff(offsets)
    ok = lengths >= 4
    first = np.zeros(lengths.size, dtype=np.int64)
    last = np.zeros(lengths.size, dtype=np.int64)
    nz = lengths > 0
    first[nz] = values[offsets[:-1][nz]]
    last[nz] = values[offsets[1:][nz] - 1]
    return ok & (first == last)


def filter_named_relations(batch: pa.Table) -> pa.Table:
    """F1 for relations: keep iff named."""
    mask = tags_have_name(batch["tags"])
    return batch.filter(pa.array(mask))


def filter_area_ways(batch: pa.Table) -> pa.Table:
    """F1 for ways: keep iff closed && named
    (``graphing/EntitiesToGraph.scala:8-14``)."""
    mask = tags_have_name(batch["tags"]) & ways_closed(batch["node_ids"])
    return batch.filter(pa.array(mask))
