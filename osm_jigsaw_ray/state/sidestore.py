"""Plasma-friendly shared-side stores for the kNN/naming broadcast.

The partitioned/tiled joins ship ONE global side object (kNN centroid
arrays + per-area osm ids + the naming projection of the tags) to every
joiner via ``ray.put``. The float arrays were always fine — numpy
buffers deserialize zero-copy out of the plasma mapping, so N workers
on a node share ONE physical copy. The osm-id tuples and the
dict-of-dicts tag projection were NOT: Python containers rehydrate into
each worker's PRIVATE heap on every ``ray.get`` — measured at ~2.2 GB
per worker / 751 MB on the driver at 1M areas (lifecycle rehearsal,
BENCH_RESULTS.md), which would be ~33 GB/worker at the 15M-area planet.

These classes keep the same lookup interfaces (``store.get(osm_id)``,
``osm_list[j]``) but hold ONLY Arrow arrays and numpy buffers, so the
per-worker private cost is a few objects regardless of catalog size:

* :class:`ArrowOsmList` — ``j -> tuple of osm ids`` (int64 offsets +
  one Arrow string array).
* :class:`ArrowTagStore` — ``osm_id -> projected tag dict`` via a
  vectorized-hash binary search (``pipelines.shuffle.hash_strings``
  order) with EXACT key verification on the probed run, so hash
  collisions cannot produce a wrong dict — at worst they cost one extra
  string compare. Tag keys/values are aligned ``list<string>`` columns.

Lookup cost is paid only on ``PipJoiner._name_for`` cache misses (the
per-(paths, lang) memo absorbs the hot loop).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


class ArrowOsmList:
    """Immutable ``j -> tuple[str, ...]`` over (offsets, flat values)."""

    __slots__ = ("offsets", "values")

    def __init__(self, offsets: np.ndarray, values: pa.Array):
        self.offsets = offsets
        self.values = values

    @classmethod
    def from_lists(cls, lists: list) -> "ArrowOsmList":
        offsets = np.zeros(len(lists) + 1, dtype=np.int64)
        np.cumsum([len(x) for x in lists], out=offsets[1:])
        flat = [o for x in lists for o in x]
        return cls(offsets, pa.array(flat, pa.string()))

    def __len__(self) -> int:
        return len(self.offsets) - 1

    def __getitem__(self, j: int) -> tuple:
        a, b = int(self.offsets[j]), int(self.offsets[j + 1])
        return tuple(self.values.slice(a, b - a).to_pylist())

    def __iter__(self):
        for j in range(len(self)):
            yield self[j]

    def __eq__(self, other) -> bool:
        if not isinstance(other, ArrowOsmList):
            return NotImplemented
        return np.array_equal(self.offsets, other.offsets) and self.values.equals(
            other.values
        )


class ArrowTagStore:
    """``osm_id -> {key: value}`` lookup over hash-sorted Arrow arrays.

    ``get``/``__getitem__``/``__contains__``/``__len__`` mirror the dict
    surface naming consumes (``tags_for.get(o, {})`` and the chain-tags
    fallback)."""

    __slots__ = ("hashes", "ids", "tag_keys", "tag_vals")

    def __init__(self, ids: pa.Array, tag_keys: pa.Array, tag_vals: pa.Array):
        """``ids``: string array; ``tag_keys``/``tag_vals``: aligned
        ``list<string>`` arrays (the projected tags). Sorted internally."""
        from ..pipelines.shuffle import hash_strings

        def _flat(a):
            return a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a

        h = hash_strings(ids)
        order = pa.array(np.argsort(h, kind="stable"))
        self.hashes = np.sort(h, kind="stable")
        self.ids = _flat(ids.take(order))
        self.tag_keys = _flat(tag_keys.take(order))
        self.tag_vals = _flat(tag_vals.take(order))

    @classmethod
    def from_dict(cls, d: dict) -> "ArrowTagStore":
        ids = pa.array(list(d), pa.string())
        tag_keys = pa.array([list(t) for t in d.values()], pa.list_(pa.string()))
        tag_vals = pa.array(
            [list(t.values()) for t in d.values()], pa.list_(pa.string())
        )
        return cls(ids, tag_keys, tag_vals)

    def __len__(self) -> int:
        return len(self.ids)

    def _probe(self, osm_id: str) -> int:
        from ..pipelines.shuffle import hash_strings

        h = hash_strings(pa.array([osm_id], pa.string()))[0]
        lo = int(np.searchsorted(self.hashes, h, side="left"))
        hi = int(np.searchsorted(self.hashes, h, side="right"))
        for j in range(lo, hi):  # exact verify: collisions cost a compare
            if self.ids[j].as_py() == osm_id:
                return j
        return -1

    def get(self, osm_id, default=None):
        j = self._probe(osm_id)
        if j < 0:
            return default
        return dict(
            zip(self.tag_keys[j].as_py(), self.tag_vals[j].as_py())
        )

    def __getitem__(self, osm_id):
        v = self.get(osm_id)
        if v is None:
            raise KeyError(osm_id)
        return v

    def __contains__(self, osm_id) -> bool:
        return self._probe(osm_id) >= 0

    def __eq__(self, other) -> bool:
        if not isinstance(other, ArrowTagStore):
            return NotImplemented
        return (
            self.ids.equals(other.ids)
            and self.tag_keys.equals(other.tag_keys)
            and self.tag_vals.equals(other.tag_vals)
        )


def naming_store_from_taggings(taggings) -> ArrowTagStore:
    """(osm_id, tags) Dataset (or plain dict) → :class:`ArrowTagStore`
    of the NAMING PROJECTION (:func:`..naming.project_naming_tags`).

    Dataset path: the projection runs DISTRIBUTED (map_batches) and only
    the slim projected batches stream to the builder — the full planet
    tag table (2.3 GB) never lands on one process."""
    from ..naming import project_naming_tags

    if isinstance(taggings, dict):
        return ArrowTagStore.from_dict(
            {o: project_naming_tags(t) for o, t in taggings.items()}
        )

    from ..model import tags_to_dict

    def project(batch: pa.Table) -> pa.Table:
        ids, keys, vals = [], [], []
        for osm_id, tags in zip(
            batch["osm_id"].to_pylist(), batch["tags"].to_pylist()
        ):
            t = project_naming_tags(tags_to_dict(tags))
            ids.append(osm_id)
            keys.append(list(t))
            vals.append(list(t.values()))
        return pa.table(
            {
                "osm_id": pa.array(ids, pa.string()),
                "keys": pa.array(keys, pa.list_(pa.string())),
                "values": pa.array(vals, pa.list_(pa.string())),
            }
        )

    parts = [
        b
        for b in taggings.map_batches(project, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        )
    ]
    if parts:
        tbl = pa.concat_tables([pa.table(b) if isinstance(b, dict) else b for b in parts])
        ids = tbl["osm_id"].combine_chunks()
        keys = tbl["keys"].combine_chunks()
        vals = tbl["values"].combine_chunks()
    else:
        ids = pa.array([], pa.string())
        keys = pa.array([], pa.list_(pa.string()))
        vals = pa.array([], pa.list_(pa.string()))
    return ArrowTagStore(ids, keys, vals)
