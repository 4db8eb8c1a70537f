"""S2 cell assignment + compact corpus covers as Ray Data stages.

The north rule's "batched H3/S2 encode stage assigns compact cell
covers": ``s2_cells_for_points`` is the per-row encode (one vectorized
``map_batches``), ``s2_corpus_cover`` turns the corpus's footprint into
a normalized S2 cell union (the compact cover) without ever
materializing the full point set anywhere.

Scale shape of the cover:

1. encode + *in-batch dedup* (combiner: a batch of 4k points in one
   megacity collapses to a handful of cells before anything shuffles);
2. shuffle on ``__part`` = shard-ancestor hash — all cells sharing a
   level-``shard_level`` ancestor land in the same group, so every
   4-sibling collapse *below* the shard level is group-local
   (``s2_normalize_cells`` in numpy per group);
3. cells at or above the shard level are a bounded set (≤ 6*4^shard
   ids, ~1.5k at shard 4) — only that set is pulled to the driver for
   the final collapse; deeper survivors stream through untouched. A shard
   that fully collapsed to its ancestor has no deep cells left, so no
   cross-shard containment can involve the streamed-through rows.

No analog in the reference — it has no cell index (its containment
graph is a global O(n*m) sift-down, ``graph/GraphBuilder.scala``); this
is the Ray-native index layer the north rule adds on top.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from osm_jigsaw_ray.s2 import (
    s2_encode,
    s2_face,
    s2_id_from_face_pos,
    s2_level,
    s2_normalize_cells,
    s2_pos_at_level,
    s2_token,
)

__all__ = ["s2_cells_for_points", "s2_corpus_cover"]

_COVER_PARTS = 64  # shuffle fan-in for the sharded normalize


def _decompose(ids: np.ndarray):
    """uint64 ids -> (face, level, pos) int64 arrays, vectorized per
    distinct level (ids at mixed levels after normalization)."""
    lvls = s2_level(ids)
    pos = np.empty(ids.size, dtype=np.int64)
    for lvl in np.unique(lvls):
        m = lvls == lvl
        pos[m] = s2_pos_at_level(ids[m], int(lvl))
    return s2_face(ids), lvls, pos


def s2_cells_for_points(
    points: rd.Dataset,
    level: int = 12,
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> rd.Dataset:
    """Append ``s2_face`` / ``s2_pos`` / ``s2_level`` / ``s2_token``
    columns for each row's (lat, lon) at ``level``. Pure vectorized
    map — ids are emitted decomposed (face + position) because Arrow
    int64 can't hold the full uint64 id for faces >= 4."""

    def enc(batch: pa.Table) -> pa.Table:
        ids = s2_encode(
            batch[lat_col].to_numpy(zero_copy_only=False),
            batch[lon_col].to_numpy(zero_copy_only=False),
            level,
        )
        return (
            batch.append_column("s2_face", pa.array(s2_face(ids), pa.int64()))
            .append_column(
                "s2_pos", pa.array(s2_pos_at_level(ids, level), pa.int64())
            )
            .append_column(
                "s2_level", pa.array(np.full(len(batch), level), pa.int64())
            )
            .append_column("s2_token", pa.array(s2_token(ids), pa.string()))
        )

    return points.map_batches(enc, batch_format="pyarrow")


def s2_corpus_cover(
    points: rd.Dataset,
    level: int = 12,
    shard_level: int = 4,
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> rd.Dataset:
    """Compact S2 cell cover of all points: the normalized cell union
    (dedup + recursive 4-sibling collapse + containment drop) of every
    point's level-``level`` cell. Output rows (s2_face, s2_level,
    s2_pos, s2_token), sorted by cell id."""
    if not 0 <= shard_level < level:
        raise ValueError("need 0 <= shard_level < level")

    def enc_dedup(batch: pa.Table) -> pa.Table:
        ids = np.unique(
            s2_encode(
                batch[lat_col].to_numpy(zero_copy_only=False),
                batch[lon_col].to_numpy(zero_copy_only=False),
                level,
            )
        )
        face = s2_face(ids)
        pos = s2_pos_at_level(ids, level)
        anc = (face << (2 * shard_level)) | (pos >> (2 * (level - shard_level)))
        return pa.table(
            {
                "s2_face": pa.array(face, pa.int64()),
                "s2_pos": pa.array(pos, pa.int64()),
                "__part": pa.array(
                    (anc % _COVER_PARTS).astype(np.int32), pa.int32()
                ),
            }
        )

    def normalize_group(g: pd.DataFrame) -> pd.DataFrame:
        ids = s2_id_from_face_pos(
            g["s2_face"].to_numpy(), g["s2_pos"].to_numpy(), level
        )
        face, lvls, pos = _decompose(s2_normalize_cells(ids))
        return pd.DataFrame(
            {"s2_face": face, "s2_level": lvls, "s2_pos": pos}
        )

    from .shuffle import grouped_map

    sharded = grouped_map(
        points.map_batches(enc_dedup, batch_format="pyarrow"),
        "__part",
        normalize_group,
        batch_format="pandas",
    )

    # finish: only cells at/above the shard level can still collapse or
    # contain each other — a bounded set (<= 6 * 4**shard_level ids)
    def split(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "__deep",
            pa.array(
                batch["s2_level"].to_numpy(zero_copy_only=False) > shard_level,
                pa.bool_(),
            ),
        )

    # materialize the cover-sized intermediate ONCE: the two branches
    # below would otherwise each re-execute the whole corpus lineage
    tagged = sharded.map_batches(split, batch_format="pyarrow").materialize()
    deep = tagged.filter(expr="__deep == True").drop_columns(["__deep"])
    shallow = tagged.filter(expr="__deep == False").drop_columns(["__deep"])

    sh = shallow.to_pandas()  # bounded: <= 6 * 4**shard_level rows
    if len(sh):
        ids = np.concatenate(
            [
                s2_id_from_face_pos(
                    g["s2_face"].to_numpy(), g["s2_pos"].to_numpy(), int(lvl)
                )
                for lvl, g in sh.groupby("s2_level")
            ]
        )
        face, lvls, pos = _decompose(s2_normalize_cells(ids))
    else:
        face = lvls = pos = np.array([], dtype=np.int64)
    finished = rd.from_arrow(
        pa.table(
            {
                "s2_face": pa.array(face, pa.int64()),
                "s2_level": pa.array(lvls, pa.int64()),
                "s2_pos": pa.array(pos, pa.int64()),
            }
        )
    )

    def tokenize(batch: pa.Table) -> pa.Table:
        out_tok = np.empty(len(batch), dtype=object)
        lvl_np = batch["s2_level"].to_numpy(zero_copy_only=False)
        face_np = batch["s2_face"].to_numpy(zero_copy_only=False)
        pos_np = batch["s2_pos"].to_numpy(zero_copy_only=False)
        order_key = np.empty(len(batch), dtype=np.uint64)
        for lvl in np.unique(lvl_np):
            m = lvl_np == lvl
            ids = s2_id_from_face_pos(face_np[m], pos_np[m], int(lvl))
            out_tok[m] = s2_token(ids)
            order_key[m] = ids
        return batch.append_column(
            "s2_token", pa.array(out_tok, pa.string())
        ).append_column(
            # uint64 id doesn't fit int64 for faces >= 4: shift out the
            # low zero bit to get an order-preserving int64 sort key
            "__id",
            pa.array((order_key >> np.uint64(1)).astype(np.int64), pa.int64()),
        )

    return (
        deep.union(finished)
        .map_batches(tokenize, batch_format="pyarrow")
        .sort("__id")
        .drop_columns(["__id"])
    )
