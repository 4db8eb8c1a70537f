"""Cardinality-robust shuffle helpers.

Ray's sort-merge ``groupby`` pays ~2.4 ms of Python per GROUP (measured
in ``relational.events_hourly``; independent of key type or shuffle
mode), so any groupby whose key cardinality scales with the corpus —
relation ids, ring signatures, candidate pairs, user ids — must route
its shuffle through a LOW-cardinality partition column instead:
``__part = hash(key) % num_partitions``. A key's group lands wholly in
one partition, so per-key work inside the partition (a vectorized
pandas groupby, or a per-key python algorithm under a ~50 µs pandas
sub-groupby) is exact.
"""

from __future__ import annotations

import zlib
from typing import Callable, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

_GOLD = np.uint64(0x9E3779B97F4A7C15)


def _hash_cols(batch: pa.Table, cols: Sequence[str], num_partitions: int) -> np.ndarray:
    h = np.zeros(len(batch), dtype=np.uint64)
    for c in cols:
        col = batch[c]
        if pa.types.is_integer(col.type):
            v = col.to_numpy(zero_copy_only=False).astype(np.uint64)
        else:
            v = np.fromiter(
                (zlib.crc32(s.encode()) for s in col.to_pylist()),
                dtype=np.uint64,
                count=len(batch),
            )
        h = h * _GOLD + v
    return (h % np.uint64(num_partitions)).astype(np.int32)


def with_partition_column(
    ds: rd.Dataset, key: str | Sequence[str], num_partitions: int = 64
) -> rd.Dataset:
    """Append ``__part = hash(key cols) % num_partitions`` (int32)."""
    cols = [key] if isinstance(key, str) else list(key)

    def tag(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "__part", pa.array(_hash_cols(batch, cols, num_partitions))
        )

    return ds.map_batches(tag, batch_format="pyarrow")


def partitioned_map_groups(
    ds: rd.Dataset,
    key: str | Sequence[str],
    fn: Callable[[pd.DataFrame], pd.DataFrame],
    *,
    num_partitions: int = 64,
) -> rd.Dataset:
    """``groupby(key).map_groups(fn)`` semantics with shuffle cost
    independent of key cardinality; ``fn`` receives one key's rows."""
    cols = [key] if isinstance(key, str) else list(key)
    by = cols[0] if len(cols) == 1 else cols

    def run(part_df: pd.DataFrame) -> pd.DataFrame:
        part_df = part_df.drop(columns="__part")
        outs = [fn(sub) for _, sub in part_df.groupby(by, sort=False)]
        return pd.concat(outs, ignore_index=True)

    return (
        with_partition_column(ds, key, num_partitions)
        .groupby("__part")
        .map_groups(run, batch_format="pandas")
    )


def partitioned_aggregate(
    ds: rd.Dataset,
    key: str | Sequence[str],
    partition_fn: Callable[[pd.DataFrame], pd.DataFrame],
    *,
    num_partitions: int = 64,
) -> rd.Dataset:
    """Partition-hashed aggregation: ``partition_fn`` gets the WHOLE
    partition (``__part`` dropped) and must aggregate per key itself —
    typically one vectorized ``df.groupby(key).agg(...)``. Exact because
    every key lives wholly in one partition."""

    def run(part_df: pd.DataFrame) -> pd.DataFrame:
        return partition_fn(part_df.drop(columns="__part"))

    return (
        with_partition_column(ds, key, num_partitions)
        .groupby("__part")
        .map_groups(run, batch_format="pandas")
    )
