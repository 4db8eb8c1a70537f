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
        if not outs:
            # Ray's sort-based map_groups occasionally hands an EMPTY
            # block to the group fn (block-boundary artifact); fns are
            # required to return their typed empty for an empty input
            return fn(part_df)
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


def neutral_array(n: int, typ: pa.DataType) -> pa.Array:
    """Unused-slot filler that is NOT null: pandas converts an Arrow
    int64-with-nulls column to float64, which silently corrupts values
    beyond 2^53."""
    if pa.types.is_integer(typ) or pa.types.is_floating(typ):
        return pa.array(np.zeros(n, dtype=typ.to_pandas_dtype()), typ)
    if pa.types.is_string(typ) or pa.types.is_large_string(typ):
        return pa.array([""] * n, typ)
    return pa.nulls(n, typ)


def copartition_join(
    left: rd.Dataset,
    right: rd.Dataset,
    *,
    on: str,
    num_partitions: int = 16,
) -> rd.Dataset:
    """Inner hash join for scalar-column Datasets as ONE union +
    partition-hash groupby — a drop-in for small/skewed inputs where
    ``Dataset.join``'s empty hash partitions surface schema-less blocks
    (ArrowInvalid FieldRef). Left and right column names must not clash
    except for the key. Each side's rows pad the other side's columns
    with typed neutral fillers, co-shuffle on ``hash(on)``, and a
    vectorized pandas merge joins them inside every partition."""
    left = left.map_batches(lambda b: b, batch_format="pyarrow")
    right = right.map_batches(lambda b: b, batch_format="pyarrow")
    l_fields = [
        (n, left.schema().base_schema.field(n).type)
        for n in left.schema().names
        if n != on
    ]
    r_fields = [
        (n, right.schema().base_schema.field(n).type)
        for n in right.schema().names
        if n != on
    ]
    clash = {n for n, _ in l_fields} & {n for n, _ in r_fields}
    if clash:
        raise ValueError(f"copartition_join: column name clash {sorted(clash)}")
    key_type = left.schema().base_schema.field(on).type

    def side(is_left: bool):
        mine, other = (l_fields, r_fields) if is_left else (r_fields, l_fields)

        def fn(batch: pa.Table) -> pa.Table:
            n = len(batch)
            tbl = pa.table(
                {
                    on: batch[on].combine_chunks().cast(key_type),
                    "__left": pa.array(np.full(n, is_left, dtype=bool)),
                    **{name: batch[name].combine_chunks() for name, _ in mine},
                    **{name: neutral_array(n, typ) for name, typ in other},
                }
            )
            return tbl.append_column(
                "__part", pa.array(_hash_cols(tbl, [on], num_partitions))
            )

        return fn

    unioned = left.map_batches(side(True), batch_format="pyarrow").union(
        right.map_batches(side(False), batch_format="pyarrow")
    )

    def resolve(group: pd.DataFrame) -> pd.DataFrame:
        lf = group[group["__left"]][[on] + [n for n, _ in l_fields]]
        rf = group[~group["__left"]][[on] + [n for n, _ in r_fields]]
        return lf.merge(rf, on=on, how="inner")

    return unioned.groupby("__part").map_groups(resolve, batch_format="pandas")
