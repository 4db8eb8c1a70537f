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
_FNV = np.uint64(1099511628211)


def hash_strings(col: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """Vectorized deterministic uint64 hash of a string column.

    Replaces the per-row ``zlib.crc32`` generator that used to sit in
    every shuffle hot path (planet tag/tile shuffles hash one key per
    ROW): NUL-LPAD to the batch max width, view the value buffer as an
    (n, width) uint8 matrix, and fold it with a wrap-around polynomial
    (FNV prime) — pure numpy, no Python loop. Left padding is
    load-bearing: with the key right-aligned, byte j of a key of length
    L always lands on multiplier P^(L-1-j) REGARDLESS of the batch
    width, so a key hashes identically in every batch/process — the
    invariant partitioned aggregation relies on (same key → same
    partition). Length is mixed in so leading-NUL aliases can't occur.
    Falls back to the crc32 loop for non-ascii or >64-byte keys (no
    engine key today is either)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return np.zeros(0, dtype=np.uint64)
    import pyarrow.compute as pc

    lens = pc.binary_length(col).to_numpy(zero_copy_only=False).astype(np.int64)
    width = int(lens.max(initial=0))
    if width == 0:
        return np.zeros(n, dtype=np.uint64)
    if width > 64 or not pc.all(pc.string_is_ascii(col)).as_py():
        return np.fromiter(
            (zlib.crc32(s.encode()) for s in col.to_pylist()),
            dtype=np.uint64,
            count=n,
        )
    padded = pc.ascii_lpad(col, width, padding="\x00")
    if isinstance(padded, pa.ChunkedArray):
        padded = padded.combine_chunks()
    vals = np.frombuffer(padded.buffers()[2], dtype=np.uint8)
    offs = np.frombuffer(padded.buffers()[1], dtype=np.int32)
    start = offs[padded.offset]
    mat = vals[start : start + n * width].reshape(n, width).astype(np.uint64)
    mults = np.ones(width, np.uint64)
    if width > 1:
        mults[1:] = _FNV
        mults = np.multiply.accumulate(mults)[::-1].copy()
    with np.errstate(over="ignore"):
        h = (mat * mults).sum(axis=1, dtype=np.uint64)
        return h * _GOLD + lens.astype(np.uint64)


def hash_key_column(col: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """uint64 hash values for an int or string key column (vectorized)."""
    if pa.types.is_integer(col.type):
        return col.to_numpy(zero_copy_only=False).astype(np.uint64)
    return hash_strings(col)


def _hash_cols(batch: pa.Table, cols: Sequence[str], num_partitions: int) -> np.ndarray:
    h = np.zeros(len(batch), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for c in cols:
            h = h * _GOLD + hash_key_column(batch[c])
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
