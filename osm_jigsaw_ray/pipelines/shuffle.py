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

import os
import zlib
from contextlib import contextmanager
from typing import Callable, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

_GOLD = np.uint64(0x9E3779B97F4A7C15)
_FNV = np.uint64(1099511628211)

#: The engine-default all-to-all strategy. Hash is the default as of
#: round 5: the 1M-area tile-write rehearsal showed Ray's sort-based
#: shuffle inlines sub-100 KB reduce returns into the DRIVER's
#: in-process store (3.25 GB of driver private heap at 300k areas,
#: growing with the catalog; the 1M sort run segfaulted the raylet in
#: its spill storm), while hash mode did the same write in 404 s with a
#: flat 136 MB driver and byte-identical output under the full oracle
#: contract. A scale-safe engine must not hide its safe mode behind a
#: flag — sort stays available as the opt-out (``GRAFT_SHUFFLE=sort`` /
#: ``--shuffle sort``).
DEFAULT_STRATEGY = "hash"


def resolve_default_strategy() -> str:
    """'hash' unless the user opted out with ``GRAFT_SHUFFLE=sort``."""
    name = os.environ.get("GRAFT_SHUFFLE", DEFAULT_STRATEGY)
    if name not in ("hash", "sort"):
        raise ValueError(f"GRAFT_SHUFFLE must be 'hash' or 'sort', got {name!r}")
    return name


def apply_default_strategy(default_parallelism: int | None = None) -> str:
    """Apply the engine-default shuffle strategy to this process's
    ``DataContext`` (see :data:`DEFAULT_STRATEGY`). Call after
    ``ray.init`` — hash mode sizes its aggregator pool to the cluster.
    Every engine entry point (CLI, bench, ``__ray_entry__``) routes
    through here so one env var governs them all."""
    name = resolve_default_strategy()
    if name == "hash":
        enable_hash_shuffle(default_parallelism)
    else:
        disable_hash_shuffle()
    return name


@contextmanager
def shuffle_strategy(name: str):
    """Temporarily pin the strategy ('hash' or 'sort'), restoring the
    caller's previous strategy on exit — parity tests must not leak a
    strategy flip into the rest of a session that runs under the
    engine default."""
    from ray.data.context import DataContext

    ctx = DataContext.get_current()
    prev = ctx.shuffle_strategy
    try:
        if name == "hash":
            enable_hash_shuffle()
        else:
            disable_hash_shuffle()
        yield
    finally:
        ctx.shuffle_strategy = prev


def enable_hash_shuffle(default_parallelism: int | None = None) -> None:
    """Switch Ray Data's all-to-all strategy for THIS process to
    actor-aggregated hash shuffle (``ShuffleStrategy.HASH_SHUFFLE``).

    Why this exists: the default sort-based shuffle returns one object
    per (map task × reduce partition) to the shuffle's scheduling
    process, and Ray inlines task returns under ~100 KB into the
    OWNER's in-process store — the driver. Measured on the 300k-area
    tile write: 3.25 GB of the driver's 3.33 GB peak RSS was private
    heap (smaps_rollup), i.e. the driver was holding the shuffle, and
    it grows with catalog size — an OOM at planet scale. Hash shuffle
    routes every partition shard through ``ray.put`` (plasma, owned by
    the map workers, spillable) into per-partition aggregator actors,
    so no process ever holds bytes proportional to the shuffle.

    ``default_hash_shuffle_parallelism`` must be sized to the cluster:
    the Ray default of 200 partitions starves the aggregator pool on
    small clusters (a 4-CPU ``map_groups`` hangs; measured). We size it
    to the cluster's CPU count, which also bounds the aggregator-actor
    pool. Call AFTER ``ray.init`` (or pass ``default_parallelism``).
    """
    import ray
    from ray.data.context import DataContext, ShuffleStrategy

    ctx = DataContext.get_current()
    ctx.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
    ncpu = (
        int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    )
    if default_parallelism is None:
        default_parallelism = max(2, ncpu)
    ctx.default_hash_shuffle_parallelism = int(default_parallelism)
    # Aggregator actors reserve num_cpus_per_partition x partitions CPUs
    # in total; Ray's default (0.0625) books the ENTIRE cluster when
    # num_partitions reaches 16x the CPU count (a 64-partition groupby
    # on a 4-CPU cluster deadlocks: aggregators hold every slot, the
    # shuffle map tasks never run; measured). Aggregators are
    # concat-bound, not compute-bound — reserve a token share and cap
    # the actor count at half the cluster so map tasks always have
    # room.
    ctx.max_hash_shuffle_aggregators = max(2, ncpu // 2)
    ctx.hash_shuffle_operator_actor_num_cpus_per_partition_override = 0.005


def disable_hash_shuffle() -> None:
    """Restore the default sort-based shuffle strategy (tests)."""
    from ray.data.context import DataContext, ShuffleStrategy

    DataContext.get_current().shuffle_strategy = (
        ShuffleStrategy.SORT_SHUFFLE_PULL_BASED
    )


def hash_strategy_active() -> bool:
    from ray.data.context import DataContext, ShuffleStrategy

    return (
        DataContext.get_current().shuffle_strategy == ShuffleStrategy.HASH_SHUFFLE
    )


def _per_key_apply(fn: Callable, key_list: list[str], batch_format: str):
    """Wrap a per-GROUP fn so it can run over a whole co-located hash
    partition: sort the block by the keys, slice the key groups, apply
    ``fn`` per group, concat. An empty block (rows=0, schema intact via
    the shuffle's schema broadcast) goes to ``fn`` once — engine group
    fns return their typed empty for an empty input (repo convention)."""
    if batch_format == "pandas":

        def apply_df(df: pd.DataFrame):
            if len(df) == 0:
                return fn(df)
            by = key_list[0] if len(key_list) == 1 else key_list
            outs = [fn(sub) for _, sub in df.groupby(by, sort=False)]
            # a pandas-format group fn may legally return Arrow tables
            # (map_groups allows it; the tiled PipJoiner does)
            if any(isinstance(o, pa.Table) for o in outs):
                outs = [
                    o
                    if isinstance(o, pa.Table)
                    else pa.Table.from_pandas(o, preserve_index=False)
                    for o in outs
                ]
                return pa.concat_tables(outs, promote_options="default")
            return pd.concat(outs, ignore_index=True)

        return apply_df

    def apply_tbl(tbl: pa.Table) -> pa.Table:
        if len(tbl) == 0:
            return fn(tbl)
        s = tbl.sort_by([(k, "ascending") for k in key_list])
        n = len(s)
        change = np.zeros(n, dtype=bool)
        change[0] = True
        for k in key_list:
            arr = s[k].combine_chunks().to_numpy(zero_copy_only=False)
            change[1:] |= arr[1:] != arr[:-1]
        starts = np.flatnonzero(change)
        ends = np.append(starts[1:], n)
        outs = [fn(s.slice(a, b - a)) for a, b in zip(starts, ends)]
        return pa.concat_tables(outs)

    return apply_tbl


#: Bounded broadcast-class threshold for the small-input group-apply
#: fast path (see ``grouped_map``): inputs at or below this run as ONE
#: Ray task instead of a hash exchange. Env-overridable for experiments;
#: 0 disables the fast path entirely.
SMALL_SHUFFLE_BYTES = int(os.environ.get("GRAFT_SMALL_SHUFFLE_BYTES", 64 << 20))


def _one_task_apply(refs, apply, batch_format: str):
    """One Ray task over already-materialized block refs: concat, run
    ``apply`` once, return a single-block Dataset."""
    import ray

    @ray.remote(num_returns=1)
    def _apply_all(*blocks):
        import pyarrow as _pa
        from ray.data.block import BlockAccessor

        tables = [
            BlockAccessor.for_block(b).to_arrow() for b in blocks if len(b)
        ]
        tbl = _pa.concat_tables(tables, promote_options="default")
        if batch_format == "pandas":
            out = apply(tbl.to_pandas())
            return (
                _pa.Table.from_pandas(out, preserve_index=False)
                if not isinstance(out, _pa.Table)
                else out
            )
        out = apply(tbl)
        return (
            _pa.Table.from_pandas(out, preserve_index=False)
            if not isinstance(out, _pa.Table)
            else out
        )

    return rd.from_arrow_refs([_apply_all.remote(*refs)])


def _small_grouped_apply(mat, apply, batch_format: str):
    """If the MATERIALIZED dataset fits the bounded small-input
    threshold, run the group apply as one Ray task over its block refs
    and return the result Dataset; else return None. The task concats
    the blocks (all keys co-located by construction) and runs the SAME
    ``apply`` the exchange path would run on a partition, so semantics
    are identical."""
    size = mat.size_bytes() or 0
    if not SMALL_SHUFFLE_BYTES or size > SMALL_SHUFFLE_BYTES:
        return None
    refs = [
        r
        for bundle in mat.iter_internal_ref_bundles()
        for r in bundle.block_refs
    ]
    if not refs or mat.count() == 0:
        # empty / schema-less inputs: the exchange path's established
        # empty-partition handling applies (group fns never see empties)
        return None
    return _one_task_apply(refs, apply, batch_format)


def combine_small(
    ds: rd.Dataset, fn: Callable, *, batch_format: str = "pyarrow"
) -> rd.Dataset:
    """Run ``fn`` ONCE over the whole dataset as a single Ray task.

    For finals whose input is bounded BY CONSTRUCTION (per-batch partial
    aggregates over a tiny key space, per-block top-k rows): no
    all-to-all, no aggregator actors, no driver materialization — the
    input's block refs stay in the object store and one task concats
    them. The caller owns the boundedness argument; inputs proportional
    to the corpus must go through :func:`grouped_map` /
    :func:`partitioned_aggregate` instead."""
    mat = ds.materialize()
    refs = [
        r
        for bundle in mat.iter_internal_ref_bundles()
        for r in bundle.block_refs
    ]
    if not refs:
        return mat
    return _one_task_apply(refs, fn, batch_format)


def partial_topk(
    ds: rd.Dataset,
    keys: Sequence[tuple[str, str]],
    k: int,
) -> rd.Dataset:
    """Global top-k as per-block partials + one tiny combine — replaces
    ``ds.sort(cols).limit(k)``, which SORTS THE WHOLE TABLE through an
    all-to-all to keep k rows (at 100 TB that's the most expensive way
    to find 10 rows). Each block keeps its own top k (vectorized Arrow
    ``sort_by`` + slice); the union of partials is ≤ k × num_blocks rows
    — bounded by construction — and one task produces the exact global
    ordering. ``keys`` is Arrow ``sort_by`` form:
    ``[("col", "descending"), ...]``."""
    key_list = list(keys)

    def partial(batch: pa.Table) -> pa.Table:
        if len(batch) <= k:
            return batch
        return batch.sort_by(key_list).slice(0, k)

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return combine_small(
        partials, lambda t: t.sort_by(key_list).slice(0, k)
    )


def grouped_map(
    ds: rd.Dataset,
    keys: str | Sequence[str],
    fn: Callable,
    *,
    num_partitions: int = 64,
    batch_format: str = "pyarrow",
    whole_partition: bool = False,
    materialize_output: bool = True,
    small_input_check: bool = True,
) -> rd.Dataset:
    """Strategy-aware ``groupby(keys).map_groups(fn)``.

    Sort strategy (Ray default): plain ``groupby().map_groups``.

    Hash strategy (``enable_hash_shuffle``): a keyed
    ``repartition(sort=False)`` + per-block apply. Ray's own
    ``map_groups`` hash path sorts inside the aggregator's finalize,
    which crashes (`ArrowInvalid: No match for FieldRef`) on any
    partition that received no shards — and worse, its empty partitions
    materialize ZERO-COLUMN blocks that poison the schema broadcast of
    every downstream hash shuffle. The repartition path tolerates both
    (verified: chained keyed repartitions and hash aggregates over
    zero-column empties), and ``map_batches`` skips the empties.

    ``whole_partition=True`` hands ``fn`` the entire co-located
    partition in one call (rows of SEVERAL key values — every key's
    rows still complete). Only for merge-tolerant fns: ones that dedup
    / match / sub-group by key internally rather than assuming one key
    per call. Default wraps ``fn`` per distinct key group
    (:func:`_per_key_apply`) — identical contract to ``map_groups``.
    """
    key_list = [keys] if isinstance(keys, str) else list(keys)
    if not hash_strategy_active():
        by = key_list[0] if len(key_list) == 1 else key_list
        return ds.groupby(by).map_groups(fn, batch_format=batch_format)
    apply = fn if whole_partition else _per_key_apply(fn, key_list, batch_format)
    # Small-input fast path: every hash-shuffle op pays ~1-1.5 s of
    # aggregator-actor spin-up REGARDLESS of data size (Ray creates the
    # aggregator pool per operator; measured flat across 2-64
    # aggregators — same-window A/B in BENCH_RESULTS.md round 5).
    # Materializing the input makes its exact size free; below the
    # bounded broadcast-class threshold (64 MB, the same class as the
    # ray.put side objects), the whole group apply runs as ONE Ray task
    # over the already-materialized block refs: no all-to-all, no
    # actors, identical per-key semantics. At scale the threshold can't
    # trip (a planet shuffle input is GBs), so the scale path is
    # unchanged. ``small_input_check=False`` skips the input
    # materialization for stages whose input is a known-big payload
    # stream that should fuse straight into the shuffle map tasks (the
    # page joins).
    if small_input_check:
        ds = ds.materialize()
        small = _small_grouped_apply(ds, apply, batch_format)
        if small is not None:
            return small
    out = ds.repartition(
        int(num_partitions), keys=key_list, sort=False
    ).map_batches(apply, batch_size=None, batch_format=batch_format)
    # Materialize by default: sort-mode map_groups executes as an
    # AllToAllOperator, a MATERIALIZING barrier — a Dataset reused by
    # two consumers re-executes only up to it. The hash path streams,
    # so without a barrier (a) a reused grouped_map output re-executes
    # its whole upstream chain per consumer, and (b) chained grouped_maps
    # pile every upstream operator into ONE streaming execution whose
    # per-op resource reservation starves the active shuffle down to 1-3
    # concurrent tasks (measured: a write_tiles-shaped 5-stage DAG on
    # 16 cpus times out at >580 s unmaterialized vs 49.7 s materialized).
    # Pass materialize_output=False for the LAST stage of a linear chain
    # feeding a sink, where streaming into the consumer matters.
    return out.materialize() if materialize_output else out


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
    Non-ascii or >64-byte keys take a crc32 loop — PER ROW, never per
    batch: a row's hash must depend only on its own bytes, or the same
    key would land in different partitions depending on what it was
    co-batched with (one 65-byte token in a block would silently split
    every short key's group in two)."""
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
        qual = pc.and_(
            pc.less_equal(pc.binary_length(col), 64), pc.string_is_ascii(col)
        ).to_numpy(zero_copy_only=False)
        out = np.zeros(n, dtype=np.uint64)
        if qual.any():
            # recurse on the all-qualifying subset → vectorized path;
            # the FNV scheme is width-independent so the subset's own
            # max width doesn't matter
            out[np.flatnonzero(qual)] = hash_strings(
                col.filter(pa.array(qual))
            )
        rest = np.flatnonzero(~qual)
        if rest.size:
            rest_vals = col.filter(pa.array(~qual)).to_pylist()
            out[rest] = np.fromiter(
                (zlib.crc32(s.encode()) for s in rest_vals),
                dtype=np.uint64,
                count=rest.size,
            )
        return out
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

    return grouped_map(
        with_partition_column(ds, key, num_partitions),
        "__part",
        run,
        num_partitions=num_partitions,
        batch_format="pandas",
        whole_partition=True,  # run sub-groups by the true key itself
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

    return grouped_map(
        with_partition_column(ds, key, num_partitions),
        "__part",
        run,
        num_partitions=num_partitions,
        batch_format="pandas",
        whole_partition=True,  # partition_fn aggregates per key itself
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

    return grouped_map(
        unioned,
        "__part",
        resolve,
        num_partitions=num_partitions,
        batch_format="pandas",
        whole_partition=True,  # merge matches on the key within the block
    )
