"""Page-side pipeline (SURVEY.md §3.4 phase 2): pages Parquet → join rows.

read pages → actor-pool extraction (text + geo point, html dropped) →
vectorized geohash cell assign → PIP descent + kNN fallback + naming in
an actor pool holding the broadcast area pack → tile assignment.

Two join strategies:

* :func:`geo_join_pages` — **broadcast** join: the area pack rides the
  object store (``ray.put`` once), every joiner actor rehydrates it in
  ``__init__``. No shuffle of the page stream at all, so megacity skew
  is irrelevant — this is the fast path whenever the polygon side fits
  worker memory (planet untiled = 13 GB; SURVEY.md §6).
* :func:`geo_join_pages_partitioned` — **salted groupby-on-cell**
  co-partition for a bigger-than-memory polygon side (the north-rule
  shuffle): pages key by ``cell_id`` plus a hash salt on hot cells
  (megacity cells would otherwise serialize into one group), polygon
  rows replicate distributed to each salt bucket of the cells they
  cover (no driver-held pack anywhere in the lineage), and the PIP
  descent runs per group with only that cell's polygon rows.
* :func:`geo_join_pages_tiled` — fully **out-of-core**: polygons read
  lazily per shuffle group from the ``tile`` step's parquet partitions
  (the 100 TB shape when the tile step already ran).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from ..geometry import geohash_encode
from ..stages.extract import PageExtractor
from ..stages.pip import PipJoiner

JOIN_OUTPUT_COLUMNS = [
    "url",
    "warc_ts",
    "lang",
    "text",
    "lat",
    "lon",
    "cell_id",
    "area_ids",
    "paths",
    "nearest_area_id",
    "name",
]


def _extract_task(batch: pa.Table) -> pa.Table:
    """Task form of the stateless :class:`PageExtractor` (fuses with the
    upstream read; construction is two flag assignments)."""
    return PageExtractor()(batch)


def extract_pages(
    pages: rd.Dataset, *, concurrency: int | tuple = 4, batch_size: int = 4096
) -> rd.Dataset:
    """Stage 1: stateful extraction actor pool (F15/F16)."""
    return pages.map_batches(
        PageExtractor,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


class ExtractAndJoin:
    """Fused extraction + PIP-join actor: one pool owns the whole
    per-page path (html → text/point → descent → naming → tile), so a
    single ``concurrency`` sizes the stage against the node and batches
    never round-trip the object store between the two steps. Both
    sub-stages stay independently usable (``extract_pages`` /
    ``PipJoiner``) for pipelines that need the intermediate."""

    def __init__(self, pack_ref, tile_precision: int = 3, enrich: bool = False):
        from ..stages.enrich import PageEnricher

        self.extract = PageExtractor(full_text=enrich)
        self.enrich = PageEnricher() if enrich else None
        self.join = PipJoiner(pack_ref, tile_precision)

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = self.extract(batch)
        if self.enrich is not None:
            out = self.enrich(out)
        return self.join(out)


# per-worker-process ExtractAndJoin memo for the task-fused path: a
# plain-function map_batches keeps the operator a TASK pool, which Ray
# Data fuses with the upstream ReadParquet — the wide html column then
# never crosses the object store (one task reads a file shard and joins
# it in-process), and the stage scales with every CPU instead of a
# fixed actor-pool/read split. State still builds once per worker
# process, exactly like an actor's ``__init__``.
_FUSED_CACHE: dict = {}


def _fused_extract_join(pack_ref, tile_precision: int, enrich: bool):
    key = (pack_ref.hex(), tile_precision, enrich)

    def fn(batch: pa.Table) -> pa.Table:
        worker = _FUSED_CACHE.get(key)
        if worker is None:
            # bounded memo: every geo_join_pages call mints a fresh
            # pack_ref, so an uncapped cache leaks one ExtractAndJoin
            # (holding a full area pack) per invocation in long-lived
            # worker processes (bench reps, serving). Keep the 2 newest.
            while len(_FUSED_CACHE) >= 2:
                _FUSED_CACHE.pop(next(iter(_FUSED_CACHE)))
            worker = ExtractAndJoin(pack_ref, tile_precision, enrich)
            _FUSED_CACHE[key] = worker
        return worker(batch)

    return fn


def geo_join_pages(
    pages: rd.Dataset,
    pack: dict,
    *,
    tile_precision: int = 3,
    concurrency: int | tuple | None = None,
    batch_size: int | None = None,
    extract_concurrency: int | tuple | None = None,
    enrich: bool = False,
) -> rd.Dataset:
    """Broadcast-pack join: pages → join rows with paths/names/tiles.

    With ``concurrency=None`` (default) the fused extract+join runs as a
    read-fused TASK pool (see :func:`_fused_extract_join` — state cached
    per worker process; html never enters the object store). Passing
    ``concurrency`` pins the fused stage to a fixed actor pool instead
    (useful when its resource share must be sized explicitly), and
    ``extract_concurrency`` splits extraction into its own pool (e.g.
    for a heavy ML extractor). ``enrich=True`` additionally computes
    per-page token/quality/langid/simhash columns (the training-data
    enrichment pass) inside the same stage.

    ``batch_size=None`` (default) on the fused task path is load-bearing:
    an explicit batch_size sets ``min_rows_per_bundled_input`` on the
    logical op, and Ray Data refuses to fuse a Read (which can modify
    row counts) with such a map — the html column would then cross the
    object store between two task pools. Leave it unset and each task
    processes its read block whole (zero-copy Arrow)."""
    pack_ref = ray.put(pack)
    if extract_concurrency is None and concurrency is None:
        return pages.map_batches(
            _fused_extract_join(pack_ref, tile_precision, enrich),
            batch_format="pyarrow",
            **({"batch_size": batch_size} if batch_size else {}),
        )
    if extract_concurrency is None:
        return pages.map_batches(
            ExtractAndJoin,
            fn_constructor_args=(pack_ref, tile_precision, enrich),
            batch_format="pyarrow",
            batch_size=batch_size or 4096,
            concurrency=concurrency,
        )
    extracted = extract_pages(
        pages, concurrency=extract_concurrency, batch_size=batch_size or 4096
    )
    return extracted.map_batches(
        PipJoiner,
        fn_constructor_args=(pack_ref, tile_precision),
        batch_format="pyarrow",
        batch_size=batch_size or 4096,
        concurrency=concurrency,
    )


# ---------------------------------------------------------------------------
# partitioned + salted variant (scale path for huge polygon sides)
# ---------------------------------------------------------------------------

# pack for cells with no polygons at all (ocean): descent finds nothing,
# every point goes through the shared global kNN fallback
_EMPTY_PACK = {"areas": {}, "children": {}, "top_level": []}


def salt_pages_by_cell(
    extracted: rd.Dataset,
    *,
    cell_precision: int = 2,
    hot_cell_salt: int = 8,
    hot_cell_threshold: int = 50_000,
    hot_cells: set | None = None,
) -> rd.Dataset:
    """Cell-assign + hot-cell salting (the megacity-skew handler): pages
    get ``shuffle_key = cell + ':' + salt`` where salt spreads cells
    exceeding ``hot_cell_threshold`` across ``hot_cell_salt`` buckets.
    Detection is an exact per-cell count pre-pass when ``hot_cells`` is
    None — NOTE that the pre-pass executes the upstream lineage a second
    time, so large callers should pass a pre-computed ``hot_cells`` set
    (e.g. from a sample — salting is a skew-performance heuristic, so
    approximate detection never affects results). Deterministic (crc32,
    not PYTHONHASHSEED-randomized ``hash``)."""

    def assign_cell(batch: pa.Table) -> pa.Table:
        lats = batch["lat"].to_numpy(zero_copy_only=False)
        lons = batch["lon"].to_numpy(zero_copy_only=False)
        cells = geohash_encode(lats, lons, cell_precision)
        return batch.append_column("join_cell", pa.array(cells.tolist(), pa.string()))

    with_cell = extracted.map_batches(assign_cell, batch_format="pyarrow")

    if hot_cells is None:
        # hot-cell detection: exact counts over the tiny (cell,) key
        # space as per-batch PARTIALS (≤ cells × blocks rows, bounded)
        # summed on the driver — a groupby would pay an all-to-all to
        # count a table that fits in one block
        def cell_counts(batch: pa.Table) -> pa.Table:
            uniq, counts = np.unique(
                batch["join_cell"].to_numpy(zero_copy_only=False),
                return_counts=True,
            )
            return pa.table(
                {
                    "join_cell": pa.array(uniq.tolist(), pa.string()),
                    "n": pa.array(counts, pa.int64()),
                }
            )

        totals: dict[str, int] = {}
        for part in with_cell.map_batches(
            cell_counts, batch_format="pyarrow"
        ).iter_batches(batch_size=None, batch_format="pyarrow"):
            for cell, n in zip(
                part["join_cell"].to_pylist(), part["n"].to_pylist()
            ):
                totals[cell] = totals.get(cell, 0) + n
        hot_cells = {
            cell for cell, n in totals.items() if n >= hot_cell_threshold
        }
    hot_ref = ray.put(set(hot_cells))

    def salt(batch: pa.Table) -> pa.Table:
        from .shuffle import hash_strings

        hot = ray.get(hot_ref)
        cells = batch["join_cell"]
        # fully vectorized: hot rows salt by a numpy polynomial url hash
        salts = np.zeros(len(batch), dtype=np.int64)
        if hot:
            is_hot = pc.is_in(cells, value_set=pa.array(sorted(hot)))
            hot_idx = np.flatnonzero(is_hot.to_numpy(zero_copy_only=False))
            if hot_idx.size:
                urls = batch["url"].take(pa.array(hot_idx))
                salts[hot_idx] = (
                    hash_strings(urls) % np.uint64(hot_cell_salt)
                ).astype(np.int64)
        keys = pc.binary_join_element_wise(
            cells, pa.array(salts.astype(str), pa.string()), ":"
        )
        return batch.append_column("shuffle_key", keys)

    return with_cell.map_batches(salt, batch_format="pyarrow")


def _detect_hot_cells(
    pages: rd.Dataset,
    *,
    cell_precision: int,
    hot_cell_threshold: int,
    hot_detect_sample: float,
    batch_size: int | None,
) -> set[str]:
    """Hot-cell (megacity skew) detection via a coords-only sampled scan:
    detection needs the point, not the text, so skip article extraction
    and unescaping entirely. Sampled counts use a threshold scaled to
    the sample fraction — salting is a skew-performance heuristic whose
    detection accuracy never affects results (pass
    ``hot_detect_sample=1.0`` for the exact pre-pass). ``batch_size``
    stays unset by default so the scan fuses with the Read (an explicit
    batch_size would route the html column through the object store for
    this pass — see :func:`geo_join_pages`)."""
    from ..stages.extract import extract_geo_only

    def cell_counts(batch: pa.Table) -> pa.Table:
        # PARTIAL per-batch value_counts, not rows: the key space at a
        # join precision is bounded (precision 2 = at most 1,024 land
        # cells), so a groupby here would pay a whole all-to-all (plus
        # the hash strategy's aggregator-actor spin-up) to count a
        # table that fits in one block. Partials are ≤ cells × blocks
        # rows — bounded by construction — and the driver sums them.
        g = extract_geo_only(batch)
        cells = geohash_encode(
            g["lat"].to_numpy(zero_copy_only=False),
            g["lon"].to_numpy(zero_copy_only=False),
            cell_precision,
        )
        uniq, counts = np.unique(cells, return_counts=True)
        return pa.table(
            {
                "join_cell": pa.array(uniq.tolist(), pa.string()),
                "n": pa.array(counts, pa.int64()),
            }
        )

    frac = hot_detect_sample if 0 < hot_detect_sample < 1.0 else 1.0
    src = pages if frac >= 1.0 else pages.random_sample(frac, seed=17)
    scaled = max(1, int(hot_cell_threshold * frac))
    totals: dict[str, int] = {}
    for part in src.map_batches(
        cell_counts,
        batch_format="pyarrow",
        **({"batch_size": batch_size} if batch_size else {}),
    ).iter_batches(batch_size=None, batch_format="pyarrow"):
        for cell, n in zip(part["join_cell"].to_pylist(), part["n"].to_pylist()):
            totals[cell] = totals.get(cell, 0) + n
    return {cell for cell, n in totals.items() if n >= scaled}


def _auto_partitions(pages: rd.Dataset, floor: int = 2) -> int:
    """Partition count for the page-exchange shuffles.

    Two regimes, take the max: (a) one partition per ~2 GB of INPUT
    corpus bytes (html shrinks ~10-20x at extraction, so a partition's
    extracted payload — the block the group fn receives whole — stays
    ~100-200 MB, comfortably worker-heap-bounded at 100 TB); (b) a
    floor of ``max(16, cluster_cpus // 2)`` so small inputs still
    spread across the aggregator pool WITHOUT paying per-shard plasma
    overhead for partitions the input can't fill. The floor is
    measured, not guessed: 1M pages (144 MB extracted, 257 blocks)
    through 256 partitions = 13.3 s at 32 cpus vs 4.0 s at 16 — at
    257 blocks x 256 partitions the exchange is ~65k tiny shards of
    pure ray.put/aggregator overhead, and the same sweep at 8 cpus
    reads 17.9 s vs 12.1 s. Callers can always pass an explicit
    ``num_partitions``."""
    try:
        est = pages.size_bytes() or 0
    except Exception:
        est = 0
    ncpu = (
        int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    )
    return max(floor, 16, ncpu // 2, est // (2 << 30))


def geo_join_pages_partitioned(
    pages: rd.Dataset,
    areas,
    edges,
    shared,
    taggings=None,
    *,
    cell_precision: int = 2,
    tile_precision: int = 3,
    hot_cell_salt: int = 8,
    hot_cell_threshold: int = 50_000,
    batch_size: int | None = None,
    hot_detect_sample: float = 0.05,
    join_partitions: int = 8,
    num_partitions: int | None = None,
) -> rd.Dataset:
    """Salted groupby-on-cell co-partitioned join (north-rule shuffle),
    fully Dataset-native: the polygon side arrives as the ``areas`` and
    ``edges`` Datasets (DataFrames accepted for tests) and is routed to
    cells DISTRIBUTED — cell cover + exact ring refine via
    :func:`..pipelines.tiling.assign_area_tiles`, the per-cell induced
    subgraph via :func:`tile_graph_edges`, and the area catalog
    replicated to its cells through the same hash co-partition shuffle
    the tile writer uses. Nothing catalog-sized ever exists on the
    driver or as one object-store value (the reference's whole point is
    a polygon side too big for one heap, ``/root/reference/README.md``
    "Processing the entire planet ... 64GB" — this path must not
    rebuild that heap anywhere).

    Pages get ``shuffle_key = cell + ':' + salt`` where salt spreads hot
    cells across ``hot_cell_salt`` buckets (polygon rows replicate to
    every salt bucket of their hot cells, so each group is
    self-contained). Both sides union under one wide schema and
    co-shuffle in ONE all-to-all; each group builds its cell's pack from
    its own polygon rows (:func:`..stages.pip.pack_from_tables`, the
    tile-serving pack shape) and runs PIP descent + naming over its
    pages. The kNN fallback consults ``shared`` (ONE
    :func:`..stages.pip.build_knn_side` object — slim centroid arrays +
    the naming PROJECTION of the tags, never the full tag table) so
    answers match the broadcast path row-for-row.

    ``taggings`` (optional: the (osm_id, tags) Dataset / dict) routes
    each cell's tag rows through the SAME wide-union co-partition as a
    third ``kind`` — exactly how the tile writer ships per-tile
    ``tags.parquet`` — so every group names its in-cell path areas from
    rows that rode its own shuffle, touching ``shared``'s projection
    only for out-of-cell kNN-fallback areas. With ``taggings=None`` all
    naming reads the shared projection (still exact — see
    :func:`..naming.project_naming_tags`).
    """
    if isinstance(areas, pd.DataFrame):
        from .areas import areas_dataset_from_df

        areas = areas_dataset_from_df(areas)
    if isinstance(edges, pd.DataFrame):
        edges = rd.from_pandas(edges)
    shared_ref = ray.put(shared) if isinstance(shared, dict) else shared

    hot_cells = _detect_hot_cells(
        pages,
        cell_precision=cell_precision,
        hot_cell_threshold=hot_cell_threshold,
        hot_detect_sample=hot_detect_sample,
        batch_size=batch_size,
    )
    hot_ref = ray.put(sorted(hot_cells))

    # polygon-side routing (all distributed): exact cell assignment →
    # induced per-cell subgraph → area rows replicated to their cells
    from .tiling import (
        _AREA_COLS,
        _EDGE_COLS,
        _TAG_COLS,
        _replicate_by_membership,
        _taggings_dataset,
        assign_area_tiles,
        tile_graph_edges,
        tile_memberships,
        tile_osm_memberships,
    )

    assignments = assign_area_tiles(areas, precision=cell_precision)
    t_edges = tile_graph_edges(
        edges, assignments, join_partitions=join_partitions
    ).materialize()  # consumed twice: membership + the wide union
    memb = tile_memberships(t_edges, num_partitions=join_partitions)
    tile_areas = _replicate_by_membership(
        areas, memb, key="area_id", cols=_AREA_COLS, num_partitions=join_partitions
    )
    route_tags = taggings is not None
    if route_tags:
        # per-cell tag rows ride the same co-partition (the tile
        # writer's tags routing): (cell, osm_id) memberships from the
        # replicated areas, tag rows replicated to their cells — no
        # global tag object anywhere in this lineage
        tile_areas = tile_areas.materialize()  # consumed twice
        tile_tags = _replicate_by_membership(
            _taggings_dataset(taggings),
            tile_osm_memberships(tile_areas, num_partitions=join_partitions),
            key="osm_id",
            cols=_TAG_COLS,
            num_partitions=join_partitions,
        )

    # page side: read-fused task extraction (html never enters the
    # object store — requires batch_size unset, see geo_join_pages),
    # then cell assign + hot-cell salting
    extracted = pages.map_batches(
        _extract_task,
        batch_format="pyarrow",
        **({"batch_size": batch_size} if batch_size else {}),
    )
    salted = salt_pages_by_cell(
        extracted,
        cell_precision=cell_precision,
        hot_cell_salt=hot_cell_salt,
        hot_cell_threshold=hot_cell_threshold,
        hot_cells=hot_cells,
    )

    # wide union schema: (shuffle_key, kind) + edge + area + page columns
    pages_schema = pages.schema().base_schema
    page_fields: list[tuple[str, pa.DataType]] = [
        (n, pages_schema.field(n).type)
        for n in pages_schema.names
        if n not in ("html", "text")
    ] + [("text", pa.large_string()), ("lat", pa.float64()), ("lon", pa.float64())]
    page_names = [n for n, _ in page_fields]
    tag_cols = _TAG_COLS if route_tags else []
    polygon_names = {n for n, _ in _EDGE_COLS + _AREA_COLS + tag_cols}
    clash = set(page_names) & (polygon_names | {"kind", "shuffle_key"})
    if clash:
        raise ValueError(f"page columns clash with join internals: {sorted(clash)}")
    wide_fields: list[tuple[str, pa.DataType]] = (
        _EDGE_COLS + _AREA_COLS + tag_cols + page_fields
    )

    def polygon_side(kind: int, cols: list[tuple[str, pa.DataType]]):
        """Polygon/edge rows → wide rows, replicated per salt bucket of
        their hot cells (a page salted to ``cell:3`` must find its
        cell's polygons in that group)."""
        have = {n for n, _ in cols}

        def fn(batch: pa.Table) -> pa.Table:
            tiles = batch["tile_id"].combine_chunks().cast(pa.string())
            n = len(batch)
            reps = np.ones(n, dtype=np.int64)
            hot = ray.get(hot_ref)
            if hot and hot_cell_salt > 1:
                is_hot = pc.is_in(tiles, value_set=pa.array(hot, pa.string()))
                reps[is_hot.to_numpy(zero_copy_only=False)] = hot_cell_salt
            idx = np.repeat(np.arange(n, dtype=np.int64), reps)
            starts = np.cumsum(reps) - reps
            salts = np.arange(idx.size, dtype=np.int64) - np.repeat(starts, reps)
            taken = batch.take(pa.array(idx))
            keys = pc.binary_join_element_wise(
                taken["tile_id"].combine_chunks().cast(pa.string()),
                pa.array(salts.astype(str), pa.string()),
                ":",
            )
            m = len(taken)
            return pa.table(
                {
                    "shuffle_key": keys,
                    "kind": pa.array(np.full(m, kind, dtype=np.int8)),
                    **{
                        name: taken[name].combine_chunks().cast(typ)
                        if name in have
                        else pa.nulls(m, typ)
                        for name, typ in wide_fields
                    },
                }
            )

        return fn

    def page_side(batch: pa.Table) -> pa.Table:
        n = len(batch)
        return pa.table(
            {
                "shuffle_key": batch["shuffle_key"].combine_chunks().cast(pa.string()),
                "kind": pa.array(np.full(n, 2, dtype=np.int8)),
                **{
                    name: batch[name].combine_chunks().cast(typ)
                    if name in set(page_names)
                    else pa.nulls(n, typ)
                    for name, typ in wide_fields
                },
            }
        )

    wide = (
        t_edges.map_batches(polygon_side(0, _EDGE_COLS), batch_format="pyarrow")
        .union(
            tile_areas.map_batches(polygon_side(1, _AREA_COLS), batch_format="pyarrow")
        )
        .union(salted.map_batches(page_side, batch_format="pyarrow"))
    )
    if route_tags:
        wide = wide.union(
            tile_tags.map_batches(polygon_side(3, _TAG_COLS), batch_format="pyarrow")
        )

    area_names = [n for n, _ in _AREA_COLS]
    edge_names = [n for n, _ in _EDGE_COLS]
    tag_names = [n for n, _ in _TAG_COLS]

    def group_join(group: pa.Table) -> pa.Table:
        """One (cell, salt) group: build the cell pack from the group's
        own polygon rows (pack_from_tables — the tile-serving shape, so
        output is identical to the oracled tiled path), then join the
        group's pages. Empty-polygon groups (ocean / NaN-point pages)
        resolve through the shared global kNN fallback."""
        from ..stages.pip import pack_from_tables

        kind = group["kind"].to_numpy(zero_copy_only=False)
        pages_t = group.filter(pa.array(kind == 2)).select(page_names)
        areas_t = group.filter(pa.array(kind == 1)).select(area_names)
        if len(areas_t) == 0:
            joiner = PipJoiner(_EMPTY_PACK, tile_precision, shared=shared_ref)
        else:
            edges_t = group.filter(pa.array(kind == 0)).select(edge_names)
            cell_tags = None
            if route_tags:
                tags_t = group.filter(pa.array(kind == 3)).select(tag_names)
                cell_tags = {
                    o: dict(zip(ks, vs))
                    for o, ks, vs in zip(
                        tags_t["osm_id"].to_pylist(),
                        tags_t["keys"].to_pylist(),
                        tags_t["values"].to_pylist(),
                    )
                }
            pack = pack_from_tables(
                areas_t.to_pandas(), edges_t.to_pandas(), taggings=cell_tags
            )
            joiner = PipJoiner(pack, tile_precision, shared=shared_ref)
        return joiner(pages_t)

    from .shuffle import grouped_map

    # per-(cell,salt) fn (builds that cell's pack) — per-key apply under
    # the hash strategy; partition count adaptive (see _auto_partitions)
    # so a partition block (corpus/num_partitions) stays worker-heap-
    # bounded at scale without paying tiny-shard overhead at small scale
    return grouped_map(
        wide,
        "shuffle_key",
        group_join,
        num_partitions=num_partitions or _auto_partitions(pages, floor=join_partitions),
        batch_format="pyarrow",
        materialize_output=False,  # final stage; streams into the sink
        small_input_check=False,  # page stream: fuse reads into the shuffle
    )


# per-worker-process PipJoiner memo for the partitioned join
_JOINER_CACHE: dict = {}


def geo_join_pages_tiled(
    pages: rd.Dataset,
    tiles_root: str,
    shared,
    *,
    tiles_precision: int = 3,
    tile_precision: int = 3,
    hot_cell_salt: int = 8,
    hot_cell_threshold: int = 50_000,
    hot_detect_sample: float = 0.05,
    batch_size: int | None = None,
    num_partitions: int | None = None,
) -> rd.Dataset:
    """Fully out-of-core page join against the TILED output: the polygon
    side never exists in driver or object-store memory as a whole —
    each shuffle group lazily reads ONLY its cell's
    ``tile=<id>/{areas,graph,tags}.parquet`` partition
    (``serve.load_tile_pack``, memoized per worker process). This is the
    100 TB shape: pages salt-shuffle on their geohash cell at
    ``tiles_precision`` (the precision ``write_tiles`` ran at), workers
    pull tile files from the shared filesystem on first touch, and the
    global kNN fallback + taggings ride ``shared`` (ONE
    ``build_knn_side`` object) so output rows are identical to the
    broadcast path's. Cells with no tile partition (ocean) resolve
    through the global fallback.

    ``shared`` is a :func:`..stages.pip.build_knn_side` dict or an
    ObjectRef of one. ``tile_precision`` is the OUTPUT cell column's
    precision (independent of the tiles' own grid)."""
    shared_ref = shared if not isinstance(shared, dict) else ray.put(shared)

    # shared with the partitioned path: coords-only sampled scan (or the
    # exact pre-pass at hot_detect_sample>=1.0, which avoids
    # salt_pages_by_cell re-executing the extraction lineage to count)
    hot_cells = _detect_hot_cells(
        pages,
        cell_precision=tiles_precision,
        hot_cell_threshold=hot_cell_threshold,
        hot_detect_sample=hot_detect_sample,
        batch_size=batch_size,
    )

    extracted = pages.map_batches(
        _extract_task,
        batch_format="pyarrow",
        **({"batch_size": batch_size} if batch_size else {}),
    )
    salted = salt_pages_by_cell(
        extracted,
        cell_precision=tiles_precision,
        hot_cell_salt=hot_cell_salt,
        hot_cell_threshold=hot_cell_threshold,
        hot_cells=hot_cells,
    )

    def group_join(group: pa.Table) -> pa.Table:
        """Arrow end-to-end: the page text stays a zero-copy Arrow
        column across the shuffle boundary (a pandas group format would
        round-trip every page string Arrow→pandas→Arrow here — the
        partitioned path's group fn has always been Arrow)."""
        from ..serve import load_tile_pack

        drop = [c for c in ("join_cell", "shuffle_key") if c in group.column_names]
        if len(group) == 0:  # empty shuffle block (block-boundary artifact)
            joiner = PipJoiner(_EMPTY_PACK, tile_precision, shared=shared_ref)
            return joiner(group.drop_columns(drop))
        cell = group["shuffle_key"][0].as_py().split(":")[0]
        cache_key = ("tiled", tiles_root, cell, tile_precision)
        joiner = _JOINER_CACHE.get(cache_key)
        if joiner is None:
            # bounded like TileServer's Guava-style cache: a worker
            # visiting many tiles must not accumulate every pack
            tiled_keys = [
                k for k in _JOINER_CACHE if isinstance(k, tuple) and k[0] == "tiled"
            ]
            while len(tiled_keys) >= 16:
                _JOINER_CACHE.pop(tiled_keys.pop(0))
            pack = load_tile_pack(tiles_root, cell) or _EMPTY_PACK
            joiner = PipJoiner(pack, tile_precision, shared=shared_ref)
            _JOINER_CACHE[cache_key] = joiner
        return joiner(group.drop_columns(drop))

    from .shuffle import grouped_map

    # per-(cell,salt) fn (loads that cell's tile pack) — per-key apply
    # under the hash strategy; partition count adaptive (see
    # _auto_partitions) — heap-bounded partitions at scale, no
    # tiny-shard overhead at small scale
    return grouped_map(
        salted,
        "shuffle_key",
        group_join,
        num_partitions=num_partitions or _auto_partitions(pages),
        batch_format="pyarrow",
        materialize_output=False,  # final stage; streams into the sink
        small_input_check=False,  # page stream: fuse reads into the shuffle
    )


def write_join_rows(
    corpus_dir: str,
    pack: dict,
    out_root: str,
    *,
    tile_precision: int = 3,
    enrich: bool = False,
    batch_size: int = 4096,
) -> list[str]:
    """Checkpoint-resumable join output (north_rule: "resumable from
    checkpoint with per-partition lineage + metrics"): one output
    partition per input parquet shard, committed atomically with a
    lineage manifest. A rerun skips committed shards entirely — their
    pages are neither read nor re-joined — so a failed 100 TB run
    resumes from exactly where it died. Returns newly-committed
    partition names.

    Shard descriptors become the input Dataset (the ``sources/pbf.py``
    blob-catalog pattern); each task reads ONLY its shard's file, runs
    the fused extract→join in-process (html never enters the object
    store), and commits ``shard=<stem>/join.parquet``."""
    import os

    from ..state.manifest import PartitionManifest, commit_partition, pending_partitions

    files = sorted(
        f
        for f in os.listdir(corpus_dir)
        if f.endswith(".parquet") and not f.startswith(".")
    )
    part_of = {f: f"shard={os.path.splitext(f)[0]}" for f in files}
    pending = set(pending_partitions(out_root, list(part_of.values())))
    todo = [f for f in files if part_of[f] in pending]
    if not todo:
        return []

    pack_ref = ray.put(pack)
    fused = _fused_extract_join(pack_ref, tile_precision, enrich)

    def write_shard(batch: pa.Table) -> pa.Table:
        import time as _time

        import pyarrow.parquet as pq

        done = []
        for fname in batch["file"].to_pylist():
            part = part_of_name(fname)
            src = os.path.join(corpus_dir, fname)
            t0 = _time.time()
            tbl = pq.read_table(src, columns=["url", "warc_ts", "html", "lang"])
            out_parts = []
            for s in range(0, max(len(tbl), 1), batch_size):
                chunk = tbl.slice(s, batch_size)
                if len(chunk):
                    out_parts.append(fused(chunk))
            joined = (
                pa.concat_tables(out_parts, promote_options="default")
                if out_parts
                else fused(tbl.slice(0, 0))
            )

            def write_fn(tmp_dir, _j=joined):
                pq.write_table(_j, f"{tmp_dir}/join.parquet")

            commit_partition(
                out_root,
                part,
                write_fn,
                PartitionManifest(
                    partition=part,
                    rows=len(joined),
                    fingerprint=f"{len(tbl)}in/{len(joined)}out",
                    inputs=[src],
                    metrics={"join_s": round(_time.time() - t0, 3)},
                ),
            )
            done.append(part)
        return pa.table({"part": pa.array(done, pa.string())})

    def part_of_name(fname: str) -> str:
        return f"shard={os.path.splitext(fname)[0]}"

    res = (
        rd.from_items([{"file": f} for f in todo], override_num_blocks=len(todo))
        .map_batches(write_shard, batch_format="pyarrow", batch_size=None)
        .to_pandas()
    )
    return sorted(res["part"]) if not res.empty else []
