"""Containment graph (C5/C6): areas → parent/child containment DAG.

The reference builds the graph with a sequential larger-first "sift-down"
(``graphing/GraphBuilder.scala:18-124``): areas sorted by descending size
insert under a synthetic root; each candidate attaches as a child of
**every** existing top-level sibling that contains it, else joins the top
level; the process recurses per depth. Its own spec
(``GraphBuilderSpec.scala:28-93``) pins insertion-order invariance,
trickle-down and multi-parent attachment — i.e. the output is exactly the
**transitive reduction of the closure-containment partial order** over
deduplicated areas. We exploit that:

* ``sift_down_graph`` — a faithful sequential re-implementation used by
  the spec-parity tests (and as an oracle for the distributed builder);
* ``build_graph_edges`` — the Ray-Data-native builder: children are
  hash-homed to the geohash cell of their bbox center, candidate parents
  are replicated to every cell their bbox covers (if P contains C then
  bbox(P) covers C's center cell, so every true edge meets in exactly one
  group — no cross-cell dedup needed), exact ``ring_contains_ring``
  confirms within the group, and the transitive reduction happens as a
  self-join (length-2 paths) + anti-join — an all-relational re-expression
  of the O(n*m) sift-down that the reference runs for ~14h on the planet
  (``/root/reference/README.md:157-161``). Planet-spanning parents whose
  cover exceeds ``max_cover`` cells are NOT replicated: they broadcast
  (``ray.put``) into a vectorized pass over all children, so no shuffle
  group ever holds every area (skew cap).

Edges are written as an edge table (parent_area_id, child_area_id); the
reference's leaf-first file ordering (``output/GraphWriting.scala:11-51``)
is a serialization trick with no semantic content (SURVEY.md §2.9 C6).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from ..geometry import (
    geohash_cover,
    geohash_cover_batch,
    geohash_cover_counts,
    geohash_encode,
    points_in_ring,
    ring_contains_ring,
)
from .shuffle import grouped_map, partitioned_aggregate, partitioned_map_groups

ROOT_AREA_ID = -1


# ---------------------------------------------------------------------------
# sequential faithful sift-down (test oracle / small-scale path)
# ---------------------------------------------------------------------------

@dataclass
class AreaRec:
    area_id: int
    lats: np.ndarray
    lons: np.ndarray
    area: float
    bbox: tuple
    osm_ids: tuple = ()


@dataclass
class _Node:
    area: AreaRec
    children: set = field(default_factory=set)
    sifted: bool = False

    def __hash__(self):
        return hash(self.area.area_id)


def _contains(a: AreaRec, b: AreaRec) -> bool:
    return ring_contains_ring(a.lats, a.lons, b.lats, b.lons)


def sift_down_graph(areas: list[AreaRec]) -> dict[int, set[int]]:
    """Sequential sift-down; returns adjacency {parent_id: {child ids}}
    with ROOT_AREA_ID as the synthetic head. Mirrors
    ``GraphBuilder.buildGraph`` + ``siftDownNode`` (larger-first
    insertion, attach-to-all-containing-siblings) with ONE deliberate
    refinement: when a node gains a child AFTER it was already sifted
    (multi-parent late attachment), it re-queues and re-sifts. The
    reference never re-queues (``GraphBuilder.scala:96-101`` guards on
    ``!c.sifted``), so a late-attached grandchild can leak in as a
    direct child depending on BFS arrival order — an order-dependent
    artifact its own insertion-order-invariance spec
    (``GraphBuilderSpec.scala:75-84``) shows is unintended. Re-sifting
    makes the output the order-invariant minimal containment DAG, which
    is also exactly what the distributed builder computes."""
    root = _Node(AreaRec(ROOT_AREA_ID, np.array([]), np.array([]), float("inf"), ()))
    root.children = {_Node(a) for a in areas}
    root.sifted = True

    # larger-first with an id tie-break on equal sizes: geometrically-equal
    # areas with different vertex sets (e.g. one redundant collinear point)
    # survive canonical-signature dedup, and without a deterministic order
    # the mutual-contains pair would cycle — the smaller id becomes parent,
    # matching the distributed builder's antisymmetric tie-break.
    queue = [root]
    queued: set[int] = {ROOT_AREA_ID}
    while queue:
        node = queue.pop(0)
        queued.discard(node.area.area_id)
        to_sift = sorted(node.children, key=lambda n: (-n.area.area, n.area.area_id))
        top_level: list[_Node] = []
        for b in to_sift:
            fits_in = [s for s in top_level if _contains(s.area, b.area)]
            if fits_in:
                for s in fits_in:
                    s.children.add(b)
                    if s.sifted and s.area.area_id not in queued:
                        # late multi-parent attachment: redistribute
                        queue.append(s)
                        queued.add(s.area.area_id)
            else:
                top_level.append(b)
        node.children = set(top_level)
        node.sifted = True
        for c in top_level:
            if not c.sifted and c.area.area_id not in queued:
                queue.append(c)
                queued.add(c.area.area_id)

    adj: dict[int, set[int]] = {}

    def walk(n: _Node):
        adj.setdefault(n.area.area_id, set())
        for c in n.children:
            adj[n.area.area_id].add(c.area.area_id)
            if c.area.area_id not in adj:
                walk(c)

    walk(root)
    return adj


def areas_df_to_recs(df: pd.DataFrame) -> list[AreaRec]:
    return [
        AreaRec(
            area_id=int(r["area_id"]),
            lats=np.asarray(r["lats"], dtype=np.float64),
            lons=np.asarray(r["lons"], dtype=np.float64),
            area=float(r["area"]),
            bbox=(r["min_lat"], r["min_lon"], r["max_lat"], r["max_lon"]),
            osm_ids=tuple(r["osm_ids"]),
        )
        for _, r in df.iterrows()
    ]


# ---------------------------------------------------------------------------
# distributed builder
# ---------------------------------------------------------------------------

def _cell_assignments(batch: pa.Table, precision: int, max_cover: int) -> pa.Table:
    """Emit (cell, role, area row) assignments: each area homed once as a
    candidate child (bbox-center cell) and replicated as a candidate
    parent to its bbox cover. Areas whose cover exceeds ``max_cover``
    cells (planet-spanning polygons) are NOT replicated here — they are
    handled by the broadcast side-channel (``_oversized_parents``), so no
    cell ever receives every child (the round-1 '~global' hot cell)."""
    n = len(batch)
    min_lat = batch["min_lat"].to_numpy()
    min_lon = batch["min_lon"].to_numpy()
    max_lat = batch["max_lat"].to_numpy()
    max_lon = batch["max_lon"].to_numpy()
    c_lat = (min_lat + max_lat) / 2
    c_lon = (min_lon + max_lon) / 2
    home = geohash_encode(c_lat, c_lon, precision)

    # vectorized cover enumeration (integer range arithmetic, no
    # per-area python loop); oversized parents go to the broadcast
    # side-channel so no cell ever receives every child
    counts = geohash_cover_counts(min_lat, min_lon, max_lat, max_lon, precision)
    ok = np.flatnonzero(counts <= max_cover)
    row, cover_cells, *_ = geohash_cover_batch(
        min_lat[ok], min_lon[ok], max_lat[ok], max_lon[ok], precision
    )
    idx = np.concatenate([np.arange(n, dtype=np.int64), ok[row]])
    cells = np.concatenate([home, cover_cells])
    roles = np.concatenate(
        [np.zeros(n, dtype=np.int8), np.ones(row.size, dtype=np.int8)]
    )
    sub = batch.take(pa.array(idx, pa.int64()))
    return sub.append_column(
        "cell", pa.array(cells.tolist(), pa.string())
    ).append_column("role", pa.array(roles))


_EMPTY_PAIRS = pd.DataFrame(
    {"anc": pd.Series([], dtype=np.int64), "desc": pd.Series([], dtype=np.int64)}
)


def _candidate_pairs(
    p_ids, p_bbox, p_area, p_rings, c_ids, c_bbox, c_area, c_rings
) -> tuple[list[int], list[int]]:
    """Exact containment pairs parents × children: one vectorized
    (n_child, n_parent) bbox+area prefilter matrix, then the exact ring
    test only on surviving pairs. The strict-greater-area (or equal area
    + smaller id) condition keeps containment antisymmetric:
    geometrically-equal rings with different vertex sets would otherwise
    emit both (A,B) and (B,A), the transitive reduction would leave the
    2-cycle, and both areas would detach from the DAG (the reference
    merges such areas in RenderAndDeduplicateAreas; the tie-break is our
    equivalent)."""
    p_min_lat, p_min_lon, p_max_lat, p_max_lon = p_bbox
    c_min_lat, c_min_lon, c_max_lat, c_max_lon = c_bbox
    cand = (
        (
            (p_area[None, :] > c_area[:, None])
            | ((p_area[None, :] == c_area[:, None]) & (p_ids[None, :] < c_ids[:, None]))
        )
        & (p_min_lat[None, :] <= c_min_lat[:, None] + 1e-12)
        & (p_min_lon[None, :] <= c_min_lon[:, None] + 1e-12)
        & (p_max_lat[None, :] >= c_max_lat[:, None] - 1e-12)
        & (p_max_lon[None, :] >= c_max_lon[:, None] - 1e-12)
    )
    anc_out: list[int] = []
    desc_out: list[int] = []
    ci, pj = np.nonzero(cand)
    if ci.size == 0:
        return anc_out, desc_out
    # exact confirm, batched per PARENT: ring_contains_ring = (every
    # child vertex inside-or-on parent) AND (no proper edge crossing).
    # The vertex half runs as ONE points_in_ring over every candidate
    # child's concatenated vertices — the parent's edges scan once per
    # parent instead of once per pair (the bbox recheck inside
    # ring_contains_ring is exactly the cand-matrix condition and is
    # already guaranteed here). The crossing half runs only on pairs
    # that survive the vertex screen (nested rings rarely cross).
    from ..geometry import _edges, _proper_crossings

    order = np.argsort(pj, kind="stable")
    ci, pj = ci[order], pj[order]
    c_cache: dict[int, tuple] = {}

    def child(i: int) -> tuple:
        cl = c_cache.get(i)
        if cl is None:
            cl = (
                np.asarray(c_rings[0][i], dtype=np.float64),
                np.asarray(c_rings[1][i], dtype=np.float64),
            )
            c_cache[i] = cl
        return cl

    bounds = np.flatnonzero(np.concatenate([[True], pj[1:] != pj[:-1], [True]]))
    for s, e in zip(bounds[:-1], bounds[1:]):
        j = int(pj[s])
        kids = ci[s:e]
        pl = np.asarray(p_rings[0][j], dtype=np.float64)
        pn = np.asarray(p_rings[1][j], dtype=np.float64)
        k_rings = [child(int(i)) for i in kids]
        lens = np.array([r[0].size for r in k_rings], dtype=np.int64)
        inside = points_in_ring(
            pl,
            pn,
            np.concatenate([r[0] for r in k_rings]),
            np.concatenate([r[1] for r in k_rings]),
        )
        cs = np.concatenate([[0], np.cumsum(inside.astype(np.int64))])
        ends = np.cumsum(lens)
        ok = (cs[ends] - cs[ends - lens]) == lens
        if not ok.any():
            continue
        p_edges = _edges(pl, pn)
        for idx in np.flatnonzero(ok):
            i = int(kids[idx])
            cl = k_rings[idx]
            if not _proper_crossings(*p_edges, *_edges(cl[0], cl[1])):
                anc_out.append(int(p_ids[j]))
                desc_out.append(int(c_ids[i]))
    return anc_out, desc_out


def _ring_views(col) -> list:
    """Arrow list<float64> column → per-row numpy VIEWS into the shared
    values buffer (no per-ring object conversion — the pandas
    ``tolist()`` path copied every ring through python lists)."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if not hasattr(arr, "offsets"):
        # Ray tensor-extension blocks (from_pandas of ndarray cells)
        # aren't list arrays — per-ring copy fallback
        return [np.asarray(x, dtype=np.float64) for x in arr.to_pylist()]
    offs = arr.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    vals = arr.values.to_numpy(zero_copy_only=False)
    return [vals[offs[i] : offs[i + 1]] for i in range(len(arr))]


def _contain_pairs_group(group: pa.Table) -> pa.Table:
    """Per-cell exact containment pairs: parents (role 1, replicated) ×
    children (role 0, homed here). Arrow end-to-end: ring coordinates
    stay zero-copy views of the block's values buffers."""
    empty = pa.table(
        {"anc": pa.array([], pa.int64()), "desc": pa.array([], pa.int64())}
    )
    role = group["role"].to_numpy(zero_copy_only=False)
    parents = group.filter(pa.array(role == 1))
    children = group.filter(pa.array(role == 0))
    if len(parents) == 0 or len(children) == 0:
        return empty
    anc, desc = _candidate_pairs(
        parents["area_id"].to_numpy(zero_copy_only=False).astype(np.int64),
        (
            parents["min_lat"].to_numpy(),
            parents["min_lon"].to_numpy(),
            parents["max_lat"].to_numpy(),
            parents["max_lon"].to_numpy(),
        ),
        parents["area"].to_numpy(),
        (_ring_views(parents["lats"]), _ring_views(parents["lons"])),
        children["area_id"].to_numpy(zero_copy_only=False).astype(np.int64),
        (
            children["min_lat"].to_numpy(),
            children["min_lon"].to_numpy(),
            children["max_lat"].to_numpy(),
            children["max_lon"].to_numpy(),
        ),
        children["area"].to_numpy(),
        (_ring_views(children["lats"]), _ring_views(children["lons"])),
    )
    return pa.table(
        {"anc": pa.array(anc, pa.int64()), "desc": pa.array(desc, pa.int64())}
    )


def _oversized_parents(slim: rd.Dataset, precision: int, max_cover: int) -> list:
    """Collect the (few) areas whose bbox cover exceeds ``max_cover``
    cells — planet/continent-spanning polygons. These are broadcast
    (``ray.put``) and tested against every child inside a vectorized
    ``map_batches`` instead of being replicated to every cell (which
    would recreate the round-1 '~global' hot group holding ALL areas).
    Bounded by construction: at precision p only polygons covering
    > max_cover of the ~32·4^{p-1} cells qualify — a handful on a real
    planet (the reference's root-level continents)."""

    def pick(batch: pa.Table) -> pa.Table:
        counts = geohash_cover_counts(
            batch["min_lat"].to_numpy(),
            batch["min_lon"].to_numpy(),
            batch["max_lat"].to_numpy(),
            batch["max_lon"].to_numpy(),
            precision,
        )
        return batch.take(pa.array(np.flatnonzero(counts > max_cover), pa.int64()))

    rows = slim.map_batches(pick, batch_format="pyarrow").take_all()
    return [
        {
            "area_id": int(r["area_id"]),
            "lats": np.asarray(r["lats"], dtype=np.float64),
            "lons": np.asarray(r["lons"], dtype=np.float64),
            "area": float(r["area"]),
            "bbox": (r["min_lat"], r["min_lon"], r["max_lat"], r["max_lon"]),
        }
        for r in rows
    ]


def _norm_pairs(batch: pa.Table) -> pa.Table:
    """Coerce pair blocks to the canonical (anc, desc) int64 schema —
    empty hash-shuffle partitions can surface schema-less blocks that
    would break the downstream join on 'desc'."""
    if "anc" not in batch.column_names:
        return pa.table(
            {"anc": pa.array([], pa.int64()), "desc": pa.array([], pa.int64())}
        )
    return pa.table(
        {"anc": batch["anc"].cast(pa.int64()), "desc": batch["desc"].cast(pa.int64())}
    )


def build_graph_edges(
    areas: rd.Dataset,
    *,
    precision: int = 1,
    max_cover: int = 64,
    join_partitions: int = 8,
) -> rd.Dataset:
    """areas Dataset → direct-containment edge table
    (parent_area_id, child_area_id), top-level areas parented to
    ROOT_AREA_ID. See module docstring for the shuffle plan.

    Every true edge is found exactly once (each child is homed to ONE
    cell and a containing parent's cover includes that cell; oversized
    parents meet every child in the broadcast stage instead), so no
    pair-dedup shuffle is needed."""
    slim = areas.select_columns(
        ["area_id", "lats", "lons", "area", "min_lat", "min_lon", "max_lat", "max_lon"]
    )
    assigned = slim.map_batches(
        lambda b: _cell_assignments(b, precision, max_cover), batch_format="pyarrow"
    )
    # per-CELL fn (pairs within one cell) — NOT merge-tolerant, so
    # grouped_map's default per-key apply splits hash partitions back
    # into cell groups
    cell_pairs = grouped_map(
        assigned, "cell", _contain_pairs_group, batch_format="pyarrow"
    ).map_batches(_norm_pairs, batch_format="pyarrow")

    big = _oversized_parents(slim, precision, max_cover)
    if big:
        import ray

        big_ref = ray.put(big)

        def big_pairs(batch: pa.Table) -> pa.Table:
            parents = ray.get(big_ref)
            p_ids = np.array([p["area_id"] for p in parents], dtype=np.int64)
            anc, desc = _candidate_pairs(
                p_ids,
                (
                    np.array([p["bbox"][0] for p in parents]),
                    np.array([p["bbox"][1] for p in parents]),
                    np.array([p["bbox"][2] for p in parents]),
                    np.array([p["bbox"][3] for p in parents]),
                ),
                np.array([p["area"] for p in parents]),
                (
                    [p["lats"] for p in parents],
                    [p["lons"] for p in parents],
                ),
                batch["area_id"].to_numpy(zero_copy_only=False).astype(np.int64),
                (
                    batch["min_lat"].to_numpy(),
                    batch["min_lon"].to_numpy(),
                    batch["max_lat"].to_numpy(),
                    batch["max_lon"].to_numpy(),
                ),
                batch["area"].to_numpy(),
                (_ring_views(batch["lats"]), _ring_views(batch["lons"])),
            )
            return pa.table(
                {
                    "anc": pa.array(anc, pa.int64()),
                    "desc": pa.array(desc, pa.int64()),
                }
            )

        pairs = cell_pairs.union(
            slim.map_batches(big_pairs, batch_format="pyarrow")
        )
    else:
        pairs = cell_pairs
    # consumed THREE times below (into_mid, out_of_mid, the skip-marker
    # union): pin the blocks once — re-executing the per-cell exact
    # containment lineage per consumer tripled the build cost
    pairs = pairs.materialize()

    # transitive reduction: drop (anc, desc) if a 2-path anc→mid→desc
    # exists. The self-join on the shared mid is expressed as a
    # union + groupby (side 0 = edges INTO mid, side 1 = edges OUT of
    # mid; the group emits the in×out cross product) — `Dataset.join`
    # surfaces schema-less empty hash partitions on small inputs
    # (measured round 1/2), the groupby form is robust to them
    into_mid = pairs.map_batches(
        lambda b: pa.table(
            {
                "key": b["desc"].cast(pa.int64()),
                "other": b["anc"].cast(pa.int64()),
                "side": pa.array(np.zeros(len(b), dtype=np.int8)),
            }
        ),
        batch_format="pyarrow",
    )
    out_of_mid = pairs.map_batches(
        lambda b: pa.table(
            {
                "key": b["anc"].cast(pa.int64()),
                "other": b["desc"].cast(pa.int64()),
                "side": pa.array(np.ones(len(b), dtype=np.int8)),
            }
        ),
        batch_format="pyarrow",
    )

    def expand_2paths(g: pd.DataFrame) -> pd.DataFrame:
        a = g.loc[g["side"] == 0, "other"].to_numpy(dtype=np.int64)
        d = g.loc[g["side"] == 1, "other"].to_numpy(dtype=np.int64)
        if a.size == 0 or d.size == 0:
            return _EMPTY_PAIRS
        return pd.DataFrame(
            {
                "anc": pd.Series(np.repeat(a, d.size), dtype=np.int64),
                "desc": pd.Series(np.tile(d, a.size), dtype=np.int64),
            }
        )

    transitive = (
        partitioned_map_groups(into_mid.union(out_of_mid), "key", expand_2paths)
        .map_batches(_norm_pairs, batch_format="pyarrow")
        .map_batches(
            lambda b: b.append_column(
                "skip", pa.array(np.ones(len(b), dtype=np.int8))
            ),
            batch_format="pyarrow",
        )
    )
    # anti-join via union + max-marker aggregate (edges with any 2-path get
    # skip=1); avoids join-with-possibly-empty-side schema pitfalls
    marked = pairs.map_batches(
        lambda b: pa.table(
            {
                "anc": b["anc"],
                "desc": b["desc"],
                "skip": pa.array(np.zeros(len(b), dtype=np.int8)),
            }
        ),
        batch_format="pyarrow",
    ).union(transitive)

    # edge-pair cardinality scales with the area count: partition-hashed
    # max, not groupby(["anc","desc"]).aggregate (~2.4 ms/group)
    flags = partitioned_aggregate(
        marked,
        ["anc", "desc"],
        lambda g: g.groupby(["anc", "desc"], sort=False)["skip"]
        .max()
        .reset_index(),
    )

    def keep_unskipped(batch: pa.Table) -> pa.Table:
        if "skip" not in batch.column_names:  # schema-less empty block
            return _norm_pairs(batch)
        return _norm_pairs(batch.filter(pa.compute.equal(batch["skip"], 0)))

    direct = flags.map_batches(keep_unskipped, batch_format="pyarrow")

    # top-level areas (never a desc) parent to the synthetic root — the
    # same union + Max-marker trick, fully distributed (no take_all)
    ids_marked = slim.map_batches(
        lambda b: pa.table(
            {
                "desc": b["area_id"].cast(pa.int64()),
                "skip": pa.array(np.zeros(len(b), dtype=np.int8)),
            }
        ),
        batch_format="pyarrow",
    ).union(
        pairs.map_batches(
            lambda b: pa.table(
                {
                    "desc": b["desc"].cast(pa.int64()),
                    "skip": pa.array(np.ones(len(b), dtype=np.int8)),
                }
            ),
            batch_format="pyarrow",
        )
    )
    top_flags = partitioned_aggregate(
        ids_marked,
        "desc",
        lambda g: g.groupby("desc", sort=False)["skip"].max().reset_index(),
    )

    def to_root_edges(batch: pa.Table) -> pa.Table:
        if "skip" not in batch.column_names:
            return _norm_pairs(batch)
        top = batch.filter(pa.compute.equal(batch["skip"], 0))
        return pa.table(
            {
                "anc": pa.array(
                    np.full(len(top), ROOT_AREA_ID, dtype=np.int64)
                ),
                "desc": top["desc"].cast(pa.int64()),
            }
        )

    root_edges = top_flags.map_batches(to_root_edges, batch_format="pyarrow")
    edges = direct.union(root_edges)

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "parent_area_id": batch["anc"].cast(pa.int64()),
                "child_area_id": batch["desc"].cast(pa.int64()),
            }
        )

    return edges.map_batches(rename, batch_format="pyarrow")


def topological_depths(
    edges: rd.Dataset, *, num_partitions: int = 16, max_rounds: int = 64
) -> rd.Dataset:
    """Topological sort of the containment DAG as an **iterative
    groupby-aggregate** (the north-star re-expression of nested-area
    resolution): returns ``(area_id, depth)`` where depth is the longest
    root→area path — the area's nesting level, and a valid topological
    order key (every edge goes strictly depth-increasing).

    Bellman-Ford frontier propagation: round *k* emits every area
    reachable by a length-*k* path; an area's final depth is the max
    round that reached it, computed as a distributed groupby-Max. The
    edge table is materialized ONCE and never moves again: each round is
    a map-side broadcast semi-join (the current frontier's id array —
    bounded by the widest DAG level, ids only — ships via ``ray.put``;
    every edge block filters ``parent ∈ frontier`` vectorized and emits
    its children). Round count therefore equals the DAG depth (~10 for
    real OSM nesting), data movement per round is frontier-sized, and
    the edges are read in place — vs the reference's sequential per-area
    sift-down (``graphing/GraphBuilder.scala:18-124``). The driver holds
    one level's id array at a time (8 B/area of the widest level), the
    same boundedness the graph builder assumes for root-level handling.
    """
    import ray

    from .shuffle import partitioned_aggregate

    def to_pc(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "parent": batch["parent_area_id"].cast(pa.int64()),
                "child": batch["child_area_id"].cast(pa.int64()),
            }
        )

    e = edges.map_batches(to_pc, batch_format="pyarrow").materialize()

    def split_root(batch: pa.Table) -> pa.Table:
        m = pa.compute.equal(batch["parent"], ROOT_AREA_ID)
        return pa.table({"area_id": batch.filter(m)["child"]})

    def _frontier_ids(ds: rd.Dataset) -> np.ndarray:
        parts = [
            b["area_id"].to_numpy(zero_copy_only=False)
            for b in ds.iter_batches(batch_format="pyarrow")
        ]
        return np.unique(np.concatenate(parts)) if parts else np.array([], np.int64)

    frontier = _frontier_ids(e.map_batches(split_root, batch_format="pyarrow"))
    contribs: list[rd.Dataset] = []
    depth = 1
    while frontier.size and depth <= max_rounds:
        contribs.append(
            rd.from_arrow(
                pa.table(
                    {
                        "area_id": pa.array(frontier, pa.int64()),
                        "depth": pa.array(
                            np.full(frontier.size, depth, dtype=np.int64)
                        ),
                    }
                )
            )
        )
        f_ref = ray.put(frontier)

        def step(batch: pa.Table, _ref=f_ref) -> pa.Table:
            fr = ray.get(_ref)
            p = batch["parent"].to_numpy(zero_copy_only=False)
            m = np.isin(p, fr) & (p != ROOT_AREA_ID)
            ch = np.unique(batch["child"].to_numpy(zero_copy_only=False)[m])
            return pa.table({"area_id": pa.array(ch, pa.int64())})

        frontier = _frontier_ids(e.map_batches(step, batch_format="pyarrow"))
        depth += 1

    if frontier.size:
        # deeper than max_rounds (or a cycle snuck into the edge set):
        # truncated depths would be silently wrong — fail loudly
        raise ValueError(
            f"topological_depths: frontier still has {frontier.size} areas "
            f"after {max_rounds} rounds (DAG deeper than max_rounds, or "
            f"cyclic edges); raise max_rounds or fix the edge set"
        )
    if not contribs:  # no root edges at all (empty catalog)
        return rd.from_arrow(
            pa.table({"area_id": pa.array([], pa.int64()), "depth": pa.array([], pa.int64())})
        )
    allc = contribs[0]
    for c in contribs[1:]:
        allc = allc.union(c)

    def max_depth(part: pd.DataFrame) -> pd.DataFrame:
        return part.groupby("area_id", as_index=False)["depth"].max()

    return partitioned_aggregate(
        allc, "area_id", max_depth, num_partitions=num_partitions
    )


def edges_to_adjacency(edges_df: pd.DataFrame) -> dict[int, list[int]]:
    """Edge table → {parent: sorted children} adjacency dict."""
    adj: dict[int, list[int]] = {}
    for p, c in zip(
        edges_df["parent_area_id"].tolist(), edges_df["child_area_id"].tolist()
    ):
        adj.setdefault(int(p), []).append(int(c))
    return {k: sorted(v) for k, v in adj.items()}
