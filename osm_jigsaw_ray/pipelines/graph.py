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
  (``/root/reference/README.md:157-161``).

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

from ..geometry import geohash_cover, geohash_encode, ring_contains_ring

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
    ``GraphBuilder.buildGraph`` + ``siftDownNode`` exactly (larger-first
    insertion, attach-to-all-containing-siblings)."""
    root = _Node(AreaRec(ROOT_AREA_ID, np.array([]), np.array([]), float("inf"), ()))
    root.children = {_Node(a) for a in sorted(areas, key=lambda a: -a.area)}
    root.sifted = True

    queue = [root]
    while queue:
        node = queue.pop(0)
        to_sift = sorted(node.children, key=lambda n: -n.area.area)
        top_level: list[_Node] = []
        for b in to_sift:
            fits_in = [s for s in top_level if _contains(s.area, b.area)]
            if fits_in:
                for s in fits_in:
                    s.children.add(b)
            else:
                top_level.append(b)
        node.children = set(top_level)
        for c in top_level:
            if not c.sifted:
                c.sifted = True
                queue.append(c)

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
    cells land in the single synthetic 'global' cell as parents — the
    hot-cell cap for planet-spanning polygons (SURVEY.md §4 skew note)."""
    n = len(batch)
    min_lat = batch["min_lat"].to_numpy()
    min_lon = batch["min_lon"].to_numpy()
    max_lat = batch["max_lat"].to_numpy()
    max_lon = batch["max_lon"].to_numpy()
    c_lat = (min_lat + max_lat) / 2
    c_lon = (min_lon + max_lon) / 2
    home = geohash_encode(c_lat, c_lon, precision)

    cells: list[str] = []
    roles: list[int] = []  # 0 = child candidate, 1 = parent candidate
    idx: list[int] = []
    for i in range(n):
        cells.append(home[i])
        roles.append(0)
        idx.append(i)
        cover = geohash_cover(
            (min_lat[i], min_lon[i], max_lat[i], max_lon[i]), precision
        )
        if len(cover) > max_cover:
            cover = ["~global"]
        for cell in cover:
            cells.append(cell)
            roles.append(1)
            idx.append(i)
        # a global parent must also see every child: children additionally
        # home into '~global' so planet-spanning parents still meet them
        cells.append("~global")
        roles.append(0)
        idx.append(i)

    take = pa.array(idx, pa.int32())
    sub = batch.take(take)
    return sub.append_column("cell", pa.array(cells, pa.string())).append_column(
        "role", pa.array(roles, pa.int8())
    )


def _contain_pairs_group(group: pd.DataFrame) -> pd.DataFrame:
    """Per-cell exact containment pairs: parents (role 1, replicated) x
    children (role 0, homed here). Sorted by descending area so each
    child only tests parents that could contain it; bbox prefilter before
    the exact ring test (the per-actor STRtree analog)."""
    parents = group[group["role"] == 1]
    children = group[group["role"] == 0]
    if parents.empty or children.empty:
        return pd.DataFrame(
            {"anc": pd.Series([], dtype=np.int64), "desc": pd.Series([], dtype=np.int64)}
        )
    p_ids = parents["area_id"].to_numpy(dtype=np.int64)
    p_min_lat = parents["min_lat"].to_numpy()
    p_min_lon = parents["min_lon"].to_numpy()
    p_max_lat = parents["max_lat"].to_numpy()
    p_max_lon = parents["max_lon"].to_numpy()
    p_area = parents["area"].to_numpy()
    p_lats = parents["lats"].tolist()
    p_lons = parents["lons"].tolist()

    anc_out: list[int] = []
    desc_out: list[int] = []
    for _, c in children.iterrows():
        cid = int(c["area_id"])
        # vectorized bbox + area prefilter over all candidate parents
        cand = (
            (p_area >= c["area"])
            & (p_ids != cid)
            & (p_min_lat <= c["min_lat"] + 1e-12)
            & (p_min_lon <= c["min_lon"] + 1e-12)
            & (p_max_lat >= c["max_lat"] - 1e-12)
            & (p_max_lon >= c["max_lon"] - 1e-12)
        )
        c_lats = np.asarray(c["lats"], dtype=np.float64)
        c_lons = np.asarray(c["lons"], dtype=np.float64)
        for j in np.nonzero(cand)[0]:
            if ring_contains_ring(
                np.asarray(p_lats[j], dtype=np.float64),
                np.asarray(p_lons[j], dtype=np.float64),
                c_lats,
                c_lons,
            ):
                anc_out.append(int(p_ids[j]))
                desc_out.append(cid)
    return pd.DataFrame(
        {"anc": pd.Series(anc_out, dtype=np.int64), "desc": pd.Series(desc_out, dtype=np.int64)}
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
    ROOT_AREA_ID. See module docstring for the shuffle plan."""
    slim = areas.select_columns(
        ["area_id", "lats", "lons", "area", "min_lat", "min_lon", "max_lat", "max_lon"]
    )
    assigned = slim.map_batches(
        lambda b: _cell_assignments(b, precision, max_cover), batch_format="pyarrow"
    )
    pairs = assigned.groupby("cell").map_groups(
        _contain_pairs_group, batch_format="pandas"
    )
    # '~global' duplicates pairs found in home cells for global parents —
    # and every child is double-homed there, so dedup pairs exactly once
    pairs = pairs.groupby(["anc", "desc"]).map_groups(
        lambda g: g.head(1), batch_format="pandas"
    )

    # transitive reduction: drop (anc, desc) if a 2-path anc→mid→desc exists
    lower = pairs.map_batches(
        lambda b: pa.table({"mid": b["anc"], "final_desc": b["desc"]}),
        batch_format="pyarrow",
    )
    mids = pairs.join(
        lower,
        join_type="inner",
        num_partitions=join_partitions,
        on=("desc",),
        right_on=("mid",),
    )

    def norm_transitive(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "anc": batch["anc"],
                "desc": batch["final_desc"],
                "skip": pa.array(np.ones(len(batch), dtype=np.int8)),
            }
        )

    transitive = mids.map_batches(norm_transitive, batch_format="pyarrow")
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
    from ray.data.aggregate import Max

    flags = marked.groupby(["anc", "desc"]).aggregate(Max("skip", alias_name="skip"))
    direct = flags.map_batches(
        lambda b: b.filter(pa.compute.equal(b["skip"], 0)).select(["anc", "desc"]),
        batch_format="pyarrow",
    )

    # top-level areas (never a desc) parent to the synthetic root
    desc_ids = {r["desc"] for r in pairs.select_columns(["desc"]).take_all()}
    all_ids = {r["area_id"] for r in slim.select_columns(["area_id"]).take_all()}
    top = sorted(all_ids - desc_ids)
    root_edges = rd.from_arrow(
        pa.table(
            {
                "anc": pa.array([ROOT_AREA_ID] * len(top), pa.int64()),
                "desc": pa.array(top, pa.int64()),
            }
        )
    )
    edges = direct.union(root_edges)

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "parent_area_id": batch["anc"].cast(pa.int64()),
                "child_area_id": batch["desc"].cast(pa.int64()),
            }
        )

    return edges.map_batches(rename, batch_format="pyarrow")


def edges_to_adjacency(edges_df: pd.DataFrame) -> dict[int, list[int]]:
    """Edge table → {parent: sorted children} adjacency dict."""
    adj: dict[int, list[int]] = {}
    for p, c in zip(
        edges_df["parent_area_id"].tolist(), edges_df["child_area_id"].tolist()
    ):
        adj.setdefault(int(p), []).append(int(c))
    return {k: sorted(v) for k, v in adj.items()}
