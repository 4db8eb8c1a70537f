"""Area resolution pipeline: OSM-style tables → deduplicated area polygons.

Ray-Data re-expression of the reference's steps 2-4 (SURVEY.md §3.1):

* entity filters (``graphing/EntitiesToGraph.scala:8-18``) as vectorized
  ``map_batches`` masks,
* relation expansion guard (C2, ``resolving/RelationExpander.scala:13-39``)
  and outer-way resolution (C3, ``resolving/OuterWayResolver.scala:10-36``)
  in an actor-pool stage over a **broadcast** relations dict (relations are
  the small side — the reference also holds them all in heap,
  ``input/RelationExtractor.scala:138-151``),
* ring assembly (C1, ``resolving/OutlineBuilder.scala:18-66``) per relation
  inside a partition-hashed groupby (``_partitioned_map_groups`` — shuffle
  cost independent of relation cardinality) after a hash join with ways —
  deterministic (candidates chosen by smallest way id) where the reference
  relied on ``mutable.Set`` iteration order,
* way⋈node coordinate resolution (J3, ``steps/ExtractAreas.scala:88-96``)
  as the build-phase shuffle: explode ring node refs → ``Dataset.join`` on
  ``node_id`` → order-restoring reassembly per ring,
* polygon/bbox/planar-area measures (F12-F14) vectorized per ring,
* exact dedup (D1, ``steps/RenderAndDeduplicateAreas.scala:72-120``) by
  canonical ring signature — a ``groupby(sig)`` instead of the reference's
  O(n^2) sorted scan; ids become content-derived and run-stable (replacing
  ``model/AreaIdSequence.scala:5-12``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from .shuffle import copartition_join, partitioned_map_groups

from ..functions.entities import filter_area_ways, filter_named_relations
from ..geometry import (
    canonical_ring_signature,
    ring_area,
    ring_bbox,
    stable_area_id,
)
from ..model import osm_id_for, tags_to_dict


# ---------------------------------------------------------------------------
# C2: relation expansion guard (cycle / missing-subrelation detection)
# ---------------------------------------------------------------------------

def expand_relation(rel_id: int, all_relations: dict[int, list], upstream=frozenset()):
    """Return the list of [rel_id, *expanded sub rel ids]; None if the
    relation references itself through members or a sub-relation is missing
    (the reference then skips the relation entirely)."""
    members = all_relations.get(rel_id)
    if members is None:
        return None
    rel_members = [m for m in members if m["type"] == "relation"]
    if any(m["ref"] in upstream or m["ref"] == rel_id for m in rel_members):
        return None
    out = [rel_id]
    nxt = upstream | {rel_id}
    for m in rel_members:
        sub = expand_relation(m["ref"], all_relations, nxt)
        if sub is None:
            return None
        out.extend(sub)
    return out


# ---------------------------------------------------------------------------
# C3: outer way ids (role == "outer"; outer sub-relations recursed;
# circular refs skipped)
# ---------------------------------------------------------------------------

def resolve_member_way_ids(
    rel_id: int,
    all_relations: dict[int, list],
    role: str = "outer",
    seen=frozenset(),
):
    """Way members of a relation with the given role; same-role
    sub-relations recursed; circular refs skipped."""
    used = seen | {rel_id}
    out: list[int] = []
    for m in all_relations.get(rel_id, []):
        if m["type"] == "relation" and m["ref"] in used:
            continue  # circular reference — skip member
        if m["role"] != role:
            continue
        if m["type"] == "way":
            out.append(m["ref"])
        elif m["type"] == "relation":
            if m["ref"] in all_relations:
                out.extend(
                    resolve_member_way_ids(m["ref"], all_relations, role, used)
                )
    return out


def resolve_outer_way_ids(rel_id: int, all_relations: dict[int, list], seen=frozenset()):
    return resolve_member_way_ids(rel_id, all_relations, "outer", seen)


class RelationOuters:
    """Actor-pool stage: named relations batch → exploded
    (rel_id, osm_id, way_id, way_seq) member-way refs for one role
    (``outer`` — the reference's only role — by default);
    cyclic/unexpandable relations dropped (recorded via the ``dropped``
    marker rows)."""

    def __init__(self, relations_ref, role: str = "outer"):
        self.all_relations = ray.get(relations_ref)
        self.role = role

    def __call__(self, batch: pa.Table) -> pa.Table:
        rel_ids, osm_ids, way_ids, seqs, dropped = [], [], [], [], []
        for rid in batch["rel_id"].to_pylist():
            if expand_relation(rid, self.all_relations) is None:
                dropped.append(rid)
                continue
            for i, wid in enumerate(
                resolve_member_way_ids(rid, self.all_relations, self.role)
            ):
                rel_ids.append(rid)
                osm_ids.append(osm_id_for(rid, "relation"))
                way_ids.append(wid)
                seqs.append(i)
        # dropped relations surface as way_id = -1 rows (filtered later,
        # collected for the recursive-relations side output)
        for rid in dropped:
            rel_ids.append(rid)
            osm_ids.append(osm_id_for(rid, "relation"))
            way_ids.append(-1)
            seqs.append(-1)
        return pa.table(
            {
                "rel_id": pa.array(rel_ids, pa.int64()),
                "osm_id": pa.array(osm_ids, pa.string()),
                "way_id": pa.array(way_ids, pa.int64()),
                "way_seq": pa.array(seqs, pa.int32()),
            }
        )


# ---------------------------------------------------------------------------
# C1: ring assembly (joinWays) — deterministic variant
# ---------------------------------------------------------------------------

def join_ways_into_rings(ways: list[tuple[int, list[int]]]) -> list[list[int]]:
    """Greedy ring assembly (``resolving/OutlineBuilder.scala:18-66``):
    start from a way, repeatedly attach any remaining way whose head or
    tail matches the current tail (flipping as needed); keep components
    that closed; drop open ones. The reference picks ``Set.head``
    (iteration-order dependent) — we always pick the smallest way id so
    output is reproducible at any parallelism.

    ``ways``: (way_id, node_ids) with node_ids non-empty.
    Returns node-id sequences, one per closed ring.
    """
    available: dict[int, list[int]] = {wid: nids for wid, nids in ways if nids}
    rings: list[list[int]] = []
    while available:
        first_id = min(available)
        nodes = list(available.pop(first_id))
        while available:
            last = nodes[-1]
            candidates = [
                wid
                for wid, nids in available.items()
                if nids[0] == last or nids[-1] == last
            ]
            if not candidates:
                break
            nxt = min(candidates)
            nids = available.pop(nxt)
            if nids[0] == last:
                nodes.extend(nids[1:])
            else:
                nodes.extend(reversed(nids[:-1]))
        if nodes[0] == nodes[-1] and len(nodes) >= 4:
            rings.append(nodes)
        # else: not closed — dropped, like the reference's log-and-skip
    return rings


def _assemble_rings_group(group: pd.DataFrame) -> pd.DataFrame:
    """map_groups body: one relation's resolved outer-way node rows
    (exploded to scalars for the hash join) → 0..n rings."""
    if group.empty:  # empty shuffle block (see shuffle.partitioned_map_groups)
        return pd.DataFrame(
            {
                "ring_key": pd.Series([], dtype=str),
                "osm_id": pd.Series([], dtype=str),
                "node_ids": pd.Series([], dtype=object),
            }
        )
    group = group.sort_values(["way_seq", "pos"])
    ways: list[tuple[int, list[int]]] = []
    for wid, sub in group.groupby("way_id", sort=False):
        ways.append((int(wid), sub["node_id"].tolist()))
    rings = join_ways_into_rings(ways)
    osm_id = group["osm_id"].iloc[0]
    return pd.DataFrame(
        {
            "ring_key": [f"{osm_id}:{i}" for i in range(len(rings))],
            "osm_id": [osm_id] * len(rings),
            "node_ids": rings,
        }
    )


def explode_way_nodes(batch: pa.Table) -> pa.Table:
    """(way_id, node_ids) → (way_id, pos, node_id) scalar rows — list
    payloads can't ride through the hash join, and exploded rows shuffle
    finer anyway."""
    nid = batch["node_ids"].combine_chunks()
    offsets = nid.offsets.to_numpy(zero_copy_only=False)
    lengths = np.diff(offsets)
    reps = np.repeat(np.arange(len(batch)), lengths)
    pos = (
        np.concatenate([np.arange(n) for n in lengths])
        if len(batch)
        else np.array([], dtype=np.int64)
    )
    values = nid.values.to_numpy(zero_copy_only=False)
    window = values[offsets[0] : offsets[-1]]
    wids = batch["way_id"].to_numpy(zero_copy_only=False)
    return pa.table(
        {
            "way_id": pa.array(wids[reps], pa.int64()),
            "pos": pa.array(pos.astype(np.int32)),
            "node_id": pa.array(window, pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# ring → coordinates → measured areas
# ---------------------------------------------------------------------------

def _explode_ring_nodes(batch: pa.Table) -> pa.Table:
    """(ring_key, node_ids) → (ring_key, pos, node_id) rows."""
    nid = batch["node_ids"].combine_chunks()
    offsets = nid.offsets.to_numpy(zero_copy_only=False)
    lengths = np.diff(offsets)
    keys = batch["ring_key"].to_numpy(zero_copy_only=False)
    osm = batch["osm_id"].to_numpy(zero_copy_only=False)
    reps = np.repeat(np.arange(len(batch)), lengths)
    pos = np.concatenate([np.arange(n) for n in lengths]) if len(batch) else np.array([], dtype=np.int64)
    values = nid.values.to_numpy(zero_copy_only=False)
    base = offsets[0]
    window = values[base : offsets[-1]]
    return pa.table(
        {
            "ring_key": pa.array(keys[reps]),
            "osm_id": pa.array(osm[reps]),
            "pos": pa.array(pos.astype(np.int32)),
            "node_id": pa.array(window, pa.int64()),
        }
    )


def _measure_ring_group(group: pd.DataFrame) -> pd.DataFrame:
    """map_groups body after the node join: rebuild ring coordinate arrays
    in original order, drop consecutive duplicate vertices (way joints),
    and measure polygon/bbox/area + canonical signature (F12-F14)."""
    empty = pd.DataFrame(
        {
            "sig": pd.Series([], dtype=str),
            "osm_id": pd.Series([], dtype=str),
            "lats": pd.Series([], dtype=object),
            "lons": pd.Series([], dtype=object),
            "area": pd.Series([], dtype=np.float64),
            "min_lat": pd.Series([], dtype=np.float64),
            "min_lon": pd.Series([], dtype=np.float64),
            "max_lat": pd.Series([], dtype=np.float64),
            "max_lon": pd.Series([], dtype=np.float64),
        }
    )
    if group.empty:  # empty shuffle block
        return empty
    group = group.sort_values("pos")
    lats = group["lat"].to_numpy(dtype=np.float64)
    lons = group["lon"].to_numpy(dtype=np.float64)
    if lats.size == 0:
        return empty
    # drop consecutive duplicates (shared way-joint nodes)
    keep = np.ones(lats.size, dtype=bool)
    keep[1:] = (lats[1:] != lats[:-1]) | (lons[1:] != lons[:-1])
    lats, lons = lats[keep], lons[keep]
    # drop closing vertex if still present
    if lats.size > 1 and lats[0] == lats[-1] and lons[0] == lons[-1]:
        lats, lons = lats[:-1], lons[:-1]
    if lats.size < 3:
        return empty
    sig = canonical_ring_signature(lats, lons)
    bbox = ring_bbox(lats, lons)
    # rings as python LISTS, not ndarrays: Ray's pandas→arrow conversion
    # turns ndarray cells into its tensor extension, and when a block
    # happens to hold only same-length rings the FIXED-shape variant is
    # inferred — whose to_pandas crashes in pandas dtype parsing
    # ("format number 1 of numpy.ndarray(shape=(4,)...) is not
    # recognized"), a block-split-dependent flake. List cells convert to
    # plain list<double>.
    return pd.DataFrame(
        {
            "sig": [sig.hex()],
            "osm_id": [group["osm_id"].iloc[0]],
            "lats": [lats.tolist()],
            "lons": [lons.tolist()],
            "area": [ring_area(lats, lons)],
            "min_lat": [bbox[0]],
            "min_lon": [bbox[1]],
            "max_lat": [bbox[2]],
            "max_lon": [bbox[3]],
        }
    )


def _dedup_group(group: pd.DataFrame) -> pd.DataFrame:
    """D1: identical canonical rings merge; surviving row carries the
    sorted union of osm_ids and the content-derived stable area id.
    Representative row = smallest osm_id, so the surviving raw ring
    (rotation/direction) is independent of shuffle arrival order."""
    if group.empty:  # empty shuffle block
        return pd.DataFrame(
            {
                "area_id": pd.Series([], dtype=np.int64),
                "osm_ids": pd.Series([], dtype=object),
                "lats": pd.Series([], dtype=object),
                "lons": pd.Series([], dtype=object),
                "area": pd.Series([], dtype=np.float64),
                "min_lat": pd.Series([], dtype=np.float64),
                "min_lon": pd.Series([], dtype=np.float64),
                "max_lat": pd.Series([], dtype=np.float64),
                "max_lon": pd.Series([], dtype=np.float64),
            }
        )
    group = group.sort_values("osm_id", kind="stable")
    first = group.iloc[0]
    osm_ids = sorted(set(group["osm_id"].tolist()))
    out = pd.DataFrame(
        {
            "area_id": [stable_area_id(bytes.fromhex(first["sig"]))],
            "osm_ids": [osm_ids],
            "lats": [first["lats"]],
            "lons": [first["lons"]],
            "area": [first["area"]],
            "min_lat": [first["min_lat"]],
            "min_lon": [first["min_lon"]],
            "max_lat": [first["max_lat"]],
            "max_lon": [first["max_lon"]],
        }
    )
    return out


# ---------------------------------------------------------------------------
# the pipeline
# ---------------------------------------------------------------------------

_partitioned_map_groups = partitioned_map_groups

def resolve_areas(
    nodes: rd.Dataset,
    ways: rd.Dataset,
    relations: rd.Dataset,
    *,
    join_partitions: int = 16,
    outers_concurrency: int = 2,
) -> rd.Dataset:
    """nodes/ways/relations Datasets → deduplicated areas Dataset
    (area_id, osm_ids, lats, lons, area, bbox cols).

    Partitioning: the only large shuffles are the ``node_id`` hash join
    (J3) and the per-ring regroup; relations ride broadcast. At planet
    scale raise ``join_partitions``; everything else streams.
    """
    # broadcast the relation member lists (small side) once
    rel_members: dict[int, list] = {}
    for batch in relations.select_columns(["rel_id", "members"]).iter_batches(
        batch_format="pyarrow"
    ):
        for rid, members in zip(
            batch["rel_id"].to_pylist(), batch["members"].to_pylist()
        ):
            rel_members[rid] = members or []
    relations_ref = ray.put(rel_members)

    named_rels = relations.map_batches(filter_named_relations, batch_format="pyarrow")
    outer_refs = named_rels.map_batches(
        RelationOuters,
        fn_constructor_args=(relations_ref,),
        batch_format="pyarrow",
        concurrency=outers_concurrency,
    )
    outer_refs = outer_refs.filter(expr="way_id >= 0")

    # hash join outer way refs with exploded way nodes, then assemble
    # rings. Skipped entirely when the extract has no relations (a
    # ways-only extract is legal OSM): joining an EMPTY Dataset side
    # surfaces Ray's schema-less empty-hash-partition ArrowInvalid
    # ("No match ... FieldRef.Name(way_id)") — and there is nothing to
    # join anyway.
    rel_rings = None
    if rel_members:
        way_nodes = ways.select_columns(["way_id", "node_ids"]).map_batches(
            explode_way_nodes, batch_format="pyarrow"
        )
        joined = outer_refs.join(
            way_nodes,
            join_type="inner",
            num_partitions=join_partitions,
            on=("way_id",),
        )
        rel_rings = _partitioned_map_groups(joined, "rel_id", _assemble_rings_group)

    # closed named ways are single-way areas (AreaResolver.scala:26-38)
    def way_rings(batch: pa.Table) -> pa.Table:
        batch = filter_area_ways(batch)
        osm_ids = [osm_id_for(w, "way") for w in batch["way_id"].to_pylist()]
        return pa.table(
            {
                "ring_key": pa.array([f"{o}:0" for o in osm_ids], pa.string()),
                "osm_id": pa.array(osm_ids, pa.string()),
                "node_ids": batch["node_ids"].cast(pa.list_(pa.int64())),
            }
        )

    way_ring_ds = ways.map_batches(way_rings, batch_format="pyarrow")
    rings = rel_rings.union(way_ring_ds) if rel_rings is not None else way_ring_ds

    # J3: the way⋈node shuffle — explode refs, join coords, reassemble
    ring_nodes = rings.map_batches(_explode_ring_nodes, batch_format="pyarrow")
    nodes_slim = nodes.select_columns(["node_id", "lat", "lon"])
    with_coords = ring_nodes.join(
        nodes_slim,
        join_type="inner",
        num_partitions=join_partitions,
        on=("node_id",),
    )
    measured = _partitioned_map_groups(with_coords, "ring_key", _measure_ring_group)

    # D1 exact dedup by canonical signature
    areas = _partitioned_map_groups(measured, "sig", _dedup_group)

    # normalize pandas-object blocks to typed Arrow (list<string>/list<f64>)
    # so downstream write_parquet / joins see a stable schema
    return areas.map_batches(areas_to_arrow, batch_format="pandas")


def resolve_area_holes(
    nodes: rd.Dataset,
    ways: rd.Dataset,
    relations: rd.Dataset,
    *,
    join_partitions: int = 16,
    inners_concurrency: int = 2,
) -> rd.Dataset:
    """Opt-in inner-ring ("hole") resolution — deliberately BEYOND
    reference parity: the reference resolves only role-``outer`` ways
    (``resolving/OuterWayResolver.scala:10-36``), so donut polygons
    (lakes, enclaves) get wrong containment there. This runs the same
    ring machinery over role-``inner`` members and returns one row per
    assembled hole ring: ``(osm_id, lats, lons)`` keyed by the owning
    relation's osm id. Attach to a pack with
    :func:`osm_jigsaw_ray.stages.pip.attach_holes`; packs without
    attached holes behave exactly like the reference (default off)."""
    rel_members: dict[int, list] = {}
    for batch in relations.select_columns(["rel_id", "members"]).iter_batches(
        batch_format="pyarrow"
    ):
        for rid, members in zip(
            batch["rel_id"].to_pylist(), batch["members"].to_pylist()
        ):
            rel_members[rid] = members or []
    relations_ref = ray.put(rel_members)

    named_rels = relations.map_batches(filter_named_relations, batch_format="pyarrow")
    inner_refs = named_rels.map_batches(
        RelationOuters,
        fn_constructor_args=(relations_ref, "inner"),
        batch_format="pyarrow",
        concurrency=inners_concurrency,
    ).filter(expr="way_id >= 0")

    way_nodes = ways.select_columns(["way_id", "node_ids"]).map_batches(
        explode_way_nodes, batch_format="pyarrow"
    )
    # copartition_join, not Dataset.join: inner-ring refs are typically
    # few rows and Dataset.join's empty hash partitions lose the schema
    joined = copartition_join(
        inner_refs, way_nodes, on="way_id", num_partitions=join_partitions
    )
    hole_rings = _partitioned_map_groups(joined, "rel_id", _assemble_rings_group)
    ring_nodes = hole_rings.map_batches(_explode_ring_nodes, batch_format="pyarrow")
    with_coords = copartition_join(
        ring_nodes,
        nodes.select_columns(["node_id", "lat", "lon"]),
        on="node_id",
        num_partitions=join_partitions,
    )
    measured = _partitioned_map_groups(with_coords, "ring_key", _measure_ring_group)

    def slim(df: pd.DataFrame) -> pa.Table:
        return pa.table(
            {
                "osm_id": pa.array([str(x) for x in df["osm_id"]], pa.string()),
                "lats": pa.array(
                    [np.asarray(x, dtype=np.float64) for x in df["lats"]],
                    pa.list_(pa.float64()),
                ),
                "lons": pa.array(
                    [np.asarray(x, dtype=np.float64) for x in df["lons"]],
                    pa.list_(pa.float64()),
                ),
            }
        )

    return measured.map_batches(slim, batch_format="pandas")


def areas_to_arrow(df: pd.DataFrame) -> pa.Table:
    """Areas DataFrame (cells may be python lists OR numpy object arrays,
    e.g. after a parquet round-trip) → typed Arrow table. Needed because
    ``rd.from_pandas`` of ndarray-cell columns trips Ray's tensor
    extension on string lists."""
    if len(df) == 0:
        # empty shuffle blocks may arrive schema-less; emit the
        # canonical typed empty so downstream schemas stay stable
        return pa.table(
            {
                "area_id": pa.array([], pa.int64()),
                "osm_ids": pa.array([], pa.list_(pa.string())),
                "lats": pa.array([], pa.list_(pa.float64())),
                "lons": pa.array([], pa.list_(pa.float64())),
                "area": pa.array([], pa.float64()),
                "min_lat": pa.array([], pa.float64()),
                "min_lon": pa.array([], pa.float64()),
                "max_lat": pa.array([], pa.float64()),
                "max_lon": pa.array([], pa.float64()),
            }
        )
    return pa.table(
        {
            "area_id": pa.array(df["area_id"].astype("int64"), pa.int64()),
            "osm_ids": pa.array(
                [list(x) for x in df["osm_ids"]], pa.list_(pa.string())
            ),
            "lats": pa.array(
                [np.asarray(x, dtype=np.float64) for x in df["lats"]],
                pa.list_(pa.float64()),
            ),
            "lons": pa.array(
                [np.asarray(x, dtype=np.float64) for x in df["lons"]],
                pa.list_(pa.float64()),
            ),
            "area": pa.array(df["area"].astype("float64"), pa.float64()),
            "min_lat": pa.array(df["min_lat"].astype("float64"), pa.float64()),
            "min_lon": pa.array(df["min_lon"].astype("float64"), pa.float64()),
            "max_lat": pa.array(df["max_lat"].astype("float64"), pa.float64()),
            "max_lon": pa.array(df["max_lon"].astype("float64"), pa.float64()),
        }
    )


def areas_dataset_from_df(df: pd.DataFrame) -> rd.Dataset:
    """Safe Dataset constructor for an areas DataFrame (see
    :func:`areas_to_arrow`)."""
    return rd.from_arrow(areas_to_arrow(df))


def extract_named_nodes(nodes: rd.Dataset) -> rd.Dataset:
    """F7 (``Main.scala:107-128``): filter named nodes → (osm_id, lat,
    lon) — the ``OutputNode`` side output, as a vectorized projection."""
    from ..functions.entities import tags_have_name

    def fn(batch: pa.Table) -> pa.Table:
        mask = tags_have_name(batch["tags"])
        kept = batch.filter(pa.array(mask))
        osm_ids = [osm_id_for(n, "node") for n in kept["node_id"].to_pylist()]
        return pa.table(
            {
                "osm_id": pa.array(osm_ids, pa.string()),
                "lat": kept["lat"],
                "lon": kept["lon"],
            }
        )

    return nodes.map_batches(fn, batch_format="pyarrow")


def entity_type_counts(
    nodes: rd.Dataset, ways: rd.Dataset, relations: rd.Dataset
) -> pd.DataFrame:
    """F6/A1 (``Main.scala:58-92``): per-entity-type total + named counts."""
    from ..functions.entities import tags_have_name

    def count_named(ds, tag_col="tags"):
        def fn(batch: pa.Table) -> pa.Table:
            named = int(tags_have_name(batch[tag_col]).sum())
            return pa.table(
                {"n": pa.array([len(batch)], pa.int64()), "named": pa.array([named], pa.int64())}
            )

        parts = ds.map_batches(fn, batch_format="pyarrow").to_pandas()
        return int(parts["n"].sum()), int(parts["named"].sum())

    rows = []
    for name, ds in (("node", nodes), ("way", ways), ("relation", relations)):
        n, named = count_named(ds)
        rows.append({"entity_type": name, "n": n, "named": named})
    return pd.DataFrame(rows)


def dropped_relation_ids(relations: rd.Dataset) -> list[int]:
    """D2 side output: named relations dropped by the expansion guard
    (cyclic or missing sub-relations) — the ``.recursive-relations.json``
    analog (``steps/ExtractEntities.scala:14-18``)."""
    rel_members: dict[int, list] = {}
    for batch in relations.select_columns(["rel_id", "members"]).iter_batches(
        batch_format="pyarrow"
    ):
        for rid, members in zip(
            batch["rel_id"].to_pylist(), batch["members"].to_pylist()
        ):
            rel_members[rid] = members or []
    return sorted(
        rid for rid in rel_members if expand_relation(rid, rel_members) is None
    )
