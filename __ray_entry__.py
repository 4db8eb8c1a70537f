"""Driver contract for the ray-jigsaw engine.

``entry()`` runs the flagship geo-join pipeline at sf0.001;
``queries()`` exposes one callable per implemented operator family
(SURVEY.md §2 + the training-data ops); ``oracle_sql()`` provides the
DuckDB-equivalent SQL for every SQL-expressible query (page points are
derived from ``doc_id`` by pure integer arithmetic precisely so the
oracle can recompute them — see ``osm_jigsaw_ray/fixtures.py``).

Ray is initialised by the driver BEFORE this module is imported: nothing
here calls ``ray.init``/``ray.shutdown``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

import numpy as np
import pandas as pd
import pyarrow as pa

from osm_jigsaw_ray.fixtures import BOXES, build_osm_fixture_tables
from osm_jigsaw_ray.sources.pages import pages_from_documents

# ---------------------------------------------------------------------------
# cached polygon side (fixture catalog is static; built once per process)
# ---------------------------------------------------------------------------

_CACHE: dict[str, Any] = {}

# the 15 fixture boxes that survive area resolution (dup merged, unnamed/
# unclosed/cyclic dropped) — single source for engine assertions + SQL VALUES
AREA_BOX_NAMES = [
    "large", "excluded", "medium", "small", "left", "right", "overlapping",
    "fits_both", "dup", "subarea_parent", "subarea_child",
    "arch_mainland", "arch_island1", "arch_island2", "megacity",
]


def _polygon_side():
    if "pack" in _CACHE:
        return _CACHE["pack"], _CACHE["areas_df"], _CACHE["edges_df"]
    import ray.data as rd

    from osm_jigsaw_ray.pipelines.areas import areas_dataset_from_df, resolve_areas
    from osm_jigsaw_ray.pipelines.graph import build_graph_edges
    from osm_jigsaw_ray.pipelines.tags import extract_taggings, taggings_to_dict
    from osm_jigsaw_ray.stages.pip import build_area_pack

    t = build_osm_fixture_tables()
    nodes = rd.from_arrow(t["nodes"])
    ways = rd.from_arrow(t["ways"])
    relations = rd.from_arrow(t["relations"])
    areas_df = resolve_areas(nodes, ways, relations, join_partitions=4).to_pandas()
    edges_df = build_graph_edges(
        areas_dataset_from_df(areas_df), precision=1, join_partitions=4
    ).to_pandas()
    used = {o for ids in areas_df["osm_ids"] for o in ids}
    taggings = taggings_to_dict(extract_taggings(ways, relations, used))
    pack = build_area_pack(areas_df, edges_df, taggings)
    _CACHE.update(pack=pack, areas_df=areas_df, edges_df=edges_df)
    return pack, areas_df, edges_df


def _raster_side() -> tuple[pd.DataFrame, "Any"]:
    """Cached vector→raster runs of the fixture catalog on the 1° grid
    (180×360 — centers on half-degrees, never on an integer box edge)."""
    if "raster_runs" in _CACHE:
        return _CACHE["raster_runs"]
    from osm_jigsaw_ray.pipelines.raster import RasterGrid, rasterize_areas

    pack, _, _ = _polygon_side()
    grid = RasterGrid(180, 360)
    runs = (
        rasterize_areas(pack, grid, band_rows=30)
        .to_pandas()
        .sort_values(["pix_row", "col_lo"])
        .reset_index(drop=True)
    )
    _CACHE["raster_runs"] = (runs, grid)
    return _CACHE["raster_runs"]


def _joined(sf_dir: str) -> pd.DataFrame:
    key = f"joined:{sf_dir}"
    if key in _CACHE:
        return _CACHE[key]
    from osm_jigsaw_ray.pipelines.pages import geo_join_pages

    pack, _, _ = _polygon_side()
    pages = pages_from_documents(sf_dir)
    out = geo_join_pages(pages, pack, concurrency=2, extract_concurrency=2)
    df = out.to_pandas().sort_values("doc_id").reset_index(drop=True)
    _CACHE[key] = df
    return df


# ---------------------------------------------------------------------------
# entry
# ---------------------------------------------------------------------------

def _engine_defaults() -> None:
    """Apply the engine-default shuffle strategy (hash; GRAFT_SHUFFLE=sort
    opts out) to the caller's already-initialised Ray session. Idempotent;
    never calls ``ray.init``."""
    from osm_jigsaw_ray.pipelines.shuffle import apply_default_strategy

    apply_default_strategy()


def entry() -> Any:
    """Flagship: full geo-join over pages derived from sf0.001 documents."""
    import ray.data as rd

    from osm_jigsaw_ray.pipelines.pages import geo_join_pages

    _engine_defaults()

    pack, _, _ = _polygon_side()
    pages = pages_from_documents("/root/testdata/sf0.001")
    out = geo_join_pages(pages, pack, concurrency=2, extract_concurrency=2)
    return out.map_batches(
        lambda b: b.select(
            ["url", "warc_ts", "lang", "text", "lat", "lon", "cell_id",
             "nearest_area_id", "name", "doc_id"]
        ),
        batch_format="pyarrow",
    )


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------

def queries() -> dict[str, Callable[[str], Any]]:
    import ray.data as rd

    from osm_jigsaw_ray.pipelines import mlops, relational
    from osm_jigsaw_ray.stages.multimodal import decode_images, encode_fake_image

    _engine_defaults()

    def _docs(sf_dir):
        return rd.read_parquet(f"{sf_dir}/documents.parquet")

    # ---- spatial family ---------------------------------------------------
    def geo_extract_text(sf_dir):
        """F15: html → byte-identical text (the input_hint invariant)."""
        from osm_jigsaw_ray.pipelines.pages import extract_pages

        pages = pages_from_documents(sf_dir)
        out = extract_pages(pages, concurrency=2).to_pandas()
        return pa.table(
            {
                "doc_id": pa.array(out["doc_id"], pa.int64()),
                "text": pa.array(out["text"], pa.string()),
            }
        )

    def geo_pip_contains(sf_dir):
        """J8: per page, how many areas contain its point + the smallest
        containing area's planar size (the PIP-descent leaf)."""
        pack, _, _ = _polygon_side()
        sizes = {aid: a["area"] for aid, a in pack["areas"].items()}
        df = _joined(sf_dir)
        n_areas = df["area_ids"].map(len)
        smallest = df["area_ids"].map(
            lambda ids: min((sizes[a] for a in ids), default=None)
        )
        return pa.table(
            {
                "doc_id": pa.array(df["doc_id"], pa.int64()),
                "n_areas": pa.array(n_areas, pa.int64()),
                "smallest_area": pa.array(smallest, pa.float64()),
            }
        )

    def geo_knn_fallback(sf_dir):
        """J10: pages in no area → centroid of the nearest area."""
        pack, _, _ = _polygon_side()
        cent = {
            aid: (float(a["lats"].mean()), float(a["lons"].mean()))
            for aid, a in pack["areas"].items()
        }
        df = _joined(sf_dir)
        df = df[df["area_ids"].map(len) == 0]
        return pa.table(
            {
                "doc_id": pa.array(df["doc_id"], pa.int64()),
                "near_clat": pa.array(
                    [cent[a][0] for a in df["nearest_area_id"]], pa.float64()
                ),
                "near_clon": pa.array(
                    [cent[a][1] for a in df["nearest_area_id"]], pa.float64()
                ),
            }
        )

    def geo_join_full(sf_dir):
        """Full join rows (C8 descent + C9 naming + tile cell): the
        oracle recomputes the geohash cell with bit arithmetic, n_areas
        from the box catalog, and the name via the C9 rules hand-applied
        per (region, lang) — the same spec-string pinning style as the
        reference's NaiveNamingServiceSpec."""
        df = _joined(sf_dir)
        return pa.table(
            {
                "doc_id": pa.array(df["doc_id"], pa.int64()),
                "cell_id": pa.array(df["cell_id"], pa.string()),
                "n_areas": pa.array(df["area_ids"].map(len), pa.int64()),
                "name": pa.array(df["name"], pa.string()),
            }
        )

    def geo_join_partitioned(sf_dir):
        """Scale path of the headline join: the salted groupby-on-cell
        co-partitioned join (``geo_join_pages_partitioned``) must produce
        exactly the broadcast path's rows — same oracle SQL as
        ``geo_join_full``. Exercises the fully-distributed polygon-side
        routing (cell assign → induced subgraph → replicate-by-membership
        — no driver-held pack anywhere in the lineage), hot-cell salting,
        per-cell tag routing (kind=3 in the wide union; shared carries
        only the slim kNN arrays + naming projection), under the strict
        gate."""
        from osm_jigsaw_ray.pipelines.pages import geo_join_pages_partitioned
        from osm_jigsaw_ray.stages.pip import build_knn_side

        pack, areas_df, edges_df = _polygon_side()
        pages = pages_from_documents(sf_dir)
        df = (
            geo_join_pages_partitioned(
                pages,
                areas_df,
                edges_df,
                build_knn_side(pack),
                taggings=pack["taggings"],
                hot_cell_threshold=200,
                hot_detect_sample=0.5,
            )
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        return pa.table(
            {
                "doc_id": pa.array(df["doc_id"], pa.int64()),
                "cell_id": pa.array(df["cell_id"], pa.string()),
                "n_areas": pa.array(df["area_ids"].map(len), pa.int64()),
                "name": pa.array(df["name"], pa.string()),
            }
        )

    def geo_tile_assign(sf_dir):
        """C7: area→tile assignments at geohash res 2, reported as (cell
        lat/lon indices, area bbox) — pure arithmetic both sides, so the
        DuckDB oracle recomputes the full assignment from the box
        catalog (area ids are content hashes the oracle can't know;
        the bbox identifies the area instead)."""
        from osm_jigsaw_ray.geometry import geohash_bbox
        from osm_jigsaw_ray.pipelines.areas import areas_dataset_from_df
        from osm_jigsaw_ray.pipelines.tiling import assign_area_tiles

        _, areas_df, _ = _polygon_side()
        asn = assign_area_tiles(areas_dataset_from_df(areas_df), precision=2).to_pandas()
        bx = areas_df.set_index("area_id")
        lat_idx, lon_idx = [], []
        for t in asn["tile_id"]:
            b = geohash_bbox(t)
            lat_idx.append(int(round((b[0] + 90.0) / 5.625)))
            lon_idx.append(int(round((b[1] + 180.0) / 11.25)))
        out = pd.DataFrame(
            {
                "lat_idx": pd.Series(lat_idx, dtype="int64"),
                "lon_idx": pd.Series(lon_idx, dtype="int64"),
                "a_lat0": bx.loc[asn["area_id"], "min_lat"].to_numpy(),
                "a_lat1": bx.loc[asn["area_id"], "max_lat"].to_numpy(),
                "a_lon0": bx.loc[asn["area_id"], "min_lon"].to_numpy(),
                "a_lon1": bx.loc[asn["area_id"], "max_lon"].to_numpy(),
            }
        ).sort_values(["lat_idx", "lon_idx", "a_lat0", "a_lon0"]).reset_index(drop=True)
        return pa.Table.from_pandas(out, preserve_index=False)

    def geo_join_tiled(sf_dir):
        """Out-of-core tiled join (``geo_join_pages_tiled``): the polygon
        side is read lazily per shuffle group from tile partitions on
        disk — never held whole in driver or object-store memory. Must
        match the broadcast join row-for-row (same SQL oracle as
        ``geo_join_full``)."""
        import tempfile

        import ray.data as rd2

        from osm_jigsaw_ray.pipelines.areas import areas_dataset_from_df
        from osm_jigsaw_ray.pipelines.pages import geo_join_pages_tiled
        from osm_jigsaw_ray.pipelines.tiling import (
            assign_area_tiles,
            tile_graph_edges,
            write_tiles,
        )
        from osm_jigsaw_ray.stages.pip import build_knn_side

        pack, areas_df, edges_df = _polygon_side()
        if "tiles_root" not in _CACHE:
            tiles = tempfile.mkdtemp(prefix="ray_jigsaw_tiles_")
            assignments = assign_area_tiles(
                areas_dataset_from_df(areas_df), precision=2
            )
            write_tiles(
                areas_df,
                tile_graph_edges(
                    rd2.from_pandas(edges_df), assignments, join_partitions=4
                ),
                pack["taggings"],
                tiles,
            )
            _CACHE["tiles_root"] = tiles
        pages = pages_from_documents(sf_dir)
        df = (
            geo_join_pages_tiled(
                pages,
                _CACHE["tiles_root"],
                build_knn_side(pack),
                tiles_precision=2,
                hot_cell_threshold=200,
                hot_detect_sample=0.5,
            )
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        return pa.table(
            {
                "doc_id": pa.array(df["doc_id"], pa.int64()),
                "cell_id": pa.array(df["cell_id"], pa.string()),
                "n_areas": pa.array(df["area_ids"].map(len), pa.int64()),
                "name": pa.array(df["name"], pa.string()),
            }
        )

    def geo_holes_pip(sf_dir):
        """Opt-in hole-aware PIP (``resolve_area_holes`` +
        ``attach_holes``): a deterministic donut world — Parent
        (-20..20), Donut outer (-6..6) with hole (-1.5..1.5), Island
        (-0.6..0.6) nested in the hole — joined against the page
        points. Per page: how many areas contain it under hole-aware
        semantics (the donut excludes its hole's closure; the island
        inside the hole stays reachable). Oracle = pure box
        arithmetic."""
        if "holes_joiner" not in _CACHE:
            import ray.data as rd2

            from osm_jigsaw_ray.fixtures import _Builder
            from osm_jigsaw_ray.model import (
                NODES_SCHEMA,
                RELATIONS_SCHEMA,
                WAYS_SCHEMA,
            )
            from osm_jigsaw_ray.pipelines.areas import (
                areas_dataset_from_df as _ads,
                resolve_area_holes,
                resolve_areas,
            )
            from osm_jigsaw_ray.pipelines.graph import build_graph_edges as _bge
            from osm_jigsaw_ray.stages.pip import (
                PipJoiner,
                attach_holes,
                build_area_pack,
            )

            b = _Builder()
            b.closed_way_box((-20.0, 20.0, -20.0, 20.0), {"name": "Parent"})
            outer = b.box_ways_split((-6.0, 6.0, -6.0, 6.0), n_splits=2)
            inner = b.box_ways_split((-1.5, 1.5, -1.5, 1.5), n_splits=2)
            b.relation(
                [(w, "way", "outer") for w in outer]
                + [(w, "way", "inner") for w in inner],
                {"name": "Donut"},
            )
            b.closed_way_box((-0.6, 0.6, -0.6, 0.6), {"name": "Island"})
            nodes = rd2.from_arrow(pa.Table.from_pylist(b.nodes, schema=NODES_SCHEMA))
            ways = rd2.from_arrow(pa.Table.from_pylist(b.ways, schema=WAYS_SCHEMA))
            rels = rd2.from_arrow(
                pa.Table.from_pylist(b.relations, schema=RELATIONS_SCHEMA)
            )
            adf = resolve_areas(nodes, ways, rels, join_partitions=4).to_pandas()
            edf = _bge(_ads(adf), precision=1, join_partitions=4).to_pandas()
            holes = resolve_area_holes(nodes, ways, rels, join_partitions=4)
            hp = attach_holes(build_area_pack(adf, edf, {}), holes)
            _CACHE["holes_joiner"] = PipJoiner(hp, name_results=False)
        joiner = _CACHE["holes_joiner"]
        df = _joined(sf_dir)
        batch = pa.table(
            {
                "lat": pa.array(df["lat"], pa.float64()),
                "lon": pa.array(df["lon"], pa.float64()),
                "lang": pa.array([None] * len(df), pa.string()),
            }
        )
        rows = joiner(batch)
        return pa.table(
            {
                "doc_id": pa.array(df["doc_id"], pa.int64()),
                "n_areas": pa.array(
                    [len(a) for a in rows["area_ids"].to_pylist()], pa.int64()
                ),
            }
        )

    def geo_graph_edges(sf_dir):
        """C5: containment DAG as (parent_size, child_size) pairs — sizes
        are exact box areas, so the DAG shape is SQL-checkable from the
        boxes alone (ids are content hashes the oracle can't compute)."""
        pack, areas_df, edges_df = _polygon_side()
        sizes = dict(zip(areas_df["area_id"], areas_df["area"]))
        e = edges_df[edges_df["parent_area_id"] != -1]
        out = pd.DataFrame(
            {
                "parent_area": [float(sizes[p]) for p in e["parent_area_id"]],
                "child_area": [float(sizes[c]) for c in e["child_area_id"]],
            }
        ).sort_values(["parent_area", "child_area"]).reset_index(drop=True)
        return pa.Table.from_pandas(out, preserve_index=False)

    def geo_dump_names(sf_dir):
        """C10: whole-graph leaf naming dump (rows-only; naming strings
        are not SQL-expressible)."""
        from osm_jigsaw_ray.pipelines.dump import dump_names

        pack, _, _ = _polygon_side()
        df = dump_names(pack).to_pandas().sort_values("leaf_area_id")
        return pa.table(
            {
                "leaf_area_id": pa.array(df["leaf_area_id"], pa.int64()),
                "name": pa.array(df["name"], pa.string()),
            }
        )

    def geo_graph_depths(sf_dir):
        """North-star 'iterative groupby-aggregate … topological sort of
        the containment DAG': per-area nesting depth (longest root→area
        path) via Bellman-Ford frontier rounds
        (``graph.topological_depths``). Areas are reported by planar
        size — same identification trick as ``geo_graph_edges``."""
        from osm_jigsaw_ray.pipelines.graph import topological_depths

        _, areas_df, edges_df = _polygon_side()
        d = topological_depths(rd.from_pandas(edges_df), num_partitions=4).to_pandas()
        sizes = dict(zip(areas_df["area_id"], areas_df["area"]))
        out = pd.DataFrame(
            {
                "area": d["area_id"].map(sizes).astype("float64"),
                "depth": d["depth"].astype("int64"),
            }
        ).sort_values(["area", "depth"]).reset_index(drop=True)
        return pa.Table.from_pandas(out, preserve_index=False)

    def geo_raster_runs(sf_dir):
        """Raster↔vector, forward direction: the PIP-descent leaf label
        + containment depth sampled on the 1° grid, RLE-run-encoded
        (``pipelines/raster.py``). The leaf is reported by its planar
        area (ids are content hashes the oracle can't compute); run
        boundaries are value-reproducible — pinned by
        ``tests/test_raster.py::test_value_keyed_runs_match_id_keyed``."""
        runs, _ = _raster_side()
        _, areas_df, _ = _polygon_side()
        sizes = dict(zip(areas_df["area_id"], areas_df["area"]))
        out = pd.DataFrame(
            {
                "pix_row": runs["pix_row"].astype("int64"),
                "col_lo": runs["col_lo"].astype("int64"),
                "col_hi": runs["col_hi"].astype("int64"),
                "leaf_area": runs["area_id"].map(sizes).astype("float64"),
                "n_areas": runs["n_areas"].astype("int64"),
            }
        )
        return pa.Table.from_pandas(out, preserve_index=False)

    def geo_raster_polygonize(sf_dir):
        """Raster↔vector, reverse direction: greedy maximal-rectangle
        polygonization of the label raster (vertical merge of
        identical-span runs)."""
        from osm_jigsaw_ray.pipelines.raster import polygonize_runs

        runs, _ = _raster_side()
        _, areas_df, _ = _polygon_side()
        sizes = dict(zip(areas_df["area_id"], areas_df["area"]))
        rects = polygonize_runs(rd.from_pandas(runs), num_partitions=8).to_pandas()
        out = pd.DataFrame(
            {
                "leaf_area": rects["area_id"].map(sizes).astype("float64"),
                "n_areas": rects["n_areas"].astype("int64"),
                "row_lo": rects["row_lo"].astype("int64"),
                "row_hi": rects["row_hi"].astype("int64"),
                "col_lo": rects["col_lo"].astype("int64"),
                "col_hi": rects["col_hi"].astype("int64"),
            }
        ).sort_values(["leaf_area", "col_lo", "row_lo"]).reset_index(drop=True)
        return pa.Table.from_pandas(out, preserve_index=False)

    # ---- S2 cell index (the north rule's H3/S2 index) ---------------------
    def _points_ds(sf_dir):
        """Page points as a Dataset (doc_id, lat, lon) — same derivation
        as the join pipeline's extracted coordinates (`_PTS_SQL`)."""
        import ray.data as rd

        from osm_jigsaw_ray.fixtures import page_points

        docs = rd.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id"]
        )

        def pts(batch: pa.Table) -> pa.Table:
            ids = batch["doc_id"].to_numpy(zero_copy_only=False)
            lat, lon = page_points(ids)
            return pa.table(
                {
                    "doc_id": pa.array(ids, pa.int64()),
                    "lat": pa.array(lat, pa.float64()),
                    "lon": pa.array(lon, pa.float64()),
                }
            )

        return docs.map_batches(pts, batch_format="pyarrow")

    def geo_s2_cells(sf_dir):
        """Batched S2 encode (level 12): canonical cell id per page,
        emitted decomposed (face + Hilbert position; int64 can't hold
        the uint64 id) plus the canonical token. The oracle replays the
        full pipeline — cube face, quadratic st, Hilbert walk — in pure
        SQL with the 1024-entry lookup table as a VALUES CTE."""
        from osm_jigsaw_ray.pipelines.cells import s2_cells_for_points

        return s2_cells_for_points(_points_ds(sf_dir), level=12).select_columns(
            ["doc_id", "s2_face", "s2_pos", "s2_token"]
        )

    def geo_s2_cover(sf_dir):
        """Compact S2 cell cover of the page corpus: normalized cell
        union (dedup + recursive 4-sibling collapse) of every page's
        level-12 cell. Oracle: same collapse unrolled as 12 SQL steps."""
        from osm_jigsaw_ray.pipelines.cells import s2_corpus_cover

        return s2_corpus_cover(_points_ds(sf_dir), level=12, shard_level=4)

    # ---- relational family ------------------------------------------------
    def rel_count_by_lang(sf_dir):
        return relational.count_by_lang(_docs(sf_dir))

    def rel_lineitem_pricing(sf_dir):
        return relational.lineitem_pricing(
            rd.read_parquet(f"{sf_dir}/lineitem.parquet")
        )

    def rel_segment_revenue(sf_dir):
        return relational.segment_revenue(
            rd.read_parquet(f"{sf_dir}/orders.parquet"),
            rd.read_parquet(f"{sf_dir}/customer.parquet"),
        )

    def rel_top_parts(sf_dir):
        return relational.top_parts(rd.read_parquet(f"{sf_dir}/part.parquet"))

    def rel_regional_revenue(sf_dir):
        """TPC-H Q5 shape: local-supplier revenue per nation of one
        region (broadcast dims + two hash joins, exact cents)."""
        return relational.regional_revenue(
            rd.read_parquet(f"{sf_dir}/lineitem.parquet"),
            rd.read_parquet(f"{sf_dir}/orders.parquet"),
            rd.read_parquet(f"{sf_dir}/customer.parquet"),
            rd.read_parquet(f"{sf_dir}/supplier.parquet"),
            rd.read_parquet(f"{sf_dir}/nation.parquet"),
            rd.read_parquet(f"{sf_dir}/region.parquet"),
            region_name="EUROPE",
        )

    def rel_events_hourly(sf_dir):
        return relational.events_hourly(rd.read_parquet(f"{sf_dir}/events.parquet"))

    def rel_events_sessions(sf_dir):
        return relational.events_sessions(rd.read_parquet(f"{sf_dir}/events.parquet"))

    def rel_events_asof(sf_dir):
        """As-of join: each non-click event ⟕ most recent click by the
        same user at or before it (inner; DuckDB ASOF JOIN oracle)."""
        return relational.events_asof_join(
            rd.read_parquet(f"{sf_dir}/events.parquet")
        )

    def rel_events_sliding(sf_dir):
        """Sliding-window aggregate: per event, same-user count + cents
        sum over the trailing 3-hour RANGE frame (searchsorted +
        prefix-sum per co-partitioned user segment)."""
        return relational.events_sliding_window(
            rd.read_parquet(f"{sf_dir}/events.parquet")
        )

    # ---- training-data ops ------------------------------------------------
    def ml_exact_dedup(sf_dir):
        # exact_dedup returns (content_hash, doc_id); project to the
        # (doc_id,) representatives the SQL GROUP BY text oracle yields
        df = mlops.exact_dedup(_docs(sf_dir)).to_pandas()
        return pa.table({"doc_id": pa.array(sorted(df["doc_id"]), pa.int64())})

    def ml_fingerprint(sf_dir):
        return mlops.fingerprint_md5(_docs(sf_dir))

    def ml_text_stats(sf_dir):
        return mlops.text_stats(_docs(sf_dir))

    def ml_langid(sf_dir):
        return mlops.language_id(_docs(sf_dir))

    def ml_ann_topk(sf_dir):
        return mlops.ann_cosine_topk(
            rd.read_parquet(f"{sf_dir}/embeddings.parquet"), query_ids=[0, 1, 2], k=10
        )

    def ml_lsh_ann(sf_dir):
        return mlops.lsh_bucketed_ann(
            rd.read_parquet(f"{sf_dir}/embeddings.parquet"), query_ids=[0, 1, 2], k=10
        )

    # planted-duplicate corpora: copies of every 10th row under
    # doc_id/vec_id + PLANT_OFFSET give the dedup pipelines a non-empty,
    # SQL-recomputable ground truth (the oracle derives the same planted
    # rows with a UNION ALL; the original tables hold no exact dups —
    # verified empirically, max distinct-vector cosine 0.51)
    PLANT_OFFSET = 10_000_000

    def _docs_planted(sf_dir):
        slim = _docs(sf_dir).select_columns(["doc_id", "text"])

        def plant(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            ids = batch["doc_id"].to_numpy(zero_copy_only=False)
            sub = batch.filter(pa.array(ids % 10 == 0))
            return pa.table(
                {
                    "doc_id": pc.add(sub["doc_id"], PLANT_OFFSET),
                    "text": sub["text"],
                }
            )

        return slim.union(slim.map_batches(plant, batch_format="pyarrow"))

    def _embeddings_planted(sf_dir):
        emb = rd.read_parquet(
            f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
        )

        def plant(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            ids = batch["vec_id"].to_numpy(zero_copy_only=False)
            sub = batch.filter(pa.array(ids % 10 == 0))
            return pa.table(
                {
                    "vec_id": pc.add(sub["vec_id"], PLANT_OFFSET),
                    "embedding": sub["embedding"],
                }
            )

        return emb.union(emb.map_batches(plant, batch_format="pyarrow"))

    def ml_ivf_ann(sf_dir):
        """IVF-flat ANN with deterministic seed centroids (first 16
        vectors): assignments and probes are pure arithmetic, so the
        oracle recomputes the exact candidate lists and ranking."""
        return mlops.ivf_ann(
            rd.read_parquet(f"{sf_dir}/embeddings.parquet"),
            query_ids=[0, 1, 2],
            k=10,
            n_lists=16,
            nprobe=2,
        )

    def ml_minhash_dedup(sf_dir):
        """MinHash-signature dedup over the planted corpus: full-signature
        LSH buckets + exact shingle-set verify (oracle: GROUP BY the
        sorted-distinct shingle list)."""
        return mlops.minhash_signature_dedup(_docs_planted(sf_dir))

    def ml_minhash_neardup(sf_dir):
        """Banded MinHash+LSH near-dup at Jaccard ≥ 0.7 with exact verify
        and distributed min-label clustering. Strict oracle: the verify
        stage is exact, so output ⊆ (true Jaccard≥0.7 pairs → connected
        components); equality needs band recall 1.0, which holds on the
        test corpora — every true pair there has J ≥ 0.9, where one of
        the 16 4-row bands misses with probability (1-0.9⁴)¹⁶ ≈ 4e-8,
        and the seeds are fixed. The oracle recomputes exact-Jaccard
        pairs + a recursive-CTE closure."""
        return mlops.minhash_lsh_dedup(_docs(sf_dir), threshold=0.7)

    def ml_simhash(sf_dir):
        return mlops.simhash_signatures(_docs(sf_dir))

    def ml_simhash_neardup(sf_dir):
        """SimHash near-dup pairs at hamming ≤ 3 on the NATURAL corpus —
        4-band pigeonhole makes candidate recall provably 1.0 there, so
        the all-pairs bit_count SQL oracle is exact."""
        return mlops.simhash_near_dup(_docs(sf_dir), max_hamming=3)

    def ml_embed_neardup(sf_dir):
        """Embedding near-dup over the planted corpus (hyperplane-LSH
        buckets + cosine verify + distributed clustering); at threshold
        0.95 ground truth = identical-vector classes (max distinct-pair
        cosine in the corpus is ~0.51), which SQL recomputes by grouping
        on the vector value."""
        return mlops.embedding_near_dup(_embeddings_planted(sf_dir), threshold=0.95)

    def ml_semantic_dedup(sf_dir):
        """SemDeDup (coarse clusters + within-cluster cosine dedup) over
        the planted corpus. Deterministic seed centroids (ivf_ann's) make
        every cluster id SQL-recomputable; at threshold 0.95 the drop set
        is exactly the planted copies (max distinct-pair cosine ~0.51),
        and identical vectors always share a cluster."""
        return mlops.semantic_dedup(
            _embeddings_planted(sf_dir), n_clusters=16, threshold=0.95
        )

    def ml_kmeans(sf_dir):
        """Distributed Lloyd k-means (k=8, 2 iterations) + assignment.
        trunc6-truncated centroids after each iteration make the
        ITERATIVE fit bit-reproducible, so the oracle unrolls both
        Lloyd steps in SQL (AVG per (cluster, dim) + list_transform
        FLOOR) and recomputes every assignment exactly."""
        emb = rd.read_parquet(
            f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
        )
        cents = mlops.kmeans_fit(emb, k=8, iters=2)
        return mlops.kmeans_assign(emb, cents).sort("vec_id")

    def ml_decontaminate(sf_dir):
        """Train/test overlap decontamination: train = doc_id % 10 != 0,
        test = the rest; a train doc is contaminated iff it shares a
        5-token shingle with any test doc (5 chosen because it is
        discriminative on this corpus: ~2% contaminated, vs ~94% at 3).
        Exact semantics, so the SQL oracle is a shingle semi-join."""

        def split(is_test):
            def fn(b: pa.Table) -> pa.Table:
                ids = b["doc_id"].to_numpy(zero_copy_only=False)
                mask = (ids % 10 == 0) if is_test else (ids % 10 != 0)
                return b.filter(pa.array(mask))

            return fn

        docs = _docs(sf_dir).select_columns(["doc_id", "text"])
        return mlops.decontaminate(
            docs.map_batches(split(False), batch_format="pyarrow"),
            docs.map_batches(split(True), batch_format="pyarrow"),
            shingle_k=5,
        )

    def ml_gopher_repetition(sf_dir):
        """Within-doc duplicate-3-gram fraction + Gopher-style flag."""
        return mlops.gopher_repetition(_docs(sf_dir), shingle_k=3).sort(
            "doc_id"
        )

    def ml_pii_scrub(sf_dir):
        """Email/phone redaction over a corpus with PII planted on every
        7th doc (deterministic suffix, mirrored in the oracle's CASE)."""
        docs = _docs(sf_dir).select_columns(["doc_id", "text"])

        def plant(b: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            ids = b["doc_id"].to_numpy(zero_copy_only=False)
            text = pc.fill_null(b["text"].combine_chunks(), "")
            suf = pa.array(
                [
                    f" contact a{int(i)}@ex.com or 555-123-4567"
                    if i % 7 == 0
                    else ""
                    for i in ids
                ],
                pa.string(),
            )
            return pa.table(
                {
                    "doc_id": b["doc_id"],
                    "text": pc.binary_join_element_wise(text, suf, ""),
                }
            )

        return mlops.pii_scrub(
            docs.map_batches(plant, batch_format="pyarrow")
        ).sort("doc_id")

    def ml_balanced_sample(sf_dir):
        """Cluster-balanced diversity sample: Lloyd k-means (k=8, 2
        iterations, the ml_kmeans fit) then the 20 smallest vec_ids per
        cluster."""
        emb = rd.read_parquet(
            f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
        )
        cents = mlops.kmeans_fit(emb, k=8, iters=2)
        return mlops.cluster_balanced_sample(emb, cents, per_cluster=20)

    def ml_dsir(sf_dir):
        """DSIR importance scores: target distribution = the English
        subset, raw = the whole corpus; int64-scaled log-ratio scores
        so the oracle's SUM is order-free (exact integer arithmetic)."""
        import pyarrow.compute as pc

        docs = _docs(sf_dir).select_columns(["doc_id", "text", "lang"])

        def tgt(b: pa.Table) -> pa.Table:
            return b.filter(pc.equal(b["lang"], "en"))

        target = docs.map_batches(tgt, batch_format="pyarrow")
        return mlops.dsir_scores(
            docs.select_columns(["doc_id", "text"]),
            target.select_columns(["doc_id", "text"]),
        ).sort("doc_id")

    def ml_pack_sequences(sf_dir):
        """Greedy sequence packing, partition-scoped (doc_id // 100
        ranges, 256-token budget); the oracle replays the greedy fold
        with a recursive CTE."""
        return mlops.pack_sequences(
            _docs(sf_dir), max_tokens=256, partition_size=100
        )

    def ml_winnowing(sf_dir):
        """Winnowing fingerprints, exploded to (doc_id, fingerprint) rows
        (md5-based k-gram hashes — SQL recomputes them exactly)."""
        ds = mlops.winnowing_fingerprints(_docs(sf_dir))

        def explode(batch: pa.Table) -> pa.Table:
            col = batch["fingerprints"].combine_chunks()
            n_per = np.diff(np.asarray(col.offsets))
            ids = np.repeat(
                batch["doc_id"].to_numpy(zero_copy_only=False), n_per
            )
            return pa.table(
                {
                    "doc_id": pa.array(ids, pa.int64()),
                    "fingerprint": col.values,
                }
            )

        return ds.map_batches(explode, batch_format="pyarrow")

    def ml_ngram_jaccard(sf_dir):
        """Exact n-gram Jaccard over consecutive doc-id pairs (rows-only:
        shingle hashing is not SQL-expressible)."""
        n = _docs(sf_dir).count()
        pairs = [(i, i + 1) for i in range(0, n - 1, 2)]
        return mlops.ngram_jaccard_pairs(_docs(sf_dir), pairs)

    def ml_tfidf(sf_dir):
        """Two-pass MapReduce TF-IDF: vocabulary-shuffled document
        frequencies, broadcast idf, per-doc in-batch top-5 (smooth idf,
        ties to the smaller term)."""
        return mlops.tfidf_top_terms(_docs(sf_dir), k=5)

    def ml_corpus_split(sf_dir):
        """Deterministic hash-based train/val/test split (stratified in
        expectation, shuffle-free)."""
        return mlops.corpus_split(_docs(sf_dir))

    def ml_length_quantiles(sf_dir):
        """Exact distributed doc-length quantiles via value-histogram
        aggregation (smallest value with cum count ≥ ceil(q·n))."""
        return mlops.length_quantiles(_docs(sf_dir))

    def ml_top_bigrams(sf_dir):
        """Corpus n-gram statistics: global top-20 token bigrams
        (in-batch partials → vocabulary-hashed sum → tiny sort-limit)."""
        return mlops.top_bigrams(_docs(sf_dir), k=20)

    def ml_curate(sf_dir):
        """Fused curation pipeline: quality gate (in-batch, text never
        shipped) → exact dedup (16-byte-key shuffle) → hash split."""
        return mlops.curate_corpus(_docs(sf_dir))

    # ---- multimodal plumbing ---------------------------------------------
    def mm_image_meta(sf_dir):
        docs = _docs(sf_dir).select_columns(["doc_id"])

        def synth(batch: pa.Table) -> pa.Table:
            ids = batch["doc_id"].to_pylist()
            return pa.table(
                {
                    "media_id": pa.array(ids, pa.int64()),
                    "payload": pa.array(
                        [
                            encode_fake_image(i, 64 + i % 32, 48 + i % 16)
                            for i in ids
                        ],
                        pa.binary(),
                    ),
                    "media_type": pa.array(["image/fake"] * len(ids), pa.string()),
                }
            )

        media = docs.map_batches(synth, batch_format="pyarrow")
        return decode_images(media, concurrency=2)

    def mm_frame_sample(sf_dir):
        """Video frame-sampling plumbing: every 10th frame of synthetic
        per-doc clips → (media_id, frame_index, width, height) rows, all
        arithmetic-derivable by the oracle (frame payload values are
        codec-internal and dropped)."""
        from osm_jigsaw_ray.stages.multimodal import (
            encode_fake_video,
            sample_video_frames,
        )

        docs = _docs(sf_dir).select_columns(["doc_id"])

        def synth(batch: pa.Table) -> pa.Table:
            ids = batch["doc_id"].to_pylist()
            return pa.table(
                {
                    "media_id": pa.array(ids, pa.int64()),
                    "payload": pa.array(
                        [
                            encode_fake_video(i, 30 + i % 60, 320, 240)
                            for i in ids
                        ],
                        pa.binary(),
                    ),
                }
            )

        media = docs.map_batches(synth, batch_format="pyarrow")
        return sample_video_frames(media, stride=10, concurrency=2).select_columns(
            ["media_id", "frame_index", "width", "height"]
        )

    def mm_audio_features(sf_dir):
        """Audio feature plumbing: synthetic clips with ARITHMETIC
        samples (so the SQL oracle recomputes duration/rms/zero
        crossings exactly) through the actor-pool featurizer."""
        import struct as _struct

        from osm_jigsaw_ray.stages.multimodal import FAKE_AUDIO_MAGIC, audio_features

        docs = _docs(sf_dir).select_columns(["doc_id"])

        def synth(batch: pa.Table) -> pa.Table:
            ids = batch["doc_id"].to_pylist()
            payloads = []
            for i in ids:
                n = 200 + i % 100
                s = (
                    ((np.int64(i) * 31 + np.arange(n, dtype=np.int64) * 7) % 65536)
                    - 32768
                ).astype(np.int16)
                payloads.append(
                    FAKE_AUDIO_MAGIC + _struct.pack("<II", n, 16000) + s.tobytes()
                )
            return pa.table(
                {
                    "media_id": pa.array(ids, pa.int64()),
                    "payload": pa.array(payloads, pa.binary()),
                }
            )

        media = docs.map_batches(synth, batch_format="pyarrow")
        return audio_features(media, concurrency=2)

    return {
        "geo_extract_text": geo_extract_text,
        "geo_pip_contains": geo_pip_contains,
        "geo_knn_fallback": geo_knn_fallback,
        "geo_join_full": geo_join_full,
        "geo_join_partitioned": geo_join_partitioned,
        "geo_join_tiled": geo_join_tiled,
        "geo_holes_pip": geo_holes_pip,
        "geo_tile_assign": geo_tile_assign,
        "geo_graph_edges": geo_graph_edges,
        "geo_dump_names": geo_dump_names,
        "geo_graph_depths": geo_graph_depths,
        "geo_raster_runs": geo_raster_runs,
        "geo_raster_polygonize": geo_raster_polygonize,
        "geo_s2_cells": geo_s2_cells,
        "geo_s2_cover": geo_s2_cover,
        "rel_count_by_lang": rel_count_by_lang,
        "rel_lineitem_pricing": rel_lineitem_pricing,
        "rel_segment_revenue": rel_segment_revenue,
        "rel_regional_revenue": rel_regional_revenue,
        "rel_top_parts": rel_top_parts,
        "rel_events_hourly": rel_events_hourly,
        "rel_events_sessions": rel_events_sessions,
        "rel_events_asof": rel_events_asof,
        "rel_events_sliding": rel_events_sliding,
        "ml_exact_dedup": ml_exact_dedup,
        "ml_fingerprint": ml_fingerprint,
        "ml_text_stats": ml_text_stats,
        "ml_langid": ml_langid,
        "ml_ann_topk": ml_ann_topk,
        "ml_lsh_ann": ml_lsh_ann,
        "ml_ivf_ann": ml_ivf_ann,
        "ml_minhash_dedup": ml_minhash_dedup,
        "ml_minhash_neardup": ml_minhash_neardup,
        "ml_simhash": ml_simhash,
        "ml_simhash_neardup": ml_simhash_neardup,
        "ml_embed_neardup": ml_embed_neardup,
        "ml_semantic_dedup": ml_semantic_dedup,
        "ml_kmeans": ml_kmeans,
        "ml_decontaminate": ml_decontaminate,
        "ml_gopher_repetition": ml_gopher_repetition,
        "ml_pii_scrub": ml_pii_scrub,
        "ml_balanced_sample": ml_balanced_sample,
        "ml_dsir": ml_dsir,
        "ml_pack_sequences": ml_pack_sequences,
        "ml_winnowing": ml_winnowing,
        "ml_ngram_jaccard": ml_ngram_jaccard,
        "ml_tfidf": ml_tfidf,
        "ml_corpus_split": ml_corpus_split,
        "ml_curate": ml_curate,
        "ml_top_bigrams": ml_top_bigrams,
        "ml_length_quantiles": ml_length_quantiles,
        "mm_image_meta": mm_image_meta,
        "mm_frame_sample": mm_frame_sample,
        "mm_audio_features": mm_audio_features,
    }


# ---------------------------------------------------------------------------
# oracle SQL
# ---------------------------------------------------------------------------

def _boxes_values_sql() -> str:
    rows = []
    for name in AREA_BOX_NAMES:
        lat0, lat1, lon0, lon1 = BOXES[name]
        area = float(lat1 - lat0) * float(lon1 - lon0)
        rows.append(
            f"({float(lat0)}, {float(lat1)}, {float(lon0)}, {float(lon1)}, {area})"
        )
    return (
        "boxes(lat0, lat1, lon0, lon1, area) AS (VALUES " + ", ".join(rows) + ")"
    )


# page-point CTE mirroring osm_jigsaw_ray.fixtures.page_points exactly
# (same integer mixing, same float expression structure)
_PTS_SQL = """
pts AS (
  SELECT doc_id,
    CAST((doc_id*2654435761+12345) % 4294967296 AS DOUBLE)/4294967296.0 AS u,
    CAST((doc_id*97+13) % 1000 AS DOUBLE)/1000.0 AS ju,
    CAST((doc_id*193+29) % 1000 AS DOUBLE)/1000.0 AS jv
  FROM documents
),
pp AS (
  SELECT doc_id, u,
    CASE
      WHEN u < 0.35 THEN 30.0+0.05 + ju*(31.0-30.0-2*0.05)
      WHEN u < 0.50 THEN -1.0+0.1 + ju*(1.0-(-1.0)-2*0.1)
      WHEN u < 0.60 THEN 1.2 + ju*0.6
      WHEN u < 0.70 THEN 25.0+0.1 + ju*(30.0-25.0-2*0.1)
      WHEN u < 0.80 THEN 21.0 + ju*18.0
      WHEN u < 0.90 THEN -50.0+0.5 + ju*(-40.0-(-50.0)-2*0.5)
      ELSE 80.0 + ju*5.0
    END AS lat,
    CASE
      WHEN u < 0.35 THEN 120.0+0.05 + jv*(121.0-120.0-2*0.05)
      WHEN u < 0.50 THEN -1.0+0.1 + jv*(1.0-(-1.0)-2*0.1)
      WHEN u < 0.60 THEN -1.8 + jv*3.6
      WHEN u < 0.70 THEN -28.0+0.1 + jv*(-22.0-(-28.0)-2*0.1)
      WHEN u < 0.80 THEN -39.0 + jv*8.0
      WHEN u < 0.90 THEN 100.0+0.5 + jv*(110.0-100.0-2*0.5)
      ELSE 160.0 + jv*15.0
    END AS lon
  FROM pts
)
"""

# --- S2 oracle SQL (generated): replays osm_jigsaw_ray.s2.s2_encode
# bit for bit — cube face via CASE, quadratic uv->st, Hilbert walk via
# the same 1024-entry lookup table injected as a VALUES CTE. numpy and
# DuckDB trig are bit-identical here (asserted in tests), and the cell
# quantization at level 12 leaves ~2^-40 relative headroom, so the
# token comparison is exact, not approximate.


def _s2_lut_sql() -> str:
    from osm_jigsaw_ray.s2 import LOOKUP_POS

    rows = ",".join(f"({k},{int(v)})" for k, v in enumerate(LOOKUP_POS))
    return f"s2lut(k, v) AS (VALUES {rows})"


def _s2_encode_sql(level: int = 12) -> str:
    """CTE chain from ``pp`` (doc_id, lat, lon) to ``s2c`` (doc_id,
    face, pos) at ``level`` (must be a multiple of 4: the Hilbert walk
    runs in 4-bit lookup steps)."""
    assert level % 4 == 0 and 0 < level <= 28
    n = 1 << level
    sql = f"""s2xyz AS (
      SELECT doc_id,
             cos(radians(lat))*cos(radians(lon)) AS x,
             cos(radians(lat))*sin(radians(lon)) AS y,
             sin(radians(lat)) AS z
      FROM pp
    ),
    s2face AS (
      SELECT doc_id, x, y, z,
        CASE WHEN abs(x) > abs(y)
             THEN (CASE WHEN abs(x) > abs(z)
                        THEN (CASE WHEN x < 0 THEN 3 ELSE 0 END)
                        ELSE (CASE WHEN z < 0 THEN 5 ELSE 2 END) END)
             ELSE (CASE WHEN abs(y) > abs(z)
                        THEN (CASE WHEN y < 0 THEN 4 ELSE 1 END)
                        ELSE (CASE WHEN z < 0 THEN 5 ELSE 2 END) END)
        END AS face
      FROM s2xyz
    ),
    s2uv AS (
      SELECT doc_id, face,
        CASE face WHEN 0 THEN y/x WHEN 1 THEN -x/y WHEN 2 THEN -x/z
                  WHEN 3 THEN z/x WHEN 4 THEN z/y ELSE -y/z END AS u,
        CASE face WHEN 0 THEN z/x WHEN 1 THEN z/y WHEN 2 THEN -y/z
                  WHEN 3 THEN y/x WHEN 4 THEN -x/y ELSE -x/z END AS v
      FROM s2face
    ),
    s2ij AS (
      SELECT doc_id, face,
        LEAST(GREATEST(CAST(FLOOR((CASE WHEN u >= 0 THEN 0.5*sqrt(1+3*u)
            ELSE 1-0.5*sqrt(1-3*u) END) * {n}) AS BIGINT), 0), {n - 1}) AS i,
        LEAST(GREATEST(CAST(FLOOR((CASE WHEN v >= 0 THEN 0.5*sqrt(1+3*v)
            ELSE 1-0.5*sqrt(1-3*v) END) * {n}) AS BIGINT), 0), {n - 1}) AS j
      FROM s2uv
    ),
    s2h0 AS (SELECT doc_id, face, i, j, (face & 1) AS bits,
                    CAST(0 AS BIGINT) AS pos FROM s2ij),"""
    steps = level // 4
    for s in range(steps):
        k = steps - 1 - s
        sql += f"""
    s2h{s + 1} AS (
      SELECT h.doc_id, h.face, h.i, h.j, (l.v & 3) AS bits,
             h.pos * 256 + (l.v >> 2) AS pos
      FROM s2h{s} h JOIN s2lut l
        ON l.k = h.bits + ((h.i >> {4 * k}) & 15) * 64
                        + ((h.j >> {4 * k}) & 15) * 4
    ),"""
    sql += f"""
    s2c AS (SELECT doc_id, face, pos FROM s2h{steps})"""
    return sql


def _s2_cover_sql(level: int = 12) -> str:
    """Distinct cells of ``s2c`` + the 4-sibling collapse unrolled one
    step per level (a formed parent implies its 4 children existed as
    disjoint cells, so no containment-drop pass is needed — the set
    stays disjoint throughout)."""
    # MATERIALIZED is load-bearing: each step references the previous
    # level twice, and inlined CTEs would expand 2^level times
    sql = (
        f"c{level} AS MATERIALIZED "
        f"(SELECT DISTINCT face, {level} AS lvl, pos FROM s2c),"
    )
    for l in range(level, 0, -1):
        sql += f"""
    q{l} AS MATERIALIZED (
      SELECT face, pos // 4 AS ppos FROM c{l} WHERE lvl = {l}
      GROUP BY face, pos // 4 HAVING COUNT(*) = 4),
    c{l - 1} AS MATERIALIZED (
      SELECT face, {l - 1} AS lvl, ppos AS pos FROM q{l}
      UNION ALL
      SELECT c.face, c.lvl, c.pos FROM c{l} c
      WHERE c.lvl <> {l} OR NOT EXISTS (
        SELECT 1 FROM q{l} q WHERE q.face = c.face AND q.ppos = c.pos // 4)
    ),"""
    return sql.rstrip(",")


def _s2_token_case_sql() -> str:
    """Canonical token from (face, lvl, pos) in BIGINT-only arithmetic:
    the id's low 60-2*lvl bits are zeros past the marker, so the token
    equals hex(id >> 4*floor(tz/4)) left-padded to 16 - tz//4 digits."""
    whens = []
    for lvl in range(0, 13):
        tz = 60 - 2 * lvl
        shift = 4 * (tz // 4)
        width = 16 - tz // 4
        cf = 1 << (61 - shift)
        cp = 1 << (61 - 2 * lvl - shift)
        cm = 1 << (60 - 2 * lvl - shift)
        whens.append(
            f"WHEN lvl = {lvl} THEN "
            f"lpad(lower(to_hex(face * {cf} + pos * {cp} + {cm})), {width}, '0')"
        )
    return "CASE " + " ".join(whens) + " END"


_STOPWORDS_SQL = (
    "('the','a','an','and','or','of','to','in','is','are','was','were',"
    "'be','been','on','at','by','for','with')"
)


# two unrolled Lloyd iterations over the embeddings table (k=8):
# assignment (argmin CTE, the ml_ivf_ann arithmetic) -> per-(cluster,dim)
# AVG -> trunc6 via list_transform FLOOR (matching mlops.kmeans_fit's
# truncation, which is what makes the iterative fit engine-reproducible);
# empty clusters keep the previous centroid (COALESCE). Ends with the
# final assignment CTE `af` — shared by ml_kmeans and ml_balanced_sample.
_KMEANS_ASSIGN_SQL = """
e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
c0 AS (SELECT vec_id AS cid, v AS c FROM e WHERE vec_id < 8),
a1 AS (
  SELECT vec_id, cid AS cluster FROM (
    SELECT e.vec_id, c.cid,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
             list_dot_product(e.v, e.v)
           - 2*list_dot_product(e.v, c.c)
           + list_dot_product(c.c, c.c), c.cid) AS rn
    FROM e CROSS JOIN c0 c
  ) WHERE rn = 1
),
s1 AS (
  SELECT a1.cluster AS cid, r.i AS i, AVG(e.v[r.i]) AS val
  FROM a1 JOIN e USING (vec_id), range(1, 65) r(i)
  GROUP BY a1.cluster, r.i
),
n1 AS (SELECT cid, list(val ORDER BY i) AS c FROM s1 GROUP BY cid),
c1 AS (
  SELECT c0.cid,
         list_transform(COALESCE(n1.c, c0.c),
                        x -> FLOOR(x * 1e6) / 1e6) AS c
  FROM c0 LEFT JOIN n1 USING (cid)
),
a2 AS (
  SELECT vec_id, cid AS cluster FROM (
    SELECT e.vec_id, c.cid,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
             list_dot_product(e.v, e.v)
           - 2*list_dot_product(e.v, c.c)
           + list_dot_product(c.c, c.c), c.cid) AS rn
    FROM e CROSS JOIN c1 c
  ) WHERE rn = 1
),
s2 AS (
  SELECT a2.cluster AS cid, r.i AS i, AVG(e.v[r.i]) AS val
  FROM a2 JOIN e USING (vec_id), range(1, 65) r(i)
  GROUP BY a2.cluster, r.i
),
n2 AS (SELECT cid, list(val ORDER BY i) AS c FROM s2 GROUP BY cid),
c2 AS (
  SELECT c1.cid,
         list_transform(COALESCE(n2.c, c1.c),
                        x -> FLOOR(x * 1e6) / 1e6) AS c
  FROM c1 LEFT JOIN n2 USING (cid)
),
af AS (
  SELECT vec_id, cid AS cluster FROM (
    SELECT e.vec_id, c.cid,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
             list_dot_product(e.v, e.v)
           - 2*list_dot_product(e.v, c.c)
           + list_dot_product(c.c, c.c), c.cid) AS rn
    FROM e CROSS JOIN c2 c
  ) WHERE rn = 1
)
"""

# shared shingle CTE: k=3 token shingles as strings, padded with NUL
# tokens for <3-token docs — mirrors mlops._token_shingles exactly
_SHINGLES_SQL = """
tk AS (SELECT doc_id, regexp_extract_all(lower(COALESCE(text, '')), '[a-z0-9]+') AS t
       FROM corpus),
tp AS (SELECT doc_id,
         CASE WHEN len(t) >= 3 THEN t ELSE list_resize(t, 3, chr(0)) END AS t
       FROM tk),
sh AS (SELECT doc_id,
         list_sort(list_distinct(
           [t[i] || ' ' || t[i+1] || ' ' || t[i+2]
            for i in range(1, len(t) - 1)])) AS s
       FROM tp)
"""


# raster runs CTE: per-pixel (smallest containing box area, containment
# depth) on the 1° grid, RLE-encoded per row via gaps-and-islands —
# replays osm_jigsaw_ray.pipelines.raster.rasterize_areas by value
# (grid centers sit on half-degrees, so < vs <= is immaterial against
# the integer-edged box catalog)
_RASTER_RUNS_SQL = """
px AS (
  SELECT i.i AS pix_row, j.j AS col_id,
         -90.0 + (i.i + 0.5) * 1.0 AS lat,
         -180.0 + (j.j + 0.5) * 1.0 AS lon
  FROM (SELECT unnest(range(0, 180)) AS i) i
  CROSS JOIN (SELECT unnest(range(0, 360)) AS j) j
),
lab AS (
  SELECT px.pix_row, px.col_id,
         MIN(b.area) AS leaf_area, COUNT(*) AS n_areas
  FROM px JOIN boxes b
    ON px.lat > b.lat0 AND px.lat < b.lat1
   AND px.lon > b.lon0 AND px.lon < b.lon1
  GROUP BY px.pix_row, px.col_id
),
isl AS (
  SELECT *, col_id - ROW_NUMBER() OVER (
           PARTITION BY pix_row, leaf_area, n_areas ORDER BY col_id) AS k
  FROM lab
),
runs AS (
  SELECT pix_row, MIN(col_id) AS col_lo, MAX(col_id) AS col_hi,
         leaf_area, n_areas
  FROM isl GROUP BY pix_row, leaf_area, n_areas, k
)
"""


def _lsh_planes_values_sql(num_planes: int = 8, dim: int = 64, seed: int = 99) -> str:
    """The lsh_bucketed_ann hyperplanes as a SQL VALUES literal — the
    same RandomState(seed) draw the engine uses, so the oracle computes
    identical double-precision bucket signs."""
    rng = np.random.RandomState(seed)
    planes = rng.randn(num_planes, dim)
    rows = []
    for j in range(num_planes):
        vals = ", ".join(repr(float(x)) for x in planes[j])
        rows.append(f"({j}, [{vals}]::DOUBLE[])")
    return "planes(pid, p) AS (VALUES " + ", ".join(rows) + ")"


from osm_jigsaw_ray.pipelines.mlops import _SPLIT_ADD, _SPLIT_MUL

_SPLIT_BOUNDS = [float(b) for b in np.cumsum([0.9, 0.05, 0.05])[:2]]


def oracle_sql() -> dict[str, str]:
    boxes = _boxes_values_sql()
    sql = {
        "geo_extract_text": "SELECT doc_id, text FROM documents",
        "geo_pip_contains": f"""
            WITH {_PTS_SQL.strip()}, {boxes}
            SELECT p.doc_id,
                   COUNT(b.area) AS n_areas,
                   MIN(b.area) AS smallest_area
            FROM pp p LEFT JOIN boxes b
              ON p.lat >= b.lat0 AND p.lat <= b.lat1
             AND p.lon >= b.lon0 AND p.lon <= b.lon1
            GROUP BY p.doc_id
        """,
        "geo_knn_fallback": f"""
            WITH {_PTS_SQL.strip()}, {boxes},
            ranked AS (
              SELECT p.doc_id,
                     (b.lat0+b.lat1)/2 AS clat, (b.lon0+b.lon1)/2 AS clon,
                     ROW_NUMBER() OVER (
                       PARTITION BY p.doc_id
                       ORDER BY ((b.lat0+b.lat1)/2 - p.lat)*((b.lat0+b.lat1)/2 - p.lat)
                              + ((b.lon0+b.lon1)/2 - p.lon)*((b.lon0+b.lon1)/2 - p.lon),
                              (b.lat0+b.lat1)/2, (b.lon0+b.lon1)/2
                     ) AS rn
              FROM pp p CROSS JOIN boxes b
              WHERE p.u >= 0.90
            )
            SELECT doc_id, clat AS near_clat, clon AS near_clon
            FROM ranked WHERE rn = 1
        """,
        "geo_graph_edges": f"""
            WITH {boxes},
            cont AS (
              SELECT a.lat0 p0, a.lat1 p1, a.lon0 p2, a.lon1 p3, a.area parea,
                     b.lat0 c0, b.lat1 c1, b.lon0 c2, b.lon1 c3, b.area carea
              FROM boxes a JOIN boxes b
                ON a.lat0 <= b.lat0 AND a.lat1 >= b.lat1
               AND a.lon0 <= b.lon0 AND a.lon1 >= b.lon1
               AND NOT (a.lat0 = b.lat0 AND a.lat1 = b.lat1
                        AND a.lon0 = b.lon0 AND a.lon1 = b.lon1)
            )
            SELECT c.parea AS parent_area, c.carea AS child_area
            FROM cont c
            WHERE NOT EXISTS (
              SELECT 1 FROM cont m1, cont m2
              WHERE m1.p0 = c.p0 AND m1.p1 = c.p1 AND m1.p2 = c.p2 AND m1.p3 = c.p3
                AND m2.c0 = c.c0 AND m2.c1 = c.c1 AND m2.c2 = c.c2 AND m2.c3 = c.c3
                AND m1.c0 = m2.p0 AND m1.c1 = m2.p1 AND m1.c2 = m2.p2 AND m1.c3 = m2.p3
            )
        """,
        # longest-chain depth over the containment closure == longest
        # root-path in the engine's transitively-reduced DAG (closure
        # edges only shortcut, they never lengthen a chain)
        "geo_graph_depths": f"""
            WITH RECURSIVE {boxes},
            cont AS (
              SELECT a.lat0 p0, a.lat1 p1, a.lon0 p2, a.lon1 p3,
                     b.lat0 c0, b.lat1 c1, b.lon0 c2, b.lon1 c3, b.area carea
              FROM boxes a JOIN boxes b
                ON a.lat0 <= b.lat0 AND a.lat1 >= b.lat1
               AND a.lon0 <= b.lon0 AND a.lon1 >= b.lon1
               AND NOT (a.lat0 = b.lat0 AND a.lat1 = b.lat1
                        AND a.lon0 = b.lon0 AND a.lon1 = b.lon1)
            ),
            walk AS (
              SELECT b.lat0, b.lat1, b.lon0, b.lon1, b.area, 1 AS depth
              FROM boxes b
              WHERE NOT EXISTS (
                SELECT 1 FROM cont c
                WHERE c.c0 = b.lat0 AND c.c1 = b.lat1
                  AND c.c2 = b.lon0 AND c.c3 = b.lon1
              )
              UNION ALL
              SELECT c.c0, c.c1, c.c2, c.c3, c.carea, w.depth + 1
              FROM walk w JOIN cont c
                ON c.p0 = w.lat0 AND c.p1 = w.lat1
               AND c.p2 = w.lon0 AND c.p3 = w.lon1
            )
            SELECT area, CAST(MAX(depth) AS BIGINT) AS depth
            FROM walk GROUP BY lat0, lat1, lon0, lon1, area
        """,
        "geo_raster_runs": f"""
            WITH {boxes}, {_RASTER_RUNS_SQL.strip()}
            SELECT pix_row, col_lo, col_hi, leaf_area, n_areas FROM runs
        """,
        "geo_raster_polygonize": f"""
            WITH {boxes}, {_RASTER_RUNS_SQL.strip()},
            risl AS (
              SELECT *, pix_row - ROW_NUMBER() OVER (
                       PARTITION BY leaf_area, n_areas, col_lo, col_hi
                       ORDER BY pix_row) AS rk
              FROM runs
            )
            SELECT leaf_area, n_areas,
                   MIN(pix_row) AS row_lo, MAX(pix_row) AS row_hi,
                   col_lo, col_hi
            FROM risl GROUP BY leaf_area, n_areas, col_lo, col_hi, rk
        """,
        "geo_s2_cells": f"""
            WITH {_PTS_SQL.strip()}, {_s2_lut_sql()}, {_s2_encode_sql(12)}
            SELECT doc_id, face AS s2_face, pos AS s2_pos,
                   lpad(lower(to_hex(face * 33554432 + pos * 2 + 1)), 7, '0')
                     AS s2_token
            FROM s2c
        """,
        "geo_s2_cover": f"""
            WITH {_PTS_SQL.strip()}, {_s2_lut_sql()}, {_s2_encode_sql(12)},
            {_s2_cover_sql(12)}
            SELECT face AS s2_face, lvl AS s2_level, pos AS s2_pos,
                   {_s2_token_case_sql()} AS s2_token
            FROM c0
        """,
        "rel_count_by_lang": """
            SELECT lang, COUNT(*) AS n, CAST(SUM(n_chars) AS BIGINT) AS sum_chars
            FROM documents GROUP BY lang
        """,
        "rel_lineitem_pricing": """
            SELECT l_returnflag, l_linestatus,
                   CAST(SUM(CAST(FLOOR(l_quantity+0.5) AS BIGINT)) AS BIGINT) AS sum_qty,
                   CAST(SUM(CAST(FLOOR(l_extendedprice*100.0+0.5) AS BIGINT)) AS BIGINT) AS sum_price_cents,
                   CAST(SUM(CAST(FLOOR(l_extendedprice*(1.0-l_discount)*100.0+0.5) AS BIGINT)) AS BIGINT) AS sum_disc_cents,
                   COUNT(*) AS n
            FROM lineitem
            WHERE l_shipdate < TIMESTAMP '1996-01-01'
            GROUP BY l_returnflag, l_linestatus
        """,
        # Q5 shape; cents = floor(ext*(1-disc)*100 + 0.5) left-to-right,
        # matching the engine's pc expression bit-for-bit before floor
        "rel_regional_revenue": """
            SELECT n.n_name,
                   CAST(SUM(CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount)
                                       * 100 + 0.5) AS BIGINT)) AS BIGINT)
                     AS revenue_cents
            FROM customer c
            JOIN orders o   ON c.c_custkey = o.o_custkey
            JOIN lineitem l ON l.l_orderkey = o.o_orderkey
            JOIN supplier s ON l.l_suppkey = s.s_suppkey
            JOIN nation n   ON s.s_nationkey = n.n_nationkey
            JOIN region r   ON n.n_regionkey = r.r_regionkey
            WHERE r.r_name = 'EUROPE'
              AND c.c_nationkey = s.s_nationkey
              AND o.o_orderdate >= TIMESTAMP '1996-01-01'
              AND o.o_orderdate <  TIMESTAMP '1998-01-01'
            GROUP BY n.n_name
            ORDER BY revenue_cents DESC, n.n_name
        """,
        "rel_segment_revenue": """
            SELECT c_mktsegment,
                   COUNT(*) AS n_orders,
                   CAST(SUM(CAST(FLOOR(o_totalprice*100.0+0.5) AS BIGINT)) AS BIGINT) AS revenue_cents
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY c_mktsegment
        """,
        "rel_top_parts": """
            SELECT p_partkey, p_name, p_retailprice
            FROM part ORDER BY p_retailprice DESC, p_partkey ASC LIMIT 10
        """,
        "rel_events_hourly": """
            SELECT user_id, date_trunc('hour', ts) AS hour,
                   COUNT(*) AS n,
                   CAST(SUM(CAST(FLOOR(value*100.0+0.5) AS BIGINT)) AS BIGINT)
                     AS sum_value_cents
            FROM events GROUP BY user_id, date_trunc('hour', ts)
        """,
        "rel_events_sessions": """
            WITH ordered AS (
              SELECT user_id, ts,
                     LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
              FROM events
            )
            SELECT user_id,
                   CAST(1 + SUM(CASE WHEN prev_ts IS NOT NULL
                                      AND ts - prev_ts > INTERVAL 30 MINUTE
                                 THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions
            FROM ordered GROUP BY user_id
        """,
        "rel_events_sliding": """
            SELECT event_id,
                   COUNT(*) OVER w AS n_win,
                   CAST(SUM(CAST(FLOOR(value*100.0 + 0.5) AS BIGINT)) OVER w
                        AS BIGINT) AS sum_cents_win
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts
                         RANGE BETWEEN INTERVAL 3 HOUR PRECEDING
                               AND CURRENT ROW)
        """,
        "rel_events_asof": """
            WITH l AS (
              SELECT event_id, ts, user_id, event_type FROM events
              WHERE event_type <> 'click'
            ),
            r AS (
              SELECT user_id, ts AS click_ts, event_id AS click_event_id,
                     value AS click_value
              FROM events WHERE event_type = 'click'
              QUALIFY ROW_NUMBER() OVER (
                PARTITION BY user_id, ts ORDER BY event_id DESC) = 1
            )
            SELECT l.event_id, l.ts, l.user_id, l.event_type,
                   r.click_event_id, r.click_ts, r.click_value
            FROM l ASOF JOIN r
              ON l.user_id = r.user_id AND l.ts >= r.click_ts
        """,
        "ml_exact_dedup": """
            SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY COALESCE(text, '')
            ORDER BY doc_id
        """,
        "ml_fingerprint": "SELECT doc_id, md5(COALESCE(text, '')) AS fingerprint FROM documents",
        "ml_text_stats": f"""
            WITH base AS (
              SELECT doc_id, COALESCE(text, '') AS text,
                regexp_extract_all(lower(COALESCE(text, '')), '[a-z0-9]+') AS toks
              FROM documents
            )
            SELECT doc_id,
              len(toks) AS n_tokens,
              length(text) AS n_chars,
              FLOOR(CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE)
                    / GREATEST(length(text), 1) * 1000000)/1000000 AS alpha_ratio,
              FLOOR(CAST(length(regexp_replace(text, '[A-Za-z0-9_\\s]', '', 'g')) AS DOUBLE)
                    / GREATEST(length(text), 1) * 1000000)/1000000 AS punct_ratio,
              FLOOR(CAST(len(list_filter(toks, x -> x IN {_STOPWORDS_SQL})) AS DOUBLE)
                    / GREATEST(len(toks), 1) * 1000000)/1000000 AS stopword_ratio
            FROM base
        """,
        "ml_langid": """
            WITH base AS (
              SELECT doc_id,
                list_slice(regexp_extract_all(lower(COALESCE(text, '')), '[a-z0-9]+'), 1, 64) AS toks
              FROM documents
            ), hits AS (
              SELECT doc_id,
                len(list_filter(toks, x -> x IN ('der','die','das','und','ist'))) AS de,
                len(list_filter(toks, x -> x IN ('the','and','of','is','in'))) AS en,
                len(list_filter(toks, x -> x IN ('el','la','los','y','es'))) AS es,
                len(list_filter(toks, x -> x IN ('le','la','les','et','est'))) AS fr
              FROM base
            )
            SELECT doc_id,
              CASE WHEN GREATEST(de,en,es,fr) = 0 THEN 'und'
                   WHEN de = GREATEST(de,en,es,fr) THEN 'de'
                   WHEN en = GREATEST(de,en,es,fr) THEN 'en'
                   WHEN es = GREATEST(de,en,es,fr) THEN 'es'
                   ELSE 'fr' END AS lang_pred,
              GREATEST(de,en,es,fr) AS lang_score
            FROM hits
        """,
        "ml_tfidf": """
            WITH toks AS (
              SELECT doc_id,
                     unnest(regexp_extract_all(lower(COALESCE(text, '')), '[a-z0-9]+')) AS term
              FROM documents
            ),
            tf AS (
              SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term
            ),
            df AS (
              SELECT term, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY term
            ),
            n AS (SELECT COUNT(*) AS n FROM documents),
            scored AS (
              SELECT tf.doc_id, tf.term,
                     tf.tf * (ln((1.0 + n.n) / (1.0 + df.df)) + 1.0) AS s
              FROM tf JOIN df USING (term) CROSS JOIN n
            ),
            ranked AS (
              SELECT *, ROW_NUMBER() OVER (
                       PARTITION BY doc_id ORDER BY s DESC, term) AS rn
              FROM scored
            )
            SELECT doc_id, term, FLOOR(s * 1000000) / 1000000 AS tfidf
            FROM ranked WHERE rn <= 5
        """,
        "ml_length_quantiles": """
            WITH o AS (
              SELECT length(text) AS n_chars,
                     ROW_NUMBER() OVER (ORDER BY length(text)) AS rn,
                     COUNT(*) OVER () AS n
              FROM documents
            ),
            qv(q) AS (VALUES (0.5), (0.9), (0.99))
            SELECT CAST(qv.q AS DOUBLE) AS q, MIN(o.n_chars) AS n_chars
            FROM qv JOIN o ON o.rn >= CEIL(qv.q * o.n)
            GROUP BY qv.q
        """,
        "ml_top_bigrams": """
            WITH toks AS (
              SELECT regexp_extract_all(lower(COALESCE(text, '')), '[a-z0-9]+') AS t
              FROM documents
            ),
            pairs AS (
              SELECT unnest(list_transform(range(1, len(t)),
                                           i -> t[i] || ' ' || t[i+1])) AS bigram
              FROM toks
            ),
            c AS (SELECT bigram, COUNT(*) AS n FROM pairs GROUP BY bigram)
            SELECT bigram, n FROM c ORDER BY n DESC, bigram LIMIT 20
        """,
        "ml_curate": f"""
            WITH s AS (
              SELECT doc_id, md5(text) AS fp,
                     len(regexp_extract_all(lower(COALESCE(text, '')), '[a-z0-9]+')) AS n_tokens,
                     len(list_filter(regexp_extract_all(lower(COALESCE(text, '')), '[a-z0-9]+'),
                                     x -> x IN {_STOPWORDS_SQL})) AS n_stop
              FROM documents
            ),
            q AS (
              SELECT * FROM s
              WHERE n_tokens >= 10
                AND CAST(n_stop AS DOUBLE) / GREATEST(n_tokens, 1) >= 0.05
            ),
            k AS (SELECT fp, MIN(doc_id) AS doc_id FROM q GROUP BY fp),
            u AS (
              SELECT doc_id,
                CAST((doc_id * {_SPLIT_MUL} + {_SPLIT_ADD}) % 4294967296
                     AS DOUBLE) / 4294967296.0 AS u
              FROM k
            )
            SELECT doc_id,
              CASE WHEN u < {_SPLIT_BOUNDS[0]!r} THEN 'train'
                   WHEN u < {_SPLIT_BOUNDS[1]!r} THEN 'val'
                   ELSE 'test' END AS split
            FROM u
        """,
        # split-bound literals are repr()s of the engine's own cumsum
        # doubles so the u < bound comparisons are bit-identical
        "ml_corpus_split": f"""
            WITH u AS (
              SELECT doc_id,
                CAST((doc_id * {_SPLIT_MUL} + {_SPLIT_ADD}) % 4294967296
                     AS DOUBLE) / 4294967296.0 AS u
              FROM documents
            )
            SELECT doc_id,
              CASE WHEN u < {_SPLIT_BOUNDS[0]!r} THEN 'train'
                   WHEN u < {_SPLIT_BOUNDS[1]!r} THEN 'val'
                   ELSE 'test' END AS split
            FROM u
        """,
        "ml_ann_topk": """
            WITH q AS (
              SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
              FROM embeddings WHERE vec_id IN (0, 1, 2)
            ), sims AS (
              SELECT q.query_id, e.vec_id,
                     list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qe) AS cos_raw,
                     ROW_NUMBER() OVER (
                       PARTITION BY q.query_id
                       ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qe) DESC,
                                e.vec_id ASC
                     ) AS rn
              FROM embeddings e CROSS JOIN q
              WHERE e.vec_id <> q.query_id
            )
            SELECT query_id, vec_id,
                   FLOOR(cos_raw*1000000)/1000000 AS cosine
            FROM sims WHERE rn <= 10
        """,
        "geo_join_full": f"""
            WITH {_PTS_SQL.strip()}, {_boxes_values_sql()},
            enc AS (
              SELECT doc_id, u,
                LEAST(GREATEST(CAST(FLOOR((lon+180.0)/360.0*256) AS BIGINT),0),255) AS lonq,
                LEAST(GREATEST(CAST(FLOOR((lat+90.0)/180.0*128) AS BIGINT),0),127) AS latq
              FROM pp
            ),
            code AS (
              SELECT doc_id, u,
                (((lonq>>7)&1)<<14) | (((latq>>6)&1)<<13) | (((lonq>>6)&1)<<12)
              | (((latq>>5)&1)<<11) | (((lonq>>5)&1)<<10) | (((latq>>4)&1)<<9)
              | (((lonq>>4)&1)<<8)  | (((latq>>3)&1)<<7)  | (((lonq>>3)&1)<<6)
              | (((latq>>2)&1)<<5)  | (((lonq>>2)&1)<<4)  | (((latq>>1)&1)<<3)
              | (((lonq>>1)&1)<<2)  | ((latq&1)<<1)       | (lonq&1) AS c
              FROM enc
            ),
            gh AS (
              SELECT doc_id, u,
                substr(b32, CAST((c>>10)&31 AS INTEGER)+1, 1) ||
                substr(b32, CAST((c>>5)&31 AS INTEGER)+1, 1) ||
                substr(b32, CAST(c&31 AS INTEGER)+1, 1) AS cell_id
              FROM code, (SELECT '0123456789bcdefghjkmnpqrstuvwxyz' AS b32)
            ),
            cnt AS (
              SELECT p.doc_id, COUNT(b.area) AS n_areas
              FROM pp p LEFT JOIN boxes b
                ON p.lat >= b.lat0 AND p.lat <= b.lat1
               AND p.lon >= b.lon0 AND p.lon <= b.lon1
              GROUP BY p.doc_id
            )
            SELECT g.doc_id, g.cell_id, c.n_areas,
              CASE
                WHEN g.u < 0.35 THEN 'Megacity'
                WHEN g.u < 0.50 THEN
                  CASE WHEN d.lang = 'de' THEN 'Grossland, Medium, Kleinburg'
                       WHEN d.lang = 'en' THEN 'Large, Medium, Small'
                       ELSE 'Large, Medium, Klein' END
                WHEN g.u < 0.60 THEN
                  CASE WHEN d.lang = 'de' THEN 'Grossland, Medium'
                       ELSE 'Large, Medium' END
                WHEN g.u < 0.70 THEN 'Overlapping, Left, Fits House'
                WHEN g.u < 0.80 THEN 'Left'
                WHEN g.u < 0.90 THEN
                  CASE WHEN d.lang = 'en' THEN 'The Islands'
                       ELSE 'Archipelago' END
                ELSE 'Megacity'
              END AS name
            FROM gh g
            JOIN cnt c ON c.doc_id = g.doc_id
            JOIN documents d ON d.doc_id = g.doc_id
        """,
        "geo_tile_assign": f"""
            WITH {boxes}, idx AS (SELECT unnest(range(0, 32)) AS i)
            SELECT li.i AS lat_idx, lo.i AS lon_idx,
                   b.lat0 AS a_lat0, b.lat1 AS a_lat1,
                   b.lon0 AS a_lon0, b.lon1 AS a_lon1
            FROM boxes b
            JOIN idx li ON li.i >= FLOOR((b.lat0 + 90) / 5.625)
                       AND li.i <= FLOOR((b.lat1 + 90) / 5.625)
            JOIN idx lo ON lo.i >= FLOOR((b.lon0 + 180) / 11.25)
                       AND lo.i <= FLOOR((b.lon1 + 180) / 11.25)
        """,
        # golden-pinned: leaf ids are content-derived hashes (stable across
        # runs/parallelism) and names follow the C9 spec — the reference
        # pins the same behavior with committed JSON fixtures
        "geo_dump_names": """
            SELECT * FROM (VALUES
              (137265790840104251,  'Dup Rel, Dup Way'),
              (2067172208529358115, 'Megacity'),
              (2481662654647946965, 'The Islands'),
              (2994057177262691601, 'The Islands'),
              (4964719336281728194, 'The Islands'),
              (5246555606260805625, 'Overlapping, Left, Fits House'),
              (6045739673105594052, 'Parentmouth, Holdenchild'),
              (6573405174196852211, 'Right'),
              (8887185415155860964, 'Large, Medium, Small')
            ) AS t(leaf_area_id, name)
        """,
        "ml_ivf_ann": """
            WITH cents AS (
              SELECT vec_id AS list_id, CAST(embedding AS DOUBLE[]) AS c
              FROM embeddings WHERE vec_id < 16
            ),
            dists AS (
              SELECT e.vec_id, c.list_id,
                     list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[]))
                   - 2*list_dot_product(CAST(e.embedding AS DOUBLE[]), c.c)
                   + list_dot_product(c.c, c.c) AS d2
              FROM embeddings e CROSS JOIN cents c
            ),
            assign AS (
              SELECT vec_id, list_id FROM (
                SELECT vec_id, list_id,
                       ROW_NUMBER() OVER (PARTITION BY vec_id
                                          ORDER BY d2, list_id) AS rn
                FROM dists
              ) WHERE rn = 1
            ),
            qprobe AS (
              SELECT vec_id AS query_id, list_id FROM (
                SELECT vec_id, list_id,
                       ROW_NUMBER() OVER (PARTITION BY vec_id
                                          ORDER BY d2, list_id) AS rn
                FROM dists WHERE vec_id IN (0, 1, 2)
              ) WHERE rn <= 2
            ),
            q AS (
              SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
              FROM embeddings WHERE vec_id IN (0, 1, 2)
            ),
            sims AS (
              SELECT q.query_id, e.vec_id,
                     list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qe) AS cos_raw,
                     ROW_NUMBER() OVER (
                       PARTITION BY q.query_id
                       ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qe) DESC,
                                e.vec_id ASC
                     ) AS rn
              FROM embeddings e
              JOIN assign a ON a.vec_id = e.vec_id
              JOIN qprobe p ON p.list_id = a.list_id
              JOIN q ON q.query_id = p.query_id
              WHERE e.vec_id <> q.query_id
            )
            SELECT query_id, vec_id,
                   FLOOR(cos_raw * 1000000) / 1000000 AS cosine
            FROM sims WHERE rn <= 10
        """,
        "ml_minhash_dedup": f"""
            WITH corpus AS (
              SELECT doc_id, text FROM documents
              UNION ALL
              SELECT doc_id + 10000000, text FROM documents WHERE doc_id % 10 = 0
            ), {_SHINGLES_SQL.strip()},
            grp AS (
              SELECT doc_id,
                     MIN(doc_id) OVER (PARTITION BY CAST(s AS VARCHAR)) AS dup_of,
                     COUNT(*) OVER (PARTITION BY CAST(s AS VARCHAR)) AS n
              FROM sh
            )
            SELECT doc_id, dup_of FROM grp WHERE n > 1 ORDER BY doc_id
        """,
        # exact-Jaccard pairs + recursive-closure min label: equals the
        # banded-LSH engine output whenever band recall is 1.0 (measured
        # true on the fixed test corpora — see queries() docstring)
        "ml_minhash_neardup": f"""
            WITH RECURSIVE corpus AS (SELECT doc_id, text FROM documents),
            {_SHINGLES_SQL.strip()},
            pairs AS (
              SELECT a.doc_id AS u, b.doc_id AS v
              FROM sh a JOIN sh b ON a.doc_id < b.doc_id
              WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                    / GREATEST(len(list_distinct(a.s || b.s)), 1) >= 0.7
            ),
            edges AS (
              SELECT u, v FROM pairs UNION SELECT v AS u, u AS v FROM pairs
            ),
            reach(u, v) AS (
              SELECT u, v FROM edges
              UNION
              SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
            )
            SELECT u AS doc_id, LEAST(u, MIN(v)) AS dup_of
            FROM reach GROUP BY u ORDER BY doc_id
        """,
        "ml_embed_neardup": """
            WITH corpus AS (
              SELECT vec_id, embedding FROM embeddings
              UNION ALL
              SELECT vec_id + 10000000, embedding FROM embeddings WHERE vec_id % 10 = 0
            ),
            grp AS (
              SELECT vec_id,
                     MIN(vec_id) OVER (PARTITION BY CAST(embedding AS VARCHAR)) AS dup_of,
                     COUNT(*) OVER (PARTITION BY CAST(embedding AS VARCHAR)) AS n
              FROM corpus
            )
            SELECT vec_id, dup_of FROM grp WHERE n > 1 ORDER BY vec_id
        """,
        "ml_kmeans": f"""
            WITH {_KMEANS_ASSIGN_SQL.strip()}
            SELECT vec_id, cluster FROM af ORDER BY vec_id
        """,
        "ml_balanced_sample": f"""
            WITH {_KMEANS_ASSIGN_SQL.strip()},
            rk AS (
              SELECT vec_id, cluster,
                     ROW_NUMBER() OVER (PARTITION BY cluster
                                        ORDER BY vec_id) AS rn
              FROM af
            )
            SELECT vec_id, cluster FROM rk WHERE rn <= 20 ORDER BY vec_id
        """,
        # total vs distinct k-token shingle occurrences; same
        # tokenize/pad/comprehension as the shingle CTEs
        "ml_gopher_repetition": """
            WITH tk AS (
              SELECT doc_id, regexp_extract_all(lower(COALESCE(text, '')), '[a-z0-9]+') AS t
              FROM documents
            ),
            tp AS (
              SELECT doc_id,
                     CASE WHEN len(t) >= 3 THEN t
                          ELSE list_resize(t, 3, chr(0)) END AS t
              FROM tk
            ),
            sh AS (
              SELECT doc_id,
                     [t[i] || ' ' || t[i+1] || ' ' || t[i+2]
                      for i in range(1, len(t) - 1)] AS s
              FROM tp
            ),
            fr AS (
              SELECT doc_id,
                     FLOOR((1 - CAST(len(list_distinct(s)) AS DOUBLE)
                                / GREATEST(len(s), 1)) * 1e6) / 1e6 AS f
              FROM sh
            )
            SELECT doc_id, f AS dup_ngram_frac, f > 0.2 AS flagged
            FROM fr ORDER BY doc_id
        """,
        # plant PII on every 7th doc, then replicate the fixed-order
        # scrub: email count on the planted text, phone count on the
        # email-scrubbed text (RE2 in both engines)
        "ml_pii_scrub": """
            WITH planted AS (
              SELECT doc_id,
                     CASE WHEN doc_id % 7 = 0
                          THEN COALESCE(text, '') || ' contact a'
                               || CAST(doc_id AS VARCHAR)
                               || '@ex.com or 555-123-4567'
                          ELSE COALESCE(text, '') END AS pt
              FROM documents
            ),
            s1 AS (
              SELECT doc_id, pt,
                     regexp_replace(pt,
                       '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}',
                       '<EMAIL>', 'g') AS t1
              FROM planted
            )
            SELECT doc_id,
                   regexp_replace(t1,
                     '\\+?[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}',
                     '<PHONE>', 'g') AS text,
                   len(regexp_extract_all(pt,
                     '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}'))
                 + len(regexp_extract_all(t1,
                     '\\+?[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}'))
                   AS n_redactions
            FROM s1 ORDER BY doc_id
        """,
        # greedy packing fold replayed exactly: the recursive CTE walks
        # each partition in doc_id order carrying (seq, acc) — new
        # sequence when the accumulator would exceed the budget
        "ml_pack_sequences": """
            WITH RECURSIVE d AS (
              SELECT doc_id, doc_id // 100 AS part,
                     CAST(len(regexp_extract_all(lower(COALESCE(text, '')),
                                                 '[a-z0-9]+')) AS BIGINT)
                       AS n_tokens,
                     ROW_NUMBER() OVER (PARTITION BY doc_id // 100
                                        ORDER BY doc_id) AS rn
              FROM documents
            ),
            r AS (
              SELECT part, rn, doc_id, n_tokens,
                     CAST(0 AS BIGINT) AS seq, n_tokens AS acc
              FROM d WHERE rn = 1
              UNION ALL
              SELECT d.part, d.rn, d.doc_id, d.n_tokens,
                     CASE WHEN r.acc + d.n_tokens > 256
                          THEN r.seq + 1 ELSE r.seq END,
                     CASE WHEN r.acc + d.n_tokens > 256
                          THEN d.n_tokens ELSE r.acc + d.n_tokens END
              FROM r JOIN d ON d.part = r.part AND d.rn = r.rn + 1
            )
            SELECT doc_id, part, seq, n_tokens FROM r ORDER BY doc_id
        """,
        # DSIR: hashed unigram+bigram buckets (the simhash/winnowing
        # md5-UBIGINT construction), add-1 smoothed target/raw ratios,
        # floor(ln·1e6) int64 per bucket — the per-doc SUM is integer,
        # so summation order can't break parity
        "ml_dsir": """
            WITH tk AS (
              SELECT doc_id, lang,
                     regexp_extract_all(lower(COALESCE(text, '')), '[a-z0-9]+') AS t
              FROM documents
            ),
            t1 AS (
              SELECT doc_id, lang,
                     CASE WHEN len(t) >= 1 THEN t
                          ELSE list_resize(t, 1, chr(0)) END AS t
              FROM tk
            ),
            g1 AS (SELECT doc_id, lang, unnest(t) AS g FROM t1),
            t2 AS (
              SELECT doc_id, lang,
                     CASE WHEN len(t) >= 2 THEN t
                          ELSE list_resize(t, 2, chr(0)) END AS t
              FROM tk
            ),
            g2 AS (
              SELECT doc_id, lang,
                     unnest([t[i] || ' ' || t[i+1]
                             for i in range(1, len(t))]) AS g
              FROM t2
            ),
            grams AS (
              SELECT doc_id, lang, g FROM g1
              UNION ALL SELECT doc_id, lang, g FROM g2
            ),
            gb AS (
              SELECT doc_id, lang,
                     CAST(CAST(concat('0x', substr(md5(g), 1, 16)) AS UBIGINT)
                          % 65536 AS BIGINT) AS b
              FROM grams
            ),
            ctt AS (SELECT b, COUNT(*) AS n FROM gb WHERE lang = 'en' GROUP BY b),
            crr AS (SELECT b, COUNT(*) AS n FROM gb GROUP BY b),
            tot AS (
              SELECT (SELECT COUNT(*) FROM gb WHERE lang = 'en') AS tt,
                     (SELECT COUNT(*) FROM gb) AS tr
            ),
            lr AS (
              SELECT r.b,
                     CAST(FLOOR(ln(
                       ((COALESCE(t.n, 0) + 1) / CAST(tot.tt + 65536 AS DOUBLE))
                     / ((r.n + 1) / CAST(tot.tr + 65536 AS DOUBLE))
                     ) * 1e6) AS BIGINT) AS v
              FROM crr r LEFT JOIN ctt t USING (b), tot
            )
            SELECT gb.doc_id, CAST(SUM(lr.v) AS BIGINT) AS dsir_score
            FROM gb JOIN lr USING (b)
            GROUP BY gb.doc_id ORDER BY gb.doc_id
        """,
        # 5-token shingles (list_resize pad + comprehension mirrors
        # mlops._token_shingles / _batch_shingle_pairs exactly); a train
        # doc is contaminated iff its shingles semi-join any test shingle
        "ml_decontaminate": """
            WITH tk AS (
              SELECT doc_id, regexp_extract_all(lower(COALESCE(text, '')), '[a-z0-9]+') AS t
              FROM documents
            ),
            tp AS (
              SELECT doc_id,
                     CASE WHEN len(t) >= 5 THEN t
                          ELSE list_resize(t, 5, chr(0)) END AS t
              FROM tk
            ),
            sh AS (
              SELECT doc_id,
                     list_distinct(
                       [t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' ||
                        t[i+3] || ' ' || t[i+4]
                        for i in range(1, len(t) - 3)]) AS s
              FROM tp
            ),
            tr AS (SELECT doc_id, unnest(s) AS g FROM sh WHERE doc_id % 10 != 0),
            te AS (SELECT DISTINCT unnest(s) AS g FROM sh WHERE doc_id % 10 = 0),
            hit AS (SELECT DISTINCT tr.doc_id FROM tr JOIN te USING (g))
            SELECT d.doc_id, d.doc_id IN (SELECT doc_id FROM hit) AS contaminated
            FROM documents d WHERE d.doc_id % 10 != 0 ORDER BY d.doc_id
        """,
        # same seed-centroid assignment CTE as ml_ivf_ann; the keep rule
        # is a correlated NOT EXISTS over the vector's own cluster
        "ml_semantic_dedup": """
            WITH corpus AS (
              SELECT vec_id, embedding FROM embeddings
              UNION ALL
              SELECT vec_id + 10000000, embedding FROM embeddings WHERE vec_id % 10 = 0
            ),
            cents AS (
              SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS c
              FROM embeddings WHERE vec_id < 16
            ),
            dists AS (
              SELECT e.vec_id, c.cid,
                     list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[]))
                   - 2*list_dot_product(CAST(e.embedding AS DOUBLE[]), c.c)
                   + list_dot_product(c.c, c.c) AS d2
              FROM corpus e CROSS JOIN cents c
            ),
            assign AS (
              SELECT vec_id, cid AS cluster FROM (
                SELECT vec_id, cid,
                       ROW_NUMBER() OVER (PARTITION BY vec_id
                                          ORDER BY d2, cid) AS rn
                FROM dists
              ) WHERE rn = 1
            ),
            ce AS (
              SELECT a.vec_id, a.cluster,
                     CAST(e.embedding AS DOUBLE[]) AS emb
              FROM assign a JOIN corpus e USING (vec_id)
            )
            SELECT v.vec_id, v.cluster,
                   NOT EXISTS (
                     SELECT 1 FROM ce u
                     WHERE u.cluster = v.cluster AND u.vec_id < v.vec_id
                       AND list_cosine_similarity(u.emb, v.emb) >= 0.95
                   ) AS kept
            FROM ce v ORDER BY v.vec_id
        """,
        "ml_simhash_neardup": """
            WITH t AS (
              SELECT doc_id,
                     unnest(regexp_extract_all(lower(COALESCE(text, '')), '[a-z0-9]+')) AS tok
              FROM documents
            ),
            h AS (
              SELECT doc_id,
                     CAST(concat('0x', substr(md5(tok), 1, 16)) AS UBIGINT) AS th
              FROM t
            ),
            v AS (
              SELECT doc_id, b.b AS b,
                     SUM(CASE WHEN (th >> CAST(b.b AS UBIGINT)) & 1 = 1
                              THEN 1 ELSE -1 END) AS vote
              FROM h CROSS JOIN (SELECT unnest(range(64)) AS b) b
              GROUP BY doc_id, b.b
            ),
            sig AS (
              SELECT doc_id,
                     SUM(CASE WHEN vote > 0 AND b >= 1
                              THEN (CAST(1 AS BIGINT) << CAST(b - 1 AS INTEGER))
                              ELSE 0 END) AS simhash
              FROM v GROUP BY doc_id
            ),
            allsig AS (
              SELECT d.doc_id, CAST(COALESCE(s.simhash, 0) AS BIGINT) AS sg
              FROM documents d LEFT JOIN sig s ON s.doc_id = d.doc_id
            )
            SELECT x.doc_id AS a, y.doc_id AS b,
                   CAST(bit_count(xor(x.sg, y.sg)) AS BIGINT) AS hamming
            FROM allsig x JOIN allsig y ON x.doc_id < y.doc_id
            WHERE bit_count(xor(x.sg, y.sg)) <= 3
        """,
        "ml_simhash": """
            WITH t AS (
              SELECT doc_id,
                     unnest(regexp_extract_all(lower(COALESCE(text, '')), '[a-z0-9]+')) AS tok
              FROM documents
            ),
            h AS (
              SELECT doc_id,
                     CAST(concat('0x', substr(md5(tok), 1, 16)) AS UBIGINT) AS th
              FROM t
            ),
            v AS (
              SELECT doc_id, b.b AS b,
                     SUM(CASE WHEN (th >> CAST(b.b AS UBIGINT)) & 1 = 1
                              THEN 1 ELSE -1 END) AS vote
              FROM h CROSS JOIN (SELECT unnest(range(64)) AS b) b
              GROUP BY doc_id, b.b
            ),
            sig AS (
              SELECT doc_id,
                     SUM(CASE WHEN vote > 0 AND b >= 1
                              THEN (CAST(1 AS BIGINT) << CAST(b - 1 AS INTEGER))
                              ELSE 0 END) AS simhash
              FROM v GROUP BY doc_id
            )
            SELECT d.doc_id, CAST(COALESCE(s.simhash, 0) AS BIGINT) AS simhash
            FROM documents d LEFT JOIN sig s ON s.doc_id = d.doc_id
        """,
        "ml_winnowing": """
            WITH s AS (SELECT doc_id, lower(text) AS s FROM documents),
            pos AS (
              SELECT doc_id, s, unnest(range(1, length(s) - 5 + 2)) AS i
              FROM s WHERE length(s) >= 5
            ),
            h AS (
              SELECT doc_id, i,
                     CAST(concat('0x', substr(md5(substr(s, CAST(i AS INTEGER), 5)), 1, 16)) AS UBIGINT) >> 1 AS kh,
                     length(s) - 5 + 1 AS n_h
              FROM pos
            ),
            wmin AS (
              SELECT doc_id, i, n_h,
                     MIN(kh) OVER (PARTITION BY doc_id ORDER BY i
                                   ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS wm
              FROM h
            ),
            fp AS (
              SELECT doc_id, CAST(wm AS BIGINT) AS fingerprint
              FROM wmin WHERE n_h > 4 AND i <= n_h - 3
              UNION
              SELECT doc_id, CAST(MIN(kh) AS BIGINT) AS fingerprint
              FROM h WHERE n_h <= 4 GROUP BY doc_id
            )
            SELECT DISTINCT doc_id, fingerprint FROM fp
        """,
        "ml_ngram_jaccard": f"""
            WITH corpus AS (SELECT doc_id, text FROM documents),
            {_SHINGLES_SQL.strip()},
            pr AS (
              SELECT d1.doc_id AS a, d2.doc_id AS b
              FROM documents d1 JOIN documents d2 ON d2.doc_id = d1.doc_id + 1
              WHERE d1.doc_id % 2 = 0
            )
            SELECT pr.a, pr.b,
                   FLOOR(CAST(len(list_intersect(sa.s, sb.s)) AS DOUBLE)
                         / GREATEST(len(list_distinct(sa.s || sb.s)), 1)
                         * 1000000) / 1000000 AS jaccard
            FROM pr
            JOIN sh sa ON sa.doc_id = pr.a
            JOIN sh sb ON sb.doc_id = pr.b
        """,
        "ml_lsh_ann": f"""
            WITH {_lsh_planes_values_sql()},
            sig AS (
              SELECT e.vec_id,
                     SUM(CASE WHEN list_dot_product(CAST(e.embedding AS DOUBLE[]), p.p) > 0
                              THEN (1 << pid) ELSE 0 END) AS bucket
              FROM embeddings e CROSS JOIN planes p GROUP BY e.vec_id
            ),
            q AS (
              SELECT e.vec_id AS query_id, CAST(e.embedding AS DOUBLE[]) AS qe,
                     s.bucket AS qb
              FROM embeddings e JOIN sig s ON s.vec_id = e.vec_id
              WHERE e.vec_id IN (0, 1, 2)
            ),
            sims AS (
              SELECT q.query_id, e.vec_id,
                     list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qe) AS cos_raw,
                     ROW_NUMBER() OVER (
                       PARTITION BY q.query_id
                       ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qe) DESC,
                                e.vec_id ASC
                     ) AS rn
              FROM embeddings e
              JOIN sig s ON s.vec_id = e.vec_id
              CROSS JOIN q
              WHERE s.bucket = q.qb AND e.vec_id <> q.query_id
            )
            SELECT query_id, vec_id,
                   FLOOR(cos_raw * 1000000) / 1000000 AS cosine
            FROM sims WHERE rn <= 10
        """,
        "mm_frame_sample": """
            SELECT d.doc_id AS media_id,
                   CAST(f.i AS BIGINT) AS frame_index,
                   CAST(320 AS INTEGER) AS width,
                   CAST(240 AS INTEGER) AS height
            FROM documents d,
                 LATERAL (SELECT unnest(range(0, 30 + d.doc_id % 60, 10)) AS i) f
        """,
        "mm_audio_features": """
            WITH s AS (
              SELECT d.doc_id AS media_id,
                     200 + d.doc_id % 100 AS n,
                     t.i AS i,
                     CAST((d.doc_id*31 + t.i*7) % 65536 - 32768 AS BIGINT) AS v
              FROM documents d,
                   LATERAL (SELECT unnest(range(0, 200 + d.doc_id % 100)) AS i) t
            ),
            w AS (
              SELECT media_id, n, v,
                     LAG(v) OVER (PARTITION BY media_id ORDER BY i) AS prev
              FROM s
            )
            SELECT media_id,
                   CAST(ANY_VALUE(n) AS DOUBLE) / 16000.0 AS duration_s,
                   CAST(FLOOR(SQRT(AVG(CAST(v*v AS DOUBLE)))) AS BIGINT) AS rms,
                   CAST(SUM(CASE WHEN prev IS NOT NULL
                                  AND SIGN(v) <> SIGN(prev)
                             THEN 1 ELSE 0 END) AS BIGINT) AS zero_crossings
            FROM w GROUP BY media_id
        """,
        "mm_image_meta": """
            SELECT doc_id AS media_id,
                   'image/fake' AS media_type,
                   CAST(64 + doc_id % 32 AS INTEGER) AS width,
                   CAST(48 + doc_id % 16 AS INTEGER) AS height,
                   CAST(12 + LEAST((64 + doc_id % 32)*(48 + doc_id % 16), 256) AS BIGINT) AS n_bytes
            FROM documents
        """,
    }
    # the partitioned and tiled joins must match the broadcast join
    # row-for-row
    sql["geo_join_partitioned"] = sql["geo_join_full"]
    sql["geo_join_tiled"] = sql["geo_join_full"]
    # hole-aware PIP over the deterministic donut world: Parent
    # (-20..20); Donut outer (-6..6) minus hole closure (-1.5..1.5);
    # Island (-0.6..0.6) nested inside the hole
    sql["geo_holes_pip"] = f"""
        WITH {_PTS_SQL.strip()}
        SELECT p.doc_id, CAST(
          (CASE WHEN p.lat BETWEEN -20 AND 20 AND p.lon BETWEEN -20 AND 20
                THEN 1 ELSE 0 END)
        + (CASE WHEN p.lat BETWEEN -6 AND 6 AND p.lon BETWEEN -6 AND 6
                AND NOT (p.lat BETWEEN -1.5 AND 1.5 AND p.lon BETWEEN -1.5 AND 1.5)
                THEN 1 ELSE 0 END)
        + (CASE WHEN p.lat BETWEEN -0.6 AND 0.6 AND p.lon BETWEEN -0.6 AND 0.6
                THEN 1 ELSE 0 END) AS BIGINT) AS n_areas
        FROM pp p
    """
    return sql
