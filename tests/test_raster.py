"""Raster↔vector tests: vector→raster leaf-label sampling vs an
independent bbox brute force, value-keyed run-boundary parity (what the
DuckDB oracle relies on), rectangle polygonization roundtrip, and
manifest-committed band writes with resume skip."""

import numpy as np
import pandas as pd
import pytest

from osm_jigsaw_ray.fixtures import build_osm_fixture_tables
from osm_jigsaw_ray.pipelines.areas import areas_dataset_from_df, resolve_areas
from osm_jigsaw_ray.pipelines.graph import build_graph_edges
from osm_jigsaw_ray.pipelines.raster import (
    RasterGrid,
    polygonize_runs,
    rasterize_areas,
    read_raster_bands,
    rects_to_runs,
    runs_to_labels,
    write_raster_bands,
)
from osm_jigsaw_ray.stages.pip import build_area_pack
from osm_jigsaw_ray.state.manifest import read_manifest

GRID = RasterGrid(180, 360)


@pytest.fixture(scope="module")
def pack(ray_session):
    import ray.data as rd

    t = build_osm_fixture_tables()
    areas_df = resolve_areas(
        rd.from_arrow(t["nodes"]),
        rd.from_arrow(t["ways"]),
        rd.from_arrow(t["relations"]),
        join_partitions=4,
    ).to_pandas()
    edges_df = build_graph_edges(
        areas_dataset_from_df(areas_df), precision=1, join_partitions=4
    ).to_pandas()
    return build_area_pack(areas_df, edges_df, {}), areas_df


@pytest.fixture(scope="module")
def runs_df(pack, ray_session):
    p, _ = pack
    return (
        rasterize_areas(p, GRID, band_rows=30)
        .to_pandas()
        .sort_values(["pix_row", "col_lo"])
        .reset_index(drop=True)
    )


def _bruteforce_grids(areas_df):
    """Independent per-pixel labeling: strict bbox interior test (the
    fixture areas are axis-aligned boxes and grid centers never touch
    integer edges), leaf = lexicographic min (area, area_id)."""
    lats = GRID.row_centers(0, GRID.rows)
    lons = GRID.col_centers()
    LA = np.repeat(lats, lons.size).reshape(GRID.rows, GRID.cols)
    LO = np.tile(lons, lats.size).reshape(GRID.rows, GRID.cols)
    label = np.full((GRID.rows, GRID.cols), -1, dtype=np.int64)
    count = np.zeros((GRID.rows, GRID.cols), dtype=np.int64)
    best = np.full((GRID.rows, GRID.cols, 2), np.inf)
    for _, a in areas_df.iterrows():
        m = (
            (LA > a["min_lat"]) & (LA < a["max_lat"])
            & (LO > a["min_lon"]) & (LO < a["max_lon"])
        )
        count += m
        key = (float(a["area"]), float(a["area_id"]))
        better = m & (
            (best[:, :, 0] > key[0])
            | ((best[:, :, 0] == key[0]) & (best[:, :, 1] > key[1]))
        )
        label[better] = int(a["area_id"])
        best[better] = key
    return label, count


def test_grid_centers_avoid_integer_edges():
    assert not np.isin(GRID.row_centers(0, GRID.rows), np.arange(-90, 91)).any()
    assert not np.isin(GRID.col_centers(), np.arange(-180, 181)).any()


def test_rasterize_matches_bruteforce(pack, runs_df):
    _, areas_df = pack
    exp_label, exp_count = _bruteforce_grids(areas_df)
    got_label, got_count = runs_to_labels(runs_df, GRID)
    assert (got_label == exp_label).all()
    assert (got_count == exp_count).all()
    # runs are maximal: consecutive runs in a row differ in label or depth
    g = runs_df.groupby("pix_row")
    prev_hi = g["col_hi"].shift()
    adjacent = runs_df["col_lo"] == prev_hi + 1
    same = (
        (runs_df["area_id"] == g["area_id"].shift())
        & (runs_df["n_areas"] == g["n_areas"].shift())
    )
    assert not (adjacent & same).any()


def test_value_keyed_runs_match_id_keyed(pack, runs_df):
    """The DuckDB oracle reproduces run boundaries from (leaf planar
    area, depth) only — ids are content hashes it can't compute. Assert
    the value-keyed RLE induces exactly the same boundaries on this
    catalog (no two distinct equal-area leaves are horizontally
    adjacent at equal depth)."""
    _, areas_df = pack
    sizes = dict(zip(areas_df["area_id"], areas_df["area"]))
    label, count = runs_to_labels(runs_df, GRID)
    value = np.where(label >= 0, np.vectorize(lambda a: sizes.get(a, -1.0))(label), -1.0)
    for i in range(GRID.rows):
        id_breaks = np.flatnonzero(
            (label[i, 1:] != label[i, :-1]) | (count[i, 1:] != count[i, :-1])
        )
        val_breaks = np.flatnonzero(
            (value[i, 1:] != value[i, :-1]) | (count[i, 1:] != count[i, :-1])
        )
        assert (id_breaks == val_breaks).all()


def test_polygonize_roundtrip(pack, runs_df, ray_session):
    import ray.data as rd

    rects = (
        polygonize_runs(rd.from_pandas(runs_df), num_partitions=8)
        .to_pandas()
        .sort_values(["area_id", "col_lo", "row_lo"])
        .reset_index(drop=True)
    )
    # rectangles re-expand to exactly the original runs
    back = (
        rects_to_runs(rects)
        .sort_values(["pix_row", "col_lo"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        back[runs_df.columns.tolist()].astype("int64"), runs_df.astype("int64")
    )
    # maximal vertical merge: no two rects with same (label, depth, span)
    # are vertically adjacent
    g = rects.groupby(["area_id", "n_areas", "col_lo", "col_hi"])
    assert not (rects["row_lo"] == g["row_hi"].shift() + 1).any()
    # oracle-parity (vertical): merging by (leaf planar area, depth,
    # span) instead of id must not merge anything more — i.e. no two
    # vertically adjacent rects share value-key but differ in id
    _, areas_df = pack
    sizes = dict(zip(areas_df["area_id"], areas_df["area"]))
    rv = rects.assign(leaf_area=rects["area_id"].map(sizes)).sort_values(
        ["leaf_area", "n_areas", "col_lo", "col_hi", "row_lo"]
    )
    gv = rv.groupby(["leaf_area", "n_areas", "col_lo", "col_hi"])
    assert not (rv["row_lo"] == gv["row_hi"].shift() + 1).any()


def test_small_box_rect_recovers_exact_bounds(pack, runs_df, ray_session):
    """The 2°×2° 'small' box is the leaf of its whole footprint, so
    polygonization must produce a single rect whose geo bounds are the
    box itself."""
    import ray.data as rd

    _, areas_df = pack
    small_id = int(areas_df.loc[areas_df["area"] == 4.0, "area_id"].iloc[0])
    rects = polygonize_runs(rd.from_pandas(runs_df), num_partitions=8).to_pandas()
    r = rects[rects["area_id"] == small_id]
    assert len(r) == 1
    lat0, lat1, lon0, lon1 = GRID.rect_bounds(
        r["row_lo"].iloc[0], r["row_hi"].iloc[0],
        r["col_lo"].iloc[0], r["col_hi"].iloc[0],
    )
    assert (lat0, lat1, lon0, lon1) == (-1.0, 1.0, -1.0, 1.0)


def test_write_raster_bands_resume(pack, runs_df, tmp_path, ray_session):
    import ray.data as rd

    out = str(tmp_path / "raster")
    new = write_raster_bands(rd.from_pandas(runs_df), GRID, out, band_rows=30)
    # every band commits, including all-background ones (resume skips them)
    assert len(new) == -(-GRID.rows // 30)
    again = write_raster_bands(rd.from_pandas(runs_df), GRID, out, band_rows=30)
    assert again == []
    back = (
        read_raster_bands(out)
        .to_pandas()
        .sort_values(["pix_row", "col_lo"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(back[runs_df.columns.tolist()], runs_df)
    # manifests carry lineage + per-partition metrics (north_rule)
    m = read_manifest(out, new[0])
    assert m is not None and m.inputs == ["areas", "graph_edges"]
    assert m.metrics["bytes"] > 0 and m.metrics["write_s"] >= 0
    # at least one polar band is empty yet committed
    sizes = [read_manifest(out, p).rows for p in new]
    assert 0 in sizes


def test_grouped_rasterize_matches_broadcast(pack, runs_df, ray_session):
    """The shuffle-based scale path (areas ship to their bands, no
    broadcast) must produce the identical run table."""
    from osm_jigsaw_ray.pipelines.areas import areas_dataset_from_df
    from osm_jigsaw_ray.pipelines.raster import rasterize_areas_grouped

    _, areas_df = pack
    got = (
        rasterize_areas_grouped(areas_dataset_from_df(areas_df), GRID, band_rows=30)
        .to_pandas()
        .sort_values(["pix_row", "col_lo"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[runs_df.columns.tolist()], runs_df)


def test_raster_lookup_serves_from_band_partitions(pack, runs_df, tmp_path, ray_session):
    """Point queries answered from the committed band partitions alone
    match the dense label grid (incl. background and out-of-grid)."""
    import ray.data as rd

    from osm_jigsaw_ray.pipelines.raster import raster_lookup

    out = str(tmp_path / "raster")
    write_raster_bands(rd.from_pandas(runs_df), GRID, out, band_rows=30)
    label, count = runs_to_labels(runs_df, GRID)
    # probe: inside small box, inside megacity, ocean, near a box edge
    probes = [(0.2, 0.3), (30.5, 120.5), (0.0, 150.0), (-9.7, -9.6), (85.0, 10.0)]
    for lat, lon in probes:
        got = raster_lookup(out, GRID, lat, lon, band_rows=30)
        i, j = got["pix_row"], got["pix_col"]
        assert got["area_id"] == label[i, j]
        assert got["n_areas"] == count[i, j]
    assert raster_lookup(out, GRID, 95.0, 0.0, band_rows=30)["area_id"] == -1


def test_write_raster_bands_partial_failure_recovery(pack, runs_df, tmp_path, ray_session):
    """Crash-recovery semantics: wiping one band's manifest (simulating
    a partition that died mid-commit) makes a rerun recommit exactly
    that band and leave the rest untouched."""
    import os
    import shutil

    import ray.data as rd

    out = str(tmp_path / "raster")
    new = write_raster_bands(rd.from_pandas(runs_df), GRID, out, band_rows=30)
    victim = new[2]
    shutil.rmtree(os.path.join(out, victim))
    redo = write_raster_bands(rd.from_pandas(runs_df), GRID, out, band_rows=30)
    assert redo == [victim]
    back = (
        read_raster_bands(out)
        .to_pandas()
        .sort_values(["pix_row", "col_lo"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(back[runs_df.columns.tolist()], runs_df)
