"""Raster↔vector conversion over the area catalog (north_rule:
"raster↔vector"; north_star: "raster↔vector tiling materializes
per-H3-res tiles as Arrow batches written with per-partition lineage
manifests").

The reference serves vector tiles only; its raster story is implicit in
the sorted containment graph (every point query answers "which leaf am I
in" — ``graphing/GraphBuilder.scala``, ``app/graph/GraphService.scala``).
This module makes that label field explicit, both directions:

* **vector→raster** (:func:`rasterize_areas`): sample the PIP-descent
  leaf on a regular lat/lon pixel grid. The raster is produced as
  row-strip bands (the GeoTIFF strip layout): one Ray task per band
  builds the band's label/depth grids with the same vectorized
  winding-number kernel the join uses (:class:`PreparedRing`), then
  run-length-encodes each pixel row. Output is a sparse Arrow run table
  ``(pix_row, col_lo, col_hi, area_id, n_areas)`` — background pixels
  (no containing area) are simply absent. The area catalog travels as
  ONE ``ray.put`` broadcast; bands never shuffle. Full-width strips keep
  per-row RLE global; a column-chunked variant would need one extra
  boundary-stitch groupby on ``(pix_row, area_id)``.
* **raster→vector** (:func:`polygonize_runs`): greedy rectangle
  polygonization — vertically merge runs with identical
  ``(area_id, n_areas, col_lo, col_hi)`` over consecutive rows into
  maximal rectangles. Expressed as one partition-hashed aggregate
  (``shuffle.partitioned_aggregate``), so shuffle cost is independent of
  label cardinality and the per-partition merge is a single vectorized
  pandas pass.
* **materialization** (:func:`write_raster_bands`): per-band parquet
  partitions committed with lineage manifests (``state/manifest.py``) —
  a crashed run resumes by skipping committed bands, same contract as
  the vector tile writer (``tiling.write_tiles``).

Label semantics: a pixel's label is the smallest containing area by
``(planar area, area_id)`` — exactly the PIP-descent leaf the join
reports (``stages/pip.py``) — plus ``n_areas``, the containment depth.
Runs break when EITHER changes, so run boundaries land precisely on the
geometric boundaries of the containment arrangement and are reproducible
from the box catalog alone (the DuckDB oracle in ``__ray_entry__``
replays them by value).

Scale notes (100 TB): bands are embarrassingly parallel and sized by
``band_rows × cols`` pixels; per-area work is clipped to the area's
pixel window, so cost is O(Σ area pixel footprints), not
O(areas × pixels). For planet-sized catalogs the broadcast pack would be
replaced by the per-cell packs the partitioned join already builds
(``pages.py``) keyed by the band's cell cover.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from ..geometry import PreparedRing
from ..state.manifest import PartitionManifest, commit_partition, is_committed
from .shuffle import partitioned_aggregate

RUNS_SCHEMA = pa.schema(
    [
        ("pix_row", pa.int64()),
        ("col_lo", pa.int64()),
        ("col_hi", pa.int64()),
        ("area_id", pa.int64()),
        ("n_areas", pa.int64()),
    ]
)


@dataclass(frozen=True)
class RasterGrid:
    """Regular lat/lon pixel grid; pixel (i, j) covers the cell
    ``[lat_min + i*dlat, lat_min + (i+1)*dlat) × [lon_min + j*dlon, …)``
    and is sampled at its center. With integer-degree box catalogs,
    choose rows/cols so centers land on half-degrees — never on an
    area edge (asserted by ``tests/test_raster.py``)."""

    rows: int
    cols: int
    lat_min: float = -90.0
    lat_max: float = 90.0
    lon_min: float = -180.0
    lon_max: float = 180.0

    @property
    def dlat(self) -> float:
        return (self.lat_max - self.lat_min) / self.rows

    @property
    def dlon(self) -> float:
        return (self.lon_max - self.lon_min) / self.cols

    def row_centers(self, r0: int, r1: int) -> np.ndarray:
        return self.lat_min + (np.arange(r0, r1, dtype=np.float64) + 0.5) * self.dlat

    def col_centers(self) -> np.ndarray:
        return self.lon_min + (np.arange(self.cols, dtype=np.float64) + 0.5) * self.dlon

    def rect_bounds(self, row_lo, row_hi, col_lo, col_hi):
        """Outer lat/lon edges of a pixel rectangle (inclusive indices);
        vectorized over arrays."""
        row_lo = np.asarray(row_lo, dtype=np.float64)
        row_hi = np.asarray(row_hi, dtype=np.float64)
        col_lo = np.asarray(col_lo, dtype=np.float64)
        col_hi = np.asarray(col_hi, dtype=np.float64)
        return (
            self.lat_min + row_lo * self.dlat,
            self.lat_min + (row_hi + 1.0) * self.dlat,
            self.lon_min + col_lo * self.dlon,
            self.lon_min + (col_hi + 1.0) * self.dlon,
        )


def _empty_runs() -> pa.Table:
    return pa.table(
        {f.name: pa.array([], f.type) for f in RUNS_SCHEMA}
    )


def band_label_grids(
    areas: dict[int, dict], grid: RasterGrid, r0: int, r1: int
) -> tuple[np.ndarray, np.ndarray]:
    """Dense ``(label, n_areas)`` int64 grids for pixel rows [r0, r1).

    Painter's algorithm: candidates sorted by (area DESC, id DESC) are
    painted in order, so the LAST writer of a pixel is the smallest
    ``(area, id)`` containing area — the PIP-descent leaf. Each area
    touches only its bbox's pixel window."""
    nrows = r1 - r0
    label = np.full((nrows, grid.cols), -1, dtype=np.int64)
    count = np.zeros((nrows, grid.cols), dtype=np.int64)
    band_lats = grid.row_centers(r0, r1)
    col_lons = grid.col_centers()
    band_lat_lo = grid.lat_min + r0 * grid.dlat
    band_lat_hi = grid.lat_min + r1 * grid.dlat

    cands = [
        (aid, a)
        for aid, a in areas.items()
        if a["bbox"][2] >= band_lat_lo and a["bbox"][0] <= band_lat_hi
    ]
    cands.sort(key=lambda t: (-t[1]["area"], -t[0]))
    for aid, a in cands:
        min_lat, min_lon, max_lat, max_lon = a["bbox"]
        ilo = int(np.searchsorted(band_lats, min_lat, "left"))
        ihi = int(np.searchsorted(band_lats, max_lat, "right"))
        jlo = int(np.searchsorted(col_lons, min_lon, "left"))
        jhi = int(np.searchsorted(col_lons, max_lon, "right"))
        if ilo >= ihi or jlo >= jhi:
            continue
        ring = PreparedRing(a["lats"], a["lons"])
        sub_lats = band_lats[ilo:ihi]
        sub_lons = col_lons[jlo:jhi]
        m = ring.contains(
            np.repeat(sub_lats, sub_lons.size), np.tile(sub_lons, sub_lats.size)
        ).reshape(sub_lats.size, sub_lons.size)
        count[ilo:ihi, jlo:jhi] += m
        lbl = label[ilo:ihi, jlo:jhi]
        lbl[m] = aid
    return label, count


def _rle_band(label: np.ndarray, count: np.ndarray, r0: int) -> pa.Table:
    """Per-row RLE of the band grids; runs break when label OR depth
    changes; background (label == -1) runs are dropped."""
    rows_out, lo_out, hi_out, id_out, n_out = [], [], [], [], []
    ncols = label.shape[1]
    for i in range(label.shape[0]):
        lr, nr = label[i], count[i]
        change = np.flatnonzero((lr[1:] != lr[:-1]) | (nr[1:] != nr[:-1]))
        starts = np.concatenate(([0], change + 1))
        ends = np.concatenate((change, [ncols - 1]))
        keep = lr[starts] != -1
        if not keep.any():
            continue
        s, e = starts[keep], ends[keep]
        rows_out.append(np.full(s.size, r0 + i, dtype=np.int64))
        lo_out.append(s.astype(np.int64))
        hi_out.append(e.astype(np.int64))
        id_out.append(lr[s])
        n_out.append(nr[s])
    if not rows_out:
        return _empty_runs()
    return pa.table(
        {
            "pix_row": np.concatenate(rows_out),
            "col_lo": np.concatenate(lo_out),
            "col_hi": np.concatenate(hi_out),
            "area_id": np.concatenate(id_out),
            "n_areas": np.concatenate(n_out),
        }
    )


def rasterize_areas(
    pack: dict, grid: RasterGrid, *, band_rows: int = 64
) -> rd.Dataset:
    """vector→raster: the area pack sampled on ``grid``, returned as the
    sparse run table (``RUNS_SCHEMA``). One task per row-strip band; the
    pack is broadcast once."""
    n_bands = -(-grid.rows // band_rows)
    pack_ref = ray.put(pack["areas"])

    def fn(batch: pa.Table) -> pa.Table:
        areas = ray.get(pack_ref)
        parts = []
        for b in batch["id"].to_pylist():
            r0 = b * band_rows
            r1 = min(r0 + band_rows, grid.rows)
            label, count = band_label_grids(areas, grid, r0, r1)
            parts.append(_rle_band(label, count, r0))
        out = pa.concat_tables(parts) if parts else _empty_runs()
        return out if out.num_rows else _empty_runs()

    bands = rd.range(n_bands, override_num_blocks=n_bands)
    return bands.map_batches(fn, batch_format="pyarrow")


def rasterize_areas_grouped(
    areas: rd.Dataset, grid: RasterGrid, *, band_rows: int = 64
) -> rd.Dataset:
    """Scale-path vector→raster: the SAME output as
    :func:`rasterize_areas`, but instead of broadcasting the whole
    catalog, each area's ring ships (flat-map) to exactly the row-strip
    bands its bbox intersects, and one ``groupby(band)`` task rasterizes
    each band from its OWN group rows — no worker ever holds more than
    one band's areas, so the polygon side can exceed any single heap
    (the 13 GB planet-areas case, SURVEY.md §6). Band cardinality is
    ``rows/band_rows`` (low), so the plain Ray groupby is fine; a
    planet-spanning area replicates to every band it crosses — the same
    bounded replication the graph builder uses for covering parents.

    Input: the areas Dataset (``resolve_areas`` output schema)."""

    def assign(batch: pa.Table) -> pa.Table:
        min_lat = batch["min_lat"].to_numpy()
        max_lat = batch["max_lat"].to_numpy()
        step = band_rows * grid.dlat
        b_lo = np.clip(
            np.floor((min_lat - grid.lat_min) / step).astype(np.int64),
            0,
            (grid.rows - 1) // band_rows,
        )
        b_hi = np.clip(
            np.floor((max_lat - grid.lat_min) / step).astype(np.int64),
            0,
            (grid.rows - 1) // band_rows,
        )
        reps = (b_hi - b_lo + 1).astype(np.int64)
        idx = np.repeat(np.arange(len(batch)), reps)
        offs = np.arange(int(reps.sum())) - np.repeat(np.cumsum(reps) - reps, reps)
        out = batch.select(
            ["area_id", "lats", "lons", "area", "min_lat", "min_lon", "max_lat", "max_lon"]
        ).take(pa.array(idx, pa.int64()))
        return out.append_column("band", pa.array(b_lo[idx] + offs, pa.int64()))

    def raster_band(group: pd.DataFrame) -> pd.DataFrame:
        b = int(group["band"].iloc[0])
        r0 = b * band_rows
        r1 = min(r0 + band_rows, grid.rows)
        areas_dict = {
            int(r["area_id"]): {
                "lats": np.asarray(r["lats"], dtype=np.float64),
                "lons": np.asarray(r["lons"], dtype=np.float64),
                "bbox": (r["min_lat"], r["min_lon"], r["max_lat"], r["max_lon"]),
                "area": float(r["area"]),
            }
            for _, r in group.iterrows()
        }
        label, count = band_label_grids(areas_dict, grid, r0, r1)
        return _rle_band(label, count, r0).to_pandas()

    from .shuffle import grouped_map

    tagged = areas.map_batches(assign, batch_format="pyarrow")
    return grouped_map(tagged, "band", raster_band, batch_format="pandas")


def runs_to_labels(
    runs: pd.DataFrame, grid: RasterGrid
) -> tuple[np.ndarray, np.ndarray]:
    """Expand a run table back to dense (label, n_areas) grids — the
    inverse of the RLE, for tests/inspection only (dense at full grid)."""
    label = np.full((grid.rows, grid.cols), -1, dtype=np.int64)
    count = np.zeros((grid.rows, grid.cols), dtype=np.int64)
    for r, lo, hi, aid, n in zip(
        runs["pix_row"], runs["col_lo"], runs["col_hi"], runs["area_id"], runs["n_areas"]
    ):
        label[r, lo : hi + 1] = aid
        count[r, lo : hi + 1] = n
    return label, count


_RECT_KEY = ["area_id", "n_areas", "col_lo", "col_hi"]


def merge_runs_to_rects(df: pd.DataFrame) -> pd.DataFrame:
    """Pure gaps-and-islands merge of a run table into maximal
    rectangles (sort, shift-compare, cumsum — no per-group Python).
    Exact for any subset of runs that is closed under the rect key
    (``_RECT_KEY``); :func:`polygonize_runs` guarantees that via
    hash partitioning."""
    df = df.sort_values([*_RECT_KEY, "pix_row"], kind="mergesort").reset_index(
        drop=True
    )
    key_change = df[_RECT_KEY].ne(df[_RECT_KEY].shift()).any(axis=1)
    row_break = df["pix_row"].ne(df["pix_row"].shift() + 1)
    isl = (key_change | row_break).cumsum()
    g = df.groupby(isl, sort=False)
    return pd.DataFrame(
        {
            "area_id": g["area_id"].first().to_numpy(),
            "n_areas": g["n_areas"].first().to_numpy(),
            "row_lo": g["pix_row"].min().to_numpy(),
            "row_hi": g["pix_row"].max().to_numpy(),
            "col_lo": g["col_lo"].first().to_numpy(),
            "col_hi": g["col_hi"].first().to_numpy(),
        }
    )


def polygonize_runs(runs: rd.Dataset, *, num_partitions: int = 32) -> rd.Dataset:
    """raster→vector: merge vertically adjacent runs with identical
    ``(area_id, n_areas, col_lo, col_hi)`` into maximal rectangles
    ``(area_id, n_areas, row_lo, row_hi, col_lo, col_hi)``.

    A rectangle's runs all share the hash key, so the partition-hashed
    aggregate sees every candidate merge locally; the merge is
    :func:`merge_runs_to_rects`."""
    return partitioned_aggregate(
        runs, _RECT_KEY, merge_runs_to_rects, num_partitions=num_partitions
    )


def rects_to_runs(rects: pd.DataFrame) -> pd.DataFrame:
    """Re-expand rectangles to per-row runs (vector→raster for
    rectangle inputs): the roundtrip inverse of :func:`polygonize_runs`."""
    reps = (rects["row_hi"] - rects["row_lo"] + 1).to_numpy()
    idx = np.repeat(np.arange(len(rects)), reps)
    offs = np.arange(int(reps.sum())) - np.repeat(np.cumsum(reps) - reps, reps)
    return pd.DataFrame(
        {
            "pix_row": rects["row_lo"].to_numpy()[idx] + offs,
            "col_lo": rects["col_lo"].to_numpy()[idx],
            "col_hi": rects["col_hi"].to_numpy()[idx],
            "area_id": rects["area_id"].to_numpy()[idx],
            "n_areas": rects["n_areas"].to_numpy()[idx],
        }
    )


def write_raster_bands(
    runs: rd.Dataset, grid: RasterGrid, out_root: str, *, band_rows: int = 64
) -> list[str]:
    """Materialize the run table as per-band parquet partitions
    (``band=<k>/runs.parquet``) with lineage manifests; returns newly
    committed partition names. Committed bands short-circuit worker-side
    (checkpoint resume); bands with no runs (all background) write an
    empty partition so a resume run skips them too."""

    def tag(batch: pa.Table) -> pa.Table:
        # integer divide truncates == floor (pix_row >= 0)
        band = pa.compute.divide(batch["pix_row"], band_rows)
        return batch.append_column("band", pa.compute.cast(band, pa.int64()))

    def write_band(group: pd.DataFrame) -> pd.DataFrame:
        import pyarrow.parquet as pq

        part = f"band={int(group['band'].iloc[0]):05d}"
        if is_committed(out_root, part):
            return pd.DataFrame({"band": [part], "new": [False]})
        # drop the zero-width sentinel; what remains is the band's data
        data = (
            group[group["col_hi"] >= group["col_lo"]]
            .drop(columns="band")
            .sort_values(["pix_row", "col_lo"])
        )

        def write_fn(tmp_dir):
            pq.write_table(
                pa.Table.from_pandas(data, preserve_index=False).cast(RUNS_SCHEMA),
                f"{tmp_dir}/runs.parquet",
            )

        commit_partition(
            out_root,
            part,
            write_fn,
            PartitionManifest(
                partition=part,
                rows=len(data),
                fingerprint=f"{len(data)}r/{int((data['col_hi'] - data['col_lo'] + 1).sum())}px",
                inputs=["areas", "graph_edges"],
            ),
        )
        return pd.DataFrame({"band": [part], "new": [True]})

    # union one zero-width sentinel run per band so all-background bands
    # still form a group and commit an (empty) partition — a resume run
    # then skips them instead of recomputing
    n_bands = -(-grid.rows // band_rows)
    sentinels = rd.range(n_bands, override_num_blocks=1).map_batches(
        lambda b: pa.table(
            {
                "pix_row": pa.compute.cast(
                    pa.compute.multiply(b["id"], band_rows), pa.int64()
                ),
                "col_lo": pa.array([0] * len(b), pa.int64()),
                "col_hi": pa.array([-1] * len(b), pa.int64()),
                "area_id": pa.array([-1] * len(b), pa.int64()),
                "n_areas": pa.array([0] * len(b), pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )
    tagged = runs.union(sentinels).map_batches(tag, batch_format="pyarrow")
    from .shuffle import grouped_map

    res = grouped_map(
        tagged, "band", write_band, batch_format="pandas"
    ).to_pandas()
    if res.empty or "band" not in res.columns:
        return []
    return sorted(res[res["new"]]["band"])


def read_raster_bands(out_root: str) -> rd.Dataset:
    """Read back a committed raster (all band partitions) as one run
    Dataset — the raster→vector entry point for on-disk rasters."""
    return rd.read_parquet(out_root, file_extensions=["parquet"])


def raster_lookup(
    out_root: str,
    grid: RasterGrid,
    lat: float,
    lon: float,
    *,
    band_rows: int = 64,
) -> dict:
    """Point query against a MATERIALIZED raster: reads exactly ONE band
    partition (pushdown-filtered to the point's pixel row) and answers
    the leaf label + depth from its runs — the raster analog of the
    tile-served reverse geocode (``serve.TileServer``): a server answers
    from the committed ``band=…`` partitions without the polygon catalog
    in memory. Returns ``{"area_id": -1, "n_areas": 0}`` for background
    (ocean) pixels and out-of-grid points."""
    import pyarrow.parquet as pq

    i = int(np.floor((lat - grid.lat_min) / grid.dlat))
    j = int(np.floor((lon - grid.lon_min) / grid.dlon))
    if not (0 <= i < grid.rows and 0 <= j < grid.cols):
        return {"area_id": -1, "n_areas": 0, "pix_row": i, "pix_col": j}
    part = os.path.join(out_root, f"band={i // band_rows:05d}", "runs.parquet")
    miss = {"area_id": -1, "n_areas": 0, "pix_row": i, "pix_col": j}
    if not os.path.exists(part):
        return miss
    t = pq.read_table(part, filters=[("pix_row", "=", i)])
    lo = t["col_lo"].to_numpy()
    hit = np.flatnonzero((lo <= j) & (t["col_hi"].to_numpy() >= j))
    if hit.size == 0:
        return miss
    k = int(hit[0])
    return {
        "area_id": int(t["area_id"][k].as_py()),
        "n_areas": int(t["n_areas"][k].as_py()),
        "pix_row": i,
        "pix_col": j,
    }
