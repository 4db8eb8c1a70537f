"""End-to-end CLI step-runner test: synth → areas → graph → tags → tile
→ join → dump over parquet on disk (the go.bash-analog lifecycle)."""

import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def built(ray_session, tmp_path_factory):
    from osm_jigsaw_ray.cli import main

    root = tmp_path_factory.mktemp("clirun")
    osm = str(root / "osm")
    build = str(root / "build")
    main(["synth", "--out", osm, "--pages", "200"])
    main(["areas", "--osm", osm, "--build", build, "--partitions", "4"])
    main(["graph", "--build", build, "--partitions", "4"])
    main(["tags", "--osm", osm, "--build", build])
    main(["tile", "--build", build, "--partitions", "4", "--tile-precision", "1"])
    main(["raster", "--build", build, "--raster-rows", "90", "--band-rows", "30"])
    main(["join", "--osm", osm, "--build", build, "--partitions", "4"])
    main(["dump", "--build", build])
    return osm, build


def test_cli_artifacts(built):
    import ray.data as rd

    osm, build = built
    areas = rd.read_parquet(f"{build}/areas").to_pandas()
    assert len(areas) == 15
    edges = rd.read_parquet(f"{build}/graph_edges").to_pandas()
    assert (edges["parent_area_id"] == -1).sum() > 0
    join_rows = rd.read_parquet(f"{build}/join_rows").to_pandas()
    assert len(join_rows) == 200
    assert {"url", "cell_id", "name", "nearest_area_id"} <= set(join_rows.columns)
    names = rd.read_parquet(f"{build}/leaf_names").to_pandas()
    assert len(names) > 5


def test_cli_raster_bands_resume(built, capsys):
    import os

    from osm_jigsaw_ray.cli import main

    osm, build = built
    bands = [d for d in os.listdir(f"{build}/raster") if d.startswith("band=")]
    assert len(bands) == 3  # 90 rows / 30 band_rows
    # rerun commits nothing new (manifest resume)
    main(["raster", "--build", build, "--raster-rows", "90", "--band-rows", "30"])
    out = capsys.readouterr().out
    assert "committed 0 new band partitions" in out


def test_cli_tile_partitions_resume(built, capsys):
    from osm_jigsaw_ray.cli import main

    osm, build = built
    import os

    tiles = [d for d in os.listdir(f"{build}/tiles") if d.startswith("tile=")]
    assert tiles
    # rerun commits nothing new
    main(["tile", "--build", build, "--partitions", "4", "--tile-precision", "1"])
    out = capsys.readouterr().out
    assert "committed 0 new partitions" in out
