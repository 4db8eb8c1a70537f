"""Real .osm.pbf ingestion seam (S1/S2): pure-python codec round-trip +
end-to-end parity of the pbf-sourced pipeline with the fixture-table
path (VERDICT r1 gap #1)."""

import numpy as np
import pyarrow as pa
import pytest

from osm_jigsaw_ray.fixtures import build_osm_fixture_tables
from osm_jigsaw_ray.sources.pbf import (
    decode_blob_range,
    read_osm_pbf,
    scan_blobs,
    write_osm_pbf,
)


@pytest.fixture(scope="module")
def pbf_file(tmp_path_factory):
    t = build_osm_fixture_tables()
    path = str(tmp_path_factory.mktemp("pbf") / "fixture.osm.pbf")
    write_osm_pbf(t, path, nodes_per_blob=40)  # several node blobs
    return path, t


def test_blob_catalog(pbf_file):
    path, t = pbf_file
    blobs = scan_blobs(path)
    assert len(blobs) >= 3  # >=1 per entity type, nodes split
    kinds = {k for b in blobs for k in b["kinds"]}
    assert kinds == {"nodes", "ways", "relations"}
    # a blob holds exactly one entity kind (writer layout, like the
    # reference's sectioned files)
    assert all(len(b["kinds"]) == 1 for b in blobs)


def test_roundtrip_tables(pbf_file, ray_session):
    path, t = pbf_file
    for name in ("nodes", "ways", "relations"):
        got = (
            read_osm_pbf(path, name)
            .to_pandas()
            .sort_values(t[name].column_names[0])
            .reset_index(drop=True)
        )
        want = t[name].to_pandas()
        assert len(got) == len(want)
        for col in t[name].column_names:
            a, b = got[col].tolist(), want[col].tolist()
            if col in ("lat", "lon"):
                assert np.allclose(a, b, atol=1e-9)
            else:
                # normalize nested numpy arrays for comparison
                norm = lambda v: (
                    [norm(x) for x in v]
                    if isinstance(v, (list, np.ndarray))
                    else v
                )
                assert [norm(x) for x in a] == [norm(x) for x in b], col


def test_per_type_read_skips_foreign_blobs(pbf_file):
    path, _ = pbf_file
    blobs = scan_blobs(path)
    way_blobs = [b for b in blobs if b["kinds"] == ["ways"]]
    assert way_blobs
    t = decode_blob_range(path, way_blobs[0]["offset"], way_blobs[0]["size"], "ways")
    assert t.num_rows > 0
    # decoding a node blob as ways yields zero rows, not an error
    node_blobs = [b for b in blobs if b["kinds"] == ["nodes"]]
    t2 = decode_blob_range(path, node_blobs[0]["offset"], node_blobs[0]["size"], "ways")
    assert t2.num_rows == 0


def test_pbf_to_areas_graph_matches_table_path(pbf_file, ray_session):
    """End-to-end: pbf → areas → containment DAG must equal the
    fixture-table pipeline (content-derived ids make outputs directly
    comparable)."""
    from osm_jigsaw_ray.pipelines.areas import areas_dataset_from_df, resolve_areas
    from osm_jigsaw_ray.pipelines.graph import build_graph_edges

    path, t = pbf_file
    import ray.data as rd

    def run(nodes, ways, relations):
        areas_df = resolve_areas(nodes, ways, relations, join_partitions=4).to_pandas()
        edges = build_graph_edges(
            areas_dataset_from_df(areas_df), precision=1, join_partitions=4
        ).to_pandas()
        a = areas_df.sort_values("area_id").reset_index(drop=True)
        e = edges.sort_values(["parent_area_id", "child_area_id"]).reset_index(
            drop=True
        )
        return a, e

    a1, e1 = run(
        read_osm_pbf(path, "nodes"),
        read_osm_pbf(path, "ways"),
        read_osm_pbf(path, "relations"),
    )
    a2, e2 = run(
        rd.from_arrow(t["nodes"]),
        rd.from_arrow(t["ways"]),
        rd.from_arrow(t["relations"]),
    )
    assert a1["area_id"].tolist() == a2["area_id"].tolist()
    assert np.allclose(a1["area"], a2["area"])
    assert e1.values.tolist() == e2.values.tolist()


def test_uvarints_np_matches_bytewise_decoder():
    """The numpy varint kernel is pinned against the per-byte reference
    decoder (_uvarint) over adversarial widths: group boundaries at
    every 7-bit step, 0, 1, max-uint64, and a random mix."""
    import numpy as np

    from osm_jigsaw_ray.sources.pbf import _enc_uvarint, _uvarint, _uvarints_np

    vals = [0, 1, 127, 128, 129, (1 << 14) - 1, 1 << 14, (1 << 21) - 1,
            (1 << 35) + 12345, (1 << 63) - 1, (1 << 64) - 1]
    rng = np.random.default_rng(7)
    vals += [int(x) for x in rng.integers(0, 1 << 62, size=500)]
    buf = b"".join(_enc_uvarint(v) for v in vals)
    got = _uvarints_np(buf)
    # reference: the per-byte loop
    want, pos = [], 0
    while pos < len(buf):
        v, pos = _uvarint(buf, pos)
        want.append(v)
    assert got.tolist() == want == [v & ((1 << 64) - 1) for v in vals]
    assert _uvarints_np(b"").size == 0
