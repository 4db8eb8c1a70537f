"""End-to-end page-join tests: extraction invariant, PIP descent paths,
kNN fallback, naming, tile assignment; broadcast vs salted-partitioned
join parity (the N-vs-4N determinism surface)."""

import numpy as np
import pandas as pd
import pytest

from osm_jigsaw_ray.fixtures import BOXES, build_osm_fixture_tables, generate_pages
from osm_jigsaw_ray.geometry import geohash_encode
from osm_jigsaw_ray.pipelines.areas import areas_dataset_from_df, resolve_areas
from osm_jigsaw_ray.pipelines.graph import build_graph_edges
from osm_jigsaw_ray.pipelines.pages import (
    extract_pages,
    geo_join_pages,
    geo_join_pages_partitioned,
)
from osm_jigsaw_ray.pipelines.tags import extract_taggings, taggings_to_dict
from osm_jigsaw_ray.stages.pip import build_area_pack

N_PAGES = 300


@pytest.fixture(scope="module")
def polygon_side(ray_session):
    import ray.data as rd

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
    return build_area_pack(areas_df, edges_df, taggings), areas_df, edges_df


@pytest.fixture(scope="module")
def joined(polygon_side):
    import ray.data as rd

    pack, _, _ = polygon_side
    pages = rd.from_arrow(generate_pages(N_PAGES))
    out = geo_join_pages(pages, pack, concurrency=2, extract_concurrency=2)
    df = out.to_pandas().sort_values("url").reset_index(drop=True)
    return df


def test_extraction_byte_identical(ray_session):
    import ray.data as rd

    pages = generate_pages(200)
    extracted = extract_pages(rd.from_arrow(pages), concurrency=2).to_pandas()
    extracted = extracted.sort_values("url").reset_index(drop=True)
    want = pages.to_pandas().sort_values("url").reset_index(drop=True)
    assert (extracted["text"] == want["text"]).all()
    assert "html" not in extracted.columns


def test_geo_resolution_roundtrips_points(ray_session):
    import ray.data as rd

    from osm_jigsaw_ray.fixtures import page_points

    pages = generate_pages(200)
    extracted = extract_pages(rd.from_arrow(pages), concurrency=2).to_pandas()
    extracted = extracted.sort_values("url").reset_index(drop=True)
    lat, lon = page_points(np.arange(200))
    assert np.array_equal(extracted["lat"].to_numpy(), lat)
    assert np.array_equal(extracted["lon"].to_numpy(), lon)


def _expected_region(i: int) -> str:
    u = ((i * 2654435761 + 12345) % 4294967296) / 4294967296.0
    for kind, hi in [
        ("megacity", 0.35), ("small", 0.50), ("medium_band", 0.60),
        ("fits_both", 0.70), ("left_only", 0.80), ("arch", 0.90), ("ocean", 1.01),
    ]:
        if u < hi:
            return kind
    raise AssertionError


def test_join_rows_nested_paths(joined, polygon_side):
    pack, areas_df, _ = polygon_side

    def area_id_of(osm_suffix_box):
        lat0, lat1, lon0, lon1 = BOXES[osm_suffix_box]
        m = areas_df[
            (areas_df["min_lat"] == lat0) & (areas_df["max_lat"] == lat1)
            & (areas_df["min_lon"] == lon0) & (areas_df["max_lon"] == lon1)
        ]
        assert len(m) == 1
        return int(m.iloc[0]["area_id"])

    large, excl, med, small = (
        area_id_of("large"), area_id_of("excluded"),
        area_id_of("medium"), area_id_of("small"),
    )
    for i, row in joined.iterrows():
        region = _expected_region(i)
        paths = [list(p) for p in row["paths"]]
        area_ids = list(row["area_ids"])
        if region == "small":
            assert paths == [[large, excl, med, small]]
        elif region == "medium_band":
            assert paths == [[large, excl, med]]
        elif region == "megacity":
            assert area_ids == [area_id_of("megacity")]
        elif region == "ocean":
            assert len(area_ids) == 0
            assert row["nearest_area_id"] >= 0
        elif region == "fits_both":
            # multi-parent: two paths, one through left, one through overlapping
            assert len(paths) == 2
            leaves = {p[-1] for p in paths}
            assert leaves == {area_id_of("fits_both")}
            firsts = {p[0] for p in paths}
            assert firsts == {area_id_of("left"), area_id_of("overlapping")}


def test_join_rows_naming(joined):
    for i, row in joined.iterrows():
        region = _expected_region(i)
        if region == "small":
            # excluded (timezone) dropped; largest-first concatenation;
            # lang-preferred name for 'small' where available
            if row["lang"] == "de":
                assert row["name"] == "Grossland, Medium, Kleinburg"
            elif row["lang"] == "en":
                assert row["name"] == "Large, Medium, Small"
            else:  # fr/es: no name:<lang> -> fallback to bare `name`
                assert row["name"] == "Large, Medium, Klein"
        elif region == "megacity":
            assert row["name"] == "Megacity"
        elif region == "left_only":
            assert row["name"] == "Left"


def test_tile_assignment_matches_geohash(joined):
    want = geohash_encode(
        joined["lat"].to_numpy(), joined["lon"].to_numpy(), 3
    )
    assert (joined["cell_id"].to_numpy() == want).all()


def test_reverse_point_api(polygon_side):
    from osm_jigsaw_ray.stages.pip import reverse_point

    pack, _, _ = polygon_side
    # point inside the nested chain
    r = reverse_point(pack, 0.5, 0.5)
    assert r["name"] == "Large, Medium, Small"
    assert len(r["paths"]) == 1 and len(r["paths"][0]) == 4
    assert r["nearest_area_id"] is None
    r_de = reverse_point(pack, 0.5, 0.5, language="de")
    assert r_de["name"] == "Grossland, Medium, Kleinburg"
    # ocean point: kNN fallback
    r2 = reverse_point(pack, 82.0, 170.0)
    assert r2["area_ids"] == [] and r2["nearest_area_id"] is not None


def test_nan_point_rows_are_flagged_not_fabricated(polygon_side, ray_session):
    # pages whose html had no geo.position meta carry NaN lat/lon: they
    # must get cell_id="", nearest_area_id=-1, name="" — not the
    # first area by argmin-over-NaN + a garbage geohash
    import pyarrow as pa

    from osm_jigsaw_ray.stages.pip import PipJoiner

    pack, _, _ = polygon_side
    joiner = PipJoiner(pack)
    batch = pa.table(
        {
            "lat": pa.array([float("nan"), 0.5, float("nan")], pa.float64()),
            "lon": pa.array([0.5, 0.5, float("nan")], pa.float64()),
            "lang": pa.array(["en", "en", "en"], pa.string()),
        }
    )
    out = joiner(batch).to_pylist()
    for row in (out[0], out[2]):
        assert row["cell_id"] == ""
        assert row["nearest_area_id"] == -1
        assert row["name"] == ""
        assert row["area_ids"] == []
    assert out[1]["nearest_area_id"] == -1 and out[1]["area_ids"] != []


def _box_pack(boxes: dict[int, tuple]) -> dict:
    areas = {}
    for aid, (lat0, lat1, lon0, lon1) in boxes.items():
        lats = np.array([lat0, lat0, lat1, lat1], dtype=float)
        lons = np.array([lon0, lon1, lon1, lon0], dtype=float)
        areas[aid] = {
            "lats": lats,
            "lons": lons,
            "bbox": (lat0, lon0, lat1, lon1),
            "area": (lat1 - lat0) * (lon1 - lon0),
            "osm_ids": [f"{aid}W"],
        }
    return {
        "areas": areas,
        "children": {-1: sorted(boxes)},
        "top_level": sorted(boxes),
        "taggings": {},
    }


def test_partitioned_knn_fallback_is_global(ray_session):
    # a miss INSIDE a covered cell must still resolve against ALL area
    # centroids (the shared kNN side object), not just the cell's subset:
    # point (44, 0.8) sits in box 1's cell but its true nearest centroid
    # is box 2 in a different cell — the per-cell pack (which carries
    # only box 1) must answer through the shared side
    import pyarrow as pa

    from osm_jigsaw_ray.stages.pip import PipJoiner, build_knn_side

    pack = _box_pack({1: (0, 1, 0, 1), 2: (50, 51, 0, 1)})
    shared = build_knn_side(pack)
    cell_pack = _box_pack({1: (0, 1, 0, 1)})
    cell_pack.pop("taggings")  # taggings ride the shared side per-cell
    batch = pa.table(
        {
            "lat": pa.array([44.0], pa.float64()),
            "lon": pa.array([0.8], pa.float64()),
            "lang": pa.array(["en"], pa.string()),
        }
    )
    assert 2 not in cell_pack["areas"]  # the scenario: nearest not in cell
    part = PipJoiner(cell_pack, shared=shared)(batch).to_pylist()[0]
    full = PipJoiner(pack)(batch).to_pylist()[0]
    assert part["nearest_area_id"] == full["nearest_area_id"] == 2


def test_fallback_naming_chains_to_shared_projection(ray_session):
    # a cell pack carrying its OWN (co-partition-routed) taggings must
    # still name an out-of-cell kNN-fallback area through the shared
    # side's naming projection — the _ChainTags local→fallback order
    import pyarrow as pa

    from osm_jigsaw_ray.stages.pip import PipJoiner, build_knn_side

    pack = _box_pack({1: (0, 1, 0, 1), 2: (50, 51, 0, 1)})
    pack["taggings"] = {
        "1W": {"name": "Local Box", "admin_level": "4"},
        "2W": {"name": "Far Box", "wikidata": "Q2"},
    }
    shared = build_knn_side(pack)  # projection only
    assert shared["taggings"]["2W"] == {"name": "Far Box"}
    cell_pack = _box_pack({1: (0, 1, 0, 1)})
    cell_pack["taggings"] = {"1W": {"name": "Local Box", "admin_level": "4"}}
    batch = pa.table(
        {
            "lat": pa.array([44.0, 0.5], pa.float64()),
            "lon": pa.array([0.8, 0.5], pa.float64()),
            "lang": pa.array(["en", "en"], pa.string()),
        }
    )
    rows = PipJoiner(cell_pack, shared=shared)(batch).to_pylist()
    assert rows[0]["nearest_area_id"] == 2 and rows[0]["name"] == "Far Box"
    assert rows[1]["name"] == "Local Box"  # in-cell: pack-local tags win


@pytest.mark.parametrize("route_tags", [True, False])
def test_partitioned_join_matches_broadcast(polygon_side, route_tags):
    # route_tags=True: tag rows ride the wide-union co-partition
    # (kind=3) and shared carries only slim arrays + naming projection;
    # route_tags=False: no tag routing — ALL naming reads the shared
    # projection, which must still be exact (project_naming_tags keeps
    # every naming-relevant key)
    import ray.data as rd

    from osm_jigsaw_ray.stages.pip import build_knn_side

    pack, areas_df, edges_df = polygon_side
    pages = rd.from_arrow(generate_pages(N_PAGES))
    broadcast = (
        geo_join_pages(pages, pack, concurrency=2, extract_concurrency=2)
        .to_pandas().sort_values("url").reset_index(drop=True)
    )
    pages2 = rd.from_arrow(generate_pages(N_PAGES))
    partitioned = (
        geo_join_pages_partitioned(
            pages2, areas_df, edges_df, build_knn_side(pack),
            taggings=pack["taggings"] if route_tags else None,
            cell_precision=2, hot_cell_threshold=50, hot_cell_salt=4,
        )
        .to_pandas().sort_values("url").reset_index(drop=True)
    )
    cols = ["url", "cell_id", "nearest_area_id", "name"]
    pd.testing.assert_frame_equal(broadcast[cols], partitioned[cols])
    assert broadcast["area_ids"].map(list).equals(partitioned["area_ids"].map(list))
    assert broadcast["paths"].map(
        lambda ps: [list(p) for p in ps]
    ).equals(partitioned["paths"].map(lambda ps: [list(p) for p in ps]))


# ---------------------------------------------------------------------------
# vectorized extract/enrich vs row-wise reference definitions
# ---------------------------------------------------------------------------

def _rowwise_extract(batch):
    """The round-1 per-row definition of PageExtractor (regex per page),
    kept as the executable spec for the vectorized stage."""
    import html as _htmlmod
    import re

    import numpy as np
    import pyarrow as pa

    article = re.compile(rb"<article>(.*?)</article>", re.S)
    geo = re.compile(rb'name="geo\.position" content="([^";]+);([^"]+)"')
    tags = re.compile(rb"<[^>]+>")
    htmls = batch["html"].to_pylist()
    n = len(htmls)
    texts, fulls = [""] * n, [""] * n
    lats, lons = np.full(n, np.nan), np.full(n, np.nan)
    for i, h in enumerate(htmls):
        if h is None:
            continue
        m = article.search(h)
        if m:
            texts[i] = _htmlmod.unescape(m.group(1).decode("utf-8"))
        g = geo.search(h)
        if g:
            lats[i] = float(g.group(1))
            lons[i] = float(g.group(2))
        fulls[i] = tags.sub(b" ", h).decode("utf-8", "replace")
    return texts, lats, lons, fulls


def _rowwise_enrich(texts):
    """Round-1 per-row PageEnricher definition (token loop per page).
    Case folding pinned to Arrow utf8_lower — the stage's canonical
    semantic (differs from str.lower for e.g. U+0130)."""
    import re
    import zlib

    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from osm_jigsaw_ray.stages.enrich import STOPWORDS, _LANG_MARKERS, _LANGS_SORTED

    token_re = re.compile(r"[a-z0-9]+")
    bitcols = np.arange(64, dtype=np.uint64)
    out = []
    for t in texts:
        low = pc.utf8_lower(pa.array([t or ""]))[0].as_py()
        toks = token_re.findall(low)
        n_tok = len(toks)
        stop = sum(w in STOPWORDS for w in toks) / n_tok if toks else 0.0
        best_lang, best = "und", 0
        for lang in _LANGS_SORTED:
            hits = sum(w in _LANG_MARKERS[lang] for w in toks[:64])
            if hits > best:
                best, best_lang = hits, lang
        sim = 0
        if toks:
            window = toks[:256]
            th = np.fromiter(
                (
                    (zlib.crc32(w.encode()) << 32) | zlib.crc32(w[::-1].encode())
                    for w in window
                ),
                dtype=np.uint64,
                count=len(window),
            )
            bits = (th[:, None] >> bitcols[None, :]) & np.uint64(1)
            votes = np.where(bits.astype(bool), 1, -1).sum(axis=0)
            sig = ((votes > 0).astype(np.uint64) << bitcols).sum()
            sim = int(sig >> np.uint64(1))
        out.append((n_tok, stop, best_lang, sim))
    return out


def test_extract_enrich_match_rowwise_reference(ray_session):
    import numpy as np
    import pyarrow as pa

    from osm_jigsaw_ray.fixtures import generate_pages
    from osm_jigsaw_ray.stages.enrich import PageEnricher
    from osm_jigsaw_ray.stages.extract import PageExtractor

    batch = generate_pages(300, filler_kb=1)
    tricky = pa.table(
        {
            "url": pa.array(["t1", "t2", "t3", "t4", "t5"]),
            "warc_ts": pa.array([None] * 5, batch.schema.field("warc_ts").type),
            "html": pa.array(
                [
                    b'<html><meta name="geo.position" content="1.5;-2.25">'
                    b"<article>a &amp; b &lt;x&gt; &amp;lt; &quot;q&#x27; &ampx</article></html>",
                    "<article>  der die und ist das über 42 </article>".encode(),
                    b"<html><body>no article</body></html>",
                    b"",
                    None,
                ],
                pa.binary(),
            ),
            "text": pa.array([None] * 5, pa.large_string()),
            "lang": pa.array(["en", "de", None, "fr", "es"]),
        }
    )
    batch = pa.concat_tables([batch.select(tricky.column_names), tricky]).combine_chunks()

    got = PageExtractor(full_text=True)(batch)
    texts, lats, lons, fulls = _rowwise_extract(batch)
    assert got["text"].to_pylist() == texts
    assert got["full_text"].to_pylist() == fulls
    for a, b in zip(got["lat"].to_pylist(), lats):
        assert (a != a and b != b) or a == b
    for a, b in zip(got["lon"].to_pylist(), lons):
        assert (a != a and b != b) or a == b

    enr = PageEnricher()(got)
    want = _rowwise_enrich(fulls)
    assert enr["n_tokens"].to_pylist() == [w[0] for w in want]
    assert np.allclose(enr["stopword_ratio"].to_pylist(), [w[1] for w in want])
    assert enr["lang_pred"].to_pylist() == [w[2] for w in want]
    assert enr["simhash64"].to_pylist() == [w[3] for w in want]


def test_hot_cell_salting_splits_megacity_skew(ray_session):
    """Skew evidence (north_rule): the corpus concentrates ~35% of pages
    in the megacity cell; salting must spread that cell across
    hot_cell_salt buckets with bounded imbalance while leaving cold
    cells on one bucket, deterministically across runs."""
    import collections

    import ray.data as rd

    from osm_jigsaw_ray.fixtures import generate_pages
    from osm_jigsaw_ray.pipelines.pages import extract_pages, salt_pages_by_cell

    n = 20_000
    pages = rd.from_arrow(generate_pages(n))
    extracted = extract_pages(pages, concurrency=2)
    salted = salt_pages_by_cell(
        extracted, cell_precision=2, hot_cell_salt=8, hot_cell_threshold=2_000
    )
    keys = [r["shuffle_key"] for r in salted.select_columns(["shuffle_key"]).take_all()]
    by_cell = collections.defaultdict(collections.Counter)
    for k in keys:
        cell, salt = k.rsplit(":", 1)
        by_cell[cell][salt] += 1

    # megacity cell (~35% of pages) must split across all 8 salt buckets
    hot_cell = max(by_cell, key=lambda c: sum(by_cell[c].values()))
    hot_counts = by_cell[hot_cell]
    assert sum(hot_counts.values()) > 0.3 * n
    assert len(hot_counts) == 8
    # bounded imbalance: no salt bucket more than 2x the mean
    mean = sum(hot_counts.values()) / 8
    assert max(hot_counts.values()) < 2 * mean
    # cold cells stay on a single bucket (no pointless fan-out)
    for cell, counts in by_cell.items():
        if sum(counts.values()) < 2_000:
            assert set(counts) == {"0"}

    # determinism: same corpus -> byte-identical keys on a second pass
    salted2 = salt_pages_by_cell(
        extract_pages(rd.from_arrow(generate_pages(n)), concurrency=2),
        cell_precision=2, hot_cell_salt=8, hot_cell_threshold=2_000,
    )
    keys2 = [r["shuffle_key"] for r in salted2.select_columns(["shuffle_key"]).take_all()]
    assert sorted(keys) == sorted(keys2)


def test_write_join_rows_resumable(polygon_side, ray_session, tmp_path):
    """Checkpoint-resumable join output: one committed partition per
    input shard; a rerun rewrites nothing; a deleted partition (the
    crash-recovery case) is the ONLY thing a rerun recomputes; the
    union of shard outputs equals the streaming join's rows."""
    import os
    import shutil

    import pyarrow.parquet as pq
    import ray.data as rd

    from osm_jigsaw_ray.pipelines.pages import write_join_rows
    from osm_jigsaw_ray.state.manifest import read_manifest

    pack, _, _ = polygon_side
    corpus = str(tmp_path / "shards")
    rd.from_arrow(generate_pages(400)).repartition(4).write_parquet(corpus)

    out = str(tmp_path / "join_parts")
    done = write_join_rows(corpus, pack, out)
    assert len(done) == len(os.listdir(corpus))
    m = read_manifest(out, done[0])
    assert m is not None and m.rows > 0 and "join_s" in m.metrics

    # rerun: nothing recommitted
    assert write_join_rows(corpus, pack, out) == []

    # crash recovery: drop one partition, rerun recommits exactly it
    shutil.rmtree(os.path.join(out, done[0]))
    assert write_join_rows(corpus, pack, out) == [done[0]]

    got = (
        rd.read_parquet(out)
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    want = (
        geo_join_pages(
            rd.from_arrow(generate_pages(400)), pack,
            concurrency=2, extract_concurrency=2,
        )
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    assert len(got) == len(want) == 400
    assert (got["url"] == want["url"]).all()
    assert (got["name"] == want["name"]).all()
    assert (got["cell_id"] == want["cell_id"]).all()


def test_geo_join_tiled_matches_broadcast(polygon_side, ray_session, tmp_path):
    """The out-of-core tiled join (polygon side read lazily from tile
    partitions, never held whole anywhere) must produce exactly the
    broadcast join's rows — including ocean points via the shared
    global kNN fallback."""
    import ray.data as rd

    from osm_jigsaw_ray.pipelines.areas import areas_dataset_from_df
    from osm_jigsaw_ray.pipelines.pages import geo_join_pages_tiled
    from osm_jigsaw_ray.pipelines.tiling import (
        assign_area_tiles,
        tile_graph_edges,
        write_tiles,
    )
    from osm_jigsaw_ray.stages.pip import build_knn_side

    pack, areas_df, edges_df = polygon_side
    tiles = str(tmp_path / "tiles_join")
    assignments = assign_area_tiles(areas_dataset_from_df(areas_df), precision=2)
    write_tiles(
        areas_df,
        tile_graph_edges(rd.from_pandas(edges_df), assignments, join_partitions=4),
        pack["taggings"],
        tiles,
    )

    pages = rd.from_arrow(generate_pages(300))
    got = (
        geo_join_pages_tiled(
            pages, tiles, build_knn_side(pack),
            tiles_precision=2, hot_cell_threshold=50, hot_detect_sample=0.5,
        )
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    want = (
        geo_join_pages(
            rd.from_arrow(generate_pages(300)), pack,
            concurrency=2, extract_concurrency=2,
        )
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    assert len(got) == len(want) == 300
    for col in ("url", "name", "cell_id", "nearest_area_id"):
        assert (
            got[col].fillna(-1) == want[col].fillna(-1)
        ).all() if col == "nearest_area_id" else (got[col] == want[col]).all(), col
    assert [sorted(a) for a in got["area_ids"]] == [
        sorted(a) for a in want["area_ids"]
    ]


def test_build_knn_side_from_tables_matches_pack(polygon_side, ray_session):
    import ray.data as rd

    from osm_jigsaw_ray.pipelines.areas import areas_dataset_from_df
    from osm_jigsaw_ray.stages.pip import build_knn_side, build_knn_side_from_tables

    pack, areas_df, _ = polygon_side
    want = build_knn_side(pack)
    got = build_knn_side_from_tables(
        areas_dataset_from_df(areas_df), pack["taggings"]
    )
    assert (got["knn_ids"] == want["knn_ids"]).all()
    assert np.allclose(got["knn_lat"], want["knn_lat"])
    assert np.allclose(got["knn_lon"], want["knn_lon"])
    assert np.allclose(got["knn_area"], want["knn_area"])
    assert got["knn_osm"] == want["knn_osm"]
    assert got["taggings"] == want["taggings"]


def test_auto_partitions_rule(ray_session):
    """Pin the adaptive exchange-partition rule: max(floor, 16, cpus/2,
    input_bytes / 2 GB). The bytes term sizes partitions so a group
    block stays worker-heap-bounded at scale; the floor keeps small
    inputs off the tiny-shard overhead cliff (measured in
    BENCH_RESULTS.md round 5)."""
    from osm_jigsaw_ray.pipelines.pages import _auto_partitions

    class FakeDs:
        def __init__(self, nbytes):
            self._n = nbytes

        def size_bytes(self):
            return self._n

    # small input: the static floor dominates (test cluster is 4 cpus)
    assert _auto_partitions(FakeDs(1 << 20)) == 16
    # caller floor wins when larger
    assert _auto_partitions(FakeDs(1 << 20), floor=33) == 33
    # big input: one partition per 2 GB
    assert _auto_partitions(FakeDs(100 << 30)) == 50
    # size estimate unavailable: still the floor, never a crash
    class Broken:
        def size_bytes(self):
            raise RuntimeError("no plan")

    assert _auto_partitions(Broken()) == 16


def test_split_alnum_matches_regex():
    """The byte-level tokenizer is exactly the RE2 "[^a-z0-9]+" split
    minus its boundary empty tokens — including on multibyte UTF-8,
    case-foldings that land in the class (KELVIN SIGN → ascii 'k' via
    utf8_lower BEFORE either split), sliced arrays, and fuzzed rows."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from osm_jigsaw_ray.stages.enrich import split_alnum_tokens

    cases = [
        "hello world", "", "   ", "...", "a", "9", "!a!", "a!b c9 ",
        "Überraschung KELVIN K x", "café au lait", "tok" * 1000,
        "end9", "9start", "mixé9é9mix", "éé", "aéb",
        "multi\nline\ttabs", "🙂 emoji 🙂x9",
    ]
    rng = np.random.default_rng(7)
    alpha = list("abcXYZ019 .!éK\n")
    cases += [
        "".join(rng.choice(alpha, size=rng.integers(0, 60)))
        for _ in range(300)
    ]
    for arr in (
        pc.utf8_lower(pa.array(cases, pa.string())),
        pc.utf8_lower(pa.array(cases, pa.string())).slice(3, 11),
    ):
        flat, off = split_alnum_tokens(arr)
        fl = flat.to_pylist()
        got = [fl[off[i] : off[i + 1]] for i in range(len(arr))]
        want = [
            [t for t in row if t]
            for row in pc.split_pattern_regex(
                arr, pattern="[^a-z0-9]+"
            ).to_pylist()
        ]
        assert got == want
