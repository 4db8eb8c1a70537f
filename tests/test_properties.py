"""Property-based tests (hypothesis) — beyond the reference's
example-based strategy (SURVEY.md §5): the vectorized/accelerated
kernels must equal their naive definitions on arbitrary inputs, not
just the fixture geometries."""

import numpy as np
from hypothesis import given, settings, strategies as st

from osm_jigsaw_ray.geometry import PreparedRing, points_in_ring

coord = st.floats(
    min_value=-180.0, max_value=180.0, allow_nan=False, allow_infinity=False
)


@settings(max_examples=60, deadline=None)
@given(
    ring=st.lists(st.tuples(coord, coord), min_size=3, max_size=40),
    pts=st.lists(st.tuples(coord, coord), min_size=1, max_size=60),
)
def test_prepared_ring_equals_dense_on_arbitrary_polygons(ring, pts):
    rx = np.array([p[0] for p in ring])
    ry = np.array([p[1] for p in ring])
    px = np.array([p[0] for p in pts])
    py = np.array([p[1] for p in pts])
    dense = points_in_ring(rx, ry, px, py)
    fast = PreparedRing(rx, ry).contains(px, py)
    assert (dense == fast).all()


@settings(max_examples=40, deadline=None)
@given(
    cents=st.lists(
        st.tuples(st.integers(0, 100_000), coord, coord),
        min_size=1,
        max_size=80,
        unique_by=lambda t: t[0],
    ),
    pts=st.lists(st.tuples(coord, coord), min_size=1, max_size=40),
)
def test_grid_knn_equals_dense_argmin(cents, pts):
    from osm_jigsaw_ray.stages.pip import GridKNN

    order = np.argsort([c[0] for c in cents])
    ids = np.array([cents[i][0] for i in order], dtype=np.int64)
    clats = np.array([cents[i][1] for i in order])
    clons = np.array([cents[i][2] for i in order])
    plats = np.array([p[0] for p in pts])
    plons = np.array([p[1] for p in pts])
    got = GridKNN(ids, clats, clons).nearest(plats, plons)
    d2 = (clats[None, :] - plats[:, None]) ** 2 + (clons[None, :] - plons[:, None]) ** 2
    want = ids[np.argmin(d2, axis=1)]
    assert (got == want).all()


@settings(max_examples=60, deadline=None)
@given(
    a=st.integers(0, (1 << 61) - 2),
    b=st.integers(0, (1 << 61) - 2),
)
def test_modmul61_equals_bignum(a, b):
    from osm_jigsaw_ray.pipelines.mlops import _MERSENNE, _modmul61

    got = int(
        _modmul61(np.array([a], dtype=np.uint64), np.array([b], dtype=np.uint64))[0]
    )
    assert got == (a * b) % _MERSENNE


@settings(max_examples=30, deadline=None)
@given(
    texts=st.lists(
        st.text(
            alphabet=st.characters(
                codec="utf-8", exclude_categories=("Cs",)
            ),
            max_size=200,
        ),
        min_size=1,
        max_size=12,
    ).map(lambda ts: ts + ["İstanbul xİy ﬁnance ǅungla ẞHARP"])
)
def test_enricher_matches_rowwise_on_arbitrary_text(texts):
    """Vectorized PageEnricher == the round-1 per-row definition for
    arbitrary unicode input (the executable spec from test_pages, fed
    adversarial text instead of corpus html)."""
    import re
    import zlib

    import pyarrow as pa

    from osm_jigsaw_ray.stages.enrich import (
        _LANG_MARKERS,
        _LANGS_SORTED,
        STOPWORDS,
        PageEnricher,
    )

    import pyarrow.compute as pc

    batch = pa.table({"text": pa.array(texts, pa.large_string())})
    out = PageEnricher(source_col="text")(batch)

    token_re = re.compile(r"[a-z0-9]+")
    bitcols = np.arange(64, dtype=np.uint64)
    for i, t in enumerate(texts):
        # canonical case folding is Arrow utf8_lower (see enrich.py):
        # str.lower would decompose e.g. U+0130 and split the token
        low = pc.utf8_lower(pa.array([t or ""]))[0].as_py()
        toks = token_re.findall(low)
        assert out["n_tokens"][i].as_py() == len(toks)
        stop = sum(w in STOPWORDS for w in toks) / len(toks) if toks else 0.0
        assert abs(out["stopword_ratio"][i].as_py() - stop) < 1e-12
        best_lang, best = "und", 0
        for lang in _LANGS_SORTED:
            hits = sum(w in _LANG_MARKERS[lang] for w in toks[:64])
            if hits > best:
                best, best_lang = hits, lang
        assert out["lang_pred"][i].as_py() == best_lang
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
        assert out["simhash64"][i].as_py() == sim


@settings(max_examples=60, deadline=None)
@given(
    grid=st.integers(2, 12).flatmap(
        lambda rows: st.integers(2, 12).flatmap(
            lambda cols: st.lists(
                st.tuples(
                    st.integers(-1, 3),   # label (-1 = background)
                    st.integers(1, 4),    # depth
                ),
                min_size=rows * cols,
                max_size=rows * cols,
            ).map(lambda cells: (rows, cols, cells))
        )
    )
)
def test_raster_rle_polygonize_roundtrip_property(grid):
    """Any label/depth grid → RLE runs → rectangle merge → re-expansion
    reproduces exactly the original runs, and rects tile the labeled
    pixels without overlap."""
    import numpy as np
    import pandas as pd

    from osm_jigsaw_ray.pipelines.raster import (
        _rle_band,
        merge_runs_to_rects,
        rects_to_runs,
    )

    rows, cols, cells = grid
    label = np.array([c[0] for c in cells], dtype=np.int64).reshape(rows, cols)
    depth = np.array([c[1] for c in cells], dtype=np.int64).reshape(rows, cols)
    depth[label == -1] = 0
    runs = _rle_band(label, depth, 0).to_pandas()
    # expansion of runs reproduces the grid
    back = np.full((rows, cols), -1, dtype=np.int64)
    npx = 0
    for r in runs.itertuples():
        back[r.pix_row, r.col_lo : r.col_hi + 1] = r.area_id
        npx += r.col_hi - r.col_lo + 1
    assert (back == label).all()
    assert npx == int((label != -1).sum())  # no overlap, full cover
    if runs.empty:
        return
    rects = merge_runs_to_rects(runs)
    back_runs = (
        rects_to_runs(rects)
        .sort_values(["pix_row", "col_lo"])
        .reset_index(drop=True)
        .astype("int64")
    )
    exp = runs.sort_values(["pix_row", "col_lo"]).reset_index(drop=True).astype("int64")
    pd.testing.assert_frame_equal(back_runs[exp.columns.tolist()], exp)
    # maximality: no vertically adjacent same-key rects remain
    g = rects.sort_values(
        ["area_id", "n_areas", "col_lo", "col_hi", "row_lo"]
    ).groupby(["area_id", "n_areas", "col_lo", "col_hi"])
    assert not (
        rects.sort_values(["area_id", "n_areas", "col_lo", "col_hi", "row_lo"])["row_lo"]
        == g["row_hi"].shift() + 1
    ).any()


@given(
    st.lists(
        st.one_of(
            st.text(
                alphabet=st.characters(min_codepoint=33, max_codepoint=126),
                min_size=0,
                max_size=20,
            ),
            # fallback-path keys: >64 bytes and non-ascii — co-batching
            # one of these with short keys must not change the short
            # keys' hashes (regression: the fallback used to flip the
            # WHOLE batch to crc32)
            st.text(
                alphabet=st.characters(min_codepoint=33, max_codepoint=126),
                min_size=65,
                max_size=80,
            ),
            st.text(
                alphabet=st.characters(min_codepoint=0xE0, max_codepoint=0x10F),
                min_size=1,
                max_size=10,
            ),
        ),
        min_size=1,
        max_size=30,
    )
)
@settings(max_examples=200, deadline=None)
def test_hash_strings_batch_invariant(keys):
    """A key's hash must not depend on which batch it appears in (batch
    max width varies) — the invariant partitioned aggregation relies on
    (same key -> same partition). Regressions covered: the first
    vectorized hash right-padded to the BATCH max width, splitting keys
    across partitions; the crc32 fallback then triggered per-BATCH
    (any >64-byte or non-ascii key flipped every co-batched short key
    to the other scheme)."""
    import pyarrow as pa

    from osm_jigsaw_ray.pipelines.shuffle import hash_strings

    whole = hash_strings(pa.array(keys, pa.string()))
    for i, k in enumerate(keys):
        solo = hash_strings(pa.array([k], pa.string()))[0]
        padded_batch = hash_strings(pa.array([k, "x" * 40], pa.string()))[0]
        oversize_batch = hash_strings(pa.array([k, "x" * 65], pa.string()))[0]
        nonascii_batch = hash_strings(pa.array([k, "ü" * 3], pa.string()))[0]
        assert whole[i] == solo == padded_batch
        assert solo == oversize_batch == nonascii_batch
