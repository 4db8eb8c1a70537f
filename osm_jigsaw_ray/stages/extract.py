"""Stateful extraction stage (F15/F16): pages html → text + geo point.

An actor-pool ``map_batches`` class: each ``__call__`` processes one
zero-copy Arrow batch and immediately projects away the heavy ``html``
binary column (SURVEY.md §7.4 — html is the widest payload; drop it as
early as possible).

Vectorized: article body and geo.position meta are pulled by Arrow
``extract_regex`` (RE2) in one pass over the batch; tag stripping for
the full-text variant is one ``replace_substring_regex``. HTML-entity
unescaping short-circuits — rows whose article body carries no ``&``
need none (unescape is the identity), and only the residue falls back
to per-row ``html.unescape`` (exact single-pass HTML5 semantics, which
a chain of entity replaces cannot reproduce for inputs like ``&amp;lt;``
or unterminated entities).

The per-row invariant from ``BASELINE.json: input_hint`` — extracted
text must be **byte-identical** per url to the corpus' ``text`` column —
is enforced by tests and by the optional ``verify`` flag here.
"""

from __future__ import annotations

import html as _htmlmod

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_ARTICLE_PAT = rb"(?s)<article>(?P<t>.*?)</article>"
_GEO_PAT = rb'name="geo\.position" content="(?P<lat>[^";]+);(?P<lon>[^"]+)"'
_TAG_PAT = rb"<[^>]+>"


def extract_geo_only(batch: pa.Table) -> pa.Table:
    """Coords-only fast scan: ONE ``extract_regex`` over html → (lat,
    lon); skips article extraction and entity unescaping entirely. For
    passes that need the point but not the text (hot-cell detection
    sampling), this is ~an order of magnitude cheaper per page than the
    full :class:`PageExtractor`."""
    html = batch["html"]
    if isinstance(html, pa.ChunkedArray):
        html = html.combine_chunks()
    html = pc.fill_null(html, b"")
    geo = pc.extract_regex(html, pattern=_GEO_PAT)
    geo_ok = pc.is_valid(geo)
    null_b = pa.scalar(None, pa.binary())
    lat_s = pc.cast(pc.if_else(geo_ok, geo.field("lat"), null_b), pa.string())
    lon_s = pc.cast(pc.if_else(geo_ok, geo.field("lon"), null_b), pa.string())
    return pa.table(
        {
            "lat": pc.fill_null(pc.cast(lat_s, pa.float64()), float("nan")),
            "lon": pc.fill_null(pc.cast(lon_s, pa.float64()), float("nan")),
        }
    )


class PageExtractor:
    """html → (extracted text, lat, lon); drops the html column.

    Geo resolution reads the deterministic ``geo.position`` meta tag the
    corpus embeds (FIXTURES.md §1.1); pages without one resolve to NaN
    lat/lon and are flagged downstream (``PipJoiner`` gives them
    cell_id="", nearest_area_id=-1, name="" — a real gazetteer resolver
    would slot in here; the stage contract is the same).
    """

    def __init__(self, verify: bool = False, full_text: bool = False):
        self.verify = verify
        # full_text: also emit the tag-stripped visible text of the WHOLE
        # page (boilerplate removal input for the enrichment pass)
        self.full_text = full_text

    def __call__(self, batch: pa.Table) -> pa.Table:
        html = batch["html"]
        if isinstance(html, pa.ChunkedArray):
            html = html.combine_chunks()
        html = pc.fill_null(html, b"")
        n = len(html)

        # article body (binary, still escaped). NB: .field() of a null
        # struct row does NOT inherit the parent's null — mask explicitly.
        art_m = pc.extract_regex(html, pattern=_ARTICLE_PAT)
        art = pc.if_else(
            pc.is_valid(art_m), art_m.field("t"), pa.scalar(b"", pa.binary())
        )
        art = pc.cast(art, pa.large_string())
        # rows without '&' need no unescape (identity); the rest fall
        # back to exact per-row html.unescape
        amp = np.asarray(pc.match_substring(art, "&"))
        if amp.any():
            vals = art.to_pylist()
            idx = np.flatnonzero(amp)
            for i in idx:
                vals[i] = _htmlmod.unescape(vals[i])
            texts = pa.array(vals, pa.large_string())
        else:
            texts = art

        # geo point
        geo = pc.extract_regex(html, pattern=_GEO_PAT)
        geo_ok = pc.is_valid(geo)
        null_b = pa.scalar(None, pa.binary())
        lat_s = pc.cast(pc.if_else(geo_ok, geo.field("lat"), null_b), pa.string())
        lon_s = pc.cast(pc.if_else(geo_ok, geo.field("lon"), null_b), pa.string())
        lats = pc.fill_null(pc.cast(lat_s, pa.float64()), float("nan"))
        lons = pc.fill_null(pc.cast(lon_s, pa.float64()), float("nan"))

        if self.full_text:
            fulls = pc.cast(
                pc.replace_substring_regex(html, pattern=_TAG_PAT, replacement=b" "),
                pa.large_string(),
            )

        if self.verify:
            want = batch["text"]
            bad = pc.not_equal(texts, pc.cast(want, pa.large_string()))
            bad_np = np.asarray(pc.fill_null(bad, True))
            if bad_np.any():
                i = int(np.flatnonzero(bad_np)[0])
                raise ValueError(
                    f"extracted text not byte-identical for url="
                    f"{batch['url'][i].as_py()!r}"
                )

        keep = [c for c in batch.column_names if c not in ("html", "text")]
        out = batch.select(keep)
        out = out.append_column("text", texts)
        out = out.append_column("lat", pc.cast(lats, pa.float64()))
        out = out.append_column("lon", pc.cast(lons, pa.float64()))
        if self.full_text:
            out = out.append_column("full_text", fulls)
        return out
