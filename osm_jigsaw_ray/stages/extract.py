"""Stateful extraction stage (F15/F16): pages html → text + geo point.

An actor-pool ``map_batches`` class: the regexes compile once per actor
(``__init__``), each ``__call__`` processes one zero-copy Arrow batch and
immediately projects away the heavy ``html`` binary column (SURVEY.md
§7.4 — html is the widest payload; drop it as early as possible).

The per-row invariant from ``BASELINE.json: input_hint`` — extracted text
must be **byte-identical** per url to the corpus' ``text`` column — is
enforced by tests and by the optional ``verify`` flag here.
"""

from __future__ import annotations

import html as _htmlmod
import re

import numpy as np
import pyarrow as pa


class PageExtractor:
    """html → (extracted text, lat, lon); drops the html column.

    Geo resolution reads the deterministic ``geo.position`` meta tag the
    corpus embeds (FIXTURES.md §1.1); pages without one resolve to NaN
    lat/lon and are flagged downstream (``PipJoiner`` gives them
    cell_id="", nearest_area_id=-1, name="" — a real gazetteer resolver
    would slot in here; the stage contract is the same).
    """

    def __init__(self, verify: bool = False, full_text: bool = False):
        self.article = re.compile(rb"<article>(.*?)</article>", re.S)
        self.geo = re.compile(
            rb'name="geo\.position" content="([^";]+);([^"]+)"'
        )
        self.tags = re.compile(rb"<[^>]+>")
        self.verify = verify
        # full_text: also emit the tag-stripped visible text of the WHOLE
        # page (boilerplate removal input for the enrichment pass)
        self.full_text = full_text

    def __call__(self, batch: pa.Table) -> pa.Table:
        htmls = batch["html"].to_pylist()
        n = len(htmls)
        texts: list[str] = [""] * n
        fulls: list[str] = [""] * n
        lats = np.full(n, np.nan)
        lons = np.full(n, np.nan)
        for i, h in enumerate(htmls):
            if h is None:
                continue
            m = self.article.search(h)
            if m:
                texts[i] = _htmlmod.unescape(m.group(1).decode("utf-8"))
            g = self.geo.search(h)
            if g:
                lats[i] = float(g.group(1))
                lons[i] = float(g.group(2))
            if self.full_text:
                fulls[i] = self.tags.sub(b" ", h).decode("utf-8", "replace")
        if self.verify:
            want = batch["text"].to_pylist()
            for i, (a, b) in enumerate(zip(texts, want)):
                if a != b:
                    raise ValueError(
                        f"extracted text not byte-identical for url="
                        f"{batch['url'][i].as_py()!r}"
                    )
        keep = [c for c in batch.column_names if c not in ("html", "text")]
        out = batch.select(keep)
        out = out.append_column("text", pa.array(texts, pa.large_string()))
        out = out.append_column("lat", pa.array(lats, pa.float64()))
        out = out.append_column("lon", pa.array(lons, pa.float64()))
        if self.full_text:
            out = out.append_column(
                "full_text", pa.array(fulls, pa.large_string())
            )
        return out
