"""Pages sources.

* :func:`pages_from_documents` — derive an ``input_hint``-shaped pages
  table 1:1 from the driver's ``documents`` parquet (doc_id kept as an
  extra key column so the DuckDB oracle can recompute points/urls
  arithmetically).
* :func:`synthetic_pages` — pure generator at any scale (bench corpus).

Both embed the page text and the deterministic geo point into the html
payload; the extractor must recover the text byte-identically
(``BASELINE.json: input_hint`` invariant).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from ..fixtures import generate_pages, page_points, render_html


def _derive_batch(batch: pa.Table) -> pa.Table:
    ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    texts = batch["text"].to_pylist()
    langs = batch["lang"].to_pylist()
    lat, lon = page_points(ids)
    urls = [f"https://example.org/p/{i:08d}" for i in ids]
    htmls = [
        render_html(int(i), float(lat[k]), float(lon[k]), texts[k] or "")
        for k, i in enumerate(ids)
    ]
    ts = pa.array(
        np.datetime64("2025-01-01T00:00:00", "us") + ids.astype("timedelta64[s]"),
        type=pa.timestamp("us"),
    )
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": ts,
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.large_string()),
            "lang": pa.array(langs, pa.string()),
            "doc_id": pa.array(ids, pa.int64()),
        }
    )


def pages_from_documents(sf_dir: str) -> rd.Dataset:
    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    )
    return docs.map_batches(_derive_batch, batch_format="pyarrow")


def synthetic_pages(
    n: int, *, parallelism: int = 8, filler_kb: int = 0
) -> rd.Dataset:
    """Seeded pages at any scale, generated distributed: each Ray task
    materializes its id range (no driver-side giant table).
    ``filler_kb`` adds realistic boilerplate around the article so the
    payload weight matches real crawl pages."""
    shard = max(1, n // max(1, parallelism))
    starts = list(range(0, n, shard))

    def gen(batch: pa.Table) -> pa.Table:
        out = []
        for s in batch["start"].to_pylist():
            out.append(
                generate_pages(min(shard, n - s), start_id=s, filler_kb=filler_kb)
            )
        return pa.concat_tables(out)

    # seed rows must exceed DataContext.target_min_block_size or Ray Data
    # bundles ALL of them into a single map task (tiny 8-byte seed blocks
    # coalesce → the whole corpus generates serially — measured, not
    # hypothetical); the 2 MiB pad forces one generation task per shard
    pad = b"\x00" * (2 * 1024 * 1024)
    seed_ds = rd.from_arrow(
        pa.table(
            {
                "start": pa.array(starts, pa.int64()),
                "pad": pa.array([pad] * len(starts), pa.binary()),
            }
        )
    )
    return seed_ds.repartition(len(starts)).map_batches(
        gen, batch_format="pyarrow", batch_size=1
    )
